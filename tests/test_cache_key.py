"""Harness index-cache staleness: the cache key must change when the
input parquet is regenerated at the same path (round-1 bug: path-only
key silently served a stale index)."""

import os
import time

from theoremsearch_spark.operators.engine_queries import _content_key, _index_dir


def _mk(sf_dir, content: bytes):
    os.makedirs(os.path.join(sf_dir, "documents.parquet"), exist_ok=True)
    with open(os.path.join(sf_dir, "documents.parquet", "part-0.parquet"), "wb") as f:
        f.write(content)


def test_key_changes_when_input_regenerated(tmp_path):
    sf = str(tmp_path / "sf")
    _mk(sf, b"v1" * 100)
    k1 = _content_key(sf)
    assert _content_key(sf) == k1  # stable for unchanged input
    time.sleep(0.01)
    _mk(sf, b"v2" * 150)  # regenerated in place: new size+mtime
    k2 = _content_key(sf)
    assert k2 != k1
    assert _index_dir(sf) != os.path.join("/tmp", f"ts_harness_index_{k1}")


def test_key_differs_across_paths(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _mk(a, b"same")
    _mk(b, b"same")
    assert _content_key(a) != _content_key(b)
