import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from theoremsearch_spark import codec


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=100, deadline=None)
def test_varbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(codec.varbyte_decode(codec.varbyte_encode(arr)), arr)


def test_varbyte_empty():
    assert codec.varbyte_encode(np.empty(0, np.uint64)) == b""
    assert codec.varbyte_decode(b"").size == 0


def test_varbyte_compression_small_gaps():
    # dense doc ids → gaps of 1 → exactly 1 byte per gap after the first
    gaps = np.ones(128, dtype=np.uint64)
    assert len(codec.varbyte_encode(gaps)) == 128


@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=500, unique=True),
)
@settings(max_examples=50, deadline=None)
def test_block_roundtrip(doc_ids):
    docs = np.sort(np.array(doc_ids, dtype=np.uint64))
    tfs = (docs % 97 + 1).astype(np.uint64)
    db, tb = codec.encode_block(docs, tfs)
    d2, t2 = codec.decode_block(db, tb)
    assert np.array_equal(d2, docs)
    assert np.array_equal(t2, tfs)


def test_block_empty():
    db, tb = codec.encode_block(np.empty(0, np.uint64), np.empty(0, np.uint64))
    d, t = codec.decode_block(db, tb)
    assert d.size == 0 and t.size == 0
