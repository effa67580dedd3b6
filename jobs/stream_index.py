"""spark-submit entry: incremental (streaming) index ingestion with
upsert semantics.

Usage:
  spark-submit --py-files theoremsearch_spark.zip jobs/stream_index.py \
      --input <landing dir of documents parquet files (glob ok)> \
      --out <generations root> --checkpoint <stream checkpoint dir> \
      [--buckets 32] [--segments 8] [--salt-threshold 50000] \
      [--synth-batch N]

Each micro-batch (availableNow trigger — process everything pending,
then stop; rerun the job as new files land, the checkpoint carries
over) becomes one index GENERATION: out/gen_<batch>/{docs,index}, with
a JSON manifest commit. A batch that re-ingests an already-indexed url
TOMBSTONES the stale doc versions (the reference's per-batch
DELETE WHERE paper_id IN (…) + insert,
/root/reference/ec2/parse_arxiv_papers/__main__.py:269-283); serving
via topk_all_generations / query_topk --gens excludes them with exact
N/avgdl/df corrections. jobs/compact_index.py merges generations and
physically drops tombstoned bodies.

`--synth-batch N` (testing) writes one N-doc synthetic batch into the
landing dir before running, so the job is drivable end-to-end with no
external data.

Prints one JSON line, e.g.:
  {"job": "stream_index", "generations": 2, "docs_live": 5100,
   "tombstones": 100, "wall_sec": 12.3}
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="landing directory (glob ok)")
    p.add_argument("--out", required=True, help="generations root")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--buckets", type=int, default=32)
    p.add_argument(
        "--positions", action="store_true",
        help="build a positional-postings sidecar per generation "
             "(query_topk --gens --phrase then verifies from positions)",
    )
    p.add_argument("--segments", type=int, default=8)
    p.add_argument("--salt-threshold", type=int, default=50_000)
    p.add_argument(
        "--filter-cols", default="",
        help="comma-separated metadata columns indexed as filter-term "
             "posting lists (col=value; reference R3 filtered serving). "
             "Keep constant for the life of a root — the default is OFF "
             "so resuming a pre-existing root never silently mixes "
             "filter-indexed and unindexed generations",
    )
    p.add_argument(
        "--synth-batch", type=int, default=None,
        help="write one N-doc synthetic batch into the landing dir first",
    )
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("ts-stream-index").getOrCreate()
    from theoremsearch_spark.streaming.incremental import (
        _generations,
        _tombstone_paths,
        incremental_index,
    )

    import os

    t0 = time.monotonic()
    # --input is either a DIRECTORY (the landing dir; the stream watches
    # <dir>/*) or an explicit glob, used verbatim. The old rule appended
    # '/*' to anything not ending in a bare '*', so 'dir/*.parquet'
    # became 'dir/*.parquet/*' — a path matching nothing.
    # only '*' and '?' mark a user-intended glob; '[' also appears in
    # literal dir names ('batches[eu]'). Hadoop's path globbing treats
    # [ ] { } as metacharacters even inside the directory part, so a
    # literal path must have them backslash-escaped BEFORE '/*' is
    # appended — otherwise '[eu]' silently becomes a character class
    # and the stream watches nothing.
    import re as _re

    is_glob = any(ch in args.input for ch in "*?")
    stream_path = (
        args.input
        if is_glob
        else _re.sub(r"([\[\]{}])", r"\\\1", args.input.rstrip("/")) + "/*"
    )

    if args.synth_batch:
        from theoremsearch_spark.corpus import generate_documents

        if is_glob:
            # a glob like 'dir/batch*' would never match the
            # synth_batch_N dir we write — the batch would silently
            # never be ingested
            p.error("--synth-batch requires a plain directory --input, not a glob")
        # name from the LANDING DIR contents, not the generation count:
        # compaction shrinks the live generation count and a crashed run
        # can leave a batch dir without a committed generation — either
        # would collide with an existing synth_batch_N directory.
        land = args.input.rstrip("/")
        batch_no = 0
        while os.path.exists(f"{land}/synth_batch_{batch_no}"):
            batch_no += 1
        generate_documents(spark, args.synth_batch).repartition(2).write.parquet(
            f"{land}/synth_batch_{batch_no}"
        )

    stream = incremental_index(
        spark,
        stream_path,
        args.out,
        args.checkpoint,
        filter_cols=[c.strip() for c in args.filter_cols.split(",") if c.strip()],
        positions=args.positions,
        salt_threshold=args.salt_threshold,
        n_segments=args.segments,
        n_buckets=args.buckets,
    )
    stream.start().awaitTermination()

    gens = _generations(spark, args.out)
    tomb_paths = _tombstone_paths(args.out, [g["gen"] for g in gens])
    n_tomb = (
        spark.read.parquet(*tomb_paths).dropDuplicates(["doc_id"]).count()
        if tomb_paths
        else 0
    )
    print(
        json.dumps(
            {
                "job": "stream_index",
                "generations": len(gens),
                "docs_live": sum(g["n_docs"] for g in gens) - n_tomb,
                "tombstones": n_tomb,
                "wall_sec": round(time.monotonic() - t0, 2),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
