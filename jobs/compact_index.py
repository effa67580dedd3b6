"""spark-submit entry: compact a multi-generation (streaming / sharded
multi-executor) index into one generation.

Usage:
  spark-submit --py-files theoremsearch_spark.zip jobs/compact_index.py \
      --root <gens root (contains gen_*/ + gens/ manifest)> \
      [--min-generations 2] [--buckets 32] [--segments 8] \
      [--salt-threshold 50000] [--delete-old]

The streaming path (theoremsearch_spark/streaming/incremental.py)
commits one index generation per micro-batch; serving cost grows with
generation count. This job is the LSM-merge step: union every
generation's docs (they already share one offset doc_id space), rebuild
a single index, and commit it with `replaces=[old gens]` — one atomic
manifest rename swaps readers over with no double-serving window.
Ops analog of the reference's periodic re-index over its ever-upserted
Postgres tables (/root/reference/ec2/rds/upsert.py:40-52 upsert churn).

Prints one JSON line, e.g.:
  {"job": "compact_index", "compacted": true, "generation": 2,
   "n_docs": 5000, "replaced": [0, 1], "wall_sec": 12.3}
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", required=True, help="gens root directory")
    p.add_argument("--min-generations", type=int, default=2)
    def tier_fraction_arg(s: str) -> float:
        f = float(s)
        if not 0.0 < f < 1.0:
            # f >= 1 makes the [f*avg, avg/f] membership interval empty
            # (or equal-sizes-only at f == 1), so tiered compaction would
            # silently no-op forever; f <= 0 admits everything into one
            # bucket — both are configuration mistakes, not policies
            raise argparse.ArgumentTypeError(
                f"--tier-fraction must be in (0, 1), got {f}"
            )
        return f

    p.add_argument(
        "--tier-fraction", type=tier_fraction_arg, default=None,
        help="size-tiered selection: generations group into similar-size "
        "buckets (membership within [f*avg, avg/f] of the bucket "
        "average) and the cheapest bucket with >=2 members merges — "
        "equal-size micro-batches compact, a dominant base generation "
        "is never rewritten; default (unset) merges everything",
    )
    p.add_argument("--buckets", type=int, default=32)
    p.add_argument(
        "--positions", action="store_true",
        help="build a positions sidecar for the compacted generation "
             "(required to keep positional phrase serving on roots "
             "whose generations carry sidecars)",
    )
    p.add_argument("--segments", type=int, default=8)
    p.add_argument("--salt-threshold", type=int, default=50_000)
    p.add_argument(
        "--delete-old", action="store_true",
        help="after the atomic manifest swap, vacuum superseded gen dirs "
        "immediately (no reader grace window — use jobs/vacuum_index.py "
        "with --min-age for deferred reclaim)",
    )
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("ts-compact-index").getOrCreate()
    from theoremsearch_spark.streaming.incremental import (
        compact_generations,
        vacuum_generations,
    )

    t0 = time.monotonic()
    res = compact_generations(
        spark,
        args.root,
        min_generations=args.min_generations,
        tier_fraction=args.tier_fraction,
        positions=args.positions,
        n_buckets=args.buckets,
        n_segments=args.segments,
        salt_threshold=args.salt_threshold,
    )
    if args.delete_old and res.get("compacted"):
        # manifest-driven (only `replaces`-listed dirs, records kept) —
        # same safety contract as the standalone vacuum job
        res["vacuum"] = vacuum_generations(args.root)
    out = {"job": "compact_index", **res, "wall_sec": round(time.monotonic() - t0, 2)}
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
