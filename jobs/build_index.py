"""spark-submit entry: build the inverted index.

Usage:
  spark-submit --py-files theoremsearch_spark.zip jobs/build_index.py \
      --input <documents parquet/iceberg path | synth:N> \
      --out <index root dir> [--buckets 32] [--segments 8] \
      [--salt-threshold 50000] [--block-size 128] [--no-resume]

Mirrors the reference's argparse batch drivers
(/root/reference/ec2/parse_arxiv_papers/__main__.py:290-304): explicit
knobs, progress metrics printed at the end, idempotent re-run
(resume skips completed buckets via the manifest anti-join).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession, functions as F


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="documents table path, or synth:N")
    p.add_argument("--out", required=True, help="index output root")
    p.add_argument("--buckets", type=int, default=32)
    p.add_argument("--segments", type=int, default=8)
    p.add_argument("--salt-threshold", type=int, default=50_000)
    p.add_argument("--block-size", type=int, default=128)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument(
        "--positions", action="store_true",
        help="also build the positional-postings sidecar (index/"
             "positions) — query_topk --phrase then verifies adjacency "
             "from positions instead of fetching document text",
    )
    p.add_argument(
        "--filter-cols", default="lang",
        help="comma-separated metadata columns indexed as filter-term posting "
             "lists (col=value; reference R3 filtered serving); '' disables",
    )
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("ts-build-index").getOrCreate()
    from theoremsearch_spark.build import build_index
    from theoremsearch_spark.corpus import generate_documents
    from theoremsearch_spark.stats import prepare_docs

    t0 = time.monotonic()
    if args.input.startswith("synth:"):
        documents = generate_documents(spark, int(args.input.split(":", 1)[1]))
    else:
        documents = spark.read.parquet(args.input)

    # resume: keep the already-extracted docs table (checkpoint 0)
    docs_done = False
    if not args.no_resume:
        try:
            spark.read.parquet(f"{args.out}/docs").schema
            docs_done = True
        except Exception:
            docs_done = False
    if not docs_done:
        prepare_docs(documents, args.out)
    docs_r = spark.read.parquet(f"{args.out}/docs")
    fcols = [c for c in args.filter_cols.split(",") if c and c in docs_r.columns]
    if fcols:
        docs_r = docs_r.withColumn(
            "filter_terms",
            F.array(*[F.concat(F.lit(f"{c}="), F.col(c).cast("string")) for c in fcols]),
        )
    result = build_index(
        docs_r,
        f"{args.out}/index",
        salt_threshold=args.salt_threshold,
        n_segments=args.segments,
        n_buckets=args.buckets,
        block_size=args.block_size,
        resume=not args.no_resume,
    )
    if args.positions:
        from theoremsearch_spark.positions import build_positions

        result["positions"] = build_positions(docs_r, f"{args.out}/index")
    wall = time.monotonic() - t0
    n_docs = docs_r.count()
    manifest = (
        spark.read.parquet(f"{args.out}/index/manifest")
        .agg(
            F.sum("postings_written").alias("postings"),
            F.sum("bytes_compressed").alias("bytes"),
        )
        .collect()[0]
    )
    print(
        json.dumps(
            {
                "job": "build_index",
                "docs": n_docs,
                "docs_per_sec": round(n_docs / wall, 1),
                "postings_written": int(manifest["postings"] or 0),
                "bytes_compressed": int(manifest["bytes"] or 0),
                "wall_sec": round(wall, 2),
                **result,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
