"""spark-submit entry: drive the S11/S12 sink seam — upsert or
replace-document a batch into a table.

Usage:
  spark-submit --py-files theoremsearch_spark.zip jobs/upsert_table.py \
      --table <parquet dir | iceberg catalog.db.table> \
      --input <parquet path with the batch rows> --key url \
      [--mode upsert|replace] [--sink auto|parquet|iceberg] \
      [--buckets 64]

Sink selection (`--sink`):
  auto     get_sink(): IcebergMergeSink when the Iceberg runtime is on
           the session classpath, ParquetBucketSink otherwise — the
           recommended setting; the job's semantics are identical
           either way (S11 last-writer-wins by key; S12 drop all rows
           for incoming keys, then insert).
  parquet  force ParquetBucketSink: `--table` is a directory; rows land
           hash-bucketed by key into kb= partitions and an upsert
           rewrites only the touched buckets. This is the substitution
           this container runs (no Iceberg runtime baked in).
  iceberg  force IcebergMergeSink: `--table` is a catalog table name;
           upsert is one atomic MERGE INTO
           (the reference's ON CONFLICT DO UPDATE,
           /root/reference/ec2/rds/upsert.py:40-52); replace is
           DELETE+INSERT (two commits — see the sink docstring).
           Raises with a clear message when the runtime jar is absent.

Prints one JSON line, e.g.:
  {"job": "upsert_table", "sink": "ParquetBucketSink", "mode": "upsert",
   "batch_rows": 100, "wall_sec": 1.2}
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--table", required=True,
                   help="parquet dir (parquet sink) or catalog table (iceberg)")
    p.add_argument("--input", required=True, help="parquet path with batch rows")
    p.add_argument("--key", required=True, help="upsert key column")
    p.add_argument("--mode", choices=["upsert", "replace"], default="upsert")
    p.add_argument("--sink", choices=["auto", "parquet", "iceberg"], default="auto")
    p.add_argument("--buckets", type=int, default=None,
                   help="parquet sink key-hash bucket count")
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("ts-upsert-table").getOrCreate()
    from theoremsearch_spark.sources.sinks import (
        IcebergMergeSink,
        ParquetBucketSink,
        get_sink,
    )

    if args.sink == "auto":
        sink = get_sink(spark)
    elif args.sink == "iceberg":
        sink = IcebergMergeSink()
    else:
        sink = (
            ParquetBucketSink(args.buckets) if args.buckets else ParquetBucketSink()
        )

    batch = spark.read.parquet(args.input)
    t0 = time.monotonic()
    getattr(sink, args.mode)(spark, args.table, batch, args.key)
    out = {
        "job": "upsert_table",
        "sink": type(sink).__name__,
        "mode": args.mode,
        "batch_rows": batch.count(),
        "wall_sec": round(time.monotonic() - t0, 2),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
