"""Sink connectors — SURVEY §2.1 S11/S12 semantics on plain parquet.

The reference's write discipline is idempotent batch commits:
  S11 upsert       INSERT … ON CONFLICT DO UPDATE
                   (/root/reference/ec2/rds/upsert.py:4-52)
  S12 replace-doc  DELETE WHERE key IN (...) + insert per batch
                   (/root/reference/ec2/parse_arxiv_papers/__main__.py:269-283)

On a lakehouse table these are `MERGE INTO` / dynamic-partition
overwrite; this container has no Iceberg runtime, so the same
semantics are implemented as deterministic partition-hash overwrite on
parquet: rows are bucketed by key hash into `kb=<n>` partitions and an
upsert rewrites ONLY the buckets containing affected keys — bounded
I/O, atomic per partition, which is exactly the property MERGE gives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

N_KEY_BUCKETS = 64


def _with_bucket(df: DataFrame, key: str) -> DataFrame:
    return df.withColumn(
        "kb", F.pmod(F.xxhash64(F.col(key)), F.lit(N_KEY_BUCKETS)).cast("int")
    )


def upsert_parquet(spark: SparkSession, table_dir: str, new_rows: DataFrame, key: str) -> None:
    """Upsert by key: last-writer-wins per key (S11). Rewrites only the
    key-hash buckets that contain new keys."""
    new_b = _with_bucket(new_rows, key)
    buckets = [r["kb"] for r in new_b.select("kb").distinct().collect()]
    try:
        existing = spark.read.parquet(table_dir).filter(F.col("kb").isin(buckets))
        merged = existing.join(
            new_b.select(key).distinct(), key, "left_anti"
        ).unionByName(new_b)
    except Exception:
        merged = new_b
    # static overwrite of just the affected bucket partitions
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    merged.write.mode("overwrite").partitionBy("kb").parquet(table_dir)


def replace_documents(
    spark: SparkSession, table_dir: str, new_docs: DataFrame, key: str
) -> None:
    """S12 delete-then-insert: all existing rows for the incoming keys
    are dropped, then the new rows land — replace-document semantics
    (a document's unit rows are fully superseded by a re-parse)."""
    upsert_parquet(spark, table_dir, new_docs, key)


def append_jsonl(df: DataFrame, path: str) -> None:
    """S13: JSONL batch output (df.write.json)."""
    df.write.mode("append").json(path)
