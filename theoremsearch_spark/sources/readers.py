"""Source connectors — SURVEY §2.1 scans re-expressed Spark-first.

Every reader takes an explicit schema (the reference's DDL-first
discipline, /root/reference/rds_schema.sql; SURVEY §1.3: never infer).

  S1  partition-range scan   → read_documents (+ pushed time-range)
  S8  zip-of-JSON scan       → read_zip_json (binaryFile + in-UDF unzip,
                               /root/reference/ec2/upsert_stacks/__main__.py:19-46)
  S10 CSV source             → read_csv (/root/reference/compare_embeddings.py:388)
  S13 JSONL batch files      → read_jsonl (/root/reference/ec2/generate_slogans/
                               batches/build/__main__.py:44-60)
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from theoremsearch_spark.corpus import DOCUMENTS_SCHEMA


def read_documents(
    spark: SparkSession,
    path: str,
    *,
    ts_from: str | None = None,
    ts_to: str | None = None,
) -> DataFrame:
    """Documents table scan with an optional warc_ts range — the analog
    of the reference's date-partitioned harvest
    (/root/reference/ec2/upsert_arxiv/arxiv_papers.py:16-54). On an
    Iceberg table partitioned by days(warc_ts) this predicate prunes
    partitions; on parquet it prunes row groups via column stats."""
    df = spark.read.schema(DOCUMENTS_SCHEMA).parquet(path)
    if ts_from:
        df = df.filter(F.col("warc_ts") >= ts_from)
    if ts_to:
        df = df.filter(F.col("warc_ts") < ts_to)
    return df


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).option("header", True).csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_zip_json(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Zip archives of JSON members → rows. binaryFile source feeds the
    archive bytes to a mapInPandas that iterates members — one archive
    per row in, many JSON rows out (the reference walks
    stacks_parsed.zip the same way)."""
    member_fields = [f.name for f in schema.fields]

    def explode_zip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf["content"]:
                with zipfile.ZipFile(io.BytesIO(bytes(raw))) as zf:
                    for name in sorted(zf.namelist()):
                        if not name.endswith(".json"):
                            continue
                        obj = json.loads(zf.read(name))
                        rows.append([obj.get(k) for k in member_fields])
            yield pd.DataFrame(rows, columns=member_fields)

    binary = spark.read.format("binaryFile").load(path).select("content")
    return binary.mapInPandas(explode_zip, schema=schema)
