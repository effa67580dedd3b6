"""Docs table construction + global corpus statistics.

Maps the reference's corpus bookkeeping into Spark:
  - dense doc_id assignment (analog of `theorem_id BIGSERIAL`,
    /root/reference/rds_schema.sql:22) — deterministic, scalable,
    two-pass (count + assign) over a range-partitioned url sort;
  - `doc_stats` (N, avgdl) — analog of `load_theorem_count`
    (/root/reference/streamlit_app.py:108-116), broadcast to the scorer;
  - `term_stats` (term, df) — document frequencies, the pgvector-index
    replacement's idf input (/root/reference/streamlit_app.py:275).

Dense ids matter at scale: delta-gaps between consecutive doc_ids in a
posting list stay small, so varbyte compresses to ~1 byte/gap; sparse
64-bit hashes would cost 5+ bytes/gap and break block-range pruning.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from theoremsearch_spark.extract import doc_len_udf, extract_text_udf

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("extracted_text", T.StringType(), True),
        T.StructField("doc_len", T.IntegerType(), True),
    ]
)


def extract_docs(documents: DataFrame) -> DataFrame:
    """documents(url, warc_ts, html, text, lang) → extracted docs (no ids yet).

    Extraction is one Arrow-batched pandas UDF over the binary column —
    the whole-stage plan reads only (url, warc_ts, html, lang) from the
    scan (column pruning; the `text` column is test-only ground truth).
    """
    return documents.select(
        "url",
        "warc_ts",
        "lang",
        extract_text_udf(F.col("html")).alias("extracted_text"),
    ).withColumn("doc_len", doc_len_udf(F.col("extracted_text")))


def assign_doc_ids(docs: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Deterministic dense doc_id, total-ordered by url.

    Scalable scheme (no global single-partition window):
      1. range-repartition by url + sort within partitions — Spark's
         RangePartitioner gives globally ordered partitions;
      2. count rows per partition (cheap agg job);
      3. broadcast cumulative offsets; assign
         doc_id = offset[pid] + row_number_within_partition
         inside mapInPandas (narrow, streaming).
    Two passes over the data — the same cost Spark's own zipWithIndex
    pays — and no driver materialization. Equivalent of the reference's
    BIGSERIAL assignment but reproducible run-to-run.
    """
    n = num_partitions or docs.sparkSession.sparkContext.defaultParallelism
    ordered = (
        docs.repartitionByRange(n, "url")
        .sortWithinPartitions("url")
        .withColumn("_pid", F.spark_partition_id())
    )
    ordered.persist()
    counts = {r["_pid"]: r["cnt"] for r in ordered.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in batches:
            base = offsets.get(int(pdf["_pid"].iloc[0]), 0) if len(pdf) else 0
            out = pdf.drop(columns=["_pid"])
            out.insert(0, "doc_id", base + local + pd.RangeIndex(len(pdf)))
            local += len(pdf)
            yield out

    out = ordered.mapInPandas(assign, schema=DOCS_SCHEMA)
    return out


def doc_stats(docs: DataFrame) -> tuple[int, float]:
    """(N, avgdl) — tiny aggregate, collected and broadcast into scorers."""
    row = docs.agg(
        F.count("*").alias("n_docs"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    return int(row["n_docs"]), float(row["avgdl"] or 0.0)


def term_stats(term_rows: DataFrame) -> DataFrame:
    """(term, doc_id, tf) rows → (term, df). Map-side partial agg is
    automatic for count; one small shuffle keyed by term."""
    return term_rows.groupBy("term").agg(F.count("*").alias("df"))
