"""Inverted-index build: term-partitioned posting-list construction.

Pipeline (north_star):
    docs ──term_tfs UDF──▶ (term, doc_id, tf, doc_len)
        ──salt heavy terms──▶ (term, segment, …)
        ──repartition(bucket) + sortWithinPartitions(term, segment, doc_id)──▶
        ──mapInPandas block writer──▶ postings blocks (delta+varbyte,
            BLOCK_SIZE docs, per-block max-score metadata)
        ──▶ parquet partitioned by bucket  +  build_manifest rows

Scale notes:
  - the only wide shuffle moves one row per *distinct* (term, doc) pair
    (map-side tf aggregation happens inside the tokenize UDF);
  - skew: stopword posting lists are orders of magnitude longer than the
    median (Zipf). Terms with df > salt_threshold are salted into
    `n_segments` split segments keyed by doc_id % S, so no single task
    owns a whole stopword list (the reference has no analog — Postgres
    hides this; at 10^12 docs it is the build's first bottleneck);
  - resumability: work is hash-bucketed by term; completed buckets are
    recorded in the manifest and skipped on re-run via a broadcast
    anti-join — the same "what's not done yet" pattern the reference
    uses between pipeline stages
    (/root/reference/ec2/parse_arxiv_papers/__main__.py:167-175);
  - lineage/metrics per task (postings/sec, bytes compressed, wall_ms)
    mirror the reference's live parse_rate meters
    (/root/reference/ec2/parse_arxiv_papers/__main__.py:266-267).
"""

from __future__ import annotations

import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from theoremsearch_spark import codec
from theoremsearch_spark.extract import term_tfs_udf

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75
DEFAULT_SALT_THRESHOLD = 50_000  # df above which a term's postings are split
DEFAULT_SEGMENTS = 8
DEFAULT_BUCKETS = 32  # checkpoint/restart granularity

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("segment", T.IntegerType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("last_doc", T.LongType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("max_tf_norm", T.FloatType(), False),
        T.StructField("doc_bytes", T.BinaryType(), False),
        T.StructField("tf_bytes", T.BinaryType(), False),
        T.StructField("dl_bytes", T.BinaryType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("task_wall_ms", T.LongType(), False),
    ]
)

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("postings_written", T.LongType(), False),
        T.StructField("blocks_written", T.LongType(), False),
        T.StructField("bytes_compressed", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
        T.StructField("postings_per_sec", T.DoubleType(), False),
    ]
)


def term_rows(docs: DataFrame) -> DataFrame:
    """docs → (term, doc_id, tf, doc_len): the shuffle input."""
    return docs.select(
        "doc_id",
        "doc_len",
        F.explode(term_tfs_udf(F.col("extracted_text"))).alias("tt"),
    ).select(
        F.col("tt.term").alias("term"),
        "doc_id",
        F.col("tt.tf").alias("tf"),
        "doc_len",
    )


def salt_segments(
    rows: DataFrame, tstats: DataFrame, salt_threshold: int, n_segments: int
) -> DataFrame:
    """Add `segment`: 0 for normal terms; doc_id % S for heavy terms.

    The heavy-term list is tiny (stopwords) → broadcast join, no extra
    wide shuffle. Split segments are re-merged at query time (each term
    appears as up to S independent, doc-disjoint posting lists).
    """
    heavy = tstats.filter(F.col("df") > salt_threshold).select(
        "term", F.lit(True).alias("_heavy")
    )
    return (
        rows.join(F.broadcast(heavy), "term", "left")
        .withColumn(
            "segment",
            F.when(
                F.col("_heavy").isNotNull(),
                F.pmod(F.col("doc_id"), F.lit(n_segments)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("_heavy")
    )


def _block_builder(avgdl: float, k1: float, b: float, block_size: int):
    """mapInPandas factory: consumes a stream sorted by (term, segment,
    doc_id), emits compressed posting blocks. Carry-across-batch state
    keeps partial runs so blocks are cut exactly at block_size."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t0 = time.monotonic()
        carry: pd.DataFrame | None = None

        def flush(group: pd.DataFrame, final: bool) -> tuple[list, pd.DataFrame | None]:
            """Emit full blocks for one (term, segment) run; keep remainder."""
            out = []
            n = len(group)
            usable = n if final else (n // block_size) * block_size
            if usable == 0:
                return out, group
            term = group["term"].iloc[0]
            seg = int(group["segment"].iloc[0])
            bucket = int(group["bucket"].iloc[0])
            doc_ids = group["doc_id"].to_numpy(np.int64)[:usable]
            tfs = group["tf"].to_numpy(np.int64)[:usable]
            dls = group["doc_len"].to_numpy(np.int64)[:usable]
            tf_norm = (tfs * (k1 + 1.0)) / (tfs + k1 * (1.0 - b + b * dls / avgdl))
            base_block = 0
            if "_blocks_emitted" in group:
                v = group["_blocks_emitted"].iloc[0]
                if not pd.isna(v):
                    base_block = int(v)
            for i in range(0, usable, block_size):
                j = min(i + block_size, usable)
                d, t_ = codec.encode_block(doc_ids[i:j], tfs[i:j])
                dl_b = codec.varbyte_encode(dls[i:j].astype(np.uint64))
                out.append(
                    (
                        term,
                        seg,
                        base_block + i // block_size,
                        int(doc_ids[i]),
                        int(doc_ids[j - 1]),
                        j - i,
                        float(tf_norm[i:j].max()),
                        d,
                        t_,
                        dl_b,
                        bucket,
                    )
                )
            rem = None
            if usable < n:
                rem = group.iloc[usable:].copy()
                rem["_blocks_emitted"] = base_block + usable // block_size
            return out, rem

        def emit(rows: list) -> pd.DataFrame:
            wall = int((time.monotonic() - t0) * 1000)
            pdf = pd.DataFrame(
                rows,
                columns=[
                    "term", "segment", "block_id", "first_doc", "last_doc",
                    "n_docs", "max_tf_norm", "doc_bytes", "tf_bytes",
                    "dl_bytes", "bucket",
                ],
            )
            pdf["task_wall_ms"] = wall
            return pdf

        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if pdf.empty:
                continue
            keys = pdf["term"].astype(str) + "\x01" + pdf["segment"].astype(str)
            boundary = keys.ne(keys.shift()).cumsum()
            rows_out: list = []
            groups = list(pdf.groupby(boundary, sort=False))
            for gi, (_, group) in enumerate(groups):
                final = gi < len(groups) - 1  # last run may continue next batch
                emitted, rem = flush(group, final=final)
                rows_out.extend(emitted)
                if not final:
                    carry = rem
            if rows_out:
                yield emit(rows_out)
        if carry is not None and not carry.empty:
            emitted, _ = flush(carry, final=True)
            if emitted:
                yield emit(emitted)

    return build


def completed_buckets(spark: SparkSession, manifest_dir: str) -> set[int]:
    try:
        rows = spark.read.parquet(manifest_dir).filter(F.col("status") == "done").select("bucket").collect()
        return {r["bucket"] for r in rows}
    except Exception:
        return set()


def build_index(
    docs: DataFrame,
    out_dir: str,
    *,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    salt_threshold: int = DEFAULT_SALT_THRESHOLD,
    n_segments: int = DEFAULT_SEGMENTS,
    n_buckets: int = DEFAULT_BUCKETS,
    block_size: int = codec.BLOCK_SIZE,
    resume: bool = True,
    fail_after_buckets: int | None = None,
) -> dict:
    """Build (or resume) the inverted index under ``out_dir``.

    Layout:  out_dir/postings/bucket=<n>/…parquet
             out_dir/term_stats/…parquet
             out_dir/doc_stats/…parquet
             out_dir/manifest/…parquet   (append-only, one row per bucket)

    ``fail_after_buckets`` deliberately stops after N buckets — the
    resume test's kill switch.
    """
    from theoremsearch_spark import stats as stats_mod

    spark = docs.sparkSession

    done = completed_buckets(spark, f"{out_dir}/manifest") if resume else set()
    first_run = not done

    if first_run:
        # stage 0: tokenize ONCE into a columnar staging table — reused by
        # term_stats and the posting shuffle, and a resume checkpoint (a
        # re-run never re-tokenizes). Dictionary-encoded term column keeps
        # it ~the size of the raw text.
        term_rows(docs).write.mode("overwrite").parquet(f"{out_dir}/term_rows")
        rows = spark.read.parquet(f"{out_dir}/term_rows")
        tstats = stats_mod.term_stats(rows)
        tstats.write.mode("overwrite").parquet(f"{out_dir}/term_stats")
        n_docs, avgdl = stats_mod.doc_stats(docs)
        spark.createDataFrame(
            [(n_docs, avgdl, float(k1), float(b), int(block_size), int(n_segments), int(salt_threshold))],
            "n_docs long, avgdl double, k1 double, b double, block_size int, n_segments int, salt_threshold int",
        ).write.mode("overwrite").parquet(f"{out_dir}/doc_stats")
    else:
        rows = spark.read.parquet(f"{out_dir}/term_rows")
        meta = spark.read.parquet(f"{out_dir}/doc_stats").collect()[0]
        avgdl = float(meta["avgdl"])

    tstats = spark.read.parquet(f"{out_dir}/term_stats")

    salted = salt_segments(rows, tstats, salt_threshold, n_segments)
    salted = salted.withColumn(
        "bucket", F.pmod(F.xxhash64("term", "segment"), F.lit(n_buckets)).cast("int")
    )

    pending = sorted(set(range(n_buckets)) - done)
    if fail_after_buckets is not None:
        pending = pending[:fail_after_buckets]
    if not pending:
        return {"buckets_built": 0, "resumed": True}

    todo = salted.filter(F.col("bucket").isin([int(x) for x in pending]))
    shuffled = todo.repartition(len(pending), "bucket").sortWithinPartitions(
        "term", "segment", "doc_id"
    )
    blocks = shuffled.mapInPandas(
        _block_builder(avgdl, k1, b, block_size), schema=POSTINGS_SCHEMA
    )
    blocks.write.mode("append").partitionBy("bucket").parquet(f"{out_dir}/postings")

    # manifest: per-bucket lineage + metrics from the blocks just written
    written = spark.read.parquet(f"{out_dir}/postings").filter(
        F.col("bucket").isin([int(x) for x in pending])
    )
    manifest = (
        written.groupBy("bucket")
        .agg(
            F.sum("n_docs").alias("postings_written"),
            F.count("*").alias("blocks_written"),
            F.sum(
                F.length("doc_bytes") + F.length("tf_bytes") + F.length("dl_bytes")
            ).alias("bytes_compressed"),
            F.max("task_wall_ms").alias("wall_ms"),
        )
        .withColumn("status", F.lit("done"))
        .withColumn(
            "postings_per_sec",
            F.col("postings_written") / (F.greatest(F.col("wall_ms"), F.lit(1)) / 1000.0),
        )
        .select([f.name for f in MANIFEST_SCHEMA.fields])
    )
    manifest.write.mode("append").parquet(f"{out_dir}/manifest")
    return {"buckets_built": len(pending), "resumed": bool(done)}
