"""Driver-harness entries that exercise the REAL engine end-to-end.

`bm25_topk` builds the inverted index (salted, compressed, block-max)
over the driver's `documents` table and serves a fixed query batch —
then the DuckDB oracle recomputes BM25 from first principles in pure
SQL (tokenize → tf → df → dl → score → top-k). Matching hashes mean
the entire build+query pipeline (codec included) reproduces the
textbook formula, independently implemented twice.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import pandas as pd
from pyspark.sql import functions as F

from theoremsearch_spark.build import DEFAULT_B, DEFAULT_K1, build_index
from theoremsearch_spark.operators.relational import t
from theoremsearch_spark.query import topk

HARNESS_QUERIES = [
    (0, "spark window merge"),
    (1, "hash join scan"),
    (2, "stream batch dup"),
    (3, "the fast key"),
    (4, "table sort order part"),
]
K = 10


def _index_dir(sf_dir: str) -> str:
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return os.path.join(tempfile.gettempdir(), f"ts_harness_index_{key}")


def _ensure_index(spark, sf_dir: str) -> str:
    out = _index_dir(sf_dir)
    marker = os.path.join(out, "_done")
    if not os.path.exists(marker):
        d = t(spark, sf_dir, "documents")
        docs = d.select(
            "doc_id",
            F.col("text").alias("extracted_text"),
            F.size(F.split(F.col("text"), " ")).alias("doc_len"),
        )
        build_index(
            docs, out, salt_threshold=200, n_segments=4, n_buckets=8, resume=False
        )
        d.select("doc_id", "n_chars").write.mode("overwrite").parquet(
            os.path.join(out, "docsmeta")
        )
        open(marker, "w").close()
    return out


def q_bm25_topk(spark, sf_dir):
    idx = _ensure_index(spark, sf_dir)
    qs = pd.DataFrame(HARNESS_QUERIES, columns=["query_id", "query_text"])
    hits = topk(spark, idx, qs, k=K)
    return hits.select(
        "query_id", "rank", "doc_id", F.round("score", 4).alias("score")
    ).orderBy("query_id", "rank")


def _bm25_oracle_sql() -> str:
    qvals = ", ".join(
        f"({qid}, '{term}')" for qid, text in HARNESS_QUERIES for term in sorted(set(text.split()))
    )
    return f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
        stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        q(query_id, term) AS (VALUES {qvals}),
        scored AS (
            SELECT q.query_id, tf.doc_id,
                   sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                       * tf.tf * ({DEFAULT_K1} + 1)
                       / (tf.tf + {DEFAULT_K1} * (1 - {DEFAULT_B} + {DEFAULT_B} * dl.dl / stats.avgdl))
                   ) AS s
            FROM tf JOIN q USING (term) JOIN df USING (term)
                 JOIN dl USING (doc_id) CROSS JOIN stats
            GROUP BY 1, 2),
        ranked AS (
            SELECT query_id, doc_id, s,
                   row_number() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id ASC) AS rank
            FROM scored)
        SELECT query_id, rank, doc_id, round(s, 4) AS score
        FROM ranked WHERE rank <= {K} ORDER BY query_id, rank
    """


RESCORE_W = 0.1
POOL = 50


def q_bm25_topk_rescored(spark, sf_dir):
    """Two-stage rank (reference W2): BM25 pool of 50 → rescore by
    + w·ln(1+n_chars) → top-10 by (weighted DESC, score DESC, doc_id)."""
    from theoremsearch_spark.query import topk_rescored

    idx = _ensure_index(spark, sf_dir)
    qs = pd.DataFrame(HARNESS_QUERIES, columns=["query_id", "query_text"])
    hits = topk_rescored(
        spark, idx, os.path.join(idx, "docsmeta"), qs, k=K,
        pool_factor=5, weight=RESCORE_W, weight_col="n_chars",
    )
    return hits.select(
        "query_id",
        "final_rank",
        "doc_id",
        F.round("score", 4).alias("score"),
        F.round("weighted_score", 4).alias("weighted_score"),
    ).orderBy("query_id", "final_rank")


def _bm25_rescored_oracle_sql() -> str:
    qvals = ", ".join(
        f"({qid}, '{term}')" for qid, text in HARNESS_QUERIES for term in sorted(set(text.split()))
    )
    return f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
        stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        q(query_id, term) AS (VALUES {qvals}),
        scored AS (
            SELECT q.query_id, tf.doc_id,
                   sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                       * tf.tf * ({DEFAULT_K1} + 1)
                       / (tf.tf + {DEFAULT_K1} * (1 - {DEFAULT_B} + {DEFAULT_B} * dl.dl / stats.avgdl))
                   ) AS s
            FROM tf JOIN q USING (term) JOIN df USING (term)
                 JOIN dl USING (doc_id) CROSS JOIN stats
            GROUP BY 1, 2),
        pool AS (
            SELECT query_id, doc_id, s,
                   row_number() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id ASC) AS prank
            FROM scored),
        rescored AS (
            SELECT p.query_id, p.doc_id, p.s,
                   p.s + {RESCORE_W} * ln(1 + d.n_chars) AS ws
            FROM pool p JOIN documents d USING (doc_id)
            WHERE p.prank <= {POOL}),
        final AS (
            SELECT query_id, doc_id, s, ws,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY ws DESC, s DESC, doc_id ASC) AS final_rank
            FROM rescored)
        SELECT query_id, final_rank, doc_id,
               round(s, 4) AS score, round(ws, 4) AS weighted_score
        FROM final WHERE final_rank <= {K} ORDER BY query_id, final_rank
    """


QUERIES = {"bm25_topk": q_bm25_topk, "bm25_topk_rescored": q_bm25_topk_rescored}
ORACLES = {
    "bm25_topk": _bm25_oracle_sql(),
    "bm25_topk_rescored": _bm25_rescored_oracle_sql(),
}
