"""IR evaluation metrics over ranked results — the Spark re-expression
of the reference's offline harness (/root/reference/compare_embeddings.py):

  P@1      :95-117      Hit@k  :120-140     MRR@k  :143-173
  nDCG@k   :216-243     ERR@k  :257-311     Q-measure@k :315-371
  graded qrels: exact=1.0, same-group=0.5   :175-182, 453-457

Everything is one join + one windowed aggregation — no Python in the
row path; metrics come out of a single groupBy over millions of
(query, rank) rows at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

def GAIN():  # 2^rel − 1 (nDCG/ERR gains); lazy — needs an active session
    return F.pow(F.lit(2.0), F.col("rel")) - 1.0


def grade_hits(hits: DataFrame, qrels: DataFrame) -> DataFrame:
    """hits(query_id, rank, url) ⋈ qrels(query_id, expected_url,
    expected_group) → per-hit graded relevance: exact=1, same-group=0.5,
    else 0 (compare_embeddings.py:453-457 / :175-182)."""
    doc_group = F.regexp_replace(  # group key = doc_id // 10 planted at gen time
        F.col("url"), r".*doc(\d{7})\d$", r"g$1"
    )
    return (
        hits.join(F.broadcast(qrels), "query_id", "left")
        .withColumn(
            "rel",
            F.when(F.col("url") == F.col("expected_url"), F.lit(1.0))
            .when(doc_group == F.col("expected_group"), F.lit(0.5))
            .otherwise(F.lit(0.0)),
        )
        .select("query_id", "rank", "url", "rel")
    )


def ir_metrics(graded: DataFrame, k: int = 5) -> DataFrame:
    """graded(query_id, rank, rel) → one row of corpus-level metrics.

    Binary metrics (P@1 / Hit@k / MRR@k) binarize at rel == 1 (exact),
    graded metrics (nDCG@k / ERR@k / Q@k) use 2^rel−1 gains — the same
    split the reference makes.
    """
    g = graded.filter(F.col("rank") <= k)
    exact = F.when(F.col("rel") >= 1.0, 1.0).otherwise(0.0)

    per_q = g.groupBy("query_id").agg(
        F.max(F.when((F.col("rank") == 1) & (F.col("rel") >= 1.0), 1.0).otherwise(0.0)).alias("p_at_1"),
        F.max(exact).alias("hit_at_k"),
        F.max((exact / F.col("rank"))).alias("mrr_at_k"),  # 1/first-exact-rank
        F.sum((GAIN()) / F.log2(F.col("rank") + 1.0)).alias("dcg"),
    )

    # ideal DCG from each query's own grades sorted desc (rank-insensitive)
    w = W.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("rank"))
    ideal = (
        g.withColumn("irank", F.row_number().over(w))
        .groupBy("query_id")
        .agg(F.sum(GAIN() / F.log2(F.col("irank") + 1.0)).alias("idcg"))
    )

    # ERR@k: Σ (1/r) · R_r · Π_{i<r} (1 − R_i),  R = (2^rel−1)/2^max_grade
    wr = W.partitionBy("query_id").orderBy("rank").rowsBetween(W.unboundedPreceding, -1)
    r_prob = (F.pow(F.lit(2.0), F.col("rel")) - 1.0) / F.lit(2.0)
    err_terms = (
        g.withColumn("r_prob", r_prob)
        .withColumn(
            "no_stop_before",
            F.coalesce(F.product(1.0 - F.col("r_prob")).over(wr), F.lit(1.0)),
        )
        .withColumn("err_term", F.col("no_stop_before") * F.col("r_prob") / F.col("rank"))
        .groupBy("query_id")
        .agg(F.sum("err_term").alias("err_at_k"))
    )

    # Q-measure@k: Σ_rel-positions (cum_gain + cum_ideal_bonus)/(rank + cum_ideal)
    # (simplified blended-ratio form of Sakai's Q-measure, β=1)
    wq = W.partitionBy("query_id").orderBy("rank").rowsBetween(W.unboundedPreceding, 0)
    wi = W.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("rank")).rowsBetween(
        W.unboundedPreceding, 0
    )
    ideal_cum = g.withColumn("ig", F.sum(GAIN()).over(wi)).select(
        "query_id", F.row_number().over(W.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("rank"))).alias("rank"), F.col("ig")
    )
    qm = (
        g.withColumn("cg", F.sum(GAIN()).over(wq))
        .join(ideal_cum, ["query_id", "rank"])
        .withColumn(
            "q_term",
            F.when(F.col("rel") > 0, (F.col("cg") + F.col("rank")) / (F.col("ig") + F.col("rank"))).otherwise(F.lit(0.0)),
        )
        .groupBy("query_id")
        .agg(
            F.sum("q_term").alias("q_sum"),
            F.sum(F.when(F.col("rel") > 0, 1.0).otherwise(0.0)).alias("n_rel"),
        )
        .withColumn(
            "q_at_k",
            F.when(F.col("n_rel") > 0, F.col("q_sum") / F.col("n_rel")).otherwise(F.lit(0.0)),
        )
        .select("query_id", "q_at_k")
    )

    per_query = (
        per_q.join(ideal, "query_id", "left")
        .join(err_terms, "query_id", "left")
        .join(qm, "query_id", "left")
        .withColumn(
            "ndcg_at_k",
            F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg")).otherwise(F.lit(0.0)),
        )
    )
    return per_query.agg(
        F.round(F.avg("p_at_1"), 4).alias("p_at_1"),
        F.round(F.avg("hit_at_k"), 4).alias("hit_at_k"),
        F.round(F.avg("mrr_at_k"), 4).alias("mrr_at_k"),
        F.round(F.avg("ndcg_at_k"), 4).alias("ndcg_at_k"),
        F.round(F.avg("err_at_k"), 4).alias("err_at_k"),
        F.round(F.avg("q_at_k"), 4).alias("q_at_k"),
        F.count("*").alias("n_queries"),
    )
