"""Relational operator library — SURVEY.md §2.2–§2.6 re-expressed Spark-first.

Every function takes (spark, sf_dir) and returns a DataFrame; each has a
paired ANSI-SQL oracle in ORACLES (run by the driver through DuckDB).
Column aliases match the oracle exactly (the driver hashes values after
sorting columns by name). Doubles that aggregate are rounded to 4
decimals on BOTH sides so float summation order can't flip the hash.

Operator ↔ reference map (file:line cites into /root/reference):
  P2 ilike            streamlit_app.py:179-186
  P3 array overlap    streamlit_app.py:189-191
  P4 isin             streamlit_app.py:194-195
  P5 conditional year streamlit_app.py:199-205
  P7 regex/ilike disj streamlit_app.py:215-226
  P9 between-or-null  streamlit_app.py:235-243
  J1 4-way equi-join  streamlit_app.py:276-279
  J2/W4 latest-per-grp streamlit_app.py:253-258 (DISTINCT ON)
  J3 anti-join        ec2/parse_arxiv_papers/__main__.py:167-175
  J4 semi-join        ec2/parse_arxiv_papers/__main__.py:162-165
  A1 count            ec2/rds/query.py:41-54
  A2 distinct unnest  streamlit_app.py:70-83
  A3 group-set build  streamlit_app.py:85-106
  A4 pivot w/ FILTER  compare_embeddings.py:514-520
  A6 corpus stats     streamlit_app.py:108-116
  W1 top-k            streamlit_app.py:281-282
  W2 two-stage rerank streamlit_app.py:317-363
  W6 rank-per-group   compare_embeddings.py:47-52
  W7 deterministic sample  ec2/rds/query.py:35-37 (ORDER BY RANDOM → hash gate)
  SO1 union-distinct  streamlit_app.py:486-491
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# -- flagship: TPC-H Q1-shaped pricing summary (scan → filter → agg) --------


def q_pricing_summary(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_filter_ilike(spark, sf_dir):  # P2
    return (
        t(spark, sf_dir, "part")
        .filter(F.col("p_type").ilike("%brass%"))
        .select("p_partkey", "p_name", "p_brand", "p_type")
    )


def q_filter_isin(spark, sf_dir):  # P4
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def q_filter_year_conditional(spark, sf_dir):  # P5
    o = t(spark, sf_dir, "orders")
    cond = F.when(
        F.col("o_orderstatus") == "F", F.year("o_orderdate").between(1995, 1996)
    ).otherwise(F.lit(True))
    return o.filter(cond).select("o_orderkey", "o_orderstatus").orderBy("o_orderkey")


def q_filter_between_or_null(spark, sf_dir):  # P9
    c = t(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_acctbal").between(0, 5000) | F.col("c_acctbal").isNull()
    ).select("c_custkey", F.round("c_acctbal", 4).alias("acctbal"))


def q_filter_regex_disjunction(spark, sf_dir):  # P7/P8
    p = t(spark, sf_dir, "part")
    return p.filter(
        F.lower(F.col("p_name")).rlike("green|blue") | F.col("p_brand").ilike("Brand#1%")
    ).select("p_partkey", "p_name", "p_brand")


def q_filter_array_overlap(spark, sf_dir):  # P3
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.filter(
        F.arrays_overlap(toks, F.array(F.lit("spark"), F.lit("window")))
    ).select("doc_id", "lang")


def q_join_4way(spark, sf_dir):  # J1: region ⋈ nation ⋈ customer ⋈ orders
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("r_name")
    )


def q_join_latest_per_group(spark, sf_dir):  # J2/W4: DISTINCT ON analog
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


def q_join_anti(spark, sf_dir):  # J3: customers with no orders
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def q_join_semi(spark, sf_dir):  # J4: customers with ≥1 open order
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")


def q_agg_counts(spark, sf_dir):  # A1
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey", "l_suppkey").alias("n_part_supp"),
    )


def q_agg_distinct_unnest(spark, sf_dir):  # A2: author-vocabulary analog
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .distinct()
        .orderBy("token")
    )


def q_agg_group_set(spark, sf_dir):  # A3: tags-per-source analog
    d = t(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("lang"))).alias("langs"),
            F.count("*").alias("n_docs"),
        )
        .orderBy("source")
    )


def q_agg_pivot_filter(spark, sf_dir):  # A4: MAX(...) FILTER analog
    e = t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        e.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.round(F.sum("value"), 4))
        .na.fill(0.0, types)
        .orderBy("user_id")
    )


def q_agg_corpus_stats(spark, sf_dir):  # A6: N/avgdl analog
    d = t(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )


def q_window_rank(spark, sf_dir):  # W6: rank within group
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_orderstatus", "rnk", "o_orderkey", F.round("o_totalprice", 4).alias("totalprice"))
    )


def q_window_running_sum(spark, sf_dir):  # W-extra: running aggregate
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(W.unboundedPreceding, 0)
    return e.withColumn(
        "running_value", F.round(F.sum("value").over(w), 4)
    ).select("event_id", "user_id", "running_value")


def q_topk(spark, sf_dir):  # W1: ORDER BY … LIMIT k → TakeOrderedAndProject
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 4).alias("totalprice"))
    )


def q_topk_two_stage(spark, sf_dir):  # W2: pool → rescore → top-k
    o = t(spark, sf_dir, "orders")
    pool = o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(50)
    rescored = pool.withColumn(
        "weighted_score",
        F.round(F.col("o_totalprice") * (1.0 + 0.1 * F.log(1.0 + F.col("o_custkey"))), 4),
    )
    return (
        rescored.orderBy(F.desc("weighted_score"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "weighted_score")
    )


def q_set_union_distinct(spark, sf_dir):  # SO1
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct().orderBy("nationkey")


def q_sample_deterministic(spark, sf_dir):  # W7: hash-gated sample
    o = t(spark, sf_dir, "orders")
    return o.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1) == "a"
    ).select("o_orderkey", "o_custkey")


def q_json_extract(spark, sf_dir):  # props JSON → typed column
    e = t(spark, sf_dir, "events")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .filter(F.col("k") > 50)
        .select("event_id", "k")
    )


def q_date_trunc_agg(spark, sf_dir):  # date/window bucketing
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .orderBy("day")
    )


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "filter_ilike": q_filter_ilike,
    "filter_isin": q_filter_isin,
    "filter_year_conditional": q_filter_year_conditional,
    "filter_between_or_null": q_filter_between_or_null,
    "filter_regex_disjunction": q_filter_regex_disjunction,
    "filter_array_overlap": q_filter_array_overlap,
    "join_4way": q_join_4way,
    "join_latest_per_group": q_join_latest_per_group,
    "join_anti": q_join_anti,
    "join_semi": q_join_semi,
    "agg_counts": q_agg_counts,
    "agg_distinct_unnest": q_agg_distinct_unnest,
    "agg_group_set": q_agg_group_set,
    "agg_pivot_filter": q_agg_pivot_filter,
    "agg_corpus_stats": q_agg_corpus_stats,
    "window_rank": q_window_rank,
    "window_running_sum": q_window_running_sum,
    "topk": q_topk,
    "topk_two_stage": q_topk_two_stage,
    "set_union_distinct": q_set_union_distinct,
    "sample_deterministic": q_sample_deterministic,
    "json_extract": q_json_extract,
    "date_trunc_agg": q_date_trunc_agg,
}

ORACLES = {
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty,
               round(sum(l_extendedprice), 4) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
               round(avg(l_quantity), 4) AS avg_qty,
               count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus ORDER BY 1, 2
    """,
    "filter_ilike": """
        SELECT p_partkey, p_name, p_brand, p_type FROM part
        WHERE p_type ILIKE '%brass%'
    """,
    "filter_isin": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    """,
    "filter_year_conditional": """
        SELECT o_orderkey, o_orderstatus FROM orders
        WHERE (o_orderstatus = 'F' AND EXTRACT(YEAR FROM o_orderdate) BETWEEN 1995 AND 1996)
           OR o_orderstatus <> 'F'
        ORDER BY o_orderkey
    """,
    "filter_between_or_null": """
        SELECT c_custkey, round(c_acctbal, 4) AS acctbal FROM customer
        WHERE c_acctbal BETWEEN 0 AND 5000 OR c_acctbal IS NULL
    """,
    "filter_regex_disjunction": """
        SELECT p_partkey, p_name, p_brand FROM part
        WHERE regexp_matches(lower(p_name), 'green|blue') OR p_brand ILIKE 'Brand#1%'
    """,
    "filter_array_overlap": """
        SELECT doc_id, lang FROM documents
        WHERE list_has_any(string_split(text, ' '), ['spark', 'window'])
    """,
    "join_4way": """
        SELECT r_name, round(sum(o_totalprice), 4) AS revenue, count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
    """,
    "join_latest_per_group": """
        SELECT o_custkey, o_orderkey, o_orderdate FROM (
            SELECT *, row_number() OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) rn
            FROM orders) WHERE rn = 1
    """,
    "join_anti": """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "join_semi": """
        SELECT c_custkey FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
    "agg_counts": """
        SELECT count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_orders,
               count(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp
        FROM lineitem
    """,
    "agg_distinct_unnest": """
        SELECT DISTINCT unnest(string_split(text, ' ')) AS token
        FROM documents ORDER BY token
    """,
    "agg_group_set": """
        SELECT source, string_agg(DISTINCT lang, ',' ORDER BY lang) AS langs,
               count(*) AS n_docs
        FROM documents GROUP BY source ORDER BY source
    """,
    "agg_pivot_filter": """
        SELECT user_id,
            round(coalesce(sum(value) FILTER (event_type = 'click'), 0), 4) AS click,
            round(coalesce(sum(value) FILTER (event_type = 'error'), 0), 4) AS error,
            round(coalesce(sum(value) FILTER (event_type = 'purchase'), 0), 4) AS purchase,
            round(coalesce(sum(value) FILTER (event_type = 'signup'), 0), 4) AS signup,
            round(coalesce(sum(value) FILTER (event_type = 'view'), 0), 4) AS view
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "agg_corpus_stats": """
        SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY lang ORDER BY lang
    """,
    "window_rank": """
        SELECT o_orderstatus, rnk, o_orderkey, round(o_totalprice, 4) AS totalprice
        FROM (SELECT *, row_number() OVER (
                PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC) rnk
              FROM orders)
        WHERE rnk <= 3
    """,
    "window_running_sum": """
        SELECT event_id, user_id,
               round(sum(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
        FROM events
    """,
    "topk": """
        SELECT o_orderkey, round(o_totalprice, 4) AS totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    "topk_two_stage": """
        WITH pool AS (SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50)
        SELECT o_orderkey,
               round(o_totalprice * (1.0 + 0.1 * ln(1.0 + o_custkey)), 4) AS weighted_score
        FROM pool
        ORDER BY weighted_score DESC, o_orderkey ASC LIMIT 10
    """,
    "set_union_distinct": """
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey FROM supplier ORDER BY nationkey
    """,
    "sample_deterministic": """
        SELECT o_orderkey, o_custkey FROM orders
        WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = 'a'
    """,
    "json_extract": """
        SELECT event_id, CAST(props->>'k' AS INT) AS k FROM events
        WHERE CAST(props->>'k' AS INT) > 50
    """,
    "date_trunc_agg": """
        SELECT date_trunc('day', ts) AS day, count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1 ORDER BY 1
    """,
}
