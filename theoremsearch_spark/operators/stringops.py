"""String/scalar operators + programmatic predicate composition —
SURVEY §2.7 (T-family) and §2.2 P1, harness-checkable subset.

  P1  dynamic WHERE builder   /root/reference/ec2/rds/query.py:9-39
  T12 whitespace normalize    /root/reference/ec2/parse_papers/latex_parse.py:378
  T17 shorthand normalize     /root/reference/selective_ingest.py:100-114
  T19 id normalization        /root/reference/ec2/locate_arxiv_in_s3/__main__.py:17-24
  T20 type inference          /root/reference/streamlit_app.py:61-68
  T22 NUL strip               /root/reference/ec2/parse_arxiv_papers/plastex_method/parse.py:128-133
  J6  left enrichment join    /root/reference/compare_embeddings.py:488-520
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from theoremsearch_spark.operators.relational import t


def build_where(conditions: list[dict]) -> Column | None:
    """P1: the reference's conditional-conjunction builder, Column-typed:
    each {"if": bool, "condition": Column} is ANDed when enabled.
    Catalyst folds the conjunction exactly like hand-written filters."""
    out = None
    for c in conditions:
        if not c.get("if", True):
            continue
        out = c["condition"] if out is None else (out & c["condition"])
    return out


def q_filter_dynamic_where(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    cond = build_where(
        [
            {"if": True, "condition": F.col("o_orderstatus") == "F"},
            {"if": True, "condition": F.col("o_totalprice") > 100_000},
            {"if": False, "condition": F.col("o_custkey") < 0},  # disabled branch
        ]
    )
    return o.filter(cond).select("o_orderkey", "o_custkey").orderBy("o_orderkey")


def q_string_normalize(spark, sf_dir):
    """T12+T17+T19-shaped normalization chain over documents.text:
    collapse whitespace, strip a version-suffix-like trailing token
    pattern, extract the first token as an id."""
    d = t(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    return d.select(
        "doc_id",
        F.regexp_extract(F.col("text"), r"^(\w+)", 1).alias("first_token"),
        F.length(norm).alias("norm_len"),
        F.regexp_replace(F.col("text"), r"(dup|stream)", "X").substr(1, 40).alias("rewritten_prefix"),
    )


def q_type_infer(spark, sf_dir):
    """T20: first matching keyword decides the row's type."""
    d = t(spark, sf_dir, "documents")
    txt = F.col("text")
    inferred = (
        F.when(txt.contains("join"), F.lit("join"))
        .when(txt.contains("sort"), F.lit("sort"))
        .when(txt.contains("scan"), F.lit("scan"))
        .otherwise(F.lit("other"))
    )
    return (
        d.select("doc_id", inferred.alias("doc_type"))
        .groupBy("doc_type")
        .agg(F.count("*").alias("n"))
        .orderBy("doc_type")
    )


def q_join_left_enrich(spark, sf_dir):  # J6
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left")
        .select(
            "o_orderkey",
            F.coalesce("c_name", F.lit("UNKNOWN")).alias("customer_name"),
            "c_mktsegment",
        )
        .orderBy("o_orderkey")
    )


QUERIES = {
    "filter_dynamic_where": q_filter_dynamic_where,
    "string_normalize": q_string_normalize,
    "type_infer": q_type_infer,
    "join_left_enrich": q_join_left_enrich,
}

ORACLES = {
    "filter_dynamic_where": """
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_orderstatus = 'F' AND o_totalprice > 100000
        ORDER BY o_orderkey
    """,
    "string_normalize": r"""
        SELECT doc_id,
               regexp_extract(text, '^(\w+)', 1) AS first_token,
               length(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm_len,
               substring(regexp_replace(text, '(dup|stream)', 'X', 'g'), 1, 40) AS rewritten_prefix
        FROM documents
    """,
    "type_infer": """
        SELECT CASE WHEN contains(text, 'join') THEN 'join'
                    WHEN contains(text, 'sort') THEN 'sort'
                    WHEN contains(text, 'scan') THEN 'scan'
                    ELSE 'other' END AS doc_type,
               count(*) AS n
        FROM documents GROUP BY 1 ORDER BY 1
    """,
    "join_left_enrich": """
        SELECT o_orderkey, coalesce(c_name, 'UNKNOWN') AS customer_name, c_mktsegment
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        ORDER BY o_orderkey
    """,
}
