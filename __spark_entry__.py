"""Driver contract for the spark-graft builder (PySpark target).

`entry` runs the flagship query at sf0.001; `queries()` maps every
implemented operator (SURVEY.md §2 + training-data pipeline ops) to a
(spark, sf_dir) → DataFrame callable; `oracle_sql()` pairs each with
DuckDB-runnable ANSI SQL. Probabilistic ops (MinHash/SimHash/LSH-ANN)
intentionally have no oracle — the driver records the weaker rows-only
check; their quality is locked by pytest instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from theoremsearch_spark.functions import dedup, similarity, textops
from theoremsearch_spark.operators import engine_queries, extra_queries, relational, stringops, unit_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pricing-summary aggregate over sf0.001 lineitem."""
    return relational.q_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for mod in (relational, stringops, textops, dedup, similarity, engine_queries, unit_queries, extra_queries):
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in (relational, stringops, textops, dedup, similarity, engine_queries, unit_queries, extra_queries):
        out.update(mod.ORACLES)
    return out
