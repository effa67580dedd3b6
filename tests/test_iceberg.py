"""End-to-end exercise of the Iceberg MERGE sink — GATED BY
ENVIRONMENT, not by code: the container this repo develops in has no
Iceberg Spark runtime, so the whole module skips unless
`TS_ICEBERG_JAR` points at an iceberg-spark-runtime jar. On a lakehouse
deployment:

    TS_ICEBERG_JAR=/path/iceberg-spark-runtime-4.0_2.13-<v>.jar \
        python -m pytest tests/test_iceberg.py -q

The test builds its OWN SparkSession (the shared pytest session has no
Iceberg extension and Spark configs are fixed at context start), backed
by a local hadoop catalog in a temp dir, and drives the exact
`IcebergMergeSink` code paths jobs/upsert_table.py ships:
MERGE-INTO upsert (update + insert arms), the key-only insert-if-absent
MERGE, and multi-row-per-key replace.
"""

from __future__ import annotations

import os

import pytest

ICEBERG_JAR = os.environ.get("TS_ICEBERG_JAR")

pytestmark = pytest.mark.skipif(
    not (ICEBERG_JAR and os.path.isfile(ICEBERG_JAR)),
    reason="Iceberg runtime jar not present (set TS_ICEBERG_JAR) — "
    "environment gate; the parquet bucket sink covers S11/S12 here",
)


@pytest.fixture(scope="module")
def ispark(tmp_path_factory):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        # Spark configs (extensions, jars) are fixed at context start —
        # the Iceberg session cannot share the plain pytest context
        active.stop()
    wh = str(tmp_path_factory.mktemp("iceberg_wh"))
    s = (
        SparkSession.builder.appName("ts-iceberg-test")
        .master("local[4]")
        .config("spark.jars", ICEBERG_JAR)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", wh)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield s
    s.stop()


def test_iceberg_merge_upsert_and_replace(ispark):
    from theoremsearch_spark.sources.sinks import (
        IcebergMergeSink,
        iceberg_available,
    )

    assert iceberg_available(ispark)
    sink = IcebergMergeSink()
    tbl = "local.db.docs"
    ispark.sql("CREATE DATABASE IF NOT EXISTS local.db")
    ispark.sql(f"DROP TABLE IF EXISTS {tbl}")
    ispark.sql(f"CREATE TABLE {tbl} (url STRING, body STRING, v INT) USING iceberg")

    def rows(data):
        return ispark.createDataFrame(data, "url string, body string, v int")

    # S11 upsert: insert arm
    sink.upsert(ispark, tbl, rows([("a", "one", 1), ("b", "two", 1)]), "url")
    got = {r["url"]: (r["body"], r["v"]) for r in ispark.table(tbl).collect()}
    assert got == {"a": ("one", 1), "b": ("two", 1)}

    # S11 upsert: update arm wins, untouched keys survive
    sink.upsert(ispark, tbl, rows([("a", "ONE", 2), ("c", "three", 1)]), "url")
    got = {r["url"]: (r["body"], r["v"]) for r in ispark.table(tbl).collect()}
    assert got == {"a": ("ONE", 2), "b": ("two", 1), "c": ("three", 1)}

    # key-only batch → insert-if-absent MERGE (no empty UPDATE SET error)
    key_only = ispark.createDataFrame([("a",), ("d",)], "url string")
    ispark.sql(f"ALTER TABLE {tbl} SET TBLPROPERTIES ('write.merge.mode'='merge-on-read')")
    # widen key-only rows to the table schema with nulls for new keys
    from pyspark.sql import functions as F

    sink.upsert(
        ispark, tbl,
        key_only.withColumn("body", F.lit(None).cast("string"))
        .withColumn("v", F.lit(None).cast("int"))
        .select("url").withColumnRenamed("url", "url"),
        "url",
    )
    got = {r["url"] for r in ispark.table(tbl).collect()}
    assert got == {"a", "b", "c", "d"}
    # existing row 'a' untouched by the key-only merge
    assert ispark.table(tbl).filter("url = 'a'").collect()[0]["v"] == 2

    # S12 replace: multi-row-per-key table — ALL old rows for incoming
    # keys dropped, new rows (different count per key) land by NAME even
    # with a permuted source column order
    tbl2 = "local.db.units"
    ispark.sql(f"DROP TABLE IF EXISTS {tbl2}")
    ispark.sql(f"CREATE TABLE {tbl2} (url STRING, unit STRING, v INT) USING iceberg")
    sink.replace(
        ispark, tbl2,
        ispark.createDataFrame(
            [("a", "u1", 1), ("a", "u2", 1), ("b", "u1", 1)],
            "url string, unit string, v int",
        ),
        "url",
    )
    permuted = ispark.createDataFrame(
        [(9, "a", "u9")], "v int, url string, unit string"
    )
    sink.replace(ispark, tbl2, permuted, "url")
    got = sorted(
        (r["url"], r["unit"], r["v"]) for r in ispark.table(tbl2).collect()
    )
    assert got == [("a", "u9", 9), ("b", "u1", 1)]
