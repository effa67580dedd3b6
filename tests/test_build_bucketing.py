"""Postings bucket assignment: bucket == the shuffle's own partition id
(one reducer per bucket, no balls-into-bins stragglers), and the
cross-version resume guard that protects the mapping."""

import json

import pytest
from pyspark.sql import functions as F

from theoremsearch_spark.build import BUCKET_RULE, _check_bucket_rule


def test_bucket_equals_shuffle_partition(spark):
    """pmod(murmur3(term_id, segment), n) must be EXACTLY the partition
    HashPartitioning assigns for repartition(n, term_id, segment) —
    the invariant that makes the postings write one-task-per-bucket."""
    n = 16
    df = spark.range(20000).select(
        (F.col("id") * 2_654_435_761).alias("term_id"),
        (F.col("id") % 8).cast("int").alias("segment"),
    )
    r = (
        df.repartition(n, "term_id", "segment")
        .withColumn("pid", F.spark_partition_id())
        .withColumn("bucket", F.pmod(F.hash("term_id", "segment"), F.lit(n)))
    )
    assert r.filter("pid != bucket").count() == 0
    # and the split is even: no reducer holds more than ~2x the mean
    sizes = [row["c"] for row in r.groupBy("pid").agg(F.count("*").alias("c")).collect()]
    assert len(sizes) == n
    assert max(sizes) < 2 * (sum(sizes) / len(sizes))


def test_bucket_rule_guard(tmp_path):
    out = str(tmp_path / "idx")
    # fresh build: records the rule
    _check_bucket_rule(out, set())
    with open(f"{out}/bucket_rule.json") as fh:
        assert json.load(fh)["rule"] == BUCKET_RULE
    # same-rule resume with completed buckets: fine
    _check_bucket_rule(out, {0, 1})
    # partial build under a DIFFERENT rule: refuse to resume
    with open(f"{out}/bucket_rule.json", "w") as fh:
        json.dump({"rule": "xxhash64-legacy"}, fh)
    with pytest.raises(RuntimeError, match="bucket rule"):
        _check_bucket_rule(out, {0})
    # legacy partial build with NO rule record: refuse too
    import os

    os.remove(f"{out}/bucket_rule.json")
    with pytest.raises(RuntimeError, match="bucket-rule record"):
        _check_bucket_rule(out, {0})
