"""widen_small_input contract: a no-op at scale, a parallelism fix on
small single-file inputs (the driver-table shape)."""

from theoremsearch_spark.functions.widen import widen_small_input


def test_widen_is_noop_on_wide_input(spark):
    """An input with >= session parallelism partitions passes through
    UNTOUCHED — no shuffle is ever added to a real (wide) corpus."""
    par = spark.sparkContext.defaultParallelism
    wide = spark.range(1000).repartition(par + 8)
    assert widen_small_input(wide) is wide


def test_widen_spreads_narrow_input(spark):
    par = spark.sparkContext.defaultParallelism
    narrow = spark.range(1000).coalesce(1)
    out = widen_small_input(narrow)
    assert out.rdd.getNumPartitions() == par
    assert out.count() == 1000
