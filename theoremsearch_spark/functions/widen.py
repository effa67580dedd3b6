"""Input-parallelism guard shared by the scan-heavy operator families.

A driver/test table often arrives as ONE parquet file = one scan
partition, which would run an expensive per-row projection (shingle
hashing, signature UDFs, cosine dot products) single-threaded no matter
how many cores the session has. `widen_small_input` repartitions only
when the input has fewer partitions than the session's parallelism —
a no-op at scale, where real corpora already carry ≥ parallelism
partitions and the (useless) shuffle is skipped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_small_input(docs: DataFrame) -> DataFrame:
    sc = docs.sparkSession.sparkContext
    if docs.rdd.getNumPartitions() < sc.defaultParallelism:
        return docs.repartition(sc.defaultParallelism)
    return docs
