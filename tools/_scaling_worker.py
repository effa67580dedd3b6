"""Subprocess worker for bench_scaling: one parallelism level, fresh JVM.

Prints one JSON line: {"cores": N, "build_sec": ..., "query_sec": ...,
"docs": n, "n_queries": m}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--cores", type=int, required=True)
    p.add_argument("--docs", type=int, required=True)
    p.add_argument("--documents", required=True, help="pre-generated documents parquet")
    p.add_argument("--work", required=True)
    p.add_argument("--query-mult", type=int, default=8)
    p.add_argument(
        "--max-batch", type=int, default=0,
        help="serve in bounded chunks (topk_batched) — 0 = one batch",
    )
    args = p.parse_args()

    from theoremsearch_spark.session import get_spark

    # identical logical plan + partitioning at every core count (64
    # shuffle partitions / buckets); ONLY the executor-thread count
    # varies — the cluster-scaling analog
    spark = get_spark(f"scaling_{args.cores}", cores=args.cores, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    import pandas as pd

    from theoremsearch_spark.build import build_index
    from theoremsearch_spark.corpus import query_set
    from theoremsearch_spark.query import topk, topk_batched
    from theoremsearch_spark.stats import prepare_docs

    shutil.rmtree(args.work, ignore_errors=True)
    documents = spark.read.parquet(args.documents)

    # warm the python workers (daemon spawn + per-worker pandas import is
    # a one-time ~5s per-JVM tax; a long-running cluster job pays it once
    # per executor, so it does not belong in steady-state throughput)
    from pyspark.sql import functions as F

    from theoremsearch_spark.extract import doc_len_udf

    spark.range(0, args.cores * 4, numPartitions=args.cores * 4).select(
        doc_len_udf(F.col("id").cast("string")).alias("x")
    ).agg(F.sum("x")).collect()

    t0 = time.monotonic()
    docs_r = prepare_docs(documents, args.work, num_partitions=64)
    prep_sec = time.monotonic() - t0
    t1 = time.monotonic()
    build_index(
        docs_r,
        f"{args.work}/index",
        n_buckets=64,
        resume=False,
        salt_threshold=max(1000, args.docs // 3),
        n_segments=8,
    )
    index_sec = time.monotonic() - t1
    build_sec = time.monotonic() - t0

    # batch query workload: the 73-query set replicated query_mult× with
    # distinct query_ids (a realistic batch-serving bundle size)
    base = query_set(args.docs)[["query_id", "query_text"]]
    batches = []
    for i in range(args.query_mult):
        b = base.copy()
        b["query_id"] = b["query_id"] + i * 1000
        batches.append(b)
    qs = pd.concat(batches, ignore_index=True)

    # serving steady-state: one small warmup batch compiles the query
    # path (codegen + python-worker spin-up) — a long-lived serving
    # cluster pays that once, not per batch
    topk(spark, f"{args.work}/index", base.head(8), k=10).count()

    t0 = time.monotonic()
    n = topk_batched(
        spark, f"{args.work}/index", qs, k=10, max_batch=args.max_batch
    ).count()
    query_sec = time.monotonic() - t0

    print(
        json.dumps(
            {
                "cores": args.cores,
                "build_sec": round(build_sec, 2),
                "prep_sec": round(prep_sec, 2),
                "index_sec": round(index_sec, 2),
                "query_sec": round(query_sec, 2),
                "docs": args.docs,
                "n_queries": len(qs),
                "topk_rows": n,
            }
        )
    )
    spark.stop()
    shutil.rmtree(args.work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
