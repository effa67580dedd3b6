"""One "executor" of the multi-process scaling harness.

A real Spark cluster is N separate executor JVMs; this sandbox has no
cluster manager, so each executor is its own spark-submit-style process
(own JVM, own python workers) running `local[cores_per_executor]`.

Modes:
  build  — extract+tokenize+index ONE shard (a slice of input files)
           into out/gen_<shard> with a pre-computed doc-id base, then
           commit a row to the gens manifest (same layout as the
           streaming generations, so rank-identity is already tested).
  query  — serve a slice of the query batch against ALL generations
           with globally merged stats (streaming.topk_all_generations).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["build", "query"], required=True)
    p.add_argument("--shard", type=int, required=True)
    p.add_argument("--cores", type=int, default=4)
    p.add_argument("--out", required=True, help="index root (gens layout)")
    p.add_argument("--files", help="comma-separated input parquet files (build)")
    p.add_argument("--id-base", type=int, default=0)
    p.add_argument("--docs", type=int, help="corpus size, for query_set (query)")
    p.add_argument("--query-slice", help="start:stop over the replicated query batch")
    p.add_argument("--query-mult", type=int, default=8)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--barrier", help="path of the go-file; worker touches <path>.ready_<shard> and waits")
    args = p.parse_args()

    # co-located executors must split the host: heap sized per executor
    os.environ.setdefault("SPARK_DRIVER_MEM", "12g")

    from pyspark.sql import functions as F

    from theoremsearch_spark.session import get_spark

    spark = get_spark(f"exec{args.shard}_{args.mode}", cores=args.cores, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    # python-worker warmup (once per executor lifetime on a real cluster)
    from theoremsearch_spark.extract import doc_len_udf

    spark.range(0, args.cores * 4, numPartitions=args.cores * 4).select(
        doc_len_udf(F.col("id").cast("string")).alias("x")
    ).agg(F.sum("x")).collect()

    # start barrier: every executor warms up, signals ready, and begins
    # the timed phase together — otherwise one worker's timed window
    # absorbs its siblings' JVM-boot/JIT storms
    if args.barrier:
        ready = f"{args.barrier}.ready_{args.shard}"
        open(ready, "w").close()
        while not os.path.exists(args.barrier):
            time.sleep(0.05)

    t0 = time.monotonic()
    if args.mode == "build":
        from theoremsearch_spark.build import build_index
        from theoremsearch_spark.stats import prepare_docs

        files = args.files.split(",")
        documents = spark.read.parquet(*files)
        gen_dir = f"{args.out}/gen_{args.shard}"
        docs = prepare_docs(documents, gen_dir, id_base=args.id_base)
        n = docs.count()
        build_index(
            docs, f"{gen_dir}/index", n_buckets=16, resume=False,
            salt_threshold=max(1000, n // 3), n_segments=8,
        )
        from theoremsearch_spark.streaming.incremental import commit_generation

        commit_generation(args.out, args.shard, args.id_base, n)
        out = {"shard": args.shard, "mode": "build", "docs": n}
    else:
        import pandas as pd

        from theoremsearch_spark.corpus import query_set
        from theoremsearch_spark.streaming.incremental import topk_all_generations

        base = query_set(args.docs)[["query_id", "query_text"]]
        batch = pd.concat(
            [base.assign(query_id=base["query_id"] + i * 1000) for i in range(args.query_mult)],
            ignore_index=True,
        )
        start, stop = (int(x) for x in args.query_slice.split(":"))
        qs = batch.iloc[start:stop]
        hits = topk_all_generations(spark, args.out, qs, k=args.k)
        hits.write.mode("overwrite").parquet(f"{args.out}/topk_shard_{args.shard}")
        out = {"shard": args.shard, "mode": "query", "queries": len(qs)}

    out["wall_sec"] = round(time.monotonic() - t0, 2)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
