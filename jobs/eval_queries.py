"""spark-submit entry: IR-metric evaluation of the engine on the
planted query set — the analog of the reference's offline harness
(/root/reference/compare_embeddings.py).

Usage:
  spark-submit --py-files ts.zip jobs/eval_queries.py \
      --index <root from build_index over synth:N> --docs N [--k 5]

Prints one JSON line: {"p_at_1": ..., "hit_at_k": ..., "mrr_at_k": ...,
"ndcg_at_k": ..., "err_at_k": ..., "q_at_k": ..., "n_queries": 73}.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", required=True)
    p.add_argument("--docs", type=int, required=True, help="corpus size (query_set key)")
    p.add_argument("--k", type=int, default=5)
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("ts-eval").getOrCreate()
    from theoremsearch_spark.corpus import query_set
    from theoremsearch_spark.functions.evalmetrics import grade_hits, ir_metrics
    from theoremsearch_spark.query import topk_with_urls

    qs = query_set(args.docs)
    hits = topk_with_urls(
        spark, f"{args.index}/index", f"{args.index}/docs",
        qs[["query_id", "query_text"]], k=args.k,
    ).select("query_id", "rank", "url")
    qrels = spark.createDataFrame(qs[["query_id", "expected_url", "expected_group"]])
    row = ir_metrics(grade_hits(hits, qrels), k=args.k).collect()[0].asDict()
    print(json.dumps(row))
    return 0


if __name__ == "__main__":
    sys.exit(main())
