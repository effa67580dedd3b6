"""spark-submit entry: build and query a persisted IVF ANN index.

Usage:
  # build: partition the embeddings table into cell=N dirs
  spark-submit --py-files theoremsearch_spark.zip jobs/ann_index.py \
      build --embeddings <parquet with (vec_id, embedding)> \
      --out <index dir> [--centroids 64]

  # search: top-k cosine for query vectors, reading only probed cells
  spark-submit --py-files theoremsearch_spark.zip jobs/ann_index.py \
      search --index <index dir> \
      [--queries <parquet with (query_id, qvec)> | --self-queries N] \
      [--k 10] [--probe 8] [--out <parquet path>]

  # add: append a batch as a new generation (frozen quantizer);
  # ids with a stored prior version are tombstoned via the key index
  spark-submit ... jobs/ann_index.py add --embeddings <parquet> --index <dir> \
      [--no-upsert]

  # delete: tombstone ids out of serving (pure metadata write)
  spark-submit ... jobs/ann_index.py delete --index <dir> --ids 3,17,42

  # compact: rewrite cells dropping tombstoned rows, clear tombstones
  spark-submit ... jobs/ann_index.py compact --index <dir>

The persisted analog of the in-memory `ann_ivf_topk`: cells are parquet
partition directories, so a probe is a directory read —
O(n_probe/n_centroids) of the corpus per query batch, the same physics
as the posting-list index. Replaces the reference's pgvector `<#>` scan
(/root/reference/streamlit_app.py:275,281) with a Spark-native layout.

Prints one JSON line per invocation.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["build", "search", "add", "delete", "compact"])
    p.add_argument("--embeddings", help="build/add: source parquet (vec_id, embedding)")
    p.add_argument("--out", help="build: index dir / search: result parquet")
    p.add_argument("--index", help="index dir from build (all modes but build)")
    p.add_argument("--centroids", type=int, default=None)
    p.add_argument(
        "--quantize", choices=["sq8"], default=None,
        help="build: store vectors as per-vector-scaled int8 (~4x less "
        "probed-cell IO at serve time; recall within the SQ8 envelope)",
    )
    p.add_argument("--queries", help="search: parquet with (query_id, qvec)")
    p.add_argument(
        "--self-queries", type=int, default=0,
        help="search: use the first N indexed vectors as queries",
    )
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--probe", type=int, default=None)
    p.add_argument(
        "--rescore-col",
        help="search: stored metadata column for the two-stage weighted "
        "rescore (wscore = cos + weight*ln(col); the reference's "
        "citation-weight mode)",
    )
    p.add_argument("--rescore-weight", type=float, default=0.05)
    p.add_argument(
        "--pool", type=int, default=None,
        help="search: candidate pool per query before rescoring "
        "(default max(50, 10k))",
    )
    p.add_argument(
        "--where",
        help="search: SQL predicate over the index's stored metadata "
        "columns, applied inside the probed-cell scan (filter-before-"
        "rank; pair selective filters with a larger --probe)",
    )
    p.add_argument(
        "--max-batch", type=int, default=0,
        help="search: serve in bounded chunks of this many queries "
        "(0 = one batch); serve-prep (meta + tombstone set) runs once "
        "and is shared across chunks",
    )
    p.add_argument(
        "--no-upsert", action="store_true",
        help="add: skip the prior-version lookup (caller guarantees fresh ids)",
    )
    p.add_argument("--ids", help="delete: comma-separated vec_ids")
    p.add_argument(
        "--last-n", type=int, default=None,
        help="compact: tiered — merge only the NEWEST N generations "
        "(the micro-batch tier), leaving older generations untouched; "
        "omit for a full merge that also clears tombstones",
    )
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName(f"ts-ann-{args.mode}").getOrCreate()
    from pyspark.sql import functions as F

    from theoremsearch_spark.functions.similarity import (
        N_CENTROIDS,
        N_PROBE,
        add_to_ann_index,
        ann_ivf_search,
        build_ann_index,
        compact_ann_index,
        delete_from_ann_index,
    )

    t0 = time.monotonic()
    if args.mode == "build":
        if not (args.embeddings and args.out):
            p.error("build requires --embeddings and --out")
        # every column beyond (vec_id, embedding) rides into the cells
        # as filterable metadata for `search --where`
        emb = spark.read.parquet(args.embeddings)
        for c in ("vec_id", "embedding"):
            if c not in emb.columns:
                p.error(f"--embeddings parquet lacks required column {c!r}")
        res = build_ann_index(
            emb, args.out, n_centroids=args.centroids or N_CENTROIDS,
            quantize=args.quantize,
        )
        out = {"job": "ann_index_build", **res}
    elif args.mode == "add":
        if not (args.embeddings and args.index):
            p.error("add requires --embeddings and --index")
        # must carry the same metadata columns the index was built with
        emb = spark.read.parquet(args.embeddings)
        res = add_to_ann_index(emb, args.index, upsert=not args.no_upsert)
        out = {"job": "ann_index_add", **res}
    elif args.mode == "delete":
        if not (args.index and args.ids):
            p.error("delete requires --index and --ids")
        ids = [int(s) for s in args.ids.split(",") if s.strip()]
        res = delete_from_ann_index(spark, args.index, ids)
        out = {"job": "ann_index_delete", **res}
    elif args.mode == "compact":
        if not args.index:
            p.error("compact requires --index")
        res = compact_ann_index(spark, args.index, last_n=args.last_n)
        out = {"job": "ann_index_compact", **res}
    else:
        if not args.index:
            p.error("search requires --index")
        if args.self_queries:
            from theoremsearch_spark.functions.similarity import live_cells

            # LIVE versions only: an upserted/streamed index stores the
            # stale generations of a re-embedded id in its cells too —
            # live_cells applies the committed+untombstoned visibility
            # rule, so each self-query id appears exactly once
            qp = (
                live_cells(spark, args.index)
                .filter(F.col("vec_id") < args.self_queries)
                .select(
                    F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("qvec"),
                )
                .toPandas()
            )
        elif args.queries:
            qp = spark.read.parquet(args.queries).toPandas()[["query_id", "qvec"]]
        else:
            p.error("search requires --queries or --self-queries")
        from theoremsearch_spark.functions.similarity import ann_ivf_search_batched

        chunk_times: list = []
        hits = ann_ivf_search_batched(
            spark, args.index, qp, k=args.k, n_probe=args.probe or N_PROBE,
            where=args.where, rescore_col=args.rescore_col,
            rescore_weight=args.rescore_weight, pool=args.pool,
            max_batch=args.max_batch, chunk_times=chunk_times,
        )
        if args.out:
            hits.write.mode("overwrite").parquet(args.out)
            n = spark.read.parquet(args.out).count()
        else:
            hits.orderBy("query_id", "rnk").show(20, truncate=False)
            n = hits.count()
        out = {"job": "ann_index_search", "queries": len(qp), "result_rows": n}
        if chunk_times:
            st = sorted(chunk_times)
            out["chunks"] = len(st)
            out["chunk_p50_sec"] = round(st[len(st) // 2], 3)
            out["chunk_p95_sec"] = round(st[min(len(st) - 1, int(len(st) * 0.95))], 3)
    out["wall_sec"] = round(time.monotonic() - t0, 2)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
