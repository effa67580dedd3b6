"""Supplementary benchmarks (bench.py is frozen for measurement).

Prints ONE JSON line. Covers:
  - noop-sink isolation (guide §1.4) of the serving entries — times the
    computation, not the sink/count;
  - SQ8 vs fp32 IVF serving at a REAL embedding dim (768): the byte cut
    is proven at dim 64 (bench.py), but dequant overhead dominates the
    scan there; at 768 the 4x scan-byte cut should pay (round-5 verdict
    "Next round" #4) — this records q/s for both plus recall overlap;
  - per-entry medians over --reps runs.

Usage: python bench_extra.py [--dim 768] [--vecs 20000] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--vecs", type=int, default=20000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--phrase-common", action="store_true",
        help="also time the ALL-STOPWORD phrase (worst-case k=0 pool: "
        "the AND candidate set is a large corpus fraction) through the "
        "positional path — the round-5 verdict's engine_phrase_common "
        "shape; the pool stays distributed (test-locked), this records "
        "the wall",
    )
    ap.add_argument("--docs", type=int, default=50000)
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from theoremsearch_spark.session import get_spark

    spark = get_spark("bench_extra", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from theoremsearch_spark.corpus import generate_vectors
    from theoremsearch_spark.functions.similarity import (
        ann_ivf_search,
        build_ann_index,
    )

    timings: dict[str, float] = {}
    extras: dict = {"dim": args.dim, "n_vecs": args.vecs, "cpus": cpus}

    def timed(name, fn, reps=None):
        best = None
        out = None
        for _ in range(reps or args.reps):
            t0 = time.monotonic()
            out = fn()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        return out

    work = tempfile.mkdtemp(prefix="ts_bench_extra_")
    try:
        if args.phrase_common:
            import pandas as pd

            from theoremsearch_spark.build import build_index
            from theoremsearch_spark.corpus import STOPWORDS, generate_documents
            from theoremsearch_spark.positions import build_positions
            from theoremsearch_spark.query import phrase_topk
            from theoremsearch_spark.stats import prepare_docs

            spark.sparkContext.setJobDescription("bench_extra: phrase-common fixture")
            generate_documents(spark, args.docs, partitions=cpus * 2).write.mode(
                "overwrite"
            ).parquet(f"{work}/documents")
            docs_r = prepare_docs(
                spark.read.parquet(f"{work}/documents"), work,
                num_partitions=cpus * 2,
            )
            build_index(
                docs_r, f"{work}/index", n_buckets=cpus, resume=False,
                salt_threshold=max(1000, args.docs // 3), n_segments=8,
            )
            build_positions(spark.read.parquet(f"{work}/docs"), f"{work}/index")
            # both tokens are designated stopwords (each in >50% of
            # docs): the conjunctive pool is a large corpus fraction —
            # exactly the shape that used to localize through the driver
            qs = pd.DataFrame(
                [(0, f"{STOPWORDS[0]} {STOPWORDS[1]}")],
                columns=["query_id", "query_text"],
            )
            spark.sparkContext.setJobDescription("bench_extra: engine_phrase_common")

            def serve_common():
                return phrase_topk(
                    spark, f"{work}/index", f"{work}/docs", qs, k=10,
                    positions_dir=f"{work}/index/positions",
                ).count()

            extras["phrase_common_rows"] = timed("engine_phrase_common", serve_common)
            extras["phrase_common_docs"] = args.docs
            return _emit(timings, extras)  # phrase-common only — skip ANN
        spark.sparkContext.setJobDescription("bench_extra: vector corpus")
        generate_vectors(
            spark, args.vecs, dim=args.dim, partitions=cpus * 2
        ).write.mode("overwrite").parquet(f"{work}/vectors")

        emb = spark.read.parquet(f"{work}/vectors")
        spark.sparkContext.setJobDescription("bench_extra: ann build fp32")
        timed(
            "ann_build_f32",
            lambda: build_ann_index(emb, f"{work}/ann32", n_centroids=256),
            reps=1,
        )
        spark.sparkContext.setJobDescription("bench_extra: ann build sq8")
        timed(
            "ann_build_sq8",
            lambda: build_ann_index(
                emb, f"{work}/ann8", n_centroids=256, quantize="sq8"
            ),
            reps=1,
        )

        qv = (
            emb.filter("vec_id < 64")
            .selectExpr("vec_id as query_id", "embedding as qvec")
            .toPandas()
        )

        def cells_bytes(root):
            return sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(f"{root}/cells")
                for f in fs
            )

        extras["cells_bytes_f32"] = cells_bytes(f"{work}/ann32")
        extras["cells_bytes_sq8"] = cells_bytes(f"{work}/ann8")

        def serve(root):
            # noop sink: computes every column of every row, no count
            # column-pruning shortcut and no sink cost (guide §1.4)
            ann_ivf_search(spark, root, qv, k=10).write.format("noop").mode(
                "overwrite"
            ).save()

        spark.sparkContext.setJobDescription("bench_extra: ann serve fp32 d%d" % args.dim)
        timed("ann_search_f32_noop", lambda: serve(f"{work}/ann32"))
        spark.sparkContext.setJobDescription("bench_extra: ann serve sq8 d%d" % args.dim)
        timed("ann_search_sq8_noop", lambda: serve(f"{work}/ann8"))
        extras["ann_f32_q_per_sec"] = round(len(qv) / timings["ann_search_f32_noop"], 2)
        extras["ann_sq8_q_per_sec"] = round(len(qv) / timings["ann_search_sq8_noop"], 2)

        # recall overlap of the two servings (same probes, same k)
        a = ann_ivf_search(spark, f"{work}/ann32", qv, k=10).toPandas()
        b = ann_ivf_search(spark, f"{work}/ann8", qv, k=10).toPandas()
        inter = len(
            set(zip(a.query_id, a.vec_id)) & set(zip(b.query_id, b.vec_id))
        )
        extras["sq8_vs_f32_overlap"] = round(inter / max(len(a), 1), 4)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)
        spark.stop()

    return _emit(timings, extras)


def _emit(timings: dict, extras: dict) -> int:
    print(
        json.dumps(
            {
                "metric": "supplementary: noop-isolated serving shapes",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "extras": extras,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
