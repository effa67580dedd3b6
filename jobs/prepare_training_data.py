"""spark-submit entry: web-scale training-data preparation pipeline.

Usage:
  spark-submit --py-files theoremsearch_spark.zip jobs/prepare_training_data.py \
      --input <documents parquet | synth:N> --out <dir> \
      [--langs en] [--min-tokens 20] [--max-tokens 100000] \
      [--near-dup-threshold 0.8] [--build-index]

The LLM-corpus shape of the engine's operators, chained end-to-end:

  1. extract + tokenize (one Arrow pass, stats.prepare_docs)
  2. quality gate      (token count bounds, distinct-token ratio,
                        mean token length — textops semantics)
  3. language filter   (declared lang whitelist)
  4. section gate      (optional --max-section-dup-rate: drop WHOLE
                        host/path sections whose exact-dup share says
                        mirror/spam farm — host_section_stats + one
                        broadcast anti-join, the CCNet-style host
                        filter BEFORE doc-level dedup)
  5. decontamination   (optional --benchmark parquet: docs sharing any
                        word n-gram with the eval set are dropped —
                        broadcast shingle semi-join)
  6. exact dedup       (content fingerprint, min-doc_id survivor)
  7. near dedup        (MinHash+LSH, capped buckets, exact-Jaccard
                        verified; cluster-canonical survivor)
  8. optional index    (salted, compressed, resumable build_index)

Every stage is a declarative DataFrame op over the previous stage's
parquet output, so Catalyst prunes/pushes and each stage is
independently restartable; per-stage row counts print as one JSON line
(the pipeline's lineage record, analog of the reference's per-batch
parse_rate meters, /root/reference/ec2/parse_arxiv_papers/__main__.py:266).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession, functions as F


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--langs", default="en")
    p.add_argument("--min-tokens", type=int, default=20)
    p.add_argument("--max-tokens", type=int, default=100_000)
    p.add_argument("--min-distinct-ratio", type=float, default=0.2)
    p.add_argument("--max-mean-token-len", type=float, default=12.0)
    p.add_argument("--near-dup-threshold", type=float, default=0.8)
    p.add_argument(
        "--max-section-dup-rate", type=float, default=None,
        help="drop every doc of a host/path section whose exact-dup "
             "share exceeds this (mirror/spam-farm gate); default off",
    )
    p.add_argument(
        "--benchmark",
        help="parquet with (bench_id, text): drop docs sharing any "
             "word n-gram with this eval set (decontamination)",
    )
    p.add_argument(
        "--decontam-n", type=int, default=8,
        help="decontamination n-gram size (industry range 8-13)",
    )
    p.add_argument("--build-index", action="store_true")
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("ts-prepare-training-data").getOrCreate()
    from theoremsearch_spark.corpus import generate_documents
    from theoremsearch_spark.functions.dedup import (
        dedup_cluster_labels,
        minhash_lsh_pairs,
    )
    from theoremsearch_spark.stats import prepare_docs

    t0 = time.monotonic()
    counts: dict[str, int] = {}

    if args.input.startswith("synth:"):
        documents = generate_documents(spark, int(args.input.split(":", 1)[1]))
    else:
        documents = spark.read.parquet(args.input)

    docs = prepare_docs(documents, args.out)
    counts["input"] = docs.count()

    # quality gate — pure column predicates, pushed into the scan.
    # Both ratios derive from the SAME tokenization that produced
    # doc_len: term_tfs is "term:tf term:tf …" over tokenize(), so the
    # distinct count is its entry count and the summed token length is
    # Σ len(term)·tf — no second (whitespace) token definition that
    # would let distinct_ratio exceed 1 or skew mean_tok_len on
    # punctuated text.
    tf_entries = F.split(F.col("term_tfs"), " ")
    n_distinct = F.when(F.col("doc_len") > 0, F.size(tf_entries)).otherwise(F.lit(0))
    distinct_ratio = n_distinct / F.greatest(F.col("doc_len"), F.lit(1))
    total_tok_chars = F.aggregate(
        F.when(F.col("doc_len") > 0, tf_entries).otherwise(F.array().cast("array<string>")),
        F.lit(0).cast("long"),
        lambda acc, e: acc
        + F.length(F.substring_index(e, ":", 1)).cast("long")
        * F.substring_index(e, ":", -1).cast("long"),
    )
    mean_tok_len = total_tok_chars / F.greatest(F.col("doc_len"), F.lit(1))
    quality = (
        docs.filter(F.col("doc_len").between(args.min_tokens, args.max_tokens))
        .filter(distinct_ratio >= args.min_distinct_ratio)
        .filter(mean_tok_len <= args.max_mean_token_len)
    )
    langs = [s for s in args.langs.split(",") if s]
    if langs:
        quality = quality.filter(F.col("lang").isin(langs))
    quality.write.mode("overwrite").parquet(f"{args.out}/quality")
    quality = spark.read.parquet(f"{args.out}/quality")
    counts["after_quality_lang"] = quality.count()

    if args.max_section_dup_rate is not None:
        # host/section spam gate BEFORE doc-level dedup: a section
        # whose exact-dup share exceeds the policy is a mirror or a
        # template farm — drop it wholesale. host_section_stats is one
        # groupBy; the section table is tiny, so the drop is a
        # broadcast anti-join (the corpus reads once, never shuffles).
        from theoremsearch_spark.functions.textops import host_section_stats

        sec = F.regexp_extract(F.col("url"), r"^https?://([^/]+/[^/]+)/", 1)
        stats = host_section_stats(
            quality.select(
                "url",
                F.col("extracted_text").alias("text"),
                F.length("extracted_text").alias("n_chars"),
            ),
            sec,
        )
        bad = stats.filter(
            F.col("n_exact_dup_docs")
            / F.greatest(F.col("n_docs"), F.lit(1))
            > args.max_section_dup_rate
        ).select("section")
        quality = (
            quality.withColumn("__sec", sec)
            .join(
                F.broadcast(bad),
                F.col("__sec") == F.col("section"),
                "left_anti",
            )
            .drop("__sec")
        )
        counts["after_section_gate"] = quality.count()

    if args.benchmark:
        # decontamination: docs sharing any word n-gram with the eval
        # set never enter the training mix (broadcast shingle semi-join
        # — the corpus side reads once, never shuffles)
        from theoremsearch_spark.functions.dedup import benchmark_contamination

        bench = spark.read.parquet(args.benchmark)
        flagged = benchmark_contamination(
            quality.select("doc_id", F.col("extracted_text").alias("text")),
            bench,
            n=args.decontam_n,
        ).select("doc_id")
        quality = quality.join(flagged, "doc_id", "left_anti")
        counts["after_decontamination"] = quality.count()

    # exact dedup: min-doc_id survivor per content fingerprint
    fp = quality.select(
        "doc_id", F.md5(F.lower(F.col("extracted_text"))).alias("fp")
    )
    survivors = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    exact = quality.join(survivors, "doc_id")
    exact.write.mode("overwrite").parquet(f"{args.out}/exact_dedup")
    exact = spark.read.parquet(f"{args.out}/exact_dedup")
    counts["after_exact_dedup"] = exact.count()

    # near dedup: MinHash+LSH candidates, exact-Jaccard verified, then
    # CLUSTER-CANONICAL dropping: connected components over the pair
    # graph, keep the min-doc_id doc of each component. Dropping every
    # later pair member instead would over-drop chains (A~B, B~C, A!~C
    # keeps only A; boilerplate chains are long at web scale).
    pairs = minhash_lsh_pairs(
        exact.select("doc_id", F.col("extracted_text").alias("text")),
        threshold=args.near_dup_threshold,
    )
    drop = (
        dedup_cluster_labels(pairs)
        .filter(F.col("doc_id") != F.col("canon"))
        .select("doc_id")
    )
    clean = exact.join(drop, "doc_id", "left_anti")
    clean.write.mode("overwrite").parquet(f"{args.out}/clean")
    clean = spark.read.parquet(f"{args.out}/clean")
    counts["after_near_dedup"] = clean.count()

    result = {
        "job": "prepare_training_data",
        **counts,
        "kept_pct": round(100.0 * counts["after_near_dedup"] / max(counts["input"], 1), 2),
        "wall_sec": round(time.monotonic() - t0, 2),
    }

    if args.build_index:
        from theoremsearch_spark.build import build_index

        r = build_index(clean, f"{args.out}/index", resume=True)
        result["index"] = r

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
