"""Batch BM25 top-k serving over the inverted index.

Replaces the reference's serving path — pgvector `<#>` top-k with
conjunctive metadata filters pushed inside the ranked query
(/root/reference/streamlit_app.py:252-283) — with posting-list
retrieval:

  1. tokenize the query batch (driver-side; the query set is small, the
     reference's is 73 rows — /root/reference/validation_set.csv);
  2. scan only the posting blocks of the touched terms — the `term
     IN (...)` predicate is pushed into the parquet scan, so the job
     reads a few MB of a multi-TB index;
  3. fan blocks out to queries with a broadcast (term → query) join;
  4. one task per query group (`applyInPandas` over query_id — at real
     batch sizes thousands of queries spread over all executors);
  5. inside the task: vectorized block-max pruning (MaxScore/WAND
     family): terms are processed rarest-first with exact partial
     scores; once the summed upper bound (idf·max_tf_norm) of the
     remaining (long, stopword) lists falls below the running kth
     score, those lists are only consulted for candidate docs, and only
     the blocks whose [first_doc, last_doc] range intersects a
     candidate (binary search on block metadata) are decoded at all;
  6. survivors are re-scored exactly in canonical term order (so engine
     scores are bit-compatible with the single-node oracle), then
     top-k by (score DESC, doc_id ASC) — the reference's deterministic
     tie-break (/root/reference/streamlit_app.py:362).

The final global `orderBy(score, doc_id).limit(k)` per query happens
inside the group task; across queries results are just unioned (no
global shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from theoremsearch_spark import codec
from theoremsearch_spark.extract import tokenize

TOPK_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.IntegerType(), False),
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


def idf(n_docs: int, df: np.ndarray) -> np.ndarray:
    """Lucene-style BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5)).

    Always positive — required for block upper bounds to be sound."""
    df = np.asarray(df, dtype=np.float64)
    return np.log1p((n_docs - df + 0.5) / (df + 0.5))


def _score_group(
    pdf: pd.DataFrame, *, n_docs: int, avgdl: float, k1: float, b: float, k: int
) -> pd.DataFrame:
    """Score one query's posting blocks; returns top-k rows.

    pdf columns: query_id, term, df, segment, block_id, first_doc,
    last_doc, n_docs, max_tf_norm, doc_bytes, tf_bytes, dl_bytes.
    """
    if pdf.empty:
        return pd.DataFrame(columns=["query_id", "rank", "doc_id", "score"])
    qid = int(pdf["query_id"].iloc[0])

    # per-term metadata (a term's segments all share df/idf)
    terms = pdf.groupby("term", sort=True).agg(df=("df", "first")).reset_index()
    terms["idf"] = idf(n_docs, terms["df"].to_numpy())
    # list upper bound = idf * max over the term's blocks of max_tf_norm
    ub = pdf.groupby("term")["max_tf_norm"].max()
    terms["ub"] = terms["idf"].to_numpy() * ub.loc[terms["term"]].to_numpy()
    # process rarest-first (cheapest exact scoring first → early threshold)
    order = terms.sort_values(["df", "term"]).reset_index(drop=True)

    decoded: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}

    by_term = {t: g for t, g in pdf.groupby("term", sort=False)}

    def decode_term_full(term: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        g = by_term[term].sort_values(["segment", "block_id"])
        ids, tfs, dls = [], [], []
        for _, r in g.iterrows():
            d, t_ = codec.decode_block(r["doc_bytes"], r["tf_bytes"])
            ids.append(d.astype(np.int64))
            tfs.append(t_.astype(np.int64))
            dls.append(codec.varbyte_decode(r["dl_bytes"]).astype(np.int64))
        di = np.concatenate(ids) if ids else np.empty(0, np.int64)
        tf = np.concatenate(tfs) if tfs else np.empty(0, np.int64)
        dl = np.concatenate(dls) if dls else np.empty(0, np.int64)
        o = np.argsort(di, kind="stable")  # segments are doc-disjoint → merge
        return di[o], tf[o], dl[o]

    def decode_term_candidates(term: str, cand: np.ndarray):
        """Decode only blocks whose [first_doc,last_doc] contains a candidate."""
        if cand.size == 0:
            return (np.empty(0, np.int64),) * 3
        g = by_term[term]
        first = g["first_doc"].to_numpy(np.int64)
        last = g["last_doc"].to_numpy(np.int64)
        # block survives if any candidate in range (cand sorted)
        lo = np.searchsorted(cand, first, side="left")
        hit = (lo < cand.size) & (cand[np.minimum(lo, cand.size - 1)] <= last)
        g = g.iloc[np.flatnonzero(hit)]
        ids, tfs, dls = [], [], []
        for _, r in g.iterrows():
            d, t_ = codec.decode_block(r["doc_bytes"], r["tf_bytes"])
            ids.append(d.astype(np.int64))
            tfs.append(t_.astype(np.int64))
            dls.append(codec.varbyte_decode(r["dl_bytes"]).astype(np.int64))
        if not ids:
            return (np.empty(0, np.int64),) * 3
        di = np.concatenate(ids)
        tf = np.concatenate(tfs)
        dl = np.concatenate(dls)
        o = np.argsort(di, kind="stable")
        return di[o], tf[o], dl[o]

    def tf_norm(tf: np.ndarray, dl: np.ndarray) -> np.ndarray:
        return (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))

    # phase 1: exact partial scoring, rarest-first, with suffix-UB cutoff
    # (vectorized sorted-merge accumulation — no per-posting Python)
    ubs = order["ub"].to_numpy()
    suffix_ub = np.concatenate([np.cumsum(ubs[::-1])[::-1], [0.0]])
    ids_acc = np.empty(0, dtype=np.int64)
    sc_acc = np.empty(0, dtype=np.float64)
    threshold = -np.inf
    stop_at = len(order)
    for i, row in order.iterrows():
        if ids_acc.size >= k and suffix_ub[i] < threshold:
            stop_at = i
            break
        di, tf, dl = decode_term_full(row["term"])
        decoded[row["term"]] = (di, tf, dl)
        contrib = row["idf"] * tf_norm(tf, dl)
        if ids_acc.size == 0:
            ids_acc, sc_acc = di.copy(), contrib.astype(np.float64)
        else:
            merged = np.union1d(ids_acc, di)
            ms = np.zeros(merged.size, dtype=np.float64)
            ms[np.searchsorted(merged, ids_acc)] += sc_acc
            ms[np.searchsorted(merged, di)] += contrib
            ids_acc, sc_acc = merged, ms
        if ids_acc.size >= k:
            threshold = float(np.partition(sc_acc, -k)[-k])

    # phase 2: candidates = docs whose partial + remaining UB could reach top-k
    remaining = order.iloc[stop_at:]
    cand_ids, cand_partial = ids_acc, sc_acc
    if len(remaining) and cand_ids.size:
        rem_ub = float(remaining["ub"].sum())
        keep = cand_partial + rem_ub >= threshold
        cand_ids = cand_ids[keep]
    cand_sorted = cand_ids  # already sorted (union1d invariant)

    # decode remaining (long) lists only where candidates live
    for _, row in remaining.iterrows():
        decoded[row["term"]] = decode_term_candidates(row["term"], cand_sorted)

    # phase 3: exact re-score of candidates in canonical (lexicographic)
    # term order — bitwise-reproducible vs the single-node oracle
    final = np.zeros(cand_sorted.size, dtype=np.float64)
    for term in sorted(decoded):
        di, tf, dl = decoded[term]
        if di.size == 0 or cand_sorted.size == 0:
            continue
        t_idf = float(terms.loc[terms["term"] == term, "idf"].iloc[0])
        pos = np.searchsorted(cand_sorted, di)
        ok = (pos < cand_sorted.size) & (cand_sorted[np.minimum(pos, cand_sorted.size - 1)] == di)
        contrib = t_idf * tf_norm(tf[ok], dl[ok])
        np.add.at(final, pos[ok], contrib)

    nz = final > 0
    ids, sc = cand_sorted[nz], final[nz]
    take = min(k, ids.size)
    # top-k by (score DESC, doc_id ASC); ids ascending → stable mergesort
    o = np.argsort(-sc, kind="stable")[:take]
    return pd.DataFrame(
        {
            "query_id": qid,
            "rank": np.arange(1, take + 1, dtype=np.int32),
            "doc_id": ids[o],
            "score": sc[o],
        }
    )


def load_index_meta(spark: SparkSession, index_dir: str) -> dict:
    row = spark.read.parquet(f"{index_dir}/doc_stats").collect()[0]
    return {k: row[k] for k in ("n_docs", "avgdl", "k1", "b")}


def topk_frames(
    spark: SparkSession,
    blocks: DataFrame,
    tstats: pd.DataFrame,
    queries: pd.DataFrame,
    *,
    n_docs: int,
    avgdl: float,
    k1: float,
    b: float,
    k: int = 10,
) -> DataFrame:
    """Batch top-k over explicit frames: `blocks` = posting blocks
    (possibly a union of index generations), `tstats` = pandas term
    dictionary (term, term_id, df) already merged across generations."""
    qt = queries.assign(terms=queries["query_text"].map(lambda s: sorted(set(tokenize(s)))))
    pairs = qt[["query_id", "terms"]].explode("terms").dropna()
    pairs = pairs.rename(columns={"terms": "term"})

    qterm = pairs.merge(tstats, on="term")  # drops unindexed terms
    if qterm.empty:
        return spark.createDataFrame([], TOPK_SCHEMA)
    ids = [int(x) for x in qterm["term_id"].unique()]

    # posting scan touches only the queried term_ids — an int64 IN-filter
    # pushed into the parquet row-group stats
    blocks = blocks.filter(F.col("term_id").isin(ids))
    qterm_df = spark.createDataFrame(qterm[["query_id", "term", "term_id", "df"]])
    fan = blocks.join(F.broadcast(qterm_df), "term_id")

    def score(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return _score_group(pdf, n_docs=n_docs, avgdl=avgdl, k1=k1, b=b, k=k)

    # applyInPandas shuffles by key itself — one task per query group
    return fan.groupBy("query_id").applyInPandas(score, schema=TOPK_SCHEMA)


def topk(
    spark: SparkSession,
    index_dir: str,
    queries: pd.DataFrame,
    k: int = 10,
    *,
    k1: float | None = None,
    b: float | None = None,
) -> DataFrame:
    """Batch top-k: queries pandas(query_id, query_text) → Spark DF of
    (query_id, rank, doc_id, score)."""
    meta = load_index_meta(spark, index_dir)
    n_docs, avgdl = int(meta["n_docs"]), float(meta["avgdl"])
    k1 = float(meta["k1"] if k1 is None else k1)
    b = float(meta["b"] if b is None else b)

    all_terms = sorted({t for q in queries["query_text"] for t in tokenize(q)})
    tstats = (
        spark.read.parquet(f"{index_dir}/term_stats")
        .filter(F.col("term").isin(all_terms))
        .toPandas()
    )
    blocks = spark.read.parquet(f"{index_dir}/postings")
    return topk_frames(
        spark, blocks, tstats, queries, n_docs=n_docs, avgdl=avgdl, k1=k1, b=b, k=k
    )


def topk_rescored(
    spark: SparkSession,
    index_dir: str,
    docs_dir: str,
    queries: pd.DataFrame,
    k: int = 10,
    *,
    pool_factor: int = 10,
    weight: float = 0.1,
    weight_col: str = "doc_len",
) -> DataFrame:
    """Two-stage ranking — the reference's citation-weighted rescore
    (/root/reference/streamlit_app.py:317-363): candidate pool of
    max(50, pool_factor·k) by BM25, then
    ``weighted_score = score + weight·ln(1 + weight_col)``, final top-k
    by (weighted_score DESC, score DESC, doc_id ASC) — the reference's
    exact ORDER BY shape (streamlit_app.py:362)."""
    from pyspark.sql import Window as W

    pool = max(50, pool_factor * k)
    hits = topk(spark, index_dir, queries, k=pool)
    meta = spark.read.parquet(docs_dir).select("doc_id", weight_col)
    rescored = hits.join(meta, "doc_id").withColumn(
        "weighted_score",
        F.col("score") + F.lit(weight) * F.log(1.0 + F.col(weight_col)),
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("weighted_score"), F.desc("score"), F.asc("doc_id")
    )
    return (
        rescored.withColumn("final_rank", F.row_number().over(w))
        .filter(F.col("final_rank") <= k)
        .select("query_id", "final_rank", "doc_id", "score", "weighted_score")
    )


def topk_with_urls(
    spark: SparkSession, index_dir: str, docs_dir: str, queries: pd.DataFrame, k: int = 10
) -> DataFrame:
    """Top-k joined with doc metadata for display — the serving shape of
    /root/reference/streamlit_app.py:276-283 (ranked ids → full rows)."""
    hits = topk(spark, index_dir, queries, k)
    docs = spark.read.parquet(docs_dir).select("doc_id", "url", "lang", "warc_ts")
    return hits.join(docs, "doc_id", "left").orderBy("query_id", "rank")
