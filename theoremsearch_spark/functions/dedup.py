"""Deduplication operators — exact, blocked n-gram Jaccard, MinHash+LSH,
SimHash.

Scale design notes (the point of each variant at 100 TB):
  - exact: one md5-keyed groupBy — a single shuffle of (16-byte key,
    doc_id); AQE handles bucket skew from boilerplate pages.
  - exact n-gram Jaccard: inverted shingle index — one groupBy-shingle
    pass, in-group ordered-pair fan-out, pair-count = |A∩B| directly.
    Work is Σ_shingle df² (≈ linear: word-order shingles are selective),
    recall at any J > 0 is exactly 1. SQL-expressible → DuckDB oracle.
  - MinHash+LSH: shingle → 64-permutation signature (vectorized numpy
    inside one pandas UDF — no per-row Python), band → bucket-join for
    candidates, exact-Jaccard verify of candidates only. Band buckets
    larger than `max_bucket` (boilerplate) are skipped BEFORE the
    self-join — the quadratic-mega-bucket guard. Probabilistic recall
    ⇒ no SQL oracle; recall ≥ 0.9 at J ≥ 0.8 is locked by pytest
    (tests/test_dedup.py::test_minhash_lsh_recall) against
    exact_jaccard_pairs ground truth.
  - SimHash: 64-bit signature, Hamming-ball candidates via 16-bit
    chunk banding (any pair within Hamming ≤3 of equal signatures
    shares ≥1 of 4 chunks — pigeonhole ⇒ recall 1.0 at h ≤ 3, locked
    by tests/test_dedup.py::test_simhash_recall_is_total). Same
    mega-bucket cap.

Tokens/shingles are hashed JVM-side with F.xxhash64 (codegen'd,
deterministic across executors — never Python's salted builtin hash());
the pandas UDFs receive array<long> hash arrays and do only the
K-permutation min / bit-majority in batch-level numpy reduceat ops, so
no per-token Python runs anywhere in the signature path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from theoremsearch_spark.functions.widen import widen_small_input as _widen
from theoremsearch_spark.operators.relational import t

MINHASH_K = 64
MINHASH_BANDS = 16  # 16 bands × 4 rows
SHINGLE = 3
_MERSENNE = (1 << 61) - 1
_rng = np.random.default_rng(42)
_A = _rng.integers(1, _MERSENNE, MINHASH_K, dtype=np.int64).astype(np.uint64)
_B = _rng.integers(0, _MERSENNE, MINHASH_K, dtype=np.int64).astype(np.uint64)


def shingle_hashes_col(text_col: Column) -> Column:
    """Distinct xxhash64 values of the 3-token shingles of `text_col`,
    computed entirely JVM-side (whole-stage codegen) — the same shingle
    definition q_dedup_ngram_jaccard indexes. Texts shorter than one
    shingle hash their full token join (one shingle)."""
    w = F.split(text_col, " ")
    n_sh = F.greatest(F.size(w) - (SHINGLE - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(w, i, SHINGLE))),
        )
    )


def token_hashes_col(text_col: Column) -> Column:
    """xxhash64 per whitespace token, duplicates kept (tf weighting for
    SimHash's bit majority)."""
    return F.transform(F.split(text_col, " "), lambda tok: F.xxhash64(tok))


def _flatten_hash_arrays(hs: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Series of int64 hash arrays → (flat uint64 view, segment starts)
    for numpy ufunc.reduceat. Empty rows get one zero hash so every
    segment is non-empty (reduceat cannot express empty segments)."""
    arrs = [np.asarray(a, dtype=np.int64) for a in hs]
    if any(a.size == 0 for a in arrs):
        arrs = [a if a.size else np.zeros(1, np.int64) for a in arrs]
    lens = np.fromiter((a.size for a in arrs), dtype=np.int64, count=len(arrs))
    flat = np.concatenate(arrs) if arrs else np.zeros(0, np.int64)
    starts = np.zeros(len(arrs), dtype=np.int64)
    if len(arrs) > 1:
        np.cumsum(lens[:-1], out=starts[1:])
    return flat.view(np.uint64), starts


_SIG_TYPE = T.ArrayType(T.LongType())


@F.pandas_udf(_SIG_TYPE)
def minhash_sig_udf(hashes: pd.Series) -> pd.Series:
    """Pre-hashed shingles → 64-value MinHash signature.
    sig_k = min over shingles of ((a_k·h + b_k) wrap-mod-2^64) mod p —
    ONE vectorized multiply + reduceat per permutation per Arrow batch;
    zero per-row Python.

    NOTE (locked behavior): a_k·h is a uint64 product of two ~61-bit
    values, so it wraps mod 2^64 BEFORE the mod-p — the permutation
    family is multiply-add-mod-2^64 (Dietzfelbinger multiply-shift
    style), not the textbook universal (a·h+b) mod p. The wrap is
    intentional and frozen: it is deterministic, mixes well in practice
    (recall lock: tests/test_dedup.py ≥0.9 @ J≥0.8), and an honest
    128-bit mod-p would cost 4 partial products per permutation for no
    measured recall gain. Changing it would silently invalidate every
    stored signature."""
    flat, starts = _flatten_hash_arrays(hashes)
    if starts.size == 0:
        return pd.Series([], dtype=object)
    h = flat % np.uint64(_MERSENNE)
    sig = np.empty((MINHASH_K, starts.size), dtype=np.uint64)
    for k in range(MINHASH_K):
        sig[k] = np.minimum.reduceat((h * _A[k] + _B[k]) % np.uint64(_MERSENNE), starts)
    return pd.Series(sig.T.astype(np.int64).tolist())


@F.pandas_udf(T.LongType())
def simhash_sig_udf(hashes: pd.Series) -> pd.Series:
    """Pre-hashed tokens (duplicates = tf weight) → 64-bit SimHash via
    per-bit signed majority; one reduceat per bit per Arrow batch."""
    flat, starts = _flatten_hash_arrays(hashes)
    if starts.size == 0:
        return pd.Series([], dtype="int64")
    res = np.zeros(starts.size, dtype=np.uint64)
    for bit in range(64):
        b = (((flat >> np.uint64(bit)) & np.uint64(1)).astype(np.int64) << 1) - 1
        res |= (np.add.reduceat(b, starts) > 0).astype(np.uint64) << np.uint64(bit)
    # stored as signed 64-bit (two's complement) for Spark LongType
    return pd.Series(res.view(np.int64))


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """docs(doc_id, text) → (doc_id, sig array<long>) — the signature
    stage shared by minhash_lsh_pairs and the recall tests."""
    return _widen(docs).select(
        "doc_id", minhash_sig_udf(shingle_hashes_col(F.col("text"))).alias("sig")
    )


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """docs(doc_id, text) → (doc_id, sh long) — shared signature stage."""
    return _widen(docs).select(
        "doc_id", simhash_sig_udf(token_hashes_col(F.col("text"))).alias("sh")
    )


# --------------------------------------------------------------------------
# operators
# --------------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    """Exact dedup survivors: min doc_id per content fingerprint."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(F.lower(F.col("text"))).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies"))
        .select("doc_id", "n_copies")
        .orderBy("doc_id")
    )


LENGTH_BAND = 32  # chars per blocking band


JACCARD_THRESHOLD = 0.8


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard via an inverted shingle index — the
    deterministic mirror of MinHash (same 3-token shingles, exact
    instead of sketched):

      doc → distinct xxhash64(3-token shingle) set
          → explode (doc, shingle) rows
          → groupBy shingle, in-group ordered pairs → |A∩B| directly
          → J = |A∩B| / (|A|+|B|−|A∩B|), keep J ≥ threshold.

    Work is Σ_shingle df² — shingles are selective (word ORDER, not
    vocabulary), so df ≈ 1 except for true near-dups and the total is
    ~linear in corpus size; an early length-band cross-join variant did
    Σ_block² array intersects and was 50× slower on the same input.
    Any J>0 pair shares a shingle, so recall at J ≥ 0 is exactly 1 in
    the cap-free form.

    `max_shingle_df` is the production stop-shingle guard, applied the
    same way as the LSH mega-bucket cap: a shingle whose posting bucket
    exceeds the cap is dropped BEFORE any pair is generated — one extra
    filter clause on the existing groupBy, zero extra shuffles. At
    100 TB one boilerplate shingle with df = 10⁶ would otherwise
    concentrate 10¹² pair emissions in a single task row. Set sizes |A|,
    |B| stay full-universe, so the reported J is a conservative
    underestimate (≤ true J) for docs containing boilerplate: near-dup
    pairs above a high threshold share many SELECTIVE shingles and
    barely move (recall-preservation is pytest-locked on a planted
    boilerplate corpus), while pairs related ONLY through boilerplate
    are exactly the ones the guard exists to skip. On a corpus where no
    shingle exceeds the cap the output is bit-identical to cap-free.
    """
    # bind-once explode: projection collapse would inline the (expensive)
    # shingle expression into BOTH size() and explode() — measured 2.2 s
    # vs 0.35 s for this stage at the sf0.1 bench shape. Wrapping the
    # array in a 1-element array + transform binds the computed value to
    # a lambda variable, so size and the exploded elements come from ONE
    # evaluation; the extra 1-row Generate is free.
    bound = F.explode(
        F.transform(
            F.array(shingle_hashes_col(F.col("text"))),
            lambda a: F.struct(F.size(a).alias("n"), a.alias("toks")),
        )
    )
    ex = (
        _widen(docs)
        .select("doc_id", bound.alias("s"))
        .select("doc_id", F.col("s.n").alias("n"), F.explode("s.toks").alias("h"))
    )
    # One groupBy-shingle pass generating in-group ordered pairs beats the
    # self-equi-join shape 2×: the exploded tokenization is computed ONCE
    # (the join recomputes its whole subtree for each side) and the big
    # exploded relation crosses the wire once instead of twice.
    grouped = (
        ex.groupBy("h")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "n"))).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    if max_shingle_df is not None:
        grouped = grouped.filter(F.size("ds") <= max_shingle_df)
    pairs = (
        _bucket_pairs(
            grouped,
            lambda x, y: F.struct(
                x["doc_id"].alias("doc_a"),
                y["doc_id"].alias("doc_b"),
                x["n"].alias("na"),
                y["n"].alias("nb"),
            ),
        )
        .select("p.*")
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    # threshold on the UNROUNDED value (the DuckDB oracles apply WHERE
    # before rounding — filtering the rounded column would admit
    # boundary pairs like J=0.79996 that the oracle drops)
    return pairs.filter(jac >= threshold).select(
        "doc_a", "doc_b", F.round(jac, 4).alias("jaccard")
    )


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Harness entry: CAP-FREE exact Jaccard, so the DuckDB oracle
    (which recomputes on raw shingle STRINGS — a genuinely independent
    second computation) matches bit-for-bit. Production pipelines call
    ngram_jaccard_pairs with max_shingle_df set."""
    return ngram_jaccard_pairs(t(spark, sf_dir, "documents")).orderBy(
        "doc_a", "doc_b"
    )


CAPPED_DF = 5  # deliberately low so the sf0.01 harness corpus exercises the drop


def q_dedup_jaccard_capped(spark, sf_dir):
    """The PRODUCTION form of exact Jaccard — stop-shingle guard active
    (max_shingle_df) — as its own driver-gate row: the cap is
    deterministic, so DuckDB reproduces it exactly (df-filtered shingle
    join, full-universe set sizes). A hash match proves the guard drops
    precisely the promiscuous shingles and nothing else."""
    return ngram_jaccard_pairs(
        t(spark, sf_dir, "documents"), max_shingle_df=CAPPED_DF
    ).orderBy("doc_a", "doc_b")


def exact_jaccard_pairs(docs: DataFrame, candidates: DataFrame) -> DataFrame:
    """Verify candidate (doc_a, doc_b) pairs with exact token-set Jaccard."""
    toks = _widen(docs).select(
        "doc_id", F.array_distinct(F.split(F.col("text"), " ")).alias("toks")
    )
    return (
        candidates.join(toks.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("toks", "toks_a"), "doc_a")
        .join(toks.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("toks", "toks_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("toks_a", "toks_b"))
                / F.size(F.array_union("toks_a", "toks_b")),
                4,
            ).alias("jaccard"),
        )
    )


DEFAULT_MAX_BUCKET = 1000  # band buckets above this are boilerplate — skip


def _bucket_pairs(grouped: DataFrame, pair_struct) -> DataFrame:
    """All ordered (i < j) element pairs of each bucket's sorted `ds`
    array, as a STREAMED relation of `p` struct rows.

    Shape: posexplode(ds) → per-element slice of the tail → explode.
    Both explodes are pipelined by whole-stage codegen, so peak live
    memory per bucket is O(|ds|) — never the O(|ds|²) single-array
    value that a flatten-of-nested-transforms would materialize (a
    ~2³¹ array-size / OOM cliff on a mega-bucket). Total work is still
    Σ|ds|² pair emissions; callers bound it with a bucket cap, or (the
    cap-free exact-Jaccard oracle) document the production stop-shingle
    pass that removes mega-buckets first.

    `pair_struct(x, y)`: builds the output struct from the earlier (x)
    and later (y) element columns.
    """
    return (
        grouped.select(F.posexplode("ds").alias("i", "x"), "ds")
        .select(
            F.explode(
                F.transform(
                    F.slice(F.col("ds"), F.col("i") + 2, F.size("ds")),
                    lambda y: pair_struct(F.col("x"), y),
                )
            ).alias("p")
        )
    )


def minhash_lsh_pairs(
    docs: DataFrame, threshold: float = 0.8, max_bucket: int = DEFAULT_MAX_BUCKET
) -> DataFrame:
    """MinHash → LSH band bucket-join → exact-Jaccard verification.

    The shuffle moves (band_id, band_hash, doc_id) triples — tiny rows —
    then the self-join happens per bucket. Buckets larger than
    `max_bucket` are dropped BEFORE the self-join: one boilerplate
    bucket of 1M docs would otherwise self-join into 10¹² candidate
    pairs. (Skipped buckets are near-identical boilerplate families —
    exact dedup catches their identical members far cheaper.)
    """
    sig = minhash_signatures(docs)
    rows_per_band = MINHASH_K // MINHASH_BANDS
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(*[F.col("sig")[i] for i in range(b * rows_per_band, (b + 1) * rows_per_band)])
                    for b in range(MINHASH_BANDS)
                ]
            )
        ).alias("band", "band_hash"),
    )
    # single groupBy-bucket pass: the MinHash UDF (the expensive stage)
    # is evaluated ONCE — a bucket-count agg + two-sided self-join would
    # re-run the whole signature subtree three times. The size filter is
    # both the ≥2 candidacy condition and the mega-bucket cap, applied
    # before any pair is generated.
    grouped = (
        bands.groupBy("band", "band_hash")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter((F.size("ds") >= 2) & (F.size("ds") <= max_bucket))
    )
    cands = (
        _bucket_pairs(grouped, lambda x, y: F.struct(x.alias("doc_a"), y.alias("doc_b")))
        .select(F.col("p.doc_a"), F.col("p.doc_b"))
        .distinct()
    )
    return exact_jaccard_pairs(docs, cands).filter(F.col("jaccard") >= threshold)


def q_dedup_minhash(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, threshold=0.8).orderBy("doc_a", "doc_b")


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  max_bucket: int = DEFAULT_MAX_BUCKET) -> DataFrame:
    """SimHash Hamming-≤h candidate pairs via 16-bit chunk banding
    (pigeonhole: h ≤ 3 ⟹ ≥1 of 4 chunks equal ⟹ recall 1.0, locked by
    pytest). Mega-buckets (> max_bucket) skipped before the self-join."""
    sig = simhash_signatures(docs)
    chunks = sig.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sh"), 16 * i).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("chunk_pos", "chunk"),
    )
    # single groupBy-bucket pass (see minhash_lsh_pairs): the signature
    # UDF runs once; the size filter is candidacy + mega-bucket cap in
    # one predicate, before any pair exists
    in_bucket = (
        chunks.groupBy("chunk_pos", "chunk")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "sh"))).alias("ds"))
        .filter((F.size("ds") >= 2) & (F.size("ds") <= max_bucket))
    )
    cands = (
        _bucket_pairs(
            in_bucket,
            lambda x, y: F.struct(
                x["doc_id"].alias("doc_a"),
                y["doc_id"].alias("doc_b"),
                F.bit_count(x["sh"].bitwiseXOR(y["sh"])).alias("hamming"),
            ),
        )
        .select("p.doc_a", "p.doc_b", "p.hamming")
        .distinct()
    )
    return cands.filter(F.col("hamming") <= max_hamming).orderBy("doc_a", "doc_b")


def q_dedup_simhash(spark, sf_dir):
    """SimHash Hamming-≤3 near-dup pairs over the documents table."""
    return simhash_pairs(t(spark, sf_dir, "documents"))


def dedup_cluster_labels(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Connected components over near-dup pairs → (doc_id, canon) with
    canon = min doc_id of the component. The cluster-canonical drop
    policy: for a chain A~B, B~C (A≁C) exactly {B, C} are dropped —
    unlike drop-every-later-pair-member, which drops B twice over and
    keeps only A out of {A,B,C} *while also* over-dropping C when C's
    only relation is to the already-dropped B. At web scale boilerplate
    chains are long, so keep-one-per-component keeps materially more
    unique text.

    Algorithm: min-label propagation with POINTER JUMPING — each round
    (a) relaxes labels across edges (label(v) ← min of v's and its
    neighbors' labels) and (b) contracts pointer chains
    (label(v) ← label(label(v))), so a chain of length L converges in
    O(log L) rounds, not O(L) — bounded Spark jobs even for degenerate
    boilerplate chains. Each round is two key-shuffles of (id, id)
    rows; lineage is truncated per round (localCheckpoint) so the plan
    does not grow with iterations. Only docs that appear in a pair are
    labeled — singleton docs are trivially their own canon and never
    enter the shuffle."""
    e = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    edges = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # (a) edge relax: min over own + neighbors' labels
        nbr = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("dst"), F.col("label").alias("dl")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dl").alias("nbr_min"))
            .withColumnRenamed("src", "doc_id")
        )
        relaxed = labels.join(nbr, "doc_id", "left").select(
            "doc_id",
            F.least("label", F.coalesce("nbr_min", "label")).alias("label"),
        )
        # (b) pointer jump: label(v) <- label(label(v)) — labels are
        # always doc_ids of labeled nodes, so the self-join is total
        jumped = relaxed.alias("x").join(
            relaxed.select(
                F.col("doc_id").alias("label"), F.col("label").alias("ll")
            ).alias("y"),
            "label",
        ).select("doc_id", F.col("ll").alias("label"))
        new_labels = jumped.localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if not changed:
            break
    return labels.select("doc_id", F.col("label").alias("canon"))


def q_dedup_clusters(spark, sf_dir):
    """Cluster-canonical near-dup labels over the documents table:
    deterministic capped-Jaccard pair set (same as dedup_jaccard_capped)
    → connected components → (doc_id, canon). The DuckDB oracle
    recomputes the components with a recursive CTE over the same pair
    set, so a hash match proves the distributed label propagation finds
    exactly the transitive closure."""
    pairs = ngram_jaccard_pairs(
        t(spark, sf_dir, "documents"), max_shingle_df=CAPPED_DF
    )
    return dedup_cluster_labels(pairs).orderBy("doc_id")


DECONTAM_N = 8  # word n-gram size — the industry-standard 8-13 range
_BENCH_DOCS = 3  # harness: first docs pose as the benchmark set
_BENCH_SPAN = (11, 12)  # 1-based token start, span length


def benchmark_contamination(
    docs: DataFrame, bench: DataFrame, n: int = DECONTAM_N
) -> DataFrame:
    """Benchmark decontamination — the training-data op every LLM
    pipeline runs before training: flag corpus docs sharing ANY word
    n-gram with an eval/benchmark set, so test data can be held out of
    the training mix. Returns (doc_id, n_bench_shingles = distinct
    shared n-grams), contaminated docs only.

    Spark-first shape: both sides shingle JVM-side (split → sequence →
    transform/slice/concat_ws — pure codegen, no Python); the
    benchmark side is tiny by definition, so its distinct shingles
    BROADCAST and the corpus-side probe is a broadcast-hash semi join:
    the 100 TB corpus never shuffles, and reading it once is the whole
    cost. Docs shorter than n tokens cannot share an n-gram and are
    skipped on both sides (same rule in the oracle)."""

    def shingled(df: DataFrame, id_col: str) -> DataFrame:
        toks = F.split(F.col("text"), " ")
        sh = F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
        return df.filter(F.size(toks) >= n).select(
            F.col(id_col), F.explode(F.array_distinct(sh)).alias("sh")
        )

    bench_sh = shingled(bench, "bench_id").select("sh").distinct()
    return (
        shingled(docs, "doc_id")
        .join(F.broadcast(bench_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bench_shingles"))
        .orderBy("doc_id")
    )


def q_decontaminate(spark, sf_dir):
    """Harness: a deterministic fake benchmark — one token span lifted
    from each of the first _BENCH_DOCS documents — must flag exactly
    the docs containing those spans (the sources at minimum)."""
    d = t(spark, sf_dir, "documents")
    start, span = _BENCH_SPAN
    bench = d.filter(F.col("doc_id") < _BENCH_DOCS).select(
        F.col("doc_id").alias("bench_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.col("text"), " "), start, span)
        ).alias("text"),
    )
    return benchmark_contamination(
        d.select("doc_id", "text"), bench, n=DECONTAM_N
    )


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "decontaminate": q_decontaminate,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_jaccard_capped": q_dedup_jaccard_capped,
    "dedup_clusters": q_dedup_clusters,
    "dedup_minhash_lsh": q_dedup_minhash,  # probabilistic — rows-only check
    "dedup_simhash": q_dedup_simhash,  # probabilistic — rows-only check
}

ORACLES = {
    "dedup_exact": """
        SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        FROM documents GROUP BY md5(lower(text)) ORDER BY doc_id
    """,
    # same fake benchmark (token spans of the first docs), same n-gram
    # rule, recomputed with DuckDB list ops (slices are 1-based
    # inclusive: w[i:i+n-1] is the n-gram at i)
    "decontaminate": f"""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
                      FROM documents),
        bench AS (
            SELECT string_split(array_to_string(
                w[{_BENCH_SPAN[0]}:{_BENCH_SPAN[0] + _BENCH_SPAN[1] - 1}],
                ' '), ' ') AS bw
            FROM toks WHERE doc_id < {_BENCH_DOCS}),
        bsh AS (
            SELECT DISTINCT unnest(list_transform(
                range(1, len(bw) - {DECONTAM_N} + 2),
                i -> array_to_string(bw[i:i+{DECONTAM_N}-1], ' '))) AS sh
            FROM bench WHERE len(bw) >= {DECONTAM_N}),
        dsh AS (
            SELECT doc_id, unnest(list_distinct(list_transform(
                range(1, len(w) - {DECONTAM_N} + 2),
                i -> array_to_string(w[i:i+{DECONTAM_N}-1], ' ')))) AS sh
            FROM toks WHERE len(w) >= {DECONTAM_N})
        SELECT doc_id, count(*) AS n_bench_shingles
        FROM dsh JOIN bsh USING (sh)
        GROUP BY doc_id ORDER BY doc_id
    """,
    "dedup_ngram_jaccard": f"""
        WITH raw AS (SELECT doc_id, string_split(text, ' ') AS w
                     FROM documents),
        d AS (SELECT doc_id, list_distinct(list_transform(
                         range(1, greatest(len(w) - 1, 2)),
                         i -> array_to_string(w[i:i+2], ' '))) AS toks
              FROM raw),
        e AS (SELECT doc_id, len(toks) AS n, unnest(toks) AS h FROM d),
        p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     a.n AS na, b.n AS nb, count(*) AS inter
              FROM e a JOIN e b ON a.h = b.h AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4)
        SELECT doc_a, doc_b,
               round(inter * 1.0 / (na + nb - inter), 4) AS jaccard
        FROM p WHERE inter * 1.0 / (na + nb - inter) >= {JACCARD_THRESHOLD}
        ORDER BY doc_a, doc_b
    """,
    "dedup_jaccard_capped": f"""
        WITH raw AS (SELECT doc_id, string_split(text, ' ') AS w
                     FROM documents),
        d AS (SELECT doc_id, list_distinct(list_transform(
                         range(1, greatest(len(w) - 1, 2)),
                         i -> array_to_string(w[i:i+2], ' '))) AS toks
              FROM raw),
        e AS (SELECT doc_id, len(toks) AS n, unnest(toks) AS h FROM d),
        keep AS (SELECT h FROM e GROUP BY h
                 HAVING count(*) BETWEEN 2 AND {CAPPED_DF}),
        p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     a.n AS na, b.n AS nb, count(*) AS inter
              FROM e a JOIN e b ON a.h = b.h AND a.doc_id < b.doc_id
              JOIN keep k ON k.h = a.h
              GROUP BY 1, 2, 3, 4)
        SELECT doc_a, doc_b,
               round(inter * 1.0 / (na + nb - inter), 4) AS jaccard
        FROM p WHERE inter * 1.0 / (na + nb - inter) >= {JACCARD_THRESHOLD}
        ORDER BY doc_a, doc_b
    """,
    # connected components over the SAME capped pair set, as a recursive
    # CTE transitive closure — an independent second computation of the
    # cluster-canonical labels (fine at sf0.01; the Spark side is the
    # O(log chain) label-propagation that scales)
    "dedup_clusters": f"""
        WITH RECURSIVE
        raw AS (SELECT doc_id, string_split(text, ' ') AS w
                FROM documents),
        d AS (SELECT doc_id, list_distinct(list_transform(
                         range(1, greatest(len(w) - 1, 2)),
                         i -> array_to_string(w[i:i+2], ' '))) AS toks
              FROM raw),
        e AS (SELECT doc_id, len(toks) AS n, unnest(toks) AS h FROM d),
        keep AS (SELECT h FROM e GROUP BY h
                 HAVING count(*) BETWEEN 2 AND {CAPPED_DF}),
        p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     a.n AS na, b.n AS nb, count(*) AS inter
              FROM e a JOIN e b ON a.h = b.h AND a.doc_id < b.doc_id
              JOIN keep k ON k.h = a.h
              GROUP BY 1, 2, 3, 4),
        pairs AS (SELECT doc_a, doc_b FROM p
                  WHERE inter * 1.0 / (na + nb - inter) >= {JACCARD_THRESHOLD}),
        sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                UNION ALL
                SELECT doc_b AS a, doc_a AS b FROM pairs),
        reach(a, b) AS (
            SELECT a, b FROM sym
            UNION
            SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
        )
        SELECT a AS doc_id, least(a, min(b)) AS canon
        FROM reach GROUP BY a ORDER BY doc_id
    """,
}
