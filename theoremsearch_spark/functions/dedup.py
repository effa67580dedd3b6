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

All signatures use a keyed blake2b token hash — never Python's
builtin hash(), which is salted per process and would break
determinism across executors.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from theoremsearch_spark.operators.relational import t

MINHASH_K = 64
MINHASH_BANDS = 16  # 16 bands × 4 rows
SHINGLE = 3
_MERSENNE = (1 << 61) - 1
_rng = np.random.default_rng(42)
_A = _rng.integers(1, _MERSENNE, MINHASH_K, dtype=np.int64).astype(np.uint64)
_B = _rng.integers(0, _MERSENNE, MINHASH_K, dtype=np.int64).astype(np.uint64)


def _token_hash64(tokens: list[str]) -> np.ndarray:
    return np.array(
        [
            int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
            for t in tokens
        ],
        dtype=np.uint64,
    )


def minhash_signature(text: str) -> np.ndarray:
    """64-value MinHash signature over 3-token shingles."""
    toks = text.split(" ")
    shingles = (
        [" ".join(toks[i : i + SHINGLE]) for i in range(len(toks) - SHINGLE + 1)]
        if len(toks) >= SHINGLE
        else [" ".join(toks)]
    )
    h = np.unique(_token_hash64(shingles)) % np.uint64(_MERSENNE)
    # sig_i = min over shingles of (a_i*h + b_i) mod p  (vectorized outer)
    vals = (h[None, :] * _A[:, None] + _B[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens weighted by tf."""
    toks = text.split(" ")
    if not toks:
        return 0
    h = _token_hash64(toks)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    acc = (2 * bits - 1).sum(axis=0)
    return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


_SIG_TYPE = T.ArrayType(T.LongType())


@F.pandas_udf(_SIG_TYPE)
def minhash_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda s: minhash_signature(s).astype(np.int64).tolist())


@F.pandas_udf(T.LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    # store as signed 64-bit (two's complement) for Spark LongType
    return text.map(lambda s: np.uint64(simhash64(s)).astype(np.int64).item())


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


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Exact shingle-set Jaccard via an inverted shingle index — the
    deterministic mirror of MinHash (same 3-token shingles, exact
    instead of sketched):

      doc → distinct xxhash64(3-token shingle) set
          → explode (doc, shingle) rows
          → self equi-join on shingle, groupBy pair → |A∩B| directly
          → J = |A∩B| / (|A|+|B|−|A∩B|), keep J ≥ 0.8.

    Work is Σ_shingle df² — shingles are selective (word ORDER, not
    vocabulary), so df ≈ 1 except for true near-dups and the total is
    ~linear in corpus size; an early length-band cross-join variant did
    Σ_block² array intersects and was 50× slower on the same input.
    Any J>0 pair shares a shingle, so recall at J ≥ 0.8 is exactly 1.
    At 100 TB, boilerplate mega-shingles (df ≫) get a df-cap /
    stop-shingle pass first; here the operator stays cap-free so the
    DuckDB oracle (which recomputes on raw shingle STRINGS — a
    genuinely independent second computation) matches bit-for-bit."""
    n_sh = F.greatest(F.size(F.col("w")) - 2, F.lit(1))
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(F.col("w"), i, 3))),
        )
    )
    d = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.split(F.col("text"), " ").alias("w"))
        .select("doc_id", shingles.alias("toks"))
    )
    ex = d.select("doc_id", F.size("toks").alias("n"), F.explode("toks").alias("h"))
    # One groupBy-shingle pass generating in-group ordered pairs beats the
    # self-equi-join shape 2×: the exploded tokenization is computed ONCE
    # (the join recomputes its whole subtree for each side) and the big
    # exploded relation crosses the wire once instead of twice. Work is
    # the same Σ_shingle df²; a df ≫ mega-shingle would concentrate its
    # pair fan-out in one task row, which is exactly what the production
    # stop-shingle / df-cap pass (docstring above) removes first.
    grouped = (
        ex.groupBy("h")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "n"))).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
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
    return (
        pairs.select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .orderBy("doc_a", "doc_b")
    )


def exact_jaccard_pairs(docs: DataFrame, candidates: DataFrame) -> DataFrame:
    """Verify candidate (doc_a, doc_b) pairs with exact token-set Jaccard."""
    toks = docs.select(
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
    sig = docs.select("doc_id", minhash_udf(F.col("text")).alias("sig"))
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
    sig = docs.select("doc_id", simhash_udf(F.col("text")).alias("sh"))
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


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash,  # probabilistic — rows-only check
    "dedup_simhash": q_dedup_simhash,  # probabilistic — rows-only check
}

ORACLES = {
    "dedup_exact": """
        SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        FROM documents GROUP BY md5(lower(text)) ORDER BY doc_id
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
}
