"""Probabilistic dedup quality tests — the correctness signal for the
operators the driver can only rows-check (no SQL oracle):

  - MinHash+LSH pair recall ≥ 0.9 at J ≥ 0.8 vs exhaustive token-set
    Jaccard ground truth on a corpus with planted near-dups;
  - SimHash chunk-banding recall == 1.0 at Hamming ≤ 3 (pigeonhole) —
    engine pairs must EQUAL the exhaustive signature comparison;
  - the mega-bucket cap: a planted boilerplate family (quadratic
    candidate bomb) is skipped while normal near-dups survive.
"""

import itertools

import numpy as np
import pandas as pd
import pytest

from theoremsearch_spark.functions.dedup import (
    minhash_lsh_pairs,
    simhash_pairs,
    simhash_signatures,
)

rng = np.random.default_rng(123)


def _tokens(doc: int, n: int = 60) -> list[str]:
    # disjoint vocabulary per doc → cross-pair Jaccard is exactly 0
    return [f"t{doc:03d}x{j:02d}" for j in range(n)]


@pytest.fixture(scope="module")
def planted_corpus():
    """120 base docs + 25 high-sim near-dups (J ≈ 0.90) + 10 mid-sim
    (J ≈ 0.54, below the 0.8 threshold)."""
    rows = []
    for d in range(120):
        rows.append(" ".join(_tokens(d)))
    truth_hi = []
    for i in range(25):  # replace 3/60 tokens → J = 57/63 ≈ 0.905
        toks = _tokens(i)
        for j in range(3):
            toks[10 + j] = f"nd{i:03d}r{j}"
        rows.append(" ".join(toks))
        truth_hi.append((i, 120 + i))
    for i in range(10):  # replace 18/60 → J = 42/78 ≈ 0.54
        toks = _tokens(40 + i)
        for j in range(18):
            toks[20 + j] = f"md{i:03d}r{j}"
        rows.append(" ".join(toks))
    pdf = pd.DataFrame(
        {"doc_id": range(len(rows)), "text": rows, "n_chars": [len(r) for r in rows]}
    )
    return pdf, set(truth_hi)


def _exhaustive_jaccard(pdf: pd.DataFrame, threshold: float) -> set[tuple[int, int]]:
    toks = [set(t.split(" ")) for t in pdf["text"]]
    out = set()
    for a, b in itertools.combinations(range(len(toks)), 2):
        inter = len(toks[a] & toks[b])
        if inter and inter / len(toks[a] | toks[b]) >= threshold:
            out.add((int(pdf["doc_id"].iloc[a]), int(pdf["doc_id"].iloc[b])))
    return out


def test_minhash_lsh_recall(spark, planted_corpus):
    pdf, truth_hi = planted_corpus
    truth = _exhaustive_jaccard(pdf, 0.8)
    assert truth == truth_hi  # corpus construction sanity
    docs = spark.createDataFrame(pdf)
    got = minhash_lsh_pairs(docs, threshold=0.8).toPandas()
    found = set(zip(got["doc_a"].astype(int), got["doc_b"].astype(int)))
    recall = len(found & truth) / len(truth)
    assert recall >= 0.9, f"MinHash-LSH recall {recall} < 0.9"
    # precision is exact by construction (candidates are Jaccard-verified)
    assert found <= truth


def test_minhash_lsh_mega_bucket_capped(spark, planted_corpus):
    """60 identical boilerplate docs form 16 buckets of size 60; with
    max_bucket=10 they are skipped BEFORE the self-join (no quadratic
    blowup) while ordinary planted near-dups still come out."""
    pdf, truth_hi = planted_corpus
    mega_ids = list(range(1000, 1060))
    mega = pd.DataFrame(
        {
            "doc_id": mega_ids,
            "text": ["mega boiler plate page body " * 10] * 60,
            "n_chars": [290] * 60,
        }
    )
    docs = spark.createDataFrame(pd.concat([pdf, mega], ignore_index=True))
    got = minhash_lsh_pairs(docs, threshold=0.8, max_bucket=10).toPandas()
    found = set(zip(got["doc_a"].astype(int), got["doc_b"].astype(int)))
    mega_set = set(mega_ids)
    assert not any(a in mega_set and b in mega_set for a, b in found)
    recall = len(found & truth_hi) / len(truth_hi)
    assert recall >= 0.9


def test_simhash_recall_is_total(spark, planted_corpus):
    """Pigeonhole: any pair within Hamming ≤ 3 shares ≥ 1 of the 4
    16-bit chunks, so banding recall is exactly 1.0 — the engine's pair
    set must EQUAL the exhaustive signature comparison."""
    pdf, _ = planted_corpus
    # add exact dups (h=0) and 1-token edits (small h) to guarantee
    # some pairs inside the Hamming ball
    extra = []
    for i in range(8):
        base = pdf["text"].iloc[i]
        extra.append((2000 + 2 * i, base))
        extra.append((2001 + 2 * i, base.replace(f"t{i:03d}x30", "editedtok", 1)))
    allpdf = pd.concat(
        [pdf, pd.DataFrame({"doc_id": [e[0] for e in extra], "text": [e[1] for e in extra],
                            "n_chars": [len(e[1]) for e in extra]})],
        ignore_index=True,
    )
    docs = spark.createDataFrame(allpdf)
    # truth from the shared signature stage, compared EXHAUSTIVELY
    # (all-pairs Hamming) — the property under test is that chunk
    # banding loses no pair within the Hamming ball, independent of the
    # hash family producing the signatures
    mask = (1 << 64) - 1
    sigs = {
        int(r["doc_id"]): int(r["sh"]) & mask
        for r in simhash_signatures(docs).collect()
    }
    truth = set()
    for a, b in itertools.combinations(sorted(sigs), 2):
        h = bin((sigs[a] ^ sigs[b]) & mask).count("1")
        if h <= 3:
            truth.add((a, b))
    assert truth, "fixture produced no Hamming-≤3 pairs"
    got = simhash_pairs(docs).toPandas()
    found = set(zip(got["doc_a"].astype(int), got["doc_b"].astype(int)))
    assert found == truth


def test_ngram_jaccard_stop_shingle_guard(spark, planted_corpus):
    """The production mega-shingle guard: a planted boilerplate prefix
    shared by 80 docs (df=80 shingles → 3,160 pair emissions EACH
    without the cap) is dropped before pair generation, near-dup recall
    at J ≥ 0.8 is unchanged, and on the cap-clean base corpus the capped
    operator is bit-identical to cap-free."""
    from theoremsearch_spark.functions.dedup import ngram_jaccard_pairs

    pdf, truth_hi = planted_corpus
    docs = spark.createDataFrame(pdf)
    # 1. no shingle in the base corpus exceeds the cap → identical output
    free = ngram_jaccard_pairs(docs).orderBy("doc_a", "doc_b").toPandas()
    capped = (
        ngram_jaccard_pairs(docs, max_shingle_df=30)
        .orderBy("doc_a", "doc_b")
        .toPandas()
    )
    pd.testing.assert_frame_equal(free, capped)
    assert set(zip(free["doc_a"], free["doc_b"])) >= truth_hi
    # 2. plant a boilerplate prefix on 80 fresh docs: every prefix
    # shingle has df=80 ≫ cap; their unique tails keep them below J=0.8
    # with each other, so cap-free output gains nothing — but cap-free
    # WORK is ~58 shingles × C(80,2) ≈ 183k pair emissions vs ~0 capped
    boiler = "the quick brown fox portal navigation footer copyright " * 10
    extra = pd.DataFrame(
        {
            "doc_id": [5000 + i for i in range(80)],
            "text": [boiler + " ".join(f"u{i:03d}q{j}" for j in range(40)) for i in range(80)],
            "n_chars": [100] * 80,
        }
    )
    docs2 = spark.createDataFrame(pd.concat([pdf, extra], ignore_index=True))
    got = (
        ngram_jaccard_pairs(docs2, max_shingle_df=30)
        .orderBy("doc_a", "doc_b")
        .toPandas()
    )
    found = set(zip(got["doc_a"].astype(int), got["doc_b"].astype(int)))
    boiler_ids = set(range(5000, 5080))
    # no boilerplate-only pair survives; planted near-dups all do
    assert not any(a in boiler_ids and b in boiler_ids for a, b in found)
    assert found >= truth_hi


# ---- property tests: the batch-vectorized (reduceat) signature math
# must equal a naive per-row computation, for ANY batch shape ----

from hypothesis import given, settings
from hypothesis import strategies as st

from theoremsearch_spark.functions.dedup import (
    _A,
    _B,
    _MERSENNE,
    MINHASH_K,
    minhash_sig_udf,
    simhash_sig_udf,
)

_hash_row = st.lists(
    st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=0, max_size=24
)


def _naive_minhash(row: list[int]) -> np.ndarray:
    arr = np.asarray(row if row else [0], dtype=np.int64).view(np.uint64)
    h = arr % np.uint64(_MERSENNE)
    return np.array(
        [int(((h * _A[k] + _B[k]) % np.uint64(_MERSENNE)).min()) for k in range(MINHASH_K)],
        dtype=np.uint64,
    )


def _naive_simhash(row: list[int]) -> int:
    arr = np.asarray(row if row else [0], dtype=np.int64).view(np.uint64)
    out = 0
    for bit in range(64):
        votes = sum(1 if (int(v) >> bit) & 1 else -1 for v in arr)
        if votes > 0:
            out |= 1 << bit
    return out


@given(st.lists(_hash_row, min_size=1, max_size=10))
@settings(max_examples=60, deadline=None)
def test_minhash_batch_matches_naive_per_row(rows):
    got = minhash_sig_udf.func(pd.Series([np.array(r, dtype=np.int64) for r in rows]))
    for i, r in enumerate(rows):
        assert np.array_equal(
            np.asarray(got.iloc[i], dtype=np.int64).view(np.uint64), _naive_minhash(r)
        ), f"row {i}"


@given(st.lists(_hash_row, min_size=1, max_size=10))
@settings(max_examples=60, deadline=None)
def test_simhash_batch_matches_naive_per_row(rows):
    got = simhash_sig_udf.func(pd.Series([np.array(r, dtype=np.int64) for r in rows]))
    for i, r in enumerate(rows):
        assert int(np.int64(got.iloc[i])) & (2**64 - 1) == _naive_simhash(r) & (
            2**64 - 1
        ), f"row {i}"


@given(_hash_row.filter(len), _hash_row.filter(len))
@settings(max_examples=40, deadline=None)
def test_minhash_union_identity(a, b):
    """The defining MinHash identity: sig(A ∪ B) == elementwise
    min(sig(A), sig(B)) — breaks under any segmentation/permutation bug
    in the reduceat path."""
    sigs = minhash_sig_udf.func(
        pd.Series(
            [
                np.array(a, dtype=np.int64),
                np.array(b, dtype=np.int64),
                np.array(a + b, dtype=np.int64),
            ]
        )
    )
    sa, sb, sab = (np.asarray(s, dtype=np.int64).view(np.uint64) for s in sigs)
    assert np.array_equal(sab, np.minimum(sa, sb))


def test_bucket_pairs_streams_large_bucket(spark):
    """_bucket_pairs must stream a single large bucket (peak memory
    O(|ds|) per row) instead of materializing the O(|ds|²) pair array as
    one value — n=3000 members → 4,498,500 ordered pairs, which as a
    flatten-of-transforms single array previously risked the array-size
    cliff. Locks count and a sample of pair ordering."""
    import pyspark.sql.functions as F

    from theoremsearch_spark.functions.dedup import _bucket_pairs

    n = 3000
    grouped = spark.range(1).select(
        F.sequence(F.lit(0), F.lit(n - 1)).alias("ds")
    )
    pairs = _bucket_pairs(
        grouped, lambda x, y: F.struct(x.alias("doc_a"), y.alias("doc_b"))
    ).select("p.doc_a", "p.doc_b")
    assert pairs.count() == n * (n - 1) // 2
    agg = pairs.agg(
        F.min("doc_a").alias("a0"), F.max("doc_b").alias("b1"),
        F.sum(F.when(F.col("doc_a") < F.col("doc_b"), 0).otherwise(1)).alias("bad"),
    ).collect()[0]
    assert (agg["a0"], agg["b1"], agg["bad"]) == (0, n - 1, 0)


def test_dedup_cluster_labels_chain_and_components(spark):
    """Cluster-canonical policy: a chain A~B, B~C (A!~C) is ONE
    component — exactly {A} survives of the chain (canon == min id) —
    while unrelated docs never enter the labeling at all. A second
    disjoint component and a long chain (pointer-jump convergence past
    naive-propagation depth) are labeled correctly too."""
    from theoremsearch_spark.functions.dedup import dedup_cluster_labels

    # chain 1-2-3; component {10, 11}; long chain 100..120 (depth 20)
    pairs = pd.DataFrame(
        {"doc_a": [1, 2, 10] + list(range(100, 120)),
         "doc_b": [2, 3, 11] + list(range(101, 121))}
    )
    labels = (
        dedup_cluster_labels(spark.createDataFrame(pairs), max_iter=8)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = dict(zip(labels["doc_id"], labels["canon"]))
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == 10
    assert all(got[d] == 100 for d in range(100, 121))
    # only pair members are labeled — singletons stay out of the shuffle
    assert set(labels["doc_id"]) == {1, 2, 3, 10, 11} | set(range(100, 121))
    # survivors = canon rows: exactly {1}, {10}, {100} per component
    survivors = set(labels[labels["doc_id"] == labels["canon"]]["doc_id"])
    assert survivors == {1, 10, 100}


def test_benchmark_contamination_boundary(spark):
    """Exactly-n-gram overlap flags; (n-1)-gram overlap does not; the
    match count is the number of DISTINCT shared shingles."""
    from theoremsearch_spark.functions.dedup import benchmark_contamination

    bench_text = "q w e r t y u i"  # 8 tokens = one 8-gram
    docs = spark.createDataFrame(
        [
            (0, "x x " + bench_text + " z z"),          # contains the 8-gram
            (1, "x q w e r t y u x i"),                  # only 7 in a row
            (2, "a b c d e f g h"),                      # unrelated
            (3, bench_text + " " + bench_text),          # repeated -> still distinct shingles
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(0, bench_text)], "bench_id long, text string")
    got = {
        r["doc_id"]: r["n_bench_shingles"]
        for r in benchmark_contamination(docs, bench, n=8).collect()
    }
    assert 0 in got and 3 in got
    assert 1 not in got and 2 not in got
    assert got[0] == 1


def test_host_section_stats_counts_dups(spark):
    from pyspark.sql import functions as F

    from theoremsearch_spark.functions.textops import host_section_stats

    docs = spark.createDataFrame(
        [
            (0, "aaa", 3, "h1"),
            (1, "aaa", 3, "h1"),   # exact dup within h1
            (2, "bbb", 3, "h1"),
            (3, "aaa", 3, "h2"),   # same text, other section: not a dup there
        ],
        "doc_id long, text string, n_chars long, sec string",
    )
    got = {
        r["section"]: (r["n_docs"], r["n_exact_dup_docs"])
        for r in host_section_stats(docs, F.col("sec")).collect()
    }
    assert got == {"h1": (3, 1), "h2": (1, 0)}
