"""Conjunctive (AND) serving, must-not terms, and exact-phrase top-k —
rank-identity against the brute-force oracle's mode-aware variants,
plus normalization semantics on a punctuation-laden planted corpus."""

import numpy as np
import pandas as pd
import pytest

from theoremsearch_spark.corpus import query_set
from theoremsearch_spark.extract import tokenize
from theoremsearch_spark.query import phrase_topk, topk

from tests.test_engine import _compare_topk

K = 10


def _stopword(oracle) -> str:
    """A term salted in the fixture index (df > 900 of 2000)."""
    t, _ = max(oracle.postings.items(), key=lambda kv: kv[1][0].size)
    assert oracle.postings[t][0].size > 900
    return t


def test_and_mode_rank_identity(spark, index_dir, oracle):
    """AND serving == brute-force conjunctive top-k — docIDs and BM25
    scores — for the reference-analog query set (includes multi-term
    queries whose AND set is much smaller than any OR set)."""
    qs = query_set(2000).head(20)
    hits = topk(
        spark, f"{index_dir}/index", qs[["query_id", "query_text"]], k=K, mode="and"
    ).toPandas()
    nonempty = 0
    for qid, row in qs.set_index("query_id").iterrows():
        want = oracle.topk_mode(row["query_text"], k=K, mode="and")
        got = hits[hits["query_id"] == qid].sort_values("rank")
        _compare_topk(got, want, qid)
        nonempty += len(want) > 0
    assert nonempty >= 5, "fixture queries produced almost no AND matches"


def test_and_mode_with_salted_term(spark, index_dir, oracle):
    """A query containing a SALTED (heavy) term exercises the
    segment-sharded conjunctive path: per-segment intersections must
    merge to the exact global AND set."""
    heavy = _stopword(oracle)
    rare = min(
        (t for t, p in oracle.postings.items() if p[0].size >= 3),
        key=lambda t: oracle.postings[t][0].size,
    )
    q = f"{heavy} {rare}"
    qs = pd.DataFrame([(0, q)], columns=["query_id", "query_text"])
    got = (
        topk(spark, f"{index_dir}/index", qs, k=K, mode="and")
        .toPandas()
        .sort_values("rank")
    )
    want = oracle.topk_mode(q, k=K, mode="and")
    _compare_topk(got, want, 0)
    assert len(want) > 0


def test_and_mode_unindexed_term_empties(spark, index_dir, oracle):
    """One unindexed token makes the conjunction unsatisfiable — even
    though the other token matches half the corpus."""
    heavy = _stopword(oracle)
    qs = pd.DataFrame(
        [(0, f"{heavy} zzzzneverseen")], columns=["query_id", "query_text"]
    )
    got = topk(spark, f"{index_dir}/index", qs, k=K, mode="and").toPandas()
    assert got.empty


def test_not_terms_exclude_and_preserve_scores(spark, index_dir, oracle):
    """Must-not terms drop exactly the docs containing them; surviving
    docs keep their unmodified BM25 scores (exclusion happens before
    scoring, it is not a rescore)."""
    qs = query_set(2000).head(8)
    banned = _stopword(oracle)
    hits = topk(
        spark,
        f"{index_dir}/index",
        qs[["query_id", "query_text"]],
        k=K,
        not_terms=[banned],
    ).toPandas()
    banned_ids = set(oracle.postings[banned][0].tolist())
    assert not (set(hits["doc_id"].tolist()) & banned_ids)
    for qid, row in qs.set_index("query_id").iterrows():
        want = oracle.topk_mode(row["query_text"], k=K, not_terms=[banned])
        got = hits[hits["query_id"] == qid].sort_values("rank")
        _compare_topk(got, want, qid)


def test_not_terms_unindexed_is_noop(spark, index_dir, oracle):
    qs = query_set(2000).head(3)
    plain = topk(
        spark, f"{index_dir}/index", qs[["query_id", "query_text"]], k=K
    ).toPandas()
    nooped = topk(
        spark,
        f"{index_dir}/index",
        qs[["query_id", "query_text"]],
        k=K,
        not_terms=["zzzzneverseen"],
    ).toPandas()
    pd.testing.assert_frame_equal(
        plain.sort_values(["query_id", "rank"]).reset_index(drop=True),
        nooped.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )


def test_or_mode_k0_rejected(spark, index_dir):
    qs = pd.DataFrame([(0, "the")], columns=["query_id", "query_text"])
    with pytest.raises(ValueError, match="mode='and'"):
        topk(spark, f"{index_dir}/index", qs, k=0)


def test_phrase_topk_rank_identity(spark, index_dir, oracle):
    """Phrases lifted verbatim from fixture documents must match (the
    source doc at minimum); a shuffled variant must match only docs
    where that order ALSO occurs — both checked against the oracle's
    ordered-adjacency brute force."""
    rows = []
    qid = 0
    rng = np.random.default_rng(7)
    for d in rng.choice(2000, size=6, replace=False):
        toks = list(oracle.tokens[int(d)])
        if len(toks) < 8:
            continue
        phrase = toks[3:6]
        rows.append((qid, " ".join(phrase), int(d)))
        qid += 1
        rows.append((qid, " ".join(reversed(phrase)), -1))
        qid += 1
    qs = pd.DataFrame(rows, columns=["query_id", "query_text", "src_doc"])
    hits = phrase_topk(
        spark,
        f"{index_dir}/index",
        f"{index_dir}/docs",
        qs[["query_id", "query_text"]],
        k=K,
    ).toPandas()
    verified_any = 0
    for qid, row in qs.set_index("query_id").iterrows():
        want = oracle.topk_mode(row["query_text"], k=K, mode="and", phrase=True)
        got = hits[hits["query_id"] == qid].sort_values("rank")
        _compare_topk(got, want, qid)
        if row["src_doc"] >= 0:
            assert row["src_doc"] in set(want["doc_id"]), (
                f"q{qid}: oracle lost the source doc (test bug)"
            )
            assert row["src_doc"] in set(got["doc_id"].tolist())
            verified_any += 1
    assert verified_any >= 3


def test_phrase_normalization_matches_tokenizer(spark, tmp_path):
    """Adjacency is over TOKENS, not raw bytes: punctuation/case/extra
    whitespace between tokens must not break a phrase, and token
    boundaries must not create false ones ('scan ner' ≠ 'scanner')."""
    from theoremsearch_spark.build import build_index
    from theoremsearch_spark.stats import prepare_docs

    docs = [
        ("u0", b"Alpha, BETA! gamma"),            # matches: punctuation + case
        ("u1", b"alpha &amp; beta gamma"),        # matches: entity collapses
        ("u2", b"alpha gamma beta"),              # AND-set member, order wrong
        ("u3", b"alphabeta gamma"),               # no token boundary -> no match
        ("u4", b"beta alpha beta xx alpha beta"), # matches mid-doc
    ]
    pdf = pd.DataFrame(
        {
            "url": [u for u, _ in docs],
            "warc_ts": pd.Timestamp("2024-01-01"),
            "lang": "en",
            "html": [h for _, h in docs],
        }
    )
    src = spark.createDataFrame(pdf)
    d = str(tmp_path / "phrase_idx")
    prepared = prepare_docs(src, d, num_partitions=1)
    build_index(prepared, f"{d}/index", salt_threshold=100, n_segments=2, n_buckets=2)
    qs = pd.DataFrame([(0, "alpha beta")], columns=["query_id", "query_text"])
    got = phrase_topk(spark, f"{d}/index", f"{d}/docs", qs, k=10).toPandas()
    urls = spark.read.parquet(f"{d}/docs").select("doc_id", "url").toPandas()
    got_urls = set(got.merge(urls, on="doc_id")["url"])
    assert got_urls == {"u0", "u1", "u4"}


def test_phrase_verify_plan_is_jvm_side(spark, index_dir):
    """The verification stage (normalize → contains → snippet window)
    must be pure codegen string ops: candidates enter as an executor-
    checkpointed pool (scored before the verify plan builds), so NO
    Python eval node may appear in the executed plan. Both tokens must
    be indexed — an unindexed token folds the whole plan to a statically
    empty relation, which would vacuously pass the EvalPython check."""
    qs = pd.DataFrame([(0, "the and")], columns=["query_id", "query_text"])
    df = phrase_topk(
        spark, f"{index_dir}/index", f"{index_dir}/docs", qs, k=5, snippet_pad=20
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan
    assert "Contains" in plan or "contains" in plan, plan


def test_phrase_snippet_window(spark, index_dir, oracle):
    """Snippet = normalized-text window around the FIRST occurrence,
    exactly ±pad chars (clamped at the string start)."""
    d = 42
    toks = list(oracle.tokens[d])
    phrase = " ".join(toks[4:6])
    qs = pd.DataFrame([(0, phrase)], columns=["query_id", "query_text"])
    pad = 15
    hits = phrase_topk(
        spark, f"{index_dir}/index", f"{index_dir}/docs", qs, k=2000,
        snippet_pad=pad,
    ).toPandas()
    row = hits[hits["doc_id"] == d]
    assert len(row) == 1
    snippet = row["snippet"].iloc[0]
    needle = f" {phrase} "
    assert needle in snippet
    norm = " " + " ".join(toks) + " "
    pos = norm.index(needle)  # 0-based; SQL locate is pos+1
    start = max(0, pos - pad)
    assert snippet == norm[start : start + 2 * pad + len(needle)]
