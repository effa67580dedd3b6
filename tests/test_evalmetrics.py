"""IR metric tests: Spark implementation vs a tiny pure-Python oracle
(the same formulas as /root/reference/compare_embeddings.py), plus an
end-to-end eval of the engine's results on the planted query set."""

import math

import pandas as pd
import pytest

from theoremsearch_spark.functions.evalmetrics import grade_hits, ir_metrics

K = 5


def py_metrics(runs: dict[int, list[float]], k: int = K) -> dict:
    """runs: query_id -> graded rel list in rank order."""
    p1, hit, mrr, ndcg, err, qm = [], [], [], [], [], []
    for rels in runs.values():
        rels = rels[:k]
        p1.append(1.0 if rels and rels[0] >= 1.0 else 0.0)
        hit.append(1.0 if any(r >= 1.0 for r in rels) else 0.0)
        rr = 0.0
        for i, r in enumerate(rels):
            if r >= 1.0:
                rr = 1.0 / (i + 1)
                break
        mrr.append(rr)
        gains = [2**r - 1 for r in rels]
        dcg = sum(g / math.log2(i + 2) for i, g in enumerate(gains))
        idcg = sum(g / math.log2(i + 2) for i, g in enumerate(sorted(gains, reverse=True)))
        ndcg.append(dcg / idcg if idcg > 0 else 0.0)
        p_no_stop = 1.0
        e = 0.0
        for i, r in enumerate(rels):
            rp = (2**r - 1) / 2.0
            e += p_no_stop * rp / (i + 1)
            p_no_stop *= 1 - rp
        err.append(e)
        cg = 0.0
        ig_sorted = sorted(gains, reverse=True)
        cum_ideal = 0.0
        q_terms = []
        cum_ideals = []
        for i, g in enumerate(ig_sorted):
            cum_ideal += g
            cum_ideals.append(cum_ideal)
        for i, r in enumerate(rels):
            cg += gains[i]
            if r > 0:
                q_terms.append((cg + (i + 1)) / (cum_ideals[i] + (i + 1)))
        qm.append(sum(q_terms) / len(q_terms) if q_terms else 0.0)
    n = len(runs)
    return {
        "p_at_1": round(sum(p1) / n, 4),
        "hit_at_k": round(sum(hit) / n, 4),
        "mrr_at_k": round(sum(mrr) / n, 4),
        "ndcg_at_k": round(sum(ndcg) / n, 4),
        "err_at_k": round(sum(err) / n, 4),
        "q_at_k": round(sum(qm) / n, 4),
    }


def test_metrics_vs_python_oracle(spark):
    runs = {
        0: [1.0, 0.0, 0.5, 0.0, 0.0],
        1: [0.0, 0.5, 1.0, 0.0, 0.0],
        2: [0.0, 0.0, 0.0, 0.0, 0.0],
        3: [0.5, 1.0, 0.5, 0.0, 1.0],
        4: [1.0],
    }
    rows = [
        (qid, i + 1, float(rel))
        for qid, rels in runs.items()
        for i, rel in enumerate(rels)
    ]
    graded = spark.createDataFrame(rows, "query_id int, rank int, rel double")
    got = ir_metrics(graded, k=K).collect()[0].asDict()
    want = py_metrics(runs)
    for m, v in want.items():
        assert got[m] == pytest.approx(v, abs=2e-4), (m, got[m], v)
    assert got["n_queries"] == 5


def test_grade_hits_group_match(spark):
    hits = spark.createDataFrame(
        [
            (0, 1, "https://example.org/en/doc00000123"),
            (0, 2, "https://example.org/en/doc00000124"),
            (0, 3, "https://example.org/en/doc00009999"),
        ],
        "query_id int, rank int, url string",
    )
    qrels = spark.createDataFrame(
        [(0, "https://example.org/en/doc00000123", "g0000012")],
        "query_id int, expected_url string, expected_group string",
    )
    out = {r["rank"]: r["rel"] for r in grade_hits(hits, qrels).collect()}
    assert out == {1: 1.0, 2: 0.5, 3: 0.0}


def test_engine_eval_on_planted_queries(spark, index_dir):
    """End-to-end: engine results scored with the reference's metric
    suite on the 73 planted queries (exact=1, same-group=0.5)."""
    from theoremsearch_spark.corpus import generate_queries, query_set
    from theoremsearch_spark.query import topk_with_urls

    qs = query_set(2000)
    hits = topk_with_urls(
        spark, f"{index_dir}/index", f"{index_dir}/docs",
        qs[["query_id", "query_text"]], k=K,
    ).select("query_id", "rank", "url")
    qrels = spark.createDataFrame(qs[["query_id", "expected_url", "expected_group"]])
    m = ir_metrics(grade_hits(hits, qrels), k=K).collect()[0].asDict()
    assert m["n_queries"] == 73
    assert m["p_at_1"] >= 0.9
    assert m["hit_at_k"] >= m["p_at_1"]
    assert m["mrr_at_k"] >= m["p_at_1"]
    assert 0 < m["ndcg_at_k"] <= 1.0
    assert 0 < m["err_at_k"] <= 1.0
    assert 0 < m["q_at_k"] <= 1.0
