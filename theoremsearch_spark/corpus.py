"""Deterministic synthetic web corpus — the engine's test/bench input.

Produces the exact ``BASELINE.json`` input_hint shape:
    documents(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)
analog of the reference corpus (`/root/reference/rds_schema.sql:1-19`).

Properties (FIXTURES.md §1):
  - token distribution Zipfian (s≈1.1, ~10k vocabulary), doc lengths
    log-normal around μ≈200 tokens;
  - 20 designated stopwords carry ~40% of token mass, so each appears in
    >50% of docs — this is what exercises the salted-repartition /
    split-segment skew path;
  - ~5% of rows latin-1 encoded, ~1% contain NUL bytes and truncated
    tags (encoding fallback + NUL strip + robustness);
  - `text` column = expected extraction output per url (computed by the
    same pure `extract_text` the UDF wraps — the byte-identity oracle);
  - per-row determinism: every column is a pure function of
    (seed, doc_id), independent of partitioning, so any executor
    produces identical rows for its ids.

Generation is distributed: ``spark.range(n)`` → ``mapInPandas``; no
driver-side materialization, scales linearly with cores.

The 73-query evaluation set mirrors the reference's
`validation_set.csv` (73 labeled queries): each query's expected
document is *planted* — its tokens are appended to the target doc at
generation time (`compare_embeddings.py:453-457` exact-match qrels).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from theoremsearch_spark.extract import extract_text

SEED = 42
VOCAB_SIZE = 10_000
N_QUERIES = 73
ZIPF_S = 1.1
MEAN_LOG_LEN = 5.1  # e^5.1 ≈ 164; with σ=0.45 mean ≈ 200 tokens
SIGMA_LOG_LEN = 0.45
STOPWORDS = (
    "the and of to in is for on with as by at from or an "
    "be this that it are was can has not have will".split()
)[:20]
STOPWORD_MASS = 0.40

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), False),
    ]
)

QUERIES_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.IntegerType(), False),
        T.StructField("query_text", T.StringType(), False),
        T.StructField("expected_url", T.StringType(), False),
        T.StructField("expected_group", T.StringType(), False),
    ]
)

_VOCAB = np.array([f"w{i:05d}" for i in range(VOCAB_SIZE)])
_LANGS = np.array(["en", "de", "fr", "zz"])
_LANG_P = np.array([0.90, 0.04, 0.03, 0.03])

# mixture: STOPWORD_MASS spread uniformly over stopwords, rest Zipf(s) over vocab
_zipf_w = 1.0 / np.arange(1, VOCAB_SIZE + 1) ** ZIPF_S
_zipf_w /= _zipf_w.sum()
_ALL_TOKENS = np.concatenate([np.array(STOPWORDS), _VOCAB])
_ALL_P = np.concatenate(
    [np.full(len(STOPWORDS), STOPWORD_MASS / len(STOPWORDS)), (1 - STOPWORD_MASS) * _zipf_w]
)
_CUM_P = np.cumsum(_ALL_P)
_CUM_P[-1] = 1.0

_TS_BASE = np.datetime64("2019-01-01T00:00:00")
_TS_SPAN_S = int((np.datetime64("2026-01-01") - _TS_BASE) / np.timedelta64(1, "s"))


def _rng(doc_id: int, salt: int = 0) -> np.random.Generator:
    return np.random.default_rng((SEED << 40) ^ (salt << 32) ^ doc_id)


def _doc_lang(doc_id: int) -> str:
    return str(_LANGS[_rng(doc_id, 1).choice(len(_LANGS), p=_LANG_P)])


def doc_url(doc_id: int) -> str:
    return f"https://example.org/{_doc_lang(doc_id)}/doc{doc_id:08d}"


def _body_tokens(doc_id: int) -> np.ndarray:
    rng = _rng(doc_id, 2)
    n = max(4, int(rng.lognormal(MEAN_LOG_LEN, SIGMA_LOG_LEN)))
    return _ALL_TOKENS[np.searchsorted(_CUM_P, rng.random(n), side="right")]


def query_set(n_docs: int) -> pd.DataFrame:
    """The 73-query evaluation set for a corpus of ``n_docs`` documents.

    50 head-heavy (frequent terms), 15 mid-range, 8 containing ≥1
    stopword (forces a long-posting intersection through the salted
    segments). Pure function of (SEED, n_docs).
    """
    rows = []
    for qid in range(N_QUERIES):
        rng = _rng(qid, 7)
        n_terms = int(rng.integers(2, 7))
        if qid < 50:  # head-heavy
            idx = rng.integers(0, 200, n_terms)
            toks = list(_VOCAB[idx])
        elif qid < 65:  # mid
            idx = rng.integers(200, 3000, n_terms)
            toks = list(_VOCAB[idx])
        else:  # stopword-laden
            idx = rng.integers(0, 1000, n_terms - 1)
            toks = list(_VOCAB[idx]) + [STOPWORDS[int(rng.integers(0, len(STOPWORDS)))]]
        target = int(rng.integers(0, n_docs))
        rows.append(
            {
                "query_id": qid,
                "query_text": " ".join(toks),
                "expected_url": doc_url(target),
                "expected_group": f"g{target // 10:07d}",
            }
        )
    return pd.DataFrame(rows)


def _planted(n_docs: int) -> dict[int, str]:
    """doc_id → extra token text planted so each query has an exact hit."""
    q = query_set(n_docs)
    out: dict[int, str] = {}
    for _, row in q.iterrows():
        doc_id = int(row.expected_url.rsplit("doc", 1)[1])
        # plant the query tokens 3× so the target outranks incidental matches
        out[doc_id] = out.get(doc_id, "") + (" " + row.query_text) * 3
    return out


def make_doc(doc_id: int, planted: dict[int, str]) -> tuple[str, np.datetime64, bytes, str, str]:
    """Pure generator of one row; deterministic in (SEED, doc_id, n_docs)."""
    lang = _doc_lang(doc_id)
    url = f"https://example.org/{lang}/doc{doc_id:08d}"
    ts = _TS_BASE + np.timedelta64((doc_id * 2_654_435_761) % _TS_SPAN_S, "s")
    body = " ".join(_body_tokens(doc_id)) + planted.get(doc_id, "")
    rng = _rng(doc_id, 3)
    edge = rng.random()
    title = f"Doc {doc_id} {lang}"
    if edge < 0.05:
        title = f"Doc {doc_id} r\xe9sum\xe9"  # latin-1 encodable, not valid utf-8
    html = (
        f"<html><head><title>{title}</title>"
        f"<style>p {{margin: 0}}</style></head>"
        f"<body><!-- crawl {doc_id} --><p>{body}</p>"
        f"<script>var x = {doc_id};</script></body></html>"
    )
    if edge < 0.05:
        raw = html.encode("latin-1")
    elif edge < 0.06:
        # NUL bytes + truncated trailing tag
        raw = (html + "\x00<p class=\"trunc").encode("utf-8")
    else:
        raw = html.encode("utf-8")
    return url, ts, raw, extract_text(raw), lang


def generate_documents(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic corpus: spark.range → mapInPandas."""
    planted = _planted(n_docs)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [make_doc(int(i), planted) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    rng_df = spark.range(0, n_docs, numPartitions=partitions)
    return rng_df.mapInPandas(gen, schema=DOCUMENTS_SCHEMA)


def generate_queries(spark: SparkSession, n_docs: int) -> DataFrame:
    return spark.createDataFrame(query_set(n_docs), schema=QUERIES_SCHEMA)


VEC_DIM = 64
VEC_CLUSTERS = 256
VECTORS_SCHEMA = "vec_id long, embedding array<float>, label int"


def generate_vectors(
    spark: SparkSession, n_vecs: int, dim: int = VEC_DIM,
    n_clusters: int = VEC_CLUSTERS, partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic clustered vector corpus (the ANN bench
    input): vec i = unit(center[i mod n_clusters] + 0.15·noise(i)),
    `label` = i mod 10 as filterable metadata. Per-row determinism as
    in `generate_documents`: every row is a pure function of
    (SEED, vec_id), independent of partitioning."""
    centers = np.random.default_rng(SEED ^ 0xA55).standard_normal(
        (n_clusters, dim)
    ).astype(np.float64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            X = np.empty((len(ids), dim), np.float64)
            for r, i in enumerate(ids):
                X[r] = centers[int(i) % n_clusters] + 0.15 * _rng(
                    int(i), 9
                ).standard_normal(dim)
            X /= np.linalg.norm(X, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    "vec_id": ids,
                    "embedding": [row.astype(np.float32) for row in X],
                    "label": (ids % 10).astype(np.int32),
                }
            )

    rng_df = spark.range(0, n_vecs, numPartitions=partitions)
    return rng_df.mapInPandas(gen, schema=VECTORS_SCHEMA)
