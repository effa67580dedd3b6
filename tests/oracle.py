"""Single-node pure-Python BM25 oracle — the rank-identity ground truth.

Plays the role of the reference's labeled-evaluation harness
(/root/reference/compare_embeddings.py:55-92): same tokenizer, same
scoring formula, brute force over the whole corpus in pandas/numpy.
The Spark engine's top-k (docIDs AND scores) must match rank-identically
with tie-break (score DESC, doc_id ASC)
(/root/reference/streamlit_app.py:362).

Score accumulation iterates query terms in lexicographic order — the
engine's canonical re-scoring order — so float64 sums agree bitwise up
to the avgdl aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from theoremsearch_spark.extract import extract_text, tokenize


class BM25Oracle:
    def __init__(self, docs: pd.DataFrame, k1: float = 1.2, b: float = 0.75):
        """docs: columns (doc_id, url, text|html). Rows are re-indexed so
        position == doc_id (ids must be dense 0..N-1, any input order)."""
        docs = docs.sort_values("doc_id").reset_index(drop=True)
        assert (docs["doc_id"].to_numpy() == np.arange(len(docs))).all(), "ids not dense"
        self.urls = docs["url"].to_numpy()
        if "text" in docs and docs["text"].notna().all():
            texts = docs["text"]
        else:
            texts = docs["html"].map(extract_text)
        self.tokens = texts.map(tokenize)
        self.doc_len = self.tokens.map(len).to_numpy(np.int64)
        self.n_docs = len(docs)
        self.avgdl = float(self.doc_len.mean())
        self.k1, self.b = k1, b
        # postings: term -> (doc_ids ascending, tfs)
        self.postings: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        tmp: dict[str, dict[int, int]] = {}
        for d, toks in enumerate(self.tokens):
            for t in toks:
                tmp.setdefault(t, {})
                tmp[t][d] = tmp[t].get(d, 0) + 1
        for t, m in tmp.items():
            ids = np.fromiter(sorted(m), dtype=np.int64, count=len(m))
            tfs = np.array([m[i] for i in ids], dtype=np.int64)
            self.postings[t] = (ids, tfs)

    def idf(self, term: str) -> float:
        df = self.postings.get(term, (np.empty(0),))[0].size
        return float(np.log1p((self.n_docs - df + 0.5) / (df + 0.5)))

    def score(self, query: str) -> np.ndarray:
        """Dense score vector over all docs, terms in lexicographic order."""
        s = np.zeros(self.n_docs, dtype=np.float64)
        for t in sorted(set(tokenize(query))):
            if t not in self.postings:
                continue
            ids, tfs = self.postings[t]
            dl = self.doc_len[ids]
            tf_norm = (tfs * (self.k1 + 1.0)) / (
                tfs + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
            )
            s[ids] += self.idf(t) * tf_norm
        return s

    def topk(self, query: str, k: int = 10) -> pd.DataFrame:
        s = self.score(query)
        nz = np.flatnonzero(s > 0)
        order = nz[np.argsort(-s[nz], kind="stable")][:k]  # ties → doc_id asc
        return pd.DataFrame(
            {
                "rank": np.arange(1, order.size + 1, dtype=np.int32),
                "doc_id": order.astype(np.int64),
                "url": self.urls[order],
                "score": s[order],
            }
        )

    def topk_mode(
        self,
        query: str,
        k: int = 10,
        *,
        mode: str = "or",
        not_terms=None,
        phrase: bool = False,
    ) -> pd.DataFrame:
        """Brute-force mode-aware top-k: conjunctive candidate sets,
        must-not exclusion, and ordered-adjacency phrase matching over
        the raw token streams — the ground truth for topk(mode=...),
        topk(not_terms=...) and phrase_topk."""
        s = self.score(query)
        if mode == "and":
            qts = sorted(set(tokenize(query)))
            cand: np.ndarray | None = None
            for t in qts:
                ids = self.postings.get(t, (np.empty(0, np.int64),))[0]
                cand = ids if cand is None else np.intersect1d(cand, ids)
            cand = cand if cand is not None else np.empty(0, np.int64)
        else:
            cand = np.flatnonzero(s > 0)
        for t in not_terms or []:
            if t in self.postings:
                cand = np.setdiff1d(cand, self.postings[t][0])
        if phrase:
            seq = tokenize(query)
            n = len(seq)
            keep = [
                d
                for d in cand
                if any(
                    list(self.tokens[d][i : i + n]) == seq
                    for i in range(len(self.tokens[d]) - n + 1)
                )
            ]
            cand = np.array(keep, dtype=np.int64)
        order = cand[np.argsort(-s[cand], kind="stable")][:k]
        return pd.DataFrame(
            {
                "rank": np.arange(1, order.size + 1, dtype=np.int32),
                "doc_id": order.astype(np.int64),
                "url": self.urls[order],
                "score": s[order],
            }
        )
