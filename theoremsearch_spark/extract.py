"""HTML extraction + tokenization — the byte-identity contract.

``extract_text(html: bytes) -> str`` is the single source of truth for
text extraction; the Spark path wraps exactly this function in a
vectorized pandas UDF, so the per-row invariant "byte-identical
extracted text per url" holds by construction and is locked by pytest
(tests/test_extract.py).

Semantics are modeled on the reference's pure-regex text transforms:
  - encoding fallback utf-8 → latin-1 → latin-1(errors=replace)
    (/root/reference/ec2/parse_arxiv_papers/main_tex.py:20-28)
  - comment stripping (/root/reference/ec2/parse_papers/latex_parse.py:399-400)
  - NUL stripping (/root/reference/ec2/parse_arxiv_papers/plastex_method/parse.py:128-133)
  - whitespace normalization (/root/reference/ec2/parse_papers/latex_parse.py:378)
applied to HTML instead of LaTeX: strip <!-- --> comments, drop
<script>/<style> subtrees, strip tags, decode ALL HTML character
references (named + decimal/hex numeric, via the stdlib HTML5
algorithm — html.unescape is single-pass, so &amp;lt; decodes to &lt;,
never to <), collapse whitespace, strip NULs.

Everything is pure Python/regex over str — no subprocess, no DOM
library — so it vectorizes cleanly over a pd.Series inside an Arrow
batch (no per-row Python UDF, per BASELINE.json input_hint).
"""

from __future__ import annotations

import html as html_module
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKENIZER_VERSION = "ws-lower-v1"

_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_SCRIPT_STYLE_RE = re.compile(r"<(script|style)\b.*?</\1\s*>", re.DOTALL | re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def decode_bytes(raw: bytes) -> str:
    """Encoding-fallback decode: utf-8 → latin-1 → latin-1(replace).

    Mirrors /root/reference/ec2/parse_arxiv_papers/main_tex.py:20-28.
    """
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        try:
            return raw.decode("latin-1")
        except UnicodeDecodeError:  # pragma: no cover — latin-1 can't fail
            return raw.decode("latin-1", errors="replace")


def extract_text(html: bytes | None) -> str:
    """bytes of HTML → normalized plain text. Pure; deterministic."""
    if html is None:
        return ""
    s = decode_bytes(html)
    s = s.replace("\x00", "")  # NUL strip (plastex_method/parse.py:128-133)
    s = _COMMENT_RE.sub(" ", s)
    s = _SCRIPT_STYLE_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    # full HTML5 character-reference decode (named + numeric): on real
    # Common-Crawl HTML the numeric tail (&#8217; / &#x2019;) and the
    # long named tail would otherwise pollute the token stream as
    # literal "8217"/"rsquo" tokens. Single-pass (&amp;lt; → &lt;, not
    # <); non-breaking spaces it emits collapse in the \s+ pass below.
    s = html_module.unescape(s)
    s = _WS_RE.sub(" ", s).strip()
    return s


def tokenize(text: str | None) -> list[str]:
    """Lowercase, split on non-alphanumeric runs. Frozen per TOKENIZER_VERSION."""
    if not text:
        return []
    return _TOKEN_RE.findall(text.lower())


# ---------------------------------------------------------------------------
# Vectorized Spark wrappers (Arrow-batched pandas UDFs; JVM ↔ Arrow ↔ numpy)
# ---------------------------------------------------------------------------


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text)


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(text: pd.Series) -> pd.Series:
    return text.map(tokenize)


_TERM_TF_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("tf", T.IntegerType(), False),
        ]
    )
)


@F.pandas_udf(_TERM_TF_TYPE)
def term_tfs_udf(text: pd.Series) -> pd.Series:
    """text → [(term, tf)] — per-document term frequencies.

    Emitting (term, tf) pairs instead of raw tokens is the map-side
    combine for posting construction: the downstream shuffle moves one
    row per *distinct* term per doc, not one per token occurrence
    (~5-10× less shuffle data at μ≈200-token docs; far more at 100 TB).
    """

    def agg(text: str) -> list[tuple[str, int]]:
        counts: dict[str, int] = {}
        for tok in tokenize(text):
            counts[tok] = counts.get(tok, 0) + 1
        return list(counts.items())

    return text.map(agg)


@F.pandas_udf(T.IntegerType())
def doc_len_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: len(tokenize(t)))


_EXTRACTED_TYPE = T.StructType(
    [
        T.StructField("extracted_text", T.StringType(), True),
        T.StructField("doc_len", T.IntegerType(), False),
        T.StructField("term_tfs", _TERM_TF_TYPE, False),
    ]
)


@F.pandas_udf(_EXTRACTED_TYPE)
def extract_all_udf(html: pd.Series) -> pd.DataFrame:
    """html → (extracted_text, doc_len, term_tfs) in ONE Python pass.

    The whole build pipeline crosses the JVM↔Python boundary exactly
    once per document: extraction, tokenization, tf aggregation and
    doc length all come out of this single Arrow batch. Everything
    downstream (stats, salting, posting shuffle) is JVM-side column
    work on the stored struct."""
    texts, lens, tfs = [], [], []
    for raw in html:
        text = extract_text(raw)
        counts: dict[str, int] = {}
        n = 0
        for tok in tokenize(text):
            counts[tok] = counts.get(tok, 0) + 1
            n += 1
        texts.append(text)
        lens.append(n)
        tfs.append(list(counts.items()))
    return pd.DataFrame(
        {"extracted_text": texts, "doc_len": lens, "term_tfs": tfs}
    )
