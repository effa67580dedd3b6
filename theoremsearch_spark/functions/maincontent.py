"""Main-content selection — the S7 analog: the reference picks the
main .tex file of a multi-file paper by building an inclusion graph and
scoring candidates with structure heuristics (sections + theorem
density − draft markers, /root/reference/ec2/parse_arxiv_papers/
main_tex.py:59-179; older variant ec2/parse_papers/tex.py:14-48).

For a web page the same capability is boilerplate-vs-content scoring:
split the page into block-level segments and keep the one the scorer
likes best —

    score = text_length − 3·linked_text_length − boilerplate_penalty

(link density is the classic readability signal; nav/footer/header/
aside segments carry a structural penalty — the analog of the
reference's "draft marker" negative term, main_tex.py:143-179).

Pure str→str, deterministic; vectorizes in one Arrow batch.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F, types as T

from theoremsearch_spark.extract import decode_bytes

_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_SCRIPT_STYLE_RE = re.compile(r"<(script|style)\b.*?</\1\s*>", re.DOTALL | re.IGNORECASE)
_BOUNDARY_RE = re.compile(
    r"<(/?)(div|p|section|article|main|nav|footer|header|aside|table)\b[^>]*>",
    re.IGNORECASE,
)
_A_RE = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.DOTALL | re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")

_PENALIZED = {"nav", "footer", "header", "aside"}
_BOILERPLATE_PENALTY = 50
_LINK_WEIGHT = 3


def _strip(s: str) -> str:
    return _WS_RE.sub(" ", _TAG_RE.sub(" ", s)).strip()


def score_block(raw: str, opened_by: str | None) -> int:
    """Readability-style block score (the reference's candidate scorer
    shape: positive structure signal minus negative markers)."""
    linked = sum(len(_strip(m)) for m in _A_RE.findall(raw))
    text = len(_strip(raw))
    penalty = _BOILERPLATE_PENALTY if (opened_by or "").lower() in _PENALIZED else 0
    return text - _LINK_WEIGHT * linked - penalty


def select_main_content(html: bytes | None) -> str:
    """HTML bytes → text of the best-scoring block segment.

    Segments are the spans between block-level tag boundaries, each
    attributed to the tag that opened it. Falls back to the whole
    cleaned page when no boundary exists. Deterministic ties → first
    segment (document order, the reference's root-preference)."""
    if html is None:
        return ""
    s = decode_bytes(html).replace("\x00", "")
    s = _COMMENT_RE.sub(" ", s)
    s = _SCRIPT_STYLE_RE.sub(" ", s)
    segments: list[tuple[str, str | None]] = []
    last = 0
    opener: str | None = None
    for m in _BOUNDARY_RE.finditer(s):
        if m.start() > last:
            segments.append((s[last: m.start()], opener))
        opener = None if m.group(1) == "/" else m.group(2)
        last = m.end()
    if last < len(s):
        segments.append((s[last:], opener))
    best_text, best_score = "", None
    for raw, opened_by in segments:
        text = _strip(raw)
        if not text:
            continue
        sc = score_block(raw, opened_by)
        if best_score is None or sc > best_score:
            best_text, best_score = text, sc
    return best_text


@F.pandas_udf(T.StringType())
def select_main_content_udf(html: pd.Series) -> pd.Series:
    return html.map(select_main_content)
