"""Unit extraction — the reference's core data model: one document →
many searchable units.

The reference's searchable row is the *extracted unit*, not the
document: `theorem(theorem_id, paper_id, name, body, label)` with
UNIQUE(paper_id, name) (/root/reference/rds_schema.sql:21-31), produced
by a one-row-in/many-rows-out extractor
(/root/reference/ec2/parse_papers/latex_parse.py:395-417). This module
reproduces that shape over HTML:

  - `extract_units(html)` — heading-delimited sections. Each unit gets
      name   = "<heading text> <number>."  — the reference's
               `"Title 3.2."` header shape, produced by a *stateful
               per-document numbering simulation* (hierarchical
               counters with descendant reset — the T10 analog of
               /root/reference/ec2/parse_papers/theorem_forms.py:13-136);
      body   = tag-stripped text until the next heading, cleaned by a
               *fixpoint rewrite* (apply rules until no change, with an
               iteration cap — the T13 analog of
               /root/reference/ec2/parse_arxiv_papers/tex_method/
               expand_latex_macros.py:170-211);
      label  = first id="…"/name="…" anchor in the section, removed
               from the body; duplicate labels within a document are
               nulled (T11 —
               /root/reference/ec2/parse_papers/latex_parse.py:367-392).
    Content before the first heading becomes unit 0 ("preamble").
  - `units_udf` — the Spark UDTF shape (U3): one Arrow-batched pandas
    UDF returning ARRAY<STRUCT>, exploded JVM-side into unit rows.
  - `prepare_units(documents, out_dir)` — documents → units table with
    a composite unit_id = doc-offset·2^UNIT_SHIFT + seq in ONE Python
    pass (no second extraction job for dense ids; within-document
    posting gaps stay 1, cross-document gaps cost ~1 extra varbyte
    byte — the honest trade against a second full extraction pass at
    100 TB).

Indexing units instead of documents is then just `build_index(units)`
— unit_id plays doc_id, body plays extracted_text.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from theoremsearch_spark.extract import decode_bytes, tokenize

UNIT_SHIFT = 8  # ≤ 256 units per document (raise on overflow — no silent drop)

_HEADING_RE = re.compile(r"<h([1-6])\b([^>]*)>(.*?)</h\1\s*>", re.DOTALL | re.IGNORECASE)
_ANCHOR_RE = re.compile(r"""\bid\s*=\s*["']([^"']+)["']""", re.IGNORECASE)
# keyval attributes on headings — the T8 analog of the reference's
# DECLARETHEOREM `name=` keyval parsing
# (/root/reference/ec2/parse_arxiv_papers/re_patterns.py:24-39):
#   data-kind="lemma"    declared kind overrides the heading text as
#                        the unit's caption (NEWTHEOREM {title});
#   data-counter="c"     draw the number from named shared counter `c`
#                        (T6 — \newaliascnt/[shared] semantics);
#   data-appendix        switch level-1 numbering to A, B, C… (the
#                        appendix-alpha mode, theorem_forms.py:96-118).
_KEYVAL_RE = re.compile(
    r"""\b(data-kind|data-counter)\s*=\s*["']([^"']*)["']""", re.IGNORECASE
)
_APPENDIX_RE = re.compile(r"\bdata-appendix\b", re.IGNORECASE)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_SCRIPT_STYLE_RE = re.compile(r"<(script|style)\b.*?</\1\s*>", re.DOTALL | re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]*>")

# fixpoint rules (longest/most-specific first — the reference's
# longest-key-first substitution order, latex_parse.py:30,94):
# shorthand normalization (T17 analog) + whitespace squeeze (T12)
_FIXPOINT_RULES: list[tuple[re.Pattern, str]] = [
    (re.compile(r"\bthms?\b"), "theorem"),
    (re.compile(r"\blems?\b"), "lemma"),
    (re.compile(r"\bprops?\b"), "proposition"),
    (re.compile(r"\bcors?\b"), "corollary"),
    (re.compile(r"\s+"), " "),
]
_FIXPOINT_MAX_ITERS = 10


def fixpoint_sub(text: str, rules=None, max_iters: int = _FIXPOINT_MAX_ITERS) -> str:
    """Apply rewrite rules repeatedly until the text stops changing —
    the reference's nested-macro fixpoint expansion with recursion
    pruning (expand_latex_macros.py:170-211). The iteration cap bounds
    pathological self-feeding rules the same way the reference prunes
    recursive macros."""
    rules = _FIXPOINT_RULES if rules is None else rules
    for _ in range(max_iters):
        new = text
        for pat, repl in rules:
            new = pat.sub(repl, new)
        if new == text:
            break
        text = new
    return text.strip()


def _strip(html: str) -> str:
    s = _COMMENT_RE.sub(" ", html)
    s = _SCRIPT_STYLE_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    for ent, ch in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]:
        s = s.replace(ent, ch)
    return s


class _Numberer:
    """Stateful per-document numbering (T10 analog) with the
    reference's full counter semantics:

      - per-level hierarchical counters with descendant reset — the
        `within` parents of theorem_forms.py:13-136;
      - NAMED shared counters (T6): headings declaring data-counter="c"
        draw from ONE shared sequence regardless of their kind — the
        \\newaliascnt / [shared] rewrite
        (/root/reference/ec2/parse_papers/latex_parse.py:48-78,
        theorem_forms.py:34-42). A named counter is pinned to the level
        of its first use (its number renders under that level's parent
        chain) and resets whenever any SHALLOWER level increments
        (within-reset);
      - appendix alpha: after data-appendix on a heading, level-1
        numbers render A, B, C… (theorem_forms.py:96-135 `_to_alpha`;
        level-1 counter restarts like LaTeX's \\appendix).

    Skipped levels render a 0 placeholder (an h3 directly under an h1
    numbers "1.0.1") — deliberate tolerance for real-web heading
    misuse: the position in the hierarchy stays faithful and the
    numbering stays monotone, where renumbering as h2 would collide
    with genuine h2 siblings."""

    def __init__(self) -> None:
        self.counters = [0] * 6
        self.named: dict[str, int] = {}
        self.named_level: dict[str, int] = {}
        self.alpha1 = False

    def enter_appendix(self) -> None:
        if not self.alpha1:
            self.alpha1 = True
            self.counters[0] = 0

    @staticmethod
    def _alpha(n: int) -> str:
        out = []
        while n > 0:
            n, rem = divmod(n - 1, 26)
            out.append(chr(ord("A") + rem))
        return "".join(reversed(out)) or "A"

    def _fmt1(self, n: int) -> str:
        # a skipped level-1 counter keeps its "0" placeholder even in
        # alpha mode — _alpha(0) would render "A" and collide with the
        # first real appendix section's number
        return self._alpha(n) if self.alpha1 and n > 0 else str(n)

    def next(self, level: int, counter: str | None = None) -> str:
        if counter is None:
            self.counters[level - 1] += 1
            for i in range(level, 6):
                self.counters[i] = 0
            for name, lv in self.named_level.items():
                if lv > level:
                    self.named[name] = 0
            own = self._fmt1(self.counters[0]) if level == 1 else str(
                self.counters[level - 1]
            )
        else:
            level = self.named_level.setdefault(counter, level)
            self.named[counter] = self.named.get(counter, 0) + 1
            own = str(self.named[counter])
        parts = [self._fmt1(self.counters[0])] if level > 1 else []
        parts += [str(self.counters[i]) for i in range(1, level - 1)]
        parts.append(own)
        return ".".join(parts)


def extract_units(html: bytes | None, swap_numbers: bool = False) -> list[dict]:
    """HTML bytes → list of units (seq, name, body, label, level).

    Deterministic, pure; the single source of truth the pandas-UDF path
    wraps byte-identically (same contract as extract.extract_text).

    Heading keyvals (T8): data-kind overrides the heading text as the
    unit's caption (normalized through the same shorthand fixpoint, so
    data-kind="lem" titles as "Lemma"); data-counter selects a named
    shared counter (T6); data-appendix flips level-1 numbers to alpha.
    `swap_numbers=True` renders "3.2 Title." instead of "Title 3.2." —
    the amsthm \\swapnumbers option (theorem_forms.py:17,74-77)."""
    if html is None:
        return []
    s = decode_bytes(html).replace("\x00", "")
    matches = list(_HEADING_RE.finditer(s))
    seen_labels: set[str] = set()
    numberer = _Numberer()
    units: list[dict] = []

    def mk_unit(seq: int, name: str, raw_section: str, level: int) -> dict:
        m = _ANCHOR_RE.search(raw_section)
        label: str | None = None
        if m:
            label = m.group(1)
            raw_section = raw_section[: m.start()] + raw_section[m.end():]
            if label in seen_labels:  # duplicate labels nulled (T11)
                label = None
            else:
                seen_labels.add(label)
        body = fixpoint_sub(_strip(raw_section))
        return {"seq": seq, "name": name, "body": body, "label": label, "level": level}

    seq = 0
    pre_end = matches[0].start() if matches else len(s)
    preamble = s[:pre_end]
    if _strip(preamble).strip():
        units.append(mk_unit(seq, "preamble", preamble, 0))
        seq += 1
    for i, m in enumerate(matches):
        level = int(m.group(1))
        attrs = m.group(2)
        keyvals = {k.lower(): v for k, v in _KEYVAL_RE.findall(attrs)}
        if _APPENDIX_RE.search(attrs):
            numberer.enter_appendix()
        number = numberer.next(level, counter=keyvals.get("data-counter") or None)
        kind = keyvals.get("data-kind")
        if kind:  # declared kind is the caption (NEWTHEOREM {title})
            title = fixpoint_sub(kind).strip().capitalize()
        else:
            title = fixpoint_sub(_strip(m.group(3)))
        # the reference's "Title 3.2." shape; swapped renders "3.2. Title"
        # (the formatted number carries the trailing period either way,
        # theorem_forms.py:96-118)
        name = f"{number}. {title}" if swap_numbers else f"{title} {number}."
        sec_end = matches[i + 1].start() if i + 1 < len(matches) else len(s)
        raw_section = m.group(2) + s[m.end(): sec_end]  # heading attrs carry anchors
        units.append(mk_unit(seq, name, raw_section, level))
        seq += 1
    return units


_UNIT_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("seq", T.IntegerType(), False),
            T.StructField("name", T.StringType(), False),
            T.StructField("body", T.StringType(), False),
            T.StructField("label", T.StringType(), True),
            T.StructField("level", T.IntegerType(), False),
        ]
    )
)


@F.pandas_udf(_UNIT_TYPE)
def units_udf(html: pd.Series) -> pd.Series:
    """The U3 UDTF shape: one row in → many unit structs out; the
    caller explodes JVM-side."""
    return html.map(
        lambda raw: [
            (u["seq"], u["name"], u["body"], u["label"], u["level"])
            for u in extract_units(raw)
        ]
    )


UNITS_SCHEMA = T.StructType(
    [
        T.StructField("unit_id", T.LongType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("seq", T.IntegerType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("body", T.StringType(), False),
        T.StructField("label", T.StringType(), True),
        T.StructField("doc_len", T.IntegerType(), False),
        T.StructField("term_tfs", T.StringType(), False),
    ]
)


def prepare_units(documents: DataFrame, out_dir: str) -> DataFrame:
    """documents(url, html, …) → units table in ONE narrow Python pass,
    parquet-written.

    unit_id = (doc_offset + row) << UNIT_SHIFT | seq: composite ids keep
    one extraction pass; build_index consumes the result directly
    (unit_id → doc_id, body → text) with term_tfs pre-tokenized so no
    later stage re-enters Python.

    Partition identity comes from TaskContext inside the python worker,
    never from a spark_partition_id() column — same contract as
    stats.prepare_docs: on non-file sources Catalyst can evaluate that
    projection before an implicit exchange, making the column constant 0
    across partitions → silent duplicate doc_id/unit_id. The count job
    mirrors prepare_docs' two paths (footer count for file scans, a
    TaskContext mapInPandas count with the identical plan prefix
    otherwise), and a footer-interval post-check rejects overlapping id
    runs after the write."""
    from collections import Counter

    from pyspark import TaskContext

    spark = documents.sparkSession
    src = documents.select("url", "html")

    try:
        is_file_source = bool(src.inputFiles())
    except Exception:
        is_file_source = False

    if is_file_source:
        # spark_partition_id() is computed in the scan stage itself for a
        # file scan (no exchange can precede it) — footer-only count.
        counts = {
            int(r["pid"]): int(r["cnt"])
            for r in src.select(F.spark_partition_id().alias("pid"))
            .groupBy("pid").agg(F.count("*").alias("cnt")).collect()
        }
    else:

        def count_parts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            pid, n = TaskContext.get().partitionId(), 0
            for pdf in batches:
                n += len(pdf)
            yield pd.DataFrame({"pid": [pid], "cnt": [n]})

        counts = {
            int(r["pid"]): int(r["cnt"])
            for r in src.select("url").mapInPandas(
                count_parts, schema="pid int, cnt long"
            ).collect()
        }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    expected_docs = acc

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        base = None
        for pdf in batches:
            if pdf.empty:
                continue
            if base is None:
                # lazy so an empty partition (absent from the count job)
                # never faults; a NON-empty partition missing from the
                # count map raises — silent 0 = duplicate unit_ids
                base = offsets[TaskContext.get().partitionId()]
            rows = []
            for url, raw in zip(pdf["url"], pdf["html"]):
                doc_id = base + local
                local += 1
                units = extract_units(raw)
                if len(units) >= (1 << UNIT_SHIFT):
                    raise ValueError(
                        f"{url}: {len(units)} units exceeds 2^{UNIT_SHIFT} — "
                        "raise UNIT_SHIFT"
                    )
                for u in units:
                    toks = tokenize(u["body"])
                    cnt = Counter(toks)
                    rows.append(
                        (
                            (doc_id << UNIT_SHIFT) | u["seq"],
                            doc_id,
                            url,
                            u["seq"],
                            u["name"],
                            u["body"],
                            u["label"],
                            len(toks),
                            " ".join("%s:%d" % kv for kv in cnt.items()),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in UNITS_SCHEMA.fields])

    units = src.mapInPandas(gen, schema=UNITS_SCHEMA)
    units.write.mode("overwrite").parquet(f"{out_dir}/units")
    out = spark.read.parquet(f"{out_dir}/units")
    if expected_docs:
        _assert_unit_ids_sound(out, f"{out_dir}/units", expected_docs)
    return out


def _assert_unit_ids_sound(df: DataFrame, path: str, expected_docs: int) -> None:
    """Post-write duplicate-id check from parquet footer stats alone.

    Each task writes a strictly ascending unit_id run over a disjoint
    doc_id range, so the sorted row-group (min, max) intervals must be
    non-overlapping and every id must fall in [0, expected_docs << SHIFT).
    Unlike prepare_docs' exact tiling, gaps are legitimate here (a doc
    yields < 2^UNIT_SHIFT units, and empty docs yield none) — overlap is
    the signature of the constant-partition-id failure this guards."""
    import glob as _glob

    import pyarrow.parquet as pq

    intervals: list[tuple[int, int]] = []
    for f in sorted(_glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        if not md.num_row_groups:
            continue
        idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "unit_id"
        )
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                # stats disabled — weaker (shuffling) fallback: ids unique
                n, d = df.agg(
                    F.count("*").alias("n"),
                    F.count_distinct("unit_id").alias("d"),
                ).collect()[0]
                if int(n) != int(d):
                    raise RuntimeError(
                        "unit_id assignment drift: duplicate unit_ids "
                        "(distinct-count check)"
                    )
                return
            intervals.append((int(st.min), int(st.max)))
    intervals.sort()
    prev_hi = -1
    for lo, hi in intervals:
        if lo <= prev_hi:
            raise RuntimeError(
                f"unit_id assignment drift: row-group id run [{lo}, {hi}] "
                f"overlaps a prior run ending at {prev_hi} — duplicate ids "
                "from partition-planning mismatch between count and extract jobs"
            )
        prev_hi = hi
    if intervals and (
        intervals[0][0] < 0 or prev_hi >= (expected_docs << UNIT_SHIFT)
    ):
        raise RuntimeError(
            f"unit_id assignment drift: ids outside "
            f"[0, {expected_docs} << {UNIT_SHIFT})"
        )


def build_unit_index(units: DataFrame, out_dir: str, **kwargs) -> dict:
    """Index units instead of documents: the reference's per-theorem
    search semantic. Just an aliasing shim over build_index."""
    from theoremsearch_spark.build import build_index

    docs_like = units.select(
        F.col("unit_id").alias("doc_id"), "doc_len", "term_tfs"
    )
    return build_index(docs_like, out_dir, **kwargs)
