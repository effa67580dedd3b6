"""Unit-extraction tests: stateful numbering (T10 analog), label
capture + dedup (T11), fixpoint rewrite (T13/T17), UDTF parity, and
the units → per-unit index pipeline."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from theoremsearch_spark.units import (
    UNIT_SHIFT,
    build_unit_index,
    extract_units,
    fixpoint_sub,
    prepare_units,
    units_udf,
)

DOC = b"""<html><body>
<p id="intro">Preamble text before any heading.</p>
<h1 id="sec-a">Alpha</h1><p>body a with a thm inside</p>
<h2>Alpha One</h2><p id="lbl1">first labelled body</p>
<h2>Alpha Two</h2><p id="lbl1">duplicate label body</p>
<h1>Beta</h1><p>beta <b>bold</b> body</p>
<h2>Beta One</h2><p>deep reset check</p>
</body></html>"""


def test_numbering_with_descendant_reset():
    """h1 increments level 1 and resets level 2 — the reference's
    `within` counter semantics (theorem_forms.py:13-136)."""
    names = [u["name"] for u in extract_units(DOC)]
    assert names == [
        "preamble",
        "Alpha 1.",
        "Alpha One 1.1.",
        "Alpha Two 1.2.",
        "Beta 2.",
        "Beta One 2.1.",  # level-2 counter reset after Beta
    ]


def test_labels_captured_removed_and_deduped():
    units = extract_units(DOC)
    by_name = {u["name"]: u for u in units}
    assert by_name["preamble"]["label"] == "intro"
    assert by_name["Alpha 1."]["label"] == "sec-a"
    assert by_name["Alpha One 1.1."]["label"] == "lbl1"
    # second lbl1 is a duplicate → nulled (latex_parse.py:367-392)
    assert by_name["Alpha Two 1.2."]["label"] is None
    # the anchor text never leaks into the body
    assert "lbl1" not in by_name["Alpha One 1.1."]["body"]


def test_fixpoint_rewrite_shorthand_and_whitespace():
    assert fixpoint_sub("a  thm   and a lem") == "a theorem and a lemma"
    # fixpoint: rules re-applied until stable, capped
    assert fixpoint_sub("thms thms") == "theorem theorem"
    assert "thm" not in extract_units(DOC)[1]["body"]  # applied in units


def test_fixpoint_iteration_cap_terminates():
    import re

    # pathological self-feeding rule must terminate via the cap
    out = fixpoint_sub("x", rules=[(re.compile("x"), "xx")], max_iters=5)
    assert out == "x" * 32


SHARED_DOC = b"""<html><body>
<h1>Results</h1><p>intro</p>
<h2 data-kind="theorem" data-counter="thmc">First main result</h2><p>t1</p>
<h2 data-kind="lemma" data-counter="thmc">Helper</h2><p>l1</p>
<h2 data-kind="theorem" data-counter="thmc">Second main result</h2><p>t2</p>
<h2>Plain subsection</h2><p>s1</p>
<h1>Next</h1>
<h2 data-kind="lemma" data-counter="thmc">Fresh helper</h2><p>l2</p>
</body></html>"""


def test_shared_counter_aliasing():
    """T6: kinds declaring the same data-counter draw from ONE sequence
    (\\newaliascnt/[shared], latex_parse.py:48-78) — Theorem 1.1,
    Lemma 1.2, Theorem 1.3 interleave; a shallower heading resets the
    shared counter (within-reset); the plain level counter is
    independent of the named one."""
    names = [u["name"] for u in extract_units(SHARED_DOC)]
    assert names == [
        "Results 1.",
        "Theorem 1.1.",
        "Lemma 1.2.",       # shares thmc with theorem → 1.2, not 1.1
        "Theorem 1.3.",
        "Plain subsection 1.1.",  # level-2 counter untouched by thmc
        "Next 2.",
        "Lemma 2.1.",       # h1 increment reset the shared counter
    ]


def test_kind_keyval_overrides_title_with_shorthand():
    """T8: data-kind is the declared caption (DECLARETHEOREM name=,
    re_patterns.py:24-39), normalized through the shorthand fixpoint."""
    doc = b'<h1>S</h1><p>a</p><h2 data-kind="lem">Anything At All</h2><p>b</p>'
    units = extract_units(doc)
    assert units[1]["name"] == "Lemma 1.1."
    # skipped levels keep a 0 placeholder ("0.1." for an h2 with no h1)
    # — documented HTML-tolerant behavior, not an error
    orphan = extract_units(b'<h2 data-kind="lem">X</h2><p>b</p>')
    assert orphan[0]["name"] == "Lemma 0.1."


def test_appendix_alpha_numbering():
    """Appendix mode: level-1 numbers render A, B, C… from the
    data-appendix heading on (theorem_forms.py:96-135)."""
    doc = (
        b"<h1>Intro</h1><p>a</p><h2>Sub</h2><p>b</p>"
        b"<h1 data-appendix>Proofs</h1><p>c</p><h2>Detail</h2><p>d</p>"
        b"<h1>More proofs</h1><p>e</p>"
    )
    names = [u["name"] for u in extract_units(doc)]
    assert names == [
        "Intro 1.",
        "Sub 1.1.",
        "Proofs A.",
        "Detail A.1.",
        "More proofs B.",
    ]


def test_appendix_orphan_level_keeps_zero_placeholder():
    """In appendix mode a SKIPPED level-1 counter must still render the
    '0' placeholder — alpha-formatting 0 as 'A' would collide with the
    first real appendix section's number."""
    doc = b'<h2 data-appendix>Orphan</h2><p>a</p><h1>Proofs</h1><p>b</p>'
    names = [u["name"] for u in extract_units(doc)]
    assert names == ["Orphan 0.1.", "Proofs A."]


def test_swap_numbers_renders_number_first():
    """amsthm \\swapnumbers (theorem_forms.py:17,74-77)."""
    names = [u["name"] for u in extract_units(DOC, swap_numbers=True)]
    assert names[1] == "1. Alpha" and names[2] == "1.1. Alpha One"


def test_udtf_parity_with_pure_function(spark):
    """The Spark UDTF path returns byte-identical units to the pure
    extractor — same contract as extract_text."""
    docs = [(f"u{i}", DOC) for i in range(3)] + [("empty", b""), ("none", None)]
    df = spark.createDataFrame(docs, "url string, html binary")
    got = (
        df.select("url", F.explode(units_udf("html")).alias("u"))
        .select("url", "u.seq", "u.name", "u.body", "u.label", "u.level")
        .toPandas()
        .sort_values(["url", "seq"])
    )
    want = extract_units(DOC)
    for url in ("u0", "u1", "u2"):
        g = got[got["url"] == url].reset_index(drop=True)
        assert len(g) == len(want)
        for i, u in enumerate(want):
            assert g.loc[i, "name"] == u["name"]
            assert g.loc[i, "body"] == u["body"]
            lbl = g.loc[i, "label"]
            assert (lbl if pd.notna(lbl) else None) == u["label"]
    assert (got["url"] == "empty").sum() == 0  # no units from empty html
    assert (got["url"] == "none").sum() == 0


def test_prepare_units_multipartition_local_relation_unique_ids(spark, tmp_path):
    """The vulnerable source shape: a MULTI-partition local relation,
    where a spark_partition_id() column can be evaluated before an
    implicit exchange and silently repeat base offsets (the prepare_docs
    bug, stats.py:146-157). TaskContext-based assignment must yield
    globally unique unit_ids and dense per-doc doc_ids regardless."""
    docs = [
        (f"https://x.test/{i:04d}",
         f"<html><body><h1>D{i}</h1><p>alpha {i}</p>"
         f"<h2>S</h2><p>beta {i}</p></body></html>".encode())
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "url string, html binary").repartition(8)
    assert df.rdd.getNumPartitions() == 8
    units = prepare_units(df, str(tmp_path)).toPandas()
    # globally unique unit ids; every doc produced exactly 2 units
    assert units["unit_id"].is_unique
    assert len(units) == 120
    assert units["doc_id"].nunique() == 60
    # doc_id space dense: [0, 60)
    assert set(units["doc_id"]) == set(range(60))
    # each unit maps back to its own url: no doc got another doc's rows
    per_doc = units.groupby("doc_id")["url"].nunique()
    assert per_doc.eq(1).all()
    # the composite id invariant holds across all partitions
    uid = units["unit_id"].to_numpy()
    assert ((uid >> UNIT_SHIFT) == units["doc_id"].to_numpy()).all()


def test_prepare_units_and_unit_index(spark, tmp_path):
    """documents → units table → per-unit inverted index: the planted
    marker token retrieves exactly its unit (not the whole doc)."""
    docs = []
    for i in range(40):
        marker = f"zqmarker{i:03d}"
        html = (
            f"<html><body><h1>Doc {i}</h1><p>common filler words here</p>"
            f"<h2>Special</h2><p>{marker} unique section body</p></body></html>"
        ).encode()
        docs.append((f"https://x.test/{i:03d}", html))
    df = spark.createDataFrame(docs, "url string, html binary")
    units = prepare_units(df, str(tmp_path))
    upd = units.toPandas()
    # composite id: unit_id >> SHIFT == doc_id, low bits == seq
    uid = upd["unit_id"].to_numpy()
    assert ((uid >> UNIT_SHIFT) == upd["doc_id"].to_numpy()).all()
    assert ((uid & ((1 << UNIT_SHIFT) - 1)) == upd["seq"].to_numpy()).all()
    assert upd.groupby("doc_id")["seq"].count().eq(2).all()  # Doc + Special

    build_unit_index(units, str(tmp_path / "uindex"), salt_threshold=100,
                     n_segments=2, n_buckets=4, resume=False)
    from theoremsearch_spark.query import topk

    qs = pd.DataFrame(
        {"query_id": [0, 1], "query_text": ["zqmarker007 unique", "zqmarker033 unique"]}
    )
    hits = topk(spark, str(tmp_path / "uindex"), qs, k=3).toPandas()
    top1 = hits[hits["rank"] == 1].set_index("query_id")["doc_id"]
    want0 = upd.loc[upd["body"].str.contains("zqmarker007"), "unit_id"].iloc[0]
    want1 = upd.loc[upd["body"].str.contains("zqmarker033"), "unit_id"].iloc[0]
    assert top1[0] == want0 and top1[1] == want1
