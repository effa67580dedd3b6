"""Byte-identity contract tests for extraction + tokenization.

Adversarial fixtures mirror the reference's edge cases: encoding
fallback (/root/reference/ec2/parse_arxiv_papers/main_tex.py:20-28),
NULs (plastex_method/parse.py:128-133), truncated markup
(latex_clean.py:11-28), comments (latex_parse.py:399-400).
"""

import pandas as pd

from theoremsearch_spark.extract import decode_bytes, extract_text, tokenize


def test_plain():
    assert extract_text(b"<html><body><p>hello world</p></body></html>") == "hello world"


def test_comment_stripped():
    assert extract_text(b"<p>a</p><!-- secret -->\n<p>b</p>") == "a b"


def test_script_style_dropped():
    html = b"<style>p{color:red}</style><p>x</p><script>var y=1;</script>"
    assert extract_text(html) == "x"


def test_entities():
    assert extract_text(b"<p>a &lt;b&gt; &amp; c &amp;lt; &nbsp;d</p>") == 'a <b> & c &lt; d'


def test_numeric_and_named_entity_tail():
    """Full HTML5 reference decode: decimal, hex, and the long named
    tail; &amp;-protected sequences stay single-pass; &nbsp; collapses
    with surrounding whitespace."""
    raw = b"<p>it&#8217;s &#x2019; &rsquo; 5&nbsp;&gt;&nbsp;3 &mdash; &Omega; &amp;#39;</p>"
    assert extract_text(raw) == "it’s ’ ’ 5 > 3 — Ω &#39;"


def test_nul_stripped():
    assert extract_text(b"<p>a\x00b</p>") == "ab"


def test_encoding_fallback_latin1():
    raw = "<p>r\xe9sum\xe9</p>".encode("latin-1")
    assert extract_text(raw) == "r\xe9sum\xe9"
    assert decode_bytes(raw) == "<p>r\xe9sum\xe9</p>"


def test_utf8_preferred():
    raw = "<p>r\xe9sum\xe9</p>".encode("utf-8")
    assert extract_text(raw) == "r\xe9sum\xe9"


def test_truncated_tag_survives():
    # unterminated trailing tag: leftover text is kept, no crash
    out = extract_text(b'<p>ok</p><p class="trunc')
    assert out.startswith("ok")


def test_whitespace_normalized():
    assert extract_text(b"<p>a\n\t  b\r\nc</p>") == "a b c"


def test_none_and_empty():
    assert extract_text(None) == ""
    assert extract_text(b"") == ""


def test_tokenize():
    assert tokenize("Hello, World! x2") == ["hello", "world", "x2"]
    assert tokenize("") == []
    assert tokenize(None) == []


def test_udf_byte_identity(spark, corpus_df):
    """The Arrow/pandas-UDF path must equal the pure function per url —
    the BASELINE.json per-row invariant, and equal the corpus ground
    truth `text` column."""
    from pyspark.sql import functions as F

    from theoremsearch_spark.extract import extract_text_udf

    out = corpus_df.select(
        "url", "text", extract_text_udf(F.col("html")).alias("got"), "html"
    ).toPandas()
    mismatch = out[out["text"] != out["got"]]
    assert mismatch.empty, mismatch.head()
    # and independently vs the pure function on the driver
    pure = out["html"].map(extract_text)
    assert (pure == out["got"]).all()


def test_corpus_edge_cases_present(corpus_pdf):
    """Generator actually produces latin-1 and NUL rows (else the
    fallback paths are dead code in every test)."""
    n_latin = sum(1 for h in corpus_pdf["html"] if b"\xe9" in h)
    n_nul = sum(1 for h in corpus_pdf["html"] if b"\x00" in h)
    assert n_latin > 20
    assert n_nul > 5
