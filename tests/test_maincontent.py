"""Main-content selection (S7 analog) tests: the content block beats
nav/footer boilerplate and link farms; parity between pure function and
the Arrow UDF."""

from theoremsearch_spark.functions.maincontent import (
    score_block,
    select_main_content,
)

PAGE = (
    "<html><body>"
    "<nav><a href='/'>home</a> <a href='/x'>products</a> <a href='/y'>about us</a></nav>"
    "<div>This is the real article body with a substantial amount of "
    "meaningful prose that goes on for a while and says things.</div>"
    "<div><a href='1'>link</a> <a href='2'>link</a> <a href='3'>link</a> "
    "<a href='4'>link</a> <a href='5'>link</a></div>"
    "<footer>copyright 2026 example corp all rights reserved terms privacy"
    " cookies contact imprint sitemap newsletter subscribe follow us"
    "</footer></body></html>"
).encode()


def test_picks_article_over_boilerplate():
    out = select_main_content(PAGE)
    assert out.startswith("This is the real article body")
    assert "copyright" not in out and "home" not in out


def test_link_density_penalized():
    linky = "<a href='1'>aaaa</a> <a href='2'>bbbb</a>"
    prose = "plain readable sentence of about the same length!"
    assert score_block(prose, "div") > score_block(linky, "div")


def test_structural_penalty():
    same = "identical text content here"
    assert score_block(same, "div") > score_block(same, "footer")


def test_fallback_whole_page_and_empty():
    assert select_main_content(b"no tags at all, just text") == "no tags at all, just text"
    assert select_main_content(None) == ""
    assert select_main_content(b"") == ""


def test_udf_parity(spark):
    from theoremsearch_spark.functions.maincontent import select_main_content_udf

    df = spark.createDataFrame([("a", PAGE), ("b", None)], "id string, html binary")
    got = dict(df.select("id", select_main_content_udf("html").alias("t")).collect())
    assert got["a"] == select_main_content(PAGE)
    assert got["b"] == ""
