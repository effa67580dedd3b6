"""Text-analysis operators for a large-scale training-data pipeline.

All hot-path expressions are JVM-side built-ins (split/size/transform/
aggregate — whole-stage codegen), no Python in the per-row path; these
run unchanged over 100 TB because they are pure row-local column
expressions (no shuffle at all except the explicit aggregations).

  - token counting   (whitespace tokenization; BPE-ish regex variant)
  - language ID      (stopword-hit n-gram heuristic)
  - quality scoring  (length / distinct-ratio / mean token length)
  - fingerprinting   (md5 content fingerprint; rolling-hash variant in
                      dedup.py)

Reference precedent: the extraction/normalization family of
/root/reference SURVEY §2.7 (T12 whitespace, T20 type inference from
text) — re-pointed at webtext quality signals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from theoremsearch_spark.operators.relational import t

EN_STOPWORDS = ["the", "and", "of", "to", "in", "is", "for", "on", "with", "as"]


def q_token_count(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    # BPE-ish proxy: alnum runs of length ≥1 split at 4-char boundaries
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        (F.length("text") - F.length(F.regexp_replace("text", " ", ""))+ 1).alias("n_ws_tokens"),
    )


def q_lang_id(spark, sf_dir):
    """Stopword-hit language heuristic: #distinct EN stopwords present."""
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    hits = F.size(F.array_intersect(toks, F.array(*[F.lit(s) for s in EN_STOPWORDS])))
    return d.select(
        "doc_id",
        hits.alias("en_stop_hits"),
        F.when(hits >= 2, F.lit("en")).otherwise(F.lit("unk")).alias("pred_lang"),
    )


def q_quality_score(spark, sf_dir):
    """Length + lexical-diversity quality gates (the classic webtext
    pre-training filters), as one codegen'd projection."""
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    distinct_ratio = F.round(F.size(F.array_distinct(toks)) / n, 4)
    mean_tok_len = F.round((F.length(F.regexp_replace("text", " ", ""))) / n, 4)
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        distinct_ratio.alias("distinct_ratio"),
        mean_tok_len.alias("mean_token_len"),
        (
            (n >= 20) & (n <= 10000) & (distinct_ratio >= 0.2) & (mean_tok_len <= 12)
        ).alias("passes_quality"),
    )


def q_fingerprint(spark, sf_dir):
    """Content fingerprint (md5 over normalized text) + per-fingerprint
    group size — the exact-dedup primitive."""
    d = t(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.col("text")))
    return (
        d.select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .orderBy("fingerprint")
    )


SNIPPET_TERM = "spark"
SNIPPET_RADIUS = 20


def q_text_snippet(spark, sf_dir):
    """Hit-highlighting snippet: a ±RADIUS-char window around the first
    occurrence of the matched term — the serving-display analog of the
    reference rendering theorem bodies under each hit
    (/root/reference/streamlit_app.py:294,432). Pure JVM
    locate/substring — codegen'd, no Python."""
    from theoremsearch_spark.operators.relational import t

    d = t(spark, sf_dir, "documents")
    pos = F.locate(SNIPPET_TERM, F.col("text"))
    return (
        d.withColumn("pos", pos)
        .filter(F.col("pos") > 0)
        .select(
            "doc_id",
            "pos",
            F.substring(
                F.col("text"),
                F.greatest(F.col("pos") - SNIPPET_RADIUS, F.lit(1)),
                SNIPPET_RADIUS * 2 + len(SNIPPET_TERM),
            ).alias("snippet"),
        )
        .orderBy("doc_id")
    )


def host_section_stats(docs: DataFrame, section) -> DataFrame:
    """Host-level corpus statistics — the CCNet/RefinedWeb-style
    site-quality primitive: group documents by a caller-supplied
    `section` Column (on a crawl table,
    `regexp_extract(url, '^https?://([^/]+/[^/]+)/', 1)` — host +
    first path segment) and aggregate doc count, mean length, and the
    exact-duplicate share within the section. At 100 TB this is ONE
    groupBy on a short string key; the per-section dup count rides the
    same shuffle via a two-level (section, fingerprint) pre-agg.
    Sections whose stats cross policy thresholds (spam farms, mirror
    hosts) are then droppable with a broadcast join against this tiny
    table — corpus-scale filtering for the cost of one aggregation."""
    per_fp = (
        docs.select(
            section.alias("section"), F.col("n_chars"),
            F.md5(F.col("text")).alias("fp"),
        )
        .groupBy("section", "fp")
        .agg(F.count("*").alias("copies"), F.sum("n_chars").alias("chars"))
    )
    return (
        per_fp.groupBy("section")
        .agg(
            F.sum("copies").alias("n_docs"),
            F.round(F.sum("chars") / F.sum("copies"), 4).alias("avg_chars"),
            F.sum(F.col("copies") - 1).alias("n_exact_dup_docs"),
        )
        .orderBy("section")
    )


def q_host_stats(spark, sf_dir):
    """Harness section key: the documents table carries no url, so
    source/lang plays the host/path-segment role — same aggregation
    physics, SQL-identical key rule in the oracle."""
    return host_section_stats(
        t(spark, sf_dir, "documents"),
        F.concat_ws("/", F.col("source"), F.col("lang")),
    )


QUERIES = {
    "text_token_count": q_token_count,
    "host_stats": q_host_stats,
    "text_lang_id": q_lang_id,
    "text_quality_score": q_quality_score,
    "text_fingerprint": q_fingerprint,
    "text_snippet": q_text_snippet,
}

_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in EN_STOPWORDS) + "]"

ORACLES = {
    "host_stats": """
        WITH per_fp AS (
            SELECT concat(source, '/', lang) AS section,
                   md5(text) AS fp, count(*) AS copies,
                   sum(n_chars) AS chars
            FROM documents GROUP BY 1, 2)
        SELECT section, CAST(sum(copies) AS BIGINT) AS n_docs,
               round(sum(chars) * 1.0 / sum(copies), 4) AS avg_chars,
               CAST(sum(copies - 1) AS BIGINT) AS n_exact_dup_docs
        FROM per_fp GROUP BY section ORDER BY section
    """,
    "text_token_count": """
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
               length(text) - length(replace(text, ' ', '')) + 1 AS n_ws_tokens
        FROM documents
    """,
    "text_lang_id": f"""
        SELECT doc_id,
               len(list_intersect(string_split(text, ' '), {_STOP_SQL})) AS en_stop_hits,
               CASE WHEN len(list_intersect(string_split(text, ' '), {_STOP_SQL})) >= 2
                    THEN 'en' ELSE 'unk' END AS pred_lang
        FROM documents
    """,
    "text_quality_score": """
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               round(len(list_distinct(string_split(text, ' '))) * 1.0
                     / len(string_split(text, ' ')), 4) AS distinct_ratio,
               round((length(replace(text, ' ', '')) + 0.0)
                     / len(string_split(text, ' ')), 4) AS mean_token_len,
               (len(string_split(text, ' ')) BETWEEN 20 AND 10000
                AND len(list_distinct(string_split(text, ' '))) * 1.0
                    / len(string_split(text, ' ')) >= 0.2
                AND (length(replace(text, ' ', '')) + 0.0)
                    / len(string_split(text, ' ')) <= 12) AS passes_quality
        FROM documents
    """,
    "text_fingerprint": """
        SELECT md5(lower(text)) AS fingerprint, count(*) AS n_docs,
               min(doc_id) AS keep_doc_id
        FROM documents GROUP BY 1 ORDER BY 1
    """,
    "text_snippet": f"""
        SELECT doc_id, strpos(text, '{SNIPPET_TERM}') AS pos,
               substr(text,
                      greatest(strpos(text, '{SNIPPET_TERM}') - {SNIPPET_RADIUS}, 1),
                      {SNIPPET_RADIUS * 2 + len(SNIPPET_TERM)}) AS snippet
        FROM documents WHERE strpos(text, '{SNIPPET_TERM}') > 0
        ORDER BY doc_id
    """,
}
