"""Structured Streaming extensions.

The reference has no streams — its "incremental" model is anti-join +
keyset pagination + upsert between batch stages (SURVEY §2.9,
/root/reference/ec2/rds/paginate.py:21-67). Here that model gets a
true streaming analog:

  - `incremental_index`: readStream over a documents directory →
    foreachBatch → the SAME batch build pipeline appends new postings
    as a fresh segment generation per micro-batch, with manifest rows —
    the streaming equivalent of the reference's per-batch
    DELETE+upsert commit (/root/reference/ec2/parse_arxiv_papers/
    __main__.py:262-285). Readers merge generations at query time the
    same way salted segments merge.
  - `windowed_event_counts`: watermarked tumbling-window aggregation —
    the standard late-data-tolerant streaming rollup over the `events`
    shape (event_id, ts, user_id, event_type, value).

Scale notes: foreachBatch reuses the exact batch operators, so the
micro-batch path inherits the same shuffle/skew handling; the window
agg keeps state bounded by the watermark (10 min here), which is what
makes it viable on an unbounded 100 TB/day stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from theoremsearch_spark.corpus import DOCUMENTS_SCHEMA


def _generations(spark: SparkSession, out_dir: str) -> list[dict]:
    """Gens manifest = one JSON file per committed generation — atomic
    single-file writes, so concurrent executors/micro-batches never race
    on a shared parquet committer dir."""
    import glob
    import json

    out = []
    for f in sorted(glob.glob(f"{out_dir}/gens/gen_*.json")):
        with open(f) as fh:
            out.append(json.load(fh))
    return out


def commit_generation(out_dir: str, gen: int, base: int, n_docs: int) -> None:
    import json
    import os

    os.makedirs(f"{out_dir}/gens", exist_ok=True)
    tmp = f"{out_dir}/gens/.gen_{gen}.json.tmp"
    with open(tmp, "w") as fh:
        json.dump({"gen": int(gen), "base": int(base), "n_docs": int(n_docs)}, fh)
    os.rename(tmp, f"{out_dir}/gens/gen_{gen}.json")


def incremental_index(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    **build_kwargs,
):
    """Stream documents (parquet files landing in input_dir) into an
    ever-growing index at out_dir. Each micro-batch becomes one
    generation: out_dir/gen_<id>/{docs,index} — append-only, atomic per
    batch, replayable from the streaming checkpoint. doc_ids are offset
    by the running corpus size (gens manifest), so generations share one
    id space and merge at query time like salted segments do."""
    from theoremsearch_spark.build import build_index
    from theoremsearch_spark.stats import prepare_docs

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        gens = _generations(spark, out_dir)
        if any(g["gen"] == batch_id for g in gens):
            return  # replay of a committed batch — idempotent skip
        base = sum(g["n_docs"] for g in gens)
        gen_dir = f"{out_dir}/gen_{batch_id}"
        docs = prepare_docs(batch_df, gen_dir)
        if base:
            docs = docs.withColumn("doc_id", F.col("doc_id") + F.lit(base))
            docs.write.mode("overwrite").parquet(f"{gen_dir}/docs_offset")
            docs = spark.read.parquet(f"{gen_dir}/docs_offset")
        n = docs.count()
        build_index(docs, f"{gen_dir}/index", resume=False, **build_kwargs)
        commit_generation(out_dir, batch_id, base, n)

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .parquet(input_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    return stream


def topk_all_generations(spark: SparkSession, out_dir: str, queries, k: int = 10):
    """Query across every committed generation with globally merged
    statistics (N, avgdl, df) — scores are identical to a from-scratch
    batch build over the union corpus."""
    import pandas as pd

    from theoremsearch_spark.extract import tokenize
    from theoremsearch_spark.query import topk_frames

    gens = sorted(_generations(spark, out_dir), key=lambda g: g["gen"])
    if not gens:
        raise ValueError(f"no committed generations under {out_dir}")
    metas = [
        spark.read.parquet(f"{out_dir}/gen_{g['gen']}/index/doc_stats").collect()[0]
        for g in gens
    ]
    n_docs = sum(m["n_docs"] for m in metas)
    avgdl = sum(m["avgdl"] * m["n_docs"] for m in metas) / n_docs
    k1, b = float(metas[0]["k1"]), float(metas[0]["b"])

    # segment-sharded serving across generations: saltedness is a
    # PER-GENERATION property (each generation salted at its own df
    # threshold), so the routing flag rides on the blocks, not on the
    # merged df. Sharding requires every generation to agree on the
    # segment modulus (doc_id % S); mixed moduli fall back to the
    # single-task path — correct, just unsharded.
    seg_moduli = {int(m["n_segments"]) for m in metas if "n_segments" in m.__fields__}
    n_segments = seg_moduli.pop() if len(seg_moduli) == 1 else 1

    all_terms = sorted({t for q in queries["query_text"] for t in tokenize(q)})
    tstats = None
    blocks = None
    for g, m in zip(gens, metas):
        idx = f"{out_dir}/gen_{g['gen']}/index"
        thresh = (
            int(m["salt_threshold"]) if "salt_threshold" in m.__fields__ else 2**62
        )
        ts = (
            spark.read.parquet(f"{idx}/term_stats")
            .filter(F.col("term").isin(all_terms))
            .withColumn("any_salted", F.col("df") > F.lit(thresh))
        )
        # block max_tf_norm was computed with the GENERATION's avgdl;
        # tf_norm is monotonically increasing in avgdl, bounded by the
        # denominator ratio ≤ avgdl_merged/avgdl_gen — scale the upper
        # bound so block pruning stays sound under the merged statistics
        scale = max(1.0, avgdl / float(m["avgdl"]))
        bl = (
            spark.read.parquet(f"{idx}/postings")
            .withColumn(
                "max_tf_norm", (F.col("max_tf_norm") * F.lit(scale)).cast("float")
            )
            .join(
                F.broadcast(
                    ts.select("term_id", F.col("any_salted").alias("is_salted"))
                ),
                "term_id",
            )
        )
        tstats = ts if tstats is None else tstats.unionByName(ts)
        blocks = bl if blocks is None else blocks.unionByName(bl)
    merged = (
        tstats.groupBy("term", "term_id")
        .agg(F.sum("df").alias("df"), F.max("any_salted").alias("any_salted"))
        .toPandas()
    )
    return topk_frames(
        spark, blocks, merged, queries, n_docs=int(n_docs), avgdl=float(avgdl),
        k1=k1, b=b, k=k, n_segments=n_segments,
    )


def windowed_event_counts(events_stream: DataFrame) -> DataFrame:
    """Watermarked 1-minute tumbling windows per event_type: count +
    sum(value). Late rows beyond 10 minutes are dropped (bounded state)."""
    return (
        events_stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute").alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize_events(events_stream: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session windows per user: a session closes after `gap_minutes` of
    inactivity (F.session_window — stateful, watermark-bounded)."""
    return (
        events_stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", f"{gap_minutes} minutes").alias("sess"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


RUNNING_TOTALS_SCHEMA = (
    "user_id long, n_events long, sum_value double, batches_seen int"
)
_RUNNING_STATE_SCHEMA = "n long, s double, b int"


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    RUNNING totals emitted after every micro-batch — the shape built-in
    aggregations can't express in update-per-batch form with arbitrary
    per-key state (here: count, sum, and how many batches touched the
    key). State lives in the state store, checkpointed with the query;
    at 100 TB/day the state is one tiny tuple per user, not per event.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, s, b = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        b += 1
        state.update((n, s, b))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [s],
                "batches_seen": [b],
            }
        )

    return events_stream.groupBy("user_id").applyInPandasWithState(
        update,
        RUNNING_TOTALS_SCHEMA,
        _RUNNING_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
