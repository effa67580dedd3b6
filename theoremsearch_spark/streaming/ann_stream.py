"""Streaming vector ingestion into the persisted IVF ANN index.

Structured Streaming analog of `streaming/incremental.py` for the
vector half of the engine (the reference continuously upserts new
embeddings into its pgvector store — /root/reference/ec2/rds/
upsert.py:40-52): parquet vector batches landing in an input directory
are folded into one index root via foreachBatch → `add_to_ann_index`
(frozen coarse quantizer, LSM tombstones for re-embedded ids).

Exactly-once recipe (the raw-manifest idempotency check of
incremental.py:609-616 adapted to a shared-cells layout):
  - committed streaming batch ids live in `stream_batches.json`
    (atomic tmp+rename); a replayed committed batch is skipped;
  - within `add_to_ann_index` the ivf_meta write is the COMMIT point —
    a replay after a partial crash scrubs the uncommitted generation's
    leftovers from exactly the cells the batch touches before
    re-appending (see its docstring);
  - the only unprotected window is between the meta commit and the
    batch-id record: a replay there re-adds the batch as one extra
    generation, which under upsert semantics tombstones the prior copy
    and serves identically (redundant, never wrong). With
    `upsert=False` that window can duplicate — streamed roots should
    keep upsert on.

The FIRST batch bootstraps the index when the root has no
`ivf_meta.json`: the coarse quantizer is trained on that batch's own
(bounded, deterministic) sample and frozen — the standard IVF recipe;
at 100 TB you seed the quantizer from the first representative slab
and every later batch is a pure matmul-assign append.

Single-writer per index root, like the text generation store.
"""

from __future__ import annotations

import json
import os


def _committed_batches(index_dir: str) -> set[int]:
    p = f"{index_dir}/stream_batches.json"
    if not os.path.exists(p):
        return set()
    with open(p) as fh:
        return set(json.load(fh))


def _record_batch(index_dir: str, batch_id: int) -> None:
    done = sorted(_committed_batches(index_dir) | {int(batch_id)})
    tmp = f"{index_dir}/.stream_batches.json.tmp"
    with open(tmp, "w") as fh:
        json.dump(done, fh)
    os.rename(tmp, f"{index_dir}/stream_batches.json")


def stream_ann_ingest(
    spark,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    schema,
    upsert: bool = True,
    n_centroids: int | None = None,
):
    """Build the writeStream: parquet files landing in `input_dir`
    (schema required by readStream) → one `add_to_ann_index` call per
    micro-batch at `index_dir`. Caller starts it; pair with
    `.trigger(availableNow=True)` semantics baked in below for
    drain-and-stop ingestion (the `stream_index` job pattern).

    `schema` must match the index's stored column set (vec_id,
    embedding, + metadata) — `add_to_ann_index` validates and raises
    on drift rather than appending silent-null metadata."""
    from theoremsearch_spark.functions.similarity import (
        N_CENTROIDS,
        add_to_ann_index,
        build_ann_index,
    )

    def process_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if int(batch_id) in _committed_batches(index_dir):
            return  # replay of a committed batch — idempotent skip
        if not os.path.exists(f"{index_dir}/ivf_meta.json"):
            build_ann_index(
                batch_df, index_dir, n_centroids=n_centroids or N_CENTROIDS
            )
        else:
            add_to_ann_index(batch_df, index_dir, upsert=upsert)
        _record_batch(index_dir, batch_id)

    return (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
