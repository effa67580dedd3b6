"""spark-submit entry: streaming vector ingestion into a persisted IVF
ANN index.

Usage:
  spark-submit --py-files theoremsearch_spark.zip jobs/stream_ann.py \
      --input <landing dir of vector parquet files (glob ok)> \
      --index <index root> --checkpoint <stream checkpoint dir> \
      [--centroids 64] [--no-upsert] [--synth-batch N]

Each micro-batch (availableNow trigger — drain pending files, then
stop; rerun as new files land, the checkpoint carries over) is folded
into the index by `add_to_ann_index`: matmul-assigned against the
frozen coarse quantizer, appended as one generation, with re-embedded
vec_ids tombstoned through the vb= key index (the reference's
continuous embedding upsert, /root/reference/ec2/rds/upsert.py:40-52).
The FIRST batch bootstraps the index (trains + freezes the quantizer)
when the root has no ivf_meta.json. Replayed batches are skipped via
stream_batches.json; see streaming/ann_stream.py for the exactly-once
contract. Serve with jobs/ann_index.py search; reclaim tombstoned
bytes with jobs/ann_index.py compact.

`--synth-batch N` (testing) writes one N-vector deterministic batch
into the landing dir first, so the job is drivable end-to-end with no
external data; rerunning with a smaller N re-ingests a vec_id prefix
and demonstrates upsert tombstones.

Prints one JSON line, e.g.:
  {"job": "stream_ann", "generations": 2, "n_vectors": 5000,
   "tombstones": 1000, "wall_sec": 9.1}
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="landing directory (glob ok)")
    p.add_argument("--index", required=True, help="index root")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--centroids", type=int, default=None)
    p.add_argument(
        "--quantize", choices=["sq8"], default=None,
        help="bootstrap the index with SQ8 packed-binary vector "
        "storage (later batches follow the committed meta)",
    )
    p.add_argument(
        "--no-upsert", action="store_true",
        help="skip prior-version tombstoning (caller guarantees fresh "
        "ids; weakens the crash-replay contract — see ann_stream.py)",
    )
    p.add_argument(
        "--synth-batch", type=int, default=None,
        help="write one N-vector synthetic batch into the landing dir first",
    )
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("ts-stream-ann").getOrCreate()
    from theoremsearch_spark.streaming.ann_stream import stream_ann_ingest

    t0 = time.monotonic()
    # same landing-dir/glob rules as stream_index (only * and ? mark a
    # glob; bracket literals are escaped before the /* suffix)
    is_glob = any(ch in args.input for ch in "*?")
    stream_path = (
        args.input
        if is_glob
        else re.sub(r"([\[\]{}])", r"\\\1", args.input.rstrip("/")) + "/*"
    )

    if args.synth_batch:
        from theoremsearch_spark.corpus import generate_vectors

        if is_glob:
            # a glob like 'dir/batch*' would never match the
            # synth_batch_N dir we write — the batch would silently
            # never be ingested
            p.error("--synth-batch requires a plain directory --input, not a glob")
        land = args.input.rstrip("/")
        batch_no = 0
        while os.path.exists(f"{land}/synth_batch_{batch_no}"):
            batch_no += 1
        generate_vectors(spark, args.synth_batch).repartition(2).write.parquet(
            f"{land}/synth_batch_{batch_no}"
        )

    # schema from the landed files themselves (batch-infer once): the
    # stream needs explicit types, and the index validates column
    # parity on every add anyway
    try:
        schema = spark.read.parquet(stream_path).schema
    except Exception as exc:
        p.error(
            f"no readable parquet under --input {args.input!r} to infer "
            f"the stream schema from (land a batch first, or use "
            f"--synth-batch): {exc.__class__.__name__}"
        )

    stream = stream_ann_ingest(
        spark,
        stream_path,
        args.index,
        args.checkpoint,
        schema=schema,
        upsert=not args.no_upsert,
        n_centroids=args.centroids,
        quantize=args.quantize,
    )
    stream.start().awaitTermination()

    from theoremsearch_spark.functions.similarity import _read_ivf_meta

    meta = _read_ivf_meta(args.index)
    tomb_dir = f"{args.index}/tombstones"
    n_tomb = (
        spark.read.parquet(tomb_dir).dropDuplicates(["vec_id"]).count()
        if os.path.isdir(tomb_dir)
        else 0
    )
    print(
        json.dumps(
            {
                "job": "stream_ann",
                "generations": int(meta["generations"]),
                "n_vectors": int(meta["n_vectors"]),
                "tombstones": n_tomb,
                "wall_sec": round(time.monotonic() - t0, 2),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
