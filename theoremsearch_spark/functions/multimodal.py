"""Multimodal columns: image/audio/video as opaque `binary` + typed
metadata, processed with Arrow-batched mapInPandas.

The Spark-side plumbing (schemas, batch iteration, partition sizing,
UDF signatures) is real and tested; the codec step itself is stubbed —
this container has no image/audio libraries — behind
`_decode_image_stub`, a deterministic fake that parses our synthetic
"image" header. Swapping in PIL/libav is a one-function change.

Design points for 100 TB of media:
  - binary payloads never leave the JVM until the mapInPandas boundary,
    and cross it in Arrow chunks — set
    `spark.sql.execution.arrow.maxRecordsPerBatch` DOWN for big blobs
    (here metadata-only rows come back, so memory stays bounded);
  - feature extraction emits fixed-width vectors (array<float>) +
    scalar metadata — columnar, join-able with the text-side tables;
  - frame sampling happens inside the UDF (one pass over the blob), so
    a video row costs one read regardless of frames sampled.

Reference analog: the ranged-GET + archive-sniff fetch pipeline
(/root/reference/ec2/parse_arxiv_papers/download_and_extract_paper.py:13-95)
— content sniffing on magic bytes, then per-format handling.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("sha1", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"RIFF": "riff",
    b"SYN0": "synthetic",  # our deterministic test format
}


def sniff_format(raw: bytes) -> str | None:
    """Magic-byte content sniffing — same pattern as the reference's
    zip/tar/gzip sniff (download_and_extract_paper.py:48-95)."""
    for magic, name in MAGIC.items():
        if raw[: len(magic)] == magic:
            return name
    return None


def make_synthetic_image(media_id: int, width: int, height: int) -> bytes:
    """Deterministic fake image: b'SYN0' + w + h + seeded pixel bytes."""
    rng = np.random.default_rng(media_id)
    pixels = rng.integers(0, 256, width * height, dtype=np.uint8).tobytes()
    return b"SYN0" + struct.pack("<II", width, height) + pixels


def make_oracle_image(media_id: int, width: int, height: int) -> bytes:
    """Deterministic, SQL-reconstructible fake image: b'SYN0' + w + h +
    pixel bytes (media_id + i) % 256. Unlike make_synthetic_image (rng
    pixels), this pattern can be rebuilt byte-for-byte inside DuckDB
    (to_hex/list_transform), so the driver-gate oracle hashes the exact
    payload the Spark UDF pipeline processed."""
    px = ((np.arange(width * height) + media_id) % 256).astype(np.uint8)
    return b"SYN0" + struct.pack("<II", width, height) + px.tobytes()


def _decode_image_stub(raw: bytes) -> tuple[int, int, np.ndarray] | None:
    """STUB: real deployments replace this one function with
    PIL.Image.open / cv2.imdecode. Decodes only the synthetic format;
    real formats raise NotImplementedError (clearly marked contract)."""
    fmt = sniff_format(raw)
    if fmt == "synthetic":
        w, h = struct.unpack("<II", raw[4:12])
        px = np.frombuffer(raw[12 : 12 + w * h], dtype=np.uint8)
        return w, h, px
    if fmt in ("png", "jpeg", "riff"):
        raise NotImplementedError(
            "real image decoding requires PIL/cv2 — not available in this container"
        )
    return None


def _feature8(px: np.ndarray) -> np.ndarray:
    """8-bin intensity histogram, L1-normalized — the stand-in for an
    embedding model's output (shape/type contract is what matters)."""
    hist, _ = np.histogram(px, bins=8, range=(0, 256))
    s = hist.sum() or 1
    return (hist / s).astype(np.float32)


def extract_image_features(media: DataFrame) -> DataFrame:
    """media(media_id, payload binary) → typed metadata + feature vector.

    One mapInPandas pass; payload bytes are dropped on output so the
    post-UDF plan carries only small columns.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(raw)
                decoded = _decode_image_stub(raw)
                sha = hashlib.sha1(raw).hexdigest()
                if decoded is None:
                    rows.append((int(mid), sniff_format(raw), None, None, len(raw), sha, None))
                else:
                    w, h, px = decoded
                    rows.append(
                        (int(mid), "synthetic", w, h, len(raw), sha, _feature8(px).tolist())
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "format", "width", "height", "n_bytes", "sha1", "feature"],
            )

    return media.mapInPandas(run, schema=IMAGE_META_SCHEMA)


def resize_stub(media: DataFrame, max_side: int) -> DataFrame:
    """Resize contract: payload → payload (binary→binary mapInPandas).
    For the synthetic format this is a real decimation; real codecs slot
    into the same signature."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(raw)
                d = _decode_image_stub(raw)
                if d is None:
                    out.append((int(mid), raw))
                    continue
                w, h, px = d
                step = max(1, max(w, h) // max_side)
                img = px[: w * h].reshape(h, w)[::step, ::step]
                out.append(
                    (int(mid), b"SYN0" + struct.pack("<II", img.shape[1], img.shape[0]) + img.tobytes())
                )
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return media.mapInPandas(
        run,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("payload", T.BinaryType(), False),
            ]
        ),
    )


def frame_sample_stub(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Video frame-sampling contract: one binary blob in → many frame
    rows out (1:N via mapInPandas). Synthetic "video" = concatenated
    synthetic images of equal size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(raw)
                if raw[:4] != b"SYN0":
                    continue
                w, h = struct.unpack("<II", raw[4:12])
                frame_sz = 12 + w * h
                n = len(raw) // frame_sz
                for i in range(0, n, every_n):
                    rows.append((int(mid), i, raw[i * frame_sz : (i + 1) * frame_sz]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_no", "frame"])

    return media.mapInPandas(
        run,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("frame_no", T.IntegerType(), False),
                T.StructField("frame", T.BinaryType(), False),
            ]
        ),
    )
