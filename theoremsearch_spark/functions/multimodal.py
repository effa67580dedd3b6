"""Multimodal columns: image/audio/video as opaque `binary` + typed
metadata, processed with Arrow-batched mapInPandas.

The Spark-side plumbing (schemas, batch iteration, partition sizing,
UDF signatures) is real and tested. The codec layer is stdlib-real for
the common web cases: PNG IHDR metadata for every variant + FULL pixel
decode/encode for 8-bit grayscale PNG (zlib + scanline unfilter), JPEG
dimensions from the SOFn header, RIFF container sniff — no PIL/cv2 in
this container. What still needs an external codec (JPEG pixels,
color/interlaced PNG pixels) is metadata-only in the feature path and
raises in the resize path; swapping in PIL/libav is a one-function
change in `decode_image`.

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


# ---------------------------------------------------------------------------
# Real-format decoding — stdlib only (struct + zlib), no PIL/cv2.
#
# PNG: IHDR metadata for every variant; FULL pixel decode (zlib inflate
# + scanline unfilter, filter types 0-4) for 8-bit grayscale
# non-interlaced — plus a matching encoder, so resize is end-to-end real
# for that variant. JPEG: dimensions from the SOFn frame header. RIFF:
# container sniff only. Reference analog: magic-byte format dispatch
# (/root/reference/ec2/parse_arxiv_papers/download_and_extract_paper.py:48-95).
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def parse_png_header(raw: bytes) -> dict | None:
    """PNG signature + IHDR → {width, height, bit_depth, color_type,
    interlace}, or None for a corrupt/truncated file (never raises — on
    a 100 TB crawl one bad row must not kill the job; the row surfaces
    as format='png' with null dims, the reference's drop-and-continue
    failure policy)."""
    if len(raw) < 29 or raw[:8] != PNG_SIG:
        return None
    length, ctype = struct.unpack(">I4s", raw[8:16])
    if ctype != b"IHDR" or length != 13:
        return None
    w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", raw[16:29]
    )
    if not w or not h:
        return None
    return {
        "width": int(w),
        "height": int(h),
        "bit_depth": int(bit_depth),
        "color_type": int(color_type),
        "interlace": int(interlace),
    }


def _png_chunks(raw: bytes, want: bytes) -> bytes:
    """Concatenated payloads of all `want` chunks (tolerant scan)."""
    pos, out = 8, []
    while pos + 8 <= len(raw):
        ln, ct = struct.unpack(">I4s", raw[pos : pos + 8])
        if ct == want:
            out.append(raw[pos + 8 : pos + 8 + ln])
        if ct == b"IEND":
            break
        pos += 12 + ln  # length + type + data + crc
    return b"".join(out)


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG filter 4), RFC 2083 §6.6."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png_gray8(raw: bytes) -> np.ndarray | None:
    """Full pixel decode for 8-bit grayscale non-interlaced PNG →
    flat uint8 array, or None when the file is another PNG variant or
    corrupt. Filters: none/up/sub are vectorized (sub is a cumsum mod
    256); average/paeth unfilter per pixel — they carry a left-neighbor
    data dependency, and rows are short relative to Arrow batch cost."""
    import zlib

    hdr = parse_png_header(raw)
    if not hdr or hdr["bit_depth"] != 8 or hdr["color_type"] != 0 or hdr["interlace"]:
        return None
    w, h = hdr["width"], hdr["height"]
    try:
        data = zlib.decompress(_png_chunks(raw, b"IDAT"))
    except zlib.error:
        return None
    if len(data) != h * (w + 1):
        return None
    rows = np.frombuffer(data, dtype=np.uint8).reshape(h, w + 1)
    ftypes, lines = rows[:, 0], rows[:, 1:].astype(np.int64)
    out = np.zeros((h, w), dtype=np.int64)
    prev = np.zeros(w, dtype=np.int64)
    for y in range(h):
        f, cur = int(ftypes[y]), lines[y]
        if f == 0:
            rec = cur
        elif f == 1:  # sub: rec[x] = cur[x] + rec[x-1]  ⇒ cumsum mod 256
            rec = np.cumsum(cur) % 256
        elif f == 2:  # up
            rec = (cur + prev) % 256
        elif f == 3:  # average
            rec = cur.copy()
            rec[0] = (rec[0] + prev[0] // 2) % 256
            for x in range(1, w):
                rec[x] = (rec[x] + (rec[x - 1] + prev[x]) // 2) % 256
        elif f == 4:  # paeth
            rec = cur.copy()
            rec[0] = (rec[0] + _paeth(0, int(prev[0]), 0)) % 256
            for x in range(1, w):
                rec[x] = (rec[x] + _paeth(int(rec[x - 1]), int(prev[x]), int(prev[x - 1]))) % 256
        else:
            return None
        out[y] = rec
        prev = out[y]
    return out.astype(np.uint8).ravel()


def encode_png_gray8(img: np.ndarray) -> bytes:
    """(h, w) uint8 array → valid 8-bit grayscale PNG (filter 0 rows,
    one zlib IDAT). The write half of the gray8 path — resize_stub uses
    it to re-emit real PNGs."""
    import zlib

    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    scan = np.concatenate([np.zeros((h, 1), np.uint8), img], axis=1).tobytes()
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )


_JPEG_SOF = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)


def parse_jpeg_dims(raw: bytes) -> tuple[int, int] | None:
    """(width, height) from the first SOFn frame header (ITU T.81 marker
    scan); None on corrupt/truncated streams — never raises."""
    if raw[:3] != b"\xff\xd8\xff":
        return None
    pos = 2
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            return None
        marker = raw[pos + 1]
        if marker == 0xFF:  # fill byte padding before a marker
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # standalone
            pos += 2
            continue
        if marker in (0xDA, 0xD9):  # SOS/EOI before any SOF: no dims
            return None
        seglen = struct.unpack(">H", raw[pos + 2 : pos + 4])[0]
        if marker in _JPEG_SOF:
            if pos + 9 > len(raw):
                return None
            h, w = struct.unpack(">HH", raw[pos + 5 : pos + 9])
            return int(w), int(h)
        pos += 2 + seglen
    return None


def decode_image(raw: bytes) -> tuple[str | None, int | None, int | None, np.ndarray | None]:
    """(format, width, height, pixels|None). Pixels come back for the
    synthetic format and real 8-bit grayscale PNGs; other real variants
    (color/interlaced PNG, JPEG, RIFF) return metadata only — their
    pixel decode is the one remaining external-codec dependency."""
    fmt = sniff_format(raw)
    if fmt == "synthetic":
        w, h = struct.unpack("<II", raw[4:12])
        return fmt, int(w), int(h), np.frombuffer(raw[12 : 12 + w * h], dtype=np.uint8)
    if fmt == "png":
        hdr = parse_png_header(raw)
        if hdr is None:
            return fmt, None, None, None
        return fmt, hdr["width"], hdr["height"], decode_png_gray8(raw)
    if fmt == "jpeg":
        dims = parse_jpeg_dims(raw)
        return (fmt, dims[0], dims[1], None) if dims else (fmt, None, None, None)
    if fmt == "riff":
        return fmt, None, None, None
    return None, None, None, None


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
                fmt, w, h, px = decode_image(raw)
                sha = hashlib.sha1(raw).hexdigest()
                rows.append(
                    (
                        int(mid), fmt, w, h, len(raw), sha,
                        _feature8(px).tolist() if px is not None else None,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "format", "width", "height", "n_bytes", "sha1", "feature"],
            )

    return media.mapInPandas(run, schema=IMAGE_META_SCHEMA)


def resize_stub(media: DataFrame, max_side: int) -> DataFrame:
    """Resize: payload → payload (binary→binary mapInPandas). Real
    end-to-end for the synthetic format AND 8-bit grayscale PNG
    (stdlib decode → decimate → stdlib re-encode); formats we cannot
    re-encode without an external codec (JPEG, color/interlaced PNG,
    RIFF) raise NotImplementedError — a silent pass-through would be a
    resize that quietly did nothing. Unknown blobs pass through."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(raw)
                fmt, w, h, px = decode_image(raw)
                if fmt is None:
                    out.append((int(mid), raw))
                    continue
                if px is None:
                    raise NotImplementedError(
                        f"resize of {fmt} (non-gray8) requires an external "
                        "codec (PIL/cv2) — not available in this container"
                    )
                step = max(1, max(w, h) // max_side)
                img = px[: w * h].reshape(h, w)[::step, ::step]
                if fmt == "png":
                    out.append((int(mid), encode_png_gray8(img)))
                else:
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
