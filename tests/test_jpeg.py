"""Baseline JPEG codec (functions/jpegcodec.py) — round-trip, sampling
modes, restart markers, corrupt-input contract, and the Spark-side
resize integration. The encoder and decoder are independent paths
(forward DCT + flat-table Huffman write vs DHT-driven Huffman read +
inverse DCT), so a round-trip PSNR bound catches a defect in either."""

import struct

import numpy as np
import pytest

from theoremsearch_spark.functions.jpegcodec import (
    ZIGZAG,
    decode_jpeg_pixels,
    encode_jpeg_baseline,
)
from theoremsearch_spark.functions.multimodal import decode_image, parse_jpeg_dims


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / mse) if mse else 99.0


def _test_image(h: int = 37, w: int = 53) -> np.ndarray:
    """Deterministic smooth-ish RGB image with odd dims (exercises
    edge-block padding on both axes)."""
    rng = np.random.RandomState(7)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (xx * 4 + yy * 2) % 256,
            np.sin(xx / 9.0) * 90 + 128 + yy * 0.5,
            np.cos(yy / 7.0) * 90 + 128,
        ],
        axis=2,
    )
    return np.clip(img + rng.randn(h, w, 3) * 3, 0, 255).astype(np.uint8)


def test_zigzag_is_the_standard_order():
    # spot-check the generated walk against the first/last entries of
    # the T.81 figure (raster indices)
    assert list(ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(ZIGZAG[-4:]) == [47, 55, 62, 63]
    assert sorted(ZIGZAG) == list(range(64))


def test_jpeg_roundtrip_color_444():
    img = _test_image()
    enc = encode_jpeg_baseline(img, quality=92)
    px, c = decode_jpeg_pixels(enc)
    assert c == 3 and px.shape == img.shape
    assert _psnr(img, px) > 32.0
    assert parse_jpeg_dims(enc) == (img.shape[1], img.shape[0])


def test_jpeg_roundtrip_color_420():
    img = _test_image(41, 29)
    enc420 = encode_jpeg_baseline(img, quality=92, subsample=True)
    px, c = decode_jpeg_pixels(enc420)
    assert c == 3 and px.shape == img.shape
    assert _psnr(img, px) > 26.0
    # 4:2:0 carries 1/2 the chroma blocks — must be smaller than 4:4:4
    assert len(enc420) < len(encode_jpeg_baseline(img, quality=92))


def test_jpeg_roundtrip_gray():
    g = _test_image(40, 33)[:, :, 0]
    px, c = decode_jpeg_pixels(encode_jpeg_baseline(g, quality=92))
    assert c == 1 and px.shape == (40, 33, 1)
    assert _psnr(g, px[:, :, 0]) > 34.0


def test_jpeg_restart_markers_decode_identically():
    """DRI only reframes the entropy stream (DC predictor resets +
    byte-aligned RSTn); the quantized coefficients are identical, so
    the decoded pixels must be bitwise equal to the no-restart form."""
    img = _test_image(24, 40)
    a, _ = decode_jpeg_pixels(encode_jpeg_baseline(img, quality=80))
    b, _ = decode_jpeg_pixels(
        encode_jpeg_baseline(img, quality=80, restart_interval=2)
    )
    assert np.array_equal(a, b)


def test_jpeg_quality_monotonic():
    img = _test_image()
    hi = decode_jpeg_pixels(encode_jpeg_baseline(img, quality=95))[0]
    lo = decode_jpeg_pixels(encode_jpeg_baseline(img, quality=20))[0]
    assert _psnr(img, hi) > _psnr(img, lo)
    assert len(encode_jpeg_baseline(img, quality=20)) < len(
        encode_jpeg_baseline(img, quality=95)
    )


def test_jpeg_corrupt_and_unsupported_return_none():
    img = _test_image(16, 16)
    enc = encode_jpeg_baseline(img)
    assert decode_jpeg_pixels(enc[:40]) is None  # truncated in headers
    assert decode_jpeg_pixels(enc[:-30]) is None  # truncated in scan
    assert decode_jpeg_pixels(b"\x00" * 64) is None  # not a JPEG
    # progressive (SOF2) is declared unsupported, not mis-decoded
    prog = bytearray(enc)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    assert decode_jpeg_pixels(bytes(prog)) is None
    # header-only stream (no SOS)
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 8, 8)
        + b"\x01\x01\x11\x00"
    )
    assert decode_jpeg_pixels(b"\xff\xd8" + app0 + sof0 + b"\xff\xd9") is None


def test_decode_image_returns_jpeg_pixels():
    img = _test_image(19, 23)
    fmt, w, h, px, c = decode_image(encode_jpeg_baseline(img, quality=92))
    assert (fmt, w, h, c) == ("jpeg", 23, 19, 3)
    assert px is not None and px.size == 19 * 23 * 3
    assert _psnr(img, px.reshape(19, 23, 3)) > 32.0


def test_resize_jpeg_reemits_jpeg(spark):
    from theoremsearch_spark.functions.multimodal import resize_stub

    img = _test_image(64, 48)
    df = spark.createDataFrame(
        [(1, bytearray(encode_jpeg_baseline(img, quality=92)))],
        "media_id long, payload binary",
    )
    out = resize_stub(df, max_side=16).toPandas()
    raw = bytes(out.iloc[0]["payload"])
    assert raw[:3] == b"\xff\xd8\xff"  # still a JPEG, not a format swap
    w, h = parse_jpeg_dims(raw)
    assert max(w, h) <= 16 and (w, h) == (12, 16)
    px, c = decode_jpeg_pixels(raw)
    # content survives the decode→subsample→re-encode chain
    assert _psnr(img[::4, ::4], px) > 24.0
