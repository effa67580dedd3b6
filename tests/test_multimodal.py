"""Multimodal plumbing tests: schema/batch/UDF contracts are real even
though the codec is a deterministic stub."""

import struct

import numpy as np
import pytest

from theoremsearch_spark.functions.multimodal import (
    extract_image_features,
    frame_sample_stub,
    make_synthetic_image,
    resize_stub,
    sniff_format,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [(i, make_synthetic_image(i, 64 + i, 32 + i)) for i in range(20)]
    rows.append((100, b"\x89PNG\r\n unsupported"))
    rows.append((101, b"\x00\x00garbage"))
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_sniff():
    assert sniff_format(b"\x89PNG1234") == "png"
    assert sniff_format(b"\xff\xd8\xffrest") == "jpeg"
    assert sniff_format(make_synthetic_image(1, 4, 4)) == "synthetic"
    assert sniff_format(b"????") is None


def test_extract_features(spark, media_df):
    out = extract_image_features(media_df.filter("media_id < 100")).toPandas()
    assert len(out) == 20
    row = out[out["media_id"] == 3].iloc[0]
    assert (row["width"], row["height"]) == (67, 35)
    f = np.array(row["feature"])
    assert f.shape == (8,) and abs(f.sum() - 1.0) < 1e-5
    # deterministic: same media_id → same sha1 across runs
    again = extract_image_features(media_df.filter("media_id = 3")).toPandas()
    assert again.iloc[0]["sha1"] == row["sha1"]


def test_corrupt_png_yields_null_dims_not_crash(spark, media_df):
    """A truncated/corrupt PNG must surface as format='png' with null
    dims — one bad row on a 100 TB crawl must not kill the job."""
    out = extract_image_features(media_df.filter("media_id = 100")).toPandas()
    row = out.iloc[0]
    assert row["format"] == "png"
    assert row["width"] is None or np.isnan(row["width"])
    assert row["feature"] is None


def test_resize_without_codec_raises(spark):
    """Formats we can't re-encode (JPEG) must raise in resize — a
    silent pass-through would be a resize that quietly did nothing."""
    jpeg = _tiny_jpeg(640, 480)
    df = spark.createDataFrame([(1, jpeg)], "media_id long, payload binary")
    with pytest.raises(Exception, match="NotImplementedError|external *codec"):
        resize_stub(df, max_side=16).collect()


def _png_with_filters(img: np.ndarray) -> bytes:
    """Encode a gray8 PNG exercising ALL five scanline filter types
    (row y uses filter y % 5) — the forward transforms here are the
    RFC 2083 definitions, independent of the module's unfilter code."""
    import struct as st
    import zlib

    from theoremsearch_spark.functions.multimodal import PNG_SIG, _paeth

    h, w = img.shape
    raw = img.astype(np.int64)
    scan = bytearray()
    prev = np.zeros(w, dtype=np.int64)
    for y in range(h):
        cur, f = raw[y], y % 5
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - np.concatenate(([0], cur[:-1]))
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            left = np.concatenate(([0], cur[:-1]))
            filt = cur - (left + prev) // 2
        else:
            filt = cur.copy()
            for x in range(w):
                a = int(cur[x - 1]) if x else 0
                c = int(prev[x - 1]) if x else 0
                filt[x] = cur[x] - _paeth(a, int(prev[x]), c)
        scan.append(f)
        scan.extend((filt % 256).astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype, payload):
        return (
            st.pack(">I", len(payload)) + ctype + payload
            + st.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = st.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan))) + chunk(b"IEND", b"")
    )


def _tiny_jpeg(w: int, h: int) -> bytes:
    """Minimal marker stream: SOI + APP0 + SOF0 carrying the dims."""
    import struct as st

    # APP0 payload = identifier(5) + version(2) + units(1) + density(4)
    # + thumb dims(2) = 14 bytes; length field counts itself too (16)
    app0 = b"\xff\xe0" + st.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    sof0 = (
        b"\xff\xc0" + st.pack(">H", 11) + b"\x08" + st.pack(">HH", h, w)
        + b"\x01" + b"\x01\x11\x00"  # 1 component: id, sampling, qtable
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_real_png_gray8_full_decode(spark):
    """Real PNG path end-to-end: all five filter types decode to the
    original pixels; extract_image_features reports true dims and a
    feature computed from the REAL pixels."""
    from theoremsearch_spark.functions.multimodal import (
        decode_png_gray8,
        encode_png_gray8,
        parse_png_header,
    )

    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (11, 17), dtype=np.uint8)
    raw = _png_with_filters(img.astype(np.int64))
    hdr = parse_png_header(raw)
    assert (hdr["width"], hdr["height"], hdr["bit_depth"], hdr["color_type"]) == (17, 11, 8, 0)
    px = decode_png_gray8(raw)
    assert px is not None and (px.reshape(11, 17) == img).all()
    # module's own encoder roundtrips too
    assert (decode_png_gray8(encode_png_gray8(img)).reshape(11, 17) == img).all()

    df = spark.createDataFrame([(7, raw)], "media_id long, payload binary")
    out = extract_image_features(df).toPandas().iloc[0]
    assert (out["format"], out["width"], out["height"]) == ("png", 17, 11)
    hist, _ = np.histogram(img.ravel(), bins=8, range=(0, 256))
    np.testing.assert_allclose(np.array(out["feature"]), hist / hist.sum(), atol=1e-6)


def test_real_png_resize_roundtrip(spark):
    """resize_stub decimates a REAL gray8 PNG and re-emits a valid PNG."""
    from theoremsearch_spark.functions.multimodal import decode_png_gray8

    img = (np.arange(64 * 48, dtype=np.int64) % 256).reshape(48, 64).astype(np.uint8)
    df = spark.createDataFrame(
        [(9, _png_with_filters(img.astype(np.int64)))], "media_id long, payload binary"
    )
    out = resize_stub(df, max_side=16).toPandas()
    raw = bytes(out.iloc[0]["payload"])
    assert sniff_format(raw) == "png"
    small = decode_png_gray8(raw)
    assert small is not None and (small.reshape(12, 16) == img[::4, ::4]).all()


def test_jpeg_dims_from_sof(spark):
    out = extract_image_features(
        spark.createDataFrame([(3, _tiny_jpeg(1920, 1080))], "media_id long, payload binary")
    ).toPandas().iloc[0]
    assert (out["format"], out["width"], out["height"]) == ("jpeg", 1920, 1080)
    assert out["feature"] is None  # pixels need an external codec


def test_unknown_format_passthrough(spark, media_df):
    out = extract_image_features(media_df.filter("media_id = 101")).toPandas()
    assert out.iloc[0]["format"] is None and out.iloc[0]["feature"] is None


def test_resize(spark, media_df):
    out = resize_stub(media_df.filter("media_id = 5"), max_side=16).toPandas()
    raw = bytes(out.iloc[0]["payload"])
    w, h = struct.unpack("<II", raw[4:12])
    assert max(w, h) <= 18  # 69/4 = 17 cols with step decimation
    assert sniff_format(raw) == "synthetic"


def test_frame_sampling(spark):
    frames = b"".join(make_synthetic_image(7, 8, 8)[0:] for _ in range(12))
    # concatenated equal-size frames; header of first frame governs size
    df = spark.createDataFrame([(7, frames)], "media_id long, payload binary")
    out = frame_sample_stub(df, every_n=4).toPandas()
    assert out["frame_no"].tolist() == [0, 4, 8]
    assert all(sniff_format(bytes(f)) == "synthetic" for f in out["frame"])
