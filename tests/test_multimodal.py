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


def test_unsupported_format_raises(spark, media_df):
    with pytest.raises(Exception, match="NotImplementedError|real image decoding"):
        extract_image_features(media_df.filter("media_id = 100")).collect()


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
