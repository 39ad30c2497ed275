"""Multimodal plumbing: fake-codec decode, feature shapes, quarantine."""

from __future__ import annotations

from cortex_spark.dataops.multimodal import (
    MEDIA_SCHEMA,
    decode_and_featurize,
    encode_fake_image,
    sample_frames,
)


def _media_df(spark, rows):
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_shapes_and_determinism(spark):
    img = encode_fake_image(8, 4, 3, seed=1)
    df = _media_df(spark, [("m1", "image", img, ("image/fake", 8, 4, 3, None))])
    r = decode_and_featurize(df).first()
    assert (r["width"], r["height"], r["channels"]) == (8, 4, 3)
    assert len(r["features"]) == 3 and all(0.0 <= f <= 1.0 for f in r["features"])
    assert r["error"] is None
    r2 = decode_and_featurize(df).first()
    assert r["features"] == r2["features"]


def test_resize_plumbing(spark):
    img = encode_fake_image(16, 16, 3, seed=2)
    df = _media_df(spark, [("m1", "image", img, ("image/fake", 16, 16, 3, None))])
    r = decode_and_featurize(df, resize_to=(4, 4)).first()
    assert (r["width"], r["height"]) == (4, 4)


def test_real_codec_stub_quarantines(spark):
    df = _media_df(spark, [("m1", "image", b"\x89PNG\r\n realbytes", ("image/png", None, None, None, None))])
    r = decode_and_featurize(df).first()
    assert r["features"] is None
    assert "not available" in r["error"] or "decode_error" in r["error"]


def test_frame_sampling(spark):
    df = _media_df(spark, [("v1", "video", None, ("video/fake", None, None, None, 3500))])
    frames = sample_frames(df, every_ms=1000).collect()
    assert [f["ts_ms"] for f in frames] == [0, 1000, 2000]
