"""Multimodal plumbing: fake-codec decode, feature shapes, quarantine."""

from __future__ import annotations

import pytest

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
    """Without the optional codec libs, compressed payloads quarantine (the
    seam's fallback branch — this container has no PIL/soundfile/PyAV);
    with a lib present the same bytes would decode for real instead."""
    df = _media_df(spark, [("m1", "image", b"\x89PNG\r\n realbytes", ("image/png", None, None, None, None))])
    r = decode_and_featurize(df).first()
    try:
        import PIL  # noqa: F401

        # lib present: truncated PNG header is a decode error, not a stub
        assert r["error"] is not None
    except ImportError:
        assert r["features"] is None
        assert "optional" in r["error"] or "decode_error" in r["error"]


def test_frame_sampling(spark):
    """Schedule parity with the real decoder: one sample per STARTED
    interval (ts < duration), so 3500 ms @ 1000 ms -> 0,1000,2000,3000
    exactly like decode_video_frames; null duration emits nothing."""
    df = _media_df(spark, [
        ("v1", "video", None, ("video/fake", None, None, None, 3500)),
        ("v2", "video", None, ("video/fake", None, None, None, None)),
    ])
    frames = sample_frames(df, every_ms=1000).collect()
    assert [f["ts_ms"] for f in frames if f["media_id"] == "v1"] == [0, 1000, 2000, 3000]
    assert not [f for f in frames if f["media_id"] == "v2"]


def test_ppm_pgm_real_decode(spark):
    """P6/P5 netpbm are decoded for real (numpy parse incl. comments):
    features equal a hand-computed per-channel mean."""
    import numpy as np

    from cortex_spark.dataops.multimodal import _parse_pnm, encode_ppm

    rgb = encode_ppm(6, 4, seed=3)
    gray = encode_ppm(5, 5, seed=4, gray=True)
    w, h, c, arr = _parse_pnm(rgb)
    assert (w, h, c) == (6, 4, 3) and arr.shape == (4, 6, 3)

    df = _media_df(
        spark,
        [
            ("p6", "image", rgb, ("image/x-portable-pixmap", 6, 4, 3, None)),
            ("p5", "image", gray, ("image/x-portable-graymap", 5, 5, 1, None)),
        ],
    )
    out = {r["media_id"]: r for r in decode_and_featurize(df).collect()}
    assert out["p6"]["error"] is None and out["p5"]["error"] is None
    assert (out["p6"]["width"], out["p6"]["height"], out["p6"]["channels"]) == (6, 4, 3)
    want = arr.reshape(-1, 3).mean(axis=0) / 255.0
    got = np.array(out["p6"]["features"])
    assert np.allclose(got, want, atol=1e-6)
    # truncated raster quarantines instead of failing the batch
    bad = rgb[: len(rgb) - 10]
    r = decode_and_featurize(
        _media_df(spark, [("bad", "image", bad, ("image/x-portable-pixmap", 6, 4, 3, None))])
    ).first()
    assert r["error"] is not None and r["features"] is None


def test_wav_real_decode(spark):
    """PCM WAV decodes for real via the stdlib: duration exact, sine RMS
    = amp/sqrt(2), zero-crossing rate = 2f/rate; stereo downmixes; 24-bit
    quarantines as unsupported."""
    import io
    import wave

    import numpy as np

    from cortex_spark.dataops.multimodal import decode_audio_features, encode_wav

    mono = encode_wav(16000, rate=16000, freq=440.0)
    stereo = encode_wav(8000, rate=16000, freq=200.0, channels=2)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(3)
        wf.setframerate(8000)
        wf.writeframes(b"\x00\x00\x00" * 100)
    wav24 = buf.getvalue()

    df = _media_df(
        spark,
        [
            ("a1", "audio", mono, ("audio/wav", None, None, 1, 1000)),
            ("a2", "audio", stereo, ("audio/wav", None, None, 2, 500)),
            ("a3", "audio", wav24, ("audio/wav", None, None, 1, None)),
        ],
    )
    out = {r["media_id"]: r for r in decode_audio_features(df).collect()}
    a1 = out["a1"]
    assert a1["error"] is None and a1["duration_ms"] == 1000 and a1["sample_rate"] == 16000
    amp = 30000 / 32768.0
    assert abs(a1["rms"] - amp / np.sqrt(2)) < 0.01
    assert abs(a1["zcr"] - 2 * 440.0 / 16000) < 0.005
    a2 = out["a2"]
    assert a2["channels"] == 2 and a2["duration_ms"] == 500
    assert out["a3"]["error"] is not None and "24-bit" in out["a3"]["error"]


def test_y4m_real_video_decode(spark):
    """YUV4MPEG2 parses for real: frame sampling at 200 ms over 10 frames
    @25fps hits frames 0 and 5, luma means match numpy; a compressed
    container quarantines as not-implemented."""
    import numpy as np

    from cortex_spark.dataops.multimodal import _parse_y4m, decode_video_frames, encode_y4m

    vid = encode_y4m(8, 6, n_frames=10, fps=25, seed=9)
    w, h, num, den, lumas = _parse_y4m(vid)
    assert (w, h, num, den, len(lumas)) == (8, 6, 25, 1, 10)

    df = _media_df(
        spark,
        [
            ("v1", "video", vid, ("video/x-yuv4mpeg", 8, 6, None, 400)),
            ("v2", "video", b"\x00\x00\x00\x18ftypmp42 fake", ("video/mp4", None, None, None, None)),
        ],
    )
    out = decode_video_frames(df, every_ms=200).collect()
    ok = sorted(
        ((r["frame_idx"], r["ts_ms"], r["luma_mean"]) for r in out if r["media_id"] == "v1")
    )
    # 10 frames @ 25fps = 400ms; samples at 0 and 200ms -> frames 0 and 5
    assert [(i, t) for i, t, _ in ok] == [(0, 0), (5, 200)]
    assert abs(ok[0][2] - float(lumas[0].mean()) / 255.0) < 1e-9
    assert abs(ok[1][2] - float(lumas[5].mean()) / 255.0) < 1e-9
    bad = [r for r in out if r["media_id"] == "v2"]
    assert len(bad) == 1 and bad[0]["error"] is not None


def _has(mod):
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _has("PIL"), reason="optional PIL dependency absent")
def test_png_real_decode_via_optional_seam(spark):
    """With PIL importable, a real PNG flows through the SAME decode path
    (no code change) and produces exact per-channel means."""
    import io

    import numpy as np
    from PIL import Image

    arr = np.zeros((4, 6, 3), dtype=np.uint8)
    arr[..., 0] = 200  # red-ish constant image -> known channel means
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    df = _media_df(spark, [("p1", "image", buf.getvalue(), ("image/png", 6, 4, 3, None))])
    r = decode_and_featurize(df).first()
    assert r["error"] is None and (r["width"], r["height"], r["channels"]) == (6, 4, 3)
    assert abs(r["features"][0] - 200 / 255.0) < 1e-9 and r["features"][1] == 0.0


@pytest.mark.skipif(not _has("soundfile"), reason="optional soundfile dependency absent")
def test_flac_real_decode_via_optional_seam(spark):
    import io

    import numpy as np
    import soundfile as sf

    t = np.arange(16000) / 16000.0
    buf = io.BytesIO()
    sf.write(buf, np.sin(2 * np.pi * 440 * t), 16000, format="FLAC")
    df = _media_df(spark, [("f1", "audio", buf.getvalue(), ("audio/flac", None, None, 1, 1000))])
    from cortex_spark.dataops.multimodal import decode_audio_features

    r = decode_audio_features(df).first()
    assert r["error"] is None and r["duration_ms"] == 1000 and r["sample_rate"] == 16000


@pytest.mark.skipif(not _has("av"), reason="optional PyAV dependency absent")
def test_mp4_real_decode_via_optional_seam(spark):
    import io

    import av
    import numpy as np

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("h264", rate=25)
        stream.width, stream.height = 64, 48
        stream.pix_fmt = "yuv420p"
        for i in range(10):
            frame = av.VideoFrame.from_ndarray(
                np.full((48, 64, 3), i * 20, dtype=np.uint8), format="rgb24")
            for packet in stream.encode(frame):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
    from cortex_spark.dataops.multimodal import decode_video_frames

    df = _media_df(spark, [("m4", "video", buf.getvalue(), ("video/mp4", 64, 48, None, 400))])
    out = [r for r in decode_video_frames(df, every_ms=200).collect() if r["error"] is None]
    assert out and all(r["width"] == 64 and r["height"] == 48 for r in out)


# ── stdlib PNG codec (no optional dependency) ──────────────────────────────


def test_png_stdlib_roundtrip_all_filters_and_channels():
    """encode_png → _decode_png reproduces the seed raster exactly for
    gray/gray-alpha/RGB/RGBA and for every scanline filter type."""
    import numpy as np

    from cortex_spark.dataops.multimodal import _decode_png, encode_png

    for ch in (1, 2, 3, 4):
        for w, h, seed in ((8, 6, 0), (1, 1, 1), (2, 9, 2), (17, 5, 3)):
            rng = np.random.default_rng(seed)
            raw = rng.integers(0, 256, size=(h, w * ch), dtype=np.uint8)
            W, H, C, arr = _decode_png(encode_png(w, h, ch, seed=seed))
            assert (W, H, C) == (w, h, ch)
            assert np.array_equal(arr.reshape(h, w * ch), raw)
    for ft in range(5):
        rng = np.random.default_rng(10 + ft)
        raw = rng.integers(0, 256, size=(7, 27), dtype=np.uint8)
        _, _, _, arr = _decode_png(encode_png(9, 7, 3, seed=10 + ft, filters=[ft]))
        assert np.array_equal(arr.reshape(7, 27), raw), f"filter {ft}"


def test_png_stdlib_matches_independent_decoder():
    """Engine decode vs scripts/make_png_golden.py's scalar spec decoder:
    bit-identical rasters on the driver-fixture payloads."""
    import os
    import sys

    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from make_png_golden import decode_png_independent

    from cortex_spark.dataops.multimodal import _decode_png, encode_png

    for i in (0, 1, 7, 13):
        content = encode_png(8, 8, 3 if i % 2 == 0 else 1, seed=i)
        w1, h1, c1, a1 = _decode_png(content)
        w2, h2, c2, rows = decode_png_independent(content)
        assert (w1, h1, c1) == (w2, h2, c2)
        assert np.array_equal(a1.reshape(-1), np.array(rows, dtype=np.uint8).reshape(-1))


def test_png_palette_decode():
    """Color type 3: indices expand through PLTE to RGB."""
    import struct
    import zlib

    import numpy as np

    from cortex_spark.dataops.multimodal import PNG_SIG, _decode_png

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red, green, blue
    idat = zlib.compress(b"\x00\x00\x01" + b"\x00\x02\x00")  # rows: [0,1],[2,0]
    png = PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    w, h, c, arr = _decode_png(png)
    assert (w, h, c) == (2, 2, 3)
    assert np.array_equal(arr, np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 0, 0]]], dtype=np.uint8))


def test_png_unsupported_variants_quarantine(spark):
    """16-bit and interlaced PNGs raise through the quarantine path (error
    column set, batch survives); truncated bytes become decode errors."""
    import struct
    import zlib

    from cortex_spark.dataops.multimodal import PNG_SIG, encode_png

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF)

    deep = PNG_SIG + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)) + chunk(
        b"IDAT", zlib.compress(b"\x00" * 10)) + chunk(b"IEND", b"")
    laced = PNG_SIG + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)) + chunk(
        b"IDAT", zlib.compress(b"\x00" * 10)) + chunk(b"IEND", b"")
    trunc = encode_png(8, 8, 3, seed=0)[:40]
    df = _media_df(spark, [
        ("deep", "image", deep, ("image/png", None, None, None, None)),
        ("laced", "image", laced, ("image/png", None, None, None, None)),
        ("trunc", "image", trunc, ("image/png", None, None, None, None)),
        ("good", "image", encode_png(4, 4, 3, seed=5), ("image/png", None, None, None, None)),
    ])
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    out = {r["media_id"]: r for r in decode_and_featurize(df).collect()}
    assert out["good"]["error"] is None and out["good"]["channels"] == 3
    assert out["trunc"]["error"] is not None
    if not has_pil:  # stdlib decoder: explicit unsupported-variant messages
        assert "not supported" in out["deep"]["error"]
        assert "not supported" in out["laced"]["error"]


def test_gif_stdlib_roundtrip_shapes_palettes_interlace():
    """encode_gif → _decode_gif reproduces palette[indices] exactly across
    sizes, palette widths (min LZW code 2..8), and interlace."""
    import numpy as np

    from cortex_spark.dataops.multimodal import _decode_gif, encode_gif

    for n_colors in (4, 16, 256):
        for interlace in (False, True):
            for w, h, seed in ((8, 6, 0), (1, 1, 1), (13, 7, 2), (33, 17, 3)):
                rng = np.random.default_rng(seed)
                gct_bits = max(1, (n_colors - 1).bit_length())
                pal = rng.integers(0, 256, size=(1 << gct_bits, 3), dtype=np.uint8)
                idx = rng.integers(0, n_colors, size=(h, w), dtype=np.uint8)
                W, H, C, arr = _decode_gif(
                    encode_gif(w, h, seed=seed, interlace=interlace, n_colors=n_colors))
                assert (W, H, C) == (w, h, 3)
                assert np.array_equal(arr, pal[idx]), (n_colors, interlace, w, h)


def test_gif_lzw_width_growth_and_table_reset():
    """A 128×128 random 256-color raster drives the LZW table through every
    code width 9→12 and past 4096 entries (CLEAR reset mid-stream); the
    roundtrip must still be exact."""
    import numpy as np

    from cortex_spark.dataops.multimodal import _gif_lzw_decode, _gif_lzw_encode

    rng = np.random.default_rng(9)
    data = rng.integers(0, 256, size=128 * 128, dtype=np.uint8).tobytes()
    enc = _gif_lzw_encode(data, 8)
    assert _gif_lzw_decode(enc, 8, len(data)) == data
    # compressible stream: long matches, different table shape
    rep = (data[:97] * 200)[: 128 * 128]
    assert _gif_lzw_decode(_gif_lzw_encode(rep, 8), 8, len(rep)) == rep


def test_gif_stdlib_matches_independent_decoder():
    """Engine decode vs scripts/make_gif_golden.py's scalar spec decoder:
    bit-identical rasters on the driver-fixture payloads."""
    import os
    import sys

    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from make_gif_golden import decode_gif_independent

    from cortex_spark.dataops.multimodal import _decode_gif, encode_gif

    for i in (0, 1, 3, 14):
        content = encode_gif(10, 6, seed=i, interlace=(i % 2 == 1),
                             n_colors=16 if i % 3 == 0 else 256)
        w1, h1, c1, a1 = _decode_gif(content)
        w2, h2, c2, px = decode_gif_independent(content)
        assert (w1, h1, c1) == (w2, h2, c2)
        assert np.array_equal(a1.reshape(-1, 3), np.array(px, dtype=np.uint8))


def test_gif_partial_frame_and_animation_first_frame():
    """A sub-screen frame pastes onto a background-color canvas; an
    animated GIF decodes to its FIRST frame."""
    import struct

    import numpy as np

    from cortex_spark.dataops.multimodal import _decode_gif, _gif_lzw_encode, encode_gif

    # hand-build: 4×4 screen, 2-entry GCT (bg=1 → white), 2×2 frame at (1,1)
    pal = bytes([10, 20, 30, 255, 255, 255])
    idx = bytes([0, 0, 0, 0])  # frame all color 0
    gif = (b"GIF89a" + struct.pack("<HH", 4, 4) + bytes([0x80, 1, 0]) + pal
           + b"\x2c" + struct.pack("<HHHH", 1, 1, 2, 2) + b"\x00" + bytes([2]))
    stream = _gif_lzw_encode(idx, 2)
    gif += bytes([len(stream)]) + stream + b"\x00" + b"\x3b"
    w, h, c, arr = _decode_gif(gif)
    assert (w, h, c) == (4, 4, 3)
    assert np.array_equal(arr[0, 0], [255, 255, 255])  # bg
    assert np.array_equal(arr[1, 1], [10, 20, 30])  # frame
    assert np.array_equal(arr[2, 2], [10, 20, 30])
    assert np.array_equal(arr[3, 3], [255, 255, 255])

    multi = encode_gif(8, 8, seed=5, n_frames=3)
    rng = np.random.default_rng(5)
    pal5 = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    first = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    _, _, _, arr5 = _decode_gif(multi)
    assert np.array_equal(arr5, pal5[first])


def test_gif_malformed_quarantines(spark):
    """Truncated streams, bad block tags, and oversized LZW output all
    quarantine into the error column; a good row in the same batch
    survives."""
    from cortex_spark.dataops.multimodal import encode_gif

    good = encode_gif(6, 4, seed=2)
    df = _media_df(spark, [
        ("trunc", "image", good[: len(good) - 9], ("image/gif", None, None, None, None)),
        ("header", "image", good[:10], ("image/gif", None, None, None, None)),
        ("badtag", "image", good[:13] + good[13:13 + 768] + b"\x99rest", ("image/gif", None, None, None, None)),
        ("good", "image", good, ("image/gif", None, None, None, None)),
    ])
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    out = {r["media_id"]: r for r in decode_and_featurize(df).collect()}
    assert out["good"]["error"] is None and out["good"]["channels"] == 3
    if not has_pil:
        assert out["trunc"]["error"] is not None
        assert out["header"]["error"] is not None
        assert out["badtag"]["error"] is not None


@pytest.mark.skipif(not _has("PIL"), reason="optional PIL dependency absent")
def test_gif_pil_seam_matches_stdlib_decoder(spark):
    """With PIL importable it takes priority over the stdlib GIF decoder;
    both must produce the identical raster → identical features."""
    import numpy as np

    from cortex_spark.dataops.multimodal import _decode_gif, _decode_one, encode_gif

    for seed in (0, 3):
        content = encode_gif(10, 6, seed=seed, n_colors=256)
        w1, h1, c1, a1 = _decode_one(content)  # PIL path
        w2, h2, c2, a2 = _decode_gif(content)  # stdlib path
        assert (w1, h1, c1) == (w2, h2, c2)
        assert np.array_equal(np.asarray(a1), np.asarray(a2))


def test_jpeg_stdlib_roundtrip_quality_and_shapes():
    """encode_jpeg → _decode_jpeg: exact on flat blocks (DC-only), within
    quantization error on smooth rasters, across gray/color, 4:4:4/4:2:0,
    and non-MCU-aligned sizes."""
    import numpy as np

    from cortex_spark.dataops.multimodal import _decode_jpeg, encode_jpeg

    _, _, _, flat = _decode_jpeg(encode_jpeg(8, 8, channels=3, seed=7, smooth=64))
    rng = np.random.default_rng(7)
    src = np.repeat(np.repeat(rng.integers(40, 216, size=(1, 1, 3)), 64, 0), 64, 1)[:8, :8]
    assert np.abs(flat.astype(float) - src).max() <= 6  # flat → DC-only

    for ch, sub in ((1, "444"), (3, "444"), (3, "420")):
        for w, h in ((16, 16), (13, 7), (34, 21), (1, 1)):
            b = encode_jpeg(w, h, channels=ch, seed=ch * 100 + w, subsample=sub)
            W, H, C, arr = _decode_jpeg(b)
            assert (W, H, C) == (w, h, ch)
            rng = np.random.default_rng(ch * 100 + w)
            coarse = rng.integers(40, 216, size=((h + 3) // 4, (w + 3) // 4, ch))
            src = np.repeat(np.repeat(coarse, 4, 0), 4, 1)[:h, :w].astype(np.float64)
            err = np.abs(arr.astype(np.float64) - src)
            assert err.mean() < (8.0 if sub == "444" else 20.0), (ch, sub, w, h)


def test_jpeg_restart_interval_decodes_identically():
    """DRI/RSTn segmentation changes the byte stream but not the pixels."""
    import numpy as np

    from cortex_spark.dataops.multimodal import _decode_jpeg, encode_jpeg

    plain = encode_jpeg(48, 32, channels=3, seed=5, subsample="420")
    rst = encode_jpeg(48, 32, channels=3, seed=5, subsample="420", restart_interval=2)
    assert plain != rst
    _, _, _, a1 = _decode_jpeg(plain)
    _, _, _, a2 = _decode_jpeg(rst)
    assert np.array_equal(a1, a2)


def test_jpeg_stdlib_matches_independent_decoder():
    """Engine decode vs scripts/make_jpeg_golden.py's scalar T.81 decoder:
    BIT-IDENTICAL rasters on the driver-fixture payloads (both implement
    the documented float64-IDCT + replication-upsampling contract)."""
    import os
    import sys

    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from make_jpeg_golden import decode_jpeg_independent, fixture

    from cortex_spark.dataops.multimodal import _decode_jpeg

    for i in (0, 1, 3, 5, 10):  # covers gray, 420, restart, 444 color
        content = fixture(i)
        w1, h1, c1, a1 = _decode_jpeg(content)
        w2, h2, c2, px = decode_jpeg_independent(content)
        assert (w1, h1, c1) == (w2, h2, c2)
        assert np.array_equal(a1, np.array(px, dtype=np.uint8).reshape(h2, w2, c2))


def test_jpeg_malformed_and_progressive_quarantine(spark):
    """Truncated entropy streams and progressive (SOF2) payloads quarantine
    into the error column; a good row in the same batch survives. The
    fixture query path pins prefer_stdlib (deterministic vs PIL)."""
    from cortex_spark.dataops.multimodal import decode_and_featurize as dec
    from cortex_spark.dataops.multimodal import encode_jpeg

    good = encode_jpeg(16, 11, channels=3, seed=2)
    sof2 = good.replace(b"\xff\xc0", b"\xff\xc2", 1)  # progressive marker
    df = _media_df(spark, [
        ("trunc", "image", good[: len(good) - 20], ("image/jpeg", None, None, None, None)),
        ("header", "image", good[:3], ("image/jpeg", None, None, None, None)),
        ("sof2", "image", sof2, ("image/jpeg", None, None, None, None)),
        ("good", "image", good, ("image/jpeg", None, None, None, None)),
    ])
    out = {r["media_id"]: r for r in dec(df, prefer_stdlib=True).collect()}
    assert out["good"]["error"] is None and out["good"]["channels"] == 3
    assert out["trunc"]["error"] is not None
    assert out["header"]["error"] is not None
    assert "only baseline" in out["sof2"]["error"]


def test_avi_mjpeg_parse_and_luma():
    """encode_avi_mjpeg → _parse_avi_mjpeg: fps from strh, per-frame luma
    identical to decoding the same JPEG payload directly (gray channel-0;
    JFIF Y for color)."""
    import numpy as np

    from cortex_spark.dataops.multimodal import (
        _decode_jpeg, _parse_avi_mjpeg, _parse_y4m, encode_avi_mjpeg, encode_jpeg)

    for gray in (False, True):
        b = encode_avi_mjpeg(16, 11, n_frames=3, fps=10, seed=4, gray=gray)
        w, h, num, den, lumas = _parse_y4m(b)  # dispatches to the AVI parser
        assert (w, h, num, den, len(lumas)) == (16, 11, 10, 1, 3)
        _, _, c, arr = _decode_jpeg(encode_jpeg(16, 11, channels=1 if gray else 3, seed=4000))
        if gray:
            exp = arr[:, :, 0]
        else:
            r, g, bb = (arr[:, :, i].astype(np.float64) for i in range(3))
            exp = np.clip(np.round(0.299 * r + 0.587 * g + 0.114 * bb), 0, 255).astype(np.uint8)
        assert np.array_equal(lumas[0], exp)


def test_avi_mjpeg_malformed_and_foreign_codec(spark):
    """Truncated RIFF structures quarantine; a non-JPEG '00dc' payload
    surfaces the PyAV NotImplementedError; good rows survive the batch."""
    from cortex_spark.dataops.multimodal import decode_video_frames, encode_avi_mjpeg

    good = encode_avi_mjpeg(16, 11, n_frames=2, fps=10, seed=1)
    i = good.find(b"\xff\xd8")
    foreign = good[:i] + b"\x00\x00" + good[i + 2 :]
    df = _media_df(spark, [
        ("trunc", "video", good[: len(good) // 2], ("video/x-msvideo", None, None, None, None)),
        ("foreign", "video", foreign, ("video/x-msvideo", None, None, None, None)),
        ("good", "video", good, ("video/x-msvideo", None, None, None, None)),
    ])
    rows = decode_video_frames(df, every_ms=100).collect()
    by_id: dict = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert all(r["error"] is None for r in by_id["good"]) and len(by_id["good"]) == 2
    assert by_id["trunc"][0]["error"] is not None
    assert "PyAV" in by_id["foreign"][0]["error"]


def test_g711_tables_match_itu_anchors():
    """Expansion tables hit the canonical G.711 anchor values (Sun g711.c
    reference points) and are antisymmetric across the sign bit."""
    import numpy as np

    from cortex_spark.dataops.multimodal import _G711_A, _G711_MU

    assert _G711_MU[0x00] == -32124 and _G711_MU[0x80] == 32124
    assert _G711_MU[0x7F] == 0 and _G711_MU[0xFF] == 0
    assert _G711_A[0x55] == -8 and _G711_A[0xD5] == 8
    assert _G711_A[0x2A] == -32256 and _G711_A[0xAA] == 32256
    assert np.array_equal(_G711_MU[:128], -_G711_MU[128:])
    assert np.array_equal(_G711_A[:128], -_G711_A[128:])


def test_g711_wav_decode_and_quarantine(spark):
    """μ-law/A-law WAVs (format codes the stdlib wave module rejects)
    decode to correct header features; an unknown format code quarantines;
    PCM keeps flowing through the stdlib path in the same batch."""
    import struct as st

    from cortex_spark.dataops.multimodal import (
        decode_audio_features, encode_wav, encode_wav_g711)

    adpcm = bytearray(encode_wav_g711(100, law="mu", seed=0))
    adpcm[20:22] = st.pack("<H", 2)  # MS ADPCM format code → unsupported
    df = _media_df(spark, [
        ("mu", "audio", encode_wav_g711(4000, rate=8000, law="mu", channels=2, seed=3),
         ("audio/wav", None, None, None, None)),
        ("al", "audio", encode_wav_g711(3000, rate=8000, law="a", channels=1, seed=4),
         ("audio/wav", None, None, None, None)),
        ("pcm", "audio", encode_wav(4000, rate=8000, channels=1),
         ("audio/wav", None, None, None, None)),
        ("adpcm", "audio", bytes(adpcm), ("audio/wav", None, None, None, None)),
    ])
    out = {r["media_id"]: r for r in decode_audio_features(df).collect()}
    assert (out["mu"]["channels"], out["mu"]["sample_rate"], out["mu"]["duration_ms"]) == (2, 8000, 500)
    assert (out["al"]["channels"], out["al"]["duration_ms"]) == (1, 375)
    assert out["pcm"]["error"] is None and out["pcm"]["duration_ms"] == 500
    assert out["mu"]["rms"] > 0 and 0 < out["mu"]["zcr"] < 1
    assert "not supported" in out["adpcm"]["error"]


def test_flac_lossless_roundtrip_all_stereo_modes():
    """encode_flac → _decode_flac reproduces the source signal features
    EXACTLY (lossless) across independent/left-side/right-side/mid-side
    and across frame-boundary-straddling lengths."""
    import numpy as np

    from cortex_spark.dataops.multimodal import _audio_features, _decode_wav, encode_flac

    def source(n, rate, channels, seed):
        rng = np.random.default_rng(seed)
        t = np.arange(n, dtype=np.float64)
        sig = np.zeros((n, channels))
        for c in range(channels):
            freq = 200.0 + 40.0 * c + (seed % 7) * 15.0
            w = 9000 * np.sin(2 * np.pi * freq * t / rate)
            drift = np.cumsum(rng.integers(-60, 61, size=n))
            sig[:, c] = np.clip(w + drift, -30000, 30000)
        return sig.astype(np.int64)

    for channels, stereo in ((1, "independent"), (2, "independent"),
                             (2, "ls"), (2, "rs"), (2, "ms")):
        for n in (1000, 1024, 3000):
            b = encode_flac(n, rate=8000, channels=channels, seed=3, stereo=stereo)
            got = _decode_wav(b)  # routes via the fLaC magic
            mono = (source(n, 8000, channels, 3) / 32768.0).mean(axis=1)
            exp = _audio_features(mono, channels, 8000, n)
            assert got[:3] == exp[:3]
            assert abs(got[3] - exp[3]) < 1e-15 and abs(got[4] - exp[4]) < 1e-15


def test_flac_multibyte_frame_numbers_and_partitions():
    """>127 frames exercises 2-byte UTF-8 coded frame numbers end-to-end;
    a hand-built residual stream exercises partition order > 0 and the
    5-bit escape code the fixture encoder never emits."""
    from cortex_spark.dataops.multimodal import (
        _decode_flac, _FlacBitReader, _FlacBitWriter, _flac_residual, encode_flac)

    b = encode_flac(192 * 130, rate=8000, channels=1, seed=2, blocksize=192)
    nch, rate, dur, rms, zcr = _decode_flac(b)
    assert (nch, rate) == (1, 8000) and dur == int(round(192 * 130 * 1000 / 8000))

    # handcrafted: n=8, pred_order=1, porder=1 → partitions of 4 (first has 3)
    wr = _FlacBitWriter()
    wr.put(0, 2)   # rice method 0
    wr.put(1, 4)   # partition order 1
    wr.put(0, 4)   # partition 1: rice param 0 → unary-only zigzags
    for z in (1, 2, 3):  # values -1, 1, -2
        for _ in range(z):
            wr.put(0, 1)
        wr.put(1, 1)
    wr.put(15, 4)  # partition 2: escape code
    wr.put(5, 5)   # 5-bit raw residuals
    for v in (-5, 0, 7, -8):
        wr.put(v & 0x1F, 5)
    wr.align()
    rd = _FlacBitReader(bytes(wr.buf))
    out = _flac_residual(rd, 8, 1)
    assert out == [-1, 1, -2, -5, 0, 7, -8]


def test_flac_malformed_quarantines(spark):
    """Truncation, bad sync, and 8-bit streams all quarantine; a good row
    in the same batch survives."""
    from cortex_spark.dataops.multimodal import decode_audio_features, encode_flac

    good = encode_flac(1500, rate=8000, channels=2, seed=6, stereo="ms")
    badsync = bytearray(good)
    # flip the first frame's sync byte (frames start right after metadata)
    i = good.index(b"\xff", 4)
    badsync[i] = 0x00
    df = _media_df(spark, [
        ("trunc", "audio", good[: len(good) - 7], ("audio/flac", None, None, None, None)),
        ("sync", "audio", bytes(badsync), ("audio/flac", None, None, None, None)),
        ("good", "audio", good, ("audio/flac", None, None, None, None)),
    ])
    out = {r["media_id"]: r for r in decode_audio_features(df).collect()}
    assert out["good"]["error"] is None and out["good"]["channels"] == 2
    assert out["trunc"]["error"] is not None
    assert out["sync"]["error"] is not None


def test_gif_lzw_missing_eoi_decodes_when_pixels_complete():
    """Round-5 ADVICE fix: encoders that rely on the sub-block terminator
    and omit the explicit EOI code must still decode once the descriptor's
    pixel count is reached — not quarantine as 'truncated'."""
    from cortex_spark.dataops.multimodal import _gif_lzw_decode

    # hand-packed LZW stream, min_code_size=2 (clear=4, eoi=5, width=3):
    # CLEAR then six root codes (pixels 0..3,2,1) and NO EOI
    codes = [4, 0, 1, 2, 3, 2, 1]
    widths = [3, 3, 3, 3, 4, 4, 4]  # table hits 8 entries after code '2'
    acc = bitpos = 0
    buf = bytearray()
    for c, w in zip(codes, widths):
        acc |= c << bitpos
        bitpos += w
        while bitpos >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            bitpos -= 8
    if bitpos:
        buf.append(acc & 0xFF)
    out = _gif_lzw_decode(bytes(buf), 2, expected=6)
    assert out == bytes([0, 1, 2, 3, 2, 1])
    # a genuinely short stream still raises
    with pytest.raises(ValueError):
        _gif_lzw_decode(bytes(buf)[:1], 2, expected=6)


def test_jpeg_noninterleaved_scan_quarantines():
    """Round-5 ADVICE fix: a baseline JPEG encoded as per-component scans
    (SOS ns != SOF component count) must quarantine, not return a wrong
    grayscale raster from the first scan only."""
    import struct

    from cortex_spark.dataops.multimodal import _decode_jpeg, encode_jpeg

    good = encode_jpeg(16, 16, channels=3, seed=3)
    i = good.index(b"\xff\xda")
    # original SOS payload: len(2) ns=3 (c,t)*3 ss se ahal → rewrite as ns=1
    payload = good[i + 2 :]
    new_sos = struct.pack(">H", 8) + b"\x01" + payload[3:5] + payload[9:12]
    patched = good[: i + 2] + new_sos + payload[12:]
    with pytest.raises(NotImplementedError, match="non-interleaved"):
        _decode_jpeg(patched)
    w, h, c, _ = _decode_jpeg(good)  # unpatched still decodes
    assert (w, h, c) == (16, 16, 3)


def test_avi_ignores_foreign_stream_chunks():
    """Round-5 ADVICE fix: movi chunks from a stream number other than the
    'vids' stream ('01dc' here — e.g. a second video or data stream) must
    not merge into the decoded frame sequence."""
    import struct

    from cortex_spark.dataops.multimodal import _parse_avi_mjpeg, encode_avi_mjpeg, encode_jpeg

    avi = encode_avi_mjpeg(16, 16, n_frames=2, fps=10, seed=1)
    # a foreign 8x8 frame: pre-fix this either merged or raised 'size changed'
    junk = encode_jpeg(8, 8, channels=1, seed=9)
    foreign = b"01dc" + struct.pack("<I", len(junk)) + junk + (b"\x00" if len(junk) % 2 else b"")
    movi_at = avi.rindex(b"movi") - 8  # its LIST header
    (movi_size,) = struct.unpack("<I", avi[movi_at + 4 : movi_at + 8])
    patched = bytearray(avi + foreign)
    patched[movi_at + 4 : movi_at + 8] = struct.pack("<I", movi_size + len(foreign))
    patched[4:8] = struct.pack("<I", struct.unpack("<I", avi[4:8])[0] + len(foreign))
    w, h, fn, fd, lumas = _parse_avi_mjpeg(bytes(patched))
    assert (w, h, fn, fd) == (16, 16, 10, 1)
    assert len(lumas) == 2 and all(l.shape == (16, 16) for l in lumas)


def test_jpeg_avi_goldens_have_rounding_margin():
    """Round-5 ADVICE #5: the pinned JPEG/AVI goldens assume numpy's matrix
    IDCT and the golden scripts' scalar direct-sum IDCT banker's-round
    identically; a pre-round value within float-noise of a .5 boundary is
    where a last-ulp BLAS-ordering change on a future numpy could flip one
    pixel and break a pinned hash despite correct code. Two-tier check over
    every committed fixture:

    - decoder rasters (jpeg_gray / jpeg_rgb — the real cross-implementation
      surface, numpy IDCT vs scalar direct sum): margin must stay > 1e-9
      (measured 1.5e-05 at pin time, ~9 orders above ulp noise);
    - the known boundary sites (the encoder quantizer whose output bytes
      both the engine and the golden scripts consume, and the dyadic-exact
      107.5 AVI lumas): their 64 rounding DECISIONS are pinned, so a future
      numpy that nudges one across .5 fails HERE with a regeneration hint
      instead of as a mysterious downstream golden mismatch."""
    import hashlib
    import json
    import os
    import sys

    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
    import make_avi_golden
    import make_jpeg_golden

    from cortex_spark.dataops import multimodal as mm

    mm._ROUND_MARGIN_TRACE = trace = []
    try:
        for i in range(64):  # every goldens/jpeg_features.json fixture
            mm._decode_jpeg(make_jpeg_golden.fixture(i))
        for i in range(32):  # every goldens/avi_frames.json fixture
            mm._parse_avi_mjpeg(make_avi_golden.fixture(i))
    finally:
        mm._ROUND_MARGIN_TRACE = None
    dec = [m for site, m, _ in trace if site in ("jpeg_gray", "jpeg_rgb")]
    assert dec and min(dec) > 1e-9, (
        f"decoder raster pre-round value within {min(dec)} of a .5 boundary: "
        "the numpy-IDCT-vs-scalar-IDCT bit-identity the goldens pin is no "
        "longer ulp-safe")
    decisions = sorted(
        (site, int(round(v * 2)), int(np.round(v)))
        for site, _, near in trace for v in near
    )
    sig = hashlib.md5(json.dumps(decisions).encode()).hexdigest()
    assert (len(decisions), sig) == (64, "71c3ad57209d516fb18b8095a52bb119"), (
        "a near-.5 rounding decision changed (numpy summation-order drift): "
        "regenerate the jpeg/avi goldens (scripts/make_*_golden.py) and "
        "re-pin this signature")
