"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video ride as `binary` columns with a `media_meta` struct.
The Spark-side plumbing — schema, partitioning, Arrow batch shapes, UDF
signatures over `mapInPandas` — is real and tested; the actual codec calls
are STUBBED (this container has no image/audio libraries): `decode_image`
parses a deterministic fake header (tests) and raises NotImplementedError
for real formats, so swapping in PIL/ffmpeg per executor is a local change
inside `_decode_one`.

Fake format (tests/bench): b"FAKEIMG!" + width:u32be + height:u32be +
channels:u8 + payload. Feature extraction = per-channel mean of payload
bytes reshaped (h, w, c) — deterministic, numpy-only.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MAGIC = b"FAKEIMG!"

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("channels", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def encode_fake_image(width: int, height: int, channels: int = 3, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 256, size=width * height * channels, dtype=np.uint8).tobytes()
    return MAGIC + struct.pack(">IIB", width, height, channels) + payload


def _decode_one(content: bytes) -> tuple[int, int, int, np.ndarray]:
    if content[:8] == MAGIC:
        w, h, c = struct.unpack(">IIB", content[8:17])
        arr = np.frombuffer(content[17 : 17 + w * h * c], dtype=np.uint8).reshape(h, w, c)
        return w, h, c, arr
    # real codecs live here (PIL.Image.open(io.BytesIO(content)) etc.)
    raise NotImplementedError("real image codecs not available in this environment")


def decode_and_featurize(media: DataFrame, resize_to: tuple[int, int] | None = None) -> DataFrame:
    """mapInPandas decode → per-channel mean features; errors quarantined
    into the `error` column instead of failing the batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    w, h, c, arr = _decode_one(bytes(content))
                    if resize_to is not None:
                        tw, th = resize_to
                        xi = (np.arange(tw) * (w / tw)).astype(int)
                        yi = (np.arange(th) * (h / th)).astype(int)
                        arr = arr[yi][:, xi]  # nearest-neighbor resample
                        w, h = tw, th
                    feats = arr.reshape(-1, c).mean(axis=0) / 255.0
                    rows.append((mid, w, h, c, [float(x) for x in feats], None))
                except NotImplementedError as e:
                    rows.append((mid, None, None, None, None, str(e)))
                except Exception as e:  # malformed payload → quarantine
                    rows.append((mid, None, None, None, None, f"decode_error: {e}"))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "channels", "features", "error"])

    return media.select("media_id", "content").mapInPandas(run, schema=DECODED_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_idx, ts_ms) rows
    from duration metadata (decode stubbed, schedule real)."""
    from pyspark.sql import functions as F

    n = (F.col("media_meta.duration_ms") / every_ms).cast("int")
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.posexplode(F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))).alias("frame_idx", "_"))
        .select("media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("ts_ms"))
    )
