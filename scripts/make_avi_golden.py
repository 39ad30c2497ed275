"""Regenerate goldens/avi_frames.json.

Independent pure-Python oracle for q_avi_frames: re-parses the fixture
MJPEG AVIs with its OWN minimal RIFF chunk walk (no reuse of the engine's
_parse_avi_mjpeg) and re-decodes every frame with make_jpeg_golden.py's
independent scalar T.81 decoder, then replays the documented frame-
sampling schedule (one frame per every_ms of stream time) and the luma
contract (gray channel-0, else JFIF Y with banker's rounding).

Usage: python scripts/make_avi_golden.py
"""

from __future__ import annotations

import json
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from make_jpeg_golden import decode_jpeg_independent  # noqa: E402

from cortex_spark.dataops.multimodal import encode_avi_mjpeg  # noqa: E402


def parse_avi_independent(b: bytes):
    assert b[:4] == b"RIFF" and b[8:12] == b"AVI "
    frames = []
    rate = [25, 1]

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = b[pos : pos + 4]
            (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
            if fourcc == b"LIST":
                walk(pos + 12, pos + 8 + size)
            elif fourcc == b"strh" and b[pos + 8 : pos + 12] == b"vids":
                scale, r = struct.unpack("<II", b[pos + 28 : pos + 36])
                rate[0], rate[1] = r, max(scale, 1)
            elif fourcc[2:4] in (b"dc", b"db"):
                frames.append(b[pos + 8 : pos + 8 + size])
            pos += 8 + size + (size & 1)

    walk(12, 8 + struct.unpack("<I", b[4:8])[0])
    return rate[0], rate[1], frames


def luma_of(frame: bytes):
    w, h, ch, px = decode_jpeg_independent(frame)
    if ch == 1:
        vals = [p[0] for p in px]
    else:
        vals = []
        for r, g, bl in px:
            y = round(0.299 * r + 0.587 * g + 0.114 * bl)
            vals.append(0 if y < 0 else (255 if y > 255 else y))
    return w, h, sum(vals) / len(vals) / 255.0


def fixture(i: int) -> bytes:
    return encode_avi_mjpeg(16, 11, n_frames=2 + i % 3, fps=10, seed=i,
                            gray=(i % 2 == 1))


def main() -> None:
    every_ms = 100
    out_rows = []
    for i in range(32):
        num, den, frames = parse_avi_independent(fixture(i))
        fps = num / den
        dur_ms = len(frames) * 1000.0 / fps
        lumas = [luma_of(f) for f in frames]
        ts = 0
        while ts < dur_ms:
            idx = int(ts * fps // 1000)
            w, h, lm = lumas[idx]
            out_rows.append([f"av{i}", idx, ts, w, h, round(lm, 6)])
            ts += every_ms
    out_rows.sort()
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "goldens",
        "avi_frames.json",
    )
    with open(out, "w") as fh:
        json.dump({"rows": out_rows}, fh, indent=0)
    print(f"wrote {out} ({len(out_rows)} rows)")


if __name__ == "__main__":
    main()
