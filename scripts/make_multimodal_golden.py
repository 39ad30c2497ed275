"""Regenerate goldens/multimodal_decode.json.

Independent pure-Python oracle for q_multimodal_decode: re-parses the
fixture bytes with its OWN minimal netpbm/FAKEIMG readers (not the
engine's _parse_pnm/_decode_one), applies the same documented
nearest-neighbor resample + channel-mean contract, and freezes the result.
The fixture is sf-independent (media content depends only on vec_id seeds;
vec_id < 64 exists at every sf), so one golden serves all scales.

Usage: python scripts/make_multimodal_golden.py
"""

from __future__ import annotations

import json
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cortex_spark.dataops.multimodal import encode_fake_image, encode_ppm  # noqa: E402

RESIZE = (4, 4)


def parse_ppm_independent(b: bytes):
    """Minimal binary netpbm reader written against the spec, not the
    engine: magic, whitespace/comment-delimited w/h/maxval, raster."""
    assert b[:2] in (b"P6", b"P5")
    c = 3 if b[:2] == b"P6" else 1
    pos, tokens = 2, []
    while len(tokens) < 3:
        ch = b[pos]
        if ch == ord("#"):
            pos = b.index(b"\n", pos) + 1
        elif chr(ch).isspace():
            pos += 1
        else:
            end = pos
            while not chr(b[end]).isspace():
                end += 1
            tokens.append(int(b[pos:end]))
            pos = end
    w, h, maxval = tokens
    assert maxval == 255
    pos += 1
    arr = np.frombuffer(b[pos : pos + w * h * c], dtype=np.uint8).reshape(h, w, c)
    return w, h, c, arr


def parse_fake_independent(b: bytes):
    assert b[:8] == b"FAKEIMG!"
    w, h, c = struct.unpack(">IIB", b[8:17])
    arr = np.frombuffer(b[17 : 17 + w * h * c], dtype=np.uint8).reshape(h, w, c)
    return w, h, c, arr


def main() -> None:
    rows = []
    tw, th = RESIZE
    for i in range(64):
        content = encode_ppm(8, 8, seed=i) if i % 2 == 0 else encode_fake_image(8, 8, 3, seed=i)
        w, h, c, arr = (
            parse_ppm_independent(content) if i % 2 == 0 else parse_fake_independent(content)
        )
        xi = (np.arange(tw) * (w / tw)).astype(int)
        yi = (np.arange(th) * (h / th)).astype(int)
        arr = arr[yi][:, xi]
        f0 = round(float(arr.reshape(-1, c).mean(axis=0)[0] / 255.0), 6)
        rows.append([f"m{i}", tw, th, c, f0])
    rows.sort()
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "goldens", "multimodal_decode.json")
    with open(out, "w") as fh:
        json.dump({"rows": rows}, fh, indent=0)
    print(f"wrote {out} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
