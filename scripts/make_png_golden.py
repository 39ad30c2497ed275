"""Regenerate goldens/png_features.json.

Independent pure-Python oracle for q_png_features: re-decodes the fixture
PNGs with its OWN scalar decoder written directly against the PNG spec
(RFC 2083 §6: chunk layout, zlib IDAT, the five scanline filters) — no
numpy vectorization, no reuse of the engine's _decode_png — then applies
the documented channel-mean feature contract and freezes the result.
The fixture is sf-independent (content depends only on vec_id seeds;
vec_id < 64 exists at every sf), so one golden serves all scales.

Usage: python scripts/make_png_golden.py
"""

from __future__ import annotations

import json
import os
import struct
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cortex_spark.dataops.multimodal import encode_png  # noqa: E402


def decode_png_independent(b: bytes):
    """Scalar PNG decode per the spec: walk chunks, inflate IDAT, unfilter
    each scanline byte-by-byte with unsigned-byte arithmetic."""
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat = 8, b""
    w = h = depth = ctype = interlace = None
    while pos < len(b):
        (ln,) = struct.unpack(">I", b[pos : pos + 4])
        tag = b[pos + 4 : pos + 8]
        body = b[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    assert depth == 8 and interlace == 0
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    stride = w * ch
    data = zlib.decompress(idat)
    assert len(data) == h * (stride + 1)
    rows: list[list[int]] = []
    for y in range(h):
        ft = data[y * (stride + 1)]
        filt = data[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        prior = rows[y - 1] if y else [0] * stride
        rec: list[int] = []
        for x in range(stride):
            a = rec[x - ch] if x >= ch else 0
            bb = prior[x]
            c = prior[x - ch] if x >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = bb
            elif ft == 3:
                pred = (a + bb) // 2
            elif ft == 4:
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (bb if pb <= pc else c)
            else:
                raise AssertionError(f"bad filter {ft}")
            rec.append((filt[x] + pred) % 256)
        rows.append(rec)
    return w, h, ch, rows


def main() -> None:
    out_rows = []
    for i in range(64):
        channels = 3 if i % 2 == 0 else 1
        content = encode_png(8, 8, channels, seed=i)
        w, h, ch, rows = decode_png_independent(content)
        # channel-mean feature (index 0), same contract as the engine
        vals = [px for row in rows for px in row]
        ch0 = [vals[j] for j in range(0, len(vals), ch)]
        # the engine stores features as array<float> (float32) before the
        # round-to-6 — quantize identically or boundary values drift
        f32 = struct.unpack("f", struct.pack("f", sum(ch0) / len(ch0) / 255.0))[0]
        f0 = round(f32, 6)
        out_rows.append([f"p{i}", w, h, ch, f0])
    out_rows.sort()
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "goldens",
        "png_features.json",
    )
    with open(out, "w") as fh:
        json.dump({"rows": out_rows}, fh, indent=0)
    print(f"wrote {out} ({len(out_rows)} rows)")


if __name__ == "__main__":
    main()
