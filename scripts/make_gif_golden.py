"""Regenerate goldens/gif_features.json.

Independent pure-Python oracle for q_gif_features: re-decodes the fixture
GIFs with its OWN scalar decoder written directly against the GIF89a spec
(logical screen descriptor, color tables, extension sub-block skipping,
appendix-F LZW with per-bit LSB-first reads, interlace pass layout) — no
numpy, no reuse of the engine's _decode_gif/_gif_lzw_decode — then applies
the documented channel-mean feature contract and freezes the result.
The fixture is sf-independent (content depends only on vec_id seeds;
vec_id < 64 exists at every sf), so one golden serves all scales.

Usage: python scripts/make_gif_golden.py
"""

from __future__ import annotations

import json
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cortex_spark.dataops.multimodal import encode_gif  # noqa: E402


def _lzw_decode_independent(data: bytes, min_code: int, expected: int) -> list[int]:
    """Scalar GIF LZW: one-bit-at-a-time reads, dict table of index lists."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    table = {i: [i] for i in range(clear)}
    nxt = eoi + 1
    out: list[int] = []
    prev: list[int] | None = None
    bit = 0
    while True:
        code = 0
        for k in range(width):
            byte = data[(bit + k) // 8]
            code |= ((byte >> ((bit + k) % 8)) & 1) << k
        bit += width
        if code == clear:
            table = {i: [i] for i in range(clear)}
            nxt, width, prev = eoi + 1, min_code + 1, None
            continue
        if code == eoi:
            return out
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        else:
            assert code == nxt, "desync"
            entry = prev + [prev[0]]
        out.extend(entry)
        if prev is not None and nxt < 4096:
            table[nxt] = prev + [entry[0]]
            nxt += 1
            if nxt == (1 << width) and width < 12:
                width += 1
        prev = entry
        assert len(out) <= expected


def decode_gif_independent(b: bytes):
    assert b[:6] in (b"GIF87a", b"GIF89a")
    sw, sh, packed, _bg, _asp = struct.unpack("<HHBBB", b[6:13])
    pos = 13
    pal = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        pal = [tuple(b[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
        pos += 3 * n
    while True:
        tag = b[pos]
        pos += 1
        if tag == 0x21:  # extension
            pos += 1
            while b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
            continue
        assert tag == 0x2C, hex(tag)
        left, top, iw, ih, ipk = struct.unpack("<HHHHB", b[pos : pos + 9])
        assert (left, top, iw, ih) == (0, 0, sw, sh), "fixtures are full-screen"
        pos += 9
        if ipk & 0x80:
            n = 2 << (ipk & 7)
            pal = [tuple(b[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
            pos += 3 * n
        min_code = b[pos]
        pos += 1
        data = bytearray()
        while b[pos] != 0:
            data += b[pos + 1 : pos + 1 + b[pos]]
            pos += 1 + b[pos]
        idx = _lzw_decode_independent(bytes(data), min_code, iw * ih)
        assert len(idx) == iw * ih
        rows = [idx[y * iw : (y + 1) * iw] for y in range(ih)]
        if ipk & 0x40:  # interlaced: stored row k belongs at display row order[k]
            order = []
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                order.extend(range(start, ih, step))
            disp = [None] * ih
            for k, y in enumerate(order):
                disp[y] = rows[k]
            rows = disp
        px = [pal[i] for row in rows for i in row]
        return iw, ih, 3, px


def main() -> None:
    out_rows = []
    for i in range(64):
        content = encode_gif(
            10, 6, seed=i, interlace=(i % 2 == 1), n_colors=16 if i % 3 == 0 else 256
        )
        w, h, ch, px = decode_gif_independent(content)
        ch0 = [p[0] for p in px]
        # the engine stores features as array<float> (float32) before the
        # round-to-6 — quantize identically or boundary values drift
        f32 = struct.unpack("f", struct.pack("f", sum(ch0) / len(ch0) / 255.0))[0]
        out_rows.append([f"g{i}", w, h, ch, round(f32, 6)])
    out_rows.sort()
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "goldens",
        "gif_features.json",
    )
    with open(out, "w") as fh:
        json.dump({"rows": out_rows}, fh, indent=0)
    print(f"wrote {out} ({len(out_rows)} rows)")


if __name__ == "__main__":
    main()
