"""Regenerate goldens/g711_features.json.

Independent pure-Python oracle for q_g711_features: rebuilds the G.711
μ-law/A-law expansion tables SCALAR-wise from the ITU formulas (no reuse
of the engine's vectorized _g711_tables), expands the fixture byte
streams, and recomputes the audio feature contract (downmix mean, RMS,
signbit zero-crossing rate, rounded duration).

Usage: python scripts/make_g711_golden.py
"""

from __future__ import annotations

import json
import math
import os
import struct
import sys

import numpy as np  # fixture byte streams only (seeded rng), not the decode

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ulaw2linear(code: int) -> int:
    u = ~code & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


def alaw2linear(code: int) -> int:
    a = code ^ 0x55
    seg = (a & 0x70) >> 4
    t = ((a & 0x0F) << 4) + (8 if seg == 0 else 0x108)
    if seg > 1:
        t <<= seg - 1
    return t if (a & 0x80) else -t


def fixture_params(i: int) -> tuple[int, int, str, int]:
    return 2000 + (i % 4) * 500, 8000, ("mu" if i % 2 == 0 else "a"), 1 + i % 2


def main() -> None:
    out_rows = []
    for i in range(48):
        n_samples, rate, law, nch = fixture_params(i)
        rng = np.random.default_rng(i)
        codes = rng.integers(0, 256, size=n_samples * nch, dtype=np.uint8)
        table = ulaw2linear if law == "mu" else alaw2linear
        lin = [table(int(c)) / 32768.0 for c in codes]
        mono = [
            sum(lin[f * nch : (f + 1) * nch]) / nch for f in range(n_samples)
        ]
        rms = math.sqrt(sum(v * v for v in mono) / len(mono))
        # signbit-based ZCR, exactly like _audio_features (0.0 is positive;
        # exact-zero samples exist in G.711 so the convention matters)
        signs = [math.copysign(1, v) < 0 for v in mono]
        zcr = sum(a != b for a, b in zip(signs[1:], signs[:-1])) / (len(mono) - 1)
        dur = int(round(n_samples * 1000.0 / rate))
        out_rows.append([f"u{i}", nch, rate, dur, round(rms, 6), round(zcr, 6)])
    out_rows.sort()
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "goldens",
        "g711_features.json",
    )
    with open(out, "w") as fh:
        json.dump({"rows": out_rows}, fh, indent=0)
    print(f"wrote {out} ({len(out_rows)} rows)")


if __name__ == "__main__":
    main()
