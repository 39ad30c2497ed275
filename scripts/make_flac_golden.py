"""Regenerate goldens/flac_features.json.

Ground-truth oracle for q_flac_features: FLAC is LOSSLESS, so the decoder
must reproduce the fixture's SOURCE signal bit-exactly — the golden is
computed from that source directly (seeded generator replayed, features
re-derived with scalar Python math, no reuse of the engine's
_audio_features / _decode_flac). Any decode defect — prediction,
rice, stereo decorrelation, frame walk — lands on different samples and
breaks the hash.

Usage: python scripts/make_flac_golden.py
"""

from __future__ import annotations

import json
import math
import os
import struct
import sys

import numpy as np  # fixture signal generation only (seeded rng)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def source_pcm(n: int, rate: int, channels: int, seed: int):
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64)
    sig = np.zeros((n, channels))
    for c in range(channels):
        freq = 200.0 + 40.0 * c + (seed % 7) * 15.0
        w = 9000 * np.sin(2 * np.pi * freq * t / rate)
        drift = np.cumsum(rng.integers(-60, 61, size=n))
        sig[:, c] = np.clip(w + drift, -30000, 30000)
    return sig.astype(np.int64)


def fixture_params(i: int) -> tuple[int, int, int, str]:
    stereo = ["independent", "ls", "rs", "ms"][i % 4]
    channels = 1 if i % 5 == 0 else 2
    if channels == 1:
        stereo = "independent"
    return 900 + (i % 3) * 700, 8000, channels, stereo


def main() -> None:
    out_rows = []
    for i in range(48):
        n, rate, channels, _stereo = fixture_params(i)
        pcm = source_pcm(n, rate, channels, i)
        mono = [
            sum(int(pcm[f, c]) / 32768.0 for c in range(channels)) / channels
            for f in range(n)
        ]
        rms = math.sqrt(sum(v * v for v in mono) / n)
        signs = [math.copysign(1, v) < 0 for v in mono]
        zcr = sum(a != b for a, b in zip(signs[1:], signs[:-1])) / (n - 1)
        dur = int(round(n * 1000.0 / rate))
        # float32 quantization happens only via round-to-6 DOUBLE compare
        out_rows.append([f"f{i}", channels, rate, dur, round(rms, 6), round(zcr, 6)])
    out_rows.sort()
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "goldens",
        "flac_features.json",
    )
    with open(out, "w") as fh:
        json.dump({"rows": out_rows}, fh, indent=0)
    print(f"wrote {out} ({len(out_rows)} rows)")


if __name__ == "__main__":
    main()
