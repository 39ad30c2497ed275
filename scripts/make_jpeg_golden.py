"""Regenerate goldens/jpeg_features.json.

Independent pure-Python oracle for q_jpeg_features: re-decodes the fixture
JPEGs with its OWN scalar baseline decoder written directly against
ITU T.81 (marker walk, DQT/DHT table parse, F.2 entropy decoding with
EXTEND, A.3.3 direct-sum IDCT, replication upsampling, JFIF YCbCr→RGB) —
no numpy, no reuse of the engine's _decode_jpeg — then applies the
documented channel-mean feature contract and freezes the result.

JPEG decode is implementation-defined at the pixel level (IDCT and
upsampling choices differ across conforming decoders), so the engine
query pins prefer_stdlib=True and this oracle implements the SAME
contract (float64 orthonormal IDCT, nearest-replication upsampling,
banker's-rounding clamp) with independent code.

Usage: python scripts/make_jpeg_golden.py
"""

from __future__ import annotations

import json
import math
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cortex_spark.dataops.multimodal import encode_jpeg  # noqa: E402

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
# cos table shared by all blocks: COS[u][x] = C(u) * cos((2x+1)u*pi/16)
_COS = [
    [
        (1 / math.sqrt(2) if u == 0 else 1.0) * math.cos((2 * x + 1) * u * math.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
]


class Bits:
    def __init__(self, data: bytes, pos: int) -> None:
        self.d, self.p, self.acc, self.n = data, pos, 0, 0

    def bit(self) -> int:
        if self.n == 0:
            b = self.d[self.p]
            if b == 0xFF:
                nxt = self.d[self.p + 1]
                if nxt != 0x00:
                    raise ValueError(f"marker 0x{nxt:02x} in entropy data")
                self.p += 2
            else:
                self.p += 1
            self.acc, self.n = b, 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def take(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        self.acc = self.n = 0
        while not (self.d[self.p] == 0xFF and 0xD0 <= self.d[self.p + 1] <= 0xD7):
            self.p += 1
        self.p += 2


def decode_jpeg_independent(b: bytes):
    assert b[:2] == b"\xff\xd8"
    pos = 2
    qts: dict[int, list[int]] = {}
    hts: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    dri = 0
    while True:
        assert b[pos] == 0xFF, "marker alignment"
        mk = b[pos + 1]
        pos += 2
        if mk in (0x01,) or 0xD0 <= mk <= 0xD9:
            if mk == 0xD9:
                raise ValueError("no scan")
            continue
        (ln,) = struct.unpack(">H", b[pos : pos + 2])
        body = b[pos + 2 : pos + ln]
        if mk == 0xDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                p += 1
                assert pq == 0
                zz = list(body[p : p + 64])
                p += 64
                q = [0] * 64
                for k in range(64):
                    q[ZIGZAG[k]] = zz[k]
                qts[tq] = q
        elif mk == 0xC4:
            p = 0
            while p < len(body):
                tcth = body[p]
                bits = list(body[p + 1 : p + 17])
                vals = list(body[p + 17 : p + 17 + sum(bits)])
                p += 17 + sum(bits)
                tab: dict[tuple[int, int], int] = {}
                code, k = 0, 0
                for l in range(1, 17):
                    for _ in range(bits[l - 1]):
                        tab[(l, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                hts[(tcth >> 4, tcth & 15)] = tab
        elif mk in (0xC0, 0xC1):
            prec, hh, ww, nc = struct.unpack(">BHHB", body[:6])
            assert prec == 8
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append([cid, hv >> 4, hv & 15, tq])
            frame = (ww, hh, comps)
        elif mk == 0xDD:
            (dri,) = struct.unpack(">H", body[:2])
        elif mk == 0xDA:
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i : 3 + 2 * i]
                c = next(c for c in frame[2] if c[0] == cs)
                scan.append((c[1], c[2], c[3], tdta >> 4, tdta & 15))
            pos += ln
            return _scan(b, pos, frame, scan, qts, hts, dri)
        pos += ln


def _huff(bits: Bits, tab) -> int:
    code = 0
    for l in range(1, 17):
        code = (code << 1) | bits.bit()
        if (l, code) in tab:
            return tab[(l, code)]
    raise ValueError("bad huffman code")


def _extend(v: int, s: int) -> int:
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _scan(b, pos, frame, scan, qts, hts, dri):
    w, h, _ = frame
    hmax = max(c[0] for c in scan)
    vmax = max(c[1] for c in scan)
    mx_n = (w + 8 * hmax - 1) // (8 * hmax)
    my_n = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        [[0.0] * (mx_n * 8 * c[0]) for _ in range(my_n * 8 * c[1])] for c in scan
    ]
    bits = Bits(b, pos)
    preds = [0] * len(scan)
    mcu = 0
    for my in range(my_n):
        for mx in range(mx_n):
            if dri and mcu and mcu % dri == 0:
                bits.restart()
                preds = [0] * len(scan)
            mcu += 1
            for ci, (ch, cv, tq, td, ta) in enumerate(scan):
                for by in range(cv):
                    for bx in range(ch):
                        zz = [0] * 64
                        s = _huff(bits, hts[(0, td)])
                        preds[ci] += _extend(bits.take(s), s)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _huff(bits, hts[(1, ta)])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break
                            k += r
                            zz[k] = _extend(bits.take(s), s)
                            k += 1
                        q = qts[tq]
                        coef = [0.0] * 64
                        for k in range(64):
                            coef[ZIGZAG[k]] = zz[k] * q[ZIGZAG[k]]
                        # direct-sum IDCT (T.81 A.3.3): f(x,y) =
                        # 1/4 ΣΣ C(u)C(v) F(u,v) cos(..x..) cos(..y..)
                        for y in range(8):
                            for x in range(8):
                                acc = 0.0
                                for v in range(8):
                                    for u in range(8):
                                        fv = coef[v * 8 + u]
                                        if fv:
                                            acc += _COS[v][y] * _COS[u][x] * fv
                                planes[ci][(my * cv + by) * 8 + y][
                                    (mx * ch + bx) * 8 + x
                                ] = acc / 4.0 + 128.0
    comps = []
    for ci, (ch, cv, _tq, _td, _ta) in enumerate(scan):
        p = planes[ci]
        ry, rx = vmax // cv, hmax // ch
        comps.append(
            [[p[y // ry][x // rx] for x in range(w)] for y in range(h)]
        )

    def clamp(v: float) -> int:
        # banker's rounding to match the engine's np.round, then clamp.
        # Track the distance of every pre-round value from a .5 boundary:
        # the pinned golden requires the engine's BLAS-ordered float64 IDCT
        # and this scalar direct-sum IDCT to round identically, which is
        # only future-proof if no value sits within ulp-noise of a tie
        # (main() asserts the corpus-wide margin > 1e-6).
        import math
        frac_dist = abs(v - math.floor(v) - 0.5)
        if frac_dist < _ROUND_MARGIN[0]:
            _ROUND_MARGIN[0] = frac_dist
        r = round(v)
        return 0 if r < 0 else (255 if r > 255 else r)

    if len(comps) == 1:
        px = [[(clamp(comps[0][y][x]),) for x in range(w)] for y in range(h)]
        return w, h, 1, [p for row in px for p in row]
    out = []
    for y in range(h):
        for x in range(w):
            yy = comps[0][y][x]
            cb = comps[1][y][x] - 128.0
            cr = comps[2][y][x] - 128.0
            out.append(
                (
                    clamp(yy + 1.402 * cr),
                    clamp(yy - 0.344136 * cb - 0.714136 * cr),
                    clamp(yy + 1.772 * cb),
                )
            )
    return w, h, 3, out


_ROUND_MARGIN = [float("inf")]  # min |pre-round − nearest .5| across a run


def fixture(i: int) -> bytes:
    return encode_jpeg(
        16,
        11,
        channels=1 if i % 4 == 3 else 3,
        seed=i,
        subsample="420" if i % 2 == 1 else "444",
        restart_interval=2 if i % 5 == 0 else 0,
    )


def main() -> None:
    out_rows = []
    for i in range(64):
        w, h, ch, px = decode_jpeg_independent(fixture(i))
        ch0 = [p[0] for p in px]
        # the engine stores features as array<float> (float32) before the
        # round-to-6 — quantize identically or boundary values drift
        f32 = struct.unpack("f", struct.pack("f", sum(ch0) / len(ch0) / 255.0))[0]
        out_rows.append([f"j{i}", w, h, ch, round(f32, 6)])
    out_rows.sort()
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "goldens",
        "jpeg_features.json",
    )
    # banker's-rounding safety: no pre-round pixel value may sit within
    # ulp-noise of a .5 tie, or a future numpy/BLAS last-ulp change could
    # flip one pixel and break the pinned hash despite correct code
    print(f"min pre-round margin from .5 across 64 fixtures: {_ROUND_MARGIN[0]:.3e}")
    assert _ROUND_MARGIN[0] > 1e-6, (
        f"golden corpus has a rounding-tie hazard (margin {_ROUND_MARGIN[0]:.3e}); "
        "regenerate fixtures with a different seed"
    )
    with open(out, "w") as fh:
        json.dump({"rows": out_rows}, fh, indent=0)
    print(f"wrote {out} ({len(out_rows)} rows)")


if __name__ == "__main__":
    main()
