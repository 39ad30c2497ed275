"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video ride as `binary` columns with a `media_meta` struct.
The Spark-side plumbing — schema, partitioning, Arrow batch shapes, UDF
signatures over `mapInPandas` — is real and tested. Codecs:

- REAL, dependency-free: PPM/PGM images (P6/P5 binary netpbm, numpy
  parse incl. comment handling), 8-bit PNG (stdlib zlib + the five
  scanline unfilters, _decode_png), GIF87a/89a (appendix-F LZW with
  9→12-bit width growth, interlace, color tables, _decode_gif),
  baseline JPEG (T.81 SOF0/SOF1: DQT/DHT parse, Huffman entropy decode,
  float64 IDCT, 4:4:4/4:2:2/4:2:0, restart intervals, _decode_jpeg),
  MJPEG AVI video (RIFF chunk walk + per-frame JPEG decode,
  _parse_avi_mjpeg), PCM WAV audio (stdlib `wave`), G.711 μ-law/A-law
  WAV (ITU expansion tables, _decode_wav_g711), and 16-bit FLAC
  (fixed/LPC prediction, rice partitions, mid/side stereo,
  _decode_flac) — genuine decode → feature-extract paths with no
  external libraries. JPEG decode is
  implementation-defined at the pixel level, so oracle fixtures pin
  prefer_stdlib=True; production keeps PIL priority for speed.
- OPTIONAL-DEPENDENCY SEAM: compressed formats light up automatically
  when the decoding library is importable on the executors — PIL for
  JPEG/PNG/WebP images, soundfile for FLAC/OGG/MP3 audio, PyAV for
  MP4/MKV video. Where the library is absent (this container), the same
  code path raises NotImplementedError and the row quarantines into the
  `error` column — identical plumbing either way, both branches tested
  (the real-codec tests are skipif-marked on the import).
- Fake format (tests/bench): b"FAKEIMG!" + width:u32be + height:u32be +
  channels:u8 + payload.

Feature extraction: images → per-channel mean of the (h, w, c) raster;
audio → duration/RMS/zero-crossing-rate. All deterministic, numpy-only.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MAGIC = b"FAKEIMG!"

# Test seam: when set to a list, every banker's-rounding site in the codec
# paths appends (site, min distance to a .5 boundary, near-boundary values)
# before rounding. The pinned JPEG/AVI goldens assume numpy's matrix IDCT
# and the golden scripts' scalar direct-sum IDCT round identically; a
# pre-round value within float-noise of a half-integer is where a last-ulp
# BLAS-ordering difference on a future numpy could flip one pixel and break
# a pinned hash despite correct code. tests/test_multimodal.py asserts the
# decoder rasters keep a comfortable margin and pins the rounding decisions
# of the known boundary sites, so any such flip fails with a diagnosis
# instead of a mysterious golden mismatch.
_ROUND_MARGIN_TRACE: list | None = None
_ROUND_BOUNDARY_EPS = 1e-9


def _trace_round_margin(x, site: str) -> None:
    if _ROUND_MARGIN_TRACE is not None:
        arr = np.asarray(x, dtype=np.float64).reshape(-1)
        if arr.size:
            frac = np.abs(arr - np.floor(arr) - 0.5)
            near = arr[frac < _ROUND_BOUNDARY_EPS]
            _ROUND_MARGIN_TRACE.append((site, float(frac.min()), near.tolist()))

# Optional compressed-codec backends: resolved once per process (executors
# re-import this module inside the serialized UDF closure, so availability
# is evaluated where the decode actually runs).
try:  # images: JPEG/PNG/WebP/...
    from PIL import Image as _PIL_Image
except ImportError:
    _PIL_Image = None
try:  # audio: FLAC/OGG/MP3 (libsndfile-backed)
    import soundfile as _soundfile
except ImportError:
    _soundfile = None
try:  # video: MP4/MKV/... (ffmpeg-backed)
    import av as _pyav
except ImportError:
    _pyav = None

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


def encode_ppm(width: int, height: int, seed: int = 0, gray: bool = False) -> bytes:
    """Valid binary netpbm bytes (P6 RGB / P5 gray) for tests/bench."""
    rng = np.random.default_rng(seed)
    c = 1 if gray else 3
    payload = rng.integers(0, 256, size=width * height * c, dtype=np.uint8).tobytes()
    magic = b"P5" if gray else b"P6"
    return magic + b"\n# synthetic\n" + f"{width} {height}\n255\n".encode() + payload


def _parse_pnm(content: bytes) -> tuple[int, int, int, np.ndarray]:
    """Binary netpbm decode (P6 RGB / P5 grayscale, maxval ≤ 255) — a real
    image format, parsed with numpy only. Handles '#' comment lines per
    the netpbm spec."""
    magic = content[:2]
    channels = {b"P6": 3, b"P5": 1}[magic]
    n = len(content)
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= n:
            raise ValueError("truncated netpbm header")
        ch = content[pos : pos + 1]
        if ch == b"#":
            pos = content.index(b"\n", pos) + 1
        elif ch.isspace():
            pos += 1
        else:
            end = pos
            while end < n and not content[end : end + 1].isspace():
                end += 1
            if end == n:
                raise ValueError("truncated netpbm header")
            tokens.append(int(content[pos:end]))
            pos = end
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    pos += 1  # single whitespace byte after maxval, then the raster
    raster = np.frombuffer(content[pos : pos + w * h * channels], dtype=np.uint8)
    return w, h, channels, raster.reshape(h, w, channels)


PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 3, 4: 2, 6: 4}  # color type → channels


def encode_png(
    width: int, height: int, channels: int = 3, seed: int = 0, filters: list[int] | None = None
) -> bytes:
    """Deterministic, spec-valid PNG bytes (8-bit gray/gray-alpha/RGB/RGBA)
    for tests and goldens. `filters` picks the per-scanline filter type
    (default cycles 0..4 so every unfilter branch gets exercised); the
    payload raster is seed-derived so fixtures are reproducible."""
    import zlib

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    rng = np.random.default_rng(seed)
    raw = rng.integers(0, 256, size=(height, width * channels), dtype=np.uint8)
    bpp = channels
    lines = []
    for y in range(height):
        ft = filters[y % len(filters)] if filters else y % 5
        row = raw[y].astype(np.int16)
        prior = raw[y - 1].astype(np.int16) if y else np.zeros_like(row)
        left = np.concatenate([np.zeros(bpp, np.int16), row[:-bpp]]) if len(row) > bpp else np.zeros_like(row)
        up_left = (
            np.concatenate([np.zeros(bpp, np.int16), prior[:-bpp]]) if len(row) > bpp else np.zeros_like(row)
        )
        if ft == 0:
            enc = row
        elif ft == 1:
            enc = row - left
        elif ft == 2:
            enc = row - prior
        elif ft == 3:
            enc = row - (left + prior) // 2
        else:  # Paeth
            p = left + prior - up_left
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - up_left)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, up_left))
            enc = row - pred
        lines.append(bytes([ft]) + (enc % 256).astype(np.uint8).tobytes())

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 9)
    return PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def _decode_png(content: bytes) -> tuple[int, int, int, np.ndarray]:
    """Stdlib-only PNG decode (zlib inflate + per-scanline unfilter): 8-bit
    non-interlaced gray / gray-alpha / RGB / RGBA / palette. The correctness
    fallback when PIL is absent — PIL keeps priority in _decode_one when
    importable. None/Sub/Up rows are vectorized (Sub is a per-channel
    prefix sum mod 256); Average/Paeth are sequential by definition."""
    import zlib

    pos = 8
    width = height = None
    bit_depth = color_type = interlace = 0
    idat, plte = [], None
    while pos + 8 <= len(content):
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        tag = content[pos + 4 : pos + 8]
        body = content[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length  # length + tag + body + crc
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if bit_depth != 8:
        raise NotImplementedError(f"{bit_depth}-bit PNG not supported (stdlib decoder)")
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNG not supported (stdlib decoder)")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"bad PNG color type {color_type}")
    ch = 1 if color_type == 3 else _PNG_CHANNELS[color_type]
    stride = width * ch
    data = zlib.decompress(b"".join(idat))
    if len(data) != height * (stride + 1):
        raise ValueError("PNG pixel data size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        ft = data[y * (stride + 1)]
        row = np.frombuffer(
            data, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ft == 0:
            rec = row
        elif ft == 1:  # Sub: prefix sum per channel offset, mod 256
            rec = row.reshape(-1, ch).cumsum(axis=0).reshape(-1)
        elif ft == 2:  # Up
            rec = row + prior
        elif ft in (3, 4):  # Average / Paeth: sequential in x
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = prior[x]
                # mod 256 per element: the predictor consumes RECONSTRUCTED
                # bytes, so the wrap must happen before the next pixel reads
                # this one (floor-average is not linear under mod)
                if ft == 3:
                    rec[x] = (row[x] + (a + b) // 2) % 256
                else:
                    c_ = int(prior[x - ch]) if x >= ch else 0
                    p = a + b - c_
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c_)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c_)
                    rec[x] = (row[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = rec % 256
    arr = out.reshape(height, width, ch)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        arr = plte[arr[:, :, 0]]
        ch = 3
    return width, height, ch, arr


GIF_SIGS = (b"GIF87a", b"GIF89a")
_GIF_MAX_CODE = 4096  # 12-bit ceiling (GIF89a spec, appendix F)


def _gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW (LSB-first bit packing, dynamic 9→12-bit codes,
    CLEAR-reset when the table fills). Width sync with the decoder: the
    decoder learns each table entry one code later than the encoder
    creates it, so the encoder widens only when the NEXT code to assign
    (not the one just assigned) would overflow the current width —
    i.e. after inserting, bump when next_code > (1 << width)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    roots = {bytes([i]): i for i in range(clear)}
    table = dict(roots)
    next_code = eoi + 1
    buf = bytearray()
    cur = nbits = 0

    def emit(code: int) -> None:
        nonlocal cur, nbits
        cur |= code << nbits
        nbits += width
        while nbits >= 8:
            buf.append(cur & 0xFF)
            cur >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for b_ in indices:
        wk = w + bytes([b_])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < _GIF_MAX_CODE:
            table[wk] = next_code
            next_code += 1
            if next_code > (1 << width) and width < 12:
                width += 1
        else:  # table full: reset (decoder mirrors on the CLEAR code)
            emit(clear)
            table = dict(roots)
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([b_])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        buf.append(cur & 0xFF)
    return bytes(buf)


def _gif_lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """Textbook GIF LZW decode: after appending an entry, widen when the
    table length reaches 1 << width; stop appending at 4096 until CLEAR."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    roots = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(roots)
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while True:
        if len(out) >= expected:
            # all pixels decoded: real-world encoders may rely on the
            # sub-block terminator and omit the explicit EOI code — treat
            # reaching the descriptor's pixel count as end-of-stream
            break
        if bitpos + width > total_bits:
            raise ValueError("truncated GIF LZW stream (no EOI)")
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = list(roots)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("GIF LZW: first code after clear is not a root")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
        else:
            raise ValueError("GIF LZW: code beyond table")
        out += entry
        if prev is not None and len(table) < _GIF_MAX_CODE:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) > expected:
            raise ValueError("GIF LZW output overruns the image descriptor size")
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start, step) rows


def _gif_interlace_order(height: int) -> list[int]:
    order: list[int] = []
    for start, step in _GIF_INTERLACE_PASSES:
        order.extend(range(start, height, step))
    return order


def encode_gif(
    width: int,
    height: int,
    seed: int = 0,
    interlace: bool = False,
    n_frames: int = 1,
    n_colors: int = 256,
) -> bytes:
    """Deterministic, spec-valid GIF89a bytes for tests and goldens:
    seed-derived global color table + indexed raster, real LZW stream,
    a Graphic Control Extension per frame (exercises extension skipping),
    optional interlace. Multi-frame output is a minimal animation whose
    frames all cover the full logical screen."""
    rng = np.random.default_rng(seed)
    gct_bits = max(1, (n_colors - 1).bit_length())
    n_pal = 1 << gct_bits
    palette = rng.integers(0, 256, size=(n_pal, 3), dtype=np.uint8)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | ((gct_bits - 1) & 7), 0, 0])  # GCT flag+size, bg 0, aspect 0
    out += palette.tobytes()
    min_code = max(2, gct_bits)
    for _f in range(n_frames):
        out += bytes([0x21, 0xF9, 4]) + struct.pack("<BHB", 0, 4, 0) + b"\x00"  # GCE
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
        out += bytes([0x40 if interlace else 0x00])  # no LCT
        idx = rng.integers(0, n_colors, size=(height, width), dtype=np.uint8)
        if interlace:
            idx = idx[_gif_interlace_order(height)]  # rows stored in pass order
        out.append(min_code)
        stream = _gif_lzw_encode(idx.tobytes(), min_code)
        for i in range(0, len(stream), 255):
            block = stream[i : i + 255]
            out.append(len(block))
            out += block
        out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def _decode_gif(content: bytes) -> tuple[int, int, int, np.ndarray]:
    """Stdlib-only GIF87a/89a decode (LZW + palette, first frame): global
    and local color tables, interlace row reordering, extension skipping;
    a frame smaller than the logical screen is pasted onto a background-
    color canvas. The correctness fallback when PIL is absent — PIL keeps
    priority in _decode_one when importable."""
    if content[:6] not in GIF_SIGS:
        raise ValueError("not a GIF")
    sw, sh, packed, bg, _aspect = struct.unpack("<HHBBB", content[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(content[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        if gct.shape[0] != n:
            raise ValueError("truncated GIF global color table")
        pos += 3 * n
    while pos < len(content):
        block = content[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(content) and content[pos] != 0:
                pos += 1 + content[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"bad GIF block 0x{block:02x}")
        left, top, iw, ih, ipacked = struct.unpack("<HHHHB", content[pos : pos + 9])
        pos += 9
        pal = gct
        if ipacked & 0x80:  # local color table overrides
            n = 2 << (ipacked & 7)
            pal = np.frombuffer(content[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image with no color table")
        if pos >= len(content):
            raise ValueError("truncated GIF image data")
        min_code = content[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"bad GIF LZW min code size {min_code}")
        parts = []
        while pos < len(content) and content[pos] != 0:
            ln = content[pos]
            parts.append(content[pos + 1 : pos + 1 + ln])
            if len(parts[-1]) < ln:
                raise ValueError("truncated GIF data sub-block")
            pos += 1 + ln
        if pos >= len(content):
            raise ValueError("GIF data sub-blocks missing terminator")
        pos += 1
        idx = np.frombuffer(
            _gif_lzw_decode(b"".join(parts), min_code, iw * ih), dtype=np.uint8
        )
        if idx.size != iw * ih:
            raise ValueError("GIF pixel data size mismatch")
        idx = idx.reshape(ih, iw)
        if ipacked & 0x40:  # interlaced: rows arrive in pass order
            deinterlaced = np.empty_like(idx)
            deinterlaced[_gif_interlace_order(ih)] = idx
            idx = deinterlaced
        if idx.max(initial=0) >= pal.shape[0]:
            raise ValueError("GIF index beyond palette")
        frame = pal[idx]  # (ih, iw, 3)
        if (left, top, iw, ih) == (0, 0, sw, sh):
            return sw, sh, 3, frame
        canvas = np.tile(pal[bg % pal.shape[0]], (sh, sw, 1))
        canvas[top : top + ih, left : left + iw] = frame[: sh - top, : sw - left]
        return sw, sh, 3, canvas
    raise ValueError("GIF contains no image frame")


# ── Baseline JPEG (ITU T.81): dependency-free encoder fixture + decoder ──
# Public-spec tables (Annex K): sample quantization matrices and the
# typical Huffman tables. The encoder EMBEDS its tables in DQT/DHT
# segments, so decode correctness never depends on recalling Annex K
# exactly — any conforming decoder reads them back from the stream.

_JPEG_QUANT_LUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)
_JPEG_QUANT_CHROM = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

_JPEG_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_JPEG_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_JPEG_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [int(h, 16) for h in (
        "01 02 03 00 04 11 05 12 21 31 41 06 13 51 61 07 22 71 14 32 81 91 a1 08"
        " 23 42 b1 c1 15 52 d1 f0 24 33 62 72 82 09 0a 16 17 18 19 1a 25 26 27 28"
        " 29 2a 34 35 36 37 38 39 3a 43 44 45 46 47 48 49 4a 53 54 55 56 57 58 59"
        " 5a 63 64 65 66 67 68 69 6a 73 74 75 76 77 78 79 7a 83 84 85 86 87 88 89"
        " 8a 92 93 94 95 96 97 98 99 9a a2 a3 a4 a5 a6 a7 a8 a9 aa b2 b3 b4 b5 b6"
        " b7 b8 b9 ba c2 c3 c4 c5 c6 c7 c8 c9 ca d2 d3 d4 d5 d6 d7 d8 d9 da e1 e2"
        " e3 e4 e5 e6 e7 e8 e9 ea f1 f2 f3 f4 f5 f6 f7 f8 f9 fa").split()],
)
_JPEG_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [int(h, 16) for h in (
        "00 01 02 03 11 04 05 21 31 06 12 41 51 07 61 71 13 22 32 81 08 14 42 91"
        " a1 b1 c1 09 23 33 52 f0 15 62 72 d1 0a 16 24 34 e1 25 f1 17 18 19 1a 26"
        " 27 28 29 2a 35 36 37 38 39 3a 43 44 45 46 47 48 49 4a 53 54 55 56 57 58"
        " 59 5a 63 64 65 66 67 68 69 6a 73 74 75 76 77 78 79 7a 82 83 84 85 86 87"
        " 88 89 8a 92 93 94 95 96 97 98 99 9a a2 a3 a4 a5 a6 a7 a8 a9 aa b2 b3 b4"
        " b5 b6 b7 b8 b9 ba c2 c3 c4 c5 c6 c7 c8 c9 ca d2 d3 d4 d5 d6 d7 d8 d9 da"
        " e2 e3 e4 e5 e6 e7 e8 e9 ea f2 f3 f4 f5 f6 f7 f8 f9 fa").split()],
)

_JPEG_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)


def _jpeg_dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix M: F = M f Mᵀ, f = Mᵀ F M."""
    x = np.arange(8)
    m = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) * 0.5
    m[0] /= np.sqrt(2.0)
    return m


def _jpeg_huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per T.81 C.2 canonical code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _JpegBitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.cur = (self.cur << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.buf.append(self.cur)
                if self.cur == 0xFF:  # byte stuffing
                    self.buf.append(0x00)
                self.cur = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.cur = (self.cur << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.buf.append(self.cur)
            if self.cur == 0xFF:
                self.buf.append(0x00)
            self.cur = 0
            self.nbits = 0


def _jpeg_magnitude(v: int) -> tuple[int, int]:
    """(size, bits) per T.81 F.1.2.1: negative values store v + 2^size - 1."""
    size = int(abs(v)).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1) & ((1 << size) - 1)


def _jpeg_encode_block(
    wr: _JpegBitWriter, block: np.ndarray, q: np.ndarray, pred: int,
    dc_codes: dict, ac_codes: dict,
) -> int:
    m = _jpeg_dct_matrix()
    # einsum(optimize=False) is numpy's C nditer sum — fixed summation
    # order, never dispatched to BLAS. The matmul form put quantizer inputs
    # 4e-15 from .5 boundaries, so a BLAS-ordering change between containers
    # flipped coefficients and silently changed fixture bytes (round-5: 7
    # AVI golden rows drifted exactly this way). Order-pinning makes the
    # encoder's output a pure function of the pixel values again; the
    # rounding-margin test (test_multimodal.py) guards the residual risk.
    shifted = block.astype(np.float64) - 128.0
    coef = np.einsum("ik,lk->il", np.einsum("ij,jk->ik", m, shifted, optimize=False),
                     m, optimize=False)
    _trace_round_margin(coef / q, "jpeg_quant")  # fixture-side: feeds the pinned bytes
    quant = np.round(coef / q).astype(np.int64)
    zz = quant.reshape(-1)[_JPEG_ZIGZAG]
    dc = int(zz[0])
    size, bits = _jpeg_magnitude(dc - pred)
    c, ln = dc_codes[size]
    wr.write(c, ln)
    if size:
        wr.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                c, ln = ac_codes[0x00]  # EOB
                wr.write(c, ln)
                break
            run += 1
            if run == 16:
                c, ln = ac_codes[0xF0]  # ZRL
                wr.write(c, ln)
                run = 0
            continue
        size, bits = _jpeg_magnitude(v)
        c, ln = ac_codes[(run << 4) | size]
        wr.write(c, ln)
        wr.write(bits, size)
        run = 0
    return dc


def encode_jpeg(
    width: int, height: int, channels: int = 3, seed: int = 0,
    subsample: str = "444", smooth: int = 4, restart_interval: int = 0,
    quality: int = 88,
) -> bytes:
    """Deterministic, spec-valid baseline JPEG (SOF0) bytes for tests and
    goldens: seed-derived smooth raster (block-averaged noise upsampled, so
    the lossy roundtrip stays near the source), gray or YCbCr 4:4:4/4:2:0,
    Annex-K-style quant (libjpeg-style quality scaling) + typical Huffman
    tables embedded in DQT/DHT."""
    if channels not in (1, 3):
        raise ValueError("JPEG fixture channels must be 1 or 3")
    if not 1 <= quality <= 100:
        raise ValueError("quality must be 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    rng = np.random.default_rng(seed)
    coarse = rng.integers(40, 216, size=((height + smooth - 1) // smooth,
                                         (width + smooth - 1) // smooth,
                                         channels))
    img = np.repeat(np.repeat(coarse, smooth, 0), smooth, 1)[:height, :width].astype(np.float64)

    if channels == 3:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    else:
        planes = [img[..., 0]]

    v420 = channels == 3 and subsample == "420"
    samp = [(2, 2), (1, 1), (1, 1)] if v420 else [(1, 1)] * len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h

    comp_px = []
    for i, p in enumerate(planes):
        sh, sv = samp[i]
        cw = (width * sh + hmax - 1) // hmax
        chh = (height * sv + vmax - 1) // vmax
        if (sh, sv) == (hmax, vmax):
            sub = p
        else:  # box-average 2×2 (pad odd edges by replication first)
            pp = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)), mode="edge")
            sub = pp.reshape(pp.shape[0] // 2, 2, pp.shape[1] // 2, 2).mean(axis=(1, 3))
        full_w, full_h = mcus_x * 8 * sh, mcus_y * 8 * sv
        sub = np.pad(sub, ((0, full_h - chh), (0, full_w - cw)), mode="edge")
        comp_px.append(sub)

    qts = [
        np.clip((t * scale + 50) // 100, 1, 255).astype(np.int32)
        for t in (_JPEG_QUANT_LUM, _JPEG_QUANT_CHROM)
    ]
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in enumerate(qts[: 1 if channels == 1 else 2]):
        zz = q.reshape(-1)[_JPEG_ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + zz
    sof = struct.pack(">BHHB", 8, height, width, len(planes))
    for i in range(len(planes)):
        tq = 0 if i == 0 else 1
        sof += bytes([i + 1, (samp[i][0] << 4) | samp[i][1], 0 if channels == 1 else tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    tables = [(0x00, _JPEG_DC_LUM), (0x10, _JPEG_AC_LUM)]
    if channels == 3:
        tables += [(0x01, _JPEG_DC_CHROM), (0x11, _JPEG_AC_CHROM)]
    for tc_th, (bits, vals) in tables:
        body = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([len(planes)])
    for i in range(len(planes)):
        td_ta = 0x00 if i == 0 else 0x11
        sos += bytes([i + 1, td_ta])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_codes = [_jpeg_huff_codes(*_JPEG_DC_LUM), _jpeg_huff_codes(*_JPEG_DC_CHROM)]
    ac_codes = [_jpeg_huff_codes(*_JPEG_AC_LUM), _jpeg_huff_codes(*_JPEG_AC_CHROM)]
    wr = _JpegBitWriter()
    preds = [0] * len(planes)
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                wr.flush()
                wr.buf += bytes([0xFF, 0xD0 + (mcu_i // restart_interval - 1) % 8])
                preds = [0] * len(planes)
            mcu_i += 1
            for i, px in enumerate(comp_px):
                sh, sv = samp[i]
                t = 0 if i == 0 else 1
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = px[y0 : y0 + 8, x0 : x0 + 8]
                        preds[i] = _jpeg_encode_block(
                            wr, block, qts[0 if (channels == 1 or i == 0) else 1],
                            preds[i], dc_codes[t], ac_codes[t])
    wr.flush()
    out += wr.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _JpegBitReader:
    """MSB-first entropy reads with 0xFF00 unstuffing; RSTn resets."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn consumed by caller via sync()
                raise _JpegRestart()
            else:
                raise ValueError(f"JPEG marker 0x{nxt:02x} inside entropy data")
        else:
            self.pos += 1
        self.cur = (self.cur << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        """Skip to just past the next RSTn marker, clearing bit state."""
        self.cur = self.nbits = 0
        while not (self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


class _JpegRestart(Exception):
    pass


def _jpeg_huff_decode(rd: _JpegBitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | rd.bit()
        if (ln, code) in table:
            return table[(ln, code)]
    raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(bits: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map magnitude bits back to a signed value."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _decode_jpeg(content: bytes) -> tuple[int, int, int, np.ndarray]:
    """Stdlib+numpy baseline JPEG decode (SOF0/SOF1): embedded DQT/DHT
    tables, interleaved scan, 4:4:4 / 4:2:2 / 4:2:0 with replication
    upsampling, restart intervals, float64 IDCT. A conforming sequential
    decoder — NOT bit-identical to libjpeg's fast integer IDCT, which is
    why jpeg oracle fixtures pin prefer_stdlib=True. PIL keeps priority
    in _decode_one when importable."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    while pos < len(content):
        if content[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = content[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", content[pos : pos + 2])
        body = content[pos + 2 : pos + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                p += 1
                if pq:
                    vals = np.frombuffer(body[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                else:
                    vals = np.frombuffer(body[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                dez = np.zeros(64, dtype=np.int32)
                dez[_JPEG_ZIGZAG] = vals
                qt[tq] = dez.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 15
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                p += 17 + n
                table: dict[tuple[int, int], int] = {}
                code = 0
                k = 0
                for ln in range(1, 17):
                    for _ in range(bits[ln - 1]):
                        table[(ln, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(tc, th)] = table
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext sequential
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported (stdlib decoder)")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline/extended-sequential JPEG supported (stdlib decoder)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            if ns != len(frame["comps"]):
                # conforming non-interleaved (per-component-scan) baseline
                # JPEG: decoding only the first scan would return a wrong
                # grayscale raster — quarantine like progressive instead
                raise NotImplementedError(
                    "non-interleaved multi-scan JPEG not supported (stdlib decoder)")
            scan = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i : 3 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append({**comp, "td": tdta >> 4, "ta": tdta & 15})
            pos += seg_len
            return _jpeg_decode_scan(
                content, pos, frame, scan, qt, huff, restart_interval)
        pos += seg_len
    raise ValueError("JPEG has no scan")


def _jpeg_decode_scan(content, pos, frame, scan, qt, huff, restart_interval):
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    m = _jpeg_dct_matrix()
    planes = [
        np.zeros((mcus_y * 8 * c["v"], mcus_x * 8 * c["h"]), dtype=np.float64)
        for c in scan
    ]
    rd = _JpegBitReader(content, pos)
    preds = [0] * len(scan)
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                rd.sync_restart()
                preds = [0] * len(scan)
            mcu_i += 1
            for ci, c in enumerate(scan):
                if c["tq"] not in qt:
                    raise ValueError("JPEG scan references missing quant table")
                q = qt[c["tq"]]
                dct = huff.get((0, c["td"]))
                act = huff.get((1, c["ta"]))
                if dct is None or act is None:
                    raise ValueError("JPEG scan references missing Huffman table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        try:
                            zz = np.zeros(64, dtype=np.int64)
                            size = _jpeg_huff_decode(rd, dct)
                            diff = _jpeg_extend(rd.receive(size), size)
                            preds[ci] += diff
                            zz[0] = preds[ci]
                            k = 1
                            while k < 64:
                                rs = _jpeg_huff_decode(rd, act)
                                r, s = rs >> 4, rs & 15
                                if s == 0:
                                    if r == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    raise ValueError("JPEG AC index overrun")
                                zz[k] = _jpeg_extend(rd.receive(s), s)
                                k += 1
                        except _JpegRestart:
                            raise ValueError("JPEG restart marker mid-block")
                        except IndexError:
                            raise ValueError("truncated JPEG entropy stream")
                        coef = np.zeros(64, dtype=np.float64)
                        coef[_JPEG_ZIGZAG] = zz * q.reshape(-1)[_JPEG_ZIGZAG]
                        blk = m.T @ coef.reshape(8, 8) @ m + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
    full: list[np.ndarray] = []
    for ci, c in enumerate(scan):
        p = planes[ci]
        if (c["h"], c["v"]) != (hmax, vmax):  # replication upsampling
            p = np.repeat(np.repeat(p, vmax // c["v"], 0), hmax // c["h"], 1)
        full.append(p[:h, :w])
    if len(full) == 1:
        _trace_round_margin(full[0], "jpeg_gray")
        arr = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[:, :, None]
        return w, h, 1, arr
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    _trace_round_margin(rgb, "jpeg_rgb")
    arr = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return w, h, 3, arr


def _stdlib_image_decode(content: bytes) -> tuple[int, int, int, np.ndarray] | None:
    """Dependency-free decoders for the compressed formats we own; None
    when the payload is some other format (PIL seam or quarantine)."""
    if content[:8] == PNG_SIG:
        return _decode_png(content)
    if content[:6] in GIF_SIGS:
        return _decode_gif(content)
    if content[:2] == b"\xff\xd8":
        return _decode_jpeg(content)
    return None


def _decode_one(content: bytes, prefer_stdlib: bool = False) -> tuple[int, int, int, np.ndarray]:
    if content[:8] == MAGIC:
        w, h, c = struct.unpack(">IIB", content[8:17])
        arr = np.frombuffer(content[17 : 17 + w * h * c], dtype=np.uint8).reshape(h, w, c)
        return w, h, c, arr
    if content[:2] in (b"P6", b"P5"):
        return _parse_pnm(content)
    if prefer_stdlib:
        # pin the deterministic stdlib codecs ahead of PIL: JPEG decode is
        # implementation-defined at the pixel level (IDCT + upsampling
        # choices), so oracle fixtures must not float with the environment
        got = _stdlib_image_decode(content)
        if got is not None:
            return got
    if _PIL_Image is not None:  # compressed codecs via the optional seam
        import io

        img = _PIL_Image.open(io.BytesIO(content))
        if img.mode not in ("RGB", "L"):
            img = img.convert("RGB")
        arr = np.asarray(img, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        h, w, c = arr.shape
        return w, h, c, arr
    got = _stdlib_image_decode(content)  # stdlib fallback when PIL is absent
    if got is not None:
        return got
    raise NotImplementedError(
        "compressed image codecs need the optional PIL dependency (absent here)"
    )


def decode_and_featurize(
    media: DataFrame,
    resize_to: tuple[int, int] | None = None,
    prefer_stdlib: bool = False,
) -> DataFrame:
    """mapInPandas decode → per-channel mean features; errors quarantined
    into the `error` column instead of failing the batch. prefer_stdlib
    pins the deterministic stdlib codecs ahead of PIL (oracle fixtures)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    w, h, c, arr = _decode_one(bytes(content), prefer_stdlib=prefer_stdlib)
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


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zcr", T.DoubleType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def encode_wav(n_samples: int, rate: int = 16000, freq: float = 440.0, channels: int = 1) -> bytes:
    """Valid 16-bit PCM WAV bytes (stdlib writer, sine payload)."""
    import io
    import wave

    t = np.arange(n_samples) / rate
    mono = (np.sin(2 * np.pi * freq * t) * 30000).astype("<i2")
    frames = np.repeat(mono[:, None], channels, axis=1).tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(frames)
    return buf.getvalue()


def _audio_features(mono: np.ndarray, nch: int, rate: int, nframes: int):
    duration_ms = int(round(nframes * 1000.0 / rate))
    rms = float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if len(mono) > 1 else 0.0
    return nch, rate, duration_ms, rms, zcr


def _g711_tables() -> tuple[np.ndarray, np.ndarray]:
    """256-entry expansion tables per ITU G.711 (the classic public
    formulas: μ-law complement + biased-exponent unfold, A-law 0x55 XOR +
    segment shift). Returned as int16 linear sample values (μ, A)."""
    codes = np.arange(256, dtype=np.int32)
    u = ~codes & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    mu = np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)
    a = codes ^ 0x55
    seg = (a & 0x70) >> 4
    t = ((a & 0x0F) << 4) + np.where(seg == 0, 8, 0x108)
    t = t << np.maximum(seg - 1, 0)
    alaw = np.where(a & 0x80, t, -t).astype(np.int16)
    return mu, alaw


_G711_MU, _G711_A = _g711_tables()


def encode_wav_g711(n_samples: int, rate: int = 8000, law: str = "mu",
                    channels: int = 1, seed: int = 0) -> bytes:
    """Valid G.711 WAV bytes (format code 7 μ-law / 6 A-law, 8-bit):
    RIFF fmt+data written by hand (the stdlib `wave` module is PCM-only).
    The payload is a seed-derived byte stream — every byte is a valid
    G.711 code, so no compressor is needed for deterministic fixtures."""
    fmt_code = {"mu": 7, "a": 6}[law]
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, size=n_samples * channels, dtype=np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", fmt_code, channels, rate, rate * channels, channels, 8)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_wav_g711(content: bytes) -> tuple[int, int, int, float, float] | None:
    """Manual RIFF walk for G.711 WAV (format 6/7) — returns None when the
    container is PCM (stdlib path) and raises for other format codes."""
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(content):
        tag = content[pos : pos + 4]
        (size,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    code, nch, rate = fmt[0], fmt[1], fmt[2]
    if code == 1:
        return None  # PCM → stdlib wave path
    if code not in (6, 7):
        raise NotImplementedError(
            f"WAV format code {code} not supported (PCM/G.711 only)")
    table = _G711_MU if code == 7 else _G711_A
    lin = table[np.frombuffer(data, dtype=np.uint8)].astype(np.float64) / 32768.0
    nframes = len(lin) // nch
    mono = lin[: nframes * nch].reshape(-1, nch).mean(axis=1)
    return _audio_features(mono, nch, rate, nframes)


# ── FLAC (dependency-free subset): 16-bit, fixed/LPC prediction ──


class _FlacBitReader:
    """MSB-first bit reader over the frame byte stream."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.d = data
        self.pos = pos  # bit position
        self.nbits = len(data) * 8

    def take(self, n: int) -> int:
        if self.pos + n > self.nbits:
            raise ValueError("truncated FLAC bitstream")
        v = 0
        p = self.pos
        # byte-at-a-time fast path
        while n:
            byte = self.d[p >> 3]
            avail = 8 - (p & 7)
            k = min(n, avail)
            v = (v << k) | ((byte >> (avail - k)) & ((1 << k) - 1))
            p += k
            n -= k
        self.pos = p
        return v

    def signed(self, n: int) -> int:
        v = self.take(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        q = 0
        while self.take(1) == 0:
            q += 1
            if q > self.nbits:
                raise ValueError("runaway FLAC unary code")
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _flac_utf8_number(rd: _FlacBitReader) -> int:
    """UTF-8-style coded frame/sample number (FLAC frame header)."""
    b0 = rd.take(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise ValueError("bad FLAC coded number")
    v = b0 & (0xFF >> (n + 1))
    for _ in range(n - 1):
        c = rd.take(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad FLAC coded number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


_FLAC_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}
_FLAC_BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}


def _flac_residual(rd: _FlacBitReader, n: int, pred_order: int) -> list[int]:
    method = rd.take(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    plen = 4 + method  # rice parameter width (4 or 5 bits)
    escape = (1 << plen) - 1
    porder = rd.take(4)
    nparts = 1 << porder
    # block splits into nparts equal partitions; the first one holds
    # n/nparts - pred_order residuals (warmup samples are not residuals)
    if n % nparts or n // nparts < pred_order:
        raise ValueError("bad FLAC partition order")
    out: list[int] = []
    for part in range(nparts):
        cnt = n // nparts - (pred_order if part == 0 else 0)
        param = rd.take(plen)
        if param == escape:
            width = rd.take(5)
            for _ in range(cnt):
                out.append(rd.signed(width) if width else 0)
        else:
            for _ in range(cnt):
                q = rd.unary()
                v = (q << param) | rd.take(param)
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _flac_subframe(rd: _FlacBitReader, n: int, bps: int) -> list[int]:
    if rd.take(1):
        raise ValueError("bad FLAC subframe padding bit")
    stype = rd.take(6)
    wasted = 0
    if rd.take(1):  # wasted-bits flag: unary count - 1 more
        wasted = 1 + rd.unary()
        bps -= wasted
    if stype == 0:  # CONSTANT
        samples = [rd.signed(bps)] * n
    elif stype == 1:  # VERBATIM
        samples = [rd.signed(bps) for _ in range(n)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        samples = [rd.signed(bps) for _ in range(order)]
        res = _flac_residual(rd, n, order)
        coefs = _FLAC_FIXED_COEFS[order]
        for r in res:
            pred = sum(c * samples[-i - 1] for i, c in enumerate(coefs))
            samples.append(pred + r)
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        samples = [rd.signed(bps) for _ in range(order)]
        prec = rd.take(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision")
        shift = rd.signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [rd.signed(prec) for _ in range(order)]
        res = _flac_residual(rd, n, order)
        for r in res:
            acc = sum(c * samples[-i - 1] for i, c in enumerate(coefs))
            samples.append((acc >> shift) + r)
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


class _FlacBitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (v & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.put(0, 8 - self.n)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16_flac(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _flac_write_subframe(wr: _FlacBitWriter, samples: list[int], bps: int, order: int) -> None:
    """FIXED-order subframe with a single rice partition (porder 0)."""
    wr.put(0, 1)
    wr.put(8 + order, 6)
    wr.put(0, 1)  # no wasted bits
    coefs = _FLAC_FIXED_COEFS[order]
    for s in samples[:order]:
        wr.put(s & ((1 << bps) - 1), bps)
    res = []
    for i in range(order, len(samples)):
        pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
        res.append(samples[i] - pred)
    zig = [(2 * r if r >= 0 else -2 * r - 1) for r in res]
    mean = (sum(zig) / len(zig)) if zig else 0
    param = 0
    while (1 << (param + 1)) < mean + 1 and param < 14:
        param += 1
    wr.put(0, 2)  # rice method 0 (4-bit params)
    wr.put(0, 4)  # partition order 0
    wr.put(param, 4)
    for v in zig:
        q = v >> param
        if q > 1 << 20:
            raise ValueError("rice quotient blowup (bad fixture signal)")
        for _ in range(q):
            wr.put(0, 1)
        wr.put(1, 1)
        wr.put(v & ((1 << param) - 1), param)


def encode_flac(
    n_samples: int, rate: int = 8000, channels: int = 1, seed: int = 0,
    blocksize: int = 1024, stereo: str = "independent",
) -> bytes:
    """Deterministic, spec-valid FLAC bytes (16-bit) for tests and goldens:
    STREAMINFO + fixed-blocksize frames, FIXED-prediction subframes with
    real rice-coded residuals (order rotates 0/1/2 per channel+frame),
    optional left-side / right-side / mid-side stereo decorrelation,
    correct CRC-8/CRC-16 trailers. The payload is a seeded smooth signal
    (sine + slow noise) so fixed prediction genuinely compresses."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples, dtype=np.float64)
    sig = np.zeros((n_samples, channels))
    for c in range(channels):
        freq = 200.0 + 40.0 * c + (seed % 7) * 15.0
        wave_ = 9000 * np.sin(2 * np.pi * freq * t / rate)
        drift = np.cumsum(rng.integers(-60, 61, size=n_samples))
        sig[:, c] = np.clip(wave_ + drift, -30000, 30000)
    pcm = sig.astype(np.int64)

    out = bytearray(b"fLaC")
    info = _FlacBitWriter()
    info.put(blocksize, 16)
    info.put(blocksize, 16)
    info.put(0, 24)
    info.put(0, 24)
    info.put(rate, 20)
    info.put(channels - 1, 3)
    info.put(15, 5)  # 16-bit
    info.put(n_samples, 36)
    info.buf += bytes(16)  # md5 unset
    out += bytes([0x80]) + struct.pack(">I", len(info.buf))[1:] + info.buf

    ms_mode = {"independent": None, "ls": 8, "rs": 9, "ms": 10}[stereo]
    if ms_mode is not None and channels != 2:
        raise ValueError("stereo decorrelation needs 2 channels")

    frame_no = 0
    pos = 0
    while pos < n_samples:
        n = min(blocksize, n_samples - pos)
        wr = _FlacBitWriter()
        wr.put(0x3FFE, 14)
        wr.put(0, 1)
        wr.put(0, 1)  # fixed-blocksize strategy
        bs_code = {192: 1, 576: 2, 1152: 3, 256: 8, 512: 9, 1024: 10,
                   2048: 11, 4096: 12}.get(n, 7)
        wr.put(bs_code, 4)
        wr.put(0, 4)  # sample rate from STREAMINFO
        wr.put(ms_mode if ms_mode is not None else channels - 1, 4)
        wr.put(4, 3)  # 16-bit
        wr.put(0, 1)
        # UTF-8 coded frame number; 2-byte form above 0x7F (fixture frame
        # counts stay far below the 11-bit ceiling of that form)
        fn = frame_no
        if fn < 0x80:
            wr.put(fn, 8)
        elif fn < 0x800:
            wr.put(0xC0 | (fn >> 6), 8)
            wr.put(0x80 | (fn & 0x3F), 8)
        else:
            raise ValueError("fixture frame count exceeds encoder's 2-byte coded numbers")
        if bs_code == 7:
            wr.put(n - 1, 16)
        wr.put(_crc8(bytes(wr.buf)), 8)  # header is byte-aligned here
        block = pcm[pos : pos + n]
        if ms_mode is None:
            for c in range(channels):
                order = (frame_no + c) % 3
                _flac_write_subframe(wr, [int(x) for x in block[:, c]], 16, order)
        else:
            left = [int(x) for x in block[:, 0]]
            right = [int(x) for x in block[:, 1]]
            side = [l - r for l, r in zip(left, right)]
            if ms_mode == 8:
                _flac_write_subframe(wr, left, 16, frame_no % 3)
                _flac_write_subframe(wr, side, 17, (frame_no + 1) % 3)
            elif ms_mode == 9:
                _flac_write_subframe(wr, side, 17, frame_no % 3)
                _flac_write_subframe(wr, right, 16, (frame_no + 1) % 3)
            else:
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                _flac_write_subframe(wr, mid, 16, frame_no % 3)
                _flac_write_subframe(wr, side, 17, (frame_no + 1) % 3)
        wr.align()
        wr.put(_crc16_flac(bytes(wr.buf)), 16)
        out += wr.buf
        pos += n
        frame_no += 1
    return bytes(out)


def _decode_flac(content: bytes) -> tuple[int, int, int, float, float]:
    """Dependency-free FLAC decode (16-bit subset): STREAMINFO metadata,
    frame sync walk, CONSTANT/VERBATIM/FIXED/LPC subframes, 4/5-bit rice
    partitions with escape codes, left/right/mid-side stereo decorrelation.
    soundfile keeps priority in _decode_wav when importable (it never
    reaches here); this is the fallback path. Returns the same feature
    tuple as the WAV path."""
    if content[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    rate = nch = bps = None
    total = 0
    while True:  # metadata blocks
        if pos + 4 > len(content):
            raise ValueError("truncated FLAC metadata")
        hdr = content[pos]
        (blen,) = struct.unpack(">I", b"\x00" + content[pos + 1 : pos + 4])
        body = content[pos + 4 : pos + 4 + blen]
        if hdr & 0x7F == 0:  # STREAMINFO
            rd = _FlacBitReader(body)
            rd.take(16)  # min blocksize
            rd.take(16)  # max blocksize
            rd.take(24)
            rd.take(24)
            rate = rd.take(20)
            nch = rd.take(3) + 1
            bps = rd.take(5) + 1
            total = rd.take(36)
        pos += 4 + blen
        if hdr & 0x80:
            break
    if rate is None or not rate:
        raise ValueError("FLAC missing STREAMINFO")
    if bps != 16:
        raise NotImplementedError(f"{bps}-bit FLAC not supported (stdlib decoder)")

    channels: list[list[int]] = [[] for _ in range(nch)]
    got = 0
    while pos < len(content) and (not total or got < total):
        rd = _FlacBitReader(content, pos * 8)
        sync = rd.take(14)
        if sync != 0x3FFE:
            raise ValueError("lost FLAC frame sync")
        rd.take(1)  # reserved
        rd.take(1)  # blocking strategy
        bs_code = rd.take(4)
        sr_code = rd.take(4)
        ch_code = rd.take(4)
        ss_code = rd.take(3)
        rd.take(1)  # reserved
        _flac_utf8_number(rd)
        if bs_code == 6:
            n = rd.take(8) + 1
        elif bs_code == 7:
            n = rd.take(16) + 1
        elif bs_code in _FLAC_BLOCKSIZES:
            n = _FLAC_BLOCKSIZES[bs_code]
        else:
            raise ValueError(f"reserved FLAC blocksize code {bs_code}")
        if sr_code == 12:
            rd.take(8)
        elif sr_code in (13, 14):
            rd.take(16)
        rd.take(8)  # CRC-8 (not verified — decode errors surface anyway)
        if ss_code not in (0, 4):  # 0 = from STREAMINFO, 4 = 16-bit
            raise NotImplementedError("non-16-bit FLAC frame")
        if ch_code < 8:
            if ch_code + 1 != nch:
                raise ValueError("FLAC frame channel count mismatch")
            subs = [_flac_subframe(rd, n, 16) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            if nch != 2:
                raise ValueError("FLAC stereo decorrelation on non-stereo stream")
            # side channel carries one extra bit
            if ch_code == 8:  # left/side
                left = _flac_subframe(rd, n, 16)
                side = _flac_subframe(rd, n, 17)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _flac_subframe(rd, n, 17)
                right = _flac_subframe(rd, n, 16)
                subs = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid = _flac_subframe(rd, n, 16)
                side = _flac_subframe(rd, n, 17)
                subs = [[], []]
                for m, s in zip(mid, side):
                    mm = (m << 1) | (s & 1)
                    subs[0].append((mm + s) >> 1)
                    subs[1].append((mm - s) >> 1)
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")
        rd.align()
        rd.take(16)  # CRC-16 (not verified)
        for c in range(nch):
            channels[c].extend(subs[c])
        got += n
        pos = rd.pos >> 3
    if total and got > total:
        for c in range(nch):
            channels[c] = channels[c][:total]
        got = total
    if not got:
        raise ValueError("FLAC stream has no frames")
    arr = np.array(channels, dtype=np.float64).T / 32768.0
    mono = arr.mean(axis=1)
    return _audio_features(mono, nch, rate, got)


def _decode_wav(content: bytes) -> tuple[int, int, int, float, float]:
    """REAL WAV decode — PCM via the stdlib `wave` module, G.711 μ-law /
    A-law via spec expansion tables — no external libraries. Compressed
    audio (FLAC/OGG/MP3) routes through the optional soundfile seam when
    importable, NotImplementedError-quarantines when not. Returns
    (channels, rate, duration_ms, rms, zero-crossing rate) over the
    downmixed signal."""
    import io
    import wave

    if content[:4] == b"fLaC":
        # exact integer decode — identical features either way, so the
        # stdlib path is used even when soundfile is importable
        return _decode_flac(content)
    if content[:4] != b"RIFF":  # compressed container → optional seam
        if _soundfile is not None:
            data, rate = _soundfile.read(io.BytesIO(content), dtype="float64", always_2d=True)
            mono = data.mean(axis=1)
            return _audio_features(mono, data.shape[1], rate, len(data))
        raise NotImplementedError(
            "compressed audio codecs need the optional soundfile dependency (absent here)"
        )

    got = _decode_wav_g711(content)
    if got is not None:
        return got

    with wave.open(io.BytesIO(content)) as wf:
        nch, sw, rate, nframes = (
            wf.getnchannels(),
            wf.getsampwidth(),
            wf.getframerate(),
            wf.getnframes(),
        )
        raw = wf.readframes(nframes)
    if sw == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{8 * sw}-bit PCM not supported")
    mono = arr.reshape(-1, nch).mean(axis=1)
    return _audio_features(mono, nch, rate, nframes)


def decode_audio_features(media: DataFrame) -> DataFrame:
    """mapInPandas WAV decode → (duration, RMS, zero-crossing rate);
    undecodable rows quarantined into `error`, same contract as the image
    path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    nch, rate, dur, rms, zcr = _decode_wav(bytes(content))
                    rows.append((mid, nch, rate, dur, rms, zcr, None))
                except NotImplementedError as e:
                    rows.append((mid, None, None, None, None, None, str(e)))
                except Exception as e:
                    rows.append((mid, None, None, None, None, None, f"decode_error: {e}"))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "channels", "sample_rate", "duration_ms", "rms", "zcr", "error"],
            )

    return media.select("media_id", "content").mapInPandas(run, schema=AUDIO_SCHEMA)


def encode_y4m(width: int, height: int, n_frames: int, fps: int = 25, seed: int = 0) -> bytes:
    """Valid YUV4MPEG2 bytes (4:2:0 planar) — a real uncompressed video
    container (ffmpeg/mplayer-readable). width/height must be even."""
    rng = np.random.default_rng(seed)
    header = f"YUV4MPEG2 W{width} H{height} F{fps}:1 Ip A1:1 C420\n".encode()
    ysz, csz = width * height, (width // 2) * (height // 2)
    parts = [header]
    for _ in range(n_frames):
        parts.append(b"FRAME\n")
        parts.append(rng.integers(0, 256, size=ysz + 2 * csz, dtype=np.uint8).tobytes())
    return b"".join(parts)


def _parse_av(content: bytes):
    """PyAV-backed decode of compressed video containers (MP4/MKV/...),
    returning the same (w, h, fps_num, fps_den, lumas) shape as the y4m
    parser so downstream frame sampling is codec-agnostic."""
    import io

    with _pyav.open(io.BytesIO(content)) as container:
        stream = container.streams.video[0]
        rate = stream.average_rate or 25
        fps_num, fps_den = rate.numerator, rate.denominator
        w = h = None
        lumas = []
        for frame in container.decode(stream):
            gray = frame.reformat(format="gray").to_ndarray()
            h, w = gray.shape
            lumas.append(gray)
    if w is None:
        raise ValueError("video stream decoded no frames")
    return w, h, fps_num, fps_den, lumas


def encode_avi_mjpeg(
    width: int, height: int, n_frames: int, fps: int = 25, seed: int = 0,
    gray: bool = False,
) -> bytes:
    """Deterministic, spec-valid RIFF AVI with an MJPG video stream
    (hdrl: avih + strl(strh 'vids'/'MJPG' + strf BITMAPINFOHEADER),
    movi: one '00dc' baseline-JPEG chunk per frame). A REAL compressed
    video container decodable with zero optional dependencies."""
    frames = [
        encode_jpeg(width, height, channels=1 if gray else 3, seed=seed * 1000 + i)
        for i in range(n_frames)
    ]

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) % 2 else b"")

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    avih = struct.pack(
        "<14I", 1_000_000 // fps, 0, 0, 0x10, n_frames, 0, 1, 0,
        width, height, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                                            n_frames, 0, 10000, 0)
            + struct.pack("<4H", 0, 0, width, height))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
                       width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _parse_avi_mjpeg(content: bytes):
    """Stdlib+numpy MJPEG-AVI parse: RIFF chunk walk → strh 'vids' rate,
    '00dc'/'00db' JPEG frames → _decode_jpeg → luma planes. Returns the
    same (w, h, fps_num, fps_den, lumas) shape as the y4m parser."""
    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    fps_num, fps_den = 25, 1
    frames: list[bytes] = []
    # AVI streams are numbered by strl order; a movi chunk's two-digit
    # prefix is that stream number. Track which stream is the (first)
    # 'vids' one and collect ONLY its chunks — a second video stream or a
    # non-video '01dc' must not merge foreign frames into the sequence.
    n_streams = 0
    vids_stream: int | None = None

    def walk(pos: int, end: int) -> None:
        nonlocal fps_num, fps_den, n_streams, vids_stream
        while pos + 8 <= end:
            fourcc = content[pos : pos + 4]
            (size,) = struct.unpack("<I", content[pos + 4 : pos + 8])
            data_end = pos + 8 + size
            if data_end > len(content):
                raise ValueError("truncated AVI chunk")
            if fourcc == b"LIST":
                walk(pos + 12, data_end)
            elif fourcc == b"strh":
                body = content[pos + 8 : data_end]
                if body[:4] == b"vids" and vids_stream is None:
                    vids_stream = n_streams
                    scale, rate = struct.unpack("<II", body[20:28])
                    if rate:
                        fps_num, fps_den = rate, max(scale, 1)
                n_streams += 1
            elif (
                fourcc[2:4] in (b"dc", b"db")
                and fourcc[:2].isdigit()
                and vids_stream is not None
                and int(fourcc[:2]) == vids_stream
            ):
                frames.append(content[pos + 8 : data_end])
            pos = data_end + (size & 1)  # chunks are word-aligned

    walk(12, 8 + struct.unpack("<I", content[4:8])[0])
    if not frames:
        raise ValueError("AVI contains no video frames")
    lumas = []
    w = h = None
    for f in frames:
        if f[:2] != b"\xff\xd8":
            raise NotImplementedError(
                "non-MJPEG AVI streams need the optional PyAV dependency")
        fw, fh, fc, arr = _decode_jpeg(f)
        if w is None:
            w, h = fw, fh
        elif (fw, fh) != (w, h):
            raise ValueError("AVI frame size changed mid-stream")
        if fc == 1:
            lumas.append(arr[:, :, 0])
        else:  # JFIF luma from RGB, banker's-rounded like the decoders
            r, g, b = (arr[:, :, i].astype(np.float64) for i in range(3))
            luma = 0.299 * r + 0.587 * g + 0.114 * b
            _trace_round_margin(luma, "avi_luma")
            lumas.append(np.clip(np.round(luma), 0, 255).astype(np.uint8))
    return w, h, fps_num, fps_den, lumas


def _parse_y4m(content: bytes):
    """REAL YUV4MPEG2 parse (numpy only): header tokens → (w, h, fps),
    frames → luma planes. MJPEG-AVI routes to the stdlib RIFF parser;
    other compressed containers need the optional PyAV seam."""
    if content[:4] == b"RIFF" and content[8:12] == b"AVI ":
        return _parse_avi_mjpeg(content)
    nl = content.index(b"\n")
    tokens = content[:nl].split(b" ")
    if tokens[0] != b"YUV4MPEG2":
        if _pyav is not None:  # compressed containers via the optional seam
            return _parse_av(content)
        raise NotImplementedError(
            "compressed video codecs need the optional PyAV dependency (absent here)"
        )
    w = h = None
    fps_num, fps_den = 25, 1
    for t in tokens[1:]:
        if t[:1] == b"W":
            w = int(t[1:])
        elif t[:1] == b"H":
            h = int(t[1:])
        elif t[:1] == b"F":
            fps_num, fps_den = (int(x) for x in t[1:].split(b":"))
        elif t[:1] == b"C" and t not in (b"C420", b"C420jpeg", b"C420paldv", b"C420mpeg2"):
            raise ValueError(f"unsupported y4m chroma: {t.decode()}")
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    ysz, csz = w * h, (w // 2) * (h // 2)
    frame_bytes = ysz + 2 * csz
    pos, lumas = nl + 1, []
    while pos < len(content):
        fnl = content.index(b"\n", pos)
        if content[pos : pos + 5] != b"FRAME":
            raise ValueError("bad y4m FRAME marker")
        pos = fnl + 1
        raster = content[pos : pos + frame_bytes]
        if len(raster) < frame_bytes:
            raise ValueError("truncated y4m frame")
        lumas.append(np.frombuffer(raster[:ysz], dtype=np.uint8).reshape(h, w))
        pos += frame_bytes
    return w, h, fps_num, fps_den, lumas


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("luma_mean", T.DoubleType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def decode_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """REAL video frame sampling: y4m parse → one decoded frame every
    `every_ms` of stream time → per-frame luma mean. Undecodable rows
    quarantine; compressed containers surface the NotImplementedError."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    w, h, num, den, lumas = _parse_y4m(bytes(content))
                    fps = num / den
                    dur_ms = len(lumas) * 1000.0 / fps
                    ts = 0
                    while ts < dur_ms:
                        idx = int(ts * fps // 1000)
                        rows.append(
                            (mid, idx, ts, w, h, float(lumas[idx].mean()) / 255.0, None)
                        )
                        ts += every_ms
                except NotImplementedError as e:
                    rows.append((mid, None, None, None, None, None, str(e)))
                except Exception as e:
                    rows.append((mid, None, None, None, None, None, f"decode_error: {e}"))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "ts_ms", "width", "height", "luma_mean", "error"],
            )

    return media.select("media_id", "content").mapInPandas(run, schema=VIDEO_FRAME_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Metadata-only frame schedule: emits (media_id, frame_idx, ts_ms) rows
    from duration metadata — the planning half of decode_video_frames, for
    containers whose codec is stubbed."""
    from pyspark.sql import functions as F

    # ceil(duration/every): one sample per started interval — the same
    # `ts < duration` schedule the real decoder walks, so plan and decode
    # agree for non-multiple durations; null/zero duration emits no rows
    # (previously it emitted a phantom frame 0)
    dur = F.col("media_meta.duration_ms")
    n = F.ceil(dur / every_ms).cast("int")
    return (
        media.filter((F.col("kind") == "video") & dur.isNotNull() & (dur > 0))
        .select("media_id", F.posexplode(F.sequence(F.lit(0), n - 1)).alias("frame_idx", "_"))
        .select("media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("ts_ms"))
    )
