"""Generate known-answer codec interop fixtures (tests/fixtures/interop/).

Closes the round-5 verdict's top gap: the codec test suite's strongest
oracle was encoder->decoder round-trip equality, which a MATCHED
encoder+decoder bug passes silently. This container has no external codec
binaries (no libjpeg/libwebp/flac/PIL), so "externally generated" is
realized as the next-strongest thing available: every bitstream here is
assembled byte-by-byte straight from the PUBLIC format specifications
(ITU-T T.81 for JPEG, RFC 9649 for WebP/VP8L, RFC 9639 for FLAC, the
GIF89a spec, the TIFF 6.0 spec, RFC 2083 for PNG) by this script, which
deliberately imports NOTHING from roapi_spark and shares no bit-writer,
Huffman, CRC, IDCT, or LZW code with the production decoders. Expected
pixel/sample values are computed here with independent naive
implementations (double-loop IDCT from the T.81 formula, by-hand filter
math) and pinned in manifest.json next to the blob SHA-256s.

A decode mismatch therefore means the production decoder and an
independent spec derivation disagree — exactly the class of bug
round-trip tests cannot see.

Run: python tools/make_interop_fixtures.py   (regenerates fixtures; the
pinned hashes in tests/test_codec_interop.py must then be re-audited)
"""

from __future__ import annotations

import hashlib
import json
import struct
import zlib
from pathlib import Path

import numpy as np

OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "interop"


# --------------------------------------------------------------------------
# independent bit IO (deliberately NOT the production classes)
# --------------------------------------------------------------------------


class MsbWriter:
    """MSB-first bit accumulator (JPEG entropy data, FLAC, TIFF LZW)."""

    def __init__(self) -> None:
        self.bits: list[int] = []

    def put(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def to_bytes(self, pad_bit: int = 0) -> bytes:
        bits = self.bits[:]
        while len(bits) % 8:
            bits.append(pad_bit)
        return bytes(
            int("".join(map(str, bits[i : i + 8])), 2) for i in range(0, len(bits), 8)
        )


class LsbWriter:
    """LSB-first bit accumulator (VP8L, GIF LZW)."""

    def __init__(self) -> None:
        self.bits: list[int] = []

    def put(self, value: int, n: int) -> None:
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def to_bytes(self) -> bytes:
        bits = self.bits[:]
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b |= bits[i + j] << j
            out.append(b)
        return bytes(out)


# --------------------------------------------------------------------------
# JPEG (ITU-T T.81): baseline, single component
# --------------------------------------------------------------------------


def zigzag_order() -> list[tuple[int, int]]:
    """(row, col) pairs in zig-zag scan order, derived by diagonal walk
    (T.81 Figure 5), not copied from a table."""
    out = []
    for s in range(15):  # anti-diagonal index r+c = s
        rng = range(s + 1)
        for i in rng if s % 2 else reversed(rng):
            r, c = i, s - i
            if r < 8 and c < 8:
                out.append((r, c))
    return out


def naive_idct_block(coeffs: np.ndarray) -> np.ndarray:
    """T.81 A.3.3 IDCT as a literal quadruple loop: s(y,x) = 1/4 * sum_u
    sum_v C(u) C(v) S(v,u) cos((2x+1)u*pi/16) cos((2y+1)v*pi/16).
    coeffs is the natural-order (v, u) = (row, col) coefficient block."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            acc = 0.0
            for v in range(8):
                for u in range(8):
                    cu = (1 / np.sqrt(2)) if u == 0 else 1.0
                    cv = (1 / np.sqrt(2)) if v == 0 else 1.0
                    acc += (
                        cu
                        * cv
                        * coeffs[v, u]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[y, x] = acc / 4.0
    return out


def huff_canonical(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Symbol -> (code, length) per T.81 Annex C code generation."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# Tiny custom tables (any tables are legal; DHT carries them):
#   DC: categories 0..7 -> lengths 2,2,2,3,4,5,6,7 (Kraft sum < 1, so the
#   all-ones code point stays unused per T.81 C.2)
#   AC: the seven run/size symbols the fixture blocks actually need
_DC_BITS = [0, 3, 1, 1, 1, 1, 1] + [0] * 9
_DC_VALS = [0, 1, 2, 3, 4, 5, 6, 7]
_AC_BITS = [0, 2, 2, 1, 1, 1] + [0] * 10
_AC_VALS = [0x00, 0x01, 0x02, 0x03, 0x04, 0x13, 0x14]


def _jpeg_magnitude(v: int) -> tuple[int, int]:
    """T.81 F.1.2.1: (category, appended bits) for a coefficient value."""
    if v == 0:
        return 0, 0
    cat = int(v if v > 0 else -v).bit_length()
    return cat, (v if v > 0 else v + (1 << cat) - 1)


def make_jpeg(
    blocks: list[dict[tuple[int, int], int]],
    quant: np.ndarray,
    width: int,
    height: int,
    restart_interval: int = 0,
) -> tuple[bytes, np.ndarray]:
    """Build a baseline 1-component JPEG from per-block natural-order
    coefficient dicts; return (blob, expected gray pixels)."""
    zz = zigzag_order()
    dc_codes = huff_canonical(_DC_BITS, _DC_VALS)
    ac_codes = huff_canonical(_AC_BITS, _AC_VALS)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    blob = b"\xff\xd8"  # SOI
    qz = bytes(int(quant[r, c]) for r, c in zz)
    blob += seg(0xDB, b"\x00" + qz)  # DQT, Pq=0/Tq=0
    blob += seg(
        0xC0, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    )  # SOF0
    blob += seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))  # DHT DC0
    blob += seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))  # DHT AC0
    if restart_interval:
        blob += seg(0xDD, struct.pack(">H", restart_interval))  # DRI
    blob += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS

    entropy = b""
    bw = MsbWriter()
    pred = 0
    for bi, coeffs in enumerate(blocks):
        if restart_interval and bi and bi % restart_interval == 0:
            # flush current interval (pad with 1s), emit RSTm, reset DC pred
            chunk = bw.to_bytes(pad_bit=1)
            entropy += chunk.replace(b"\xff", b"\xff\x00")
            entropy += bytes([0xFF, 0xD0 + ((bi // restart_interval - 1) % 8)])
            bw = MsbWriter()
            pred = 0
        dc = coeffs.get((0, 0), 0)
        cat, extra = _jpeg_magnitude(dc - pred)
        pred = dc
        code, ln = dc_codes[cat]
        bw.put(code, ln)
        if cat:
            bw.put(extra, cat)
        # AC in zig-zag order; only runs expressible with our tiny table
        run = 0
        last_nonzero = 0
        for k in range(1, 64):
            if coeffs.get(zz[k], 0):
                last_nonzero = k
        for k in range(1, last_nonzero + 1):
            v = coeffs.get(zz[k], 0)
            if v == 0:
                run += 1
                continue
            cat, extra = _jpeg_magnitude(v)
            sym = (run << 4) | cat
            if sym not in ac_codes:
                raise ValueError(f"AC symbol {sym:#x} not in the tiny table")
            code, ln = ac_codes[sym]
            bw.put(code, ln)
            bw.put(extra, cat)
            run = 0
        if last_nonzero != 63:
            code, ln = ac_codes[0x00]  # EOB
            bw.put(code, ln)
    chunk = bw.to_bytes(pad_bit=1)
    entropy += chunk.replace(b"\xff", b"\xff\x00")
    blob += entropy + b"\xff\xd9"  # EOI

    # expected pixels: dequantize -> naive IDCT -> +128 -> clamp
    bw_blocks = (width + 7) // 8
    expected = np.zeros((height, width), dtype=np.uint8)
    for bi, coeffs in enumerate(blocks):
        by, bx = divmod(bi, bw_blocks)
        nat = np.zeros((8, 8))
        for (r, c), v in coeffs.items():
            nat[r, c] = v * quant[r, c]
        px = naive_idct_block(nat) + 128.0
        frac = np.abs(px - np.floor(px) - 0.5)
        if float(frac.min()) < 0.04:
            raise ValueError("pixel value too close to a rounding boundary")
        expected[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
            np.round(px), 0, 255
        ).astype(np.uint8)
    return blob, expected


# --------------------------------------------------------------------------
# WebP / VP8L (RFC 9649)
# --------------------------------------------------------------------------


def _vp8l_container(payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _vp8l_simple_code(bw: LsbWriter, symbols: list[int]) -> None:
    """Simple prefix code form: 1-bit flag, num_symbols-1, first-symbol
    width flag, then the symbols (RFC 9649 §4.6.2.1)."""
    bw.put(1, 1)  # simple
    bw.put(len(symbols) - 1, 1)
    first_8bit = 1 if symbols[0] > 1 else 0
    bw.put(first_8bit, 1)
    bw.put(symbols[0], 8 if first_8bit else 1)
    if len(symbols) == 2:
        bw.put(symbols[1], 8)


def make_vp8l_solid(w: int, h: int, argb: tuple[int, int, int, int]) -> tuple[bytes, np.ndarray]:
    """Solid-color VP8L: five 1-symbol prefix codes, zero bits per pixel."""
    a, r, g, b = argb
    bw = LsbWriter()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)  # alpha hint
    bw.put(0, 3)  # version
    bw.put(0, 1)  # no transforms
    bw.put(0, 1)  # no color cache
    bw.put(0, 1)  # no meta prefix codes
    for sym in (g, r, b, a, 0):  # green/red/blue/alpha/distance order
        _vp8l_simple_code(bw, [sym])
    blob = _vp8l_container(b"\x2f" + bw.to_bytes())
    gray = (r + g + b) // 3
    return blob, np.full((h, w), gray, dtype=np.uint8)


def make_vp8l_two_greens(
    w: int, h: int, bits: list[int], g0: int, g1: int, rba: tuple[int, int, int]
) -> tuple[bytes, np.ndarray]:
    """VP8L with a 2-symbol green code (1 bit/pixel); red/blue/alpha and
    distance stay single-symbol. bits[i]=0 -> g0, 1 -> g1 (simple-form
    canonical order: first listed symbol takes code 0)."""
    r, b, a = rba
    bw = LsbWriter()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)
    bw.put(0, 3)
    bw.put(0, 1)  # no transforms
    bw.put(0, 1)  # no color cache
    bw.put(0, 1)  # no meta prefix
    _vp8l_simple_code(bw, [g0, g1])  # green
    for sym in (r, b, a, 0):
        _vp8l_simple_code(bw, [sym])
    assert len(bits) == w * h
    for bit in bits:
        bw.put(bit, 1)
    blob = _vp8l_container(b"\x2f" + bw.to_bytes())
    greens = np.array([g0, g1])[np.array(bits)].reshape(h, w)
    gray = ((r + b + greens.astype(np.uint32)) // 3).astype(np.uint8)
    return blob, gray


# --------------------------------------------------------------------------
# FLAC (RFC 9639): verbatim + constant subframes
# --------------------------------------------------------------------------


def _flac_crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — from the polynomial."""
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07 if crc & 0x80 else crc << 1) & 0xFF
    return crc


def _flac_crc16(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0."""
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005 if crc & 0x8000 else crc << 1) & 0xFFFF
    return crc


def make_flac_mono16(samples: list[int], rate: int, subframe: str) -> tuple[bytes, np.ndarray]:
    """One-frame mono 16-bit FLAC with a verbatim or constant subframe."""
    n = len(samples)
    # STREAMINFO
    si = MsbWriter()
    si.put(n, 16)  # min block size
    si.put(n, 16)  # max block size
    si.put(0, 24)  # min frame size unknown
    si.put(0, 24)  # max frame size unknown
    si.put(rate, 20)
    si.put(0, 3)  # channels - 1
    si.put(15, 5)  # bps - 1
    si.put(n, 36)  # total samples
    md5 = hashlib.md5(
        b"".join(struct.pack("<h", s) for s in samples)
    ).digest()
    streaminfo = si.to_bytes() + md5
    blob = b"fLaC" + bytes([0x80]) + struct.pack(">I", 34)[1:] + streaminfo

    # frame header: sync(14) 0 blocking(0=fixed) | bs code 0110 (8-bit end)
    # | rate code 0000 (from STREAMINFO) | channels 0000 | size 100 (16b) | 0
    hdr = MsbWriter()
    hdr.put(0b11111111111110, 14)
    hdr.put(0, 1)  # reserved
    hdr.put(0, 1)  # fixed blocking
    hdr.put(0b0110, 4)  # block size: 8-bit value at end of header
    hdr.put(0b0000, 4)  # sample rate: from STREAMINFO
    hdr.put(0b0000, 4)  # mono
    hdr.put(0b100, 3)  # 16 bits per sample
    hdr.put(0, 1)  # reserved
    header = hdr.to_bytes() + b"\x00"  # frame number 0 (UTF-8 coded)
    header += bytes([n - 1])  # 8-bit block size - 1
    header += bytes([_flac_crc8(header)])

    body = MsbWriter()
    if subframe == "verbatim":
        body.put(0b0_000001_0, 8)
        for s in samples:
            body.put(s & 0xFFFF, 16)
    elif subframe == "constant":
        assert len(set(samples)) == 1
        body.put(0b0_000000_0, 8)
        body.put(samples[0] & 0xFFFF, 16)
    else:
        raise ValueError(subframe)
    frame = header + body.to_bytes()
    frame += struct.pack(">H", _flac_crc16(frame))
    return blob + frame, np.array(samples, dtype=np.int16)


# --------------------------------------------------------------------------
# GIF89a: uncompressed-LZW trick (clear code before every literal)
# --------------------------------------------------------------------------


def make_gif(indices: np.ndarray, palette: list[tuple[int, int, int]]) -> tuple[bytes, np.ndarray]:
    h, w = indices.shape
    assert len(palette) == 4
    blob = b"GIF89a"
    blob += struct.pack("<HH", w, h) + bytes([0x91, 0, 0])  # GCT, 4 entries
    for r, g, b in palette:
        blob += bytes([r, g, b])
    blob += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    min_cs = 2
    clear, eoi = 1 << min_cs, (1 << min_cs) + 1  # 4, 5
    bw = LsbWriter()
    for idx in indices.flatten().tolist():
        bw.put(clear, 3)  # reset before every literal: table never grows
        bw.put(int(idx), 3)
    bw.put(eoi, 3)
    data = bw.to_bytes()
    blob += bytes([min_cs])
    for i in range(0, len(data), 255):
        part = data[i : i + 255]
        blob += bytes([len(part)]) + part
    blob += b"\x00\x3b"
    gray = np.array(
        [[(palette[i][0] + palette[i][1] + palette[i][2]) // 3 for i in row] for row in indices],
        dtype=np.uint8,
    )
    return blob, gray


# --------------------------------------------------------------------------
# TIFF 6.0 LZW: same clear-every-literal construction, MSB-first 9-bit codes
# --------------------------------------------------------------------------


def make_tiff_lzw(gray: np.ndarray) -> tuple[bytes, np.ndarray]:
    h, w = gray.shape
    bw = MsbWriter()
    clear, eoi = 256, 257
    bw.put(clear, 9)
    for v in gray.flatten().tolist():
        bw.put(int(v), 9)
        bw.put(clear, 9)
    bw.put(eoi, 9)
    strip = bw.to_bytes()

    # little-endian classic TIFF, IFD right after the 8-byte header
    entries = []  # (tag, type, count, value)
    strip_off = None  # patched below

    def ifd(strip_offset: int, strip_len: int) -> bytes:
        fields = [
            (256, 3, 1, w),  # ImageWidth SHORT
            (257, 3, 1, h),  # ImageLength
            (258, 3, 1, 8),  # BitsPerSample
            (259, 3, 1, 5),  # Compression = LZW
            (262, 3, 1, 1),  # Photometric = BlackIsZero
            (273, 4, 1, strip_offset),  # StripOffsets
            (277, 3, 1, 1),  # SamplesPerPixel
            (278, 3, 1, h),  # RowsPerStrip
            (279, 4, 1, strip_len),  # StripByteCounts
        ]
        out = struct.pack("<H", len(fields))
        for tag, typ, cnt, val in fields:
            out += struct.pack("<HHII", tag, typ, cnt, val)
        return out + struct.pack("<I", 0)

    ifd_bytes = ifd(0, len(strip))
    strip_off = 8 + len(ifd_bytes)
    blob = b"II*\x00" + struct.pack("<I", 8) + ifd(strip_off, len(strip)) + strip
    return blob, gray.astype(np.uint8)


# --------------------------------------------------------------------------
# PNG (RFC 2083): hand-filtered scanlines + a hand-assembled Adam7 stream
# --------------------------------------------------------------------------


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _filter_row(ft: int, row: list[int], prev: list[int]) -> bytes:
    """Forward-filter one grayscale scanline, written straight from the
    RFC 2083 filter definitions (independent of the repo's encoder)."""
    out = []
    for x, v in enumerate(row):
        a = row[x - 1] if x else 0  # left (already-reconstructed == raw here)
        b = prev[x]
        c = prev[x - 1] if x else 0
        if ft == 0:
            f = v
        elif ft == 1:
            f = v - a
        elif ft == 2:
            f = v - b
        elif ft == 3:
            f = v - ((a + b) // 2)
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            f = v - pr
        out.append(f & 0xFF)
    return bytes([ft]) + bytes(out)


def make_png_filters(gray: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Grayscale PNG whose five scanlines use filters 0..4 (hand-filtered)."""
    h, w = gray.shape
    raw = b""
    for y in range(h):
        prev = gray[y - 1].tolist() if y else [0] * w
        raw += _filter_row(y % 5, gray[y].tolist(), prev)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(raw, 9))
        + _png_chunk(b"IEND", b"")
    )
    return blob, gray.astype(np.uint8)


_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def make_png_adam7(gray: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Interlaced grayscale PNG: each Adam7 pass extracted and filtered
    independently (filter 0 rows — the interlace reassembly is the part
    under test)."""
    h, w = gray.shape
    raw = b""
    for x0, y0, dx, dy in _ADAM7:
        sub = gray[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw += b"\x00" + bytes(row.tolist())
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1))
        + _png_chunk(b"IDAT", zlib.compress(raw, 9))
        + _png_chunk(b"IEND", b"")
    )
    return blob, gray.astype(np.uint8)


# --------------------------------------------------------------------------
# fixture set
# --------------------------------------------------------------------------


def build_all() -> dict:
    OUT.mkdir(parents=True, exist_ok=True)
    manifest: dict[str, dict] = {}
    rng = np.random.default_rng(20260814)

    def add(name: str, blob: bytes, expected: np.ndarray, note: str) -> None:
        (OUT / name).write_bytes(blob)
        manifest[name] = {
            "sha256": hashlib.sha256(blob).hexdigest(),
            "expected_sha256": hashlib.sha256(
                np.ascontiguousarray(expected).tobytes()
            ).hexdigest(),
            "dtype": str(expected.dtype),
            "shape": list(expected.shape),
            "expected": expected.tolist(),
            "note": note,
        }

    ones = np.ones((8, 8), dtype=np.int64)

    blob, exp = make_jpeg([{(0, 0): 16}], ones, 8, 8)
    add("jpeg_dc_only.jpg", blob, exp, "8x8, quant=1, DC=16 -> uniform 130")

    blob, exp = make_jpeg(
        [{(0, 0): -11, (0, 1): -2, (1, 0): -15, (1, 1): -4}], ones, 8, 8
    )
    add("jpeg_dc_ac.jpg", blob, exp, "8x8 with 3 AC coefficients, naive-IDCT expected")

    q = np.full((8, 8), 3, dtype=np.int64)
    q[0, 0] = 16
    blob, exp = make_jpeg([{(0, 0): -5, (0, 1): -4}, {(0, 0): -2, (1, 0): -4}], q, 16, 8)
    add("jpeg_two_blocks.jpg", blob, exp, "16x8, DC prediction across blocks, non-unit quant")

    blob, exp = make_jpeg(
        [{(0, 0): 6}, {(0, 0): 4, (0, 1): 4}, {(0, 0): 3}, {(0, 0): -12, (1, 0): 4}],
        ones, 32, 8, restart_interval=2,
    )
    add("jpeg_restart.jpg", blob, exp, "32x8, DRI=2, RST0 resets DC prediction")

    blob, exp = make_vp8l_solid(5, 3, (255, 30, 90, 150))
    add("vp8l_solid.webp", blob, exp, "5x3 solid ARGB(255,30,90,150) via 1-symbol codes")

    bits = [int(b) for b in rng.integers(0, 2, 24)]
    blob, exp = make_vp8l_two_greens(6, 4, bits, 40, 200, (10, 250, 255))
    add("vp8l_two_greens.webp", blob, exp, "6x4, 2-symbol green code, 1 bit/pixel")

    samples = [0, 1, -1, 1000, -1000, 32767, -32768, 12345, -12345, 7, -7, 255]
    blob, exp = make_flac_mono16(samples, 8000, "verbatim")
    add("flac_verbatim.flac", blob, exp, "mono 16-bit, verbatim subframe, CRC8/16+MD5 from spec")

    blob, exp = make_flac_mono16([-513] * 16, 44100, "constant")
    add("flac_constant.flac", blob, exp, "mono 16-bit, constant subframe")

    idx = rng.integers(0, 4, (5, 7)).astype(np.uint8)
    pal = [(0, 0, 0), (255, 0, 0), (9, 99, 201), (250, 250, 250)]
    blob, exp = make_gif(idx, pal)
    add("gif_uncompressed.gif", blob, exp, "5x7, 4-color GCT, clear-before-every-literal LZW")

    g = rng.integers(0, 256, (4, 11)).astype(np.uint8)
    blob, exp = make_tiff_lzw(g)
    add("tiff_lzw.tif", blob, exp, "4x11 gray, LZW strips of 9-bit clear/literal codes")

    g = rng.integers(0, 256, (5, 9)).astype(np.uint8)
    blob, exp = make_png_filters(g)
    add("png_filters.png", blob, exp, "5x9 gray, scanline filters 0..4 hand-applied")

    g = rng.integers(0, 256, (9, 10)).astype(np.uint8)
    blob, exp = make_png_adam7(g)
    add("png_adam7.png", blob, exp, "9x10 gray, Adam7 passes hand-extracted")

    (OUT / "manifest.json").write_text(json.dumps(manifest, indent=1, sort_keys=True))
    return manifest


if __name__ == "__main__":
    m = build_all()
    for name, meta in sorted(m.items()):
        print(f"{name}: {meta['sha256'][:16]}  {meta['note']}")
