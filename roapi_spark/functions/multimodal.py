"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas`` pipelines.

Contract (the part that matters at 100 TB and is fully real here):
- rows carry ``content: binary`` plus a ``meta`` struct (mime, declared
  dims); blobs never pass through Python row-at-a-time — they arrive in
  Arrow record batches (cap the batch size via
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a batch of blobs
  fits in executor memory);
- decode is a per-batch vectorized function; compute-heavy stages
  repartition first so every core gets batches.

Real image/audio codecs (PIL/libav) are not in this container, so decode
is dispatched: a deterministic synthetic codec (documented below) is
implemented end-to-end for tests; real-codec branches raise
``NotImplementedError`` with the exact dependency needed.

Synthetic formats (deterministic, self-describing):
- image: ``FIMG`` | width u32be | height u32be | width*height gray bytes
- video: ``FVID`` | n_frames u32be | width u32be | height u32be |
  n_frames * (width*height) frame bytes
- audio: ``FAUD`` | sample_rate u32be | n_samples u32be | int16le PCM
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from roapi_spark.plans.registry import register

IMG_MAGIC = b"FIMG"
VID_MAGIC = b"FVID"
AUD_MAGIC = b"FAUD"


# ---- synthetic codec (deterministic; the stand-in for PIL/libav) ---------


def encode_fake_image(width: int, height: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=width * height, dtype=np.uint8)
    return IMG_MAGIC + struct.pack(">II", width, height) + pixels.tobytes()


def encode_fake_video(n_frames: int, width: int, height: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=n_frames * width * height, dtype=np.uint8)
    return VID_MAGIC + struct.pack(">III", n_frames, width, height) + frames.tobytes()


def decode_image(blob: bytes) -> np.ndarray:
    """-> (height, width) uint8 grayscale array.

    Dispatch: FIMG synthetic; uncompressed 24-bit BMP decoded for real
    stdlib-only (the real image container available without PIL —
    header parse, BGR rows, 4-byte row padding, bottom-up/top-down
    orientation; gray = (r+g+b)//3). Anything else gates on the named
    codec dependency."""
    if blob[:4] == IMG_MAGIC:
        if len(blob) < 12:
            raise ValueError("truncated FIMG header")
        w, h = struct.unpack(">II", blob[4:12])
        return np.frombuffer(blob[12 : 12 + w * h], dtype=np.uint8).reshape(h, w)
    if blob[:2] == b"BM":
        try:
            data_off = struct.unpack("<I", blob[10:14])[0]
            hdr_size, w, h = struct.unpack("<Iii", blob[14:26])
            planes, bpp, compression = struct.unpack("<HHI", blob[26:34])
        except struct.error as exc:
            raise ValueError(f"malformed BMP header: {exc}") from exc
        if hdr_size < 40:
            raise NotImplementedError(
                f"BMP header size {hdr_size} (BITMAPCOREHEADER-era) "
                "requires PIL/pillow; only BITMAPINFOHEADER+ decodes here"
            )
        if compression != 0 or bpp != 24:
            raise NotImplementedError(
                f"BMP bpp={bpp} compression={compression} requires "
                "PIL/pillow; only uncompressed 24-bit decodes here"
            )
        bottom_up = h > 0
        h = abs(h)
        if w <= 0 or h == 0 or data_off < 14 + hdr_size:
            raise ValueError(
                f"malformed BMP: width={w} height={h} data_offset={data_off}"
            )
        stride = (3 * w + 3) // 4 * 4  # rows pad to 4 bytes
        need = data_off + stride * h
        if len(blob) < need:
            raise ValueError(f"truncated BMP: {len(blob)} < {need} bytes")
        rows = (
            np.frombuffer(blob[data_off : data_off + stride * h], dtype=np.uint8)
            .reshape(h, stride)[:, : 3 * w]
            .reshape(h, w, 3)
        )
        if bottom_up:
            rows = rows[::-1]
        # BGR -> integer gray (exact: channel sum // 3)
        return (rows.astype(np.uint32).sum(axis=2) // 3).astype(np.uint8)
    if blob[:2] in (b"P5", b"P6"):
        # netpbm binary (PGM gray / PPM rgb): ASCII header tokens
        # (width height maxval) with '#' comments, then raw samples —
        # the second real image container decodable stdlib-only
        vals: list[int] = []
        i = 2
        while len(vals) < 3:
            while i < len(blob) and blob[i : i + 1].isspace():
                i += 1
            if blob[i : i + 1] == b"#":
                while i < len(blob) and blob[i] != 0x0A:
                    i += 1
                continue
            j = i
            while j < len(blob) and not blob[j : j + 1].isspace():
                j += 1
            if i == j:
                raise ValueError("malformed netpbm header: truncated tokens")
            try:
                vals.append(int(blob[i:j]))
            except ValueError as exc:
                raise ValueError(f"malformed netpbm header: {exc}") from exc
            i = j
        w, h, maxval = vals
        i += 1  # exactly one whitespace byte after maxval
        if maxval > 255:
            raise NotImplementedError(
                f"netpbm maxval={maxval} (16-bit samples) requires "
                "PIL/pillow; only 8-bit decodes here"
            )
        if w <= 0 or h <= 0 or maxval <= 0:
            raise ValueError(f"malformed netpbm: w={w} h={h} maxval={maxval}")
        ch = 1 if blob[:2] == b"P5" else 3
        need = i + w * h * ch
        if len(blob) < need:
            raise ValueError(f"truncated netpbm: {len(blob)} < {need} bytes")
        arr = np.frombuffer(blob[i:need], dtype=np.uint8)
        if ch == 1:
            return arr.reshape(h, w)
        return (
            arr.reshape(h, w, 3).astype(np.uint32).sum(axis=2) // 3
        ).astype(np.uint8)
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(blob)
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        try:
            return _decode_gif(blob)
        except (struct.error, IndexError) as exc:
            # truncated headers/descriptors surface as short unpacks;
            # callers get one loud, catchable error type
            raise ValueError(f"malformed GIF: {exc}") from exc
    if blob[:4] in (b"II*\x00", b"MM\x00*"):
        try:
            return _decode_tiff(blob)
        except (struct.error, IndexError) as exc:
            raise ValueError(f"malformed TIFF: {exc}") from exc
    if blob[:2] == b"\xff\xd8":
        from roapi_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(blob)
    if blob[:4] == b"RIFF" and blob[8:12] == b"WEBP":
        from roapi_spark.functions.webp import decode_webp

        return decode_webp(blob)
    # real formats: gate on the actual codec dependency
    raise NotImplementedError(
        "real image decode requires PIL/pillow (not in this container); "
        "only the FIMG synthetic format, uncompressed 24-bit BMP, "
        "8-bit netpbm (PGM/PPM), 8-bit PNG, GIF, baseline+progressive "
        "JPEG, lossless WebP, and baseline TIFF decode here"
    )


# PNG color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, pos: int, h: int, w: int, ch: int) -> tuple[np.ndarray, int]:
    """Unfilter h scanlines of w*ch samples starting at raw[pos]
    (each row: 1 filter byte + stride data). Returns ((h, w*ch) uint8,
    next position). Shared by the sequential and Adam7 paths."""
    stride = w * ch
    need = h * (stride + 1)
    if len(raw) - pos < need:
        raise ValueError(f"PNG scanline data: {len(raw) - pos} < {need}")
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ft = raw[pos]
        line = np.frombuffer(raw[pos + 1 : pos + 1 + stride], dtype=np.uint8)
        pos += 1 + stride
        if ft == 0:
            out[y] = line
        elif ft == 2:  # Up: vectorized, no intra-row dependency
            out[y] = line + out[y - 1] if y else line
        elif ft == 1:  # Sub: exact per-lane prefix sum (addition mod 256
            # is associative, so the left-neighbor recurrence collapses)
            out[y] = np.cumsum(
                line.reshape(w, ch), axis=0, dtype=np.int64
            ).astype(np.uint8).reshape(stride)
        elif ft in (3, 4):  # Average/Paeth depend on decoded left AND up:
            # inherently sequential — plain-int Python loop (5-10x the
            # speed of numpy scalar indexing)
            prev = out[y - 1].tolist() if y else [0] * stride
            rec = line.tolist()
            if ft == 3:
                for x in range(stride):
                    left = rec[x - ch] if x >= ch else 0
                    rec[x] = (rec[x] + ((left + prev[x]) >> 1)) & 0xFF
            else:
                for x in range(stride):
                    a = rec[x - ch] if x >= ch else 0
                    b = prev[x]
                    c = prev[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa = p - a if p >= a else a - p
                    pb = p - b if p >= b else b - p
                    pc = p - c if p >= c else c - p
                    pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    rec[x] = (rec[x] + pr) & 0xFF
            out[y] = rec
        else:
            raise ValueError(f"bad PNG scanline filter type {ft}")
    return out, pos


# Adam7 pass origins/steps: (x0, y0, dx, dy)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _decode_png(blob: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode (zlib inflate + scanline unfilter), the
    third REAL image codec: 8-bit gray/RGB/gray-alpha/RGBA/palette,
    interlace none AND Adam7. 16-bit gates on PIL with the dependency
    named. Chunk CRCs are verified (zlib.crc32) so corruption fails
    loudly instead of decoding garbage."""
    import zlib

    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        if len(data) < length or pos + 12 + length > len(blob):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", blob[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"PLTE":
            if length % 3 or length == 0 or length > 768:
                raise ValueError(f"malformed PNG PLTE length {length}")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("malformed PNG: missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in (0, 2, 3, 4, 6):
        raise NotImplementedError(
            f"PNG bit_depth={depth} color_type={color} requires PIL/pillow; "
            "only 8-bit gray/RGB(A)/palette decodes here"
        )
    if color == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    if comp != 0 or filt != 0 or w == 0 or h == 0:
        raise ValueError(f"malformed PNG IHDR: comp={comp} filt={filt} {w}x{h}")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT inflate failed: {exc}") from exc
    ch = 1 if color == 3 else _PNG_CHANNELS[color]

    if interlace == 0:
        out, pos = _png_unfilter(raw, 0, h, w, ch)
        if pos != len(raw):
            raise ValueError("PNG trailing scanline data")
        px = out.reshape(h, w, ch)
    else:  # Adam7: 7 independently-filtered sub-images, scattered back
        px = np.zeros((h, w, ch), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (w - x0 + dx - 1) // dx
            hp = (h - y0 + dy - 1) // dy
            if wp == 0 or hp == 0:
                continue  # empty pass contributes no data
            sub, pos = _png_unfilter(raw, pos, hp, wp, ch)
            px[y0::dy, x0::dx] = sub.reshape(hp, wp, ch)
        if pos != len(raw):
            raise ValueError("PNG trailing scanline data after Adam7 passes")

    if color == 3:
        idx = px[:, :, 0]
        if int(idx.max()) >= len(plte):
            raise ValueError("PNG palette index out of range")
        rgb = plte[idx]
        return (rgb.astype(np.uint32).sum(axis=2) // 3).astype(np.uint8)
    if color == 0:
        return px[:, :, 0]
    if color == 4:  # gray+alpha: alpha dropped
        return px[:, :, 0]
    # RGB / RGBA: integer gray, alpha dropped — same rule as the BMP branch
    return (px[:, :, :3].astype(np.uint32).sum(axis=2) // 3).astype(np.uint8)


def encode_png(gray: np.ndarray) -> bytes:
    """Deterministic grayscale PNG encoder (stdlib zlib). Scanline filter
    cycles y %% 5 through None/Sub/Up/Average/Paeth so every unfilter
    path in the decoder is load-bearing for a round-trip."""
    import zlib

    h, w = gray.shape
    g = gray.astype(np.int32)
    lines = []
    for y in range(h):
        ft = y % 5
        row = g[y]
        prev = g[y - 1] if y else np.zeros(w, np.int32)
        if ft == 0:
            f = row
        elif ft == 1:  # Sub
            f = (row - np.concatenate(([0], row[:-1]))) & 0xFF
        elif ft == 2:  # Up
            f = (row - prev) & 0xFF
        elif ft == 3:  # Average
            left = np.concatenate(([0], row[:-1]))
            f = (row - ((left + prev) >> 1)) & 0xFF
        else:  # Paeth
            a = np.concatenate(([0], row[:-1]))
            b = prev
            c = np.concatenate(([0], prev[:-1]))
            p = a + b - c
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pr = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
            f = (row - pr) & 0xFF
        lines.append(bytes([ft]) + f.astype(np.uint8).tobytes())
    raw = b"".join(lines)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# TIFF field types -> (struct char, size); the subset classic baseline
# files use for the tags we read
_TIFF_TYPES = {1: ("B", 1), 3: ("H", 2), 4: ("I", 4)}


def _decode_tiff(blob: bytes) -> np.ndarray:
    """Pure-stdlib baseline TIFF decode (TIFF 6.0 baseline, the fifth
    REAL image codec): both byte orders, uncompressed strips, 8-bit
    gray (photometric 0/1) and RGB, multi-strip. LZW/JPEG/deflate
    compression, tiles, and 16-bit samples gate on PIL by name."""
    bo = "<" if blob[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(bo + "I", blob[4:8])
    (n_entries,) = struct.unpack(bo + "H", blob[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        e = ifd_off + 2 + 12 * i
        tag, ftype, count = struct.unpack(bo + "HHI", blob[e : e + 8])
        if ftype not in _TIFF_TYPES:
            continue  # rationals etc. — not needed for the tags we read
        ch, size = _TIFF_TYPES[ftype]
        total = size * count
        if total <= 4:
            raw = blob[e + 8 : e + 8 + total]
        else:
            (off,) = struct.unpack(bo + "I", blob[e + 8 : e + 12])
            raw = blob[off : off + total]
        if len(raw) < total:
            raise ValueError("truncated TIFF tag data")
        tags[tag] = list(struct.unpack(f"{bo}{count}{ch}", raw))

    def one(tag: int, default: int | None = None) -> int:
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"malformed TIFF: missing tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    compression = one(259, 1)
    photometric = one(262)
    spp = one(277, 1)
    bps = tags.get(258, [8])
    predictor = one(317, 1)
    rows_per_strip = one(278, h)
    if compression not in (1, 5, 32773):
        raise NotImplementedError(
            f"TIFF compression {compression} requires PIL/pillow; only "
            "uncompressed / LZW / PackBits strips decode here"
        )
    if any(b != 8 for b in bps):
        raise NotImplementedError(
            f"TIFF bits-per-sample {bps} requires PIL/pillow; only 8-bit "
            "decodes here"
        )
    if 322 in tags or 323 in tags:
        raise NotImplementedError(
            "tiled TIFF requires PIL/pillow; only stripped decodes here"
        )
    if photometric not in (0, 1, 2) or spp not in (1, 3, 4):
        raise NotImplementedError(
            f"TIFF photometric={photometric} spp={spp} requires PIL/pillow"
        )
    if predictor not in (1, 2):
        raise NotImplementedError(
            f"TIFF predictor {predictor} requires PIL/pillow"
        )
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("malformed TIFF: strip offsets/counts")
    if w == 0 or h == 0 or rows_per_strip == 0:
        raise ValueError(f"malformed TIFF dims {w}x{h}/{rows_per_strip}")
    # strips are INDEPENDENTLY compressed; decompress each, then stack
    parts = []
    for si, (o, c) in enumerate(zip(offsets, counts)):
        raw = blob[o : o + c]
        if len(raw) < c:
            raise ValueError("truncated TIFF strip")
        rows = min(rows_per_strip, h - si * rows_per_strip)
        if rows <= 0:
            raise ValueError("TIFF strip count exceeds image height")
        if compression == 5:
            raw = _tiff_lzw_decode(raw, rows * w * spp)
        elif compression == 32773:
            raw = _tiff_packbits_decode(raw, rows * w * spp)
        if len(raw) < rows * w * spp:
            raise ValueError(
                f"short TIFF strip {si}: {len(raw)} < {rows * w * spp}"
            )
        strip = np.frombuffer(
            raw[: rows * w * spp], dtype=np.uint8
        ).reshape(rows, w, spp)
        if predictor == 2:  # horizontal differencing: undo per row/sample
            strip = np.cumsum(strip, axis=1, dtype=np.int64).astype(np.uint8)
        parts.append(strip)
    px = np.concatenate(parts, axis=0)
    if px.shape[0] < h:
        raise ValueError(f"TIFF strips cover {px.shape[0]} of {h} rows")
    px = px[:h]
    if photometric == 2:  # RGB(A): integer gray, extra samples dropped
        return (px[:, :, :3].astype(np.uint32).sum(axis=2) // 3).astype(np.uint8)
    gray = px[:, :, 0]
    if photometric == 0:  # WhiteIsZero: invert to the usual polarity
        gray = (255 - gray.astype(np.int32)).astype(np.uint8)
    return gray


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW (spec §13): MSB-first variable-width codes,
    Clear=256 EOI=257, EARLY code-width change (width grows when the
    next entry to be added would need it, one code sooner than GIF)."""
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    acc = n = 0
    for byte in data:
        acc = (acc << 8) | byte
        n += 8
        while n >= width:
            n -= width
            code = (acc >> n) & ((1 << width) - 1)
            if code == 256:
                reset()
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError(f"bad first TIFF LZW code {code}")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError(f"TIFF LZW code {code} out of range")
            out += entry
            prev = entry
            # EARLY change (the TIFF spec's famous off-by-one): the
            # decoder's table lags the encoder's by one entry, so it
            # must widen one entry sooner than naive LZW would
            if len(table) + 2 >= (1 << width) and width < 12:
                width += 1
            if len(out) >= expected:
                return bytes(out)
    raise ValueError("TIFF LZW stream ended without EOI")


def _tiff_lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = n = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, n
        acc = (acc << width) | code
        n += width
        while n >= 8:
            n -= 8
            out.append((acc >> n) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt, width = 258, 9
    put(256, width)  # leading Clear, as the spec requires
    cur = b""
    for b in data:
        cand = cur + bytes([b])
        if cand in table:
            cur = cand
            continue
        put(table[cur], width)
        table[cand] = nxt
        nxt += 1
        if nxt + 1 >= (1 << width):  # early change, mirror of decode
            width += 1
        if nxt >= 4094:
            put(256, width)
            table = {bytes([i]): i for i in range(256)}
            nxt, width = 258, 9
        cur = bytes([b])
    if cur:
        put(table[cur], width)
    put(257, width)  # EOI
    if n:
        put(0, 8 - n)
    return bytes(out)


def _tiff_packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1
            if i + n + 1 > len(data):
                raise ValueError("truncated TIFF PackBits literal")
            out += data[i : i + n + 1]
            i += n + 1
        elif n == 128:  # noop
            continue
        else:  # repeat next byte 257-n times
            if i >= len(data):
                raise ValueError("truncated TIFF PackBits repeat")
            out += bytes([data[i]]) * (257 - n)
            i += 1
    return bytes(out)


def _tiff_packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        # find a run
        j = i
        while j + 1 < len(data) and data[j + 1] == data[i] and j - i < 126:
            j += 1
        if j > i:  # run of length j-i+1 >= 2
            out.append(257 - (j - i + 1))
            out.append(data[i])
            i = j + 1
            continue
        # literal stretch until the next run of >= 3
        j = i
        while (
            j < len(data)
            and j - i < 127
            and not (
                j + 2 < len(data)
                and data[j] == data[j + 1] == data[j + 2]
            )
        ):
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def encode_tiff(
    gray: np.ndarray,
    big_endian: bool = False,
    compression: str = "none",
    predictor: int = 1,
) -> bytes:
    """Deterministic single-strip 8-bit grayscale TIFF encoder (both
    byte orders; compression 'none'/'lzw'/'packbits'; predictor 2 =
    horizontal differencing) for fixtures/tests."""
    bo = ">" if big_endian else "<"
    h, w = gray.shape
    px = gray.astype(np.uint8)
    if predictor == 2:
        diffed = px.astype(np.int16)
        diffed[:, 1:] = diffed[:, 1:] - px[:, :-1].astype(np.int16)
        px = (diffed & 0xFF).astype(np.uint8)
    elif predictor != 1:
        raise ValueError(f"unsupported predictor {predictor}")
    data = px.tobytes()
    comp_code = {"none": 1, "lzw": 5, "packbits": 32773}[compression]
    if compression == "lzw":
        data = _tiff_lzw_encode(data)
    elif compression == "packbits":
        data = _tiff_packbits_encode(data)
    # layout: header(8) | pixel data | IFD
    ifd_off = 8 + len(data)
    entries = [  # tag, type, count, value  (all short/long, inline)
        (256, 3, 1, w),  # ImageWidth
        (257, 3, 1, h),  # ImageLength
        (258, 3, 1, 8),  # BitsPerSample
        (259, 3, 1, comp_code),  # Compression
        (262, 3, 1, 1),  # Photometric: BlackIsZero
        (273, 4, 1, 8),  # StripOffsets: right after the header
        (277, 3, 1, 1),  # SamplesPerPixel
        (278, 3, 1, h),  # RowsPerStrip: single strip
        (279, 4, 1, len(data)),  # StripByteCounts
    ]
    if predictor != 1:  # 1 is the TIFF default: omit the tag (and keep
        entries.append((317, 3, 1, predictor))  # default blobs bit-stable)
    ifd = struct.pack(bo + "H", len(entries))
    for tag, ftype, count, val in entries:
        packed = struct.pack(bo + ("I" if ftype == 4 else "H"), val)
        packed += b"\x00" * (4 - len(packed))
        ifd += struct.pack(bo + "HHI", tag, ftype, count) + packed
    ifd += struct.pack(bo + "I", 0)  # no next IFD
    hdr = (b"II*\x00" if not big_endian else b"MM\x00*") + struct.pack(
        bo + "I", ifd_off
    )
    return hdr + data + ifd


_LZW_BASE: dict[int, list[bytes]] = {}


def _gif_lzw_decode(min_cs: int, data: bytes, n_expected: int) -> bytes:
    """GIF-variant LZW (GIF89a spec appendix): LSB-first variable-width
    codes, clear/EOI, 12-bit cap, deferred-clear tolerant."""
    clear, eoi = 1 << min_cs, (1 << min_cs) + 1
    base = _LZW_BASE.get(min_cs)
    if base is None:  # literal table is min_cs-determined; build once
        base = _LZW_BASE[min_cs] = (
            [bytes([i]) for i in range(clear)] + [b"", b""]
        )
    table = list(base)
    tlen = len(table)
    width = min_cs + 1
    out = bytearray()
    bitpos, nbits = 0, len(data) * 8
    prev: bytes | None = None
    n_out = 0
    from_bytes = int.from_bytes
    while bitpos + width <= nbits and n_out < n_expected:
        byte_i = bitpos >> 3
        word = from_bytes(data[byte_i : byte_i + 4], "little")
        code = (word >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = list(base)
            tlen = len(table)
            width, prev = min_cs + 1, None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= tlen:
                raise ValueError("corrupt GIF: first code not a literal")
            entry = table[code]
        else:
            if code < tlen:
                entry = table[code]
            elif code == tlen:  # KwKwK special case
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt GIF LZW stream")
            if tlen < 4096:
                table.append(prev + entry[:1])
                tlen += 1
                if tlen == (1 << width) and width < 12:
                    width += 1
        prev = entry
        out += entry
        n_out += len(entry)
    if n_out < n_expected:
        raise ValueError(f"truncated GIF pixel data: {n_out} < {n_expected}")
    return bytes(out[:n_expected])


# interlace passes: (first row, step) per GIF89a appendix E
_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_frames(blob: bytes):
    """Yield (left, top, gray_array) per image descriptor in stream
    order — the shared walk for single-image decode (first frame) and
    animated-GIF video decode (all frames)."""
    w_s, h_s, flags = struct.unpack("<HHB", blob[6:11])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(blob[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    seen = False
    while pos < len(blob):
        b0 = blob[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks, skipped
            pos += 1
            while pos < len(blob) and blob[pos]:
                pos += 1 + blob[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"malformed GIF: unexpected block 0x{b0:02x}")
        left, top, iw, ih, iflags = struct.unpack("<HHHHB", blob[pos : pos + 9])
        pos += 9
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(blob[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("malformed GIF: no color table")
        min_cs = blob[pos]
        pos += 1
        if not 2 <= min_cs <= 11:
            raise ValueError(f"malformed GIF: LZW min code size {min_cs}")
        parts = []
        while pos < len(blob) and blob[pos]:
            n = blob[pos]
            parts.append(blob[pos + 1 : pos + 1 + n])
            pos += 1 + n
        pos += 1
        idx = np.frombuffer(
            _gif_lzw_decode(min_cs, b"".join(parts), iw * ih), dtype=np.uint8
        )
        if idx.max(initial=0) >= len(ct):
            raise ValueError("corrupt GIF: pixel index outside color table")
        gray = (ct[idx].astype(np.uint32).sum(axis=1) // 3).astype(np.uint8)
        img = gray.reshape(ih, iw)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            out = np.empty_like(img)
            src = 0
            for first, step in _GIF_PASSES:
                rows = range(first, ih, step)
                out[list(rows)] = img[src : src + len(rows)]
                src += len(rows)
            img = out
        seen = True
        yield left, top, img
    if not seen:
        raise ValueError("malformed GIF: missing image descriptor")


def _decode_gif(blob: bytes) -> np.ndarray:
    """Pure-stdlib GIF decode (87a/89a), the fourth REAL image codec:
    full variable-width LZW, global/local color tables, Adam-style
    4-pass interlacing, extensions skipped. Animated GIFs decode to
    their first frame here (the thumbnail convention); decode_video
    returns the full frame stack."""
    for _left, _top, img in _gif_frames(blob):
        return img
    raise ValueError("malformed GIF: missing image descriptor")


def _decode_gif_video(blob: bytes) -> np.ndarray:
    """Animated GIF as a (n_frames, h, w) stack — the one real video
    container decodable stdlib-only. Supports the full-frame replace
    shape (every descriptor covers the whole canvas at (0,0), how
    synthesized/screen-capture GIFs are typically written); partial-
    canvas frames require compositing with disposal methods — that
    gates on pyav with the dependency named."""
    frames = []
    for left, top, img in _gif_frames(blob):
        if frames and (left or top or img.shape != frames[0].shape):
            raise NotImplementedError(
                "animated GIF with partial-canvas frames (disposal "
                "compositing) requires pyav/PIL; only full-frame "
                "replacement decodes here"
            )
        frames.append(img)
    return np.stack(frames, axis=0)


def _gif_lzw_encode(min_cs: int, pixels: bytes) -> bytes:
    """GIF-variant LZW encoder (for fixtures/tests): greedy dictionary,
    width growth in lockstep with the decoder, clear at the 4096 cap."""
    clear, eoi = 1 << min_cs, (1 << min_cs) + 1
    out = bytearray()
    acc, accbits = 0, 0

    def emit(code: int, w: int) -> None:
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += w
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    # dictionary keyed on (current code, next byte) int pairs — the
    # classic LZW trick; byte-identical output to the bytes-concat form
    # (greedy parsing is deterministic) without per-pixel bytes allocs
    table: dict[int, int] = {}
    next_code, width = eoi + 1, min_cs + 1
    emit(clear, width)
    cur = -1
    for px in pixels:
        if cur < 0:
            cur = px
            continue
        key = (cur << 8) | px
        nxt = table.get(key)
        if nxt is not None:
            cur = nxt
            continue
        emit(cur, width)
        table[key] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code > 4095:
            emit(clear, width)
            table.clear()
            next_code, width = eoi + 1, min_cs + 1
        cur = px
    if cur >= 0:
        emit(cur, width)
    emit(eoi, width)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_image_block(gray: np.ndarray, interlace: bool) -> bytes:
    h, w = gray.shape
    px = gray
    if interlace:
        px = np.concatenate(
            [gray[first::step] for first, step in _GIF_PASSES], axis=0
        )
    lzw = _gif_lzw_encode(8, px.tobytes())
    blocks = b"".join(
        bytes([len(lzw[i : i + 255])]) + lzw[i : i + 255]
        for i in range(0, len(lzw), 255)
    )
    return (
        b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
        + bytes([8])  # LZW min code size
        + blocks
        + b"\x00"
    )


def encode_gif(gray: np.ndarray, interlace: bool = False) -> bytes:
    """Deterministic grayscale GIF89a encoder (256-entry gray color
    table, real LZW). ``interlace`` writes the 4-pass row order so the
    decoder's de-interlacer is load-bearing in round-trip tests."""
    h, w = gray.shape
    gct = np.repeat(np.arange(256, dtype=np.uint8), 3).tobytes()
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT present, 256 entries
        + gct
        + _gif_image_block(gray, interlace)
        + b"\x3b"
    )


def encode_gif_animation(frames: np.ndarray, delay_cs: int = 4) -> bytes:
    """Animated grayscale GIF89a (full-frame replacement): NETSCAPE2.0
    loop extension + a Graphics Control Extension per frame — the real
    multi-frame container decode_video's GIF branch reads back."""
    n, h, w = frames.shape
    gct = np.repeat(np.arange(256, dtype=np.uint8), 3).tobytes()
    out = [
        b"GIF89a",
        struct.pack("<HHBBB", w, h, 0xF7, 0, 0),
        gct,
        b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00",  # loop forever
    ]
    for i in range(n):
        out.append(
            b"\x21\xf9\x04" + struct.pack("<BHB", 0, delay_cs, 0) + b"\x00"
        )
        out.append(_gif_image_block(frames[i], interlace=False))
    out.append(b"\x3b")
    return b"".join(out)


def encode_bmp(gray: np.ndarray) -> bytes:
    """Canonical uncompressed 24-bit bottom-up BMP encoder
    (stdlib-deterministic): each gray pixel becomes B=G=R bytes, rows
    padded to 4-byte boundaries."""
    h, w = gray.shape
    stride = (3 * w + 3) // 4 * 4
    body = np.zeros((h, stride), dtype=np.uint8)
    bgr = np.repeat(gray[::-1].astype(np.uint8), 3).reshape(h, 3 * w)
    body[:, : 3 * w] = bgr
    data = body.tobytes()
    return (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + len(data), 0, 0, 14 + 40)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
        + data
    )


def encode_fake_audio(sample_rate: int, n_samples: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-2048, 2048, size=n_samples, dtype=np.int16)
    return AUD_MAGIC + struct.pack(">II", sample_rate, n_samples) + pcm.tobytes()


def decode_audio(blob: bytes) -> tuple[int, np.ndarray]:
    """-> (sample_rate, int16 sample array; channel 0 for multi-channel).

    Dispatch: FAUD synthetic; RIFF/WAVE PCM decoded for real via the
    stdlib ``wave`` module (the one real codec available container-side
    — proves the real-format seam end-to-end, including under the
    DuckDB gate via ``multimodal_audio_wav``); anything else gates on
    the named codec dependency."""
    if blob[:4] == AUD_MAGIC:
        if len(blob) < 12:
            raise ValueError("truncated FAUD header")
        rate, n = struct.unpack(">II", blob[4:12])
        return rate, np.frombuffer(blob[12 : 12 + 2 * n], dtype="<i2")
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        import io
        import wave

        try:
            with wave.open(io.BytesIO(blob)) as w:
                rate = w.getframerate()
                channels = w.getnchannels()
                width = w.getsampwidth()
                raw = w.readframes(w.getnframes())
        except (wave.Error, EOFError, RuntimeError, struct.error) as exc:
            # wave.Error/EOFError on most malformed inputs, but CPython's
            # wave also leaks bare RuntimeError (initfp) and struct.error
            # on some truncated headers — normalize them all.
            # The stdlib wave module only reads PCM; companded G.711
            # telephony WAV (format tags 6 = A-law, 7 = mu-law) is decoded
            # by a direct RIFF chunk walk + the public G.711 expansion
            g711 = _try_decode_g711_wav(blob)
            if g711 is not None:
                return g711
            raise ValueError(f"malformed WAV blob: {exc}") from exc
        if width == 2:
            arr = np.frombuffer(raw, dtype="<i2")
        elif width == 1:  # unsigned 8-bit -> centered int16
            arr = ((np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128) << 8)
        else:
            raise NotImplementedError(
                f"{8 * width}-bit WAV requires soundfile; only 8/16-bit "
                "PCM decodes here"
            )
        if channels > 1:
            arr = arr.reshape(-1, channels)[:, 0]
        return rate, arr
    if blob[:4] == b"FORM" and blob[8:12] in (b"AIFF", b"AIFC"):
        # AIFF / AIFF-C via the stdlib aifc module (present through
        # Python 3.12; the second stdlib-decodable real audio container).
        # AIFF PCM is BIG-endian, unlike WAV.
        import io
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            import aifc

        try:
            with aifc.open(io.BytesIO(blob)) as a:
                rate = int(a.getframerate())
                channels = a.getnchannels()
                width = a.getsampwidth()
                comp = a.getcomptype()
                raw = a.readframes(a.getnframes())
        except (aifc.Error, EOFError, RuntimeError, struct.error) as exc:
            raise ValueError(f"malformed AIFF blob: {exc}") from exc
        if comp not in (b"NONE", b"sowt"):
            raise NotImplementedError(
                f"AIFF-C compression {comp!r} requires soundfile/libav; "
                "only PCM decodes here"
            )
        if width != 2:
            raise NotImplementedError(
                f"{8 * width}-bit AIFF requires soundfile; only 16-bit "
                "PCM decodes here"
            )
        # 'sowt' is little-endian PCM; plain AIFF is big-endian
        arr = np.frombuffer(raw, dtype="<i2" if comp == b"sowt" else ">i2")
        arr = arr.astype("<i2")
        if channels > 1:
            arr = arr.reshape(-1, channels)[:, 0]
        return rate, arr
    if blob[:4] == b"fLaC":
        from roapi_spark.functions.flac import decode_flac

        rate, pcm = decode_flac(blob)
        if pcm.ndim > 1:
            pcm = pcm[:, 0]
        return rate, pcm
    raise NotImplementedError(
        "real audio decode requires soundfile/libav (not in this container); "
        "only the FAUD synthetic format, PCM WAV, PCM AIFF, G.711 WAV, "
        "and 16-bit FLAC decode here"
    )


def _g711_ulaw_table() -> np.ndarray:
    """int16 expansion for all 256 mu-law codes (ITU-T G.711)."""
    y = ~np.arange(256, dtype=np.uint8)
    sign = (y & 0x80) != 0
    exp = (y >> 4) & 0x07
    mant = (y & 0x0F).astype(np.int32)
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


def _g711_alaw_table() -> np.ndarray:
    """int16 expansion for all 256 A-law codes (ITU-T G.711)."""
    y = np.arange(256, dtype=np.uint8) ^ 0x55
    positive = (y & 0x80) != 0  # A-law MSB set means POSITIVE (opposite of mu-law)
    exp = ((y >> 4) & 0x07).astype(np.int32)
    mant = (y & 0x0F).astype(np.int32)
    mag = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << (exp - 1))
    return np.where(positive, mag, -mag).astype(np.int16)


_G711_TABLES = {6: _g711_alaw_table, 7: _g711_ulaw_table}


def _try_decode_g711_wav(blob: bytes) -> tuple[int, np.ndarray] | None:
    """RIFF walk for companded telephony WAV: returns (rate, int16) for
    format tags 6/7 (A-law/mu-law), None when the fmt tag is neither (the
    caller keeps its original malformed-WAV error)."""
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        return None
    tag, channels, rate = fmt[0], fmt[1], fmt[2]
    if tag not in _G711_TABLES or fmt[5] != 8 or channels < 1:
        return None
    arr = _G711_TABLES[tag]()[np.frombuffer(data, dtype=np.uint8)]
    if channels > 1:
        arr = arr[: len(arr) - len(arr) % channels].reshape(-1, channels)[:, 0]
    return rate, arr


def _g711_ulaw_compress(pcm: np.ndarray) -> np.ndarray:
    """int16 -> mu-law codes (G.711 encoder, for fixtures/tests)."""
    x = np.clip(pcm.astype(np.int32), -32635, 32635)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.abs(x) + 0x84
    exp = (np.floor(np.log2(mag)).astype(np.int32) - 7).clip(0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant)).astype(np.uint8)


def g711_wav_container(rate: int, codes: bytes) -> bytes:
    """Mono mu-law RIFF/WAVE container (format tag 7) around raw 8-bit
    G.711 codes."""
    return (
        b"RIFF"
        + struct.pack("<I", 38 + len(codes))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHHH", 18, 7, 1, rate, rate, 1, 8, 0)
        + b"data"
        + struct.pack("<I", len(codes))
        + codes
    )


def encode_g711_wav(rate: int, pcm: np.ndarray) -> bytes:
    """Mono mu-law RIFF/WAVE encoder (format tag 7, 8-bit codes)."""
    return g711_wav_container(rate, _g711_ulaw_compress(np.asarray(pcm)).tobytes())


def encode_wav(rate: int, pcm: np.ndarray, channels: int = 1) -> bytes:
    """Canonical RIFF/WAVE PCM encoder (stdlib-deterministic): int16
    samples, interleaved if multi-channel."""
    data = np.ascontiguousarray(pcm, dtype="<i2").tobytes()
    block = channels * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, rate, rate * block, block, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_video(blob: bytes) -> np.ndarray:
    """-> (n_frames, height, width) uint8 array."""
    if blob[:4] == VID_MAGIC:
        if len(blob) < 16:
            raise ValueError("truncated FVID header")
        n, w, h = struct.unpack(">III", blob[4:16])
        return np.frombuffer(blob[16 : 16 + n * w * h], dtype=np.uint8).reshape(n, h, w)
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        try:
            return _decode_gif_video(blob)
        except (struct.error, IndexError) as exc:
            raise ValueError(f"malformed GIF: {exc}") from exc
    if blob[:4] == b"RIFF" and blob[8:12] == b"AVI ":
        from roapi_spark.functions.jpeg import decode_avi_mjpeg

        # frame chunks route back through decode_image, so MJPG (JPEG
        # frames), and any other decodable still format, both work
        return decode_avi_mjpeg(blob, decode_frame=decode_image)
    raise NotImplementedError(
        "real video decode requires pyav/ffmpeg (not in this container); "
        "only the FVID synthetic format, full-frame animated GIF, and "
        "MJPEG-in-AVI decode here"
    )


# ---- operators (mapInPandas — Arrow batches, vectorized per batch) -------

IMAGE_STATS_SCHEMA = (
    "id bigint, width int, height int, mean_pixel double, max_pixel int, n_bytes bigint"
)


def _image_stats_kernel(id_col: str = "id", content_col: str = "content"):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                img = decode_image(bytes(blob))
                out.append(
                    (
                        int(i),
                        img.shape[1],
                        img.shape[0],
                        float(img.mean()),
                        int(img.max()),
                        len(blob),
                    )
                )
            yield pd.DataFrame(
                out, columns=["id", "width", "height", "mean_pixel", "max_pixel", "n_bytes"]
            )

    return run


def image_stats(df: DataFrame, id_col: str = "id", content_col: str = "content") -> DataFrame:
    """Decode + per-image feature extraction. One Python worker per input
    partition; each Arrow batch decodes vectorized."""
    return df.select(id_col, content_col).mapInPandas(
        _image_stats_kernel(id_col, content_col), IMAGE_STATS_SCHEMA
    )


def _fuse(gen, kernel):
    """Compose two mapInPandas kernels into ONE Python stage (guide §4.2
    — fewer Python nodes): the registry's synthesize-then-decode gates
    ran `gen` (encode) and the stats kernel (decode) as two chained
    Python runners in one stage, paying the per-task worker attach twice
    and round-tripping every encoded blob Python -> JVM -> Python.
    Composed, blobs stay inside one worker; both kernels run unchanged,
    so outputs are identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from kernel(gen(batches))

    return run


RESIZE_SCHEMA = "id bigint, content binary, width int, height int"


def _image_resize_kernel(
    out_width: int,
    out_height: int,
    id_col: str = "id",
    content_col: str = "content",
):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                raw = bytes(blob)
                img = decode_image(raw)
                ys = (np.arange(out_height) * img.shape[0] // out_height).clip(0, img.shape[0] - 1)
                xs = (np.arange(out_width) * img.shape[1] // out_width).clip(0, img.shape[1] - 1)
                resized = img[np.ix_(ys, xs)].astype(np.uint8)
                if raw[:2] == b"BM":
                    blob_out = encode_bmp(resized)
                else:
                    blob_out = (
                        IMG_MAGIC
                        + struct.pack(">II", out_width, out_height)
                        + resized.tobytes()
                    )
                rows.append((int(i), blob_out, out_width, out_height))
            yield pd.DataFrame(rows, columns=["id", "content", "width", "height"])

    return run


def image_resize(
    df: DataFrame,
    out_width: int,
    out_height: int,
    id_col: str = "id",
    content_col: str = "content",
) -> DataFrame:
    """Nearest-neighbor resize, re-encoded to the same format the blob
    arrived in (BMP in -> BMP out, FIMG in -> FIMG out). The shape of a
    real pipeline: binary in -> binary out, metadata updated."""
    return df.select(id_col, content_col).mapInPandas(
        _image_resize_kernel(out_width, out_height, id_col, content_col),
        RESIZE_SCHEMA,
    )


FRAME_SAMPLE_SCHEMA = "id bigint, frame_idx int, content binary"


def _frame_sample_kernel(
    every_n: int, id_col: str = "id", content_col: str = "content"
):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                vid = decode_video(bytes(blob))
                for fi in range(0, vid.shape[0], every_n):
                    frame = vid[fi]
                    img = (
                        IMG_MAGIC
                        + struct.pack(">II", frame.shape[1], frame.shape[0])
                        + frame.tobytes()
                    )
                    rows.append((int(i), fi, img))
            yield pd.DataFrame(rows, columns=["id", "frame_idx", "content"])

    return run


def frame_sample(
    df: DataFrame, every_n: int, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """Sample every n-th frame of each video into standalone image rows —
    a fan-out mapInPandas (one input row -> many output rows)."""
    return df.select(id_col, content_col).mapInPandas(
        _frame_sample_kernel(every_n, id_col, content_col), FRAME_SAMPLE_SCHEMA
    )


AUDIO_STATS_SCHEMA = (
    "id bigint, sample_rate int, n_samples bigint, duration_s double, "
    "rms double, peak int"
)


def _audio_stats_kernel(id_col: str = "id", content_col: str = "content"):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                rate, pcm = decode_audio(bytes(blob))
                x = pcm.astype(np.int64)
                rms = float(np.sqrt((x * x).sum() / len(x))) if len(x) else 0.0
                rows.append(
                    (
                        int(i),
                        int(rate),
                        len(x),
                        len(x) / rate,
                        rms,
                        int(np.abs(x).max()) if len(x) else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["id", "sample_rate", "n_samples", "duration_s", "rms", "peak"],
            )

    return run


def audio_stats(df: DataFrame, id_col: str = "id", content_col: str = "content") -> DataFrame:
    """Decode + per-clip features (duration, RMS loudness, peak amplitude)
    — vectorized per Arrow batch, same pipeline shape as image_stats."""
    return df.select(id_col, content_col).mapInPandas(
        _audio_stats_kernel(id_col, content_col), AUDIO_STATS_SCHEMA
    )


def _audio_resample_kernel(
    factor: int, id_col: str = "id", content_col: str = "content"
):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                rate, pcm = decode_audio(bytes(blob))
                out = pcm[::factor]
                rows.append(
                    (
                        int(i),
                        AUD_MAGIC
                        + struct.pack(">II", rate // factor, len(out))
                        + out.tobytes(),
                    )
                )
            yield pd.DataFrame(rows, columns=["id", "content"])

    return run


def audio_resample(
    df: DataFrame, factor: int, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """Integer-factor decimation (every ``factor``-th sample, rate/factor)
    re-encoded as FAUD blobs — the blob-in/blob-out transform shape."""
    return df.select(id_col, content_col).mapInPandas(
        _audio_resample_kernel(factor, id_col, content_col),
        "id bigint, content binary",
    )


def with_meta(df: DataFrame, mime: str, content_col: str = "content") -> DataFrame:
    """Attach the typed metadata struct the multimodal contract expects."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(content_col).cast("bigint").alias("n_bytes"),
        ),
    )


# ---- registry query: the multimodal contract under the correctness gate ---

_MM_W, _MM_H = 16, 8  # deterministic corpus dimensions


@register(
    "multimodal_image_stats",
    oracle=f"""
    WITH px AS (
      SELECT doc_id,
             LIST_TRANSFORM(GENERATE_SERIES(0, {_MM_W * _MM_H - 1}),
                            j -> (doc_id * 31 + j * 7) % 256) AS p
      FROM documents
    )
    SELECT doc_id,
           {_MM_W} AS width,
           {_MM_H} AS height,
           FLOOR(LIST_SUM(p) / {float(_MM_W * _MM_H)} * 10000 + 0.5) / 10000.0
             AS mean_pixel,
           LIST_MAX(p) AS max_pixel,
           CAST({12 + _MM_W * _MM_H} AS BIGINT) AS n_bytes
    FROM px
    """,
    doc="Multimodal pipeline under the correctness gate: a deterministic "
    "FIMG image per document (pixel j = (doc_id*31 + j*7) %% 256) is "
    "encoded to real binary blobs in one mapInPandas stage, shipped "
    "through Arrow batches, decoded by the image_stats operator "
    "(decode_image + vectorized per-batch features), and the resulting "
    "width/height/mean/max/bytes are checked against DuckDB's closed-form "
    "recomputation. The blob path (binary column -> Arrow batch -> numpy "
    "decode) is exactly the real-codec pipeline shape; only decode_image's "
    "format branch differs (PIL absent, FIMG synthetic).",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_image_stats(spark, sf_dir: str) -> DataFrame:
    import os

    from roapi_spark.util import pround

    ids = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                px = bytes((int(i) * 31 + j * 7) % 256 for j in range(_MM_W * _MM_H))
                rows.append(
                    (int(i), IMG_MAGIC + struct.pack(">II", _MM_W, _MM_H) + px)
                )
            yield pd.DataFrame(rows, columns=["id", "content"])

    stats = ids.mapInPandas(
        _fuse(gen, _image_stats_kernel()), IMAGE_STATS_SCHEMA
    )
    return stats.select(
        F.col("id").alias("doc_id"),
        "width",
        "height",
        pround(F.col("mean_pixel")).alias("mean_pixel"),
        "max_pixel",
        "n_bytes",
    )


_AUD_RATE, _AUD_N = 16000, 160  # deterministic corpus clip parameters


@register(
    "multimodal_audio_stats",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             LIST_TRANSFORM(GENERATE_SERIES(0, {_AUD_N - 1}),
                            j -> ((doc_id * 17 + j * 13) % 4096) - 2048) AS x
      FROM documents
    )
    SELECT doc_id,
           {_AUD_RATE} AS sample_rate,
           CAST({_AUD_N} AS BIGINT) AS n_samples,
           {_AUD_N} / {_AUD_RATE}.0 AS duration_s,
           FLOOR(SQRT(LIST_SUM(LIST_TRANSFORM(x, v -> v * v)) / {_AUD_N}.0)
                 * 10000 + 0.5) / 10000.0 AS rms,
           CAST(LIST_MAX(LIST_TRANSFORM(x, v -> ABS(v))) AS INTEGER) AS peak
    FROM s
    """,
    doc="Audio modality under the correctness gate: a deterministic FAUD "
    "clip per document (sample j = ((doc_id*17 + j*13) %% 4096) - 2048) "
    "is encoded to real int16-PCM blobs in one mapInPandas stage, decoded "
    "by the audio_stats operator (decode_audio + vectorized per-batch "
    "loudness features), and duration/RMS/peak are checked against "
    "DuckDB's closed-form recomputation. RMS stays exact cross-engine "
    "because the sum of squares is integer arithmetic until one final "
    "division+sqrt.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_audio_stats(spark, sf_dir: str) -> DataFrame:
    import os

    from roapi_spark.util import pround

    ids = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                pcm = np.array(
                    [((int(i) * 17 + j * 13) % 4096) - 2048 for j in range(_AUD_N)],
                    dtype=np.int16,
                )
                rows.append(
                    (
                        int(i),
                        AUD_MAGIC
                        + struct.pack(">II", _AUD_RATE, _AUD_N)
                        + pcm.tobytes(),
                    )
                )
            yield pd.DataFrame(rows, columns=["id", "content"])

    stats = ids.mapInPandas(
        _fuse(gen, _audio_stats_kernel()), AUDIO_STATS_SCHEMA
    )
    return stats.select(
        F.col("id").alias("doc_id"),
        "sample_rate",
        "n_samples",
        "duration_s",
        pround(F.col("rms")).alias("rms"),
        "peak",
    )


_WAV_RATE, _WAV_N = 8000, 200


@register(
    "multimodal_audio_wav",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             LIST_TRANSFORM(GENERATE_SERIES(0, {_WAV_N - 1}),
                            j -> ((doc_id * 29 + j * 11) % 4096) - 2048) AS x
      FROM documents
    )
    SELECT doc_id,
           {_WAV_RATE} AS sample_rate,
           CAST({_WAV_N} AS BIGINT) AS n_samples,
           {_WAV_N} / {_WAV_RATE}.0 AS duration_s,
           FLOOR(SQRT(LIST_SUM(LIST_TRANSFORM(x, v -> v * v)) / {_WAV_N}.0)
                 * 10000 + 0.5) / 10000.0 AS rms,
           CAST(LIST_MAX(LIST_TRANSFORM(x, v -> ABS(v))) AS INTEGER) AS peak
    FROM s
    """,
    doc="REAL-codec seam under the correctness gate: per document a "
    "stereo RIFF/WAVE PCM blob (channel 0 = the deterministic formula, "
    "channel 1 = silence) is encoded with the canonical WAV writer and "
    "decoded through decode_audio's real-format branch (stdlib wave "
    "module — the actual container format, not the FAUD synthetic). "
    "Channel handling is load-bearing: stats match the oracle only if "
    "the decoder correctly de-interleaves and picks channel 0.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_audio_wav(spark, sf_dir: str) -> DataFrame:
    import os

    from roapi_spark.util import pround

    ids = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                mono = np.array(
                    [((int(i) * 29 + j * 11) % 4096) - 2048 for j in range(_WAV_N)],
                    dtype=np.int16,
                )
                stereo = np.zeros(2 * _WAV_N, dtype=np.int16)
                stereo[0::2] = mono  # channel 0; channel 1 stays silent
                rows.append((int(i), encode_wav(_WAV_RATE, stereo, channels=2)))
            yield pd.DataFrame(rows, columns=["id", "content"])

    stats = ids.mapInPandas(
        _fuse(gen, _audio_stats_kernel()), AUDIO_STATS_SCHEMA
    )
    return stats.select(
        F.col("id").alias("doc_id"),
        "sample_rate",
        "n_samples",
        "duration_s",
        pround(F.col("rms")).alias("rms"),
        "peak",
    )


_VID_FRAMES, _VID_W, _VID_H, _VID_EVERY = 6, 8, 4, 2


@register(
    "multimodal_video_framesample",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, UNNEST(GENERATE_SERIES(0, {_VID_FRAMES - 1}, {_VID_EVERY}))
               AS frame_idx
      FROM documents
    ), px AS (
      SELECT doc_id, frame_idx,
             LIST_TRANSFORM(GENERATE_SERIES(0, {_VID_W * _VID_H - 1}),
               j -> (doc_id * 31 + frame_idx * 101 + j * 7) % 256) AS p
      FROM f
    )
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           {_VID_W} AS width, {_VID_H} AS height,
           FLOOR(LIST_SUM(p) / {float(_VID_W * _VID_H)} * 10000 + 0.5) / 10000.0
             AS mean_pixel,
           LIST_MAX(p) AS max_pixel
    FROM px
    """,
    doc="Video modality under the correctness gate: a deterministic FVID "
    f"clip per document ({_VID_FRAMES} frames of {_VID_W}x{_VID_H}, pixel = "
    "(doc_id*31 + frame*101 + j*7) %% 256) is encoded to real binary blobs "
    f"in one mapInPandas stage, every-{_VID_EVERY}nd frame is sampled by "
    "the fan-out frame_sample operator (1 video row -> N image rows), and "
    "each sampled frame's stats are checked against DuckDB's closed-form "
    "recomputation. Exercises the row-expanding blob pipeline shape "
    "(decode -> per-frame re-encode -> downstream image ops) end-to-end; "
    "only decode_video's format branch differs from a real pyav pipeline.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_video_framesample(spark, sf_dir: str) -> DataFrame:
    import os

    from roapi_spark.util import pround

    ids = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        npx = _VID_W * _VID_H
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                frames = bytes(
                    (int(i) * 31 + f * 101 + j * 7) % 256
                    for f in range(_VID_FRAMES)
                    for j in range(npx)
                )
                rows.append(
                    (
                        int(i),
                        VID_MAGIC
                        + struct.pack(">III", _VID_FRAMES, _VID_W, _VID_H)
                        + frames,
                    )
                )
            yield pd.DataFrame(rows, columns=["id", "content"])

    # image_stats keys by id alone; frames need (id, frame_idx), so the
    # stats stage here carries the frame key through the pandas batch
    def per_frame(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, fi, blob in zip(pdf["id"], pdf["frame_idx"], pdf["content"]):
                img = decode_image(bytes(blob))
                out.append(
                    (int(i), int(fi), img.shape[1], img.shape[0],
                     float(img.mean()), int(img.max()))
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "frame_idx", "width", "height",
                         "mean_pixel", "max_pixel"],
            )

    res = ids.mapInPandas(
        _fuse(gen, _fuse(_frame_sample_kernel(_VID_EVERY), per_frame)),
        "doc_id bigint, frame_idx int, width int, height int, "
        "mean_pixel double, max_pixel int",
    )
    return res.select(
        "doc_id",
        "frame_idx",
        "width",
        "height",
        pround(F.col("mean_pixel")).alias("mean_pixel"),
        "max_pixel",
    )


_KNN_BLOCKS = 8  # block-mean feature dims per image
_KNN_QUERIES = 5
_KNN_TOP = 3


@register(
    "multimodal_image_knn",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id,
             LIST_TRANSFORM(GENERATE_SERIES(0, {_KNN_BLOCKS - 1}), b ->
               CAST(LIST_SUM(LIST_TRANSFORM(
                 GENERATE_SERIES(b * {_MM_W * _MM_H // _KNN_BLOCKS},
                                 (b + 1) * {_MM_W * _MM_H // _KNN_BLOCKS} - 1),
                 j -> (doc_id * 31 + j * 7) % 256)) AS DOUBLE)
               / {_MM_W * _MM_H // _KNN_BLOCKS}) AS f
      FROM documents
    ), q AS (
      SELECT doc_id AS qid, f AS qf FROM feats WHERE doc_id < {_KNN_QUERIES}
    ), scored AS (
      SELECT q.qid, feats.doc_id AS neighbor_id,
             ROUND(LIST_COSINE_SIMILARITY(q.qf, feats.f), 4) AS cos_sim
      FROM q JOIN feats ON feats.doc_id <> q.qid
    ), ranked AS (
      SELECT qid, neighbor_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM scored
    )
    SELECT qid, neighbor_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {_KNN_TOP}
    """,
    doc="Cross-modal retrieval end-to-end: the deterministic FIMG corpus "
    "is decoded in a mapInPandas stage that mean-pools pixel blocks into "
    f"an {_KNN_BLOCKS}-dim feature vector (the stand-in for a real image "
    "encoder — identical plumbing: binary blob in, array<double> out), "
    "then brute-force cosine top-k runs over the extracted features with "
    "the same broadcast-queries/window-rank plan as knn_bruteforce. "
    "DuckDB recomputes features closed-form, so decode + extract + "
    "retrieval are all under the exact-value gate.",
    tags=("multimodal", "similarity", "pandas-udf"),
)
def multimodal_image_knn(spark, sf_dir: str) -> DataFrame:
    import os

    from pyspark.sql import Window as W

    from roapi_spark.functions.similarity import cosine_expr

    ids = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select("doc_id")
    npx = _MM_W * _MM_H
    blk = npx // _KNN_BLOCKS

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                px = bytes((int(i) * 31 + j * 7) % 256 for j in range(npx))
                rows.append(
                    (int(i), IMG_MAGIC + struct.pack(">II", _MM_W, _MM_H) + px)
                )
            yield pd.DataFrame(rows, columns=["id", "content"])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf["id"], pdf["content"]):
                img = decode_image(bytes(blob)).reshape(-1)
                f = [float(img[b * blk : (b + 1) * blk].sum()) / blk
                     for b in range(_KNN_BLOCKS)]
                rows.append((int(i), f))
            yield pd.DataFrame(rows, columns=["doc_id", "f"])

    # materialize the extracted features once: without the barrier the
    # broadcast query side re-runs the fused pandas stage over the full
    # corpus just to find its 5 rows — 2x the decode cost at any scale
    feats = ids.mapInPandas(
        _fuse(gen, extract), "doc_id bigint, f array<double>"
    ).localCheckpoint(eager=False)
    q = feats.filter(F.col("doc_id") < _KNN_QUERIES).select(
        F.col("doc_id").alias("qid"), F.col("f").alias("qf")
    )
    scored = (
        feats.join(F.broadcast(q), F.col("doc_id") != F.col("qid"))
        .withColumn("cos_sim", F.round(cosine_expr("qf", "f"), 4))
        .select("qid", F.col("doc_id").alias("neighbor_id"), "cos_sim")
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _KNN_TOP)
        .select("qid", "neighbor_id", "cos_sim", F.col("rnk").cast("bigint").alias("rnk"))
    )


_RSZ_W, _RSZ_H = 8, 4  # resize target (source images are 16x8)


@register(
    "multimodal_image_resize",
    oracle=f"""
    WITH px AS (
      SELECT doc_id,
             LIST_TRANSFORM(GENERATE_SERIES(0, {_RSZ_W * _RSZ_H - 1}), k ->
               (doc_id * 31
                + ((k // {_RSZ_W}) * ({_MM_H} // {_RSZ_H}) * {_MM_W}
                   + (k % {_RSZ_W}) * ({_MM_W} // {_RSZ_W})) * 7) % 256) AS p
      FROM documents
    )
    SELECT doc_id, {_RSZ_W} AS width, {_RSZ_H} AS height,
           FLOOR(LIST_SUM(p) / {float(_RSZ_W * _RSZ_H)} * 10000 + 0.5) / 10000.0
             AS mean_pixel,
           LIST_MAX(p) AS max_pixel,
           CAST({12 + _RSZ_W * _RSZ_H} AS BIGINT) AS n_bytes
    FROM px
    """,
    doc="Blob-in/blob-out image transform under the gate: the FIMG corpus "
    f"is nearest-neighbor-resized {_MM_W}x{_MM_H} -> {_RSZ_W}x{_RSZ_H} by "
    "the image_resize operator (decode -> index-map -> re-encode in one "
    "Arrow-batched stage), then the resized blobs flow through "
    "image_stats; DuckDB recomputes the sampled pixel grid closed-form "
    "(resized[y,x] = src[y*2, x*2]). Pins both the resize arithmetic and "
    "the re-encoded container layout (n_bytes).",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_image_resize(spark, sf_dir: str) -> DataFrame:
    import os

    from roapi_spark.util import pround

    ids = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                px = bytes((int(i) * 31 + j * 7) % 256 for j in range(_MM_W * _MM_H))
                rows.append(
                    (int(i), IMG_MAGIC + struct.pack(">II", _MM_W, _MM_H) + px)
                )
            yield pd.DataFrame(rows, columns=["id", "content"])

    stats = ids.mapInPandas(
        _fuse(gen, _fuse(_image_resize_kernel(_RSZ_W, _RSZ_H),
                         _image_stats_kernel())),
        IMAGE_STATS_SCHEMA,
    )
    return stats.select(
        F.col("id").alias("doc_id"),
        "width",
        "height",
        pround(F.col("mean_pixel")).alias("mean_pixel"),
        "max_pixel",
        "n_bytes",
    )


_RS_FACTOR = 2


@register(
    "multimodal_audio_resample",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             LIST_TRANSFORM(GENERATE_SERIES(0, {_AUD_N - 1}, {_RS_FACTOR}),
               j -> ((doc_id * 17 + j * 13) % 4096) - 2048) AS x
      FROM documents
    )
    SELECT doc_id,
           {_AUD_RATE // _RS_FACTOR} AS sample_rate,
           CAST(LEN(x) AS BIGINT) AS n_samples,
           FLOOR(SQRT(LIST_SUM(LIST_TRANSFORM(x, v -> v * v))
                      / CAST(LEN(x) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS rms,
           CAST(LIST_MAX(LIST_TRANSFORM(x, v -> ABS(v))) AS INTEGER) AS peak
    FROM s
    """,
    doc="Blob-in/blob-out audio transform under the gate: FAUD clips are "
    f"decimated by {_RS_FACTOR} (every {_RS_FACTOR}nd sample, rate "
    f"{_AUD_RATE} -> {_AUD_RATE // _RS_FACTOR}) by the audio_resample "
    "operator, re-encoded, and the resampled blobs flow through "
    "audio_stats; DuckDB recomputes the decimated series closed-form. "
    "Integer sample math keeps RMS exact cross-engine.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_audio_resample(spark, sf_dir: str) -> DataFrame:
    import os

    from roapi_spark.util import pround

    ids = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                pcm = np.array(
                    [((int(i) * 17 + j * 13) % 4096) - 2048 for j in range(_AUD_N)],
                    dtype=np.int16,
                )
                rows.append(
                    (
                        int(i),
                        AUD_MAGIC
                        + struct.pack(">II", _AUD_RATE, _AUD_N)
                        + pcm.tobytes(),
                    )
                )
            yield pd.DataFrame(rows, columns=["id", "content"])

    stats = ids.mapInPandas(
        _fuse(gen, _fuse(_audio_resample_kernel(_RS_FACTOR),
                         _audio_stats_kernel())),
        AUDIO_STATS_SCHEMA,
    )
    return stats.select(
        F.col("id").alias("doc_id"),
        "sample_rate",
        "n_samples",
        pround(F.col("rms")).alias("rms"),
        "peak",
    )


_ALIGN_DIMS = _KNN_BLOCKS  # image block-means vs text letter-bucket counts


@register(
    "multimodal_alignment",
    oracle=f"""
    WITH txt AS (
      SELECT doc_id,
             LIST_TRANSFORM(GENERATE_SERIES(1, LENGTH(COALESCE(
               REGEXP_REPLACE(LOWER(text), '[^a-z]', '', 'g'), ''))),
               i -> SUBSTRING(REGEXP_REPLACE(LOWER(text), '[^a-z]', '', 'g'),
                              i, 1)) AS chars
      FROM documents
    ), tf AS (
      SELECT doc_id,
             LIST_TRANSFORM(GENERATE_SERIES(0, {_ALIGN_DIMS - 1}), b ->
               CAST(LEN(LIST_FILTER(chars,
                 ch -> (ASCII(ch) - 97) % {_ALIGN_DIMS} = b)) AS DOUBLE)) AS tfv
      FROM txt WHERE LEN(chars) >= 1
    ), imf AS (
      SELECT doc_id,
             LIST_TRANSFORM(GENERATE_SERIES(0, {_ALIGN_DIMS - 1}), b ->
               CAST(LIST_SUM(LIST_TRANSFORM(
                 GENERATE_SERIES(b * {_MM_W * _MM_H // _ALIGN_DIMS},
                                 (b + 1) * {_MM_W * _MM_H // _ALIGN_DIMS} - 1),
                 j -> (doc_id * 31 + j * 7) % 256)) AS DOUBLE)
               / {_MM_W * _MM_H // _ALIGN_DIMS}) AS imv
      FROM documents
    )
    SELECT tf.doc_id,
           ROUND(LIST_COSINE_SIMILARITY(imv, tfv), 4) AS alignment,
           ROUND(LIST_COSINE_SIMILARITY(imv, tfv), 4) >= 0.5 AS aligned
    FROM tf JOIN imf ON tf.doc_id = imf.doc_id
    """,
    doc="Cross-modal alignment filtering (the LAION-style curation step: "
    "drop image-text pairs whose embeddings disagree): the image side is "
    "the block-mean feature from the decoded FIMG blob (Arrow-batched "
    "mapInPandas), the text side is a letter-bucket frequency vector "
    "computed JVM-side, and the alignment score is their cosine — the "
    "plumbing of a real CLIP-score filter with deterministic stand-in "
    "encoders. Zero-letter docs are dropped on both engines (zero-vector "
    "cosine is undefined). One doc_id equi-join; both feature extractions "
    "are map-side.",
    tags=("multimodal", "quality", "pandas-udf"),
)
def multimodal_alignment(spark, sf_dir: str) -> DataFrame:
    import os

    from roapi_spark.functions.similarity import cosine_expr
    from roapi_spark.util import pround

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    npx = _MM_W * _MM_H
    blk = npx // _ALIGN_DIMS

    # Pixel synthesis vectorized: (i*31 + j*7) % 256 over a precomputed
    # j-ramp instead of a per-byte Python generator (the generator was
    # npx Python-level ops per row).
    _js7 = np.arange(npx, dtype=np.int64) * 7

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hdr = IMG_MAGIC + struct.pack(">II", _MM_W, _MM_H)
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                px = ((int(i) * 31 + _js7) % 256).astype(np.uint8).tobytes()
                rows.append((int(i), hdr + px))
            yield pd.DataFrame(rows, columns=["id", "content"])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf["id"], pdf["content"]):
                img = decode_image(bytes(blob)).reshape(-1)
                # exact: uint8 sums fit int64; float64 holds them exactly
                f = (
                    img.reshape(_ALIGN_DIMS, blk).sum(axis=1, dtype=np.int64)
                    / blk
                ).tolist()
                rows.append((int(i), f))
            yield pd.DataFrame(rows, columns=["doc_id", "imv"])

    imf = d.select("doc_id").mapInPandas(
        _fuse(gen, extract), "doc_id bigint, imv array<double>"
    )
    # Bucket counts as one native regexp_count scan per bucket (8 codegen'd
    # scans of the cleaned string) instead of materializing a per-char
    # array and running 8 interpreted filter-lambda passes over it. Bucket
    # b holds letters {k : k % DIMS == b}, so counting membership in the
    # explicit char class is the same number as the (ascii-97) % DIMS
    # filter. Zero-letter docs drop via length(cleaned) >= 1, same as
    # size(chars) >= 1.
    cleaned = F.coalesce(F.regexp_replace(F.lower("text"), "[^a-z]", ""), F.lit(""))
    _buckets = [
        "".join(chr(97 + k) for k in range(26) if k % _ALIGN_DIMS == b)
        for b in range(_ALIGN_DIMS)
    ]
    tfv = F.array(
        *[
            F.regexp_count(F.col("cleaned"), F.lit(f"[{bs}]")).cast("double")
            for bs in _buckets
        ]
    )
    tf = (
        d.select("doc_id", cleaned.alias("cleaned"))
        .filter(F.length("cleaned") >= 1)
        .select("doc_id", tfv.alias("tfv"))
    )
    joined = tf.join(imf, "doc_id")
    cos = F.round(cosine_expr("imv", "tfv"), 4)
    return joined.select(
        "doc_id",
        cos.alias("alignment"),
        (cos >= 0.5).alias("aligned"),
    )


_BMP_W, _BMP_H = 7, 5  # odd width: the 4-byte row padding is load-bearing


@register(
    "multimodal_image_bmp",
    oracle=f"""
    WITH px AS (
      SELECT doc_id,
             LIST_TRANSFORM(GENERATE_SERIES(0, {_BMP_W * _BMP_H - 1}),
                            j -> (doc_id * 37 + j * 11) % 256) AS p
      FROM documents
    )
    SELECT doc_id,
           {_BMP_W} AS width,
           {_BMP_H} AS height,
           FLOOR(LIST_SUM(p) / {float(_BMP_W * _BMP_H)} * 10000 + 0.5) / 10000.0
             AS mean_pixel,
           LIST_MAX(p) AS max_pixel,
           CAST({54 + ((3 * _BMP_W + 3) // 4 * 4) * _BMP_H} AS BIGINT) AS n_bytes
    FROM px
    """,
    doc="REAL image codec seam under the correctness gate (the image "
    "counterpart of multimodal_audio_wav): per document a deterministic "
    f"{_BMP_W}x{_BMP_H} grayscale image (pixel j = (doc_id*37 + j*11) %% "
    "256) is encoded as an uncompressed 24-bit BMP — a real container "
    "format, stdlib-only — and decoded through decode_image's BMP "
    "branch. The odd width makes the 4-byte row padding and bottom-up "
    "row order load-bearing: stats match the oracle only if both are "
    "handled exactly.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_image_bmp(spark, sf_dir: str) -> DataFrame:
    import os

    from roapi_spark.util import pround

    ids = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                flat = np.array(
                    [(int(i) * 37 + j * 11) % 256 for j in range(_BMP_W * _BMP_H)],
                    dtype=np.uint8,
                )
                rows.append((int(i), encode_bmp(flat.reshape(_BMP_H, _BMP_W))))
            yield pd.DataFrame(rows, columns=["id", "content"])

    stats = ids.mapInPandas(
        _fuse(gen, _image_stats_kernel()), IMAGE_STATS_SCHEMA
    )
    return stats.select(
        F.col("id").alias("doc_id"),
        "width",
        "height",
        pround(F.col("mean_pixel")).alias("mean_pixel"),
        "max_pixel",
        "n_bytes",
    )


# dHash geometry: resize to 9x8 by nearest neighbor, compare horizontal
# neighbors -> 64 bits. xs are the standard floor(x*W/9) sample columns.
_DH_XS = [x * _MM_W // 9 for x in range(9)]


@register(
    "multimodal_image_dhash",
    oracle=f"""
    WITH px AS (
      SELECT doc_id,
             LIST_TRANSFORM(GENERATE_SERIES(0, {_MM_W * _MM_H - 1}),
                            j -> ((doc_id % 50) * 31 + j * 7) % 256) AS p
      FROM documents
    ),
    xs AS (SELECT {_DH_XS} AS v),
    bits AS (
      SELECT px.doc_id,
             STRING_AGG(
               CASE WHEN px.p[y.y * {_MM_W} + xs.v[x.x + 2] + 1]
                       > px.p[y.y * {_MM_W} + xs.v[x.x + 1] + 1]
                    THEN '1' ELSE '0' END,
               '' ORDER BY y.y, x.x) AS dhash
      FROM px
        CROSS JOIN xs
        CROSS JOIN GENERATE_SERIES(0, 7) AS y(y)
        CROSS JOIN GENERATE_SERIES(0, 7) AS x(x)
      GROUP BY px.doc_id
    )
    SELECT dhash,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id
    FROM bits GROUP BY dhash
    """,
    doc="Perceptual-hash image dedup (difference hash, Krawetz): each "
    "document's image (pixel formula keyed by doc_id %% 50, so exact "
    "duplicate groups exist by construction) is encoded as a REAL "
    "uncompressed BMP, decoded through the BMP branch, nearest-neighbor "
    "resampled to 9x8 and hashed by horizontal-gradient sign — 64 bits "
    "rendered as a portable bit-string. Groups collapse on the hash "
    "(keep lowest doc_id). Python touches bytes once per blob in the "
    "Arrow-batched decode; the dedup itself is a 64-char-key groupBy — "
    "the multimodal twin of dedup_exact at any scale.",
    tags=("multimodal", "dedup", "pandas-udf"),
)
def multimodal_image_dhash(spark, sf_dir: str) -> DataFrame:
    import os

    ids = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                flat = np.array(
                    [((int(i) % 50) * 31 + j * 7) % 256
                     for j in range(_MM_W * _MM_H)],
                    dtype=np.uint8,
                )
                rows.append((int(i), encode_bmp(flat.reshape(_MM_H, _MM_W))))
            yield pd.DataFrame(rows, columns=["id", "content"])

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xs = np.array(_DH_XS)
        for pdf in batches:
            out = []
            for i, blob in zip(pdf["id"], pdf["content"]):
                img = decode_image(bytes(blob))
                ys = (np.arange(8) * img.shape[0] // 8).clip(0, img.shape[0] - 1)
                r = img[np.ix_(ys, xs.clip(0, img.shape[1] - 1))].astype(np.int32)
                bits = (r[:, 1:] > r[:, :-1]).astype(np.uint8).ravel()
                out.append((int(i), "".join("1" if b else "0" for b in bits)))
            yield pd.DataFrame(out, columns=["doc_id", "dhash"])

    hashed = ids.mapInPandas(
        _fuse(gen, hash_batch), "doc_id bigint, dhash string"
    )
    return hashed.groupBy("dhash").agg(
        F.count("*").alias("n_images"),
        F.min("doc_id").alias("keep_doc_id"),
    )


_PPM_W, _PPM_H = 19, 11  # odd width: no padding in netpbm, but exercises
#                          the P6 rgb -> integer-gray channel-sum path
_PPM_HDR = f"P6\n{_PPM_W} {_PPM_H}\n255\n".encode()


@register(
    "multimodal_image_ppm",
    oracle=f"""
    WITH px AS (
      SELECT doc_id,
             LIST_TRANSFORM(GENERATE_SERIES(0, {_PPM_W * _PPM_H - 1}),
                            j -> (doc_id * 53 + j * 13) % 256) AS p
      FROM documents
    )
    SELECT doc_id,
           {_PPM_W} AS width,
           {_PPM_H} AS height,
           FLOOR(LIST_SUM(p) / {float(_PPM_W * _PPM_H)} * 10000 + 0.5) / 10000.0
             AS mean_pixel,
           LIST_MAX(p) AS max_pixel,
           CAST({len(_PPM_HDR) + 3 * _PPM_W * _PPM_H} AS BIGINT) AS n_bytes
    FROM px
    """,
    doc="Second REAL image codec under the correctness gate: per document "
    f"a deterministic {_PPM_W}x{_PPM_H} image (pixel j = (doc_id*53 + "
    "j*13) %% 256) encoded as binary P6 netpbm with r=g=b — decoded "
    "through decode_image's netpbm branch, whose channel-sum gray "
    "((r+g+b)//3 = the pixel, exactly) must round-trip for the stats to "
    "match the oracle.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_image_ppm(spark, sf_dir: str) -> DataFrame:
    import os

    from roapi_spark.util import pround

    ids = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                flat = np.array(
                    [(int(i) * 53 + j * 13) % 256 for j in range(_PPM_W * _PPM_H)],
                    dtype=np.uint8,
                )
                rgb = np.repeat(flat, 3).tobytes()  # r=g=b per pixel
                rows.append((int(i), _PPM_HDR + rgb))
            yield pd.DataFrame(rows, columns=["id", "content"])

    stats = ids.mapInPandas(
        _fuse(gen, _image_stats_kernel()), IMAGE_STATS_SCHEMA
    )
    return stats.select(
        F.col("id").alias("doc_id"),
        "width",
        "height",
        pround(F.col("mean_pixel")).alias("mean_pixel"),
        "max_pixel",
        "n_bytes",
    )


_PNG_W, _PNG_H = 23, 11  # >= 10 rows so the y%5 filter cycle covers
#                          every scanline filter type at least twice


@register(
    "multimodal_image_png",
    oracle=f"""
    WITH px AS (
      SELECT doc_id,
             LIST_TRANSFORM(GENERATE_SERIES(0, {_PNG_W * _PNG_H - 1}),
                            j -> (doc_id * 59 + j * 17) % 256) AS p
      FROM documents
    )
    SELECT doc_id,
           {_PNG_W} AS width,
           {_PNG_H} AS height,
           FLOOR(LIST_SUM(p) / {float(_PNG_W * _PNG_H)} * 10000 + 0.5) / 10000.0
             AS mean_pixel,
           LIST_MAX(p) AS max_pixel
    FROM px
    """,
    doc="Third REAL image codec under the correctness gate: per document "
    f"a deterministic {_PNG_W}x{_PNG_H} grayscale image (pixel j = "
    "(doc_id*59 + j*17) %% 256) is encoded as a genuine PNG (stdlib "
    "zlib deflate, chunk CRCs, scanline filter cycling y%%5 through "
    "None/Sub/Up/Average/Paeth) and decoded through decode_image's PNG "
    "branch — inflate + all five unfilter paths must round-trip exactly "
    "for the stats to match the oracle. n_bytes is omitted from the "
    "projection because deflate output length is not SQL-expressible.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_image_png(spark, sf_dir: str) -> DataFrame:
    import os

    from roapi_spark.util import pround

    ids = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )  # the id frame is tiny but the codec work is Python: fill all cores

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                flat = (
                    (int(i) * 59 + np.arange(_PNG_W * _PNG_H) * 17) % 256
                ).astype(np.uint8)
                rows.append((int(i), encode_png(flat.reshape(_PNG_H, _PNG_W))))
            yield pd.DataFrame(rows, columns=["id", "content"])

    stats = ids.mapInPandas(
        _fuse(gen, _image_stats_kernel()), IMAGE_STATS_SCHEMA
    )
    return stats.select(
        F.col("id").alias("doc_id"),
        "width",
        "height",
        pround(F.col("mean_pixel")).alias("mean_pixel"),
        "max_pixel",
    )


_AIFF_RATE, _AIFF_N = 8000, 160


@register(
    "multimodal_audio_aiff",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             LIST_TRANSFORM(GENERATE_SERIES(0, {_AIFF_N - 1}),
                            j -> ((doc_id * 41 + j * 13) % 4096) - 2048) AS x
      FROM documents
    )
    SELECT doc_id,
           {_AIFF_RATE} AS sample_rate,
           CAST({_AIFF_N} AS BIGINT) AS n_samples,
           {_AIFF_N} / {_AIFF_RATE}.0 AS duration_s,
           FLOOR(SQRT(LIST_SUM(LIST_TRANSFORM(x, v -> v * v)) / {_AIFF_N}.0)
                 * 10000 + 0.5) / 10000.0 AS rms,
           CAST(LIST_MAX(LIST_TRANSFORM(x, v -> ABS(v))) AS INTEGER) AS peak
    FROM s
    """,
    doc="Second REAL audio codec under the correctness gate: per document "
    "a stereo PCM AIFF blob (big-endian samples — the opposite byte "
    "order from WAV — channel 0 = the deterministic formula, channel 1 "
    "silence) written with the stdlib aifc module and decoded through "
    "decode_audio's AIFF branch. Byte order AND de-interleaving are "
    "load-bearing for the oracle match.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_audio_aiff(spark, sf_dir: str) -> DataFrame:
    import os

    from roapi_spark.util import pround

    ids = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            import aifc

        class _KeepOpen(io.BytesIO):
            def close(self):  # aifc closes the sink; keep the bytes
                pass

        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                mono = np.array(
                    [((int(i) * 41 + j * 13) % 4096) - 2048
                     for j in range(_AIFF_N)],
                    dtype=np.int16,
                )
                stereo = np.zeros(2 * _AIFF_N, dtype=">i2")
                stereo[0::2] = mono
                buf = _KeepOpen()
                with aifc.open(buf, "wb") as a:
                    a.setnchannels(2)
                    a.setsampwidth(2)
                    a.setframerate(_AIFF_RATE)
                    a.writeframes(stereo.tobytes())
                rows.append((int(i), buf.getvalue()))
            yield pd.DataFrame(rows, columns=["id", "content"])

    stats = ids.mapInPandas(
        _fuse(gen, _audio_stats_kernel()), AUDIO_STATS_SCHEMA
    )
    return stats.select(
        F.col("id").alias("doc_id"),
        "sample_rate",
        "n_samples",
        "duration_s",
        pround(F.col("rms")).alias("rms"),
        "peak",
    )


_G711_RATE, _G711_N = 8000, 160


@register(
    "multimodal_audio_g711",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             LIST_TRANSFORM(GENERATE_SERIES(0, {_G711_N - 1}), j -> (
               -- G.711 mu-law expansion of code c = (doc_id*37 + j*11) % 256:
               -- invert, split sign/exponent/mantissa, segment-expand
               CASE WHEN (255 - (doc_id * 37 + j * 11) % 256) >= 128
                    THEN -((((255 - (doc_id * 37 + j * 11) % 256) % 16) * 8 + 132)
                           * (1 << (((255 - (doc_id * 37 + j * 11) % 256) // 16) % 8))
                           - 132)
                    ELSE  ((((255 - (doc_id * 37 + j * 11) % 256) % 16) * 8 + 132)
                           * (1 << (((255 - (doc_id * 37 + j * 11) % 256) // 16) % 8))
                           - 132)
               END)) AS x
      FROM documents
    )
    SELECT doc_id,
           {_G711_RATE} AS sample_rate,
           CAST({_G711_N} AS BIGINT) AS n_samples,
           {_G711_N} / {_G711_RATE}.0 AS duration_s,
           FLOOR(SQRT(LIST_SUM(LIST_TRANSFORM(x, v -> v * v)) / {_G711_N}.0)
                 * 10000 + 0.5) / 10000.0 AS rms,
           CAST(LIST_MAX(LIST_TRANSFORM(x, v -> ABS(v))) AS INTEGER) AS peak
    FROM s
    """,
    doc="Third REAL audio codec under the correctness gate: companded "
    "G.711 mu-law telephony WAV (format tag 7 — the stdlib wave module "
    "cannot read it, so the RIFF chunk walk + numpy expansion table are "
    "load-bearing). Per document the 8-bit code stream c_j = (doc_id*37 "
    "+ j*11) %% 256 is wrapped in a real mu-law WAV container and decoded "
    "through decode_audio; the oracle re-derives the ITU expansion "
    "(invert, sign/exponent/mantissa segment-expand) in pure SQL, so a "
    "single wrong table entry breaks the rms/peak hash.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_audio_g711(spark, sf_dir: str) -> DataFrame:
    import os

    from roapi_spark.util import pround

    ids = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                codes = (
                    (int(i) * 37 + np.arange(_G711_N) * 11) % 256
                ).astype(np.uint8)
                rows.append((int(i), g711_wav_container(_G711_RATE, codes.tobytes())))
            yield pd.DataFrame(rows, columns=["id", "content"])

    stats = ids.mapInPandas(
        _fuse(gen, _audio_stats_kernel()), AUDIO_STATS_SCHEMA
    )
    return stats.select(
        F.col("id").alias("doc_id"),
        "sample_rate",
        "n_samples",
        "duration_s",
        pround(F.col("rms")).alias("rms"),
        "peak",
    )


_GIF_W, _GIF_H = 17, 13


@register(
    "multimodal_image_gif",
    oracle=f"""
    WITH px AS (
      SELECT doc_id,
             LIST_TRANSFORM(GENERATE_SERIES(0, {_GIF_W * _GIF_H - 1}),
                            j -> (doc_id * 67 + j * 19) % 256) AS p
      FROM documents
    )
    SELECT doc_id,
           {_GIF_W} AS width,
           {_GIF_H} AS height,
           FLOOR(LIST_SUM(p) / {float(_GIF_W * _GIF_H)} * 10000 + 0.5) / 10000.0
             AS mean_pixel,
           LIST_MAX(p) AS max_pixel
    FROM px
    """,
    doc="Fourth REAL image codec under the correctness gate: per document "
    f"a deterministic {_GIF_W}x{_GIF_H} grayscale image (pixel j = "
    "(doc_id*67 + j*19) %% 256) encoded as a genuine GIF89a — 256-entry "
    "color table and full variable-width LZW, with every ODD doc_id "
    "written interlaced so the 4-pass de-interlacer is load-bearing — "
    "then decoded through decode_image's GIF branch. LZW dictionary "
    "growth, width sync, and row reordering must all round-trip exactly "
    "for the stats to match the oracle. n_bytes omitted (LZW output "
    "length is not SQL-expressible).",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_image_gif(spark, sf_dir: str) -> DataFrame:
    import os

    from roapi_spark.util import pround

    ids = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                flat = (
                    (int(i) * 67 + np.arange(_GIF_W * _GIF_H) * 19) % 256
                ).astype(np.uint8)
                blob = encode_gif(
                    flat.reshape(_GIF_H, _GIF_W), interlace=bool(int(i) % 2)
                )
                rows.append((int(i), blob))
            yield pd.DataFrame(rows, columns=["id", "content"])

    stats = ids.mapInPandas(
        _fuse(gen, _image_stats_kernel()), IMAGE_STATS_SCHEMA
    )
    return stats.select(
        F.col("id").alias("doc_id"),
        "width",
        "height",
        pround(F.col("mean_pixel")).alias("mean_pixel"),
        "max_pixel",
    )


_TIF_W, _TIF_H = 21, 12


@register(
    "multimodal_image_tiff",
    oracle=f"""
    WITH px AS (
      SELECT doc_id,
             LIST_TRANSFORM(GENERATE_SERIES(0, {_TIF_W * _TIF_H - 1}),
                            j -> (doc_id * 71 + j * 23) % 256) AS p
      FROM documents
    )
    SELECT doc_id,
           {_TIF_W} AS width,
           {_TIF_H} AS height,
           FLOOR(LIST_SUM(p) / {float(_TIF_W * _TIF_H)} * 10000 + 0.5) / 10000.0
             AS mean_pixel,
           LIST_MAX(p) AS max_pixel,
           CAST({8 + _TIF_W * _TIF_H + 2 + 9 * 12 + 4} AS BIGINT) AS n_bytes
    FROM px
    """,
    doc="Fifth REAL image codec under the correctness gate: per document "
    f"a deterministic {_TIF_W}x{_TIF_H} grayscale image (pixel j = "
    "(doc_id*71 + j*23) %% 256) written as a genuine single-strip "
    "baseline TIFF — EVEN doc_ids little-endian (II), ODD big-endian "
    "(MM), so both byte-order paths of the IFD walk are load-bearing — "
    "and decoded through decode_image's TIFF branch. The fixed header+"
    "IFD layout makes n_bytes SQL-expressible, unlike PNG/GIF.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_image_tiff(spark, sf_dir: str) -> DataFrame:
    import os

    from roapi_spark.util import pround

    ids = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                flat = (
                    (int(i) * 71 + np.arange(_TIF_W * _TIF_H) * 23) % 256
                ).astype(np.uint8)
                blob = encode_tiff(
                    flat.reshape(_TIF_H, _TIF_W), big_endian=bool(int(i) % 2)
                )
                rows.append((int(i), blob))
            yield pd.DataFrame(rows, columns=["id", "content"])

    stats = ids.mapInPandas(
        _fuse(gen, _image_stats_kernel()), IMAGE_STATS_SCHEMA
    )
    return stats.select(
        F.col("id").alias("doc_id"),
        "width",
        "height",
        pround(F.col("mean_pixel")).alias("mean_pixel"),
        "max_pixel",
        "n_bytes",
    )


_VGIF_N, _VGIF_W, _VGIF_H = 4, 13, 9


@register(
    "multimodal_video_gif",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, UNNEST(GENERATE_SERIES(0, {_VGIF_N - 1})) AS frame_idx
      FROM documents
    ), px AS (
      SELECT doc_id, frame_idx,
             LIST_TRANSFORM(GENERATE_SERIES(0, {_VGIF_W * _VGIF_H - 1}),
               j -> (doc_id * 43 + frame_idx * 97 + j * 29) % 256) AS p
      FROM f
    )
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           {_VGIF_W} AS width, {_VGIF_H} AS height,
           FLOOR(LIST_SUM(p) / {float(_VGIF_W * _VGIF_H)} * 10000 + 0.5) / 10000.0
             AS mean_pixel,
           LIST_MAX(p) AS max_pixel
    FROM px
    """,
    doc="REAL video container under the correctness gate: per document an "
    f"animated GIF89a ({_VGIF_N} full-canvas frames of "
    f"{_VGIF_W}x{_VGIF_H}, pixel = (doc_id*43 + frame*97 + j*29) %% 256, "
    "NETSCAPE loop + per-frame Graphics Control Extensions, real LZW per "
    "frame) decoded through decode_video's GIF branch into a frame stack; "
    "per-frame stats must match DuckDB's closed-form recomputation. "
    "The extension-skipping walk, per-frame LZW, and frame stacking are "
    "all load-bearing.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_video_gif(spark, sf_dir: str) -> DataFrame:
    import os

    from roapi_spark.util import pround

    ids = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        npx = _VGIF_W * _VGIF_H
        base = np.arange(npx, dtype=np.int64) * 29
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                frames = np.stack(
                    [
                        ((int(i) * 43 + f * 97 + base) % 256)
                        .astype(np.uint8)
                        .reshape(_VGIF_H, _VGIF_W)
                        for f in range(_VGIF_N)
                    ]
                )
                rows.append((int(i), encode_gif_animation(frames)))
            yield pd.DataFrame(rows, columns=["id", "content"])

    def per_frame(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, blob in zip(pdf["id"], pdf["content"]):
                stack = decode_video(bytes(blob))
                for fi in range(stack.shape[0]):
                    img = stack[fi]
                    out.append(
                        (
                            int(i),
                            int(fi),
                            img.shape[1],
                            img.shape[0],
                            float(img.mean()),
                            int(img.max()),
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "frame_idx", "width", "height",
                    "mean_pixel", "max_pixel",
                ],
            )

    stats = ids.mapInPandas(
        _fuse(gen, per_frame),
        "doc_id bigint, frame_idx int, width int, height int, "
        "mean_pixel double, max_pixel int",
    )
    return stats.withColumn("mean_pixel", pround(F.col("mean_pixel")))


_JPG_BW, _JPG_BH = 3, 2  # blocks per row / per column (image 24x16)


@register(
    "multimodal_image_jpeg",
    oracle=f"""
    WITH b AS (
      SELECT doc_id,
             LIST_TRANSFORM(GENERATE_SERIES(0, {_JPG_BW * _JPG_BH - 1}),
               j -> (doc_id * 31 + (j % {_JPG_BW}) * 7
                     + (j // {_JPG_BW}) * 13) % 256) AS v
      FROM documents
    )
    SELECT doc_id,
           {_JPG_BW * 8} AS width,
           {_JPG_BH * 8} AS height,
           FLOOR(LIST_SUM(v) / {float(_JPG_BW * _JPG_BH)} * 10000 + 0.5)
             / 10000.0 AS mean_pixel,
           LIST_MAX(v) AS max_pixel
    FROM b
    """,
    doc="REAL JPEG (ITU T.81 baseline sequential, std Annex-K Huffman "
    "tables) under the correctness gate: per document a mosaic image "
    f"whose 8x8 block (bx,by) is the CONSTANT (doc_id*31+bx*7+by*13)%256 "
    "— with an all-ones quant table such a block's DCT is exactly "
    "integer (DC=8c, AC=0), so the full entropy-decode -> dequant -> "
    "IDCT chain round-trips bit-exactly and the stats match a closed-"
    "form DuckDB recomputation. Marker parse, Huffman DC path, EOB "
    "handling and the vectorized IDCT are all load-bearing "
    "(functions/jpeg.py; AC and chroma paths are pytest-covered where "
    "lossy rounding forbids an exact oracle).",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_image_jpeg(spark, sf_dir: str) -> DataFrame:
    import os

    from roapi_spark.functions.jpeg import encode_jpeg
    from roapi_spark.util import pround

    ids = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bx = np.arange(_JPG_BW, dtype=np.int64)[None, :] * 7
        by = np.arange(_JPG_BH, dtype=np.int64)[:, None] * 13
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                blocks = ((int(i) * 31 + bx + by) % 256).astype(np.uint8)
                img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
                rows.append((int(i), encode_jpeg(img)))
            yield pd.DataFrame(rows, columns=["id", "content"])

    stats = ids.mapInPandas(
        _fuse(gen, _image_stats_kernel()), IMAGE_STATS_SCHEMA
    )
    return stats.select(
        F.col("id").alias("doc_id"),
        "width",
        "height",
        pround(F.col("mean_pixel")).alias("mean_pixel"),
        "max_pixel",
    )


_MJPG_N, _MJPG_BW, _MJPG_BH = 3, 2, 2  # frames; blocks/row; blocks/col


@register(
    "multimodal_video_mjpeg",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, UNNEST(GENERATE_SERIES(0, {_MJPG_N - 1})) AS frame_idx
      FROM documents
    ), b AS (
      SELECT doc_id, frame_idx,
             LIST_TRANSFORM(GENERATE_SERIES(0, {_MJPG_BW * _MJPG_BH - 1}),
               j -> (doc_id * 37 + frame_idx * 101 + (j % {_MJPG_BW}) * 11
                     + (j // {_MJPG_BW}) * 19) % 256) AS v
      FROM f
    )
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           {_MJPG_BW * 8} AS width, {_MJPG_BH * 8} AS height,
           FLOOR(LIST_SUM(v) / {float(_MJPG_BW * _MJPG_BH)} * 10000 + 0.5)
             / 10000.0 AS mean_pixel,
           LIST_MAX(v) AS max_pixel
    FROM b
    """,
    doc="SECOND real video container under the correctness gate: per "
    f"document a RIFF AVI whose 'MJPG' stream holds {_MJPG_N} baseline-"
    "JPEG '00dc' frames (block-constant mosaics, exact round trip as in "
    "multimodal_image_jpeg). The RIFF chunk-tree walk (LIST/hdrl/movi, "
    "word alignment), per-frame JPEG decode, and frame stacking are all "
    "load-bearing (functions/jpeg.py:encode_avi_mjpeg/decode_avi_mjpeg).",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_video_mjpeg(spark, sf_dir: str) -> DataFrame:
    import os

    from roapi_spark.functions.jpeg import encode_avi_mjpeg
    from roapi_spark.util import pround

    ids = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bx = np.arange(_MJPG_BW, dtype=np.int64)[None, :] * 11
        by = np.arange(_MJPG_BH, dtype=np.int64)[:, None] * 19
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                frames = np.stack(
                    [
                        np.repeat(
                            np.repeat(
                                ((int(i) * 37 + f * 101 + bx + by) % 256
                                 ).astype(np.uint8),
                                8, axis=0,
                            ),
                            8, axis=1,
                        )
                        for f in range(_MJPG_N)
                    ]
                )
                rows.append((int(i), encode_avi_mjpeg(frames)))
            yield pd.DataFrame(rows, columns=["id", "content"])

    def per_frame(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, blob in zip(pdf["id"], pdf["content"]):
                stack = decode_video(bytes(blob))
                for fi in range(stack.shape[0]):
                    img = stack[fi]
                    out.append(
                        (int(i), int(fi), img.shape[1], img.shape[0],
                         float(img.mean()), int(img.max()))
                    )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "frame_idx", "width", "height",
                         "mean_pixel", "max_pixel"],
            )

    stats = ids.mapInPandas(
        _fuse(gen, per_frame),
        "doc_id bigint, frame_idx int, width int, height int, "
        "mean_pixel double, max_pixel int",
    )
    return stats.withColumn("mean_pixel", pround(F.col("mean_pixel")))


@register(
    "multimodal_image_jpeg_progressive",
    oracle=f"""
    WITH b AS (
      SELECT doc_id,
             LIST_TRANSFORM(GENERATE_SERIES(0, {_JPG_BW * _JPG_BH - 1}),
               j -> (doc_id * 53 + (j % {_JPG_BW}) * 17
                     + (j // {_JPG_BW}) * 23) % 256) AS v
      FROM documents
    )
    SELECT doc_id,
           {_JPG_BW * 8} AS width,
           {_JPG_BH * 8} AS height,
           FLOOR(LIST_SUM(v) / {float(_JPG_BW * _JPG_BH)} * 10000 + 0.5)
             / 10000.0 AS mean_pixel,
           LIST_MAX(v) AS max_pixel
    FROM b
    """,
    doc="PROGRESSIVE JPEG (SOF2) under the correctness gate — most "
    "web-crawl JPEGs are progressive, so baseline alone cannot read a "
    "real corpus. Per document the block-constant mosaic is encoded as "
    "a 4-scan progression (interleaved DC first at Al=1, DC refinement, "
    "per-component AC spectral 1..63 with EOBn run coding + full "
    "refinement with correction bits, per-scan DHT redefinition) and "
    "decoded through the scan-accumulating coefficient stores "
    "(functions/jpeg.py:_decode_scan_into). Successive approximation, "
    "EOB-run bookkeeping, and the multi-scan marker walk are all "
    "load-bearing for the exact oracle match.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_image_jpeg_progressive(spark, sf_dir: str) -> DataFrame:
    import os

    from roapi_spark.functions.jpeg import encode_jpeg_progressive
    from roapi_spark.util import pround

    ids = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bx = np.arange(_JPG_BW, dtype=np.int64)[None, :] * 17
        by = np.arange(_JPG_BH, dtype=np.int64)[:, None] * 23
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                blocks = ((int(i) * 53 + bx + by) % 256).astype(np.uint8)
                img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
                rows.append((int(i), encode_jpeg_progressive(img)))
            yield pd.DataFrame(rows, columns=["id", "content"])

    stats = ids.mapInPandas(
        _fuse(gen, _image_stats_kernel()), IMAGE_STATS_SCHEMA
    )
    return stats.select(
        F.col("id").alias("doc_id"),
        "width",
        "height",
        pround(F.col("mean_pixel")).alias("mean_pixel"),
        "max_pixel",
    )


def phash64(gray: np.ndarray) -> int:
    """DCT-based 64-bit perceptual hash (the standard pHash recipe the
    big image-dedup pipelines use, e.g. LAION's): downsample to 32x32
    (area mean when dims divide evenly, else nearest), 2D DCT-II, keep
    the top-left 8x8 low-frequency block, threshold each coefficient
    against the median of the 63 non-DC coefficients, pack row-major
    (DC contributes bit 0 vs the same median). Identical pixels =>
    identical hash; small perceptual edits flip few bits, so near-dup
    detection is a Hamming-ball / band join over the hash."""
    from roapi_spark.functions.jpeg import dct_matrix

    h, w = gray.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if h % 32 == 0 and w % 32 == 0:
        small = (
            gray.reshape(32, h // 32, 32, w // 32)
            .mean(axis=(1, 3))
        )
    else:
        yi = (np.arange(32) * h) // 32
        xi = (np.arange(32) * w) // 32
        small = gray[np.ix_(yi, xi)].astype(np.float64)
    c32 = dct_matrix(32)
    coef = (c32 @ small @ c32.T)[:8, :8].reshape(64)
    med = np.median(coef[1:])
    bits = coef > med
    return int(sum(1 << i for i in range(64) if bits[i]))


_PHASH_SEEDS = 17  # distinct images in the corpus -> cluster size ~n/17


@register(
    "multimodal_image_phash",
    oracle=f"""
    SELECT doc_id,
           CAST(COUNT(*) OVER (PARTITION BY doc_id % {_PHASH_SEEDS})
                AS BIGINT) AS cluster_size
    FROM documents
    """,
    doc="Perceptual-hash image dedup (pHash: 32x32 downsample -> 2D DCT "
    "-> low-frequency median threshold -> 64-bit hash) over a corpus "
    "where each document's image is a DETERMINISTIC function of "
    f"doc_id %% {_PHASH_SEEDS}: docs sharing a seed have identical "
    "pixels, hence identical hashes; distinct seeds produce distinct "
    "hashes (verified by the oracle equality itself — a collision or "
    "any nondeterminism in the decode->resize->DCT->hash chain would "
    "change a cluster size). The blobs are real JPEGs, so the full "
    "JPEG decode path runs under this gate too. Spark side: hash in "
    "mapInPandas, then one groupBy-count join on the hash — at 100 TB "
    "the same shape as every hash-based dedup (shuffle on hash key).",
    tags=("multimodal", "dedup", "pandas-udf"),
)
def multimodal_image_phash(spark, sf_dir: str) -> DataFrame:
    import os

    from roapi_spark.functions.jpeg import encode_jpeg

    ids = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # 48x24 block-constant mosaic per SEED (not per doc): the
        # non-multiple-of-32 dims force the nearest-neighbor resize
        # path. The pattern must differ STRUCTURALLY per seed — pHash is
        # deliberately invariant to constant brightness shifts (only the
        # DC coefficient moves), so `seed*K + pattern` would collide
        # every seed onto one hash. A per-seed rng gives independent
        # block layouts.
        blobs = {
            s: encode_jpeg(
                np.repeat(
                    np.repeat(
                        np.random.default_rng(1000 + s).integers(
                            0, 256, size=(3, 6), dtype=np.uint8
                        ),
                        8, axis=0,
                    ),
                    8, axis=1,
                )
            )
            for s in range(_PHASH_SEEDS)
        }
        for pdf in batches:
            rows = [
                (int(i), blobs[int(i) % _PHASH_SEEDS]) for i in pdf["doc_id"]
            ]
            yield pd.DataFrame(rows, columns=["id", "content"])

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # content-addressed within the task, mirroring gen's per-seed blob
        # memo above: identical bytes decode+hash once (the production
        # image-dedup shape — LAION et al. key derived features on the
        # content digest). Every DISTINCT image still runs the full JPEG
        # decode -> DCT -> hash chain, so the gate keeps its teeth.
        memo: dict[bytes, int] = {}
        for pdf in batches:
            out = []
            for i, blob in zip(pdf["id"], pdf["content"]):
                b = bytes(blob)
                ph = memo.get(b)
                if ph is None:
                    ph = memo[b] = phash64(decode_image(b))
                out.append((int(i), ph))
            yield pd.DataFrame(out, columns=["doc_id", "ph"])

    from pyspark.sql import Window as W

    hashed = ids.mapInPandas(
        _fuse(gen, hash_batch), "doc_id bigint, ph decimal(20,0)"
    )
    # window count over the hash: ONE pass over the decode stage and one
    # shuffle on ph (a groupBy+self-join would re-run the whole decode
    # pipeline for the second branch)
    return hashed.select(
        "doc_id",
        F.count("*").over(W.partitionBy("ph")).cast("bigint").alias("cluster_size"),
    )


_FLAC_RATE, _FLAC_N = 16000, 400


@register(
    "multimodal_audio_flac",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             LIST_TRANSFORM(GENERATE_SERIES(0, {_FLAC_N - 1}),
                            j -> ((doc_id * 37 + j * 11) % 4096) - 2048) AS x
      FROM documents
    )
    SELECT doc_id,
           {_FLAC_RATE} AS sample_rate,
           CAST({_FLAC_N} AS BIGINT) AS n_samples,
           {_FLAC_N} / {_FLAC_RATE}.0 AS duration_s,
           FLOOR(SQRT(LIST_SUM(LIST_TRANSFORM(x, v -> v * v)) / {_FLAC_N}.0)
                 * 10000 + 0.5) / 10000.0 AS rms,
           CAST(LIST_MAX(LIST_TRANSFORM(x, v -> ABS(v))) AS INTEGER) AS peak
    FROM s
    """,
    doc="REAL FLAC under the correctness gate — speech corpora "
    "(LibriSpeech, MLS) ship FLAC, and it is lossless, so the full "
    "compressed path must round-trip bit-exactly: per document a STEREO "
    "mid-side-encoded FLAC (channel 0 = the deterministic formula, "
    "channel 1 = a second formula) with order-searched fixed "
    "predictors and Rice residuals, decoded through decode_audio's "
    "fLaC branch (functions/flac.py: frame CRC-8/CRC-16 + STREAMINFO "
    "MD5 all verified during decode). Mid-side reconstruction and "
    "channel-0 extraction are load-bearing for the oracle match.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_audio_flac(spark, sf_dir: str) -> DataFrame:
    import os

    from roapi_spark.functions.flac import encode_flac
    from roapi_spark.util import pround

    ids = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        j = np.arange(_FLAC_N, dtype=np.int64)
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                ch0 = (((int(i) * 37 + j * 11) % 4096) - 2048).astype(np.int16)
                ch1 = (((int(i) * 13 + j * 7) % 4096) - 2048).astype(np.int16)
                st = np.stack([ch0, ch1], axis=1)
                rows.append(
                    (int(i), encode_flac(_FLAC_RATE, st, stereo_mode="ms"))
                )
            yield pd.DataFrame(rows, columns=["id", "content"])

    stats = ids.mapInPandas(
        _fuse(gen, _audio_stats_kernel()), AUDIO_STATS_SCHEMA
    )
    return stats.select(
        F.col("id").alias("doc_id"),
        "sample_rate",
        "n_samples",
        "duration_s",
        pround(F.col("rms")).alias("rms"),
        "peak",
    )


_WEBP_W, _WEBP_H = 21, 13


@register(
    "multimodal_image_webp",
    oracle=f"""
    WITH px AS (
      SELECT doc_id,
             LIST_TRANSFORM(GENERATE_SERIES(0, {_WEBP_W * _WEBP_H - 1}),
                            j -> (doc_id * 61 + j * 23) % 256) AS p
      FROM documents
    )
    SELECT doc_id,
           {_WEBP_W} AS width,
           {_WEBP_H} AS height,
           FLOOR(LIST_SUM(p) / {float(_WEBP_W * _WEBP_H)} * 10000 + 0.5)
             / 10000.0 AS mean_pixel,
           LIST_MAX(p) AS max_pixel
    FROM px
    """,
    doc="REAL WebP (lossless VP8L) under the correctness gate — the "
    "third pillar of web image corpora next to JPEG and PNG. Per "
    f"document a deterministic {_WEBP_W}x{_WEBP_H} grayscale image "
    "(pixel j = (doc_id*61 + j*23) %% 256) is encoded as genuine VP8L "
    "(canonical Huffman trees via the code-length metacode, LZ77 "
    "backward references, a 5-bit color cache, the subtract-green "
    "transform) and decoded through decode_image's RIFF/WEBP branch "
    "(functions/webp.py). VP8L is lossless, so the stats must match the "
    "closed-form DuckDB recomputation exactly — the LSB-first "
    "bitstream, tree rebuild, cache hashing, and inverse transform are "
    "all load-bearing.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_image_webp(spark, sf_dir: str) -> DataFrame:
    import os

    from roapi_spark.functions.webp import encode_webp
    from roapi_spark.util import pround

    ids = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base = np.arange(_WEBP_W * _WEBP_H, dtype=np.int64) * 23
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                flat = ((int(i) * 61 + base) % 256).astype(np.uint8)
                rgb = np.stack([flat.reshape(_WEBP_H, _WEBP_W)] * 3, axis=2)
                rows.append(
                    (int(i),
                     encode_webp(rgb, use_lz77=True, cache_bits=5,
                                 subtract_green=True))
                )
            yield pd.DataFrame(rows, columns=["id", "content"])

    stats = ids.mapInPandas(
        _fuse(gen, _image_stats_kernel()), IMAGE_STATS_SCHEMA
    )
    return stats.select(
        F.col("id").alias("doc_id"),
        "width",
        "height",
        pround(F.col("mean_pixel")).alias("mean_pixel"),
        "max_pixel",
    )
