"""Delta Lake deletion-vector decoding — pure Python, public spec only.

Sources: the Delta protocol's PROTOCOL.md ("Deletion Vectors" +
"Deletion Vector Descriptor Schema" + "Deletion Vector File Storage
Format") and the RoaringFormatSpec (github.com/RoaringBitmap/
RoaringFormatSpec) for the standard 32-bit bitmap serialization. The
reference engine reads DVs via delta-rs (columnq/src/table/delta.rs:
104-297); this module gives the no-jars log replay the same row-level
delete semantics.

Layout recap:

- ``add.deletionVector`` descriptor: ``storageType`` of ``u`` (relative
  file, path derived from a z85-encoded UUID), ``p`` (absolute path) or
  ``i`` (inline, z85-encoded blob); ``offset`` locates the blob in the
  file; ``cardinality`` is the number of deleted row indexes.
- DV file: 1-byte format version (1), then per-DV blobs, each stored as
  ``[dataSize: int32 BE][blob: dataSize bytes][crc32: int32 BE]`` with
  ``offset`` pointing at the size prefix.
- blob: ``[magic 1681511377: int32 LE][RoaringBitmapArray "portable"]``:
  ``[bitmapCount: int64 LE]`` then per 32-bit bitmap ``[key: int32 LE]
  [standard roaring bitmap]``. Deleted row index = ``key << 32 | value``.
- standard roaring bitmap (RoaringFormatSpec): cookie 12346 (+ int32
  container count) or 12347 (run-capable, count embedded, run bitset),
  16-bit container keys + cardinalities, then array / bitset / run
  containers. Container value contributes ``containerKey << 16 | v``.
"""

from __future__ import annotations

import os
import struct
import zlib

MAGIC = 1681511377
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347

# z85 alphabet (ZeroMQ RFC 32) — what Delta uses for UUIDs/inline DVs
_Z85 = "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
_Z85_INV = {c: i for i, c in enumerate(_Z85)}


class DeletionVectorError(ValueError):
    pass


def z85_decode(s: str) -> bytes:
    if len(s) % 5:
        raise DeletionVectorError(f"z85 length {len(s)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for c in s[i : i + 5]:
            try:
                v = v * 85 + _Z85_INV[c]
            except KeyError:
                raise DeletionVectorError(f"invalid z85 character {c!r}") from None
        out += struct.pack(">I", v)
    return bytes(out)


def z85_encode(b: bytes) -> str:
    if len(b) % 4:
        raise DeletionVectorError(f"z85 input length {len(b)} not a multiple of 4")
    out = []
    for i in range(0, len(b), 4):
        (v,) = struct.unpack(">I", b[i : i + 4])
        chunk = ""
        for _ in range(5):
            chunk = _Z85[v % 85] + chunk
            v //= 85
        out.append(chunk)
    return "".join(out)


def _decode_roaring32(buf: bytes, off: int) -> tuple[list[int], int]:
    """Decode one standard-format 32-bit roaring bitmap starting at
    ``off``; returns (sorted values, next offset)."""
    (cookie16,) = struct.unpack_from("<H", buf, off)
    run_bitset = b""
    if cookie16 == _SERIAL_COOKIE:
        (n_minus1,) = struct.unpack_from("<H", buf, off + 2)
        n = n_minus1 + 1
        off += 4
        nb = (n + 7) // 8
        run_bitset = buf[off : off + nb]
        off += nb
    else:
        (cookie,) = struct.unpack_from("<I", buf, off)
        if cookie != _SERIAL_COOKIE_NO_RUN:
            raise DeletionVectorError(f"bad roaring cookie {cookie}")
        (n,) = struct.unpack_from("<I", buf, off + 4)
        off += 8
    keys_cards = []
    for _ in range(n):
        k, c = struct.unpack_from("<HH", buf, off)
        keys_cards.append((k, c + 1))
        off += 4
    # offset header present unless (run-capable and n < 4)
    if cookie16 != _SERIAL_COOKIE or n >= 4:
        off += 4 * n
    values: list[int] = []
    for i, (key, card) in enumerate(keys_cards):
        is_run = bool(run_bitset) and bool(run_bitset[i // 8] & (1 << (i % 8)))
        base = key << 16
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, off)
            off += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, off)
                off += 4
                values.extend(range(base | start, (base | start) + length + 1))
        elif card > 4096:  # bitset container: 8 KiB fixed
            words = struct.unpack_from("<1024Q", buf, off)
            off += 8192
            for wi, w in enumerate(words):
                while w:
                    low = w & -w
                    values.append(base | (wi << 6) | low.bit_length() - 1)
                    w ^= low
        else:  # array container
            vals = struct.unpack_from(f"<{card}H", buf, off)
            off += 2 * card
            values.extend(base | v for v in vals)
    return values, off


def decode_dv_blob(blob: bytes) -> list[int]:
    """Deleted row indexes from a DV blob (magic + RoaringBitmapArray)."""
    (magic,) = struct.unpack_from("<I", blob, 0)
    if magic != MAGIC:
        raise DeletionVectorError(f"bad deletion-vector magic {magic}")
    (n_bitmaps,) = struct.unpack_from("<Q", blob, 4)
    off = 12
    out: list[int] = []
    for _ in range(n_bitmaps):
        (high,) = struct.unpack_from("<I", blob, off)
        off += 4
        vals, off = _decode_roaring32(blob, off)
        out.extend((high << 32) | v for v in vals)
    return out


def _dv_file_path(descriptor: dict, table_path: str) -> str:
    st = descriptor["storageType"]
    p = descriptor["pathOrInlineDv"]
    if st == "p":
        return p
    # "u": [<random prefix>]<20-char z85 uuid>; file lives at
    # <table>/[<prefix>/]deletion_vector_<uuid>.bin
    prefix, enc = p[:-20], p[-20:]
    raw = z85_decode(enc)
    import uuid as _uuid

    u = _uuid.UUID(bytes=raw[:16])
    name = f"deletion_vector_{u}.bin"
    return os.path.join(table_path, prefix, name) if prefix else os.path.join(
        table_path, name
    )


def read_deletion_vector(descriptor: dict, table_path: str) -> list[int]:
    """Deleted row indexes for one ``add.deletionVector`` descriptor."""
    st = descriptor.get("storageType")
    if st == "i":
        return decode_dv_blob(z85_decode(descriptor["pathOrInlineDv"]))
    if st not in ("u", "p"):
        raise DeletionVectorError(f"unknown DV storageType {st!r}")
    path = _dv_file_path(descriptor, table_path)
    size = int(descriptor["sizeInBytes"])
    offset = int(descriptor.get("offset") or 0)
    with open(path, "rb") as f:
        f.seek(offset)
        (data_size,) = struct.unpack(">I", f.read(4))
        blob = f.read(data_size)
        (crc,) = struct.unpack(">I", f.read(4))
    if data_size != size:
        raise DeletionVectorError(
            f"DV size mismatch: descriptor {size}, stored {data_size}"
        )
    if zlib.crc32(blob) & 0xFFFFFFFF != crc:
        raise DeletionVectorError("DV checksum mismatch")
    return decode_dv_blob(blob)


# ---- encode helpers (test fixtures; also a documented write seam) ---------


def encode_roaring32(values: list[int]) -> bytes:
    """Standard-format (no-run) serialization of a 32-bit value set —
    array containers for card <= 4096, bitset above."""
    by_key: dict[int, list[int]] = {}
    for v in sorted(set(values)):
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    n = len(by_key)
    head = struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
    desc = b"".join(
        struct.pack("<HH", k, len(vs) - 1) for k, vs in sorted(by_key.items())
    )
    bodies = []
    for _, vs in sorted(by_key.items()):
        if len(vs) > 4096:
            words = [0] * 1024
            for v in vs:
                words[v >> 6] |= 1 << (v & 63)
            bodies.append(struct.pack("<1024Q", *words))
        else:
            bodies.append(struct.pack(f"<{len(vs)}H", *vs))
    offsets, pos = [], len(head) + len(desc) + 4 * n
    for b in bodies:
        offsets.append(pos)
        pos += len(b)
    return head + desc + struct.pack(f"<{n}I", *offsets) + b"".join(bodies)


def encode_dv_blob(row_indexes: list[int]) -> bytes:
    by_high: dict[int, list[int]] = {}
    for r in sorted(set(row_indexes)):
        by_high.setdefault(r >> 32, []).append(r & 0xFFFFFFFF)
    out = struct.pack("<IQ", MAGIC, len(by_high))
    for high, vals in sorted(by_high.items()):
        out += struct.pack("<I", high) + encode_roaring32(vals)
    return out


def write_dv_file(path: str, row_indexes: list[int]) -> dict:
    """Write a single-DV file; returns a ``u``-style-free descriptor
    (storageType ``p``) pointing at it — fixture/write-path helper."""
    blob = encode_dv_blob(row_indexes)
    with open(path, "wb") as f:
        f.write(b"\x01")  # format version
        offset = f.tell()
        f.write(struct.pack(">I", len(blob)))
        f.write(blob)
        f.write(struct.pack(">I", zlib.crc32(blob) & 0xFFFFFFFF))
    return {
        "storageType": "p",
        "pathOrInlineDv": path,
        "offset": offset,
        "sizeInBytes": len(blob),
        "cardinality": len(set(row_indexes)),
    }
