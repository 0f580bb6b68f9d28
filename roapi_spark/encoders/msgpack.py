"""MessagePack response encoder, stdlib-only (the reference's own
unchecked roadmap box — README.md 'Response serialization: [ ] msgpack').

Implements the subset of the public MessagePack spec the response shape
needs: nil, bool, int (both signs, full 64-bit), float64, str8/16/32 +
fixstr, bin8/16/32, array + map (fix/16/32). Rows encode as an array of
maps — the same array-of-objects shape as the JSON encoder, with the
same Arrow-ISO value rendering for dates/times/decimals (a msgpack
client sees exactly what a JSON client sees, minus the text layer).
True binary columns pass through as msgpack bin, not hex."""

from __future__ import annotations

import math
import struct
from datetime import date, datetime, time
from decimal import Decimal

import pyarrow as pa

from roapi_spark.encoders.json import _default


def _pack_int(n: int, out: bytearray) -> None:
    if 0 <= n <= 0x7F:
        out.append(n)
    elif -32 <= n < 0:
        out.append(n & 0xFF)
    elif 0 <= n <= 0xFF:
        out += b"\xcc" + bytes([n])
    elif 0 <= n <= 0xFFFF:
        out += b"\xcd" + struct.pack(">H", n)
    elif 0 <= n <= 0xFFFFFFFF:
        out += b"\xce" + struct.pack(">I", n)
    elif 0 <= n <= 0xFFFFFFFFFFFFFFFF:
        out += b"\xcf" + struct.pack(">Q", n)
    elif -0x80 <= n < 0:
        out += b"\xd0" + struct.pack(">b", n)
    elif -0x8000 <= n < 0:
        out += b"\xd1" + struct.pack(">h", n)
    elif -0x80000000 <= n < 0:
        out += b"\xd2" + struct.pack(">i", n)
    elif -0x8000000000000000 <= n < 0:
        out += b"\xd3" + struct.pack(">q", n)
    else:
        raise OverflowError(f"int out of msgpack 64-bit range: {n}")


def _pack_str(s: str, out: bytearray) -> None:
    b = s.encode("utf-8")
    n = len(b)
    if n <= 31:
        out.append(0xA0 | n)
    elif n <= 0xFF:
        out += b"\xd9" + bytes([n])
    elif n <= 0xFFFF:
        out += b"\xda" + struct.pack(">H", n)
    else:
        out += b"\xdb" + struct.pack(">I", n)
    out += b


def _pack_bin(b: bytes, out: bytearray) -> None:
    n = len(b)
    if n <= 0xFF:
        out += b"\xc4" + bytes([n])
    elif n <= 0xFFFF:
        out += b"\xc5" + struct.pack(">H", n)
    else:
        out += b"\xc6" + struct.pack(">I", n)
    out += b


def _pack(v: object, out: bytearray) -> None:
    if v is None:
        out.append(0xC0)
    elif isinstance(v, bool):
        out.append(0xC3 if v else 0xC2)
    elif isinstance(v, int):
        _pack_int(v, out)
    elif isinstance(v, float):
        if math.isnan(v) or math.isinf(v):
            out.append(0xC0)  # match the JSON encoder's null rendering
        else:
            out += b"\xcb" + struct.pack(">d", v)
    elif isinstance(v, str):
        _pack_str(v, out)
    elif isinstance(v, (bytes, bytearray)):
        _pack_bin(bytes(v), out)
    elif isinstance(v, (datetime, date, time, Decimal)):
        _pack(_default(v), out)  # same Arrow-ISO rendering as JSON
    elif isinstance(v, (list, tuple)):
        n = len(v)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out += b"\xdc" + struct.pack(">H", n)
        else:
            out += b"\xdd" + struct.pack(">I", n)
        for x in v:
            _pack(x, out)
    elif isinstance(v, dict):
        n = len(v)
        if n <= 15:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out += b"\xde" + struct.pack(">H", n)
        else:
            out += b"\xdf" + struct.pack(">I", n)
        for k, x in v.items():
            _pack_str(str(k), out)
            _pack(x, out)
    else:
        raise TypeError(f"not msgpack serializable: {type(v)}")


def pack(obj: object) -> bytes:
    out = bytearray()
    _pack(obj, out)
    return bytes(out)


def rows_to_msgpack_bytes(table: pa.Table) -> bytes:
    return pack(table.to_pylist())
