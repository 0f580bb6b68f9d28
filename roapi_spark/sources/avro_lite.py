"""Minimal Apache Avro container-file codec (read + write), implemented
from the public Avro 1.11 specification — just enough for Apache
Iceberg's metadata layer (manifest lists and manifests are Avro files),
since no avro library ships in this environment.

Decoding is schema-driven from the container's embedded writer schema,
so readers navigate decoded records by field name and tolerate any
superset of fields. Supported: all primitive types, record/enum/array/
map/union/fixed, named-type references, null and deflate codecs.
Logical types pass through as their underlying primitive.

The writer half exists for tests (building synthetic Iceberg tables)
and for completeness; it emits single-block files with the null codec.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

_MAGIC = b"Obj\x01"


class AvroError(ValueError):
    pass


# ---- zigzag varint ---------------------------------------------------------


def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise AvroError("truncated varint")
        acc |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_long(out: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63)
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            break


# ---- schema-driven decode --------------------------------------------------


class _Decoder:
    def __init__(self, schema) -> None:
        self.named: dict[str, dict] = {}
        self._index(schema)

    def _index(self, s) -> None:
        if isinstance(s, dict):
            t = s.get("type")
            if t in ("record", "enum", "fixed") and s.get("name"):
                self.named[s["name"]] = s
                # namespaced references
                ns = s.get("namespace")
                if ns:
                    self.named[f"{ns}.{s['name']}"] = s
            if t == "record":
                for f in s.get("fields", []):
                    self._index(f["type"])
            elif t == "array":
                self._index(s["items"])
            elif t == "map":
                self._index(s["values"])
        elif isinstance(s, list):
            for b in s:
                self._index(b)

    def read(self, schema, buf: io.BytesIO):
        if isinstance(schema, str):
            if schema in self.named:
                return self.read(self.named[schema], buf)
            return self._prim(schema, buf)
        if isinstance(schema, list):  # union: long index then value
            idx = _read_long(buf)
            if not 0 <= idx < len(schema):
                raise AvroError(f"union index {idx} out of range")
            return self.read(schema[idx], buf)
        t = schema["type"]
        if isinstance(t, (dict, list)):  # nested type object
            return self.read(t, buf)
        if t == "record":
            return {f["name"]: self.read(f["type"], buf) for f in schema["fields"]}
        if t == "enum":
            return schema["symbols"][_read_long(buf)]
        if t == "array":
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    break
                if n < 0:  # block with byte-size prefix
                    n = -n
                    _read_long(buf)
                for _ in range(n):
                    out.append(self.read(schema["items"], buf))
            return out
        if t == "map":
            out = {}
            while True:
                n = _read_long(buf)
                if n == 0:
                    break
                if n < 0:
                    n = -n
                    _read_long(buf)
                for _ in range(n):
                    k = self._prim("string", buf)
                    out[k] = self.read(schema["values"], buf)
            return out
        if t == "fixed":
            return buf.read(schema["size"])
        return self._prim(t, buf)

    def _prim(self, t: str, buf: io.BytesIO):
        if t == "null":
            return None
        if t == "boolean":
            return buf.read(1) == b"\x01"
        if t in ("int", "long"):
            return _read_long(buf)
        if t == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if t == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if t == "bytes":
            return buf.read(_read_long(buf))
        if t == "string":
            return buf.read(_read_long(buf)).decode("utf-8")
        if t in self.named:
            return self.read(self.named[t], buf)
        raise AvroError(f"unsupported avro type {t!r}")


def read_container(data: bytes) -> tuple[dict, list]:
    """Parse an Avro object-container file -> (writer schema, records)."""
    buf = io.BytesIO(data)
    if buf.read(4) != _MAGIC:
        raise AvroError("not an avro container (bad magic)")
    dec = _Decoder("null")
    meta = dec.read({"type": "map", "values": "bytes"}, buf)
    sync = buf.read(16)
    schema = json.loads(meta[b"avro.schema"] if b"avro.schema" in meta else meta["avro.schema"])
    codec = meta.get("avro.codec", b"null")
    if isinstance(codec, bytes):
        codec = codec.decode()
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported avro codec {codec!r}")
    dec = _Decoder(schema)
    records = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        count = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bbuf = io.BytesIO(block)
        for _ in range(count):
            records.append(dec.read(schema, bbuf))
        if buf.read(16) != sync:
            raise AvroError("sync marker mismatch")
    return schema, records


# ---- encode (tests / synthetic tables) -------------------------------------


class _Encoder:
    def __init__(self, schema) -> None:
        self.named = _Decoder(schema).named

    def write(self, schema, val, out: bytearray) -> None:
        if isinstance(schema, str):
            if schema in self.named:
                return self.write(self.named[schema], val, out)
            return self._prim(schema, val, out)
        if isinstance(schema, list):
            # pick the first branch whose type matches the VALUE (not just
            # its nullness — unions like ['null','string','long'] must
            # route ints to 'long' and strs to 'string')
            for i, b in enumerate(schema):
                if self._branch_matches(b, val):
                    _write_long(out, i)
                    return self.write(b, val, out)
            raise AvroError(f"no union branch for value {type(val).__name__}")
        t = schema["type"]
        if isinstance(t, (dict, list)):
            return self.write(t, val, out)
        if t == "record":
            for f in schema["fields"]:
                self.write(f["type"], val[f["name"]], out)
            return
        if t == "enum":
            return _write_long(out, schema["symbols"].index(val))
        if t == "array":
            if val:
                _write_long(out, len(val))
                for v in val:
                    self.write(schema["items"], v, out)
            _write_long(out, 0)
            return
        if t == "map":
            if val:
                _write_long(out, len(val))
                for k, v in val.items():
                    self._prim("string", k, out)
                    self.write(schema["values"], v, out)
            _write_long(out, 0)
            return
        if t == "fixed":
            out.extend(val)
            return
        return self._prim(t, val, out)

    def _branch_matches(self, branch, val) -> bool:
        bt = branch if isinstance(branch, str) else branch.get("type")
        if bt in self.named:
            bt = self.named[bt]["type"]
        if isinstance(bt, (dict, list)):
            bt = bt.get("type") if isinstance(bt, dict) else None
        if val is None:
            return bt == "null"
        if isinstance(val, bool):
            return bt == "boolean"
        if isinstance(val, int):
            return bt in ("int", "long")
        if isinstance(val, float):
            return bt in ("float", "double")
        if isinstance(val, str):
            return bt in ("string", "enum")
        if isinstance(val, (bytes, bytearray)):
            return bt in ("bytes", "fixed")
        if isinstance(val, dict):
            return bt in ("record", "map")
        if isinstance(val, (list, tuple)):
            return bt == "array"
        return False

    def _prim(self, t: str, val, out: bytearray) -> None:
        if t == "null":
            return
        if t == "boolean":
            out.append(1 if val else 0)
        elif t in ("int", "long"):
            _write_long(out, int(val))
        elif t == "float":
            out.extend(struct.pack("<f", val))
        elif t == "double":
            out.extend(struct.pack("<d", val))
        elif t == "bytes":
            _write_long(out, len(val))
            out.extend(val)
        elif t == "string":
            b = val.encode("utf-8")
            _write_long(out, len(b))
            out.extend(b)
        elif t in self.named:
            self.write(self.named[t], val, out)
        else:
            raise AvroError(f"unsupported avro type {t!r}")


def write_container(schema: dict, records: list, codec: str = "null") -> bytes:
    """Encode records as a single-block Avro container file."""
    enc = _Encoder(schema)
    body = bytearray()
    for r in records:
        enc.write(schema, r, body)
    if codec == "deflate":
        body = bytearray(zlib.compress(bytes(body))[2:-4])  # raw stream
    elif codec != "null":
        raise AvroError(f"unsupported avro codec {codec!r}")
    out = bytearray(_MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    enc2 = _Encoder("null")
    _write_long(out, len(meta))
    for k, v in meta.items():
        enc2._prim("string", k, out)
        enc2._prim("bytes", v, out)
    _write_long(out, 0)
    sync = b"roapi_spark_sync" [:16]
    out.extend(sync)
    _write_long(out, len(records))
    _write_long(out, len(body))
    out.extend(body)
    out.extend(sync)
    return bytes(out)
