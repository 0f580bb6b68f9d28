"""Avro response encoding — Arrow table -> Avro object-container bytes
via the stdlib codec (sources/avro_lite.py). Beyond the reference's
encoder set (columnq/src/encoding/mod.rs: json/csv/arrow/parquet), the
symmetric half of the Avro *source*: a result set negotiated as
``application/avro`` round-trips through the same container format the
loader reads.

Schema mapping mirrors the loader's (sources/avro.py) in reverse; every
field is emitted as a nullable union, matching Spark's default
nullability. Logical types (date, timestamp-micros, decimal) are
preserved rather than flattened to ints.
"""

from __future__ import annotations

import datetime
import decimal

import pyarrow as pa

from roapi_spark.sources.avro_lite import write_container

_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_DT = datetime.datetime(1970, 1, 1)


def _avro_type(t: pa.DataType) -> object:
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_integer(t):
        # unsigned types need the NEXT wider signed Avro type: uint32
        # values above 2^31-1 varint-encode out of 'int' range (and
        # uint64 above 2^63-1 out of 'long' — stringify those)
        if pa.types.is_unsigned_integer(t):
            if t.bit_width <= 16:
                return "int"  # uint8/uint16 fit in signed 32-bit
            return "long" if t.bit_width == 32 else "string"
        return "long" if t.bit_width > 32 else "int"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_floating(t):
        return "double"
    if pa.types.is_date(t):
        return {"type": "int", "logicalType": "date"}
    if pa.types.is_timestamp(t):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if pa.types.is_decimal(t):
        return {
            "type": "bytes", "logicalType": "decimal",
            "precision": t.precision, "scale": t.scale,
        }
    if pa.types.is_binary(t) or pa.types.is_large_binary(t) or pa.types.is_fixed_size_binary(t):
        return "bytes"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return {"type": "array", "items": ["null", _avro_type(t.value_type)]}
    if pa.types.is_map(t):
        return {"type": "map", "values": ["null", _avro_type(t.item_type)]}
    if pa.types.is_struct(t):
        import hashlib

        # deterministic per distinct struct type (hash() is per-process
        # randomized — the schema bytes must be stable)
        tag = hashlib.md5(str(t).encode()).hexdigest()[:8]
        return {
            "type": "record",
            "name": f"r{tag}",
            "fields": [
                {"name": f.name, "type": ["null", _avro_type(f.type)]}
                for f in t
            ],
        }
    return "string"  # string / everything else stringifies


def _conv(v, t: pa.DataType):
    if v is None:
        return None
    if pa.types.is_date(t):
        return (v - _EPOCH_DATE).days
    if pa.types.is_timestamp(t):
        # Avro timestamp-micros is epoch-UTC: tz-aware values must be
        # CONVERTED to UTC, not have the zone stripped wall-clock-intact
        base = (
            v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
            if v.tzinfo
            else v
        )
        td = base - _EPOCH_DT
        # integer components, not total_seconds(): float64 resolution at
        # epoch scale is ~0.25us — off-by-one micros on round-trip
        return (td.days * 86_400_000_000 + td.seconds * 1_000_000
                + td.microseconds)
    if pa.types.is_decimal(t):
        unscaled = int(decimal.Decimal(v).scaleb(t.scale))
        n = (unscaled.bit_length() + 8) // 8 or 1
        return unscaled.to_bytes(n, "big", signed=True)
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return [_conv(x, t.value_type) for x in v]
    if pa.types.is_map(t):
        items = v.items() if isinstance(v, dict) else v
        return {str(k): _conv(x, t.item_type) for k, x in items}
    if pa.types.is_struct(t):
        return {f.name: _conv(v.get(f.name), f.type) for f in t}
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return str(v)
    if pa.types.is_integer(t):
        # uint64 is declared as Avro 'string' (no signed type fits)
        if pa.types.is_unsigned_integer(t) and t.bit_width > 32:
            return str(v)
        return int(v)
    return v


def rows_to_avro_bytes(table: pa.Table) -> bytes:
    schema = {
        "type": "record",
        "name": "results",
        "fields": [
            {"name": f.name, "type": ["null", _avro_type(f.type)]}
            for f in table.schema
        ],
    }
    rows = [
        {f.name: _conv(r.get(f.name), f.type) for f in table.schema}
        for r in table.to_pylist()
    ]
    return write_container(schema, rows, codec="deflate")
