"""Apache Avro object-container-file loader.

Beyond the reference's format list (roapi supports csv/json/parquet/...,
columnq/src/table/mod.rs:790-858, but not Avro); added because Avro is
the de-facto row format for Kafka archives and Iceberg/Hive metadata, so
a training-data pipeline routinely lands it. No avro library ships in
this environment, so decoding rides the same stdlib-only codec written
for the Iceberg metadata layer (``roapi_spark/sources/avro_lite.py``,
Avro 1.11 public spec: null/deflate codecs, full type system).

The decoded rows feed ``spark.createDataFrame`` through a pyarrow Table
whose schema is mapped from the *writer schema* — so empty files keep a
stable typed schema, and logical types (date, timestamp-millis/micros,
decimal) surface as real Spark types rather than raw ints/bytes.

Scale note: Avro is a row format — there is no pushdown to decode less.
This loader is for config tables / modest feeds (the same class of input
the reference memory-loads); the documented scale path is converting to
parquet once and registering that. Multi-file loads decode per-file and
concatenate with permissive schema promotion, mirroring the Arrow IPC
loader's try_merge analogue.
"""

from __future__ import annotations

import decimal

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession

from roapi_spark.config import TableSource
from roapi_spark.sources.arrow_ipc import _files
from roapi_spark.sources.avro_lite import AvroError, read_container

_PRIM = {
    "null": pa.null(),
    "boolean": pa.bool_(),
    "int": pa.int32(),
    "long": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "bytes": pa.binary(),
    "string": pa.string(),
}


def _arrow_type(s, named: dict) -> pa.DataType:
    """Avro (sub)schema -> arrow type. ``named`` maps name -> definition."""
    if isinstance(s, str):
        if s in _PRIM:
            return _PRIM[s]
        if s in named:
            return _arrow_type(named[s], named)
        raise AvroError(f"unresolved avro type name {s!r}")
    if isinstance(s, list):  # union
        branches = [b for b in s if b != "null"]
        if not branches:
            return pa.null()
        if len(branches) == 1:
            return _arrow_type(branches[0], named)
        raise AvroError("non-nullable multi-branch unions are not supported")
    t = s.get("type")
    lt = s.get("logicalType")
    if lt == "date" and t == "int":
        return pa.date32()
    if lt == "timestamp-millis" and t == "long":
        return pa.timestamp("ms")
    if lt == "timestamp-micros" and t == "long":
        return pa.timestamp("us")
    if lt == "decimal" and t in ("bytes", "fixed"):
        return pa.decimal128(int(s["precision"]), int(s.get("scale", 0)))
    if t == "record":
        return pa.struct(
            [pa.field(f["name"], _arrow_type(f["type"], named), nullable=True)
             for f in s["fields"]]
        )
    if t == "enum":
        return pa.string()
    if t == "fixed":
        return pa.binary(int(s["size"]))
    if t == "array":
        return pa.list_(_arrow_type(s["items"], named))
    if t == "map":
        return pa.map_(pa.string(), _arrow_type(s["values"], named))
    if isinstance(t, (dict, list)):
        return _arrow_type(t, named)
    return _arrow_type(t, named)


def _index_named(s, named: dict) -> None:
    if isinstance(s, dict):
        t = s.get("type")
        if t in ("record", "enum", "fixed") and s.get("name"):
            named[s["name"]] = s
            if s.get("namespace"):
                named[f"{s['namespace']}.{s['name']}"] = s
        if t == "record":
            for f in s.get("fields", []):
                _index_named(f["type"], named)
        elif t == "array":
            _index_named(s.get("items"), named)
        elif t == "map":
            _index_named(s.get("values"), named)
    elif isinstance(s, list):
        for b in s:
            _index_named(b, named)


def _convert(v, s, named: dict):
    """Rewrite decoded values whose arrow type needs a different python
    shape: decimal bytes -> Decimal, map dict -> item list (pyarrow's
    from_pylist map representation), recursing through containers."""
    if v is None:
        return None
    if isinstance(s, str):
        return _convert(v, named[s], named) if s in named else v
    if isinstance(s, list):
        branches = [b for b in s if b != "null"]
        return _convert(v, branches[0], named) if len(branches) == 1 else v
    t = s.get("type")
    if s.get("logicalType") == "decimal" and t in ("bytes", "fixed"):
        unscaled = int.from_bytes(v, "big", signed=True)
        return decimal.Decimal(unscaled).scaleb(-int(s.get("scale", 0)))
    if t == "record":
        return {
            f["name"]: _convert(v.get(f["name"]), f["type"], named)
            for f in s["fields"]
        }
    if t == "array":
        return [_convert(x, s["items"], named) for x in v]
    if t == "map":
        return [(k, _convert(x, s["values"], named)) for k, x in v.items()]
    if isinstance(t, (dict, list)):
        return _convert(v, t, named)
    return v


def _read_one(path: str) -> pa.Table:
    with open(path, "rb") as f:
        schema, records = read_container(f.read())
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise AvroError("top-level avro schema must be a record")
    named: dict = {}
    _index_named(schema, named)
    arrow_schema = pa.schema(
        [pa.field(f["name"], _arrow_type(f["type"], named), nullable=True)
         for f in schema["fields"]]
    )
    rows = [_convert(r, schema, named) for r in records]
    return pa.Table.from_pylist(rows, schema=arrow_schema)


def to_dataframe(spark: SparkSession, ts: TableSource) -> DataFrame:
    from roapi_spark.sources import LoadError

    try:
        tables = [_read_one(p) for p in _files(ts.uri, (".avro",))]
    except (AvroError, OSError, KeyError, IndexError) as exc:
        # truncated/corrupt containers surface as AvroError (or slicing
        # failures from the varint/struct readers) — a LoadError with the
        # table name, never a raw traceback
        raise LoadError(f"avro table {ts.name!r}: {exc}") from exc
    table = (
        tables[0]
        if len(tables) == 1
        else pa.concat_tables(tables, promote_options="permissive")
    )
    return spark.createDataFrame(table)
