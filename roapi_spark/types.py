"""Declared-schema type system: Arrow-style type names -> Spark types.

The reference deserializes YAML straight into Arrow DataTypes
(columnq/src/table/mod.rs:170-219, e.g. ``data_type: !Timestamp [!Second,
null]`` -> ``DataType::Timestamp(TimeUnit::Second, None)``). PyYAML has no
serde-tagged enums, so we accept the same type vocabulary as strings:

    Utf8, LargeUtf8, Boolean, Int8..Int64, UInt8..UInt64, Float16/32/64,
    Date32, Date64, Timestamp(s|ms|us|ns[, tz]), Time32(s|ms),
    Time64(us|ns), Duration(...), Decimal128(p, s), Binary, LargeBinary,
    List<T>, Struct<name: T, ...>, Map<K, V>, Null

Mapping contract follows the reference's pgwire table
(roapi/src/server/postgres.rs:51-103): unsigned ints widen to the next
signed Spark type (UInt32 -> LongType, UInt64 -> DecimalType(20,0)),
ns timestamps truncate to us, Time32/64 surface as LongType
(us-since-midnight) since Spark has no time-of-day type.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

_SIMPLE: dict[str, T.DataType] = {
    "utf8": T.StringType(),
    "largeutf8": T.StringType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int": T.IntegerType(),
    "int64": T.LongType(),
    "long": T.LongType(),
    "uint8": T.ShortType(),  # widen: unsigned -> next signed (postgres.rs:57-61)
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    "uint64": T.DecimalType(20, 0),
    "float16": T.FloatType(),
    "float32": T.FloatType(),
    "float": T.FloatType(),
    "float64": T.DoubleType(),
    "double": T.DoubleType(),
    "date32": T.DateType(),
    "date64": T.DateType(),
    "date": T.DateType(),
    "binary": T.BinaryType(),
    "largebinary": T.BinaryType(),
    "fixedsizebinary": T.BinaryType(),
    "null": T.NullType(),
}

_TIMESTAMP_RE = re.compile(r"^timestamp\s*(?:\(\s*(s|ms|us|ns)\s*(?:,\s*([^)]+))?\))?$")
_DECIMAL_RE = re.compile(r"^decimal(?:128|256)?\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$")
_TIME_RE = re.compile(r"^time(?:32|64)\s*(?:\(\s*(s|ms|us|ns)\s*\))?$")
_DURATION_RE = re.compile(r"^duration\s*(?:\(\s*(s|ms|us|ns)\s*\))?$")
_LIST_RE = re.compile(r"^(?:large)?list\s*<(.+)>$")
_MAP_RE = re.compile(r"^map\s*<(.+)>$")
_STRUCT_RE = re.compile(r"^struct\s*<(.+)>$")


class TypeParseError(ValueError):
    pass


def _split_top(s: str) -> list[str]:
    """Split on commas not nested inside <> or ()."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return parts


def parse_data_type(spec: str) -> T.DataType:
    s = spec.strip()
    low = s.lower()
    if low in _SIMPLE:
        return _SIMPLE[low]
    if m := _TIMESTAMP_RE.match(low):
        # tz-aware or not, Spark timestamps are session-tz us instants;
        # ns truncates to us (documented deviation, SURVEY §1.2)
        return T.TimestampType()
    if _TIME_RE.match(low):
        return T.LongType()  # us-since-midnight (no Spark time type)
    if _DURATION_RE.match(low):
        return T.DayTimeIntervalType()
    if m := _DECIMAL_RE.match(low):
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    if m := _LIST_RE.match(low):
        inner = s[m.start(1) : m.end(1)]
        return T.ArrayType(parse_data_type(inner))
    if m := _MAP_RE.match(low):
        inner = s[m.start(1) : m.end(1)]
        kv = _split_top(inner)
        if len(kv) != 2:
            raise TypeParseError(f"map needs <K, V>: {spec!r}")
        return T.MapType(parse_data_type(kv[0]), parse_data_type(kv[1]))
    if m := _STRUCT_RE.match(low):
        inner = s[m.start(1) : m.end(1)]
        fields = []
        for part in _split_top(inner):
            if ":" not in part:
                raise TypeParseError(f"struct field needs name: type — {part!r}")
            fname, ftype = part.split(":", 1)
            fields.append(T.StructField(fname.strip(), parse_data_type(ftype), True))
        return T.StructType(fields)
    raise TypeParseError(f"unknown data type: {spec!r}")


def parse_table_schema(schema: dict) -> T.StructType:
    """``{"columns": [{"name", "data_type", "nullable"?}]}`` -> StructType
    (shape mirrors TableSchema/TableColumn, columnq/src/table/mod.rs:170-219)."""
    cols = schema.get("columns")
    if not isinstance(cols, list) or not cols:
        raise TypeParseError("schema.columns must be a non-empty list")
    fields = [
        T.StructField(
            c["name"], parse_data_type(str(c["data_type"])), bool(c.get("nullable", True))
        )
        for c in cols
    ]
    return T.StructType(fields)
