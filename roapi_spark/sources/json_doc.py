"""Document-JSON loader (reference: columnq/src/table/json.rs:57-235).

Semantics ported:
- whole file is one JSON document; rows live in a top-level array or under
  an RFC-6901 ``pointer`` option (json.rs:57-80);
- ``array_encoded: true`` rows are positional arrays mapped to the declared
  schema's column order (json.rs:104-129) — declared schema required;
- multiple files concatenate, schema inferred across all (json.rs:191-196).

The document parse is driver-side (like the reference, which buffers whole
files); the parsed rows are re-serialized as NDJSON lines and distributed,
so schema inference and decoding run in the JVM across executors — at
scale, many files parallelize via the file list."""

from __future__ import annotations

import glob as globmod
import json
import os
from typing import Any

from pyspark.sql import DataFrame, Row, SparkSession

from roapi_spark.config import TableSource


class JsonLoadError(ValueError):
    pass


def resolve_pointer(doc: Any, pointer: str) -> Any:
    """RFC 6901 walk (json.rs:62-71 uses serde's Value::pointer)."""
    if not pointer or pointer == "/":
        return doc
    cur = doc
    for raw in pointer.lstrip("/").split("/"):
        token = raw.replace("~1", "/").replace("~0", "~")
        if isinstance(cur, list):
            cur = cur[int(token)]
        elif isinstance(cur, dict):
            if token not in cur:
                raise JsonLoadError(f"pointer {pointer!r}: key {token!r} not found")
            cur = cur[token]
        else:
            raise JsonLoadError(f"pointer {pointer!r} hit a scalar at {token!r}")
    return cur


def _files(uri: str) -> list[str]:
    if os.path.isdir(uri):
        out = []
        for root, _, names in os.walk(uri):
            out.extend(os.path.join(root, n) for n in sorted(names) if n.endswith(".json"))
        return out
    matched = sorted(globmod.glob(uri))
    return matched or [uri]


def to_dataframe(spark: SparkSession, ts: TableSource) -> DataFrame:
    pointer = ts.option.get("pointer", "")
    array_encoded = bool(ts.option.get("array_encoded", False))
    rows: list[Any] = []
    for path in _files(ts.uri):
        with open(path, encoding="utf-8") as f:
            doc = json.load(f)
        part = resolve_pointer(doc, pointer)
        if not isinstance(part, list):
            raise JsonLoadError(f"{path}: expected a JSON array at pointer {pointer!r}")
        rows.extend(part)

    if array_encoded:
        if ts.schema is None:
            raise JsonLoadError("array_encoded requires a declared schema (json.rs:104-110)")
        names = [f.name for f in ts.schema.fields]
        data = [Row(**dict(zip(names, r))) for r in rows]
        return spark.createDataFrame(data, ts.schema)

    # re-serialize as NDJSON and let the JVM json reader infer nested
    # structs/lists across executors (json.rs infers via arrow's inferrer)
    lines = spark.sparkContext.parallelize([json.dumps(r) for r in rows])
    reader = spark.read
    if ts.schema is not None:
        reader = reader.schema(ts.schema)
    return reader.json(lines)
