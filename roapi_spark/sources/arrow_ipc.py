"""Arrow IPC file/stream loader (reference: columnq/src/table/
arrow_ipc_file.rs:25-110, arrow_ipc_stream.rs).

pyarrow decodes the IPC bytes; the resulting Table feeds
``spark.createDataFrame`` over Arrow (zero-copy batches to the JVM).
Multi-file loads concatenate with schema unification (try_merge analogue
via pyarrow concat with promote)."""

from __future__ import annotations

import glob as globmod
import os

import pyarrow as pa
import pyarrow.ipc as ipc

from pyspark.sql import DataFrame, SparkSession

from roapi_spark.config import TableSource
from roapi_spark.sources import LoadError


def _files(uri: str, exts: tuple[str, ...]) -> list[str]:
    if os.path.isdir(uri):
        out = []
        for root, _, names in os.walk(uri):
            out.extend(
                os.path.join(root, n) for n in sorted(names) if n.endswith(exts)
            )
        return out
    matched = sorted(globmod.glob(uri))
    return matched or [uri]


def _read_one(path: str, stream: bool) -> pa.Table:
    with open(path, "rb") as f:
        if not stream:
            return ipc.open_file(f).read_all()
        # a .arrows file may hold SEVERAL concatenated IPC streams (the
        # chunked-export shape encoders.encode_batches_iter documents as
        # concat-safe): drain streams until EOF instead of silently
        # returning only the first chunk
        parts: list[pa.Table] = []
        size = os.fstat(f.fileno()).st_size
        while f.tell() < size:
            parts.append(ipc.open_stream(f).read_all())
        if not parts:
            raise LoadError(f"empty arrow stream file: {path}")
        return (
            parts[0]
            if len(parts) == 1
            else pa.concat_tables(parts, promote_options="permissive")
        )


def to_dataframe(spark: SparkSession, ts: TableSource) -> DataFrame:
    stream = ts.resolved_format() == "arrows"
    exts = (".arrows",) if stream else (".arrow", ".feather")
    tables = [_read_one(p, stream) for p in _files(ts.uri, exts)]
    table = (
        tables[0]
        if len(tables) == 1
        else pa.concat_tables(tables, promote_options="permissive")
    )
    return spark.createDataFrame(table)
