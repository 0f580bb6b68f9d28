"""Google Spreadsheet loader (reference: columnq/src/table/
google_spreadsheets.rs — service-account OAuth2 + Sheets REST values API).

The Sheets fetch needs network + credentials, neither available here; the
value->DataFrame path (typed inference over string cells, the part worth
testing) is implemented and unit-testable via ``values_to_dataframe``."""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from roapi_spark.config import TableSource
from roapi_spark.sources import LoadError


def infer_cell(v: str) -> Any:
    s = v.strip()
    if s == "":
        return None
    low = s.lower()
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    return s


def values_to_dataframe(spark: SparkSession, values: list[list[str]]) -> DataFrame:
    """First row = header; cells typed by inference with conflict->string
    upcast (google_spreadsheets.rs:150-190 infer_schema analogue)."""
    if not values:
        raise LoadError("empty sheet")
    header, *rows = values
    cols: list[list[Any]] = [[] for _ in header]
    for r in rows:
        for i in range(len(header)):
            cell = r[i] if i < len(r) else ""
            cols[i].append(infer_cell(cell))
    # conflict -> string upcast
    out_cols: dict[str, list[Any]] = {}
    for name, col in zip(header, cols):
        types = {type(v) for v in col if v is not None}
        if len(types - {int, float}) > 1 or (str in types and len(types) > 1):
            col = [str(v) if v is not None else None for v in col]
        elif types == {int, float}:
            col = [float(v) if v is not None else None for v in col]
        out_cols[name] = col
    import pyarrow as pa

    return spark.createDataFrame(pa.table(out_cols))


def to_dataframe(spark: SparkSession, ts: TableSource) -> DataFrame:
    raise LoadError(
        f"google_spreadsheet table {ts.name!r}: no network/credentials in "
        "this environment. Fetch values via the Sheets API and call "
        "values_to_dataframe(spark, values)."
    )
