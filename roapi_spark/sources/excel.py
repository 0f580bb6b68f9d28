"""Excel loader (reference: columnq/src/table/excel.rs — calamine-based,
813 LoC: sheet selection, row/col range windows, custom inference with
conflict->Utf8 upcast).

Decode is handled by the pure-Python stdlib readers playing calamine's
role (:mod:`roapi_spark.sources.xlsx` for OOXML zip+XML,
:mod:`roapi_spark.sources.ods` for OpenDocument zip+XML,
:mod:`roapi_spark.sources.xls` for legacy BIFF8 compound files,
:mod:`roapi_spark.sources.xlsb` for BIFF12 binary workbooks), so all
four calamine formats load with no optional deps; dispatch sniffs the
container bytes (zip members / OLE2 magic), not the file extension. The
row/column range windows follow ``excel.rs:36-94`` and the
conflict->Utf8 upcast rule ``excel.rs:158-167``.
"""

from __future__ import annotations

import struct
import zipfile
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from roapi_spark.config import TableSource
from roapi_spark.sources import LoadError
from roapi_spark.sources.ods import OdsError, read_ods
from roapi_spark.sources.xls import XlsError, read_xls
from roapi_spark.sources.xlsb import XlsbError, read_xlsb
from roapi_spark.sources.xlsx import XlsxError, read_xlsx


def _window(rows: list[list[Any]], opt: dict) -> list[list[Any]]:
    # rows_range_start/end, columns_range_start/end (excel.rs:36-94);
    # same semantics as the pandas skiprows/nrows/usecols mapping this
    # loader used before: the row window is applied to raw sheet rows,
    # the first surviving row is the header, `end - start` data rows kept.
    if "rows_range_start" in opt:
        start = int(opt["rows_range_start"])
        rows = rows[start:]
        if "rows_range_end" in opt:
            nrows = int(opt["rows_range_end"]) - start
            rows = rows[: nrows + 1]  # +1: header row
    if "columns_range_start" in opt or "columns_range_end" in opt:
        c0 = int(opt.get("columns_range_start", 0))
        c1 = int(opt.get("columns_range_end", 16383))
        rows = [r[c0 : c1 + 1] for r in rows]
    return rows


def to_dataframe(spark: SparkSession, ts: TableSource) -> DataFrame:
    try:
        import pandas as pd
    except ImportError as exc:  # pragma: no cover
        raise LoadError("pandas required for excel loading") from exc

    opt = ts.option
    sheet = opt.get("sheet_name", 0)
    try:
        if zipfile.is_zipfile(ts.uri):
            with zipfile.ZipFile(ts.uri) as zf:
                members = set(zf.namelist())
            if "content.xml" in members:
                reader = read_ods
            elif "xl/workbook.bin" in members:
                reader = read_xlsb
            else:
                reader = read_xlsx
        else:
            with open(ts.uri, "rb") as f:
                magic = f.read(8)
            if magic != b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
                raise LoadError(
                    f"excel table {ts.name!r}: neither a zip package "
                    "(.xlsx/.xlsb/.ods) nor an OLE2 compound file (.xls)"
                )
            reader = read_xls
        grid = reader(ts.uri, sheet)
    except (
        XlsError, XlsbError, OdsError, XlsxError, KeyError, ValueError,
        zipfile.BadZipFile,
        # truncated/corrupt binary formats surface as slicing/unpack
        # failures from the CFB/BIFF parsers — still a LoadError, never
        # a raw traceback
        IndexError, struct.error, EOFError,
    ) as exc:
        raise LoadError(f"excel table {ts.name!r}: {exc}") from exc
    grid = _window(grid, opt)
    if not grid:
        raise LoadError(f"excel table {ts.name!r}: selected window is empty")
    header, *data = grid
    names = [
        str(h) if h is not None and str(h) != "" else f"Unnamed: {i}"
        for i, h in enumerate(header)
    ]
    pdf = pd.DataFrame(
        {name: [row[i] for row in data] for i, name in enumerate(names)}
    )
    # conflict -> Utf8 upcast rule (excel.rs:158-167): mixed object columns
    # become strings
    for col in pdf.columns:
        if pdf[col].dtype == object:
            mask = pdf[col].notna()
            if mask.any() and pdf.loc[mask, col].map(type).nunique() > 1:
                pdf[col] = pdf[col].astype(str).where(mask)
    if ts.schema is not None:
        return spark.createDataFrame(pdf, ts.schema)
    return spark.createDataFrame(pdf)
