"""Excel loader (reference: columnq/src/table/excel.rs — calamine-based,
813 LoC: sheet selection, row/col range windows, custom inference with
conflict->Utf8 upcast).

Spark-side plumbing is real (pandas -> Arrow -> DataFrame, range windows,
upcast rule); the workbook *decode* needs openpyxl/xlrd which aren't baked
into this container, so the read is import-gated."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from roapi_spark.config import TableSource
from roapi_spark.sources import LoadError


def to_dataframe(spark: SparkSession, ts: TableSource) -> DataFrame:
    try:
        import pandas as pd
    except ImportError as exc:  # pragma: no cover
        raise LoadError("pandas required for excel loading") from exc

    opt = ts.option
    kwargs: dict = {"sheet_name": opt.get("sheet_name", 0)}
    # rows_range_start/end, columns_range_start/end (excel.rs:36-94)
    if "rows_range_start" in opt:
        kwargs["skiprows"] = int(opt["rows_range_start"])
    if "rows_range_end" in opt and "rows_range_start" in opt:
        kwargs["nrows"] = int(opt["rows_range_end"]) - int(opt["rows_range_start"])
    if "columns_range_start" in opt or "columns_range_end" in opt:
        start = int(opt.get("columns_range_start", 0))
        end = int(opt.get("columns_range_end", 16383))
        kwargs["usecols"] = list(range(start, end + 1))
    try:
        pdf = pd.read_excel(ts.uri, **kwargs)
    except ImportError as exc:
        raise LoadError(
            f"excel table {ts.name!r}: no excel engine (openpyxl/xlrd) in this "
            f"container — install one to enable workbook decode ({exc})"
        ) from exc
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
