"""Delta Lake loader (reference: columnq/src/table/delta.rs:104-297).

Uses delta-spark when available (``spark.read.format("delta")``); in this
container the Delta jars aren't baked in, so the import/read is gated with
a clear error. Refresh (delta.rs:62-79 DeltaTable.update) maps to simply
re-reading the latest snapshot — Spark resolves the newest version per
read. ``option.version`` / ``option.timestamp`` map to time travel
(versionAsOf / timestampAsOf)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from roapi_spark.config import TableSource
from roapi_spark.sources import LoadError


def to_dataframe(spark: SparkSession, ts: TableSource) -> DataFrame:
    r = spark.read.format("delta")
    if "version" in ts.option:
        r = r.option("versionAsOf", str(ts.option["version"]))
    if "timestamp" in ts.option:
        r = r.option("timestampAsOf", str(ts.option["timestamp"]))
    try:
        return r.load(ts.uri)
    except Exception as exc:  # noqa: BLE001 — surface a setup hint
        raise LoadError(
            f"delta table {ts.name!r}: delta-spark jars not available in this "
            f"session ({exc}). Add io.delta:delta-spark to spark.jars.packages."
        ) from exc
