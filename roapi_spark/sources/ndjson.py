"""NDJSON/JSONL loader (reference: columnq/src/table/ndjson.rs:61-110).

Spark's json reader is natively line-delimited with schema inference and
multi-file merge — exactly the reference's infer+try_merge behavior."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from roapi_spark.config import TableSource


def to_dataframe(spark: SparkSession, ts: TableSource) -> DataFrame:
    r = spark.read
    if ts.schema is not None:
        r = r.schema(ts.schema)
    elif ts.schema_from_files:
        r = r.schema(spark.read.json(ts.schema_from_files).schema)
    return r.json(ts.uri)
