"""Parquet loader (reference: columnq/src/table/parquet.rs:48-169).

Lazy ListingTable-equivalent by default; ``use_memory_table: true`` caches
(handled by the dispatcher). Multi-file schema merge is opt-in via
``mergeSchema`` (the reference always try_merges; Spark's footer-sampling
default is the at-scale-correct behavior)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from roapi_spark.config import TableSource
from roapi_spark.types import parse_data_type


def to_dataframe(spark: SparkSession, ts: TableSource) -> DataFrame:
    r = spark.read
    if ts.option.get("mergeSchema") or ts.schema_from_files:
        r = r.option("mergeSchema", "true")
    df = r.parquet(ts.uri)
    if ts.schema is not None:
        # declared schema wins: project + cast (mod.rs:712)
        df = df.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in ts.schema.fields]
        )
    for pc in ts.partition_columns:
        if pc.name in df.columns:
            df = df.withColumn(pc.name, F.col(pc.name).cast(parse_data_type(pc.data_type)))
    return df
