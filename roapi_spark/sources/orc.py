"""ORC loader — Spark-native columnar scan (beyond the reference's 11
formats; zero extra dependencies since Spark bundles the ORC reader).

Same contract as the parquet loader: lazy scan, declared schema wins
(project + cast), hive partition columns typed from config; predicate
pushdown and column pruning come free from the native reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from roapi_spark.config import TableSource
from roapi_spark.types import parse_data_type


def to_dataframe(spark: SparkSession, ts: TableSource) -> DataFrame:
    r = spark.read
    if ts.option.get("mergeSchema") or ts.schema_from_files:
        r = r.option("mergeSchema", "true")
    df = r.orc(ts.uri)
    if ts.schema is not None:
        df = df.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in ts.schema.fields]
        )
    for pc in ts.partition_columns:
        if pc.name in df.columns:
            df = df.withColumn(pc.name, F.col(pc.name).cast(parse_data_type(pc.data_type)))
    return df
