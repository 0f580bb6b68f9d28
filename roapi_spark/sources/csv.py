"""CSV/TSV loader (reference: columnq/src/table/csv.rs:37-171).

Options (csv.rs:20-46): ``delimiter`` (default ','; tsv '\\t'),
``has_header`` (default true), ``quote``, ``escape``,
``schema_inference_lines`` -> samplingRatio-ish cap via maxRows is not
exposed in Spark; we infer from the full file (superset behavior).

Schema priority (datafusion_get_or_infer_schema, table/mod.rs:704-752):
declared > schema_from_files (infer on subset, apply to all) > infer-all.
Hive partition columns come free from Spark partition discovery; declared
partition types are cast after load (csv.rs:57-59 analogue).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from roapi_spark.config import TableSource
from roapi_spark.types import parse_data_type


def _reader(spark: SparkSession, ts: TableSource):
    opt = ts.option
    delimiter = opt.get("delimiter", "\t" if ts.resolved_format() == "tsv" else ",")
    r = (
        spark.read.option("header", str(opt.get("has_header", True)).lower())
        .option("delimiter", delimiter)
        .option("recursiveFileLookup", "false")  # keep partition discovery on
    )
    if "quote" in opt:
        r = r.option("quote", opt["quote"])
    if "escape" in opt:
        r = r.option("escape", opt["escape"])
    return r


def to_dataframe(spark: SparkSession, ts: TableSource) -> DataFrame:
    r = _reader(spark, ts)
    if ts.schema is not None:
        df = r.schema(ts.schema).csv(ts.uri)
    elif ts.schema_from_files:
        inferred = _reader(spark, ts).option("inferSchema", "true").csv(ts.schema_from_files).schema
        df = r.schema(inferred).csv(ts.uri)
    else:
        df = r.option("inferSchema", "true").csv(ts.uri)
    for pc in ts.partition_columns:
        if pc.name in df.columns:
            df = df.withColumn(pc.name, F.col(pc.name).cast(parse_data_type(pc.data_type)))
    return df
