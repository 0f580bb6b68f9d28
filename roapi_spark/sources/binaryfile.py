"""Binary blob directory scan: the ingest seam for the multimodal
pipeline (a directory of images/audio/parquet-external artifacts ->
one row per file with the raw bytes).

No reference parity — columnq has no blob format — this is part of the
training-data-pipeline extension surface: `decode_image`/`decode_audio`
(functions/multimodal.py) consume exactly this shape. Backed by Spark's
native binaryFile source, so listing, partition parallelism, and the
pathGlobFilter/recursiveFileLookup options are JVM-side; the content
column only crosses to Python inside Arrow-batched mapInPandas kernels.

Options:
    glob:       pathGlobFilter pattern, e.g. ``*.png`` (default all)
    recursive:  recurse into subdirectories (default true)
Schema (fixed by Spark's binaryFile source):
    path string, modificationTime timestamp, length bigint, content binary
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from roapi_spark.config import TableSource


def to_dataframe(spark: SparkSession, ts: TableSource) -> DataFrame:
    reader = spark.read.format("binaryFile")
    glob = ts.option.get("glob")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    recursive = str(ts.option.get("recursive", "true")).lower() != "false"
    reader = reader.option("recursiveFileLookup", "true" if recursive else "false")
    return reader.load(ts.uri)
