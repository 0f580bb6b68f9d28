"""Database loaders (reference: columnq/src/table/database.rs:37-73 —
ConnectorX ``SELECT * FROM {table}`` into memory).

- sqlite: stdlib sqlite3 full-table read -> Arrow -> DataFrame (the
  reference reads the whole table into a MemTable too). Table name = last
  URI path segment or ``option.table``.
- mysql/postgres: Spark JDBC (needs driver jars on the cluster); at scale
  use ``partitionColumn/lowerBound/upperBound/numPartitions`` options for
  parallel reads — passed straight through from the table options.
"""

from __future__ import annotations

import sqlite3

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession

from roapi_spark.config import TableSource


def _sqlite_path(uri: str) -> str:
    if "://" in uri:
        return uri.split("://", 1)[1]
    return uri


def _load_sqlite(spark: SparkSession, ts: TableSource) -> DataFrame:
    path = _sqlite_path(ts.uri)
    table = ts.option.get("table", ts.name)
    conn = sqlite3.connect(path)
    try:
        cur = conn.execute(f'SELECT * FROM "{table}"')
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
    finally:
        conn.close()
    arrow = pa.table(
        {c: [r[i] for r in rows] for i, c in enumerate(cols)}
    )
    return spark.createDataFrame(arrow)


def _load_jdbc(spark: SparkSession, ts: TableSource) -> DataFrame:
    fmt = ts.resolved_format()
    uri = ts.uri
    jdbc_url = uri if uri.startswith("jdbc:") else f"jdbc:{uri}"
    table = ts.option.get("table", ts.name)
    r = spark.read.format("jdbc").option("url", jdbc_url).option("dbtable", table)
    if fmt == "mysql":
        r = r.option("driver", ts.option.get("driver", "com.mysql.cj.jdbc.Driver"))
    elif fmt == "postgres":
        r = r.option("driver", ts.option.get("driver", "org.postgresql.Driver"))
    for k in ("partitionColumn", "lowerBound", "upperBound", "numPartitions", "user", "password"):
        if k in ts.option:
            r = r.option(k, str(ts.option[k]))
    return r.load()


def to_dataframe(spark: SparkSession, ts: TableSource) -> DataFrame:
    if ts.resolved_format() == "sqlite":
        return _load_sqlite(spark, ts)
    return _load_jdbc(spark, ts)
