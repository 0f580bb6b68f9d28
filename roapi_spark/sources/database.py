"""Database loaders (reference: columnq/src/table/database.rs:37-73 —
ConnectorX ``SELECT * FROM {table}`` into memory).

- sqlite: stdlib sqlite3 full-table read -> Arrow -> DataFrame (the
  reference reads the whole table into a MemTable too). Table name = last
  URI path segment or ``option.table``.
- mysql/postgres: Spark JDBC (needs driver jars on the cluster); at scale
  use ``partitionColumn/lowerBound/upperBound/numPartitions`` options for
  parallel reads — passed straight through from the table options.
- postgres/mysql without JDBC jars: fall back to the pure-Python
  wire-protocol clients (:mod:`roapi_spark.sources.pgwire`,
  :mod:`roapi_spark.sources.mysqlwire`) — same full-table-into-memory
  semantics as the reference's ConnectorX read.
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


def _load_pg_wire(spark: SparkSession, ts: TableSource) -> DataFrame:
    from roapi_spark.sources import LoadError
    from roapi_spark.sources.pgwire import PgWireError, read_table

    table = ts.option.get("table", ts.name)
    try:
        res = read_table(ts.uri, table, sql=ts.option.get("query"))
    except (PgWireError, OSError) as exc:
        raise LoadError(f"postgres table {ts.name!r}: wire read failed: {exc}") from exc
    if not res.columns:
        raise LoadError(f"postgres table {ts.name!r}: query returned no result set")
    arrow = pa.table(
        {c: [row[i] for row in res.rows] for i, c in enumerate(res.columns)}
    )
    return spark.createDataFrame(arrow)


def _load_mysql_wire(spark: SparkSession, ts: TableSource) -> DataFrame:
    from roapi_spark.sources import LoadError
    from roapi_spark.sources.mysqlwire import MySqlWireError, read_table

    table = ts.option.get("table", ts.name)
    try:
        res = read_table(ts.uri, table, sql=ts.option.get("query"))
    except (MySqlWireError, OSError) as exc:
        raise LoadError(f"mysql table {ts.name!r}: wire read failed: {exc}") from exc
    if not res.columns:
        raise LoadError(f"mysql table {ts.name!r}: query returned no result set")
    arrow = pa.table(
        {c: [row[i] for row in res.rows] for i, c in enumerate(res.columns)}
    )
    return spark.createDataFrame(arrow)


def _jdbc_driver_present(spark: SparkSession, klass: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(klass)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


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
    fmt = ts.resolved_format()
    if fmt == "sqlite":
        return _load_sqlite(spark, ts)
    if fmt == "postgres" and not _jdbc_driver_present(spark, "org.postgresql.Driver"):
        # no JDBC driver on the classpath -> pure-Python wire fallback
        return _load_pg_wire(spark, ts)
    if fmt == "mysql" and not _jdbc_driver_present(spark, "com.mysql.cj.jdbc.Driver"):
        return _load_mysql_wire(spark, ts)
    return _load_jdbc(spark, ts)
