"""Local stand-in for the driver's correctness gate: run each registered
query on Spark and its oracle SQL on DuckDB over the same parquet tables,
then compare row-count + column names + order-insensitive value hash.

Values are normalized before hashing (floats -> repr of float64, timestamps
-> ISO strings, NaN/None unified) so engine-level representation differences
don't mask genuine matches.
"""

from __future__ import annotations

import hashlib
import math
import os
from dataclasses import dataclass
from datetime import date, datetime

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    conn = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            conn.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return conn


def _norm(v: object) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(rows: list[tuple], col_order: list[int]) -> str:
    """Order-insensitive: hash each row (cols sorted by name), XOR-free —
    sort the row-digests then hash the concatenation."""
    digests = sorted(
        hashlib.sha1("|".join(_norm(r[i]) for i in col_order).encode()).hexdigest()
        for r in rows
    )
    return hashlib.sha1("\n".join(digests).encode()).hexdigest()


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def compare(name: str, spark_df, conn: duckdb.DuckDBPyConnection, oracle: str) -> CompareResult:
    spark_cols = [f.name for f in spark_df.schema.fields]
    spark_rows = [tuple(r) for r in spark_df.collect()]

    rel = conn.sql(oracle)
    oracle_cols = list(rel.columns)
    oracle_rows = rel.fetchall()

    if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in oracle_cols):
        return CompareResult(
            name, False, len(spark_rows), len(oracle_rows),
            f"column mismatch: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}",
        )
    if len(spark_rows) != len(oracle_rows):
        return CompareResult(
            name, False, len(spark_rows), len(oracle_rows),
            f"row count mismatch: {len(spark_rows)} vs {len(oracle_rows)}",
        )

    s_order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i].lower())
    o_order = sorted(range(len(oracle_cols)), key=lambda i: oracle_cols[i].lower())
    sh = value_hash(spark_rows, s_order)
    oh = value_hash(oracle_rows, o_order)
    if sh != oh:
        # find a sample differing row for debugging
        s_set = {tuple(_norm(r[i]) for i in s_order) for r in spark_rows}
        o_set = {tuple(_norm(r[i]) for i in o_order) for r in oracle_rows}
        only_s = list(s_set - o_set)[:2]
        only_o = list(o_set - s_set)[:2]
        return CompareResult(
            name, False, len(spark_rows), len(oracle_rows),
            f"value hash mismatch; spark-only={only_s} oracle-only={only_o}",
        )
    return CompareResult(name, True, len(spark_rows), len(oracle_rows))
