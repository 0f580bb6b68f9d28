"""sqllogictest-style fuzz of the SQL passthrough: hypothesis generates
random (predicate, group-by, having) aggregate queries over `orders`; the
IDENTICAL SQL text runs on Spark and on DuckDB and must produce the same
rows (order-insensitive value hash, same machinery as the oracle gate).

Kept to the deterministic cross-engine subset: integer/string columns,
COUNT/MIN/MAX/SUM(bigint), comparisons on stored values (no float
arithmetic), AND/OR/NOT predicate trees. This is the robustness evidence
for `catalog.query_sql` beyond the hand-written registry queries.
"""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from roapi_spark.testing.oracle import compare, duckdb_conn

ATOMS = [
    lambda d: f"o_orderkey % {d['k']} = {d['r'] % d['k']}",
    lambda d: f"o_custkey <= {d['c']}",
    lambda d: f"o_totalprice < {d['t']}.0",
    lambda d: f"o_orderpriority LIKE '{d['p']}%'",
    lambda d: f"o_orderstatus = '{d['s']}'",
    lambda d: "o_orderkey IS NOT NULL",
]


@st.composite
def predicates(draw, depth: int = 2) -> str:
    params = {
        "k": draw(st.integers(2, 7)),
        "r": draw(st.integers(0, 6)),
        "c": draw(st.integers(0, 2000)),
        "t": draw(st.integers(0, 300000)),
        "p": draw(st.integers(1, 5)),
        "s": draw(st.sampled_from(["O", "F", "P"])),
    }
    atom = draw(st.sampled_from(ATOMS))(params)
    if depth == 0 or draw(st.booleans()):
        return atom
    op = draw(st.sampled_from(["AND", "OR"]))
    neg = "NOT " if draw(st.booleans()) else ""
    rhs = draw(predicates(depth=depth - 1))
    return f"({atom} {op} {neg}({rhs}))"


@st.composite
def queries(draw) -> str:
    group = draw(st.sampled_from(["o_orderpriority", "o_orderstatus"]))
    pred = draw(predicates())
    having = draw(st.sampled_from(["", " HAVING COUNT(*) > 2", " HAVING MIN(o_orderkey) >= 1"]))
    return (
        f"SELECT {group} AS g, COUNT(*) AS n, "
        "CAST(MIN(o_orderkey) AS BIGINT) AS mn, "
        "CAST(MAX(o_orderkey) AS BIGINT) AS mx, "
        "CAST(SUM(o_custkey) AS BIGINT) AS s "
        f"FROM {{tbl}} WHERE {pred} GROUP BY {group}{having}"
    )


@pytest.fixture(scope="module")
def fuzz_env(spark, sf_dir):
    spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).createOrReplaceTempView(
        "orders_fuzz"
    )
    return spark, duckdb_conn(sf_dir)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=queries())
def test_fuzz_sql_matches_duckdb(fuzz_env, sql):
    spark, conn = fuzz_env
    df = spark.sql(sql.format(tbl="orders_fuzz"))
    res = compare("fuzz", df, conn, sql.format(tbl="orders"))
    assert res.ok, f"{res.detail}\nsql={sql}"
