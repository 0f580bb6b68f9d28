"""Property-based fuzz of the GraphQL planner, mirroring the REST fuzz:
hypothesis composes random filter/sort/limit GraphQL queries over
`customer`; the planner's result must match the translated SQL on DuckDB
(order-insensitive value-hash compare, nulls-first both directions)."""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from roapi_spark.query.graphql import graphql_to_df
from roapi_spark.testing.oracle import compare, duckdb_conn

SF = "/root/testdata/sf0.001"
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]

FILTERS = [
    lambda d: (f"c_nationkey: {{lt: {d['nk']}}}", f"c_nationkey < {d['nk']}"),
    lambda d: (f"c_nationkey: {{gteq: {d['nk']}}}", f"c_nationkey >= {d['nk']}"),
    lambda d: (f"c_acctbal: {{gt: {d['bal']}.5}}", f"c_acctbal > {d['bal']}.5"),
    lambda d: (
        f'c_mktsegment: {{eq: "{d["seg"]}"}}',
        f"c_mktsegment = '{d['seg']}'",
    ),
]


@st.composite
def gql_cases(draw):
    d = {
        "nk": draw(st.integers(min_value=0, max_value=24)),
        "bal": draw(st.integers(min_value=-999, max_value=9999)),
        "seg": draw(st.sampled_from(SEGMENTS)),
    }
    picked = draw(
        st.lists(st.sampled_from(FILTERS), min_size=0, max_size=2, unique=True)
    )
    parts = [f(d) for f in picked]
    sort_desc = draw(st.booleans())
    limit = draw(st.integers(min_value=1, max_value=40))

    filter_arg = (
        "filter: {" + ", ".join(p[0] for p in parts) + "}, " if parts else ""
    )
    order = "desc" if sort_desc else "asc"
    gql = (
        "query { customer("
        + filter_arg
        + f'sort: [{{field: "c_acctbal", order: "{order}"}}, '
        + f'{{field: "c_custkey", order: "asc"}}], limit: {limit})'
        + " { c_custkey c_acctbal c_nationkey c_mktsegment } }"
    )
    where = (" WHERE " + " AND ".join(p[1] for p in parts)) if parts else ""
    # reference semantics: nulls first for BOTH directions
    null_dir = "NULLS FIRST"
    sql = (
        "SELECT c_custkey, c_acctbal, c_nationkey, c_mktsegment FROM customer"
        + where
        + f" ORDER BY c_acctbal {order.upper()} {null_dir},"
        + f" c_custkey ASC {null_dir} LIMIT {limit}"
    )
    return gql, sql


@pytest.fixture(scope="module")
def tables(spark):
    return {
        "customer": spark.read.parquet(os.path.join(SF, "customer.parquet"))
    }


@pytest.fixture(scope="module")
def conn():
    return duckdb_conn(SF)


@given(gql_cases())
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_graphql_matches_oracle(tables, conn, case):
    gql, sql = case
    df = graphql_to_df(tables, gql)
    res = compare("gql_fuzz", df, conn, sql)
    assert res.ok, f"{gql}\n{sql}\n{res.detail}"
