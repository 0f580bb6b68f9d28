"""Property-based fuzz of the REST query-param planner: hypothesis
generates random `filter[col]op= / columns= / sort= / limit=&page=`
combinations over `customer`; the planner's DataFrame result must match a
straightforwardly-translated SQL run on DuckDB (same order-insensitive
value-hash machinery as the oracle gate).

Determinism notes: every generated sort list ends with the unique
`c_custkey` so limit/page windows are unambiguous, and the oracle spells
out the reference's nulls-first-both-directions rule explicitly."""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from roapi_spark.query.rest import rest_query_to_df
from roapi_spark.testing.oracle import compare, duckdb_conn

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]

FILTERS = [
    lambda d: ("filter[c_nationkey]lt", str(d["nk"]), f"c_nationkey < {d['nk']}"),
    lambda d: ("filter[c_nationkey]gteq", str(d["nk"]), f"c_nationkey >= {d['nk']}"),
    lambda d: ("filter[c_acctbal]gt", f"{d['bal']}.5", f"c_acctbal > {d['bal']}.5"),
    lambda d: ("filter[c_acctbal]lteq", f"{d['bal']}.5", f"c_acctbal <= {d['bal']}.5"),
    lambda d: (
        "filter[c_mktsegment]",
        f"'{d['seg']}'",
        f"c_mktsegment = '{d['seg']}'",
    ),
]

SORT_COLS = ["c_acctbal", "c_nationkey", "c_mktsegment"]


@st.composite
def rest_cases(draw):
    d = {
        "nk": draw(st.integers(0, 25)),
        "bal": draw(st.integers(-1000, 10000)),
        "seg": draw(st.sampled_from(SEGMENTS)),
    }
    params: dict[str, str] = {}
    where: list[str] = []
    for mk in draw(st.lists(st.sampled_from(FILTERS), max_size=2, unique_by=id)):
        key, val, sql = mk(d)
        params[key] = val
        where.append(sql)

    sort_cols = draw(st.lists(st.sampled_from(SORT_COLS), max_size=2, unique=True))
    sort_tokens, order_by = [], []
    for c in sort_cols:
        if draw(st.booleans()):
            sort_tokens.append(f"-{c}")
            order_by.append(f"{c} DESC NULLS FIRST")
        else:
            sort_tokens.append(c)
            order_by.append(f"{c} ASC NULLS FIRST")
    sort_tokens.append("c_custkey")
    order_by.append("c_custkey ASC NULLS FIRST")
    params["sort"] = ",".join(sort_tokens)

    # projection must cover the sort columns (planner applies
    # filters -> projection -> sort, mirroring rest.rs plan order)
    cols = sorted(set(sort_cols) | {"c_custkey"} | set(draw(
        st.lists(st.sampled_from(["c_name", "c_mktsegment"]), max_size=1)
    )))
    params["columns"] = ",".join(cols)

    limit = draw(st.integers(1, 40))
    page = draw(st.integers(1, 3))
    params["limit"], params["page"] = str(limit), str(page)

    sql = (
        f"SELECT {', '.join(cols)} FROM customer"
        + (f" WHERE {' AND '.join(where)}" if where else "")
        + f" ORDER BY {', '.join(order_by)}"
        + f" LIMIT {limit} OFFSET {(page - 1) * limit}"
    )
    return params, sql


@pytest.fixture(scope="module")
def rest_env(spark, sf_dir):
    df = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    return df, duckdb_conn(sf_dir)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=rest_cases())
def test_fuzz_rest_planner_matches_sql(rest_env, case):
    df, conn = rest_env
    params, sql = case
    out = rest_query_to_df(df, params)
    res = compare("rest_fuzz", out, conn, sql)
    assert res.ok, f"{res.detail}\nparams={params}\nsql={sql}"
