"""GraphQL planner unit tests (reference: columnq/src/query/graphql.rs)."""

from __future__ import annotations

import pytest

from roapi_spark.query.graphql import GraphQLQueryError, graphql_to_df


@pytest.fixture(scope="module")
def tables(spark):
    rows = [
        (1, "a", 10.0, True),
        (2, "b", None, False),
        (3, "a", 5.0, True),
        (4, "c", 7.5, False),
    ]
    return {"things": spark.createDataFrame(rows, "id int, cat string, val double, flag boolean")}


def test_operator_filter_and_projection(tables):
    out = graphql_to_df(tables, '{ things(filter: {val: {gteq: 5, lt: 10}}) { id val } }')
    assert out.columns == ["id", "val"]
    assert sorted(r.id for r in out.collect()) == [3, 4]


def test_bare_literal_equality_and_bool(tables):
    out = graphql_to_df(tables, '{ things(filter: {cat: "a"}) { id } }')
    assert sorted(r.id for r in out.collect()) == [1, 3]
    out = graphql_to_df(tables, "{ things(filter: {flag: true}) { id } }")
    assert sorted(r.id for r in out.collect()) == [1, 3]


def test_sort_desc_nulls_first_and_limit(tables):
    out = graphql_to_df(
        tables,
        '{ things(sort: [{field: "val", order: "desc"}], limit: 2) { id val } }',
    )
    assert [r.id for r in out.collect()] == [2, 1]


def test_page(tables):
    out = graphql_to_df(tables, '{ things(sort: [{field: "id"}], limit: 2, page: 2) { id } }')
    assert [r.id for r in out.collect()] == [3, 4]


def test_unknown_table(tables):
    with pytest.raises(GraphQLQueryError):
        graphql_to_df(tables, "{ nope { id } }")
