"""REST planner unit tests (reference semantics: columnq/src/query/rest.rs,
nulls-first rule columnq/src/query/mod.rs:6-20)."""

from __future__ import annotations

import pytest

from roapi_spark.query.rest import RestQueryError, parse_literal, rest_query_to_df


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "a", 10.0),
        (2, "b", None),
        (3, "a", 5.0),
        (4, "c", 7.5),
        (5, None, 2.0),
    ]
    return spark.createDataFrame(rows, "id int, cat string, val double")


def test_parse_literal():
    assert parse_literal("42") == 42
    assert parse_literal("4.5") == 4.5
    assert parse_literal("'quoted'") == "quoted"
    assert parse_literal('"dq"') == "dq"
    assert parse_literal("bare") == "bare"
    assert parse_literal("true") is True
    assert parse_literal("False") is False


def test_filter_ops(df):
    out = rest_query_to_df(df, {"filter[val]gte": "5", "filter[val]lt": "10"})
    assert sorted(r.id for r in out.collect()) == [3, 4]
    out = rest_query_to_df(df, {"filter[cat]": "'a'"})
    assert sorted(r.id for r in out.collect()) == [1, 3]


def test_projection_and_sort_nulls_first(df):
    out = rest_query_to_df(df, {"columns": "id,val", "sort": "-val"})
    assert out.columns == ["id", "val"]
    # desc with nulls FIRST (reference rule; Spark default would be nulls last)
    assert [r.id for r in out.collect()] == [2, 1, 4, 3, 5]
    out = rest_query_to_df(df, {"columns": "id,val", "sort": "+val"})
    assert [r.id for r in out.collect()] == [2, 5, 3, 4, 1]


def test_limit_page_after_sort(df):
    out = rest_query_to_df(df, {"sort": "id", "limit": "2", "page": "2"})
    assert [r.id for r in out.collect()] == [3, 4]


def test_bad_filter_key(df):
    with pytest.raises(RestQueryError):
        rest_query_to_df(df, {"filter[val]like": "x"})


def test_typed_input_conversion_from_schema(spark):
    """Query input type conversion based on table schema (the reference's
    own unchecked roadmap box): string query-parameter values compare
    correctly against int, double, boolean, and date columns — the
    filter literal adopts the COLUMN's type, not string semantics
    ('9' < '10' numerically, not lexicographically)."""
    import datetime

    from roapi_spark.query.rest import rest_query_to_df

    df = spark.createDataFrame(
        [
            (1, 9, 2.5, True, datetime.date(2024, 1, 5)),
            (2, 10, 7.5, False, datetime.date(2024, 2, 5)),
            (3, 100, -1.0, True, datetime.date(2023, 12, 31)),
        ],
        "id int, n bigint, x double, flag boolean, d date",
    )
    # numeric, not lexicographic: '9' < '10' must NOT hold as strings
    out = rest_query_to_df(df, {"filter[n]lt": "10"})
    assert [r.id for r in out.collect()] == [1]
    out = rest_query_to_df(df, {"filter[x]gte": "2.5"})
    assert sorted(r.id for r in out.collect()) == [1, 2]
    out = rest_query_to_df(df, {"filter[flag]": "true"})
    assert sorted(r.id for r in out.collect()) == [1, 3]
    out = rest_query_to_df(df, {"filter[d]gt": "'2024-01-01'"})
    assert sorted(r.id for r in out.collect()) == [1, 2]
