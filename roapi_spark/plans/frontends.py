"""Queries exercising the REST/GraphQL frontend planners (SURVEY.md §2.3-2.4)
through the registry so the driver's oracle gate covers them.

Each builder goes through the real planner code path
(roapi_spark.query.rest / roapi_spark.query.graphql), not a hand-built
DataFrame — the oracle SQL pins the planner's semantics:
filters -> projection -> sort (nulls_first both directions) -> limit/page.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from roapi_spark.plans.registry import register
from roapi_spark.query.graphql import graphql_to_df
from roapi_spark.query.rest import rest_query_to_df


def _customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))


@register(
    "rest_filter_sort_page",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_acctbal >= 1000 AND c_mktsegment = 'BUILDING'
    ORDER BY c_acctbal DESC NULLS FIRST, c_custkey ASC NULLS FIRST
    LIMIT 10 OFFSET 10
    """,
    doc="REST planner: ?columns=&filter[col]op=&sort=&limit=&page= "
    "(reference: columnq/src/query/rest.rs:64-155; ops rest.rs:60-115; "
    "nulls-first-on-desc query/mod.rs:6-20; limit-after-sort rest.rs:140).",
    tags=("frontend", "rest"),
)
def rest_filter_sort_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rest_query_to_df(
        _customer(spark, sf_dir),
        {
            "columns": "c_custkey,c_name,c_acctbal",
            "filter[c_acctbal]gte": "1000",
            "filter[c_mktsegment]": "'BUILDING'",
            "sort": "-c_acctbal,+c_custkey",
            "limit": "10",
            "page": "2",
        },
    )


@register(
    "rest_filter_ops",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > 500 AND c_acctbal <= 9000 AND c_custkey < 800
    ORDER BY c_custkey ASC NULLS FIRST
    """,
    doc="REST planner comparison ops: gt/lte/lt chained as AND.",
    tags=("frontend", "rest"),
)
def rest_filter_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rest_query_to_df(
        _customer(spark, sf_dir),
        {
            "columns": "c_custkey,c_acctbal",
            "filter[c_acctbal]gt": "500",
            "filter[c_acctbal]lte": "9000",
            "filter[c_custkey]lt": "800",
            "sort": "c_custkey",
        },
    )


@register(
    "graphql_query",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_acctbal >= 2000 AND c_acctbal <= 9500
    ORDER BY c_acctbal DESC NULLS FIRST, c_custkey ASC NULLS FIRST
    LIMIT 15
    """,
    doc="GraphQL planner: filter/sort/limit args + selection-set projection "
    "(reference: columnq/src/query/graphql.rs:226-345).",
    tags=("frontend", "graphql"),
)
def graphql_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = """
    {
      customer(
        filter: { c_acctbal: { gteq: 2000, lteq: 9500 } }
        sort: [{ field: "c_acctbal", order: "desc" }, { field: "c_custkey" }]
        limit: 15
      ) {
        c_custkey
        c_name
        c_acctbal
      }
    }
    """
    return graphql_to_df({"customer": _customer(spark, sf_dir)}, q)
