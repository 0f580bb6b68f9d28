from roapi_spark.plans.registry import QUERIES, QuerySpec, register

__all__ = ["QUERIES", "QuerySpec", "register"]
