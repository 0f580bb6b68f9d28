"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H Q1 shape) on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 + the
LLM-pipeline operators (dedup / similarity / text analysis).
``oracle_sql()`` — DuckDB-equivalent SQL per query (same column names;
queries without an entry are non-SQL-expressible and get rows-only checks).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may import this file by path; make the package importable
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from roapi_spark.plans.registry import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from roapi_spark.plans.analytics import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


# Queries the round-1 driver run did not record (it stopped at 50 of 62
# registry entries, in iteration order).  Listed first so a capped run
# covers them; everything else follows in registration order.
_RECORD_FIRST = [
    "q7_nation_volume",
    "q8_market_share",
    "q10_returned_items",
    "q14_promo_revenue",
    "q16_supplier_variety",
    "q18_large_orders",
    "q19_disjunctive",
    "q22_global_sales_opportunity",
    "q_scalar_subquery",
    "q_correlated_subquery",
    "q_json_access",
    "q_binary_ops",
]


def _ordered_specs():
    specs = load_all()
    out = {n: specs[n] for n in _RECORD_FIRST if n in specs}
    out.update({n: s for n, s in specs.items() if n not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.builder for name, spec in _ordered_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in _ordered_specs().items()
        if spec.oracle is not None
    }
