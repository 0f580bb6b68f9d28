"""Plan-shape regression tests: the scale-critical physical-plan
properties from docs/SCALE.md, pinned so a refactor can't silently
reintroduce a shuffle or lose pushdown."""

from __future__ import annotations

import pytest

from roapi_spark.plans.registry import load_all

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def specs():
    return load_all()


def _plan(spark, specs, name: str) -> str:
    return specs[name].builder(spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_q1_pushdown_and_partial_agg(spark, specs):
    plan = _plan(spark, specs, "q1_pricing_summary")
    assert "DataFilters: [isnotnull(l_shipdate" in plan  # predicate reaches the scan
    assert "partial_sum" in plan  # map-side combine
    # column pruning: projection never reads l_partkey/l_suppkey
    assert "l_partkey" not in plan


def test_q5_broadcasts_all_dims(spark, specs):
    plan = _plan(spark, specs, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") == 5  # every dim broadcast
    assert "SortMergeJoin" not in plan  # lineitem never shuffles for a join
    assert plan.count("Scan parquet") >= 6


def test_topk_uses_take_ordered(spark, specs):
    plan = _plan(spark, specs, "q3_shipping_priority")
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort


def test_semi_join_for_exists(spark, specs):
    plan = _plan(spark, specs, "q4_order_priority")
    assert "LeftSemi" in plan


def test_minhash_signatures_no_shuffle(spark, specs):
    from roapi_spark.functions.dedup import docs, minhash_signatures

    plan = (
        minhash_signatures(docs(spark, SF))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure map-side signature computation


def test_rest_planner_pushes_filters(spark, specs):
    plan = _plan(specs=specs, name="rest_filter_ops", spark=spark)
    assert "PushedFilters: [" in plan and "GreaterThan(c_acctbal" in plan
