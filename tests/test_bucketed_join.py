"""Bucketing evidence for docs/SCALE.md: pre-bucketing both join sides by
the join key removes the co-location shuffle entirely — the strategy for
the orders-lineitem join once the dims outgrow broadcast range."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # warehouse dir is a static conf — tables land in ./spark-warehouse
    # (gitignored) and are dropped below
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    for df, name in ((orders, "orders_b"), (li, "lineitem_b")):
        (
            df.write.mode("overwrite")
            .bucketBy(8, "o_orderkey" if name == "orders_b" else "l_orderkey")
            .sortBy("o_orderkey" if name == "orders_b" else "l_orderkey")
            .format("parquet")
            .saveAsTable(name)
        )
    yield spark
    for name in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_no_shuffle(bucketed):
    spark = bucketed
    # disable broadcast so the join strategy must rely on distribution
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.sql(
            """
            SELECT o.o_orderkey, count(*) AS n
            FROM orders_b o JOIN lineitem_b l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderkey
            """
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        # both sides read pre-bucketed: no Exchange feeding the join
        assert "SortMergeJoin" in plan
        join_part = plan.split("SortMergeJoin")[1]
        assert "Exchange hashpartitioning(o_orderkey" not in join_part
        assert "Exchange hashpartitioning(l_orderkey" not in join_part
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
