"""IVF physical layout demo: materialize the embedding corpus as parquet
partitioned by its k-means list id (`cid`), then show that a probe of one
list prunes every other partition at the scan — the storage layout that
turns `ann_ivf_kmeans`'s candidate filter into an O(corpus/k) read at
100 TB instead of a full scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from roapi_spark.functions.similarity import kmeans_assignments

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ivf_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ivf") / "emb_by_cid")
    assigned = kmeans_assignments(spark, SF)
    # the write itself is the "build the inverted file" step: one shuffle
    # by cid, then each list is a contiguous parquet partition
    assigned.repartition("cid").write.partitionBy("cid").parquet(out)
    return out


def test_probe_prunes_partitions(spark, ivf_dir):
    probed = spark.read.parquet(ivf_dir).filter(F.col("cid") == 3)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # the cid predicate lands in PartitionFilters (directory pruning),
    # not in DataFilters (row-level scan work)
    assert "PartitionFilters: [isnotnull(cid" in plan and "(cid#" in plan
    assert "DataFilters: []" in plan
    n_total = spark.read.parquet(ivf_dir).count()
    n_probed = probed.count()
    assert 0 < n_probed < n_total


def test_layout_preserves_assignment(spark, ivf_dir):
    from_layout = {
        (r.vec_id, r.cid)
        for r in spark.read.parquet(ivf_dir).select("vec_id", "cid").collect()
    }
    direct = {
        (r.vec_id, r.cid)
        for r in kmeans_assignments(spark, SF).select("vec_id", "cid").collect()
    }
    assert from_layout == direct
