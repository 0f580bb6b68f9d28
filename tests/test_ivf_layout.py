"""IVF physical layout: the embedding corpus materialized as parquet
partitioned by its k-means list id (`cid`), probed with partition pruning.
Since round 3 this is the registered `ann_ivf_kmeans` serving path
(`roapi_spark.functions.similarity.ivf_layout`), not just a demo: these
tests pin that (a) a single-list probe prunes every other partition at the
scan, (b) the registered query's final plan reads ONLY the probed lists'
files, and (c) the layout round-trips the oracle-checked assignment."""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

from roapi_spark.functions.similarity import (
    K_LISTS,
    kmeans_assignments,
    ivf_layout,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ivf_dir(spark, tmp_path_factory):
    os.environ["SPARK_GRAFT_CACHE_DIR"] = str(tmp_path_factory.mktemp("ivf_cache"))
    try:
        out, cents = ivf_layout(spark, SF)
    finally:
        del os.environ["SPARK_GRAFT_CACHE_DIR"]
    assert len(cents) == K_LISTS
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


def test_registered_query_scans_only_probed_lists(spark, ivf_dir, tmp_path_factory):
    """The serving path must read only the cid= partitions its query
    vectors hash to — the O(corpus/k) probe that makes IVF an index."""
    from roapi_spark.plans.registry import load_all

    os.environ["SPARK_GRAFT_CACHE_DIR"] = str(
        tmp_path_factory.mktemp("ivf_cache_probe")
    )
    try:
        df = load_all()["ann_ivf_kmeans"].builder(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        del os.environ["SPARK_GRAFT_CACHE_DIR"]
    # the only file scan in the probe plan is the layout (query vectors
    # were quantized and collected at build time), and its partition
    # filter is a static IN-list over the probed cids
    pf = re.search(r"PartitionFilters: \[cid#\d+ IN \(([\d,]+)\)", plan)
    assert pf, f"no static cid IN-list partition filter in:\n{plan}"
    scanned_cids = {int(c) for c in pf.group(1).split(",")}
    # 5 query vectors can land in at most 5 of the 8 lists: at least 3
    # cid= partitions are pruned from the scan entirely
    assert len(scanned_cids) <= 5 < K_LISTS
    # and the layout scan is the plan's only parquet scan
    assert plan.count("FileScan parquet") == 1


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


def test_cache_invalidates_on_source_change(spark, tmp_path_factory):
    """The layout cache key is content-addressed (parquet-footer digest):
    a regenerated corpus must rebuild — even when the rewrite preserves
    file size and mtime — while a pure mtime touch of unchanged content
    must NOT rebuild (it is the same snapshot)."""
    import shutil

    import duckdb

    src = tmp_path_factory.mktemp("ivf_src")
    cache = tmp_path_factory.mktemp("ivf_cache_inv")
    fixture = src / "embeddings.parquet"
    shutil.copy("/root/testdata/sf0.001/embeddings.parquet", fixture)
    os.environ["SPARK_GRAFT_CACHE_DIR"] = str(cache)
    try:
        out1, _ = ivf_layout(spark, str(src))
        mtime1 = os.path.getmtime(os.path.join(out1, "_SUCCESS"))
        # unchanged source -> same dir, no rebuild
        out2, _ = ivf_layout(spark, str(src))
        assert out2 == out1
        assert os.path.getmtime(os.path.join(out1, "_SUCCESS")) == mtime1
        # mtime touch, content unchanged -> same snapshot, still no rebuild
        os.utime(fixture)
        out2b, _ = ivf_layout(spark, str(src))
        assert out2b == out1
        assert os.path.getmtime(os.path.join(out1, "_SUCCESS")) == mtime1
        # in-place rewrite with different content but preserved mtime ->
        # the (path, mtime, size)-keyed cache of round 3 would serve the
        # stale layout; the footer digest must trigger a rebuild
        st = os.stat(fixture)
        duckdb.sql(
            "COPY (SELECT vec_id, embedding, label FROM "
            f"read_parquet('{fixture}') WHERE vec_id % 7 != 3) "
            f"TO '{fixture}' (FORMAT PARQUET)"
        )
        os.utime(fixture, ns=(st.st_atime_ns, st.st_mtime_ns))
        out3, _ = ivf_layout(spark, str(src))
        assert out3 != out1
        assert os.path.exists(os.path.join(out3, "_SUCCESS"))
    finally:
        del os.environ["SPARK_GRAFT_CACHE_DIR"]
