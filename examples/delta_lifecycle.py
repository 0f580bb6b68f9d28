"""Lifecycle of a long-lived curated-corpus Delta table, end to end:

  1. publish   write_delta(overwrite)    initial curated snapshot
  2. ingest    write_delta(append) xN    per-batch arrivals (or
                                         foreachBatch from a stream)
  3. checkpoint write_checkpoint         bound log replay for readers
  4. compact   compact                   collapse per-batch small files
  5. dml       delete_delta / merge_delta  row-level curation fixes
                                         (copy-on-write, only touched
                                         files rewritten; also reachable
                                         as SQL DELETE/MERGE in rw mode)
  6. vacuum    vacuum                    reclaim out-of-window files
  7. zorder    compact(zorder_by=...)    Morton-cluster an unpartitioned
                                         metrics table, then serve a
                                         selective range scan through
                                         snapshot_adds_pruned (stats-
                                         based file skipping)

Every step is readable by this engine's own pure-Python delta source
(register the directory with format: delta) and by any external Delta
client — protocol stays (1, 2). Run: python examples/delta_lifecycle.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(spark, table_path: str, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from roapi_spark.config import TableSource
    from roapi_spark.sinks.delta import (
        compact,
        vacuum,
        write_checkpoint,
        write_delta,
    )
    from roapi_spark.sources.delta import snapshot_state, to_dataframe

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # 1. initial snapshot: the "kept" corpus slice, partitioned by source
    kept = docs.filter(F.col("n_chars") >= 200)
    v0 = write_delta(kept, table_path, mode="overwrite", partition_by=["source"])

    # 2. late arrivals land as appends (one atomic version each)
    for lo, hi in ((0, 100), (100, 200)):
        batch = docs.filter(
            (F.col("n_chars") >= lo) & (F.col("n_chars") < hi)
        )
        write_delta(batch, table_path, mode="append", partition_by=["source"])

    # 3. checkpoint: readers now seed from parquet state, not a replay
    ck = write_checkpoint(table_path)

    # 4. compact the per-batch small files into one file per partition
    cv = compact(spark, table_path)

    # 5. row-level curation fixes, copy-on-write (only files holding
    #    affected rows are rewritten; each is one atomic version):
    #    drop docs a later screen flagged, then MERGE in relabelled rows
    from roapi_spark.sinks.delta import delete_delta, merge_delta

    dv = delete_delta(spark, table_path, "n_chars < 50")
    fixes = (
        to_dataframe(
            spark,
            TableSource(name="_c", uri=table_path, format="delta", option={}),
        )
        .filter(F.col("doc_id") % 97 == 0)
        .withColumn("lang", F.lit("und"))
    )
    mv = merge_delta(
        spark,
        table_path,
        fixes,
        on=["doc_id"],
        when_matched_update={"lang": "s.lang"},
        when_not_matched_insert=False,
    )

    # 6. reclaim files only referenced by out-of-window versions
    # (keep_versions=3: the two DML versions + their parent still
    # resolve; older pre-compaction snapshots lose their files loudly)
    removed = vacuum(table_path, keep_versions=3)

    # 7. a separate UNPARTITIONED metrics table: Morton-cluster it and
    #    serve a selective two-column scan from the pruned file list
    from roapi_spark.sources.delta import snapshot_adds_pruned

    metrics_path = table_path + "_metrics"
    metrics = docs.select("doc_id", "n_chars")
    write_delta(metrics.repartition(8), metrics_path, mode="overwrite")
    compact(spark, metrics_path, target_partitions=8,
            zorder_by=["n_chars", "doc_id"])
    cand, skipped, cand_bytes, total_bytes = snapshot_adds_pruned(
        metrics_path, {"n_chars": (100, 300), "doc_id": (0, 63)}
    )
    selective = (
        spark.read.parquet(*cand)
        .filter("n_chars BETWEEN 100 AND 300 AND doc_id BETWEEN 0 AND 63")
        .count()
        if cand
        else 0
    )

    ts = TableSource(name="corpus", uri=table_path, format="delta", option={})
    live = to_dataframe(spark, ts)
    adds, _ = snapshot_state(table_path)
    return {
        "initial_version": v0,
        "checkpoint_version": ck,
        "compacted_version": cv,
        "delete_version": dv,
        "merge_version": mv,
        "vacuumed_files": len(removed),
        "live_rows": live.count(),
        "live_files": len(adds),
        "zorder_files_skipped": len(skipped),
        "zorder_files_scanned": len(cand),
        "zorder_selective_rows": selective,
    }


if __name__ == "__main__":
    import tempfile

    from roapi_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    with tempfile.TemporaryDirectory() as d:
        out = run(get_spark("delta-lifecycle"), os.path.join(d, "corpus"), sf_dir)
        print(out)
