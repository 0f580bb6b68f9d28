"""Lifecycle of a long-lived curated-corpus Delta table, end to end:

  1. publish   write_delta(overwrite)    initial curated snapshot
  2. ingest    write_delta(append) xN    per-batch arrivals (or
                                         foreachBatch from a stream)
  3. checkpoint write_checkpoint         bound log replay for readers
  4. compact   compact                   collapse per-batch small files
  5. vacuum    vacuum                    reclaim out-of-window files

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

    # 5. reclaim files only referenced by pre-compaction versions
    # (keep_versions=1: retain just the compacted snapshot — keeping 2
    # would still reference the small files through the prior version)
    removed = vacuum(table_path, keep_versions=1)

    ts = TableSource(name="corpus", uri=table_path, format="delta", option={})
    live = to_dataframe(spark, ts)
    adds, _ = snapshot_state(table_path)
    return {
        "initial_version": v0,
        "checkpoint_version": ck,
        "compacted_version": cv,
        "vacuumed_files": len(removed),
        "live_rows": live.count(),
        "live_files": len(adds),
    }


if __name__ == "__main__":
    import tempfile

    from roapi_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    with tempfile.TemporaryDirectory() as d:
        out = run(get_spark("delta-lifecycle"), os.path.join(d, "corpus"), sf_dir)
        print(out)
