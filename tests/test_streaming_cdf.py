"""Streaming CDF source (streaming/cdf.py): per-version delivery,
exactly-once across restarts via the file-source checkpoint, cdc-backed
change rows for CDF-enabled tables."""

from __future__ import annotations

import os

from roapi_spark.sinks.delta import delete_delta, update_delta, write_delta
from roapi_spark.streaming.cdf import stream_table_changes


def _collecting_process(seen: list):
    def process(version: int, changes) -> None:
        rows = changes.select("_change_type").groupBy("_change_type").count().collect()
        seen.append((version, {r._change_type: r["count"] for r in rows}))

    return process


def test_stream_delivers_each_version_once_in_order(spark, tmp_path):
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "id bigint, v double"
        ).repartition(1),
        path,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    delete_delta(spark, path, "id = 3")  # v1
    seen: list = []
    q = stream_table_changes(spark, path, _collecting_process(seen), ckpt)
    try:
        q.processAllAvailable()
        assert [v for v, _ in seen] == [0, 1]
        assert seen[0][1] == {"insert": 10}
        assert seen[1][1] == {"delete": 1}  # cdc rows, not derived churn

        # new commits arrive while the stream runs
        update_delta(spark, path, "id = 4", {"v": "99.0"})  # v2
        q.processAllAvailable()
        assert [v for v, _ in seen] == [0, 1, 2]
        assert seen[2][1] == {"update_preimage": 1, "update_postimage": 1}
    finally:
        q.stop()

    # restart from the checkpoint: nothing re-delivered, new work flows
    delete_delta(spark, path, "id = 5")  # v3
    seen2: list = []
    q2 = stream_table_changes(spark, path, _collecting_process(seen2), ckpt)
    try:
        q2.processAllAvailable()
        assert [v for v, _ in seen2] == [3]
        assert seen2[0][1] == {"delete": 1}
    finally:
        q2.stop()


def test_stream_start_version_skips_history(spark, tmp_path):
    path = str(tmp_path / "t2")
    write_delta(
        spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, s string"),
        path,
    )
    delete_delta(spark, path, "id = 1")  # v1 (derived changes: no CDF conf)
    seen: list = []
    q = stream_table_changes(
        spark,
        path,
        _collecting_process(seen),
        str(tmp_path / "ckpt2"),
        start_version=1,
    )
    try:
        q.processAllAvailable()
        assert [v for v, _ in seen] == [1]
        # derivation on a non-CDF table: whole-file delete + survivor insert
        assert seen[0][1].get("delete", 0) >= 1
    finally:
        q.stop()


def test_stream_ignores_checkpoint_artifacts(spark, tmp_path):
    """Classic parquet checkpoints and _last_checkpoint in the log dir
    must not surface as phantom versions."""
    from roapi_spark.sinks.delta import write_checkpoint

    path = str(tmp_path / "t3")
    write_delta(
        spark.createDataFrame([(1,)], "id bigint"), path
    )
    write_delta(
        spark.createDataFrame([(2,)], "id bigint"), path, mode="append"
    )
    write_checkpoint(path)
    assert os.path.exists(os.path.join(path, "_delta_log", "_last_checkpoint"))
    seen: list = []
    q = stream_table_changes(
        spark, path, _collecting_process(seen), str(tmp_path / "ckpt3")
    )
    try:
        q.processAllAvailable()
        assert [v for v, _ in seen] == [0, 1]
    finally:
        q.stop()
