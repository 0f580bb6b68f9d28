"""Structured Streaming tests: file micro-batches -> windowed agg with
watermark; stateful sessionization via applyInPandasWithState."""

from __future__ import annotations

import json

import pytest

from roapi_spark.streaming.events import sessionize, stream_events, windowed_counts


def _write_batch(d, name, rows):
    (d / name).write_text("\n".join(json.dumps(r) for r in rows))


@pytest.fixture
def stream_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    _write_batch(
        d,
        "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01T00:00:10", "user_id": 7, "event_type": "click", "value": 1.0, "props": "{}"},
            {"event_id": 2, "ts": "2024-01-01T00:00:40", "user_id": 7, "event_type": "click", "value": 2.0, "props": "{}"},
            {"event_id": 3, "ts": "2024-01-01T00:01:10", "user_id": 8, "event_type": "view", "value": 5.0, "props": "{}"},
        ],
    )
    return d


def test_windowed_counts_with_watermark(spark, stream_dir, tmp_path):
    q = (
        windowed_counts(stream_events(spark, str(stream_dir)), "1 minute", "2 minutes")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .start()
    )
    try:
        q.processAllAvailable()
        # append mode emits only watermark-closed windows; feed a late-moving
        # second batch to push the watermark past the first windows
        _write_batch(
            stream_dir,
            "b2.json",
            [{"event_id": 9, "ts": "2024-01-01T00:10:00", "user_id": 9, "event_type": "click", "value": 0.5, "props": "{}"}],
        )
        q.processAllAvailable()
        rows = {
            (r.window_start.isoformat(), r.event_type): (r.n, r.sum_value)
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
        assert rows[("2024-01-01T00:00:00", "click")] == (2, 3.0)
        assert rows[("2024-01-01T00:01:00", "view")] == (1, 5.0)
    finally:
        q.stop()


def test_sessionize_stateful(spark, stream_dir, tmp_path):
    # Event-time timeouts: sessions close when the WATERMARK passes
    # last-event + 30 s gap — deterministic, no wall-clock sleep.  Keep the
    # state-store partition count tiny so each micro-batch checkpoints 2
    # partitions, not 32.
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            sessionize(stream_events(spark, str(stream_dir)), watermark="10 seconds")
            .writeStream.format("memory")
            .queryName("sessions")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    try:
        q.processAllAvailable()
        # watermark so far: 00:01:10 - 10s = 00:01:00 < both session closes
        # (00:01:10 for user 7, 00:01:40 for user 8) -> nothing emitted yet
        open_rows = spark.sql("SELECT * FROM sessions").collect()
        assert open_rows == []
        # an event far in the future pushes the watermark past both closes
        _write_batch(
            stream_dir,
            "b3.json",
            [{"event_id": 10, "ts": "2024-01-01T00:05:00", "user_id": 99, "event_type": "click", "value": 0.1, "props": "{}"}],
        )
        q.processAllAvailable()
        rows = {r.user_id: (r.n_events, r.total_value) for r in spark.sql("SELECT * FROM sessions").collect()}
        assert rows.get(7) == (2, 3.0)
        assert rows.get(8) == (1, 5.0)
        # user 99's session is still open (watermark has not passed it)
        assert 99 not in rows
    finally:
        q.stop()
