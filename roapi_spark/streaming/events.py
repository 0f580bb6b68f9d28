"""Structured Streaming over the events schema.

The reference has no streaming surface (SURVEY §2.7 — its only time-based
behavior is whole-table reload), so this module is the designed extension
point: the same events table, processed incrementally.

- ``stream_events`` — file-source ``readStream`` (new files under a dir are
  the micro-batches; at scale this is the standard landing-zone pattern,
  swap the source for kafka with one line).
- ``windowed_counts`` — event-time tumbling window + watermark for late
  data; state store bounds memory by evicting windows older than the
  watermark.
- ``sessionize`` — custom stateful operator via ``applyInPandasWithState``:
  per-user session aggregation with a gap timeout, the canonical
  beyond-SQL streaming op.
- ``dedup_stream`` — incremental exact dedup with watermark-bounded state
  (``dropDuplicatesWithinWatermark``).
- ``click_view_interval_join`` — stream-stream interval join with
  watermarks on both sides, bounded join state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, path: str, fmt: str = "json") -> DataFrame:
    return spark.readStream.schema(EVENTS_SCHEMA).format(fmt).load(path)


def windowed_counts(
    stream: DataFrame, window: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Tumbling event-time window; late rows beyond the watermark drop out
    of state instead of accumulating forever."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


SESSION_OUTPUT = "user_id bigint, n_events int, total_value double, session_start timestamp, session_end timestamp"
SESSION_STATE = "n int, total double, start timestamp, last timestamp"

SESSION_GAP_MS = 30 * 1000  # 30 s inactivity closes a session


def _session_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        n, total, start, last = state.get
        state.remove()
        yield pd.DataFrame(
            [(key[0], n, total, start, last)],
            columns=["user_id", "n_events", "total_value", "session_start", "session_end"],
        )
        return
    n, total, start, last = state.get if state.exists else (0, 0.0, None, None)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        total += float(pdf["value"].sum())
        lo, hi = pdf["ts"].min(), pdf["ts"].max()
        start = lo if start is None or lo < start else start
        last = hi if last is None or hi > last else last
    state.update((n, total, start, last))
    # Event-time timeout: the session closes when the *watermark* passes
    # last-event + gap.  Unlike a processing-time timeout this never spins
    # the trigger loop with empty micro-batches (the engine fires at most
    # one no-data batch per watermark advance) and is fully deterministic
    # under test — no wall-clock sleeps.  The timeout timestamp must sit
    # strictly above the current watermark or Spark rejects it.
    close_at = int(pd.Timestamp(last).value // 1_000_000) + SESSION_GAP_MS
    state.setTimeoutTimestamp(max(close_at, state.getCurrentWatermarkMs() + 1))
    yield pd.DataFrame(
        [], columns=["user_id", "n_events", "total_value", "session_start", "session_end"]
    )


def sessionize(stream: DataFrame, watermark: str = "10 seconds") -> DataFrame:
    """Per-user session rollup with a 30 s inactivity gap — emits one row
    per closed session (custom stateful operator the SQL surface can't
    express; state lives in the checkpointed state store).

    Timeouts are event-time (watermark-driven): at 100 TB/day ingest a
    processing-time timeout would couple session semantics to executor
    scheduling and keep the trigger loop busy; event-time state eviction
    is bounded by the watermark exactly like the windowed aggregate."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            SESSION_OUTPUT,
            SESSION_STATE,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def dedup_stream(stream: DataFrame, watermark: str = "10 seconds") -> DataFrame:
    """Streaming exact dedup — the incremental form of the batch
    ``dedup_exact`` operator, for a training-data landing zone where the
    same document/event can arrive twice (retries, replays).

    ``dropDuplicatesWithinWatermark`` keys state by ``event_id`` and
    evicts each key once the watermark passes its event time, so state is
    bounded by the watermark horizon; plain ``dropDuplicates`` on a stream
    would keep every id ever seen. At 100 TB/day the state store holds
    only the horizon's ids per partition."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def click_view_interval_join(
    stream: DataFrame, gap: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Stream-stream interval join: each click pairs with the same user's
    views occurring in ``(click_ts, click_ts + gap]``.

    Both sides carry watermarks and the join condition bounds event-time
    distance, so the state store can discard rows once the watermark
    passes their join horizon — the canonical bounded-state stream-stream
    join (unbounded-condition joins would accumulate state forever)."""
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    views = (
        stream.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    return clicks.join(
        views,
        F.expr(
            f"c_user = v_user AND view_ts > click_ts "
            f"AND view_ts <= click_ts + interval {gap}"
        ),
    ).select(
        F.col("c_user").alias("user_id"), "click_id", "click_ts", "view_id", "view_ts"
    )


ANOMALY_OUTPUT = (
    "event_type string, event_id bigint, ts timestamp, value double, "
    "ewma double, zscore double"
)
ANOMALY_STATE = "mean double, var double, n bigint"

EWMA_ALPHA = 0.3
Z_THRESH = 3.0
ANOMALY_WARMUP = 3  # don't flag until the EWMA has seen this many rows
ANOMALY_IDLE_EVICT_MS = 10 * 60 * 1000


def _anomaly_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    cols = ["event_type", "event_id", "ts", "value", "ewma", "zscore"]
    if state.hasTimedOut:
        state.remove()
        yield pd.DataFrame([], columns=cols)
        return
    mean, var, n = state.get if state.exists else (0.0, 0.0, 0)
    rows = []
    last_ts = None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        # deterministic within-batch order: event time, then id
        pdf = pdf.sort_values(["ts", "event_id"])
        for r in pdf.itertuples():
            v = float(r.value)
            std = var**0.5
            z = (v - mean) / std if std > 1e-12 else 0.0
            if n >= ANOMALY_WARMUP and abs(z) > Z_THRESH:
                rows.append((key[0], int(r.event_id), r.ts, v, mean, z))
            delta = v - mean
            mean += EWMA_ALPHA * delta
            var = (1 - EWMA_ALPHA) * (var + EWMA_ALPHA * delta * delta)
            n += 1
            last_ts = r.ts
    state.update((mean, var, n))
    if last_ts is not None:
        evict = int(pd.Timestamp(last_ts).value // 1_000_000) + ANOMALY_IDLE_EVICT_MS
        state.setTimeoutTimestamp(max(evict, state.getCurrentWatermarkMs() + 1))
    yield pd.DataFrame(rows, columns=cols)


def anomaly_stream(stream: DataFrame, watermark: str = "10 seconds") -> DataFrame:
    """Per-event-type EWMA anomaly detector (custom stateful operator):
    each key keeps an exponentially-weighted mean/variance of ``value``;
    rows whose z-score against the pre-update EWMA exceeds ``Z_THRESH``
    after a warmup are emitted. The standard streaming drift/outlier
    monitor a training-data ingest pipeline runs at the landing zone.

    State is three doubles per key (O(#event types)), evicted after
    ``ANOMALY_IDLE_EVICT_MS`` of event-time inactivity via the same
    watermark-driven timeout as ``sessionize`` — bounded state, no
    trigger-loop spin, deterministic in tests."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            _anomaly_fn,
            ANOMALY_OUTPUT,
            ANOMALY_STATE,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def enrich_stream(stream: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Stream-static enrichment join: attach slowly-changing dimension
    attributes to the event stream at ingest (the landing-zone pattern
    that precedes any per-segment aggregation).

    Stateless per micro-batch: Spark re-resolves the static side each
    batch (so a view swapped by the catalog refresh loop is picked up)
    and plans a broadcast when the dimension is small — no streaming
    state at all, which is what makes it safe at any stream volume."""
    return stream.join(F.broadcast(dim), on, "left")


def segment_rollup_stream(
    stream: DataFrame,
    dim: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Enrichment + windowed rollup composed: per-(window, segment)
    event counts/value — the shape of every per-cohort ingest metric.
    Only the window/segment aggregate keeps state; the join adds none."""
    enriched = enrich_stream(stream, dim)
    return (
        enriched.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "segment")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "segment",
            "n",
            "sum_value",
        )
    )


FUNNEL_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("signup_ts", T.TimestampType()),
        T.StructField("purchase_ts", T.TimestampType()),
        T.StructField("seconds_to_convert", T.DoubleType()),
    ]
)
FUNNEL_STATE = T.StructType(
    [
        T.StructField("t1", T.LongType()),
        T.StructField("t2", T.LongType()),
        T.StructField("t3", T.LongType()),
    ]
)
_FUNNEL_STAGES = ("signup", "click", "purchase")


def _funnel_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    t1, t2, t3 = state.get if state.exists else (None, None, None)
    rows = [pdf for pdf in pdfs if len(pdf)]
    if rows:
        ev = pd.concat(rows).sort_values("ts")
        for _, r in ev.iterrows():
            us = int(pd.Timestamp(r["ts"]).value // 1_000)
            et = r["event_type"]
            if t1 is None and et == _FUNNEL_STAGES[0]:
                t1 = us
            elif t2 is None and t1 is not None and et == _FUNNEL_STAGES[1] and us > t1:
                t2 = us
            elif t3 is None and t2 is not None and et == _FUNNEL_STAGES[2] and us > t2:
                t3 = us
    if t3 is not None:
        # funnel complete: emit once and drop the state (a user converts
        # once; re-arrivals start a fresh funnel)
        state.remove()
        yield pd.DataFrame(
            [
                (
                    key[0],
                    pd.Timestamp(t1 * 1_000),
                    pd.Timestamp(t3 * 1_000),
                    (t3 - t1) / 1e6,
                )
            ],
            columns=["user_id", "signup_ts", "purchase_ts", "seconds_to_convert"],
        )
        return
    state.update((t1, t2, t3))
    yield pd.DataFrame(
        [], columns=["user_id", "signup_ts", "purchase_ts", "seconds_to_convert"]
    )


def funnel_stream(stream: DataFrame, watermark: str = "10 seconds") -> DataFrame:
    """Streaming ordered funnel (signup -> click after -> purchase
    after), the incremental twin of the batch ``q_event_funnel``: per-user
    stage timestamps live in the state store; one row emits the moment a
    user completes the chain, then the state drops. Stage matching is
    strictly-after on event time within arrival order — at 100 TB/day the
    state per user is three longs, and completed users cost nothing."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel_fn,
            FUNNEL_OUTPUT,
            FUNNEL_STATE,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
