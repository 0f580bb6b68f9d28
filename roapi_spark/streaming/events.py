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
# state = the earliest few event times per stage (epoch micros, sorted):
# keeping small SETS instead of resolved stage timestamps makes the
# funnel deterministic under any micro-batch split and correct for
# out-of-order arrivals the watermark admits (a purchase processed
# before its prerequisite click still converts once the click lands).
FUNNEL_STATE = T.StructType(
    [
        T.StructField("signups", T.ArrayType(T.LongType())),
        T.StructField("clicks", T.ArrayType(T.LongType())),
        T.StructField("purchases", T.ArrayType(T.LongType())),
    ]
)
_FUNNEL_STAGES = ("signup", "click", "purchase")
_FUNNEL_KEEP = 32           # earliest event times kept per stage
_FUNNEL_ABANDON_MS = 3_600_000  # drop in-progress funnels idle past 1 h


def _funnel_resolve(s1: list, s2: list, s3: list):
    """(t1, t2, t3) from the stage sets: first signup, first click
    strictly after it, first purchase strictly after that."""
    t1 = s1[0] if s1 else None
    t2 = next((t for t in s2 if t1 is not None and t > t1), None)
    t3 = next((t for t in s3 if t2 is not None and t > t2), None)
    return t1, t2, t3


def _funnel_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    empty = pd.DataFrame(
        [], columns=["user_id", "signup_ts", "purchase_ts", "seconds_to_convert"]
    )
    if state.hasTimedOut:
        # abandoned funnel: evict without emitting — state stays bounded
        # by the abandonment horizon, like sessionize's gap timeout
        state.remove()
        yield empty
        return
    s1, s2, s3 = (
        [list(x) for x in state.get] if state.exists else ([], [], [])
    )
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        for et, bucket in zip(_FUNNEL_STAGES, (s1, s2, s3)):
            ts = pdf.loc[pdf["event_type"] == et, "ts"]
            # session tz is pinned UTC by the session factory, so the
            # naive wall-clock -> micros mapping is DST-free and exact
            bucket.extend(int(pd.Timestamp(t).value // 1_000) for t in ts)
    s1, s2, s3 = (sorted(set(b))[:_FUNNEL_KEEP] for b in (s1, s2, s3))
    t1, t2, t3 = _funnel_resolve(s1, s2, s3)
    if t3 is not None:
        # conversion: emit once, consume the events up to t3, and keep
        # any later arrivals so a fresh funnel can start — identical
        # output under any batching of the same event stream
        s1 = [t for t in s1 if t > t3]
        s2 = [t for t in s2 if t > t3]
        s3 = [t for t in s3 if t > t3]
        out = pd.DataFrame(
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
        if not (s1 or s2 or s3):
            state.remove()
            yield out
            return
        state.update((s1, s2, s3))
        last = max(x[-1] for x in (s1, s2, s3) if x)
        state.setTimeoutTimestamp(
            max(last // 1_000 + _FUNNEL_ABANDON_MS, state.getCurrentWatermarkMs() + 1)
        )
        yield out
        return
    if not (s1 or s2 or s3):
        yield empty
        return
    state.update((s1, s2, s3))
    last = max(x[-1] for x in (s1, s2, s3) if x)
    state.setTimeoutTimestamp(
        max(last // 1_000 + _FUNNEL_ABANDON_MS, state.getCurrentWatermarkMs() + 1)
    )
    yield empty


def funnel_stream(stream: DataFrame, watermark: str = "10 seconds") -> DataFrame:
    """Streaming ordered funnel (signup -> click after -> purchase
    after), the incremental twin of the batch ``q_event_funnel``: the
    earliest few event times per stage live in the state store (bounded
    sets, so out-of-order arrivals the watermark admits still convert
    and output is identical under any micro-batch split); one row emits
    the moment a user completes the chain, consumed events drop, and
    abandoned funnels are evicted by an event-time timeout one hour past
    the user's last event — state is horizon-bounded exactly like
    sessionize, never proportional to the all-time user population."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel_fn,
            FUNNEL_OUTPUT,
            FUNNEL_STATE,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
