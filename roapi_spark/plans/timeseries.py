"""Time-series SQL surface beyond the reference's own tests: interval
(range) joins and gap-filled series with last-observation-carried-forward.

The reference's SQL layer (DataFusion via `columnq/src/query/sql.rs`) would
express these as plain SQL; here they're DataFrame plans with DuckDB
oracles.

Scale notes: the range join is an equi-join on user_id with a range
residual — Spark plans it as a hash/sort-merge join partitioned by
user_id, so pair blowup is bounded per user, not global. The gap-fill
spine is (distinct types) x (day range): tiny relative to the fact table,
so the left join broadcasts the aggregated side at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from roapi_spark.plans.analytics import events_t
from roapi_spark.plans.registry import register
from roapi_spark.util import pround


def events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_t(spark, sf_dir)


@register(
    "q_range_join",
    oracle="""
    WITH err AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
    ), clk AS (
      SELECT user_id, ts AS cts, value FROM events WHERE event_type = 'click'
    )
    SELECT e.event_id,
           CAST(COUNT(c.cts) AS BIGINT) AS n_clicks_5m,
           FLOOR(COALESCE(SUM(c.value), 0.0) * 10000 + 0.5) / 10000.0
             AS clicks_value_5m
    FROM err e LEFT JOIN clk c
      ON e.user_id = c.user_id
     AND c.cts > e.ts - INTERVAL 5 MINUTE
     AND c.cts <= e.ts
    GROUP BY e.event_id
    """,
    doc="Interval/range join: for every error event, count and sum the "
    "same user's click events in the trailing 5-minute window. Equi-join "
    "on user_id with a time-range residual — partitions by user, never "
    "builds the global cross product.",
    tags=("sql", "timeseries"),
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    err = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("cts"), "value"
    )
    joined = err.join(
        clk,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("cts") > F.col("ts") - F.expr("INTERVAL 5 MINUTE"))
        & (F.col("cts") <= F.col("ts")),
        "left",
    )
    return joined.groupBy("event_id").agg(
        F.count("cts").cast("bigint").alias("n_clicks_5m"),
        pround(F.coalesce(F.sum("value"), F.lit(0.0))).alias("clicks_value_5m"),
    )


@register(
    "q_gapfill_locf",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             COUNT(*) AS n, FLOOR(AVG(value) * 10000 + 0.5) / 10000.0 AS avg_v
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1 FROM events
    ), spine AS (
      SELECT t.event_type, CAST(g.day AS DATE) AS day
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
                  FROM bounds) g
    )
    SELECT s.event_type, s.day,
           CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events,
           LAST_VALUE(d.avg_v IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_value_locf
    FROM spine s LEFT JOIN daily d
      ON s.event_type = d.event_type AND s.day = d.day
    """,
    doc="Gap-filled daily series with LOCF interpolation (the timescaledb "
    "time_bucket_gapfill + locf() shape): a generated (type x day) spine "
    "left-joined to the daily aggregate, missing days filled with 0 "
    "counts and last-observed average carried forward. The spine is "
    "dimension-sized (types x days), so the join broadcasts it at any "
    "fact-table scale; LOCF is a per-type ordered window.",
    tags=("sql", "timeseries"),
)
def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n"), pround(F.avg("value")).alias("avg_v"))
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    days = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(days)
    joined = spine.join(daily, ["event_type", "day"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "day",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
        F.last("avg_v", ignorenulls=True).over(w).alias("avg_value_locf"),
    )


SESSION_GAP_S = 1800


@register(
    "q_sessionize_batch",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS tus FROM events
    ), flags AS (
      SELECT user_id, event_id, tus,
             CASE WHEN LAG(tus) OVER w IS NULL
                    OR tus - LAG(tus) OVER w > {SESSION_GAP_S * 1000000}
                  THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
    ), sess AS (
      SELECT user_id, tus,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flags
    )
    SELECT user_id, CAST(sid AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(FLOOR((MAX(tus) - MIN(tus)) / 1000000.0) AS BIGINT)
             AS duration_s
    FROM sess GROUP BY user_id, sid
    """,
    doc="Batch sessionization (the offline twin of the streaming stateful "
    f"sessionize): per-user gap-{SESSION_GAP_S // 60}min session ids via "
    "LAG + running SUM of session-start flags, then per-session rollup. "
    "Both windows and the final agg share the user_id partitioning — one "
    "shuffle total; at 100 TB sessions build independently per user "
    "shard. Gap compares are integer microseconds (no float time math). "
    "Both windows tie-break on event_id so duplicate timestamps get "
    "deterministic (and cross-engine identical) session ids.",
    tags=("timeseries", "agg"),
)
def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir).select(
        "user_id", "event_id", F.unix_micros("ts").alias("tus")
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    flagged = ev.select(
        "user_id",
        "event_id",
        "tus",
        F.when(
            F.lag("tus").over(w).isNull()
            | (F.col("tus") - F.lag("tus").over(w) > SESSION_GAP_S * 1_000_000),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    cum = Window.partitionBy("user_id").orderBy("tus", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = flagged.select(
        "user_id", "tus", F.sum("new_s").over(cum).alias("sid")
    )
    return sess.groupBy("user_id", F.col("sid").cast("bigint").alias("session_id")).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.floor((F.max("tus") - F.min("tus")) / 1_000_000.0)
        .cast("bigint")
        .alias("duration_s"),
    )
