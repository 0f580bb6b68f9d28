"""Remaining SURVEY §2.5 surface rows as oracle-checked queries: grouping
sets, math functions, null-handling functions, UNION ALL, IN/BETWEEN/LIKE
predicates, time-bucket windows (date_bin analogue)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from roapi_spark.plans.analytics import events_t, t
from roapi_spark.plans.registry import register
from roapi_spark.util import pround


@register(
    "q_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="Explicit GROUPING SETS (SQL passthrough on both engines).",
    tags=("agg",),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "q_math_funcs",
    oracle="""
    SELECT p_partkey,
           ROUND(ABS(p_retailprice - 1000), 4)       AS abs_delta,
           ROUND(SQRT(p_retailprice), 4)             AS sqrt_price,
           ROUND(POWER(p_size, 2), 4)                AS size_sq,
           ROUND(LN(p_retailprice), 4)               AS ln_price,
           ROUND(LOG10(p_retailprice), 4)            AS log10_price,
           CAST(CEIL(p_retailprice) AS BIGINT)       AS ceil_price,
           CAST(FLOOR(p_retailprice) AS BIGINT)      AS floor_price,
           p_size % 5                                AS size_mod,
           ROUND(SIN(p_size) + COS(p_size), 4)       AS trig
    FROM part WHERE p_partkey <= 50
    """,
    doc="Math scalar battery: abs/sqrt/power/ln/log10/ceil/floor/mod/trig.",
    tags=("scalar",),
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 50)
    return p.select(
        "p_partkey",
        F.round(F.abs(F.col("p_retailprice") - 1000), 4).alias("abs_delta"),
        F.round(F.sqrt("p_retailprice"), 4).alias("sqrt_price"),
        F.round(F.pow("p_size", F.lit(2)), 4).alias("size_sq"),
        F.round(F.log("p_retailprice"), 4).alias("ln_price"),
        F.round(F.log10("p_retailprice"), 4).alias("log10_price"),
        F.ceil("p_retailprice").cast("bigint").alias("ceil_price"),
        F.floor("p_retailprice").cast("bigint").alias("floor_price"),
        (F.col("p_size") % 5).alias("size_mod"),
        F.round(F.sin("p_size") + F.cos("p_size"), 4).alias("trig"),
    )


@register(
    "q_null_handling",
    oracle="""
    WITH j AS (
      SELECT n.n_name, c.c_custkey, c.c_acctbal
      FROM nation n LEFT JOIN customer c
        ON n.n_nationkey = c.c_nationkey AND c.c_acctbal > 9000
    )
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT)                       AS n_rows,
           CAST(COUNT(c_custkey) AS BIGINT)               AS n_nonnull,
           CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           ROUND(SUM(COALESCE(c_acctbal, 0)), 4)          AS total_bal,
           COALESCE(CAST(MAX(c_custkey) AS VARCHAR), 'none') AS max_cust,
           MAX(NULLIF(n_name, 'NATION_0'))                AS name_or_null
    FROM j GROUP BY n_name
    """,
    doc="NULL semantics: COUNT(*) vs COUNT(col), IS NULL, COALESCE, NULLIF "
    "over an outer join that manufactures nulls.",
    tags=("scalar", "join"),
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    j = n.join(
        c, (n.n_nationkey == c.c_nationkey) & (c.c_acctbal > 9000), "left"
    ).select("n_name", "c_custkey", "c_acctbal")
    return j.groupBy("n_name").agg(
        F.count("*").alias("n_rows"),
        F.count("c_custkey").alias("n_nonnull"),
        F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0)).alias("n_null"),
        F.round(F.sum(F.coalesce("c_acctbal", F.lit(0.0))), 4).alias("total_bal"),
        F.coalesce(F.max("c_custkey").cast("string"), F.lit("none")).alias("max_cust"),
        F.max(F.nullif(F.col("n_name"), F.lit("NATION_0"))).alias("name_or_null"),
    )


@register(
    "q_union_all",
    oracle="""
    SELECT kind, CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(v), 4) AS total
    FROM (
      SELECT 'order' AS kind, o_totalprice AS v FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT 'line' AS kind, l_extendedprice AS v FROM lineitem WHERE l_returnflag = 'R'
    )
    GROUP BY kind
    """,
    doc="UNION ALL of heterogeneous relations unified to a common schema.",
    tags=("setop",),
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.lit("order").alias("kind"), F.col("o_totalprice").alias("v"))
    )
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(F.lit("line").alias("kind"), F.col("l_extendedprice").alias("v"))
    )
    return o.unionAll(li).groupBy("kind").agg(
        F.count("*").alias("n"), F.round(F.sum("v"), 4).alias("total")
    )


@register(
    "q_in_between_like",
    oracle="""
    SELECT
      CAST((SELECT COUNT(*) FROM part WHERE p_brand IN ('Brand#1','Brand#5','Brand#9')) AS BIGINT)
        AS n_in,
      CAST((SELECT COUNT(*) FROM part WHERE p_size BETWEEN 10 AND 20) AS BIGINT) AS n_between,
      CAST((SELECT COUNT(*) FROM part WHERE p_name LIKE '%iron%') AS BIGINT)     AS n_like,
      CAST((SELECT COUNT(*) FROM part WHERE p_name NOT LIKE 'a%') AS BIGINT)     AS n_not_like,
      CAST((SELECT COUNT(*) FROM part WHERE p_type SIMILAR TO '(PROMO|ECONOMY)') AS BIGINT)
        AS n_regex
    """,
    doc="Predicate battery: IN-list, BETWEEN, LIKE/NOT LIKE, regex match — "
    "as ONE conditional aggregation (part scans once, one Spark job).",
    tags=("filter",),
)
def q_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    return p.agg(
        F.count(F.when(F.col("p_brand").isin("Brand#1", "Brand#5", "Brand#9"), 1)).alias("n_in"),
        F.count(F.when(F.col("p_size").between(10, 20), 1)).alias("n_between"),
        F.count(F.when(F.col("p_name").like("%iron%"), 1)).alias("n_like"),
        F.count(F.when(~F.col("p_name").like("a%"), 1)).alias("n_not_like"),
        F.count(F.when(F.col("p_type").rlike("^(PROMO|ECONOMY)$"), 1)).alias("n_regex"),
    )


@register(
    "q_time_bucket",
    oracle="""
    SELECT CAST(TIME_BUCKET(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
             AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(AVG(value) * 10000 + 0.5) / 10000.0 AS avg_value
    FROM events
    WHERE event_type = 'click'
    GROUP BY 1
    """,
    doc="date_bin / time-bucket windows (Spark F.window tumbling 15 min == "
    "DuckDB time_bucket; both align buckets to epoch-multiple boundaries).",
    tags=("scalar", "agg"),
)
def q_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_t(spark, sf_dir).filter(F.col("event_type") == "click")
    return (
        ev.groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n"), pround(F.avg("value")).alias("avg_value"))
        .select(F.col("w.start").alias("bucket"), "n", "avg_value")
    )


@register(
    "graphql_page",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice
    FROM orders
    WHERE o_totalprice >= 100000
    ORDER BY o_orderkey ASC NULLS FIRST
    LIMIT 8 OFFSET 16
    """,
    doc="GraphQL planner paging: limit+page args (skip=(page-1)*limit, "
    "graphql.rs:303-342), through the real planner code path.",
    tags=("frontend", "graphql"),
)
def graphql_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.query.graphql import graphql_to_df

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).withColumn(
        "o_totalprice", F.round("o_totalprice", 4)
    )
    q = """
    {
      orders(
        filter: { o_totalprice: { gteq: 100000 } }
        sort: [{ field: "o_orderkey" }]
        limit: 8
        page: 3
      ) { o_orderkey o_totalprice }
    }
    """
    return graphql_to_df({"orders": orders}, q)


@register(
    "q_asof_join",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
      FROM events
    ),
    attributed AS (
      SELECT event_id, user_id, ts, value,
             MAX(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts,
             event_type
      FROM ev
    )
    SELECT event_id, user_id,
           CAST(DATE_TRUNC('second', ts) AS TIMESTAMP) AS purchase_ts,
           CAST(DATE_TRUNC('second', last_click_ts) AS TIMESTAMP) AS click_ts,
           CAST(CASE WHEN last_click_ts IS NULL THEN NULL
                ELSE FLOOR(EPOCH(ts - last_click_ts)) END AS BIGINT) AS gap_sec
    FROM attributed
    WHERE event_type = 'purchase'
    """,
    doc="As-of join (purchase -> most recent preceding click per user), "
    "expressed as a running MAX window over the unioned event stream — "
    "the composition strategy for as-of semantics Spark lacks natively. "
    "One shuffle on user_id; no range-join explosion at any scale.",
    tags=("window", "asof"),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = events_t(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    last_click = F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(w)
    attributed = ev.select(
        "event_id", "user_id", "ts", "event_type", last_click.alias("last_click_ts")
    ).filter(F.col("event_type") == "purchase")
    gap = F.when(
        F.col("last_click_ts").isNotNull(),
        F.floor(
            (F.unix_micros("ts") - F.unix_micros("last_click_ts")) / 1_000_000
        ).cast("bigint"),
    )
    return attributed.select(
        "event_id",
        "user_id",
        F.date_trunc("second", "ts").alias("purchase_ts"),
        F.date_trunc("second", "last_click_ts").alias("click_ts"),
        gap.alias("gap_sec"),
    )


@register(
    "q_stratified_sample",
    oracle="""
    WITH tagged AS (
      SELECT doc_id, lang,
             ('0x' || SUBSTR(MD5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(MIN(doc_id) AS BIGINT) AS first_id
    FROM tagged
    WHERE bucket < CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 80 ELSE 25 END
    GROUP BY lang
    """,
    doc="Deterministic stratified sampling for training-data mixing: "
    "hash-bucket each doc (md5 -> 0..99) and keep a per-language rate. "
    "Reproducible across runs/engines, pure map-side, no RNG state.",
    tags=("text", "sampling"),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "bigint"
        )
        % 100
    )
    rate = (
        F.when(F.col("lang") == "en", 50).when(F.col("lang") == "de", 80).otherwise(25)
    )
    return (
        d.select("doc_id", "lang", bucket.alias("bucket"))
        .filter(F.col("bucket") < rate)
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"), F.min("doc_id").alias("first_id"))
    )


@register(
    "q_token_count_bpe",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             REGEXP_EXTRACT_ALL(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]') AS pieces,
             LENGTH(text) AS n_chars
      FROM documents
    )
    SELECT doc_id,
           CAST(LEN(pieces) AS BIGINT) AS n_bpe_pieces,
           CAST(LEN(LIST_FILTER(pieces, x -> REGEXP_MATCHES(x, '^[0-9]+$'))) AS BIGINT)
             AS n_number_pieces,
           FLOOR(CAST(n_chars AS DOUBLE) / GREATEST(LEN(pieces), 1) * 10000 + 0.5) / 10000.0
             AS chars_per_piece
    FROM toks
    """,
    doc="BPE-ish token counting: GPT-style pre-tokenizer regex (letter "
    "runs | digit runs | single punctuation) — the standard proxy for "
    "token budgeting before real BPE; chars-per-piece approximates "
    "compression ratio. Map-side only.",
    tags=("text",),
)
def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.util import pround

    d = t(spark, sf_dir, "documents")
    pieces = F.regexp_extract_all("text", F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), 0)
    dd = d.select("doc_id", F.length("text").alias("n_chars"), pieces.alias("pieces"))
    return dd.select(
        "doc_id",
        F.size("pieces").cast("bigint").alias("n_bpe_pieces"),
        F.size(F.filter(F.col("pieces"), lambda x: x.rlike("^[0-9]+$")))
        .cast("bigint")
        .alias("n_number_pieces"),
        pround(
            F.col("n_chars").cast("double") / F.greatest(F.size("pieces"), F.lit(1))
        ).alias("chars_per_piece"),
    )


@register(
    "q_salted_aggregation",
    oracle="""
    SELECT l_returnflag, ROUND(SUM(l_extendedprice), 4) AS sum_price,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Skew-mitigation pattern under the gate: a two-stage SALTED "
    "aggregation — stage 1 groups by (key, l_orderkey % 16) so a hot key "
    "spreads over 16 reducers, stage 2 folds the partials by key alone. "
    "l_returnflag has 3 distinct values, the worst-case skew shape at "
    "100 TB: an unsalted shuffle would put a third of the table on one "
    "reducer (AQE skew handling only splits *partition*-level skew, not "
    "single-key hotspots in aggregations). Same result as the plain "
    "GROUP BY the oracle runs, same one-pass scan; the extra stage-2 "
    "shuffle moves only keys*salts rows.",
    tags=("aggregate", "scale"),
)
def q_salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    stage1 = li.groupBy(
        "l_returnflag", (F.col("l_orderkey") % 16).alias("salt")
    ).agg(F.sum("l_extendedprice").alias("ps"), F.count("*").alias("pn"))
    return (
        stage1.groupBy("l_returnflag")
        .agg(
            F.round(F.sum("ps"), 4).alias("sum_price"),
            F.sum("pn").cast("bigint").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_percentiles",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(quantile_cont(o_totalprice, 0.25) * 10000 + 0.5) / 10000.0 AS p25,
           FLOOR(quantile_cont(o_totalprice, 0.50) * 10000 + 0.5) / 10000.0 AS p50,
           FLOOR(quantile_cont(o_totalprice, 0.90) * 10000 + 0.5) / 10000.0 AS p90
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Exact percentiles (linear interpolation: Spark percentile() == "
    "DuckDB quantile_cont) per group. Exact quantiles need the group's "
    "values together — the partial-agg collects per-group sorted runs; "
    "for 100 TB use q_approx_aggs' approx_percentile (sketch-mergeable) "
    "instead, which this query is the exact baseline for.",
    tags=("agg",),
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n"),
        pround(F.expr("percentile(o_totalprice, 0.25)")).alias("p25"),
        pround(F.expr("percentile(o_totalprice, 0.50)")).alias("p50"),
        pround(F.expr("percentile(o_totalprice, 0.90)")).alias("p90"),
    )


@register(
    "q_pivot",
    oracle="""
    SELECT l_returnflag,
           FLOOR(COALESCE(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0)
                 * 10000 + 0.5) / 10000.0 AS qty_f,
           FLOOR(COALESCE(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0)
                 * 10000 + 0.5) / 10000.0 AS qty_o
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="PIVOT: one output column per l_linestatus value with summed "
    "quantity. Explicit value list keeps it a single-pass conditional "
    "aggregation (no extra distinct-values job) — the scale-safe form.",
    tags=("agg",),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.coalesce(F.sum("l_quantity"), F.lit(0)))
    )
    return p.select(
        "l_returnflag",
        pround(F.col("F")).alias("qty_f"),
        pround(F.col("O")).alias("qty_o"),
    )
