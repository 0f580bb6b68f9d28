"""Round-13 pipeline additions: crawl scheduling and training-order
curation.

* ``q_crawl_host_budget`` — proportional-fair fetch-budget allocation
  across domains by the largest-remainder (Hamilton) method: all
  integer arithmetic, so the allocation is exact, sums to the budget
  by construction, and replays bit-for-bit in the DuckDB oracle. The
  crawl-scheduling step between the host graph and the frontier.
* ``q_train_shuffle`` — the deterministic global shuffle a training
  pipeline applies before sharding: every doc gets an md5-derived
  position key (no RNG state — reproducible on any cluster layout,
  re-seedable per epoch via the salt), docs hash-partition into
  shards by key, and the WITHIN-shard order is the rank of the key.
  The global order is never materialized as a global sort — shards
  are independent, which is the point at 100 TB: writers stream one
  shard each, readers seek one shard each.
* ``q_train_curriculum`` — the shuffle composed with a difficulty
  prior: bucket-major (easy-to-hard) within-shard order, shuffled
  within each bucket.
* ``q_recrawl_plan`` — the conditional-refetch decision between crawl
  rounds: sitemap declarations (lastmod/changefreq) SURT-joined
  against the CDX index's latest captures; only the sidecars are read.
* ``q_domain_cap`` — anti-domination curation: keep at most K docs per
  registrable domain, best-quality-first, with Catalyst's
  WindowGroupLimit pushing the rank cut below the per-domain sort.
* ``q_crawl_fetch_schedule`` — the budget composed with a per-domain
  politeness delay policy: lane finish times and the fleet makespan.
* ``stream_sitemap_seeds`` — seed discovery as a stream: newly landed
  urlset shards parsed by the SHARED batch parse, SURT-keyed, and
  first-seen-classified through keyed state.
* ``q_chat_validate`` — SFT-transcript hygiene: real JSON round-trip
  (to_json/from_json) validated by higher-order expressions.
* ``q_pref_pair_audit`` — DPO-pair hygiene: degenerate pairs, length
  bias, shared-prompt leakage.
* ``q_split_by_domain`` — domain-disjoint train/heldout split: the
  split key is a pure function of the registrable domain, so
  disjointness is structural.
* ``stream_recrawl_frontier`` — the TTL frontier: captures classified
  new / fresh / due against per-SURT last-capture-day state — the
  third frontier variant (exact bounds correctness, Bloom bounds
  state, TTL bounds refetch rate).

No reference parity (columnq has none of these surfaces) —
training-data pipeline extension, same standing as pipeline3's
mixture/sampling ops.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from roapi_spark.plans.registry import register
from roapi_spark.util import WS_CLASS

# ---- q_crawl_host_budget ----------------------------------------------------

_BUDGET = 1000


def _host_budget_oracle() -> str:
    from roapi_spark.functions.pipeline14 import _EXT_HOSTS
    from roapi_spark.functions.pipeline16 import (
        _LINKS_PER_PAGE_SAME_DOMAIN,
        _host_case_sql,
    )
    from roapi_spark.functions.web import registrable_domain_sql

    return f"""
    WITH live AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 11 <> 3 AND doc_id % 7 <> 2
    ),
    w AS (
      SELECT {registrable_domain_sql("host")} AS domain,
             CAST(COUNT(*) AS BIGINT) AS n_links
      FROM (SELECT {_host_case_sql(_EXT_HOSTS)} AS host FROM live)
      GROUP BY 1
      UNION ALL
      SELECT 'example.com',
             CAST({_LINKS_PER_PAGE_SAME_DOMAIN}
                  * (SELECT COUNT(*) FROM live) AS BIGINT)
    ),
    q AS (
      SELECT domain, n_links,
             ({_BUDGET} * n_links) // (SELECT SUM(n_links) FROM w)
               AS base,
             ({_BUDGET} * n_links) % (SELECT SUM(n_links) FROM w)
               AS rem
      FROM w
    ),
    r AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY rem DESC, domain) AS rnk,
             (SELECT {_BUDGET} - SUM(base) FROM q) AS leftover
      FROM q
    )
    SELECT domain, n_links,
           CAST(base + (CASE WHEN rnk <= leftover THEN 1 ELSE 0 END)
                AS BIGINT) AS alloc
    FROM r ORDER BY domain
    """


@register(
    "q_crawl_host_budget",
    oracle=_host_budget_oracle(),
    doc=f"Proportional-fair crawl-budget apportionment (largest-"
    f"remainder / Hamilton method, budget {_BUDGET}): per-domain link "
    "counts from the general WAT pass become fetch-slot allocations — "
    "base = floor(B*n/N) plus one extra slot to the largest "
    "remainders (domain-asc tie-break) until exactly B slots are "
    "placed. ALL integer arithmetic: the oracle replays the same "
    "division/remainder/rank pipeline, so the allocations must match "
    "bit-for-bit and sum to the budget by construction — the rounding "
    "property naive per-domain rounding lacks. Plan: WAT snapshot -> "
    "domain hash agg (tiny) -> 1-row total broadcast -> the R extra "
    "slots selected by a DISTRIBUTED orderBy+limit (Spark's "
    "TakeOrderedAndProject: per-partition top-R then a driver merge "
    "of R-sized heaps — never a single-partition global window) "
    "joined back onto the allocation table; R itself is one collected "
    "scalar. At 100 TB the ordered set is the DOMAIN table "
    "(~1e6 rows), and only R rows ever leave it.",
    tags=("web", "graph"),
)
def q_crawl_host_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.pipeline14 import _links_snapshot
    from roapi_spark.functions.web import registrable_domain, url_host

    links = _links_snapshot(spark, sf_dir)
    w = (
        links.select(
            registrable_domain(url_host(F.col("dst_canon"))).alias("domain")
        )
        .groupBy("domain")
        .agg(F.count("*").cast("bigint").alias("n_links"))
    )
    tot = w.agg(F.sum("n_links").alias("total"))
    q = (
        w.crossJoin(F.broadcast(tot))
        .select(
            "domain",
            "n_links",
            F.expr(f"({_BUDGET} * n_links) div total").alias("base"),
            (F.lit(_BUDGET) * F.col("n_links") % F.col("total")).alias(
                "rem"
            ),
        )
        # q feeds FOUR consumers (the leftover scalar, the extras
        # top-R, and both sides of the final join): checkpoint the
        # domain-sized rows once instead of re-running the snapshot
        # agg + total broadcast per consumer (was 4 evaluations of the
        # weight subtree in the serve plan; domain table is ~1e6 rows
        # at 100 TB — checkpoint-sized by design)
        .localCheckpoint(eager=True)
    )
    # one scalar to the driver: how many remainder slots to hand out
    leftover = int(
        q.agg((F.lit(_BUDGET) - F.sum("base")).alias("l")).first()["l"]
    )
    extras = (
        q.orderBy(F.desc("rem"), F.asc("domain"))
        .limit(leftover)
        .select("domain", F.lit(1).cast("bigint").alias("extra"))
    )
    return (
        q.join(extras, "domain", "left")
        .select(
            "domain",
            "n_links",
            (F.col("base") + F.coalesce(F.col("extra"), F.lit(0)))
            .cast("bigint")
            .alias("alloc"),
        )
        .orderBy("domain")
    )


# ---- q_train_shuffle ---------------------------------------------------------

_SHUFFLE_SALT = "epoch0"
_N_TRAIN_SHARDS = 8


@register(
    "q_train_shuffle",
    oracle=f"""
    WITH k AS (
      SELECT doc_id,
             ('0x' || SUBSTR(MD5(doc_id::VARCHAR || ':{_SHUFFLE_SALT}'),
                             1, 8))::BIGINT AS key
      FROM documents
    ),
    p AS (
      SELECT doc_id, key, key % {_N_TRAIN_SHARDS} AS shard,
             ROW_NUMBER() OVER (
               PARTITION BY key % {_N_TRAIN_SHARDS}
               ORDER BY key, doc_id
             ) AS pos
      FROM k
    )
    SELECT CAST(shard AS INT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN_BY(doc_id, pos) AS BIGINT) AS first_doc,
           CAST(MAX_BY(doc_id, pos) AS BIGINT) AS last_doc,
           CAST(SUM(doc_id * pos) AS BIGINT) AS order_checksum
    FROM p GROUP BY shard ORDER BY shard
    """,
    doc=f"Deterministic global training shuffle: md5(doc_id:salt) is "
    "the position key (no RNG state — bit-identical on any cluster "
    f"layout; re-seed per epoch via the salt), docs land in "
    f"{_N_TRAIN_SHARDS} shards by key residue and are ordered WITHIN "
    "each shard by key rank. The per-shard (first, last, sum(id*pos)) "
    "checksums pin the complete order against the DuckDB replay — a "
    "single transposition anywhere shifts the checksum. Plan: "
    "hash-partition by shard + sortWithinPartitions, NEVER a global "
    "sort — shards are written/read independently, which is the whole "
    "point of the pattern at 100 TB (a global orderBy would funnel "
    "the corpus through one range-partition step).",
    tags=("text", "sampling", "pipeline"),
)
def q_train_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    keyed = d.select(
        "doc_id",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(f":{_SHUFFLE_SALT}"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("key"),
    ).withColumn("shard", F.pmod(F.col("key"), F.lit(_N_TRAIN_SHARDS)))
    pos = F.row_number().over(
        Window.partitionBy("shard").orderBy("key", "doc_id")
    )
    p = keyed.repartition(_N_TRAIN_SHARDS, "shard").withColumn("pos", pos)
    return (
        p.groupBy(F.col("shard").cast("int").alias("shard"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min_by("doc_id", "pos").cast("bigint").alias("first_doc"),
            F.max_by("doc_id", "pos").cast("bigint").alias("last_doc"),
            F.sum(F.col("doc_id") * F.col("pos"))
            .cast("bigint")
            .alias("order_checksum"),
        )
        .orderBy("shard")
    )


# ---- q_recrawl_plan ----------------------------------------------------------


def _recrawl_oracle() -> str:
    return """
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0
                  THEN 20260101 + doc_id % 3 END AS lastmod_day,
             CASE WHEN doc_id % 3 <> 1
                  THEN CASE (doc_id + doc_id // 10) % 4 WHEN 0 THEN 'daily'
                       WHEN 1 THEN 'weekly' WHEN 2 THEN 'monthly'
                       ELSE 'never' END END AS changefreq,
             CASE WHEN doc_id % 13 = 5 THEN 20260102
                  ELSE 20260101 END AS captured_day
      FROM documents
    ),
    plan AS (
      SELECT doc_id,
             CASE
               WHEN lastmod_day IS NOT NULL AND lastmod_day > captured_day
                 THEN 'stale'
               WHEN lastmod_day IS NULL AND changefreq = 'daily'
                 THEN 'daily'
               ELSE 'fresh'
             END AS verdict
      FROM d
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pages,
           CAST(SUM(CASE WHEN verdict = 'stale' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_stale,
           CAST(SUM(CASE WHEN verdict = 'daily' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_daily,
           CAST(SUM(CASE WHEN verdict = 'fresh' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_fresh,
           CAST(SUM(CASE WHEN verdict <> 'fresh' THEN doc_id ELSE 0 END)
                AS BIGINT) AS refetch_checksum
    FROM plan
    """


@register(
    "q_recrawl_plan",
    oracle=_recrawl_oracle(),
    doc="Incremental recrawl planner — the conditional-refetch decision "
    "a crawl runs between rounds, COMPOSING the two seed/index "
    "surfaces: sitemap entries (what the site declares — lastmod, "
    "changefreq) are SURT-keyed via url_to_surt and joined against "
    "the CDX index's latest capture per page (max fetch_ts over "
    "re-captures); a page refetches when its declared lastmod "
    "postdates the capture day ('stale') or, lacking lastmod, when "
    "the site declares changefreq=daily ('daily') — otherwise it is "
    "'fresh' and the archive byte is never touched. Counts per "
    "verdict plus the refetch doc-id checksum are residue closed-form "
    "(lastmod %2/%3, changefreq %3/%4, re-capture %13). Plan: "
    "file-parallel sitemap scan -> codegen'd SURT keys; index scan -> "
    "(surt) max-ts agg; one equi-join on surt; at 100 TB both inputs "
    "are the ~1000x-smaller sidecars — the plan decides what to fetch "
    "WITHOUT opening any archive.",
    tags=("web", "source"),
)
def q_recrawl_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.config import TableSource
    from roapi_spark.functions.pipeline14 import _cdx_fixture_dir
    from roapi_spark.functions.pipeline16 import _sitemap_fixture_dir
    from roapi_spark.functions.web import url_to_surt
    from roapi_spark.sources import load_table

    sm = load_table(
        spark,
        TableSource(
            name="_sm",
            uri=_sitemap_fixture_dir(spark, sf_dir),
            format="sitemap",
        ),
    ).select(
        url_to_surt(F.col("loc")).alias("surt"),
        F.regexp_replace("lastmod", "-", "").cast("bigint").alias(
            "lastmod_day"
        ),
        "changefreq",
    )
    idx = (
        load_table(
            spark,
            TableSource(
                name="_cdx",
                uri=_cdx_fixture_dir(spark, sf_dir),
                format="cdx",
            ),
        )
        .groupBy("surt_key")
        .agg(
            F.max(F.substring("fetch_ts", 1, 8).cast("bigint")).alias(
                "captured_day"
            )
        )
    )
    j = sm.join(idx, sm["surt"] == idx["surt_key"], "inner")
    verdict = (
        F.when(
            F.col("lastmod_day").isNotNull()
            & (F.col("lastmod_day") > F.col("captured_day")),
            F.lit("stale"),
        )
        .when(
            F.col("lastmod_day").isNull() & (F.col("changefreq") == "daily"),
            F.lit("daily"),
        )
        .otherwise(F.lit("fresh"))
    )
    plan = j.select(
        verdict.alias("verdict"),
        # gate glue: recover doc_id from the SURT key's path tail
        F.regexp_extract("surt", r"/(\d+)(\?|$)", 1)
        .cast("bigint")
        .alias("doc_id"),
    )
    return plan.agg(
        F.count("*").cast("bigint").alias("n_pages"),
        F.sum((F.col("verdict") == "stale").cast("bigint"))
        .cast("bigint")
        .alias("n_stale"),
        F.sum((F.col("verdict") == "daily").cast("bigint"))
        .cast("bigint")
        .alias("n_daily"),
        F.sum((F.col("verdict") == "fresh").cast("bigint"))
        .cast("bigint")
        .alias("n_fresh"),
        F.sum(
            F.when(F.col("verdict") != "fresh", F.col("doc_id")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("refetch_checksum"),
    )


# ---- q_domain_cap ------------------------------------------------------------

_DOMAIN_CAP = 20


def _domain_cap_oracle() -> str:
    from roapi_spark.functions.pipeline16 import _PSL_HOSTS, _host_case_sql
    from roapi_spark.functions.web import registrable_domain_sql

    return f"""
    WITH d AS (
      SELECT doc_id,
             {_host_case_sql(_PSL_HOSTS)} AS host,
             length(trim(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS q
      FROM documents
    ),
    dom AS (
      SELECT doc_id, q, {registrable_domain_sql("host")} AS domain FROM d
    ),
    r AS (
      SELECT doc_id, q, domain,
             ROW_NUMBER() OVER (
               PARTITION BY domain ORDER BY q DESC, doc_id
             ) AS rnk
      FROM dom
    )
    SELECT domain,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rnk <= {_DOMAIN_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rnk <= {_DOMAIN_CAP} THEN doc_id ELSE 0 END)
                AS BIGINT) AS kept_checksum,
           CAST(MIN(CASE WHEN rnk <= {_DOMAIN_CAP} THEN q END) AS BIGINT)
             AS min_kept_quality
    FROM r GROUP BY domain ORDER BY domain
    """


@register(
    "q_domain_cap",
    oracle=_domain_cap_oracle(),
    doc=f"Per-domain cap sampling — the anti-domination curation step "
    f"(a handful of boilerplate-heavy sites must not dominate a "
    f"training mix): keep at most {_DOMAIN_CAP} docs per registrable "
    "domain, best-quality-first (whitespace-normalized length as the "
    "deterministic quality stand-in, doc_id tie-break), domains from "
    "the 16-family PSL host cycle. Per-domain kept counts, kept-id "
    "checksum and the quality cut line replay in the DuckDB oracle. "
    "Plan: one shuffle on domain, then Spark's WindowGroupLimit "
    "pushes the rank<=K filter BELOW the full per-domain sort "
    "(partial top-K per partition before the final one) — so a "
    "skewed mega-domain never materializes its full sorted run; "
    "the kept set is K*|domains|, corpus-independent.",
    tags=("text", "sampling", "pipeline", "web"),
)
def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from roapi_spark.functions.pipeline16 import _host_case_col, _PSL_HOSTS
    from roapi_spark.functions.web import registrable_domain

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    dom = d.select(
        "doc_id",
        registrable_domain(_host_case_col(_PSL_HOSTS)).alias("domain"),
        F.length(
            F.trim(F.regexp_replace(F.col("text"), WS_CLASS + "+", " "))
        ).alias("q"),
    )
    rn = F.row_number().over(
        Window.partitionBy("domain").orderBy(F.desc("q"), F.asc("doc_id"))
    )
    # the kept branch FILTERS on the rank so Catalyst's WindowGroupLimit
    # inserts a partial per-partition top-K below the full sort (folding
    # the rank into aggregate CASEs instead would keep every row and
    # forfeit the pushdown — verified via explain)
    kept = (
        dom.withColumn("rnk", rn)
        .filter(F.col("rnk") <= _DOMAIN_CAP)
        .groupBy("domain")
        .agg(
            F.count("*").cast("bigint").alias("n_kept"),
            F.sum("doc_id").cast("bigint").alias("kept_checksum"),
            F.min("q").cast("bigint").alias("min_kept_quality"),
        )
    )
    counts = dom.groupBy("domain").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    return (
        counts.join(kept, "domain")
        .select(
            "domain", "n_docs", "n_kept", "kept_checksum",
            "min_kept_quality",
        )
        .orderBy("domain")
    )


# ---- q_train_curriculum --------------------------------------------------------


@register(
    "q_train_curriculum",
    oracle=f"""
    WITH k AS (
      SELECT doc_id,
             LEAST(9, length(trim(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')))
                      // 100) AS bucket,
             ('0x' || SUBSTR(MD5(doc_id::VARCHAR || ':{_SHUFFLE_SALT}'),
                             1, 8))::BIGINT AS key
      FROM documents
    ),
    p AS (
      SELECT doc_id, bucket, key % {_N_TRAIN_SHARDS} AS shard,
             ROW_NUMBER() OVER (
               PARTITION BY key % {_N_TRAIN_SHARDS}
               ORDER BY bucket, key, doc_id
             ) AS pos
      FROM k
    )
    SELECT CAST(shard AS INT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN_BY(doc_id, pos) AS BIGINT) AS first_doc,
           CAST(MAX_BY(doc_id, pos) AS BIGINT) AS last_doc,
           CAST(SUM(doc_id * pos) AS BIGINT) AS order_checksum,
           CAST(SUM(bucket * pos) AS BIGINT) AS curriculum_checksum
    FROM p GROUP BY shard ORDER BY shard
    """,
    doc="Curriculum training order: q_train_shuffle's deterministic "
    "md5 shuffle COMPOSED with a difficulty prior — docs order within "
    "each shard by (quality bucket ASC, md5 key) so every shard "
    "streams easy-to-hard while staying internally shuffled within a "
    "bucket (bucket = capped normalized-length decile, the "
    "deterministic difficulty stand-in). Per-shard order and "
    "bucket-weighted checksums replay in DuckDB — a transposition "
    "ACROSS buckets or within one shifts a checksum. Plan: identical "
    "to q_train_shuffle (hash-partition + sortWithinPartitions on a "
    "wider key, never a global sort).",
    tags=("text", "sampling", "pipeline"),
)
def q_train_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    keyed = d.select(
        "doc_id",
        F.least(
            F.lit(9),
            F.floor(
                F.length(
                    F.trim(F.regexp_replace(F.col("text"), WS_CLASS + "+", " "))
                )
                / 100
            ),
        )
        .cast("bigint")
        .alias("bucket"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(f":{_SHUFFLE_SALT}"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("key"),
    ).withColumn("shard", F.pmod(F.col("key"), F.lit(_N_TRAIN_SHARDS)))
    pos = F.row_number().over(
        Window.partitionBy("shard").orderBy("bucket", "key", "doc_id")
    )
    p = keyed.repartition(_N_TRAIN_SHARDS, "shard").withColumn("pos", pos)
    return (
        p.groupBy(F.col("shard").cast("int").alias("shard"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min_by("doc_id", "pos").cast("bigint").alias("first_doc"),
            F.max_by("doc_id", "pos").cast("bigint").alias("last_doc"),
            F.sum(F.col("doc_id") * F.col("pos"))
            .cast("bigint")
            .alias("order_checksum"),
            F.sum(F.col("bucket") * F.col("pos"))
            .cast("bigint")
            .alias("curriculum_checksum"),
        )
        .orderBy("shard")
    )


# ---- q_crawl_fetch_schedule ----------------------------------------------------

# per-domain robots.txt texts — what a crawler's robots-fetch pass
# caches per host; the politeness delays below are PARSED from these
# (functions/web.robots_crawl_delay, group-scoped like the path
# rules), not pinned as a literal table, so the gate closes the
# robots -> schedule loop data-driven. The texts exercise the
# parser's selection rules: agent group beats '*', first value in the
# winning group wins, garbage values are skipped, a missing/empty
# declaration falls to the crawler's own politeness default.
_CRAWL_UA = "trainbot"
_DEFAULT_DELAY_MS = 500

_ROBOTS_BY_DOMAIN = {
    # trainbot's own group (0.1 s) beats the '*' group's 2 s
    "example.com": (
        "User-agent: trainbot\nCrawl-delay: 0.1\n\n"
        "User-agent: *\nCrawl-delay: 2\n"
    ),
    "example.co.uk": "User-agent: *\nCrawl-delay: 0.3\n",
    "loja.com.br": "User-agent: *\nCrawl-delay: 0.2\nDisallow: /tmp\n",
    # non-numeric value skipped; next value in the group wins
    "user1.github.io": (
        "User-agent: *\nCrawl-delay: soon\nCrawl-delay: 0.3\n"
    ),
    "example.ac.in": (
        "User-agent: trainbot\nDisallow:\nCrawl-delay: 0.2\n"
    ),
    # declares no delay at all -> politeness default applies
    "demo.blogspot.com": "User-agent: *\nDisallow: /private\n",
    "example.gob.mx": "User-agent: *\nCrawl-delay: 0.3\n",
}


def _delays_from_robots(
    robots_by_domain: dict[str, str],
) -> dict[str, int]:
    """domain -> delay_ms for domains whose robots declare one."""
    from roapi_spark.functions.web import robots_crawl_delay

    out: dict[str, int] = {}
    for d, txt in robots_by_domain.items():
        delay = robots_crawl_delay(txt, _CRAWL_UA)
        if delay is not None:
            out[d] = int(round(delay * 1000))
    return out


_DELAY_MS = _delays_from_robots(_ROBOTS_BY_DOMAIN)


def _fetch_schedule_oracle() -> str:
    from roapi_spark.functions.pipeline14 import _EXT_HOSTS
    from roapi_spark.functions.pipeline16 import (
        _LINKS_PER_PAGE_SAME_DOMAIN,
        _host_case_sql,
    )
    from roapi_spark.functions.web import registrable_domain_sql

    delay_case = " ".join(
        f"WHEN '{d}' THEN {ms}" for d, ms in sorted(_DELAY_MS.items())
    )
    return f"""
    WITH live AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 11 <> 3 AND doc_id % 7 <> 2
    ),
    w AS (
      SELECT {registrable_domain_sql("host")} AS domain,
             CAST(COUNT(*) AS BIGINT) AS n_links
      FROM (SELECT {_host_case_sql(_EXT_HOSTS)} AS host FROM live)
      GROUP BY 1
      UNION ALL
      SELECT 'example.com',
             CAST({_LINKS_PER_PAGE_SAME_DOMAIN}
                  * (SELECT COUNT(*) FROM live) AS BIGINT)
    ),
    q AS (
      SELECT domain, n_links,
             ({_BUDGET} * n_links) // (SELECT SUM(n_links) FROM w) AS base,
             ({_BUDGET} * n_links) % (SELECT SUM(n_links) FROM w) AS rem
      FROM w
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, domain) AS rnk,
             (SELECT {_BUDGET} - SUM(base) FROM q) AS leftover
      FROM q
    ),
    a AS (
      SELECT domain,
             base + (CASE WHEN rnk <= leftover THEN 1 ELSE 0 END) AS alloc,
             CASE domain {delay_case} ELSE {_DEFAULT_DELAY_MS} END
               AS delay_ms
      FROM r
    ),
    s AS (
      SELECT domain, CAST(alloc AS BIGINT) AS alloc,
             CAST(delay_ms AS BIGINT) AS delay_ms,
             CAST(CASE WHEN alloc > 0 THEN (alloc - 1) * delay_ms
                       ELSE 0 END AS BIGINT) AS finish_ms
      FROM a
    )
    SELECT domain, alloc, delay_ms, finish_ms,
           CAST((SELECT MAX(finish_ms) FROM s) AS BIGINT) AS makespan_ms
    FROM s ORDER BY domain
    """


@register(
    "q_crawl_fetch_schedule",
    oracle=_fetch_schedule_oracle(),
    doc="Politeness-aware fetch schedule — budget composed with "
    "per-domain delay policy: each domain's allocated slots (the "
    "Hamilton apportionment, replayed) fetch one-per-delay, so its "
    "lane finishes at (alloc-1)*delay_ms; the fleet's makespan is the "
    "max over lanes — the number a crawl operator actually plans "
    "around (a polite slow host, not the big one, is usually "
    "critical). The delay policy is PARSED from per-domain robots.txt "
    "texts (functions/web.robots_crawl_delay — agent group beats '*', "
    "garbage values skipped, undeclared falls to the politeness "
    "default), and the oracle derives its CASE from the same parse, "
    "so the robots -> schedule loop is closed data-driven. All "
    "integers, bit-exact DuckDB replay. Plan: the (domain, alloc) "
    "table is tiny (domain-cardinality); the parsed policy is a "
    "broadcast map at fleet scale; the makespan is a 1-row agg "
    "broadcast back — no corpus access at all.",
    tags=("web", "graph"),
)
def q_crawl_fetch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _fetch_schedule_frame(spark, sf_dir, _DELAY_MS)


def _fetch_schedule_frame(
    spark: SparkSession, sf_dir: str, delay_ms: dict[str, int]
) -> DataFrame:
    """Schedule from an explicit domain->delay_ms policy (the gate
    derives its policy from the robots fixture; tests inject variants
    to prove a declared Crawl-delay moves the makespan)."""
    alloc = q_crawl_host_budget(spark, sf_dir).select("domain", "alloc")
    delay = F.lit(_DEFAULT_DELAY_MS)
    for d, ms in sorted(delay_ms.items()):
        delay = F.when(F.col("domain") == d, F.lit(ms)).otherwise(delay)
    s = alloc.select(
        "domain",
        F.col("alloc").cast("bigint").alias("alloc"),
        delay.cast("bigint").alias("delay_ms"),
        F.when(
            F.col("alloc") > 0,
            (F.col("alloc") - 1) * delay,
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("finish_ms"),
    )
    # s is read twice (the lanes and the makespan agg): checkpoint the
    # domain-sized schedule once so the budget subtree is not replayed
    # for the 1-row max
    s = s.localCheckpoint(eager=True)
    mk = s.agg(F.max("finish_ms").alias("makespan_ms"))
    return (
        s.crossJoin(F.broadcast(mk))
        .select(
            "domain", "alloc", "delay_ms", "finish_ms",
            F.col("makespan_ms").cast("bigint").alias("makespan_ms"),
        )
        .orderBy("domain")
    )


# ---- stream_sitemap_seeds ------------------------------------------------------


@register(
    "stream_sitemap_seeds",
    oracle="""
    WITH d AS (SELECT doc_id, doc_id % 3 AS s FROM documents),
    per AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY s)
    SELECT * FROM (
      SELECT 'recrawl-1.xml' AS sitemap_file, n AS n_seeds,
             CAST(0 AS BIGINT) AS n_new FROM per WHERE s = 1
      UNION ALL
      SELECT 'urlset-0.xml.gz', n, n FROM per WHERE s = 0
      UNION ALL
      SELECT 'urlset-1.xml', n, n FROM per WHERE s = 1
      UNION ALL
      SELECT 'urlset-2.xml', n, n FROM per WHERE s = 2
    ) ORDER BY sitemap_file
    """,
    doc="Streaming seed discovery gate: urlset shards land in two "
    "waves (wave 2 additionally RE-LANDS wave 1's shard under a new "
    "name — the overlapping-sitemap / re-publish arrival mix) and "
    "every offered page is SURT-classified first-seen vs known "
    "through keyed state (streaming/crawl.stream_sitemap_seeds). The "
    "parse is the SAME shared codegen'd urlset parse the batch source "
    "uses; per-file seed and first-seen counts must match the residue "
    "closed form across both waves, so a dropped shard, a re-delivered "
    "file leaking duplicate seeds, or SURT drift between the batch "
    "and streaming paths shifts a count. Plan: per-batch cost is the "
    "newly landed sitemap bytes (~1000x smaller than a crawl); state "
    "is one int per SURT — the exact kernel whose constant-state twin "
    "is the Bloom-bounded frontier.",
    tags=("streaming", "web", "source"),
)
def stream_sitemap_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from roapi_spark.functions.pipeline16 import _sitemap_fixture_dir
    from roapi_spark.streaming.crawl import (
        stream_sitemap_seeds as _stream,
        stream_state_partitions,
    )

    src = _sitemap_fixture_dir(spark, sf_dir)
    landing = tempfile.mkdtemp(prefix="sitemap_seeds_landing_")
    acc: dict[str, list] = {}

    def process(classified: DataFrame, batch_id: int) -> None:
        for r in (
            classified.groupBy("sitemap_file")
            .agg(
                F.count("*").cast("bigint").alias("n_seeds"),
                F.sum("is_new").cast("bigint").alias("n_new"),
            )
            .collect()  # bounded: one row per landed file per batch
        ):
            cur = acc.setdefault(r["sitemap_file"], [0, 0])
            cur[0] += r["n_seeds"]
            cur[1] += r["n_new"]

    try:
        for name in ("urlset-1.xml", "urlset-2.xml"):
            shutil.copy(os.path.join(src, name), os.path.join(landing, name))
        with stream_state_partitions(spark):
            q = _stream(
                spark,
                landing,
                process,
                os.path.join(landing, "_ckpt"),
                query_name="stream_sitemap_seeds",
            )
            try:
                q.processAllAvailable()
                shutil.copy(
                    os.path.join(src, "urlset-0.xml.gz"),
                    os.path.join(landing, "urlset-0.xml.gz"),
                )
                # wave 2 re-lands shard 1: re-published sitemap, zero new
                shutil.copy(
                    os.path.join(src, "urlset-1.xml"),
                    os.path.join(landing, "recrawl-1.xml"),
                )
                q.processAllAvailable()
            finally:
                q.stop()
    finally:
        shutil.rmtree(landing, ignore_errors=True)
    return spark.createDataFrame(
        sorted((f, *v) for f, v in acc.items()),
        "sitemap_file string, n_seeds bigint, n_new bigint",
    )


# ---- q_chat_validate -----------------------------------------------------------

_CHAT_ROLES = ("system", "user", "assistant")


@register(
    "q_chat_validate",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             (doc_id % 8 = 1) AS br,
             (doc_id % 8 <> 1 AND doc_id % 9 = 4) AS be,
             (doc_id % 8 <> 1 AND doc_id % 9 <> 4 AND doc_id % 12 = 7)
               AS ec,
             (doc_id % 5 = 0) AS hs
      FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_chats,
           CAST(SUM(CASE WHEN NOT br AND NOT be AND NOT ec
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           CAST(SUM(CASE WHEN br THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bad_role,
           CAST(SUM(CASE WHEN be THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bad_ending,
           CAST(SUM(CASE WHEN ec THEN 1 ELSE 0 END) AS BIGINT)
             AS n_empty_content,
           CAST(SUM(CASE WHEN NOT br AND NOT be AND NOT ec AND hs
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_valid_with_system,
           CAST(SUM(CASE WHEN NOT br AND NOT be AND NOT ec
                    THEN 2 + (CASE WHEN hs THEN 1 ELSE 0 END)
                    ELSE 0 END) AS BIGINT) AS sum_turns_valid
    FROM d
    """,
    doc="Chat-transcript validation — the SFT-data hygiene gate: "
    "conversations are synthesized as REAL JSON (to_json over "
    "struct arrays, so quoting/escaping is Spark's own) with defects "
    "planted one-per-row on fixed residues (invalid role name, "
    "missing final assistant turn, empty assistant content), then "
    "parsed back (from_json) and validated ENTIRELY by higher-order "
    "expressions — exists() over roles against the allowlist, "
    "element_at(-1) ending check, trimmed-content emptiness — never "
    "Python. Verdict counts, valid-with-system split, and the "
    "turn-count sum replay closed-form. Plan: one FileScan -> "
    "codegen'd JSON round-trip + lambda predicates -> one agg; at "
    "100 TB validation is map-side with no shuffle before the final "
    "1-row agg.",
    tags=("text", "pipeline"),
)
def q_chat_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    norm = F.regexp_replace(F.col("text"), WS_CLASS + "+", " ")
    br = F.col("doc_id") % 8 == 1
    be = ~br & (F.col("doc_id") % 9 == 4)
    ec = ~br & ~be & (F.col("doc_id") % 12 == 7)
    hs = F.col("doc_id") % 5 == 0

    def turn(role, content):
        return F.struct(role.alias("role"), content.alias("content"))

    sys_t = F.when(
        hs, turn(F.lit("system"), F.lit("You are a helpful assistant."))
    )
    user_t = turn(
        F.when(br, F.lit("usr")).otherwise(F.lit("user")),
        F.substring(norm, 1, 20),
    )
    asst_t = F.when(
        ~be,
        turn(
            F.lit("assistant"),
            F.when(ec, F.lit("")).otherwise(F.substring(norm, 21, 20)),
        ),
    )
    js = F.to_json(
        F.filter(F.array(sys_t, user_t, asst_t), lambda x: x.isNotNull())
    )
    parsed = F.from_json(
        js, "array<struct<role string, content string>>"
    )
    chats = d.select(parsed.alias("p"))
    bad_role = F.exists(
        F.col("p"), lambda x: ~x["role"].isin(*_CHAT_ROLES)
    )
    bad_end = F.element_at(F.col("p"), -1)["role"] != "assistant"
    empty = F.exists(F.col("p"), lambda x: F.trim(x["content"]) == "")
    verdict = (
        F.when(bad_role, F.lit("bad_role"))
        .when(bad_end, F.lit("bad_ending"))
        .when(empty, F.lit("empty_content"))
        .otherwise(F.lit("valid"))
    )
    v = chats.select(
        verdict.alias("verdict"),
        F.size("p").alias("n_turns"),
        (F.element_at(F.col("p"), 1)["role"] == "system").alias("has_sys"),
    )
    is_valid = F.col("verdict") == "valid"
    return v.agg(
        F.count("*").cast("bigint").alias("n_chats"),
        F.sum(is_valid.cast("bigint")).cast("bigint").alias("n_valid"),
        F.sum((F.col("verdict") == "bad_role").cast("bigint"))
        .cast("bigint")
        .alias("n_bad_role"),
        F.sum((F.col("verdict") == "bad_ending").cast("bigint"))
        .cast("bigint")
        .alias("n_bad_ending"),
        F.sum((F.col("verdict") == "empty_content").cast("bigint"))
        .cast("bigint")
        .alias("n_empty_content"),
        F.sum((is_valid & F.col("has_sys")).cast("bigint"))
        .cast("bigint")
        .alias("n_valid_with_system"),
        F.sum(F.when(is_valid, F.col("n_turns")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("sum_turns_valid"),
    )


# ---- q_pref_pair_audit ---------------------------------------------------------


@register(
    "q_pref_pair_audit",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             length(trim(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS nl,
             (doc_id % 10 = 6) AS degen,
             (doc_id % 7 = 3) AS dupp
      FROM documents
    ),
    p AS (
      SELECT doc_id, degen,
             CASE WHEN dupp THEN 'prompt-shared-' ||
                  CAST(doc_id % 5 AS VARCHAR)
                  ELSE 'prompt-' || CAST(doc_id AS VARCHAR) END AS prompt,
             CASE WHEN degen THEN nl / 2 ELSE nl END AS chosen_len,
             nl / 2 AS rejected_len
      FROM d
    ),
    dup_prompts AS (
      SELECT prompt FROM p GROUP BY prompt HAVING COUNT(*) > 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN degen THEN 1 ELSE 0 END) AS BIGINT)
             AS n_degenerate,
           CAST(SUM(CASE WHEN NOT degen AND chosen_len > rejected_len
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_chosen_longer,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM dup_prompts)
             AS n_dup_prompts,
           CAST((SELECT COUNT(*) FROM p
                 WHERE prompt IN (SELECT prompt FROM dup_prompts))
                AS BIGINT) AS n_pairs_on_dup_prompts
    FROM p
    """,
    doc="Preference-pair (DPO/RLHF) data audit: pairs are synthesized "
    "from the documents table (chosen = the doc text, rejected = its "
    "first half; %10 residue plants DEGENERATE pairs where chosen == "
    "rejected, %7 routes pairs onto five SHARED prompts) and the audit "
    "computes the three hygiene signals a preference dataset is "
    "screened for: degenerate chosen==rejected pairs (zero training "
    "signal), the chosen-longer rate (length bias — a reward model "
    "trained on length-confounded pairs learns length), and prompts "
    "appearing in multiple pairs (epistemic leakage across pairs). "
    "Counts replay closed-form. Plan: map-side pair synthesis + one "
    "hash agg on prompt for the dup split, one final agg; the dup "
    "check is the only shuffle and its key is the prompt.",
    tags=("text", "pipeline"),
)
def q_pref_pair_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    norm = F.trim(F.regexp_replace(F.col("text"), WS_CLASS + "+", " "))
    degen = F.col("doc_id") % 10 == 6
    dupp = F.col("doc_id") % 7 == 3
    half = F.substring(norm, F.lit(1), (F.length(norm) / 2).cast("int"))
    pairs = d.select(
        "doc_id",
        F.when(
            dupp,
            F.concat(
                F.lit("prompt-shared-"),
                (F.col("doc_id") % 5).cast("string"),
            ),
        )
        .otherwise(
            F.concat(F.lit("prompt-"), F.col("doc_id").cast("string"))
        )
        .alias("prompt"),
        F.when(degen, half).otherwise(norm).alias("chosen"),
        half.alias("rejected"),
    )
    per_prompt = pairs.groupBy("prompt").agg(
        F.count("*").alias("n_on_prompt")
    )
    joined = pairs.join(per_prompt, "prompt")
    return joined.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum((F.col("chosen") == F.col("rejected")).cast("bigint"))
        .cast("bigint")
        .alias("n_degenerate"),
        F.sum(
            (
                (F.col("chosen") != F.col("rejected"))
                & (F.length("chosen") > F.length("rejected"))
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("n_chosen_longer"),
        F.count_distinct(
            F.when(F.col("n_on_prompt") > 1, F.col("prompt"))
        )
        .cast("bigint")
        .alias("n_dup_prompts"),
        F.sum((F.col("n_on_prompt") > 1).cast("bigint"))
        .cast("bigint")
        .alias("n_pairs_on_dup_prompts"),
    )


# ---- q_split_by_domain ---------------------------------------------------------


def _split_by_domain_oracle() -> str:
    from roapi_spark.functions.pipeline16 import _PSL_HOSTS, _host_case_sql
    from roapi_spark.functions.web import registrable_domain_sql

    return f"""
    WITH d AS (
      SELECT doc_id, {_host_case_sql(_PSL_HOSTS)} AS host FROM documents
    ),
    dom AS (
      SELECT doc_id, {registrable_domain_sql("host")} AS domain FROM d
    ),
    s AS (
      SELECT doc_id, domain,
             CASE WHEN ('0x' || SUBSTR(MD5(domain || ':split0'), 1, 8))
                       ::BIGINT % 10 < 8
                  THEN 'train' ELSE 'heldout' END AS split
      FROM dom
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT domain) AS BIGINT) AS n_domains,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM s GROUP BY split ORDER BY split
    """


@register(
    "q_split_by_domain",
    oracle=_split_by_domain_oracle(),
    doc="Domain-disjoint train/heldout split — leakage prevention one "
    "level above doc-dedup: near-duplicate pages cluster WITHIN a "
    "site, so doc-level random splits leak; hashing the REGISTRABLE "
    "DOMAIN (md5, salt re-seedable) sends every doc of a domain to "
    "one side by construction. Per-split doc/domain counts and id "
    "checksums replay closed-form; disjointness is structural (the "
    "split key is a pure function of the domain), not sampled-and-"
    "checked. Plan: codegen'd domain + hash expressions, one hash agg "
    "— map-side decision, no shuffle before the 2-row agg; at 100 TB "
    "this is a projection on the corpus scan.",
    tags=("text", "sampling", "pipeline", "web"),
)
def q_split_by_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.pipeline16 import _host_case_col, _PSL_HOSTS
    from roapi_spark.functions.web import registrable_domain

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    dom = d.select(
        "doc_id",
        registrable_domain(_host_case_col(_PSL_HOSTS)).alias("domain"),
    )
    key = F.conv(
        F.substring(
            F.md5(F.concat(F.col("domain"), F.lit(":split0"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    s = dom.withColumn(
        "split",
        F.when(F.pmod(key, F.lit(10)) < 8, F.lit("train")).otherwise(
            F.lit("heldout")
        ),
    )
    return (
        s.groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count_distinct("domain").cast("bigint").alias("n_domains"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
        .orderBy("split")
    )


# ---- stream_recrawl_frontier -----------------------------------------------------


@register(
    "stream_recrawl_frontier",
    oracle="""
    SELECT * FROM (
      SELECT 'day1-00.cdxj' AS cdx_file, 'new' AS verdict,
             CAST(COUNT(*) AS BIGINT) AS n FROM documents
      UNION ALL
      SELECT 'day1-again.cdxj', 'fresh', CAST(COUNT(*) AS BIGINT)
      FROM documents
      UNION ALL
      SELECT 'day2-00.cdxj', 'due',
             CAST(SUM(CASE WHEN doc_id % 13 = 5 THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM documents
    ) ORDER BY cdx_file
    """,
    doc="TTL recrawl frontier gate (streaming/crawl."
    "stream_recrawl_frontier, ttl=1 day): CDXJ index shards land in "
    "two waves — day-1 captures, then day-2 re-captures PLUS a "
    "re-delivered copy of the day-1 file — and every capture is "
    "classified against per-SURT last-capture-day state: day-1 lines "
    "are 'new', the re-delivered same-day copy is entirely 'fresh' "
    "(inside the TTL — no wasted refetch), and the %13 day-2 "
    "re-captures are 'due' (TTL elapsed — refetch). The third "
    "frontier variant: exact first-seen bounds CORRECTNESS, the Bloom "
    "variant bounds STATE, this bounds REFETCH RATE. The line parse "
    "is the batch cdx source's own (shared parse_cdx_lines with a "
    "passthrough column). Per-file verdict counts replay closed-form; "
    "a re-delivered file leaking refetches, day arithmetic done on "
    "raw ints instead of real dates, or state not advancing on 'due' "
    "all shift a count. Plan: per-batch cost = newly landed index "
    "bytes; state one int per SURT.",
    tags=("streaming", "web", "source"),
)
def stream_recrawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    import gzip as _gzip
    import shutil
    import tempfile

    from roapi_spark.functions.pipeline14 import _cdx_fixture_dir
    from roapi_spark.streaming.crawl import (
        stream_recrawl_frontier as _stream,
        stream_state_partitions,
    )

    src = _cdx_fixture_dir(spark, sf_dir)
    day1, day2 = [], []
    for name in sorted(os.listdir(src)):
        if not name.startswith("index-"):
            continue
        path = os.path.join(src, name)
        opener = _gzip.open if name.endswith(".gz") else open
        with opener(path, "rt", encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                (day2 if " 20260102000000 " in line else day1).append(line)
    landing = tempfile.mkdtemp(prefix="recrawl_frontier_landing_")
    acc: dict[tuple[str, str], int] = {}

    def process(classified: DataFrame, batch_id: int) -> None:
        for r in (
            classified.groupBy("cdx_file", "verdict")
            .agg(F.count("*").cast("bigint").alias("n"))
            .collect()  # bounded: files x 3 verdicts per batch
        ):
            k = (r["cdx_file"], r["verdict"])
            acc[k] = acc.get(k, 0) + r["n"]

    def land(name: str, lines: list[str]) -> None:
        with open(os.path.join(landing, name), "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")

    try:
        land("day1-00.cdxj", day1)
        with stream_state_partitions(spark):
            q = _stream(
                spark,
                landing,
                process,
                os.path.join(landing, "_ckpt"),
                ttl_days=1,
                query_name="stream_recrawl_frontier",
            )
            try:
                q.processAllAvailable()
                land("day2-00.cdxj", day2)
                land("day1-again.cdxj", day1)  # re-delivery: all inside TTL
                q.processAllAvailable()
            finally:
                q.stop()
    finally:
        shutil.rmtree(landing, ignore_errors=True)
    return spark.createDataFrame(
        sorted((f, v, n) for (f, v), n in acc.items()),
        "cdx_file string, verdict string, n bigint",
    )
