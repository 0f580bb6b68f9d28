"""Training-data pipeline operators, batch 4 (round 4): behavioral
funnel/cohort analytics over the event stream and corpus-curation
operators (near-dup representative selection, embedding-dimension
audit, token-length census).

Reference scope note: the reference (roapi) serves arbitrary SQL over
registered tables (columnq/src/query/sql.rs); these queries extend the
*analytics library* shipped on top of the same engine, each with a
DuckDB oracle so the driver's correctness gate covers them.

Scale notes (100 TB):
- q_event_funnel is ONE shuffle on user_id: the per-user event list is
  folded JVM-side (array_sort + aggregate over unix-micros longs), so
  the sequential signup->click->purchase logic never re-joins the event
  table per stage. The final stage counts are a 3-row agg.
- q_retention_cohort reuses the user_id shuffle for first-touch, then
  aggregates (cohort_week, offset) — output is weeks x offsets rows.
- dedup_keep_best joins the (tiny) component labels to documents and
  picks one representative per component with a per-component window —
  partitioned by component id, never a global sort.
- q_embedding_dim_stats shuffles only (dim, partial moments): posexplode
  is map-side, the agg output is `dim` rows.
- q_token_len_histogram buckets by the bit-length of the token count
  (integer-exact in both engines — no float log2 at bucket boundaries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from roapi_spark.functions.dedup import dedup_components, _PAIRS_DUCK
from roapi_spark.functions.pipeline import docs
from roapi_spark.plans.analytics import events_t
from roapi_spark.plans.registry import register
from roapi_spark.util import pround

FUNNEL = ("signup", "click", "purchase")


def _funnel_stage_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, st{t1,t2,t3}) — per-user stage timestamps (epoch micros,
    null = stage not reached) from the single-shuffle timeline fold."""
    ev = events_t(spark, sf_dir).filter(F.col("event_type").isin(*FUNNEL))
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.unix_micros("ts").alias("us"), F.col("event_type").alias("et"))
            )
        ).alias("tl")
    )
    # fold the sorted timeline: first signup, first click strictly after
    # it, first purchase strictly after that — accumulator carries the
    # three stage timestamps (null = not reached)
    walked = per_user.select(
        F.aggregate(
            "tl",
            F.struct(
                F.lit(None).cast("bigint").alias("t1"),
                F.lit(None).cast("bigint").alias("t2"),
                F.lit(None).cast("bigint").alias("t3"),
            ),
            lambda acc, e: F.struct(
                F.when(
                    acc.t1.isNull() & (e.et == FUNNEL[0]), e.us
                ).otherwise(acc.t1).alias("t1"),
                F.when(
                    acc.t2.isNull()
                    & acc.t1.isNotNull()
                    & (e.et == FUNNEL[1])
                    & (e.us > acc.t1),
                    e.us,
                ).otherwise(acc.t2).alias("t2"),
                F.when(
                    acc.t3.isNull()
                    & acc.t2.isNotNull()
                    & (e.et == FUNNEL[2])
                    & (e.us > acc.t2),
                    e.us,
                ).otherwise(acc.t3).alias("t3"),
            ),
        ).alias("st")
    )
    return walked


@register(
    "q_event_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ), n AS (
      SELECT 1 AS stage_idx, 'signup' AS stage, COUNT(*) AS n_users FROM s1
      UNION ALL SELECT 2, 'click', COUNT(*) FROM s2
      UNION ALL SELECT 3, 'purchase', COUNT(*) FROM s3
    )
    SELECT CAST(stage_idx AS BIGINT) AS stage_idx, stage,
           CAST(n_users AS BIGINT) AS n_users,
           FLOOR(CAST(n_users AS DOUBLE)
                 / GREATEST(MAX(n_users) OVER (), 1) * 10000 + 0.5)
             / 10000.0 AS conv_pct
    FROM n
    """,
    doc="Ordered funnel (signup -> click after signup -> purchase after "
    "click): per-user event timeline folded in ONE pass — array_sort the "
    "(ts, type) structs per user, then a JVM-side aggregate() walk picks "
    "the first qualifying timestamp per stage. The oracle states the same "
    "semantics as three stage joins. Strictly-after (`>`) ordering at "
    "every stage.",
    tags=("events", "funnel"),
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    walked = _funnel_stage_times(spark, sf_dir)
    counts = walked.agg(
        F.count("st.t1").alias("n1"),
        F.count("st.t2").alias("n2"),
        F.count("st.t3").alias("n3"),
    )
    # max-over-stages computed as greatest(n1, n2, n3) on the 1-row
    # aggregate BEFORE the 3-row explode — no window at all (the oracle's
    # MAX() OVER () states the same value; this removes the last
    # unpartitioned WindowExec from this query's plan).
    stages = counts.select(
        F.explode(
            F.array(
                F.struct(F.lit(1).cast("bigint").alias("stage_idx"),
                         F.lit(FUNNEL[0]).alias("stage"),
                         F.col("n1").alias("n_users")),
                F.struct(F.lit(2).cast("bigint").alias("stage_idx"),
                         F.lit(FUNNEL[1]).alias("stage"),
                         F.col("n2").alias("n_users")),
                F.struct(F.lit(3).cast("bigint").alias("stage_idx"),
                         F.lit(FUNNEL[2]).alias("stage"),
                         F.col("n3").alias("n_users")),
            )
        ).alias("s"),
        F.greatest("n1", "n2", "n3").alias("max_users"),
    ).select("s.*", "max_users")
    return stages.select(
        "stage_idx",
        "stage",
        "n_users",
        pround(
            F.col("n_users").cast("double")
            / F.greatest(F.col("max_users"), F.lit(1))
        ).alias("conv_pct"),
    )


@register(
    "q_retention_cohort",
    oracle="""
    WITH first_touch AS (
      SELECT user_id, CAST(DATE_TRUNC('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, CAST(DATE_TRUNC('week', ts) AS DATE) AS w
      FROM events
    ), hits AS (
      SELECT f.cohort_week,
             CAST((a.w - f.cohort_week) / 7 AS BIGINT) AS week_offset,
             a.user_id
      FROM activity a JOIN first_touch f ON a.user_id = f.user_id
    ), agg AS (
      SELECT cohort_week, week_offset, COUNT(DISTINCT user_id) AS n_active
      FROM hits GROUP BY 1, 2
    )
    SELECT cohort_week, week_offset,
           CAST(n_active AS BIGINT) AS n_active,
           FLOOR(CAST(n_active AS DOUBLE)
                 / MAX(CASE WHEN week_offset = 0 THEN n_active END)
                     OVER (PARTITION BY cohort_week) * 10000 + 0.5)
             / 10000.0 AS retention_pct
    FROM agg
    """,
    doc="Weekly retention cohorts: users bucketed by ISO week of first "
    "event; n_active = distinct users from that cohort active k weeks "
    "later; retention_pct normalized to the cohort's week-0 size. Both "
    "engines truncate weeks to ISO Monday. The user_id shuffle is shared "
    "by first-touch and activity; the final agg is |weeks| x |offsets| "
    "rows.",
    tags=("events", "cohort"),
)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_t(spark, sf_dir)
    first_touch = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("w")
    ).distinct()
    agg = (
        activity.join(first_touch, "user_id")
        .select(
            "cohort_week",
            (F.datediff("w", "cohort_week") / 7).cast("bigint").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    wk0 = W.partitionBy("cohort_week")
    return agg.select(
        "cohort_week",
        "week_offset",
        "n_active",
        pround(
            F.col("n_active").cast("double")
            / F.max(
                F.when(F.col("week_offset") == 0, F.col("n_active"))
            ).over(wk0)
        ).alias("retention_pct"),
    )


@register(
    "dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE {_PAIRS_DUCK.strip().lstrip("WITH").strip()},
    e AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(n, m) AS (
      SELECT a, a FROM e
      UNION
      SELECT r.n, e.b FROM reach r JOIN e ON r.m = e.a
    ),
    comp AS (
      SELECT n AS doc_id, MIN(m) AS component FROM reach GROUP BY n
    ),
    ranked AS (
      SELECT c.component, c.doc_id, d.n_chars,
             ROW_NUMBER() OVER (PARTITION BY c.component
                                ORDER BY d.n_chars DESC, c.doc_id ASC) AS rnk
      FROM comp c JOIN documents d ON c.doc_id = d.doc_id
    )
    SELECT CAST(component AS BIGINT) AS component,
           CAST(MAX(CASE WHEN rnk = 1 THEN doc_id END) AS BIGINT) AS keep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM ranked GROUP BY component
    """,
    doc="Near-dup representative selection: over the LSH-pair connected "
    "components, keep the longest document per duplicate cluster "
    "(n_chars desc, doc_id asc tie-break) — the curation step after "
    "clustering, where 'best' beats dedup_apply's 'lowest id'. The "
    "component labels come from the snapshot-cached pair graph, so this "
    "never rescans the corpus; the window partitions by component id.",
    tags=("dedup",),
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    comp = dedup_components(spark, sf_dir)
    d = docs(spark, sf_dir).select("doc_id", "n_chars")
    w = W.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        comp.join(d, "doc_id")
        .withColumn("rnk", F.row_number().over(w))
        .groupBy("component")
        .agg(
            F.max(F.when(F.col("rnk") == 1, F.col("doc_id"))).alias("keep_doc_id"),
            F.count("*").alias("n_members"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
    )


@register(
    "q_embedding_dim_stats",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    stats AS (
      SELECT i - 1 AS dim,
             FLOOR(AVG(v[i]) * 10000 + 0.5) / 10000.0 AS mean,
             FLOOR(VAR_POP(v[i]) * 10000 + 0.5) / 10000.0 AS variance
      FROM e, GENERATE_SERIES(1, 64) AS g(i)
      GROUP BY i
    )
    SELECT CAST(dim AS BIGINT) AS dim, mean, variance
    FROM stats ORDER BY variance DESC, dim ASC LIMIT 8
    """,
    doc="Embedding-dimension audit for collapsed/dead dimensions: "
    "per-dimension mean and population variance (posexplode is map-side; "
    "the shuffle carries `dim` partial moments, output is dim rows), "
    "top-8 highest-variance dimensions. The check a curation pipeline "
    "runs before trusting cosine distances.",
    tags=("similarity", "quality"),
)
def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    return (
        e.select(F.posexplode("v").alias("dim", "x"))
        .groupBy("dim")
        .agg(
            pround(F.avg("x")).alias("mean"),
            pround(F.var_pop("x")).alias("variance"),
        )
        .orderBy(F.col("variance").desc(), F.col("dim").asc())
        .limit(8)
        .select(F.col("dim").cast("bigint").alias("dim"), "mean", "variance")
    )


@register(
    "q_token_len_histogram",
    oracle="""
    WITH toks AS (
      SELECT source,
             LEN(COALESCE(list_filter(string_split_regex(lower(text),
                 '[^a-z]+'), x -> length(x) > 0), [])) AS n_tok
      FROM documents
    )
    SELECT source,
           CAST(LENGTH(BIN(n_tok + 1)) - 1 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens
    FROM toks GROUP BY 1, 2
    """,
    doc="Token-length census per source: documents bucketed by "
    "floor(log2(n_tokens+1)) computed as bit-length (LENGTH(BIN(n+1))-1) "
    "— integer-exact in both engines, immune to float-log2 boundary "
    "rounding. Map-side tokenize + tiny (source x bucket) agg; the "
    "length histogram drives sequence-packing and truncation budgets.",
    tags=("text", "pipeline"),
)
def q_token_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.text import tokens_col

    d = docs(spark, sf_dir).select(
        "source", F.size(F.coalesce(tokens_col(), F.array())).alias("n_tok")
    )
    return (
        d.withColumn(
            "bucket", (F.length(F.bin(F.col("n_tok") + 1)) - 1).cast("bigint")
        )
        .groupBy("source", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
        )
    )


@register(
    "dedup_minhash_calibration",
    oracle="""
    WITH toks AS (SELECT doc_id,
        list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> length(x) > 0) AS w
      FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM toks, UNNEST(GENERATE_SERIES(1, GREATEST(LEN(w) - 2, 0))) AS t(i)
    ),
    hs AS (
      SELECT doc_id, ('0x' || SUBSTR(MD5(shingle), 1, 8))::BIGINT AS h FROM sh
    ),
    minh AS (
      SELECT doc_id, k, MIN((2 * k + 3) * h % 4294967311) AS mh
      FROM hs, UNNEST(GENERATE_SERIES(0, 11)) AS t(k)
      GROUP BY doc_id, k
    ),
    bands AS (
      SELECT doc_id, k // 3 AS band_id,
             STRING_AGG(mh::VARCHAR, ',' ORDER BY k) AS band_sig
      FROM minh GROUP BY doc_id, k // 3
    ),
    bandsf AS (
      SELECT b.* FROM bands b
      JOIN (SELECT band_id, band_sig FROM bands
            GROUP BY band_id, band_sig HAVING COUNT(*) <= 100) ok
        ON b.band_id = ok.band_id AND b.band_sig = ok.band_sig
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bandsf a JOIN bandsf b
        ON a.band_id = b.band_id AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    ),
    matches AS (
      SELECT p.doc_a, p.doc_b,
             SUM(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) AS m
      FROM pairs p
        JOIN minh ma ON ma.doc_id = p.doc_a
        JOIN minh mb ON mb.doc_id = p.doc_b AND ma.k = mb.k
      GROUP BY 1, 2
    ),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT p.doc_a, p.doc_b, COUNT(*) AS nc
      FROM pairs p
        JOIN sh sa ON sa.doc_id = p.doc_a
        JOIN sh sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT m.m AS n_matches,
             FLOOR(COALESCE(CAST(c.nc AS DOUBLE)
                   / (ca.n + cb.n - c.nc), 0.0) * 10000 + 0.5) / 10000.0 AS tj,
             FLOOR(ABS(m.m / 12.0 - COALESCE(CAST(c.nc AS DOUBLE)
                   / (ca.n + cb.n - c.nc), 0.0)) * 10000 + 0.5) / 10000.0 AS err
      FROM matches m
        LEFT JOIN common c ON m.doc_a = c.doc_a AND m.doc_b = c.doc_b
        JOIN cnt ca ON m.doc_a = ca.doc_id
        JOIN cnt cb ON m.doc_b = cb.doc_id
    )
    SELECT CAST(n_matches AS BIGINT) AS n_matches,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           FLOOR(AVG(tj) * 10000 + 0.5) / 10000.0 AS mean_true_jaccard,
           FLOOR(AVG(err) * 10000 + 0.5) / 10000.0 AS mean_abs_err
    FROM scored GROUP BY n_matches
    """,
    doc="MinHash estimator calibration audit: for every (capped) LSH "
    "candidate pair, the signature-match count (0..12) vs the TRUE "
    "shingle Jaccard, aggregated per match count — the dial a dedup "
    "pipeline reads to pick its est_jaccard threshold. Serves from the "
    "snapshot-cached pair graph; true Jaccard joins the (small) pair set "
    "against the shingle explosion on doc id, never all-pairs. Per-pair "
    "terms are pround-ed before averaging so the group means are "
    "cross-engine stable.",
    tags=("dedup", "audit"),
)
def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.dedup import (
        N_MINHASH,
        docs as ddocs,
        lsh_pairs_cached,
        shingles,
    )

    pairs = lsh_pairs_cached(spark, sf_dir)
    # The artifact's est_jaccard is pround(m / N_MINHASH); with match
    # granularity 1/12 >> the 1e-4 rounding, m is exactly recoverable —
    # no re-run of the full-corpus signature pass.
    matches = pairs.select(
        "doc_a",
        "doc_b",
        F.floor(F.col("est_jaccard") * N_MINHASH + F.lit(0.5))
        .cast("int")
        .alias("m"),
    )
    # True Jaccard only needs shingles of docs that appear in the pair
    # graph — a broadcast semi-join prunes the corpus scan to that
    # (small) doc set before the explosion, instead of shuffling the
    # full shingle table twice.
    part_docs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # the filtered explosion is referenced three times (cnt, both join
    # sides); checkpoint it once — it is pair-graph-sized, tiny at any
    # corpus scale
    sh = shingles(
        ddocs(spark, sf_dir).join(F.broadcast(part_docs), "doc_id", "semi")
    ).localCheckpoint(eager=False)
    cnt = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        pairs.join(sa, "doc_a").join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("nc"))
    )
    tj_raw = F.coalesce(
        F.col("nc").cast("double") / (F.col("ca.n") + F.col("cb.n") - F.col("nc")),
        F.lit(0.0),
    )
    scored = (
        matches.join(common, ["doc_a", "doc_b"], "left")
        .join(cnt.alias("ca"), F.col("doc_a") == F.col("ca.doc_id"))
        .join(cnt.alias("cb"), F.col("doc_b") == F.col("cb.doc_id"))
        .select(
            F.col("m").alias("n_matches"),
            pround(tj_raw).alias("tj"),
            pround(F.abs(F.col("m") / F.lit(float(N_MINHASH)) - tj_raw)).alias("err"),
        )
    )
    return scored.groupBy(F.col("n_matches").cast("bigint").alias("n_matches")).agg(
        F.count("*").alias("n_pairs"),
        pround(F.avg("tj")).alias("mean_true_jaccard"),
        pround(F.avg("err")).alias("mean_abs_err"),
    )


@register(
    "q_dup_cluster_sizes",
    oracle=f"""
    WITH RECURSIVE {_PAIRS_DUCK.strip().lstrip("WITH").strip()},
    e2 AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(n, m) AS (
      SELECT a, a FROM e2
      UNION
      SELECT r.n, e2.b FROM reach r JOIN e2 ON r.m = e2.a
    ),
    comp AS (SELECT n AS doc_id, MIN(m) AS component FROM reach GROUP BY n),
    sizes AS (SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY component)
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(cluster_size) AS BIGINT) AS n_docs
    FROM sizes GROUP BY cluster_size
    """,
    doc="Duplicate-cluster size distribution: component sizes over the "
    "LSH pair graph bucketed into (cluster_size, n_clusters, n_docs) — "
    "the histogram every dedup report leads with (how much of the corpus "
    "sits in 2-clusters vs mega-clusters). Reads the snapshot-cached "
    "component labels; two tiny aggs.",
    tags=("dedup", "audit"),
)
def q_dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    comp = dedup_components(spark, sf_dir)
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count("*").alias("n_clusters"),
        F.sum("cluster_size").cast("bigint").alias("n_docs"),
    )


ZIPF_TOP = 200


@register(
    "q_zipf_slope",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                x -> length(x) > 0)) AS token
      FROM documents
    ), counted AS (
      SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token
    ), ranked AS (
      SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS rnk
      FROM counted
    ), top AS (
      SELECT LN(rnk) AS lx, LN(cnt) AS ly FROM ranked WHERE rnk <= {ZIPF_TOP}
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens,
           FLOOR(REGR_SLOPE(ly, lx) * 10000 + 0.5) / 10000.0 AS zipf_slope,
           FLOOR(REGR_R2(ly, lx) * 10000 + 0.5) / 10000.0 AS r2
    FROM top
    """,
    doc=f"Zipf's-law audit: least-squares slope of ln(freq) vs ln(rank) "
    f"over the top-{ZIPF_TOP} vocabulary (natural text sits near -1; a "
    "corpus of boilerplate or synthetic spam drifts off) plus the fit's "
    "R². The rank table is the same TakeOrderedAndProject top-k as "
    "text_vocab_topk — the Zipf tail never funnels through one "
    "partition; the regression is a single tiny agg.",
    tags=("text", "audit"),
)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = docs(spark, sf_dir)
    toks = d.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z]+"),
                lambda x: F.length(x) > 0,
            )
        ).alias("token")
    )
    counted = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    top = counted.orderBy(F.desc("cnt"), F.asc("token")).limit(ZIPF_TOP)
    # the ranking frame is <= ZIPF_TOP rows by the limit above; the
    # pmod(cnt, 1) partition key (constant 0, non-foldable) makes that
    # bound explicit in the plan — TakeOrderedAndProject's single
    # partition already satisfies the clustering, so no extra Exchange
    # and no unpartitioned-WindowExec warning
    ranked = top.select(
        F.row_number()
        .over(
            Window.partitionBy(F.pmod(F.col("cnt"), F.lit(1))).orderBy(
                F.desc("cnt"), F.asc("token")
            )
        )
        .alias("rnk"),
        "cnt",
    )
    pts = ranked.select(F.log("rnk").alias("lx"), F.log("cnt").alias("ly"))
    return pts.agg(
        F.count("*").alias("n_tokens"),
        pround(F.regr_slope("ly", "lx")).alias("zipf_slope"),
        pround(F.regr_r2("ly", "lx")).alias("r2"),
    )


@register(
    "text_unigram_logppl",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                x -> length(x) > 0)) AS token
      FROM documents
    ), vocab AS (
      SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token
    ), total AS (SELECT SUM(cnt) AS n FROM vocab),
    scored AS (
      SELECT t.doc_id, -LN(CAST(v.cnt AS DOUBLE) / total.n) AS nlp
      FROM toks t JOIN vocab v ON t.token = v.token CROSS JOIN total
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tok,
           FLOOR(AVG(nlp) * 10000 + 0.5) / 10000.0 AS mean_neg_logp
    FROM scored GROUP BY doc_id
    """,
    doc="Unigram log-perplexity quality filter (the KenLM-style "
    "model-based filter, self-scored): corpus unigram MLE "
    "p(tok)=cnt/total, per-document mean of -ln p — boilerplate built "
    "from ultra-common tokens scores LOW, rare-token noise scores HIGH; "
    "curation cuts both tails. Plan shape: one token-keyed shuffle "
    "builds the model table, the scoring join reuses that key (AQE skew "
    "handles stop-words), then a doc-keyed agg. At 100 TB the model "
    "table is the artifact you persist; the scoring pass is a single "
    "join + agg with no all-pairs anywhere.",
    tags=("text", "quality", "pipeline"),
)
def text_unigram_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.text import tokens_col

    toks = (
        docs(spark, sf_dir)
        .select("doc_id", F.explode(tokens_col()).alias("token"))
    )
    vocab = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n"))
    scored = (
        toks.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            (-F.log(F.col("cnt").cast("double") / F.col("n"))).alias("nlp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tok"),
        pround(F.avg("nlp")).alias("mean_neg_logp"),
    )


@register(
    "q_conversion_latency",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ), lat AS (
      SELECT s3.user_id,
             (EPOCH_US(s3.t3) - EPOCH_US(s1.t1)) / 1000000.0 AS sec
      FROM s3 JOIN s1 ON s3.user_id = s1.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           FLOOR(MIN(sec) * 10000 + 0.5) / 10000.0 AS min_seconds,
           FLOOR(AVG(sec) * 10000 + 0.5) / 10000.0 AS avg_seconds,
           FLOOR(MAX(sec) * 10000 + 0.5) / 10000.0 AS max_seconds
    FROM lat
    """,
    doc="Conversion-latency summary over the completed funnels: per "
    "converting user, seconds from first signup to the qualifying "
    "purchase (the same single-shuffle timeline fold as q_event_funnel, "
    "shared via _funnel_stage_times), aggregated to count/min/avg/max — "
    "the number a growth dashboard puts next to the funnel counts.",
    tags=("events", "funnel"),
)
def q_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    walked = _funnel_stage_times(spark, sf_dir)
    lat = walked.filter(F.col("st.t3").isNotNull()).select(
        ((F.col("st.t3") - F.col("st.t1")) / 1e6).alias("sec")
    )
    return lat.agg(
        F.count("*").alias("n_converted"),
        pround(F.min("sec")).alias("min_seconds"),
        pround(F.avg("sec")).alias("avg_seconds"),
        pround(F.max("sec")).alias("max_seconds"),
    )
