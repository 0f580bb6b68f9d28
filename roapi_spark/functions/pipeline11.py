"""Training-pipeline batch 11 (round 7): second-order curation audits —
queries about the *outputs* of the batch-10 selection/rewrite operators.

Reference scope: roapi serves tables as-is (`columnq/src/table/mod.rs`);
these extend the engine with the checks a data team runs before
shipping a curated corpus:

- ``q_rewrite_impact`` — per-source token loss from the exact-substring
  span rewrite: WHERE the boilerplate lives. A source with a high
  removal rate is a template-heavy shard that needs upstream cleaning,
  not more dedup.
- ``q_shard_mixture`` — per-shard source diversity (distinct sources +
  source entropy): the IID audit of the shard planner. The md5
  ordering exists precisely so every shard is a mixture, not a run of
  one source; this query measures it.
- ``q_dup_quality_bias`` — document statistics split by near-dup
  membership: ARE duplicated documents different (shorter, more
  repetitive) from unique ones? The empirical check behind the common
  claim that dedup preferentially removes low-quality text.

Scale shape at 100 TB: q_rewrite_impact rides the cached spancov
covered-position artifact (the served rewrite path) plus one
source-keyed agg;
q_shard_mixture reuses the distributed prefix sum (no single-partition
window) plus shard-keyed aggs; q_dup_quality_bias reads the cached
lshpairs-v4 edge artifact and left-joins the dimension-sized dup-doc id
set onto one corpus scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from roapi_spark.functions.pipeline10 import (
    _SPAN_CTE,
    _TOKS_DUCK,
    SHARD_BUDGET,
    dedup_span_rewrite_served,
    docs,
    shard_assign,
)
from roapi_spark.plans.registry import register
from roapi_spark.util import pround, pround_sql


@register(
    "q_rewrite_impact",
    oracle=f"""
    WITH {_SPAN_CTE},
    per AS (
      SELECT t.doc_id, LEN(t.w) AS nt, COALESCE(r.n_kept, 0) AS nk
      FROM toks t LEFT JOIN reb r USING (doc_id)
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(per.nt) AS BIGINT) AS tokens_before,
           CAST(SUM(per.nt - per.nk) AS BIGINT) AS tokens_removed,
           {pround_sql('SUM(per.nt - per.nk) * 1.0 / GREATEST(SUM(per.nt), 1)')}
             AS removal_rate
    FROM per JOIN documents d USING (doc_id)
    GROUP BY d.source ORDER BY d.source
    """,
    doc="Per-source token loss from the exact-substring span rewrite: "
    "which shards carry the boilerplate. Plan: rides the cached "
    "spancov covered-position artifact (the dedup_span_rewrite_served "
    "path — no per-call gram tally), then one join to source labels "
    "and a source-keyed agg (20 rows).",
    tags=("dedup", "text", "pipeline"),
)
def q_rewrite_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    rw = dedup_span_rewrite_served(spark, sf_dir)
    return (
        rw.join(docs(spark, sf_dir).select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("tokens_before"),
            F.sum(F.col("n_tokens") - F.col("n_kept"))
            .cast("bigint")
            .alias("tokens_removed"),
            pround(
                F.sum(F.col("n_tokens") - F.col("n_kept"))
                * 1.0
                / F.greatest(F.sum("n_tokens"), F.lit(1))
            ).alias("removal_rate"),
        )
        .orderBy("source")
    )


@register(
    "q_shard_mixture",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, MD5(doc_id::VARCHAR) AS h,
             LEN({_TOKS_DUCK}) AS ntok
      FROM documents
    ), c AS (
      SELECT doc_id, source,
             SUM(ntok) OVER (ORDER BY h, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) - ntok AS cb
      FROM d
    ), s AS (
      SELECT source, CAST(FLOOR(cb / {SHARD_BUDGET}.0) AS BIGINT) AS shard
      FROM c
    ), per AS (
      SELECT shard, source, COUNT(*) AS c FROM s GROUP BY shard, source
    ), tot AS (
      SELECT shard, SUM(c) AS n FROM per GROUP BY shard
    )
    SELECT per.shard,
           CAST(MAX(tot.n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_sources,
           {pround_sql(
               '-SUM((per.c * 1.0 / tot.n) * LN(per.c * 1.0 / tot.n))'
           )} AS source_entropy
    FROM per JOIN tot USING (shard)
    GROUP BY per.shard ORDER BY per.shard
    """,
    doc="Per-shard source diversity (distinct sources + source entropy "
    "in nats): the IID audit of q_token_budget_shards — the md5 doc "
    "ordering exists so every shard is a source MIXTURE, and this "
    "measures it. Plan: the same distributed prefix sum (bucketed "
    "windows + broadcast offsets, no single-partition window), then "
    "shard x source and shard aggs — both dimension-sized.",
    tags=("text", "sampling", "pipeline"),
)
def q_shard_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = (
        shard_assign(spark, sf_dir)
        .groupBy("shard", "source")
        .agg(F.count("*").alias("c"))
    )
    tot = per.groupBy("shard").agg(F.sum("c").alias("n"))
    p = F.col("c") * F.lit(1.0) / F.col("n")
    return (
        per.join(tot, "shard")
        .groupBy("shard")
        .agg(
            F.max("n").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_sources"),
            pround(-F.sum(p * F.log(p))).alias("source_entropy"),
        )
        .orderBy("shard")
    )


def _dup_quality_oracle() -> str:
    from roapi_spark.functions.dedup import lsh_cand_oracle_cte

    return f"""
    WITH {lsh_cand_oracle_cte()},
    dupdocs AS (
      SELECT doc_a AS doc_id FROM cand
      UNION
      SELECT doc_b AS doc_id FROM cand
    ),
    tk AS (SELECT doc_id, {_TOKS_DUCK} AS w FROM documents),
    m AS (
      SELECT t.doc_id, LEN(t.w) AS nt, LEN(LIST_DISTINCT(t.w)) AS nd,
             (dd.doc_id IS NOT NULL) AS is_dup
      FROM tk t LEFT JOIN dupdocs dd USING (doc_id)
    )
    SELECT is_dup,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           {pround_sql('AVG(nt)')} AS avg_tokens,
           {pround_sql('AVG(nd * 1.0 / GREATEST(nt, 1))')} AS avg_ttr
    FROM m GROUP BY is_dup ORDER BY is_dup
    """


@register(
    "q_dup_quality_bias",
    oracle=_dup_quality_oracle(),
    doc="Document statistics split by near-dup membership: are docs in "
    "an LSH candidate pair shorter / more repetitive (lower type-token "
    "ratio) than unique docs — the empirical check behind 'dedup "
    "preferentially removes low-quality text'. Plan: reads the cached "
    "lshpairs-v4 edge artifact, distincts the dimension-sized dup-doc "
    "id set, left-joins it onto one corpus scan (AQE broadcasts the id "
    "set), two output rows.",
    tags=("dedup", "text", "pipeline"),
)
def q_dup_quality_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.dedup import lsh_pairs_cached
    from roapi_spark.functions.text import tokens_col

    pairs = lsh_pairs_cached(spark, sf_dir)
    dup_docs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    m = (
        docs(spark, sf_dir)
        .select("doc_id", tokens_col().alias("w"))
        .select(
            "doc_id",
            F.size("w").alias("nt"),
            F.size(F.array_distinct("w")).alias("nd"),
        )
        .join(dup_docs, "doc_id", "left")
        .select(
            F.coalesce("hit", F.lit(False)).alias("is_dup"), "nt", "nd"
        )
    )
    return (
        m.groupBy("is_dup")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            pround(F.avg("nt")).alias("avg_tokens"),
            pround(
                F.avg(F.col("nd") * 1.0 / F.greatest(F.col("nt"), F.lit(1)))
            ).alias("avg_ttr"),
        )
        .orderBy("is_dup")
    )


def _curation_funnel_oracle() -> str:
    from roapi_spark.functions.dedup import _COMPONENTS_DUCK
    from roapi_spark.functions.dedup import _TOKS_DUCK as _DEDUP_TOKS
    from roapi_spark.functions.pipeline9 import _FUNNEL_DUCK
    from roapi_spark.functions.pipeline10 import _SPAN_CTE

    # _COMPONENTS_DUCK's chain already defines `toks`: drop _SPAN_CTE's
    # duplicate entry so the two chains compose under one WITH — but
    # ONLY if the two tokenizers are still byte-identical (a retuned
    # pipeline10 tokenizer must fail loudly here, not silently validate
    # the span stages against dedup's old one)
    first, rest = _SPAN_CTE.split("\n", 1)
    expected = f"toks AS (SELECT doc_id, {_DEDUP_TOKS} AS w FROM documents),"
    if first.strip() != expected:
        raise ValueError(
            "pipeline10._SPAN_CTE's toks entry no longer matches dedup's "
            "tokenizer — the curation-funnel oracle can't drop it"
        )
    return f"""
    WITH RECURSIVE {_COMPONENTS_DUCK},
    {_FUNNEL_DUCK},
    {rest},
    per AS (
      SELECT t.doc_id, LEN(t.w) AS nt, COALESCE(r.n_kept, 0) AS nk
      FROM toks t JOIN surv USING (doc_id)
      LEFT JOIN reb r ON r.doc_id = t.doc_id
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM keep_ex) AS n_after_exact,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM surv) AS n_after_near,
           CAST(SUM(nt) AS BIGINT) AS tokens_total,
           CAST(SUM(nk) AS BIGINT) AS tokens_shipped,
           {pround_sql('SUM(nk) * 1.0 / GREATEST(SUM(nt), 1)')}
             AS pct_tokens_kept
    FROM per
    """


@register(
    "q_curation_funnel",
    oracle=_curation_funnel_oracle(),
    doc="The full curation funnel in one row: docs -> exact-unique -> "
    "near-dup survivors (q_dedup_funnel's doc stages) extended to the "
    "TOKEN axis — of the surviving docs' tokens, how many survive the "
    "exact-substring span rewrite. Doc-level dedup keeps one twin per "
    "cluster; this row also shows the boilerplate INSIDE the kept docs. "
    "Serve shape: exact stage is a 16-byte-digest shuffle, near stage "
    "reads the cached component labels, token stage reads the cached "
    "spancov covered-position artifact — no text shuffles, no pair or "
    "gram recompute anywhere.",
    tags=("dedup", "quality", "pipeline"),
)
def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.pipeline9 import funnel_survivors

    d, keep_ex, surv = funnel_survivors(spark, sf_dir)
    per = dedup_span_rewrite_served(spark, sf_dir).join(surv, "doc_id")
    tok = per.agg(
        F.sum("n_tokens").cast("bigint").alias("tokens_total"),
        F.sum("n_kept").cast("bigint").alias("tokens_shipped"),
    )
    n_docs = d.agg(F.count("*").cast("bigint").alias("n_docs"))
    n_ex = keep_ex.agg(F.count("*").cast("bigint").alias("n_after_exact"))
    n_surv = surv.agg(F.count("*").cast("bigint").alias("n_after_near"))
    return (
        n_docs.crossJoin(F.broadcast(n_ex))
        .crossJoin(F.broadcast(n_surv))
        .crossJoin(F.broadcast(tok))
        .select(
            "n_docs",
            "n_after_exact",
            "n_after_near",
            "tokens_total",
            "tokens_shipped",
            pround(
                F.col("tokens_shipped")
                * F.lit(1.0)
                / F.greatest(F.col("tokens_total"), F.lit(1))
            ).alias("pct_tokens_kept"),
        )
    )
