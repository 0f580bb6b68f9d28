"""Round-4 training-pipeline operators, part 6: exact-substring span
dedup, temperature-weighted mixture allocation, and tokenizer-fertility
audit. Reference parity note: roapi has no training-pipeline surface
(columnq/src/table/mod.rs covers load/query only); these extend the
engine per the builder brief, with full DuckDB oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from roapi_spark.functions.dedup import tokens_col
from roapi_spark.plans.registry import register
from roapi_spark.util import pround, serve_persist

_TOKS_DUCK = (
    "list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> length(x) > 0)"
)


def docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


# -- exact-substring span dedup ---------------------------------------------

SPAN_K = 8  # token-gram width (Lee et al. use 50 tokens; short test docs)


def _positional_grams(w) -> F.Column:
    """Every K-token gram WITH multiplicity (no array_distinct — the
    whole point is catching text that repeats, including within one
    document). Same arrays_zip-of-slices shape as shingle_array_of:
    ``w`` is referenced O(K) times per row, never per element."""
    ln = F.greatest(F.size(w) - (SPAN_K - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(w, k + 1, ln) for k in range(SPAN_K)])
    return F.transform(
        z, lambda s: F.concat_ws(" ", *[s[str(k)] for k in range(SPAN_K)])
    )


@register(
    "dedup_substring_spans",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS_DUCK} AS w FROM documents),
    g AS (
      SELECT doc_id, unnest(list_transform(
               generate_series(1, len(w) - {SPAN_K - 1}),
               i -> array_to_string(w[i:i + {SPAN_K - 1}], ' '))) AS gram
      FROM toks
    ),
    dg AS (SELECT gram, doc_id, COUNT(*) AS cnt FROM g GROUP BY 1, 2),
    tot AS (SELECT gram, SUM(cnt) AS c FROM dg GROUP BY 1),
    nd AS (
      SELECT dg.doc_id, SUM(dg.cnt) AS n_dup
      FROM dg JOIN tot USING (gram) WHERE tot.c > 1 GROUP BY 1
    ),
    pd AS (SELECT doc_id, SUM(cnt) AS n_grams FROM dg GROUP BY 1)
    SELECT pd.doc_id,
           CAST(pd.n_grams AS BIGINT) AS n_grams,
           CAST(COALESCE(nd.n_dup, 0) AS BIGINT) AS n_dup_grams,
           FLOOR(COALESCE(nd.n_dup, 0) / CAST(pd.n_grams AS DOUBLE)
                 * 10000 + 0.5) / 10000.0 AS dup_fraction
    FROM pd LEFT JOIN nd USING (doc_id)
    """,
    doc=f"Exact-substring span dedup (the suffix-array method of Lee et "
    f"al. 2022, re-expressed relationally): every positional {SPAN_K}-token "
    "gram — WITH multiplicity, so boilerplate repeated inside one document "
    "counts — is tallied corpus-wide; a doc's dup_fraction is the share of "
    "its gram starts whose exact text occurs more than once anywhere. "
    "Plan: the explosion is hash-partitioned on gram ONCE; the (gram, "
    "doc) tally, the gram-total rollup, and their join all run on that "
    "one partitioning (HashPartitioning(gram) satisfies the (gram, doc) "
    "clustering — verified: 7 exchanges vs 8 letting each agg shuffle "
    "itself, and positional grams are mostly unique so pre-shuffle "
    "combining buys little). At real scale the shuffle key becomes "
    "md5(gram) (16 bytes, not the text) and K rises to 50; semantics "
    "unchanged.",
    tags=("dedup", "text"),
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = (
        docs(spark, sf_dir)
        .select("doc_id", tokens_col().alias("w"))
        .filter(F.size("w") >= SPAN_K)
        .select("doc_id", F.explode(_positional_grams(F.col("w"))).alias("gram"))
        .repartition("gram")
    )
    dg = g.groupBy("gram", "doc_id").agg(F.count("*").alias("cnt"))
    tot = dg.groupBy("gram").agg(F.sum("cnt").alias("c"))
    nd = (
        dg.join(tot, "gram")
        .filter(F.col("c") > 1)
        .groupBy("doc_id")
        .agg(F.sum("cnt").alias("n_dup"))
    )
    pd = dg.groupBy("doc_id").agg(F.sum("cnt").alias("n_grams"))
    return pd.join(nd, "doc_id", "left").select(
        "doc_id",
        F.col("n_grams").cast("bigint").alias("n_grams"),
        F.coalesce("n_dup", F.lit(0)).cast("bigint").alias("n_dup_grams"),
        pround(
            F.coalesce("n_dup", F.lit(0)) / F.col("n_grams").cast("double")
        ).alias("dup_fraction"),
    )


# -- temperature-weighted mixture allocation --------------------------------

MIX_BUDGET_X = 2.0  # token budget = 2x the corpus (some sources epoch >1)
MIX_WSCALE = 1000  # integer-exact weights: floor(sqrt(n_tokens)*1000)


@register(
    "q_mixture_allocation",
    oracle=f"""
    WITH t AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len({_TOKS_DUCK})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT *, CAST(FLOOR(SQRT(n_tokens) * {MIX_WSCALE}) AS BIGINT) AS wq
      FROM t
    ),
    s AS (SELECT CAST(SUM(wq) AS BIGINT) AS tot_w,
                 CAST(SUM(n_tokens) AS BIGINT) AS tot_n FROM w)
    SELECT w.source, CAST(w.n_docs AS BIGINT) AS n_docs, w.n_tokens,
           FLOOR(w.wq / CAST(s.tot_w AS DOUBLE) * 10000 + 0.5) / 10000.0
             AS weight,
           CAST(FLOOR({MIX_BUDGET_X} * s.tot_n
                      * (w.wq / CAST(s.tot_w AS DOUBLE))) AS BIGINT)
             AS alloc_tokens,
           CASE WHEN w.n_tokens > 0
                THEN FLOOR({MIX_BUDGET_X} * s.tot_n
                           * (w.wq / CAST(s.tot_w AS DOUBLE))
                           / w.n_tokens * 10000 + 0.5) / 10000.0
                ELSE 0.0 END AS epochs
    FROM w CROSS JOIN s
    """,
    doc="Sampling-mixture allocation: per-source sqrt-temperature weights "
    "(the multilingual/data-mixing standard — upweights small sources) "
    "over a fixed token budget, yielding per-source token allocations and "
    "epoch counts, the table a pretraining data plan is built from. "
    "Weights are integer-quantized (floor(sqrt*1000)) so their sum is "
    "order-independent and the oracle is exact. One tiny per-source agg, "
    "a 1-row broadcast total, map-side arithmetic.",
    tags=("pipeline", "audit"),
)
def q_mixture_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = (
        docs(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.size(tokens_col())).cast("bigint").alias("n_tokens"),
        )
        .withColumn(
            "wq",
            F.floor(F.sqrt(F.col("n_tokens")) * MIX_WSCALE).cast("bigint"),
        )
    )
    s = t.agg(
        F.sum("wq").cast("bigint").alias("tot_w"),
        F.sum("n_tokens").cast("bigint").alias("tot_n"),
    )
    share = F.col("wq") / F.col("tot_w").cast("double")
    alloc = F.lit(MIX_BUDGET_X) * F.col("tot_n") * share
    return t.crossJoin(F.broadcast(s)).select(
        "source",
        "n_docs",
        "n_tokens",
        pround(share).alias("weight"),
        F.floor(alloc).cast("bigint").alias("alloc_tokens"),
        F.when(F.col("n_tokens") > 0, pround(alloc / F.col("n_tokens")))
        .otherwise(0.0)
        .alias("epochs"),
    )


# -- tokenizer fertility by language ----------------------------------------


@register(
    "q_token_fertility",
    oracle=f"""
    WITH t AS (
      SELECT lang, LENGTH(text) AS n_bytes, len({_TOKS_DUCK}) AS n_toks
      FROM documents
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
           CASE WHEN SUM(n_toks) > 0
                THEN FLOOR(SUM(n_bytes) / CAST(SUM(n_toks) AS DOUBLE)
                           * 10000 + 0.5) / 10000.0
                ELSE 0.0 END AS bytes_per_token,
           FLOOR(SUM(n_toks) / CAST(COUNT(*) AS DOUBLE) * 10000 + 0.5)
             / 10000.0 AS tokens_per_doc
    FROM t GROUP BY lang
    """,
    doc="Tokenizer-fertility audit: bytes/token and tokens/doc per "
    "language tag — the compression-rate table that decides vocabulary "
    "allocation and flags languages a tokenizer serves badly. Integer "
    "sums with map-side combine; ratios pround-ed once at the end (exact "
    "cross-engine).",
    tags=("text", "audit"),
)
def q_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = docs(spark, sf_dir).select(
        "lang",
        F.length("text").alias("n_bytes"),
        F.size(tokens_col()).alias("n_toks"),
    )
    return t.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("n_tokens"),
        F.when(
            F.sum("n_toks") > 0,
            pround(F.sum("n_bytes") / F.sum("n_toks").cast("double")),
        )
        .otherwise(0.0)
        .alias("bytes_per_token"),
        pround(F.sum("n_toks") / F.count("*").cast("double")).alias(
            "tokens_per_doc"
        ),
    )


# -- linear quality-classifier head -----------------------------------------

# Hand-set weights standing in for a trained fastText/CCNet-style quality
# classifier (no training libs in this container); the plumbing — map-side
# feature extraction, linear scoring, threshold filter — is the production
# shape. The score stays in logit space (no exp(): libm exp is not
# bit-specified across engines; every feature below is exact IEEE
# division of integers, so the oracle matches bit-for-bit).
QL_W_BIAS = -2.0
QL_W_STOP = 6.0      # stopword ratio: natural prose has plenty
QL_W_ALPHA = 1.5     # alphabetic-character ratio
QL_W_TOKLEN = 0.12   # mean token length
QL_W_NTOK = -0.002   # very long docs get a mild penalty

_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


@register(
    "text_quality_logit",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             LENGTH(text) AS n_chars,
             LENGTH(REGEXP_REPLACE(LOWER(text), '[^a-z]', '', 'g')) AS n_alpha,
             {_TOKS_DUCK} AS w
      FROM documents
    ),
    feat AS (
      SELECT doc_id,
             CAST(LEN(w) AS BIGINT) AS n_tokens,
             CASE WHEN LEN(w) > 0
                  THEN LEN(LIST_FILTER(w, x -> LIST_CONTAINS(
                       {list(_STOPWORDS)}, x))) / CAST(LEN(w) AS DOUBLE)
                  ELSE 0.0 END AS stop_ratio,
             CASE WHEN n_chars > 0
                  THEN n_alpha / CAST(n_chars AS DOUBLE) ELSE 0.0 END
               AS alpha_ratio,
             CASE WHEN LEN(w) > 0
                  THEN LEN(ARRAY_TO_STRING(w, '')) / CAST(LEN(w) AS DOUBLE)
                  ELSE 0.0 END AS mean_tok_len
      FROM f
    )
    SELECT doc_id, n_tokens,
           FLOOR(stop_ratio * 10000 + 0.5) / 10000.0 AS stop_ratio,
           FLOOR(alpha_ratio * 10000 + 0.5) / 10000.0 AS alpha_ratio,
           FLOOR(({QL_W_BIAS} + {QL_W_STOP} * stop_ratio
                  + {QL_W_ALPHA} * alpha_ratio
                  + {QL_W_TOKLEN} * mean_tok_len
                  + {QL_W_NTOK} * n_tokens) * 10000 + 0.5) / 10000.0
             AS quality_logit,
           ({QL_W_BIAS} + {QL_W_STOP} * stop_ratio
            + {QL_W_ALPHA} * alpha_ratio
            + {QL_W_TOKLEN} * mean_tok_len
            + {QL_W_NTOK} * n_tokens) >= 0.0 AS keep
    FROM feat
    """,
    doc="Classifier-based quality filtering (the CCNet/fastText stage of "
    "a pretraining pipeline, with a hand-set linear head): map-side "
    "feature extraction (stopword ratio, alphabetic ratio, mean token "
    "length, token count) -> linear logit -> keep threshold. Zero "
    "shuffle — pure scan-stage expressions; swapping in trained weights "
    "is a literal change. Logit-space score keeps the oracle exact "
    "(libm exp is not bit-specified cross-engine).",
    tags=("text", "quality", "pipeline"),
)
def text_quality_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir).select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.length(F.regexp_replace(F.lower("text"), "[^a-z]", "")).alias("n_alpha"),
        tokens_col().alias("w"),
    )
    stop_lit = F.lit(list(_STOPWORDS)).cast("array<string>")
    feat = d.select(
        "doc_id",
        F.size("w").cast("bigint").alias("n_tokens"),
        F.when(
            F.size("w") > 0,
            F.size(F.filter("w", lambda x: F.array_contains(stop_lit, x)))
            / F.size("w").cast("double"),
        )
        .otherwise(0.0)
        .alias("stop_ratio"),
        F.when(
            F.col("n_chars") > 0,
            F.col("n_alpha") / F.col("n_chars").cast("double"),
        )
        .otherwise(0.0)
        .alias("alpha_ratio"),
        F.when(
            F.size("w") > 0,
            F.length(F.concat_ws("", F.col("w"))) / F.size("w").cast("double"),
        )
        .otherwise(0.0)
        .alias("mean_tok_len"),
    )
    logit = (
        F.lit(QL_W_BIAS)
        + F.lit(QL_W_STOP) * F.col("stop_ratio")
        + F.lit(QL_W_ALPHA) * F.col("alpha_ratio")
        + F.lit(QL_W_TOKLEN) * F.col("mean_tok_len")
        + F.lit(QL_W_NTOK) * F.col("n_tokens")
    )
    return feat.select(
        "doc_id",
        "n_tokens",
        pround(F.col("stop_ratio")).alias("stop_ratio"),
        pround(F.col("alpha_ratio")).alias("alpha_ratio"),
        pround(logit).alias("quality_logit"),
        (logit >= 0.0).alias("keep"),
    )


# -- dedup method agreement audit -------------------------------------------


def _method_agreement_oracle() -> str:
    from roapi_spark.functions.dedup import _PAIRS_DUCK, STOP_SHINGLE_DF

    return f"""
    WITH {_PAIRS_DUCK.strip().lstrip("WITH").strip()},
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    live AS (
      SELECT s.doc_id, s.shingle
      FROM sh s JOIN (SELECT shingle FROM sh GROUP BY shingle
                      HAVING COUNT(*) <= {STOP_SHINGLE_DF}) f
        ON s.shingle = f.shingle
    ),
    jpairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM live a JOIN live b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jacc AS (
      SELECT p.doc_a, p.doc_b
      FROM jpairs p
        JOIN cnt ca ON p.doc_a = ca.doc_id
        JOIN cnt cb ON p.doc_b = cb.doc_id
      WHERE CAST(p.n_common AS DOUBLE) / (ca.n + cb.n - p.n_common) >= 0.1
    ),
    uni AS (
      SELECT COALESCE(l.doc_a, j.doc_a) AS doc_a,
             COALESCE(l.doc_b, j.doc_b) AS doc_b,
             l.doc_a IS NOT NULL AS in_lsh,
             j.doc_a IS NOT NULL AS in_jaccard
      FROM pairs l FULL OUTER JOIN jacc j
        ON l.doc_a = j.doc_a AND l.doc_b = j.doc_b
    )
    SELECT CASE WHEN in_lsh AND in_jaccard THEN 'both'
                WHEN in_lsh THEN 'lsh_only'
                ELSE 'jaccard_only' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM uni GROUP BY 1
    """


@register(
    "q_dedup_method_agreement",
    oracle=_method_agreement_oracle(),
    doc="Dedup method-agreement audit: the Venn counts of candidate "
    "near-dup pairs found by MinHash-LSH banding vs thresholded exact "
    "shingle Jaccard (>= 0.1) — the recall/precision dial for picking "
    "band geometry and thresholds. 'jaccard_only' pairs are LSH misses "
    "(recall loss); 'lsh_only' pairs are band collisions below the "
    "Jaccard bar (verification cost). Both pair sets serve from their "
    "snapshot artifacts; the audit itself is one full-outer join of two "
    "small edge sets.",
    tags=("dedup", "audit"),
)
def q_dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.dedup import (
        dedup_ngram_jaccard,
        lsh_pairs_cached,
    )

    lsh = lsh_pairs_cached(spark, sf_dir).select("doc_a", "doc_b")
    jac = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    uni = lsh.withColumn("in_lsh", F.lit(True)).join(
        jac.withColumn("in_jaccard", F.lit(True)),
        ["doc_a", "doc_b"],
        "full_outer",
    )
    bucket = (
        F.when(
            F.col("in_lsh").isNotNull() & F.col("in_jaccard").isNotNull(), "both"
        )
        .when(F.col("in_lsh").isNotNull(), "lsh_only")
        .otherwise("jaccard_only")
    )
    return uni.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_pairs")
    )


# -- Heaps'-law vocabulary growth -------------------------------------------


@register(
    "q_heaps_law",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS_DUCK}) AS token FROM documents
    ),
    per_doc AS (
      SELECT doc_id, COUNT(*) AS n_toks FROM toks GROUP BY doc_id
    ),
    firsts AS (  -- each distinct token charged to its first document
      SELECT MIN(doc_id) AS doc_id, 1 AS one FROM toks GROUP BY token
    ),
    new_vocab AS (
      SELECT doc_id, COUNT(*) AS n_new FROM firsts GROUP BY doc_id
    ),
    curve AS (
      SELECT p.doc_id,
             SUM(p.n_toks) OVER w AS cum_tokens,
             SUM(COALESCE(v.n_new, 0)) OVER w AS cum_vocab
      FROM per_doc p LEFT JOIN new_vocab v USING (doc_id)
      WINDOW w AS (ORDER BY p.doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    pts AS (SELECT LN(cum_tokens) AS lx, LN(cum_vocab) AS ly FROM curve)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           FLOOR(REGR_SLOPE(ly, lx) * 10000 + 0.5) / 10000.0 AS heaps_beta,
           FLOOR(REGR_R2(ly, lx) * 10000 + 0.5) / 10000.0 AS r2
    FROM pts
    """,
    doc="Heaps'-law audit (companion to q_zipf_slope): vocabulary size vs "
    "cumulative token count in doc_id order, slope of the log-log curve "
    "(natural text sits near beta ~ 0.4-0.6; a templated or synthetic "
    "corpus flattens early). The heavy work is two combiner-friendly "
    "aggregations over the token explosion (per-doc totals + first-seen "
    "ownership — the same no-window shape as q_ngram_novelty). The "
    "running sums use NO single-partition global window: doc_id is "
    "bucketed into 256 order-preserving equal-width ranges, the "
    "cumulative sums run per-bucket (Window.partitionBy), and a "
    "driver-side exclusive scan over the <=256 bucket totals is "
    "broadcast back as offsets — the q_token_budget_shards pattern "
    "(pipeline10.shard_assign), exact integer math end to end.",
    tags=("text", "audit"),
)
def q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    toks = docs(spark, sf_dir).select(
        "doc_id", F.explode(tokens_col()).alias("token")
    )
    per_doc = toks.groupBy("doc_id").agg(F.count("*").alias("n_toks"))
    new_vocab = (
        toks.groupBy("token")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_new"))
    )
    joined = per_doc.join(new_vocab, "doc_id", "left").select(
        "doc_id",
        "n_toks",
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    # barrier FIRST: three consumers follow (doc_id bounds, bucket
    # totals, the final windowed plan) — without it the token explosion
    # + two aggregations would run once PER consumer. One row per doc,
    # so the checkpoint is corpus-doc sized, not token sized (the
    # dedup.py:minhash pattern); bounds + totals then read the
    # materialized blocks.
    joined = joined.localCheckpoint(eager=False)
    # Distributed prefix sum: equal-width integer ranges over the doc_id
    # domain are order-preserving (doc_id asc == (bkt, doc_id) asc), so
    # per-bucket cumulative windows plus exclusive bucket offsets
    # reproduce the global running sums without a single-partition sort.
    bounds = joined.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).first()
    lo = bounds["lo"] if bounds["lo"] is not None else 0
    hi = bounds["hi"] if bounds["hi"] is not None else 0
    n_bkt = 256
    span = max(hi - lo + 1, 1)
    joined = joined.withColumn(
        "bkt",
        F.least(
            F.lit(n_bkt - 1),
            F.floor((F.col("doc_id") - F.lit(lo)) * n_bkt / F.lit(span)),
        ).cast("int"),
    )
    totals = sorted(
        (r["bkt"], r["bt"], r["bv"])
        for r in joined.groupBy("bkt")
        .agg(F.sum("n_toks").alias("bt"), F.sum("n_new").alias("bv"))
        .collect()
    )  # <=256 rows of driver state — exact integer exclusive scan
    offsets, acc_t, acc_v = [], 0, 0
    for bkt, bt, bv in totals:
        offsets.append((bkt, acc_t, acc_v))
        acc_t += bt
        acc_v += bv
    off = spark.createDataFrame(offsets, "bkt int, t_off long, v_off long")
    w = (
        Window.partitionBy("bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = joined.join(F.broadcast(off), "bkt").select(
        (F.col("t_off") + F.sum("n_toks").over(w)).alias("cum_tokens"),
        (F.col("v_off") + F.sum("n_new").over(w)).alias("cum_vocab"),
    )
    pts = curve.select(
        F.log("cum_tokens").alias("lx"), F.log("cum_vocab").alias("ly")
    )
    return pts.agg(
        F.count("*").cast("bigint").alias("n_points"),
        pround(F.regr_slope("ly", "lx")).alias("heaps_beta"),
        pround(F.regr_r2("ly", "lx")).alias("r2"),
    )


# -- packing efficiency audit -----------------------------------------------


def _packing_oracle() -> str:
    from roapi_spark.functions.pipeline import PACK_TOKENS, _WORDS_DUCK

    p = PACK_TOKENS
    return f"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(LEN({_WORDS_DUCK}) AS BIGINT) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT doc_id, source, n_tokens,
             COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM toks
    ), agg AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             CAST(FLOOR((SUM(n_tokens) + {p} - 1) / {p}) AS BIGINT) AS n_packs,
             CAST(SUM(CASE WHEN (cum_before % {p}) + n_tokens > {p}
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers
      FROM packed GROUP BY source
    )
    SELECT source, n_docs, n_tokens, n_packs, n_straddlers,
           FLOOR(n_straddlers / CAST(n_docs AS DOUBLE) * 10000 + 0.5)
             / 10000.0 AS straddle_frac,
           CASE WHEN n_packs > 0
                THEN FLOOR((n_tokens - (n_packs - 1) * {p})
                           / CAST({p} AS DOUBLE) * 10000 + 0.5) / 10000.0
                ELSE 0.0 END AS last_pack_fill
    FROM agg
    """


@register(
    "q_packing_efficiency",
    oracle=_packing_oracle(),
    doc="Packing-efficiency audit over text_seq_pack's concat-and-chunk "
    "layout: per source shard — pack count, document-straddle fraction "
    "(docs split across a pack boundary, the cost GPT-style packing "
    "pays vs doc-aware bin packing), and the final pack's fill rate "
    "(every other pack is exactly full by construction). Same per-shard "
    "running-sum window as the pack op; the audit itself is one tiny "
    "per-source aggregate, all integer-exact.",
    tags=("text", "pipeline", "audit"),
)
def q_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from roapi_spark.functions.pipeline import PACK_TOKENS, words_col

    p = PACK_TOKENS
    toks = docs(spark, sf_dir).select(
        "doc_id", "source", F.size(words_col()).cast("bigint").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = toks.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    agg = packed.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.floor((F.sum("n_tokens") + p - 1) / p).cast("bigint").alias("n_packs"),
        F.sum(
            F.when((F.col("cum_before") % p) + F.col("n_tokens") > p, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_straddlers"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_tokens",
        "n_packs",
        "n_straddlers",
        pround(F.col("n_straddlers") / F.col("n_docs").cast("double")).alias(
            "straddle_frac"
        ),
        F.when(
            F.col("n_packs") > 0,
            pround(
                (F.col("n_tokens") - (F.col("n_packs") - 1) * p)
                / F.lit(float(p))
            ),
        )
        .otherwise(0.0)
        .alias("last_pack_fill"),
    )


# -- ANN recall audit --------------------------------------------------------


def _recall_oracle(query_name: str) -> str:
    """Compose any registered approximate-search query's oracle with the
    exact brute-force oracle as nested CTEs (DuckDB allows a WITH inside
    a CTE body) into ONE recall@TOP_K audit — the single source of the
    overlap/rounding recipe for every per-family recall query. Imports
    the registering modules directly (their @register calls populate
    QUERIES) instead of load_all(), which would re-enter the registry's
    import chain mid-import."""
    import roapi_spark.functions.pq  # noqa: F401
    import roapi_spark.functions.similarity  # noqa: F401
    from roapi_spark.functions.similarity import TOP_K
    from roapi_spark.plans.registry import QUERIES

    approx = QUERIES[query_name].oracle
    exact = QUERIES["knn_bruteforce"].oracle
    return f"""
    WITH approx AS ({approx}), exact AS ({exact}),
    ov AS (
      SELECT i.qid, COUNT(*) AS hits
      FROM approx i JOIN exact e ON e.qid = i.qid AND e.neighbor_id = i.neighbor_id
      GROUP BY i.qid
    ),
    q AS (SELECT DISTINCT qid FROM exact)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           FLOOR(AVG(COALESCE(ov.hits, 0) / {float(TOP_K)}) * 10000 + 0.5) / 10000.0
             AS recall_at_5
    FROM q LEFT JOIN ov USING (qid)
    """


def _ann_recall_pair(spark, sf_dir, ann_df):
    from roapi_spark.functions.similarity import TOP_K, knn_bruteforce

    # the exact top-5 feeds BOTH the overlap join and the query-set
    # distinct: persist the (N_QUERIES x TOP_K)-row result so the
    # brute-force self-join runs once per recall audit, not twice
    # (guide §5; fixes all six q_*_recall gates)
    exact = serve_persist(
        knn_bruteforce(spark, sf_dir).select("qid", "neighbor_id")
    )
    ov = (
        ann_df.select("qid", "neighbor_id")
        .join(exact, ["qid", "neighbor_id"])
        .groupBy("qid")
        .agg(F.count("*").alias("hits"))
    )
    q = exact.select("qid").distinct()
    return q.join(ov, "qid", "left").agg(
        F.count("*").cast("bigint").alias("n_queries"),
        pround(
            F.avg(F.coalesce("hits", F.lit(0)) / F.lit(float(TOP_K)))
        ).alias("recall_at_5"),
    )


@register(
    "q_ann_recall",
    oracle=_recall_oracle("ann_ivf_kmeans"),
    doc="ANN recall audit: recall@5 of the IVF-k-means search against "
    "the exact brute-force top-5 — THE number an ANN deployment tunes "
    "nprobe/list-count by. Composes the two registered operators (IVF "
    "serves from its partition-pruned layout; brute force scans once); "
    "the overlap join and average touch N_QUERIES rows.",
    tags=("similarity", "audit"),
)
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.similarity import ann_ivf_kmeans

    return _ann_recall_pair(spark, sf_dir, ann_ivf_kmeans(spark, sf_dir))




@register(
    "q_ann_recall_nprobe",
    oracle=_recall_oracle("ann_ivf_nprobe"),
    doc="Recall@5 of the multi-probe IVF variant — paired with "
    "q_ann_recall (single probe) this is the nprobe dial measured: more "
    "probed lists, higher recall, more rows scanned (the ivf_probed_rows "
    "figure in docs/SCALE.md).",
    tags=("similarity", "audit"),
)
def q_ann_recall_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.similarity import ann_ivf_nprobe

    return _ann_recall_pair(spark, sf_dir, ann_ivf_nprobe(spark, sf_dir))




@register(
    "q_lsh_recall",
    oracle=_recall_oracle("ann_lsh"),
    doc="Recall@5 of the hyperplane-LSH search against the exact "
    "brute-force top-5 — the quality axis for the hashing index family, "
    "completing the per-family audit trio (IVF: q_ann_recall/_nprobe; "
    "LSH: here; PQ: q_pq_recall). A single 8-bit signature family trades "
    "recall for a 1/2^8 expected bucket scan; this query is the measured "
    "price. Same N_QUERIES-bounded overlap join as the IVF audits.",
    tags=("similarity", "audit"),
)
def q_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.similarity import ann_lsh

    return _ann_recall_pair(spark, sf_dir, ann_lsh(spark, sf_dir))




@register(
    "q_pq_recall",
    oracle=_recall_oracle("ann_pq_adc"),
    doc="Recall@5 of the product-quantized ADC search against the exact "
    "brute-force top-5 — the measured quantization loss of the ~256x "
    "code compression (the number that justifies, or indicts, M and K "
    "for a corpus). Same N_QUERIES-bounded overlap join as the other "
    "recall audits.",
    tags=("similarity", "audit"),
)
def q_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.pq import ann_pq_adc

    return _ann_recall_pair(spark, sf_dir, ann_pq_adc(spark, sf_dir))




@register(
    "q_pq_rerank_recall",
    oracle=_recall_oracle("ann_ivfpq_rerank"),
    doc="Recall@5 of IVF-PQ WITH exact re-ranking — the after picture to "
    "q_pq_recall's raw ADC number: the refine stage re-scores a "
    "constant-size shortlist with exact distances, recovering the "
    "accuracy the code compression threw away at O(C) extra work per "
    "query. Paired with q_pq_recall this is the measured value of the "
    "refine knob. Same N_QUERIES-bounded overlap join.",
    tags=("similarity", "audit"),
)
def q_pq_rerank_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.pq import ann_ivfpq_rerank

    return _ann_recall_pair(spark, sf_dir, ann_ivfpq_rerank(spark, sf_dir))




@register(
    "q_lsh_multi_recall",
    oracle=_recall_oracle("ann_lsh_multi"),
    doc="Recall@5 of the multi-table LSH search — the after picture to "
    "q_lsh_recall's single-table 0.00: L independent tables give each "
    "true neighbor L collision chances (1-(1-p^k)^L), the measured value "
    "of the L-tables knob. Same N_QUERIES-bounded overlap join.",
    tags=("similarity", "audit"),
)
def q_lsh_multi_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.similarity import ann_lsh_multi

    return _ann_recall_pair(spark, sf_dir, ann_lsh_multi(spark, sf_dir))
