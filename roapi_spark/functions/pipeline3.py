"""Training-data pipeline operators, batch 3: benchmark decontamination,
TF-IDF keyterm extraction, and deterministic source-mixture resampling.

These extend the engine's LLM-pipeline surface (the reference engine has
no equivalents; each cites the public method it implements — GPT-3 /
PaLM appendix-style n-gram decontamination, classic TF-IDF, and
temperature-style source reweighting done deterministically).

Scale notes (100 TB):
- decontamination: the benchmark gram set is bounded by the *benchmark*
  suite size (MBs, fixed), never the corpus, so it is the one join side
  that is always legitimately broadcastable; the corpus side is a
  map-side gram explode + broadcast semi-join + one shuffle keyed by
  doc_id. This is exactly how frontier-lab decontamination runs: corpus
  sharded, benchmark grams shipped to every worker.
- TF-IDF: two classic shuffles (doc_id+term for TF, term for DF); the
  DF (vocabulary) table is zipf-bounded, far smaller than the corpus,
  and re-joins to TF on the term key. The corpus count is a 1-row
  aggregate cross-joined in (BroadcastNestedLoopJoin of one row).
- mixture sampling: per-source counts are dimension-sized; the rate
  re-join onto documents is a broadcast; the keep decision is a pure
  map-side md5-bucket compare — no RNG state, reproducible on any
  cluster layout, same idiom as q_stratified_sample.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from roapi_spark.functions.dedup import shingle_array_of, tokens_col
from roapi_spark.plans.registry import register
from roapi_spark.plans.util import maybe_broadcast
from roapi_spark.util import pround

# DuckDB-side token list mirroring tokens_col() (lowercase [a-z]+ runs)
_TOKS_DUCK = (
    "list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> length(x) > 0)"
)

GRAM_N = 3  # contamination gram width (word 3-grams; corpus docs are short)
CONTAM_MIN_OVERLAP = 2  # >= 2 shared grams => contaminated
BENCH_MOD = 97  # doc_id % 97 == 0 plays the role of the benchmark suite


def docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


_GRAMS_DUCK = (
    "list_distinct(list_transform(generate_series(1, len(w) - 2), "
    "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))"
)


@register(
    "text_contamination",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_DUCK} AS w FROM documents
    ), gram_arrays AS (
      SELECT doc_id,
             CASE WHEN len(w) >= {GRAM_N} THEN {_GRAMS_DUCK}
                  ELSE [] END AS gs
      FROM toks
    ), grams AS (
      SELECT doc_id, unnest(gs) AS g FROM gram_arrays
    ), bench AS (
      SELECT DISTINCT g FROM grams WHERE doc_id % {BENCH_MOD} = 0
    ), overlap AS (
      SELECT gr.doc_id, COUNT(*) AS n_overlap
      FROM grams gr JOIN bench b USING (g)
      WHERE gr.doc_id % {BENCH_MOD} <> 0
      GROUP BY gr.doc_id
    )
    SELECT ga.doc_id,
           CAST(len(ga.gs) AS BIGINT) AS n_grams,
           CAST(COALESCE(o.n_overlap, 0) AS BIGINT) AS n_overlap,
           COALESCE(o.n_overlap, 0) >= {CONTAM_MIN_OVERLAP} AS contaminated
    FROM gram_arrays ga LEFT JOIN overlap o ON ga.doc_id = o.doc_id
    WHERE ga.doc_id % {BENCH_MOD} <> 0
    """,
    doc="Benchmark decontamination (GPT-3 appendix C / PaLM-style): flag "
    "corpus documents sharing >= 2 distinct word 3-grams with a held-out "
    "benchmark set (here: doc_id % 97 == 0). The benchmark gram set is "
    "bounded by the benchmark suite, so it broadcasts; the corpus side "
    "is map-side gram explode + broadcast join + one doc_id shuffle.",
    tags=("text", "dedup", "pipeline"),
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    # coalesce NULL text's gram array to [] so n_grams=0 matches the
    # oracle's CASE ... ELSE [] branch (ADVICE r2 #2; NULL would propagate)
    base = docs(spark, sf_dir).select(
        "doc_id",
        F.coalesce(
            shingle_array_of(tokens_col(), GRAM_N), F.array().cast("array<string>")
        ).alias("gs"),
    )
    # One tokenize pass over the corpus side (round 14; was three: grams,
    # bench and the n_grams re-join each re-ran tokenize+shingle over the
    # full scan). explode_outer keeps gram-less docs as a NULL-gram row,
    # so a single left broadcast join + one aggregate yields BOTH counts:
    # count(g) is len(gs) (NULL for empty docs counts 0) and count(hit)
    # is the distinct-gram overlap (bench grams are distinct, so each
    # corpus gram matches at most once — identical to the inner-join
    # count). The bench side still tokenizes only its 1/97 slice (the
    # doc_id residue filter pushes below the shingle projection).
    bench = (
        base.filter(F.col("doc_id") % BENCH_MOD == 0)
        .select(F.explode("gs").alias("g"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    marked = (
        base.filter(F.col("doc_id") % BENCH_MOD != 0)
        .select("doc_id", F.explode_outer("gs").alias("g"))
        .join(maybe_broadcast(bench), "g", "left")
    )
    agg = marked.groupBy("doc_id").agg(
        F.count("g").alias("n_grams"),
        F.count("hit").alias("n_overlap"),
    )
    return agg.select(
        "doc_id",
        F.col("n_grams").cast("bigint").alias("n_grams"),
        F.col("n_overlap").cast("bigint").alias("n_overlap"),
        (F.col("n_overlap") >= CONTAM_MIN_OVERLAP).alias("contaminated"),
    )


@register(
    "text_tfidf_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS_DUCK}) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), n AS (
      SELECT COUNT(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term,
             CAST(tf.tf AS BIGINT) AS tf,
             CAST(dfreq.df AS BIGINT) AS df,
             FLOOR(tf.tf * LN((n.n_docs + 1.0) / (dfreq.df + 1.0)) * 10000
                   + 0.5) / 10000.0 AS score
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term ASC) AS rank
      FROM scored
    )
    SELECT doc_id, term, tf, df, score, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 3
    """,
    doc="Per-document top-3 TF-IDF keyterms: TF shuffle on (doc_id, term), "
    "DF shuffle on term (vocabulary-sized output), corpus count as a "
    "1-row cross join, per-doc ranking window. The canonical two-stage "
    "term-weighting plan; DF output is zipf-bounded so the re-join is "
    "cheap at any corpus size.",
    tags=("text", "pipeline"),
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = docs(spark, sf_dir).select(
        "doc_id", F.explode(tokens_col()).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs(spark, sf_dir).agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(maybe_broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))  # 1 row — always broadcastable
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            pround(
                F.col("tf")
                * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 3)
    )


@register(
    "q_source_mixture",
    oracle="""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ), rates AS (
      SELECT source, n_docs,
             CAST(LEAST(10000,
                  FLOOR(4.0 * SQRT(n_docs) / n_docs * 10000)) AS BIGINT)
               AS rate_bp
      FROM counts
    ), kept AS (
      SELECT d.source, COUNT(*) AS n_sampled
      FROM documents d JOIN rates r ON d.source = r.source
      WHERE ('0x' || SUBSTR(MD5(d.doc_id::VARCHAR), 1, 8))::BIGINT % 10000
            < r.rate_bp
      GROUP BY d.source
    )
    SELECT r.source,
           CAST(r.n_docs AS BIGINT) AS n_docs,
           r.rate_bp,
           CAST(COALESCE(k.n_sampled, 0) AS BIGINT) AS n_sampled
    FROM rates r LEFT JOIN kept k ON r.source = k.source
    """,
    doc="Deterministic source-mixture resampling (sqrt-temperature "
    "reweighting a la multilingual corpus balancing): per-source keep "
    "rate = min(1, 4*sqrt(n)/n), applied by md5-bucket compare — no RNG, "
    "reproducible on any partitioning. Counts/rates are dimension-sized "
    "and broadcast back onto the corpus; the keep decision is map-side.",
    tags=("text", "sampling", "pipeline"),
)
def q_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir)
    rates = (
        d.groupBy("source")
        .agg(F.count("*").alias("n_docs"))
        .select(
            "source",
            "n_docs",
            F.least(
                F.lit(10000),
                F.floor(F.lit(4.0) * F.sqrt("n_docs") / F.col("n_docs") * 10000),
            )
            .cast("bigint")
            .alias("rate_bp"),
        )
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "bigint"
        )
        % 10000
    )
    kept = (
        d.join(maybe_broadcast(rates), "source")
        .filter(bucket < F.col("rate_bp"))
        .groupBy("source")
        .agg(F.count("*").alias("n_sampled"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            "rate_bp",
            F.coalesce("n_sampled", F.lit(0)).cast("bigint").alias("n_sampled"),
        )
    )
