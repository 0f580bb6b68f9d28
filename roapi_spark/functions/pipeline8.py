"""Training-pipeline batch 8 (round 7): statistical language-model
quality signals.

Two standard corpus-curation scorers that need only the corpus itself:

- ``q_ngram_perplexity`` — a bigram LM with Laplace smoothing fit on the
  whole corpus, scoring every document by cross-entropy (bits/bigram).
  This is the KenLM-perplexity filter of CCNet/Gopher-style pipelines
  reduced to its n-gram essence: fluent in-distribution text scores low,
  boilerplate/garbled text scores high. No external model artifact — the
  LM "training" is two count aggregations over the same exploded bigram
  set the scoring pass uses.
- ``q_source_kl`` — KL divergence of each source's unigram distribution
  against the corpus mixture: the drift/mixture diagnostic run before
  reweighting sources (a source with high KL is lexically unlike the
  blend the model will see).

Scale shape at 100 TB: everything is (term)- or (bigram)-keyed aggregation
— the same shuffle family as tf-idf/BM25. The LM count tables are
vocabulary-bounded dimensions joined back on their own grouping key (no
second shuffle of the exploded side under AQE: the bigram explode is
aggregated per (doc, bigram) FIRST, so the join input is the compacted
per-doc postings, not raw token streams). Outputs are per-doc/per-source
rows — no all-pairs, no unbounded collect.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from roapi_spark.plans.registry import register
from roapi_spark.plans.util import maybe_broadcast
from roapi_spark.util import pround

_TOKS_DUCK = (
    "list_filter(string_split_regex(lower(text), '[^a-z]+'), "
    "x -> length(x) > 0)"
)

LAPLACE_K = 1.0  # add-one smoothing: exact, engine-agnostic


def docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _bigrams_over(w: str):
    """array<struct<prev,cur>> of adjacent token pairs over a
    MATERIALIZED token-array column named ``w`` — a plain column
    reference, safe inside lambdas (docs/SCALE.md pitfall #2: a computed
    expression here would re-evaluate the tokenizer split per element)."""
    return F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.struct(
                F.element_at(w, i).alias("prev"),
                F.element_at(w, i + 1).alias("cur"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))


# The ONE Laplace-smoothed bigram scoring contract, shared by the batch
# recompute, the artifact serve (same oracle) and the streaming scorer:
# bits(prev->cur) = -log2((c2 + K) / (c1 + K*V)). The oracle multiplies
# n * (bits) with the SAME association as lm_bits_expr so both engines
# evaluate the identical float expression tree.
_PPL_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS_DUCK}) AS term,
             generate_subscripts({_TOKS_DUCK}, 1) AS pos
      FROM documents
    ), big AS (
      SELECT a.doc_id, a.term AS prev, b.term AS cur
      FROM toks a JOIN toks b
        ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    ), dbig AS (
      SELECT doc_id, prev, cur, COUNT(*) AS n
      FROM big GROUP BY doc_id, prev, cur
    ), bc AS (
      SELECT prev, cur, SUM(n) AS c2 FROM dbig GROUP BY prev, cur
    ), uc AS (
      SELECT prev, SUM(c2) AS c1 FROM bc GROUP BY prev
    ), vocab AS (
      SELECT COUNT(DISTINCT term) AS v FROM toks
    ), scored AS (
      SELECT d.doc_id,
             SUM(d.n) AS n_bigrams,
             SUM(d.n * (-LN((bc.c2 + {LAPLACE_K}) / (uc.c1 + {LAPLACE_K} * vocab.v))
                 / LN(2.0))) / SUM(d.n) AS h
      FROM dbig d
      JOIN bc ON bc.prev = d.prev AND bc.cur = d.cur
      JOIN uc ON uc.prev = d.prev
      CROSS JOIN vocab
      GROUP BY d.doc_id
    )
    SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
           FLOOR(h * 10000 + 0.5) / 10000.0 AS bits_per_bigram
    FROM scored
    ORDER BY bits_per_bigram DESC, doc_id LIMIT 50
    """


def lm_bits_expr(c2, c1, v):
    """-log2 of the Laplace-smoothed bigram probability — the Spark twin
    of _PPL_ORACLE's inner expression. ``c2``/``c1``/``v`` are Columns
    (or literals) so the batch, served and streaming callers share one
    formula; a smoothing change edits exactly here + _PPL_ORACLE."""
    return -F.log(
        (c2 + F.lit(LAPLACE_K)) / (c1 + F.lit(LAPLACE_K) * v)
    ) / F.lit(math.log(2.0))


@register(
    "q_ngram_perplexity",
    oracle=_PPL_ORACLE,
    doc="Bigram-LM cross-entropy per document (bits/bigram, Laplace "
    "smoothing, LM fit on the corpus itself) — the n-gram core of the "
    "CCNet/KenLM perplexity quality filter. Top-50 most-surprising docs. "
    "Plan: one (doc,bigram) explode+agg shuffle; the bigram/unigram count "
    "tables derive from THAT aggregate (vocabulary-bounded) and join back "
    "on their own grouping key; vocab size broadcasts as a 1-row stat.",
    tags=("text", "quality", "pipeline"),
)
def q_ngram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:

    from roapi_spark.functions.text import tokens_col

    dbig = (
        docs(spark, sf_dir)
        .select("doc_id", tokens_col().alias("w"))
        .select("doc_id", F.explode(_bigrams_over("w")).alias("bg"))
        .groupBy("doc_id", "bg.prev", "bg.cur")
        .agg(F.count("*").alias("n"))
        # three consumers (bc/uc derivation and the scored join) would
        # each replay the corpus tokenize+shingle pass — persist the
        # bigram-count rows (vocabulary-bounded per doc) for the
        # query's duration instead (guide §5; lifecycle:
        # util.serve_persist)
        .persist()
    )
    bc = dbig.groupBy("prev", "cur").agg(F.sum("n").alias("c2"))
    uc = bc.groupBy("prev").agg(F.sum("c2").alias("c1"))
    vocab = (
        docs(spark, sf_dir)
        .select(F.explode(tokens_col()).alias("term"))
        .agg(F.count_distinct("term").alias("v"))
    )
    scored = (
        dbig.join(maybe_broadcast(bc), ["prev", "cur"])
        .join(maybe_broadcast(uc), "prev")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("bigint").alias("n_bigrams"),
            (
                F.sum(
                    F.col("n")
                    * lm_bits_expr(F.col("c2"), F.col("c1"), F.col("v"))
                )
                / F.sum("n")
            ).alias("h"),
        )
    )
    out = scored.select(
        "doc_id", "n_bigrams", pround(F.col("h")).alias("bits_per_bigram")
    )
    # orderBy+limit compiles to TakeOrderedAndProject — per-partition
    # partial top-k then a 50-row merge, never a single-partition sort of
    # every doc (a global row_number window would be exactly that)
    return out.orderBy(F.desc("bits_per_bigram"), F.asc("doc_id")).limit(50)


@register(
    "q_source_kl",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest({_TOKS_DUCK}) AS term FROM documents
    ), st AS (
      SELECT source, term, COUNT(*) AS c FROM toks GROUP BY source, term
    ), ct AS (
      SELECT term, SUM(c) AS cc FROM st GROUP BY term
    ), totals AS (
      SELECT SUM(c) AS n FROM st
    ), stot AS (
      SELECT source, SUM(c) AS ns FROM st GROUP BY source
    )
    SELECT st.source,
           CAST(MAX(stot.ns) AS BIGINT) AS n_tokens,
           FLOOR(SUM((st.c * 1.0 / stot.ns)
                     * LN((st.c * 1.0 / stot.ns) / (ct.cc * 1.0 / totals.n)))
                 * 10000 + 0.5) / 10000.0 AS kl_vs_corpus
    FROM st
    JOIN ct USING (term)
    JOIN stot USING (source)
    CROSS JOIN totals
    GROUP BY st.source
    ORDER BY kl_vs_corpus DESC, source
    """,
    doc="Per-source unigram KL divergence against the corpus mixture "
    "(nats) — the drift diagnostic run before source reweighting. Plan: "
    "one (source,term) agg shuffle; corpus term counts derive from that "
    "aggregate and join back term-keyed (vocabulary-bounded); totals "
    "broadcast as 1-row/source-count stats. Output is one row per source.",
    tags=("text", "mixture", "pipeline"),
)
def q_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.text import tokens_col

    st = (
        docs(spark, sf_dir)
        .select("source", F.explode(tokens_col()).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").alias("c"))
    )
    ct = st.groupBy("term").agg(F.sum("c").alias("cc"))
    totals = st.agg(F.sum("c").alias("n"))
    stot = st.groupBy("source").agg(F.sum("c").alias("ns"))
    ps = F.col("c") * F.lit(1.0) / F.col("ns")
    q = F.col("cc") * F.lit(1.0) / F.col("n")
    return (
        st.join(maybe_broadcast(ct), "term")
        .join(maybe_broadcast(stot), "source")
        .crossJoin(F.broadcast(totals))
        .groupBy("source")
        .agg(
            F.max("ns").cast("bigint").alias("n_tokens"),
            pround(F.sum(ps * F.log(ps / q))).alias("kl_vs_corpus"),
        )
        .orderBy(F.desc("kl_vs_corpus"), F.asc("source"))
    )


def _cross_source_oracle() -> str:
    from roapi_spark.functions.dedup import lsh_cand_oracle_cte

    return f"""
    WITH {lsh_cand_oracle_cte()},
    attributed AS (
      SELECT LEAST(da.source, db.source) AS source_a,
             GREATEST(da.source, db.source) AS source_b
      FROM cand c
      JOIN documents da ON da.doc_id = c.doc_a
      JOIN documents db ON db.doc_id = c.doc_b
    )
    SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM attributed GROUP BY source_a, source_b
    ORDER BY n_pairs DESC, source_a, source_b
    """


@register(
    "q_dedup_cross_source_matrix",
    oracle=_cross_source_oracle(),
    doc="Near-duplicate pair counts per (source, source) cell — WHICH "
    "shards copy from each other, the routing signal for source-level "
    "dedup policy (within-source dups get local dedup; heavy cross-source "
    "cells get a shared pass). Serve path reads the cached lshpairs-v4 "
    "edge artifact (the same one dedup_minhash_lsh serves from) and "
    "broadcasts the dimension-sized edge set into two doc_id joins; the "
    "symmetric matrix key is (least, greatest) of the two sources.",
    tags=("dedup", "quality", "pipeline"),
)
def q_dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.dedup import docs as _docs
    from roapi_spark.functions.dedup import lsh_pairs_cached

    pairs = lsh_pairs_cached(spark, sf_dir).select("doc_a", "doc_b")
    src = _docs(spark, sf_dir).select("doc_id", "source")
    # the edge set is the small side at any scale (near-dup pairs ~
    # O(corpus dup-rate)); broadcast it so the doc scans never shuffle
    attributed = (
        maybe_broadcast(pairs)
        .join(src.withColumnRenamed("doc_id", "doc_a")
                 .withColumnRenamed("source", "sa"), "doc_a")
        .join(src.withColumnRenamed("doc_id", "doc_b")
                 .withColumnRenamed("source", "sb"), "doc_b")
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
    )
    return (
        attributed.groupBy("source_a", "source_b")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), F.asc("source_a"), F.asc("source_b"))
    )


def _cluster_sizes_oracle() -> str:
    from roapi_spark.functions.dedup import _COMPONENTS_DUCK

    return f"""
    WITH RECURSIVE {_COMPONENTS_DUCK},
    sizes AS (
      SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY component
    )
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY cluster_size
    ORDER BY cluster_size
    """


@register(
    "q_dedup_cluster_sizes",
    oracle=_cluster_sizes_oracle(),
    doc="Near-dup cluster-size distribution (how many 2-doc pairs vs "
    "100-doc boilerplate families) — the histogram read before choosing "
    "keep-one-per-cluster vs cap-per-cluster policy, and the first place "
    "template explosions show up. Serve path: two tiny aggregations over "
    "the persisted components-v1 label artifact (pair-graph-sized, "
    "orders of magnitude under the corpus).",
    tags=("dedup", "quality", "pipeline"),
)
def q_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.dedup import dedup_components

    comp = dedup_components(spark, sf_dir)
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .select(
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            F.col("n_clusters").cast("bigint").alias("n_clusters"),
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


# -- served bigram LM (tokenize-once artifact) ------------------------------


def bigram_lm_index(spark: SparkSession, sf_dir: str) -> tuple[str, int]:
    """Build-once bigram-LM artifact for ``sf_dir``: the per-doc bigram
    count table (``dbig``) plus the LM count tables derived from it
    (``bc`` bigram totals, ``uc`` context totals) and the vocabulary
    size, snapshot-keyed like the BM25 index.

    At 100 TB "tokenize once, persist the postings" is the pipeline
    norm: the corpus explode+agg (the dominant cost of every LM-scoring
    pass) runs once per snapshot; re-scores — after a smoothing change,
    against a different threshold, in the streaming twin — read the
    compacted (doc, bigram) table, which is orders of magnitude smaller
    than raw text. bc/uc derive from the dbig parquet JUST written, not
    from its lazy lineage (same no-recompute rule as bm25_index).
    Returns (layout dir, vocab size)."""
    import json

    from roapi_spark.functions.snapshot import build_once, snapshot_cache_dir
    from roapi_spark.functions.text import tokens_col

    src = os.path.join(sf_dir, "documents.parquet")
    out = snapshot_cache_dir(src, "bigramlm-v1")

    def _ready(d: str) -> bool:
        return os.path.exists(os.path.join(d, "_LM_READY"))

    def _build(tmp: str) -> None:
        # ONE tokenize pass: the regex split (the dominant per-doc cost)
        # runs once into a materialized token-array table; both the
        # bigram aggregation and the vocab count (distinct UNIGRAMS —
        # single-token docs count, so bigram members alone are not
        # enough) derive from it. The checkpoint holds token ARRAYS
        # (≈ corpus text size) only for the duration of the build.
        wdocs = (
            docs(spark, sf_dir)
            .select("doc_id", tokens_col().alias("w"))
            .localCheckpoint(eager=False)
        )
        dbig = (
            wdocs.select("doc_id", F.explode(_bigrams_over("w")).alias("bg"))
            .groupBy("doc_id", "bg.prev", "bg.cur")
            .agg(F.count("*").alias("n"))
        )
        dbig.write.mode("overwrite").parquet(os.path.join(tmp, "dbig"))
        d2 = spark.read.parquet(os.path.join(tmp, "dbig"))
        bc = d2.groupBy("prev", "cur").agg(F.sum("n").alias("c2"))
        bc.write.mode("overwrite").parquet(os.path.join(tmp, "bc"))
        spark.read.parquet(os.path.join(tmp, "bc")).groupBy("prev").agg(
            F.sum("c2").alias("c1")
        ).write.mode("overwrite").parquet(os.path.join(tmp, "uc"))
        v = (
            wdocs.select(F.explode("w").alias("term"))
            .agg(F.count_distinct("term").alias("v"))
            .collect()[0][0]
        )
        with open(os.path.join(tmp, "_stats.json"), "w") as f:
            json.dump({"v": int(v)}, f)
        with open(os.path.join(tmp, "_LM_READY"), "w") as f:
            f.write("ok")

    build_once(out, _ready, _build)
    with open(os.path.join(out, "_stats.json")) as f:
        v = int(json.load(f)["v"])
    return out, v


@register(
    "q_ngram_perplexity_served",
    oracle=_PPL_ORACLE,
    doc="q_ngram_perplexity answered from the build-once bigramlm-v1 "
    "artifact instead of re-exploding raw text: the scoring pass reads "
    "the persisted per-doc bigram counts and joins the persisted LM "
    "count tables back on their own grouping keys (vocabulary-bounded, "
    "size-capped broadcast); the vocab size is a literal from the "
    "artifact stats. Same oracle, identical results — the pair "
    "(recompute vs served) mirrors q_bm25_topk / q_bm25_topk_served.",
    tags=("text", "quality", "pipeline"),
)
def q_ngram_perplexity_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    out, v = bigram_lm_index(spark, sf_dir)
    dbig = spark.read.parquet(os.path.join(out, "dbig"))
    bc = spark.read.parquet(os.path.join(out, "bc"))
    uc = spark.read.parquet(os.path.join(out, "uc"))
    scored = (
        dbig.join(maybe_broadcast(bc), ["prev", "cur"])
        .join(maybe_broadcast(uc), "prev")
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("bigint").alias("n_bigrams"),
            (
                F.sum(
                    F.col("n")
                    * lm_bits_expr(F.col("c2"), F.col("c1"), F.lit(v))
                )
                / F.sum("n")
            ).alias("h"),
        )
    )
    out_df = scored.select(
        "doc_id", "n_bigrams", pround(F.col("h")).alias("bits_per_bigram")
    )
    return out_df.orderBy(F.desc("bits_per_bigram"), F.asc("doc_id")).limit(50)
