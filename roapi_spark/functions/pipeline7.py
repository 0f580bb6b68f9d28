"""Training-pipeline batch 7 (round 6): retrieval scoring.

BM25 joins the tf-idf keyterm operator (pipeline3) as the other standard
lexical relevance scorer — the one retrieval deployments (and RAG data
curation: picking corpus passages relevant to a benchmark/query set)
actually rank with, since it adds document-length normalization and the
saturating tf term that plain tf-idf lacks.

Scale shape (the part that matters at 100 TB): query terms and the df
table are vocabulary-bounded dimensions; the only big join is posting
lists (term-keyed — the same key the tf aggregation already shuffled on)
against a broadcast query-term set, then one doc-keyed agg and a
bounded top-k window per query. No all-pairs, no global sort.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from roapi_spark.plans.registry import register
from roapi_spark.plans.util import maybe_broadcast
from roapi_spark.util import pround

_TOKS_DUCK = "list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> length(x) > 0)"

# BM25 constants (the standard Robertson/Lucene defaults)
BM25_K1 = 1.2
BM25_B = 0.75
N_QUERY_DOCS = 5  # doc_id < 5 are the query set, like knn's vec_id rule
BM25_TOPK = 10


def docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


_BM25_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS_DUCK}) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks
      WHERE doc_id >= {N_QUERY_DOCS} GROUP BY doc_id, term
    ), dl AS (
      SELECT doc_id, CAST(SUM(tf) AS DOUBLE) AS dl FROM tf GROUP BY doc_id
    ), stats AS (
      SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl
    ), dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), qterms AS (
      SELECT DISTINCT doc_id AS qid, term FROM toks
      WHERE doc_id < {N_QUERY_DOCS}
    ), contrib AS (
      SELECT q.qid, tf.doc_id,
             LN((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
               * tf.tf * ({BM25_K1} + 1.0)
               / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                                       + {BM25_B} * dl.dl / stats.avgdl))
               AS c
      FROM qterms q
      JOIN dfreq USING (term)
      JOIN tf ON tf.term = q.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
    ), scored AS (
      SELECT qid, doc_id,
             FLOOR(SUM(c) * 10000 + 0.5) / 10000.0 AS score
      FROM contrib GROUP BY qid, doc_id
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                   ORDER BY score DESC, doc_id ASC) AS rank
      FROM scored
    )
    SELECT qid, doc_id, score, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {BM25_TOPK}
    """


@register(
    "q_bm25_topk",
    oracle=_BM25_ORACLE,
    doc="BM25 top-10 retrieval: the first 5 documents are the query set, "
    "the rest the corpus. Plan: one (doc_id, term)-keyed tf shuffle "
    "feeding df + doclen aggregates (vocabulary / corpus-row bounded), "
    "query-term x posting-list equi-join on term (query side broadcast), "
    "doc-keyed score agg, per-query top-k window over query-count-bounded "
    "rows. Same query-set convention as knn_bruteforce (doc_id < 5).",
    tags=("text", "retrieval", "pipeline"),
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.text import tokens_col

    toks = docs(spark, sf_dir).select(
        "doc_id", F.explode(tokens_col()).alias("term")
    )
    tf = (
        toks.filter(F.col("doc_id") >= N_QUERY_DOCS)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("double").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    qterms = (
        toks.filter(F.col("doc_id") < N_QUERY_DOCS)
        .select(F.col("doc_id").alias("qid"), "term")
        .distinct()
    )
    contrib = (
        qterms.join(maybe_broadcast(dfreq), "term")
        .join(tf, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))  # 1 row
        .select(
            "qid",
            "doc_id",
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                    + F.lit(1.0)
                )
                * F.col("tf")
                * F.lit(BM25_K1 + 1.0)
                / (
                    F.col("tf")
                    + F.lit(BM25_K1)
                    * (
                        F.lit(1.0 - BM25_B)
                        + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("c"),
        )
    )
    scored = contrib.groupBy("qid", "doc_id").agg(pround(F.sum("c")).alias("score"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= BM25_TOPK)
    )


# ---------------------------------------------------------------------------
# Round 7: the serve-path half of BM25. q_bm25_topk above recomputes
# tokenization + three aggregates from raw text on every call — the right
# shape for a one-shot batch score, the wrong one for a retrieval endpoint.
# bm25_index materializes the classic inverted index once per corpus
# snapshot (content-addressed via the parquet footer digest, same lifecycle
# as ivf_layout / the LSH pair graphs); q_bm25_topk_served answers from it.

N_PBUCKETS = 64  # term-hash partition fan-out of the postings layout


def bm25_index(spark: SparkSession, sf_dir: str) -> tuple[str, int, float]:
    """Build-once BM25 inverted index for ``sf_dir``: postings parquet
    (term, doc_id, tf, dl — doc length denormalized onto every posting so
    serving never joins a doc-keyed table) partitioned by ``pb =
    crc32(term) % N_PBUCKETS``, a document-frequency table, and the two
    scalar stats. The pb partitioning is what makes serving an INDEX READ
    instead of a scan: a query's terms map to a handful of pb values, so
    the FileScan carries PartitionFilters and reads only those posting
    shards. Returns (layout dir, n_docs, avgdl)."""
    import json

    from roapi_spark.functions.snapshot import build_once, snapshot_cache_dir
    from roapi_spark.functions.text import tokens_col

    src = os.path.join(sf_dir, "documents.parquet")
    out = snapshot_cache_dir(src, "bm25-v1")

    def _ready(d: str) -> bool:
        return os.path.exists(os.path.join(d, "_BM25_READY"))

    def _build(tmp: str) -> None:
        toks = docs(spark, sf_dir).select(
            "doc_id", F.explode(tokens_col()).alias("term")
        )
        tf = (
            toks.filter(F.col("doc_id") >= N_QUERY_DOCS)
            .groupBy("doc_id", "term")
            .agg(F.count("*").alias("tf"))
        )
        dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("double").alias("dl"))
        postings = (
            tf.join(dl, "doc_id")
            .withColumn("pb", F.crc32(F.col("term")) % N_PBUCKETS)
        )
        postings.repartition("pb").write.mode("overwrite").partitionBy(
            "pb"
        ).parquet(os.path.join(tmp, "postings"))
        # dfreq and the scalar stats derive from the postings JUST
        # written, not from tf's lazy lineage: re-running that lineage
        # would pay the corpus tokenize + tf shuffle (the dominant build
        # cost) three times instead of once — the compacted postings are
        # orders of magnitude smaller than the raw text
        pdf = spark.read.parquet(os.path.join(tmp, "postings"))
        pdf.groupBy("term").agg(F.count("*").alias("df")).write.mode(
            "overwrite"
        ).parquet(os.path.join(tmp, "dfreq"))
        n_docs, avgdl = (
            pdf.groupBy("doc_id")
            .agg(F.first("dl").alias("dl"))
            .agg(F.count("*"), F.avg("dl"))
            .first()
        )
        with open(os.path.join(tmp, "_stats.json"), "w") as f:
            json.dump(
                {"n_docs": int(n_docs), "avgdl": float(avgdl or 0.0)}, f
            )
        open(os.path.join(tmp, "_BM25_READY"), "w").close()

    build_once(out, _ready, _build)
    with open(os.path.join(out, "_stats.json")) as f:
        st = json.load(f)
    return out, int(st["n_docs"]), float(st["avgdl"])


@register(
    "q_bm25_topk_served",
    oracle=_BM25_ORACLE,
    doc="Same result contract as q_bm25_topk (identical oracle), served "
    "from the build-once bm25-v1 inverted index instead of re-scoring raw "
    "text: query-doc terms (a bounded set — the query docs' vocabulary, "
    "same bounded-driver-state rule as knn's query vectors) resolve to "
    "crc32 partition buckets, so the postings FileScan carries "
    "PartitionFilters and touches only the probed shards; df joins "
    "broadcast, scores aggregate per doc, WindowGroupLimit takes top-k. "
    "At 100 TB this is the retrieval-endpoint plan: the tokenize+aggregate "
    "cost is paid once per corpus snapshot, not per query.",
    tags=("text", "retrieval", "pipeline", "artifact"),
)
def q_bm25_topk_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.text import tokens_col
    from roapi_spark.plans.util import maybe_broadcast

    layout, n_docs, avgdl = bm25_index(spark, sf_dir)
    qterms = (
        docs(spark, sf_dir)
        .filter(F.col("doc_id") < N_QUERY_DOCS)
        .select(F.col("doc_id").alias("qid"), F.explode(tokens_col()).alias("term"))
        .distinct()
    )
    # the probed bucket set: bounded by the query docs' vocabulary (the
    # only driver-side state, same contract as knn/IVF query collects)
    pbs = sorted(
        {int(r.pb) for r in qterms.select(
            (F.crc32(F.col("term")) % N_PBUCKETS).alias("pb")
        ).distinct().collect()}
    )
    # explicit probe paths, not an IN-list PartitionFilter: partition
    # DISCOVERY would still list all N_PBUCKETS directories per call (a
    # parallel listing job that costs more than the probe — same finding
    # as the ann_lsh layout); a pb with no directory has no postings
    pdir = os.path.join(layout, "postings")
    probe_paths = [
        p for b in pbs if os.path.isdir(p := os.path.join(pdir, f"pb={b}"))
    ]
    if not probe_paths:
        postings = spark.read.parquet(pdir).filter(F.lit(False))
    else:
        postings = spark.read.option("basePath", pdir).parquet(*probe_paths)
    dfreq = spark.read.parquet(os.path.join(layout, "dfreq"))
    contrib = (
        postings.join(F.broadcast(qterms), "term")
        .join(maybe_broadcast(dfreq), "term")
        .select(
            "qid",
            "doc_id",
            (
                F.log(
                    (F.lit(n_docs) - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                    + F.lit(1.0)
                )
                * F.col("tf")
                * F.lit(BM25_K1 + 1.0)
                / (
                    F.col("tf")
                    + F.lit(BM25_K1)
                    * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.lit(avgdl))
                )
            ).alias("c"),
        )
    )
    scored = contrib.groupBy("qid", "doc_id").agg(pround(F.sum("c")).alias("score"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= BM25_TOPK)
    )
