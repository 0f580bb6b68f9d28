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


@register(
    "q_bm25_topk",
    oracle=f"""
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
    """,
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
