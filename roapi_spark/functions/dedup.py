"""Deduplication operators for LLM-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

Design for 100 TB:
- Exact dedup is a hash-groupBy (map-side partial agg; one shuffle on the
  16-byte digest, never on the raw text).
- Shingle/MinHash/SimHash computation is pure map-side JVM expression work
  (higher-order array functions — no Python UDFs).
- LSH banding turns the quadratic candidate generation into an equi-join on
  (band_id, band_signature) — only colliding docs shuffle together, the
  standard sub-quadratic near-dup join.
- Portable hashing: every hash is md5-based so the DuckDB oracle computes
  bit-identical signatures (Spark's xxhash64/hash are engine-specific).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from roapi_spark.plans.registry import register
from roapi_spark.util import pround

N_MINHASH = 12  # 4 bands x 3 rows
BAND_ROWS = 3

_TOKS_DUCK = "list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> length(x) > 0)"
# word 3-gram shingles, distinct, DuckDB side (1-indexed lists)
_SHINGLES_DUCK = f"""
  toks AS (SELECT doc_id, {_TOKS_DUCK} AS w FROM documents),
  sh AS (
    SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
    FROM toks, UNNEST(GENERATE_SERIES(1, GREATEST(LEN(w) - 2, 0))) AS t(i)
  )
"""


def docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def tokens_col() -> Column:
    return F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: F.length(x) > 0)


def shingles(df: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams, computed map-side."""
    toks = tokens_col().alias("w")
    return (
        df.select("doc_id", toks)
        .filter(F.size("w") >= n)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(0), F.size("w") - n),
                        lambda i: F.concat_ws(
                            " ", *[F.element_at("w", i + k + 1) for k in range(n)]
                        ),
                    )
                )
            ).alias("shingle"),
        )
    )


# --------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
    SELECT MD5(text) AS text_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY MD5(text)
    """,
    doc="Exact dedup: group on content digest, keep lowest doc_id. The "
    "shuffle key is the 16-byte digest, not the document text.",
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir)
    return (
        d.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SHINGLES_DUCK},
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT p.doc_a, p.doc_b,
           CAST(p.n_common AS BIGINT) AS n_common,
           FLOOR(CAST(p.n_common AS DOUBLE) / (ca.n + cb.n - p.n_common) * 10000 + 0.5)
             / 10000.0 AS jaccard
    FROM pairs p
      JOIN cnt ca ON p.doc_a = ca.doc_id
      JOIN cnt cb ON p.doc_b = cb.doc_id
    WHERE CAST(p.n_common AS DOUBLE) / (ca.n + cb.n - p.n_common) >= 0.1
    """,
    doc="n-gram Jaccard near-dup: distinct 3-word shingles, equi-join on "
    "shingle to count overlap, Jaccard >= 0.1. The shingle join is the "
    "scale risk (hot shingles); at 100 TB add a stop-shingle filter "
    "(drop shingles with doc-frequency above a cap) — same plan shape.",
    tags=("dedup",),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = shingles(docs(spark, sf_dir)).cache()
    cnt = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    ca = cnt.alias("ca")
    cb = cnt.alias("cb")
    jac = F.col("n_common").cast("double") / (
        F.col("ca.n") + F.col("cb.n") - F.col("n_common")
    )
    return (
        pairs.join(ca, F.col("doc_a") == F.col("ca.doc_id"))
        .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
        .filter(jac >= 0.1)
        .select(
            "doc_a",
            "doc_b",
            F.col("n_common").cast("bigint").alias("n_common"),
            pround(jac).alias("jaccard"),
        )
    )


def _minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, k, mh): k-th minhash = min over shingles of
    md5('<k>:'||shingle) prefix — portable across engines."""
    sh = shingles(docs(spark, sf_dir))
    ks = F.explode(F.sequence(F.lit(0), F.lit(N_MINHASH - 1))).alias("k")
    return (
        sh.select("doc_id", "shingle", ks)
        .select(
            "doc_id",
            "k",
            F.substring(
                F.md5(F.concat(F.col("k").cast("string"), F.lit(":"), F.col("shingle"))),
                1,
                12,
            ).alias("h"),
        )
        .groupBy("doc_id", "k")
        .agg(F.min("h").alias("mh"))
    )


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_SHINGLES_DUCK},
    minh AS (
      SELECT doc_id, k, MIN(SUBSTR(MD5(k::VARCHAR || ':' || shingle), 1, 12)) AS mh
      FROM sh, UNNEST(GENERATE_SERIES(0, {N_MINHASH - 1})) AS t(k)
      GROUP BY doc_id, k
    ),
    bands AS (
      SELECT doc_id, k // {BAND_ROWS} AS band_id,
             STRING_AGG(mh, ',' ORDER BY k) AS band_sig
      FROM minh GROUP BY doc_id, k // {BAND_ROWS}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           FLOOR(SUM(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) / CAST({N_MINHASH} AS DOUBLE)
                 * 10000 + 0.5) / 10000.0 AS est_jaccard
    FROM cand c
      JOIN minh ma ON ma.doc_id = c.doc_a
      JOIN minh mb ON mb.doc_id = c.doc_b AND ma.k = mb.k
    GROUP BY c.doc_a, c.doc_b
    """,
    doc=f"MinHash({N_MINHASH})+LSH({N_MINHASH // BAND_ROWS} bands x {BAND_ROWS} rows): "
    "signature is a map-side min-agg per (doc, k); banding joins only "
    "colliding signatures — sub-quadratic candidate generation. "
    "est_jaccard = fraction of matching minhashes.",
    tags=("dedup",),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    minh = _minhash_sig(spark, sf_dir).cache()
    bands = (
        minh.withColumn("band_id", (F.col("k") / BAND_ROWS).cast("int"))
        .groupBy("doc_id", "band_id")
        .agg(
            F.array_join(F.array_sort(F.collect_list(F.struct("k", "mh"))).mh, ",").alias(
                "band_sig"
            )
        )
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ma = minh.alias("ma")
    mb = minh.alias("mb")
    return (
        cand.join(ma, F.col("doc_a") == F.col("ma.doc_id"))
        .join(mb, (F.col("doc_b") == F.col("mb.doc_id")) & (F.col("ma.k") == F.col("mb.k")))
        .groupBy("doc_a", "doc_b")
        .agg(
            pround(
                F.sum(F.when(F.col("ma.mh") == F.col("mb.mh"), 1).otherwise(0))
                / F.lit(float(N_MINHASH))
            ).alias("est_jaccard")
        )
    )


@register(
    "dedup_simhash",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> length(x) > 0) AS w
      FROM documents
    ),
    th AS (  -- 32-bit md5-derived token hash, with multiplicity
      SELECT doc_id,
             CAST(('0x' || SUBSTR(MD5(t.token), 1, 8))::BIGINT AS BIGINT) AS h
      FROM toks, UNNEST(w) AS t(token)
    ),
    bits AS (
      SELECT doc_id, i,
             SUM(CASE WHEN (h // CAST(POWER(2, i) AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END) AS s
      FROM th, UNNEST(GENERATE_SERIES(0, 31)) AS g(i)
      GROUP BY doc_id, i
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0 THEN CAST(POWER(2, i) AS BIGINT) ELSE 0 END) AS BIGINT)
             AS simhash32
    FROM bits
    GROUP BY doc_id
    """,
    doc="SimHash (32-bit, md5-derived token hashes): per-bit +/-1 vote over "
    "all tokens, bit set where the vote is positive. Map-side expansion "
    "(tokens x 32) + two tiny aggs; near-dup = low hamming distance.",
    tags=("dedup",),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir)
    th = d.select(
        "doc_id", F.explode(tokens_col()).alias("token")
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("bigint").alias("h"),
    )
    bits = (
        th.select("doc_id", "h", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("i"))
        .withColumn(
            "vote",
            F.when(
                (F.col("h") / F.pow(F.lit(2.0), F.col("i")).cast("bigint")).cast("bigint")
                % 2
                == 1,
                1,
            ).otherwise(-1),
        )
        .groupBy("doc_id", "i")
        .agg(F.sum("vote").alias("s"))
    )
    return bits.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.pow(F.lit(2.0), F.col("i")).cast("bigint")).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("simhash32")
    )


@register(
    "dedup_embedding_cosine",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(LIST_COSINE_SIMILARITY(a.v, b.v), 4) AS cos_sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ROUND(LIST_COSINE_SIMILARITY(a.v, b.v), 4) >= 0.3
    """,
    doc="Embedding-cosine near-dup with label blocking (at scale the block "
    "key comes from coarse quantization/LSH; same plan shape: block equi-"
    "join then exact verify).",
    tags=("dedup", "similarity"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.similarity import cosine_expr, emb

    e = emb(spark, sf_dir)
    a = e.alias("a")
    b = e.alias("b")
    cos = cosine_expr("a.v", "b.v")
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .withColumn("cos_sim", F.round(cos, 4))
        .filter(F.col("cos_sim") >= 0.3)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            "cos_sim",
        )
    )
