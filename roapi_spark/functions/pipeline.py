"""Training-data pipeline operators, batch 2: Gopher-style quality
signals, intra-document repetition, span(chunk)-level dedup, PII
redaction, vocabulary building, and sequence packing.

These extend the reference's query surface with the operations a
large-scale LLM pre-training pipeline needs (north star in BASELINE.json);
the reference itself has no equivalents, so each cites the public method
it implements (Gopher/C4 filtering rules, RefinedWeb span dedup, GPT-style
sequence packing).

Scale notes (100 TB):
- quality/repetition/PII are pure map-side or shuffle-on-doc_id only —
  embarrassingly parallel over document shards.
- chunk dedup shuffles on a 16-byte md5 of the chunk, never the text.
- vocab build is explode -> partial agg -> global top-k (the classic
  two-stage word count; the post-agg vocab is tiny).
- sequence packing uses a per-`source` window, not a global sort, so
  packs are built independently per shard.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from roapi_spark.plans.registry import register
from roapi_spark.util import WS_CLASS, pround

# whitespace word tokens (documents are lowercase word-soup; keep raw case
# handling anyway so the op is corpus-agnostic)
_WORDS_DUCK = "list_filter(string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'), x -> length(x) > 0)"

GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def words_col() -> Column:
    return F.filter(F.split(F.col("text"), WS_CLASS + "+"), lambda x: F.length(x) > 0)


@register(
    "text_quality_gopher",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_WORDS_DUCK} AS w FROM documents
    ), feats AS (
      SELECT doc_id,
             CAST(LEN(w) AS BIGINT) AS n_words,
             FLOOR(CAST(LIST_SUM(LIST_TRANSFORM(w, x -> LENGTH(x))) AS DOUBLE)
                   / GREATEST(LEN(w), 1) * 10000 + 0.5) / 10000.0 AS mean_word_len,
             FLOOR(CAST(LEN(LIST_DISTINCT(w)) AS DOUBLE)
                   / GREATEST(LEN(w), 1) * 10000 + 0.5) / 10000.0 AS frac_distinct_words,
             FLOOR(CAST(LEN(LIST_FILTER(w, x -> REGEXP_MATCHES(x, '[a-zA-Z]'))) AS DOUBLE)
                   / GREATEST(LEN(w), 1) * 10000 + 0.5) / 10000.0 AS frac_alpha_words,
             CAST(LEN(LIST_FILTER({GOPHER_STOPWORDS!r}, s -> LIST_CONTAINS(w, s)))
                  AS BIGINT) AS n_stopwords_present
      FROM toks
    )
    SELECT *,
           (n_words BETWEEN 50 AND 100000
            AND mean_word_len BETWEEN 3 AND 10
            AND frac_distinct_words >= 0.3
            AND frac_alpha_words >= 0.8
            AND n_stopwords_present >= 2) AS gopher_keep
    FROM feats
    """,
    doc="Gopher-rule quality signals (Rae et al. 2021 §A1.1): word count, "
    "mean word length, distinct-word fraction, alpha-word fraction, "
    "stopword presence, and the combined keep flag. Pure map-side; no "
    "shuffle at any scale.",
    tags=("text", "quality"),
)
def text_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir).select("doc_id", words_col().alias("w"))
    n = F.size("w")
    g = F.greatest(n, F.lit(1))
    n_words = n.cast("bigint")
    mean_word_len = pround(
        F.aggregate("w", F.lit(0), lambda acc, x: acc + F.length(x)).cast("double") / g
    )
    frac_distinct = pround(F.size(F.array_distinct("w")).cast("double") / g)
    frac_alpha = pround(
        F.size(F.filter("w", lambda x: x.rlike("[a-zA-Z]"))).cast("double") / g
    )
    n_stop = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains("w", s),
        )
    ).cast("bigint")
    out = d.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        frac_distinct.alias("frac_distinct_words"),
        frac_alpha.alias("frac_alpha_words"),
        n_stop.alias("n_stopwords_present"),
    )
    keep = (
        F.col("n_words").between(50, 100000)
        & F.col("mean_word_len").between(3, 10)
        & (F.col("frac_distinct_words") >= 0.3)
        & (F.col("frac_alpha_words") >= 0.8)
        & (F.col("n_stopwords_present") >= 2)
    )
    return out.select("*", keep.alias("gopher_keep"))


@register(
    "text_repetition",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         x -> length(x) > 0) AS w
      FROM documents
    ), bg AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(w) - 1),
                                   i -> w[i] || '_' || w[i + 1])) AS gram
      FROM toks
    ), counted AS (
      SELECT doc_id, gram, COUNT(*) AS cnt FROM bg GROUP BY doc_id, gram
    ), ranked AS (
      SELECT doc_id, gram, cnt,
             SUM(cnt) OVER (PARTITION BY doc_id) AS n_bigrams,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY cnt DESC, gram ASC) AS rn
      FROM counted
    )
    SELECT doc_id,
           CAST(n_bigrams AS BIGINT) AS n_bigrams,
           gram AS top_bigram,
           CAST(cnt AS BIGINT) AS top_bigram_count,
           FLOOR(CAST(cnt AS DOUBLE) / n_bigrams * 10000 + 0.5) / 10000.0
             AS top_bigram_frac
    FROM ranked WHERE rn = 1
    """,
    doc="Intra-document repetition (Gopher §A1.1 'duplicate n-gram "
    "fraction'): most frequent word bigram per document and its share of "
    "all bigrams. Explode + partial-agg keyed by doc_id — shuffles only "
    "(doc_id, gram, count), never text; per-doc window after the agg.",
    tags=("text", "quality"),
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir).select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: F.length(x) > 0
        ).alias("w"),
    )
    # `w` is a plain column reference below — safe inside lambdas (see
    # docs/SCALE.md pitfall #2: only computed expressions re-evaluate).
    grams = F.when(
        F.size("w") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("w") - 1),
            lambda i: F.concat_ws(
                "_", F.element_at("w", i), F.element_at("w", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = d.select("doc_id", F.explode(grams).alias("gram"))
    counted = bg.groupBy("doc_id", "gram").count().withColumnRenamed("count", "cnt")
    w_doc = Window.partitionBy("doc_id")
    w_rank = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("gram"))
    ranked = counted.select(
        "doc_id",
        "gram",
        "cnt",
        F.sum("cnt").over(w_doc).alias("n_bigrams"),
        F.row_number().over(w_rank).alias("rn"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "doc_id",
        F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        F.col("gram").alias("top_bigram"),
        F.col("cnt").cast("bigint").alias("top_bigram_count"),
        pround(F.col("cnt").cast("double") / F.col("n_bigrams")).alias(
            "top_bigram_frac"
        ),
    )


CHUNK_WORDS = 10


@register(
    "dedup_chunk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         x -> length(x) > 0) AS w
      FROM documents
    ), chunked AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, CAST(FLOOR(LEN(w) / {CHUNK_WORDS}) AS INT)),
               i -> md5(array_to_string(
                      list_slice(w, (i - 1) * {CHUNK_WORDS} + 1, i * {CHUNK_WORDS}),
                      '_'))
             ) AS chunks
      FROM toks
    ), exploded AS (
      SELECT doc_id, unnest(chunks) AS h FROM chunked
    ), freq AS (
      SELECT doc_id, h, COUNT(*) OVER (PARTITION BY h) AS corpus_freq
      FROM exploded
    ), per_doc AS (
      SELECT doc_id,
             COUNT(*) AS n_chunks,
             COUNT(*) FILTER (WHERE corpus_freq > 1) AS n_dup_chunks
      FROM freq GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(p.n_chunks, 0) AS BIGINT) AS n_chunks,
           CAST(COALESCE(p.n_dup_chunks, 0) AS BIGINT) AS n_dup_chunks,
           CASE WHEN COALESCE(p.n_chunks, 0) = 0 THEN 0.0
                ELSE FLOOR(CAST(p.n_dup_chunks AS DOUBLE) / p.n_chunks
                           * 10000 + 0.5) / 10000.0 END AS dup_chunk_frac
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
    doc=f"Span-level (chunk) dedup, RefinedWeb/C4 style: non-overlapping "
    f"{CHUNK_WORDS}-word chunks hashed with md5; a chunk seen more than "
    "once corpus-wide is a duplicate span. Shuffle key is the 16-byte "
    "digest, never the text; per-doc rollup joins back to documents so "
    "short docs report 0 chunks. At 100 TB this is the standard "
    "sub-document dedup pass (exact-span variant of the suffix-array "
    "method in Lee et al. 2022).",
    tags=("dedup", "text"),
)
def dedup_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir)
    toks = d.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: F.length(x) > 0
        ).alias("w"),
    )
    chunks = F.transform(
        F.sequence(F.lit(1), F.floor(F.size("w") / CHUNK_WORDS).cast("int")),
        lambda i: F.md5(
            F.array_join(
                F.slice("w", ((i - 1) * CHUNK_WORDS + 1).cast("int"), CHUNK_WORDS),
                "_",
            )
        ),
    )
    # sequence(1, 0) would yield [1, 0] (descending pitfall); guard short docs
    chunked = toks.select(
        "doc_id",
        F.when(F.size("w") >= CHUNK_WORDS, chunks)
        .otherwise(F.array().cast("array<string>"))
        .alias("chunks"),
    )
    exploded = chunked.select("doc_id", F.explode("chunks").alias("h"))
    freq = exploded.select(
        "doc_id", "h", F.count("*").over(Window.partitionBy("h")).alias("corpus_freq")
    )
    per_doc = freq.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.when(F.col("corpus_freq") > 1, 1).otherwise(0)).alias("n_dup_chunks"),
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_chunks", F.lit(0)).cast("bigint").alias("n_chunks"),
            F.coalesce("n_dup_chunks", F.lit(0)).cast("bigint").alias("n_dup_chunks"),
            F.when(F.coalesce("n_chunks", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                pround(F.col("n_dup_chunks").cast("double") / F.col("n_chunks"))
            )
            .alias("dup_chunk_frac"),
        )
    )


_EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_PHONE_RE = r"\+?[0-9][0-9() -]{6,}[0-9]"

# literal PII rows unioned onto the (PII-free, synthetic) corpus so the
# redaction path is actually exercised; ids sit far above real doc_ids
_PII_ROWS = [
    (9000001, "contact john.doe@example.com or call +1 555-123-4567 today"),
    (9000002, "mail a@b.io and c@d.org, phone 0044 20 7946 0958, done"),
    (9000003, "no personal data in this one at all"),
]


@register(
    "text_pii_redact",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT * FROM (VALUES
        (9000001, 'contact john.doe@example.com or call +1 555-123-4567 today'),
        (9000002, 'mail a@b.io and c@d.org, phone 0044 20 7946 0958, done'),
        (9000003, 'no personal data in this one at all')
      ) v(doc_id, text)
    ), step1 AS (
      SELECT doc_id,
             CAST(LEN(REGEXP_EXTRACT_ALL(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
             REGEXP_REPLACE(text, '{_EMAIL_RE}', '<EMAIL>', 'g') AS t1
      FROM corpus
    )
    SELECT doc_id, n_emails,
           CAST(LEN(REGEXP_EXTRACT_ALL(t1, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
           MD5(REGEXP_REPLACE(t1, '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_fp,
           CAST(LENGTH(REGEXP_REPLACE(t1, '{_PHONE_RE}', '<PHONE>', 'g')) AS BIGINT)
             AS redacted_len
    FROM step1
    """,
    doc="PII scrubbing: email then phone redaction via regexp_replace, with "
    "per-doc match counts and a fingerprint of the redacted text. Patterns "
    "restricted to the Java/RE2-common subset so Spark and the oracle "
    "agree. Map-side only; at 100 TB this composes with any downstream "
    "op without adding a shuffle.",
    tags=("text", "quality"),
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir).select("doc_id", "text")
    lit = spark.createDataFrame(_PII_ROWS, "doc_id bigint, text string")
    corpus = d.unionByName(lit)
    t1 = F.regexp_replace("text", _EMAIL_RE, "<EMAIL>")
    step1 = corpus.select(
        "doc_id",
        F.regexp_count("text", F.lit(_EMAIL_RE)).cast("bigint").alias("n_emails"),
        t1.alias("t1"),
    )
    t2 = F.regexp_replace("t1", _PHONE_RE, "<PHONE>")
    return step1.select(
        "doc_id",
        "n_emails",
        F.regexp_count("t1", F.lit(_PHONE_RE)).cast("bigint").alias("n_phones"),
        F.md5(t2).alias("redacted_fp"),
        F.length(t2).cast("bigint").alias("redacted_len"),
    )


VOCAB_SIZE = 200


@register(
    "text_vocab_topk",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                x -> length(x) > 0)) AS token
      FROM documents
    ), counted AS (
      SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token
    ), ranked AS (
      SELECT token, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS vocab_id
      FROM counted
    )
    SELECT CAST(vocab_id AS INT) AS vocab_id, token, CAST(cnt AS BIGINT) AS cnt
    FROM ranked WHERE vocab_id <= {VOCAB_SIZE}
    """,
    doc=f"Vocabulary building: corpus-wide word counts, top-{VOCAB_SIZE} by "
    "(count desc, token asc), dense ids via row_number. Explode -> "
    "map-side partial agg -> orderBy+limit, which Spark plans as "
    "TakeOrderedAndProject (per-partition top-k, then a merge of K-row "
    "heaps on the driver) — the full Zipf-tailed distinct-token set "
    "never funnels through one partition. The row_number window runs "
    f"only over the already-limited {VOCAB_SIZE}-row result, which is "
    "single-partition by construction (no extra Exchange).",
    tags=("text",),
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    top = counted.orderBy(F.desc("cnt"), F.asc("token")).limit(VOCAB_SIZE)
    # frame is <= VOCAB_SIZE rows by the limit; pmod(cnt, 1) is a
    # constant-0 non-foldable partition key that makes the bound explicit
    # (TakeOrderedAndProject's single partition satisfies the clustering —
    # no extra Exchange, no unpartitioned-WindowExec warning)
    return top.select(
        F.row_number()
        .over(
            Window.partitionBy(F.pmod(F.col("cnt"), F.lit(1))).orderBy(
                F.desc("cnt"), F.asc("token")
            )
        )
        .alias("vocab_id"),
        "token",
        F.col("cnt").cast("bigint").alias("cnt"),
    )


PACK_TOKENS = 2048


@register(
    "text_seq_pack",
    oracle=f"""
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
    )
    SELECT doc_id, source, n_tokens,
           CAST(FLOOR(cum_before / {PACK_TOKENS}) AS BIGINT) AS pack_id,
           CAST(cum_before % {PACK_TOKENS} AS BIGINT) AS pack_offset
    FROM packed
    """,
    doc=f"Sequence packing: assign each document a (pack_id, offset) slot "
    f"in {PACK_TOKENS}-token training sequences via a running token count "
    "per `source` shard — GPT-style concat-and-chunk packing. The window "
    "partitions by source, so packs build independently per shard (no "
    "global sort) and the op scales linearly with shard count.",
    tags=("text",),
)
def text_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir)
    toks = d.select(
        "doc_id", "source", F.size(words_col()).cast("bigint").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = toks.select(
        "doc_id",
        "source",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("cum_before"),
    )
    return packed.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(F.col("cum_before") / PACK_TOKENS).cast("bigint").alias("pack_id"),
        (F.col("cum_before") % PACK_TOKENS).cast("bigint").alias("pack_offset"),
    )


MIN_DF = 10
POSTINGS_CAP = 50


@register(
    "q_inverted_index",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_distinct(list_filter(
               string_split_regex(lower(text), '[^a-z]+'),
               x -> length(x) > 0))) AS token
      FROM documents
    )
    SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
           array_to_string(
             list_slice(LIST(doc_id ORDER BY doc_id), 1, {POSTINGS_CAP}),
             ',') AS postings
    FROM tok GROUP BY token HAVING COUNT(*) >= {MIN_DF}
    """,
    doc="Inverted-index (posting list) construction: distinct (token, "
    f"doc_id) pairs, grouped by token with df >= {MIN_DF} and postings "
    f"capped at {POSTINGS_CAP} ids. The shuffle key is the token; at "
    "100 TB the full lists would be range-bucketed by token instead of "
    "capped — the cap here bounds result-row width, not the build. "
    "Postings are emitted as a ','-joined string (like q_array_agg) so "
    "every comparison harness can sort/hash the frame.",
    tags=("text",),
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir)
    tok = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col("text")), "[^a-z]+"),
                    lambda x: F.length(x) > 0,
                )
            )
        ).alias("token"),
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count("*").cast("bigint").alias("df"),
            F.array_join(
                F.transform(
                    F.slice(F.array_sort(F.collect_list("doc_id")), 1, POSTINGS_CAP),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
        .filter(F.col("df") >= MIN_DF)
    )
