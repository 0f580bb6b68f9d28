"""Training-data pipeline operators, batch 3 (round 3): stratified
quality filtering, language-ID audit, semantic-dedup apply, and
per-source duplication-rate audit.

These extend the LLM-pipeline surface with the *selection/audit* steps a
production corpus build runs after scoring: rank-based per-shard quality
cuts (Gopher/C4 practice filters a quantile per source, not a global
threshold), declared-vs-predicted language confusion (mislabeled-corpus
audit), SemDeDup-style representative keeping over the learned k-means
cells (Abbas et al. 2023, greedy min-id variant), and the dedup-rate
dashboard number every corpus report starts with.

Scale notes (100 TB):
- the quality cut ranks within `source` shards (same per-shard window
  pattern as text_seq_pack) — integer ranks, no global sort, and the
  rank threshold avoids float-percentile interpolation divergence.
- the confusion matrix is a map-side score + one tiny (lang x lang) agg.
- semantic keep is one anti-join against the near-dup pair set, which is
  cell-blocked (never all-pairs) by the k-means coarse quantizer.
- dup-rate is a two-level agg keyed by a 16-byte digest, never raw text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from roapi_spark.functions.pipeline import docs
from roapi_spark.functions.text import stopword_hits, tokens_col
from roapi_spark.functions.dedup import STOP_SHINGLE_DF
from roapi_spark.plans.registry import register
from roapi_spark.util import pround

DROP_FRAC = 0.2

_TOKS_DUCK = "list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> length(x) > 0)"


@register(
    "text_quality_stratified",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, COALESCE({_TOKS_DUCK}, []) AS w FROM documents
    ), scored AS (
      SELECT doc_id, source,
             FLOOR(CAST(LEN(LIST_DISTINCT(w)) AS DOUBLE)
                   / GREATEST(LEN(w), 1) * 10000 + 0.5) / 10000.0 AS score
      FROM toks
    ), ranked AS (
      SELECT doc_id, source, score,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY score ASC, doc_id ASC) AS rnk,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM scored
    )
    SELECT doc_id, source, score, CAST(rnk AS BIGINT) AS rnk,
           rnk > FLOOR({DROP_FRAC} * n) AS kept
    FROM ranked
    """,
    doc=f"Stratified quality cut: rank documents per `source` shard by a "
    "distinct-word-fraction quality score (asc, doc_id tie-break) and "
    f"drop the bottom {int(DROP_FRAC * 100)}%. Quantile cuts per shard are "
    "the Gopher/C4 practice; the integer rank threshold (rnk > floor(q*n)) "
    "sidesteps cross-engine float-percentile interpolation entirely. "
    "Per-shard windows only — no global sort at any scale.",
    tags=("text", "quality", "pipeline"),
)
def text_quality_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir)
    # NULL text scores 0.0 (not NULL): NULL would rank nulls-first in
    # Spark but nulls-last in DuckDB — same class of divergence as
    # text_contamination's ADVICE r2 fix
    w = F.coalesce(tokens_col(), F.array().cast("array<string>"))
    score = pround(
        F.size(F.array_distinct(w)).cast("double") / F.greatest(F.size(w), F.lit(1))
    )
    scored = d.select("doc_id", "source", score.alias("score"))
    win = Window.partitionBy("source").orderBy(F.asc("score"), F.asc("doc_id"))
    cnt = Window.partitionBy("source")
    return scored.select(
        "doc_id",
        "source",
        "score",
        F.row_number().over(win).cast("bigint").alias("rnk"),
        (
            F.row_number().over(win)
            > F.floor(F.lit(DROP_FRAC) * F.count("*").over(cnt))
        ).alias("kept"),
    )


@register(
    "q_langid_confusion",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> length(x) > 0) AS w
      FROM documents
    ), scores AS (
      SELECT doc_id, lang,
        CAST(LEN(LIST_FILTER(w, x -> LIST_CONTAINS(['the','a','and','of','is'], x))) AS DOUBLE)
          / GREATEST(LEN(w), 1) AS score_en,
        CAST(LEN(LIST_FILTER(w, x -> LIST_CONTAINS(['der','die','das','und','ist'], x))) AS DOUBLE)
          / GREATEST(LEN(w), 1) AS score_de,
        CAST(LEN(LIST_FILTER(w, x -> LIST_CONTAINS(['el','la','de','que','es'], x))) AS DOUBLE)
          / GREATEST(LEN(w), 1) AS score_es
      FROM toks
    ), pred AS (
      SELECT lang,
             CASE WHEN score_en >= score_de AND score_en >= score_es THEN 'en'
                  WHEN score_de >= score_es THEN 'de'
                  ELSE 'es' END AS predicted_lang
      FROM scores
    ), conf AS (
      SELECT lang, predicted_lang, COUNT(*) AS n FROM pred GROUP BY 1, 2
    )
    SELECT lang, predicted_lang, CAST(n AS BIGINT) AS n,
           FLOOR(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY lang)
                 * 10000 + 0.5) / 10000.0 AS rate
    FROM conf
    """,
    doc="Language-ID confusion matrix: declared `lang` vs the stopword-"
    "argmax prediction (same scoring as text_langid), with per-declared-"
    "lang rates — the mislabeled-corpus audit a multilingual pipeline "
    "runs before per-language filtering. Map-side scoring, then a "
    "(n_langs x n_langs)-row aggregate.",
    tags=("text", "quality"),
)
def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir)
    toks = tokens_col()
    n = F.greatest(F.size(toks), F.lit(1))
    s_en = stopword_hits(toks, ["the", "a", "and", "of", "is"]).cast("double") / n
    s_de = stopword_hits(toks, ["der", "die", "das", "und", "ist"]).cast("double") / n
    s_es = stopword_hits(toks, ["el", "la", "de", "que", "es"]).cast("double") / n
    pred = (
        F.when((s_en >= s_de) & (s_en >= s_es), "en")
        .when(s_de >= s_es, "de")
        .otherwise("es")
    )
    conf = (
        d.select("lang", pred.alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    return conf.select(
        "lang",
        "predicted_lang",
        "n",
        pround(
            F.col("n").cast("double") / F.sum("n").over(Window.partitionBy("lang"))
        ).alias("rate"),
    )


def _semantic_keep_oracle() -> str:
    from roapi_spark.functions.similarity import kmeans_oracle_prefix

    return f"""
    WITH {kmeans_oracle_prefix()},
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM af a JOIN af b ON a.cid = b.cid AND a.vec_id < b.vec_id
      JOIN e ea ON ea.vec_id = a.vec_id
      JOIN e eb ON eb.vec_id = b.vec_id
      WHERE ROUND(LIST_COSINE_SIMILARITY(ea.v, eb.v), 4) >= 0.3
    )
    SELECT af.vec_id, af.cid
    FROM af
    WHERE af.vec_id NOT IN (SELECT id_b FROM pairs)
    """


@register(
    "dedup_semantic_keep",
    oracle=_semantic_keep_oracle(),
    doc="SemDeDup-style apply (Abbas et al. 2023, greedy min-id variant): "
    "within each learned k-means cell, a vector is dropped iff it is a "
    "near-duplicate (cosine >= 0.3) of a lower-id vector — one anti-join "
    "of the corpus against the cell-blocked near-dup pair set (the "
    "build-once embpairscid-v3 artifact shared with "
    "dedup_embedding_kmeans). Keeps exactly the minimal "
    "representative of every near-dup star; no all-pairs work anywhere.",
    tags=("dedup", "similarity", "pipeline"),
)
def dedup_semantic_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.dedup import emb_pairs_cid_cached
    from roapi_spark.functions.similarity import ivf_layout

    # Both halves are build-once artifacts: the cid-partitioned IVF
    # layout (k-means fit amortized across every cell-blocked op;
    # test_ivf_layout pins layout == live assignment) and the
    # cell-blocked near-dup edge set (emb_pairs_cid_cached, shared with
    # dedup_embedding_kmeans). The apply is one distinct + one anti-join.
    layout_dir, _ = ivf_layout(spark, sf_dir)
    dropped = (
        emb_pairs_cid_cached(spark, sf_dir)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return (
        spark.read.parquet(layout_dir)
        .select("vec_id", "cid")
        .join(dropped, "vec_id", "left_anti")
    )


@register(
    "q_dedup_rate_by_source",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT MD5(text)) AS BIGINT) AS n_unique,
           FLOOR((1 - CAST(COUNT(DISTINCT MD5(text)) AS DOUBLE) / COUNT(*))
                 * 10000 + 0.5) / 10000.0 AS dup_rate
    FROM documents
    GROUP BY source
    """,
    doc="Exact-duplication rate per source shard — the first number on "
    "any corpus quality dashboard. Two-level aggregate keyed by the md5 "
    "digest (16 bytes/doc over the shuffle, never the text); "
    "COUNT(DISTINCT) compiles to a partial-agg expand, no extra job.",
    tags=("dedup", "quality"),
)
def q_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir)
    return (
        d.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count_distinct(F.md5("text")).cast("bigint").alias("n_unique"),
        )
        .select(
            "source",
            "n_docs",
            "n_unique",
            pround(
                F.lit(1) - F.col("n_unique").cast("double") / F.col("n_docs")
            ).alias("dup_rate"),
        )
    )


# -- shingle-derivative dedup ops (share dedup.py's machinery) --------------

_SHINGLES = """
  toks AS (SELECT doc_id,
    list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> length(x) > 0) AS w
    FROM documents),
  sh AS (
    SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
    FROM toks, UNNEST(GENERATE_SERIES(1, GREATEST(LEN(w) - 2, 0))) AS t(i)
  )
"""
CONTAIN_MIN = 0.5


@register(
    "dedup_containment",
    oracle=f"""
    WITH {_SHINGLES},
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    live AS (
      SELECT s.doc_id, s.shingle
      FROM sh s JOIN (SELECT shingle FROM sh GROUP BY shingle
                      HAVING COUNT(*) <= {STOP_SHINGLE_DF}) f ON s.shingle = f.shingle
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM live a JOIN live b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT p.doc_a, p.doc_b, CAST(p.n_common AS BIGINT) AS n_common,
           FLOOR(CAST(p.n_common AS DOUBLE) / ca.n * 10000 + 0.5) / 10000.0
             AS contain_a,
           FLOOR(CAST(p.n_common AS DOUBLE) / cb.n * 10000 + 0.5) / 10000.0
             AS contain_b
    FROM pairs p
      JOIN cnt ca ON p.doc_a = ca.doc_id
      JOIN cnt cb ON p.doc_b = cb.doc_id
    WHERE CAST(p.n_common AS DOUBLE) / ca.n >= {CONTAIN_MIN}
       OR CAST(p.n_common AS DOUBLE) / cb.n >= {CONTAIN_MIN}
    """,
    doc="Containment near-dup (Broder's directional overlap |A^B|/|A|): "
    "catches the sub-document case Jaccard misses — a short document "
    "wholly embedded in a long one scores low Jaccard but containment "
    "~1.0 on the short side. Same stop-shingle-capped pair join as "
    f"dedup_ngram_jaccard, threshold {CONTAIN_MIN} on either direction.",
    tags=("dedup",),
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.dedup import shingle_pair_graph_cached

    pairs, cnt = shingle_pair_graph_cached(spark, sf_dir)
    ca = cnt.alias("ca")
    cb = cnt.alias("cb")
    c_a = F.col("n_common").cast("double") / F.col("ca.n")
    c_b = F.col("n_common").cast("double") / F.col("cb.n")
    return (
        pairs.join(ca, F.col("doc_a") == F.col("ca.doc_id"))
        .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
        .filter((c_a >= CONTAIN_MIN) | (c_b >= CONTAIN_MIN))
        .select(
            "doc_a",
            "doc_b",
            F.col("n_common").cast("bigint").alias("n_common"),
            pround(c_a).alias("contain_a"),
            pround(c_b).alias("contain_b"),
        )
    )


@register(
    "q_ngram_novelty",
    oracle=f"""
    WITH {_SHINGLES},
    first_seen AS (
      SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           FLOOR(CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*) * 10000 + 0.5) / 10000.0
             AS novelty
    FROM sh s JOIN first_seen f ON s.shingle = f.shingle
    GROUP BY s.doc_id
    """,
    doc="N-gram novelty curve: per document, the fraction of its distinct "
    "3-gram shingles first seen in it (min-doc_id ownership) — the "
    "redundancy-over-position signal used to order or downsample "
    "crawl-ordered corpora. Pure aggregations, no window: (doc,shingle) "
    "pairs are distinct, so per-doc novel count = number of shingles "
    "whose min-owner is the doc. Both groupBys get map-side partial "
    "combine (a window-over-shingle would shuffle AND sort the full "
    "explosion — measured 4x slower at sf0.1); the final join is "
    "doc-cardinality tiny, AQE broadcasts it.",
    tags=("dedup", "text", "quality"),
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.dedup import shingles

    sh = shingles(docs(spark, sf_dir))
    per_doc = sh.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_shingles")
    )
    owned = (
        sh.groupBy("shingle")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_novel"))
    )
    return per_doc.join(owned, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce(F.col("n_novel"), F.lit(0)).cast("bigint").alias("n_novel"),
        pround(
            F.coalesce(F.col("n_novel"), F.lit(0)).cast("double")
            / F.col("n_shingles")
        ).alias("novelty"),
    )


# -- integer-exact PageRank over the near-dup graph -------------------------

PR_ITERS = 2
PR_SCALE = 1_000_000  # fixed-point: pr starts at 1.0 * SCALE per node
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # d = 0.85 as an exact ratio


def _pagerank_oracle() -> str:
    from roapi_spark.functions.dedup import _PAIRS_DUCK

    base = PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN  # (1-d)*SCALE
    parts = [
        f"""edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    deg AS (SELECT a AS n, COUNT(*) AS d FROM edges GROUP BY a),
    pr0 AS (SELECT n, {PR_SCALE} AS pr FROM deg)"""
    ]
    for t in range(1, PR_ITERS + 1):
        parts.append(
            f"""s{t} AS (
      SELECT e.b AS n, SUM(p.pr // d.d) AS s
      FROM edges e JOIN pr{t - 1} p ON p.n = e.a JOIN deg d ON d.n = e.a
      GROUP BY e.b
    ),
    pr{t} AS (
      SELECT deg.n,
             {base} + (COALESCE(s{t}.s, 0) * {PR_DAMP_NUM}) // {PR_DAMP_DEN} AS pr
      FROM deg LEFT JOIN s{t} ON deg.n = s{t}.n
    )"""
        )
    return (
        f"WITH {_PAIRS_DUCK},\n    "
        + ",\n    ".join(parts)
        + f"""
    SELECT deg.n AS doc_id, CAST(deg.d AS BIGINT) AS degree,
           CAST(pr{PR_ITERS}.pr AS BIGINT) AS pagerank
    FROM deg JOIN pr{PR_ITERS} ON deg.n = pr{PR_ITERS}.n
    """
    )


@register(
    "q_pagerank_dupgraph",
    oracle=_pagerank_oracle(),
    doc=f"PageRank over the LSH near-dup candidate graph ({PR_ITERS} "
    "power iterations, damping 0.85): centrality in the duplicate graph "
    "identifies template/boilerplate hubs worth pruning wholesale. All "
    "arithmetic is fixed-point integer (contribution = pr div degree, "
    "damping as *85 div 100), so every engine computes bit-identical "
    "ranks — the iterative-algorithm pattern with an exact oracle. The "
    "graph is the (tiny) pair set, orders of magnitude smaller than the "
    "corpus; Spark iterates over checkpointed edges, never the corpus.",
    tags=("dedup", "iterative"),
)
def q_pagerank_dupgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.dedup import lsh_pairs_cached

    pairs = lsh_pairs_cached(spark, sf_dir)
    edges = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .union(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy(F.col("a").alias("n")).agg(F.count("*").alias("d"))
    base = PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    pr = deg.select("n", F.lit(PR_SCALE).cast("bigint").alias("pr"))
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(pr, edges.a == pr.n)
            .join(deg.select(F.col("n").alias("dn"), "d"), edges.a == F.col("dn"))
            .select(F.col("b"), F.expr("pr div d").alias("c"))
            .groupBy("b")
            .agg(F.sum("c").alias("s"))
        )
        pr = (
            deg.join(contrib, deg.n == contrib.b, "left")
            .select(
                "n",
                (
                    F.lit(base)
                    + F.expr(f"(coalesce(s, 0) * {PR_DAMP_NUM}) div {PR_DAMP_DEN}")
                ).cast("bigint").alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        deg.join(pr, "n")
        .select(
            F.col("n").alias("doc_id"),
            F.col("d").cast("bigint").alias("degree"),
            F.col("pr").cast("bigint").alias("pagerank"),
        )
    )
