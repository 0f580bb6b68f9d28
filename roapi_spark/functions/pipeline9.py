"""Training-pipeline batch 9 (round 7): curation audits that close the
loop on the engine's OWN approximate structures.

Complements pipeline6's corpus data-card queries (mixture allocation,
Zipf/Heaps fits, method agreement) with the audits that were still
missing (reference scope: roapi serves tables, `columnq/src/table/
mod.rs`; these extend the engine with the curation analytics a 100 TB
text corpus needs on top):

- ``q_hash_split`` — deterministic md5-bucket train/val/test assignment,
  reported as a (split, source) matrix: reproducible across engines and
  runs, no RNG state, and the per-source breakdown makes imbalance
  visible.
- ``q_cluster_purity`` — label purity + entropy per learned k-means cell
  over the persisted IVF layout: the quantizer-quality audit read before
  trusting centroid-blocked dedup/ANN.
- ``q_minhash_calibration`` — the MinHash estimator audited against
  exact shingle Jaccard on the cached candidate pairs, bucketed by
  estimate: the error table that justifies the estimator's band/row
  parameters (q_dedup_method_agreement counts set overlap; this measures
  estimator ERROR).
- ``dedup_embedding_incremental`` — an arriving vector batch audited
  against only its coarse-quantizer cell's corpus members, composing
  the persisted IVF layout with the shared embpairscid edge artifact.
- ``q_dedup_funnel`` — the one-row dedup headline: docs -> exact-unique
  -> near-dup survivors with the final keep rate.

Scale shape at 100 TB: every query is one corpus-keyed aggregation plus
dimension-sized (split / cell / pair) follow-ups; the calibration pair
set is the cached sub-quadratic LSH edge artifact, not an all-pairs
join, and the incremental/funnel serves read snapshot artifacts.
"""

from __future__ import annotations

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

# md5-bucket split bounds out of 100: [0,80) train, [80,90) val, rest test
SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 90


def docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def split_col(doc_id) -> F.Column:
    """The train/val/test label for a doc id — pure function of
    md5(doc_id), identical across engines/runs/shards. Shared by
    q_hash_split and the leakage audit (pipeline10.q_split_leakage)."""
    from roapi_spark.util import hash_bucket

    b = hash_bucket(doc_id.cast("string"), 100)
    return (
        F.when(b < SPLIT_TRAIN_PCT, "train")
        .when(b < SPLIT_VAL_PCT, "val")
        .otherwise("test")
    )


def split_sql(expr: str) -> str:
    """DuckDB twin of :func:`split_col` for oracle CTEs."""
    from roapi_spark.util import hash_bucket_sql

    b = hash_bucket_sql(f"({expr})::VARCHAR", 100)
    return (
        f"CASE WHEN {b} < {SPLIT_TRAIN_PCT} THEN 'train'"
        f" WHEN {b} < {SPLIT_VAL_PCT} THEN 'val' ELSE 'test' END"
    )


@register(
    "q_hash_split",
    oracle=f"""
    WITH tagged AS (
      SELECT source,
             ('0x' || SUBSTR(MD5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS b,
             LEN({_TOKS_DUCK}) AS ntok
      FROM documents
    )
    SELECT CASE WHEN b < {SPLIT_TRAIN_PCT} THEN 'train'
                WHEN b < {SPLIT_VAL_PCT} THEN 'val'
                ELSE 'test' END AS split,
           source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ntok) AS BIGINT) AS n_tokens
    FROM tagged
    GROUP BY 1, 2
    ORDER BY split, source
    """,
    doc="Deterministic train/val/test assignment: md5(doc_id) -> bucket "
    f"0..99, [0,{SPLIT_TRAIN_PCT}) train / [{SPLIT_TRAIN_PCT},"
    f"{SPLIT_VAL_PCT}) val / rest test — reproducible across engines, "
    "runs and shards with zero RNG state (the only split rule that "
    "survives a distributed re-run). Reported per (split, source) so "
    "imbalance would be visible. Pure map-side tag + one agg shuffle of "
    "split*source cells.",
    tags=("text", "sampling", "pipeline"),
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.text import tokens_col

    return (
        docs(spark, sf_dir)
        .select(
            split_col(F.col("doc_id")).alias("split"),
            "source",
            F.size(tokens_col()).alias("ntok"),
        )
        .groupBy("split", "source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("ntok").cast("bigint").alias("n_tokens"),
        )
        .orderBy("split", "source")
    )


def _cluster_purity_oracle() -> str:
    from roapi_spark.functions.similarity import kmeans_oracle_prefix

    return f"""
    WITH {kmeans_oracle_prefix()},
    cl AS (
      SELECT af.cid, em.label, COUNT(*) AS c
      FROM af JOIN embeddings em ON em.vec_id = af.vec_id
      GROUP BY af.cid, em.label
    ), tot AS (
      SELECT cid, SUM(c) AS n FROM cl GROUP BY cid
    )
    SELECT cl.cid, CAST(MAX(tot.n) AS BIGINT) AS n_members,
           CAST(COUNT(*) AS BIGINT) AS n_labels,
           FLOOR(MAX(cl.c) * 1.0 / MAX(tot.n) * 10000 + 0.5) / 10000.0
             AS purity,
           FLOOR(-SUM((cl.c * 1.0 / tot.n) * LN(cl.c * 1.0 / tot.n))
                 * 10000 + 0.5) / 10000.0 AS label_entropy
    FROM cl JOIN tot USING (cid)
    GROUP BY cl.cid
    ORDER BY cl.cid
    """


@register(
    "q_cluster_purity",
    oracle=_cluster_purity_oracle(),
    doc="Quantizer-quality audit: label purity (majority-label share) and "
    "label entropy per learned k-means cell, read off the persisted IVF "
    "layout — the check run before trusting centroid-blocked dedup or "
    "IVF probes (a low-purity, high-entropy cell means the coarse "
    "quantizer is mixing semantic neighborhoods). Serve path: one "
    "(cid,label) agg over the cid-partitioned layout, then K_LISTS-sized "
    "joins; the k-means fit itself is the amortized build-once artifact, "
    "and the full pipeline is DuckDB-oracle-checked.",
    tags=("similarity", "quality", "pipeline"),
)
def q_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.similarity import ivf_layout

    layout_dir, _ = ivf_layout(spark, sf_dir)
    cl = (
        spark.read.parquet(layout_dir)
        .groupBy("cid", "label")
        .agg(F.count("*").alias("c"))
    )
    tot = cl.groupBy("cid").agg(F.sum("c").alias("n"))
    p = F.col("c") * F.lit(1.0) / F.col("n")
    return (
        cl.join(maybe_broadcast(tot), "cid")
        .groupBy("cid")
        .agg(
            F.max("n").cast("bigint").alias("n_members"),
            F.count("*").cast("bigint").alias("n_labels"),
            pround(F.max("c") * F.lit(1.0) / F.max("n")).alias("purity"),
            pround(-F.sum(p * F.log(p))).alias("label_entropy"),
        )
        .select("cid", "n_members", "n_labels", "purity", "label_entropy")
        .orderBy("cid")
    )


def _minhash_calibration_oracle() -> str:
    from roapi_spark.functions.dedup import N_MINHASH, lsh_cand_oracle_cte

    return f"""
    WITH {lsh_cand_oracle_cte()},
    est AS (
      SELECT c.doc_a, c.doc_b,
             FLOOR(SUM(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END)
                   / CAST({N_MINHASH} AS DOUBLE) * 10000 + 0.5) / 10000.0
               AS est_jaccard
      FROM cand c
        JOIN minh ma ON ma.doc_id = c.doc_a
        JOIN minh mb ON mb.doc_id = c.doc_b AND ma.k = mb.k
      GROUP BY c.doc_a, c.doc_b
    ),
    szs AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT e.doc_a, e.doc_b, COUNT(*) AS i
      FROM est e
        JOIN sh a ON a.doc_id = e.doc_a
        JOIN sh b ON b.doc_id = e.doc_b AND b.shingle = a.shingle
      GROUP BY e.doc_a, e.doc_b
    ),
    scored AS (
      SELECT e.est_jaccard,
             COALESCE(i.i, 0) * 1.0
               / (sa.sz + sb.sz - COALESCE(i.i, 0)) AS exact_jaccard
      FROM est e
        LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
        JOIN szs sa ON sa.doc_id = e.doc_a
        JOIN szs sb ON sb.doc_id = e.doc_b
    )
    SELECT CAST(FLOOR(est_jaccard * 10) AS BIGINT) AS est_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           FLOOR(AVG(exact_jaccard) * 10000 + 0.5) / 10000.0 AS mean_exact,
           FLOOR(AVG(ABS(est_jaccard - exact_jaccard)) * 10000 + 0.5) / 10000.0
             AS mean_abs_err
    FROM scored
    GROUP BY 1 ORDER BY 1
    """


@register(
    "q_minhash_calibration",
    oracle=_minhash_calibration_oracle(),
    doc="MinHash estimator calibration: for every cached LSH candidate "
    "pair, the signature-match estimate vs the EXACT shingle Jaccard, "
    "bucketed by estimate decile — the error table that justifies (or "
    "indicts) the N_MINHASH/band parameters. Serve path: pair-bounded "
    "throughout — the est side is the cached lshpairs-v4 artifact, the "
    "exact side joins the pair set (broadcast) against the distinct "
    "shingle postings, so work scales with candidate pairs x shingles "
    "per doc, never all-pairs.",
    tags=("dedup", "quality", "pipeline"),
)
def q_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.dedup import docs as _docs
    from roapi_spark.functions.dedup import lsh_pairs_cached, shingles

    pairs = lsh_pairs_cached(spark, sf_dir)
    # Pair-bounded on the SCAN side too: only docs that appear in a
    # cached pair get tokenized/shingled (the member set is pair-graph-
    # sized, orders of magnitude under the corpus), and the barrier
    # materializes the exploded postings ONCE for all three consumers
    # below (szs + both sides of the intersection join) instead of
    # re-running the explode per subtree.
    pdocs = pairs.select(
        F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
    ).distinct()
    sh = shingles(
        _docs(spark, sf_dir).join(maybe_broadcast(pdocs), "doc_id")
    ).localCheckpoint(eager=False)
    szs = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        maybe_broadcast(pairs.select("doc_a", "doc_b"))
        .join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .join(
            sh.withColumnRenamed("doc_id", "doc_b2").withColumnRenamed(
                "shingle", "shingle_b"
            ),
            (F.col("doc_b") == F.col("doc_b2"))
            & (F.col("shingle") == F.col("shingle_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    scored = (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .join(
            maybe_broadcast(szs.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sza")),
            "doc_a",
        )
        .join(
            maybe_broadcast(szs.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "szb")),
            "doc_b",
        )
        .select(
            "est_jaccard",
            (
                F.coalesce(F.col("i"), F.lit(0))
                * F.lit(1.0)
                / (F.col("sza") + F.col("szb") - F.coalesce(F.col("i"), F.lit(0)))
            ).alias("exact_jaccard"),
        )
    )
    return (
        scored.groupBy(
            F.floor(F.col("est_jaccard") * 10).cast("bigint").alias("est_bucket")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            pround(F.avg("exact_jaccard")).alias("mean_exact"),
            pround(F.avg(F.abs(F.col("est_jaccard") - F.col("exact_jaccard")))).alias(
                "mean_abs_err"
            ),
        )
        .orderBy("est_bucket")
    )


def _emb_incremental_oracle() -> str:
    from roapi_spark.functions.dedup import CELL_SKEW_MULT, INCR_MOD, INCR_NEW
    from roapi_spark.functions.similarity import K_LISTS, kmeans_oracle_prefix

    return f"""
    WITH {kmeans_oracle_prefix()},
    newv AS (SELECT vec_id, cid FROM af WHERE vec_id % {INCR_MOD} = {INCR_NEW}),
    corp AS (SELECT vec_id, cid FROM af WHERE vec_id % {INCR_MOD} <> {INCR_NEW}),
    csz AS (SELECT cid, COUNT(*) AS nc FROM corp GROUP BY cid),
    okc AS (  -- corpus-side degenerate-cell guard, same bound as batch
      SELECT csz.cid, csz.nc FROM csz
      WHERE csz.nc <= {CELL_SKEW_MULT} * (SELECT COUNT(*) FROM corp)
                      / {K_LISTS}),
    dups AS (
      SELECT n.vec_id AS new_id, COUNT(*) AS n_dups
      FROM newv n
        JOIN corp c ON c.cid = n.cid
        JOIN okc ON okc.cid = n.cid
        JOIN e en ON en.vec_id = n.vec_id
        JOIN e ec ON ec.vec_id = c.vec_id
      WHERE ROUND(LIST_COSINE_SIMILARITY(en.v, ec.v), 4) >= 0.3
      GROUP BY 1
    )
    SELECT n.vec_id AS new_id, n.cid,
           CAST(COALESCE(okc.nc, 0) AS BIGINT) AS n_candidates,
           CAST(COALESCE(d.n_dups, 0) AS BIGINT) AS n_dups
    FROM newv n
      LEFT JOIN okc ON okc.cid = n.cid
      LEFT JOIN dups d ON d.new_id = n.vec_id
    ORDER BY new_id
    """


@register(
    "dedup_embedding_incremental",
    oracle=_emb_incremental_oracle(),
    doc="Incremental embedding dedup: an arriving vector batch (the "
    "simulated vec_id%10==7 slice, same convention as dedup_incremental) "
    "is assigned with the PERSISTED coarse quantizer and audited against "
    "only its cell's corpus members — n_candidates (cell occupancy after "
    "the corpus-side skew cap) and n_dups (cosine >= 0.3 matches) per "
    "new vector, no corpus-wide recompute. Serve path composes the two "
    "build-once artifacts: cell membership from the IVF layout, the "
    "actual duplicate edges from the shared embpairscid pair graph "
    "filtered to new-vs-corpus orientation — both joins are "
    "dimension-sized.",
    tags=("dedup", "similarity", "pipeline"),
)
def dedup_embedding_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.dedup import (
        CELL_SKEW_MULT,
        INCR_MOD,
        INCR_NEW,
        emb_pairs_cid_cached,
    )
    from roapi_spark.functions.similarity import (
        K_LISTS,
        ivf_cell_sizes,
        ivf_layout,
    )

    layout_dir, _ = ivf_layout(spark, sf_dir)
    members = spark.read.parquet(layout_dir).select("vec_id", "cid")
    is_new = F.col("vec_id") % INCR_MOD == INCR_NEW
    newv = members.filter(is_new)
    # corpus-side cell occupancy = the layout's PERSISTED per-cell sizes
    # minus the new slice's per-cell counts (one K_LISTS-row collect of
    # the batch we list anyway) — the skew gate is then driver-side
    # integer math, with no second corpus-wide aggregation per call
    sizes = ivf_cell_sizes(layout_dir)
    new_counts = {
        int(r.cid): int(r.n)
        for r in newv.groupBy("cid").agg(F.count("*").alias("n")).collect()
    }
    corp_sizes = {cid: n - new_counts.get(cid, 0) for cid, n in sizes.items()}
    totc = sum(corp_sizes.values())
    ok_cells = sorted(
        (cid, nc)
        for cid, nc in corp_sizes.items()
        if nc <= CELL_SKEW_MULT * totc / K_LISTS
    )
    okc = spark.createDataFrame(ok_cells, "cid int, nc bigint")
    pairs = emb_pairs_cid_cached(spark, sf_dir)
    # new-vs-corpus edges, either orientation of the (id_a < id_b) pair
    a_new = (F.col("id_a") % INCR_MOD == INCR_NEW)
    b_new = (F.col("id_b") % INCR_MOD == INCR_NEW)
    dups = (
        pairs.join(maybe_broadcast(okc.select("cid")), "cid")
        .filter(a_new != b_new)
        .select(F.when(a_new, F.col("id_a")).otherwise(F.col("id_b")).alias("new_id"))
        .groupBy("new_id")
        .agg(F.count("*").alias("n_dups"))
    )
    return (
        newv.select(F.col("vec_id").alias("new_id"), "cid")
        .join(maybe_broadcast(okc), "cid", "left")
        .join(maybe_broadcast(dups), "new_id", "left")
        .select(
            "new_id",
            "cid",
            F.coalesce("nc", F.lit(0)).cast("bigint").alias("n_candidates"),
            F.coalesce("n_dups", F.lit(0)).cast("bigint").alias("n_dups"),
        )
        .orderBy("new_id")
    )


# the funnel's doc-stage CTEs (requires comp from _COMPONENTS_DUCK) —
# shared with pipeline11's curation funnel so the keep rule can't
# silently diverge between the two oracles
_FUNNEL_DUCK = """keep_ex AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY MD5(text)),
    drop_near AS (SELECT doc_id FROM comp WHERE doc_id <> component),
    surv AS (
      SELECT k.doc_id FROM keep_ex k
      WHERE k.doc_id NOT IN (SELECT doc_id FROM drop_near)
    )"""


def _dedup_funnel_oracle() -> str:
    from roapi_spark.functions.dedup import _COMPONENTS_DUCK

    return f"""
    WITH RECURSIVE {_COMPONENTS_DUCK},
    {_FUNNEL_DUCK}
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM keep_ex) AS n_after_exact,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM surv) AS n_after_near,
           FLOOR((SELECT COUNT(*) FROM surv) * 1.0
                 / (SELECT COUNT(*) FROM documents) * 10000 + 0.5) / 10000.0
             AS pct_kept
    """


def funnel_survivors(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(docs, exact-keepers, doc-dedup survivors) — the funnel's doc-id
    frames, shared with the batch-11 curation funnel."""
    from roapi_spark.functions.dedup import dedup_components
    from roapi_spark.functions.dedup import docs as _docs

    d = _docs(spark, sf_dir)
    keep_ex = (
        d.select(F.md5("text").alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    drop_near = (
        dedup_components(spark, sf_dir)
        .filter(F.col("doc_id") != F.col("component"))
        .select("doc_id")
    )
    surv = keep_ex.join(maybe_broadcast(drop_near), "doc_id", "left_anti")
    return d, keep_ex, surv


@register(
    "q_dedup_funnel",
    oracle=_dedup_funnel_oracle(),
    doc="Corpus-level dedup funnel — the one-row headline of a dedup "
    "report: docs -> exact-unique (keep min doc_id per md5) -> near-dup "
    "survivors (exact keepers that are not non-representative members "
    "of an LSH component), with the final keep rate. Serve path: the "
    "exact stage is one 16-byte-digest shuffle; the near stage reads "
    "the snapshot-cached component labels (pair-graph-sized) and "
    "anti-joins — no text ever shuffles, no pair recompute.",
    tags=("dedup", "quality", "pipeline"),
)
def q_dedup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    d, keep_ex, surv = funnel_survivors(spark, sf_dir)
    n_docs = d.agg(F.count("*").cast("bigint").alias("n_docs"))
    n_ex = keep_ex.agg(F.count("*").cast("bigint").alias("n_after_exact"))
    n_surv = surv.agg(F.count("*").cast("bigint").alias("n_after_near"))
    return (
        n_docs.crossJoin(F.broadcast(n_ex))
        .crossJoin(F.broadcast(n_surv))
        .select(
            "n_docs",
            "n_after_exact",
            "n_after_near",
            pround(
                F.col("n_after_near") * F.lit(1.0) / F.col("n_docs")
            ).alias("pct_kept"),
        )
    )
