"""Edge-case corpus run through the same Spark-vs-DuckDB oracle gate the
driver uses: documents whose text is empty, sub-gram-length, or free of
[a-z] tokens — the shapes that historically made the two engines diverge
(Spark sequence(1,0) -> [1,0]; DuckDB UNNEST([]) -> no rows)."""

from __future__ import annotations

import pytest

from roapi_spark.plans.registry import load_all
from roapi_spark.testing.oracle import compare, duckdb_conn

EDGE_DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (1, "", "en", "web", 0),
    (2, "1234 5678 !!", "en", "web", 12),  # zero [a-z] tokens, >=8 chars
    (3, "abc", "en", "web", 3),  # < 8 normalized chars -> zero 8-grams
    (4, "1234567", "en", "web", 7),  # 7 chars, no tokens
    (5, "a decent ordinary document with enough words to behave", "en", "web", 55),
    (6, "  spaced    out\ttext  ", "en", "web", 22),  # normalizes short
    (7, "exactly8", "en", "web", 8),  # exactly one 8-gram
    (8, None, "en", "web", 0),  # NULL text (ADVICE r2 #2: must behave as [])
]


@pytest.fixture(scope="module")
def edge_sf_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("edge_sf")
    cols = list(zip(*EDGE_DOCS))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(cols[0], pa.int64()),
                "text": pa.array(cols[1], pa.string()),
                "lang": pa.array(cols[2], pa.string()),
                "source": pa.array(cols[3], pa.string()),
                "n_chars": pa.array(cols[4], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "text_rolling_fingerprint",
        "text_fingerprint",
        "dedup_simhash",
        "text_stats",
        "text_quality",
        "text_langid",
        "q_token_count_bpe",
        "dedup_exact",
        "text_contamination",
        "text_tfidf_topk",
        "q_source_mixture",
        "text_quality_stratified",
        "q_langid_confusion",
        "q_dedup_rate_by_source",
        "multimodal_alignment",
        # round-4b additions
        "dedup_substring_spans",
        "q_mixture_allocation",
        "q_token_fertility",
        "text_quality_logit",
        "q_ngram_novelty",
        "q_heaps_law",
        "dedup_incremental",
    ],
)
def test_edge_corpus_matches_oracle(spark, edge_sf_dir, name):
    spec = load_all()[name]
    res = compare(name, spec.builder(spark, edge_sf_dir), duckdb_conn(edge_sf_dir), spec.oracle)
    assert res.ok, res.detail


@pytest.fixture(scope="module")
def boilerplate_sf_dir(tmp_path_factory):
    """150 identical boilerplate docs (one LSH mega-bucket, > BAND_CAP)
    plus one genuine near-dup pair that must survive the cap."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    boiler = "all rights reserved copyright notice terms of service apply to this page"
    near_a = "the quick brown fox jumps over the lazy dog near the riverbank today"
    near_b = "the quick brown fox jumps over the lazy dog near the riverbank tonight"
    texts = [boiler] * 150 + [near_a, near_b]
    d = tmp_path_factory.mktemp("boiler_sf")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["web"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def test_minhash_lsh_hot_band_cap(spark, boilerplate_sf_dir):
    """The mega-bucket is dropped (no 150^2/2 pair blowup), the genuine
    near-dup pair survives, and Spark still hash-matches the oracle."""
    spec = load_all()["dedup_minhash_lsh"]
    df = spec.builder(spark, boilerplate_sf_dir)
    rows = df.collect()
    pairs = {(r.doc_a, r.doc_b) for r in rows}
    assert (150, 151) in pairs  # near-dup pair found
    assert len(rows) < 50  # the 11,175 boilerplate pairs were capped away
    res = compare(
        "dedup_minhash_lsh", df, duckdb_conn(boilerplate_sf_dir), spec.oracle
    )
    assert res.ok, res.detail


@pytest.fixture(scope="module")
def edge_emb_dir(tmp_path_factory):
    """Degenerate embeddings: a zero vector (undefined cosine — DuckDB's
    LIST_COSINE_SIMILARITY yields -1.0, Spark's dot/(na*nb) yields NULL;
    BOTH fall below every threshold, so the threshold family must agree
    by dropping such pairs), plus identical and opposite vectors."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    dim = 64
    base = [float(i % 7 - 3) for i in range(dim)]
    vecs = [
        (0, base, 1),
        (1, base, 1),                      # identical -> cos 1.0
        (2, [-x for x in base], 1),        # opposite -> cos -1.0
        (3, [0.0] * dim, 1),               # zero vector
        (4, [x + 0.5 for x in base], 2),   # different label block
    ]
    d = tmp_path_factory.mktemp("edge_emb")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
                "embedding": pa.array(
                    [v[1] for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([v[2] for v in vecs], pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    return str(d)


def test_zero_vector_cosine_dedup_contract(spark, edge_emb_dir):
    """The zero vector produces no pair on either engine; the identical
    pair survives with cos 1.0 — Spark and the oracle agree row-for-row."""
    spec = load_all()["dedup_embedding_cosine"]
    res = compare(
        "dedup_embedding_cosine",
        spec.builder(spark, edge_emb_dir),
        duckdb_conn(edge_emb_dir),
        spec.oracle,
    )
    assert res.ok, res.detail
    rows = spec.builder(spark, edge_emb_dir).collect()
    ids = {(r.id_a, r.id_b) for r in rows}
    assert (0, 1) in ids            # identical pair kept
    assert not any(3 in p for p in ids)  # zero vector pairs dropped


@pytest.fixture(scope="module")
def edge_events_dir(tmp_path_factory):
    """Events with DUPLICATE (user_id, ts) pairs — the latent
    nondeterminism ADVICE r3 flagged in the sessionize windows: without
    an event_id tie-break, the running-sum session ids differ between
    engines/runs. Also: a user whose whole timeline is one instant, and
    a single-event user."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    s = lambda sec: t0 + datetime.timedelta(seconds=sec)  # noqa: E731
    rows = [
        # user 1: two events at the SAME instant, then a gap, then two more
        (1, s(0), 1, "click"), (2, s(0), 1, "view"),
        (3, s(4000), 1, "click"), (4, s(4000), 1, "purchase"),
        # user 2: entire timeline at one instant
        (5, s(10), 2, "signup"), (6, s(10), 2, "click"), (7, s(10), 2, "view"),
        # user 3: single event
        (8, s(20), 3, "click"),
        # user 4: duplicates straddling the session gap boundary
        (9, s(0), 4, "click"), (10, s(1800), 4, "view"), (11, s(1800), 4, "click"),
    ]
    d = tmp_path_factory.mktemp("edge_events")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.mark.parametrize(
    "name",
    ["q_sessionize_batch", "q_event_funnel", "q_events_hourly", "q_gapfill_locf"],
)
def test_duplicate_timestamp_events_match_oracle(spark, edge_events_dir, name):
    spec = load_all()[name]
    res = compare(
        name,
        spec.builder(spark, edge_events_dir),
        duckdb_conn(edge_events_dir),
        spec.oracle,
    )
    assert res.ok, res.detail


@pytest.fixture(scope="module")
def collapsed_emb_dir(tmp_path_factory):
    """Degenerate-centroid corpus: 16 spread vectors (incl. the K_LISTS
    k-means seeds) + 32 copies of one vector. The collapsed cell exceeds
    CELL_SKEW_MULT x the balanced share (48/8=6 -> cap 24), so the
    kmeans-blocked dedup must drop it; the spread cells must survive."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    dim = 64
    rng_vecs = []
    for i in range(16):
        # deterministic, well-separated directions
        v = [0.0] * dim
        v[i % dim] = 10.0
        v[(i * 7 + 3) % dim] = float(3 + i)
        rng_vecs.append((i, v, 1))
    hot = [1.0] * dim
    for j in range(32):
        rng_vecs.append((1000 + j, hot, 2))
    d = tmp_path_factory.mktemp("collapsed_emb")
    pq.write_table(
        pa.table({
            "vec_id": pa.array([v[0] for v in rng_vecs], pa.int64()),
            "embedding": pa.array([v[1] for v in rng_vecs], pa.list_(pa.float32())),
            "label": pa.array([v[2] for v in rng_vecs], pa.int32()),
        }),
        str(d / "embeddings.parquet"),
    )
    return str(d)


def test_kmeans_dedup_cell_skew_guard(spark, collapsed_emb_dir):
    """CELL_SKEW_MULT drops the collapsed cell (no quadratic 32^2/2 pair
    set from the identical vectors) and the Spark result still matches
    the DuckDB oracle, whose okc CTE mirrors the cap."""
    from roapi_spark.functions import dedup

    spec = load_all()["dedup_embedding_kmeans"]
    res = compare(
        "dedup_embedding_kmeans",
        spec.builder(spark, collapsed_emb_dir),
        duckdb_conn(collapsed_emb_dir),
        spec.oracle,
    )
    assert res.ok, res.detail
    rows = spec.builder(spark, collapsed_emb_dir).collect()
    hot_ids = {1000 + j for j in range(32)}
    assert not any(r.id_a in hot_ids or r.id_b in hot_ids for r in rows), (
        "collapsed-cell pairs must be dropped by the skew guard"
    )
    # guard off -> the quadratic pair set appears (the blowup being bounded)
    saved = dedup.CELL_SKEW_MULT
    try:
        dedup.CELL_SKEW_MULT = 10**9
        uncapped = spec.builder(spark, collapsed_emb_dir).collect()
    finally:
        dedup.CELL_SKEW_MULT = saved
    hot_pairs = sum(
        1 for r in uncapped if r.id_a in hot_ids and r.id_b in hot_ids
    )
    assert hot_pairs == 32 * 31 // 2
