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
    ],
)
def test_edge_corpus_matches_oracle(spark, edge_sf_dir, name):
    spec = load_all()[name]
    res = compare(name, spec.builder(spark, edge_sf_dir), duckdb_conn(edge_sf_dir), spec.oracle)
    assert res.ok, res.detail
