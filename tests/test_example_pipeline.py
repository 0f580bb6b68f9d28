"""The end-to-end example pipeline runs, monotonically shrinks the
corpus through its gates, and packs the survivors — including fresh
content-addressed artifacts for each derived snapshot."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_training_pipeline_end_to_end(spark, tmp_path):
    from training_pipeline import run

    summary = run(spark, "/root/testdata/sf0.001", str(tmp_path / "out"))
    assert summary["input_docs"] == 500
    assert 0 < summary["after_quality"] <= summary["input_docs"]
    assert 0 < summary["after_dedup"] <= summary["after_quality"]
    assert 0 < summary["after_span_rewrite"] <= summary["after_dedup"]
    assert summary["n_packs"] >= 1
    assert summary["n_shards"] >= 1
    # doc-level dedup kept one twin per near-dup cluster, so the closing
    # split-leakage audit must not exceed the raw corpus's (exact zero is
    # not guaranteed — the span rewrite can leave similar short residues
    # that form NEW candidate pairs); on the current testdata it IS zero
    leak, before = (summary["cross_split_leak_pairs"],
                    summary["cross_split_leak_pairs_before"])
    # zero is the expected outcome; when the raw corpus HAS cross-split
    # twins, dedup must strictly reduce them — `<= before` alone would
    # also pass if dedup silently stopped collapsing anything
    assert leak == 0 or (before > 0 and leak < before)
    assert summary["allocations"], "per-source allocation table is empty"
    for row in summary["allocations"]:
        assert row["epochs"] > 0 and row["alloc_tokens"] > 0
    # the final snapshot is a real parquet corpus downstream ops can read
    final = spark.read.parquet(
        os.path.join(summary["final_snapshot"], "documents.parquet")
    )
    assert final.count() == summary["after_span_rewrite"]
    assert {"doc_id", "text", "source"} <= set(final.columns)
    # stage 5: the shipped-corpus tokenizer/quality audits are present
    # and sane (fertility >= 1 by construction; the distilled head must
    # beat coin-flipping on its own training rule)
    assert summary["bpe_fertility_by_source"]
    assert all(v >= 1.0 for v in summary["bpe_fertility_by_source"].values())
    assert summary["quality_head_final_acc"] > 0.5


def test_delta_lifecycle_example(spark, tmp_path):
    from delta_lifecycle import run

    out = run(spark, str(tmp_path / "corpus"), "/root/testdata/sf0.001")
    assert out["initial_version"] == 0
    assert out["checkpoint_version"] == 2  # v0 + two appends
    assert out["compacted_version"] == 3
    assert out["delete_version"] == 4 and out["merge_version"] == 5
    assert out["vacuumed_files"] > 0
    assert out["live_rows"] > 0 and out["live_files"] >= 1
    # the zordered metrics table must actually skip files for the
    # selective two-column predicate, and still return matching rows
    assert out["zorder_files_skipped"] >= 4
    assert out["zorder_files_scanned"] + out["zorder_files_skipped"] == 8
    assert out["zorder_selective_rows"] > 0


def test_training_pipeline_from_crawl(spark, tmp_path):
    """The opt-in crawl entry point: WARC archives -> extracted
    documents snapshot -> the same downstream gates. 404s (and their
    duplicate-URL records) drop at ingest; duplicate fetches collapse
    on the canonical URL; the snapshot is documents-shaped so every
    downstream operator runs unchanged."""
    import duckdb

    from training_pipeline import run

    summary = run(
        spark, "/root/testdata/sf0.001", str(tmp_path / "out"), from_crawl=True
    )
    # every non-404 doc survives ingest exactly once (dups collapse)
    expect = duckdb.sql(
        "SELECT COUNT(*) FROM '/root/testdata/sf0.001/documents.parquet' "
        "WHERE doc_id % 11 <> 3"
    ).fetchone()[0]
    assert summary["crawl_docs"] == expect
    assert summary["input_docs"] == summary["crawl_docs"]
    assert 0 < summary["after_quality"] <= summary["input_docs"]
    assert summary["n_packs"] >= 1 and summary["n_shards"] >= 1
    final = spark.read.parquet(
        os.path.join(summary["final_snapshot"], "documents.parquet")
    )
    assert {"doc_id", "text", "lang", "source", "n_chars"} <= set(final.columns)


def test_crawl_pipeline_end_to_end(spark, tmp_path):
    """The 8-stage crawl loop (examples/crawl_pipeline.py) closes on
    itself: the archives it indexes publish as next round's sitemap
    seed list, and its CDXJ shards merge with the prior round's into
    one latest-capture master index."""
    from crawl_pipeline import run

    s = run(spark, "/root/testdata/sf0.001", str(tmp_path / "crawl"))
    n_pages = s["recrawl"]["n_pages"]
    assert n_pages == 500
    assert s["recrawl"]["stale"] + s["recrawl"]["daily"] + s["recrawl"][
        "fresh"
    ] == n_pages
    # the budget apportions exactly the fixed slot budget
    assert sum(s["budget"].values()) == 1000
    # dedup-aware export stored fewer octets than a naive archive
    assert s["archive"]["octets_saved"] > 0
    n_ptrs = sum(s["index"].values())
    assert n_ptrs >= n_pages  # responses + revisit pointers
    # every indexed capture is published as a seed for the next round
    assert sum(s["sitemap"].values()) == n_ptrs
    # the merged master keeps exactly one capture per SURT page
    assert sum(s["master_index"].values()) == n_pages
    assert s["authorities"], "HITS must surface at least one authority"
    # the pruned prefix scan returned rows while opening a subset of
    # the range-layout master's shard files
    ps = s["prefix_scan"]
    assert 0 < ps["n_rows"] < n_pages
    # range boundaries come from sampling: an unlucky run may leave a
    # partition empty, so pin <= n_shards rather than == n_shards
    assert 1 <= ps["files_opened"] <= ps["files_total"] <= 4
