"""The corpus data card composes oracle-checked audit queries into one
markdown report + JSON summary."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_corpus_report_builds(spark):
    from corpus_report import build_report

    md, summary = build_report(spark, "/root/testdata/sf0.001")
    assert summary["n_docs"] == 500
    assert 0 < summary["keep_rate"] <= 1
    assert summary["langs"] >= 1 and summary["sources"] >= 1
    for section in ("# Corpus data card", "## Language mix",
                    "## Source mixture plan", "## Duplication",
                    "## Distributional health",
                    "## Train/val/test split (deterministic md5 buckets)",
                    "## Quantizer quality (k-means cells vs labels)",
                    "## Tokenizer (BPE, trained on this corpus)",
                    "## Quality head (fixed-point LR, distilled",
                    "MinHash estimator calibration"):
        assert section in md
    assert summary["lr_final_acc"] is not None
    assert summary["bpe_max_fertility"] is not None
    assert summary["pq_rerank_recall_at_5"] is not None
    assert summary["splits"] > 0
    assert summary["min_cell_purity"] is not None
    # the Zipf/Heaps numbers surfaced
    assert str(summary["zipf_slope"]) in md
    assert str(summary["heaps_beta"]) in md
