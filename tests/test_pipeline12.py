"""Behavior tests for the batch-12 BPE trainer. Oracle parity at
sf0.001 is covered generically by test_oracle_parity; these pin the
algorithm itself against INDEPENDENT pure-Python implementations:

1. the wrapped-symbol ``replace`` merge application equals the
   classic greedy left-to-right merge pass (hypothesis-fuzzed,
   including same-symbol runs — the case naive space-separated
   replace gets wrong);
2. the full distributed trainer reproduces an independently written
   reference BPE trainer (word counts -> iterated pair argmax) on a
   tiny corpus, merge-for-merge and count-for-count.
"""

from __future__ import annotations

import os
import re
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from tests.test_pipeline10 import _write_docs


# --- independent reference implementation (no shared code with
# roapi_spark.functions.pipeline12: list-based, no string replace) ---

def _greedy_merge(syms: list[str], pair: tuple[str, str]) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_train(texts: list[str], n_merges: int):
    words = Counter()
    for t in texts:
        words.update(w for w in re.split(r"[^a-z]+", t.lower()) if w)
    vocab = {tuple(list(w) + ["#"]): c for w, c in words.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # tie-break: count DESC, then 'l|r' pair string ASC
        (lft, rgt), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]}|{kv[0][1]}")
        )
        merges.append((rank, lft, rgt, lft + rgt, cnt))
        vocab = {
            tuple(_greedy_merge(list(s), (lft, rgt))): c for s, c in vocab.items()
        }
    return merges, vocab


def _wrapped_replace_merge(syms: list[str], pair: tuple[str, str]) -> list[str]:
    """The production encoding: str.replace has the same left-to-right
    non-overlapping semantics as Spark's replace() and DuckDB's
    replace(), so this mirrors what both engines compute."""
    s = "," + ",,".join(syms) + ","
    s = s.replace(f",{pair[0]},,{pair[1]},", f",{pair[0]}{pair[1]},")
    return [x for x in s.split(",") if x]


@settings(max_examples=300, deadline=None)
@given(
    syms=st.lists(st.sampled_from(["a", "b", "ab", "aa", "c"]), min_size=1, max_size=12),
    pair=st.tuples(
        st.sampled_from(["a", "b", "ab", "aa", "c"]),
        st.sampled_from(["a", "b", "ab", "aa", "c"]),
    ),
)
def test_wrapped_replace_equals_greedy_merge(syms, pair):
    assert _wrapped_replace_merge(syms, pair) == _greedy_merge(syms, pair)


CORPUS = {
    "s0": ["the theme thesis", "low lower lowest", "the the the"],
    "s1": ["new newer newest", "wide wider widest", "low low lower"],
}


def test_trainer_matches_independent_reference(spark, tmp_path):
    from roapi_spark.functions.pipeline12 import bpe_train_state

    texts = [t for ts in CORPUS.values() for t in ts]
    d = _write_docs(tmp_path, CORPUS)
    got, _ = bpe_train_state(spark, d, n_merges=6)
    want, _ = _ref_train(texts, 6)
    assert got == want


def test_fertility_equals_reference_piece_counts(spark, tmp_path):
    from roapi_spark.functions.pipeline12 import (
        BPE_MERGES,
        text_bpe_fertility,
    )

    d = _write_docs(tmp_path, CORPUS)
    texts_by_src = {
        src: [w for t in ts for w in re.split(r"[^a-z]+", t.lower()) if w]
        for src, ts in CORPUS.items()
    }
    _, vocab = _ref_train([t for ts in CORPUS.values() for t in ts], BPE_MERGES)
    # piece count per surface word: strip the EOW marker to key by word
    np_by_word = {"".join(s)[:-1]: len(s) for s in vocab}
    out = {r.source: r for r in text_bpe_fertility(spark, d).collect()}
    for src, toks in texts_by_src.items():
        want_tokens = len(toks)
        want_pieces = sum(np_by_word[w] for w in toks)
        assert out[src].n_tokens == want_tokens
        assert out[src].n_pieces == want_pieces
        assert abs(out[src].fertility - want_pieces / want_tokens) < 1e-3


# --- fixed-point LR trainer ---


def _ref_lr(rows, n_iters, S=1024, half=512, lr_div=8.0, sig_div=4.0, clamp=16384):
    """Independent reference: plain-Python full-batch GD over explicit
    feature rows [(y, x0..x4)], mirroring the published fixed-point
    recipe (hard sigmoid, integer gradients) without any shared code."""
    import math

    D = 5
    w = [0] * D
    out = []
    for it in range(n_iters + 1):
        g = [0] * D
        ok = 0
        for y, *x in rows:
            u = sum(w[j] * x[j] for j in range(D))
            yh = min(S, max(0, half + math.floor(u / sig_div)))
            err = yh - y * S
            for j in range(D):
                g[j] += err * x[j]
            ok += 1 if (1 if yh >= half else 0) == y else 0
        out.append((it, *w, ok, len(rows)))
        w = [
            max(-clamp, min(clamp, w[j] - math.floor(g[j] / (len(rows) * lr_div))))
            for j in range(D)
        ]
    return out


def test_lr_trainer_matches_independent_reference(spark, tmp_path):
    from roapi_spark.functions.pipeline12 import _lr_features, lr_train_state

    corpus = {
        "a": ["the cat sat on the mat in a hat", "zzzz qqqq xxxx", "a b c d"],
        "b": ["the quick brown fox is it and of to in", "1234 5678 !!!", 
              "wonderful delightful marvellous extraordinary"],
    }
    d = _write_docs(tmp_path, corpus)
    feats = [
        (r.y, r.x0, r.x1, r.x2, r.x3, r.x4)
        for r in _lr_features(spark, d).collect()
    ]
    got = lr_train_state(spark, d, n_iters=4)
    want = _ref_lr(feats, 4)
    assert got == want


def test_lr_training_improves_accuracy(spark):
    from roapi_spark.functions.pipeline12 import lr_train_state

    rows = lr_train_state(spark, "/root/testdata/sf0.001")
    acc = [ok / n for (_, _, _, _, _, _, ok, n) in rows]
    assert acc[-1] > acc[0]  # GD learned something
    assert acc[-1] >= 0.85  # and the head distills the rule well


def test_bpe_served_paths_equal_recompute(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_CACHE_DIR", str(tmp_path / "cache"))
    from roapi_spark.functions.pipeline12 import (
        text_bpe_fertility,
        text_bpe_fertility_served,
        text_bpe_train,
        text_bpe_train_served,
    )

    d = _write_docs(tmp_path, CORPUS)
    assert (
        text_bpe_train_served(spark, d).collect()
        == text_bpe_train(spark, d).collect()
    )
    assert (
        text_bpe_fertility_served(spark, d).collect()
        == text_bpe_fertility(spark, d).collect()
    )
    # second call must be a pure artifact read (no retrain): drop the
    # in-process memo and verify the layout is reused, not rebuilt
    from roapi_spark.functions import pipeline12 as p12

    layout_before = p12.bpe_layout(spark, d)
    mtime = os.path.getmtime(os.path.join(layout_before, "merges.json"))
    p12._MEMO.clear()
    assert p12.bpe_layout(spark, d) == layout_before
    assert os.path.getmtime(os.path.join(layout_before, "merges.json")) == mtime


def test_encode_consistent_with_fertility_and_reference(spark, tmp_path, monkeypatch):
    """Encode is the per-doc view of the same tokenization: summing its
    piece counts per source must reproduce the fertility table, and the
    per-doc piece sequences must equal applying the reference trainer's
    final vocab word-by-word."""
    monkeypatch.setenv("SPARK_GRAFT_CACHE_DIR", str(tmp_path / "cache"))
    from roapi_spark.functions.pipeline12 import (
        BPE_MERGES,
        text_bpe_encode,
        text_bpe_fertility,
    )

    d = _write_docs(tmp_path, CORPUS)
    enc = text_bpe_encode(spark, d).collect()
    fert = {r.source: r for r in text_bpe_fertility(spark, d).collect()}
    # doc_id -> source mapping follows _write_docs insertion order
    src_of = {}
    i = 0
    for src, ts in CORPUS.items():
        for _ in ts:
            src_of[i] = src
            i += 1
    by_src: dict = {}
    for r in enc:
        by_src[src_of[r.doc_id]] = by_src.get(src_of[r.doc_id], 0) + r.n_pieces
    for src, row in fert.items():
        assert by_src[src] == row.n_pieces
    # independent reference: encode each doc word-by-word with _ref_train
    import hashlib

    _, vocab = _ref_train([t for ts in CORPUS.values() for t in ts], BPE_MERGES)
    pieces_of = {"".join(s)[:-1]: list(s) for s in vocab}
    texts = [t for ts in CORPUS.values() for t in ts]
    for r in enc:
        words = [w for w in re.split(r"[^a-z]+", texts[r.doc_id].lower()) if w]
        want = [p for w in words for p in pieces_of[w]]
        assert r.n_pieces == len(want)
        assert r.piece_hash == hashlib.md5(" ".join(want).encode()).hexdigest()


# --- ZORDER + stats skipping gate -------------------------------------------


def test_delta_zorder_serve_path_actually_skips_files(spark, tmp_path, monkeypatch):
    """q_delta_zorder must not degenerate into a full scan: after the
    Morton clustering, the two-column range predicate must prune a
    strict majority of the snapshot's files via add.stats, and the
    pruned candidate set must still reproduce the full filtered
    result exactly."""
    import roapi_spark.functions.snapshot as snap
    from roapi_spark.functions.pipeline12 import (
        _ZORDER_CK,
        _ZORDER_TP,
        _zordered_orders_table,
        q_delta_zorder,
    )
    from roapi_spark.sources.delta import snapshot_adds_pruned

    monkeypatch.setattr(
        snap, "cache_root", lambda: str(tmp_path / "cache")
    )
    sf_dir = "/root/testdata/sf0.001"
    path = _zordered_orders_table(spark, sf_dir)
    cand, skipped, cb, tb = snapshot_adds_pruned(
        path, {"o_custkey": _ZORDER_CK, "o_totalprice": _ZORDER_TP}
    )
    assert len(cand) + len(skipped) == 8
    assert len(skipped) >= 5, (len(cand), len(skipped))
    assert cb < tb
    # exactness: the pruned scan equals the raw-table filter
    want = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .filter(
            f"o_custkey BETWEEN {_ZORDER_CK[0]} AND {_ZORDER_CK[1]} "
            f"AND o_totalprice BETWEEN {_ZORDER_TP[0]} AND {_ZORDER_TP[1]}"
        )
        .count()
    )
    got = q_delta_zorder(spark, sf_dir).collect()[0]
    assert got.n_rows == want
