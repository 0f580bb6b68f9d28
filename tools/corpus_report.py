"""Generate a corpus data card — the report a training-data team leads
with — by composing the registered audit operators over one sf_dir:

  volume + language mix        q_token_fertility
  source mixture plan          q_mixture_allocation
  quality gate                 text_quality_logit (keep rate)
  duplication                  q_dedup_rate_by_source, q_dup_cluster_sizes,
                               q_dedup_method_agreement
  distributional health        q_zipf_slope, q_heaps_law

Usage:  python tools/corpus_report.py [sf_dir] [out.md]
Writes markdown and prints one JSON summary line. Every number comes
from an oracle-checked registry query — the report is exactly as
trustworthy as the correctness gate.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_report(spark, sf_dir: str) -> tuple[str, dict]:
    from pyspark.sql import functions as F

    from roapi_spark.plans.registry import load_all

    specs = load_all()

    def run(name):
        return [r.asDict() for r in specs[name].builder(spark, sf_dir).collect()]

    fert = sorted(run("q_token_fertility"), key=lambda r: r["lang"])
    mix = sorted(run("q_mixture_allocation"), key=lambda r: r["source"])
    quality = run("text_quality_logit")
    n_docs = len(quality)
    n_keep = sum(1 for r in quality if r["keep"])
    dup_rate = sorted(run("q_dedup_rate_by_source"), key=lambda r: r["source"])
    clusters = sorted(run("q_dup_cluster_sizes"), key=lambda r: r["cluster_size"])
    agreement = {r["bucket"]: r["n_pairs"] for r in run("q_dedup_method_agreement")}
    zipf = run("q_zipf_slope")[0]
    heaps = run("q_heaps_law")[0]
    packing = run("q_packing_efficiency")
    recall = run("q_ann_recall")[0]
    recall_np = run("q_ann_recall_nprobe")[0]
    recall_lshm = run("q_lsh_multi_recall")[0]
    recall_pq = run("q_pq_recall")[0]
    recall_pqr = run("q_pq_rerank_recall")[0]
    bpe_merges = run("text_bpe_train_served")
    bpe_fert = sorted(run("text_bpe_fertility_served"), key=lambda r: r["source"])
    lr_traj = sorted(run("q_quality_lr_train"), key=lambda r: r["it"])
    lr_eval = sorted(run("q_quality_lr_eval"), key=lambda r: r["source"])
    splits = run("q_hash_split")
    purity = run("q_cluster_purity")
    calib = run("q_minhash_calibration")
    # q_curation_funnel is a superset of q_dedup_funnel (doc stages +
    # token stage) — run the doc-stage shuffles once, not twice
    cfunnel = run("q_curation_funnel")[0]
    leakage = run("q_split_leakage")
    dsir = sorted(run("q_dsir_weights"), key=lambda r: r["source"])
    shards = run("q_token_budget_shards")
    shard_mix = run("q_shard_mixture")
    dup_bias = {r["is_dup"]: r for r in run("q_dup_quality_bias")}
    span = specs["dedup_span_rewrite"].builder(spark, sf_dir).agg(
        F.sum("n_tokens").alias("n_tokens"), F.sum("n_kept").alias("n_kept")
    ).collect()[0]
    tok_cmp = sorted(run("text_tokenizer_compare"), key=lambda r: r["source"])
    crawl = run("q_crawl_funnel")[0]

    lines = [
        f"# Corpus data card — `{sf_dir}`",
        "",
        f"**Documents:** {n_docs}  |  **Quality keep rate:** "
        f"{n_keep}/{n_docs} ({100.0 * n_keep / max(n_docs, 1):.1f}%)",
        "",
        "## Language mix / tokenizer fertility",
        "",
        "| lang | docs | tokens | bytes/token | tokens/doc |",
        "|---|---|---|---|---|",
        *[
            f"| {r['lang']} | {r['n_docs']} | {r['n_tokens']} | "
            f"{r['bytes_per_token']} | {r['tokens_per_doc']} |"
            for r in fert
        ],
        "",
        "## Source mixture plan (sqrt-temperature weights)",
        "",
        "| source | docs | tokens | weight | alloc tokens | epochs |",
        "|---|---|---|---|---|---|",
        *[
            f"| {r['source']} | {r['n_docs']} | {r['n_tokens']} | "
            f"{r['weight']} | {r['alloc_tokens']} | {r['epochs']} |"
            for r in mix
        ],
        "",
        "## Crawl ingest funnel (WARC -> corpus)",
        "",
        f"{crawl['n_fetched']} fetched -> {crawl['n_ok']} HTTP 200 -> "
        f"{crawl['n_html']} text/html -> {crawl['n_text']} past the "
        f"extraction length gate -> {crawl['n_unique']} unique pages "
        "(canonical-URL dedup)",
        "",
        "## Tokenizer selection (fertility: pieces per unit, lower fits better)",
        "",
        "| source | BPE | unigram | unigram/BPE |",
        "|---|---|---|---|",
        *[
            f"| {r['source']} | {r['bpe_fertility']} | "
            f"{r['unigram_fertility']} | {r['uni_over_bpe']} |"
            for r in tok_cmp
        ],
        "",
        "## Duplication",
        "",
        f"Funnel: {cfunnel['n_docs']} docs -> {cfunnel['n_after_exact']} "
        f"exact-unique -> {cfunnel['n_after_near']} after near-dup "
        f"({cfunnel['n_after_near'] / max(cfunnel['n_docs'], 1):.2%} kept); "
        f"of the survivors' "
        f"{cfunnel['tokens_total']} tokens, {cfunnel['tokens_shipped']} "
        f"({cfunnel['pct_tokens_kept']:.2%}) survive the span rewrite",
        "",
        "| source | docs | exact-dup rate |",
        "|---|---|---|",
        *[
            f"| {r['source']} | {r.get('n_docs', '')} | {r.get('dup_rate', '')} |"
            for r in dup_rate
        ],
        "",
        "Cluster sizes (near-dup components): "
        + ", ".join(
            f"{r['cluster_size']}-clusters x {r['n_clusters']}" for r in clusters
        ),
        "",
        f"LSH vs exact-Jaccard pair agreement: both={agreement.get('both', 0)}, "
        f"lsh_only={agreement.get('lsh_only', 0)}, "
        f"jaccard_only={agreement.get('jaccard_only', 0)} (recall misses)",
        "",
        f"Exact-substring rewrite (Lee et al. removal step): "
        f"{span['n_kept']}/{span['n_tokens']} tokens survive "
        f"({100.0 * span['n_kept'] / max(span['n_tokens'], 1):.1f}%)",
        "",
        "Near-dup quality bias (candidate-pair members vs unique docs): "
        + ", ".join(
            f"{'dup' if k else 'unique'}: {v['n_docs']} docs, "
            f"avg {v['avg_tokens']} tokens, TTR {v['avg_ttr']}"
            for k, v in sorted(dup_bias.items())
        ),
        "",
        "MinHash estimator calibration (est bucket -> exact Jaccard):",
        "",
        "| est decile | pairs | mean exact | mean abs err |",
        "|---|---|---|---|",
        *[
            f"| {r['est_bucket']} | {r['n_pairs']} | {r['mean_exact']} | "
            f"{r['mean_abs_err']} |"
            for r in calib
        ],
        "",
        "## Train/val/test split (deterministic md5 buckets)",
        "",
        "| split | source | docs | tokens |",
        "|---|---|---|---|",
        *[
            f"| {r['split']} | {r['source']} | {r['n_docs']} | {r['n_tokens']} |"
            for r in splits
        ],
        "",
        "Near-dup pairs by split cell (cross-split cells are leakage — "
        "fix by splitting on dedup-cluster, not doc): "
        + (
            ", ".join(
                f"{r['split_a']}x{r['split_b']}={r['n_pairs']}" for r in leakage
            )
            or "none"
        ),
        "",
        "## DSIR selection weights (target domain: src0)",
        "",
        "| source | docs | avg weight | target-like rate |",
        "|---|---|---|---|",
        *[
            f"| {r['source']} | {r['n_docs']} | {r['avg_weight']} | "
            f"{r['sel_rate']} |"
            for r in dsir
        ],
        "",
        "## Shard manifest (md5-ordered, 4096-token budget)",
        "",
        f"{len(shards)} shards; docs/shard "
        f"{min(r['n_docs'] for r in shards)}-{max(r['n_docs'] for r in shards)}, "
        f"tokens/shard {min(r['n_tokens'] for r in shards)}-"
        f"{max(r['n_tokens'] for r in shards)}; source entropy/shard "
        f"{min(r['source_entropy'] for r in shard_mix)}-"
        f"{max(r['source_entropy'] for r in shard_mix)} nats "
        f"(sources/shard {min(r['n_sources'] for r in shard_mix)}-"
        f"{max(r['n_sources'] for r in shard_mix)})",
        "",
        "## Packing (concat-and-chunk, per source)",
        "",
        "| source | packs | straddle frac | last-pack fill |",
        "|---|---|---|---|",
        *[
            f"| {r['source']} | {r['n_packs']} | {r['straddle_frac']} | "
            f"{r['last_pack_fill']} |"
            for r in sorted(packing, key=lambda r: r["source"])
        ],
        "",
        "## Distributional health",
        "",
        f"- Zipf slope (top vocab): **{zipf['zipf_slope']}** "
        f"(r2={zipf['r2']}; natural text ~ -1)",
        f"- Heaps beta (vocab growth): **{heaps['heaps_beta']}** "
        f"(r2={heaps['r2']}; natural text ~ 0.4-0.6 — a flat curve means "
        "templated/synthetic text)",
        f"- ANN recall@5 vs exact: IVF single-probe "
        f"**{recall['recall_at_5']}**, multi-probe "
        f"**{recall_np['recall_at_5']}** (the nprobe dial); "
        f"multi-table LSH {recall_lshm['recall_at_5']}, "
        f"PQ-ADC {recall_pq['recall_at_5']} -> "
        f"**{recall_pqr['recall_at_5']}** with exact re-ranking "
        "(the refine knob) — the per-family frontier",
        "",
        "## Tokenizer (BPE, trained on this corpus)",
        "",
        "First learned merges (rank: left+right, weighted pair count):",
        "",
        "> "
        + ", ".join(
            f"{m['merge_rank']}: {m['lft']}+{m['rgt']} ({m['pair_count']})"
            for m in bpe_merges
        ),
        "",
        "Per-source subword fertility (pieces per word token; high = the",
        "shard fragments under this vocabulary, i.e. domain mismatch):",
        "",
        "| source | tokens | pieces | fertility |",
        "|---|---|---|---|",
        *[
            f"| {r['source']} | {r['n_tokens']} | {r['n_pieces']} | "
            f"{r['fertility']} |"
            for r in bpe_fert
        ],
        "",
        "## Quality head (fixed-point LR, distilled from the rule label)",
        "",
        "Training trajectory (full-batch GD, bit-exact across engines): "
        + " -> ".join(f"{r['acc']}" for r in lr_traj),
        "",
        "| source | docs | pred-positive rate | agreement with rule |",
        "|---|---|---|---|",
        *[
            f"| {r['source']} | {r['n_docs']} | {r['pred_pos_rate']} | "
            f"{r['agreement']} |"
            for r in lr_eval
        ],
        "",
        "## Quantizer quality (k-means cells vs labels)",
        "",
        "| cell | members | labels | purity | entropy |",
        "|---|---|---|---|---|",
        *[
            f"| {r['cid']} | {r['n_members']} | {r['n_labels']} | "
            f"{r['purity']} | {r['label_entropy']} |"
            for r in purity
        ],
        "",
    ]
    summary = {
        "crawl_unique_pages": crawl["n_unique"],
        "uni_over_bpe_mean": round(
            sum(r["uni_over_bpe"] for r in tok_cmp) / max(len(tok_cmp), 1), 4
        ),
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "keep_rate": round(n_keep / max(n_docs, 1), 4),
        "langs": len(fert),
        "sources": len(mix),
        "zipf_slope": zipf["zipf_slope"],
        "heaps_beta": heaps["heaps_beta"],
        "lsh_recall_misses": agreement.get("jaccard_only", 0),
        "ann_recall_at_5": recall["recall_at_5"],
        "splits": len(splits),
        "min_cell_purity": min((r["purity"] for r in purity), default=None),
        "minhash_mean_abs_err": max(
            (r["mean_abs_err"] for r in calib), default=None
        ),
        "cross_split_leak_pairs": sum(
            r["n_pairs"] for r in leakage if r["split_a"] != r["split_b"]
        ),
        "span_survival_rate": round(
            span["n_kept"] / max(span["n_tokens"], 1), 4
        ),
        "n_shards": len(shards),
        "pq_rerank_recall_at_5": recall_pqr["recall_at_5"],
        "bpe_max_fertility": max(
            (r["fertility"] for r in bpe_fert), default=None
        ),
        "lr_final_acc": lr_traj[-1]["acc"] if lr_traj else None,
    }
    return "\n".join(lines), summary


def main() -> None:
    from roapi_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("corpus-report")
    md, summary = build_report(spark, sf_dir)
    if out:
        with open(out, "w") as f:
            f.write(md)
    else:
        print(md)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
