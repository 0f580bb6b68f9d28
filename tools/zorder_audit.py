"""ZORDER effectiveness audit: measured data-skipping win.

Builds an unclustered two-column table, measures how many files (and
bytes) a stats-aware reader must scan for a selective two-column
predicate, runs OPTIMIZE ZORDER (sinks/delta.py compact), and
re-measures. Also times the actual Spark scan over the pruned file
list vs the full list, so the row in docs/SCALE.md is a measured
end-to-end effect, not a stats-overlap argument.

Usage: python tools/zorder_audit.py [--rows N] [--files N]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--files", type=int, default=64)
    args = ap.parse_args()

    from roapi_spark.session import get_spark
    from roapi_spark.sinks.delta import compact, write_delta
    from roapi_spark.sources.delta import snapshot_adds_pruned

    spark = get_spark("zorder-audit")
    spark.range(1000).count()  # JVM warm

    root = tempfile.mkdtemp(prefix="zaudit-")
    path = os.path.join(root, "tbl")
    try:
        # x and y independent uniform in [0, 4096) — no accidental
        # correlation a single-key sort could exploit; payload pads the
        # rows so bytes-scanned is a meaningful axis
        df = spark.range(args.rows).selectExpr(
            "CAST(hash(id, 1) & 4095 AS BIGINT) AS x",
            "CAST(hash(id, 2) & 4095 AS BIGINT) AS y",
            "repeat(uuid(), 2) AS payload",
        )
        write_delta(df.repartition(args.files), path, mode="overwrite")

        pred = {"x": (1024, 1279), "y": (2048, 2303)}  # 1/16 x 1/16
        pred_sql = "x BETWEEN 1024 AND 1279 AND y BETWEEN 2048 AND 2303"

        def measure(label: str) -> dict:
            cand, skipped, cb, tb = snapshot_adds_pruned(path, pred)
            t0 = time.time()
            n = (
                spark.read.parquet(*cand).filter(pred_sql).count()
                if cand
                else 0
            )
            t_pruned = round(time.time() - t0, 2)
            t0 = time.time()
            n_full = (
                spark.read.parquet(*(cand + skipped)).filter(pred_sql).count()
            )
            t_full = round(time.time() - t0, 2)
            assert n == n_full, (n, n_full)
            return {
                "label": label,
                "files_scanned": len(cand),
                "files_skipped": len(skipped),
                "bytes_scanned_mb": round(cb / 1e6, 1),
                "bytes_total_mb": round(tb / 1e6, 1),
                "scan_pruned_s": t_pruned,
                "scan_full_s": t_full,
                "rows": n,
            }

        before = measure("unclustered")
        t0 = time.time()
        compact(spark, path, target_partitions=args.files, zorder_by=["x", "y"])
        optimize_s = round(time.time() - t0, 2)
        after = measure("zordered")

        print("| layout | files scanned/total | bytes scanned | scan (pruned) | scan (all files) |")
        print("|---|---|---|---|---|")
        for m in (before, after):
            tot = m["files_scanned"] + m["files_skipped"]
            print(
                f"| {m['label']} | {m['files_scanned']}/{tot} "
                f"| {m['bytes_scanned_mb']}/{m['bytes_total_mb']} MB "
                f"| {m['scan_pruned_s']} s | {m['scan_full_s']} s |"
            )
        print(json.dumps({
            "rows": args.rows,
            "predicate": pred_sql,
            "optimize_zorder_s": optimize_s,
            "before": before,
            "after": after,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
