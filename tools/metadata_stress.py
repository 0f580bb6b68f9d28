"""Metadata-scale stress for the delta maintenance paths (round 11).

RESTORE, VACUUM and the OPTIMIZE commit are driver-side log rewrites;
their data-plane cost is Spark's, but their metadata cost — log replay,
existence checks, action assembly, the commit write itself — is pure
Python and must stay flat-ish at the 100k-add snapshot scale the round-9
checkpoint-replay work was measured at (docs/SCALE.md "Checkpoint
replay"). This builds a synthetic table of N adds across C commits
(placeholder 1-byte .parquet files — RESTORE/VACUUM never read data) in
a head state where ~half the adds were rewritten since the restore
target, then times:

- restore_delta to version C/2 (replay + 100k isfile checks + a commit
  carrying ~N/2 removes + ~N/2 re-adds)
- vacuum keep_versions=1 (full-log replay + os.walk over N files)
- retention_keep_versions 168h (commitInfo timestamp scan)
- the OPTIMIZE commit's metadata half: snapshot_state at head + a
  100k-remove action assembly + atomic publish (the data rewrite is
  Spark-side and scale-tested elsewhere)

Usage: python tools/metadata_stress.py [--adds 100000] [--commits 100]
Prints a markdown table (for SCALE.md) + one JSON line.
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


def build_table(root: str, n_adds: int, n_commits: int) -> None:
    """v0..v(C-1): v0 adds the first N/2 files; each later commit
    removes a slice of the oldest still-active files and adds fresh
    ones (the compaction-churn shape), so the head and any mid-history
    version differ in ~half their file sets."""
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    per = n_adds // (2 * max(1, n_commits - 1))  # churn per commit
    half = n_adds // 2

    def add(i: int) -> dict:
        return {
            "add": {
                "path": f"part-{i:07d}.parquet",
                "partitionValues": {},
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
                "stats": json.dumps(
                    {
                        "numRecords": 10,
                        "minValues": {"id": i * 10},
                        "maxValues": {"id": i * 10 + 9},
                        "nullCount": {"id": 0},
                    }
                ),
            }
        }

    now = int(time.time() * 1000)
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        f.write(
            json.dumps({"commitInfo": {"timestamp": now, "operation": "WRITE"}})
            + "\n"
        )
        f.write(
            json.dumps(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            )
            + "\n"
        )
        f.write(
            json.dumps(
                {"metaData": {"id": "stress", "format": {"provider": "parquet"}}}
            )
            + "\n"
        )
        for i in range(half):
            f.write(json.dumps(add(i), separators=(",", ":")) + "\n")
    nxt = half
    oldest = 0
    for v in range(1, n_commits):
        with open(os.path.join(log, f"{v:020d}.json"), "w") as f:
            f.write(
                json.dumps(
                    {
                        "commitInfo": {
                            "timestamp": now + v,
                            "operation": "OPTIMIZE",
                        }
                    },
                    separators=(",", ":"),
                )
                + "\n"
            )
            for i in range(oldest, min(oldest + per, half)):
                f.write(
                    json.dumps(
                        {
                            "remove": {
                                "path": f"part-{i:07d}.parquet",
                                "deletionTimestamp": now + v,
                                "dataChange": False,
                            }
                        },
                        separators=(",", ":"),
                    )
                    + "\n"
                )
            oldest = min(oldest + per, half)
            for _ in range(per):
                f.write(json.dumps(add(nxt), separators=(",", ":")) + "\n")
                nxt += 1
    # every referenced file exists as a 1-byte placeholder
    for i in range(nxt):
        with open(os.path.join(root, f"part-{i:07d}.parquet"), "wb") as f:
            f.write(b"x")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--adds", type=int, default=100_000)
    ap.add_argument("--commits", type=int, default=100)
    args = ap.parse_args()

    from roapi_spark.sinks.delta import (
        _atomic_commit,
        restore_delta,
        retention_keep_versions,
        vacuum,
    )
    from roapi_spark.sources.delta import snapshot_raw_state

    root = os.path.join(tempfile.gettempdir(), "roapi_spark_metastress")
    shutil.rmtree(root, ignore_errors=True)
    t0 = time.time()
    build_table(root, args.adds, args.commits)
    t_build = time.time() - t0
    head = args.commits - 1
    target = head // 2

    rows: dict[str, float] = {"build_fixture": t_build}

    t0 = time.time()
    v = restore_delta(root, target)
    rows["restore_to_mid_history"] = time.time() - t0
    assert v == head + 1

    t0 = time.time()
    active, _meta = snapshot_raw_state(root, version=v)
    rows["snapshot_raw_state_json"] = time.time() - t0

    # OPTIMIZE's metadata half: snapshot replay + full-active-set
    # remove assembly + one add + atomic publish
    t0 = time.time()
    now = int(time.time() * 1000)
    actions = [
        {"commitInfo": {"timestamp": now, "operation": "OPTIMIZE"}}
    ]
    for p in sorted(active):
        actions.append(
            {
                "remove": {
                    "path": p,
                    "deletionTimestamp": now,
                    "dataChange": False,
                }
            }
        )
    actions.append(
        {
            "add": {
                "path": "compacted-0.parquet",
                "partitionValues": {},
                "size": 1,
                "modificationTime": 0,
                "dataChange": False,
            }
        }
    )
    with open(os.path.join(root, "compacted-0.parquet"), "wb") as f:
        f.write(b"x")
    v2 = _atomic_commit(root, v + 1, actions, [])
    rows["optimize_commit_metadata"] = time.time() - t0
    assert v2 == v + 1

    t0 = time.time()
    keep = retention_keep_versions(root, 168)
    rows["retention_hours_resolve"] = time.time() - t0
    assert keep >= 1

    t0 = time.time()
    deleted = vacuum(root, keep_versions=1)
    rows["vacuum_keep1"] = time.time() - t0

    print(f"| metric ({args.adds} adds, {args.commits} commits) | sec |")
    print("|---|---|")
    for k, s in rows.items():
        print(f"| {k} | {s:.2f} |")
    print(
        json.dumps(
            {
                "adds": args.adds,
                "commits": args.commits,
                "deleted_by_vacuum": len(deleted),
                **{k: round(s, 3) for k, s in rows.items()},
            }
        )
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
