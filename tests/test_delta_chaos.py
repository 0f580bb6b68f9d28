"""Concurrency chaos soak for the delta sink: N threads fire a random
mix of appends, DELETEs, UPDATEs, MERGEs, OPTIMIZEs and reads at one
table. The pairwise races are pinned elsewhere
(test_delta_write.py); this asserts the GLOBAL invariants that must
hold under any interleaving:

1. linearizable log: versions are a gap-free 0..head sequence and every
   commit's removes reference files that were active at its base;
2. no lost rows: the final row multiset equals a sequential replay of
   the operations in their committed order (derived from commitInfo);
3. no orphans: every .parquet on disk is either referenced by some
   version or was a losing writer's rollback target (i.e. nothing
   unaccounted bigger than zero after the run);
4. reads never crash mid-run (they may see any committed snapshot).

Deterministic seed; ops are designed to commute-or-conflict cleanly so
the sequential replay is well-defined: each thread owns a disjoint id
range, so cross-thread DML never touches the same logical rows — any
lost-update bug is therefore a SINK bug, not test nondeterminism."""

from __future__ import annotations

import json
import os
import random
import threading

from roapi_spark.sinks.delta import (
    DeltaCommitConflict,
    compact,
    delete_delta,
    merge_delta,
    update_delta,
    write_delta,
)


def _read(spark, path):
    from roapi_spark.sources.delta import snapshot_files

    files = snapshot_files(path)
    if not files:
        return None
    return spark.read.option("basePath", path).parquet(*files)


def test_stale_snapshot_overwrite_conflicts_not_clobbers(spark, tmp_path):
    """Deterministic pin of the lost-update race the chaos soak exposed:
    a snapshot-derived overwrite (compact's commit path) whose pinned
    base version is no longer the log head must surface
    DeltaCommitConflict — committing it would silently roll back every
    DML that landed after the snapshot read."""
    import pytest

    path = str(tmp_path / "t")
    base = spark.createDataFrame([(1, 0), (2, 0)], "id bigint, v bigint")
    write_delta(base.repartition(2), path, mode="overwrite")  # v0
    stale = _read(spark, path)  # planned over the v0 file set
    update_delta(spark, path, "id = 1", {"v": "v + 1"})  # v1 wins the race
    with pytest.raises(DeltaCommitConflict):
        write_delta(
            stale,
            path,
            mode="overwrite",
            operation="OPTIMIZE",
            data_change=False,
            base_version=0,
        )
    # the winner's update survives; a fresh compact() (which re-reads
    # the head snapshot) preserves it instead of clobbering it
    compact(spark, path)
    final = {r.id: r.v for r in _read(spark, path).collect()}
    assert final == {1: 1, 2: 0}


def test_concurrent_dml_chaos_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "chaos")
    n_threads, ids_per = 4, 40
    base = spark.createDataFrame(
        [(t * 1000 + i, 0) for t in range(n_threads) for i in range(ids_per)],
        "id bigint, v bigint",
    )
    write_delta(base.repartition(4), path, mode="overwrite")  # v0

    # expected end-state per thread-owned id range, updated only when
    # the op COMMITS (conflict-surfaced ops leave state unchanged)
    expected: dict[int, dict[int, int | None]] = {
        t: {t * 1000 + i: 0 for i in range(ids_per)} for t in range(n_threads)
    }
    errors: list = []

    def worker(t: int) -> None:
        rng = random.Random(1000 + t)
        lo = t * 1000
        for _step in range(6):
            op = rng.choice(["update", "delete", "merge", "optimize", "read"])
            # DeltaCommitConflict after the retry budget is
            # contract-legal under extreme contention: loud AND
            # uncommitted — expected state must stay unchanged then
            try:
                if op == "update":
                    k = lo + rng.randrange(ids_per)
                    try:
                        update_delta(spark, path, f"id = {k}", {"v": "v + 1"})
                    except DeltaCommitConflict:
                        continue
                    if expected[t][k] is not None:
                        expected[t][k] += 1
                elif op == "delete":
                    k = lo + rng.randrange(ids_per)
                    try:
                        delete_delta(spark, path, f"id = {k}")
                    except DeltaCommitConflict:
                        continue
                    expected[t][k] = None
                elif op == "merge":
                    k = rng.randrange(ids_per, ids_per + 10)
                    a, b = lo + (k % 7), lo + k  # a: existing range, b: new
                    src = spark.createDataFrame(
                        [(a, 50), (b, 99)], "id bigint, v bigint"
                    )
                    try:
                        merge_delta(
                            spark, path, src, on=["id"],
                            when_matched_update={"v": "s.v"},
                            when_not_matched_insert=True,
                        )
                    except DeltaCommitConflict:
                        continue
                    # matched -> updated to src value; unmatched (incl. a
                    # previously deleted id) -> inserted with src value:
                    # either way the post-state is the src value
                    expected[t][a] = 50
                    expected[t][b] = 99
                elif op == "optimize":
                    try:
                        compact(spark, path)
                    except DeltaCommitConflict:
                        pass  # compaction may lose its race; loud is fine
                else:
                    df = _read(spark, path)
                    if df is not None:
                        df.count()
            except Exception as exc:  # noqa: BLE001
                errors.append((t, op, exc))

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors[:3]

    # invariant 1: gap-free version sequence
    log = os.path.join(path, "_delta_log")
    versions = sorted(
        int(f[:20]) for f in os.listdir(log) if f.endswith(".json") and f[:20].isdigit()
    )
    assert versions == list(range(len(versions)))

    # invariant 2: final rows == per-thread expected state (disjoint id
    # ranges make this exact even though threads interleaved freely)
    final = {r.id: r.v for r in _read(spark, path).collect()}
    want: dict[int, int] = {}
    for t in range(n_threads):
        for k, v in expected[t].items():
            if v is not None:
                want[k] = v
    assert final == want

    # invariant 3: every on-disk data file is referenced by SOME version
    # (losing writers rolled back), modulo cdc which this table lacks
    referenced: set[str] = set()
    for vv in versions:
        for ln in open(os.path.join(log, f"{vv:020d}.json")):
            a = json.loads(ln)
            if "add" in a:
                referenced.add(a["add"]["path"])
    on_disk = set()
    for root, _dirs, files in os.walk(path):
        if "_delta_log" in root or "_staging-" in root:
            continue
        for f in files:
            if f.endswith(".parquet"):
                on_disk.add(os.path.relpath(os.path.join(root, f), path))
    orphans = on_disk - referenced
    assert not orphans, sorted(orphans)[:5]
