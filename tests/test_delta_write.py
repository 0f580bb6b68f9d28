"""Delta writer <-> pure-Python delta source round trip: versions,
time travel, overwrite semantics, partitioned layout, commit conflicts.
The writer's output must also satisfy the reader's protocol guard
(minReader 1 — no features required)."""

from __future__ import annotations

import json
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from roapi_spark.sinks.delta import (
    DeltaCommitConflict,
    DeltaWriteError,
    write_delta,
)
from roapi_spark.sources.delta import snapshot_state
from tests.conftest import spark  # noqa: F401


def _read(spark, path, **opt):
    from roapi_spark.config import TableSource
    from roapi_spark.sources.delta import to_dataframe

    ts = TableSource(name="t", uri=path, format="delta", option=opt)
    return to_dataframe(spark, ts)


@pytest.fixture()
def people(spark):
    return spark.createDataFrame(
        [(1, "ada", "uk"), (2, "linus", "fi"), (3, "guido", "nl")],
        "id bigint, name string, country string",
    )


def test_write_read_roundtrip_and_versions(spark, people, tmp_path):
    path = str(tmp_path / "tbl")
    assert write_delta(people, path, mode="overwrite") == 0
    got = {tuple(r) for r in _read(spark, path).collect()}
    assert got == {(1, "ada", "uk"), (2, "linus", "fi"), (3, "guido", "nl")}

    extra = spark.createDataFrame([(4, "grace", "us")], people.schema)
    assert write_delta(extra, path, mode="append") == 1
    assert _read(spark, path).count() == 4
    # time travel back to version 0
    assert _read(spark, path, version="0").count() == 3

    replacement = spark.createDataFrame([(9, "alan", "uk")], people.schema)
    assert write_delta(replacement, path, mode="overwrite") == 2
    assert [tuple(r) for r in _read(spark, path).collect()] == [(9, "alan", "uk")]
    # old snapshots intact after overwrite (nothing physically deleted)
    assert _read(spark, path, version="1").count() == 4


def test_partitioned_write_prunes_and_records_values(spark, people, tmp_path):
    path = str(tmp_path / "part")
    write_delta(people, path, mode="overwrite", partition_by=["country"])
    df = _read(spark, path)
    assert {r.country for r in df.collect()} == {"uk", "fi", "nl"}
    # hive layout on disk + partitionValues in the log
    assert os.path.isdir(os.path.join(path, "country=uk"))
    log = os.path.join(path, "_delta_log", f"{0:020d}.json")
    adds = [
        json.loads(ln)["add"]
        for ln in open(log)
        if '"add"' in ln and json.loads(ln).get("add")
    ]
    assert {a["partitionValues"]["country"] for a in adds} == {"uk", "fi", "nl"}
    # partition filter prunes to a single file scan
    one = df.filter(df.country == "fi")
    assert [r.name for r in one.collect()] == ["linus"]
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "country" in plan and "= fi" in plan


def test_append_schema_mismatch_is_loud(spark, people, tmp_path):
    path = str(tmp_path / "schema")
    write_delta(people, path)
    other = spark.createDataFrame([(1, 2.5)], "id bigint, score double")
    with pytest.raises(DeltaWriteError, match="schema mismatch"):
        write_delta(other, path, mode="append")
    write_delta(other, path, mode="overwrite")  # replace is allowed
    assert _read(spark, path).columns == ["id", "score"]


def test_commit_conflict_rolls_back(spark, people, tmp_path, monkeypatch):
    path = str(tmp_path / "race")
    write_delta(people, path)
    # simulate losing the race: this writer reads a stale log listing
    # (only v0), while another writer lands v1 before our O_EXCL create
    log = os.path.join(path, "_delta_log")
    open(os.path.join(log, f"{1:020d}.json"), "w").write("")
    import roapi_spark.sinks.delta as dw

    monkeypatch.setattr(dw, "_existing_versions", lambda _d: [0])
    before = {f for f in os.listdir(path) if f.endswith(".parquet")}
    with pytest.raises(DeltaCommitConflict):
        write_delta(people, path, mode="append")
    after = {f for f in os.listdir(path) if f.endswith(".parquet")}
    assert after == before  # losing writer's data files rolled back


def test_dml_conflict_on_intervening_commit(spark, people, tmp_path, monkeypatch):
    """A commit landing between the DML's provenance scan and its
    publish must never be silently built upon (the DML pins its
    snapshot version and commits at exactly snapshot+1 — its removes
    would reference a superseded file set). Since round 10 the loser
    resolves the conflict logically: it re-executes against the fresh
    snapshot and commits AFTER the winner, so the caller sees a clean
    success, the winner's rows survive, and the first attempt's staged
    files are rolled back (no orphans)."""
    import roapi_spark.sinks.delta as dw

    path = str(tmp_path / "dmlrace")
    write_delta(people, path)  # v0
    real = dw._relocate_staging
    fired = {"done": False}

    def racy(staging, dest):
        if not fired["done"]:
            fired["done"] = True
            extra = spark.createDataFrame([(4, "grace", "us")], people.schema)
            assert write_delta(extra, path, mode="append") == 1
        return real(staging, dest)

    monkeypatch.setattr(dw, "_relocate_staging", racy)
    # attempt 1 pins v0, loses the O_EXCL race to the append at v1,
    # re-executes on the v1 snapshot, and commits at v2
    assert dw.delete_delta(spark, path, "id = 2") == 2
    assert sorted(r.id for r in _read(spark, path).collect()) == [1, 3, 4]
    # no orphans: every parquet on disk is referenced by some log version
    # (the losing attempt's staged files were rolled back)
    referenced = set()
    log = os.path.join(path, "_delta_log")
    for v in range(3):
        for ln in open(os.path.join(log, f"{v:020d}.json")):
            a = json.loads(ln)
            if a.get("add"):
                referenced.add(os.path.basename(a["add"]["path"]))
    on_disk = {f for f in os.listdir(path) if f.endswith(".parquet")}
    assert on_disk <= referenced


def test_dml_conflict_surfaces_after_retry_budget(
    spark, people, tmp_path, monkeypatch
):
    """When every re-execution keeps losing (a hot-loop writer), the
    conflict still surfaces after _DML_MAX_RETRIES — resolution must
    not become an unbounded livelock."""
    import roapi_spark.sinks.delta as dw

    path = str(tmp_path / "dmlhot")
    write_delta(people, path)  # v0
    real = dw._relocate_staging
    state = {"i": 0}

    def always_racy(staging, dest):
        if not state.get("in"):  # the appender's own relocate re-enters
            state["in"] = True
            try:
                extra = spark.createDataFrame(
                    [(100 + state["i"], f"w{state['i']}", "xx")], people.schema
                )
                state["i"] += 1
                write_delta(extra, path, mode="append")
            finally:
                state["in"] = False
        return real(staging, dest)

    monkeypatch.setattr(dw, "_relocate_staging", always_racy)
    with pytest.raises(DeltaCommitConflict):
        dw.delete_delta(spark, path, "id = 2")
    assert state["i"] == dw._DML_MAX_RETRIES + 1  # one race per attempt


def test_concurrent_appenders_linearize(spark, people, tmp_path):
    """Real threads racing appends against one table: every writer must
    either commit a distinct version or surface DeltaCommitConflict —
    never silently drop or duplicate a commit. The final snapshot holds
    exactly the winners' rows (optimistic concurrency, O_EXCL commit)."""
    import threading

    path = str(tmp_path / "cc")
    write_delta(people, path)  # v0: 3 rows
    n_writers, results, errs = 6, [], []

    def append(i: int) -> None:
        df = spark.createDataFrame([(100 + i, f"w{i}", "xx")], people.schema)
        for _attempt in range(n_writers + 1):
            try:
                results.append(write_delta(df, path, mode="append"))
                return
            except DeltaCommitConflict:
                continue  # lost the race — re-read the log and retry
        errs.append(i)

    threads = [threading.Thread(target=append, args=(i,)) for i in range(n_writers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, f"writers exhausted retries: {errs}"
    # all 6 landed, each at a distinct version, log is gapless
    assert sorted(results) == [1, 2, 3, 4, 5, 6]
    got = _read(spark, path)
    assert got.count() == 3 + n_writers
    assert sorted(r.id for r in got.collect() if r.id >= 100) == [
        100 + i for i in range(n_writers)
    ]


def test_concurrent_disjoint_merges_both_commit(spark, tmp_path):
    """Two MERGEs racing on DISJOINT partitions must both commit without
    surfacing DeltaCommitConflict (r9 verdict item: delta-spark resolves
    logically and retries; we serialize the loser after the winner by
    re-execution). Final state = both merges applied, in some order."""
    import threading

    from roapi_spark.sinks.delta import merge_delta

    path = str(tmp_path / "disjoint")
    base = spark.createDataFrame(
        [(1, 10, "uk"), (2, 20, "uk"), (3, 30, "fi"), (4, 40, "fi")],
        "id bigint, score bigint, country string",
    )
    write_delta(base, path, mode="overwrite", partition_by=["country"])  # v0

    def upsert(country: str, rows, out, idx):
        src = spark.createDataFrame(
            rows, "id bigint, score bigint, country string"
        )
        try:
            out[idx] = merge_delta(
                spark,
                path,
                src,
                on=["id"],
                when_matched_update={"score": "s.score"},
                when_not_matched_insert=True,
            )
        except Exception as exc:  # noqa: BLE001
            out[idx] = exc

    results: list = [None, None]
    t1 = threading.Thread(
        target=upsert, args=("uk", [(1, 11, "uk"), (5, 50, "uk")], results, 0)
    )
    t2 = threading.Thread(
        target=upsert, args=("fi", [(3, 33, "fi"), (6, 60, "fi")], results, 1)
    )
    t1.start(), t2.start()
    t1.join(), t2.join()
    assert all(isinstance(r, int) for r in results), results
    assert sorted(results) == [1, 2]  # both committed, distinct versions
    got = {(r.id, r.score) for r in _read(spark, path).collect()}
    assert got == {(1, 11), (2, 20), (3, 33), (4, 40), (5, 50), (6, 60)}


def test_optimize_loses_race_to_merge_loudly(spark, people, tmp_path, monkeypatch):
    """OPTIMIZE (compaction) racing a MERGE that commits mid-compaction:
    the compaction's overwrite pinned its snapshot, so blindly
    publishing would erase the merge's rows — it must surface
    DeltaCommitConflict (and roll back its staged files), never lose
    rows silently. delta-spark raises ConcurrentWriteException on the
    same shape."""
    import roapi_spark.sinks.delta as dw
    from roapi_spark.sinks.delta import compact, merge_delta

    path = str(tmp_path / "optrace")
    write_delta(people, path)  # v0
    real = dw._relocate_staging
    fired = {"done": False}

    def racy(staging, dest):
        if not fired["done"]:
            fired["done"] = True
            # a MERGE lands between the compaction's scan and publish
            src = spark.createDataFrame([(1, "ada2", "zz"), (9, "nine", "zz")],
                                        people.schema)
            assert merge_delta(
                spark, path, src, on=["id"],
                when_matched_update={"name": "s.name"},
                when_not_matched_insert=True,
            ) == 1
        return real(staging, dest)

    monkeypatch.setattr(dw, "_relocate_staging", racy)
    with pytest.raises(DeltaCommitConflict):
        compact(spark, path)
    # merge's result intact, compaction rolled back, no orphans
    got = {(r.id, r.name) for r in _read(spark, path).select("id", "name").collect()}
    assert (1, "ada2") in got and (9, "nine") in got
    assert len(got) == people.count() + 1
    log = os.path.join(path, "_delta_log")
    referenced = set()
    for entry in os.listdir(log):
        if entry.endswith(".json"):
            for ln in open(os.path.join(log, entry)):
                a = json.loads(ln)
                if "add" in a:
                    referenced.add(a["add"]["path"])
    on_disk = {f for f in os.listdir(path) if f.endswith(".parquet")}
    assert on_disk <= referenced  # every surviving file is log-referenced


def test_merge_loses_race_to_optimize_serializes(spark, people, tmp_path, monkeypatch):
    """MERGE racing an OPTIMIZE that commits mid-merge: the merge's
    pinned commit loses the O_EXCL race and must RE-EXECUTE against the
    compacted snapshot (_serialize_after_winner) — both operations
    land, rows compose as if sequential."""
    import roapi_spark.sinks.delta as dw
    from roapi_spark.sinks.delta import compact, merge_delta

    path = str(tmp_path / "mrgrace")
    write_delta(people.repartition(3), path)  # v0, multiple files
    real = dw._relocate_staging
    fired = {"done": False}

    def racy(staging, dest):
        if not fired["done"]:
            fired["done"] = True
            assert compact(spark, path) == 1  # compaction wins v1
        return real(staging, dest)

    monkeypatch.setattr(dw, "_relocate_staging", racy)
    src = spark.createDataFrame([(1, "ada2", "zz"), (9, "nine", "zz")],
                                people.schema)
    v = merge_delta(
        spark, path, src, on=["id"],
        when_matched_update={"name": "s.name"},
        when_not_matched_insert=True,
    )
    assert v == 2  # serialized after the compaction
    got = {(r.id, r.name) for r in _read(spark, path).select("id", "name").collect()}
    assert (1, "ada2") in got and (9, "nine") in got
    assert len(got) == people.count() + 1


def test_vacuum_racing_restore_fails_loudly_not_silently(
    spark, people, tmp_path, monkeypatch
):
    """VACUUM racing a RESTORE that re-references a reclaimed file: if
    vacuum physically deletes the target files AFTER restore's
    existence check but BEFORE its commit, the table must fail LOUDLY
    on read (missing file), never serve a silently smaller row set.
    (Same hazard class as delta-spark, where VACUUM + time travel race
    unprotected; the invariant we pin is loud-not-wrong.)"""
    import roapi_spark.sinks.delta as dw
    from roapi_spark.sinks.delta import restore_delta, vacuum

    path = str(tmp_path / "vacrace")
    write_delta(people, path)  # v0
    write_delta(
        spark.createDataFrame([(7, "g", "zz")], people.schema),
        path,
        mode="overwrite",
    )  # v1: v0's files now dead
    real = dw._atomic_commit
    fired = {"done": False}

    def racy(p, version, actions, rels, **kw):
        if not fired["done"]:
            fired["done"] = True
            vacuum(path, keep_versions=1)  # reclaims v0-only files mid-restore
        return real(p, version, actions, rels, **kw)

    monkeypatch.setattr(dw, "_atomic_commit", racy)
    restore_delta(path, 0)  # passes its existence check, then loses the race
    with pytest.raises(Exception):  # noqa: B017 — any loud read error
        _read(spark, path).collect()


def test_concurrent_appends_auto_resolve(spark, people, tmp_path):
    """Appends read nothing, so racing appenders must ALL commit with no
    caller-side retry loop (delta-spark append semantics: the lost
    O_EXCL race re-points the same staged files at the new tail)."""
    import threading

    path = str(tmp_path / "autoapp")
    write_delta(people, path)  # v0
    n, results = 6, []

    def append(i: int) -> None:
        df = spark.createDataFrame([(200 + i, f"a{i}", "yy")], people.schema)
        results.append(write_delta(df, path, mode="append"))

    threads = [threading.Thread(target=append, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(results) == [1, 2, 3, 4, 5, 6]
    assert _read(spark, path).count() == 3 + n


def test_append_retry_surfaces_on_metadata_change(
    spark, people, tmp_path, monkeypatch
):
    """The append fast-path must NOT blind-recommit over an intervening
    metaData change (the schema may have moved): it rolls back and
    surfaces the conflict so the caller re-validates."""
    import roapi_spark.sinks.delta as dw

    path = str(tmp_path / "metarace")
    write_delta(people, path)  # v0
    real = dw._relocate_staging
    fired = {"done": False}

    def racy(staging, dest):
        rels = real(staging, dest)
        if not fired["done"]:
            fired["done"] = True
            # a schema-changing overwrite lands between stage and publish
            other = spark.createDataFrame([(1, 2.5)], "id bigint, v double")
            assert write_delta(other, path, mode="overwrite") == 1
        return rels

    monkeypatch.setattr(dw, "_relocate_staging", racy)
    before = {f for f in os.listdir(path) if f.endswith(".parquet")}
    with pytest.raises(DeltaCommitConflict):
        write_delta(people, path, mode="append")
    # loser's staged files rolled back; winner's overwrite intact
    after = {f for f in os.listdir(path) if f.endswith(".parquet")}
    v1_adds = {
        os.path.basename(json.loads(ln)["add"]["path"])
        for ln in open(os.path.join(path, "_delta_log", f"{1:020d}.json"))
        if '"add"' in ln and json.loads(ln).get("add")
    }
    assert after - before == v1_adds
    assert _read(spark, path).columns == ["id", "v"]


def test_append_retry_conflict_on_half_written_entry(
    spark, people, tmp_path, monkeypatch
):
    """Commit publish is a plain open('x')+write, so a concurrent
    writer's log entry can be observed half-written (invalid JSON). The
    append retry's metadata probe must treat that as a conflict — run
    the rollback and raise DeltaCommitConflict — not let
    JSONDecodeError escape past the staged-file cleanup."""
    import roapi_spark.sinks.delta as dw

    path = str(tmp_path / "halfrace")
    write_delta(people, path)  # v0
    log = os.path.join(path, "_delta_log")
    real = dw._relocate_staging
    fired = {"done": False}

    def racy(staging, dest):
        rels = real(staging, dest)
        if not fired["done"]:
            fired["done"] = True
            # a racing writer's v1 lands half-written (truncated JSON)
            # between this writer's staging and its O_EXCL publish
            open(os.path.join(log, f"{1:020d}.json"), "w").write('{"add":{"pa')
        return rels

    monkeypatch.setattr(dw, "_relocate_staging", racy)
    before = {f for f in os.listdir(path) if f.endswith(".parquet")}
    with pytest.raises(DeltaCommitConflict):
        write_delta(people, path, mode="append")
    after = {f for f in os.listdir(path) if f.endswith(".parquet")}
    assert after == before  # staged files rolled back, no orphans


def test_protocol_readable_by_any_reader(spark, people, tmp_path):
    path = str(tmp_path / "proto")
    write_delta(people, path)
    adds, meta = snapshot_state(path)
    assert len(adds) >= 1 and meta is not None
    first = [json.loads(ln) for ln in open(
        os.path.join(path, "_delta_log", f"{0:020d}.json"))]
    proto = next(a["protocol"] for a in first if "protocol" in a)
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}


def test_streaming_foreachbatch_to_delta(spark, tmp_path):
    """The standard streaming->lakehouse path: writeStream.foreachBatch
    appending each micro-batch as one atomic Delta version. Readers see
    whole batches only (no torn reads), and the log records one version
    per batch."""
    import json as _json

    from roapi_spark.streaming.events import stream_events

    src = tmp_path / "in"
    src.mkdir()
    rows1 = [
        {"event_id": 1, "ts": "2024-01-01T00:00:10", "user_id": 7,
         "event_type": "click", "value": 1.0, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01T00:00:40", "user_id": 8,
         "event_type": "view", "value": 2.0, "props": "{}"},
    ]
    (src / "b1.json").write_text("\n".join(_json.dumps(r) for r in rows1))
    table = str(tmp_path / "delta_out")

    def sink(batch_df, _batch_id):
        if batch_df.count():
            write_delta(batch_df, table, mode="append")

    q = (
        stream_events(spark, str(src))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _read(spark, table).count() == 2

    rows2 = [{"event_id": 3, "ts": "2024-01-01T00:01:10", "user_id": 9,
              "event_type": "click", "value": 5.0, "props": "{}"}]
    (src / "b2.json").write_text("\n".join(_json.dumps(r) for r in rows2))
    q2 = (
        stream_events(spark, str(src))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    df = _read(spark, table)
    assert {r.event_id for r in df.collect()} == {1, 2, 3}
    # one atomic version per non-empty micro-batch; v0 time-travel intact
    assert _read(spark, table, version="0").count() == 2


def test_checkpoint_bounds_replay(spark, people, tmp_path):
    """Classic parquet checkpoint: reader seeds from it instead of
    replaying every JSON commit — proven by deleting the pre-checkpoint
    commits (simulating log cleanup) and still reading correctly,
    including hive partitions whose partitionValues round-trip through
    parquet MAP columns."""
    from roapi_spark.sinks.delta import write_checkpoint

    path = str(tmp_path / "ckpt")
    write_delta(people, path, mode="overwrite", partition_by=["country"])
    extra = spark.createDataFrame([(4, "grace", "us")], people.schema)
    write_delta(extra, path, mode="append", partition_by=["country"])
    assert write_checkpoint(path) == 1

    log = os.path.join(path, "_delta_log")
    assert os.path.exists(os.path.join(log, f"{1:020d}.checkpoint.parquet"))
    # later commit on top of the checkpoint
    more = spark.createDataFrame([(5, "edsger", "nl")], people.schema)
    write_delta(more, path, mode="append", partition_by=["country"])

    # delete the checkpointed commits: only the checkpoint can seed now
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))
    df = _read(spark, path)
    assert {r.id for r in df.collect()} == {1, 2, 3, 4, 5}
    # partition pruning still works from checkpoint-sourced adds
    assert {r.name for r in df.filter(df.country == "nl").collect()} == {
        "guido", "edsger",
    }


def test_checkpoint_requires_full_history(spark, people, tmp_path):
    from roapi_spark.sinks.delta import write_checkpoint

    path = str(tmp_path / "gap")
    write_delta(people, path)
    write_delta(people, path, mode="append")
    os.remove(os.path.join(path, "_delta_log", f"{0:020d}.json"))
    with pytest.raises(DeltaWriteError, match="incomplete"):
        write_checkpoint(path)


def test_compaction_collapses_small_files(spark, people, tmp_path):
    """Per-batch appends -> many small files; compact() rewrites the
    snapshot as one atomic version with fewer files, values unchanged,
    history intact."""
    from roapi_spark.sinks.delta import compact

    path = str(tmp_path / "compact")
    write_delta(people, path)
    for i in range(4):
        one = spark.createDataFrame([(10 + i, f"u{i}", "us")], people.schema)
        write_delta(one, path, mode="append")
    before_files = len(
        [f for f in os.listdir(path) if f.endswith(".parquet")]
    )
    v = compact(spark, path, target_partitions=1)
    assert v == 5
    adds, _ = snapshot_state(path)
    assert len(adds) == 1 < before_files
    df = _read(spark, path)
    assert df.count() == 7
    # pre-compaction history intact
    assert _read(spark, path, version="4").count() == 7
    assert _read(spark, path, version="0").count() == 3


def test_stats_in_add_actions(spark, people, tmp_path):
    """Per-file stats (numRecords/min/max/nullCount) land in the log so
    real Delta readers can file-skip."""
    import json as _json

    path = str(tmp_path / "stats")
    write_delta(people, path)
    log = os.path.join(path, "_delta_log", f"{0:020d}.json")
    adds = [
        _json.loads(ln)["add"] for ln in open(log) if '"add"' in ln
    ]
    tot = 0
    for a in adds:
        assert a.get("stats"), a
        st = _json.loads(a["stats"])
        tot += st["numRecords"]
        if st["numRecords"]:
            assert st["minValues"]["id"] >= 1
            assert st["maxValues"]["id"] <= 3
    assert tot == 3


def test_vacuum_reclaims_only_expired_files(spark, people, tmp_path):
    from roapi_spark.sinks.delta import compact, vacuum

    path = str(tmp_path / "vac")
    write_delta(people, path)  # v0
    extra = spark.createDataFrame([(4, "grace", "us")], people.schema)
    write_delta(extra, path, mode="append")  # v1
    compact(spark, path, target_partitions=1)  # v2: v0/v1 files now dead
    deleted = vacuum(path, keep_versions=1)
    assert deleted  # the pre-compaction small files are gone
    df = _read(spark, path)
    assert df.count() == 4  # current snapshot untouched
    # time travel inside the retention window still works
    assert _read(spark, path, version="2").count() == 4
    # older than retention: loud failure, not silent wrong data
    with pytest.raises(Exception):
        _read(spark, path, version="0").collect()


def test_overwrite_matches_external_literal_eq_paths(spark, tmp_path):
    """ADVICE r4 (high): delta-spark/delta-rs store hive-partitioned add
    paths with a LITERAL '=' (e.g. 'date=2021-01-01/part-0.parquet').
    Remove actions must echo that stored string verbatim — re-quoting it
    to 'date%3D.../...' orphans the add forever and readers silently see
    old+new rows after an overwrite."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "ext")
    part_dir = os.path.join(path, "date=2021-01-01")
    os.makedirs(part_dir)
    pq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int64())}),
        os.path.join(part_dir, "part-0.parquet"),
    )
    schema_str = spark.createDataFrame([(1,)], "id bigint").schema.json()
    log_dir = os.path.join(path, "_delta_log")
    os.makedirs(log_dir)
    stored = "date=2021-01-01/part-0.parquet"  # literal '=', like delta-spark
    with open(os.path.join(log_dir, f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "ext-0", "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_str, "partitionColumns": ["date"],
            "configuration": {}, "createdTime": 0,
        }}) + "\n")
        f.write(json.dumps({"add": {
            "path": stored, "partitionValues": {"date": "2021-01-01"},
            "size": 1, "modificationTime": 0, "dataChange": True,
        }}) + "\n")

    new = spark.createDataFrame([(9,)], "id bigint")
    assert write_delta(new, path, mode="overwrite") == 1
    removes = [
        json.loads(ln)["remove"]["path"]
        for ln in open(os.path.join(log_dir, f"{1:020d}.json"))
        if '"remove"' in ln
    ]
    assert removes == [stored]  # exact stored string, not %3D-escaped
    # the reader must see ONLY the new rows
    assert [tuple(r) for r in _read(spark, path).collect()] == [(9,)]


def test_file_stats_all_null_row_group(tmp_path):
    """ADVICE r4 (medium): a row group with no min/max (all-null) must
    not be silently skipped — nullCount has to count its nulls, and
    min/max over the other groups is still file-complete (non-null
    domain unaffected)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from roapi_spark.sinks.delta import _file_stats

    f = str(tmp_path / "nulls.parquet")
    # two row groups: first all-null for x, second has values
    tbl = pa.table({"x": pa.array([None, None, 5, 7], pa.int64())})
    pq.write_table(tbl, f, row_group_size=2)
    st = json.loads(_file_stats(f))
    assert st["numRecords"] == 4
    assert st["nullCount"]["x"] == 2  # was 0 before the fix
    assert st["minValues"]["x"] == 5
    assert st["maxValues"]["x"] == 7


def test_build_once_heals_stale_partial(tmp_path):
    """ADVICE r4 (low): a pre-existing `out` dir WITHOUT its ready marker
    (crashed writer leftover) must not wedge build_once forever."""
    from roapi_spark.functions.snapshot import build_once

    out = str(tmp_path / "artifact")
    os.makedirs(out)
    with open(os.path.join(out, "partial.bin"), "w") as f:
        f.write("junk")  # stale partial, no _SUCCESS

    def ready(d):
        return os.path.exists(os.path.join(d, "_SUCCESS"))

    def build(tmp):
        os.makedirs(tmp, exist_ok=True)
        with open(os.path.join(tmp, "_SUCCESS"), "w"):
            pass

    assert build_once(out, ready, build) == out
    assert ready(out)
    assert not os.path.exists(os.path.join(out, "partial.bin"))


# ---- external-writer fixture (committed, never regenerated) ---------------

_EXT_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "delta_external", "events_by_cat"
)


def test_external_delta_rs_fixture_reads(spark):
    """A COMMITTED partitioned table whose _delta_log replicates delta-rs
    output conventions: percent-encoded add paths (protocol: RFC 2396),
    literal '=' partition dirs, a partition value containing a space,
    delta-rs commitInfo/stats shapes. Pins the reader's path decoding
    forever, independent of this repo's own writer."""
    df = _read(spark, _EXT_FIXTURE)
    rows = sorted((r["id"], r["v"], r["cat"]) for r in df.collect())
    assert rows == [
        (1, 10.5, "plain"), (2, 20.5, "plain"), (3, 30.5, "a b"),
        (4, 40.5, "plain"),
    ]
    # time travel to the first delta-rs commit
    v0 = _read(spark, _EXT_FIXTURE, version=0)
    assert sorted(r["id"] for r in v0.collect()) == [1, 2, 3]
    # partition pruning works against the space-valued hive dir
    pruned = df.filter(df.cat == "a b")
    assert [r["id"] for r in pruned.collect()] == [3]


def test_external_fixture_overwrite_echoes_stored_paths(spark, tmp_path):
    """Overwriting the external table must emit remove actions echoing the
    STORED strings verbatim — 'cat=a%20b/...' stays percent-encoded,
    'cat=plain/...' stays literal; re-quoting either orphans the add and
    readers silently see old+new rows (the r4 high-severity bug class)."""
    import shutil

    path = str(tmp_path / "ext")
    shutil.copytree(_EXT_FIXTURE, path)
    new = spark.createDataFrame([(9, 9.5, "z")], "id bigint, v double, cat string")
    version = write_delta(new, path, mode="overwrite", partition_by=["cat"])
    assert version == 2
    removes = sorted(
        json.loads(ln)["remove"]["path"]
        for ln in open(os.path.join(path, "_delta_log", f"{2:020d}.json"))
        if '"remove"' in ln
    )
    assert removes == [
        "cat=a%20b/part-00000-bbb.parquet",
        "cat=plain/part-00000-aaa.parquet",
        "cat=plain/part-00001-ccc.parquet",
    ]
    assert [tuple(r) for r in _read(spark, path).collect()] == [(9, 9.5, "z")]
    # and history remains time-travelable across the writer boundary
    v1 = _read(spark, path, version=1)
    assert sorted(r["id"] for r in v1.collect()) == [1, 2, 3, 4]


# --- row-level DML: MERGE / UPDATE / DELETE (copy-on-write) ---


def _versions(path):
    return sorted(
        int(f[:20])
        for f in os.listdir(os.path.join(path, "_delta_log"))
        if f.endswith(".json")
    )


def test_delete_rewrites_only_touched_files(spark, people, tmp_path):
    from roapi_spark.sinks.delta import delete_delta

    path = str(tmp_path / "del")
    # two files: ids 1-3 and 4-6 (append creates a second file set)
    write_delta(people.repartition(1), path, mode="overwrite")
    extra = spark.createDataFrame(
        [(4, "grace", "us"), (5, "edsger", "nl"), (6, "ken", "us")], people.schema
    )
    write_delta(extra.repartition(1), path, mode="append")
    v = delete_delta(spark, path, "country = 'us'")
    assert v == 2
    got = sorted(r.id for r in _read(spark, path).collect())
    assert got == [1, 2, 3, 5]
    # the untouched file (ids 1-3) must NOT have been rewritten
    log = open(os.path.join(path, "_delta_log", f"{v:020d}.json")).read()
    acts = [json.loads(x) for x in log.splitlines()]
    removed = [a["remove"]["path"] for a in acts if "remove" in a]
    assert len(removed) == 1  # only the file containing 'us' rows
    # time travel to pre-delete still sees all six
    assert _read(spark, path, version="1").count() == 6


def test_update_applies_set_exprs_to_matching_rows(spark, people, tmp_path):
    from roapi_spark.sinks.delta import update_delta

    path = str(tmp_path / "upd")
    write_delta(people, path, mode="overwrite")
    update_delta(
        spark, path, "id >= 2", {"name": "upper(name)", "id": "id + 100"}
    )
    got = {(r.id, r.name) for r in _read(spark, path).collect()}
    assert got == {(1, "ada"), (102, "LINUS"), (103, "GUIDO")}


def test_merge_update_delete_insert_one_commit(spark, people, tmp_path):
    from roapi_spark.sinks.delta import merge_delta

    path = str(tmp_path / "mrg")
    write_delta(people, path, mode="overwrite")
    source = spark.createDataFrame(
        [
            (1, "ada lovelace", "uk"),   # matched -> update
            (2, "linus", "fi"),          # matched -> delete (country fi)
            (7, "barbara", "us"),        # not matched -> insert
        ],
        people.schema,
    )
    v = merge_delta(
        spark,
        path,
        source,
        on=["id"],
        when_matched_update={"name": "s.name"},
        when_matched_delete="t.country = 'fi'",
        when_not_matched_insert=True,
    )
    assert v == 1
    got = {(r.id, r.name, r.country) for r in _read(spark, path).collect()}
    assert got == {
        (1, "ada lovelace", "uk"),
        (3, "guido", "nl"),
        (7, "barbara", "us"),
    }
    # exactly one commit for the whole MERGE; pre-merge snapshot intact
    assert _versions(path) == [0, 1]
    assert _read(spark, path, version="0").count() == 3


def test_merge_on_partitioned_table_keeps_layout(spark, people, tmp_path):
    from roapi_spark.sinks.delta import merge_delta

    path = str(tmp_path / "mrgpart")
    write_delta(people, path, mode="overwrite", partition_by=["country"])
    source = spark.createDataFrame(
        [(3, "guido v", "nl"), (8, "rob", "us")], people.schema
    )
    merge_delta(spark, path, source, on=["id"], when_matched_update={"name": "s.name"})
    df = _read(spark, path)
    got = {(r.id, r.name, r.country) for r in df.collect()}
    assert got == {
        (1, "ada", "uk"),
        (2, "linus", "fi"),
        (3, "guido v", "nl"),
        (8, "rob", "us"),
    }
    # inserted row landed in hive layout (partition pruning still works)
    assert os.path.isdir(os.path.join(path, "country=us"))


def test_merge_duplicate_source_keys_is_loud(spark, people, tmp_path):
    from roapi_spark.sinks.delta import merge_delta

    path = str(tmp_path / "mrgdup")
    write_delta(people, path, mode="overwrite")
    dup = spark.createDataFrame(
        [(1, "x", "aa"), (1, "y", "bb")], people.schema
    )
    with pytest.raises(DeltaWriteError, match="duplicate merge keys"):
        merge_delta(spark, path, dup, on=["id"])


def test_merge_insert_requires_full_schema(spark, people, tmp_path):
    from roapi_spark.sinks.delta import merge_delta

    path = str(tmp_path / "mrgschema")
    write_delta(people, path, mode="overwrite")
    partial = spark.createDataFrame([(9,)], "id bigint")
    with pytest.raises(DeltaWriteError, match="missing"):
        merge_delta(spark, path, partial, on=["id"], when_not_matched_insert=True)
    # update-only merge with a partial source is fine
    v = merge_delta(
        spark, path, partial, on=["id"],
        when_matched_update=None, when_not_matched_insert=False,
    )
    assert v == 1 and _read(spark, path).count() == 3


def test_dml_refuses_deletion_vector_tables(spark, tmp_path):
    # rewriting a DV-masked file without honoring the mask would
    # resurrect deleted rows — must be a loud refusal, not data loss
    from roapi_spark.sinks.delta import delete_delta
    from roapi_spark.sources.deletion_vectors import write_dv_file
    from tests.test_deletion_vectors import _META, _PROTO, _add, _commit, _mk_table

    root = _mk_table(tmp_path)
    dv = write_dv_file(str(root / "dv1.bin"), [1, 3])
    _commit(root, 0, [_PROTO, _META, _add("part-0.parquet", dv)])
    with pytest.raises(DeltaWriteError, match="deletion vectors"):
        delete_delta(spark, str(root), "true")


def test_zorder_compaction_enables_two_dimensional_skipping(spark, tmp_path):
    """After OPTIMIZE ZORDER BY (x, y), per-file min/max stats must let
    a reader skip files for point predicates on BOTH columns — the
    property a plain single-key sort cannot give the trailing key."""
    from roapi_spark.sinks.delta import compact, write_delta

    path = str(tmp_path / "z")
    n = 8192
    df = spark.range(n).selectExpr(
        "id % 97 AS x", "CAST((id * 37) % 89 AS BIGINT) AS y", "id AS payload"
    )
    # write unclustered (hash-shuffled) so the baseline has no locality
    write_delta(df.repartition(8), path, mode="overwrite")

    def skippable(pred_col, lo, hi):
        acts = []
        log_dir = os.path.join(path, "_delta_log")
        last = sorted(f for f in os.listdir(log_dir) if f.endswith(".json"))[-1]
        alive = {}
        for f in sorted(x for x in os.listdir(log_dir) if x.endswith(".json")):
            for line in open(os.path.join(log_dir, f)):
                a = json.loads(line)
                if "add" in a:
                    alive[a["add"]["path"]] = a["add"]
                elif "remove" in a:
                    alive.pop(a["remove"]["path"], None)
        total, skip = 0, 0
        for add in alive.values():
            st = json.loads(add["stats"])
            total += 1
            if st["maxValues"][pred_col] < lo or st["minValues"][pred_col] > hi:
                skip += 1
        return skip, total

    sx0, t0 = skippable("x", 10, 20)
    sy0, _ = skippable("y", 10, 20)
    compact(spark, path, target_partitions=8, zorder_by=["x", "y"])
    sx1, t1 = skippable("x", 10, 20)
    sy1, _ = skippable("y", 10, 20)
    assert t1 == 8
    # unclustered baseline: every file spans the whole domain — no skips
    assert sx0 == 0 and sy0 == 0
    # z-ordered: BOTH dimensions skip files for a narrow range predicate
    assert sx1 >= 2 and sy1 >= 2, (sx1, sy1)
    # contents unchanged
    from roapi_spark.config import TableSource
    from roapi_spark.sources.delta import to_dataframe

    ts = TableSource(name="zt", uri=path, format="delta", option={})
    out = to_dataframe(spark, ts)
    assert out.count() == n
    assert out.agg({"payload": "sum"}).collect()[0][0] == n * (n - 1) // 2


def test_snapshot_adds_pruned_skips_by_stats(spark, tmp_path):
    """File-level data skipping from add.stats: a range-sorted write
    gives disjoint per-file ranges, so a selective predicate must prune
    most files — and never a file that holds matching rows."""
    from roapi_spark.sinks.delta import write_delta
    from roapi_spark.sources.delta import snapshot_adds_pruned

    path = str(tmp_path / "sk")
    df = spark.range(10_000).selectExpr("id AS k", "id % 7 AS v")
    write_delta(df.repartitionByRange(10, "k"), path, mode="overwrite")

    cand, skipped, cb, tb = snapshot_adds_pruned(path, {"k": (4000, 4400)})
    assert len(cand) + len(skipped) == 10 and len(skipped) >= 8
    assert 0 < cb < tb
    # correctness: candidates alone reproduce the full filtered result
    got = (
        spark.read.parquet(*cand)
        .filter("k BETWEEN 4000 AND 4400")
        .count()
    )
    assert got == 401
    # open ranges + unknown columns never skip wrongly
    cand2, _, _, _ = snapshot_adds_pruned(path, {"k": (9999, None)})
    assert spark.read.parquet(*cand2).filter("k >= 9999").count() == 1
    cand3, skipped3, _, _ = snapshot_adds_pruned(path, {"nope": (1, 2)})
    assert len(cand3) == 10 and not skipped3


def test_snapshot_adds_pruned_honors_version(spark, tmp_path):
    """Time travel: pruning at version=0 sees the pre-overwrite file
    set, at HEAD the post-overwrite one — file lists must come from the
    same snapshot the reader would scan."""
    from roapi_spark.sinks.delta import write_delta
    from roapi_spark.sources.delta import snapshot_adds_pruned

    path = str(tmp_path / "tt")
    v0 = spark.range(1_000).selectExpr("id AS k")
    write_delta(v0.repartitionByRange(4, "k"), path, mode="overwrite")
    v1 = spark.range(1_000, 3_000).selectExpr("id AS k")
    write_delta(v1.repartitionByRange(4, "k"), path, mode="overwrite")

    c0, s0, _, _ = snapshot_adds_pruned(path, {"k": (0, 100)}, version=0)
    c1, s1, _, _ = snapshot_adds_pruned(path, {"k": (0, 100)})
    assert len(c0) + len(s0) == 4 and len(c1) + len(s1) == 4
    assert spark.read.parquet(*c0).filter("k <= 100").count() == 101
    assert len(c1) == 0  # post-overwrite table holds no k <= 100 at all
    assert not set(c0) & {f for f in s1 + c1}  # disjoint physical files


def test_snapshot_adds_pruned_uses_checkpoint_stats(spark, tmp_path):
    """Once a checkpoint seeds the snapshot, the pruner must harvest
    add.stats from the CHECKPOINT rows (json replay starts after it) —
    otherwise every pre-checkpoint file silently becomes un-skippable."""
    from roapi_spark.sinks.delta import write_checkpoint, write_delta
    from roapi_spark.sources.delta import snapshot_adds_pruned

    path = str(tmp_path / "ckpt")
    df = spark.range(8_000).selectExpr("id AS k")
    write_delta(df.repartitionByRange(8, "k"), path, mode="overwrite")
    extra = spark.range(8_000, 12_000).selectExpr("id AS k")
    write_delta(extra.repartitionByRange(4, "k"), path, mode="append")
    assert write_checkpoint(path) == 1
    # post-checkpoint commit too: adds must merge from both sources
    more = spark.range(12_000, 13_000).selectExpr("id AS k").coalesce(1)
    write_delta(more, path, mode="append")

    cand, skipped, cb, tb = snapshot_adds_pruned(path, {"k": (2000, 2900)})
    assert len(cand) + len(skipped) == 13
    # only ~1/8th of the v0 range matches; checkpointed stats must skip
    # the other v0 files AND all v1/v2 files
    assert len(skipped) >= 10, (len(cand), len(skipped))
    assert (
        spark.read.parquet(*cand).filter("k BETWEEN 2000 AND 2900").count()
        == 901
    )


def test_snapshot_adds_pruned_skips_null_only_files(spark, tmp_path):
    """A file whose column is ALL NULL (min/max absent, nullCount ==
    numRecords) must be skipped for any bounded range on that column —
    NULL satisfies no comparison. Files with a mere stats gap (unknown
    coverage) must stay candidates."""
    from roapi_spark.sinks.delta import write_delta
    from roapi_spark.sources.delta import snapshot_adds_pruned

    path = str(tmp_path / "nulls")
    full = spark.range(100).selectExpr("id AS k", "CAST(id AS BIGINT) AS v")
    nul = spark.range(100, 200).selectExpr(
        "id AS k", "CAST(NULL AS BIGINT) AS v"
    )
    write_delta(full.coalesce(1), path, mode="overwrite")
    write_delta(nul.coalesce(1), path, mode="append")

    cand, skipped, _, _ = snapshot_adds_pruned(path, {"v": (0, 50)})
    assert len(cand) == 1 and len(skipped) == 1
    assert spark.read.parquet(*cand).filter("v BETWEEN 0 AND 50").count() == 51
    # half-open ranges constrain the column too: still skippable
    c2, s2, _, _ = snapshot_adds_pruned(path, {"v": (None, 10)})
    assert len(s2) == 1
    # an unconstrained (None, None) range can never skip
    c3, s3, _, _ = snapshot_adds_pruned(path, {"v": (None, None)})
    assert len(c3) == 2 and not s3


def test_snapshot_adds_pruned_refuses_deletion_vectors(tmp_path):
    """snapshot_adds_pruned returns bare candidate paths — a table with
    deletion vectors cannot be served through it (callers scan the
    candidates directly and would resurrect deleted rows). It must
    raise, pointing at the DV-applying read path."""
    import json as _json

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from roapi_spark.sources.delta import LoadError, snapshot_adds_pruned
    from roapi_spark.sources.deletion_vectors import write_dv_file

    root = tmp_path / "dvprune"
    (root / "_delta_log").mkdir(parents=True)
    _pq.write_table(_pa.table({"id": list(range(10))}), root / "p0.parquet")
    dv = write_dv_file(str(root / "dv.bin"), [1, 3])
    actions = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        },
        {"metaData": {"id": "m", "format": {"provider": "parquet"}}},
        {
            "add": {
                "path": "p0.parquet",
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
                "deletionVector": dv,
            }
        },
    ]
    (root / "_delta_log" / f"{0:020d}.json").write_text(
        "\n".join(_json.dumps(a) for a in actions)
    )
    with pytest.raises(LoadError, match="deletion vector"):
        snapshot_adds_pruned(str(root), {"id": (0, 5)})


@pytest.fixture(scope="module")
def pruning_table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("prune") / "tbl")
    df = spark.range(20_000).selectExpr(
        "CAST(hash(id, 7) & 1023 AS BIGINT) AS a",
        "CAST(hash(id, 8) & 1023 AS BIGINT) AS b",
    )
    from roapi_spark.sinks.delta import compact, write_delta

    write_delta(df.repartition(16), path, mode="overwrite")
    compact(spark, path, target_partitions=16, zorder_by=["a", "b"])
    return path


@settings(max_examples=60, deadline=None)
@given(
    a_lo=st.integers(0, 1023), a_w=st.integers(0, 200),
    b_lo=st.integers(0, 1023), b_w=st.integers(0, 200),
    open_a=st.booleans(),
)
def test_pruning_never_skips_a_matching_file(pruning_table, a_lo, a_w, b_lo, b_w, open_a):
    """Property: for ANY conjunctive range, a skipped file contains no
    matching row (verified row-by-row via pyarrow), and candidates +
    skipped partition the snapshot. Pruning may be conservative, never
    eager."""
    import pyarrow.parquet as pq

    from roapi_spark.sources.delta import snapshot_adds_pruned

    ranges = {
        "a": (None, a_lo + a_w) if open_a else (a_lo, a_lo + a_w),
        "b": (b_lo, b_lo + b_w),
    }
    cand, skipped, cb, tb = snapshot_adds_pruned(pruning_table, ranges)
    assert len(cand) + len(skipped) == 16
    assert 0 <= cb <= tb
    for f in skipped:
        t = pq.read_table(f, columns=["a", "b"])
        a, b = t.column("a").to_pylist(), t.column("b").to_pylist()
        hit = any(
            (ranges["a"][0] is None or x >= ranges["a"][0])
            and x <= ranges["a"][1]
            and ranges["b"][0] <= y <= ranges["b"][1]
            for x, y in zip(a, b)
        )
        assert not hit, f"skipped file {f} holds a matching row"


def test_zorder_rejects_partitioned_and_non_numeric(spark, tmp_path):
    from roapi_spark.sinks.delta import compact, write_delta

    p1 = str(tmp_path / "zp")
    df = spark.createDataFrame(
        [(1, "a", "uk"), (2, "b", "fi")], "id bigint, name string, country string"
    )
    write_delta(df, p1, mode="overwrite", partition_by=["country"])
    with pytest.raises(DeltaWriteError, match="unpartitioned"):
        compact(spark, p1, zorder_by=["id"])
    p2 = str(tmp_path / "zs")
    write_delta(df, p2, mode="overwrite")
    with pytest.raises(DeltaWriteError, match="numeric"):
        compact(spark, p2, zorder_by=["name"])


# ---- review-hardening regressions (delta.py single-file audit) --------------


def test_append_type_mismatch_rejected(spark, people, tmp_path):
    """Append schema check must compare TYPES, not just names — a
    name-only check commits mixed physical types and every later read
    fails on merge-incompatible parquet."""
    path = str(tmp_path / "typed")
    write_delta(people, path)
    bad = spark.createDataFrame(
        [("5", "x", "de")], "id string, name string, country string"
    )
    with pytest.raises(DeltaWriteError, match="append schema mismatch"):
        write_delta(bad, path, mode="append")


def test_vacuum_spares_young_orphans_reclaims_old(spark, people, tmp_path):
    """A never-committed parquet younger than the orphan grace window
    must survive vacuum (it may be an in-flight writer's relocated
    staging); an old one is reclaimed; files a committed version once
    referenced are reclaimed regardless of age."""
    from roapi_spark.sinks.delta import compact, vacuum

    path = str(tmp_path / "vac2")
    write_delta(people, path)  # v0
    compact(spark, path, target_partitions=1)  # v1: v0 files now dead
    young = os.path.join(path, "part-inflight.c000.parquet")
    with open(young, "wb") as f:
        f.write(b"PAR1not-really-parquet")
    old = os.path.join(path, "part-crashed.c000.parquet")
    with open(old, "wb") as f:
        f.write(b"PAR1old-orphan")
    os.utime(old, (1, 1))  # ancient mtime
    deleted = vacuum(path, keep_versions=1)
    assert os.path.exists(young), "young orphan must survive the grace"
    assert not os.path.exists(old), "aged orphan must be reclaimed"
    assert any("part-crashed" in d for d in deleted)
    assert any(d.startswith("part-") and "crashed" not in d and
               "inflight" not in d for d in deleted), (
        "v0's superseded committed files must be reclaimed regardless of age"
    )


def test_zorder_by_date_column(spark, tmp_path):
    """zorder over a DATE column must work (DATE->DOUBLE is an illegal
    cast in Spark; days-since-epoch ranks identically)."""
    from roapi_spark.sinks.delta import compact

    df = spark.sql(
        "SELECT id, date_add(date'2026-01-01', CAST(id AS INT)) AS d "
        "FROM range(100)"
    )
    path = str(tmp_path / "zd")
    write_delta(df, path)
    compact(spark, path, target_partitions=2, zorder_by=["d", "id"])
    assert _read(spark, path).count() == 100


def test_dml_on_path_with_space(spark, people, tmp_path):
    """_metadata.file_path is URI-encoded; DML provenance lookups must
    resolve through the encoding for paths with encodable characters."""
    from roapi_spark.sinks.delta import delete_delta

    path = str(tmp_path / "my table")
    write_delta(people, path)
    assert delete_delta(spark, path, "id = 2") == 1
    got = sorted(r["id"] for r in _read(spark, path).collect())
    assert got == [1, 3]


def test_restore_timestamp_honors_explicit_offset(spark, people, tmp_path):
    """version_at_timestamp must convert aware timestamps, not
    overwrite their offset with UTC."""
    from roapi_spark.sinks.delta import version_at_timestamp

    path = str(tmp_path / "tz")
    write_delta(people, path)  # v0
    # pin v0's commitInfo timestamp to a known instant: 10:00 UTC
    log = os.path.join(path, "_delta_log", f"{0:020d}.json")
    lines = open(log).read().splitlines()
    out = []
    for ln in lines:
        a = json.loads(ln)
        if "commitInfo" in a:
            a["commitInfo"]["timestamp"] = 1786960800000  # 2026-08-17T10:00Z
        out.append(json.dumps(a, separators=(",", ":")))
    with open(log, "w") as f:
        f.write("\n".join(out) + "\n")
    # 12:00+02:00 IS 10:00 UTC -> v0 eligible (boundary inclusive)
    assert version_at_timestamp(path, "2026-08-17T12:00:00+02:00") == 0
    # 11:00+02:00 is 09:00 UTC -> before the commit: must raise, but the
    # broken replace() form would read it as 11:00 UTC and wrongly match
    with pytest.raises(DeltaWriteError, match="no delta commit"):
        version_at_timestamp(path, "2026-08-17T11:00:00+02:00")


def test_cdc_partitioned_layout_and_values(spark, tmp_path):
    """cdc files of a partitioned CDF table must land in hive layout
    with real partitionValues (spec: readers rebuild partition columns
    from partitionValues exactly as for adds), and the CDF read must
    see the partition column populated."""
    from roapi_spark.sinks.delta import delete_delta
    from roapi_spark.sources.delta import table_changes

    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "c", "y")],
        "id bigint, name string, pt string",
    )
    path = str(tmp_path / "cdcpart")
    write_delta(
        df, path, partition_by=["pt"],
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    delete_delta(spark, path, "id = 2")
    log = os.path.join(path, "_delta_log", f"{1:020d}.json")
    cdc_actions = [
        json.loads(ln)["cdc"] for ln in open(log) if '"cdc"' in ln
    ]
    assert cdc_actions, "CDF table DELETE must emit cdc actions"
    for a in cdc_actions:
        assert a["partitionValues"] == {"pt": "y"}
        assert "/pt=y/" in "/" + a["path"]
    chg = table_changes(spark, path, 1, 1).collect()
    assert [(r["id"], r["pt"], r["_change_type"]) for r in chg] == [
        (2, "y", "delete")
    ]


def test_set_properties_never_downgrades_protocol(spark, people, tmp_path):
    """An unrelated property set on a CDF-enabled table whose protocol
    is already >= writer v4 (e.g. a foreign (3,7) feature table) must
    not rewrite the protocol down to (1,4)."""
    from roapi_spark.sinks.delta import _atomic_commit, set_table_properties

    path = str(tmp_path / "proto")
    write_delta(
        people, path,
        configuration={"delta.enableChangeDataFeed": "true"},
    )  # v0 publishes (1,4) for CDF
    # simulate a foreign upgrade to a feature protocol
    _atomic_commit(
        path, 1,
        [{"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": [], "writerFeatures": ["changeDataFeed"],
        }}],
        [],
    )
    v = set_table_properties(path, {"foo": "bar"})
    entry = os.path.join(path, "_delta_log", f"{v:020d}.json")
    protos = [json.loads(ln) for ln in open(entry) if '"protocol"' in ln]
    assert protos == [], f"no protocol rewrite expected, got {protos}"


def test_merge_inserts_duplicate_unmatched_source_keys(spark, people, tmp_path):
    """Duplicate source keys that match NO target row are a legal MERGE
    (both insert, delta-spark semantics); only duplicates matching a
    target row are ambiguous."""
    from roapi_spark.sinks.delta import merge_delta

    path = str(tmp_path / "mrg")
    write_delta(people, path)
    src = spark.createDataFrame(
        [(99, "dup1", "aa"), (99, "dup2", "bb")], people.schema
    )
    merge_delta(spark, path, src, on=["id"], when_matched_update={},
                when_not_matched_insert=True)
    got = sorted(
        (r["id"], r["name"]) for r in _read(spark, path).collect()
    )
    assert (99, "dup1") in got and (99, "dup2") in got
    # a duplicate that DOES match a target row is still rejected
    bad = spark.createDataFrame(
        [(1, "x", "aa"), (1, "y", "bb")], people.schema
    )
    with pytest.raises(DeltaWriteError, match="duplicate merge keys"):
        merge_delta(spark, path, bad, on=["id"],
                    when_matched_update={"name": "s.name"})


def test_commit_entries_never_visible_partially(spark, people, tmp_path):
    """The log entry must appear under its final name COMPLETE: a
    lost-race conflict leaves no tmp debris and no truncated version
    file behind."""
    from roapi_spark.sinks.delta import _atomic_commit

    path = str(tmp_path / "atomic")
    write_delta(people, path)  # v0
    with pytest.raises(DeltaCommitConflict):
        _atomic_commit(path, 0, [{"commitInfo": {"timestamp": 0}}], [])
    log_dir = os.path.join(path, "_delta_log")
    names = sorted(os.listdir(log_dir))
    assert not any(n.endswith(".tmp") for n in names), names
    for n in names:
        if n.endswith(".json"):
            assert os.path.getsize(os.path.join(log_dir, n)) > 0
