"""Hudi loader: pure-Python timeline replay over a hand-built .hoodie
layout (public Hudi spec — completed commits, replacecommit,
requested/inflight skipping, as-of time travel, hive partition columns)
plus the merge-on-read path: deltacommit log files merged into the
snapshot view (latest-instant-wins upserts, _hoodie_is_deleted soft
deletes, rollback command blocks), read_optimized view serving base
files only, and incremental queries surfacing log-only commits."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from roapi_spark.config import parse_table_config, sniff_format
from roapi_spark.sources import LoadError, load_table


def _commit(meta_dir, instant, stats, replaced=None, kind="commit"):
    body = {"partitionToWriteStats": stats}
    if replaced:
        body["partitionToReplaceFileIds"] = replaced
    (meta_dir / f"{instant}.{kind}").write_text(json.dumps(body))


def _base_file(root, partition, file_id, instant, rows):
    name = f"{file_id}_0-1-0_{instant}.parquet"
    d = root / partition if partition else root
    d.mkdir(parents=True, exist_ok=True)
    pq.write_table(pa.table(rows), d / name)
    return (f"{partition}/{name}" if partition else name)


@pytest.fixture(scope="module")
def hudi_table(tmp_path_factory):
    root = tmp_path_factory.mktemp("hudi") / "trips"
    meta = root / ".hoodie"
    meta.mkdir(parents=True)
    (meta / "hoodie.properties").write_text(
        "hoodie.table.name=trips\nhoodie.table.type=COPY_ON_WRITE\n"
    )
    # t1: two file groups across two hive partitions
    p1 = _base_file(root, "region=eu", "fg1", "001", {"id": [1, 2], "fare": [10.0, 20.0]})
    p2 = _base_file(root, "region=us", "fg2", "001", {"id": [3], "fare": [30.0]})
    _commit(meta, "001", {"region=eu": [{"fileId": "fg1", "path": p1}],
                          "region=us": [{"fileId": "fg2", "path": p2}]})
    # t2: update rewrites file group fg1 (CoW: whole new base file)
    p1b = _base_file(root, "region=eu", "fg1", "002", {"id": [1, 2], "fare": [11.0, 21.0]})
    _commit(meta, "002", {"region=eu": [{"fileId": "fg1", "path": p1b}]})
    # t3: replacecommit (clustering) replaces fg2 with fg3
    p3 = _base_file(root, "region=us", "fg3", "003", {"id": [3, 4], "fare": [30.0, 40.0]})
    _commit(meta, "003", {"region=us": [{"fileId": "fg3", "path": p3}]},
            replaced={"region=us": ["fg2"]}, kind="replacecommit")
    # an incomplete write must be invisible
    (meta / "004.commit.requested").write_text("")
    (meta / "004.inflight").write_text("")
    return root


def _load(spark, cfg):
    return load_table(spark, parse_table_config(cfg))


def test_hudi_latest_read_optimized_view(spark, hudi_table):
    df = _load(spark, {"name": "t", "uri": str(hudi_table)})
    rows = {r["id"]: r for r in df.collect()}
    assert sorted(rows) == [1, 2, 3, 4]
    assert rows[1]["fare"] == 11.0  # the t2 rewrite of fg1 wins
    assert rows[4]["fare"] == 40.0  # the replacement group's rows
    assert rows[1]["region"] == "eu" and rows[3]["region"] == "us"


def test_hudi_time_travel(spark, hudi_table):
    at1 = _load(spark, {"name": "t", "uri": str(hudi_table),
                        "option": {"as_of_instant": "001"}})
    rows = {r["id"]: r["fare"] for r in at1.collect()}
    assert rows == {1: 10.0, 2: 20.0, 3: 30.0}
    at2 = _load(spark, {"name": "t", "uri": str(hudi_table),
                        "option": {"as_of_instant": "002"}})
    rows2 = {r["id"]: r["fare"] for r in at2.collect()}
    assert rows2 == {1: 11.0, 2: 21.0, 3: 30.0}


def test_hudi_sniffed_from_hoodie_dir(hudi_table):
    assert sniff_format(str(hudi_table)) == "hudi"
    ts = parse_table_config({"name": "t", "uri": str(hudi_table)})
    assert ts.resolved_format() == "hudi"


# ---- merge-on-read -------------------------------------------------------

_MOR_SCHEMA = {
    "type": "record",
    "name": "trip",
    "fields": [
        {"name": "_hoodie_record_key", "type": "string"},
        {"name": "id", "type": "long"},
        {"name": "fare", "type": "double"},
        {"name": "_hoodie_is_deleted", "type": "boolean"},
    ],
}


def _rec(key, id_, fare, deleted=False):
    return {"_hoodie_record_key": key, "id": id_, "fare": fare,
            "_hoodie_is_deleted": deleted}


def _log_file(root, file_id, base_instant, instant, records, version=1):
    from roapi_spark.sources.hudi_log import (
        AVRO_DATA_BLOCK, H_INSTANT_TIME, write_log_block,
    )

    name = f".{file_id}_{base_instant}.log.{version}_0-1-0"
    blob = write_log_block(
        AVRO_DATA_BLOCK, {H_INSTANT_TIME: instant}, records, _MOR_SCHEMA
    )
    (root / name).write_bytes(blob)
    return name


@pytest.fixture(scope="module")
def mor_table(tmp_path_factory):
    root = tmp_path_factory.mktemp("hudi_mor") / "trips"
    meta = root / ".hoodie"
    meta.mkdir(parents=True)
    (meta / "hoodie.properties").write_text(
        "hoodie.table.name=trips\nhoodie.table.type=MERGE_ON_READ\n"
    )
    # 001: base file with three rows (keys k1..k3)
    p1 = _base_file(root, "", "fg1", "001", {
        "_hoodie_record_key": ["k1", "k2", "k3"],
        "id": [1, 2, 3],
        "fare": [10.0, 20.0, 30.0],
        "_hoodie_is_deleted": [False, False, False],
    })
    _commit(meta, "001", {"": [{"fileId": "fg1", "path": p1}]})
    # 002: deltacommit — update k1, insert k4, soft-delete k2
    l1 = _log_file(root, "fg1", "001", "002", [
        _rec("k1", 1, 11.0), _rec("k4", 4, 40.0), _rec("k2", 2, 20.0, True),
    ])
    _commit(meta, "002", {"": [{"fileId": "fg1", "path": l1}]}, kind="deltacommit")
    # 003: second deltacommit — update k1 again (latest must win over 002)
    l2 = _log_file(root, "fg1", "001", "003", [_rec("k1", 1, 12.0)], version=2)
    _commit(meta, "003", {"": [{"fileId": "fg1", "path": l2}]}, kind="deltacommit")
    return root


def test_hudi_mor_snapshot_merges_log_upserts(spark, mor_table):
    df = _load(spark, {"name": "t", "uri": str(mor_table)})
    rows = {r["_hoodie_record_key"]: r["fare"] for r in df.collect()}
    # k1 updated twice (latest=12.0), k2 soft-deleted, k3 untouched, k4 new
    assert rows == {"k1": 12.0, "k3": 30.0, "k4": 40.0}


def test_hudi_mor_read_optimized_view_is_base_only(spark, mor_table):
    df = _load(spark, {"name": "t", "uri": str(mor_table),
                       "option": {"mor_view": "read_optimized"}})
    rows = {r["_hoodie_record_key"]: r["fare"] for r in df.collect()}
    assert rows == {"k1": 10.0, "k2": 20.0, "k3": 30.0}


def test_hudi_mor_compaction_absorbs_logs(spark, mor_table, tmp_path):
    """A compaction (.commit base rewrite) at 004 absorbs the 002/003
    logs; a later deltacommit 005 applies on top of the new base."""
    import shutil

    root = tmp_path / "trips2"
    shutil.copytree(mor_table, root)
    meta = root / ".hoodie"
    p2 = _base_file(root, "", "fg1", "004", {
        "_hoodie_record_key": ["k1", "k3", "k4"],
        "id": [1, 3, 4],
        "fare": [12.0, 30.0, 40.0],
        "_hoodie_is_deleted": [False, False, False],
    })
    _commit(meta, "004", {"": [{"fileId": "fg1", "path": p2}]})
    l3 = _log_file(root, "fg1", "004", "005", [_rec("k5", 5, 50.0)], version=3)
    _commit(meta, "005", {"": [{"fileId": "fg1", "path": l3}]}, kind="deltacommit")
    df = _load(spark, {"name": "t", "uri": str(root)})
    rows = {r["_hoodie_record_key"]: r["fare"] for r in df.collect()}
    assert rows == {"k1": 12.0, "k3": 30.0, "k4": 40.0, "k5": 50.0}
    # time travel to 004 sees the compacted base without the 005 delta
    at4 = _load(spark, {"name": "t", "uri": str(root),
                        "option": {"as_of_instant": "004"}})
    assert {r["_hoodie_record_key"] for r in at4.collect()} == {"k1", "k3", "k4"}


def test_hudi_mor_rollback_command_voids_target_instant(spark, mor_table, tmp_path):
    """A rollback COMMAND block appended to the log neutralizes the
    blocks of its target instant (public failed-write recovery)."""
    import shutil

    from roapi_spark.sources.hudi_log import (
        COMMAND_BLOCK, H_COMMAND_BLOCK_TYPE, H_INSTANT_TIME,
        H_TARGET_INSTANT_TIME, ROLLBACK_COMMAND, write_log_block,
    )

    root = tmp_path / "trips3"
    shutil.copytree(mor_table, root)
    # append a rollback of instant 003 onto the second log file
    target = root / ".fg1_001.log.2_0-1-0"
    target.write_bytes(
        target.read_bytes()
        + write_log_block(COMMAND_BLOCK, {
            H_INSTANT_TIME: "004",
            H_TARGET_INSTANT_TIME: "003",
            H_COMMAND_BLOCK_TYPE: ROLLBACK_COMMAND,
        })
    )
    df = _load(spark, {"name": "t", "uri": str(root)})
    rows = {r["_hoodie_record_key"]: r["fare"] for r in df.collect()}
    # the 003 update of k1 is voided; the 002 update (11.0) survives
    assert rows == {"k1": 11.0, "k3": 30.0, "k4": 40.0}


def test_hudi_mor_incremental_sees_log_only_commits(spark, mor_table):
    df = _load(spark, {"name": "t", "uri": str(mor_table),
                       "option": {"format": "hudi", "incremental_from": "001"}})
    rows = sorted(
        (r["_commit_instant"], r["_hoodie_record_key"], r["fare"])
        for r in df.collect()
    )
    assert rows == [
        ("002", "k1", 11.0), ("002", "k2", 20.0), ("002", "k4", 40.0),
        ("003", "k1", 12.0),
    ]


def test_hudi_log_block_roundtrip_and_truncation():
    from roapi_spark.sources.hudi_log import (
        AVRO_DATA_BLOCK, H_INSTANT_TIME, HudiLogError, merged_records,
        read_log_file, write_log_block,
    )

    recs = [_rec("a", 1, 1.5), _rec("b", 2, 2.5)]
    blob = write_log_block(AVRO_DATA_BLOCK, {H_INSTANT_TIME: "007"}, recs, _MOR_SCHEMA)
    blocks = read_log_file(blob)
    assert len(blocks) == 1 and blocks[0]["records"] == recs
    assert merged_records(blob) == [("007", recs[0]), ("007", recs[1])]
    with pytest.raises(HudiLogError):
        read_log_file(blob[:-3])  # truncated reverse pointer
    with pytest.raises(HudiLogError):
        read_log_file(b"#NOPE#" + blob[6:])  # bad magic


def test_hudi_no_commits_raises(spark, tmp_path):
    root = tmp_path / "empty"
    (root / ".hoodie").mkdir(parents=True)
    with pytest.raises(LoadError, match="no completed commits"):
        _load(spark, {"name": "t", "uri": str(root), "option": {"format": "hudi"}})


def test_hudi_partition_column_typed(spark, hudi_table):
    df = _load(
        spark,
        {
            "name": "t",
            "uri": str(hudi_table),
            "partition_columns": [{"name": "region", "data_type": "Utf8"}],
        },
    )
    assert dict(df.dtypes)["region"] == "string"
    assert {r["region"] for r in df.collect()} == {"eu", "us"}


def test_hudi_incremental_query(spark, hudi_table):
    """Commits strictly after 001: the fg1 rewrite (002) and the fg3
    replacement file (003), each tagged with its commit instant."""
    df = _load(spark, {
        "name": "t", "uri": str(hudi_table),
        "option": {"format": "hudi", "incremental_from": "001"},
    })
    rows = sorted((r["_commit_instant"], r["id"]) for r in df.collect())
    assert rows == [("002", 1), ("002", 2), ("003", 3), ("003", 4)]
    # bounded range excludes the replacecommit
    df2 = _load(spark, {
        "name": "t", "uri": str(hudi_table),
        "option": {"format": "hudi", "incremental_from": "001",
                   "incremental_to": "002"},
    })
    assert sorted(r["id"] for r in df2.collect()) == [1, 2]


def test_hudi_incremental_no_double_count_on_rewrites(spark, tmp_path):
    """A file group rewritten TWICE inside the incremental range
    contributes only its latest slice (whole-file CoW rewrites would
    otherwise double-count carried rows)."""
    root = tmp_path / "t2"
    meta = root / ".hoodie"
    meta.mkdir(parents=True)
    (meta / "hoodie.properties").write_text("hoodie.table.type=COPY_ON_WRITE\n")
    p1 = _base_file(root, "", "fg1", "001", {"id": [1], "v": [1.0]})
    _commit(meta, "001", {"": [{"fileId": "fg1", "path": p1}]})
    p2 = _base_file(root, "", "fg1", "002", {"id": [1, 2], "v": [1.0, 2.0]})
    _commit(meta, "002", {"": [{"fileId": "fg1", "path": p2}]})
    p3 = _base_file(root, "", "fg1", "003", {"id": [1, 2, 3], "v": [1.0, 2.0, 3.0]})
    _commit(meta, "003", {"": [{"fileId": "fg1", "path": p3}]})
    df = _load(spark, {"name": "t", "uri": str(root),
                       "option": {"format": "hudi", "incremental_from": "001"}})
    rows = sorted((r["id"], r["_commit_instant"]) for r in df.collect())
    # only the 003 slice — no duplicate ids from the 002 slice
    assert rows == [(1, "003"), (2, "003"), (3, "003")]


def _delete_log_file(root, file_id, base_instant, instant, keys, version=1):
    from roapi_spark.sources.hudi_log import (
        DELETE_BLOCK, H_INSTANT_TIME, write_log_block,
    )

    name = f".{file_id}_{base_instant}.log.{version}_0-1-0"
    blob = write_log_block(
        DELETE_BLOCK,
        {H_INSTANT_TIME: instant},
        [{"recordKey": k, "partitionPath": "", "orderingVal": None} for k in keys],
    )
    (root / name).write_bytes(blob)
    return name


def test_hudi_mor_delete_block_hard_deletes(spark, mor_table, tmp_path):
    """A dedicated DELETE log block (HoodieDeleteBlock, public
    HoodieDeleteRecordList avro payload) hard-deletes its record keys at
    its instant; a later upsert of the same key resurrects it."""
    import shutil

    root = tmp_path / "trips4"
    shutil.copytree(mor_table, root)
    meta = root / ".hoodie"
    # 004: delete k1 and k3 via a DELETE block
    l3 = _delete_log_file(root, "fg1", "001", "004", ["k1", "k3"], version=3)
    _commit(meta, "004", {"": [{"fileId": "fg1", "path": l3}]}, kind="deltacommit")
    df = _load(spark, {"name": "t", "uri": str(root)})
    rows = {r["_hoodie_record_key"]: r["fare"] for r in df.collect()}
    # k1 (12.0 after 003) and k3 (base) both hard-deleted; k4 survives
    assert rows == {"k4": 40.0}
    # 005: re-insert k1 — latest-instant-wins resurrects it
    l4 = _log_file(root, "fg1", "001", "005", [_rec("k1", 1, 99.0)], version=4)
    _commit(meta, "005", {"": [{"fileId": "fg1", "path": l4}]}, kind="deltacommit")
    df2 = _load(spark, {"name": "t", "uri": str(root)})
    rows2 = {r["_hoodie_record_key"]: r["fare"] for r in df2.collect()}
    assert rows2 == {"k1": 99.0, "k4": 40.0}


def test_hudi_delete_block_roundtrip():
    from roapi_spark.sources.hudi_log import (
        DELETE_BLOCK, H_INSTANT_TIME, merged_records, read_log_file,
        write_log_block,
    )

    blob = write_log_block(
        DELETE_BLOCK,
        {H_INSTANT_TIME: "010"},
        [{"recordKey": "a", "partitionPath": "p", "orderingVal": 7}],
    )
    (block,) = read_log_file(blob)
    assert block["type"] == DELETE_BLOCK
    assert block["records"] == [
        {"recordKey": "a", "partitionPath": "p", "orderingVal": 7}
    ]
    assert merged_records(blob) == [
        ("010", {"_hoodie_record_key": "a", "_hoodie_is_deleted": True})
    ]
    assert merged_records(blob, key_field="uid") == [
        ("010", {"uid": "a", "_hoodie_is_deleted": True})
    ]


def test_hudi_mor_no_double_read_when_commits_share_log_file(spark, tmp_path):
    """Two deltacommits appending to the SAME log file must not replay
    the file twice: each commit re-lists the path in its write stats, but
    the layout dedupes by path and per-block INSTANT_TIME attributes
    rows (snapshot AND incremental views)."""
    meta_dir_schema = {  # id-keyed table, no meta columns
        "type": "record", "name": "r",
        "fields": [{"name": "_hoodie_record_key", "type": "string"},
                   {"name": "id", "type": "long"},
                   {"name": "fare", "type": "double"},
                   {"name": "_hoodie_is_deleted", "type": "boolean"}],
    }
    from roapi_spark.sources.hudi_log import (
        AVRO_DATA_BLOCK, H_INSTANT_TIME, write_log_block,
    )

    root = tmp_path / "shared_log"
    meta = root / ".hoodie"
    meta.mkdir(parents=True)
    (meta / "hoodie.properties").write_text("hoodie.table.type=MERGE_ON_READ\n")
    p1 = _base_file(root, "", "fg1", "001", {
        "_hoodie_record_key": ["k1"], "id": [1], "fare": [10.0],
        "_hoodie_is_deleted": [False],
    })
    _commit(meta, "001", {"": [{"fileId": "fg1", "path": p1}]})
    name = ".fg1_001.log.1_0-1-0"
    # 002 creates the log file; 003 APPENDS to the same file
    b1 = write_log_block(AVRO_DATA_BLOCK, {H_INSTANT_TIME: "002"},
                         [_rec("k2", 2, 20.0)], meta_dir_schema)
    (root / name).write_bytes(b1)
    _commit(meta, "002", {"": [{"fileId": "fg1", "path": name}]},
            kind="deltacommit")
    b2 = write_log_block(AVRO_DATA_BLOCK, {H_INSTANT_TIME: "003"},
                         [_rec("k3", 3, 30.0)], meta_dir_schema)
    (root / name).write_bytes(b1 + b2)
    _commit(meta, "003", {"": [{"fileId": "fg1", "path": name}]},
            kind="deltacommit")
    # snapshot: exactly one row per key (no double replay of b1)
    df = _load(spark, {"name": "t", "uri": str(root)})
    rows = sorted((r["_hoodie_record_key"], r["fare"]) for r in df.collect())
    assert rows == [("k1", 10.0), ("k2", 20.0), ("k3", 30.0)]
    # incremental from 001: k2 once (at 002) and k3 once (at 003)
    inc = _load(spark, {"name": "t", "uri": str(root),
                        "option": {"format": "hudi", "incremental_from": "001"}})
    irows = sorted((r["_commit_instant"], r["_hoodie_record_key"])
                   for r in inc.collect())
    assert irows == [("002", "k2"), ("003", "k3")]
    # bounded incremental (001, 002]: block-instant filtering keeps only b1
    inc2 = _load(spark, {"name": "t", "uri": str(root),
                         "option": {"format": "hudi", "incremental_from": "001",
                                    "incremental_to": "002"}})
    assert [r["_hoodie_record_key"] for r in inc2.collect()] == ["k2"]


def test_hudi_mor_time_travel_excludes_future_log_blocks(spark, tmp_path):
    """as_of_instant must hide blocks APPENDED to a shared log file
    after the as-of instant — the file is recorded at its first touch,
    so the per-block INSTANT_TIME is what bounds the historical view."""
    from roapi_spark.sources.hudi_log import (
        AVRO_DATA_BLOCK, H_INSTANT_TIME, write_log_block,
    )

    root = tmp_path / "tt_shared"
    meta = root / ".hoodie"
    meta.mkdir(parents=True)
    (meta / "hoodie.properties").write_text("hoodie.table.type=MERGE_ON_READ\n")
    p1 = _base_file(root, "", "fg1", "001", {
        "_hoodie_record_key": ["k1"], "id": [1], "fare": [10.0],
        "_hoodie_is_deleted": [False],
    })
    _commit(meta, "001", {"": [{"fileId": "fg1", "path": p1}]})
    name = ".fg1_001.log.1_0-1-0"
    b1 = write_log_block(AVRO_DATA_BLOCK, {H_INSTANT_TIME: "002"},
                         [_rec("k2", 2, 20.0)], _MOR_SCHEMA)
    (root / name).write_bytes(b1)
    _commit(meta, "002", {"": [{"fileId": "fg1", "path": name}]},
            kind="deltacommit")
    b2 = write_log_block(AVRO_DATA_BLOCK, {H_INSTANT_TIME: "003"},
                         [_rec("k3", 3, 30.0)], _MOR_SCHEMA)
    (root / name).write_bytes(b1 + b2)
    _commit(meta, "003", {"": [{"fileId": "fg1", "path": name}]},
            kind="deltacommit")
    at2 = _load(spark, {"name": "t", "uri": str(root),
                        "option": {"as_of_instant": "002"}})
    keys = {r["_hoodie_record_key"] for r in at2.collect()}
    assert keys == {"k1", "k2"}  # k3 (appended at 003) must not appear


def test_hudi_incremental_delete_tombstone_survives_commit_time_refine(
    spark, tmp_path
):
    """A DELETE tombstone inside the incremental range must surface even
    when the table's data carries _hoodie_commit_time (the meta-column
    refinement falls back to the commit instant for rows that lack it)."""
    root = tmp_path / "inc_del"
    meta = root / ".hoodie"
    meta.mkdir(parents=True)
    (meta / "hoodie.properties").write_text("hoodie.table.type=MERGE_ON_READ\n")
    p1 = _base_file(root, "", "fg1", "001", {
        "_hoodie_record_key": ["k1", "k2"],
        "_hoodie_commit_time": ["001", "001"],
        "id": [1, 2], "fare": [10.0, 20.0],
    })
    _commit(meta, "001", {"": [{"fileId": "fg1", "path": p1}]})
    l1 = _delete_log_file(root, "fg1", "001", "002", ["k1"])
    _commit(meta, "002", {"": [{"fileId": "fg1", "path": l1}]},
            kind="deltacommit")
    inc = _load(spark, {"name": "t", "uri": str(root),
                        "option": {"format": "hudi", "incremental_from": "001"}})
    rows = [(r["_commit_instant"], r["_hoodie_record_key"],
             bool(r["_hoodie_is_deleted"])) for r in inc.collect()]
    assert rows == [("002", "k1", True)]


# ---------------------------------------------------------------------------
# Independent byte-level fixture: everything above writes its log files
# through hudi_log.write_log_block, so a shared reader/writer bug would
# cancel out (r9 verdict item #5). The log below is assembled BY HAND —
# struct.pack framing straight from the published HoodieLogFormat
# (MAGIC "#HUDI#", u64 size, u32 version=1, u32 block-type ordinal,
# ordinal-keyed header map, u64 content length, content, footer map,
# u64 reverse pointer) and hand-encoded Avro binary bodies (zigzag
# varints) — and SHA-256-pinned so the vector can never silently drift
# onto the writer under test.
# ---------------------------------------------------------------------------

_HAND_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "_hoodie_record_key", "type": "string"},
            {"name": "v", "type": "long"},
        ],
    },
    separators=(",", ":"),
)


def _hand_map(entries):
    """Header/footer map: u32 count, then per entry u32 ordinal,
    u32 byte length, utf8 value (HeaderMetadataType ordinals)."""
    import struct

    out = struct.pack(">I", len(entries))
    for o, v in entries:
        raw = v.encode()
        out += struct.pack(">II", o, len(raw)) + raw
    return out


def _hand_block(btype, header, content):
    import struct

    body = (
        struct.pack(">II", 1, btype)  # log format version 1, block type
        + _hand_map(header)
        + struct.pack(">Q", len(content))
        + content
        + _hand_map([])  # empty footer
    )
    body += struct.pack(">Q", 14 + len(body) + 8)  # reverse-seek pointer
    return b"#HUDI#" + struct.pack(">Q", len(body)) + body


def _hand_avro_data(record_bodies):
    import struct

    out = struct.pack(">II", 3, len(record_bodies))  # format 3, count
    for r in record_bodies:
        out += struct.pack(">I", len(r)) + r
    return out


def _hand_log() -> bytes:
    """Four blocks: data(001: k1=1, k2=-3), data(002: k1=10),
    DELETE v2 (003: k2), rollback COMMAND voiding 002.
    Avro record bodies are hand-encoded: string = zigzag-varint length
    + utf8; long = zigzag varint ("k1",1 -> 04 6b 31 02; -3 -> 05;
    10 -> 14). The HoodieDeleteRecordList body is array count 1 (02),
    recordKey union branch 1 (02) + "k2" (04 6b 32), partitionPath
    branch 1 + "" (02 00), orderingVal branch 0/null (00), array
    terminator (00)."""
    import struct

    b1 = _hand_block(
        3,  # AVRO_DATA
        [(0, "001"), (2, _HAND_SCHEMA)],  # INSTANT_TIME, SCHEMA
        _hand_avro_data([b"\x04k1\x02", b"\x04k2\x05"]),
    )
    b2 = _hand_block(
        3, [(0, "002"), (2, _HAND_SCHEMA)], _hand_avro_data([b"\x04k1\x14"])
    )
    del_body = b"\x02" + b"\x02\x04k2" + b"\x02\x00" + b"\x00" + b"\x00"
    b3 = _hand_block(
        1,  # DELETE
        [(0, "003")],
        struct.pack(">II", 2, len(del_body)) + del_body,  # payload v2
    )
    b4 = _hand_block(
        0,  # COMMAND
        [(0, "004"), (1, "002"), (3, "ROLLBACK_BLOCK")],  # TARGET=002
        b"",
    )
    return b1 + b2 + b3 + b4


def test_hudi_reader_parses_hand_assembled_log():
    """The reader must parse a log it did NOT write: hand-framed blocks,
    hand-encoded Avro, pinned by SHA-256. Expected merge: the rollback
    voids instant 002 (k1 reverts to v=1) and the DELETE block
    tombstones k2."""
    import hashlib

    from roapi_spark.sources.hudi_log import merged_records, read_log_file

    log = _hand_log()
    assert (
        hashlib.sha256(log).hexdigest()
        == "7fcec249b9240fa6c3026fdded9a8da63922592c7177d9ecf904f285e5ee1ab7"
    ), "hand-built vector drifted — it must stay independent of the writer"
    blocks = read_log_file(log)
    assert [(b["type"], b["header"].get(0)) for b in blocks] == [
        (3, "001"),
        (3, "002"),
        (1, "003"),
        (0, "004"),
    ]
    assert merged_records(log) == [
        ("001", {"_hoodie_record_key": "k1", "v": 1}),
        ("001", {"_hoodie_record_key": "k2", "v": -3}),
        ("003", {"_hoodie_record_key": "k2", "_hoodie_is_deleted": True}),
    ]


def test_hudi_hand_log_served_through_mor_table(spark, tmp_path):
    """End-to-end: the hand-assembled log serves through the full MoR
    snapshot path (base parquet + log merge), not just the block parser."""
    root = tmp_path / "handmor"
    meta = root / ".hoodie"
    meta.mkdir(parents=True)
    (meta / "hoodie.properties").write_text(
        "hoodie.table.name=hand\nhoodie.table.type=MERGE_ON_READ\n"
    )
    p1 = _base_file(
        root, "", "fg1", "000",
        {"_hoodie_record_key": ["k1", "k2", "k3"], "v": [0, 0, 99]},
    )
    _commit(meta, "000", {"": [{"fileId": "fg1", "path": p1}]})
    log_name = ".fg1_000.log.1_0-1-0"
    (root / log_name).write_bytes(_hand_log())
    _commit(
        meta, "004", {"": [{"fileId": "fg1", "path": log_name}]},
        kind="deltacommit",
    )
    df = _load(spark, {"name": "t", "uri": str(root), "option": {"format": "hudi"}})
    got = {(r["_hoodie_record_key"], r["v"]) for r in df.collect()}
    # k1 upserted to 1 (002's v=10 rolled back), k2 hard-deleted,
    # k3 untouched from the base file
    assert got == {("k1", 1), ("k3", 99)}


def test_hudi_v1_kryo_delete_payload_rejected():
    """A hand-built DELETE block with payload version 1 (kryo-serialized
    HoodieKey list in real Hudi) must fail loudly, never decode-as-avro."""
    import struct

    from roapi_spark.sources.hudi_log import HudiLogError, read_log_file

    blk = _hand_block(1, [(0, "001")], struct.pack(">II", 1, 4) + b"\x00" * 4)
    with pytest.raises(HudiLogError, match="version 1"):
        read_log_file(blk)


def test_hudi_bad_reverse_pointer_rejected():
    """Corrupt the trailing reverse-seek pointer of a hand-built block:
    the reader must refuse rather than trust the forward framing."""
    import struct

    from roapi_spark.sources.hudi_log import HudiLogError, read_log_file

    blk = bytearray(
        _hand_block(3, [(0, "001"), (2, _HAND_SCHEMA)], _hand_avro_data([b"\x04k1\x02"]))
    )
    blk[-8:] = struct.pack(">Q", 7)  # nonsense pointer
    with pytest.raises(HudiLogError, match="reverse pointer"):
        read_log_file(bytes(blk))
