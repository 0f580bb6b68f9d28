"""Hudi Copy-on-Write loader: pure-Python timeline replay over a
hand-built .hoodie layout (public Hudi spec — completed commits,
replacecommit, requested/inflight skipping, as-of time travel, the
MERGE_ON_READ loud-fail gate, hive partition columns)."""

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


def test_hudi_merge_on_read_fails_loudly(spark, tmp_path):
    root = tmp_path / "mor"
    meta = root / ".hoodie"
    meta.mkdir(parents=True)
    (meta / "hoodie.properties").write_text("hoodie.table.type=MERGE_ON_READ\n")
    _commit(meta, "001", {})
    with pytest.raises(LoadError, match="MERGE_ON_READ"):
        _load(spark, {"name": "t", "uri": str(root), "option": {"format": "hudi"}})


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
