"""Delta reader audit regressions: out-of-range versions, log gaps,
degraded checkpoints, schema evolution, encoded-path deletion vectors,
narrow jar-fallback, and empty-but-valid CDF ranges — every case where
the replay used to serve a silently wrong snapshot instead of either
the right one or a loud error."""

from __future__ import annotations

import json
import os

import pytest

from roapi_spark.sinks.delta import write_delta
from roapi_spark.sources import LoadError
from roapi_spark.sources.delta import snapshot_raw_state, table_changes
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


def test_version_past_head_errors(spark, people, tmp_path):
    """version=99 on a 1-commit table must raise (delta-spark's
    out-of-range error), never silently serve HEAD."""
    path = str(tmp_path / "vpast")
    write_delta(people, path)
    with pytest.raises(LoadError, match="after the latest commit"):
        _read(spark, path, version="99").collect()
    with pytest.raises(LoadError, match="after the latest commit"):
        snapshot_raw_state(path, version=99)


def test_log_gap_refuses_partial_snapshot(spark, people, tmp_path):
    """A cleaned/missing middle commit must raise, not silently drop
    every file that version referenced."""
    path = str(tmp_path / "gap")
    write_delta(people, path)  # v0
    extra = spark.createDataFrame([(4, "grace", "us")], people.schema)
    write_delta(extra, path, mode="append")  # v1
    write_delta(extra, path, mode="append")  # v2
    os.remove(os.path.join(path, "_delta_log", f"{1:020d}.json"))
    with pytest.raises(LoadError, match="delta log gap"):
        snapshot_raw_state(path)


def test_incomplete_multipart_checkpoint_falls_back_correctly(
    spark, people, tmp_path
):
    """A multi-part checkpoint missing one part must not seed a partial
    active set: with the full json history still present the replay
    falls back and serves the COMPLETE snapshot; with history cleaned
    it raises instead of serving partial data."""
    path = str(tmp_path / "mpart")
    write_delta(people, path)  # v0
    extra = spark.createDataFrame([(4, "grace", "us")], people.schema)
    write_delta(extra, path, mode="append")  # v1
    log = os.path.join(path, "_delta_log")
    # forge a multi-part checkpoint at v1 claiming 2 parts, 1 present
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"txn": pa.array([None], pa.string())}),
        os.path.join(
            log, f"{1:020d}.checkpoint.{1:010d}.{2:010d}.parquet"
        ),
    )
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": 1, "parts": 2}, f)
    # full history intact -> complete snapshot via json fallback
    active, _ = snapshot_raw_state(path)
    assert len(active) >= 2
    assert _read(spark, path).count() == 4
    # history cleaned below the checkpoint -> loud error, never partial
    os.remove(os.path.join(log, f"{0:020d}.json"))
    with pytest.raises(LoadError, match="delta log gap"):
        snapshot_raw_state(path)


def test_schema_evolution_serves_log_schema(spark, people, tmp_path):
    """After ALTER ADD COLUMN + a new file carrying it, the read must
    surface the new column WITH its values (not lose it to one sampled
    footer, not null it out)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "evo")
    write_delta(people, path)  # v0: id,name,country
    # simulate a foreign writer's evolution commit: new file with an
    # extra column + metaData carrying the widened schema
    new_schema = (
        spark.createDataFrame(
            [], "id bigint, name string, country string, age bigint"
        ).schema.json()
    )
    pq.write_table(
        pa.table(
            {
                "id": pa.array([7], pa.int64()),
                "name": pa.array(["new"]),
                "country": pa.array(["de"]),
                "age": pa.array([30], pa.int64()),
            }
        ),
        os.path.join(path, "part-evo.parquet"),
    )
    log = os.path.join(path, "_delta_log")
    with open(os.path.join(log, f"{0:020d}.json")) as f:
        meta = next(
            json.loads(ln)["metaData"] for ln in f if '"metaData"' in ln
        )
    meta["schemaString"] = new_schema
    with open(os.path.join(log, f"{1:020d}.json"), "w") as f:
        f.write(json.dumps({"metaData": meta}) + "\n")
        f.write(
            json.dumps(
                {
                    "add": {
                        "path": "part-evo.parquet",
                        "partitionValues": {},
                        "size": 1,
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                }
            )
            + "\n"
        )
    df = _read(spark, path)
    assert df.columns == ["id", "name", "country", "age"]
    rows = {r["id"]: r["age"] for r in df.collect()}
    assert rows[7] == 30, "evolved column's values must surface"
    assert rows[1] is None, "pre-evolution rows read as typed NULL"


def test_snapshot_timestamp_honors_offset(spark, people, tmp_path):
    """option.timestamp with an explicit UTC offset must convert, not
    clobber: 05:00+05:00 IS midnight UTC."""
    path = str(tmp_path / "tsz")
    write_delta(people, path)  # v0
    log_file = os.path.join(path, "_delta_log", f"{0:020d}.json")
    os.utime(log_file, (1786924800, 1786924800))  # 2026-08-17T00:00:00Z
    active, _ = snapshot_raw_state(
        path, timestamp="2026-08-17T05:00:00+05:00"
    )  # == the commit instant exactly (inclusive)
    assert active
    with pytest.raises(LoadError, match="no delta commit"):
        # 04:59+05:00 is 23:59 the day BEFORE the commit
        snapshot_raw_state(path, timestamp="2026-08-17T04:59:00+05:00")


def test_jar_fallback_is_narrow(spark, people, tmp_path):
    """Errors other than jars-absent must surface through to_dataframe,
    not silently degrade to the pure-Python path (which may disagree);
    jars ARE absent in this environment, so a valid read still routes
    to the replay and an out-of-range version raises ITS loud error."""
    path = str(tmp_path / "narrow")
    write_delta(people, path)
    assert _read(spark, path).count() == 3  # fallback still works
    with pytest.raises(LoadError, match="after the latest commit"):
        _read(spark, path, version="42").collect()


def test_cdf_empty_valid_range_returns_empty(spark, people, tmp_path):
    """A commit range that exists but carries no row changes (metadata-
    only commit) yields an EMPTY change feed, not an error."""
    from roapi_spark.sinks.delta import set_table_properties

    path = str(tmp_path / "cdfempty")
    write_delta(
        people, path,
        configuration={"delta.enableChangeDataFeed": "true"},
    )  # v0
    v = set_table_properties(path, {"foo": "bar"})  # metadata-only
    chg = table_changes(spark, path, v, v)
    assert chg.count() == 0
    assert "_change_type" in chg.columns and "id" in chg.columns
    # a range past HEAD still errors
    with pytest.raises(LoadError, match="no commits in change range"):
        table_changes(spark, path, v + 10, v + 12)


def test_dv_on_encoded_path_still_filters(spark, tmp_path):
    """A DV'd file living under a space-bearing directory must still
    have its deleted rows dropped — an encoding mismatch in the
    anti-join would silently resurrect them."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from roapi_spark.sources.deletion_vectors import write_dv_file

    root = tmp_path / "my dv table"
    (root / "_delta_log").mkdir(parents=True)
    pq.write_table(
        pa.table({"id": list(range(6))}),
        root / "part-0.parquet",
    )
    dv = write_dv_file(str(root / "dv1.bin"), [1, 4])
    schema_str = spark.createDataFrame([], "id bigint").schema.json()
    actions = [
        {"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"],
        }},
        {"metaData": {
            "id": "m", "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_str, "partitionColumns": [],
            "configuration": {}, "createdTime": 0,
        }},
        {"add": {
            "path": "part-0.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": True,
            "deletionVector": dv,
        }},
    ]
    with open(root / "_delta_log" / f"{0:020d}.json", "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions))
    got = sorted(r.id for r in _read(spark, str(root)).collect())
    assert got == [0, 2, 3, 5], f"DV rows must stay deleted, got {got}"
