"""Change Data Feed WRITE path (round 11, beyond reference parity):
tables with ``delta.enableChangeDataFeed=true`` get ``_change_data/``
cdc files from DELETE/UPDATE/MERGE — including update pre/post images,
which derivation from add/remove can never reconstruct — published in
the same atomic commit. Spec: Delta PROTOCOL.md "Change Data Files";
delta-spark's CDCReader semantics (cdc actions replace derivation for
a commit that carries them)."""

from __future__ import annotations

import json
import os

import pytest

from roapi_spark.sinks.delta import (
    compact,
    delete_delta,
    merge_delta,
    update_delta,
    vacuum,
    write_delta,
)
from roapi_spark.sources.delta import table_changes

CDF = {"delta.enableChangeDataFeed": "true"}


@pytest.fixture
def people(spark):
    return spark.createDataFrame(
        [(1, "ada", 10.0), (2, "linus", 20.0), (3, "guido", 30.0), (4, "bdfl", 40.0)],
        "id bigint, name string, score double",
    )


def _changes(spark, path, v):
    return {
        (r._change_type, r.id)
        for r in table_changes(spark, path, v, v).select("_change_type", "id").collect()
    }


def test_cdf_table_protocol_and_configuration(spark, people, tmp_path):
    path = str(tmp_path / "cdf")
    write_delta(people, path, configuration=CDF)
    first = [json.loads(ln) for ln in open(os.path.join(path, "_delta_log", f"{0:020d}.json"))]
    proto = next(a["protocol"] for a in first if "protocol" in a)
    assert proto["minWriterVersion"] == 4  # CDF writer requirement
    meta = next(a["metaData"] for a in first if "metaData" in a)
    assert meta["configuration"] == CDF


def test_delete_emits_exact_cdc_rows(spark, people, tmp_path):
    """The cdc file carries exactly the deleted rows — NOT the derived
    whole-file delete+survivor-insert churn a blind reader would see."""
    path = str(tmp_path / "cdfdel")
    write_delta(people.repartition(1), path, configuration=CDF)  # one file
    delete_delta(spark, path, "id = 2")  # rewrites the single file
    got = _changes(spark, path, 1)
    # without cdc, derivation would show deletes 1..4 + inserts 1,3,4
    assert got == {("delete", 2)}
    log1 = open(os.path.join(path, "_delta_log", f"{1:020d}.json")).read()
    assert '"cdc"' in log1 and "_change_data/" in log1


def test_update_emits_pre_and_post_images(spark, people, tmp_path):
    path = str(tmp_path / "cdfupd")
    write_delta(people, path, configuration=CDF)
    update_delta(spark, path, "id <= 2", {"score": "score * 10"})
    rows = {
        (r._change_type, r.id, r.score)
        for r in table_changes(spark, path, 1, 1)
        .select("_change_type", "id", "score")
        .collect()
    }
    assert rows == {
        ("update_preimage", 1, 10.0),
        ("update_preimage", 2, 20.0),
        ("update_postimage", 1, 100.0),
        ("update_postimage", 2, 200.0),
    }


def test_merge_emits_all_change_types(spark, people, tmp_path):
    path = str(tmp_path / "cdfmrg")
    write_delta(people, path, configuration=CDF)
    src = spark.createDataFrame(
        [(1, "ada2", 11.0), (4, "x", 0.0), (9, "nine", 90.0)],
        "id bigint, name string, score double",
    )
    merge_delta(
        spark,
        path,
        src,
        on=["id"],
        when_matched_delete="s.score = 0.0",
        when_matched_update={"name": "s.name", "score": "s.score"},
        when_not_matched_insert=True,
    )
    rows = {
        (r._change_type, r.id, r.name)
        for r in table_changes(spark, path, 1, 1)
        .select("_change_type", "id", "name")
        .collect()
    }
    assert rows == {
        ("delete", 4, "bdfl"),
        ("update_preimage", 1, "ada"),
        ("update_postimage", 1, "ada2"),
        ("insert", 9, "nine"),
    }
    # table state composes with the change stream
    from roapi_spark.sources.delta import snapshot_files

    live = spark.read.option("basePath", path).parquet(*snapshot_files(path))
    assert {r.id for r in live.collect()} == {1, 2, 3, 9}


def test_optimize_invisible_to_cdf(spark, people, tmp_path):
    """Compaction is physical rearrangement: its add/remove must carry
    dataChange=false so a CDF range over the OPTIMIZE commit derives
    NO phantom whole-table churn."""
    path = str(tmp_path / "cdfopt")
    write_delta(people.repartition(3), path, configuration=CDF)
    delete_delta(spark, path, "id = 1")  # v1: real change
    compact(spark, path)  # v2: no logical change
    rows = table_changes(spark, path, 1, 2)
    got = {(r._change_type, r.id) for r in rows.select("_change_type", "id").collect()}
    assert got == {("delete", 1)}
    # and the compaction preserved the CDF table property
    from roapi_spark.sources.delta import snapshot_state

    _, meta = snapshot_state(path)
    assert (meta or {}).get("configuration", {}).get(
        "delta.enableChangeDataFeed"
    ) == "true"


def test_vacuum_keeps_cdc_of_retained_versions(spark, people, tmp_path):
    path = str(tmp_path / "cdfvac")
    write_delta(people.repartition(1), path, configuration=CDF)
    delete_delta(spark, path, "id = 2")  # v1 (+cdc)
    update_delta(spark, path, "id = 3", {"score": "0.0"})  # v2 (+cdc)
    deleted = vacuum(path, keep_versions=2)  # window = v1, v2
    # cdc of versions inside the window survive: the range still reads
    got = {
        r._change_type
        for r in table_changes(spark, path, 1, 2).select("_change_type").collect()
    }
    assert got == {"delete", "update_preimage", "update_postimage"}
    # v0's original data file (dead since the delete's rewrite) is gone
    assert any(not d.startswith("_change_data") for d in deleted)


def test_vacuum_reclaims_cdc_outside_window(spark, people, tmp_path):
    path = str(tmp_path / "cdfvac2")
    write_delta(people.repartition(1), path, configuration=CDF)
    delete_delta(spark, path, "id = 2")  # v1 (+cdc)
    delete_delta(spark, path, "id = 3")  # v2 (+cdc)
    deleted = vacuum(path, keep_versions=1)  # window = v2 only
    assert any(d.startswith("_change_data") for d in deleted)
    # reading the reclaimed range fails loudly, not silently empty
    with pytest.raises(Exception, match="vacuumed|missing"):
        table_changes(spark, path, 1, 1).collect()


def test_non_cdf_table_writes_no_cdc(spark, people, tmp_path):
    path = str(tmp_path / "plain")
    write_delta(people, path)  # no configuration
    delete_delta(spark, path, "id = 2")
    log1 = open(os.path.join(path, "_delta_log", f"{1:020d}.json")).read()
    assert '"cdc"' not in log1
    assert not os.path.isdir(os.path.join(path, "_change_data"))


def test_overwrite_carries_configuration_forward(spark, people, tmp_path):
    path = str(tmp_path / "cdfow")
    write_delta(people, path, configuration=CDF)
    write_delta(people, path, mode="overwrite")  # configuration=None
    from roapi_spark.sources.delta import snapshot_state

    _, meta = snapshot_state(path)
    assert (meta or {}).get("configuration") == CDF
    # and an explicit configuration on overwrite replaces it
    write_delta(people, path, mode="overwrite", configuration={})
    _, meta = snapshot_state(path)
    assert (meta or {}).get("configuration") == {}


def test_alter_tblproperties_enables_cdc_on_existing_table(spark, tmp_path):
    """ALTER TABLE t SET TBLPROPERTIES ('delta.enableChangeDataFeed'=
    'true') on a PLAIN table: one metadata-only commit (protocol
    upgraded to writer v4 in the same commit), after which DML emits
    cdc files; '' unsets a property."""
    from roapi_spark.catalog import Catalog
    from roapi_spark.config import parse_table_config

    path = str(tmp_path / "alter")
    write_delta(
        spark.createDataFrame([(1, 5.0), (2, 6.0)], "id bigint, v double"),
        path,
    )  # v0, no CDF
    cat = Catalog(spark, read_only=False)
    cat.load_table(
        parse_table_config({"name": "a", "uri": path, "option": {"format": "delta"}})
    )
    out = cat.query_sql(
        "ALTER TABLE a SET TBLPROPERTIES "
        "('delta.enableChangeDataFeed'='true', 'x'='y')"
    ).collect()[0]
    assert (out.operation, out.version) == ("SET TBLPROPERTIES", 1)
    log1 = [json.loads(ln) for ln in open(
        os.path.join(path, "_delta_log", f"{1:020d}.json"))]
    proto = next(a["protocol"] for a in log1 if "protocol" in a)
    assert proto["minWriterVersion"] == 4
    # DML after the ALTER writes cdc images
    cat.query_sql("UPDATE a SET v = 9.0 WHERE id = 1")  # v2
    got = {
        (r._change_type, r.id)
        for r in cat.query_sql(
            "SELECT _change_type, id FROM table_changes('a', 2, 2)"
        ).collect()
    }
    assert got == {("update_preimage", 1), ("update_postimage", 1)}
    # unset via empty value
    cat.query_sql("ALTER TABLE a SET TBLPROPERTIES ('x'='')")
    from roapi_spark.sources.delta import snapshot_state

    _, meta = snapshot_state(path)
    conf = (meta or {}).get("configuration") or {}
    assert "x" not in conf and conf.get("delta.enableChangeDataFeed") == "true"
    # SHOW TBLPROPERTIES reads back the merged state — and works in
    # read-only mode (log metadata only)
    from roapi_spark.catalog import ReadOnlyError

    ro = Catalog(spark, read_only=True)
    ro.sources = cat.sources
    shown = {
        r.key: r.value
        for r in ro.query_sql("SHOW TBLPROPERTIES a").collect()
    }
    assert shown == {"delta.enableChangeDataFeed": "true"}
    with pytest.raises(ReadOnlyError):
        ro.query_sql("ALTER TABLE a SET TBLPROPERTIES ('k'='v')")
    # malformed property lists are loud
    from roapi_spark.catalog import CatalogError

    with pytest.raises(CatalogError, match="could not parse"):
        cat.query_sql("ALTER TABLE a SET TBLPROPERTIES (k=v)")


def test_sql_surface_serves_cdc_images(spark, tmp_path):
    """End to end through the catalog: UPDATE on a CDF table, then the
    table_changes TVF returns the pre/post images SQL-side."""
    from roapi_spark.catalog import Catalog
    from roapi_spark.config import parse_table_config

    path = str(tmp_path / "cdfsql")
    write_delta(
        spark.createDataFrame([(1, 5.0), (2, 6.0)], "id bigint, v double"),
        path,
        configuration=CDF,
    )
    cat = Catalog(spark, read_only=False)
    cat.load_table(
        parse_table_config({"name": "c", "uri": path, "option": {"format": "delta"}})
    )
    cat.query_sql("UPDATE c SET v = v + 1 WHERE id = 1")
    rows = cat.query_sql(
        "SELECT _change_type, id, v FROM table_changes('c', 1, 1) "
        "ORDER BY _change_type"
    ).collect()
    assert [(r._change_type, r.id, r.v) for r in rows] == [
        ("update_postimage", 1, 6.0),
        ("update_preimage", 1, 5.0),
    ]


def test_cdc_on_partitioned_table(spark, tmp_path):
    """CDC on a hive-partitioned table: partition columns travel as
    regular data columns in the cdc file (partitionValues stays empty —
    the change rows carry them inline), so the change stream reads
    complete rows."""
    path = str(tmp_path / "cdfpart")
    df = spark.createDataFrame(
        [(1, 10.0, "uk"), (2, 20.0, "uk"), (3, 30.0, "fi")],
        "id bigint, score double, country string",
    )
    write_delta(df, path, partition_by=["country"], configuration=CDF)
    update_delta(spark, path, "country = 'uk' AND id = 1", {"score": "99.0"})
    rows = {
        (r._change_type, r.id, r.score, r.country)
        for r in table_changes(spark, path, 1, 1)
        .select("_change_type", "id", "score", "country")
        .collect()
    }
    assert rows == {
        ("update_preimage", 1, 10.0, "uk"),
        ("update_postimage", 1, 99.0, "uk"),
    }
    # the partitioned layout itself is intact after the rewrite
    assert os.path.isdir(os.path.join(path, "country=uk"))
