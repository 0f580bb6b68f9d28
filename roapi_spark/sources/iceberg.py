"""Apache Iceberg table loader (pure-Python metadata replay, an
extension beyond the reference's 11 formats — the reference reads only
Delta via delta-rs, columnq/src/table/delta.rs; the same lazy
metadata->file-list->parquet-scan shape applies here).

Layout (public Iceberg spec v1/v2):
  table/metadata/v{N}.metadata.json   table state: snapshots, schemas
  table/metadata/version-hint.text    latest N (optional)
  manifest list (avro)                one row per manifest file
  manifest (avro)                     one row per data/delete file
  table/data/*.parquet                the data

The loader resolves a snapshot (latest, ``snapshot_id``, or ``timestamp``
as-of), replays its manifest list + manifests to the live data-file set,
and scans it with ``spark.read.parquet`` — Catalyst still prunes columns
and pushes filters. Iceberg v2 positional delete files are honored by
anti-filtering (file, row ordinal) pairs via the parquet scan's
``_metadata`` columns (the same mechanism as Delta deletion vectors,
sources/delta.py); equality deletes anti-join on the referenced columns
with the spec's null-equals-null matching.

Absolute ``file:`` URIs inside metadata are rebased onto the table root
when the original location no longer exists (tables are routinely moved
or re-mounted; rebasing keeps fixtures and relocated warehouses alive).
"""

from __future__ import annotations

import json
import os
import re
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession

from roapi_spark.config import TableSource
from roapi_spark.sources import LoadError

_VMETA = re.compile(r"^v(\d+)\.metadata\.json$")


def _metadata_path(table_path: str) -> str:
    mdir = os.path.join(table_path, "metadata")
    if not os.path.isdir(mdir):
        raise LoadError(f"not an iceberg table (no metadata dir): {table_path}")
    hint = os.path.join(mdir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            v = f.read().strip()
        cand = os.path.join(mdir, f"v{v}.metadata.json")
        if os.path.exists(cand):
            return cand
    versions = []
    for name in os.listdir(mdir):
        m = _VMETA.match(name)
        if m:
            versions.append((int(m.group(1)), name))
        elif name.endswith(".metadata.json"):
            versions.append((-1, name))
    if not versions:
        raise LoadError(f"no metadata.json in {mdir}")
    return os.path.join(mdir, max(versions)[1])


def _localize(uri: str, table_path: str) -> str:
    """Metadata stores absolute URIs from write time; rebase onto the
    current table root if the recorded location is gone."""
    p = uri
    if "://" in uri:
        parsed = urlparse(uri)
        p = unquote(parsed.path)
    base = os.path.abspath(table_path)
    if os.path.abspath(p).startswith(base + os.sep):
        return p
    # recorded path is outside the current table root (the table was
    # moved/copied): prefer the root-relative equivalent when it exists —
    # a scan must stay self-contained under its own root
    for anchor in ("/metadata/", "/data/"):
        if anchor in p:
            cand = os.path.join(base, anchor.strip("/"), p.split(anchor, 1)[1])
            if os.path.exists(cand):
                return cand
    if os.path.exists(p):
        return p
    return os.path.join(base, os.path.basename(p))


def _read_avro(path: str) -> list:
    from roapi_spark.sources.avro_lite import AvroError, read_container

    try:
        with open(path, "rb") as f:
            _, records = read_container(f.read())
        return records
    except (OSError, AvroError) as exc:
        raise LoadError(f"unreadable iceberg manifest {path}: {exc}") from exc


def snapshot_files(
    table_path: str,
    snapshot_id: int | None = None,
    timestamp_ms: int | None = None,
) -> tuple[list[str], list[str], list[tuple[str, list[str]]]]:
    """(data files, positional-delete files, [(equality-delete file,
    matched column names)]) for a snapshot."""
    meta_path = _metadata_path(table_path)
    with open(meta_path) as f:
        meta = json.load(f)
    field_names = _field_names_by_id(meta)
    snaps = meta.get("snapshots") or []
    if not snaps:
        raise LoadError(f"iceberg table {table_path}: no snapshots")
    if snapshot_id is None and timestamp_ms is not None:
        eligible = [s for s in snaps if s.get("timestamp-ms", 0) <= timestamp_ms]
        if not eligible:
            raise LoadError(f"no iceberg snapshot at or before {timestamp_ms}")
        snapshot_id = max(eligible, key=lambda s: s["timestamp-ms"])["snapshot-id"]
    if snapshot_id is None:
        snapshot_id = meta.get("current-snapshot-id")
        if snapshot_id in (None, -1):
            snapshot_id = max(snaps, key=lambda s: s.get("timestamp-ms", 0))["snapshot-id"]
    chosen = next((s for s in snaps if s["snapshot-id"] == snapshot_id), None)
    if chosen is None:
        raise LoadError(f"iceberg snapshot {snapshot_id} not found")
    mlist = _localize(chosen["manifest-list"], table_path)
    data_files: list[str] = []
    delete_files: list[str] = []
    eq_deletes: list[tuple[str, list[str]]] = []
    for m in _read_avro(mlist):
        mpath = _localize(m["manifest_path"], table_path)
        for entry in _read_avro(mpath):
            if entry.get("status") == 2:  # DELETED entry: file left the table
                continue
            df = entry.get("data_file") or {}
            content = df.get("content", 0) or 0
            fpath = _localize(df["file_path"], table_path)
            fmt = (df.get("file_format") or "PARQUET").upper()
            if fmt != "PARQUET":
                raise LoadError(
                    f"iceberg table {table_path}: {fmt} data files not supported"
                )
            if content == 0:
                data_files.append(fpath)
            elif content == 1:
                delete_files.append(fpath)
            elif content == 2:
                ids = df.get("equality_ids") or []
                try:
                    cols = [field_names[int(i)] for i in ids]
                except KeyError as exc:
                    raise LoadError(
                        f"iceberg table {table_path}: equality delete "
                        f"references unknown field id {exc}"
                    ) from exc
                if not cols:
                    raise LoadError(
                        f"iceberg table {table_path}: equality delete "
                        "without equality_ids"
                    )
                eq_deletes.append((fpath, cols))
            else:
                raise LoadError(
                    f"iceberg table {table_path}: unknown file content "
                    f"{content!r}"
                )
    return data_files, delete_files, eq_deletes


def _field_names_by_id(meta: dict) -> dict[int, str]:
    """field-id -> column name from the table schema (v2 ``schemas`` +
    ``current-schema-id``, v1 ``schema``) — equality-delete files name
    their matched columns by field id."""
    schema = None
    if "schemas" in meta:
        cur = meta.get("current-schema-id")
        for s in meta["schemas"]:
            if s.get("schema-id") == cur:
                schema = s
                break
        if schema is None and meta["schemas"]:
            schema = meta["schemas"][-1]
    schema = schema or meta.get("schema") or {}
    return {
        int(f["id"]): f["name"]
        for f in schema.get("fields", [])
        if "id" in f and "name" in f
    }


def to_dataframe(spark: SparkSession, ts: TableSource) -> DataFrame:
    snap = ts.option.get("snapshot_id")
    ts_ms = ts.option.get("timestamp_ms")
    if ts_ms is None and "timestamp" in ts.option:
        from datetime import datetime, timezone

        ts_ms = int(
            datetime.fromisoformat(str(ts.option["timestamp"]))
            .replace(tzinfo=timezone.utc)
            .timestamp()
            * 1000
        )
    data_files, delete_files, eq_deletes = snapshot_files(
        ts.uri,
        snapshot_id=None if snap is None else int(snap),
        timestamp_ms=None if ts_ms is None else int(ts_ms),
    )
    if not data_files:
        raise LoadError(f"iceberg table {ts.name!r}: snapshot has no data files")
    df = spark.read.option("basePath", ts.uri).parquet(*data_files)
    if delete_files:
        df = _apply_position_deletes(spark, df, delete_files, ts)
    for path, cols in eq_deletes:
        df = _apply_equality_delete(spark, df, path, cols, ts)
    return df


def _apply_equality_delete(
    spark: SparkSession, df: DataFrame, path: str, cols: list[str], ts: TableSource
) -> DataFrame:
    """Iceberg v2 equality deletes: drop rows whose values equal any
    delete row on the referenced columns, null matching null (the spec's
    null-equals-null rule -> eqNullSafe join keys). The delete set is a
    small scan broadcast into a left-anti join keyed on the equality
    columns — at cluster scale the standard merge-on-read shape."""
    from pyspark.sql import functions as F

    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise LoadError(
            f"iceberg table {ts.name!r}: equality delete columns {missing} "
            "not present in the data schema"
        )
    dels = spark.read.parquet(path).select(
        *[F.col(c).alias(f"_eq_{c}") for c in cols]
    ).distinct()
    cond = None
    for c in cols:
        clause = F.col(c).eqNullSafe(F.col(f"_eq_{c}"))
        cond = clause if cond is None else cond & clause
    return df.join(F.broadcast(dels), cond, "left_anti")


def _apply_position_deletes(
    spark: SparkSession, df: DataFrame, delete_files: list[str], ts: TableSource
) -> DataFrame:
    """Iceberg v2 positional deletes: parquet files of (file_path, pos)
    rows; drop matching (file, row ordinal) pairs via the scan's
    ``_metadata`` columns — identical filter shape to Delta deletion
    vectors. The delete-file set is read as its own (small) scan and
    broadcast; at cluster scale this is the standard merge-on-read
    anti-join, file-path-partitioned on both sides."""
    from pyspark.sql import functions as F

    dv = (
        spark.read.parquet(*delete_files)
        .select(
            F.regexp_replace(F.col("file_path"), "^file:/+", "/").alias("_dv_file"),
            F.col("pos").cast("bigint").alias("_dv_row"),
        )
    )
    # rebase recorded absolute paths the same way the data files were
    base = os.path.abspath(ts.uri)
    dv = dv.withColumn(
        "_dv_file",
        F.when(
            F.col("_dv_file").contains("/data/") & ~F.col("_dv_file").startswith(base),
            F.concat(F.lit(base + "/data/"), F.element_at(F.split("_dv_file", "/data/"), -1)),
        ).otherwise(F.col("_dv_file")),
    )
    cols = df.columns
    kept = (
        df.withColumn(
            "_file", F.regexp_replace(F.col("_metadata.file_path"), "^file:/+", "/")
        )
        .withColumn("_row", F.col("_metadata.row_index"))
        .join(
            F.broadcast(dv),
            (F.col("_file") == F.col("_dv_file")) & (F.col("_row") == F.col("_dv_row")),
            "left_anti",
        )
    )
    return kept.select(*cols)
