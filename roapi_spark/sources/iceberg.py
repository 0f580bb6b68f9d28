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
_SEQ_INF = 2**62  # "no sequence info": deletes apply (pre-v2 behavior)


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
) -> tuple[
    list[tuple[str, int]],
    list[tuple[str, int]],
    list[tuple[str, list[str], int]],
]:
    """([(data file, data seq)], [(positional-delete file, delete seq)],
    [(equality-delete file, matched column names, delete seq)]) for a
    snapshot. Sequence numbers scope merge-on-read deletes (Iceberg v2):
    an equality delete applies only to data files with a STRICTLY smaller
    data sequence number, a positional delete to files with seq <= its
    own. Entries with no sequence info (v1 tables, minimal fixtures) get
    data seq 0 / delete seq _SEQ_INF, i.e. deletes apply — the pre-v2
    behavior."""
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
    data_files: list[tuple[str, int]] = []
    delete_files: list[tuple[str, int]] = []
    eq_deletes: list[tuple[str, list[str], int]] = []
    for m in _read_avro(mlist):
        mpath = _localize(m["manifest_path"], table_path)
        mseq = m.get("sequence_number")
        for entry in _read_avro(mpath):
            if entry.get("status") == 2:  # DELETED entry: file left the table
                continue
            df = entry.get("data_file") or {}
            content = df.get("content", 0) or 0
            fpath = _localize(df["file_path"], table_path)
            fmt = (df.get("file_format") or "PARQUET").upper()
            # entry seq, inheriting the manifest's when null (the spec's
            # inheritance rule for ADDED entries; best-effort for the rest)
            seq = entry.get("sequence_number")
            if seq is None:
                seq = mseq
            if fmt != "PARQUET":
                raise LoadError(
                    f"iceberg table {table_path}: {fmt} data files not supported"
                )
            if content == 0:
                data_files.append((fpath, 0 if seq is None else int(seq)))
            elif content == 1:
                delete_files.append((fpath, _SEQ_INF if seq is None else int(seq)))
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
                eq_deletes.append((fpath, cols, _SEQ_INF if seq is None else int(seq)))
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
    if "incremental_from_snapshot" in ts.option:
        from pyspark.sql import functions as F

        to = ts.option.get("incremental_to_snapshot")
        pairs = incremental_files(
            ts.uri,
            int(ts.option["incremental_from_snapshot"]),
            None if to is None else int(to),
        )
        if not pairs:
            raise LoadError(
                f"iceberg table {ts.name!r}: no appended files in range"
            )
        parts = []
        by_snap: dict[int, list[str]] = {}
        for sid, path in pairs:
            by_snap.setdefault(sid, []).append(path)
        for sid, files in sorted(by_snap.items()):
            parts.append(
                spark.read.option("basePath", ts.uri).parquet(*files)
                .withColumn("_snapshot_id", F.lit(sid).cast("bigint"))
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out
    snap = ts.option.get("snapshot_id")
    ts_ms = ts.option.get("timestamp_ms")
    if ts_ms is None and "timestamp" in ts.option:
        from datetime import datetime, timezone

        dt = datetime.fromisoformat(str(ts.option["timestamp"]))
        if dt.tzinfo is None:  # naive strings mean UTC; keep explicit offsets
            dt = dt.replace(tzinfo=timezone.utc)
        ts_ms = int(dt.timestamp() * 1000)
    data, delete_files, eq_deletes = snapshot_files(
        ts.uri,
        snapshot_id=None if snap is None else int(snap),
        timestamp_ms=None if ts_ms is None else int(ts_ms),
    )
    if not data:
        raise LoadError(f"iceberg table {ts.name!r}: snapshot has no data files")
    df = spark.read.option("basePath", ts.uri).parquet(*[p for p, _ in data])
    if not delete_files and not eq_deletes:
        return df
    return _apply_deletes(spark, df, data, delete_files, eq_deletes, ts)


def _norm_path(col):
    """URI -> literal path: strip the file: scheme and percent-decode
    (_metadata.file_path encodes e.g. space as %20; the delete files'
    recorded paths may be literal). Decoding BOTH join sides makes the
    (file, row) anti-join immune to encoding mismatches that would
    silently resurrect deleted rows. '+' is pre-escaped because Spark's
    url_decode is form-decoding ('+' means space there, not in URIs)."""
    from pyspark.sql import functions as F

    return F.url_decode(
        F.replace(
            F.regexp_replace(col, "^file:/+", "/"),
            F.lit("+"),
            F.lit("%2B"),
        )
    )


def _rebase_dv_path(col, base: str):
    """Rebase a recorded absolute delete-file path onto the current table
    root, splitting on the FIRST '/data/' — the same anchor _localize
    uses for the data files, so both sides of the (file, row) anti-join
    resolve identically even when the layout nests another 'data'
    segment."""
    from pyspark.sql import functions as F

    rest = F.element_at(F.split(col, "/data/", 2), 2)
    # base + "/": a bare prefix test would wrongly treat a SIBLING
    # directory whose name extends the table root as "inside" it
    # (e.g. <root>.tmp-… staging paths recorded before an atomic
    # rename into <root>) and skip the rebase
    return F.when(
        col.contains("/data/") & ~col.startswith(base + "/"),
        F.concat(F.lit(base + "/data/"), rest),
    ).otherwise(col)


def _apply_deletes(
    spark: SparkSession,
    df: DataFrame,
    data: list[tuple[str, int]],
    delete_files: list[tuple[str, int]],
    eq_deletes: list[tuple[str, list[str], int]],
    ts: TableSource,
) -> DataFrame:
    """Merge-on-read: annotate each row with its file's data sequence
    number (broadcast file->seq map on the scan's ``_metadata`` path),
    then anti-join positional deletes (applies when delete seq >= data
    seq) and equality deletes (STRICTLY greater, per spec — a row
    re-inserted after the delete survives). Delete sets are small scans
    broadcast into the joins — the standard merge-on-read shape at any
    scale."""
    from pyspark.sql import functions as F

    out_cols = df.columns
    seq_rows = [(os.path.abspath(p), int(s)) for p, s in data]
    seq_df = spark.createDataFrame(seq_rows, "_file string, _data_seq bigint")
    df = (
        df.withColumn("_file", _norm_path(F.col("_metadata.file_path")))
        .withColumn("_row", F.col("_metadata.row_index"))
        .join(F.broadcast(seq_df), "_file", "left")
        .withColumn("_data_seq", F.coalesce("_data_seq", F.lit(0)))
    )
    base = os.path.abspath(ts.uri)
    if delete_files:
        parts = []
        for path, dseq in delete_files:
            parts.append(
                spark.read.parquet(path).select(
                    _rebase_dv_path(_norm_path(F.col("file_path")), base).alias("_dv_file"),
                    F.col("pos").cast("bigint").alias("_dv_row"),
                    F.lit(int(dseq)).alias("_dv_seq"),
                )
            )
        dv = parts[0]
        for extra in parts[1:]:
            dv = dv.unionByName(extra)
        df = df.join(
            F.broadcast(dv),
            (F.col("_file") == F.col("_dv_file"))
            & (F.col("_row") == F.col("_dv_row"))
            & (F.col("_dv_seq") >= F.col("_data_seq")),
            "left_anti",
        )
    for path, cols, dseq in eq_deletes:
        missing = [c for c in cols if c not in out_cols]
        if missing:
            raise LoadError(
                f"iceberg table {ts.name!r}: equality delete columns {missing} "
                "not present in the data schema"
            )
        dels = spark.read.parquet(path).select(
            *[F.col(c).alias(f"_eq_{c}") for c in cols]
        ).distinct()
        cond = F.col("_data_seq") < F.lit(int(dseq))
        for c in cols:
            # the spec's null-equals-null matching -> eqNullSafe keys
            cond = cond & F.col(c).eqNullSafe(F.col(f"_eq_{c}"))
        df = df.join(F.broadcast(dels), cond, "left_anti")
    return df.select(*out_cols)


def incremental_files(
    table_path: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
) -> list[tuple[int, str]]:
    """Incremental append scan (Iceberg spec): [(snapshot_id, data file)]
    for files ADDED by snapshots after ``from_snapshot_id`` (exclusive)
    up to ``to_snapshot_id`` (inclusive; default current). Snapshots are
    ordered by ancestry when parent-snapshot-id is present, else by
    timestamp-ms. Any non-append snapshot in the range (replace /
    overwrite / delete — whose changes an append-only scan cannot
    represent) fails loudly, matching the reference engines."""
    meta_path = _metadata_path(table_path)
    with open(meta_path) as f:
        meta = json.load(f)
    snaps = meta.get("snapshots") or []
    by_id = {s["snapshot-id"]: s for s in snaps}
    if from_snapshot_id not in by_id:
        raise LoadError(
            f"iceberg table {table_path}: from-snapshot {from_snapshot_id} "
            "not found"
        )
    if to_snapshot_id is None:
        to_snapshot_id = meta.get("current-snapshot-id")
        if to_snapshot_id in (None, -1):
            to_snapshot_id = max(
                snaps, key=lambda s: s.get("timestamp-ms", 0)
            )["snapshot-id"]
    if to_snapshot_id not in by_id:
        raise LoadError(
            f"iceberg table {table_path}: to-snapshot {to_snapshot_id} not found"
        )
    if by_id[to_snapshot_id].get("parent-snapshot-id") is not None:
        chain = []
        cur = to_snapshot_id
        while cur is not None and cur != from_snapshot_id:
            s = by_id.get(cur)
            if s is None:
                raise LoadError(
                    f"iceberg table {table_path}: broken snapshot ancestry "
                    f"at {cur}"
                )
            chain.append(s)
            cur = s.get("parent-snapshot-id")
        if cur != from_snapshot_id:
            raise LoadError(
                f"iceberg table {table_path}: {from_snapshot_id} is not an "
                f"ancestor of {to_snapshot_id}"
            )
        ordered = list(reversed(chain))
    else:  # minimal metadata without parent links: timestamp order
        t_from = by_id[from_snapshot_id].get("timestamp-ms", 0)
        t_to = by_id[to_snapshot_id].get("timestamp-ms", 0)
        ordered = sorted(
            (s for s in snaps
             if t_from < s.get("timestamp-ms", 0) <= t_to),
            key=lambda s: s.get("timestamp-ms", 0),
        )
    out: list[tuple[int, str]] = []
    for s in ordered:
        op = (s.get("summary") or {}).get("operation", "append")
        if op != "append":
            raise LoadError(
                f"iceberg table {table_path}: incremental read across "
                f"non-append snapshot {s['snapshot-id']} (operation={op})"
            )
        mlist = _localize(s["manifest-list"], table_path)
        for m in _read_avro(mlist):
            if m.get("added_snapshot_id") != s["snapshot-id"]:
                continue
            if (m.get("content") or 0) != 0:
                continue  # no delete manifests in an append snapshot
            for entry in _read_avro(_localize(m["manifest_path"], table_path)):
                if entry.get("status") != 1:  # ADDED only
                    continue
                df = entry.get("data_file") or {}
                out.append(
                    (s["snapshot-id"], _localize(df["file_path"], table_path))
                )
    return out
