"""Apache Hudi Copy-on-Write loader — pure-Python timeline replay.

Completes the no-jars lakehouse trio next to Delta (txn-log replay,
``delta.py``) and Iceberg (metadata replay, ``iceberg.py``); the
reference supports neither Hudi nor Iceberg (columnq/src/table/mod.rs
format list), so this is an extension, built from the public Hudi spec:

  .hoodie/<instant>.commit          completed write (JSON: per-partition
                                    write stats naming the base files)
  .hoodie/<instant>.replacecommit   clustering / insert_overwrite (JSON:
                                    partitionToReplaceFileIds + new files)
  .hoodie/<instant>.commit.requested / .inflight   incomplete — ignored

Copy-on-Write read-optimized view: every write produces whole base
parquet files named ``<fileId>_<token>_<instant>.parquet``; a reader
takes, per file group (fileId), the base file of the LATEST completed
instant, skipping file groups replaced by a later replacecommit. Time
travel: ``option.as_of_instant`` truncates the timeline (instants are
lexicographically ordered timestamps, so a string compare suffices).

Scale: the timeline lists file paths — no data scan; the selected base
files feed one ``spark.read.parquet`` (predicate pushdown / column
pruning as usual). Hive-style partition directories surface as typed
columns via basePath-option, matching the delta/iceberg loaders.
MERGE_ON_READ tables (log files needing compaction to read) fail loudly
naming the limitation rather than returning partial rows.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from roapi_spark.config import TableSource


class HudiError(ValueError):
    pass


_COMPLETED = (".commit", ".replacecommit")


def _timeline(meta_dir: str) -> list[tuple[str, str, str]]:
    """[(instant, kind, path)] for completed commits, sorted by instant."""
    out = []
    for name in os.listdir(meta_dir):
        base = os.path.join(meta_dir, name)
        if not os.path.isfile(base):
            continue
        for suffix in _COMPLETED:
            if name.endswith(suffix) and not name.endswith(
                (".requested", ".inflight")
            ):
                # instants are timestamp strings; ordering is lexical
                instant = name[: -len(suffix)]
                out.append((instant, suffix.lstrip("."), base))
                break
    return sorted(out)


def table_files(root: str, as_of_instant: str | None = None) -> list[str]:
    """Resolve the read-optimized file set of a CoW table at (optionally)
    a historical instant."""
    meta_dir = os.path.join(root, ".hoodie")
    if not os.path.isdir(meta_dir):
        raise HudiError(f"not a hudi table (no .hoodie): {root}")
    props = os.path.join(meta_dir, "hoodie.properties")
    if os.path.exists(props):
        text = open(props).read()
        for line in text.splitlines():
            if line.strip().startswith("hoodie.table.type") and "MERGE_ON_READ" in line:
                raise HudiError(
                    "MERGE_ON_READ hudi tables need log-file compaction "
                    "(hudi-spark bundle); only COPY_ON_WRITE reads here"
                )
    # (partition, fileId) -> (instant, relative path)
    groups: dict[tuple[str, str], tuple[str, str]] = {}
    for instant, kind, path in _timeline(meta_dir):
        if as_of_instant is not None and instant > str(as_of_instant):
            break
        try:
            meta = json.loads(open(path).read())
        except ValueError as exc:
            raise HudiError(f"malformed hudi commit {path}: {exc}") from exc
        if kind == "replacecommit":
            for part, fids in (meta.get("partitionToReplaceFileIds") or {}).items():
                for fid in fids:
                    groups.pop((part, fid), None)
        for part, stats in (meta.get("partitionToWriteStats") or {}).items():
            for st in stats or []:
                fid = st.get("fileId")
                rel = st.get("path")
                if not fid or not rel:
                    continue
                cur = groups.get((part, fid))
                if cur is None or instant >= cur[0]:
                    groups[(part, fid)] = (instant, rel)
    files = []
    for (_part, _fid), (_instant, rel) in sorted(groups.items()):
        p = os.path.join(root, rel)
        if not os.path.exists(p):
            raise HudiError(f"hudi base file missing on disk: {p}")
        files.append(p)
    return files


def to_dataframe(spark: SparkSession, ts: TableSource) -> DataFrame:
    from roapi_spark.sources import LoadError

    if "incremental_from" in ts.option:
        from pyspark.sql import functions as F

        try:
            pairs = incremental_file_slices(
                ts.uri,
                str(ts.option["incremental_from"]),
                ts.option.get("incremental_to"),
            )
        except (HudiError, OSError) as exc:
            raise LoadError(f"hudi table {ts.name!r}: {exc}") from exc
        if not pairs:
            raise LoadError(
                f"hudi table {ts.name!r}: no commits in incremental range"
            )
        parts = []
        by_instant: dict[str, list[str]] = {}
        for instant, p in pairs:
            by_instant.setdefault(instant, []).append(p)
        for instant, files in sorted(by_instant.items()):
            parts.append(
                spark.read.option("basePath", ts.uri).parquet(*files)
                .withColumn("_commit_instant", F.lit(instant))
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        # CoW rewrites whole base files: when the data carries Hudi's
        # per-row _hoodie_commit_time meta column, refine to rows
        # actually written in the range (carried-over rows drop out)
        if "_hoodie_commit_time" in out.columns:
            out = out.filter(
                F.col("_hoodie_commit_time") > str(ts.option["incremental_from"])
            )
        return out
    try:
        files = table_files(
            ts.uri, ts.option.get("as_of_instant")
        )
    except (HudiError, OSError) as exc:
        raise LoadError(f"hudi table {ts.name!r}: {exc}") from exc
    if not files:
        raise LoadError(f"hudi table {ts.name!r}: no completed commits")
    from pyspark.sql import functions as F

    from roapi_spark.types import parse_data_type

    # basePath keeps hive-style partition dirs surfacing as typed columns
    df = spark.read.option("basePath", ts.uri).parquet(*files)
    if ts.schema is not None:  # declared schema wins (same as parquet/orc)
        df = df.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in ts.schema.fields]
        )
    for pc in ts.partition_columns:
        if pc.name in df.columns:
            df = df.withColumn(
                pc.name, F.col(pc.name).cast(parse_data_type(pc.data_type))
            )
    return df


def incremental_file_slices(
    root: str, from_instant: str, to_instant: str | None = None
) -> list[tuple[str, str]]:
    """[(instant, base file)] for the LATEST in-range file slice of every
    file group written by completed commits with ``from_instant <
    instant <= to_instant`` — the file set behind Hudi's incremental
    query on a CoW table. One slice per group, not every slice: a group
    rewritten twice inside the range would otherwise contribute its
    carried-over rows twice (CoW base files are whole-file rewrites).
    Precise per-row attribution within a slice needs the
    ``_hoodie_commit_time`` meta column, which the loader filters on
    when present."""
    meta_dir = os.path.join(root, ".hoodie")
    if not os.path.isdir(meta_dir):
        raise HudiError(f"not a hudi table (no .hoodie): {root}")
    latest: dict[tuple[str, str], tuple[str, str]] = {}
    for instant, _kind, path in _timeline(meta_dir):
        if instant <= str(from_instant):
            continue
        if to_instant is not None and instant > str(to_instant):
            break
        try:
            meta = json.loads(open(path).read())
        except ValueError as exc:
            raise HudiError(f"malformed hudi commit {path}: {exc}") from exc
        for part, stats in (meta.get("partitionToWriteStats") or {}).items():
            for st in stats or []:
                rel = st.get("path")
                fid = st.get("fileId") or rel
                if rel:
                    latest[(part, fid)] = (instant, os.path.join(root, rel))
    return sorted(latest.values())
