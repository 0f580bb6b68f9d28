"""Delta Lake writer (pure-Python transaction log + Spark parquet data).

The symmetric half of ``roapi_spark/sources/delta.py``: data files are
written by Spark's parquet writer (distributed, scales with the
cluster), then ONE driver-side commit publishes them atomically by
appending a JSON entry to ``_delta_log/`` with O_EXCL create — the same
optimistic-concurrency rule delta-rs uses on a local/HDFS store, so a
racing writer loses with a clear conflict error instead of corrupting
the table. Protocol is pinned at (1, 2): no reader features are
required, so ANY Delta reader (including this repo's own log replay and
the reference's delta-rs scan, columnq/src/table/delta.rs) can read the
output.

At 100 TB the data volume moves through executors; the log entry is
KB-scale driver work per commit — the standard Delta architecture.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from urllib.parse import quote, unquote

from pyspark.sql import DataFrame


class DeltaWriteError(Exception):
    pass


class DeltaCommitConflict(DeltaWriteError):
    """Another writer committed the same version first (optimistic
    concurrency loss). Re-read the table state and retry."""


def _log_dir(path: str) -> str:
    return os.path.join(path, "_delta_log")


def _existing_versions(log_dir: str) -> list[int]:
    if not os.path.isdir(log_dir):
        return []
    out = []
    for name in os.listdir(log_dir):
        stem, ext = os.path.splitext(name)
        if ext == ".json" and len(stem) == 20 and stem.isdigit():
            out.append(int(stem))
    return sorted(out)


def _relocate_staging(staging: str, dest: str) -> list[str]:
    """Move part files (preserving hive partition subdirs) from the
    staging write into the table root; returns relative paths."""
    rels = []
    for root, _dirs, files in os.walk(staging):
        for name in files:
            if not name.endswith(".parquet"):
                continue  # _SUCCESS, .crc
            src = os.path.join(root, name)
            rel = os.path.relpath(src, staging)
            target = os.path.join(dest, rel)
            os.makedirs(os.path.dirname(target), exist_ok=True)
            os.replace(src, target)
            rels.append(rel)
    return rels


def _partition_values(rel: str, partition_by: list[str]) -> dict[str, str | None]:
    """Parse hive ``col=val`` segments into add.partitionValues (Delta
    stores them as strings; __HIVE_DEFAULT_PARTITION__ means NULL)."""
    vals: dict[str, str | None] = {}
    for seg in rel.split(os.sep)[:-1]:
        if "=" not in seg:
            continue
        k, _, v = seg.partition("=")
        vals[k] = None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
    return {c: vals.get(c) for c in partition_by}


def _current_protocol(log_dir: str, versions: list[int]) -> dict | None:
    """Latest protocol action in the log (last-protocol-wins replay),
    or None for a log that never declared one. Driver-side scan of the
    KB-scale entries, newest first."""
    for v in reversed(versions):
        found = None
        with open(os.path.join(log_dir, f"{v:020d}.json")) as f:
            for line in f:
                if not line.strip():
                    continue
                a = json.loads(line)
                if "protocol" in a:
                    found = a["protocol"]
        if found is not None:
            return found
    return None


def _cdf_protocol_upgrade(log_dir: str, versions: list[int]) -> dict | None:
    """Protocol action needed to enable CDF on an existing table, or
    None when the current protocol already suffices. NEVER emits a
    downgrade: a foreign table at (3,7) with feature lists already
    satisfies writer v4 semantics via its features, and rewriting its
    protocol to (1,4) would stop readers enforcing those features
    (e.g. deletionVectors masks — silent resurrect of deleted rows)."""
    cur = _current_protocol(log_dir, versions) or {}
    cur_r = int(cur.get("minReaderVersion", 1))
    cur_w = int(cur.get("minWriterVersion", 1))
    if cur_w >= 4:
        return None  # already high enough (incl. feature-based v7)
    return {
        "protocol": {
            "minReaderVersion": max(cur_r, 1),
            "minWriterVersion": 4,
        }
    }


def _file_stats(abs_path: str) -> str | None:
    """Delta per-file statistics JSON (numRecords + min/max/nullCount
    for primitively-typed leaf columns) from the parquet footer — a
    driver-side metadata read, no data pages touched. Real Delta
    readers (delta-rs, delta-spark) use these for file skipping; cost
    is O(row groups), so at cluster scale this stays a per-commit
    footer pass exactly like delta-spark's own stats collection."""
    import pyarrow.parquet as pq

    try:
        md = pq.ParquetFile(abs_path).metadata
        mins: dict = {}
        maxs: dict = {}
        nulls: dict = {}
        # Readers PRUNE files on these values, so partial coverage is
        # worse than absence: a column missing stats in ANY row group is
        # dropped from the emitted maps rather than reported as if the
        # remaining groups were file-complete (an all-null group with
        # nullCount 0 would let `x IS NULL` skip a file that has nulls).
        bad_minmax: set = set()
        bad_null: set = set()
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if "." in name:
                    continue  # nested leaves: skipped (like partition cols)
                st = col.statistics
                if st is None:
                    bad_minmax.add(name)
                    bad_null.add(name)
                    continue
                # nullCount accumulates independently of min/max presence
                if st.null_count is None:
                    bad_null.add(name)
                else:
                    nulls[name] = nulls.get(name, 0) + st.null_count
                if not st.has_min_max:
                    # an all-null group legitimately has no min/max and
                    # doesn't affect the file's non-null min/max; anything
                    # else means coverage is unknown → drop the column
                    if st.null_count != g.num_rows:
                        bad_minmax.add(name)
                    continue
                lo, hi = st.min, st.max
                if isinstance(lo, bytes):
                    bad_minmax.add(name)  # undecoded physical bytes
                    continue
                mins[name] = lo if name not in mins else min(mins[name], lo)
                maxs[name] = hi if name not in maxs else max(maxs[name], hi)
        for name in bad_minmax:
            mins.pop(name, None)
            maxs.pop(name, None)
        for name in bad_null:
            nulls.pop(name, None)
        def _json_safe(d: dict) -> dict:
            out = {}
            for k, v in d.items():
                out[k] = v.isoformat() if hasattr(v, "isoformat") else v
            return out

        return json.dumps(
            {
                "numRecords": md.num_rows,
                "minValues": _json_safe(mins),
                "maxValues": _json_safe(maxs),
                "nullCount": nulls,
            },
            separators=(",", ":"),
            default=str,
        )
    except Exception:  # noqa: BLE001 — stats are optional; never fail a commit
        return None


def write_delta(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    operation: str | None = None,
    operation_params: dict | None = None,
    configuration: dict | None = None,
    data_change: bool = True,
    base_version: int | None = None,
) -> int:
    """Write ``df`` as a new Delta table version; returns the committed
    version number. ``mode='append'`` adds files; ``mode='overwrite'``
    logically removes every previously-active file in the same atomic
    commit (time travel to old versions still works — nothing is
    physically deleted). ``operation``/``operation_params`` override the
    commitInfo stamp (compact() records OPTIMIZE, like delta-spark, so
    DESCRIBE HISTORY tells a rewrite from a compaction).

    ``configuration`` sets table properties in the metaData action
    (e.g. ``{"delta.enableChangeDataFeed": "true"}`` — DML then emits
    ``_change_data/`` cdc files); an overwrite with ``configuration=
    None`` carries the existing properties forward, like delta-spark.
    ``data_change=False`` marks the commit's add/remove actions as
    physical rearrangement (compaction), invisible to CDF readers."""
    if mode not in ("append", "overwrite"):
        raise DeltaWriteError(f"unsupported mode {mode!r}")
    partition_by = list(partition_by or [])
    missing = [c for c in partition_by if c not in df.columns]
    if missing:
        raise DeltaWriteError(f"partition columns not in DataFrame: {missing}")

    log_dir = _log_dir(path)
    versions = _existing_versions(log_dir)
    version = (versions[-1] + 1) if versions else 0
    if base_version is not None:
        # snapshot-derived overwrite (compact): the caller's input df was
        # computed FROM the snapshot at base_version, so this commit must
        # land at exactly base_version + 1. Re-listing the log here let a
        # DML that committed mid-compaction be silently clobbered by
        # stale rewritten data (lost update, found by the chaos soak);
        # pinning turns that race into a loud DeltaCommitConflict — the
        # early check catches a pre-staging winner cheaply, the O_EXCL
        # create below catches one that lands during the staging write.
        if not versions or versions[-1] != base_version:
            raise DeltaCommitConflict(
                f"snapshot at version {base_version} is no longer the "
                f"table head ({versions[-1] if versions else 'empty'}): "
                "a concurrent commit landed; re-read and retry"
            )
        version = base_version + 1
    if versions and mode == "append":
        # appends must match the table schema by NAME AND TYPE (Delta
        # append semantics; delta-spark rejects incompatible types too —
        # a name-only check would commit mixed physical types and make
        # every subsequent read fail on merge-incompatible parquet)
        from pyspark.sql import types as T

        from roapi_spark.sources.delta import snapshot_state

        _, meta = snapshot_state(path)
        if meta and meta.get("schemaString"):
            table_schema = T.StructType.fromJson(
                json.loads(meta["schemaString"])
            )
            existing = {
                f.name: f.dataType.simpleString() for f in table_schema.fields
            }
            ours = {
                f.name: f.dataType.simpleString() for f in df.schema.fields
            }
            if ours != existing:
                raise DeltaWriteError(
                    f"append schema mismatch: table has {sorted(existing.items())}, "
                    f"DataFrame has {sorted(ours.items())} (use "
                    "mode='overwrite' to replace the schema)"
                )

    # 1) distributed data write into a staging dir, then rename into the
    #    table root — renames are metadata-only on a local store, and the
    #    files stay invisible to readers until the log commit below
    staging = os.path.join(path, f"_staging-{uuid.uuid4().hex}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)
    try:
        rels = _relocate_staging(staging, path)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    now_ms = int(time.time() * 1000)

    # 2) compose the commit
    actions: list[dict] = []
    if version == 0 or mode == "overwrite":
        conf = configuration
        if conf is None:
            conf = {}
            if versions:  # overwrite keeps table properties (delta-spark)
                from roapi_spark.sources.delta import snapshot_state

                _, prior_meta = snapshot_state(path)
                conf = dict((prior_meta or {}).get("configuration") or {})
        cdf = str(conf.get("delta.enableChangeDataFeed", "")).lower() == "true"
        if version == 0:
            actions.append(
                {
                    "protocol": {
                        "minReaderVersion": 1,
                        # CDF requires writer v4 (Delta PROTOCOL.md)
                        "minWriterVersion": 4 if cdf else 2,
                    }
                }
            )
        elif cdf and configuration is not None:
            # property newly set on an existing table: upgrade protocol
            # (only ever RAISE it — never rewrite a higher one down)
            up = _cdf_protocol_upgrade(log_dir, versions)
            if up is not None:
                actions.append(up)
        actions.append(
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df.schema.json(),
                    "partitionColumns": partition_by,
                    "configuration": conf,
                    "createdTime": now_ms,
                }
            }
        )
    if mode == "overwrite" and versions:
        from roapi_spark.sources.delta import snapshot_raw_state

        # remove actions must echo the STORED add-path string verbatim —
        # log replay (ours and delta-rs alike) matches add/remove by exact
        # string, and external writers (delta-spark) store hive-partition
        # paths with a literal '=' that quote() would mangle to %3D,
        # leaving every old file permanently active (silent stale reads)
        # pinned to the version this commit builds on: a commit landing
        # mid-write must never leak its files into our remove list (the
        # O_EXCL create would reject this commit anyway — pinning keeps
        # the composed actions consistent with the version we claim)
        active_raw, _ = snapshot_raw_state(
            path,
            version=versions[-1] if base_version is None else base_version,
        )
        for stored_path in active_raw:
            actions.append(
                {
                    "remove": {
                        "path": stored_path,
                        "deletionTimestamp": now_ms,
                        "dataChange": data_change,
                    }
                }
            )
    for rel in sorted(rels):
        st = os.stat(os.path.join(path, rel))
        actions.append(
            {
                "add": {
                    # percent-encode per the Delta path spec, but keep '='
                    # literal: delta-spark/delta-rs store hive partition
                    # segments as 'col=val', and readers match strings
                    "path": quote(rel, safe="/="),
                    "partitionValues": _partition_values(rel, partition_by),
                    "size": st.st_size,
                    "modificationTime": int(st.st_mtime * 1000),
                    "dataChange": data_change,
                    "stats": _file_stats(os.path.join(path, rel)),
                }
            }
        )
    # commitInfo FIRST, like delta-spark: history/audit readers find it
    # on line 1 instead of scanning past every add action
    actions.insert(
        0,
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": operation or "WRITE",
                "operationParameters": operation_params
                or {"mode": mode.upper()},
            }
        },
    )

    # 3) atomic publish: O_EXCL create of the next version file. An
    #    append reads no table state, so a lost race auto-retries at the
    #    new tail (delta-spark append semantics — see _atomic_commit);
    #    overwrite's removes are pinned to the snapshot it listed, and a
    #    racing create-vs-create is a real conflict, so neither retries.
    return _atomic_commit(
        path,
        version,
        actions,
        rels,
        append_retry=(mode == "append" and version > 0),
    )


def _intervening_metadata_change(log_dir: str, from_version: int) -> bool:
    """True if any committed version >= from_version carries a metaData
    or protocol action — a schema/feature change an append built on the
    older snapshot must not be blindly re-committed over."""
    for v in _existing_versions(log_dir):
        if v < from_version:
            continue
        try:
            with open(os.path.join(log_dir, f"{v:020d}.json")) as f:
                for line in f:
                    if not line.strip():
                        continue
                    a = json.loads(line)
                    if "metaData" in a or "protocol" in a:
                        return True
        except (OSError, ValueError):
            # unreadable OR half-written entry (commit publish is a plain
            # open('x')+write, so a concurrent writer's partial file can
            # fail json.loads): be conservative — treating it as a
            # metadata change keeps the caller on the rollback-and-
            # conflict path instead of letting JSONDecodeError escape
            # past the staged-file cleanup
            return True
    return False


def _atomic_commit(
    path: str,
    version: int,
    actions: list[dict],
    rels: list[str],
    *,
    append_retry: bool = False,
    max_retries: int = 8,
) -> int:
    """O_EXCL-create the next log entry; on a lost race, roll back the
    (still unreferenced) staged data files and raise a conflict.

    ``append_retry=True`` enables the logical conflict resolution
    delta-spark applies to blind appends (OptimisticTransaction's
    commit-retry loop): an append reads nothing, so a commit that lost
    the O_EXCL race is re-pointed at the new tail version and retried
    with the SAME staged files — unless an intervening commit changed
    metaData/protocol (schema may have moved under us: surface the
    conflict so the caller re-validates) or the log listing shows no
    progress (can't tell what won: surface)."""
    log_dir = _log_dir(path)
    os.makedirs(log_dir, exist_ok=True)
    body = "".join(json.dumps(a, separators=(",", ":")) + "\n" for a in actions)
    # publish via fully-written tmp + hard link: os.link is atomic AND
    # exclusive (FileExistsError on a lost race, like O_EXCL), but the
    # entry only ever appears under its final name COMPLETE — a reader
    # listing the log mid-commit can never replay an empty/truncated
    # version file as "no actions" (the dot prefix keeps the tmp out of
    # version listings)
    import threading as _threading

    tmp = os.path.join(
        log_dir, f".commit-{os.getpid()}-{_threading.get_ident()}.json.tmp"
    )
    with open(tmp, "w") as f:
        f.write(body)
        f.flush()
        os.fsync(f.fileno())
    attempt = 0
    try:
        while True:
            entry = os.path.join(log_dir, f"{version:020d}.json")
            try:
                os.link(tmp, entry)
                return version
            except FileExistsError:
                if append_retry and attempt < max_retries:
                    if not _intervening_metadata_change(log_dir, version):
                        committed = _existing_versions(log_dir)
                        nxt = (committed[-1] + 1) if committed else version
                        if nxt > version:
                            version = nxt
                            attempt += 1
                            continue
                for rel in rels:
                    try:
                        os.remove(os.path.join(path, rel))
                    except OSError:
                        pass
                raise DeltaCommitConflict(
                    f"version {version} already committed by another "
                    f"writer: {entry}"
                ) from None
    finally:
        try:
            os.remove(tmp)
        except OSError:
            pass


def write_checkpoint(path: str) -> int:
    """Write a classic single-file parquet checkpoint
    (``_delta_log/N.checkpoint.parquet`` + ``_last_checkpoint``) of the
    latest version: full active state (protocol, latest metaData, one
    row per live add). Bounds log-replay cost for long-lived tables —
    a foreachBatch stream creates one commit per micro-batch, and
    without checkpoints every reader replays all of them. Requires the
    complete JSON history (this engine never prunes its log).

    Returns the checkpointed version. Readers seed from the checkpoint
    and replay only later commits (sources/delta.py:_checkpoint_state;
    same shape delta-spark writes, reference reads via delta-rs,
    columnq/src/table/delta.rs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    log_dir = _log_dir(path)
    versions = _existing_versions(log_dir)
    if not versions:
        raise DeltaWriteError(f"not a delta table (no log): {path}")
    if versions != list(range(versions[-1] + 1)):
        raise DeltaWriteError(
            f"incomplete log history {versions}: cannot checkpoint"
        )
    version = versions[-1]
    protocol = {"minReaderVersion": 1, "minWriterVersion": 2}
    meta: dict | None = None
    adds: dict[str, dict] = {}
    for v in versions:
        with open(os.path.join(log_dir, f"{v:020d}.json")) as f:
            for line in f:
                if not line.strip():
                    continue
                a = json.loads(line)
                if "add" in a:
                    adds[a["add"]["path"]] = a["add"]
                elif "remove" in a:
                    adds.pop(a["remove"]["path"], None)
                elif "metaData" in a:
                    meta = a["metaData"]
                elif "protocol" in a:
                    protocol = a["protocol"]
    if meta is None:
        raise DeltaWriteError(f"no metaData action in log: {path}")

    str_map = pa.map_(pa.string(), pa.string())
    schema = pa.schema(
        [
            pa.field(
                "protocol",
                pa.struct(
                    [("minReaderVersion", pa.int32()),
                     ("minWriterVersion", pa.int32())]
                ),
            ),
            pa.field(
                "metaData",
                pa.struct(
                    [
                        ("id", pa.string()),
                        ("name", pa.string()),
                        ("description", pa.string()),
                        ("format", pa.struct(
                            [("provider", pa.string()), ("options", str_map)]
                        )),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                        ("configuration", str_map),
                        ("createdTime", pa.int64()),
                    ]
                ),
            ),
            pa.field(
                "add",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("partitionValues", str_map),
                        ("size", pa.int64()),
                        ("modificationTime", pa.int64()),
                        ("dataChange", pa.bool_()),
                        ("stats", pa.string()),
                        ("deletionVector", pa.struct(
                            [
                                ("storageType", pa.string()),
                                ("pathOrInlineDv", pa.string()),
                                ("offset", pa.int32()),
                                ("sizeInBytes", pa.int32()),
                                ("cardinality", pa.int64()),
                            ]
                        )),
                    ]
                ),
            ),
        ]
    )
    rows: list[dict] = [{"protocol": protocol}, {"metaData": meta}]
    for add in adds.values():
        rows.append(
            {
                "add": {
                    "path": add["path"],
                    "partitionValues": add.get("partitionValues") or {},
                    "size": add.get("size"),
                    "modificationTime": add.get("modificationTime"),
                    "dataChange": False,  # checkpoint rows are state, not change
                    "stats": add.get("stats"),
                    "deletionVector": add.get("deletionVector"),
                }
            }
        )
    tbl = pa.Table.from_pylist(rows, schema=schema)
    tmp = os.path.join(log_dir, f".{version:020d}.checkpoint.parquet.tmp")
    pq.write_table(tbl, tmp)
    os.replace(tmp, os.path.join(log_dir, f"{version:020d}.checkpoint.parquet"))
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as f:
        json.dump({"version": version, "size": len(rows)}, f)
    return version


ZORDER_BUCKETS = 256  # per-dimension quantile buckets (8 bits interleaved)


def _zorder_col(df, cols: list[str]):
    """Morton/Z-value column over up to 4 numeric columns: each column
    is quantile-bucketed to 8 bits (boundaries via approxQuantile — a
    bounded driver-side sample sketch, the same mechanism delta-spark's
    OPTIMIZE ZORDER uses for range IDs), then the bit strings are
    interleaved so a sort by the Z-value clusters ALL dimensions at
    once. Files written from a Z-sorted layout carry tight min/max
    stats on every Z-dimension — readers skip files for predicates on
    any of them, not just the leading sort key."""
    from pyspark.sql import functions as F

    if not 1 <= len(cols) <= 4:
        raise DeltaWriteError("zorder_by takes 1-4 columns")
    probs = [i / ZORDER_BUCKETS for i in range(1, ZORDER_BUCKETS)]
    z = F.lit(0).cast("bigint")
    n = len(cols)
    zcols = []
    for c in cols:
        if df.schema[c].dataType.simpleString() not in (
            "tinyint", "smallint", "int", "bigint", "float", "double",
            "date", "timestamp",
        ):
            raise DeltaWriteError(
                f"zorder_by column {c!r} must be numeric/date, got "
                f"{df.schema[c].dataType.simpleString()}"
            )
        if df.schema[c].dataType.simpleString() == "date":
            # Spark forbids DATE->DOUBLE; days-since-epoch ranks the same
            zcols.append(F.unix_date(F.col(c)).cast("double"))
        else:
            zcols.append(F.col(c).cast("double"))
    # ONE quantile job for every Z-dimension (multi-column
    # approxQuantile runs the per-column sketches in a single scan —
    # the per-column form paid one full table scan PER dimension;
    # identical per-column boundaries, round 14)
    all_bnds = df.select(
        *[col.alias(f"__zq{ci}") for ci, col in enumerate(zcols)]
    ).approxQuantile([f"__zq{ci}" for ci in range(n)], probs, 0.01)
    for ci, col in enumerate(zcols):
        bnds = all_bnds[ci]
        bucket = F.size(
            F.filter(
                F.lit([float(b) for b in bnds]).cast("array<double>"),
                lambda b: b <= col,
            )
        ).cast("bigint")
        for bit in range(8):
            z = z + (
                F.shiftleft(
                    F.shiftright(bucket, bit).bitwiseAND(F.lit(1)),
                    bit * n + ci,
                )
            )
    return z


def compact(
    spark,
    path: str,
    target_partitions: int | None = None,
    zorder_by: list[str] | None = None,
) -> int:
    """OPTIMIZE-style compaction: rewrite the current snapshot's many
    small files (the inevitable output of per-micro-batch appends) into
    ``target_partitions`` larger ones, committed as one atomic
    overwrite version. Time travel to pre-compaction versions still
    works — compaction never physically deletes. Partitioned tables
    keep their partition columns (hive layout re-derived from the
    latest metaData).

    ``zorder_by`` additionally range-partitions and sorts the rewrite
    by a Morton Z-value over the given numeric columns (OPTIMIZE ZORDER
    BY): each output file then covers a small hyper-rectangle of the
    key space, so the per-file min/max stats written into the add
    actions let any Delta reader skip files for predicates on EVERY
    Z-dimension. Unpartitioned tables only (a hive layout already
    clusters its partition columns).

    The read snapshot is pinned: the rewrite reads, removes, and
    commits against ONE version (the log head listed up front). A
    commit that lands mid-compaction surfaces DeltaCommitConflict —
    loud and uncommitted, the caller may simply re-run the compaction
    (delta-spark raises ConcurrentWriteException on the same shape;
    pure physical rearrangement is safe to drop, unlike DML, so it
    does not re-execute via _serialize_after_winner). Without the pin,
    a DML committing between the snapshot read and the overwrite's own
    log listing was silently clobbered by the stale rewritten data
    (lost update, found by the chaos soak)."""
    from roapi_spark.config import TableSource
    from roapi_spark.sources.delta import snapshot_state, to_dataframe

    log_versions = _existing_versions(_log_dir(path))
    base = log_versions[-1] if log_versions else None
    _, meta = snapshot_state(path, version=base)
    partition_by = (meta or {}).get("partitionColumns") or []
    ts = TableSource(
        name="_compact",
        uri=path,
        format="delta",
        option={} if base is None else {"version": base},
    )
    df = to_dataframe(spark, ts)
    if zorder_by:
        if partition_by:
            raise DeltaWriteError(
                "zorder_by is supported on unpartitioned tables only"
            )
        from pyspark.sql import functions as F

        nparts = target_partitions or max(1, df.rdd.getNumPartitions() // 8)
        df = (
            df.withColumn("__z", _zorder_col(df, zorder_by))
            .repartitionByRange(nparts, F.col("__z"))
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    elif target_partitions:
        df = (
            df.repartition(target_partitions, *partition_by)
            if partition_by
            else df.repartition(target_partitions)
        )
    elif not partition_by:
        df = df.coalesce(max(1, df.rdd.getNumPartitions() // 8))
    return write_delta(
        df,
        path,
        mode="overwrite",
        partition_by=partition_by,
        operation="OPTIMIZE",
        operation_params={
            "zorderBy": json.dumps(zorder_by or []),
            "targetPartitions": str(target_partitions or ""),
        },
        # physical rearrangement, not a logical change: CDF readers must
        # not derive phantom whole-table delete+insert from a compaction
        # (delta-spark's OPTIMIZE writes dataChange=false the same way)
        data_change=False,
        base_version=base,
    )


# ---------------------------------------------------------------------------
# Row-level DML: MERGE / UPDATE / DELETE, copy-on-write
#
# The standard Delta copy-on-write strategy (the reference's delta-rs and
# delta-spark both implement this shape; columnq only READS delta —
# columnq/src/table/delta.rs — so DML is a beyond-parity extension):
# identify the files that contain affected rows (one provenance scan),
# rewrite ONLY those files, and publish remove(old)+add(new) in one atomic
# commit. At 100 TB the rewrite cost is proportional to the touched file
# set, not the table; the driver only ever holds the touched-file list
# (bounded by file count, same order as the log itself).
# ---------------------------------------------------------------------------


def _dml_snapshot(spark, path: str):
    """Current snapshot for a rewrite: (DataFrame with ``__file``
    provenance column, metaData, {normalized abs path -> raw stored add
    path}, snapshot version). The version is PINNED here — first the log
    is listed, then the replay is capped at that version — so the whole
    read-modify-write cycle operates on one consistent snapshot and the
    commit lands at exactly ``snapshot_version + 1``: a concurrent
    writer publishing in between makes the O_EXCL create fail with
    DeltaCommitConflict instead of being silently built upon. Fails
    loudly on reader features a naive rewrite would corrupt (deletion
    vectors, column mapping) — our own writer never produces them, and
    silently dropping DV masks is data loss."""
    from pyspark.sql import functions as F

    from roapi_spark.sources.delta import snapshot_raw_state

    versions = _existing_versions(_log_dir(path))
    if not versions:
        raise DeltaWriteError(f"not a delta table (no commits): {path}")
    snap_v = versions[-1]
    raw, meta = snapshot_raw_state(path, version=snap_v)
    for p, dv in raw.items():
        if dv:
            raise DeltaWriteError(
                f"DML on tables with deletion vectors is not supported: {p}"
            )
    conf = (meta or {}).get("configuration") or {}
    if conf.get("delta.columnMapping.mode", "none") != "none":
        raise DeltaWriteError("DML on column-mapped tables is not supported")
    by_abs = {
        os.path.normpath(os.path.join(path, unquote(p))): p for p in raw
    }
    files = sorted(by_abs)
    if not files:
        raise DeltaWriteError(f"empty table snapshot: {path}")
    df = (
        spark.read.option("basePath", path)
        .parquet(*files)
        .withColumn(
            "__file",
            F.regexp_replace(F.col("_metadata.file_path"), "^file:/+", "/"),
        )
    )
    return df, meta, by_abs, snap_v


def _literal_path(by_abs: dict[str, str], file_path: str) -> str:
    """Literal filesystem path for a ``__file`` provenance value (the
    ``by_abs`` KEY that matches it) — what a re-read must pass to the
    parquet reader; the URI-encoded form would look for a literal
    '%20' directory."""
    p = os.path.normpath(file_path)
    if p in by_abs:
        return p
    q = os.path.normpath(unquote(p))
    if q in by_abs:
        return q
    raise DeltaWriteError(
        f"provenance path {file_path!r} not in the pinned snapshot "
        "(file listing and log replay disagree)"
    )


def _stored_path(by_abs: dict[str, str], file_path: str) -> str:
    """Stored add path for a ``__file`` provenance value. `_metadata.
    file_path` is a URI, so Spark percent-encodes special characters
    (space -> %20, %% -> %25) while ``by_abs`` keys are literal
    filesystem paths: try the exact form first (no false decodes for
    literal '%XX' names — those arrive double-encoded), then the
    unquoted form (Hive-escaped partition values, spaces in paths)."""
    p = os.path.normpath(file_path)
    hit = by_abs.get(p)
    if hit is None:
        hit = by_abs.get(os.path.normpath(unquote(p)))
    if hit is None:
        raise DeltaWriteError(
            f"provenance path {file_path!r} not in the pinned snapshot "
            "(file listing and log replay disagree)"
        )
    return hit


def _cdf_enabled(meta: dict | None) -> bool:
    """True when the table's metaData opts into Change Data Feed
    (``delta.enableChangeDataFeed=true`` — delta-spark's property)."""
    conf = (meta or {}).get("configuration") or {}
    return str(conf.get("delta.enableChangeDataFeed", "")).lower() == "true"


def _stage_cdc(
    path: str, cdc_df, partition_by: list[str] | None = None
) -> tuple[list[dict], list[str]]:
    """Write change-data rows (table columns + ``_change_type``) as
    ``_change_data/`` parquet; returns (cdc actions, relative paths for
    conflict rollback). Per the Delta CDF spec, a commit carrying cdc
    actions is read from THEM alone — the add/remove pairs of the same
    commit are not re-derived — so these rows must describe the full
    logical change.

    Partitioned tables stage cdc files in the SAME hive layout as add
    files (delta-spark's ``_change_data/col=val/...``), with the
    partition columns carried in ``cdc.partitionValues`` and stripped
    from the physical parquet — spec-compliant readers rebuild them
    from partitionValues exactly as they do for adds, so a foreign
    CDF reader sees the partition column populated, never null."""
    partition_by = list(partition_by or [])
    staging = os.path.join(path, f"_staging-{uuid.uuid4().hex}")
    writer = cdc_df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)
    os.makedirs(os.path.join(path, "_change_data"), exist_ok=True)
    actions: list[dict] = []
    rels: list[str] = []
    try:
        for root, _dirs, files in os.walk(staging):
            for name in sorted(files):
                if not name.endswith(".parquet"):
                    continue
                part_dirs = os.path.relpath(root, staging)
                sub = "" if part_dirs == "." else part_dirs
                rel = os.path.join(
                    "_change_data", sub, f"cdc-{uuid.uuid4().hex}.parquet"
                )
                rel = os.path.normpath(rel)
                os.makedirs(
                    os.path.dirname(os.path.join(path, rel)), exist_ok=True
                )
                os.replace(os.path.join(root, name), os.path.join(path, rel))
                st = os.stat(os.path.join(path, rel))
                actions.append(
                    {
                        "cdc": {
                            "path": quote(rel, safe="/="),
                            "partitionValues": _partition_values(
                                os.path.join(sub, name), partition_by
                            ),
                            "size": st.st_size,
                            "dataChange": False,
                        }
                    }
                )
                rels.append(rel)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return actions, rels


def _rewrite_commit(
    spark,
    path: str,
    new_df,
    meta: dict | None,
    removes_raw: list[str],
    operation: str,
    params: dict,
    base_version: int,
    cdc_df=None,
) -> int:
    """Stage ``new_df`` (may be empty), relocate, and commit remove+add
    atomically at exactly ``base_version + 1`` — the version pinned by
    ``_dml_snapshot``. Re-listing the log here instead would let a
    commit that landed mid-DML be silently built upon (our removes
    could reference files it already removed); pinning turns that race
    into a clean ``DeltaCommitConflict`` from the O_EXCL create.

    ``cdc_df`` (when the table has Change Data Feed enabled) carries
    the commit's logical change rows; they are staged under
    ``_change_data/`` and published as cdc actions in the SAME atomic
    commit, and rolled back with the data files on a lost race."""
    partition_by = (meta or {}).get("partitionColumns") or []
    version = base_version + 1
    staging = os.path.join(path, f"_staging-{uuid.uuid4().hex}")
    writer = new_df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)
    try:
        rels = _relocate_staging(staging, path)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    now_ms = int(time.time() * 1000)
    actions: list[dict] = []
    cdc_rels: list[str] = []
    if cdc_df is not None:
        cdc_actions, cdc_rels = _stage_cdc(path, cdc_df, partition_by)
        actions.extend(cdc_actions)
    for stored in removes_raw:
        actions.append(
            {
                "remove": {
                    "path": stored,
                    "deletionTimestamp": now_ms,
                    "dataChange": True,
                }
            }
        )
    for rel in sorted(rels):
        st = os.stat(os.path.join(path, rel))
        actions.append(
            {
                "add": {
                    "path": quote(rel, safe="/="),
                    "partitionValues": _partition_values(rel, partition_by),
                    "size": st.st_size,
                    "modificationTime": int(st.st_mtime * 1000),
                    "dataChange": True,
                    "stats": _file_stats(os.path.join(path, rel)),
                }
            }
        )
    # commitInfo first (delta-spark layout): audit readers stop at line 1
    actions.insert(
        0,
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": operation,
                "operationParameters": params,
            }
        },
    )
    return _atomic_commit(path, version, actions, rels + cdc_rels)


# Straight-loss budget before a DML surfaces DeltaCommitConflict.
# delta-spark's maxCommitAttempts is effectively unbounded (1e7); a
# re-execution here is a full provenance scan + rewrite, so the budget
# is finite — but 3 proved too tight under a 4-writer chaos soak
# (test_delta_chaos.py found a MERGE exhausting it in 6 ops). 10 keeps
# the livelock bound while absorbing realistic multi-writer bursts.
_DML_MAX_RETRIES = 10


def _serialize_after_winner(op):
    """Logical conflict resolution for read-modify-write DML: when the
    pinned-snapshot commit loses its O_EXCL race (a writer published
    between our provenance scan and our publish), re-execute the WHOLE
    operation against the fresh snapshot and try again.

    This is strictly stronger than delta-spark's conflict checker
    (OptimisticTransaction.checkForConflicts): delta-spark re-commits
    the stale result when it can prove the winner's files are disjoint
    from the loser's read set and surfaces ConcurrentAppend/DeleteRead
    exceptions otherwise; re-execution serializes the loser AFTER the
    winner in every case — disjoint-partition MERGEs both commit, and
    overlapping DMLs compose as if run sequentially — at the price of
    recomputing the rewrite on actual races (rare by construction).
    DeltaCommitConflict still surfaces after _DML_MAX_RETRIES straight
    lost races (a livelock signal, not a correctness hazard)."""
    for attempt in range(_DML_MAX_RETRIES + 1):
        try:
            return op()
        except DeltaCommitConflict:
            if attempt == _DML_MAX_RETRIES:
                raise


def delete_delta(spark, path: str, condition: str) -> int:
    """``DELETE FROM <table> WHERE condition`` with logical conflict
    resolution (see _serialize_after_winner)."""
    return _serialize_after_winner(lambda: _delete_delta_once(spark, path, condition))


def _delete_delta_once(spark, path: str, condition: str) -> int:
    """One pinned-snapshot DELETE attempt: rewrite only the files
    containing matching rows, dropping those rows; commit atomically.
    Returns the new version (a no-match delete still commits an empty
    DML version, like delta-spark)."""
    from pyspark.sql import functions as F

    df, meta, by_abs, snap_v = _dml_snapshot(spark, path)
    cond = F.expr(condition)
    touched = [
        r["__file"]
        for r in df.filter(cond).select("__file").distinct().collect()
    ]
    data_cols = [c for c in df.columns if c != "__file"]
    # rewrite scan: re-read ONLY the touched files (the merge path's
    # pattern) — an isin filter on the derived __file column cannot
    # prune files, so it would re-scan the whole table for a
    # one-file DELETE, breaking the proportional-rewrite contract
    if touched:
        base = spark.read.option("basePath", path).parquet(
            *sorted(_literal_path(by_abs, f) for f in touched)
        )
    else:
        base = df.select(data_cols).filter(F.lit(False))
    kept = base.filter(~F.coalesce(cond, F.lit(False))).select(data_cols)
    cdc_df = None
    if _cdf_enabled(meta):
        # logical change = exactly the deleted rows (survivor re-adds in
        # the same commit are physical, not logical — the cdc rows
        # replace derivation for this commit)
        cdc_df = (
            base.filter(F.coalesce(cond, F.lit(False)))
            .select(data_cols)
            .withColumn("_change_type", F.lit("delete"))
        )
    return _rewrite_commit(
        spark,
        path,
        kept,
        meta,
        [_stored_path(by_abs, f) for f in touched],
        "DELETE",
        {"predicate": condition},
        snap_v,
        cdc_df=cdc_df,
    )


def update_delta(spark, path: str, condition: str, set: dict[str, str]) -> int:
    """``UPDATE <table> SET col=expr, ... WHERE condition`` with logical
    conflict resolution (see _serialize_after_winner)."""
    return _serialize_after_winner(
        lambda: _update_delta_once(spark, path, condition, set)
    )


def _update_delta_once(
    spark, path: str, condition: str, set: dict[str, str]
) -> int:
    """One pinned-snapshot UPDATE attempt: rewrite only the touched
    files, applying ``set`` expressions (referencing table columns) to
    matching rows. Returns the new version."""
    from pyspark.sql import functions as F

    df, meta, by_abs, snap_v = _dml_snapshot(spark, path)
    data_cols = [c for c in df.columns if c != "__file"]
    bad = [c for c in set if c not in data_cols]
    if bad:
        raise DeltaWriteError(f"SET columns not in table: {bad}")
    cond = F.expr(condition)
    touched = [
        r["__file"]
        for r in df.filter(cond).select("__file").distinct().collect()
    ]
    hit = F.coalesce(cond, F.lit(False))
    applied = [
        (
            F.when(hit, F.expr(set[c]).cast(df.schema[c].dataType))
            .otherwise(F.col(c))
            .alias(c)
            if c in set
            else F.col(c)
        )
        for c in data_cols
    ]
    # rewrite scan: re-read ONLY the touched files (see _delete_delta_once)
    if touched:
        base = spark.read.option("basePath", path).parquet(
            *sorted(_literal_path(by_abs, f) for f in touched)
        )
    else:
        base = df.select(data_cols).filter(F.lit(False))
    out = base.select(applied)
    cdc_df = None
    if _cdf_enabled(meta):
        matched = base.filter(hit)
        pre = matched.select(data_cols).withColumn(
            "_change_type", F.lit("update_preimage")
        )
        post = matched.select(applied).withColumn(
            "_change_type", F.lit("update_postimage")
        )
        cdc_df = pre.unionByName(post)
    return _rewrite_commit(
        spark,
        path,
        out,
        meta,
        [_stored_path(by_abs, f) for f in touched],
        "UPDATE",
        {"predicate": condition},
        snap_v,
        cdc_df=cdc_df,
    )


def merge_delta(
    spark,
    path: str,
    source,
    on: list[str] | None = None,
    when_matched_update: dict[str, str] | None = None,
    when_matched_delete: str | None = None,
    when_not_matched_insert: bool = True,
    check_duplicate_source: bool = True,
    on_condition: str | None = None,
    when_matched_update_condition: str | None = None,
    when_not_matched_insert_condition: str | None = None,
    target_alias: str = "t",
    source_alias: str = "s",
) -> int:
    """``MERGE INTO <table> t USING <source> s ON t.k = s.k`` with
    logical conflict resolution (see _serialize_after_winner):
    concurrent MERGEs — disjoint partitions or not — serialize instead
    of surfacing DeltaCommitConflict. Clause semantics documented on
    _merge_delta_once."""
    return _serialize_after_winner(
        lambda: _merge_delta_once(
            spark,
            path,
            source,
            on=on,
            when_matched_update=when_matched_update,
            when_matched_delete=when_matched_delete,
            when_not_matched_insert=when_not_matched_insert,
            check_duplicate_source=check_duplicate_source,
            on_condition=on_condition,
            when_matched_update_condition=when_matched_update_condition,
            when_not_matched_insert_condition=when_not_matched_insert_condition,
            target_alias=target_alias,
            source_alias=source_alias,
        )
    )


def _merge_delta_once(
    spark,
    path: str,
    source,
    on: list[str] | None = None,
    when_matched_update: dict[str, str] | None = None,
    when_matched_delete: str | None = None,
    when_not_matched_insert: bool = True,
    check_duplicate_source: bool = True,
    on_condition: str | None = None,
    when_matched_update_condition: str | None = None,
    when_not_matched_insert_condition: str | None = None,
    target_alias: str = "t",
    source_alias: str = "s",
) -> int:
    """One pinned-snapshot MERGE attempt with the three standard
    clauses, copy-on-write:

    - ``when_matched_delete``: SQL condition over ``t.*``/``s.*``;
      matched rows satisfying it are dropped (evaluated FIRST, like
      Delta's clause ordering when delete precedes update).
    - ``when_matched_update``: {target column -> SQL expr over
      ``t.*``/``s.*``} applied to remaining matched rows — optionally
      gated by ``when_matched_update_condition``.
    - ``when_not_matched_insert``: insert source rows with no target
      match (source must carry every target column).

    The match join is either the equi-key list ``on`` or an arbitrary
    ``on_condition`` SQL string (the SQL-surface router passes the
    parsed MERGE condition through); ``target_alias``/``source_alias``
    name the two sides in every expression (default ``t``/``s``).

    Only files containing matched keys are rewritten; inserts go to new
    files; one atomic commit publishes the whole MERGE. A source that
    matches any single target row more than once is an error (ambiguous
    match — same runtime check delta-spark performs) unless
    ``check_duplicate_source=False``.
    """
    from pyspark.sql import functions as F

    if (on is None) == (on_condition is None):
        raise DeltaWriteError("pass exactly one of on= or on_condition=")
    df, meta, by_abs, snap_v = _dml_snapshot(spark, path)
    data_cols = [c for c in df.columns if c != "__file"]
    if on is not None:
        missing_keys = [
            k for k in on if k not in data_cols or k not in source.columns
        ]
        if missing_keys:
            raise DeltaWriteError(f"merge keys missing from a side: {missing_keys}")
    if when_not_matched_insert:
        lack = [c for c in data_cols if c not in source.columns]
        if lack:
            raise DeltaWriteError(
                f"insert clause needs every table column in source; missing: {lack}"
            )
    if check_duplicate_source and on is not None:
        # ambiguity means a TARGET row matched by >1 source row; source
        # keys with no target match legally insert as many rows as they
        # carry (delta-spark semantics) — scope the check to keys that
        # actually exist in the target, like the on_condition path does
        dup = (
            source.join(df.select(*on).distinct(), on=on, how="left_semi")
            .groupBy(*[F.col(k) for k in on])
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise DeltaWriteError(
                "source has duplicate merge keys matching a target row "
                "(ambiguous MERGE); dedupe the source or pass "
                "check_duplicate_source=False"
            )

    src = source.withColumn("__m", F.lit(True)).alias(source_alias)
    tgt = df.alias(target_alias)
    if on_condition is not None:
        key_cond = F.expr(on_condition)
    else:
        key_cond = None
        for k in on:
            eq = F.col(f"{target_alias}.{k}") == F.col(f"{source_alias}.{k}")
            key_cond = eq if key_cond is None else (key_cond & eq)

    # touched files: one semi-join provenance scan, driver holds paths only
    touched = [
        r["__file"]
        for r in tgt.join(src, key_cond, "left_semi")
        .select("__file")
        .distinct()
        .collect()
    ]

    # rewrite scan: re-read ONLY the touched files (cheaper than an isin
    # filter over the full snapshot, and the plan prunes to those paths)
    if touched:
        base = spark.read.option("basePath", path).parquet(
            *sorted(_literal_path(by_abs, f) for f in touched)
        )
    else:
        base = df.select(data_cols).filter(F.lit(False))
    if check_duplicate_source and on_condition is not None:
        # general-condition ambiguity check: any touched target row with
        # >1 source match (the id is transient — only counts matter)
        amb = (
            base.withColumn("__tid", F.monotonically_increasing_id())
            .alias(target_alias)
            .join(src, key_cond)
            .groupBy("__tid")
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if amb:
            raise DeltaWriteError(
                "a target row matches multiple source rows (ambiguous "
                "MERGE); dedupe the source or pass "
                "check_duplicate_source=False"
            )
    joined = base.alias(target_alias).join(src, key_cond, "left")
    matched = F.coalesce(F.col(f"{source_alias}.__m"), F.lit(False))
    deleted = (
        matched & F.coalesce(F.expr(when_matched_delete), F.lit(False))
        if when_matched_delete
        else F.lit(False)
    )
    updated = matched & ~deleted
    if when_matched_update_condition is not None:
        updated = updated & F.coalesce(
            F.expr(when_matched_update_condition), F.lit(False)
        )
    upd = when_matched_update or {}
    bad = [c for c in upd if c not in data_cols]
    if bad:
        raise DeltaWriteError(f"update columns not in table: {bad}")
    rewritten = joined.filter(~deleted).select(
        [
            (
                F.when(updated, F.expr(upd[c]).cast(df.schema[c].dataType))
                .otherwise(F.col(f"{target_alias}.{c}"))
                .alias(c)
                if c in upd
                else F.col(f"{target_alias}.{c}").alias(c)
            )
            for c in data_cols
        ]
    )
    new_df = rewritten
    inserts = None
    if when_not_matched_insert:
        anti_right = (
            df.select(on).alias(target_alias)
            if on is not None
            else df.select(data_cols).alias(target_alias)
        )
        join_on = on if on is not None else key_cond
        inserts = src.join(anti_right, join_on, "left_anti")
        if when_not_matched_insert_condition is not None:
            # WHEN NOT MATCHED AND <cond> THEN INSERT — the predicate
            # sees source columns (aliased); dropping it would insert
            # every unmatched row regardless of the clause's condition
            inserts = inserts.filter(
                F.expr(when_not_matched_insert_condition)
            )
        inserts = inserts.select(
            [F.col(c).cast(df.schema[c].dataType).alias(c) for c in data_cols]
        )
        new_df = rewritten.unionByName(inserts)
    cdc_df = None
    if _cdf_enabled(meta):
        tcols = [F.col(f"{target_alias}.{c}").alias(c) for c in data_cols]
        parts = []
        if when_matched_delete:
            parts.append(
                joined.filter(deleted)
                .select(tcols)
                .withColumn("_change_type", F.lit("delete"))
            )
        if upd:
            m = joined.filter(updated)
            parts.append(
                m.select(tcols).withColumn(
                    "_change_type", F.lit("update_preimage")
                )
            )
            parts.append(
                m.select(
                    [
                        (
                            F.expr(upd[c]).cast(df.schema[c].dataType).alias(c)
                            if c in upd
                            else F.col(f"{target_alias}.{c}").alias(c)
                        )
                        for c in data_cols
                    ]
                ).withColumn("_change_type", F.lit("update_postimage"))
            )
        if inserts is not None:
            parts.append(inserts.withColumn("_change_type", F.lit("insert")))
        if parts:
            cdc_df = parts[0]
            for p in parts[1:]:
                cdc_df = cdc_df.unionByName(p)
    return _rewrite_commit(
        spark,
        path,
        new_df,
        meta,
        [_stored_path(by_abs, f) for f in touched],
        "MERGE",
        {
            "on": json.dumps(on) if on is not None else (on_condition or ""),
            "matchedUpdate": json.dumps(sorted(upd)),
            "matchedDelete": when_matched_delete or "",
            "notMatchedInsert": str(bool(when_not_matched_insert)).lower(),
        },
        snap_v,
        cdc_df=cdc_df,
    )


def restore_delta(path: str, version: int) -> int:
    """``RESTORE TABLE <t> TO VERSION AS OF <version>`` (delta-spark
    parity): ONE metadata-only commit that re-activates the target
    snapshot's file set — removes every currently-active file absent
    from the target, re-adds the target's add actions verbatim
    (path/partitionValues/size/stats echoed from the stored action) —
    so the table reads as it did at ``version`` while history keeps
    growing forward. No data file moves or rewrites; like delta-spark,
    table metadata (schema) is NOT restored, only the file set.

    Fails loudly when a target file was already VACUUMed away (the
    restore would publish dangling adds), when the json history below
    the target is incomplete, or when the target is not strictly older
    than the current version."""
    log_dir = _log_dir(path)
    versions = _existing_versions(log_dir)
    if not versions:
        raise DeltaWriteError(f"not a delta table (no log): {path}")
    head = versions[-1]
    if not 0 <= version < head:
        raise DeltaWriteError(
            f"cannot restore to version {version}: current head is {head} "
            "(target must be an older, existing version)"
        )
    if versions[: version + 1] != list(range(version + 1)):
        raise DeltaWriteError(
            f"incomplete json history below version {version}: cannot restore"
        )
    # full add actions active at the target: plain json replay 0..version
    target_adds: dict[str, dict] = {}
    for v in range(version + 1):
        with open(os.path.join(log_dir, f"{v:020d}.json")) as f:
            for line in f:
                if not line.strip():
                    continue
                a = json.loads(line)
                if "add" in a and a["add"].get("path"):
                    target_adds[a["add"]["path"]] = a["add"]
                elif "remove" in a and a["remove"].get("path"):
                    target_adds.pop(a["remove"]["path"], None)
    missing = [
        p
        for p in target_adds
        if not os.path.isfile(os.path.join(path, unquote(p)))
    ]
    # DV sidecars too: a target add carrying a file-backed deletion
    # vector ('u'/'p' storageType) is only restorable if its .bin still
    # exists — otherwise the restore would publish a dangling DV
    # reference that fails later, at read time, instead of here
    from roapi_spark.sources.deletion_vectors import _dv_file_path

    for p, add in target_adds.items():
        dv = add.get("deletionVector")
        if dv and dv.get("storageType") in ("u", "p"):
            if not os.path.isfile(_dv_file_path(dv, path)):
                missing.append(f"{p} (deletion vector)")
    if missing:
        raise DeltaWriteError(
            f"cannot restore to version {version}: {len(missing)} target "
            f"file(s) no longer exist (vacuumed?), e.g. {missing[0]!r}"
        )
    from roapi_spark.sources.delta import _norm_dv, snapshot_raw_state

    current, _meta = snapshot_raw_state(path, version=head)
    now_ms = int(time.time() * 1000)
    actions: list[dict] = [
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "RESTORE",
                "operationParameters": {"version": str(version)},
            }
        }
    ]
    for p in sorted(current):
        if p not in target_adds:
            actions.append(
                {
                    "remove": {
                        "path": p,
                        "deletionTimestamp": now_ms,
                        "dataChange": True,
                    }
                }
            )
    for p in sorted(target_adds):
        # re-add when the file is not active OR its deletion-vector
        # state changed since the target (a foreign writer's DELETE may
        # have attached a DV to a file active in both snapshots; log
        # replay treats a re-add of the same path as a DV replacement,
        # so echoing the target's action restores the undeleted rows)
        if p not in current or current[p] != _norm_dv(
            target_adds[p].get("deletionVector")
        ):
            add = dict(target_adds[p])
            add["dataChange"] = True
            actions.append({"add": add})
    return _atomic_commit(path, head + 1, actions, [])


def _commit_timestamp_ms(log_dir: str, version: int) -> int | None:
    """The commitInfo timestamp of one log entry (ms since epoch), or
    None when the commit carries no commitInfo (foreign minimal
    writers). commitInfo is the first action of every commit this
    writer produces, so the scan usually stops on line one."""
    try:
        with open(os.path.join(log_dir, f"{version:020d}.json")) as f:
            for line in f:
                if not line.strip():
                    continue
                a = json.loads(line)
                if "commitInfo" in a:
                    ts = a["commitInfo"].get("timestamp")
                    return None if ts is None else int(ts)
    except (OSError, ValueError):
        return None
    return None


def set_table_properties(path: str, props: dict[str, str]) -> int:
    """``ALTER TABLE t SET TBLPROPERTIES (...)`` (delta-spark parity):
    ONE metadata-only commit republishing the current metaData with the
    merged configuration — no data movement at any table size. Setting
    ``delta.enableChangeDataFeed=true`` on an existing table upgrades
    the protocol to minWriterVersion 4 in the same commit, after which
    DML emits cdc files. A property set to the empty string is removed
    (the cheap UNSET form)."""
    from roapi_spark.sources.delta import snapshot_state

    log_dir = _log_dir(path)
    versions = _existing_versions(log_dir)
    if not versions:
        raise DeltaWriteError(f"not a delta table (no log): {path}")
    _, meta = snapshot_state(path)
    if meta is None:
        raise DeltaWriteError(f"no metaData action in log: {path}")
    conf = dict(meta.get("configuration") or {})
    for k, v in props.items():
        if v == "":
            conf.pop(k, None)
        else:
            conf[k] = v
    now_ms = int(time.time() * 1000)
    actions: list[dict] = [
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "SET TBLPROPERTIES",
                "operationParameters": {
                    "properties": json.dumps(props, sort_keys=True)
                },
            }
        }
    ]
    if str(conf.get("delta.enableChangeDataFeed", "")).lower() == "true":
        # only ever RAISE the protocol; rewriting a foreign (3,7) table
        # down to (1,4) would stop readers enforcing its feature lists
        up = _cdf_protocol_upgrade(log_dir, versions)
        if up is not None:
            actions.append(up)
    new_meta = dict(meta)
    new_meta["configuration"] = conf
    actions.append({"metaData": new_meta})
    return _atomic_commit(path, versions[-1] + 1, actions, [])


def version_at_timestamp(path: str, timestamp: str) -> int:
    """Last committed version at or before ``timestamp`` (ISO form,
    interpreted UTC like the reader's ``option.timestamp``), resolved
    via commitInfo timestamps with a log-file-mtime fallback for
    foreign minimal writers. Backs ``RESTORE TABLE t TO TIMESTAMP AS
    OF`` (delta-spark grammar)."""
    from datetime import datetime, timezone

    log_dir = _log_dir(path)
    versions = _existing_versions(log_dir)
    if not versions:
        raise DeltaWriteError(f"not a delta table (no log): {path}")
    dt = datetime.fromisoformat(timestamp)
    # naive timestamps are interpreted as UTC; an EXPLICIT offset must
    # be honored, not overwritten (replace() would silently shift the
    # instant by the offset and restore to the wrong version)
    dt = (
        dt.astimezone(timezone.utc)
        if dt.tzinfo is not None
        else dt.replace(tzinfo=timezone.utc)
    )
    limit_ms = int(dt.timestamp() * 1000)
    eligible = []
    for v in versions:
        ts = _commit_timestamp_ms(log_dir, v)
        if ts is None:
            ts = int(
                os.path.getmtime(os.path.join(log_dir, f"{v:020d}.json")) * 1000
            )
        if ts <= limit_ms:
            eligible.append(v)
    if not eligible:
        raise DeltaWriteError(f"no delta commit at or before {timestamp}")
    return max(eligible)


def retention_keep_versions(path: str, hours: float) -> int:
    """Resolve delta-spark's time-based VACUUM retention
    (``RETAIN <n> HOURS``) to this writer's version-count contract:
    count, newest-first, the versions whose commitInfo timestamp is
    inside the retention window and stop at the first expired one
    (commit timestamps are monotone, so everything older is expired
    too). Commits without a timestamp are conservatively treated as
    recent — vacuum must never widen its reclaim set on missing
    metadata. Always >= 1: the head version is never reclaimable."""
    log_dir = _log_dir(path)
    versions = _existing_versions(log_dir)
    if not versions:
        raise DeltaWriteError(f"not a delta table (no log): {path}")
    cutoff_ms = int(time.time() * 1000) - int(hours * 3_600_000)
    keep = 0
    for v in reversed(versions):
        ts = _commit_timestamp_ms(log_dir, v)
        if ts is not None and ts < cutoff_ms:
            break
        keep += 1
    return max(keep, 1)


def vacuum(
    path: str, keep_versions: int = 2, orphan_grace_s: float = 3600.0
) -> list[str]:
    """Physically delete data files referenced ONLY by versions older
    than the newest ``keep_versions`` (plus orphans no version
    references at all — crashed writers' leftovers). The standard Delta
    trade: reclaims the space overwrite/compact left behind, and time
    travel older than the retention window stops working (the log
    entries stay, so the failure is a loud missing-file error, not
    silent corruption). Returns the deleted relative paths.

    ``orphan_grace_s``: a file referenced by NO version is only deleted
    once its mtime is older than this window — an in-flight writer has
    already relocated its staged files into the table root but not yet
    committed, and deleting them would let the imminent commit publish
    adds for missing files (delta-spark guards the same race with its
    retention check on modification time). Files a committed version
    DID reference and a later one removed carry no such risk and are
    reclaimed regardless of age."""
    log_dir = _log_dir(path)
    versions = _existing_versions(log_dir)
    if not versions:
        raise DeltaWriteError(f"not a delta table (no log): {path}")
    keep_from = versions[max(0, len(versions) - keep_versions)]

    # single incremental replay: carry the active set through every
    # version and union the snapshots inside the retention window —
    # O(total log size), not O(keep_versions x log size)
    state: dict[str, None] = {}
    referenced: set[str] = set()
    ever_referenced: set[str] = set()
    for vv in versions:
        cdc_paths: list[str] = []
        with open(os.path.join(log_dir, f"{vv:020d}.json")) as f:
            for line in f:
                if not line.strip():
                    continue
                a = json.loads(line)
                if "add" in a:
                    state[a["add"]["path"]] = None
                    ever_referenced.add(a["add"]["path"])
                elif "remove" in a:
                    state.pop(a["remove"]["path"], None)
                elif "cdc" in a:
                    cdc_paths.append(a["cdc"]["path"])
                    ever_referenced.add(a["cdc"]["path"])
        if vv >= keep_from:
            referenced |= set(state)
            # change-data files belong to their commit, not to the
            # forward-carried snapshot: keep them for every version the
            # retention window still serves (CDF reads inside the
            # window must not hit reclaimed files)
            referenced |= set(cdc_paths)
    # compare in FILESYSTEM space: stored paths may be percent-encoded
    # (ours, delta-rs) or literal (delta-spark hive '='), so unquote the
    # referenced set instead of guessing how to re-quote disk paths
    referenced = {unquote(p) for p in referenced}
    ever_referenced = {unquote(p) for p in ever_referenced}
    now = time.time()
    victims = []
    for root, _dirs, files in os.walk(path):
        if "_delta_log" in root or "_staging-" in root:
            continue
        for name in files:
            if not name.endswith(".parquet"):
                continue
            abs_file = os.path.join(root, name)
            rel = os.path.relpath(abs_file, path)
            if rel in referenced:
                continue
            if rel not in ever_referenced:
                # never committed: possibly an in-flight writer's
                # relocated staging — only reclaim once old enough
                try:
                    if now - os.path.getmtime(abs_file) < orphan_grace_s:
                        continue
                except OSError:
                    continue  # vanished under us: nothing to reclaim
            victims.append((abs_file, rel))
    # parallel unlink: at the 1M-file scale a big vacuum reclaims,
    # serial os.remove is the wall clock (unlink syscalls release the
    # GIL, so threads give a real ~Nx; measured 199 s -> tens of
    # seconds at 1M files, tools/metadata_stress.py)
    def rm(abs_file: str) -> None:
        try:
            os.remove(abs_file)
        except FileNotFoundError:
            pass  # a concurrent vacuum won this file's race — same outcome

    if len(victims) > 64:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=16) as ex:
            list(ex.map(lambda v: rm(v[0]), victims))
    else:
        for abs_file, _rel in victims:
            rm(abs_file)
    return [rel for _abs, rel in victims]
