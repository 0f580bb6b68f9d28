"""Delta Lake loader (reference: columnq/src/table/delta.rs:104-297).

Two paths:

1. delta-spark jars present -> ``spark.read.format("delta")`` with
   versionAsOf/timestampAsOf time travel (the real-cluster path).
2. jars absent (this container) -> a pure-Python transaction-log reader:
   parse ``_delta_log/*.json`` (and a parquet checkpoint if
   ``_last_checkpoint`` points at one), replay add/remove actions up to
   the requested version, and scan the surviving parquet files with
   ``spark.read.parquet`` — the same snapshot semantics the reference
   gets from delta-rs (delta.rs:104-297: DeltaTable -> file list ->
   parquet scan).  Writes/optimistic-concurrency are out of scope (the
   catalog is a read surface).

Refresh (delta.rs:62-79 DeltaTable.update) maps to re-reading the latest
snapshot — each load re-resolves the newest version.  ``option.version`` /
``option.timestamp`` select a snapshot (timestamp resolves to the last
commit whose file mtime <= timestamp, per the Delta protocol's
commit-timestamp rule).
"""

from __future__ import annotations

import json
import os
import re
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession

from roapi_spark.config import TableSource
from roapi_spark.sources import LoadError

_COMMIT_RE = re.compile(r"^(\d{20})\.json$")

# Reader features this log replay actually honors. Anything else
# (v2Checkpoint, ...) changes what "the active files" or "the columns"
# MEAN, and replaying without understanding it silently returns wrong
# rows — so we fail loudly instead (the reference gets these from
# delta-rs for free, columnq/src/table/delta.rs:104-297).
# deletionVectors (round 4): honored — the roaring bitmap is decoded in
# pure Python (sources/deletion_vectors.py) and deleted rows are
# anti-filtered via the parquet scan's _metadata.row_index.
# columnMapping (round 4): honored — Delta's schemaString is Spark
# StructType JSON, so the physicalName metadata maps parquet columns
# back to logical names (see _unmap_columns).
# v2Checkpoint (round 4): honored — UUID-named json/parquet checkpoints
# with sidecar action files are replayed (see _checkpoint_state).
_SUPPORTED_READER_FEATURES = {
    "timestampNtz",
    "deletionVectors",
    "columnMapping",
    "v2Checkpoint",
}


def _check_protocol(action: dict, table_path: str) -> None:
    """Reject protocol/metaData features the log replay does not honor."""
    if "protocol" in action:
        p = action["protocol"]
        # `or 1`: checkpoint structs surface absent fields as None
        mrv = int(p.get("minReaderVersion") or 1)
        feats = set(p.get("readerFeatures") or [])
        unsupported = feats - _SUPPORTED_READER_FEATURES
        if mrv >= 3 and unsupported:
            raise LoadError(
                f"delta table {table_path}: requires reader features "
                f"{sorted(unsupported)} which the pure-Python log replay "
                "does not support — install delta-spark jars to read it"
            )
        # minReaderVersion 2 == column mapping: honored (see _unmap_columns)
    if "metaData" in action:
        conf = action["metaData"].get("configuration") or {}
        mode = conf.get("delta.columnMapping.mode", "none")
        if mode not in ("none", "name", "id"):
            raise LoadError(
                f"delta table {table_path}: column mapping mode {mode!r} is "
                "not supported by the pure-Python log replay — install "
                "delta-spark jars"
            )


def _log_versions(log_dir: str) -> list[tuple[int, str]]:
    out = []
    for name in os.listdir(log_dir):
        m = _COMMIT_RE.match(name)
        if m:
            out.append((int(m.group(1)), os.path.join(log_dir, name)))
    return sorted(out)


def _norm_dv(dv):
    """Checkpoint parquet materializes an absent deletionVector struct as
    a dict of all-None fields — truthy, but not a DV. Treat it as None."""
    return dv if dv and dv.get("storageType") else None


def _checkpoint_files(log_dir: str, v: int) -> list[str]:
    """Checkpoint file(s) for version v: classic single-file
    (``N.checkpoint.parquet``), classic multi-part
    (``N.checkpoint.i.n.parquet``), or v2 UUID-named
    (``N.checkpoint.<uuid>.parquet|json``)."""
    prefix = f"{v:020d}.checkpoint"
    names = sorted(
        n for n in os.listdir(log_dir)
        if n.startswith(prefix) and n.endswith((".parquet", ".json"))
    )
    classic = f"{prefix}.parquet"
    if classic in names:
        return [os.path.join(log_dir, classic)]
    multi_re = re.compile(
        rf"{re.escape(prefix)}\.(\d{{10}})\.(\d{{10}})\.parquet$"
    )
    multi = [
        (int(m.group(1)), int(m.group(2)), n)
        for n in names
        if (m := multi_re.match(n))
    ]
    if multi:
        # the filename embeds (part index, total parts): a missing part
        # would silently drop every file recorded only in it — verify
        # completeness instead of seeding from whatever survived
        totals = {t for _, t, _ in multi}
        idxs = sorted(i for i, _, _ in multi)
        if len(totals) != 1 or idxs != list(range(1, idxs[-1] + 1)) or (
            idxs[-1] != next(iter(totals))
        ):
            raise ValueError(
                f"incomplete multi-part checkpoint at version {v}: "
                f"have parts {idxs} of {sorted(totals)}"
            )
        return [os.path.join(log_dir, n) for _, _, n in multi]
    return [os.path.join(log_dir, n) for n in names]  # v2 uuid-named


def _checkpoint_actions(log_dir: str, path: str):
    """Yield delta actions from a checkpoint (or sidecar) file — parquet
    rows with per-action struct columns, or json with one action per
    line (the v2 json checkpoint shape)."""
    if path.endswith(".json"):
        with open(path) as f:
            for line in f:
                if line.strip():
                    yield json.loads(line)
        return
    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    cols = [c for c in ("protocol", "metaData", "add", "remove", "sidecar")
            if c in tbl.column_names]
    data = {c: tbl.column(c).to_pylist() for c in cols}
    for i in range(tbl.num_rows):
        for c in cols:
            rec = data[c][i]
            # a checkpoint row is one action: skip the all-null struct
            # cells pyarrow materializes for the other columns
            if rec and any(val is not None for val in rec.values()):
                yield {c: _maps_to_dicts(rec)}


def _maps_to_dicts(x):
    """pyarrow materializes parquet MAP columns as lists of (k, v)
    tuples; delta actions in JSON commits carry the same fields as
    dicts (partitionValues, configuration, format.options). Normalize
    so checkpoint-sourced actions look exactly like commit-sourced
    ones — without this, a checkpointed column-mapped table would
    crash on configuration.get."""
    if isinstance(x, list):
        if x and all(isinstance(e, tuple) and len(e) == 2 for e in x):
            return {k: _maps_to_dicts(v) for k, v in x}
        return [_maps_to_dicts(e) for e in x]
    if isinstance(x, dict):
        return {k: _maps_to_dicts(v) for k, v in x.items()}
    return x


def _checkpoint_file_state(
    table_path: str, path: str, collect_stats: bool = False
) -> tuple[dict[str, dict | None], dict | None, list[str], dict[str, dict]]:
    """(active adds {raw path -> dv|None}, metaData|None, sidecar paths,
    stats adds {raw path -> {path,size,stats}}) from ONE checkpoint
    part. Parquet parts are read with columnar struct-field projection —
    add.path/add.deletionVector come out as flat arrays instead of 100k
    per-row dicts (measured ~4x on the whole read path at 100k adds,
    docs/SCALE.md round-9); the rare protocol/metaData/sidecar rows
    still materialize individually so their guards (_check_protocol)
    see the full action. ``collect_stats=True`` additionally harvests
    add.size/add.stats from the SAME read (the table is already in
    memory — no second checkpoint parse; snapshot_adds_pruned used to
    re-read every part for these three fields)."""
    active: dict[str, dict | None] = {}
    meta: dict | None = None
    sidecars: list[str] = []
    stats_adds: dict[str, dict] = {}
    if path.endswith(".json"):
        for action in _checkpoint_actions(os.path.dirname(path), path):
            _check_protocol(action, table_path)
            if "metaData" in action and action["metaData"].get("id"):
                meta = action["metaData"]
            elif "add" in action and action["add"].get("path"):
                active[action["add"]["path"]] = _norm_dv(
                    action["add"].get("deletionVector")
                )
                if collect_stats:
                    stats_adds[action["add"]["path"]] = action["add"]
            elif "sidecar" in action and action["sidecar"].get("path"):
                sidecars.append(action["sidecar"]["path"])
        return active, meta, sidecars, stats_adds
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    names = set(tbl.column_names)
    if "protocol" in names:
        mrv = pc.struct_field(tbl.column("protocol"), "minReaderVersion")
        for i, val in enumerate(mrv.to_pylist()):
            if val is not None:
                _check_protocol(
                    {"protocol": _maps_to_dicts(tbl.column("protocol")[i].as_py())},
                    table_path,
                )
    if "metaData" in names:
        ids = pc.struct_field(tbl.column("metaData"), "id")
        for i, val in enumerate(ids.to_pylist()):
            if val:
                meta = _maps_to_dicts(tbl.column("metaData")[i].as_py())
                _check_protocol({"metaData": meta}, table_path)
    if "add" in names:
        addcol = tbl.column("add")
        addtype = tbl.schema.field("add").type
        paths = pc.struct_field(addcol, "path").to_pylist()
        has_dv = any(
            addtype.field(i).name == "deletionVector"
            for i in range(addtype.num_fields)
        )
        dvs = (
            pc.struct_field(addcol, "deletionVector").to_pylist()
            if has_dv
            else None
        )
        sizes = stats = None
        if collect_stats:
            field_names = {
                addtype.field(i).name for i in range(addtype.num_fields)
            }
            if "size" in field_names:
                sizes = pc.struct_field(addcol, "size").to_pylist()
            if "stats" in field_names:
                stats = pc.struct_field(addcol, "stats").to_pylist()
        for i, p in enumerate(paths):
            if p:
                active[p] = _norm_dv(dvs[i] if dvs else None)
                if collect_stats:
                    stats_adds[p] = {
                        "path": p,
                        "size": (sizes[i] if sizes else 0) or 0,
                        "stats": stats[i] if stats else None,
                    }
    if "sidecar" in names:
        for p in pc.struct_field(tbl.column("sidecar"), "path").to_pylist():
            if p:
                sidecars.append(p)
    return active, meta, sidecars, stats_adds


def _checkpoint_state(
    log_dir: str, upto: int | None, collect_stats: bool = False
) -> tuple[int, dict[str, dict | None], dict | None, dict[str, dict]]:
    """Seed the active-file set from the newest usable checkpoint
    (classic, multi-part, or v2-with-sidecars). Returns
    (checkpoint_version, active, metaData, stats_adds) — replay
    continues after it. ``stats_adds`` ({raw path -> add with
    path/size/stats}) is populated only when ``collect_stats=True``,
    from the same parquet read (v2 sidecar adds are NOT harvested for
    stats — pruning over them stays conservative)."""
    lc = os.path.join(log_dir, "_last_checkpoint")
    if not os.path.exists(lc):
        return -1, {}, None, {}
    table_path = os.path.dirname(log_dir)
    try:
        with open(lc) as f:
            info = json.load(f)
        v = int(info["version"])
        if upto is not None and v > upto:
            return -1, {}, None, {}  # checkpoint is past the requested snapshot
        files = _checkpoint_files(log_dir, v)
        if not files:
            return -1, {}, None, {}
        meta = None
        active: dict[str, dict | None] = {}
        sidecars: list[str] = []
        stats_adds: dict[str, dict] = {}
        for path in files:
            f_active, f_meta, f_side, f_stats = _checkpoint_file_state(
                table_path, path, collect_stats=collect_stats
            )
            active.update(f_active)
            stats_adds.update(f_stats)
            if f_meta is not None:
                meta = f_meta
            sidecars.extend(f_side)
        for sc in sidecars:  # v2: add/remove live in sidecar parquet files
            sc_path = os.path.join(log_dir, "_sidecars", os.path.basename(sc))
            for action in _checkpoint_actions(log_dir, sc_path):
                if "add" in action and action["add"].get("path"):
                    active[action["add"]["path"]] = _norm_dv(action["add"].get("deletionVector"))
                elif "remove" in action and action["remove"].get("path"):
                    active.pop(action["remove"]["path"], None)
        return v, active, meta, stats_adds
    except LoadError:
        raise
    except Exception:  # noqa: BLE001 — fall back to full json replay
        return -1, {}, None, {}


def snapshot_files(table_path: str, version: int | None = None,
                   timestamp: str | None = None) -> list[str]:
    """Active data files of a Delta table at a snapshot (pure Python)."""
    return [p for p, _ in snapshot_adds(table_path, version, timestamp)]


def snapshot_adds(
    table_path: str, version: int | None = None, timestamp: str | None = None
) -> list[tuple[str, dict | None]]:
    """Active (data file, deletionVector descriptor | None) pairs of a
    Delta table at a snapshot (pure Python)."""
    return snapshot_state(table_path, version, timestamp)[0]


def snapshot_state(
    table_path: str, version: int | None = None, timestamp: str | None = None
) -> tuple[list[tuple[str, dict | None]], dict | None]:
    """(active adds, latest metaData action) at a snapshot (pure Python).
    The metaData carries schemaString + configuration — needed to unmap
    column-mapped tables."""
    raw, meta = snapshot_raw_state(table_path, version, timestamp)
    return (
        [(os.path.join(table_path, unquote(p)), dv) for p, dv in raw.items()],
        meta,
    )


def _replay_state(
    table_path: str,
    version: int | None = None,
    timestamp: str | None = None,
    collect_stats: bool = False,
) -> tuple[dict[str, dict | None], dict[str, dict], dict | None]:
    """The ONE commit-replay loop both snapshot surfaces share (they
    had drifted as near-verbatim copies). Returns (active {raw path ->
    dv|None}, adds {raw path -> add action}, metaData).

    Guards every silent-wrong-snapshot hole:
    - ``version`` past HEAD raises (delta-spark's version-out-of-range
      error) instead of quietly serving the latest snapshot. A
      ``timestamp`` after the newest commit intentionally resolves to
      HEAD — the SELECT-level time-travel surface pins that lenient
      behavior (tests/test_catalog.py).
    - a gap in the replayed commit range (history cleaned, checkpoint
      unreadable and pre-checkpoint commits deleted) raises instead of
      silently dropping every file the missing entries referenced.
    - explicit UTC offsets in ``timestamp`` are honored (_ts_epoch),
      never overwritten with UTC."""
    log_dir = os.path.join(table_path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise LoadError(f"not a delta table (no _delta_log): {table_path}")
    commits = _log_versions(log_dir)
    if not commits:
        raise LoadError(f"empty delta log: {table_path}")
    if timestamp is not None and version is None:
        ts_limit = _ts_epoch(timestamp)
        eligible = [v for v, p in commits if os.path.getmtime(p) <= ts_limit]
        if not eligible:
            raise LoadError(f"no delta commit at or before {timestamp}")
        version = max(eligible)
    head = commits[-1][0]
    if version is not None and version > head:
        raise LoadError(
            f"version {version} is after the latest commit {head} of "
            f"{table_path} (delta-spark raises the same out-of-range "
            "error; a silent fall-through would pin a 'snapshot' that "
            "keeps moving)"
        )
    base_v, active, meta, adds = _checkpoint_state(
        log_dir, version, collect_stats=collect_stats
    )
    prev = base_v
    for v, p in commits:
        if v <= base_v:
            continue
        if version is not None and v > version:
            break
        if v != prev + 1:
            raise LoadError(
                f"delta log gap: version {prev + 1} missing for "
                f"{table_path} (history cleaned past the usable "
                "checkpoint?) — refusing to serve a partial snapshot"
            )
        prev = v
        with open(p) as f:
            for line in f:
                if not line.strip():
                    continue
                a = json.loads(line)
                _check_protocol(a, table_path)
                if "add" in a and a["add"].get("path"):
                    # a re-add of the same path replaces its DV (how
                    # DELETE updates a file's deletion vector)
                    active[a["add"]["path"]] = _norm_dv(
                        a["add"].get("deletionVector")
                    )
                    adds[a["add"]["path"]] = a["add"]
                elif "remove" in a and a["remove"].get("path"):
                    active.pop(a["remove"]["path"], None)
                elif "metaData" in a:
                    meta = a["metaData"]  # latest wins (schema evolution)
    return active, adds, meta


def snapshot_raw_state(
    table_path: str, version: int | None = None, timestamp: str | None = None
) -> tuple[dict[str, dict | None], dict | None]:
    """Like snapshot_state, but keys are the RAW add-path strings exactly
    as stored in the log (no unquote, not resolved). Delta log replay
    matches add/remove actions by exact string — a writer composing
    remove actions for files another writer added MUST echo the stored
    string verbatim, not re-derive it (delta-spark stores hive paths with
    a literal '=', which quote() would escape to %3D and orphan the add
    forever)."""
    active, _adds, meta = _replay_state(table_path, version, timestamp)
    return active, meta


def snapshot_active_adds(
    table_path: str, version: int | None = None
) -> tuple[dict[str, dict | None], dict[str, dict], dict | None]:
    """(active {raw path -> dv|None}, full adds {raw path -> add action},
    metaData) at a snapshot, in ONE log pass: the checkpoint parquet is
    parsed once (_checkpoint_state collect_stats=True harvests
    path/size/stats from the same read that builds the active set), then
    each json commit is replayed once for both maps. Checkpoint-seeded
    entries carry only path/size/stats in `adds` (no partitionValues);
    v2 sidecar adds land in `active` but not `adds` — consumers must
    treat a missing/partial add conservatively (pruning: un-skippable;
    detail: size 0)."""
    return _replay_state(table_path, version, collect_stats=True)


def snapshot_adds_pruned(
    table_path: str,
    ranges: dict[str, tuple],
    version: int | None = None,
) -> tuple[list[str], list[str], int, int]:
    """Stats-based file pruning: given conjunctive per-column closed
    ranges ``{col: (lo, hi)}`` (either bound may be None), split the
    snapshot's active files into (candidates, skipped) using the
    per-file min/max recorded in ``add.stats``, plus (candidate_bytes,
    total_bytes).

    This is the delta data-skipping scale path: at 100 TB a selective
    scan must shrink the FILE LIST before Spark ever opens a footer —
    row-group pruning alone still pays one open+footer read per file.
    A file with no stats (foreign writer, stats disabled) can never be
    skipped. A column whose min/max are absent but whose nullCount
    equals numRecords (NULL-only file) IS skipped for any bounded
    range — NULL matches no comparison. ZORDER clustering
    (sinks/delta.py compact) is what makes these ranges tight on more
    than one column at once.

    Raises LoadError when any active add carries a deletion vector:
    the return value is bare candidate paths, and every caller scans
    them with spark.read.parquet directly — serving a DV table through
    this API would silently resurrect deleted rows (the un-pruned
    to_dataframe path applies DVs and handles such tables fine).

    Single log pass: the checkpoint parquet is parsed once
    (_checkpoint_state collect_stats=True harvests path/size/stats from
    the same read that builds the active set), then each json commit is
    replayed once for both the active set and the full add actions —
    at the 100k-add scale this module targets the previous
    snapshot_raw_state + re-replay shape parsed every checkpoint part
    twice."""
    active, adds, _meta = snapshot_active_adds(table_path, version)
    candidates, skipped = [], []
    cand_bytes = total = 0
    for rel, dv in active.items():
        if dv:
            raise LoadError(
                "snapshot_adds_pruned returns bare file paths and cannot "
                f"represent deletion vectors (file {rel!r} carries one); "
                "read this table through to_dataframe, which applies DVs"
            )
        abs_p = os.path.join(table_path, unquote(rel))
        add = adds.get(rel)
        size = int(add.get("size", 0) or 0) if add else 0
        total += size
        st = None
        if add and add.get("stats"):
            try:
                st = json.loads(add["stats"])
            except (TypeError, ValueError):
                st = None
        skip = False
        if st:
            mins = st.get("minValues") or {}
            maxs = st.get("maxValues") or {}
            nulls = st.get("nullCount") or {}
            nrec = st.get("numRecords")
            for col, (lo, hi) in ranges.items():
                if col not in mins or col not in maxs:
                    # NULL-only column: every row is NULL, and NULL
                    # satisfies no range bound — skippable whenever the
                    # range constrains the column at all
                    if (
                        (lo is not None or hi is not None)
                        and nrec is not None
                        and col in nulls
                        and nulls[col] == nrec
                    ):
                        skip = True
                        break
                    continue
                try:
                    if (hi is not None and mins[col] > hi) or (
                        lo is not None and maxs[col] < lo
                    ):
                        skip = True
                        break
                except TypeError:
                    # bound/stat type mismatch (string stats vs numeric
                    # range, or None stat): pruning must stay
                    # conservative — the file remains a candidate
                    continue
        if skip:
            skipped.append(abs_p)
        else:
            candidates.append(abs_p)
            cand_bytes += size
    return candidates, skipped, cand_bytes, total


def _read_via_log(spark: SparkSession, ts: TableSource) -> DataFrame:
    version = ts.option.get("version")
    adds, meta = snapshot_state(
        ts.uri,
        version=None if version is None else int(version),
        timestamp=ts.option.get("timestamp"),
    )
    if not adds:
        raise LoadError(f"delta table {ts.name!r}: snapshot has no data files")
    files = [p for p, _ in adds]
    # basePath keeps hive-style partition dirs as columns, matching what
    # the delta-spark reader reconstructs from add.partitionValues;
    # mergeSchema unions footers so a schema-evolved table (ALTER ADD
    # COLUMN, then new files carrying it) surfaces the new column's
    # values instead of whatever one sampled footer happened to hold
    # (the session pins spark.sql.parquet.mergeSchema=false globally)
    df = (
        spark.read.option("basePath", ts.uri)
        .option("mergeSchema", "true")
        .parquet(*files)
    )
    with_dv = [(p, dv) for p, dv in adds if dv]
    if with_dv:
        df = _apply_deletion_vectors(spark, df, with_dv, ts)
    conf = (meta or {}).get("configuration") or {}
    if conf.get("delta.columnMapping.mode", "none") != "none":
        df = _unmap_columns(df, meta, ts)
    elif meta and meta.get("schemaString"):
        # serve the LOG's schema (delta-spark semantics): declared
        # order/types, columns absent from every scanned file as typed
        # NULLs — the parquet-sampled schema is not the table schema
        df = _project_log_schema(df, meta, ts)
    return df


def _project_log_schema(df: DataFrame, meta: dict, ts: TableSource) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    try:
        st = StructType.fromJson(json.loads(meta["schemaString"]))
    except Exception:  # noqa: BLE001
        # minimal foreign writers stamp placeholder schemaStrings
        # ('{}'): no declared schema to serve — keep the parquet-merged
        # one (column mapping, which NEEDS the schema, stays loud)
        return df
    if not st.fields:
        return df
    present = set(df.columns)
    cols = []
    for f in st.fields:
        c = (
            F.col(f.name).cast(f.dataType)
            if f.name in present
            else F.lit(None).cast(f.dataType)
        )
        cols.append(c.alias(f.name))
    return df.select(*cols)


def _unmap_columns(df: DataFrame, meta: dict, ts: TableSource) -> DataFrame:
    """Column mapping (modes 'name'/'id', delta.rs reads these via
    delta-rs free): parquet data files store *physical* column names
    (``col-<uuid>``); the logical names live in schemaString field
    metadata (``delta.columnMapping.physicalName``). Delta's schemaString
    IS Spark StructType JSON, so parse it and select physical→logical.
    Nested struct fields are renamed by casting to the logical dataType
    (struct casts rename positionally); the cast also normalizes
    hive-partition columns (physical-named dirs) to their declared types.
    A physical column absent from the scanned files — a column added
    after those files were written — surfaces as typed NULLs, matching
    delta-spark."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    try:
        st = StructType.fromJson(json.loads(meta["schemaString"]))
    except Exception as exc:  # noqa: BLE001
        raise LoadError(
            f"delta table {ts.name!r}: unparseable schemaString for "
            f"column-mapped table: {exc}"
        ) from exc
    present = set(df.columns)
    cols = []
    for f in st.fields:
        md = f.metadata or {}
        phys = md.get("delta.columnMapping.physicalName", f.name)
        if phys in present:
            c = F.col(phys).cast(f.dataType)
        else:
            c = F.lit(None).cast(f.dataType)
        cols.append(c.alias(f.name))
    return df.select(*cols)


def _apply_deletion_vectors(
    spark: SparkSession,
    df: DataFrame,
    with_dv: list[tuple[str, dict]],
    ts: TableSource,
) -> DataFrame:
    """Anti-filter DV'd rows: decode each file's roaring bitmap (pure
    Python — the bitmaps are KB-scale descriptors, driver-bounded like
    the reference's delta-rs read), then drop (file, row_index) matches
    using the parquet scan's ``_metadata`` columns. The join side is
    one row per *deleted row index*; at cluster scale a table with
    billions of DV'd rows would lift the decode into a mapInPandas
    over the descriptor list — the filter shape is identical."""
    from pyspark.sql import functions as F

    from roapi_spark.sources.deletion_vectors import (
        DeletionVectorError,
        read_deletion_vector,
    )

    deleted: list[tuple[str, int]] = []
    for path, dv in with_dv:
        try:
            idxs = read_deletion_vector(dv, ts.uri)
        except (DeletionVectorError, OSError, KeyError) as exc:
            raise LoadError(
                f"delta table {ts.name!r}: unreadable deletion vector for "
                f"{os.path.basename(path)}: {exc}"
            ) from exc
        deleted.extend((os.path.abspath(path), int(i)) for i in idxs)
    cols = df.columns
    dv_df = spark.createDataFrame(deleted, "_dv_file string, _dv_row bigint")
    kept = (
        # normalize file:/p vs file:///p URI spellings to a plain path,
        # then percent-decode: file_path is a URI (space -> %20) while
        # _dv_file holds literal fs paths — an encoded mismatch would
        # silently RESURRECT every DV-deleted row in that file. The
        # '+'->'%2B' pre-step neutralizes url_decode's form-encoding
        # quirk ('+' means space there, but means '+' in a file URI).
        df.withColumn(
            "_file",
            F.url_decode(
                F.replace(
                    F.regexp_replace(
                        F.col("_metadata.file_path"), "^file:/+", "/"
                    ),
                    F.lit("+"),
                    F.lit("%2B"),
                )
            ),
        )
        .withColumn("_row", F.col("_metadata.row_index"))
        .join(
            F.broadcast(dv_df),
            (F.col("_file") == F.col("_dv_file"))
            & (F.col("_row") == F.col("_dv_row")),
            "left_anti",
        )
    )
    return kept.select(*cols)


def to_dataframe(spark: SparkSession, ts: TableSource) -> DataFrame:
    if "changes_from" in ts.option:
        # Change Data Feed surface: register the change rows as the
        # table (SQL/REST-queryable incremental ingestion)
        end = ts.option.get("changes_to")
        return table_changes(
            spark,
            ts.uri,
            int(ts.option["changes_from"]),
            None if end is None else int(end),
        )
    r = spark.read.format("delta")
    if "version" in ts.option:
        r = r.option("versionAsOf", str(ts.option["version"]))
    if "timestamp" in ts.option:
        r = r.option("timestampAsOf", str(ts.option["timestamp"]))
    try:
        return r.load(ts.uri)
    except Exception as exc:  # noqa: BLE001
        # fall back to the pure-Python log replay ONLY when the delta
        # jars are absent (SparkClassNotFoundException / DATA_SOURCE_
        # NOT_FOUND). Any other delta-spark failure — version out of
        # range, corrupt checkpoint, permissions — must surface: a
        # blanket fallback would swallow a hard error and re-serve the
        # table through a path with different semantics.
        msg = str(exc)
        if "DATA_SOURCE_NOT_FOUND" in msg or (
            "Failed to find" in msg and "data source" in msg
        ):
            return _read_via_log(spark, ts)
        raise


def _ts_epoch(ts: str) -> float:
    """ISO timestamp -> epoch seconds. A naive timestamp is interpreted
    as UTC (the snapshot time-travel resolver's convention,
    snapshot_raw_state); one carrying an explicit offset
    ('...T00:00:00+05:00') keeps that offset — delta-spark honors the
    zone rather than silently discarding it."""
    from datetime import datetime, timezone

    dt = datetime.fromisoformat(ts)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.timestamp()


def table_changes(
    spark: SparkSession,
    table_path: str,
    start_version: int | str,
    end_version: int | str | None = None,
) -> DataFrame:
    """Change Data Feed (pure Python, public Delta CDF spec): one row per
    changed record for commits in ``[start_version, end_version]``, with
    ``_change_type`` / ``_commit_version`` / ``_commit_timestamp``.

    Bounds may be versions (int) or ISO timestamp strings, matching
    delta-spark's ``table_changes`` TVF: a start timestamp resolves to
    the FIRST commit at-or-after it, an end timestamp to the LAST
    commit at-or-before it — both against commit-file modification
    times, the same source snapshot timestamp time travel uses. A start
    timestamp after the newest commit, or an end timestamp before the
    oldest, is an error (delta-spark's out-of-range behavior), never a
    silent empty feed.

    Commits carrying explicit ``cdc`` actions (writers with
    ``delta.enableChangeDataFeed=true`` emit ``_change_data/`` parquet
    whose rows already carry ``_change_type``, including
    update_preimage/update_postimage) are read as written. Commits
    without cdc actions derive changes the way delta-spark does for
    blind writes: files added with ``dataChange=true`` contribute their
    rows as ``insert``; files removed with ``dataChange=true`` as
    ``delete`` (the removed file still exists until VACUUM — reading it
    is exactly how the reference implementation serves deletes).
    ``_commit_timestamp`` is the commit file's modification time, the
    same source the log replay uses for timestamp time travel.
    """
    from datetime import datetime, timezone

    from pyspark.sql import functions as F

    log_dir = os.path.join(table_path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise LoadError(f"not a delta table (no _delta_log): {table_path}")
    commits = _log_versions(log_dir)
    if isinstance(start_version, str):
        limit = _ts_epoch(start_version)
        at_or_after = [v for v, p in commits if os.path.getmtime(p) >= limit]
        if not at_or_after:
            raise LoadError(
                f"starting timestamp {start_version!r} is after the "
                f"latest commit of {table_path}; use a timestamp at or "
                "before it"
            )
        start_version = min(at_or_after)
    if isinstance(end_version, str):
        limit = _ts_epoch(end_version)
        at_or_before = [v for v, p in commits if os.path.getmtime(p) <= limit]
        if not at_or_before:
            raise LoadError(
                f"ending timestamp {end_version!r} is before the "
                f"earliest commit of {table_path}; use a timestamp at "
                "or after it"
            )
        end_version = max(at_or_before)
    parts: list[DataFrame] = []
    for v, path in commits:
        if v < start_version or (end_version is not None and v > end_version):
            continue
        cdc_files: list[str] = []
        ins_files: list[str] = []
        del_files: list[str] = []
        with open(path) as f:
            for line in f:
                if not line.strip():
                    continue
                action = json.loads(line)
                _check_protocol(action, table_path)
                if "cdc" in action:
                    cdc_files.append(action["cdc"]["path"])
                elif "add" in action and action["add"].get("dataChange", True):
                    ins_files.append(action["add"]["path"])
                elif "remove" in action and action["remove"].get(
                    "dataChange", True
                ):
                    del_files.append(action["remove"]["path"])
        ts_commit = datetime.fromtimestamp(
            os.path.getmtime(path), tz=timezone.utc
        )

        def _read(paths: list[str]) -> DataFrame:
            full = [os.path.join(table_path, unquote(p)) for p in paths]
            missing = [p for p in full if not os.path.exists(p)]
            if missing:
                raise LoadError(
                    f"change-feed file vacuumed or missing: {missing[0]}"
                )
            return spark.read.option("basePath", table_path).parquet(*full)

        batch: list[DataFrame] = []
        if cdc_files:
            batch.append(_read(cdc_files))
        else:
            if ins_files:
                batch.append(
                    _read(ins_files).withColumn("_change_type", F.lit("insert"))
                )
            if del_files:
                batch.append(
                    _read(del_files).withColumn("_change_type", F.lit("delete"))
                )
        for df in batch:
            parts.append(
                df.withColumn("_commit_version", F.lit(v).cast("bigint"))
                .withColumn("_commit_timestamp", F.lit(ts_commit))
            )
    if not parts:
        in_range = [
            v for v, _ in commits
            if v >= start_version
            and (end_version is None or v <= end_version)
        ]
        if not in_range:
            raise LoadError(
                f"no commits in change range [{start_version}, "
                f"{end_version}] for {table_path}"
            )
        # valid range, zero row changes (metadata-only commits, or
        # OPTIMIZE's dataChange=false rearrangement): delta-spark
        # returns an EMPTY change feed here, not an error
        from pyspark.sql.types import StructType

        _, meta = snapshot_state(table_path)
        schema = StructType.fromJson(
            json.loads((meta or {}).get("schemaString", '{"type":"struct","fields":[]}'))
        )
        schema = (
            schema.add("_change_type", "string")
            .add("_commit_version", "long")
            .add("_commit_timestamp", "timestamp")
        )
        return spark.createDataFrame([], schema)
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out
