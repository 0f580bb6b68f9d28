"""Table catalog — the engine core (reference: ColumnQ,
columnq/src/columnq.rs:36-44).

Holds the SparkSession, the registered table sources, KV stores, and the
refresh machinery:

- ``load_table`` — loader dispatch + temp-view registration
  (columnq.rs:104-116);
- ``drop_table`` (columnq.rs:203-207);
- ``query_sql`` passthrough (query/sql.rs:5-18) — Catalyst does the rest;
- ``query_rest`` / ``query_graphql`` — frontend planners over registered
  views;
- KV store: two Utf8-ish columns materialized to a driver dict for O(1)
  GET (columnq.rs:275-331);
- refresh: per-table ``reload_interval`` re-runs the loader and swaps the
  temp view — view rebinding is atomic per name, matching the reference's
  RwLock swap semantics (columnq.rs:118-152).
"""

from __future__ import annotations

import hashlib
import os
import re
import threading
import time

from pyspark.sql import DataFrame, SparkSession

from roapi_spark.config import AppConfig, KeyValueSource, TableSource
from roapi_spark.query.graphql import graphql_to_df
from roapi_spark.query.rest import rest_query_to_df
from roapi_spark.sources import load_table as _load


class CatalogError(RuntimeError):
    pass


class ReadOnlyError(CatalogError):
    pass


class Catalog:
    def __init__(self, spark: SparkSession, read_only: bool = True) -> None:
        self.spark = spark
        self.read_only = read_only
        self.sources: dict[str, TableSource] = {}
        self.kv: dict[str, dict[str, str]] = {}
        self._kv_sources: dict[str, KeyValueSource] = {}
        self._refresh_stop = threading.Event()
        self._refresh_thread: threading.Thread | None = None
        self._lock = threading.Lock()
        # delta tables: log head version at (re-)bind time, so VACUUM can
        # tell "external writer advanced the table" from "nothing moved"
        self._bound_delta_head: dict[str, int] = {}
        # views invalidated by our own DML, re-bound lazily at the next
        # read: consecutive DML statements (DELETE; OPTIMIZE; VACUUM)
        # never read the view — they pin their own log snapshot — so an
        # eager reload per statement is a full log replay bought for
        # nothing
        self._stale_dml_views: set[str] = set()
        # pinned generations for refreshable tables: name -> [older, newer]
        self._pinned: dict[str, list[DataFrame]] = {}
        # staged point-in-time file copies backing those generations
        self._staged: dict[str, list[str]] = {}

    # -- tables ------------------------------------------------------------

    def _stage_source(self, ts: TableSource) -> TableSource:
        """Snapshot isolation for refreshable single-file sources: copy
        the file to an immutable staging path and load THAT. Loading a
        live path is inherently racy — schema inference, the pin's
        materialization, and the scan each open the file at different
        times, and Spark truncates reads at the listed size, so a writer
        rewriting the file mid-load yields torn rows (caught by
        test_concurrent_refresh_rebind_soak). Writers using atomic
        rename make the copy a consistent point-in-time snapshot. Two
        staged generations are kept (matching the pin rotation) so
        recomputes of the previous generation still find their file."""
        if ts.reload_interval is None or not os.path.isfile(ts.uri):
            return ts
        import dataclasses
        import shutil
        import uuid as _uuid

        from roapi_spark.functions.snapshot import cache_root

        stage_dir = os.path.join(cache_root(), "refresh_stage", ts.name)
        os.makedirs(stage_dir, exist_ok=True)
        if ts.name not in self._staged:
            # first stage of this table in THIS process: sweep copies a
            # previous process left behind (rotation only unlinks files
            # it tracked, so orphans would otherwise accumulate forever
            # in the persistent cache dir across restarts)
            for leftover in os.listdir(stage_dir):
                try:
                    os.unlink(os.path.join(stage_dir, leftover))
                except OSError:
                    pass
        # keep the FULL suffix chain: '.warc.gz'/'.cdx.gz' readers key
        # gzip handling on the double suffix, and splitext's bare '.gz'
        # would defeat format sniffing on the staged copy
        base = os.path.basename(ts.uri)
        ext = base[base.index(".") :] if "." in base else ""
        staged = os.path.join(stage_dir, f"{_uuid.uuid4().hex}{ext}")
        shutil.copy2(ts.uri, staged)
        gens = self._staged.setdefault(ts.name, [])
        gens.append(staged)
        if len(gens) > 2:
            old = gens.pop(0)
            try:
                os.unlink(old)
            except OSError:
                pass
        return dataclasses.replace(ts, uri=staged)

    def _bind(self, ts: TableSource, df: DataFrame) -> DataFrame:
        """Bind a loaded DataFrame as ``ts.name``'s view.

        Refreshable tables (``reload_interval`` set) are PINNED first:
        persisted and eagerly materialized, so queries serve from a
        committed snapshot and never race the underlying file being
        rewritten. This mirrors the reference, which reloads refreshable
        tables wholesale into a MemTable (columnq.rs load -> MemTable).
        The previous generation stays pinned until the NEXT swap so
        in-flight queries holding the old plan finish against intact
        blocks; generation n-2 is unpersisted (non-blocking).
        Refreshable tables are dimension-sized by nature — exactly the
        tables one pins at 100 TB too."""
        if ts.reload_interval is not None:
            from pyspark import StorageLevel

            df = df.persist(StorageLevel.MEMORY_AND_DISK)
            df.count()  # eager: the swap below publishes a complete snapshot
            gens = self._pinned.setdefault(ts.name, [])
            gens.append(df)
            if len(gens) > 2:
                gens.pop(0).unpersist(blocking=False)
        df.createOrReplaceTempView(ts.name)
        return df

    def load_table(self, ts: TableSource, dynamic: bool = False) -> None:
        """Load + register. ``dynamic=True`` marks an API-initiated register,
        rejected in read-only mode (roapi/src/api/routes.rs:29-37)."""
        if dynamic and self.read_only:
            raise ReadOnlyError("catalog is read-only; dynamic register disabled")
        # record the delta head BEFORE loading: listing it after would
        # race an external commit landing mid-load (recorded head N+1
        # against a version-N view lets VACUUM skip a needed rebind);
        # listing first is conservative — recorded <= pinned, so a
        # mismatch only ever causes an extra rebind, never a skip
        head = None
        if self._resolved_fmt(ts) == "delta":
            from roapi_spark.sources.delta import _log_versions

            head = max(
                (v for v, _ in _log_versions(
                    os.path.join(ts.uri, "_delta_log"))),
                default=-1,
            )
        df = _load(self.spark, self._stage_source(ts))
        with self._lock:
            self._bind(ts, df)
            self.sources[ts.name] = ts
            if head is not None:
                self._bound_delta_head[ts.name] = head

    @staticmethod
    def _resolved_fmt(ts: TableSource) -> str:
        """Lower-cased effective format: explicit, else sniffed — a
        delta table registered without `format:` (directory sniffing
        resolves it) must still be recognized by the DML/maintenance/
        time-travel routes."""
        try:
            return ts.resolved_format().lower()
        except Exception:  # noqa: BLE001 — unsniffable: treat as unknown
            return (ts.format or "").lower()

    def drop_table(self, name: str, dynamic: bool = False) -> None:
        if dynamic and self.read_only:
            raise ReadOnlyError("catalog is read-only; drop disabled")
        with self._lock:
            if name not in self.sources:
                raise CatalogError(f"table not found: {name}")
            self.spark.catalog.dropTempView(name)
            del self.sources[name]
            # a DML'd-then-dropped table must not linger in the stale
            # set: the next read's flush would KeyError on sources[name]
            self._stale_dml_views.discard(name)
            self._bound_delta_head.pop(name, None)
            for df in self._pinned.pop(name, []):
                df.unpersist(blocking=False)
            for staged in self._staged.pop(name, []):
                try:
                    os.unlink(staged)
                except OSError:
                    pass

    def table(self, name: str) -> DataFrame:
        if name not in self.sources:
            raise CatalogError(f"table not found: {name}")
        if self._stale_dml_views:
            self._flush_stale_views()
        return self.spark.table(name)

    def table_names(self) -> list[str]:
        return sorted(self.sources)

    def schemas(self) -> dict[str, dict]:
        """Schema map as JSON-able dicts (GET /api/schema,
        roapi/src/api/schema.rs:9-24)."""
        return {name: self.table(name).schema.jsonValue() for name in self.sources}

    def schema(self, name: str) -> dict:
        return self.table(name).schema.jsonValue()

    # -- queries -----------------------------------------------------------

    # Read-only command allowlist: metadata inspection only.  Everything
    # else that parses to a Command node (CREATE/DROP/SET/CACHE/ALTER/
    # ANALYZE/...) mutates session or filesystem state.
    _READONLY_COMMAND_PREFIXES = ("Explain", "Show", "Describe")

    def _assert_read_only_sql(self, sql: str) -> None:
        """Reject non-query SQL before execution in read-only mode.

        The reference's read-only gate only covers register/drop
        (roapi/src/api/routes.rs:29-37) because DataFusion's SQL surface is
        read-only by construction; Spark SQL can write (INSERT OVERWRITE
        DIRECTORY, CTAS LOCATION, DROP VIEW...), so the contract has to be
        enforced at the parser.  ``spark.sql`` executes commands eagerly —
        the check must run on the *parsed* plan, before execution.
        """
        try:
            plan = self.spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)
        except Exception:
            return  # let spark.sql raise its own (nicer) parse error
        jvm = self.spark.sparkContext._jvm
        cmd_cls = jvm.java.lang.Class.forName(
            "org.apache.spark.sql.catalyst.plans.logical.Command"
        )

        # walk the WHOLE tree, not just the root: a CTE-wrapped INSERT
        # parses to UnresolvedWith and a multi-insert to Union — judging
        # only the top node would wave filesystem writes through the
        # read-only gate
        def walk(node) -> None:
            name = node.getClass().getSimpleName()
            if cmd_cls.isInstance(node):
                if not name.startswith(self._READONLY_COMMAND_PREFIXES):
                    raise ReadOnlyError(
                        f"read-only mode rejects {name}: {sql[:80]}"
                    )
            elif name.startswith("Insert"):  # InsertIntoStatement / IntoDir
                # writes parse to plain logical plans, not Command nodes
                raise ReadOnlyError(
                    f"read-only mode rejects {name}: {sql[:80]}"
                )
            for seq in (node.children(), node.innerChildren()):
                it = seq.iterator()
                while it.hasNext():
                    walk(it.next())

        walk(plan)

    @staticmethod
    def _mask_literals(sql: str) -> str:
        """Same-length copy of ``sql`` with the CONTENTS of quoted spans
        ('…', "…", `…`; doubling handled) and comments (-- …, /* … */)
        blanked to spaces — keyword/regex scans run on the mask (so a
        literal like 'see VERSION AS OF 2' never fires a rewrite) while
        every match position maps 1:1 back onto the original text."""
        out = list(sql)
        i, n = 0, len(sql)
        while i < n:
            ch = sql[i]
            if ch in ("'", '"', "`"):
                q = ch
                i += 1
                while i < n:
                    if sql[i] == q:
                        if i + 1 < n and sql[i + 1] == q:  # doubled quote
                            out[i] = out[i + 1] = " "
                            i += 2
                            continue
                        break
                    out[i] = " "
                    i += 1
                i += 1  # past the closing quote (or EOF)
            elif ch == "-" and i + 1 < n and sql[i + 1] == "-":
                while i < n and sql[i] != "\n":
                    out[i] = " "
                    i += 1
            elif ch == "/" and i + 1 < n and sql[i + 1] == "*":
                out[i] = out[i + 1] = " "
                i += 2
                while i < n:
                    if sql[i] == "*" and i + 1 < n and sql[i + 1] == "/":
                        out[i] = out[i + 1] = " "
                        i += 2
                        break
                    out[i] = " "
                    i += 1
            else:
                i += 1
        return "".join(out)

    # information_schema surface (DataFusion exposes it natively —
    # columnq/src/query/sql.rs session config enables it; Spark has no such
    # catalog, so qualified references are rewritten onto temp views built
    # from this catalog's registry)
    _INFO_SCHEMA_RE = re.compile(r"\binformation_schema\s*\.\s*(tables|columns)\b", re.I)

    def _materialize_information_schema(self) -> None:
        tables_rows = [
            ("spark", "public", name, "BASE TABLE") for name in sorted(self.sources)
        ]
        cols_rows = [
            ("spark", "public", name, f.name, i + 1, "YES" if f.nullable else "NO",
             f.dataType.simpleString())
            for name in sorted(self.sources)
            for i, f in enumerate(self.table(name).schema.fields)
        ]
        self.spark.createDataFrame(
            tables_rows, "table_catalog string, table_schema string, "
            "table_name string, table_type string"
        ).createOrReplaceTempView("information_schema_tables")
        self.spark.createDataFrame(
            cols_rows, "table_catalog string, table_schema string, table_name string, "
            "column_name string, ordinal_position int, is_nullable string, "
            "data_type string"
        ).createOrReplaceTempView("information_schema_columns")

    # -- SQL DML on delta-backed tables (read-write mode) ------------------
    #
    # Spark's v1 file relations reject DELETE/UPDATE/MERGE ("only
    # supported with v2 tables"); in read-write mode we parse the
    # statement with Spark's own parser and route it to the copy-on-write
    # sink (roapi_spark/sinks/delta.py) when the target is a registered
    # delta table. The reference is read-only end to end (roapi serves
    # tables; columnq never writes), so this whole surface is an
    # extension — but it is what makes `--read-only false` + a delta
    # table a usable read-write endpoint over HTTP/pgwire/CLI.

    @staticmethod
    def _scala_seq(jseq) -> list:
        return [jseq.apply(i) for i in range(jseq.size())]

    def _relation_name(self, rel) -> tuple[str, str | None]:
        """(table name, alias) from UnresolvedRelation or
        SubqueryAlias(UnresolvedRelation)."""
        cls = rel.getClass().getSimpleName()
        alias = None
        if cls == "SubqueryAlias":
            alias = rel.alias()
            rel = rel.child()
            cls = rel.getClass().getSimpleName()
        if cls != "UnresolvedRelation":
            raise CatalogError(
                f"DML target/source must be a registered table, got {cls}"
            )
        name = ".".join(self._scala_seq(rel.multipartIdentifier()))
        return name, alias

    @staticmethod
    def _unquote_ident(name: str) -> str:
        """Strip one level of backtick quoting (`` `my table` ``) from a
        maintenance-grammar identifier."""
        if len(name) >= 2 and name[0] == name[-1] == "`":
            return name[1:-1]
        return name

    def _delta_path(self, name: str, stmt: str = "DML") -> str:
        name = self._unquote_ident(name)
        if name not in self.sources:
            raise CatalogError(f"table not found: {name}")
        ts = self.sources[name]
        if self._resolved_fmt(ts) != "delta":
            raise CatalogError(
                f"{stmt} is only supported on delta-backed tables; "
                f"{name!r} has format {ts.format!r}"
            )
        return ts.uri

    def _dml_summary(self, operation: str, table: str, version: int) -> DataFrame:
        # mark the bound view stale; the next read re-binds it
        self._stale_dml_views.add(table)
        return self.spark.createDataFrame(
            [(operation, table, version)],
            "operation string, table string, version bigint",
        )

    def _flush_stale_views(self) -> None:
        """Re-bind every view our own DML invalidated (lazy counterpart
        of the per-statement reload): runs at the top of each read path
        so SELECT-after-DML always sees the committed head."""
        while True:
            try:  # set.pop is atomic; two reader threads may race here
                name = self._stale_dml_views.pop()
            except KeyError:
                break
            self.load_table(self.sources[name])

    # OPTIMIZE / VACUUM are delta-spark SQL extensions — Spark's vanilla
    # parser rejects them, so they are recognized up front by shape (the
    # same pre-parser routing delta-spark's own SparkSessionExtensions
    # injects). Grammar supported:
    #   OPTIMIZE <table> [ZORDER BY (c1, c2, ...)]
    #   VACUUM <table> [RETAIN <n> VERSIONS | RETAIN <n> HOURS]
    # RETAIN <n> HOURS is delta-spark's grammar (time-based retention,
    # resolved to a version cutoff via each commit's commitInfo
    # timestamp); RETAIN <n> VERSIONS is this writer's native contract
    # (sinks/delta.vacuum). Both are explicit about their unit.
    _IDENT = r"(`[^`]+`|[A-Za-z_][\w.]*)"
    _MAINT_RE = re.compile(
        r"^\s*(OPTIMIZE|VACUUM)\s+" + _IDENT + r"\s*(.*?)\s*;?\s*$",
        re.I | re.S,
    )
    _ZORDER_RE = re.compile(r"^ZORDER\s+BY\s*\(\s*([\w\s,`]+?)\s*\)$", re.I)
    _RETAIN_RE = re.compile(r"^RETAIN\s+(\d+)\s+(VERSIONS|HOURS)$", re.I)

    # DESCRIBE HISTORY <t> — delta-spark's audit-trail statement, safe in
    # read-only mode (it reads the log, never the data): one row per
    # committed version with the commitInfo operation + parameters.
    _HISTORY_RE = re.compile(
        r"^\s*DESCRIBE\s+HISTORY\s+" + _IDENT + r"\s*;?\s*$", re.I
    )

    def _route_history(self, sql: str) -> DataFrame | None:
        m = self._HISTORY_RE.match(sql)
        if m is None:
            return None
        import json as _json

        from roapi_spark.sources.delta import _log_versions

        path = self._delta_path(m.group(1), stmt="DESCRIBE HISTORY")
        rows = []
        for v, entry in _log_versions(os.path.join(path, "_delta_log")):
            op, params, ts = None, None, None
            with open(entry) as f:
                for line in f:
                    if not line.strip():
                        continue
                    a = _json.loads(line)
                    if "commitInfo" in a:
                        ci = a["commitInfo"]
                        op = ci.get("operation")
                        params = _json.dumps(
                            ci.get("operationParameters") or {}, sort_keys=True
                        )
                        ts = ci.get("timestamp")
                        break
            rows.append(
                (
                    v,
                    None if ts is None else int(ts),
                    op,
                    params,
                )
            )
        rows.sort(reverse=True)  # newest first, like delta-spark
        return self.spark.createDataFrame(
            rows,
            "version bigint, timestamp_ms bigint, operation string, "
            "operationParameters string",
        )

    # DESCRIBE DETAIL <t> — table-level metadata snapshot (delta-spark
    # parity, read-only-safe): format/location/partition columns/file
    # count/total bytes, sizes taken from the log's add actions (one log
    # pass, no per-file filesystem stat — the 100k-file path).
    _DETAIL_RE = re.compile(
        r"^\s*DESCRIBE\s+DETAIL\s+" + _IDENT + r"\s*;?\s*$", re.I
    )

    def _route_detail(self, sql: str) -> DataFrame | None:
        m = self._DETAIL_RE.match(sql)
        if m is None:
            return None
        from roapi_spark.sources.delta import snapshot_active_adds

        name = self._unquote_ident(m.group(1))
        path = self._delta_path(name, stmt="DESCRIBE DETAIL")
        active, adds, meta = snapshot_active_adds(path)
        size = sum(int((adds.get(p) or {}).get("size", 0) or 0) for p in active)
        parts = (meta or {}).get("partitionColumns") or []
        return self.spark.createDataFrame(
            [
                (
                    "delta",
                    (meta or {}).get("id"),
                    name,
                    path,
                    ",".join(parts),
                    len(active),
                    size,
                    (meta or {}).get("createdTime"),
                )
            ],
            "format string, id string, name string, location string, "
            "partition_columns string, num_files bigint, "
            "size_bytes bigint, created_ms bigint",
        )

    # RESTORE TABLE <t> TO VERSION AS OF <n> — delta-spark syntax; a
    # metadata-only commit re-activating the target version's file set
    # (sinks/delta.restore_delta). Write op: read-only mode rejects it.
    _RESTORE_RE = re.compile(
        r"^\s*RESTORE\s+TABLE\s+" + _IDENT + r"\s+TO\s+"
        r"(?:VERSION\s+AS\s+OF\s+(\d+)|TIMESTAMP\s+AS\s+OF\s+'([^']+)')"
        r"\s*;?\s*$",
        re.I,
    )

    def _route_restore(self, sql: str) -> DataFrame | None:
        m = self._RESTORE_RE.match(sql)
        if m is None:
            return None
        from roapi_spark.sinks.delta import restore_delta, version_at_timestamp

        name = self._unquote_ident(m.group(1))
        path = self._delta_path(name, stmt="RESTORE")
        if m.group(2) is not None:
            target = int(m.group(2))
        else:
            # delta-spark's TIMESTAMP AS OF restore: resolve via each
            # commit's commitInfo timestamp (last commit at or before)
            target = version_at_timestamp(path, m.group(3))
        v = restore_delta(path, target)
        return self._dml_summary("RESTORE", name, v)

    # ALTER TABLE <t> SET TBLPROPERTIES ('k'='v', ...) — delta-spark's
    # property surface (e.g. enabling delta.enableChangeDataFeed on an
    # existing table): one metadata-only commit. A value of '' unsets.
    _TBLPROPS_RE = re.compile(
        r"^\s*ALTER\s+TABLE\s+" + _IDENT + r"\s+SET\s+TBLPROPERTIES\s*"
        r"\(\s*(.+?)\s*\)\s*;?\s*$",
        re.I | re.S,
    )
    _PROP_KV_RE = re.compile(r"'([^']+)'\s*=\s*'([^']*)'")

    # SHOW TBLPROPERTIES <t> — read-only metadata (log only, no data):
    # one (key, value) row per table property.
    _SHOW_PROPS_RE = re.compile(
        r"^\s*SHOW\s+TBLPROPERTIES\s+" + _IDENT + r"\s*;?\s*$", re.I
    )

    def _route_show_tblproperties(self, sql: str) -> DataFrame | None:
        m = self._SHOW_PROPS_RE.match(sql)
        if m is None:
            return None
        from roapi_spark.sources.delta import snapshot_state

        path = self._delta_path(m.group(1), stmt="SHOW TBLPROPERTIES")
        _, meta = snapshot_state(path)
        conf = (meta or {}).get("configuration") or {}
        rows = sorted(conf.items()) or []
        return self.spark.createDataFrame(
            rows, "key string, value string"
        ) if rows else self.spark.createDataFrame(
            [], "key string, value string"
        )

    def _route_tblproperties(self, sql: str) -> DataFrame | None:
        m = self._TBLPROPS_RE.match(sql)
        if m is None:
            return None
        from roapi_spark.sinks.delta import set_table_properties

        name = self._unquote_ident(m.group(1))
        body = m.group(2)
        props = dict(self._PROP_KV_RE.findall(body))
        leftover = self._PROP_KV_RE.sub("", body).replace(",", "").strip()
        if not props or leftover:
            raise CatalogError(
                "SET TBLPROPERTIES expects ('key'='value', ...) with "
                f"quoted strings; could not parse: {body!r}"
            )
        v = set_table_properties(
            self._delta_path(name, stmt="SET TBLPROPERTIES"), props
        )
        return self._dml_summary("SET TBLPROPERTIES", name, v)

    # CREATE [OR REPLACE] TABLE <t> USING DELTA LOCATION '<path>' AS
    # <select> — delta-spark's external-table CTAS: materialize the
    # query as a new delta table at the location and register it. DROP
    # TABLE <t> deregisters (external-table semantics: data stays).
    _CTAS_RE = re.compile(
        r"^\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+" + _IDENT
        + r"\s+USING\s+DELTA\s+LOCATION\s+'([^']+)'\s+AS\s+(.+?)\s*;?\s*$",
        re.I | re.S,
    )
    _DROP_RE = re.compile(
        r"^\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?" + _IDENT + r"\s*;?\s*$",
        re.I,
    )

    def _route_ctas(self, sql: str) -> DataFrame | None:
        m = self._CTAS_RE.match(sql)
        if m is not None:
            from roapi_spark.config import parse_table_config
            from roapi_spark.sinks.delta import write_delta

            replace = m.group(1) is not None
            name = self._unquote_ident(m.group(2))
            location, select = m.group(3), m.group(4)
            if name in self.sources and not replace:
                raise CatalogError(
                    f"table already registered: {name} "
                    "(use CREATE OR REPLACE TABLE)"
                )
            if not replace and os.path.isdir(
                os.path.join(location, "_delta_log")
            ):
                raise CatalogError(
                    f"a delta table already exists at {location} "
                    "(use CREATE OR REPLACE TABLE)"
                )
            df = self.query_sql(select)  # full read surface incl. rewrites
            v = write_delta(df, location, mode="overwrite")
            self.load_table(
                parse_table_config(
                    {"name": name, "uri": location, "option": {"format": "delta"}}
                )
            )
            return self.spark.createDataFrame(
                [("CREATE TABLE", name, v)],
                "operation string, table string, version bigint",
            )
        m = self._DROP_RE.match(sql)
        if m is not None:
            name = self._unquote_ident(m.group(2))
            # group(1) is the captured IF EXISTS clause itself — a
            # substring test missed 'IF\nEXISTS'/double-space spellings
            if name not in self.sources and m.group(1) is not None:
                return self.spark.createDataFrame(
                    [("DROP TABLE", name, -1)],
                    "operation string, table string, version bigint",
                )
            self.drop_table(name)
            return self.spark.createDataFrame(
                [("DROP TABLE", name, -1)],
                "operation string, table string, version bigint",
            )
        return None

    def _route_maintenance(self, sql: str) -> DataFrame | None:
        m = self._MAINT_RE.match(sql)
        if m is None:
            routed = self._route_tblproperties(sql)
            if routed is not None:
                return routed
            routed = self._route_ctas(sql)
            if routed is not None:
                return routed
            return self._route_restore(sql)
        verb, name, rest = (
            m.group(1).upper(),
            self._unquote_ident(m.group(2)),
            m.group(3).strip(),
        )
        path = self._delta_path(name, stmt=verb)
        if verb == "OPTIMIZE":
            from roapi_spark.sinks.delta import compact

            zorder = None
            if rest:
                zm = self._ZORDER_RE.match(rest)
                if zm is None:
                    raise CatalogError(
                        f"unsupported OPTIMIZE clause {rest!r} "
                        "(use: OPTIMIZE <table> [ZORDER BY (c1, c2)])"
                    )
                zorder = [
                    c.strip().strip("`") for c in zm.group(1).split(",") if c.strip()
                ]
            v = compact(self.spark, path, zorder_by=zorder)
            return self._dml_summary("OPTIMIZE", name, v)
        keep = 2
        if rest:
            rm = self._RETAIN_RE.match(rest)
            if rm is None:
                raise CatalogError(
                    f"unsupported VACUUM clause {rest!r} "
                    "(use: VACUUM <table> [RETAIN <n> VERSIONS | "
                    "RETAIN <n> HOURS])"
                )
            n, unit = int(rm.group(1)), rm.group(2).upper()
            if unit == "HOURS":
                from roapi_spark.sinks.delta import retention_keep_versions

                keep = retention_keep_versions(path, n)
            else:
                keep = n
        from roapi_spark.sinks.delta import vacuum
        from roapi_spark.sources.delta import _log_versions

        deleted = vacuum(path, keep_versions=keep)
        # re-bind ONLY if the table advanced since this catalog bound it
        # (our own DML — flagged stale — or an external writer):
        # otherwise the bound view references head files vacuum never
        # touches, and a reload would buy a full log replay for nothing
        head = max(
            (v for v, _ in _log_versions(os.path.join(path, "_delta_log"))),
            default=-1,
        )
        if head != self._bound_delta_head.get(name):
            self.load_table(self.sources[name])
            self._stale_dml_views.discard(name)
        return self.spark.createDataFrame(
            [("VACUUM", name, len(deleted))],
            "operation string, table string, files_deleted bigint",
        )

    def _route_dml(self, sql: str) -> DataFrame | None:
        """Returns a 1-row summary DF for DELETE/UPDATE/MERGE statements
        on delta tables, or None when ``sql`` is not DML."""
        from roapi_spark.sinks.delta import (
            delete_delta,
            merge_delta,
            update_delta,
        )

        try:
            plan = self.spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)
        except Exception:
            return None  # let spark.sql raise its own parse error
        kind = plan.getClass().getSimpleName()
        if kind == "DeleteFromTable":
            name, _ = self._relation_name(plan.table())
            v = delete_delta(self.spark, self._delta_path(name), plan.condition().sql())
            return self._dml_summary("DELETE", name, v)
        if kind == "UpdateTable":
            name, _ = self._relation_name(plan.table())
            sets = {
                a.key().sql(): a.value().sql()
                for a in self._scala_seq(plan.assignments())
            }
            cond = plan.condition()
            v = update_delta(
                self.spark,
                self._delta_path(name),
                cond.get().sql() if cond.isDefined() else "true",
                sets,
            )
            return self._dml_summary("UPDATE", name, v)
        if kind == "MergeIntoTable":
            return self._route_merge(plan, merge_delta)
        if kind == "InsertIntoStatement":
            return self._route_insert(plan)
        return None

    def _route_insert(self, plan) -> DataFrame:
        """INSERT INTO / INSERT OVERWRITE <delta table> [(cols)] <query>:
        materialize the parsed query subtree, align columns positionally
        (or via the user column list), and append/overwrite through the
        sink — the table keeps its declared partition layout."""
        from pyspark.sql import DataFrame as PyDataFrame
        from pyspark.sql import functions as F

        from roapi_spark.sinks.delta import write_delta
        from roapi_spark.sources.delta import snapshot_state

        name, _ = self._relation_name(plan.table())
        path = self._delta_path(name)
        if plan.partitionSpec().size() > 0:
            raise CatalogError(
                "INSERT ... PARTITION (...) is not supported; the table's "
                "own partition layout is preserved automatically"
            )
        # Spark 4.x moved the concrete Dataset into the .classic
        # namespace; on 3.5 that package doesn't exist (py4j surfaces a
        # not-callable JavaPackage, i.e. TypeError — a real failure
        # inside ofRows raises Py4JJavaError instead and propagates).
        try:
            jdf = self.spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
                self.spark._jsparkSession, plan.query()
            )
        except TypeError:
            jdf = self.spark._jvm.org.apache.spark.sql.Dataset.ofRows(
                self.spark._jsparkSession, plan.query()
            )
        src = PyDataFrame(jdf, self.spark)
        schema = self.table(name).schema
        user_cols = [
            str(c) for c in self._scala_seq(plan.userSpecifiedCols())
        ]
        if user_cols:
            if sorted(user_cols) != sorted(f.name for f in schema.fields):
                raise CatalogError(
                    f"INSERT column list must cover every table column; "
                    f"table has {[f.name for f in schema.fields]}, got {user_cols}"
                )
            if len(src.columns) != len(user_cols):
                raise CatalogError(
                    f"INSERT arity mismatch: {len(user_cols)} columns "
                    f"listed, query produces {len(src.columns)}"
                )
            by_name = dict(zip(user_cols, src.columns))
            aligned = src.select(
                [
                    F.col(by_name[f.name]).cast(f.dataType).alias(f.name)
                    for f in schema.fields
                ]
            )
        else:
            if len(src.columns) != len(schema.fields):
                raise CatalogError(
                    f"INSERT arity mismatch: table {name} has "
                    f"{len(schema.fields)} columns, query produces "
                    f"{len(src.columns)}"
                )
            aligned = src.select(
                [
                    F.col(src.columns[i]).cast(f.dataType).alias(f.name)
                    for i, f in enumerate(schema.fields)
                ]
            )
        _, meta = snapshot_state(path)
        v = write_delta(
            aligned,
            path,
            mode="overwrite" if plan.overwrite() else "append",
            partition_by=(meta or {}).get("partitionColumns") or [],
        )
        return self._dml_summary("INSERT", name, v)

    def _route_merge(self, plan, merge_delta) -> DataFrame:
        tname, talias = self._relation_name(plan.targetTable())
        sname, salias = self._relation_name(plan.sourceTable())
        talias = talias or tname
        salias = salias or sname
        if talias == salias:
            raise CatalogError(
                "MERGE target and source need distinct names/aliases"
            )
        # Collect matched clauses IN SOURCE ORDER first; SQL evaluates
        # WHEN MATCHED clauses top-down per row, while our sink always
        # evaluates delete before update, so an UPDATE-then-DELETE
        # ordering must be translated, not passed through verbatim.
        ordered: list[tuple[str, str | None, object]] = []
        for act in self._scala_seq(plan.matchedActions()):
            acls = act.getClass().getSimpleName()
            cond = act.condition()
            cond_sql = cond.get().sql() if cond.isDefined() else None
            if acls not in ("DeleteAction", "UpdateAction", "UpdateStarAction"):
                raise CatalogError(f"unsupported matched action: {acls}")
            ordered.append((acls, cond_sql, act))
        if sum(1 for a, _, _ in ordered if a == "DeleteAction") > 1:
            raise CatalogError("at most one WHEN MATCHED ... DELETE")
        if sum(1 for a, _, _ in ordered if a != "DeleteAction") > 1:
            raise CatalogError("at most one WHEN MATCHED ... UPDATE")
        for i, (_, cond_sql, _) in enumerate(ordered):
            # the plan is parse-only (analysis never runs), so enforce the
            # standard rule ourselves: a clause can only be skipped over if
            # it has a condition — an unconditional non-final clause makes
            # every later clause unreachable
            if cond_sql is None and i < len(ordered) - 1:
                raise CatalogError(
                    "only the last WHEN MATCHED clause may omit its condition"
                )
        upd: dict[str, str] | None = None
        upd_cond: str | None = None
        del_cond: str | None = None
        prior_upd_cond: str | None = None
        for acls, cond_sql, act in ordered:
            if acls == "DeleteAction":
                if prior_upd_cond is not None:
                    # UPDATE (AND c) came first: per SQL, a matched row is
                    # deleted only when c did NOT fire (false or NULL).
                    # Our sink evaluates delete first, so fold that guard
                    # into the delete predicate.
                    guard = f"(NOT coalesce(({prior_upd_cond}), false))"
                    del_cond = (
                        f"{guard} AND ({cond_sql})" if cond_sql else guard
                    )
                else:
                    del_cond = cond_sql or "true"
            else:  # UpdateAction / UpdateStarAction
                upd_cond = cond_sql
                prior_upd_cond = cond_sql or "true"
                if acls == "UpdateStarAction":
                    upd = {
                        c: f"{salias}.{c}"
                        for c in self.table(tname).columns
                    }
                else:
                    upd = {
                        a.key().sql(): a.value().sql()
                        for a in self._scala_seq(act.assignments())
                    }
        insert = False
        insert_cond: str | None = None
        for act in self._scala_seq(plan.notMatchedActions()):
            acls = act.getClass().getSimpleName()
            if acls == "InsertStarAction":
                insert = True
                cond = act.condition()
                # WHEN NOT MATCHED AND <c> THEN INSERT *: dropping the
                # condition would insert every unmatched source row
                insert_cond = cond.get().sql() if cond.isDefined() else None
            else:
                raise CatalogError(
                    f"only INSERT * is supported for WHEN NOT MATCHED, got {acls}"
                )
        # Spark 3.4+ grammar: WHEN NOT MATCHED BY SOURCE clauses touch
        # target rows WITHOUT a source match — a rewrite shape this
        # sink does not implement; silently ignoring them would commit
        # a MERGE that kept rows the user asked to delete/update
        by_source = getattr(plan, "notMatchedBySourceActions", None)
        if by_source is not None and len(self._scala_seq(by_source())) > 0:
            raise CatalogError("WHEN NOT MATCHED BY SOURCE is not supported")
        v = merge_delta(
            self.spark,
            self._delta_path(tname),
            self.table(sname),
            on_condition=plan.mergeCondition().sql(),
            when_matched_update=upd,
            when_matched_update_condition=upd_cond,
            when_matched_delete=del_cond,
            when_not_matched_insert=insert,
            when_not_matched_insert_condition=insert_cond,
            target_alias=talias,
            source_alias=salias,
        )
        return self._dml_summary("MERGE", tname, v)

    # SELECT-level time travel (delta-spark grammar): `FROM <t> [FOR]
    # VERSION AS OF <n>` / `TIMESTAMP AS OF '<ts>'`. Spark's parser
    # accepts the syntax but only resolves it for v2 tables, so the
    # reference is rewritten to a version-pinned temp view built by the
    # delta reader (sources/delta.py option.version/option.timestamp)
    # before the statement reaches spark.sql. Read-only-safe: a pinned
    # snapshot is a read.
    #
    # The match is keyword-anchored with a MANUAL backward scan for the
    # table identifier: an `ident\s+(FOR\s+)?VERSION AS OF` regex
    # backtracks quadratically on long identifier-char runs (a 70 KB
    # /* xxx... */ comment pad hung the h2c upload e2e for minutes),
    # while finditer on the literal keyword + a linear walk backward is
    # O(n) on any input.
    _TT_KEY_RE = re.compile(
        r"\b(VERSION|TIMESTAMP)\s+AS\s+OF\s+('[^']*'|\d+)", re.I
    )
    _IDENT_CHARS = frozenset(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_."
    )

    def _ident_before(self, sql: str, pos: int) -> tuple[str, int] | None:
        """The table identifier (bare or backticked) that immediately
        precedes ``pos``, skipping whitespace and one optional FOR
        keyword; returns (identifier, start_index) or None."""
        j = pos
        while j > 0 and sql[j - 1].isspace():
            j -= 1
        if (
            j >= 3
            and sql[j - 3 : j].upper() == "FOR"
            and (j - 3 == 0 or not (sql[j - 4] in self._IDENT_CHARS or sql[j - 4] == "`"))
        ):
            j -= 3
            while j > 0 and sql[j - 1].isspace():
                j -= 1
        if j > 0 and sql[j - 1] == "`":
            k = sql.rfind("`", 0, j - 1)
            if k < 0:
                return None
            return sql[k:j], k
        k = j
        while k > 0 and sql[k - 1] in self._IDENT_CHARS:
            k -= 1
        return (sql[k:j], k) if k < j else None

    def _rewrite_time_travel(self, sql: str) -> str:
        out: list[str] = []
        last = 0
        # scan the literal-masked text (a keyword inside a string value
        # must not fire), re-matching each hit on the ORIGINAL so the
        # captured tokens carry the real quoted content
        masked = self._mask_literals(sql)
        for mm in self._TT_KEY_RE.finditer(masked):
            m = self._TT_KEY_RE.match(sql, mm.start())
            if m is None:
                continue
            if m.start() < last:  # keyword inside a consumed span
                continue
            found = self._ident_before(sql, m.start())
            if found is None:
                continue
            ident, start = found
            name = self._unquote_ident(ident)
            if name.upper() == "TO":  # RESTORE ... TO VERSION AS OF
                continue
            if name not in self.sources:
                raise CatalogError(f"table not found: {name}")
            ts = self.sources[name]
            if self._resolved_fmt(ts) != "delta":
                raise CatalogError(
                    f"time travel is only supported on delta-backed tables; "
                    f"{name!r} has format {ts.format!r}"
                )
            kind, raw = m.group(1).upper(), m.group(2)
            opt = dict(ts.option)
            safe = re.sub(r"\W", "_", name)  # temp view names reject dots
            if kind == "VERSION":
                if not raw.isdigit():
                    raise CatalogError(
                        f"VERSION AS OF expects an integer, got {raw}"
                    )
                opt["version"] = int(raw)
                view = f"__asof_{safe}_v{raw}"
            else:
                if not (raw.startswith("'") and raw.endswith("'")):
                    raise CatalogError(
                        f"TIMESTAMP AS OF expects a quoted timestamp, got {raw}"
                    )
                opt["timestamp"] = raw[1:-1]
                # digit-squash alone collides bounds differing only in
                # non-digits ('+05:00' vs '-05:00'); hash the raw token
                view = (
                    f"__asof_{safe}_t{re.sub(r'[^0-9]', '', raw)}"
                    f"_{hashlib.md5(raw.encode()).hexdigest()[:8]}"
                )
            import dataclasses

            pinned = dataclasses.replace(ts, name=view, option=opt)
            _load(self.spark, self._stage_source(pinned)).createOrReplaceTempView(view)
            out.append(sql[last:start])
            out.append(view)
            last = m.end()
        out.append(sql[last:])
        return "".join(out)

    # delta-spark's CDF table-valued function: `SELECT ... FROM
    # table_changes('t', start[, end])` where each bound is a version
    # number or a quoted ISO timestamp (resolved against commit times,
    # like delta-spark). Spark has no such TVF for v1 relations, so the
    # call is rewritten to a temp view over the CDF reader
    # (sources/delta.table_changes: _change_type / _commit_version /
    # _commit_timestamp per changed row). A read — allowed in
    # read-only mode.
    _CDF_RE = re.compile(
        r"table_changes\(\s*'([^']+)'\s*,\s*(\d+|'[^']*')\s*"
        r"(?:,\s*(\d+|'[^']*')\s*)?\)",
        re.I,
    )

    def _rewrite_table_changes(self, sql: str) -> str:
        def bound(tok: str | None) -> int | str | None:
            if tok is None:
                return None
            return tok[1:-1] if tok.startswith("'") else int(tok)

        def repl(m: re.Match) -> str:
            name = m.group(1)
            start, end = bound(m.group(2)), bound(m.group(3))
            path = self._delta_path(name, stmt="table_changes")
            from roapi_spark.sources.delta import table_changes

            # temp view names reject dots/quotes/colons; the \W-squash
            # alone would collide bounds differing only in punctuation
            # ('2026-01-01 00:00' vs '2026-01-01T00:00'), so a hash of
            # the RAW bound tokens disambiguates
            safe = re.sub(r"\W", "_", name)
            s_tag = re.sub(r"\W", "_", m.group(2))
            e_tag = re.sub(r"\W", "_", m.group(3)) if m.group(3) else "head"
            raw_hash = hashlib.md5(
                f"{m.group(2)}|{m.group(3)}".encode()
            ).hexdigest()[:8]
            view = f"__cdf_{safe}_{s_tag}_{e_tag}_{raw_hash}"
            table_changes(self.spark, path, start, end).createOrReplaceTempView(
                view
            )
            return view

        # scan the literal-masked text so a table_changes(...) snippet
        # inside a string value is never rewritten; re-match each hit
        # on the original for the real quoted arguments
        masked = self._mask_literals(sql)
        out: list[str] = []
        last = 0
        for mm in self._CDF_RE.finditer(masked):
            m = self._CDF_RE.match(sql, mm.start())
            if m is None or m.start() < last:
                continue
            out.append(sql[last : m.start()])
            out.append(repl(m))
            last = m.end()
        out.append(sql[last:])
        return "".join(out)

    def query_sql(self, sql: str, args: list | None = None) -> DataFrame:
        """``args`` are positional parameters for ``?`` placeholders,
        bound by Spark's native parameterized-SQL support (values never
        pasted into the SQL text — no quoting/injection concerns)."""
        meta_df = self._route_history(sql)  # read-only-safe: log metadata
        if meta_df is None:
            meta_df = self._route_detail(sql)
        if meta_df is None:
            meta_df = self._route_show_tblproperties(sql)
        if meta_df is not None:
            return meta_df
        if self.read_only:
            if self._MAINT_RE.match(sql) or self._RESTORE_RE.match(sql):
                raise ReadOnlyError(
                    f"read-only mode rejects table maintenance: {sql[:80]}"
                )
            self._assert_read_only_sql(sql)
        else:
            routed = self._route_maintenance(sql)
            if routed is None:
                routed = self._route_dml(sql)
            if routed is not None:
                return routed
        if self._stale_dml_views:
            self._flush_stale_views()
        masked = self._mask_literals(sql)
        if self._TT_KEY_RE.search(masked):
            sql = self._rewrite_time_travel(sql)
            masked = self._mask_literals(sql)
        if self._CDF_RE.search(masked):
            sql = self._rewrite_table_changes(sql)
            masked = self._mask_literals(sql)
        if self._INFO_SCHEMA_RE.search(masked):
            self._materialize_information_schema()
            # rewrite only OUTSIDE literals (mask positions map 1:1)
            out: list[str] = []
            last = 0
            for m in self._INFO_SCHEMA_RE.finditer(masked):
                out.append(sql[last : m.start()])
                out.append(f"information_schema_{m.group(1).lower()}")
                last = m.end()
            out.append(sql[last:])
            sql = "".join(out)
        if args:
            return self.spark.sql(sql, args=args)
        return self.spark.sql(sql)

    def query_rest(self, table: str, params: dict[str, str]) -> DataFrame:
        return rest_query_to_df(self.table(table), params)

    def query_graphql(self, query: str) -> DataFrame:
        if self._stale_dml_views:
            self._flush_stale_views()
        tables = {name: self.spark.table(name) for name in self.sources}
        return graphql_to_df(tables, query)

    # -- kv ----------------------------------------------------------------

    def load_kv(self, kvs: KeyValueSource) -> None:
        """Materialize key/value columns to a driver dict (columnq.rs:275-331;
        the reference requires Utf8 cols — we stringify, same contract)."""
        ts = TableSource(name=kvs.name, uri=kvs.uri, format=kvs.format, option=kvs.option)
        df = _load(self.spark, ts).select(kvs.key, kvs.value)
        mapping = {str(r[0]): (None if r[1] is None else str(r[1])) for r in df.collect()}
        with self._lock:
            self.kv[kvs.name] = mapping
            self._kv_sources[kvs.name] = kvs

    def kv_get(self, name: str, key: str) -> str | None:
        if name not in self.kv:
            raise CatalogError(f"kv store not found: {name}")
        return self.kv[name].get(key)

    # -- refresh -----------------------------------------------------------

    def refresh_table(self, name: str) -> None:
        ts = self.sources.get(name)
        if ts is None:
            raise CatalogError(f"table not found: {name}")
        head = None
        if self._resolved_fmt(ts) == "delta":
            from roapi_spark.sources.delta import _log_versions

            # pre-load listing, same reasoning as load_table: recorded
            # head <= the rebound snapshot, so VACUUM's comparison can
            # only over-rebind, never skip a required one
            head = max(
                (v for v, _ in _log_versions(
                    os.path.join(ts.uri, "_delta_log"))),
                default=-1,
            )
        df = _load(self.spark, self._stage_source(ts))
        with self._lock:
            self._bind(ts, df)
            if head is not None:
                self._bound_delta_head[name] = head

    def start_refresh_loop(self, poll_interval: float = 1.0) -> None:
        """Background drain loop (startup.rs:75-82's 1 s cadence): any table
        whose reload_interval elapsed is re-loaded and atomically re-bound."""
        if self._refresh_thread is not None:
            return
        last: dict[str, float] = {}

        def run() -> None:
            while not self._refresh_stop.wait(poll_interval):
                for name, ts in list(self.sources.items()):
                    if ts.reload_interval is None:
                        continue
                    now = time.monotonic()
                    if now - last.get(name, 0.0) >= ts.reload_interval:
                        try:
                            self.refresh_table(name)
                        except Exception:  # noqa: BLE001 — keep serving stale
                            pass
                        last[name] = now

        self._refresh_thread = threading.Thread(target=run, daemon=True, name="tbl-refresh")
        self._refresh_thread.start()

    def stop_refresh_loop(self) -> None:
        self._refresh_stop.set()
        if self._refresh_thread:
            self._refresh_thread.join(timeout=5)
            self._refresh_thread = None
        self._refresh_stop.clear()


def catalog_from_config(spark: SparkSession, cfg: AppConfig) -> Catalog:
    cat = Catalog(spark, read_only=cfg.read_only)
    for ts in cfg.tables:
        cat.load_table(ts)
    for kvs in cfg.kvstores:
        cat.load_kv(kvs)
    if any(t.reload_interval is not None for t in cfg.tables):
        cat.start_refresh_loop()
    return cat
