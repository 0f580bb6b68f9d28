"""Config parsing: YAML/dict -> TableSource / KeyValueSource / AppConfig.

Reference shapes:
- ``TableSource { name, io_source(uri), io_option, schema, schema_from_files,
  option(format...), batch_size, partition_columns, reload_interval }`` —
  columnq/src/table/mod.rs:507-522.
- ``KeyValueSource { name, key, value, io_source ... }`` — mod.rs:925-936.
- Server config with tables/kvstores/addr/read_only + engine passthrough map
  (``datafusion.{k}`` -> here ``spark.{k}``) — roapi/src/config.rs:42-57,
  246-260.
- Format sniffing from the uri extension when no explicit format option —
  table/mod.rs:790-858; URI-scheme database sniffing mod.rs:623-644.
- CLI shorthand ``-t name=uri`` / ``-t uri`` — parse_table_uri_arg,
  table/mod.rs:860-923.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import types as T

from roapi_spark.types import parse_table_schema

KNOWN_FORMATS = {
    "csv",
    "tsv",
    "json",
    "ndjson",
    "jsonl",
    "parquet",
    "orc",
    "avro",
    "delta",
    "hudi",
    "iceberg",
    "arrow",
    "arrows",
    "xlsx",
    "xls",
    "xlsb",
    "ods",
    "sqlite",
    "mysql",
    "postgres",
    "google_spreadsheet",
    "airtable",
    "binary",
    "warc",
    "cdx",
    "sitemap",
}

_EXT_TO_FORMAT = {
    ".csv": "csv",
    ".tsv": "tsv",
    ".json": "json",
    ".ndjson": "ndjson",
    ".jsonl": "jsonl",
    ".parquet": "parquet",
    ".orc": "orc",
    ".avro": "avro",
    ".arrow": "arrow",
    ".arrows": "arrows",
    ".xlsx": "xlsx",
    ".xls": "xls",
    ".xlsb": "xlsb",
    ".ods": "ods",
    ".db": "sqlite",
    ".sqlite": "sqlite",
    ".sqlite3": "sqlite",
    ".warc": "warc",
    ".cdx": "cdx",
    ".cdxj": "cdx",
}

_SCHEME_TO_FORMAT = {
    "sqlite": "sqlite",
    "airtable": "airtable",
    "mysql": "mysql",
    "postgres": "postgres",
    "postgresql": "postgres",
}


class ConfigError(ValueError):
    pass


@dataclass
class PartitionColumn:
    name: str
    data_type: str = "Utf8"


@dataclass
class TableSource:
    name: str
    uri: str
    format: str | None = None
    option: dict[str, Any] = field(default_factory=dict)
    schema: T.StructType | None = None
    schema_from_files: list[str] | None = None
    use_memory_table: bool | None = None  # None -> loader default
    # reference: columnq table/mod.rs:570-572 (default_batch_size 8192).
    # Spark has no per-scan row-batch knob; this maps at load time to the
    # session's Arrow transfer batch cap + parquet vectorized reader
    # batch size (sources/__init__.py:load_table).
    batch_size: int | None = None
    partition_columns: list[PartitionColumn] = field(default_factory=list)
    reload_interval: float | None = None  # seconds
    io_option: dict[str, Any] = field(default_factory=dict)

    def resolved_format(self) -> str:
        if self.format:
            return self.format
        fmt = sniff_format(self.uri)
        if fmt is None:
            raise ConfigError(f"cannot infer format for table {self.name!r} from {self.uri!r}")
        return fmt


@dataclass
class KeyValueSource:
    name: str
    key: str
    value: str
    uri: str
    format: str | None = None
    option: dict[str, Any] = field(default_factory=dict)


@dataclass
class AppConfig:
    tables: list[TableSource] = field(default_factory=list)
    kvstores: list[KeyValueSource] = field(default_factory=list)
    addr: str = "127.0.0.1:8080"
    read_only: bool = True
    default_response_format: str = "json"
    spark_conf: dict[str, str] = field(default_factory=dict)


def sniff_format(uri: str) -> str | None:
    """Extension / URI-scheme sniffing (table/mod.rs:790-858, 623-644)."""
    scheme = uri.split("://", 1)[0].lower() if "://" in uri else ""
    if scheme in _SCHEME_TO_FORMAT:
        return _SCHEME_TO_FORMAT[scheme]
    path = uri.split("://", 1)[-1].split("?", 1)[0]
    if path.lower().endswith(".warc.gz"):  # splitext sees only .gz
        return "warc"
    if path.lower().endswith((".cdx.gz", ".cdxj.gz")):
        return "cdx"
    _, ext = os.path.splitext(path.rstrip("/"))
    fmt = _EXT_TO_FORMAT.get(ext.lower())
    if fmt is None and os.path.isdir(path):
        # table-format directories sniff by their metadata layout
        if os.path.isdir(os.path.join(path, "_delta_log")):
            return "delta"
        if os.path.isdir(os.path.join(path, ".hoodie")):
            return "hudi"
        if os.path.isdir(os.path.join(path, "metadata")) and any(
            n.endswith(".metadata.json")
            for n in os.listdir(os.path.join(path, "metadata"))
        ):
            return "iceberg"
        if any(
            n.endswith((".warc", ".warc.gz")) for n in os.listdir(path)
        ):
            return "warc"
    return fmt


def _parse_batch_size(v: Any, table: str) -> int | None:
    if v is None:
        return None
    # strict: bools are ints in Python (true -> 1 would cap every batch
    # at one row), and a float typo must not silently truncate
    if isinstance(v, bool) or not (
        isinstance(v, int) or (isinstance(v, str) and v.isdigit())
    ):
        raise ConfigError(
            f"bad batch_size {v!r} for table {table!r} (want a positive int)"
        )
    n = int(v)
    if n <= 0:
        raise ConfigError(f"batch_size must be positive for table {table!r}, got {n}")
    return n


def parse_table_config(d: dict[str, Any]) -> TableSource:
    if "name" not in d or "uri" not in d:
        raise ConfigError(f"table config needs name and uri: {d!r}")
    opt = dict(d.get("option") or {})
    fmt = opt.pop("format", None) or d.get("format")
    if fmt is not None and fmt not in KNOWN_FORMATS:
        raise ConfigError(f"unknown format {fmt!r} for table {d['name']!r}")
    schema = parse_table_schema(d["schema"]) if d.get("schema") else None
    pcols = [
        PartitionColumn(name=c["name"], data_type=str(c.get("data_type", "Utf8")))
        for c in d.get("partition_columns") or []
    ]
    return TableSource(
        name=d["name"],
        uri=d["uri"],
        format=fmt,
        option=opt,
        schema=schema,
        schema_from_files=d.get("schema_from_files"),
        use_memory_table=opt.pop("use_memory_table", d.get("use_memory_table")),
        batch_size=_parse_batch_size(
            opt.pop("batch_size", d.get("batch_size")), d["name"]
        ),
        partition_columns=pcols,
        reload_interval=d.get("reload_interval"),
        io_option=dict(d.get("io_option") or {}),
    )


def parse_kv_config(d: dict[str, Any]) -> KeyValueSource:
    for k in ("name", "key", "value", "uri"):
        if k not in d:
            raise ConfigError(f"kvstore config needs {k}: {d!r}")
    opt = dict(d.get("option") or {})
    return KeyValueSource(
        name=d["name"],
        key=d["key"],
        value=d["value"],
        uri=d["uri"],
        format=opt.pop("format", None),
        option=opt,
    )


def parse_config(d: dict[str, Any]) -> AppConfig:
    return AppConfig(
        tables=[parse_table_config(t) for t in d.get("tables") or []],
        kvstores=[parse_kv_config(k) for k in d.get("kvstores") or []],
        addr=d.get("addr", "127.0.0.1:8080"),
        read_only=bool(d.get("read_only", True)),
        default_response_format=d.get("response_format", "json"),
        spark_conf={str(k): str(v) for k, v in (d.get("spark") or {}).items()},
    )


def load_config_file(path: str) -> AppConfig:
    import yaml

    with open(path) as f:
        return parse_config(yaml.safe_load(f) or {})


def parse_table_uri_arg(arg: str) -> TableSource:
    """CLI shorthand ``name=uri[,opt=val...]`` or bare ``uri`` (table name =
    file stem) — mirrors parse_table_uri_arg, table/mod.rs:860-923."""
    if "=" in arg.split(",", 1)[0]:
        name, rest = arg.split("=", 1)
    else:
        name, rest = None, arg
    parts = rest.split(",")
    uri = parts[0]
    opt: dict[str, Any] = {}
    for p in parts[1:]:
        if "=" not in p:
            raise ConfigError(f"bad table option {p!r} in {arg!r}")
        k, v = p.split("=", 1)
        opt[k] = v
    if name is None:
        base = os.path.basename(uri.rstrip("/"))
        name = os.path.splitext(base)[0] or base
    fmt = opt.pop("format", None)
    return parse_table_config({"name": name, "uri": uri, "option": {**opt, "format": fmt} if fmt else opt})
