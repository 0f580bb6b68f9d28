"""stdin table source (reference: parse_table_uri_arg 'stdin' branch,
columnq/src/table/mod.rs:888-896): read all bytes, dispatch by declared
format (required — nothing to sniff)."""

from __future__ import annotations

import os
import sys
import tempfile
from dataclasses import replace

from roapi_spark.config import ConfigError, TableSource


def stdin_to_local(ts: TableSource) -> TableSource:
    if not ts.format:
        raise ConfigError(f"stdin table {ts.name!r} needs an explicit format option")
    data = sys.stdin.buffer.read()
    fd, path = tempfile.mkstemp(prefix="roapi_stdin_", suffix=f".{ts.format}")
    with os.fdopen(fd, "wb") as out:
        out.write(data)
    return replace(ts, uri=path)
