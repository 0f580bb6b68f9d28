"""JSON array-of-objects encoder with Arrow's value rendering
(reference: columnq/src/encoding/json.rs:5-19 + golden formats
json.rs:30-139):

- Date32/64 -> "YYYY-MM-DD"
- Timestamp -> "YYYY-MM-DDTHH:MM:SS[.ffffff]" (no tz suffix)
- Time -> "HH:MM:SS[.ffffff]"
- Binary -> lowercase hex (postgres.rs:252-261 renders hex; JSON follows)
- Decimal -> number-as-string? No: Arrow's JSON writer emits numbers;
  we emit float for Decimal (documented).
- NaN/Inf -> null (JSON has no representation; Arrow writer errors, we
  choose null)
"""

from __future__ import annotations

import json
import math
from datetime import date, datetime, time
from decimal import Decimal

import pyarrow as pa


def _frac(us: int) -> str:
    """Arrow renders the fraction at unit width and omits it when zero
    (golden tests json.rs:107-110: '04:04:28', '28.001', '28.000002')."""
    if us == 0:
        return ""
    if us % 1000 == 0:
        return f".{us // 1000:03d}"
    return f".{us:06d}"


def _default(v: object) -> object:
    if isinstance(v, datetime):
        return (
            f"{v.year:04d}-{v.month:02d}-{v.day:02d}T"
            f"{v.hour:02d}:{v.minute:02d}:{v.second:02d}{_frac(v.microsecond)}"
        )
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, time):
        return f"{v.hour:02d}:{v.minute:02d}:{v.second:02d}{_frac(v.microsecond)}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, Decimal):
        return float(v)
    raise TypeError(f"not JSON serializable: {type(v)}")


def _clean(v: object) -> object:
    if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
        return None
    if isinstance(v, dict):
        return {k: _clean(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_clean(x) for x in v]
    return v


def rows_to_json_bytes(table: pa.Table) -> bytes:
    rows = [_clean(r) for r in table.to_pylist()]
    return json.dumps(rows, default=_default, separators=(",", ":")).encode()


def rows_to_ndjson_bytes(table: pa.Table) -> bytes:
    """Newline-delimited JSON (application/x-ndjson): one object per
    line, same value rendering as the array encoder — the streaming-
    friendly shape log shippers and `jq`-pipelines consume."""
    rows = [_clean(r) for r in table.to_pylist()]
    return b"".join(
        json.dumps(r, default=_default, separators=(",", ":")).encode() + b"\n"
        for r in rows
    )
