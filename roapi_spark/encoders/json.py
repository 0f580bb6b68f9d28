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


def _default(v: object) -> object:
    if isinstance(v, datetime):
        s = v.isoformat(sep="T")
        # strip tz offset to match Arrow's naive rendering
        for sep in ("+", "Z"):
            if sep in s[10:]:
                s = s[: s[10:].index(sep) + 10]
                break
        return s
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, time):
        return v.isoformat()
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
