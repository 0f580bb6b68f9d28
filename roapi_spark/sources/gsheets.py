"""Google Spreadsheet loader (reference: columnq/src/table/
google_spreadsheets.rs — service-account OAuth2 + Sheets REST values API).

The full pipeline is implemented: spreadsheet-id extraction from the
docs.google.com URL, sheet-properties lookup (first visible sheet when no
``sheet_title`` option, mirroring ``google_spreadsheets.rs`` resolve), the
``values`` REST fetch with a bearer token, and typed inference over the
returned string cells (``values_to_dataframe``). Tokens come from the
``token`` option / ``GOOGLE_SHEETS_TOKEN``, or are *minted* from a
service-account key file via the stdlib-only RS256 signer
(``sources/rs256.py`` — the yup-oauth2 jwt-bearer flow the reference
uses). Tests drive the HTTP path against a local mock of the Sheets API
(``api_base_url`` option) and verify signatures with the real RSA
public-key operation."""

from __future__ import annotations

import json
import os
import re
import urllib.parse
import urllib.request
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from roapi_spark.config import TableSource
from roapi_spark.sources import LoadError

_API_BASE = "https://sheets.googleapis.com"


def infer_cell(v: str) -> Any:
    s = v.strip()
    if s == "":
        return None
    low = s.lower()
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    return s


def values_to_dataframe(spark: SparkSession, values: list[list[str]]) -> DataFrame:
    """First row = header; cells typed by inference with conflict->string
    upcast (google_spreadsheets.rs:150-190 infer_schema analogue)."""
    if not values:
        raise LoadError("empty sheet")
    header, *rows = values
    cols: list[list[Any]] = [[] for _ in header]
    for r in rows:
        for i in range(len(header)):
            cell = r[i] if i < len(r) else ""
            cols[i].append(infer_cell(cell))
    # conflict -> string upcast
    out_cols: dict[str, list[Any]] = {}
    for name, col in zip(header, cols):
        types = {type(v) for v in col if v is not None}
        if len(types - {int, float}) > 1 or (str in types and len(types) > 1):
            col = [str(v) if v is not None else None for v in col]
        elif types == {int, float}:
            col = [float(v) if v is not None else None for v in col]
        out_cols[name] = col
    import pyarrow as pa

    return spark.createDataFrame(pa.table(out_cols))


def spreadsheet_id_from_uri(uri: str) -> str:
    """docs.google.com/spreadsheets/d/{id}/... -> id (the reference's URL
    parse); a bare id (no slashes) passes through."""
    m = re.search(r"/spreadsheets/d/([A-Za-z0-9_-]+)", uri)
    if m:
        return m.group(1)
    if re.fullmatch(r"[A-Za-z0-9_-]+", uri):
        return uri
    raise LoadError(f"cannot extract a spreadsheet id from {uri!r}")


def _get_json(url: str, token: str) -> Any:
    req = urllib.request.Request(url, headers={"Authorization": f"Bearer {token}"})
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return json.loads(resp.read())
    except OSError as exc:
        raise LoadError(f"sheets api request failed: {exc}") from exc


def resolve_sheet_title(api_base: str, sid: str, token: str, want: str | None) -> str:
    """Pick the named sheet, or the first one — the reference resolves the
    sheet from spreadsheet properties the same way before fetching values."""
    props = _get_json(f"{api_base}/v4/spreadsheets/{sid}?fields=sheets/properties", token)
    titles = [
        s.get("properties", {}).get("title")
        for s in props.get("sheets", [])
        if s.get("properties", {}).get("title")
    ]
    if not titles:
        raise LoadError(f"spreadsheet {sid!r} has no sheets")
    if want is None:
        return titles[0]
    if want not in titles:
        raise LoadError(f"no sheet titled {want!r} (have {titles})")
    return want


def fetch_values(
    api_base: str, sid: str, sheet_title: str, token: str
) -> list[list[str]]:
    data = _get_json(
        f"{api_base}/v4/spreadsheets/{sid}/values/{urllib.parse.quote(sheet_title)}",
        token,
    )
    values = data.get("values")
    if not values:
        raise LoadError(f"sheet {sheet_title!r} returned no values")
    return values


def _resolve_token(ts: TableSource) -> str:
    token = ts.option.get("token") or os.environ.get("GOOGLE_SHEETS_TOKEN")
    if token:
        return token
    if ts.option.get("service_account_key_file"):
        # service-account flow (google_spreadsheets.rs OAuth2): mint an
        # RS256 JWT with the stdlib-only signer and exchange it at token_uri
        from roapi_spark.sources import rs256

        try:
            with open(ts.option["service_account_key_file"]) as f:
                key = json.load(f)
            return rs256.fetch_access_token(
                key, token_uri=ts.option.get("token_uri")
            )
        except (OSError, ValueError) as exc:
            raise LoadError(
                f"google_spreadsheet table {ts.name!r}: service-account "
                f"token mint failed: {exc}"
            ) from exc
    raise LoadError(
        f"google_spreadsheet table {ts.name!r}: no credentials — set option "
        "'token' or GOOGLE_SHEETS_TOKEN"
    )


def to_dataframe(spark: SparkSession, ts: TableSource) -> DataFrame:
    token = _resolve_token(ts)
    api_base = ts.option.get("api_base_url", _API_BASE).rstrip("/")
    sid = spreadsheet_id_from_uri(ts.uri)
    title = resolve_sheet_title(api_base, sid, token, ts.option.get("sheet_title"))
    return values_to_dataframe(spark, fetch_values(api_base, sid, title, token))
