"""Airtable loader — the reference's own unchecked roadmap box
('Data layer: [ ] Airtable', README.md), implemented against the public
Airtable Web API (GET /v0/{baseId}/{tableIdOrName}, bearer-token auth,
``offset`` cursor pagination, records as {id, createdTime, fields}).

URI forms:
  airtable://appBASEID/TableName          (+ option.api_key / env)
  any uri with option.format=airtable, option.base_id, option.table

The API key comes from ``option.api_key`` or ``AIRTABLE_API_KEY``.
Rows surface the record ``fields`` plus ``_id`` and ``_created_time``
metadata columns (the stable identifiers every Airtable sync keeps).
Schema is inferred by Spark over the JSON rows — Airtable is schemaless
per record, so the union of observed fields defines the columns.
Tests drive the full HTTP path (auth header, pagination cursor) against
a local mock via ``option.api_base_url``."""

from __future__ import annotations

import json
import os
import urllib.parse
import urllib.request

from pyspark.sql import DataFrame, SparkSession

from roapi_spark.config import TableSource
from roapi_spark.sources import LoadError

_API_BASE = "https://api.airtable.com"
_PAGE_SIZE = 100
_MAX_PAGES = 10_000  # runaway-cursor guard: 1M records


def _parse_uri(ts: TableSource) -> tuple[str, str]:
    base_id = ts.option.get("base_id")
    table = ts.option.get("table")
    if base_id and table:
        return str(base_id), str(table)
    rest = ts.uri.split("://", 1)[-1]
    parts = rest.split("/", 1)
    if len(parts) == 2 and parts[0] and parts[1]:
        return parts[0], urllib.parse.unquote(parts[1])
    raise LoadError(
        f"airtable table {ts.name!r}: need airtable://<base_id>/<table> "
        "or option.base_id + option.table"
    )


def fetch_records(
    base_id: str,
    table: str,
    api_key: str,
    api_base_url: str = _API_BASE,
    view: str | None = None,
) -> list[dict]:
    """All records via offset-cursor pagination (the public API caps a
    page at 100 records)."""
    records: list[dict] = []
    offset: str | None = None
    for _ in range(_MAX_PAGES):
        params = {"pageSize": str(_PAGE_SIZE)}
        if view:
            params["view"] = view
        if offset:
            params["offset"] = offset
        url = (
            f"{api_base_url}/v0/{urllib.parse.quote(base_id, safe='')}/"
            # safe='' so a '/' in a table name (legal in Airtable) stays
            # one path segment instead of splitting the URL
            f"{urllib.parse.quote(table, safe='')}?{urllib.parse.urlencode(params)}"
        )
        req = urllib.request.Request(
            url, headers={"Authorization": f"Bearer {api_key}"}
        )
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                payload = json.load(resp)
        except urllib.error.HTTPError as exc:
            raise LoadError(
                f"airtable API error {exc.code} for {base_id}/{table}: "
                f"{exc.read()[:200]!r}"
            ) from exc
        except urllib.error.URLError as exc:
            raise LoadError(f"airtable API unreachable: {exc.reason}") from exc
        records.extend(payload.get("records") or [])
        offset = payload.get("offset")
        if not offset:
            return records
    raise LoadError(
        f"airtable {base_id}/{table}: pagination exceeded "
        f"{_MAX_PAGES * _PAGE_SIZE} records without terminating"
    )


def to_dataframe(spark: SparkSession, ts: TableSource) -> DataFrame:
    base_id, table = _parse_uri(ts)
    api_key = ts.option.get("api_key") or os.environ.get("AIRTABLE_API_KEY")
    if not api_key:
        raise LoadError(
            f"airtable table {ts.name!r}: no API key (option.api_key or "
            "AIRTABLE_API_KEY)"
        )
    records = fetch_records(
        base_id,
        table,
        str(api_key),
        api_base_url=str(ts.option.get("api_base_url") or _API_BASE),
        view=ts.option.get("view"),
    )
    if not records:
        raise LoadError(f"airtable table {ts.name!r}: no records returned")
    rows = [
        # metadata keys LAST so a user field literally named '_id' /
        # '_created_time' cannot clobber the record identifiers
        {**(r.get("fields") or {}),
         "_id": r.get("id"), "_created_time": r.get("createdTime")}
        for r in records
    ]
    # one JSON document per record; Spark infers the unioned schema the
    # same way the ndjson loader does
    return spark.read.json(
        spark.sparkContext.parallelize([json.dumps(r) for r in rows])
    )
