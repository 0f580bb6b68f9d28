"""WARC sink: write a DataFrame of HTTP captures as ISO 28500 archives.

The write half of the crawl round-trip (sources/warc.py is the read
half): corpus exports, re-sharding a crawl, or materializing synthetic
captures land as standard ``.warc[.gz]`` files any WARC consumer reads.

Layout contract (the crawl-file unit): ONE archive per value of the
caller-supplied shard column — file sizing is therefore an explicit
caller decision (Common Crawl caps ~1 GB per file for fetch-unit
parallelism), never an accident of Spark partitioning. Each archive
opens with a ``warcinfo`` record and is written tmp+rename, so readers
never observe a partial archive and task retries/speculation are
idempotent (last rename wins with identical bytes — records are sorted
by (uri, date, payload digest) inside each shard, and record IDs are
deterministic uuid5 hashes of (uri, date, digest, ordinal) — unique
per record as ISO 28500 §5.2 requires, yet a re-executed task still
produces the exact same file).

Expected columns: ``target_uri`` (string, required), ``payload``
(binary), plus optional ``http_status`` (int, default 200),
``http_content_type`` (string, default application/octet-stream) and
``warc_date`` (string, default 1970-01-01T00:00:00Z — the sink never
invents a timestamp; real pipelines carry the fetch time).

Scale: groupBy(shard) -> applyInPandas means one task materializes one
archive (memory bounds = shard size = the file size the caller chose);
gzip is member-per-record, so the OUTPUT is itself random-accessible
and CDX-indexable.
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import os
import uuid

from pyspark.sql import DataFrame

_REASONS = {
    200: "OK",
    204: "No Content",
    301: "Moved Permanently",
    302: "Found",
    304: "Not Modified",
    404: "Not Found",
    410: "Gone",
    500: "Internal Server Error",
    503: "Service Unavailable",
}

_DEFAULT_DATE = "1970-01-01T00:00:00Z"


def _b32_from_hex(hex_digest: str) -> str:
    """ISO 28500 digest encoding: labelled Base32 (RFC 4648) of the raw
    SHA-1 — the form pywb / Common Crawl CDXJ carry, so our headers and
    a genuinely shipped index agree byte-for-byte on digest values.
    Record-ID seeds keep the hex form (changing them would churn ids)."""
    return base64.b32encode(bytes.fromhex(hex_digest)).decode("ascii")


def _record(
    wtype: str,
    uri: str | None,
    block: bytes,
    ctype: str,
    date: str,
    rid_seed: str,
    extra: dict[str, str] | None = None,
) -> bytes:
    rid = uuid.uuid5(uuid.NAMESPACE_URL, rid_seed)
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Date: {date}\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + "".join(f"{k}: {v}\r\n" for k, v in (extra or {}).items())
        + f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    )
    return head.encode() + block + b"\r\n\r\n"


def _http_block(status: int, ctype: str, body: bytes) -> bytes:
    reason = _REASONS.get(status, "Status")
    return (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def write_warc(
    df: DataFrame,
    out_dir: str,
    shard_col: str = "shard",
    prefix: str = "corpus",
    gzip_members: bool = True,
    software: str = "roapi_spark warc sink",
) -> DataFrame:
    """Write ``df`` as one WARC archive per ``shard_col`` value under
    ``out_dir``; returns the (lazy) manifest DataFrame ``(warc_file,
    n_records)`` — run an action on it to execute the write."""
    os.makedirs(out_dir, exist_ok=True)
    suffix = ".warc.gz" if gzip_members else ".warc"

    def writer(pdf):
        import pandas as pd

        shard = int(pdf[shard_col].iloc[0])
        name = f"{prefix}-{shard:05d}{suffix}"
        final = os.path.join(out_dir, name)
        # dot-prefixed tmp: the reader skips hidden/_-prefixed names
        # (Hadoop FileInputFormat convention), so a task that dies
        # between write and rename never poisons a later scan
        tmp = os.path.join(out_dir, f".{name}.tmp-{os.getpid()}")
        has_status = "http_status" in pdf.columns
        has_ctype = "http_content_type" in pdf.columns
        has_date = "warc_date" in pdf.columns
        has_revisit = "revisit_of" in pdf.columns
        rows = []
        for row in pdf.itertuples(index=False):
            uri = str(row.target_uri)
            status = int(row.http_status) if has_status else 200
            ctype = (
                str(row.http_content_type)
                if has_ctype and row.http_content_type is not None
                else "application/octet-stream"
            )
            date = (
                str(row.warc_date)
                if has_date and row.warc_date is not None
                else _DEFAULT_DATE
            )
            body = bytes(row.payload) if row.payload is not None else b""
            revisit_of = (
                str(row.revisit_of)
                if has_revisit and row.revisit_of is not None
                else None
            )
            # sort on the FULL record key (digest included) so the
            # order — and therefore the per-record ordinal below — is
            # deterministic across task retries even when two rows
            # share target_uri+date
            rows.append(
                (
                    uri, date, hashlib.sha1(body).hexdigest(),
                    status, ctype, body, revisit_of,
                )
            )
        rows.sort(key=lambda r: r[:5])
        recs = [
            _record(
                "warcinfo",
                None,
                f"software: {software}\r\n".encode(),
                "application/warc-fields",
                _DEFAULT_DATE,
                f"warcinfo|{name}",
            )
        ]
        for i, (uri, date, digest, status, ctype, body, revisit_of) in (
            enumerate(rows)
        ):
            if revisit_of is not None:
                # crawl-side dedup (ISO 28500 §6.7 identical-payload-
                # digest): the payload is stored ONCE in the original's
                # record; this capture lands headers-only, pointing at
                # the original by target URI (WARC 1.1 form) and
                # carrying the shared payload digest
                recs.append(
                    _record(
                        "revisit",
                        uri,
                        _http_block(status, ctype, b""),  # headers only
                        "application/http; msgtype=response",
                        date,
                        f"revisit|{uri}|{date}|{digest}|{i}",
                        extra={
                            "WARC-Refers-To-Target-URI": revisit_of,
                            "WARC-Payload-Digest":
                                f"sha1:{_b32_from_hex(digest)}",
                            "WARC-Profile": "http://netpreservation.org"
                            "/warc/1.0/revisit/identical-payload-digest",
                        },
                    )
                )
                continue
            recs.append(
                _record(
                    "response",
                    uri,
                    _http_block(status, ctype, body),
                    "application/http; msgtype=response",
                    date,
                    # digest+ordinal make WARC-Record-IDs unique (ISO
                    # 28500 §5.2) even for duplicate captures, while
                    # staying deterministic for idempotent retries
                    f"response|{uri}|{date}|{digest}|{i}",
                    extra={
                        "WARC-Payload-Digest":
                            f"sha1:{_b32_from_hex(digest)}",
                    },
                )
            )
        with open(tmp, "wb") as f:
            for rec in recs:
                f.write(gzip.compress(rec, mtime=0) if gzip_members else rec)
        os.replace(tmp, final)  # atomic publish; retries re-land same bytes
        return pd.DataFrame(
            [{"warc_file": name, "n_records": len(recs)}]
        )

    return df.groupBy(shard_col).applyInPandas(
        writer, "warc_file string, n_records bigint"
    )


def write_wet(
    df: DataFrame,
    out_dir: str,
    shard_col: str = "shard",
    prefix: str = "wet",
    gzip_members: bool = True,
    software: str = "roapi_spark wet sink",
) -> DataFrame:
    """Write extracted-text ``conversion`` records (the WET derivative —
    Common Crawl's *.warc.wet.gz layout: one ``conversion`` record per
    page carrying the extracted plain text, ISO 28500 §6.8) — what an
    LLM corpus actually ingests instead of raw archives. Same contract
    as write_warc: one archive per shard value, warcinfo head,
    dot-prefixed tmp + rename publish, records sorted by (uri, date,
    digest) with uuid5(uri,date,digest,ordinal) ids — deterministic
    bytes across task retries. Expected columns: ``target_uri``,
    ``text`` (string), optional ``warc_date``."""
    os.makedirs(out_dir, exist_ok=True)
    suffix = ".warc.wet.gz" if gzip_members else ".warc.wet"

    def writer(pdf):
        import pandas as pd

        shard = int(pdf[shard_col].iloc[0])
        name = f"{prefix}-{shard:05d}{suffix}"
        final = os.path.join(out_dir, name)
        tmp = os.path.join(out_dir, f".{name}.tmp-{os.getpid()}")
        has_date = "warc_date" in pdf.columns
        rows = []
        for row in pdf.itertuples(index=False):
            uri = str(row.target_uri)
            date = (
                str(row.warc_date)
                if has_date and row.warc_date is not None
                else _DEFAULT_DATE
            )
            body = (
                str(row.text).encode("utf-8") if row.text is not None else b""
            )
            rows.append(
                (uri, date, hashlib.sha1(body).hexdigest(), body)
            )
        rows.sort(key=lambda r: r[:3])
        recs = [
            _record(
                "warcinfo",
                None,
                f"software: {software}\r\n".encode(),
                "application/warc-fields",
                _DEFAULT_DATE,
                f"warcinfo|{name}",
            )
        ]
        for i, (uri, date, digest, body) in enumerate(rows):
            recs.append(
                _record(
                    "conversion",
                    uri,
                    body,
                    "text/plain",
                    date,
                    f"conversion|{uri}|{date}|{digest}|{i}",
                )
            )
        with open(tmp, "wb") as f:
            for rec in recs:
                f.write(gzip.compress(rec, mtime=0) if gzip_members else rec)
        os.replace(tmp, final)
        return pd.DataFrame([{"warc_file": name, "n_records": len(recs)}])

    return df.groupBy(shard_col).applyInPandas(
        writer, "warc_file string, n_records bigint"
    )


def write_wat(
    df: DataFrame,
    out_dir: str,
    shard_col: str = "shard",
    prefix: str = "wat",
    gzip_members: bool = True,
    software: str = "roapi_spark wat sink",
) -> DataFrame:
    """Write per-page link metadata as WAT ``metadata`` records (the
    third Common Crawl derivative: WARC holds bytes, WET holds text,
    WAT holds structure) — one ISO 28500 ``metadata`` record per page,
    payload a JSON envelope carrying the page's outlinks, the shape WAT
    consumers (link-graph, anchor-mining jobs) parse. Same contract as
    the other archive writers: one file per shard value, warcinfo head,
    dot-prefixed tmp + rename, records sorted by (uri, date, digest)
    with uuid5 ids — deterministic bytes across retries. Expected
    columns: ``target_uri``, ``links`` (array<string> — resolved link
    targets), optional ``warc_date``."""
    os.makedirs(out_dir, exist_ok=True)
    suffix = ".warc.wat.gz" if gzip_members else ".warc.wat"

    def writer(pdf):
        import json as _json

        import pandas as pd

        shard = int(pdf[shard_col].iloc[0])
        name = f"{prefix}-{shard:05d}{suffix}"
        final = os.path.join(out_dir, name)
        tmp = os.path.join(out_dir, f".{name}.tmp-{os.getpid()}")
        has_date = "warc_date" in pdf.columns
        rows = []
        for row in pdf.itertuples(index=False):
            uri = str(row.target_uri)
            date = (
                str(row.warc_date)
                if has_date and row.warc_date is not None
                else _DEFAULT_DATE
            )
            # row.links arrives as a numpy array: no `or` truthiness
            raw_links = row.links
            links = sorted(
                str(x)
                for x in (raw_links if raw_links is not None else [])
            )
            body = _json.dumps(
                {
                    "Envelope": {
                        "WARC-Header-Metadata": {"WARC-Target-URI": uri},
                        "Payload-Metadata": {
                            "HTTP-Response-Metadata": {
                                "HTML-Metadata": {
                                    "Links": [{"url": u} for u in links]
                                }
                            }
                        },
                    }
                },
                sort_keys=True,
            ).encode()
            rows.append(
                (uri, date, hashlib.sha1(body).hexdigest(), body)
            )
        rows.sort(key=lambda r: r[:3])
        recs = [
            _record(
                "warcinfo",
                None,
                f"software: {software}\r\n".encode(),
                "application/warc-fields",
                _DEFAULT_DATE,
                f"warcinfo|{name}",
            )
        ]
        for i, (uri, date, digest, body) in enumerate(rows):
            recs.append(
                _record(
                    "metadata",
                    uri,
                    body,
                    "application/json",
                    date,
                    f"metadata|{uri}|{date}|{digest}|{i}",
                )
            )
        with open(tmp, "wb") as f:
            for rec in recs:
                f.write(gzip.compress(rec, mtime=0) if gzip_members else rec)
        os.replace(tmp, final)
        return pd.DataFrame([{"warc_file": name, "n_records": len(recs)}])

    return df.groupBy(shard_col).applyInPandas(
        writer, "warc_file string, n_records bigint"
    )
