"""Batch 14: web-crawl ingestion front-end under the driver oracle.

A 100 TB training corpus does not start life as a parquet ``documents``
table — it starts as crawl archives (Common Crawl ships ~90k x ~1 GB
``.warc.gz`` files per snapshot). This module closes that gap end to
end and puts every stage under the external DuckDB oracle:

* ``q_src_warc``        — the WARC loader (sources/warc.py) itself:
  a deterministic WARC fixture is built FROM the documents table
  (each doc becomes an HTTP response record; plus warcinfo, request,
  404, text/plain and duplicate-URL records on fixed doc_id residues),
  read back through sources.load_table, and aggregated; the oracle
  recomputes every count from the raw parquet via the same residue
  arithmetic, so a loader that drops records, mis-frames a block, or
  mangles a payload hash-mismatches.
* ``text_html_extract`` — HTML main-text extraction (functions/web.py)
  must recover each document's text EXACTLY (whitespace-normalized)
  from a realistic page wrapping it in chrome (nav/header/sidebar/
  footer/script/style); verified by joining the extracted text back to
  the documents table.
* ``q_url_canonicalize``— URL canonicalization as pure built-in
  expressions; messy variants (case, default ports, tracking params,
  fragments, trailing slashes, shuffled query order) collapse to one
  canonical key per page.
* ``q_domain_filter``   — registrable-domain extraction + broadcast
  blocklist anti-join (the UT1/abuse-list pattern).
* ``q_crawl_funnel``    — the end-to-end funnel: fetched -> HTTP 200
  -> text/html -> extracted-text length gate -> canonical-URL dedup,
  one row of stage counts.
* ``q_robots_filter``   — RFC 9309 robots.txt rule matching as
  composed built-ins (parse from-spec, longest-pattern-wins).
* ``q_crawl_link_graph`` / ``q_crawl_pagerank`` — the WAT-derivative
  pass: anchors parsed per page, in-degree profile and fixed-point
  integer PageRank over the resulting directed graph.
* ``multimodal_crawl_images`` — image/png responses decoded by the
  from-spec PNG codec against an analytically-integrated pixel oracle.
* ``stream_crawl_ingest`` / ``stream_url_frontier`` /
  ``stream_crawl_to_delta`` — the streaming twins (streaming/crawl.py):
  exactly-once landing-directory funnel, stateful canonical-URL
  revisit dedup, and per-batch atomic Delta corpus delivery.

No reference parity (columnq has no web-ingestion surface) — this is
training-data-pipeline extension surface.

Scale notes: the WARC scan parallelizes per file and streams records
(constant memory in file size); extraction is Arrow-batched
``mapInPandas`` proportional to HTML bytes with no shuffle;
canonicalization/domain logic is whole-stage-codegen'd built-ins usable
as shuffle keys; the funnel is one pass + one hash aggregate. The
fixture build collects the documents slice to the driver (500 rows at
sf0.01) — a bounded fixture write, not a data-path pattern.
"""

from __future__ import annotations

import gzip
import html as html_mod
import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from roapi_spark.functions.web import canonical_url, registrable_domain
from roapi_spark.plans.registry import register
from roapi_spark.util import WS_CLASS, serve_persist

# ---------------------------------------------------------------------------
# deterministic residue rules shared by the fixture builder, the Spark
# queries, and the DuckDB oracles (doc_id % k):
#   % 11 == 3  -> HTTP 404 (body is a stub page)
#   % 7  == 2  -> text/plain payload (the raw doc text)
#   % 13 == 5  -> a second response record for the same page under a
#                 messier URL (same canonical form)
#   % 10 == 0  -> a request record precedes the response
# messy-URL residues: %5 host case, %9 explicit :443, %4 trailing /,
# %2 tracking params + shuffled order, %6 fragment.
# ---------------------------------------------------------------------------

_MIN_TEXT = 200  # funnel stage: ws-normalized main text must reach this


def _raw_url(doc_id: int, source: str) -> str:
    host = "CRAWL.Example.com" if doc_id % 5 == 0 else "crawl.example.com"
    port = ":443" if doc_id % 9 == 4 else ""
    trail = "/" if doc_id % 4 == 1 else ""
    q = "?utm_source=feed&b=2&a=1" if doc_id % 2 == 0 else "?a=1&b=2"
    frag = "#frag" if doc_id % 6 == 3 else ""
    return f"https://{host}{port}/{source}/{doc_id}{trail}{q}{frag}"


def _dup_url(doc_id: int, source: str) -> str:
    return (
        f"https://crawl.example.com:443/{source}/{doc_id}/"
        "?b=2&a=1&utm_medium=x#x2"
    )


# external hosts the cross-host footer link cycles through (by
# doc_id % 6) — chosen to span PSL snapshot families so the host-graph
# gate exercises registrable-domain keying, not just string equality
_EXT_HOSTS = (
    "news.example.co.uk",
    "mirror.loja.com.br",
    "docs.user1.github.io",
    "archive.example.ac.in",
    "static.demo.blogspot.com",
    "data.example.gob.mx",
)


def _doc_link_href(doc_id: int, source: str, dst: int, dst_source: str) -> str:
    """The cross-document footer href, in a doc_id-residue-chosen RFC
    3986 reference form (absolute, protocol-relative, path-absolute
    with tracking noise, dot-segmented relative, dot-segmented
    absolute) — all resolving against the page's target URI to the same
    canonical target, so the link-graph pass must do real reference
    resolution, not href-shape matching."""
    tail = f"{dst_source}/{dst}?b=2&a=1"
    form = doc_id % 5
    if form == 3 and doc_id % 13 == 5:
        # %13 docs exist under TWO base URIs (primary + messy dup) with
        # different base paths; a path-RELATIVE href would resolve
        # differently per record — keep their href base-independent
        form = 2
    if form == 0:
        href = f"https://crawl.example.com/{tail}"
    elif form == 1:
        href = f"//CRAWL.example.com/{tail}"  # protocol-relative + case
    elif form == 2:
        href = f"/{tail}&utm_campaign=footer"  # tracking noise
    elif form == 3:
        # path-relative with ../ — depth depends on the base path's
        # trailing slash (%4 residue): /s/21 dir=/s/, /s/21/ dir=/s/21/
        ups = "../" * (2 if doc_id % 4 == 1 else 1)
        href = f"{ups}{tail}"
    else:
        href = f"/./{dst_source}/../{tail}"  # dot segments, absolute
    if doc_id % 3 == 0:
        href += "#sec"  # fragments drop during canonicalization
    return href


def _html_page(doc_id: int, text: str, link_to: int | None = None,
               link_href: str | None = None) -> str:
    # the cross-doc + cross-host links live in the FOOTER: chrome to
    # the extractor (dropped by tag), signal to the link-graph pass
    next_link = ""
    if link_href is not None:
        ext = _EXT_HOSTS[doc_id % len(_EXT_HOSTS)]
        next_link = (
            f'<a href="{link_href}">next</a> '
            f'<a href="https://{ext}/partner/{doc_id}">partner</a> '
        )
    elif link_to is not None:
        next_link = f'<a href="/link/{link_to}">next</a> '
    return (
        "<!DOCTYPE html>\n"
        f"<html><head><title>doc {doc_id}</title>\n"
        "<style>body { margin: 0; }</style>\n"
        f'<script>var tracker = "{doc_id}";</script>\n'
        "</head><body>\n"
        '<nav><a href="/">Home</a> <a href="/about">About</a></nav>\n'
        f"<header><h1>Document {doc_id}</h1></header>\n"
        '<div class="sidebar"><a href="/t/1">One</a> <a href="/t/2">Two</a>'
        ' <a href="/t/3">Three</a></div>\n'
        f"<main><p>{html_mod.escape(text)}</p></main>\n"
        f'<footer>{next_link}<a href="/privacy">Privacy</a>'
        " (c) Example Corp</footer>\n"
        "</body></html>"
    )


def _warc_record(
    wtype: str,
    uri: str | None,
    block: bytes,
    ctype: str,
    extra: dict[str, str] | None = None,
) -> bytes:
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Record-ID: <urn:uuid:{wtype}-{uri or 'file'}>\r\n"
        "WARC-Date: 2026-01-01T00:00:00Z\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + "".join(f"{k}: {v}\r\n" for k, v in (extra or {}).items())
        + f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    )
    return head.encode() + block + b"\r\n\r\n"


def _http_response(status: int, ctype: str, body: bytes) -> bytes:
    reason = {200: "OK", 404: "Not Found"}[status]
    return (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def _response_record(
    doc_id: int, source: str, text: str, uri: str,
    link_href: str | None = None,
) -> bytes:
    if doc_id % 11 == 3:
        status, ctype = 404, "text/html; charset=utf-8"
        body = b"<html><body><p>gone</p></body></html>"
    elif doc_id % 7 == 2:
        status, ctype = 200, "text/plain; charset=utf-8"
        body = text.encode()
    else:
        status, ctype = 200, "text/html; charset=utf-8"
        body = _html_page(doc_id, text, link_href=link_href).encode()
    return _warc_record(
        "response",
        uri,
        _http_response(status, ctype, body),
        "application/http; msgtype=response",
    )


_N_SHARDS = 8  # crawl-file parallelism unit: the scan's task count


def _capture_meta(
    doc_id: int, source: str, url: str, dup: bool = False
) -> dict:
    """Per-capture pointer metadata (mirrors the record the builder is
    about to write; residues match _response_record)."""
    is404 = doc_id % 11 == 3
    return {
        "doc_id": doc_id,
        "source": source,
        "url": url,
        "status": "404" if is404 else "200",
        "mime": (
            "text/plain" if (not is404 and doc_id % 7 == 2) else "text/html"
        ),
        "ts": "20260102000000" if dup else "20260101000000",
    }


def _pointer_line(meta: dict, offset: int, length: int, fname: str) -> str:
    """One CDXJ pointer line with the capture's TRUE archive
    coordinates (compressed-member offset/length in .gz shards, raw
    record slice in plain shards)."""
    import json as _json

    canon = (
        f"https://crawl.example.com/{meta['source']}/{meta['doc_id']}"
        "?a=1&b=2"
    )
    blob = {
        "url": meta["url"],
        "mime": meta["mime"],
        "status": meta["status"],
        "digest": f"sha1:{meta['doc_id']}",
        "length": str(length),
        "offset": str(offset),
        "filename": fname,
    }
    return f"{_surt(canon)} {meta['ts']} {_json.dumps(blob)}"


def _warc_fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build-once WARC fixture, sharded into 8 files by doc_id (even
    shards one-gzip-member-per-record — the Common Crawl layout — odd
    shards uncompressed), each opening with a warcinfo record. Sharding
    matters: the WARC scan parallelizes per FILE, so the fixture must
    present the multi-file shape real crawls have."""
    from roapi_spark.functions.snapshot import build_once, snapshot_cache_dir

    src = os.path.join(sf_dir, "documents.parquet")
    out = snapshot_cache_dir(src, "warc-v6")
    names = tuple(
        f"docs-{s:02d}.warc" + (".gz" if s % 2 == 0 else "")
        for s in range(_N_SHARDS)
    )
    ptr_names = tuple(f"pointers-{s:02d}.cdxj" for s in range(_N_SHARDS))

    def ready(d: str) -> bool:
        return all(
            os.path.exists(os.path.join(d, n)) for n in names + ptr_names
        )

    def build(tmp: str) -> None:
        os.makedirs(tmp, exist_ok=True)
        rows = (
            spark.read.parquet(src)
            .select("doc_id", "source", "text")
            .orderBy("doc_id")
            .collect()
        )
        info = _warc_record(
            "warcinfo",
            None,
            b"software: roapi_spark fixture\r\n",
            "application/warc-fields",
        )
        # each shard holds (record bytes, capture-pointer meta | None):
        # response records get a CDXJ pointer with their TRUE (offset,
        # length) recorded at write time, so the random-access fetch
        # path has real coordinates to seek to
        shards: list[list[tuple[bytes, dict | None]]] = [
            [(info, None)] for _ in range(_N_SHARDS)
        ]
        n_docs = len(rows)
        for i, r in enumerate(rows):
            doc_id, source, text = r[0], r[1], r[2]
            uri = _raw_url(doc_id, source)
            # functional link graph by POSITION in the doc_id-sorted
            # order: for the driver corpora (contiguous 0..n-1 ids)
            # this is byte-identical to (doc_id*7) % n_docs — the form
            # the oracles replay — while staying total for corpora
            # with offset id spaces (the sf1 scale-stress clones)
            link_row = rows[(i * 7) % n_docs]
            href = _doc_link_href(doc_id, source, link_row[0], link_row[1])
            recs: list[tuple[bytes, dict | None]] = []
            if doc_id % 10 == 0:
                recs.append(
                    (
                        _warc_record(
                            "request",
                            uri,
                            f"GET /{source}/{doc_id} HTTP/1.1\r\n"
                            "Host: crawl.example.com\r\n\r\n".encode(),
                            "application/http; msgtype=request",
                        ),
                        None,
                    )
                )
            recs.append(
                (
                    _response_record(doc_id, source, text, uri, href),
                    _capture_meta(doc_id, source, uri),
                )
            )
            if doc_id % 13 == 5:
                recs.append(
                    (
                        _response_record(
                            doc_id, source, text,
                            _dup_url(doc_id, source), href,
                        ),
                        _capture_meta(
                            doc_id, source, _dup_url(doc_id, source),
                            dup=True,
                        ),
                    )
                )
            if doc_id % 17 == 1:
                # a later re-fetch found the payload unchanged: the
                # crawler wrote a REVISIT record (ISO 28500 §6.7,
                # identical-payload-digest profile) — headers only, no
                # body, pointing at the record it matched. The %3
                # residue DANGLES the reference (the original landed in
                # a crawl file that was lost) so resolution joins have
                # a real miss path.
                ref = (
                    f"<urn:uuid:response-missing-{doc_id}>"
                    if doc_id % 3 == 0
                    else f"<urn:uuid:response-{uri}>"
                )
                recs.append(
                    (
                        _warc_record(
                            "revisit",
                            uri,
                            b"HTTP/1.1 200 OK\r\n"
                            b"Content-Type: text/html; charset=utf-8\r\n\r\n",
                            "application/http; msgtype=response",
                            extra={
                                "WARC-Refers-To": ref,
                                "WARC-Profile": "http://netpreservation"
                                ".org/warc/1.0/revisit/"
                                "identical-payload-digest",
                            },
                        ),
                        None,
                    )
                )
            shards[doc_id % _N_SHARDS].extend(recs)
        for s, recs in enumerate(shards):
            pos = 0
            pointers: list[str] = []
            with open(os.path.join(tmp, names[s]), "wb") as f:
                for rec, meta in recs:
                    out_b = (
                        gzip.compress(rec, mtime=0) if s % 2 == 0 else rec
                    )
                    if meta is not None:
                        pointers.append(
                            _pointer_line(meta, pos, len(out_b), names[s])
                        )
                    f.write(out_b)
                    pos += len(out_b)
            with open(os.path.join(tmp, ptr_names[s]), "w") as pf:
                pf.write("\n".join(sorted(pointers)) + "\n")

    return build_once(out, ready, build)


def _warc_shards(src: str) -> list[str]:
    """Archive shard names in the fixture dir — pointer index files
    (and anything else non-WARC) excluded; the unit the streaming
    gates land wave by wave."""
    return sorted(n for n in os.listdir(src) if ".warc" in n)


def _read_warc(spark: SparkSession, sf_dir: str, **option) -> DataFrame:
    from roapi_spark.config import TableSource
    from roapi_spark.sources import load_table

    return load_table(
        spark,
        TableSource(
            name="_warc",
            uri=_warc_fixture_dir(spark, sf_dir),
            format="warc",
            option=option,
        ),
    )


# ---- oracle SQL fragments shared across the gates -------------------------

_NORM_LEN = "length(trim(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')))"

# messy raw URLs reconstructed from the documents table (primary form,
# then the duplicate form for the %13 residue) — mirrors _raw_url/_dup_url
_URL_CTE = """
  SELECT doc_id,
         'https://'
         || (CASE WHEN doc_id % 5 = 0 THEN 'CRAWL.Example.com'
                  ELSE 'crawl.example.com' END)
         || (CASE WHEN doc_id % 9 = 4 THEN ':443' ELSE '' END)
         || '/' || source || '/' || CAST(doc_id AS VARCHAR)
         || (CASE WHEN doc_id % 4 = 1 THEN '/' ELSE '' END)
         || (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&b=2&a=1'
                  ELSE '?a=1&b=2' END)
         || (CASE WHEN doc_id % 6 = 3 THEN '#frag' ELSE '' END) AS raw_url
  FROM documents
  UNION ALL
  SELECT doc_id,
         'https://crawl.example.com:443/' || source || '/'
         || CAST(doc_id AS VARCHAR) || '/?b=2&a=1&utm_medium=x#x2'
  FROM documents WHERE doc_id % 13 = 5
"""


def _canon_sql(col: str) -> str:
    """DuckDB mirror of functions/web.canonical_url, composed from the
    same fragment builders (web.url_*_sql) as the SURT mirror so the two
    engines canonicalize identically. (The COALESCE inside the query
    fragment — DuckDB array_to_string([]) is NULL where Spark's
    array_join([]) is '' — was found by tests/test_web_fuzz.py; it
    would null the whole concatenation for all-tracking query strings.)"""
    from roapi_spark.functions.web import (
        url_host_sql,
        url_path_sql,
        url_query_canonical_sql,
        url_scheme_sql,
    )

    q = url_query_canonical_sql(col)
    return (
        f"{url_scheme_sql(col)} || '://' || {url_host_sql(col)} || "
        f"{url_path_sql(col)} || "
        f"(CASE WHEN {q} = '' THEN '' ELSE '?' || {q} END)"
    )


# ---- q_src_warc ------------------------------------------------------------


@register(
    "q_src_warc",
    oracle=f"""
    WITH u AS ({_URL_CTE})
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM u)
        + CAST(SUM(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        + CAST(SUM(CASE WHEN doc_id % 17 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        + {_N_SHARDS} AS n_records,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM u) AS n_responses,
      CAST(SUM(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_requests,
      CAST({_N_SHARDS} AS BIGINT) AS n_warcinfo,
      CAST(SUM(CASE WHEN doc_id % 17 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_revisit,
      CAST(SUM(CASE WHEN doc_id % 11 = 3
               THEN 1 + (CASE WHEN doc_id % 13 = 5 THEN 1 ELSE 0 END)
               ELSE 0 END) AS BIGINT) AS n_404,
      CAST(SUM(CASE WHEN doc_id % 11 <> 3 AND doc_id % 7 = 2
               THEN 1 + (CASE WHEN doc_id % 13 = 5 THEN 1 ELSE 0 END)
               ELSE 0 END) AS BIGINT) AS n_plain,
      CAST(SUM(CASE WHEN doc_id % 11 <> 3 AND doc_id % 7 = 2
               THEN strlen(text)
                    * (1 + (CASE WHEN doc_id % 13 = 5 THEN 1 ELSE 0 END))
               ELSE 0 END) AS BIGINT) AS plain_octets,
      (SELECT CAST(COUNT(DISTINCT raw_url) AS BIGINT) FROM u) AS n_uri,
      (SELECT CAST(SUM(strlen(raw_url)) AS BIGINT) FROM u) AS uri_octets
    FROM documents
    """,
    doc="Source gate for the WARC loader (ISO 28500): a deterministic "
    "crawl fixture (one gzip member per record + an uncompressed file; "
    "warcinfo/request/response types; 404, text/plain, duplicate-URL "
    "records on fixed doc_id residues) is built FROM the documents "
    "table, read back through sources.load_table, and aggregated by "
    "record type / HTTP status / payload octets / distinct URI; the "
    "oracle recomputes every figure from the raw parquet via the same "
    "residue arithmetic, so dropped records, framing errors, or payload "
    "corruption hash-mismatch. Plan: per-file streaming mapInPandas "
    "scan (parallelism = WARC files, the Common Crawl unit) + one "
    "global agg — no shuffle before the final exchange.",
    tags=("source", "warc", "web"),
)
def q_src_warc(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _read_warc(spark, sf_dir)
    is_resp = F.col("warc_type") == "response"
    return df.agg(
        F.count("*").cast("bigint").alias("n_records"),
        F.sum(is_resp.cast("bigint")).cast("bigint").alias("n_responses"),
        F.sum((F.col("warc_type") == "request").cast("bigint"))
        .cast("bigint")
        .alias("n_requests"),
        F.sum((F.col("warc_type") == "warcinfo").cast("bigint"))
        .cast("bigint")
        .alias("n_warcinfo"),
        F.sum((F.col("warc_type") == "revisit").cast("bigint"))
        .cast("bigint")
        .alias("n_revisit"),
        F.sum((is_resp & (F.col("http_status") == 404)).cast("bigint"))
        .cast("bigint")
        .alias("n_404"),
        F.sum(
            (
                is_resp
                & (F.col("http_status") == 200)
                & F.col("http_content_type").startswith("text/plain")
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("n_plain"),
        F.sum(
            F.when(
                is_resp
                & (F.col("http_status") == 200)
                & F.col("http_content_type").startswith("text/plain"),
                F.length("payload").cast("bigint"),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("plain_octets"),
        F.count_distinct(F.when(is_resp, F.col("target_uri")))
        .cast("bigint")
        .alias("n_uri"),
        F.sum(
            F.when(is_resp, F.length("target_uri").cast("bigint")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("uri_octets"),
    )


# ---- q_src_cdx -------------------------------------------------------------


def _surt(canon: str) -> str:
    """SURT key of a canonical URL: host labels reversed and
    comma-joined, ')/' separator, then path+query — the sort key CDX
    files are ordered by."""
    rest = canon.split("://", 1)[1]
    host, _, pathq = rest.partition("/")
    return ",".join(reversed(host.split("."))) + ")/" + pathq


def _cdx_line(doc_id: int, source: str, url: str, fetch_ts: str) -> str:
    import json as _json

    is404 = doc_id % 11 == 3
    isplain = (not is404) and doc_id % 7 == 2
    shard = doc_id % _N_SHARDS
    fname = f"docs-{shard:02d}.warc" + (".gz" if shard % 2 == 0 else "")
    # canonical form for the SURT key (what a CDX writer canonicalizes)
    canon = (
        f"https://crawl.example.com/{source}/{doc_id}?a=1&b=2"
    )
    blob = {
        "url": url,
        "mime": "text/plain" if isplain else "text/html",
        "status": "404" if is404 else "200",
        "digest": f"sha1:{doc_id}",
        "length": str(100 + doc_id % 251),
        "offset": str((doc_id * 7919) % 1000003),
        "filename": fname,
    }
    return f"{_surt(canon)} {fetch_ts} {_json.dumps(blob)}"


def _cdx_fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build-once CDXJ index fixture mirroring the WARC fixture's URL
    set: one line per capture (primary + the %13 later re-capture),
    SURT-sorted within each of 4 shard files, half gzipped (the
    text reader must decompress transparently)."""
    from roapi_spark.functions.snapshot import build_once, snapshot_cache_dir

    src = os.path.join(sf_dir, "documents.parquet")
    out = snapshot_cache_dir(src, "cdx-v1")
    names = tuple(
        f"index-{s:02d}.cdx" + (".gz" if s % 2 == 0 else "j")
        for s in range(4)
    )

    def ready(d: str) -> bool:
        return all(os.path.exists(os.path.join(d, n)) for n in names)

    def build(tmp: str) -> None:
        os.makedirs(tmp, exist_ok=True)
        rows = (
            spark.read.parquet(src)
            .select("doc_id", "source")
            .orderBy("doc_id")
            .collect()
        )
        shards: list[list[str]] = [[] for _ in names]
        for r in rows:
            doc_id, source = r[0], r[1]
            uri = _raw_url(doc_id, source)
            shards[doc_id % len(names)].append(
                _cdx_line(doc_id, source, uri, "20260101000000")
            )
            if doc_id % 13 == 5:
                shards[doc_id % len(names)].append(
                    _cdx_line(
                        doc_id, source, _dup_url(doc_id, source),
                        "20260102000000",
                    )
                )
        for s, lines in enumerate(shards):
            data = "\n".join(sorted(lines)) + "\n"
            path = os.path.join(tmp, names[s])
            if names[s].endswith(".gz"):
                with open(path, "wb") as f:
                    f.write(gzip.compress(data.encode(), mtime=0))
            else:
                with open(path, "w") as f:
                    f.write(data)

    return build_once(out, ready, build)


@register(
    "q_src_cdx",
    oracle=f"""
    WITH u AS ({_URL_CTE}),
    d AS (
      SELECT doc_id,
             (doc_id % 11 = 3) AS is404,
             (doc_id % 11 <> 3 AND doc_id % 7 = 2) AS isplain,
             (CASE WHEN doc_id % 13 = 5 THEN 2 ELSE 1 END) AS m,
             100 + (doc_id % 251) AS len,
             (doc_id * 7919) % 1000003 AS off
      FROM documents
    )
    SELECT CAST(SUM(m) AS BIGINT) AS n_records,
           CAST(SUM(CASE WHEN NOT is404 THEN m ELSE 0 END) AS BIGINT)
             AS n_200,
           CAST(SUM(CASE WHEN is404 THEN m ELSE 0 END) AS BIGINT) AS n_404,
           CAST(SUM(CASE WHEN isplain THEN m ELSE 0 END) AS BIGINT)
             AS n_plain,
           CAST(SUM(m * len) AS BIGINT) AS sum_length,
           CAST(SUM(m * off) AS BIGINT) AS sum_offset,
           (SELECT CAST(COUNT(DISTINCT doc_id % {_N_SHARDS}) AS BIGINT)
            FROM documents) AS n_files,
           CAST(COUNT(*) AS BIGINT) AS n_surt,
           (SELECT CAST(COUNT(DISTINCT raw_url) AS BIGINT) FROM u) AS n_urls
    FROM d
    """,
    doc="CDX(J) index source gate: the per-URL sidecar index a real "
    "crawl queries instead of scanning archives (Common Crawl's "
    "cc-index layout — SURT key, fetch timestamp, JSON blob). The "
    "fixture mirrors the WARC fixture's capture set (primary + %13 "
    "re-capture under the messy URL) across 4 SURT-sorted shard files, "
    "half gzipped; the loader (sources/cdx.py) parses it with COMPOSED "
    "BUILT-INS only — text scan, two codegen'd splits, FAILFAST "
    "from_json, typed casts — and the gate aggregates status/mime "
    "counts, byte/offset checksums, distinct archive filenames, "
    "distinct SURT keys (re-captures of one page share a key: n_surt "
    "= docs while n_records counts captures) and distinct raw URLs, "
    "all replayed by the oracle from residue arithmetic. Plan: "
    "splittable text FileScan (partition parallelism at 100 TB, .gz "
    "transparent) -> WholeStageCodegen parse -> one agg; the index is "
    "~1000x smaller than the archives, which is why page-set joins "
    "read it instead of the WARCs.",
    tags=("source", "web"),
)
def q_src_cdx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.config import TableSource
    from roapi_spark.sources import load_table

    df = load_table(
        spark,
        TableSource(
            name="_cdx", uri=_cdx_fixture_dir(spark, sf_dir), format="cdx"
        ),
    )
    return df.agg(
        F.count("*").cast("bigint").alias("n_records"),
        F.sum((F.col("status") == 200).cast("bigint"))
        .cast("bigint")
        .alias("n_200"),
        F.sum((F.col("status") == 404).cast("bigint"))
        .cast("bigint")
        .alias("n_404"),
        F.sum((F.col("mime") == "text/plain").cast("bigint"))
        .cast("bigint")
        .alias("n_plain"),
        F.sum("length").cast("bigint").alias("sum_length"),
        F.sum("offset").cast("bigint").alias("sum_offset"),
        F.count_distinct("warc_filename").cast("bigint").alias("n_files"),
        F.count_distinct("surt_key").cast("bigint").alias("n_surt"),
        F.count_distinct("url").cast("bigint").alias("n_urls"),
    )


# ---- q_cdx_surt_join -------------------------------------------------------


def _messy_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, raw_url) in the fixture's messy variants — the Spark
    twin of the _URL_CTE oracle fragment (primary form per doc, plus
    the %13 duplicate form)."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    primary = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.when(
                F.col("doc_id") % 5 == 0, F.lit("CRAWL.Example.com")
            ).otherwise(F.lit("crawl.example.com")),
            F.when(F.col("doc_id") % 9 == 4, F.lit(":443")).otherwise(
                F.lit("")
            ),
            F.lit("/"),
            F.col("source"),
            F.lit("/"),
            F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 4 == 1, F.lit("/")).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 2 == 0, F.lit("?utm_source=feed&b=2&a=1")
            ).otherwise(F.lit("?a=1&b=2")),
            F.when(F.col("doc_id") % 6 == 3, F.lit("#frag")).otherwise(
                F.lit("")
            ),
        ).alias("raw_url"),
    )
    dup = docs.filter(F.col("doc_id") % 13 == 5).select(
        "doc_id",
        F.concat(
            F.lit("https://crawl.example.com:443/"),
            F.col("source"),
            F.lit("/"),
            F.col("doc_id").cast("string"),
            F.lit("/?b=2&a=1&utm_medium=x#x2"),
        ).alias("raw_url"),
    )
    return primary.unionAll(dup)


from roapi_spark.functions.web import url_to_surt, url_to_surt_sql  # noqa: E402

_SURT_KEY_SQL = (
    "'com,example,crawl)/' || source || '/' || CAST(doc_id AS VARCHAR)"
    " || '?a=1&b=2'"
)


@register(
    "q_cdx_surt_join",
    oracle=f"""
    WITH u AS ({_URL_CTE}),
    k AS (SELECT doc_id, {url_to_surt_sql("raw_url")} AS surt FROM u),
    cdx AS (
      SELECT {_SURT_KEY_SQL} AS surt_key,
             CASE WHEN doc_id % 11 = 3 THEN 404 ELSE 200 END AS status
      FROM documents
      UNION ALL
      SELECT {_SURT_KEY_SQL},
             CASE WHEN doc_id % 11 = 3 THEN 404 ELSE 200 END
      FROM documents WHERE doc_id % 13 = 5
    ),
    j AS (SELECT k.surt, cdx.status FROM k JOIN cdx ON k.surt = cdx.surt_key)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT surt) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN status = 404 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_404_pairs,
           MIN(surt) AS min_surt,
           MAX(surt) AS max_surt
    FROM j
    """,
    doc="SURT-key generation gate (the read-side complement of the CDX "
    "source — r12 verdict item 5): url_to_surt turns messy corpus URLs "
    "(mixed host case, explicit :443, trailing slashes, tracking "
    "params, shuffled query order, fragments) into the sort key a "
    "cc-index is ordered by — canonicalize, reverse+comma-join host "
    "labels, ')' separator — as PURE composed built-ins, then "
    "equi-joins the real CDX fixture on surt_key. Every messy variant "
    "must land on its index line: per doc the primary AND %13-dup URL "
    "forms both map to the single fixture key (n_pairs counts the "
    "(1+dup)^2 cross matches; min/max pin exact SURT strings). The "
    "oracle rebuilds the index keys closed-form and runs the SAME "
    "fragment-built SQL mirror of the SURT pipeline in DuckDB. Plan: "
    "both sides whole-stage-codegen'd scans; the join key is computed "
    "(no shuffle skew — one key per page); at 100 TB this is the "
    "URL->index probe pattern: the corpus side shuffles by SURT once "
    "and the index side is ~1000x smaller than the archives.",
    tags=("web", "source"),
)
def q_cdx_surt_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.config import TableSource
    from roapi_spark.sources import load_table

    keyed = _messy_urls(spark, sf_dir).select(
        url_to_surt(F.col("raw_url")).alias("surt")
    )
    idx = load_table(
        spark,
        TableSource(
            name="_cdx", uri=_cdx_fixture_dir(spark, sf_dir), format="cdx"
        ),
    ).select("surt_key", "status")
    j = keyed.join(idx, keyed["surt"] == idx["surt_key"], "inner")
    return j.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.count_distinct("surt").cast("bigint").alias("n_keys"),
        F.sum((F.col("status") == 404).cast("bigint"))
        .cast("bigint")
        .alias("n_404_pairs"),
        F.min("surt").alias("min_surt"),
        F.max("surt").alias("max_surt"),
    )


# ---- q_warc_random_fetch ---------------------------------------------------


@register(
    "q_warc_random_fetch",
    oracle="""
    WITH d AS (
      SELECT doc_id, strlen(text) AS tl,
             (CASE WHEN doc_id % 13 = 5 THEN 2 ELSE 1 END) AS m,
             (doc_id % 11 = 3) AS is404,
             (doc_id % 11 <> 3 AND doc_id % 7 = 2) AS isplain
      FROM documents
    ),
    f AS (SELECT * FROM d WHERE is404 OR isplain)
    SELECT CAST(SUM(m) AS BIGINT) AS n_fetched,
           CAST(SUM(CASE WHEN isplain THEN m ELSE 0 END) AS BIGINT)
             AS n_plain,
           CAST(SUM(CASE WHEN is404 THEN m ELSE 0 END) AS BIGINT) AS n_404,
           CAST(SUM(CASE WHEN isplain THEN m * tl ELSE 0 END) AS BIGINT)
             AS plain_octets,
           CAST(SUM(CASE WHEN is404 THEN m * 37 ELSE 0 END) AS BIGINT)
             AS octets_404,
           CAST(SUM(m) AS BIGINT) AS n_match
    FROM f
    """,
    doc="CDX-pointer RANDOM ACCESS into the archives — the pattern "
    "that makes a 100 TB crawl queryable: the WARC fixture build "
    "records each capture's TRUE coordinates (compressed-member "
    "offset/length in .gz shards, raw record slice in plain shards) "
    "into CDXJ pointer files; the gate filters the INDEX to a sparse "
    "subset (text/plain captures + 404s — the filter prunes before "
    "any archive byte moves), then an Arrow-batched kernel seeks and "
    "reads exactly the pointed-at bytes per capture "
    "(sources/warc.read_record_at: gzip-member or raw slice by magic, "
    "fail-loud framing) and re-parses the record. The gate checks "
    "fetched counts, per-class payload octet sums, AND that every "
    "pointer's url/status equal the fetched record's — a stale "
    "offset, wrong-member read, or framing drift fails n_match. Plan: "
    "codegen'd index scan+filter -> mapInPandas fetch (per-capture "
    "cost is one seek+read of ~one record, NOT a file scan) -> one "
    "agg; at 100 TB this is how you serve 0.001% of pages without "
    "opening the other 99.999%.",
    tags=("web", "source"),
)
def q_warc_random_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.config import TableSource
    from roapi_spark.sources import load_table

    archive_dir = _warc_fixture_dir(spark, sf_dir)
    pointers = load_table(
        spark,
        TableSource(
            name="_ptr",
            uri=archive_dir,
            format="cdx",
            option={"glob": "pointers-*.cdxj"},
        ),
    )
    from roapi_spark.sources.warc import fetch_records

    wanted = pointers.filter(
        (F.col("mime") == "text/plain") | (F.col("status") == 404)
    ).select("url", "status", "warc_filename", "offset", "length")

    fetched = fetch_records(wanted, archive_dir)
    is_plain = (F.col("http_status") == 200) & F.col(
        "http_content_type"
    ).startswith("text/plain")
    is_404 = F.col("http_status") == 404
    return fetched.agg(
        F.count("*").cast("bigint").alias("n_fetched"),
        F.sum(is_plain.cast("bigint")).cast("bigint").alias("n_plain"),
        F.sum(is_404.cast("bigint")).cast("bigint").alias("n_404"),
        F.sum(
            F.when(is_plain, F.length("payload").cast("bigint")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("plain_octets"),
        F.sum(
            F.when(is_404, F.length("payload").cast("bigint")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("octets_404"),
        F.sum(
            (
                (F.col("ptr_url") == F.col("target_uri"))
                & (F.col("ptr_status") == F.col("http_status"))
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("n_match"),
    )


# ---- q_warc_roundtrip ------------------------------------------------------


@register(
    "q_warc_roundtrip",
    oracle="""
    SELECT CAST(COUNT(*) + COUNT(DISTINCT doc_id % 4) AS BIGINT)
             AS n_records,
           CAST(COUNT(*) AS BIGINT) AS n_responses,
           CAST(COUNT(DISTINCT doc_id % 4) AS BIGINT) AS n_files,
           CAST(SUM(strlen(text)) AS BIGINT) AS payload_octets,
           CAST(COUNT(*) AS BIGINT) AS n_uri
    FROM documents
    """,
    doc="WARC write-read round trip: the corpus is exported through "
    "the WARC SINK (sinks/warc.py — one gzip member-per-record archive "
    "per shard value, warcinfo head, tmp+rename atomic publish, "
    "deterministic uuid5 record ids so task retries re-land identical "
    "bytes) and read back through the WARC SOURCE; record/response/"
    "file counts, payload octet sum and distinct-URI count must match "
    "the documents table. A framing bug in EITHER half breaks the trip "
    "— the reader was pinned to hand-assembled spec bytes before the "
    "writer existed, so they cannot share a mistake. Plan: "
    "groupBy(shard) -> applyInPandas write (one task = one archive = "
    "the caller-chosen file size) -> per-file streaming read-back -> "
    "one agg; the sink's member-per-record gzip keeps the OUTPUT "
    "random-accessible and CDX-indexable.",
    tags=("web", "gate"),
)
def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from roapi_spark.config import TableSource
    from roapi_spark.sinks.warc import write_warc
    from roapi_spark.sources import load_table

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    rows = docs.select(
        F.concat(
            F.lit("https://corpus.example.org/"),
            F.col("source"),
            F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("target_uri"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit(200).alias("http_status"),
        F.lit("text/plain; charset=utf-8").alias("http_content_type"),
        (F.col("doc_id") % 4).alias("shard"),
    )
    out_root = tempfile.mkdtemp(prefix="warc_sink_gate_")
    atexit.register(shutil.rmtree, out_root, ignore_errors=True)
    out_dir = os.path.join(out_root, "export")
    write_warc(rows, out_dir, shard_col="shard").count()  # execute write
    back = load_table(
        spark, TableSource(name="_rt", uri=out_dir, format="warc")
    )
    is_resp = F.col("warc_type") == "response"
    return back.agg(
        F.count("*").cast("bigint").alias("n_records"),
        F.sum(is_resp.cast("bigint")).cast("bigint").alias("n_responses"),
        F.count_distinct("warc_file").cast("bigint").alias("n_files"),
        F.sum(
            F.when(is_resp, F.length("payload").cast("bigint")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("payload_octets"),
        F.count_distinct(F.when(is_resp, F.col("target_uri")))
        .cast("bigint")
        .alias("n_uri"),
    )


# ---- q_wet_roundtrip -------------------------------------------------------


@register(
    "q_wet_roundtrip",
    oracle=f"""
    WITH live AS (
      SELECT doc_id, {_NORM_LEN} AS nl FROM documents
      WHERE doc_id % 11 <> 3 AND doc_id % 7 <> 2
    )
    SELECT CAST(COUNT(*) + 2 AS BIGINT) AS n_records,
           CAST(COUNT(*) AS BIGINT) AS n_conversion,
           CAST(2 AS BIGINT) AS n_files,
           CAST(SUM(nl) AS BIGINT) AS text_octets,
           CAST(COUNT(*) AS BIGINT) AS n_uri
    FROM live
    """,
    doc="WET derivative round trip (Common Crawl's *.warc.wet layout, "
    "ISO 28500 §6.8 conversion records — what an LLM corpus ingests "
    "instead of raw archives): 200/text/html pages from the WARC "
    "fixture run through main-text extraction, land as conversion "
    "records via sinks/warc.write_wet (2 shards, warcinfo heads, "
    "deterministic bytes), and are read back through the WARC SOURCE; "
    "record/conversion/file counts, text octet sum, and distinct-URI "
    "count must match the documents table's whitespace-normalized "
    "lengths closed-form — so a lost page, a mis-extracted byte, or a "
    "framing bug in either half fails. Plan: streaming WARC scan -> "
    "Arrow-batched extraction (no shuffle) -> groupBy(shard) "
    "applyInPandas write (one task = one WET file) -> streaming "
    "read-back -> one agg; at 100 TB the WET pass is embarrassingly "
    "parallel and its output is ~5x smaller than the archives.",
    tags=("web", "gate", "text"),
)
def q_wet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from roapi_spark.config import TableSource
    from roapi_spark.sinks.warc import write_wet
    from roapi_spark.sources import load_table

    resp = _read_warc(spark, sf_dir, types="response").filter(
        ~F.col("target_uri").contains("utm_medium=x")  # %13 dup records
    )
    extracted = resp.mapInPandas(
        _extract_kernel(schema_needs_text=True),
        _EXTRACT_SCHEMA + ", extracted string",
    ).filter((F.col("is_html") == 1) & F.col("extracted").isNotNull())
    wet_rows = extracted.select(
        "target_uri",
        F.col("extracted").alias("text"),
        F.lit("2026-01-03T00:00:00Z").alias("warc_date"),
        F.pmod(F.crc32(F.col("target_uri")), F.lit(2)).alias("shard"),
    )
    out_root = tempfile.mkdtemp(prefix="wet_sink_gate_")
    atexit.register(shutil.rmtree, out_root, ignore_errors=True)
    out_dir = os.path.join(out_root, "wet")
    write_wet(wet_rows, out_dir).count()  # execute the write
    back = load_table(
        spark, TableSource(name="_wet", uri=out_dir, format="warc")
    )
    is_conv = F.col("warc_type") == "conversion"
    return back.agg(
        F.count("*").cast("bigint").alias("n_records"),
        F.sum(is_conv.cast("bigint")).cast("bigint").alias("n_conversion"),
        F.count_distinct("warc_file").cast("bigint").alias("n_files"),
        F.sum(
            F.when(is_conv, F.length("payload").cast("bigint")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("text_octets"),
        F.count_distinct(F.when(is_conv, F.col("target_uri")))
        .cast("bigint")
        .alias("n_uri"),
    )


# ---- q_wat_roundtrip ---------------------------------------------------------

_WAT_SCHEMA = (
    "Envelope struct<"
    "`WARC-Header-Metadata` struct<`WARC-Target-URI` string>, "
    "`Payload-Metadata` struct<`HTTP-Response-Metadata` struct<"
    "`HTML-Metadata` struct<Links array<struct<url string>>>>>>"
)


@register(
    "q_wat_roundtrip",
    oracle="""
    WITH live AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 11 <> 3 AND doc_id % 7 <> 2
    )
    SELECT CAST(COUNT(*) + 2 AS BIGINT) AS n_records,
           CAST(COUNT(*) AS BIGINT) AS n_meta,
           CAST(2 AS BIGINT) AS n_files,
           CAST(8 * COUNT(*) AS BIGINT) AS sum_links,
           CAST(COUNT(*) AS BIGINT) AS n_uri
    FROM live
    """,
    doc="WAT derivative round trip — the third Common Crawl artifact "
    "(WARC bytes / WET text / WAT structure), closing the write-side "
    "triple: per-page outlink sets from the WAT snapshot land as ISO "
    "28500 metadata records whose payload is the WAT JSON envelope "
    "(Envelope -> Payload-Metadata -> HTML-Metadata -> Links, the "
    "shape WAT consumers parse), via sinks/warc.write_wat (2 shards, "
    "warcinfo heads, deterministic bytes); read back through the WARC "
    "source and the envelopes parsed with from_json — record/metadata/"
    "file counts, per-page link sums (every live page carries exactly "
    "its 6 chrome + 1 corpus + 1 partner links), and distinct-URI "
    "count replay closed-form. Plan: snapshot scan -> (page) "
    "collect_list agg -> groupBy(shard) applyInPandas write -> "
    "streaming read-back -> codegen'd JSON parse -> one agg.",
    tags=("web", "gate", "graph"),
)
def q_wat_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from roapi_spark.config import TableSource
    from roapi_spark.sinks.warc import write_wat
    from roapi_spark.sources import load_table

    links = _links_snapshot(spark, sf_dir)
    pages = (
        links.groupBy(F.col("src_canon").alias("target_uri"))
        .agg(F.collect_set("dst_canon").alias("links"))
        .withColumn(
            "shard", F.pmod(F.crc32(F.col("target_uri")), F.lit(2))
        )
    )
    out_root = tempfile.mkdtemp(prefix="wat_sink_gate_")
    atexit.register(shutil.rmtree, out_root, ignore_errors=True)
    out_dir = os.path.join(out_root, "wat")
    write_wat(pages, out_dir).count()  # execute the write
    back = load_table(
        spark, TableSource(name="_wat", uri=out_dir, format="warc")
    )
    is_meta = F.col("warc_type") == "metadata"
    env = F.from_json(
        F.decode(F.col("payload"), "UTF-8"), _WAT_SCHEMA
    )
    n_links = F.size(
        env["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"][
            "HTML-Metadata"
        ]["Links"]
    )
    return back.agg(
        F.count("*").cast("bigint").alias("n_records"),
        F.sum(is_meta.cast("bigint")).cast("bigint").alias("n_meta"),
        F.count_distinct("warc_file").cast("bigint").alias("n_files"),
        F.sum(F.when(is_meta, n_links).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("sum_links"),
        F.count_distinct(F.when(is_meta, F.col("target_uri")))
        .cast("bigint")
        .alias("n_uri"),
    )


# ---- q_warc_dedup_export ----------------------------------------------------


@register(
    "q_warc_dedup_export",
    oracle="""
    WITH caps AS (
      SELECT 'https://corpus.example.org/' || source || '/'
               || CAST(doc_id AS VARCHAR) AS uri,
             text, doc_id % 4 AS shard
      FROM documents
      UNION ALL
      SELECT 'https://mirror.example.org/' || source || '/'
               || CAST(doc_id AS VARCHAR),
             text, doc_id % 4
      FROM documents WHERE doc_id % 13 = 5
    ),
    r AS (
      SELECT uri, strlen(text) AS tl, shard,
             ROW_NUMBER() OVER (PARTITION BY text ORDER BY uri) AS rn
      FROM caps
    )
    SELECT CAST(COUNT(*)
                + (SELECT COUNT(DISTINCT shard) FROM caps) AS BIGINT)
             AS n_records,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_responses,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_revisit,
           CAST(SUM(CASE WHEN rn = 1 THEN tl ELSE 0 END) AS BIGINT)
             AS stored_octets,
           CAST(SUM(CASE WHEN rn > 1 THEN tl ELSE 0 END) AS BIGINT)
             AS octets_saved,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_resolved
    FROM r
    """,
    doc="Dedup-aware WARC export — the write half of crawl-side dedup "
    "(ISO 28500 §6.7): duplicate captures (%13 re-fetches AND any "
    "cross-document byte-identical payloads — sf0.1 has 8 natural "
    "text dups, which the replay oracle covers) are detected by "
    "payload-digest window (first capture by URI wins) and land as "
    "headers-only REVISIT "
    "records pointing at the original by target URI (WARC 1.1 "
    "WARC-Refers-To-Target-URI) with the shared WARC-Payload-Digest — "
    "the payload is stored ONCE. Read back through the WARC source: "
    "record/response/revisit counts, stored octets (each text once), "
    "octets saved, and revisit->original resolution (every revisit's "
    "refers_to must name a stored response URI — an inner join, no "
    "misses) replay closed-form. Plan: digest window is one shuffle "
    "on the digest key (WindowGroupLimit-free: every capture is "
    "kept, just re-typed); groupBy(shard) applyInPandas write; at "
    "100 TB this is the storage-dedup pass Common Crawl runs at "
    "write time — ~idempotent refetches stop costing archive bytes.",
    tags=("web", "gate", "dedup"),
)
def q_warc_dedup_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from pyspark.sql import Window

    from roapi_spark.config import TableSource
    from roapi_spark.sinks.warc import write_warc
    from roapi_spark.sources import load_table

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    primary = docs.select(
        F.concat(
            F.lit("https://corpus.example.org/"),
            F.col("source"),
            F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("target_uri"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        (F.col("doc_id") % 4).alias("shard"),
    )
    dup = docs.filter(F.col("doc_id") % 13 == 5).select(
        F.concat(
            F.lit("https://mirror.example.org/"),
            F.col("source"),
            F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("target_uri"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        (F.col("doc_id") % 4).alias("shard"),
    )
    captures = primary.unionAll(dup)
    # crawl-side dedup decision: first capture per payload digest (by
    # URI — corpus.example.org sorts before mirror.example.org) keeps
    # the payload; later captures become revisits pointing at it
    w = Window.partitionBy("digest").orderBy("target_uri")
    marked = (
        captures.withColumn("digest", F.md5(F.col("payload")))
        .withColumn("orig_uri", F.first("target_uri").over(w))
        .withColumn(
            "revisit_of",
            F.when(
                F.col("target_uri") != F.col("orig_uri"), F.col("orig_uri")
            ),
        )
        .drop("digest", "orig_uri")
    )
    out_root = tempfile.mkdtemp(prefix="warc_dedup_gate_")
    atexit.register(shutil.rmtree, out_root, ignore_errors=True)
    out_dir = os.path.join(out_root, "dedup")
    write_warc(marked, out_dir).count()  # execute the write
    back = load_table(
        spark, TableSource(name="_dd", uri=out_dir, format="warc")
    )
    is_resp = F.col("warc_type") == "response"
    is_rev = F.col("warc_type") == "revisit"
    # revisit->original resolution: every revisit's refers_to must name
    # a stored response URI; the join also recovers the octets each
    # revisit AVOIDED storing (= its original's payload length)
    resolved = (
        back.filter(is_rev)
        .select(F.col("refers_to").alias("ref"))
        .join(
            back.filter(is_resp).select(
                F.col("target_uri").alias("ref"),
                F.length("payload").cast("bigint").alias("l"),
            ),
            "ref",
            "inner",
        )
        .agg(
            F.sum("l").cast("bigint").alias("octets_saved"),
            F.count("*").cast("bigint").alias("n_resolved"),
        )
    )
    agg = back.agg(
        F.count("*").cast("bigint").alias("n_records"),
        F.sum(is_resp.cast("bigint")).cast("bigint").alias("n_responses"),
        F.sum(is_rev.cast("bigint")).cast("bigint").alias("n_revisit"),
        F.sum(
            F.when(is_resp, F.length("payload").cast("bigint")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("stored_octets"),
    )
    return agg.crossJoin(F.broadcast(resolved)).select(
        "n_records", "n_responses", "n_revisit", "stored_octets",
        "octets_saved", "n_resolved",
    )


# ---- q_cdx_digest_dedup ----------------------------------------------------


@register(
    "q_cdx_digest_dedup",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             (CASE WHEN doc_id % 13 = 5 THEN 2 ELSE 1 END) AS caps
      FROM documents
    )
    SELECT CAST(SUM(caps) AS BIGINT) AS n_captures,
           CAST(COUNT(*) AS BIGINT) AS n_digests,
           CAST(SUM(caps - 1) AS BIGINT) AS n_redundant,
           CAST(SUM(CASE WHEN caps > 1 THEN doc_id ELSE 0 END) AS BIGINT)
             AS sum_dup_id
    FROM d
    """,
    doc="Crawl-time dedup from the INDEX alone: captures grouped by "
    "payload digest over the CDX sidecar — the pass a real pipeline "
    "runs before touching any archive byte (re-captures of unchanged "
    "pages are redundant fetches; their WARC records need never be "
    "read). The %13 re-captures share their primary's digest, so "
    "n_redundant and the duplicate-id checksum are closed-form. Plan: "
    "splittable text scan -> codegen'd parse -> digest-keyed hash agg "
    "(map-side partials) -> one summary agg; at 100 TB the digest "
    "column is the shuffle key and the archives are never opened.",
    tags=("web", "dedup", "source"),
)
def q_cdx_digest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.config import TableSource
    from roapi_spark.sources import load_table

    df = load_table(
        spark,
        TableSource(
            name="_cdx", uri=_cdx_fixture_dir(spark, sf_dir), format="cdx"
        ),
    )
    per_digest = df.groupBy("digest").agg(
        F.count("*").alias("caps"),
        # digest is 'sha1:{doc_id}' in the fixture: recover the id for
        # the checksum (gate glue, same as every id recovery)
        F.min(F.regexp_extract("digest", r"sha1:(\d+)", 1).cast("bigint"))
        .alias("doc_id"),
    )
    return per_digest.agg(
        F.sum("caps").cast("bigint").alias("n_captures"),
        F.count("*").cast("bigint").alias("n_digests"),
        F.sum(F.col("caps") - 1).cast("bigint").alias("n_redundant"),
        F.sum(F.when(F.col("caps") > 1, F.col("doc_id")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("sum_dup_id"),
    )


# ---- q_cdx_index_roundtrip -------------------------------------------------


@register(
    "q_cdx_index_roundtrip",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, strlen(text) AS tl,
             (CASE WHEN doc_id % 13 = 5 THEN 2 ELSE 1 END) AS m,
             (doc_id % 17 = 1) AS isrev,
             (doc_id % 11 = 3) AS is404,
             (doc_id % 11 <> 3 AND doc_id % 7 = 2) AS isplain
      FROM documents
    )
    SELECT CAST(SUM(m) + SUM(CASE WHEN isrev THEN 1 ELSE 0 END) AS BIGINT)
             AS n_ptr_direct,
           CAST(SUM(m) + SUM(CASE WHEN isrev THEN 1 ELSE 0 END) AS BIGINT)
             AS n_roundtrip,
           CAST(SUM(CASE WHEN isrev THEN 1 ELSE 0 END) AS BIGINT)
             AS n_rev_ptr,
           (SELECT CAST(COUNT(DISTINCT doc_id % {_N_SHARDS}) AS BIGINT)
            FROM documents) AS n_files,
           CAST(COUNT(*) AS BIGINT) AS n_surt,
           CAST(SUM(CASE WHEN is404 OR isplain THEN m ELSE 0 END) AS BIGINT)
             AS n_fetched,
           CAST(SUM(CASE WHEN isplain THEN m * tl ELSE 0 END) AS BIGINT)
             AS plain_octets,
           CAST(SUM(CASE WHEN is404 THEN m * 37 ELSE 0 END) AS BIGINT)
             AS octets_404,
           CAST(SUM(CASE WHEN is404 OR isplain THEN m ELSE 0 END) AS BIGINT)
             AS n_match
    FROM d
    """,
    doc="CDX index GENERATION round trip — the third leg of the crawl "
    "toolchain (sinks/warc.py writes archives, sinks/cdx.index_warc "
    "indexes them, sources/warc.fetch_records seeks through the "
    "result): the WARC fixture is indexed from its raw bytes (gzip "
    "member spans recovered by zlib walk — exact consumed-byte counts, "
    "never magic-number guessing; plain-layout slices from record "
    "offsets), written as SURT-sorted CDXJ shards through the CDX "
    "SINK, read back through the CDX SOURCE, and the 404/plain subset "
    "is random-access FETCHED through the generated pointers — a wrong "
    "offset or length fails the reader's exact-framing contract, and "
    "fetched url/status must equal the pointer row's. Counts (response "
    "+ revisit pointers, distinct SURT = distinct pages, shard files) "
    "and fetched payload octets are residue closed-form. Plan: one "
    "task indexes one archive (memory bounded by archive size, the "
    "sink's own file-size contract); SURT keys attach JVM-side; at "
    "100 TB this is how a crawl BUILDS the index the other cdx gates "
    "consume, without any external indexer.",
    tags=("web", "gate", "source"),
)
def q_cdx_index_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from roapi_spark.config import TableSource
    from roapi_spark.sinks.cdx import index_warc, write_cdx
    from roapi_spark.sources import load_table
    from roapi_spark.sources.warc import fetch_records

    warc_dir = _warc_fixture_dir(spark, sf_dir)
    # Persist the pointer table for the query's duration: the CDX write
    # below AND the returned plan's n_ptr_direct agg both consume it —
    # without the persist the raw-byte archive parse ran twice per serve
    # (round 14; guide §5 — reuse instead of recompute; pointer rows are
    # index-sized, ~1000x smaller than the archives).
    ptrs = serve_persist(index_warc(spark, warc_dir, glob="*.warc*"))
    out_root = tempfile.mkdtemp(prefix="cdx_sink_gate_")
    atexit.register(shutil.rmtree, out_root, ignore_errors=True)
    out_dir = os.path.join(out_root, "index")
    write_cdx(
        ptrs.withColumn(
            "shard", F.pmod(F.crc32(F.col("surt_key")), F.lit(2))
        ),
        out_dir,
    ).count()  # execute the write
    back = load_table(
        spark, TableSource(name="_gen", uri=out_dir, format="cdx")
    )
    direct = ptrs.agg(
        F.count("*").cast("bigint").alias("n_ptr_direct")
    )
    fetched = fetch_records(
        back.filter(
            (F.col("status") == 404) | (F.col("mime") == "text/plain")
        ),
        warc_dir,
    )
    fetch_agg = fetched.agg(
        F.count("*").cast("bigint").alias("n_fetched"),
        F.sum(
            F.when(
                F.col("http_content_type").startswith("text/plain"),
                F.length("payload").cast("bigint"),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("plain_octets"),
        F.sum(
            F.when(
                F.col("http_status") == 404,
                F.length("payload").cast("bigint"),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("octets_404"),
        F.sum(
            (
                (F.col("target_uri") == F.col("ptr_url"))
                & (F.col("http_status") == F.col("ptr_status"))
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("n_match"),
    )
    back_agg = back.agg(
        F.count("*").cast("bigint").alias("n_roundtrip"),
        F.count_distinct("warc_filename").cast("bigint").alias("n_files"),
        F.count_distinct("surt_key").cast("bigint").alias("n_surt"),
    )
    # revisit pointers: the indexer marks headers-only revisit records
    # with pywb's 'warc/revisit' mime (their digest column carries the
    # ORIGINAL payload's Base32 SHA-1, per the declared header)
    rev = back.agg(
        F.sum((F.col("mime") == "warc/revisit").cast("bigint"))
        .cast("bigint")
        .alias("n_rev_ptr")
    )
    return (
        direct.crossJoin(back_agg)
        .crossJoin(rev)
        .crossJoin(fetch_agg)
        .select(
            "n_ptr_direct", "n_roundtrip", "n_rev_ptr", "n_files",
            "n_surt", "n_fetched", "plain_octets", "octets_404", "n_match",
        )
    )


# ---- q_src_warc_revisit ----------------------------------------------------


@register(
    "q_src_warc_revisit",
    oracle="""
    WITH rv AS (SELECT doc_id FROM documents WHERE doc_id % 17 = 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_revisit,
           CAST(SUM(CASE WHEN doc_id % 3 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_resolved,
           CAST(SUM(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dangling,
           CAST(SUM(CASE WHEN doc_id % 3 <> 0 THEN doc_id ELSE 0 END)
             AS BIGINT) AS sum_resolved_id
    FROM rv
    """,
    doc="WARC revisit-record gate (ISO 28500 §6.7 — the crawl-side "
    "dedup record type Heritrix/Common Crawl write when a re-fetch "
    "matches a stored payload): the fixture emits headers-only revisit "
    "records (identical-payload-digest profile) on the %17 residue, "
    "each carrying WARC-Refers-To; the %3 sub-residue DANGLES the "
    "reference (original lost with its crawl file), so the "
    "resolution join — revisits against response record ids — has a "
    "real miss path. The loader must surface refers_to and parse the "
    "bodiless http block (status from headers, empty payload); a "
    "dropped header, a mis-typed record, or a join that fabricates or "
    "loses a match shifts a count against the residue-arithmetic "
    "oracle. Plan: one WARC scan -> type-split -> broadcast join on "
    "record id (revisit streams are crawl-sized, originals "
    "index-sized per window) -> one agg.",
    tags=("source", "warc", "web"),
)
def q_src_warc_revisit(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _read_warc(spark, sf_dir, payload="false")  # metadata-only pass
    rev = df.filter(F.col("warc_type") == "revisit").select(
        "refers_to",
        F.regexp_extract("target_uri", r"://[^/]+/[^/]+/(\d+)", 1)
        .cast("bigint")
        .alias("doc_id"),
    )
    resp = (
        df.filter(F.col("warc_type") == "response")
        .select(F.col("record_id").alias("orig_id"))
        .distinct()
    )
    j = rev.join(F.broadcast(resp), rev.refers_to == F.col("orig_id"), "left")
    return j.agg(
        F.count("*").cast("bigint").alias("n_revisit"),
        F.sum(F.col("orig_id").isNotNull().cast("bigint"))
        .cast("bigint")
        .alias("n_resolved"),
        F.sum(F.col("orig_id").isNull().cast("bigint"))
        .cast("bigint")
        .alias("n_dangling"),
        F.sum(
            F.when(F.col("orig_id").isNotNull(), F.col("doc_id")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("sum_resolved_id"),
    )


# ---- text_html_extract -----------------------------------------------------


def _extract_kernel(schema_needs_text: bool):
    """mapInPandas kernel: decode + extract main text for 200/text/html
    response rows; emits (doc_id, norm_len[, extracted])."""
    import pandas as pd

    from roapi_spark.functions.web import extract_main_text

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: list[dict] = []
            for uri, status, ctype, payload in zip(
                pdf["target_uri"],
                pdf["http_status"],
                pdf["http_content_type"],
                pdf["payload"],
            ):
                rec: dict = {
                    "target_uri": uri,
                    "is_ok": int(status == 200),
                    "is_html": int(
                        status == 200
                        and str(ctype or "").startswith("text/html")
                    ),
                    "norm_len": None,
                }
                if rec["is_html"]:
                    from roapi_spark.functions.web import decode_http_text

                    raw = decode_http_text(bytes(payload), ctype)
                    # fail-closed per record: an undecodable page is an
                    # extraction miss (norm_len NULL), never mojibake
                    text = None if raw is None else extract_main_text(raw)
                    rec["norm_len"] = None if text is None else len(text)
                    if schema_needs_text:
                        rec["extracted"] = text
                elif schema_needs_text:
                    rec["extracted"] = None
                out.append(rec)
            cols = ["target_uri", "is_ok", "is_html", "norm_len"] + (
                ["extracted"] if schema_needs_text else []
            )
            yield pd.DataFrame(out, columns=cols)

    return fn


_EXTRACT_SCHEMA = (
    "target_uri string, is_ok int, is_html int, norm_len bigint"
)


@register(
    "text_html_extract",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pages,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(SUM({_NORM_LEN}) AS BIGINT) AS sum_norm_len
    FROM documents
    WHERE doc_id % 11 <> 3 AND doc_id % 7 <> 2
    """,
    doc="HTML main-text extraction gate: every 200/text/html page in the "
    "WARC fixture wraps one document's text in chrome (title/style/"
    "script/nav/header, a link-dense sidebar the link-density heuristic "
    "must drop, footer); extraction must recover the document text "
    "EXACTLY (whitespace-normalized), verified by joining back to the "
    "documents table on the doc_id parsed from the URL — n_exact is "
    "COUNT(*) in the oracle, so a single mis-extracted byte fails the "
    "gate. The %13 duplicate RECORDS are excluded (their primary "
    "records stay) to keep one row per doc. Plan: streaming WARC scan "
    "-> Arrow-batched mapInPandas "
    "extraction (no shuffle) -> broadcast-able join on doc_id -> one "
    "agg.",
    tags=("text", "web"),
)
def text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    resp = _read_warc(spark, sf_dir, types="response").filter(
        ~F.col("target_uri").contains("utm_medium=x")  # %13 dup form
    )
    extracted = resp.mapInPandas(
        _extract_kernel(schema_needs_text=True),
        _EXTRACT_SCHEMA + ", extracted string",
    ).filter(F.col("is_html") == 1)
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select(
            "doc_id",
            F.trim(F.regexp_replace("text", WS_CLASS + "+", " ")).alias("norm_text"),
        )
    )
    joined = extracted.withColumn(
        "doc_id",
        F.regexp_extract("target_uri", r"://[^/]+/[^/]+/(\d+)", 1).cast(
            "bigint"
        ),
    ).join(docs, "doc_id", "inner")
    return joined.agg(
        F.count("*").cast("bigint").alias("n_pages"),
        F.sum((F.col("extracted") == F.col("norm_text")).cast("bigint"))
        .cast("bigint")
        .alias("n_exact"),
        F.sum(F.length("norm_text").cast("bigint"))
        .cast("bigint")
        .alias("sum_norm_len"),
    )


# ---- q_url_canonicalize ----------------------------------------------------


@register(
    "q_url_canonicalize",
    oracle=f"""
    WITH u AS ({_URL_CTE}),
    c AS (SELECT doc_id, {_canon_sql("raw_url")} AS canon FROM u),
    g AS (SELECT canon, COUNT(*) AS n FROM c GROUP BY canon)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_raw,
           CAST(COUNT(*) AS BIGINT) AS n_canon,
           CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_groups,
           CAST(SUM(strlen(canon)) AS BIGINT) AS canon_octets,
           MIN(canon) AS min_canon,
           MAX(canon) AS max_canon
    FROM g
    """,
    doc="URL canonicalization gate: messy raw URLs (mixed host case, "
    "explicit :443, trailing slashes, utm_*/click-id tracking params, "
    "shuffled query order, fragments) are synthesized from the "
    "documents table on fixed residues and canonicalized with PURE "
    "built-in expressions (functions/web.canonical_url: regexp_extract "
    "+ filter + array_sort — whole-stage codegen, usable as a dedup "
    "shuffle key); every variant pair must collapse to one canonical "
    "key, and the oracle runs the SAME regex pipeline in DuckDB so "
    "min/max/octet aggregates pin the exact canonical strings. Plan: "
    "one FileScan -> projection -> hash agg on canon -> global agg; no "
    "Python anywhere.",
    tags=("web", "dedup"),
)
def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    primary = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.when(
                F.col("doc_id") % 5 == 0, F.lit("CRAWL.Example.com")
            ).otherwise(F.lit("crawl.example.com")),
            F.when(F.col("doc_id") % 9 == 4, F.lit(":443")).otherwise(
                F.lit("")
            ),
            F.lit("/"),
            F.col("source"),
            F.lit("/"),
            F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 4 == 1, F.lit("/")).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 2 == 0, F.lit("?utm_source=feed&b=2&a=1")
            ).otherwise(F.lit("?a=1&b=2")),
            F.when(F.col("doc_id") % 6 == 3, F.lit("#frag")).otherwise(
                F.lit("")
            ),
        ).alias("raw_url"),
    )
    dup = docs.filter(F.col("doc_id") % 13 == 5).select(
        "doc_id",
        F.concat(
            F.lit("https://crawl.example.com:443/"),
            F.col("source"),
            F.lit("/"),
            F.col("doc_id").cast("string"),
            F.lit("/?b=2&a=1&utm_medium=x#x2"),
        ).alias("raw_url"),
    )
    c = primary.unionAll(dup).select(canonical_url(F.col("raw_url")).alias("canon"))
    g = c.groupBy("canon").agg(F.count("*").alias("n"))
    return g.agg(
        F.sum("n").cast("bigint").alias("n_raw"),
        F.count("*").cast("bigint").alias("n_canon"),
        F.sum((F.col("n") > 1).cast("bigint"))
        .cast("bigint")
        .alias("n_dup_groups"),
        F.sum(F.length("canon").cast("bigint"))
        .cast("bigint")
        .alias("canon_octets"),
        F.min("canon").alias("min_canon"),
        F.max("canon").alias("max_canon"),
    )


# ---- q_domain_filter -------------------------------------------------------

_HOSTS = (
    "news.example.com",
    "blog.example.co.uk",
    "ads.tracker.net",
    "cdn.example.org",
)
_BLOCKLIST = ("tracker.net",)

from roapi_spark.functions.web import registrable_domain_sql  # noqa: E402

# generated from the SAME pinned public-suffix snapshot the Spark
# expression reads — the two engines cannot disagree on a suffix rule
_DOM_SQL = registrable_domain_sql("host")


@register(
    "q_domain_filter",
    oracle=f"""
    WITH h AS (
      SELECT CASE doc_id % 4
               WHEN 0 THEN '{_HOSTS[0]}' WHEN 1 THEN '{_HOSTS[1]}'
               WHEN 2 THEN '{_HOSTS[2]}' ELSE '{_HOSTS[3]}' END AS host
      FROM documents
    ),
    d AS (SELECT {_DOM_SQL} AS domain FROM h)
    SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_kept
    FROM d WHERE domain NOT IN ('{_BLOCKLIST[0]}')
    GROUP BY domain ORDER BY domain
    """,
    doc="Domain blocklist gate (the UT1/abuse-list pattern): hosts are "
    "assigned per doc on a fixed residue, reduced to their registrable "
    "domain (last two labels, or three under a multi-label public "
    "suffix like co.uk — functions/web.registrable_domain, pure "
    "regexp), and filtered by a broadcast anti-join against the "
    "blocklist; the oracle mirrors the suffix regexes in DuckDB. "
    "Plan: FileScan -> codegen'd domain projection -> "
    "BroadcastHashJoin(LeftAnti) -> hash agg; at 100 TB the blocklist "
    "(UT1 is ~4M rows) still broadcasts, and the domain key is "
    "shuffle-safe.",
    tags=("web", "filter"),
)
def q_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    host = (
        F.when(F.col("doc_id") % 4 == 0, F.lit(_HOSTS[0]))
        .when(F.col("doc_id") % 4 == 1, F.lit(_HOSTS[1]))
        .when(F.col("doc_id") % 4 == 2, F.lit(_HOSTS[2]))
        .otherwise(F.lit(_HOSTS[3]))
    )
    d = docs.select(registrable_domain(host).alias("domain"))
    block = spark.createDataFrame(
        [(b,) for b in _BLOCKLIST], "domain string"
    )
    kept = d.join(F.broadcast(block), "domain", "left_anti")
    return (
        kept.groupBy("domain")
        .agg(F.count("*").cast("bigint").alias("n_kept"))
        .orderBy("domain")
    )


# ---- q_crawl_funnel --------------------------------------------------------


@register(
    "q_crawl_funnel",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_NORM_LEN} AS nlen,
             (doc_id % 11 = 3) AS is404,
             (doc_id % 7 = 2) AS isplain,
             (doc_id % 13 = 5) AS hasdup
      FROM documents
    ),
    r AS (
      SELECT * FROM d
      UNION ALL
      SELECT * FROM d WHERE hasdup
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_fetched,
           CAST(SUM(CASE WHEN NOT is404 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_ok,
           CAST(SUM(CASE WHEN NOT is404 AND NOT isplain THEN 1 ELSE 0 END)
             AS BIGINT) AS n_html,
           CAST(SUM(CASE WHEN NOT is404 AND NOT isplain
                    AND nlen >= {_MIN_TEXT} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_text,
           CAST(COUNT(DISTINCT CASE WHEN NOT is404 AND NOT isplain
                    AND nlen >= {_MIN_TEXT} THEN doc_id END) AS BIGINT)
             AS n_unique
    FROM r
    """,
    doc="End-to-end crawl-to-corpus funnel over the WARC fixture: "
    "fetched responses -> HTTP 200 -> text/html -> extracted main text "
    f"of at least {_MIN_TEXT} normalized chars -> canonical-URL dedup "
    "(duplicate-URL records collapse via functions/web.canonical_url). "
    "One output row of stage counts; the oracle replays each stage "
    "from the documents table via the fixture's residue arithmetic and "
    "the SAME whitespace normalization, so a wrong extraction, a "
    "mis-parsed status, or a canonicalization miss shifts a count and "
    "hash-mismatches. Plan: streaming WARC scan -> mapInPandas extract "
    "(no shuffle) -> codegen'd canonical key -> single hash agg with a "
    "conditional distinct.",
    tags=("web", "pipeline"),
)
def q_crawl_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    resp = _read_warc(spark, sf_dir, types="response")
    flags = resp.mapInPandas(
        _extract_kernel(schema_needs_text=False), _EXTRACT_SCHEMA
    )
    staged = flags.withColumn(
        "canon", canonical_url(F.col("target_uri"))
    ).withColumn(
        "passes",
        (F.col("is_html") == 1) & (F.col("norm_len") >= _MIN_TEXT),
    )
    return staged.agg(
        F.count("*").cast("bigint").alias("n_fetched"),
        F.sum("is_ok").cast("bigint").alias("n_ok"),
        F.sum("is_html").cast("bigint").alias("n_html"),
        F.sum(F.col("passes").cast("bigint")).cast("bigint").alias("n_text"),
        F.count_distinct(F.when(F.col("passes"), F.col("canon")))
        .cast("bigint")
        .alias("n_unique"),
    )


# ---- stream_crawl_ingest ---------------------------------------------------


@register(
    "stream_crawl_ingest",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, doc_id % {_N_SHARDS} AS shard, {_NORM_LEN} AS nlen,
             (doc_id % 11 = 3) AS is404,
             (doc_id % 7 = 2) AS isplain,
             (doc_id % 13 = 5) AS hasdup
      FROM documents
    ),
    r AS (
      SELECT * FROM d
      UNION ALL
      SELECT * FROM d WHERE hasdup
    )
    SELECT 'docs-0' || shard || (CASE WHEN shard % 2 = 0 THEN '.warc.gz'
                                      ELSE '.warc' END) AS warc_file,
           CAST(COUNT(*) AS BIGINT) AS n_responses,
           CAST(SUM(CASE WHEN NOT is404 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_ok,
           CAST(SUM(CASE WHEN NOT is404 AND NOT isplain THEN 1 ELSE 0 END)
             AS BIGINT) AS n_html,
           CAST(SUM(CASE WHEN NOT is404 AND NOT isplain
                    AND nlen >= {_MIN_TEXT} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_text,
           CAST(COUNT(DISTINCT CASE WHEN NOT is404 AND NOT isplain
                    AND nlen >= {_MIN_TEXT} THEN doc_id END) AS BIGINT)
             AS n_unique
    FROM r GROUP BY shard ORDER BY warc_file
    """,
    doc="Streaming twin of the crawl funnel: WARC shards LAND in a "
    "directory in two arrival waves; an actual Structured Streaming "
    "query (streaming/crawl.py: binaryFile file-stream source = "
    "exactly-once per-file cursor, Arrow-batched parse + HTML "
    "extraction per batch) ingests them incrementally and accumulates "
    "per-file funnel counts. Output is one row per WARC file, so a "
    "stream that drops a file, double-delivers one (counts double and "
    "hash-mismatch), or mis-parses a payload fails the gate; the "
    "oracle replays the funnel from the documents table via the "
    "fixture's shard/residue arithmetic. Plan: fixture-sized; input "
    "volume per batch is the file-ARRIVAL rate, never the corpus size "
    "— the property that holds when a fetcher fleet feeds a 100 TB "
    "corpus. Checkpoint-restart exactly-once is pinned in "
    "tests/test_warc.py.",
    tags=("streaming", "web"),
)
def stream_crawl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from roapi_spark.streaming.crawl import stream_crawl_ingest as _ingest

    src = _warc_fixture_dir(spark, sf_dir)
    shards = _warc_shards(src)
    landing = tempfile.mkdtemp(prefix="crawl_landing_")
    acc: dict[str, list] = {}

    def process(flags: DataFrame, batch_id: int) -> None:
        passes = (F.col("is_html") == 1) & (F.col("norm_len") >= _MIN_TEXT)
        rows = (
            flags.groupBy("warc_file")
            .agg(
                F.count("*").cast("bigint").alias("n_responses"),
                F.sum("is_ok").cast("bigint").alias("n_ok"),
                F.sum("is_html").cast("bigint").alias("n_html"),
                F.sum(passes.cast("bigint")).cast("bigint").alias("n_text"),
                F.count_distinct(F.when(passes, F.col("canon")))
                .cast("bigint")
                .alias("n_unique"),
            )
            .collect()
        )
        for r in rows:
            # accumulate ADDITIVELY: a double-delivered file doubles its
            # counts and hash-mismatches, which is the point
            cur = acc.setdefault(r["warc_file"], [0, 0, 0, 0, 0])
            cur[0] += r["n_responses"]
            cur[1] += r["n_ok"]
            cur[2] += r["n_html"]
            cur[3] += r["n_text"]
            cur[4] += r["n_unique"]

    try:
        # wave 1 lands before the stream starts, wave 2 mid-stream
        for name in shards[: _N_SHARDS // 2]:
            shutil.copy(os.path.join(src, name), os.path.join(landing, name))
        q = _ingest(
            spark,
            landing,
            process,
            os.path.join(landing, "_ckpt"),
            query_name="stream_crawl_ingest",
        )
        try:
            q.processAllAvailable()
            for name in shards[_N_SHARDS // 2 :]:
                shutil.copy(
                    os.path.join(src, name), os.path.join(landing, name)
                )
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        shutil.rmtree(landing, ignore_errors=True)
    return spark.createDataFrame(
        sorted((f, *v) for f, v in acc.items()),
        "warc_file string, n_responses bigint, n_ok bigint, n_html bigint, "
        "n_text bigint, n_unique bigint",
    )


# ---- q_robots_filter -------------------------------------------------------

# a policy exercising group selection (the '*' group disallows
# EVERYTHING — if group selection broke, every URL blocks), multi-UA
# groups, prefix semantics (/src1 also blocks src10..src19), longer-
# pattern re-allows, wildcard+anchor rules, and comments/blank lines
_ROBOTS_TXT = """\
# crawl policy for example.com
User-agent: *
Disallow: /

User-agent: trainbot
User-agent: otherbot
Allow: /
Disallow: /src1
Allow: /src1*0$
Disallow: /src2/
Allow: /src13
Disallow: /*9$
"""

from roapi_spark.functions.web import (  # noqa: E402
    parse_robots,
    robots_allowed_col,
    robots_allowed_sql,
)

_ROBOTS_RULES = parse_robots(_ROBOTS_TXT, "trainbot")
_PATH_SQL = "'/' || source || '/' || CAST(doc_id AS VARCHAR)"


@register(
    "q_robots_filter",
    oracle=f"""
    SELECT source,
           CAST(SUM(CASE WHEN {robots_allowed_sql(_PATH_SQL, _ROBOTS_RULES)}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_allowed,
           CAST(SUM(CASE WHEN {robots_allowed_sql(_PATH_SQL, _ROBOTS_RULES)}
                    THEN 0 ELSE 1 END) AS BIGINT) AS n_blocked,
           CAST(SUM(CASE WHEN {robots_allowed_sql(_PATH_SQL, _ROBOTS_RULES)}
                    THEN doc_id ELSE 0 END) AS BIGINT) AS sum_allowed_id
    FROM documents GROUP BY source ORDER BY source
    """,
    doc="robots.txt URL filter (Robots Exclusion Protocol, RFC 9309): "
    "a policy with a deny-all '*' group, a multi-UA specific group, "
    "prefix rules, longer-pattern re-allows, and wildcard+anchor rules "
    "is parsed from-spec (functions/web.parse_robots) and applied to "
    "per-doc URL paths with most-specific-wins precedence (longest "
    "pattern; allow wins ties) as COMPOSED BUILT-INS — one rlike per "
    "rule, GREATEST per side, allow >= disallow — so the decision is "
    "whole-stage codegen'd and shuffle-free; the oracle runs the same "
    "generated rule regexes in DuckDB. Parsing itself is pinned to RFC "
    "examples in tests/test_web_extract.py. Plan: FileScan -> codegen'd "
    "projection -> source-keyed hash agg; at 100 TB the policy set "
    "rides the scan (a per-host policy table becomes a broadcast "
    "join on registrable domain — same shape as q_domain_filter).",
    tags=("web", "filter"),
)
def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    path = F.concat(
        F.lit("/"), F.col("source"), F.lit("/"), F.col("doc_id").cast("string")
    )
    allowed = robots_allowed_col(path, _ROBOTS_RULES)
    return (
        docs.select("source", "doc_id", allowed.alias("ok"))
        .groupBy("source")
        .agg(
            F.sum(F.col("ok").cast("bigint")).cast("bigint").alias("n_allowed"),
            F.sum((~F.col("ok")).cast("bigint")).cast("bigint").alias("n_blocked"),
            F.sum(F.when(F.col("ok"), F.col("doc_id")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("sum_allowed_id"),
        )
        .orderBy("source")
    )


# ---- stream_url_frontier ---------------------------------------------------


@register(
    "stream_url_frontier",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, doc_id % {_N_SHARDS} AS shard,
             (doc_id % 13 = 5) AS hasdup
      FROM documents
    ),
    per_shard AS (
      SELECT shard,
             CAST(COUNT(*) AS BIGINT)
               + CAST(SUM(CASE WHEN hasdup THEN 1 ELSE 0 END) AS BIGINT)
               AS n_urls,
             CAST(COUNT(*) AS BIGINT) AS n_new
      FROM d GROUP BY shard
    ),
    named AS (
      SELECT 'docs-0' || shard || (CASE WHEN shard % 2 = 0 THEN '.warc.gz'
                                        ELSE '.warc' END) AS warc_file,
             n_urls, n_new
      FROM per_shard
      UNION ALL
      SELECT 'recrawl-00.warc.gz', n_urls, CAST(0 AS BIGINT)
      FROM per_shard WHERE shard = 0
    )
    SELECT * FROM named ORDER BY warc_file
    """,
    doc="Crawl-frontier gate: the custom stateful streaming operator "
    "(streaming/crawl.stream_url_frontier: applyInPandasWithState "
    "keyed on the CANONICAL url, one int of state per key) classifies "
    "every response URL in arriving WARC files as first-seen or "
    "revisit. Shards land in two waves; wave 2 re-lands shard 0 under "
    "a new name (a re-crawl), so the state built in wave 1 must "
    "classify every one of its URLs as already-seen across the batch "
    "boundary — and the %13 duplicate-URL records collapse WITHIN a "
    "batch (case/tracking variants, one frontier entry). Output is one "
    "row per file (arrivals, first-seen count); state loss, "
    "double-counting, or canonicalization misses shift a count and "
    "hash-mismatch. Plan: fixture-sized; per-batch input is the "
    "file-arrival rate, state is one int per canonical in the "
    "checkpointed store (production bounds it with TTL or a bloom "
    "front — this is the exact kernel those approximate).",
    tags=("streaming", "web"),
)
def stream_url_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from roapi_spark.streaming.crawl import (
        stream_state_partitions,
        stream_url_frontier as _frontier,
    )

    src = _warc_fixture_dir(spark, sf_dir)
    shards = _warc_shards(src)
    landing = tempfile.mkdtemp(prefix="frontier_landing_")
    acc: dict[str, list] = {}

    def process(classified: DataFrame, batch_id: int) -> None:
        for r in (
            classified.groupBy("warc_file")
            .agg(
                F.count("*").cast("bigint").alias("n_urls"),
                F.sum("is_new").cast("bigint").alias("n_new"),
            )
            .collect()
        ):
            cur = acc.setdefault(r["warc_file"], [0, 0])
            cur[0] += r["n_urls"]
            cur[1] += r["n_new"]

    try:
        for name in shards[: _N_SHARDS // 2]:
            shutil.copy(os.path.join(src, name), os.path.join(landing, name))
        with stream_state_partitions(spark):
            q = _frontier(
                spark,
                landing,
                process,
                os.path.join(landing, "_ckpt"),
                query_name="stream_url_frontier",
            )
            try:
                q.processAllAvailable()
                for name in shards[_N_SHARDS // 2 :]:
                    shutil.copy(
                        os.path.join(src, name), os.path.join(landing, name)
                    )
                # wave 2 also RE-LANDS shard 0: a re-crawl of known URLs
                shutil.copy(
                    os.path.join(src, shards[0]),
                    os.path.join(landing, "recrawl-00.warc.gz"),
                )
                q.processAllAvailable()
            finally:
                q.stop()
    finally:
        shutil.rmtree(landing, ignore_errors=True)
    return spark.createDataFrame(
        sorted((f, *v) for f, v in acc.items()),
        "warc_file string, n_urls bigint, n_new bigint",
    )


# ---- multimodal_crawl_images -----------------------------------------------

# every doc_id % 5 == 0 page also serves a grayscale PNG whose pixels
# follow the closed form pixel(y, x) = base + x + 2y with
# base = doc_id % 200 (max value 199 + 11 + 14 < 256: no uint8 wrap, so
# the oracle can integrate the plane analytically)
_IMG_RESIDUE = 5


def _img_dims(doc_id: int) -> tuple[int, int, int]:
    return 8 + doc_id % 5, 6 + doc_id % 3, doc_id % 200  # w, h, base


def _warc_images_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build-once crawl-image fixture: 2 gzip WARC shards of image/png
    responses, payloads produced by the repo's own from-spec PNG encoder
    (scanline filters cycling, so the decoder's unfilter paths are
    load-bearing)."""
    import numpy as np

    from roapi_spark.functions.multimodal import encode_png
    from roapi_spark.functions.snapshot import build_once, snapshot_cache_dir

    src = os.path.join(sf_dir, "documents.parquet")
    out = snapshot_cache_dir(src, "warcimg-v1")
    names = ("img-00.warc.gz", "img-01.warc.gz")

    def ready(d: str) -> bool:
        return all(os.path.exists(os.path.join(d, n)) for n in names)

    def build(tmp: str) -> None:
        os.makedirs(tmp, exist_ok=True)
        rows = (
            spark.read.parquet(src)
            .filter(F.col("doc_id") % _IMG_RESIDUE == 0)
            .select("doc_id", "source")
            .orderBy("doc_id")
            .collect()
        )
        shards: list[list[bytes]] = [[], []]
        for r in rows:
            doc_id, source = r[0], r[1]
            w, h, base = _img_dims(doc_id)
            gray = np.fromfunction(
                lambda y, x: base + x + 2 * y, (h, w), dtype=np.int64
            ).astype(np.uint8)
            png = encode_png(gray)
            block = (
                f"HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n"
                f"Content-Length: {len(png)}\r\n\r\n"
            ).encode() + png
            rec = _warc_record(
                "response",
                f"https://img.example.com/{source}/{doc_id}.png",
                block,
                "application/http; msgtype=response",
            )
            shards[(doc_id // _IMG_RESIDUE) % 2].append(rec)
        for i, name in enumerate(names):
            with open(os.path.join(tmp, name), "wb") as f:
                for rec in shards[i]:
                    f.write(gzip.compress(rec, mtime=0))

    return build_once(out, ready, build)


@register(
    "multimodal_crawl_images",
    oracle=f"""
    WITH p AS (
      SELECT doc_id,
             8 + doc_id % 5 AS w,
             6 + doc_id % 3 AS h,
             doc_id % 200 AS base
      FROM documents WHERE doc_id % {_IMG_RESIDUE} = 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(SUM(w * h) AS BIGINT) AS px_count,
           CAST(SUM(w * h * base
                    + h * (w * (w - 1) / 2)
                    + 2 * w * (h * (h - 1) / 2)) AS BIGINT) AS pixel_sum,
           CAST(SUM(base) AS BIGINT) AS corner_sum,
           CAST(SUM(base + (w - 1) + 2 * (h - 1)) AS BIGINT)
             AS far_corner_sum
    FROM p
    """,
    doc="Crawl-to-multimodal composition gate: image/png HTTP responses "
    "inside WARC shards are scanned by the WARC source and decoded by "
    "the repo's own from-spec PNG codec (encode side cycles all five "
    "scanline filters, so every unfilter path is load-bearing); pixel "
    "geometry/sum/corner aggregates must match the oracle's ANALYTIC "
    "integration of the synthetic pixel plane pixel(y,x) = base + x + "
    "2y — a single wrong pixel anywhere in the decode chain "
    "hash-mismatches. Plan: per-file streaming WARC scan -> "
    "Arrow-batched decode kernel (no shuffle) -> one global agg; the "
    "shape a multimodal crawl harvest runs at 100 TB (images ride the "
    "same archives as the text).",
    tags=("multimodal", "web"),
)
def multimodal_crawl_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.config import TableSource
    from roapi_spark.sources import load_table

    d = _warc_images_dir(spark, sf_dir)
    resp = load_table(
        spark,
        TableSource(name="_imgs", uri=d, format="warc",
                    option={"types": "response"}),
    ).filter(F.col("http_content_type") == "image/png")

    def kernel(batches):
        import pandas as pd

        from roapi_spark.functions.multimodal import decode_image

        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                arr = decode_image(bytes(payload))
                h, w = arr.shape
                out.append(
                    {
                        "w": w,
                        "h": h,
                        "pixel_sum": int(arr.sum(dtype="int64")),
                        "corner": int(arr[0, 0]),
                        "far_corner": int(arr[h - 1, w - 1]),
                    }
                )
            yield pd.DataFrame(
                out, columns=["w", "h", "pixel_sum", "corner", "far_corner"]
            )

    decoded = resp.mapInPandas(
        kernel,
        "w int, h int, pixel_sum bigint, corner int, far_corner int",
    )
    return decoded.agg(
        F.count("*").cast("bigint").alias("n_images"),
        F.sum(F.col("w") * F.col("h")).cast("bigint").alias("px_count"),
        F.sum("pixel_sum").cast("bigint").alias("pixel_sum"),
        F.sum("corner").cast("bigint").alias("corner_sum"),
        F.sum("far_corner").cast("bigint").alias("far_corner_sum"),
    )


# ---- stream_crawl_to_delta -------------------------------------------------


@register(
    "stream_crawl_to_delta",
    oracle=f"""
    WITH kept AS (
      SELECT doc_id, source, {_NORM_LEN} AS n_chars
      FROM documents
      WHERE doc_id % 11 <> 3 AND doc_id % 7 <> 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(doc_id) AS BIGINT) AS sum_id,
           CAST(2 AS BIGINT) AS n_commits
    FROM kept
    """,
    doc="Streaming corpus delivery gate: WARC shards land in two waves; "
    "each micro-batch is parsed + extracted, filtered to usable pages, "
    "canonical-URL-deduped within the batch, and APPENDED to a Delta "
    "table as one atomic commit through this repo's own writer "
    "(streaming/crawl.stream_crawl_to_delta). The gate then reads the "
    "table back through the pure-Python Delta source and checks "
    "docs/sources/char-sum/id-sum AND the commit count (2 waves = 2 "
    "versions), so a dropped batch, a double append, a partial commit, "
    "or a mis-extracted page hash-mismatches. This closes the ingest "
    "loop end to end: crawl stream -> delta corpus -> (CDF) -> the "
    "incremental dedup/quality consumers. Plan: fixture-sized; at "
    "scale each batch costs its arrival volume and one commit.",
    tags=("streaming", "web", "delta"),
)
def stream_crawl_to_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from roapi_spark.sources.delta import _log_versions
    from roapi_spark.streaming.crawl import stream_crawl_to_delta as _deliver

    src = _warc_fixture_dir(spark, sf_dir)
    shards = _warc_shards(src)
    landing = tempfile.mkdtemp(prefix="crawl_delta_landing_")
    table_root = tempfile.mkdtemp(prefix="crawl_delta_table_")
    # the returned DataFrame reads the table LAZILY, so the tmpdir must
    # survive this call — reap it at process exit (same pattern as the
    # worker-ship zip) so repeated gate runs don't accumulate tmpdirs
    atexit.register(shutil.rmtree, table_root, ignore_errors=True)
    table = table_root + "/corpus"
    try:
        for name in shards[: _N_SHARDS // 2]:
            shutil.copy(os.path.join(src, name), os.path.join(landing, name))
        q = _deliver(
            spark,
            landing,
            table,
            os.path.join(landing, "_ckpt"),
            query_name="stream_crawl_to_delta",
        )
        try:
            q.processAllAvailable()
            for name in shards[_N_SHARDS // 2 :]:
                shutil.copy(
                    os.path.join(src, name), os.path.join(landing, name)
                )
            q.processAllAvailable()
        finally:
            q.stop()
        from roapi_spark.config import TableSource
        from roapi_spark.sources import load_table

        corpus = load_table(
            spark, TableSource(name="_corpus", uri=table, format="delta")
        )
        n_commits = len(
            _log_versions(os.path.join(table, "_delta_log"))
        )
        return corpus.agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count_distinct("source").cast("bigint").alias("n_sources"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.sum("doc_id").cast("bigint").alias("sum_id"),
            F.lit(n_commits).cast("bigint").alias("n_commits"),
        )
    finally:
        # the returned DataFrame reads the table LAZILY — only the
        # landing dir is disposable here; the table tmpdir is reaped by
        # the atexit hook registered above
        shutil.rmtree(landing, ignore_errors=True)


# ---- q_crawl_link_graph ----------------------------------------------------


def _anchor_rows(spark: SparkSession, sf_dir: str, with_text: bool) -> DataFrame:
    """One-Python-stage WAT pass: WARC read + response/HTML filter +
    payload decode + link extraction fused into a single kernel over
    the shard paths (guide §8 / §4.2): the old shape ran the warc
    loader as one Python stage and the anchor kernel as a second, which
    round-tripped every HTML payload Python -> JVM -> Python just to
    apply JVM-side status/content-type filters in between. The filters
    and decode now run where the payload already is; only the SMALL
    anchor rows (uri, winner key, resolved href [, text]) ever reach
    the JVM — the payload is decoded in exactly one place."""
    import os as _os

    from roapi_spark.sources.warc import _list_files

    uri = _warc_fixture_dir(spark, sf_dir)
    files = _list_files(uri, "*.warc*", recursive=False)
    paths = spark.createDataFrame(
        [(p,) for p in files], "path string"
    ).repartition(len(files), "path")

    def kernel(batches):
        import pandas as pd

        from roapi_spark.functions.web import (
            decode_http_text,
            extract_links,
            extract_links_with_text,
            resolve_url,
        )
        from roapi_spark.sources.warc import read_warc_file

        cols = ["target_uri", "record_id", "warc_file", "record_offset"] + (
            ["anchor_text", "resolved"] if with_text else ["resolved"]
        )
        for pdf in batches:
            for p in pdf["path"]:
                label = _os.path.relpath(p, uri)
                out = []
                for rec in read_warc_file(p, label):
                    # same predicate the JVM filter applied: response,
                    # status 200, text/html (NULL content type drops)
                    if rec["warc_type"] != "response":
                        continue
                    if rec["http_status"] != 200:
                        continue
                    ctype = rec["http_content_type"]
                    if not (ctype or "").startswith("text/html"):
                        continue
                    raw = decode_http_text(rec["payload"], ctype)
                    if raw is None:
                        continue
                    turi = rec["target_uri"]
                    base = (turi, rec["record_id"], label,
                            rec["record_offset"])
                    if with_text:
                        for href, text in extract_links_with_text(raw):
                            out.append(
                                base + (text, resolve_url(turi, href))
                            )
                    else:
                        for href in extract_links(raw):
                            out.append(base + (resolve_url(turi, href),))
                yield pd.DataFrame(out, columns=cols)

    schema = (
        "target_uri string, record_id string, warc_file string, "
        "record_offset bigint, "
        + ("anchor_text string, " if with_text else "")
        + "resolved string"
    )
    return paths.mapInPandas(kernel, schema).withColumn(
        "canon", canonical_url(F.col("target_uri"))
    )


def _crawl_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GENERAL WAT pass, stage 1: every anchor of every fetched
    HTML page, RESOLVED against the page's WARC-Target-URI (RFC 3986 §5
    reference resolution — functions/web.resolve_url handles absolute,
    protocol-relative, path-absolute, dot-segmented and path-relative
    hrefs) — no href-shape assumptions anywhere. Pages are deduplicated
    on their canonical URL first, so re-crawled records contribute one
    page each. Returns (src_canon, dst_canon): canonical source page ->
    canonical resolved target."""
    # Re-crawled duplicate-URL records collapse to ONE page per canon —
    # but keyed on the per-anchor ROWS (min winner key per canon over a
    # window), never by dropDuplicates over the records themselves:
    # that form sort-aggregated full HTML payloads through an exchange
    # before the parse (round 14; guide §8 — decide with small rows,
    # never shuffle the heavy bytes). Parsing the few duplicate records
    # too is far cheaper than shuffling every payload. The winner key is
    # (record_id, warc_file, record_offset) — guaranteed unique even
    # when malformed WARCs leave record_id empty, so tied-id duplicates
    # can never double-count anchors (round-15 advice item; same winner
    # as min(record_id) whenever ids are unique).
    from pyspark.sql import Window

    links = _anchor_rows(spark, sf_dir, with_text=False)
    w = Window.partitionBy("canon")
    key = F.struct("record_id", "warc_file", "record_offset")
    links = links.withColumn("_k0", F.min(key).over(w)).filter(
        key == F.col("_k0")
    )
    return links.select(
        F.col("canon").alias("src_canon"),
        canonical_url(F.col("resolved")).alias("dst_canon"),
    )


def _crawl_links_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The general WAT pass with anchor TEXT: (anchor_text, dst_canon)
    per anchor of every deduped fetched HTML page — same
    parse/resolve/canonicalize path as _crawl_links, plus the
    whitespace-normalized text inside each anchor (the relevance/label
    signal WAT consumers mine)."""
    # Same single-Python-stage pass and per-page dedup as _crawl_links:
    # min unique winner key per canon over the small anchor rows, not
    # dropDuplicates over payload-carrying records (round 14; guide §8;
    # round-15 unique-key tie-break).
    from pyspark.sql import Window

    links = _anchor_rows(spark, sf_dir, with_text=True)
    w = Window.partitionBy("canon")
    key = F.struct("record_id", "warc_file", "record_offset")
    links = links.withColumn("_k0", F.min(key).over(w)).filter(
        key == F.col("_k0")
    )
    return links.select(
        "anchor_text",
        canonical_url(F.col("resolved")).alias("dst_canon"),
    )


def _links_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The general link pass materialized ONCE as parquet — the WAT
    pattern (Common Crawl publishes WAT files precisely so every graph
    analysis doesn't re-parse the HTML): q_crawl_link_graph and
    q_crawl_anchor_text keep measuring the FRESH parse and pin its
    values; the derived analyses (pagerank, host graph, HITS, budget,
    inlink profiles) read this snapshot. Same build-once discipline as
    the ANN layouts and the fixture dirs."""
    from roapi_spark.functions.snapshot import build_once, snapshot_cache_dir

    src = os.path.join(sf_dir, "documents.parquet")
    out = snapshot_cache_dir(src, "crawllinks-v1")

    def ready(d: str) -> bool:
        return os.path.exists(os.path.join(d, "_SUCCESS"))

    def build(tmp: str) -> None:
        _crawl_links(spark, sf_dir).write.mode("overwrite").parquet(tmp)

    build_once(out, ready, build)
    return spark.read.parquet(out)


def _links_text_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(anchor_text, dst_canon) snapshot — the text-bearing WAT half,
    same contract as _links_snapshot."""
    from roapi_spark.functions.snapshot import build_once, snapshot_cache_dir

    src = os.path.join(sf_dir, "documents.parquet")
    out = snapshot_cache_dir(src, "crawllinkstext-v1")

    def ready(d: str) -> bool:
        return os.path.exists(os.path.join(d, "_SUCCESS"))

    def build(tmp: str) -> None:
        _crawl_links_text(spark, sf_dir).write.mode("overwrite").parquet(tmp)

    build_once(out, ready, build)
    return spark.read.parquet(out)


def _crawl_edges(
    spark: SparkSession, sf_dir: str, links: DataFrame | None = None
) -> DataFrame:
    """(src, dst) doc-id edges: the general link pass restricted to the
    CRAWLED SET — a resolved target is an intra-corpus edge iff its
    canonical form is itself a fetched page (left-semi join against the
    canonical page set), which is how a real WAT pass separates corpus
    links from chrome/external ones; no href-shape regex. The final
    canonical->doc_id mapping uses the fixture's URL layout (gate glue,
    same as every other gate's id recovery)."""
    # metadata-only pass: the page SET needs URIs, never payloads —
    # payload=false keeps corpus bytes out of the Arrow transfer (at
    # real crawl scale this pass reads the CDX index instead)
    resp = _read_warc(spark, sf_dir, types="response", payload="false")
    page_set = (
        resp.select(canonical_url(F.col("target_uri")).alias("dst_canon"))
        .distinct()
    )
    if links is None:
        links = _crawl_links(spark, sf_dir)
    intra = links.join(F.broadcast(page_set), "dst_canon", "left_semi")
    return intra.select(
        F.regexp_extract("src_canon", r"://[^/]+/[^/]+/(\d+)", 1)
        .cast("bigint")
        .alias("src"),
        F.regexp_extract("dst_canon", r"://[^/]+/[^/]+/(\d+)", 1)
        .cast("bigint")
        .alias("dst"),
    )



@register(
    "q_crawl_link_graph",
    oracle="""
    WITH live AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 11 <> 3 AND doc_id % 7 <> 2
    ),
    edges AS (
      SELECT doc_id AS src,
             (doc_id * 7) % (SELECT COUNT(*) FROM documents) AS dst
      FROM live
    ),
    indeg AS (SELECT dst, COUNT(*) AS d FROM edges GROUP BY dst)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
           CAST(COUNT(*) AS BIGINT) AS n_targets,
           CAST(MAX(d) AS BIGINT) AS max_indegree,
           CAST(SUM(dst * d) AS BIGINT) AS sum_dst,
           CAST(MIN(dst) AS BIGINT) AS min_dst
    FROM indeg
    """,
    doc="Crawl link-graph extraction (the GENERAL WAT pass): every "
    "HTML page carries one cross-document footer link following a "
    "functional map (dst = 7*src mod N), emitted in doc_id-residue-"
    "varied RFC 3986 reference forms (absolute, protocol-relative, "
    "path-absolute with tracking noise, ../-relative, dot-segmented); "
    "the links kernel parses ALL anchors (functions/web.extract_links), "
    "RESOLVES each against the page's target URI (web.resolve_url, "
    "RFC 3986 §5), canonicalizes, and keeps intra-corpus edges by a "
    "left-semi join against the canonical page set — chrome and "
    "external links drop out because they are not fetched pages, not "
    "because of any href-shape regex. The in-degree profile must match "
    "the oracle's closed-form replay of the functional map over live "
    "pages; any resolution or canonicalization error lands the edge "
    "outside the page set and shifts a count. Duplicate-URL records "
    "(%13) collapse via canonical page dedup. Plan: streaming WARC "
    "scan -> Arrow-batched parse+resolve (no shuffle) -> codegen'd "
    "canonicalization -> broadcast semi join on the page set -> one "
    "hash agg on dst; at 100 TB the page-set join becomes a shuffle "
    "join keyed on the canonical URL — still one corpus scan.",
    tags=("web", "graph"),
)
def q_crawl_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _crawl_edges(spark, sf_dir).select("dst")
    indeg = edges.groupBy("dst").agg(F.count("*").alias("d"))
    return indeg.agg(
        F.sum("d").cast("bigint").alias("n_edges"),
        F.count("*").cast("bigint").alias("n_targets"),
        F.max("d").cast("bigint").alias("max_indegree"),
        F.sum(F.col("dst") * F.col("d")).cast("bigint").alias("sum_dst"),
        F.min("dst").cast("bigint").alias("min_dst"),
    )


# ---- q_crawl_pagerank ------------------------------------------------------

_CPR_ITERS = 2
_CPR_SCALE = 1_000_000
_CPR_DN, _CPR_DD = 85, 100  # damping 0.85 as an exact ratio


def _crawl_pagerank_oracle() -> str:
    base = _CPR_SCALE * (_CPR_DD - _CPR_DN) // _CPR_DD
    parts = [
        """live AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 11 <> 3 AND doc_id % 7 <> 2
    ),
    edges AS (
      SELECT doc_id AS a,
             (doc_id * 7) % (SELECT COUNT(*) FROM documents) AS b
      FROM live
    ),
    nodes AS (SELECT a AS n FROM edges UNION SELECT b FROM edges),
    deg AS (SELECT a AS n, COUNT(*) AS d FROM edges GROUP BY a),
    pr0 AS (SELECT n, {scale} AS pr FROM nodes)""".format(scale=_CPR_SCALE)
    ]
    for t in range(1, _CPR_ITERS + 1):
        parts.append(
            f"""s{t} AS (
      SELECT e.b AS n, SUM(p.pr // d.d) AS s
      FROM edges e JOIN pr{t - 1} p ON p.n = e.a JOIN deg d ON d.n = e.a
      GROUP BY e.b
    ),
    pr{t} AS (
      SELECT nodes.n,
             {base} + (COALESCE(s{t}.s, 0) * {_CPR_DN}) // {_CPR_DD} AS pr
      FROM nodes LEFT JOIN s{t} ON nodes.n = s{t}.n
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT nodes.n AS doc_id,
           CAST(COALESCE(deg.d, 0) AS BIGINT) AS out_degree,
           CAST(pr{_CPR_ITERS}.pr AS BIGINT) AS pagerank
    FROM nodes LEFT JOIN deg ON nodes.n = deg.n
    JOIN pr{_CPR_ITERS} ON nodes.n = pr{_CPR_ITERS}.n
    ORDER BY doc_id
    """
    )


@register(
    "q_crawl_pagerank",
    oracle=_crawl_pagerank_oracle(),
    doc=f"PageRank over the crawl link graph ({_CPR_ITERS} power "
    "iterations, damping 0.85, fixed-point integer arithmetic — the "
    "same bit-exact iterative pattern as q_pagerank_dupgraph, but over "
    "a DIRECTED graph parsed from real page anchors by the links "
    "kernel, dangling pages contributing nothing): the quality prior a "
    "crawl scheduler feeds back into fetch ordering (edge source = the "
    "materialized WAT snapshot; the parse is pinned fresh by "
    "q_crawl_link_graph). Per-node output "
    "(doc_id, out_degree, pagerank) joins edge endpoints only, so an "
    "isolated page never invents rank. Plan: one WARC scan builds the "
    "edge set (graph-sized, tiny vs the corpus), then each iteration "
    "is two broadcast-scale joins + one hash agg over EDGES, "
    "checkpointed — corpus is never re-scanned.",
    tags=("web", "graph", "iterative"),
)
def q_crawl_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = (
        _crawl_edges(spark, sf_dir, links=_links_snapshot(spark, sf_dir))
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("a").alias("n"))
        .union(edges.select(F.col("b").alias("n")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy(F.col("a").alias("n")).agg(F.count("*").alias("d"))
    base = _CPR_SCALE * (_CPR_DD - _CPR_DN) // _CPR_DD
    pr = nodes.select("n", F.lit(_CPR_SCALE).cast("bigint").alias("pr"))
    for _ in range(_CPR_ITERS):
        contrib = (
            edges.join(pr, edges.a == pr.n)
            .join(
                deg.select(F.col("n").alias("dn"), "d"),
                edges.a == F.col("dn"),
            )
            .select(F.col("b"), F.expr("pr div d").alias("c"))
            .groupBy("b")
            .agg(F.sum("c").alias("s"))
        )
        pr = (
            nodes.join(contrib, nodes.n == contrib.b, "left")
            .select(
                "n",
                (
                    F.lit(base)
                    + F.expr(
                        f"(coalesce(s, 0) * {_CPR_DN}) div {_CPR_DD}"
                    )
                )
                .cast("bigint")
                .alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        nodes.join(deg, "n", "left")
        .join(pr.select(F.col("n").alias("pn"), "pr"), nodes.n == F.col("pn"))
        .select(
            F.col("n").alias("doc_id"),
            F.coalesce(F.col("d"), F.lit(0)).cast("bigint").alias("out_degree"),
            F.col("pr").cast("bigint").alias("pagerank"),
        )
        .orderBy("doc_id")
    )
