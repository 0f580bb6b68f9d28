"""WARC loader (sources/warc.py): from-spec framing (ISO 28500), both
file layouts (plain + one-gzip-member-per-record), HTTP payload
splitting, type filtering, and fail-loud behavior on malformed input.

The golden fixture is hand-assembled bytes (not produced by any writer
in this repo), so the reader is pinned to the spec, not to itself."""

from __future__ import annotations

import gzip
import hashlib
import io

import pytest

from roapi_spark.config import TableSource, sniff_format
from roapi_spark.sources import load_table
from roapi_spark.sources.warc import (
    WarcFormatError,
    iter_records,
    read_warc_file,
)

BODY = b"hello crawl"
HTTP_OK = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
    + BODY
)


def rec(
    wtype: str,
    uri: str | None,
    block: bytes,
    ctype: str = "application/http; msgtype=response",
    version: str = "WARC/1.0",
) -> bytes:
    head = (
        f"{version}\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Record-ID: <urn:uuid:{wtype}>\r\n"
        "WARC-Date: 2026-01-01T00:00:00Z\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    )
    return head.encode() + block + b"\r\n\r\n"


def golden() -> bytes:
    return (
        rec(
            "warcinfo",
            None,
            b"software: test\r\n",
            ctype="application/warc-fields",
        )
        + rec(
            "request",
            "https://example.com/a",
            b"GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n",
            ctype="application/http; msgtype=request",
        )
        + rec("response", "https://example.com/a", HTTP_OK)
    )


def parse(data: bytes) -> list[dict]:
    return list(iter_records(io.BufferedReader(io.BytesIO(data)), "t"))


def test_golden_bytes_are_pinned():
    # the fixture itself is pinned so a helper edit can't silently
    # weaken every assertion below
    assert hashlib.sha256(golden()).hexdigest() == (
        "ac906e6704e37cfd1698a86fbf51e0bec407cfbc029a90953b551dad552dc895"
    )


def test_record_framing_and_http_split():
    recs = parse(golden())
    assert [r["warc_type"] for r in recs] == [
        "warcinfo",
        "request",
        "response",
    ]
    info, req, resp = recs
    assert info["target_uri"] is None
    assert info["payload"] == b"software: test\r\n"
    assert req["http_status"] is None  # request line has no status
    assert resp["http_status"] == 200
    assert resp["http_content_type"] == "text/html; charset=utf-8"
    assert resp["payload"] == BODY
    assert resp["content_length"] == len(HTTP_OK)
    assert resp["warc_date"] == "2026-01-01T00:00:00Z"


def test_warc_1_1_version_line_accepted():
    recs = parse(rec("response", "https://e.com", HTTP_OK, version="WARC/1.1"))
    assert recs[0]["http_status"] == 200


def test_header_continuation_lines():
    block = b"x"
    data = (
        b"WARC/1.0\r\n"
        b"WARC-Type: metadata\r\n"
        b"WARC-Target-URI: https://example.com/very\r\n"
        b"\tlong/path\r\n"
        b"Content-Type: text/plain\r\n"
        b"Content-Length: 1\r\n\r\n" + block + b"\r\n\r\n"
    )
    (r,) = parse(data)
    assert r["target_uri"] == "https://example.com/very long/path"


def test_bare_lf_writer_tolerated():
    data = (
        b"WARC/1.0\n"
        b"WARC-Type: resource\n"
        b"Content-Type: text/plain\n"
        b"Content-Length: 2\n\n"
        b"ab\n\n"
    )
    (r,) = parse(data)
    assert r["payload"] == b"ab" and r["warc_type"] == "resource"


def test_gzip_member_per_record_layout(tmp_path):
    p = tmp_path / "t.warc.gz"
    p.write_bytes(
        gzip.compress(rec("response", "https://e.com/1", HTTP_OK), mtime=0)
        + gzip.compress(rec("response", "https://e.com/2", HTTP_OK), mtime=0)
    )
    recs = list(read_warc_file(str(p)))
    assert [r["target_uri"] for r in recs] == [
        "https://e.com/1",
        "https://e.com/2",
    ]


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda d: d[:-20], "truncated record"),
        (lambda d: d.replace(b"WARC/1.0", b"WARK/1.0", 1), "version line"),
        (
            lambda d: d.replace(b"Content-Length: ", b"Content-Length: 9", 1),
            "truncated record",
        ),
        (
            lambda d: d.replace(b"Content-Length", b"Content-Weight", 1),
            "without Content-Length",
        ),
        (lambda d: d[:-2], "bad record trailer"),
    ],
)
def test_malformed_input_fails_loudly(mutate, msg):
    data = rec("response", "https://e.com", HTTP_OK)
    with pytest.raises(WarcFormatError, match=msg):
        parse(mutate(data))


def test_sniff_format():
    assert sniff_format("crawl/part-0.warc") == "warc"
    assert sniff_format("crawl/part-0.warc.gz") == "warc"
    assert sniff_format("CRAWL/PART-0.WARC.GZ") == "warc"


def test_loader_directory_scan_and_types_filter(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(golden())
    (tmp_path / "b.warc.gz").write_bytes(
        gzip.compress(rec("response", "https://e.com/b", HTTP_OK), mtime=0)
    )
    (tmp_path / "notes.txt").write_text("ignored")
    ts = TableSource(name="crawl", uri=str(tmp_path), format="warc")
    df = load_table(spark, ts)
    rows = {(r["warc_file"], r["warc_type"]) for r in df.collect()}
    assert rows == {
        ("a.warc", "warcinfo"),
        ("a.warc", "request"),
        ("a.warc", "response"),
        ("b.warc.gz", "response"),
    }

    only = load_table(
        spark,
        TableSource(
            name="crawl",
            uri=str(tmp_path),
            format="warc",
            option={"types": "response"},
        ),
    )
    assert {r["warc_type"] for r in only.collect()} == {"response"}


def test_warc_sink_roundtrip_and_determinism(spark, tmp_path):
    """The sink writes one member-per-record gzip archive per shard,
    readable by the source; a second identical write re-lands byte-
    identical files (deterministic ids + sorted records => idempotent
    task retries)."""
    import hashlib as _hl
    import os

    from roapi_spark.sinks.warc import write_warc

    rows = spark.createDataFrame(
        [
            ("https://e.com/b", b"beta", 200, "text/plain", 0),
            ("https://e.com/a", b"alpha", 404, "text/html", 0),
            ("https://e.com/c", b"gamma", 200, "text/plain", 1),
        ],
        "target_uri string, payload binary, http_status int, "
        "http_content_type string, shard int",
    )
    out = str(tmp_path / "exp")
    m = {
        r["warc_file"]: r["n_records"]
        for r in write_warc(rows, out, shard_col="shard").collect()
    }
    assert m == {"corpus-00000.warc.gz": 3, "corpus-00001.warc.gz": 2}

    def digest():
        return {
            n: _hl.sha256((tmp_path / "exp" / n).read_bytes()).hexdigest()
            for n in sorted(os.listdir(out))
        }

    first = digest()
    write_warc(rows, out, shard_col="shard").collect()  # retry/re-land
    assert digest() == first

    back = load_table(
        spark, TableSource(name="rt", uri=out, format="warc")
    )
    got = {
        (r["target_uri"], r["http_status"], bytes(r["payload"] or b""))
        for r in back.filter("warc_type = 'response'").collect()
    }
    assert got == {
        ("https://e.com/a", 404, b"alpha"),
        ("https://e.com/b", 200, b"beta"),
        ("https://e.com/c", 200, b"gamma"),
    }
    infos = back.filter("warc_type = 'warcinfo'").count()
    assert infos == 2


def test_revisit_record_refers_to_parsed():
    """ISO 28500 §6.7: a revisit record (headers-only http block,
    identical-payload-digest profile) surfaces refers_to, its status
    from the bodiless block, and an empty payload."""
    raw = (
        "WARC/1.0\r\n"
        "WARC-Type: revisit\r\n"
        "WARC-Record-ID: <urn:uuid:rv1>\r\n"
        "WARC-Date: 2026-01-02T00:00:00Z\r\n"
        "WARC-Target-URI: https://example.com/a\r\n"
        "WARC-Refers-To: <urn:uuid:orig1>\r\n"
        "WARC-Profile: http://netpreservation.org/warc/1.0/revisit/"
        "identical-payload-digest\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
    )
    block = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
    data = (
        raw.encode()
        + f"Content-Length: {len(block)}\r\n\r\n".encode()
        + block
        + b"\r\n\r\n"
    )
    recs = list(iter_records(io.BufferedReader(io.BytesIO(data)), "t"))
    assert len(recs) == 1
    r = recs[0]
    assert r["warc_type"] == "revisit"
    assert r["refers_to"] == "<urn:uuid:orig1>"
    assert r["http_status"] == 200 and r["payload"] == b""
    # non-revisit records carry refers_to = None
    other = list(
        iter_records(
            io.BufferedReader(
                io.BytesIO(rec("response", "https://e.com/x", HTTP_OK))
            ),
            "t",
        )
    )
    assert other[0]["refers_to"] is None


def test_loader_payload_false_is_metadata_only(spark, tmp_path):
    """payload=false serves every record with a NULL payload — the
    Arrow transfer for URL-set/type-count passes carries no corpus
    bytes, while all metadata columns stay intact."""
    (tmp_path / "a.warc").write_bytes(golden())
    df = load_table(
        spark,
        TableSource(
            name="c",
            uri=str(tmp_path),
            format="warc",
            option={"payload": "false"},
        ),
    )
    rows = df.collect()
    assert len(rows) == 3
    assert all(r["payload"] is None for r in rows)
    resp = [r for r in rows if r["warc_type"] == "response"][0]
    assert resp["http_status"] == 200
    assert resp["target_uri"] == "https://example.com/a"


def test_loader_skips_glob_matching_non_files(spark, tmp_path):
    """A subdirectory whose NAME matches the glob (crawls nest
    segments/) must not be opened as a WARC file in the flat scan."""
    (tmp_path / "a.warc").write_bytes(golden())
    (tmp_path / "seg.warc").mkdir()  # directory named like an archive
    ts = TableSource(name="crawl", uri=str(tmp_path), format="warc")
    assert {r["warc_file"] for r in load_table(spark, ts).collect()} == {
        "a.warc"
    }


def test_loader_empty_dir_fails_loudly(spark, tmp_path):
    with pytest.raises(WarcFormatError, match="no '\\*.warc\\*' files"):
        load_table(
            spark,
            TableSource(name="c", uri=str(tmp_path), format="warc"),
        ).collect()


def test_warc_table_through_catalog(spark, tmp_path):
    """A crawl directory registers like any other table (config parse ->
    sniff -> load -> temp view) and the full SQL/REST surface works over
    it — the user-facing path for 'point roapi at my crawl'."""
    from roapi_spark.catalog import Catalog
    from roapi_spark.config import parse_table_config

    (tmp_path / "a.warc").write_bytes(golden())
    (tmp_path / "b.warc.gz").write_bytes(
        gzip.compress(rec("response", "https://e.com/b", HTTP_OK), mtime=0)
    )
    cat = Catalog(spark, read_only=False)
    cat.load_table(
        parse_table_config(
            {"name": "crawl", "uri": str(tmp_path), "format": "warc"}
        )
    )
    got = cat.query_sql(
        "SELECT warc_type, count(*) AS n FROM crawl "
        "GROUP BY warc_type ORDER BY warc_type"
    ).collect()
    assert [(r.warc_type, r.n) for r in got] == [
        ("request", 1),
        ("response", 2),
        ("warcinfo", 1),
    ]
    rest = cat.query_rest(
        "crawl", {"filter[warc_type]": "response", "columns": "target_uri"}
    ).collect()
    assert sorted(r.target_uri for r in rest) == [
        "https://e.com/b",
        "https://example.com/a",
    ]
    assert cat.query_sql(
        "SELECT CAST(payload AS STRING) AS body FROM crawl "
        "WHERE http_status = 200 AND warc_file = 'a.warc'"
    ).collect()[0].body == BODY.decode()


def test_stream_crawl_checkpoint_restart_exactly_once(spark, tmp_path):
    """Kill the ingest stream after wave 1, restart a NEW query on the
    same checkpoint, land wave 2: each file's rows are delivered exactly
    once across the restart (the binaryFile source's checkpoint is the
    cursor)."""
    from roapi_spark.streaming.crawl import stream_crawl_ingest

    landing = tmp_path / "landing"
    landing.mkdir()
    ck = str(tmp_path / "ckpt")
    seen: list[tuple[str, int]] = []

    def process(flags, batch_id):
        for r in flags.groupBy("warc_file").count().collect():
            seen.append((r["warc_file"], r["count"]))

    (landing / "w1.warc").write_bytes(
        rec("response", "https://e.com/1", HTTP_OK)
        + rec("response", "https://e.com/2", HTTP_OK)
    )
    q1 = stream_crawl_ingest(spark, str(landing), process, ck)
    q1.processAllAvailable()
    q1.stop()
    assert seen == [("w1.warc", 2)]

    (landing / "w2.warc.gz").write_bytes(
        gzip.compress(rec("response", "https://e.com/3", HTTP_OK), mtime=0)
    )
    q2 = stream_crawl_ingest(spark, str(landing), process, ck)
    q2.processAllAvailable()
    q2.stop()
    # w1 NOT re-delivered; w2 delivered once
    assert sorted(seen) == [("w1.warc", 2), ("w2.warc.gz", 1)]


def test_bounded_frontier_state_survives_restart(spark, tmp_path):
    """The Bloom-bitmap state must persist through a query restart: a
    URL first seen before the restart classifies as a revisit after it
    (even under a canonical variant), and brand-new URLs still come
    through as first-seen."""
    from roapi_spark.streaming.crawl import stream_url_frontier_bounded

    landing = tmp_path / "landing"
    landing.mkdir()
    ck = str(tmp_path / "ckpt")
    got: list[tuple[str, str, int]] = []

    def process(classified, batch_id):
        for r in classified.collect():
            got.append((r["warc_file"], r["canon"], r["is_new"]))

    (landing / "w1.warc").write_bytes(
        rec("response", "https://e.com/a?b=1", HTTP_OK)
        + rec("response", "https://e.com/a?b=1&utm_source=x", HTTP_OK)
    )
    q1 = stream_url_frontier_bounded(spark, str(landing), process, ck)
    q1.processAllAvailable()
    q1.stop()
    assert sorted(got) == [
        ("w1.warc", "https://e.com/a?b=1", 0),  # within-batch variant
        ("w1.warc", "https://e.com/a?b=1", 1),
    ]

    got.clear()
    (landing / "w2.warc").write_bytes(
        rec("response", "https://E.COM/a?b=1", HTTP_OK)  # revisit, cased
        + rec("response", "https://e.com/new", HTTP_OK)
    )
    q2 = stream_url_frontier_bounded(spark, str(landing), process, ck)
    q2.processAllAvailable()
    q2.stop()
    assert sorted(got) == [
        ("w2.warc", "https://e.com/a?b=1", 0),  # state crossed restart
        ("w2.warc", "https://e.com/new", 1),
    ]


def test_stream_crawl_flags_and_canonical(spark, tmp_path):
    """The per-batch DataFrame carries parse + extraction + canonical
    columns: a 404, a text/plain 200, and an html 200 produce the
    expected flags, and the canonical key strips the tracking param."""
    from roapi_spark.streaming.crawl import stream_crawl_ingest

    landing = tmp_path / "landing"
    landing.mkdir()
    html = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b"<body><p>real body text</p></body>"
    )
    plain = b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nhi"
    notfound = b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\ngone"
    (landing / "w.warc").write_bytes(
        rec("response", "https://e.com/a?utm_source=x&b=1", html)
        + rec("response", "https://e.com/b", plain)
        + rec("response", "https://e.com/c", notfound)
    )
    rows: list = []

    def process(flags, batch_id):
        rows.extend(flags.orderBy("target_uri").collect())

    q = stream_crawl_ingest(
        spark, str(landing), process, str(tmp_path / "ck")
    )
    q.processAllAvailable()
    q.stop()
    a, b, c = rows
    assert (a.is_ok, a.is_html, a.norm_len) == (1, 1, len("real body text"))
    assert a.canon == "https://e.com/a?b=1"
    assert (b.is_ok, b.is_html, b.norm_len) == (1, 0, None)
    assert (c.is_ok, c.is_html) == (0, 0)


def test_url_frontier_state_survives_restart(spark, tmp_path):
    """Frontier state must persist in the checkpointed state store: a
    canonical URL seen before a stream restart classifies as a revisit
    after it — including when the raw form differs (canonical key)."""
    from roapi_spark.streaming.crawl import stream_url_frontier

    landing = tmp_path / "landing"
    landing.mkdir()
    ck = str(tmp_path / "ck")
    rows: list[tuple[str, str, int]] = []

    def process(df, bid):
        rows.extend(
            (r["canon"], r["warc_file"], r["is_new"]) for r in df.collect()
        )

    (landing / "w1.warc").write_bytes(
        rec("response", "https://E.com/a?utm_source=x", HTTP_OK)
    )
    q1 = stream_url_frontier(spark, str(landing), process, ck)
    q1.processAllAvailable()
    q1.stop()
    assert rows == [("https://e.com/a", "w1.warc", 1)]

    # restart: a messy variant of the SAME page + one genuinely new page
    (landing / "w2.warc").write_bytes(
        rec("response", "https://e.com:443/a", HTTP_OK)
        + rec("response", "https://e.com/b", HTTP_OK)
    )
    q2 = stream_url_frontier(spark, str(landing), process, ck)
    q2.processAllAvailable()
    q2.stop()
    assert sorted(rows[1:]) == [
        ("https://e.com/a", "w2.warc", 0),  # revisit: state survived
        ("https://e.com/b", "w2.warc", 1),
    ]


def test_segmented_records_rejected():
    data = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Segment-Number: 1\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: 2\r\n\r\nab\r\n\r\n"
    )
    with pytest.raises(WarcFormatError, match="segmented"):
        parse(data)


def test_gzip_sniffed_by_magic_not_extension(tmp_path):
    """An http-fetched .warc.gz lands in a temp file WITHOUT the .gz
    extension (sources/http.py names it by resolved format) — the
    reader must sniff the gzip magic, not trust the name."""
    gz_bytes = gzip.compress(rec("response", "https://e.com/g", HTTP_OK), mtime=0)
    p = tmp_path / "fetched.warc"  # wrong extension on purpose
    p.write_bytes(gz_bytes)
    (r,) = list(read_warc_file(str(p)))
    assert r["target_uri"] == "https://e.com/g"
    # and in-memory parsing makes the same call
    from roapi_spark.sources.warc import parse_warc_bytes

    (r2,) = list(parse_warc_bytes(gz_bytes, "fetched.warc"))
    assert r2["target_uri"] == "https://e.com/g"


def test_warc_over_http_fetch(spark, tmp_path):
    """Full registration path for a remote crawl file: http:// uri ->
    fetch_to_local -> format sniffed from the URL -> gzip sniffed from
    the payload magic -> records served."""
    import functools
    import http.server
    import threading

    (tmp_path / "part.warc.gz").write_bytes(
        gzip.compress(rec("response", "https://e.com/h", HTTP_OK), mtime=0)
    )
    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=str(tmp_path)
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/part.warc.gz"
        df = load_table(spark, TableSource(name="remote", uri=url))
        rows = df.collect()
        assert len(rows) == 1 and rows[0]["target_uri"] == "https://e.com/h"
        assert rows[0]["http_status"] == 200
    finally:
        srv.shutdown()


def test_recursive_directory_discovery(spark, tmp_path):
    """Crawls nest archives (segments/, per-day dirs): recursive=true
    walks them deterministically; the default stays top-level-only."""
    seg = tmp_path / "segments" / "day1"
    seg.mkdir(parents=True)
    (tmp_path / "top.warc").write_bytes(
        rec("response", "https://e.com/top", HTTP_OK)
    )
    (seg / "deep.warc").write_bytes(
        rec("response", "https://e.com/deep", HTTP_OK)
    )
    flat = load_table(
        spark, TableSource(name="c", uri=str(tmp_path), format="warc")
    )
    assert {r["target_uri"] for r in flat.collect()} == {"https://e.com/top"}
    deep = load_table(
        spark,
        TableSource(
            name="c",
            uri=str(tmp_path),
            format="warc",
            option={"recursive": "true"},
        ),
    )
    assert {r["target_uri"] for r in deep.collect()} == {
        "https://e.com/top",
        "https://e.com/deep",
    }


def test_crawl_to_delta_replay_is_idempotent(spark, tmp_path):
    """Crash-replay semantics (Delta txn pattern): wiping the streaming
    checkpoint and re-running the SAME query over an already-delivered
    table must not duplicate rows or add commits — every batch's commit
    carries (queryId, epochId) and replays are skipped."""
    import shutil

    from roapi_spark.sources.delta import _log_versions
    from roapi_spark.streaming.crawl import stream_crawl_to_delta

    landing = tmp_path / "landing"
    landing.mkdir()
    table = str(tmp_path / "corpus")
    ck = str(tmp_path / "ck")
    html = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b"<body><p>corpus text body</p></body>"
    )
    (landing / "w1.warc").write_bytes(
        rec("response", "https://e.com/d/1", html)
    )
    q = stream_crawl_to_delta(spark, str(landing), table, ck, min_text=1)
    q.processAllAvailable()
    q.stop()
    n1 = spark.read.parquet(table).count() if False else None
    from roapi_spark.config import TableSource
    from roapi_spark.sources import load_table

    def snap():
        df = load_table(
            spark, TableSource(name="t", uri=table, format="delta")
        )
        return df.count(), len(_log_versions(table + "/_delta_log"))

    rows_before, commits_before = snap()
    assert rows_before == 1 and commits_before == 1

    shutil.rmtree(ck)  # simulate lost checkpoint -> full re-delivery
    q2 = stream_crawl_to_delta(spark, str(landing), table, ck, min_text=1)
    q2.processAllAvailable()
    q2.stop()
    assert snap() == (rows_before, commits_before)


def test_last_delivered_epoch_skips_foreign_commits(spark, tmp_path):
    """The idempotency scan must find OUR query's newest epoch even when
    other writers (another query, manual DML) committed after it, and
    must return None for tables we never wrote."""
    from pyspark.sql import Row

    from roapi_spark.sinks.delta import write_delta
    from roapi_spark.streaming.crawl import _last_delivered_epoch

    table = str(tmp_path / "t")
    df = spark.createDataFrame([Row(a=1)])
    write_delta(df, table, mode="append",
                operation="STREAMING UPDATE",
                operation_params={"queryId": "q1", "epochId": "0"})
    write_delta(df, table, mode="append",
                operation="STREAMING UPDATE",
                operation_params={"queryId": "q1", "epochId": "1"})
    # a foreign writer lands AFTER our newest epoch
    write_delta(df, table, mode="append")
    write_delta(df, table, mode="append",
                operation="STREAMING UPDATE",
                operation_params={"queryId": "OTHER", "epochId": "9"})
    assert _last_delivered_epoch(table, "q1") == 1
    assert _last_delivered_epoch(table, "OTHER") == 9
    assert _last_delivered_epoch(table, "never-wrote") is None
    assert _last_delivered_epoch(str(tmp_path / "missing"), "q1") is None


def test_last_delivered_epoch_garbled_own_commit_fails_loud(
    spark, tmp_path
):
    """A commit carrying OUR queryId but no parseable epochId is a hard
    error: silently scanning past it would return an older epoch, and a
    replayed batch would re-append — duplicate rows, not idempotence."""
    from pyspark.sql import Row

    from roapi_spark.sinks.delta import write_delta
    from roapi_spark.streaming.crawl import _last_delivered_epoch

    table = str(tmp_path / "t")
    df = spark.createDataFrame([Row(a=1)])
    write_delta(df, table, mode="append",
                operation="STREAMING UPDATE",
                operation_params={"queryId": "q1", "epochId": "0"})
    write_delta(df, table, mode="append",
                operation="STREAMING UPDATE",
                operation_params={"queryId": "q1"})  # epochId lost
    with pytest.raises(ValueError, match="no parseable epochId"):
        _last_delivered_epoch(table, "q1")
    # other queries are unaffected by q1's garbled commit
    assert _last_delivered_epoch(table, "q2") is None


def test_crawl_to_delta_reset_checkpoint_fails_loudly(spark, tmp_path):
    """A wiped checkpoint restarted against a MULTI-epoch table must
    raise (batch ids restart at 0 < last delivered epoch): silently
    skipping would drop any new files mixed into the reset batches
    while the file cursor marks them consumed."""
    import shutil

    from roapi_spark.streaming.crawl import stream_crawl_to_delta

    landing = tmp_path / "landing"
    landing.mkdir()
    table = str(tmp_path / "corpus")
    ck = str(tmp_path / "ck")
    html = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b"<body><p>corpus text body</p></body>"
    )
    (landing / "w1.warc").write_bytes(
        rec("response", "https://e.com/d/1", html)
    )
    q = stream_crawl_to_delta(spark, str(landing), table, ck, min_text=1)
    q.processAllAvailable()
    (landing / "w2.warc").write_bytes(
        rec("response", "https://e.com/d/2", html)
    )
    q.processAllAvailable()  # epoch 1 delivered
    q.stop()

    shutil.rmtree(ck)
    (landing / "w3.warc").write_bytes(
        rec("response", "https://e.com/d/3", html)
    )
    q2 = stream_crawl_to_delta(spark, str(landing), table, ck, min_text=1)
    with pytest.raises(Exception, match="behind the table's last delivered"):
        q2.processAllAvailable()
    q2.stop()


def test_index_fetch_gzipped_shard(spark, tmp_path):
    """A gzipped CDXJ shard landing in the index-fetch stream must
    gunzip transparently (the '*.cdx*' glob admits .cdx.gz; decoding
    raw gzip bytes used to kill the stream with a FAILFAST JSON
    error)."""
    import json as _json

    from roapi_spark.streaming.crawl import stream_index_fetch

    arch = tmp_path / "archives"
    arch.mkdir()
    body = rec("response", "https://e.com/p", HTTP_OK)
    (arch / "a.warc").write_bytes(body)
    line = "com,e)/p 20260101000000 " + _json.dumps(
        {
            "url": "https://e.com/p",
            "mime": "text/plain",
            "status": "200",
            "digest": "sha1:X",
            "length": str(len(body)),
            "offset": "0",
            "filename": "a.warc",
        },
        sort_keys=True,
    )
    landing = tmp_path / "idx"
    landing.mkdir()
    (landing / "s.cdx.gz").write_bytes(
        gzip.compress((line + "\n").encode(), mtime=0)
    )
    got: list[str] = []

    def process(records, batch_id):
        got.extend(r["target_uri"] for r in records.collect())

    q = stream_index_fetch(
        spark, str(landing), str(arch), process, str(tmp_path / "ck")
    )
    q.processAllAvailable()
    q.stop()
    assert got == ["https://e.com/p"]


def test_cdx_parse_skips_bang_metadata_lines(spark, tmp_path):
    """cdxj-indexer shards open with '!meta 0 {...}' metadata lines —
    format chatter, not captures; the shared parse must skip them (a
    '0' fetch_ts would crash day-based consumers downstream)."""
    import json as _json

    from roapi_spark.sources.cdx import parse_cdx_lines

    line = "com,e)/p 20260101000000 " + _json.dumps(
        {"url": "https://e.com/p", "filename": "a.warc",
         "length": "1", "offset": "0"}
    )
    df = spark.createDataFrame(
        [("!meta 0 {\"format\": \"cdxj\"}",), (line,)], "value string"
    )
    out = parse_cdx_lines(df).collect()
    assert len(out) == 1 and out[0]["surt_key"] == "com,e)/p"
