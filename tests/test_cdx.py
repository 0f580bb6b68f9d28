"""CDX(J) index source (sources/cdx.py): built-in-only parse, format
sniffing, gzip transparency, and fail-loud behavior on malformed blobs."""

from __future__ import annotations

import gzip

import pytest

from roapi_spark.config import TableSource, sniff_format
from roapi_spark.sources import load_table

LINE_A = (
    'com,example)/a 20260101000000 {"url": "https://example.com/a", '
    '"mime": "text/html", "status": "200", "digest": "sha1:1", '
    '"length": "10", "offset": "0", "filename": "x.warc.gz"}'
)
LINE_B = (
    'com,example)/b?q=1 20260102000000 {"url": "https://example.com/b?q=1", '
    '"mime": "text/plain", "status": "404", "digest": "sha1:2", '
    '"length": "20", "offset": "10", "filename": "y.warc"}'
)


def test_sniff_cdx_extensions():
    assert sniff_format("/crawl/index-00.cdx") == "cdx"
    assert sniff_format("/crawl/index-00.cdxj") == "cdx"
    assert sniff_format("/crawl/index-00.cdx.gz") == "cdx"


def test_cdx_parse_plain_and_gz(spark, tmp_path):
    (tmp_path / "a.cdxj").write_text(LINE_A + "\n\n")  # blank tolerated
    (tmp_path / "b.cdx.gz").write_bytes(
        gzip.compress((LINE_B + "\n").encode(), mtime=0)
    )
    df = load_table(
        spark, TableSource(name="idx", uri=str(tmp_path), format="cdx")
    )
    rows = {r["surt_key"]: r for r in df.collect()}
    assert set(rows) == {"com,example)/a", "com,example)/b?q=1"}
    a = rows["com,example)/a"]
    assert (a["status"], a["length"], a["offset"]) == (200, 10, 0)
    assert a["url"] == "https://example.com/a"
    assert a["warc_filename"] == "x.warc.gz"
    b = rows["com,example)/b?q=1"]
    assert (b["status"], b["mime"]) == (404, "text/plain")
    assert b["fetch_ts"] == "20260102000000"


def test_cdx_table_through_catalog(spark, tmp_path):
    """A CDX index registers like any table (sniff -> load -> view) and
    the SQL surface works over it — 'point roapi at my crawl index'."""
    from roapi_spark.catalog import Catalog
    from roapi_spark.config import parse_table_config

    (tmp_path / "a.cdxj").write_text(LINE_A + "\n")
    (tmp_path / "b.cdx.gz").write_bytes(
        gzip.compress((LINE_B + "\n").encode(), mtime=0)
    )
    cat = Catalog(spark)
    cat.load_table(
        parse_table_config({"name": "idx", "uri": str(tmp_path / "a.cdxj")})
    )
    row = cat.query_sql(
        "SELECT status, warc_filename FROM idx ORDER BY surt_key"
    ).collect()
    assert [(r["status"], r["warc_filename"]) for r in row] == [
        (200, "x.warc.gz")
    ]


def test_cdx_header_line_tolerated_malformed_json_fails(spark, tmp_path):
    (tmp_path / "h.cdx").write_text(
        " CDX N b a m s k r M S V g\n" + LINE_A + "\n"
    )
    df = load_table(
        spark, TableSource(name="idx", uri=str(tmp_path), format="cdx")
    )
    assert df.count() == 1

    (tmp_path / "bad.cdx").write_text(
        "com,example)/c 20260101000000 {not json}\n"
    )
    broken = load_table(
        spark, TableSource(name="idx2", uri=str(tmp_path), format="cdx")
    )
    # a bare count() prunes the parse (lazy columns); any read of a
    # parsed column fails loudly
    with pytest.raises(Exception, match="(?i)malformed|failfast|json"):
        broken.select("url").collect()


def test_cdx_truncated_line_fails_loud(spark, tmp_path):
    """A non-blank line with fewer than 3 fields is a framing error,
    not a silent null row."""
    (tmp_path / "t.cdx").write_text("com,example)/x 20260101000000\n")
    df = load_table(
        spark, TableSource(name="t", uri=str(tmp_path), format="cdx")
    )
    with pytest.raises(Exception, match="(?i)malformed|truncated"):
        df.select("url").collect()
