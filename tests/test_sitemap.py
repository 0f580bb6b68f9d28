"""Sitemap source robustness (sitemaps.org 0.9): loader failure paths
and entity-decode behavior the gate's closed-form aggregate can't pin
one-by-one."""

from __future__ import annotations

import gzip

import pytest

from roapi_spark.sources.sitemap import (
    SitemapFormatError,
    parse_sitemap_files,
    resolve_files,
)
from tests.conftest import spark  # noqa: F401

_URLSET = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    "  <url><loc>https://x.example.com/a?b=1&amp;c=2</loc>"
    "<priority>0.8</priority></url>\n"
    "  <url>\n    <loc> https://x.example.com/b </loc>\n"
    "    <lastmod>2026-02-01</lastmod>\n  </url>\n"
    "</urlset>\n"
)


def test_parse_entities_and_optionals(spark, tmp_path):
    p = tmp_path / "s.xml"
    p.write_text(_URLSET)
    rows = {
        r["loc"]: r
        for r in parse_sitemap_files(spark, resolve_files(str(p))).collect()
    }
    # &amp; decoded, whitespace trimmed
    assert "https://x.example.com/a?b=1&c=2" in rows
    a = rows["https://x.example.com/a?b=1&c=2"]
    assert a["priority"] == 0.8 and a["lastmod"] is None
    b = rows["https://x.example.com/b"]
    assert b["lastmod"] == "2026-02-01" and b["priority"] is None


def test_index_followed_and_deduped(spark, tmp_path):
    (tmp_path / "u.xml").write_text(_URLSET)
    (tmp_path / "g.xml.gz").write_bytes(gzip.compress(_URLSET.encode()))
    (tmp_path / "idx.xml").write_text(
        "<sitemapindex><sitemap><loc>u.xml</loc></sitemap>"
        "<sitemap><loc>g.xml.gz</loc></sitemap></sitemapindex>"
    )
    files = resolve_files(str(tmp_path))
    # u.xml named by BOTH the glob and the index: scanned once
    assert len(files) == 2
    assert parse_sitemap_files(spark, files).count() == 4


def test_remote_loc_rejected(tmp_path):
    (tmp_path / "idx.xml").write_text(
        "<sitemapindex><sitemap>"
        "<loc>https://cdn.example.com/s.xml</loc>"
        "</sitemap></sitemapindex>"
    )
    with pytest.raises(SitemapFormatError, match="remote"):
        resolve_files(str(tmp_path))


def test_missing_child_and_bad_root(tmp_path):
    (tmp_path / "idx.xml").write_text(
        "<sitemapindex><sitemap><loc>gone.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    with pytest.raises(SitemapFormatError, match="not found"):
        resolve_files(str(tmp_path / "idx.xml"))
    (tmp_path / "bad.xml").write_text("<rss><channel/></rss>")
    with pytest.raises(SitemapFormatError, match="root"):
        resolve_files(str(tmp_path / "bad.xml"))


def test_robots_sitemap_discovery():
    """robots.txt 'Sitemap:' directives (the discovery hop into this
    source): group-independent, case-insensitive, comment-stripped,
    URL colons preserved, duplicates dropped."""
    from roapi_spark.functions.web import robots_sitemaps

    txt = (
        "User-agent: *\nDisallow: /private\n\n"
        "Sitemap: https://a.example.com/sitemap.xml\n"
        "SITEMAP: https://a.example.com/s2.xml.gz # the comment goes\n"
        "sitemap: https://a.example.com/sitemap.xml\n"
        "Crawl-delay: 3\n"
    )
    assert robots_sitemaps(txt) == [
        "https://a.example.com/sitemap.xml",
        "https://a.example.com/s2.xml.gz",
    ]
    assert robots_sitemaps("User-agent: *\nDisallow:\n") == []


def test_sitemap_registers_as_catalog_table(spark, tmp_path):
    """The sitemap format is a first-class table source: register it
    in the catalog and query it over SQL like any other table."""
    from roapi_spark.catalog import Catalog
    from roapi_spark.config import parse_table_config

    (tmp_path / "s.xml").write_text(_URLSET)
    cat = Catalog(spark)
    cat.load_table(
        parse_table_config(
            {
                "name": "seeds",
                "uri": str(tmp_path / "s.xml"),
                "option": {"format": "sitemap"},
            }
        )
    )
    rows = cat.query_sql(
        "SELECT loc FROM seeds WHERE priority IS NOT NULL"
    ).collect()
    assert [r["loc"] for r in rows] == ["https://x.example.com/a?b=1&c=2"]


def test_robots_crawl_delay():
    """Crawl-delay extraction: group-scoped, specific-agent beats '*',
    first value in the winning group wins, garbage values ignored."""
    from roapi_spark.functions.web import robots_crawl_delay

    txt = (
        "User-agent: *\nCrawl-delay: 5\nDisallow: /x\n\n"
        "User-agent: trainbot\nCrawl-delay: nonsense\n"
        "Crawl-delay: 0.5\nCrawl-delay: 9\nDisallow:\n"
    )
    assert robots_crawl_delay(txt, "trainbot") == 0.5
    assert robots_crawl_delay(txt, "otherbot") == 5.0
    assert robots_crawl_delay("User-agent: *\nDisallow: /\n", "b") is None
