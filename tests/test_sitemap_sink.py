"""Sitemap sink unit gates: spec caps fail loudly, entities
round-trip, gzip-per-shard mixing, deterministic retry bytes."""

from __future__ import annotations

import gzip
import os

import pytest

import roapi_spark.sinks.sitemap as sm
from roapi_spark.sinks.sitemap import (
    SitemapSinkError,
    write_sitemap,
    write_sitemap_index,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows,
        "loc string, lastmod string, changefreq string, "
        "priority double, shard int",
    )


def test_write_read_mixed_gzip_and_escape(spark, tmp_path):
    out = str(tmp_path / "maps")
    rows = [
        ("https://x.example/a?q=1&r=<2>", None, None, None, 0),
        ("https://x.example/b", "2026-01-02", "daily", 0.5, 0),
        ("https://x.example/c", None, "never", None, 1),
    ]
    man = {
        r["sitemap_file"]: r
        for r in write_sitemap(
            _df(spark, rows), out, gzip_shards={1}
        ).collect()
    }
    assert set(man) == {"urlset-0.xml", "urlset-1.xml.gz"}
    assert man["urlset-0.xml"]["n_urls"] == 2
    body = gzip.decompress(
        (tmp_path / "maps" / "urlset-1.xml.gz").read_bytes()
    ).decode()
    assert "<loc>https://x.example/c</loc>" in body
    raw = (tmp_path / "maps" / "urlset-0.xml").read_text()
    assert "q=1&amp;r=&lt;2&gt;" in raw  # escaped on disk
    # read back through the source: entities decoded, fields typed
    from roapi_spark.config import TableSource
    from roapi_spark.sources import load_table

    idx = write_sitemap_index(out, list(man))
    back = load_table(
        spark, TableSource(name="t", uri=idx, format="sitemap")
    )
    got = {r["loc"]: r for r in back.collect()}
    assert set(got) == {r[0] for r in rows}
    assert got["https://x.example/b"]["priority"] == 0.5
    assert got["https://x.example/a?q=1&r=<2>"]["lastmod"] is None


def test_caps_fail_loudly(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(sm, "_MAX_URLS", 2)
    df = _df(
        spark,
        [(f"https://x.example/{i}", None, None, None, 0) for i in range(3)],
    )
    with pytest.raises(Exception) as ei:
        write_sitemap(df, str(tmp_path / "o")).collect()
    assert "cap" in str(ei.value)
    monkeypatch.setattr(sm, "_MAX_URLS", 50_000)
    monkeypatch.setattr(sm, "_MAX_BYTES", 64)
    with pytest.raises(Exception) as ei:
        write_sitemap(df, str(tmp_path / "o2")).collect()
    assert "byte" in str(ei.value)


def test_null_loc_and_missing_column(spark, tmp_path):
    with pytest.raises(SitemapSinkError):
        write_sitemap(
            spark.createDataFrame([(1,)], "shard int"), str(tmp_path / "x")
        )
    df = _df(spark, [(None, None, None, None, 0)])
    with pytest.raises(Exception) as ei:
        write_sitemap(df, str(tmp_path / "y")).collect()
    assert "null loc" in str(ei.value)


def test_retry_bytes_deterministic(spark, tmp_path):
    rows = [
        (f"https://x.example/{i}", None, None, None, 0)
        for i in (3, 1, 2)
    ]
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    # reversed input order must land identical bytes (entries sorted)
    write_sitemap(_df(spark, rows), out1).collect()
    write_sitemap(_df(spark, rows[::-1]), out2).collect()
    b1 = open(os.path.join(out1, "urlset-0.xml"), "rb").read()
    b2 = open(os.path.join(out2, "urlset-0.xml"), "rb").read()
    assert b1 == b2
