"""Web-ingestion primitives (functions/web.py): HTML main-text
extraction (chrome stripping + link-density heuristic) and URL
canonicalization / registrable-domain expressions. The Spark-expression
paths are asserted against literal expectations here; their DuckDB
mirrors are asserted by the pipeline14 oracle gates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from roapi_spark.functions.web import (
    canonical_url,
    extract_main_text,
    registrable_domain,
)


class TestExtractMainText:
    def test_drops_chrome_containers(self):
        html = (
            "<html><head><title>T</title><style>a{}</style>"
            "<script>var x=1;</script></head><body>"
            "<nav><a href='/'>Home</a></nav>"
            "<header><h1>Heading</h1></header>"
            "<main><p>Real content here.</p></main>"
            "<footer>legal</footer></body></html>"
        )
        assert extract_main_text(html) == "Real content here."

    def test_link_dense_block_dropped(self):
        html = (
            "<body><div><a href='/1'>One</a> <a href='/2'>Two</a></div>"
            "<p>Body text that is not navigation.</p></body>"
        )
        assert extract_main_text(html) == "Body text that is not navigation."

    def test_half_link_block_kept(self):
        # exactly at the 0.5 boundary: kept (<=)
        html = "<body><p>abcd <a href='/x'>wxyz</a></p></body>"
        assert extract_main_text(html) == "abcd wxyz"

    def test_entities_unescaped_and_whitespace_normalized(self):
        html = "<body><p>a &amp; b\n\t &lt;c&gt;</p></body>"
        assert extract_main_text(html) == "a & b <c>"

    def test_multiple_blocks_joined(self):
        html = "<body><p>First para.</p><p>Second para.</p></body>"
        assert extract_main_text(html) == "First para. Second para."

    def test_unclosed_tags_tolerated(self):
        html = "<body><p>open paragraph<div>and a div"
        assert extract_main_text(html) == "open paragraph and a div"


URL_CASES = [
    # (raw, canonical)
    ("https://Example.COM/a", "https://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://example.com", "https://example.com/"),
    ("https://example.com/a/b/", "https://example.com/a/b"),
    ("https://example.com/a#frag", "https://example.com/a"),
    (
        "https://example.com/a?b=2&a=1",
        "https://example.com/a?a=1&b=2",
    ),
    (
        "https://example.com/a?utm_source=x&a=1&gclid=g&fbclid=f",
        "https://example.com/a?a=1",
    ),
    (
        "https://example.com/a?utm_source=x",
        "https://example.com/a",
    ),
]


@pytest.mark.parametrize("raw, want", URL_CASES)
def test_canonical_url(spark, raw, want):
    df = spark.createDataFrame([(raw,)], "u string").select(
        canonical_url(F.col("u")).alias("c")
    )
    assert df.first()["c"] == want


DOMAIN_CASES = [
    ("news.example.com", "example.com"),
    ("example.com", "example.com"),
    ("a.b.c.example.org", "example.org"),
    ("blog.example.co.uk", "example.co.uk"),
    ("www.example.com.au", "example.com.au"),
    ("couk.example.net", "example.net"),  # suffix match is anchored
]


def test_registrable_domain(spark):
    df = spark.createDataFrame(
        [(h,) for h, _ in DOMAIN_CASES], "h string"
    ).select("h", registrable_domain(F.col("h")).alias("d"))
    got = {r["h"]: r["d"] for r in df.collect()}
    assert got == dict(DOMAIN_CASES)


class TestRobots:
    """RFC 9309 parsing + most-specific-wins matching."""

    TXT = (
        "# policy\n"
        "User-agent: *\n"
        "Disallow: /\n"
        "\n"
        "User-agent: trainbot\n"
        "User-agent: otherbot\n"
        "Allow: /\n"
        "Disallow: /private\n"
        "Allow: /private/pub*.html$\n"
        "Disallow: /*.zip$\n"
        "Disallow:\n"  # empty pattern = no rule
    )

    def _rules(self, ua="trainbot"):
        from roapi_spark.functions.web import parse_robots

        return parse_robots(self.TXT, ua)

    def test_group_selection_specific_beats_wildcard(self):
        rules = self._rules()
        assert (True, "/") in rules  # from the trainbot group
        assert (False, "/") not in rules  # '*' group not merged in

    def test_multi_ua_group_and_case_insensitive(self):
        from roapi_spark.functions.web import parse_robots

        assert parse_robots(self.TXT, "OtherBot") == self._rules()

    def test_unknown_ua_falls_back_to_wildcard(self):
        from roapi_spark.functions.web import parse_robots, robots_allowed

        rules = parse_robots(self.TXT, "strangerbot")
        assert rules == [(False, "/")]
        assert not robots_allowed("/anything", rules)

    @pytest.mark.parametrize(
        "path, want",
        [
            ("/index.html", True),  # Allow: /
            ("/private/a", False),  # Disallow: /private (prefix)
            ("/privateer", False),  # prefix matches mid-token too
            ("/private/pub1.html", True),  # longer allow re-allows
            ("/private/pub1.html.bak", False),  # $ anchor must not match
            ("/data.zip", False),  # wildcard + anchor
            ("/data.zip.txt", True),  # anchored: suffix only
        ],
    )
    def test_matching(self, path, want):
        from roapi_spark.functions.web import robots_allowed

        assert robots_allowed(path, self._rules()) is want

    def test_allow_wins_length_ties(self):
        from roapi_spark.functions.web import robots_allowed

        rules = [(False, "/a/b"), (True, "/a/c"), (True, "/a/b"), (False, "/a/c")]
        assert robots_allowed("/a/b", rules)
        assert robots_allowed("/a/c", rules)

    def test_column_matcher_agrees_with_reference(self, spark):
        from pyspark.sql import functions as F

        from roapi_spark.functions.web import (
            robots_allowed,
            robots_allowed_col,
        )

        rules = self._rules()
        paths = [
            "/", "/index.html", "/private", "/private/", "/privateer",
            "/private/pub.html", "/private/pubX.html", "/x/data.zip",
            "/x/data.zip/y", "/a.zip", "/.zip",
        ]
        df = spark.createDataFrame([(p,) for p in paths], "p string").select(
            "p", robots_allowed_col(F.col("p"), rules).alias("ok")
        )
        got = {r["p"]: r["ok"] for r in df.collect()}
        assert got == {p: robots_allowed(p, rules) for p in paths}


class TestDecodeHttpText:
    def test_charset_variants(self):
        from roapi_spark.functions.web import decode_http_text

        assert decode_http_text(b"abc", "text/html") == "abc"
        assert decode_http_text(b"abc", None) == "abc"
        assert (
            decode_http_text(
                "café".encode("cp1252"), "text/html; charset=iso-8859-1"
            )
            == "café"
        )
        assert (
            decode_http_text(
                "héllo".encode("utf-16le"), 'text/html; charset="utf-16le"'
            )
            == "héllo"
        )

    def test_fail_closed(self):
        from roapi_spark.functions.web import decode_http_text

        # invalid bytes under the declared charset
        assert decode_http_text(b"\xff\xfe\x00ab", "text/html; charset=utf-8") is None
        # unknown charset
        assert decode_http_text(b"abc", "text/html; charset=shift_jis") is None


def test_rule_free_specific_group_overrides_wildcard():
    """RFC 9309: a group NAMING the crawler — even with only empty
    Disallow lines — overrides the '*' group entirely."""
    from roapi_spark.functions.web import parse_robots, robots_allowed

    txt = "User-agent: mybot\nDisallow:\n\nUser-agent: *\nDisallow: /\n"
    rules = parse_robots(txt, "mybot")
    assert rules == []
    assert robots_allowed("/anything", rules)


def test_robots_sql_escapes_quotes():
    import duckdb

    from roapi_spark.functions.web import robots_allowed, robots_allowed_sql

    rules = [(False, "/o'brien"), (True, "/")]
    sql = robots_allowed_sql("p", rules)
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {sql} FROM (VALUES ('/o''brien/x'), ('/ok')) t(p)"
    ).fetchall()
    assert [bool(r[0]) for r in got] == [
        robots_allowed("/o'brien/x", rules),
        robots_allowed("/ok", rules),
    ]
