"""Sitemap source: the crawl seed-list format (sitemaps.org XML — the
public Sitemaps 0.9 protocol, same documentation standing as the CDXJ
and ISO 28500 specs the other crawl sources are pinned to).

One row per ``<url>`` entry: ``loc`` (required by the spec), optional
``lastmod`` / ``changefreq`` / ``priority``, plus the source file. The
five predefined XML entities the spec requires escaping (``&amp;``
``&lt;`` ``&gt;`` ``&apos;`` ``&quot;``) are decoded, so a ``loc``
carrying a query string round-trips exactly.

Spark-first by construction: ``spark.read.text(wholetext)`` (one row
per file, .gz-transparent, file-parallel — a sitemap file is spec-
capped at 50k URLs / 50 MB, so whole-file rows are bounded by the
format itself) -> codegen'd ``</url>`` split + explode ->
``regexp_extract`` per field, all TOTAL expressions (absent optional
fields are NULL, never an error). No Python in the path.

Sitemap INDEX files (``<sitemapindex>`` roots, the spec's sharding
mechanism) are followed one level: index files are spec-bounded (50k
``<loc>`` entries), so the driver reads just the index bytes, resolves
each referenced sitemap against the index file's directory, and the
distributed scan reads the union of referenced + directly-given urlset
files. Remote (http) locs in a local index are rejected loudly rather
than silently skipped.
"""

from __future__ import annotations

import gzip
import os
import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from roapi_spark.config import TableSource


class SitemapFormatError(RuntimeError):
    pass


SCHEMA = (
    "loc string, lastmod string, changefreq string, priority double, "
    "sitemap_file string"
)

_LOC_IN_INDEX = re.compile(r"<loc>\s*([^<]+?)\s*</loc>")


def _read_head(path: str, n: int = 4096) -> bytes:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        return f.read(n)


def _read_all(path: str) -> str:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        return f.read().decode("utf-8")


def _xml_unescape(c: Column) -> Column:
    """The spec's five predefined entities, innermost-last so escaped
    ampersands in entity names don't double-decode."""
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&apos;", "'"),
        ("&quot;", '"'),
        ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def resolve_files(uri: str, glob: str = "*.xml*") -> list[str]:
    """Expand the source uri to the urlset files to scan: directories
    list by glob; sitemapindex files (classified by their root element,
    never the name) are followed one level, locs resolved against the
    index file's own directory."""
    import fnmatch

    if os.path.isdir(uri):
        paths = sorted(
            os.path.join(uri, n)
            for n in os.listdir(uri)
            if fnmatch.fnmatch(n, glob)
            and not n.startswith((".", "_"))
            and os.path.isfile(os.path.join(uri, n))
        )
        if not paths:
            raise SitemapFormatError(f"no {glob!r} files under {uri}")
    elif os.path.isfile(uri):
        paths = [uri]
    else:
        raise SitemapFormatError(f"sitemap source not found: {uri}")

    out: list[str] = []
    for p in paths:
        head = _read_head(p)
        if b"<sitemapindex" in head:
            base = os.path.dirname(p)
            for loc in _LOC_IN_INDEX.findall(_read_all(p)):
                if loc.startswith(("http://", "https://")):
                    raise SitemapFormatError(
                        f"{p}: remote sitemap loc {loc!r} — fetch it to "
                        "local storage first (the http source path), a "
                        "local index must reference local files"
                    )
                child = os.path.normpath(os.path.join(base, loc))
                if not os.path.isfile(child):
                    raise SitemapFormatError(
                        f"{p}: referenced sitemap {loc!r} not found"
                    )
                out.append(child)
        elif b"<urlset" in head:
            out.append(p)
        else:
            raise SitemapFormatError(
                f"{p}: neither <urlset> nor <sitemapindex> root"
            )
    # an index and a direct glob may both name a file; scan it once
    return sorted(dict.fromkeys(out))


def parse_sitemap_content(
    raw: DataFrame, content_col: str = "value", file_col: str = "sitemap_file"
) -> DataFrame:
    """Shared urlset parse — the batch source and the streaming seed
    stream both route whole-file rows through this, so the two can
    never drift. Every expression is total per row (absent optional
    fields are NULL, never errors)."""
    frag = raw.select(
        F.explode(F.split(F.col(content_col), "</url>")).alias("u"),
        F.col(file_col).alias("sitemap_file"),
    ).filter(F.col("u").contains("<url>"))

    def field(tag: str) -> Column:
        got = F.regexp_extract(
            F.col("u"), f"<{tag}>\\s*((?s:.*?))\\s*</{tag}>", 1
        )
        return F.when(got != "", _xml_unescape(got))

    loc = field("loc")
    return frag.select(
        loc.alias("loc"),
        field("lastmod").alias("lastmod"),
        field("changefreq").alias("changefreq"),
        field("priority").cast("double").alias("priority"),
        "sitemap_file",
    ).filter(F.col("loc").isNotNull())


def parse_sitemap_files(spark: SparkSession, files: list[str]) -> DataFrame:
    # NB: the wholetext kwarg, not .option("wholetext", ...) — the
    # option spelling is silently ignored by DataFrameReader.text here
    raw = (
        spark.read.text(files, wholetext=True)
        .select(
            "value",
            F.element_at(
                F.split(F.input_file_name(), "/"), -1
            ).alias("sitemap_file"),
        )
    )
    return parse_sitemap_content(raw)


def to_dataframe(spark: SparkSession, ts: TableSource) -> DataFrame:
    files = resolve_files(ts.uri, str(ts.option.get("glob", "*.xml*")))
    return parse_sitemap_files(spark, files)
