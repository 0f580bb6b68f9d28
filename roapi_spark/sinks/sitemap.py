"""Sitemap sink: write URL rows as sitemaps.org urlset shards + index.

The write half of the seed-list round trip (``sources/sitemap.py`` is
the read half; format per the public Sitemaps 0.9 protocol — the same
documentation standing as the CDXJ / ISO 28500 specs the other crawl
sinks are pinned to). A crawl publishes its page inventory this way;
re-reading it through the sitemap source closes write -> read with no
external tooling, exactly like the WARC/CDX/WET/WAT sinks.

Layout contract (shared with the other sinks): ONE urlset file per
value of the caller-supplied shard column — ``groupBy(shard) ->
applyInPandas`` means one task materializes one file, memory bounded
by the shard the caller sized. The spec's own caps (50,000 ``<url>``
entries / 50 MB uncompressed per file, sitemaps.org protocol) are
ENFORCED per shard and violations fail loudly — silently emitting an
over-cap file would produce output conforming readers may refuse.
Files publish tmp+rename with deterministic bytes (entries sorted by
loc), so task retries/speculation re-land identical files.

The index file (``<sitemapindex>``, the spec's sharding mechanism) is
one tiny file listing the shard names — written driver-side by
``write_sitemap_index`` from the collected manifest (shard-cardinality
rows, never corpus rows; the spec caps an index at 50k entries, so the
manifest is bounded by the format itself).

Expected columns: ``loc`` (string, required), optional ``lastmod`` /
``changefreq`` (strings) and ``priority`` (double). The five
predefined XML entities are escaped on write, so a loc carrying a
query string round-trips exactly through the source's decode.
"""

from __future__ import annotations

import gzip
import os
from collections.abc import Container

from pyspark.sql import DataFrame

_MAX_URLS = 50_000
_MAX_BYTES = 50 * 1024 * 1024

_XMLNS = "http://www.sitemaps.org/schemas/sitemap/0.9"


class SitemapSinkError(RuntimeError):
    pass


def _xml_escape(s: str) -> str:
    """The spec's five predefined entities, '&' first so entity
    ampersands aren't double-encoded (mirror of the source's
    innermost-last decode)."""
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace("'", "&apos;")
        .replace('"', "&quot;")
    )


def write_sitemap(
    df: DataFrame,
    out_dir: str,
    shard_col: str = "shard",
    prefix: str = "urlset",
    gzip_shards: bool | Container[int] = False,
) -> DataFrame:
    """One urlset file per ``shard_col`` value; returns the lazy
    manifest (sitemap_file, n_urls, n_bytes — n_bytes is the
    UNCOMPRESSED body size the spec's 50 MB cap measures).

    ``gzip_shards``: True compresses every shard, a container
    compresses the shard ids it holds (mixed fleets are normal — the
    spec allows .gz per file, and readers sniff per file)."""
    os.makedirs(out_dir, exist_ok=True)
    cols = set(df.columns)
    if "loc" not in cols:
        raise SitemapSinkError("sitemap sink requires a 'loc' column")
    has = {c: c in cols for c in ("lastmod", "changefreq", "priority")}

    def writer(pdf):
        import pandas as pd

        shard = int(pdf[shard_col].iloc[0])
        use_gz = (
            gzip_shards is True
            or (gzip_shards is not False and shard in gzip_shards)
        )
        name = f"{prefix}-{shard}.xml" + (".gz" if use_gz else "")
        if len(pdf) > _MAX_URLS:
            raise SitemapSinkError(
                f"{name}: {len(pdf)} urls exceeds the spec's "
                f"{_MAX_URLS}-entry cap — size shards smaller"
            )
        entries = []
        for r in pdf.itertuples(index=False):
            if r.loc is None:
                raise SitemapSinkError(f"{name}: null loc")
            e = ["  <url>\n    <loc>", _xml_escape(str(r.loc)), "</loc>\n"]
            if has["lastmod"] and r.lastmod is not None:
                e += ["    <lastmod>", _xml_escape(str(r.lastmod)),
                      "</lastmod>\n"]
            if has["changefreq"] and r.changefreq is not None:
                e += ["    <changefreq>", _xml_escape(str(r.changefreq)),
                      "</changefreq>\n"]
            if has["priority"] and r.priority is not None and not (
                isinstance(r.priority, float) and r.priority != r.priority
            ):
                e += ["    <priority>", f"{float(r.priority):.1f}",
                      "</priority>\n"]
            e.append("  </url>\n")
            entries.append("".join(e))
        entries.sort()  # deterministic bytes across retries
        body = (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            f'<urlset xmlns="{_XMLNS}">\n' + "".join(entries) + "</urlset>\n"
        ).encode("utf-8")
        if len(body) > _MAX_BYTES:
            raise SitemapSinkError(
                f"{name}: {len(body)} bytes exceeds the spec's "
                f"{_MAX_BYTES}-byte cap — size shards smaller"
            )
        final = os.path.join(out_dir, name)
        tmp = os.path.join(out_dir, f".{name}.tmp-{os.getpid()}")
        with open(tmp, "wb") as f:
            f.write(gzip.compress(body, mtime=0) if use_gz else body)
        os.replace(tmp, final)
        return pd.DataFrame(
            [{"sitemap_file": name, "n_urls": len(pdf),
              "n_bytes": len(body)}]
        )

    return df.groupBy(shard_col).applyInPandas(
        writer, "sitemap_file string, n_urls bigint, n_bytes bigint"
    )


def write_sitemap_index(
    out_dir: str,
    shard_files: list[str],
    index_name: str = "sitemap-index.xml",
) -> str:
    """The one tiny ``<sitemapindex>`` file referencing the shards —
    driver-side by design (shard-cardinality input, spec-capped at 50k
    entries); tmp+rename like the shards."""
    if len(shard_files) > _MAX_URLS:
        raise SitemapSinkError(
            f"{index_name}: {len(shard_files)} sitemaps exceeds the "
            f"spec's {_MAX_URLS}-entry index cap — nest another level"
        )
    body = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        f'<sitemapindex xmlns="{_XMLNS}">\n'
        + "".join(
            f"  <sitemap><loc>{_xml_escape(n)}</loc></sitemap>\n"
            for n in sorted(shard_files)
        )
        + "</sitemapindex>\n"
    )
    final = os.path.join(out_dir, index_name)
    tmp = os.path.join(out_dir, f".{index_name}.tmp-{os.getpid()}")
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(body)
    os.replace(tmp, final)
    return final
