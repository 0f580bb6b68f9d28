"""CDX(J) crawl-index source: the per-URL sidecar index real crawls
query instead of scanning archives.

Common Crawl / pywb ship one CDXJ line per captured URL:

    com,example)/path 20260101000000 {"url": "https://example.com/path",
        "mime": "text/html", "status": "200", "digest": "sha1:..",
        "length": "1043", "offset": "1208", "filename": "x.warc.gz"}

i.e. a SURT-sorted key, a 14-digit fetch timestamp, and a JSON blob
(format reference: the pywb CDXJ spec / Common Crawl cc-index docs —
public documentation, same standing as the WARC ISO spec for
sources/warc.py; roapi has no crawl surface at all).

Spark-first by construction: the whole parse is COMPOSED BUILT-INS —
``spark.read.text`` (splittable, .gz-transparent, partition-parallel)
-> two codegen'd splits -> ``from_json`` in FAILFAST mode (a malformed
JSON blob fails the scan loudly, the repo's source convention) -> typed
casts. No Python in the path, so at 100 TB the index scan
whole-stage-codegens and the (surt_key / url / digest) columns are
immediately usable as shuffle keys for dedup and page-set joins; a
``WHERE status = 200`` lands on the text scan as a post-parse filter
(CDX gives no pushdown below the line level — its contract is being
~1000x smaller than the archives it indexes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from roapi_spark.config import TableSource

SCHEMA = (
    "surt_key string, fetch_ts string, url string, mime string, "
    "status int, digest string, length bigint, offset bigint, "
    "warc_filename string"
)

_JSON_SCHEMA = (
    "url string, mime string, status string, digest string, "
    "length string, offset string, filename string"
)


def parse_cdx_lines(
    lines: DataFrame,
    value_col: str = "value",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Shared CDXJ line parse — the batch text source and the streaming
    index-fetch path (whole index shards split into lines) both route
    through this, so the two can never drift. Tolerates blank lines and
    legacy OpenWayback ' CDX ...' header lines (classic-format headers
    start with a space, per the CDX file-format docs); everything else
    must parse or the scan fails: a truncated line is rewritten to a
    self-describing non-JSON sentinel, so FAILFAST from_json rejects
    both malformed blobs and short lines.

    Every expression here is TOTAL per row (the only fallible pieces
    live inside CASE branches, which Catalyst's common-subexpression
    elimination never hoists): when a caller's downstream filter merges
    with the skip-blank filter, eager CSE evaluation over skipped lines
    must not be able to throw — found the hard way with ANSI
    element_at under a merged predicate."""
    v = F.col(value_col)
    # skipped chatter: blanks, legacy OpenWayback ' CDX ...' headers,
    # and '!'-prefixed CDXJ metadata lines (cdxj-indexer writes e.g.
    # '!meta 0 {...}' at the top of a shard — format metadata, not a
    # capture; its ts field would crash day-based consumers)
    clean = F.when(
        (F.trim(v) != "")
        & (~v.startswith(" CDX"))
        & (~v.startswith("!")),
        v,
    )
    parts = F.split(clean, " ", 3)
    blob = (
        F.when(clean.isNull(), F.lit(None))
        .when(F.size(parts) == 3, F.element_at(parts, 3))
        .otherwise(F.lit('__TRUNCATED_CDX_LINE__ (fewer than 3 fields)'))
    )
    parsed = lines.select(
        F.try_element_at(parts, F.lit(1)).alias("surt_key"),
        F.try_element_at(parts, F.lit(2)).alias("fetch_ts"),
        F.from_json(blob, _JSON_SCHEMA, {"mode": "FAILFAST"}).alias("j"),
        *passthrough,
    ).filter(F.col("surt_key").isNotNull())
    return parsed.select(
        *passthrough,
        "surt_key",
        "fetch_ts",
        F.col("j.url").alias("url"),
        F.col("j.mime").alias("mime"),
        F.col("j.status").cast("int").alias("status"),
        F.col("j.digest").alias("digest"),
        F.col("j.length").cast("bigint").alias("length"),
        F.col("j.offset").cast("bigint").alias("offset"),
        F.col("j.filename").alias("warc_filename"),
    )


def to_dataframe(spark: SparkSession, ts: TableSource) -> DataFrame:
    reader = spark.read
    glob = ts.option.get("glob")
    if glob:  # index files living next to the archives they point into
        reader = reader.option("pathGlobFilter", str(glob))
    return parse_cdx_lines(reader.text(ts.uri))
