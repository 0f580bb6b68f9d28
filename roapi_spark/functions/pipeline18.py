"""Round-14 gates: closing the two write-side holes the round-13
verdict ranked highest after the crawl toolchain shipped —

* ``q_sitemap_roundtrip`` — the DISTRIBUTED sitemap sink
  (sinks/sitemap.py: one task per urlset shard, sitemaps.org 50k/50 MB
  caps enforced per shard, tmp+rename publish) written from the
  documents table and read back through the sitemap SOURCE via the
  generated ``<sitemapindex>``, so write -> index -> read closes for
  the seed-list format exactly like WARC/CDX/WET/WAT already do.
* ``q_cdx_merge`` — the cc-index maintenance step
  (sinks/cdx.merge_cdx): two crawl rounds each land archives + their
  own CDXJ shards; the master index merges them with latest-capture
  dedup, and the gate proves pointer fetch-back through the MERGED
  index is byte-identical to fetching through the per-round originals.

Reference parity anchor: roapi serves static corpora (columnq-cli
reads tables; no crawl write-side exists there) — these gates extend
the repo's own crawl toolchain, with the same oracle discipline as
every SURVEY §2 row.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from roapi_spark.plans.registry import register

# Spark-side twin of pipeline16._SITEMAP_URL_SQL's plain-url core:
# one capture URL per document, unique per doc_id
_CAP_URL_EXPR = (
    "'https://crawl.example.com/' || source || '/'"
    " || CAST(doc_id AS STRING)"
)
_CAP_URL_SQL = (
    "'https://crawl.example.com/' || source || '/'"
    " || CAST(doc_id AS VARCHAR)"
)

_R1_DATE = "2026-01-01T00:00:00Z"
_R2_DATE = "2026-02-01T00:00:00Z"
_R2_TS = "20260201000000"


# ---- q_sitemap_roundtrip ----------------------------------------------------


@register(
    "q_sitemap_roundtrip",
    oracle="""
    WITH u AS (SELECT doc_id FROM documents)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(*) AS BIGINT) AS n_locs,
           CAST(COUNT(DISTINCT doc_id % 3) AS BIGINT) AS n_files,
           CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_lastmod,
           CAST(SUM(CASE WHEN doc_id % 3 <> 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changefreq,
           CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN doc_id % 10 ELSE 0 END)
                AS BIGINT) AS sum_priority10,
           CAST(COUNT(*) AS BIGINT) AS n_manifest_urls,
           CAST(COUNT(DISTINCT doc_id % 3) AS BIGINT) AS n_manifest_files
    FROM u
    """,
    doc="Sitemap WRITE side round trip — the seed-list format's "
    "write -> read closure (round-13 verdict Missing #2: every other "
    "crawl format closed both directions, sitemaps only read): url "
    "rows from the documents table land as three urlset shards (one "
    "gzipped) through the DISTRIBUTED sink — groupBy(shard) -> "
    "applyInPandas, ONE task per file, the spec's 50k-URL/50 MB caps "
    "enforced per shard with loud failure, entries sorted for "
    "deterministic retry bytes, tmp+rename publish — plus the "
    "driver-side shard-cardinality <sitemapindex>; the sitemap SOURCE "
    "then re-reads the set THROUGH that index (root-element "
    "classification, one-level follow) and every optional-field "
    "residue must survive the XML escape/unescape round trip. The "
    "sink manifest's totals are cross-checked against the read-back "
    "as separate columns. Plan: corpus rows never route through the "
    "driver (the old fixture builder's collect() is deleted in favor "
    "of this sink); at 100 TB a crawl publishes its page inventory "
    "exactly this way — shard count scales with corpus, file sizes "
    "stay spec-bounded.",
    tags=("web", "gate", "sink"),
)
def q_sitemap_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from roapi_spark.config import TableSource
    from roapi_spark.functions.pipeline16 import _sitemap_entries
    from roapi_spark.sinks.sitemap import write_sitemap, write_sitemap_index
    from roapi_spark.sources import load_table

    out = tempfile.mkdtemp(prefix="sitemap_sink_gate_")
    atexit.register(shutil.rmtree, out, ignore_errors=True)
    manifest = write_sitemap(
        _sitemap_entries(spark, sf_dir), out, gzip_shards={0}
    ).cache()
    write_sitemap_index(
        out, [r["sitemap_file"] for r in manifest.collect()]
    )
    back = load_table(
        spark,
        TableSource(
            name="_sm_rt",
            uri=os.path.join(out, "sitemap-index.xml"),
            format="sitemap",
        ),
    )
    agg = back.agg(
        F.count("*").cast("bigint").alias("n_urls"),
        F.count_distinct("loc").cast("bigint").alias("n_locs"),
        F.count_distinct("sitemap_file").cast("bigint").alias("n_files"),
        F.count("lastmod").cast("bigint").alias("n_lastmod"),
        F.count("changefreq").cast("bigint").alias("n_changefreq"),
        F.sum(F.coalesce((F.col("priority") * 10).cast("bigint"), F.lit(0)))
        .cast("bigint")
        .alias("sum_priority10"),
    )
    man = manifest.agg(
        F.sum("n_urls").cast("bigint").alias("n_manifest_urls"),
        F.count("*").cast("bigint").alias("n_manifest_files"),
    )
    return agg.crossJoin(F.broadcast(man)).select(
        "n_urls", "n_locs", "n_files", "n_lastmod", "n_changefreq",
        "sum_priority10", "n_manifest_urls", "n_manifest_files",
    )


# ---- q_cdx_merge ------------------------------------------------------------


def _round_captures(
    spark: SparkSession, sf_dir: str, version: str, date: str,
    residue_filter: str | None = None,
) -> DataFrame:
    """One capture row per document (optionally residue-filtered):
    deterministic payload '{version}|{doc_id}|{source}' so byte
    identity between fetch paths is checkable without storing bytes."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    if residue_filter:
        docs = docs.filter(F.expr(residue_filter))
    return docs.selectExpr(
        f"{_CAP_URL_EXPR} AS target_uri",
        f"encode('{version}|' || CAST(doc_id AS STRING) || '|' || source,"
        " 'UTF-8') AS payload",
        "CAST(200 AS INT) AS http_status",
        "'text/plain' AS http_content_type",
        f"'{date}' AS warc_date",
        "CAST(doc_id % 2 AS INT) AS shard",
    )


def _two_round_crawl_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build-once two-round crawl fixture for the merge gate: round-1
    archives over every document (v1 payloads), round-2 re-fetch of
    the doc_id%7==1 residue (v2 payloads, newer date), each round
    indexed from raw bytes and written as its own CDXJ shard set —
    all through the real sinks, one task per file. Cached like every
    other fixture (keyed on the documents parquet), so per-serve work
    is the OPERATOR under test (merge + fetch-back), not the setup;
    write_warc/index_warc/write_cdx stay per-serve-exercised by
    q_warc_dedup_export and q_cdx_index_roundtrip."""
    from roapi_spark.functions.snapshot import build_once, snapshot_cache_dir
    from roapi_spark.sinks.cdx import index_warc, write_cdx
    from roapi_spark.sinks.warc import write_warc

    src = os.path.join(sf_dir, "documents.parquet")
    out = snapshot_cache_dir(src, "cdxmerge-v1")

    def ready(d: str) -> bool:
        return all(
            os.path.isdir(os.path.join(d, n))
            for n in ("archives", "idx_r1", "idx_r2")
        )

    def build(tmp: str) -> None:
        arch = os.path.join(tmp, "archives")
        write_warc(
            _round_captures(spark, sf_dir, "v1", _R1_DATE), arch,
            prefix="r1",
        ).count()
        write_warc(
            _round_captures(
                spark, sf_dir, "v2", _R2_DATE,
                residue_filter="doc_id % 7 = 1",
            ),
            arch,
            prefix="r2",
        ).count()
        for rnd in ("r1", "r2"):
            ptrs = index_warc(spark, arch, glob=f"{rnd}-*.warc*")
            write_cdx(
                ptrs.withColumn(
                    "shard", F.pmod(F.crc32(F.col("surt_key")), F.lit(2))
                ),
                os.path.join(tmp, f"idx_{rnd}"),
            ).count()

    return build_once(out, ready, build)


@register(
    "q_cdx_merge",
    oracle=f"""
    WITH d AS (SELECT doc_id FROM documents),
    r2 AS (SELECT doc_id FROM d WHERE doc_id % 7 = 1)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_master,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_surt,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM d)
             + (SELECT CAST(COUNT(*) AS BIGINT) FROM r2) AS n_hist,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM r2) AS n_r2_latest,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM r2) AS n_fetched,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM r2) AS n_byte_match
    """,
    doc="CDX shard MERGE — the cc-index maintenance step (round-13 "
    "verdict Missing #3; pywb's cdx-indexer + sort-merge is the tool "
    "shape): two crawl rounds land real archives through the WARC "
    "sink (round 2 re-fetches the doc_id%7==1 residue with a newer "
    "date and different bytes), each round is indexed from raw bytes "
    "and written as its own SURT-sorted CDXJ shard set; "
    "sinks/cdx.merge_cdx then k-way merges the rounds into one "
    "master index — latest-capture-per-SURT for the recrawl-planner "
    "view (one window on the SURT key), full-history for "
    "wayback-style replay — bucketed crc32(surt)%N and re-sorted "
    "within shards, the same layout every index consumer in the repo "
    "probes. The gate FETCHES the round-2 subset through the MERGED "
    "index and through the per-round originals and counts "
    "byte-identical payloads — a wrong offset, length, or "
    "lost-update in the merge breaks exact framing or the equality. "
    "Plan: one distributed text scan over all rounds' shards, one "
    "window, one shuffle onto the output bucketing; at 100 TB the "
    "index is ~1000x smaller than the archives and this pass touches "
    "ONLY the index plus the fetched subset.",
    tags=("web", "gate", "sink"),
)
def q_cdx_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from roapi_spark.config import TableSource
    from roapi_spark.sinks.cdx import merge_cdx
    from roapi_spark.sources import load_table
    from roapi_spark.sources.warc import fetch_records

    fixture = _two_round_crawl_dir(spark, sf_dir)
    arch = os.path.join(fixture, "archives")
    idx = {r: os.path.join(fixture, f"idx_{r}") for r in ("r1", "r2")}
    root = tempfile.mkdtemp(prefix="cdx_merge_gate_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)

    def _load(d: str) -> DataFrame:
        return load_table(
            spark, TableSource(name="_m", uri=d, format="cdx")
        )

    # both merges (latest-only master + full history) consume the SAME
    # two rounds' shards: parse the pointer lines once and persist the
    # index-sized rows for the duration of the two merges (guide §5 —
    # reuse instead of recompute; was two full text-scan+parse passes)
    parsed = _load(idx["r1"]).unionByName(_load(idx["r2"])).persist()
    try:
        master_dir = os.path.join(root, "master")
        merge_cdx(
            spark, [idx["r1"], idx["r2"]], master_dir,
            n_shards=4, latest_only=True, source_df=parsed,
        ).count()
        hist_dir = os.path.join(root, "hist")
        merge_cdx(
            spark, [idx["r1"], idx["r2"]], hist_dir,
            n_shards=4, latest_only=False, source_df=parsed,
        ).count()
    finally:
        parsed.unpersist()

    master = _load(master_dir)
    master_agg = master.agg(
        F.count("*").cast("bigint").alias("n_master"),
        F.count_distinct("surt_key").cast("bigint").alias("n_surt"),
        F.sum((F.col("fetch_ts") == _R2_TS).cast("bigint"))
        .cast("bigint")
        .alias("n_r2_latest"),
    )
    hist_agg = _load(hist_dir).agg(
        F.count("*").cast("bigint").alias("n_hist")
    )
    # byte identity: the round-2 subset fetched through the MERGED
    # index vs through round 2's ORIGINAL index
    via_master = fetch_records(
        master.filter(F.col("fetch_ts") == _R2_TS), arch
    ).select(F.col("ptr_url").alias("url"), F.col("payload").alias("pm"))
    via_orig = fetch_records(_load(idx["r2"]), arch).select(
        F.col("ptr_url").alias("url"), F.col("payload").alias("po")
    )
    fetch_agg = via_master.join(via_orig, "url").agg(
        F.count("*").cast("bigint").alias("n_fetched"),
        F.sum((F.col("pm") == F.col("po")).cast("bigint"))
        .cast("bigint")
        .alias("n_byte_match"),
    )
    return (
        master_agg.crossJoin(F.broadcast(hist_agg))
        .crossJoin(F.broadcast(fetch_agg))
        .select(
            "n_master", "n_surt", "n_hist", "n_r2_latest",
            "n_fetched", "n_byte_match",
        )
    )


# ---- q_cdx_prefix_scan -------------------------------------------------------


def _range_master_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build-once range-layout latest-capture master index over the
    two-round fixture — the cc-index/zipnum shape `read_cdx_prefix`
    prunes against. Cached so the per-serve work is the PRUNED SCAN
    under test, not the merge (which q_cdx_merge per-serve exercises)."""
    from roapi_spark.functions.snapshot import build_once, snapshot_cache_dir
    from roapi_spark.sinks.cdx import merge_cdx

    fixture = _two_round_crawl_dir(spark, sf_dir)
    src = os.path.join(sf_dir, "documents.parquet")
    out = snapshot_cache_dir(src, "cdxmaster-v1")

    def ready(d: str) -> bool:
        return os.path.exists(os.path.join(d, "_shards.idx"))

    def build(tmp: str) -> None:
        merge_cdx(
            spark,
            [os.path.join(fixture, f"idx_{r}") for r in ("r1", "r2")],
            tmp,
            n_shards=4,
            latest_only=True,
            layout="range",
        )

    return build_once(out, ready, build)


@register(
    "q_cdx_prefix_scan",
    oracle="""
    SELECT 'src1' AS probe,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_surt,
           CAST(1 AS BIGINT) AS pruned
    FROM documents WHERE source = 'src1'
    UNION ALL
    SELECT 'src7',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT doc_id) AS BIGINT),
           CAST(1 AS BIGINT)
    FROM documents WHERE source = 'src7'
    UNION ALL
    SELECT 'zz_absent', CAST(0 AS BIGINT), CAST(0 AS BIGINT),
           CAST(1 AS BIGINT)
    ORDER BY probe
    """,
    doc="Pruned prefix scan over the range-layout master index "
    "(sinks/cdx.read_cdx_prefix + the _shards.idx sidecar): two "
    "path-prefix probes must return exactly the fixture rows under "
    "that prefix (latest-capture master: one row per SURT) while "
    "opening STRICTLY FEWER shard files than the master holds, and a "
    "probe past every shard range must read ZERO files and return "
    "zero rows. `pruned` is computed from the same sidecar the scan "
    "plans with, so a pruning regression (sidecar ignored, bound "
    "wrong, stale ranges) flips it and hash-fails the gate. Scale: "
    "this is the 'open one file out of thousands' cc-index access "
    "path a 100 TB corpus index needs for per-domain analyses.",
    tags=("web", "gate", "sink"),
)
def q_cdx_prefix_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.sinks.cdx import _prefix_shard_files, read_cdx_prefix

    master = _range_master_dir(spark, sf_dir)
    with open(os.path.join(master, "_shards.idx"), encoding="utf-8") as f:
        n_shards_total = sum(1 for _ in f)
    probes = [
        ("src1", "com,example,crawl)/src1/"),
        ("src7", "com,example,crawl)/src7/"),
        ("zz_absent", "com,example,crawl)/zz"),
    ]
    out = None
    for label, pfx in probes:
        files = _prefix_shard_files(master, pfx)
        part = read_cdx_prefix(spark, master, pfx).agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.count_distinct("surt_key").cast("bigint").alias("n_surt"),
        ).select(
            F.lit(label).alias("probe"),
            "n_rows",
            "n_surt",
            F.lit(int(len(files) < n_shards_total))
            .cast("bigint")
            .alias("pruned"),
        )
        out = part if out is None else out.unionByName(part)
    return out.orderBy("probe")


# ---- q_cdx_zipnum_lookup -----------------------------------------------------


def _zipnum_master_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build-once ZIPNUM master (compressed-block cc-index layout) over
    the two-round fixture: 64-line blocks so the sf0.01 fixture yields
    several blocks per shard and pruning is actually exercised."""
    from roapi_spark.functions.snapshot import build_once, snapshot_cache_dir
    from roapi_spark.sinks.cdx import merge_cdx

    fixture = _two_round_crawl_dir(spark, sf_dir)
    src = os.path.join(sf_dir, "documents.parquet")
    out = snapshot_cache_dir(src, "cdxzipnum-v1")

    def ready(d: str) -> bool:
        return os.path.exists(os.path.join(d, "_cluster.idx"))

    def build(tmp: str) -> None:
        merge_cdx(
            spark,
            [os.path.join(fixture, f"idx_{r}") for r in ("r1", "r2")],
            tmp,
            n_shards=2,
            latest_only=True,
            layout="zipnum",
            block_lines=64,
        )

    return build_once(out, ready, build)


@register(
    "q_cdx_zipnum_lookup",
    oracle="""
    SELECT 'src1' AS probe,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_surt,
           CAST(1 AS BIGINT) AS pruned
    FROM documents WHERE source = 'src1'
    UNION ALL
    SELECT 'src7',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT doc_id) AS BIGINT),
           CAST(1 AS BIGINT)
    FROM documents WHERE source = 'src7'
    UNION ALL
    SELECT 'zz_absent', CAST(0 AS BIGINT), CAST(0 AS BIGINT),
           CAST(1 AS BIGINT)
    ORDER BY probe
    """,
    doc="ZIPNUM (compressed-block) master-index lookup — the "
    "production cc-index layout: shards are concatenated gzip members "
    "of N CDXJ lines, the _cluster.idx sidecar carries one row per "
    "block, and a prefix lookup seeks + decompresses ONLY the "
    "overlapping ~100 KB blocks executor-side (read_cdx_zipnum; the "
    "fetch_records pattern). Probes mirror q_cdx_prefix_scan so the "
    "two layouts are pinned to identical answers; `pruned` asserts "
    "strictly fewer blocks opened than the master holds. Scale: a "
    "point lookup touches one block regardless of corpus size, and "
    "the compressed master is ~1/8 the plaintext index's bytes.",
    tags=("web", "gate", "sink"),
)
def q_cdx_zipnum_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.sinks.cdx import _prefix_blocks, read_cdx_zipnum

    master = _zipnum_master_dir(spark, sf_dir)
    with open(os.path.join(master, "_cluster.idx"), encoding="utf-8") as f:
        n_blocks_total = sum(1 for _ in f)
    probes = [
        ("src1", "com,example,crawl)/src1/"),
        ("src7", "com,example,crawl)/src7/"),
        ("zz_absent", "com,example,crawl)/zz"),
    ]
    out = None
    for label, pfx in probes:
        opened = _prefix_blocks(master, pfx)
        part = read_cdx_zipnum(spark, master, pfx).agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.count_distinct("surt_key").cast("bigint").alias("n_surt"),
        ).select(
            F.lit(label).alias("probe"),
            "n_rows",
            "n_surt",
            F.lit(int(len(opened) < n_blocks_total))
            .cast("bigint")
            .alias("pruned"),
        )
        out = part if out is None else out.unionByName(part)
    return out.orderBy("probe")


# ---- q_cdx_asof_fetch --------------------------------------------------------


@register(
    "q_cdx_asof_fetch",
    oracle="""
    WITH d AS (SELECT doc_id FROM documents),
    r2 AS (SELECT doc_id FROM d WHERE doc_id % 7 = 1)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_mid,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_mid_v1,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM d)
             - (SELECT CAST(COUNT(*) AS BIGINT) FROM r2) AS n_late_v1,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM r2) AS n_late_v2,
           CAST(0 AS BIGINT) AS n_early
    """,
    doc="Wayback-style AS-OF replay through the full-history index "
    "(sinks/cdx.asof_snapshot): the latest capture per SURT with "
    "fetch_ts <= t, pywb's closest-before rule. Probed at three "
    "instants over the two-round fixture and BYTE-VERIFIED through "
    "fetch_records: between the rounds every page resolves to its v1 "
    "capture (payload prefix checked, not just counts); after round 2 "
    "the re-crawled doc_id%7==1 residue resolves to v2 and everything "
    "else stays v1; before round 1 nothing resolves. Plan: filter + "
    "one window over the index (~1000x smaller than the archives), "
    "then random-access fetches of exactly the resolved pointers — "
    "the 100 TB replay shape: no archive is ever scanned.",
    tags=("web", "gate", "sink"),
)
def q_cdx_asof_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.config import TableSource
    from roapi_spark.sinks.cdx import asof_snapshot
    from roapi_spark.sources import load_table
    from roapi_spark.sources.warc import fetch_records

    fixture = _two_round_crawl_dir(spark, sf_dir)
    arch = os.path.join(fixture, "archives")
    hist = None
    for r in ("r1", "r2"):
        part = load_table(
            spark,
            TableSource(
                name=f"_asof_{r}",
                uri=os.path.join(fixture, f"idx_{r}"),
                format="cdx",
            ),
        )
        hist = part if hist is None else hist.unionByName(part)

    def resolved(ts: str) -> DataFrame:
        snap = asof_snapshot(hist, ts)
        return fetch_records(snap, arch).select(
            F.substring(F.decode(F.col("payload"), "UTF-8"), 1, 3).alias(
                "vtag"
            )
        )

    mid = resolved("20260115000000").agg(
        F.count("*").cast("bigint").alias("n_mid"),
        F.sum((F.col("vtag") == "v1|").cast("bigint"))
        .cast("bigint")
        .alias("n_mid_v1"),
    )
    late = resolved("20260301000000").agg(
        F.sum((F.col("vtag") == "v1|").cast("bigint"))
        .cast("bigint")
        .alias("n_late_v1"),
        F.sum((F.col("vtag") == "v2|").cast("bigint"))
        .cast("bigint")
        .alias("n_late_v2"),
    )
    early = asof_snapshot(hist, "20251231000000").agg(
        F.count("*").cast("bigint").alias("n_early")
    )
    return (
        mid.crossJoin(F.broadcast(late))
        .crossJoin(F.broadcast(early))
        .select("n_mid", "n_mid_v1", "n_late_v1", "n_late_v2", "n_early")
    )
