"""Batch 16: generalizing the web-crawl surface (round 12).

Round 11 landed the crawl front-end; its verdict named the three ways
it was still fixture-shaped. This module closes them, each under the
external DuckDB oracle:

* ``q_psl_domains``      — registrable-domain extraction driven by the
  pinned public-suffix snapshot (functions/public_suffix_snapshot.dat):
  hosts spanning ≥10 suffix families — ccSLDs (co.uk, com.br, com.tr,
  ac.in, gob.mx, co.jp), 3-label rules (k12.ca.us, s3.amazonaws.com),
  private platform suffixes (github.io, blogspot.com) and default-rule
  hosts — must map to the same eTLD+1 the oracle derives from the SAME
  data file via ``registrable_domain_sql``.
* ``q_crawl_host_graph`` — the host-level link graph: the general WAT
  pass (pipeline14._crawl_links: parse anchors, RFC 3986-resolve
  against the page base, canonicalize) keyed by registrable domain on
  BOTH endpoints; cross-host footer links spanning PSL families land in
  their own domain buckets, chrome + intra-corpus links in the page's.
* ``q_robots_policies``  — per-host robots.txt as a BROADCAST JOIN:
  a (domain -> parsed rule array) policy table joined on the URL's
  registrable domain, decision made most-specific-wins by higher-order
  expressions over the joined rule array (filter + aggregate +
  regexp_like), so ONE plan serves any number of hosts — the shape a
  crawl actually needs, vs q_robots_filter's single compiled policy.
  Covers a deny-all host, a rule-free specific group (RFC 9309:
  everything allowed), a mixed longest-match policy, and a host with
  no robots.txt at all (left join miss => allowed).
* ``stream_frontier_bounded`` — the production-bounded crawl frontier:
  fixed Bloom-bitmap state (constant in crawl size) with an
  md5-deterministic, oracle-pinned false-positive budget.
* ``q_crawl_policy_funnel`` — the pieces composed: one WARC pass
  through canonical dedup + the broadcast per-host robots decision,
  stage counts against a closed-form oracle.

No reference parity (columnq has no web surface) — training-data-
pipeline extension surface, same standard as batches 14/15.

Scale notes: domain extraction stays composed built-ins (codegen'd,
shuffle-key-safe; the suffix alternation compiles once per task); the
host graph is one corpus scan + Arrow-batched parse/resolve + a hash
agg on (src_domain, dst_domain); the robots policy table broadcasts
(real-world robots sets are ~MB per million hosts) and the per-row
decision is a bounded loop over that host's own rules.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from roapi_spark.functions.web import (
    _robots_regex,
    parse_robots,
    registrable_domain,
    registrable_domain_sql,
    robots_allowed_sql,
    url_host,
)
from roapi_spark.plans.registry import register

# ---- q_psl_domains ----------------------------------------------------------

# hosts cycled by doc_id % 16, spanning: 2-label ccSLDs, 3-label rules,
# private platform suffixes, wildcard rules ('*' = one label),
# exception rules, and default-rule (last-two-labels) hosts
_PSL_HOSTS = (
    "blog.example.co.uk",
    "shop.loja.com.br",
    "u1.github.io",
    "pupil.k12.ca.us",
    "bucket.s3.amazonaws.com",
    "deep.sub.example.com",
    "media.example.com.tr",
    "lab.example.ac.in",
    "app.demo.blogspot.com",
    "www.example.gob.mx",
    "cdn.example.org",
    "files.example.co.jp",
    "foo.bar.ck",  # wildcard *.ck => bar.ck is a suffix
    "deep.a.b.kawasaki.jp",  # wildcard *.kawasaki.jp
    "shop.www.ck",  # exception !www.ck => www.ck registrable
    "sub.city.kawasaki.jp",  # exception !city.kawasaki.jp
)


def _host_case_sql(hosts: tuple[str, ...], key: str = "doc_id") -> str:
    whens = " ".join(
        f"WHEN {i} THEN '{h}'" for i, h in enumerate(hosts[:-1])
    )
    return (
        f"CASE {key} % {len(hosts)} {whens} ELSE '{hosts[-1]}' END"
    )


def _host_case_col(hosts: tuple[str, ...]) -> F.Column:
    col = F.lit(hosts[-1])
    expr = F.when(F.col("doc_id") % len(hosts) == 0, F.lit(hosts[0]))
    for i, h in enumerate(hosts[1:-1], start=1):
        expr = expr.when(F.col("doc_id") % len(hosts) == i, F.lit(h))
    return expr.otherwise(col)


@register(
    "q_psl_domains",
    oracle=f"""
    WITH h AS (
      SELECT {_host_case_sql(_PSL_HOSTS)} AS host FROM documents
    )
    SELECT {registrable_domain_sql('host')} AS domain,
           CAST(COUNT(*) AS BIGINT) AS n_hosts
    FROM h GROUP BY domain ORDER BY domain
    """,
    doc="Public-suffix-list gate: hosts cycled across 16 residue "
    "classes span ≥10 suffix families from the pinned PSL snapshot — "
    "ccSLDs (co.uk, com.br, com.tr, ac.in, gob.mx, co.jp), 3-label "
    "rules that must beat their 2-label prefixes (k12.ca.us, "
    "s3.amazonaws.com), private platform suffixes (github.io, "
    "blogspot.com), WILDCARD rules ('*' matching exactly one label: "
    "*.ck, *.kawasaki.jp), EXCEPTION rules that prevail over them "
    "(!www.ck, !city.kawasaki.jp) and default-rule hosts — and reduce "
    "to eTLD+1 via "
    "functions/web.registrable_domain, whose suffix alternations are "
    "COMPILED FROM the snapshot data file; the oracle derives its CASE "
    "from the SAME file (registrable_domain_sql), so a dropped or "
    "mis-ranked rule on either side hash-mismatches. Plan: FileScan -> "
    "codegen'd projection (the alternation compiles once per task) -> "
    "domain-keyed hash agg; the domain column stays a shuffle-safe "
    "dedup/join key at 100 TB.",
    tags=("web", "filter"),
)
def q_psl_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    host = _host_case_col(_PSL_HOSTS)
    return (
        docs.select(registrable_domain(host).alias("domain"))
        .groupBy("domain")
        .agg(F.count("*").cast("bigint").alias("n_hosts"))
        .orderBy("domain")
    )


# ---- q_crawl_host_graph -----------------------------------------------------

# per live HTML page: 6 chrome links (nav 2, sidebar 3, privacy 1) + 1
# intra-corpus doc link, all on the crawl host -> example.com; plus 1
# cross-host partner link cycled by doc_id % 6 over pipeline14._EXT_HOSTS
_LINKS_PER_PAGE_SAME_DOMAIN = 7


def _host_graph_oracle() -> str:
    from roapi_spark.functions.pipeline14 import _EXT_HOSTS

    return f"""
    WITH live AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 11 <> 3 AND doc_id % 7 <> 2
    ),
    ext AS (
      SELECT {_host_case_sql(_EXT_HOSTS)} AS host FROM live
    ),
    rows AS (
      SELECT 'example.com' AS src_domain,
             {registrable_domain_sql('host')} AS dst_domain,
             CAST(COUNT(*) AS BIGINT) AS n_links
      FROM ext GROUP BY dst_domain
      UNION ALL
      SELECT 'example.com', 'example.com',
             CAST({_LINKS_PER_PAGE_SAME_DOMAIN}
                  * (SELECT COUNT(*) FROM live) AS BIGINT)
    )
    SELECT * FROM rows ORDER BY src_domain, dst_domain
    """


@register(
    "q_crawl_host_graph",
    oracle=_host_graph_oracle(),
    doc="Host-level crawl link graph: the general WAT pass "
    "(pipeline14._crawl_links — parse every anchor, RFC 3986-resolve "
    "against the page's target URI, canonicalize) keyed by registrable "
    "domain on BOTH endpoints, no link filtered or shape-matched "
    "anywhere: chrome + intra-corpus links land on the crawl's own "
    "domain, the cross-host partner links (absolute URLs cycling six "
    "PSL-snapshot families) land in their domain buckets. The oracle "
    "replays the per-page link inventory in closed form and derives "
    "the external domains from the SAME suffix snapshot, so a "
    "resolution miss, a dropped anchor, or a mis-bucketed suffix "
    "shifts a count. Plan: reads the materialized WAT snapshot "
    "(pipeline14._links_snapshot — the parse is paid once and pinned "
    "fresh by q_crawl_link_graph) -> codegen'd canonicalize+domain -> hash agg on "
    "(src_domain, dst_domain); at 100 TB this is the host-graph build "
    "behind crawl scheduling and domain-level quality priors, and the "
    "agg key is the (tiny) domain pair.",
    tags=("web", "graph"),
)
def q_crawl_host_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.pipeline14 import _links_snapshot

    links = _links_snapshot(spark, sf_dir)
    return (
        links.select(
            registrable_domain(url_host(F.col("src_canon"))).alias(
                "src_domain"
            ),
            registrable_domain(url_host(F.col("dst_canon"))).alias(
                "dst_domain"
            ),
        )
        .groupBy("src_domain", "dst_domain")
        .agg(F.count("*").cast("bigint").alias("n_links"))
        .orderBy("src_domain", "dst_domain")
    )


# ---- q_src_sitemap ----------------------------------------------------------

_CHANGEFREQS = ("daily", "weekly", "monthly", "never")


def _sitemap_entries(spark: SparkSession, sf_dir: str) -> "DataFrame":
    """The fixture's url rows as a DataFrame (all codegen'd exprs):
    locs in the messy primary URL form, optional fields on fixed
    residues (lastmod %2==0; changefreq present when %3!=1, kind
    cycled by (doc_id + doc_id div 10) % 4 — decorrelated from the
    lastmod parity so every (lastmod?, kind) combination occurs;
    priority %5==0 at doc%10/10), shard = doc_id % 3."""
    src = os.path.join(sf_dir, "documents.parquet")
    freqs = ", ".join(f"'{c}'" for c in _CHANGEFREQS)
    return spark.read.parquet(src).selectExpr(
        "'https://'"
        " || (CASE WHEN doc_id % 5 = 0 THEN 'CRAWL.Example.com'"
        "          ELSE 'crawl.example.com' END)"
        " || (CASE WHEN doc_id % 9 = 4 THEN ':443' ELSE '' END)"
        " || '/' || source || '/' || CAST(doc_id AS STRING)"
        " || (CASE WHEN doc_id % 4 = 1 THEN '/' ELSE '' END)"
        " || (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&b=2&a=1'"
        "          ELSE '?a=1&b=2' END)"
        " || (CASE WHEN doc_id % 6 = 3 THEN '#frag' ELSE '' END) AS loc",
        "CASE WHEN doc_id % 2 = 0"
        "     THEN format_string('2026-01-%02d', 1 + doc_id % 3) "
        "END AS lastmod",
        f"CASE WHEN doc_id % 3 <> 1 THEN element_at(array({freqs}),"
        " CAST((doc_id + doc_id div 10) % 4 AS INT) + 1) END"
        " AS changefreq",
        "CASE WHEN doc_id % 5 = 0 THEN (doc_id % 10) / 10.0 END"
        " AS priority",
        "CAST(doc_id % 3 AS INT) AS shard",
    )


def _sitemap_fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build-once sitemaps.org fixture from the documents table,
    written through the DISTRIBUTED sitemap sink (sinks/sitemap.py —
    one task per urlset shard, spec caps enforced, tmp+rename): three
    shards by doc_id%3 (shard 0 gzipped), one sitemapindex referencing
    all three. No corpus rows ever route through the driver — the only
    driver-side step is the shard-cardinality index file."""
    from roapi_spark.functions.snapshot import build_once, snapshot_cache_dir
    from roapi_spark.sinks.sitemap import write_sitemap, write_sitemap_index

    src = os.path.join(sf_dir, "documents.parquet")
    out = snapshot_cache_dir(src, "sitemap-v3")
    shard_names = ("urlset-0.xml.gz", "urlset-1.xml", "urlset-2.xml")
    names = shard_names + ("sitemap-index.xml",)

    def ready(d: str) -> bool:
        return all(os.path.exists(os.path.join(d, n)) for n in names)

    def build(tmp: str) -> None:
        os.makedirs(tmp, exist_ok=True)
        manifest = write_sitemap(
            _sitemap_entries(spark, sf_dir),
            tmp,
            gzip_shards={0},
        ).collect()  # shard-cardinality manifest, not corpus rows
        write_sitemap_index(tmp, [m["sitemap_file"] for m in manifest])

    return build_once(out, ready, build)


_SITEMAP_URL_SQL = (
    "'https://'"
    " || (CASE WHEN doc_id % 5 = 0 THEN 'CRAWL.Example.com'"
    "          ELSE 'crawl.example.com' END)"
    " || (CASE WHEN doc_id % 9 = 4 THEN ':443' ELSE '' END)"
    " || '/' || source || '/' || CAST(doc_id AS VARCHAR)"
    " || (CASE WHEN doc_id % 4 = 1 THEN '/' ELSE '' END)"
    " || (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&b=2&a=1'"
    "          ELSE '?a=1&b=2' END)"
    " || (CASE WHEN doc_id % 6 = 3 THEN '#frag' ELSE '' END)"
)


@register(
    "q_src_sitemap",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, {_SITEMAP_URL_SQL} AS loc FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT loc) AS BIGINT) AS n_locs,
           CAST(COUNT(DISTINCT doc_id % 3) AS BIGINT) AS n_files,
           CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_lastmod,
           CAST(SUM(CASE WHEN doc_id % 3 <> 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changefreq,
           CAST(COUNT(DISTINCT CASE WHEN doc_id % 3 <> 1
                 THEN (doc_id + doc_id // 10) % 4 END) AS BIGINT)
             AS n_freq_kinds,
           CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN doc_id % 10 ELSE 0 END)
                AS BIGINT) AS sum_priority10,
           MIN(loc) AS min_loc,
           MAX(loc) AS max_loc
    FROM u
    """,
    doc="Sitemap source gate (sitemaps.org 0.9 — the crawl seed-list "
    "format): a sitemapindex plus three urlset shards (one gzipped) "
    "built from the documents table; the loader follows the index one "
    "level (spec-bounded driver read), classifies files by ROOT "
    "ELEMENT never name, dedups index-referenced vs directly-globbed "
    "files, and parses entries with COMPOSED BUILT-INS only — "
    "wholetext scan (file-parallel; the spec caps files at 50k URLs / "
    "50 MB, so whole-file rows are format-bounded), codegen'd "
    "</url> split+explode, per-field regexp_extract, XML entity "
    "decode — locs carry &amp;-escaped query strings the parse must "
    "round-trip exactly (min/max pin the decoded strings). Optional "
    "lastmod/changefreq/priority land as NULLs on their off-residues, "
    "never errors. Plan: file-parallel text scan -> WholeStageCodegen "
    "parse -> one agg; at 100 TB a seed-list refresh is one pass over "
    "sitemap bytes ~1000x smaller than the crawl.",
    tags=("source", "web"),
)
def q_src_sitemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.config import TableSource
    from roapi_spark.sources import load_table

    df = load_table(
        spark,
        TableSource(
            name="_sitemap",
            uri=_sitemap_fixture_dir(spark, sf_dir),
            format="sitemap",
        ),
    )
    return df.agg(
        F.count("*").cast("bigint").alias("n_urls"),
        F.count_distinct("loc").cast("bigint").alias("n_locs"),
        F.count_distinct("sitemap_file").cast("bigint").alias("n_files"),
        F.sum(F.col("lastmod").isNotNull().cast("bigint"))
        .cast("bigint")
        .alias("n_lastmod"),
        F.sum(F.col("changefreq").isNotNull().cast("bigint"))
        .cast("bigint")
        .alias("n_changefreq"),
        F.count_distinct("changefreq").cast("bigint").alias("n_freq_kinds"),
        F.sum(
            F.coalesce(
                F.round(F.col("priority") * 10).cast("bigint"), F.lit(0)
            )
        )
        .cast("bigint")
        .alias("sum_priority10"),
        F.min("loc").alias("min_loc"),
        F.max("loc").alias("max_loc"),
    )


# ---- q_crawl_hits -----------------------------------------------------------

_HITS_SCALE = 1_000_000
_HITS_ITERS = 2


def _crawl_hits_oracle(iters: int = _HITS_ITERS) -> str:
    from roapi_spark.functions.pipeline14 import _EXT_HOSTS

    parts = [
        f"""live AS MATERIALIZED (
      SELECT doc_id FROM documents
      WHERE doc_id % 11 <> 3 AND doc_id % 7 <> 2
    ),
    ext AS MATERIALIZED (
      SELECT {registrable_domain_sql("host")} AS d,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM (SELECT {_host_case_sql(_EXT_HOSTS)} AS host FROM live)
      GROUP BY 1
    ),
    edges AS MATERIALIZED (
      SELECT 'example.com' AS src, d AS dst, w FROM ext
      UNION ALL
      SELECT 'example.com', 'example.com',
             CAST({_LINKS_PER_PAGE_SAME_DOMAIN}
                  * (SELECT COUNT(*) FROM live) AS BIGINT)
    ),
    nodes AS MATERIALIZED (SELECT src AS n FROM edges UNION SELECT dst FROM edges),
    h0 AS MATERIALIZED (SELECT n, CAST({_HITS_SCALE} AS BIGINT) AS v FROM nodes)"""
    ]
    prev_h = "h0"
    for t in range(1, iters + 1):
        parts.append(
            f"""a{t}r AS MATERIALIZED (
      SELECT e.dst AS n, SUM(e.w * p.v) AS s
      FROM edges e JOIN {prev_h} p ON p.n = e.src GROUP BY 1
    ),
    a{t}u AS MATERIALIZED (
      SELECT nodes.n, CAST(COALESCE(s, 0) AS BIGINT) AS v
      FROM nodes LEFT JOIN a{t}r ON nodes.n = a{t}r.n
    ),
    a{t} AS MATERIALIZED (
      SELECT n, CAST((v * {_HITS_SCALE})
                     // (SELECT MAX(v) FROM a{t}u) AS BIGINT) AS v
      FROM a{t}u
    ),
    h{t}r AS MATERIALIZED (
      SELECT e.src AS n, SUM(e.w * a.v) AS s
      FROM edges e JOIN a{t} a ON a.n = e.dst GROUP BY 1
    ),
    h{t}u AS MATERIALIZED (
      SELECT nodes.n, CAST(COALESCE(s, 0) AS BIGINT) AS v
      FROM nodes LEFT JOIN h{t}r ON nodes.n = h{t}r.n
    ),
    h{t} AS MATERIALIZED (
      SELECT n, CAST((v * {_HITS_SCALE})
                     // (SELECT MAX(v) FROM h{t}u) AS BIGINT) AS v
      FROM h{t}u
    )"""
        )
        prev_h = f"h{t}"
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT nodes.n AS domain,
           CAST(h{iters}.v AS BIGINT) AS hub,
           CAST(a{iters}.v AS BIGINT) AS authority
    FROM nodes
    JOIN h{iters} ON nodes.n = h{iters}.n
    JOIN a{iters} ON nodes.n = a{iters}.n
    ORDER BY domain
    """
    )


def hits_scores(
    edges: DataFrame, nodes: DataFrame, iters: int
) -> tuple[DataFrame, DataFrame]:
    """``iters`` HITS iterations over weighted edges (src, dst, w) in
    fixed-point integers with per-step max-normalization; returns
    (hub, authority) score frames keyed by ``n``.

    Each iteration ends in a ``localCheckpoint(eager=False)`` on both
    score frames — without it the lineage doubles per iteration (two
    joins + a broadcast-normalize per step) and the optimizer blows up
    past ~10 iterations; with it the plan stays one-iteration-deep at
    any count (the PageRank discipline next door,
    pipeline14.q_crawl_pagerank)."""
    h = nodes.select("n", F.lit(_HITS_SCALE).cast("bigint").alias("v"))
    a = h
    for _ in range(iters):
        h, a = _hits_step(edges, nodes, h)
    # iterations carry SPARSE frames (nodes with no in-weight are simply
    # absent — they contribute 0 either way); the public contract stays
    # dense: every node, zeros materialized
    return _densify(nodes, h), _densify(nodes, a)


def hits_converged(
    edges: DataFrame,
    nodes: DataFrame,
    max_iters: int = 50,
) -> tuple[DataFrame, DataFrame, int]:
    """Iterate HITS until the fixed-point scores stop changing (exact
    integer compare — max-normalized fixed-point reaches a true fixed
    point, no epsilon needed) or ``max_iters``; returns (hub,
    authority, iterations_run). One anti-join count per iteration is
    the price of the stopping test — the convergence path is for
    analyses that need stable ranks, not the exact-replay gates."""
    h = nodes.select("n", F.lit(_HITS_SCALE).cast("bigint").alias("v"))
    h, a = _hits_step(edges, nodes, h)

    def _differs(x: DataFrame, y: DataFrame) -> DataFrame:
        # scores are SPARSE (absent == 0), so compare over the full
        # outer key set with zeros coalesced
        return (
            x.alias("x")
            .join(y.alias("y"), F.col("x.n") == F.col("y.n"), "full")
            .filter(
                F.coalesce(F.col("x.v"), F.lit(0))
                != F.coalesce(F.col("y.v"), F.lit(0))
            )
        )

    for it in range(2, max_iters + 1):
        # run one more iteration from the checkpointed state
        nh, na = _hits_step(edges, nodes, h)
        changed = (
            _differs(nh, h).union(_differs(na, a)).limit(1).count()
        )
        h, a = nh, na
        if changed == 0:
            return _densify(nodes, h), _densify(nodes, a), it
    return _densify(nodes, h), _densify(nodes, a), max_iters


def _densify(nodes: DataFrame, score: DataFrame) -> DataFrame:
    """Sparse score frame -> one row per node, absent keys as 0."""
    return nodes.join(
        F.broadcast(score.withColumnRenamed("n", "sn")),
        nodes.n == F.col("sn"),
        "left",
    ).select("n", F.coalesce("v", F.lit(0)).cast("bigint").alias("v"))


def _hits_step(
    edges: DataFrame, nodes: DataFrame, h: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """One (authority, hub) update from hub state ``h``, checkpointed.
    Returns SPARSE score frames: a node with no in-weight is absent
    rather than 0 — its contribution to the next step's sums is 0
    either way (weights are >= 0), div flooring keeps genuine 0-score
    rows present, and the max over raw sums is unchanged, so the
    densified fixed point is bit-identical (oracle-verified).

    Why sparse: the per-iteration cost of this query is DRIVER-side
    plan construction (~0.2 s per half at round 14 — each lazy
    localCheckpoint plans its physical plan), not execution (~10 ms).
    Dropping the per-step dense nodes join removes a join + broadcast
    from every planned iteration; zeros materialize once at the end
    (hits_scores/_hits_frame). The normalization max still comes from
    the aggregated raw frame (round-14: detaches the max job from the
    join critical path); coalesce(max, 1) guards the empty-edge-set
    corner (unreachable today — nodes derive from edge endpoints — but
    a filtered caller would otherwise get silent NULL scores)."""

    def half(score: DataFrame, src_col: str, dst_col: str) -> DataFrame:
        raw = (
            edges.join(
                score.withColumnRenamed("n", "jn"),
                F.col(src_col) == F.col("jn"),
            )
            .select(dst_col, (F.col("w") * F.col("v")).alias("c"))
            .groupBy(dst_col)
            .agg(F.sum("c").cast("bigint").alias("s"))
        )
        mx = raw.agg(F.coalesce(F.max("s"), F.lit(1)).alias("mx"))
        return (
            raw.crossJoin(F.broadcast(mx))
            .select(
                F.col(dst_col).alias("n"),
                F.expr(f"(s * {_HITS_SCALE}) div mx")
                .cast("bigint")
                .alias("v"),
            )
            .localCheckpoint(eager=False)
        )

    a = half(h, "src", "dst")
    nh = half(a, "dst", "src")
    return nh, a


@register(
    "q_crawl_hits",
    oracle=_crawl_hits_oracle(),
    doc=f"HITS hubs & authorities over the WEIGHTED host-level link "
    f"graph ({_HITS_ITERS} iterations, fixed-point integers, per-step "
    "max-normalization so values stay bit-exact and bounded — the "
    "same exact-replay discipline as the PageRank gates): the crawl "
    "domain is the sole hub (all outlinks originate there), the six "
    "external PSL-family partner domains are pure authorities, and "
    "weights are the per-domain link counts from the general WAT "
    "pass — so a dropped anchor, a mis-bucketed suffix, or an "
    "off-by-one in either matrix product shifts a fixed-point value "
    "and hash-mismatches against the DuckDB replay. Plan: the WAT "
    "snapshot builds the weighted domain edges (tiny vs the corpus); "
    "each iteration is two broadcast-scale joins + hash aggs over "
    "EDGES plus a 1-row max broadcast, checkpointed per step "
    "(hits_scores) so deep runs stay one-iteration-deep in the "
    "optimizer; at 100 TB the edge table is the domain-pair "
    "aggregate, never raw links.",
    tags=("web", "graph", "iterative"),
)
def q_crawl_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hits_frame(spark, sf_dir, _HITS_ITERS)


def _hits_frame(spark: SparkSession, sf_dir: str, iters: int) -> DataFrame:
    from roapi_spark.functions.pipeline14 import _links_snapshot

    links = _links_snapshot(spark, sf_dir)
    edges = (
        links.select(
            registrable_domain(url_host(F.col("src_canon"))).alias("src"),
            registrable_domain(url_host(F.col("dst_canon"))).alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count("*").cast("bigint").alias("w"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("src").alias("n"))
        .union(edges.select(F.col("dst").alias("n")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    h, a = hits_scores(edges, nodes, iters)
    return (
        nodes.join(h.select(F.col("n").alias("hn"), F.col("v").alias("hub")),
                   nodes.n == F.col("hn"))
        .join(a.select(F.col("n").alias("an"), F.col("v").alias("authority")),
              nodes.n == F.col("an"))
        .select(F.col("n").alias("domain"), "hub", "authority")
        .orderBy("domain")
    )


_HITS_DEEP_ITERS = 8


@register(
    "q_crawl_hits_deep",
    oracle=_crawl_hits_oracle(_HITS_DEEP_ITERS),
    doc=f"HITS at convergence depth ({_HITS_DEEP_ITERS} iterations — "
    "4x the headline gate): the round-13 verdict flagged that "
    "q_crawl_hits' 2-iteration plan would blow up the optimizer at "
    "the 20-50 iterations a convergence run needs because h/a lineage "
    "doubled per step; hits_scores now localCheckpoints BOTH score "
    "frames every iteration (the PageRank discipline), and this gate "
    "proves the fix in the driver-visible surface: the DuckDB oracle "
    "replays all 8 fixed-point iterations as chained CTEs, so a "
    "checkpoint that altered values (not just lineage) or a "
    "divergence between step K and K+1 hash-mismatches. Plan: "
    "identical per-iteration shape to q_crawl_hits — two "
    "broadcast-scale joins + hash aggs over the domain-pair "
    "aggregate + a 1-row max broadcast — repeated 8x with the plan "
    "held one-iteration-deep; at 100 TB iteration cost is flat in "
    "iteration count.",
    tags=("web", "graph", "iterative"),
)
def q_crawl_hits_deep(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hits_frame(spark, sf_dir, _HITS_DEEP_ITERS)


# ---- stream_frontier_bounded ------------------------------------------------


@register(
    "stream_frontier_bounded",
    oracle="""
    WITH d AS (
      SELECT doc_id, doc_id % 8 AS shard,
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
      UNION ALL
      SELECT 'recrawl-01.warc', n_urls, CAST(0 AS BIGINT)
      FROM per_shard WHERE shard = 1
    )
    SELECT * FROM named ORDER BY warc_file
    """,
    doc="Bounded-frontier gate: the Bloom-fronted variant of the crawl "
    "frontier (streaming/crawl.stream_url_frontier_bounded) — state is "
    "64 fixed 8 KiB Bloom bitmaps (512 KiB total, checkpointed) "
    "instead of one row per canonical URL, the production bound the "
    "exact kernel's docstring promises. Shards land in two waves and "
    "wave 2 RE-LANDS two wave-1 shards under new names (a re-crawl-"
    "heavy arrival mix), so cross-batch revisit suppression must hold "
    "through the bitmap state. Classification is md5-deterministic; "
    "the oracle pins the EXACT expected first-seen counts, so any "
    "false positive inside the fixture (budget ~(nK/bits)^K < 1e-6 per "
    "URL at sf0.1) shifts n_new and hash-mismatches — the FP-budget "
    "assertion. The gate additionally asserts state compression is "
    "real: distinct canonicals must EXCEED the 64-bucket bound (the "
    "fixture stresses it) and touched buckets must be strictly fewer "
    "than canonicals — both computed DISTRIBUTED from a per-batch "
    "parquet spill (only two scalars reach the driver; never a row "
    "per URL). Plan: fixture-sized; per-batch input is the file-"
    "arrival rate and state is CONSTANT in crawl size — the scale "
    "story the exact frontier can't offer.",
    tags=("streaming", "web"),
)
def stream_frontier_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from roapi_spark.functions.pipeline14 import (
        _N_SHARDS,
        _warc_fixture_dir,
        _warc_shards,
    )
    from roapi_spark.streaming.crawl import (
        N_BLOOM_BUCKETS,
        stream_state_partitions,
        stream_url_frontier_bounded,
    )

    src = _warc_fixture_dir(spark, sf_dir)
    shards = _warc_shards(src)
    landing = tempfile.mkdtemp(prefix="frontier_bounded_landing_")
    spill = tempfile.mkdtemp(prefix="frontier_bounded_spill_")
    acc: dict[str, list] = {}

    def process(classified: DataFrame, batch_id: int) -> None:
        # two actions read this batch (the count agg AND the state-bound
        # spill below); without a persist each action re-executes the
        # whole stateful plan — WARC parse, shuffle, state kernel —
        # doubling every micro-batch (measured ~0.9 s/batch at sf0.1)
        classified.persist()
        try:
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
            # state-bound evidence stays DISTRIBUTED: spill (bucket, canon)
            # to parquet per batch; the cross-batch distinct counts are
            # computed executor-side after the stream ends and only the two
            # numbers reach the driver — never one row per URL
            classified.select("bucket", "canon").write.mode("append").parquet(
                spill
            )
        finally:
            classified.unpersist()

    try:
        for name in shards[: _N_SHARDS // 2]:
            shutil.copy(os.path.join(src, name), os.path.join(landing, name))
        with stream_state_partitions(spark):
            q = stream_url_frontier_bounded(
                spark,
                landing,
                process,
                os.path.join(landing, "_ckpt"),
                query_name="stream_frontier_bounded",
            )
            try:
                q.processAllAvailable()
                for name in shards[_N_SHARDS // 2 :]:
                    shutil.copy(
                        os.path.join(src, name), os.path.join(landing, name)
                    )
                # wave 2 re-lands shards 0 and 1: a re-crawl-heavy mix
                shutil.copy(
                    os.path.join(src, shards[0]),
                    os.path.join(landing, "recrawl-00.warc.gz"),
                )
                shutil.copy(
                    os.path.join(src, shards[1]),
                    os.path.join(landing, "recrawl-01.warc"),
                )
                q.processAllAvailable()
            finally:
                q.stop()
    finally:
        shutil.rmtree(landing, ignore_errors=True)
    try:
        n_buckets, n_canons = (
            spark.read.parquet(spill)
            .agg(
                F.countDistinct("bucket").alias("b"),
                F.countDistinct("canon").alias("c"),
            )
            .first()
        )
    finally:
        shutil.rmtree(spill, ignore_errors=True)
    # Falsifiable state-bound evidence (bucket<=63 holds by construction
    # — md5 % N_BLOOM_BUCKETS — so asserting it would be dead code):
    # (a) the fixture must actually STRESS the bound — more distinct
    #     canonicals than the bitmap count, else the gate proves nothing;
    # (b) compression must actually happen — strictly fewer touched
    #     buckets than canonicals. A broken canonicalizer (collapsing
    #     URLs) fails (a); a broken bucketer (e.g. dropping the modulo
    #     upstream or keying state per-URL) fails (b).
    if n_canons <= N_BLOOM_BUCKETS:
        raise RuntimeError(
            f"fixture too small to stress the state bound: {n_canons} "
            f"canonicals <= {N_BLOOM_BUCKETS} buckets"
        )
    if n_buckets >= n_canons:
        raise RuntimeError(
            f"no state compression: {n_buckets} buckets for "
            f"{n_canons} canonicals"
        )
    return spark.createDataFrame(
        sorted((f, *v) for f, v in acc.items()),
        "warc_file string, n_urls bigint, n_new bigint",
    )


# ---- q_robots_policies ------------------------------------------------------

# four hosts, four policies: deny-all; a rule-free specific group (RFC
# 9309: a group NAMING the agent with no rules allows everything, even
# when '*' denies all); a mixed longest-match policy; and NO robots.txt
_ROBOTS_UA = "trainbot"
_POLICY_HOSTS = (
    "crawl.example.co.uk",
    "u1.github.io",
    "docs.example.com",
    "open.example.org",  # no robots.txt: absent from the policy table
)
_POLICY_TXT = {
    "example.co.uk": "User-agent: *\nDisallow: /\n",
    "u1.github.io": (
        "User-agent: *\nDisallow: /\n\n"
        f"User-agent: {_ROBOTS_UA}\nDisallow:\n"
    ),
    "example.com": (
        "User-agent: *\nDisallow: /\n\n"
        f"User-agent: {_ROBOTS_UA}\n"
        "Allow: /\n"
        "Disallow: /src1\n"
        "Allow: /src1*0$\n"
        "Disallow: /*9$\n"
    ),
}
_PARSED_POLICIES = {
    dom: parse_robots(txt, _ROBOTS_UA) for dom, txt in _POLICY_TXT.items()
}

_PATH_SQL = "'/' || source || '/' || CAST(doc_id AS VARCHAR)"


def _robots_policies_oracle() -> str:
    host_case = _host_case_sql(_POLICY_HOSTS)
    dom = registrable_domain_sql("host")
    decide = " ".join(
        f"WHEN domain = '{d}' "
        f"THEN {robots_allowed_sql(_PATH_SQL, rules)}"
        for d, rules in _PARSED_POLICIES.items()
    )
    return f"""
    WITH u AS (
      SELECT doc_id, source, {host_case} AS host FROM documents
    ),
    d AS (
      SELECT doc_id, source, {dom} AS domain FROM u
    ),
    verdicts AS (
      SELECT domain, doc_id,
             CASE {decide} ELSE TRUE END AS ok
      FROM d
    )
    SELECT domain,
           CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_allowed,
           CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS n_blocked,
           CAST(SUM(CASE WHEN ok THEN doc_id ELSE 0 END) AS BIGINT)
             AS sum_allowed_id
    FROM verdicts GROUP BY domain ORDER BY domain
    """


def _policies_df(spark: SparkSession) -> DataFrame:
    """The (domain -> parsed rule array) policy table — MB-scale per
    million hosts in production, broadcast everywhere it's joined."""
    pol_rows = [
        (
            dom,
            [(allow, _robots_regex(p), len(p)) for allow, p in rules],
        )
        for dom, rules in _PARSED_POLICIES.items()
    ]
    return spark.createDataFrame(
        pol_rows,
        "domain string, rules array<struct<allow:boolean,rx:string,plen:int>>",
    )


def _robots_ok_col(path_col: str = "path") -> F.Column:
    """RFC 9309 most-specific-wins over a joined ``rules`` array, as
    higher-order expressions (filter + aggregate + regexp_like); a
    left-join miss (NULL rules — host without robots.txt) allows."""

    def side(want_allow: str) -> str:
        return (
            f"aggregate(filter(rules, r -> {want_allow} AND "
            f"regexp_like({path_col}, r.rx)), -1, "
            "(acc, r) -> greatest(acc, r.plen))"
        )

    return F.when(F.col("rules").isNull(), F.lit(True)).otherwise(
        F.expr(f"{side('r.allow')} >= {side('NOT r.allow')}")
    )


@register(
    "q_robots_policies",
    oracle=_robots_policies_oracle(),
    doc="Per-host robots.txt as a BROADCAST JOIN (the shape a crawl "
    "actually needs, generalizing q_robots_filter's single compiled "
    "policy): a (domain -> parsed rule array<allow, regex, pattern "
    "length>) policy table is broadcast-joined on the URL's "
    "registrable domain, and the RFC 9309 most-specific-wins decision "
    "runs as higher-order expressions over the joined array — "
    "filter(rules, matched) + aggregate(greatest(plen)) per side, "
    "allow >= disallow — so ONE plan serves any number of hosts. "
    "Policies cover a deny-all host, a rule-free specific group "
    "(everything allowed for the named agent even though '*' denies "
    "all), a mixed longest-match policy with wildcard+anchor rules, "
    "and a host with NO robots.txt (left-join miss => allowed). The "
    "oracle replays each host's decision from the SAME parsed rules "
    "and derives domains from the same suffix snapshot. Plan: "
    "FileScan -> codegen'd domain projection -> "
    "BroadcastHashJoin(LeftOuter) -> per-row bounded rule loop -> "
    "domain-keyed hash agg; at 100 TB the policy table for millions "
    "of hosts is MB-scale and still broadcasts, and re-fetching "
    "robots.txt only re-broadcasts the table, never replans.",
    tags=("web", "filter"),
)
def q_robots_policies(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    url = F.concat(
        F.lit("https://"),
        _host_case_col(_POLICY_HOSTS),
        F.lit("/"),
        F.col("source"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
    )
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("/"), F.col("source"), F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("path"),
        registrable_domain(url_host(url)).alias("domain"),
    )
    joined = urls.join(F.broadcast(_policies_df(spark)), "domain", "left")
    ok = _robots_ok_col()
    return (
        joined.select("domain", "doc_id", ok.alias("ok"))
        .groupBy("domain")
        .agg(
            F.sum(F.col("ok").cast("bigint")).cast("bigint").alias(
                "n_allowed"
            ),
            F.sum((~F.col("ok")).cast("bigint")).cast("bigint").alias(
                "n_blocked"
            ),
            F.sum(F.when(F.col("ok"), F.col("doc_id")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("sum_allowed_id"),
        )
        .orderBy("domain")
    )


# ---- q_crawl_policy_funnel --------------------------------------------------


def _policy_funnel_oracle() -> str:
    rok = robots_allowed_sql(_PATH_SQL, _PARSED_POLICIES["example.com"])
    return f"""
    WITH d AS (
      SELECT doc_id,
             (doc_id % 11 = 3) AS is404,
             (doc_id % 7 = 2) AS isplain,
             (doc_id % 13 = 5) AS hasdup,
             {rok} AS rok
      FROM documents
    ),
    r AS (SELECT * FROM d UNION ALL SELECT * FROM d WHERE hasdup)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_fetched,
           CAST(SUM(CASE WHEN NOT is404 AND NOT isplain THEN 1 ELSE 0 END)
             AS BIGINT) AS n_ok_html,
           CAST(COUNT(DISTINCT CASE WHEN NOT is404 AND NOT isplain
                    THEN doc_id END) AS BIGINT) AS n_unique,
           CAST(COUNT(DISTINCT CASE WHEN NOT is404 AND NOT isplain AND rok
                    THEN doc_id END) AS BIGINT) AS n_allowed,
           CAST(SUM(DISTINCT CASE WHEN NOT is404 AND NOT isplain AND rok
                    THEN doc_id END) AS BIGINT) AS sum_allowed_id
    FROM r
    """


@register(
    "q_crawl_policy_funnel",
    oracle=_policy_funnel_oracle(),
    doc="Policy-composed crawl funnel: the round-12 pieces in one pass "
    "over the WARC fixture — fetched responses -> HTTP 200 text/html "
    "-> canonical-URL dedup -> per-host robots decision, where the "
    "decision comes from the broadcast (domain -> rules) policy table "
    "joined on registrable_domain(url_host(canonical)) and evaluated "
    "by the same higher-order most-specific-wins expressions as "
    "q_robots_policies (the crawl pages' example.com carries the "
    "mixed longest-match policy; the table's other hosts simply don't "
    "bind). One output row of stage counts plus the allowed-id "
    "checksum; the oracle replays every stage from the documents "
    "table via residue arithmetic and the same generated rule "
    "regexes. Plan: one streaming WARC scan -> codegen'd canonical/"
    "domain/path projections -> BroadcastHashJoin(LeftOuter) with the "
    "policy table -> single hash agg with conditional distincts — no "
    "Python in the decision path, no second corpus scan; at 100 TB "
    "this is the fetch-to-corpus admission plan, and re-fetching "
    "robots.txt only re-broadcasts the policy table.",
    tags=("web", "pipeline", "filter"),
)
def q_crawl_policy_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.pipeline14 import _read_warc
    from roapi_spark.functions.web import canonical_url, url_path

    resp = _read_warc(spark, sf_dir, types="response")
    canon = canonical_url(F.col("target_uri"))
    staged = (
        resp.select(
            F.col("http_status").alias("status"),
            F.col("http_content_type").alias("ctype"),
            canon.alias("canon"),
        )
        .withColumn(
            "okhtml",
            (F.col("status") == 200)
            & F.col("ctype").startswith("text/html"),
        )
        .withColumn("domain", registrable_domain(url_host(F.col("canon"))))
        .withColumn("path", url_path(F.col("canon")))
        .withColumn(
            "doc_id",
            F.regexp_extract("canon", r"://[^/]+/[^/]+/(\d+)", 1).cast(
                "bigint"
            ),
        )
        .join(F.broadcast(_policies_df(spark)), "domain", "left")
        .withColumn("rok", _robots_ok_col())
    )
    return staged.agg(
        F.count("*").cast("bigint").alias("n_fetched"),
        F.sum(F.col("okhtml").cast("bigint")).cast("bigint").alias(
            "n_ok_html"
        ),
        F.count_distinct(F.when(F.col("okhtml"), F.col("canon")))
        .cast("bigint")
        .alias("n_unique"),
        F.count_distinct(
            F.when(F.col("okhtml") & F.col("rok"), F.col("canon"))
        )
        .cast("bigint")
        .alias("n_allowed"),
        F.sum_distinct(
            F.when(F.col("okhtml") & F.col("rok"), F.col("doc_id"))
        )
        .cast("bigint")
        .alias("sum_allowed_id"),
    )


# ---- q_crawl_anchor_text ----------------------------------------------------


def _anchor_text_oracle() -> str:
    from roapi_spark.functions.pipeline14 import _EXT_HOSTS

    live = (
        "SELECT doc_id FROM documents "
        "WHERE doc_id % 11 <> 3 AND doc_id % 7 <> 2"
    )
    one_dom = ", ".join(
        f"SELECT '{t}' AS anchor_text, "
        "CAST((SELECT COUNT(*) FROM live) AS BIGINT) AS n_links, "
        "CAST(1 AS BIGINT) AS n_dst_domains"
        for t in ("About", "Home", "One", "Privacy", "Three", "Two", "next")
    ).replace(", SELECT", " UNION ALL SELECT")
    return f"""
    WITH live AS ({live}),
    ext AS (
      SELECT {registrable_domain_sql(_host_case_sql(_EXT_HOSTS))} AS dom
      FROM live
    )
    SELECT * FROM (
      {one_dom}
      UNION ALL
      SELECT 'partner',
             CAST((SELECT COUNT(*) FROM live) AS BIGINT),
             (SELECT CAST(COUNT(DISTINCT dom) AS BIGINT) FROM ext)
    ) ORDER BY anchor_text
    """


@register(
    "q_crawl_anchor_text",
    oracle=_anchor_text_oracle(),
    doc="Anchor-text mining over the general link pass: every anchor's "
    "whitespace-normalized inner text (functions/web."
    "extract_links_with_text — the WAT-side relevance/label signal "
    "crawls feed into ranking and query-document mining) grouped by "
    "text, with per-text link counts and DISTINCT destination "
    "registrable domains. The fixture's chrome anchors each point at "
    "one crawl-domain target, the 'partner' anchors fan out across "
    "six PSL families — a parser that loses anchor boundaries, merges "
    "adjacent anchors' text, or mis-resolves a target shifts a count "
    "or a domain fan-out. Plan: one WARC scan -> Arrow-batched "
    "parse+resolve (no shuffle) -> codegen'd canonical/domain -> "
    "(text)-keyed hash agg with a distinct; at 100 TB anchor text is "
    "the natural shuffle key and the agg is Heaps-bounded in distinct "
    "texts.",
    tags=("web", "graph"),
)
def q_crawl_anchor_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.functions.pipeline14 import _crawl_links_text

    links = _crawl_links_text(spark, sf_dir)
    return (
        links.select(
            "anchor_text",
            registrable_domain(url_host(F.col("dst_canon"))).alias(
                "dst_domain"
            ),
        )
        .groupBy("anchor_text")
        .agg(
            F.count("*").cast("bigint").alias("n_links"),
            F.count_distinct("dst_domain").cast("bigint").alias(
                "n_dst_domains"
            ),
        )
        .orderBy("anchor_text")
    )


# ---- q_crawl_inlink_text ----------------------------------------------------


def _inlink_text_oracle() -> str:
    from roapi_spark.functions.pipeline14 import _EXT_HOSTS

    live = (
        "SELECT doc_id FROM documents "
        "WHERE doc_id % 11 <> 3 AND doc_id % 7 <> 2"
    )
    chrome = " UNION ALL ".join(
        f"SELECT 'example.com' AS dst_domain, '{t}' AS term, "
        "CAST((SELECT COUNT(*) FROM live) AS BIGINT) AS n"
        for t in ("about", "home", "next", "one", "privacy", "three", "two")
    )
    return f"""
    WITH live AS ({live}),
    ext AS (
      SELECT {registrable_domain_sql(_host_case_sql(_EXT_HOSTS))}
               AS dst_domain,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM live GROUP BY 1
    ),
    terms AS (
      {chrome}
      UNION ALL
      SELECT dst_domain, 'partner', n FROM ext
    ),
    r AS (
      SELECT dst_domain, term, n,
             ROW_NUMBER() OVER (
               PARTITION BY dst_domain ORDER BY n DESC, term
             ) AS rnk
      FROM terms
    )
    SELECT dst_domain, CAST(rnk AS INT) AS rnk, term, n
    FROM r WHERE rnk <= 3
    ORDER BY dst_domain, rnk
    """


@register(
    "q_crawl_inlink_text",
    oracle=_inlink_text_oracle(),
    doc="Per-destination inlink anchor profiles (r12 verdict item 7): "
    "the WAT-derived relevance feature an LLM crawl joins onto pages — "
    "every anchor's text from the general link pass, lower-cased, "
    "whitespace-tokenized, counted per (destination registrable "
    "domain, term), then top-3 terms per destination by count "
    "(row_number window, count desc / term asc tie-break — the "
    "q_window_topk_per_group shape; edge source = the materialized WAT "
    "text snapshot, parse pinned fresh by q_crawl_anchor_text). The "
    "crawl domain accumulates all "
    "seven chrome/nav terms at equal counts (the tie-break order is "
    "itself pinned); the six external PSL-family partner domains each "
    "profile to their residue-class count. Plan: one WARC scan -> "
    "Arrow-batched parse+resolve -> codegen'd domain key -> "
    "(domain, term) hash agg -> window over the (small) per-domain "
    "term sets; at 100 TB the agg shuffles once on (domain, term) and "
    "the window input is Heaps-bounded in distinct terms per domain, "
    "so top-k never sees raw edges.",
    tags=("web", "graph"),
)
def q_crawl_inlink_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from roapi_spark.functions.pipeline14 import _links_text_snapshot

    links = _links_text_snapshot(spark, sf_dir)
    terms = links.select(
        registrable_domain(url_host(F.col("dst_canon"))).alias("dst_domain"),
        F.explode(
            F.split(F.lower(F.trim(F.col("anchor_text"))), r"\s+")
        ).alias("term"),
    ).filter(F.col("term") != "")
    counts = terms.groupBy("dst_domain", "term").agg(
        F.count("*").cast("bigint").alias("n")
    )
    w = Window.partitionBy("dst_domain").orderBy(
        F.desc("n"), F.asc("term")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .select("dst_domain", "rnk", "term", "n")
        .orderBy("dst_domain", "rnk")
    )


# ---- stream_index_fetch -----------------------------------------------------


@register(
    "stream_index_fetch",
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
    doc="Streaming index-driven fetch gate (the fetcher-fleet "
    "consumption pattern): CDXJ pointer shards land in two waves; each "
    "micro-batch parses the new pointers with the SAME parse the batch "
    "cdx source uses, prunes to the sparse capture subset (text/plain "
    "+ 404s) with codegen'd filters BEFORE any archive byte moves, and "
    "random-access fetches exactly the pointed-at records from the "
    "static archives (streaming/crawl.stream_index_fetch -> "
    "sources/warc.fetch_records). Totals across both waves — counts, "
    "per-class payload octets, pointer-vs-record url/status equality — "
    "must match the residue closed form, so a dropped shard, a "
    "re-delivered shard, a stale offset, or a parse drift shifts a "
    "figure. Plan: per-batch cost = newly landed index volume + one "
    "seek+read per surviving pointer; exactly-once per index shard via "
    "the file-stream checkpoint; the archives are never scanned.",
    tags=("streaming", "web"),
)
def stream_index_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from roapi_spark.functions.pipeline14 import _warc_fixture_dir
    from roapi_spark.streaming.crawl import stream_index_fetch as _ifetch

    src = _warc_fixture_dir(spark, sf_dir)
    ptr_files = sorted(
        n for n in os.listdir(src) if n.startswith("pointers-")
    )
    landing = tempfile.mkdtemp(prefix="index_fetch_landing_")
    acc = {
        k: 0
        for k in (
            "n_fetched", "n_plain", "n_404", "plain_octets",
            "octets_404", "n_match",
        )
    }

    def pfilter(p: DataFrame) -> DataFrame:
        return p.filter(
            (F.col("mime") == "text/plain") | (F.col("status") == 404)
        ).select("url", "status", "warc_filename", "offset", "length")

    def process(fetched: DataFrame, batch_id: int) -> None:
        is_plain = (F.col("http_status") == 200) & F.col(
            "http_content_type"
        ).startswith("text/plain")
        is_404 = F.col("http_status") == 404
        rows = fetched.agg(
            F.count("*").cast("bigint").alias("n_fetched"),
            F.sum(is_plain.cast("bigint")).cast("bigint").alias("n_plain"),
            F.sum(is_404.cast("bigint")).cast("bigint").alias("n_404"),
            F.sum(
                F.when(
                    is_plain, F.length("payload").cast("bigint")
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("plain_octets"),
            F.sum(
                F.when(
                    is_404, F.length("payload").cast("bigint")
                ).otherwise(F.lit(0))
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
        ).collect()
        for k in acc:
            acc[k] += int(rows[0][k] or 0)

    try:
        for name in ptr_files[: len(ptr_files) // 2]:
            shutil.copy(os.path.join(src, name), os.path.join(landing, name))
        q = _ifetch(
            spark,
            landing,
            src,
            process,
            os.path.join(landing, "_ckpt"),
            pointer_filter=pfilter,
            query_name="stream_index_fetch",
        )
        try:
            q.processAllAvailable()
            for name in ptr_files[len(ptr_files) // 2 :]:
                shutil.copy(
                    os.path.join(src, name), os.path.join(landing, name)
                )
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        shutil.rmtree(landing, ignore_errors=True)
    return spark.createDataFrame(
        [tuple(acc[k] for k in (
            "n_fetched", "n_plain", "n_404", "plain_octets",
            "octets_404", "n_match",
        ))],
        "n_fetched bigint, n_plain bigint, n_404 bigint, "
        "plain_octets bigint, octets_404 bigint, n_match bigint",
    )
