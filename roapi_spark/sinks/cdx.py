"""CDX(J) index sink: build the sidecar index for WARC archives.

The write-side complement of ``sources/cdx.py`` (which parses an index
someone else built) and the missing third leg of the crawl toolchain:
``sinks/warc.py`` writes archives, this module indexes them, and
``sources/warc.fetch_records`` random-accesses through the result —
write -> index -> seek closes with no external indexer (pywb's
``cdx-indexer`` is the reference tool shape; format per the public pywb
CDXJ spec / Common Crawl cc-index docs, the same standing as the ISO
28500 spec the WARC reader is pinned to).

Indexing requires REAL archive coordinates: for gzip member-per-record
files (the spec annex C layout Common Crawl uses) the pointer is the
compressed member's (offset, length); for plain ``.warc`` files it is
the raw record slice. Member boundaries are recovered by walking the
file with ``zlib.decompressobj`` — each member's consumed-byte count is
exact, never a magic-number guess (gzip magic can occur inside
compressed data). A solid-gzip archive (one member for the whole file)
is rejected loudly: it cannot be random-accessed, and silently emitting
a whole-file pointer would defeat the index's purpose.

Scale: one task indexes one archive file (``mapInPandas`` over the file
list), reading it once; task memory is bounded by the largest archive
file — the same bound the WARC sink's one-task-one-archive write
already sets (Common Crawl caps ~1 GB/file for exactly this reason).
SURT keys are attached JVM-side afterwards (``web.url_to_surt``), so
the key column is codegen'd and consistent with the probe side
(``q_cdx_surt_join``). Only records that carry a WARC-Target-URI and
are ``response``/``revisit`` typed are indexed (what a cc-index
carries); requests and warcinfo never get pointers.
"""

from __future__ import annotations

import base64
import hashlib
import io
import json
import os
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from roapi_spark.sources.warc import (
    WarcFormatError,
    _GZ_MAGIC,
    _list_files,
    iter_records,
)

_INDEXED_TYPES = ("response", "revisit")


def _iter_member_spans(data: bytes, name: str, chunk: int = 1 << 20):
    """(offset, length, decompressed_bytes) per gzip member.

    Feeds the decompressor fixed-size chunks off a memoryview so each
    archive byte is copied O(1) times regardless of member count — a
    member boundary only re-feeds the (<= chunk-sized) ``unused_data``
    tail to the next member's decompressor, never the whole remainder.
    """
    view = memoryview(data)
    n = len(data)
    pos = 0  # absolute offset of the current member's first byte
    fed = 0  # absolute offset one past the last byte sliced off `view`
    pending = b""  # unconsumed tail at abs [fed - len(pending), fed)
    d = zlib.decompressobj(wbits=31)
    pieces: list[bytes] = []
    while pos < n:
        if pending:
            feed, feed_start, pending = pending, fed - len(pending), b""
        else:
            if fed >= n:
                raise WarcFormatError(
                    f"{name}: truncated gzip member at offset {pos}"
                )
            feed = bytes(view[fed:fed + chunk])
            feed_start = fed
            fed += len(feed)
        pieces.append(d.decompress(feed))
        if d.eof:
            tail = d.unused_data
            end = feed_start + len(feed) - len(tail)
            yield pos, end - pos, b"".join(pieces)
            pos, pending = end, tail
            d = zlib.decompressobj(wbits=31)
            pieces = []


def iter_record_pointers(path: str, name: str):
    """(offset, length, record) per WARC record with TRUE archive
    coordinates, both layouts (gzip-member vs plain decided by magic)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] == _GZ_MAGIC:
        for off, length, raw in _iter_member_spans(data, name):
            recs = list(iter_records(io.BufferedReader(io.BytesIO(raw)), name))
            if len(recs) != 1:
                raise WarcFormatError(
                    f"{name}: gzip member at {off} holds {len(recs)} "
                    "records — member-per-record layout is required for "
                    "a random-access index (solid gzip cannot be seeked)"
                )
            yield off, length, recs[0]
        return
    # plain layout: record i's span runs from its start offset to the
    # next record's start (trailing CRLF padding folds into the slice —
    # the reader's parse tolerates it), the last to end-of-file
    recs = list(iter_records(io.BufferedReader(io.BytesIO(data)), name))
    for i, rec in enumerate(recs):
        start = rec["record_offset"]
        end = recs[i + 1]["record_offset"] if i + 1 < len(recs) else len(data)
        yield start, end - start, rec


def index_warc(
    spark: SparkSession,
    uri: str,
    glob: str = "*.warc*",
    recursive: bool = False,
) -> DataFrame:
    """One CDX pointer row per indexable record, schema matching the
    ``cdx`` SOURCE exactly (surt_key, fetch_ts, url, mime, status,
    digest, length, offset, warc_filename) — so a generated index and a
    shipped one are interchangeable downstream."""
    files = _list_files(uri, glob, recursive=recursive)
    base = uri if os.path.isdir(uri) else os.path.dirname(uri)
    names = [os.path.relpath(p, base) for p in files]

    def kernel(batches):
        import pandas as pd

        cols = [
            "fetch_ts", "url", "mime", "status",
            "digest", "length", "offset", "warc_filename",
        ]
        for pdf in batches:
            rows = []
            for fname in pdf["fname"]:
                for off, length, rec in iter_record_pointers(
                    os.path.join(base, str(fname)), str(fname)
                ):
                    if (
                        rec["warc_type"] not in _INDEXED_TYPES
                        or not rec["target_uri"]
                    ):
                        continue
                    is_revisit = rec["warc_type"] == "revisit"
                    mime = rec["http_content_type"]
                    # digest: pywb / Common Crawl CDXJ carry labelled
                    # Base32 SHA-1 payload digests — match that so a
                    # generated index joins/dedupes against a shipped
                    # one. Revisit blocks are headers-only: index the
                    # record's DECLARED WARC-Payload-Digest (the
                    # original payload's), never sha1 of the empty
                    # block.
                    declared = rec.get("payload_digest")
                    if declared is None:
                        declared = "sha1:" + base64.b32encode(
                            hashlib.sha1(rec["payload"] or b"").digest()
                        ).decode("ascii")
                    rows.append(
                        {
                            "fetch_ts": "".join(
                                c for c in (rec["warc_date"] or "")
                                if c.isdigit()
                            ),
                            # revisit rows get pywb's marker mime: the
                            # block carries no http entity of its own
                            "url": rec["target_uri"],
                            "mime": "warc/revisit" if is_revisit else (
                                mime.split(";")[0].strip() if mime else None
                            ),
                            "status": rec["http_status"],
                            "digest": declared,
                            "length": length,
                            "offset": off,
                            "warc_filename": str(fname),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    pointers = spark.createDataFrame(
        [(n,) for n in names], "fname string"
    ).repartition(len(names)).mapInPandas(
        kernel,
        "fetch_ts string, url string, mime string, status int, "
        "digest string, length bigint, offset bigint, warc_filename string",
    )
    from roapi_spark.functions.web import url_to_surt

    return pointers.select(
        url_to_surt(F.col("url")).alias("surt_key"),
        "fetch_ts", "url", "mime", "status",
        "digest", "length", "offset", "warc_filename",
    )


def _cdxj_line(r) -> str:
    """One ``{surt} {ts} {json}`` line from a pointer namedtuple —
    shared by the plaintext and zipnum writers so the byte format can
    never drift between layouts. Fails loudly on key fields that would
    corrupt the space/newline-delimited framing."""
    if any(
        c in field
        for field in (r.surt_key, r.fetch_ts)
        for c in (" ", "\n", "\r")
    ):
        # url_to_surt %20-encodes spaces; a key that still has one came
        # from elsewhere and would corrupt the line format
        raise ValueError(
            f"CDXJ key fields must not contain spaces/newlines: "
            f"surt_key={r.surt_key!r} fetch_ts={r.fetch_ts!r}"
        )
    blob = {
        "url": r.url,
        "mime": r.mime,
        "status": str(r.status) if r.status is not None else None,
        "digest": r.digest,
        "length": str(int(r.length)),
        "offset": str(int(r.offset)),
        "filename": r.warc_filename,
    }
    return f"{r.surt_key} {r.fetch_ts} " + json.dumps(
        {k: v for k, v in blob.items() if v is not None}, sort_keys=True
    )


def write_cdx(
    df: DataFrame,
    out_dir: str,
    shard_col: str = "shard",
    prefix: str = "index",
) -> DataFrame:
    """Write pointer rows as CDXJ shard files (one per ``shard_col``
    value, SURT-sorted within each — the binary-searchable layout),
    ``{surt} {ts} {json}`` lines the ``cdx`` source reads back
    verbatim. Same contract as the WARC sink: tmp+rename publish,
    deterministic bytes (sorted lines), one task per shard; returns the
    lazy manifest (cdx_file, n_lines)."""
    os.makedirs(out_dir, exist_ok=True)

    def writer(pdf):
        import pandas as pd

        shard = int(pdf[shard_col].iloc[0])
        name = f"{prefix}-{shard:05d}.cdxj"
        final = os.path.join(out_dir, name)
        tmp = os.path.join(out_dir, f".{name}.tmp-{os.getpid()}")
        lines = sorted(_cdxj_line(r) for r in pdf.itertuples(index=False))
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        os.replace(tmp, final)
        return pd.DataFrame(
            [{
                "cdx_file": name,
                "n_lines": len(lines),
                # key range for shard-pruning sidecars (range layout)
                "min_surt": lines[0].split(" ", 1)[0] if lines else None,
                "max_surt": lines[-1].split(" ", 1)[0] if lines else None,
            }]
        )

    return df.groupBy(shard_col).applyInPandas(
        writer,
        "cdx_file string, n_lines bigint, "
        "min_surt string, max_surt string",
    )


def write_cdx_zipnum(
    df: DataFrame,
    out_dir: str,
    shard_col: str = "shard",
    prefix: str = "zipnum",
    block_lines: int = 3000,
) -> DataFrame:
    """Write pointer rows as ZIPNUM shard files — the compressed
    cc-index layout (pywb zipnum / Common Crawl cluster.idx shape,
    public format docs): each shard is a SURT-sorted sequence of
    independent gzip members ("blocks") of ``block_lines`` CDXJ lines,
    so a reader binary-searches the block index and decompresses ONE
    ~100 KB block per lookup instead of a whole shard. cc-index uses
    3000 lines/block; that default compresses a ~300 GB-scale master
    to ~1/8 while keeping point-lookup cost constant in corpus size.

    Same sink contract as every writer here: tmp+rename publish,
    deterministic bytes (sorted lines, gzip mtime=0), one task per
    shard. Returns the manifest with ONE ROW PER BLOCK (cdx_file,
    block, offset, length, n_lines, min_surt, max_surt) — the rows
    ``merge_cdx(layout='zipnum')`` persists as the ``_cluster.idx``
    secondary index."""
    import gzip as _gzip

    os.makedirs(out_dir, exist_ok=True)

    def writer(pdf):
        import pandas as pd

        shard = int(pdf[shard_col].iloc[0])
        name = f"{prefix}-{shard:05d}.cdxj.gz"
        final = os.path.join(out_dir, name)
        tmp = os.path.join(out_dir, f".{name}.tmp-{os.getpid()}")
        lines = sorted(_cdxj_line(r) for r in pdf.itertuples(index=False))
        blocks = []
        off = 0
        with open(tmp, "wb") as f:
            for i in range(0, len(lines), block_lines):
                chunk = lines[i : i + block_lines]
                comp = _gzip.compress(
                    ("\n".join(chunk) + "\n").encode("utf-8"), mtime=0
                )
                f.write(comp)
                blocks.append(
                    {
                        "cdx_file": name,
                        "block": i // block_lines,
                        "offset": off,
                        "length": len(comp),
                        "n_lines": len(chunk),
                        "min_surt": chunk[0].split(" ", 1)[0],
                        "max_surt": chunk[-1].split(" ", 1)[0],
                    }
                )
                off += len(comp)
        os.replace(tmp, final)
        return pd.DataFrame(
            blocks,
            columns=[
                "cdx_file", "block", "offset", "length",
                "n_lines", "min_surt", "max_surt",
            ],
        )

    return df.groupBy(shard_col).applyInPandas(
        writer,
        "cdx_file string, block bigint, offset bigint, length bigint, "
        "n_lines bigint, min_surt string, max_surt string",
    )


def merge_cdx(
    spark: SparkSession,
    index_dirs: list[str],
    out_dir: str,
    n_shards: int = 4,
    latest_only: bool = False,
    prefix: str = "merged",
    layout: str = "hash",
    block_lines: int = 3000,
    source_df: DataFrame | None = None,
) -> DataFrame:
    """K-way merge of per-round CDXJ shard sets into ONE master index
    — the cc-index maintenance step (pywb's cdx-indexer + sort-merge
    is the tool shape): successive crawl rounds each land their own
    SURT-sorted shards; consumers that want "the index" (incremental
    recrawl planning, dedup probes, random access) should read one
    merged set, not an N-round shard scan.

    ``latest_only=True`` additionally dedups to the LATEST capture per
    SURT key (ties broken by fetch_ts, then filename/offset — total
    order, so retries are deterministic): the "current state of the
    web" view recrawl planners consume. False keeps every capture (the
    full-history view wayback-style replay needs).

    Layouts (both SURT-sorted within each shard):

    * ``hash`` (default) — shards keyed by crc32(surt_key) % n_shards,
      the SAME bucketing the repo's index consumers already probe with
      (q_cdx_index_roundtrip writes fixture indexes this way): a point
      lookup computes its bucket from the key and binary-searches one
      shard; a domain-prefix scan fans out over all shards.
    * ``range`` — shards are GLOBAL SURT ranges (repartitionByRange,
      Spark's sampled range partitioner — the scalable total-order
      shuffle) and a driver-side ``_shards.idx`` sidecar records each
      shard's [min_surt, max_surt]: the cc-index/zipnum cluster.idx
      shape, so a domain-prefix scan opens ONLY the overlapping shards
      (read_cdx_prefix). Boundaries come from sampling and are not
      bit-stable across runs; consumers read the sidecar, never assume
      boundaries, so correctness is boundary-independent.
    * ``zipnum`` — range layout COMPRESSED: each shard is independent
      gzip members of ``block_lines`` CDXJ lines (write_cdx_zipnum)
      and the ``_cluster.idx`` sidecar carries one row per BLOCK, so
      a prefix lookup decompresses only the overlapping ~100 KB
      block(s) (read_cdx_zipnum) — the production cc-index layout.

    Plan: one distributed text scan over every round's shards
    (codegen'd parse, no Python), at most one window per SURT key for
    latest-capture, one shuffle onto the output bucketing; per-task
    memory = one output shard, the same caller-sized bound every sink
    in this package sets.

    EAGER: the merge executes inside this call (exactly once) and the
    returned manifest is a small local DataFrame — so a caller action
    never re-runs the distributed job, and stale files from a previous
    merge into the same ``out_dir`` (higher-numbered shards from a
    larger ``n_shards``, a ``_shards.idx`` left by a range-layout run)
    are swept after the new shards are published, never before."""
    from pyspark.sql import Window

    from roapi_spark.config import TableSource
    from roapi_spark.sources import load_table

    if layout not in ("hash", "range", "zipnum"):
        raise ValueError(f"unknown merge layout {layout!r}")
    real_out = os.path.realpath(out_dir)
    for d in index_dirs:
        if os.path.realpath(d) == real_out:
            raise ValueError(
                "merge_cdx out_dir must not be one of index_dirs "
                f"(self-merge would read and rewrite {out_dir!r})"
            )
    stale = set()
    if os.path.isdir(out_dir):
        # ANY .cdxj is stale, not just the current prefix's: a full-dir
        # cdx read treats every shard in out_dir as one table, so an
        # old run's differently-prefixed shards would double the index
        stale = {
            n
            for n in os.listdir(out_dir)
            if n.endswith((".cdxj", ".cdxj.gz"))
            or n in ("_shards.idx", "_cluster.idx")
        }
    if source_df is not None:
        # caller-supplied pre-parsed union of exactly ``index_dirs``
        # (a caller producing SEVERAL layouts/views from one input set
        # persists the parsed pointer rows once instead of re-scanning
        # the text shards per merge); index_dirs still names the inputs
        # for the self-merge guard above
        df = source_df
    else:
        parts = [
            load_table(
                spark,
                TableSource(name=f"_cdx_{i}", uri=d, format="cdx"),
            )
            for i, d in enumerate(index_dirs)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
    if latest_only:
        w = Window.partitionBy("surt_key").orderBy(
            F.desc("fetch_ts"), F.desc("warc_filename"), F.desc("offset")
        )
        df = (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    if layout in ("range", "zipnum"):
        df = df.repartitionByRange(
            n_shards, "surt_key", "fetch_ts"
        ).withColumn("shard", F.spark_partition_id())
    else:
        df = df.withColumn(
            "shard", F.pmod(F.crc32(F.col("surt_key")), F.lit(n_shards))
        )
    if layout == "zipnum":
        manifest = write_cdx_zipnum(
            df, out_dir, prefix=prefix, block_lines=block_lines
        )
    else:
        manifest = write_cdx(df, out_dir, prefix=prefix)
    collected = manifest.collect()  # the ONE execution of the merge
    written = {r["cdx_file"] for r in collected}
    if layout == "range":
        # shard-cardinality sidecar, tmp+rename like the shards
        rows = sorted(
            (r["min_surt"], r["max_surt"], r["cdx_file"], r["n_lines"])
            for r in collected
            if r["n_lines"] > 0
        )
        tmp = os.path.join(out_dir, f"._shards.idx.tmp-{os.getpid()}")
        with open(tmp, "w", encoding="utf-8") as f:
            for mn, mx, name, n in rows:
                f.write(f"{mn} {mx} {name} {n}\n")
        os.replace(tmp, os.path.join(out_dir, "_shards.idx"))
        written.add("_shards.idx")
    elif layout == "zipnum":
        # block-granular secondary index (cc-index cluster.idx shape)
        rows = sorted(
            (
                r["min_surt"], r["max_surt"], r["cdx_file"],
                r["offset"], r["length"], r["n_lines"],
            )
            for r in collected
        )
        tmp = os.path.join(out_dir, f"._cluster.idx.tmp-{os.getpid()}")
        with open(tmp, "w", encoding="utf-8") as f:
            for mn, mx, name, off, ln, n in rows:
                f.write(f"{mn} {mx} {name} {off} {ln} {n}\n")
        os.replace(tmp, os.path.join(out_dir, "_cluster.idx"))
        written.add("_cluster.idx")
    # sweep leftovers from a previous merge (smaller run, other layout)
    # AFTER publishing — a crash mid-merge never deletes the old index
    for name in stale - written:
        try:
            os.remove(os.path.join(out_dir, name))
        except FileNotFoundError:
            pass
    # local manifest: caller actions must not re-run the distributed job
    return spark.createDataFrame(collected, manifest.schema)


def _range_overlaps(mn: str, mx: str, surt_prefix: str) -> bool:
    """A [min, max] key range can contain prefix-keyed strings iff
    max >= prefix (some key sorts at/above it) and min is not already
    past every prefix-keyed string — i.e. min's first len(prefix)
    chars don't sort above the prefix (robust for any codepoints,
    unlike the prefix+U+10FFFF upper-bound trick)."""
    return mx >= surt_prefix and mn[: len(surt_prefix)] <= surt_prefix


def _prefix_shard_files(
    master_dir: str, surt_prefix: str
) -> list[str] | None:
    """Shard files of a range-layout master whose [min, max] SURT range
    can contain keys with ``surt_prefix`` — the pruning decision, split
    out so gates can assert HOW MANY files a prefix scan opens. Returns
    None when no ``_shards.idx`` sidecar exists (hash layout)."""
    idx_path = os.path.join(master_dir, "_shards.idx")
    if not os.path.exists(idx_path):
        return None
    files = []
    with open(idx_path, encoding="utf-8") as f:
        for line in f:
            mn, mx, name, _n = line.split(" ", 3)
            if _range_overlaps(mn, mx, surt_prefix):
                files.append(name)
    return files


def read_cdx_prefix(
    spark: SparkSession, master_dir: str, surt_prefix: str
) -> DataFrame:
    """Domain-prefix scan over a range-layout master index: the
    ``_shards.idx`` sidecar prunes to the shards (underscore-prefixed so directory text scans skip it, the Hadoop convention) whose [min, max] range
    can contain the prefix, so a 100 TB-corpus index opens only the
    file(s) covering that domain instead of every shard. Falls back
    to the full set when no sidecar exists (hash layout)."""
    from roapi_spark.config import TableSource
    from roapi_spark.sources import load_table

    files = _prefix_shard_files(master_dir, surt_prefix)
    if files is not None and not files:
        # prefix outside every shard range: empty frame, zero files read
        from roapi_spark.sources.cdx import SCHEMA

        return spark.createDataFrame([], SCHEMA)
    uri = (
        [os.path.join(master_dir, n) for n in files]
        if files is not None
        else master_dir
    )
    if isinstance(uri, list):
        reader = spark.read.text(uri)
        from roapi_spark.sources.cdx import parse_cdx_lines

        df = parse_cdx_lines(reader)
    else:
        df = load_table(
            spark, TableSource(name="_pfx", uri=uri, format="cdx")
        )
    return df.filter(F.col("surt_key").startswith(surt_prefix))


def _prefix_blocks(
    master_dir: str, surt_prefix: str
) -> list[tuple[str, int, int]]:
    """(file, offset, length) of the zipnum blocks whose key range can
    contain ``surt_prefix`` keys, from the ``_cluster.idx`` sidecar.
    Raises when the sidecar is missing — a zipnum reader pointed at a
    non-zipnum directory is a caller bug, not a fall-back case."""
    idx_path = os.path.join(master_dir, "_cluster.idx")
    if not os.path.exists(idx_path):
        raise FileNotFoundError(
            f"no _cluster.idx in {master_dir!r} — not a zipnum master "
            "(merge_cdx(layout='zipnum') writes one)"
        )
    blocks = []
    with open(idx_path, encoding="utf-8") as f:
        for line in f:
            mn, mx, name, off, ln, _n = line.split(" ", 5)
            if _range_overlaps(mn, mx, surt_prefix):
                blocks.append((name, int(off), int(ln)))
    return blocks


def read_cdx_zipnum(
    spark: SparkSession, master_dir: str, surt_prefix: str
) -> DataFrame:
    """Prefix lookup over a ZIPNUM master index: the block-granular
    ``_cluster.idx`` sidecar narrows the read to the gzip member(s)
    whose key range covers the prefix, and an Arrow-batched kernel
    seeks + decompresses ONLY those ~100 KB blocks executor-side (the
    fetch_records pattern — never a shard scan, never driver-side
    rows). At cc-index scale (3000-line blocks, ~100 GB compressed
    master) a point lookup touches one block regardless of corpus
    size; a domain scan touches ceil(domain_rows / block_lines)."""
    from roapi_spark.sources.cdx import SCHEMA, parse_cdx_lines

    blocks = _prefix_blocks(master_dir, surt_prefix)
    if not blocks:
        return spark.createDataFrame([], SCHEMA)
    bdf = spark.createDataFrame(
        blocks, "cdx_file string, offset bigint, length bigint"
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            vals: list[str] = []
            for tup in pdf.itertuples(index=False):
                with open(
                    os.path.join(master_dir, str(tup.cdx_file)), "rb"
                ) as f:
                    f.seek(int(tup.offset))
                    raw = f.read(int(tup.length))
                text = zlib.decompress(raw, wbits=31).decode("utf-8")
                vals.extend(ln for ln in text.split("\n") if ln)
            yield pd.DataFrame({"value": vals})

    lines = bdf.mapInPandas(kernel, "value string")
    return parse_cdx_lines(lines).filter(
        F.col("surt_key").startswith(surt_prefix)
    )


def asof_snapshot(index_df: DataFrame, asof_ts: str) -> DataFrame:
    """Wayback-style as-of view of a FULL-HISTORY CDX index: the latest
    capture per SURT key with ``fetch_ts <= asof_ts`` — the resolution
    rule archive replay uses (pywb's closest-before semantics for a
    point in time). Ties break by fetch_ts, then filename/offset — the
    SAME total order merge_cdx(latest_only=True) applies, so an as-of
    snapshot at "now" equals the latest-capture master by construction.

    Pure DataFrame composition (filter -> one window per SURT key), so
    at 100 TB it runs as one shuffle over the index (~1000x smaller
    than the archives) and the result joins/fetches like any pointer
    set (sources/warc.fetch_records)."""
    from pyspark.sql import Window

    w = Window.partitionBy("surt_key").orderBy(
        F.desc("fetch_ts"), F.desc("warc_filename"), F.desc("offset")
    )
    return (
        index_df.filter(F.col("fetch_ts") <= F.lit(asof_ts))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
