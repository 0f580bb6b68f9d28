"""CDX sink robustness: the pointer math the roundtrip gate can't pin
one failure at a time — member-span recovery, layout classification,
and the fail-loud contracts (solid gzip, truncated members)."""

from __future__ import annotations

import gzip
import zlib

import pytest

from roapi_spark.sinks.cdx import _iter_member_spans, iter_record_pointers
from roapi_spark.sources.warc import WarcFormatError, read_record_at


def _rec(uri: str, body: bytes) -> bytes:
    block = (
        f"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body
    return (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        "WARC-Record-ID: <urn:uuid:x>\r\n"
        "WARC-Date: 2026-01-01T00:00:00Z\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    ).encode() + block + b"\r\n\r\n"


def test_member_spans_are_exact(tmp_path):
    members = [gzip.compress(_rec(f"https://x/{i}", b"b" * i), mtime=0)
               for i in (1, 50, 3)]
    data = b"".join(members)
    spans = list(_iter_member_spans(data, "t"))
    assert [(off, ln) for off, ln, _ in spans] == [
        (0, len(members[0])),
        (len(members[0]), len(members[1])),
        (len(members[0]) + len(members[1]), len(members[2])),
    ]


def test_pointers_fetch_back_both_layouts(tmp_path):
    recs = [_rec(f"https://x/{i}", bytes([65 + i]) * (10 + i)) for i in range(3)]
    gz = tmp_path / "a.warc.gz"
    gz.write_bytes(b"".join(gzip.compress(r, mtime=0) for r in recs))
    plain = tmp_path / "b.warc"
    plain.write_bytes(b"".join(recs))
    for path in (gz, plain):
        ptrs = list(iter_record_pointers(str(path), path.name))
        assert [r["target_uri"] for _, _, r in ptrs] == [
            f"https://x/{i}" for i in range(3)
        ]
        # every pointer must round-trip through the random-access reader
        for off, ln, rec in ptrs:
            got = read_record_at(str(path), off, ln)
            assert got["target_uri"] == rec["target_uri"]
            assert got["payload"] == rec["payload"]


def test_solid_gzip_rejected(tmp_path):
    recs = b"".join(_rec(f"https://x/{i}", b"z") for i in range(3))
    p = tmp_path / "solid.warc.gz"
    p.write_bytes(gzip.compress(recs, mtime=0))  # ONE member, 3 records
    with pytest.raises(WarcFormatError, match="member-per-record"):
        list(iter_record_pointers(str(p), "solid"))


def test_truncated_member_rejected(tmp_path):
    good = gzip.compress(_rec("https://x/0", b"ok"), mtime=0)
    p = tmp_path / "trunc.warc.gz"
    p.write_bytes(good + good[: len(good) // 2])
    with pytest.raises((WarcFormatError, zlib.error), match=""):
        list(iter_record_pointers(str(p), "trunc"))

def test_member_spans_chunked_feed():
    """The chunked walker (each byte copied O(1) times — ADVICE fix)
    must recover exact spans when chunk << member, chunk ~ member, and
    many members fit in one chunk; fixture-sized defaults never
    exercise the multi-chunk path, so force tiny chunks here."""
    members = [
        gzip.compress(_rec(f"https://x/{i}", bytes([97 + i]) * n), mtime=0)
        for i, n in enumerate((900, 3, 40, 0, 2000))
    ]
    data = b"".join(members)
    want = []
    off = 0
    for m in members:
        want.append((off, len(m)))
        off += len(m)
    for chunk in (7, 64, 1 << 20):
        spans = list(_iter_member_spans(data, "t", chunk=chunk))
        assert [(o, ln) for o, ln, _ in spans] == want, f"chunk={chunk}"
        # decompressed bytes must be exact too, not just the framing
        assert [raw for _, _, raw in spans] == [
            gzip.decompress(m) for m in members
        ]


def test_truncated_member_rejected_chunked():
    good = gzip.compress(_rec("https://x/0", b"ok"), mtime=0)
    data = good + good[: len(good) // 2]
    with pytest.raises((WarcFormatError, zlib.error)):
        list(_iter_member_spans(data, "t", chunk=5))


def _cdx_rows(spark, rows):
    return spark.createDataFrame(
        rows,
        "surt_key string, fetch_ts string, url string, mime string, "
        "status int, digest string, length bigint, offset bigint, "
        "warc_filename string",
    )


def test_range_layout_master_and_prefix_pruning(spark, tmp_path):
    """merge_cdx(layout='range'): shards are global SURT ranges with a
    shards.idx sidecar; a prefix scan opens ONLY overlapping shards
    and returns the same rows as filtering a full scan."""
    from roapi_spark.config import TableSource
    from roapi_spark.sinks.cdx import merge_cdx, read_cdx_prefix, write_cdx
    from roapi_spark.sources import load_table

    import pyspark.sql.functions as F

    rows = [
        (
            f"{dom}}}/p/{i}", "20260101000000", f"https://{dom}/p/{i}",
            "text/html", 200, f"sha1:{i}", 10, i * 10, "a.warc.gz",
        )
        for dom in ("com,alpha)", "com,beta)", "org,gamma)")
        for i in range(40)
    ]
    # keys look like 'com,alpha)}/p/0' — '}' keeps the SURT shape while
    # staying lexicographically simple for the range assertions
    src_dir = str(tmp_path / "round")
    write_cdx(
        _cdx_rows(spark, rows).withColumn(
            "shard", F.pmod(F.crc32("surt_key"), F.lit(2))
        ),
        src_dir,
    ).collect()

    master = str(tmp_path / "master")
    man = merge_cdx(
        spark, [src_dir], master, n_shards=4, layout="range"
    ).collect()
    idx = (tmp_path / "master" / "_shards.idx").read_text().splitlines()
    assert 1 < len(idx) <= 4
    # sidecar ranges are ordered and non-overlapping, and match files
    spans = [line.split(" ") for line in idx]
    for (mn, mx, name, n) in spans:
        body = (tmp_path / "master" / name).read_text().splitlines()
        assert body[0].split(" ")[0] == mn
        assert body[-1].split(" ")[0] == mx
        assert len(body) == int(n)
        assert body == sorted(body)
    for a, b in zip(spans, spans[1:]):
        assert a[1] <= b[0], "ranges must not overlap"

    # pruned prefix scan == full-scan filter, reading fewer files
    full = load_table(
        spark, TableSource(name="m", uri=master, format="cdx")
    )
    want = sorted(
        r["url"] for r in full.filter(
            F.col("surt_key").startswith("com,beta)")
        ).collect()
    )
    got_df = read_cdx_prefix(spark, master, "com,beta)")
    assert sorted(r["url"] for r in got_df.collect()) == want
    overlapping = [
        name for mn, mx, name, _ in spans
        if mx >= "com,beta)" and mn <= "com,beta)\U0010ffff"
    ]
    assert len(overlapping) < len(spans), (
        "prefix must prune at least one shard on this key distribution"
    )
    # a prefix beyond every range reads nothing and returns empty
    assert read_cdx_prefix(spark, master, "zz,nowhere)").count() == 0


def test_remerge_sweeps_stale_layout_and_is_local(spark, tmp_path):
    """Re-merging into a reused out_dir must not leave the previous
    run's sidecar or higher-numbered shards behind (a hash re-merge
    after a range merge, or a smaller n_shards, would otherwise poison
    prefix pruning and full-dir scans); and the returned manifest is a
    LOCAL DataFrame — caller actions never re-run the distributed
    merge."""
    import shutil

    import pyspark.sql.functions as F

    from roapi_spark.config import TableSource
    from roapi_spark.sinks.cdx import merge_cdx, write_cdx
    from roapi_spark.sources import load_table

    rows = [
        (
            f"com,site)/p/{i}", "20260101000000", f"https://site.com/p/{i}",
            "text/html", 200, f"sha1:{i}", 10, i * 10, "a.warc.gz",
        )
        for i in range(40)
    ]
    src_dir = str(tmp_path / "round")
    write_cdx(
        _cdx_rows(spark, rows).withColumn(
            "shard", F.pmod(F.crc32("surt_key"), F.lit(2))
        ),
        src_dir,
    ).collect()

    master = tmp_path / "master"
    merge_cdx(spark, [src_dir], str(master), n_shards=4, layout="range")
    assert (master / "_shards.idx").exists()

    # self-merge is refused before anything is touched
    with pytest.raises(ValueError, match="self-merge"):
        merge_cdx(spark, [str(master)], str(master))

    man = merge_cdx(spark, [src_dir], str(master), n_shards=2, layout="hash")
    names = sorted(p.name for p in master.iterdir())
    assert "_shards.idx" not in names, "stale range sidecar must be swept"
    assert all(n in ("merged-00000.cdxj", "merged-00001.cdxj") for n in names), (
        f"stale higher-numbered shards must be swept: {names}"
    )
    got = load_table(
        spark, TableSource(name="m2", uri=str(master), format="cdx")
    )
    assert got.count() == len(rows)

    # a re-merge under a DIFFERENT prefix must sweep the old prefix's
    # shards too — a full-dir cdx read treats every .cdxj as one table
    merge_cdx(
        spark, [src_dir], str(master), n_shards=2, prefix="master"
    )
    names = sorted(p.name for p in master.iterdir())
    assert all(n.startswith("master-") for n in names), names
    got2 = load_table(
        spark, TableSource(name="m3", uri=str(master), format="cdx")
    )
    assert got2.count() == len(rows)

    # manifest survives source deletion => the merge ran exactly once,
    # inside merge_cdx, and the result is driver-local
    shutil.rmtree(src_dir)
    assert sum(r["n_lines"] for r in man.collect()) == len(rows)


def test_write_cdx_rejects_space_bearing_keys(spark, tmp_path):
    """Keys that bypass url_to_surt's %20 encoding and still carry a
    literal space would silently corrupt the space-delimited CDXJ line
    format — the writer must fail loudly naming the key."""
    import pyspark.sql.functions as F

    from roapi_spark.sinks.cdx import write_cdx

    bad = _cdx_rows(
        spark,
        [(
            "com,x)/a b", "20260101000000", "https://x.com/a b",
            "text/html", 200, "sha1:x", 10, 0, "a.warc.gz",
        )],
    ).withColumn("shard", F.lit(0))
    with pytest.raises(Exception, match="must not contain spaces"):
        write_cdx(bad, str(tmp_path / "out")).collect()


def test_space_url_roundtrips_through_index(spark, tmp_path):
    """A space-bearing URL indexed via url_to_surt lands as one intact
    CDXJ line (%20 key) and parses back with the original URL."""
    import pyspark.sql.functions as SF

    from roapi_spark.config import TableSource
    from roapi_spark.functions.web import url_to_surt
    from roapi_spark.sinks.cdx import write_cdx
    from roapi_spark.sources import load_table

    df = spark.createDataFrame(
        [("https://x.com/a b/c",)], "url string"
    ).select(
        url_to_surt(SF.col("url")).alias("surt_key"),
        SF.lit("20260101000000").alias("fetch_ts"),
        "url",
        SF.lit("text/html").alias("mime"),
        SF.lit(200).alias("status"),
        SF.lit("sha1:x").alias("digest"),
        SF.lit(10).cast("bigint").alias("length"),
        SF.lit(0).cast("bigint").alias("offset"),
        SF.lit("a.warc.gz").alias("warc_filename"),
        SF.lit(0).alias("shard"),
    )
    out = str(tmp_path / "idx")
    write_cdx(df, out).collect()
    got = load_table(
        spark, TableSource(name="sp", uri=out, format="cdx")
    ).collect()
    assert len(got) == 1
    assert got[0]["surt_key"] == "com,x)/a%20b/c"
    assert got[0]["url"] == "https://x.com/a b/c"


def test_zipnum_layout_roundtrip_and_block_pruning(spark, tmp_path):
    """merge_cdx(layout='zipnum'): shards are concatenated gzip members
    of block_lines CDXJ lines with a block-granular _cluster.idx; a
    prefix lookup decompresses only overlapping blocks and returns the
    same rows as a full decompress + filter."""
    import gzip

    import pyspark.sql.functions as F

    from roapi_spark.sinks.cdx import (
        _prefix_blocks,
        merge_cdx,
        read_cdx_zipnum,
        write_cdx,
    )

    rows = [
        (
            f"{dom}}}/p/{i:03d}", "20260101000000", f"https://{dom}/p/{i}",
            "text/html", 200, f"sha1:{i}", 10, i * 10, "a.warc.gz",
        )
        for dom in ("com,alpha)", "com,beta)", "org,gamma)")
        for i in range(40)
    ]
    src_dir = str(tmp_path / "round")
    write_cdx(
        _cdx_rows(spark, rows).withColumn(
            "shard", F.pmod(F.crc32("surt_key"), F.lit(2))
        ),
        src_dir,
    ).collect()

    master = tmp_path / "master"
    man = merge_cdx(
        spark, [src_dir], str(master), n_shards=2,
        layout="zipnum", block_lines=16,
    )
    files = sorted(p.name for p in master.iterdir())
    assert "_cluster.idx" in files
    gz = [n for n in files if n.endswith(".cdxj.gz")]
    assert gz, files
    # every shard decompresses as concatenated members; all 120 rows land
    all_lines = []
    for n in gz:
        raw = (master / n).read_bytes()
        text = gzip.decompress(raw)  # gzip handles concatenated members
        all_lines += [ln for ln in text.decode().split("\n") if ln]
    assert len(all_lines) == len(rows)
    # manifest: one row per block, each block <= block_lines lines
    blocks = man.collect()
    assert sum(r["n_lines"] for r in blocks) == len(rows)
    assert all(0 < r["n_lines"] <= 16 for r in blocks)
    assert len(blocks) >= len(rows) // 16

    # pruned prefix lookup == full filter, touching fewer blocks
    want = sorted(
        ln.split(" ", 1)[0] for ln in all_lines
        if ln.startswith("com,beta)")
    )
    got = read_cdx_zipnum(spark, str(master), "com,beta)")
    assert sorted(r["surt_key"] for r in got.collect()) == want
    opened = _prefix_blocks(str(master), "com,beta)")
    assert 0 < len(opened) < len(blocks), (
        "a one-domain prefix must prune most blocks at 16-line blocks"
    )
    # absent prefix: zero blocks, empty result
    assert _prefix_blocks(str(master), "zz,nowhere)") == []
    assert read_cdx_zipnum(spark, str(master), "zz,nowhere)").count() == 0

    # a later plaintext re-merge sweeps the zipnum files too
    merge_cdx(spark, [src_dir], str(master), n_shards=2, layout="hash")
    names = sorted(p.name for p in master.iterdir())
    assert not any(n.endswith(".cdxj.gz") for n in names), names
    assert "_cluster.idx" not in names


def test_asof_snapshot_ties_and_boundaries(spark):
    """asof_snapshot: inclusive boundary (fetch_ts == t resolves),
    closest-before wins, and equal-timestamp ties break by filename
    then offset — the same total order merge_cdx(latest_only) uses."""
    from roapi_spark.sinks.cdx import asof_snapshot

    rows = [
        # one page, three captures; two captures share a timestamp
        ("com,x)/a", "20260101000000", "https://x.com/a", "text/html",
         200, "sha1:1", 10, 0, "r1-a.warc.gz"),
        ("com,x)/a", "20260201000000", "https://x.com/a", "text/html",
         200, "sha1:2", 10, 0, "r2-a.warc.gz"),
        ("com,x)/a", "20260201000000", "https://x.com/a", "text/html",
         200, "sha1:3", 10, 64, "r2-a.warc.gz"),
    ]
    idx = _cdx_rows(spark, rows)

    def pick(ts):
        got = asof_snapshot(idx, ts).collect()
        return [(r["fetch_ts"], r["warc_filename"], r["offset"], r["digest"])
                for r in got]

    assert pick("20251231000000") == []  # before every capture
    assert pick("20260101000000") == [
        ("20260101000000", "r1-a.warc.gz", 0, "sha1:1")
    ]  # inclusive boundary
    assert pick("20260115000000") == [
        ("20260101000000", "r1-a.warc.gz", 0, "sha1:1")
    ]  # closest BEFORE, never after
    assert pick("20260301000000") == [
        ("20260201000000", "r2-a.warc.gz", 64, "sha1:3")
    ]  # tie on ts -> max(filename, offset), deterministic
