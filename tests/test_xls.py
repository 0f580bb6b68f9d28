"""Tests for the pure-Python legacy .xls (BIFF8) decoder
(roapi_spark/sources/xls.py): hand-rolled CFB container + BIFF8 workbook
stream fixtures exercising SST CONTINUE spans, RK/MULRK encodings,
cached formula results, and the excel-loader dispatch.
Reference parity target: calamine's xls support behind
columnq/src/table/excel.rs:220-360."""

from __future__ import annotations

import struct

import pytest

from roapi_spark.sources.xls import XlsError, read_xls, sheet_names, _rk_value

SECTOR_END = 0xFFFFFFFE
SECTOR_FREE = 0xFFFFFFFF


def _rec(rid: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rid, len(payload)) + payload


def _bof(dt: int) -> bytes:
    return _rec(0x0809, struct.pack("<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC, 0, 0))


def _sst(strings: list[str], split_at: int | None = None) -> bytes:
    """SST record; if split_at is given, the byte stream is split into a
    CONTINUE record at that byte offset *inside a string's chars* with a
    restated grbit — the BIFF8 continuation trap."""
    body = b""
    for s in strings:
        wide = any(ord(c) > 0xFF for c in s)
        body += struct.pack("<HB", len(s), 0x01 if wide else 0x00)
        body += s.encode("utf-16-le" if wide else "latin-1")
    counts = struct.pack("<II", len(strings), len(strings))
    if split_at is None:
        return _rec(0x00FC, counts + body)
    head, tail = body[:split_at], body[split_at:]
    # continuation restates the grbit for the remaining (compressed) chars
    return _rec(0x00FC, counts + head) + _rec(0x003C, b"\x00" + tail)


def _boundsheet(name: str, pos: int) -> bytes:
    return _rec(
        0x0085,
        struct.pack("<IBB", pos, 0, 0)
        + bytes([len(name)])
        + b"\x00"
        + name.encode("latin-1"),
    )


def _cell(rid: int, row: int, col: int, payload: bytes) -> bytes:
    return _rec(rid, struct.pack("<HHH", row, col, 0) + payload)


def _cfb(workbook: bytes) -> bytes:
    """Minimal spec-conformant compound file: FAT sector 0, directory
    sector 1, workbook stream from sector 2 (padded past the 4096-byte
    mini-stream cutoff so it lives in the regular FAT)."""
    workbook = workbook + b"\x00" * max(0, 4608 - len(workbook))
    ssz = 512
    n_wb = (len(workbook) + ssz - 1) // ssz
    workbook = workbook.ljust(n_wb * ssz, b"\x00")

    fat = [0xFFFFFFFD, SECTOR_END]  # sector 0 = FAT itself, 1 = directory
    fat += [i + 1 for i in range(2, 2 + n_wb - 1)] + [SECTOR_END]  # wb chain
    fat += [SECTOR_FREE] * (ssz // 4 - len(fat))

    def dirent(name: str, etype: int, start: int, size: int) -> bytes:
        raw = name.encode("utf-16-le")
        e = raw.ljust(64, b"\x00")
        e += struct.pack("<H", len(raw) + 2)
        e += bytes([etype, 0])
        e += struct.pack("<III", 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF)
        e += b"\x00" * 36  # clsid + state + times
        e += struct.pack("<II", start, size)
        e += b"\x00" * 4
        return e

    directory = (
        dirent("Root Entry", 5, SECTOR_END, 0)
        + dirent("Workbook", 2, 2, len(workbook))
        + b"\x00" * 128 * 2
    )

    header = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 16
    header += struct.pack("<HHHHHH", 0x003E, 0x0003, 0xFFFE, 9, 6, 0)
    header += b"\x00" * 4  # reserved
    header += struct.pack("<I", 0)  # num dir sectors (v3: 0)
    header += struct.pack("<I", 1)  # num FAT sectors
    header += struct.pack("<I", 1)  # first directory sector
    header += struct.pack("<I", 0)  # transaction
    header += struct.pack("<I", 4096)  # mini cutoff
    header += struct.pack("<II", SECTOR_END, 0)  # miniFAT start/count
    header += struct.pack("<II", SECTOR_END, 0)  # DIFAT start/count
    header += struct.pack("<I", 0)  # DIFAT[0] -> FAT at sector 0
    header += struct.pack("<I", SECTOR_FREE) * 108
    assert len(header) == 512
    return header + struct.pack(f"<{ssz // 4}I", *fat) + directory.ljust(ssz, b"\x00") + workbook


def _workbook(sheets: dict[str, bytes], sst: bytes) -> bytes:
    """Globals substream + sheet substreams with patched BOUNDSHEET offsets."""
    names = list(sheets)
    globals_len = (
        len(_bof(0x0005))
        + len(sst)
        + sum(len(_boundsheet(n, 0)) for n in names)
        + len(_rec(0x000A, b""))
    )
    offsets, pos = [], globals_len
    for n in names:
        offsets.append(pos)
        pos += len(sheets[n])
    out = _bof(0x0005) + sst
    for n, off in zip(names, offsets):
        out += _boundsheet(n, off)
    out += _rec(0x000A, b"")
    for n in names:
        out += sheets[n]
    return out


@pytest.fixture
def xls_path(tmp_path):
    long_s = "zebra stripes repeat " * 20  # 420 chars: spans into CONTINUE
    sst = _sst(["city", "pop", "ok", "london", long_s, "ünïcödé→wide"], split_at=40)
    sheet1 = (
        _bof(0x0010)
        + _cell(0x00FD, 0, 0, struct.pack("<I", 0))  # LABELSST "city"
        + _cell(0x00FD, 0, 1, struct.pack("<I", 1))  # "pop"
        + _cell(0x00FD, 0, 2, struct.pack("<I", 2))  # "ok"
        + _cell(0x00FD, 1, 0, struct.pack("<I", 3))  # "london"
        + _cell(0x0203, 1, 1, struct.pack("<d", 8900000.0))  # NUMBER
        + _cell(0x0205, 1, 2, bytes([1, 0]))  # BOOLERR true
        + _cell(0x00FD, 2, 0, struct.pack("<I", 4))  # long CONTINUE string
        + _cell(0x027E, 2, 1, struct.pack("<I", (1077 << 2) | 0x02))  # RK int
        + _cell(0x0205, 2, 2, bytes([0, 0]))  # BOOLERR false
        + _cell(0x00FD, 3, 0, struct.pack("<I", 5))  # wide string
        # MULRK: two RKs in row 3, cols 1-2: 1.5 (float rk) and -3 (int rk)
        + _rec(
            0x00BD,
            struct.pack("<HH", 3, 1)
            + struct.pack("<HI", 0, struct.unpack("<Q", struct.pack("<d", 1.5))[0] >> 32 & 0xFFFFFFFC)
            + struct.pack("<HI", 0, ((-3 << 2) & 0xFFFFFFFF) | 0x02)
            + struct.pack("<H", 2),
        )
        + _rec(0x000A, b"")
    )
    sheet2 = (
        _bof(0x0010)
        + _cell(0x0203, 0, 0, struct.pack("<d", 42.5))
        + _rec(0x000A, b"")
    )
    wb = _workbook({"cities": sheet1, "extra": sheet2}, sst)
    p = tmp_path / "wb.xls"
    p.write_bytes(_cfb(wb))
    return str(p)


def test_rk_encodings():
    assert _rk_value((1077 << 2) | 0x02) == 1077
    assert _rk_value(((-3 << 2) & 0xFFFFFFFF) | 0x02) == -3
    f15 = struct.unpack("<Q", struct.pack("<d", 1.5))[0] >> 32 & 0xFFFFFFFC
    assert _rk_value(f15) == 1.5
    # cents flag: integer 12345 / 100
    assert _rk_value((12345 << 2) | 0x03) == 123.45


def test_sheet_names_and_grid(xls_path):
    assert sheet_names(xls_path) == ["cities", "extra"]
    grid = read_xls(xls_path)
    assert grid[0] == ["city", "pop", "ok"]
    assert grid[1] == ["london", 8900000, True]
    assert grid[2][0] == "zebra stripes repeat " * 20  # survived CONTINUE split
    assert grid[2][1:] == [1077, False]
    assert grid[3] == ["ünïcödé→wide", 1.5, -3]
    assert read_xls(xls_path, "extra") == [[42.5]]
    assert read_xls(xls_path, 1) == [[42.5]]


def test_loader_dispatch_and_upcast(spark, xls_path):
    from roapi_spark.config import TableSource
    from roapi_spark.sources.excel import to_dataframe

    df = to_dataframe(spark, TableSource(name="cities", uri=xls_path, format="xls"))
    # pop mixes int/float -> numeric unification to double (excel.rs merges
    # Int/Float); ok mixes bool/int -> a real conflict, Utf8 upcast
    assert df.count() == 3
    got = {r.city: (r.pop, r.ok) for r in df.collect()}
    assert got["london"] == (8900000.0, "True")


def test_encrypted_rejected(tmp_path):
    sst = _sst(["a"])
    wb = _bof(0x0005) + _rec(0x002F, b"\x00\x00") + sst + _rec(0x000A, b"")
    p = tmp_path / "enc.xls"
    p.write_bytes(_cfb(wb))
    with pytest.raises(XlsError, match="encrypted"):
        read_xls(str(p))


def test_not_ole2_rejected(tmp_path):
    p = tmp_path / "no.xls"
    p.write_bytes(b"plainly not a compound file")
    with pytest.raises(XlsError, match="magic"):
        read_xls(str(p))


def test_truncated_xls_raises_load_error(spark, xls_path, tmp_path):
    """Corrupt/truncated .xls must surface as LoadError from the excel
    loader — never a raw IndexError/struct.error traceback (the CFB and
    BIFF parsers slice and unpack aggressively)."""
    from roapi_spark.config import TableSource
    from roapi_spark.sources import LoadError
    from roapi_spark.sources.excel import to_dataframe

    raw = open(xls_path, "rb").read()
    # cut inside the header, FAT, directory, and workbook stream
    for cut in (100, 513, 700, 1025, 1500, 2049, len(raw) - 700, len(raw) - 37):
        p = tmp_path / f"cut_{cut}.xls"
        p.write_bytes(raw[:cut])
        try:
            to_dataframe(spark, TableSource(name="t", uri=str(p), format="xls"))
        except LoadError:
            pass  # the contract: a typed, message-bearing error


def test_truncated_sst_is_xls_error(tmp_path):
    """SST declaring more string bytes than the record stream carries
    must raise XlsError (exhausted parts), not IndexError."""
    # declare a 50-char string but provide only 10 bytes of chars
    body = struct.pack("<HB", 50, 0x00) + b"only10byte"
    sst = _rec(0x00FC, struct.pack("<II", 1, 1) + body)
    sheet = _bof(0x0010) + _cell(0x00FD, 0, 0, struct.pack("<I", 0)) + _rec(0x000A, b"")
    wb = _workbook({"s": sheet}, sst)
    p = tmp_path / "badsst.xls"
    p.write_bytes(_cfb(wb))
    with pytest.raises(XlsError):
        read_xls(str(p))
