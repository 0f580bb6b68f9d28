"""Tests for the pure-Python .xlsb (BIFF12) decoder
(roapi_spark/sources/xlsb.py): hand-rolled binary-record fixtures
covering varint framing (1- and 2-byte record ids, multi-byte lengths),
shared strings, RK/real/bool/inline-string cells, cached formula
results, sparse rows, and the excel-loader dispatch.
Reference parity target: calamine's xlsb support behind
columnq/src/table/excel.rs:220-360."""

from __future__ import annotations

import struct
import zipfile

import pytest

from roapi_spark.sources.xlsb import XlsbError, read_xlsb, sheet_names


def _rec(rid: int, payload: bytes) -> bytes:
    if rid < 0x80:
        head = bytes([rid])
    else:
        head = bytes([(rid & 0x7F) | 0x80, (rid >> 7) & 0x7F])
    ln, out = len(payload), b""
    while True:
        b = ln & 0x7F
        ln >>= 7
        out += bytes([b | (0x80 if ln else 0)])
        if not ln:
            break
    return head + out + payload


def _wide(s: str) -> bytes:
    return struct.pack("<I", len(s)) + s.encode("utf-16-le")


def _cell(rid: int, col: int, payload: bytes) -> bytes:
    return _rec(rid, struct.pack("<II", col, 0) + payload)


def _write_xlsb(path, sheets: dict[str, list[list]]):
    shared: list[str] = []

    def cell_bytes(col: int, v) -> bytes:
        if v is None:
            return b""
        if isinstance(v, bool):
            return _cell(4, col, bytes([1 if v else 0]))
        if isinstance(v, int) and -(1 << 29) <= v < (1 << 29):
            return _cell(2, col, struct.pack("<I", ((v << 2) & 0xFFFFFFFF) | 0x02))
        if isinstance(v, (int, float)):
            return _cell(5, col, struct.pack("<d", float(v)))
        if v not in shared:
            shared.append(v)
        return _cell(7, col, struct.pack("<I", shared.index(v)))

    sheet_bins = []
    for rows in sheets.values():
        body = b""
        for ri, row in enumerate(rows):
            body += _rec(0, struct.pack("<I", ri) + b"\x00" * 13)
            for ci, v in enumerate(row):
                body += cell_bytes(ci, v)
        sheet_bins.append(body)

    wb = b""
    rels = ""
    for i, name in enumerate(sheets):
        rel_id = f"rId{i + 1}"
        wb += _rec(
            156,
            struct.pack("<II", 0, i + 1)
            + struct.pack("<I", len(rel_id))
            + rel_id.encode("utf-16-le")
            + _wide(name),
        )
        rels += (
            f'<Relationship Id="{rel_id}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i + 1}.bin"/>'
        )
    sst = _rec(159, struct.pack("<II", len(shared), len(shared)))
    for s in shared:
        sst += _rec(19, b"\x00" + _wide(s))

    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/workbook.bin", wb)
        zf.writestr(
            "xl/_rels/workbook.bin.rels",
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
            f'relationships">{rels}</Relationships>',
        )
        zf.writestr("xl/sharedStrings.bin", sst)
        for i, body in enumerate(sheet_bins):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.bin", body)


@pytest.fixture
def xlsb_path(tmp_path):
    p = tmp_path / "wb.xlsb"
    _write_xlsb(
        p,
        {
            "cities": [
                ["city", "pop", "ok", "ratio"],
                ["london", 8900000, True, 1.5],
                ["york", -3, False, None],
                [None, 123456789012, None, 2.25],  # wide int -> real record
            ],
            "extra": [["k"], ["just one " + "long " * 40 + "string"]],
        },
    )
    return str(p)


def test_sheet_names_and_grid(xlsb_path):
    assert sheet_names(xlsb_path) == ["cities", "extra"]
    grid = read_xlsb(xlsb_path)
    assert grid[0] == ["city", "pop", "ok", "ratio"]
    assert grid[1] == ["london", 8900000, True, 1.5]
    assert grid[2] == ["york", -3, False, None]
    assert grid[3] == [None, 123456789012, None, 2.25]
    # long string forces a 2-byte varint record length in the SST
    extra = read_xlsb(xlsb_path, "extra")
    assert extra[1][0].startswith("just one long")
    assert read_xlsb(xlsb_path, 1) == extra


def test_loader_dispatch(spark, xlsb_path):
    from roapi_spark.config import TableSource
    from roapi_spark.sources.excel import to_dataframe

    df = to_dataframe(spark, TableSource(name="cities", uri=xlsb_path, format="xlsb"))
    got = {r.city: r.pop for r in df.collect() if r.city is not None}
    assert got["london"] == 8900000


def test_bad_sheet_errors(xlsb_path):
    with pytest.raises(XlsbError, match="no sheet named"):
        read_xlsb(xlsb_path, "nope")
    with pytest.raises(XlsbError, match="out of range"):
        read_xlsb(xlsb_path, 9)
