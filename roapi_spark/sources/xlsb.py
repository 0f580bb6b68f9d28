"""Minimal pure-Python ``.xlsb`` (BIFF12 binary workbook) decoder —
stdlib zipfile + struct only.

Completes the Excel format matrix vs the reference's calamine loader
(``columnq/src/table/excel.rs:220-360`` handles xls/xlsx/xlsb/ods): an
``.xlsb`` package is an OPC zip like ``.xlsx``, but the workbook, shared
strings, and worksheets are binary record streams (MS-XLSB) instead of
XML. Same dense row-major grid contract as the xlsx/ods/xls readers.

Record framing: 1-2 byte record id (high bit of byte 0 selects the
2-byte form), then a 1-4 byte 7-bit-varint length. Covered records:
BrtBundleSh (sheet directory), BrtBeginSst/BrtSSTItem (shared strings),
BrtRowHdr, BrtCellBlank/Rk/Error/Bool/Real/St/Isst and the cached
BrtFmlaNum/String/Bool results. RK numbers use the same 30-bit
int/float + /100 encoding as BIFF8 (decoded by
:func:`roapi_spark.sources.xls._rk_value`).
"""

from __future__ import annotations

import struct
import zipfile
import xml.etree.ElementTree as ET
from typing import Any

from roapi_spark.sources.xls import _rk_value

_PKG_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"

# MS-XLSB record ids
_ROW_HDR = 0
_CELL_BLANK = 1
_CELL_RK = 2
_CELL_ERROR = 3
_CELL_BOOL = 4
_CELL_REAL = 5
_CELL_ST = 6
_CELL_ISST = 7
_FMLA_STRING = 8
_FMLA_NUM = 9
_FMLA_BOOL = 10
_FMLA_ERROR = 11
_SST_ITEM = 19
_BUNDLE_SH = 156
_BEGIN_SST = 159


class XlsbError(ValueError):
    pass


def _records(data: bytes):
    """Yield (record_id, payload) from a BIFF12 stream."""
    off, n = 0, len(data)
    while off < n:
        b0 = data[off]
        off += 1
        if b0 & 0x80:
            rid = (b0 & 0x7F) | ((data[off] & 0x7F) << 7)
            off += 1
        else:
            rid = b0
        ln = shift = 0
        while True:
            b = data[off]
            off += 1
            ln |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        yield rid, data[off : off + ln]
        off += ln


def _wide_str(payload: bytes, off: int) -> tuple[str, int]:
    """XLWideString: cch(4 LE) + cch UTF-16LE code units."""
    (cch,) = struct.unpack_from("<I", payload, off)
    end = off + 4 + cch * 2
    return payload[off + 4 : end].decode("utf-16-le"), end


def _sheet_targets(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet_name, zip_member)] in workbook order (rels are still XML)."""
    rels = ET.fromstring(zf.read("xl/_rels/workbook.bin.rels"))
    target_by_rid = {
        r.get("Id"): r.get("Target") for r in rels.iter(f"{_PKG_REL}Relationship")
    }
    out: list[tuple[str, str]] = []
    for rid, payload in _records(zf.read("xl/workbook.bin")):
        if rid != _BUNDLE_SH:
            continue
        # hsState(4) iTabID(4) relId(XLNullableWideString) name(XLWideString)
        (cch_rel,) = struct.unpack_from("<I", payload, 8)
        off = 12
        rel_id = ""
        if cch_rel != 0xFFFFFFFF:
            rel_id = payload[off : off + cch_rel * 2].decode("utf-16-le")
            off += cch_rel * 2
        name, _ = _wide_str(payload, off)
        target = target_by_rid.get(rel_id, "")
        if not target:
            continue
        member = target.lstrip("/")
        if not member.startswith("xl/"):
            member = "xl/" + member
        out.append((name, member))
    if not out:
        raise XlsbError("workbook has no sheets")
    return out


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.bin")
    except KeyError:
        return []
    out: list[str] = []
    for rid, payload in _records(data):
        if rid == _SST_ITEM:
            # XLRichString: flags(1) + XLWideString [+ rich runs/ext, ignored]
            s, _ = _wide_str(payload, 1)
            out.append(s)
    return out


def sheet_names(path: str) -> list[str]:
    with zipfile.ZipFile(path) as zf:
        return [n for n, _ in _sheet_targets(zf)]


def read_xlsb(path: str, sheet: int | str = 0) -> list[list[Any]]:
    """Decode one worksheet into a dense row-major grid (None for gaps);
    same contract as ``read_xlsx`` / ``read_ods`` / ``read_xls``."""
    with zipfile.ZipFile(path) as zf:
        sheets = _sheet_targets(zf)
        if isinstance(sheet, str):
            by_name = dict(sheets)
            if sheet not in by_name:
                raise XlsbError(f"no sheet named {sheet!r} (have {list(by_name)})")
            member = by_name[sheet]
        else:
            if sheet >= len(sheets):
                raise XlsbError(f"sheet index {sheet} out of range ({len(sheets)} sheets)")
            member = sheets[sheet][1]
        sst = _shared_strings(zf)
        data = zf.read(member)

    cells: dict[tuple[int, int], Any] = {}
    row = 0
    for rid, payload in _records(data):
        if rid == _ROW_HDR:
            (row,) = struct.unpack_from("<I", payload, 0)
            continue
        if rid not in (
            _CELL_BLANK, _CELL_RK, _CELL_ERROR, _CELL_BOOL, _CELL_REAL,
            _CELL_ST, _CELL_ISST, _FMLA_STRING, _FMLA_NUM, _FMLA_BOOL,
            _FMLA_ERROR,
        ):
            continue
        (col,) = struct.unpack_from("<I", payload, 0)  # then iStyleRef(4)
        if rid == _CELL_RK:
            (rk,) = struct.unpack_from("<I", payload, 8)
            cells[(row, col)] = _rk_value(rk)
        elif rid in (_CELL_REAL, _FMLA_NUM):
            (v,) = struct.unpack_from("<d", payload, 8)
            cells[(row, col)] = int(v) if v.is_integer() else v
        elif rid in (_CELL_BOOL, _FMLA_BOOL):
            cells[(row, col)] = bool(payload[8])
        elif rid == _CELL_ISST:
            (isst,) = struct.unpack_from("<I", payload, 8)
            cells[(row, col)] = sst[isst] if isst < len(sst) else None
        elif rid in (_CELL_ST, _FMLA_STRING):
            s, _ = _wide_str(payload, 8)
            cells[(row, col)] = s
        else:  # blank / error cells
            cells[(row, col)] = None

    if not cells:
        return []
    n_rows = max(r for r, _ in cells) + 1
    n_cols = max(c for _, c in cells) + 1
    return [[cells.get((r, c)) for c in range(n_cols)] for r in range(n_rows)]
