"""Minimal pure-Python legacy ``.xls`` (BIFF8) decoder — stdlib only.

Closes the last Excel-format gap vs the reference's calamine loader
(``columnq/src/table/excel.rs:220-360`` handles xls/xlsx/xlsb/ods): a
Compound File Binary (CFB/OLE2) container reader plus a BIFF8 workbook
stream parser, producing the same dense row-major grid contract as
:func:`roapi_spark.sources.xlsx.read_xlsx` /
:func:`roapi_spark.sources.ods.read_ods`.

Covered records: SST (incl. CONTINUE spans and compressed/UTF-16 mixed
strings), LABELSST, NUMBER, RK/MULRK (both int and /100 encodings),
BOOLERR (errors -> None), FORMULA cached results (number/bool/string via
the trailing STRING record), BLANK/MULBLANK (-> None), BOUNDSHEET sheet
directory. Dates surface as their raw numeric serials, matching the
xlsx decoder's documented behavior (calamine's ``DataType::Float``
fallback). BIFF5 and encrypted (FILEPASS) workbooks are rejected with a
clear error.
"""

from __future__ import annotations

import struct
from typing import Any

SECTOR_FREE = 0xFFFFFFFF
SECTOR_END = 0xFFFFFFFE


class XlsError(ValueError):
    pass


# -- CFB / OLE2 container ----------------------------------------------------


class _Cfb:
    MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

    def __init__(self, data: bytes) -> None:
        if data[:8] != self.MAGIC:
            raise XlsError("not an OLE2 compound file (bad magic)")
        self.data = data
        (sect_pow,) = struct.unpack_from("<H", data, 30)
        (mini_pow,) = struct.unpack_from("<H", data, 32)
        self.ssz = 1 << sect_pow
        self.mssz = 1 << mini_pow
        (self.n_fat,) = struct.unpack_from("<I", data, 44)
        (self.dir_start,) = struct.unpack_from("<I", data, 48)
        (self.mini_cutoff,) = struct.unpack_from("<I", data, 56)
        (self.minifat_start,) = struct.unpack_from("<I", data, 60)
        (self.n_minifat,) = struct.unpack_from("<I", data, 64)
        (self.difat_start,) = struct.unpack_from("<I", data, 68)
        (self.n_difat,) = struct.unpack_from("<I", data, 72)
        fat_sectors = list(struct.unpack_from("<109I", data, 76))
        sect = self.difat_start
        for _ in range(self.n_difat):
            if sect in (SECTOR_END, SECTOR_FREE):
                break
            raw = self._sector(sect)
            entries = struct.unpack(f"<{self.ssz // 4}I", raw)
            fat_sectors.extend(entries[:-1])
            sect = entries[-1]
        self.fat: list[int] = []
        for fs in fat_sectors:
            if fs in (SECTOR_END, SECTOR_FREE):
                continue
            self.fat.extend(struct.unpack(f"<{self.ssz // 4}I", self._sector(fs)))
        self.dir = self._read_chain(self.dir_start)
        self.minifat: list[int] = []
        if self.n_minifat:
            raw = self._read_chain(self.minifat_start)
            self.minifat = list(struct.unpack(f"<{len(raw) // 4}I", raw))
        # root entry's stream backs the mini stream
        root_start, root_size = self._dir_entry(0)[1:]
        self.mini_stream = self._read_chain(root_start)[:root_size] if root_size else b""

    def _sector(self, n: int) -> bytes:
        off = 512 + n * self.ssz
        return self.data[off : off + self.ssz]

    def _read_chain(self, start: int) -> bytes:
        out, sect, seen = [], start, set()
        while sect not in (SECTOR_END, SECTOR_FREE):
            if sect in seen or sect >= len(self.fat):
                raise XlsError("corrupt FAT chain")
            seen.add(sect)
            out.append(self._sector(sect))
            sect = self.fat[sect]
        return b"".join(out)

    def _read_mini_chain(self, start: int) -> bytes:
        out, sect, seen = [], start, set()
        while sect not in (SECTOR_END, SECTOR_FREE):
            if sect in seen or sect >= len(self.minifat):
                raise XlsError("corrupt miniFAT chain")
            seen.add(sect)
            out.append(self.mini_stream[sect * self.mssz : (sect + 1) * self.mssz])
            sect = self.minifat[sect]
        return b"".join(out)

    def _dir_entry(self, i: int) -> tuple[str, int, int]:
        off = i * 128
        entry = self.dir[off : off + 128]
        (name_len,) = struct.unpack_from("<H", entry, 64)
        name = entry[: max(0, name_len - 2)].decode("utf-16-le", errors="replace")
        (start,) = struct.unpack_from("<I", entry, 116)
        (size,) = struct.unpack_from("<I", entry, 120)
        return name, start, size

    def stream(self, name: str) -> bytes:
        for i in range(len(self.dir) // 128):
            ename, start, size = self._dir_entry(i)
            if ename == name:
                if i != 0 and size < self.mini_cutoff:
                    return self._read_mini_chain(start)[:size]
                return self._read_chain(start)[:size]
        raise XlsError(f"no stream named {name!r} in compound file")


# -- BIFF8 record stream ------------------------------------------------------

_BOF = 0x0809
_EOF = 0x000A
_SST = 0x00FC
_CONTINUE = 0x003C
_LABELSST = 0x00FD
_LABEL = 0x0204
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_BOOLERR = 0x0205
_FORMULA = 0x0006
_STRING = 0x0207
_BOUNDSHEET = 0x0085
_FILEPASS = 0x002F


def _records(stream: bytes, start: int = 0):
    off = start
    n = len(stream)
    while off + 4 <= n:
        rid, ln = struct.unpack_from("<HH", stream, off)
        yield rid, off + 4, ln
        off += 4 + ln


def _rk_value(rk: int) -> Any:
    cents = rk & 0x01
    if rk & 0x02:  # 30-bit signed int
        v: Any = rk >> 2
        if v >= 1 << 29:
            v -= 1 << 30
    else:  # top 30 bits of an IEEE double
        (v,) = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))
    if cents:
        v = v / 100
    if isinstance(v, float) and v.is_integer():
        return int(v)
    return v


class _SstReader:
    """XLUnicodeRichExtendedString list spanning SST + CONTINUE records.

    At each CONTINUE boundary mid-string, a fresh grbit byte restates the
    encoding for the remaining chars — the classic BIFF8 trap."""

    def __init__(self, parts: list[bytes]) -> None:
        self.parts = parts
        self.pi = 0
        self.off = 0

    def _remaining(self) -> int:
        return len(self.parts[self.pi]) - self.off

    def _advance(self) -> None:
        while self.pi < len(self.parts) and self._remaining() == 0:
            self.pi += 1
            self.off = 0

    def take(self, n: int) -> bytes:
        out = b""
        while n:
            self._advance()
            if self.pi >= len(self.parts):
                raise XlsError("truncated SST (record data exhausted)")
            part = self.parts[self.pi]
            chunk = part[self.off : self.off + n]
            out += chunk
            self.off += len(chunk)
            n -= len(chunk)
        return out

    def read_string(self) -> str:
        cch = struct.unpack("<H", self.take(2))[0]
        grbit = self.take(1)[0]
        n_runs = struct.unpack("<H", self.take(2))[0] if grbit & 0x08 else 0
        cb_ext = struct.unpack("<I", self.take(4))[0] if grbit & 0x04 else 0
        chars: list[str] = []
        wide = bool(grbit & 0x01)
        left = cch
        while left:
            self._advance()
            avail = self._remaining()
            take = min(left, avail // 2 if wide else avail)
            if take == 0:
                raise XlsError("truncated SST string")
            raw = self.take(take * 2 if wide else take)
            chars.append(raw.decode("utf-16-le" if wide else "latin-1"))
            left -= take
            if left and self._remaining() == 0:
                self._advance()
                wide = bool(self.take(1)[0] & 0x01)  # continuation grbit
        self.take(n_runs * 4 + cb_ext)
        return "".join(chars)


def _parse_sst(stream: bytes, data_off: int, ln: int) -> list[str]:
    parts = [stream[data_off + 8 : data_off + ln]]  # skip total/unique counts
    (n_unique,) = struct.unpack_from("<I", stream, data_off + 4)
    # gather immediately-following CONTINUE records
    off = data_off + ln
    while off + 4 <= len(stream):
        rid, cln = struct.unpack_from("<HH", stream, off)
        if rid != _CONTINUE:
            break
        parts.append(stream[off + 4 : off + 4 + cln])
        off += 4 + cln
    reader = _SstReader(parts)
    return [reader.read_string() for _ in range(n_unique)]


def _short_string(data: bytes, off: int) -> str:
    # BIFF8 short XLUnicodeString: len(1) grbit(1) chars
    cch = data[off]
    grbit = data[off + 1]
    if grbit & 0x01:
        return data[off + 2 : off + 2 + cch * 2].decode("utf-16-le")
    return data[off + 2 : off + 2 + cch].decode("latin-1")


def _sheet_dir(wb: bytes) -> list[tuple[str, int]]:
    """[(sheet_name, substream_offset)] from the globals BOUNDSHEETs."""
    out: list[tuple[str, int]] = []
    for rid, off, ln in _records(wb):
        if rid == _FILEPASS:
            raise XlsError("encrypted .xls workbook (FILEPASS) not supported")
        if rid == _BOUNDSHEET:
            (pos,) = struct.unpack_from("<I", wb, off)
            out.append((_short_string(wb, off + 6), pos))
        elif rid == _EOF:
            break
    if not out:
        raise XlsError("workbook has no sheets")
    return out


def sheet_names(path: str) -> list[str]:
    wb = _workbook_stream(path)
    return [n for n, _ in _sheet_dir(wb)]


def _workbook_stream(path: str) -> bytes:
    with open(path, "rb") as f:
        cfb = _Cfb(f.read())
    for name in ("Workbook", "Book"):
        try:
            wb = cfb.stream(name)
        except XlsError:
            continue
        if len(wb) >= 8:
            ver, dt = struct.unpack_from("<HH", wb, 4)
            if ver and ver < 0x0600:
                raise XlsError(f"BIFF version 0x{ver:04x} (pre-BIFF8) not supported")
        return wb
    raise XlsError("no Workbook/Book stream (not an Excel .xls file)")


def read_xls(path: str, sheet: int | str = 0) -> list[list[Any]]:
    """Decode one worksheet into a dense row-major grid (None for gaps);
    same contract as ``read_xlsx`` / ``read_ods``."""
    wb = _workbook_stream(path)
    sst: list[str] = []
    for rid, off, ln in _records(wb):
        if rid == _SST:
            sst = _parse_sst(wb, off, ln)
        elif rid == _EOF:
            break
    sheets = _sheet_dir(wb)
    if isinstance(sheet, str):
        by_name = dict(sheets)
        if sheet not in by_name:
            raise XlsError(f"no sheet named {sheet!r} (have {list(by_name)})")
        start = by_name[sheet]
    else:
        if sheet >= len(sheets):
            raise XlsError(f"sheet index {sheet} out of range ({len(sheets)} sheets)")
        start = sheets[sheet][1]

    cells: dict[tuple[int, int], Any] = {}
    pending_formula: tuple[int, int] | None = None
    for rid, off, ln in _records(wb, start):
        if rid == _BOF and off != start + 4:
            break  # next substream
        if rid == _EOF:
            break
        if rid in (_NUMBER, _RK, _LABELSST, _BOOLERR, _FORMULA, _LABEL):
            row, col = struct.unpack_from("<HH", wb, off)
        if rid == _NUMBER:
            (v,) = struct.unpack_from("<d", wb, off + 6)
            cells[(row, col)] = int(v) if v.is_integer() else v
        elif rid == _RK:
            (rk,) = struct.unpack_from("<I", wb, off + 6)
            cells[(row, col)] = _rk_value(rk)
        elif rid == _MULRK:
            row, col_first = struct.unpack_from("<HH", wb, off)
            n_rk = (ln - 6) // 6
            for i in range(n_rk):
                (rk,) = struct.unpack_from("<I", wb, off + 4 + i * 6 + 2)
                cells[(row, col_first + i)] = _rk_value(rk)
        elif rid == _LABELSST:
            (isst,) = struct.unpack_from("<I", wb, off + 6)
            cells[(row, col)] = sst[isst] if isst < len(sst) else None
        elif rid == _LABEL:
            (cch,) = struct.unpack_from("<H", wb, off + 6)
            grbit = wb[off + 8]
            raw = wb[off + 9 : off + 9 + (cch * 2 if grbit & 1 else cch)]
            cells[(row, col)] = raw.decode("utf-16-le" if grbit & 1 else "latin-1")
        elif rid == _BOOLERR:
            val, is_err = wb[off + 6], wb[off + 7]
            cells[(row, col)] = None if is_err else bool(val)
        elif rid == _FORMULA:
            res = wb[off + 6 : off + 14]
            if res[6:8] == b"\xff\xff":
                kind = res[0]
                if kind == 0:  # cached string in the following STRING record
                    pending_formula = (row, col)
                elif kind == 1:
                    cells[(row, col)] = bool(res[2])
                else:  # error / empty
                    cells[(row, col)] = None
            else:
                (v,) = struct.unpack("<d", res)
                cells[(row, col)] = int(v) if v.is_integer() else v
        elif rid == _STRING and pending_formula is not None:
            cch, grbit = struct.unpack_from("<HB", wb, off)
            raw = wb[off + 3 : off + 3 + (cch * 2 if grbit & 1 else cch)]
            cells[pending_formula] = raw.decode("utf-16-le" if grbit & 1 else "latin-1")
            pending_formula = None

    if not cells:
        return []
    n_rows = max(r for r, _ in cells) + 1
    n_cols = max(c for _, c in cells) + 1
    return [[cells.get((r, c)) for c in range(n_cols)] for r in range(n_rows)]
