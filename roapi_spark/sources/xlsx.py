"""Minimal pure-Python ``.xlsx`` decoder (stdlib zipfile + xml.etree).

Plays the role calamine plays for the reference's Excel loader
(``columnq/src/table/excel.rs:220-360``): decode workbook cells so the
Spark-side inference/window logic in :mod:`roapi_spark.sources.excel` has
real values to work on, without needing openpyxl/xlrd in the image.

Covered cell types: shared strings (including rich-text runs), inline
strings, booleans, cached formula strings (``t="str"``), numbers
(collapsed to int when the serialized form is integral), error cells
(-> None), and blank/missing cells (-> None, gap-filled from A1 refs).
Limitation (documented): date/time *styles* are not resolved — date cells
surface as their raw numeric serials, same as calamine's ``DataType::
Float`` fallback when ``dates`` feature is off.
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET
from typing import Any

_M = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_PKG_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_DOC_RID = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"

_INT_RE = re.compile(r"-?\d+")


class XlsxError(ValueError):
    pass


def _col_index(ref: str) -> int:
    """A1-style column letters -> 0-based index ("A"->0, "AA"->26)."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return n - 1


def _text_runs(el: ET.Element) -> str:
    # concatenates plain and rich-text <t> runs
    return "".join(t.text or "" for t in el.iter(f"{_M}t"))


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    return [_text_runs(si) for si in root.iter(f"{_M}si")]


def _sheet_targets(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet_name, zip_member_path)] in workbook order."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    target_by_rid = {
        r.get("Id"): r.get("Target") for r in rels.iter(f"{_PKG_REL}Relationship")
    }
    out: list[tuple[str, str]] = []
    for sh in wb.iter(f"{_M}sheet"):
        target = target_by_rid.get(sh.get(_DOC_RID), "")
        if not target:
            continue
        member = target.lstrip("/")
        if not member.startswith("xl/"):
            member = "xl/" + member
        out.append((sh.get("name") or f"Sheet{len(out) + 1}", member))
    if not out:
        raise XlsxError("workbook has no sheets")
    return out


def _cell_value(c: ET.Element, shared: list[str]) -> Any:
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(f"{_M}is")
        return _text_runs(is_el) if is_el is not None else None
    v = c.find(f"{_M}v")
    if v is None or v.text is None:
        return None
    text = v.text
    if t == "s":
        return shared[int(text)]
    if t == "str":
        return text
    if t == "b":
        return text.strip() in ("1", "true", "TRUE")
    if t == "e":
        return None
    if _INT_RE.fullmatch(text.strip()):
        return int(text)
    return float(text)


def sheet_names(path: str) -> list[str]:
    with zipfile.ZipFile(path) as zf:
        return [name for name, _ in _sheet_targets(zf)]


def read_xlsx(path: str, sheet: int | str = 0) -> list[list[Any]]:
    """Decode one worksheet into a dense row-major grid (None for gaps).

    ``sheet`` selects by 0-based index or by name, mirroring pandas'
    ``sheet_name`` semantics.
    """
    with zipfile.ZipFile(path) as zf:
        sheets = _sheet_targets(zf)
        if isinstance(sheet, str):
            by_name = dict(sheets)
            if sheet not in by_name:
                raise XlsxError(f"no sheet named {sheet!r} (have {list(by_name)})")
            member = by_name[sheet]
        else:
            if sheet >= len(sheets):
                raise XlsxError(f"sheet index {sheet} out of range ({len(sheets)} sheets)")
            member = sheets[sheet][1]
        shared = _shared_strings(zf)
        root = ET.fromstring(zf.read(member))

    grid: list[list[Any]] = []
    width = 0
    for row in root.iter(f"{_M}row"):
        r_idx = int(row.get("r", len(grid) + 1)) - 1
        while len(grid) <= r_idx:
            grid.append([])
        cells = grid[r_idx]
        for c in row.iter(f"{_M}c"):
            ref = c.get("r")
            c_idx = _col_index(ref) if ref else len(cells)
            while len(cells) <= c_idx:
                cells.append(None)
            cells[c_idx] = _cell_value(c, shared)
        width = max(width, len(cells))
    for cells in grid:
        cells.extend([None] * (width - len(cells)))
    return grid
