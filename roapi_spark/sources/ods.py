"""Minimal pure-Python ``.ods`` (OpenDocument spreadsheet) decoder
(stdlib zipfile + xml.etree), the OpenDocument sibling of
:mod:`roapi_spark.sources.xlsx`.

Plays calamine's role for the reference's Excel loader
(``columnq/src/table/excel.rs:220-360``; fixture
``test_data/excel_range.ods``): decode one sheet into a dense row-major
grid so the shared inference/window logic in
:mod:`roapi_spark.sources.excel` applies unchanged.

Covered cell types (``office:value-type``): ``float``/``percentage``/
``currency`` -> number (collapsed to int when integral — calamine's
``DataType::Float`` behaves the same through our int-detect), ``boolean``
-> bool, ``string`` -> text (``office:string-value`` attr or concatenated
``text:p`` runs), ``date``/``time`` -> their ISO literal as a string
(calamine surfaces ``DateTimeIso``/``DurationIso``; the conflict->Utf8
upcast downstream gives such columns the same Utf8 shape). Merged-cell
anchors keep their value; ``covered-table-cell`` fills are None.

Repeated rows/cells (``table:number-{rows,columns}-repeated``) expand
lazily: empty repeats materialize only when non-empty content follows, so
the "1018 empty trailing columns" padding LibreOffice writes costs
nothing — matching calamine's Range, which excludes trailing empties.
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET
from typing import Any

_TABLE = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
_OFFICE = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"
_TEXT = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"

_INT_RE = re.compile(r"-?\d+(\.0+)?")


class OdsError(ValueError):
    pass


def _cell_text(cell: ET.Element) -> str:
    # paragraphs join with newline, runs inside a paragraph concatenate
    # (text:s = repeated spaces, text:tab = tab)
    parts: list[str] = []
    for p in cell.findall(f"{_TEXT}p"):
        parts.append("".join(_para_runs(p)))
    return "\n".join(parts)


def _para_runs(el: ET.Element):
    if el.text:
        yield el.text
    for child in el:
        tag = child.tag
        if tag == f"{_TEXT}s":
            yield " " * int(child.get(f"{_TEXT}c", "1"))
        elif tag == f"{_TEXT}tab":
            yield "\t"
        else:
            yield from _para_runs(child)
        if child.tail:
            yield child.tail


def _cell_value(cell: ET.Element) -> Any:
    if cell.tag == f"{_TABLE}covered-table-cell":
        return None
    vt = cell.get(f"{_OFFICE}value-type")
    if vt in ("float", "percentage", "currency"):
        text = cell.get(f"{_OFFICE}value", "")
        if _INT_RE.fullmatch(text.strip()):
            return int(float(text))
        return float(text)
    if vt == "boolean":
        return cell.get(f"{_OFFICE}boolean-value") == "true"
    if vt == "string":
        sv = cell.get(f"{_OFFICE}string-value")
        return sv if sv is not None else _cell_text(cell)
    if vt == "date":
        return cell.get(f"{_OFFICE}date-value")
    if vt == "time":
        return cell.get(f"{_OFFICE}time-value")
    return None


def _sheets(root: ET.Element) -> list[ET.Element]:
    body = root.find(f"{_OFFICE}body")
    ss = body.find(f"{_OFFICE}spreadsheet") if body is not None else None
    if ss is None:
        raise OdsError("document has no office:spreadsheet body")
    tables = ss.findall(f"{_TABLE}table")
    if not tables:
        raise OdsError("spreadsheet has no tables")
    return tables


def sheet_names(path: str) -> list[str]:
    with zipfile.ZipFile(path) as zf:
        root = ET.fromstring(zf.read("content.xml"))
    return [t.get(f"{_TABLE}name") or f"Sheet{i + 1}" for i, t in enumerate(_sheets(root))]


def read_ods(path: str, sheet: int | str = 0) -> list[list[Any]]:
    """Decode one sheet into a dense row-major grid (None for gaps);
    same contract as :func:`roapi_spark.sources.xlsx.read_xlsx`."""
    with zipfile.ZipFile(path) as zf:
        root = ET.fromstring(zf.read("content.xml"))
    tables = _sheets(root)
    if isinstance(sheet, str):
        by_name = {t.get(f"{_TABLE}name"): t for t in tables}
        if sheet not in by_name:
            raise OdsError(f"no sheet named {sheet!r} (have {list(by_name)})")
    table = by_name[sheet] if isinstance(sheet, str) else None
    if table is None:
        if sheet >= len(tables):
            raise OdsError(f"sheet index {sheet} out of range ({len(tables)} sheets)")
        table = tables[sheet]

    grid: list[list[Any]] = []
    pending_empty_rows = 0
    for row in table.iter(f"{_TABLE}table-row"):
        cells: list[Any] = []
        pending_empty_cells = 0
        for cell in row:
            if cell.tag not in (f"{_TABLE}table-cell", f"{_TABLE}covered-table-cell"):
                continue
            repeat = int(cell.get(f"{_TABLE}number-columns-repeated", "1"))
            val = _cell_value(cell)
            if val is None:
                pending_empty_cells += repeat
            else:
                cells.extend([None] * pending_empty_cells)
                pending_empty_cells = 0
                cells.extend([val] * repeat)
        row_repeat = int(row.get(f"{_TABLE}number-rows-repeated", "1"))
        if not cells:
            pending_empty_rows += row_repeat
        else:
            grid.extend([[] for _ in range(pending_empty_rows)])
            pending_empty_rows = 0
            grid.extend([list(cells) for _ in range(row_repeat)])
    width = max((len(r) for r in grid), default=0)
    for cells in grid:
        cells.extend([None] * (width - len(cells)))
    return grid
