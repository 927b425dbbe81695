"""Dependency-free XLSX codec (stdlib zipfile + ElementTree).

The reference reads/writes Excel through ``pandas.read_excel`` /
``to_excel`` (``files/types/excel.py:13-46``), which needs openpyxl.
This container has no openpyxl and installs are disallowed, so Excel
support is implemented directly against the OOXML SpreadsheetML format
(an .xlsx file is a zip of XML parts).  Behavior matches the reference's
pandas path for the shapes it exercises (``tests/data/sample.xlsx``):
first row is the header, shared and inline strings both read, numerics
come back as int/float, booleans as bool, empty cells as None.

Scope (deliberate): single worksheet, no formula evaluation (cached
values are read), no date-style detection (dates surface as their
serial numbers or strings, matching what pandas does for unstyled
cells), strings written inline (no sharedStrings table) — valid OOXML
that Excel, LibreOffice, pandas, and this reader all accept.

Driver-side by nature, like the reference: spreadsheets are small.  Big
data belongs in parquet.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zipfile
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_RID = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A'→0, 'B'→1, ..., 'AA'→26."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _col_letter(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def read_xlsx(path: str) -> tuple[list[str], list[list]]:
    """Parse the first worksheet into (header, rows).

    Cell typing: t="s" shared string, t="inlineStr"/"str" string,
    t="b" bool, numeric otherwise (int when integral).  Missing cells
    (gaps in the ref sequence) become None.
    """
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in sst.iter(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))

        # first sheet: workbook.xml sheet r:id → workbook rels → part path
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        first_sheet = next(wb.iter(f"{_NS}sheet"))
        rid = first_sheet.get(_RID)
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        target = next(
            r.get("Target")
            for r in rels.iter(f"{_REL_NS}Relationship")
            if r.get("Id") == rid
        )
        sheet_path = target if target.startswith("xl/") else f"xl/{target}"
        sheet = ET.fromstring(z.read(sheet_path))

    grid: list[list] = []
    for row in sheet.iter(f"{_NS}row"):
        cells: list = []
        for c in row.iter(f"{_NS}c"):
            ref = c.get("r")
            idx = len(cells)
            if ref:
                m = _CELL_REF.match(ref)
                if m:
                    idx = _col_index(m.group(1))
            while len(cells) < idx:
                cells.append(None)
            cells.append(_cell_value(c, shared))
        grid.append(cells)

    if not grid:
        return [], []
    header = [str(v) if v is not None else f"col_{i}" for i, v in enumerate(grid[0])]
    width = len(header)
    rows = [r[:width] + [None] * (width - len(r)) for r in grid[1:]]
    return header, rows


def _cell_value(c, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        return "".join(el.text or "" for el in c.iter(f"{_NS}t"))
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "str":
        return v.text
    if t == "b":
        return v.text == "1"
    num = float(v.text)
    return int(num) if num.is_integer() and abs(num) < 2**53 else num


_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def write_xlsx(header: list[str], rows: list[list], path: str) -> None:
    """Write one worksheet; strings inline, numerics/bools typed."""
    body = [_row_xml(1, list(header))]
    for i, row in enumerate(rows, start=2):
        body.append(_row_xml(i, list(row)))
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(body)}</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def _row_xml(n: int, values: list) -> str:
    cells = []
    for i, v in enumerate(values):
        if v is None:
            continue
        ref = f"{_col_letter(i)}{n}"
        if isinstance(v, bool):
            cells.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
        elif isinstance(v, (int, float)):
            cells.append(f'<c r="{ref}"><v>{v!r}</v></c>')
        else:
            cells.append(
                f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                f"{escape(str(v))}</t></is></c>"
            )
    return f'<row r="{n}">{"".join(cells)}</row>'
