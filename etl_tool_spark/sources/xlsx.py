"""Minimal stdlib XLSX reader/writer (zipfile + ElementTree) — no
openpyxl dependency.

An .xlsx file is a zip of OOXML parts; the subset the reference
exercises (internal/io/xlsx.go:17-304 via excelize) needs only:
  * ``xl/workbook.xml`` — sheet list (name, order, r:id) + active tab
  * ``xl/_rels/workbook.xml.rels`` — r:id → worksheet part path
  * ``xl/worksheets/sheetN.xml`` — rows of cells
  * ``xl/sharedStrings.xml`` — the shared-string table

Reader semantics mirror xlsx.go: sheet by exact name (error when
missing) or 0-based index (error when out of bounds), default = the
active sheet; every cell is rendered to its display STRING (shared
strings, inline strings, formula cached values, raw numeric text,
TRUE/FALSE for booleans — excelize's GetCellValue rendering); header
row trimmed, empty headers ignored, duplicate headers keep the LAST
column; short rows backfill "" for every valid header.

Writer semantics mirror xlsx.go:191-304: headers = union of record
keys sorted alphabetically, one header row + data rows, booleans
rendered "true"/"false" (strconv.FormatBool), None → "". Values are
written as inline strings — everything the pipeline emits through the
all-strings parity path — so no shared-string table is needed; the
worksheet is one self-contained part. Driver-side single-document
format by contract (the reference holds the whole workbook in RAM;
the scale formats are parquet/orc)."""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_RID_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


class XlsxError(ValueError):
    pass


def _col_index(ref: str) -> int:
    """'A1' → 0, 'AB7' → 27."""
    n = 0
    for ch in ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
    return n - 1


def _cell_text(c: ET.Element, shared: list[str]) -> str:
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(f"{_NS}is")
        return "".join(el.text or "" for el in is_el.iter(f"{_NS}t")) if is_el is not None else ""
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return ""
    if t == "s":
        try:
            return shared[int(v.text)]
        except (ValueError, IndexError):
            return ""
    if t == "b":
        return "TRUE" if v.text.strip() == "1" else "FALSE"
    # t == "str" (formula cached string) or numeric: the raw stored text
    # IS the general-format display for the values this pipeline writes
    return v.text


def read_xlsx_records(path: str, sheet_name: str | None = None,
                      sheet_index: int | None = None) -> list[dict[str, str]]:
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rid_target = {r.get("Id"): r.get("Target") for r in rels.iter(f"{_REL_NS}Relationship")}
        sheets = [(s.get("name"), s.get(f"{_RID_NS}id"))
                  for s in wb.iter(f"{_NS}sheet")]
        if not sheets:
            raise XlsxError(f"XLSX file {path!r} contains no sheets")

        if sheet_name is not None:
            matches = [s for s in sheets if s[0] == sheet_name]
            if not matches:
                raise XlsxError(f"sheet name {sheet_name!r} not found in {path!r}")
            target = matches[0]
        elif sheet_index is not None:
            if not 0 <= sheet_index < len(sheets):
                raise XlsxError(f"sheet index {sheet_index} out of bounds "
                                f"(0 to {len(sheets) - 1}) in {path!r}")
            target = sheets[sheet_index]
        else:
            view = wb.find(f"{_NS}bookViews/{_NS}workbookView")
            active = int(view.get("activeTab", "0")) if view is not None else 0
            target = sheets[active if 0 <= active < len(sheets) else 0]

        part = rid_target.get(target[1], "worksheets/sheet1.xml")
        part = part if part.startswith("xl/") else f"xl/{part}"

        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            ss = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in ss.iter(f"{_NS}si"):
                shared.append("".join(el.text or "" for el in si.iter(f"{_NS}t")))

        ws = ET.fromstring(z.read(part))
        rows: list[list[str]] = []
        for row in ws.iter(f"{_NS}row"):
            cells: list[str] = []
            for c in row.iter(f"{_NS}c"):
                ref = c.get("r")
                idx = _col_index(ref) if ref else len(cells)
                while len(cells) < idx:
                    cells.append("")
                text = _cell_text(c, shared)
                if len(cells) == idx:
                    cells.append(text)
                else:
                    cells[idx] = text
            rows.append(cells)

    if not rows:
        return []

    # header quirks (xlsx.go:108-137): trim; empty → column ignored;
    # duplicate → LAST column wins; records carry every valid header
    raw_headers = rows[0]
    last_index: dict[str, int] = {}
    for i, h in enumerate(raw_headers):
        name = h.strip()
        if name:
            last_index[name] = i
    if not last_index:
        return []
    records = []
    for row in rows[1:]:
        rec = {name: (row[i] if i < len(row) else "")
               for name, i in last_index.items()}
        records.append(rec)
    return records


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

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _col_letters(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _render(v) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"  # strconv.FormatBool (xlsx.go:281)
    return str(v)


def write_xlsx_records(records: list[dict], path: str,
                       sheet_name: str = "Sheet1") -> None:
    if not re.fullmatch(r"[^\\/?*\[\]:]{1,31}", sheet_name or ""):
        raise XlsxError(f"invalid sheet name {sheet_name!r}")
    headers = sorted({k for rec in records for k in rec})
    rows_xml: list[str] = []
    all_rows = ([headers] + [[_render(rec.get(h)) for h in headers] for rec in records]
                if records else [])
    for rn, vals in enumerate(all_rows, start=1):
        cells = []
        for ci, val in enumerate(vals):
            space = ' xml:space="preserve"' if val != val.strip() else ""
            cells.append(f'<c r="{_col_letters(ci)}{rn}" t="inlineStr">'
                         f'<is><t{space}>{escape(val)}</t></is></c>')
        rows_xml.append(f'<row r="{rn}">' + "".join(cells) + "</row>")
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>" + "".join(rows_xml) + "</sheetData></worksheet>")
    wb_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{escape(sheet_name)}" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", wb_xml)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)
