"""OpenDocument Spreadsheet (.ods) reader — stdlib zip + ElementTree.

The reference crawls ``.ods`` resources (MAX_FILESIZE_ALLOWED.ods,
config_default.toml:56) but its Reader only decodes xlsx/xls
(utils/reader.py:23-26); open-data portals serve .ods constantly, so this
closes that gap in the same shape as the xlsx/xls readers: yield rows of
typed cell values, positional gaps as None, sheet selection by name.

Format: a zip whose ``content.xml`` holds office:spreadsheet → table:table
→ table-row → table-cell; values are typed via ``office:value-type`` and
repeated via ``table:number-columns-repeated`` (trailing repeated empties
pad to the full grid width and must be trimmed).
"""

from __future__ import annotations

import zipfile
import xml.etree.ElementTree as ET

_NS_TABLE = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
_NS_OFFICE = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"
_NS_TEXT = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"

ODS_MIMETYPE = "application/vnd.oasis.opendocument.spreadsheet"


def _cell_value(cell: ET.Element):
    vtype = cell.get(f"{_NS_OFFICE}value-type")
    if vtype == "float" or vtype == "percentage" or vtype == "currency":
        return float(cell.get(f"{_NS_OFFICE}value"))
    if vtype == "boolean":
        return cell.get(f"{_NS_OFFICE}boolean-value") == "true"
    if vtype == "date":
        return cell.get(f"{_NS_OFFICE}date-value")
    if vtype == "time":
        return cell.get(f"{_NS_OFFICE}time-value")
    # string (or calculated cells with cached text): join the text:p runs
    paras = cell.findall(f"{_NS_TEXT}p")
    if paras:
        return "\n".join("".join(p.itertext()) for p in paras)
    return None


def iter_ods_rows_stdlib(path: str, sheet_name: str | None = None):
    """Yield rows (lists of cell values) from the named (or first) sheet."""
    with zipfile.ZipFile(path) as z:
        root = ET.fromstring(z.read("content.xml"))
    body = root.find(f"{_NS_OFFICE}body")
    sheet = None
    names = []
    if body is not None:
        ss = body.find(f"{_NS_OFFICE}spreadsheet")
        if ss is not None:
            for t in ss.findall(f"{_NS_TABLE}table"):
                name = t.get(f"{_NS_TABLE}name")
                names.append(name)
                if sheet is None and (sheet_name is None or name == sheet_name):
                    sheet = t
    if sheet is None:
        raise ValueError(f"sheet {sheet_name!r} not found in {path} (has {names})")

    for row in sheet.findall(f"{_NS_TABLE}table-row"):
        row_rep = int(row.get(f"{_NS_TABLE}number-rows-repeated", "1"))
        cells: list = []
        for cell in row:
            if cell.tag not in (
                f"{_NS_TABLE}table-cell",
                f"{_NS_TABLE}covered-table-cell",
            ):
                continue
            rep = int(cell.get(f"{_NS_TABLE}number-columns-repeated", "1"))
            v = (
                None
                if cell.tag == f"{_NS_TABLE}covered-table-cell"
                else _cell_value(cell)
            )
            cells.extend([v] * rep)
        # trim the trailing repeated-empty padding ods writers emit
        while cells and cells[-1] is None:
            cells.pop()
        if not cells:
            continue
        # repeated-rows expansion is bounded: only non-empty rows repeat here
        for _ in range(min(row_rep, 1_048_576)):
            yield list(cells)
