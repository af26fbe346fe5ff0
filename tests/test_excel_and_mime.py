"""S4 stdlib xlsx reader + S7 magic-byte MIME detection."""

from __future__ import annotations

import zipfile

import pytest
from pyspark.sql import functions as F

from udata_datalake_service_spark.functions.mime import detect_mime
from udata_datalake_service_spark.sources.excel_reader import (
    iter_excel_rows,
    iter_xlsx_rows_stdlib,
    read_excel,
)

_WB_XML = """<?xml version="1.0"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets>
<sheet name="Feuille1" sheetId="1" r:id="rId1"/>
<sheet name="Autre" sheetId="2" r:id="rId2"/>
</sheets></workbook>"""

_RELS_XML = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
</Relationships>"""

_SST_XML = """<?xml version="1.0"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
<si><t>nom</t></si><si><r><t>mont</t></r><r><t>ant</t></r></si><si><t>Aurélie</t></si>
</sst>"""

# header row; data rows exercise shared strings, numbers, inline strings,
# booleans, and a gap (B skipped on row 4)
_SHEET1_XML = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="inlineStr"><is><t>ok</t></is></c></row>
<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>1020.5</v></c><c r="C2" t="b"><v>1</v></c></row>
<row r="3"><c r="A3" t="inlineStr"><is><t>Benoît</t></is></c><c r="B3"><v>7</v></c><c r="C3" t="b"><v>0</v></c></row>
<row r="4"><c r="A4" t="s"><v>0</v></c><c r="C4" t="inlineStr"><is><t>gap</t></is></c></row>
</sheetData></worksheet>"""

_SHEET2_XML = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1"><c r="A1" t="inlineStr"><is><t>autre</t></is></c></row>
</sheetData></worksheet>"""


@pytest.fixture()
def xlsx_path(tmp_path):
    p = tmp_path / "fixture.xlsx"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/workbook.xml", _WB_XML)
        z.writestr("xl/_rels/workbook.xml.rels", _RELS_XML)
        z.writestr("xl/sharedStrings.xml", _SST_XML)
        z.writestr("xl/worksheets/sheet1.xml", _SHEET1_XML)
        z.writestr("xl/worksheets/sheet2.xml", _SHEET2_XML)
    return str(p)


def test_stdlib_xlsx_cell_types_and_gaps(xlsx_path):
    rows = list(iter_xlsx_rows_stdlib(xlsx_path))
    assert rows[0] == ["nom", "montant", "ok"]  # shared + multi-run + inline
    assert rows[1] == ["Aurélie", "1020.5", True]
    assert rows[2] == ["Benoît", "7", False]
    assert rows[3] == ["nom", None, "gap"]  # gap cell → positional None


def test_stdlib_xlsx_sheet_selection(xlsx_path):
    rows = list(iter_xlsx_rows_stdlib(xlsx_path, sheet_name="Autre"))
    assert rows == [["autre"]]
    with pytest.raises(ValueError, match="not found"):
        list(iter_xlsx_rows_stdlib(xlsx_path, sheet_name="nope"))


def test_iter_excel_rows_header_offset(xlsx_path):
    rows = list(iter_excel_rows(xlsx_path, header_row_idx=1))
    assert rows[0][0] == "Aurélie"


def test_read_excel_to_dataframe(spark, xlsx_path):
    df = read_excel(spark, xlsx_path)
    assert df.columns == ["nom", "montant", "ok"]
    got = [tuple(r) for r in df.orderBy("nom").collect()]
    # short row padded to header width; every cell stringified
    assert ("nom", None, "gap") in got
    assert ("Aurélie", "1020.5", "True") in got
    assert df.count() == 3


MAGIC_CASES = [
    (b"\x1f\x8b\x08rest", "application/gzip"),
    (b"PK\x03\x04rest", "application/zip"),
    (b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1x", "application/vnd.ms-excel"),
    (b"%PDF-1.7 ...", "application/pdf"),
    (b"\xff\xd8\xff\xe0JFIF", "image/jpeg"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"ID3\x04tag", "audio/mpeg"),
    (b"RIFF\x00\x00WAVE", "audio/x-wav"),
    ("nom;montant\nAurélie;1020,50\n".encode(), "text/plain"),
    (b"\x00\x01\x02binary junk", "application/octet-stream"),
    # invalid UTF-8 mid-stream: must classify, never crash the job
    # (Spark 4's decode() raises MALFORMED_CHARACTER_CODING — regression
    # guard for the make_valid_utf8 repair path)
    (b"plain text\xff", "application/octet-stream"),
    # exactly-sniff_bytes payload with malformed trailing byte: NOT
    # truncated (nothing follows the head), so the single trailing U+FFFD
    # tolerance must not apply
    (b"x" * 63 + b"\xff", "application/octet-stream"),
    # multi-byte char genuinely cut at the sniff boundary (payload
    # continues past 64 bytes): one trailing replacement is tolerated
    (b"y" * 63 + "é".encode()[:1] + b"tail beyond the sniff window", "text/plain"),
    (None, None),
]


def test_detect_mime_magic_matrix(spark):
    df = spark.createDataFrame(
        [(i, c) for i, (c, _) in enumerate(MAGIC_CASES)], "i int, content binary"
    )
    got = {r["i"]: r["mime"] for r in df.select("i", detect_mime(F.col("content")).alias("mime")).collect()}
    for i, (_, expect) in enumerate(MAGIC_CASES):
        assert got[i] == expect, f"case {i}"


def test_detect_mime_agrees_with_reference_routing(spark):
    """The reference analyses resources whose detected mime is in its csv/
    excel family (analysis/resource.py:92 + utils/csv.py) — our sniff must
    route the same formats the same way."""
    cases = spark.createDataFrame(
        [
            ("a.csv.gz", bytes([0x1F, 0x8B, 8, 0])),
            ("b.xlsx", b"PK\x03\x04xl/"),
            ("c.xls", b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"),
            ("d.csv", b"col1;col2\n1;2\n"),
        ],
        "name string, content binary",
    )
    got = dict(
        cases.select("name", detect_mime(F.col("content")).alias("m")).collect()
    )
    assert got == {
        "a.csv.gz": "application/gzip",
        "b.xlsx": "application/zip",
        "c.xls": "application/vnd.ms-excel",
        "d.csv": "text/plain",
    }


def test_excel_flows_through_inference_pipeline(spark, xlsx_path):
    """S4 → S6: the workbook rides the same type-vote/apply pipeline as CSV
    (reference format matrix, tests/test_analysis/test_analysis_other_formats.py)."""
    from udata_datalake_service_spark.sources.inference import inspect_tabular

    typed, insp = inspect_tabular(spark, xlsx_path)
    assert insp.engine in ("openpyxl", "stdlib-xlsx")
    assert insp.total_lines == 3
    assert insp.columns["nom"]["python_type"] == "string"
    assert insp.columns["montant"]["python_type"] == "float"
    rows = {r["nom"]: r for r in typed.collect()}
    assert rows["Aurélie"]["montant"] == 1020.5
    assert rows["Benoît"]["montant"] == 7.0


def test_analyse_cli_ingests_xlsx(spark, xlsx_path, tmp_path):
    from udata_datalake_service_spark.cli import analyse_csv
    from udata_datalake_service_spark.sinks.lake import Lake

    lake = Lake(spark, str(tmp_path / "lake"))
    name = analyse_csv(spark, lake, xlsx_path, url="https://x.org/f.xlsx")
    back = lake.read_table(name)
    assert back.count() == 3
    reg = lake.registry().filter(F.col("parsing_table") == name).collect()
    assert len(reg) == 1 and '"engine":' in reg[0]["csv_detective"]
