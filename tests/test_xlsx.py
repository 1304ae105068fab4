"""XLSX ingestion (sources/xlsx.py): stdlib zip+xml workbook parse
through the distributed binaryFile + Arrow pipeline, pinned against
an independent in-test workbook writer."""

from __future__ import annotations

import zipfile

import pytest

from cdc_historical_warehouse_platform_spark.sources.xlsx import (
    col_index,
    parse_xlsx,
    read_xlsx_rows,
    xlsx_table,
)

_WB_XML = """<?xml version="1.0"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
  <sheets>{sheets}</sheets>
</workbook>"""

_RELS_XML = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
{rels}
</Relationships>"""


def _write_xlsx(path, sheets, shared=None):
    """Independent workbook writer. sheets: {name: sheet_xml_body};
    shared: list of shared strings (plain or list-of-runs)."""
    sheet_tags, rel_tags, parts = [], [], {}
    for i, (name, body) in enumerate(sheets.items(), start=1):
        sheet_tags.append(f'<sheet name="{name}" sheetId="{i}" r:id="rId{i}"/>')
        rel_tags.append(
            f'<Relationship Id="rId{i}" Type="http://x" '
            f'Target="worksheets/sheet{i}.xml"/>'
        )
        parts[f"xl/worksheets/sheet{i}.xml"] = (
            '<?xml version="1.0"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main"><sheetData>' + body + "</sheetData></worksheet>"
        )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>',
        )
        zf.writestr("xl/workbook.xml", _WB_XML.format(sheets="".join(sheet_tags)))
        zf.writestr(
            "xl/_rels/workbook.xml.rels", _RELS_XML.format(rels="\n".join(rel_tags))
        )
        if shared is not None:
            sis = []
            for s in shared:
                if isinstance(s, list):  # rich text: multiple runs
                    sis.append(
                        "<si>" + "".join(f"<r><t>{run}</t></r>" for run in s) + "</si>"
                    )
                else:
                    sis.append(f"<si><t>{s}</t></si>")
            zf.writestr(
                "xl/sharedStrings.xml",
                '<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/'
                'spreadsheetml/2006/main">' + "".join(sis) + "</sst>",
            )
        for part, xml in parts.items():
            zf.writestr(part, xml)


SHEET1 = (
    '<row r="1">'
    '<c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>'
    '<c r="C1" t="s"><v>0</v></c>'  # duplicate header name
    "</row>"
    '<row r="2"><c r="A2"><v>12.5</v></c><c r="B2" t="b"><v>1</v></c>'
    '<c r="C2" t="inlineStr"><is><t>inline text</t></is></c></row>'
    '<row r="4"><c r="A4"><v>-3</v></c><c r="C4" t="s"><v>2</v></c></row>'
)
SHEET2 = '<row r="1"><c r="AA1"><v>7</v></c><c r="AB1" t="b"><v>0</v></c></row>'


def test_parse_xlsx_pure(tmp_path):
    """Pure parse: shared strings (incl. rich-text runs), inline
    strings, booleans, numbers, sparse rows/cells, two sheets."""
    f = tmp_path / "wb.xlsx"
    _write_xlsx(
        f,
        {"data": SHEET1, "extra": SHEET2},
        shared=["amount", "ok", ["rich ", "text"]],
    )
    rows = parse_xlsx(f.read_bytes())
    assert ("data", 1, "A", "amount") in rows
    assert ("data", 1, "C", "amount") in rows
    assert ("data", 2, "A", "12.5") in rows
    assert ("data", 2, "B", "true") in rows
    assert ("data", 2, "C", "inline text") in rows
    assert ("data", 4, "C", "rich text") in rows  # runs concatenated
    assert ("extra", 1, "AA", "7") in rows
    assert ("extra", 1, "AB", "false") in rows
    # row 3 absent, empty cells skipped
    assert not any(r[1] == 3 for r in rows)
    # sheet selection + missing sheet
    only = parse_xlsx(f.read_bytes(), sheet="extra")
    assert {r[0] for r in only} == {"extra"}
    with pytest.raises(ValueError, match="not found"):
        parse_xlsx(f.read_bytes(), sheet="nope")


def test_col_index():
    assert [col_index(c) for c in ("A", "Z", "AA", "AZ", "BA", "ZZ", "AAA")] == [
        1, 26, 27, 52, 53, 702, 703,
    ]
    from cdc_historical_warehouse_platform_spark.sources.xlsx import col_letters_of

    for n in list(range(1, 200)) + [702, 703, 16384]:
        assert col_index(col_letters_of(n)) == n


def test_parse_xlsx_positional_rows_and_cells(tmp_path):
    """r10 ADVICE fix: the r attributes are optional per ECMA-376 —
    writers relying on positional order must parse, not crash with
    TypeError. Missing row r = previous row + 1; missing cell r = next
    column after the previous cell."""
    body = (
        "<row><c><v>11</v></c><c><v>12</v></c></row>"  # row 1: A, B
        '<row r="5"><c r="B5"><v>21</v></c><c><v>22</v></c></row>'  # B5 then C5
        "<row><c><v>31</v></c></row>"  # row 6 (5 + 1): A6
    )
    f = tmp_path / "pos.xlsx"
    _write_xlsx(f, {"data": body})
    rows = parse_xlsx(f.read_bytes())
    assert ("data", 1, "A", "11") in rows
    assert ("data", 1, "B", "12") in rows
    assert ("data", 5, "B", "21") in rows
    assert ("data", 5, "C", "22") in rows
    assert ("data", 6, "A", "31") in rows
    assert len(rows) == 5


def test_xlsx_table_header_rename_never_collides(spark, tmp_path):
    """r10 ADVICE fix: the duplicate-header rename (name -> name_<col
    letter>) must keep suffixing when the renamed label collides with
    a header literally named that (e.g. headers 'a', 'a', 'a_B')."""
    body = (
        '<row r="1">'
        '<c r="A1" t="inlineStr"><is><t>a</t></is></c>'
        '<c r="B1" t="inlineStr"><is><t>a</t></is></c>'
        '<c r="C1" t="inlineStr"><is><t>a_B</t></is></c>'
        "</row>"
        '<row r="2"><c r="A2"><v>1</v></c><c r="B2"><v>2</v></c>'
        '<c r="C2"><v>3</v></c></row>'
    )
    _write_xlsx(tmp_path / "dup.xlsx", {"data": body})
    t = xlsx_table(spark, str(tmp_path), sheet="data")
    labels = t.columns[3:]
    assert len(labels) == len(set(labels)) == 3, labels
    assert labels[0] == "a"  # first keeps the bare name
    got = t.collect()[0]
    assert [got[lab] for lab in labels] == ["1", "2", "3"]


def test_read_xlsx_rows_distributed(spark, tmp_path):
    """Two workbooks through the binaryFile + Arrow path: every cell
    lands as one long-form row with its file lineage."""
    _write_xlsx(tmp_path / "a.xlsx", {"data": SHEET1}, shared=["amount", "ok", "x"])
    _write_xlsx(tmp_path / "b.xlsx", {"extra": SHEET2})
    df = read_xlsx_rows(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == len(parse_xlsx((tmp_path / "a.xlsx").read_bytes())) + 2
    by_file = {}
    for r in rows:
        by_file.setdefault(r["file"].rsplit("/", 1)[-1], []).append(r)
    assert set(by_file) == {"a.xlsx", "b.xlsx"}
    aa = next(r for r in by_file["b.xlsx"] if r["col"] == "AA")
    assert (aa["sheet"], aa["row_num"], aa["value"]) == ("extra", 1, "7")


def test_xlsx_table_pivot(spark, tmp_path):
    """Header-row pivot: column names from row 1 (duplicates suffixed
    by column letter), body rows pivoted distributed, typed casts
    left to the caller."""
    _write_xlsx(
        tmp_path / "wb.xlsx",
        {"data": SHEET1},
        shared=["amount", "ok", ["rich ", "text"]],
    )
    t = xlsx_table(spark, str(tmp_path), sheet="data")
    assert t.columns == ["file", "sheet", "row_num", "amount", "ok", "amount_C"]
    got = {r["row_num"]: r for r in t.collect()}
    assert set(got) == {2, 4}
    assert (got[2]["amount"], got[2]["ok"], got[2]["amount_C"]) == (
        "12.5", "true", "inline text",
    )
    assert (got[4]["amount"], got[4]["ok"], got[4]["amount_C"]) == (
        "-3", None, "rich text",
    )
    # typed use: cast in SQL like any string source
    total = t.selectExpr("sum(cast(amount as double)) s").collect()[0]["s"]
    assert total == 9.5


def test_parse_xlsx_converts_constructor_refusals(tmp_path):
    """A bit-flipped extract_version in the central directory makes
    zipfile's CONSTRUCTOR raise NotImplementedError("zip file version
    ...") before any member read — parse_xlsx must convert it to the
    clean ValueError parse contract (found by the corruption fuzz
    suite at seed 49485)."""
    import pytest

    from cdc_historical_warehouse_platform_spark.sources.xlsx import parse_xlsx

    f = tmp_path / "wb.xlsx"
    _write_xlsx(f, {"s": '<row r="1"><c r="A1"><v>1</v></c></row>'})
    payload = bytearray(f.read_bytes())
    # central directory entry: PK\x01\x02 <ver_made(2)> <ver_extract(2)>
    cd = payload.rfind(b"PK\x01\x02")
    assert cd != -1
    payload[cd + 6] = 0xFF  # extract_version -> 25.5, > MAX_EXTRACT_VERSION
    with pytest.raises(ValueError, match="unreadable zip container"):
        parse_xlsx(bytes(payload))
