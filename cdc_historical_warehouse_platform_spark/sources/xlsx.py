"""XLSX (Office Open XML spreadsheet) ingestion — stdlib-only.

Spreadsheets are a perennial warehouse ingest source the reference's
CSV path does not cover. An .xlsx file is a ZIP of XML parts (the
ECMA-376 / ISO 29500 spec, public), so the stdlib ``zipfile`` +
``xml.etree`` parse the whole format with zero dependencies:

- ``xl/workbook.xml`` + its rels map sheet names to part paths;
- ``xl/sharedStrings.xml`` holds the deduplicated string table
  (rich-text runs are concatenated per the spec);
- each worksheet's ``sheetData/row/c`` cells carry a reference
  ("B7"), a type (shared string / inline / boolean / number /
  formula-with-cached-value), and a value.

Scale posture: one workbook = one unit of work. Files are read with
Spark's distributed ``binaryFile`` source and parsed inside
``mapInPandas`` (Arrow-batched), so a directory of thousands of
workbooks fans out across the cluster; a single workbook is bounded
by what fits one task — the right contract for a format whose spec
caps sheets at ~1M rows. Output is the LONG form (file, sheet,
row_num, col, value) — schema-free and loss-less; ``xlsx_table``
pivots one sheet into a columnar DataFrame using its header row
(names collected driver-side — one tiny job — the pivot itself is a
distributed groupBy().pivot()).

Values are the raw XML strings (numbers stay as written, booleans
normalize to true/false); typed casts are the caller's `.cast(...)`.
Excel date serials are NOT converted — documented caller concern.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["read_xlsx_rows", "xlsx_table", "parse_xlsx"]

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"

XLSX_ROW_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("sheet", T.StringType()),
        T.StructField("row_num", T.IntegerType()),
        T.StructField("col", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)


def _col_letters(ref: str) -> str:
    """'BC23' -> 'BC' (the column part of a cell reference)."""
    out = []
    for ch in ref:
        if ch.isalpha():
            out.append(ch)
        else:
            break
    return "".join(out)


def col_index(letters: str) -> int:
    """'A' -> 1, 'Z' -> 26, 'AA' -> 27 (the spec's base-26 scheme)."""
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch.upper()) - 64)
    return n


def col_letters_of(n: int) -> str:
    """1 -> 'A', 26 -> 'Z', 27 -> 'AA' (inverse of :func:`col_index`)."""
    out = []
    while n > 0:
        n, rem = divmod(n - 1, 26)
        out.append(chr(65 + rem))
    return "".join(reversed(out))


def _zread(zf, name: str) -> bytes:
    """Read a zip member, converting zipfile's non-ValueError refusals
    (NotImplementedError for exotic compression methods, RuntimeError
    for encrypted entries — both reachable via single bit flips in the
    entry header) into the clean parse-error contract every ingestion
    parser promises."""
    try:
        return zf.read(name)
    except (NotImplementedError, RuntimeError) as err:
        raise ValueError(f"zip member {name!r} unreadable: {err}") from err


def parse_xlsx(payload: bytes, sheet: str | None = None):
    """Workbook bytes → list of (sheet, row_num, col_letters, value).
    Pure function (no Spark) — the unit the Arrow pipeline maps and
    the tests pin directly."""
    import io
    import zipfile
    from xml.etree import ElementTree as ET

    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except (NotImplementedError, RuntimeError) as err:
        # the CONSTRUCTOR parses the central directory and can raise
        # NotImplementedError itself (a bit-flipped extract_version
        # above MAX_EXTRACT_VERSION — found by the corruption fuzz
        # suite), not just member reads (_zread's conversion)
        raise ValueError(f"xlsx: unreadable zip container: {err}") from err

    # sheet name -> part path, via the workbook relationships
    wb = ET.fromstring(_zread(zf, "xl/workbook.xml"))
    rels = ET.fromstring(_zread(zf, "xl/_rels/workbook.xml.rels"))
    rel_targets = {}
    for rel in rels:
        target = rel.get("Target")
        if target.startswith("/"):
            target = target[1:]
        elif not target.startswith("xl/"):
            target = "xl/" + target
        rel_targets[rel.get("Id")] = target
    sheets = []
    for sh in wb.find(f"{_NS}sheets"):
        name = sh.get("name")
        rid = sh.get(_REL_NS)
        if rid in rel_targets:
            sheets.append((name, rel_targets[rid]))
    if sheet is not None:
        sheets = [(n, p) for n, p in sheets if n == sheet]
        if not sheets:
            raise ValueError(f"xlsx: sheet {sheet!r} not found")

    # shared strings: rich-text runs concatenate
    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        sst = ET.fromstring(_zread(zf, "xl/sharedStrings.xml"))
        for si in sst.findall(f"{_NS}si"):
            shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))

    out = []
    for name, part in sheets:
        root = ET.fromstring(_zread(zf, part))
        data = root.find(f"{_NS}sheetData")
        if data is None:
            continue
        last_rnum = 0
        for row in data.findall(f"{_NS}row"):
            # the r attributes are OPTIONAL per ECMA-376 §18.3.1.73/.4:
            # writers may rely on positional order — a missing row r is
            # the row after the previous one, a missing cell r is the
            # column after the previous cell
            r_attr = row.get("r")
            rnum = int(r_attr) if r_attr is not None else last_rnum + 1
            last_rnum = rnum
            next_col = 1
            for cell in row.findall(f"{_NS}c"):
                ref_letters = _col_letters(cell.get("r") or "")
                if ref_letters:
                    next_col = col_index(ref_letters) + 1
                else:
                    ref_letters = col_letters_of(next_col)
                    next_col += 1
                ctype = cell.get("t", "n")
                if ctype == "inlineStr":
                    is_el = cell.find(f"{_NS}is")
                    value = (
                        "".join(t.text or "" for t in is_el.iter(f"{_NS}t"))
                        if is_el is not None
                        else None
                    )
                else:
                    v = cell.find(f"{_NS}v")
                    value = v.text if v is not None else None
                    if value is not None:
                        if ctype == "s":  # shared-string index
                            value = shared[int(value)]
                        elif ctype == "b":
                            value = "true" if value == "1" else "false"
                if value is None:
                    continue  # empty cells carry no data
                out.append((name, rnum, ref_letters, value))
    return out


def read_xlsx_rows(
    spark: SparkSession,
    input_path: str,
    sheet: str | None = None,
    pattern: str = "*.xlsx",
) -> DataFrame:
    """Directory (or single file) of workbooks → long-form rows
    (file, sheet, row_num, col, value). Distributed: binaryFile
    lists/reads executor-side, one workbook per row into the Arrow
    parser."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(input_path)
        .select("path", "content")
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for name, rnum, col, value in parse_xlsx(bytes(content), sheet):
                    out.append(
                        {
                            "file": path,
                            "sheet": name,
                            "row_num": rnum,
                            "col": col,
                            "value": value,
                        }
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in XLSX_ROW_SCHEMA.fields]
            )

    return raw.mapInPandas(_parse, XLSX_ROW_SCHEMA)


def xlsx_table(
    spark: SparkSession,
    input_path: str,
    sheet: str | None = None,
    header_row: int = 1,
    pattern: str = "*.xlsx",
) -> DataFrame:
    """One sheet across workbook(s) → a columnar DataFrame whose
    column names come from the header row. The header is collected
    driver-side (one row per column — tiny by construction); the
    body pivot is a distributed groupBy().pivot() over the long form
    with the header's column letters pinned (no value discovery
    pass). Duplicate header names get their column letter suffixed."""
    rows = read_xlsx_rows(spark, input_path, sheet, pattern)
    hdr = (
        rows.filter(F.col("row_num") == header_row)
        .select("col", "value")
        .distinct()
        .collect()
    )
    if not hdr:
        raise ValueError(f"xlsx: no header cells in row {header_row}")
    by_col = sorted(((col_index(r["col"]), r["col"], r["value"]) for r in hdr))
    names: dict[str, str] = {}
    seen: set[str] = set()
    for _, letters, name in by_col:
        # dedup against ASSIGNED labels, not just base names: a header
        # literally named "a_B" must not collide with the rename of a
        # duplicate "a" in column B — keep suffixing until unique
        label = name
        if label in seen:
            label = f"{name}_{letters}"
        bump = 2
        while label in seen:
            label = f"{name}_{letters}{bump}"
            bump += 1
        seen.add(label)
        names[letters] = label
    body = rows.filter(F.col("row_num") > header_row)
    pivoted = (
        body.groupBy("file", "sheet", "row_num")
        .pivot("col", list(names))
        .agg(F.first("value"))
    )
    renamed = pivoted.select(
        "file",
        "sheet",
        "row_num",
        *[F.col(f"`{letters}`").alias(label) for letters, label in names.items()],
    )
    return renamed.orderBy("file", "sheet", "row_num")
