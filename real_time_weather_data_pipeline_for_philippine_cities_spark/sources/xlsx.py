"""Minimal xlsx snapshot reader (SURVEY.md §2.1 S4, §2.2 K4).

The reference persists its location dimension as an Excel file
(weather_data_fetcher.py:372,426,436). This container has no Excel
library, and none is needed: xlsx is a zip of XML, and a snapshot
DIMENSION file is small by definition (the reference's has 146 rows), so
a driver-side stdlib parse feeding ``spark.createDataFrame`` is the
appropriate scale choice — the distributed path for big data is parquet
(sinks/tables.py); this source exists for fidelity with the reference's
on-disk state.

Handles the layouts pandas' ``to_excel`` emits: shared strings (t="s"),
inline strings (t="inlineStr"), plain strings (t="str"), and numbers.
All values are returned as Python strings or floats; the caller applies
the explicit snapshot schema (zero-padded PSGC codes must stay strings —
SURVEY.md §1.2).
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}


def _cell_col(ref: str) -> int:
    """'B7' → 1 (0-based column index)."""
    letters = re.match(r"[A-Z]+", ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def read_xlsx_rows(path: str, sheet: str = "xl/worksheets/sheet1.xml") -> list[list]:
    """All rows of the first worksheet as lists (None for empty cells)."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall("m:si", _NS):
                shared.append("".join(t.text or "" for t in si.iter(f"{{{_NS['m']}}}t")))
        root = ET.fromstring(z.read(sheet))
        rows: list[list] = []
        for row_el in root.iter(f"{{{_NS['m']}}}row"):
            cells: dict[int, object] = {}
            for c in row_el.findall("m:c", _NS):
                col = _cell_col(c.attrib["r"])
                ctype = c.attrib.get("t", "n")
                if ctype == "inlineStr":
                    is_el = c.find("m:is", _NS)
                    if is_el is None:  # empty cell, e.g. null oldName
                        val = None
                    else:
                        val = "".join(
                            t.text or "" for t in is_el.iter(f"{{{_NS['m']}}}t")
                        )
                else:
                    v = c.find("m:v", _NS)
                    if v is None or v.text is None:
                        val = None
                    elif ctype == "s":
                        val = shared[int(v.text)]
                    elif ctype == "str":
                        val = v.text
                    elif ctype == "b":
                        val = bool(int(v.text))
                    else:
                        val = float(v.text)
                cells[col] = val
            width = max(cells) + 1 if cells else 0
            rows.append([cells.get(i) for i in range(width)])
        n = max((len(r) for r in rows), default=0)
        return [r + [None] * (n - len(r)) for r in rows]


def _col_letters(idx: int) -> str:
    """0-based column index → 'A', 'B', …, 'AA'."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


#: Hard cap on rows the driver-side xlsx writer will collect. The writer
#: exists for the reference's 146-row locations dimension; routing a fact
#: table through it would silently pull the table into driver memory.
XLSX_MAX_ROWS = 100_000


def write_xlsx_snapshot(df: DataFrame, path: str, max_rows: int = XLSX_MAX_ROWS) -> None:
    """Write a DataFrame back as an xlsx snapshot — the reference's
    ``to_excel`` step (weather_data_fetcher.py:426) for literal on-disk
    fidelity (SURVEY.md §2.2 K4).

    Driver-side by design: the snapshot is a bounded DIMENSION (146 rows in
    the reference); the distributed sink for unbounded data is parquet
    (sinks/tables.py). Emits inline strings (no sharedStrings table),
    numbers as numeric cells, booleans as t="b", and OMITS null cells —
    exactly the layouts ``read_xlsx_rows`` parses, so write→read
    round-trips losslessly (tested against the reference's real file).

    The lossless claim is enforced, not assumed: non-finite floats
    (NaN/inf have no numeric-cell representation — Excel itself cannot
    store them) and cell types outside str/int/float/bool/None raise
    ``ValueError`` instead of silently degrading to an unreadable numeric
    cell or a stringified inline value.

    ``max_rows`` guards the ``collect()``: this is a DIMENSION snapshot
    writer, and anything larger than the cap is almost certainly a fact
    table routed to the wrong sink — raise instead of OOMing the driver
    (use sinks/tables.py parquet for unbounded data)."""
    import math as _math
    import zipfile as _zf

    header = df.columns
    # limit(max_rows + 1): detect overflow with a bounded fetch — never
    # materialize the oversized table just to count it.
    rows = [list(r) for r in df.limit(max_rows + 1).collect()]
    if len(rows) > max_rows:
        raise ValueError(
            f"write_xlsx_snapshot is a driver-side dimension writer "
            f"(> {max_rows} rows collected); use the distributed parquet "
            "sink (sinks/tables.py) for fact-sized data"
        )

    def cell(ref: str, v: object) -> str:
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, float) and not _math.isfinite(v):
            raise ValueError(
                f"cell {ref}: non-finite float {v!r} has no xlsx numeric "
                "representation; filter or null it out before snapshotting"
            )
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        if isinstance(v, str):
            return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{_xml_escape(v)}</t></is></c>'
        raise ValueError(
            f"cell {ref}: unsupported type {type(v).__name__} — the xlsx "
            "snapshot round-trips only str/int/float/bool/None; cast "
            "datetimes/decimals to string or double in the DataFrame first"
        )

    ns = _NS["m"]
    sheet_rows = []
    for ri, vals in enumerate([header, *rows], start=1):
        cells = "".join(cell(f"{_col_letters(ci)}{ri}", v) for ci, v in enumerate(vals))
        sheet_rows.append(f'<row r="{ri}">{cells}</row>')
    sheet = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{ns}"><sheetData>{"".join(sheet_rows)}</sheetData></worksheet>'
    )
    rels_ns = "http://schemas.openxmlformats.org/package/2006/relationships"
    doc_rel = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{rels_ns}">'
        f'<Relationship Id="rId1" Type="{doc_rel}/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{ns}" xmlns:r="{doc_rel}">'
        '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{rels_ns}">'
        f'<Relationship Id="rId1" Type="{doc_rel}/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    with _zf.ZipFile(path, "w", _zf.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def read_xlsx_snapshot(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """First row = header; remaining rows → DataFrame.

    Without ``schema``, every column is StringType (safest for PSGC code
    columns) except cells that parsed as floats, which keep DoubleType via
    stringification only when mixed. Pass an explicit DDL schema for typed
    reads.
    """
    rows = read_xlsx_rows(path)
    if not rows:
        raise ValueError(f"empty xlsx: {path}")
    header = [str(h) for h in rows[0]]
    data = rows[1:]
    if schema is None:
        # all-string: deterministic, inference-free
        data = [[None if v is None else str(v) for v in r] for r in data]
        schema = ", ".join(f"`{h}` string" for h in header)
    return spark.createDataFrame(data, schema)
