"""Excel (xlsx) source + sink — stdlib-only OOXML implementation.

Reference analogs:

* ``ExcelReader`` — ``PipeFlow/Excel/ExcelReader.cs:61-163``: sheet by
  name/index, ``WithHeaders`` (blank header → ``Column{i}``, headerless →
  ``Column1..N``), ``Range(startRow, startCol, endRow, endCol)``, typed cell
  values (integral numbers → int64, else double; bool; text), empty rows
  skipped.
* ``ExcelWriter`` — ``PipeFlow/Excel/ExcelWriter.cs:58-197``: single sheet,
  bold header row, canonical ``yyyy-MM-dd HH:mm:ss`` datetime format.

The reference uses ClosedXML; this module parses/emits the OOXML
spreadsheet package (a zip of XML parts) directly with ``zipfile`` +
``xml.etree`` — no third-party dependency, which keeps the parser usable
inside executor Python workers.

Scale design: xlsx is an inherently small-file, driver-friendly format (the
reference loads the whole workbook in memory too), but a *corpus* of xlsx
files is a real ingest shape.  :func:`read_excel` therefore has two paths:

* single file → parse driver-side, ``spark.createDataFrame`` (exact analog
  of the reference's eager reader);
* glob/directory → ``spark.read.format("binaryFile")`` + ``mapInPandas``:
  each executor parses its own files in parallel, emitting Arrow batches —
  the scan distributes, the driver never sees file bytes.
"""

from __future__ import annotations

import datetime as _dt
import io
import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame, SparkSession

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_to_idx(ref: str) -> int:
    """``A`` → 1, ``Z`` → 26, ``AA`` → 27 (1-based)."""
    idx = 0
    for ch in ref:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx


def _idx_to_col(idx: int) -> str:
    out = ""
    while idx > 0:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in ET.fromstring(data).iter(f"{_NS}si"):
        # concatenate all <t> runs (rich text splits one string across runs)
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _sheet_paths(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """Ordered ``(sheet_name, zip_path)`` pairs from workbook.xml + rels."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rel_ns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
    target_by_id = {
        rel.get("Id"): rel.get("Target")
        for rel in rels.iter(f"{rel_ns}Relationship")
    }
    sheets = []
    for sh in wb.iter(f"{_NS}sheet"):
        target = target_by_id[sh.get(f"{_REL_NS}id")]
        if not target.startswith("xl/"):
            target = "xl/" + target.lstrip("/")
        sheets.append((sh.get("name"), target))
    return sheets


def _cell_value(cell, shared: list[str]):
    """Typed value per ExcelReader.GetCellValue (ExcelReader.cs:131-163):
    integral numbers → int, else float; bool; text."""
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        is_el = cell.find(f"{_NS}is")
        return "".join(t.text or "" for t in is_el.iter(f"{_NS}t")) if is_el is not None else None
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    raw = v.text
    if ctype == "s":
        return shared[int(raw)]
    if ctype == "b":
        return raw == "1"
    if ctype == "str":
        return raw
    num = float(raw)
    if num == int(num) and abs(num) < 2**62:
        return int(num)
    return num


def parse_xlsx(
    data: bytes,
    sheet: str | int | None = None,
    headers: bool = True,
    start_row: int = 1,
    start_col: int = 1,
    end_row: int | None = None,
    end_col: int | None = None,
) -> tuple[list[str], list[dict]]:
    """Parse one xlsx payload → ``(column_names, rows)``.

    Pure function of the bytes (runs identically on the driver or inside an
    executor's ``mapInPandas`` worker).  Semantics mirror
    ``ExcelReader.Read`` (ExcelReader.cs:61-129): header row at
    ``start_row`` when ``headers`` (blank header cell → ``Column{col}``),
    otherwise synthesized ``Column1..N``; fully-empty rows skipped.
    """
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        shared = _shared_strings(zf)
        sheets = _sheet_paths(zf)
        if isinstance(sheet, str):
            path = dict(sheets)[sheet]
        elif isinstance(sheet, int):
            path = sheets[sheet - 1][1]  # reference sheets are 1-indexed
        else:
            path = sheets[0][1]
        grid: dict[int, dict[int, object]] = {}
        max_col = 0
        for row_el in ET.fromstring(zf.read(path)).iter(f"{_NS}row"):
            r = int(row_el.get("r"))
            cells = {}
            for cell in row_el.iter(f"{_NS}c"):
                m = _CELL_REF.match(cell.get("r", ""))
                if not m:
                    continue
                c = _col_to_idx(m.group(1))
                val = _cell_value(cell, shared)
                if val is not None:
                    cells[c] = val
                    max_col = max(max_col, c)
            if cells:
                grid[r] = cells

    last_row = end_row if end_row is not None else (max(grid) if grid else 0)
    last_col = end_col if end_col is not None else max_col
    if last_row == 0 or last_col == 0:
        return [], []

    current = start_row
    names: list[str] = []
    if headers:
        header_cells = grid.get(current, {})
        for c in range(start_col, last_col + 1):
            h = header_cells.get(c)
            h = str(h) if h is not None and str(h).strip() else f"Column{c}"
            names.append(h)
        current += 1
    else:
        names = [f"Column{c - start_col + 1}" for c in range(start_col, last_col + 1)]

    rows = []
    for r in range(current, last_row + 1):
        cells = grid.get(r)
        if not cells:
            continue
        row = {names[c - start_col]: cells.get(c) for c in range(start_col, last_col + 1)}
        if any(v is not None for v in row.values()):
            rows.append(row)
    return names, rows


def read_excel(
    spark: SparkSession,
    path: str,
    sheet: str | int | None = None,
    headers: bool = True,
    schema=None,
    start_row: int = 1,
    start_col: int = 1,
    end_row: int | None = None,
    end_col: int | None = None,
) -> DataFrame:
    """Read xlsx into a DataFrame.

    Single ``.xlsx`` file → driver-side parse + ``createDataFrame`` (the
    reference's eager shape).  A glob or directory → distributed parse:
    ``binaryFile`` scan, then each executor runs :func:`parse_xlsx` over its
    files inside ``mapInPandas`` (requires ``schema`` — there is no sane way
    to infer a schema without reading a file, and at corpus scale the caller
    knows the sheet shape).
    """
    kwargs = dict(
        sheet=sheet, headers=headers, start_row=start_row,
        start_col=start_col, end_row=end_row, end_col=end_col,
    )
    import os

    if os.path.isfile(path):
        with open(path, "rb") as f:
            names, rows = parse_xlsx(f.read(), **kwargs)
        if schema is not None:
            return spark.createDataFrame([[r.get(n) for n in names] for r in rows], schema)
        return spark.createDataFrame([[r.get(n) for n in names] for r in rows], names)

    if schema is None:
        raise ValueError("reading an xlsx directory/glob requires an explicit schema")

    import pandas as pd

    field_names = [f.name for f in schema.fields]

    def _parse_files(batches):
        for pdf in batches:
            out = []
            for content in pdf["content"]:
                _, rows = parse_xlsx(bytes(content), **kwargs)
                out.extend(rows)
            yield pd.DataFrame(
                {n: [r.get(n) for r in out] for n in field_names}
                if out else {n: [] for n in field_names}
            )

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(_parse_files, schema=schema)


_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)
_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)
_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


# Minimal stylesheet: font 0 = default, font 1 = bold; cell xf 1 applies the
# bold font (header styling — ExcelWriter.cs:97 ``Style.Font.Bold = true``).
_STYLES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
    '<fonts count="2"><font><sz val="11"/><name val="Calibri"/></font>'
    '<font><b/><sz val="11"/><name val="Calibri"/></font></fonts>'
    '<fills count="2"><fill><patternFill patternType="none"/></fill>'
    '<fill><patternFill patternType="gray125"/></fill></fills>'
    '<borders count="1"><border><left/><right/><top/><bottom/><diagonal/></border></borders>'
    '<cellStyleXfs count="1"><xf numFmtId="0" fontId="0" fillId="0" borderId="0"/></cellStyleXfs>'
    '<cellXfs count="2"><xf numFmtId="0" fontId="0" fillId="0" borderId="0" xfId="0"/>'
    '<xf numFmtId="0" fontId="1" fillId="0" borderId="0" xfId="0" applyFont="1"/></cellXfs>'
    "</styleSheet>"
)


def _display_len(value) -> int:
    """Rendered width of a cell in characters — the autofit metric
    (ExcelWriter.cs:123 ``Columns().AdjustToContents()``)."""
    if value is None:
        return 0
    if isinstance(value, _dt.datetime):
        return 19  # canonical "%Y-%m-%d %H:%M:%S"
    return len(str(value))


def _cell_xml(ref: str, value, style: int | None = None) -> str:
    """One <c> element per ExcelWriter.SetCellValue (ExcelWriter.cs:155-197):
    numbers as numbers, bools as bools, datetimes canonical-formatted text,
    everything else inline string."""
    if value is None:
        return ""
    s = f' s="{style}"' if style else ""
    if isinstance(value, bool):
        return f'<c r="{ref}"{s} t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"{s}><v>{value!r}</v></c>'
    if isinstance(value, _dt.datetime):
        value = value.strftime("%Y-%m-%d %H:%M:%S")
    return (
        f'<c r="{ref}"{s} t="inlineStr"><is>'
        f'<t xml:space="preserve">{escape(str(value))}</t></is></c>'
    )


def write_excel(
    df: DataFrame,
    path: str,
    sheet: str = "Sheet1",
    headers: bool = True,
    append: bool = False,
    bold_headers: bool = True,
    autofit: bool = True,
    create_table: bool = False,
    table_style: str = "TableStyleMedium2",
) -> None:
    """Write a DataFrame to a single xlsx file (ExcelWriter.cs:58-127).

    Driver-side by necessity — xlsx is one zip, not a partitioned format;
    like :func:`~pipeflow_spark.sinks.collect_json_document` this is for
    small result sets (reports), never a data-plane sink.  Rows are fetched
    via ``toLocalIterator`` so only one partition is resident at a time.

    Writer-fidelity features mirroring the reference:

    * ``append=True`` continues after the last used row of an existing file
      without re-writing the header (ExcelWriter.cs:75-90, ``WithAppend``);
    * ``bold_headers`` — header row uses the bold cell style
      (ExcelWriter.cs:97);
    * ``autofit`` — per-column ``<col width>`` sized to the longest rendered
      value (ExcelWriter.cs:121-124 ``AdjustToContents``);
    * ``create_table`` — a real OOXML table part over the data range with
      ``table_style`` (ExcelWriter.cs:113-118 ``CreateTable``; like the
      reference, skipped in append mode).
    """
    import os

    names = df.columns
    prefix: list[list] = []
    if append and os.path.exists(path):
        with open(path, "rb") as f:
            _, existing = parse_xlsx(f.read(), headers=False)
        width = max((len(r) for r in existing), default=len(names))
        cols = [f"Column{i + 1}" for i in range(width)]
        prefix = [[row.get(c) for c in cols] for row in existing]
        headers = False  # reference only writes headers into a fresh sheet
        create_table = False  # ExcelWriter.cs:113 `_createTable && !_append`
    widths: dict[int, int] = {}

    def _row_xml(r: int, vals, style: int | None = None) -> str:
        cells = []
        for i, v in enumerate(vals):
            widths[i] = max(widths.get(i, 0), _display_len(v))
            cells.append(_cell_xml(f"{_idx_to_col(i + 1)}{r}", v, style))
        return f'<row r="{r}">{"".join(cells)}</row>'

    rows_xml = io.StringIO()
    r = 1
    for vals in prefix:
        rows_xml.write(_row_xml(r, vals))
        r += 1
    header_row = r if headers else None
    if headers:
        rows_xml.write(_row_xml(r, names, style=1 if bold_headers else None))
        r += 1
    for row in df.toLocalIterator():
        rows_xml.write(_row_xml(r, [row[n] for n in names]))
        r += 1
    last_row = r - 1

    body = io.StringIO()
    body.write(
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    )
    if autofit and widths:
        body.write("<cols>")
        for i in sorted(widths):
            w = min(widths[i] + 2, 80)  # margin, capped like AdjustToContents
            body.write(f'<col min="{i + 1}" max="{i + 1}" width="{w}" customWidth="1"/>')
        body.write("</cols>")
    body.write("<sheetData>")
    body.write(rows_xml.getvalue())
    body.write("</sheetData>")
    table_xml = None
    if create_table and headers and last_row > header_row:
        ref = f"A{header_row}:{_idx_to_col(len(names))}{last_row}"
        tcols = "".join(
            f'<tableColumn id="{i + 1}" name="{escape(n)}"/>' for i, n in enumerate(names)
        )
        table_xml = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<table xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            f'id="1" name="Table1" displayName="Table1" ref="{ref}" headerRowCount="1">'
            f'<autoFilter ref="{ref}"/>'
            f'<tableColumns count="{len(names)}">{tcols}</tableColumns>'
            f'<tableStyleInfo name="{escape(table_style)}" showFirstColumn="0" '
            'showLastColumn="0" showRowStripes="1" showColumnStripes="0"/></table>'
        )
        body.write('<tableParts count="1"><tablePart r:id="rId1"/></tableParts>')
    body.write("</worksheet>")

    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{escape(sheet)}" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    content_types = _CONTENT_TYPES.replace(
        "</Types>",
        '<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-'
        'officedocument.spreadsheetml.styles+xml"/>'
        + (
            '<Override PartName="/xl/tables/table1.xml" ContentType="application/vnd.'
            'openxmlformats-officedocument.spreadsheetml.table+xml"/>'
            if table_xml
            else ""
        )
        + "</Types>",
    )
    wb_rels = _WB_RELS.replace(
        "</Relationships>",
        '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/'
        '2006/relationships/styles" Target="styles.xml"/></Relationships>',
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/styles.xml", _STYLES)
        zf.writestr("xl/worksheets/sheet1.xml", body.getvalue())
        if table_xml:
            zf.writestr(
                "xl/worksheets/_rels/sheet1.xml.rels",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
                '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
                'officeDocument/2006/relationships/table" Target="../tables/table1.xml"/>'
                "</Relationships>",
            )
            zf.writestr("xl/tables/table1.xml", table_xml)
