"""Minimal pure-stdlib OOXML writers: real .xlsx (S12) and .docx (S15)
sinks with zero third-party dependencies.

Both formats are ZIP packages of XML parts (ECMA-376, public spec).
The container has no openpyxl / python-docx, but the driver-side
reports these sinks serve are tiny by construction (aggregated tables,
an n-row verification sample), so a direct XML render is complete and
appropriate — the reference's pandas `.to_excel` / python-docx calls
(`pattern_extractor.py:220-229`, `coverage_verification.py:57-103`)
do exactly this under the hood.

xlsx: one worksheet, inline strings (no sharedStrings part), numbers
as native `<v>` cells so spreadsheet formulas work on them.
docx: paragraphs with optional Heading1/Heading2 styles and bold runs,
plus the minimal styles part so the headings actually render styled.
"""

from __future__ import annotations

import zipfile
from xml.sax.saxutils import escape


_XLSX_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_XLSX_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_XLSX_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="{sheet}" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_XLSX_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _col_ref(idx: int) -> str:
    """0-based column index → A1-style column letters."""
    ref = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        ref = chr(ord("A") + rem) + ref
    return ref


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):  # before int: bool is an int subclass
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        if isinstance(value, float) and value != value:  # NaN → blank
            return ""
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    text = escape(str(value))
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{text}</t></is></c>'


def write_xlsx(
    path: str,
    header: list[str],
    rows: list[list],
    sheet: str = "report",
) -> str:
    """Write a single-sheet .xlsx.  ``rows`` are already driver-side
    (tiny aggregated reports only — never call this on a distributed
    result; write parquet/CSV via the DataFrame API for those)."""
    body: list[str] = []
    for r_idx, row in enumerate([list(header)] + [list(r) for r in rows], start=1):
        cells = "".join(
            _cell_xml(f"{_col_ref(c_idx)}{r_idx}", v) for c_idx, v in enumerate(row)
        )
        body.append(f'<row r="{r_idx}">{cells}</row>')
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(body)}</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _XLSX_CONTENT_TYPES)
        z.writestr("_rels/.rels", _XLSX_ROOT_RELS)
        z.writestr("xl/workbook.xml", _XLSX_WORKBOOK.format(sheet=escape(sheet)))
        z.writestr("xl/_rels/workbook.xml.rels", _XLSX_WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)
    return path


_DOCX_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
<Override PartName="/word/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.styles+xml"/>
</Types>"""

_DOCX_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
</Relationships>"""

_DOCX_DOC_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
</Relationships>"""

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

_DOCX_STYLES = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<w:styles xmlns:w="{_W}">
<w:style w:type="paragraph" w:styleId="Heading1">
<w:name w:val="heading 1"/><w:rPr><w:b/><w:sz w:val="32"/></w:rPr></w:style>
<w:style w:type="paragraph" w:styleId="Heading2">
<w:name w:val="heading 2"/><w:rPr><w:b/><w:sz w:val="26"/></w:rPr></w:style>
</w:styles>"""


def _run_xml(text: str, bold: bool, highlight: str | None) -> str:
    props = ""
    if bold or highlight:
        inner = ("<w:b/>" if bold else "") + (
            f'<w:highlight w:val="{highlight}"/>' if highlight else ""
        )
        props = f"<w:rPr>{inner}</w:rPr>"
    return (
        f'<w:r>{props}<w:t xml:space="preserve">{escape(text)}</w:t></w:r>'
    )


def write_docx(path: str, paragraphs: list[dict]) -> str:
    """Write a .docx.  Each paragraph dict: ``{"text": str}`` plus
    optional ``style`` ("Heading1"/"Heading2"), ``bold`` (whole-para
    bold run) and ``highlight`` (OOXML highlight color name, e.g.
    "yellow" — the reference's colored section marker,
    `coverage_verification.py:57-103`).  Driver-side, n-row inputs
    only."""
    paras: list[str] = []
    for p in paragraphs:
        p_props = (
            f'<w:pPr><w:pStyle w:val="{p["style"]}"/></w:pPr>' if p.get("style") else ""
        )
        run = _run_xml(p.get("text", ""), bool(p.get("bold")), p.get("highlight"))
        paras.append(f"<w:p>{p_props}{run}</w:p>")
    doc_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W}"><w:body>{"".join(paras)}</w:body></w:document>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _DOCX_CONTENT_TYPES)
        z.writestr("_rels/.rels", _DOCX_ROOT_RELS)
        z.writestr("word/_rels/document.xml.rels", _DOCX_DOC_RELS)
        z.writestr("word/styles.xml", _DOCX_STYLES)
        z.writestr("word/document.xml", doc_xml)
    return path


def read_xlsx_cells(path: str) -> list[list]:
    """Parse back the single sheet (tests + debugging): list of rows of
    python values (str for inline strings, float for numbers)."""
    import xml.etree.ElementTree as ET

    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    with zipfile.ZipFile(path) as z:
        root = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    rows = []
    for row in root.findall(".//m:row", ns):
        vals = []
        for c in row.findall("m:c", ns):
            if c.get("t") == "inlineStr":
                t = c.find("m:is/m:t", ns)
                vals.append(t.text or "" if t is not None else "")
            else:
                v = c.find("m:v", ns)
                vals.append(float(v.text) if v is not None else None)
        rows.append(vals)
    return rows


def read_docx_paragraphs(path: str) -> list[tuple[str | None, bool, str]]:
    """Parse back (style, bold, text) per paragraph (tests + debugging)."""
    import xml.etree.ElementTree as ET

    ns = {"w": _W}
    with zipfile.ZipFile(path) as z:
        root = ET.fromstring(z.read("word/document.xml"))
    out = []
    for p in root.findall(".//w:p", ns):
        style_el = p.find("w:pPr/w:pStyle", ns)
        style = style_el.get(f"{{{_W}}}val") if style_el is not None else None
        bold = p.find(".//w:rPr/w:b", ns) is not None
        text = "".join(t.text or "" for t in p.findall(".//w:t", ns))
        out.append((style, bold, text))
    return out
