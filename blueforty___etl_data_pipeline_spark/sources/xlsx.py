"""XLSX (Office Open XML SpreadsheetML, ECMA-376) source — the
business-data sibling of the CSV/XML readers: a huge share of real
ETL feeds arrive as spreadsheets, and the reference pipeline's
CSV/XML surface stops one format short of them.

An .xlsx file is a ZIP of XML parts; the subset a data pipeline needs
is exactly what is implemented, all stdlib (``zipfile`` +
``xml.etree``):

- :func:`write_xlsx` — deterministic fixture builder/sink: a
  spec-valid package ([Content_Types].xml, package + workbook rels,
  workbook, one worksheet, sharedStrings) with fixed zip timestamps
  so re-runs are byte-identical.  Strings go through the SHARED
  STRING table (as Excel itself writes them), numbers are inline
  ``<v>`` cells — so the reader's type dispatch is really exercised.
- :func:`read_xlsx` — distributed reader: ``binaryFile`` scan (one
  spreadsheet per task — the natural unit; spreadsheets are small
  and numerous) → stdlib unzip + SAX-free element walk → one output
  row per cell with A1 reference decoded to (row, col), shared
  strings resolved, and the raw type tag kept.  Unknown cell types
  raise (honest gate) rather than silently nulling.

Scale shape: file-level parallelism like the WARC reader — a feed of
10k workbook files fans out across the cluster with no coordination;
per-task memory is one workbook.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (callers' convenience)

_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
</Relationships>"""

_WORKBOOK = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="{_NS}" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""


def col_letter(idx: int) -> str:
    """0-based column index → A1 letters (0→A, 25→Z, 26→AA)."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def parse_ref(ref: str) -> tuple[int, int]:
    """A1 reference → (row, col), both 0-based."""
    m = re.fullmatch(r"([A-Z]+)(\d+)", ref)
    if not m:
        raise ValueError(f"bad cell reference {ref!r}")
    col = 0
    for ch in m.group(1):
        col = col * 26 + (ord(ch) - ord("A") + 1)
    return int(m.group(2)) - 1, col - 1


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def write_xlsx(rows: list[list], path: str) -> int:
    """Write ``rows`` (cells are str or int) as a one-sheet workbook.

    Returns the number of DISTINCT shared strings (Excel's dedup —
    repeated strings are stored once), handy for manifest checks.
    Byte-deterministic: fixed zip timestamps, stored (uncompressed)
    entries, insertion-ordered shared strings.
    """
    shared: dict[str, int] = {}
    body = []
    for r, row in enumerate(rows):
        cells = []
        for c, v in enumerate(row):
            ref = f"{col_letter(c)}{r + 1}"
            if isinstance(v, bool):
                raise ValueError("boolean cells not supported")
            if isinstance(v, int):
                cells.append(f'<c r="{ref}"><v>{v}</v></c>')
            else:
                s = str(v)
                if s not in shared:
                    shared[s] = len(shared)
                cells.append(
                    f'<c r="{ref}" t="s"><v>{shared[s]}</v></c>'
                )
        body.append(f'<row r="{r + 1}">{"".join(cells)}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_NS}"><sheetData>'
        + "".join(body)
        + "</sheetData></worksheet>"
    )
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="{_NS}" count="{len(shared)}" '
        f'uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{_esc(s)}</t></si>" for s in shared)
        + "</sst>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        for name, data in (
            ("[Content_Types].xml", _CONTENT_TYPES),
            ("_rels/.rels", _ROOT_RELS),
            ("xl/workbook.xml", _WORKBOOK),
            ("xl/_rels/workbook.xml.rels", _WB_RELS),
            ("xl/worksheets/sheet1.xml", sheet),
            ("xl/sharedStrings.xml", sst),
        ):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.external_attr = 0o644 << 16
            z.writestr(zi, data)
    import os

    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)
    return len(shared)


def parse_xlsx_cells(data: bytes) -> list[tuple[int, int, str, str]]:
    """One workbook's cells as (row, col, cell_type, value) with
    shared strings resolved.  ``cell_type`` is 'n' (number) or 's'
    (string); shared (t="s"), formula-cached (t="str") and inline
    (t="inlineStr") strings all normalize to 's'.  Other cell types
    (error, boolean) raise."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        strings: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{{{_NS}}}si"):
                strings.append(
                    "".join(
                        t.text or ""
                        for t in si.iter(f"{{{_NS}}}t")
                    )
                )
        sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
        out = []
        for cell in sheet.iter(f"{{{_NS}}}c"):
            ref = cell.get("r")
            ctype = cell.get("t", "n")
            row, col = parse_ref(ref)
            if ctype == "inlineStr":
                # inline strings carry <is><t>…</t></is>, no <v>
                is_el = cell.find(f"{{{_NS}}}is")
                if is_el is None:
                    continue  # empty inline cell
                out.append((
                    row, col, "s",
                    "".join(
                        t.text or "" for t in is_el.iter(f"{{{_NS}}}t")
                    ),
                ))
                continue
            vel = cell.find(f"{{{_NS}}}v")
            if vel is None:
                continue  # genuinely empty cell
            if ctype == "s":
                out.append((row, col, "s", strings[int(vel.text)]))
            elif ctype == "str":
                # formula-cached STRING result: the value is arbitrary
                # text, so it must surface as 's', never 'n' (numeric
                # consumers of 'n' would choke on it)
                out.append((row, col, "s", vel.text or ""))
            elif ctype == "n":
                out.append((row, col, "n", vel.text))
            else:
                raise ValueError(f"unsupported cell type {ctype!r}")
        return out


def read_xlsx(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed XLSX scan: one workbook per task, one output row
    per cell — (file, row, col, cell_type, value)."""
    import os

    base, leaf = os.path.split(path_glob)
    reader = spark.read.format("binaryFile")
    if any(ch in leaf for ch in "*?["):
        files = reader.option("pathGlobFilter", leaf).load(base)
    else:
        files = reader.load(path_glob)

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for r, c, t, v in parse_xlsx_cells(bytes(content)):
                    rows.append((path, r, c, t, v))
            yield pd.DataFrame(
                rows,
                columns=["file", "row", "col", "cell_type", "value"],
            )

    return files.select("path", "content").mapInPandas(
        parse,
        schema=(
            "file string, row int, col int, cell_type string, "
            "value string"
        ),
    )
