"""DOCX (Office Open XML WordprocessingML) text extraction — the
document sibling of :mod:`sources.xlsx`: a .docx is a ZIP whose
``word/document.xml`` carries the text as ``<w:body>`` →
``<w:p>`` paragraphs → ``<w:r>`` runs → ``<w:t>`` text nodes (plus
``<w:tab/>`` and ``<w:br/>`` inline controls), per ECMA-376.  Office
documents are a major text-corpus modality, and the extraction path
is pure stdlib (``zipfile`` + ``xml.etree``) like every codec in this
engine.

- :func:`write_docx` — deterministic fixture builder: a real minimal
  OOXML package ([Content_Types].xml, _rels/.rels,
  word/document.xml) with zeroed zip timestamps, so the same
  paragraphs always produce identical bytes.
- :func:`parse_docx_text` — paragraph-level extraction: runs joined
  in order, tabs → ``\\t``, breaks → ``\\n`` within the paragraph;
  returns [(paragraph_index, text), ...].
- :func:`read_docx` — the distributed form: ``binaryFile`` scan over
  many .docx files → Arrow-batched parse, one row per paragraph.

Reference parity: the reference pipeline (BlueForty.py) reads CSV/
TSV/XML only; this extends the engine's document-ingest surface.
"""

from __future__ import annotations

import io
import zipfile
from typing import Iterator
from xml.etree import ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.wordprocessingml.document.main'
    '+xml"/></Types>'
)

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="word/document.xml"/></Relationships>'
)


def write_docx(paragraphs: list[str]) -> bytes:
    """Paragraph texts → a real minimal .docx package (bytes).
    ``\\t`` inside a paragraph becomes a ``<w:tab/>`` run element and
    ``\\n`` a ``<w:br/>``, so the reader's inline-control handling is
    genuinely exercised; runs get ``xml:space='preserve'`` so leading
    and trailing spaces survive the XML layer."""
    body = []
    for p in paragraphs:
        runs = []
        for i, seg in enumerate(p.replace("\n", "\x00\n\x00")
                                 .replace("\t", "\x00\t\x00")
                                 .split("\x00")):
            if seg == "\t":
                runs.append("<w:tab/>")
            elif seg == "\n":
                runs.append("<w:br/>")
            elif seg:
                runs.append(
                    f'<w:t xml:space="preserve">{_esc(seg)}</w:t>'
                )
        body.append("<w:p><w:r>" + "".join(runs) + "</w:r></w:p>")
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{W_NS}"><w:body>'
        + "".join(body)
        + "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        for name, payload in (
            ("[Content_Types].xml", _CONTENT_TYPES),
            ("_rels/.rels", _RELS),
            ("word/document.xml", document),
        ):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            z.writestr(zi, payload)
    return buf.getvalue()


def parse_docx_text(data: bytes) -> list[tuple[int, str]]:
    """.docx bytes → [(paragraph_index, text), ...] in document
    order; ``<w:tab/>`` → TAB, ``<w:br/>`` → LF, every ``<w:t>`` kept
    verbatim.  Raises on a package without word/document.xml (not a
    WordprocessingML file)."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        try:
            doc = z.read("word/document.xml")
        except KeyError:
            raise ValueError(
                "OOXML package has no word/document.xml (not a .docx)"
            ) from None
    root = ET.fromstring(doc)
    body = root.find(f"{{{W_NS}}}body")
    if body is None:
        raise ValueError("WordprocessingML document has no body")
    out = []
    for idx, p in enumerate(body.iter(f"{{{W_NS}}}p")):
        parts: list[str] = []
        for node in p.iter():
            tag = node.tag
            if tag == f"{{{W_NS}}}t":
                parts.append(node.text or "")
            elif tag == f"{{{W_NS}}}tab":
                parts.append("\t")
            elif tag == f"{{{W_NS}}}br":
                parts.append("\n")
        out.append((idx, "".join(parts)))
    return out


def read_docx(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed DOCX ingest: ``binaryFile`` scan → Arrow-batched
    parse → one row per paragraph ``(path, paragraph, text,
    n_chars)``.  Zero shuffle; parsing pipelines with the scan."""
    files = spark.read.format("binaryFile").load(path_glob)

    def run(batches: Iterator) -> Iterator:
        import os

        import pandas as pd

        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(path)
                for idx, text in parse_docx_text(bytes(blob)):
                    rows.append((name, idx, text, len(text)))
            yield pd.DataFrame(
                rows, columns=["file", "paragraph", "text", "n_chars"]
            )

    return files.select("path", "content").mapInPandas(
        run,
        schema="file string, paragraph int, text string, n_chars int",
    )
