"""Minimal pure-Python DOCX paragraph extraction (no third-party libraries).

Parity target: the reference's ``ingest_docx`` (app.py:194-197) which uses
``python-docx``'s ``Document(f).paragraphs`` and keeps ``p.text``.  A DOCX
file is a ZIP (OPC container) whose main part ``word/document.xml`` holds the
body; a paragraph is a ``w:p`` element and its visible text is the
concatenation of its ``w:t`` descendants (python-docx semantics: tabs/breaks
inside runs become ``\\t``/``\\n`` via ``w:tab``/``w:br``/``w:cr``).

Only stdlib ``zipfile`` + ``xml.etree.ElementTree`` are used.
"""
from __future__ import annotations

import io
import zipfile
import xml.etree.ElementTree as ET

__all__ = ["extract_docx_paragraphs"]

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def _run_text(p: ET.Element) -> str:
    """Visible text of one w:p, matching python-docx Paragraph.text."""
    parts: list[str] = []
    for node in p.iter():
        tag = node.tag
        if tag == _W + "t":
            parts.append(node.text or "")
        elif tag == _W + "tab":
            parts.append("\t")
        elif tag in (_W + "br", _W + "cr"):
            parts.append("\n")
    return "".join(parts)


def extract_docx_paragraphs(raw: bytes) -> list[str]:
    """Extract paragraph texts from DOCX bytes, in document order.

    Mirrors ``[p.text for p in Document(f).paragraphs]`` — paragraphs at the
    body level only (python-docx's ``paragraphs`` property excludes text
    nested in tables), empty paragraphs included (the reference filters
    blanks afterwards, app.py:196; ``read_docx`` does the same via its
    ``keep_empty`` flag).  Raises ``ValueError`` on non-DOCX input.
    """
    try:
        with zipfile.ZipFile(io.BytesIO(raw)) as zf:
            with zf.open("word/document.xml") as fh:
                tree = ET.parse(fh)
    except (zipfile.BadZipFile, KeyError) as exc:
        raise ValueError("not a DOCX: no word/document.xml part") from exc
    except ET.ParseError as exc:
        raise ValueError("malformed word/document.xml") from exc
    body = tree.getroot().find(_W + "body")
    if body is None:
        return []
    return [_run_text(p) for p in body.findall(_W + "p")]
