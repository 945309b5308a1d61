"""Deterministic synthetic document generation (PDF / DOCX) — stdlib only.

Counterpart to the vendored extractors (``pdftext.py`` / ``docxtext.py``):
builds small but structurally real documents — classic-xref and
object-stream PDFs with FlateDecode content, OPC-zip DOCX — for ingestion
tests, driver-checkable queries, and ingest benchmarks.  Byte-deterministic:
the same call always yields identical bytes (fixture files are committed
and pinned against these builders in tests/test_pdftext.py).
"""
from __future__ import annotations

import zipfile
import zlib

__all__ = [
    "build_classic_pdf",
    "build_objstm_pdf",
    "build_docx",
    "EXPECTED_PAGES",
    "EXPECTED_DOCX_PARAGRAPHS",
]


# ---------------------------------------------------------------------------
# PDF builders
# ---------------------------------------------------------------------------

PAGE_CONTENTS = [
    # page 1: Tj + escapes + second line via Td
    (
        b"BT /F1 12 Tf 72 720 Td (Invoice \\(No. 42\\) for ACME Corp) Tj "
        b"0 -14 Td (Total due: $1,234.56) Tj ET"
    ),
    # page 2: TJ array with kerning + T* line advance + hex string
    (
        b"BT /F1 12 Tf 72 720 Td 14 TL [(Second ) -20 (page ) -20 (text)] TJ "
        b"T* <48657820656E636F646564206C696E65> Tj ET"
    ),
    # page 3: ' operator (move to next line and show)
    b"BT /F1 12 Tf 72 720 Td 14 TL (Third page first line) Tj (quoted line) ' ET",
]

# expected extraction (kept in sync with tests/test_ingest.py)
EXPECTED_PAGES = [
    "Invoice (No. 42) for ACME Corp\nTotal due: $1,234.56",
    "Second page text\nHex encoded line",
    "Third page first line\nquoted line",
]


def _flate(data: bytes) -> bytes:
    return zlib.compress(data, 9)


def build_classic_pdf() -> bytes:
    objs: dict[int, bytes] = {}
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    kids = " ".join(f"{3 + i} 0 R" for i in range(len(PAGE_CONTENTS)))
    objs[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {len(PAGE_CONTENTS)} >>"
    ).encode()
    next_num = 3 + len(PAGE_CONTENTS)
    font_num = next_num + len(PAGE_CONTENTS)
    for i, content in enumerate(PAGE_CONTENTS):
        objs[3 + i] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
            f"/Contents {next_num + i} 0 R >>"
        ).encode()
    for i, content in enumerate(PAGE_CONTENTS):
        z = _flate(content)
        objs[next_num + i] = (
            f"<< /Length {len(z)} /Filter /FlateDecode >>\nstream\n".encode()
            + z
            + b"\nendstream"
        )
    objs[font_num] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_off = len(out)
    n = max(objs) + 1
    out += f"xref\n0 {n}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, n):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n} /Root 1 0 R >>\nstartxref\n{xref_off}\n%%EOF\n"
    ).encode()
    return bytes(out)


def build_objstm_pdf() -> bytes:
    """PDF 1.5: dictionaries live inside a compressed object stream; the
    xref is itself a stream with PNG Up-predictor (12) encoded entries."""
    # object numbers: 1 catalog, 2 pages, 3 page, 4 contents(stream), 5 objstm, 6 xrefstm
    content = PAGE_CONTENTS[0]
    z = _flate(content)

    # --- build the ObjStm payload: objects 1,2,3 -------------------------
    embedded = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R >>"
        ),
    }
    body = bytearray()
    header_pairs = []
    for num, data in embedded.items():
        header_pairs.append(f"{num} {len(body)}")
        body += data + b" "
    header = (" ".join(header_pairs) + " ").encode()
    payload = header + bytes(body)
    zpayload = _flate(payload)

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}

    def emit(num: int, raw: bytes) -> None:
        offsets[num] = len(out)
        out.extend(f"{num} 0 obj\n".encode() + raw + b"\nendobj\n")

    emit(4, f"<< /Length {len(z)} /Filter /FlateDecode >>\nstream\n".encode() + z + b"\nendstream")
    emit(
        5,
        (
            f"<< /Type /ObjStm /N {len(embedded)} /First {len(header)} "
            f"/Length {len(zpayload)} /Filter /FlateDecode >>\nstream\n"
        ).encode()
        + zpayload
        + b"\nendstream",
    )

    # --- xref stream (object 6) -----------------------------------------
    xref_off_placeholder = len(out)
    # entries for objects 0..6; W = [1 4 2]
    rows = []
    rows.append(bytes([0]) + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big"))
    for num in (1, 2, 3):  # type 2: in ObjStm 5, index = position
        idx = [1, 2, 3].index(num)
        rows.append(bytes([2]) + (5).to_bytes(4, "big") + idx.to_bytes(2, "big"))
    rows.append(bytes([1]) + offsets[4].to_bytes(4, "big") + (0).to_bytes(2, "big"))
    rows.append(bytes([1]) + offsets[5].to_bytes(4, "big") + (0).to_bytes(2, "big"))
    rows.append(bytes([1]) + xref_off_placeholder.to_bytes(4, "big") + (0).to_bytes(2, "big"))
    row_len = 7
    # PNG Up predictor: each row prefixed with filter type 2, delta vs prev
    pred = bytearray()
    prev = bytes(row_len)
    for r in rows:
        pred.append(2)
        pred.extend((r[i] - prev[i]) & 0xFF for i in range(row_len))
        prev = r
    zx = _flate(bytes(pred))
    xref_dict = (
        f"<< /Type /XRef /Size 7 /W [1 4 2] /Root 1 0 R "
        f"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns {row_len} >> "
        f"/Length {len(zx)} >>"
    ).encode()
    xref_off = len(out)
    assert xref_off == xref_off_placeholder
    out += b"6 0 obj\n" + xref_dict + b"\nstream\n" + zx + b"\nendstream\nendobj\n"
    out += f"startxref\n{xref_off}\n%%EOF\n".encode()
    return bytes(out)


# ---------------------------------------------------------------------------
# DOCX builder
# ---------------------------------------------------------------------------

_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
</Types>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
</Relationships>"""

_DOC = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
<w:body>
<w:p><w:r><w:t>First paragraph of the contract.</w:t></w:r></w:p>
<w:p><w:r><w:t>Amount:</w:t><w:tab/><w:t>1000 EUR</w:t><w:br/><w:t>net of taxes</w:t></w:r></w:p>
<w:p/>
<w:tbl><w:tr><w:tc><w:p><w:r><w:t>cell text must not leak</w:t></w:r></w:p></w:tc></w:tr></w:tbl>
<w:p><w:r><w:t xml:space="preserve">Signed in </w:t></w:r><w:r><w:t>duplicate.</w:t></w:r></w:p>
<w:sectPr/>
</w:body>
</w:document>"""

EXPECTED_DOCX_PARAGRAPHS = [
    "First paragraph of the contract.",
    "Amount:\t1000 EUR\nnet of taxes",
    "",
    "Signed in duplicate.",
]


def build_docx() -> bytes:
    import io

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in [
            ("[Content_Types].xml", _CT),
            ("_rels/.rels", _RELS),
            ("word/document.xml", _DOC),
        ]:
            info = zipfile.ZipInfo(name, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    return buf.getvalue()
