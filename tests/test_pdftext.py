"""Unit tests for the vendored pure-Python PDF/DOCX text extractors.

These back the end-to-end reader parity with the reference's
``ingest_pdf``/``ingest_docx`` (app.py:184-197) without pypdf/python-docx.
"""
from __future__ import annotations

import zlib

import pytest

from dynamic_etl_pipeline_spark.ingest.docxtext import extract_docx_paragraphs
from dynamic_etl_pipeline_spark.ingest.pdftext import (
    _apply_png_predictor,
    _extract_text_from_content,
    _Lexer,
    extract_pdf_pages,
)
from dynamic_etl_pipeline_spark.ingest.docgen import (
    EXPECTED_DOCX_PARAGRAPHS,
    EXPECTED_PAGES,
    build_classic_pdf,
    build_docx,
    build_objstm_pdf,
)


# ---------------------------------------------------------------------------
# Lexer
# ---------------------------------------------------------------------------

def _parse(src: bytes):
    return _Lexer(src).parse_object()


def test_lexer_scalars_and_refs():
    assert _parse(b"42") == 42
    assert _parse(b"-3.5") == -3.5
    assert _parse(b".5") == 0.5
    assert _parse(b"true") is True
    assert _parse(b"null") is None
    ref = _parse(b"12 0 R")
    assert (ref.num, ref.gen) == (12, 0)


def test_lexer_names_with_hex_escape():
    assert _parse(b"/Name#20With#23Hash") == "/Name With#Hash"


def test_lexer_literal_string_escapes():
    assert _parse(rb"(a\(b\)c)") == b"a(b)c"
    assert _parse(rb"(tab\there)") == b"tab\there"
    assert _parse(rb"(oct\101al)") == b"octAal"
    assert _parse(b"(line\\\ncontinued)") == b"linecontinued"
    assert _parse(b"(nested (parens) ok)") == b"nested (parens) ok"


def test_lexer_hex_string_odd_digits_padded():
    assert _parse(b"<48 65 6C6C 6F>") == b"Hello"
    assert _parse(b"<414>") == b"A@"  # odd count -> pad with 0


def test_lexer_dict_array_nesting():
    d = _parse(b"<< /A [1 2 3] /B << /C (x) >> /D 4 0 R >>")
    assert d["/A"] == [1, 2, 3]
    assert d["/B"]["/C"] == b"x"
    assert d["/D"].num == 4


def test_lexer_comment_skipped():
    assert _parse(b"% a comment\n 7") == 7


# ---------------------------------------------------------------------------
# PNG predictor (xref streams use Up=2 mainly; test all filters)
# ---------------------------------------------------------------------------

def test_png_predictor_up_roundtrip():
    rows = [bytes([1, 2, 3, 4]), bytes([5, 6, 7, 8])]
    enc = bytearray()
    prev = bytes(4)
    for r in rows:
        enc.append(2)
        enc.extend((r[i] - prev[i]) & 0xFF for i in range(4))
        prev = r
    assert _apply_png_predictor(bytes(enc), columns=4, colors=1, bpc=8) == b"".join(rows)


def test_png_predictor_sub_and_none():
    # none (0): passthrough
    assert _apply_png_predictor(b"\x00abcd", 4, 1, 8) == b"abcd"
    # sub (1): each byte += left neighbour
    out = _apply_png_predictor(bytes([1, 10, 1, 1, 1]), 4, 1, 8)
    assert out == bytes([10, 11, 12, 13])


# ---------------------------------------------------------------------------
# Content-stream text interpreter
# ---------------------------------------------------------------------------

def test_content_tj_and_td_newlines():
    out = _extract_text_from_content(b"BT (a) Tj 0 -12 Td (b) Tj 5 0 Td (c) Tj ET")
    assert out == "a\nbc"  # ty!=0 breaks, tx-only move does not


def test_content_tj_array_concat():
    out = _extract_text_from_content(b"BT [(He) -10 (llo) 250 ( world)] TJ ET")
    assert out == "Hello world"


def test_content_quote_operators():
    out = _extract_text_from_content(b"BT (x) Tj (y) ' 1 2 (z) \" ET")
    assert out == "x\ny\nz"


def test_content_utf16_bom_string():
    s = "café — ok".encode("utf-16-be")
    content = b"BT <FEFF" + s.hex().encode() + b"> Tj ET"
    assert _extract_text_from_content(content) == "café — ok"


def test_content_ignores_graphics_operators():
    out = _extract_text_from_content(
        b"q 1 0 0 1 50 50 cm 0 0 100 100 re f Q BT (text) Tj ET 10 w S"
    )
    assert out == "text"


# ---------------------------------------------------------------------------
# Whole-document extraction
# ---------------------------------------------------------------------------

def test_classic_pdf_pages_exact():
    assert extract_pdf_pages(build_classic_pdf()) == EXPECTED_PAGES


def test_objstm_pdf_pages_exact():
    # modern layout: catalog/pages/page dicts inside a compressed /ObjStm
    assert extract_pdf_pages(build_objstm_pdf()) == EXPECTED_PAGES[:1]


def test_fixture_files_match_builders(tmp_path):
    # the committed fixtures must stay in sync with the builders
    import pathlib

    fix = pathlib.Path(__file__).parent / "fixtures"
    assert (fix / "sample_classic.pdf").read_bytes() == build_classic_pdf()
    assert (fix / "sample_objstm.pdf").read_bytes() == build_objstm_pdf()
    assert (fix / "sample.docx").read_bytes() == build_docx()


def test_non_pdf_raises():
    with pytest.raises(ValueError, match="not a PDF"):
        extract_pdf_pages(b"hello world")


def test_incremental_update_last_definition_wins():
    base = build_classic_pdf()
    # append an incremental update redefining page 1's content stream
    z = zlib.compress(b"BT (REVISED) Tj ET")
    patched = (
        base
        + f"6 0 obj\n<< /Length {len(z)} /Filter /FlateDecode >>\nstream\n".encode()
        + z
        + b"\nendstream\nendobj\n"
    )
    pages = extract_pdf_pages(patched)
    assert pages[0] == "REVISED"
    assert pages[1:] == EXPECTED_PAGES[1:]


def test_uncompressed_content_stream():
    body = b"BT (plain) Tj ET"
    pdf = (
        b"%PDF-1.1\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        + f"4 0 obj\n<< /Length {len(body)} >>\nstream\n".encode()
        + body
        + b"\nendstream\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    assert extract_pdf_pages(pdf) == ["plain"]


def test_contents_array_concatenated():
    b1, b2 = b"BT (part one ) Tj", b"(part two) Tj ET"
    pdf = (
        b"%PDF-1.1\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>\nendobj\n"
        + f"4 0 obj\n<< /Length {len(b1)} >>\nstream\n".encode()
        + b1
        + b"\nendstream\nendobj\n"
        + f"5 0 obj\n<< /Length {len(b2)} >>\nstream\n".encode()
        + b2
        + b"\nendstream\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    assert extract_pdf_pages(pdf) == ["part one part two"]


def test_encrypted_pdf_refused():
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog >>\nendobj\n"
        b"trailer\n<< /Root 1 0 R /Encrypt 9 0 R >>\n%%EOF\n"
    )
    with pytest.raises(ValueError, match="encrypted"):
        extract_pdf_pages(pdf)


# ---------------------------------------------------------------------------
# DOCX
# ---------------------------------------------------------------------------

def test_docx_paragraphs_exact():
    assert extract_docx_paragraphs(build_docx()) == EXPECTED_DOCX_PARAGRAPHS


def test_docx_tab_and_break_rendering():
    paras = extract_docx_paragraphs(build_docx())
    assert paras[1] == "Amount:\t1000 EUR\nnet of taxes"


def test_docx_table_text_excluded():
    assert not any("cell text" in p for p in extract_docx_paragraphs(build_docx()))


def test_docx_not_a_zip():
    with pytest.raises(ValueError, match="not a DOCX"):
        extract_docx_paragraphs(b"PKnot really")


def test_docx_zip_without_document_part(tmp_path):
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("other.xml", "<a/>")
    with pytest.raises(ValueError, match="not a DOCX"):
        extract_docx_paragraphs(buf.getvalue())


# ---------------------------------------------------------------------------
# Property-based round trip: random text -> built PDF -> extracted text
# ---------------------------------------------------------------------------

try:
    from hypothesis import example, given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False

if _HAVE_HYPOTHESIS:
    import zlib as _zlib

    def _encode_text(s: str) -> bytes:
        """Conforming-writer string bytes: latin-1, EXCEPT when that
        byte sequence would begin with FE FF — per PDF 32000 §7.9.2.2
        a string starting with those bytes IS UTF-16BE, so a correct
        writer (like pypdf) must emit real UTF-16BE there. Found by
        hypothesis: the page text 'þÿ' encodes to exactly the BOM."""
        b = s.encode("latin-1")
        if b[:2] == b"\xfe\xff":
            return b"\xfe\xff" + s.encode("utf-16-be")
        return b

    def _escape_literal(raw: bytes) -> bytes:
        return (raw.replace(b"\\", rb"\\")
                   .replace(b"(", rb"\(")
                   .replace(b")", rb"\)"))

    def _page_pdf(lines_per_page: list[list[str]],
                  compress: bool, use_hex: bool) -> bytes:
        """Minimal classic-xref PDF with one content stream per page,
        each line shown via Tj after a T* advance (first via Td)."""
        objs: list[bytes] = []
        n_pages = len(lines_per_page)
        kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
        objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
        objs.append(
            f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
        for i in range(n_pages):
            objs.append(
                f"<< /Type /Page /Parent 2 0 R "
                f"/Contents {3 + n_pages + i} 0 R >>".encode())
        for lines in lines_per_page:
            parts = [b"BT 12 TL 72 720 Td"]
            for k, line in enumerate(lines):
                raw = _encode_text(line)
                if use_hex:
                    shown = b"<" + raw.hex().encode() + b">"
                else:
                    shown = b"(" + _escape_literal(raw) + b")"
                if k:
                    parts.append(b"T*")
                parts.append(shown + b" Tj")
            parts.append(b"ET")
            body = b" ".join(parts)
            if compress:
                z = _zlib.compress(body)
                objs.append(
                    f"<< /Length {len(z)} /Filter /FlateDecode >>"
                    f"\nstream\n".encode() + z + b"\nendstream")
            else:
                objs.append(
                    f"<< /Length {len(body)} >>\nstream\n".encode()
                    + body + b"\nendstream")
        out = bytearray(b"%PDF-1.4\n")
        offsets = []
        for num, objdata in enumerate(objs, start=1):
            offsets.append(len(out))
            out += f"{num} 0 obj\n".encode() + objdata + b"\nendobj\n"
        xref = len(out)
        out += f"xref\n0 {len(objs) + 1}\n".encode()
        out += b"0000000000 65535 f \n"
        for off in offsets:
            out += f"{off:010d} 00000 n \n".encode()
        out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
                f"startxref\n{xref}\n%%EOF\n").encode()
        return bytes(out)

    # printable latin-1 text incl. the PDF delimiters that need escapes,
    # with no leading/trailing whitespace-only lines (the extractor
    # collapses blank lines by design)
    _LINE = st.text(
        st.characters(min_codepoint=32, max_codepoint=255,
                      blacklist_characters="\x7f\xad"),
        min_size=1, max_size=40,
    ).filter(lambda s: s.strip() == s and s)

    @settings(max_examples=60, deadline=None)
    @given(
        pages=st.lists(st.lists(_LINE, min_size=1, max_size=5),
                       min_size=1, max_size=3),
        compress=st.booleans(),
        use_hex=st.booleans(),
    )
    # pinned: latin-1 bytes of 'þÿ' are exactly the UTF-16BE BOM —
    # exercises the conforming-writer branch of _encode_text both ways
    @example(pages=[["þÿ"]], compress=False, use_hex=False)
    @example(pages=[["þÿ abc"]], compress=True, use_hex=True)
    def test_roundtrip_random_text(pages, compress, use_hex):
        pdf = _page_pdf(pages, compress, use_hex)
        assert extract_pdf_pages(pdf) == ["\n".join(p) for p in pages]


# ---------------------------------------------------------------------------
# Round-7 adversarial structure + mutation fuzz (the extractor is
# load-bearing for an exact driver query, so hostile input must never
# hang, crash the interpreter, or extract nondeterministically).
# ---------------------------------------------------------------------------


def test_truncated_xref_still_extracts():
    """The parser recovers objects by direct scan (xref is advisory);
    cutting the file mid-xref-table must not lose any page text."""
    pdf = build_classic_pdf()
    xref_at = pdf.rfind(b"xref")
    assert xref_at > 0
    for cut in (xref_at + 6, xref_at + 25, len(pdf) - 9):
        assert extract_pdf_pages(pdf[:cut]) == EXPECTED_PAGES


def test_mixed_classic_and_objstm_objects():
    """Page tree split across worlds: page 1 + catalog classic, page 2's
    dict inside a compressed ObjStm, both content streams classic."""
    c1, c2 = b"BT 72 720 Td (classic page) Tj ET", \
             b"BT 72 720 Td (objstm page) Tj ET"
    z1, z2 = zlib.compress(c1), zlib.compress(c2)
    embedded = {7: b"<< /Type /Page /Parent 2 0 R /Contents 8 0 R >>"}
    body = bytearray()
    pairs = []
    for num, data in embedded.items():
        pairs.append(f"{num} {len(body)}")
        body += data + b" "
    header = (" ".join(pairs) + " ").encode()
    payload = header + bytes(body)
    zp = zlib.compress(payload)
    out = bytearray(b"%PDF-1.5\n")
    for num, raw in [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R 7 0 R] /Count 2 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
        (4, f"<< /Length {len(z1)} /Filter /FlateDecode >>\nstream\n"
            .encode() + z1 + b"\nendstream"),
        (5, f"<< /Type /ObjStm /N 1 /First {len(header)} "
            f"/Length {len(zp)} /Filter /FlateDecode >>\nstream\n"
            .encode() + zp + b"\nendstream"),
        (8, f"<< /Length {len(z2)} /Filter /FlateDecode >>\nstream\n"
            .encode() + z2 + b"\nendstream"),
    ]:
        out += f"{num} 0 obj\n".encode() + raw + b"\nendobj\n"
    out += (b"trailer\n<< /Size 9 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n")
    assert extract_pdf_pages(bytes(out)) == ["classic page", "objstm page"]


def _png_forward_filter(raw: bytes, row_len: int, bpp: int,
                        filters: list[int]) -> bytes:
    """Forward-encode raw rows with the given per-row PNG filters —
    the inverse of _apply_png_predictor, used to build fixtures."""
    out = bytearray()
    prev = bytes(row_len)
    for r, ft in enumerate(filters):
        row = raw[r * row_len:(r + 1) * row_len]
        out.append(ft)
        for i in range(len(row)):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i] if i < len(prev) else 0
            c = prev[i - bpp] if i >= bpp and i - bpp < len(prev) else 0
            if ft == 0:
                enc = row[i]
            elif ft == 1:
                enc = (row[i] - a) & 0xFF
            elif ft == 2:
                enc = (row[i] - b) & 0xFF
            elif ft == 3:
                enc = (row[i] - ((a + b) >> 1)) & 0xFF
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
                enc = (row[i] - pred) & 0xFF
            out.append(enc)
        prev = row
    return bytes(out)


def test_png_predictor_average_paeth_multibyte_pixels():
    """Filters 3 (Average) and 4 (Paeth) with bpp=3 (colors=3, bpc=8):
    forward-encode random-ish rows, assert exact reconstruction."""
    columns, colors, bpc = 5, 3, 8
    row_len = columns * colors
    raw = bytes((r * 37 + i * 11) & 0xFF
                for r in range(4) for i in range(row_len))
    for filters in ([3, 3, 3, 3], [4, 4, 4, 4], [0, 1, 2, 3], [4, 3, 2, 1]):
        enc = _png_forward_filter(raw, row_len, colors * bpc // 8, filters)
        assert _apply_png_predictor(enc, columns, colors, bpc) == raw


def test_png_predictor_short_last_row_tolerated():
    """A truncated final row (real xref streams end mid-row sometimes)
    must decode the complete rows and not raise."""
    columns, colors, bpc = 4, 1, 8
    raw = bytes(range(8))  # two full rows of 4
    enc = _png_forward_filter(raw, 4, 1, [2, 2])
    got = _apply_png_predictor(enc + b"\x02\x01", columns, colors, bpc)
    assert got[:8] == raw  # both full rows intact; partial row best-effort


def _mutate(data: bytes, rng) -> bytes:
    op = rng.randrange(4)
    if op == 0 and data:  # flip one byte
        i = rng.randrange(len(data))
        return data[:i] + bytes([data[i] ^ (1 << rng.randrange(8))]) + data[i + 1:]
    if op == 1 and len(data) > 8:  # delete a slice
        i = rng.randrange(len(data) - 4)
        j = i + rng.randrange(1, min(64, len(data) - i))
        return data[:i] + data[j:]
    if op == 2:  # insert junk
        i = rng.randrange(len(data) + 1)
        junk = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 16)))
        return data[:i] + junk + data[i:]
    return data[:rng.randrange(1, len(data))]  # truncate


@pytest.mark.parametrize("builder", [build_classic_pdf, build_objstm_pdf])
def test_mutation_fuzz_no_crash_and_deterministic(builder):
    """150 seeded byte-level mutations per fixture: the extractor must
    terminate with either text or an ordinary Exception — never a hang,
    BaseException, or run-to-run nondeterminism (same bytes in, same
    outcome out, twice)."""
    import random

    base = builder()
    baseline = extract_pdf_pages(base)
    rng = random.Random(0xC0FFEE)
    outcomes = {"text": 0, "exc": 0, "changed": 0}
    for _ in range(150):
        mutated = base
        for _ in range(rng.randrange(1, 4)):
            mutated = _mutate(mutated, rng)

        def run(buf=mutated):
            try:
                return ("text", extract_pdf_pages(buf))
            except Exception as exc:  # noqa: BLE001 — the contract
                return ("exc", type(exc).__name__, str(exc))

        first, second = run(), run()
        assert first == second, "nondeterministic outcome on same bytes"
        outcomes[first[0]] += 1
        if first[0] == "exc" or first[1] != baseline:
            outcomes["changed"] += 1
    # The scan-based parser is deliberately tolerant (a flipped byte in
    # an object it can skip is not an error), so exceptions are NOT
    # required — but the mutations must demonstrably reach the parse
    # (majority of outcomes differ from the pristine baseline), or the
    # fuzz exercises nothing. Measured: classic 111/150 changed, 0 exc;
    # objstm 121/150 changed, 6 exc (corrupted zlib/xref-stream paths).
    assert outcomes["changed"] > 50, outcomes
