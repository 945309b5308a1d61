"""Minimal pure-Python PDF text extraction (no third-party libraries).

Parity target: the reference's ``ingest_pdf`` (app.py:184-191) which uses
``PyPDF2.PdfReader`` and extracts text page by page.  pypdf/PyPDF2 cannot be
installed in this container, so this module implements the public PDF file
format (ISO 32000) directly, scoped to text extraction:

* **Object discovery by raw scan** — rather than trusting the xref table we
  scan the file for every ``N G obj … endobj`` span (the classic "repair
  mode" strategy used by real readers on damaged files).  This makes the
  parser agnostic to classic-xref vs. xref-stream (PDF 1.5+) files.
* **Object streams** (``/Type /ObjStm``) are decompressed and their embedded
  objects parsed, so PDFs that pack page dictionaries into compressed object
  streams still work.
* **Filters**: ``FlateDecode`` (stdlib zlib, incl. PNG predictors 10-15),
  ``ASCIIHexDecode``, and unfiltered streams.
* **Content interpreter**: ``BT/ET`` text blocks, ``Tj`` ``'`` ``"`` ``TJ``
  show operators, ``Td/TD/T*/Tm`` line-advance heuristics, literal and hex
  string syntax with all escape forms, UTF-16BE (BOM) strings.

Out of scope (documented limitation, not a stub): CMap/ToUnicode font
decoding — bytes in show operators are interpreted as PDFDocEncoding/latin-1
(exact for the ASCII/WinAnsi text that simple generators emit).  Encrypted
PDFs raise ``ValueError``.
"""
from __future__ import annotations

import re
import zlib
from typing import Any

__all__ = ["extract_pdf_pages", "PdfRef"]


class PdfRef:
    """An indirect object reference ``N G R``."""

    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int) -> None:
        self.num = num
        self.gen = gen

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"PdfRef({self.num},{self.gen})"


class _Stream:
    __slots__ = ("dict", "raw")

    def __init__(self, d: dict, raw: bytes) -> None:
        self.dict = d
        self.raw = raw


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    """Tokenizing parser for PDF object syntax."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    # -- low level ---------------------------------------------------------
    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment to EOL
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def _peek(self) -> int:
        return self.data[self.pos] if self.pos < len(self.data) else -1

    # -- object parsing ----------------------------------------------------
    def parse_object(self) -> Any:
        self._skip_ws()
        c = self._peek()
        if c < 0:
            raise ValueError("unexpected end of PDF data")
        if c == 0x2F:  # /Name
            return self._parse_name()
        if c == 0x28:  # (literal string)
            return self._parse_literal_string()
        if c == 0x3C:  # << dict or <hex string>
            if self.data[self.pos : self.pos + 2] == b"<<":
                return self._parse_dict()
            return self._parse_hex_string()
        if c == 0x5B:  # [ array
            return self._parse_array()
        # number / ref / keyword
        return self._parse_number_or_keyword()

    def _parse_name(self) -> str:
        self.pos += 1
        d, n = self.data, len(self.data)
        out = bytearray()
        while self.pos < n:
            c = d[self.pos]
            if c in _WS or c in _DELIM:
                break
            if c == 0x23 and self.pos + 2 < n:  # #xx hex escape
                try:
                    out.append(int(d[self.pos + 1 : self.pos + 3], 16))
                    self.pos += 3
                    continue
                except ValueError:
                    pass
            out.append(c)
            self.pos += 1
        return "/" + out.decode("latin-1")

    def _parse_literal_string(self) -> bytes:
        self.pos += 1  # past '('
        d, n = self.data, len(self.data)
        out = bytearray()
        depth = 1
        while self.pos < n:
            c = d[self.pos]
            self.pos += 1
            if c == 0x5C:  # backslash
                if self.pos >= n:
                    break
                e = d[self.pos]
                self.pos += 1
                if e == 0x6E:
                    out.append(0x0A)
                elif e == 0x72:
                    out.append(0x0D)
                elif e == 0x74:
                    out.append(0x09)
                elif e == 0x62:
                    out.append(0x08)
                elif e == 0x66:
                    out.append(0x0C)
                elif e in b"()\\":
                    out.append(e)
                elif e in b"\r\n":  # line continuation
                    if e == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                elif 0x30 <= e <= 0x37:  # octal \d{1,3}
                    val = e - 0x30
                    for _ in range(2):
                        if self.pos < n and 0x30 <= d[self.pos] <= 0x37:
                            val = val * 8 + (d[self.pos] - 0x30)
                            self.pos += 1
                        else:
                            break
                    out.append(val & 0xFF)
                else:
                    out.append(e)
            elif c == 0x28:
                depth += 1
                out.append(c)
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    break
                out.append(c)
            else:
                out.append(c)
        return bytes(out)

    def _parse_hex_string(self) -> bytes:
        self.pos += 1  # past '<'
        d, n = self.data, len(self.data)
        hexchars = bytearray()
        while self.pos < n and d[self.pos] != 0x3E:
            c = d[self.pos]
            if c not in _WS:
                hexchars.append(c)
            self.pos += 1
        self.pos += 1  # past '>'
        if len(hexchars) % 2:
            hexchars.append(0x30)
        try:
            return bytes.fromhex(hexchars.decode("ascii"))
        except ValueError:
            return b""

    def _parse_dict(self) -> dict | _Stream:
        self.pos += 2  # past '<<'
        out: dict[str, Any] = {}
        while True:
            self._skip_ws()
            if self.data[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                break
            if self._peek() < 0:
                raise ValueError("unterminated dictionary")
            key = self._parse_name()
            out[key] = self.parse_object()
        # Stream attached?
        save = self.pos
        self._skip_ws()
        if self.data[self.pos : self.pos + 6] == b"stream":
            self.pos += 6
            if self.data[self.pos : self.pos + 2] == b"\r\n":
                self.pos += 2
            elif self.pos < len(self.data) and self.data[self.pos] in b"\r\n":
                self.pos += 1
            length = out.get("/Length")
            if isinstance(length, int):
                raw = self.data[self.pos : self.pos + length]
                end = self.pos + length
                # sanity: endstream should follow (allow ws); else re-scan
                tail = self.data[end : end + 20]
                if b"endstream" not in tail:
                    length = None
                else:
                    self.pos = end + tail.index(b"endstream") + len(b"endstream")
            if not isinstance(length, int):
                end = self.data.find(b"endstream", self.pos)
                if end < 0:
                    raise ValueError("unterminated stream")
                raw = self.data[self.pos : end]
                if raw.endswith(b"\r\n"):
                    raw = raw[:-2]
                elif raw.endswith((b"\n", b"\r")):
                    raw = raw[:-1]
                self.pos = end + len(b"endstream")
            return _Stream(out, raw)
        self.pos = save
        return out

    def _parse_array(self) -> list:
        self.pos += 1
        out: list[Any] = []
        while True:
            self._skip_ws()
            if self._peek() == 0x5D:
                self.pos += 1
                return out
            if self._peek() < 0:
                raise ValueError("unterminated array")
            out.append(self.parse_object())

    _NUM = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
    _REF = re.compile(rb"(\d+)\s+(\d+)\s+R\b")

    def _parse_number_or_keyword(self) -> Any:
        d = self.data
        m = self._REF.match(d, self.pos)
        if m:
            self.pos = m.end()
            return PdfRef(int(m.group(1)), int(m.group(2)))
        m = self._NUM.match(d, self.pos)
        if m:
            self.pos = m.end()
            tok = m.group(0)
            return float(tok) if b"." in tok else int(tok)
        for kw, val in ((b"true", True), (b"false", False), (b"null", None)):
            if d[self.pos : self.pos + len(kw)] == kw:
                self.pos += len(kw)
                return val
        # unknown operator token (content streams) — consume it
        start = self.pos
        n = len(d)
        while self.pos < n and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
            self.pos += 1
        if self.pos == start:
            self.pos += 1  # lone delimiter we don't understand
        return _Keyword(d[start : self.pos].decode("latin-1"))


class _Keyword(str):
    """A bare keyword token (content-stream operator)."""


# ---------------------------------------------------------------------------
# Document parsing
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


def _apply_png_predictor(data: bytes, columns: int, colors: int, bpc: int) -> bytes:
    bpp = max(1, (colors * bpc) // 8)
    row_len = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytearray(row_len)
    pos = 0
    while pos + 1 + row_len <= len(data) + row_len:  # tolerate short last row
        if pos >= len(data):
            break
        ft = data[pos]
        pos += 1
        row = bytearray(data[pos : pos + row_len])
        pos += len(row)
        if ft == 1:  # Sub
            for i in range(bpp, len(row)):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(len(row)):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(len(row)):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(len(row)):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        out.extend(row)
        prev = row
    return bytes(out)


def _decode_stream(doc: "_Document", st: _Stream) -> bytes:
    filters = doc.resolve(st.dict.get("/Filter"))
    if filters is None:
        filters = []
    elif not isinstance(filters, list):
        filters = [filters]
    parms = doc.resolve(st.dict.get("/DecodeParms"))
    if not isinstance(parms, list):
        parms = [parms] * len(filters)
    data = st.raw
    for f, pm in zip(filters, parms):
        f = doc.resolve(f)
        if f == "/FlateDecode" or f == "/Fl":
            data = zlib.decompress(data)
        elif f == "/ASCIIHexDecode" or f == "/AHx":
            hexpart = data.split(b">")[0]
            hexpart = bytes(c for c in hexpart if c not in _WS)
            if len(hexpart) % 2:
                hexpart += b"0"
            data = bytes.fromhex(hexpart.decode("ascii"))
        else:
            raise ValueError(f"unsupported PDF stream filter {f!r}")
        pm = doc.resolve(pm)
        if isinstance(pm, dict):
            pred = doc.resolve(pm.get("/Predictor", 1)) or 1
            if pred >= 10:
                data = _apply_png_predictor(
                    data,
                    int(doc.resolve(pm.get("/Columns", 1)) or 1),
                    int(doc.resolve(pm.get("/Colors", 1)) or 1),
                    int(doc.resolve(pm.get("/BitsPerComponent", 8)) or 8),
                )
    return data


class _Document:
    def __init__(self, data: bytes) -> None:
        if b"/Encrypt" in data[-2048:]:
            # conservative check on trailer region only
            tail = data[data.rfind(b"trailer") :] if b"trailer" in data else b""
            if b"/Encrypt" in tail:
                raise ValueError("encrypted PDFs are not supported")
        self.data = data
        self.objects: dict[int, Any] = {}
        self._scan_objects()
        self._expand_object_streams()

    def _scan_objects(self) -> None:
        for m in _OBJ_RE.finditer(self.data):
            num = int(m.group(1))
            lex = _Lexer(self.data, m.end())
            try:
                obj = lex.parse_object()
            except ValueError:
                continue
            # later definitions (incremental updates) win: keep highest offset
            self.objects[num] = obj

    def _expand_object_streams(self) -> None:
        for obj in list(self.objects.values()):
            if isinstance(obj, _Stream) and self.resolve(obj.dict.get("/Type")) == "/ObjStm":
                try:
                    payload = _decode_stream(self, obj)
                    n = int(self.resolve(obj.dict.get("/N", 0)) or 0)
                    first = int(self.resolve(obj.dict.get("/First", 0)) or 0)
                except (ValueError, zlib.error):
                    continue
                head = _Lexer(payload, 0)
                pairs = []
                for _ in range(n):
                    onum = head.parse_object()
                    ooff = head.parse_object()
                    if isinstance(onum, int) and isinstance(ooff, int):
                        pairs.append((onum, ooff))
                # ObjStm fills gaps only — a direct top-level definition wins
                for onum, ooff in pairs:
                    try:
                        self.objects.setdefault(
                            onum, _Lexer(payload, first + ooff).parse_object()
                        )
                    except ValueError:
                        continue

    def resolve(self, obj: Any, _depth: int = 0) -> Any:
        while isinstance(obj, PdfRef) and _depth < 32:
            obj = self.objects.get(obj.num)
            _depth += 1
        return obj

    # -- page tree ---------------------------------------------------------
    def pages(self) -> list[dict]:
        root_pages = None
        for obj in self.objects.values():
            o = obj.dict if isinstance(obj, _Stream) else obj
            if isinstance(o, dict) and self.resolve(o.get("/Type")) == "/Catalog":
                root_pages = self.resolve(o.get("/Pages"))
                break
        out: list[dict] = []
        seen: set[int] = set()
        if isinstance(root_pages, dict):
            self._walk(root_pages, out, seen)
        if not out:  # no catalog found — fall back to any /Page objects in order
            for num in sorted(self.objects):
                o = self.resolve(self.objects[num])
                if isinstance(o, dict) and self.resolve(o.get("/Type")) == "/Page":
                    out.append(o)
        return out

    def _walk(self, node: dict, out: list, seen: set, _depth: int = 0) -> None:
        if _depth > 64 or id(node) in seen:
            return
        seen.add(id(node))
        t = self.resolve(node.get("/Type"))
        if t == "/Page":
            out.append(node)
            return
        kids = self.resolve(node.get("/Kids")) or []
        for kid in kids:
            kid = self.resolve(kid)
            if isinstance(kid, dict):
                self._walk(kid, out, seen, _depth + 1)


# ---------------------------------------------------------------------------
# Content-stream text interpretation
# ---------------------------------------------------------------------------

def _decode_text_bytes(raw: bytes) -> str:
    if raw[:2] == b"\xfe\xff":
        try:
            return raw[2:].decode("utf-16-be", errors="replace")
        except UnicodeDecodeError:  # pragma: no cover
            pass
    return raw.decode("latin-1")


def _extract_text_from_content(content: bytes) -> str:
    lex = _Lexer(content, 0)
    stack: list[Any] = []
    lines: list[str] = [""]

    def show(raw: bytes) -> None:
        lines[-1] += _decode_text_bytes(raw)

    def newline() -> None:
        # suppress leading/duplicate blank lines: only break after real text
        if lines[-1] != "":
            lines.append("")

    n = len(content)
    while lex.pos < n:
        lex._skip_ws()
        if lex.pos >= n:
            break
        try:
            tok = lex.parse_object()
        except ValueError:
            break
        if isinstance(tok, _Keyword):
            op = str(tok)
            if op == "Tj" and stack and isinstance(stack[-1], bytes):
                show(stack[-1])
            elif op == "'" and stack and isinstance(stack[-1], bytes):
                newline()
                show(stack[-1])
            elif op == '"' and stack and isinstance(stack[-1], bytes):
                newline()
                show(stack[-1])
            elif op == "TJ" and stack and isinstance(stack[-1], list):
                for el in stack[-1]:
                    if isinstance(el, bytes):
                        show(el)
            elif op in ("T*",):
                newline()
            elif op in ("Td", "TD") and len(stack) >= 2:
                ty = stack[-1]
                if isinstance(ty, (int, float)) and ty != 0:
                    newline()
            elif op == "Tm" and len(stack) >= 6:
                newline()
            elif op == "BT":
                pass
            stack.clear()
        else:
            stack.append(tok)
    # trim trailing empty line
    while lines and lines[-1] == "":
        lines.pop()
    return "\n".join(lines)


def extract_pdf_pages(raw: bytes) -> list[str]:
    """Extract text page-by-page from PDF bytes.

    Returns one string per page, mirroring the reference's
    ``[page.extract_text() for page in PdfReader(f).pages]``
    (app.py:184-191).  Raises ``ValueError`` for encrypted or
    non-PDF input.
    """
    if not raw.lstrip()[:5].startswith(b"%PDF-"):
        raise ValueError("not a PDF: missing %PDF- header")
    doc = _Document(raw)
    pages = doc.pages()
    out: list[str] = []
    for page in pages:
        contents = doc.resolve(page.get("/Contents"))
        parts: list[bytes] = []
        if isinstance(contents, list):
            streams = [doc.resolve(c) for c in contents]
        else:
            streams = [contents]
        for st in streams:
            if isinstance(st, _Stream):
                try:
                    parts.append(_decode_stream(doc, st))
                except (ValueError, zlib.error):
                    continue
        out.append(_extract_text_from_content(b"\n".join(parts)))
    return out
