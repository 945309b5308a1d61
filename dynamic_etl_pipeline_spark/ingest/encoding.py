"""Encoding-tolerant byte decoding, mirroring the reference's
``safe_read_text`` cascade (app.py:34-56): utf-8 -> detected encoding ->
ascii-with-errors-ignored.

chardet is optional here (and not installable in this container);
without it a byte-level heuristic stands in, tuned to agree with
``chardet.detect`` on the cases it actually distinguishes:

- BOM sniffing first (chardet reports UTF-8-SIG / UTF-16 / UTF-32
  with certainty 1.0 on a BOM; decoding strips it);
- utf-8 strict (valid multi-byte utf-8 is unambiguous);
- a NUL-density probe for BOM-less UTF-16 (chardet's
  UTF-16LE/BE heuristic: ASCII text in UTF-16 is half NULs, with
  the NUL on the high or low byte depending on endianness);
- cp1252 before latin-1 (chardet reports windows-1252 for Western
  single-byte text; cp1252 differs from latin-1 exactly on the
  0x80-0x9F band, where real documents have curly quotes/dashes,
  not C1 control characters);
- latin-1 (total: every byte decodes) -> ascii-ignore backstop.

The function is plain Python so it can run inside an Arrow-batched
UDF on executors. Parity cases are pinned in tests/test_ingest.py.
"""

from __future__ import annotations

try:  # optional dependency, present in the reference's stack
    import chardet  # type: ignore
except ImportError:
    chardet = None

_BOMS = [
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
]


def _bom_encoding(raw: bytes) -> str | None:
    for bom, enc in _BOMS:
        if raw.startswith(bom):
            return enc
    return None


def _utf16_guess(raw: bytes) -> str | None:
    """BOM-less UTF-16 probe: mostly-ASCII UTF-16 text is ~half NUL
    bytes, concentrated on even (BE) or odd (LE) offsets."""
    if len(raw) < 4:
        return None
    sample = raw[:4096]
    even = sample[0::2].count(0)
    odd = sample[1::2].count(0)
    half = len(sample) / 2
    if odd > 0.7 * half and even < 0.1 * half:
        return "utf-16-le"
    if even > 0.7 * half and odd < 0.1 * half:
        return "utf-16-be"
    return None


def decode_bytes(raw: bytes) -> str:
    """Best-effort decode. Never raises (reference app.py:55-56 returns
    an empty result rather than failing the upload)."""
    if raw is None:
        return ""
    if isinstance(raw, str):
        return raw
    bom_enc = _bom_encoding(raw)
    if bom_enc is not None:
        # utf-8-sig strips its BOM by codec; the utf-16/32 codecs with
        # explicit endianness don't, so drop it manually
        if bom_enc != "utf-8-sig":
            raw = raw[len(dict(
                (e, b) for b, e in _BOMS)[bom_enc]):]
        try:
            return raw.decode(bom_enc, errors="replace")
        except Exception:
            return raw.decode("ascii", errors="ignore")
    # NUL probe BEFORE utf-8: ASCII text in BOM-less UTF-16 is VALID
    # utf-8 (NUL is a legal utf-8 byte), so utf-8-first would return
    # NUL-riddled text; genuine utf-8 documents never contain NULs
    if b"\x00" in raw:
        u16 = _utf16_guess(raw)
        if u16 is not None:
            try:
                return raw.decode(u16, errors="replace")
            except Exception:
                pass
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        pass
    if chardet is not None:
        enc = chardet.detect(raw).get("encoding") or "utf-8"
        try:
            return raw.decode(enc, errors="replace")
        except Exception:
            return raw.decode("ascii", errors="ignore")
    try:
        return raw.decode("cp1252")
    except UnicodeDecodeError:
        pass  # one of the five undefined cp1252 bytes: fall through
    try:
        return raw.decode("latin-1")
    except Exception:
        return raw.decode("ascii", errors="ignore")
