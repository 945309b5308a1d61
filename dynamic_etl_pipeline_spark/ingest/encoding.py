"""Encoding-tolerant byte decoding, mirroring the reference's
``safe_read_text`` cascade (app.py:34-56): utf-8 -> detected encoding ->
ascii-with-errors-ignored.

chardet is optional here; without it a byte-level heuristic stands in
(utf-8 strict, then latin-1 — which, like chardet's fallback behavior
on single-byte text, always decodes). The function is plain Python so
it can run inside an Arrow-batched UDF on executors.
"""

from __future__ import annotations

try:  # optional dependency, present in the reference's stack
    import chardet  # type: ignore
except ImportError:
    chardet = None


def decode_bytes(raw: bytes) -> str:
    """Best-effort decode. Never raises (reference app.py:55-56 returns
    an empty result rather than failing the upload)."""
    if raw is None:
        return ""
    if isinstance(raw, str):
        return raw
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
        return raw.decode("latin-1")
    except Exception:
        return raw.decode("ascii", errors="ignore")
