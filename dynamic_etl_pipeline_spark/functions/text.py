"""Text-analysis column functions for LLM-corpus pipelines: language ID,
quality signals, token counting, document fingerprinting.

All JVM builtins (no UDFs): these run inside codegen at scan speed and
survive any scale-up. The heuristics are intentionally simple and
deterministic — stopword/character n-gram evidence, not a model.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword evidence sets (top function words).
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "es": ("el", "la", "de", "que", "los", "las", "una", "por"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans", "que"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "zh": (),  # handled by the CJK character test below
}


def _tokens(col: Column) -> Column:
    return F.split(F.lower(col), r"\s+")


def detect_lang(col: Column | str) -> Column:
    """Heuristic language ID: CJK character presence, else the language
    whose stopword set scores the most token hits, else 'und'.

    One pass, pure column expressions: per-language hit counts via
    higher-order ``filter``/``size``, argmax via ``greatest`` + chained
    ``when`` — no shuffle, no UDF.
    """
    c = col if isinstance(col, Column) else F.col(col)
    toks = _tokens(c)

    def hit_count(markers: tuple[str, ...]) -> Column:
        # single-arg lambda: a default parameter would make pyspark treat
        # it as the two-arg (element, index) form
        return F.size(F.filter(toks, lambda w: w.isin(*markers)))

    scores = {
        lang: hit_count(markers)
        for lang, markers in _LANG_MARKERS.items()
        if markers
    }
    best = F.greatest(*scores.values())
    pick = F.lit("und")
    # Deterministic tie-break: first language (insertion order) wins.
    for lang in reversed(list(scores)):
        pick = F.when(scores[lang] == best, F.lit(lang)).otherwise(pick)
    has_cjk = c.rlike(r"[一-鿿]")
    return (
        F.when(has_cjk, F.lit("zh"))
        .when(best > 0, pick)
        .otherwise(F.lit("und"))
    )


def token_count(col: Column | str, mode: str = "whitespace") -> Column:
    """Token counting: 'whitespace' splits on runs of whitespace;
    'bpe_ish' approximates subword tokenizers by splitting on word/
    number/punctuation boundaries (a regex stand-in for BPE pre-
    tokenization — the real tokenizer is a model asset, not an engine
    function)."""
    c = col if isinstance(col, Column) else F.col(col)
    if mode == "whitespace":
        return F.size(F.split(c, r"\s+"))
    if mode == "bpe_ish":
        return F.size(
            F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
        )
    raise ValueError(f"unknown token_count mode: {mode}")


def quality_signals(col: Column | str) -> Column:
    """Struct of cheap quality signals (length, token stats, punctuation
    and digit ratios, uppercase ratio) for corpus filtering."""
    c = col if isinstance(col, Column) else F.col(col)
    n_chars = F.length(c)
    toks = F.split(c, r"\s+")
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[.,!?;:'\"()\[\]{}-]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(c, r"[0-9]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    nz = F.greatest(n_chars, F.lit(1)).cast("double")
    return F.struct(
        n_chars.cast("int").alias("n_chars"),
        n_tokens.cast("int").alias("n_tokens"),
        (n_chars.cast("double") / F.greatest(n_tokens, F.lit(1))).alias("avg_token_span"),
        (n_punct.cast("double") / nz).alias("punct_ratio"),
        (n_digit.cast("double") / nz).alias("digit_ratio"),
        (n_upper.cast("double") / nz).alias("upper_ratio"),
    )


def rolling_fingerprint(col: Column | str, prefix_len: int = 16) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized text (stable under reflow), truncated.
    Engine-portable (md5 hashes UTF-8 bytes identically everywhere)."""
    c = col if isinstance(col, Column) else F.col(col)
    normalized = F.regexp_replace(F.trim(c), r"\s+", " ")
    return F.substring(F.md5(normalized.cast("binary")), 1, prefix_len)
