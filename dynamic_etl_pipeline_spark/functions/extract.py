"""Pattern extraction as vectorized column functions.

Re-expresses the reference's ``extract_patterns`` (app.py:227-246) —
which loops Python regexes over records one at a time (app.py:318) — as
JVM-side ``regexp_extract_all`` column expressions, so extraction runs
inside whole-stage codegen at full scan speed. The one exception is the
phone pattern: the reference ``re.findall`` returns *capture-group
tuples* and joins them (``''.join(p)``, app.py:238), which drops any
text between groups; that exact semantic needs Python, so it ships as
an Arrow-batched pandas UDF (``extract_phones_exact``) alongside the
whole-match JVM version.

The regex literals are copied verbatim from app.py:236-240 (they are
the spec).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

# Verbatim from the reference (app.py:236-240).
EMAIL_RE = r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b"
PHONE_RE = r"(\+?\d{1,3}[-.\s]?)?(\(?\d{3}\)?[-.\s]?)\d{3}[-.\s]?\d{4}"
DATE_RE = r"\d{1,2}[-/]\d{1,2}[-/]\d{2,4}"
NUMBER_RE = r"-?\d+\.?\d*"


def _all(col: Column | str, pattern: str) -> Column:
    c = col if isinstance(col, Column) else F.col(col)
    # (?U) = Java UNICODE_CHARACTER_CLASS, matching Python re's default
    # Unicode-aware \d/\b/\w (Java defaults them to ASCII-only).
    # Null-safe like the reference's non-string guard (app.py:232-234).
    return F.coalesce(
        F.regexp_extract_all(c, F.lit("(?U)" + pattern), 0),
        F.array().cast(ArrayType(StringType())),
    )


def extract_emails(col: Column | str) -> Column:
    return _all(col, EMAIL_RE)


def extract_dates(col: Column | str) -> Column:
    return _all(col, DATE_RE)


def extract_numbers(col: Column | str) -> Column:
    return _all(col, NUMBER_RE)


def extract_phones(col: Column | str) -> Column:
    """Whole-match phone extraction (JVM fast path).

    Differs from the reference only where separator text falls *between*
    capture groups (e.g. the reference emits '+1(555)' joined without the
    intervening space); use ``extract_phones_exact`` for byte parity.
    """
    return _all(col, PHONE_RE)


@pandas_udf(ArrayType(StringType()))
def extract_phones_exact(texts: pd.Series) -> pd.Series:
    """Byte-exact reference parity: findall returns group tuples, joined
    per match (app.py:237-238). Arrow-batched; ~vectorized regex via
    pandas, not row pickling."""
    pat = re.compile(PHONE_RE)
    return texts.map(
        lambda t: [] if not isinstance(t, str) else ["".join(m) for m in pat.findall(t)]
    )


def extract_patterns(col: Column | str) -> Column:
    """The reference's ``_extracted_patterns`` nested object
    (app.py:241-246) as a StructType column of four string arrays."""
    return F.struct(
        extract_emails(col).alias("emails"),
        extract_phones(col).alias("phones"),
        extract_dates(col).alias("dates"),
        extract_numbers(col).alias("numbers"),
    )
