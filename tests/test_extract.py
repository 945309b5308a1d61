"""Pattern-extraction parity: the engine's column functions vs the
reference's literal regexes run in plain Python (the ground truth,
app.py:236-240), including Hypothesis property tests (FIXTURES.md §C).
"""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dynamic_etl_pipeline_spark.functions.extract import (
    DATE_RE,
    EMAIL_RE,
    NUMBER_RE,
    PHONE_RE,
    extract_dates,
    extract_emails,
    extract_numbers,
    extract_patterns,
    extract_phones_exact,
)


def reference_extract(text):
    """Verbatim re-implementation of app.py:227-246 as ground truth."""
    if isinstance(text, bytes):
        text = text.decode("utf-8", errors="ignore")
    if not isinstance(text, str):
        return {"emails": [], "phones": [], "dates": [], "numbers": []}
    return {
        "emails": re.findall(EMAIL_RE, text),
        "phones": ["".join(p) for p in re.findall(PHONE_RE, text)],
        "dates": re.findall(DATE_RE, text),
        "numbers": re.findall(NUMBER_RE, text),
    }


SAMPLES = [
    "mail a@b.co and c.d+e@f-g.org now",
    "call (555) 123-4567 or +1 212 555 0199",
    "on 12/25/2023 and 1-2-24",
    "numbers -42 and 1500.75 and 7",
    "",
    "no patterns here",
    "edge@case.c (too short tld) and x@y.io",
]


def run_engine(spark, texts, col_fn):
    df = spark.createDataFrame([(t,) for t in texts], ["t"])
    return [r["out"] for r in df.select(col_fn("t").alias("out")).collect()]


@pytest.mark.parametrize("kind,col_fn", [
    ("emails", extract_emails),
    ("dates", extract_dates),
    ("numbers", extract_numbers),
])
def test_regex_parity_fixed(spark, kind, col_fn):
    got = run_engine(spark, SAMPLES, col_fn)
    want = [reference_extract(t)[kind] for t in SAMPLES]
    assert got == want


def test_phones_exact_parity(spark):
    got = run_engine(spark, SAMPLES, extract_phones_exact)
    want = [reference_extract(t)["phones"] for t in SAMPLES]
    assert got == want


def test_extract_patterns_struct(spark):
    df = spark.createDataFrame([("a@b.co on 1/2/23",)], ["t"])
    row = df.select(extract_patterns("t").alias("p")).first()["p"]
    assert row["emails"] == ["a@b.co"]
    assert row["dates"] == ["1/2/23"]
    assert set(row.asDict()) == {"emails", "phones", "dates", "numbers"}


@settings(max_examples=30, deadline=None)
@given(st.lists(
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
        max_size=80,
    ),
    min_size=1, max_size=8,
))
def test_regex_parity_property(spark, texts):
    """Engine extraction == reference regexes on arbitrary unicode."""
    for kind, col_fn in [
        ("emails", extract_emails),
        ("dates", extract_dates),
        ("numbers", extract_numbers),
    ]:
        got = run_engine(spark, texts, col_fn)
        want = [reference_extract(t)[kind] for t in texts]
        assert got == want, kind
