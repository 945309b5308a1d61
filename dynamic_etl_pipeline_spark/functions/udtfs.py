"""Python UDTFs (SURVEY §2.11): the record-splitting pattern behind the
reference's one-file-to-many-records sources (PDF page split
app.py:186-192, DOCX paragraph split app.py:195-198, TXT line split
app.py:213-222), exposed as a lateral table function.

Built-in explode() covers these when the split is a pure column
expression; a UDTF is the tool when splitting needs imperative Python
(real parsers, stateful tokenizers). Rows stream out per input row —
no driver materialization — so the operator stays partition-parallel.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


@udtf(returnType="sent_no: int, sentence: string, n_words: int")
class SplitSentences:
    """One output row per non-empty '.'-delimited sentence of the
    input text, with its position and word count."""

    def eval(self, text: str):  # noqa: D102
        if not text:
            return
        for i, raw in enumerate(text.split(".")):
            s = raw.strip()
            if s:
                yield i, s, len(re.split(r"\s+", s))


def register_udtfs(spark) -> None:
    """Make the UDTFs callable from SQL (LATERAL split_sentences(...))."""
    spark.udtf.register("split_sentences", SplitSentences)
