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
    """Make the UDTFs callable from SQL (LATERAL split_sentences(...),
    session_summary(TABLE(...) PARTITION BY ...))."""
    spark.udtf.register("split_sentences", SplitSentences)
    spark.udtf.register("session_summary", SessionSummary)


@udtf(returnType=("user_id: bigint, n_sessions: int, longest_session: int, "
                  "n_events: int"))
class SessionSummary:
    """Partitioned TABLE-argument UDTF (Spark 4): called as

        SELECT * FROM session_summary(
            TABLE(events) PARTITION BY user_id ORDER BY ts)

    Each instance receives ONE user's rows in timestamp order (the
    engine does the shuffle + sort), walks them sequentially with a
    30-minute session gap, and emits a single summary row from
    terminate() — the custom per-key stateful aggregation shape that
    needs imperative Python, without applyInPandas materializing each
    group as a DataFrame. At scale parallelism = partition keys,
    exactly like any keyed aggregation.
    """

    GAP_S = 30 * 60

    def __init__(self):
        self._user = None
        self._last_ts = None
        self._n_sessions = 0
        self._cur_len = 0
        self._longest = 0
        self._n_events = 0

    def eval(self, row):  # noqa: D102
        self._user = row["user_id"]
        ts = row["ts"]
        if self._last_ts is None or \
                (ts - self._last_ts).total_seconds() > self.GAP_S:
            self._n_sessions += 1
            self._cur_len = 0
        self._cur_len += 1
        self._longest = max(self._longest, self._cur_len)
        self._n_events += 1
        self._last_ts = ts

    def terminate(self):  # noqa: D102
        if self._user is not None:
            yield self._user, self._n_sessions, self._longest, self._n_events
