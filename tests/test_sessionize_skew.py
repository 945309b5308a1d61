"""Skew-resilient sessionization (operators/sessionize.py) must be
bit-identical to the serial lag/flag/cumsum window for any monotone
bucket — fixture equality, crafted bucket-boundary corpora, and a
randomized decomposition property."""
from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from dynamic_etl_pipeline_spark.operators.sessionize import sessionize_events
from dynamic_etl_pipeline_spark.queries.events import (
    events_sessionize,
    events_sessionize_skew_safe,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _serial_seq(df, gap: str):
    """The classic formulation the operator must reproduce."""
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id").orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = df.withColumn(
        "new_session",
        F.when(
            F.col("ts") > F.lag("ts").over(w_order) + F.expr(f"INTERVAL {gap}"),
            1,
        ).otherwise(0),
    )
    return flagged.withColumn(
        "session_seq", F.sum("new_session").over(w_run)
    ).select("user_id", "event_id", "ts", "session_seq")


def _rows_to_map(rows):
    return {(r["user_id"], r["event_id"]): r["session_seq"] for r in rows}


def test_fixture_sessions_match_serial_query(spark, sf_dir):
    got = {
        tuple(r) for r in events_sessionize_skew_safe(spark, sf_dir).collect()
    }
    want = {tuple(r) for r in events_sessionize(spark, sf_dir).collect()}
    assert got == want and got


def test_bucket_boundary_cases(spark):
    """Sessions crossing midnight, a gap exactly at the bucket edge,
    idle buckets between events, and single-event users."""
    rows = [
        # user 1: 23:50 -> 00:05 next day, 15 min apart => SAME session
        (1, 1, T0 + dt.timedelta(hours=23, minutes=50)),
        (1, 2, T0 + dt.timedelta(days=1, minutes=5)),
        # then silent for 3 days (empty buckets) => NEW session
        (1, 3, T0 + dt.timedelta(days=4, minutes=5)),
        # user 2: events exactly `gap` apart => NOT a new session
        # (flag fires only on strict >)
        (2, 4, T0),
        (2, 5, T0 + dt.timedelta(minutes=30)),
        (2, 6, T0 + dt.timedelta(minutes=60, seconds=1)),  # > gap => new
        # user 3: single event
        (3, 7, T0 + dt.timedelta(days=2)),
    ]
    df = spark.createDataFrame(rows, "user_id int, event_id int, ts timestamp")
    got = {
        (r["user_id"], r["event_id"]): r["session_seq"]
        for r in sessionize_events(df, "30 minutes").collect()
    }
    assert got == {
        (1, 1): 0, (1, 2): 0, (1, 3): 1,
        (2, 4): 0, (2, 5): 0, (2, 6): 1,
        (3, 7): 0,
    }


@pytest.mark.parametrize("seed", [3, 17, 92])
def test_random_corpora_match_serial_window(spark, seed):
    """Decomposition property: random event times (dense bursts, long
    idles, cross-midnight runs, duplicate-free) under a random gap and
    a HOT user holding half the events — skew-safe == serial."""
    rng = random.Random(seed)
    gap_min = rng.choice([7, 30, 90])
    rows = []
    eid = 0
    for user in range(8):
        n = 400 if user == 0 else rng.randint(1, 60)  # user 0 is hot
        t = T0 + dt.timedelta(minutes=rng.randint(0, 600))
        for _ in range(n):
            # mixture of in-session steps and session-breaking idles,
            # some of which leap whole days (empty buckets)
            step = rng.choice([
                rng.randint(1, gap_min),            # same session
                rng.randint(gap_min + 1, 3 * gap_min),  # break
                rng.randint(1, 3) * 1440 + rng.randint(0, 120),  # day leap
            ])
            t = t + dt.timedelta(minutes=step, seconds=rng.randint(0, 59))
            eid += 1
            rows.append((user, eid, t))
    df = spark.createDataFrame(rows, "user_id int, event_id int, ts timestamp")
    gap = f"{gap_min} minutes"
    got = _rows_to_map(
        sessionize_events(df, gap)
        .select("user_id", "event_id", "ts", "session_seq").collect()
    )
    want = _rows_to_map(_serial_seq(df, gap).collect())
    assert got == want and len(got) == len(rows)


def test_hourly_bucket_matches_daily_default(spark):
    """Bucket granularity must not change results — any monotone
    bucket yields the identical counter."""
    rng = random.Random(5)
    rows = []
    t = T0
    for eid in range(300):
        t = t + dt.timedelta(minutes=rng.randint(1, 90))
        rows.append((1, eid, t))
    df = spark.createDataFrame(rows, "user_id int, event_id int, ts timestamp")
    daily = _rows_to_map(
        sessionize_events(df, "30 minutes")
        .select("user_id", "event_id", "ts", "session_seq").collect())
    hourly = _rows_to_map(
        sessionize_events(
            df, "30 minutes",
            bucket=(F.unix_timestamp("ts") / 3600).cast("long"),
        ).select("user_id", "event_id", "ts", "session_seq").collect())
    assert daily == hourly


def test_no_user_only_window_over_events(spark, sf_dir):
    """Plan shape: every Window node that runs over the event-sized
    frame is partitioned by (user, bucket); the only user-only window
    sits above the per-(user, bucket) boundary aggregate."""
    df = events_sessionize_skew_safe(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    windows = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan)
    assert windows, "expected Window nodes in the plan"
    user_only = [
        spec for spec in windows
        if "user_id" in spec and "_ss_bucket" not in spec
        and "_tl_bucket" not in spec
    ]
    # exactly two user-only windows, BOTH over the one-row-per-
    # (user, day) bucket aggregate, never raw events: the boundary lag
    # (prev bucket's last ts) and the merged offset prefix sums (whose
    # bucket is their ORDER key, not a partition key)
    assert len(user_only) == 2, windows
