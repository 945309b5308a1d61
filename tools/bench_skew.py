"""Hot-key sessionization: serial window vs skew-safe decomposition.

Measures the one skew shape AQE cannot rewrite — a per-key window
whose key distribution has a dominant key. Builds a skewed view of
the given events table (every even event_id remapped to user 0, so
one user holds ~50% of all events), then times

  serial:    the classic lag/flag/cumsum sessionizer (windows
             partitioned by user_id — the hot user's whole history
             sorts in ONE task), and
  skew_safe: operators/sessionize.py (windows partitioned by
             (user_id, epoch-day bucket) — the hot user parallelizes
             across ~30 day-buckets).

Both produce identical sessions (asserted before timing). Output is
one JSON line; SCALING.md records the per-round result.

Usage: python tools/bench_skew.py [events_dir] [runs]
  events_dir default /tmp/sfscale/sf10 (10M events, built by
  tools/make_scale_corpus.py); runs default 3 (best-of).
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import Window
from pyspark.sql import functions as F

from dynamic_etl_pipeline_spark.catalog import load_table
from dynamic_etl_pipeline_spark.operators.sessionize import sessionize_events
from dynamic_etl_pipeline_spark.session import get_spark


def serial_sessions(ev):
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id").orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.col("ts") > F.lag("ts").over(w_order)
            + F.expr("INTERVAL 30 MINUTES"),
            1,
        ).otherwise(0),
    )
    return (
        flagged.withColumn("session_seq", F.sum("new_session").over(w_run))
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )


def skew_safe_sessions(ev):
    return (
        sessionize_events(ev, "30 minutes")
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale/sf10"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("bench-skew")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "user_id",
        F.when(F.pmod("event_id", F.lit(2)) == 0, F.lit(0).cast("long"))
        .otherwise(F.col("user_id")),
    )
    n = ev.count()
    hot = ev.filter(F.col("user_id") == 0).count()

    # equality first — a fast wrong answer is not a result. Both
    # directions: serial \ skew_safe empty only proves containment;
    # extra/duplicated skew-safe rows need the reverse check too
    # (r6 advisor item).
    mismatch = (
        serial_sessions(ev).exceptAll(skew_safe_sessions(ev)).limit(1).count()
    )
    assert mismatch == 0, "serial has sessions the skew-safe path lacks"
    mismatch = (
        skew_safe_sessions(ev).exceptAll(serial_sessions(ev)).limit(1).count()
    )
    assert mismatch == 0, "skew-safe path emits extra/duplicated sessions"

    out: dict[str, float] = {}
    for name, fn in [("serial", serial_sessions),
                     ("skew_safe", skew_safe_sessions)]:
        best = float("inf")
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            fn(ev).write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        out[name] = round(best, 2)
    print(json.dumps({
        "metric": "sessionize_hot_key", "unit": "sec",
        "n_events": n, "hot_events": hot,
        "hot_frac": round(hot / n, 3),
        **out,
        "speedup": round(out["serial"] / out["skew_safe"], 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
