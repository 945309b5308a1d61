"""Skew-resilient gaps-and-islands sessionization.

The classic lag -> flag -> running-sum sessionizer partitions every
window by the session key (user), so ONE hot key serializes: a user
holding 5M of 10M events becomes a single 5M-row sort in a single
task, and no AQE feature helps — skew-join splitting rewrites joins,
not windows. This operator removes the per-key serial ceiling by
decomposing the serial windows over a monotone time bucket.

Derivation (bucket monotone non-decreasing in ts, so bucket frames
partition each user's timeline into consecutive runs):

- Within a (user, bucket) run, row j's true break flag equals the
  LOCAL flag (lag within the bucket) — except the bucket's first row,
  whose flag compares against the previous non-empty bucket's last
  timestamp: ``bflag(b) = min_ts(b) > max_ts(prev b) + gap``.
- Therefore ``session_seq(row in b) = local_runsum(row)
  + sum_{b' < b}(local_flag_sum(b') + bflag(b')) + bflag(b)``
  — the second+third terms depend ONLY on per-bucket aggregates
  (min ts, max ts, local flag sum): one row per (user, non-empty
  bucket), days not events.

Plan shape: one window pass over events per branch (the per-bucket
aggregate re-evaluates the lag pass — two map-parallel passes, the
standard two-level trade instead of caching a data-sized frame), a
(user, bucket)-keyed hash aggregate, lag + framed prefix sums over the
TINY bucket frame (the only user-only windows, pinned in
tests/test_sessionize_skew.py), and a single equi-join back. A hot
user's cost is bounded by rows-per-bucket, not rows-per-user; results
are bit-identical to the serial formulation (fixture equality,
boundary-crafted corpora, and randomized decomposition properties in
the same test module).

Scale contract: pick the bucket width so (max events per key per
bucket) fits a task comfortably — the default epoch-day matches the
fixtures' 30-day span; at 100 TB an hourly or minutely bucket costs
nothing extra (the boundary frame stays tiny relative to events)
while capping the serial run length.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_B = "_ss_bucket"


def sessionize_events(events: DataFrame, gap: str = "30 minutes", *,
                      user_col: str = "user_id", ts_col: str = "ts",
                      tiebreak: Sequence[str] = ("event_id",),
                      bucket: Column | None = None,
                      out_col: str = "session_seq") -> DataFrame:
    """Append ``out_col`` — the 0-based per-user session counter of the
    lag/flag/cumsum sessionizer — without any window partitioned by
    ``user_col`` alone over the event-sized frame.

    ``bucket`` must be monotone non-decreasing in ``ts_col`` (default:
    epoch day). ``tiebreak`` finishes the lag order among equal
    timestamps, matching the serial formulation's ORDER BY (ts,
    event_id); the running sum itself orders by ``ts_col`` only, also
    matching the serial/oracle form.
    """
    ts = F.col(ts_col)
    gap_i = F.expr(f"INTERVAL {gap}")
    if bucket is None:
        bucket = F.unix_date(ts.cast("date"))
    b = events.withColumn(_B, bucket)
    w_lag = Window.partitionBy(user_col, _B).orderBy(ts_col, *tiebreak)
    w_run = (
        Window.partitionBy(user_col, _B).orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = b.withColumn(
        "_ss_flag",
        F.when(ts > F.lag(ts_col).over(w_lag) + gap_i, F.lit(1))
        .otherwise(F.lit(0)).cast("long"),
    ).withColumn("_ss_lrun", F.sum("_ss_flag").over(w_run))
    # One row per (user, non-empty bucket): everything the cross-bucket
    # correction needs is three aggregates of the local pass.
    pb = local.groupBy(user_col, _B).agg(
        F.min(ts_col).alias("_ss_first"),
        F.max(ts_col).alias("_ss_last"),
        F.sum("_ss_flag").alias("_ss_lf"),
    )
    w_pb = Window.partitionBy(user_col).orderBy(_B)
    pb = pb.withColumn(
        "_ss_bflag",
        F.when(
            F.col("_ss_first") > F.lag("_ss_last").over(w_pb) + gap_i,
            F.lit(1),
        ).otherwise(F.lit(0)).cast("long"),
    )
    w_prior = w_pb.rowsBetween(Window.unboundedPreceding, -1)
    w_incl = w_pb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    off = pb.select(
        F.col(user_col).alias("_ss_u"), F.col(_B).alias("_ss_b"),
        (
            F.coalesce(F.sum("_ss_lf").over(w_prior), F.lit(0))
            + F.sum("_ss_bflag").over(w_incl)
        ).alias("_ss_off"),
    )
    # Null-safe join keys: a NULL timestamp yields a NULL bucket, which
    # a plain equi-join would silently drop (same contract as the
    # two-level offset join-back in operators/twolevel.py).
    joined = local.join(
        off,
        local[user_col].eqNullSafe(off["_ss_u"])
        & local[_B].eqNullSafe(off["_ss_b"]),
    )
    return joined.withColumn(
        out_col, F.col("_ss_lrun") + F.col("_ss_off")
    ).drop("_ss_u", "_ss_b", _B, "_ss_flag", "_ss_lrun", "_ss_off")
