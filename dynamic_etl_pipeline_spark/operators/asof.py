"""As-of join: for each left row, the most recent right row at or
before its timestamp, per key (SURVEY §2.3 — absent from both Spark
and the reference; composed from union + last(ignorenulls) over a
single ordered window).

This is the classic time-series enrichment operator (trade->quote,
event->latest-state). One shuffle on the key, one per-partition sort —
the same cost envelope as any keyed window, so it scales like the rest
of the engine. DuckDB has native ASOF JOIN, which makes this one of the
few custom operators with a first-class SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              value_cols: list[str] | None = None,
              suffix: str = "_asof", strict: bool = False,
              direction: str = "backward") -> DataFrame:
    """For each left row: the nearest right row sharing the join key —
    latest with right_ts <= left_ts (direction="backward", default) or
    earliest with right_ts >= left_ts (direction="forward"); strict
    excludes equal timestamps.

    Implementation: tag + union both sides, sort within the key by
    (ts, right-before-left at equal ts unless strict; ts order reversed
    for forward), carry right values with last(ignorenulls), keep left
    rows. Right value columns come back suffixed; right rows with no
    match yield NULLs (left-outer semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    carried = [f"{c}{suffix}" for c in value_cols]

    l_tag = left.withColumn("_src", F.lit(1)).withColumn("_ts", F.col(left_ts))
    r_tag = (
        right.select(
            F.col(on), F.col(right_ts).alias("_ts"),
            *[F.col(c).alias(cc) for c, cc in zip(value_cols, carried)],
        )
        .withColumn("_src", F.lit(0))
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # At equal timestamps the right row must sort before the left row to
    # be visible (<= / >=); strict mode flips that so it is not.
    # Forward direction = the same scan over reversed time order.
    order_src = F.asc("_src") if not strict else F.desc("_src")
    order_ts = F.asc("_ts") if direction == "backward" else F.desc("_ts")
    w = (
        Window.partitionBy(on)
        .orderBy(order_ts, order_src)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in carried
        ],
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"_f_{c}").alias(c) for c in carried
    ]
    return filled.filter(F.col("_src") == 1).select(*out_cols)
