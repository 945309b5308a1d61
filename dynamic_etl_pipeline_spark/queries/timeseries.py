"""Time-decayed and rank-based robust statistics over the event stream.

Three feature-engineering operators a training-data pipeline runs over
behavioral logs (reference scope: the events table the driver contract
defines; the reference app itself has no time-series surface, so these
rows are SURVEY §2 tier-(c) north-star additions):

- exponential time-decay features (``events_decay_ewma``): the
  classic "recent behavior weighs more" feature. The decay kernel uses
  base 1/2 and cent-quantized values so the whole aggregation is
  BIGINT arithmetic with one final division — bit-exact across
  engines with no decimal cast at all (see the function docstring for
  why decimal accumulation specifically fails here).
- deterministic per-key rate limiting (``events_user_hour_quota``):
  keep the first K events per (user, hour) — the quota/throttle
  sampling primitive used to cap dominant users in a training mix.
- rank-based winsorization (``events_winsorized_stats``): clip values
  at the p01/p99 *order statistics* (row_number, not interpolated
  percentiles — interpolation arithmetic differs across engines in the
  last ulp; the value AT a rank is engine-independent).

Scale notes (SCALING.md "Time-decay / robust stats"):
- the decay join is an equi-join on user_id with a rn-band predicate —
  SortMergeJoin keyed by user, each row meets at most DECAY_DEPTH
  partners, so the output is O(n * depth), never quadratic;
- quota and winsorize are single-shuffle window ops partitioned by
  their natural keys ((user, hour) and event_type).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

DECAY_DEPTH = 19  # current row + 19 predecessors; 0.5^19 ~ 1.9e-6 floor


@query("events_decay_ewma", oracle=f"""
WITH r AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT c.user_id, c.event_id,
       CAST(count(*) AS INT) AS n_terms,
       CAST(sum(CAST(round(p.value * 100) AS BIGINT)
                * (1 << ({DECAY_DEPTH} - (c.rn - p.rn)))) AS DOUBLE)
         / {100.0 * (1 << DECAY_DEPTH)} AS decayed_sum
FROM r c JOIN r p
  ON p.user_id = c.user_id AND p.rn BETWEEN c.rn - {DECAY_DEPTH} AND c.rn
GROUP BY 1, 2
""")
def events_decay_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decay sum per event (half-life = one event).

    Expressed as a banded self-join on per-user row number rather than
    a window function: a running decayed sum can't reference "distance
    from the current row" inside a frame aggregate, but the band join
    states it directly and stays linear (each row joins to at most
    DECAY_DEPTH+1 predecessors).

    Exactness: values are quantized to cents (``round(value*100)`` —
    an exact integer for any 2-decimal-quantized feed, and a
    well-defined quantization otherwise), each term is weighted by the
    INTEGER ``2^(DEPTH-k)``, summed as BIGINT, and divided once by
    ``100 * 2^DEPTH`` at the end — the whole aggregation is integer
    arithmetic, so both engines agree bit-for-bit. (A decimal-cast
    accumulation of ``value/2^k`` does NOT work here: 2-decimal values
    over power-of-two denominators make the exact decimal expansion
    end in ...5 exactly at common rounding scales, and Spark —
    shortest-repr HALF_UP — and DuckDB — exact-binary-value rounding —
    resolve those ties differently.)
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select(
        "user_id", "event_id", "value", F.row_number().over(w).alias("rn")
    )
    cur = r.select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("event_id"),
        F.col("rn").alias("crn"),
    )
    prev = r.select(
        F.col("user_id").alias("pu"),
        F.col("value").alias("pval"),
        F.col("rn").alias("prn"),
    )
    # F.shiftleft only takes a literal shift; the SQL form takes a column
    scaled = F.expr(
        "cast(round(pval * 100) as bigint)"
        f" * shiftleft(1L, {DECAY_DEPTH} - cast(crn - prn as int))"
    )
    denom = float(100 * (1 << DECAY_DEPTH))
    return (
        cur.join(
            prev,
            (F.col("u") == F.col("pu"))
            & (F.col("prn") >= F.col("crn") - DECAY_DEPTH)
            & (F.col("prn") <= F.col("crn")),
        )
        .groupBy(F.col("u").alias("user_id"), "event_id")
        .agg(
            F.count("*").cast("int").alias("n_terms"),
            (F.sum(scaled).cast("double") / F.lit(denom)).alias("decayed_sum"),
        )
    )


@query("events_user_hour_quota", oracle="""
WITH ranked AS (
  SELECT event_type,
         row_number() OVER (
           PARTITION BY user_id, date_trunc('hour', ts)
           ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT event_type,
       CAST(count(*) FILTER (rn <= 3) AS BIGINT) AS kept,
       CAST(count(*) FILTER (rn > 3) AS BIGINT) AS dropped
FROM ranked
GROUP BY 1
""")
def events_user_hour_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic rate limiting: first 3 events per (user, hour) by
    (ts, event_id) are kept, the rest dropped — the per-key quota
    sampler that caps dominant keys in a training mixture. One shuffle
    on the quota key; the tie-break is total so both engines agree."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", F.date_trunc("hour", F.col("ts"))).orderBy(
        "ts", "event_id"
    )
    cnt_if = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return (
        ev.select("event_type", F.row_number().over(w).alias("rn"))
        .groupBy("event_type")
        .agg(
            cnt_if(F.col("rn") <= 3).alias("kept"),
            cnt_if(F.col("rn") > 3).alias("dropped"),
        )
    )


@query("events_winsorized_stats", oracle="""
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL
), cuts AS (
  SELECT event_type,
         max(CASE WHEN rn = GREATEST(1, CAST(ceil(0.01 * n) AS BIGINT))
                  THEN value END) AS lo_cut,
         max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
                  THEN value END) AS hi_cut
  FROM r GROUP BY 1
)
SELECT r.event_type,
       count(*) AS n_values,
       max(lo_cut) AS lo_cut,
       max(hi_cut) AS hi_cut,
       CAST(sum(CAST(LEAST(GREATEST(value, lo_cut), hi_cut)
                     AS DECIMAL(27,4))) AS DOUBLE)
         / count(*) AS winsorized_mean
FROM r JOIN cuts USING (event_type)
GROUP BY 1
""")
def events_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per event type, cutoffs at the p01/p99 ORDER
    STATISTICS (value at rank ceil(p*n) under a total order) — the
    robust-mean feature with engine-independent cutoffs: picking the
    value AT a rank avoids cross-engine interpolation arithmetic
    entirely. Two window passes + one small join; the clipped mean
    accumulates in decimal (see _helpers.davg)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    r = ev.select(
        "event_type", "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    lo_rank = F.greatest(F.lit(1).cast("bigint"), F.ceil(0.01 * F.col("n")))
    hi_rank = F.ceil(0.99 * F.col("n"))
    cuts = r.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == lo_rank, F.col("value"))).alias("lo_cut"),
        F.max(F.when(F.col("rn") == hi_rank, F.col("value"))).alias("hi_cut"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo_cut")), F.col("hi_cut"))
    return (
        r.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_values"),
            F.max("lo_cut").alias("lo_cut"),
            F.max("hi_cut").alias("hi_cut"),
            (F.sum(clipped.cast("decimal(27,4)")).cast("double") / F.count("*"))
            .alias("winsorized_mean"),
        )
    )


@query("events_user_day_streaks", oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), r AS (
  SELECT user_id, d,
         row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
  FROM days
), streaks AS (
  SELECT user_id, d - CAST(rn AS INT) AS anchor,
         count(*) AS len, min(d) AS streak_start
  FROM r GROUP BY 1, 2
)
SELECT user_id,
       CAST(max(len) AS INT) AS longest_streak,
       CAST(count(*) AS INT) AS n_streaks,
       CAST(min(streak_start) AS TIMESTAMP) AS first_active_day
FROM streaks
GROUP BY 1
""")
def events_user_day_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user — the classic
    gaps-and-islands rewrite: date minus per-user day rank is constant
    exactly within a run of consecutive days, so one window + two
    aggregations find every streak with a single shuffle on user_id.
    (The timestamp-gap sibling of this technique verifies the streaming
    sessionizer in queries/streaming.py; this is the calendar-day
    retention variant over DISTINCT active days.)"""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    r = days.withColumn("rn", F.row_number().over(w))
    streaks = (
        r.groupBy(
            "user_id", F.date_sub(F.col("d"), F.col("rn")).alias("anchor")
        )
        .agg(F.count("*").alias("len"), F.min("d").alias("streak_start"))
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("int").alias("longest_streak"),
        F.count("*").cast("int").alias("n_streaks"),
        F.min("streak_start").cast("timestamp_ntz").alias("first_active_day"),
    )
