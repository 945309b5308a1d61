"""Window functions (SURVEY §2.5 — absent from the reference, tier [D]):
ranking, analytic (lag/lead/first/last), and framed running aggregates.

Scale note: every window here partitions by a high-cardinality key
(custkey), so the single shuffle distributes evenly; no global
(unpartitioned) windows are used anywhere — those serialize to one task
and are the classic 100 TB window anti-pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query


@query("window_topk_per_group", oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
  FROM orders
) WHERE rn <= 3
""")
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: row_number + filter. At scale this is
    one hash-partitioned shuffle + per-partition sort; AQE splits skewed
    customers."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.row_number().over(w).cast("int").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query("window_rank_dense_ntile", oracle="""
SELECT c_nationkey, c_custkey, c_acctbal,
       CAST(rank()       OVER w AS INT) AS bal_rank,
       CAST(dense_rank() OVER w AS INT) AS bal_dense_rank,
       CAST(ntile(4)     OVER w AS INT) AS bal_quartile
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
""")
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_custkey", "c_acctbal",
        F.rank().over(w).cast("int").alias("bal_rank"),
        F.dense_rank().over(w).cast("int").alias("bal_dense_rank"),
        F.ntile(4).over(w).cast("int").alias("bal_quartile"),
    )


@query("window_lag_lead", oracle="""
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
       lag(o_totalprice)  OVER w AS prev_price,
       lead(o_totalprice) OVER w AS next_price,
       round(o_totalprice - coalesce(lag(o_totalprice) OVER w, o_totalprice), 2) AS price_delta
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""")
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics along each customer's order history."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    price = F.col("o_totalprice")
    prev = F.lag("o_totalprice").over(w)
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
        prev.alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.round(price - F.coalesce(prev, price), 2).alias("price_delta"),
    )


@query("window_running_sum", oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(sum(CAST(o_totalprice AS DECIMAL(27,4)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_spend,
       CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS order_seq
FROM orders
""")
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) aggregate over an explicit ROWS frame.
    Decimal accumulation keeps the running double deterministic."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(27,4)")).over(w)
         .cast("double").alias("running_spend"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("order_seq"),
    )


@query("window_sliding_avg", oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(27,4))) OVER w AS DOUBLE)
            / count(*) OVER w AS DOUBLE) AS moving_avg_3
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""")
def window_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average (sliding ROWS frame), deterministic via
    decimal sum / count."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        (F.sum(F.col("o_totalprice").cast("decimal(27,4)")).over(w).cast("double")
         / F.count(F.lit(1)).over(w)).cast("double").alias("moving_avg_3"),
    )


@query("window_first_last", oracle="""
SELECT DISTINCT o_custkey,
       first_value(o_orderkey) OVER w AS first_order,
       last_value(o_orderkey)  OVER w AS last_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""")
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last order per customer over the full-partition frame."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w).alias("last_order"),
        )
        .distinct()
    )


@query("window_range_frame", oracle="""
SELECT event_id, user_id, ts,
       count(*) OVER w AS n_last_hour,
       CAST(sum(CAST(value AS DECIMAL(27,4))) OVER w AS DOUBLE) AS sum_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
""")
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-valued RANGE frame: per-user trailing-hour count/sum at each
    event. rangeBetween over the ORDER BY value (not row offsets) — the
    frame Spark evaluates with one per-key sort, no self-join.

    The ordering key is epoch MICROS, not seconds: a seconds-truncated
    key silently widens the frame at sub-second boundaries (an event
    1h + 400ms old looks exactly 1h old) — caught by the sf0.1 oracle
    sweep where fractional-second gaps actually occur."""
    ev = load_table(spark, sf_dir, "events")
    hour_us = 3600 * 10**6
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-hour_us, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", "ts",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.sum(F.col("value").cast("decimal(27,4)")).over(w)
        .cast("double").alias("sum_last_hour"),
    )


@query("window_percent_rank_cume", oracle="""
SELECT o_orderkey, o_orderpriority,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       ntile(10) OVER w AS decile
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
""")
def window_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-ranking battery: percent_rank / cume_dist / ntile
    per priority class."""
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(10).over(w).alias("decile"),
    )


@query("window_ignore_nulls", oracle="""
WITH v AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS val
  FROM events
)
SELECT event_id, user_id, val,
       last_value(val IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
       ) AS prev_good_value,
       nth_value(val, 3 IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS third_good_value
FROM v
""")
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS analytics: carry the previous non-null reading past
    error events (forward-fill shape) and pick the partition's third
    non-null value — the null-skipping variants of last/nth_value that
    sensor/event pipelines lean on. One per-key sort serves both frames.
    """
    ev = load_table(spark, sf_dir, "events")
    # explicit otherwise(): the oracle's CASE WHEN type = 'error' THEN
    # NULL ELSE value END keeps the value for NULL event_type, whereas
    # when(type != 'error', value) would blank it (inverted 3VL)
    val = F.when(
        F.col("event_type") == "error", F.lit(None)
    ).otherwise(F.col("value"))
    prev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    full = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id", "user_id", val.alias("val"),
        F.last(val, ignorenulls=True).over(prev).alias("prev_good_value"),
        F.nth_value(val, 3, ignoreNulls=True).over(full).alias("third_good_value"),
    )


@query("window_exclude_current", oracle="""
SELECT event_id,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
         PARTITION BY event_type ORDER BY ts, event_id
         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
         EXCLUDE CURRENT ROW) AS BIGINT) AS neighbor_cents
FROM events
""")
def window_exclude_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame EXCLUDE CURRENT ROW, which Spark's window syntax lacks,
    emulated as (full-frame sum) - (current row's value) — exact
    because the aggregate is the cent-quantized BIGINT value, so the
    subtraction is integer arithmetic with no float re-association.
    The oracle uses DuckDB's native EXCLUDE CURRENT ROW, so this
    verifies the emulation against a real implementation of the
    clause, not against itself. One window exchange on event_type.

    3VL care (the fixture can't exercise it; tests/test_timeseries.py
    does): SUM over an excluded-to-empty or all-NULL neighbor set is
    NULL, not 0 — so the emulation gates on the count of non-NULL
    NEIGHBOR values and subtracts coalesce(current, 0) so a NULL
    current row doesn't poison the difference."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.expr("cast(round(value * 100) as bigint)")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 3)
    )
    n_neighbors = F.count(cents).over(w) - F.when(
        cents.isNotNull(), F.lit(1)
    ).otherwise(F.lit(0))
    return ev.select(
        "event_id",
        F.when(
            n_neighbors > 0,
            F.sum(cents).over(w) - F.coalesce(cents, F.lit(0)),
        ).alias("neighbor_cents"),
    )


@query("window_groups_frame", oracle="""
WITH r AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents,
         dense_rank() OVER (
           PARTITION BY event_type
           ORDER BY CAST(round(value) AS BIGINT)) AS dr
  FROM events WHERE value IS NOT NULL
), g AS (
  SELECT event_type, dr, count(*) AS g_n, sum(cents) AS g_cents
  FROM r GROUP BY 1, 2
), f AS (
  SELECT event_type, dr,
         CAST(sum(g_n) OVER (
           PARTITION BY event_type ORDER BY dr
           ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT)
           AS n_in_groups,
         CAST(sum(g_cents) OVER (
           PARTITION BY event_type ORDER BY dr
           ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT)
           AS cents_in_groups
  FROM g
)
SELECT r.event_id, f.n_in_groups, f.cents_in_groups
FROM r JOIN f USING (event_type, dr)
""")
def window_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPS-mode window frame (SQL:2011) — Spark's API lacks it
    entirely, and so does DuckDB 1.0 ("GROUPS mode ... not implemented
    yet"), so the emulation IS the operator on both engines: the
    oracle runs the same dense-rank decomposition in SQL (engine
    parity), and tests/test_windows_groups.py proves the decomposition
    equals true GROUPS semantics against a pure-Python reference over
    randomized inputs.

    Peer groups are rows tied on the ORDER key, and dense_rank numbers
    them consecutively — so a GROUPS frame of +/-N peer groups equals
    a ROWS frame of +/-N over the per-group AGGREGATE frame ordered by
    dense_rank, joined back to the rows (r4). Shape: one window for
    dense_rank, one group-level aggregate, one tiny rows-frame window
    over groups, one equi-join back — all partitioned by event_type;
    value quantized to cents so the sums are integer-exact."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    okey = F.expr("cast(round(value) as bigint)")
    cents = F.expr("cast(round(value * 100) as bigint)")
    w_dr = Window.partitionBy("event_type").orderBy(okey)
    rows = ev.select(
        "event_id", "event_type", okey.alias("okey"), cents.alias("cents"),
        F.dense_rank().over(w_dr).alias("dr"),
    )
    groups = rows.groupBy("event_type", "dr").agg(
        F.count("*").alias("g_n"), F.sum("cents").alias("g_cents")
    )
    w_g = (
        Window.partitionBy("event_type").orderBy("dr")
        .rowsBetween(-1, 1)
    )
    framed = groups.select(
        "event_type", "dr",
        F.sum("g_n").over(w_g).cast("bigint").alias("n_in_groups"),
        F.sum("g_cents").over(w_g).cast("bigint").alias("cents_in_groups"),
    )
    return rows.join(framed, ["event_type", "dr"]).select(
        "event_id", "n_in_groups", "cents_in_groups"
    )
