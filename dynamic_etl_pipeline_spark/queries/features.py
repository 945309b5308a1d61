"""Feature-engineering operators: point-in-time (feature-store style)
joins, percent-of-total windows, and Spark 4 VARIANT semi-structured
access.

The reference has no feature surface at all (its records are inert JSON
blobs, app.py:68-74); these are tier-[D] operators a training-data
pipeline needs: assembling leakage-free features "as of" a label
timestamp is the canonical feature-store operation.

Scale notes: the PIT join is ONE window pass over events partitioned by
user_id — no self-join, no state blow-up; at 100 TB the shuffle is a
single hash partition on the entity key, and every feature column rides
the same sort. ratio-to-report is a partial-agg + broadcast-back window,
and VARIANT extraction is JVM codegen (no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ._helpers import dsum
from .registry import query


@query("events_pit_features", oracle="""
SELECT p.event_id, p.user_id, p.ts, p.value AS purchase_value,
       (SELECT c.value FROM events c
         WHERE c.user_id = p.user_id AND c.event_type = 'click'
           AND (c.ts, c.event_id) < (p.ts, p.event_id)
         ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS last_click_value,
       (SELECT v.value FROM events v
         WHERE v.user_id = p.user_id AND v.event_type = 'view'
           AND (v.ts, v.event_id) < (p.ts, p.event_id)
         ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS last_view_value,
       (SELECT count(*) FROM events c
         WHERE c.user_id = p.user_id AND c.event_type = 'click'
           AND c.ts >= p.ts - INTERVAL '1 hour' AND c.ts < p.ts
       ) AS n_clicks_1h
FROM events p
WHERE p.event_type = 'purchase'
""")
def events_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature join: for every purchase (the label spine),
    attach the user's feature values as of strictly before the label —
    last click value, last view value, and click count in the trailing
    hour. The correlated-subquery formulation the oracle runs would be
    N+1 scans; Spark computes all three features in one window pass over
    (user_id, ts, event_id) order, so adding a feature adds a column,
    not a join. Ties are totally ordered by (ts, event_id) so the
    "strictly before" cut is deterministic on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    hist = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # RANGE frame needs a numeric ordering key; micros keep full ts
    # precision so [-1h, current) excludes same-instant events exactly
    # like the oracle's c.ts < p.ts.
    hour_us = 3600 * 10**6
    recent = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-hour_us, -1)
    )
    click_val = F.when(F.col("event_type") == "click", F.col("value"))
    view_val = F.when(F.col("event_type") == "view", F.col("value"))
    click_ind = F.when(F.col("event_type") == "click", 1).otherwise(0)
    return (
        ev.select("event_id", "user_id", "ts", "event_type", "value")
        .withColumn("last_click_value", F.last(click_val, ignorenulls=True).over(hist))
        .withColumn("last_view_value", F.last(view_val, ignorenulls=True).over(hist))
        .withColumn(
            "n_clicks_1h",
            F.coalesce(F.sum(click_ind).over(recent), F.lit(0)).cast("long"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id", "user_id", "ts",
            F.col("value").alias("purchase_value"),
            "last_click_value", "last_view_value", "n_clicks_1h",
        )
    )


@query("window_ratio_to_report", oracle="""
WITH t AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(sum(CAST(o_totalprice AS DECIMAL(27,4)))
              OVER (PARTITION BY o_custkey) AS DOUBLE) AS cust_total
  FROM orders
)
SELECT o_custkey, o_orderkey, o_totalprice,
       round(o_totalprice / cust_total, 8) AS share_of_customer
FROM t
""")
def window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total (ratio_to_report): each order's share of its
    customer's lifetime spend. The denominator is summed in exact
    DECIMAL so both engines divide by the bit-identical double.
    """
    orders = load_table(spark, sf_dir, "orders")
    per_cust = Window.partitionBy("o_custkey")
    total = (
        F.sum(F.col("o_totalprice").cast("decimal(27,4)"))
        .over(per_cust)
        .cast("double")
    )
    return orders.select(
        "o_custkey", "o_orderkey", "o_totalprice",
        F.round(F.col("o_totalprice") / total, 8).alias("share_of_customer"),
    )


@query("events_variant_props", oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1
""")
def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    parse_json once, then typed variant_get extraction — the
    shred-on-read answer to the reference's opaque JSON blobs
    (app.py:364 stores records as json.dumps text). Unlike from_json
    this needs no up-front schema, so schema drift in props never
    breaks the pipeline; unlike string json_extract it parses each
    value once into a binary form.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.groupBy((k % 10).alias("k_bucket"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
    )
