"""Approximate aggregates: the sketches are engine-specific (no DuckDB
value oracle), so correctness here = bounded relative error against the
exact answer on the same data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamic_etl_pipeline_spark.catalog import load_table
from dynamic_etl_pipeline_spark.queries.advanced import (
    agg_approx_distinct,
    agg_approx_quantile,
)


def test_approx_count_distinct_error_bound(spark, sf_dir):
    got = {r["l_returnflag"]: r for r in agg_approx_distinct(spark, sf_dir).collect()}
    exact = {
        r["l_returnflag"]: r
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_orderkey").alias("orders"),
            F.count_distinct("l_partkey").alias("parts"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for flag, row in got.items():
        for approx_col, exact_col in [("approx_orders", "orders"),
                                      ("approx_parts", "parts")]:
            a, e = row[approx_col], exact[flag][exact_col]
            assert abs(a - e) / e < 0.05, f"{flag}.{approx_col}: {a} vs {e}"


def test_approx_quantile_error_bound(spark, sf_dir):
    [row] = agg_approx_quantile(spark, sf_dir).collect()
    p50, p95 = row["price_quantiles"]
    [exact] = (
        load_table(spark, sf_dir, "lineitem")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.5)).alias("p50"),
            F.percentile("l_extendedprice", F.lit(0.95)).alias("p95"),
        )
        .collect()
    )
    assert abs(p50 - exact["p50"]) / exact["p50"] < 0.02
    assert abs(p95 - exact["p95"]) / exact["p95"] < 0.02


def test_hll_sketch_union_matches_exact_within_bound(spark, sf_dir):
    """Day-sketch union estimate within 5% of exact distinct, and equal
    to the single-pass sketch estimate (register merge is max-based,
    so build-then-union == build-once)."""
    from pyspark.sql import functions as F

    from dynamic_etl_pipeline_spark.catalog import load_table
    from dynamic_etl_pipeline_spark.queries import QUERIES

    est = {
        r["event_type"]: r["distinct_users_est"]
        for r in QUERIES["events_hll_sketch_rollup"](spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["d"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d")).collect()
    }
    assert set(est) == set(exact)
    for k in exact:
        assert abs(est[k] - exact[k]) / exact[k] < 0.05, (k, est[k], exact[k])
    one_pass = {
        r["event_type"]: r["d"]
        for r in e.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
             .cast("bigint").alias("d")).collect()
    }
    assert est == one_pass
