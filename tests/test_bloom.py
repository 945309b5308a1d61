"""Bloom semi-join pre-filter (operators/bloom.py): zero false
negatives vs the exact semi join, bounded false-positive rate, NULL
semantics, and a map-only probe plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamic_etl_pipeline_spark.catalog import load_table
from dynamic_etl_pipeline_spark.operators.bloom import (
    bloom_semi_filter,
    build_bloom,
    might_contain,
    optimal_params,
)

SF = "/root/testdata/sf0.001"


def test_no_false_negatives_vs_semi_join(spark):
    orders = load_table(spark, SF, "orders")
    build = load_table(spark, SF, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    pre = bloom_semi_filter(orders, build, "o_custkey", "c_custkey")
    # USING-join reorders columns (key first): re-project both sides to
    # the orders schema before the positional exceptAll comparison
    exact = orders.join(
        build.select(F.col("c_custkey").alias("o_custkey")),
        "o_custkey", "left_semi",
    ).select(*orders.columns)
    pre = pre.select(*orders.columns)
    # every exact-semi-join row survives the bloom pre-filter
    assert exact.exceptAll(pre).count() == 0
    # and the pre-filter actually prunes (orders of non-BUILDING customers)
    assert pre.count() < orders.count()


def test_false_positive_rate_bounded(spark):
    # build over keys 0..999; probe keys 1M..101M are all true negatives
    build = spark.range(1000).select(F.col("id").alias("k"))
    probe = spark.range(1_000_000, 1_100_000).select(F.col("id").alias("k"))
    kept = bloom_semi_filter(probe, build, "k", fpp=0.01).count()
    assert kept / 100_000 < 0.03  # ~1% target, 3x headroom


def test_membership_exact_on_build_keys(spark):
    build = spark.range(500).select(F.col("id").alias("k"))
    num_bits, k = optimal_params(500, 0.01)
    words = build_bloom(build, "k", num_bits, k)
    hits = (
        build.filter(might_contain("k", words, k)).count()
    )
    assert hits == 500  # all members test positive, by construction


def test_null_keys_filtered(spark):
    build = spark.createDataFrame([(1,), (None,)], "k int")
    probe = spark.createDataFrame([(1,), (None,), (2,)], "k int")
    out = bloom_semi_filter(probe, build, "k")
    got = [r["k"] for r in out.collect()]
    assert 1 in got and None not in got  # NULL never semi-joins


def test_probe_plan_is_map_only(spark):
    build = spark.range(100).select(F.col("id").alias("k"))
    probe = spark.range(10_000).select(F.col("id").alias("k"))
    num_bits, k = optimal_params(100, 0.01)
    words = build_bloom(build, "k", num_bits, k)
    plan = (
        probe.filter(might_contain("k", words, k))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_optimal_params_sane():
    m, k = optimal_params(1000, 0.01)
    assert m % 64 == 0 and 8000 <= m <= 11000  # ~9.6 bits/key
    assert 5 <= k <= 9
    m1, k1 = optimal_params(0, 0.01)
    assert m1 >= 64 and k1 >= 1
