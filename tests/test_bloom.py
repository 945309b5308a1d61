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


def test_word_array_literal_is_bigint_even_when_int32_fits(spark):
    """ADVICE r8 (high): F.lit over a plain Python int list infers
    ArrayType(IntegerType) when every word fits int32; shiftright on an
    int32 word masks the shift amount mod 32, so bit tests at positions
    >= 32 read the WRONG bit. The literal must pin array<bigint> no
    matter what the word values are."""
    from dynamic_etl_pipeline_spark.operators.bloom import _word_array_lit

    # -2**31 fits int32; as an int64 bitmap word its bits 31..63 are set
    schema = spark.range(1).select(_word_array_lit([-2**31]).alias("a")).schema
    assert schema["a"].dataType.simpleString() == "array<bigint>"

    # direct bit reads mirroring might_contain's probe expression:
    # bit 35 of int64(-2**31) is 1 (int32 masking would read bit 3 = 0)
    def read_bit(words, pos):
        arr = _word_array_lit(words)
        word = F.element_at(arr, 1)
        bit = F.call_function(
            "shiftright", word, F.lit(pos).cast("int")
        ).bitwiseAND(F.lit(1).cast("bigint"))
        return spark.range(1).select((bit == 1).alias("ok")).first()["ok"]

    assert read_bit([-2**31], 35) is True   # false NEGATIVE under int32
    # bit 52 of int64(2**20) is 0 (int32 masking reads bit 20 = 1)
    assert read_bit([2**20], 52) is False   # false POSITIVE under int32
    # sanity: unmasked low-bit reads agree
    assert read_bit([2**20], 20) is True


def test_probe_plan_literal_is_bigint_array(spark):
    """End-to-end: the word-array literal inside might_contain's plan
    must be array<bigint> even when every word value fits int32 (the
    exact precondition under which list inference used to flip the
    element type and corrupt shifted bit reads)."""
    words = [1, 2, 4]  # all int32-representable
    df = spark.range(10).select(F.col("id").alias("k")).filter(
        might_contain("k", words, 2)
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "array<int>" not in plan
    df.count()  # probe executes


def test_bitmap_cap_falls_back_to_exact_semi_join(spark):
    """VERDICT r8 item 3: when sizing wants more bits than max_bits,
    bloom_semi_filter must return a plain left-semi join (no literal
    bitmap in the plan) with the exact semi-join row set."""
    build = spark.range(0, 2000, 2).select(F.col("id").alias("bk"))
    probe = spark.range(3000).select(F.col("id").alias("k"))
    out = bloom_semi_filter(probe, build, "k", "bk", max_bits=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    got = sorted(r["k"] for r in out.collect())
    assert got == list(range(0, 2000, 2))  # exact, not a superset
    assert out.columns == ["k"]  # probe schema preserved

    # and below the cap the bloom path still engages (no semi join)
    out2 = bloom_semi_filter(probe, build, "k", "bk")
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" not in plan2


def test_fallback_join_unambiguous_when_probe_has_bloom_bk(spark):
    """ADVICE r9: the fallback's internal `_bloom_bk` name must not
    collide with a probe column of the same name — e.g. a probe that
    already went through a prior fallback in the same lineage, or a
    user column that happens to share the name. The aliased build
    frame keeps the condition bound to the build side."""
    build = spark.range(0, 2000, 2).select(F.col("id").alias("bk"))
    probe = spark.range(3000).select(
        F.col("id").alias("k"), F.lit(-1).alias("_bloom_bk")
    )
    out = bloom_semi_filter(probe, build, "k", "bk", max_bits=64)
    got = sorted(r["k"] for r in out.collect())
    assert got == list(range(0, 2000, 2))
    assert out.columns == ["k", "_bloom_bk"]

    # chained fallbacks compose (the original failure scenario)
    out2 = bloom_semi_filter(
        out.select("k"), build, "k", "bk", max_bits=64
    )
    out3 = bloom_semi_filter(out2, build, "k", "bk", max_bits=64)
    assert sorted(r["k"] for r in out3.collect()) == list(range(0, 2000, 2))
