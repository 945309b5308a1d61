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


# ---------------------------------------------------------------------------
# Round-7 portable twins: the exact DuckDB oracle checks their VALUES;
# these tests pin the sketch PROPERTIES the values rely on (accuracy,
# merge-equals-resketch, the freqItems superset contract).


def test_kmv_estimate_accuracy_and_small_group_exactness(spark, sf_dir):
    """KMV with k=64 has stderr ~ 1/sqrt(k-2) ~ 12.7%; assert a 3-sigma
    bound vs exact distinct, and that groups under k fall back to the
    exact count."""
    from dynamic_etl_pipeline_spark.queries.advanced import (
        _KMV_K,
        agg_distinct_kmv,
    )

    rows = agg_distinct_kmv(spark, sf_dir).collect()
    assert rows
    for r in rows:
        nd, est = r["n_distinct"], r["kmv_estimate"]
        if nd < _KMV_K:
            assert est == nd
        else:
            assert abs(est - nd) / nd < 0.40, (r["l_returnflag"], est, nd)


def test_kmv_rollup_merge_equals_resketch(spark, sf_dir):
    """The two-level day->type KMV union must give EXACTLY the sketch a
    one-shot pass over all events would: the k smallest hashes of a
    union equal the k smallest over per-part k-smallest sets. This is
    the mergeability invariant the 100-TB rollup story leans on."""
    from pyspark.sql import Window

    from dynamic_etl_pipeline_spark.queries.advanced import (
        _KMV_K,
        _kmv_hash,
        events_kmv_sketch_rollup,
    )

    two_level = {
        r["event_type"]: (r["kth_min_hash"], r["distinct_users_est"])
        for r in events_kmv_sketch_rollup(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events")
    dh = e.select(
        "event_type", _kmv_hash(F.col("user_id")).alias("hv")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("hv")
    wp = Window.partitionBy("event_type")
    one_shot = {}
    for r in (
        dh.select(
            "event_type", "hv",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wp).alias("nd"),
        )
        .filter(
            F.col("rn")
            == F.when(F.col("nd") < _KMV_K, F.col("nd")).otherwise(
                F.lit(_KMV_K)
            )
        )
        .collect()
    ):
        one_shot[r["event_type"]] = r["hv"]
    assert set(two_level) == set(one_shot)
    for et, (kth, _est) in two_level.items():
        assert kth == one_shot[et], et


def test_cms_heavy_hitters_superset_contract(spark, sf_dir):
    """word_heavy_hitters_cms must return a SUPERSET of the true heavy
    hitters (cms_estimate >= true_count always), flag exact membership
    correctly, and never undercount."""
    from dynamic_etl_pipeline_spark.queries.text import (
        _HH_DENOM,
        word_heavy_hitters_cms,
    )

    got = {r["word"]: r for r in word_heavy_hitters_cms(spark, sf_dir).collect()}
    assert got, "no heavy hitters at fixture scale — threshold too high"
    wc = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    n_total = sum(r["cnt"] for r in wc)
    true_hh = {r["word"]: r["cnt"] for r in wc
               if r["cnt"] * _HH_DENOM >= n_total}
    assert set(true_hh) <= set(got), "missed a true heavy hitter"
    for w, r in got.items():
        assert r["cms_estimate"] >= r["true_count"]
        assert r["is_true_hh"] == (1 if w in true_hh else 0)


def test_kmv_theta_intersection_accuracy(spark, sf_dir):
    """Theta-sketch intersection estimates vs the exact ride-along:
    with k=64 the common-below-theta estimator carries ~1/sqrt(k)
    noise; assert a 35% relative bound (measured fixture error: ~4%)
    and exactness when the union sketch is complete."""
    from dynamic_etl_pipeline_spark.queries.advanced import (
        _KMV_K,
        events_kmv_type_overlap,
    )

    rows = events_kmv_type_overlap(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["n_union_kept"] < _KMV_K:
            assert r["inter_est"] == r["exact_inter"]
        elif r["exact_inter"] >= _KMV_K:
            err = abs(r["inter_est"] - r["exact_inter"]) / r["exact_inter"]
            assert err < 0.35, (r["type_a"], r["type_b"], err)
        assert r["common_in_sketch"] <= _KMV_K
