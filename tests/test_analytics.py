"""Behavioral invariants for the applied-analytics battery
(queries/analytics.py) beyond oracle value parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamic_etl_pipeline_spark.catalog import load_table
from dynamic_etl_pipeline_spark.queries import QUERIES


def test_gap_fill_grid_is_dense_and_filled(spark, sf_dir):
    filled = QUERIES["events_gap_fill"](spark, sf_dir).cache()
    ev = load_table(spark, sf_dir, "events")
    n_types = ev.select("event_type").distinct().count()
    lo, hi = ev.agg(
        F.date_trunc("hour", F.min("ts")), F.date_trunc("hour", F.max("ts"))
    ).first()
    n_hours = int((hi - lo).total_seconds() // 3600) + 1
    # dense: exactly types x hours rows, no duplicate buckets
    assert filled.count() == n_types * n_hours
    assert filled.select("event_type", "bucket").distinct().count() == \
        n_types * n_hours
    # forward fill: once a type has an observation, no later NULLs
    first_obs = (
        QUERIES["events_gap_fill"](spark, sf_dir)
        .filter(F.col("filled_avg").isNotNull())
        .groupBy("event_type").agg(F.min("bucket").alias("first_obs"))
    )
    holes = (
        filled.join(first_obs, "event_type")
        .filter((F.col("bucket") > F.col("first_obs"))
                & F.col("filled_avg").isNull())
    )
    assert holes.count() == 0
    filled.unpersist()


def test_pagerank_output_is_ranked_probability_mass(spark, sf_dir):
    top = QUERIES["copurchase_pagerank"](spark, sf_dir).collect()
    assert len(top) == 20
    ranks = [r["pagerank"] for r in top]
    # positive, sorted descending, and far below total mass 1.0
    assert all(r > 0 for r in ranks)
    assert ranks == sorted(ranks, reverse=True)
    assert sum(ranks) < 1.0


def test_kl_divergence_is_nonnegative(spark, sf_dir):
    # Gibbs' inequality: KL(p||q) >= 0, zero only if p == q exactly
    rows = QUERIES["source_token_divergence"](spark, sf_dir).collect()
    assert rows and all(r["kl_divergence"] >= 0 for r in rows)


def test_dup_rate_bounds_and_totals(spark, sf_dir):
    rows = QUERIES["dup_rate_by_source"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert 0 <= r["n_dups"] <= r["n_docs"]
        assert 0.0 <= r["dup_rate"] <= 1.0


def test_rfm_variants_partition_the_same_population(spark, sf_dir):
    # ntile and cutpoint tiling bucket differently at ties, but both
    # must partition every customer into tiles 1..4 exactly once
    orders = load_table(spark, sf_dir, "orders")
    n_cust = orders.select("o_custkey").distinct().count()
    for name in ("rfm_segments", "rfm_segments_bucketed"):
        rows = QUERIES[name](spark, sf_dir).collect()
        assert sum(r["n_customers"] for r in rows) == n_cust, name
        for r in rows:
            for t in ("r_tile", "f_tile", "m_tile"):
                assert 1 <= r[t] <= 4, (name, t)


def test_winnow_fingerprints_cover_docs_and_find_overlap(spark, sf_dir):
    fps = QUERIES["doc_winnow_fingerprint"](spark, sf_dir).cache()
    docs = load_table(spark, sf_dir, "documents")
    # every document yields at least one fingerprint
    assert fps.select("doc_id").distinct().count() == docs.count()
    # the winnowing guarantee in action: docs sharing an 8+-char span
    # share a fingerprint, so the fp self-join surfaces overlapping
    # pairs (the fixture's small vocabulary guarantees some exist)
    a, b = fps.alias("a"), fps.alias("b")
    pairs = (
        a.join(b, (F.col("a.fp") == F.col("b.fp"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy("a.doc_id", "b.doc_id").count()
    )
    assert pairs.filter(F.col("count") >= 2).count() > 0
    fps.unpersist()
