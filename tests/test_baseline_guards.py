"""Round-7 scale-honesty: quadratic-by-design baseline queries are
tagged in the registry (BASELINES) and fail fast above a documented
input bound instead of burning a cluster (r6 verdict item 2). The
bounds sit ~10x above the largest sweep fixture, so correctness
sweeps never trip them while the 100x smoke corpus always does.
"""

from __future__ import annotations

import pytest

from dynamic_etl_pipeline_spark.queries.registry import (
    BASELINES,
    BaselineScaleError,
    guard_baseline,
)


def test_guard_trips_above_bound_with_twin_pointer(spark):
    df = spark.range(100)
    with pytest.raises(BaselineScaleError) as exc:
        guard_baseline(df, 10, "my_query", "my_scalable_twin")
    msg = str(exc.value)
    assert "my_scalable_twin" in msg and "100 rows" in msg
    assert "SPARK_GRAFT_ALLOW_QUADRATIC" in msg


def test_guard_passes_under_bound_and_with_override(spark, monkeypatch):
    df = spark.range(100)
    assert guard_baseline(df, 1000, "q", "t") is df
    monkeypatch.setenv("SPARK_GRAFT_ALLOW_QUADRATIC", "1")
    assert guard_baseline(df, 10, "q", "t") is df


def test_baseline_inventory_matches_documented_set():
    """Exactly the 6 quadratic anchors + 5 engine-specific sketches are
    tagged; each tag names its scalable/exact twin."""
    expected_twins = {
        "similar_pairs": "lsh_ann_topk",
        "embedding_near_dup_dedup": "corpus_semdedup_sqrtk",
        # r10: fixed k=8 makes the per-cluster prune ~n^2/8 — the twin
        # scales k=ceil(sqrt(n)) for O(n^1.5) under its own exact oracle
        "corpus_semdedup": "corpus_semdedup_sqrtk",
        "part_name_jw_pairs": "part_name_blocked_pairs",
        # r9: measured output-quadratic (1.55M true pairs at 20k parts —
        # no blocking key can beat Omega(true pairs) full verification)
        "part_name_blocked_pairs": "minhash_near_dups",
        # r10: probe-quadratic on the fixed 25-value nation key (253 s
        # at 100x); the twin answers the identical oracle in 3.4 s
        "join_theta": "join_theta_rank",
        "agg_approx_distinct": "agg_distinct_kmv",
        "agg_approx_quantile": "agg_quantile_hash_sample",
        "events_hll_sketch_rollup": "events_kmv_sketch_rollup",
        "word_freq_items_approx": "word_heavy_hitters_cms",
        "pq_ann_topk": "pq_ann_topk_exact",
    }
    assert set(BASELINES) == set(expected_twins)
    from dynamic_etl_pipeline_spark.queries import QUERIES

    for name, twin in expected_twins.items():
        assert twin in BASELINES[name], (name, BASELINES[name])
        assert twin in QUERIES, f"twin {twin} not registered"
        assert getattr(QUERIES[name], "__baseline__", None) == BASELINES[name]


def test_guarded_queries_still_run_at_fixture_scale(spark, sf_dir):
    """The guards must never trip at sweep fixtures (<= sf0.1)."""
    from dynamic_etl_pipeline_spark.queries import QUERIES

    for name in ("similar_pairs", "part_name_jw_pairs",
                 "part_name_blocked_pairs", "join_theta",
                 "corpus_semdedup"):
        assert QUERIES[name](spark, sf_dir).limit(1).count() >= 0


def test_join_theta_guard_wiring(spark, sf_dir, monkeypatch):
    """join_theta routes its customer input through guard_baseline with
    the documented (bound, twin) pair — wiring-only coverage, spied via
    monkeypatch (renamed from *_trips_at_scale per ADVICE r10: the old
    name overstated what this asserts)."""
    import dynamic_etl_pipeline_spark.queries.relational as rel

    calls = {}

    def spy(df, bound, name, twin):
        calls[name] = (bound, twin)
        return df

    monkeypatch.setattr(rel, "guard_baseline", spy)
    rel.join_theta(spark, sf_dir)
    assert calls == {"join_theta": (200_000, "join_theta_rank")}


def test_join_theta_guard_raise_path_trips(spark, sf_dir, monkeypatch):
    """The raise path itself (ADVICE r10): with the bound shimmed below
    the fixture's customer count, running the registered join_theta
    must raise BaselineScaleError pointing at the join_theta_rank twin
    — this exercises the real guard_baseline count + raise, not a spy."""
    import dynamic_etl_pipeline_spark.queries.relational as rel

    def low_bound(df, bound, name, twin):
        return guard_baseline(df, 1, name, twin)

    monkeypatch.setattr(rel, "guard_baseline", low_bound)
    with pytest.raises(BaselineScaleError) as exc:
        rel.join_theta(spark, sf_dir)
    msg = str(exc.value)
    assert "join_theta_rank" in msg and "join_theta " in msg
