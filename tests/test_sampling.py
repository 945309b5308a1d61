"""Property tests for the engine-specific (rows-only) sampling and
sketch queries: stratified sampling rates/determinism and the frequent-
items superset guarantee.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamic_etl_pipeline_spark.catalog import load_table
from dynamic_etl_pipeline_spark.queries import QUERIES


def test_stratified_sample_rates_and_determinism(spark, sf_dir):
    sample = QUERIES["doc_stratified_sample"](spark, sf_dir).cache()
    docs = load_table(spark, sf_dir, "documents")
    totals = dict(docs.groupBy("lang").count().collect())
    kept = dict(sample.groupBy("lang").count().collect())
    targets = {"en": 0.5, "es": 0.25, "fr": 0.25, "de": 0.25, "zh": 0.25}
    for lang, frac in targets.items():
        if totals.get(lang, 0) < 20:
            continue  # too small a stratum for a rate assertion
        rate = kept.get(lang, 0) / totals[lang]
        assert 0.4 * frac < rate < 1.8 * frac, (lang, rate, frac)
    # same seed + same input partitioning -> identical membership
    again = QUERIES["doc_stratified_sample"](spark, sf_dir)
    assert sample.exceptAll(again).count() == 0
    assert again.exceptAll(sample).count() == 0
    sample.unpersist()


def test_freq_items_is_superset_of_true_heavy_hitters(spark, sf_dir):
    [row] = QUERIES["word_freq_items_approx"](spark, sf_dir).collect()
    approx = set(row[0])
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("word"))
    n = words.count()
    exact_heavy = {
        r["word"]
        for r in words.groupBy("word").count()
        .filter(F.col("count") > 0.01 * n).collect()
    }
    # the sketch may overreport (false positives) but never underreport
    assert exact_heavy <= approx, exact_heavy - approx


def test_diversity_sample_balance_and_determinism(spark, sf_dir):
    from dynamic_etl_pipeline_spark.operators.knn import diversity_sample

    e = load_table(spark, sf_dir, "embeddings")
    s = diversity_sample(e, quota=5, n_clusters=4).cache()
    per = dict(s.groupBy("cluster_id").count().collect())
    # quota respected per cluster; every non-empty cluster represented
    assert per and all(c <= 5 for c in per.values())
    assert set(per) <= set(range(4))
    # schema passthrough + the cluster column
    assert set(s.columns) == set(e.columns) | {"cluster_id"}
    # deterministic: same seed -> identical membership
    again = diversity_sample(e, quota=5, n_clusters=4)
    assert s.exceptAll(again).count() == 0
    assert again.exceptAll(s).count() == 0
    # a different seed reshuffles the within-cluster choice
    other = diversity_sample(e, quota=5, n_clusters=4, seed=7)
    assert other.count() == s.count()
    s.unpersist()


def test_diversity_sample_covers_modes_uniform_misses(spark, sf_dir):
    from dynamic_etl_pipeline_spark.operators.knn import diversity_sample

    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    budget = 20
    s = diversity_sample(e, quota=5, n_clusters=4)
    assert s.count() <= budget
    # each cluster contributes: the sample spans >= as many distinct
    # labels as a same-size deterministic head sample
    head_labels = (
        e.orderBy("vec_id").limit(budget).select("label").distinct().count()
    )
    div_labels = s.select("label").distinct().count()
    assert div_labels >= max(2, head_labels // 2)
