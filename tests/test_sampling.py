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
