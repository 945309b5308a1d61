"""Distributed logistic-regression quality classifier
(operators/classifier.py): separability, determinism, and the
registered distillation query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dynamic_etl_pipeline_spark.operators.classifier import (
    hashed_features,
    score_logreg,
    train_logreg,
)


def _corpus(spark):
    rows = []
    for i in range(60):
        if i % 2 == 0:
            rows.append((i, "good clean prose with informative words here", 1.0))
        else:
            rows.append((i, "spam spam buy now click here spam offer", 0.0))
    return spark.createDataFrame(rows, ["doc_id", "text", "label"])


def test_logreg_separates_planted_classes(spark):
    d = _corpus(spark)
    feats = hashed_features(d)
    w, b = train_logreg(feats, d.select("doc_id", "label"), iters=10)
    scored = score_logreg(feats, w, b).join(d.select("doc_id", "label"), "doc_id")
    rows = scored.collect()
    acc = sum(
        1 for r in rows if (r["prob"] >= 0.5) == (r["label"] == 1.0)
    ) / len(rows)
    assert acc == 1.0, f"separable corpus not separated (acc={acc})"
    # probabilities are calibrated-ish: classes on opposite sides of 0.5
    pos = [r["prob"] for r in rows if r["label"] == 1.0]
    neg = [r["prob"] for r in rows if r["label"] == 0.0]
    assert min(pos) > max(neg)


def test_logreg_training_is_deterministic(spark):
    d = _corpus(spark)
    feats = hashed_features(d)
    w1, b1 = train_logreg(feats, d.select("doc_id", "label"), iters=5)
    # different partitioning, same decimal-accumulated gradients
    w2, b2 = train_logreg(
        hashed_features(d.repartition(7)),
        d.select("doc_id", "label"), iters=5,
    )
    assert w1 == w2 and b1 == b2


def test_logreg_empty_training_set_raises(spark):
    d = _corpus(spark).limit(0)
    with pytest.raises(ValueError, match="empty"):
        train_logreg(hashed_features(d), d.select("doc_id", "label"))


def test_hashed_features_l1_normalized_and_null_safe(spark):
    d = spark.createDataFrame(
        [(1, "a b a"), (2, ""), (3, None)], ["doc_id", "text"]
    )
    rows = hashed_features(d).collect()
    ids = {r["doc_id"] for r in rows}
    assert ids == {1}  # empty/NULL docs emit no feature rows
    assert abs(sum(r["val"] for r in rows) - 1.0) < 1e-12


def test_quality_classifier_query_distills_planted_signal(spark, sf_dir):
    from dynamic_etl_pipeline_spark.queries import QUERIES

    out = QUERIES["doc_quality_classifier"](spark, sf_dir).collect()
    assert out
    acc = sum(1 for r in out if r["pred"] == int(r["label"])) / len(out)
    assert acc >= 0.99, f"planted spam marker not learned (acc={acc})"
