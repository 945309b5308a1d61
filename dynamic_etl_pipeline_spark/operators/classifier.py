"""Distributed linear quality classifier (fasttext-style): hashed
bag-of-words features + logistic regression trained by full-batch
gradient descent expressed as DataFrame aggregations.

The reference has no ML of any kind; this is the LLM-data-pipeline
"quality classifier" stage (the LLaMA/CCNet pattern: train a cheap
linear model on seed good/bad documents, score the whole corpus, keep
the top fraction). Spark-first shape, no MLlib dependency:

- features: hashing trick — xxhash64(token) % D buckets, per-doc
  L1-normalized counts. Map-only (explode + per-doc groupBy); the
  feature frame is (doc_id, bucket, val) skinny rows.
- training: w lives on the DRIVER (D doubles, KBs); each iteration
  broadcasts w into the plan as an array literal, computes per-doc
  margins with one join-free aggregate over the doc's buckets, and
  reduces the gradient with one groupBy(bucket) — map-side combining,
  at most D rows cross the wire per iteration. Iterations are a
  Python loop over small Spark jobs, exactly like copurchase_pagerank.
- scoring: one broadcast-w map pass; no shuffle at all.

At 100 TB: the gradient shuffle is D rows (256 by default) regardless
of corpus size — the only corpus-proportional stages are map-side.
Gradient sums accumulate in DECIMAL so training is bit-deterministic
under shuffle-order variation (same rationale as _helpers.dsum).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..materialize import materialize


def hashed_features(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", dim: int = 256,
                    binary: bool = False) -> DataFrame:
    """(id, bucket, val): hashed token features. Default val is the
    L1-normalized count; ``binary=True`` emits presence indicators
    (val = 1.0 per distinct bucket) — the right encoding when the
    signal is a rare marker phrase whose normalized mass would vanish
    inside long documents (a 5-token spam tag in a 100-token doc is
    5% of L1 mass but a full-strength presence bit).

    xxhash64 keeps hashing JVM-side and engine-deterministic; pmod
    folds it into [0, dim). Empty/NULL texts produce no rows (a doc
    with no tokens has no features and scores sigmoid(bias)).
    """
    tok = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.trim(text_col), r"\s+")).alias("_tok"),
    ).filter(F.length("_tok") > 0)
    counts = (
        tok.select("_id", F.pmod(F.xxhash64("_tok"), F.lit(dim)).alias("bucket"))
        .groupBy("_id", "bucket").agg(F.count("*").alias("_n"))
    )
    if binary:
        return counts.select(
            F.col("_id").alias(id_col), "bucket", F.lit(1.0).alias("val")
        )
    tot = counts.groupBy("_id").agg(F.sum("_n").alias("_tot"))
    return (
        counts.join(tot, "_id")
        .select(
            F.col("_id").alias(id_col), "bucket",
            (F.col("_n").cast("double") / F.col("_tot")).alias("val"),
        )
    )


def _margins(feats: DataFrame, id_col: str, w: list[float],
             bias: float) -> DataFrame:
    """(id, margin): x·w + b with w inlined as an array literal —
    element_at is a constant-time JVM lookup, so the dot product is a
    map-side aggregate over each doc's (bucket, val) rows; no join."""
    warr = F.array(*[F.lit(float(x)) for x in w])
    return (
        feats.select(
            F.col(id_col),
            (F.col("val") * F.element_at(warr, F.col("bucket").cast("int") + 1))
            .alias("_wx"),
        )
        .groupBy(id_col)
        .agg((F.sum("_wx") + F.lit(float(bias))).alias("margin"))
    )


def train_logreg(feats: DataFrame, labels: DataFrame,
                 id_col: str = "doc_id", label_col: str = "label",
                 dim: int = 256, iters: int = 10, lr: float = 2.0,
                 l2: float = 1e-4) -> tuple[list[float], float]:
    """Full-batch logistic regression over a hashed-feature frame.

    Returns (weights[dim], bias). Each iteration runs two small Spark
    jobs: margins (doc-keyed agg) and the gradient reduce (bucket-keyed
    agg, <= dim+1 result rows). The weight vector never leaves the
    driver except as a broadcast literal — there is no parameter
    shuffle, so iteration cost is independent of model freshness and
    linear in corpus size.

    Labels must be 0/1 doubles. Gradient components accumulate in
    DECIMAL(38,18) so the result is identical across partitionings.
    """
    lab = labels.select(F.col(id_col), F.col(label_col).cast("double"))
    # bias as a constant feature at bucket `dim` (val 1.0 on every
    # labeled doc, including docs with no token features): the whole
    # iteration — margins, errors, full gradient INCLUDING the bias
    # component — reduces to ONE bucket-keyed aggregate and ONE
    # collect, halving per-iteration job count
    tf = (
        feats.join(lab.select(id_col), id_col)
        .unionByName(lab.select(
            F.col(id_col), F.lit(dim).alias("bucket"), F.lit(1.0).alias("val")
        ))
        .transform(materialize)  # re-read every iteration
    )
    lab = lab.transform(materialize)
    n = lab.count()
    if n == 0:
        raise ValueError("train_logreg: empty training set")
    wb = [0.0] * (dim + 1)
    dec = "decimal(38,18)"
    for _ in range(iters):
        m = _margins(tf, id_col, wb, 0.0)
        derr = lab.join(m, id_col).select(
            id_col,
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin")))
             - F.col(label_col)).alias("_e"),
        )
        grad_rows = (
            tf.join(derr, id_col)
            .groupBy("bucket")
            .agg(F.sum((F.col("val") * F.col("_e")).cast(dec)).alias("g"))
            .collect()
        )
        g = [0.0] * (dim + 1)
        for r in grad_rows:
            g[int(r["bucket"])] = float(r["g"])
        # no L2 on the bias term, standard practice
        wb = [
            wi - lr * (gi / n + (l2 * wi if k < dim else 0.0))
            for k, (wi, gi) in enumerate(zip(wb, g))
        ]
    return wb[:dim], wb[dim]


def score_logreg(feats: DataFrame, w: list[float], bias: float,
                 id_col: str = "doc_id") -> DataFrame:
    """(id, margin, prob): sigmoid scores for every doc with features —
    one map pass + one doc-keyed aggregate, no shuffle wider than the
    feature frame itself."""
    m = _margins(feats, id_col, w, bias)
    return m.select(
        id_col, "margin",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin")))).alias("prob"),
    )


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))
