"""Distributed PCA over an embedding column (SURVEY §2.12 north star:
dimension reduction / whitening before ANN indexing or diversity
sampling).

Split of labor that survives 100 TB: the DATA-sized work — one pass
accumulating per-dimension sums and upper-triangle cross-products —
runs as a Spark aggregation (same decimal-exact shape as
queries/vectors.py::embedding_covariance, d(d+1)/2 cells regardless of
row count); only the d x d covariance matrix is collected, and the
eigendecomposition is driver-side numpy on that tiny matrix (d = 64
here; even d = 4096 is a 130 MB symmetric eig, still a driver
problem). Projection is a map-only JVM fold per component — no UDF,
no shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import dot


@dataclass
class PcaModel:
    mean: np.ndarray                # (d,)
    components: np.ndarray          # (k, d) rows = principal directions
    explained_variance: np.ndarray  # (k,) eigenvalues, descending
    n_rows: int


def covariance_matrix(df: DataFrame, col: str = "embedding") -> tuple[np.ndarray, np.ndarray, int]:
    """One-pass population covariance: returns (cov (d,d), mean (d,), n).

    The cluster-side aggregate produces d per-dim sums and d(d+1)/2
    cross-product sums (decimal accumulation for run-to-run determinism);
    everything collected is O(d^2), independent of row count.
    """
    # repartition: the O(d^2)-per-row pair emission is compute-bound; a
    # single-row-group input (the fixture layout) would otherwise run it
    # as one task
    par = df.sparkSession.sparkContext.defaultParallelism
    base = df.filter(F.size(col) > 0).repartition(par).select(
        F.transform(col, lambda x: x.cast("double")).alias("e")
    )
    pair_rows = (
        base.select(F.explode(F.expr("""
          flatten(transform(sequence(0, size(e) - 1),
            i -> transform(sequence(i, size(e) - 1),
              j -> struct(i AS i, j AS j,
                          element_at(e, i + 1) * element_at(e, j + 1) AS p))))
        """)).alias("s"))
        .select("s.i", "s.j", "s.p")
        .groupBy("i", "j")
        .agg(F.sum(F.col("p").cast("decimal(27,12)")).alias("sp"),
             F.count("*").alias("n"))
        .collect()
    )
    dim_rows = (
        base.select(F.posexplode("e").alias("dim", "v"))
        .groupBy("dim")
        .agg(F.sum(F.col("v").cast("decimal(27,12)")).alias("sx"))
        .collect()
    )
    d = len(dim_rows)
    n = int(pair_rows[0]["n"]) if pair_rows else 0
    sx = np.zeros(d)
    for r in dim_rows:
        sx[r["dim"]] = float(r["sx"])
    spd = np.zeros((d, d))
    for r in pair_rows:
        spd[r["i"], r["j"]] = spd[r["j"], r["i"]] = float(r["sp"])
    mean = sx / n
    cov = spd / n - np.outer(mean, mean)
    return cov, mean, n


def fit_pca(df: DataFrame, col: str = "embedding", k: int = 2) -> PcaModel:
    """Eigendecompose the covariance (driver-side, symmetric eigh) and
    keep the top-k components. Eigenvector sign is arbitrary; it is
    fixed by making each component's largest-|coefficient| entry
    positive, so the model is deterministic run to run."""
    cov, mean, n = covariance_matrix(df, col)
    vals, vecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T                  # (k, d)
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1.0
    return PcaModel(
        mean=mean,
        components=comps,
        explained_variance=vals[order],
        n_rows=n,
    )


def _lit_vec(v: np.ndarray) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


def pca_project(df: DataFrame, model: PcaModel, col: str = "embedding",
                prefix: str = "pc") -> DataFrame:
    """Append pc1..pck columns: (x - mean) . component_i as a JVM
    zip_with/aggregate fold per component — map-only whole-stage
    codegen, the model rides along as literal arrays (a broadcast in
    spirit, a constant in the plan)."""
    centered = F.zip_with(
        F.transform(col, lambda x: x.cast("double")),
        _lit_vec(model.mean),
        lambda x, m: x - m,
    )
    out = df.withColumn("_centered", centered)
    for i, comp in enumerate(model.components, start=1):
        out = out.withColumn(f"{prefix}{i}", dot(F.col("_centered"), _lit_vec(comp)))
    return out.drop("_centered")
