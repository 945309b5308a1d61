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


def power_iteration_pc1(df: DataFrame, iters: int = 3,
                        scale: int = 1_000_000, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """First principal component by power iteration with bit-pinned,
    engine-portable arithmetic — the PCA member of the exact-iterative
    family (BPE trainer, kmeans_exact_assign).

    Recipe: vectors quantize to ``floor(x * scale)`` BIGINTs; ONE scan
    emits each vector's upper-triangle pair products plus linear sums
    (the embedding_covariance flatten/transform idiom, JVM codegen, no
    UDF) into a d(d+1)/2 + d cell aggregate with DECIMAL accumulation
    — exact at any corpus size. The driver assembles the scaled scatter
    matrix n*S - s s^T in arbitrary-precision ints, converts each cell
    with one correct rounding to double, and runs ``iters`` rounds of
    v <- normalize(M v) from the all-ones start with strict
    left-to-right 0.0-seeded folds — the exact fold a SQL engine
    produces for ``0.0 + t1 + ... + tn``, so every engine lands on the
    same bits and the same (sign-deterministic) eigvector. Projection
    x·v - mu·v is one map-only zip_with/aggregate pass.

    Scale shape: one map-heavy scan + one d^2-cell aggregate (cells,
    not rows, cross the shuffle); per-iteration cost is driver-side
    d^2 flops — NO cluster pass per iteration (cheaper than k-means);
    the projection is whole-stage codegen with mu/v inline literals.
    Returns (id_col, pc1 DOUBLE).
    """
    rows = scatter_cells(df, scale=scale, vec_col=vec_col).collect()
    if not rows:
        raise ValueError("power_iteration_pc1: no non-null vectors")
    n, mu, v = pc1_from_cells(rows, iters=iters)
    return project_pc1(
        _quantized(df, scale=scale, id_col=id_col, vec_col=vec_col),
        mu, v, id_col=id_col,
    )


def _quantized(df: DataFrame, scale: int = 1_000_000,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(id, qv BIGINT[], qd DOUBLE[]): the shared quantized view every
    exact-arithmetic vector operator starts from."""
    qv = F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * F.lit(scale))
    )
    return (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col), qv.alias("qv"))
        .withColumn("qd", F.transform(F.col("qv"), lambda x: x.cast("double")))
    )


def scatter_cells(df: DataFrame, scale: int = 1_000_000,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """The exact sufficient statistics of the scatter matrix as a
    d(d+1)/2 + d cell frame: (i, j, S DECIMAL(38,0), nn BIGINT) with
    j = -1 rows carrying the linear sums. ADDITIVE — two corpora's
    cells merge by summation with zero error, which is what makes the
    streaming incremental twin (streaming/sinks.py::
    maintain_scatter_stats) bit-exact against this batch pass."""
    from ..queries._helpers import spread

    base = _quantized(df, scale=scale, id_col=id_col, vec_col=vec_col)
    # spread(): the d(d+1)/2-per-row pair explode is the compute-heavy
    # narrow stage; the fixture's single-row-group scan would run it on
    # one task (same parallelism decoupling as embedding_covariance)
    cells = spread(base).select(F.explode(F.expr("""
      concat(
        flatten(transform(sequence(0, size(qv) - 1),
          i -> transform(sequence(i, size(qv) - 1),
            j -> struct(i AS i, j AS j,
                        element_at(qv, i + 1) * element_at(qv, j + 1) AS p)))),
        transform(sequence(0, size(qv) - 1),
          i -> struct(i AS i, -1 AS j, element_at(qv, i + 1) AS p)))
    """)).alias("s"))
    return (
        cells.select("s.i", "s.j", "s.p")
        .groupBy("i", "j")
        .agg(
            F.sum(F.col("p").cast("decimal(38,0)")).alias("S"),
            F.count("*").alias("nn"),
        )
    )


def pc1_from_cells(rows, iters: int = 3):
    """Driver-side power iteration over collected scatter cells with
    the bit-pinned fold order; returns (n, mu, v)."""
    import math

    n = int(rows[0]["nn"])
    s_lin = {r["i"]: int(r["S"]) for r in rows if r["j"] == -1}
    d = len(s_lin)
    # explicit driver-size contract (the pq_ann_topk max_queries
    # convention): the collected frame is the d(d+1)/2 + d statistics
    # grid, NEVER data-sized — a violation means a caller collected
    # something that isn't a scatter-cell frame
    expected = d * (d + 1) // 2 + d
    if len(rows) != expected:
        raise ValueError(
            f"pc1_from_cells: got {len(rows)} rows for dim {d}; a "
            f"scatter-cell frame has exactly {expected} (fixed-size "
            "statistics, not data) — refusing a data-sized collect"
        )
    M = [[0.0] * d for _ in range(d)]
    for r in rows:
        if r["j"] < 0:
            continue
        c = float(n * int(r["S"]) - s_lin[r["i"]] * s_lin[r["j"]])
        M[r["i"]][r["j"]] = M[r["j"]][r["i"]] = c
    v = [1.0] * d
    for _ in range(iters):
        w = []
        for i in range(d):
            acc = 0.0
            for k in range(d):
                acc = acc + M[i][k] * v[k]
            w.append(acc)
        acc2 = 0.0
        for x in w:
            acc2 = acc2 + x * x
        norm = math.sqrt(acc2)
        v = [x / norm for x in w]
    mu = [float(s_lin[i]) / float(n) for i in range(d)]
    return n, mu, v


def project_pc1(base: DataFrame, mu: list, v: list,
                id_col: str = "vec_id") -> DataFrame:
    """Map-only projection (x - mu) . v over the quantized view, with
    mu/v inlined as literals and the 0.0-seeded left-to-right fold.
    The literal arrays go in as ONE parsed SQL string (repr() is the
    shortest round-trip decimal, bit-identical after parse) — the
    kmeans_exact_assign py4j-cost lesson applied here too."""
    mu_sql = "array(" + ", ".join(f"{m!r}D" for m in mu) + ")"
    v_sql = "array(" + ", ".join(f"{x!r}D" for x in v) + ")"
    pc1 = F.expr(
        f"aggregate(zip_with(zip_with(qd, {mu_sql}, (x, m) -> x - m), "
        f"{v_sql}, (a, b) -> a * b), 0.0D, (a, t) -> a + t)"
    )
    return base.select(F.col(id_col), pc1.alias("pc1"))


def topk_from_cells(rows, k: int = 2, iters: int = 3):
    """Driver-side top-k principal directions by DEFLATED power
    iteration over collected scatter cells, every fold bit-pinned
    (the pc1_from_cells recipe extended per VERDICT r5 item 4):

    * component c: ``iters`` rounds of v <- normalize(M_c v) from the
      all-ones start, 0.0-seeded left-to-right folds;
    * deflate: w = M_c v (same fold), lambda = 0.0 + sum_i v[i]*w[i],
      M_{c+1}[i][j] = M_c[i][j] - lambda * v[i] * v[j] — one rounding
      per multiply, left-associative, so a SQL engine writing the
      identical expression lands on the same bits.

    Returns (n, mu, [v_1..v_k])."""
    import math

    n = int(rows[0]["nn"])
    s_lin = {r["i"]: int(r["S"]) for r in rows if r["j"] == -1}
    d = len(s_lin)
    M = [[0.0] * d for _ in range(d)]
    for r in rows:
        if r["j"] < 0:
            continue
        c = float(n * int(r["S"]) - s_lin[r["i"]] * s_lin[r["j"]])
        M[r["i"]][r["j"]] = M[r["j"]][r["i"]] = c

    def matvec(mat, vec):
        out = []
        for i in range(d):
            acc = 0.0
            for kk in range(d):
                acc = acc + mat[i][kk] * vec[kk]
            out.append(acc)
        return out

    def power(mat):
        v = [1.0] * d
        for _ in range(iters):
            w = matvec(mat, v)
            acc2 = 0.0
            for x in w:
                acc2 = acc2 + x * x
            norm = math.sqrt(acc2)
            v = [x / norm for x in w]
        return v

    vs = []
    for comp in range(k):
        v = power(M)
        vs.append(v)
        if comp + 1 < k:
            w = matvec(M, v)
            lam = 0.0
            for i in range(d):
                lam = lam + v[i] * w[i]
            M = [
                [M[i][j] - lam * v[i] * v[j] for j in range(d)]
                for i in range(d)
            ]
    mu = [float(s_lin[i]) / float(n) for i in range(d)]
    return n, mu, vs


def project_pcs(base: DataFrame, mu: list, vs: list[list],
                id_col: str = "vec_id", prefix: str = "pc") -> DataFrame:
    """Map-only multi-component projection (x - mu) . v_c, literals via
    one parsed SQL string per component (the project_pc1 idiom)."""
    mu_sql = "array(" + ", ".join(f"{m!r}D" for m in mu) + ")"
    cols = [F.col(id_col)]
    for c, v in enumerate(vs, start=1):
        v_sql = "array(" + ", ".join(f"{x!r}D" for x in v) + ")"
        cols.append(F.expr(
            f"aggregate(zip_with(zip_with(qd, {mu_sql}, (x, m) -> x - m), "
            f"{v_sql}, (a, b) -> a * b), 0.0D, (a, t) -> a + t)"
        ).alias(f"{prefix}{c}"))
    return base.select(*cols)


def power_iteration_topk(df: DataFrame, k: int = 2, iters: int = 3,
                         scale: int = 1_000_000, id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Top-k principal projections under the exact-arithmetic recipe:
    one scatter-cell pass (cluster-side, d^2 cells cross the shuffle),
    driver-side deflated power iteration (O(k * iters * d^2) flops, no
    cluster pass per iteration), one map-only projection. Returns
    (id_col, pc1..pck DOUBLE), bit-identical in any engine that writes
    the same folds (DuckDB oracle in queries/vectors.py)."""
    rows = scatter_cells(df, scale=scale, vec_col=vec_col).collect()
    if not rows:
        raise ValueError("power_iteration_topk: no non-null vectors")
    n, mu, vs = topk_from_cells(rows, k=k, iters=iters)
    return project_pcs(
        _quantized(df, scale=scale, id_col=id_col, vec_col=vec_col),
        mu, vs, id_col=id_col,
    )
