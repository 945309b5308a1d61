"""Similarity search over embedding columns: exact brute-force top-k
(the baseline) and random-hyperplane LSH ANN (the 100 TB path).

Brute force is a broadcast of the query set + map-side scoring + one
shuffle for per-query top-k — correct at any corpus size as long as the
*query* set is broadcast-small. LSH replaces the full scan with an
equi-join on bucket signatures; recall is tested against the exact
baseline (tests/test_operators.py) rather than a SQL oracle, since the
bucketing depends on seeded hyperplanes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine


def cosine_topk(candidates: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` must carry (query_id_col, vec_col); it is broadcast.
    Self-matches (same id) are excluded when ids share a domain.
    """
    q = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qv")
    )
    scored = (
        candidates.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("_qid"))
        .select(
            F.col("_qid").alias(query_id_col),
            F.col(id_col),
            cosine(F.col("_qv"), F.col(vec_col)).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec_col: Column | str, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: one bit per plane (sign of the dot
    product), folded into a bigint bucket key — all JVM higher-order
    expressions, evaluated once per row inside codegen."""
    v = vec_col if isinstance(vec_col, Column) else F.col(vec_col)
    bits = []
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(v, lit_plane, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(
            F.when(dot >= 0, F.shiftleft(F.lit(1).cast("long"), i))
            .otherwise(F.lit(0).cast("long"))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_ann_topk(candidates: DataFrame, queries: DataFrame, k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 query_id_col: str = "query_id", dim: int = 64,
                 n_planes: int = 8, n_tables: int = 4,
                 seed: int = 42) -> DataFrame:
    """Approximate top-k: n_tables independent hyperplane signatures;
    candidates that share a bucket with the query in ANY table are
    scored exactly, then ranked.

    The cross join of brute force becomes an equi-join on
    (table_id, bucket) — at 100 TB the scored candidate set is
    ~corpus/2^n_planes per table instead of the full corpus.
    """
    def with_buckets(df: DataFrame, idc: str) -> DataFrame:
        buckets = F.array(*[
            lsh_bucket(vec_col, _hyperplanes(dim, n_planes, seed + t))
            for t in range(n_tables)
        ])
        return df.select(
            F.col(idc), F.col(vec_col),
            F.posexplode(buckets).alias("table_id", "bucket"),
        )

    cand_b = with_buckets(candidates, id_col)
    q_b = with_buckets(
        queries.select(F.col(query_id_col), F.col(vec_col)), query_id_col
    ).select(
        F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qv"),
        "table_id", "bucket",
    )
    matched = (
        cand_b.join(q_b, ["table_id", "bucket"])
        .filter(F.col(id_col) != F.col("_qid"))
        .select(F.col("_qid").alias(query_id_col), id_col, vec_col, "_qv")
        .dropDuplicates([query_id_col, id_col])
    )
    scored = matched.select(
        query_id_col, id_col,
        cosine(F.col("_qv"), F.col(vec_col)).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
    )


def _norm_rows(m: "np.ndarray") -> "np.ndarray":
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _centroid_assign_udf(centroids: "np.ndarray", top: int):
    """Arrow-batched numpy kernel: cosine-nearest `top` centroid ids per
    vector (one matmul per batch against the broadcast centroid matrix)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    cn = _norm_rows(centroids.astype(np.float64)).T  # (dim, n_centroids)

    @pandas_udf(ArrayType(IntegerType()))
    def assign(vecs: pd.Series) -> pd.Series:
        x = _norm_rows(np.stack([np.asarray(v, dtype=np.float64) for v in vecs]))
        scores = x @ cn  # (batch, n_centroids)
        if top == 1:
            return pd.Series([[int(i)] for i in scores.argmax(axis=1)])
        idx = np.argpartition(-scores, min(top, scores.shape[1] - 1), axis=1)[:, :top]
        return pd.Series([row.astype(int).tolist() for row in idx])

    return assign


def kmeans_centroids(df: DataFrame, n_centroids: int, kmeans_iters: int = 2,
                     seed: int = 42, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> "np.ndarray":
    """Distributed Lloyd's: centroids seeded from a hash-deterministic
    sample, refined by assign (Arrow-batched matmul against the
    broadcast centroid matrix) + re-center (groupBy mean) rounds — two
    narrow shuffles per iteration, only the (n_centroids, dim) matrix
    ever touches the driver. Shared by IVF search and diversity
    sampling."""
    centroids = np.stack([
        np.asarray(r[0], dtype=np.float64)
        for r in df.select(vec_col)
        .orderBy(F.xxhash64(F.col(id_col) + seed))
        .limit(n_centroids).collect()
    ])
    for _ in range(kmeans_iters):
        assign1 = _centroid_assign_udf(centroids, top=1)
        means = (
            df.select(
                assign1(F.col(vec_col))[0].alias("list_id"), vec_col
            )
            .groupBy("list_id")
            .agg(F.array(*[
                F.avg(F.col(vec_col)[i]) for i in range(centroids.shape[1])
            ]).alias("mean_vec"))
            .collect()
        )
        for r in means:  # lists that captured no vectors keep old centroid
            centroids[r["list_id"]] = np.asarray(r["mean_vec"], dtype=np.float64)
    return centroids


def diversity_sample(df: DataFrame, quota: int, n_clusters: int = 16,
                     kmeans_iters: int = 2, seed: int = 42,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Cluster-balanced (diversity) sampling: k-means the embedding
    space, then keep at most ``quota`` rows per cluster, chosen by a
    deterministic per-id hash — the semantic-coverage sampler a corpus
    pipeline uses instead of uniform sampling, which oversamples dense
    modes and starves rare ones.

    Output adds ``cluster_id`` and is at most n_clusters * quota rows.
    Scale shape: assignment is a map-only Arrow matmul against the
    broadcast centroid matrix; the quota cut is one window shuffle keyed
    by cluster (n_clusters keys — salt the window key if quota and
    cluster counts are both huge)."""
    centroids = kmeans_centroids(
        df, n_clusters, kmeans_iters=kmeans_iters, seed=seed,
        id_col=id_col, vec_col=vec_col,
    )
    assign1 = _centroid_assign_udf(centroids, top=1)
    assigned = df.withColumn("cluster_id", assign1(F.col(vec_col))[0])
    w = Window.partitionBy("cluster_id").orderBy(
        F.xxhash64(F.col(id_col) + seed), F.col(id_col)
    )
    return (
        assigned.withColumn("_dsrn", F.row_number().over(w))
        .filter(F.col("_dsrn") <= quota)
        .drop("_dsrn")
    )


def ivf_ann_topk(candidates: DataFrame, queries: DataFrame, k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 query_id_col: str = "query_id", n_centroids: int = 16,
                 n_probe: int = 4, kmeans_iters: int = 2,
                 seed: int = 42) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbors.

    Coarse quantizer: ``n_centroids`` centroids seeded from a hash-
    deterministic sample and refined with ``kmeans_iters`` rounds of
    distributed Lloyd's (assign via Arrow-batched matmul, re-center via
    groupBy mean — two narrow shuffles per round). Search: candidates
    live in exactly one inverted list; each query probes its ``n_probe``
    nearest lists, so scoring touches ~n_probe/n_centroids of the corpus
    via an equi-join on the list id — the same join-not-scan shape that
    holds at 100 TB, where the centroid matrix (KB-MB) broadcasts and
    lists are partition-parallel.
    """
    centroids = kmeans_centroids(
        candidates, n_centroids, kmeans_iters=kmeans_iters, seed=seed,
        id_col=id_col, vec_col=vec_col,
    )
    assign1 = _centroid_assign_udf(centroids, top=1)
    assign_probe = _centroid_assign_udf(centroids, top=n_probe)
    cand_lists = candidates.select(
        F.col(id_col), F.col(vec_col),
        assign1(F.col(vec_col))[0].alias("list_id"),
    )
    q_lists = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qv"),
        F.explode(assign_probe(F.col(vec_col))).alias("list_id"),
    )
    scored = (
        cand_lists.join(q_lists, "list_id")
        .filter(F.col(id_col) != F.col("_qid"))
        .select(
            F.col("_qid").alias(query_id_col), id_col,
            cosine(F.col("_qv"), F.col(vec_col)).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
    )
