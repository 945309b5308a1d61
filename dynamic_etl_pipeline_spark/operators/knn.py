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
