"""Measure kmeans_exact_fit's driver-side centroid-state costs as a
function of k*dim (VERDICT r10 item 2).

Three per-iteration costs in kmeans_exact_fit ride on k*dim, not on
corpus size:
  1. the (cluster, dim)-cell update COLLECT — k*dim Rows through py4j
     per Lloyd's iteration;
  2. the centroid CLOSURE — k*dim float64 serialized into every
     assignment task (Arrow kernel) or inlined into the SQL literal
     tree (HOF path, which additionally PARSES a k*dim-literal string);
  3. the driver-side new_mu dict rebuild (pure Python, k*dim floats).

The sqrt-k semdedup twin ties k to ceil(sqrt(n)), so these grow with
the corpus: k*dim = 28.7k cells at the 100x smoke corpus (448*64), and
~2M cells at n=1e9 docs / dim 64. This tool measures each cost at
synthetic k*dim points DECOUPLED from corpus size (tiny 1k-row base
frame), which is exactly the right experiment: the question is where
the DRIVER becomes the bottleneck, not the executors.

The measured numbers set _KMEANS_MAX_STATE_CELLS in operators/knn.py
(guard convention: trip with a pointer + env override) and the
SCALING.md r11 note.

r12 (VERDICT r11 item 1): each point now also measures the FRAMES
state path's per-iteration costs — the k-row centroid-array collect +
matrix copy + TorrentBroadcast creation (its whole driver footprint)
and an assignment pass reading the matrix from the broadcast instead
of the closure — so the collect->frames crossover in SCALING.md r12
is a measured number, not a guess.

Usage: python tools/bench_kmeans_state.py [--cells 28672,262144,...]
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    cells_list = [28_672, 262_144, 1_048_576, 4_194_304]
    for a in sys.argv[1:]:
        if a.startswith("--cells"):
            v = a.split("=", 1)[1] if "=" in a else sys.argv[
                sys.argv.index(a) + 1]
            cells_list = [int(x) for x in v.split(",")]

    import numpy as np
    from pyspark.sql import functions as F

    from dynamic_etl_pipeline_spark.operators.knn import (
        _kmeans_exact_assign,
    )
    from dynamic_etl_pipeline_spark.session import get_spark

    spark = get_spark("bench-kmeans-state")
    dim = 64
    rng = np.random.default_rng(7)

    # tiny base frame: executor work is negligible, driver costs dominate
    base_rows = [(int(i), [float(x) for x in rng.integers(0, 1000, dim)])
                 for i in range(1_000)]
    base = spark.createDataFrame(base_rows, "vec_id long, qd array<double>")
    base = base.cache()
    base.count()

    # warm the Arrow worker pool once
    _kmeans_exact_assign(base, [[0.0] * dim] * 8, arrow=True).write.format(
        "noop").mode("overwrite").save()

    results = []
    for cells in cells_list:
        k = cells // dim
        mu = [[float(x) for x in rng.integers(0, 1000, dim)]
              for _ in range(k)]

        # cost 2: one assignment pass with the k*dim closure (Arrow)
        t0 = time.perf_counter()
        _kmeans_exact_assign(base, mu, arrow=True).write.format(
            "noop").mode("overwrite").save()
        t_assign = time.perf_counter() - t0

        # cost 1: the per-iteration cell collect — k*dim (cluster, i,
        # s, c) rows through py4j, same shape as the update aggregate
        cells_df = spark.range(cells).select(
            (F.col("id") % k).cast("int").alias("cluster_id"),
            (F.col("id") / k).cast("int").alias("i"),
            (F.col("id") * 37).alias("s"),
            F.lit(100).cast("long").alias("c"),
        )
        t0 = time.perf_counter()
        rows = cells_df.collect()
        t_collect = time.perf_counter() - t0

        # cost 3: the driver-side new_mu rebuild over those rows
        t0 = time.perf_counter()
        new_mu: dict[int, list[float]] = {}
        for r in rows:
            new_mu.setdefault(r["cluster_id"], [0.0] * dim)[r["i"]] = (
                float(r["s"]) / float(r["c"])
            )
        t_rebuild = time.perf_counter() - t0

        # FRAMES path (r12) — cost A: an assignment pass reading the
        # matrix from a TorrentBroadcast instead of the closure
        m_np = np.asarray(mu, dtype=np.float64)
        bc = spark.sparkContext.broadcast(m_np)
        t0 = time.perf_counter()
        _kmeans_exact_assign(base, bc).write.format("noop").mode(
            "overwrite").save()
        t_assign_bc = time.perf_counter() - t0

        # FRAMES path — cost B: the per-iteration driver footprint =
        # k compact array rows collected + matrix copy + new broadcast
        # (the cell aggregate itself never reaches the driver). Same
        # row shape the frames update produces: (cluster_id, mu array).
        cent_df = spark.range(k).select(
            F.col("id").cast("int").alias("cluster_id"),
            F.expr(f"transform(sequence(1, {dim}), "
                   "j -> CAST(id * 37 + j AS DOUBLE))").alias("mu"),
        )
        t0 = time.perf_counter()
        cent_rows = cent_df.collect()
        new_m = m_np.copy()
        for r in cent_rows:
            new_m[r["cluster_id"]] = r["mu"]
        bc2 = spark.sparkContext.broadcast(new_m)
        t_frames_iter = time.perf_counter() - t0
        bc.unpersist(blocking=False)
        bc2.unpersist(blocking=False)

        rec = {
            "cells": cells, "k": k, "dim": dim,
            "closure_mb": round(cells * 8 / 1e6, 1),
            "assign_pass_sec": round(t_assign, 2),
            "cell_collect_sec": round(t_collect, 2),
            "mu_rebuild_sec": round(t_rebuild, 2),
            "per_iter_driver_sec": round(t_collect + t_rebuild, 2),
            "frames_assign_pass_sec": round(t_assign_bc, 2),
            "frames_per_iter_driver_sec": round(t_frames_iter, 2),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
