"""GROUPS-frame emulation (queries/windows.py::window_groups_frame):
neither Spark nor DuckDB 1.0 implements SQL:2011 GROUPS mode, so the
dense-rank decomposition is proven against a pure-Python reference
that walks peer groups directly — randomized partitions, tie
densities, and gap patterns."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _ref_groups_frame(rows, preceding=1, following=1):
    """rows: [(id, part, okey, val)] -> {id: (n_in_groups, sum_val)}
    under GROUPS BETWEEN preceding PRECEDING AND following FOLLOWING
    ordered by okey within part."""
    out = {}
    parts = {}
    for rid, part, okey, val in rows:
        parts.setdefault(part, []).append((okey, rid, val))
    for part, members in parts.items():
        keys = sorted({k for k, _, _ in members})
        group_of = {k: i for i, k in enumerate(keys)}
        by_group = {}
        for k, rid, val in members:
            by_group.setdefault(group_of[k], []).append((rid, val))
        for gi, rws in by_group.items():
            lo, hi = gi - preceding, gi + following
            frame = [
                (rid2, v2)
                for gj in range(lo, hi + 1)
                for rid2, v2 in by_group.get(gj, [])
            ]
            n = len(frame)
            s = sum(v for _, v in frame)
            for rid, _ in rws:
                out[rid] = (n, s)
    return out


def test_groups_frame_matches_python_reference(spark):
    rng = random.Random(11)
    # okeys with deliberate gaps + heavy ties; several partitions
    rows = []
    rid = 0
    for part in ("a", "b", "c"):
        for _ in range(rng.randint(30, 80)):
            okey = rng.choice([1, 2, 3, 7, 8, 20, 21, 22, 50])
            rows.append((rid, part, okey, rng.randint(-100, 100)))
            rid += 1
    df = spark.createDataFrame(rows, ["event_id", "event_type", "okey", "cents"])

    from pyspark.sql import Window

    w_dr = Window.partitionBy("event_type").orderBy("okey")
    r = df.withColumn("dr", F.dense_rank().over(w_dr))
    g = r.groupBy("event_type", "dr").agg(
        F.count("*").alias("g_n"), F.sum("cents").alias("g_cents")
    )
    w_g = Window.partitionBy("event_type").orderBy("dr").rowsBetween(-1, 1)
    f = g.select(
        "event_type", "dr",
        F.sum("g_n").over(w_g).alias("n"),
        F.sum("g_cents").over(w_g).alias("s"),
    )
    got = {
        rr["event_id"]: (rr["n"], rr["s"])
        for rr in r.join(f, ["event_type", "dr"]).collect()
    }
    assert got == _ref_groups_frame(rows)


def test_groups_frame_query_oracle_shape(spark, sf_dir):
    from dynamic_etl_pipeline_spark.queries.windows import window_groups_frame

    out = window_groups_frame(spark, sf_dir)
    rows = out.collect()
    assert rows and all(
        r["n_in_groups"] >= 1 and r["cents_in_groups"] is not None
        for r in rows
    )
