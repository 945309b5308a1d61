"""Round-13 optimization pins: the mechanisms the r13 changes rely on
(each was measured before being kept; these tests keep them true).

- MinHash signatures run through ONE MapInArrow node (the pandas_udf
  Arrow->pandas per-row materialization is gone);
- the portable band key is a struct of packed longs whose equality is
  EXACTLY minima-tuple equality (bijective packing), so the candidate
  set is bit-identical to the old comma-joined string key's;
- the identical-signature fast-path probe rides the collapse
  materialize as an Observation metric (no separate agg job at
  DataFrame construction).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dynamic_etl_pipeline_spark.operators.dedup import (
    band_postings,
    minhash_lsh_pairs,
    minhash_signatures,
)
from dynamic_etl_pipeline_spark.plans.inspect import formatted_plan


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"some shared words plus token{i} marker{i % 7} tail{i}")
        for i in range(40)
    ]
    # two exact duplicate pairs so the collapse slow path runs
    rows += [(100, rows[0][1]), (101, rows[1][1])]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_minhash_signatures_single_mapinarrow_node(spark, docs):
    sigs = minhash_signatures(docs, "doc_id", "text", udf_partitions=4)
    plan = formatted_plan(sigs)
    assert plan.count("MapInArrow") >= 1, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_portable_band_struct_key_matches_string_key_candidates(spark, docs):
    """The struct-packed portable band key must produce EXACTLY the
    string key's candidate pairs: packing (m_lo * 2^31 + m_hi) is
    injective for minima < 2^31, so (band_id, struct) equality ==
    (band_id, minima-tuple) equality == the old string equality."""
    sigs = minhash_signatures(
        docs, "doc_id", "text", udf_partitions=2, portable_hash=True
    ).localCheckpoint()
    bands, r = 16, 4
    new = band_postings(sigs, "doc_id", bands, r, portable=True)
    # the pre-r13 string form, built inline
    old = sigs.select(
        F.col("doc_id").alias("_id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.concat_ws(",", F.slice("sig", b * r + 1, r)),
            )
        ).alias("band_id", "band_hash"),
    )

    def pairs(posts):
        l = posts.select(F.col("_id").alias("a"), "band_id", "band_hash")
        rr = posts.select(F.col("_id").alias("b"), "band_id", "band_hash")
        return {
            (x["a"], x["b"])
            for x in l.join(rr, ["band_id", "band_hash"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
            .collect()
        }

    got, want = pairs(new), pairs(old)
    assert got == want and len(got) > 0


def test_collapse_probe_is_observation_not_extra_job(spark, docs):
    """The max(_gn) fast-path probe rides the collapse materialize as
    an Observation metric: constructing minhash_lsh_pairs (collapse
    path, no posting cap) fires exactly as many jobs as the collapse
    materialize alone (AQE may split one action into several stage-
    materialization jobs, so the pin is the DELTA, not an absolute).
    One extra job means the probe regressed to a separate agg action."""
    from pyspark.sql import Window

    from dynamic_etl_pipeline_spark.materialize import materialize
    from dynamic_etl_pipeline_spark.operators.dedup import (
        minhash_signatures as _sigs,
    )

    sc = spark.sparkContext

    def jobs_in(group, fn):
        sc.setJobGroup(group, group)
        try:
            out = fn()
        finally:
            sc.setJobGroup(None, None)
        return out, len(sc.statusTracker().getJobIdsForGroup(group))

    def collapse_materialize_only():
        s = _sigs(docs, "doc_id", "text", udf_partitions=2)
        w = Window.partitionBy("sig")
        return materialize(s.select(
            "doc_id", "sig",
            F.min("doc_id").over(w).alias("_rep"),
            F.count("*").over(w).alias("_gn"),
        ))

    _, n_mat = jobs_in("r13_mat_only", collapse_materialize_only)
    df, n_constr = jobs_in(
        "r13_constr",
        lambda: minhash_lsh_pairs(
            docs, "doc_id", "text", udf_partitions=2,
            max_postings_per_band=None,
        ),
    )
    assert n_constr == n_mat, (n_constr, n_mat)
    # and the duplicate groups were detected (slow path: expansion ran)
    pairs = {(r["id_a"], r["id_b"]) for r in df.collect()}
    assert (0, 100) in pairs and (1, 101) in pairs
