"""Partition-count independence: the float-parity story (_helpers.dsum
decimal accumulation) claims results are bit-identical at ANY
parallelism. That claim is what makes the DuckDB oracle comparison
meaningful and what guarantees a 1000-executor run reproduces the
32-thread run — so pin it: run float-aggregating queries under
different shuffle-partition counts and require exact equality.
"""

from __future__ import annotations

import pytest

from dynamic_etl_pipeline_spark.queries import QUERIES

# Queries whose results would drift under partition-order-dependent
# double summation if dsum/davg regressed to plain sum/avg.
FLOAT_AGG_QUERIES = [
    "q1_pricing_summary",
    "q8_market_share",
    "q14_promo_revenue",
    "events_user_stats",
]


def _rows(spark, name, sf_dir, partitions: int):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        df = QUERIES[name](spark, sf_dir)
        return sorted(map(tuple, df.collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.mark.parametrize("name", FLOAT_AGG_QUERIES)
def test_results_identical_across_parallelism(spark, sf_dir, name):
    a = _rows(spark, name, sf_dir, 3)
    b = _rows(spark, name, sf_dir, 32)
    assert a == b, f"{name} drifts with partition count"
