"""Bucketed tables: shuffle-free co-located joins (SURVEY §4).

At 100 TB the dominant cost of a repeated fact⋈fact join is re-shuffling
both sides on every query. Writing both tables bucketed (and sorted) by
the join key pins co-location at rest: Spark's bucketed scan exposes the
hash partitioning to the planner and the sort-merge join runs with ZERO
Exchange nodes (asserted in tests/test_bucketing.py).

Bucket count is a layout decision: pick ~(table size / healthy
partition size) and keep it identical on both join sides; mismatched
counts fall back to shuffling one side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys: list[str],
                   buckets: int = 8, sorted_by: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed (+optionally sorted) managed table."""
    writer = df.write.mode(mode).bucketBy(buckets, *keys)
    if sorted_by is None:
        sorted_by = keys
    if sorted_by:
        writer = writer.sortBy(*sorted_by)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket keys; with aligned
    bucket counts the plan contains no shuffle exchange."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
