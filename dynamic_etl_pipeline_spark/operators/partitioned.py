"""Hive-style partitioned table layout: the at-rest sharding that makes
partition pruning work at 100 TB.

The reference's single SQLite table (app.py:68-74) has no layout at
all; the Spark-native answer is directory partitioning on a low-
cardinality key (day, source, schema version) so that WHERE clauses on
the partition key never touch non-matching files — the scan's
PartitionFilters prune entire directories before any IO. Pair with
dynamic partition overwrite for idempotent per-day backfills: rewriting
one day replaces only that day's directory, never the full table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      mode: str = "overwrite",
                      dynamic: bool = True) -> None:
    """Write a directory-partitioned parquet table.

    With ``dynamic=True`` and mode=overwrite, only partitions present
    in ``df`` are replaced (Spark's dynamic partitionOverwriteMode) —
    the idempotent-backfill contract. Static overwrite (``dynamic=
    False``) truncates the whole table first.
    """
    spark = df.sparkSession
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(conf_key, "static")
    spark.conf.set(conf_key, "dynamic" if dynamic else "static")
    try:
        (
            df.write.mode(mode)
            .partitionBy(*partition_cols)
            .parquet(path)
        )
    finally:
        spark.conf.set(conf_key, prev)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned table; partition-key filters applied by the
    caller prune directories (verify via scan's PartitionFilters)."""
    return spark.read.option("basePath", path).parquet(path)
