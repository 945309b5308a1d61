"""Fixture-table catalog: load the driver's parquet tables as DataFrames.

The reference stores records as JSON text blobs in a single SQLite table
(app.py:68-74); here the at-rest format is columnar parquet and reads go
through Spark's vectorized parquet reader, so predicate pushdown and
column pruning reach the scan for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import tune

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Dimension tables small enough to broadcast at any realistic scale factor
# (region/nation are bounded; supplier/part/customer are bounded at the
# fixture SFs — at true 100 TB scale only region/nation stay broadcast-able
# and Catalyst's size-based threshold makes that call per-plan).
SMALL_DIMS = {"region", "nation"}


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # ts arrives as long nanos (see session.RUNTIME_CONF): integer-divide
        # to micros (exactly what DuckDB's ns->us truncation does), then take
        # it as a naive (NTZ) timestamp for oracle parity. Session tz is UTC.
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
