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


def normalize_event_ts(df: DataFrame, ntz: bool = True) -> DataFrame:
    """Take ``ts`` to a microsecond timestamp; NTZ by default for oracle
    parity, ``ntz=False`` for TIMESTAMP (streaming watermarks reject NTZ).

    Fixture generations differ: ts can arrive as long nanos (when the
    parquet stores timestamp[ns], which session.RUNTIME_CONF reads via
    nanosAsLong) or as a native timestamp[us]. Branch on the read dtype
    so both layouts normalize identically; the integer DIV truncation
    matches DuckDB's ns->us conversion. Session tz is UTC, so naive
    values agree between the two flavors.
    """
    from pyspark.sql.types import LongType

    target = "timestamp_ntz" if ntz else "timestamp"
    if isinstance(df.schema["ts"].dataType, LongType):
        ts = F.timestamp_micros(F.expr("ts DIV 1000"))
    else:
        ts = F.col("ts")
    return df.withColumn("ts", ts.cast(target))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = normalize_event_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
