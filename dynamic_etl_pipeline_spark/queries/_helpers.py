"""Shared helpers for oracle-parity query authoring.

Floating-point sums are order-dependent; Spark's partial aggregation and
DuckDB's parallel aggregation sum in different orders, so a plain
``sum(double)`` differs in the last ulps and can cross a rounding
boundary. ``dsum``/``davg`` therefore accumulate in exact DECIMAL (the
per-row double->decimal conversion is deterministic on both engines)
and cast the exact result back to double — bit-identical on both sides.

At 100 TB this costs nothing extra: decimal sum is still a map-side
partial + final hash aggregate, one shuffle, JVM codegen throughout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def c(col: Column | str) -> Column:
    return col if isinstance(col, Column) else F.col(col)


def spread(df: DataFrame, n: int | None = None) -> DataFrame:
    """Decouple compute parallelism from scan parallelism.

    The fixture parquet files are written as a single row group, and
    parquet splits only at row-group boundaries — so every scan is ONE
    task, and any compute-heavy narrow stage chained onto it (explode,
    higher-order shingle folds, Arrow UDFs) runs on one core. A row
    shuffle of the pre-explode rows is tiny compared to the work it
    parallelizes. On a real cluster the input is already many-partition
    and this becomes a partition-count sizing knob for UDF batching."""
    n = n or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Deterministic double-valued sum via exact decimal accumulation.

    DuckDB oracle equivalent:
    ``CAST(sum(CAST(x AS DECIMAL(27,{scale}))) AS DOUBLE)``
    """
    return F.sum(c(col).cast(f"decimal(27,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 4) -> Column:
    """Deterministic double-valued average (sum_exact / count_nonnull).

    DuckDB: ``CAST(sum(CAST(x AS DECIMAL(27,s))) AS DOUBLE) / count(x)``
    """
    return (dsum(col, scale) / F.count(c(col))).cast("double")


def ntz(literal: str) -> Column:
    """A TIMESTAMP_NTZ literal (fixture timestamps are read as NTZ)."""
    return F.expr(f"TIMESTAMP_NTZ '{literal}'")
