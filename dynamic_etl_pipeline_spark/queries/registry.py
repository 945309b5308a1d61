"""Query registry: the driver-facing catalog of (name -> query, oracle).

Every operator the engine claims is registered here as a callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a DuckDB
oracle SQL string over the same parquet views. Parity conventions
(applied on BOTH sides so the driver's order-insensitive value-hash
matches):

- every computed column is aliased identically;
- computed floats are rounded (``round(x, N)``) — raw columns are not;
- DuckDB integer results are cast to Spark's narrower types
  (``count`` stays BIGINT; ``year()``/``length()``/``row_number()``
  are cast to INT; ``sum(BIGINT)`` is cast back to BIGINT since DuckDB
  widens to HUGEINT);
- LIMIT queries order by a deterministic key (rounded measure + unique
  tie-break) on both sides.
- PREFER unrounded output when the value is already bit-deterministic
  (exact-decimal sums, or divisions of identical doubles): round() at
  an exact half-way point is where the engines' double-rounding
  strategies disagree (HALF_UP on the exact BigDecimal vs double
  arithmetic) — events_gap_fill hit this at sf0.1. Round only to
  *stabilize* a value that would otherwise differ, never as a final
  cosmetic step on an already-identical one.
- DECIMAL-cast ONLY raw measure columns, never derived doubles: the
  round-5 cast fuzz family measured the boundary (pinned in
  tests/test_differential.py). For doubles whose decimal expansion is
  exact at the target scale, both engines round half-away-from-zero
  and agree; for derived doubles inexact at the scale (price * 0.3 —
  even price * 0.25), Spark's shortest-repr HALF_UP and DuckDB's
  conversion disagree on ~0.2% of rows.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query callable and (optionally) its DuckDB oracle SQL."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
