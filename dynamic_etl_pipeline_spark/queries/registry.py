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

# Machine-readable scale-honesty tags (round-7, verdict item 2): a
# query registered with ``baseline=...`` is a deliberate reference
# implementation — an exact-recall anchor or an engine-specific sketch
# — NOT the production path. The value names the scalable twin and the
# reason. tools/scale_smoke.py and COVERAGE.md surface these, and the
# quadratic ones also carry an input-size guard (guard_baseline below)
# so a user pointing them at a big corpus fails fast with the pointer
# instead of burning a cluster.
BASELINES: dict[str, str] = {}


def query(name: str, oracle: str | None = None,
          baseline: str | None = None):
    """Register a query callable and (optionally) its DuckDB oracle SQL.

    ``baseline``: mark this entry as a deliberate non-production
    reference (quadratic exact anchor / engine-specific sketch); the
    string names the scalable twin a production user should run.
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        if baseline is not None:
            BASELINES[name] = baseline
            fn.__baseline__ = baseline
        return fn

    return deco


class BaselineScaleError(ValueError):
    """Raised by guard_baseline when a deliberately-quadratic baseline
    query is pointed at an input above its documented bound."""


def guard_baseline(df: DataFrame, bound: int, name: str, twin: str) -> DataFrame:
    """Fail-fast input-size guard for O(n^2)-by-design baseline queries.

    Counts the input (one cheap scan — linear, vs the quadratic work it
    prevents) and raises with a pointer to the scalable twin when the
    row count exceeds ``bound``. Override for deliberate runs with
    SPARK_GRAFT_ALLOW_QUADRATIC=1. The bound is set ~10x above the
    largest sweep fixture so correctness sweeps never trip it while the
    100x smoke corpus always does.
    """
    import os

    if os.environ.get("SPARK_GRAFT_ALLOW_QUADRATIC") == "1":
        return df
    n = df.count()
    if n > bound:
        raise BaselineScaleError(
            f"{name} is a quadratic-by-design baseline (exact-recall "
            f"anchor); input has {n} rows > documented bound {bound}. "
            f"Use the scalable twin {twin}, or set "
            f"SPARK_GRAFT_ALLOW_QUADRATIC=1 to run it anyway."
        )
    return df
