"""Skew mitigation (SURVEY §4 / the 100 TB stance).

AQE's skew-join handling re-splits oversized SORT-MERGE join partitions
at runtime (enabled in session.py), but two skew shapes still need
explicit treatment at corpus scale:

- a skewed AGGREGATION key (one user/domain/dedup-cluster with 10^8
  rows lands on one reducer): two-phase salted aggregation spreads the
  partial aggregate over ``salt_buckets`` reducers, then merges — both
  phases stay map-side-combinable hash aggregates;
- a skewed JOIN key against a non-broadcastable build side: salt the
  probe side, replicate the build side once per salt value, join on
  (key, salt). Replication factor = salt_buckets, bounded and chosen by
  the caller.

Both transforms are result-identical to their unsalted forms (asserted
in tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(salt_buckets: int) -> Column:
    # deterministic per row content-independent spread: hashing the
    # physical row position spreads a hot key uniformly without needing
    # any column to be distinct
    return F.pmod(
        F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)
    )


def salted_agg(df: DataFrame, keys: list[str],
               sums: list[str] | None = None,
               counts: bool = True,
               salt_buckets: int = 32) -> DataFrame:
    """groupBy(keys) with count/sum aggregates, skew-safe.

    Phase 1 groups by (keys + salt) — the hot key's rows split across
    ``salt_buckets`` reducers; phase 2 merges the partials by the real
    keys (tiny input: one row per key per salt)."""
    sums = sums or []
    partial = (
        df.withColumn("_salt", _salt(salt_buckets))
        .groupBy(*keys, "_salt")
        .agg(
            F.count("*").alias("_pc"),
            *[F.sum(c).alias(f"_ps_{c}") for c in sums],
        )
    )
    final_aggs = []
    if counts:
        final_aggs.append(F.sum("_pc").alias("n"))
    final_aggs.extend(F.sum(f"_ps_{c}").alias(f"sum_{c}") for c in sums)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(skewed: DataFrame, other: DataFrame, on: str,
                how: str = "inner", salt_buckets: int = 8) -> DataFrame:
    """Equi-join where ``skewed`` has hot values of ``on`` and ``other``
    is too large to broadcast: probe side salted, build side replicated
    per salt, join on (on, salt). Output matches a plain join ONLY for
    probe-side-preserving join types: the build side is replicated
    ``salt_buckets`` times, so right/full outer would emit each
    unmatched build row once per salt value. Those types are rejected."""
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "semi",
               "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not result-identical under "
            f"build-side replication; use one of {sorted(allowed)}"
        )
    left = skewed.withColumn("_salt", _salt(salt_buckets))
    right = other.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<long>")),
    )
    return left.join(right, [on, "_salt"], how).drop("_salt")
