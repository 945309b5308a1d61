"""Bloom-filter semi-join pruning (runtime row-level filtering).

The 100 TB problem this solves: a selective dimension/delete-set/probe
list should cut the fact scan down BEFORE the shuffle, not after. A
broadcast hash join does that only when Catalyst picks it; a Bloom
filter does it unconditionally, at ~10 bits/key, with a probe that is
pure map-side bit arithmetic — the same mechanism as Spark's internal
runtime row-level filtering (spark.sql.optimizer.runtime.bloomFilter),
which is not exposed as a public function, so the engine carries its
own, built from public primitives only:

- build: k = ``num_hashes`` positions per key via seeded xxhash64,
  folded into an m-bit bitmap with ``bit_or`` grouped by 64-bit word —
  one small aggregation, output m/64 rows regardless of build size;
- probe: the word array rides into the plan as a literal (a broadcast
  in spirit); membership is AND over k bit tests — whole-stage codegen,
  no UDF, no shuffle, no join.

False positives pass the filter (it's a PRE-filter; the exact join
downstream removes them); false negatives are impossible — asserted in
tests/test_bloom.py against the exact semi join.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Bitmap-size cap for bloom_semi_filter: beyond this the word array
# rides into the plan as a multi-MB literal (1M words = 8 MB at the
# default cap) and driver-side literal construction grows linearly
# with the build side — at that point a plain shuffled left-semi join
# is the better plan, so the helper falls back to one.
MAX_BLOOM_BITS = 1 << 26  # 1M int64 words ~ 8 MB plan literal


def optimal_params(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """Standard Bloom sizing: m = -n ln(p) / ln(2)^2 bits (rounded up
    to a whole word), k = m/n ln(2) hashes."""
    n_keys = max(n_keys, 1)
    m = int(-n_keys * math.log(fpp) / (math.log(2) ** 2))
    m = max(64, ((m + 63) // 64) * 64)
    k = max(1, round(m / n_keys * math.log(2)))
    return m, k


def _positions(col: Column, num_bits: int, num_hashes: int) -> list[Column]:
    # double hashing (Kirsch-Mitzenmacher): pos_i = h1 + i*h2 mod m —
    # two 64-bit hashes generate all k probe positions
    h1 = F.xxhash64(col)
    h2 = F.xxhash64(col, F.lit(1337))
    return [
        F.pmod(h1 + F.lit(i) * h2, F.lit(num_bits)).cast("int")
        for i in range(num_hashes)
    ]


def build_bloom(df: DataFrame, key: Column | str,
                num_bits: int = 1 << 16, num_hashes: int = 7) -> list[int]:
    """Aggregate the build side into an m-bit Bloom bitmap, returned as
    m/64 driver-side words (the collected size is m/64 rows no matter
    how many build keys there are). NULL keys are skipped (SQL NULL
    never equals anything, so a semi join drops them too)."""
    c = F.col(key) if isinstance(key, str) else key
    pos = F.explode(F.array(*_positions(c, num_bits, num_hashes))).alias("pos")
    words = (
        df.filter(c.isNotNull())
        .select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            # call_function: the DSL shiftleft only takes a literal shift
            F.call_function(
                "shiftleft", F.lit(1).cast("bigint"),
                F.pmod(F.col("pos"), F.lit(64)).cast("int"),
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    out = [0] * (num_bits // 64)
    for r in words:
        out[r["word_idx"]] = r["word"]
    return out


def _word_array_lit(words: list[int]) -> Column:
    """The bitmap as ONE plan literal with a PINNED element type.

    Two traps live here (ADVICE r8):

    - ``F.lit(list_of_ints)`` recurses to one ``lit()`` Py4J call per
      element on classic PySpark 4.1 — driver cost linear in the build
      side (measured 8.6 s for 20,833 words). ``F.lit(ndarray)`` ships
      the whole array in one call (2.8 s for the same bitmap; the old
      per-word ``F.array(*[F.lit(w) ...])`` form was 34 s).
    - the element type must be int64: when every word happens to fit
      int32, list inference yields ArrayType(IntegerType), and
      ``shiftright`` on an int32 word masks the shift amount mod 32 —
      bit tests at positions >= 32 silently read the wrong bit (a real
      false NEGATIVE: word -2**31 probed at bit 35 returns 0 where the
      bigint array returns 1, violating the module contract).
      ``np.int64`` pins ArrayType(LongType) regardless of the values.
    """
    return F.lit(np.array([int(w) for w in words], dtype=np.int64))


def might_contain(key: Column | str, words: list[int],
                  num_hashes: int = 7) -> Column:
    """Membership predicate against a built bitmap: AND of k bit tests,
    each one element_at + shift + mask on the literal word array —
    map-only codegen. NULL keys test false (matching semi-join
    semantics)."""
    c = F.col(key) if isinstance(key, str) else key
    num_bits = len(words) * 64
    arr = _word_array_lit(words)
    cond = c.isNotNull()
    for p in _positions(c, num_bits, num_hashes):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftright", word, F.pmod(p, F.lit(64)).cast("int")
        ).bitwiseAND(F.lit(1).cast("bigint"))
        cond = cond & (bit == 1)
    return cond


def bloom_semi_filter(probe: DataFrame, build: DataFrame,
                      probe_key: str, build_key: str | None = None,
                      fpp: float = 0.01,
                      max_bits: int = MAX_BLOOM_BITS) -> DataFrame:
    """Pre-filter ``probe`` to (a superset of) rows whose key appears in
    ``build`` — the Bloom analogue of a left-semi join, meant to run
    BEFORE an exact join/shuffle so the shuffle carries ~fpp extra rows
    instead of the whole fact table. Sizing is derived from the build
    side's exact key count (one cheap countDistinct on the small side).

    When the build side is large enough that sizing wants more than
    ``max_bits`` bits (default ~1M words / 8 MB of plan literal — the
    point where collecting + re-shipping the bitmap stops being "small
    side" economics), the helper falls back to a plain shuffled
    left-semi join: exact (a strict subset of what the Bloom filter
    would pass, so downstream results are unchanged) and free of any
    driver-side state. The fallback path is unit-tested in
    tests/test_bloom.py."""
    build_key = build_key or probe_key
    n = build.select(build_key).filter(
        F.col(build_key).isNotNull()
    ).distinct().count()
    num_bits, k = optimal_params(n, fpp)
    if num_bits > max_bits:
        # Qualify the build side through a frame alias so the join
        # condition binds unambiguously even if the probe lineage
        # already carries a column of the same name (e.g. a prior
        # bloom_semi_filter fallback in the same plan) — ADVICE r9.
        b = (
            build.select(F.col(build_key).alias("_bloom_bk"))
            .filter(F.col("_bloom_bk").isNotNull())
            .alias("_bloom_build")
        )
        return probe.join(
            b,
            probe[probe_key] == F.col("_bloom_build._bloom_bk"),
            "left_semi",
        )
    words = build_bloom(build, build_key, num_bits, k)
    return probe.filter(might_contain(probe_key, words, k))
