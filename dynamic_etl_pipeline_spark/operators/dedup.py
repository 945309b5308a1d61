"""Near-duplicate detection at corpus scale: MinHash-LSH, SimHash,
connected components, exact dedup (SURVEY §2.12, BASELINE north star).

The reference has no dedup of any kind; these are the LLM-data-pipeline
operators the driver contract adds. Everything is composed from
DataFrame primitives — explode / hash / groupBy / self-join on band
keys — so each stage is one shuffle, partition-parallel, and survives a
100 TB corpus:

- signatures: explode shingles -> one 32-bit base hash per shingle ->
  k permutation-mins as k aggregate expressions in ONE grouped agg
  (not k passes);
- candidate generation: self-join on (band_id, band_hash) — an
  equi-join on a uniform high-cardinality key, never an O(n^2) cross
  join;
- verification: candidates only, by signature agreement (and optionally
  exact n-gram Jaccard via queries/text.py's inverted-index join).

Hash choice: Spark's built-in xxhash64/hash (JVM, codegen). These are
engine-specific, so LSH results are checked by *property* (recall vs
the exact Jaccard baseline) rather than by DuckDB value-hash — the
driver records rows-only for these by design.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^61-1: permutation arithmetic stays in signed-64 range
# because the base hash is 32-bit (max |a*h + b| < 2^31 * 2^31 << 2^63).
_MERSENNE = (1 << 61) - 1


def shingle_ngrams(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (JVM higher-order
    ops; documents shorter than n words yield an empty set)."""
    c = col if isinstance(col, Column) else F.col(col)
    toks = F.split(F.trim(c), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def _perm_coeffs(num_perm: int, seed: int) -> list[tuple[int, int]]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 31, size=num_perm, dtype=np.int64)
    b = rng.integers(0, 1 << 31, size=num_perm, dtype=np.int64)
    return list(zip(a.tolist(), b.tolist()))


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       num_perm: int = 64, shingle_n: int = 3,
                       seed: int = 42) -> DataFrame:
    """(id, sig: array<bigint>[num_perm]) — one explode + ONE grouped
    aggregation computing all permutation minima simultaneously."""
    exploded = df.select(
        F.col(id_col).alias("_id"),
        F.explode(shingle_ngrams(text_col, shingle_n)).alias("shingle"),
    ).withColumn("h", F.hash("shingle").cast("long"))
    mins = [
        # pmod, not %: Java's signed remainder would fold negative base
        # hashes below every positive value, correlating all permutations
        # through sign(h) and wrecking the independence minhash needs
        F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(_MERSENNE)))
        .alias(f"m{i}")
        for i, (a, b) in enumerate(_perm_coeffs(num_perm, seed))
    ]
    agged = exploded.groupBy("_id").agg(*mins)
    return agged.select(
        F.col("_id").alias(id_col),
        F.array(*[f"m{i}" for i in range(num_perm)]).alias("sig"),
    )


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      num_perm: int = 64, bands: int = 16,
                      shingle_n: int = 3, threshold: float = 0.5,
                      seed: int = 42) -> DataFrame:
    """Near-dup pairs (id_a, id_b, est_jaccard) via banded MinHash-LSH.

    bands=16 over 64 perms -> rows-per-band r=4; the LSH S-curve puts
    the 50%-capture point near (1/bands)^(1/r) ≈ 0.5. est_jaccard is
    the fraction of agreeing permutations, computed on the candidate
    pairs only.
    """
    assert num_perm % bands == 0, "num_perm must divide into bands"
    r = num_perm // bands
    sigs = minhash_signatures(df, id_col, text_col, num_perm, shingle_n, seed)

    band_entries = sigs.select(
        F.col(id_col).alias("_id"), "sig",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(",", F.slice("sig", b * r + 1, r))
                ),
            )
        ).alias("band_id", "band_hash"),
    )
    left = band_entries.select(
        F.col("_id").alias("id_a"), F.col("sig").alias("sig_a"),
        "band_id", "band_hash",
    )
    right = band_entries.select(
        F.col("_id").alias("id_b"), F.col("sig").alias("sig_b"),
        "band_id", "band_hash",
    )
    cand = (
        left.join(right, ["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    return (
        cand.select(
            "id_a", "id_b",
            (agree.cast("double") / num_perm).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )


def simhash64(col: Column | str) -> Column:
    """64-bit SimHash of whitespace tokens, pure column expressions.

    Per token: 64-bit xxhash64. Per bit: majority vote across tokens
    (+1/-1), folded with a single ``aggregate`` over the token array —
    no explode, no shuffle; the whole fingerprint is computed inside
    codegen per row.
    """
    c = col if isinstance(col, Column) else F.col(col)
    toks = F.split(F.trim(c), r"\s+")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def bit_vote(i: int) -> Column:
        # factory keeps the merge lambda strictly 2-arg (pyspark infers
        # lambda arity from the signature; a bound default would break it)
        # and the shift amount a static int (shiftright requires one)
        def merge(acc: Column, h: Column) -> Column:
            return acc + F.when(
                F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1))

        return F.aggregate(hashes, F.lit(0).cast("long"), merge)

    fp = F.lit(0).cast("long")
    for i in range(64):
        mask = (1 << i) if i < 63 else -(1 << 63)  # bit 63 = signed-long min
        fp = fp.bitwiseOR(
            F.when(bit_vote(i) > 0, F.lit(mask).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
    return fp


def simhash_pairs(df: DataFrame, id_col: str, text_col: str,
                  max_hamming: int = 3) -> DataFrame:
    """Candidate pairs within a Hamming radius via the pigeonhole band
    trick: a pair within distance k<=3 must agree exactly on at least
    one of 4 16-bit chunks, so candidates come from an equi-join on
    (chunk_id, chunk_value) and are verified with bit_count(xor)."""
    fp = df.select(F.col(id_col).alias("_id"), simhash64(text_col).alias("fp"))
    chunks = fp.select(
        "_id", "fp",
        F.posexplode(
            F.array(*[
                F.shiftright(F.col("fp"), i * 16).bitwiseAND(F.lit(0xFFFF))
                for i in range(4)
            ])
        ).alias("chunk_id", "chunk_val"),
    )
    a = chunks.select(F.col("_id").alias("id_a"), F.col("fp").alias("fp_a"),
                      "chunk_id", "chunk_val")
    b = chunks.select(F.col("_id").alias("id_b"), F.col("fp").alias("fp_b"),
                      "chunk_id", "chunk_val")
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        a.join(b, ["chunk_id", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def dedup_exact(df: DataFrame, subset: list[str] | None = None,
                keep_order_col: str | None = None) -> DataFrame:
    """Exact dedup. Without keep_order_col: dropDuplicates (any winner,
    cheapest plan). With it: deterministic keep-first via min-ordering —
    still one hash aggregation, not a window sort."""
    if keep_order_col is None:
        return df.dropDuplicates(subset)
    keys = subset or df.columns
    w_cols = [c for c in df.columns if c not in keys]
    packed = df.select(
        *keys, F.struct(keep_order_col, *[c for c in w_cols if c != keep_order_col])
        .alias("_rest"),
    )
    return (
        packed.groupBy(*keys).agg(F.min("_rest").alias("_rest"))
        .select(*keys, "_rest.*")
    )


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", max_iter: int = 20) -> DataFrame:
    """Duplicate clusters from a pair list: iterative min-label
    propagation (large-star style). Converges in O(log n) rounds for
    near-dup clusters (which are shallow); each round is two shuffles.
    Returns (id, component) where component is the cluster's min id.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    for _ in range(max_iter):
        # neighbor minimum (including own label)
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src").agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "id")
            .filter(F.col("u.component") != F.col("l.component"))
            .limit(1).count()
        )
        labels = updated.localCheckpoint(eager=True)  # truncate lineage per round
        if changed == 0:
            break
    return labels
