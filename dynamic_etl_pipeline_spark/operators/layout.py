"""Multi-dimensional data layout: Z-order (Morton) clustering.

Why it exists (SURVEY §4 scale stance): parquet data skipping prunes on
per-file min/max stats, which a single-column sort only makes tight for
THAT column. Interleaving the bits of several normalized key columns
and range-partitioning + sorting on the resulting Z-value gives every
output file a compact hyper-rectangle in key space — selective filters
on ANY of the interleaved columns prune files, which is the difference
between scanning 100 TB and scanning the few files a predicate touches.

The Z-value is pure integer bit arithmetic (shift/and/or) generated as
one SQL expression — whole-stage codegen, no UDF, exact on any engine
(the same generator emits the DuckDB oracle text; only integer
division is spelled differently, ``div`` vs ``//``). The clustering
itself is one range repartition (a sampled-range exchange) plus an
in-partition sort, exactly what a layout-maintenance job amortizes
over many downstream scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zvalue_sql(cols: list[tuple[str, str, str]], bits: int = 16,
               dialect: str = "spark") -> str:
    """Build the Z-value SQL expression from (col, min_expr, max_expr)
    triples: min-max-normalize each column onto [0, 2^bits - 1] in
    exact integer arithmetic, then Morton-interleave (bit b of column i
    lands at position b * n + i). Works on both engines; ``dialect``
    picks the integer-division spelling."""
    idiv = "div" if dialect == "spark" else "//"
    n = len(cols)
    norms = []
    for c, mn, mx in cols:
        norms.append(
            f"(CASE WHEN ({mx}) = ({mn}) THEN CAST(0 AS BIGINT) "
            f"ELSE CAST(((CAST({c} AS BIGINT) - CAST({mn} AS BIGINT))"
            f" * {(1 << bits) - 1}) {idiv} "
            f"(CAST({mx} AS BIGINT) - CAST({mn} AS BIGINT)) AS BIGINT) END)"
        )
    terms = [
        f"((({norm} >> {b}) & CAST(1 AS BIGINT)) << {b * n + i})"
        for b in range(bits)
        for i, norm in enumerate(norms)
    ]
    return "(" + " | ".join(terms) + ")"


def with_zvalue(df: DataFrame, cols: list[str], bits: int = 16,
                out: str = "_zvalue") -> DataFrame:
    """Append the Z-value of ``cols`` (min-max normalized to ``bits``
    bits each). The min/max bounds come from one tiny global aggregate
    broadcast back (at scale: a stats-table lookup instead). Exactness
    bound: (max - min) * 2^bits must stay under 2^63 — true for any
    32-bit-ranged key at the default 16 bits."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
    bounds = df.agg(*aggs)
    j = df.crossJoin(F.broadcast(bounds))
    expr = zvalue_sql(
        [(c, f"_mn_{c}", f"_mx_{c}") for c in cols], bits, "spark"
    )
    return j.withColumn(out, F.expr(expr)).drop(
        *[f"_mn_{c}" for c in cols], *[f"_mx_{c}" for c in cols]
    )


def cluster_by_zvalue(df: DataFrame, cols: list[str], num_partitions: int,
                      bits: int = 16) -> DataFrame:
    """Z-order-cluster: range-partition + sort on the Z-value so each
    output partition (-> parquet file) covers a compact hyper-rectangle
    of the key space; written out, every per-file min/max stat on the
    clustered columns becomes selective for data skipping."""
    z = with_zvalue(df, cols, bits)
    return (
        z.repartitionByRange(num_partitions, "_zvalue")
        .sortWithinPartitions("_zvalue")
        .drop("_zvalue")
    )
