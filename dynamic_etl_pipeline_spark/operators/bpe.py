"""Distributed BPE tokenizer training (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").

The reference app has no tokenizer surface at all; this is a
north-star training-data operator (SURVEY §2.12 tier): the actual
merge-table learning loop, not just the single merge-step pair count
(``bpe_merge_pairs`` in queries/text.py).

Scale shape — the whole point of BPE on a cluster:

1. CORPUS-sized work happens exactly once: one tokenize + groupBy to
   the (word, freq) vocabulary frame. At 100 TB this is one shuffle
   keyed by word with map-side combine.
2. Every merge iteration is VOCAB-sized, not corpus-sized: adjacent
   symbol pairs are exploded from the word frame (rows ~ total symbol
   occurrences across DISTINCT words), counted weighted by word
   frequency (map-side combine again), and only the single argmax row
   crosses to the driver. The merge application is a map-only
   higher-order fold over each word's symbol array.
3. Per-iteration lineage is truncated via materialize() so N merges
   never build an N-deep plan.

Determinism: the argmax tie-break is total (count DESC, left ASC,
right ASC), so the learned merge sequence is partition-invariant and
reproducible — pinned against a pure-Python reference implementation
in tests/test_bpe.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..materialize import materialize

# end-of-word marker, as in the original paper (keeps merges from
# crossing word boundaries and distinguishes suffix from infix units)
EOW = "</w>"


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(symbols: array<string>, freq: bigint) — the corpus reduced to
    its distinct-word frequency table, each word split into initial
    character symbols with the end-of-word marker appended. The ONLY
    corpus-sized pass in BPE training."""
    words = df.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    return (
        words.groupBy("w").agg(F.count("*").alias("freq"))
        .select(
            F.concat(
                # split on '' can emit a trailing '' depending on the
                # engine version — filter keeps only real characters
                F.filter(F.split(F.col("w"), ""), lambda c: c != ""),
                F.array(F.lit(EOW)),
            ).alias("symbols"),
            "freq",
        )
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(left, right, n) adjacent-pair counts weighted by word freq.
    zip_with over the shifted array stays JVM-side; explode rows are
    bounded by symbols-per-distinct-word, never corpus size."""
    pairs = F.zip_with(
        F.slice("symbols", 1, F.size("symbols") - 1),
        F.slice("symbols", 2, F.size("symbols") - 1),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        vocab.filter(F.size("symbols") >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.sum("freq").alias("n"))
    )


def _apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Replace every adjacent (left, right) with the merged symbol,
    leftmost-first (so 'a a a' under merge (a,a) -> ['aa','a']), as a
    map-only aggregate() fold: the accumulator carries (emitted array,
    pending symbol); each step either merges the pending symbol with
    the current one or flushes it."""
    lf, rt = F.lit(left), F.lit(right)
    merged = F.lit(left + right)
    folded = F.aggregate(
        "symbols",
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit("").alias("pend"),
            F.lit(False).alias("has"),
        ),
        lambda acc, s: F.when(
            acc["has"] & (acc["pend"] == lf) & (s == rt),
            # merge consumes the pending symbol; nothing stays pending
            # (prevents 'a a a' from double-merging overlaps)
            F.struct(
                F.concat(acc["out"], F.array(merged)).alias("out"),
                F.lit("").alias("pend"), F.lit(False).alias("has"),
            ),
        ).otherwise(
            F.struct(
                F.when(acc["has"],
                       F.concat(acc["out"], F.array(acc["pend"])))
                .otherwise(acc["out"]).alias("out"),
                s.alias("pend"), F.lit(True).alias("has"),
            )
        ),
        lambda acc: F.when(
            acc["has"], F.concat(acc["out"], F.array(acc["pend"]))
        ).otherwise(acc["out"]),
    )
    return vocab.select(folded.alias("symbols"), "freq")


def bpe_train(df: DataFrame, num_merges: int,
              text_col: str = "text") -> list[tuple[int, str, str, int]]:
    """Learn ``num_merges`` BPE merges; returns
    [(rank, left, right, pair_count), ...] in learned order.

    Driver traffic is one argmax ROW per iteration; everything else is
    distributed. Stops early if no adjacent pair remains."""
    vocab = materialize(word_vocab(df, text_col))
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("n"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        row = top[0]
        merges.append((rank, row["left"], row["right"], row["n"]))
        vocab = materialize(_apply_merge(vocab, row["left"], row["right"]))
    return merges


def bpe_merges_df(spark, df: DataFrame, num_merges: int,
                  text_col: str = "text") -> DataFrame:
    """The merge table as a DataFrame (rank, left, right, pair_count)."""
    rows = bpe_train(df, num_merges, text_col)
    return spark.createDataFrame(
        rows, ["rank", "left", "right", "pair_count"]
    ).select(
        F.col("rank").cast("int"), "left", "right",
        F.col("pair_count").cast("bigint"),
    )


def _encode_word(chars: list[str], ranks: dict[tuple[str, str], int]) -> list[str]:
    """Standard BPE apply: repeatedly merge the LOWEST-RANK adjacent
    pair (leftmost on rank ties is irrelevant — equal pairs share one
    rank and merging any order yields the same result for
    non-overlapping, leftmost-first for overlapping runs)."""
    syms = list(chars)
    while len(syms) >= 2:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        # merge ALL occurrences of that pair leftmost-first
        pair = (syms[best], syms[best + 1])
        out, i = [], 0
        while i < len(syms):
            if (i + 1 < len(syms)
                    and (syms[i], syms[i + 1]) == pair):
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(df: DataFrame, merges: list[tuple[int, str, str, int]],
               text_col: str = "text",
               out_col: str = "bpe_tokens") -> DataFrame:
    """Apply a learned merge table: adds ``out_col`` with each row's
    BPE token sequence.

    Scale shape: encoding is computed once per DISTINCT word (the
    vocabulary frame, not the corpus) in an Arrow-batched pandas UDF
    with the rank table broadcast in the closure; documents then
    rebuild their token streams with a JVM-side transform over their
    word arrays against the broadcast word->tokens map... for corpora
    where the distinct-word frame exceeds broadcast size, the join
    form (explode words with position, equi-join the encoded vocab,
    re-collect by position) is the swap — here the vocab map rides the
    UDF closure, which is the same O(|vocab|) driver weight the
    centroid/codebook broadcasts carry."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    ranks = {(l, r): rank for rank, l, r, _ in merges}

    @pandas_udf(ArrayType(StringType()))
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def one(t):
            if t is None:
                return None
            out: list[str] = []
            for w in t.split():
                if not w:
                    continue
                if w not in cache:
                    cache[w] = _encode_word(list(w) + [EOW], ranks)
                out.extend(cache[w])
            return out

        return texts.map(one)

    return df.withColumn(out_col, enc(F.col(text_col)))
