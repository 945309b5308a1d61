"""Distributed BPE trainer (operators/bpe.py) vs a pure-Python
reference implementation of Sennrich et al. BPE — merge sequence,
tie-breaks, and overlap (leftmost-first) semantics must match exactly,
and the learned table must be partition-invariant."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from dynamic_etl_pipeline_spark.operators.bpe import (
    EOW,
    bpe_train,
    word_vocab,
)


def _ref_bpe(texts: list[str], num_merges: int):
    """Reference BPE: dict-of-tuples vocab, same total tie-break
    (count desc, left asc, right asc), leftmost-first merge."""
    vocab = Counter()
    for t in texts:
        for w in t.split():
            if w:
                vocab[tuple(list(w) + [EOW])] += 1
    merges = []
    for rank in range(num_merges):
        pairs = Counter()
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        (left, right), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, n))
        new_vocab = Counter()
        for syms, freq in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


_CORPUS = [
    "low low low low low",
    "lower lower newest newest newest newest newest newest",
    "widest widest widest",
    "new new newer newer newer",
    "aaa aaa aa a",          # overlap semantics: leftmost-first merging
]


def test_merge_sequence_matches_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(_CORPUS)],
                               ["doc_id", "text"])
    got = bpe_train(df, num_merges=12)
    want = _ref_bpe(_CORPUS, 12)
    assert got == want


def test_merge_table_partition_invariant(spark):
    rows = [(i, t) for i, t in enumerate(_CORPUS * 8)]
    one = bpe_train(
        spark.createDataFrame(rows, ["doc_id", "text"]).repartition(1), 6)
    many = bpe_train(
        spark.createDataFrame(rows, ["doc_id", "text"]).repartition(17), 6)
    assert one == many


def test_word_vocab_symbols(spark):
    df = spark.createDataFrame([(1, "ab  a")], ["doc_id", "text"])
    rows = {tuple(r["symbols"]): r["freq"]
            for r in word_vocab(df).collect()}
    assert rows == {("a", "b", EOW): 1, ("a", EOW): 1}


def test_trainer_runs_on_fixture(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = bpe_train(docs.select("text"), num_merges=3)
    assert len(merges) == 3
    # counts are positive and non-increasing in learned order is NOT
    # guaranteed by BPE (later merges can beat earlier counts), but
    # every learned pair must have been observed
    assert all(n > 0 for _, _, _, n in merges)


def _ref_encode(word: str, merges):
    ranks = {(l, r): rank for rank, l, r, _ in merges}
    syms = list(word) + [EOW]
    while True:
        cands = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(syms, syms[1:]))
            if (a, b) in ranks
        ]
        if not cands:
            return syms
        rank, _ = min(cands)
        pair = next(
            (a, b) for a, b in zip(syms, syms[1:]) if ranks.get((a, b)) == rank
        )
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out


def test_bpe_encode_round_trip_and_reference(spark):
    from dynamic_etl_pipeline_spark.operators.bpe import bpe_encode

    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CORPUS)], ["doc_id", "text"])
    merges = bpe_train(train, num_merges=10)
    out = bpe_encode(train, merges).collect()
    for r in out:
        toks = r["bpe_tokens"]
        # lossless: tokens concatenate back to the original words
        rebuilt = "".join(toks).replace(EOW, " ").strip()
        assert rebuilt == " ".join(r["text"].split())
        # matches the reference encoder word by word
        want = []
        for w in r["text"].split():
            if w:
                want.extend(_ref_encode(w, merges))
        assert toks == want, r["text"]
