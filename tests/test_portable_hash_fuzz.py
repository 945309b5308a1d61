"""Differential fuzz for the portable-hash dedup oracles (round 6).

The registered minhash/simhash queries claim VALUE-exact parity with
generated DuckDB oracles — not just on the fixture corpus, but on any
corpus (within the documented identical-signature-group boundary).
These tests put hypothesis-grade weight behind that claim: seeded
random corpora with planted near-duplicates (truncations, single-word
edits, exact copies under the group-expand bound) run through the
engine's portable-hash mode AND through the same oracle builders the
driver uses, with the corpus injected as a DuckDB view.

Any divergence here means an arithmetic step (md5 fold, shingle
polynomial, Carter-Wegman minimum, band key, majority vote, Hamming
count) is NOT engine-portable — exactly the regression class the
fixture-only driver check could miss.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from dynamic_etl_pipeline_spark.operators.dedup import (
    connected_components,
    minhash_lsh_pairs,
    simhash_pairs,
)
from dynamic_etl_pipeline_spark.queries.northstar import (
    _minhash_clusters_oracle,
    _minhash_oracle,
    _simhash_oracle,
)

_WORDS = [f"w{i:03d}" for i in range(220)]
_CORPUS_SQL = "SELECT doc_id, text FROM raw_corpus"


def _random_corpus(seed: int, n_docs: int = 36) -> pd.DataFrame:
    """Random word-soup docs + planted near-dups: truncated copies,
    single-word edits, and a couple of exact copies (small enough to
    stay inside the collapse fast path / group-expand bound)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        n = rng.randint(1, 40)  # includes docs too short to shingle
        rows.append((i, " ".join(rng.choice(_WORDS) for _ in range(n))))
    nxt = n_docs
    for i, text in list(rows):
        toks = text.split(" ")
        roll = rng.random()
        if roll < 0.25 and len(toks) > 4:
            rows.append((nxt, " ".join(toks[:-1])))  # truncation
            nxt += 1
        elif roll < 0.40 and len(toks) > 6:
            j = rng.randrange(len(toks))
            edited = toks[:]
            edited[j] = rng.choice(_WORDS)
            rows.append((nxt, " ".join(edited)))  # one-word edit
            nxt += 1
        elif roll < 0.48:
            rows.append((nxt, text))  # exact copy
            nxt += 1
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _duck(corpus: pd.DataFrame, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("raw_corpus", corpus)
    return con.execute(sql).fetchdf()


def _assert_frames_equal(got: pd.DataFrame, want: pd.DataFrame,
                         keys: list[str], seed: int) -> None:
    got = got.sort_values(keys).reset_index(drop=True)
    want = want.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(want), (
        f"seed {seed}: row count {len(got)} != oracle {len(want)}"
    )
    for c in want.columns:
        assert list(got[c]) == list(want[c]), (
            f"seed {seed}: column {c} diverges from the oracle"
        )


@pytest.mark.parametrize("seed", range(6))
def test_minhash_portable_matches_oracle_on_random_corpora(spark, seed):
    corpus = _random_corpus(seed)
    got = (
        minhash_lsh_pairs(
            spark.createDataFrame(corpus), "doc_id", "text",
            threshold=0.5, udf_partitions=8,
            portable_hash=True, max_postings_per_band=None,
        )
        .toPandas()
    )
    want = _duck(
        corpus, _minhash_oracle(corpus_sql=_CORPUS_SQL)
    )
    _assert_frames_equal(got, want, ["id_a", "id_b"], seed)


@pytest.mark.parametrize("seed", [0, 3])
def test_minhash_portable_clusters_match_recursive_cte(spark, seed):
    corpus = _random_corpus(seed)
    pairs = minhash_lsh_pairs(
        spark.createDataFrame(corpus), "doc_id", "text",
        threshold=0.5, udf_partitions=8,
        portable_hash=True, max_postings_per_band=None,
    )
    got = connected_components(pairs).toPandas()
    want = _duck(
        corpus, _minhash_clusters_oracle(corpus_sql=_CORPUS_SQL)
    )
    _assert_frames_equal(got, want, ["id"], seed)


@pytest.mark.parametrize("seed", range(6))
def test_simhash_portable_matches_oracle_on_random_corpora(spark, seed):
    corpus = _random_corpus(seed + 100)
    got = (
        simhash_pairs(
            spark.createDataFrame(corpus), "doc_id", "text",
            max_hamming=3, udf_partitions=8,
            portable_hash=True, max_postings_per_chunk=None,
        )
        .toPandas()
    )
    want = _duck(
        corpus, _simhash_oracle(corpus_sql=_CORPUS_SQL)
    )
    _assert_frames_equal(got, want, ["id_a", "id_b"], seed)
