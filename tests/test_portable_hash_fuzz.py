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


# ---------------------------------------------------------------------------
# Round-7 portable sketches: KMV distinct + hash-Bernoulli quantile
# sample re-derived by DuckDB on random frames (same weight the r6
# minhash family carries — fixture-only parity is not enough).


@pytest.mark.parametrize("seed", range(6))
def test_kmv_distinct_matches_oracle_on_random_frames(spark, seed):
    """Random (group, value) frames with duplicate values, skewed group
    sizes, groups below/above k=64 distinct, and NULL values (ADVICE
    r7: Spark orders NULL hv first, DuckDB last — both sides now drop
    NULLs up front, so the sketch must be NULL-invariant)."""
    from dynamic_etl_pipeline_spark.queries.advanced import (
        _kmv_oracle,
        kmv_distinct,
    )

    rng = random.Random(1000 + seed)
    rows = []
    for g, size in enumerate([3, 40, 64, 65, 300, rng.randint(1, 500)]):
        vals = [rng.randint(-50, 10_000) for _ in range(size)]
        rows += [(f"g{g}", v) for v in vals]
        rows += [(f"g{g}", rng.choice(vals)) for _ in range(size // 3)]
        rows += [(f"g{g}", None)] * rng.randint(0, 3)  # NULL values
    rows += [("g_allnull", None)] * 4  # group with ONLY null values
    corpus = pd.DataFrame(rows, columns=["grp", "val"])
    corpus["val"] = corpus["val"].astype("Int64")
    got = kmv_distinct(
        spark.createDataFrame(rows, "grp string, val long"), "grp", "val"
    ).toPandas()
    want = _duck(corpus, _kmv_oracle("raw_corpus", "grp", "val"))
    assert "g_allnull" not in set(got["grp"])  # all-null group drops out
    _assert_frames_equal(got, want, ["grp"], seed)


@pytest.mark.parametrize("seed", range(4))
def test_quantile_hash_sample_matches_oracle_on_random_frames(spark, seed):
    """The deterministic md5 sample membership and the interpolated
    sample/exact quantiles must agree cell-for-cell on random keyed
    frames (incl. negative and repeated measures)."""
    from pyspark.sql import functions as F

    rng = random.Random(2000 + seed)
    rows = [
        (rng.randint(1, 400), rng.randint(1, 7),
         round(rng.uniform(-100, 100_000), 2))
        for _ in range(rng.randint(50, 1200))
    ]
    corpus = pd.DataFrame(rows, columns=["k1", "k2", "price"])
    samp = F.substring(
        F.md5(
            F.concat(
                F.col("k1").cast("string"), F.lit("#"),
                F.col("k2").cast("string"),
            ).cast("binary")
        ),
        1, 1,
    ).isin("0", "1", "2", "3")
    sampled = F.when(samp, F.col("price"))
    got = spark.createDataFrame(corpus).agg(
        F.count("*").alias("n_total"),
        F.count_if(samp).alias("n_sample"),
        F.round(F.percentile(sampled, F.lit(0.5)), 4).alias("p50_sample"),
        F.round(F.percentile(sampled, F.lit(0.95)), 4).alias("p95_sample"),
        F.round(F.percentile(F.col("price"), F.lit(0.5)), 4).alias("p50_exact"),
    ).toPandas()
    want = _duck(corpus, """
WITH keyed AS (
  SELECT price,
         substr(md5(CAST(k1 AS VARCHAR) || '#' || CAST(k2 AS VARCHAR)),
                1, 1) IN ('0', '1', '2', '3') AS samp
  FROM raw_corpus
)
SELECT count(*) AS n_total,
       CAST(count(*) FILTER (samp) AS BIGINT) AS n_sample,
       round(CAST(quantile_cont(CASE WHEN samp THEN price END, 0.5)
                  AS DOUBLE), 4) AS p50_sample,
       round(CAST(quantile_cont(CASE WHEN samp THEN price END, 0.95)
                  AS DOUBLE), 4) AS p95_sample,
       round(CAST(quantile_cont(price, 0.5) AS DOUBLE), 4) AS p50_exact
FROM keyed
""")
    _assert_frames_equal(got, want, ["n_total"], seed)


@pytest.mark.parametrize("seed", range(4))
def test_cms_heavy_hitters_matches_oracle_on_random_corpora(spark, seed):
    """Zipf-ish random corpora (a few planted hot words over a wide
    tail) through the engine's CMS heavy-hitter construction vs the
    same templated DuckDB oracle — the grid buckets, the min-over-rows
    estimate, the integer threshold, and the membership flag must all
    agree cell-for-cell."""
    from dynamic_etl_pipeline_spark.queries.text import (
        _hh_cms_oracle,
        heavy_hitters_cms,
    )

    rng = random.Random(3000 + seed)
    hot = [f"hot{h}" for h in range(rng.randint(1, 4))]
    rows = []
    for i in range(rng.randint(20, 60)):
        n = rng.randint(3, 60)
        toks = [
            rng.choice(hot) if rng.random() < 0.3 else rng.choice(_WORDS)
            for _ in range(n)
        ]
        rows.append((i, " ".join(toks)))
    corpus = pd.DataFrame(rows, columns=["doc_id", "text"])
    got = heavy_hitters_cms(spark.createDataFrame(corpus)).toPandas()
    want = _duck(corpus, _hh_cms_oracle("raw_corpus"))
    assert len(got), f"seed {seed}: no heavy hitters planted"
    _assert_frames_equal(got, want, ["word"], seed)


def test_kmv_estimate_division_parity_including_zero_hash(spark):
    """Spark `div greatest(hv, 1)` vs DuckDB `// greatest(hv, 1)` over
    the full 48-bit hash range including the edges the corpus fuzz can
    never reach (hv = 0 — the all-zero md5 prefix the greatest() guard
    exists for — and the max hash)."""
    import duckdb

    from dynamic_etl_pipeline_spark.queries.advanced import (
        _KMV_NUM,
        _KMV_SPACE,
    )

    rng = random.Random(11)
    hvs = [0, 1, 2, 62, 63, 64, _KMV_NUM, _KMV_SPACE - 1]
    hvs += [rng.randrange(_KMV_SPACE) for _ in range(300)]
    rows = spark.createDataFrame([(h,) for h in hvs], "hv long")
    got = {
        r["hv"]: r["est"]
        for r in rows.selectExpr(
            "hv", f"{_KMV_NUM} div greatest(hv, 1) AS est"
        ).collect()
    }
    con = duckdb.connect()
    for h in hvs:
        want = con.execute(
            f"SELECT {_KMV_NUM} // greatest({h}, 1)"
        ).fetchone()[0]
        assert got[h] == want, (h, got[h], want)


@pytest.mark.parametrize("seed", range(4))
def test_kmv_theta_overlap_matches_oracle_on_random_frames(spark, seed):
    """Random (group, value) frames with engineered overlap structure:
    disjoint groups, nested groups, partial overlaps, and small groups
    below k (the complete-sketch degenerate branch) — the theta rule,
    common-below-theta count, both estimators, and the exact
    ride-along must agree cell-for-cell with the templated oracle."""
    from dynamic_etl_pipeline_spark.queries.advanced import (
        _kmv_overlap_oracle,
        kmv_overlap,
    )

    rng = random.Random(4000 + seed)
    base = [rng.randint(0, 5000) for _ in range(rng.randint(80, 400))]
    rows = []
    rows += [("ga", v) for v in base]                      # full set
    rows += [("gb", v) for v in base[: len(base) // 2]]    # nested half
    rows += [("gc", v + 2500) for v in base]               # partial shift
    rows += [("gd", v) for v in base[:20]]                 # below k
    rows += [("ge", rng.randint(10**6, 2 * 10**6))
             for _ in range(100)]                          # disjoint
    rows += [(g, None) for g in ("ga", "gb", "ge")]        # NULL values
    corpus = pd.DataFrame(rows, columns=["grp", "val"])
    corpus["val"] = corpus["val"].astype("Int64")
    sdf = spark.createDataFrame(rows, "grp string, val long")
    got = kmv_overlap(sdf, "grp", "val").toPandas()
    want = _duck(corpus, _kmv_overlap_oracle("raw_corpus", "grp", "val"))
    _assert_frames_equal(got, want, ["type_a", "type_b"], seed)
    # production mode: same sketch columns, no exact ride-along
    prod = kmv_overlap(sdf, "grp", "val", check=False).toPandas()
    assert "exact_inter" not in prod.columns
    _assert_frames_equal(
        prod, want.drop(columns=["exact_inter"]), ["type_a", "type_b"], seed
    )
