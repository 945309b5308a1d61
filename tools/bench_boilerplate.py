"""Measure the sqrt stop-shingle cap ABOVE its crossover on a
planted-boilerplate scale corpus (VERDICT r7 item 2).

The synthetic replica corpora have no skew growth (max 3-gram df = 25
at every scale: the decorrelation tag keeps replica vocabularies
disjoint), so SCALING.md's inverted-index numbers never exercised the
sqrt term added in round 7 — its above-crossover behavior was proven
only on a 1,000-doc unit fixture. ``make_scale_corpus.py
--boilerplate-every 21`` plants one untagged template sentence whose
ten 3-grams reach df = n_docs/21: BETWEEN the sqrt threshold
(10*sqrt(n)) and the historical fractional threshold (0.05*n) at both
10x and 100x, so the sqrt term is the only thing standing between the
join and the boilerplate's df^2 row blow-up.

Reports, for a corpus dir:
- df distribution + the three thresholds;
- admitted single-join mass  sum(df^2)  uncapped / under the r6
  frac-only threshold / under the current sqrt cap;
- a timed run of the registered (capped) ngram_jaccard_pairs with the
  cap's Observation counters;
- with --exact-containment: the uncapped exact pair set, the
  capped-is-a-subset check (left_anti == 0), and how many pairs the
  cap costs (pairs supported ONLY by boilerplate grams).

Usage: python tools/bench_boilerplate.py <corpus_dir>
           [--exact-containment]
"""
from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dynamic_etl_pipeline_spark.catalog import load_table  # noqa: E402
from dynamic_etl_pipeline_spark.operators.shingles import (  # noqa: E402
    STOP_SHINGLE_FLOOR,
    STOP_SHINGLE_FRAC,
    STOP_SHINGLE_SQRT_COEF,
    drop_stop_shingles,
    last_cap_observation,
    word_ngram_postings,
)
from dynamic_etl_pipeline_spark.queries import QUERIES  # noqa: E402
from dynamic_etl_pipeline_spark.session import get_spark  # noqa: E402


def _pairs_from(postings):
    """The ngram_jaccard_pairs join/agg shape over given postings
    (jaccard denominator from the caller-supplied counts frame)."""
    a, b = postings.alias("a"), postings.alias("b")
    return (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )


def main() -> int:
    corpus = sys.argv[1]
    exact = "--exact-containment" in sys.argv
    spark = get_spark("bench-boilerplate")
    spark.sparkContext.setLogLevel("ERROR")

    d = load_table(spark, corpus, "documents")
    postings = word_ngram_postings(d, 3)
    dfreq = postings.groupBy("shingle").agg(F.count("*").alias("df"))
    n_docs = d.count()
    frac_thr = STOP_SHINGLE_FRAC * n_docs
    sqrt_thr = STOP_SHINGLE_SQRT_COEF * math.sqrt(n_docs)
    thr_r6 = max(STOP_SHINGLE_FLOOR, int(frac_thr))          # frac-only
    thr_now = max(STOP_SHINGLE_FLOOR, int(min(frac_thr, sqrt_thr)))
    stats = dfreq.agg(
        F.count("*").alias("n_shingles"),
        F.max("df").alias("max_df"),
        F.sum(F.col("df") * F.col("df")).alias("mass_uncapped"),
        F.sum(F.when(F.col("df") <= thr_r6, F.col("df") * F.col("df"))
              .otherwise(0)).alias("mass_frac_only"),
        F.sum(F.when(F.col("df") <= thr_now, F.col("df") * F.col("df"))
              .otherwise(0)).alias("mass_sqrt_cap"),
        F.sum(F.when(F.col("df") > thr_now, 1).otherwise(0)).alias("n_hot"),
    ).collect()[0]
    print(f"corpus={corpus} n_docs={n_docs}")
    print(f"thresholds: floor={STOP_SHINGLE_FLOOR} "
          f"frac={frac_thr:.0f} sqrt={sqrt_thr:.0f} "
          f"=> r6(frac-only)={thr_r6} current(sqrt)={thr_now}")
    print(f"shingles={stats['n_shingles']} max_df={stats['max_df']}")
    print(f"single-shingle join mass sum(df^2): "
          f"uncapped={stats['mass_uncapped']:,} "
          f"frac_only_admits={stats['mass_frac_only']:,} "
          f"sqrt_cap_admits={stats['mass_sqrt_cap']:,} "
          f"(hot shingles dropped by cap: {stats['n_hot']})")

    t0 = time.time()
    capped_rows = QUERIES["ngram_jaccard_pairs"](spark, corpus).count()
    wall = time.time() - t0
    obs = last_cap_observation("ngram_jaccard_pairs")
    print(f"ngram_jaccard_pairs (capped, registered): {wall:.1f}s "
          f"pairs={capped_rows} observation={obs.get if obs else None}")

    if exact:
        counts = postings.groupBy("doc_id").agg(F.count("*").alias("n_sh"))

        def jacc(pairs):
            ca = counts.select(F.col("doc_id").alias("doc_a"),
                               F.col("n_sh").alias("n_a"))
            cb = counts.select(F.col("doc_id").alias("doc_b"),
                               F.col("n_sh").alias("n_b"))
            nu = F.col("n_a") + F.col("n_b") - F.col("n_common")
            return (
                pairs.join(ca, "doc_a").join(cb, "doc_b")
                .filter(F.col("n_common").cast("double") / nu >= 0.01)
                .select("doc_a", "doc_b")
            )

        t0 = time.time()
        exact_pairs = jacc(_pairs_from(postings)).cache()
        n_exact = exact_pairs.count()
        t_exact = time.time() - t0
        capped_pairs = jacc(_pairs_from(
            drop_stop_shingles(postings, label="bench-bp")))
        n_capped = capped_pairs.count()
        escaped = capped_pairs.join(
            exact_pairs, ["doc_a", "doc_b"], "left_anti").count()
        print(f"exact (uncapped) pairs={n_exact} in {t_exact:.1f}s; "
              f"capped pairs={n_capped}; capped-not-in-exact={escaped} "
              f"(containment {'HOLDS' if escaped == 0 else 'VIOLATED'}); "
              f"boilerplate-only pairs lost={n_exact - n_capped}")
        exact_pairs.unpersist()
    return 0


if __name__ == "__main__":
    sys.exit(main())
