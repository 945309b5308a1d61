"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Methodology: one warm SparkSession (startup excluded); each query is
materialized through the noop sink so the full plan executes on all
partitions without collect()-to-driver overhead distorting the number.
Targets live in BASELINE.md §C (≤5 s per query warm at sf0.1).
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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from dynamic_etl_pipeline_spark.session import get_spark
    from dynamic_etl_pipeline_spark.queries import QUERIES

    spark = get_spark(master=f"local[{cpus}]")

    # Warm the JVM + parquet footers once so per-query numbers measure the
    # plan, not first-touch costs (matches BASELINE.md "warm session").
    QUERIES["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
