"""Paired measurement of the Python-state streaming floor (r10,
VERDICT r9 item 3).

`streaming_stateful_sessions` (applyInPandasWithState sessionizer) and
`streaming_minhash_index` (foreachBatch incremental LSH index) are the
two heaviest NON-designed entries in the 100x smoke (134.9 s / 82.9 s
at r9). This tool answers "inherent or tunable?" by running each query
at the scale corpus under alternating Arrow batch-size settings in ONE
session (`spark.sql.execution.arrow.maxRecordsPerBatch` IS
runtime-settable — it lives in SQLConf and ApplyInPandasWithStateExec
reads it per query, where it bounds how many GROUPS get bin-packed
into one Arrow batch before a Python worker round-trip; for ~1M
small user-groups at 100x the batch count is the overhead knob).

Alternating A/B/A/B order inside one JVM cancels warm-up and host
drift the same way tools/bench_compare.py does; per-config wall times
are reported as best-of and per-run.

Usage:
  python tools/bench_stateful_floor.py [sf_dir] [--runs N]
         [--batch-sizes 10000,100000]
Output: one JSON line per (query, batch_size, run) plus a summary.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def parse_args(argv: list[str]) -> tuple[str, int, list[int]]:
    """Accept both '--flag value' and '--flag=value' (ADVICE r10: the
    usage string shows the space form but only '=' parsed, so a bare
    '--runs N' crashed and N was swallowed as the positional sf_dir)."""
    sf_dir = "/tmp/sfscale/sf10"
    runs = 2
    sizes = [10_000, 100_000]
    positional: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--"):
            if "=" in a:
                flag, val = a.split("=", 1)
            else:
                flag = a
                i += 1
                if i >= len(argv):
                    raise SystemExit(f"{flag} requires a value")
                val = argv[i]
            if flag == "--runs":
                runs = int(val)
            elif flag == "--batch-sizes":
                sizes = [int(x) for x in val.split(",")]
            else:
                raise SystemExit(f"unknown flag {flag}")
        else:
            positional.append(a)
        i += 1
    if positional:
        sf_dir = positional[0]
    return sf_dir, runs, sizes


def main() -> None:
    sf_dir, runs, sizes = parse_args(sys.argv[1:])

    from dynamic_etl_pipeline_spark.queries import QUERIES
    from dynamic_etl_pipeline_spark.session import get_spark

    spark = get_spark("bench-stateful-floor")
    names = ["streaming_stateful_sessions", "streaming_minhash_index"]

    # warm the JVM + source listing once, tiny fixture
    QUERIES[names[0]](spark, "/root/testdata/sf0.001").count()

    results: dict[tuple[str, int], list[float]] = {}
    for r in range(runs):
        for size in sizes:            # alternate configs within a run
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", str(size)
            )
            for name in names:
                t0 = time.monotonic()
                n = QUERIES[name](spark, sf_dir).count()
                dt = time.monotonic() - t0
                results.setdefault((name, size), []).append(dt)
                print(json.dumps({
                    "query": name, "maxRecordsPerBatch": size,
                    "run": r, "rows": n, "sec": round(dt, 1),
                }), flush=True)

    summary = {
        f"{name}@{size}": round(min(ts), 1)
        for (name, size), ts in results.items()
    }
    print(json.dumps({"summary_best_of": summary, "sf_dir": sf_dir,
                      "runs": runs}), flush=True)


if __name__ == "__main__":
    main()
