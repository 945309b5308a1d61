"""Run EVERY registered query at a big scale factor (no oracle, noop
sink) to flush out scale-only runtime failures: safety-guard trips
(e.g. the recursive-CTE row limit the 100x corpus broke), broadcast
OOMs, driver-side materialization bounds, codegen limits.

The per-round bench covers the ~50 headline queries; the other ~180
never execute above sf0.1 without this. Correctness stays the
oracle gate's job at the grading scales — this pass only asserts
"completes and is finite at 100x".

Streaming drains are included (they run real micro-batches over temp
checkpoints); anything raising is reported with its root exception
line. Exit 1 if any query fails.

A per-query watchdog (SPARK_SMOKE_TIMEOUT seconds, default 900)
cancels the query's job group and records TIMEOUT instead of letting
a runaway query stall the whole pass. Queries tagged baseline=... in
the registry (deliberate quadratic anchors) now fail fast via
guard_baseline above their documented input bound and are recorded
GUARD — the expected outcome at the 100x corpus, not a failure.

Usage: python tools/scale_smoke.py [sf_dir] [name_filter...]
"""
from __future__ import annotations

import os
import sys
import threading
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale/sf10"
    only = set(sys.argv[2:])
    limit = float(os.environ.get("SPARK_SMOKE_TIMEOUT", "900"))

    import __spark_entry__ as entry
    from dynamic_etl_pipeline_spark.queries.registry import (
        BaselineScaleError,
    )
    from dynamic_etl_pipeline_spark.session import get_spark

    spark = get_spark("scale-smoke")
    sc = spark.sparkContext
    qs = entry.queries()
    names = [n for n in sorted(qs) if not only or n in only]
    failed: list[str] = []
    timed_out: list[str] = []
    guarded: list[str] = []
    for i, name in enumerate(names, 1):
        t0 = time.monotonic()
        sc.setJobGroup(name, f"scale_smoke:{name}", interruptOnCancel=True)
        watchdog = threading.Timer(limit, sc.cancelJobGroup, [name])
        watchdog.daemon = True
        watchdog.start()
        try:
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.monotonic() - t0
            print(f"ok    {name}: {dt:.1f}s  [{i}/{len(names)}]",
                  flush=True)
        except BaselineScaleError as exc:
            dt = time.monotonic() - t0
            print(f"GUARD {name}: {dt:.1f}s  {str(exc)[:200]}", flush=True)
            guarded.append(name)
        except Exception as exc:  # noqa: BLE001 — report and continue
            dt = time.monotonic() - t0
            if dt >= limit:
                print(f"TIME  {name}: cancelled at {dt:.0f}s  "
                      f"[{i}/{len(names)}]", flush=True)
                timed_out.append(name)
            else:
                root = traceback.format_exception_only(type(exc), exc)[-1]
                print(f"FAIL  {name}: {dt:.1f}s  {root.strip()[:300]}",
                      flush=True)
                failed.append(name)
        finally:
            watchdog.cancel()
            sc.setJobGroup("", "")
            spark.catalog.clearCache()
    n_bad = len(failed) + len(timed_out) + len(guarded)
    print(f"\n{len(names) - n_bad}/{len(names)} ok; "
          f"failed: {failed or 'none'}; timed out: {timed_out or 'none'}; "
          f"guarded baselines (fail-fast by design): {guarded or 'none'}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
