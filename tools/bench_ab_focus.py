"""Focused alternating-session A/B of a NAMED QUERY SUBSET between two
git revisions (VERDICT r10 item 1).

tools/bench_compare.py runs the whole 57-query headline set, which is
the right shape for a round-level regression gate but wasteful when the
question is "are these two specific movers real or fat-tail noise?" —
each extra query adds session wall-clock without adding signal for the
queries under test. This tool checks out both revisions into temp
worktrees and runs ONLY the named queries, in alternating subprocess
sessions (A B A B ...) exactly like bench_compare, so host drift lands
on both sides equally. More sessions on fewer queries = a per-query
median that actually resolves a 1.2-1.3x question.

The per-session runner is injected via stdin (python - <<script) with
cwd at the worktree, so it needs nothing to exist at the old revision
beyond the package itself.

Usage:
  python tools/bench_ab_focus.py REV_A [REV_B] --queries a,b
      [--sessions 5] [--runs 3] [--sf-dir /root/testdata/sf0.1]
      [--out BENCH_AB_FOCUS_rNN.json]
REV_B defaults to the current working tree (run in place, uncommitted
changes included). Output: one JSON line to stdout (+ optional file).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

RUNNER = r'''
import json, sys, time
sys.path.insert(0, ".")
names = json.loads(sys.argv[1]); sf_dir = sys.argv[2]; runs = int(sys.argv[3])
from dynamic_etl_pipeline_spark.session import get_spark
from dynamic_etl_pipeline_spark.queries import QUERIES
from pyspark.sql import functions as F
spark = get_spark("ab-focus")
spark.range(64).repartition(32).select(
    F.pandas_udf(lambda s: s, "long")("id")
).write.format("noop").mode("overwrite").save()
for n in names:  # warm pass: JVM codegen + parquet footers, unmeasured
    QUERIES[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
out = {}
for n in names:
    ts = []
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        QUERIES[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    out[n] = round(min(ts), 3)
print("ABFOCUS " + json.dumps(out))
'''


def _run_session(cwd: str, names: list[str], sf_dir: str,
                 runs: int) -> dict[str, float]:
    out = subprocess.run(
        [sys.executable, "-", json.dumps(names), sf_dir, str(runs)],
        cwd=cwd, input=RUNNER, capture_output=True, text=True, timeout=3600,
        env=dict(os.environ),
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-2000:])
        raise RuntimeError(f"runner failed in {cwd}")
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith("ABFOCUS ")][-1]
    return json.loads(line[len("ABFOCUS "):])


def _median(xs: list[float]) -> float:
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("rev_a")
    p.add_argument("rev_b", nargs="?", default=None)
    p.add_argument("--queries", required=True)
    p.add_argument("--sessions", type=int, default=5)
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    p.add_argument("--out", default=None)
    a = p.parse_args()
    names = a.queries.split(",")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    wts: list[str] = []

    def worktree(rev: str) -> str:
        wt = tempfile.mkdtemp(prefix=f"ab_focus_{rev[:8]}_")
        subprocess.run(["git", "worktree", "add", "--detach", wt, rev],
                       cwd=repo, check=True, capture_output=True)
        wts.append(wt)
        return wt

    wt_a = worktree(a.rev_a)
    wt_b = worktree(a.rev_b) if a.rev_b else repo
    try:
        a_runs: list[dict[str, float]] = []
        b_runs: list[dict[str, float]] = []
        for s in range(a.sessions):
            sys.stderr.write(f"session {s + 1}/{a.sessions} A ({a.rev_a})\n")
            a_runs.append(_run_session(wt_a, names, a.sf_dir, a.runs))
            sys.stderr.write(f"session {s + 1}/{a.sessions} B "
                             f"({a.rev_b or 'worktree'})\n")
            b_runs.append(_run_session(wt_b, names, a.sf_dir, a.runs))
        result = {
            "rev_a": a.rev_a, "rev_b": a.rev_b or "worktree",
            "sessions": a.sessions, "runs_per_session": a.runs,
            "sf_dir": a.sf_dir, "queries": names,
            "a_sessions": a_runs, "b_sessions": b_runs,
            "a_median": {q: round(_median([r[q] for r in a_runs]), 3)
                         for q in names},
            "b_median": {q: round(_median([r[q] for r in b_runs]), 3)
                         for q in names},
        }
        result["b_over_a"] = {
            q: round(result["b_median"][q] / result["a_median"][q], 3)
            if result["a_median"][q] else None
            for q in names
        }
        line = json.dumps(result)
        print(line)
        if a.out:
            with open(os.path.join(repo, a.out), "w") as f:
                json.dump(result, f, indent=1)
    finally:
        for wt in wts:
            subprocess.run(["git", "worktree", "remove", "--force", wt],
                           cwd=repo, capture_output=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
