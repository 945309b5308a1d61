"""Compare paired bench.py runs at two scale factors (VERDICT r5 item 3).

Usage:
  python tools/make_scale_corpus.py                       # 10x corpus
  SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_SF_DIR=/tmp/sfscale/sf1.0 \
      python bench.py > /tmp/bench_sf1.json
  SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      python bench.py > /tmp/bench_sf01.json
  python tools/bench_scale.py /tmp/bench_sf01.json /tmp/bench_sf1.json 10

Prints a per-query table of wall-time ratios and flags queries whose
growth exceeds the super-linear threshold. With 10x data on a fixed
32-thread box, a healthy distributed plan grows <= ~10x (linear in
input) — most grow far less because sf0.1 times are dominated by fixed
per-query overhead (job scheduling, AQE planning, literal compile).
Quadratic shapes (self-joins whose candidate space scales with corpus)
are the ones this run exists to catch.
"""
from __future__ import annotations

import json
import sys


def main() -> int:
    small_path, big_path = sys.argv[1], sys.argv[2]
    data_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    # super-linear = beyond data growth plus a generous fixed-overhead
    # allowance; a 10x-data query at 1.5x data-ratio growth is O(n^1.2)
    threshold = data_ratio * 1.5

    def _load(path: str) -> dict:
        # bench.py emits a human detail-path line followed by the
        # compact JSON as the FINAL line (r7 driver-tail fix) — take
        # the last JSON line rather than parsing the whole file
        lines = [ln for ln in open(path).read().splitlines()
                 if ln.startswith("{")]
        return json.loads(lines[-1])

    small = _load(small_path)
    big = _load(big_path)
    # .get: an oversize compact line ships an empty queries map
    # (bench.py fallback) — degrade to "no common queries" not KeyError
    qs, qb = small.get("queries", {}), big.get("queries", {})
    common = [k for k in qs if k in qb]
    rows = sorted(
        ((k, qs[k], qb[k], qb[k] / qs[k] if qs[k] else float("inf"))
         for k in common),
        key=lambda r: -r[3],
    )
    flagged = []
    print(f"{'query':40s} {'sf_small':>9s} {'sf_big':>9s} {'ratio':>7s}")
    for k, a, b, r in rows:
        mark = ""
        if r > threshold:
            mark = "  <-- SUPER-LINEAR"
            flagged.append(k)
        print(f"{k:40s} {a:9.2f} {b:9.2f} {r:7.2f}{mark}")
    ts, tb = sum(qs[k] for k in common), sum(qb[k] for k in common)
    print(f"\n{'TOTAL':40s} {ts:9.2f} {tb:9.2f} {tb / ts:7.2f}")
    print(f"data ratio: {data_ratio}x, super-linear threshold: "
          f"{threshold:.1f}x, flagged: {flagged or 'none'}")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
