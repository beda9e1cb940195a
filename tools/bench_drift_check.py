"""Compare a bench.py JSON line against PERF.md on the
calibration-NORMALIZED numbers (r7 verdict task 3: every BENCH_rN
query must land within ±10% of PERF's calib-normalized isolated
median).

Both artifacts carry the same fixed-probe normalization
(REF_CALIB-rescaled medians): bench.py emits `queries_norm`, PERF.md
carries a `norm` column whose headline rows come from a bench
subprocess. This tool joins them and prints per-query deviation,
worst first; exits non-zero if any shared query deviates more than
the gate.

Usage: python tools/bench_drift_check.py <bench_json_file> [gate_pct]
       (bench_json_file: a file holding bench.py's JSON line, e.g.
        BENCH_r08.json; gate_pct default 10)
"""

from __future__ import annotations

import json
import os
import re
import sys


def perf_norms(path: str) -> dict[str, float]:
    rows = {}
    for line in open(path):
        m = re.match(r"\| (\S+) \| ([-\d.]+) \| ([-\d.]+) \| ", line)
        if m and m.group(1) != "query":
            rows[m.group(1)] = float(m.group(3))
    return rows


def main() -> None:
    bench_path = sys.argv[1]
    gate = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    bench = json.loads(open(bench_path).read().strip().splitlines()[-1])
    bnorm = bench.get("queries_norm") or bench["queries"]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pnorm = perf_norms(os.path.join(root, "PERF.md"))
    shared = sorted(set(bnorm) & set(pnorm))
    if not shared:
        print("no shared queries between bench JSON and PERF.md")
        sys.exit(2)
    rows = []
    for name in shared:
        b, p = bnorm[name], pnorm[name]
        if p <= 0:
            continue
        dev = (b - p) / p * 100.0
        rows.append((abs(dev), dev, name, b, p))
    rows.sort(reverse=True)
    worst = rows[0][0] if rows else 0.0
    bad = [r for r in rows if r[0] > gate]
    for _, dev, name, b, p in rows:
        flag = " <-- OVER GATE" if abs(dev) > gate else ""
        print(f"{name:32s} bench_norm={b:8.3f} perf_norm={p:8.3f} "
              f"dev={dev:+6.1f}%{flag}")
    print(f"\n{len(shared)} shared queries, worst |dev| {worst:.1f}%, "
          f"gate ±{gate:.0f}%, over-gate: {len(bad)}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
