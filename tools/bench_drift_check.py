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

  raw     beta=0:    bench_raw            vs perf_raw
  affine  primary:   bench_norm           vs perf_norm   (norm_time)
  cpu     beta=1:    bench_raw * f_b      vs perf_raw * f_p
  cpu15   beta=1.5:  bench_raw * f_b^1.5  vs perf_raw * f_p^1.5

where f = REF_CALIB / median(run probes) is each artifact's OWN
factor. beta=0 is the hard lower bound of machine-speed sensitivity;
the upper bound is NOT the pure-CPU probe's beta=1 -- shuffle-heavy
queries respond MORE than the probe because throttle amplifies GC
pauses and fetch waits (measured r9: same-code graph_triangle_count
and dedup_minhash_realistic ran 12.9% faster on a machine whose
probe was only 9% faster, an effective beta ~= 1.46) -- so the
bracket tops out at the measured beta=1.5. When the beta=0 and
beta=1.5 deviations straddle zero, some beta inside the bracket
reconciles the runs -- but only deltas up to the measured factor gap
|(f_b/f_p)^1.5 - 1| are attributable to machine state, so a straddle
widens the tolerance by that swing rather than waiving the gate
(r9 ADVICE: an uncapped straddle pass would mask real regressions
whenever the two runs' probe factors differ, which is always). If no
bounded model explains the delta, the cause is code, not machine
state. Tolerance per query: max(gate_pct% of the PERF
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
# cross-session deviation between r9 bench runs whose machine factors
# agreed within 6% (tpch_q5 1.19 vs 1.00, fn_json 0.80 vs 0.63,
# dedup_minhash_realistic 2.10 vs 1.83 -- 0.17-0.27 s of
# scheduler/GC noise that no probe normalization explains, on medians
# of 5). Falsifiable: any same-code pair of runs exceeding it re-pins
# this constant.
ABS_FLOOR = 0.30

# Noise-band multiplier for the per-query sampling-spread term: the
# committed BENCH_SAMPLES.json (the side artifact of the bench run
# whose medians ARE PERF.md's headline rows) records each query's 5
# raw samples; tol widens to NOISE_K * meanAD/median where the run's
# own spread demonstrates the medians cannot resolve 10%. MEAN
# absolute deviation, not median absolute deviation (r10): a noise
# band must CAPTURE the spread, not resist it -- with 5 samples of
# which 2 are throttle outliers (graph_pagerank pinned run: 10.6 to
# 21.0 s around a 14.8 s median), MAD reports the quiet majority's
# 0.4 s and flags the very same-code 11% cross-run delta the band
# exists to absorb; meanAD weighs the outliers that make the median
# itself wobble. For tight-sample queries meanAD ~= MAD, so stable
# rows keep their ~10% gates. (sigma ~= 1.25*meanAD for a normal;
# 2.5*meanAD remains a ~95% band for a difference of medians-of-5.)
NOISE_K = 2.5


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


def perf_noise() -> dict[str, float]:
    """Per-query noise tolerance (%) from the committed PERF-paired
    side artifact's raw samples; empty if the file is absent.

    Guard (r9 ADVICE): bench.py used to clobber this file on EVERY
    run (including the sf0.001 repeat=1 test smoke), silently turning
    the noise band into the run-under-test's own spread. bench.py now
    writes elsewhere by default and stamps sf/repeat; refuse any pin
    whose stamps don't match the PERF sweep conditions (sf=0.1,
    repeat>=3) so a stale or mis-pinned file can't license itself."""
    path = os.path.join(_ROOT, "BENCH_SAMPLES.json")
    if not os.path.exists(path):
        return {}
    side = json.load(open(path))
    if side.get("sf") != 0.1 or side.get("repeat", 0) < 3:
        print(f"WARNING: pinned BENCH_SAMPLES.json has sf={side.get('sf')} "
              f"repeat={side.get('repeat')} (want sf=0.1 repeat>=3); "
              "ignoring its noise bands -- re-pin from a PERF sweep "
              "with $SPARK_GRAFT_BENCH_SAMPLES", file=sys.stderr)
        return {}

    def med(xs):
        xs = sorted(xs)
        m = len(xs) // 2
        return xs[m] if len(xs) % 2 else (xs[m - 1] + xs[m]) / 2

    out = {}
    for q, prs in side.get("samples", {}).items():
        ts = [dt for dt, _ in prs]
        m = med(ts)
        if m > 0:
            mean_ad = sum(abs(t - m) for t in ts) / len(ts)
            out[q] = NOISE_K * mean_ad / m * 100.0
    return out


def main() -> None:
    bench_path = sys.argv[1]
    gate = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    bench = load_bench(bench_path)
    noise = perf_noise()
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
            cands["cpu15"] = (braw[name] * bf ** 1.5, praw * pf ** 1.5)
        devs = {k: (b - p) / max(p, 1e-9) * 100.0
                for k, (b, p) in cands.items()}
        best = min(devs, key=lambda k: abs(devs[k]))
        b, p = cands[best]
        tol = max(gate, ABS_FLOOR / p * 100.0, noise.get(name, 0.0))
        slack = abs(devs[best]) - tol
        # Bracket rule, CAPPED (r9 ADVICE: the old unconditional
        # slack=-1.0 auto-pass let any magnitude through whenever the
        # beta=0 and beta=1.5 deviations straddled zero, which happens
        # for ANY delta once the two runs' probe factors differ).
        # Machine state can explain at most the swing the beta bracket
        # itself can apply between the two runs' factors --
        # |(f_b/f_p)^1.5 - 1| -- so a straddle widens the tolerance by
        # exactly that measured factor gap instead of waiving it. The
        # bracket magnitude is printed (dev = nearer bound) so masked
        # deltas are visible instead of silently green.
        if ("cpu15" in devs and devs["raw"] != 0
                and (devs["raw"] > 0) != (devs["cpu15"] > 0)):
            swing = abs((bf / pf) ** 1.5 - 1.0) * 100.0
            bdev = min((devs["raw"], devs["cpu15"]), key=abs)
            bslack = abs(bdev) - (tol + swing)
            if bslack < slack:
                best, slack = "bracket", bslack
                devs["bracket"] = bdev
                tol = tol + swing
                cands["bracket"] = (cands["raw"]
                                    if bdev == devs["raw"]
                                    else cands["cpu15"])
        b, p = cands[best]
        dev = devs[best]
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
