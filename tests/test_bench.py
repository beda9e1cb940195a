"""bench.py is a driver deliverable: it must emit exactly one JSON line
with the contract fields, at any scale factor."""

import json
import os
import subprocess
import sys


def test_bench_contract_smoke():
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
               SPARK_GRAFT_CPUS="8",
               SPARK_GRAFT_BENCH_REPEAT="1")
    out = subprocess.run(
        [sys.executable, "bench.py"], env=env, capture_output=True,
        text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    assert set(rec) == {"metric", "value", "unit", "queries", "sf",
                        "repeat", "calib_sec", "calib_all_sec",
                        "ref_calib_sec", "queries_norm", "value_norm",
                        "queries_min", "samples"}
    assert rec["unit"] == "sec"
    assert rec["value"] > 0
    assert rec["sf"] == 0.001
    assert rec["repeat"] == 1
    assert rec["calib_sec"] > 0  # machine-speed probe (r7: throttle
    # drift between artifact runs is attributable via this scalar)
    assert all(v >= 0 for v in rec["queries"].values())
    # r8: the normalization contract -- six bracketing probe samples
    # reported, plus queries_norm = per-query median of samples each
    # rescaled by its OWN adjacent probe (per-sample calibration; a
    # single run-level factor measured ±30% residuals because the VM
    # throttle flips faster than one bench run).
    assert len(rec["calib_all_sec"]) == 6
    assert all(c > 0 for c in rec["calib_all_sec"])
    assert rec["ref_calib_sec"] > 0
    assert set(rec["queries_norm"]) == set(rec["queries"])
    assert all(v >= 0 for v in rec["queries_norm"].values())
    assert rec["value_norm"] > 0
    # per-sample (time, probe) pairs ride along for drift diagnosis;
    # queries_min is the noise-robust cross-run estimator (throttle
    # only ADDS time, so min-of-samples tracks the true plan cost).
    assert set(rec["queries_min"]) == set(rec["queries"])
    for n, pairs in rec["samples"].items():
        assert len(pairs) >= 1 and all(len(pr) == 2 for pr in pairs)
        assert abs(min(pr[0] for pr in pairs) - rec["queries_min"][n]) < 1e-6


def test_bench_median_helper():
    from bench import _median
    assert _median([3.0, 1.0, 2.0]) == 2.0
    assert _median([4.0, 1.0]) == 2.5
    assert _median([7.0]) == 7.0
