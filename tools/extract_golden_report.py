"""Extract the reference's published Results Report from its golden run
log into tests/fixtures/golden_report.json.

The reference repo ships assignment2.zip containing
out_with_memroy_2g_param.log (69 MB, Spark 3.0.1, MovieLens-1M,
2020-10-27) whose tail is the program's printed report
(MovieLensRecommender.py:239-259): the 9-row KMeans elbow table, the
27-row ALS CV grid, and the best-model metrics (README.md:45-55,
:107-140 quote the same numbers). This tool parses that report so
tests/test_golden_log.py can confront OUR selection logic against the
reference's own published numbers without needing MovieLens-1M itself.

Usage: python tools/extract_golden_report.py [path-to-log-or-zip]
       (default: /root/reference/assignment2.zip)
"""

from __future__ import annotations

import json
import os
import re
import sys
import zipfile

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "golden_report.json")
LOG_NAME = "out_with_memroy_2g_param.log"


def read_log(src: str) -> str:
    if src.endswith(".zip"):
        with zipfile.ZipFile(src) as z:
            return z.read(LOG_NAME).decode("utf-8", errors="replace")
    with open(src, encoding="utf-8", errors="replace") as f:
        return f.read()


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/assignment2.zip"
    text = read_log(src)
    report = text[text.index("Results Report"):]

    kmeans = []
    for m in re.finditer(
            r"^\d+\s+(\d+)\s+(-?\d+\.\d+)\s+(-?\d+\.\d+)\s+(-?\d+\.\d+)\s*$",
            report, re.M):
        k, sse, diff, rmse = m.groups()
        kmeans.append({"k": int(k), "sse": float(sse), "sse_diff": float(diff),
                       "training_rmse": float(rmse)})

    als = []
    for m in re.finditer(
            r"^\d+\s+(\d+)\s+(\d+)\s+(0\.\d+)\s+(\d+\.\d+)\s*$", report, re.M):
        rank, mi, reg, rmse = m.groups()
        als.append({"rank": int(rank), "max_iter": int(mi),
                    "reg_param": float(reg), "rmse": float(rmse)})

    def pick(pat):
        return float(re.search(pat, report).group(1))

    fixture = {
        "source": ("reference assignment2.zip :: out_with_memroy_2g_param.log"
                   " lines ~556054-556141 (MovieLensRecommender.py:239-259"
                   " printed report, MovieLens-1M, Spark 3.0.1, 2020-10-27)"),
        "kmeans_elbow": kmeans,
        "kmeans_best_k": pick(r"k:\s*(\d+\.?\d*)"),
        "kmeans_best_sse": pick(r"SSE:\s*(\d+\.\d+)"),
        "kmeans_train_rmse": pick(r"Training RMSE =\s*(1\.00\d+)"),
        "kmeans_test_rmse": pick(r"best KMeans model, the Test RMSE is:\s*(\d+\.\d+)"),
        "als_grid": als,
        "als_best_rank": pick(r"Rank:\s*(\d+\.?\d*)"),
        "als_best_max_iter": pick(r"MaxIter:\s*(\d+\.?\d*)"),
        "als_best_reg_param": pick(r"RegParam:\s*(0\.\d+)"),
        "als_train_rmse": pick(r"Training RMSE =\s*(0\.89\d+)"),
        "als_test_rmse": pick(r"best ALS model, the Test RMSE is\s*(\d+\.\d+)"),
    }
    assert len(kmeans) == 9, f"expected 9 elbow rows, got {len(kmeans)}"
    assert len(als) == 27, f"expected 27 grid rows, got {len(als)}"

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(fixture, f, indent=1)
    print(f"wrote {OUT}: 9 elbow rows, 27 grid rows")


if __name__ == "__main__":
    main()
