"""Real-10x scale check (r6 verdict task 6): run the headline set at
sf0.1 AND at the freshly-generated sf1 (tools/gen_sf.py -- genuine
10x data volume, not key-shifted copies), report per-query wall
times and the log-log slope. Confirms AQE partition sizing and the
broadcast-threshold crossovers hold on real 10x data.

Usage: python tools/sf1_check.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recommendation_system_spark_ml_spark.registry import all_specs
from recommendation_system_spark_ml_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/rsml_sf1"
REPEAT = 3

# The r6-verdict headline list (flagship, tpch_q3/5/7, graph ops)
# plus the scale-shape families the docstrings make promises about.
QUERIES = (
    "flagship_cluster_avg", "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q7",
    "graph_pagerank", "graph_triangle_count", "graph_kcore",
    "split_leakage_safe", "dedup_minhash_checked", "sim_sq8",
    "window_rank", "sessionize_events", "pipeline_token_budget",
)


def main() -> None:
    names = sys.argv[1:] or QUERIES
    specs = all_specs()
    spark = get_spark(app_name="sf1_check")
    # warm: codegen + parquet footers for both dirs, untimed
    for sf in (SF01, SF1):
        specs["scan_parquet"].fn(spark, sf).write.format(
            "noop").mode("overwrite").save()
    results = {}
    for name in names:
        spec = specs[name]
        med = {}
        for sf, d in (("sf0.1", SF01), ("sf1", SF1)):
            runs = []
            for _ in range(REPEAT):
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                spec.fn(spark, d).write.format("noop").mode(
                    "overwrite").save()
                runs.append(time.perf_counter() - t0)
            med[sf] = sorted(runs)[len(runs) // 2]
        import math
        slope = math.log(med["sf1"] / med["sf0.1"]) / math.log(10)
        results[name] = {"sf0.1": round(med["sf0.1"], 2),
                         "sf1": round(med["sf1"], 2),
                         "slope": round(slope, 2)}
        print(f"{name:26s} sf0.1={med['sf0.1']:7.2f}s "
              f"sf1={med['sf1']:8.2f}s slope={slope:5.2f}", flush=True)
    out = "/tmp/rsml_sf1_check.json"
    json.dump(results, open(out, "w"), indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
