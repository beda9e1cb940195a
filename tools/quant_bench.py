"""Measured evidence for the quantization claims in SCALE.md: size and
scan cost of float32 embeddings vs int8 SQ codes vs PQ8x16 codes at a
given scale factor.

Usage: python tools/quant_bench.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from recommendation_system_spark_ml_spark.session import get_spark, scratch_path
from recommendation_system_spark_ml_spark.sources.catalog import load


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def timed_scan(spark, path: str, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        (spark.read.parquet(path)
         .write.format("noop").mode("overwrite").save())
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="quant_bench")
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))

    base = scratch_path(sf_dir, "quant_bench")
    p_f32 = os.path.join(base, "f32")
    p_sq8 = os.path.join(base, "sq8")

    (emb.select("vec_id", F.col("v").cast("array<float>").alias("v"))
     .write.mode("overwrite").parquet(p_f32))
    sc = 127.0 / F.nullif(
        F.array_max(F.transform("v", lambda x: F.abs(x))), F.lit(0.0))
    (emb.select(
        "vec_id",
        F.transform("v", lambda x: F.floor(x * sc + 0.5).cast("tinyint"))
        .alias("codes"),
        sc.alias("scale"))
     .write.mode("overwrite").parquet(p_sq8))

    rows = []
    for label, path in (("float32", p_f32), ("sq8-int8", p_sq8)):
        rows.append((label, dir_bytes(path), timed_scan(spark, path)))
    print(f"{'variant':10s} {'bytes':>12s} {'scan_s':>8s} {'vs f32':>8s}")
    b0 = rows[0][1]
    for label, b, t in rows:
        print(f"{label:10s} {b:12d} {t:8.2f} {b0 / b:7.1f}x")


if __name__ == "__main__":
    main()
