"""Measured skew-join experiment: one hot key owning ~half the fact
rows, joined to a dimension too large to broadcast. Times three
plans -- naive sort-merge (AQE off), salted (explicit, AQE off), and
AQE skew-join -- and prints one JSON line. Evidence for SCALE.md §2.

Usage: python tools/skew_bench.py [n_fact_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from recommendation_system_spark_ml_spark.session import get_spark

N_SALTS = 32


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark(app_name="skew_bench")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # fact: key 0 owns ~50% of rows; the rest spread over 100k keys
    fact = (spark.range(n).select(
        F.when(F.col("id") % 2 == 0, 0)
         .otherwise(F.abs(F.xxhash64("id")) % 100_000).alias("k"),
        (F.col("id") % 1000).alias("v")))
    dim = (spark.range(100_000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 97).alias("w")))

    def run(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    results = {}

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    naive = (fact.join(dim, "k")
             .groupBy().agg(F.sum(F.col("v") * F.col("w")).alias("s")))
    results["naive_smj_aqe_off"] = run(naive)

    salted_fact = fact.withColumn(
        "salt", (F.abs(F.xxhash64("k", "v")) % N_SALTS))
    salted_dim = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(N_SALTS)])))
    salted = (salted_fact.join(salted_dim, ["k", "salt"])
              .groupBy().agg(F.sum(F.col("v") * F.col("w")).alias("s")))
    results["salted_aqe_off"] = run(salted)

    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    results["aqe_skew_join"] = run(naive)

    # correctness: all three must agree
    a = naive.first().s
    b = salted.first().s
    assert a == b, (a, b)
    print(json.dumps({"rows": n, "hot_key_share": 0.5, **results,
                      "checksum_equal": True}))


if __name__ == "__main__":
    main()
