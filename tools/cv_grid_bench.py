"""Reproduce the reference's FULL ALS cross-validation at MovieLens-1M
scale: rank {1,10,100} x maxIter {5,10,15} x regParam {0.001,0.01,0.05},
3 folds = 81 fits + the winning refit (MovieLensRecommender.py:211-226),
on the 1M-shaped twin (3,706 movies / 6,040 users / ~1M ratings).

This is the workload BASELINE.md clocks at ~2h20m sequential on the
reference's single core; here CrossValidator(parallelism=8) overlaps
fits across local[32]. The registered query ml_als_cv_full runs the
same grid on a small twin (grid fidelity at harness speed); this tool
is the apples-to-apples wall-clock evidence at the reference's data
size. README.md cites the measured number.

Usage: python tools/cv_grid_bench.py  (takes minutes; run on an idle node)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.recommendation import ALS
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import functions as F

from recommendation_system_spark_ml_spark.ml.parity import SEED, _hash_split
from recommendation_system_spark_ml_spark.session import get_spark
from recommendation_system_spark_ml_spark.sources.text import (
    generate_movielens_twin, parse_ratings)


def main() -> None:
    spark = get_spark(app_name="cv_grid_bench")
    scratch = os.path.join(tempfile.gettempdir(), "spark_graft_movielens_sf0.1")
    _, ratings_path = generate_movielens_twin(
        spark, scratch, n_movies=3706, n_users=6040, ratings_per_user=166)
    ratings = parse_ratings(spark.read.text(ratings_path))
    train = (_hash_split(ratings,
                         F.col("userId").cast("bigint") * 4096 + F.col("movieId"))
             .filter(F.col("split") == "train").drop("split").cache())
    n_train = train.count()  # materialize the cache outside the timed region

    als = ALS(userCol="userId", itemCol="movieId", ratingCol="rating",
              implicitPrefs=False, coldStartStrategy="drop", seed=SEED)
    grid = (ParamGridBuilder()
            .addGrid(als.rank, [1, 10, 100])
            .addGrid(als.maxIter, [5, 10, 15])
            .addGrid(als.regParam, [0.001, 0.01, 0.05])
            .build())
    evaluator = RegressionEvaluator(metricName="rmse", labelCol="rating",
                                    predictionCol="prediction")
    cv = CrossValidator(estimator=als, estimatorParamMaps=grid,
                        evaluator=evaluator, numFolds=3,
                        parallelism=8, seed=SEED)
    t0 = time.perf_counter()
    model = cv.fit(train)
    dt = time.perf_counter() - t0

    rows = sorted(((pm[als.rank], pm[als.maxIter], float(pm[als.regParam]),
                    float(m)) for pm, m in zip(grid, model.avgMetrics)),
                  key=lambda r: r[3])
    best = rows[0]
    print(f"\ntrain rows: {n_train}")
    print(f"81 fits + best refit: {dt:.1f}s "
          f"(reference: ~2h20m sequential, BASELINE.md)")
    print(f"best params: rank={best[0]} maxIter={best[1]} "
          f"regParam={best[2]} avg_rmse={best[3]:.5f}")
    print("\nfull grid (sorted by avg_rmse):")
    for r in rows:
        print(f"  rank={r[0]:>3} maxIter={r[1]:>2} reg={r[2]:<5} "
              f"rmse={r[3]:.5f}")


if __name__ == "__main__":
    main()
