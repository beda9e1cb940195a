"""Golden-log confrontation: run OUR selection/diff logic on the
reference's OWN published numbers and require its published picks back.

The reference repo ships its full MovieLens-1M run log
(assignment2.zip :: out_with_memroy_2g_param.log); its printed report
(MovieLensRecommender.py:239-259) is committed as
tests/fixtures/golden_report.json via tools/extract_golden_report.py.
MovieLens-1M itself is not available in this sandbox, so raw-data
replay is impossible -- but every DERIVED step (elbow diffing, best-k
rule, CV-grid enumeration order, idxmin best-model rule, the
best-grid-cell identity) can be confronted exactly: feed their tables
through our production helpers and compare to their published output.
If any of our rules drifts from the reference's, these tests fail.
"""

from __future__ import annotations

import json
import os

import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_report.json")


@pytest.fixture(scope="module")
def golden():
    with open(FIXTURE) as f:
        return json.load(f)


def test_elbow_frame_reproduces_published_table_and_pick(spark, golden):
    """elbow_frame on the golden (k, SSE) pairs must reproduce the
    published SSEDiff column bit-for-bit (to print precision) and flag
    the published best k=3 (largest SSE drop, MLR.py:47-51)."""
    from recommendation_system_spark_ml_spark.ml.parity import elbow_frame

    rows = [(r["k"], r["sse"]) for r in golden["kmeans_elbow"]]
    out = {r["k"]: r for r in (elbow_frame(spark, rows)
                               .collect())}
    assert len(out) == 9
    for want in golden["kmeans_elbow"]:
        got = out[want["k"]]
        # the log prints SSE to 6 decimals, so a diff recomputed from
        # two rounded SSEs can be off by up to 2 ULPs of the print grid
        assert abs(got["sse_diff"] - want["sse_diff"]) < 2e-6, want
    best = [k for k, r in out.items() if r["is_best"] == 1]
    assert best == [int(golden["kmeans_best_k"])] == [3]
    assert abs(out[3]["sse"] - golden["kmeans_best_sse"]) < 1e-6


def test_elbow_best_k_pure_twin_agrees(golden):
    from recommendation_system_spark_ml_spark.ml.parity import elbow_best_k

    sse = {r["k"]: r["sse"] for r in golden["kmeans_elbow"]}
    assert elbow_best_k(sse) == 3


def test_param_grid_enumeration_matches_published_order(golden):
    """ml_als_cv_full builds ParamGridBuilder with addGrid(rank),
    addGrid(maxIter), addGrid(regParam) -- the same call order as
    MLR.py:212-221. The published 27-row table enumerates regParam
    fastest, then maxIter, then rank; our grid_idx ordering must
    match it row-for-row or the artifact we emit is shuffled."""
    from pyspark.ml.recommendation import ALS
    from pyspark.ml.tuning import ParamGridBuilder

    als = ALS(userCol="userId", itemCol="movieId", ratingCol="rating")
    grid = (ParamGridBuilder()
            .addGrid(als.rank, [1, 10, 100])
            .addGrid(als.maxIter, [5, 10, 15])
            .addGrid(als.regParam, [0.001, 0.01, 0.05])
            .build())
    ours = [(pm[als.rank], pm[als.maxIter], float(pm[als.regParam]))
            for pm in grid]
    theirs = [(r["rank"], r["max_iter"], r["reg_param"])
              for r in golden["als_grid"]]
    assert ours == theirs


def test_best_by_min_rmse_picks_published_als_model(golden):
    """Our idxmin twin over the golden 27-row grid must select the
    published best model: rank 10, maxIter 15, regParam 0.05 at
    RMSE 0.892506 (MLR.py:40-44,:63; README.md:107-140)."""
    from recommendation_system_spark_ml_spark.ml.parity import best_by_min_rmse

    rows = [(r["rank"], r["max_iter"], r["reg_param"], r["rmse"])
            for r in golden["als_grid"]]
    best = best_by_min_rmse(rows, 3)
    assert best[:3] == (int(golden["als_best_rank"]),
                        int(golden["als_best_max_iter"]),
                        golden["als_best_reg_param"]) == (10, 15, 0.05)
    assert abs(best[3] - 0.892506) < 1e-9
    # published train RMSE of the winning refit agrees with the grid
    # cell to print precision (the refit uses the same params/seed)
    assert abs(golden["als_train_rmse"] - best[3]) < 5e-7


def test_golden_metrics_internally_consistent(golden):
    """Sanity on the fixture itself: published best-k SSE appears in
    the elbow table, and test RMSEs sit near their train RMSEs --
    guards against a future regeneration mis-parsing the log."""
    table = {r["k"]: r["sse"] for r in golden["kmeans_elbow"]}
    assert abs(table[3] - golden["kmeans_best_sse"]) < 1e-6
    assert 0.8 < golden["als_test_rmse"] < 0.9
    assert 1.0 < golden["kmeans_test_rmse"] < 1.1
