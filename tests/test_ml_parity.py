"""Semantic checks for the ML parity surface (SURVEY.md §2.8): the
reference's KMeans-elbow / cluster-average / ALS pipeline rebuilt on the
star schema must behave like a recommender, not just run."""

import pytest

from tests.conftest import SF_SMOKE
from recommendation_system_spark_ml_spark.ml.parity import (
    ml_als_rmse, ml_cluster_predictor, ml_kmeans_elbow, ratings_analog)


def test_kmeans_elbow_table_shape_and_monotone_sse(spark):
    rows = {r.k: r for r in ml_kmeans_elbow(spark, SF_SMOKE).collect()}
    assert sorted(rows) == list(range(2, 11))
    # SSE is non-increasing in k for a seeded sweep on well-separated data.
    sses = [rows[k].sse for k in range(2, 11)]
    assert all(a >= b for a, b in zip(sses, sses[1:]))
    # Exactly one best k; reference quirk: k=2 (diff forced to 0) can't win.
    best = [k for k in rows if rows[k].is_best == 1]
    assert len(best) == 1 and best[0] != 2


def test_cluster_predictor_rmse_sane(spark):
    rows = {r.split: r for r in ml_cluster_predictor(spark, SF_SMOKE).collect()}
    assert set(rows) == {"train", "test"}
    for r in rows.values():
        assert 0.0 < r.rmse < 50.0  # ratings are avg quantities (1..50)
        assert r.n > 0
    # ~70/30 split.
    frac = rows["train"].n / (rows["train"].n + rows["test"].n)
    assert 0.6 < frac < 0.8


def test_als_rmse_two_ways_agree(spark):
    row = ml_als_rmse(spark, SF_SMOKE).first()
    assert row.n_test > 0
    assert row.rmse_evaluator == pytest.approx(row.rmse_agg, abs=1e-3)
    assert 0.0 < row.rmse_evaluator < 50.0


def test_ratings_analog_is_a_matrix(spark):
    df = ratings_analog(spark, SF_SMOKE)
    assert df.columns == ["userId", "movieId", "rating"]
    first = df.first()
    assert first.rating > 0
