"""The reference-native '::' text ingest + MovieLens twin generator:
typed parse, genre invariants, one-hot vocabulary discovery, and the
end-to-end report query."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from recommendation_system_spark_ml_spark.sources.text import (
    GENRES, genre_onehot, load_movielens)


@pytest.fixture(scope="module")
def movielens(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ml_twin"))
    return load_movielens(spark, d)


def test_parse_types_fixed_at_ingest(movielens):
    movies, ratings = movielens
    assert dict(movies.dtypes) == {"movieId": "int", "title": "string",
                                   "genres": "string"}
    assert dict(ratings.dtypes) == {"userId": "int", "movieId": "int",
                                    "rating": "float"}


def test_generator_invariants(movielens):
    movies, ratings = movielens
    assert movies.count() == 200
    # every genre appears at least once (runtime-vocabulary invariant)
    seen = {r.genre for r in movies.select(
        F.explode(F.split("genres", r"\|")).alias("genre")).distinct().collect()}
    assert seen == set(GENRES)
    # each user has exactly 20 ratings; ratings are whole-ish stars in 1..5
    per_user = ratings.groupBy("userId").count()
    assert per_user.agg(F.min("count"), F.max("count")).first() == (20, 20)
    mn, mx = ratings.agg(F.min("rating"), F.max("rating")).first()
    assert 1.0 <= mn and mx <= 5.0


def test_onehot_discovers_vocabulary(movielens):
    movies, _ = movielens
    onehot = genre_onehot(movies)
    assert set(onehot.columns) == {"movieId"} | set(GENRES)
    # one-hot rows: flags sum to the movie's genre count
    flags = sum(F.col(g) for g in GENRES)
    bad = (onehot.join(movies, "movieId")
           .where(flags != F.size(F.split("genres", r"\|"))).count())
    assert bad == 0


def test_movielens_report_smoke(spark):
    from recommendation_system_spark_ml_spark.ml.parity import ml_movielens_report
    rows = {r.metric: r.value for r in
            ml_movielens_report(spark, SF_SMOKE).collect()}
    assert set(rows) == {"kmeans_best_k", "kmeans_sse_best_k",
                         "kmeans_train_rmse", "kmeans_test_rmse",
                         "als_test_rmse"}
    assert 3 <= rows["kmeans_best_k"] <= 10  # k=2 can never win
    assert 0 < rows["als_test_rmse"] < 3
    assert 0 < rows["kmeans_test_rmse"] < 3
