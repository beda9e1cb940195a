"""Golden-number band regression on the MovieLens-1M-SHAPED twin.

ml_movielens_report pins the feature layout (repartition(8, movieId) +
sortWithinPartitions) precisely so the KMeans sweep is a function of
(data, seed), not of upstream parallelism. This test enforces that
promise at the true 1M shape (3,706 movies -- the bench
configuration): two sweeps prepared from deliberately different
upstream partitionings must land in a tight band, the SSE curve must
be monotone-decreasing, and the elbow pick must not drift.

Measured basis (r4): the pinned layout is bit-identical across
upstream widths (per-partition row order verified), and per-k SSE
agrees to ~1e-6 relative between runs -- the residual is float-
summation order inside MLlib's concurrent treeAggregate, which is why
the assertion is a BAND (1e-3 absolute on ~4e3-magnitude SSEs), not
bit equality. Real clustering drift (a different local optimum, a
sampling change, layout sensitivity) moves SSE by whole units and
fails loudly.
"""

import os
import tempfile

from pyspark.ml.feature import VectorAssembler

from recommendation_system_spark_ml_spark.ml.parity import (
    elbow_best_k, kmeans_sweep)
from recommendation_system_spark_ml_spark.sources.text import (
    generate_movielens_twin, genre_onehot, parse_movies)

GOLDEN_BEST_K = 9          # elbow pick on the 1M twin, seed 823
SSE_BAND = 1e-3            # absolute; >> summation jitter, << drift


def test_movielens_1m_sse_sweep_band(spark):
    scratch = os.path.join(tempfile.gettempdir(),
                           "spark_graft_movielens_sf0.1")
    movies_path, _ = generate_movielens_twin(
        spark, scratch, n_movies=3706, n_users=6040, ratings_per_user=166)
    onehot = genre_onehot(parse_movies(spark.read.text(movies_path)))
    gcols = [c for c in onehot.columns if c != "movieId"]

    def sweep(upstream_parts: int) -> dict[int, float]:
        feats = (VectorAssembler(inputCols=gcols, outputCol="features")
                 .transform(onehot.repartition(upstream_parts))
                 .repartition(8, "movieId")
                 .sortWithinPartitions("movieId").cache())
        sse = dict(kmeans_sweep(feats))
        feats.unpersist()
        return sse

    a, b = sweep(3), sweep(17)
    # layout invariance: different upstream widths, same curve
    assert set(a) == set(b) == set(range(2, 11))
    for k in a:
        assert abs(a[k] - b[k]) < SSE_BAND, (k, a[k], b[k])
    # the SSE curve is monotone-decreasing on this twin (measured)
    ks = sorted(a)
    for k0, k1 in zip(ks, ks[1:]):
        assert a[k0] > a[k1], f"SSE rose at k={k1}: {a[k0]} -> {a[k1]}"
    # elbow pick is stable across layouts and pinned to the golden k
    assert elbow_best_k(a) == elbow_best_k(b) == GOLDEN_BEST_K


def test_movielens_1m_report_als_beats_cluster_predictor(spark):
    """r6 verdict task 7: confront the END-TO-END report at full
    MovieLens-1M cardinality (6,040 users x 3,706 movies x ~1M
    ratings -- the bench twin) and assert the ordering the reference
    published for its real run: ALS test RMSE (README.md:137, 0.858)
    beats the cluster-average predictor's test RMSE (README.md:119,
    ~1.037). The absolute values are twin-specific; the ORDERING is
    the derived-logic invariant -- a personalized factor model must
    out-predict a per-(user, cluster) mean on held-out data, and a
    regression that flips it (a broken split, a leaked test set, a
    mis-wired evaluator) is a real bug on any data."""
    from recommendation_system_spark_ml_spark.ml.parity import (
        ml_movielens_report)

    vals = {r.metric: r.value for r in
            ml_movielens_report(spark, "/root/testdata/sf0.1").collect()}
    assert set(vals) == {"kmeans_best_k", "kmeans_sse_best_k",
                         "kmeans_train_rmse", "kmeans_test_rmse",
                         "als_test_rmse"}
    assert vals["als_test_rmse"] < vals["kmeans_test_rmse"], vals
    # train <= test for the cluster predictor (it memorizes its means)
    assert vals["kmeans_train_rmse"] <= vals["kmeans_test_rmse"], vals
    # both RMSEs live on the reference's observed scale (its published
    # run: 0.858 ALS / ~1.04 cluster) -- wide band, catches unit bugs
    assert 0.2 < vals["als_test_rmse"] < 2.0, vals
    assert 0.2 < vals["kmeans_test_rmse"] < 2.0, vals
