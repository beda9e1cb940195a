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
