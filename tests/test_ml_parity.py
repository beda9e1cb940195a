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
    # Nested seeding (k+1's initial centers are k's plus one more)
    # keeps SSE non-increasing in k on this data even at fixed rounds.
    sses = [rows[k].sse for k in range(2, 11)]
    assert all(a >= b for a, b in zip(sses, sses[1:]))
    assert all(s >= 0 for s in sses)
    # diff column telescopes the sse column exactly
    for k in range(3, 11):
        assert rows[k].sse_diff == pytest.approx(
            round(rows[k].sse - rows[k - 1].sse, 4), abs=1e-9)
    # Exactly one best k; reference quirk: k=2 (diff forced to 0) can't win.
    best = [k for k in rows if rows[k].is_best == 1]
    assert len(best) == 1 and best[0] != 2


def test_cluster_predictor_rmse_sane(spark):
    rows = {r.split: r for r in ml_cluster_predictor(spark, SF_SMOKE).collect()}
    assert set(rows) == {"train", "test"}
    for r in rows.values():
        assert 0.0 < r.rmse < 50.0  # ratings are avg quantities (1..50)
        assert r.n > 0
        assert r.clusters_refine_types  # guaranteed by construction
        # r9 ADVICE cross-checks: falsifiable when the fit merges types
        assert r.partition_bijective
        assert r.cluster_rmse_matches
    # ~70/30 split.
    frac = rows["train"].n / (rows["train"].n + rows["test"].n)
    assert 0.6 < frac < 0.8


def test_cluster_predictor_kmeans_partition_equals_type_partition(spark):
    """The fixture-conditional half of the ml_cluster_predictor
    contract: with k = |p_type vocabulary| = 6 pairwise-sqrt(2)
    one-hot vectors, the seeded KMeans separates all six, so the
    production cluster-partition RMSE EQUALS the hashed
    type-partition RMSE (the docstring's pinned claim)."""
    from recommendation_system_spark_ml_spark.ml.parity import (
        cluster_predictor_frames)

    cluster_rmse, typed_rmse, refine = cluster_predictor_frames(
        spark, SF_SMOKE)
    c = {r.split: r for r in cluster_rmse.collect()}
    t = {r.split: r for r in typed_rmse.collect()}
    assert set(c) == set(t) == {"train", "test"}
    for split in c:
        assert c[split].n == t[split].n
        assert c[split].rmse == pytest.approx(t[split].rmse, abs=1e-9)
    assert refine.first().clusters_refine_types


def test_als_rmse_two_ways_agree(spark):
    """Band-pins the actual ALS RMSE (the value outside the hashed
    region) and the evaluator-vs-aggregate agreement the contract
    boolean summarizes."""
    from recommendation_system_spark_ml_spark.ml.parity import (
        als_rmse_detail)

    rmse_eval, rmse_agg, n_test, _train = als_rmse_detail(spark, SF_SMOKE)
    assert n_test > 0
    assert rmse_eval == pytest.approx(rmse_agg, abs=1e-3)
    assert 0.0 < rmse_eval < 50.0
    row = ml_als_rmse(spark, SF_SMOKE).first()
    assert row.n_test_scored == n_test  # cold-start drop == SQL filter
    assert row.evaluator_agrees_aggregate and row.als_rmse_finite
    assert 0.0 < row.baseline_user_rmse < 50.0


def test_als_cv_full_reproduces_reference_grid(spark):
    """The full-fidelity CV artifact must be the reference's exact
    27-combo grid (MLR.py:211-226) in ParamGridBuilder order, with the
    best row selected as first-minimal avg RMSE (MLR.py:63 idxmin)."""
    from itertools import product

    from recommendation_system_spark_ml_spark.ml.parity import ml_als_cv_full

    rows = ml_als_cv_full(spark, SF_SMOKE).collect()
    assert len(rows) == 27
    # grid order: regParam varies fastest (last addGrid), rank slowest.
    expected = [(r, m, lam) for r, m, lam in
                product([1, 10, 100], [5, 10, 15], [0.001, 0.01, 0.05])]
    got = [(r.rank, r.max_iter, r.reg_param) for r in sorted(rows, key=lambda r: r.grid_idx)]
    assert got == expected
    # contract booleans all hold: finite in-band RMSE, best is the min
    assert all(r.rmse_in_band for r in rows)
    assert all(r.best_attains_min for r in rows)
    best = [r for r in rows if r.is_best == 1]
    assert len(best) == 1
    # the twin reproduces the reference's published winner identity
    # (README.md:107-140) -- also pinned in the DuckDB oracle
    assert (best[0].rank, best[0].max_iter, best[0].reg_param) == (10, 15, 0.05)


def test_ratings_analog_is_a_matrix(spark):
    df = ratings_analog(spark, SF_SMOKE)
    assert df.columns == ["userId", "movieId", "rating"]
    first = df.first()
    assert first.rating > 0


# Golden regression fixture: ml_movielens_report at the smoke twin
# (200 movies x 150 users x 20 ratings/user, seed 823) is fully
# deterministic -- twin generation is xxhash-based, the split is the
# Knuth hash, KMeans/ALS are seeded, AND the fit inputs are pinned to
# a fixed hash layout + within-partition sort (KMeans|| samples rows
# positionally per partition, so without the pin the report varied
# with local[N]) -- verified bit-identical across local[8]/[16]/[32].
# A drift here means an ML refactor changed semantics, not noise.
# (The reference's published numbers, README.md:45-55, are from real
# MovieLens-1M which is not in this sandbox; this pins OUR pipeline's
# numbers the same way theirs pins theirs.)
_REPORT_GOLD = {
    "kmeans_best_k": 5.0,
    "kmeans_sse_best_k": 221.6469,
    "kmeans_train_rmse": 0.5601,
    "kmeans_test_rmse": 0.7709,
    "als_test_rmse": 0.5756,
}


def test_movielens_report_matches_golden_fixture(spark):
    from recommendation_system_spark_ml_spark.ml.parity import (
        ml_movielens_report)

    got = {r.metric: r.value for r in
           ml_movielens_report(spark, SF_SMOKE).collect()}
    assert set(got) == set(_REPORT_GOLD)
    assert got["kmeans_best_k"] == _REPORT_GOLD["kmeans_best_k"]
    for metric, want in _REPORT_GOLD.items():
        assert got[metric] == pytest.approx(want, rel=1e-3), \
            f"{metric}: {got[metric]} vs golden {want}"


def test_als_cv_grid_order_and_fixture_winner(spark):
    """Pins what the ml_als_cv contract hash cannot: the 2x2 grid's
    avg RMSEs are finite/in-band and the first-minimal winner is
    stable on the fixture (seeded CV, deterministic split)."""
    import math

    from recommendation_system_spark_ml_spark.ml.parity import als_cv_detail

    rows, best = als_cv_detail(spark, SF_SMOKE)
    assert [(r, p) for r, p, _ in rows] == [(8, 0.05), (8, 0.5),
                                            (12, 0.05), (12, 0.5)]
    assert all(math.isfinite(m) and 0 < m < 50 for _, _, m in rows)
    assert best[2] == min(m for _, _, m in rows)
