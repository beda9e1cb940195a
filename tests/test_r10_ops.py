"""Round-10 local gates: the adaptive-banding clamp edges, the
promoted realistic-trio contract booleans, and the ALS-eval contract
invariants (the hash-green driver rows are the primary gate; these pin
the fixture-conditional halves)."""

import pyspark.sql.functions as F

from recommendation_system_spark_ml_spark.registry import all_specs
from tests.conftest import SF_SMOKE


def _specs():
    return all_specs()


def test_lsh_band_bits_clamp_edges():
    """b = clamp(ceil(log2 n) - 3, 6, 16): exact behavior at every
    crossing point (r9 verdict task 3 -- the upper clamp needs n >=
    2^19, far beyond any probe corpus, so the rule is pinned here)."""
    from recommendation_system_spark_ml_spark.operators.similarity import (
        lsh_band_bits)

    assert lsh_band_bits(0) == 6       # degenerate floors to n=2
    assert lsh_band_bits(1) == 6
    assert lsh_band_bits(512) == 6     # last n at the lower clamp
    assert lsh_band_bits(513) == 7     # first n above it
    assert lsh_band_bits(1 << 13) == 10
    assert lsh_band_bits((1 << 19) - 1) == 16  # reaches 16 just below 2^19
    assert lsh_band_bits(1 << 19) == 16        # exactly at the upper clamp
    assert lsh_band_bits((1 << 19) + 1) == 16  # clamped above it
    assert lsh_band_bits(1 << 30) == 16
    # 192-bit budget divides cleanly enough for >= 12 tables everywhere
    for n in (1, 512, 513, 1 << 19, 1 << 25):
        assert 192 // lsh_band_bits(n) >= 12


def test_realistic_trio_contracts_green(spark):
    """The r10-promoted contracts hold on the smoke corpus: every
    probe row's booleans are TRUE and the exact counts are sane."""
    mh = _specs()["dedup_minhash_realistic"].fn(spark, SF_SMOKE).collect()
    assert len(mh) > 0
    for r in mh:
        assert r.minhash_le_exact and r.dups_complete
        assert r.n_exact_dups <= r.n_exact_nd
    lsh = _specs()["sim_lsh_realistic"].fn(spark, SF_SMOKE).collect()
    assert len(lsh) > 0
    assert all(r.lsh_count_le_exact for r in lsh)


def test_als_eval_contract_invariants(spark):
    from recommendation_system_spark_ml_spark.operators.recsys_eval import (
        EVAL_USER_CAP)

    row = _specs()["ml_rec_eval_als"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_train > 0 and row.n_test > 0
    assert 0 < row.n_eval_users <= min(row.n_test, EVAL_USER_CAP)
    # ~80/20 Knuth split
    frac = row.n_train / (row.n_train + row.n_test)
    assert 0.7 < frac < 0.9
    assert row.scored_subset_of_pool
    assert row.metrics_in_unit_range and row.ndcg_in_band


def test_cms_fold_keeps_product_in_int64():
    """The mod-2^31 fold bounds the Knuth product for ANY key (the
    r9-ADVICE overflow class) and is an identity at fixture scales."""
    from recommendation_system_spark_ml_spark.operators.aggregates import (
        CM_DEPTH, CM_SALT)

    worst = (2 ** 31 - 1) * 2654435761
    assert worst < 2 ** 63 - 1
    # identity at fixture scale: folding changes nothing for small keys
    for k in (1, 200_000, 3_000_000):
        for r in range(CM_DEPTH):
            x = k + r * CM_SALT
            assert x % 2147483648 == x


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_cms_merge_plans_bounded_and_partial(spark):
    """Both sketch passes must partial-aggregate (map-side combine to
    the <= 1,024-cell table BEFORE any exchange) and the shard merge
    must not shuffle anything row-sized."""
    df = _specs()["agg_cms_merge"].fn(spark, SF_SMOKE)
    plan = _plan(df)
    # partial + final HashAggregate pairs around exchanges
    assert plan.count("HashAggregate") >= 4
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert 0 < len(rows) <= 1024
    assert all(r.merge_exact for r in rows)
    # every cell row's count is positive and depth ids are in range
    assert all(r.cnt > 0 and 0 <= r.r <= 3 for r in rows)


def test_matryoshka_probe_is_broadcast_linear(spark):
    """The probe side must broadcast (BroadcastNestedLoopJoin with the
    bounded query slice as build side) -- never a data x data
    cartesian -- and the agreement must be perfect on self-similar
    geometry at smoke scale only when ranks genuinely agree."""
    df = _specs()["vec_matryoshka_agreement"].fn(spark, SF_SMOKE)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    rows = df.collect()
    from recommendation_system_spark_ml_spark.operators.similarity import (
        N_QUERIES, TOP_K)
    assert len(rows) == N_QUERIES
    for r in rows:
        assert 0 <= r.n_overlap <= TOP_K
        # rank-1 agreement implies the ids appear in both top lists
        if r.top1_full == r.top1_trunc:
            assert r.n_overlap >= 1
