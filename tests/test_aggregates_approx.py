"""HLL sketch accuracy: approx_count_distinct must stay within 5% of
the exact distinct count at the configured 2% rsd."""

from tests.conftest import SF_SMOKE


def test_approx_distinct_within_tolerance(spark):
    from recommendation_system_spark_ml_spark.operators.aggregates import agg_approx
    for r in agg_approx(spark, SF_SMOKE).collect():
        rel_err = abs(r.approx_parts - r.exact_parts) / r.exact_parts
        assert rel_err <= 0.05, f"{r.l_returnflag}: {rel_err:.3f}"


def test_stratified_sample_fractions(spark):
    from recommendation_system_spark_ml_spark.operators.relational import (
        sample_stratified)
    for r in sample_stratified(spark, SF_SMOKE).collect():
        got_frac = r.n_sampled / r.n_pop
        # Bernoulli sampling: 6-sigma bound on the observed fraction
        import math
        sigma = math.sqrt(r.target_fraction * (1 - r.target_fraction) / r.n_pop)
        assert abs(got_frac - r.target_fraction) <= 6 * sigma + 1e-9, \
            f"{r.l_returnflag}: {got_frac} vs {r.target_fraction}"
