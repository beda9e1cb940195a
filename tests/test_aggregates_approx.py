"""HLL sketch accuracy: approx_count_distinct must stay within 5% of
the exact distinct count at the configured 2% rsd."""

from tests.conftest import SF_SMOKE


def test_approx_distinct_within_tolerance(spark):
    from recommendation_system_spark_ml_spark.operators.aggregates import agg_approx
    for r in agg_approx(spark, SF_SMOKE).collect():
        rel_err = abs(r.approx_parts - r.exact_parts) / r.exact_parts
        assert rel_err <= 0.05, f"{r.l_returnflag}: {rel_err:.3f}"
