import duckdb
import pytest

from tests.conftest import SF_CHECK, SF_SMOKE, assert_df_matches, oracle_df


@pytest.fixture(scope="module")
def specs():
    from recommendation_system_spark_ml_spark.registry import all_specs
    return all_specs()


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"c_mktsegment", "order_year", "n_items", "sum_qty",
            "sum_rev", "avg_rev", "rmse_dev"} == set(df.columns)


def test_flagship_vs_oracle(spark, duck, specs):
    spec = specs["flagship_cluster_avg"]
    got = spec.fn(spark, SF_CHECK)
    want = oracle_df(duck, spec.oracle, SF_CHECK)
    assert_df_matches(got, want)


def test_contract_shapes():
    import __spark_entry__ as e
    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert "flagship_cluster_avg" in osql
