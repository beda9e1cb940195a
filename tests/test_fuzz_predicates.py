"""Property-based cross-engine fuzzing: random predicate trees over
`orders` must filter to identical row sets in Spark and DuckDB. The
fixed oracle suite checks 70 hand-written queries; this checks the
*dialect* -- comparison, boolean composition, BETWEEN, IN, LIKE --
over a search space of generated predicates."""

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_SMOKE
from recommendation_system_spark_ml_spark.sources.catalog import path_for

# Leaf predicates: every one is total (no NULL semantics in play --
# testdata has no NULLs) and spelled identically in both dialects.
_LEAVES = [
    "o_totalprice > {p}",
    "o_totalprice <= {p}",
    "o_custkey % 10 = {d}",
    "o_orderstatus = '{s}'",
    "o_orderstatus <> '{s}'",
    "o_orderpriority LIKE '{d}-%'",
    "o_totalprice BETWEEN {p} AND {p2}",
    "o_custkey IN ({d}, {d2}, {d3})",
    "year(o_orderdate) = {y}",
]


@st.composite
def predicates(draw, depth=0):
    if depth >= 2 or draw(st.booleans()):
        tpl = draw(st.sampled_from(_LEAVES))
        p = draw(st.integers(1000, 400000))
        return tpl.format(
            p=p, p2=p + draw(st.integers(0, 200000)),
            d=draw(st.integers(0, 9)), d2=draw(st.integers(10, 500)),
            d3=draw(st.integers(501, 1500)),
            s=draw(st.sampled_from(["O", "F", "P"])),
            y=draw(st.integers(1995, 1999)))
    op = draw(st.sampled_from(["AND", "OR"]))
    left = draw(predicates(depth=depth + 1))
    right = draw(predicates(depth=depth + 1))
    neg = "NOT " if draw(st.booleans()) else ""
    return f"{neg}(({left}) {op} ({right}))"


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pred=predicates())
def test_random_predicates_match_duckdb(spark, pred):
    from recommendation_system_spark_ml_spark.sources.catalog import register_views
    register_views(spark, SF_SMOKE)  # idempotent per example
    # year() exists in both engines; keep one canonical projection
    q = f"SELECT count(*) AS n, sum(o_orderkey) AS s FROM orders WHERE {pred}"
    spark_row = spark.sql(q).first()
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                    f"read_parquet('{path_for(SF_SMOKE, 'orders')}')")
        duck_row = con.execute(q).fetchone()
    finally:
        con.close()
    assert spark_row.n == duck_row[0], pred
    assert (spark_row.s or 0) == (duck_row[1] or 0), pred


def test_fuzz_view_registered(spark):
    """Register the Spark-side view once for the fuzz runs (session
    fixture scope outlives hypothesis examples)."""
    from recommendation_system_spark_ml_spark.sources.catalog import register_views
    register_views(spark, SF_SMOKE)
    assert spark.sql("SELECT count(*) FROM orders").first()[0] > 0
