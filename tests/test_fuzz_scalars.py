"""Property-based cross-engine fuzzing of SCALAR expressions: random
integer-valued expression trees over `orders` must aggregate to the
same sum in Spark and DuckDB. Complements test_fuzz_predicates (WHERE
dialect) with the projection dialect -- arithmetic, modulo, abs,
greatest/least, CASE, date part extraction, string length.

Everything stays in int64: multiplication is wrapped in `% 1000003`
at each combiner so no tree can overflow, and both engines define `%`
with the dividend's sign, so negative subtraction results agree."""

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_SMOKE
from recommendation_system_spark_ml_spark.sources.catalog import path_for

_LEAVES = [
    "o_custkey",
    "o_orderkey",
    "length(o_orderpriority)",
    "CAST(year(o_orderdate) AS BIGINT)",
    "CAST(month(o_orderdate) AS BIGINT)",
    "CAST(day(o_orderdate) AS BIGINT)",
    "{c}",
]

_COMBINERS = [
    "({a} + {b})",
    "({a} - {b})",
    "(({a} * {b}) % 1000003)",
    "abs({a} - {b})",
    "greatest({a}, {b})",
    "least({a}, {b})",
    "(CASE WHEN {a} > {b} THEN {a} ELSE {b} END)",
]


@st.composite
def scalar_exprs(draw, depth=0):
    if depth >= 3 or draw(st.booleans()):
        leaf = draw(st.sampled_from(_LEAVES))
        return leaf.format(c=draw(st.integers(1, 9999)))
    tpl = draw(st.sampled_from(_COMBINERS))
    return tpl.format(a=draw(scalar_exprs(depth=depth + 1)),
                      b=draw(scalar_exprs(depth=depth + 1)))


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(expr=scalar_exprs())
def test_random_scalar_exprs_match_duckdb(spark, expr):
    from recommendation_system_spark_ml_spark.sources.catalog import register_views
    register_views(spark, SF_SMOKE)
    q = f"SELECT sum({expr}) AS s, count(*) AS n FROM orders"
    spark_row = spark.sql(q).first()
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                    f"read_parquet('{path_for(SF_SMOKE, 'orders')}')")
        duck_row = con.execute(q).fetchone()
    finally:
        con.close()
    assert spark_row.n == duck_row[1], expr
    assert int(spark_row.s) == int(duck_row[0]), expr
