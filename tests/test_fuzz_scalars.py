"""Property-based cross-engine fuzzing of SCALAR expressions: random
integer-valued expression trees over `orders` must aggregate to the
same sum in Spark and DuckDB. Complements test_fuzz_predicates (WHERE
dialect) with the projection dialect -- arithmetic, modulo, abs,
greatest/least, CASE, date part extraction, string length.

Everything stays in int64: every leaf is CAST AS BIGINT (Spark types
length() and small literals as 32-bit INT -- ANSI mode overflows where
DuckDB widens) and multiplication is wrapped in `% 1000003` at each
combiner so no 64-bit tree can overflow; both engines define `%` with
the dividend's sign, so negative subtraction results agree."""

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_SMOKE
from recommendation_system_spark_ml_spark.sources.catalog import path_for

# Every leaf is CAST to BIGINT: length() and bare integer literals are
# 32-bit INT in Spark, so an all-INT subtree does 32-bit multiplication
# and ANSI mode throws ARITHMETIC_OVERFLOW before the % cap applies
# (fuzz-caught: 8230 * (length(..) + 440*593 % 1000003) > 2^31), while
# DuckDB silently widens -- the exact engine asymmetry this suite hunts.
_LEAVES = [
    "o_custkey",
    "o_orderkey",
    "CAST(length(o_orderpriority) AS BIGINT)",
    "CAST(year(o_orderdate) AS BIGINT)",
    "CAST(month(o_orderdate) AS BIGINT)",
    "CAST(day(o_orderdate) AS BIGINT)",
    "CAST({c} AS BIGINT)",
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


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=10_000),
              st.sampled_from([-2.5, -1.0, -0.3, 0.0, 0.0, 0.3, 0.3,
                               0.30000001, 1.0, 7.25])),
    min_size=1, max_size=120))
def test_two_level_global_rank_equals_naive_window(spark, rows):
    """Property: the distributed two-level global rank (bucket-parallel
    row_number + broadcast offsets) must equal the naive single-window
    row_number for ANY data -- heavy ties, negative scores, values
    exactly on bucket boundaries, near-boundary floats, single rows.
    This is the helper pipeline_curriculum / stable_row_ids /
    window_ntile rest on."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from recommendation_system_spark_ml_spark.operators.scale import (
        two_level_global_rank,
    )

    # distinct ids: rank ties broken by id must be unambiguous
    data = [(i, s) for i, (_, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, score double")
    order = [F.col("score").desc(), F.col("id").asc()]
    got = two_level_global_rank(
        df, F.floor(-F.col("score") * 100).cast("long"), order, out="rn")
    naive = df.withColumn(
        "rn_naive", F.row_number().over(Window.orderBy(*order)))
    joined = got.join(naive, ["id", "score"]).collect()
    assert len(joined) == len(data)
    for r in joined:
        assert r.rn == r.rn_naive, (r.id, r.score, r.rn, r.rn_naive)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(
    st.tuples(st.integers(min_value=1, max_value=500),
              st.sampled_from([-2.5, -1.0, -0.3, 0.0, 0.0, 0.3, 0.3,
                               0.30000001, 1.0, 7.25])),
    min_size=1, max_size=120))
def test_two_level_running_sum_equals_naive_window(spark, rows):
    """Property: the distributed two-level running sum (bucket-parallel
    cumsum + broadcast bucket-total offsets) must equal the naive
    single-window running sum for ANY data -- the helper
    pipeline_token_budget rests on. Integer values, so equality is
    exact (no float-order tolerance needed)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from recommendation_system_spark_ml_spark.operators.scale import (
        two_level_running_sum,
    )

    data = [(i, s, v) for i, (v, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, score double, v long")
    order = [F.col("score").desc(), F.col("id").asc()]
    got = two_level_running_sum(
        df, F.floor(-F.col("score") * 100).cast("long"), order,
        F.col("v"), out="cum")
    w = (Window.orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    naive = df.withColumn("cum_naive", F.sum("v").over(w))
    joined = got.join(naive, ["id", "score", "v"]).collect()
    assert len(joined) == len(data)
    for r in joined:
        assert r.cum == r.cum_naive, (r.id, r.score, r.cum, r.cum_naive)
