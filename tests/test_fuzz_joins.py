"""Property-based cross-engine fuzzing of JOINs: random join type x
random post-join predicate over orders ⋈ customer must aggregate
identically in Spark and DuckDB. Covers inner/left/right/full null
semantics -- the classic dialect divergence spot -- on top of the
predicate fuzz (WHERE) and scalar fuzz (projection)."""

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_SMOKE
from recommendation_system_spark_ml_spark.sources.catalog import path_for

_PREDS = [
    "TRUE",
    "o.o_totalprice > {p}",
    "c.c_acctbal < {p2}",
    "coalesce(c.c_nationkey, -1) % 5 = {d}",
    "o.o_orderstatus = '{s}' OR c.c_mktsegment LIKE 'B%'",
    "o.o_totalprice > {p} AND coalesce(c.c_nationkey, 0) < 20",
]

_JOINS = ["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"]


@st.composite
def join_queries(draw):
    join = draw(st.sampled_from(_JOINS))
    pred = draw(st.sampled_from(_PREDS)).format(
        p=draw(st.integers(1000, 400000)),
        p2=draw(st.integers(-500, 8000)),
        d=draw(st.integers(0, 4)),
        s=draw(st.sampled_from(["O", "F", "P"])))
    return f"""
        SELECT count(*) AS n,
               count(o.o_orderkey) AS n_orders,
               count(c.c_custkey) AS n_custs,
               sum(o.o_orderkey) AS s_ord,
               sum(coalesce(c.c_nationkey, -1)) AS s_nat
        FROM orders o {join} customer c ON o.o_custkey = c.c_custkey
        WHERE {pred}"""


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=join_queries())
def test_random_joins_match_duckdb(spark, q):
    from recommendation_system_spark_ml_spark.sources.catalog import register_views
    register_views(spark, SF_SMOKE)
    spark_row = spark.sql(q).first()
    con = duckdb.connect()
    try:
        for t in ("orders", "customer"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{path_for(SF_SMOKE, t)}')")
        duck_row = con.execute(q).fetchone()
    finally:
        con.close()
    got = [spark_row.n, spark_row.n_orders, spark_row.n_custs,
           spark_row.s_ord or 0, spark_row.s_nat or 0]
    want = [duck_row[0], duck_row[1], duck_row[2],
            duck_row[3] or 0, duck_row[4] or 0]
    assert got == want, q
