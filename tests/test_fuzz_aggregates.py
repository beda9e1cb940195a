"""Property-based cross-engine fuzzing of GROUPED AGGREGATION: random
group key x random integer aggregate set over `lineitem` must produce
identical result SETS in Spark and DuckDB (row-for-row after sorting,
not just a scalar checksum). Completes the fuzz family: predicates
(WHERE), scalars (projection), joins (null semantics), aggregates
(grouping + aggregate dialect)."""

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_SMOKE
from recommendation_system_spark_ml_spark.sources.catalog import path_for

_KEYS = [
    "l_returnflag",
    "l_linestatus",
    "l_suppkey % 7",
    "CAST(year(l_shipdate) AS BIGINT)",
    "length(l_returnflag) + l_linenumber",
]

_AGGS = [
    "count(*)",
    "count(DISTINCT l_partkey)",
    "sum(l_orderkey % 10007)",
    "min(l_orderkey)",
    "max(l_partkey)",
    "sum(CAST(round(l_quantity, 0) AS BIGINT))",
]


@st.composite
def agg_queries(draw):
    key = draw(st.sampled_from(_KEYS))
    aggs = draw(st.lists(st.sampled_from(_AGGS), min_size=1, max_size=3,
                         unique=True))
    cols = ", ".join(f"{a} AS a{i}" for i, a in enumerate(aggs))
    having = ""
    if draw(st.booleans()):
        having = f" HAVING count(*) > {draw(st.integers(0, 50))}"
    return (f"SELECT {key} AS k, {cols} FROM lineitem GROUP BY 1{having}")


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=agg_queries())
def test_random_aggregates_match_duckdb(spark, q):
    from recommendation_system_spark_ml_spark.sources.catalog import register_views
    register_views(spark, SF_SMOKE)
    def norm(v):
        return v if isinstance(v, str) else (int(v) if v is not None else None)
    got = sorted(tuple(norm(v) for v in row) for row in spark.sql(q).collect())
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                    f"read_parquet('{path_for(SF_SMOKE, 'lineitem')}')")
        want = sorted(tuple(norm(v) for v in row)
                      for row in con.execute(q).fetchall())
    finally:
        con.close()
    assert got == want, q
