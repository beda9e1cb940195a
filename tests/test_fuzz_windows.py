"""Property-based cross-engine fuzzing of WINDOW FRAMES: random ROWS
frames x random aggregates x random partition/order keys over
`lineitem` must match DuckDB row-for-row. Window frames are where
engines quietly disagree (this repo already found Spark's O(n^2)
shrinking-frame evaluation and a round()-ties divergence); this net
pins the VALUE semantics: frame bounds inclusive of both ends,
partition boundaries respected, deterministic orderings only.

Integer aggregates only (sum/min/max/count over integer expressions)
so equality is exact; the table is `orders` because the ORDER BY must
be TOTAL -- o_orderkey is unique, while lineitem's (l_orderkey,
l_linenumber) is not in this testdata, and any nondeterministic
ordering would make both engines 'right' with different answers
(observed exactly that as a flaky mismatch before switching)."""

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_SMOKE
from recommendation_system_spark_ml_spark.sources.catalog import path_for

_PARTS = ["o_orderstatus", "o_orderpriority", "o_custkey % 5",
          "CAST(year(o_orderdate) AS BIGINT)"]
_VALS = ["o_orderkey % 1009", "o_custkey % 97",
         "length(o_orderpriority)",
         "CAST(round(o_totalprice, 0) AS BIGINT)"]
_AGGS = ["sum", "min", "max", "count"]


@st.composite
def window_queries(draw):
    part = draw(st.sampled_from(_PARTS))
    val = draw(st.sampled_from(_VALS))
    agg = draw(st.sampled_from(_AGGS))
    lo = draw(st.sampled_from(
        ["UNBOUNDED PRECEDING", "3 PRECEDING", "1 PRECEDING", "CURRENT ROW"]))
    hi = draw(st.sampled_from(
        ["CURRENT ROW", "1 FOLLOWING", "2 FOLLOWING", "UNBOUNDED FOLLOWING"]))
    if lo == "CURRENT ROW" and hi == "CURRENT ROW":
        hi = "1 FOLLOWING"
    order = draw(st.sampled_from(
        ["o_orderkey",
         "o_orderdate, o_orderkey",
         "o_totalprice DESC, o_orderkey"]))
    return (f"SELECT o_orderkey, "
            f"{agg}({val}) OVER (PARTITION BY {part} ORDER BY {order} "
            f"ROWS BETWEEN {lo} AND {hi}) AS w "
            f"FROM orders")


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=window_queries())
def test_random_window_frames_match_duckdb(spark, q):
    from recommendation_system_spark_ml_spark.sources.catalog import (
        register_views,
    )
    register_views(spark, SF_SMOKE)
    got = {r.o_orderkey: r.w for r in spark.sql(q).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{path_for(SF_SMOKE, 'orders')}')")
    want = {a: w for a, w in con.execute(q).fetchall()}
    con.close()
    assert len(got) == len(want)
    bad = [(k, got[k], want[k]) for k in want if got[k] != want[k]]
    assert not bad, f"{q}: first mismatches {bad[:5]}"


@st.composite
def range_frame_queries(draw):
    """RANGE frames: value-defined windows over ONE numeric order key.
    Unlike ROWS, RANGE frames are tie-safe by construction -- the frame
    is a value interval, so duplicate order values yield the same
    aggregate regardless of their physical order -- which makes them
    fuzzable even on non-unique keys."""
    part = draw(st.sampled_from(_PARTS))
    val = draw(st.sampled_from(_VALS))
    agg = draw(st.sampled_from(_AGGS))
    key = draw(st.sampled_from(["o_custkey", "o_orderkey % 500",
                                "CAST(round(o_totalprice, 0) AS BIGINT)"]))
    lo = draw(st.sampled_from(["UNBOUNDED PRECEDING", "100 PRECEDING",
                               "10 PRECEDING", "CURRENT ROW"]))
    hi = draw(st.sampled_from(["CURRENT ROW", "10 FOLLOWING",
                               "100 FOLLOWING", "UNBOUNDED FOLLOWING"]))
    if lo == "CURRENT ROW" and hi == "CURRENT ROW":
        hi = "10 FOLLOWING"
    return (f"SELECT o_orderkey, "
            f"{agg}({val}) OVER (PARTITION BY {part} ORDER BY {key} "
            f"RANGE BETWEEN {lo} AND {hi}) AS w "
            f"FROM orders")


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=range_frame_queries())
def test_random_range_frames_match_duckdb(spark, q):
    from recommendation_system_spark_ml_spark.sources.catalog import (
        register_views,
    )
    register_views(spark, SF_SMOKE)
    got = {r.o_orderkey: r.w for r in spark.sql(q).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{path_for(SF_SMOKE, 'orders')}')")
    want = {a: w for a, w in con.execute(q).fetchall()}
    con.close()
    assert len(got) == len(want)
    bad = [(k, got[k], want[k]) for k in want if got[k] != want[k]]
    assert not bad, f"{q}: first mismatches {bad[:5]}"
