"""Convergence behavior of the PageRank power iteration.

The registered graph_pagerank query is hash-checked against its
unrolled-CTE oracle by the driver gate; these tests cover the part the
oracle cannot see -- the convergence-aware early exit added in r4:
on a graph that reaches the tolerance inside the iteration cap the
loop must stop early AND the early result must agree with the
full-length run to within the residual-drift bound tol * d / (1 - d).
"""

from pyspark.sql import functions as F

from recommendation_system_spark_ml_spark.operators.graph import (
    N_ITER, _power_iterate)
from tests.conftest import SF_SMOKE


def _graph(spark, half):
    """(ed, ranks0, n_nodes) for an undirected graph given half edges."""
    edges = half.union(half.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = edges.join(deg, "src").localCheckpoint(eager=True)
    n = deg.count()
    ranks0 = deg.select(F.col("src").alias("node"),
                        F.lit(1.0 / n).alias("rank"))
    return ed, ranks0, n


def _chain(spark, m):
    half = (spark.createDataFrame([(i, i + 1) for i in range(m - 1)],
                                  "a int, b int")
            .select(F.col("a").cast("string").alias("src"),
                    F.col("b").cast("string").alias("dst")))
    return _graph(spark, half)


def test_chain_graph_exits_early_and_is_converged(spark):
    """A 30-node chain at damping 0.5 reaches max |delta(rank*n)| <
    1e-6 well inside a 60-iteration cap: the loop must exit early, and
    the early ranks must match a longer fixed-length run to within the
    geometric-tail bound tol * d/(1-d) (scaled ranks)."""
    tol, damping, cap = 1e-6, 0.5, 60
    ed, r0, n = _chain(spark, 30)
    ranks, it = _power_iterate(ed, r0, n, max_iter=cap, tol=tol,
                               damping=damping)
    assert it < cap, f"expected early exit, ran all {it} iterations"
    # reference: same iteration count + 20 extra rounds, exit disabled
    ref, _ = _power_iterate(ed, r0, n, max_iter=it + 20, tol=0.0,
                            damping=damping)
    drift_bound = tol * damping / (1 - damping) + 1e-9
    worst, = (ranks.join(ref.withColumnRenamed("rank", "ref"), "node")
              .agg(F.max(F.abs((F.col("rank") - F.col("ref")) * n)))
              .first())
    assert worst < drift_bound, (worst, drift_bound)


def test_bipartite_graph_is_cap_bound(spark):
    """On the registered part-supplier graph the measured delta is
    still ~4.0 (scaled) at iteration 10 -- the 1e-6 exit must NOT fire
    inside the cap, keeping the query bit-identical to its fixed
    N_ITER unrolled-CTE oracle."""
    from recommendation_system_spark_ml_spark.sources.catalog import load

    li = load(spark, SF_SMOKE, "lineitem")
    half = (li.select(
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"))
        .distinct())
    ed, r0, n = _graph(spark, half)
    _, it = _power_iterate(ed, r0, n)
    assert it == N_ITER
