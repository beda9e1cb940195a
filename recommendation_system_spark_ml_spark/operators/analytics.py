"""Decision-support analytics: TPC-H-shaped benchmark queries + gap ops.

The reference's one relational query is the M7 cluster-average
predictor (MovieLensRecommender.py:72-83); its published result tables
(README.md:45-55, 73-101) are ordered/limited summary reports. This
module exposes the standard decision-support query shapes those imply,
on the harness star schema: a full-scan aggregate report (Q1 shape), a
selective 3-way-join top-k (Q3 shape), and a 6-table snowflake revenue
rollup (Q5 shape) -- plus the remaining gap operators: exact
percentiles, distribution windows (percent_rank/cume_dist), unpivot,
bounded cross join, edit-distance matching, and a generated date spine
densifying sparse months.

Money math follows the registry's integer-cents discipline so oracle
hashes are exact. Scale notes per query in the docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from recommendation_system_spark_ml_spark.registry import register
from recommendation_system_spark_ml_spark.session import pin_session_conf
from recommendation_system_spark_ml_spark.sources.catalog import load


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100, 0).cast("long")


@register("tpch_q1", oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT) / 10000.0 AS sum_disc_price,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
                * (100 + CAST(round(l_tax * 100, 0) AS BIGINT))) AS BIGINT) / 1000000.0 AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""", bench=True)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-summary report (TPC-H Q1 shape): one full scan, partial
    aggregation map-side, 4-group output. At 100 TB this is the
    canonical scan-bound query -- the only shuffle carries 4 groups of
    partial aggregates, so throughput == parquet scan speed. The date
    predicate pushes to the scan (min/max row-group pruning)."""
    pin_session_conf(spark)
    ep, dc, tx = _cents("l_extendedprice"), _cents("l_discount"), _cents("l_tax")
    return (load(spark, sf_dir, "lineitem")
            .filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.round("l_quantity", 0).cast("long")).alias("sum_qty"),
                 (F.sum(ep) / 100.0).alias("sum_base_price"),
                 (F.sum(ep * (100 - dc)) / 10000.0).alias("sum_disc_price"),
                 (F.sum(ep * (100 - dc) * (100 + tx)) / 1000000.0).alias("sum_charge"),
                 F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count(F.lit(1)).alias("count_order")))


@register("tpch_q3", oracle="""
SELECT l.l_orderkey,
       CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) AS BIGINT) / 10000.0 AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY 1, 3, 4
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""", bench=True)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority top-k (TPC-H Q3 shape): selective predicates on
    all three tables, join, group, global top-10. Filters push to every
    scan; the segment-filtered customer side broadcasts; the top-k is a
    TakeOrderedAndProject (no full sort of the aggregate). Tie-break on
    l_orderkey keeps the LIMIT deterministic across engines."""
    pin_session_conf(spark)
    cust = (load(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey"))
    orders = (load(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate") < "1998-01-01")
              .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"))
    li = (load(spark, sf_dir, "lineitem")
          .filter(F.col("l_shipdate") > "1998-01-01")
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    ep, dc = _cents("l_extendedprice"), _cents("l_discount")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .groupBy("l_orderkey",
                     F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                     "o_orderpriority")
            .agg((F.sum(ep * (100 - dc)) / 10000.0).alias("revenue"))
            .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
            .orderBy(F.desc("revenue"), "l_orderkey")
            .limit(10))


@register("tpch_q5", oracle="""
SELECT n.n_name,
       CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) AS BIGINT) / 10000.0 AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY 1
""", bench=True)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier revenue rollup (TPC-H Q5 shape): 6-table snowflake
    join with a region filter that prunes 4/5 of the dimension space.
    All four dimension sides (customer-keys, supplier, nation, region)
    broadcast; only the orders<->lineitem join shuffles, on the already
    partitioned orderkey. The s_nationkey = c_nationkey equality rides
    the supplier broadcast -- no extra shuffle."""
    pin_session_conf(spark)
    nat = (load(spark, sf_dir, "nation")
           .join(F.broadcast(load(spark, sf_dir, "region")
                             .filter(F.col("r_name") == "ASIA")),
                 F.col("n_regionkey") == F.col("r_regionkey"))
           .select("n_nationkey", "n_name"))
    cust = (load(spark, sf_dir, "customer")
            .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
            .select("c_custkey", "c_nationkey", "n_name"))
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    ep, dc = _cents("l_extendedprice"), _cents("l_discount")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(sup),
                  (li.l_suppkey == sup.s_suppkey)
                  & (sup.s_nationkey == cust.c_nationkey))
            .groupBy("n_name")
            .agg((F.sum(ep * (100 - dc)) / 10000.0).alias("revenue")))


@register("agg_percentile", oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
       round(quantile_cont(l_extendedprice, 0.90), 4) AS p90_price
FROM lineitem GROUP BY 1
""")
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation -- Spark `percentile`
    and DuckDB `quantile_cont` share the definition). Exact percentile
    collects per-group value buffers; at 100 TB swap to
    approx_percentile (t-digest sketch, bounded memory, map-side
    mergeable) -- same call shape, which is why both are exposed
    (agg_approx covers the sketch path's HLL sibling)."""
    pin_session_conf(spark)
    return (load(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
                 F.round(F.expr("percentile(l_extendedprice, 0.25)"), 4).alias("p25_price"),
                 F.round(F.expr("percentile(l_extendedprice, 0.90)"), 4).alias("p90_price")))


@register("window_cume", oracle="""
SELECT c_custkey, c_mktsegment,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cum_dist
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal NULLS LAST)
""")
def window_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows: percent_rank + cume_dist per segment.
    Ties share a value, so results are deterministic without a
    tie-break column. One shuffle on the partition key."""
    pin_session_conf(spark)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.asc_nulls_last("c_acctbal"))
    return (load(spark, sf_dir, "customer")
            .select("c_custkey", "c_mktsegment",
                    F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
                    F.round(F.cume_dist().over(w), 6).alias("cum_dist")))


@register("unpivot_melt", oracle="""
SELECT p_partkey, 'retailprice' AS metric, round(p_retailprice, 2) AS value FROM part
UNION ALL
SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
""")
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) wide columns into (metric, value) rows -- the
    inverse of agg_pivot. Narrow transformation: no shuffle, output is
    2x the input rows, column-pruned scan reads only the 3 columns."""
    pin_session_conf(spark)
    return (load(spark, sf_dir, "part")
            .select("p_partkey",
                    F.round("p_retailprice", 2).alias("retailprice"),
                    F.col("p_size").cast("double").alias("size"))
            .unpivot("p_partkey", ["retailprice", "size"], "metric", "value"))


@register("join_cross", oracle="""
SELECT r.r_name, x.o_orderstatus
FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) x
""")
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded cross join: 5 regions x |distinct statuses|. Cross joins
    are only ever legal here between provably-tiny sides (this is the
    dimension-scaffold idiom); data-sized cross products are forbidden
    -- tests/test_plans.py asserts no unblocked CartesianProduct in any
    other registered plan."""
    pin_session_conf(spark)
    statuses = (load(spark, sf_dir, "orders")
                .select("o_orderstatus").distinct())
    return (load(spark, sf_dir, "region").select("r_name")
            .crossJoin(F.broadcast(statuses)))


@register("fn_levenshtein", oracle="""
SELECT a.n_name AS name_a, b.n_name AS name_b,
       levenshtein(a.n_name, b.n_name) AS edit_dist
FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
WHERE levenshtein(a.n_name, b.n_name) <= 2
""")
def fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance matching (fuzzy string join on a bounded
    dimension). The inequality self-join is a broadcast nested loop on
    a 25-row table; at scale, edit-distance joins must be blocked first
    (see dedup_jaccard_prefix for the blocking pattern)."""
    pin_session_conf(spark)
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    a = nat.alias("a")
    b = nat.alias("b")
    dist = F.levenshtein(F.col("a.n_name"), F.col("b.n_name"))
    return (a.join(F.broadcast(b),
                   F.col("a.n_nationkey") < F.col("b.n_nationkey"))
            .select(F.col("a.n_name").alias("name_a"),
                    F.col("b.n_name").alias("name_b"),
                    dist.alias("edit_dist"))
            .filter(F.col("edit_dist") <= 2))


@register("series_spine", oracle="""
WITH spine AS (
    SELECT strftime(unnest(generate_series(DATE '1995-01-01',
                                           DATE '2001-08-01',
                                           INTERVAL 1 MONTH)), '%Y-%m') AS ym
), counts AS (
    SELECT strftime(o_orderdate, '%Y-%m') AS ym, count(*) AS n_orders
    FROM orders GROUP BY 1
)
SELECT s.ym, CAST(coalesce(c.n_orders, 0) AS BIGINT) AS n_orders
FROM spine s LEFT JOIN counts c ON s.ym = c.ym
""")
def series_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated date spine densifying sparse months (gap-filling --
    every reporting pipeline needs it). The spine is generated
    JVM-side (sequence + explode, 80 rows) and broadcast against the
    aggregated counts; no data-sized generate step."""
    pin_session_conf(spark)
    spine = (spark.range(1)
             .select(F.explode(F.expr(
                 "sequence(to_date('1995-01-01'), to_date('2001-08-01'),"
                 " interval 1 month)")).alias("month_start"))
             .select(F.date_format("month_start", "yyyy-MM").alias("ym")))
    counts = (load(spark, sf_dir, "orders")
              .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("ym"))
              .agg(F.count(F.lit(1)).alias("n_orders")))
    return (F.broadcast(spine)
            .join(counts, on="ym", how="left")
            .select("ym", F.coalesce("n_orders", F.lit(0)).alias("n_orders")))


@register("agg_string_agg", oracle="""
SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation GROUP BY 1
""")
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation. collect_list order is
    partition-dependent, so sort INSIDE the aggregate result
    (array_sort) before joining -- the only way a list agg can be
    deterministic on a distributed engine. A group whose every name is
    NULL aggregates to NULL, not '' (collect_list drops NULLs, so a
    bare array_join would emit the empty string where SQL string_agg
    is NULL -- probe-caught under seed 7)."""
    pin_session_conf(spark)
    lst = F.array_sort(F.collect_list("n_name"))
    return (load(spark, sf_dir, "nation")
            .groupBy("n_regionkey")
            .agg(F.when(F.size(lst) > 0, F.array_join(lst, ","))
                 .alias("nations")))


@register("tpch_q18", oracle="""
SELECT c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o.o_totalprice, 2) AS o_totalprice,
       CAST(sum(CAST(round(l.l_quantity, 0) AS BIGINT)) AS BIGINT) AS total_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2, 3, 4
HAVING sum(CAST(round(l.l_quantity, 0) AS BIGINT)) > 250
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""", bench=True)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume-customer top-k (TPC-H Q18 shape). The scale move:
    aggregate lineitem by orderkey FIRST (partial map-side sum, the
    one big shuffle), HAVING-filter to the rare >250-qty orders, and
    only then join orders -- the filtered aggregate is tiny, so that
    join broadcasts instead of shuffling the full fact table twice."""
    pin_session_conf(spark)
    qty = (load(spark, sf_dir, "lineitem")
           .groupBy("l_orderkey")
           .agg(F.sum(F.round("l_quantity", 0).cast("long")).alias("total_qty"))
           .filter(F.col("total_qty") > 250))
    orders = (load(spark, sf_dir, "orders")
              .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
              .join(load(spark, sf_dir, "customer").select("c_custkey"),
                    F.col("o_custkey") == F.col("c_custkey"), "leftsemi"))
    return (orders.join(F.broadcast(qty), orders.o_orderkey == qty.l_orderkey)
            .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey",
                    F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                    F.round("o_totalprice", 2).alias("o_totalprice"),
                    "total_qty")
            .orderBy(F.desc("o_totalprice"), "o_orderkey")
            .limit(20))


@register("tpch_q17", oracle="""
SELECT round(CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
             / 700.0, 4) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                      FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
""")
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): CORRELATED
    scalar subquery -- the per-part average computed inside the
    predicate. Spark-first plan: decorrelate by hand into one
    aggregate of the brand-filtered lineitem (per-part avg) joined
    back -- the brand filter cuts partkeys ~25x, and the per-part
    aggregate is computed over ONLY those parts' lineitems, once, not
    per row. Both sides of the final join are brand-pruned, so at
    100 TB the fact table is scanned once and the tiny avg table
    broadcasts."""
    pin_session_conf(spark)
    parts = (load(spark, sf_dir, "part")
             .filter(F.col("p_brand") == "Brand#23")
             .select("p_partkey"))
    li = (load(spark, sf_dir, "lineitem")
          .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
          .select("l_partkey", "l_quantity", "l_extendedprice"))
    avg_qty = (li.groupBy("l_partkey")
               .agg((F.avg("l_quantity") * 0.2).alias("qty_cap"))
               .withColumnRenamed("l_partkey", "a_partkey"))
    ep = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    return (li.join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("a_partkey"))
            .filter(F.col("l_quantity") < F.col("qty_cap"))
            .agg(F.round(F.sum(ep) / 700.0, 4).alias("avg_yearly")))


@register("agg_stats", oracle="""
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
       round(stddev_samp(l_quantity), 6) AS qty_stddev,
       round(var_samp(l_discount), 6) AS disc_var
FROM lineitem GROUP BY 1
""")
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (corr / covar / stddev / variance):
    single-pass streaming moments, map-side combinable -- feature
    screening over 100 TB without a second scan."""
    pin_session_conf(spark)
    return (load(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
                 F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
                 F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
                 F.round(F.var_samp("l_discount"), 6).alias("disc_var")))


@register("tpch_q7", oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
       CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) AS BIGINT)
           / 10000.0 AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
    OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9'))
GROUP BY 1, 2, 3
""", bench=True)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-nation trade volume (TPC-H Q7 shape): the fact table
    joins two different dimension paths (supplier-side nation,
    customer-side nation) with a disjunctive pair predicate. Plan
    strategy: push each nation filter into its dimension BEFORE the
    fact joins (supplier and customer shrink ~25x and broadcast), keep
    the pair disjunction as the only post-join residual. The single
    shuffle left is lineitem<->orders on orderkey."""
    pin_session_conf(spark)
    nat = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_9", "NATION_10"))
    sup = (load(spark, sf_dir, "supplier")
           .join(F.broadcast(nat.select(F.col("n_nationkey").alias("sn_key"),
                                        F.col("n_name").alias("supp_nation"))),
                 F.col("s_nationkey") == F.col("sn_key"))
           .select("s_suppkey", "supp_nation"))
    cust = (load(spark, sf_dir, "customer")
            .join(F.broadcast(nat.select(F.col("n_nationkey").alias("cn_key"),
                                         F.col("n_name").alias("cust_nation"))),
                  F.col("c_nationkey") == F.col("cn_key"))
            .select("c_custkey", "cust_nation"))
    orders = (load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
              .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
              .select("o_orderkey", "cust_nation"))
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    ep, dc = _cents("l_extendedprice"), _cents("l_discount")
    return (li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .filter(((F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_10"))
                    | ((F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_9")))
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").alias("l_year"))
            .agg((F.sum(ep * (100 - dc)) / 10000.0).alias("revenue")))


@register("tpch_q10", oracle="""
SELECT c.c_custkey, c.c_name, round(c.c_acctbal, 2) AS c_acctbal, n.n_name,
       CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) AS BIGINT)
           / 10000.0 AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey
LIMIT 20
""", bench=True)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 shape): who returned the
    most revenue last quarter. Quarter filter pushes to the orders
    scan (partition-prunable under the sink_partition_prune layout),
    returnflag filter pushes to lineitem, nation broadcast-decorates
    at the end; top-20 is a TakeOrderedAndProject."""
    pin_session_conf(spark)
    orders = (load(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate") >= "1996-01-01")
                      & (F.col("o_orderdate") < "1996-04-01"))
              .select("o_orderkey", "o_custkey"))
    li = (load(spark, sf_dir, "lineitem")
          .filter(F.col("l_returnflag") == "R")
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    cust = (load(spark, sf_dir, "customer")
            .join(F.broadcast(load(spark, sf_dir, "nation")
                              .select("n_nationkey", "n_name")),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .select("c_custkey", "c_name", "c_acctbal", "n_name"))
    ep, dc = _cents("l_extendedprice"), _cents("l_discount")
    return (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_custkey", "c_name",
                     F.round("c_acctbal", 2).alias("c_acctbal"), "n_name")
            .agg((F.sum(ep * (100 - dc)) / 10000.0).alias("revenue"))
            .orderBy(F.desc("revenue"), "c_custkey")
            .limit(20))


@register("tpch_q14", oracle="""
SELECT round(100.0 * CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%' THEN
                 CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))
             ELSE 0 END) AS DOUBLE)
       / sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
             * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))), 6)
       AS promo_revenue_pct
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1996-02-01'
""", bench=True)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion-effect ratio (TPC-H Q14 shape): conditional
    aggregation -- the numerator is a CASE inside the sum, so one scan
    and one broadcast join produce both sides of the ratio. The month
    filter prunes the fact scan; part broadcasts."""
    pin_session_conf(spark)
    li = (load(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= "1996-01-01")
                  & (F.col("l_shipdate") < "1996-02-01"))
          .select("l_partkey", "l_extendedprice", "l_discount"))
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    ep, dc = _cents("l_extendedprice"), _cents("l_discount")
    disc_price = ep * (100 - dc)
    promo = F.when(F.col("p_type").like("PROMO%"), disc_price).otherwise(F.lit(0))
    return (li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
            .agg(F.round(100.0 * F.sum(promo).cast("double") / F.sum(disc_price), 6)
                 .alias("promo_revenue_pct")))


@register("tpch_q19", oracle="""
SELECT CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) AS BIGINT)
           / 10000.0 AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""", bench=True)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive-predicate join (TPC-H Q19 shape). OR-of-ANDs can't
    push through a join as-is, so each side gets its hand-derived
    relaxation pushed to the scan -- part keeps the brand/size
    disjunction, lineitem keeps the quantity envelope [1,30] -- and
    the exact three-arm predicate stays as the post-join residual.
    Semantics are unchanged (the residual implies both relaxations);
    the fact scan skips every row outside the envelope."""
    pin_session_conf(spark)
    part = (load(spark, sf_dir, "part")
            .filter(((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5))
                    | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
                    | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)))
            .select("p_partkey", "p_brand", "p_size"))
    li = (load(spark, sf_dir, "lineitem")
          .filter(F.col("l_quantity").between(1, 30))
          .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount"))
    arm = (((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11))
           | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
              & F.col("l_quantity").between(10, 20))
           | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
              & F.col("l_quantity").between(20, 30)))
    ep, dc = _cents("l_extendedprice"), _cents("l_discount")
    return (li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
            .filter(arm)
            .agg((F.sum(ep * (100 - dc)) / 10000.0).alias("revenue")))


@register("tpch_q6", oracle="""
SELECT CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
               * CAST(round(l_discount * 100, 0) AS BIGINT)) AS BIGINT)
           / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""", bench=True)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting-revenue-change (TPC-H Q6 shape): a pure
    filter-and-sum -- zero joins, zero groups. Every predicate pushes
    to the parquet scan (date range prunes row groups via min/max,
    discount/quantity via column stats); the aggregate ships ONE
    partial row per partition. At 100 TB this is the query whose cost
    IS the (pruned) scan -- the canonical I/O-bound lower bound to
    measure scan efficiency against."""
    pin_session_conf(spark)
    ep, dc = _cents("l_extendedprice"), _cents("l_discount")
    return (load(spark, sf_dir, "lineitem")
            .filter((F.col("l_shipdate") >= "1996-01-01")
                    & (F.col("l_shipdate") < "1997-01-01")
                    & F.col("l_discount").between(0.05, 0.07)
                    & (F.col("l_quantity") < 24))
            .agg((F.sum(ep * dc) / 10000.0).alias("revenue")))


@register("tpch_q13", oracle="""
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c.c_custkey, count(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                       AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
)
GROUP BY c_count
""")
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): outer join
    with a join-condition residual (not a WHERE -- customers with only
    urgent orders must still appear with count 0), then a second
    aggregation over the first's output. The double aggregation is the
    scale lesson: the first groupBy shuffles on custkey, the second on
    the tiny count domain -- the second shuffle is negligible."""
    pin_session_conf(spark)
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = (load(spark, sf_dir, "orders")
              .filter(F.col("o_orderpriority") != "1-URGENT")
              .select("o_custkey", "o_orderkey"))
    per_cust = (cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register("tpch_q15", oracle="""
WITH rev AS (
    SELECT l_suppkey AS supplier_no,
           CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT)
               / 10000.0 AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
""")
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier by quarterly revenue (TPC-H Q15 shape): an
    aggregate reused twice -- once as the ranking input, once inside
    the scalar-subquery max. Expressed as a global-max window OVER THE
    POST-AGGREGATE, so the fact table is scanned once and nothing is
    cached into the shared session (an earlier cache() here leaked
    blocks for the session's lifetime). The single-partition window is
    bounded: its input is one row per supplier with two columns, about
    six orders of magnitude smaller than the lineitem scan feeding it."""
    pin_session_conf(spark)
    ep, dc = _cents("l_extendedprice"), _cents("l_discount")
    rev = (load(spark, sf_dir, "lineitem")
           .filter((F.col("l_shipdate") >= "1996-01-01")
                   & (F.col("l_shipdate") < "1996-04-01"))
           .groupBy(F.col("l_suppkey").alias("supplier_no"))
           .agg((F.sum(ep * (100 - dc)) / 10000.0).alias("total_revenue")))
    mx = F.max("total_revenue").over(Window.partitionBy())
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    top = rev.withColumn("mx", mx).filter(F.col("total_revenue") == F.col("mx"))
    return (top.join(F.broadcast(sup), top.supplier_no == sup.s_suppkey)
            .select("s_suppkey", "s_name", "total_revenue"))


@register("tpch_q22", oracle="""
WITH avg_bal AS (
    SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey,
       count(*) AS numcust,
       round(sum(c.c_acctbal), 2) AS totacctbal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.ab
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)
GROUP BY 1
""")
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-sales-opportunity (TPC-H Q22 shape): customers with
    above-average balances and no large order -- scalar-subquery
    threshold + anti join + rollup by nation. (The classic Q22 uses
    'no orders at all'; this testdata gives every customer at least
    one order, so the anti-join side is the >300k-price subset to keep
    the result non-degenerate.) The anti join shuffles only custkeys;
    the average is one broadcast scalar."""
    pin_session_conf(spark)
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal")
    avg_bal = (cust.filter(F.col("c_acctbal") > 0)
               .agg(F.avg("c_acctbal").alias("ab")))
    orders = (load(spark, sf_dir, "orders")
              .filter(F.col("o_totalprice") > 300000)
              .select("o_custkey"))
    return (cust.join(F.broadcast(avg_bal), cust.c_acctbal > F.col("ab"))
            .join(orders, cust.c_custkey == orders.o_custkey, "leftanti")
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("numcust"),
                 F.round(F.sum("c_acctbal"), 2).alias("totacctbal")))


@register("tpch_q4", oracle="""
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
  AND o.o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY 1
""")
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 shape): correlated EXISTS
    whose inner predicate compares COLUMNS OF BOTH TABLES
    (l_shipdate > o_orderdate) -- the semi join carries the outer
    column into the join condition, so it can't be pre-filtered away.
    Spark plans it as a left-semi join with the inequality as a join
    residual; the quarter filter prunes the orders scan first."""
    pin_session_conf(spark)
    orders = (load(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate") >= "1996-07-01")
                      & (F.col("o_orderdate") < "1996-10-01"))
              .select("o_orderkey", "o_orderdate", "o_orderpriority"))
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (orders.join(li, (orders.o_orderkey == li.l_orderkey)
                        & (li.l_shipdate > orders.o_orderdate), "leftsemi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count")))


@register("tpch_q8", oracle="""
WITH vol AS (
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           n.n_name AS supp_nation,
           CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)) AS v
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_type LIKE 'ECONOMY%'
)
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_9' THEN v ELSE 0 END)
                  AS DOUBLE) / sum(v), 6) AS mkt_share
FROM vol GROUP BY 1
""")
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape): one nation's slice of a
    part-segment's revenue per year -- a ratio of conditional sums
    over a 5-table join. The part filter prunes the fact first (LIKE
    prefix pushes as a range); supplier/nation broadcast; numerator
    and denominator come from ONE aggregation pass (CASE inside sum),
    so the join output is scanned once."""
    pin_session_conf(spark)
    part = (load(spark, sf_dir, "part")
            .filter(F.col("p_type").like("ECONOMY%")).select("p_partkey"))
    sup = (load(spark, sf_dir, "supplier")
           .join(F.broadcast(load(spark, sf_dir, "nation")
                             .select("n_nationkey", "n_name")),
                 F.col("s_nationkey") == F.col("n_nationkey"))
           .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_partkey", "l_extendedprice", "l_discount")
    ep, dc = _cents("l_extendedprice"), _cents("l_discount")
    v = ep * (100 - dc)
    return (li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
            .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy(F.year("o_orderdate").alias("o_year"))
            .agg(F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_9", v).otherwise(F.lit(0)))
                .cast("double") / F.sum(v), 6).alias("mkt_share")))


@register("tpch_q2", oracle="""
WITH pair_cost AS (
    SELECT l_partkey, l_suppkey,
           CAST(min(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS cost_cents
    FROM lineitem GROUP BY 1, 2
), europe AS (
    SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
), cand AS (
    SELECT p.p_partkey, p.p_type, e.s_suppkey, e.s_name, e.s_acctbal,
           e.n_name, pc.cost_cents
    FROM part p
    JOIN pair_cost pc ON pc.l_partkey = p.p_partkey
    JOIN europe e ON e.s_suppkey = pc.l_suppkey
    WHERE p.p_size < 25 AND p.p_type = 'STANDARD'
)
SELECT c.s_acctbal, c.s_name, c.n_name, c.p_partkey, c.p_type,
       c.cost_cents / 100.0 AS min_cost
FROM cand c
WHERE c.cost_cents = (SELECT min(c2.cost_cents) FROM cand c2
                      WHERE c2.p_partkey = c.p_partkey)
""")
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (TPC-H Q2 shape): per STANDARD part under
    size 25, the European supplier(s) offering it cheapest -- the
    correlated-min scalar subquery over a derived cost table. This
    testdata has no partsupp, so (part, supplier) supply cost is
    derived from their cheapest observed lineitem (same join topology:
    part x supplycost x supplier x nation x region, min per part).
    Catalyst decorrelates the min into an aggregate + self-join; the
    Europe dimension chain broadcasts."""
    pin_session_conf(spark)
    pair_cost = (load(spark, sf_dir, "lineitem")
                 .groupBy(F.col("l_partkey"), F.col("l_suppkey"))
                 .agg(F.min(_cents("l_extendedprice")).alias("cost_cents")))
    europe = (load(spark, sf_dir, "supplier")
              .join(F.broadcast(load(spark, sf_dir, "nation")),
                    F.col("s_nationkey") == F.col("n_nationkey"))
              .join(F.broadcast(load(spark, sf_dir, "region")
                                .filter(F.col("r_name") == "EUROPE")),
                    F.col("n_regionkey") == F.col("r_regionkey"))
              .select("s_suppkey", "s_name",
                      F.round("s_acctbal", 2).alias("s_acctbal"), "n_name"))
    part = (load(spark, sf_dir, "part")
            .filter((F.col("p_size") < 25) & (F.col("p_type") == "STANDARD"))
            .select("p_partkey", "p_type"))
    cand = (part.join(pair_cost, part.p_partkey == pair_cost.l_partkey)
            .join(europe, pair_cost.l_suppkey == europe.s_suppkey)
            .select("p_partkey", "p_type", "s_suppkey", "s_name",
                    "s_acctbal", "n_name", "cost_cents"))
    min_per_part = (cand.groupBy(F.col("p_partkey").alias("mp_partkey"))
                    .agg(F.min("cost_cents").alias("mc")))
    return (cand.join(F.broadcast(min_per_part),
                      (cand.p_partkey == F.col("mp_partkey"))
                      & (cand.cost_cents == F.col("mc")))
            .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
                    (F.col("cost_cents") / 100.0).alias("min_cost")))


@register("tpch_q9", oracle="""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
                - CAST(round(p_retailprice * 100, 0) AS BIGINT)
                  * CAST(round(l_quantity, 0) AS BIGINT) * 100) AS BIGINT)
           / 10000.0 AS profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE '%bolt%'
GROUP BY 1, 2
""")
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (TPC-H Q9 shape): revenue minus cost per
    supplier nation and order year for '%bolt%' parts. Cost proxies
    p_retailprice x quantity (no partsupp here); all money in integer
    e4 units so the five-table join aggregates exactly. One fact
    shuffle; part/supplier/nation broadcast; the LIKE filter prunes
    part before its join."""
    pin_session_conf(spark)
    ep, dc = _cents("l_extendedprice"), _cents("l_discount")
    rc = _cents("p_retailprice")
    qty = F.round("l_quantity", 0).cast("long")
    profit_e4 = F.sum(ep * (100 - dc) - rc * qty * 100)
    return (load(spark, sf_dir, "lineitem")
            .join(F.broadcast(load(spark, sf_dir, "part")
                              .filter(F.col("p_name").like("%bolt%"))),
                  F.col("p_partkey") == F.col("l_partkey"))
            .join(F.broadcast(load(spark, sf_dir, "supplier")),
                  F.col("s_suppkey") == F.col("l_suppkey"))
            .join(F.broadcast(load(spark, sf_dir, "nation")),
                  F.col("n_nationkey") == F.col("s_nationkey"))
            .join(load(spark, sf_dir, "orders"),
                  F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").alias("o_year"))
            .agg((profit_e4 / 10000.0).alias("profit")))


@register("tpch_q11", oracle="""
WITH german AS (
    SELECT l_partkey,
           CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS value_cents
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_7'
    GROUP BY 1
)
SELECT l_partkey, value_cents / 100.0 AS value
FROM german
WHERE value_cents > (SELECT CAST(sum(value_cents) * 0.001 AS BIGINT) FROM german)
""")
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock identification (TPC-H Q11 shape): parts whose
    NATION_7-supplied value exceeds 0.1% of that nation's total value.
    The group-by feeds BOTH the per-part rows and the global threshold
    (an uncorrelated scalar subquery -> one-row broadcast); threshold
    compare in integer cents so the cut is exact."""
    pin_session_conf(spark)
    german = (load(spark, sf_dir, "lineitem")
              .join(F.broadcast(load(spark, sf_dir, "supplier")),
                    F.col("s_suppkey") == F.col("l_suppkey"))
              .join(F.broadcast(load(spark, sf_dir, "nation")
                                .filter(F.col("n_name") == "NATION_7")),
                    F.col("n_nationkey") == F.col("s_nationkey"))
              .groupBy("l_partkey")
              .agg(F.sum(_cents("l_extendedprice")).alias("value_cents")))
    threshold = german.agg(
        (F.sum("value_cents") * 0.001).cast("long").alias("th"))
    return (german.join(F.broadcast(threshold),
                        F.col("value_cents") > F.col("th"))
            .select("l_partkey", (F.col("value_cents") / 100.0).alias("value")))


@register("tpch_q12", oracle="""
WITH banded AS (
    SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) > 60
                THEN 'late' ELSE 'on-time' END AS ship_band,
           o_orderpriority
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
)
SELECT ship_band,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM banded GROUP BY 1
""")
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-delay priority split (TPC-H Q12 shape): lineitems
    banded by order-to-ship latency (no l_shipmode/receiptdate in this
    testdata; the >60-day band plays the late-shipmode role), with the
    signature CASE-sum pivot counting high- vs low-priority orders per
    band. One fact-fact equi join, map-side combinable aggregate."""
    pin_session_conf(spark)
    late = (F.when(F.datediff("l_shipdate", "o_orderdate") > 60, "late")
            .otherwise("on-time"))
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (load(spark, sf_dir, "lineitem")
            .join(load(spark, sf_dir, "orders"),
                  F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy(late.alias("ship_band"))
            .agg(F.sum(is_high.cast("long")).alias("high_line_count"),
                 F.sum((~is_high).cast("long")).alias("low_line_count")))


@register("tpch_q16", oracle="""
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 24, 28)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
""")
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts/supplier relationship count (TPC-H Q16 shape): distinct
    suppliers per (brand, type, size) for a size IN-list, excluding
    complaint suppliers (negative balance plays the 'Customer
    Complaints' role; no partsupp here, so the relationship comes from
    observed lineitems). The NOT IN subquery is a broadcast anti join
    -- never a per-row subquery; count(DISTINCT) shuffles once on the
    group keys with the suppkey folded into the aggregate."""
    pin_session_conf(spark)
    bad_sup = (load(spark, sf_dir, "supplier")
               .filter(F.col("s_acctbal") < 0).select("s_suppkey"))
    part = (load(spark, sf_dir, "part")
            .filter((F.col("p_brand") != "Brand#1")
                    & (F.col("p_type") != "PROMO")
                    & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 28))
            .select("p_partkey", "p_brand", "p_type", "p_size"))
    return (load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
            .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
            .join(F.broadcast(bad_sup),
                  F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


@register("tpch_q20", oracle="""
SELECT s.s_suppkey, s.s_name, n.n_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE s.s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey
    HAVING sum(CAST(round(l_quantity, 0) AS BIGINT)) > 100
)
""")
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excess-volume supplier identification (TPC-H Q20 shape):
    suppliers who moved >100 units of 'small%' parts in 1996 -- the
    nested IN chain (parts by name -> their 1996 lineitems -> suppliers
    over threshold). Both INs become semi joins: the part-name set
    broadcasts into the lineitem scan, the qualifying-supplier set
    broadcasts into supplier. The HAVING aggregate is the only
    shuffle, keyed on suppkey."""
    pin_session_conf(spark)
    small_parts = (load(spark, sf_dir, "part")
                   .filter(F.col("p_name").like("small%"))
                   .select("p_partkey"))
    heavy = (load(spark, sf_dir, "lineitem")
             .filter((F.col("l_shipdate") >= "1996-01-01")
                     & (F.col("l_shipdate") < "1997-01-01"))
             .join(F.broadcast(small_parts),
                   F.col("l_partkey") == F.col("p_partkey"), "left_semi")
             .groupBy("l_suppkey")
             .agg(F.sum(F.round("l_quantity", 0).cast("long")).alias("qty"))
             .filter(F.col("qty") > 100)
             .select("l_suppkey"))
    return (load(spark, sf_dir, "supplier")
            .join(F.broadcast(heavy),
                  F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
            .join(F.broadcast(load(spark, sf_dir, "nation")),
                  F.col("n_nationkey") == F.col("s_nationkey"))
            .select("s_suppkey", "s_name", "n_name"))


@register("tpch_q21", oracle="""
WITH lo AS (
    SELECT l_orderkey, l_suppkey,
           datediff('day', o_orderdate, l_shipdate) > 90 AS is_late
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE o_orderstatus = 'F'
)
SELECT s.s_name,
       CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
FROM lo l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE l1.is_late
  AND n.n_name IN ('NATION_3', 'NATION_11')
  AND EXISTS (SELECT 1 FROM lo l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lo l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.is_late)
GROUP BY 1
""")
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers-who-kept-orders-waiting (TPC-H Q21 shape): on
    finished multi-supplier orders, the supplier whose line shipped
    >90 days after the order while every OTHER supplier shipped on
    time (late = shipdate lag; no receipt/commit dates here). The
    EXISTS / NOT EXISTS pair is computed as per-order supplier
    statistics over ONE shuffle (count distinct suppliers, count
    distinct late suppliers per order) instead of two correlated
    self-joins -- same fixpoint, half the passes; the oracle keeps the
    classic two-subquery form to prove equivalence."""
    pin_session_conf(spark)
    lo = (load(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_shipdate")
          .join(load(spark, sf_dir, "orders")
                .filter(F.col("o_orderstatus") == "F")
                .select("o_orderkey", "o_orderdate"),
                F.col("o_orderkey") == F.col("l_orderkey"))
          .select("l_orderkey", "l_suppkey",
                  (F.datediff("l_shipdate", "o_orderdate") > 90)
                  .alias("is_late")))
    per_order = (lo.groupBy("l_orderkey")
                 .agg(F.countDistinct("l_suppkey").alias("n_supps"),
                      F.countDistinct(
                          F.when(F.col("is_late"), F.col("l_suppkey")))
                      .alias("n_late_supps")))
    nat = (load(spark, sf_dir, "nation")
           .filter(F.col("n_name").isin("NATION_3", "NATION_11"))
           .select("n_nationkey", "n_name"))
    sup = (load(spark, sf_dir, "supplier")
           .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
           .select("s_suppkey", "s_name"))
    return (lo.filter(F.col("is_late"))
            .join(per_order.filter((F.col("n_supps") >= 2)
                                   & (F.col("n_late_supps") == 1)),
                  "l_orderkey", "left_semi")
            .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
            .groupBy("s_name")
            .agg(F.countDistinct("l_orderkey").alias("numwait")))


@register("funnel_events", oracle="""
WITH s1 AS (
    SELECT user_id, min(ts) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY 1
), s2 AS (
    SELECT e.user_id, min(e.ts) AS t2
    FROM events e JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = 'click' AND e.ts > s1.t1
    GROUP BY 1
), s3 AS (
    SELECT e.user_id, min(e.ts) AS t3
    FROM events e JOIN s2 ON e.user_id = s2.user_id
    WHERE e.event_type = 'purchase' AND e.ts > s2.t2
    GROUP BY 1
)
SELECT stage, users FROM (
    SELECT 1 AS stage, count(*) AS users FROM s1
    UNION ALL SELECT 2, count(*) FROM s2
    UNION ALL SELECT 3, count(*) FROM s3
)
""")
def funnel_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step behavioral funnel (view -> click -> purchase, each
    step strictly after the previous): per-stage user counts, the
    product-analytics staple. Expressed as ordered min-timestamp
    cascades -- each stage is one aggregation over the events joined to
    the previous stage's per-user frontier.

    Scale shape: each stage shuffles on user_id once, and all three
    stages reuse the SAME hash partitioning, so AQE plans the later
    joins shuffle-free on the co-partitioned side. Per-user state is
    one timestamp per stage, never an event list -- memory is O(users),
    not O(events)."""
    pin_session_conf(spark)
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (ev.where(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("ts").alias("t1")))
    s2 = (ev.where(F.col("event_type") == "click")
          .join(s1, "user_id")
          .where(F.col("ts") > F.col("t1"))
          .groupBy("user_id").agg(F.min("ts").alias("t2")))
    s3 = (ev.where(F.col("event_type") == "purchase")
          .join(s2, "user_id")
          .where(F.col("ts") > F.col("t2"))
          .groupBy("user_id").agg(F.min("ts").alias("t3")))
    counts = [df.agg(F.count(F.lit(1)).alias("users"))
              .select(F.lit(i + 1).alias("stage"), "users")
              for i, df in enumerate((s1, s2, s3))]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


@register("retention_cohorts", oracle="""
WITH weekly AS (
    SELECT user_id,
           CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk
    FROM events
), firsts AS (
    SELECT user_id, min(wk) AS cohort_wk FROM weekly GROUP BY 1
)
SELECT f.cohort_wk,
       CAST(w.wk - f.cohort_wk AS BIGINT) AS week_offset,
       count(DISTINCT w.user_id) AS active_users
FROM weekly w JOIN firsts f ON w.user_id = f.user_id
GROUP BY 1, 2
""")
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-activity
    week, activity counted per week offset -- THE engagement report.
    Weeks are epoch-seconds DIV 604800 (engine-portable, timezone- and
    week-start-free), so both engines bucket identically.

    Scale shape: one groupBy(user) for cohorts, one join back on
    user_id (co-partitioned with the groupBy's shuffle, AQE reuses the
    exchange), one final aggregate whose cardinality is
    cohorts x offsets -- tiny. The distinct inside the final aggregate
    is per (cohort, offset, user), map-side combinable."""
    pin_session_conf(spark)
    weekly = (load(spark, sf_dir, "events")
              .select("user_id",
                      F.floor(F.unix_timestamp("ts") / 604800)
                      .cast("long").alias("wk")))
    firsts = weekly.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (weekly.join(firsts, "user_id")
            .groupBy("cohort_wk",
                     (F.col("wk") - F.col("cohort_wk")).cast("long")
                     .alias("week_offset"))
            .agg(F.countDistinct("user_id").alias("active_users")))


_LTV_Q = 1_000_000  # 6-decimal floor quantization, shared with oracles


@register("agg_cohort_ltv", oracle=f"""
WITH o AS (
    SELECT o_custkey AS u,
           CAST((year(o_orderdate) * 12 + month(o_orderdate)) - 1
                AS BIGINT) AS mo,
           o_totalprice AS rev
    FROM orders
    WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
          AND o_totalprice IS NOT NULL
),
cohort AS (SELECT u, min(mo) AS c0 FROM o GROUP BY 1),
sizes AS (SELECT c0, count(*) AS n_users FROM cohort GROUP BY 1),
monthly AS (
    SELECT c.c0, o.mo - c.c0 AS age, sum(o.rev) AS rev
    FROM o JOIN cohort c ON o.u = c.u
    GROUP BY 1, 2
),
cum AS (
    SELECT c0, age, rev,
           sum(rev) OVER (PARTITION BY c0 ORDER BY age ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum_rev
    FROM monthly
)
SELECT CAST(c.c0 AS BIGINT) AS cohort_month,
       CAST(c.age AS BIGINT) AS age_months,
       CAST(s.n_users AS BIGINT) AS cohort_size,
       floor(c.cum_rev / s.n_users * {_LTV_Q} + 0.5) / {_LTV_Q}
           AS ltv_per_user
FROM cum c JOIN sizes s ON c.c0 = s.c0
""")
def agg_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers grouped by FIRST-order
    month, cumulative revenue per cohort member by account age -- the
    money view that retention_cohorts' activity percentages feed into
    (retention says who came back; LTV says what that was worth), and
    the table every payback-period / CAC decision reads. cohort_month
    is the absolute month index (year*12 + month - 1), age in months
    since the cohort's first order.

    Shape: one groupBy(user) finds cohorts; one groupBy(cohort, age)
    collapses the fact table to a calendar-bounded keyspace
    (|months| x |months| at most); the cumulative revenue is a window
    PARTITIONED BY COHORT over that bounded table -- each cohort's
    timeline sorts independently, never a global sort, and the
    per-partition row count is bounded by the corpus month span.
    Revenue sums are the only noise-bearing floats; the per-user
    division floor-quantizes at 1e-6."""
    pin_session_conf(spark)
    from pyspark.sql.window import Window
    o = (load(spark, sf_dir, "orders")
         .where(F.col("o_custkey").isNotNull()
                & F.col("o_orderdate").isNotNull()
                & F.col("o_totalprice").isNotNull())
         .select(F.col("o_custkey").alias("u"),
                 (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
                 .cast("long").alias("mo"),
                 F.col("o_totalprice").alias("rev")))
    cohort = o.groupBy("u").agg(F.min("mo").alias("c0"))
    sizes = cohort.groupBy("c0").agg(F.count(F.lit(1)).alias("n_users"))
    monthly = (o.join(cohort, "u")
               .groupBy("c0", (F.col("mo") - F.col("c0")).alias("age"))
               .agg(F.sum("rev").alias("rev")))
    w = (Window.partitionBy("c0").orderBy(F.col("age").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = monthly.withColumn("cum_rev", F.sum("rev").over(w))
    return (cum.join(F.broadcast(sizes), "c0")
            .select(F.col("c0").cast("long").alias("cohort_month"),
                    F.col("age").cast("long").alias("age_months"),
                    F.col("n_users").cast("long").alias("cohort_size"),
                    (F.floor(F.col("cum_rev") / F.col("n_users") * _LTV_Q
                             + F.lit(0.5)) / _LTV_Q).alias("ltv_per_user")))
