"""SQL-API operators: the engine's spark.sql() surface (SURVEY.md §4).

The reference never writes SQL (its one selectExpr pair aside,
MovieLensRecommender.py:135-139), but the engine exposes the full SQL
entry point over the catalog views -- including the constructs Catalyst
must rewrite before planning: correlated subqueries (decorrelated to
joins), CTEs, and GROUPING SETS. Each query here is the same string an
analyst would hand DuckDB, so the oracle check also proves ANSI
compatibility of the dialect subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from recommendation_system_spark_ml_spark.registry import register
from recommendation_system_spark_ml_spark.session import pin_session_conf
from recommendation_system_spark_ml_spark.sources.catalog import register_views


@register("sql_subquery_exists", oracle="""
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
""")
def sql_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS -- Catalyst decorrelates to a left-semi join
    (free per SURVEY.md §4); no per-row re-execution ever happens."""
    pin_session_conf(spark)
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT c_custkey, c_mktsegment
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 200000)""")


@register("sql_subquery_scalar", oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
""")
def sql_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: planned once, broadcast as a
    literal into the filter."""
    pin_session_conf(spark)
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)""")


@register("sql_cte_grouping_sets", oracle="""
WITH base AS (
    SELECT o_orderstatus, o_orderpriority, o_totalprice FROM orders
)
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) / 100.0
           AS total
FROM base
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority))
""")
def sql_cte_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + explicit GROUPING SETS (the general form of rollup/cube;
    one shuffle, grouping-id expansion map-side)."""
    pin_session_conf(spark)
    register_views(spark, sf_dir)
    return spark.sql("""
        WITH base AS (
            SELECT o_orderstatus, o_orderpriority, o_totalprice FROM orders
        )
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n,
               -- literal 100.0 parses as DECIMAL in Spark SQL (unlike
               -- the DataFrame API); cast so the division stays DOUBLE
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                   / CAST(100 AS DOUBLE) AS total
        FROM base
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))""")


@register("sql_subquery_in", oracle="""
SELECT p_partkey, p_type
FROM part
WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
                        WHERE l_quantity > 45)
""")
def sql_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN subquery -> null-aware anti join."""
    pin_session_conf(spark)
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT p_partkey, p_type
        FROM part
        WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
                                WHERE l_quantity > 45)""")


@register("sql_window_qualify", oracle="""
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
) WHERE rn = 1
""")
def sql_window_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed top-1-per-key through the SQL entry point (the
    QUALIFY idiom spelled portably as a ranked subquery) -- proves the
    SQL surface plans the same WindowGroupLimit as the DataFrame API."""
    pin_session_conf(spark)
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) WHERE rn = 1""")


@register("sql_pivot", oracle="""
SELECT user_id,
       CAST(coalesce(count(*) FILTER (event_type = 'click'), 0) AS BIGINT) AS click,
       CAST(coalesce(count(*) FILTER (event_type = 'purchase'), 0) AS BIGINT) AS purchase,
       CAST(coalesce(count(*) FILTER (event_type = 'view'), 0) AS BIGINT) AS "view"
FROM events GROUP BY user_id
""")
def sql_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIVOT clause (the syntax surface of agg_pivot): pinned
    value list, counts coalesced to 0 -- one aggregation pass."""
    pin_session_conf(spark)
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT user_id,
               coalesce(click, 0) AS click,
               coalesce(purchase, 0) AS purchase,
               coalesce(view, 0) AS view
        FROM (SELECT user_id, event_type FROM events)
        PIVOT (count(*) FOR event_type IN ('click', 'purchase', 'view'))""")


@register("sql_lateral_topn", oracle="""
SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS o_totalprice
FROM customer c,
     LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
              WHERE o.o_custkey = c.c_custkey
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
WHERE c.c_mktsegment = 'BUILDING'
""")
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY/LIMIT: each building-
    segment customer's top-2 orders by price. Catalyst decorrelates
    the lateral into a join + per-key WindowGroupLimit -- the same
    physical shape as the QUALIFY top-n (sql_window_qualify), proving
    the per-row-subquery SYNTAX costs nothing extra: no re-execution
    per outer row at any scale. Tie-broken on o_orderkey so the top-2
    set is deterministic."""
    pin_session_conf(spark)
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT c.c_custkey, t.o_orderkey,
               round(t.o_totalprice, 2) AS o_totalprice
        FROM customer c,
             LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c.c_mktsegment = 'BUILDING'""")


@register("sql_recursive_cte", oracle="""
WITH RECURSIVE spine(ym_start) AS (
    SELECT DATE '1992-01-01'
    UNION ALL
    SELECT ym_start + INTERVAL 1 MONTH FROM spine
    WHERE ym_start < DATE '1998-12-01'
)
SELECT strftime(s.ym_start, '%Y-%m') AS ym,
       CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
FROM spine s
LEFT JOIN orders o
       ON o.o_orderdate >= s.ym_start
      AND o.o_orderdate < s.ym_start + INTERVAL 1 MONTH
GROUP BY 1
""")
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): an 84-row month spine
    generated by recursion, left-joined to per-month order counts so
    empty months survive with 0. The declarative-iteration surface
    demo; series_spine computes the same spine with sequence()+explode,
    which stays the 100 TB path (one expression, no iterative
    planning), and dedup_components keeps its explicit loop for
    fixpoints a recursive UNION ALL can't express safely on cyclic
    graphs (Spark's rCTE has no cycle-safe UNION yet).

    The orders side is pre-aggregated to per-month counts and joined
    on month-start EQUALITY: a range predicate against the spine would
    plan a nested-loop join that builds a fact-table side, while the
    equi-join aggregates fact rows map-side and broadcasts the tiny
    month table -- the shape that survives a 100 TB order log."""
    pin_session_conf(spark)
    register_views(spark, sf_dir)
    return spark.sql("""
        WITH RECURSIVE spine(ym_start) AS (
            SELECT DATE '1992-01-01'
            UNION ALL
            SELECT ym_start + INTERVAL 1 MONTH FROM spine
            WHERE ym_start < DATE '1998-12-01'
        ),
        monthly AS (
            SELECT trunc(o_orderdate, 'MM') AS m_start,
                   count(*) AS n
            FROM orders GROUP BY 1
        )
        SELECT date_format(s.ym_start, 'yyyy-MM') AS ym,
               coalesce(m.n, 0) AS n_orders
        FROM spine s
        LEFT JOIN monthly m ON CAST(s.ym_start AS DATE) = m.m_start""")


@register("sql_pipe_syntax", oracle="""
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
FROM orders
WHERE o_orderstatus = 'O'
GROUP BY o_orderpriority
""")
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4): the same filter->aggregate->project
    expressed as a |> chain. Purely front-end sugar -- Catalyst plans
    the identical partial-agg + exchange as the GROUP BY form, which is
    exactly what the oracle (written as classic ANSI SQL) certifies."""
    pin_session_conf(spark)
    register_views(spark, sf_dir)
    return spark.sql("""
        FROM orders
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE count(*) AS n_orders,
                     CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                          AS BIGINT) AS cents
           GROUP BY o_orderpriority
        |> SELECT o_orderpriority, n_orders, cents""")


@register("sql_scripting_loop", oracle="""
WITH totals AS (
    SELECT o_custkey, sum(o_totalprice) AS s FROM orders GROUP BY 1
), cand AS (
    SELECT CAST(64 * power(2, g) AS BIGINT) AS t
    FROM generate_series(1, 40) gs(g)
), counts AS (
    SELECT t, (SELECT count(*) FROM totals WHERE s > t) AS n FROM cand
)
SELECT CAST(t AS BIGINT) AS threshold, CAST(n AS BIGINT) AS n_above
FROM counts WHERE n < 10 ORDER BY t LIMIT 1
""")
def sql_scripting_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 BEGIN/DECLARE/REPEAT): double a spend
    threshold until fewer than 10 customers exceed it -- driver-side
    control flow around ordinary distributed queries, the procedural
    surface migrations from stored-procedure warehouses expect.

    Each REPEAT iteration is one small aggregate job over the
    pre-grouped totals; the loop count is O(log(max spend)), ~20
    iterations, independent of data size. The oracle replays the same
    search declaratively (powers-of-two candidates, min satisfying
    threshold) -- count monotonicity makes the two formulations
    provably equivalent."""
    pin_session_conf(spark)
    register_views(spark, sf_dir)
    # Cache the pre-grouped totals for the duration of the script
    # (guide §5: the REPEAT loop probes the SAME aggregate ~20 times;
    # uncached, every iteration re-scanned and re-grouped the full
    # orders table -- measured 4.7 s at sf0.1, ~1 s cached). The
    # script's final SELECT returns DECLARE'd scalars, so the cache
    # can be dropped before returning without the result recomputing.
    spark.sql("DROP VIEW IF EXISTS __sql_loop_totals")
    spark.sql("""CACHE TABLE __sql_loop_totals AS
                 SELECT o_custkey, sum(o_totalprice) AS s
                 FROM orders GROUP BY o_custkey""")
    try:
        return spark.sql("""
            BEGIN
              DECLARE t BIGINT DEFAULT 64;
              DECLARE n BIGINT DEFAULT 0;
              REPEAT
                SET t = t * 2;
                SET n = (SELECT count(*) FROM __sql_loop_totals
                         WHERE s > t);
              UNTIL n < 10 END REPEAT;
              SELECT t AS threshold, n AS n_above;
            END""")
    finally:
        # the scripting block executed eagerly above (its final SELECT
        # returns DECLARE'd scalars), so dropping the cached view here
        # cannot invalidate the returned frame
        spark.sql("UNCACHE TABLE IF EXISTS __sql_loop_totals")
        spark.sql("DROP VIEW IF EXISTS __sql_loop_totals")


@register("sql_udf_declarative", oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 250000 THEN 'high'
            WHEN o_totalprice >= 100000 THEN 'mid'
            ELSE 'low' END AS tier,
       CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN upper(o_orderstatus) ELSE lower(o_orderstatus) END
           AS status_marked
FROM orders
""")
def sql_udf_declarative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-declared scalar UDFs (Spark 4 `CREATE FUNCTION ... RETURN
    expr`): business logic registered once in the catalog as a SQL
    expression, reused across queries -- and, critically, INLINED by
    Catalyst into the calling plan, so unlike Python UDFs a SQL UDF
    costs nothing: the oracle (the expanded expression) certifies the
    inlining is semantics-preserving, and the plan stays whole-stage
    codegen with pushdown-eligible predicates. This is the 100 TB
    answer for shared business vocabulary: a function catalog, not a
    UDF jar."""
    pin_session_conf(spark)
    register_views(spark, sf_dir)
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION price_tier(p DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN p >= 250000 THEN 'high'
                    WHEN p >= 100000 THEN 'mid'
                    ELSE 'low' END""")
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION mark_status(
            prio STRING, status STRING)
        RETURNS STRING
        RETURN CASE WHEN prio IN ('1-URGENT', '2-HIGH')
                    THEN upper(status) ELSE lower(status) END""")
    return spark.sql("""
        SELECT o_orderkey,
               price_tier(o_totalprice) AS tier,
               mark_status(o_orderpriority, o_orderstatus) AS status_marked
        FROM orders""")


@register("sql_session_variables", oracle="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_above,
       CAST(min(o_orderkey) AS BIGINT) AS first_key
FROM orders
WHERE o_totalprice > (SELECT max(o_totalprice) / 2 FROM orders)
GROUP BY 1
""")
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (Spark 4 DECLARE VARIABLE / SET VAR):
    parameterize a query from a prior query's result without string
    interpolation or a driver round-trip through Python -- the
    variable read is constant-folded into the consuming plan, so the
    predicate stays pushdown-eligible (same plan as the literal).

    The threshold is max(price)/2 deliberately: max is an exact
    selection and /2 is exact in IEEE, so the boundary is
    bit-identical cross-engine with NO quantization -- an avg-based
    cutoff would inherit treeAggregate merge-order drift (the
    ml_minmax_parity vs StandardScaler distinction).

    SET VAR executes its subquery eagerly (one tiny job) -- at scale
    that is one aggregate over the dimension, not a per-row
    correlated subquery."""
    pin_session_conf(spark)
    register_views(spark, sf_dir)
    spark.sql("DECLARE OR REPLACE VARIABLE price_cutoff DOUBLE")
    spark.sql("SET VAR price_cutoff = "
              "(SELECT max(o_totalprice) / 2 FROM orders)")
    return spark.sql("""
        SELECT o_orderpriority, count(*) AS n_above,
               min(o_orderkey) AS first_key
        FROM orders
        WHERE o_totalprice > price_cutoff
        GROUP BY 1""")


@register("sql_named_parameters", oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders
WHERE o_totalprice BETWEEN 50000 AND 150000
  AND o_orderstatus = 'O'
GROUP BY 1
""")
def sql_named_parameters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 named-parameter SQL (spark.sql(query, args=...)): the
    safe-templating API that replaces string interpolation -- values
    bind as literals AFTER parsing, so a hostile parameter can never
    change the query shape (SQL injection is structurally impossible)
    and Catalyst still constant-folds the bound literal into a
    pushdown-eligible predicate, exactly like sql_session_variables'
    DECLARE path. The oracle states the same query with the literals
    inlined -- certifying that binding is semantically identical to
    inlining."""
    pin_session_conf(spark)
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        WHERE o_totalprice BETWEEN :lo AND :hi
          AND o_orderstatus = :status
        GROUP BY 1""",
        args={"lo": 50000, "hi": 150000, "status": "O"})


@register("sql_identifier_clause", oracle="""
SELECT o_orderpriority AS grp,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(o_totalprice), 4) AS avg_metric
FROM orders
GROUP BY 1
""")
def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 IDENTIFIER(:param) clause: table and column names bind
    as IDENTIFIERS through the same parameter channel values use --
    the safe-templating answer to dashboards that interpolate
    "GROUP BY " + col (identifier injection is the half of SQL
    injection sql_named_parameters can't cover, because names cannot
    be value-literals). A hostile parameter like
    'o_orderpriority; DROP TABLE' fails to parse as one identifier
    instead of becoming a statement. The oracle inlines the
    identifiers statically -- certifying IDENTIFIER binding is
    semantically identical to writing the name, pushdown included."""
    pin_session_conf(spark)
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT IDENTIFIER(:grp_col) AS grp,
               CAST(count(*) AS BIGINT) AS n,
               round(avg(IDENTIFIER(:metric_col)), 4) AS avg_metric
        FROM IDENTIFIER(:tbl)
        GROUP BY 1""",
        args={"tbl": "orders", "grp_col": "o_orderpriority",
              "metric_col": "o_totalprice"})
