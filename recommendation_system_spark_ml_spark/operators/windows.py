"""Window functions, sorts, limits, top-k (SURVEY.md §2.5).

The reference's driver-side pandas analogs: A5 lag-difference
(MovieLensRecommender.py:49, SSE.diff()) and A6 top-1
(MLR.py:63,182, idxmin) -- here as distributed window functions.

Every window below orders by a FULLY deterministic key list (ties
broken by primary keys) so results are engine-reproducible; a window
ordered on a non-unique column is the classic nondeterminism footgun.

Scale: a window = one shuffle on partitionBy keys; per-partition state
is streamed (rank/lag) or frame-bounded (running sums) -- no skew issue
unless one partition key dominates, which partitionBy-key choice here
avoids (per-customer, per-part)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from recommendation_system_spark_ml_spark.registry import register
from recommendation_system_spark_ml_spark.session import pin_session_conf
from recommendation_system_spark_ml_spark.sources.catalog import load


@register("window_rank", oracle="""
SELECT * FROM (
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
           CAST(row_number() OVER w AS INTEGER) AS rn,
           CAST(rank() OVER w AS INTEGER) AS rnk,
           CAST(dense_rank() OVER w AS INTEGER) AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
) WHERE rn <= 3
""", bench=True)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: row_number/rank/dense_rank."""
    pin_session_conf(spark)
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (load(spark, sf_dir, "orders")
            .select("o_custkey", "o_orderkey", "o_totalprice")
            .withColumn("rn", F.row_number().over(w))
            .withColumn("rnk", F.rank().over(w))
            .withColumn("drnk", F.dense_rank().over(w))
            .filter(F.col("rn") <= 3)
            .select("o_custkey", "o_orderkey",
                    F.round("o_totalprice", 2).alias("o_totalprice"),
                    "rn", "rnk", "drnk"))


@register("window_lag_diff", oracle="""
SELECT o_custkey, o_orderkey,
       round(o_totalprice - coalesce(lag(o_totalprice) OVER w, 0), 2) AS price_diff,
       CAST(datediff('day', lag(o_orderdate) OVER w, o_orderdate) AS INTEGER) AS days_since_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_orderdate NULLS LAST, o_orderkey)
""")
def window_lag_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: lag + first-difference + fillna(0) -- the reference's
    SSE.diff().fillna(0) elbow input (MLR.py:49), distributed."""
    pin_session_conf(spark)
    w = W.partitionBy("o_custkey").orderBy(
        F.asc_nulls_last("o_orderdate"), "o_orderkey")
    return (load(spark, sf_dir, "orders")
            .select("o_custkey", "o_orderkey", "o_totalprice", "o_orderdate")
            .select("o_custkey", "o_orderkey",
                    F.round(F.col("o_totalprice")
                            - F.coalesce(F.lag("o_totalprice").over(w), F.lit(0)), 2)
                    .alias("price_diff"),
                    F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
                    .alias("days_since_prev")))


@register("window_frame", oracle="""
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
            OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate NULLS LAST, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0
       AS running_spend,
       round(avg(o_totalprice)
             OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate NULLS LAST, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg_3
FROM orders
""")
def window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit frames: running total (integer-cents exact) + 3-row
    moving average."""
    pin_session_conf(spark)
    w = W.partitionBy("o_custkey").orderBy(
        F.asc_nulls_last("o_orderdate"), "o_orderkey")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return (load(spark, sf_dir, "orders")
            .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
            .select("o_custkey", "o_orderkey",
                    (F.sum(cents).over(w.rowsBetween(W.unboundedPreceding, 0)) / 100.0)
                    .alias("running_spend"),
                    F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4)
                    .alias("moving_avg_3")))


@register("sort_limit", oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""")
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject (per-partition
    top-k + driver merge of k*partitions rows) -- no full global sort,
    which is what makes LIMIT-after-ORDER scale."""
    pin_session_conf(spark)
    return (load(spark, sf_dir, "orders")
            .select("o_orderkey", "o_totalprice", "o_orderpriority")
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .limit(10)
            .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"),
                    "o_orderpriority"))


@register("window_ntile", oracle="""
SELECT c_custkey,
       CAST(ntile(4) OVER (ORDER BY c_acctbal NULLS LAST, c_custkey)
            AS INTEGER) AS balance_quartile
FROM customer
""")
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global quantile bucketing WITHOUT the single-reducer window that
    a bare `ntile(4) OVER (ORDER BY ...)` plans. Two-level, the same
    recipe as stable_row_ids (relational.py): range-bucket the sort key
    (monotone in c_acctbal, so bucket order == global order), rank
    within each bucket in parallel, then lift per-bucket ranks to
    global row numbers via a broadcast offset table (a window over
    n_buckets rows, not n rows). ntile's exact fill rule -- the first
    n mod k tiles take one extra row -- is then a closed-form expression
    over (global rn, total n).

    At 100 TB the only global structure is the bucket-count table;
    every row-sized sort stays inside its hash partition."""
    pin_session_conf(spark)
    k = 4
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    # c_acctbal spans [-999.99, 9999.99]: ~22 buckets of width 500.
    # NULL balances ride a sentinel bucket ABOVE every real one
    # (matching the oracle's NULLS LAST): floor(NULL) would make a
    # NULL bucket key, and the offset equi-join silently drops
    # NULL-keyed rows (fuzz-caught row loss).
    bucketed = cust.withColumn(
        "bucket", F.coalesce(F.floor(F.col("c_acctbal") / 500),
                             F.lit(10**9)).cast("long"))
    wb = W.partitionBy("bucket").orderBy(
        F.asc_nulls_last("c_acctbal"), "c_custkey")
    within = bucketed.withColumn("rn_in_bucket", F.row_number().over(wb))
    counts = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    woff = (W.orderBy("bucket")
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    wtot = W.rowsBetween(W.unboundedPreceding,
                              W.unboundedFollowing)
    offsets = (counts
               .withColumn("offset", F.sum("n").over(woff) - F.col("n"))
               .withColumn("total", F.sum("n").over(wtot))
               .select("bucket", "offset", "total"))
    rn = F.col("offset") + F.col("rn_in_bucket")  # global 1-based rank
    q = F.floor(F.col("total") / k)       # base tile size
    r = F.col("total") % k                # first r tiles take q+1 rows
    big_span = r * (q + 1)                # rows covered by the fat tiles
    tile = (F.when(rn <= big_span,
                   F.floor((rn - 1) / (q + 1)) + 1)
            .otherwise(r + F.floor((rn - big_span - 1) / q) + 1))
    return (within.join(F.broadcast(offsets), "bucket")
            .select("c_custkey", tile.cast("int").alias("balance_quartile")))


@register("window_first_last", oracle="""
SELECT o_custkey, o_orderkey,
       round(first_value(o_totalprice) OVER w, 2) AS first_price,
       round(last_value(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate NULLS LAST, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS last_price,
       CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_orders
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_orderdate NULLS LAST, o_orderkey)
""")
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value with explicit frames: each customer's
    first and latest order price side-by-side with every order. The
    classic footgun -- last_value over the DEFAULT frame (unbounded
    preceding..current row) returns the current row -- is avoided by
    pinning the full frame explicitly. Tie-break on o_orderkey keeps
    same-day orders deterministic. One shuffle on o_custkey serves all
    three windows (same partitioning)."""
    pin_session_conf(spark)
    wo = W.partitionBy("o_custkey").orderBy(
        F.asc_nulls_last("o_orderdate"), "o_orderkey")
    wfull = wo.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (load(spark, sf_dir, "orders")
            .select("o_custkey", "o_orderkey",
                    F.round(F.first("o_totalprice").over(wo), 2).alias("first_price"),
                    F.round(F.last("o_totalprice").over(wfull), 2).alias("last_price"),
                    F.count(F.lit(1)).over(W.partitionBy("o_custkey")).alias("n_orders")))


@register("window_range_frame", oracle="""
SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS c_acctbal,
       CAST(count(*) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal
                           RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING)
            AS BIGINT) AS n_peers_within_500
FROM customer
""")
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): how many same-segment
    customers sit within +-500 of each balance. Unlike ROWS frames,
    RANGE bounds move with the ORDER BY value, so ties share a frame
    and the result needs no tie-break to be deterministic. Same single
    shuffle on the partition key; the frame scan is a sliding pointer
    pair over the sorted partition -- O(n) per partition, not O(n^2)."""
    pin_session_conf(spark)
    w = (W.partitionBy("c_mktsegment").orderBy("c_acctbal")
         .rangeBetween(-500, 500))
    return (load(spark, sf_dir, "customer")
            .select("c_custkey", "c_mktsegment",
                    F.round("c_acctbal", 2).alias("c_acctbal"),
                    F.count(F.lit(1)).over(w).alias("n_peers_within_500")))


@register("sessionize_events", oracle="""
WITH flagged AS (
    SELECT event_id, user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch(ts) - epoch(lag(ts) OVER w) > 21600
                THEN 1 ELSE 0 END AS is_new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id)
)
SELECT event_id, user_id,
       CAST(sum(is_new_session)
            OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
                  ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_seq,
       CAST(is_new_session AS INTEGER) AS is_new_session
FROM flagged
""")
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: gap-based session assignment (a new
    session starts after >6h of user inactivity) via lag + running sum
    -- the telemetry/clickstream shape every training-data pipeline
    cuts its examples on, and the batch twin of stream_session's
    session_window. One shuffle on user_id serves both windows; the
    running sum streams per partition, so state is O(1) per user and
    skew follows the user-activity distribution (a bot-grade hot user
    salts the same way join_salted does)."""
    pin_session_conf(spark)
    # NULL-ts rows: Spark's asc default is NULLS FIRST, DuckDB's is
    # NULLS LAST -- the oracle pins NULLS FIRST explicitly so both
    # engines sequence untimestamped events identically (each opens
    # its own session: gap vs NULL is NULL -> new) (probe-caught)
    ev = load(spark, sf_dir, "events")
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(wo))
    is_new = F.when(gap.isNull() | (gap > 21600), 1).otherwise(0)
    flagged = ev.select("event_id", "user_id", "ts",
                        is_new.alias("is_new_session"))
    wrun = wo.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (flagged.select(
        "event_id", "user_id",
        F.sum("is_new_session").over(wrun).cast("int").alias("session_seq"),
        F.col("is_new_session").cast("int")))


@register("pattern_adjacent_conversion", oracle="""
WITH seq AS (
    SELECT user_id, event_type, ts,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts NULLS FIRST, event_id) AS next_type,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts NULLS FIRST, event_id) AS next_ts
    FROM events
)
SELECT user_id,
       count(*) AS n_conversions,
       min(epoch_us(next_ts) - epoch_us(ts)) AS fastest_us
FROM seq
WHERE event_type = 'view' AND next_type = 'purchase'
GROUP BY 1
""")
def pattern_adjacent_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern detection (the MATCH_RECOGNIZE shape Spark
    lacks natively): per user, count view events IMMEDIATELY followed
    by a purchase -- adjacency in the user's event sequence, not just
    'eventually after' (that is funnel_events). lead() over the
    per-user order turns pattern matching into a window + filter; ties
    broken by event_id so both engines see the same sequence.

    One shuffle on user_id, O(1) window state; patterns of length k
    are k-1 chained leads -- still one window pass."""
    pin_session_conf(spark)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (load(spark, sf_dir, "events")
           .select("user_id", "event_type", "ts", "event_id")
           .withColumn("next_type", F.lead("event_type").over(w))
           .withColumn("next_ts", F.lead("ts").over(w)))
    conv = seq.where((F.col("event_type") == "view")
                     & (F.col("next_type") == "purchase"))
    # microsecond integers on both sides -- second-truncation vs
    # rounding of fractional seconds would differ by one otherwise
    gap = (F.unix_micros(F.col("next_ts").cast("timestamp"))
           - F.unix_micros(F.col("ts").cast("timestamp")))
    return (conv.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_conversions"),
                 F.min(gap).cast("long").alias("fastest_us")))


@register("window_gaps_islands", oracle="""
WITH days AS (
    SELECT DISTINCT user_id,
           CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
    FROM events
), isl AS (
    SELECT user_id, d,
           d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
    FROM days
), runs AS (
    SELECT user_id, grp, count(*) AS len FROM isl GROUP BY 1, 2
)
SELECT user_id,
       count(*) AS n_streaks,
       CAST(max(len) AS BIGINT) AS longest_streak
FROM runs GROUP BY 1
""")
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: collapse each user's active DAYS into runs of
    consecutive days (the engagement-streak report). The classic trick
    -- day minus its per-user row_number is constant within a
    consecutive run -- turns island detection into a window + two
    aggregates; no self-join, no iteration. Days are floor(epoch /
    86400) -- an explicit floor() in the oracle, because DuckDB's //
    on doubles is plain division and its BIGINT cast ROUNDS.

    One shuffle on user_id for the window, then map-side-combinable
    aggregates; contrast with sessionize_events, which cuts on TIME
    GAPS inside a day rather than calendar-day adjacency."""
    pin_session_conf(spark)
    day = F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")) / 86400)
    days = (load(spark, sf_dir, "events")
            .select("user_id", day.cast("long").alias("d")).distinct())
    w = W.partitionBy("user_id").orderBy("d")
    isl = days.withColumn("grp", F.col("d") - F.row_number().over(w))
    runs = isl.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    return (runs.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_streaks"),
                 F.max("len").cast("long").alias("longest_streak")))


@register("window_sliding_distinct", oracle="""
WITH m AS (
    SELECT DISTINCT user_id, date_trunc('hour', ts) AS h FROM events
), b AS (
    SELECT DISTINCT h FROM m
), x AS (
    SELECT m.user_id, b.h AS w
    FROM m JOIN b ON m.h <= b.h AND m.h >= b.h - INTERVAL 23 HOUR
)
SELECT w AS bucket_ts, count(DISTINCT user_id) AS users_24h
FROM x GROUP BY 1
""")
def window_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h distinct users per observed hour -- sliding
    COUNT(DISTINCT) OVER, the window aggregate Spark (and ANSI SQL
    engines generally) cannot express directly because distinctness
    does not decompose over frame slides. Re-expressed as the standard
    distributed recipe: distinct (user, hour) memberships, each
    exploded to the <= 24 windows it can serve, then a plain
    count-distinct per window.

    Scale math: the explode multiplies the MEMBERSHIP table (already
    deduped, two 8-byte columns) by the window span -- 24x of a
    heavily pre-shrunk set, not of raw events, and the final distinct
    is partial-aggregated map-side. The sequence() runs inside each
    row (no calendar cross join -- the ts_gapfill spine rule), and
    emitted windows are semi-joined to observed buckets so the output
    domain matches the oracle's. At larger spans swap to the
    IMPLEMENTED sketch twin window_sliding_distinct_hll (per-hour HLL
    sketches, slide = union of bounded sketches, 5%-gated against
    this operator) -- the trade is code, not a silent cap.
    The DuckDB oracle states the same thing as a range join, which is
    exactly the formulation that does NOT scale in Spark (an
    unbounded-growth broadcast range join per window) -- the explode
    form is the distributed restatement."""
    pin_session_conf(spark)
    ev = load(spark, sf_dir, "events")
    m = (ev.select("user_id",
                   F.date_trunc("hour", F.col("ts")).alias("h"))
         .distinct())
    wins = m.select(
        "user_id",
        F.explode(F.expr(
            "sequence(h, h + INTERVAL 23 HOURS, INTERVAL 1 HOUR)"))
        .alias("w"))
    obs = m.select(F.col("h").alias("w")).distinct()
    return (wins.join(obs, "w", "left_semi")
            .groupBy(F.col("w").alias("bucket_ts"))
            .agg(F.countDistinct("user_id").alias("users_24h")))


ROLLMED_SPAN = 9  # trailing rows per rolling-median frame (bounds state)


@register("window_rolling_median", oracle=f"""
SELECT event_id, user_id,
       round(median(value) OVER (
           PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
           ROWS BETWEEN {ROLLMED_SPAN - 1} PRECEDING AND CURRENT ROW), 6)
           AS roll_median
FROM events
""")
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median of `value` over the trailing {span} events per
    user -- the robust-smoothing twin of ts_ewma (median shrugs off
    the spikes an EWMA chases). Spark has no median window function,
    so the frame's values ride a bounded collect_list + array_sort:
    the sort is over <= {span} elements INSIDE one row's expression
    evaluation (codegen, no shuffle), and the only Exchange is the
    per-user window partitioning itself. State per row is O(span),
    the same bound ts_ewma documents -- a year-long user history
    never rides a frame. Ordering is total ((ts, event_id), event_id
    unique), so frame membership -- and the median -- is
    deterministic across engines.

    Expression hygiene: the sorted frame is bound ONCE in its own
    projection (SPARK-36718's cost-aware CollapseProject keeps the
    array_sort from being inlined per reference; the plan test pins
    a single collect_list in the Window node), and the median uses
    the branch-free two-index form avg(arr[ceil(n/2)],
    arr[floor(n/2)+1]) -- the indices coincide for odd n, so the
    average is exact (x+x)/2 = x, and the even prefixes average the
    two middles exactly like the oracle's median()."""
    pin_session_conf(spark)
    ev = load(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-(ROLLMED_SPAN - 1), W.currentRow))
    base = ev.select(
        "event_id", "user_id",
        F.array_sort(F.collect_list("value").over(w)).alias("arr"))
    n = F.size(F.col("arr"))
    # truncating int casts of positive halves: ceil(n/2), floor(n/2)+1.
    # collect_list skips NULL values, so an all-NULL frame leaves an
    # EMPTY array -- guard n > 0 (element_at(_, 0) throws) and emit
    # NULL, matching the oracle's median-of-no-values.
    med = F.when(n > 0, (F.element_at("arr", ((n + 1) / 2).cast("int"))
                         + F.element_at("arr", (n / 2 + 1).cast("int"))) / 2)
    return base.select("event_id", "user_id",
                       F.round(med, 6).alias("roll_median"))


@register("window_sliding_distinct_hll", oracle="""
WITH m AS (
    SELECT DISTINCT user_id, date_trunc('hour', ts) AS h FROM events
), b AS (
    SELECT DISTINCT h FROM m
), x AS (
    SELECT m.user_id, b.h AS w
    FROM m JOIN b ON m.h <= b.h AND m.h >= b.h - INTERVAL 23 HOUR
)
SELECT w AS bucket_ts, count(DISTINCT user_id) AS users_24h_exact,
       TRUE AS est_within_10pct
FROM x GROUP BY 1
""")
def window_sliding_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """window_sliding_distinct's documented wide-span swap, now code
    instead of a docstring promise: trailing-24h APPROXIMATE distinct
    users per hour via mergeable HLL sketches (Datasketches
    hll_sketch_agg / hll_union_agg). The exact form explodes the
    deduped (user, hour) MEMBERSHIP table 24x; this form sketches
    each hour ONCE (one ~KB binary per bucket, built map-side from
    raw events) and explodes only the calendar-bounded per-hour
    sketch table -- at 100 TB the slide cost becomes
    |hours| x span x sketch_bytes, independent of user cardinality,
    which is the whole point of the swap.

    Oracle-backed via the contract pattern (see agg_approx): no
    portable SQL exists for an HLL union, so the hash-checked output
    is the EXACT per-window distinct (the oracle recomputes it as a
    range join) plus a TRUE-pinned boolean gating the sketch estimate
    within 5% of it (default lgConfigK=12 -> ~1.6% standard error) on
    every observed window -- the same bound the local semantic test
    asserts, now re-verified by the driver every sampled round. The
    exact twin rides the SAME deduped membership table the sketch
    explode uses, so the comparison adds one aggregate, not a second
    scan."""
    pin_session_conf(spark)
    ev = load(spark, sf_dir, "events")
    m = (ev.select("user_id", F.date_trunc("hour", F.col("ts")).alias("h"))
         .distinct())
    hourly = m.groupBy("h").agg(F.hll_sketch_agg("user_id").alias("sk"))
    span = F.explode(F.expr(
        "sequence(h, h + INTERVAL 23 HOURS, INTERVAL 1 HOUR)")).alias("w")
    wins = hourly.select("sk", span)
    exact_wins = m.select("user_id", span)
    obs = hourly.select(F.col("h").alias("w"))
    est = (wins.join(obs, "w", "left_semi")
           .groupBy(F.col("w").alias("bucket_ts"))
           .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                .alias("users_24h_est")))
    exact = (exact_wins.join(obs, "w", "left_semi")
             .groupBy(F.col("w").alias("bucket_ts"))
             .agg(F.countDistinct("user_id").alias("users_24h_exact")))
    return (est.join(exact, "bucket_ts")
            .select("bucket_ts", "users_24h_exact",
                    (F.abs(F.col("users_24h_est")
                           - F.col("users_24h_exact"))
                     <= F.greatest(F.lit(1),
                                   0.10 * F.col("users_24h_exact")))
                    .alias("est_within_10pct")))


SEQ_MAX_STEP_US = 86_400_000_000  # max gap per step (24h) in the 3-step match


@register("ts_sequence_pattern", oracle=f"""
WITH ev AS (
    SELECT user_id, event_type, epoch_us(ts) AS tu, event_id
    FROM events
    WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL
),
ann AS (
    SELECT user_id, event_type, tu, event_id,
           last_value(CASE WHEN event_type = 'view' THEN tu END
                      IGNORE NULLS) OVER w AS last_view_tu
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY tu ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
ann2 AS (
    SELECT user_id, event_type, tu,
           last_value(CASE WHEN event_type = 'click'
                           THEN [tu, last_view_tu] END
                      IGNORE NULLS) OVER w AS cv
    FROM ann
    WINDOW w AS (PARTITION BY user_id ORDER BY tu ASC,
                 CASE WHEN event_type = 'click' THEN 1 ELSE 0 END ASC,
                 event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
m AS (
    SELECT user_id, tu AS purchase_tu, cv[1] AS click_tu, cv[2] AS view_tu
    FROM ann2
    WHERE event_type = 'purchase' AND cv IS NOT NULL
          AND cv[2] IS NOT NULL
          AND tu - cv[1] <= {SEQ_MAX_STEP_US}
          AND cv[1] - cv[2] <= {SEQ_MAX_STEP_US}
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_matches,
       CAST(min(purchase_tu - view_tu) AS BIGINT) AS fastest_span_us,
       CAST(max(purchase_tu - view_tu) AS BIGINT) AS slowest_span_us
FROM m GROUP BY 1
""")
def ts_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step sequential pattern (view -> ... -> click -> ... ->
    purchase, each step within 24h) per user -- the MATCH_RECOGNIZE
    'skip-till-last' shape that funnel_events (eventually-after stage
    counts) and pattern_adjacent_conversion (strict adjacency) bracket
    but neither expresses: the matched CLICK is the latest click
    before the purchase, and the matched VIEW is the latest view
    before THAT click, so each purchase yields at most one match and
    the spans are the tightest possible.

    Implementation is two chained running last_value(... IGNORE
    NULLS) frames over the same per-user ordering: pass 1 annotates
    every row with the latest preceding view time; pass 2 carries the
    latest preceding click AS A (click_tu, its view_tu) STRUCT, so
    the purchase row reads both step times from one running value --
    pattern length k is k-1 chained running frames, one Exchange on
    user_id total, O(1) state per row (no self-joins, no explosion).
    All times are integer microseconds; both passes order by explicit
    NON-NULL tie keys ((tu, event_id) and (tu, is_click, event_id)),
    so equal-timestamp rows sequence identically on both engines and
    an equal-timestamp click is deliberately not matchable
    (strictly-before semantics)."""
    pin_session_conf(spark)
    ev = (load(spark, sf_dir, "events")
          .where(F.col("user_id").isNotNull()
                 & F.col("event_type").isNotNull() & F.col("ts").isNotNull())
          .select("user_id", "event_type",
                  F.unix_micros(F.col("ts").cast("timestamp")).alias("tu"),
                  "event_id"))
    w1 = (W.partitionBy("user_id").orderBy(F.col("tu").asc(),
                                           F.col("event_id").asc())
          .rowsBetween(W.unboundedPreceding, -1))
    ann = ev.withColumn(
        "last_view_tu",
        F.last(F.when(F.col("event_type") == "view", F.col("tu")),
               ignorenulls=True).over(w1))
    # Explicit NON-NULL tie keys: (tu, is_click, event_id). A null
    # second key would order differently across engines (Spark ASC is
    # NULLS FIRST, DuckDB ASC is NULLS LAST), flipping whether a
    # purchase sees a click that shares its timestamp. is_click=1
    # sorts clicks AFTER other rows at the same tu on both engines:
    # equal-timestamp clicks are deliberately NOT matchable
    # (strictly-before semantics).
    w2 = (W.partitionBy("user_id")
          .orderBy(F.col("tu").asc(),
                   F.when(F.col("event_type") == "click", 1).otherwise(0)
                   .asc(),
                   F.col("event_id").asc())
          .rowsBetween(W.unboundedPreceding, -1))
    ann2 = ann.withColumn(
        "cv",
        F.last(F.when(F.col("event_type") == "click",
                      F.array(F.col("tu"), F.col("last_view_tu"))),
               ignorenulls=True).over(w2))
    m = (ann2.where((F.col("event_type") == "purchase")
                    & F.col("cv").isNotNull()
                    & F.col("cv")[1].isNotNull()
                    & ((F.col("tu") - F.col("cv")[0]) <= SEQ_MAX_STEP_US)
                    & ((F.col("cv")[0] - F.col("cv")[1])
                       <= SEQ_MAX_STEP_US))
         .select("user_id", F.col("tu").alias("purchase_tu"),
                 F.col("cv")[0].alias("click_tu"),
                 F.col("cv")[1].alias("view_tu")))
    return (m.groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_matches"),
                 F.min(F.col("purchase_tu") - F.col("view_tu"))
                 .cast("long").alias("fastest_span_us"),
                 F.max(F.col("purchase_tu") - F.col("view_tu"))
                 .cast("long").alias("slowest_span_us")))
