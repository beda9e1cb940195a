"""Time-series operators over `events` (SURVEY.md §2.11 extensions).

The hypertable shapes every metrics/IoT pipeline needs on top of the
relational core: bucketed gap-filling with carry-forward + linear
interpolation, and trailing exponentially-weighted averages. The
reference has no time-series surface (its only temporal column is the
ratings timestamp it drops, MovieLensRecommender.py:118); these follow
the TimescaleDB/InfluxDB query shapes re-expressed as Catalyst plans.

Scale notes (100 TB):
- Gap-filling generates each key's spine with `sequence()` INSIDE the
  key's row -- the fill never becomes a cross join against a global
  calendar table; the only shuffle is the per-key groupBy/window, both
  on the same key so one Exchange serves all stages.
- The EWMA uses a bounded ROWS frame (the last `EWMA_WINDOW` points),
  so state per key is O(window), not O(history) -- the same bound a
  streaming re-statement would need, and what keeps a year-long key
  from funneling its whole history through one frame evaluation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from recommendation_system_spark_ml_spark.registry import register
from recommendation_system_spark_ml_spark.session import pin_session_conf
from recommendation_system_spark_ml_spark.sources.catalog import load

EWMA_ALPHA = 0.3
EWMA_WINDOW = 50  # trailing points per EWMA evaluation (bounds state)


@register("ts_gapfill", bench=True, oracle="""
WITH obs AS (
    SELECT user_id, date_trunc('hour', ts) AS h,
           round(avg(value), 8) AS v
    FROM events GROUP BY 1, 2
), span AS (
    SELECT user_id, min(h) AS h0, max(h) AS h1 FROM obs GROUP BY 1
), spine AS (
    SELECT user_id,
           unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
    FROM span
), j AS (
    SELECT s.user_id, s.h, o.v
    FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.h = o.h
), f AS (
    SELECT user_id, h, v,
           last_value(v IGNORE NULLS) OVER w_prev AS locf_v,
           last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
               OVER w_prev AS prev_h,
           first_value(v IGNORE NULLS) OVER w_next AS next_v,
           first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
               OVER w_next AS next_h
    FROM j
    WINDOW w_prev AS (PARTITION BY user_id ORDER BY h
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w_next AS (PARTITION BY user_id ORDER BY h
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, h AS bucket_ts, (v IS NULL) AS is_gap,
       floor(locf_v * 10000 + 0.5) / 10000 AS locf,
       floor((CASE WHEN v IS NOT NULL THEN v
                   WHEN next_v IS NOT NULL AND locf_v IS NOT NULL THEN
                        locf_v + (next_v - locf_v)
                               * ((epoch(h) - epoch(prev_h))
                                  / (epoch(next_h) - epoch(prev_h)))
                   ELSE locf_v END) * 10000 + 0.5) / 10000 AS lerp
FROM f
""")
def ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-fill per user: bucket events to hours, emit one row
    per hour of each user's observed span, and fill the gaps two ways
    -- LOCF (last observation carried forward) and linear interpolation
    between the neighboring observations (time-weighted, so a gap of 3
    hours slopes through 3 intermediate values).

    The spine is generated per key with sequence(min_h, max_h) inside
    the key's aggregated row -- no global calendar cross join, and the
    spine length is each key's own span, not the table's. All fills are
    window expressions over the same (user_id, h) ordering, so Catalyst
    runs groupBy + explode + both window frames off ONE hash exchange
    on user_id."""
    pin_session_conf(spark)
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("hour", "ts").alias("h"), "value")
    # Pre-round the bucket average to 8 decimals: interpolated values
    # frequently land EXACTLY on a .00005 rounding boundary (midpoints
    # of 2-decimal inputs), where a last-ulp cross-engine difference in
    # avg() would flip round(.., 4). Identical 8-decimal inputs feed an
    # identical IEEE expression tree on both sides, so the boundary
    # cases agree.
    obs = ev.groupBy("user_id", "h").agg(F.round(F.avg("value"), 8).alias("v"))
    spine = (obs.groupBy("user_id")
             .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
             .select("user_id",
                     F.explode(F.sequence(
                         "h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h")))
    j = spine.join(obs, ["user_id", "h"], "left")
    w_prev = (Window.partitionBy("user_id").orderBy("h")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # "next observation" as a RUNNING frame over DESCENDING hour order,
    # not a (currentRow, unboundedFollowing) frame: Spark evaluates
    # shrinking frames by re-aggregating the remainder per row -- O(n^2)
    # per key (measured 17 s at sf0.1); the reversed running frame is
    # incremental O(n) (measured ~1 s). Same values by symmetry.
    w_next = (Window.partitionBy("user_id").orderBy(F.col("h").desc())
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    obs_h = F.when(F.col("v").isNotNull(), F.col("h"))
    locf_v = F.last("v", ignorenulls=True).over(w_prev)
    prev_h = F.last(obs_h, ignorenulls=True).over(w_prev)
    next_v = F.last("v", ignorenulls=True).over(w_next)
    next_h = F.last(obs_h, ignorenulls=True).over(w_next)
    frac = ((F.unix_timestamp(F.col("h")) - F.unix_timestamp(prev_h))
            / (F.unix_timestamp(next_h) - F.unix_timestamp(prev_h)))
    lerp = (F.when(F.col("v").isNotNull(), F.col("v"))
            .when(next_v.isNotNull() & locf_v.isNotNull(),
                  locf_v + (next_v - locf_v) * frac)
            .otherwise(locf_v))
    # floor(x*1e4 + 0.5)/1e4 instead of round(): interpolated values
    # structurally land on EXACT .00005 ties (midpoints of 2-decimal
    # inputs), where Spark's round (HALF_UP on the shortest decimal
    # repr) and DuckDB's (on the raw binary double) disagree. The
    # floor form is the same IEEE ops on both engines -> identical.
    def r4(c):
        return F.floor(c * 10000 + F.lit(0.5)) / 10000.0

    return j.select(
        "user_id", F.col("h").alias("bucket_ts"),
        F.col("v").isNull().alias("is_gap"),
        r4(locf_v).alias("locf"),
        r4(lerp).alias("lerp"))


@register("ts_ewma", oracle=f"""
WITH o AS (
    SELECT user_id, event_id, ts, value,
           list(value) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
                             ROWS BETWEEN {EWMA_WINDOW - 1} PRECEDING
                             AND CURRENT ROW) AS arr
    FROM events
    WHERE value IS NOT NULL
)
SELECT user_id, event_id, ts,
       round(list_sum(list_transform(
                 arr, (x, i) -> x * pow({1 - EWMA_ALPHA}, len(arr) - i)))
             / ((1 - pow({1 - EWMA_ALPHA}, len(arr))) / {EWMA_ALPHA}),
             4) AS ewma
FROM o
""")
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing exponentially-weighted moving average per user
    (alpha={alpha}, last {win} points, adjust-style normalization:
    ewma_i = sum(w_j * x_j) / sum(w_j) with w_j = (1-alpha)^(i-j)).

    EWMA's recurrence looks inherently sequential; bounding it to a
    trailing ROWS frame makes it a pure window expression: collect the
    frame (<= {win} values, frame-ordered), weight by position with
    zip_with over a sequence, and normalize with the closed-form
    geometric sum. No UDF, no per-key Python, state bounded at {win}
    doubles per evaluation regardless of key history length -- the
    exact truncation a streaming EWMA over a state store would make.

    NULL values are filtered IDENTICALLY on both sides before the
    window: Spark's collect_list silently drops NULLs from the frame
    while DuckDB's list() keeps them, so without the shared filter the
    arrays (and the len(arr)-derived weights) would diverge the moment
    events.value ever contains a NULL."""
    pin_session_conf(spark)
    q = 1.0 - EWMA_ALPHA
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-(EWMA_WINDOW - 1), Window.currentRow))
    arr = F.collect_list("value").over(w)
    ev = (load(spark, sf_dir, "events")
          .select("user_id", "event_id", "ts", "value")
          .where(F.col("value").isNotNull())
          .withColumn("arr", arr))
    n = F.size("arr")
    weighted = F.zip_with(
        "arr", F.sequence(F.lit(1), n),
        lambda x, j: x * F.pow(F.lit(q), (n - j).cast("double")))
    num = F.aggregate(weighted, F.lit(0.0), lambda acc, z: acc + z)
    den = (1.0 - F.pow(F.lit(q), n.cast("double"))) / EWMA_ALPHA
    return ev.select("user_id", "event_id", "ts",
                     F.round(num / den, 4).alias("ewma"))


ts_ewma.__doc__ = ts_ewma.__doc__.format(alpha=EWMA_ALPHA, win=EWMA_WINDOW)


MAD_K = 1.4826   # normal-consistency constant
MAD_SIGMA = 3.0  # flag beyond 3 robust sigmas


@register("ts_anomaly_mad", oracle=f"""
WITH med AS (
    SELECT user_id,
           floor(median(value) * 100000000 + 0.5) / 100000000 AS med
    FROM events GROUP BY user_id
), mad AS (
    SELECT e.user_id, any_value(m.med) AS med,
           floor(median(abs(e.value - m.med)) * 100000000 + 0.5)
               / 100000000 AS mad
    FROM events e JOIN med m ON e.user_id = m.user_id
    GROUP BY e.user_id
)
SELECT user_id, event_id, value, robust_z
FROM (
    SELECT e.user_id, e.event_id, e.value, m.mad,
           floor((abs(e.value - m.med) / ({MAD_K} * m.mad)) * 10000 + 0.5)
               / 10000 AS robust_z
    FROM events e JOIN mad m ON e.user_id = m.user_id
)
WHERE mad > 0 AND robust_z > {MAD_SIGMA}
""")
def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-key anomaly detection: flag events whose value sits
    more than 3 robust sigmas from the key's median, with sigma
    estimated as 1.4826 * MAD (median absolute deviation) -- the
    outlier rule that, unlike mean/stddev z-scores, is not itself
    dragged by the outliers it hunts.

    Two exact-percentile aggregations per key (median, then MAD of
    residuals), joined back map-side cheap because every stage keys on
    user_id: Catalyst plans groupBy -> join -> groupBy -> join on ONE
    hash partitioning, so the per-key medians never cross the cluster
    twice. Exact `percentile` is the oracle-checkable choice here; a
    100 TB deployment with millions of rows per key swaps in
    approx_percentile (agg_approx_percentile is the certified twin of
    that trade). Rounding uses the shared floor-form (see ts_gapfill)
    since |value - med| hits exact decimal ties by construction.

    Cross-engine float discipline, two layers: (a) the medians are
    floor-quantized to 8 decimals on BOTH sides before feeding the z
    arithmetic -- Spark's percentile interpolates lo + 0.5*(hi - lo)
    while DuckDB's median computes (a + b)/2, which differ by 1 ulp on
    even-count groups; quantizing erases the ulp because true medians
    of 2-decimal data carry <= 3 decimals; (b) the > 3-sigma filter
    compares the floor-ROUNDED robust_z on both sides, so a boundary
    row can never be flipped in/out by residual expression-tree
    noise."""
    pin_session_conf(spark)

    def r8(c):
        return F.floor(c * 100000000 + F.lit(0.5)) / 100000000.0

    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "value")
    med = ev.groupBy("user_id").agg(
        r8(F.expr("percentile(value, 0.5)")).alias("med"))
    mad = (ev.join(med, "user_id")
           .groupBy("user_id")
           .agg(F.first("med").alias("med"),
                r8(F.expr("percentile(abs(value - med), 0.5)")).alias("mad")))
    z = F.abs(F.col("value") - F.col("med")) / (MAD_K * F.col("mad"))
    zq = F.floor(z * 10000 + F.lit(0.5)) / 10000.0
    return (ev.join(mad, "user_id")
            .where((F.col("mad") > 0) & (zq > MAD_SIGMA))
            .select("user_id", "event_id", "value", zq.alias("robust_z")))


@register("ts_resample_ohlc", oracle="""
WITH b AS (
    SELECT user_id, date_trunc('hour', ts) AS h, ts, event_id, value,
           first_value(value) OVER w AS open,
           last_value(value) OVER
               (PARTITION BY user_id, date_trunc('hour', ts)
                ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING) AS close
    FROM events
    WHERE ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id, date_trunc('hour', ts)
                 ORDER BY ts, event_id)
)
SELECT user_id, h AS bucket_ts,
       max(open) AS open,
       max(value) AS high,
       min(value) AS low,
       max(close) AS close,
       count(*) AS n_events,
       floor(sum(value) * 10000 + 0.5) / 10000 AS volume
FROM b GROUP BY 1, 2
""")
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC resampling per user -- the hypertable continuous-
    aggregate shape (TimescaleDB time_bucket + first/last/min/max,
    kdb+ bar rollup). open/close need a TOTAL event order inside the
    bucket: (ts, event_id) -- event_id is unique, bare ts is not
    (see the fuzz-ordering convention) -- expressed as identical
    first_value/last_value window frames on both engines (DuckDB's
    arg_min cannot take a composite key). high/low/open/close are
    pure selections of stored doubles, exact cross-engine; only the
    additive volume is floor-quantized.

    Plan: the window partitions by (user_id, hour) and the follow-up
    groupBy uses the same keys, so ONE Exchange + sort serves both
    stages (asserted in tests/test_plans.py). At 100 TB this is the
    map-reduce bar build: per-bucket state is O(1) per aggregate and
    the open/close selections ride the same sort the window already
    paid for; at stream time the same query runs as a watermarked
    tumbling window (stream_tumbling is the streaming twin)."""
    pin_session_conf(spark)
    # NULL-ts rows excluded on BOTH sides: an event with no timestamp
    # has no bar, and inside a NULL bucket the cross-engine NULL sort
    # order would flip open/close (hostile-probe-caught)
    ev = load(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    h = F.date_trunc("hour", F.col("ts"))
    w = (Window.partitionBy("user_id", "h").orderBy("ts", "event_id"))
    wfull = w.rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing)
    b = (ev.select("user_id", h.alias("h"), "ts", "event_id", "value")
         .withColumn("open", F.first("value").over(w))
         .withColumn("close", F.last("value").over(wfull)))
    return (b.groupBy("user_id", F.col("h").alias("bucket_ts"))
            .agg(F.max("open").alias("open"),
                 F.max("value").alias("high"),
                 F.min("value").alias("low"),
                 F.max("close").alias("close"),
                 F.count(F.lit(1)).alias("n_events"),
                 (F.floor(F.sum("value") * 10000 + F.lit(0.5)) / 10000)
                 .alias("volume")))


@register("ts_seasonal_baseline", oracle="""
WITH h AS (
    SELECT user_id,
           CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS hour_id,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
    FROM events GROUP BY 1, 2
)
SELECT a.user_id,
       CAST(count(*) AS BIGINT) AS n_scored,
       CAST(sum(abs(a.cents - p.cents)) AS BIGINT) AS sum_abs_err_cents,
       floor(CAST(sum(abs(a.cents - p.cents)) AS DOUBLE) / count(*) / 100
             * 10000 + 0.5) / 10000 AS mae
FROM h a JOIN h p ON p.user_id = a.user_id AND p.hour_id = a.hour_id - 24
GROUP BY a.user_id
""")
def ts_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast scoring -- the baseline every real
    forecasting pipeline must beat (M-competition convention): predict
    each user-hour's value total by the SAME HOUR ONE DAY EARLIER,
    score MAE per user over the hours where both exist. The
    lag-by-TIME (not lag-by-row) is an equi-join on
    (user, hour_id - 24), immune to gaps in the hourly series where a
    24-row window lag would silently compare the wrong hours.

    Shape: one hourly pre-aggregate (map-side combinable, integer
    cents), then a self-equi-join on (user_id, hour_id) -- both sides
    from the SAME aggregate, so AQE reuses the exchange -- and a
    per-user error rollup. Exact integers until the single final MAE
    division, floor-quantized identically both engines."""
    pin_session_conf(spark)
    ev = load(spark, sf_dir, "events")
    hour_id = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / 3600000000.0
    ).cast("long")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    h = (ev.groupBy("user_id", hour_id.alias("hour_id"))
         .agg(F.sum(cents).alias("cents")))
    a = h.select("user_id", "hour_id", F.col("cents").alias("ac"))
    p = h.select("user_id", (F.col("hour_id") + 24).alias("hour_id"),
                 F.col("cents").alias("pc"))
    err = F.abs(F.col("ac") - F.col("pc"))
    return (a.join(p, ["user_id", "hour_id"])
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_scored"),
                 F.sum(err).cast("long").alias("sum_abs_err_cents"),
                 (F.floor(F.sum(err).cast("double") / F.count(F.lit(1))
                          / 100 * 10000 + F.lit(0.5)) / 10000)
                 .alias("mae")))


@register("ts_decompose", oracle="""
WITH hourly AS (
    SELECT h, v FROM (
        SELECT date_trunc('hour', ts) AS h, avg(value) AS v
        FROM events GROUP BY 1
    ) WHERE v IS NOT NULL
), t AS (
    SELECT h, v,
           CASE WHEN count(*) OVER w = 24 THEN avg(v) OVER w END AS tr
    FROM hourly
    WINDOW w AS (ORDER BY h RANGE BETWEEN INTERVAL 11 HOURS PRECEDING
                 AND INTERVAL 12 HOURS FOLLOWING)
), s AS (
    SELECT extract(hour FROM h) AS hod, avg(v - tr) AS s_raw
    FROM t WHERE tr IS NOT NULL GROUP BY 1
), sc AS (
    SELECT hod, s_raw - (SELECT avg(s_raw) FROM s) AS seas FROM s
)
SELECT t.h AS bucket_ts, round(t.v, 6) AS v, round(t.tr, 6) AS trend,
       round(sc.seas, 6) AS seasonal,
       round(t.v - t.tr - sc.seas, 6) AS resid
FROM t JOIN sc ON extract(hour FROM t.h) = sc.hod
""")
def ts_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the hourly series
    (value = trend + seasonal + residual, period 24): centered
    24-hour moving-average trend, hour-of-day seasonal indices
    re-centered to sum to zero, residual as the remainder -- the
    standard pre-step before ts_anomaly_mad-style detection on
    seasonal data and the batch twin of ts_seasonal_baseline.

    The trend frame is defined in HOUR-RANGE terms (11 preceding ..
    12 following hours, null unless all 24 slots are observed), so a
    missing bucket nulls the trend instead of silently sliding the
    frame over it -- and that definition is what makes the
    distributed form possible: instead of one global ordered window
    (single reducer), each hourly row EXPLODES to the <= 24 hour
    buckets whose frame it serves (the window_sliding_distinct
    membership recipe), and the trend is a plain partial-aggregated
    groupBy on the target hour. Post-agg, everything is bounded by
    the calendar: the seasonal table is 24 rows, its centering mean
    is one broadcast scalar. The heavy stage -- raw events into
    hourly buckets -- is an ordinary distributed agg, so data volume
    scales the map side only, never a reducer's frame. The hourly
    table feeds four plan branches (trend contributions, the t join,
    seasonal means, centering), so it is localCheckpoint'ed after
    the agg: one events scan total, and what the branches re-read is
    the calendar-bounded bucket table (720 rows/month, 8.8k/decade),
    never raw events (plan-asserted: no parquet scan survives in
    the returned plan)."""
    pin_session_conf(spark)
    ev = load(spark, sf_dir, "events")
    # all-NULL buckets are dropped by a filter shared verbatim with
    # the oracle: a bucket with no usable values is a MISSING bucket
    # (nulls the trend via the count-24 gate), not a NULL row
    hourly = (ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
              .agg(F.avg("value").alias("v"))
              .where(F.col("v").isNotNull())
              .localCheckpoint())
    # row at h serves targets t with h in [t-11h, t+12h] <=> t in
    # [h-12h, h+11h]
    contrib = hourly.select(
        "v", F.explode(F.expr(
            "sequence(h - INTERVAL 12 HOURS, h + INTERVAL 11 HOURS, "
            "INTERVAL 1 HOUR)")).alias("t"))
    trend = (contrib.groupBy("t")
             .agg(F.avg("v").alias("tr"), F.count(F.lit(1)).alias("n"))
             .select("t", F.when(F.col("n") == 24, F.col("tr"))
                     .alias("tr")))
    t = hourly.join(trend, hourly.h == trend.t, "inner").select("h", "v", "tr")
    s = (t.where(F.col("tr").isNotNull())
         .groupBy(F.hour("h").alias("hod"))
         .agg(F.avg(F.col("v") - F.col("tr")).alias("s_raw")))
    sbar = s.agg(F.avg("s_raw").alias("sbar"))
    sc = (s.crossJoin(F.broadcast(sbar))
          .select("hod", (F.col("s_raw") - F.col("sbar")).alias("seas")))
    return (t.join(F.broadcast(sc), F.hour(t.h) == sc.hod)
            .select(F.col("h").alias("bucket_ts"),
                    F.round("v", 6).alias("v"),
                    F.round("tr", 6).alias("trend"),
                    F.round("seas", 6).alias("seasonal"),
                    F.round(F.col("v") - F.col("tr") - F.col("seas"), 6)
                    .alias("resid")))


ACF_MAX_LAG = 24  # lags probed (one seasonal period of the hourly series)


@register("ts_autocorrelation", oracle=f"""
WITH hourly AS (
    SELECT h, v FROM (
        SELECT date_trunc('hour', ts) AS h, avg(value) AS v
        FROM events GROUP BY 1
    ) WHERE v IS NOT NULL
), lags AS (
    SELECT unnest(range(1, {ACF_MAX_LAG + 1})) AS lag_hours
)
SELECT l.lag_hours,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(corr(a.v, b.v), 6) AS acf
FROM lags l
JOIN hourly a ON TRUE
JOIN hourly b ON b.h = a.h - to_hours(l.lag_hours)
GROUP BY 1
""")
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the hourly mean series at lags
    1..{ACF_MAX_LAG}: Pearson correlation between the series and its
    lag-shifted self, one row per lag -- the diagnostic that picks
    ts_decompose's period and tells ts_seasonal_baseline whether a
    seasonal naive is even plausible (a daily cycle shows as an acf
    spike at lag 24).

    Shape: the only data-volume stage is the hourly groupBy (raw
    events -> calendar-bounded buckets, 720 rows/month, partial-
    aggregated); everything after is bounded by calendar x lags --
    the {ACF_MAX_LAG}-row lag table broadcasts, the lag-join is a
    self-equi-join of the bucket table on timestamp arithmetic, and
    per-lag corr() is a 6-scalar partial aggregate. No window, no
    global sort, no driver data. Each lag uses its own pairwise-
    complete sample (the standard ACF-of-the-overlap estimator),
    so n_pairs documents the sample the correlation was taken on.

    Degenerate-sample discipline (fuzz-caught): under ANSI mode
    (Spark 4's default) the built-in corr THROWS DIVIDE_BY_ZERO on a
    zero-variance side or a single-pair sample, where DuckDB's corr
    quietly returns NULL -- so the correlation is computed as the
    two-pass centered form (per-lag means broadcast back, then
    guarded sxy / sqrt(sxx * syy) only when both variances are
    positive), which is NULL on exactly DuckDB's NULL cases and
    numerically agrees with the single-pass co-moments to ~1 ulp
    (round(6) absorbs it). All-NULL hourly buckets are dropped from
    the series by a filter shared verbatim with the oracle, so
    pairwise deletion can't skew the centered means."""
    pin_session_conf(spark)
    ev = load(spark, sf_dir, "events")
    hourly = (ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
              .agg(F.avg("value").alias("v"))
              .where(F.col("v").isNotNull())
              .localCheckpoint())
    lags = spark.range(1, ACF_MAX_LAG + 1).select(
        F.col("id").alias("lag_hours"))
    a = hourly.select(F.col("h").alias("ah"), F.col("v").alias("av"))
    b = hourly.select(F.col("h").alias("bh"), F.col("v").alias("bv"))
    pairs = (a.crossJoin(F.broadcast(lags))
             .join(b, F.col("bh") == F.expr(
                 "ah - make_interval(0, 0, 0, 0, lag_hours, 0, 0)")))
    means = (pairs.groupBy("lag_hours")
             .agg(F.avg("av").alias("ma"), F.avg("bv").alias("mb")))
    da, db = F.col("av") - F.col("ma"), F.col("bv") - F.col("mb")
    sums = (pairs.join(F.broadcast(means), "lag_hours")
            .groupBy("lag_hours")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
                 F.sum(da * db).alias("sxy"),
                 F.sum(da * da).alias("sxx"),
                 F.sum(db * db).alias("syy")))
    acf = F.when((F.col("sxx") > 0) & (F.col("syy") > 0),
                 F.col("sxy") / F.sqrt(F.col("sxx") * F.col("syy")))
    return sums.select("lag_hours", "n_pairs",
                       F.round(acf, 6).alias("acf"))


@register("ts_changepoint", oracle="""
WITH hourly AS (
    SELECT h, tot FROM (
        SELECT date_trunc('hour', ts) AS h,
               sum(CAST(round(value * 100, 0) AS BIGINT)) AS tot
        FROM events WHERE ts IS NOT NULL GROUP BY 1
    ) WHERE tot IS NOT NULL
), c AS (
    SELECT h, tot,
           sum(tot) OVER (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum_tot,
           row_number() OVER (ORDER BY h) AS i
    FROM hourly
), t AS (
    SELECT count(*) AS n, sum(tot) AS s FROM hourly
)
SELECT c.h AS bucket_ts,
       round(CAST(t.n * c.cum_tot - c.i * t.s AS DOUBLE)
             / t.n / 100, 6) AS cusum,
       CAST(abs(t.n * c.cum_tot - c.i * t.s) =
            (SELECT max(abs(t2.n * c2.cum_tot - c2.i * t2.s))
             FROM c c2 CROSS JOIN t t2) AS INTEGER) AS is_peak
FROM c CROSS JOIN t
""")
def ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan over the hourly value totals: the
    cumulative sum of deviations from the series mean, whose extreme
    |CUSUM| marks the most likely level-shift hour (Page 1954's
    detector in its retrospective form) -- the drift alarm next to
    agg_ks_drift (distributional) and ts_anomaly_mad (pointwise).

    Exactness: hourly totals ride integer cents, and the mean is
    never divided early -- CUSUM_i = cumsum(tot) - i*mean scaled by
    n gives S_i = n*cumsum - i*sum, ALL integer, so both engines
    agree bit-for-bit before the single final division. The global
    cumulative sum and the row index are two_level_running_sum calls
    over hour-range buckets (no single-reducer sort, the agg_ks_drift
    ECDF recipe); everything after the hourly agg is calendar-bounded
    and the (n, sum, peak) scalars broadcast."""
    pin_session_conf(spark)
    from recommendation_system_spark_ml_spark.operators.scale import (
        two_level_running_sum)
    ev = load(spark, sf_dir, "events")
    # drop all-NULL buckets (filter shared verbatim with the oracle):
    # a NULL bucket total would null the two-level WITHIN-BUCKET
    # prefix while the oracle's single global window just carries the
    # previous cumsum past it (fuzz-caught NULL-vs-value divergence).
    # NULL-ts rows likewise excluded both sides: a NULL hour has no
    # place on the CUSUM time axis, and the two-level day-bucket join
    # would silently drop it while the oracle kept a NULL group
    # (hostile-probe-caught row-count skew)
    hourly = (ev.where(F.col("ts").isNotNull())
              .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
              .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long"))
                   .alias("tot"))
              .where(F.col("tot").isNotNull())
              .localCheckpoint())
    bucket = F.floor(F.unix_micros(F.col("h").cast("timestamp"))
                     / 86_400_000_000).cast("long")  # day buckets
    cum = two_level_running_sum(hourly, bucket, [F.col("h").asc()],
                                F.col("tot"), out="cum_tot")
    cum = two_level_running_sum(cum, bucket, [F.col("h").asc()],
                                F.lit(1), out="i")
    t = hourly.agg(F.count(F.lit(1)).alias("n"), F.sum("tot").alias("s"))
    scored = (cum.crossJoin(F.broadcast(t))
              .select("h", (F.col("n") * F.col("cum_tot")
                            - F.col("i") * F.col("s")).alias("S"),
                      "n"))
    peak = scored.agg(F.max(F.abs(F.col("S"))).alias("peak"))
    return (scored.crossJoin(F.broadcast(peak))
            .select(F.col("h").alias("bucket_ts"),
                    F.round(F.col("S").cast("double") / F.col("n") / 100, 6)
                    .alias("cusum"),
                    (F.abs(F.col("S")) == F.col("peak")).cast("int")
                    .alias("is_peak")))


XCORR_MAX_LAG = 12  # hours of lead/lag probed in each direction


@register("ts_cross_correlation", oracle=f"""
WITH ha AS (
    SELECT h, v FROM (
        SELECT date_trunc('hour', ts) AS h, avg(value) AS v
        FROM events WHERE event_type = 'click' GROUP BY 1
    ) WHERE v IS NOT NULL
), hb AS (
    SELECT h, v FROM (
        SELECT date_trunc('hour', ts) AS h, avg(value) AS v
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ) WHERE v IS NOT NULL
), lags AS (
    SELECT unnest(range(-{XCORR_MAX_LAG}, {XCORR_MAX_LAG + 1})) AS lag_hours
), pairs AS (
    SELECT l.lag_hours, a.v AS av, b.v AS bv
    FROM lags l
    JOIN ha a ON TRUE
    JOIN hb b ON b.h = a.h + to_hours(l.lag_hours)
), m AS (
    SELECT lag_hours, count(*) AS n, avg(av) AS ma, avg(bv) AS mb
    FROM pairs GROUP BY 1
)
SELECT p.lag_hours, CAST(m.n AS BIGINT) AS n_pairs,
       round(CASE WHEN sum((p.av - m.ma) * (p.av - m.ma)) > 0
                  AND sum((p.bv - m.mb) * (p.bv - m.mb)) > 0
             THEN sum((p.av - m.ma) * (p.bv - m.mb))
                  / sqrt(sum((p.av - m.ma) * (p.av - m.ma))
                         * sum((p.bv - m.mb) * (p.bv - m.mb))) END, 6)
           AS xcorr
FROM pairs p JOIN m ON p.lag_hours = m.lag_hours
GROUP BY 1, m.n
""")
def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation between the hourly click and purchase value
    series at lags -{XCORR_MAX_LAG}..+{XCORR_MAX_LAG}: a peak at
    positive lag k means clicks LEAD purchases by k hours -- the
    lead/lag diagnostic behind attribution windows and feature-lag
    selection, completing the correlation family next to
    ts_autocorrelation (self) and agg_corr_matrix (cross-column,
    same row).

    Shape and float discipline are ts_autocorrelation's verbatim:
    two per-type hourly aggs (calendar-bounded, checkpointed,
    all-NULL buckets dropped by a filter shared with the oracle), a
    25-row broadcast lag table, the lag-join on timestamp
    arithmetic, and the two-pass centered correlation with guarded
    division (ANSI corr throws where DuckDB NULLs; the centered form
    is NULL on exactly DuckDB's NULL cases)."""
    pin_session_conf(spark)
    ev = load(spark, sf_dir, "events")

    def hourly(etype):
        return (ev.where(F.col("event_type") == etype)
                .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
                .agg(F.avg("value").alias("v"))
                .where(F.col("v").isNotNull())
                .localCheckpoint())

    a = hourly("click").select(F.col("h").alias("ah"),
                               F.col("v").alias("av"))
    b = hourly("purchase").select(F.col("h").alias("bh"),
                                  F.col("v").alias("bv"))
    lags = spark.range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1).select(
        F.col("id").alias("lag_hours"))
    pairs = (a.crossJoin(F.broadcast(lags))
             .join(b, F.col("bh") == F.expr(
                 "ah + make_interval(0, 0, 0, 0, lag_hours, 0, 0)")))
    means = (pairs.groupBy("lag_hours")
             .agg(F.avg("av").alias("ma"), F.avg("bv").alias("mb")))
    da, db = F.col("av") - F.col("ma"), F.col("bv") - F.col("mb")
    sums = (pairs.join(F.broadcast(means), "lag_hours")
            .groupBy("lag_hours")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
                 F.sum(da * db).alias("sxy"),
                 F.sum(da * da).alias("sxx"),
                 F.sum(db * db).alias("syy")))
    xcorr = F.when((F.col("sxx") > 0) & (F.col("syy") > 0),
                   F.col("sxy") / F.sqrt(F.col("sxx") * F.col("syy")))
    return sums.select("lag_hours", "n_pairs",
                       F.round(xcorr, 6).alias("xcorr"))


@register("ts_calendar_profile", oracle="""
WITH us AS (
    SELECT epoch_us(ts) AS u, user_id FROM events WHERE ts IS NOT NULL
), fd AS (
    -- exact integer FLOOR division (// truncates toward zero on
    -- integers in DuckDB, as Spark's div does): subtract the
    -- positive remainder first so the numerator divides exactly
    SELECT (u - ((u % 86400000000 + 86400000000) % 86400000000))
               // 86400000000 AS eday,
           (u - ((u % 3600000000 + 3600000000) % 3600000000))
               // 3600000000 AS ehour,
           user_id
    FROM us
), cells AS (
    SELECT CAST(((eday + 4) % 7 + 7) % 7 AS INTEGER) AS dow,
           CAST((ehour % 24 + 24) % 24 AS INTEGER) AS hour,
           user_id
    FROM fd
), agg AS (
    SELECT dow, hour,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM cells GROUP BY 1, 2
)
SELECT dow, hour, n_events, n_users,
       CAST(row_number() OVER (PARTITION BY dow
                               ORDER BY n_events DESC, hour ASC) = 1
            AS INTEGER) AS is_dow_peak
FROM agg
""")
def ts_calendar_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour-of-day activity profile with per-day peak
    hours -- the seasonality read behind capacity planning and behind
    picking ts_decompose's period (a flat profile says don't bother;
    a strong daily ridge says period 24). The calendar cell derives
    from INTEGER microsecond arithmetic (epoch day 0 = Thursday, so
    dow = pmod(epoch_day + 4, 7) with Sunday = 0) -- timezone-free and
    bit-identical cross-engine, never via engine-specific dayofweek()
    (Spark counts Sunday = 1, DuckDB Sunday = 0). NULL timestamps are
    unplaceable and excluded on both sides. Pre-1970 timestamps (r6
    ADVICE): both engines' `%`/`div` follow the dividend's sign, so a
    negative epoch used to leak a negative dow out of the documented
    0..6 domain AND misplace the day (truncating div rounds the day
    number up for negatives). Epoch day/hour are therefore exact
    integer FLOOR divisions -- (u - pmod(u, D)) div D, the numerator
    exactly divisible so truncation == floor -- and the cell indices
    pmod results, keeping dow in 0..6 / hour in 0..23 for ALL epochs.

    Shape: one scan, one groupBy over a keyspace bounded at 168 cells
    at any data size (the distinct-user count partial-aggregates per
    cell), and the peak window ranks 24 finished cells per day --
    post-agg, never document rows. All-integer output: no float
    surface at all."""
    pin_session_conf(spark)
    # `div` = integer division on longs: a double `/` + cast truncation
    # can land one off at exact multiples (ulp below k), DuckDB's `//`
    # cannot. Subtracting pmod first turns truncating div into exact
    # floor div, so pre-1970 epochs land on the right calendar day.
    us = "unix_micros(CAST(ts AS TIMESTAMP))"
    day = F.expr(f"({us} - pmod({us}, 86400000000)) div 86400000000")
    hr = F.expr(f"({us} - pmod({us}, 3600000000)) div 3600000000")
    cells = (load(spark, sf_dir, "events")
             .where(F.col("ts").isNotNull())
             .select(F.pmod(day + 4, F.lit(7)).cast("int").alias("dow"),
                     F.pmod(hr, F.lit(24)).cast("int").alias("hour"),
                     "user_id"))
    agg = (cells.groupBy("dow", "hour")
           .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                F.countDistinct("user_id").cast("long").alias("n_users")))
    w = Window.partitionBy("dow").orderBy(F.col("n_events").desc(),
                                          F.col("hour").asc())
    return agg.select("dow", "hour", "n_events", "n_users",
                      (F.row_number().over(w) == 1).cast("int")
                      .alias("is_dow_peak"))


BURST_TRAIL = 24   # trailing observed-hour baseline window (rows)
BURST_MIN_N = 12   # minimum baseline hours before z is defined
BURST_Z = 3.0      # z-score threshold
BURST_MIN_CNT = 5  # absolute count floor (suppresses tiny-count bursts)


@register("ts_burst_detect", oracle=f"""
WITH hourly AS (
    SELECT event_type,
           CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS hour_id,
           count(*) AS cnt
    FROM events WHERE ts IS NOT NULL
    GROUP BY 1, 2
),
stats AS (
    SELECT event_type, hour_id, cnt,
           avg(cnt) OVER w AS mu,
           stddev_samp(cnt) OVER w AS sd,
           count(cnt) OVER w AS n_base
    FROM hourly
    WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                 ROWS BETWEEN {BURST_TRAIL} PRECEDING AND 1 PRECEDING)
)
SELECT event_type, hour_id, CAST(cnt AS BIGINT) AS cnt,
       CASE WHEN n_base >= {BURST_MIN_N} AND sd > 0
            THEN round((cnt - mu) / sd, 4) ELSE NULL END AS z,
       CASE WHEN n_base >= {BURST_MIN_N} AND sd > 0
                 AND round((cnt - mu) / sd, 4) > {BURST_Z}
                 AND cnt >= {BURST_MIN_CNT}
            THEN TRUE ELSE FALSE END AS is_burst
FROM stats
""")
def ts_burst_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection over per-type hourly event counts: each hour is
    scored against the TRAILING {BURST_TRAIL} observed hours of its
    own event type (mean + sample stddev -- the classic rolling
    z-score monitor, the relational core of Kleinberg 2002's burst
    model); z > {BURST_Z} with at least {BURST_MIN_CNT} events flags a
    burst. The baseline needs {BURST_MIN_N}+ prior hours and positive
    variance, else z is NULL -- a cold-start hour can never
    false-alarm. Emits ALL hours with their z so the consumer sees
    near-misses, not just alarms. Baseline is over OBSERVED hours
    (documented: silent hours don't enter the window; compose with
    ts_gapfill for a calendar baseline).

    Shape: one groupBy(type, hour) collapses the stream, then a
    PARTITIONED trailing window (never a global sort -- each event
    type's timeline sorts independently, and the hour table is
    |types| x |hours|, tiny relative to raw events at any scale)."""
    pin_session_conf(spark)
    from pyspark.sql.window import Window
    hourly = (load(spark, sf_dir, "events")
              .where(F.col("ts").isNotNull())
              .groupBy("event_type",
                       F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                               / 3600000000.0).cast("long").alias("hour_id"))
              .agg(F.count(F.lit(1)).alias("cnt")))
    w = (Window.partitionBy("event_type").orderBy("hour_id")
         .rowsBetween(-BURST_TRAIL, -1))
    stats = hourly.select(
        "event_type", "hour_id", "cnt",
        F.avg("cnt").over(w).alias("mu"),
        F.stddev_samp("cnt").over(w).alias("sd"),
        F.count("cnt").over(w).alias("n_base"))
    ok = (F.col("n_base") >= BURST_MIN_N) & (F.col("sd") > 0)
    # The burst PREDICATE compares the QUANTIZED z, not the raw one:
    # sd is each engine's own stddev accumulation, so an hour whose
    # raw z lands within accumulation noise of the threshold would
    # flip the boolean (and the hash) cross-engine. Rounding once and
    # branching on the rounded value gives the boolean the same
    # protection the displayed column already had.
    zq = F.round((F.col("cnt") - F.col("mu")) / F.col("sd"), 4)
    return stats.select(
        "event_type", "hour_id", F.col("cnt").cast("long").alias("cnt"),
        F.when(ok, zq).otherwise(F.lit(None).cast("double")).alias("z"),
        F.when(ok & (zq > BURST_Z) & (F.col("cnt") >= BURST_MIN_CNT),
               F.lit(True)).otherwise(F.lit(False)).alias("is_burst"))


_MKV_Q = 1_000_000  # transition-probability quantization


@register("ts_markov_transitions", oracle=f"""
WITH ev AS (
    SELECT user_id AS u, event_type AS et, epoch_us(ts) AS tu, event_id
    FROM events
    WHERE user_id IS NOT NULL AND event_type IS NOT NULL
          AND ts IS NOT NULL
),
seq AS (
    SELECT u, et,
           lead(et) OVER (PARTITION BY u
                          ORDER BY tu ASC, event_id ASC) AS nxt
    FROM ev
),
trans AS (
    SELECT et AS from_type, nxt AS to_type, count(*) AS n
    FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT from_type, sum(n) AS row_n FROM trans GROUP BY 1)
SELECT t.from_type, t.to_type, CAST(t.n AS BIGINT) AS n,
       floor(t.n * 1.0 / x.row_n * {_MKV_Q} + 0.5) / {_MKV_Q} AS p
FROM trans t JOIN tot x ON t.from_type = x.from_type
""")
def ts_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current), the behavioral model
    behind next-action prediction, funnel simulation, and anomaly
    scoring of unusual paths -- the full-matrix generalization of
    pattern_adjacent_conversion's single A->B read. Transitions are
    within-user, ordered by (ts, event_id) so timestamp ties are
    cross-engine deterministic; each user's last event emits no
    transition.

    Shape: one lead() window PARTITIONED BY USER (each user's
    timeline sorts independently -- never a global sort, the
    sessionize recipe), one partial-combined groupBy to the bounded
    |types|^2 matrix, and a broadcast row-total join. Probabilities
    floor-quantize at 1e-6; counts are exact integers."""
    pin_session_conf(spark)
    from pyspark.sql.window import Window
    ev = (load(spark, sf_dir, "events")
          .where(F.col("user_id").isNotNull()
                 & F.col("event_type").isNotNull()
                 & F.col("ts").isNotNull())
          .select(F.col("user_id").alias("u"),
                  F.col("event_type").alias("et"),
                  F.unix_micros(F.col("ts").cast("timestamp")).alias("tu"),
                  "event_id"))
    w = Window.partitionBy("u").orderBy(F.col("tu").asc(),
                                        F.col("event_id").asc())
    seq = ev.withColumn("nxt", F.lead("et").over(w))
    trans = (seq.where(F.col("nxt").isNotNull())
             .groupBy(F.col("et").alias("from_type"),
                      F.col("nxt").alias("to_type"))
             .agg(F.count(F.lit(1)).alias("n")))
    tot = trans.groupBy("from_type").agg(F.sum("n").alias("row_n"))
    return (trans.join(F.broadcast(tot), "from_type")
            .select("from_type", "to_type",
                    F.col("n").cast("long").alias("n"),
                    (F.floor(F.col("n").cast("double") / F.col("row_n")
                             * _MKV_Q + F.lit(0.5)) / _MKV_Q).alias("p")))


M4_BUCKET_US = 21_600_000_000  # 6-hour M4 pixel buckets
_M4_Q = 1_000_000


@register("ts_downsample_m4", oracle=f"""
WITH ev AS (
    SELECT event_type,
           epoch_us(ts) AS tu, event_id, value
    FROM events
    WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
), k AS (
    SELECT event_type,
           CAST(floor(tu / {M4_BUCKET_US}.0) AS BIGINT) AS bucket,
           tu, value,
           lpad(CAST(tu AS VARCHAR), 20, '0')
               || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord
    FROM ev
)
SELECT event_type, bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(arg_min(tu, ord) AS BIGINT) AS t_first,
       round(arg_min(value, ord), 6) AS v_first,
       CAST(arg_max(tu, ord) AS BIGINT) AS t_last,
       round(arg_max(value, ord), 6) AS v_last,
       round(min(value), 6) AS v_min,
       round(max(value), 6) AS v_max
FROM k GROUP BY 1, 2
""")
def ts_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling (Jugel et al., VLDB 2014): per
    (series, time bucket) keep exactly the four points a pixel-perfect
    line rendering needs -- first, last, min, max -- so a dashboard
    over 100 TB of telemetry reads |series| x |pixels| rows instead of
    the raw stream, with ZERO visual error at the target resolution
    (unlike averaging/LTTB, M4 is lossless for min/max envelopes).

    Pure partial-combinable aggregation: one groupBy(series, bucket)
    with min/max/min_by/max_by -- map-side combine collapses each
    partition to 4 values per open bucket before the shuffle, the
    canonical mergeable-summary shape. First/last tie-break on the
    zero-padded (epoch_us, event_id) string key so both engines pick
    the same row when timestamps collide (arg_min/min_by over a
    string is byte-order identical cross-engine)."""
    pin_session_conf(spark)
    ev = (load(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("value").isNotNull()
                 & F.col("event_type").isNotNull())
          .select("event_type",
                  F.unix_micros(F.col("ts").cast("timestamp")).alias("tu"),
                  "event_id", "value"))
    ordk = F.concat(F.lpad(F.col("tu").cast("string"), 20, "0"),
                    F.lpad(F.col("event_id").cast("string"), 12, "0"))
    k = ev.select(
        "event_type",
        F.floor(F.col("tu") / F.lit(float(M4_BUCKET_US))).cast("long")
        .alias("bucket"),
        "tu", "value", ordk.alias("ord"))
    return (k.groupBy("event_type", "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.min_by("tu", "ord").cast("long").alias("t_first"),
                 F.round(F.min_by("value", "ord"), 6).alias("v_first"),
                 F.max_by("tu", "ord").cast("long").alias("t_last"),
                 F.round(F.max_by("value", "ord"), 6).alias("v_last"),
                 F.round(F.min("value"), 6).alias("v_min"),
                 F.round(F.max("value"), 6).alias("v_max")))


# ------------------------------------------------ Theil-Sen trend

_TS_Q = 1_000_000


@register("ts_theil_sen", oracle=f"""
WITH d AS (
    SELECT CAST(floor(epoch_us(o_orderdate) / 86400000000.0) AS BIGINT)
               AS day_id,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
               AS BIGINT) AS cents
    FROM orders
    WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
    GROUP BY 1
),
idx AS (
    SELECT day_id, cents,
           row_number() OVER (ORDER BY day_id) AS i,
           count(*) OVER () AS t
    FROM d
),
pairs AS (
    SELECT floor(CAST(b.cents - a.cents AS DOUBLE)
                 / (b.day_id - a.day_id) * {_TS_Q} + 0.5) / {_TS_Q}
               AS slope
    FROM idx a JOIN idx b ON b.i = a.i + greatest(a.t // 2, 1)
),
r AS (
    SELECT slope, row_number() OVER (ORDER BY slope) AS rk,
           count(*) OVER () AS n
    FROM pairs
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_days,
       CAST(n AS BIGINT) AS n_pairs,
       slope AS trend_cents_per_day
FROM r WHERE rk = (n + 1) // 2
""")
def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily revenue (Theil 1950 / Sen
    1968, split-pair variant): slope = MEDIAN of pairwise slopes,
    immune to ~29% outlier contamination where OLS breaks at one bad
    day -- the trend line a revenue dashboard should show when
    promotions/outages spike single days. The split pairing (day i
    with day i + T/2, disjoint pairs by actual DAY GAP, not row lag)
    is the O(T) estimator: the full Theil-Sen enumerates T^2/2
    slopes, which at a calendar-bounded T is affordable but
    pointless -- the split-pair median has the same breakdown point
    (Rousseeuw & Leroy 1987) at 1/T the pair count. This is the cap
    contract pattern: the pairing rule is part of the estimator's
    definition on BOTH engines.

    Determinism: daily sums are exact integer cents; each slope is
    one exact-integer division floor-quantized at 1e-6; the median
    is DISCRETE (the actual value at rank ceil(n/2), the
    agg_winsorized_mean recipe) -- no interpolation, no float
    accumulation anywhere. The global windows run over the
    calendar-bounded day table (~2,400 rows for this corpus's
    1992-2001 span at ANY sf -- bounded keyspace, never data-sized);
    the 100 TB cost is the one scan feeding the daily pre-aggregate,
    which is map-side combinable."""
    pin_session_conf(spark)
    day_id = F.floor(
        F.unix_micros(F.col("o_orderdate").cast("timestamp"))
        / 86400000000.0).cast("long")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    d = (load(spark, sf_dir, "orders")
         .where(F.col("o_orderdate").isNotNull()
                & F.col("o_totalprice").isNotNull())
         .groupBy(day_id.alias("day_id"))
         .agg(F.sum(cents).alias("cents")))
    t = d.agg(F.count(F.lit(1)).alias("t"))
    idx = (d.crossJoin(F.broadcast(t))
           .select("day_id", "cents", "t",
                   F.row_number().over(Window.orderBy("day_id"))
                   .alias("i")))
    a = idx.select(F.col("i").alias("ia"), F.col("day_id").alias("da"),
                   F.col("cents").alias("ca"), "t")
    b = idx.select(F.col("i").alias("ib"), F.col("day_id").alias("db"),
                   F.col("cents").alias("cb"))
    slope = (F.floor((F.col("cb") - F.col("ca")).cast("double")
                     / (F.col("db") - F.col("da")) * _TS_Q + F.lit(0.5))
             / _TS_Q)
    pairs = (a.join(b, F.col("ib") == F.col("ia")
                    + F.greatest(F.expr("t DIV 2"), F.lit(1)))
             .select(slope.alias("slope")))
    n = pairs.agg(F.count(F.lit(1)).alias("n"))
    r = (pairs.crossJoin(F.broadcast(n))
         .select("slope", "n",
                 F.row_number().over(Window.orderBy("slope")).alias("rk")))
    n_days = d.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return (r.where(F.col("rk") == F.expr("(n + 1) DIV 2"))
            .crossJoin(F.broadcast(n_days))
            .select("n_days", F.col("n").cast("long").alias("n_pairs"),
                    F.col("slope").alias("trend_cents_per_day")))


# ------------------------------------------------ SAX symbolization

SAX_SEGMENTS = 32  # PAA word length
# Gaussian equiprobable breakpoints for alphabet size 8 (Lin et al.
# 2003, Table 3) -- fixed literals so both engines bin identically.
SAX_BREAKS = (-1.1503, -0.6745, -0.3186, 0.0, 0.3186, 0.6745, 1.1503)


@register("ts_sax_symbolic", oracle=f"""
WITH d AS (
    SELECT CAST(floor(epoch_us(o_orderdate) / 86400000000.0) AS BIGINT)
               AS day_id,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
               AS BIGINT) AS cents
    FROM orders
    WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
    GROUP BY 1
),
idx AS (
    SELECT cents, row_number() OVER (ORDER BY day_id) - 1 AS i,
           count(*) OVER () AS t
    FROM d
),
mom AS (
    SELECT avg(CAST(cents AS DOUBLE)) AS mu,
           sqrt(avg(CAST(cents AS DOUBLE) * cents)
                - avg(CAST(cents AS DOUBLE)) * avg(CAST(cents AS DOUBLE)))
               AS sigma
    FROM idx
),
z AS (
    SELECT i, t,
           floor((cents - mu) / nullif(sigma, 0) * 1000000 + 0.5) / 1000000
               AS zv
    FROM idx, mom
),
paa AS (
    SELECT CAST(i * {SAX_SEGMENTS} // t AS INTEGER) AS segment,
           CAST(count(*) AS BIGINT) AS n_days,
           floor(avg(zv) * 1000000 + 0.5) / 1000000 AS paa_z
    FROM z GROUP BY 1
)
SELECT segment, n_days, paa_z,
       CAST({" + ".join(f"CASE WHEN paa_z > {b} THEN 1 ELSE 0 END"
                        for b in SAX_BREAKS)} AS INTEGER) AS symbol
FROM paa
""")
def ts_sax_symbolic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization of the daily-revenue series (Lin, Keogh et
    al. 2003): z-normalize, Piecewise Aggregate Approximation into
    {SAX_SEGMENTS} equal-width segments, then map each segment mean
    to an 8-letter alphabet at the fixed Gaussian equiprobable
    breakpoints -- the symbolic form that powers motif discovery,
    discord (anomaly) search, and index-able series similarity at a
    fraction of the raw footprint. One row per segment with the PAA
    value and integer symbol.

    Determinism discipline: integer-cents daily sums; one-pass
    moment z-scores (population sigma; E[x^2]-E[x]^2 on exact BIGINT
    inputs) floor-quantized at 1e-6 BEFORE segment averaging, and
    PAA means quantized again before binning, so both engines bin
    identical doubles against identical breakpoint literals;
    segmentation i*W DIV t is pure integer arithmetic. Windows run
    over the calendar-bounded day table (~2,400 rows at any sf); the
    100 TB cost is the scan into the map-side-combinable daily
    rollup."""
    pin_session_conf(spark)
    day_id = F.floor(
        F.unix_micros(F.col("o_orderdate").cast("timestamp"))
        / 86400000000.0).cast("long")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    d = (load(spark, sf_dir, "orders")
         .where(F.col("o_orderdate").isNotNull()
                & F.col("o_totalprice").isNotNull())
         .groupBy(day_id.alias("day_id"))
         .agg(F.sum(cents).alias("cents")))
    t = d.agg(F.count(F.lit(1)).alias("t"),
              F.avg(F.col("cents").cast("double")).alias("mu"),
              F.sqrt(F.avg(F.col("cents").cast("double") * F.col("cents"))
                     - F.avg(F.col("cents").cast("double"))
                     * F.avg(F.col("cents").cast("double"))).alias("sigma"))
    idx = (d.crossJoin(F.broadcast(t))
           .select("cents", "t", "mu", "sigma",
                   (F.row_number().over(Window.orderBy("day_id")) - 1)
                   .alias("i")))
    q6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000
    z = idx.select(
        "i", "t",
        q6((F.col("cents") - F.col("mu"))
           / F.nullif(F.col("sigma"), F.lit(0.0))).alias("zv"))
    paa = (z.groupBy(F.expr(f"CAST(i * {SAX_SEGMENTS} DIV t AS INT)")
                     .alias("segment"))
           .agg(F.count(F.lit(1)).cast("long").alias("n_days"),
                q6(F.avg("zv")).alias("paa_z")))
    # NULL-safe per breakpoint (r9 ADVICE): on a constant series
    # sigma=0 makes zv/paa_z NULL; (NULL > b).cast('int') is NULL in
    # Spark while the oracle's CASE ... ELSE 0 yields 0 -- mirror the
    # CASE ELSE 0 semantics so symbol = 0 on both engines.
    symbol = sum(F.when(F.col("paa_z") > b, 1).otherwise(0)
                 for b in SAX_BREAKS)
    return paa.select("segment", "n_days", "paa_z",
                      symbol.cast("int").alias("symbol"))
