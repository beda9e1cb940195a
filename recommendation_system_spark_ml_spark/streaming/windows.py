"""Structured-Streaming window operators (SURVEY.md §2.10).

The reference drops all temporal information (MovieLensRecommender.py:140);
the engine exposes the full streaming window family over `events`.

Design: each operator is a pure DataFrame->DataFrame transform applied
identically to a batch frame or a readStream frame -- Catalyst plans the
same expressions either way, so the DuckDB-oracle check on the batch
twin certifies the streaming semantics, and tests/test_streaming.py
additionally runs the real readStream->memory-sink path with watermarks.

Window starts are emitted as epoch seconds (BIGINT): deterministic
across engines, and the natural key for downstream joins at scale.

Scale notes: windowed aggregation shuffles on (window, key); state size
is bounded by the watermark; session windows use Spark's native
session_window (merging state store), whose batch-mode semantics the
lag/cumsum oracle reproduces exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recommendation_system_spark_ml_spark.registry import register
from recommendation_system_spark_ml_spark.session import pin_session_conf
from recommendation_system_spark_ml_spark.sources.catalog import load

# Parquet stores TIMESTAMP(NANOS). readStream requires a user schema,
# and what a bigint `ts` field yields depends on the runtime: builds
# honoring nanosAsLong hand back epoch-NANOS, newer readers that map
# TIMESTAMP(NANOS) natively hand back epoch-MICROS for a bigint field.
EVENTS_SCHEMA = ("event_id bigint, ts bigint, user_id bigint, "
                 "event_type string, value double, props string")

# Magnitude gate between the two: epoch-micros stays < 4e15 until year
# 2096, epoch-nanos passed 1e18 in 2001 -- unambiguous for any sane ts.
_NANOS_CUTOFF = 4_000_000_000_000_000


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (one-file-per-trigger so the
    memory-sink tests see deterministic batches)."""
    pin_session_conf(spark)
    raw = (spark.readStream.schema(EVENTS_SCHEMA)
           .option("maxFilesPerTrigger", 1)
           .option("pathGlobFilter", "events.parquet")
           .parquet(sf_dir))
    micros = F.when(F.abs(F.col("ts")) > F.lit(_NANOS_CUTOFF),
                    F.expr("ts DIV 1000")).otherwise(F.col("ts"))
    return raw.withColumn("ts", F.timestamp_micros(micros))


# --- transforms (mode-agnostic) -------------------------------------------

def tumbling_counts(events: DataFrame) -> DataFrame:
    w = F.window("ts", "10 minutes")
    return (events.groupBy(w.alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0, 2)
                 .alias("sum_value"))
            .select(F.unix_timestamp("w.start").alias("window_start"),
                    "event_type", "n_events", "sum_value"))


def sliding_counts(events: DataFrame) -> DataFrame:
    w = F.window("ts", "10 minutes", "5 minutes")
    return (events.groupBy(w.alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.unix_timestamp("w.start").alias("window_start"),
                    "event_type", "n_events"))


def session_aggregate(events: DataFrame) -> DataFrame:
    w = F.session_window("ts", "30 minutes")
    return (events.groupBy(w.alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0, 2)
                 .alias("sum_value"))
            .select("user_id",
                    F.unix_timestamp("w.start").alias("session_start"),
                    F.unix_timestamp("w.end").alias("session_end"),
                    "n_events", "sum_value"))


def windowed_dedup(events: DataFrame) -> DataFrame:
    """First event per (user, type) per tumbling window -- the batch
    shape of dropDuplicatesWithinWatermark-style dedup."""
    w = F.window("ts", "10 minutes")
    return (events.groupBy(w.alias("w"), "user_id", "event_type")
            .agg(F.min("event_id").alias("first_event_id"))
            .select(F.unix_timestamp("w.start").alias("window_start"),
                    "user_id", "event_type", "first_event_id"))


def ohlc_bars(events: DataFrame) -> DataFrame:
    """10-minute OHLC bars per user -- the streaming twin of
    ts_resample_ohlc. open/close are min_by/max_by under the TOTAL
    (ts, event_id) struct order: unlike first()/last() (arrival-order
    nondeterministic in a stream), *_by aggregates are declarative and
    keep O(1) state per window in the state store, so replay order,
    micro-batch boundaries, and shuffle nondeterminism cannot flip a
    bar's open or close."""
    w = F.window("ts", "10 minutes")
    key = F.struct(F.col("ts").alias("ts"),
                   F.col("event_id").alias("event_id"))
    return (events.groupBy(w.alias("w"), "user_id")
            .agg(F.min_by("value", key).alias("open"),
                 F.max("value").alias("high"),
                 F.min("value").alias("low"),
                 F.max_by("value", key).alias("close"),
                 F.count(F.lit(1)).alias("n_events"))
            .select(F.unix_timestamp("w.start").alias("window_start"),
                    "user_id", "open", "high", "low", "close", "n_events"))


def with_watermark(events: DataFrame, delay: str = "15 minutes") -> DataFrame:
    """Late-data bound for streaming mode (no-op in batch mode)."""
    return events.withWatermark("ts", delay)


# --- oracle-checked batch twins -------------------------------------------

@register("stream_tumbling", oracle="""
SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS window_start,
       event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) / 100.0, 2) AS sum_value
FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
""", bench=True)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-ts contract (all six stream twins): Spark's TimeWindowing
    rule injects `ts IS NOT NULL` under every window()/session_window()
    -- an event without an event-time cannot be windowed -- so each
    oracle filters identically (hostile-probe-caught row-count skew)."""
    pin_session_conf(spark)
    return tumbling_counts(load(spark, sf_dir, "events"))


@register("stream_ohlc", oracle="""
WITH b AS (
    SELECT user_id,
           CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS ws,
           value,
           first_value(value) OVER w AS open,
           last_value(value) OVER
               (PARTITION BY user_id, floor(epoch(ts) / 600)
                ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING) AS close
    FROM events
    WHERE ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id, floor(epoch(ts) / 600)
                 ORDER BY ts, event_id)
)
SELECT ws AS window_start, user_id,
       max(open) AS open, max(value) AS high,
       min(value) AS low, max(close) AS close,
       count(*) AS n_events
FROM b GROUP BY 1, 2
""")
def stream_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming OHLC bars (see ohlc_bars; the
    min_by/max_by selections are exact doubles, so the oracle needs no
    quantization). tests/test_streaming.py runs the same transform
    through a real readStream -> memory sink and matches it against
    this batch plan."""
    pin_session_conf(spark)
    return ohlc_bars(load(spark, sf_dir, "events"))


@register("stream_sliding", oracle="""
WITH slid AS (
    SELECT CAST(floor(epoch(ts) / 300) * 300 - g * 300 AS BIGINT) AS window_start,
           event_type
    FROM events, (SELECT unnest(generate_series(0, 1)) AS g)
    WHERE ts IS NOT NULL
)
SELECT window_start, event_type, count(*) AS n_events
FROM slid GROUP BY 1, 2
""")
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute window sliding every 5: each event lands in exactly
    window/slide = 2 windows (oracle enumerates them arithmetically)."""
    pin_session_conf(spark)
    return sliding_counts(load(spark, sf_dir, "events"))


@register("stream_session", oracle="""
WITH flagged AS (
    SELECT user_id, ts, value,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
    FROM events
    WHERE ts IS NOT NULL
), numbered AS (
    SELECT user_id, ts, value,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_no
    FROM flagged
)
SELECT user_id,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
       CAST(floor(epoch(max(ts) + INTERVAL 30 MINUTE)) AS BIGINT) AS session_end,
       count(*) AS n_events,
       round(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) / 100.0, 2) AS sum_value
FROM numbered GROUP BY user_id, session_no
""")
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window (30-min gap). The oracle reproduces its
    semantics with the lag -> gap-flag -> cumulative-sum recipe
    (session end = last event + gap, as Spark defines it)."""
    pin_session_conf(spark)
    return session_aggregate(load(spark, sf_dir, "events"))


@register("stream_dedup", oracle="""
SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS window_start,
       user_id, event_type,
       CAST(min(event_id) AS BIGINT) AS first_event_id
FROM events WHERE ts IS NOT NULL GROUP BY 1, 2, 3
""")
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_session_conf(spark)
    return windowed_dedup(load(spark, sf_dir, "events"))


def click_purchase_join(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Stream-stream interval join: each purchase matched to same-user
    clicks in the preceding 10 minutes. In streaming mode both sides
    carry watermarks, so state for either stream is bounded by the
    interval + watermark delay; in batch mode the identical expression
    is a plain range join."""
    c = clicks.select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("click_ts"))
    p = purchases.select(F.col("user_id").alias("p_user"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("purchase_ts"))
    cond = ((F.col("c_user") == F.col("p_user")) &
            (F.col("click_ts") <= F.col("purchase_ts")) &
            (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 10 MINUTES")))
    return (c.join(p, cond)
            .select(F.col("p_user").alias("user_id"), "purchase_id", "click_id",
                    F.unix_timestamp("purchase_ts").alias("purchase_epoch"),
                    F.unix_timestamp("click_ts").alias("click_epoch")))


@register("stream_stream_join", oracle="""
SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
       CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_epoch,
       CAST(floor(epoch(c.ts)) AS BIGINT) AS click_epoch
FROM events p JOIN events c
  ON c.user_id = p.user_id
 AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 10 MINUTE
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
""")
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join (clicks preceding
    each purchase by <= 10 min, same user). tests/test_streaming.py
    runs the same transform through two readStream sources with
    watermarks and checks row parity against this."""
    pin_session_conf(spark)
    ev = load(spark, sf_dir, "events")
    return click_purchase_join(ev.where(F.col("event_type") == "click"),
                               ev.where(F.col("event_type") == "purchase"))


TRENDING_K = 3  # event types kept per window


def trending_rank(counts: DataFrame) -> DataFrame:
    """Finishing step of the trending-topk pattern: rank each
    window's event types by count (ties broken on the type string)
    and keep the top TRENDING_K. Ranking is not a streamable
    operation (no window functions mid-stream), so this runs on the
    SINK side -- over the windowed-count table, which is bounded by
    |windows| x |event types|, never raw events. The same function
    finishes both the batch twin and the memory-sink output of the
    real stream (tests/test_streaming.py), so the ranking semantics
    are verified identical."""
    from pyspark.sql import Window as W
    w = (W.partitionBy("window_start")
         .orderBy(F.col("n_events").desc(), "event_type"))
    return (counts.select("window_start", "event_type", "n_events",
                          F.row_number().over(w).cast("long").alias("rank"))
            .where(F.col("rank") <= TRENDING_K))


@register("stream_topk_trending", oracle=f"""
WITH c AS (
    SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS window_start,
           event_type, count(*) AS n_events
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
)
SELECT window_start, event_type, n_events, CAST(rn AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (
          PARTITION BY window_start
          -- NULLS FIRST pins DuckDB to Spark's ASC default: a NULL
          -- event type tying on count must rank identically
          ORDER BY n_events DESC, event_type NULLS FIRST) AS rn
      FROM c)
WHERE rn <= {TRENDING_K}
""")
def stream_topk_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending event types: top-{TRENDING_K} per 10-minute tumbling
    window by count -- the live-dashboard staple ("what's hot right
    now"). The windowed count is the streamable half (the same
    watermarked tumbling aggregate stream_tumbling runs as a real
    readStream); the rank is trending_rank, applied sink-side over
    the bounded count table. tests/test_streaming.py pushes the count
    half through a real readStream -> memory sink and finishes it
    with the SAME trending_rank, matching this batch plan."""
    pin_session_conf(spark)
    counts = tumbling_counts(load(spark, sf_dir, "events")).select(
        "window_start", "event_type", "n_events")
    return trending_rank(counts)
