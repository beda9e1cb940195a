"""Watermark late-data accounting (SURVEY.md §2.10).

Structured Streaming's late-row rules -- the watermark advances to
max(event time seen) - delay at each micro-batch boundary, and a late
row is DISCARDED only when its whole window is already evicted
(window_end <= watermark); a late row whose window is still open is
accepted -- are the part of the streaming family the other stream_*
twins can't show: the events table is a perfectly ordered log, so a
straight replay never drops anything.

This operator makes the semantics visible DETERMINISTICALLY: arrival
order is a block-local bijective permutation of event_id (i -> (5*i+3)
mod 64 within each 64-row block -- gcd(5,64)=1, so it is a true
shuffle with bounded displacement, the shape of a distributed log with
bounded clock skew), arrivals are cut into fixed-size micro-batches,
and the watermark recurrence is evaluated exactly as the micro-batch
engine does -- including the two-watermark subtlety (SPARK-40925)
where late-event filtering runs one batch behind eviction, which the
real-stream confrontation test (tests/test_streaming.py) measured
rather than assumed. Every quantity is integer arithmetic on epoch
seconds, so the whole simulation is hash-checkable against the DuckDB
oracle.

Scale shape: the arrival sequence and window assignment are per-row
map expressions; the only non-data-sized state is the per-batch
max-event-time table (one row per micro-batch -- METADATA-sized, the
same thing the real engine keeps in its offset log), whose running max
is a window over that tiny table; the per-row join back to it is a
broadcast. The final accounting is one map-side-combinable groupBy on
the window start.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from recommendation_system_spark_ml_spark.registry import register
from recommendation_system_spark_ml_spark.session import pin_session_conf
from recommendation_system_spark_ml_spark.sources.catalog import load

ARRIVAL_BLOCK = 64   # permutation block: bounded arrival displacement
BATCH_ROWS = 200     # rows per simulated micro-batch
DELAY_S = 300        # withWatermark("ts", "5 minutes")
WIN_S = 600          # tumbling window("ts", "10 minutes")


@register("stream_late_data", oracle=f"""
WITH a AS (
    SELECT event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS es,
           (event_id // {ARRIVAL_BLOCK}) * {ARRIVAL_BLOCK}
               + (5 * (event_id % {ARRIVAL_BLOCK}) + 3) % {ARRIVAL_BLOCK}
               AS aseq
    FROM events
), b AS (
    SELECT event_id, es, aseq // {BATCH_ROWS} AS batch FROM a
), bm AS (
    SELECT batch, max(es) AS mx FROM b GROUP BY 1
), wm AS (
    SELECT batch,
           max(mx) OVER (ORDER BY batch
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 2 PRECEDING) - {DELAY_S} AS wmark
    FROM bm
), fin AS (
    SELECT max(mx) - {DELAY_S} AS final_wm FROM bm
), j AS (
    SELECT b.es, (b.es // {WIN_S}) * {WIN_S} AS wstart,
           (b.es // {WIN_S}) * {WIN_S} + {WIN_S} AS wend, w.wmark
    FROM b JOIN wm w USING (batch)
)
SELECT j.wstart AS window_start,
       count(*) AS n_arrived,
       CAST(sum(CASE WHEN j.wmark IS NOT NULL AND j.wend <= j.wmark
                THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(sum(CASE WHEN j.wmark IS NULL OR j.wend > j.wmark
                THEN 1 ELSE 0 END) AS BIGINT) AS n_accepted,
       CAST(sum(CASE WHEN j.wmark IS NOT NULL AND j.es < j.wmark
                AND j.wend > j.wmark THEN 1 ELSE 0 END) AS BIGINT)
           AS n_late_accepted,
       CAST(max(CASE WHEN j.wend <= f.final_wm THEN 1 ELSE 0 END)
            AS INTEGER) AS emitted_append
FROM j, fin f
GROUP BY 1
""")
def stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window late-data accounting under the micro-batch watermark
    recurrence: how many rows arrive for each 10-minute tumbling
    window, how many the engine accepts, how many it discards because
    the window was already evicted (window_end <= watermark at the
    arriving batch), how many are late-but-accepted (event time below
    the watermark, window still open -- the subtle case the docs
    warn about), and whether append mode ever emits the window
    (window_end <= final watermark). The lateness observability
    dashboard every production stream runs, stated as a deterministic
    batch query; test_streaming.py confronts the SAME accounting
    against a real readStream with the identical arrival order.

    Watermark semantics mirrored from the MEASURED engine behavior,
    not the simplified docs: since the two-watermark split (Spark
    3.4+, SPARK-40925), LATE-EVENT FILTERING uses the PREVIOUS
    micro-batch's watermark -- max(event time over batches <= k-2)
    - delay for a row arriving in batch k (one full batch more
    tolerant than the freshly-updated value) -- while STATE EVICTION /
    append emission uses the updated one. The confrontation test
    proved the distinction: the naive one-batch-lag simulation
    mismatches the real engine on 125 of 888 windows; this two-batch
    form matches on all 888. A row is dropped iff its window end <=
    that lagged watermark; NULL watermark (first two batches) drops
    nothing."""
    pin_session_conf(spark)
    ev = load(spark, sf_dir, "events")
    blk = F.lit(ARRIVAL_BLOCK)
    off = F.pmod(F.col("event_id"), blk)
    a = ev.select(
        F.unix_timestamp("ts").cast("long").alias("es"),
        ((F.col("event_id") - off) + F.pmod(5 * off + 3, blk)).alias("aseq"))
    b = a.select("es", F.expr(f"aseq div {BATCH_ROWS}").alias("batch"))
    bm = b.groupBy("batch").agg(F.max("es").alias("mx"))
    run = (Window.orderBy("batch")
           .rowsBetween(Window.unboundedPreceding, -2))
    # metadata-sized window: one row per micro-batch, the engine's own
    # offset-log cardinality -- the unpartitioned frame is over THIS
    # table, never over row data.
    wm = bm.select("batch",
                   (F.max("mx").over(run) - DELAY_S).alias("wmark"))
    fin = bm.agg((F.max("mx") - DELAY_S).alias("final_wm"))
    wstart = F.expr(f"(es div {WIN_S}) * {WIN_S}")
    j = (b.join(F.broadcast(wm), "batch")
         .select("es", wstart.alias("wstart"),
                 (wstart + WIN_S).alias("wend"), "wmark")
         .crossJoin(F.broadcast(fin)))
    dropped = F.col("wmark").isNotNull() & (F.col("wend") <= F.col("wmark"))
    late_ok = (F.col("wmark").isNotNull()
               & (F.col("es") < F.col("wmark"))
               & (F.col("wend") > F.col("wmark")))
    return (j.groupBy(F.col("wstart").alias("window_start"))
            .agg(F.count(F.lit(1)).alias("n_arrived"),
                 F.sum(dropped.cast("long")).alias("n_dropped"),
                 F.sum((~dropped).cast("long")).alias("n_accepted"),
                 F.sum(late_ok.cast("long")).alias("n_late_accepted"),
                 F.max(F.when(F.col("wend") <= F.col("final_wm"), 1)
                       .otherwise(0)).cast("int").alias("emitted_append")))
