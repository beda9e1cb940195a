"""Real Structured Streaming runs: the same transforms the oracle-checked
batch twins use, executed through readStream -> memory sink with a
watermark, then compared row-for-row against the batch result."""

import pytest

from tests.conftest import SF_SMOKE, assert_df_matches
from recommendation_system_spark_ml_spark.sources.catalog import load
from recommendation_system_spark_ml_spark.streaming.windows import (
    session_aggregate, stream_events, tumbling_counts, with_watermark)


def _run_stream(spark, transform, name):
    src = with_watermark(stream_events(spark, SF_SMOKE))
    q = (transform(src).writeStream.outputMode("complete")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def test_streaming_tumbling_matches_batch(spark):
    got = _run_stream(spark, tumbling_counts, "t_tumbling")
    want = tumbling_counts(load(spark, SF_SMOKE, "events")).toPandas()
    assert_df_matches(got, want)


def test_streaming_session_matches_batch(spark):
    got = _run_stream(spark, session_aggregate, "t_session")
    want = session_aggregate(load(spark, SF_SMOKE, "events")).toPandas()
    assert_df_matches(got, want)


def test_drop_duplicates_within_watermark(spark):
    """Real streaming dedup: one surviving row per (user_id,
    event_type) within the watermark horizon."""
    from pyspark.sql import functions as F

    src = with_watermark(stream_events(spark, SF_SMOKE), "1 hour")
    q = (src.dropDuplicatesWithinWatermark(["user_id", "event_type"])
         .writeStream.outputMode("append")
         .format("memory").queryName("t_ddwm").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT count(*) AS n FROM t_ddwm").collect()[0].n
    want = (load(spark, SF_SMOKE, "events")
            .select("user_id", "event_type").distinct().count())
    assert got == want


def test_stateful_totals_match_batch_aggregate(spark):
    from recommendation_system_spark_ml_spark.streaming.stateful import (
        stream_stateful_totals)

    got = stream_stateful_totals(spark, SF_SMOKE)
    want = (load(spark, SF_SMOKE, "events").groupBy("user_id")
            .count().count())
    assert got.count() == want


def test_stream_stream_interval_join_matches_batch(spark):
    """Two watermarked readStream sources joined on user + 10-minute
    interval must produce exactly the batch twin's rows."""
    from pyspark.sql import functions as F
    from recommendation_system_spark_ml_spark.streaming.windows import (
        click_purchase_join, stream_stream_join)

    src = stream_events(spark, SF_SMOKE)
    clicks = with_watermark(src.where(F.col("event_type") == "click"),
                            "30 minutes")
    purchases = with_watermark(src.where(F.col("event_type") == "purchase"),
                               "30 minutes")
    q = (click_purchase_join(clicks, purchases)
         .writeStream.outputMode("append")
         .format("memory").queryName("t_ssj").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM t_ssj")
    want = stream_stream_join(spark, SF_SMOKE).toPandas()
    assert_df_matches(got, want)


def test_streaming_append_with_watermark_closes_windows(spark):
    """Append mode only emits windows the watermark has passed; with the
    whole file processed, every window except the tail should be final."""
    src = with_watermark(stream_events(spark, SF_SMOKE), "1 minute")
    q = (tumbling_counts(src).writeStream.outputMode("append")
         .format("memory").queryName("t_append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    emitted = spark.sql("SELECT count(*) AS n FROM t_append").collect()[0].n
    total = tumbling_counts(load(spark, SF_SMOKE, "events")).count()
    assert 0 < emitted <= total
