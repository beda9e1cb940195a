"""foreachBatch upsert sink: change-stream -> current-state snapshot.

The missing piece between streaming and the lake: plain streaming file
sinks can only append, but a CDC consumer needs UPSERT -- each user's
row replaced by their latest event. `foreachBatch` is Spark's
production idiom for that: per micro-batch, merge the batch into the
bucketed snapshot table, overwriting only the touched partitions
(dynamic partition overwrite).

The snapshot after the stream drains equals the batch CDC compaction
query (dedup_latest_by_key), which is exactly what the DuckDB oracle
checks -- an end-to-end streaming pipeline certified value-for-value.

Scale notes: the snapshot is hash-bucketed on the key (16 here; at
100 TB, thousands), so each micro-batch rewrites only buckets it
touches -- merge cost is proportional to the batch's key spread, not
table size. The read-merge-overwrite per batch is safe because
foreachBatch is at-least-once with deterministic output: replaying a
batch rewrites the same buckets to the same contents.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from recommendation_system_spark_ml_spark.registry import register
from recommendation_system_spark_ml_spark.session import pin_session_conf
from recommendation_system_spark_ml_spark.streaming.windows import stream_events

N_BUCKETS = 16


def _latest_per_user(df: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).drop("rn"))


def upsert_batch(batch_df: DataFrame, out: str) -> None:
    """Merge one micro-batch into the bucketed snapshot at `out`:
    latest-per-user within the batch, union with the already-written
    rows of the touched buckets, keep the winners, overwrite ONLY those
    buckets. This is the foreachBatch body; it is module-level (not a
    closure) so tests drive the identical code over multi-file inputs.

    Dynamic partition overwrite is requested per-write via the writer
    option -- NOT via spark.conf.set, which would silently change every
    later partitioned overwrite in the shared session."""
    batch = (_latest_per_user(batch_df)
             .select("event_id", "ts", "user_id", "event_type", "value")
             .withColumn("bucket", F.pmod(F.col("user_id"), N_BUCKETS)))
    touched = [r.bucket for r in batch.select("bucket").distinct().collect()]
    merged = batch
    if os.path.isdir(out):
        # localCheckpoint breaks lineage to the snapshot path --
        # Spark refuses to overwrite a path its plan still reads
        existing = (batch_df.sparkSession.read.parquet(out)
                    .filter(F.col("bucket").isin(touched))
                    .localCheckpoint(eager=True))
        merged = _latest_per_user(existing.unionByName(batch))
    (merged.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("bucket").parquet(out))


@register("stream_upsert_snapshot", oracle="""
SELECT event_id, user_id, event_type, round(value, 6) AS value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) = 1
""")
def stream_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the REAL stream (readStream -> foreachBatch upsert ->
    bucketed parquet snapshot, availableNow trigger), then return the
    drained snapshot. Must equal the batch compaction of the same
    events -- the oracle is the QUALIFY query."""
    pin_session_conf(spark)
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(tempfile.gettempdir(), "rsml_stream_upsert", sf_name)
    out = os.path.join(root, "snapshot")
    ckpt = os.path.join(root, "ckpt")
    shutil.rmtree(root, ignore_errors=True)  # deterministic re-runs

    q = (stream_events(spark, sf_dir)
         .writeStream.foreachBatch(lambda bdf, _bid: upsert_batch(bdf, out))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return (spark.read.parquet(out)
            .select("event_id", "user_id", "event_type",
                    F.round("value", 6).alias("value")))
