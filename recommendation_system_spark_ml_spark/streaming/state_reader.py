"""State Store reader (Spark 4 `statestore` format): inspect the
persisted state of a streaming aggregation as a DataFrame.

The reference has no streaming at all; this is the ops surface a
production streaming deployment cannot live without -- state-size
audits, debugging a hot key, state migration validation -- exposed in
Spark 4 as `spark.read.format("statestore").load(checkpoint)` (plus
`state-metadata` for the operator inventory).

The registered query proves the property that makes the reader
trustworthy: the state persisted by a checkpointed per-user count
aggregation, read back OFFLINE from the checkpoint, must equal the
plain batch aggregate of the same input. State rows are per-key (the
shuffle partitioning of the aggregation), so at 100 TB the reader
scans state files per-partition in parallel -- no replay of the
stream, no driver round-trip.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recommendation_system_spark_ml_spark.registry import register
from recommendation_system_spark_ml_spark.session import pin_session_conf
from recommendation_system_spark_ml_spark.streaming.windows import stream_events


@register("stream_state_inspect", oracle="""
SELECT user_id, count(*) AS n_events
FROM events GROUP BY 1
""")
def stream_state_inspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run a checkpointed streaming count-per-user to completion, then
    read the state store back from the checkpoint and return it as
    (user_id, n_events). A fresh checkpoint dir per invocation keeps
    the state exactly one complete pass over the input (the dir is
    tmp-scoped and state rows are user-count-sized)."""
    pin_session_conf(spark)
    ckpt = tempfile.mkdtemp(prefix="spark_graft_state_inspect_")
    agg = (stream_events(spark, sf_dir)
           .groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events")))
    q = (agg.writeStream.outputMode("update").format("noop")
         .option("checkpointLocation", ckpt).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    state = spark.read.format("statestore").load(ckpt)
    # key/value struct field names are operator-internal (count agg
    # stores its partial as `count`); resolve them from the schema
    # instead of hard-coding
    key_field = state.schema["key"].dataType.names[0]
    val_field = state.schema["value"].dataType.names[0]
    return state.select(
        F.col(f"key.{key_field}").cast("long").alias("user_id"),
        F.col(f"value.{val_field}").cast("long").alias("n_events"))
