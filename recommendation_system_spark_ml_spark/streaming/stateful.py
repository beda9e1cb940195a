"""Custom stateful streaming operator (SURVEY.md §2.10):
applyInPandasWithState over the events stream.

The operator keeps one state row per user (event count, value sum) and
emits the updated totals every micro-batch. With the whole events file
processed, the final per-user totals must equal the plain batch
aggregate -- which is exactly what the DuckDB oracle checks: the query
runs a REAL readStream -> applyInPandasWithState -> memory-sink job to
completion, then returns the last emitted row per user.

Scale notes: state lives in the executor state store partitioned by
user_id (the groupBy key); each micro-batch touches only the keys it
saw. The Arrow batches flow per key-partition, so Python cost is
O(events in batch), not O(state)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from recommendation_system_spark_ml_spark.registry import register
from recommendation_system_spark_ml_spark.session import pin_session_conf
from recommendation_system_spark_ml_spark.streaming.windows import stream_events

_OUT_SCHEMA = "user_id bigint, n_events bigint, sum_cents bigint"
_STATE_SCHEMA = "n bigint, cents bigint"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, value-sum) with explicit GroupState."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState
               ) -> Iterator[pd.DataFrame]:
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # integer cents: float sums must be associative across
            # engines, so accumulate exactly like the window oracles do.
            # dropna BEFORE the int cast: a NULL value is NaN here and
            # NaN.astype(int64) raises (fuzz-caught crash); dropping it
            # matches the oracle's NULL-skipping sum while n keeps
            # count(*) semantics.
            cents += int(pdf["value"].dropna().mul(100).round(0)
                         .astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "sum_cents": [cents]})

    return (events.groupBy("user_id")
            .applyInPandasWithState(update, _OUT_SCHEMA, _STATE_SCHEMA,
                                    "update", GroupStateTimeout.NoTimeout))


@register("stream_stateful_totals", oracle="""
SELECT user_id, count(*) AS n_events,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY 1
""")
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the stateful stream to completion against the events file
    and returns the final state per user. The oracle is the plain
    batch aggregate -- state-machine result == declarative result."""
    pin_session_conf(spark)
    name = "stateful_totals_sink"
    q = (running_user_totals(stream_events(spark, sf_dir))
         .writeStream.outputMode("update")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # keep only each user's final update (multiple micro-batches emit
    # multiple rows; the last one carries the full totals).
    return (spark.table(name).groupBy("user_id")
            .agg(F.max("n_events").alias("n_events"),
                 F.max_by("sum_cents", "n_events").alias("sum_cents")))
