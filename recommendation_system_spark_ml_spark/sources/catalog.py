"""Table catalog over the harness parquet layout.

One parquet file per table under an sf dir (TESTDATA.md). At 100 TB the
same layout generalizes to partitioned parquet directories; callers only
ever see DataFrames, so swapping the physical layout (partitioned dirs,
bucketed tables, Iceberg) is contained here.

The reference loads ``::``-delimited text with RDD lambdas and a
pandas round-trip (MovieLensRecommender.py:113-129); see
``sources/text.py`` for the DataFrame-native equivalent of that path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Dimension tables safely below any sane autoBroadcastJoinThreshold even
# at sf=100TB-ish scale factors (they grow sub-linearly or are fixed).
SMALL_DIMS = frozenset({"region", "nation", "supplier"})


def path_for(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    if table not in TABLES:
        raise KeyError(f"unknown table {table!r}; have {TABLES}")
    df = spark.read.parquet(path_for(sf_dir, table))
    if table == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read via nanosAsLong (see session._DEFAULTS).
        # DuckDB truncates ns->us, so integer-DIV (not double division:
        # epoch-ns exceeds 2^53) keeps both engines bit-identical.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        df = df.select("event_id", "ts", "user_id", "event_type", "value", "props")
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
