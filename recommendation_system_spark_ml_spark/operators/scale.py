"""Scale-pattern operators (SURVEY.md §4, 100 TB design rules).

Two patterns that matter only at scale, exercised as first-class
oracle-checked queries so the recipes stay correct:

- join_bucketed: both join sides persisted as bucketed tables on the
  join key -> co-located join with NO shuffle exchange on either side
  (tests/test_plans.py asserts the absence). At 100 TB this is the
  difference between re-shuffling the fact table per query and never
  shuffling it at all.
- join_salted: explicit skew mitigation -- the probe side's hot keys
  are salted into S sub-keys, the build side replicated S times, join
  on (key, salt). Result identical to the plain join (the oracle
  proves it); AQE's skewJoin does this adaptively, the explicit recipe
  is for engines/pipelines where the skew is known ahead of time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recommendation_system_spark_ml_spark.registry import register
from recommendation_system_spark_ml_spark.session import pin_session_conf
from recommendation_system_spark_ml_spark.sources.catalog import load

N_BUCKETS = 8
N_SALTS = 8


def _bucketed_name(sf_dir: str, table: str) -> str:
    # table names can't contain dots; key by sf dir basename
    sf = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    return f"bkt_{sf}_{table}"


def ensure_bucketed(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Persist orders+lineitem bucketed by the join key (idempotent).
    At 100 TB this is the one-time layout investment every co-located
    join amortizes."""
    import shutil
    from urllib.parse import urlparse

    names = (_bucketed_name(sf_dir, "orders"), _bucketed_name(sf_dir, "lineitem"))
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for table, name, key in (("orders", names[0], "o_orderkey"),
                             ("lineitem", names[1], "l_orderkey")):
        if not spark.catalog.tableExists(name):
            # bucket metadata lives in the session catalog; files left by
            # a previous session are unusable without it -- clear them so
            # saveAsTable doesn't trip on LOCATION_ALREADY_EXISTS.
            shutil.rmtree(os.path.join(warehouse, name), ignore_errors=True)
            (load(spark, sf_dir, table)
             .write.bucketBy(N_BUCKETS, key).sortBy(key)
             .mode("overwrite").format("parquet").saveAsTable(name))
    return names


@register("join_bucketed", oracle="""
SELECT o.o_orderkey, o.o_orderstatus,
       count(*) AS n_lines,
       CAST(sum(CAST(round(l.l_quantity, 0) AS BIGINT)) AS BIGINT) AS sum_qty
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY 1, 2
""")
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join on pre-bucketed tables: zero Exchange nodes on
    the join (asserted in tests/test_plans.py), and the groupBy on the
    same key reuses the bucket partitioning too."""
    pin_session_conf(spark)
    orders_t, lineitem_t = ensure_bucketed(spark, sf_dir)
    o = spark.table(orders_t).select("o_orderkey", "o_orderstatus")
    li = spark.table(lineitem_t).select("l_orderkey", "l_quantity")
    return (o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("o_orderkey", "o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 F.sum(F.round("l_quantity", 0).cast("long")).alias("sum_qty")))


@register("join_salted", oracle="""
SELECT l.l_orderkey, l.l_linenumber, o.o_custkey, o.o_orderstatus
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
""")
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join, result-identical to the plain join: probe rows
    get salt = hash(row) % S, the build side is exploded S times, the
    join key becomes (key, salt). Splits any hot key's rows across S
    shuffle partitions."""
    pin_session_conf(spark)
    li = (load(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_linenumber",
                  (F.abs(F.xxhash64("l_orderkey", "l_linenumber")) % N_SALTS)
                  .alias("salt")))
    orders = (load(spark, sf_dir, "orders")
              .select("o_orderkey", "o_custkey", "o_orderstatus",
                      F.explode(F.array(*[F.lit(i) for i in range(N_SALTS)]))
                      .alias("salt")))
    return (li.join(orders, (li.l_orderkey == orders.o_orderkey) &
                    (li.salt == orders.salt))
            .select("l_orderkey", "l_linenumber", "o_custkey", "o_orderstatus"))


def two_level_global_rank(df: DataFrame, bucket, order_cols,
                          out: str = "rn") -> DataFrame:
    """Global row_number() over `order_cols` WITHOUT a single-reducer
    sort: rank inside `bucket` partitions in parallel, then lift to
    global ranks via a broadcast per-bucket offset table (a window
    over n_buckets rows, not n rows). `bucket` must be monotone
    NON-DECREASING along the global order -- ascending bucket order
    must equal the global order of `order_cols` -- which the caller
    guarantees by deriving the bucket from the leading sort key
    (e.g. floor(key/1000) for ascending, floor(-score*100) for
    descending). Used by pipeline_curriculum; same recipe as
    stable_row_ids and window_ntile. Property-tested against the
    naive global window in tests/test_fuzz_scalars.py."""
    from pyspark.sql.window import Window as W

    bucketed = df.withColumn("__bucket", bucket)
    wb = W.partitionBy("__bucket").orderBy(*order_cols)
    within = bucketed.withColumn("__rib", F.row_number().over(wb))
    counts = bucketed.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__n"))
    woff = (W.orderBy("__bucket")
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    offsets = (counts
               .withColumn("__off", F.sum("__n").over(woff) - F.col("__n"))
               .select("__bucket", "__off"))
    return (within.join(F.broadcast(offsets), "__bucket")
            .withColumn(out, (F.col("__off") + F.col("__rib")).cast("long"))
            .drop("__bucket", "__rib", "__off", "__n"))


def two_level_running_sum(df: DataFrame, bucket, order_cols, value,
                          out: str = "cum") -> DataFrame:
    """Global running SUM of `value` over `order_cols` without a
    single-reducer sort -- the cumulative-sum sibling of
    two_level_global_rank: running sum inside `bucket` partitions in
    parallel, lifted to global cumulative totals via a broadcast
    per-bucket offset table (prior buckets' value totals). Same
    contract: ascending `bucket` must equal the global order of
    `order_cols`. Used by pipeline_token_budget; property-tested
    against the naive global window in tests/test_fuzz_scalars.py."""
    from pyspark.sql.window import Window as W

    bucketed = df.withColumn("__bucket", bucket).withColumn("__v", value)
    wb = (W.partitionBy("__bucket").orderBy(*order_cols)
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    within = bucketed.withColumn("__rs", F.sum("__v").over(wb))
    totals = bucketed.groupBy("__bucket").agg(F.sum("__v").alias("__t"))
    woff = (W.orderBy("__bucket")
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    offsets = (totals
               .withColumn("__off", F.sum("__t").over(woff) - F.col("__t"))
               .select("__bucket", "__off"))
    return (within.join(F.broadcast(offsets), "__bucket")
            .withColumn(out, F.col("__off") + F.col("__rs"))
            .drop("__bucket", "__v", "__rs", "__off", "__t"))
