"""Interleaved A/B: _item_neighbors with vs without capped/sims
checkpoints, alternating samples in ONE session."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from recommendation_system_spark_ml_spark.session import get_spark, pin_session_conf
from recommendation_system_spark_ml_spark.ml.parity import ratings_analog
from recommendation_system_spark_ml_spark.operators.recommend import USER_CAP, MIN_CO, N_NEIGHBORS, _CF_Q

spark = get_spark(app_name="ab_cf")
pin_session_conf(spark)
SF = "/root/testdata/sf0.1"

def base():
    return (ratings_analog(spark, SF)
            .where(F.col("userId").isNotNull() & F.col("movieId").isNotNull()
                   & F.col("rating").isNotNull())
            .select(F.col("userId").alias("u"), F.col("movieId").alias("i"),
                    F.col("rating").cast("double").alias("r")))

def nbrs(checkpoint: bool):
    ratings = base()
    wcap = Window.partitionBy("u").orderBy(F.col("i").asc())
    capped = (ratings.withColumn("rn", F.row_number().over(wcap))
              .where(F.col("rn") <= USER_CAP).drop("rn"))
    if checkpoint:
        capped = capped.localCheckpoint(eager=True)
    norms = capped.groupBy("i").agg(F.sqrt(F.sum(F.col("r") * F.col("r"))).alias("nrm"))
    a, b = capped.alias("a"), capped.alias("b")
    pairs = (a.join(b, (F.col("a.u") == F.col("b.u")) & (F.col("a.i") < F.col("b.i")))
             .groupBy(F.col("a.i").alias("ia"), F.col("b.i").alias("ib"))
             .agg(F.sum(F.col("a.r") * F.col("b.r")).alias("dot"),
                  F.count(F.lit(1)).alias("co_cnt"))
             .where(F.col("co_cnt") >= MIN_CO))
    na = norms.select(F.col("i").alias("ia"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("i").alias("ib"), F.col("nrm").alias("nb"))
    sims = (pairs.join(F.broadcast(na), "ia").join(F.broadcast(nb), "ib")
            .select("ia", "ib", F.col("co_cnt").cast("long").alias("co_cnt"),
                    (F.floor(F.col("dot") / (F.col("na") * F.col("nb"))
                             * _CF_Q + F.lit(0.5)) / _CF_Q).alias("sim")))
    if checkpoint:
        sims = sims.localCheckpoint(eager=True)
    boths = (sims.select(F.col("ia").alias("item"), F.col("ib").alias("neighbor"), "co_cnt", "sim")
             .union(sims.select(F.col("ib").alias("item"), F.col("ia").alias("neighbor"), "co_cnt", "sim")))
    wr = Window.partitionBy("item").orderBy(F.col("sim").desc(), F.col("neighbor").asc())
    return (boths.withColumn("rk", F.row_number().over(wr))
            .where(F.col("rk") <= N_NEIGHBORS).drop("rk"))

def quiesce():
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    time.sleep(0.3)

# warm both
for v in (True, False):
    nbrs(v).write.format("noop").mode("overwrite").save()
res = {True: [], False: []}
probes = {True: [], False: []}
for _ in range(5):
    for v in (True, False):
        quiesce()
        p0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id * 2 + 1)").collect()
        probes[v].append(time.perf_counter() - p0)
        t0 = time.perf_counter()
        nbrs(v).write.format("noop").mode("overwrite").save()
        res[v].append(time.perf_counter() - t0)
def med(xs): xs=sorted(xs); return xs[len(xs)//2]
for v in (True, False):
    print(("CHECKPOINT " if v else "PLAIN      "),
          "median", round(med(res[v]),2), [round(x,2) for x in res[v]],
          "probe_med", round(med(probes[v]),3))
