"""Interleaved A/B: ml_rec_eval_als OLD contract body (pool chain twice,
three separate count jobs) vs NEW (shared checkpointed pool, single-pass
counts), alternating in one session."""
import sys, time, math
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from recommendation_system_spark_ml_spark.session import get_spark, pin_session_conf
from recommendation_system_spark_ml_spark.operators import recsys_eval as re_
spark = get_spark(app_name="ab_evalals")
pin_session_conf(spark)
SF = "/root/testdata/sf0.1"

def old_body():
    row = re_.ml_rec_eval_als_metrics(spark, SF).collect()[0]
    metrics = [row["precision_at_k"], row["recall_at_k"], row["hit_rate"], row["ndcg_at_k"]]
    in_range = all(m is not None and math.isfinite(m) and 0.0 <= m <= 1.0 for m in metrics)
    ratings = re_._base_ratings(spark, SF)
    train, test, test_users = re_._split_ratings(ratings)
    n_train = train.count(); n_test = test.count()
    n_pool = re_._eval_user_pool(train, test_users).count()
    return (n_train, n_test, n_pool, int(row["n_users"] or 0) <= n_pool, in_range)

def new_body():
    return tuple(re_.ml_rec_eval_als(spark, SF).collect()[0])

def quiesce():
    spark.catalog.clearCache(); spark.sparkContext._jvm.System.gc(); time.sleep(0.3)

old_body(); new_body()  # warm
res = {"old": [], "new": []}
probes = []
for _ in range(4):
    for name, fn in (("old", old_body), ("new", new_body)):
        quiesce()
        p0=time.perf_counter(); spark.range(200_000_000).selectExpr("sum(id*2+1)").collect(); probes.append(time.perf_counter()-p0)
        t0=time.perf_counter(); fn(); res[name].append(time.perf_counter()-t0)
def med(xs): xs=sorted(xs); return xs[len(xs)//2]
print("probe_med", round(med(probes),3))
for k,v in res.items(): print(k, "median", round(med(v),2), [round(x,2) for x in v])
