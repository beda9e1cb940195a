"""ML parity: the reference's core surface, DataFrame-native (SURVEY.md §2.8).

The reference (MovieLensRecommender.py) is a KMeans-vs-ALS recommender:
one-hot genre encoding (MLR.py:13-24, via driver pandas loops), KMeans
elbow sweep (MLR.py:155-182), the cluster-average predictor
(MLR.py:72-83), and 3-fold-CV'd ALS (MLR.py:203-238). Every piece is
rebuilt here on the harness star schema with zero driver-side data
loops:

- one-hot via distributed pivot (replaces MLR.py:123-126 collect);
- SSE via KMeansModel.summary.trainingCost (replaces the Python
  row-map at MLR.py:33-37,164);
- elbow = lag-window first-difference + argmin (MLR.py:47-51,181-182),
  preserving the reference's quirk that the first k's diff is 0 so it
  can never win (MLR.py:49);
- train/test split via the Knuth-hash recipe (oracle-reproducible,
  replacing nondeterministic randomSplit at MLR.py:145);
- ALS CV with parallelism=4 (the reference's sequential CV is the
  documented 2h20m bottleneck, BASELINE.md).

Scale notes: the ratings-analog (o_custkey x l_partkey, l_quantity) is
fact-table-sized; everything reaching KMeans/ALS stays JVM-side
(array_to_vector, MLlib). Driver-side materialization only for
provably-tiny results: the (k, SSE) sweep table and CV grid.
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.functions import array_to_vector
from pyspark.ml.recommendation import ALS
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from recommendation_system_spark_ml_spark.registry import register
from recommendation_system_spark_ml_spark.session import pin_session_conf
from recommendation_system_spark_ml_spark.sources.catalog import load

SEED = 823  # the reference's seed (MLR.py:30, 145, 208)

# Knuth multiplicative hash, same recipe as operators/relational.py's
# split_hash -- deterministic and expressible in both engines.
_KNUTH = 2654435761


def _hash_split(df: DataFrame, key_col) -> DataFrame:
    """70/30 split flag from a bigint key (replaces randomSplit)."""
    bucket = (key_col * F.lit(_KNUTH)) % F.lit(4294967296) % F.lit(10)
    return df.withColumn("split", F.when(bucket < 7, "train").otherwise("test"))


def kmeans_sweep(feats: DataFrame, ks=range(2, 11)) -> list[tuple[int, float]]:
    """Seeded KMeans fits for every k, submitted concurrently -- each
    fit is an independent chain of Spark jobs, so the scheduler overlaps
    them across the cluster (the reference runs them sequentially,
    MLR.py:180-182). Results are (k, SSE) with SSE from
    summary.trainingCost (JVM-side, no Python row maps)."""
    from concurrent.futures import ThreadPoolExecutor

    def fit(k: int) -> tuple[int, float]:
        return k, float(KMeans(k=k, seed=SEED).fit(feats).summary.trainingCost)

    # 9 independent fits; 8 in flight keeps all local[32] cores busy
    # (each fit is itself a multi-job chain with idle gaps the scheduler
    # fills from the other fits).
    with ThreadPoolExecutor(max_workers=8) as pool:
        return sorted(pool.map(fit, ks))


from collections import OrderedDict

_RATINGS_MEMO: OrderedDict[tuple[str, str], DataFrame] = OrderedDict()
_RATINGS_MEMO_CAP = 4  # (session, sf_dir) entries; LRU-evicted + unpersisted


def ratings_analog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user, item, rating) in the MovieLens shape: customer x part with
    the average ordered quantity as the explicit 'rating' (1..50-ish).

    Memoized + cached per (session, sf_dir): four ML queries start from
    this join+aggregate, and a correctness sweep runs them back to back
    in one session -- the memo turns three recomputations of the
    fact-table join into cache hits. The cached table is one row per
    (customer, part) pair that traded, far smaller than lineitem. The
    memo is a small LRU: a long-lived session touching many sf_dirs
    (or many restarted sessions under one driver) evicts + unpersists
    the oldest entry instead of pinning blocks forever."""
    import os

    key = (spark.sparkContext.applicationId,
           os.path.normpath(sf_dir))
    memo = _RATINGS_MEMO.get(key)
    if memo is not None:
        _RATINGS_MEMO.move_to_end(key)
        return memo
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    out = (li.join(orders, li.l_orderkey == orders.o_orderkey)
           .groupBy(F.col("o_custkey").cast("int").alias("userId"),
                    F.col("l_partkey").cast("int").alias("movieId"))
           .agg(F.avg("l_quantity").cast("float").alias("rating"))
           .cache())
    _RATINGS_MEMO[key] = out
    while len(_RATINGS_MEMO) > _RATINGS_MEMO_CAP:
        _, evicted = _RATINGS_MEMO.popitem(last=False)
        try:
            evicted.unpersist()
        except Exception:
            pass  # dead session's DataFrame: nothing to release
    return out


def onehot_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-hot the p_type 'genre': runtime-discovered vocabulary via a
    distributed pivot -- the DataFrame-native replacement for the
    reference's collect-to-pandas one-hot (MLR.py:117-126)."""
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (part.groupBy("p_partkey").pivot("p_type")
            .agg(F.coalesce(F.first(F.lit(1)), F.lit(0)))
            .na.fill(0))


@register("ml_onehot", oracle="""
SELECT p_partkey,
       CAST(p_type = 'ECONOMY'  AS INTEGER) AS "ECONOMY",
       CAST(p_type = 'LARGE'    AS INTEGER) AS "LARGE",
       CAST(p_type = 'MEDIUM'   AS INTEGER) AS "MEDIUM",
       CAST(p_type = 'PROMO'    AS INTEGER) AS "PROMO",
       CAST(p_type = 'SMALL'    AS INTEGER) AS "SMALL",
       CAST(p_type = 'STANDARD' AS INTEGER) AS "STANDARD"
FROM part
""")
def ml_onehot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-hot encoding is definitionally vocabulary-bound: the output
    COLUMNS are the category set discovered at fit time, so the oracle
    necessarily enumerates this corpus's six p_type values -- on a
    different corpus the columns differ by construction (not a
    divergence; the encoder was 'trained' on different data). NULL
    categories would add a 'null' pivot column in Spark where a SQL
    CASE enumeration has nowhere to put them; a NULL-bearing corpus
    should impute or drop before encoding."""
    pin_session_conf(spark)
    return onehot_parts(spark, sf_dir)


def elbow_frame(spark: SparkSession, rows: list[tuple[int, float]]) -> DataFrame:
    """(k, sse) sweep rows -> elbow table with lag-diff and best-k flag,
    exactly the reference's rule (MLR.py:47-51,181-182): best k = the
    largest drop in SSE (most negative lag-diff), ties -> smallest k.
    Shared by ml_kmeans_elbow and the golden-log confrontation test
    (tests/test_golden_log.py), which feeds the reference's OWN
    published SSE table through this code and expects its published
    pick (k=3) back."""
    sweep = spark.createDataFrame(rows, "k int, sse double")
    w = Window.orderBy("k")
    diffed = sweep.withColumn(
        "sse_diff", F.coalesce(F.col("sse") - F.lag("sse").over(w), F.lit(0.0)))
    best_k = (diffed.orderBy(F.col("sse_diff").asc(), F.col("k").asc())
              .select("k").first()[0])
    return diffed.withColumn("is_best", (F.col("k") == best_k).cast("int"))


def elbow_best_k(sse: dict[int, float]) -> int:
    """Pure-Python twin of elbow_frame's pick, for call sites that
    already hold the sweep as a dict (ml_movielens_report): argmin of
    the first difference, ties -> smallest k; the smallest k's diff is
    0 so it can never win (MLR.py:49)."""
    lo = min(sse)
    diffs = {k: (0.0 if k == lo else sse[k] - sse[k - 1]) for k in sse}
    return min(diffs, key=lambda k: (diffs[k], k))


def best_by_min_rmse(rows: list, pos: int):
    """First row attaining the minimal RMSE at tuple position `pos` --
    the reference's pandas idxmin over the CV output (MLR.py:40-44,
    :63). Python's min() returns the first minimum, matching idxmin's
    first-occurrence rule. Shared by ml_als_cv / ml_als_cv_full and
    the golden-log confrontation test."""
    return min(rows, key=lambda r: r[pos])


@register("ml_kmeans_elbow")  # rows-only: SSE needs MLlib
def ml_kmeans_elbow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2+M5+M6: KMeans sweep k=2..10 (seed 823) over the embeddings
    table, SSE from summary.trainingCost (JVM-side; replaces the Python
    row-map at MLR.py:33-37,164), elbow table with lag-diff + best-k
    flag exactly as MLR.py:47-51,181-182 computes it."""
    pin_session_conf(spark)
    feats = (load(spark, sf_dir, "embeddings")
             .select(array_to_vector(F.col("embedding").cast("array<double>"))
                     .alias("features"))
             .cache())
    rows = kmeans_sweep(feats)
    feats.unpersist()
    return (elbow_frame(spark, rows)
            .select("k", F.round("sse", 4).alias("sse"),
                    F.round("sse_diff", 4).alias("sse_diff"), "is_best"))


@register("ml_cluster_predictor")  # rows-only: KMeans assignment inside
def ml_cluster_predictor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 end-to-end: one-hot p_type -> VectorAssembler -> KMeans ->
    per-(user, cluster) average rating on the train split -> join back
    to the test split -> train/test RMSE, computed as a plain aggregate
    (the RegressionEvaluator twin, MLR.py:148-151,174,197).

    Returns one row per split with (split, rmse, n) -- deterministic
    under the seed + hash-split."""
    pin_session_conf(spark)
    onehot = onehot_parts(spark, sf_dir)
    genre_cols = [c for c in onehot.columns if c != "p_partkey"]
    feats = VectorAssembler(inputCols=genre_cols, outputCol="features").transform(onehot)
    model = KMeans(k=6, seed=SEED).fit(feats)
    clusters = (model.transform(feats)
                .select("p_partkey", F.col("prediction").alias("cluster")))

    ratings = ratings_analog(spark, sf_dir)
    rated = _hash_split(
        ratings.join(F.broadcast(clusters),
                     ratings.movieId == clusters.p_partkey)
        .select("userId", "movieId", "cluster", "rating"),
        F.col("userId").cast("bigint") * 4096 + F.col("movieId"))

    user_cluster = (rated.filter(F.col("split") == "train")
                    .groupBy("userId", "cluster")
                    .agg(F.avg("rating").alias("prediction")))
    scored = rated.join(user_cluster, on=["userId", "cluster"])
    return (scored.groupBy("split")
            .agg(F.round(F.sqrt(F.avg(F.pow(F.col("rating") - F.col("prediction"),
                                            F.lit(2)))), 4).alias("rmse"),
                 F.count(F.lit(1)).alias("n"))
            .orderBy("split"))


def _cv_fit_with_retry(cv, train, attempts: int = 3):
    """cv.fit with a bounded retry for a rare PySpark threading flake:
    CrossValidator(parallelism>1) evaluates folds on a shared session
    from a Python thread pool, and a concurrent numeric-SQLConf read
    can transiently surface `NumberFormatException: Cannot parse null
    string` (observed ~1/400 suite runs, r6; passes standalone every
    time). The fit is deterministic (seeded), so a retry re-runs the
    identical computation -- this guards scheduling nondeterminism,
    not result nondeterminism. Any other exception propagates."""
    from pyspark.errors.exceptions.captured import NumberFormatException
    last = None
    for _ in range(attempts):
        try:
            return cv.fit(train)
        except NumberFormatException as exc:  # pragma: no cover
            last = exc
    raise last



@register("ml_als_cv")  # rows-only: MLlib CV
def ml_als_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8-M10: ALS grid CV on the ratings-analog train split. The grid
    is a scaled-down 2x2x1 of the reference's 3x3x3 (MLR.py:212-221) so
    the correctness harness stays fast; parallelism=4 replaces the
    reference's sequential fits (its 2h20m bottleneck, BASELINE.md).
    Returns the CV grid table (rank, reg_param, avg_rmse, is_best)."""
    pin_session_conf(spark)
    # cache: CrossValidator's fold splits + per-fold fit/eval re-read
    # this input ~10x; without the cache each re-read replays the
    # join+groupBy lineage of ratings_analog
    train = (_hash_split(ratings_analog(spark, sf_dir),
                         F.col("userId").cast("bigint") * 4096 + F.col("movieId"))
             .filter(F.col("split") == "train").drop("split").cache())
    als = ALS(userCol="userId", itemCol="movieId", ratingCol="rating",
              coldStartStrategy="drop", seed=SEED, maxIter=5)
    grid = (ParamGridBuilder()
            .addGrid(als.rank, [8, 12])
            .addGrid(als.regParam, [0.05, 0.5])
            .build())
    evaluator = RegressionEvaluator(metricName="rmse", labelCol="rating",
                                    predictionCol="prediction")
    cv = CrossValidator(estimator=als, estimatorParamMaps=grid,
                        evaluator=evaluator, numFolds=2,
                        parallelism=8, seed=SEED)
    cv_model = _cv_fit_with_retry(cv, train)
    train.unpersist()
    rows = [(pm[als.rank], float(pm[als.regParam]), float(m))
            for pm, m in zip(grid, cv_model.avgMetrics)]
    best = best_by_min_rmse(rows, 2)
    out = spark.createDataFrame(rows, "rank int, reg_param double, avg_rmse double")
    return (out.withColumn("is_best",
                           ((F.col("rank") == best[0]) &
                            (F.col("reg_param") == best[1])).cast("int"))
            .select("rank", "reg_param", F.round("avg_rmse", 4).alias("avg_rmse"),
                    "is_best")
            .orderBy("rank", "reg_param"))


@register("ml_als_cv_full", oracle="""
WITH g AS (
    SELECT (r.i * 9 + m.i * 3 + p.i) AS grid_idx,
           r.v AS rank, m.v AS max_iter, CAST(p.v AS DOUBLE) AS reg_param
    FROM (VALUES (0, 1), (1, 10), (2, 100)) r(i, v),
         (VALUES (0, 5), (1, 10), (2, 15)) m(i, v),
         (VALUES (0, 0.001), (1, 0.01), (2, 0.05)) p(i, v)
)
SELECT grid_idx, rank, max_iter, reg_param,
       CAST(rank = 10 AND max_iter = 15 AND reg_param = 0.05
            AS INTEGER) AS is_best,
       TRUE AS rmse_in_band, TRUE AS best_attains_min
FROM g
""")
def ml_als_cv_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8-M10 at full fidelity: the reference's EXACT grid -- rank in
    {1, 10, 100} x maxIter in {5, 10, 15} x regParam in {0.001, 0.01,
    0.05}, 3-fold CV (MLR.py:211-226) -- reproducing the published
    27-row artifact (README.md:73-101) as (grid_idx, rank, max_iter,
    reg_param, is_best, ...), best = first minimal avg RMSE exactly
    like get_cv_ouptut + idxmin (MLR.py:40-44, :63).

    Runs on a fixed small MovieLens twin (not the sf tables) so 81
    fits + the winning refit stay seconds, not the reference's 2h20m:
    parallelism=8 overlaps fits across the cluster, which is the whole
    structural win -- the grid's cost at any data size is fits/
    parallelism, and each fit scales out with ALS's block partitioning.

    Oracle-backed (r6 promotion, contract shape): the hashed artifact
    is the 27-row grid in ParamGridBuilder enumeration order (regParam
    fastest -- certifies the published table's row order) with the
    WINNER IDENTITY pinned: the twin reproduces the reference's
    published best (rank 10, maxIter 15, reg 0.05) with a ~9e-4 gap to
    the runner-up, three orders above MLlib's ~1e-6 run-to-run
    summation noise, so a drifting CV pipeline turns this row red.
    The raw avg_rmse values stay out of the hash (round-4 boundaries
    sit within noise); they ride as TRUE-pinned contract booleans
    (finite, inside (0, 100) -- the rank-100 overfit leg reaches ~39
    -- and the best row attains the grid minimum) and remain fully
    visible in ml_movielens_report + the golden-band tests. The twin
    is fixed (sf_dir-independent), so the pinned identity is safe
    under the hostile-data probe by construction."""
    pin_session_conf(spark)
    import os
    import tempfile

    from recommendation_system_spark_ml_spark.sources.text import (
        generate_movielens_twin, parse_ratings)

    scratch = os.path.join(tempfile.gettempdir(), "spark_graft_movielens_cvfull")
    _, ratings_path = generate_movielens_twin(
        spark, scratch, n_movies=120, n_users=100, ratings_per_user=12)
    ratings = parse_ratings(spark.read.text(ratings_path))
    train = (_hash_split(ratings,
                         F.col("userId").cast("bigint") * 4096 + F.col("movieId"))
             .filter(F.col("split") == "train").drop("split"))
    # numBlocks is a physical knob, not a semantic one: the twin is
    # ~1k rows, so the default 10x10 block grid is mostly empty tasks.
    # 2x2 keeps the 81 fits scheduler-bound instead of task-bound; at
    # real scale blocks go UP with executors, the math is unchanged.
    als = ALS(userCol="userId", itemCol="movieId", ratingCol="rating",
              implicitPrefs=False, coldStartStrategy="drop", seed=SEED,
              numUserBlocks=2, numItemBlocks=2)
    grid = (ParamGridBuilder()
            .addGrid(als.rank, [1, 10, 100])
            .addGrid(als.maxIter, [5, 10, 15])
            .addGrid(als.regParam, [0.001, 0.01, 0.05])
            .build())
    evaluator = RegressionEvaluator(metricName="rmse", labelCol="rating",
                                    predictionCol="prediction")
    cv = CrossValidator(estimator=als, estimatorParamMaps=grid,
                        evaluator=evaluator, numFolds=3,
                        parallelism=8, seed=SEED)
    cv_model = _cv_fit_with_retry(cv, train)
    rows = [(i, pm[als.rank], pm[als.maxIter], float(pm[als.regParam]), float(m))
            for i, (pm, m) in enumerate(zip(grid, cv_model.avgMetrics))]
    best_idx = best_by_min_rmse(rows, 4)[0]
    min_rmse = min(r[4] for r in rows)
    out = spark.createDataFrame(
        rows, "grid_idx int, rank int, max_iter int, reg_param double, avg_rmse double")
    return (out.withColumn("is_best", (F.col("grid_idx") == best_idx).cast("int"))
            .select("grid_idx", "rank", "max_iter", "reg_param", "is_best",
                    ((F.col("avg_rmse") > 0) & (F.col("avg_rmse") < 100))
                    .alias("rmse_in_band"),
                    ((F.col("is_best") == 0)
                     | (F.col("avg_rmse") == F.lit(min_rmse)))
                    .alias("best_attains_min"))
            .orderBy("grid_idx"))


@register("ml_movielens_report", bench=True)  # rows-only: full ML pipeline
def ml_movielens_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference program end-to-end on a MovieLens-shaped twin
    (sources/text.py; FIXTURES.md §1): '::' text ingest -> genre
    one-hot (explode+pivot) -> KMeans sweep k=2..10 (seed 823, SSE from
    summary.trainingCost) -> elbow best-k -> cluster-average predictor
    RMSE -> seeded ALS test RMSE. Output mirrors the reference's
    printed report (MLR.py:243-259) as (metric, value) rows."""
    pin_session_conf(spark)
    import os
    import tempfile

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    scratch = os.path.join(tempfile.gettempdir(),
                           f"spark_graft_movielens_{sf_name}")
    from recommendation_system_spark_ml_spark.sources.text import (
        generate_movielens_twin, genre_onehot, parse_movies, parse_ratings)

    # At the bench scale factor, generate the reference's TRUE workload
    # shape -- MovieLens-1M: 3,706 movies, 6,040 users, ~1M ratings
    # (README.md:27) -- so the wall-clock is an apples-to-apples
    # single-node comparison with BASELINE.md. Smaller sfs use a small
    # twin to keep the correctness harness fast.
    size = ((3706, 6040, 166) if sf_name == "sf0.1" else (200, 150, 20))
    movies_path, ratings_path = generate_movielens_twin(
        spark, scratch, n_movies=size[0], n_users=size[1],
        ratings_per_user=size[2])
    movies = parse_movies(spark.read.text(movies_path))
    ratings = parse_ratings(spark.read.text(ratings_path))
    onehot = genre_onehot(movies)
    genre_cols = [c for c in onehot.columns if c != "movieId"]
    # Hash-repartition on the key BEFORE the fits: KMeans||'s seeded
    # initialization samples per partition, so results depend on the
    # partition LAYOUT, not just the seed -- a local[8] run and a
    # local[32] run would produce different (all valid) clusterings and
    # the golden-fixture regression test would see phantom drift. A
    # fixed hash layout makes the report a function of (data, seed)
    # only, on any cluster width -- the same property a real cluster
    # job needs for reproducible sign-off runs. (Measured caveat,
    # tests/test_ml_band.py: reproducible to ~1e-6 relative, not
    # bit-for-bit -- concurrent treeAggregate varies float-summation
    # order inside MLlib; the band test pins the promise at the
    # granularity that actually holds.)
    # ...and sort WITHIN partitions: hash layout fixes which rows land
    # where, but shuffle fetch order still varies with the upstream
    # task count, and KMeans|| samples rows positionally.
    feats = (VectorAssembler(inputCols=genre_cols, outputCol="features")
             .transform(onehot).repartition(8, "movieId")
             .sortWithinPartitions("movieId").cache())

    sse = dict(kmeans_sweep(feats))
    best_k = elbow_best_k(sse)

    model = KMeans(k=best_k, seed=SEED).fit(feats)
    clusters = (model.transform(feats)
                .select("movieId", F.col("prediction").alias("cluster")))
    feats.unpersist()

    rated = _hash_split(
        ratings.join(F.broadcast(clusters), "movieId"),
        F.col("userId").cast("bigint") * 4096 + F.col("movieId"))
    train = rated.filter(F.col("split") == "train")
    test = rated.filter(F.col("split") == "test")
    user_cluster = (train.groupBy("userId", "cluster")
                    .agg(F.avg("rating").alias("prediction")))

    def rmse_of(df: DataFrame) -> float:
        row = (df.join(user_cluster, on=["userId", "cluster"])
               .agg(F.sqrt(F.avg(F.pow(F.col("rating") - F.col("prediction"),
                                       F.lit(2))))).first())
        return float(row[0])

    als = ALS(rank=10, maxIter=10, regParam=0.05,
              userCol="userId", itemCol="movieId", ratingCol="rating",
              coldStartStrategy="drop", seed=SEED)
    # same layout-pinning rationale as feats above: ALS's block
    # assignment follows the input partitioning
    als_model = als.fit(train.select("userId", "movieId", "rating")
                        .repartition(8, "userId"))
    evaluator = RegressionEvaluator(metricName="rmse", labelCol="rating",
                                    predictionCol="prediction")
    als_rmse = float(evaluator.evaluate(
        als_model.transform(test.select("userId", "movieId", "rating"))))

    report = [
        ("kmeans_best_k", float(best_k)),
        ("kmeans_sse_best_k", round(sse[best_k], 4)),
        ("kmeans_train_rmse", round(rmse_of(train), 4)),
        ("kmeans_test_rmse", round(rmse_of(test), 4)),
        ("als_test_rmse", round(als_rmse, 4)),
    ]
    return spark.createDataFrame(report, "metric string, value double")


@register("ml_als_rmse")  # rows-only: MLlib ALS
def ml_als_rmse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8+M11+M12: single seeded ALS fit on the train split, test RMSE
    computed both ways -- RegressionEvaluator and the plain aggregate
    (A4) -- returned side-by-side as a self-check row."""
    pin_session_conf(spark)
    rated = _hash_split(ratings_analog(spark, sf_dir),
                        F.col("userId").cast("bigint") * 4096 + F.col("movieId"))
    train = rated.filter(F.col("split") == "train").drop("split")
    test = rated.filter(F.col("split") == "test").drop("split")
    als = ALS(rank=12, maxIter=10, regParam=0.05,
              userCol="userId", itemCol="movieId", ratingCol="rating",
              coldStartStrategy="drop", seed=SEED)
    model = als.fit(train)
    preds = model.transform(test).cache()
    evaluator = RegressionEvaluator(metricName="rmse", labelCol="rating",
                                    predictionCol="prediction")
    rmse_eval = float(evaluator.evaluate(preds))
    agg = preds.agg(
        F.sqrt(F.avg(F.pow(F.col("rating") - F.col("prediction"), F.lit(2))))
        .alias("rmse_agg"), F.count(F.lit(1)).alias("n_test")).first()
    preds.unpersist()
    return spark.createDataFrame(
        [(round(rmse_eval, 4), round(float(agg.rmse_agg), 4), int(agg.n_test))],
        "rmse_evaluator double, rmse_agg double, n_test bigint")


@register("ml_minmax_parity", oracle="""
WITH src AS (
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS DOUBLE) AS q,
           CAST(l_extendedprice AS DOUBLE) AS p,
           CAST(l_discount AS DOUBLE) AS d
    FROM lineitem
    WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
      AND l_discount IS NOT NULL
), stats AS (
    SELECT min(q) AS qmn, max(q) AS qmx,
           min(p) AS pmn, max(p) AS pmx,
           min(d) AS dmn, max(d) AS dmx
    FROM src
)
SELECT l_orderkey, l_linenumber,
       floor(CASE WHEN qmx = qmn THEN 0.5 ELSE (q - qmn) / (qmx - qmn) END
             * 10000 + 0.5) / 10000 AS quantity_scaled,
       floor(CASE WHEN pmx = pmn THEN 0.5 ELSE (p - pmn) / (pmx - pmn) END
             * 10000 + 0.5) / 10000 AS price_scaled,
       floor(CASE WHEN dmx = dmn THEN 0.5 ELSE (d - dmn) / (dmx - dmn) END
             * 10000 + 0.5) / 10000 AS discount_scaled
FROM src CROSS JOIN stats
""")
def ml_minmax_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib MinMaxScaler, ORACLE-HASH-CHECKED -- the one feature
    scaler whose statistics are exact selections (min/max), so the
    fitted model's transform is bit-reproducible in plain SQL: MLlib
    computes (v - min) / (max - min) * (outMax - outMin) + outMin,
    and with the default [0, 1] range the IEEE tail (* 1.0 + 0.0) is
    an exact identity, leaving the same expression tree DuckDB
    evaluates. (StandardScaler is deliberately NOT given this
    treatment: mean/variance come off a treeAggregate whose merge
    order drifts vs any sequential engine -- that family stays
    rows-only, like the KMeans SSE band tests.)

    A real MLlib fit + transform runs inside the query (assemble ->
    MinMaxScalerModel -> vector_to_array), not a SQL re-derivation,
    so this certifies the MLlib plumbing itself: assembler column
    order, model vector layout, transform arithmetic. Scale: the fit
    is one min/max aggregate (map-side combinable); the transform is
    a map-only expression; nothing shuffles but the 6-number stats
    row.

    Constant-feature caveat: when max == min MLlib emits 0.5 (the
    documented midpoint convention) where naive SQL divides by zero;
    the oracle mirrors it with an explicit CASE, so a degenerate
    column still hash-matches (unreachable on lineitem -- all three
    columns vary -- but the guard keeps the twin corpus-agnostic)."""
    pin_session_conf(spark)
    from pyspark.ml.feature import MinMaxScaler
    from pyspark.ml.functions import vector_to_array

    # shared NOT NULL filter (oracle identical): VectorAssembler's
    # default handleInvalid='error' aborts the fit on a NULL feature,
    # and a scaler is fit on observed values anyway (fuzz-caught)
    li = (load(spark, sf_dir, "lineitem")
          .where(F.col("l_quantity").isNotNull()
                 & F.col("l_extendedprice").isNotNull()
                 & F.col("l_discount").isNotNull())
          .select("l_orderkey", "l_linenumber",
                  F.col("l_quantity").cast("double").alias("q"),
                  F.col("l_extendedprice").cast("double").alias("p"),
                  F.col("l_discount").cast("double").alias("d")))
    assembled = VectorAssembler(
        inputCols=["q", "p", "d"], outputCol="feat").transform(li)
    model = MinMaxScaler(inputCol="feat", outputCol="scaled").fit(assembled)
    arr = vector_to_array(F.col("scaled"))

    def q4(c):
        return F.floor(c * 10000 + F.lit(0.5)) / 10000

    return (model.transform(assembled)
            .select("l_orderkey", "l_linenumber",
                    q4(arr[0]).alias("quantity_scaled"),
                    q4(arr[1]).alias("price_scaled"),
                    q4(arr[2]).alias("discount_scaled")))
