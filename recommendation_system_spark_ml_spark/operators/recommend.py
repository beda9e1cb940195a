"""Neighborhood collaborative filtering (SURVEY.md §2.11, r6).

The reference is a recommender (KMeans content clustering + ALS matrix
factorization, MovieLensRecommender.py:72-83, 203-238); this module
adds the third classic family -- item-item neighborhood CF (Sarwar et
al. 2001, the pre-factorization workhorse that Amazon-style 'bought
together' systems still run) -- expressed ENTIRELY in DataFrame
algebra. Unlike the MLlib paths (rows-only checks by nature), every
step here is plain joins + aggregates, so the whole recommender is
DuckDB-hash-verified end to end: similarity matrix, neighbor cut,
score fusion, and the final top-N lists.

Scale shape (100 TB): the item-pair stage is the classic quadratic
hazard -- it is bounded by capping each user's rating list at
USER_CAP via WindowGroupLimit BEFORE pairing (per-user fan-out <=
USER_CAP^2; the cap is part of the algorithm's contract, shared with
the oracle, not a silent truncation), pairs shuffle ids + two floats,
neighbor lists cut per-item with WindowGroupLimit, and the scoring
join fans out by at most N_NEIGHBORS per rated item.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from recommendation_system_spark_ml_spark.registry import register
from recommendation_system_spark_ml_spark.session import pin_session_conf
from recommendation_system_spark_ml_spark.ml.parity import ratings_analog

USER_CAP = 50      # max ratings per user entering the pair join
MIN_CO = 2         # min co-rating users for a similarity to count
N_NEIGHBORS = 10   # per-item neighbor list length
N_RECS = 5         # final recommendations per user
_CF_Q = 1_000_000  # 6-decimal floor quantization, shared with oracles

# ratings_analog rebuilt portably: rating = avg quantity per
# (customer, part), cast to FLOAT32 -- the cast absorbs partial-sum
# order noise, so downstream float arithmetic starts from identical
# 24-bit values in both engines. NULL keys / all-NULL quantities carry
# no signal and are dropped on both sides.
_RATINGS_SQL = """
    SELECT CAST(o_custkey AS INTEGER) AS u,
           CAST(l_partkey AS INTEGER) AS i,
           CAST(CAST(avg(l_quantity) AS FLOAT) AS DOUBLE) AS r
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_custkey IS NOT NULL AND l_partkey IS NOT NULL
    GROUP BY 1, 2
    HAVING avg(l_quantity) IS NOT NULL
"""

_CAPPED_SQL = f"""
    SELECT u, i, r FROM (
        SELECT u, i, r,
               row_number() OVER (PARTITION BY u ORDER BY i ASC) AS rn
        FROM ratings
    ) WHERE rn <= {USER_CAP}
"""

def neighbors_sql(ratings_cte: str) -> str:
    """The item-neighbor CTE chain over an arbitrary ratings CTE body
    (operators/recsys_eval.py composes it over a TRAIN split for the
    held-out CF evaluation; the registered queries use the full
    ratings). The text is built once per call so both callers share
    the exact same algebra."""
    return f"""
ratings AS ({ratings_cte}),
capped AS ({_CAPPED_SQL}),
norms AS (
    SELECT i, sqrt(sum(r * r)) AS nrm FROM capped GROUP BY 1
),
pairs AS (
    SELECT a.i AS ia, b.i AS ib,
           sum(a.r * b.r) AS dot, count(*) AS co_cnt
    FROM capped a JOIN capped b ON a.u = b.u AND a.i < b.i
    GROUP BY 1, 2
    HAVING count(*) >= {MIN_CO}
),
sims AS (
    SELECT ia, ib,
           CAST(co_cnt AS BIGINT) AS co_cnt,
           floor(dot / (na.nrm * nb.nrm) * {_CF_Q} + 0.5) / {_CF_Q} AS sim
    FROM pairs JOIN norms na ON pairs.ia = na.i
               JOIN norms nb ON pairs.ib = nb.i
),
boths AS (
    SELECT ia AS item, ib AS neighbor, co_cnt, sim FROM sims
    UNION ALL
    SELECT ib, ia, co_cnt, sim FROM sims
),
nbrs AS (
    SELECT item, neighbor, co_cnt, sim FROM (
        SELECT item, neighbor, co_cnt, sim,
               row_number() OVER (PARTITION BY item
                                  ORDER BY sim DESC, neighbor ASC) AS rk
        FROM boths
    ) WHERE rk <= {N_NEIGHBORS}
)
"""


_NEIGHBORS_SQL = neighbors_sql(_RATINGS_SQL)


def _item_neighbors(spark: SparkSession, sf_dir: str,
                    ratings: DataFrame | None = None) -> DataFrame:
    """(item, neighbor, co_cnt, sim): per-item top-N_NEIGHBORS cosine
    neighbors over co-rating users, USER_CAP-bounded. Shared by both
    registered queries so the similarity matrix and the recommender
    can never disagree; recsys_eval.py passes a TRAIN-split `ratings`
    (u, i, r) for the held-out evaluation."""
    if ratings is None:
        ratings = (ratings_analog(spark, sf_dir)
                   .where(F.col("userId").isNotNull()
                          & F.col("movieId").isNotNull()
                          & F.col("rating").isNotNull())
                   .select(F.col("userId").alias("u"),
                           F.col("movieId").alias("i"),
                           F.col("rating").cast("double").alias("r")))
    wcap = Window.partitionBy("u").orderBy(F.col("i").asc())
    # r11 (guide §5): capped feeds THREE consumers -- both sides of
    # the pair self-join and the norms aggregate -- and the plan
    # re-ran the full scan+window chain for each. One eager
    # localCheckpoint materializes it once; the checkpointed RDD
    # keeps the window's hashpartitioning(u) + (u, i) sort order, so
    # the self-join needs no further Exchange or Sort on either side.
    capped = (ratings.withColumn("rn", F.row_number().over(wcap))
              .where(F.col("rn") <= USER_CAP).drop("rn")
              .localCheckpoint(eager=True))
    norms = capped.groupBy("i").agg(
        F.sqrt(F.sum(F.col("r") * F.col("r"))).alias("nrm"))
    a, b = capped.alias("a"), capped.alias("b")
    pairs = (a.join(b, (F.col("a.u") == F.col("b.u"))
                    & (F.col("a.i") < F.col("b.i")))
             .groupBy(F.col("a.i").alias("ia"), F.col("b.i").alias("ib"))
             .agg(F.sum(F.col("a.r") * F.col("b.r")).alias("dot"),
                  F.count(F.lit(1)).alias("co_cnt"))
             .where(F.col("co_cnt") >= MIN_CO))
    na = norms.select(F.col("i").alias("ia"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("i").alias("ib"), F.col("nrm").alias("nb"))
    # sims is consumed twice by the symmetrization union; without a
    # materialization the ENTIRE pair pipeline (self-join + groupBy)
    # executed once per union branch (r11 before-plan: two full
    # subtrees). The checkpointed table is the quantized pair list --
    # the same bytes each union branch already shuffled into its
    # neighbor-cut window, now written once instead of computed twice.
    sims = (pairs.join(F.broadcast(na), "ia").join(F.broadcast(nb), "ib")
            .select("ia", "ib", F.col("co_cnt").cast("long").alias("co_cnt"),
                    (F.floor(F.col("dot") / (F.col("na") * F.col("nb"))
                             * _CF_Q + F.lit(0.5)) / _CF_Q).alias("sim"))
            .localCheckpoint(eager=True))
    boths = (sims.select(F.col("ia").alias("item"),
                         F.col("ib").alias("neighbor"), "co_cnt", "sim")
             .union(sims.select(F.col("ib").alias("item"),
                                F.col("ia").alias("neighbor"),
                                "co_cnt", "sim")))
    wr = Window.partitionBy("item").orderBy(F.col("sim").desc(),
                                            F.col("neighbor").asc())
    return (boths.withColumn("rk", F.row_number().over(wr))
            .where(F.col("rk") <= N_NEIGHBORS).drop("rk"))


@register("ml_item_item_cf", oracle=f"""
WITH {_NEIGHBORS_SQL}
SELECT item, neighbor, co_cnt, sim FROM nbrs
""")
def ml_item_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item cosine similarity matrix (Sarwar et al. 2001) over
    the ratings analog -- the neighborhood-CF half of the reference's
    recommender domain, and unlike the ALS path it is EXACT and fully
    oracle-hashed: cosine over co-rating users (>= {MIN_CO}), per-item
    top-{N_NEIGHBORS} neighbor lists.

    Scale posture in order of hazard: (1) the user pair fan-out is
    capped at USER_CAP = {USER_CAP} ratings/user via WindowGroupLimit
    BEFORE pairing -- the cap is the documented algorithmic contract
    (heavy raters contribute their first {USER_CAP} items by id),
    shared verbatim with the oracle; (2) pairs shuffle (id, id,
    float, count) only; (3) norms broadcast onto the aggregated pair
    table; (4) the neighbor cut compiles to WindowGroupLimit so a
    popular item forwards {N_NEIGHBORS} candidates per map task.
    Similarities floor-quantize at 1e-6 BEFORE the ranked cut, making
    the neighbor lists cross-engine deterministic."""
    pin_session_conf(spark)
    return _item_neighbors(spark, sf_dir)


# The top-N scoring tail as a reusable CTE chain (appended after
# _NEIGHBORS_SQL): operators/recsys_eval.py composes coverage/novelty
# metrics over the SAME oracle text, so the evaluated recommender and
# the registered recommender can never drift apart.
_TOPN_CTE = f"""
scores AS (
    SELECT r.u, n.neighbor AS cand,
           sum(n.sim * r.r) AS num, sum(n.sim) AS den,
           count(*) AS support
    FROM ratings r JOIN nbrs n ON r.i = n.item
    GROUP BY 1, 2
),
unseen AS (
    SELECT s.* FROM scores s
    LEFT JOIN ratings r ON s.u = r.u AND s.cand = r.i
    WHERE r.i IS NULL AND s.den > 0
),
ranked AS (
    SELECT u AS "userId", cand AS "movieId",
           floor(num / den * {_CF_Q} + 0.5) / {_CF_Q} AS pred,
           CAST(support AS BIGINT) AS support,
           row_number() OVER (
               PARTITION BY u
               ORDER BY floor(num / den * {_CF_Q} + 0.5) / {_CF_Q} DESC,
                        cand ASC) AS rank
    FROM unseen
),
recs AS (
    SELECT "userId", "movieId", pred, support, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= {N_RECS}
)
"""


@register("ml_user_topn_recs", oracle=f"""
WITH {_NEIGHBORS_SQL},
{_TOPN_CTE}
SELECT * FROM recs
""")
def ml_user_topn_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{N_RECS} recommendations per user from the item-item
    neighbor lists: candidate score = similarity-weighted average of
    the user's own ratings of the candidate's neighbors (the standard
    weighted-sum predictor), already-rated items anti-joined out --
    the end-to-end neighborhood recommender, hash-verified where the
    ALS twin can only be band-checked.

    Shape: the scoring join fans out each rating by at most
    {N_NEIGHBORS} neighbor rows (broadcast-eligible neighbor table:
    |items| x {N_NEIGHBORS} rows), one groupBy(user, candidate)
    partial-combines the weighted sums, the seen-filter is a LEFT ANTI
    join on the same key pair, and the final cut is WindowGroupLimit.
    Predictions floor-quantize at 1e-6 before ranking; ties break on
    item id."""
    pin_session_conf(spark)
    ratings = (ratings_analog(spark, sf_dir)
               .where(F.col("userId").isNotNull()
                      & F.col("movieId").isNotNull()
                      & F.col("rating").isNotNull())
               .select(F.col("userId").alias("u"),
                       F.col("movieId").alias("i"),
                       F.col("rating").cast("double").alias("r")))
    nbrs = _item_neighbors(spark, sf_dir)
    return topn_recs(ratings, nbrs)


def topn_recs(ratings: DataFrame, nbrs: DataFrame) -> DataFrame:
    """The weighted-sum top-N scorer over (u, i, r) ratings and an
    (item, neighbor, sim) table -- factored so recsys_eval.py can run
    the IDENTICAL scorer on a train split for held-out evaluation."""
    scores = (ratings.join(F.broadcast(nbrs),
                           ratings.i == nbrs.item)
              .groupBy(F.col("u"), F.col("neighbor").alias("cand"))
              .agg(F.sum(F.col("sim") * F.col("r")).alias("num"),
                   F.sum("sim").alias("den"),
                   F.count(F.lit(1)).cast("long").alias("support")))
    seen = ratings.select("u", F.col("i").alias("cand"))
    unseen = (scores.join(seen, ["u", "cand"], "left_anti")
              .where(F.col("den") > 0))
    pred = F.floor(F.col("num") / F.col("den") * _CF_Q + F.lit(0.5)) / _CF_Q
    wr = Window.partitionBy("u").orderBy(pred.desc(), F.col("cand").asc())
    return (unseen.withColumn("rank", F.row_number().over(wr))
            .where(F.col("rank") <= N_RECS)
            .select(F.col("u").alias("userId"),
                    F.col("cand").alias("movieId"),
                    pred.alias("pred"), "support",
                    F.col("rank").cast("int").alias("rank")))
