"""Join family (SURVEY.md §2.3).

J1 single-key inner (MovieLensRecommender.py:73-74, there with a
mixed-type key healed by implicit cast -- here keys are typed at ingest),
J2 composite-key inner (MLR.py:81-83), plus the gap operators the
reference lacks: outer/semi/anti, band (range) join, as-of join.

Scale notes:
- fact-to-fact joins shuffle on the join key; AQE handles partition
  sizing + skew. Dim joins are broadcast-eligible and left to Catalyst
  (hard-coding broadcast() for a table that grows with SF would be a
  100 TB footgun); provably-tiny derived aggregates DO get broadcast().
- the band join is an equi-join on the natural key with the band as a
  post-join predicate -- never a cartesian BNLJ.
- as-of is expressed as join + max_by-style aggregation (shuffle on the
  key, no per-row driver work); for dense per-key history the
  applyInPandas + pd.merge_asof per key-group variant scales better --
  both are provided (asof_join / asof_join_pandas in engine API).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recommendation_system_spark_ml_spark.registry import register
from recommendation_system_spark_ml_spark.session import pin_session_conf
from recommendation_system_spark_ml_spark.sources.catalog import load


@register("join_inner", oracle="""
SELECT l.l_orderkey, l.l_linenumber, l.l_quantity,
       o.o_orderstatus, CAST(year(o.o_orderdate) AS INTEGER) AS order_year
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
""")
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: single-key inner equi-join between the two fact tables."""
    pin_session_conf(spark)
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.year("o_orderdate").alias("order_year"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .select("l_orderkey", "l_linenumber", "l_quantity",
                    "o_orderstatus", "order_year"))


@register("join_multi_key", oracle="""
WITH grp AS (
    SELECT l_orderkey, l_returnflag, avg(l_quantity) AS grp_avg_qty
    FROM lineitem GROUP BY 1, 2
)
SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
       round(l.l_quantity - g.grp_avg_qty, 6) AS qty_dev
FROM lineitem l
JOIN grp g ON l.l_orderkey = g.l_orderkey AND l.l_returnflag = g.l_returnflag
""", bench=True)
def join_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: composite-key join -- the M7 join-back shape (MLR.py:81-83):
    group average joined back to rows on both grouping keys."""
    pin_session_conf(spark)
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    grp = (li.groupBy("l_orderkey", "l_returnflag")
           .agg(F.avg("l_quantity").alias("grp_avg_qty")))
    return (li.join(grp, on=["l_orderkey", "l_returnflag"])
            .select("l_orderkey", "l_linenumber", "l_returnflag",
                    F.round(F.col("l_quantity") - F.col("grp_avg_qty"), 6).alias("qty_dev")))


@register("join_left", oracle="""
SELECT c.c_custkey, c.c_mktsegment,
       CAST(coalesce(n.n_orders, 0) AS BIGINT) AS n_orders
FROM customer c
LEFT JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1) n
  ON c.c_custkey = n.o_custkey
""")
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_session_conf(spark)
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cnt = (load(spark, sf_dir, "orders")
           .groupBy(F.col("o_custkey")).agg(F.count(F.lit(1)).alias("n_orders")))
    return (cust.join(cnt, cust.c_custkey == cnt.o_custkey, "left")
            .select("c_custkey", "c_mktsegment",
                    F.coalesce("n_orders", F.lit(0)).alias("n_orders")))


@register("join_full", oracle="""
WITH o_years AS (SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER) AS yr FROM orders),
     l_years AS (SELECT DISTINCT CAST(year(l_shipdate) AS INTEGER) AS yr FROM lineitem)
SELECT coalesce(o.yr, l.yr) AS yr,
       o.yr IS NOT NULL AS has_orders,
       l.yr IS NOT NULL AS has_shipments
FROM o_years o FULL OUTER JOIN l_years l ON o.yr = l.yr
""")
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_session_conf(spark)
    oy = (load(spark, sf_dir, "orders")
          .select(F.year("o_orderdate").alias("yr")).distinct().alias("o"))
    ly = (load(spark, sf_dir, "lineitem")
          .select(F.year("l_shipdate").alias("yr")).distinct().alias("l"))
    return (oy.join(ly, F.col("o.yr") == F.col("l.yr"), "full_outer")
            .select(F.coalesce("o.yr", "l.yr").alias("yr"),
                    F.col("o.yr").isNotNull().alias("has_orders"),
                    F.col("l.yr").isNotNull().alias("has_shipments")))


@register("join_semi", oracle="""
SELECT c_custkey, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
""")
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_session_conf(spark)
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    filled = (load(spark, sf_dir, "orders")
              .filter(F.col("o_orderstatus") == "F").select("o_custkey"))
    return cust.join(filled, cust.c_custkey == filled.o_custkey, "left_semi")


@register("join_anti", oracle="""
SELECT c_custkey, c_mktsegment FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
""")
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_session_conf(spark)
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    filled = (load(spark, sf_dir, "orders")
              .filter(F.col("o_orderstatus") == "F").select("o_custkey"))
    return cust.join(filled, cust.c_custkey == filled.o_custkey, "left_anti")


@register("join_range", oracle="""
SELECT l.l_orderkey, l.l_linenumber, p.p_partkey, p.p_size, l.l_quantity
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
           AND l.l_quantity BETWEEN p.p_size - 5 AND p.p_size + 5
""")
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band join: equi key + range predicate. Catalyst evaluates the
    band as a post-shuffle join residual -- no cartesian explosion."""
    pin_session_conf(spark)
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_size")
    cond = ((li.l_partkey == p.p_partkey)
            & (li.l_quantity >= p.p_size - 5) & (li.l_quantity <= p.p_size + 5))
    return (li.join(p, cond)
            .select("l_orderkey", "l_linenumber", "p_partkey", "p_size", "l_quantity"))


# As-of join: events.user_id asof-matched to the latest order of the
# same customer key at/before the event time. DuckDB has a native ASOF
# JOIN; Spark does not -- recipe (a): equi-join on the key with the
# temporal inequality as residual, then max() per left row. Tie-safe
# because the asof VALUE (the matched timestamp), not an arbitrary
# matched row, is returned.
@register("join_asof", oracle="""
SELECT e.event_id, e.user_id,
       CAST(epoch(max(o.o_orderdate)) AS BIGINT) AS last_order_epoch
FROM events e
JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
GROUP BY e.event_id, e.user_id
""")
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_session_conf(spark)
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    return (ev.join(o, (o.o_custkey == ev.user_id) & (o.o_orderdate <= ev.ts))
            .groupBy("event_id", "user_id")
            .agg(F.unix_timestamp(F.max("o_orderdate")).alias("last_order_epoch")))


def asof_join_pandas(left: DataFrame, right: DataFrame, key: str, right_key: str,
                     left_ts: str, right_ts: str, value_cols: list[str]) -> DataFrame:
    """Engine API: merge_asof per key-group via applyInPandas.

    Scales to dense per-key histories where the join+max expansion
    would blow up: each key group is sorted once in pandas and merged
    in O(n+m). Used by tests; join_asof above is the pure-SQL twin.
    """
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
        + [f"{right.schema[c].name} {right.schema[c].dataType.simpleString()}"
           for c in value_cols])

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = pdf[pdf["_side"] == 0].drop(columns=["_side"]).sort_values(left_ts)
        rpdf = pdf[pdf["_side"] == 1].drop(columns=["_side"]).sort_values(right_ts)
        lcols = [f.name for f in left.schema.fields]
        merged = pd.merge_asof(
            lpdf[lcols], rpdf[[right_ts, *value_cols]].rename(columns={right_ts: left_ts}),
            on=left_ts, direction="backward")
        return merged

    lhs = left.withColumn("_side", F.lit(0))
    rhs = right.withColumnRenamed(right_key, key).withColumn("_side", F.lit(1))
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)
    return unioned.groupBy(key).applyInPandas(merge, schema=out_schema)


@register("join_null_safe", oracle="""
WITH c AS (
    SELECT c_custkey, nullif(c_nationkey % 5, 0) AS seg FROM customer
), s AS (
    SELECT s_suppkey, nullif(s_nationkey % 5, 0) AS seg FROM supplier
)
SELECT c.c_custkey, s.s_suppkey, coalesce(CAST(c.seg AS VARCHAR), 'NULL') AS seg
FROM c JOIN s ON c.seg IS NOT DISTINCT FROM s.seg
""")
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    MATCH EACH OTHER instead of silently dropping, the semantics
    entity-resolution pipelines need when 'unknown segment' rows must
    still pair up. A plain equi-join on the same keys loses every
    NULL row on both sides -- the classic silent-data-loss bug.

    Derived nullable key: nationkey % 5 with 0 mapped to NULL, the
    same on both sides, so the NULL-matching path carries real rows at
    every scale factor. Plan note: `<=>` still hash-partitions both
    sides (NULL hashes to a single key) -- at 100 TB a hot NULL
    segment is a skew key like any other and takes the same salting
    treatment (join_salted)."""
    pin_session_conf(spark)
    seg_c = F.nullif((F.col("c_nationkey") % 5).cast("int"), F.lit(0))
    seg_s = F.nullif((F.col("s_nationkey") % 5).cast("int"), F.lit(0))
    c = (load(spark, sf_dir, "customer")
         .select("c_custkey", seg_c.alias("seg")))
    s = (load(spark, sf_dir, "supplier")
         .select("s_suppkey", seg_s.alias("seg")))
    return (c.join(F.broadcast(s), c["seg"].eqNullSafe(s["seg"]))
            .select("c_custkey", "s_suppkey",
                    F.coalesce(c["seg"].cast("string"), F.lit("NULL"))
                    .alias("seg")))


_BLOOM_BITS = 1 << 17   # 131072 bits = 2048 longs = 16 KB broadcast
_BLOOM_HASHES = 3


@register("join_bloom_pruned", oracle="""
SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, o.o_totalprice
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
""")
def join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join reduction via an expression-native Bloom filter: the
    big side is pre-filtered map-side against a 16 KB bit set built
    from the small side's keys, BEFORE it ever shuffles for the exact
    join. Spark's own runtime bloom filter
    (spark.sql.optimizer.runtime.bloomFilter.*) makes the same move
    but only when its creation-side heuristics fire; building it as
    plain expressions makes the reduction unconditional, portable, and
    hash-checkable (false positives are harmless -- the exact join
    runs after -- so the result equals the plain join, which IS the
    oracle).

    Shape: k=3 seeded xxhash64 positions per build key -> explode ->
    groupBy(word) bit_or -> ONE map<word,bits> row (<= 2048 entries),
    broadcast; the probe side tests all k bits with element_at + `&`
    inside codegen and only survivors reach the join Exchange. At 100
    TB this is the difference between shuffling the full fact table
    and shuffling the ~20% that can match (plus FPR); the bloom build
    costs one pass over the SMALL side only."""
    pin_session_conf(spark)
    build = (load(spark, sf_dir, "orders")
             .where(F.col("o_orderpriority") == "1-URGENT")
             .select("o_orderkey", "o_totalprice"))

    def positions(key: str) -> list:
        return [F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(_BLOOM_BITS))
                for i in range(_BLOOM_HASHES)]

    bits = (build.select(F.explode(F.array(*positions("o_orderkey")))
                         .alias("pos"))
            .select((F.col("pos") / 64).cast("int").alias("word"),
                    F.expr("shiftleft(CAST(1 AS BIGINT), "
                           "CAST(pos % 64 AS INT))").alias("bit")))
    bloom = (bits.groupBy("word").agg(F.bit_or("bit").alias("bits"))
             .agg(F.map_from_entries(
                 F.collect_list(F.struct("word", "bits"))).alias("bloom")))

    probe = (load(spark, sf_dir, "lineitem")
             .select("l_orderkey", "l_linenumber", "l_quantity")
             .crossJoin(F.broadcast(bloom)))
    maybe = F.lit(True)
    for i in range(_BLOOM_HASHES):
        p = F.pmod(F.xxhash64(F.col("l_orderkey"), F.lit(i)),
                   F.lit(_BLOOM_BITS))
        word = F.element_at("bloom", (p / 64).cast("int"))
        bit = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST("
                     f"pmod(xxhash64(l_orderkey, {i}), {_BLOOM_BITS})"
                     f" % 64 AS INT))")
        maybe = maybe & (F.coalesce(word, F.lit(0)).bitwiseAND(bit) != 0)
    survivors = probe.where(maybe).drop("bloom")
    return (survivors.join(build,
                           survivors.l_orderkey == build.o_orderkey)
            .select("l_orderkey", "l_linenumber", "l_quantity",
                    "o_totalprice"))


_ASOF_NEAREST_TOL_US = 3_600_000_000  # 1 hour, in exact integer microseconds


@register("join_asof_nearest", oracle=f"""
WITH c AS (
    SELECT event_id, user_id, epoch_us(ts) AS tus FROM events
    WHERE event_type = 'click'
), p AS (
    SELECT event_id, user_id, epoch_us(ts) AS tus FROM events
    WHERE event_type = 'purchase'
), cand AS (
    SELECT c.event_id AS click_id, c.user_id,
           p.event_id AS purchase_id,
           abs(p.tus - c.tus) AS dist_us, p.tus AS ptus
    FROM c JOIN p ON p.user_id = c.user_id
    WHERE abs(p.tus - c.tus) <= {_ASOF_NEAREST_TOL_US}
)
SELECT click_id, user_id, purchase_id, CAST(dist_us AS BIGINT) AS dist_us
FROM (SELECT *, row_number() OVER (
          PARTITION BY click_id
          ORDER BY dist_us, ptus, purchase_id) AS rn
      FROM cand)
WHERE rn = 1
""")
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-tolerance as-of join (pandas merge_asof
    direction='nearest' with a tolerance): each click pairs with the
    same user's closest-in-time purchase within +-1 h -- the
    ad-attribution / sensor-alignment variant the backward-only
    join_asof cannot express. Deterministic winner: (|delta t|, then
    earlier purchase time, then purchase id) -- a total order, since
    two purchases may share a timestamp.

    Scale shape: candidates are BANDED to an equi-join, never a
    range-only join -- each click explodes to its 3 adjacent
    1-hour-tolerance time bands and joins purchases on
    (user_id, band), so a pair is considered only if it can be within
    tolerance (the join_range recipe). The argmin is ONE map-side-
    combinable min(struct(dist, ts, id)) aggregate -- lexicographic
    struct ordering IS the tiebreak -- no per-click window. All time
    arithmetic in exact integer microseconds (unix_micros /
    epoch_us): no float, no rounding reconciliation. The NTZ->
    timestamp cast is identity under the UTC-pinned session
    (pin_session_conf), matching DuckDB's naive epoch_us."""
    pin_session_conf(spark)
    ev = load(spark, sf_dir, "events")
    tol = _ASOF_NEAREST_TOL_US
    clicks = (ev.where(F.col("event_type") == "click")
              .select(F.col("event_id").alias("click_id"), "user_id",
                      F.unix_micros(F.col("ts").cast("timestamp")).alias("ctus")))
    buys = (ev.where(F.col("event_type") == "purchase")
            .select(F.col("event_id").alias("purchase_id"), "user_id",
                    F.unix_micros(F.col("ts").cast("timestamp")).alias("ptus"),
                    F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / tol)
                    .alias("band")))
    bands = F.explode(F.array(
        F.floor(F.col("ctus") / tol) - 1,
        F.floor(F.col("ctus") / tol),
        F.floor(F.col("ctus") / tol) + 1)).alias("band")
    probe = clicks.select("click_id", "user_id", "ctus", bands)
    d = F.abs(F.col("ptus") - F.col("ctus"))
    best = F.min(F.struct(d.alias("d"), F.col("ptus"),
                          F.col("purchase_id")))
    return (probe.join(buys, ["user_id", "band"])
            .where(d <= tol)
            .groupBy("click_id", "user_id")
            .agg(best.alias("b"))
            .select("click_id", "user_id",
                    F.col("b.purchase_id").alias("purchase_id"),
                    F.col("b.d").cast("long").alias("dist_us")))


_OVL_DAYS = 7           # fulfillment-window length
_OVL_BAND_S = 7 * 86400  # band width = max interval length -> 2 bands/interval


@register("join_interval_overlap", oracle=f"""
WITH iv AS (
    SELECT o_custkey, o_orderkey, o_orderdate AS s,
           o_orderdate + INTERVAL {_OVL_DAYS} DAY AS e
    FROM orders
)
SELECT a.o_custkey AS custkey,
       a.o_orderkey AS order_a, b.o_orderkey AS order_b,
       CAST(date_diff('day', greatest(a.s, b.s), least(a.e, b.e))
            AS BIGINT) AS overlap_days
FROM iv a JOIN iv b
  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
 AND a.s <= b.e AND b.s <= a.e
""")
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-OVERLAP self-join: pairs of the same customer's orders
    whose {_OVL_DAYS}-day fulfillment windows overlap, with the
    overlap length in whole days -- the interval x interval shape
    (meeting conflicts, session-vs-campaign attribution) that
    join_range's point-in-interval banding does not cover.

    Scale shape: banding generalizes -- with band width >= the max
    interval length, any overlapping pair shares the band containing
    a point of the overlap, so each interval explodes to its <= 2
    covering {_OVL_DAYS}-day bands and candidates come from an
    equi-join on (custkey, band), deduped ids-first; the exact
    overlap predicate then verifies. Never a range-only join, never a
    cross product (plan-gated repo-wide). Date arithmetic stays in
    whole days -- exact integers both engines."""
    pin_session_conf(spark)
    o = load(spark, sf_dir, "orders")
    iv = o.select(
        "o_custkey", "o_orderkey",
        F.col("o_orderdate").alias("s"),
        F.date_add(F.col("o_orderdate").cast("date"), _OVL_DAYS)
        .alias("e"))
    epoch_s = F.unix_timestamp(F.col("s").cast("timestamp"))
    band0 = F.floor(epoch_s / _OVL_BAND_S)
    banded = iv.select(
        "o_custkey", "o_orderkey", "s", "e",
        F.explode(F.array(band0, band0 + 1)).alias("band"))
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (a.join(b, (F.col("a.o_custkey") == F.col("b.o_custkey"))
                   & (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.o_orderkey") < F.col("b.o_orderkey")))
            .select(F.col("a.o_custkey").alias("custkey"),
                    F.col("a.o_orderkey").alias("order_a"),
                    F.col("b.o_orderkey").alias("order_b"),
                    F.col("a.s").alias("sa"), F.col("a.e").alias("ea"),
                    F.col("b.s").alias("sb"), F.col("b.e").alias("eb"))
            .dropDuplicates(["order_a", "order_b"]))
    ovl = F.datediff(F.least(F.col("ea").cast("date"),
                             F.col("eb").cast("date")),
                     F.greatest(F.col("sa").cast("date"),
                                F.col("sb").cast("date")))
    return (cand.where((F.col("sa") <= F.col("eb"))
                       & (F.col("sb") <= F.col("ea")))
            .select("custkey", "order_a", "order_b",
                    ovl.cast("long").alias("overlap_days")))


join_interval_overlap.__doc__ = join_interval_overlap.__doc__.replace(
    "{_OVL_DAYS}", str(_OVL_DAYS))
