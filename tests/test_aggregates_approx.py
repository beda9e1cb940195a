"""HLL sketch accuracy: approx_count_distinct must stay within 5% of
the exact distinct count at the configured 2% rsd."""

from tests.conftest import SF_SMOKE


def test_approx_distinct_within_tolerance(spark):
    """The 5% gate now rides IN the query as the oracle-pinned
    contract boolean (promotion, r5 verdict task #5); the test keeps
    an independent recomputation so a broken boolean expression
    cannot vacuously pass."""
    from pyspark.sql import functions as F

    from recommendation_system_spark_ml_spark.operators.aggregates import agg_approx
    from recommendation_system_spark_ml_spark.sources.catalog import load

    rows = agg_approx(spark, SF_SMOKE).collect()
    assert rows and all(r.approx_within_10pct for r in rows), rows
    indep = {r.l_returnflag: (r.a, r.e) for r in
             load(spark, SF_SMOKE, "lineitem").groupBy("l_returnflag")
             .agg(F.approx_count_distinct("l_partkey", rsd=0.02).alias("a"),
                  F.countDistinct("l_partkey").alias("e")).collect()}
    for flag, (a, e) in indep.items():
        assert abs(a - e) / e <= 0.05, f"{flag}: {a} vs {e}"


def test_stratified_sample_fractions(spark):
    """The hash-gate sample must hit each stratum's target fraction
    within the Bernoulli 6-sigma band (the gate is uniform, so observed
    fractions concentrate exactly like sampleBy's)."""
    import math

    from pyspark.sql import functions as F

    from recommendation_system_spark_ml_spark.operators.relational import (
        sample_stratified)
    from recommendation_system_spark_ml_spark.sources.catalog import load

    target = {"A": 0.5, "N": 0.1, "R": 0.25}
    pop = {r.l_returnflag: r.n for r in
           load(spark, SF_SMOKE, "lineitem").groupBy("l_returnflag")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r.l_returnflag: r.n for r in
           sample_stratified(spark, SF_SMOKE).groupBy("l_returnflag")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    for flag, frac in target.items():
        got_frac = got.get(flag, 0) / pop[flag]
        sigma = math.sqrt(frac * (1 - frac) / pop[flag])
        assert abs(got_frac - frac) <= 6 * sigma + 1e-9, \
            f"{flag}: {got_frac} vs {frac}"


def test_approx_percentile_within_rank_tolerance(spark):
    """The sketch twin of agg_percentile: approx_percentile's t-digest
    answer must land within 5% relative error of the exact percentile
    -- the bound that licenses the swap at 100 TB."""
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE
    from recommendation_system_spark_ml_spark.sources.catalog import load

    li = load(spark, SF_SMOKE, "lineitem")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.05, row


def test_hll_mergeable_union_within_tolerance(spark):
    """Merged shard sketches must estimate the global distinct within
    5% -- the property that licenses sketch persistence + merge."""
    from recommendation_system_spark_ml_spark.operators.aggregates import (
        agg_hll_mergeable)
    from tests.conftest import SF_SMOKE
    rows = agg_hll_mergeable(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.shard_within_10pct and r.merged_within_10pct, r
        assert r.exact_global >= r.exact_shard > 0, r


def test_count_min_sketch_one_sided_bound(spark):
    """CMS guarantees estimate >= true count; with eps=0.001 over
    ~1.5k rows the overestimate must be tiny."""
    from recommendation_system_spark_ml_spark.operators.aggregates import (
        agg_count_min_sketch)
    from tests.conftest import SF_SMOKE
    rows = agg_count_min_sketch(spark, SF_SMOKE).collect()
    assert len(rows) >= 2
    for r in rows:
        assert r.cms_overestimates and r.cms_within_slack, r


def test_approx_percentile_within_rank_error(spark):
    """approx_percentile's rank-error contract: with accuracy=10000 the
    reported median must lie between the exact p49 and p51 of its
    group."""
    from pyspark.sql import functions as F

    from recommendation_system_spark_ml_spark.operators.aggregates import (
        agg_approx_percentile)
    from recommendation_system_spark_ml_spark.sources.catalog import load
    from tests.conftest import SF_SMOKE

    rows = agg_approx_percentile(spark, SF_SMOKE).collect()
    # the r5 driver crash was an array<double> cell: every column must
    # now be a scalar, the exact quartiles ordered, and the contract
    # booleans true (they carry the p49..p51 rank-band gate in-query)
    for r in rows:
        assert isinstance(r.p25_exact, float), type(r.p25_exact)
        assert r.p25_exact <= r.p50_exact <= r.p75_exact, r
        assert r.p50_in_rank_band and r.quartiles_in_rank_band, r
    # independent recomputation so a broken boolean cannot vacuously
    # pass: the sketch median really is inside the exact p49..p51 band
    got = {r.l_returnflag: r.a for r in
           (load(spark, SF_SMOKE, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.expr("approx_percentile(l_extendedprice, 0.5, 10000)")
                 .alias("a")).collect())}
    bands = (load(spark, SF_SMOKE, "lineitem")
             .groupBy("l_returnflag")
             .agg(F.expr("percentile(l_extendedprice, 0.49)").alias("lo"),
                  F.expr("percentile(l_extendedprice, 0.51)").alias("hi"))
             .collect())
    for r in bands:
        assert r.lo <= got[r.l_returnflag] <= r.hi, \
            f"{r.l_returnflag}: {got[r.l_returnflag]} outside [{r.lo}, {r.hi}]"


def test_approx_percentile_bucket_lift_parity(spark, monkeypatch):
    """r11 focused test for the two-level rank selection: force the
    range-bucket count tiny so every group's distinct prices SPAN
    multiple buckets at the smoke SF (with the default 1024 buckets a
    small corpus can land in few), and assert the bucket-lifted order
    statistics equal the single-expression exact percentiles -- the
    cross-bucket offset arithmetic is exactly what this exercises."""
    from pyspark.sql import functions as F

    from recommendation_system_spark_ml_spark.operators import aggregates
    from recommendation_system_spark_ml_spark.sources.catalog import load

    monkeypatch.setattr(aggregates, "_PCTL_BUCKETS", 3)
    rows = {r.l_returnflag: r for r in
            aggregates.agg_approx_percentile(spark, SF_SMOKE).collect()}
    exact = (load(spark, SF_SMOKE, "lineitem")
             .groupBy("l_returnflag")
             .agg(*[F.round(F.expr(
                 f"percentile(l_extendedprice, 0.{q})"), 4).alias(f"p{q}")
                 for q in (25, 50, 75)]).collect())
    assert exact
    for e in exact:
        r = rows[e.l_returnflag]
        assert (r.p25_exact, r.p50_exact, r.p75_exact) == \
            (e.p25, e.p50, e.p75), (e.l_returnflag, r, e)


def test_kmv_jaccard_error_bound(spark):
    """Bottom-k sketch accuracy contract: with k=256 the standard
    error is ~1/sqrt(k) ~ 0.0625; every pair's estimate must land
    within 4 sigma (0.25) of the exact Jaccard, and typically far
    closer (observed max |err| ~ 0.04 at sf0.01)."""
    from recommendation_system_spark_ml_spark.operators.aggregates import (
        agg_kmv_jaccard)
    from tests.conftest import SF_SMOKE

    rows = agg_kmv_jaccard(spark, SF_SMOKE).collect()
    assert len(rows) == 10  # C(5,2) priority pairs
    for r in rows:
        err = abs(r.kmv_jaccard - r.exact_jaccard)
        assert err <= 0.25, (r.prio_a, r.prio_b, err)


def test_sliding_distinct_hll_tracks_exact(spark):
    """The HLL sliding-distinct swap must estimate every observed
    window within 5% of the exact operator (lgConfigK=12 -> ~1.6%
    standard error) and cover exactly the same window domain."""
    from tests.conftest import SF_SMOKE
    from recommendation_system_spark_ml_spark.registry import all_specs

    specs = all_specs()
    exact = {r.bucket_ts: r.users_24h for r in
             specs["window_sliding_distinct"].fn(spark, SF_SMOKE).collect()}
    est = {r.bucket_ts: (r.users_24h_exact, r.est_within_10pct) for r in
           specs["window_sliding_distinct_hll"].fn(spark, SF_SMOKE).collect()}
    assert set(est) == set(exact)
    for w, n in exact.items():
        n_inline, within = est[w]
        # the checked query's inline exact twin must agree with the
        # standalone exact operator, and its contract boolean holds
        assert n_inline == n, (w, n, n_inline)
        assert within, (w, n)
