"""Semantic checks for the r6 operator wave, beyond the oracle-hash
gate in test_oracle_parity.py: closed-form identities, completeness
invariants, and boundary semantics that a hash match alone would not
explain if they ever broke."""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_anisotropy_closed_form_matches_brute_force(spark):
    """(||sum(u)||^2 - n) / (n(n-1)) must equal the literal average
    over all pairs of normalized-vector cosines."""
    from recommendation_system_spark_ml_spark.operators.similarity import (
        vec_anisotropy_report)
    from recommendation_system_spark_ml_spark.sources.catalog import load

    row = vec_anisotropy_report(spark, SF_SMOKE).first()
    vecs = [r.embedding for r in
            load(spark, SF_SMOKE, "embeddings").collect()]
    unit = []
    for v in vecs:
        nrm = math.sqrt(sum(float(x) * float(x) for x in v))
        if nrm > 0:
            unit.append([float(x) / nrm for x in v])
    n = len(unit)
    assert row.n_vectors == n
    pair_sum = 0.0
    for i in range(n):
        for j in range(i + 1, n):
            pair_sum += sum(a * b for a, b in zip(unit[i], unit[j]))
    brute = pair_sum / (n * (n - 1) / 2)  # avg over n(n-1)/2 pairs
    assert row.avg_pairwise_cosine == pytest.approx(brute, abs=1e-4)
    assert 0.0 <= row.centroid_norm <= 1.0 + 1e-9


def test_cluster_size_dist_accounts_for_every_doc(spark):
    """The histogram must partition the corpus: sum(n_docs) equals the
    document count and n_docs = cluster_size * n_clusters per row."""
    from recommendation_system_spark_ml_spark.operators.dedup import (
        dedup_cluster_size_dist)
    from recommendation_system_spark_ml_spark.sources.catalog import load

    rows = dedup_cluster_size_dist(spark, SF_SMOKE).collect()
    total = load(spark, SF_SMOKE, "documents").count()
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        assert r.n_docs == r.cluster_size * r.n_clusters


def test_rfm_quintiles_rank_the_right_way(spark):
    """Quintile 1 is best on each axis: the highest spender carries
    m_q = 1, the most recent purchaser r_q = 1, and every quintile
    lands in 1..5 with balanced (ntile) sizes."""
    from recommendation_system_spark_ml_spark.operators.aggregates import (
        agg_rfm_scores)

    rows = agg_rfm_scores(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 1 <= r.r_q <= 5 and 1 <= r.f_q <= 5 and 1 <= r.m_q <= 5
        assert r.rfm_code == r.r_q * 100 + r.f_q * 10 + r.m_q
        assert r.recency_us >= 0
    top_spender = max(rows, key=lambda r: (r.monetary_cents, -r.user_id))
    assert top_spender.m_q == 1
    most_recent = min(rows, key=lambda r: (r.recency_us, r.user_id))
    assert most_recent.r_q == 1
    # ntile balance: sizes differ by at most one
    from collections import Counter
    sizes = Counter(r.r_q for r in rows)
    assert max(sizes.values()) - min(sizes.values()) <= 1


def test_calendar_profile_shape_and_peaks(spark):
    """Cells stay inside the 7x24 calendar, exactly one peak per
    day-of-week present, and event totals add back to the non-NULL-ts
    event count."""
    from recommendation_system_spark_ml_spark.operators.timeseries import (
        ts_calendar_profile)
    from recommendation_system_spark_ml_spark.sources.catalog import load

    rows = ts_calendar_profile(spark, SF_SMOKE).collect()
    assert rows
    assert all(0 <= r.dow <= 6 and 0 <= r.hour <= 23 for r in rows)
    dows = {r.dow for r in rows}
    peaks = [r for r in rows if r.is_dow_peak == 1]
    assert len(peaks) == len(dows)
    n_ts = (load(spark, SF_SMOKE, "events")
            .where(F.col("ts").isNotNull()).count())
    assert sum(r.n_events for r in rows) == n_ts
