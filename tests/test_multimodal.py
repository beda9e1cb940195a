"""Multimodal plumbing: binary payload + struct metadata must survive a
parquet round-trip byte-exactly, and the Arrow-batched feature extractor
must produce normalized fixed-dim vectors."""

import tempfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from recommendation_system_spark_ml_spark.operators.multimodal import (
    FEATURE_DIM, extract_features, media_table)


def test_payload_roundtrip_parquet(spark):
    media = media_table(spark, SF_SMOKE)
    with tempfile.TemporaryDirectory() as d:
        media.write.mode("overwrite").parquet(d)
        back = spark.read.parquet(d)
        assert back.dtypes == media.dtypes  # nullability may differ
        # digest integrity: recompute sha over the payload read back
        bad = back.where(F.sha2("payload", 256) != F.col("meta.digest")).count()
        assert bad == 0
        assert back.count() == media.count()


def test_feature_extraction_shape_and_norm(spark):
    feats = extract_features(media_table(spark, SF_SMOKE))
    rows = feats.limit(20).collect()
    assert rows
    for r in rows:
        assert len(r.features) == FEATURE_DIM
        assert sum(r.features) == pytest.approx(1.0, abs=1e-3)
        assert r.n_bytes > 0


def test_resize_fixed_dim_and_mean_preserved(spark):
    """Resize must emit a constant-length vector whose pooled mean
    tracks the payload's byte mean (exact when RESIZE_DIM | n)."""
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE
    from recommendation_system_spark_ml_spark.operators.multimodal import (
        multimodal_resize, RESIZE_DIM)
    out = multimodal_resize(spark, SF_SMOKE)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.out_dim == RESIZE_DIM for r in rows)
    # ASCII text payload byte means sit in a narrow band; pooled mean
    # must land there too
    assert all(60 <= r.pooled_mean <= 125 for r in rows)
