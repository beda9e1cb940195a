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


def test_phash_dedup_matches_independent_reimplementation(spark):
    """Verify against a pure-Python reimplementation of the pooling +
    dHash: the result must EQUAL the exhaustive pair set within the
    radius (the 8x8-bit banding guarantee is exact: pigeonhole covers
    radius PHASH_BANDS-1 = 7 >= PHASH_RADIUS) with matching Hamming
    distances. Determinism across runs rides along."""
    import duckdb

    from recommendation_system_spark_ml_spark.operators.multimodal import (
        PHASH_BANDS, PHASH_BITS, PHASH_RADIUS, multimodal_dedup_phash,
    )

    def phash(p: bytes) -> int:
        nb = PHASH_BITS + 1
        step = max(len(p) // nb, 1)
        pooled = [sum(p[i * step:(i + 1) * step])
                  / max(len(p[i * step:(i + 1) * step]), 1)
                  for i in range(nb)]
        return sum(1 << i for i in range(PHASH_BITS)
                   if pooled[i + 1] > pooled[i])

    texts = dict(duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet'").fetchall())
    hashes = {d: phash(t.encode("utf-8")) for d, t in texts.items()}

    rows = multimodal_dedup_phash(spark, SF_SMOKE).collect()
    got = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    assert got, "no phash near-dups found"
    for (a, b), h in got.items():
        assert 0 <= h <= PHASH_RADIUS
        assert h == bin(hashes[a] ^ hashes[b]).count("1"), (a, b)
    assert PHASH_RADIUS <= PHASH_BANDS - 1, "banding no longer exact"
    ids = sorted(hashes)
    exhaustive = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
                  if bin(hashes[a] ^ hashes[b]).count("1") <= PHASH_RADIUS}
    assert set(got) == exhaustive, (
        f"banded result != exhaustive pair set: "
        f"missing={exhaustive - set(got)} extra={set(got) - exhaustive}")
    again = {(r.doc_a, r.doc_b): r.hamming
             for r in multimodal_dedup_phash(spark, SF_SMOKE).collect()}
    assert again == got
