"""Tests for multimodal binary-column plumbing."""

from __future__ import annotations

import pytest

from hadoop_and_spark_spark.operators import multimodal
from hadoop_and_spark_spark.oracle import compare


@pytest.mark.parametrize("name", sorted(multimodal.QUERIES))
def test_multimodal_vs_oracle(spark, sf_dir, name):
    ok, msg = compare(
        spark, sf_dir, multimodal.QUERIES[name], multimodal.ORACLE_SQL[name]
    )
    assert ok, f"{name}: {msg}"


def test_media_column_is_binary(spark, sf_dir):
    """The plumbing contract: media rides through Arrow as binary."""
    from pyspark.sql import types as T

    df = multimodal._media_table(spark, sf_dir)
    assert isinstance(df.schema["media"].dataType, T.BinaryType)
    assert set(
        r.media_type for r in df.select("media_type").distinct().collect()
    ) == set(multimodal._TYPES)


def test_decode_real_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal._decode_real(b"\x89PNG", "image")


def test_frames_respect_stride_and_bounds(spark, sf_dir):
    meta = {
        r.doc_id: r.n_frames
        for r in multimodal.multimodal_decode(spark, sf_dir).collect()
    }
    for r in multimodal.multimodal_frames(spark, sf_dir).collect():
        assert r.frame_idx % multimodal.FRAME_STRIDE == 0
        assert 0 <= r.frame_idx < meta[r.doc_id]


def test_features_are_normalized_histograms(spark, sf_dir):
    """Every feature vector sums to 1 (non-empty blob) and has
    FEAT_BUCKETS non-negative components."""
    rows = multimodal.multimodal_feature_vectors(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert len(r.features) == multimodal.FEAT_BUCKETS
        assert all(x >= 0 for x in r.features)
        if r.n_bytes > 0:
            assert abs(sum(r.features) - 1.0) < 1e-9


def test_features_explode_matches_vectors(spark, sf_dir):
    """The registered (driver-checkable) exploded form is exactly the
    posexplode of the array form — same values, FEAT_BUCKETS rows per
    doc."""
    vecs = {
        r.doc_id: r.features
        for r in multimodal.multimodal_feature_vectors(spark, sf_dir).collect()
    }
    rows = multimodal.multimodal_features(spark, sf_dir).collect()
    assert len(rows) == len(vecs) * multimodal.FEAT_BUCKETS
    for r in rows:
        assert r.share == vecs[r.doc_id][r.bucket]
