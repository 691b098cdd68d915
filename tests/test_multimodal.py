"""Multimodal plumbing tests: schema, batch shapes, stub contracts."""

from __future__ import annotations

import pytest

from sql_database_engine_spark.operators import multimodal as mm
from .conftest import SF_SMOKE


def test_decode_stub_contract():
    out = mm.decode_and_featurize(b"abc", "image")
    assert out["feat_dim"] == 8 and out["feat_mean"] > 0
    with pytest.raises(NotImplementedError):
        mm.decode_and_featurize(b"abc", "hologram")


def test_features_pipeline_schema_and_rows(spark):
    df = mm.multimodal_features(spark, SF_SMOKE)
    assert df.columns == ["doc_id", "media_type", "n_bytes",
                          "content_hash", "feat_mean", "feat_dim"]
    rows = df.collect()
    assert len(rows) == 500
    assert all(len(r.content_hash) == 64 and r.n_bytes > 0 for r in rows)


def test_frame_sample_fanout(spark):
    media = mm.typed_media_table(spark, SF_SMOKE)
    n_videos = media.filter("media_type = 'video'").count()
    frames = mm.multimodal_frame_sample(spark, SF_SMOKE)
    got = frames.collect()
    # every video emits >= 1 frame; every 5th frame kept
    assert len({r.doc_id for r in got}) == n_videos
    assert len(got) >= n_videos
    assert all(r.frame_idx % 5 == 0 for r in got)
