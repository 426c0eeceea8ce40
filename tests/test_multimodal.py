from __future__ import annotations

import numpy as np

from cim_framework_graph_partitioning_spark.operators.multimodal import (
    _FEATURE_DIM,
    decode_and_featurize,
    frame_sample,
    synthesize_media,
)


def test_media_schema_and_featurize(spark):
    media = synthesize_media(spark, n=30)
    assert set(media.columns) == {"media_id", "kind", "payload", "meta"}
    feats = decode_and_featurize(media).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r.feature) == _FEATURE_DIM
        assert r.n_bytes == 128  # 64-hex sha repeated 4x -> 128 bytes
        assert abs(sum(r.feature) - 1.0) < 1e-9  # L1-normalized
    # deterministic across runs
    feats2 = decode_and_featurize(synthesize_media(spark, n=30)).collect()
    assert {(r.media_id, tuple(r.feature)) for r in feats} == {
        (r.media_id, tuple(r.feature)) for r in feats2
    }


def test_frame_sampling(spark):
    media = synthesize_media(spark, n=30)
    frames = frame_sample(media, every_n=10)
    rows = frames.collect()
    n_videos = media.filter("kind = 'video'").count()
    assert len(rows) == n_videos * 12  # n_frames=120, every 10th -> 12
    assert {r.frame_idx for r in rows} == set(range(0, 120, 10))


def test_empty_payload_handled(spark):
    from pyspark.sql import functions as F
    media = synthesize_media(spark, n=3).withColumn(
        "payload", F.lit(None).cast("binary")
    )
    feats = decode_and_featurize(media).collect()
    assert all(r.n_bytes == 0 and sum(r.feature) == 0.0 for r in feats)
