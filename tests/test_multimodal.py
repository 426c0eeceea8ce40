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


def test_bmp_roundtrip_and_golden_pixels():
    """Pure-numpy BMP codec: encode known pixels, decode a REAL file
    byte-stream back, compare exactly (incl. 4-byte row padding with a
    non-multiple-of-4 width and bottom-up row order)."""
    from cim_framework_graph_partitioning_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(5, 3, 3), dtype=np.uint8)  # w=3 → pad
    blob = decode_bmp(encode_bmp(img))
    assert blob.shape == (5, 3, 3)
    assert (blob == img).all()

    # golden: hand-built 2x2 with known corner colors (BGR)
    golden = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
        dtype=np.uint8,
    )
    payload = encode_bmp(golden)
    assert payload[:2] == b"BM"
    out = decode_bmp(payload)
    assert (out[0, 0] == [255, 0, 0]).all()  # top-left blue
    assert (out[1, 1] == [255, 255, 255]).all()  # bottom-right white

    import pytest

    with pytest.raises(ValueError):
        decode_bmp(b"NOPE" + b"\x00" * 64)
    with pytest.raises(ValueError):
        decode_bmp(payload[:20])  # truncated


def test_real_bmp_decode_end_to_end(spark):
    """A media table whose image payloads are real BMP files must flow
    through decode_and_featurize with allow_fake=False (the codec-less
    raise only guards NON-BMP payloads) and produce pixel-derived
    features: [w, h, mean BGR, ...]."""
    from cim_framework_graph_partitioning_spark.operators.multimodal import (
        encode_bmp,
    )

    rows = []
    for i in range(6):
        img = np.full((4, 7, 3), i * 20, dtype=np.uint8)
        rows.append((i, "image", bytearray(encode_bmp(img)),
                     (7, 4, None, None)))
    from cim_framework_graph_partitioning_spark.operators.multimodal import (
        MEDIA_SCHEMA,
    )
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r.media_id: list(r.feature)
             for r in decode_and_featurize(media, allow_fake=False).collect()}
    assert len(feats) == 6
    for i, f in feats.items():
        assert f[0] == 7.0 and f[1] == 4.0  # width, height from pixels
        assert abs(f[2] - i * 20) < 1e-9  # mean B of a constant image
        assert abs(f[5]) < 1e-9  # std of a constant image

    # mixed batch with a non-BMP payload must raise without allow_fake
    import pytest

    bad = spark.createDataFrame(
        [(99, "image", bytearray(b"JUNKJUNK" * 10), (None, None, None, None))],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="NotImplementedError|non-BMP"):
        decode_and_featurize(media.unionByName(bad), allow_fake=False).collect()
