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

def test_wav_roundtrip_and_golden_samples():
    """Pure-python WAV codec: encode a known PCM signal, decode the REAL
    RIFF byte-stream back, compare to quantization error; golden
    features (sample_rate, channels, frames, duration, RMS, ZCR)."""
    import pytest

    from cim_framework_graph_partitioning_spark.operators.multimodal import (
        _wav_features,
        decode_wav,
        encode_wav,
    )

    t = np.arange(1600) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 440.0 * t)  # 100 ms of A440 at 16 kHz
    payload = encode_wav(sig, 16000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    out, sr = decode_wav(payload)
    assert sr == 16000 and out.shape == (1600, 1)
    assert np.abs(out[:, 0] - sig).max() < 1.0 / 32767  # 16-bit quantization

    feats = _wav_features(out, sr)
    assert feats[0] == 16000.0 and feats[1] == 1.0 and feats[2] == 1600.0
    assert abs(feats[3] - 0.1) < 1e-12  # duration
    assert abs(feats[4] - 0.5 / np.sqrt(2)) < 1e-3  # RMS of a 0.5 sine
    # 440 Hz at 16 kHz: 2 crossings/period * 440 * 0.1 s / 1600 samples
    assert abs(feats[5] - 2 * 440 * 0.1 / 1600) < 5e-3

    # stereo survives the round trip with channels intact
    stereo = np.stack([sig, -sig], axis=1)
    out2, _ = decode_wav(encode_wav(stereo, 8000))
    assert out2.shape == (1600, 2)
    assert np.abs(out2 - stereo).max() < 1.0 / 32767

    with pytest.raises(ValueError):
        decode_wav(b"RIFX" + b"\x00" * 64)
    with pytest.raises(ValueError):
        decode_wav(payload[:30])  # truncated


def test_real_wav_decode_end_to_end(spark):
    """Media rows carrying real WAV payloads flow through
    decode_and_featurize with allow_fake=False and produce
    signal-derived features."""
    from cim_framework_graph_partitioning_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_wav,
    )

    rows = []
    for i in range(4):
        sig = np.full(800, 0.1 * (i + 1))  # DC signal, known RMS
        rows.append((i, "audio", bytearray(encode_wav(sig, 8000)),
                     (None, None, 8000, None)))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r.media_id: list(r.feature)
             for r in decode_and_featurize(media, allow_fake=False).collect()}
    assert len(feats) == 4
    for i, f in feats.items():
        assert f[0] == 8000.0 and f[1] == 1.0 and f[2] == 800.0
        assert abs(f[4] - 0.1 * (i + 1)) < 1e-3  # RMS of a DC signal


def test_corrupt_magic_falls_back_to_fake(spark):
    """A payload that starts 'BM'/'RIFF' but is NOT decodable must take
    the fake path under allow_fake=True (regression: it used to raise
    out of the kernel and fail the whole job), and raise under
    allow_fake=False."""
    import pytest

    from cim_framework_graph_partitioning_spark.operators.multimodal import (
        MEDIA_SCHEMA,
    )

    rows = [
        (0, "image", bytearray(b"BM" + b"\x7f" * 100), (None,) * 4),
        (1, "audio", bytearray(b"RIFF" + b"\x7f" * 100), (None,) * 4),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = decode_and_featurize(media, allow_fake=True).collect()
    assert len(feats) == 2  # job survives, fake features emitted
    assert all(abs(sum(r.feature) - 1.0) < 1e-9 for r in feats)
    with pytest.raises(Exception, match="NotImplementedError|not decodable"):
        decode_and_featurize(media, allow_fake=False).collect()
