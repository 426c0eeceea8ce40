"""MJPEG-AVI video codec: bit-exact lossy round trips + real frame
sampling.

Same discipline as the JPEG tests: ``encode_avi_mjpeg`` returns
(payload, expected_frames) with the per-frame quantization loss
replayed, so the lossy VIDEO round trip gets exact-equality assertions
— no tolerance thresholds.
"""

from __future__ import annotations

import numpy as np
import pytest

from cim_framework_graph_partitioning_spark.operators.jpeg import decode_jpeg
from cim_framework_graph_partitioning_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    _FEATURE_DIM,
    _try_decode,
    decode_and_featurize,
    extract_frames,
)
from cim_framework_graph_partitioning_spark.operators.video import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
    parse_avi,
)


def _clip(n_frames=5, h=37, w=29):
    """Deterministic frames with a moving bright square (real motion)."""
    frames = []
    for t in range(n_frames):
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [(yy * 5 + xx * 2) % 256, (255 - yy * 3) % 256, (xx * 7) % 256],
            axis=-1,
        ).astype(np.uint8)
        img[2 + 3 * t : 8 + 3 * t, 2 + 2 * t : 8 + 2 * t] = 250
        frames.append(img)
    return frames


def test_avi_round_trip_bit_exact():
    frames = _clip()
    payload, expected = encode_avi_mjpeg(frames, fps=12.5, quality=85)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    out, fps, n_total = decode_avi_mjpeg(payload)
    assert fps == 12.5 and n_total == len(frames) == len(out)
    for o, e in zip(out, expected):
        assert (o == e).all()
    # strided decode returns every k-th frame, total count unchanged
    out2, _, n2 = decode_avi_mjpeg(payload, sample_every=2)
    assert n2 == 5 and len(out2) == 3
    assert all((a == b).all() for a, b in zip(out2, expected[::2]))
    # container walk alone: raw chunks are standalone baseline JPEGs
    raw, _, w_, h_ = parse_avi(payload)
    assert (w_, h_) == (29, 37)
    assert all(r[:2] == b"\xff\xd8" for r in raw)
    assert (decode_jpeg(raw[3]) == expected[3]).all()


def test_avi_structural_corruption_raises():
    payload, _ = encode_avi_mjpeg(_clip(2), fps=10)
    for bad in [
        b"NOPE",  # not RIFF
        b"RIFF\x10\x00\x00\x00WAVE" + b"\x00" * 8,  # wrong form type
        payload[:60],  # truncated inside hdrl
    ]:
        with pytest.raises(ValueError):
            decode_avi_mjpeg(bad)
    # non-MJPG codec refused: patch both fccHandler and biCompression
    alien = payload.replace(b"MJPG", b"H264")
    with pytest.raises(ValueError, match="MJPG only"):
        decode_avi_mjpeg(alien)
    with pytest.raises(ValueError):
        encode_avi_mjpeg([])  # no frames
    with pytest.raises(ValueError):  # mismatched frame shapes
        encode_avi_mjpeg([np.zeros((8, 8, 3), np.uint8),
                          np.zeros((8, 9, 3), np.uint8)])


def test_riff_dispatch_disambiguates_wav_and_avi():
    from cim_framework_graph_partitioning_spark.operators.multimodal import (
        _video_features,
        _wav_features,
        decode_wav,
        encode_wav,
    )

    avi, expected = encode_avi_mjpeg(_clip(3), fps=24)
    feats = _try_decode(avi)
    assert feats is not None and feats.shape == (_FEATURE_DIM,)
    assert list(feats) == list(_video_features(expected, 24.0, 3))
    assert feats[2] == 3.0 and feats[3] == 24.0  # n_frames, fps lanes
    assert feats[7] > 0.0  # the moving square registers as motion

    t = np.linspace(0, 1, 1600)
    wav = encode_wav(np.sin(2 * np.pi * 440 * t), 16000)
    wfeats = _try_decode(wav)
    assert list(wfeats) == list(_wav_features(*decode_wav(wav)))
    assert wfeats[0] == 16000.0  # sample_rate lane -> took the WAV path

    # corrupt AVI degrades to the fake path (None), not an exception
    assert _try_decode(avi[:40]) is None


def test_video_feature_stride_bounds_pixel_work():
    """Clips longer than the stride budget decode at most
    _VIDEO_SAMPLE_FRAMES frames but still report true totals."""
    from cim_framework_graph_partitioning_spark.operators.multimodal import (
        _VIDEO_SAMPLE_FRAMES,
    )

    n = 2 * _VIDEO_SAMPLE_FRAMES + 3
    frames = [
        np.full((16, 16, 3), (7 * t) % 256, np.uint8) for t in range(n)
    ]
    payload, _ = encode_avi_mjpeg(frames, fps=30)
    feats = _try_decode(payload)
    assert feats[2] == float(n)  # n_frames_total is the real count
    assert feats[4] == pytest.approx(n / 30.0)  # duration from true count


def test_extract_frames_end_to_end(spark):
    frames = _clip(6, h=24, w=16)
    payload, expected = encode_avi_mjpeg(frames, fps=10, quality=90)
    fake_video = b"not-a-real-container" * 4
    media = spark.createDataFrame(
        [
            (1, "video", bytearray(payload), (16, 24, None, 6)),
            (2, "video", bytearray(fake_video), (None, None, None, 99)),
            (3, "audio", bytearray(b"RIFFxxxx"), (None, None, 8000, None)),
        ],
        MEDIA_SCHEMA,
    )
    rows = extract_frames(media, every_n=2).collect()
    # only the real AVI contributes; stub/audio payloads emit nothing
    assert sorted((r.media_id, r.frame_idx) for r in rows) == [
        (1, 0), (1, 2), (1, 4)
    ]
    by_idx = {r.frame_idx: bytes(r.frame_payload) for r in rows}
    for i in (0, 2, 4):
        assert (decode_jpeg(by_idx[i]) == expected[i]).all()
    with pytest.raises(ValueError):
        extract_frames(media, every_n=0)


def test_avi_via_decode_and_featurize_no_fakes(spark):
    """A real AVI payload flows through the mapInPandas pipeline with
    allow_fake=False — the video modality no longer needs the stub."""
    from cim_framework_graph_partitioning_spark.operators.multimodal import (
        _video_features,
    )

    payload, expected = encode_avi_mjpeg(_clip(4, h=16, w=16), fps=8)
    media = spark.createDataFrame(
        [(7, "video", bytearray(payload), (16, 16, None, 4))], MEDIA_SCHEMA
    )
    feats = decode_and_featurize(media, allow_fake=False).collect()
    assert len(feats) == 1
    assert list(feats[0].feature) == list(_video_features(expected, 8.0, 4))
