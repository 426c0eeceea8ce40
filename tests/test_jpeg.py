"""Baseline JPEG codec: bit-exact lossy round trips.

The encoder returns (payload, expected) where expected replays the
quantization loss through the decoder's own pipeline — so a LOSSY codec
still gets exact-equality tests (no tolerance thresholds to hide bugs
behind).
"""

from __future__ import annotations

import numpy as np
import pytest

from cim_framework_graph_partitioning_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 5 + xx * 2) % 256, (255 - yy * 3) % 256, (xx * 7) % 256],
        axis=-1,
    ).astype(np.uint8)


def test_jpeg_bit_exact_across_qualities_and_shapes():
    img = _gradient(37, 29)  # non-multiple-of-8 dims exercise edge padding
    prev_err = None
    for q in (10, 50, 90, 100):
        payload, expected = encode_jpeg(img, quality=q)
        assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
        out = decode_jpeg(payload)
        assert out.shape == img.shape
        assert (out == expected).all(), f"not bit-exact at q={q}"
        err = float(np.abs(out.astype(int) - img.astype(int)).mean())
        if prev_err is not None:
            assert err <= prev_err + 1e-9  # loss shrinks as quality rises
        prev_err = err
    assert prev_err < 0.1  # q=100 is near-lossless on a smooth image

    # worst-case entropy content: uniform noise hits deep (run, size)
    # symbols in the huffman tables
    noise = np.random.RandomState(3).randint(0, 256, (24, 16, 3), np.uint8)
    p, e = encode_jpeg(noise, quality=95)
    assert (decode_jpeg(p) == e).all()


def test_jpeg_grayscale_single_component():
    img = _gradient(16, 24)
    payload, expected = encode_jpeg(img, quality=80, gray=True)
    out = decode_jpeg(payload)
    assert out.shape == (16, 24, 3)
    assert (out == expected).all()
    # grayscale contract: all three BGR channels identical
    assert (out[..., 0] == out[..., 1]).all() and (out[..., 1] == out[..., 2]).all()


def test_jpeg_structural_corruption_raises():
    payload, _ = encode_jpeg(_gradient(16, 16), quality=75)
    for bad in [
        b"NOPE",                      # not a JPEG
        b"\xff\xd8junk",              # marker misalignment
        payload[:40],                 # truncated mid-segment
        payload[:2] + payload[12:],   # resumes inside APP0 body: misaligned
    ]:
        with pytest.raises(ValueError):
            decode_jpeg(bad)
    # flipping SOF0 (0xC0) to SOF2 (0xC2) leaves a structurally invalid
    # stream: the baseline SOS declares Ss=0 with Se=63, which is not a
    # legal progressive DC scan
    prog = bytearray(payload)
    idx = bytes(prog).find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(prog))
    # arithmetic coding (SOF9) stays refused
    arith = bytearray(payload)
    arith[idx + 1] = 0xC9
    with pytest.raises(ValueError):
        decode_jpeg(bytes(arith))
    # NOTE: corruption inside the entropy scan that still forms valid
    # huffman codes is undetectable by design (JPEG has no checksum) —
    # not tested as a raise.


def test_jpeg_short_segment_bodies_raise_valueerror():
    """Self-consistent segment lengths with too-short bodies must raise
    ValueError (the _try_decode dirty-data contract), never IndexError
    (r4 ADVICE: one IndexError record kills the whole mapInPandas
    task). Each case declares a body shorter than the fields the
    segment header promises."""
    from cim_framework_graph_partitioning_spark.operators.multimodal import (
        _try_decode,
    )

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    soi = b"\xff\xd8"
    # SOF0 with a 5-byte body (needs >= 6, then 6 + 3*n_comp)
    cases = [
        soi + seg(0xC0, b"\x08\x00\x10\x00\x10"),
        # SOF0 claiming 3 components but carrying bytes for one
        soi + seg(0xC0, b"\x08\x00\x10\x00\x10\x03\x01\x11\x00"),
        # empty SOS body after a valid minimal frame header
        soi
        + seg(0xC4, bytes([0x00] + [0] * 15 + [1] + [0]))
        + seg(0xDB, b"\x00" + b"\x01" * 64)
        + seg(0xC0, b"\x08\x00\x10\x00\x10\x01\x01\x11\x00")
        + seg(0xDA, b""),
        # SOS claiming 1 scan component with no selector bytes
        soi
        + seg(0xC0, b"\x08\x00\x10\x00\x10\x01\x01\x11\x00")
        + seg(0xDA, b"\x01"),
        # truncated DQT (declares a table, carries 3 bytes)
        soi + seg(0xDB, b"\x00\x01\x02"),
        # truncated DHT (header only, no 16 length bytes)
        soi + seg(0xC4, b"\x00\x01"),
    ]
    for bad in cases:
        with pytest.raises(ValueError):
            decode_jpeg(bad)
        # and the dispatch-level contract: degrade, don't propagate
        assert _try_decode(bad) is None


def test_jpeg_via_multimodal_dispatch(spark):
    """Real JPEG payloads flow through decode_and_featurize with
    allow_fake=False; since JPEG is lossy, the contract is that the
    features derive exactly from the EXPECTED (post-quantization)
    pixels the encoder replays."""
    from cim_framework_graph_partitioning_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _image_features,
        decode_and_featurize,
    )

    img = np.full((8, 8, 3), 77, dtype=np.uint8)
    payload, expected = encode_jpeg(img, quality=90)
    media = spark.createDataFrame(
        [(0, "image", bytearray(payload), (8, 8, None, None))], MEDIA_SCHEMA
    )
    feats = decode_and_featurize(media, allow_fake=False).collect()
    assert len(feats) == 1
    assert list(feats[0].feature) == list(_image_features(expected))


def test_jpeg_420_subsampling_bit_exact():
    """4:2:0 — the layout real cameras/web encoders emit: 2x2 luma
    blocks per MCU, box-filtered chroma, nearest upsampling. Bit-exact
    against the encoder's replayed expectation at odd and 16-multiple
    dimensions; chroma loss exceeds 4:4:4 at equal quality."""
    img = _gradient(37, 29)
    p444, e444 = encode_jpeg(img, quality=90, subsample="444")
    p420, e420 = encode_jpeg(img, quality=90, subsample="420")
    assert (decode_jpeg(p420) == e420).all()
    assert len(p420) < len(p444)  # half the chroma blocks
    err444 = np.abs(e444.astype(int) - img.astype(int)).mean()
    err420 = np.abs(e420.astype(int) - img.astype(int)).mean()
    assert err420 > err444  # subsampling is lossier

    noise = np.random.RandomState(5).randint(0, 256, (32, 48, 3), np.uint8)
    p, e = encode_jpeg(noise, quality=85, subsample="420")
    assert (decode_jpeg(p) == e).all()
    p, e = encode_jpeg(img[:1, :1], quality=90, subsample="420")  # 1x1 edge
    assert (decode_jpeg(p) == e).all()


def test_jpeg_progressive_bit_exact_all_modes():
    """SOF2 with both progression axes — spectral selection (DC scan +
    AC bands 1-5/6-63 per component) and successive approximation
    (Al=1 firsts, then DC and AC refinement scans). Quantization is
    shared with the baseline encoder, so progressive round-trips are
    bit-exact against the replayed expectation AND against the
    baseline decode of the same image."""
    img = _gradient(37, 29)  # smooth content: long cross-block EOB runs
    for kwargs in ({}, {"gray": True}, {"subsample": "420"}):
        for q in (10, 50, 90):
            payload, expected = encode_jpeg_progressive(img, quality=q, **kwargs)
            assert b"\xff\xc2" in payload  # SOF2 frame
            out = decode_jpeg(payload)
            assert out.shape == img.shape
            assert (out == expected).all(), f"not bit-exact at q={q} {kwargs}"

    pb, eb = encode_jpeg(img, quality=85)
    pp, ep = encode_jpeg_progressive(img, quality=85)
    assert (eb == ep).all()  # identical quantization
    assert (decode_jpeg(pp) == decode_jpeg(pb)).all()


def test_jpeg_progressive_noise_and_edge_sizes():
    """Uniform noise maximizes refinement traffic (dense newly-nonzero
    coefficients, ZRL-in-refine, correction-bit buffering); odd sizes
    exercise the padded-vs-actual grid split where 4:2:0 luma AC scans
    cover fewer blocks than the interleaved DC scan."""
    rng = np.random.RandomState(7)
    for hw in [(8, 8), (17, 9), (16, 32), (33, 31), (1, 1)]:
        noise = rng.randint(0, 256, hw + (3,), np.uint8)
        for sub in ("444", "420"):
            payload, expected = encode_jpeg_progressive(
                noise, quality=92, subsample=sub
            )
            assert (decode_jpeg(payload) == expected).all(), (hw, sub)


def test_jpeg_progressive_corruption_raises():
    payload, _ = encode_jpeg_progressive(_gradient(16, 16), quality=75)
    for bad in [
        payload[: len(payload) // 2],  # truncated mid-scan
        payload[:40],                  # truncated mid-segment
    ]:
        with pytest.raises(ValueError):
            decode_jpeg(bad)


def test_jpeg_progressive_via_multimodal_dispatch(spark):
    """Progressive payloads take the real decode path in
    decode_and_featurize (decodability-based dispatch, no fake
    fallback needed)."""
    from cim_framework_graph_partitioning_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _image_features,
        decode_and_featurize,
    )

    img = _gradient(24, 16)
    payload, expected = encode_jpeg_progressive(img, quality=90)
    media = spark.createDataFrame(
        [(0, "image", bytearray(payload), (24, 16, None, None))], MEDIA_SCHEMA
    )
    feats = decode_and_featurize(media, allow_fake=False).collect()
    assert len(feats) == 1
    assert list(feats[0].feature) == list(_image_features(expected))
