"""Property-based codec tests: random inputs through every real codec.

No Spark here — these are pure numpy kernels, so hypothesis can afford
many examples. Lossless codecs (BMP, PNG in every depth/interlace/
filter combination, 16-bit PCM WAV) must reproduce the input exactly;
lossy codecs (JPEG, MJPEG-AVI, G.711, ADPCM) must match their
encoder-replayed expectation exactly — the replay contract means even
lossy paths get equality assertions under random inputs.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cim_framework_graph_partitioning_spark.operators.audio import (
    adpcm_decode,
    adpcm_encode,
    alaw_decode,
    alaw_encode,
    encode_wav_adpcm,
    encode_wav_g711,
    ulaw_decode,
    ulaw_encode,
)
from cim_framework_graph_partitioning_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
)
from cim_framework_graph_partitioning_spark.operators.multimodal import (
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
)
from cim_framework_graph_partitioning_spark.operators.video import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
)

SET = settings(max_examples=25, deadline=None)
SET_SLOW = settings(max_examples=8, deadline=None)


@st.composite
def random_image(draw, max_dim=24):
    h = draw(st.integers(min_value=1, max_value=max_dim))
    w = draw(st.integers(min_value=1, max_value=max_dim))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)


@SET
@given(img=random_image())
def test_bmp_lossless_roundtrip(img):
    assert (decode_bmp(encode_bmp(img)) == img).all()


@SET_SLOW
@given(
    img=random_image(max_dim=17),
    ft=st.sampled_from([0, 1, 2, 3, 4, "mixed"]),
    depth=st.sampled_from([8, 16]),
    interlace=st.sampled_from([0, 1]),
)
def test_png_lossless_roundtrip_all_variants(img, ft, depth, interlace):
    out = decode_png(encode_png(img, ft, depth=depth, interlace=interlace))
    assert (out == img).all()


@SET_SLOW
@given(
    img=random_image(max_dim=20),
    quality=st.integers(min_value=5, max_value=100),
    subsample=st.sampled_from(["444", "420"]),
    gray=st.booleans(),
)
def test_jpeg_replay_exact(img, quality, subsample, gray):
    payload, expected = encode_jpeg(
        img, quality=quality, gray=gray, subsample=subsample
    )
    assert (decode_jpeg(payload) == expected).all()


@SET_SLOW
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    n_frames=st.integers(min_value=1, max_value=4),
    fps=st.sampled_from([10.0, 12.5, 30.0]),
)
def test_avi_replay_exact(seed, n_frames, fps):
    rng = np.random.RandomState(seed)
    h, w = int(rng.randint(1, 20)), int(rng.randint(1, 20))
    frames = [rng.randint(0, 256, (h, w, 3), np.uint8) for _ in range(n_frames)]
    payload, expected = encode_avi_mjpeg(frames, fps=fps, quality=80)
    out, got_fps, n = decode_avi_mjpeg(payload)
    assert got_fps == fps and n == n_frames
    assert all((o == e).all() for o, e in zip(out, expected))


@st.composite
def random_audio(draw, max_n=2000):
    n = draw(st.integers(min_value=1, max_value=max_n))
    ch = draw(st.integers(min_value=1, max_value=2))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    return np.random.RandomState(seed).uniform(-1, 1, (n, ch))


@SET
@given(x=random_audio())
def test_wav_pcm16_quantized_roundtrip(x):
    samples, sr = decode_wav(encode_wav(x, 16000))
    assert sr == 16000 and samples.shape == x.shape
    # within the quantizer's contract: half-step rounding plus the
    # asymmetric 32767-encode/32768-decode scale pair
    assert np.abs(samples - x).max() <= 1.5 / 32768.0 + 1e-12


@SET
@given(x=random_audio(), law=st.sampled_from(["ulaw", "alaw"]))
def test_g711_replay_exact(x, law):
    payload, expected = encode_wav_g711(x, 8000, law=law)
    samples, sr = decode_wav(payload)
    assert sr == 8000 and (samples == expected).all()


@SET
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    n=st.integers(min_value=1, max_value=3000),
    block_align=st.sampled_from([16, 64, 256]),
)
def test_adpcm_replay_exact(seed, n, block_align):
    x = np.random.RandomState(seed).uniform(-1, 1, n)
    payload, expected = encode_wav_adpcm(x, 8000, block_align=block_align)
    samples, sr = decode_wav(payload)
    assert sr == 8000 and samples.shape == expected.shape
    assert (samples == expected).all()
    # the raw block layer agrees with the container layer
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int16)
    data, exp16, n_s = adpcm_encode(pcm, block_align)
    assert (adpcm_decode(data, block_align, n_s) == exp16).all()
    assert (exp16.astype("float64") / 32768.0 == expected[:, 0]).all()


@SET
@given(pcm=st.lists(st.integers(min_value=-32768, max_value=32767),
                    min_size=1, max_size=500))
def test_g711_reencode_stability(pcm):
    """Companding is idempotent after one pass: decode∘encode is a
    projection (re-encoding a decoded signal is lossless)."""
    arr = np.array(pcm, dtype=np.int16)
    for enc, dec in [(ulaw_encode, ulaw_decode), (alaw_encode, alaw_decode)]:
        once = dec(enc(arr))
        assert (dec(enc(once)) == once).all()
