"""Compressed-audio codecs: G.711 companding bijections + bit-exact
IMA ADPCM round trips through the WAV container.

Same discipline as the JPEG/MJPEG tests: lossy encoders replay their
own reconstruction, so every round trip is an exact-equality assertion.
"""

from __future__ import annotations

import numpy as np
import pytest

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
from cim_framework_graph_partitioning_spark.operators.multimodal import (
    _try_decode,
    _wav_features,
    decode_wav,
)


def _tone(n=4000, sr=8000, f=440.0, amp=0.7):
    t = np.arange(n) / sr
    return amp * np.sin(2 * np.pi * f * t)


def test_g711_all_codes_bijection():
    """encode(decode(code)) == code for every one of the 256 codes —
    the standard self-consistency identity of both companding laws.
    The single exception is real G.711, not a codec bug: μ-law has TWO
    zero codes (0xFF positive zero, 0x7F negative zero); both decode
    to 0, which re-encodes canonically as 0xFF."""
    codes = np.arange(256, dtype=np.uint8)
    back = ulaw_encode(ulaw_decode(codes))
    neg_zero = codes == 0x7F
    assert (back[~neg_zero] == codes[~neg_zero]).all()
    assert ulaw_decode(np.array([0x7F], np.uint8))[0] == 0
    assert back[0x7F] == 0xFF
    assert (alaw_encode(alaw_decode(codes)) == codes).all()


def test_g711_companding_error_profile():
    """Companding is logarithmic: relative error bounded for large
    amplitudes, absolute error small near zero (that is the point of
    the curve)."""
    pcm = np.linspace(-32000, 32000, 20001).astype(np.int16)
    for enc, dec in [(ulaw_encode, ulaw_decode), (alaw_encode, alaw_decode)]:
        rec = dec(enc(pcm)).astype(np.int64)
        err = np.abs(rec - pcm.astype(np.int64))
        big = np.abs(pcm) > 4096
        assert (err[big] / np.abs(pcm[big])).max() < 0.07  # ~1/16 rel step
        small = np.abs(pcm) < 64
        assert err[small].max() <= 40  # coarse but bounded near zero
    # quiet signals keep FINER absolute error than a linear 8-bit
    # quantizer (step 256): that's what the log curve buys
    quiet = (np.sin(np.linspace(0, 20, 2000)) * 900).astype(np.int16)
    for enc, dec in [(ulaw_encode, ulaw_decode), (alaw_encode, alaw_decode)]:
        err = np.abs(dec(enc(quiet)).astype(np.int64) - quiet)
        assert err.max() < 64


def test_g711_wav_round_trip_bit_exact():
    x = _tone()
    for law, tag in [("ulaw", 7), ("alaw", 6)]:
        payload, expected = encode_wav_g711(x, 8000, law=law)
        assert int.from_bytes(payload[20:22], "little") == tag
        samples, sr = decode_wav(payload)
        assert sr == 8000 and samples.shape == expected.shape
        assert (samples == expected).all()
        # compression is real: 8 bits/sample vs 16-bit PCM
        from cim_framework_graph_partitioning_spark.operators.multimodal import (
            encode_wav,
        )

        assert len(payload) < len(encode_wav(x, 8000)) * 0.6
        # and the decode is close to the source signal
        assert np.abs(samples[:, 0] - x).max() < 0.02
    # stereo G.711 keeps the channel shape
    st = np.stack([_tone(), -_tone()], axis=1)
    payload, expected = encode_wav_g711(st, 16000, law="ulaw")
    samples, _ = decode_wav(payload)
    assert samples.shape == (4000, 2) and (samples == expected).all()


def test_adpcm_wav_round_trip_bit_exact():
    x = _tone(n=5000)  # not a whole number of blocks: exercises padding
    payload, expected = encode_wav_adpcm(x, 8000, block_align=256)
    samples, sr = decode_wav(payload)
    assert sr == 8000
    assert samples.shape == expected.shape == (5000, 1)
    assert (samples == expected).all()
    # ~4:1 vs 16-bit PCM and still tracks the waveform
    from cim_framework_graph_partitioning_spark.operators.multimodal import (
        encode_wav,
    )

    assert len(payload) < len(encode_wav(x, 8000)) * 0.3
    # 4-bit differential coding of a 440 Hz tone at 8 kHz carries
    # ~step/8 ≈ 0.01-0.015 inherent quantization noise at this slope
    assert np.abs(samples[:, 0] - x).mean() < 0.02
    assert np.abs(samples[:, 0] - x).max() < 0.08
    # raw block layer: replay contract holds at the sample level too
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int16)
    data, exp16, n = adpcm_encode(pcm, 64)
    assert (adpcm_decode(data, 64, n) == exp16).all()


def test_adpcm_noise_and_extremes():
    rng = np.random.RandomState(11)
    worst = rng.randint(-32768, 32768, 3000).astype(np.int16)
    data, exp16, n = adpcm_encode(worst, 256)
    assert (adpcm_decode(data, 256, n) == exp16).all()
    step = np.where(np.arange(600) % 2 == 0, 32767, -32768).astype(np.int16)
    data, exp16, n = adpcm_encode(step, 32)
    assert (adpcm_decode(data, 32, n) == exp16).all()
    with pytest.raises(ValueError):
        adpcm_encode(np.array([], dtype=np.int16))
    with pytest.raises(ValueError):
        adpcm_decode(b"", 256, 0)


def test_compressed_wavs_route_through_dispatch():
    """_try_decode takes the real path for all three compressed
    encodings — features derive from the replayed expected decode."""
    x = _tone(n=1600)
    for payload, expected in [
        encode_wav_g711(x, 8000, law="ulaw"),
        encode_wav_g711(x, 8000, law="alaw"),
        encode_wav_adpcm(x, 8000),
    ]:
        feats = _try_decode(payload)
        assert feats is not None
        assert list(feats) == list(_wav_features(expected, 8000))
        assert feats[0] == 8000.0  # sample_rate lane
    # an MP3-ish payload still degrades to the fake path, not a crash
    assert _try_decode(b"ID3\x04\x00" + b"\x00" * 100) is None
    # unsupported WAV format tag (MP3-in-WAV, 0x55) raises in decode_wav
    bad = bytearray(encode_wav_g711(x, 8000, law="ulaw")[0])
    bad[20:22] = (0x55).to_bytes(2, "little")
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))
    assert _try_decode(bytes(bad)) is None
