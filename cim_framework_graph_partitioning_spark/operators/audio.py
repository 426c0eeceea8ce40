"""Compressed-audio codecs in pure numpy — no external libraries.

Makes the COMPRESSED audio formats real the same way the PCM WAV path
is (multimodal.decode_wav): three genuinely compressed encodings that
need no codec library, each wrapped in the standard RIFF/WAVE container
with its registered wFormatTag:

* G.711 μ-law (wFormatTag 7) — 8-bit logarithmic companding, 2:1 vs
  16-bit PCM. Encode/decode are the classic segment/mantissa formulas,
  fully vectorized; ``encode(decode(code)) == code`` holds for all 256
  codes (tested bijection).
* G.711 A-law (wFormatTag 6) — same shape, European companding curve
  with the 0x55 toggle; all-256-codes bijection tested.
* IMA ADPCM (wFormatTag 0x11, mono) — 4-bit differential coding, ~4:1.
  Block-based: each block carries a 4-byte header (int16 predictor,
  step index) + nibbles, low nibble first. Decode vectorizes ACROSS
  blocks (the per-sample recurrence is sequential by definition, so the
  loop runs samples-per-block times over all-blocks numpy lanes).
  ``encode_wav_adpcm`` replays the encoder's own reconstruction, so the
  LOSSY round trip is bit-exact-testable — the same
  expected-replay contract as the JPEG/MJPEG codecs.

The WAV container walk stays in ``multimodal.decode_wav``, which
dispatches on wFormatTag to the samplewise decoders here. Remaining
stubs after this: formats that genuinely need external libraries
(MP3/AAC/FLAC/Vorbis).

Reference analogue: opaque media payloads with typed metadata
(SURVEY §2.2), continuing the multimodal decode layer.
"""

from __future__ import annotations

import numpy as np

# --- G.711 μ-law ------------------------------------------------------------

_ULAW_BIAS = 0x84  # 132
_ULAW_CLIP = 32635


def ulaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 linear → μ-law code (uint8), vectorized classic G.711:
    bias, segment = floor(log2(magnitude)) - 7, 4-bit mantissa,
    ones-complement output."""
    pcm = np.asarray(pcm, dtype=np.int32)
    sign = np.where(pcm < 0, 0x80, 0x00)
    mag = np.minimum(np.abs(pcm), _ULAW_CLIP) + _ULAW_BIAS
    exp = (np.floor(np.log2(mag)).astype(np.int32) - 7).clip(0, 7)
    mantissa = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mantissa) & 0xFF).astype(np.uint8)


def ulaw_decode(code: np.ndarray) -> np.ndarray:
    """μ-law code (uint8) → int16 linear, the exact inverse segment
    expansion (all-256-codes bijection with ``ulaw_encode``)."""
    u = ~np.asarray(code, dtype=np.int32) & 0xFF
    exp = (u >> 4) & 0x07
    mantissa = u & 0x0F
    mag = (((mantissa << 3) + _ULAW_BIAS) << exp) - _ULAW_BIAS
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


# --- G.711 A-law ------------------------------------------------------------


def alaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 linear → A-law code (uint8), vectorized classic G.711
    (the Sun g711.c formulation): negatives bias by −8 before
    magnitude, 13-bit segments, 4-bit mantissa with shift
    max(segment, 1); output XOR 0x55 (sign bit set = positive)."""
    pcm = np.asarray(pcm, dtype=np.int32)
    pos = pcm >= 0
    val = np.clip(np.where(pos, pcm, -pcm - 8), 0, 32767)
    mag = val >> 3  # 13-bit magnitude
    exp = (np.floor(np.log2(np.maximum(mag, 1))).astype(np.int32) - 4).clip(0, 7)
    mantissa = (mag >> np.maximum(exp, 1)) & 0x0F
    sign = np.where(pos, 0x80, 0x00)
    return (((sign | (exp << 4) | mantissa) ^ 0x55) & 0xFF).astype(np.uint8)


def alaw_decode(code: np.ndarray) -> np.ndarray:
    """A-law code (uint8) → int16 linear (all-256-codes bijection with
    ``alaw_encode``); reconstruction sits at each quantization cell's
    midpoint, scaled back to 16-bit."""
    a = (np.asarray(code, dtype=np.int32) ^ 0x55) & 0xFF
    sign = a & 0x80
    exp = (a >> 4) & 0x07
    mantissa = a & 0x0F
    mag = np.where(
        exp == 0,
        (mantissa << 1) + 1,
        ((mantissa << 1) + 0x21) << (exp - 1),
    )
    mag = mag << 3  # 13-bit → 16-bit
    return np.where(sign, mag, -mag).astype(np.int16)


# --- IMA ADPCM --------------------------------------------------------------

_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)

_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _adpcm_step(nibble, pred, index):
    """One IMA ADPCM reconstruction step, vectorized over blocks:
    (nibble, predictor, step-index) → (new predictor, new index)."""
    step = _STEP_TABLE[index]
    diff = step >> 3
    diff = diff + np.where(nibble & 4, step, 0)
    diff = diff + np.where(nibble & 2, step >> 1, 0)
    diff = diff + np.where(nibble & 1, step >> 2, 0)
    pred = np.where(nibble & 8, pred - diff, pred + diff)
    pred = np.clip(pred, -32768, 32767)
    index = np.clip(index + _INDEX_TABLE[nibble & 7], 0, 88)
    return pred, index


def adpcm_decode(data: bytes, block_align: int, n_samples: int) -> np.ndarray:
    """IMA ADPCM mono data chunk → int16 samples. Blocks decode in
    numpy lanes (one python iteration per sample-position, all blocks
    at once); ``n_samples`` (from the WAV fact chunk) trims the final
    block's padding."""
    if block_align < 5:
        raise ValueError("bad ADPCM block align")
    raw = np.frombuffer(data, dtype=np.uint8)
    n_blocks = raw.size // block_align
    if n_blocks == 0:
        raise ValueError("truncated ADPCM data")
    blocks = raw[: n_blocks * block_align].reshape(n_blocks, block_align)
    pred = (
        blocks[:, 0].astype(np.int32)
        | (blocks[:, 1].astype(np.int32) << 8)
    ).astype(np.int16).astype(np.int32)
    index = np.clip(blocks[:, 2].astype(np.int32), 0, 88)
    payload = blocks[:, 4:]
    nibbles = np.empty((n_blocks, payload.shape[1] * 2), dtype=np.int32)
    nibbles[:, 0::2] = payload & 0x0F  # low nibble first, per spec
    nibbles[:, 1::2] = payload >> 4
    out = np.empty((n_blocks, 1 + nibbles.shape[1]), dtype=np.int32)
    out[:, 0] = pred
    for i in range(nibbles.shape[1]):
        pred, index = _adpcm_step(nibbles[:, i], pred, index)
        out[:, i + 1] = pred
    flat = out.reshape(-1)[:n_samples]
    if flat.size < n_samples:
        raise ValueError("ADPCM data shorter than fact-chunk sample count")
    return flat.astype(np.int16)


def adpcm_encode(
    samples: np.ndarray, block_align: int = 256
) -> tuple[bytes, np.ndarray, int]:
    """int16 mono samples → (data_bytes, expected_decode, n_samples).
    The quantizer replays its own reconstruction (the decoder's exact
    arithmetic), so ``adpcm_decode(data, block_align, n) == expected``
    bit-exactly. The tail block pads by repeating the last sample; the
    sample count trims it on decode. Vectorized across blocks like the
    decoder."""
    x = np.asarray(samples, dtype=np.int16).astype(np.int32).reshape(-1)
    if x.size == 0:
        raise ValueError("need at least one sample")
    spb = (block_align - 4) * 2 + 1  # samples per block
    n_blocks = -(-x.size // spb)
    padded = np.concatenate([x, np.full(n_blocks * spb - x.size, x[-1],
                                        dtype=np.int32)])
    grid = padded.reshape(n_blocks, spb)
    pred = grid[:, 0].copy()
    # seed each block's step index from its own signal scale (the mean
    # |inter-sample delta|): the index is carried in the block header,
    # so any choice is spec-legal, and scale-matched seeding avoids the
    # multi-sample adaptation transient an index-0 start would cost at
    # every block boundary. Vectorized across blocks (searchsorted).
    if spb > 1:
        mean_delta = np.abs(np.diff(grid, axis=1)).mean(axis=1)
        index = np.searchsorted(_STEP_TABLE, mean_delta).astype(np.int32)
        index = np.clip(index, 0, 88)
    else:
        index = np.zeros(n_blocks, dtype=np.int32)
    index0 = index.copy()
    recon = np.empty_like(grid)
    recon[:, 0] = pred
    nibbles = np.empty((n_blocks, spb - 1), dtype=np.uint8)
    for i in range(1, spb):
        step = _STEP_TABLE[index]
        delta = grid[:, i] - pred
        sign = np.where(delta < 0, 8, 0)
        diff = np.abs(delta)
        nib = np.zeros(n_blocks, dtype=np.int32)
        ge = diff >= step
        nib = nib | np.where(ge, 4, 0)
        diff = diff - np.where(ge, step, 0)
        ge = diff >= (step >> 1)
        nib = nib | np.where(ge, 2, 0)
        diff = diff - np.where(ge, step >> 1, 0)
        ge = diff >= (step >> 2)
        nib = nib | np.where(ge, 1, 0)
        nib = nib | sign
        nibbles[:, i - 1] = nib.astype(np.uint8)
        pred, index = _adpcm_step(nib, pred, index)
        recon[:, i] = pred
    header = np.zeros((n_blocks, 4), dtype=np.uint8)
    first = grid[:, 0].astype(np.int16).view(np.uint16).astype(np.uint32)
    header[:, 0] = first & 0xFF
    header[:, 1] = first >> 8
    header[:, 2] = index0.astype(np.uint8)  # per-block seeded step index
    packed = (nibbles[:, 0::2] | (nibbles[:, 1::2] << 4)).astype(np.uint8)
    data = np.concatenate([header, packed], axis=1).tobytes()
    expected = recon.reshape(-1)[: x.size].astype(np.int16)
    return data, expected, x.size


# --- WAV container wrappers -------------------------------------------------


def _wav_wrap(fmt_tag: int, n_channels: int, sample_rate: int,
              bits: int, block_align: int, data: bytes,
              n_samples: int | None = None, extra: bytes = b"") -> bytes:
    """RIFF/WAVE wrapper for a compressed data chunk: fmt with the
    given wFormatTag (+ optional cbSize extension) and, for codecs
    where frame count isn't derivable from byte length, a fact chunk
    carrying the true sample count."""
    byte_rate = sample_rate * block_align if fmt_tag != 0x11 else (
        sample_rate * block_align // ((block_align - 4) * 2 + 1) + 1
    )
    fmt = (
        fmt_tag.to_bytes(2, "little")
        + n_channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
        + (len(extra).to_bytes(2, "little") + extra if extra else b"")
    )
    body = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    if n_samples is not None:
        body += b"fact" + (4).to_bytes(4, "little") + n_samples.to_bytes(4, "little")
    body += b"data" + len(data).to_bytes(4, "little") + data
    if len(data) & 1:
        body += b"\x00"  # chunks pad to even offsets
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body


def encode_wav_g711(
    samples: np.ndarray, sample_rate: int, law: str = "ulaw"
) -> tuple[bytes, np.ndarray]:
    """Encode float samples in [-1, 1] (1-D mono or (frames, channels))
    as a G.711 WAV (wFormatTag 7 for μ-law, 6 for A-law). Returns
    (payload, expected) where expected is the float64 (frames,
    channels) array ``multimodal.decode_wav`` must produce — the
    companding loss replayed through decode."""
    samples = np.asarray(samples, dtype="float64")
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype(np.int16)
    enc, dec = (
        (ulaw_encode, ulaw_decode) if law == "ulaw"
        else (alaw_encode, alaw_decode)
    )
    codes = enc(pcm.reshape(-1))
    expected = dec(codes).astype("float64").reshape(pcm.shape) / 32768.0
    tag = 7 if law == "ulaw" else 6
    n_ch = samples.shape[1]
    return (
        _wav_wrap(tag, n_ch, sample_rate, 8, n_ch, codes.tobytes(),
                  n_samples=pcm.shape[0]),
        expected,
    )


def encode_wav_adpcm(
    samples: np.ndarray, sample_rate: int, block_align: int = 256
) -> tuple[bytes, np.ndarray]:
    """Encode float mono samples in [-1, 1] as an IMA ADPCM WAV
    (wFormatTag 0x11, fact chunk with the true sample count, cbSize
    extension carrying samples-per-block). Returns (payload, expected)
    with the quantization loss replayed — bit-exact round trip."""
    samples = np.asarray(samples, dtype="float64").reshape(-1)
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype(np.int16)
    data, expected, n = adpcm_encode(pcm, block_align)
    spb = (block_align - 4) * 2 + 1
    payload = _wav_wrap(
        0x11, 1, sample_rate, 4, block_align, data, n_samples=n,
        extra=spb.to_bytes(2, "little"),
    )
    return payload, (expected.astype("float64") / 32768.0)[:, None]
