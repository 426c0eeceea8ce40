"""Motion-JPEG AVI codec in pure numpy + stdlib — no external libraries.

This makes the VIDEO modality real the same way BMP/PNG/JPEG/WAV did
for images and audio: AVI is a RIFF container (the exact chunk grammar
``decode_wav`` already walks, plus nested LIST chunks), and each MJPEG
frame is a standalone baseline JPEG that ``jpeg.decode_jpeg`` already
decodes.

Scope (honest and tested):
* ``decode_avi_mjpeg``: RIFF/'AVI ' container with one 'vids' stream
  whose handler or biCompression says MJPG; walks hdrl (avih/strh/strf)
  for timing and geometry, collects the '00dc'/'00db' frame chunks in
  'movi', and decodes every frame through ``decode_jpeg``. Refuses
  non-MJPG codecs (DIB/cvid/H.264-in-AVI), missing stream headers, and
  truncated chunks with ValueError — the decodability dispatch in
  multimodal.py then falls back to the fake path.
* ``parse_avi``: the container walk alone — returns the raw per-frame
  JPEG payloads WITHOUT entropy-decoding them. Frame sampling built on
  this is exact and cheap (byte slicing, no pixel work), which is what
  ``multimodal.extract_frames`` uses.
* ``encode_avi_mjpeg``: emits exactly the subset the decoder reads, and
  ALSO returns the expected decode of every frame (delegating to
  ``encode_jpeg``'s replayed-quantization contract), so the lossy video
  round trip is bit-exactly testable end to end.

Everything per-frame is the numpy JPEG codec; the container walk is a
few-hundred-byte header parse. Per-payload cost sits inside the
mapInPandas kernel, never in a registered hot path.

Reference analogue: the reference treats media payloads as opaque byte
streams with typed metadata (SURVEY §2.2); this codec continues the
multimodal decode layer of multimodal.py.
"""

from __future__ import annotations

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg


def _le32(buf: bytes, pos: int) -> int:
    return int.from_bytes(buf[pos : pos + 4], "little")


def parse_avi(payload: bytes) -> tuple[list[bytes], float, int, int]:
    """Walk a RIFF/'AVI ' container and return
    ``(frame_payloads, fps, width, height)`` where each frame payload
    is the raw bytes of one '00dc'/'00db' chunk (a standalone JPEG for
    MJPEG files) — no pixel decoding happens here.

    Validates: RIFF magic + 'AVI ' form type, chunk bounds (truncation
    raises), presence of a 'vids' stream header, and that the stream's
    fccHandler or strf biCompression identifies MJPG. fps comes from
    the stream's exact rate/scale rational, falling back to avih's
    microseconds-per-frame."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    frames: list[bytes] = []
    rate = scale = None
    us_per_frame = None
    width = height = 0
    saw_vids = False
    mjpg = False
    in_vids_strl = False

    def walk(start: int, end: int) -> None:
        nonlocal rate, scale, us_per_frame, width, height
        nonlocal saw_vids, mjpg, in_vids_strl
        pos = start
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            size = _le32(payload, pos + 4)
            body = pos + 8
            if body + size > end:
                raise ValueError("truncated AVI chunk")
            if cid == b"LIST":
                if size < 4:
                    raise ValueError("bad AVI LIST chunk")
                subtype = payload[body : body + 4]
                if subtype == b"strl":
                    in_vids_strl = False  # set by this list's strh
                walk(body + 4, body + size)
            elif cid == b"avih" and size >= 40:
                us_per_frame = _le32(payload, body)
                width = width or _le32(payload, body + 32)
                height = height or _le32(payload, body + 36)
            elif cid == b"strh" and size >= 36:
                in_vids_strl = payload[body : body + 4] == b"vids"
                if in_vids_strl:
                    saw_vids = True
                    if payload[body + 4 : body + 8] == b"MJPG":
                        mjpg = True
                    scale = _le32(payload, body + 20)
                    rate = _le32(payload, body + 24)
            elif cid == b"strf" and in_vids_strl and size >= 40:
                width = width or _le32(payload, body + 4)
                height = height or abs(
                    int.from_bytes(
                        payload[body + 8 : body + 12], "little", signed=True
                    )
                )
                if payload[body + 16 : body + 20] == b"MJPG":
                    mjpg = True
            elif cid in (b"00dc", b"00db"):
                frames.append(payload[body : body + size])
            pos = body + size + (size & 1)  # chunks pad to even offsets

    walk(12, len(payload))
    if not saw_vids:
        raise ValueError("AVI missing a 'vids' stream header")
    if not mjpg:
        raise ValueError("unsupported AVI codec (MJPG only)")
    if rate and scale:
        fps = rate / scale
    elif us_per_frame:
        fps = 1e6 / us_per_frame
    else:
        raise ValueError("AVI missing frame timing")
    return frames, fps, width, height


def decode_avi_mjpeg(
    payload: bytes, sample_every: int = 1
) -> tuple[list[np.ndarray], float, int]:
    """Decode an MJPEG AVI. Returns ``(frames, fps, n_frames_total)``
    where ``frames`` are (h, w, 3) uint8 BGR arrays (the same contract
    as decode_bmp/png/jpeg) for every ``sample_every``-th stored frame
    — pass 1 (default) for all frames; feature extraction passes a
    stride so per-payload pixel work stays bounded regardless of clip
    length. Raises ValueError on container corruption, a non-MJPG
    codec, or an undecodable frame."""
    raw, fps, _, _ = parse_avi(payload)
    if sample_every < 1:
        raise ValueError("sample_every must be >= 1")
    return [decode_jpeg(f) for f in raw[::sample_every]], fps, len(raw)


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + len(body).to_bytes(4, "little") + body + (
        b"\x00" if len(body) & 1 else b""
    )


def _list(subtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", subtype + body)


def encode_avi_mjpeg(
    frames: list[np.ndarray],
    fps: float = 30.0,
    quality: int = 90,
    subsample: str = "420",
) -> tuple[bytes, list[np.ndarray]]:
    """Encode same-shaped (h, w, 3) uint8 BGR frames as an MJPEG AVI —
    the exact subset ``decode_avi_mjpeg`` reads (RIFF/hdrl/movi, one
    'vids' MJPG stream, fps stored as the rate/1000 rational). Returns
    ``(payload, expected_frames)`` where ``expected_frames`` replays
    each frame's quantization loss via ``encode_jpeg``, so
    ``decode_avi_mjpeg(payload)[0] == expected_frames`` holds
    bit-exactly (round-trip tested)."""
    if not frames:
        raise ValueError("need at least one frame")
    arrs = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = arrs[0].shape[:2]
    if any(a.shape != (h, w, 3) for a in arrs):
        raise ValueError("all frames must share one (h, w, 3) shape")
    encoded: list[bytes] = []
    expected: list[np.ndarray] = []
    for a in arrs:
        p, e = encode_jpeg(a, quality=quality, subsample=subsample)
        encoded.append(p)
        expected.append(e)

    scale = 1000
    rate = int(round(fps * scale))
    if rate <= 0:
        raise ValueError("fps must be positive")
    max_frame = max(len(p) for p in encoded)
    avih = (
        int(round(1e6 * scale / rate)).to_bytes(4, "little")  # usec/frame
        + (max_frame * rate // scale).to_bytes(4, "little")  # max bytes/sec
        + (0).to_bytes(4, "little")  # padding granularity
        + (0).to_bytes(4, "little")  # flags (no idx1 written, HASINDEX off)
        + len(encoded).to_bytes(4, "little")  # total frames
        + (0).to_bytes(4, "little")  # initial frames
        + (1).to_bytes(4, "little")  # streams
        + max_frame.to_bytes(4, "little")  # suggested buffer
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + b"\x00" * 16  # reserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + (0).to_bytes(4, "little")  # flags
        + (0).to_bytes(2, "little")  # priority
        + (0).to_bytes(2, "little")  # language
        + (0).to_bytes(4, "little")  # initial frames
        + scale.to_bytes(4, "little")
        + rate.to_bytes(4, "little")
        + (0).to_bytes(4, "little")  # start
        + len(encoded).to_bytes(4, "little")  # length (frames)
        + max_frame.to_bytes(4, "little")  # suggested buffer
        + (0xFFFFFFFF).to_bytes(4, "little")  # quality: default
        + (0).to_bytes(4, "little")  # sample size (0 = varies)
        + b"\x00" * 8  # rcFrame
    )
    strf = (
        (40).to_bytes(4, "little")  # biSize
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # planes
        + (24).to_bytes(2, "little")  # bit count
        + b"MJPG"  # biCompression
        + max_frame.to_bytes(4, "little")  # biSizeImage (approx, unused)
        + b"\x00" * 16  # resolution + palette fields
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", p) for p in encoded))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body, expected
