"""Baseline JPEG codec in pure numpy + stdlib — no external libraries.

Scope (honest and tested):
* ``decode_jpeg``: baseline sequential DCT JPEG (SOF0), 8-bit,
  grayscale, YCbCr 4:4:4, or YCbCr 4:2:0 (the camera/web layout: 2x2
  luma blocks per MCU, chroma upsampled 2x), huffman tables and quant
  tables read from the payload's own DHT/DQT segments. Refuses
  progressive (SOF2), arithmetic coding, 12-bit, other samplings, and
  restart intervals with ValueError — the decodability dispatch in
  multimodal.py then falls back to the fake path.
* ``encode_jpeg``: emits exactly that subset (quality-scaled Annex-K
  style quant tables, standard huffman tables written into DHT), and
  ALSO returns the mathematically expected decode: JPEG's loss happens
  entirely at quantization time, which the encoder replays through the
  identical dequantize→IDCT→color pipeline the decoder runs — so
  ``decode_jpeg(payload) == expected`` holds BIT-EXACTLY and the lossy
  codec gets deterministic round-trip tests.

Everything per-image is numpy (DCT/IDCT as 8x8 orthonormal matrix
products over all blocks at once); only the entropy-coding bit IO is
python, which is inherent to huffman streams and sits inside the
mapInPandas kernel, never in a registered hot path.

Reference analogue: the reference treats media payloads as opaque
byte streams with typed metadata (SURVEY §2.2); this codec is part of
making the engine's multimodal decode layer real where the sandbox's
stdlib allows (cf. multimodal.py module docstring).
"""

from __future__ import annotations

import numpy as np

# --- constants --------------------------------------------------------------

# zigzag scan: the i-th transmitted coefficient sits at raster position
# _ZIGZAG[i] of the 8x8 block
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)

_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

# huffman specs as (bits-per-length[1..16], symbol list). These are
# written into the payload's DHT segments and read back by the decoder,
# so the codec pair is self-consistent by construction; the symbol sets
# cover every (run, size) the encoder can emit (DC size 0-11, AC
# run 0-15 x size 1-10 plus EOB/ZRL).
_DC_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]  # [0]+16
_DC_VALS = list(range(12))
# the AC spec is built mechanically (EOB, ZRL, then every (run, size)
# pair with canonical lengths) — see _fixed_ac_spec().


def _fixed_ac_spec() -> tuple[list[int], list[int]]:
    """A valid (bits, vals) huffman spec covering EOB (0x00), ZRL
    (0xF0) and all run 0-15 x size 1-10 symbols = 162 symbols.

    Canonical-code validity needs sum(bits[l] * 2^-l) <= 1 with no
    length-16 overflow; we give short codes to the symbols baseline
    encoders emit most (low run, small size) and park the long tail at
    depth 16: 2@2, 4@4, 8@6, 16@8, 32@10, 64@12, 35@14, 1@15.
    Kraft sum = 2/4 + 4/16 + 8/64 + 16/256 + 32/1024 + 64/4096 +
    35/16384 + 1/32768 = 0.99899... < 1 -> decodable prefix code."""
    order = [0x00, 0xF0]  # EOB and ZRL first (shortest codes)
    for size in range(1, 11):
        for run in range(16):
            order.append((run << 4) | size)
    bits = [0] * 17
    for n, length in [(2, 2), (4, 4), (8, 6), (16, 8), (32, 10),
                      (64, 12), (35, 14), (1, 15)]:
        bits[length] = n
    assert sum(bits) == len(order) == 162
    return bits, order


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical huffman: symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical huffman: (length, code) -> symbol."""
    return {(l, c): s for s, (c, l) in _build_codes(bits, vals).items()}


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix; DCT = C @ X @ C.T, IDCT = C.T @ Y @ C."""
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8)
    c[0] *= np.sqrt(0.5)
    return c


_DCTM = _dct_matrix()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(100, max(1, int(quality)))
    scale = 5000.0 / quality if quality < 50 else 200.0 - 2.0 * quality
    out = []
    for base in (_QUANT_LUMA, _QUANT_CHROMA):
        q = np.floor((base * scale + 50.0) / 100.0)
        out.append(np.clip(q, 1, 255))
    return out[0], out[1]


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) -> (nby, nbx, 8, 8) with edge padding to multiples of 8."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    p = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    nby, nbx = p.shape[0] // 8, p.shape[1] // 8
    return p.reshape(nby, 8, nbx, 8).swapaxes(1, 2)


def _unblocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    nby, nbx = blocks.shape[:2]
    return blocks.swapaxes(1, 2).reshape(nby * 8, nbx * 8)[:h, :w]


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_bgr(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([b, g, r], axis=-1)  # BGR to match decode_bmp/png
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# --- bit IO -----------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker inside entropy data")
                self.pos += 1  # skip stuffed 0x00
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _magnitude(v: int) -> tuple[int, int]:
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


# --- encoder ----------------------------------------------------------------

def _encode_block(writer, zz, prev_dc, ci, dc_codes, ac_codes) -> None:
    diff = int(zz[0]) - prev_dc[ci]
    prev_dc[ci] = int(zz[0])
    size, bits = _magnitude(diff)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            if i > last_nz:
                code, length = ac_codes[0x00]  # EOB
                writer.write(code, length)
                break
            run += 1
            if run == 16:
                code, length = ac_codes[0xF0]  # ZRL
                writer.write(code, length)
                run = 0
            continue
        size, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(bits, size)
        run = 0


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    gray: bool = False,
    subsample: str = "444",
) -> tuple[bytes, np.ndarray]:
    """Encode (h, w, 3) uint8 BGR pixels as a baseline JPEG — 4:4:4, or
    4:2:0 (``subsample="420"``, the layout cameras and web encoders
    emit: chroma box-filtered 2x2, luma 2x2 blocks per MCU), or
    single-component grayscale (``gray=True``). Returns
    ``(payload, expected)`` where ``expected`` is the exact uint8 BGR
    array ``decode_jpeg(payload)`` must produce — the quantization loss
    is replayed through the decoder's own dequantize/IDCT/upsample/
    color pipeline, making lossy round-trips bit-exactly testable."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    sub = subsample == "420" and not gray
    ycc = _rgb_to_ycbcr(img[..., ::-1])  # BGR -> RGB -> YCbCr
    ql, qc = _quality_tables(quality)
    n_comp = 1 if gray else 3

    if sub:
        # pad luma to 16-multiples first so the half-res chroma planes
        # land exactly on 8-multiples
        ph, pw = -h % 16, -w % 16
        y_pad = np.pad(ycc[..., 0], ((0, ph), (0, pw)), mode="edge")
        chroma = []
        for i in (1, 2):
            c = np.pad(ycc[..., i], ((0, ph), (0, pw)), mode="edge")
            hh, ww = c.shape
            chroma.append(
                c.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
            )
        planes = [y_pad] + chroma
    else:
        planes = [ycc[..., i] for i in range(n_comp)]
    qtabs = [ql] + [qc] * (n_comp - 1)

    dc_codes = _build_codes(_DC_BITS, _DC_VALS)
    ac_bits, ac_vals = _fixed_ac_spec()
    ac_codes = _build_codes(ac_bits, ac_vals)

    writer = _BitWriter()
    recon_full = []  # per component: full reconstructed padded plane
    quantized = []
    for plane, q in zip(planes, qtabs):
        blocks = _blocks(plane) - 128.0
        coef = np.einsum("ij,abjk,lk->abil", _DCTM, blocks, _DCTM)
        qc_ = np.clip(np.round(coef / q), -1023, 1023).astype(np.int64)
        quantized.append(qc_)
        # replay: what the decoder will reconstruct from these ints
        deq = qc_.astype(np.float64) * q
        rec = np.einsum("ji,abjk,kl->abil", _DCTM, deq, _DCTM) + 128.0
        nby_, nbx_ = rec.shape[:2]
        recon_full.append(
            np.clip(_unblocks(rec, nby_ * 8, nbx_ * 8), 0.0, 255.0)
        )
    prev_dc = [0] * n_comp
    if sub:
        nmy, nmx = quantized[1].shape[:2]  # MCU grid = chroma block grid
        for by in range(nmy):
            for bx in range(nmx):
                for dy in (0, 1):
                    for dx in (0, 1):
                        blk = quantized[0][2 * by + dy, 2 * bx + dx]
                        _encode_block(writer, blk.reshape(64)[_ZIGZAG],
                                      prev_dc, 0, dc_codes, ac_codes)
                for ci in (1, 2):
                    blk = quantized[ci][by, bx]
                    _encode_block(writer, blk.reshape(64)[_ZIGZAG],
                                  prev_dc, ci, dc_codes, ac_codes)
    else:
        nby, nbx = quantized[0].shape[:2]
        for by in range(nby):
            for bx in range(nbx):
                for ci in range(n_comp):
                    blk = quantized[ci][by, bx]
                    _encode_block(writer, blk.reshape(64)[_ZIGZAG],
                                  prev_dc, ci, dc_codes, ac_codes)
    scan = writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    def dqt(tid: int, q: np.ndarray) -> bytes:
        zz = q.reshape(64)[_ZIGZAG].astype(np.uint8)
        return seg(0xDB, bytes([tid]) + zz.tobytes())

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(
            0xC4, bytes([(cls << 4) | tid]) + bytes(bits[1:17]) + bytes(vals)
        )

    sof_comps = b"".join(
        bytes([cid + 1, 0x22 if (sub and cid == 0) else 0x11,
               0 if cid == 0 else 1])
        for cid in range(n_comp)
    )
    sos_comps = b"".join(
        bytes([cid + 1, 0x00 if cid == 0 else 0x11]) for cid in range(n_comp)
    )
    payload = (
        b"\xff\xd8"  # SOI
        + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + dqt(0, ql)
        + (dqt(1, qc) if n_comp > 1 else b"")
        + seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
              + bytes([n_comp]) + sof_comps)
        + dht(0, 0, _DC_BITS, _DC_VALS)
        + dht(1, 0, ac_bits, ac_vals)
        + (dht(0, 1, _DC_BITS, _DC_VALS) + dht(1, 1, ac_bits, ac_vals)
           if n_comp > 1 else b"")
        + seg(0xDA, bytes([n_comp]) + sos_comps + bytes([0, 63, 0]))
        + scan
        + b"\xff\xd9"  # EOI
    )

    if gray:
        expected = np.repeat(recon_full[0][:h, :w][..., None], 3, axis=2)
        expected = np.clip(np.round(expected), 0, 255).astype(np.uint8)
    elif sub:
        y = recon_full[0][:h, :w]
        cbcr = [
            np.repeat(np.repeat(p, 2, axis=0), 2, axis=1)[:h, :w]
            for p in recon_full[1:]
        ]
        expected = _ycbcr_to_bgr(y, *cbcr)
    else:
        expected = _ycbcr_to_bgr(*(p[:h, :w] for p in recon_full))
    return payload, expected


# --- decoder ----------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG (see module docstring for the
    supported subset). Returns (h, w, 3) uint8 BGR, grayscale
    replicated — the same contract as decode_bmp/decode_png.

    Raises ValueError on structural corruption (bad markers, truncated
    segments, missing tables, unsupported variants). Corruption INSIDE
    the entropy-coded scan that still forms valid huffman codes is
    undetectable by design — JPEG carries no checksum — and decodes to
    wrong pixels, as it does in every decoder."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    scan_info = None
    scan_data = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        size = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        body = payload[pos + 4 : pos + 2 + size]
        if len(body) != size - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = body
            while b:
                prec, tid = b[0] >> 4, b[0] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(b[1:65], dtype=np.uint8).astype(np.float64)
                q = np.zeros(64)
                q[_ZIGZAG] = zz
                qtables[tid] = q.reshape(8, 8)
                b = b[65:]
        elif marker == 0xC4:  # DHT
            b = body
            while b:
                cls, tid = b[0] >> 4, b[0] & 0xF
                bits = [0] + list(b[1:17])
                n = sum(bits)
                vals = list(b[17 : 17 + n])
                tab = _build_decoder(bits, vals)
                (dc_tabs if cls == 0 else ac_tabs)[tid] = tab
                b = b[17 + n :]
        elif marker == 0xC0:  # SOF0 baseline
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            n_comp = body[5]
            comps = []
            samps = []
            for i in range(n_comp):
                cid, samp, qid = body[6 + 3 * i : 9 + 3 * i]
                samps.append(samp)
                comps.append((cid, qid))
            if body[0] != 8 or n_comp not in (1, 3):
                raise ValueError("unsupported JPEG precision/components")
            if all(s == 0x11 for s in samps):
                sub = False
            elif n_comp == 3 and samps == [0x22, 0x11, 0x11]:
                sub = True  # 4:2:0
            else:
                raise ValueError(
                    "unsupported JPEG sampling (4:4:4 and 4:2:0 only)"
                )
            frame = (h, w, comps, sub)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/arithmetic) unsupported")
        elif marker == 0xDD:  # DRI
            if int.from_bytes(body[:2], "big") != 0:
                raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows
            n_comp = body[0]
            sel = []
            for i in range(n_comp):
                cid, tabs = body[1 + 2 * i : 3 + 2 * i]
                sel.append((cid, tabs >> 4, tabs & 0xF))
            scan_info = sel
            scan_data = payload[pos + 2 + size :]
            break
        pos += 2 + size
    if frame is None or scan_info is None or scan_data is None:
        raise ValueError("JPEG missing SOF0/SOS")
    h, w, comps, sub = frame
    if h <= 0 or w <= 0:
        raise ValueError("bad JPEG dimensions")
    n_comp = len(comps)
    reader = _BitReader(scan_data)
    prev_dc = [0] * n_comp
    try:
        dc_sel = [dc_tabs[t_dc] for _, t_dc, _ in scan_info]
        ac_sel = [ac_tabs[t_ac] for _, _, t_ac in scan_info]
        q_sel = [qtables[qid] for _, qid in comps]
    except KeyError as e:
        raise ValueError(f"JPEG references missing table {e}") from e

    def read_block(ci: int) -> np.ndarray:
        zz = np.zeros(64, dtype=np.int64)
        size = reader.read_symbol(dc_sel[ci])
        if size > 11:
            raise ValueError("bad DC size")
        diff = _extend(reader.read_bits(size), size) if size else 0
        prev_dc[ci] += diff
        zz[0] = prev_dc[ci]
        i = 1
        while i < 64:
            sym = reader.read_symbol(ac_sel[ci])
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                i += 16
                continue
            run, size = sym >> 4, sym & 0xF
            i += run
            if i >= 64 or size == 0:
                raise ValueError("bad AC run/size")
            zz[i] = _extend(reader.read_bits(size), size)
            i += 1
        block = np.zeros(64, dtype=np.float64)
        block[_ZIGZAG] = zz
        return block.reshape(8, 8) * q_sel[ci]

    if sub:
        nmy, nmx = (h + 15) // 16, (w + 15) // 16
        coefs = [np.zeros((2 * nmy, 2 * nmx, 8, 8)),
                 np.zeros((nmy, nmx, 8, 8)), np.zeros((nmy, nmx, 8, 8))]
        for by in range(nmy):
            for bx in range(nmx):
                for dy in (0, 1):
                    for dx in (0, 1):
                        coefs[0][2 * by + dy, 2 * bx + dx] = read_block(0)
                coefs[1][by, bx] = read_block(1)
                coefs[2][by, bx] = read_block(2)
    else:
        nby, nbx = (h + 7) // 8, (w + 7) // 8
        coefs = [np.zeros((nby, nbx, 8, 8), dtype=np.float64) for _ in comps]
        for by in range(nby):
            for bx in range(nbx):
                for ci in range(n_comp):
                    coefs[ci][by, bx] = read_block(ci)

    planes = []
    for c in coefs:
        rec = np.einsum("ji,abjk,kl->abil", _DCTM, c, _DCTM) + 128.0
        nby_, nbx_ = rec.shape[:2]
        planes.append(np.clip(_unblocks(rec, nby_ * 8, nbx_ * 8), 0.0, 255.0))
    if n_comp == 1:
        out = np.repeat(planes[0][:h, :w][..., None], 3, axis=2)
        return np.clip(np.round(out), 0, 255).astype(np.uint8)
    if sub:
        y = planes[0][:h, :w]
        cbcr = [
            np.repeat(np.repeat(p, 2, axis=0), 2, axis=1)[:h, :w]
            for p in planes[1:]
        ]
        return _ycbcr_to_bgr(y, *cbcr)
    return _ycbcr_to_bgr(*(p[:h, :w] for p in planes))
