"""Baseline JPEG codec in pure numpy + stdlib — no external libraries.

Scope (honest and tested):
* ``decode_jpeg``: baseline sequential (SOF0) AND progressive huffman
  (SOF2 — spectral selection + successive approximation, multi-scan,
  EOB runs and refinement bits per the public libjpeg jdphuff
  algorithms) DCT JPEG, 8-bit, grayscale, YCbCr 4:4:4, or YCbCr 4:2:0
  (the camera/web layout: 2x2 luma blocks per MCU, chroma upsampled
  2x), huffman tables and quant tables read from the payload's own
  DHT/DQT segments. Refuses arithmetic coding, lossless/hierarchical
  frames, 12-bit, other samplings, and restart intervals with
  ValueError — the decodability dispatch in multimodal.py then falls
  back to the fake path.
* ``encode_jpeg`` / ``encode_jpeg_progressive``: emit exactly that
  subset (quality-scaled Annex-K style quant tables, huffman tables
  written into DHT), and ALSO return the mathematically expected
  decode: JPEG's loss happens entirely at quantization time — which is
  identical for both entropy orderings — and the encoder replays it
  through the identical dequantize→IDCT→color pipeline the decoder
  runs, so ``decode_jpeg(payload) == expected`` holds BIT-EXACTLY and
  the lossy codec gets deterministic round-trip tests.

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


def _quantize_planes(
    img: np.ndarray, quality: int, gray: bool, subsample: str
) -> tuple[list[np.ndarray], list[np.ndarray], bool, np.ndarray, int, int]:
    """Shared front half of both encoders (baseline and progressive
    differ ONLY in entropy-coding order): color transform, optional
    4:2:0 box filter, blockwise DCT + quantization. Returns
    (quantized[(nby, nbx, 8, 8) int64 per comp], qtabs, sub, expected,
    h, w) where ``expected`` replays the quantization loss through the
    decoder's own dequantize/IDCT/upsample/color pipeline."""
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
    return quantized, qtabs, sub, expected, h, w


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
    quantized, qtabs, sub, expected, h, w = _quantize_planes(
        img, quality, gray, subsample
    )
    ql, qc = qtabs[0], qtabs[-1]
    n_comp = len(quantized)

    dc_codes = _build_codes(_DC_BITS, _DC_VALS)
    ac_bits, ac_vals = _fixed_ac_spec()
    ac_codes = _build_codes(ac_bits, ac_vals)

    writer = _BitWriter()
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

    payload = (
        _headers(h, w, n_comp, sub, ql, qc, 0xC0, ac_bits, ac_vals)
        + _seg(0xDA, bytes([n_comp]) + b"".join(
            bytes([cid + 1, 0x00 if cid == 0 else 0x11])
            for cid in range(n_comp)
        ) + bytes([0, 63, 0]))
        + scan
        + b"\xff\xd9"  # EOI
    )
    return payload, expected


def _progressive_ac_spec() -> tuple[list[int], list[int]]:
    """AC huffman spec for progressive scans: the baseline symbol set
    plus the EOB-run length symbols 0x10..0xE0 (run-length category <<
    4, ITU T.81 G.1.2.2) = 176 symbols. Kraft sum = 2/4 + 4/16 + 8/64 +
    16/256 + 32/1024 + 64/4096 + 50/16384 = 0.9874 < 1 -> valid."""
    order = [0x00, 0xF0] + [n << 4 for n in range(1, 15)]
    for size in range(1, 11):
        for run in range(16):
            order.append((run << 4) | size)
    bits = [0] * 17
    for n, length in [(2, 2), (4, 4), (8, 6), (16, 8), (32, 10),
                      (64, 12), (50, 14)]:
        bits[length] = n
    assert sum(bits) == len(order) == 176
    return bits, order


def _encode_ac_first_scan(zqc, grid, ss, se, al, ac_codes) -> bytes:
    """Entropy-code one progressive AC 'first' scan (Ah=0): band
    [ss, se] of every block in raster order, magnitudes point-
    transformed by ``>> al`` (truncation toward zero), trailing zeros
    folded into cross-block EOB runs — the jcphuff.c
    encode_mcu_AC_first algorithm."""
    wtr = _BitWriter()
    eobrun = 0

    def emit_eobrun() -> None:
        nonlocal eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            code, ln = ac_codes[nb << 4]
            wtr.write(code, ln)
            if nb:
                wtr.write(eobrun, nb)
            eobrun = 0

    nby, nbx = grid
    for by in range(nby):
        for bx in range(nbx):
            blk = zqc[by, bx]
            r = 0
            for k in range(ss, se + 1):
                v = int(blk[k])
                t = -((-v) >> al) if v < 0 else v >> al
                if t == 0:
                    r += 1
                    continue
                emit_eobrun()
                while r > 15:
                    code, ln = ac_codes[0xF0]  # ZRL
                    wtr.write(code, ln)
                    r -= 16
                size, bits_v = _magnitude(t)
                code, ln = ac_codes[(r << 4) | size]
                wtr.write(code, ln)
                wtr.write(bits_v, size)
                r = 0
            if r:  # trailing zeros: block ends inside an EOB run
                eobrun += 1
                if eobrun == 0x7FFF:
                    emit_eobrun()
    emit_eobrun()
    return wtr.flush()


def _encode_ac_refine_scan(zqc, grid, ss, se, al, ac_codes) -> bytes:
    """Entropy-code one progressive AC refinement scan (Ah = al+1 ->
    Al = al): newly-nonzero coefficients get (run, 1) symbols + sign
    bits; already-nonzero ones get bare correction bits, buffered and
    flushed after the next emitted symbol so the decoder meets them in
    coefficient order — the jcphuff.c encode_mcu_AC_refine algorithm,
    correction-bit buffering included."""
    wtr = _BitWriter()
    eobrun = 0
    be: list[int] = []  # correction bits owed by blocks inside the EOB run

    def put(sym: int) -> None:
        code, ln = ac_codes[sym]
        wtr.write(code, ln)

    def emit_eobrun() -> None:
        nonlocal eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            put(nb << 4)
            if nb:
                wtr.write(eobrun, nb)
            eobrun = 0
            for b in be:
                wtr.write(b, 1)
            be.clear()

    nby, nbx = grid
    for by in range(nby):
        for bx in range(nbx):
            blk = zqc[by, bx]
            absv = []
            eob = ss - 1  # band index of the LAST newly-nonzero coef
            for k in range(ss, se + 1):
                t = abs(int(blk[k])) >> al
                absv.append(t)
                if t == 1:
                    eob = k
            r = 0
            br: list[int] = []  # correction bits pending within this block
            for k in range(ss, se + 1):
                t = absv[k - ss]
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob:
                    emit_eobrun()
                    put(0xF0)  # ZRL
                    r -= 16
                    for b in br:
                        wtr.write(b, 1)
                    br = []
                if t > 1:  # history coefficient: bare correction bit
                    br.append(t & 1)
                    continue
                emit_eobrun()  # newly nonzero: (run, 1) + sign
                put((r << 4) | 1)
                wtr.write(0 if int(blk[k]) < 0 else 1, 1)
                for b in br:
                    wtr.write(b, 1)
                br = []
                r = 0
            if r or br:
                eobrun += 1
                be.extend(br)
                if eobrun == 0x7FFF or len(be) > 1000:
                    emit_eobrun()
    emit_eobrun()
    return wtr.flush()


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 90,
    gray: bool = False,
    subsample: str = "444",
) -> tuple[bytes, np.ndarray]:
    """Encode (h, w, 3) uint8 BGR pixels as a PROGRESSIVE (SOF2) JPEG
    using both progression axes: spectral selection (DC scan, then AC
    bands 1-5 and 6-63 per component) and successive approximation
    (first scans at point transform Al=1, then DC and AC refinement
    scans down to Al=0). Quantization is identical to the baseline
    encoder — progressive JPEG reorders entropy coding only — so the
    returned ``expected`` array (same contract as ``encode_jpeg``)
    bit-exactly matches BOTH ``decode_jpeg(payload)`` and the baseline
    encoding of the same image."""
    quantized, qtabs, sub, expected, h, w = _quantize_planes(
        img, quality, gray, subsample
    )
    ql, qc = qtabs[0], qtabs[-1]
    n_comp = len(quantized)
    zq = [q.reshape(q.shape[:2] + (64,))[:, :, _ZIGZAG] for q in quantized]
    # non-interleaved AC scans walk each component's OWN ceil(dim/8)
    # grid; under 4:2:0 the luma plane was padded to the MCU grid, whose
    # extra blocks only the (interleaved) DC scan covers — they decode
    # with AC=0 and sit entirely outside the [:h, :w] crop
    if sub:
        acgrids = [((h + 7) // 8, (w + 7) // 8)] + [
            q.shape[:2] for q in quantized[1:]
        ]
    else:
        acgrids = [q.shape[:2] for q in quantized]

    dc_codes = _build_codes(_DC_BITS, _DC_VALS)
    ac_bits, ac_vals = _progressive_ac_spec()
    ac_codes = _build_codes(ac_bits, ac_vals)
    bands = ((1, 5), (6, 63))

    def mcu_blocks():
        """(scan_comp_index, zigzag block) in interleaved MCU order."""
        if sub:
            nmy, nmx = zq[1].shape[:2]
            for by in range(nmy):
                for bx in range(nmx):
                    for dy in (0, 1):
                        for dx in (0, 1):
                            yield 0, zq[0][2 * by + dy, 2 * bx + dx]
                    yield 1, zq[1][by, bx]
                    yield 2, zq[2][by, bx]
        else:
            nby, nbx = zq[0].shape[:2]
            for by in range(nby):
                for bx in range(nbx):
                    for ci in range(n_comp):
                        yield ci, zq[ci][by, bx]

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_ids)])
        for ci in comp_ids:
            t = 0 if ci == 0 else 1
            body += bytes([ci + 1, (t << 4) | t])
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    out = bytearray(_headers(h, w, n_comp, sub, ql, qc, 0xC2,
                             ac_bits, ac_vals))

    # scan 1: DC first, all components interleaved, Al=1 (DC point
    # transform is an arithmetic shift, ITU T.81 G.1.2.1)
    wtr = _BitWriter()
    prev = [0] * n_comp
    for ci, blk in mcu_blocks():
        v = int(blk[0]) >> 1
        diff = v - prev[ci]
        prev[ci] = v
        size, bits_v = _magnitude(diff)
        code, ln = dc_codes[size]
        wtr.write(code, ln)
        if size:
            wtr.write(bits_v, size)
    out += sos(list(range(n_comp)), 0, 0, 0, 1) + wtr.flush()

    for ci in range(n_comp):  # AC first scans, Al=1
        for ss_, se_ in bands:
            out += sos([ci], ss_, se_, 0, 1)
            out += _encode_ac_first_scan(
                zq[ci], acgrids[ci], ss_, se_, 1, ac_codes
            )

    # DC refinement: one raw bit (bit 0 of the full-precision DC) per
    # block in MCU order, no huffman coding
    wtr = _BitWriter()
    for _, blk in mcu_blocks():
        wtr.write(int(blk[0]) & 1, 1)
    out += sos(list(range(n_comp)), 0, 0, 1, 0) + wtr.flush()

    for ci in range(n_comp):  # AC refinement scans, Ah=1 -> Al=0
        for ss_, se_ in bands:
            out += sos([ci], ss_, se_, 1, 0)
            out += _encode_ac_refine_scan(
                zq[ci], acgrids[ci], ss_, se_, 0, ac_codes
            )

    out += b"\xff\xd9"  # EOI
    return bytes(out), expected


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _headers(
    h: int, w: int, n_comp: int, sub: bool, ql: np.ndarray, qc: np.ndarray,
    sof_marker: int, ac_bits: list[int], ac_vals: list[int],
) -> bytes:
    """SOI..DHT header run shared by the baseline and progressive
    encoders (they differ only in the SOF marker, the AC huffman spec,
    and everything after the headers)."""

    def dqt(tid: int, q: np.ndarray) -> bytes:
        zz = q.reshape(64)[_ZIGZAG].astype(np.uint8)
        return _seg(0xDB, bytes([tid]) + zz.tobytes())

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return _seg(
            0xC4, bytes([(cls << 4) | tid]) + bytes(bits[1:17]) + bytes(vals)
        )

    sof_comps = b"".join(
        bytes([cid + 1, 0x22 if (sub and cid == 0) else 0x11,
               0 if cid == 0 else 1])
        for cid in range(n_comp)
    )
    return (
        b"\xff\xd8"  # SOI
        + _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + dqt(0, ql)
        + (dqt(1, qc) if n_comp > 1 else b"")
        + _seg(sof_marker, bytes([8]) + h.to_bytes(2, "big")
               + w.to_bytes(2, "big") + bytes([n_comp]) + sof_comps)
        + dht(0, 0, _DC_BITS, _DC_VALS)
        + dht(1, 0, ac_bits, ac_vals)
        + (dht(0, 1, _DC_BITS, _DC_VALS) + dht(1, 1, ac_bits, ac_vals)
           if n_comp > 1 else b"")
    )


# --- decoder ----------------------------------------------------------------

def _scan_end(payload: bytes, start: int) -> int:
    """Index of the first real marker after ``start`` inside entropy
    data (skipping 0xFF00 byte stuffing and RST markers)."""
    i = start
    n = len(payload)
    while i + 1 < n:
        if payload[i] == 0xFF:
            nxt = payload[i + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                i += 2
                continue
            return i
        i += 1
    return n


def _comp_grids(frame) -> tuple[list, list]:
    """(padded, actual) per-component block-grid shapes. ``padded`` is
    the interleaved-MCU grid (baseline and progressive DC scans cover
    it); ``actual`` is the component's own ceil(dim/8) grid, which is
    all a NON-interleaved progressive AC scan transmits — padded-only
    blocks keep AC=0, and since they lie entirely outside the cropped
    [:h, :w] window this loses nothing."""
    h, w, comps, sub = frame
    cb = ((h + 7) // 8, (w + 7) // 8)
    if sub:
        nmy, nmx = (h + 15) // 16, (w + 15) // 16
        return ([(2 * nmy, 2 * nmx), (nmy, nmx), (nmy, nmx)],
                [cb, (nmy, nmx), (nmy, nmx)])
    return [cb] * len(comps), [cb] * len(comps)


def _ac_first_block(reader, tab, coef, ss, se, al, eobrun) -> int:
    """Decode band [ss, se] of one block in an AC 'first' scan (Ah=0);
    returns the updated cross-block EOB run (jdphuff.c
    decode_mcu_AC_first)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = reader.read_symbol(tab)
        r, s = sym >> 4, sym & 0xF
        if s == 0:
            if r == 15:  # ZRL: 16 zero coefficients
                k += 16
                continue
            eobrun = (1 << r) - 1  # this block closes the run too
            if r:
                eobrun += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("bad AC run in progressive scan")
        coef[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(reader, tab, coef, ss, se, al, eobrun) -> int:
    """Decode band [ss, se] of one block in an AC refinement scan
    (Ah > 0): already-nonzero coefficients consume one correction bit
    each, (run, 1) symbols place newly-nonzero ±(1 << al) values, EOB
    runs cover whole blocks whose history coefficients still get their
    correction bits — jdphuff.c decode_mcu_AC_refine, bit order
    included."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = reader.read_symbol(tab)
            r, s = sym >> 4, sym & 0xF
            val = 0
            if s:
                if s != 1:
                    raise ValueError("bad AC refine size")
                val = p1 if reader.read_bit() else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.read_bits(r)
                break
            # advance over r zero-HISTORY coefficients (16 for ZRL),
            # refining every nonzero one passed along the way
            while k <= se:
                if coef[k] != 0:
                    if reader.read_bit() and not (coef[k] & p1):
                        coef[k] += p1 if coef[k] >= 0 else m1
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if s:
                if k > se:
                    raise ValueError("AC refine overrun")
                coef[k] = val
            k += 1
    if eobrun > 0:
        # rest of the block rides the EOB run: correction bits only
        while k <= se:
            if coef[k] != 0 and reader.read_bit() and not (coef[k] & p1):
                coef[k] += p1 if coef[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _progressive_scan(
    data, frame, sel, ss, se, ah, al, dc_tabs, ac_tabs, zcoefs
) -> None:
    """Decode ONE progressive scan's entropy data into the per-
    component zigzag coefficient accumulators ``zcoefs``. DC scans
    (Ss=0) may be interleaved; AC scans are single-component and walk
    the component's own block grid. Mirrors the public libjpeg
    progressive decoder (jdphuff.c) for all four scan kinds."""
    h, w, comps, sub = frame
    if ah > 13 or al > 13:
        raise ValueError("bad successive-approximation parameters")
    order = {cid: i for i, (cid, _) in enumerate(comps)}
    try:
        idxs = [order[cid] for cid, _, _ in sel]
    except KeyError as e:
        raise ValueError(f"scan references unknown component {e}") from e
    padded, actual = _comp_grids(frame)
    reader = _BitReader(data)

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        if ah == 0:
            try:
                dc_sel = [dc_tabs[t] for _, t, _ in sel]
            except KeyError as e:
                raise ValueError(
                    f"JPEG references missing table {e}"
                ) from e
            prev = [0] * len(sel)

        def one(si: int, blk) -> None:
            if ah == 0:
                size = reader.read_symbol(dc_sel[si])
                if size > 11:
                    raise ValueError("bad DC size")
                diff = _extend(reader.read_bits(size), size) if size else 0
                prev[si] += diff
                blk[0] = prev[si] << al
            elif reader.read_bit():  # refinement: bare bit, OR into place
                blk[0] |= 1 << al

        if len(sel) > 1:  # interleaved MCU order over the padded grid
            if idxs != list(range(len(comps))):
                raise ValueError(
                    "unsupported progressive scan component order"
                )
            if sub:
                nmy, nmx = padded[1]
                for by in range(nmy):
                    for bx in range(nmx):
                        for dy in (0, 1):
                            for dx in (0, 1):
                                one(0, zcoefs[0][2 * by + dy, 2 * bx + dx])
                        one(1, zcoefs[1][by, bx])
                        one(2, zcoefs[2][by, bx])
            else:
                nby, nbx = padded[0]
                for by in range(nby):
                    for bx in range(nbx):
                        for si in range(len(sel)):
                            one(si, zcoefs[idxs[si]][by, bx])
        else:  # non-interleaved: the component's own grid
            nby, nbx = actual[idxs[0]]
            blocks = zcoefs[idxs[0]]
            for by in range(nby):
                for bx in range(nbx):
                    one(0, blocks[by, bx])
        return

    # AC scan: exactly one component (ITU T.81 G.1.1.1.1)
    if len(sel) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if not ss <= se <= 63:
        raise ValueError("bad spectral band")
    try:
        tab = ac_tabs[sel[0][2]]
    except KeyError as e:
        raise ValueError(f"JPEG references missing table {e}") from e
    blocks = zcoefs[idxs[0]]
    nby, nbx = actual[idxs[0]]
    step = _ac_first_block if ah == 0 else _ac_refine_block
    eobrun = 0
    for by in range(nby):
        for bx in range(nbx):
            eobrun = step(reader, tab, blocks[by, bx], ss, se, al, eobrun)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential (SOF0) OR progressive huffman
    (SOF2: spectral selection + successive approximation, multi-scan)
    JPEG — see the module docstring for the supported subset. Returns
    (h, w, 3) uint8 BGR, grayscale replicated — the same contract as
    decode_bmp/decode_png.

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
    progressive = False
    scan_info = None
    scan_data = None
    zcoefs = None  # progressive: per-comp (nby, nbx, 64) ints, zigzag order
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
                if len(b) < 65:
                    raise ValueError("truncated DQT body")
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
                if len(b) < 17:
                    raise ValueError("truncated DHT body")
                cls, tid = b[0] >> 4, b[0] & 0xF
                bits = [0] + list(b[1:17])
                n = sum(bits)
                if len(b) < 17 + n:
                    raise ValueError("truncated DHT body")
                vals = list(b[17 : 17 + n])
                tab = _build_decoder(bits, vals)
                (dc_tabs if cls == 0 else ac_tabs)[tid] = tab
                b = b[17 + n :]
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            # bounds-check BEFORE indexing: a corrupt payload whose segment
            # length is self-consistent but body is short must degrade as
            # ValueError (the _try_decode dirty-data contract), never
            # IndexError (which would fail the whole mapInPandas task).
            if len(body) < 6:
                raise ValueError("truncated SOF body")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            n_comp = body[5]
            if len(body) < 6 + 3 * n_comp:
                raise ValueError("truncated SOF body")
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
            progressive = marker == 0xC2
            if h <= 0 or w <= 0:
                raise ValueError("bad JPEG dimensions")
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported JPEG frame type (arithmetic/lossless/"
                "hierarchical)"
            )
        elif marker == 0xDD:  # DRI
            if int.from_bytes(body[:2], "big") != 0:
                raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG scan before frame header")
            if not body:
                raise ValueError("truncated SOS body")
            n_sc = body[0]
            if len(body) < 1 + 2 * n_sc:
                raise ValueError("truncated SOS body")
            sel = []
            for i in range(n_sc):
                cid, tabs = body[1 + 2 * i : 3 + 2 * i]
                sel.append((cid, tabs >> 4, tabs & 0xF))
            if not progressive:
                scan_info = sel
                scan_data = payload[pos + 2 + size :]
                break
            if len(body) < 4 + 2 * n_sc:
                raise ValueError("truncated progressive SOS header")
            ss, se = body[1 + 2 * n_sc], body[2 + 2 * n_sc]
            ah, al = body[3 + 2 * n_sc] >> 4, body[3 + 2 * n_sc] & 0xF
            data_start = pos + 2 + size
            end = _scan_end(payload, data_start)
            if zcoefs is None:
                padded, _ = _comp_grids(frame)
                zcoefs = [
                    np.zeros(s + (64,), dtype=np.int32) for s in padded
                ]
            _progressive_scan(
                payload[data_start:end], frame, sel, ss, se, ah, al,
                dc_tabs, ac_tabs, zcoefs,
            )
            pos = end
            continue
        pos += 2 + size

    if frame is None:
        raise ValueError("JPEG missing SOF/SOS")
    h, w, comps, sub = frame
    n_comp = len(comps)
    try:
        q_sel = [qtables[qid] for _, qid in comps]
    except KeyError as e:
        raise ValueError(f"JPEG references missing table {e}") from e

    if progressive:
        if zcoefs is None:
            raise ValueError("JPEG missing SOF/SOS")
        coefs = []
        for z, q in zip(zcoefs, q_sel):
            raster = np.zeros(z.shape[:2] + (64,), dtype=np.float64)
            raster[..., _ZIGZAG] = z
            coefs.append(raster.reshape(z.shape[:2] + (8, 8)) * q)
    else:
        if scan_info is None or scan_data is None:
            raise ValueError("JPEG missing SOF/SOS")
        reader = _BitReader(scan_data)
        prev_dc = [0] * n_comp
        try:
            dc_sel = [dc_tabs[t_dc] for _, t_dc, _ in scan_info]
            ac_sel = [ac_tabs[t_ac] for _, _, t_ac in scan_info]
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
            coefs = [
                np.zeros((nby, nbx, 8, 8), dtype=np.float64) for _ in comps
            ]
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
