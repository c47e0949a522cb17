"""Vendored pure-Python baseline JPEG codec (stdlib + numpy only).

The container ships no Pillow/cv2, so ``decoder="real"`` routed
``image/jpeg`` to a documented ``NotImplementedError`` through round 4
(the last unserved mainstream image format — the one an image-training-
data user hits first). This module implements ITU-T T.81 baseline
sequential JPEG from the public specification:

* **Decoder** — the full baseline pipeline: marker/segment parse (DQT
  with 8/16-bit precision, SOF0/SOF1, DHT, DRI, APPn/COM skip),
  entropy-segment destuffing and restart-marker splitting, canonical
  Huffman decode (DC DPCM + AC run-length with ZRL/EOB), dequantize,
  inverse zigzag, and a 2-D IDCT **vectorized across every block of a
  component at once** (two 8×8 matrix products against the orthonormal
  DCT basis, batched over the N×8×8 coefficient stack — the per-pixel
  loops that make the vendored PNG filters the slow path do not exist
  here), then chroma upsampling for 4:2:0/4:2:2 and YCbCr→RGB.
  Progressive (SOF2) and arithmetic-coded files raise
  ``NotImplementedError`` honestly.
* **Encoder** — baseline sequential with the Annex K example tables
  (quantization + Huffman), 4:4:4 (no subsampling), greyscale or RGB;
  used for test fixtures and the derived-media ops. Constant-valued
  8×8 blocks whose level-shifted DC is a multiple of the DC quant step
  round-trip **bit-exactly** (all AC coefficients are analytically
  zero), which is what makes a closed-form SQL oracle over the real
  lossy container possible (`jpeg_decode_stats_documents`).

All decode work happens inside actor-pool ``map_batches`` stages (see
`multimodal.py`); payload bytes never enter a shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants (ITU-T T.81 Annex K example tables — public spec)
# ---------------------------------------------------------------------------

# zigzag scan order: position k of the scan reads row-major index ZIGZAG[k]
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Huffman table specs: (counts for code lengths 1..16, symbol values)
DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis: forward F = C·B·Cᵀ, inverse
    B = Cᵀ·F·C."""
    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    c = np.cos((2 * n + 1) * k * np.pi / 16)
    c[0] *= np.sqrt(1 / 8)
    c[1:] *= np.sqrt(2 / 8)
    return c


_C = _dct_matrix()


def _build_enc_codes(spec: tuple) -> dict[int, tuple[int, int]]:
    """Canonical Huffman codebook: symbol → (code, length)."""
    counts, vals = spec
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_dec_codes(counts: list[int], vals: list[int]) -> dict:
    """Canonical Huffman decode table: (length, code) → symbol."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


@__import__("functools").lru_cache(maxsize=64)
def _dec_codes_cached(spec_bytes: bytes) -> dict:
    """Decode-table memo keyed by the DHT payload bytes — a corpus of
    same-encoder files (the common case) rebuilds each table once per
    actor instead of once per payload."""
    counts = list(spec_bytes[:16])
    return _build_dec_codes(counts, list(spec_bytes[16:]))


def _category(v: int) -> tuple[int, int]:
    """JPEG magnitude category: size (bit length of |v|) and the
    amplitude bits (one's-complement form for negatives)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    """Inverse of `_category`: amplitude bits → signed value."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, bits: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (bits & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.n) - 1 if self.n else 0

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


# encoder codebooks are module constants (built once per process)
_ENC_DC_LUM = _build_enc_codes(DC_LUM)
_ENC_AC_LUM = _build_enc_codes(AC_LUM)
_ENC_DC_CHROMA = _build_enc_codes(DC_CHROMA)
_ENC_AC_CHROMA = _build_enc_codes(AC_CHROMA)


# ---------------------------------------------------------------------------
# encoder (baseline sequential, 4:4:4, Annex K tables)
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack([r, g, b], axis=-1)


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H,W) plane (H,W multiples of 8) → (N,8,8) row-major block stack."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _blocks_plane(blocks: np.ndarray, by: int, bx: int) -> np.ndarray:
    """(N,8,8) block stack in row-major block order → (8·by, 8·bx)."""
    return (
        blocks.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    )


def _encode_component(
    writer: _BitWriter,
    qcoef: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    pred: int,
) -> int:
    """Huffman-encode one component's quantized zigzag coefficients
    ((N,64) int array); returns the updated DC predictor."""
    for row in qcoef:
        diff = int(row[0]) - pred
        pred = int(row[0])
        size, bits = _category(diff)
        code, length = dc_codes[size]
        writer.write(code, length)
        writer.write(bits, size)
        run = 0
        nz = np.nonzero(row[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(row[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]  # ZRL
                writer.write(code, length)
                run -= 16
            size, bits = _category(v)
            code, length = ac_codes[(run << 4) | size]
            writer.write(code, length)
            writer.write(bits, size)
            run = 0
        if last < 63:
            code, length = ac_codes[0x00]  # EOB
            writer.write(code, length)
    return pred


def encode_jpeg(
    pixels: np.ndarray,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline sequential JPEG: greyscale (H,W) or RGB (H,W,3) uint8,
    Annex K quantization + Huffman tables. ``subsampling`` is ``"444"``
    (one block per component per MCU) or ``"420"`` (2×2 luma blocks +
    2×2-mean-subsampled chroma); ``restart_interval`` > 0 emits DRI +
    RST0-7 markers every that many MCUs. Both options exist so the
    decoder's full MCU-interleave / upsample / restart surface is
    exercised by round-trip tests."""
    px = np.asarray(pixels)
    if px.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8 pixels")
    grey = px.ndim == 2
    if not grey and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError("encode_jpeg expects (H,W) grey or (H,W,3) RGB")
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if grey:
        planes = [px.astype(np.float64)]
        qtables, qids = [Q_LUM], [0]
        sampling = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(px.astype(np.float64))
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        qtables, qids = [Q_LUM, Q_CHROMA, Q_CHROMA], [0, 1, 1]
        if subsampling == "444":
            sampling = [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "420":
            sampling = [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError("subsampling must be '444' or '420'")
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    def _pad(p: np.ndarray, th: int, tw: int) -> np.ndarray:
        pp = np.empty((th, tw), dtype=np.float64)
        sh, sw = p.shape
        pp[:sh, :sw] = p
        pp[sh:, :sw] = p[-1:, :]
        pp[:, sw:] = pp[:, sw - 1 : sw]
        return pp

    # per-component: (maybe subsample, then) pad to its MCU-grid size,
    # DCT + quantize into a row-major (BY·BX, 64) zigzag stack
    qcoefs, dims = [], []
    for ci, (p, q) in enumerate(zip(planes, qtables)):
        sh, sv = sampling[ci]
        if (sh, sv) != (hmax, vmax):
            fy, fx = vmax // sv, hmax // sh
            ph, pw = -(-p.shape[0] // fy) * fy, -(-p.shape[1] // fx) * fx
            p = _pad(p, ph, pw)
            p = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        by, bx = mcuy * sv, mcux * sh
        p = _pad(p, by * 8, bx * 8)
        blocks = _plane_blocks(p) - 128.0
        coef = _C @ blocks @ _C.T
        flat = coef.reshape(-1, 64)[:, ZIGZAG]
        qcoefs.append(np.round(flat / q[ZIGZAG]).astype(np.int64))
        dims.append((by, bx))

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, payload: bytes) -> None:
        out.extend(struct.pack(">HH", marker, len(payload) + 2))
        out.extend(payload)

    seg(0xFFDB, bytes([0x00]) + bytes(int(v) for v in Q_LUM[ZIGZAG]))
    if not grey:
        seg(0xFFDB, bytes([0x01]) + bytes(int(v) for v in Q_CHROMA[ZIGZAG]))
    ncomp = 1 if grey else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (sampling[ci][0] << 4) | sampling[ci][1], qids[ci]])
    seg(0xFFC0, sof)
    specs = [(0x00, DC_LUM), (0x10, AC_LUM)]
    if not grey:
        specs += [(0x01, DC_CHROMA), (0x11, AC_CHROMA)]
    for tc_th, (counts, vals) in specs:
        seg(0xFFC4, bytes([tc_th]) + bytes(counts) + bytes(vals))
    if restart_interval:
        seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    seg(0xFFDA, sos)

    writer = _BitWriter()
    dc_l, ac_l = _ENC_DC_LUM, _ENC_AC_LUM
    dc_c, ac_c = _ENC_DC_CHROMA, _ENC_AC_CHROMA
    preds = [0] * ncomp
    rst = 0
    total = mcux * mcuy
    for mcu in range(total):
        if restart_interval and mcu and mcu % restart_interval == 0:
            writer.flush()
            writer.buf.extend((0xFF, 0xD0 + (rst % 8)))
            rst += 1
            preds = [0] * ncomp
        my, mx = divmod(mcu, mcux)
        for ci in range(ncomp):
            dc, ac = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
            sh, sv = sampling[ci]
            _by, bx = dims[ci]
            for v in range(sv):
                for hh in range(sh):
                    bidx = (my * sv + v) * bx + (mx * sh + hh)
                    preds[ci] = _encode_component(
                        writer, qcoefs[ci][bidx : bidx + 1], dc, ac, preds[ci]
                    )
    writer.flush()
    out.extend(writer.buf)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder (baseline sequential; SOF0/SOF1, DRI/RSTn, 4:4:4/4:2:2/4:2:0)
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.d = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.d):
                raise ValueError("truncated JPEG entropy data")
            self.acc = self.d[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, size: int) -> int:
        v = 0
        for _ in range(size):
            v = (v << 1) | self.bit()
        return v


def _decode_sym(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG entropy data")


def _split_entropy(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Destuff the entropy-coded segment beginning at ``start``:
    returns the list of restart intervals (0xFF00 → 0xFF, split at
    RST0-7) and the offset of the terminating marker's 0xFF."""
    intervals: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # restart marker
            intervals.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    intervals.append(bytes(cur))
    return intervals, i


def _parse_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to (H,W,C) uint8 pixels (C = 1 or 3)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    i = 2
    n = len(payload)
    while i < n:
        if payload[i] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes — skip to the last 0xFF of the run
        while i + 1 < n and payload[i + 1] == 0xFF:
            i += 1
        if i + 1 >= n:
            raise ValueError("truncated JPEG segment")
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            raise ValueError("truncated JPEG segment")
        length = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        seg = payload[i + 4 : i + 2 + length]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq == 0:
                    vals = np.frombuffer(seg[j : j + 64], dtype=np.uint8)
                    j += 64
                else:
                    vals = np.frombuffer(seg[j : j + 128], dtype=">u2")
                    j += 128
                table = np.zeros(64, dtype=np.int64)
                table[ZIGZAG] = vals.astype(np.int64)
                qtables[tq] = table
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 extended seq.
            precision, fh, fw, ncomp = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise NotImplementedError("only 8-bit JPEG precision supported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "progressive/hierarchical/arithmetic JPEG not supported "
                "(baseline sequential only)"
            )
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                nv = sum(seg[j + 1 : j + 17])
                htables[(tc, th)] = _dec_codes_cached(
                    bytes(seg[j + 1 : j + 17 + nv])
                )
                j += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c : 3 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0x0F))
            intervals, _end = _split_entropy(payload, i + 2 + length)
            return _decode_scan(frame, scan, qtables, htables,
                                restart_interval, intervals)
        i += 2 + length
    raise ValueError("JPEG contains no SOS scan")


def _decode_scan(
    frame: dict,
    scan: list,
    qtables: dict,
    htables: dict,
    restart_interval: int,
    intervals: list[bytes],
) -> np.ndarray:
    fh, fw = frame["h"], frame["w"]
    comps = [s[0] for s in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("invalid JPEG sampling factors")
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    # coefficient planes, one (BY·BX, 64) stack per component
    dims = []
    coef = []
    for c in comps:
        by, bx = mcuy * c["v"], mcux * c["h"]
        dims.append((by, bx))
        coef.append(np.zeros((by * bx, 64), dtype=np.int64))

    reader = _BitReader(intervals[0])
    interval_idx = 0
    preds = [0] * len(comps)
    mcu = 0
    total = mcux * mcuy
    while mcu < total:
        if restart_interval and mcu and mcu % restart_interval == 0:
            interval_idx += 1
            if interval_idx >= len(intervals):
                raise ValueError("JPEG missing restart interval data")
            reader = _BitReader(intervals[interval_idx])
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, (comp, dc_id, ac_id) in enumerate(scan):
            dc_tab = htables.get((0, dc_id))
            ac_tab = htables.get((1, ac_id))
            if dc_tab is None or ac_tab is None:
                raise ValueError("JPEG scan references undefined Huffman table")
            by, bx = dims[ci]
            for v in range(comp["v"]):
                for hh in range(comp["h"]):
                    row = np.zeros(64, dtype=np.int64)
                    size = _decode_sym(reader, dc_tab)
                    preds[ci] += _extend(reader.receive(size), size)
                    row[0] = preds[ci]
                    k = 1
                    while k < 64:
                        sym = _decode_sym(reader, ac_tab)
                        if sym == 0x00:  # EOB
                            break
                        run, size = sym >> 4, sym & 0x0F
                        if size == 0:
                            if run != 15:
                                raise ValueError("invalid JPEG AC symbol")
                            k += 16  # ZRL
                            continue
                        k += run
                        if k > 63:
                            raise ValueError("JPEG AC coefficient overrun")
                        row[k] = _extend(reader.receive(size), size)
                        k += 1
                    bidx = (my * comp["v"] + v) * bx + (mx * comp["h"] + hh)
                    coef[ci][bidx] = row
        mcu += 1

    # dequantize + inverse zigzag + batched IDCT per component
    planes = []
    for ci, (comp, _dc, _ac) in enumerate(scan):
        q = qtables.get(comp["tq"])
        if q is None:
            raise ValueError("JPEG component references undefined quant table")
        dezig = np.zeros_like(coef[ci])
        dezig[:, ZIGZAG] = coef[ci] * q[ZIGZAG]
        blocks = _C.T @ dezig.reshape(-1, 8, 8).astype(np.float64) @ _C
        by, bx = dims[ci]
        plane = _blocks_plane(blocks, by, bx) + 128.0
        # upsample to full MCU-grid resolution, then crop to frame size
        plane = np.repeat(
            np.repeat(plane, vmax // comp["v"], axis=0), hmax // comp["h"], axis=1
        )
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        out = planes[0][..., None]
    elif len(planes) == 3:
        out = _ycbcr_to_rgb(planes[0], planes[1], planes[2])
    else:
        raise NotImplementedError(f"{len(planes)}-component JPEG not supported")
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def decode_jpeg_pixels(payload: bytes) -> np.ndarray:
    """Decode to (H,W,C) uint8 pixels (C=1 greyscale, C=3 RGB)."""
    return _parse_jpeg(payload)


def resize_jpeg(payload: bytes, width: int, height: int) -> bytes:
    """Real nearest-neighbor JPEG resize: decode → index-map → re-encode."""
    px = _parse_jpeg(payload)
    h, w, c = px.shape
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    out = px[yi][:, xi]
    return encode_jpeg(out[..., 0] if c == 1 else out)
