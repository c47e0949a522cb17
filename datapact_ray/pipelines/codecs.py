"""Vendored pure-Python media codecs (stdlib + numpy only).

The container ships no Pillow/cv2/ffmpeg, so ``decoder="real"`` in
`multimodal.py` was a documented ``NotImplementedError`` through round 3.
This module closes that gap for two formats whose containers are simple
enough to implement from their public specifications:

* **WAV** (RIFF PCM) via the stdlib ``wave`` module — decode (params +
  sample statistics), encode (test fixtures), and real frame-sampling
  (fixed-duration windows re-encoded as standalone WAV clips).
* **BMP** (Windows ``BITMAPINFOHEADER``, uncompressed 24-bit BI_RGB) via
  ``struct`` — decode (dimensions + channel statistics), encode, and a
  real nearest-neighbor resize.
* **PNG** (8-bit greyscale/RGB/RGBA, non-interlaced) via ``zlib`` +
  ``struct`` — a genuinely compressed container: chunk CRC verification,
  IDAT inflate, and full scanline unfiltering (all five spec filter
  types), plus encode and nearest-neighbor resize.
* **MP4 / ISO BMFF** (MPEG-4 Part 12) via ``struct`` — box-tree walk,
  mvhd/tkhd/hdlr metadata, full sample-table resolution
  (stts/stsz/stsc/stco|co64 → absolute byte ranges), and codec-copy
  frame extraction (the encoded samples sliced out of mdat, exactly
  what ``ffmpeg -c copy`` ships — no codec decode exists or is needed
  to cut samples), plus a structurally valid one-track encoder.

* **JPEG** (baseline sequential, ITU-T T.81) via the sibling
  `jpeg_codec.py` — full entropy decode (canonical Huffman, DC DPCM,
  AC run-length, restart markers), dequantize and a batched IDCT
  vectorized across every block of a component, 4:4:4/4:2:2/4:2:0
  chroma upsampling and YCbCr→RGB; plus a baseline encoder (Annex K
  tables) and nearest-neighbor resize. Progressive (SOF2) and
  arithmetic-coded files raise ``NotImplementedError``.

These are real decoders: they parse the actual container bytes, reject
malformed payloads, and their outputs are verified against closed-form
oracles in tests. Formats beyond WAV/BMP/PNG/JPEG/MP4 still raise
``NotImplementedError`` with an injection hint — honest about what the
container can and cannot decode.

All decode work happens inside actor-pool ``map_batches`` stages (see
`multimodal.py`); payload bytes never enter a shuffle.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# uniform feature schema across media kinds so a mixed-type dataset
# still produces one stable Arrow schema (audio rows fill image fields
# with 0 and vice versa)
_FEATURE_KEYS = (
    "n_bytes",
    "sample_rate",
    "n_samples",
    "duration_ms",
    "width",
    "height",
    "n_pixels",
    "mean_value",
    "rms",
)


# ---------------------------------------------------------------------------
# WAV (RIFF PCM) — stdlib `wave`
# ---------------------------------------------------------------------------


def encode_wav(
    samples: np.ndarray | bytes, sample_rate: int = 1000, sampwidth: int = 1
) -> bytes:
    """PCM mono WAV. ``sampwidth=1`` expects uint8 samples (bytes are
    taken verbatim as 8-bit unsigned PCM), ``sampwidth=2`` int16."""
    if isinstance(samples, np.ndarray):
        want = np.uint8 if sampwidth == 1 else np.int16
        raw = np.ascontiguousarray(samples.astype(want, copy=False)).tobytes()
    else:
        raw = bytes(samples)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        w.writeframes(raw)
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """Parse a PCM WAV container and return decoded-signal features.

    ``duration_ms`` is exact integer math scaled by 1000 before the
    divide; ``rms``/``mean_value`` are computed over the decoded samples
    (uint8 PCM is centered at 128 per the format's unsigned convention)."""
    with wave.open(io.BytesIO(payload)) as w:
        n_channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        rate = w.getframerate()
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)
    if sampwidth == 1:
        arr = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    elif sampwidth == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    else:
        raise NotImplementedError(f"PCM sample width {sampwidth} not supported")
    n_samples = n_frames * n_channels
    out = dict.fromkeys(_FEATURE_KEYS, 0.0)
    out.update(
        n_bytes=len(payload),
        sample_rate=rate,
        n_samples=int(n_samples),
        duration_ms=int(n_frames * 1000 // rate) if rate else 0,
        mean_value=float(arr.mean()) if arr.size else 0.0,
        rms=float(np.sqrt(np.mean(arr * arr))) if arr.size else 0.0,
    )
    return out


def sample_wav_windows(payload: bytes, every_ms: int) -> list[bytes]:
    """Real frame-sampling for audio: cut the decoded PCM stream into
    ``every_ms`` windows and re-encode each as a standalone WAV clip —
    the audio analog of keyframe extraction."""
    with wave.open(io.BytesIO(payload)) as w:
        n_channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    frame_bytes = n_channels * sampwidth
    window_frames = max(1, rate * every_ms // 1000)
    step = window_frames * frame_bytes
    clips = []
    for off in range(0, len(raw), step):
        chunk = raw[off : off + step]
        buf = io.BytesIO()
        with wave.open(buf, "wb") as out:
            out.setnchannels(n_channels)
            out.setsampwidth(sampwidth)
            out.setframerate(rate)
            out.writeframes(chunk)
        clips.append(buf.getvalue())
    return clips


# ---------------------------------------------------------------------------
# BMP (uncompressed 24-bit BI_RGB) — `struct`
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """RGB HxWx3 uint8 array → 24-bit bottom-up BI_RGB BMP."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_bmp expects an HxWx3 array")
    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    img_size = row_bytes * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return header + info + rows.tobytes()


def _parse_bmp(payload: bytes) -> np.ndarray:
    """BMP container → HxWx3 uint8 RGB array (top-down)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    header_size, w, h = struct.unpack_from("<Iii", payload, 14)
    if header_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (got bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    need = offset + row_bytes * h
    if len(payload) < need:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h, offset=offset)
    rows = rows.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1]  # BGR → RGB


def decode_bmp(payload: bytes) -> dict:
    """Parse a BMP container and return decoded-pixel features."""
    px = _parse_bmp(payload)
    h, w, _ = px.shape
    flat = px.astype(np.float64)
    out = dict.fromkeys(_FEATURE_KEYS, 0.0)
    out.update(
        n_bytes=len(payload),
        sample_rate=0,
        n_samples=0,
        duration_ms=0,
        width=int(w),
        height=int(h),
        n_pixels=int(w * h),
        mean_value=float(flat.mean()) if flat.size else 0.0,
        rms=float(np.sqrt(np.mean(flat * flat))) if flat.size else 0.0,
    )
    return out


def resize_bmp(payload: bytes, width: int, height: int) -> bytes:
    """Real nearest-neighbor BMP resize: decode → index-map → re-encode."""
    px = _parse_bmp(payload)
    h, w, _ = px.shape
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return encode_bmp(px[yi][:, xi])


# ---------------------------------------------------------------------------
# PNG (8-bit greyscale / RGB / RGBA, non-interlaced) — `zlib` + `struct`
# ---------------------------------------------------------------------------
#
# A real DEFLATE-compressed container: chunk framing with CRC-32
# verification, IHDR validation, concatenated-IDAT inflate, and full
# scanline unfiltering (all five filter types of the public PNG spec).
# Filters 0/1/2 decode vectorized (Sub is a per-byte-lane cumsum mod 256
# along the pixel axis); Average/Paeth carry a left-neighbor dependency
# and decode with a per-pixel row loop (encoders here never emit them,
# but third-party PNGs do — tests cover all five).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # color_type → samples per pixel


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 array → PNG. HxW → greyscale, HxWx3 → RGB, HxWx4 → RGBA.
    ``filter_type`` 0 (None), 1 (Sub) or 2 (Up) is applied to every
    scanline (vectorized filter math; 1/2 exercise real unfiltering on
    the decode side)."""
    import zlib

    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    if pixels.ndim != 3 or pixels.shape[2] not in (1, 3, 4):
        raise ValueError("encode_png expects HxW, HxWx3 or HxWx4")
    h, w, c = pixels.shape
    if h < 1 or w < 1:
        raise ValueError("encode_png needs at least one pixel")
    color_type = {1: 0, 3: 2, 4: 6}[c]
    raw = np.ascontiguousarray(pixels, dtype=np.uint8).reshape(h, w * c)
    if filter_type == 0:
        filt = raw
    elif filter_type == 1:  # Sub: filt[x] = raw[x] - raw[x - bpp]
        lanes = raw.reshape(h, w, c).astype(np.int16)
        filt = (np.diff(lanes, axis=1, prepend=0) % 256).astype(np.uint8)
        filt = filt.reshape(h, w * c)
    elif filter_type == 2:  # Up: filt[x] = raw[x] - prior[x]
        filt = (raw.astype(np.int16) - np.vstack([np.zeros((1, w * c), np.int16), raw[:-1].astype(np.int16)])) % 256
        filt = filt.astype(np.uint8)
    else:
        raise NotImplementedError("encode_png emits filter types 0/1/2 only")
    scanlines = np.hstack(
        [np.full((h, 1), filter_type, dtype=np.uint8), filt]
    ).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(scanlines))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def _parse_png(payload: bytes) -> np.ndarray:
    """PNG container → HxWxC uint8 array (C in {1,3,4}). Verifies chunk
    CRCs, inflates the concatenated IDAT stream, and unfilters."""
    import zlib

    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or color_type not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"only 8-bit greyscale/RGB/RGBA PNGs supported (depth={depth}, "
            f"color_type={color_type})"
        )
    if comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError("interlaced / nonstandard PNGs not supported")
    c = _PNG_CHANNELS[color_type]
    stride = w * c
    data = zlib.decompress(b"".join(idat))
    if len(data) != h * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    rows = np.frombuffer(data, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = rows[:, 0]
    filt_rows = rows[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f, row = int(ftypes[y]), filt_rows[y]
        if f == 0:
            rec = row % 256
        elif f == 1:  # Sub: per-lane cumsum along the pixel axis
            rec = np.cumsum(row.reshape(w, c), axis=0, dtype=np.int64) % 256
            rec = rec.reshape(stride)
        elif f == 2:  # Up
            rec = (row + prev) % 256
        elif f in (3, 4):  # Average / Paeth: left-dependent, per-pixel loop
            rl = row.reshape(w, c)
            ul = prev.reshape(w, c)
            rec2 = np.zeros((w, c), dtype=np.int32)
            left = np.zeros(c, dtype=np.int32)
            ul_prev = np.zeros(c, dtype=np.int32)
            for x in range(w):
                if f == 3:
                    rec2[x] = (rl[x] + (left + ul[x]) // 2) % 256
                else:
                    pred = np.array(
                        [
                            _paeth(int(left[i]), int(ul[x][i]), int(ul_prev[i]))
                            for i in range(c)
                        ],
                        dtype=np.int32,
                    )
                    rec2[x] = (rl[x] + pred) % 256
                left = rec2[x]
                ul_prev = ul[x].astype(np.int32)
            rec = rec2.reshape(stride)
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec.astype(np.int32)
    return out.reshape(h, w, c)


def decode_png(payload: bytes) -> dict:
    """Parse a PNG container and return decoded-pixel features."""
    px = _parse_png(payload)
    h, w, _ = px.shape
    flat = px.astype(np.float64)
    out = dict.fromkeys(_FEATURE_KEYS, 0.0)
    out.update(
        n_bytes=len(payload),
        sample_rate=0,
        n_samples=0,
        duration_ms=0,
        width=int(w),
        height=int(h),
        n_pixels=int(w * h),
        mean_value=float(flat.mean()) if flat.size else 0.0,
        rms=float(np.sqrt(np.mean(flat * flat))) if flat.size else 0.0,
    )
    return out


def resize_png(payload: bytes, width: int, height: int) -> bytes:
    """Real nearest-neighbor PNG resize: decode → index-map → re-encode."""
    px = _parse_png(payload)
    h, w, _ = px.shape
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return encode_png(px[yi][:, xi])


# ---------------------------------------------------------------------------
# MP4 / ISO BMFF (MPEG-4 Part 12) — `struct`
# ---------------------------------------------------------------------------
#
# A real container parser for the video path: walks the box tree
# (size+fourcc framing, container recursion through moov/trak/mdia/
# minf/stbl), reads mvhd (timescale/duration, versions 0 and 1), tkhd
# (16.16 fixed-point track dimensions), hdlr (track kind) and the
# sample tables (stts/stsz/stsc/stco|co64), and resolves every sample's
# absolute byte range in mdat. Frame "sampling" is codec-copy exactly
# like `ffmpeg -c copy`: the encoded sample payloads are sliced out of
# mdat by the table-resolved ranges — real extraction with no codec
# decode (none exists in this container, and none is needed to cut
# samples). The encoder synthesizes a structurally valid one-track file
# (ftyp + mdat + moov) for fixtures and the derived-media ops.

_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf"}


def _mp4_box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _mp4_full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _mp4_box(fourcc, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


def encode_mp4(
    samples: list[bytes],
    width: int = 16,
    height: int = 16,
    sample_duration_ms: int = 100,
) -> bytes:
    """Encoded sample payloads → a structurally valid one-video-track
    MP4 (timescale 1000, uniform sample duration). The sample bytes are
    stored verbatim in mdat with full stts/stsz/stsc/stco tables."""
    if not samples:
        raise ValueError("encode_mp4 needs at least one sample")
    n = len(samples)
    dur = n * sample_duration_ms
    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat_payload = b"".join(samples)
    mdat = _mp4_box(b"mdat", mdat_payload)
    chunk_offset = len(ftyp) + 8  # absolute offset of the first sample
    mvhd = _mp4_full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, 1000, dur)
        + struct.pack(">IH", 0x00010000, 0x0100)
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = _mp4_full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, dur)
        + b"\x00" * 16
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _mp4_full(
        b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, 1000, dur, 0x55C4, 0)
    )
    hdlr = _mp4_full(
        b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"v\x00"
    )
    stsd = _mp4_full(
        b"stsd", 0, 0,
        struct.pack(">I", 1)
        + _mp4_box(
            b"mp4v",
            b"\x00" * 6
            + struct.pack(">H", 1)
            + b"\x00" * 16
            + struct.pack(">HH", width, height)
            + struct.pack(">IIIH", 0x00480000, 0x00480000, 0, 1)
            + b"\x00" * 32
            + struct.pack(">Hh", 0x18, -1),
        ),
    )
    stts = _mp4_full(
        b"stts", 0, 0, struct.pack(">III", 1, n, sample_duration_ms)
    )
    stsc = _mp4_full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _mp4_full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = _mp4_full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    vmhd = _mp4_full(b"vmhd", 0, 1, b"\x00" * 8)
    dref = _mp4_full(
        b"dref", 0, 0, struct.pack(">I", 1) + _mp4_full(b"url ", 0, 1, b"")
    )
    stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _mp4_box(b"minf", vmhd + _mp4_box(b"dinf", dref) + stbl)
    mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
    trak = _mp4_box(b"trak", tkhd + mdia)
    moov = _mp4_box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _mp4_walk(payload: bytes, start: int, end: int, found: dict) -> None:
    pos = start
    while pos + 8 <= end:
        size, fourcc = struct.unpack_from(">I4s", payload, pos)
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize box")
            (size,) = struct.unpack_from(">Q", payload, pos + 8)
            body = pos + 16
        elif size == 0:  # box extends to EOF
            size = end - pos
            body = pos + 8
        else:
            body = pos + 8
        if size < body - pos or pos + size > end:
            raise ValueError(f"truncated MP4 box {fourcc!r}")
        if fourcc in _MP4_CONTAINERS:
            _mp4_walk(payload, body, pos + size, found)
        else:
            found.setdefault(fourcc, []).append((body, pos + size))
        pos += size


def _parse_mp4(payload: bytes) -> dict:
    """MP4 container → structural metadata + resolved sample byte
    ranges. Supports version-0/1 mvhd, 32/64-bit chunk offsets, and the
    one-video-track layout; multi-stts-entry (variable frame duration)
    files resolve ranges but report uniform timing as unsupported for
    time-indexed sampling."""
    if len(payload) < 8:
        raise ValueError("not an MP4 payload")
    size, fourcc = struct.unpack_from(">I4s", payload, 0)
    if fourcc != b"ftyp":
        raise ValueError("not an MP4 payload (missing ftyp)")
    found: dict = {}
    _mp4_walk(payload, 0, len(payload), found)
    if b"mvhd" not in found or b"stsz" not in found:
        raise ValueError("MP4 missing moov sample tables")

    def one(cc: bytes) -> tuple[int, int]:
        return found[cc][0]

    b, e = one(b"mvhd")
    version = payload[b]
    if version == 1:
        timescale, duration = struct.unpack_from(">IQ", payload, b + 4 + 16)
    else:
        _, _, timescale, duration = struct.unpack_from(">IIII", payload, b + 4)
    width = height = 0
    if b"tkhd" in found:
        tb, te = one(b"tkhd")
        w16, h16 = struct.unpack_from(">II", payload, te - 8)
        width, height = w16 >> 16, h16 >> 16
    # stsz: sample sizes
    sb, se = one(b"stsz")
    fixed, count = struct.unpack_from(">II", payload, sb + 4)
    if fixed:
        sizes = [fixed] * count
    else:
        sizes = list(struct.unpack_from(f">{count}I", payload, sb + 12))
    # stts: (count, delta) runs — per-sample durations
    tb2, _ = one(b"stts")
    (nruns,) = struct.unpack_from(">I", payload, tb2 + 4)
    runs = [
        struct.unpack_from(">II", payload, tb2 + 8 + 8 * i) for i in range(nruns)
    ]
    # stsc: chunk → samples-per-chunk map; stco/co64: chunk offsets
    cb, _ = one(b"stsc")
    (nmap,) = struct.unpack_from(">I", payload, cb + 4)
    smap = [
        struct.unpack_from(">III", payload, cb + 8 + 12 * i) for i in range(nmap)
    ]
    if b"stco" in found:
        ob, _ = one(b"stco")
        (nch,) = struct.unpack_from(">I", payload, ob + 4)
        offsets = list(struct.unpack_from(f">{nch}I", payload, ob + 8))
    else:
        ob, _ = one(b"co64")
        (nch,) = struct.unpack_from(">I", payload, ob + 4)
        offsets = list(struct.unpack_from(f">{nch}Q", payload, ob + 8))
    # resolve each sample's absolute (offset, size)
    ranges: list[tuple[int, int]] = []
    si = 0
    for ci, chunk_off in enumerate(offsets, start=1):
        per = next(
            (s for first, s, _d in reversed(smap) if first <= ci), None
        )
        if per is None:
            raise ValueError("MP4 stsc does not cover chunk")
        off = chunk_off
        for _ in range(per):
            if si >= len(sizes):
                break
            ranges.append((off, sizes[si]))
            off += sizes[si]
            si += 1
    if si != len(sizes):
        raise ValueError("MP4 sample tables inconsistent")
    return {
        "timescale": timescale,
        "duration": duration,
        "width": width,
        "height": height,
        "sizes": sizes,
        "ranges": ranges,
        "stts_runs": runs,
    }


def decode_mp4(payload: bytes) -> dict:
    """Parse an MP4 container and return structural decode features."""
    meta = _parse_mp4(payload)
    out = dict.fromkeys(_FEATURE_KEYS, 0.0)
    ts = meta["timescale"]
    out.update(
        n_bytes=len(payload),
        sample_rate=int(ts),
        n_samples=len(meta["sizes"]),
        duration_ms=int(meta["duration"] * 1000 // ts) if ts else 0,
        width=int(meta["width"]),
        height=int(meta["height"]),
        n_pixels=int(meta["width"] * meta["height"]),
        mean_value=0.0,
        rms=0.0,
    )
    return out


def sample_mp4_frames(payload: bytes, every_ms: int) -> list[bytes]:
    """Codec-copy frame extraction: slice the encoded sample nearest
    each ``every_ms`` boundary out of mdat via the resolved sample
    table. Uniform-duration files only (single stts run) — variable
    timing would need edit-list awareness and raises honestly."""
    meta = _parse_mp4(payload)
    runs = meta["stts_runs"]
    if len(runs) != 1:
        raise NotImplementedError(
            "time-indexed sampling supports uniform sample durations only"
        )
    _count, delta = runs[0]
    ts = meta["timescale"]
    n = len(meta["ranges"])
    if n == 0 or delta == 0 or ts == 0:
        return []
    out, t = [], 0
    total = n * delta
    while t < total:
        idx = min(t // delta, n - 1)
        off, size = meta["ranges"][idx]
        out.append(payload[off : off + size])
        t += max(1, every_ms * ts // 1000)
    return out


# ---------------------------------------------------------------------------
# dispatch (the `decoder="real"` entry points used by multimodal.py)
# ---------------------------------------------------------------------------

_WAV_TYPES = {"audio/wav", "audio/x-wav", "audio/wave"}
_BMP_TYPES = {"image/bmp", "image/x-bmp"}
_PNG_TYPES = {"image/png", "image/x-png"}
_JPEG_TYPES = {"image/jpeg", "image/jpg", "image/pjpeg"}
_MP4_TYPES = {"video/mp4", "video/mp4v-es", "audio/mp4"}


def decode_jpeg(payload: bytes) -> dict:
    """Full baseline JPEG decode (Huffman → dequant → batched IDCT →
    color) and return decoded-pixel features. Pixel statistics average
    across channels so grey and RGB files share one scale."""
    from .jpeg_codec import decode_jpeg_pixels

    px = decode_jpeg_pixels(payload)
    h, w, _c = px.shape
    flat = px.astype(np.float64)
    out = dict.fromkeys(_FEATURE_KEYS, 0.0)
    out.update(
        n_bytes=len(payload),
        sample_rate=0,
        n_samples=0,
        duration_ms=0,
        width=int(w),
        height=int(h),
        n_pixels=int(w * h),
        mean_value=float(flat.mean()) if flat.size else 0.0,
        rms=float(np.sqrt(np.mean(flat * flat))) if flat.size else 0.0,
    )
    return out


def real_decode(payload: bytes, media_type: str) -> dict:
    if media_type in _WAV_TYPES:
        return decode_wav(payload)
    if media_type in _BMP_TYPES:
        return decode_bmp(payload)
    if media_type in _PNG_TYPES:
        return decode_png(payload)
    if media_type in _JPEG_TYPES:
        return decode_jpeg(payload)
    if media_type in _MP4_TYPES:
        return decode_mp4(payload)
    raise NotImplementedError(
        f"no vendored codec for {media_type!r} (WAV, 24-bit BMP, 8-bit PNG, "
        "baseline JPEG and MP4/ISO-BMFF are built in; pass decode_fn for "
        "other formats)"
    )


def real_resize(payload: bytes, media_type: str, width: int, height: int) -> bytes:
    if media_type in _BMP_TYPES:
        return resize_bmp(payload, width, height)
    if media_type in _PNG_TYPES:
        return resize_png(payload, width, height)
    if media_type in _JPEG_TYPES:
        from .jpeg_codec import resize_jpeg

        return resize_jpeg(payload, width, height)
    raise NotImplementedError(
        f"no vendored resizer for {media_type!r} (24-bit BMP, 8-bit PNG and "
        "baseline JPEG are built in; pass resize_fn for other formats)"
    )


def real_sample(payload: bytes, media_type: str, every_ms: int) -> list[bytes]:
    if media_type in _WAV_TYPES:
        return sample_wav_windows(payload, every_ms)
    if media_type in _MP4_TYPES:
        return sample_mp4_frames(payload, every_ms)
    raise NotImplementedError(
        f"no vendored frame sampler for {media_type!r} (WAV windowing and "
        "MP4 codec-copy extraction are built in; pass sample_fn for other "
        "formats)"
    )
