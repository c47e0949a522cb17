"""Vendored real codecs (codecs.py): WAV/BMP round-trips against
closed-form expectations, the decoder="real" actor-pool stages end to
end, and honest NotImplementedError for formats with no vendored codec."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from datapact_ray.pipelines.codecs import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    real_decode,
    resize_bmp,
    sample_wav_windows,
)
from datapact_ray.pipelines.multimodal import (
    featurize_media,
    resize_media,
    sample_frames,
)


def test_wav_roundtrip_u8():
    samples = np.arange(256, dtype=np.uint8)
    payload = encode_wav(samples, sample_rate=1000, sampwidth=1)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    f = decode_wav(payload)
    assert f["n_samples"] == 256
    assert f["sample_rate"] == 1000
    assert f["duration_ms"] == 256  # 256 frames @ 1 kHz
    # u8 PCM is centered at 128: mean of 0..255 is 127.5 → -0.5
    assert f["mean_value"] == pytest.approx(-0.5)
    want_rms = float(np.sqrt(np.mean((np.arange(256) - 128.0) ** 2)))
    assert f["rms"] == pytest.approx(want_rms)


def test_wav_roundtrip_i16():
    samples = (np.sin(np.linspace(0, 8 * np.pi, 8000)) * 10000).astype(np.int16)
    payload = encode_wav(samples, sample_rate=16000, sampwidth=2)
    f = decode_wav(payload)
    assert f["n_samples"] == 8000
    assert f["duration_ms"] == 500
    assert f["rms"] == pytest.approx(float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))), rel=1e-12)


def test_wav_window_sampling_real():
    samples = np.zeros(3500, dtype=np.uint8)
    payload = encode_wav(samples, sample_rate=1000, sampwidth=1)
    clips = sample_wav_windows(payload, every_ms=1000)
    assert len(clips) == 4  # 1000+1000+1000+500
    decoded = [decode_wav(c) for c in clips]
    assert [d["n_samples"] for d in decoded] == [1000, 1000, 1000, 500]
    assert all(d["sample_rate"] == 1000 for d in decoded)


def test_bmp_roundtrip_and_padding():
    # width 3 → row stride 12 (9 data + 3 pad): exercises padding math
    px = np.arange(3 * 3 * 3, dtype=np.uint8).reshape(3, 3, 3)
    payload = encode_bmp(px)
    assert payload[:2] == b"BM"
    f = decode_bmp(payload)
    assert (f["width"], f["height"], f["n_pixels"]) == (3, 3, 9)
    assert f["mean_value"] == pytest.approx(float(px.mean()))
    # pixel-exact round-trip
    from datapact_ray.pipelines.codecs import _parse_bmp

    np.testing.assert_array_equal(_parse_bmp(payload), px)


def test_bmp_resize_nearest_neighbor():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[2:, 2:] = 200  # bottom-right quadrant bright
    resized = resize_bmp(encode_bmp(px), 2, 2)
    f = decode_bmp(resized)
    assert (f["width"], f["height"]) == (2, 2)
    from datapact_ray.pipelines.codecs import _parse_bmp

    small = _parse_bmp(resized)
    assert small[0, 0, 0] == 0 and small[1, 1, 0] == 200


def test_bmp_rejects_malformed():
    with pytest.raises(ValueError):
        decode_bmp(b"NOTABMP" * 10)
    with pytest.raises(ValueError):
        # truncated: header promises more pixel data than present
        decode_bmp(encode_bmp(np.zeros((8, 8, 3), dtype=np.uint8))[:-10])


def test_real_decode_unknown_format_raises():
    with pytest.raises(NotImplementedError, match="image/gif"):
        real_decode(b"GIF89a....", "image/gif")


def _media_ds(n=40):
    rows = []
    for i in range(n):
        if i % 2 == 0:
            payload = encode_wav(
                np.full(100 + i, 128, dtype=np.uint8), sample_rate=1000
            )
            rows.append(("audio/wav", payload, 0, 0))
        else:
            px = np.full((6, 5, 3), i % 256, dtype=np.uint8)
            rows.append(("image/bmp", encode_bmp(px), 5, 6))
    return ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array(range(n), type=pa.int64()),
                "media_type": pa.array([r[0] for r in rows]),
                "payload": pa.array([r[1] for r in rows], type=pa.binary()),
                "width": pa.array([r[2] for r in rows], type=pa.int32()),
                "height": pa.array([r[3] for r in rows], type=pa.int32()),
                "duration_ms": pa.array([0] * n, type=pa.int32()),
            }
        )
    )


def test_featurize_real_mixed_media_actor_pool():
    out = featurize_media(_media_ds(), decoder="real", batch_size=8).to_pandas()
    assert len(out) == 40
    wav = out[out.media_type == "audio/wav"]
    bmp = out[out.media_type == "image/bmp"]
    assert (wav.n_samples.to_numpy() == 100 + 2 * np.arange(20)).all()
    assert (wav.duration_ms == wav.n_samples).all()
    assert (bmp.n_pixels == 30).all() and (bmp.width == 5).all()
    assert "payload" not in out.columns  # payload never leaves the stage


def test_resize_real_bmp_stage():
    px = np.random.default_rng(3).integers(0, 256, (16, 12, 3), dtype=np.uint8)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array([1], type=pa.int64()),
                "media_type": pa.array(["image/bmp"]),
                "payload": pa.array([encode_bmp(px)], type=pa.binary()),
                "width": pa.array([12], type=pa.int32()),
                "height": pa.array([16], type=pa.int32()),
            }
        )
    )
    row = resize_media(ds, 6, 8, decoder="real").take_all()[0]
    f = decode_bmp(row["payload"])
    assert (f["width"], f["height"]) == (6, 8)
    assert (row["width"], row["height"]) == (6, 8)


def test_sample_frames_real_wav_stage():
    payload = encode_wav(np.zeros(2500, dtype=np.uint8), sample_rate=1000)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array([7], type=pa.int64()),
                "media_type": pa.array(["audio/wav"]),
                "payload": pa.array([payload], type=pa.binary()),
            }
        )
    )
    frames = sample_frames(ds, every_ms=1000, decoder="real").take_all()
    assert [f["frame_idx"] for f in frames] == [0, 1, 2]
    assert [decode_wav(f["payload"])["n_samples"] for f in frames] == [1000, 1000, 500]


def test_wav_decode_stats_oracle_sf0001():
    """The real-decoder queries() entry matches its DuckDB oracle."""
    import duckdb

    from datapact_ray.pipelines.multimodal import (
        _WAV_DECODE_SQL,
        wav_decode_stats_documents,
    )

    got = wav_decode_stats_documents("/root/testdata/sf0.001")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = con.execute(_WAV_DECODE_SQL).fetchdf()
    con.close()
    import pandas as pd

    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )


# ---------------------------------------------------------------------------
# PNG (zlib-compressed container, scanline filters)
# ---------------------------------------------------------------------------


def _ref_filter_rows(raw: np.ndarray, ftype: int) -> bytes:
    """Scalar reference implementation of the PNG spec's filter step
    (encode direction) — used to hand-build PNGs with Average/Paeth
    scanlines, which encode_png never emits."""
    h, w, c = raw.shape
    flat = raw.reshape(h, w * c).astype(int)
    out = bytearray()
    prev = np.zeros(w * c, dtype=int)
    for y in range(h):
        row = flat[y]
        out.append(ftype)
        for x in range(w * c):
            a = row[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - cc
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else cc)
            out.append((row[x] - pred) % 256)
        prev = row
    return bytes(out)


def _png_with_filter(raw: np.ndarray, ftype: int) -> bytes:
    import struct
    import zlib

    from datapact_ray.pipelines.codecs import _PNG_SIG, _png_chunk

    h, w, c = raw.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(_ref_filter_rows(raw, ftype)))
        + _png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("enc_filter", [0, 1, 2])
def test_png_roundtrip_encoder_filters(channels, enc_filter):
    from datapact_ray.pipelines.codecs import _parse_png, encode_png

    rng = np.random.default_rng(channels * 10 + enc_filter)
    px = rng.integers(0, 256, (7, 5, channels), dtype=np.uint8)
    payload = encode_png(px if channels > 1 else px[:, :, 0], filter_type=enc_filter)
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    np.testing.assert_array_equal(_parse_png(payload), px)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3])
def test_png_unfilters_all_spec_filter_types(ftype, channels):
    """Hand-filtered scanlines (scalar spec reference) decode back to
    the exact pixels — covers Average and Paeth, which our encoder
    never emits but third-party PNGs do."""
    from datapact_ray.pipelines.codecs import _parse_png

    rng = np.random.default_rng(ftype * 7 + channels)
    px = rng.integers(0, 256, (6, 9, channels), dtype=np.uint8)
    np.testing.assert_array_equal(_parse_png(_png_with_filter(px, ftype)), px)


def test_png_decode_features_and_mixed_filter_rows():
    from datapact_ray.pipelines.codecs import decode_png, encode_png

    px = np.arange(64, dtype=np.uint8).reshape(4, 16)
    f = decode_png(encode_png(px, filter_type=1))
    assert (f["width"], f["height"], f["n_pixels"]) == (16, 4, 64)
    assert f["mean_value"] == pytest.approx(31.5)
    assert f["rms"] == pytest.approx(float(np.sqrt(np.mean(np.arange(64.0) ** 2))))


def test_png_rejects_malformed():
    from datapact_ray.pipelines.codecs import decode_png, encode_png

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"NOTAPNG" * 4)
    good = encode_png(np.zeros((4, 4), dtype=np.uint8))
    # flip one IDAT byte: CRC must catch it
    bad = bytearray(good)
    bad[41] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # cut mid-IDAT: chunk framing must catch it
    with pytest.raises(ValueError, match="truncated"):
        decode_png(good[:45])
    # no IDAT at all
    with pytest.raises(ValueError, match="missing"):
        decode_png(good[:33])


def test_png_rejects_unsupported_shapes():
    import struct
    import zlib

    from datapact_ray.pipelines.codecs import _PNG_SIG, _png_chunk, decode_png

    # 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    p = _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + _png_chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_png(p)
    # interlaced
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    p = _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + _png_chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_png(p)


def test_png_resize_nearest_neighbor():
    from datapact_ray.pipelines.codecs import _parse_png, encode_png, resize_png

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[2:, 2:] = 200
    small = _parse_png(resize_png(encode_png(px), 2, 2))
    assert small.shape == (2, 2, 3)
    assert small[0, 0, 0] == 0 and small[1, 1, 0] == 200


def test_featurize_real_png_actor_pool():
    from datapact_ray.pipelines.codecs import encode_png

    n = 12
    payloads = [
        encode_png(
            np.full((i + 1, 8), i * 3 % 256, dtype=np.uint8), filter_type=2
        )
        for i in range(n)
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array(range(n), type=pa.int64()),
                "media_type": pa.array(["image/png"] * n),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )
    )
    out = featurize_media(ds, decoder="real", batch_size=4).to_pandas()
    assert len(out) == n
    out = out.sort_values("media_id")
    assert (out.height.to_numpy() == np.arange(n) + 1).all()
    assert (out.n_pixels.to_numpy() == (np.arange(n) + 1) * 8).all()
    assert out.mean_value.to_numpy() == pytest.approx(np.arange(n) * 3 % 256)


def test_png_decode_stats_oracle_sf0001():
    """The PNG real-decoder queries() entry matches its DuckDB oracle."""
    import duckdb
    import pandas as pd

    from datapact_ray.pipelines.multimodal import (
        _PNG_DECODE_SQL,
        png_decode_stats_documents,
    )

    got = png_decode_stats_documents("/root/testdata/sf0.001")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = con.execute(_PNG_DECODE_SQL).fetchdf()
    con.close()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )


# ---------------------------------------------------------------------------
# MP4 / ISO BMFF (box tree, sample tables, codec-copy extraction)
# ---------------------------------------------------------------------------


def test_mp4_roundtrip_structural():
    from datapact_ray.pipelines.codecs import _parse_mp4, decode_mp4, encode_mp4

    samples = [bytes([i]) * (10 + i) for i in range(7)]
    payload = encode_mp4(samples, width=32, height=24, sample_duration_ms=100)
    assert payload[4:8] == b"ftyp"
    f = decode_mp4(payload)
    assert f["n_samples"] == 7
    assert f["duration_ms"] == 700
    assert (f["width"], f["height"], f["n_pixels"]) == (32, 24, 768)
    # the resolved sample ranges slice mdat back into the exact inputs
    meta = _parse_mp4(payload)
    got = [payload[o : o + s] for o, s in meta["ranges"]]
    assert got == samples


def test_mp4_codec_copy_frame_sampling():
    from datapact_ray.pipelines.codecs import encode_mp4, sample_mp4_frames

    samples = [bytes([i]) * 8 for i in range(10)]  # 10 x 100ms = 1s
    payload = encode_mp4(samples, sample_duration_ms=100)
    frames = sample_mp4_frames(payload, every_ms=300)
    # t = 0, 300, 600, 900 → samples 0, 3, 6, 9
    assert frames == [samples[0], samples[3], samples[6], samples[9]]
    # sub-sample-rate request degrades to every sample
    assert len(sample_mp4_frames(payload, every_ms=100)) == 10


def test_mp4_rejects_malformed():
    from datapact_ray.pipelines.codecs import decode_mp4, encode_mp4

    with pytest.raises(ValueError, match="not an MP4"):
        decode_mp4(b"\x00\x00\x00\x08free")
    good = encode_mp4([b"abc"] * 3)
    with pytest.raises(ValueError, match="truncated|missing"):
        decode_mp4(good[:-20])


def test_featurize_and_sample_real_mp4_stage():
    from datapact_ray.pipelines.codecs import encode_mp4

    n = 6
    payloads = [
        encode_mp4([b"x" * 16] * (i + 1), width=8, height=8) for i in range(n)
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array(range(n), type=pa.int64()),
                "media_type": pa.array(["video/mp4"] * n),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )
    )
    out = featurize_media(ds, decoder="real", batch_size=2).to_pandas()
    out = out.sort_values("media_id")
    assert (out.n_samples.to_numpy() == np.arange(n) + 1).all()
    assert (out.duration_ms.to_numpy() == (np.arange(n) + 1) * 100).all()
    assert (out.width == 8).all()
    frames = sample_frames(ds, every_ms=100, decoder="real").to_pandas()
    # every sample of every item is extracted at the native cadence
    assert frames.groupby("media_id").size().to_numpy().tolist() == list(
        range(1, n + 1)
    )
    assert (frames["payload"].map(len) == 16).all()


# ---------------------------------------------------------------------------
# JPEG (baseline sequential: Huffman entropy coding, batched IDCT,
# subsampling, restart markers)
# ---------------------------------------------------------------------------


def test_jpeg_constant_blocks_bit_exact():
    """Even-valued constant 8×8 blocks have a DC that is a multiple of
    the Annex-K DC quant step and analytically-zero AC → the lossy
    codec round-trips them BIT-EXACTLY (the property the closed-form
    SQL oracle relies on)."""
    from datapact_ray.pipelines.jpeg_codec import decode_jpeg_pixels, encode_jpeg

    vals = np.array([28 + 2 * ((i * 37 + 7) % 101) for i in range(24)], dtype=np.uint8)
    img = np.repeat(np.repeat(vals.reshape(3, 8), 8, axis=0), 8, axis=1)
    px = decode_jpeg_pixels(encode_jpeg(img))
    assert px.shape == (24, 64, 1)
    assert np.array_equal(px[..., 0], img)


def test_jpeg_roundtrip_grey_and_rgb_within_quantization():
    from datapact_ray.pipelines.jpeg_codec import decode_jpeg_pixels, encode_jpeg

    rng = np.random.default_rng(11)
    # smooth gradient: quantization error stays small
    y, x = np.mgrid[0:37, 0:53]
    grey = ((x * 2 + y) % 256).astype(np.uint8)
    px = decode_jpeg_pixels(encode_jpeg(grey))
    assert px.shape == (37, 53, 1)  # non-multiple-of-8 dims crop exactly
    rgb = np.stack([(x * 3) % 256, (y * 2 + 30) % 256, ((x + y) * 2) % 256], axis=-1)
    px3 = decode_jpeg_pixels(encode_jpeg(rgb.astype(np.uint8)))
    assert px3.shape == (37, 53, 3)
    assert np.abs(px3.astype(int) - rgb.astype(int)).max() <= 12
    # noise round-trips decodably (larger error is inherent to Q50)
    noise = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    assert decode_jpeg_pixels(encode_jpeg(noise)).shape == (16, 16, 1)


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("rst", [0, 2])
def test_jpeg_subsampling_and_restart_markers(sub, rst):
    """4:2:0 MCU interleave + chroma upsample and DRI/RSTn restart
    handling decode correctly (grey-valued RGB keeps chroma at exactly
    128, so even 4:2:0 is exact for constant images)."""
    from datapact_ray.pipelines.jpeg_codec import decode_jpeg_pixels, encode_jpeg

    const = np.full((32, 48, 3), 150, dtype=np.uint8)
    px = decode_jpeg_pixels(
        encode_jpeg(const, subsampling=sub, restart_interval=rst)
    )
    assert np.array_equal(px, const)
    y, x = np.mgrid[0:41, 0:50]
    img = np.stack(
        [(x * 3) % 256, (y * 2 + 30) % 256, ((x + y) * 2) % 256], axis=-1
    ).astype(np.uint8)
    px2 = decode_jpeg_pixels(
        encode_jpeg(img, subsampling=sub, restart_interval=rst)
    )
    assert px2.shape == (41, 50, 3)
    assert np.abs(px2.astype(int) - img.astype(int)).max() <= 16


def test_jpeg_rejects_malformed_and_progressive():
    from datapact_ray.pipelines.jpeg_codec import decode_jpeg_pixels, encode_jpeg

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_pixels(b"\x00\x01\x02")
    payload = encode_jpeg(np.full((8, 8), 100, dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_jpeg_pixels(payload[:40])  # truncated mid-segments
    # flip the SOF0 marker to SOF2 (progressive) → honest refusal
    sof = payload.find(b"\xff\xc0")
    prog = payload[:sof] + b"\xff\xc2" + payload[sof + 2 :]
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg_pixels(prog)
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4), dtype=np.float64))


def test_jpeg_resize_nearest_neighbor():
    from datapact_ray.pipelines.jpeg_codec import (
        decode_jpeg_pixels,
        encode_jpeg,
        resize_jpeg,
    )

    vals = np.array([40, 80, 120, 160], dtype=np.uint8)
    img = np.repeat(np.repeat(vals.reshape(1, 4), 16, axis=0), 16, axis=1)  # 16x64
    out = resize_jpeg(encode_jpeg(img), 32, 8)
    px = decode_jpeg_pixels(out)
    assert px.shape == (8, 32, 1)
    # 16-wide stripes halve to 8-wide → re-encoded blocks stay constant
    # and even-valued, so the resized file is still bit-exact
    want = np.repeat(np.repeat(vals.reshape(1, 4), 8, axis=0), 8, axis=1)
    assert np.array_equal(px[..., 0], want)


def test_featurize_real_jpeg_actor_pool():
    from datapact_ray.pipelines.jpeg_codec import encode_jpeg

    n = 10
    payloads = [
        encode_jpeg(np.full((8 * (i + 1), 16), (2 * i + 30) % 256, dtype=np.uint8))
        for i in range(n)
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array(range(n), type=pa.int64()),
                "media_type": pa.array(["image/jpeg"] * n),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )
    )
    out = featurize_media(ds, decoder="real", batch_size=4).to_pandas()
    assert len(out) == n
    out = out.sort_values("media_id")
    assert (out.height.to_numpy() == (np.arange(n) + 1) * 8).all()
    assert (out.width.to_numpy() == 16).all()
    # constant even values decode bit-exactly → means are exact
    assert out.mean_value.to_numpy() == pytest.approx((2 * np.arange(n) + 30) % 256)


def test_jpeg_decode_stats_oracle_sf0001():
    """The JPEG real-decoder queries() entry matches its DuckDB oracle,
    including the decoded-pixel luminance totals."""
    import duckdb
    import pandas as pd

    from datapact_ray.pipelines.multimodal import (
        _JPEG_DECODE_SQL,
        jpeg_decode_stats_documents,
    )

    got = jpeg_decode_stats_documents("/root/testdata/sf0.001")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = con.execute(_JPEG_DECODE_SQL).fetchdf()
    con.close()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )


def test_jpeg_accepts_fill_bytes_before_markers():
    """T.81 B.1.1.2: markers may be preceded by 0xFF fill bytes — a
    real-corpus file using them must decode, not raise."""
    from datapact_ray.pipelines.jpeg_codec import decode_jpeg_pixels, encode_jpeg

    img = np.full((16, 16), 150, dtype=np.uint8)
    payload = encode_jpeg(img)
    dqt = payload.find(b"\xff\xdb")
    padded = payload[:dqt] + b"\xff\xff\xff" + payload[dqt:]
    px = decode_jpeg_pixels(padded)
    assert np.array_equal(px[..., 0], img)


def test_payload_read_blocks_rule(tmp_path):
    import pyarrow.parquet as pq

    from datapact_ray.pipelines.multimodal import payload_read_blocks

    # single-row-group small table → split hint
    hint = payload_read_blocks("/root/testdata/sf0.001/documents.parquet")
    assert hint is None or hint >= 1  # depends on cpu count; must not crash
    # many-file table → None fast path (native granularity suffices)
    import pandas as pd

    for i in range(40):
        pq.write_table(
            pa.Table.from_pandas(pd.DataFrame({"x": [i]})),
            str(tmp_path / f"p{i:02d}.parquet"),
        )
    assert payload_read_blocks(str(tmp_path)) is None


def test_resize_real_jpeg_stage():
    """MediaResizer routes image/jpeg through the vendored codec."""
    from datapact_ray.pipelines.jpeg_codec import decode_jpeg_pixels, encode_jpeg

    img = np.full((32, 64), 90, dtype=np.uint8)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array([1], type=pa.int64()),
                "media_type": pa.array(["image/jpeg"]),
                "payload": pa.array([encode_jpeg(img)], type=pa.binary()),
                "width": pa.array([64], type=pa.int32()),
                "height": pa.array([32], type=pa.int32()),
            }
        )
    )
    row = resize_media(ds, 32, 16, decoder="real").take_all()[0]
    px = decode_jpeg_pixels(row["payload"])
    assert px.shape == (16, 32, 1)
    assert np.array_equal(px[..., 0], np.full((16, 32), 90, dtype=np.uint8))
    assert (row["width"], row["height"]) == (32, 16)
