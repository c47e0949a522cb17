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
    with pytest.raises(NotImplementedError, match="video/mp4"):
        real_decode(b"\x00\x00\x00\x18ftypmp42", "video/mp4")


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
