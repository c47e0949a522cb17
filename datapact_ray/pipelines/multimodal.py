"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are treated as Arrow ``binary`` columns with typed
metadata columns alongside (``media_type``, ``width``, ``height``,
``duration_ms``…). The Ray-side plumbing — schema handling, small-batch
actor-pool stages, output layout — is real and tested; the actual codec
work is STUBBED (the decode libraries are not in this container) behind
``decoder="fake"`` (a deterministic byte-statistics featurizer) or
``decoder="real"`` (raises ``NotImplementedError`` until Pillow/ffmpeg
are provided via the injectable ``decode_fn``).

Scale notes: binary payloads dominate block size — stages use small
``batch_size`` (default 64) so ``batch × concurrency`` fits worker
heaps, keep ``batch_format="pyarrow"`` end-to-end (binary columns don't
round-trip pandas cleanly), and never let the payload enter a shuffle:
features are projected out and the payload column is dropped before any
wide operation.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # image/png, audio/wav, ...
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def fake_decode(payload: bytes, media_type: str) -> dict:
    """Deterministic stand-in for a codec: byte statistics as 'features'.

    STUB — replace with a real decode (PIL.Image.open / soundfile) by
    passing ``decode_fn`` to MediaFeaturizer; marked per the brief since
    image/audio libraries are not available in this container.
    """
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return {"n_bytes": 0, "mean_byte": 0.0, "entropy_proxy": 0.0}
    counts = np.bincount(arr, minlength=256).astype(np.float64)
    p = counts[counts > 0] / arr.size
    return {
        "n_bytes": int(arr.size),
        "mean_byte": float(arr.mean()),
        "entropy_proxy": float(-(p * np.log2(p)).sum()),
    }


class MediaFeaturizer:
    """Actor-pool stage: decode/extract per media row.

    ``decode_fn`` is injected once per actor (model/codec load point);
    output keeps metadata and drops the payload so downstream shuffles
    never carry the binary column.
    """

    def __init__(self, decode_fn: Callable[[bytes, str], dict] | None = None,
                 decoder: str = "fake"):
        if decode_fn is not None:
            self.decode = decode_fn
        elif decoder == "fake":
            self.decode = fake_decode
        else:
            raise NotImplementedError(
                "real media decoding requires image/audio libraries not present "
                "in this container; pass decode_fn explicitly"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self.decode(p.as_py(), t.as_py())
            for p, t in zip(batch.column("payload"), batch.column("media_type"))
        ]
        out = batch.drop_columns(["payload"])
        for key in feats[0] if feats else []:
            out = out.append_column(
                key, pa.array([f[key] for f in feats])
            )
        return out


def featurize_media(
    ds: ray.data.Dataset,
    *,
    decode_fn: Callable[[bytes, str], dict] | None = None,
    batch_size: int = 64,
    concurrency: int | tuple[int, int] = (1, 8),
) -> ray.data.Dataset:
    """Media feature-extraction stage with binary-payload-aware sizing."""
    return ds.map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs={"decode_fn": decode_fn},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def make_synthetic_media(n: int = 256, seed: int = 7) -> pa.Table:
    """Deterministic synthetic media table for tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, int(s), dtype=np.uint8).tobytes()
                for s in rng.integers(100, 5000, n)]
    types = np.array(["image/png", "audio/wav", "video/mp4"])[np.arange(n) % 3]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), type=pa.int64()),
            "media_type": pa.array(types, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array((np.arange(n) % 64 + 1).astype(np.int32)),
            "height": pa.array((np.arange(n) % 48 + 1).astype(np.int32)),
            "duration_ms": pa.array(np.zeros(n, dtype=np.int32)),
        }
    )
