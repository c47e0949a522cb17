"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are treated as Arrow ``binary`` columns with typed
metadata columns alongside (``media_type``, ``width``, ``height``,
``duration_ms``…). The Ray-side plumbing — schema handling, small-batch
actor-pool stages, output layout — is real and tested. Decoders:
``decoder="fake"`` is a deterministic byte-statistics featurizer;
``decoder="real"`` uses the vendored pure-Python codecs in `codecs.py`
(WAV via stdlib ``wave``, uncompressed 24-bit BMP via ``struct``,
8-bit PNG via ``zlib``+``struct`` with full scanline unfiltering, and
MP4/ISO-BMFF box-tree + sample-table parsing with codec-copy frame
extraction) — real container parsing, verified against closed-form
oracles. Formats with no vendored codec (JPEG/GIF/WebM — no
Pillow/cv2/ffmpeg here) raise ``NotImplementedError`` per payload
unless an explicit ``decode_fn`` is injected.

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

from ._util import round_duck


def payload_read_blocks(path: str, rows_per_block: int = 512) -> int | None:
    """Read-split hint for per-payload codec stages: their downstream
    work is milliseconds PER ROW, so the read must yield at least ~cpus
    blocks or the fused encode/decode chain serializes behind a
    single-row-group file. Returns an ``override_num_blocks`` only when
    the table's native row-group granularity is coarser than the
    desired split — at data scale (thousands of row groups) this is
    None and the native granularity stands."""
    import pyarrow.parquet as pq
    import ray as _ray

    from ..io import count_rows, list_parquet_files

    cpus = (
        int(_ray.cluster_resources().get("CPU", 8))
        if _ray.is_initialized()
        else 8
    )
    files = list_parquet_files(path)
    if len(files) >= cpus:
        return None  # one block per file already saturates the pool
    want = min(cpus, max(1, count_rows(path) // rows_per_block))
    native = 0
    for f in files:  # early exit: stop once native granularity suffices
        native += pq.ParquetFile(f).metadata.num_row_groups
        if native >= want:
            return None
    return want


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
        elif decoder == "real":
            # vendored pure-Python codecs (WAV/BMP/PNG/MP4) — real
            # container parsing; formats beyond those raise
            # NotImplementedError per payload
            from .codecs import real_decode

            self.decode = real_decode
        else:
            raise ValueError(f"unknown decoder {decoder!r} (fake|real)")

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self.decode(p.as_py(), t.as_py())
            for p, t in zip(batch.column("payload"), batch.column("media_type"))
        ]
        out = batch.drop_columns(["payload"])
        for key in feats[0] if feats else []:
            if key in out.column_names:
                # decoded truth supersedes declared metadata (e.g. a real
                # decoder's width/height vs the ingest-time claim)
                out = out.drop_columns([key])
            out = out.append_column(
                key, pa.array([f[key] for f in feats])
            )
        return out


def featurize_media(
    ds: ray.data.Dataset,
    *,
    decode_fn: Callable[[bytes, str], dict] | None = None,
    decoder: str = "fake",
    batch_size: int = 64,
    concurrency: int | tuple[int, int] = (1, 8),
) -> ray.data.Dataset:
    """Media feature-extraction stage with binary-payload-aware sizing."""
    return ds.map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs={"decode_fn": decode_fn, "decoder": decoder},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


class MediaResizer:
    """Actor-pool stage: payload → payload transform (image resize).

    ``resize_fn(payload, media_type, width, height) -> bytes`` is
    injected once per actor (the codec load point); the fake decoder
    deterministically re-tiles the byte stream to ``width*height`` bytes
    (truncate or cyclic-pad) so output sizes are exactly what a real
    w×h single-channel decode would produce. Output rows keep the
    (resized) payload — a resize is a map stage, and the payload still
    never enters a shuffle downstream (callers project features out
    first, same contract as MediaFeaturizer)."""

    def __init__(
        self,
        width: int,
        height: int,
        resize_fn: Callable[[bytes, str, int, int], bytes] | None = None,
        decoder: str = "fake",
    ):
        self.width = width
        self.height = height
        if resize_fn is not None:
            self.resize = resize_fn
        elif decoder == "fake":
            self.resize = self._fake_resize
        elif decoder == "real":
            from .codecs import real_resize

            self.resize = real_resize
        else:
            raise ValueError(f"unknown decoder {decoder!r} (fake|real)")

    @staticmethod
    def _fake_resize(payload: bytes, media_type: str, w: int, h: int) -> bytes:
        target = w * h
        arr = np.frombuffer(payload, dtype=np.uint8)
        if arr.size == 0:
            return b"\x00" * target
        reps = -(-target // arr.size)  # ceil
        return np.tile(arr, reps)[:target].tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        resized = [
            self.resize(p.as_py(), t.as_py(), self.width, self.height)
            for p, t in zip(batch.column("payload"), batch.column("media_type"))
        ]
        n = batch.num_rows
        out = batch.drop_columns(["payload", "width", "height"])
        out = out.append_column("payload", pa.array(resized, type=pa.binary()))
        out = out.append_column(
            "width", pa.array(np.full(n, self.width, dtype=np.int32))
        )
        return out.append_column(
            "height", pa.array(np.full(n, self.height, dtype=np.int32))
        )


class FrameSampler:
    """Flat-map stage: one output row per sampled video frame.

    ``sample_fn(payload, media_type, every_ms) -> list[bytes]`` is the
    real-codec injection point (ffmpeg keyframe extraction); the fake
    decoder slices the payload into fixed-size stripes and keeps every
    ``stride``-th one. Emits ``(media_id, frame_idx, payload)`` — the
    fan-out happens INSIDE the map task, so block sizes stay bounded by
    ``batch_size`` × frames-per-item and the source payload is dropped."""

    def __init__(
        self,
        every_ms: int = 1000,
        frame_bytes: int = 256,
        stride: int = 4,
        sample_fn: Callable[[bytes, str, int], list] | None = None,
        decoder: str = "fake",
    ):
        self.every_ms = every_ms
        self.frame_bytes = frame_bytes
        self.stride = stride
        if sample_fn is not None:
            self.sample = sample_fn
        elif decoder == "fake":
            self.sample = self._fake_sample
        elif decoder == "real":
            from .codecs import real_sample

            self.sample = real_sample
        else:
            raise ValueError(f"unknown decoder {decoder!r} (fake|real)")

    def _fake_sample(self, payload: bytes, media_type: str, every_ms: int) -> list:
        arr = np.frombuffer(payload, dtype=np.uint8)
        n_frames = max(1, arr.size // self.frame_bytes)
        return [
            arr[i * self.frame_bytes : (i + 1) * self.frame_bytes].tobytes()
            for i in range(0, n_frames, self.stride)
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for mid, p, t in zip(
            batch.column("media_id"),
            batch.column("payload"),
            batch.column("media_type"),
        ):
            for i, frame in enumerate(
                self.sample(p.as_py(), t.as_py(), self.every_ms)
            ):
                ids.append(mid.as_py())
                idxs.append(i)
                frames.append(frame)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(idxs, type=pa.int32()),
                "payload": pa.array(frames, type=pa.binary()),
            }
        )


def resize_media(
    ds: ray.data.Dataset,
    width: int,
    height: int,
    *,
    resize_fn: Callable | None = None,
    decoder: str = "fake",
    batch_size: int = 64,
    concurrency: int | tuple[int, int] = (1, 8),
) -> ray.data.Dataset:
    """Image-resize stage with binary-payload-aware sizing."""
    return ds.map_batches(
        MediaResizer,
        fn_constructor_kwargs={
            "width": width, "height": height, "resize_fn": resize_fn,
            "decoder": decoder,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(
    ds: ray.data.Dataset,
    *,
    every_ms: int = 1000,
    sample_fn: Callable | None = None,
    decoder: str = "fake",
    batch_size: int = 16,
    concurrency: int | tuple[int, int] = (1, 8),
) -> ray.data.Dataset:
    """Frame-sampling stage: smaller batches — output fans out per row."""
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={
            "every_ms": every_ms, "sample_fn": sample_fn, "decoder": decoder,
        },
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


def binary_payload_stats_documents(sf_dir: str) -> "pd.DataFrame":
    """Oracle-checked binary-column plumbing: treat each document's UTF-8
    bytes as an opaque ``binary`` payload (the same shape an image/audio
    blob would have) and compute per-lang payload statistics.

    The payload column is materialized INSIDE the scan task (zero-copy
    cast), reduced to fixed-width per-batch partial stats in the same
    task, and only the partials — one row per (lang, task) — reach the
    shuffle; the payload bytes never leave the map task, per this
    module's rule that binary columns stay out of wide operations."""
    import pandas as pd

    from ..io import read_table

    ds = read_table(f"{sf_dir}/documents.parquet", columns=["lang", "text"])

    def partial(batch: pa.Table) -> "pd.DataFrame":
        import pyarrow.compute as pc

        payload = pc.cast(batch.column("text"), pa.binary())
        nbytes = pc.binary_length(payload).to_numpy().astype("int64")
        df = pd.DataFrame(
            {
                "lang": batch.column("lang").to_pandas(),
                "b": nbytes,
                "large": (nbytes > 150).astype("int64"),
            }
        )
        out = (
            df.groupby("lang", sort=False)
            .agg(
                n_payloads=("b", "size"),
                total_bytes=("b", "sum"),
                max_bytes=("b", "max"),
                n_large=("large", "sum"),
            )
            .reset_index()
        )
        return out.astype(
            {
                "n_payloads": "int64",
                "total_bytes": "int64",
                "max_bytes": "int64",
                "n_large": "int64",
            }
        )

    # partials are ≤ n_langs rows per task: merge on the driver
    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    if len(parts) == 0:  # 0-row table: no batches ran
        return pd.DataFrame(
            {
                "lang": pd.Series([], dtype="object"),
                "n_payloads": pd.Series([], dtype="int64"),
                "total_bytes": pd.Series([], dtype="int64"),
                "max_bytes": pd.Series([], dtype="int64"),
                "n_large": pd.Series([], dtype="int64"),
            }
        )
    out = (
        parts
        .groupby("lang", as_index=False)
        .agg(
            n_payloads=("n_payloads", "sum"),
            total_bytes=("total_bytes", "sum"),
            max_bytes=("max_bytes", "max"),
            n_large=("n_large", "sum"),
        )
    )
    for c in ("n_payloads", "total_bytes", "max_bytes", "n_large"):
        out[c] = out[c].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


def payload_chunking_documents(
    sf_dir: str, chunk_bytes: int = 256
) -> "pd.DataFrame":
    """Fixed-size chunk planning over opaque payloads — the layout step
    every multimodal ingest runs before writing blobs into
    training-shard files (how many chunks, how full are they). Per
    source: payload count, total bytes, total ceil(bytes/chunk) chunks,
    and the mean chunk fill ratio.

    Same discipline as ``binary_payload_stats``: the payload bytes are
    cast + measured INSIDE the scan task; only (source, 3 ints) partials
    reach the driver. Chunk math is exact integers; the fill ratio is
    one division over exact integers, so the oracle matches bit-for-bit
    at the 6-dp pin."""
    import pandas as pd

    from ..io import read_table
    from ._util import round_duck

    ds = read_table(f"{sf_dir}/documents.parquet", columns=["source", "text"])

    def partial(batch: pa.Table) -> "pd.DataFrame":
        import pyarrow.compute as pc

        payload = pc.cast(batch.column("text"), pa.binary())
        nbytes = pc.binary_length(payload).to_numpy().astype("int64")
        df = pd.DataFrame(
            {
                "source": batch.column("source").to_pandas(),
                "b": nbytes,
                "ch": (nbytes + (chunk_bytes - 1)) // chunk_bytes,
            }
        )
        out = (
            df.groupby("source", sort=False)
            .agg(
                n_payloads=("b", "size"),
                total_bytes=("b", "sum"),
                n_chunks=("ch", "sum"),
            )
            .reset_index()
        )
        return out.astype(
            {"n_payloads": "int64", "total_bytes": "int64", "n_chunks": "int64"}
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    empty = pd.DataFrame(
        {
            "source": pd.Series([], dtype="object"),
            "n_payloads": pd.Series([], dtype="int64"),
            "total_bytes": pd.Series([], dtype="int64"),
            "n_chunks": pd.Series([], dtype="int64"),
            "avg_chunk_fill": pd.Series([], dtype="float64"),
        }
    )
    if len(parts) == 0:
        return empty
    out = parts.groupby("source", as_index=False).agg(
        n_payloads=("n_payloads", "sum"),
        total_bytes=("total_bytes", "sum"),
        n_chunks=("n_chunks", "sum"),
    )
    for c in ("n_payloads", "total_bytes", "n_chunks"):
        out[c] = out[c].astype("int64")
    out["avg_chunk_fill"] = [
        float(round_duck(tb / (nc * float(chunk_bytes)), 6)) if nc else None
        for tb, nc in zip(out["total_bytes"], out["n_chunks"])
    ]
    return out.sort_values("source").reset_index(drop=True)


def payload_magic_census_documents(sf_dir: str) -> "pd.DataFrame":
    """Leading-byte "magic number" sniffing analog: classify every
    payload by its first code point (letter / digit / space / other) —
    the container-format census an ingest runs before routing payloads
    to decoders (here over text bytes; a real blob column swaps the
    classifier for file-signature prefixes, same plumbing). Exact
    integer class logic; empty/NULL payloads are excluded on both
    engines."""
    import numpy as np
    import pandas as pd

    from ..io import read_table

    ds = read_table(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(batch: pa.Table) -> "pd.DataFrame":
        df = batch.to_pandas().dropna(subset=["text"])
        txt = df["text"].astype(str)
        txt = txt[txt.str.len() > 0]
        if not len(txt):
            return pd.DataFrame(
                {
                    "klass": pd.Series([], dtype="object"),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        cp = txt.str[0].map(ord).to_numpy(dtype=np.int64)
        klass = np.where(
            ((cp >= 65) & (cp <= 90)) | ((cp >= 97) & (cp <= 122)),
            "letter",
            np.where((cp >= 48) & (cp <= 57), "digit",
                     np.where(cp == 32, "space", "other")),
        )
        vc = pd.Series(klass).value_counts()
        return pd.DataFrame(
            {"klass": vc.index.to_numpy(), "n": vc.to_numpy().astype("int64")}
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(
            {
                "klass": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64"),
            }
        )
    out = parts.groupby("klass", as_index=False)["n"].sum()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("klass").reset_index(drop=True)


def payload_dedup_multimodal(sf_dir: str) -> "pd.DataFrame":
    """Binary-payload dedup census — the storage-bill question for a
    multimodal corpus: how many blobs are byte-identical copies and how
    many bytes re-crawled/re-encoded duplicates waste. Media payloads
    duplicate heavily in web data (mirrored images, shared assets), and
    byte-exact dedup is the zero-risk first pass before any perceptual
    hash.

    Payload = the document's UTF-8 bytes cast to ``binary`` in the scan
    task (the stand-in this module uses for image/audio blobs — the
    plumbing, batch shapes and exchange are exactly what a real blob
    column gets). Each task ships only (hash64, nbytes) — 16 B/payload
    regardless of blob size; same-hash payloads land in one bucket so
    per-bucket group folds are globally exact (same 64-bit-collision
    caveat as ``dedup.dedup_exact_documents``, negligible and
    empirically exact at test scale). Wasted bytes = Σ (copies−1)·size
    over distinct payloads."""
    import pandas as pd

    from .dedup import _dedup_buckets, _fused_grouped_frames

    num_buckets = _dedup_buckets()

    def projector(batch: pa.Table) -> "pd.DataFrame":
        import pyarrow.compute as pc

        from ..sketches import hash_columns_u64

        df = batch.to_pandas().dropna(subset=["text"])
        payload = pc.cast(pa.array(df["text"].astype(str)), pa.binary())
        nbytes = pc.binary_length(payload).to_numpy().astype("int64")
        h = hash_columns_u64(df, ["text"])
        return pd.DataFrame(
            {
                "h": h,
                "b": nbytes,
                "__bucket": (h % np.uint64(num_buckets)).astype(np.int32),
            }
        )

    def bucket_fold(df: "pd.DataFrame") -> "pd.DataFrame":
        g = df.groupby("h", as_index=False).agg(
            c=("b", "size"), b=("b", "first")
        )
        return pd.DataFrame(
            {
                "n_payloads": [int(g["c"].sum())],
                "distinct_payloads": [len(g)],
                "total_bytes": [int((g["c"] * g["b"]).sum())],
                "wasted_bytes": [int(((g["c"] - 1) * g["b"]).sum())],
            }
        )

    parts = _fused_grouped_frames(
        [(f"{sf_dir}/documents.parquet", ["text"], None, projector)],
        num_buckets,
        bucket_fold,
    )
    cols = ["n_payloads", "distinct_payloads", "total_bytes", "wasted_bytes"]
    tot = {c: (int(parts[c].sum()) if len(parts) else 0) for c in cols}
    return pd.DataFrame(
        {
            "n_payloads": [tot["n_payloads"]],
            "distinct_payloads": [tot["distinct_payloads"]],
            "dup_payloads": [tot["n_payloads"] - tot["distinct_payloads"]],
            "total_bytes": [tot["total_bytes"]],
            "wasted_bytes": [tot["wasted_bytes"]],
        }
    )


def payload_entropy_documents(sf_dir: str) -> "pd.DataFrame":
    """Per-source byte-entropy census over the opaque payload column —
    the corruption / double-compression / encryption screen for a
    multimodal lake: a well-formed JPEG pool sits near 8 bits/byte, a
    batch of accidentally-zlib'd-twice or truncated blobs shifts the
    distribution, and a plaintext leak into a media bucket craters it.
    Reported in nats with the exact byte histogram behind it.

    Payload = the document's UTF-8 octets (this module's stand-in blob).
    Each scan task folds its payload bytes into a per-source 256-bin
    ``np.bincount`` straight off the Arrow data buffers (no per-row or
    per-byte Python; bytes never leave the task) and ships ≤ 256 ×
    |sources| integer partials. The driver merges histograms and builds
    share and −p·ln(p) terms from exact integers with the oracle's
    CAST/CAST-divide + LN trees, summed with ``math.fsum`` over
    byte-ascending terms; the 6-dp pin absorbs fsum-vs-Kahan ulps
    (empirical-at-the-pin, like the other entropy ops)."""
    import math

    import pandas as pd

    from ..shuffle import map_partials

    def _byte_hist(chunked) -> np.ndarray:
        hist = np.zeros(256, dtype=np.int64)
        for ch in chunked.chunks if hasattr(chunked, "chunks") else [chunked]:
            if len(ch) == 0:
                continue
            offs = np.frombuffer(ch.buffers()[1], dtype=np.int32)[
                ch.offset : ch.offset + len(ch) + 1
            ]
            data = np.frombuffer(ch.buffers()[2], dtype=np.uint8)[
                offs[0] : offs[-1]
            ]
            hist += np.bincount(data, minlength=256)
        return hist

    def partial(batch: pa.Table) -> "pd.DataFrame":
        import pyarrow.compute as pc

        mask = pc.and_(
            pc.is_valid(batch.column("text")), pc.is_valid(batch.column("source"))
        )
        tbl = batch.filter(mask)
        if tbl.num_rows == 0:
            return pd.DataFrame(
                {
                    "source": pd.Series([], dtype="object"),
                    "byte": pd.Series([], dtype="int64"),
                    "c": pd.Series([], dtype="int64"),
                }
            )
        pay = pc.cast(tbl.column("text"), pa.binary())
        src = tbl.column("source").to_pandas()
        frames = []
        for s in src.unique():
            hist = _byte_hist(pay.filter(pa.array((src == s).to_numpy())))
            nz = np.nonzero(hist)[0]
            frames.append(
                pd.DataFrame(
                    {
                        "source": s,
                        "byte": nz.astype("int64"),
                        "c": hist[nz].astype("int64"),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    parts = map_partials(f"{sf_dir}/documents.parquet", ["source", "text"], None, partial)
    empty = pd.DataFrame(
        {
            "source": pd.Series([], dtype="object"),
            "total_bytes": pd.Series([], dtype="int64"),
            "n_distinct_bytes": pd.Series([], dtype="int64"),
            "entropy_nats": pd.Series([], dtype="float64"),
        }
    )
    if not len(parts):
        return empty
    g = parts.groupby(["source", "byte"], as_index=False)["c"].sum()
    rows = []
    for s, grp in g.groupby("source", sort=True):
        total = int(grp["c"].sum())
        grp = grp.sort_values("byte")
        # CAST(c AS DOUBLE) / CAST(total AS DOUBLE), -(p * LN(p)) —
        # the oracle's exact trees, fsum'd over byte-ascending terms
        terms = [
            -(
                (float(int(c)) / float(total))
                * math.log(float(int(c)) / float(total))
            )
            for c in grp["c"]
        ]
        rows.append(
            {
                "source": s,
                "total_bytes": total,
                "n_distinct_bytes": int(len(grp)),
                "entropy_nats": float(round_duck(math.fsum(terms), 6)),
            }
        )
    out = pd.DataFrame(rows)
    for c in ("total_bytes", "n_distinct_bytes"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


_PAYLOAD_ENTROPY_SQL = """
    WITH h AS (
        SELECT source, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n
        FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
    ),
    b AS (
        SELECT source,
               (strpos('0123456789ABCDEF',
                       substr(hx, CAST(2 * i + 1 AS INT), 1)) - 1) * 16
               + strpos('0123456789ABCDEF',
                        substr(hx, CAST(2 * i + 2 AS INT), 1)) - 1 AS byte
        FROM h, UNNEST(range(0, n)) AS t(i)
    ),
    g AS (SELECT source, byte, COUNT(*) AS c FROM b GROUP BY 1, 2),
    t AS (SELECT source, SUM(c) AS total FROM g GROUP BY 1)
    SELECT g.source,
           CAST(t.total AS BIGINT) AS total_bytes,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_bytes,
           ROUND(fsum(-((CAST(g.c AS DOUBLE) / CAST(t.total AS DOUBLE))
                 * LN(CAST(g.c AS DOUBLE) / CAST(t.total AS DOUBLE)))), 6)
               AS entropy_nats
    FROM g JOIN t USING (source)
    GROUP BY g.source, t.total
    ORDER BY g.source
"""


def chunk_dedup_multimodal(sf_dir: str, chunk: int = 64) -> "pd.DataFrame":
    """Cross-payload CHUNK dedup — the block-storage dedup estimator:
    whole-blob dedup (``payload_dedup_multimodal``) misses re-encoded or
    re-concatenated media that share most of their bytes; fixed-size
    chunk fingerprints measure how much a content-addressed chunk store
    would actually deduplicate across the corpus.

    Each scan task slices its payloads into ``chunk``-byte blocks with
    pure index arithmetic on the Arrow buffers (rows/cols/src built by
    repeat+arange — no per-chunk Python), hashes each block as 8 uint64
    words + the block length (so a short tail block never collides with
    a zero-padded full block), pre-dedups per task, and ships (hash,
    cnt) 16-byte rows into the hash-bucket exchange: a chunk's every
    occurrence lands in one bucket, so per-bucket distinct counts sum
    exactly (64-bit-collision caveat as the other content-hash ops).
    The exchange is ~``16/chunk`` of the corpus bytes at worst, and
    per-task dedup shrinks it further on duplicate-heavy data."""
    import pandas as pd

    from .dedup import _dedup_buckets, _fused_grouped_frames
    from ..sketches import combine_hashes_u64

    assert chunk % 8 == 0
    nb = _dedup_buckets()

    def projector(batch: pa.Table) -> "pd.DataFrame":
        import pyarrow.compute as pc

        empty = pd.DataFrame(
            {
                "h": pd.Series([], dtype="uint64"),
                "cnt": pd.Series([], dtype="int64"),
                "__bucket": pd.Series([], dtype="int32"),
            }
        )
        tbl = batch.filter(pc.is_valid(batch.column("text")))
        if tbl.num_rows == 0:
            return empty
        pay = pc.cast(tbl.column("text"), pa.binary())
        hashes = []
        for ch in pay.chunks if hasattr(pay, "chunks") else [pay]:
            if len(ch) == 0:
                continue
            offs = np.frombuffer(ch.buffers()[1], dtype=np.int32)[
                ch.offset : ch.offset + len(ch) + 1
            ].astype(np.int64)
            data = np.frombuffer(ch.buffers()[2], dtype=np.uint8)
            plens = np.diff(offs)
            nch = (plens + chunk - 1) // chunk  # blocks per payload
            tot = int(nch.sum())
            if tot == 0:
                continue
            cum = np.concatenate(([0], np.cumsum(nch)))
            k = np.arange(tot) - np.repeat(cum[:-1], nch)  # block idx in payload
            starts = np.repeat(offs[:-1], nch) + k * chunk
            ends = np.minimum(starts + chunk, np.repeat(offs[1:], nch))
            clens = ends - starts
            mat = np.zeros((tot, chunk), dtype=np.uint8)
            rows = np.repeat(np.arange(tot), clens)
            cols = np.arange(int(clens.sum())) - np.repeat(
                np.cumsum(clens) - clens, clens
            )
            mat[rows, cols] = data[np.repeat(starts, clens) + cols]
            words = [
                np.ascontiguousarray(mat[:, 8 * i : 8 * (i + 1)])
                .view(np.uint64)
                .ravel()
                for i in range(chunk // 8)
            ]
            hashes.append(combine_hashes_u64(words + [clens.astype(np.uint64)]))
        if not hashes:
            return empty
        vc = pd.Series(np.concatenate(hashes)).value_counts()
        h = vc.index.to_numpy().astype(np.uint64)
        return pd.DataFrame(
            {
                "h": h,
                "cnt": vc.to_numpy().astype("int64"),
                "__bucket": (h % np.uint64(nb)).astype(np.int32),
            }
        )

    def fold(df: "pd.DataFrame") -> "pd.DataFrame":
        g = df.groupby("h", as_index=False)["cnt"].sum()
        return pd.DataFrame(
            {"n_chunks": [int(g["cnt"].sum())], "distinct_chunks": [len(g)]}
        )

    parts = _fused_grouped_frames(
        [(f"{sf_dir}/documents.parquet", ["text"], None, projector)],
        nb,
        fold,
    )
    n = int(parts["n_chunks"].sum()) if len(parts) else 0
    d = int(parts["distinct_chunks"].sum()) if len(parts) else 0
    return pd.DataFrame(
        {
            "n_chunks": pd.Series([n], dtype="int64"),
            "distinct_chunks": pd.Series([d], dtype="int64"),
            "dup_chunks": pd.Series([n - d], dtype="int64"),
            "dedup_ratio": pd.Series(
                [float(round_duck(float(d) / float(n), 6)) if n else None],
                dtype="float64",
            ),
        }
    )


_CHUNK_DEDUP_SQL = """
    WITH p AS (
        SELECT hex(encode(text)) AS hx, octet_length(encode(text)) AS n
        FROM documents WHERE text IS NOT NULL
    ),
    c AS (
        SELECT substr(hx, CAST(128 * i + 1 AS INT), 128) AS chunk
        FROM p, UNNEST(range(0, (n + 63) // 64)) AS t(i)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT chunk) AS BIGINT) AS distinct_chunks,
           CAST(COUNT(*) - COUNT(DISTINCT chunk) AS BIGINT) AS dup_chunks,
           CASE WHEN COUNT(*) > 0 THEN
               ROUND(CAST(COUNT(DISTINCT chunk) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE), 6)
           END AS dedup_ratio
    FROM c
"""


def header_census_multimodal(sf_dir: str, header: int = 16) -> "pd.DataFrame":
    """Per-source payload HEADER collision census — group payloads by
    their first ``header`` octets: in a media lake the leading bytes are
    the container signature + codec parameters, so the distinct-header
    count per source tells you how many encoder configurations feed that
    source (1 = homogeneous pipeline, thousands = a mixed scrape), and a
    dominant header shared by most payloads is the fixed-template /
    watermark stamp that a dedup or decode stage can exploit. Complement
    of the 1-byte magic census (``magic_census``): 16 octets separate
    same-magic-different-parameters files.

    Payload = the document's UTF-8 octets (this module's stand-in blob).
    Each scan task gathers the first min(len, 16) octets per payload
    with pure index arithmetic on the Arrow binary buffers (zero-padded
    rows × 16 matrix — no per-row Python), hashes them as 2 uint64 words
    PLUS the capped length (so 'AB' cannot collide with 'AB\\x00' — the
    same short-tail guard as ``chunk_dedup_multimodal``, fixture-proven
    there), pre-groups per (source, hash) in-task and ships 16-byte
    rows into the hash-bucket exchange; per-bucket group sizes sum
    exactly. Equivalence with the oracle's ``substr(hex(payload),1,32)``
    key: equal iff the capped octet prefixes AND capped lengths are
    equal — hex of a shorter payload is a shorter string, never a padded
    one."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..sketches import combine_hashes_u64
    from .dedup import _dedup_buckets, _fused_grouped_frames

    assert header % 8 == 0 and header <= 255
    nb = _dedup_buckets()

    def projector(batch: pa.Table) -> "pd.DataFrame":
        empty = pd.DataFrame(
            {
                "source": pd.Series([], dtype="object"),
                "h": pd.Series([], dtype="uint64"),
                "cnt": pd.Series([], dtype="int64"),
                "__bucket": pd.Series([], dtype="int32"),
            }
        )
        mask = pc.and_(
            pc.is_valid(batch.column("text")),
            pc.is_valid(batch.column("source")),
        )
        tbl = batch.filter(mask)
        if tbl.num_rows == 0:
            return empty
        pay = pc.cast(tbl.column("text"), pa.binary())
        hashes = []
        for ch in pay.chunks if hasattr(pay, "chunks") else [pay]:
            if len(ch) == 0:
                continue
            offs = np.frombuffer(ch.buffers()[1], dtype=np.int32)[
                ch.offset : ch.offset + len(ch) + 1
            ].astype(np.int64)
            data = np.frombuffer(ch.buffers()[2], dtype=np.uint8)
            plens = np.diff(offs)
            clens = np.minimum(plens, header)
            n = len(plens)
            mat = np.zeros((n, header), dtype=np.uint8)
            rows = np.repeat(np.arange(n), clens)
            cols = np.arange(int(clens.sum())) - np.repeat(
                np.cumsum(clens) - clens, clens
            )
            mat[rows, cols] = data[np.repeat(offs[:-1], clens) + cols]
            words = [
                np.ascontiguousarray(mat[:, 8 * i : 8 * (i + 1)])
                .view(np.uint64)
                .ravel()
                for i in range(header // 8)
            ]
            hashes.append(combine_hashes_u64(words + [clens.astype(np.uint64)]))
        h = np.concatenate(hashes)
        df = pd.DataFrame(
            {"source": tbl.column("source").to_pandas(), "h": h}
        )
        g = df.groupby(["source", "h"], as_index=False).size()
        return pd.DataFrame(
            {
                "source": g["source"],
                "h": g["h"].astype("uint64"),
                "cnt": g["size"].astype("int64"),
                "__bucket": (
                    g["h"].to_numpy().astype(np.uint64) % np.uint64(nb)
                ).astype(np.int32),
            }
        )

    def fold(df: "pd.DataFrame") -> "pd.DataFrame":
        g = df.groupby(["source", "h"], as_index=False)["cnt"].sum()
        out = g.groupby("source", as_index=False).agg(
            payloads=("cnt", "sum"),
            headers=("cnt", "count"),
            mx=("cnt", "max"),
        )
        return out.astype({"payloads": "int64", "headers": "int64", "mx": "int64"})

    parts = _fused_grouped_frames(
        [(f"{sf_dir}/documents.parquet", ["text", "source"], None, projector)],
        nb,
        fold,
    )
    if not len(parts):
        return pd.DataFrame(
            {
                "source": pd.Series([], dtype="object"),
                "n_payloads": pd.Series([], dtype="int64"),
                "n_headers": pd.Series([], dtype="int64"),
                "max_header_count": pd.Series([], dtype="int64"),
            }
        )
    g = parts.groupby("source", as_index=False).agg(
        n_payloads=("payloads", "sum"),
        n_headers=("headers", "sum"),
        max_header_count=("mx", "max"),
    )
    g = g.astype(
        {"n_payloads": "int64", "n_headers": "int64", "max_header_count": "int64"}
    )
    return g.sort_values("source").reset_index(drop=True)


def payload_size_percentiles_multimodal(sf_dir: str) -> "pd.DataFrame":
    """Per-source payload-size percentiles (p50 / p95 octets) — the
    storage-tiering and batch-sizing decision table: a media stage's
    ``batch_size`` must be provisioned against the TAIL payload size per
    feed, not the mean (one 4K-video feed among thumbnails OOMs a worker
    sized on the average). Exact, not sketched: the distributed
    k-th-order-statistic selection (``selection._rank_values`` —
    histogram refinement, ≤ (groups×1024)-row partials per pass, no
    sort) finds the two interpolation neighbors per group and applies
    SQL ``quantile_cont``'s rank arithmetic. Payload = the document's
    UTF-8 octets (this module's stand-in blob); octet length is computed
    per batch with one vectorized UTF-8 encode."""
    import math

    import pandas as pd

    from .selection import _rank_values
    from ._util import round_duck

    path = f"{sf_dir}/documents.parquet"
    qs = (0.5, 0.95)

    def add_octets(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.dropna(subset=["text", "source"])
        return pd.DataFrame(
            {
                "source": df["source"],
                "octets": df["text"]
                .str.encode("utf-8")
                .str.len()
                .astype(float),
            }
        )

    def quantile_ranks(counts: dict) -> dict:
        out = {}
        for grp, n in counts.items():
            ranks = set()
            for q in qs:
                h = (n - 1) * q
                ranks.add(math.floor(h))
                ranks.add(math.ceil(h))
            out[grp] = sorted(ranks)
        return out

    vals, counts = _rank_values(
        path,
        "source",
        "octets",
        quantile_ranks,
        read_cols=["text", "source"],
        transform=add_octets,
    )
    rows = []
    for grp in sorted(vals):
        n = counts[grp]
        rec = [grp, int(n)]
        for q in qs:
            h = (n - 1) * q
            j0, j1 = math.floor(h), math.ceil(h)
            v0, v1 = vals[grp][j0], vals[grp][j1]
            rec.append(float(round_duck(v0 + (v1 - v0) * (h - j0), 4)))
        rows.append(rec)
    return pd.DataFrame(
        rows, columns=["source", "n_payloads", "p50_octets", "p95_octets"]
    ).astype({"n_payloads": "int64"})


_PAYLOAD_SIZE_PCTL_SQL = """
    WITH p AS (
        SELECT source,
               CAST(octet_length(encode(text)) AS DOUBLE) AS b
        FROM documents
        WHERE text IS NOT NULL AND source IS NOT NULL
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_payloads,
           ROUND(quantile_cont(b, 0.5), 4) AS p50_octets,
           ROUND(quantile_cont(b, 0.95), 4) AS p95_octets
    FROM p GROUP BY source ORDER BY source
"""


def _header_census_sql(header: int = 16) -> str:
    return f"""
        WITH g AS (
            SELECT source,
                   substr(hex(encode(text)), 1, {2 * header}) AS hdr,
                   COUNT(*) AS c
            FROM documents
            WHERE text IS NOT NULL AND source IS NOT NULL
            GROUP BY source, hdr
        )
        SELECT source,
               CAST(SUM(c) AS BIGINT) AS n_payloads,
               CAST(COUNT(*) AS BIGINT) AS n_headers,
               CAST(MAX(c) AS BIGINT) AS max_header_count
        FROM g GROUP BY source ORDER BY source
    """


def base64_hygiene_documents(sf_dir: str) -> "pd.DataFrame":
    """Double-encoding screen: payloads whose text is shaped like base64
    (charset ``[A-Za-z0-9+/]`` with ``=``-padding, length ≡ 0 mod 4,
    non-empty) are almost always a serialization bug — a binary blob
    that got base64'd into a text column, silently quadrupling storage
    thirds and poisoning tokenizers. Per source: payload count, base64ish
    count, share.

    One scan, one compiled-regex vectorized ``fullmatch`` per batch plus
    a length gate; ≤ |sources| integer partial rows per task. Charset
    validity implies pure ASCII, so character length equals octet length
    on both engines."""
    import re

    import pandas as pd

    from ..shuffle import map_partials

    pat = re.compile(r"[A-Za-z0-9+/]*={0,2}")

    def partial(batch: pa.Table) -> "pd.DataFrame":
        df = batch.to_pandas().dropna(subset=["source", "text"])
        if not len(df):
            return pd.DataFrame(
                {
                    "source": pd.Series([], dtype="object"),
                    "n": pd.Series([], dtype="int64"),
                    "b64": pd.Series([], dtype="int64"),
                }
            )
        txt = df["text"].astype(str)
        is64 = (
            txt.str.fullmatch(pat)
            & (txt.str.len() % 4 == 0)
            & (txt.str.len() > 0)
        )
        g = (
            pd.DataFrame({"source": df["source"].to_numpy(), "b64": is64.to_numpy()})
            .groupby("source", as_index=False)
            .agg(n=("b64", "size"), b64=("b64", "sum"))
        )
        return g.astype({"n": "int64", "b64": "int64"})

    parts = map_partials(
        f"{sf_dir}/documents.parquet", ["source", "text"], None, partial
    )
    empty = pd.DataFrame(
        {
            "source": pd.Series([], dtype="object"),
            "n_payloads": pd.Series([], dtype="int64"),
            "n_base64ish": pd.Series([], dtype="int64"),
            "share": pd.Series([], dtype="float64"),
        }
    )
    if not len(parts):
        return empty
    g = parts.groupby("source", as_index=False).agg(
        n_payloads=("n", "sum"), n_base64ish=("b64", "sum")
    )
    g["share"] = [
        float(round_duck(float(int(b)) / float(int(n)), 6))
        for b, n in zip(g["n_base64ish"], g["n_payloads"])
    ]
    for c in ("n_payloads", "n_base64ish"):
        g[c] = g[c].astype("int64")
    return g.sort_values("source").reset_index(drop=True)


_BASE64_SQL = """
    WITH p AS (
        SELECT source,
               CASE WHEN regexp_full_match(text, '[A-Za-z0-9+/]*={0,2}')
                         AND LENGTH(text) % 4 = 0 AND LENGTH(text) > 0
                    THEN 1 ELSE 0 END AS b64
        FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_payloads,
           CAST(SUM(b64) AS BIGINT) AS n_base64ish,
           ROUND(CAST(SUM(b64) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
               AS share
    FROM p GROUP BY source ORDER BY source
"""


def encoding_weight_documents(sf_dir: str) -> "pd.DataFrame":
    """UTF-8 encoding weight per language: octets-per-character of the
    text payload — the number that sizes storage and token budgets for a
    multilingual corpus (ASCII languages sit at 1.0, CJK near 3.0; a
    ratio that MOVES between ingests means the encoder or the content
    mix changed). Exact integer octet and character tallies per lang;
    the ratio is one CAST/CAST divide, 6-dp pinned.

    One scan: ``binary_length`` + ``utf8_length`` straight off the Arrow
    buffers, ≤ |langs| integer partials per task."""
    import pandas as pd

    from ..shuffle import map_partials

    def partial(batch: pa.Table) -> "pd.DataFrame":
        import pyarrow.compute as pc

        mask = pc.and_(
            pc.is_valid(batch.column("text")), pc.is_valid(batch.column("lang"))
        )
        tbl = batch.filter(mask)
        if tbl.num_rows == 0:
            return pd.DataFrame(
                {
                    "lang": pd.Series([], dtype="object"),
                    "n": pd.Series([], dtype="int64"),
                    "octets": pd.Series([], dtype="int64"),
                    "chars": pd.Series([], dtype="int64"),
                }
            )
        octets = pc.binary_length(
            pc.cast(tbl.column("text"), pa.binary())
        ).to_numpy().astype("int64")
        chars = pc.utf8_length(tbl.column("text")).to_numpy().astype("int64")
        return (
            pd.DataFrame(
                {"lang": tbl.column("lang").to_pandas(), "o": octets, "c": chars}
            )
            .groupby("lang", as_index=False)
            .agg(n=("o", "size"), octets=("o", "sum"), chars=("c", "sum"))
            .astype({"n": "int64", "octets": "int64", "chars": "int64"})
        )

    parts = map_partials(
        f"{sf_dir}/documents.parquet", ["lang", "text"], None, partial
    )
    empty = pd.DataFrame(
        {
            "lang": pd.Series([], dtype="object"),
            "n_docs": pd.Series([], dtype="int64"),
            "total_octets": pd.Series([], dtype="int64"),
            "total_chars": pd.Series([], dtype="int64"),
            "octets_per_char": pd.Series([], dtype="float64"),
        }
    )
    if not len(parts):
        return empty
    g = parts.groupby("lang", as_index=False).agg(
        n_docs=("n", "sum"), total_octets=("octets", "sum"),
        total_chars=("chars", "sum"),
    )
    g["octets_per_char"] = [
        float(round_duck(float(int(o)) / float(int(c)), 6)) if int(c) else None
        for o, c in zip(g["total_octets"], g["total_chars"])
    ]
    for col in ("n_docs", "total_octets", "total_chars"):
        g[col] = g[col].astype("int64")
    return g.sort_values("lang").reset_index(drop=True)


_ENCODING_WEIGHT_SQL = """
    WITH d AS (
        SELECT lang, octet_length(encode(text)) AS o, LENGTH(text) AS c
        FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(o) AS BIGINT) AS total_octets,
           CAST(SUM(c) AS BIGINT) AS total_chars,
           CASE WHEN SUM(c) > 0 THEN
               ROUND(CAST(SUM(o) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6)
           END AS octets_per_char
    FROM d GROUP BY lang ORDER BY lang
"""


def wav_decode_stats_documents(sf_dir: str) -> "pd.DataFrame":
    """REAL-decoder end-to-end: each document's UTF-8 bytes are packed
    into a genuine WAV container (8-bit PCM mono @ 1 kHz — stdlib
    ``wave`` encoder) inside the scan task, the payloads flow through the
    actor-pool ``featurize_media(decoder="real")`` stage (the vendored
    `codecs.py` WAV parser, held once per actor), and the DECODED
    features aggregate per source feed.

    Oracle-exact by construction: at 1 kHz with 1-byte samples, the
    decoded ``n_samples`` and ``duration_ms`` both equal the document's
    octet length — so the SQL oracle checks the real decode path's
    output (container round-trip included) in closed form. Payloads are
    built and dropped inside map stages; bytes never enter the shuffle
    (the per-source aggregation moves 4 ints per (source, batch))."""
    import pandas as pd

    from ..io import read_table

    path = f"{sf_dir}/documents.parquet"
    ds = read_table(
        path,
        columns=["doc_id", "text", "source"],
        override_num_blocks=payload_read_blocks(path),
    )

    def to_media(batch: pa.Table) -> pa.Table:
        from .codecs import encode_wav

        texts = batch.column("text").to_pylist()
        payloads = [
            encode_wav((t or "").encode("utf-8"), sample_rate=1000, sampwidth=1)
            for t in texts
        ]
        return pa.table(
            {
                "media_id": batch.column("doc_id"),
                "media_type": pa.array(["audio/wav"] * len(texts)),
                "payload": pa.array(payloads, type=pa.binary()),
                "source": batch.column("source"),
            }
        )

    media = ds.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)
    feats = featurize_media(media, decoder="real", batch_size=256, concurrency=(2, 16))

    def partial(batch: pa.Table) -> "pd.DataFrame":
        df = pd.DataFrame(
            {
                "source": batch.column("source").to_pandas(),
                "n_samples": batch.column("n_samples").to_pandas().astype("int64"),
                "duration_ms": batch.column("duration_ms").to_pandas().astype("int64"),
            }
        )
        return (
            df.groupby("source", sort=False)
            .agg(
                n_media=("n_samples", "size"),
                total_samples=("n_samples", "sum"),
                total_duration_ms=("duration_ms", "sum"),
                max_duration_ms=("duration_ms", "max"),
            )
            .reset_index()
            .astype(
                {
                    "n_media": "int64",
                    "total_samples": "int64",
                    "total_duration_ms": "int64",
                    "max_duration_ms": "int64",
                }
            )
        )

    parts = feats.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(
            {
                "source": pd.Series([], dtype="object"),
                "n_media": pd.Series([], dtype="int64"),
                "total_samples": pd.Series([], dtype="int64"),
                "total_duration_ms": pd.Series([], dtype="int64"),
                "max_duration_ms": pd.Series([], dtype="int64"),
            }
        )
    out = parts.groupby("source", as_index=False).agg(
        n_media=("n_media", "sum"),
        total_samples=("total_samples", "sum"),
        total_duration_ms=("total_duration_ms", "sum"),
        max_duration_ms=("max_duration_ms", "max"),
    )
    for c in ("n_media", "total_samples", "total_duration_ms", "max_duration_ms"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


_WAV_DECODE_SQL = """
    WITH p AS (
        SELECT source, octet_length(encode(COALESCE(text, ''))) AS b
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(SUM(b) AS BIGINT) AS total_samples,
           CAST(SUM(b) AS BIGINT) AS total_duration_ms,
           CAST(MAX(b) AS BIGINT) AS max_duration_ms
    FROM p GROUP BY source ORDER BY source
"""


def png_decode_stats_documents(sf_dir: str) -> "pd.DataFrame":
    """REAL compressed-container decode end-to-end: each document's
    UTF-8 bytes are packed into a genuine PNG (8-bit greyscale, width
    64, zero-padded final row, Sub-filtered scanlines, DEFLATE IDAT —
    the vendored `codecs.py` encoder) inside the scan task; the payloads
    flow through the actor-pool ``featurize_media(decoder="real")``
    stage whose PNG parser verifies chunk CRCs, inflates and UNFILTERS
    the scanlines; the DECODED geometry aggregates per source feed.

    Oracle-exact by construction: at width 64 the decoded ``height`` is
    ``ceil(max(octets,1)/64)`` and ``n_pixels`` is ``64*height`` — the
    SQL oracle checks the real decode path (CRC → inflate → unfilter →
    geometry) in closed form. Payload bytes never enter a shuffle."""
    import pandas as pd

    from ..io import read_table

    path = f"{sf_dir}/documents.parquet"
    ds = read_table(
        path,
        columns=["doc_id", "text", "source"],
        override_num_blocks=payload_read_blocks(path),
    )

    def to_media(batch: pa.Table) -> pa.Table:
        import numpy as np

        from .codecs import encode_png

        texts = batch.column("text").to_pylist()
        payloads = []
        for t in texts:
            raw = (t or "").encode("utf-8") or b"\x00"
            h = -(-len(raw) // 64)
            px = np.zeros(h * 64, dtype=np.uint8)
            px[: len(raw)] = np.frombuffer(raw, dtype=np.uint8)
            payloads.append(encode_png(px.reshape(h, 64), filter_type=1))
        return pa.table(
            {
                "media_id": batch.column("doc_id"),
                "media_type": pa.array(["image/png"] * len(texts)),
                "payload": pa.array(payloads, type=pa.binary()),
                "source": batch.column("source"),
            }
        )

    media = ds.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)
    feats = featurize_media(media, decoder="real", batch_size=256, concurrency=(2, 16))

    def partial(batch: pa.Table) -> "pd.DataFrame":
        df = pd.DataFrame(
            {
                "source": batch.column("source").to_pandas(),
                "n_pixels": batch.column("n_pixels").to_pandas().astype("int64"),
                "height": batch.column("height").to_pandas().astype("int64"),
            }
        )
        return (
            df.groupby("source", sort=False)
            .agg(
                n_media=("n_pixels", "size"),
                total_pixels=("n_pixels", "sum"),
                max_height=("height", "max"),
            )
            .reset_index()
            .astype(
                {"n_media": "int64", "total_pixels": "int64", "max_height": "int64"}
            )
        )

    parts = feats.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(
            {
                "source": pd.Series([], dtype="object"),
                "n_media": pd.Series([], dtype="int64"),
                "total_pixels": pd.Series([], dtype="int64"),
                "max_height": pd.Series([], dtype="int64"),
            }
        )
    out = parts.groupby("source", as_index=False).agg(
        n_media=("n_media", "sum"),
        total_pixels=("total_pixels", "sum"),
        max_height=("max_height", "max"),
    )
    for c in ("n_media", "total_pixels", "max_height"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


_PNG_DECODE_SQL = """
    WITH p AS (
        SELECT source,
               CAST(CEIL(GREATEST(octet_length(encode(COALESCE(text, ''))), 1)
                         / 64.0) AS BIGINT) AS h
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(SUM(h * 64) AS BIGINT) AS total_pixels,
           CAST(MAX(h) AS BIGINT) AS max_height
    FROM p GROUP BY source ORDER BY source
"""


def jpeg_decode_stats_documents(sf_dir: str) -> "pd.DataFrame":
    """REAL lossy-container decode end-to-end: each document maps to a
    genuine baseline JPEG (greyscale, 8 blocks across = width 64) built
    inside the scan task by the vendored `jpeg_codec.py` encoder — one
    constant-valued 8×8 block per text byte (capped at 32 blocks,
    value ``28 + 2·((i·37 + octets) mod 101)`` for block index ``i``,
    padding blocks 128); the payloads flow through the actor-pool
    ``featurize_media(decoder="real")`` stage whose decoder runs the
    full baseline pipeline (Huffman entropy decode → dequantize →
    batched IDCT → level shift); the DECODED geometry and pixel sums
    aggregate per source feed.

    Oracle-exact by construction DESPITE the lossy codec: every block
    is constant and even-valued, so its level-shifted DC is a multiple
    of the Annex-K DC quantization step (16) and all AC coefficients
    are analytically zero — the decode reproduces each block
    bit-exactly, and the per-document luminance total
    ``64·(Σ vᵢ + 128·(8·rows − blocks))`` is closed-form SQL. The
    oracle therefore checks actual decoded PIXEL VALUES through the
    Huffman+IDCT path, not just geometry. Payload bytes never enter a
    shuffle."""
    import pandas as pd

    from ..io import read_table

    path = f"{sf_dir}/documents.parquet"
    ds = read_table(
        path,
        columns=["doc_id", "text", "source"],
        override_num_blocks=payload_read_blocks(path),
    )

    def to_media(batch: pa.Table) -> pa.Table:
        import numpy as np

        from .jpeg_codec import encode_jpeg

        texts = batch.column("text").to_pylist()
        payloads = []
        for t in texts:
            octets = len((t or "").encode("utf-8"))
            db = min(max(octets, 1), 32)
            rows = -(-db // 8)
            vals = np.full(rows * 8, 128, dtype=np.uint8)
            idx = np.arange(db, dtype=np.int64)
            vals[:db] = (28 + 2 * ((idx * 37 + octets) % 101)).astype(np.uint8)
            img = np.repeat(
                np.repeat(vals.reshape(rows, 8), 8, axis=0), 8, axis=1
            )
            payloads.append(encode_jpeg(img))
        return pa.table(
            {
                "media_id": batch.column("doc_id"),
                "media_type": pa.array(["image/jpeg"] * len(texts)),
                "payload": pa.array(payloads, type=pa.binary()),
                "source": batch.column("source"),
            }
        )

    media = ds.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)
    feats = featurize_media(media, decoder="real", batch_size=256, concurrency=(2, 16))

    def partial(batch: pa.Table) -> "pd.DataFrame":
        import numpy as np

        n_pixels = batch.column("n_pixels").to_numpy().astype("int64")
        mean = batch.column("mean_value").to_numpy()
        df = pd.DataFrame(
            {
                "source": batch.column("source").to_pandas(),
                "n_pixels": n_pixels,
                "height": batch.column("height").to_numpy().astype("int64"),
                # decoded blocks are bit-exact constants → the float mean
                # recovers the integer pixel sum exactly under round()
                "lum": np.round(mean * n_pixels).astype("int64"),
            }
        )
        return (
            df.groupby("source", sort=False)
            .agg(
                n_media=("n_pixels", "size"),
                total_pixels=("n_pixels", "sum"),
                max_height=("height", "max"),
                total_lum=("lum", "sum"),
            )
            .reset_index()
        )

    parts = feats.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(
            {
                "source": pd.Series([], dtype="object"),
                "n_media": pd.Series([], dtype="int64"),
                "total_pixels": pd.Series([], dtype="int64"),
                "max_height": pd.Series([], dtype="int64"),
                "total_lum": pd.Series([], dtype="int64"),
            }
        )
    out = parts.groupby("source", as_index=False).agg(
        n_media=("n_media", "sum"),
        total_pixels=("total_pixels", "sum"),
        max_height=("max_height", "max"),
        total_lum=("total_lum", "sum"),
    )
    for c in ("n_media", "total_pixels", "max_height", "total_lum"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


_JPEG_DECODE_SQL = """
    WITH p AS (
        SELECT source,
               octet_length(encode(COALESCE(text, ''))) AS octets,
               LEAST(GREATEST(octet_length(encode(COALESCE(text, ''))), 1),
                     32) AS db,
               CAST(CEIL(LEAST(GREATEST(
                   octet_length(encode(COALESCE(text, ''))), 1), 32) / 8.0)
                   AS BIGINT) AS block_rows
        FROM documents
    ), dat AS (
        -- per-source sum of data-block values: uncorrelated 0..31
        -- series cross-joined, clipped to each doc's block count
        SELECT p.source,
               SUM(64 * (28 + 2 * ((t.i * 37 + p.octets) % 101))) AS data_lum
        FROM p, generate_series(0, 31) AS t(i)
        WHERE t.i < p.db
        GROUP BY p.source
    ), base AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_media,
               CAST(SUM(512 * block_rows) AS BIGINT) AS total_pixels,
               CAST(MAX(8 * block_rows) AS BIGINT) AS max_height,
               SUM(64 * 128 * (8 * block_rows - db)) AS pad_lum
        FROM p GROUP BY source
    )
    SELECT base.source, n_media, total_pixels, max_height,
           CAST(pad_lum + COALESCE(data_lum, 0) AS BIGINT) AS total_lum
    FROM base LEFT JOIN dat ON base.source = dat.source
    ORDER BY base.source
"""


def mp4_decode_stats_documents(sf_dir: str) -> "pd.DataFrame":
    """REAL video-container decode end-to-end: each document's UTF-8
    bytes are packed as 256-byte encoded samples into a structurally
    valid one-track MP4 (ftyp + mdat + full moov sample tables — the
    vendored `codecs.py` ISO-BMFF encoder) inside the scan task; the
    payloads flow through the actor-pool
    ``featurize_media(decoder="real")`` stage whose parser walks the box
    tree and resolves stts/stsz/stsc/stco; the DECODED sample counts and
    durations aggregate per source feed.

    Oracle-exact by construction: at 256 B/sample and 100 ms/sample the
    decoded ``n_samples`` is ``ceil(max(octets,1)/256)`` and
    ``duration_ms`` is ``100*n_samples`` — the SQL oracle checks the
    real parse path in closed form. Payload bytes never enter a
    shuffle."""
    import pandas as pd

    from ..io import read_table

    path = f"{sf_dir}/documents.parquet"
    ds = read_table(
        path,
        columns=["doc_id", "text", "source"],
        override_num_blocks=payload_read_blocks(path),
    )

    def to_media(batch: pa.Table) -> pa.Table:
        from .codecs import encode_mp4

        texts = batch.column("text").to_pylist()
        payloads = []
        for t in texts:
            raw = (t or "").encode("utf-8") or b"\x00"
            samples = [raw[i : i + 256] for i in range(0, len(raw), 256)]
            payloads.append(encode_mp4(samples, width=16, height=16))
        return pa.table(
            {
                "media_id": batch.column("doc_id"),
                "media_type": pa.array(["video/mp4"] * len(texts)),
                "payload": pa.array(payloads, type=pa.binary()),
                "source": batch.column("source"),
            }
        )

    media = ds.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)
    feats = featurize_media(media, decoder="real", batch_size=256, concurrency=(2, 16))

    def partial(batch: pa.Table) -> "pd.DataFrame":
        df = pd.DataFrame(
            {
                "source": batch.column("source").to_pandas(),
                "n_samples": batch.column("n_samples").to_pandas().astype("int64"),
                "duration_ms": batch.column("duration_ms").to_pandas().astype("int64"),
            }
        )
        return (
            df.groupby("source", sort=False)
            .agg(
                n_media=("n_samples", "size"),
                total_samples=("n_samples", "sum"),
                total_duration_ms=("duration_ms", "sum"),
                max_samples=("n_samples", "max"),
            )
            .reset_index()
            .astype(
                {
                    "n_media": "int64",
                    "total_samples": "int64",
                    "total_duration_ms": "int64",
                    "max_samples": "int64",
                }
            )
        )

    parts = feats.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(
            {
                "source": pd.Series([], dtype="object"),
                "n_media": pd.Series([], dtype="int64"),
                "total_samples": pd.Series([], dtype="int64"),
                "total_duration_ms": pd.Series([], dtype="int64"),
                "max_samples": pd.Series([], dtype="int64"),
            }
        )
    out = parts.groupby("source", as_index=False).agg(
        n_media=("n_media", "sum"),
        total_samples=("total_samples", "sum"),
        total_duration_ms=("total_duration_ms", "sum"),
        max_samples=("max_samples", "max"),
    )
    for c in ("n_media", "total_samples", "total_duration_ms", "max_samples"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


_MP4_DECODE_SQL = """
    WITH p AS (
        SELECT source,
               CAST(CEIL(GREATEST(octet_length(encode(COALESCE(text, ''))), 1)
                         / 256.0) AS BIGINT) AS s
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(SUM(s) AS BIGINT) AS total_samples,
           CAST(SUM(s * 100) AS BIGINT) AS total_duration_ms,
           CAST(MAX(s) AS BIGINT) AS max_samples
    FROM p GROUP BY source ORDER BY source
"""


QUERIES = {
    "wav_decode_stats_documents": wav_decode_stats_documents,
    "png_decode_stats_documents": png_decode_stats_documents,
    "jpeg_decode_stats_documents": jpeg_decode_stats_documents,
    "mp4_decode_stats_documents": mp4_decode_stats_documents,
    "binary_payload_stats_documents": binary_payload_stats_documents,
    "payload_entropy_documents": payload_entropy_documents,
    "chunk_dedup_multimodal": chunk_dedup_multimodal,
    "base64_hygiene_documents": base64_hygiene_documents,
    "encoding_weight_documents": encoding_weight_documents,
    "payload_chunking_documents": payload_chunking_documents,
    "payload_magic_census_documents": payload_magic_census_documents,
    "payload_dedup_multimodal": payload_dedup_multimodal,
    "header_census_multimodal": header_census_multimodal,
    "payload_size_percentiles_multimodal": payload_size_percentiles_multimodal,
}

ORACLE_SQL = {
    "wav_decode_stats_documents": _WAV_DECODE_SQL,
    "png_decode_stats_documents": _PNG_DECODE_SQL,
    "jpeg_decode_stats_documents": _JPEG_DECODE_SQL,
    "mp4_decode_stats_documents": _MP4_DECODE_SQL,
    "payload_size_percentiles_multimodal": _PAYLOAD_SIZE_PCTL_SQL,
    "header_census_multimodal": _header_census_sql(),
    "payload_entropy_documents": _PAYLOAD_ENTROPY_SQL,
    "chunk_dedup_multimodal": _CHUNK_DEDUP_SQL,
    "base64_hygiene_documents": _BASE64_SQL,
    "encoding_weight_documents": _ENCODING_WEIGHT_SQL,
    "payload_dedup_multimodal": """
        WITH p AS (
            SELECT text, octet_length(encode(text)) AS b
            FROM documents WHERE text IS NOT NULL
        ), g AS (
            SELECT text, COUNT(*) AS c, MIN(b) AS b FROM p GROUP BY text
        )
        SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_payloads,
               CAST(COUNT(*) AS BIGINT) AS distinct_payloads,
               CAST(COALESCE(SUM(c), 0) - COUNT(*) AS BIGINT) AS dup_payloads,
               CAST(COALESCE(SUM(c * b), 0) AS BIGINT) AS total_bytes,
               CAST(COALESCE(SUM((c - 1) * b), 0) AS BIGINT) AS wasted_bytes
        FROM g
    """,
    "payload_chunking_documents": """
        WITH p AS (
            SELECT source, octet_length(encode(text)) AS b,
                   (octet_length(encode(text)) + 255) // 256 AS ch
            FROM documents
        ), g AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_payloads,
                   CAST(SUM(b) AS BIGINT) AS total_bytes,
                   CAST(SUM(ch) AS BIGINT) AS n_chunks
            FROM p GROUP BY source
        )
        SELECT source, n_payloads, total_bytes, n_chunks,
               ROUND(total_bytes / (n_chunks * 256.0), 6) AS avg_chunk_fill
        FROM g ORDER BY source
    """,
    "payload_magic_census_documents": """
        WITH f AS (
            SELECT unicode(left(text, 1)) AS cp
            FROM documents
            WHERE text IS NOT NULL AND LENGTH(text) > 0
        )
        SELECT CASE
                 WHEN (cp BETWEEN 65 AND 90) OR (cp BETWEEN 97 AND 122)
                   THEN 'letter'
                 WHEN cp BETWEEN 48 AND 57 THEN 'digit'
                 WHEN cp = 32 THEN 'space'
                 ELSE 'other'
               END AS klass,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM f GROUP BY 1 ORDER BY 1
    """,
    "binary_payload_stats_documents": """
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_payloads,
               CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes,
               CAST(SUM(CASE WHEN octet_length(encode(text)) > 150
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_large
        FROM documents GROUP BY lang ORDER BY lang
    """,
}
