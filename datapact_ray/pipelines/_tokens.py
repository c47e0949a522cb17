"""Vectorized tokenization / shingle-hash machinery shared by the text
and dedup pipelines.

Every function here is batch-shaped: one call processes ALL documents of
a ``map_batches`` batch through flat numpy arrays — no per-document
Python loop in the hot path (the only Python iteration is over documents
shorter than the shingle width, which get a single combined shingle).

Hashing is deterministic across processes: tokens are hashed with
pandas' siphash (``hash_pandas_object`` with a pinned 16-byte key), and
k-gram shingles combine consecutive token hashes with a wrapping
multiply-add rolling polynomial — no string joins, no per-shingle crc32.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_HASH_KEY = "datapact-ray-tok"  # hash_pandas_object demands EXACTLY 16 bytes
_ROLL = np.uint64(0x100000001B3)  # FNV-ish odd multiplier for k-gram combine

# byte-wise popcount lookup (numpy<2 has no bitwise_count)
_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
    axis=1
).astype(np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array."""
    return _POP8[np.ascontiguousarray(x).view(np.uint8).reshape(-1, 8)].sum(
        axis=1, dtype=np.int64
    )


def flat_tokens(
    text: pd.Series, lowercase: bool = False, word_re: str | None = None
) -> tuple[pd.Series, np.ndarray]:
    """All documents' tokens flattened into one Series, plus the per-doc
    token counts that delimit document boundaries in the flat array.
    ``word_re=None`` splits on whitespace; otherwise ``str.findall``."""
    if lowercase:
        text = text.str.lower()
    lists = text.str.findall(word_re) if word_re else text.str.split()
    counts = lists.str.len().fillna(0).astype(np.int64).to_numpy()
    flat = lists.explode().dropna()
    return flat, counts


def token_hashes(flat: pd.Series) -> np.ndarray:
    """Deterministic uint64 siphash per token (vectorized C kernel)."""
    if len(flat) == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_pandas_object(
        flat, index=False, hash_key=_HASH_KEY
    ).to_numpy()


def segment_reduce(values: np.ndarray, counts: np.ndarray, ufunc, empty=0):
    """Per-document reduction over the flat ``values`` array delimited by
    ``counts``. Zero-count documents get ``empty`` (``ufunc.reduceat``
    would otherwise mis-handle empty segments). Works on 1-D values or on
    2-D values reduced along axis 0."""
    n = len(counts)
    nz = counts > 0
    shape = (n,) if values.ndim == 1 else (n, values.shape[1])
    out = np.full(shape, empty, dtype=values.dtype if values.ndim else None)
    if nz.any() and len(values):
        bounds = (np.cumsum(counts) - counts)[nz]
        out[nz] = ufunc.reduceat(values, bounds.astype(np.int64), axis=0)
    return out


def shingle_hashes(
    th: np.ndarray, counts: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Rolling k-gram hashes per document over the flat token-hash array.

    Returns ``(sh, sh_counts)``: the shingle hashes concatenated in
    document order and the per-document shingle counts. Documents with
    fewer than k tokens (including zero) contribute ONE shingle combining
    all their tokens, so no document is ever shingle-less (mirrors the
    reference behavior of hashing the whole short text once)."""
    n_docs = len(counts)
    starts = np.cumsum(counts) - counts
    long = counts >= k
    sh_counts = np.where(long, counts - k + 1, 1).astype(np.int64)
    out = np.zeros(int(sh_counts.sum()), dtype=np.uint64)
    out_starts = np.cumsum(sh_counts) - sh_counts

    if long.any() and len(th) >= k:
        # rolling polynomial over every flat position; valid where the
        # whole window stays inside one document
        s = len(th) - k + 1
        roll = np.zeros(s, dtype=np.uint64)
        for j in range(k):
            roll = roll * _ROLL + th[j : j + s]
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        valid = doc_of[: s] == doc_of[k - 1 :]
        pos = np.nonzero(valid)[0]
        d = doc_of[pos]
        out[out_starts[d] + (pos - starts[d])] = roll[pos]

    for d in np.nonzero(~long)[0]:  # short docs only: tiny Python loop
        h = np.uint64(0)
        for j in range(starts[d], starts[d] + counts[d]):
            h = h * _ROLL + th[j]
        out[out_starts[d]] = h
    return out, sh_counts


def minhash_signatures(
    sh: np.ndarray, sh_counts: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signatures: per permutation a
    wrapping multiply-add hash of each shingle, minimized per document
    (``np.minimum.reduceat`` — every doc has ≥1 shingle by construction).
    """
    n_docs = len(sh_counts)
    num_perm = len(a)
    bounds = (np.cumsum(sh_counts) - sh_counts).astype(np.int64)
    sig = np.empty((n_docs, num_perm), dtype=np.uint64)
    for p in range(num_perm):  # per-perm loop bounds peak memory at O(|sh|)
        v = a[p] * sh + b[p]
        sig[:, p] = np.minimum.reduceat(v, bounds)
    return sig


def simhash64(th: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """64-bit SimHash per document (Charikar 2002), fully vectorized:
    unpack token-hash bits, sum ±1 contributions per document
    (``segment_reduce``), take the sign, repack. Empty docs hash to 0."""
    n_docs = len(counts)
    if len(th) == 0:
        return np.zeros(n_docs, dtype=np.uint64)
    bits = np.unpackbits(
        np.ascontiguousarray(th).view(np.uint8).reshape(-1, 8),
        axis=1,
        bitorder="little",
    ).astype(np.int32)
    contrib = bits * 2 - 1
    sums = segment_reduce(contrib, counts, np.add, empty=0)
    h_bits = (sums > 0).astype(np.uint8)
    packed = np.packbits(h_bits, axis=1, bitorder="little")
    return np.ascontiguousarray(packed).view(np.uint64).ravel()


def band_keys(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) int64 LSH band keys: the rolling combine of each
    band's signature slice (band collision ⇔ identical slice, up to the
    64-bit combine)."""
    n_docs, num_perm = sig.shape
    rpb = num_perm // bands
    s3 = sig[:, : bands * rpb].reshape(n_docs, bands, rpb)
    bk = np.zeros((n_docs, bands), dtype=np.uint64)
    for j in range(rpb):
        bk = bk * _ROLL + s3[:, :, j]
    return bk.view(np.int64)
