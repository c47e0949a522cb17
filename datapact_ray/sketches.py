"""Mergeable sketches for the profile pass (stateful actor stages).

All sketches are (a) built per-batch with vectorized numpy, (b) mergeable
monoids so per-batch/per-actor partials combine on the driver, and
(c) serializable to plain bytes/dicts for checkpointing. New design vs the
reference (whose warehouse computed exact SQL aggregates); algorithms from
public literature: t-digest (Dunning & Ertl, "Computing extremely accurate
quantiles using t-digests"), HyperLogLog (Flajolet et al. 2007), Bloom
filters (Bloom 1970).
"""

from __future__ import annotations

import math
import pickle

import numpy as np

_HASH_KEY = "datapact-ray-001"  # exactly 16 bytes; pinned so hashing is deterministic across processes


def hash_columns_u64(df, columns: list[str]) -> np.ndarray:
    """Deterministic per-row uint64 hash of selected DataFrame columns.

    Uses pandas' vectorized SipHash-based row hashing with a pinned
    hash_key so values agree across workers, processes and resumed runs.
    """
    import pandas as pd

    sub = df[columns] if columns else df
    return pd.util.hash_pandas_object(sub, index=False, hash_key=_HASH_KEY).to_numpy(
        dtype=np.uint64
    )


_POLARS_SEED = 20260817  # pinned; polars hashes are process-stable per version

_MIX = np.uint64(0x9E3779B97F4A7C15)


def combine_hashes_u64(cols: list[np.ndarray]) -> np.ndarray:
    """Order-sensitive mix of per-column uint64 hashes (boost-style)."""
    out = cols[0].copy()
    for h in cols[1:]:
        out ^= h + _MIX + (out << np.uint64(6)) + (out >> np.uint64(2))
    return out


def hash_arrow_column_u64(column) -> np.ndarray:
    """Deterministic uint64 hash of one Arrow column WITHOUT creating
    Python objects.

    ``Table.to_pandas`` on string columns allocates millions of PyObjects
    and was the dominant (and badly concurrency-scaling) cost of the
    pre-shuffle projection; polars hashes the Arrow buffers in Rust.
    Record the polars version in lineage manifests: hashes are stable
    across processes for a given version, not across versions.
    """
    import polars as pl

    s = pl.from_arrow(column)
    if isinstance(s, pl.DataFrame):  # chunked arrays may arrive as 1-col frames
        s = s.to_series()
    return s.hash(seed=_POLARS_SEED).to_numpy().astype(np.uint64, copy=False)


def hash_arrow_u64(table, columns: list[str]) -> np.ndarray:
    """Combined per-row hash of selected Arrow table columns."""
    return combine_hashes_u64(
        [hash_arrow_column_u64(table.column(c)) for c in columns]
    )


# ---------------------------------------------------------------------------
# t-digest
# ---------------------------------------------------------------------------


class TDigest:
    """Merging t-digest (clustering variant, vectorized compress).

    Scale function k(q) = delta * (asin(2q-1)/pi + 1/2) keeps tail
    resolution; compress groups sorted centroids by floor(k(q)).
    """

    __slots__ = ("delta", "means", "weights", "_min", "_max", "count")

    def __init__(self, delta: int = 200):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._min = math.inf
        self._max = -math.inf
        self.count = 0.0

    def add(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self._min = min(self._min, float(v.min()))
        self._max = max(self._max, float(v.max()))
        self.count += v.size
        self.means = np.concatenate([self.means, v])
        self.weights = np.concatenate([self.weights, np.ones(v.size)])
        if self.means.size > 8 * self.delta:
            self._compress()

    def merge(self, other: "TDigest") -> "TDigest":
        out = TDigest(self.delta)
        out.means = np.concatenate([self.means, other.means])
        out.weights = np.concatenate([self.weights, other.weights])
        out._min = min(self._min, other._min)
        out._max = max(self._max, other._max)
        out.count = self.count + other.count
        out._compress()
        return out

    def _compress(self) -> None:
        if self.means.size <= 1:
            return
        order = np.argsort(self.means, kind="stable")
        m = self.means[order]
        w = self.weights[order]
        total = w.sum()
        q = (np.cumsum(w) - 0.5 * w) / total
        k = self.delta * (np.arcsin(2.0 * np.clip(q, 0.0, 1.0) - 1.0) / math.pi + 0.5)
        cluster = np.floor(k).astype(np.int64)
        starts = np.concatenate([[0], np.nonzero(np.diff(cluster))[0] + 1])
        new_w = np.add.reduceat(w, starts)
        new_m = np.add.reduceat(m * w, starts) / new_w
        self.means = new_m
        self.weights = new_w

    def cdf(self, xs: np.ndarray) -> np.ndarray:
        """P(X <= x), interpolated across centroids."""
        self._compress()
        xs = np.asarray(xs, dtype=np.float64)
        if self.count == 0:
            return np.zeros_like(xs)
        m, w = self.means, self.weights
        total = w.sum()
        cum = np.cumsum(w) - 0.5 * w  # weight left of each centroid mid
        # piecewise-linear CDF through (min,0), (centroid mids), (max,1)
        pts_x = np.concatenate([[self._min], m, [self._max]])
        pts_y = np.concatenate([[0.0], cum / total, [1.0]])
        # collapse duplicate x keeping the LAST (upper) y: a point mass
        # must step to its full cumulative weight AT the point, and
        # cdf(max) must reach 1 even when max == the last centroid mean
        # (keeping the first y made a CONSTANT column's cdf identically
        # 0, so KS between two different constants read 0.0 — no drift)
        keep = np.concatenate([np.diff(pts_x) > 0, [True]])
        pts_x, pts_y = pts_x[keep], pts_y[keep]
        if pts_x.size == 1:  # zero-variance digest: pure step function
            return np.where(xs >= pts_x[0], 1.0, 0.0)
        return np.interp(xs, pts_x, pts_y, left=0.0, right=1.0)

    def quantile(self, qs: np.ndarray) -> np.ndarray:
        self._compress()
        qs = np.asarray(qs, dtype=np.float64)
        if self.count == 0:
            return np.full_like(qs, np.nan)
        m, w = self.means, self.weights
        total = w.sum()
        cum = (np.cumsum(w) - 0.5 * w) / total
        pts_q = np.concatenate([[0.0], cum, [1.0]])
        pts_x = np.concatenate([[self._min], m, [self._max]])
        keep = np.concatenate([[True], np.diff(pts_q) > 0])
        return np.interp(qs, pts_q[keep], pts_x[keep])

    @property
    def min(self) -> float | None:
        return None if self.count == 0 else self._min

    @property
    def max(self) -> float | None:
        return None if self.count == 0 else self._max

    def to_bytes(self) -> bytes:
        self._compress()
        return pickle.dumps(
            (self.delta, self.means, self.weights, self._min, self._max, self.count)
        )

    @classmethod
    def from_bytes(cls, raw: bytes) -> "TDigest":
        delta, means, weights, mn, mx, count = pickle.loads(raw)
        d = cls(delta)
        d.means, d.weights, d._min, d._max, d.count = means, weights, mn, mx, count
        return d


def ks_statistic(a: TDigest, b: TDigest, probe_points: int = 512) -> float:
    """Two-sample KS statistic approximated from two digests' CDFs."""
    if a.count == 0 or b.count == 0:
        return 0.0
    lo = min(a._min, b._min)
    hi = max(a._max, b._max)
    if hi <= lo:
        return 0.0
    xs = np.concatenate(
        [np.linspace(lo, hi, probe_points), a.means, b.means]
    )
    return float(np.max(np.abs(a.cdf(xs) - b.cdf(xs))))


def psi_statistic(source: TDigest, target: TDigest, bins: int = 10) -> float:
    """Population stability index over quantile bins of the source digest.

    Standard definition: psi = Σ (p_s - p_t) * ln(p_s / p_t) with bin
    probabilities floored at 1e-6 to avoid infinities.
    """
    if source.count == 0 or target.count == 0:
        return 0.0
    edges = source.quantile(np.linspace(0.0, 1.0, bins + 1))
    edges[0] = min(edges[0], target._min) - 1e-9
    edges[-1] = max(edges[-1], target._max) + 1e-9
    # strictly increasing edges (duplicate quantiles collapse bins)
    edges = np.maximum.accumulate(edges)
    s_cdf = source.cdf(edges)
    t_cdf = target.cdf(edges)
    p_s = np.clip(np.diff(s_cdf), 1e-6, None)
    p_t = np.clip(np.diff(t_cdf), 1e-6, None)
    p_s = p_s / p_s.sum()
    p_t = p_t / p_t.sum()
    return float(np.sum((p_s - p_t) * np.log(p_s / p_t)))


def tvd_statistic(p_counts: dict, q_counts: dict) -> float:
    """Total variation distance between two categorical frequency
    tables: 0.5·Σ |p_v − q_v| over the union of values (NULL is its own
    category). Both empty → 0.0; exactly one empty → 1.0 (maximal — a
    disappeared distribution, matching the drift checks'
    one-sided-missing semantics)."""
    ps = sum(p_counts.values())
    qs = sum(q_counts.values())
    if ps == 0 and qs == 0:
        return 0.0
    if ps == 0 or qs == 0:
        return 1.0
    total = 0.0
    for v in set(p_counts) | set(q_counts):
        total += abs(p_counts.get(v, 0) / ps - q_counts.get(v, 0) / qs)
    return 0.5 * total


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


class HyperLogLog:
    """Classic HLL with linear-counting small-range correction."""

    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 14):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> None:
        h = hashes.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = h & np.uint64((1 << (64 - self.p)) - 1)
        # rho = position of leftmost 1-bit in the low (64-p) bits, 1-based
        fl = np.zeros(w.shape, dtype=np.float64)
        nz = w > 0
        fl[nz] = np.floor(np.log2(w[nz].astype(np.float64)))
        rho = np.where(nz, (64 - self.p) - fl, (64 - self.p) + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-self.registers.astype(np.float64)))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                est = m * math.log(m / zeros)
        return float(est)

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.p, self.registers))

    @classmethod
    def from_bytes(cls, raw: bytes) -> "HyperLogLog":
        p, registers = pickle.loads(raw)
        h = cls(p)
        h.registers = registers
        return h


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


class BloomFilter:
    """Bit-array Bloom filter over uint64 element hashes (double hashing)."""

    __slots__ = ("n_bits", "k", "bits")

    def __init__(self, capacity: int, fpp: float = 0.01):
        capacity = max(capacity, 1)
        n_bits = int(-capacity * math.log(fpp) / (math.log(2) ** 2))
        self.n_bits = max(64, n_bits)
        self.k = max(1, int(round(self.n_bits / capacity * math.log(2))))
        self.bits = np.zeros((self.n_bits + 7) // 8, dtype=np.uint8)

    def _positions(self, hashes: np.ndarray, i: int) -> np.ndarray:
        h1 = hashes.astype(np.uint64, copy=False)
        h2 = (h1 >> np.uint64(32)) | (h1 << np.uint64(32))
        return ((h1 + np.uint64(i) * h2) % np.uint64(self.n_bits)).astype(np.int64)

    def add_hashes(self, hashes: np.ndarray) -> None:
        for i in range(self.k):
            pos = self._positions(hashes, i)
            np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        out = np.ones(hashes.shape, dtype=bool)
        for i in range(self.k):
            pos = self._positions(hashes, i)
            out &= (self.bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
        return out

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits and self.k == other.k
        out = BloomFilter.__new__(BloomFilter)
        out.n_bits = self.n_bits
        out.k = self.k
        out.bits = self.bits | other.bits
        return out

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.n_bits, self.k, np.packbits(np.unpackbits(self.bits))))

    @classmethod
    def from_bytes(cls, raw: bytes) -> "BloomFilter":
        n_bits, k, bits = pickle.loads(raw)
        b = cls.__new__(cls)
        b.n_bits, b.k, b.bits = n_bits, k, bits
        return b


# ---------------------------------------------------------------------------
# Heavy hitters (hot-key detection for salting)
# ---------------------------------------------------------------------------


class TopKCounter:
    """Approximate heavy hitters: per-batch exact top-K counts, merged by
    summation. Undercounts keys that never enter a batch top-K, which is
    fine for detecting grossly hot keys (1000x skew)."""

    __slots__ = ("k", "counts")

    def __init__(self, k: int = 64):
        self.k = k
        self.counts: dict = {}

    def add_value_counts(self, keys: np.ndarray, counts: np.ndarray) -> None:
        if len(keys) > self.k:
            top = np.argsort(counts)[::-1][: self.k]
            keys, counts = keys[top], counts[top]
        for key, c in zip(keys.tolist(), counts.tolist()):
            self.counts[key] = self.counts.get(key, 0) + int(c)

    def merge(self, other: "TopKCounter") -> "TopKCounter":
        out = TopKCounter(self.k)
        out.counts = dict(self.counts)
        for key, c in other.counts.items():
            out.counts[key] = out.counts.get(key, 0) + c
        # keep bounded
        if len(out.counts) > 4 * self.k:
            keep = sorted(out.counts.items(), key=lambda kv: -kv[1])[: 2 * self.k]
            out.counts = dict(keep)
        return out

    def hot_keys(self, min_count: int) -> dict:
        return {k: c for k, c in self.counts.items() if c >= min_count}


class MisraGries:
    """Misra–Gries heavy-hitters summary with a tracked error bound
    (Misra & Gries 1982; merge rule from Agarwal et al. 2012,
    "Mergeable Summaries").

    Holds at most ``k`` counters. ``offset`` accumulates the total
    decrement applied, giving the two-sided guarantee per present key
    ``est ≤ true ≤ est + offset``, and every key whose true count
    exceeds ``offset`` is guaranteed PRESENT — unlike ``TopKCounter``
    (the skew-detection heuristic above), which truncates per batch and
    can silently drop a globally-heavy key that is cold in every batch.
    """

    __slots__ = ("k", "counts", "offset")

    def __init__(self, k: int = 64):
        self.k = k
        self.counts: dict = {}
        self.offset = 0

    def _shrink(self) -> None:
        if len(self.counts) <= self.k:
            return
        vals = sorted(self.counts.values(), reverse=True)
        med = vals[self.k]  # (k+1)-th largest
        self.counts = {
            key: c - med for key, c in self.counts.items() if c > med
        }
        self.offset += med

    def add_value_counts(self, keys, counts) -> None:
        """Add a batch's exact (key, count) pairs (e.g. value_counts)."""
        for key, c in zip(list(keys), list(counts)):
            self.counts[key] = self.counts.get(key, 0) + int(c)
        self._shrink()

    def merge(self, other: "MisraGries") -> "MisraGries":
        out = MisraGries(self.k)
        out.counts = dict(self.counts)
        for key, c in other.counts.items():
            out.counts[key] = out.counts.get(key, 0) + c
        out.offset = self.offset + other.offset
        out._shrink()
        return out

    def items_with_bounds(self) -> list:
        """[(key, est, est + offset)] sorted by est desc, key asc."""
        return [
            (key, c, c + self.offset)
            for key, c in sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))
        ]

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.k, self.counts, self.offset))

    @classmethod
    def from_bytes(cls, raw: bytes) -> "MisraGries":
        k, counts, offset = pickle.loads(raw)
        out = cls(k)
        out.counts, out.offset = counts, offset
        return out
