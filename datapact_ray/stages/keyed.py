"""Bucketed keyed pass: every key-shaped AND group-shaped check in ONE
explicit hash shuffle.

Replaces the reference's PK joins and COUNT(DISTINCT) scans
(``validation.sql.j2:135-142,195-241``) and adds the transcript checks
(ordering, turn-count distribution) on the same exchange:

1. **Pre-shuffle projection** (stateless ``map_batches``): each side is
   reduced to its key columns plus *fixed-width hashes* — a row hash
   over ``hash_columns``, one hash per compare column (e.g. ``text``),
   null flags — so the all-to-all ships ~8 bytes per check per row
   instead of wide text payloads. Per-column hashes are computed once
   and combined, so ``text`` is hashed a single time even when it feeds
   both the row hash and the compare check.
2. **One partitioning key reused by every check**: the bucket id is
   ``hash(group, shard) % B`` where ``group`` is the conversation key
   and ``shard = turn_idx // span`` for *hot* conversations (detected by
   the profile pass), else 0. Identical composite keys always land in
   one bucket (same turn ⇒ same shard) so uniqueness and the PK join
   stay exact, whole cold conversations stay bucket-local for ordering,
   and hot conversations are salted into contiguous index ranges whose
   partials merge exactly on the driver (north-rule skew handling).
   Without a group column the bucket is the composite-key hash.
3. **Explicit two-phase shuffle** (``shuffle.bucket_shuffle``): map
   tasks split projected blocks by bucket; one reduce task per bucket
   concatenates its shards and runs the vectorized pandas verification —
   inner-join on the uint64 key hash (the reference's INNER JOIN
   semantics: rows missing on either side are not mismatches), per-side
   duplicate detection, null counts over matched pairs, per-column
   equality, turn_idx contiguity, ts monotonicity, turn-count t-digest.
   Each bucket checkpoints its violations + metrics
   (``bucket=<b>/{violations.parquet,metrics.pkl,_SUCCESS}``); resumed
   runs filter completed buckets out *before* the shuffle.
"""

from __future__ import annotations

import functools
import json
import os
import pickle
import tempfile
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

import pyarrow.compute as pc

from ..sketches import TDigest, combine_hashes_u64, hash_arrow_column_u64

SIDE_SOURCE = 0
SIDE_TARGET = 1
SIDE_NAMES = ("source", "target")


@dataclass
class KeyedSpec:
    key_columns: list[str]
    row_hash: bool = False
    hash_columns: list[str] | None = None  # None -> all common columns
    null_join_columns: list[str] = field(default_factory=list)
    compare_columns: list[str] = field(default_factory=list)
    uniqueness: bool = False  # uniqueness over key_columns, both sides
    # conversation/group checks riding the same shuffle
    group_column: str | None = None  # e.g. conv_id; enables group bucketing
    index_column: str | None = None  # e.g. turn_idx
    ts_column: str | None = None
    require_contiguous: bool = False
    require_monotonic_ts: bool = False
    # which sides the ORDERING rules (contiguity/monotonicity) apply to:
    # (0,)=source, (1,)=target, (0,1)=both (OrderingCheck.sides). Other
    # group checks (grammar, turn-count/ts-gap digests) always run both
    # sides — they feed side-symmetric checks.
    ordering_sides: tuple = (0, 1)
    turn_count_digest: bool = False
    # inter-turn ts-gap digest (seconds): consecutive-turn deltas in
    # turn order; hot shards add interior gaps in the vectorized pass
    # and boundary gaps in the driver stitch — each pair counted once
    ts_gap_digest: bool = False
    # role-grammar sequence checks (same exchange; roles ship as int8
    # vocabulary codes — 1 byte/row — never as strings)
    grammar_role_column: str | None = None
    grammar_roles: list[str] = field(default_factory=list)  # code = position
    grammar_enforce_vocab: bool = False  # flag rows outside grammar_roles
    grammar_first_role: str | None = None  # required role at the first turn
    grammar_transitions: list[tuple[str, str]] | None = None  # allowed (prev, curr)
    grammar_tool_column: str | None = None  # non-null iff role in tool_roles
    grammar_tool_roles: list[str] = field(default_factory=list)
    # conversation-level exact dedup (same exchange): two conversations
    # on the SAME side are duplicates when their ordered sequences of
    # conv_dedup_columns values are identical. Each conversation reduces
    # to a 128-bit order-sensitive polynomial fingerprint of its per-row
    # content hashes; fingerprints (~40 B/conversation) flow through a
    # chained object-store exchange keyed by fingerprint — conversation
    # text never re-shuffles and the driver never holds the set.
    conv_dedup_columns: list[str] | None = None
    conv_dedup_sides: tuple = (0, 1)
    # "exact" (ordered polynomial fingerprint) or "near" (MinHash-LSH
    # over the conversation's turn-hash SET: per-shard lane minima merge
    # by elementwise min, band rows flow through the chained exchange,
    # and a second chained hop dedups multi-band flags per conversation)
    conv_dedup_mode: str = "exact"
    conv_dedup_num_perm: int = 16
    conv_dedup_bands: int = 4
    # lowercase + collapse whitespace in string content columns before
    # hashing (reformatted copies compare equal)
    conv_dedup_normalize: bool = False
    hot_keys: dict = field(default_factory=dict)  # group key -> approx count
    hot_shard_span: int = 8192
    max_violations_per_bucket: int = 100
    num_buckets: int = 64
    checkpoint_dir: str | None = None  # per-bucket checkpoints when set
    # completed-bucket checkpoints are only REUSED when resume is set;
    # a fresh run still writes them but never skips work based on stale
    # files from an earlier run (the runner clears the dir on non-resume)
    resume: bool = False
    # cross-run incremental reuse: when set, each bucket's reduce ALSO
    # persists the bucket's PROJECTED INPUT table (fixed-width hashes +
    # key columns — the exchange payload, never the raw text) as
    # ``bucket=<b>/input.parquet``, so the NEXT run over an append-only
    # input can scan only the newly-added files and union per bucket
    persist_input: bool = False
    # a prior run's keyed checkpoint dir whose bucket input tables feed
    # this run's reduces as one extra shard side. Set by the runner ONLY
    # after validating: identical spec signature, identical filter, and
    # prior file lists ⊆ current (append-only) — anything else falls
    # back to a full scan. The union the checker sees is then the exact
    # multiset a full scan would deliver, so verdicts are identical.
    prior_input_dir: str | None = None

    def hot_hash_array(self) -> np.ndarray:
        """Hot-key identities as uint64 column hashes. Accepts either raw
        hash keys (from the profile's hash-space heavy hitters) or string
        key values (tests / manual configuration)."""
        if not self.hot_keys:
            return np.empty(0, dtype=np.uint64)
        from ..sketches import hash_arrow_column_u64

        raw = list(self.hot_keys)
        if all(isinstance(k, (int, np.integer)) for k in raw):
            return np.array(raw, dtype=np.uint64)
        return hash_arrow_column_u64(pa.array([str(k) for k in raw]))

    @property
    def grammar_checks(self) -> bool:
        return bool(
            self.grammar_role_column
            and (
                self.grammar_enforce_vocab
                or self.grammar_first_role
                or self.grammar_transitions is not None
                or self.grammar_tool_column
            )
        )

    @property
    def group_checks(self) -> bool:
        return bool(
            self.group_column
            and (
                self.require_contiguous
                or self.require_monotonic_ts
                or self.turn_count_digest
                or self.ts_gap_digest
                or self.grammar_checks
                or self.conv_dedup_columns
            )
        )


@dataclass
class KeyedMetrics:
    total_compared_rows: int = 0
    mismatch_count: int = 0
    compare_mismatches: dict[str, int] = field(default_factory=dict)
    null_join: dict[str, list[int]] = field(default_factory=dict)  # col -> [src, tgt]
    uniq_count: list[int] = field(default_factory=lambda: [0, 0])
    uniq_distinct: list[int] = field(default_factory=lambda: [0, 0])
    # group/ordering checks
    groups_checked: list[int] = field(default_factory=lambda: [0, 0])
    contiguity_violations: list[int] = field(default_factory=lambda: [0, 0])
    monotonicity_violations: list[int] = field(default_factory=lambda: [0, 0])
    # role-grammar sequence checks
    grammar_groups_flagged: list[int] = field(default_factory=lambda: [0, 0])
    grammar_unknown_rows: list[int] = field(default_factory=lambda: [0, 0])
    grammar_tool_mismatch_rows: list[int] = field(default_factory=lambda: [0, 0])
    grammar_bad_transition_groups: list[int] = field(default_factory=lambda: [0, 0])
    grammar_bad_first_groups: list[int] = field(default_factory=lambda: [0, 0])
    digests: list[TDigest | None] = field(default_factory=lambda: [None, None])
    # inter-turn ts-gap digests (seconds), per side
    gap_digests: list[TDigest | None] = field(default_factory=lambda: [None, None])
    hot_partials: dict = field(default_factory=dict)  # (side, group) -> [shard dicts]
    # conversation-dedup results, filled by the driver AFTER the chained
    # fingerprint exchange (per-bucket partials never set them)
    conv_distinct: list[int] = field(default_factory=lambda: [0, 0])
    conv_dup_convs: list[int] = field(default_factory=lambda: [0, 0])
    # keys whose content exists on the OTHER side only under different
    # keys (exact conv-dedup mode; informational migration signal)
    conv_rekeyed: list[int] = field(default_factory=lambda: [0, 0])
    violations: int = 0

    def merge(self, other: "KeyedMetrics") -> "KeyedMetrics":
        self.total_compared_rows += other.total_compared_rows
        self.mismatch_count += other.mismatch_count
        for c, n in other.compare_mismatches.items():
            self.compare_mismatches[c] = self.compare_mismatches.get(c, 0) + n
        for c, (s, t) in other.null_join.items():
            cur = self.null_join.setdefault(c, [0, 0])
            cur[0] += s
            cur[1] += t
        for i in (0, 1):
            self.uniq_count[i] += other.uniq_count[i]
            self.uniq_distinct[i] += other.uniq_distinct[i]
            self.groups_checked[i] += other.groups_checked[i]
            self.contiguity_violations[i] += other.contiguity_violations[i]
            self.monotonicity_violations[i] += other.monotonicity_violations[i]
            # getattr defaults: metrics.pkl checkpoints written before the
            # grammar fields existed must stay resumable (grammar wasn't
            # configured in those runs, so zero is the true value)
            zz = [0, 0]
            self.grammar_groups_flagged[i] += getattr(
                other, "grammar_groups_flagged", zz
            )[i]
            self.grammar_unknown_rows[i] += getattr(
                other, "grammar_unknown_rows", zz
            )[i]
            self.grammar_tool_mismatch_rows[i] += getattr(
                other, "grammar_tool_mismatch_rows", zz
            )[i]
            self.grammar_bad_transition_groups[i] += getattr(
                other, "grammar_bad_transition_groups", zz
            )[i]
            self.grammar_bad_first_groups[i] += getattr(
                other, "grammar_bad_first_groups", zz
            )[i]
            if other.digests[i] is not None:
                self.digests[i] = (
                    other.digests[i]
                    if self.digests[i] is None
                    else self.digests[i].merge(other.digests[i])
                )
            # getattr default: metrics.pkl checkpoints written before the
            # gap-digest field existed stay resumable (the spec-signature
            # guard wipes them when ts_gap is newly CONFIGURED, so a
            # missing digest here always truly means "not collected")
            other_gap = getattr(other, "gap_digests", [None, None])[i]
            if other_gap is not None:
                if not hasattr(self, "gap_digests"):
                    self.gap_digests = [None, None]
                self.gap_digests[i] = (
                    other_gap
                    if self.gap_digests[i] is None
                    else self.gap_digests[i].merge(other_gap)
                )
        for k, shards in other.hot_partials.items():
            self.hot_partials.setdefault(k, []).extend(shards)
        for i in (0, 1):
            # getattr defaults on OTHER: pre-conv-dedup metrics.pkl
            # checkpoints (the spec-signature guard wipes them when the
            # check is newly configured, so zero here truly means zero)
            self.conv_distinct[i] += getattr(other, "conv_distinct", [0, 0])[i]
            self.conv_dup_convs[i] += getattr(other, "conv_dup_convs", [0, 0])[i]
            self.conv_rekeyed[i] += getattr(other, "conv_rekeyed", [0, 0])[i]
        self.violations += other.violations
        return self


def _atomic_write(path: str, data: bytes) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d)
    with os.fdopen(fd, "wb") as fh:
        fh.write(data)
    os.replace(tmp, path)


# ---------------------------------------------------------------------------
# conversation fingerprints (conv-dedup): order-sensitive polynomial
# hashes over the per-turn content hashes, mod 2^64.
#
#   fp(c_0..c_{k-1}) = sum_j c_j * R^j  (mod 2^64)
#
# Two independent lanes (R1 over h, R2 over a bijective remix of h) give
# an effective 128-bit fingerprint: at 1e11 conversations the expected
# birthday collisions are ~(1e11)^2 / 2^129 ≈ 1e-17. The polynomial is
# SHARD-SPLITTABLE: a hot conversation salted into contiguous shards
# combines exactly as fp = Σ_s fp_s · R^{offset_s} where offset_s is the
# turn count before shard s — the same stitch contract the ordering
# checks already rely on. R is odd, hence invertible mod 2^64, which
# lets the per-segment powers be computed with two global cumulative
# products instead of a per-group loop.
_FP_R1 = np.uint64(0x9E3779B97F4A7C15)  # odd multipliers
_FP_R2 = np.uint64(0xC2B2AE3D27D4EB4F)
_FP_X2 = np.uint64(0x94D049BB133111EB)  # lane-2 remix of the row hash
_FP_R1_INV = np.uint64(pow(int(_FP_R1), -1, 1 << 64))
_FP_R2_INV = np.uint64(pow(int(_FP_R2), -1, 1 << 64))
_U64 = (1 << 64) - 1


def _poly_fps(h: np.ndarray, starts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-segment polynomial fingerprints of a uint64 hash stream.

    ``starts`` are the segment start indices (starts[0] == 0); rows
    within a segment are already in turn order. Fully vectorized:
    R^(i - seg_start) = R^i * R^(-seg_start) via two global cumulative
    products (uint64 ufuncs wrap mod 2^64 by definition). Returns the
    two fingerprint lanes, one value per segment."""
    n = len(h)
    seg_id = np.zeros(n, dtype=np.int64)
    seg_id[starts[1:]] = 1
    seg_id = np.cumsum(seg_id)
    with np.errstate(over="ignore"):
        out = []
        for R, Rinv, hs in (
            (_FP_R1, _FP_R1_INV, h),
            (_FP_R2, _FP_R2_INV, h ^ _FP_X2),
        ):
            pows = np.full(n, R, dtype=np.uint64)
            pows[0] = np.uint64(1)
            pows = np.multiply.accumulate(pows)  # R^i
            inv = np.full(n, Rinv, dtype=np.uint64)
            inv[0] = np.uint64(1)
            inv = np.multiply.accumulate(inv)  # R^-i
            r_pow = pows * inv[starts][seg_id]  # R^(i - seg_start)
            out.append(np.add.reduceat(hs * r_pow, starts))
    return out[0], out[1]


def _fp_shift(fp: int, offset: int, lane: int) -> int:
    """Driver-side exact shift of a shard fingerprint by ``offset``
    turns: fp · R^offset mod 2^64 (hot-conversation stitch)."""
    R = int(_FP_R1) if lane == 0 else int(_FP_R2)
    return (fp * pow(R, offset, 1 << 64)) & _U64


def _fp_bucket(fp1: np.ndarray, fp2: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic fingerprint-space bucket id for the chained dedup
    exchange — identical fingerprints land in one bucket regardless of
    which conversation bucket produced them."""
    with np.errstate(over="ignore"):
        mixed = (fp1 ^ (fp2 * _FP_X2)) % np.uint64(num_buckets)
    return mixed.astype(np.int32)


_FP_SCHEMA = pa.schema(
    [
        ("__side", pa.int8()),
        ("n", pa.int64()),
        ("fp1", pa.uint64()),
        ("fp2", pa.uint64()),
        ("key", pa.string()),
        ("__bucket", pa.int32()),
    ]
)

# near mode: one row per (conversation, band)
_BAND_SCHEMA = pa.schema(
    [
        ("__side", pa.int8()),
        ("band", pa.int8()),
        ("bkey", pa.uint64()),
        ("key", pa.string()),
        ("__bucket", pa.int32()),
    ]
)

_MINHASH_SEED = 20260820  # pinned lane constants (resume/determinism)


def _empty_fp_table(mode: str = "exact") -> pa.Table:
    return (_BAND_SCHEMA if mode == "near" else _FP_SCHEMA).empty_table()


def _fp_table(
    sides: np.ndarray,
    ns: np.ndarray,
    f1: np.ndarray,
    f2: np.ndarray,
    keys: pa.Array,
    num_buckets: int,
) -> pa.Table:
    """Exact-mode fingerprint rows (shared by the bucket reduce's cold
    path and the driver's hot stitch) — bucketed BY FINGERPRINT for the
    chained exchange."""
    return pa.table(
        {
            "__side": pa.array(sides),
            "n": pa.array(ns),
            "fp1": pa.array(f1),
            "fp2": pa.array(f2),
            "key": keys,
            "__bucket": pa.array(_fp_bucket(f1, f2, num_buckets)),
        }
    )


def _band_table(
    sides: np.ndarray,
    band_ids: np.ndarray,
    bkeys: np.ndarray,
    keys: pa.Array,
    num_buckets: int,
) -> pa.Table:
    """Near-mode (band, band_key) rows — bucketed by band identity."""
    return pa.table(
        {
            "__side": pa.array(sides),
            "band": pa.array(band_ids),
            "bkey": pa.array(bkeys),
            "key": keys,
            "__bucket": pa.array(_band_bucket(bkeys, band_ids, num_buckets)),
        }
    )


@functools.lru_cache(maxsize=8)
def _minhash_lanes(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(_MINHASH_SEED)
    a = rng.integers(1, 1 << 64, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 64, size=num_perm, dtype=np.uint64)
    return a, b


def _minhash_mins(
    h: np.ndarray, starts: np.ndarray, num_perm: int
) -> np.ndarray:
    """Per-segment MinHash signature: for each segment (one conversation
    shard, rows already grouped), the minimum of ``h·a_j + b_j`` (mod
    2^64) per lane j — a min over the turn-hash SET, so duplicate turns
    and turn order are irrelevant, and shard partials merge exactly by
    elementwise min. Returns (n_segments, num_perm) uint64."""
    a, b = _minhash_lanes(num_perm)
    out = np.empty((len(starts), num_perm), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(num_perm):
            out[:, j] = np.minimum.reduceat(h * a[j] + b[j], starts)
    return out


def _band_bucket(
    bkeys: np.ndarray, band_ids: np.ndarray, num_buckets: int
) -> np.ndarray:
    """Chained-exchange bucket for (band, band_key) rows — identical
    pairs co-locate regardless of the conversation bucket they came
    from."""
    with np.errstate(over="ignore"):
        mixed = combine_hashes_u64(
            [bkeys, band_ids.astype(np.uint64)]
        ) % np.uint64(num_buckets)
    return mixed.astype(np.int32)


def _band_keys(mins: np.ndarray, bands: int) -> np.ndarray:
    """(n_segments, bands) LSH band keys: order-sensitive mix of each
    band's ``num_perm // bands`` lane minima."""
    n, num_perm = mins.shape
    rows = num_perm // bands
    out = np.empty((n, bands), dtype=np.uint64)
    for b in range(bands):
        out[:, b] = combine_hashes_u64(
            [np.ascontiguousarray(mins[:, b * rows + i]) for i in range(rows)]
        )
    return out


def _load_convfp(path: str) -> pa.Table:
    """Remote loader for a completed bucket's checkpointed fingerprints
    — runs as a Ray task so resumed fingerprints go straight into the
    object store without transiting the driver."""
    import pyarrow.parquet as pq

    return pq.read_table(path)


class _BandFlagger:
    """Hop-1 reduce of the near-dup chain: within one band bucket, a
    conversation is FLAGGED when any of its (side, band, band_key)
    groups holds another conversation. Emits one row per flagged
    conversation per bucket — deduped within the bucket, partner = the
    lexicographically smallest OTHER key in a shared group — re-bucketed
    by key hash for the hop-2 cross-bucket dedup."""

    def __init__(self, num_buckets: int):
        self.num_buckets = num_buckets

    def __call__(self, table: pa.Table, bucket_idx: int):
        if table.num_rows == 0:
            return None
        df = table.select(["__side", "band", "bkey", "key"]).to_pandas()
        df = df.sort_values(["__side", "band", "bkey", "key"], kind="stable")
        sv = df["__side"].to_numpy()
        bv = df["band"].to_numpy()
        kv = df["bkey"].to_numpy()
        first = np.ones(len(df), dtype=bool)
        first[1:] = (
            (sv[1:] != sv[:-1]) | (bv[1:] != bv[:-1]) | (kv[1:] != kv[:-1])
        )
        gid = np.cumsum(first) - 1
        sizes = np.bincount(gid)
        in_dup = sizes[gid] > 1
        if not in_dup.any():
            return None
        dd = df[in_dup]
        gkeys = dd["key"].to_numpy()
        gfirst = first[in_dup]
        # partner: group's min key, except the min itself partners with
        # the group's SECOND member (a conversation can't partner itself)
        dgid = np.cumsum(gfirst) - 1
        min_key = pd.Series(gkeys).groupby(dgid).transform("min").to_numpy()
        second = np.roll(gkeys, -1)  # within sorted groups: member after min
        partner = np.where(gkeys == min_key, second, min_key)
        out = pd.DataFrame(
            {"__side": dd["__side"].to_numpy(), "key": gkeys, "partner": partner}
        )
        # dedup flags within this bucket (a conversation may collide in
        # several bands of the same bucket): keep the smallest partner
        out = (
            out.sort_values(["__side", "key", "partner"], kind="stable")
            .drop_duplicates(["__side", "key"])
        )
        from ..sketches import hash_arrow_column_u64

        kh = hash_arrow_column_u64(pa.array(out["key"].tolist(), type=pa.string()))
        return pa.table(
            {
                "__side": pa.array(out["__side"].to_numpy().astype(np.int8)),
                "key": pa.array(out["key"].tolist(), type=pa.string()),
                "partner": pa.array(out["partner"].tolist(), type=pa.string()),
                "__bucket": pa.array(
                    (kh % np.uint64(self.num_buckets)).astype(np.int32)
                ),
            }
        )


class _FlagDeduper:
    """Hop-2 reduce of the near-dup chain: conversations arrive bucketed
    by key hash, so each flagged conversation's rows (one per bucket
    that flagged it) co-locate here — count it ONCE per side and emit
    one capped violation row with its smallest partner."""

    def __init__(self, group_column: str, cap: int):
        self.group_column = group_column
        self.cap = cap

    def __call__(self, table: pa.Table, bucket_idx: int):
        if table.num_rows == 0:
            return None
        df = (
            table.select(["__side", "key", "partner"])
            .to_pandas()
            .sort_values(["__side", "key", "partner"], kind="stable")
            .drop_duplicates(["__side", "key"])
        )
        stats = {
            int(side): int(n)
            for side, n in df.groupby("__side", sort=True).size().items()
        }
        head = df.head(self.cap)
        violations = [
            {
                "check_alias": f"conv_dedup_validation_{self.group_column}",
                "key": json.dumps({self.group_column: str(key)}),
                "side": SIDE_NAMES[int(side)],
                "detail": json.dumps(
                    {
                        "reason": "near_duplicate_candidate",
                        "similar_to": str(partner),
                    }
                ),
            }
            for side, key, partner in zip(
                head["__side"], head["key"], head["partner"]
            )
        ]
        return {"stats": stats, "violations": violations}


class _DupCounter:
    """Reduce of the chained fingerprint exchange: within one
    fingerprint bucket, count duplicate conversations PER SIDE (two
    conversations are duplicates when (turn count, fp1, fp2) match) and
    emit capped, deterministic violation rows — keeper is the group's
    lexicographically smallest conversation key, every other member is
    one violation row billed against it.

    Also counts RE-KEYED conversations per side: a key whose content
    fingerprint exists on the other side but never under that key there
    — the migration signal the PK join cannot see (it only compares
    same-key rows; a conversation re-ingested under a fresh id reads as
    one missing + one unmatched, not as the same content moving keys).
    Content co-located by fingerprint makes the census exact and
    bucket-local."""

    def __init__(self, group_column: str, cap: int):
        self.group_column = group_column
        self.cap = cap

    @staticmethod
    def _rekeyed(df: pd.DataFrame) -> dict[int, int]:
        """Per side: #keys whose (n, fp) group exists on the other side
        but never contains this key there. Fully vectorized: per
        (group, key) side-presence flags, then per-group any-side
        flags broadcast back."""
        kg = (
            df.assign(
                is_src=(df["__side"] == SIDE_SOURCE),
                is_tgt=(df["__side"] == SIDE_TARGET),
            )
            .groupby(["n", "fp1", "fp2", "key"], sort=False)[
                ["is_src", "is_tgt"]
            ]
            .any()
            .reset_index()
        )
        grp = kg.groupby(["n", "fp1", "fp2"], sort=False)
        any_src = grp["is_src"].transform("any")
        any_tgt = grp["is_tgt"].transform("any")
        return {
            SIDE_SOURCE: int((kg["is_src"] & ~kg["is_tgt"] & any_tgt).sum()),
            SIDE_TARGET: int((kg["is_tgt"] & ~kg["is_src"] & any_src).sum()),
        }

    def __call__(self, table: pa.Table, bucket_idx: int):
        if table.num_rows == 0:
            return None
        df = table.select(["__side", "n", "fp1", "fp2", "key"]).to_pandas()
        stats: dict[int, tuple[int, int]] = {}
        rekeyed = self._rekeyed(df)
        violations: list[dict] = []
        for side, sub in df.groupby("__side", sort=True):
            sizes = sub.groupby(["n", "fp1", "fp2"], sort=False).size()
            distinct = int(len(sizes))
            dups = int(len(sub) - distinct)
            stats[int(side)] = (distinct, dups)
            if not dups:
                continue
            dd = sub[
                sub.duplicated(subset=["n", "fp1", "fp2"], keep=False)
            ].sort_values(["n", "fp1", "fp2", "key"], kind="stable")
            # group boundaries via numpy — pandas .shift() on uint64
            # coerces to float64 and silently drops low fingerprint bits
            nv = dd["n"].to_numpy()
            f1v = dd["fp1"].to_numpy()
            f2v = dd["fp2"].to_numpy()
            first = np.ones(len(dd), dtype=bool)
            first[1:] = (
                (nv[1:] != nv[:-1])
                | (f1v[1:] != f1v[:-1])
                | (f2v[1:] != f2v[:-1])
            )
            keeper = dd["key"].where(first).ffill()
            group_size = dd.groupby(["n", "fp1", "fp2"], sort=False)[
                "key"
            ].transform("size")
            emit = dd[~first].head(self.cap)
            for key, keep, size in zip(
                emit["key"], keeper[~first].head(self.cap), group_size[~first]
            ):
                violations.append(
                    {
                        "check_alias": (
                            f"conv_dedup_validation_{self.group_column}"
                        ),
                        "key": json.dumps({self.group_column: str(key)}),
                        "side": SIDE_NAMES[int(side)],
                        "detail": json.dumps(
                            {
                                "reason": "duplicate_conversation",
                                "duplicate_of": str(keep),
                                "group_size": int(size),
                            }
                        ),
                    }
                )
        return {"stats": stats, "violations": violations, "rekeyed": rekeyed}


class _Projector:
    """Stateless pre-shuffle projection: key cols + hashes + bucket id."""

    def __init__(self, spec: KeyedSpec, side: int, all_columns: list[str],
                 skip_buckets: frozenset[int] = frozenset()):
        self.spec = spec
        self.side = side
        self.skip_buckets = skip_buckets
        if spec.row_hash:
            self.hash_cols = spec.hash_columns or [
                c for c in all_columns if not c.startswith("__")
            ]
        else:
            self.hash_cols = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        spec = self.spec
        n = batch.num_rows
        # hash each referenced column ONCE, straight off the Arrow buffers
        # (no to_pandas: Python-object creation for text columns was the
        # dominant projection cost and degraded badly under concurrency)
        col_cache: dict[str, np.ndarray] = {}

        def col_hash(c: str) -> np.ndarray:
            if c not in col_cache:
                col_cache[c] = hash_arrow_column_u64(batch.column(c))
            return col_cache[c]

        # output stays Arrow end-to-end: key columns are taken zero-copy
        # from the input batch, everything else is fixed-width numpy
        cols: dict[str, object] = {c: batch.column(c) for c in spec.key_columns}
        kh = combine_hashes_u64([col_hash(c) for c in spec.key_columns])
        cols["__kh"] = pa.array(kh)
        if self.hash_cols:
            cols["__rh"] = pa.array(
                combine_hashes_u64([col_hash(c) for c in self.hash_cols])
            )
        for c in spec.compare_columns:
            cols[f"__cmp_{c}"] = pa.array(col_hash(c))
        for c in spec.null_join_columns:
            cols[f"__nl_{c}"] = pc.is_null(batch.column(c)).cast(pa.int8())
        if spec.group_checks and spec.ts_column:
            ts = batch.column(spec.ts_column)
            cols["__ts"] = (
                ts.cast(pa.int64())
                if pa.types.is_timestamp(ts.type)
                else ts.cast(pa.float64())
            )
        if spec.conv_dedup_columns:
            # one content hash per turn (8 B through the exchange);
            # per-column hashes come from the shared cache so text is
            # hashed once even when it also feeds the row hash —
            # unless normalization is on, which hashes a lowercased /
            # whitespace-collapsed copy of string columns instead
            def cd_hash(c: str) -> np.ndarray:
                if not spec.conv_dedup_normalize:
                    return col_hash(c)
                col = batch.column(c)
                if pa.types.is_string(col.type) or pa.types.is_large_string(
                    col.type
                ):
                    col = pc.utf8_trim_whitespace(
                        pc.replace_substring_regex(
                            pc.utf8_lower(col), r"\s+", " "
                        )
                    )
                    return hash_arrow_column_u64(col)
                return col_hash(c)

            cols["__cd"] = pa.array(
                combine_hashes_u64(
                    [cd_hash(c) for c in spec.conv_dedup_columns]
                )
            )
        if spec.grammar_checks:
            # vocabulary code per row (1 byte through the exchange);
            # NULL / out-of-vocabulary roles -> -1
            codes = pc.index_in(
                pc.cast(batch.column(spec.grammar_role_column), pa.string()),
                value_set=pa.array(spec.grammar_roles, type=pa.string()),
            )
            cols["__role"] = pc.fill_null(codes, -1).cast(pa.int8())
            if spec.grammar_tool_column:
                cols["__tooln"] = pc.is_null(
                    batch.column(spec.grammar_tool_column)
                ).cast(pa.int8())
        cols["__side"] = pa.array(np.full(n, self.side, dtype=np.int8))
        if spec.group_column and spec.group_column in spec.key_columns and (
            spec.group_checks or spec.hot_keys
        ):
            gh = col_hash(spec.group_column)
            cols["__gh"] = pa.array(gh)
            shard = np.zeros(n, dtype=np.int64)
            if spec.hot_keys and spec.index_column:
                hot_mask = np.isin(gh, spec.hot_hash_array())
                if hot_mask.any():
                    idx_vals = batch.column(spec.index_column).to_numpy(
                        zero_copy_only=False
                    )
                    shard[hot_mask] = idx_vals[hot_mask] // spec.hot_shard_span
            cols["__shard"] = pa.array(shard)
            bucket_h = combine_hashes_u64([gh, shard.astype(np.uint64)])
        else:
            cols["__shard"] = pa.array(np.zeros(n, dtype=np.int64))
            bucket_h = kh
        bucket = (bucket_h % np.uint64(spec.num_buckets)).astype(np.int32)
        cols["__bucket"] = pa.array(bucket)
        out = pa.table(cols)
        if self.skip_buckets:
            mask = ~np.isin(bucket, list(self.skip_buckets))
            out = out.filter(pa.array(mask))
        return out


class _BucketChecker:
    """Per-bucket verification; runs once per bucket in the reduce task.

    Input is the bucket's Arrow table. Only fixed-width helper columns
    (hashes, flags, the numeric index) are converted to pandas — the
    string key columns stay in Arrow and are fetched by row position
    only for the capped violation rows, so no Python-object churn."""

    def __init__(self, spec: KeyedSpec, task_key: str):
        self.spec = spec
        self.task_key = task_key
        # allowed-transition lookup, shifted by +1 so code -1 (unknown)
        # indexes row/col 0 (all-False: any pair touching an unknown role
        # is a bad transition when the transition grammar is closed)
        self.trans_ok: np.ndarray | None = None
        if spec.grammar_transitions is not None:
            r = len(spec.grammar_roles)
            m = np.zeros((r + 1, r + 1), dtype=bool)
            idx = {role: i for i, role in enumerate(spec.grammar_roles)}
            for a, b in spec.grammar_transitions:
                m[idx[a] + 1, idx[b] + 1] = True
            self.trans_ok = m
        self.first_code = (
            spec.grammar_roles.index(spec.grammar_first_role)
            if spec.grammar_first_role
            else None
        )
        self.tool_codes = np.array(
            [spec.grammar_roles.index(r) for r in spec.grammar_tool_roles],
            dtype=np.int8,
        )

    def __call__(self, table: pa.Table) -> pd.DataFrame:
        spec = self.spec
        if table.num_rows == 0:
            return pd.DataFrame({"bucket": pd.Series([], dtype="int32"), "blob": []})
        numeric = [c for c in table.column_names if c.startswith("__")]
        if spec.group_checks and spec.index_column in table.column_names:
            numeric = list(dict.fromkeys(numeric + [spec.index_column]))
        df = table.select(numeric).to_pandas()
        df["__pos"] = np.arange(len(df))
        bucket = int(df["__bucket"].iloc[0])
        m = KeyedMetrics()
        violations: list[dict] = []
        cap = spec.max_violations_per_bucket
        src = df[df["__side"] == SIDE_SOURCE]
        tgt = df[df["__side"] == SIDE_TARGET]

        def emit_keys(alias: str, side: str, positions, details) -> None:
            """Fetch key values for the given row positions from Arrow,
            emit violations in deterministic (key-sorted) order."""
            positions = list(positions)
            sub = table.select(spec.key_columns).take(pa.array(positions))
            cols = {c: sub.column(c).to_pylist() for c in spec.key_columns}
            rows = [
                (
                    tuple(str(cols[c][i]) for c in spec.key_columns),
                    details[i] if isinstance(details, list) else details,
                )
                for i in range(len(positions))
            ]
            rows.sort(key=lambda r: r[0])
            for key_tuple, detail in rows[:cap]:
                violations.append(
                    {
                        "check_alias": alias,
                        "key": json.dumps(dict(zip(spec.key_columns, key_tuple))),
                        "side": side,
                        "detail": json.dumps(detail),
                    }
                )

        if spec.uniqueness:
            self._uniqueness(m, src, tgt, cap, emit_keys)

        join_needed = spec.row_hash or spec.compare_columns or spec.null_join_columns
        if join_needed and len(src) and len(tgt):
            self._join_checks(m, src, tgt, cap, emit_keys)
        elif join_needed:
            for c in spec.null_join_columns:
                m.null_join.setdefault(c, [0, 0])

        fp_tables: list[pa.Table] = []
        if spec.group_checks:
            self._group_checks(m, violations, src, tgt, cap, table, fp_tables)

        m.violations = len(violations)
        convfp = None
        if spec.conv_dedup_columns:
            convfp = (
                pa.concat_tables(fp_tables)
                if fp_tables
                else _empty_fp_table(spec.conv_dedup_mode)
            )
        if spec.checkpoint_dir:
            self._checkpoint(
                bucket,
                m,
                violations,
                convfp,
                table if spec.persist_input else None,
            )
        return {"bucket": bucket, "blob": pickle.dumps(m), "convfp": convfp}

    # ---- check groups ----

    def _uniqueness(self, m, src, tgt, cap, emit_keys) -> None:
        key_cols = self.spec.key_columns
        for side_idx, frame in ((0, src), (1, tgt)):
            if len(frame) == 0:
                continue
            sizes = frame["__kh"].value_counts(sort=False)
            m.uniq_count[side_idx] += int(sizes.sum())
            m.uniq_distinct[side_idx] += int(len(sizes))
            dup_kh = sizes[sizes > 1]
            if len(dup_kh):
                reps = frame[frame["__kh"].isin(dup_kh.index)].drop_duplicates(
                    "__kh"
                )
                if len(reps) > 4 * cap:  # deterministic pre-cap by hash order
                    reps = reps.sort_values("__kh").head(4 * cap)
                occ = dup_kh.loc[reps["__kh"].to_numpy()].to_numpy()
                emit_keys(
                    "uniqueness_validation_" + "_".join(key_cols),
                    SIDE_NAMES[side_idx],
                    reps["__pos"].to_numpy(),
                    [{"occurrences": int(o)} for o in occ],
                )

    def _join_checks(self, m, src, tgt, cap, emit_keys) -> None:
        spec = self.spec
        helper = [
            c for c in src.columns if c.startswith(("__rh", "__cmp_", "__nl_"))
        ]
        joined = src[["__kh", "__pos"] + helper].merge(
            tgt[["__kh"] + helper], on="__kh", how="inner", suffixes=("_s", "_t")
        )
        m.total_compared_rows += len(joined)

        def emit(bad: np.ndarray, alias: str, detail: dict) -> None:
            pos = joined.loc[bad, "__pos"].to_numpy()
            if len(pos) > 4 * cap:
                pos = np.sort(pos)[: 4 * cap]
            emit_keys(alias, "both", pos, detail)

        if spec.row_hash:
            bad = joined["__rh_s"].to_numpy() != joined["__rh_t"].to_numpy()
            nbad = int(bad.sum())
            m.mismatch_count += nbad
            if nbad:
                emit(bad, "row_hash_validation", {"reason": "row_hash_mismatch"})
        for c in spec.compare_columns:
            bad = (
                joined[f"__cmp_{c}_s"].to_numpy() != joined[f"__cmp_{c}_t"].to_numpy()
            )
            nbad = int(bad.sum())
            m.compare_mismatches[c] = m.compare_mismatches.get(c, 0) + nbad
            if nbad:
                emit(bad, "compare_validation_" + c, {"column": c})
        for c in spec.null_join_columns:
            cur = m.null_join.setdefault(c, [0, 0])
            cur[0] += int(joined[f"__nl_{c}_s"].sum())
            cur[1] += int(joined[f"__nl_{c}_t"].sum())

    def _group_checks(
        self, m, violations, src, tgt, cap, table, fp_tables=None
    ) -> None:
        """Ordering / contiguity / turn-count over (group-hash, index[, ts]).

        Vectorized pandas groupby on the numeric group hash; hot
        conversations return shard partials stitched by the driver
        (contiguous index ranges ⇒ exact merge). Group display names for
        violations are fetched from Arrow by row position."""
        spec = self.spec
        g_col, i_col = spec.group_column, spec.index_column
        hot_hashes = None
        if spec.hot_keys:
            hot_hashes = set(spec.hot_hash_array().tolist())
        for side in (0, 1):
            part = (src, tgt)[side]
            if len(part) == 0:
                continue
            has_ts = "__ts" in part.columns
            has_gram = spec.grammar_checks and "__role" in part.columns
            has_cd = bool(spec.conv_dedup_columns) and "__cd" in part.columns
            cols = ["__gh", i_col, "__shard", "__pos"] + (["__ts"] if has_ts else [])
            if has_gram:
                cols.append("__role")
                if "__tooln" in part.columns:
                    cols.append("__tooln")
            if has_cd:
                cols.append("__cd")
            # conv-dedup tie-break: duplicate index values (corrupt data;
            # contiguity flags them separately) would otherwise leave the
            # fingerprint dependent on arrival order. Sorting ties by the
            # content hash canonicalizes them — two conversations compare
            # equal iff every tie-group is multiset-equal, the same
            # relation as a value-ordered canonicalization (an oracle's
            # ORDER BY index, value), since equal hashes ⇒ equal fp
            # contributions
            sort_cols = ["__gh", "__shard", i_col] + (["__cd"] if has_cd else [])
            part = part[cols].sort_values(sort_cols, kind="stable")
            gb = part.groupby(["__gh", "__shard"], sort=False)
            agg_kw = {
                "n": (i_col, "size"),
                "imin": (i_col, "min"),
                "imax": (i_col, "max"),
                "inuniq": (i_col, "nunique"),
                "pos": ("__pos", "first"),
            }
            if has_ts:
                agg_kw.update({"tfirst": ("__ts", "first"), "tlast": ("__ts", "last")})
            if has_gram:
                agg_kw.update(
                    {"rfirst": ("__role", "first"), "rlast": ("__role", "last")}
                )
            summary = gb.agg(**agg_kw)
            mins = None
            if has_cd:
                # per-(group, shard) fingerprints — rows are already in
                # turn order after the stable sort above, and
                # groupby(sort=False) preserves first-appearance order,
                # so segment k of the fingerprint arrays IS summary row k
                gh_v = part["__gh"].to_numpy()
                sh_v = part["__shard"].to_numpy()
                seg_start = np.ones(len(part), dtype=bool)
                seg_start[1:] = (gh_v[1:] != gh_v[:-1]) | (sh_v[1:] != sh_v[:-1])
                starts = np.flatnonzero(seg_start)
                cdv = part["__cd"].to_numpy().astype(np.uint64, copy=False)
                if spec.conv_dedup_mode == "near":
                    mins = _minhash_mins(cdv, starts, spec.conv_dedup_num_perm)
                else:
                    fp1, fp2 = _poly_fps(cdv, starts)
                    summary["fp1"] = fp1
                    summary["fp2"] = fp2
            if has_ts:
                tv = part["__ts"].to_numpy()
                new_grp = (
                    (part["__gh"] != part["__gh"].shift()).to_numpy()
                    | (part["__shard"] != part["__shard"].shift()).to_numpy()
                )
                bad_step = np.zeros(len(part), dtype=bool)
                if len(part) > 1:
                    bad_step[1:] = tv[1:] < tv[:-1]
                bad_step &= ~new_grp
                summary["ts_sorted"] = ~(
                    pd.Series(bad_step, index=part.index)
                    .groupby([part["__gh"], part["__shard"]], sort=False)
                    .any()
                )
                if spec.ts_gap_digest and len(part) > 1:
                    # consecutive-turn gaps within each (group, shard) —
                    # hot shards contribute their INTERIOR gaps here;
                    # cross-shard boundary gaps are added by _stitch_hot
                    gmask = ~new_grp[1:]
                    if gmask.any():
                        gaps = (
                            (tv[1:] - tv[:-1])[gmask].astype(np.float64)
                            / 1e6
                        )
                        d = m.gap_digests[side] or TDigest()
                        d.add(gaps)
                        m.gap_digests[side] = d
            else:
                summary["ts_sorted"] = True
            if has_gram:
                codes = part["__role"].to_numpy()
                gb_keys = [part["__gh"], part["__shard"]]
                if spec.grammar_enforce_vocab:
                    summary["g_unknown"] = (
                        pd.Series(codes == -1, index=part.index)
                        .groupby(gb_keys, sort=False)
                        .sum()
                    )
                if spec.grammar_tool_column and "__tooln" in part.columns:
                    # mismatch: tool must be non-null exactly on tool-role rows
                    is_tool_role = np.isin(codes, self.tool_codes)
                    tool_null = part["__tooln"].to_numpy() == 1
                    summary["g_toolbad"] = (
                        pd.Series(is_tool_role == tool_null, index=part.index)
                        .groupby(gb_keys, sort=False)
                        .sum()
                    )
                if self.trans_ok is not None:
                    grp_start = (
                        (part["__gh"] != part["__gh"].shift()).to_numpy()
                        | (part["__shard"] != part["__shard"].shift()).to_numpy()
                    )
                    bad_tr = np.zeros(len(part), dtype=bool)
                    if len(part) > 1:
                        bad_tr[1:] = ~self.trans_ok[codes[:-1] + 1, codes[1:] + 1]
                    bad_tr &= ~grp_start
                    summary["g_badtrans"] = (
                        pd.Series(bad_tr, index=part.index)
                        .groupby(gb_keys, sort=False)
                        .any()
                    )
            summary = summary.reset_index()
            is_hot = (
                summary["__gh"].isin(hot_hashes)
                if hot_hashes
                else pd.Series(False, index=summary.index)
            )
            hot_cols = [
                "__gh", "__shard", "n", "imin", "imax", "inuniq",
                "ts_sorted", "pos",
            ]
            if has_ts:
                hot_cols += ["tfirst", "tlast"]
            gram_cols = [
                c
                for c in ("rfirst", "rlast", "g_unknown", "g_toolbad", "g_badtrans")
                if c in summary.columns
            ]
            if has_cd and spec.conv_dedup_mode == "exact":
                gram_cols = gram_cols + ["fp1", "fp2"]
            hot_pos = (
                np.flatnonzero(is_hot.to_numpy()) if mins is not None else None
            )
            for hi, rec in enumerate(
                summary.loc[is_hot, hot_cols + gram_cols].to_dict("records")
            ):
                shard_rec = {
                    "shard": int(rec["__shard"]),
                    "n": int(rec["n"]),
                    "imin": int(rec["imin"]),
                    "imax": int(rec["imax"]),
                    "nuniq": int(rec["inuniq"]),
                    "tfirst": int(rec["tfirst"]) if has_ts else None,
                    "tlast": int(rec["tlast"]) if has_ts else None,
                    "ts_sorted": bool(rec["ts_sorted"]),
                    # the group's DISPLAY key, so driver-stitched verdicts
                    # and dedup fingerprints cite the real id even when
                    # hot keys were detected as raw hashes (footer path)
                    "gkey": str(
                        table.select([g_col])
                        .take(pa.array([int(rec["pos"])]))
                        .column(0)[0]
                        .as_py()
                    ),
                }
                for c in gram_cols:
                    v = rec[c]
                    shard_rec[c] = bool(v) if c == "g_badtrans" else int(v)
                if mins is not None:
                    # the shard's lane minima — stitched by elementwise
                    # min on the driver
                    shard_rec["mins"] = mins[hot_pos[hi]].tolist()
                m.hot_partials.setdefault((side, int(rec["__gh"])), []).append(
                    shard_rec
                )
            cold = summary[~is_hot]
            if (
                has_cd
                and side in spec.conv_dedup_sides
                and len(cold)
                and fp_tables is not None
            ):
                pos = cold["pos"].to_numpy()
                keys = (
                    table.select([g_col])
                    .take(pa.array(pos))
                    .column(0)
                    .cast(pa.string())
                )
                if isinstance(keys, pa.ChunkedArray):
                    keys = keys.combine_chunks()
                if spec.conv_dedup_mode == "near":
                    nb = spec.conv_dedup_bands
                    nc = len(cold)
                    # summary was reset_index'd, so cold's index IS the
                    # positional index into the per-segment mins rows
                    bk = _band_keys(mins[cold.index.to_numpy()], nb).reshape(-1)
                    fp_tables.append(
                        _band_table(
                            np.full(nc * nb, side, dtype=np.int8),
                            np.tile(np.arange(nb, dtype=np.int8), nc),
                            bk,
                            keys.take(
                                pa.array(np.repeat(np.arange(nc, dtype=np.int64), nb))
                            ),
                            spec.num_buckets,
                        )
                    )
                else:
                    fp_tables.append(
                        _fp_table(
                            np.full(len(cold), side, dtype=np.int8),
                            cold["n"].to_numpy().astype(np.int64),
                            cold["fp1"].to_numpy().astype(np.uint64, copy=False),
                            cold["fp2"].to_numpy().astype(np.uint64, copy=False),
                            keys,
                            spec.num_buckets,
                        )
                    )
            if len(cold):
                m.groups_checked[side] += len(cold)
                contiguous = (
                    (cold["imin"] == 0)
                    & (cold["imax"] == cold["n"] - 1)
                    & (cold["inuniq"] == cold["n"])
                )
                mono = cold["ts_sorted"].astype(bool)

                def emit_groups(frame, reason, alias=None):
                    pos = frame["pos"].to_numpy()
                    if len(pos) > cap:
                        pos = np.sort(pos)[:cap]
                    names = (
                        table.select([g_col]).take(pa.array(pos)).column(0).to_pylist()
                    )
                    for name in sorted(str(v) for v in names):
                        violations.append(
                            {
                                "check_alias": alias
                                or f"ordering_validation_{g_col}",
                                "key": json.dumps({g_col: name}),
                                "side": SIDE_NAMES[side],
                                "detail": json.dumps({"reason": reason}),
                            }
                        )

                if spec.require_contiguous and side in spec.ordering_sides:
                    bad_c = cold[~contiguous]
                    m.contiguity_violations[side] += len(bad_c)
                    if len(bad_c):
                        emit_groups(bad_c, "non_contiguous_turn_idx")
                if (
                    spec.require_monotonic_ts
                    and has_ts
                    and side in spec.ordering_sides
                ):
                    # same rule as the hot path (_stitch_hot): a group
                    # counts one violation — contiguity first when that
                    # check is enforced, else monotonicity on its own
                    if spec.require_contiguous:
                        bad_m = cold[contiguous & ~mono]
                    else:
                        bad_m = cold[~mono]
                    m.monotonicity_violations[side] += len(bad_m)
                    if len(bad_m):
                        emit_groups(bad_m, "non_monotonic_ts")
                if spec.turn_count_digest:
                    d = m.digests[side] or TDigest()
                    d.add(cold["n"].to_numpy(dtype=np.float64))
                    m.digests[side] = d
                if has_gram:
                    galias = f"sequence_grammar_validation_{g_col}"
                    flagged = np.zeros(len(cold), dtype=bool)
                    if spec.grammar_enforce_vocab:
                        unk = cold["g_unknown"].to_numpy()
                        m.grammar_unknown_rows[side] += int(unk.sum())
                        bad = unk > 0
                        flagged |= bad
                        if bad.any():
                            emit_groups(cold[bad], "unknown_role", galias)
                    if "g_toolbad" in cold.columns:
                        tb = cold["g_toolbad"].to_numpy()
                        m.grammar_tool_mismatch_rows[side] += int(tb.sum())
                        bad = tb > 0
                        flagged |= bad
                        if bad.any():
                            emit_groups(cold[bad], "tool_pairing", galias)
                    if self.trans_ok is not None:
                        bad = cold["g_badtrans"].to_numpy().astype(bool)
                        m.grammar_bad_transition_groups[side] += int(bad.sum())
                        flagged |= bad
                        if bad.any():
                            emit_groups(cold[bad], "bad_transition", galias)
                    if self.first_code is not None:
                        bad = cold["rfirst"].to_numpy() != self.first_code
                        m.grammar_bad_first_groups[side] += int(bad.sum())
                        flagged |= bad
                        if bad.any():
                            emit_groups(cold[bad], "bad_first_role", galias)
                    m.grammar_groups_flagged[side] += int(flagged.sum())

    def _checkpoint(
        self,
        bucket: int,
        m: KeyedMetrics,
        violations: list,
        convfp=None,
        input_table: pa.Table | None = None,
    ) -> None:
        import pyarrow.parquet as pq

        bdir = os.path.join(self.spec.checkpoint_dir, f"bucket={bucket}")
        os.makedirs(bdir, exist_ok=True)
        if input_table is not None:
            # the bucket's full projected input (prior ∪ new), so the
            # NEXT append-only run can union against it without
            # re-scanning this run's files
            fd, tmp = tempfile.mkstemp(dir=bdir, suffix=".parquet")
            os.close(fd)
            pq.write_table(input_table, tmp)
            os.replace(tmp, os.path.join(bdir, "input.parquet"))
        vdf = pd.DataFrame(violations, columns=["check_alias", "key", "side", "detail"])
        vdf.insert(0, "task_key", self.task_key)
        fd, tmp = tempfile.mkstemp(dir=bdir, suffix=".parquet")
        os.close(fd)
        pq.write_table(pa.Table.from_pandas(vdf, preserve_index=False), tmp)
        os.replace(tmp, os.path.join(bdir, "violations.parquet"))
        if convfp is not None:
            # the bucket's conversation fingerprints, so a resumed run
            # can feed the chained dedup exchange without recomputing
            # this bucket (the spec-signature guard wipes pre-conv-dedup
            # checkpoints, so absence always means "not configured")
            fd, tmp = tempfile.mkstemp(dir=bdir, suffix=".parquet")
            os.close(fd)
            pq.write_table(convfp, tmp)
            os.replace(tmp, os.path.join(bdir, "convfp.parquet"))
        _atomic_write(os.path.join(bdir, "metrics.pkl"), pickle.dumps(m))
        _atomic_write(os.path.join(bdir, "_SUCCESS"), b"")


def _stitch_hot(
    metrics: KeyedMetrics, spec: KeyedSpec
) -> tuple[list[dict], list[dict]]:
    """Fold hot-conversation shard partials into whole-conversation
    verdicts. Shards hold disjoint contiguous index ranges, so the merge
    (counts, min/max, uniqueness, boundary ts comparisons) is exact.

    Returns ``(violation rows, hot fingerprint rows)``: violations have
    the same shape as the cold path's so flagged hot conversations
    appear in the violations table, not just in the counts; fingerprint
    rows (conv-dedup only) carry each hot conversation's whole-sequence
    fingerprint, stitched exactly from per-shard polynomial partials
    (fp = Σ_s fp_s · R^offset_s). Hot partials are keyed by group hash;
    map back to the configured key string when one exists, else report
    the hash."""
    from ..sketches import hash_arrow_column_u64

    g_col = spec.group_column or "group"
    label_of: dict[int, str] = {}
    str_keys = [str(k) for k in spec.hot_keys if not isinstance(k, (int, np.integer))]
    if str_keys:
        hashes = hash_arrow_column_u64(pa.array(str_keys))
        label_of = {int(h): k for h, k in zip(hashes.tolist(), str_keys)}
    violations: list[dict] = []
    fp_rows: list[dict] = []

    def emit(side: int, label: str, reason: str, alias: str | None = None) -> None:
        violations.append(
            {
                "check_alias": alias or f"ordering_validation_{g_col}",
                "key": json.dumps({g_col: label}),
                "side": SIDE_NAMES[side],
                "detail": json.dumps({"reason": reason, "hot": True}),
            }
        )

    # grammar lookup tables (mirror _BucketChecker.__init__)
    trans_ok = None
    if spec.grammar_transitions is not None:
        r = len(spec.grammar_roles)
        trans_ok = np.zeros((r + 1, r + 1), dtype=bool)
        ridx = {role: i for i, role in enumerate(spec.grammar_roles)}
        for a, b in spec.grammar_transitions:
            trans_ok[ridx[a] + 1, ridx[b] + 1] = True
    first_code = (
        spec.grammar_roles.index(spec.grammar_first_role)
        if spec.grammar_first_role
        else None
    )

    for (side, g), shards in sorted(
        metrics.hot_partials.items(), key=lambda kv: (kv[0][0], str(kv[0][1]))
    ):
        shards = sorted(shards, key=lambda s: s["shard"])
        # display label: the real key captured in the bucket reduce
        # (gkey); pre-gkey checkpoints fall back to the string-key map
        # or, last resort, the hash
        glabel = next(
            (s["gkey"] for s in shards if s.get("gkey") is not None),
            label_of.get(int(g), str(int(g))),
        )
        metrics.groups_checked[side] += 1
        n = sum(s["n"] for s in shards)
        imin = min(s["imin"] for s in shards)
        imax = max(s["imax"] for s in shards)
        nuniq = sum(s["nuniq"] for s in shards)
        contiguous = imin == 0 and imax == n - 1 and nuniq == n
        mono = all(s["ts_sorted"] for s in shards)
        if mono and shards[0]["tlast"] is not None:
            for a, b in zip(shards, shards[1:]):
                if (
                    a["tlast"] is not None
                    and b["tfirst"] is not None
                    and b["tfirst"] < a["tlast"]
                ):
                    mono = False
                    break
        if side in spec.ordering_sides:
            if spec.require_contiguous and not contiguous:
                metrics.contiguity_violations[side] += 1
                emit(side, glabel, "non_contiguous_turn_idx")
            elif spec.require_monotonic_ts and not mono:
                metrics.monotonicity_violations[side] += 1
                emit(side, glabel, "non_monotonic_ts")
        if spec.grammar_checks:
            galias = f"sequence_grammar_validation_{g_col}"
            reasons: list[str] = []
            if spec.grammar_enforce_vocab:
                unk = sum(s.get("g_unknown", 0) for s in shards)
                metrics.grammar_unknown_rows[side] += unk
                if unk:
                    reasons.append("unknown_role")
            if spec.grammar_tool_column:
                tb = sum(s.get("g_toolbad", 0) for s in shards)
                metrics.grammar_tool_mismatch_rows[side] += tb
                if tb:
                    reasons.append("tool_pairing")
            if trans_ok is not None:
                bad_tr = any(s.get("g_badtrans", False) for s in shards)
                if not bad_tr:
                    # boundary pairs: shards hold contiguous index ranges,
                    # so adjacent-in-sequence = (last of a, first of b)
                    for a, b in zip(shards, shards[1:]):
                        if not trans_ok[a["rlast"] + 1, b["rfirst"] + 1]:
                            bad_tr = True
                            break
                if bad_tr:
                    metrics.grammar_bad_transition_groups[side] += 1
                    reasons.append("bad_transition")
            if first_code is not None and shards[0].get("rfirst") != first_code:
                metrics.grammar_bad_first_groups[side] += 1
                reasons.append("bad_first_role")
            if reasons:
                metrics.grammar_groups_flagged[side] += 1
                for reason in reasons:
                    emit(side, glabel, reason, galias)
        if spec.turn_count_digest:
            d = metrics.digests[side] or TDigest()
            d.add(np.array([float(n)]))
            metrics.digests[side] = d
        if spec.ts_gap_digest:
            # cross-shard boundary gaps: shards hold contiguous turn
            # ranges sorted by shard id, so (last of a, first of b) are
            # consecutive turns — interior gaps were already digested in
            # the vectorized pass, so each pair is counted exactly once
            bg = [
                float(b["tfirst"] - a["tlast"])
                for a, b in zip(shards, shards[1:])
                if a.get("tlast") is not None and b.get("tfirst") is not None
            ]
            if bg:
                d = metrics.gap_digests[side] or TDigest()
                d.add(np.asarray(bg, dtype=np.float64) / 1e6)
                metrics.gap_digests[side] = d
        if spec.conv_dedup_columns and side in spec.conv_dedup_sides:
            if spec.conv_dedup_mode == "near" and all(
                "mins" in s for s in shards
            ):
                # MinHash stitch: the whole conversation's lane minima
                # are the elementwise min of its shard minima
                mm = np.minimum.reduce(
                    [np.array(s["mins"], dtype=np.uint64) for s in shards]
                )
                bk = _band_keys(mm[None, :], spec.conv_dedup_bands)[0]
                for bi, k in enumerate(bk):
                    fp_rows.append(
                        {"side": side, "band": bi, "bkey": int(k), "key": glabel}
                    )
            elif spec.conv_dedup_mode == "exact" and all(
                "fp1" in s for s in shards
            ):
                # exact polynomial stitch: shard s's fingerprint covers
                # its contiguous turn range starting at offset_s, so the
                # whole conversation's fingerprint is Σ_s fp_s · R^offset_s
                f1 = f2 = 0
                offset = 0
                for s in shards:
                    f1 = (f1 + _fp_shift(s["fp1"], offset, 0)) & _U64
                    f2 = (f2 + _fp_shift(s["fp2"], offset, 1)) & _U64
                    offset += s["n"]
                fp_rows.append(
                    {
                        "side": side,
                        "n": n,
                        "fp1": f1,
                        "fp2": f2,
                        "key": glabel,
                    }
                )
    metrics.hot_partials = {}
    return violations, fp_rows


def _spec_signature(spec: KeyedSpec) -> str:
    """Stable fingerprint of every check-semantics field. A resumed run
    may only reuse bucket checkpoints produced under the IDENTICAL spec
    — otherwise a check added between runs (e.g. sequence grammar) would
    merge pre-upgrade metrics whose missing counters read as zero and
    silently PASS."""
    import dataclasses
    import hashlib

    d = dataclasses.asdict(spec)
    d.pop("checkpoint_dir", None)
    d.pop("resume", None)
    # execution-locus details, not check semantics: a run that persists
    # inputs (or consumes a prior run's) checks the same things
    d.pop("persist_input", None)
    d.pop("prior_input_dir", None)
    d["hot_keys"] = sorted(
        (str(k), int(v)) for k, v in (spec.hot_keys or {}).items()
    )
    blob = json.dumps(d, sort_keys=True, default=str)
    return hashlib.md5(blob.encode("utf-8")).hexdigest()


def _guard_checkpoint_spec(spec: KeyedSpec) -> None:
    """Wipe the bucket-checkpoint dir when its recorded spec signature is
    missing or different (pre-upgrade checkpoints have no signature —
    recomputing beats a silent wrong PASS); record this run's."""
    if not spec.checkpoint_dir:
        return
    import shutil

    sig = _spec_signature(spec)
    sig_path = os.path.join(spec.checkpoint_dir, "spec.sig")
    if spec.resume and os.path.isdir(spec.checkpoint_dir):
        old = None
        if os.path.exists(sig_path):
            with open(sig_path, encoding="utf-8") as fh:
                old = fh.read()
        if old != sig:
            shutil.rmtree(spec.checkpoint_dir, ignore_errors=True)
    os.makedirs(spec.checkpoint_dir, exist_ok=True)
    _atomic_write(sig_path, sig.encode("utf-8"))


def _load_prior_bucket(prior_dir: str, bucket: int) -> pa.Table | None:
    """Remote loader for a prior run's persisted bucket input (absence
    = the bucket was empty in the prior run). Runs as a Ray task so the
    table lands in the object store next to this run's new shards."""
    import pyarrow.parquet as pq

    path = os.path.join(prior_dir, f"bucket={bucket}", "input.parquet")
    if not os.path.exists(path):
        return None
    return pq.read_table(path)


def completed_buckets(checkpoint_dir: str | None) -> frozenset[int]:
    if not checkpoint_dir or not os.path.isdir(checkpoint_dir):
        return frozenset()
    out = set()
    for name in os.listdir(checkpoint_dir):
        if name.startswith("bucket=") and os.path.exists(
            os.path.join(checkpoint_dir, name, "_SUCCESS")
        ):
            out.add(int(name.split("=", 1)[1]))
    return frozenset(out)


def run_keyed_pass(
    source: ray.data.Dataset | None,
    target: ray.data.Dataset | None,
    spec: KeyedSpec,
    task_key: str,
    *,
    batch_size: int | None = 65536,
    source_files: list[str] | None = None,
    target_files: list[str] | None = None,
    columns: list[str] | None = None,
    filter_expr=None,
) -> KeyedMetrics:
    """Execute the keyed pass; resume-aware when ``spec.checkpoint_dir``.

    Two execution paths:

    * **parquet fast path** (``source_files``/``target_files`` given,
      all parquet): fused read+project+split map tasks at file/row-group
      granularity — no materialization barrier between phases.
    * **Dataset path** (any Ray Dataset, e.g. CSV/JSON sources): project
      via ``map_batches`` then shuffle the materialized blocks.

    ``target=None``/``target_files=None`` runs a single-side pass
    (uniqueness only).
    """
    _guard_checkpoint_spec(spec)
    done = completed_buckets(spec.checkpoint_dir) if spec.resume else frozenset()
    if spec.persist_input and done:
        # a bucket checkpointed by an earlier attempt that did NOT
        # persist inputs has valid metrics but no input.parquet —
        # treating it as done would stamp _INPUTS_COMPLETE over a hole
        # that a later incremental run reads as "bucket was empty".
        # Recompute those buckets so the persisted input set is whole.
        done = frozenset(
            b
            for b in done
            if os.path.exists(
                os.path.join(
                    spec.checkpoint_dir, f"bucket={b}", "input.parquet"
                )
            )
        )
    checker = _BucketChecker(spec, task_key)
    merged = KeyedMetrics()

    use_files = source_files is not None and all(
        f.endswith(".parquet") for f in source_files + (target_files or [])
    )
    dual = bool(spec.conv_dedup_columns)
    fp_refs: list = []
    if use_files:
        from ..shuffle import parquet_bucket_shuffle, parquet_bucket_shuffle_dual

        sides = [(source_files, _Projector(spec, SIDE_SOURCE, columns or [], done))]
        if target_files is not None:
            sides.append(
                (target_files, _Projector(spec, SIDE_TARGET, columns or [], done))
            )
        prior_shards = None
        if spec.prior_input_dir:
            # the prior run's persisted bucket inputs join the exchange
            # as one extra shard side (None for resume-done buckets —
            # their checkpointed metrics already cover prior ∪ new)
            loader = ray.remote(num_cpus=0.25)(_load_prior_bucket)
            prior_shards = [
                loader.remote(spec.prior_input_dir, b) if b not in done else None
                for b in range(spec.num_buckets)
            ]
        if dual:
            blobs, fp_refs = parquet_bucket_shuffle_dual(
                sides, columns, filter_expr, spec.num_buckets, checker,
                prior_shards=prior_shards,
            )
        else:
            blobs = parquet_bucket_shuffle(
                sides, columns, filter_expr, spec.num_buckets, checker,
                prior_shards=prior_shards,
            )
    else:
        from ..shuffle import bucket_shuffle, bucket_shuffle_dual

        src_cols = list(source.schema().names)
        parts = [
            source.map_batches(
                _Projector(spec, SIDE_SOURCE, src_cols, done),
                batch_format="pyarrow",
                batch_size=batch_size,
                zero_copy_batch=True,
            )
        ]
        if target is not None:
            tgt_cols = list(target.schema().names)
            parts.append(
                target.map_batches(
                    _Projector(spec, SIDE_TARGET, tgt_cols, done),
                    batch_format="pyarrow",
                    batch_size=batch_size,
                    zero_copy_batch=True,
                )
            )
        if dual:
            blobs, fp_refs = bucket_shuffle_dual(parts, spec.num_buckets, checker)
        else:
            blobs = bucket_shuffle(parts, spec.num_buckets, checker)

    for blob in blobs:
        merged.merge(pickle.loads(blob))
    # fold in checkpointed buckets that were skipped this run
    for b in sorted(done):
        with open(
            os.path.join(spec.checkpoint_dir, f"bucket={b}", "metrics.pkl"), "rb"
        ) as fh:
            merged.merge(pickle.load(fh))
    hot_fp_rows: list[dict] = []
    if spec.group_checks:
        hot_violations, hot_fp_rows = _stitch_hot(merged, spec)
        if spec.checkpoint_dir and not hot_violations:
            # a previous run's hot violations must not survive a run that
            # produced none — the file is this run's output, not a
            # resumable checkpoint
            stale = os.path.join(spec.checkpoint_dir, "hot", "violations.parquet")
            if os.path.exists(stale):
                os.remove(stale)
        if hot_violations and spec.checkpoint_dir:
            # hot verdicts are re-stitched from merged partials every run
            # (cheap: one row per hot conversation), so this file is
            # simply rewritten — it is NOT a resumable bucket checkpoint
            import pyarrow.parquet as pq

            hdir = os.path.join(spec.checkpoint_dir, "hot")
            os.makedirs(hdir, exist_ok=True)
            vdf = pd.DataFrame(
                hot_violations, columns=["check_alias", "key", "side", "detail"]
            )
            vdf.insert(0, "task_key", task_key)
            fd, tmp = tempfile.mkstemp(dir=hdir, suffix=".parquet")
            os.close(fd)
            pq.write_table(pa.Table.from_pandas(vdf, preserve_index=False), tmp)
            os.replace(tmp, os.path.join(hdir, "violations.parquet"))
    if dual:
        _run_conv_dedup(merged, spec, task_key, fp_refs, hot_fp_rows, done)
    if spec.persist_input and spec.checkpoint_dir:
        # every reduce (and its input.parquet) is durable by now — mark
        # the input set complete so a later run can trust it as a prior
        _atomic_write(
            os.path.join(spec.checkpoint_dir, "_INPUTS_COMPLETE"), b""
        )
    return merged


def _run_conv_dedup(
    merged: KeyedMetrics,
    spec: KeyedSpec,
    task_key: str,
    fp_refs: list,
    hot_fp_rows: list[dict],
    done: frozenset[int],
) -> None:
    """Chained fingerprint exchange: the keyed reduces' per-bucket
    fingerprint tables (object-store-resident ObjectRefs) plus resumed
    buckets' checkpointed fingerprints plus the driver-stitched hot
    conversations re-bucket BY FINGERPRINT, and one small reduce per
    fingerprint bucket counts duplicates. The driver only ever holds
    refs, per-bucket (distinct, dup) pairs and capped violation rows."""
    from ..shuffle import ref_bucket_shuffle_refs

    refs = [r for r in fp_refs if r is not None]
    for b in sorted(done):
        path = os.path.join(spec.checkpoint_dir, f"bucket={b}", "convfp.parquet")
        if os.path.exists(path):
            refs.append(ray.remote(_load_convfp).remote(path))
    near = spec.conv_dedup_mode == "near"
    if hot_fp_rows:
        sides_arr = np.array([r["side"] for r in hot_fp_rows], dtype=np.int8)
        keys_arr = pa.array([r["key"] for r in hot_fp_rows], type=pa.string())
        if near:
            hot_table = _band_table(
                sides_arr,
                np.array([r["band"] for r in hot_fp_rows], dtype=np.int8),
                np.array([r["bkey"] for r in hot_fp_rows], dtype=np.uint64),
                keys_arr,
                spec.num_buckets,
            )
        else:
            hot_table = _fp_table(
                sides_arr,
                np.array([r["n"] for r in hot_fp_rows], dtype=np.int64),
                np.array([r["fp1"] for r in hot_fp_rows], dtype=np.uint64),
                np.array([r["fp2"] for r in hot_fp_rows], dtype=np.uint64),
                keys_arr,
                spec.num_buckets,
            )
        refs.append(ray.put(hot_table))
    dup_violations: list[dict] = []
    g_name = spec.group_column or "group"
    if refs and near:
        # hop 1: co-locate (band, band_key) rows, flag conversations
        # sharing a band with another conversation on the same side —
        # output stays object-store-resident, re-bucketed by key hash
        flag_refs = ref_bucket_shuffle_refs(
            refs, spec.num_buckets, _BandFlagger(spec.num_buckets)
        )
        # hop 2: dedup multi-band flags per conversation, count + sample
        out_refs = ref_bucket_shuffle_refs(
            flag_refs,
            spec.num_buckets,
            _FlagDeduper(g_name, spec.max_violations_per_bucket),
        )
        for res in ray.get(out_refs):
            if not res:
                continue
            for side, flagged in res["stats"].items():
                merged.conv_dup_convs[side] += flagged
            dup_violations.extend(res["violations"])
    elif refs:
        counter = _DupCounter(g_name, spec.max_violations_per_bucket)
        out_refs = ref_bucket_shuffle_refs(refs, spec.num_buckets, counter)
        for res in ray.get(out_refs):
            if not res:
                continue
            for side, (distinct, dups) in res["stats"].items():
                merged.conv_distinct[side] += distinct
                merged.conv_dup_convs[side] += dups
            for side, n in res.get("rekeyed", {}).items():
                merged.conv_rekeyed[side] += n
            dup_violations.extend(res["violations"])
    if spec.checkpoint_dir:
        # like hot/: this run's output, rewritten every run (NOT a
        # resumable bucket checkpoint); a clean run retracts stale files
        ddir = os.path.join(spec.checkpoint_dir, "convdup")
        stale = os.path.join(ddir, "violations.parquet")
        if not dup_violations:
            if os.path.exists(stale):
                os.remove(stale)
        else:
            import pyarrow.parquet as pq

            dup_violations.sort(key=lambda r: (r["side"], r["key"]))
            os.makedirs(ddir, exist_ok=True)
            vdf = pd.DataFrame(
                dup_violations, columns=["check_alias", "key", "side", "detail"]
            )
            vdf.insert(0, "task_key", task_key)
            fd, tmp = tempfile.mkstemp(dir=ddir, suffix=".parquet")
            os.close(fd)
            pq.write_table(pa.Table.from_pandas(vdf, preserve_index=False), tmp)
            os.replace(tmp, stale)
