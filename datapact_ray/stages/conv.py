"""Conversation-level pass: ordering checks + turn-count distributions.

Validates, per group (conversation), that ``turn_idx`` is contiguous
``0..n-1`` and ``ts`` is non-decreasing in turn order — the BASELINE
north-star "stable (conv_id, turn_idx) ordering" invariant — and builds
the per-conversation turn-count distribution (a t-digest per side) used by
the turn-count drift check.

Scale design (north rule: "hash-shuffle groupby on conv_id with explicit
skew mitigation — salted repartition of hot conversation keys"):

* the pre-shuffle projection keeps only ``(group, index, ts)`` — the wide
  ``text`` column never enters this shuffle;
* hot conversations (detected by the profile pass's heavy-hitter sketch)
  are split into **contiguous index-range shards**
  (``shard = turn_idx // span``), bucketed by ``hash(group, shard)``.
  Contiguous ranges make the per-shard partials exactly mergeable: the
  driver stitches shard summaries (count / min / max / dup flag /
  sortedness / boundary timestamps) back into a per-conversation verdict,
  including the cross-shard boundary comparisons;
* normal conversations use ``shard = 0`` and are verified entirely inside
  one bucket by vectorized pandas groupby aggregation (no Python per
  group).
"""

from __future__ import annotations

import json
import os
import pickle
import tempfile
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..sketches import TDigest, hash_columns_u64
from .keyed import _atomic_write, completed_buckets

SIDE_NAMES = ("source", "target")


@dataclass
class ConvSpec:
    group_column: str = "conv_id"
    index_column: str = "turn_idx"
    ts_column: str | None = "ts"
    require_contiguous: bool = True
    require_monotonic_ts: bool = True
    turn_count_digest: bool = False
    hot_keys: dict = field(default_factory=dict)  # key -> approx count
    hot_shard_span: int = 8192  # turns per shard for hot conversations
    num_buckets: int = 64
    max_violations_per_bucket: int = 100
    checkpoint_dir: str | None = None


@dataclass
class ConvMetrics:
    groups_checked: list[int] = field(default_factory=lambda: [0, 0])
    contiguity_violations: list[int] = field(default_factory=lambda: [0, 0])
    monotonicity_violations: list[int] = field(default_factory=lambda: [0, 0])
    digests: list[TDigest | None] = field(default_factory=lambda: [None, None])
    # (side, group) -> list of shard partial dicts, for hot conversations
    hot_partials: dict = field(default_factory=dict)
    violations: int = 0

    def merge(self, other: "ConvMetrics") -> "ConvMetrics":
        for i in (0, 1):
            self.groups_checked[i] += other.groups_checked[i]
            self.contiguity_violations[i] += other.contiguity_violations[i]
            self.monotonicity_violations[i] += other.monotonicity_violations[i]
            if other.digests[i] is not None:
                self.digests[i] = (
                    other.digests[i]
                    if self.digests[i] is None
                    else self.digests[i].merge(other.digests[i])
                )
        for k, shards in other.hot_partials.items():
            self.hot_partials.setdefault(k, []).extend(shards)
        self.violations += other.violations
        return self


class _ConvProjector:
    def __init__(self, spec: ConvSpec, side: int, skip: frozenset[int] = frozenset()):
        self.spec = spec
        self.side = side
        self.skip = skip

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        spec = self.spec
        cols = [spec.group_column, spec.index_column]
        if spec.ts_column:
            cols.append(spec.ts_column)
        df = batch.select(cols).to_pandas()
        out = pd.DataFrame({
            "g": df[spec.group_column],
            "i": df[spec.index_column].astype("int64"),
        })
        if spec.ts_column:
            ts = df[spec.ts_column]
            if np.issubdtype(ts.dtype, np.datetime64):
                out["t"] = ts.astype("int64")
            else:
                out["t"] = ts.astype("float64")
        out["__side"] = np.int8(self.side)
        shard = np.zeros(len(out), dtype=np.int64)
        if spec.hot_keys:
            hot_mask = out["g"].isin(list(spec.hot_keys)).to_numpy()
            if hot_mask.any():
                shard[hot_mask] = out["i"].to_numpy()[hot_mask] // spec.hot_shard_span
        out["__shard"] = shard
        out["__bucket"] = (
            hash_columns_u64(out, ["g", "__shard"]) % np.uint64(spec.num_buckets)
        ).astype(np.int32)
        if self.skip:
            out = out[~out["__bucket"].isin(list(self.skip)).to_numpy()]
        return out


class _ConvBucketChecker:
    def __init__(self, spec: ConvSpec, task_key: str):
        self.spec = spec
        self.task_key = task_key

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        spec = self.spec
        if len(group) == 0:
            return pd.DataFrame({"bucket": pd.Series([], dtype="int32"), "blob": []})
        bucket = int(group["__bucket"].iloc[0])
        m = ConvMetrics()
        violations: list[dict] = []
        has_ts = "t" in group.columns
        hot = spec.hot_keys

        for side in (0, 1):
            part = group[group["__side"] == side]
            if len(part) == 0:
                continue
            part = part.sort_values(["g", "__shard", "i"], kind="stable")
            gb = part.groupby(["g", "__shard"], sort=False)
            agg_kw = {
                "n": ("i", "size"),
                "imin": ("i", "min"),
                "imax": ("i", "max"),
                "inuniq": ("i", "nunique"),
            }
            if has_ts:
                agg_kw.update({"tfirst": ("t", "first"), "tlast": ("t", "last")})
            summary = gb.agg(**agg_kw)
            # sorted-ts check: ts diff within (g, shard) after index sort
            if has_ts:
                tv = part["t"].to_numpy()
                new_grp = (
                    (part["g"] != part["g"].shift()).to_numpy()
                    | (part["__shard"] != part["__shard"].shift()).to_numpy()
                )
                bad_step = np.zeros(len(part), dtype=bool)
                if len(part) > 1:
                    bad_step[1:] = tv[1:] < tv[:-1]
                bad_step &= ~new_grp
                bad_per = pd.Series(bad_step, index=part.index).groupby(
                    [part["g"], part["__shard"]], sort=False
                ).any()
                summary["ts_sorted"] = ~bad_per
            else:
                summary["ts_sorted"] = True
            summary = summary.reset_index()
            is_hot = summary["g"].isin(list(hot)) if hot else pd.Series(
                False, index=summary.index
            )
            # hot conversations: return shard partials for driver stitching
            for _, r in summary[is_hot].iterrows():
                m.hot_partials.setdefault((side, r["g"]), []).append(
                    {
                        "shard": int(r["__shard"]),
                        "n": int(r["n"]),
                        "imin": int(r["imin"]),
                        "imax": int(r["imax"]),
                        "nuniq": int(r["inuniq"]),
                        "tfirst": int(r["tfirst"]) if has_ts else None,
                        "tlast": int(r["tlast"]) if has_ts else None,
                        "ts_sorted": bool(r["ts_sorted"]),
                    }
                )
            cold = summary[~is_hot]
            if len(cold):
                m.groups_checked[side] += len(cold)
                contiguous = (
                    (cold["imin"] == 0)
                    & (cold["imax"] == cold["n"] - 1)
                    & (cold["inuniq"] == cold["n"])
                )
                mono = cold["ts_sorted"].astype(bool)
                if spec.require_contiguous:
                    bad_c = cold[~contiguous]
                    m.contiguity_violations[side] += len(bad_c)
                    for g in bad_c["g"].head(spec.max_violations_per_bucket):
                        violations.append(
                            {
                                "check_alias": f"ordering_validation_{spec.group_column}",
                                "key": json.dumps({spec.group_column: str(g)}),
                                "side": SIDE_NAMES[side],
                                "detail": json.dumps({"reason": "non_contiguous_turn_idx"}),
                            }
                        )
                if spec.require_monotonic_ts and has_ts:
                    bad_m = cold[contiguous & ~mono]
                    m.monotonicity_violations[side] += len(bad_m)
                    for g in bad_m["g"].head(spec.max_violations_per_bucket):
                        violations.append(
                            {
                                "check_alias": f"ordering_validation_{spec.group_column}",
                                "key": json.dumps({spec.group_column: str(g)}),
                                "side": SIDE_NAMES[side],
                                "detail": json.dumps({"reason": "non_monotonic_ts"}),
                            }
                        )
                if spec.turn_count_digest:
                    d = TDigest()
                    d.add(cold["n"].to_numpy(dtype=np.float64))
                    m.digests[side] = d

        m.violations = len(violations)
        if spec.checkpoint_dir:
            bdir = os.path.join(spec.checkpoint_dir, f"bucket={bucket}")
            os.makedirs(bdir, exist_ok=True)
            vdf = pd.DataFrame(
                violations, columns=["check_alias", "key", "side", "detail"]
            )
            vdf.insert(0, "task_key", self.task_key)
            import pyarrow.parquet as pq

            fd, tmp = tempfile.mkstemp(dir=bdir, suffix=".parquet")
            os.close(fd)
            pq.write_table(pa.Table.from_pandas(vdf, preserve_index=False), tmp)
            os.replace(tmp, os.path.join(bdir, "violations.parquet"))
            _atomic_write(os.path.join(bdir, "metrics.pkl"), pickle.dumps(m))
            _atomic_write(os.path.join(bdir, "_SUCCESS"), b"")
        return pd.DataFrame({"bucket": [bucket], "blob": [pickle.dumps(m)]})


def _stitch_hot(metrics: ConvMetrics, spec: ConvSpec) -> None:
    """Fold hot-conversation shard partials into whole-conversation
    verdicts. Shards are contiguous index ranges, so merging is exact."""
    for (side, g), shards in sorted(
        metrics.hot_partials.items(), key=lambda kv: (kv[0][0], str(kv[0][1]))
    ):
        shards = sorted(shards, key=lambda s: s["shard"])
        metrics.groups_checked[side] += 1
        n = sum(s["n"] for s in shards)
        imin = min(s["imin"] for s in shards)
        imax = max(s["imax"] for s in shards)
        nuniq = sum(s["nuniq"] for s in shards)  # shards hold disjoint index ranges
        contiguous = imin == 0 and imax == n - 1 and nuniq == n
        mono = all(s["ts_sorted"] for s in shards)
        if mono and shards[0]["tlast"] is not None:
            for a, b in zip(shards, shards[1:]):
                if a["tlast"] is not None and b["tfirst"] is not None and (
                    b["tfirst"] < a["tlast"]
                ):
                    mono = False
                    break
        if spec.require_contiguous and not contiguous:
            metrics.contiguity_violations[side] += 1
        elif spec.require_monotonic_ts and not mono:
            metrics.monotonicity_violations[side] += 1
        if spec.turn_count_digest:
            d = metrics.digests[side] or TDigest()
            d.add(np.array([float(n)]))
            metrics.digests[side] = d
    metrics.hot_partials = {}


def run_conv_pass(
    source: ray.data.Dataset,
    target: ray.data.Dataset | None,
    spec: ConvSpec,
    task_key: str,
    *,
    batch_size: int = 131072,
) -> ConvMetrics:
    done = completed_buckets(spec.checkpoint_dir)
    parts = [
        source.map_batches(
            _ConvProjector(spec, 0, done),
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
        )
    ]
    if target is not None:
        parts.append(
            target.map_batches(
                _ConvProjector(spec, 1, done),
                batch_format="pyarrow",
                batch_size=batch_size,
                zero_copy_batch=True,
            )
        )
    unioned = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
    checker = _ConvBucketChecker(spec, task_key)

    def check_conv_bucket(group: pd.DataFrame) -> pd.DataFrame:
        return checker(group)

    result = unioned.groupby("__bucket").map_groups(
        check_conv_bucket, batch_format="pandas"
    )
    merged = ConvMetrics()
    for row in result.take_all():
        merged.merge(pickle.loads(row["blob"]))
    for b in sorted(done):
        with open(
            os.path.join(spec.checkpoint_dir, f"bucket={b}", "metrics.pkl"), "rb"
        ) as fh:
            merged.merge(pickle.load(fh))
    _stitch_hot(merged, spec)
    return merged
