"""Bucketed keyed pass: every key-shaped check in ONE hash shuffle.

Replaces the reference's PK joins and COUNT(DISTINCT) scans
(``validation.sql.j2:135-142,195-241``) with an explicitly-partitioned
Ray Data pipeline:

1. **Pre-shuffle projection** (stateless ``map_batches``, zero-copy
   Arrow→pandas only for hashing): each side is reduced to its key
   columns plus *fixed-width hashes* — a row hash over ``hash_columns``,
   one hash per compare column (e.g. ``text``), one null-flag per
   null-join column — so the all-to-all exchange ships ~8 bytes per
   check per row instead of wide text payloads, and a deterministic
   ``__bucket = rowhash(key) % B`` partition id. Bucketing the
   *composite* key ``(conv_id, turn_idx)`` spreads hot conversations
   across buckets naturally (the salting requirement of the north rule
   for composite-key uniqueness: identical composite keys still land in
   exactly one bucket).
2. **One hash shuffle**: ``union(source, target).groupby("__bucket")``.
3. **Per-bucket vectorized verification** (``map_groups``, pandas):
   inner-join on the key (mismatches counted over matched pairs only —
   the reference's INNER JOIN semantics), per-side duplicate detection,
   null counts over matched pairs, per-compare-column inequality — all
   C-level pandas ops, no Python-per-row.  Each bucket writes its
   violation rows + metrics to a checkpoint partition
   (``.../bucket=<b>/{violations.parquet,metrics.pkl,_SUCCESS}``) and
   returns only a tiny metrics row; a resumed run filters completed
   buckets out *before* the shuffle and merges their checkpointed
   metrics instead of recomputing (north rule resumability).
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

from ..sketches import hash_columns_u64

SIDE_SOURCE = 0
SIDE_TARGET = 1


@dataclass
class KeyedSpec:
    key_columns: list[str]
    row_hash: bool = False
    hash_columns: list[str] | None = None  # None -> all common columns
    null_join_columns: list[str] = field(default_factory=list)
    compare_columns: list[str] = field(default_factory=list)
    uniqueness: bool = False  # uniqueness over key_columns, both sides
    max_violations_per_bucket: int = 100
    num_buckets: int = 64
    checkpoint_dir: str | None = None  # per-bucket checkpoints when set


@dataclass
class KeyedMetrics:
    total_compared_rows: int = 0
    mismatch_count: int = 0
    compare_mismatches: dict[str, int] = field(default_factory=dict)
    null_join: dict[str, list[int]] = field(default_factory=dict)  # col -> [src, tgt]
    uniq_count: list[int] = field(default_factory=lambda: [0, 0])
    uniq_distinct: list[int] = field(default_factory=lambda: [0, 0])
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
        self.violations += other.violations
        return self


def _atomic_write(path: str, data: bytes) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d)
    with os.fdopen(fd, "wb") as fh:
        fh.write(data)
    os.replace(tmp, path)


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

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        spec = self.spec
        need = list(
            dict.fromkeys(
                spec.key_columns
                + (self.hash_cols or [])
                + spec.compare_columns
                + spec.null_join_columns
            )
        )
        df = batch.select(need).to_pandas()
        out = df[spec.key_columns].copy()
        # one deterministic uint64 key hash drives BOTH bucketing and the
        # per-bucket join/groupby (int64 merge ≫ multi-column string merge)
        kh = hash_columns_u64(df, spec.key_columns)
        out["__kh"] = kh
        if self.hash_cols:
            out["__rh"] = hash_columns_u64(df, self.hash_cols)
        for c in spec.compare_columns:
            out[f"__cmp_{c}"] = hash_columns_u64(df, [c])
        for c in spec.null_join_columns:
            out[f"__nl_{c}"] = df[c].isna().to_numpy(dtype=np.int8)
        out["__side"] = np.int8(self.side)
        out["__bucket"] = (kh % np.uint64(spec.num_buckets)).astype(np.int32)
        if self.skip_buckets:
            mask = ~out["__bucket"].isin(list(self.skip_buckets)).to_numpy()
            out = out[mask]
        return out


class _BucketChecker:
    """Per-bucket verification; runs once per bucket via map_groups."""

    def __init__(self, spec: KeyedSpec, task_key: str):
        self.spec = spec
        self.task_key = task_key

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        spec = self.spec
        if len(group) == 0:
            return pd.DataFrame({"bucket": pd.Series([], dtype="int32"), "blob": []})
        bucket = int(group["__bucket"].iloc[0])
        m = KeyedMetrics()
        violations: list[dict] = []
        key_cols = spec.key_columns
        src = group[group["__side"] == SIDE_SOURCE]
        tgt = group[group["__side"] == SIDE_TARGET]

        cap = spec.max_violations_per_bucket

        if spec.uniqueness:
            for side_idx, frame in ((0, src), (1, tgt)):
                if len(frame) == 0:
                    continue
                sizes = frame["__kh"].value_counts(sort=False)
                m.uniq_count[side_idx] += int(sizes.sum())
                m.uniq_distinct[side_idx] += int(len(sizes))
                dup_kh = sizes[sizes > 1]
                if len(dup_kh):
                    # map hashes back to key values for violation reporting
                    # (no iterrows: it would upcast uint64 hashes to float)
                    reps = (
                        frame[frame["__kh"].isin(dup_kh.index)]
                        .drop_duplicates("__kh")
                        .sort_values(key_cols)
                        .head(cap)
                    )
                    occurrences = dup_kh.loc[reps["__kh"].to_numpy()].to_numpy()
                    key_strs = [reps[c].astype(str).tolist() for c in key_cols]
                    for row_i in range(len(reps)):
                        violations.append(
                            {
                                "check_alias": "uniqueness_validation_"
                                + "_".join(key_cols),
                                "key": json.dumps(
                                    {
                                        c: key_strs[ci][row_i]
                                        for ci, c in enumerate(key_cols)
                                    }
                                ),
                                "side": "source" if side_idx == 0 else "target",
                                "detail": json.dumps(
                                    {"occurrences": int(occurrences[row_i])}
                                ),
                            }
                        )

        join_needed = spec.row_hash or spec.compare_columns or spec.null_join_columns
        if join_needed and len(src) and len(tgt):
            keep_s = ["__kh"] + key_cols + [
                c for c in src.columns if c.startswith(("__rh", "__cmp_", "__nl_"))
            ]
            keep_t = ["__kh"] + [
                c for c in tgt.columns if c.startswith(("__rh", "__cmp_", "__nl_"))
            ]
            joined = src[keep_s].merge(
                tgt[keep_t], on="__kh", how="inner", suffixes=("_s", "_t")
            )
            m.total_compared_rows += len(joined)

            def emit(bad: np.ndarray, alias: str, detail: dict) -> None:
                rows = joined.loc[bad, key_cols].sort_values(key_cols).head(cap)
                payload = json.dumps(detail)
                key_strs = [rows[c].astype(str).tolist() for c in key_cols]
                for row_i in range(len(rows)):
                    violations.append(
                        {
                            "check_alias": alias,
                            "key": json.dumps(
                                {c: key_strs[ci][row_i] for ci, c in enumerate(key_cols)}
                            ),
                            "side": "both",
                            "detail": payload,
                        }
                    )

            if spec.row_hash:
                bad = joined["__rh_s"].to_numpy() != joined["__rh_t"].to_numpy()
                nbad = int(bad.sum())
                m.mismatch_count += nbad
                if nbad:
                    emit(bad, "row_hash_validation", {"reason": "row_hash_mismatch"})
            for c in spec.compare_columns:
                bad = (
                    joined[f"__cmp_{c}_s"].to_numpy()
                    != joined[f"__cmp_{c}_t"].to_numpy()
                )
                nbad = int(bad.sum())
                m.compare_mismatches[c] = m.compare_mismatches.get(c, 0) + nbad
                if nbad:
                    emit(bad, "compare_validation_" + c, {"column": c})
            for c in spec.null_join_columns:
                cur = m.null_join.setdefault(c, [0, 0])
                cur[0] += int(joined[f"__nl_{c}_s"].sum())
                cur[1] += int(joined[f"__nl_{c}_t"].sum())
        elif join_needed:
            for c in spec.null_join_columns:
                m.null_join.setdefault(c, [0, 0])

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
    source: ray.data.Dataset,
    target: ray.data.Dataset | None,
    spec: KeyedSpec,
    task_key: str,
    *,
    batch_size: int = 65536,
) -> KeyedMetrics:
    """Execute the keyed pass; resume-aware when ``spec.checkpoint_dir``.

    ``target=None`` runs a single-side pass (uniqueness only).
    """
    done = completed_buckets(spec.checkpoint_dir)
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
    unioned = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
    checker = _BucketChecker(spec, task_key)

    def check_bucket(group: pd.DataFrame) -> pd.DataFrame:
        return checker(group)

    result = unioned.groupby("__bucket").map_groups(
        check_bucket, batch_format="pandas"
    )
    merged = KeyedMetrics()
    for row in result.take_all():
        merged.merge(pickle.loads(row["blob"]))
    # fold in checkpointed buckets that were skipped this run
    for b in sorted(done):
        with open(
            os.path.join(spec.checkpoint_dir, f"bucket={b}", "metrics.pkl"), "rb"
        ) as fh:
            merged.merge(pickle.load(fh))
    return merged
