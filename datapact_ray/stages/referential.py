"""Referential-integrity pass: key containment without a shuffle.

Equivalent of the reference's PK-join machinery applied as an anti-join
(SURVEY.md §2.4 J2 / §2.3 A2): every key of the probe side must exist in
the reference (dimension) table.

Two scale regimes, chosen from the dimension's parquet footer row count
(no data read):

* **small dim** (≤ ``bloom_threshold`` rows): the distinct key-hash set
  is collected once (driver-side pyarrow read for small files, else a
  per-batch-distinct map wave) and **broadcast via ``ray.put``** as a
  sorted array — exact membership, zero shuffle.
* **large dim** (north-star "partitioned Bloom filters"): nothing is
  ever materialized on the driver. A dim scan wave hash-partitions the
  distinct key hashes into P sorted arrays that stay in the object
  store; one build task per partition produces that partition's Bloom
  filter. Probe tasks route each row's key hash to its partition's
  Bloom: **negatives are definite orphans** (counted + sampled with
  display values on the spot); positives ship only ``(key_hash,
  row_count)`` pairs to a per-partition exact recheck against the sorted
  key array — so ``orphan_rows`` is row-exact even under Bloom false
  positives, and the recheck exchange carries distinct keys, not rows.
  FP-discovered orphans are counted exactly but not sampled (their
  display values would need one extra probe pass; definite orphans
  provide the samples).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..sketches import BloomFilter, hash_arrow_u64


@dataclass
class ReferentialMetrics:
    probed_rows: int = 0
    orphan_rows: int = 0
    violations: list[dict] | None = None


def _distinct_key_hashes(ds: ray.data.Dataset, columns: list[str]) -> np.ndarray:
    """Distinct uint64 key hashes of a dataset, merged on the driver.

    Per-batch ``np.unique`` shrinks what leaves the workers; the driver
    unions the partials. Key identity = deterministic row hash, so
    membership tests are hash-set lookups (collision odds ~2^-64/pair,
    documented deviation from exact value comparison).
    """

    def batch_hashes(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({"h": np.unique(hash_arrow_u64(batch, columns))})

    parts = ds.map_batches(batch_hashes, batch_format="pyarrow", zero_copy_batch=True)
    chunks = [
        b["h"].to_numpy()
        for b in parts.iter_batches(batch_size=1 << 20, batch_format="pandas")
    ]
    if not chunks:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(chunks))


class _ProbeActor:
    """Actor-pool probe (exact path): deserializes the broadcast sorted
    key-hash array once per actor (``__init__``), probes batches via
    vectorized searchsorted membership."""

    def __init__(self, ref, columns: list[str], key_display_columns: list[str],
                 cap: int):
        obj = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        self.keyset = obj  # sorted uint64 array
        self.columns = columns
        self.key_display_columns = key_display_columns
        self.cap = cap

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        h = hash_arrow_u64(batch, self.columns)
        idx = np.searchsorted(self.keyset, h)
        idx[idx >= len(self.keyset)] = len(self.keyset) - 1 if len(self.keyset) else 0
        present = (
            self.keyset[idx] == h if len(self.keyset) else np.zeros(len(h), bool)
        )
        miss = ~present
        n_miss = int(miss.sum())
        sample: list[str] = []
        if n_miss:
            # only the capped sample rows are ever converted to Python
            pos = np.nonzero(miss)[0][: self.cap]
            sub = batch.select(self.key_display_columns).take(pa.array(pos))
            cols = {c: sub.column(c).to_pylist() for c in self.key_display_columns}
            sample = [
                json.dumps(
                    {c: str(cols[c][i]) for c in self.key_display_columns}
                )
                for i in range(len(pos))
            ]
        return pd.DataFrame(
            {
                "probed": [batch.num_rows],
                "orphans": [n_miss],
                "sample": [json.dumps(sample)],
            }
        )


def _distinct_key_hashes_local(
    ref_files: list[str], columns: list[str]
) -> np.ndarray:
    """Small-dim fast path: read the key columns with pyarrow on the
    driver (skips a whole Ray job for dims of a few hundred MB)."""
    import pyarrow.parquet as pq

    tables = [pq.read_table(f, columns=columns) for f in ref_files]
    table = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
    return np.unique(hash_arrow_u64(table, columns))


def _probe_unit(
    unit: tuple,
    columns: list[str],
    read_columns: list[str],
    filter_expr_pickle: bytes | None,
    broadcast,
    cap: int,
) -> pd.DataFrame:
    """Fused raw-task probe over one parquet file/row-group chunk.
    ``read_columns`` ⊇ ``columns``: the filter may reference columns the
    probe itself does not hash."""
    import pickle

    from ..shuffle import read_unit

    table = read_unit(unit, read_columns)
    if filter_expr_pickle is not None:
        table = table.filter(pickle.loads(filter_expr_pickle))
    return _ProbeActor(broadcast, columns, columns, cap)(table)


def _hash_partitions(h: np.ndarray, num_partitions: int) -> list[np.ndarray]:
    """Sorted-unique uint64 hashes → P hash-partitioned arrays."""
    part = (h % np.uint64(num_partitions)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    h, part = h[order], part[order]
    bounds = np.searchsorted(part, np.arange(num_partitions + 1))
    return [h[bounds[p] : bounds[p + 1]] for p in range(num_partitions)]


def _dim_chunk_partitions(
    unit: tuple, columns: list[str], num_partitions: int
) -> list[np.ndarray]:
    """Dim scan map task: one parquet chunk -> P sorted unique key-hash
    arrays (hash-partitioned). Fixed-width uint64 only."""
    from ..shuffle import read_unit

    table = read_unit(unit, columns)
    return _hash_partitions(np.unique(hash_arrow_u64(table, columns)), num_partitions)


def _dim_block_partitions(
    block: pa.Table, columns: list[str], num_partitions: int
) -> list[np.ndarray]:
    """Dim map task over a Dataset BLOCK (non-parquet dims: CSV/JSONL —
    no footers to route by): same P-way key-hash partitioning as the
    parquet chunk task; the block ships object-store → task, never
    through the driver."""
    return _hash_partitions(np.unique(hash_arrow_u64(block, columns)), num_partitions)


def _dim_partition_build(capacity: int, fpp: float, *chunks: np.ndarray):
    """Per-partition reduce: union the chunk key arrays (sorted unique)
    and build this partition's Bloom filter. Returns (keys, bloom_bytes);
    the keys array stays in the object store for the exact recheck."""
    # num_partitions=1: Ray does not unpack num_returns=1, so each chunk
    # arrives as the map task's whole 1-element list — unwrap it
    chunks = tuple(c[0] if isinstance(c, list) else c for c in chunks)
    keys = (
        np.unique(np.concatenate(chunks)) if chunks else np.empty(0, np.uint64)
    )
    bloom = BloomFilter(max(len(keys), capacity), fpp)
    bloom.add_hashes(keys)
    return keys, bloom.to_bytes()


def _probe_chunk_partitioned(
    unit: tuple,
    columns: list[str],
    read_columns: list[str],
    filter_expr_pickle: bytes | None,
    blooms_ref,
    num_partitions: int,
    cap: int,
):
    """Probe map task (scale path). Returns ``num_partitions + 1``
    values: a summary dict (rows probed, definite orphans, key samples)
    followed by one ``(key_hashes, row_counts)`` pair per partition for
    the Bloom-positive keys routed there."""
    import json as _json
    import pickle as _pickle

    from ..shuffle import read_unit

    table = read_unit(unit, read_columns)
    if filter_expr_pickle is not None:
        table = table.filter(_pickle.loads(filter_expr_pickle))
    # blooms_ref arrives as [ObjectRef] (nested refs are not auto-resolved
    # by Ray, so the bloom list ships once via the object store, not once
    # per task argument). Deserialization is memoized per worker process:
    # at est_ref_rows=1e9 / fpp=1e-3 the P Blooms total ~1.8 GB, and
    # paying from_bytes in EVERY probe task would dominate the wave.
    from ..warmcache import get_or_build

    blooms = get_or_build(
        blooms_ref[0],
        lambda: [BloomFilter.from_bytes(b) for b in ray.get(blooms_ref[0])],
    )
    return _probe_table_partitioned(table, columns, blooms, num_partitions, cap)


def _probe_table_partitioned(
    table: pa.Table,
    columns: list[str],
    blooms: list,
    num_partitions: int,
    cap: int,
) -> tuple:
    """Shared partitioned-Bloom probe over one Arrow table: returns a
    summary dict followed by one ``(key_hashes, row_counts)`` pair per
    partition for the Bloom-positive keys routed there."""
    import json as _json

    h = hash_arrow_u64(table, columns)
    part = (h % np.uint64(num_partitions)).astype(np.int64)
    # one argsort + per-partition slices (the _dim_chunk_partitions
    # pattern) instead of P full-array masks — the mask loop was O(P*n)
    # per chunk, seconds of pure overhead at P=512, n=1M
    order = np.argsort(part, kind="stable")
    part_sorted = part[order]
    bounds = np.searchsorted(part_sorted, np.arange(num_partitions + 1))
    present = np.zeros(len(h), dtype=bool)
    for p in range(num_partitions):
        sl = order[bounds[p] : bounds[p + 1]]
        if len(sl):
            present[sl] = blooms[p].contains_hashes(h[sl])
    miss = ~present
    n_miss = int(miss.sum())
    sample: list[str] = []
    if n_miss:
        pos = np.nonzero(miss)[0][:cap]
        sub = table.select(columns).take(pa.array(pos))
        cols = {c: sub.column(c).to_pylist() for c in columns}
        sample = [
            _json.dumps({c: str(cols[c][i]) for c in columns})
            for i in range(len(pos))
        ]
    summary = {"probed": table.num_rows, "orphans": n_miss, "sample": sample}
    out = [summary]
    hp, pp = h[present], part[present]
    p_order = np.argsort(pp, kind="stable")
    hp_sorted, pp_sorted = hp[p_order], pp[p_order]
    p_bounds = np.searchsorted(pp_sorted, np.arange(num_partitions + 1))
    for p in range(num_partitions):
        keys, counts = np.unique(
            hp_sorted[p_bounds[p] : p_bounds[p + 1]], return_counts=True
        )
        out.append((keys, counts.astype(np.int64)))
    return tuple(out)


class _DatasetBloomProber:
    """Big-dim probe for NON-parquet probe inputs: workers hold only the
    P partition Bloom filters (~1.8 GB per 1e9 keys at fpp=1e-3), never
    the full key array. Definite orphans (Bloom miss — no false
    negatives) are counted and sampled per batch; Bloom-positive keys are
    emitted as per-partition ``(keys, counts)`` partials for the
    row-exact recheck against that partition's sorted key array."""

    def __init__(self, blooms_ref, columns: list[str], num_partitions: int,
                 cap: int):
        self.blooms_ref = blooms_ref
        self.columns = columns
        self.num_partitions = num_partitions
        self.cap = cap

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        import pickle as _pickle

        from ..warmcache import get_or_build

        blooms = get_or_build(
            self.blooms_ref,
            lambda: [BloomFilter.from_bytes(b) for b in ray.get(self.blooms_ref)],
        )
        out = _probe_table_partitioned(
            batch, self.columns, blooms, self.num_partitions, self.cap
        )
        summary, maybe = out[0], out[1:]
        return pd.DataFrame(
            {
                "probed": [summary["probed"]],
                "orphans": [summary["orphans"]],
                "sample": [json.dumps(summary["sample"])],
                "maybe": [_pickle.dumps(maybe)],
            }
        )


def _recheck_partition(
    dim_keys: np.ndarray, cap: int, *maybe: tuple
) -> tuple[int, np.ndarray]:
    """Per-partition exact recheck: total probe ROWS whose key is not in
    the dim partition (Bloom false positives), summed from row counts.
    Also returns up to ``cap`` of the false-positive key hashes so the
    driver can fetch display samples for them."""
    orphan_rows = 0
    fp_keys: list[np.ndarray] = []
    for keys, counts in maybe:
        if len(keys) == 0:
            continue
        idx = np.searchsorted(dim_keys, keys)
        idx[idx >= len(dim_keys)] = max(len(dim_keys) - 1, 0)
        hit = dim_keys[idx] == keys if len(dim_keys) else np.zeros(len(keys), bool)
        orphan_rows += int(counts[~hit].sum())
        if (~hit).any():
            fp_keys.append(keys[~hit])
    fp = (
        np.unique(np.concatenate(fp_keys))[:cap]
        if fp_keys
        else np.empty(0, np.uint64)
    )
    return orphan_rows, fp


def _fp_sample_unit(
    unit: tuple,
    columns: list[str],
    read_columns: list[str],
    filter_expr_pickle: bytes | None,
    fp_set: np.ndarray,  # ObjectRef at call site; Ray auto-resolves args
    cap: int,
) -> list[str]:
    """Targeted re-probe for Bloom-false-positive keys: display-value
    samples for rows whose key hash is in the (small, broadcast) FP set.
    Only dispatched when FP orphans exist AND the definite-orphan
    samples did not fill the violation cap — at a 0.1% FPP this wave
    almost never runs."""
    import json as _json
    import pickle as _pickle

    from ..shuffle import read_unit

    table = read_unit(unit, read_columns)
    if filter_expr_pickle is not None:
        table = table.filter(_pickle.loads(filter_expr_pickle))
    h = hash_arrow_u64(table, columns)
    mask = np.isin(h, fp_set)
    if not mask.any():
        return []
    pos = np.nonzero(mask)[0][:cap]
    sub = table.select(columns).take(pa.array(pos))
    cols = {c: sub.column(c).to_pylist() for c in columns}
    return [
        _json.dumps({c: str(cols[c][i]) for c in columns})
        for i in range(len(pos))
    ]


def _num_partitions_for(est_ref_rows: int) -> int:
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(cpus, min(512, est_ref_rows // 16_000_000 + 1))


def _build_dim_partitions(chunk_refs: list, P: int, est_ref_rows: int, fpp: float):
    """Reduce the map wave's P-way chunk splits into per-partition
    (sorted key array, Bloom) pairs. Returns (key_refs, blooms_ref):
    the key arrays STAY in the object store as ObjectRefs; the driver
    only ever holds the P Bloom byte strings."""
    if P == 1:
        chunk_refs = [[r] for r in chunk_refs]
    build_task = ray.remote(num_returns=2)(_dim_partition_build)
    per_part_capacity = max(1024, est_ref_rows // P)
    key_refs, bloom_refs = [], []
    for p in range(P):
        kref, bref = build_task.remote(
            per_part_capacity, fpp, *[c[p] for c in chunk_refs]
        )
        key_refs.append(kref)
        bloom_refs.append(bref)
    blooms_ref = ray.put(ray.get(bloom_refs))  # P bloom byte strings
    return key_refs, blooms_ref


def _dim_partitions_from_units(
    ref_files: list[str], ref_columns: list[str], P: int, est_ref_rows: int, fpp: float
):
    """Parquet dim → P object-store partitions, routed by footers."""
    from ..shuffle import _scan_units

    dim_task = ray.remote(num_returns=P)(_dim_chunk_partitions)
    chunk_refs = [dim_task.remote(u, ref_columns, P) for u in _scan_units(ref_files)]
    return _build_dim_partitions(chunk_refs, P, est_ref_rows, fpp)


def _dim_partitions_from_dataset(
    ref_table: ray.data.Dataset, ref_columns: list[str], fpp: float,
    bloom_threshold: int,
):
    """NON-parquet dim (CSV/JSONL/…) → P object-store partitions.

    The dim Dataset executes once; its blocks are taken as ObjectRefs
    (``iter_internal_ref_bundles`` — blocks live in the object store and
    may spill, the driver holds refs only) and each block fans out
    through the same P-way key-hash partition task as the parquet path.
    Returns ``None`` when the materialized row count is under
    ``bloom_threshold`` (caller falls back to the small-dim broadcast),
    else ``(key_refs, blooms_ref, P)``."""
    bundles = list(ref_table.iter_internal_ref_bundles())
    block_refs = [r for b in bundles for r in b.block_refs]
    est_rows = sum(b.num_rows() or 0 for b in bundles)
    if est_rows <= bloom_threshold:
        return None
    P = _num_partitions_for(est_rows)
    dim_task = ray.remote(num_returns=P)(_dim_block_partitions)
    chunk_refs = [dim_task.remote(bref, ref_columns, P) for bref in block_refs]
    key_refs, blooms_ref = _build_dim_partitions(chunk_refs, P, est_rows, fpp)
    return key_refs, blooms_ref, P


def _run_partitioned_referential(
    probe_files: list[str],
    ref_files: list[str],
    probe_columns: list[str],
    ref_columns: list[str],
    est_ref_rows: int,
    *,
    cap: int,
    bloom_fpp: float,
    filter_expr,
    filter_columns: set[str] | None,
    num_partitions: int | None = None,
) -> ReferentialMetrics:
    """North-star scale path: partitioned Bloom filters + exact recheck,
    nothing key-sized on the driver (only P Bloom byte strings)."""
    P = (
        num_partitions
        if num_partitions is not None
        else _num_partitions_for(est_ref_rows)
    )
    key_refs, blooms_ref = _dim_partitions_from_units(
        ref_files, ref_columns, P, est_ref_rows, bloom_fpp
    )
    return _probe_partitioned_units(
        probe_files, probe_columns, key_refs, blooms_ref, P,
        cap=cap, filter_expr=filter_expr, filter_columns=filter_columns,
    )


def _probe_partitioned_units(
    probe_files: list[str],
    probe_columns: list[str],
    key_refs: list,
    blooms_ref,
    P: int,
    *,
    cap: int,
    filter_expr,
    filter_columns: set[str] | None,
) -> ReferentialMetrics:
    """Parquet-probe half of the partitioned path: scan-unit probe wave →
    per-partition exact recheck → optional FP display-sample wave."""
    import pickle as _pickle

    from ..shuffle import _scan_units

    probe_task = ray.remote(num_returns=P + 1)(_probe_chunk_partitioned)
    expr_pickle = _pickle.dumps(filter_expr) if filter_expr is not None else None
    read_cols = sorted(set(probe_columns) | (filter_columns or set()))
    probe_out = [
        probe_task.remote(
            u, probe_columns, read_cols, expr_pickle, [blooms_ref], P, cap
        )
        for u in _scan_units(probe_files)
    ]
    recheck_task = ray.remote(num_returns=2)(_recheck_partition)
    recheck_refs = [
        recheck_task.remote(key_refs[p], cap, *[chunk[p + 1] for chunk in probe_out])
        for p in range(P)
    ]

    metrics = ReferentialMetrics(violations=[])
    for summary in ray.get([chunk[0] for chunk in probe_out]):
        metrics.probed_rows += summary["probed"]
        metrics.orphan_rows += summary["orphans"]
        for s in summary["sample"]:
            if len(metrics.violations) < cap:
                metrics.violations.append(
                    {
                        "key": s,
                        "side": "probe",
                        "detail": json.dumps({"reason": "orphan_key"}),
                    }
                )
    fp_rows = sum(ray.get([r[0] for r in recheck_refs]))
    metrics.orphan_rows += fp_rows
    if fp_rows and len(metrics.violations) < cap:
        # targeted sample wave for FP-discovered orphan keys (rare: needs
        # real orphans that collided with the Bloom AND spare cap budget)
        fp_keys = np.unique(
            np.concatenate(ray.get([r[1] for r in recheck_refs]))
        )
        fp_ref = ray.put(fp_keys)
        sample_task = ray.remote(_fp_sample_unit)
        budget = cap - len(metrics.violations)
        for samples in ray.get(
            [
                sample_task.remote(
                    u, probe_columns, read_cols, expr_pickle, fp_ref, budget
                )
                for u in _scan_units(probe_files)
            ]
        ):
            for s in samples:
                if len(metrics.violations) < cap:
                    metrics.violations.append(
                        {
                            "key": s,
                            "side": "probe",
                            "detail": json.dumps(
                                {"reason": "orphan_key", "bloom_fp": True}
                            ),
                        }
                    )
    return metrics


def _dataset_probe_partitioned_bloom(
    probe: ray.data.Dataset,
    key_refs: list,
    blooms_ref,
    P: int,
    probe_columns: list[str],
    cap: int,
) -> ReferentialMetrics:
    """Big dim + NON-parquet probe: same partitioned-Bloom + row-exact
    recheck contract as the parquet scale path, driven from a Dataset.
    The dim partitions arrive prebuilt as object-store refs (built by
    ``_dim_partitions_from_units`` / ``_dim_partitions_from_dataset`` —
    the driver never holds a key array, only P Bloom byte strings).
    Bloom-FP orphan keys are counted row-exactly but not display-sampled
    (that would need a second probe scan); definite-orphan samples still
    fill the violation cap."""
    import pickle as _pickle

    rows = probe.map_batches(
        _DatasetBloomProber(blooms_ref, probe_columns, P, cap),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()

    metrics = ReferentialMetrics(violations=[])
    per_part: list[list] = [[] for _ in range(P)]
    for row in rows:
        metrics.probed_rows += int(row["probed"])
        metrics.orphan_rows += int(row["orphans"])
        for s in json.loads(row["sample"]):
            if len(metrics.violations) < cap:
                metrics.violations.append(
                    {
                        "key": s,
                        "side": "probe",
                        "detail": json.dumps({"reason": "orphan_key"}),
                    }
                )
        for p, pair in enumerate(_pickle.loads(row["maybe"])):
            if len(pair[0]):
                per_part[p].append(pair)
    recheck_task = ray.remote(num_returns=2)(_recheck_partition)
    recheck_refs = [
        recheck_task.remote(key_refs[p], cap, *per_part[p])
        for p in range(P)
        if per_part[p]
    ]
    if recheck_refs:
        metrics.orphan_rows += sum(ray.get([r[0] for r in recheck_refs]))
    return metrics


def run_referential_pass(
    probe: ray.data.Dataset | None,
    ref_table: ray.data.Dataset | None,
    probe_columns: list[str],
    ref_columns: list[str],
    *,
    cap: int = 100,
    bloom_threshold: int = 20_000_000,
    bloom_fpp: float = 0.001,
    concurrency: int | tuple[int, int] = (1, 16),
    ref_files: list[str] | None = None,
    probe_files: list[str] | None = None,
    filter_expr=None,
    filter_columns: set[str] | None = None,
    small_dim_bytes: int = 256 << 20,
    num_partitions: int | None = None,
) -> ReferentialMetrics:
    import pyarrow.parquet as pq

    probe_parquet = probe_files is not None and all(
        f.endswith(".parquet") for f in probe_files
    )
    ref_parquet = ref_files is not None and all(
        f.endswith(".parquet") for f in ref_files
    )
    if ref_parquet:
        # route by footer row count BEFORE any key materialization: the
        # scale path must never build the full key set on the driver
        est_ref_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in ref_files)
        if est_ref_rows > bloom_threshold:
            if probe_parquet:
                return _run_partitioned_referential(
                    probe_files,
                    ref_files,
                    probe_columns,
                    ref_columns,
                    est_ref_rows,
                    cap=cap,
                    bloom_fpp=bloom_fpp,
                    filter_expr=filter_expr,
                    filter_columns=filter_columns,
                    num_partitions=num_partitions,
                )
            # big parquet dim + non-parquet probe: footer-routed build,
            # Dataset-driven probe — still nothing key-sized on driver
            P = (
                num_partitions
                if num_partitions is not None
                else _num_partitions_for(est_ref_rows)
            )
            key_refs, blooms_ref = _dim_partitions_from_units(
                ref_files, ref_columns, P, est_ref_rows, bloom_fpp
            )
            return _dataset_probe_partitioned_bloom(
                probe, key_refs, blooms_ref, P, probe_columns, cap
            )
    elif ref_table is not None and (
        ref_files is None
        or sum(os.path.getsize(f) for f in ref_files) > small_dim_bytes
    ):
        # NON-parquet dim (CSV/JSONL) too big to assume small: execute
        # the dim Dataset once into object-store blocks and partition
        # the key hashes distributedly — the driver never materializes
        # a key array (round-3 finding: this path used to argsort the
        # full distinct key set on the driver)
        built = _dim_partitions_from_dataset(
            ref_table, ref_columns, bloom_fpp, bloom_threshold
        )
        if built is not None:
            key_refs, blooms_ref, P = built
            if probe_parquet:
                return _probe_partitioned_units(
                    probe_files, probe_columns, key_refs, blooms_ref, P,
                    cap=cap, filter_expr=filter_expr,
                    filter_columns=filter_columns,
                )
            return _dataset_probe_partitioned_bloom(
                probe, key_refs, blooms_ref, P, probe_columns, cap
            )

    # exact broadcast path: small dim
    if ref_files is not None and ref_parquet and (
        sum(os.path.getsize(f) for f in ref_files) <= small_dim_bytes
    ):
        keys = _distinct_key_hashes_local(ref_files, ref_columns)
    else:
        keys = _distinct_key_hashes(ref_table, ref_columns)
    broadcast = ray.put(np.sort(keys))

    if probe_parquet:
        # fused raw-task probe: one wave of read+probe chunks
        import pickle as _pickle

        from ..shuffle import _scan_units

        expr_pickle = _pickle.dumps(filter_expr) if filter_expr is not None else None
        read_cols = sorted(set(probe_columns) | (filter_columns or set()))
        task = ray.remote(_probe_unit)
        rows = ray.get(
            [
                task.remote(unit, probe_columns, read_cols, expr_pickle, broadcast, cap)
                for unit in _scan_units(probe_files)
            ]
        )
        rows = [r.iloc[0] for r in rows if len(r)]
    elif len(keys) < 1_000_000:
        # small keyset: stateless tasks (instance) beat actor-pool spin-up;
        # the sorted array still ships once via the object store
        out = probe.map_batches(
            _ProbeActor(broadcast, probe_columns, probe_columns, cap),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        rows = out.take_all()
    else:
        out = probe.map_batches(
            _ProbeActor,
            fn_constructor_args=(broadcast, probe_columns, probe_columns, cap),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
        )
        rows = out.take_all()
    metrics = ReferentialMetrics(violations=[])
    for row in rows:
        metrics.probed_rows += int(row["probed"])
        metrics.orphan_rows += int(row["orphans"])
        for s in json.loads(row["sample"]):
            if len(metrics.violations) < cap:
                metrics.violations.append(
                    {"key": s, "side": "probe", "detail": json.dumps({"reason": "orphan_key"})}
                )
    return metrics
