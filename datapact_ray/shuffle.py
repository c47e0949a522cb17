"""Explicit two-phase hash shuffle for bucketed verification passes.

Ray Data's ``groupby`` uses a sort-based shuffle: at 1M+ rows the global
sort dominated the keyed pass (~8.5s of 8.8s, flat from 8→32 CPUs). The
bucketed passes don't need a sort — the partition id (``__bucket``) is
already computed in the pre-shuffle projection — so this module shuffles
explicitly with raw Ray tasks (SURVEY.md guidance: drop to Ray core only
where the Dataset API can't express the semantics efficiently):

* **map phase** — per projected block, one task splits rows by bucket id
  (one vectorized take per block) and returns ``num_buckets`` sub-tables
  straight into the object store;
* **reduce phase** — one task per bucket fetches its shards from every
  map output, concatenates, and runs the verification callable.

The exchange is all-to-all through the object store with no sort, no
sample stage and no barriers beyond the natural shard dependencies; on a
multi-node cluster the same code moves shards over the network. Skew is
bounded by construction: bucket ids are a uniform hash of the
(composite/salted) key.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _split_by_bucket(table: pa.Table, num_buckets: int) -> list[pa.Table]:
    """Split one block into per-bucket sub-tables (vectorized sort+slice)."""
    if table is None:  # empty producer in a ref-chained exchange
        return [None] * num_buckets
    if isinstance(table, pd.DataFrame):  # block from a pandas producer
        table = pa.Table.from_pandas(table, preserve_index=False)
    if table.num_rows == 0:
        return [table.slice(0, 0)] * num_buckets
    buckets = table.column("__bucket").to_numpy(zero_copy_only=False)
    order = np.argsort(buckets, kind="stable")
    sorted_buckets = buckets[order]
    bounds = np.searchsorted(sorted_buckets, np.arange(num_buckets + 1))
    indices = pa.array(order)
    taken = table.take(indices)
    return [
        taken.slice(bounds[b], bounds[b + 1] - bounds[b])
        for b in range(num_buckets)
    ]


def _flatten_shards(shards) -> list:
    """Unwrap Ray's num_returns=1 semantics: with a single bucket, the
    map task's one-element LIST of tables arrives as the return value
    itself, so a shard may be a list rather than a table."""
    out = []
    for s in shards:
        if isinstance(s, list):
            out.extend(s)
        else:
            out.append(s)
    return out


def _checker_blob(out) -> bytes | None:
    """Extract the pickled metrics blob from a checker result — either
    the legacy 1-row frame contract or the dict contract ``{"blob":
    bytes, ...}`` used by checkers with side outputs."""
    if out is None or len(out) == 0:
        return None
    if isinstance(out, dict):
        return out["blob"]
    return out["blob"].iloc[0]


def _reduce_bucket(checker_fn: Callable, *shards: pa.Table) -> bytes | None:
    """Concatenate a bucket's shards (staying Arrow — the checker only
    converts fixed-width helper columns) and run the verification
    callable. Returns the pickled metrics blob (None for empty)."""
    shards = _flatten_shards(shards)
    tables = [s for s in shards if s is not None and s.num_rows]
    if not tables:
        return None
    return _checker_blob(checker_fn(pa.concat_tables(tables)))


def _reduce_bucket_dual(checker_fn: Callable, *shards: pa.Table):
    """Like :func:`_reduce_bucket` but with ``num_returns=2``: returns
    ``(blob, side_table)``. The checker must use the dict contract
    ``{"blob": bytes, "convfp": pa.Table | None}``. Ray stores the two
    returns as SEPARATE objects, so the driver can ``ray.get`` the small
    blob while the (possibly large) side table stays object-store-
    resident behind its own ObjectRef."""
    shards = _flatten_shards(shards)
    tables = [s for s in shards if s is not None and s.num_rows]
    if not tables:
        return None, None
    out = checker_fn(pa.concat_tables(tables))
    if out is None or len(out) == 0:
        return None, None
    return out["blob"], out.get("convfp")


def _reduce_bucket_table(checker_fn: Callable, bucket_idx: int, *shards):
    """Reduce a bucket's shards with ``checker_fn(table, bucket_idx)``
    and return the output frame ITSELF — it stays in the object store as
    the task's return; the driver only ever holds the ObjectRef. None
    for an empty bucket."""
    shards = _flatten_shards(shards)
    tables = [s for s in shards if s is not None and s.num_rows]
    if not tables:
        return None
    out = checker_fn(pa.concat_tables(tables), bucket_idx)
    if out is None or len(out) == 0:
        return None
    return out


def _scan_units(files: list[str], target_bytes: int = 96 << 20) -> list[list[tuple]]:
    """Deterministic map-task units: each unit is a list of
    ``(file, [row_group_ids])`` fragments packed to ~target_bytes
    compressed — big files split by row group so single-file tables still
    fan out, small files MERGE into one unit so the map-task count (and
    with it the M×B shuffle-object count) doesn't scale with file count."""
    import pyarrow.parquet as pq

    units: list[list[tuple]] = []
    cur: list[tuple] = []
    cur_size = 0

    def flush():
        nonlocal cur, cur_size
        if cur:
            units.append(cur)
            cur, cur_size = [], 0

    for f in sorted(files):
        meta = pq.ParquetFile(f).metadata
        groups: list[int] = []
        for rg in range(meta.num_row_groups):
            groups.append(rg)
            # COMPRESSED bytes, to match the on-disk-derived target:
            # total_byte_size is uncompressed, which at a typical 3x
            # snappy ratio flushed units 3x early and tripled the map
            # fan-out (and with it the M×B shuffle-object count)
            rg_meta = meta.row_group(rg)
            cur_size += sum(
                rg_meta.column(c).total_compressed_size
                for c in range(rg_meta.num_columns)
            )
            if cur_size >= target_bytes:
                cur.append((f, groups))
                groups = []
                flush()
        if groups:
            cur.append((f, groups))
    flush()
    return units


def read_unit(unit: list[tuple], columns: list[str] | None) -> pa.Table:
    """Read one scan unit (list of ``(file, [row_group_ids])`` fragments)
    as a single Arrow table."""
    import pyarrow.parquet as pq

    pieces = [
        pq.ParquetFile(path).read_row_groups(row_groups, columns=columns)
        for path, row_groups in unit
    ]
    return pieces[0] if len(pieces) == 1 else pa.concat_tables(pieces)


def _shuffle_target_bytes(files_per_side: list[list[str]]) -> int:
    """Size map units so the map wave is ~3 tasks per core across all
    sides (bounded to [8 MB, 256 MB] compressed). The upper bound keeps
    the M×B shuffle-object count — the exchange's serial cost — from
    scaling with file count; the lower bound only guards against
    pathological tiny-task floods (a 64 MB floor measured 2× worse: it
    capped a 695 MB input at 11 map tasks on 32 cores, starving the
    decompress+hash wave that dominates wall time)."""
    import os

    total = sum(
        os.path.getsize(f) for files in files_per_side for f in files
    )
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return int(min(256 << 20, max(8 << 20, total // max(1, 3 * cpus))))


def _map_project_split(
    unit: list[tuple],
    columns: list[str] | None,
    filter_expr_pickle: bytes | None,
    projector,
    num_buckets: int,
) -> list[pa.Table]:
    """Fused map task: read the unit's file fragments → project → split
    by bucket.

    One task does the whole map side for its fragments — no intermediate
    materialization barrier between read, hash projection and shard
    emission."""
    import pickle

    table = read_unit(unit, columns)
    if filter_expr_pickle is not None:
        table = table.filter(pickle.loads(filter_expr_pickle))
    projected = projector(table)
    return _split_by_bucket(projected, num_buckets)


def _partial_unit(unit, columns, expr_pickle, fn) -> pd.DataFrame:
    import pickle

    table = read_unit(unit, columns)
    if expr_pickle is not None:
        table = table.filter(pickle.loads(expr_pickle))
    return fn(table)


def map_partials(
    path: str,
    columns: list[str] | None,
    filter_sql: str | None,
    fn: Callable[[pa.Table], pd.DataFrame],
) -> pd.DataFrame:
    """Partial-aggregate a table with ONE wave of raw Ray tasks over
    file/row-group scan units and concatenate the partial frames on the
    driver — the shuffle-free analog of the fused bucket exchange.

    For partial-merge aggregations the Ray Data pipeline
    (read_parquet → map_batches → to_pandas) pays a fixed per-execution
    planning + block-materialization cost that dominates sub-second
    queries and measured ~1.6× even on the scan-bound lineitem rollup;
    this path is the same fused shape the keyed/profile passes already
    use. Non-parquet inputs fall back to the streaming Dataset path."""
    import pickle

    from .expr import compile_to_arrow, parse_filter
    from .io import list_parquet_files, read_table

    files = list_parquet_files(path)
    if any(not f.endswith(".parquet") for f in files):
        ds = read_table(path, columns=columns, filter_sql=filter_sql)
        return ds.map_batches(
            fn, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()
    expr = None
    if filter_sql:
        from .expr import referenced_columns

        ast = parse_filter(filter_sql)
        expr = compile_to_arrow(ast)
        if columns is not None:
            # the in-task filter needs its columns present even when the
            # caller's projection doesn't include them
            columns = list(
                dict.fromkeys(columns + sorted(referenced_columns(ast)))
            )
    expr_pickle = pickle.dumps(expr) if expr is not None else None
    fn_ref = ray.put(fn)
    task = ray.remote(_partial_unit)
    refs = [
        task.remote(unit, columns, expr_pickle, fn_ref)
        for unit in _scan_units(files, _shuffle_target_bytes([files]))
    ]
    frames = [f for f in ray.get(refs) if f is not None]
    non_empty = [f for f in frames if len(f)]
    if non_empty:
        return pd.concat(non_empty, ignore_index=True)
    # keep the (typed, named) empty frame so downstream groupbys work
    if frames:
        return frames[0]
    # ZERO scan units (a valid 0-row input): run fn once on a
    # schema-typed empty batch so the caller still sees its partial
    # columns instead of a column-less frame
    import pyarrow.parquet as _pq

    schema = _pq.read_schema(files[0])
    if columns is not None:
        schema = pa.schema(
            [schema.field(c) for c in columns if c in schema.names]
        )
    out = fn(schema.empty_table())
    return out if out is not None else pd.DataFrame()


def parquet_bucket_shuffle(
    sides: list[tuple],  # (files, projector) or (files, projector, cols, expr)
    columns: list[str] | None,
    filter_expr,
    num_buckets: int,
    checker_fn: Callable[[pd.DataFrame], pd.DataFrame],
    prior_shards: list | None = None,
) -> list[bytes]:
    """Fully-explicit shuffle over parquet inputs: fused
    read+project+split map tasks at file/row-group granularity, then one
    reduce per bucket. Used by the keyed pass when the inputs are
    parquet; other formats go through :func:`bucket_shuffle`.

    Each side is ``(files, projector)`` — reading the shared ``columns``
    under the shared ``filter_expr`` — or a 4-tuple ``(files, projector,
    side_columns, side_filter_expr)`` for multi-table exchanges whose
    sides project different schemas."""
    map_task = ray.remote(num_returns=num_buckets)(_map_project_split)
    reduce_task = ray.remote(_reduce_bucket)
    checker_ref = ray.put(checker_fn)

    import os as _os
    import sys as _sys
    import time as _time

    _timing = _os.environ.get("DATAPACT_TIMING")
    _t0 = _time.perf_counter()

    shard_lists = _submit_parquet_shards(
        sides, columns, filter_expr, num_buckets, map_task
    )
    if prior_shards is not None:
        # one extra shard side: a prior run's persisted bucket inputs
        # (incremental reuse — entries are refs or None)
        shard_lists.append(prior_shards)

    _t_submit_maps = _time.perf_counter()

    blobs = []
    for b in range(num_buckets):
        blobs.append(
            reduce_task.remote(checker_ref, *[shards[b] for shards in shard_lists])
        )
    _t_submit_reduces = _time.perf_counter()
    out = ray.get(blobs)
    if _timing:
        print(
            f"[timing] pq_shuffle sides={len(shard_lists)} buckets="
            f"{num_buckets}: submit_maps {_t_submit_maps - _t0:.2f}s"
            f" submit_reduces {_t_submit_reduces - _t_submit_maps:.2f}s"
            f" exec {_time.perf_counter() - _t_submit_reduces:.2f}s",
            file=_sys.stderr, flush=True,
        )
    return [blob for blob in out if blob is not None]


def parquet_bucket_shuffle_refs(
    sides: list[tuple],
    columns: list[str] | None,
    filter_expr,
    num_buckets: int,
    checker_fn: Callable,
) -> list:
    """Like :func:`parquet_bucket_shuffle`, but the reduce output stays
    OBJECT-STORE-RESIDENT: returns one ObjectRef per bucket (resolving
    to a frame, or None for an empty bucket) — the driver never holds
    the data. ``checker_fn(table, bucket_idx)`` may use the bucket index
    for resumable per-bucket side outputs."""
    map_task = ray.remote(num_returns=num_buckets)(_map_project_split)
    reduce_task = ray.remote(_reduce_bucket_table)
    checker_ref = ray.put(checker_fn)
    shard_lists = _submit_parquet_shards(
        sides, columns, filter_expr, num_buckets, map_task
    )
    return [
        reduce_task.remote(checker_ref, b, *[shards[b] for shards in shard_lists])
        for b in range(num_buckets)
    ]


def _submit_parquet_shards(
    sides: list[tuple],
    columns: list[str] | None,
    filter_expr,
    num_buckets: int,
    map_task,
) -> list:
    """Submit the fused read+project+split map wave for every side;
    returns one per-bucket shard list per scan unit."""
    import pickle

    target_bytes = _shuffle_target_bytes([side[0] for side in sides])
    shard_lists: list = []
    for side in sides:
        if len(side) == 2:
            files, projector = side
            s_cols, s_expr = columns, filter_expr
        else:
            files, projector, s_cols, s_expr = side
        expr_pickle = pickle.dumps(s_expr) if s_expr is not None else None
        proj_ref = ray.put(projector)
        for unit in _scan_units(files, target_bytes):
            result = map_task.remote(
                unit, s_cols, expr_pickle, proj_ref, num_buckets
            )
            if num_buckets == 1:
                result = [result]
            shard_lists.append(result)
    return shard_lists


def parquet_bucket_shuffle_dual(
    sides: list[tuple],
    columns: list[str] | None,
    filter_expr,
    num_buckets: int,
    checker_fn: Callable,
    prior_shards: list | None = None,
) -> tuple[list[bytes], list]:
    """Parquet exchange whose reduce has TWO outputs per bucket: the
    pickled metrics blob (fetched to the driver — small) and a side
    table that stays OBJECT-STORE-RESIDENT as its own ObjectRef (the
    conversation-fingerprint rows feeding the chained dedup exchange).
    Returns ``(blobs, side_refs)``; empty buckets contribute to
    neither."""
    map_task = ray.remote(num_returns=num_buckets)(_map_project_split)
    reduce_task = ray.remote(num_returns=2)(_reduce_bucket_dual)
    checker_ref = ray.put(checker_fn)
    shard_lists = _submit_parquet_shards(
        sides, columns, filter_expr, num_buckets, map_task
    )
    if prior_shards is not None:
        shard_lists.append(prior_shards)
    blob_refs, side_refs = [], []
    for b in range(num_buckets):
        blob_ref, side_ref = reduce_task.remote(
            checker_ref, *[shards[b] for shards in shard_lists]
        )
        blob_refs.append(blob_ref)
        side_refs.append(side_ref)
    blobs = [blob for blob in ray.get(blob_refs) if blob is not None]
    return blobs, side_refs


def _submit_block_shards(parts: list[ray.data.Dataset], num_buckets: int) -> list:
    """Materialize the projected datasets' blocks (concurrently — each
    ``arrow_block_refs`` is a blocking Ray Data execution) and submit one
    split task per block; returns per-block per-bucket shard lists."""
    split_task = ray.remote(num_returns=num_buckets)(_split_by_bucket)
    if len(parts) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(parts)) as pool:
            ref_lists = list(pool.map(arrow_block_refs, parts))
    else:
        ref_lists = [arrow_block_refs(parts[0])]
    shard_lists: list = []
    for block_refs in ref_lists:
        for block_ref in block_refs:
            result = split_task.remote(block_ref, num_buckets)
            if num_buckets == 1:
                result = [result]
            shard_lists.append(result)
    return shard_lists


def bucket_shuffle_dual(
    parts: list[ray.data.Dataset], num_buckets: int, checker_fn: Callable
) -> tuple[list[bytes], list]:
    """Dataset-input variant of :func:`parquet_bucket_shuffle_dual` (the
    CSV/JSONL path): projected blocks through the explicit exchange,
    dual-output reduces."""
    reduce_task = ray.remote(num_returns=2)(_reduce_bucket_dual)
    checker_ref = ray.put(checker_fn)
    shard_lists = _submit_block_shards(parts, num_buckets)
    blob_refs, side_refs = [], []
    for b in range(num_buckets):
        blob_ref, side_ref = reduce_task.remote(
            checker_ref, *[shards[b] for shards in shard_lists]
        )
        blob_refs.append(blob_ref)
        side_refs.append(side_ref)
    blobs = [blob for blob in ray.get(blob_refs) if blob is not None]
    return blobs, side_refs


def ref_bucket_shuffle_refs(
    block_refs: list, num_buckets: int, checker_fn: Callable
) -> list:
    """Shuffle object-store-resident frames (each carrying ``__bucket``)
    into a new bucketing and reduce — both input and output stay as
    ObjectRefs; the driver moves only refs. The building block for
    multi-round distributed state (dedup connected components)."""
    split_task = ray.remote(num_returns=num_buckets)(_split_by_bucket)
    reduce_task = ray.remote(_reduce_bucket_table)
    checker_ref = ray.put(checker_fn)
    shard_lists = []
    for r in block_refs:
        result = split_task.remote(r, num_buckets)
        if num_buckets == 1:
            result = [result]
        shard_lists.append(result)
    return [
        reduce_task.remote(checker_ref, b, *[shards[b] for shards in shard_lists])
        for b in range(num_buckets)
    ]


def arrow_block_refs(ds: ray.data.Dataset) -> list:
    """Execute the dataset and collect its block ObjectRefs directly from
    the internal ref bundles.

    ``Dataset.to_arrow_refs()`` in Ray 2.49 calls
    ``self.schema(fetch_if_missing=True)`` AFTER consuming the ref
    bundles; post-consumption the schema is no longer cached, so that
    call re-plans and re-executes the ENTIRE upstream pipeline under a
    ``limit=1`` (including actor-pool spin-up) — every shuffle paid the
    pipeline twice. All callers here feed blocks produced by
    ``batch_format="pyarrow"`` stages, so the blocks are Arrow tables
    already and the schema probe (which only guards a pandas->Arrow
    conversion path) is dead weight we skip."""
    refs: list = []
    for bundle in ds.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)
    return refs


def bucket_shuffle(
    parts: list[ray.data.Dataset],
    num_buckets: int,
    checker_fn: Callable[[pd.DataFrame], pd.DataFrame],
) -> list[bytes]:
    """Run projected datasets through the explicit shuffle; returns the
    non-empty buckets' metric blobs.

    ``parts`` must already carry an int ``__bucket`` column in
    ``[0, num_buckets)``. The projected blocks are materialized into the
    object store (they are the compact hash/key representation, a small
    fraction of the raw input) and never touch the driver.
    """
    reduce_task = ray.remote(_reduce_bucket)
    checker_ref = ray.put(checker_fn)
    shard_lists = _submit_block_shards(parts, num_buckets)
    blobs = []
    for b in range(num_buckets):
        blobs.append(
            reduce_task.remote(checker_ref, *[shards[b] for shards in shard_lists])
        )
    return [blob for blob in ray.get(blobs) if blob is not None]
