"""Parquet source helpers: pruned, filter-pushed, deterministic reads.

Mirrors the reference's source model (a named table scanned once per task,
``validation.sql.j2:127-187``) with Ray Data: one ``read_parquet`` per
side feeding fused downstream stages; only needed columns leave storage;
simple predicates push down to Parquet row groups via Arrow dataset
expressions.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from .expr import compile_filter, parse_filter, referenced_columns


def _stub_fsspec_http() -> None:
    """Make ``fsspec.implementations.http`` import deterministic.

    That module needs aiohttp (absent here); Ray's path resolution
    re-imports it on every ``read_parquet`` and only catches
    ModuleNotFoundError — under concurrent dataset construction the
    failed-import race surfaces as a plain ImportError instead. Register
    a sentinel module once so every import succeeds and the isinstance
    check it feeds is trivially False.
    """
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except Exception:
        import sys
        import types

        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # sentinel: nothing is ever an instance
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod


_stub_fsspec_http()


_FORMATS = (".parquet", ".csv", ".json", ".jsonl", ".ndjson")


def list_parquet_files(path: str) -> list[str]:
    """Deterministic (sorted) list of data files under a path.

    Determinism matters for resumable partitioning: the lineage manifest
    records this list, and resumes must see the same order.
    """
    if os.path.isfile(path):
        return [path]
    out: list[str] = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(_FORMATS):
                out.append(os.path.join(root, f))
    if not out:
        # a missing input must FAIL, not validate zero rows: a silent
        # empty file list makes every downstream check vacuously green
        raise FileNotFoundError(f"No data files under {path}")
    return sorted(out)


def _detect_format(files: list[str]) -> str:
    name = files[0]
    if name.endswith(".csv"):
        return "csv"
    if name.endswith((".json", ".jsonl", ".ndjson")):
        return "json"
    return "parquet"


def table_schema(path: str) -> pa.Schema:
    files = list_parquet_files(path)
    if not files:
        raise FileNotFoundError(f"No data files under {path}")
    fmt = _detect_format(files)
    if fmt == "parquet":
        return pq.read_schema(files[0])
    if fmt == "csv":
        import pyarrow.csv as pcsv

        with pcsv.open_csv(files[0]) as reader:
            return reader.schema
    import pyarrow.json as pjson

    # schema from the first file's parsed head (JSON has no footer)
    return pjson.read_json(
        files[0], read_options=pjson.ReadOptions(block_size=1 << 20)
    ).schema


def file_stats(files: list[str]) -> dict[str, list[int]]:
    """Cheap per-file fingerprints ``{path: [size, mtime_ns]}`` guarding
    incremental reuse against IN-PLACE rewrites: the reuse channels
    validate coverage by file path, and a compaction/re-export that
    rewrites a recorded file under its old name would otherwise be
    silently served from stale state. One os.stat per file — no footer
    read."""
    out: dict[str, list[int]] = {}
    for f in files:
        st = os.stat(f)
        out[f] = [st.st_size, st.st_mtime_ns]
    return out


def stats_match(
    recorded: dict | None, current: dict[str, list[int]], files
) -> bool:
    """Every reused ``files`` entry must carry the same fingerprint the
    prior run recorded (missing recorded stats → refuse: pre-upgrade
    runs cannot prove their files are unchanged)."""
    if not isinstance(recorded, dict):
        return False
    return all(recorded.get(f) == current.get(f) for f in files)


def count_rows(path: str) -> int:
    """Exact row count from parquet footers (no data read); falls back
    to a metadata-free estimate of 0 for csv/json (callers only use this
    for bucket sizing, where the cluster-CPU floor applies)."""
    files = list_parquet_files(path)
    if _detect_format(files) != "parquet":
        return 0
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def footer_nonnull_count(files: list[str], column: str):
    """Exact non-NULL row count of a column from parquet row-group
    footer statistics — no data read. Returns None when any row group
    lacks a null_count stat (caller falls back to a count scan)."""
    total = 0
    for f in files:
        meta = pq.ParquetFile(f).metadata
        names = meta.schema.names
        if column not in names:
            return None
        ci = names.index(column)
        for rg in range(meta.num_row_groups):
            rgm = meta.row_group(rg)
            st = rgm.column(ci).statistics
            if st is None or st.null_count is None:
                return None
            total += rgm.num_rows - st.null_count
    return total


def footer_column_minmax(files: list[str], column: str):
    """Exact global (min, max) of a column from parquet row-group footer
    statistics — no data read. Returns None when any row group lacks
    min/max stats (caller falls back to a profile scan)."""
    lo = hi = None
    for f in files:
        meta = pq.ParquetFile(f).metadata
        names = meta.schema.names
        if column not in names:
            return None
        ci = names.index(column)
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                return None
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    return None if lo is None else (lo, hi)


def detect_hot_keys_from_footers(
    files: list[str], column: str, rows_threshold: int
) -> dict[str, int]:
    """Hot-key (skewed conversation) detection from parquet footers only.

    A conversation large enough to matter for shuffle skew spans whole
    row groups; clustered writers (including this engine's own outputs)
    then produce row groups whose min==max statistics pin the value.
    Summing ``num_rows`` over such row groups finds every conversation
    bigger than ~2 row groups without reading any data — so the keyed
    pass needs no profile scan before it can salt. Conversations
    scattered randomly across row groups are not detected, but scattered
    layout also means no row-group-level skew to mitigate; the profile
    pass's heavy-hitter sketch remains the fallback for non-parquet
    sources.
    """
    counts: dict[str, int] = {}
    for f in files:
        meta = pq.ParquetFile(f).metadata
        schema_names = meta.schema.names
        if column not in schema_names:
            continue
        ci = schema_names.index(column)
        for rg in range(meta.num_row_groups):
            col = meta.row_group(rg).column(ci)
            stats = col.statistics
            if stats is None or not stats.has_min_max:
                continue
            if stats.min == stats.max:
                key = stats.min
                if isinstance(key, bytes):
                    key = key.decode("utf-8", "replace")
                counts[key] = counts.get(key, 0) + meta.row_group(rg).num_rows
    return {k: v for k, v in counts.items() if v >= rows_threshold}


def read_table(
    path: str,
    columns: list[str] | None = None,
    filter_sql: str | None = None,
    files: list[str] | None = None,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """Read a logical table as a Ray Dataset with column pruning and
    filter pushdown.

    Parquet (default), CSV and JSON(L) inputs are supported by file
    extension. ``columns=None`` reads everything; ``filter_sql`` is the
    engine's SQL-subset predicate (see ``expr.py``) — pushed down to
    Parquet row groups, applied as a vectorized post-read filter for
    CSV/JSON; ``files`` restricts the read to a subset of the table's
    files (resume / shard scoping).
    """
    all_files = list_parquet_files(path)
    paths = files if files is not None else path
    fmt = _detect_format(all_files)
    schema = table_schema(path)
    expr = None
    if filter_sql:
        ast = parse_filter(filter_sql)
        expr = compile_filter(filter_sql, schema)
        if columns is not None:
            needed = referenced_columns(ast)
            columns = list(
                dict.fromkeys(
                    list(columns) + [c for c in needed if c in schema.names]
                )
            )
    if fmt == "parquet":
        kwargs = {}
        # Explicit metadata-free schema: files written by pandas carry a
        # b'pandas' schema-metadata blob that makes hash(pa.Schema) raise
        # (unhashable dict), defeating Ray Data's schema-dedup fast path
        # and spamming "Failed to hash the schemas" from every read task.
        # Overriding the schema at the read (pruned to the projection)
        # keeps every downstream block metadata-free with no extra stage.
        sel = columns if columns is not None else list(schema.names)
        kwargs["schema"] = pa.schema(
            [schema.field(c) for c in sel]
        ).remove_metadata()
        if columns is not None:
            kwargs["columns"] = columns
        if expr is not None:
            kwargs["filter"] = expr
        if override_num_blocks is not None:
            # downstream-work-aware splitting: a single-row-group file
            # otherwise yields ONE block, serializing any expensive
            # fused per-row stage behind it (see payload_read_blocks)
            kwargs["override_num_blocks"] = override_num_blocks
        return ray.data.read_parquet(paths, **kwargs)
    ds = (
        ray.data.read_csv(paths) if fmt == "csv" else ray.data.read_json(paths)
    )
    if expr is not None:
        ds = ds.map_batches(
            lambda t, e=expr: t.filter(e), batch_format="pyarrow"
        )
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds
