"""Resumable partitioned Parquet sink for dataset-scale outputs.

The validation suite checkpoints per-bucket results; this module gives
PIPELINE outputs (a cleaned corpus, a deduplicated shard set, extracted
features) the same property: partitioned Parquet — one file per
deterministic input scan unit, never one giant file — where a failed or
killed run skips finished partitions on re-run and recomputes only the
missing ones.

Exactly-once per partition comes from the write protocol: data is
written to a hidden ``.part-<i>.tmp`` then ``os.replace``d into place,
and the ``part-<i>._SUCCESS`` marker (which also records the row count)
is written only after the data rename — a crash between the two leaves
a data file without a marker, which a resume treats as unfinished and
rewrites through the same tmp+rename path.

Partition identity is the repo's deterministic scan-unit packing
(``shuffle._scan_units``: (file, row-group-range) fragments packed to a
byte target), pinned by a ``lineage.json`` so a resume against changed
inputs or a different packing fails loudly instead of mixing layouts.

This sink uses raw Ray tasks (one per unit) rather than
``Dataset.write_parquet`` — the Dataset API cannot express
skip-finished-partition resume, which is the entire point here; the
per-unit task is still a streaming read→transform→write with nothing
driver-side but markers.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from .io import list_parquet_files
from .shuffle import _scan_units, read_unit


def _marker(out_dir: str, idx: int) -> str:
    return os.path.join(out_dir, f"part-{idx:05d}._SUCCESS")


def _data(out_dir: str, idx: int) -> str:
    return os.path.join(out_dir, f"part-{idx:05d}.parquet")


@ray.remote
def _write_unit(
    unit: list,
    columns: list[str] | None,
    batch_fn: Callable[[pa.Table], pa.Table] | None,
    out_dir: str,
    idx: int,
) -> int:
    t = read_unit(unit, columns)
    if batch_fn is not None:
        t = batch_fn(t)
    tmp = os.path.join(out_dir, f".part-{idx:05d}.tmp")
    pq.write_table(t, tmp)
    os.replace(tmp, _data(out_dir, idx))
    with open(_marker(out_dir, idx), "w") as fh:
        json.dump({"rows": t.num_rows}, fh)
    return t.num_rows


def write_partitioned_resumable(
    path_in: str,
    out_dir: str,
    batch_fn: Callable[[pa.Table], pa.Table] | None = None,
    columns: list[str] | None = None,
    target_bytes: int = 96 << 20,
) -> dict:
    """Transform ``path_in`` unit-by-unit into ``out_dir`` with
    skip-finished-partition resume. Returns
    ``{partitions, written, skipped, rows}``."""
    files = list_parquet_files(path_in)
    units = _scan_units(files, target_bytes)
    os.makedirs(out_dir, exist_ok=True)

    lineage = {
        "files": sorted(os.path.basename(f) for f in files),
        "num_partitions": len(units),
        "target_bytes": target_bytes,
        "columns": columns,
    }
    lpath = os.path.join(out_dir, "lineage.json")
    if os.path.exists(lpath):
        with open(lpath) as fh:
            prev = json.load(fh)
        if prev != lineage:
            raise ValueError(
                f"resume lineage mismatch in {out_dir}: inputs or "
                f"partitioning changed (have {prev}, want {lineage}); "
                "write to a fresh out_dir"
            )
    else:
        with open(lpath, "w") as fh:
            json.dump(lineage, fh)

    futures = []
    skipped = 0
    rows = 0
    for i, unit in enumerate(units):
        m = _marker(out_dir, i)
        if os.path.exists(m) and os.path.exists(_data(out_dir, i)):
            with open(m) as fh:
                rows += int(json.load(fh)["rows"])
            skipped += 1
            continue
        futures.append(_write_unit.remote(unit, columns, batch_fn, out_dir, i))
    rows += sum(ray.get(futures))
    return {
        "partitions": len(units),
        "written": len(futures),
        "skipped": skipped,
        "rows": rows,
    }
