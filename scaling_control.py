#!/usr/bin/env python
"""IO-free scaling control for the north rule's efficiency criterion.

Isolates ENGINE parallel scaling (explicit hash shuffle + per-bucket
vectorized verification) from the single VM's parquet-decode /
memory-bandwidth ceiling: the input is a pre-materialized in-object-store
dataset of fixed-width projected rows (exactly what the keyed pass ships
through its exchange), so the timed region contains no file IO and no
string hashing — only the shuffle and the bucket checks.

Usage:
  python scaling_control.py            # both legs (SCALING_CPUS, default 2,8)
  python scaling_control.py --leg N    # one leg in this process (internal)

Prints one JSON line per invocation.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BLOCKS = int(os.environ.get("CONTROL_BLOCKS", "48"))
ROWS_PER_BLOCK = int(os.environ.get("CONTROL_ROWS", "1000000"))
NUM_BUCKETS = int(os.environ.get("CONTROL_BUCKETS", "32"))


def _make_block(batch):
    """Deterministic fixed-width projected rows (same shape the keyed
    pass shuffles): key hash, row hash, side, shard, bucket, key col."""
    import numpy as np
    import pyarrow as pa

    i = int(batch["id"][0])
    n = ROWS_PER_BLOCK
    base = np.arange(i * n, (i + 1) * n, dtype=np.uint64)
    kh = base * np.uint64(0x9E3779B97F4A7C15) + np.uint64(12345)
    return pa.table(
        {
            "k": pa.array(base.view(np.int64)),
            "__kh": pa.array(kh),
            "__rh": pa.array(kh * np.uint64(3) + np.uint64(7)),
            "__side": pa.array(np.zeros(n, dtype=np.int8)),
            "__shard": pa.array(np.zeros(n, dtype=np.int64)),
            "__bucket": pa.array(
                (kh % np.uint64(NUM_BUCKETS)).astype(np.int32)
            ),
        }
    )


def run_leg(ncpu: int) -> dict:
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=ncpu,
        include_dashboard=False,
        logging_level="ERROR",
    )
    DataContext.get_current().enable_progress_bars = False

    import ray.data

    from datapact_ray.shuffle import bucket_shuffle
    from datapact_ray.stages.keyed import KeyedSpec, _BucketChecker

    ds = ray.data.range(BLOCKS, override_num_blocks=BLOCKS).map_batches(
        _make_block, batch_format="numpy", batch_size=None
    )
    ds = ds.materialize()  # generation is UNTIMED; input sits in the store

    spec = KeyedSpec(
        key_columns=["k"], uniqueness=True, num_buckets=NUM_BUCKETS
    )
    checker = _BucketChecker(spec, "control")
    t0 = time.perf_counter()
    blobs = bucket_shuffle([ds], NUM_BUCKETS, checker)
    wall = time.perf_counter() - t0

    import pickle

    rows = sum(pickle.loads(b).uniq_count[0] for b in blobs)
    ray.shutdown()
    assert rows == BLOCKS * ROWS_PER_BLOCK, (rows, BLOCKS * ROWS_PER_BLOCK)
    return {"num_cpus": ncpu, "sec": round(wall, 3), "rows": rows,
            "rows_per_sec": round(rows / wall, 1)}


def main() -> None:
    if "--leg" in sys.argv:
        ncpu = int(sys.argv[sys.argv.index("--leg") + 1])
        print(json.dumps(run_leg(ncpu)))
        return
    n_lo, n_hi = (
        int(x) for x in os.environ.get("SCALING_CPUS", "2,8").split(",")
    )

    def leg(ncpu: int) -> dict:
        def once() -> dict:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--leg", str(ncpu)],
                capture_output=True, text=True, check=True,
                env=dict(os.environ, PYTHONPATH=REPO),
            ).stdout
            return json.loads(out.strip().splitlines()[-1])

        a, b = once(), once()  # best-of-2: shared-VM noise
        return a if a["sec"] <= b["sec"] else b

    lo, hi = leg(n_lo), leg(n_hi)
    eff = (hi["rows_per_sec"] / lo["rows_per_sec"]) / (n_hi / n_lo)
    print(json.dumps({
        "metric": "control_scaling_efficiency",
        "workload": "in-memory fixed-width bucket shuffle + verify (no file IO)",
        "cpus": [n_lo, n_hi],
        f"sec_{n_lo}": lo["sec"],
        f"sec_{n_hi}": hi["sec"],
        f"rows_per_sec_{n_lo}": lo["rows_per_sec"],
        f"rows_per_sec_{n_hi}": hi["rows_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "rows": lo["rows"],
    }))


if __name__ == "__main__":
    main()
