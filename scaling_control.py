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


def _spin_worker(q) -> None:
    import time

    import numpy as np

    buf = np.arange(65536, dtype=np.uint64)  # 512 KB, cache-resident
    tmp = np.empty_like(buf)
    c, s = np.uint64(0x9E3779B97F4A7C15), np.uint64(29)
    t0 = time.perf_counter()
    it = 0
    while time.perf_counter() - t0 < 6.0:
        np.multiply(buf, c, out=buf)
        np.right_shift(buf, s, out=tmp)
        np.bitwise_xor(buf, tmp, out=buf)
        it += 1
    q.put(it)


def run_spin() -> None:
    """--spin: host-capability ceiling probe. Strictly in-place, cache-
    resident hash loops in N independent processes — zero engine code,
    zero shared memory, zero allocation. Whatever efficiency THIS shows
    from N to 4N workers is the most any engine can show on this VM
    (measured ~0.75: the hypervisor grants ~24 effective cores for 32
    vCPUs)."""
    import multiprocessing as mp

    n_lo, n_hi = (
        int(x) for x in os.environ.get("SCALING_CPUS", "8,32").split(",")
    )

    def run(n: int) -> int:
        q = mp.Queue()
        ps = [mp.Process(target=_spin_worker, args=(q,)) for _ in range(n)]
        [p.start() for p in ps]
        tot = sum(q.get() for _ in ps)
        [p.join() for p in ps]
        return tot

    lo1, hi1, lo2, hi2 = run(n_lo), run(n_hi), run(n_lo), run(n_hi)
    lo, hi = max(lo1, lo2), max(hi1, hi2)
    print(json.dumps({
        "metric": "host_compute_ceiling",
        "workload": "in-place cache-resident hash loop, independent processes",
        "cpus": [n_lo, n_hi],
        f"iters_{n_lo}": [lo1, lo2],
        f"iters_{n_hi}": [hi1, hi2],
        "scaling_efficiency": round((hi / lo) / (n_hi / n_lo), 3),
    }))


def main() -> None:
    if "--spin" in sys.argv:
        run_spin()
        return
    if "--leg" in sys.argv:
        ncpu = int(sys.argv[sys.argv.index("--leg") + 1])
        print(json.dumps(run_leg(ncpu)))
        return
    n_lo, n_hi = (
        int(x) for x in os.environ.get("SCALING_CPUS", "2,8").split(",")
    )
    rounds = int(os.environ.get("SCALING_ROUNDS", "3"))

    def once(ncpu: int) -> dict:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--leg", str(ncpu)],
            capture_output=True, text=True, check=True,
            env=dict(os.environ, PYTHONPATH=REPO),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # INTERLEAVED rounds (lo,hi,lo,hi,...): this burstable VM's memory
    # subsystem stalls in multi-minute phases (50× wall swings measured
    # on a fixed numpy kernel) — sequential best-of-2 legs measure the
    # host's phase, not the engine; interleaving decorrelates the phase
    # from the CPU-count treatment and the median pairwise efficiency is
    # the reported statistic
    lo_secs, hi_secs, pair_effs, rows = [], [], [], None
    ratio = n_hi / n_lo
    for _ in range(rounds):
        lo = once(n_lo)
        hi = once(n_hi)
        rows = lo["rows"]
        lo_secs.append(lo["sec"])
        hi_secs.append(hi["sec"])
        pair_effs.append(round((lo["sec"] / hi["sec"]) / ratio, 3))
    med = sorted(pair_effs)[len(pair_effs) // 2]
    best = round((min(lo_secs) / min(hi_secs)) / ratio, 3)
    print(json.dumps({
        "metric": "control_scaling_efficiency",
        "workload": "in-memory fixed-width bucket shuffle + verify (no file IO)",
        "cpus": [n_lo, n_hi],
        "rounds": rounds,
        f"secs_{n_lo}": lo_secs,
        f"secs_{n_hi}": hi_secs,
        f"rows_per_sec_{n_lo}": round(rows / min(lo_secs), 1),
        f"rows_per_sec_{n_hi}": round(rows / min(hi_secs), 1),
        "pairwise_efficiencies": pair_effs,
        "scaling_efficiency": med,
        "scaling_efficiency_best_leg": best,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
