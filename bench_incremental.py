"""Incremental-validation evidence: measure the nightly-append cost
model end to end.

Builds a transcript pair (BASELINE.json `input_hint` schema) plus a
conversation dim, runs the full check suite (count, row-hash,
uniqueness, ordering, conv-dedup, sharded custom SQL, referential) as:

1. run 1 — full scan over the base files, persisting keyed inputs;
2. run 2 — `incremental_from=1` after an append of ``GROWTH`` new
   conversations (scans only the new files for every pass);
3. control — a full scan over the SAME grown input in a fresh results
   dir (what every nightly run would cost without the incremental
   machinery).

Prints one JSON line with the three wall times and the
control/incremental ratio. Verdicts of (2) and (3) are asserted equal
before anything is reported. Standalone script — owns its Ray session.

Usage: python bench_incremental.py  [env: INC_CONVS (base conversations,
default 250_000), INC_GROWTH (appended fraction, default 0.05),
RAY_GRAFT_CPUS (default 32)]
"""

import json
import os
import shutil
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

TURNS = 8


def _frame(lo: int, hi: int, seed: int) -> pd.DataFrame:
    n = (hi - lo) * TURNS
    conv = np.repeat(np.arange(lo, hi, dtype=np.int64), TURNS)
    turn = np.tile(np.arange(TURNS, dtype=np.int32), hi - lo)
    rng = np.random.default_rng(seed)
    salt = rng.integers(0, 1_000_000_000, n)
    conv_s = pd.Series(conv).astype(str).str.zfill(9)
    return pd.DataFrame(
        {
            "conv_id": "c" + conv_s,
            "turn_idx": turn,
            "role": np.where(turn % 2 == 0, "user", "assistant"),
            # realistic document-ish width: the incremental win comes
            # from NOT re-reading/hashing the wide text column — the
            # persisted projection is fixed-width hashes
            "text": (
                "t-" + conv_s + "-" + pd.Series(turn).astype(str)
                + "-" + pd.Series(salt).astype(str)
                + "-" + pd.Series(salt % 977).astype(str).str.zfill(3).str.repeat(
                    int(os.environ.get("INC_PAD", "80"))
                )
            ),
            "tool": pd.Series([None] * n, dtype="object"),
            "ts": (
                np.datetime64("2026-01-01", "us")
                + (conv * 3_600_000_000 + turn * 60_000_000).astype(
                    "timedelta64[us]"
                )
            ),
        }
    )


def _write(df: pd.DataFrame, path: str) -> None:
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)


def _task(src, tgt, dim):
    from datapact_ray.config import (
        ConvDedupCheck,
        CustomCheck,
        OrderingCheck,
        ReferentialCheck,
        ValidationTask,
    )

    return ValidationTask(
        task_key="nightly",
        source_path=src,
        target_path=tgt,
        primary_keys=["conv_id", "turn_idx"],
        count_tolerance=0.0,
        pk_row_hash_check=True,
        pk_hash_tolerance=0.0,
        hash_columns=["role", "text", "tool"],
        uniqueness_columns=["conv_id", "turn_idx"],
        uniqueness_tolerance=0.0,
        ordering=OrderingCheck(),
        conv_dedup=ConvDedupCheck(mode="exact", tolerance=0.0),
        custom_checks=[
            CustomCheck(
                name="turns per role",
                sql=(
                    "SELECT role, ROUND(AVG(turn_idx), 4) AS a, COUNT(*) AS n "
                    "FROM {{ table_fqn }} GROUP BY role"
                ),
            )
        ],
        referential=[
            ReferentialCheck(
                columns=["conv_id"], ref_path=dim, side="source"
            )
        ],
    )


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from datapact_ray.config import ValidationSuite
    from datapact_ray.runner import RunConfig, run_suite

    base = int(os.environ.get("INC_CONVS", "250000"))
    growth = float(os.environ.get("INC_GROWTH", "0.05"))
    new = int(base * growth)
    root = "/tmp/dp_inc_bench"
    shutil.rmtree(root, ignore_errors=True)
    src, tgt, dim = (os.path.join(root, d) for d in ("src", "tgt", "dim"))
    for d in (src, tgt, dim):
        os.makedirs(d)
    shards = 8
    step = -(-base // shards)
    for k in range(shards):
        df = _frame(k * step, min((k + 1) * step, base), seed=k)
        _write(df, os.path.join(src, f"part-{k:03d}.parquet"))
        if k == 1:  # one row-hash mismatch, present in every run
            df = df.copy()
            df.loc[5, "text"] = "corrupted"
        _write(df, os.path.join(tgt, f"part-{k:03d}.parquet"))
    _write(
        pd.DataFrame(
            {
                "conv_id": "c"
                + pd.Series(np.arange(base + new)).astype(str).str.zfill(9)
            }
        ),
        os.path.join(dim, "dim.parquet"),
    )

    def run(rdir, **cfg):
        suite = ValidationSuite(validations=[_task(src, tgt, dim)])
        t0 = time.time()
        s = run_suite(suite, RunConfig(results_dir=rdir, **cfg))
        return time.time() - t0, s

    rdir = os.path.join(root, "out")
    t_full_base, s1 = run(rdir, run_id=1, persist_keyed_inputs=True)

    # nightly append: `new` fresh conversations land on both sides
    df = _frame(base, base + new, seed=10_001)
    _write(df, os.path.join(src, "part-new.parquet"))
    _write(df, os.path.join(tgt, "part-new.parquet"))

    t_incremental, s2 = run(rdir, run_id=2, incremental_from=1)
    t_control, s3 = run(os.path.join(root, "out_full"), run_id=1)

    p2 = {k: v for k, v in s2.results[0].payload.items() if k != "run_duration"}
    p3 = {k: v for k, v in s3.results[0].payload.items() if k != "run_duration"}
    for k in p2:
        if isinstance(p2[k], dict):
            p2[k].pop("partials_reused", None)
            p3[k].pop("partials_reused", None)
    assert p2 == p3, "incremental verdicts diverge from the full run"

    lineage = json.load(
        open(
            os.path.join(
                rdir, "checkpoint", "run_id=2", "task=nightly", "lineage.json"
            )
        )
    )
    print(
        json.dumps(
            {
                "metric": "incremental_speedup",
                "rows_per_side_base": base * TURNS,
                "rows_appended": new * TURNS,
                "growth_fraction": growth,
                "full_run_base_sec": round(t_full_base, 3),
                "incremental_run_sec": round(t_incremental, 3),
                "full_run_control_sec": round(t_control, 3),
                "speedup_vs_full": round(t_control / t_incremental, 2),
                "keyed_reuse": lineage.get("incremental_keyed", {}).get("keyed"),
                "profile_reuse": lineage.get("incremental"),
                "verdicts_identical": True,
                "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
