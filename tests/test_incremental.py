"""Incremental validation across runs: run N+1 profiles ONLY the files
added since run N and merges them with run N's checkpointed profile
monoids — verdicts must be IDENTICAL to a full run over all files, and
the lineage must record the reuse. Fallback paths (changed filter,
removed file, missing prior) must silently run full."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from datapact_ray.config import AggValidation, AggValidationDetail, ValidationSuite, ValidationTask
from datapact_ray.runner import RunConfig, run_suite


def _write_part(d, name, lo, hi, null_every=0):
    k = np.arange(lo, hi, dtype=np.int64)
    v = (k * 7 % 100).astype(np.float64)
    status = pa.array(
        [None if null_every and i % null_every == 0 else "OK" for i in range(len(k))]
    )
    pq.write_table(
        pa.table({"id": k, "v": v, "status": status}), os.path.join(d, name)
    )


def _task(src_dir):
    return ValidationTask(
        task_key="t",
        source_path=src_dir,
        target_path=src_dir,
        count_tolerance=0.0,
        null_validation_columns=["status"],
        null_validation_tolerance=0.0,
        agg_validations=[
            AggValidation(
                column="v",
                validations=[
                    AggValidationDetail(agg="SUM", tolerance=0.0),
                    AggValidationDetail(agg="AVG", tolerance=0.0),
                    AggValidationDetail(agg="MIN", tolerance=0.0),
                    AggValidationDetail(agg="MAX", tolerance=0.0),
                ],
            )
        ],
    )


def test_incremental_profile_matches_full(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_part(str(src), "part-000.parquet", 0, 5000, null_every=10)
    rdir = str(tmp_path / "out")
    suite = ValidationSuite(validations=[_task(str(src))])
    s1 = run_suite(suite, RunConfig(results_dir=rdir, run_id=1))
    assert s1.results[0].status == "SUCCESS"

    # nightly ingest: a new partition lands
    _write_part(str(src), "part-001.parquet", 5000, 8000, null_every=10)
    s_inc = run_suite(
        suite, RunConfig(results_dir=rdir, run_id=2, incremental_from=1)
    )
    s_full = run_suite(suite, RunConfig(results_dir=rdir, run_id=3))
    p_inc = s_inc.results[0].payload
    p_full = s_full.results[0].payload
    assert p_inc == p_full  # identical verdicts incl. formatted values
    # lineage records the reuse
    with open(
        os.path.join(rdir, "checkpoint", "run_id=2", "task=t", "lineage.json")
    ) as fh:
        lin = json.load(fh)
    assert lin["incremental"]["from_run_id"] == 1
    assert lin["incremental"]["new_source_files"] == 1
    assert lin["incremental"]["reused_source_files"] == 1


def test_incremental_falls_back_on_removed_file(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_part(str(src), "part-000.parquet", 0, 1000)
    _write_part(str(src), "part-001.parquet", 1000, 2000)
    rdir = str(tmp_path / "out")
    suite = ValidationSuite(validations=[_task(str(src))])
    run_suite(suite, RunConfig(results_dir=rdir, run_id=1))
    os.remove(str(src / "part-001.parquet"))  # shrink: monoid can't subtract
    s2 = run_suite(
        suite, RunConfig(results_dir=rdir, run_id=2, incremental_from=1)
    )
    s_full = run_suite(suite, RunConfig(results_dir=rdir, run_id=3))
    assert s2.results[0].payload == s_full.results[0].payload
    with open(
        os.path.join(rdir, "checkpoint", "run_id=2", "task=t", "lineage.json")
    ) as fh:
        lin = json.load(fh)
    assert "incremental" not in lin  # fell back to a full profile


def test_incremental_falls_back_on_spec_change(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_part(str(src), "part-000.parquet", 0, 1000)
    rdir = str(tmp_path / "out")
    run_suite(
        ValidationSuite(validations=[_task(str(src))]),
        RunConfig(results_dir=rdir, run_id=1),
    )
    _write_part(str(src), "part-001.parquet", 1000, 2000)
    # different agg set => different profile_spec signature
    t2 = _task(str(src))
    t2.agg_validations = [
        AggValidation(
            column="v", validations=[AggValidationDetail(agg="SUM", tolerance=0.0)]
        )
    ]
    s2 = run_suite(
        ValidationSuite(validations=[t2]),
        RunConfig(results_dir=rdir, run_id=2, incremental_from=1),
    )
    assert s2.results[0].status == "SUCCESS"
    with open(
        os.path.join(rdir, "checkpoint", "run_id=2", "task=t", "lineage.json")
    ) as fh:
        lin = json.load(fh)
    assert "incremental" not in lin
