"""Temporal (cross-run) drift: this run's SOURCE profile digests vs a
baseline run's checkpointed source profile — the nightly source-shift
check. A stable source PASSes with statistic 0 against its own prior
run; a shifted re-ingest FAILs; misconfiguration fails loudly."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datapact_ray.config import (
    DriftCheck,
    ValidationSuite,
    ValidationTask,
)
from datapact_ray.runner import RunConfig, run_suite


def _write(dirpath, values, lens=None):
    import os

    os.makedirs(dirpath, exist_ok=True)
    n = len(values)
    t = pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in range(n)], pa.string()),
            "turn_idx": pa.array(np.zeros(n, np.int64)),
            "text": pa.array(
                ["x" * int(v) for v in (lens if lens is not None else values)],
                pa.string(),
            ),
            "value": pa.array(np.asarray(values, np.float64)),
        }
    )
    pq.write_table(t, f"{dirpath}/part-0.parquet")


def _task(src, drift, key="t"):
    return ValidationTask(
        task_key=key, source_path=src, target_path=src,
        count_tolerance=0.0, temporal_drift=drift,
    )


def test_temporal_drift_pass_and_fail(tmp_path, ray_session):
    rng = np.random.RandomState(0)
    v1 = rng.normal(100, 5, 4000)
    src1 = str(tmp_path / "day1")
    _write(src1, v1)
    rdir = str(tmp_path / "out")
    drift = [
        DriftCheck(column="value", metric="ks", threshold=0.1),
        DriftCheck(column="text", metric="ks", threshold=0.1,
                   derived="str_len"),
    ]
    # run 1: bootstrap — baseline_run=None sketches the columns into
    # this run's profile without emitting temporal verdicts
    run_suite(
        ValidationSuite(validations=[_task(src1, drift)]),
        RunConfig(results_dir=rdir, run_id=1),
    )
    # run 2 on an IDENTICAL re-ingest → statistic 0, PASS
    s2 = run_suite(
        ValidationSuite(validations=[_task(src1, drift)]),
        RunConfig(results_dir=rdir, run_id=2, temporal_baseline_run=1),
    )
    p = s2.results[0].payload
    assert p["temporal_drift_validation_value_ks"]["status"] == "PASS"
    assert float(p["temporal_drift_validation_value_ks"]["statistic"]) == 0.0
    assert p["temporal_drift_validation_value_ks"]["baseline_run"] == 1
    assert p["temporal_drift_validation_text_str_len_ks"]["status"] == "PASS"

    # run 3 on a SHIFTED source (mean +50, texts doubled) → FAIL both
    src3 = str(tmp_path / "day3")
    _write(src3, v1 + 50, lens=(v1 * 2).astype(int))
    s3 = run_suite(
        ValidationSuite(validations=[_task(src3, drift)]),
        RunConfig(results_dir=rdir, run_id=3, temporal_baseline_run=1),
    )
    p3 = s3.results[0].payload
    assert p3["temporal_drift_validation_value_ks"]["status"] == "FAIL"
    assert float(p3["temporal_drift_validation_value_ks"]["statistic"]) > 0.9
    assert p3["temporal_drift_validation_text_str_len_ks"]["status"] == "FAIL"
    assert s3.results[0].status == "FAILURE"


def test_temporal_drift_misconfig_loud(tmp_path, ray_session):
    src = str(tmp_path / "src")
    _write(src, np.arange(100, dtype=float))
    drift = [DriftCheck(column="value", metric="ks", threshold=0.1)]
    # baseline run has no checkpointed profile
    with pytest.raises(ValueError, match="no\\s+checkpointed source profile"):
        run_suite(
            ValidationSuite(validations=[_task(src, drift)]),
            RunConfig(results_dir=str(tmp_path / "o2"), run_id=2,
                      temporal_baseline_run=1),
        )


def test_temporal_drift_baseline_missing_digest(tmp_path, ray_session):
    """Baseline run exists but never sketched the column → loud error,
    not a silent PASS."""
    src = str(tmp_path / "src")
    _write(src, np.arange(100, dtype=float))
    rdir = str(tmp_path / "out")
    # run 1 WITHOUT any drift config → no 'value' digest in its profile
    run_suite(
        ValidationSuite(validations=[
            ValidationTask(task_key="t", source_path=src, target_path=src,
                           count_tolerance=0.0)
        ]),
        RunConfig(results_dir=rdir, run_id=1),
    )
    drift = [DriftCheck(column="value", metric="ks", threshold=0.1)]
    with pytest.raises(ValueError, match="has no 'value' digest"):
        run_suite(
            ValidationSuite(validations=[_task(src, drift)]),
            RunConfig(results_dir=rdir, run_id=2, temporal_baseline_run=1),
        )


def test_temporal_drift_current_digest_missing_is_maximal_fail(
    tmp_path, ray_session
):
    """The CURRENT run's source column going all-NULL (no digest) is
    maximal drift — a statistic-1.0 FAIL verdict matching the regular
    drift one-sided-missing semantics, NOT an error misattributed to
    the baseline run (round-3 advice)."""
    import os

    src1 = str(tmp_path / "day1")
    _write(src1, np.arange(500, dtype=float))
    rdir = str(tmp_path / "out")
    drift = [DriftCheck(column="value", metric="ks", threshold=0.1)]
    run_suite(
        ValidationSuite(validations=[_task(src1, drift)]),
        RunConfig(results_dir=rdir, run_id=1),
    )
    # day 2: the value column is entirely NULL → no digest this run
    src2 = str(tmp_path / "day2")
    os.makedirs(src2, exist_ok=True)
    n = 500
    t = pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in range(n)], pa.string()),
            "turn_idx": pa.array(np.zeros(n, np.int64)),
            "text": pa.array(["x"] * n, pa.string()),
            "value": pa.array([None] * n, pa.float64()),
        }
    )
    pq.write_table(t, f"{src2}/part-0.parquet")
    s2 = run_suite(
        ValidationSuite(validations=[_task(src2, drift)]),
        RunConfig(results_dir=rdir, run_id=2, temporal_baseline_run=1),
    )
    v = s2.results[0].payload["temporal_drift_validation_value_ks"]
    assert v["status"] == "FAIL"
    assert float(v["statistic"]) == 1.0
    assert s2.results[0].status == "FAILURE"


def test_temporal_drift_requires_profile_derivation():
    with pytest.raises(ValueError, match="value|str_len"):
        ValidationTask(
            task_key="t", source_path="a", target_path="b",
            count_tolerance=0.0,
            temporal_drift=[DriftCheck(column="x", derived="turn_count")],
        )


def test_temporal_categorical_drift(tmp_path, ray_session):
    """Cross-run categorical shift: the baseline run checkpoints its
    value-counts monoid whole, so run 2 compares frequencies with TVD
    at no extra scan cost. Identical re-ingest scores exactly 0; a
    shifted mix FAILs with the closed-form statistic."""
    import os

    def write_cat(dirpath, cats):
        os.makedirs(dirpath, exist_ok=True)
        t = pa.table(
            {
                "conv_id": pa.array([f"c{i}" for i in range(len(cats))]),
                "cat": pa.array(cats, pa.string()),
            }
        )
        pq.write_table(t, f"{dirpath}/part-0.parquet")

    src1 = str(tmp_path / "day1")
    write_cat(src1, ["a"] * 80 + ["b"] * 20)
    rdir = str(tmp_path / "out")
    drift = [
        DriftCheck(column="cat", metric="tvd", derived="categorical",
                   threshold=0.1)
    ]
    run_suite(
        ValidationSuite(validations=[_task(src1, drift)]),
        RunConfig(results_dir=rdir, run_id=1),
    )
    # identical re-ingest -> statistic exactly 0
    s = run_suite(
        ValidationSuite(validations=[_task(src1, drift)]),
        RunConfig(results_dir=rdir, run_id=2, temporal_baseline_run=1),
    )
    v = next(
        x
        for x in s.results[0].verdicts
        if x.alias.startswith("temporal_drift_validation_cat")
    )
    assert v.passed and v.payload["statistic"] == "0.000000"
    # shifted mix: p=(.8,.2) -> q=(.5,.5): tvd = 0.3 > 0.1
    src2 = str(tmp_path / "day2")
    write_cat(src2, ["a"] * 50 + ["b"] * 50)
    s = run_suite(
        ValidationSuite(validations=[_task(src2, drift)]),
        RunConfig(results_dir=rdir, run_id=3, temporal_baseline_run=1),
    )
    v = next(
        x
        for x in s.results[0].verdicts
        if x.alias.startswith("temporal_drift_validation_cat")
    )
    assert not v.passed and v.payload["statistic"] == "0.300000"
    # baseline that never counted the column fails loudly
    drift_other = [
        DriftCheck(column="conv_id", metric="tvd", derived="categorical",
                   threshold=0.1)
    ]
    with pytest.raises(ValueError, match="value counts"):
        run_suite(
            ValidationSuite(validations=[_task(src1, drift_other)]),
            RunConfig(results_dir=rdir, run_id=4, temporal_baseline_run=1),
        )
