"""FreshnessCheck: replication lag between the sides' max timestamps."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datapact_ray.config import FreshnessCheck, ValidationSuite, ValidationTask
from datapact_ray.runner import RunConfig, run_suite


def _write(path, ts_values):
    os.makedirs(path, exist_ok=True)
    df = pd.DataFrame({"ts": pd.to_datetime(ts_values), "x": range(len(ts_values))})
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        os.path.join(path, "part-0.parquet"),
    )
    return path


def _run(src_ts, tgt_ts, tmp_path, max_lag):
    src = _write(str(tmp_path / "src"), src_ts)
    tgt = _write(str(tmp_path / "tgt"), tgt_ts)
    task = ValidationTask(
        task_key="f",
        source_path=src,
        target_path=tgt,
        freshness=FreshnessCheck(ts_column="ts", max_lag_seconds=max_lag),
    )
    s = run_suite(
        ValidationSuite(validations=[task]),
        RunConfig(results_dir=str(tmp_path / "out"), run_id=1),
    )
    res = s.results[0]
    return res, next(
        v for v in res.verdicts if v.alias == "freshness_validation_ts"
    )


def test_lag_measured_and_tolerated(tmp_path):
    src = ["2026-01-01 00:00:00", "2026-01-01 12:00:00"]
    tgt = ["2026-01-01 00:00:00", "2026-01-01 10:30:00"]  # 5400 s behind
    res, v = _run(src, tgt, tmp_path / "a", max_lag=3600)
    assert not v.passed
    assert v.payload["lag_seconds"] == "5,400.00"
    res, v = _run(src, tgt, tmp_path / "b", max_lag=5400)
    assert v.passed and res.status == "SUCCESS"


def test_target_ahead_is_zero_lag(tmp_path):
    res, v = _run(
        ["2026-01-01 00:00:00"],
        ["2026-01-02 00:00:00"],
        tmp_path,
        max_lag=0,
    )
    assert v.passed
    assert v.payload["lag_seconds"] == "0.00"


def test_one_side_all_null_fails(tmp_path):
    src = _write(str(tmp_path / "src"), ["2026-01-01"])
    os.makedirs(str(tmp_path / "tgt"), exist_ok=True)
    df = pd.DataFrame({"ts": pd.to_datetime([None]), "x": [0]})
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        os.path.join(str(tmp_path / "tgt"), "part-0.parquet"),
    )
    task = ValidationTask(
        task_key="f",
        source_path=src,
        target_path=str(tmp_path / "tgt"),
        freshness=FreshnessCheck(),
    )
    s = run_suite(
        ValidationSuite(validations=[task]),
        RunConfig(results_dir=str(tmp_path / "out"), run_id=1),
    )
    v = next(
        x for x in s.results[0].verdicts if x.alias == "freshness_validation_ts"
    )
    assert not v.passed
    assert v.payload["note"] == "one side has no timestamps"


def test_preflight_missing_column(tmp_path):
    src = _write(str(tmp_path / "src"), ["2026-01-01"])
    task = ValidationTask(
        task_key="f",
        source_path=src,
        target_path=src,
        freshness=FreshnessCheck(ts_column="nope"),
    )
    with pytest.raises(ValueError, match="missing from the source"):
        run_suite(
            ValidationSuite(validations=[task]),
            RunConfig(results_dir=str(tmp_path / "out"), run_id=1),
        )
    with pytest.raises(ValueError, match=">= 0"):
        FreshnessCheck(max_lag_seconds=-1)


def test_preflight_rejects_string_ts(tmp_path):
    os.makedirs(str(tmp_path / "s"), exist_ok=True)
    df = pd.DataFrame({"ts": ["2026-01-01T00:00:00"], "x": [1]})
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        os.path.join(str(tmp_path / "s"), "part-0.parquet"),
    )
    task = ValidationTask(
        task_key="f",
        source_path=str(tmp_path / "s"),
        target_path=str(tmp_path / "s"),
        freshness=FreshnessCheck(),
    )
    with pytest.raises(ValueError, match="timestamp, date or numeric"):
        run_suite(
            ValidationSuite(validations=[task]),
            RunConfig(results_dir=str(tmp_path / "out"), run_id=1),
        )
