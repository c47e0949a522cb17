"""SegmentCountCheck: per-segment row-count reconciliation — the
missing-partition detector the global count check averages away."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datapact_ray.config import SegmentCountCheck, ValidationSuite, ValidationTask
from datapact_ray.runner import RunConfig, run_suite


def _write(path, df):
    os.makedirs(path, exist_ok=True)
    half = len(df) // 2
    for i, part in enumerate((df.iloc[:half], df.iloc[half:])):
        pq.write_table(
            pa.Table.from_pandas(part, preserve_index=False),
            os.path.join(path, f"part-{i}.parquet"),
        )
    return path


@pytest.fixture(scope="module")
def seg_pair(tmp_path_factory):
    """Source: 5 days x 100 rows + 7 NULL-day rows. Target: day
    2026-01-03 entirely MISSING, day 2026-01-05 off by 2 rows, NULL
    segment intact."""
    root = tmp_path_factory.mktemp("segcnt")
    rng = np.random.default_rng(3)

    def day_frame(day, n):
        return pd.DataFrame(
            {
                "day": [day] * n,
                "val": rng.integers(0, 100, size=n),
            }
        )

    days = [f"2026-01-0{d}" for d in range(1, 6)]
    src = pd.concat(
        [day_frame(d, 100) for d in days] + [day_frame(None, 7)],
        ignore_index=True,
    )
    tgt = pd.concat(
        [day_frame(d, 100) for d in days if d != "2026-01-03"]
        + [day_frame("2026-01-05", 2), day_frame(None, 7)],
        ignore_index=True,
    )
    return {
        "source": _write(str(root / "source"), src),
        "target": _write(str(root / "target"), tgt),
    }


def _verdict(seg_pair, tmp_path, tolerance=0.0, max_segments=100_000):
    task = ValidationTask(
        task_key="seg",
        source_path=seg_pair["source"],
        target_path=seg_pair["target"],
        segment_counts=[
            SegmentCountCheck(
                column="day", tolerance=tolerance, max_segments=max_segments
            )
        ],
    )
    s = run_suite(
        ValidationSuite(validations=[task]),
        RunConfig(results_dir=str(tmp_path), run_id=1),
    )
    res = s.results[0]
    return res, next(
        v for v in res.verdicts if v.alias == "segment_count_validation_day"
    )


def test_missing_and_skewed_segments_fail(seg_pair, tmp_path):
    res, v = _verdict(seg_pair, tmp_path)
    assert not v.passed and res.status == "FAILURE"
    p = v.payload
    assert p["segments_checked"] == "6"  # 5 days + NULL
    assert p["segments_failed"] == "2"
    assert p["max_rel_diff_percent"] == "100.00%"  # the missing day
    # worst first: the absent day (rel 1.0), then the skewed one (2/102)
    assert p["worst_segments"].startswith("2026-01-03 (src 100 vs tgt 0)")
    assert "2026-01-05 (src 100 vs tgt 102)" in p["worst_segments"]


def test_tolerance_passes_skew_not_absence(seg_pair, tmp_path):
    _, v = _verdict(seg_pair, tmp_path / "tol", tolerance=0.05)
    # 2/102 = 1.96% passes at 5%; the missing day still scores 1.0
    assert not v.passed
    assert v.payload["segments_failed"] == "1"
    _, v = _verdict(seg_pair, tmp_path / "tol1", tolerance=1.0)
    assert v.passed


def test_cardinality_guard_raises(seg_pair, tmp_path):
    task = ValidationTask(
        task_key="seg",
        source_path=seg_pair["source"],
        target_path=seg_pair["target"],
        segment_counts=[SegmentCountCheck(column="val", max_segments=3)],
    )
    with pytest.raises(Exception, match="max_segments|distinct values"):
        run_suite(
            ValidationSuite(validations=[task]),
            RunConfig(results_dir=str(tmp_path / "cap"), run_id=1),
        )


def test_preflight_rejects_missing_and_nested(seg_pair, tmp_path):
    task = ValidationTask(
        task_key="seg",
        source_path=seg_pair["source"],
        target_path=seg_pair["target"],
        segment_counts=[SegmentCountCheck(column="nope")],
    )
    with pytest.raises(ValueError, match="missing from the source"):
        run_suite(
            ValidationSuite(validations=[task]),
            RunConfig(results_dir=str(tmp_path / "mf"), run_id=1),
        )
    with pytest.raises(ValueError, match="duplicate column"):
        ValidationTask(
            task_key="x",
            source_path="a",
            target_path="b",
            segment_counts=[
                SegmentCountCheck(column="day"),
                SegmentCountCheck(column="day"),
            ],
        )


# ---- categorical drift (tvd) — shares the value-counts monoid ----

from datapact_ray.config import DriftCheck
from datapact_ray.sketches import tvd_statistic


def test_tvd_statistic_closed_form():
    assert tvd_statistic({}, {}) == 0.0
    assert tvd_statistic({"a": 5}, {}) == 1.0
    assert tvd_statistic({"a": 1, "b": 1}, {"a": 1, "b": 1}) == 0.0
    # p = (0.5, 0.5), q = (0.9, 0.1): tvd = 0.5*(0.4+0.4) = 0.4
    assert abs(tvd_statistic({"a": 5, "b": 5}, {"a": 9, "b": 1}) - 0.4) < 1e-12
    # disjoint supports -> 1.0
    assert tvd_statistic({"a": 3}, {"b": 7}) == 1.0


def test_categorical_drift_e2e(tmp_path):
    src = pd.DataFrame({"cat": ["x"] * 80 + ["y"] * 20, "v": range(100)})
    tgt = pd.DataFrame({"cat": ["x"] * 50 + ["y"] * 30 + [None] * 20,
                        "v": range(100)})
    s_dir = _write(str(tmp_path / "src"), src)
    t_dir = _write(str(tmp_path / "tgt"), tgt)
    task = ValidationTask(
        task_key="cat",
        source_path=s_dir,
        target_path=t_dir,
        drift=[DriftCheck(column="cat", metric="tvd", derived="categorical",
                          threshold=0.2)],
    )
    s = run_suite(
        ValidationSuite(validations=[task]),
        RunConfig(results_dir=str(tmp_path / "out"), run_id=1),
    )
    v = next(
        x
        for x in s.results[0].verdicts
        if x.alias == "drift_validation_cat_categorical_tvd"
    )
    # p=(.8,.2,0) q=(.5,.3,.2): tvd = .5*(.3+.1+.2) = 0.3 > 0.2
    assert not v.passed
    assert v.payload["statistic"] == "0.300000"


def test_categorical_metric_pairing_enforced():
    with pytest.raises(ValueError, match="go together"):
        DriftCheck(column="c", metric="ks", derived="categorical")
    with pytest.raises(ValueError, match="go together"):
        DriftCheck(column="c", metric="tvd", derived="value")


# ---- review-fix regressions ----


def test_nan_segment_keys_collapse_to_null(tmp_path):
    """NaN float keys collapse to the NULL segment: identical sides
    must PASS (fragmented nan dict keys used to read as maximal
    drift / one-side-missing)."""
    df = pd.DataFrame({"seg": [1.0, 2.0, float("nan"), float("nan")] * 25})
    s_dir = _write(str(tmp_path / "src"), df)
    task = ValidationTask(
        task_key="nan",
        source_path=s_dir,
        target_path=s_dir,
        segment_counts=[SegmentCountCheck(column="seg")],
        drift=[DriftCheck(column="seg", metric="tvd", derived="categorical",
                          threshold=0.0)],
    )
    s = run_suite(
        ValidationSuite(validations=[task]),
        RunConfig(results_dir=str(tmp_path / "out"), run_id=1),
    )
    res = s.results[0]
    assert res.status == "SUCCESS"
    v = next(
        x for x in res.verdicts if x.alias == "segment_count_validation_seg"
    )
    assert v.payload["segments_checked"] == "3"  # 1.0, 2.0, NULL(=nan)


def test_categorical_preflight_parity(tmp_path):
    src = _write(str(tmp_path / "src"), pd.DataFrame({"a": [1, 2]}))
    task = ValidationTask(
        task_key="c",
        source_path=src,
        target_path=src,
        drift=[DriftCheck(column="nope", metric="tvd", derived="categorical")],
    )
    with pytest.raises(ValueError, match="missing from the source"):
        run_suite(
            ValidationSuite(validations=[task]),
            RunConfig(results_dir=str(tmp_path / "out"), run_id=1),
        )
    with pytest.raises(Exception, match="max_categories"):
        DriftCheck(column="c", metric="tvd", derived="categorical",
                   max_categories=0)


def test_shared_column_caps_enforced_per_check(tmp_path):
    """segment max_segments=3 + categorical max_categories=100 on one
    column with 5 distinct values: the scan runs under the loose cap,
    then the SEGMENT check's own cap fails with a message naming it."""
    df = pd.DataFrame({"seg": list("abcde") * 20})
    s_dir = _write(str(tmp_path / "src"), df)
    task = ValidationTask(
        task_key="caps",
        source_path=s_dir,
        target_path=s_dir,
        segment_counts=[SegmentCountCheck(column="seg", max_segments=3)],
        drift=[DriftCheck(column="seg", metric="tvd", derived="categorical",
                          max_categories=100, threshold=1.0)],
    )
    with pytest.raises(ValueError, match="segment_counts: column 'seg' has 5"):
        run_suite(
            ValidationSuite(validations=[task]),
            RunConfig(results_dir=str(tmp_path / "out"), run_id=1),
        )


def test_scalar_naive_datetime_is_utc_epoch():
    from datetime import datetime, timezone

    from datapact_ray.stages.profile import _scalar

    naive = datetime(2026, 3, 8, 12, 0, 0)
    want = naive.replace(tzinfo=timezone.utc).timestamp()
    assert _scalar(pa.scalar(naive)) == want


def test_segment_violation_rows_written_and_retracted(seg_pair, tmp_path):
    """Failing segments surface as violation rows; a clean rerun (same
    run_id, tolerance 1.0) retracts the file."""
    import glob as _g
    import json as _json

    _verdict(seg_pair, tmp_path)
    f = str(tmp_path / "violations" / "run_id=1" / "task=seg" /
            "segment_day.parquet")
    rows = pq.read_table(f).to_pandas()
    assert list(rows["check_alias"].unique()) == ["segment_count_validation_day"]
    keys = [_json.loads(k)["day"] for k in rows["key"]]
    assert keys[0] == "2026-01-03"  # worst (missing day) first
    d0 = _json.loads(rows["detail"].iloc[0])
    assert d0 == {"source_rows": 100, "target_rows": 0, "rel_diff": 1.0}
    _verdict(seg_pair, tmp_path, tolerance=1.0)
    assert not os.path.exists(f)
