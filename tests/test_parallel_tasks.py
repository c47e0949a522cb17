"""Task-level parallelism (reference parity: the orchestrator launches
validation tasks as parallel jobs): max_parallel_tasks > 1 must produce
byte-identical verdicts in suite order, and fail_fast forces sequential."""

import pyarrow as pa
import pyarrow.parquet as pq

from datapact_ray.config import ValidationSuite, ValidationTask
from datapact_ray.runner import RunConfig, run_suite


def _table(path, n, bad=False):
    t = pa.table(
        {
            "id": pa.array(range(n), pa.int64()),
            "v": pa.array(
                [float(i) + (0.5 if bad and i == 0 else 0.0) for i in range(n)]
            ),
        }
    )
    pq.write_table(t, path)
    return path


def _suite(tmp_path):
    a = _table(str(tmp_path / "a.parquet"), 200)
    b = _table(str(tmp_path / "b.parquet"), 200)
    bad = _table(str(tmp_path / "bad.parquet"), 199, bad=True)
    mk = lambda key, src, tgt: ValidationTask(  # noqa: E731
        task_key=key,
        source_path=src,
        target_path=tgt,
        primary_keys=["id"],
        count_tolerance=0.0,
        pk_row_hash_check=True,
        uniqueness_columns=["id"],
        uniqueness_tolerance=0.0,
    )
    return ValidationSuite(
        validations=[
            mk("t1", a, b),
            mk("t2_fails", a, bad),
            mk("t3", b, a),
        ]
    )


def test_parallel_equals_sequential(tmp_path):
    suite = _suite(tmp_path)
    seq = run_suite(
        suite, RunConfig(results_dir=str(tmp_path / "seq"), run_id=1)
    )
    par = run_suite(
        suite,
        RunConfig(
            results_dir=str(tmp_path / "par"), run_id=1, max_parallel_tasks=3
        ),
    )
    assert [r.task_key for r in par.results] == [r.task_key for r in seq.results]
    assert [r.status for r in par.results] == ["SUCCESS", "FAILURE", "SUCCESS"]
    for a, b in zip(seq.results, par.results):
        assert a.payload == b.payload  # verdict-identical, order kept
    # results.parquet carries all three rows in suite order
    t = pq.read_table(
        str(tmp_path / "par" / "results" / "run_id=1" / "results.parquet")
    )
    assert t.column("task_key").to_pylist() == ["t1", "t2_fails", "t3"]


def test_fail_fast_stays_sequential(tmp_path):
    suite = _suite(tmp_path)
    s = run_suite(
        suite,
        RunConfig(
            results_dir=str(tmp_path / "ff"),
            run_id=1,
            fail_fast=True,
            max_parallel_tasks=3,  # ignored under fail_fast
        ),
    )
    assert [r.task_key for r in s.results] == ["t1", "t2_fails"]  # stopped
