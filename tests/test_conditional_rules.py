"""Conditional (cross-column implication) rules riding the fused profile
scan: exact planted counts, NULL-``then`` exclusion (SQL ``when AND NOT
then`` filter semantics), tolerance arithmetic on both sides, config-time
predicate validation, schema pre-flight, and the resume signature guard
(a rule added between runs must force recomputation, not read 0/0)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datapact_ray.config import (
    ConditionalValidation,
    ValidationSuite,
    ValidationTask,
)
from datapact_ray.runner import RunConfig, run_suite


def _write(path, roles, tools, values):
    t = pa.table(
        {
            "conv_id": pa.array([f"conv-{i}" for i in range(len(roles))]),
            "turn_idx": pa.array(list(range(len(roles))), pa.int32()),
            "role": pa.array(roles, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "value": pa.array(values, pa.float64()),
        }
    )
    pq.write_table(t, path)


def _run(tmp_path, task, run_id=1, resume=False):
    s = run_suite(
        ValidationSuite(validations=[task]),
        RunConfig(
            results_dir=str(tmp_path / "out"), run_id=run_id, resume=resume
        ),
    )
    return s.results[0]


def test_planted_counts_and_null_then_excluded(tmp_path):
    sp, tp = str(tmp_path / "s.parquet"), str(tmp_path / "t.parquet")
    # source: clean — every tool turn carries a tool name
    _write(
        sp,
        roles=["tool", "user", "tool", "assistant"],
        tools=["search", None, "calc", None],
        values=[1.0, 2.0, 3.0, 4.0],
    )
    # target: 3 tool turns, 2 missing the tool field (violations); the
    # user row with NULL tool is NOT matched by `when`, so not counted
    _write(
        tp,
        roles=["tool", "tool", "tool", "user"],
        tools=["search", None, None, None],
        values=[1.0, 2.0, 3.0, 4.0],
    )
    task = ValidationTask(
        task_key="t",
        source_path=sp,
        target_path=tp,
        conditional_validations=[
            ConditionalValidation(
                name="tool turns have tool",
                when="role = 'tool'",
                then="tool IS NOT NULL",
            )
        ],
    )
    res = _run(tmp_path, task)
    v = res.payload["conditional_validation_tool_turns_have_tool"]
    assert v["status"] == "FAIL"
    assert v["source_matched_rows"] == "2"
    assert v["source_violations"] == "0"
    assert v["target_matched_rows"] == "3"
    assert v["target_violations"] == "2"
    assert v["when"] == "role = 'tool'"
    # the violating `then` value tuple (NULL tool) appears in the samples
    assert "NULL (x2)" in v["target_sample_violations"]
    assert res.status == "FAILURE"


def test_null_when_rows_not_matched_and_tolerance(tmp_path):
    sp, tp = str(tmp_path / "s.parquet"), str(tmp_path / "t.parquet")
    _write(
        sp,
        roles=["tool"] * 10,
        tools=["x"] * 10,
        values=[float(i) for i in range(10)],
    )
    # 10 matched rows, 1 violation = 10% violating share
    _write(
        tp,
        roles=["tool"] * 10 + [None],
        tools=["x"] * 9 + [None, None],
        values=[float(i) for i in range(11)],
    )
    def mk(tol):
        return ValidationTask(
            task_key="t",
            source_path=sp,
            target_path=tp,
            conditional_validations=[
                ConditionalValidation(
                    name="r", when="role = 'tool'", then="tool IS NOT NULL",
                    tolerance=tol,
                )
            ],
        )
    res = _run(tmp_path, mk(0.1), run_id=1)
    v = res.payload["conditional_validation_r"]
    assert v["status"] == "PASS" and v["target_matched_rows"] == "10"
    res = _run(tmp_path, mk(0.05), run_id=2)
    assert res.payload["conditional_validation_r"]["status"] == "FAIL"


def test_numeric_and_compound_predicates(tmp_path):
    sp = str(tmp_path / "s.parquet")
    _write(
        sp,
        roles=["a", "a", "b", "b"],
        tools=["x"] * 4,
        values=[5.0, -1.0, -7.0, 2.0],
    )
    task = ValidationTask(
        task_key="t",
        source_path=sp,
        target_path=sp,
        conditional_validations=[
            ConditionalValidation(
                name="a_nonneg", when="role = 'a'", then="value >= 0"
            ),
            ConditionalValidation(
                name="b_range",
                when="role = 'b' AND value < 0",
                then="value BETWEEN -5 AND 0",
            ),
        ],
    )
    res = _run(tmp_path, task)
    va = res.payload["conditional_validation_a_nonneg"]
    assert va["source_matched_rows"] == "2" and va["source_violations"] == "1"
    assert "-1" in va["source_sample_violations"]
    vb = res.payload["conditional_validation_b_range"]
    assert vb["source_matched_rows"] == "1" and vb["source_violations"] == "1"


def test_config_validation():
    with pytest.raises(ValueError):
        ConditionalValidation(name="r", when="role ==== 'x'", then="value > 0")
    with pytest.raises(ValueError):
        ConditionalValidation(name="r", when="role = 'x'", then="value >")
    with pytest.raises(ValueError):
        ConditionalValidation(name="r", when="role = 'x'", then="value > 0",
                              tolerance=2.0)
    with pytest.raises(ValueError):
        ConditionalValidation(name="  ", when="role = 'x'", then="value > 0")
    with pytest.raises(ValueError):  # duplicate names rejected
        ValidationTask(
            task_key="t",
            source_path="/x",
            target_path="/y",
            conditional_validations=[
                ConditionalValidation(name="R", when="a = 1", then="b = 2"),
                ConditionalValidation(name="r", when="a = 2", then="b = 3"),
            ],
        )


def test_missing_column_fails_preflight(tmp_path):
    sp = str(tmp_path / "s.parquet")
    _write(sp, roles=["a"], tools=["x"], values=[1.0])
    task = ValidationTask(
        task_key="t",
        source_path=sp,
        target_path=sp,
        conditional_validations=[
            ConditionalValidation(
                name="r", when="role = 'a'", then="no_such_col > 0"
            )
        ],
    )
    with pytest.raises(ValueError, match="no_such_col"):
        _run(tmp_path, task)


def test_resume_recomputes_on_late_added_rule(tmp_path):
    """Adding a conditional rule between runs and resuming the same
    run_id must recompute the profile (signature guard), not silently
    read missing counters as 0/0 and PASS."""
    sp, tp = str(tmp_path / "s.parquet"), str(tmp_path / "t.parquet")
    _write(sp, roles=["tool"] * 4, tools=["x"] * 4, values=[1.0] * 4)
    _write(tp, roles=["tool"] * 4, tools=[None] * 4, values=[1.0] * 4)

    base = dict(task_key="t", source_path=sp, target_path=tp,
                count_tolerance=0.0)
    _run(tmp_path, ValidationTask(**base), run_id=7)
    task2 = ValidationTask(
        **base,
        conditional_validations=[
            ConditionalValidation(
                name="r", when="role = 'tool'", then="tool IS NOT NULL"
            )
        ],
    )
    res = _run(tmp_path, task2, run_id=7, resume=True)
    v = res.payload["conditional_validation_r"]
    assert v["target_matched_rows"] == "4" and v["target_violations"] == "4"
    assert res.status == "FAILURE"


def test_conditional_slug_collision_rejected():
    """Names that differ as strings but collide after make_identifier
    would overwrite each other's payload entry — rejected at config."""
    import pytest

    from datapact_ray.config import ConditionalValidation, ValidationTask

    with pytest.raises(ValueError, match="slug"):
        ValidationTask(
            task_key="t", source_path="a", target_path="b",
            conditional_validations=[
                ConditionalValidation(name="tool turns", when="a = 1",
                                      then="b = 1"),
                ConditionalValidation(name="tool-turns", when="a = 2",
                                      then="b = 2"),
            ],
        )


def test_conditional_type_mismatch_preflight(tmp_path, ray_session):
    """A predicate comparing a STRING column to an int must fail the
    driver pre-flight with a clear message, not ArrowNotImplementedError
    inside a distributed scan batch."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from datapact_ray.config import ConditionalValidation, ValidationSuite, ValidationTask
    from datapact_ray.runner import RunConfig, run_suite

    src = tmp_path / "t.parquet"
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame({"price": ["10", "20"], "status": ["F", "P"]}),
            preserve_index=False,
        ),
        str(src),
    )
    task = ValidationTask(
        task_key="t", source_path=str(src), target_path=str(src),
        conditional_validations=[
            ConditionalValidation(name="r", when="status = 'F'",
                                  then="price > 0")
        ],
    )
    with pytest.raises(ValueError, match="does not type-check"):
        run_suite(ValidationSuite(validations=[task]),
                  RunConfig(results_dir=str(tmp_path / "o"), run_id=1))
