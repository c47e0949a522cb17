"""Enum (accepted-values) and pattern (format regex) column rules riding
the fused profile scan — exact planted counts, NULL exclusion, native-type
enum comparison, and tolerance arithmetic on both sides."""

import pyarrow as pa
import pyarrow.parquet as pq

from datapact_ray.config import (
    EnumValidation,
    PatternValidation,
    ValidationSuite,
    ValidationTask,
)
from datapact_ray.runner import RunConfig, run_suite


def _write(path, roles, ids, nums):
    t = pa.table(
        {
            "conv_id": pa.array(ids, pa.string()),
            "turn_idx": pa.array(list(range(len(ids))), pa.int32()),
            "role": pa.array(roles, pa.string()),
            "num": pa.array(nums, pa.int64()),
        }
    )
    pq.write_table(t, path)


def _run(tmp_path, task):
    s = run_suite(
        ValidationSuite(validations=[task]),
        RunConfig(results_dir=str(tmp_path / "out"), run_id=1),
    )
    return s.results[0]


def test_enum_and_pattern_planted_counts(tmp_path):
    sp, tp = str(tmp_path / "s.parquet"), str(tmp_path / "t.parquet")
    _write(
        sp,
        roles=["user", "assistant", "tool", "user"],
        ids=["conv-1", "conv-2", "conv-3", "conv-4"],
        nums=[1, 2, 3, 1],
    )
    _write(
        tp,
        roles=["user", "system", None, "bot"],  # 2 bad, 1 NULL (not a viol)
        ids=["conv-1", "CONV-2", "x9", "conv-4"],  # 2 bad format
        nums=[1, 2, 9, 1],  # one out of enum {1,2,3}
    )
    task = ValidationTask(
        task_key="t",
        source_path=sp,
        target_path=tp,
        enum_validations=[
            EnumValidation(column="role", allowed=["user", "assistant", "tool"]),
            EnumValidation(column="num", allowed=[1, 2, 3]),  # native int enum
        ],
        pattern_validations=[
            PatternValidation(column="conv_id", regex=r"conv-\d+"),
        ],
    )
    res = _run(tmp_path, task)
    p = res.payload
    v = p["enum_validation_role"]
    assert v["status"] == "FAIL"
    assert v["source_violations"] == "0"
    assert v["target_violations"] == "2"
    assert v["target_checked_rows"] == "3"  # the NULL row is excluded
    v = p["enum_validation_num"]
    assert v["status"] == "FAIL" and v["target_violations"] == "1"
    v = p["pattern_validation_conv_id"]
    assert v["status"] == "FAIL" and v["target_violations"] == "2"
    assert res.status == "FAILURE"


def test_value_rules_pass_with_tolerance_and_self_pair(tmp_path):
    sp = str(tmp_path / "s.parquet")
    _write(
        sp,
        roles=["user", "assistant"] * 10,
        ids=[f"conv-{i}" for i in range(20)],
        nums=[1, 2] * 10,
    )
    task = ValidationTask(
        task_key="t",
        source_path=sp,
        target_path=sp,
        enum_validations=[
            EnumValidation(column="role", allowed=["user", "assistant"])
        ],
        pattern_validations=[
            PatternValidation(column="conv_id", regex=r"conv-\d+")
        ],
    )
    res = _run(tmp_path, task)
    assert res.status == "SUCCESS"
    assert res.payload["enum_validation_role"]["status"] == "PASS"
    assert res.payload["pattern_validation_conv_id"]["status"] == "PASS"


def test_pattern_is_full_match_not_substring(tmp_path):
    sp, tp = str(tmp_path / "s.parquet"), str(tmp_path / "t.parquet")
    _write(sp, roles=["user"], ids=["conv-1"], nums=[1])
    # 'xxconv-1xx' CONTAINS the pattern but must not full-match
    _write(tp, roles=["user"], ids=["xxconv-1xx"], nums=[1])
    task = ValidationTask(
        task_key="t",
        source_path=sp,
        target_path=tp,
        pattern_validations=[
            PatternValidation(column="conv_id", regex=r"conv-\d+")
        ],
    )
    res = _run(tmp_path, task)
    assert res.payload["pattern_validation_conv_id"]["target_violations"] == "1"


def test_config_validation():
    import pytest

    with pytest.raises(ValueError):
        EnumValidation(column="c", allowed=[])
    with pytest.raises(ValueError):
        PatternValidation(column="c", regex="([unclosed")
    with pytest.raises(ValueError):
        EnumValidation(column="c", allowed=["x"], tolerance=1.5)


def test_violation_samples_in_payload(tmp_path):
    sp, tp = str(tmp_path / "s.parquet"), str(tmp_path / "t.parquet")
    _write(sp, roles=["user"] * 4, ids=["conv-1"] * 4, nums=[1] * 4)
    _write(
        tp,
        roles=["bot", "bot", "system", "user"],
        ids=["conv-1"] * 4,
        nums=[1] * 4,
    )
    task = ValidationTask(
        task_key="t",
        source_path=sp,
        target_path=tp,
        enum_validations=[
            EnumValidation(column="role", allowed=["user", "assistant"])
        ],
    )
    res = _run(tmp_path, task)
    v = res.payload["enum_validation_role"]
    # most frequent violating value first, with its occurrence count
    assert v["target_sample_violations"] == "bot (x2), system (x1)"
    assert v["source_sample_violations"] == ""


def test_resume_recomputes_when_rule_added(tmp_path):
    """Adding a rule between runs + --resume must NOT silently PASS off
    pre-rule checkpoints: the spec signature forces a profile recompute."""
    sp, tp = str(tmp_path / "s.parquet"), str(tmp_path / "t.parquet")
    _write(sp, roles=["user"] * 8, ids=["conv-1"] * 8, nums=[1] * 8)
    _write(tp, roles=["user"] * 8, ids=["BAD!"] * 8, nums=[1] * 8)
    base = dict(
        task_key="t", source_path=sp, target_path=tp,
        count_tolerance=0.0,
    )
    out = str(tmp_path / "out")
    run_suite(
        ValidationSuite(validations=[ValidationTask(**base)]),
        RunConfig(results_dir=out, run_id=1),
    )
    # second run adds the pattern rule and resumes the same run_id
    task2 = ValidationTask(
        **base,
        pattern_validations=[PatternValidation(column="conv_id", regex=r"conv-\d+")],
    )
    s2 = run_suite(
        ValidationSuite(validations=[task2]),
        RunConfig(results_dir=out, run_id=1, resume=True),
    )
    v = s2.results[0].payload["pattern_validation_conv_id"]
    assert v["status"] == "FAIL"  # would be a 0/0 false PASS without the guard
    assert v["target_violations"] == "8"


def test_resume_recomputes_when_grammar_added(tmp_path):
    """Same guard for the keyed/conv bucket checkpoints."""
    from datapact_ray.config import SequenceGrammarCheck

    sp = str(tmp_path / "s.parquet")
    _write(sp, roles=["bot", "bot"], ids=["c1", "c1"], nums=[1, 2])
    base = dict(
        task_key="t", source_path=sp, target_path=sp,
        primary_keys=["conv_id", "turn_idx"], pk_row_hash_check=True,
    )
    out = str(tmp_path / "out")
    run_suite(
        ValidationSuite(validations=[ValidationTask(**base)]),
        RunConfig(results_dir=out, run_id=1),
    )
    task2 = ValidationTask(
        **base,
        sequence_grammar=SequenceGrammarCheck(
            role_column="role", allowed_roles=["user", "assistant"]
        ),
    )
    s2 = run_suite(
        ValidationSuite(validations=[task2]),
        RunConfig(results_dir=out, run_id=1, resume=True),
    )
    v = s2.results[0].payload["sequence_grammar_validation_conv_id"]
    assert v["status"] == "FAIL"
    assert int(v["unknown_role_rows"].replace(",", "")) == 4  # both sides


def test_enum_type_mismatch_fails_preflight(tmp_path):
    sp = str(tmp_path / "s.parquet")
    _write(sp, roles=["user"], ids=["conv-1"], nums=[1])
    import pytest

    task = ValidationTask(
        task_key="t", source_path=sp, target_path=sp,
        enum_validations=[EnumValidation(column="num", allowed=["user"])],
    )
    with pytest.raises(ValueError, match="do not fit"):
        run_suite(
            ValidationSuite(validations=[task]),
            RunConfig(results_dir=str(tmp_path / "out"), run_id=1),
        )
