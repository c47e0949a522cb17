"""Config-model validation (reference test category:
``tests/test_config_validators.py``)."""

import pytest
from pydantic import ValidationError

from datapact_ray.config import (
    AggValidationDetail,
    CustomCheck,
    ValidationSuite,
    ValidationTask,
    load_suite,
)


def _task(**kw):
    base = dict(task_key="t", source_path="/a", target_path="/b")
    base.update(kw)
    return ValidationTask(**base)


def test_tolerances_must_be_ratios():
    for field in (
        "count_tolerance",
        "pk_hash_tolerance",
        "null_validation_tolerance",
        "uniqueness_tolerance",
        "compare_tolerance",
    ):
        _task(**{field: 0.0})
        _task(**{field: 1.0})
        with pytest.raises(ValidationError):
            _task(**{field: 1.5})
        with pytest.raises(ValidationError):
            _task(**{field: -0.1})


def test_priority_enum_normalized():
    assert _task(business_priority="critical").business_priority == "CRITICAL"
    assert _task(business_priority=" High ").business_priority == "HIGH"
    with pytest.raises(ValidationError):
        _task(business_priority="urgent")


def test_non_negative_business_metadata():
    with pytest.raises(ValidationError):
        _task(expected_sla_hours=-1)
    with pytest.raises(ValidationError):
        _task(estimated_impact_usd=-5.0)


def test_filter_normalization():
    assert _task(filter="  x > 1  ").filter == "x > 1"
    with pytest.raises(ValidationError):
        _task(filter="   ")
    with pytest.raises(ValidationError):
        _task(filter="x > 1;")


def test_agg_validation_rules():
    assert AggValidationDetail(agg="sum", tolerance=0.1).agg == "SUM"
    with pytest.raises(ValidationError):
        AggValidationDetail(agg="MEDIAN", tolerance=0.1)
    with pytest.raises(ValidationError):
        AggValidationDetail(agg="SUM", tolerance=2.0)


def test_custom_check_name_rules():
    CustomCheck(name="My Check-1", sql="SELECT 1")
    with pytest.raises(ValidationError):
        CustomCheck(name="", sql="SELECT 1")
    with pytest.raises(ValidationError):
        CustomCheck(name="bad;name", sql="SELECT 1")
    with pytest.raises(ValidationError):
        CustomCheck(name="x", sql="SELECT 1;")
    with pytest.raises(ValidationError):
        CustomCheck(name="x", sql="   ")


def test_custom_check_slug_collision():
    # distinct names that slug to the same identifier must be rejected
    # (reference: config.py:214-238)
    with pytest.raises(ValidationError, match="after sanitization"):
        _task(
            custom_checks=[
                CustomCheck(name="status totals", sql="SELECT 1"),
                CustomCheck(name="Status  Totals", sql="SELECT 2"),
            ]
        )
    with pytest.raises(ValidationError, match="Duplicate custom check name"):
        _task(
            custom_checks=[
                CustomCheck(name="same", sql="SELECT 1"),
                CustomCheck(name="SAME", sql="SELECT 2"),
            ]
        )


def test_duplicate_task_keys_rejected():
    with pytest.raises(ValidationError, match="Duplicate task_key"):
        ValidationSuite(validations=[_task(), _task()])


def test_load_suite_yaml(tmp_path):
    p = tmp_path / "s.yml"
    p.write_text(
        """
validations:
  - task_key: a
    source_path: /x
    target_path: /y
    count_tolerance: 0.01
    ordering: {group_column: conv_id, index_column: turn_idx}
    drift:
      - {column: ts, metric: ks, threshold: 0.1}
"""
    )
    suite = load_suite(str(p))
    assert suite.validations[0].ordering.group_column == "conv_id"
    assert suite.validations[0].drift[0].metric == "ks"
    assert suite.validations[0].has_any_check
