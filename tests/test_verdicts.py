"""Tolerance-arithmetic quirk tests mirroring the reference's semantics
(``/root/reference/datapact/templates/validation.sql.j2``)."""

from datapact_ray import verdicts as V
from datapact_ray.identifiers import fmt_number, fmt_percent, make_identifier


def test_make_identifier_rules():
    assert make_identifier("Status Totals") == "status_totals"
    assert make_identifier("  A  B--C  ") == "a_b_c"
    assert make_identifier("123abc", prefix="custom_sql") == "custom_sql_123abc"
    assert make_identifier("!!!", prefix="x") == "x"


def test_formatting():
    assert fmt_number(1234567, 0) == "1,234,567"
    assert fmt_number(1234.5678, 2) == "1,234.57"
    assert fmt_number(None) is None
    assert fmt_percent(0.05) == "5.00%"
    assert fmt_percent(None) is None


def test_count_source_zero_passes_even_if_target_nonzero():
    # validation.sql.j2:334-336 — COALESCE(.../NULLIF(s,0), 0) quirk
    v = V.count_verdict(0, 500, tolerance=0.0)
    assert v.passed
    assert v.payload["relative_diff_percent"] == "0.00%"


def test_count_basic_fail():
    v = V.count_verdict(1000, 989, tolerance=0.01)
    assert not v.passed
    assert v.payload["relative_diff_percent"] == "1.10%"
    assert v.payload["source_count"] == "1,000"


def test_agg_null_side_passes():
    # validation.sql.j2:41,461 — NULL agg => NULL diff => COALESCE 0 => PASS
    v = V.agg_verdict("c", "SUM", None, 123.0, tolerance=0.0)
    assert v.passed
    assert v.payload["relative_diff_percent"] is None
    assert v.payload["source_value"] is None


def test_agg_symmetric_denominator():
    v = V.agg_verdict("c", "SUM", 100.0, 80.0, tolerance=0.19)
    # abs diff 20 / max(100,80)=100 -> 0.2 > 0.19
    assert not v.passed
    assert v.payload["relative_diff_percent"] == "20.00%"
    assert V.agg_rel_diff(0.0, 0.0) == 0.0
    assert V.agg_rel_diff(5.0, 5.0) == 0.0


def test_null_with_pk_zero_rule():
    # source 0 nulls => target must be 0 (any tolerance)
    assert not V.null_verdict("c", 0, 1, 1.0, with_primary_keys=True).passed
    v = V.null_verdict("c", 0, 1, 1.0, with_primary_keys=True)
    assert v.payload["relative_diff_percent"] == "100.00%"
    assert V.null_verdict("c", 0, 0, 0.0, with_primary_keys=True).passed
    assert V.null_verdict("c", 10, 11, 0.1, with_primary_keys=True).passed
    assert not V.null_verdict("c", 10, 12, 0.1, with_primary_keys=True).passed


def test_null_without_pk_display_modes():
    v = V.null_verdict("c", 5, 0, 0.5, with_primary_keys=False)
    assert v.payload["relative_diff_percent"] == "100.00%"
    assert not v.passed  # diff 5/5=1.0 > 0.5
    v = V.null_verdict("c", 0, 0, 0.0, with_primary_keys=False)
    assert v.passed and v.payload["relative_diff_percent"] == "0.00%"


def test_uniqueness_both_sides():
    v = V.uniqueness_verdict(["a", "b"], 100, 100, 100, 95, 0.01)
    assert v.alias == "uniqueness_validation_a_b"
    assert not v.passed
    assert v.payload["target_duplicates"] == "5"
    assert v.payload["target_dupe_percent"] == "5.00%"
    assert V.uniqueness_verdict(["a"], 0, 0, 0, 0, 0.0).passed


def test_row_hash_default_tolerance_zero():
    assert not V.row_hash_verdict(100, 1, None).passed
    assert V.row_hash_verdict(0, 0, None).passed


def test_payload_assembly_empty_and_order():
    payload, ok = V.assemble_payload("t1", None, None, [])
    assert ok and payload["message"] == "No validations configured for task t1"
    vs = [V.count_verdict(1, 1, 0.0), V.uniqueness_verdict(["k"], 1, 1, 1, 1, 0.0)]
    payload, ok = V.assemble_payload("t1", "x > 1", ["k"], vs)
    assert ok
    assert payload["applied_filter"] == "x > 1"
    assert payload["configured_primary_keys"] == "k"
    keys = list(payload)
    assert keys[:2] == ["applied_filter", "configured_primary_keys"]
    assert keys[2] == "count_validation"
