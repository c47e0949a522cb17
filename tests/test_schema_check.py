"""SchemaCheck: declarative footer-only schema contract — required
columns + exact types, extra-column policy, side-identity rule."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datapact_ray.config import SchemaCheck, ValidationSuite, ValidationTask
from datapact_ray.runner import RunConfig, run_suite


def _write(path, schema_cols):
    os.makedirs(path, exist_ok=True)
    table = pa.table(
        {name: pa.array(vals, type=typ) for name, (typ, vals) in schema_cols.items()}
    )
    pq.write_table(table, os.path.join(path, "part-0.parquet"))
    return path


@pytest.fixture(scope="module")
def tables(tmp_path_factory):
    root = tmp_path_factory.mktemp("schemas")
    good = {
        "conv_id": (pa.string(), ["a", "b"]),
        "turn_idx": (pa.int32(), [0, 0]),
        "text": (pa.string(), ["x", "y"]),
    }
    # target: turn_idx re-typed, text renamed, extra column added
    drifted = {
        "conv_id": (pa.string(), ["a", "b"]),
        "turn_idx": (pa.int64(), [0, 0]),
        "body": (pa.string(), ["x", "y"]),
        "extra": (pa.float64(), [1.0, 2.0]),
    }
    return {
        "good": _write(str(root / "good"), good),
        "drifted": _write(str(root / "drifted"), drifted),
    }


def _verdict(tables, tmp_path, check, tgt="drifted"):
    task = ValidationTask(
        task_key="s",
        source_path=tables["good"],
        target_path=tables[tgt],
        schema_check=check,
    )
    s = run_suite(
        ValidationSuite(validations=[task]),
        RunConfig(results_dir=str(tmp_path), run_id=1),
    )
    res = s.results[0]
    return res, next(v for v in res.verdicts if v.alias == "schema_validation")


CONTRACT = {"conv_id": "string", "turn_idx": "int32", "text": "string"}


def test_schema_contract_failures(tables, tmp_path):
    res, v = _verdict(tables, tmp_path, SchemaCheck(columns=CONTRACT))
    assert not v.passed and res.status == "FAILURE"
    p = v.payload
    assert "text" in p["target_missing_columns"]
    assert "turn_idx (expected int32, got int64)" in p["target_type_mismatches"]
    assert "source_missing_columns" not in p  # source conforms
    assert p["schema_problems"] == "2"  # extra allowed by default


def test_schema_extra_and_same(tables, tmp_path):
    _, v = _verdict(
        tables,
        tmp_path / "x",
        SchemaCheck(columns=CONTRACT, allow_extra=False, require_same=True),
    )
    p = v.payload
    assert "body" in p["target_unexpected_columns"]
    assert "extra" in p["target_unexpected_columns"]
    assert "text: string" in p["only_in_source"]
    assert "turn_idx: int64" in p["only_in_target"]


def test_schema_pass_and_type_aliases(tables, tmp_path):
    res, v = _verdict(
        tables,
        tmp_path / "ok",
        # alias forms resolve: str -> string, int32 exact
        SchemaCheck(columns={"conv_id": "str", "turn_idx": "int32"}),
        tgt="good",
    )
    assert v.passed and res.status == "SUCCESS"
    assert v.payload["schema_problems"] == "0"


def test_schema_sides_and_noop_rejected(tables, tmp_path):
    _, v = _verdict(
        tables,
        tmp_path / "src",
        SchemaCheck(columns=CONTRACT, sides="source"),
    )
    assert v.passed  # only the conforming side is checked
    with pytest.raises(ValueError, match="never fail"):
        SchemaCheck()


def test_schema_failure_short_circuits(tables, tmp_path):
    """A broken contract returns the schema verdict WITHOUT submitting
    any distributed pass — previously a renamed PK column crashed with a
    raw KeyError inside a map task before any verdict was written."""
    task = ValidationTask(
        task_key="s",
        source_path=tables["good"],
        target_path=tables["drifted"],
        primary_keys=["conv_id", "text"],  # 'text' renamed on target
        pk_row_hash_check=True,
        schema_check=SchemaCheck(columns=CONTRACT),
    )
    s = run_suite(
        ValidationSuite(validations=[task]),
        RunConfig(results_dir=str(tmp_path / "sc"), run_id=1),
    )
    res = s.results[0]
    assert res.status == "FAILURE"
    assert [v.alias for v in res.verdicts] == ["schema_validation"]
