"""Consolidated violation rows: the keyed/conv passes' per-bucket
violation files must surface into the user-facing violations tree
(north rule: violation rows are a first-class output, not a checkpoint
internal)."""

import os

import pyarrow.parquet as pq


def test_keyed_violations_surfaced(tmp_path, fixture_pair, ray_session):
    from datapact_ray.config import OrderingCheck, ValidationSuite, ValidationTask
    from datapact_ray.runner import RunConfig, run_suite

    rdir = str(tmp_path)
    task = ValidationTask(
        task_key="t",
        source_path=fixture_pair["source"],
        target_path=fixture_pair["target"],
        primary_keys=["conv_id", "turn_idx"],
        count_tolerance=0.001,
        pk_row_hash_check=True,
        compare_columns=["text"],
        ordering=OrderingCheck(),
    )
    s = run_suite(
        ValidationSuite(validations=[task]), RunConfig(results_dir=rdir, run_id=1)
    )
    assert s.results[0].status == "FAILURE"
    vpath = os.path.join(rdir, "violations", "run_id=1", "task=t", "keyed.parquet")
    assert os.path.exists(vpath)
    df = pq.read_table(vpath).to_pandas()
    assert set(df.columns) == {"task_key", "check_alias", "key", "side", "detail"}
    assert len(df) > 0
    aliases = set(df["check_alias"])
    # the corrupted fixture plants row-hash mismatches and ordering holes
    assert "row_hash_validation" in aliases
    assert any(a.startswith("ordering_validation_") for a in aliases)
    # deterministic consolidated order
    df2 = pq.read_table(vpath).to_pandas()
    assert df.equals(df2)


def test_clean_pair_writes_no_consolidated_file(tmp_path, fixture_pair, ray_session):
    from datapact_ray.config import ValidationSuite, ValidationTask
    from datapact_ray.runner import RunConfig, run_suite

    rdir = str(tmp_path)
    task = ValidationTask(
        task_key="clean",
        source_path=fixture_pair["source"],
        target_path=fixture_pair["source"],
        primary_keys=["conv_id", "turn_idx"],
        count_tolerance=0.0,
        pk_row_hash_check=True,
    )
    s = run_suite(
        ValidationSuite(validations=[task]), RunConfig(results_dir=rdir, run_id=1)
    )
    assert s.results[0].status == "SUCCESS"
    assert not os.path.exists(
        os.path.join(rdir, "violations", "run_id=1", "task=clean", "keyed.parquet")
    )


def test_stale_consolidated_file_retracted(tmp_path, fixture_pair, ray_session):
    """A same-run_id rerun whose recompute is CLEAN must remove the
    previous attempt's consolidated violations file — a stale violations
    parquet next to a SUCCESS results row misreports the run."""
    from datapact_ray.config import ValidationSuite, ValidationTask
    from datapact_ray.runner import RunConfig, run_suite

    rdir = str(tmp_path)

    def t(target):
        return ValidationTask(
            task_key="t", source_path=fixture_pair["source"],
            target_path=target, primary_keys=["conv_id", "turn_idx"],
            count_tolerance=0.001, pk_row_hash_check=True,
        )

    run_suite(ValidationSuite(validations=[t(fixture_pair["target"])]),
              RunConfig(results_dir=rdir, run_id=1))
    vpath = os.path.join(rdir, "violations", "run_id=1", "task=t", "keyed.parquet")
    assert os.path.exists(vpath)
    # rerun the SAME run_id against the clean self-pair
    s = run_suite(ValidationSuite(validations=[t(fixture_pair["source"])]),
                  RunConfig(results_dir=rdir, run_id=1))
    assert s.results[0].status == "SUCCESS"
    assert not os.path.exists(vpath)
