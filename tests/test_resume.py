"""Resumability (north rule): an interrupted run resumes without
recomputing validated partitions, and produces identical verdicts."""

import glob
import os
import time

import pytest

from datapact_ray.config import OrderingCheck, ValidationSuite, ValidationTask
from datapact_ray.runner import RunConfig, run_suite


@pytest.fixture(scope="module")
def suite(fixture_pair):
    return ValidationSuite(
        validations=[
            ValidationTask(
                task_key="t",
                source_path=fixture_pair["source"],
                target_path=fixture_pair["target"],
                primary_keys=["conv_id", "turn_idx"],
                count_tolerance=0.001,
                pk_row_hash_check=True,
                uniqueness_columns=["conv_id", "turn_idx"],
                uniqueness_tolerance=0.0,
                compare_columns=["text"],
                ordering=OrderingCheck(),
            )
        ]
    )


def test_resume_identical_and_partial_recompute(suite, tmp_path):
    out = str(tmp_path / "res")
    cfg = RunConfig(results_dir=out, run_id=11, num_buckets=8)
    s1 = run_suite(suite, cfg)
    p1 = s1.results[0].payload

    ck = f"{out}/checkpoint/run_id=11/task=t"
    keyed_markers = sorted(glob.glob(f"{ck}/keyed/bucket=*/_SUCCESS"))
    assert len(keyed_markers) >= 2  # ordering checks ride the keyed shuffle

    # simulate an interrupted run: two keyed buckets lost
    os.remove(keyed_markers[0])
    os.remove(keyed_markers[-1])
    kept_marker = keyed_markers[1]
    kept_mtime_before = os.path.getmtime(
        os.path.join(os.path.dirname(kept_marker), "metrics.pkl")
    )
    time.sleep(0.05)

    s2 = run_suite(suite, RunConfig(results_dir=out, run_id=11, num_buckets=8,
                                    resume=True))
    p2 = s2.results[0].payload
    assert p1 == p2  # identical verdicts after resume

    # the completed bucket was NOT recomputed (its checkpoint untouched)
    kept_mtime_after = os.path.getmtime(
        os.path.join(os.path.dirname(kept_marker), "metrics.pkl")
    )
    assert kept_mtime_after == kept_mtime_before
    # the deleted buckets were recomputed (markers rewritten)
    assert os.path.exists(keyed_markers[0])
    assert os.path.exists(keyed_markers[-1])


def test_profile_checkpoint_reused(suite, tmp_path):
    out = str(tmp_path / "res2")
    cfg = RunConfig(results_dir=out, run_id=12, num_buckets=8)
    run_suite(suite, cfg)
    prof = f"{out}/checkpoint/run_id=12/task=t/profile_source.pkl"
    mtime = os.path.getmtime(prof)
    time.sleep(0.05)
    run_suite(suite, RunConfig(results_dir=out, run_id=12, num_buckets=8, resume=True))
    assert os.path.getmtime(prof) == mtime  # loaded, not recomputed


def test_non_resume_rerun_ignores_stale_checkpoints(tmp_path, fixture_pair):
    """A fresh run with the same results_dir/run_id after the DATA changed
    must report fresh verdicts — stale bucket checkpoints may not merge in
    (they are cleared when resume is not requested)."""
    out = str(tmp_path / "res4")

    def task_for(target):
        return ValidationSuite(
            validations=[
                ValidationTask(
                    task_key="t",
                    source_path=fixture_pair["source"],
                    target_path=target,
                    primary_keys=["conv_id", "turn_idx"],
                    count_tolerance=0.001,
                    pk_row_hash_check=True,
                    compare_columns=["text"],
                )
            ]
        )

    # run 1: corrupted pair -> FAILURE; run 2 (no resume): self-pair -> SUCCESS
    s1 = run_suite(task_for(fixture_pair["target"]),
                   RunConfig(results_dir=out, run_id=14, num_buckets=8))
    assert s1.results[0].status == "FAILURE"
    s2 = run_suite(task_for(fixture_pair["source"]),
                   RunConfig(results_dir=out, run_id=14, num_buckets=8))
    assert s2.results[0].status == "SUCCESS"
    rh = s2.results[0].payload["row_hash_validation"]
    assert rh["mismatch_count"] == "0"


def test_resume_refuses_lineage_mismatch(suite, tmp_path, fixture_pair):
    """Resuming against checkpoints from different inputs or a different
    bucketing must fail loudly, not mix incompatible bucket metrics."""
    out = str(tmp_path / "res5")
    run_suite(suite, RunConfig(results_dir=out, run_id=15, num_buckets=8))

    changed = ValidationSuite(
        validations=[
            ValidationTask(
                task_key="t",
                source_path=fixture_pair["source"],
                target_path=fixture_pair["source"],  # different input set
                primary_keys=["conv_id", "turn_idx"],
                count_tolerance=0.001,
                pk_row_hash_check=True,
                uniqueness_columns=["conv_id", "turn_idx"],
                uniqueness_tolerance=0.0,
                compare_columns=["text"],
                ordering=OrderingCheck(),
            )
        ]
    )
    with pytest.raises(ValueError, match="lineage"):
        run_suite(changed, RunConfig(results_dir=out, run_id=15, num_buckets=8,
                                     resume=True))
    with pytest.raises(ValueError, match="lineage"):
        run_suite(suite, RunConfig(results_dir=out, run_id=15, num_buckets=4,
                                   resume=True))
    # resume without an explicit bucket count adopts the checkpointed one
    s = run_suite(suite, RunConfig(results_dir=out, run_id=15, resume=True))
    assert s.results[0].status in ("SUCCESS", "FAILURE")


def test_lineage_manifest_written(suite, tmp_path, fixture_pair):
    import json

    out = str(tmp_path / "res3")
    run_suite(suite, RunConfig(results_dir=out, run_id=13, num_buckets=8))
    with open(f"{out}/checkpoint/run_id=13/task=t/lineage.json") as fh:
        lineage = json.load(fh)
    assert lineage["task_key"] == "t"
    assert lineage["partitioning"]["num_buckets"] == 8
    assert all(
        f.startswith(fixture_pair["source"]) for f in lineage["source_files"]
    )
    assert lineage["source_files"] == sorted(lineage["source_files"])


def test_resume_on_different_cluster_size_keeps_routing(tmp_path, monkeypatch):
    """Resuming on a different-size cluster must derive the hot/cold
    salting threshold from the CHECKPOINTED bucket count, not the live
    CPU count — otherwise a conversation can flip hot->cold between the
    original run and the resume, routing its rows differently than the
    reused checkpoints assume.

    Fixture geometry: 5000 small convs (40k rows) dominate est_rows, and
    one 8300-turn conv spans TWO salt shards (span 8192), so hot routing
    (combine(gh, shard)) differs from cold routing for its tail rows;
    12 shards keep two whole files inside the conv so footer statistics
    detect it.
    At 32 CPUs the threshold is 2*48.3k/32 ≈ 3k -> conv HOT; a fresh
    4-CPU sizing would give 2*48.3k/4 ≈ 24k -> conv COLD."""
    import ray

    from datapact_ray.datagen import write_fixture_pair

    paths = write_fixture_pair(
        str(tmp_path / "hotres"), n_convs=5000, turns_per_conv=8,
        hot_convs=1, hot_turns=8300, n_files=12,
    )
    hot_suite = ValidationSuite(
        validations=[
            ValidationTask(
                task_key="t",
                source_path=paths["source"],
                target_path=paths["target"],
                primary_keys=["conv_id", "turn_idx"],
                count_tolerance=0.001,
                pk_row_hash_check=True,
                uniqueness_columns=["conv_id", "turn_idx"],
                uniqueness_tolerance=0.0,
                compare_columns=["text"],
                ordering=OrderingCheck(),
            )
        ]
    )
    out = str(tmp_path / "res_cluster")

    monkeypatch.setattr(ray, "cluster_resources", lambda: {"CPU": 32.0})
    cfg = RunConfig(results_dir=out, run_id=13, hot_key_threshold=20)
    p1 = run_suite(hot_suite, cfg).results[0].payload

    # the hot conv's two shards land in two distinct buckets; losing
    # exactly ONE of them is the adversarial case — a resume that
    # re-derives a different hot/cold split re-routes the conv's rows
    # and either double-counts them (recomputed cold bucket gets ALL
    # rows while the kept shard checkpoint still holds its slice) or
    # loses the tail shard entirely
    import pickle

    ck = f"{out}/checkpoint/run_id=13/task=t"
    shard_buckets = []
    for mp in sorted(glob.glob(f"{ck}/keyed/bucket=*/metrics.pkl")):
        if pickle.load(open(mp, "rb")).hot_partials:
            shard_buckets.append(os.path.dirname(mp))
    assert len(shard_buckets) >= 2, "conv must span >=2 salt-shard buckets"
    os.remove(os.path.join(shard_buckets[0], "_SUCCESS"))

    monkeypatch.setattr(ray, "cluster_resources", lambda: {"CPU": 4.0})
    p2 = run_suite(
        hot_suite,
        RunConfig(results_dir=out, run_id=13, hot_key_threshold=20, resume=True),
    ).results[0].payload
    assert p1 == p2
