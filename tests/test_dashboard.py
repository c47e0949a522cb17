"""Dashboard-as-code data layer (reference ds_* datasets,
client.py:780-1810 — see datapact_ray/dashboard.py's dataset map).

Strategy: run a failing suite (corrupted fixture pair) followed by a
passing self-pair suite into one results_dir, then assert each dataset's
semantics on the known outcome — which tasks failed, which check
families classify, how the latest-run filters and orderings behave.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def two_run_history(tmp_path_factory, fixture_pair):
    import ray  # noqa: F401  (session fixture owns init)

    from datapact_ray.config import ValidationSuite, ValidationTask
    from datapact_ray.runner import RunConfig, run_suite

    rdir = str(tmp_path_factory.mktemp("dash"))
    # run 1: corrupted pair (count FAILs) + passing self-pair, with
    # business metadata so the breakdown views have dimensions
    suite1 = ValidationSuite(
        validations=[
            ValidationTask(
                task_key="corrupted",
                source_path=fixture_pair["source"],
                target_path=fixture_pair["target"],
                primary_keys=["conv_id", "turn_idx"],
                count_tolerance=0.0001,
                pk_row_hash_check=True,
                uniqueness_columns=["conv_id", "turn_idx"],
                uniqueness_tolerance=0.0,
                business_domain="Transcripts",
                business_owner="data-eng",
                business_priority="CRITICAL",
                expected_sla_hours=4.0,
                estimated_impact_usd=10_000.0,
            ),
            ValidationTask(
                task_key="clean",
                source_path=fixture_pair["source"],
                target_path=fixture_pair["source"],
                count_tolerance=0.0,
                null_validation_columns=["role"],
                null_validation_tolerance=0.0,
                business_domain="Transcripts",
                business_owner="data-eng",
                business_priority="LOW",
            ),
        ]
    )
    run_suite(suite1, RunConfig(results_dir=rdir, run_id=1))
    # run 2: the corrupted task again (still failing), so history has
    # two runs and top-failures counts 2
    suite2 = ValidationSuite(validations=[suite1.validations[0]])
    run_suite(suite2, RunConfig(results_dir=rdir, run_id=2))
    return rdir


def _hist(rdir):
    from datapact_ray.rollup import load_run_history

    return load_run_history(rdir)


def test_top_failures_and_by_type(two_run_history):
    from datapact_ray.dashboard import failures_by_type, top_failures

    hist = _hist(two_run_history)
    tf = top_failures(hist)
    assert tf.iloc[0]["task_key"] == "corrupted"
    assert tf.iloc[0]["failure_count"] == 2  # failed in both runs
    assert "clean" not in tf["task_key"].tolist()

    # by-type: latest per (run_id, task), FAILURE only; the corrupted
    # pair fails count + row-hash + uniqueness → one DISTINCT task per
    # family (the same task across two runs still counts once per type)
    bt = failures_by_type(hist)
    by = dict(zip(bt["validation_type"], bt["failure_count"]))
    assert by.get("Row Count Mismatch") == 1
    assert by.get("Data Integrity Issue") == 1
    assert by.get("Duplicate Records") == 1
    assert "Data Completeness" not in by  # null check passed (run 1 clean task)


def test_trend_rates(two_run_history):
    from datapact_ray.dashboard import failure_rate_trend, success_trend

    hist = _hist(two_run_history)
    fr = failure_rate_trend(hist)
    # all three task rows land on one date: 2 FAILURE + 1 SUCCESS
    assert fr["validations_run"].sum() == 3
    total_fail = (hist["status"] == "FAILURE").sum()
    assert total_fail == 2
    st = success_trend(hist)
    assert len(st) >= 1
    # rates are per-date percentages in [0, 100]
    assert ((st["success_rate"] >= 0) & (st["success_rate"] <= 100)).all()


def test_failure_rate_trend_keeps_null_ts_group(two_run_history):
    """NULL validation_begin_ts rows group under a NaT run_date (the
    reference's date(validation_begin_ts) keeps NULLs as a NULL group),
    sorted last — they are no longer silently dropped (round-3 advice)."""
    import pandas as pd

    from datapact_ray.dashboard import failure_rate_trend

    hist = _hist(two_run_history).copy()
    hist.loc[hist.index[0], "validation_begin_ts"] = None
    fr = failure_rate_trend(hist)
    # every row is still counted somewhere
    assert fr["validations_run"].sum() == len(hist)
    null_group = fr[pd.isna(fr["run_date"])]
    assert len(null_group) == 1
    assert int(null_group["validations_run"].iloc[0]) == 1
    # the NaT group sorts last (SQL DESC NULLS LAST)
    assert pd.isna(fr["run_date"].iloc[-1])


def test_history_and_latest_run_details(two_run_history):
    from datapact_ray.dashboard import history_details, latest_run_details

    hist = _hist(two_run_history)
    hd = history_details(hist)
    assert len(hd) == 3
    # payload meta surfaced: configured PKs on the corrupted task
    pk = hd.loc[hd["task_key"] == "corrupted", "configured_primary_keys"]
    assert (pk == "conv_id, turn_idx").all()
    assert not hd["is_filtered"].any()  # no filters configured
    # ordered most-recent job first
    assert hd["job_start_ts"].is_monotonic_decreasing or len(set(hd["job_start_ts"])) > 1

    lr = latest_run_details(hist)
    # run 2 had only the corrupted task
    assert lr["task_key"].tolist() == ["corrupted"]
    assert lr["status"].tolist() == ["❌ FAILED"]
    assert (lr["run_id"] == 2).all()


def test_exploded_checks(two_run_history):
    from datapact_ray.dashboard import exploded_checks

    hist = _hist(two_run_history)
    ec = exploded_checks(hist)
    # latest run only → just the corrupted task's checks
    assert set(ec["validation_name"]) == {"corrupted"}
    types = set(ec["check_type"])
    assert "Count Check" in types
    assert "Row Hash Check" in types
    assert any(t.startswith("Uniqueness Check: ") for t in types)
    fail_rows = ec[ec["status"] == "❌ FAIL"]
    assert len(fail_rows) >= 3
    # reference detail strings: 'Source: .. | Target: .. | Diff: .. | Tolerance: ..'
    cc = ec[ec["check_type"] == "Count Check"]["details"].iloc[0]
    assert cc.startswith("Source: ") and " | Tolerance: " in cc
    rh = ec[ec["check_type"] == "Row Hash Check"]["details"].iloc[0]
    assert rh.startswith("Compared: ") and " rows | Mismatches: " in rh


def test_breakdown_views(two_run_history):
    from datapact_ray.dashboard import (
        business_impact,
        owner_accountability,
        priority_profile,
    )

    hist = _hist(two_run_history)
    bi = business_impact(two_run_history, hist)
    # latest run (run 2) had one failing Transcripts task
    assert bi.iloc[0]["business_domain"] == "Transcripts"
    assert bi.iloc[0]["failed_validations"] == 1
    assert bi.iloc[0]["quality_score"] == "0.0%"
    assert bi.iloc[0]["health_status"] == "🔴 Needs Attention"
    assert bi.iloc[0]["sla_profile"] == "Lightning Response (<=4h)"
    assert bi.iloc[0]["potential_impact_usd"] == "$10,000.00"
    assert bi.iloc[0]["last_issue"] != "No failures"

    oa = owner_accountability(two_run_history, hist)
    assert oa.iloc[0]["business_owner"] == "data-eng"
    assert oa.iloc[0]["realized_impact_usd"] == "$10,000.00"

    pp = priority_profile(two_run_history, hist)
    assert pp.iloc[0]["business_priority"] == "CRITICAL"
    assert pp.iloc[0]["failed_validations"] == 1


def test_parallel_kpi_and_cost(two_run_history):
    from datapact_ray.dashboard import cost_history, parallel_kpi

    hist = _hist(two_run_history)
    pk = parallel_kpi(hist)
    assert len(pk) == 1
    assert pk.iloc[0]["run_id"] == 2  # most recent run only
    assert pk.iloc[0]["total_tasks"] == 1
    assert pk.iloc[0]["peak_parallelism"] >= 1

    ch = cost_history(hist)
    assert sorted(ch["run_id"].tolist()) == [1, 2]
    assert (ch["estimated_cost_usd"] >= 0).all()
    # proxy identity: cost = hours × rate
    r = ch.iloc[0]
    assert r["estimated_cost_usd"] == pytest.approx(
        r["billable_task_hours"] * 0.22, abs=1e-9
    )


def test_write_dashboard_artifacts(two_run_history):
    """The runner already wrote the dashboard after each run — assert
    the persisted layer: every dataset parquet + the manifest."""
    base = os.path.join(two_run_history, "dashboard")
    with open(os.path.join(base, "dashboard.json")) as fh:
        manifest = json.load(fh)
    names = {d["name"] for d in manifest["datasets"]}
    assert len(names) == 14  # 13 round-3 datasets + ds_kpi
    for d in manifest["datasets"]:
        assert os.path.exists(d["path"]), d["name"]
        t = pq.read_table(d["path"]).to_pandas()
        assert len(t) == d["rows"]
    tf = pq.read_table(os.path.join(base, "ds_top_failures.parquet")).to_pandas()
    assert tf.iloc[0]["task_key"] == "corrupted"


def test_empty_history_frames(tmp_path):
    """Every dataset degrades to an empty frame on no history."""
    from datapact_ray import dashboard as D

    hist = pd.DataFrame()
    assert len(D.top_failures(hist)) == 0
    assert len(D.failures_by_type(hist)) == 0
    assert len(D.failure_rate_trend(hist)) == 0
    assert len(D.success_trend(hist)) == 0
    assert len(D.history_details(hist)) == 0
    assert len(D.latest_run_details(hist)) == 0
    assert len(D.exploded_checks(hist)) == 0
    assert len(D.business_impact(str(tmp_path), hist)) == 0
    assert len(D.owner_accountability(str(tmp_path), hist)) == 0
    assert len(D.priority_profile(str(tmp_path), hist)) == 0
    assert len(D.parallel_kpi(hist)) == 0
    assert len(D.cost_history(hist)) == 0


def test_status_flips_detector(tmp_path, fixture_pair):
    """Engine extension: a task alternating FAIL/PASS/FAIL across three
    runs scores 2 flips (rate 1.0); a stable task never appears with
    fewer than 2 runs."""
    import ray  # noqa: F401

    from datapact_ray.config import ValidationSuite, ValidationTask
    from datapact_ray.dashboard import status_flips
    from datapact_ray.rollup import load_run_history
    from datapact_ray.runner import RunConfig, run_suite

    rdir = str(tmp_path)

    def t(target):
        return ValidationTask(
            task_key="flappy", source_path=fixture_pair["source"],
            target_path=target, count_tolerance=0.0,
        )

    # FAIL (corrupted), PASS (self), FAIL (corrupted)
    for rid, tgt in (
        (1, fixture_pair["target"]),
        (2, fixture_pair["source"]),
        (3, fixture_pair["target"]),
    ):
        run_suite(
            ValidationSuite(validations=[t(tgt)]),
            RunConfig(results_dir=rdir, run_id=rid),
        )
    sf = status_flips(load_run_history(rdir))
    r = sf[sf["task_key"] == "flappy"].iloc[0]
    assert r["runs"] == 3 and r["flips"] == 2
    assert r["flip_rate"] == 1.0
    assert r["current_status"] == "FAILURE"
    # single-run tasks are excluded
    assert status_flips(load_run_history(rdir)[lambda d: d["run_id"] == 1]).empty


def test_report_failure_analysis_section(two_run_history):
    """report.md renders the dashboard failure-analysis tables."""
    import pyarrow.parquet as pq  # noqa: F401

    from datapact_ray.report import write_report

    paths = write_report(two_run_history, 2)
    with open(paths["md"]) as fh:
        md = fh.read()
    assert "## Failure analysis (dashboard datasets)" in md
    assert "### Top failing tasks" in md
    assert "corrupted" in md


def test_manifest_pages_and_widget_fields(two_run_history):
    """dashboard.json carries the three-page widget layout; every widget
    references a written dataset and only fields that exist in that
    dataset's frame (round-3 item #7)."""
    import json
    import os

    from datapact_ray.dashboard import write_dashboard

    frames = write_dashboard(two_run_history)
    manifest = json.load(
        open(os.path.join(two_run_history, "dashboard", "dashboard.json"))
    )
    assert [p["name"] for p in manifest["pages"]] == [
        "main_page", "details_page", "performance_page",
    ]
    names = {d["name"] for d in manifest["datasets"]}
    assert "ds_kpi" in names
    for page in manifest["pages"]:
        for w in page["layout"]:
            assert w["dataset"] in names
            cols = set(frames[w["dataset"]].columns)
            for fk in ("value_field", "x_field", "y_field", "category_field"):
                if fk in w:
                    assert w[fk] in cols, (
                        f"{page['name']}/{w['title']}: {w[fk]} missing "
                        f"from {w['dataset']}"
                    )
