import glob
import json
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from datapact_ray.cli import main as cli_main


def test_cli_init_and_refuse_overwrite(tmp_path, capsys):
    out = tmp_path / "cfg.yml"
    assert cli_main(["init", "--output", str(out)]) == 0
    assert out.exists()
    assert cli_main(["init", "--output", str(out)]) == 1
    assert cli_main(["init", "--output", str(out), "--force"]) == 0


def test_cli_plan(tmp_path, capsys):
    cfg = tmp_path / "cfg.yml"
    cli_main(["init", "--output", str(cfg)])
    assert cli_main(["plan", "--config", str(cfg)]) == 0
    text = capsys.readouterr().out
    assert "Suite OK: 1 task(s)" in text
    assert "pass 2 (hash shuffle" in text
    assert "fused single scan" in text


def test_cli_run_fail_fast_exit(tmp_path, fixture_pair, capsys):
    cfg = tmp_path / "suite.yml"
    cfg.write_text(
        f"""
validations:
  - task_key: failing
    source_path: {fixture_pair['source']}
    target_path: {fixture_pair['target']}
    count_tolerance: 0.0
  - task_key: passing
    source_path: {fixture_pair['source']}
    target_path: {fixture_pair['source']}
    count_tolerance: 0.0
"""
    )
    rc = cli_main(
        ["run", "--config", str(cfg), "--results-dir", str(tmp_path / "out"),
         "--run-id", "3"]
    )
    assert rc == 1  # RAISE_ERROR analog: nonzero exit on any failure
    out = capsys.readouterr()
    assert "[FAILURE] failing" in out.out
    assert "[SUCCESS] passing" in out.out
    assert "validation tasks failed: 1 of 2" in out.err

    # --fail-fast stops at the first failing task: the passing task
    # after it never runs
    rc = cli_main(
        ["run", "--config", str(cfg), "--results-dir", str(tmp_path / "out2"),
         "--run-id", "4", "--fail-fast"]
    )
    assert rc == 1
    out = capsys.readouterr()
    assert "[FAILURE] failing" in out.out
    assert "[SUCCESS] passing" not in out.out


def test_exec_rollups_written(tmp_path, fixture_pair):
    from datapact_ray.config import ValidationSuite, ValidationTask
    from datapact_ray.runner import RunConfig, run_suite

    suite = ValidationSuite(
        validations=[
            ValidationTask(
                task_key="a",
                source_path=fixture_pair["source"],
                target_path=fixture_pair["target"],
                count_tolerance=0.0,
                business_domain="Sales",
                business_priority="Critical",
                estimated_impact_usd=1000.0,
            ),
            ValidationTask(
                task_key="b",
                source_path=fixture_pair["source"],
                target_path=fixture_pair["source"],
                count_tolerance=0.0,
                business_domain=" Sales ",
                estimated_impact_usd=50.0,
            ),
            ValidationTask(
                task_key="c",
                source_path=fixture_pair["source"],
                target_path=fixture_pair["source"],
                count_tolerance=0.0,
            ),
        ]
    )
    out = str(tmp_path / "res")
    run_suite(suite, RunConfig(results_dir=out, run_id=5))
    base = f"{out}/exec/run_id=5"
    summary = pq.read_table(f"{base}/exec_run_summary.parquet").to_pylist()[0]
    assert summary["total_tasks"] == 3
    assert summary["failure_count"] == 1
    assert summary["success_rate_percent"] == pytest.approx(66.67)
    assert summary["data_quality_score"] == pytest.approx(0.6667)
    assert summary["critical_failures"] == 1
    assert summary["potential_impact_usd"] == pytest.approx(1050.0)
    assert summary["realized_impact_usd"] == pytest.approx(1000.0)
    assert summary["failed_task_keys"] == ["a"]
    dom = pq.read_table(f"{base}/exec_domain_breakdown.parquet").to_pandas()
    # trimmed-coalesced dimension: ' Sales ' folds into 'Sales'
    assert set(dom["business_domain"]) == {"Sales", "Unspecified"}
    sales = dom[dom["business_domain"] == "Sales"].iloc[0]
    assert sales["total_validations"] == 2 and sales["failed_validations"] == 1
    prio = pq.read_table(f"{base}/exec_priority_breakdown.parquet").to_pandas()
    assert set(prio["business_priority"]) == {"CRITICAL", "UNSPECIFIED"}
    metrics = pq.read_table(f"{base}/run_metrics.parquet").to_pylist()[0]
    assert metrics["total_tasks"] == 3 and metrics["peak_parallel_tasks"] >= 1


def test_multimodal_plumbing(tmp_path):
    import ray.data

    from datapact_ray.pipelines.multimodal import (
        MediaFeaturizer,
        fake_decode,
        featurize_media,
        make_synthetic_media,
    )

    table = make_synthetic_media(64)
    ds = ray.data.from_arrow(table)
    out = featurize_media(ds, batch_size=16).to_pandas()
    assert len(out) == 64
    assert {"n_bytes", "mean_byte", "entropy_proxy"} <= set(out.columns)
    assert "payload" not in out.columns  # binary never enters a shuffle
    # determinism + stub gating
    f1 = fake_decode(b"abc123", "image/png")
    f2 = fake_decode(b"abc123", "image/png")
    assert f1 == f2 and f1["n_bytes"] == 6
    # decoder="real" now resolves to the vendored WAV/BMP/PNG codecs; an
    # unknown decoder name fails loudly, unsupported formats per payload
    with pytest.raises(ValueError):
        MediaFeaturizer(decoder="webp")
    with pytest.raises(NotImplementedError):
        MediaFeaturizer(decoder="real").decode(b"GIF89a..", "image/gif")


def test_multimodal_resize_and_frame_sample(tmp_path):
    import ray.data

    from datapact_ray.pipelines.multimodal import (
        FrameSampler,
        MediaResizer,
        make_synthetic_media,
        resize_media,
        sample_frames,
    )

    table = make_synthetic_media(48)
    ds = ray.data.from_arrow(table)

    resized = resize_media(ds, 32, 24, batch_size=16).to_pandas()
    assert len(resized) == 48
    assert (resized["width"] == 32).all() and (resized["height"] == 24).all()
    # fake decode contract: output payload is exactly w*h bytes
    assert resized["payload"].map(len).eq(32 * 24).all()

    frames = sample_frames(ds, batch_size=16).to_pandas()
    # one row per sampled frame; idx dense from 0 per media item
    assert set(frames.columns) == {"media_id", "frame_idx", "payload"}
    assert frames.groupby("media_id")["frame_idx"].min().eq(0).all()
    per_item = frames.groupby("media_id").size()
    assert per_item.ge(1).all()
    # determinism of the fake samplers
    f1 = FrameSampler()._fake_sample(b"x" * 2048, "video/mp4", 1000)
    f2 = FrameSampler()._fake_sample(b"x" * 2048, "video/mp4", 1000)
    assert f1 == f2 and len(f1) == 2  # 8 frames / stride 4
    with pytest.raises(ValueError):
        MediaResizer(2, 2, decoder="webp")
    with pytest.raises(ValueError):
        FrameSampler(decoder="webp")
    # real codecs exist for BMP/PNG resize / WAV sampling; other formats
    # raise per payload
    with pytest.raises(NotImplementedError):
        MediaResizer(2, 2, decoder="real").resize(b"....", "image/gif", 2, 2)
    with pytest.raises(NotImplementedError):
        FrameSampler(decoder="real").sample(b"....", "video/webm", 1000)


def test_roi_throughput_grading():
    from datapact_ray.roi import grade_throughput, processing_speed

    assert grade_throughput(1_500_000).startswith("Enterprise Elite")
    assert grade_throughput(100_000).startswith("Enterprise Standard")
    assert grade_throughput(50_000).startswith("Business")
    assert grade_throughput(1_000).startswith("Department")
    assert grade_throughput(10).startswith("Development")
    speed = processing_speed(1_000_000, 10.0)
    assert speed["records_per_second"] == 100_000.0
    assert speed["millions_per_hour"] == 360.0
    assert processing_speed(5, 0)["throughput_grade"] == "N/A"


def test_run_report_written_and_cli_rerender(tmp_path, fixture_pair, capsys):
    """Every run renders report.md/report.html (dashboard analog) next to
    the results parquet; `cli report` re-renders on demand."""
    from datapact_ray.config import ValidationSuite, ValidationTask
    from datapact_ray.runner import RunConfig, run_suite

    out = str(tmp_path / "rep")
    suite = ValidationSuite(
        validations=[
            ValidationTask(
                task_key="t",
                source_path=fixture_pair["source"],
                target_path=fixture_pair["target"],
                primary_keys=["conv_id", "turn_idx"],
                count_tolerance=0.001,
                pk_row_hash_check=True,
                business_priority="Critical",
                business_domain="AI Platform",
                estimated_impact_usd=100000,
            )
        ]
    )
    run_suite(suite, RunConfig(results_dir=out, run_id=3, num_buckets=4))
    rdir = f"{out}/results/run_id=3"
    md = open(f"{rdir}/report.md").read()
    assert "# datapact-ray run report" in md
    assert "row_hash_validation" in md and "count_validation" in md
    assert "ROI narrative" in md and "throughput_grade" in md
    html_text = open(f"{rdir}/report.html").read()
    assert "<table>" in html_text and "datapact-ray" in html_text
    # CLI re-render
    os.remove(f"{rdir}/report.md")
    assert cli_main(["report", "--results-dir", out, "--run-id", "3"]) == 0
    assert os.path.exists(f"{rdir}/report.md")


def test_roi_narrative_formulas():
    """ROI math parity with reference roi_calculator.py:64-118."""
    from datapact_ray.roi import QualityMetrics, annual_roi, monthly_savings

    m = QualityMetrics(
        total_validations=10, passed_validations=9, failed_validations=1,
        critical_failures=2, tables_validated=5, records_processed=1_000_000,
        avg_runtime_seconds=10.0, data_quality_score=96.0,
    )
    s = monthly_savings(m)
    assert s["labor_savings"] == 40.0 * 4.33 * 125.0
    assert s["incident_prevention"] == 2 * 0.8 * 150_000.0
    assert s["compliance_savings"] == 500_000.0 / 12 * 0.1  # score >= 95
    expected_rev = 1_000_000_000 * 0.30 / 12 * (10.0 / 100) * 0.05
    assert abs(s["revenue_protection"] - expected_rev) < 1e-6
    r = annual_roi(m)
    assert r["annual_savings"] == s["total_monthly_savings"] * 12
    assert r["net_benefit"] == r["annual_savings"] - 250_000.0


def test_cross_run_trend_tables(tmp_path):
    """Two suites back-to-back into the same results_dir: the trend
    frames (reference dashboards' 30/60-run datasets,
    client.py:1586-1760) must cover BOTH runs, and report.md must carry
    the trend section."""
    import ray  # noqa: F401  (session fixture owns init)

    from datapact_ray.config import ValidationSuite, ValidationTask
    from datapact_ray.rollup import (
        job_performance_trend,
        load_run_history,
        parallel_efficiency_trend,
        runtime_trend,
        task_performance_trend,
    )
    from datapact_ray.runner import RunConfig, run_suite

    sf = "/root/testdata/sf0.001"
    suite = ValidationSuite(
        validations=[
            ValidationTask(
                task_key="orders_self",
                source_path=f"{sf}/orders.parquet",
                target_path=f"{sf}/orders.parquet",
                count_tolerance=0.0,
            )
        ]
    )
    rdir = str(tmp_path)
    run_suite(suite, RunConfig(results_dir=rdir, run_id=1))
    run_suite(suite, RunConfig(results_dir=rdir, run_id=2))

    hist = load_run_history(rdir)
    assert sorted(hist["run_id"].unique().tolist()) == [1, 2]

    jp = job_performance_trend(hist)
    assert sorted(jp["run_id"].tolist()) == [1, 2]
    assert (jp["tasks_run"] == 1).all()
    assert (jp["successful_tasks"] == 1).all()

    tp = task_performance_trend(hist)
    assert tp["total_runs"].tolist() == [2]
    assert tp["success_rate_percent"].tolist() == [100.0]

    rt = runtime_trend(hist)
    assert rt["num_runs"].sum() == 2

    pe = parallel_efficiency_trend(hist)
    assert pe["recency_rank"].tolist() == [1, 2]
    assert pe["run_id"].tolist() == [2, 1]  # most recent first

    # persisted trend tables + report trend section
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(rdir, "trends", "trend_job_performance.parquet")
    ).to_pandas()
    assert sorted(t["run_id"].tolist()) == [1, 2]
    with open(os.path.join(rdir, "results", "run_id=2", "report.md")) as fh:
        md = fh.read()
    assert "## Trends (cross-run history)" in md
    assert "Job runs (last 30)" in md


def test_cli_incremental_flags(tmp_path, capsys):
    """--persist-keyed-inputs / --incremental-from wire through to the
    runner: run 2 reuses run 1's state and records it in lineage."""
    import json as _json

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "data"
    d.mkdir()
    df = pd.DataFrame(
        {
            "conv_id": np.repeat([f"c{i}" for i in range(50)], 4),
            "turn_idx": np.tile(np.arange(4), 50),
            "text": [f"t{i}" for i in range(200)],
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), str(d / "p0.parquet"))
    cfg = tmp_path / "suite.yml"
    cfg.write_text(
        f"""
validations:
  - task_key: t
    source_path: {d}
    target_path: {d}
    primary_keys: [conv_id, turn_idx]
    count_tolerance: 0.0
    pk_row_hash_check: true
"""
    )
    out = str(tmp_path / "out")
    rc = cli_main(
        ["run", "--config", str(cfg), "--results-dir", out, "--run-id", "1",
         "--persist-keyed-inputs"]
    )
    assert rc == 0
    import os

    assert os.path.exists(
        os.path.join(out, "checkpoint", "run_id=1", "task=t", "keyed",
                     "_INPUTS_COMPLETE")
    )
    df2 = df.copy()
    df2["conv_id"] = df2["conv_id"] + "x"
    pq.write_table(pa.Table.from_pandas(df2, preserve_index=False), str(d / "p1.parquet"))
    rc = cli_main(
        ["run", "--config", str(cfg), "--results-dir", out, "--run-id", "2",
         "--incremental-from", "1"]
    )
    assert rc == 0
    lineage = _json.load(
        open(os.path.join(out, "checkpoint", "run_id=2", "task=t", "lineage.json"))
    )
    assert lineage["incremental_keyed"]["keyed"]["from_run_id"] == 1
