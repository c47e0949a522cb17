"""Static run report: the engine-side analog of the reference's
Lakeview dashboard (``/root/reference/datapact/dashboard_builder.py`` /
``client.py:678+``). Instead of a hosted dashboard, one run renders to a
self-contained ``report.md`` + ``report.html`` next to the results
parquet — run summary, per-task check matrix, domain/priority rollups,
throughput grade and the ROI narrative (``roi_calculator.py`` parity).

Everything here reads the SMALL result/rollup frames (one row per task),
never the validated data."""

from __future__ import annotations

import html
import json
import os

import pandas as pd
import pyarrow.parquet as pq

from .roi import QualityMetrics, annual_roi, monthly_savings, processing_speed
from .rollup import breakdown_frame, run_summary_frame


def _check_matrix(rows: pd.DataFrame) -> pd.DataFrame:
    """One row per (task, check) with status + headline numbers."""
    out = []
    for _, r in rows.iterrows():
        payload = json.loads(r["result_payload"])
        for alias, body in payload.items():
            if not isinstance(body, dict) or "status" not in body:
                continue
            detail = {
                k: v
                for k, v in body.items()
                if k != "status" and not isinstance(v, (dict, list))
            }
            out.append(
                {
                    "task_key": r["task_key"],
                    "check": alias,
                    "status": body["status"],
                    "detail": ", ".join(f"{k}={v}" for k, v in list(detail.items())[:4]),
                }
            )
    return pd.DataFrame(out)


def _md_table(df: pd.DataFrame) -> str:
    if df.empty:
        return "_(none)_\n"
    cols = list(df.columns)
    lines = ["| " + " | ".join(cols) + " |", "|" + "---|" * len(cols)]
    for _, r in df.iterrows():
        lines.append("| " + " | ".join(str(r[c]) for c in cols) + " |")
    return "\n".join(lines) + "\n"


def _quality_metrics(rows: pd.DataFrame, records_processed: int) -> QualityMetrics:
    summary = run_summary_frame(rows).iloc[0]
    runtimes = (
        rows["validation_complete_ts"] - rows["validation_begin_ts"]
    ).dt.total_seconds()
    return QualityMetrics(
        total_validations=int(summary["total_tasks"]),
        passed_validations=int(summary["success_count"]),
        failed_validations=int(summary["failure_count"]),
        critical_failures=int(summary["critical_failures"]),
        tables_validated=int(rows["source_table"].nunique()),
        records_processed=records_processed,
        avg_runtime_seconds=float(runtimes.mean()) if len(runtimes) else 0.0,
        data_quality_score=float(summary["success_rate_percent"]),
    )


def build_report_md(
    rows: pd.DataFrame,
    records_processed: int = 0,
    history: pd.DataFrame | None = None,
    dashboard_frames: dict | None = None,
) -> str:
    """Render the run report as markdown from the results frame.
    ``history`` (all runs' result rows) adds the cross-run trend
    section mirroring the reference dashboards' 30/60-run datasets.
    ``dashboard_frames`` (the dict ``write_dashboard`` just computed in
    the same post-run hook) supplies the failure-analysis frames so they
    aren't recomputed O(history) a second time per run."""
    summary = run_summary_frame(rows).iloc[0]
    qm = _quality_metrics(rows, records_processed)
    total_runtime = qm.avg_runtime_seconds * max(qm.total_validations, 1)
    speed = processing_speed(records_processed, total_runtime)
    savings = monthly_savings(qm)
    roi = annual_roi(qm)

    md = [
        f"# datapact-ray run report — run_id={summary['run_id']}",
        "",
        "## Summary",
        "",
        _md_table(
            pd.DataFrame(
                {
                    "tasks": [qm.total_validations],
                    "passed": [qm.passed_validations],
                    "failed": [qm.failed_validations],
                    "success_rate": [f"{qm.success_rate:.2f}%"],
                    "critical_failures": [qm.critical_failures],
                    "records_processed": [f"{records_processed:,}"],
                    "throughput_grade": [speed["throughput_grade"]],
                }
            )
        ),
        "## Checks",
        "",
        _md_table(_check_matrix(rows)),
        "## Rollups",
        "",
        "### By business domain",
        "",
        _md_table(breakdown_frame(rows, "business_domain", "Unspecified")),
        "### By priority",
        "",
        _md_table(breakdown_frame(rows, "business_priority", "Unspecified")),
        "## ROI narrative (reference cost model)",
        "",
        _md_table(
            pd.DataFrame(
                {
                    "monthly_savings_usd": [f"{savings['total_monthly_savings']:,.0f}"],
                    "annual_savings_usd": [f"{roi['annual_savings']:,.0f}"],
                    "roi_percent": [f"{roi['roi_percentage']:.1f}%"],
                    "payback_months": [f"{roi['payback_period_months']:.1f}"],
                    "five_year_value_usd": [f"{roi['five_year_value']:,.0f}"],
                }
            )
        ),
    ]
    from .roi import generate_executive_summary

    md += [
        "## Executive summary (reference narrative)",
        "",
        "```",
        generate_executive_summary(qm).strip("\n"),
        "```",
        "",
    ]
    if history is not None and len(history):
        from .rollup import (
            job_performance_trend,
            runtime_trend,
            task_performance_trend,
        )

        md += [
            "## Trends (cross-run history)",
            "",
            "### Job runs (last 30)",
            "",
            _md_table(job_performance_trend(history)),
            "### Runtime by day (last 30)",
            "",
            _md_table(runtime_trend(history)),
            "### Per-task performance (all runs)",
            "",
            _md_table(task_performance_trend(history)),
        ]
        if dashboard_frames is not None:
            tf = dashboard_frames["ds_top_failures"]
            bt = dashboard_frames["ds_failures_by_type"]
            fl = dashboard_frames["ds_status_flips"]
        else:
            from .dashboard import failures_by_type, status_flips, top_failures

            tf = top_failures(history)
            bt = failures_by_type(history)
            fl = status_flips(history)
        if len(tf) or len(bt) or len(fl):
            md += ["## Failure analysis (dashboard datasets)", ""]
            if len(tf):
                md += ["### Top failing tasks", "", _md_table(tf)]
            if len(bt):
                md += ["### Failures by check type", "", _md_table(bt)]
            if len(fl):
                md += ["### Flaky validations (status flips)", "", _md_table(fl)]
    return "\n".join(md)


def _md_to_html(md: str) -> str:
    """Minimal dependency-free markdown→HTML for the report subset
    (headings + pipe tables)."""
    out = [
        "<!doctype html><html><head><meta charset='utf-8'>",
        "<title>datapact-ray report</title><style>",
        "body{font-family:system-ui,sans-serif;margin:2rem;max-width:70rem}",
        "table{border-collapse:collapse;margin:0.5rem 0}",
        "td,th{border:1px solid #ccc;padding:4px 8px;font-size:0.9rem}",
        "th{background:#f3f3f3;text-align:left}",
        "</style></head><body>",
    ]
    lines = md.splitlines()
    i = 0
    while i < len(lines):
        line = lines[i]
        if line.startswith("|"):
            cells = [c.strip() for c in line.strip("|").split("|")]
            out.append("<table><tr>" + "".join(
                f"<th>{html.escape(c)}</th>" for c in cells
            ) + "</tr>")
            i += 2  # skip separator row
            while i < len(lines) and lines[i].startswith("|"):
                cells = [c.strip() for c in lines[i].strip("|").split("|")]
                out.append("<tr>" + "".join(
                    f"<td>{html.escape(c)}</td>" for c in cells
                ) + "</tr>")
                i += 1
            out.append("</table>")
            continue
        if line.startswith("```"):  # fenced block (executive narrative)
            i += 1
            block = []
            while i < len(lines) and not lines[i].startswith("```"):
                block.append(lines[i])
                i += 1
            out.append("<pre>" + html.escape("\n".join(block)) + "</pre>")
            i += 1
            continue
        if line.startswith("#"):
            level = len(line) - len(line.lstrip("#"))
            out.append(f"<h{level}>{html.escape(line.lstrip('# '))}</h{level}>")
        elif line.strip():
            out.append(f"<p>{html.escape(line)}</p>")
        i += 1
    out.append("</body></html>")
    return "\n".join(out)


def write_report(
    results_dir: str,
    run_id: int,
    records_processed: int = 0,
    dashboard_frames: dict | None = None,
) -> dict[str, str]:
    """Render report.md + report.html next to the run's results parquet."""
    rdir = os.path.join(results_dir, "results", f"run_id={run_id}")
    rows = pq.read_table(os.path.join(rdir, "results.parquet")).to_pandas()
    if not records_processed:
        # derive from the count checks' formatted source counts
        for p in rows["result_payload"]:
            cv = json.loads(p).get("count_validation", {})
            try:
                records_processed += int(str(cv.get("source_count", "0")).replace(",", ""))
            except ValueError:
                pass
    from .rollup import load_run_history

    md = build_report_md(
        rows,
        records_processed,
        history=load_run_history(results_dir),
        dashboard_frames=dashboard_frames,
    )
    paths = {
        "md": os.path.join(rdir, "report.md"),
        "html": os.path.join(rdir, "report.html"),
    }
    with open(paths["md"], "w") as fh:
        fh.write(md)
    with open(paths["html"], "w") as fh:
        fh.write(_md_to_html(md))
    return paths
