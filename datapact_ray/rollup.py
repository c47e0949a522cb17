"""Executive rollups + run metrics (reference G6–G9).

Mirrors ``/root/reference/datapact/templates/aggregate_results.sql.j2``:

* ``exec_run_summary`` (``:24-44``): totals, success_rate_percent (2dp),
  data_quality_score (4dp), critical_failures (FAILURE & priority
  CRITICAL), potential/realized impact USD, avg SLA, failed_task_keys.
* ``exec_domain/owner/priority_breakdown`` (``:46-97``): same metrics
  grouped by the coalesced-trimmed dimension with the reference's
  defaults ('Unspecified' / 'Unassigned' / 'UNSPECIFIED') +
  last_failure_ts.
* run metrics (``client.py:1565-1744``): per-task runtime avg/min/max,
  tasks/minute, p95 task duration, peak parallel tasks (J4 self-join
  done driver-side — N = #tasks is tiny).

The inputs are the run's result rows (driver-side, tiny), so this is
plain pandas; the heavy lifting happened in the validation passes. The
rollup is idempotent per run_id (DELETE+INSERT analog: overwrite the
run's parquet partition).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _coalesce_dim(series: pd.Series, default: str) -> pd.Series:
    s = series.fillna("").astype(str).str.strip()
    return s.where(s != "", default)


def run_summary_frame(rows: pd.DataFrame) -> pd.DataFrame:
    n = len(rows)
    failures = int((rows["status"] == "FAILURE").sum())
    successes = int((rows["status"] == "SUCCESS").sum())
    prio = rows["business_priority"].fillna("")
    impact = rows["estimated_impact_usd"].fillna(0.0)
    return pd.DataFrame(
        {
            "run_id": [rows["run_id"].iloc[0] if n else None],
            "job_name": [rows["job_name"].iloc[0] if n else None],
            "total_tasks": [n],
            "failure_count": [failures],
            "success_count": [successes],
            "success_rate_percent": [round(successes * 100.0 / n, 2) if n else 0.0],
            "data_quality_score": [round(successes * 1.0 / n, 4) if n else 0.0],
            "critical_failures": [
                int(((rows["status"] == "FAILURE") & (prio == "CRITICAL")).sum())
            ],
            "potential_impact_usd": [float(impact.sum())],
            "realized_impact_usd": [
                float(impact[rows["status"] == "FAILURE"].sum())
            ],
            "avg_expected_sla_hours": [
                float(rows["expected_sla_hours"].mean())
                if rows["expected_sla_hours"].notna().any()
                else None
            ],
            "failed_task_keys": [
                rows.loc[rows["status"] == "FAILURE", "task_key"].tolist()
            ],
        }
    )


def breakdown_frame(rows: pd.DataFrame, dim: str, default: str) -> pd.DataFrame:
    df = rows.copy()
    df[dim] = _coalesce_dim(df[dim], default)
    impact = df["estimated_impact_usd"].fillna(0.0)
    df = df.assign(
        _fail=(df["status"] == "FAILURE").astype(int),
        _succ=(df["status"] == "SUCCESS").astype(int),
        _impact=impact,
        _realized=impact.where(df["status"] == "FAILURE", 0.0),
        _fail_ts=df["validation_begin_ts"].where(df["status"] == "FAILURE"),
    )
    g = df.groupby(["run_id", "job_name", dim], dropna=False)
    out = g.agg(
        total_validations=("task_key", "size"),
        failed_validations=("_fail", "sum"),
        _succ=("_succ", "sum"),
        avg_expected_sla_hours=("expected_sla_hours", "mean"),
        potential_impact_usd=("_impact", "sum"),
        realized_impact_usd=("_realized", "sum"),
        last_failure_ts=("_fail_ts", "max"),
    ).reset_index()
    out["success_rate_percent"] = np.round(
        out["_succ"] * 100.0 / out["total_validations"], 2
    )
    out = out.drop(columns=["_succ"])
    return out.sort_values(dim).reset_index(drop=True)


def task_runtime_metrics(rows: pd.DataFrame) -> pd.DataFrame:
    """Run metrics analog of ``client.py:1565-1744``: runtime stats,
    throughput and the interval-overlap peak-parallelism self-join."""
    if not len(rows):
        return pd.DataFrame()
    begin = pd.to_datetime(rows["validation_begin_ts"])
    end = pd.to_datetime(rows["validation_complete_ts"])
    dur = (end - begin).dt.total_seconds()
    span = (end.max() - begin.min()).total_seconds()
    # peak parallelism: sweep over begin/end events (J4 equivalent)
    events = sorted(
        [(t, 1) for t in begin] + [(t, -1) for t in end], key=lambda e: (e[0], -e[1])
    )
    peak = cur = 0
    for _, delta in events:
        cur += delta
        peak = max(peak, cur)
    return pd.DataFrame(
        {
            "total_tasks": [len(rows)],
            "avg_task_seconds": [round(float(dur.mean()), 3)],
            "min_task_seconds": [round(float(dur.min()), 3)],
            "max_task_seconds": [round(float(dur.max()), 3)],
            "p95_task_seconds": [round(float(np.quantile(dur, 0.95)), 3)],
            "tasks_per_minute": [
                round(len(rows) * 60.0 / span, 2) if span > 0 else float(len(rows))
            ],
            "peak_parallel_tasks": [peak],
        }
    )


def write_exec_tables(rows: pd.DataFrame, results_dir: str, run_id: int) -> dict:
    """Write the four exec tables as parquet (idempotent per run_id)."""
    out = {
        "exec_run_summary": run_summary_frame(rows),
        "exec_domain_breakdown": breakdown_frame(
            rows, "business_domain", "Unspecified"
        ),
        "exec_owner_breakdown": breakdown_frame(rows, "business_owner", "Unassigned"),
        "exec_priority_breakdown": breakdown_frame(
            rows, "business_priority", "UNSPECIFIED"
        ),
        "run_metrics": task_runtime_metrics(rows),
    }
    base = os.path.join(results_dir, "exec", f"run_id={run_id}")
    os.makedirs(base, exist_ok=True)
    for name, df in out.items():
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            os.path.join(base, f"{name}.parquet"),
        )
    return out
