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


# ---- cross-run trend history (reference dashboards aggregate the last
# 30/60 runs: /root/reference/datapact/client.py:1586-1604 ds_job_performance
# LIMIT 30, :1632-1656 ds_parallel_efficiency LIMIT 60, :1745-1760
# ds_runtime_trend LIMIT 30, :1565-1584 ds_performance_metrics) ----


def load_run_history(results_dir: str, job_name: str | None = None) -> pd.DataFrame:
    """All prior runs' result rows: read back every
    ``results/run_id=*/results.parquet``. Driver-sized by construction
    (one row per task per run), the same budget the reference's
    run_history table queries assume."""
    import glob

    base = os.path.join(results_dir, "results")
    files = sorted(glob.glob(os.path.join(base, "run_id=*", "results.parquet")))
    if not files:
        return pd.DataFrame()
    frames = [pq.read_table(f).to_pandas() for f in files]
    hist = pd.concat(frames, ignore_index=True)
    if job_name is not None:
        hist = hist[hist["job_name"] == job_name]
    return hist.reset_index(drop=True)


def _timed(hist: pd.DataFrame) -> pd.DataFrame:
    h = hist[
        hist["validation_begin_ts"].notna()
        & hist["validation_complete_ts"].notna()
    ].copy()
    h["_begin"] = pd.to_datetime(h["validation_begin_ts"])
    h["_end"] = pd.to_datetime(h["validation_complete_ts"])
    h["_runtime"] = (h["_end"] - h["_begin"]).dt.total_seconds()
    return h


def job_performance_trend(hist: pd.DataFrame, limit: int = 30) -> pd.DataFrame:
    """Per-run rollup of the last ``limit`` runs (ds_job_performance,
    ``client.py:1586-1604``): start/end, total runtime, task counts."""
    if not len(hist):
        return pd.DataFrame()
    h = _timed(hist)
    g = h.groupby("run_id")
    out = pd.DataFrame(
        {
            "run_id": g.size().index,
            "job_start": g["job_start_ts"].min().to_numpy(),
            "job_end": g["_end"].max().to_numpy(),
            "total_runtime_seconds": (
                (g["_end"].max() - g["_begin"].min()).dt.total_seconds()
            ).to_numpy(),
            "tasks_run": g["task_key"].nunique().to_numpy(),
            "successful_tasks": g.apply(
                lambda x: int((x["status"] == "SUCCESS").sum()),
                include_groups=False,
            ).to_numpy(),
            "failed_tasks": g.apply(
                lambda x: int((x["status"] == "FAILURE").sum()),
                include_groups=False,
            ).to_numpy(),
        }
    )
    return (
        out.sort_values("job_start", ascending=False)
        .head(limit)
        .reset_index(drop=True)
    )


def runtime_trend(hist: pd.DataFrame, limit: int = 30) -> pd.DataFrame:
    """Per-day average task runtime over the last ``limit`` run dates
    (ds_runtime_trend, ``client.py:1745-1760``)."""
    if not len(hist):
        return pd.DataFrame()
    h = _timed(hist)
    h["run_date"] = h["_begin"].dt.date
    g = h.groupby("run_date")
    out = pd.DataFrame(
        {
            "run_date": g.size().index,
            "avg_runtime_seconds": g["_runtime"].mean().to_numpy(),
            "num_runs": g["run_id"].nunique().to_numpy(),
        }
    )
    return (
        out.sort_values("run_date", ascending=False)
        .head(limit)
        .reset_index(drop=True)
    )


def task_performance_trend(hist: pd.DataFrame) -> pd.DataFrame:
    """Per-task runtime/success stats across all runs
    (ds_performance_metrics, ``client.py:1565-1584``)."""
    if not len(hist):
        return pd.DataFrame()
    h = _timed(hist)
    g = h.groupby("task_key")
    out = pd.DataFrame(
        {
            "task_key": g.size().index,
            "avg_runtime_seconds": g["_runtime"].mean().round(2).to_numpy(),
            "min_runtime_seconds": g["_runtime"].min().to_numpy(),
            "max_runtime_seconds": g["_runtime"].max().to_numpy(),
            "total_runs": g.size().to_numpy(),
            "successful_runs": g.apply(
                lambda x: int((x["status"] == "SUCCESS").sum()),
                include_groups=False,
            ).to_numpy(),
        }
    )
    out["success_rate_percent"] = (
        100.0 * out["successful_runs"] / out["total_runs"]
    ).round(2)
    return (
        out.sort_values("avg_runtime_seconds", ascending=False)
        .reset_index(drop=True)
    )


def parallel_efficiency_trend(hist: pd.DataFrame, limit: int = 60) -> pd.DataFrame:
    """Per-run parallelism KPIs over the last ``limit`` runs
    (ds_parallel_efficiency, ``client.py:1632-1656``): tasks/minute,
    avg + p95 task duration, peak parallel tasks, recency rank."""
    if not len(hist):
        return pd.DataFrame()
    h = _timed(hist)
    rows = []
    for run_id, x in h.groupby("run_id"):
        m = task_runtime_metrics(x)
        span = (x["_end"].max() - x["_begin"].min()).total_seconds()
        rows.append(
            {
                "run_id": run_id,
                "run_start": x["_begin"].min(),
                "runtime_seconds": span,
                "total_tasks": int(len(x)),
                "tasks_per_minute": round(len(x) * 60.0 / span, 2)
                if span > 0
                else float(len(x)),
                "avg_task_duration_seconds": float(
                    m["avg_task_seconds"].iloc[0]
                ),
                "p95_task_duration_seconds": float(
                    m["p95_task_seconds"].iloc[0]
                ),
                "peak_parallelism": int(m["peak_parallel_tasks"].iloc[0]),
            }
        )
    out = pd.DataFrame(rows).sort_values("run_start", ascending=False)
    out["recency_rank"] = range(1, len(out) + 1)
    return out.head(limit).reset_index(drop=True)


def write_trend_tables(results_dir: str, job_name: str | None = None) -> dict:
    """Build the four cross-run trend frames from the full run history
    and (over)write them under ``<results_dir>/trends/`` — the analog of
    the reference's dashboard trend datasets, recomputed after every
    run so nightly validations accumulate history."""
    hist = load_run_history(results_dir, job_name)
    out = {
        "trend_job_performance": job_performance_trend(hist),
        "trend_runtime": runtime_trend(hist),
        "trend_task_performance": task_performance_trend(hist),
        "trend_parallel_efficiency": parallel_efficiency_trend(hist),
    }
    base = os.path.join(results_dir, "trends")
    os.makedirs(base, exist_ok=True)
    for name, df in out.items():
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            os.path.join(base, f"{name}.parquet"),
        )
    return out
