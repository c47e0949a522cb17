"""Dashboard-as-code data layer (reference v2.0 observability parity).

The reference builds a Lakeview dashboard whose every widget is powered
by a named SQL dataset over the ``run_history`` table
(``/root/reference/datapact/client.py:780-1810``,
``ensure_dashboard_exists``). This module reproduces that data layer:
each ``ds_*`` dataset becomes a pandas frame derived from the engine's
run history (one row per task per run — driver-sized by construction,
the same budget the reference's SQL assumes), written as parquet under
``<results_dir>/dashboard/`` together with a ``dashboard.json``
manifest mirroring the reference's dataset/displayName/widget
structure. There is no Lakeview here, so the *rendering* is the static
``report.py`` layer; this module is the queryable data contract a BI
tool would sit on.

Dataset ↔ reference map (file:line cites are the SQL being mirrored):

==========================  ==========================================
``ds_top_failures``         ``client.py:874-880``
``ds_failures_by_type``     ``client.py:883-930``
``ds_failure_rate``         ``client.py:861-871``
``ds_success_trend``        ``client.py:999-1006``
``ds_history``              ``client.py:932-958``
``ds_latest_run_details``   ``client.py:960-997``
``ds_exploded_checks``      ``client.py:1191-1460``
``ds_business_impact``      ``client.py:1008-1083``
``ds_owner_accountability`` ``client.py:1085-1145``
``ds_priority_profile``     ``client.py:1147-1189``
``ds_parallel_kpi``         ``client.py:1675-1744``
``ds_cost_history``         ``client.py:1763-1810`` (engine analog —
                            no Databricks billing tables here, so cost
                            is estimated from summed task runtimes at a
                            configurable $/compute-hour)
==========================  ==========================================

Already covered elsewhere (not duplicated): ``ds_kpi``/``ds_summary``
(``rollup.run_summary_frame``), ``ds_performance_metrics`` /
``ds_job_performance`` / ``ds_parallel_efficiency`` /
``ds_runtime_trend`` (``rollup.write_trend_tables``),
``ds_validation_details`` (``genie.genie_current_status``).

Non-goals / pinned divergences:

* SQL ``ORDER BY`` leaves ties engine-defined; every frame here adds a
  deterministic final tie-break key (named per function) so output is
  reproducible run to run.
* ``percentile_approx(x, 0.95)`` → exact ``numpy.quantile`` (the input
  is per-run task durations, dozens of rows).
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .identifiers import fmt_number

# (payload key prefix, reference check_type label or None → key-derived)
_FAILURE_TYPE_RULES: tuple[tuple[str, str], ...] = (
    ("count_validation", "Row Count Mismatch"),
    ("row_hash_validation", "Data Integrity Issue"),
    ("null_validation_", "Data Completeness"),
    ("uniqueness_validation_", "Duplicate Records"),
    ("agg_validation_", "Business Rule Violation"),
    ("custom_sql_validation_", "Custom SQL Mismatch"),
    # INTENTIONAL EXTENSION beyond the reference's six families
    # (client.py:901-922 only knows the above): the engine's transcript
    # and data-quality checks classify under their own labels (matching
    # genie._issue_type) instead of vanishing from the by-type widget.
    # temporal_drift_ sits before drift_ but prefix-matching is exact
    # per key, so the order is cosmetic.
    ("referential_validation_", "Referential Integrity Violation"),
    ("compare_validation_", "Column Value Mismatch"),
    ("ordering_validation_", "Sequence Ordering Violation"),
    ("sequence_grammar_validation_", "Role Grammar Violation"),
    ("conv_dedup_validation_", "Duplicate Conversations"),
    ("schema_validation", "Schema Contract Violation"),
    ("segment_count_validation_", "Segment Volume Mismatch"),
    ("freshness_validation_", "Data Freshness Lag"),
    ("enum_validation_", "Value Outside Accepted Set"),
    ("pattern_validation_", "Format Rule Violation"),
    ("conditional_validation_", "Conditional Rule Violation"),
    ("temporal_drift_validation_", "Source Shifted Since Baseline"),
    ("drift_validation_", "Distribution Drift Detected"),
)


def _payloads(hist: pd.DataFrame) -> pd.Series:
    """result_payload JSON strings → dicts (tolerates pre-parsed dicts)."""
    return hist["result_payload"].map(
        lambda p: p if isinstance(p, dict) else json.loads(p) if p else {}
    )


def _latest_per_task(hist: pd.DataFrame) -> pd.DataFrame:
    """``row_number() OVER (PARTITION BY run_id, task_key ORDER BY
    job_start_ts DESC) = 1`` (client.py:889-896)."""
    df = hist.sort_values(
        ["run_id", "task_key", "job_start_ts"],
        ascending=[True, True, False],
        kind="stable",
    )
    return df.drop_duplicates(["run_id", "task_key"], keep="first")


def top_failures(hist: pd.DataFrame, limit: int = 10) -> pd.DataFrame:
    """Top failing tasks across the whole history (client.py:874-880).
    Tie-break: task_key ascending."""
    if not len(hist):
        return pd.DataFrame(
            {"task_key": pd.Series(dtype="object"),
             "failure_count": pd.Series(dtype="int64")}
        )
    f = hist[hist["status"] == "FAILURE"]
    g = f.groupby("task_key").size().reset_index(name="failure_count")
    g["failure_count"] = g["failure_count"].astype("int64")
    return (
        g.sort_values(["failure_count", "task_key"], ascending=[False, True])
        .head(limit)
        .reset_index(drop=True)
    )


def failures_by_type(hist: pd.DataFrame) -> pd.DataFrame:
    """Issue classification (client.py:883-930): dedup to the latest row
    per (run_id, task_key), keep FAILUREs, classify each by which check
    families FAILed in the payload (a task can contribute to several —
    the reference UNION ALLs the families), then COUNT(DISTINCT
    task_key) per type. The reference matches families by JSON-text LIKE
    patterns; here each payload key is prefix-matched and its ``status``
    read directly — same intent, no false hits on sample strings.
    Tie-break: validation_type ascending."""
    empty = pd.DataFrame(
        {"validation_type": pd.Series(dtype="object"),
         "failure_count": pd.Series(dtype="int64")}
    )
    if not len(hist):
        return empty
    base = _latest_per_task(hist)
    base = base[base["status"] == "FAILURE"]
    if not len(base):
        return empty
    pairs: set[tuple[str, str]] = set()
    for task_key, payload in zip(base["task_key"], _payloads(base)):
        for key, check in payload.items():
            if not (isinstance(check, dict) and check.get("status") == "FAIL"):
                continue
            for prefix, label in _FAILURE_TYPE_RULES:
                if key == prefix or (prefix.endswith("_") and key.startswith(prefix)):
                    pairs.add((label, task_key))
    if not pairs:
        return empty
    df = pd.DataFrame(sorted(pairs), columns=["validation_type", "task_key"])
    g = (
        df.groupby("validation_type")["task_key"]
        .nunique()
        .reset_index(name="failure_count")
    )
    g["failure_count"] = g["failure_count"].astype("int64")
    return g.sort_values(
        ["failure_count", "validation_type"], ascending=[False, True]
    ).reset_index(drop=True)


def failure_rate_trend(hist: pd.DataFrame, limit: int = 30) -> pd.DataFrame:
    """Per-day failure/success rates, last ``limit`` dates descending
    (client.py:861-871). Rows with NULL ``validation_begin_ts`` stay as
    a NaT ``run_date`` group, matching the reference's
    ``date(validation_begin_ts)`` which keeps NULLs as a NULL group;
    the group sorts last (SQL DESC NULLS LAST)."""
    if not len(hist):
        return pd.DataFrame()
    h = hist.copy()
    h["run_date"] = pd.to_datetime(h["validation_begin_ts"]).dt.date
    g = h.groupby("run_date", dropna=False)["status"]
    out = pd.DataFrame(
        {
            "run_date": g.size().index,
            "failure_rate": g.apply(
                lambda s: round((s == "FAILURE").sum() * 100.0 / len(s), 2)
            ).to_numpy(),
            "success_rate": g.apply(
                lambda s: round((s == "SUCCESS").sum() * 100.0 / len(s), 2)
            ).to_numpy(),
            "validations_run": g.size().astype("int64").to_numpy(),
        }
    )
    return (
        out.sort_values("run_date", ascending=False, na_position="last")
        .head(limit)
        .reset_index(drop=True)
    )


def success_trend(hist: pd.DataFrame) -> pd.DataFrame:
    """Success rate per job_start date, ascending (client.py:999-1006)."""
    if not len(hist):
        return pd.DataFrame()
    h = hist.copy()
    h["run_date"] = pd.to_datetime(h["job_start_ts"]).dt.date
    g = h.groupby("run_date")["status"]
    out = pd.DataFrame(
        {
            "run_date": g.size().index,
            "success_rate": g.apply(
                lambda s: (s == "SUCCESS").sum() * 100.0 / len(s)
            ).to_numpy(),
        }
    )
    return out.sort_values("run_date").reset_index(drop=True)


def history_details(hist: pd.DataFrame) -> pd.DataFrame:
    """Detailed run history (client.py:932-958): payload meta surfaced
    as columns. Order: job_start_ts desc, task_key asc."""
    if not len(hist):
        return pd.DataFrame()
    payloads = _payloads(hist)
    flt = payloads.map(lambda p: p.get("applied_filter"))
    out = pd.DataFrame(
        {
            "task_key": hist["task_key"].to_numpy(),
            "status": hist["status"].to_numpy(),
            "job_start_ts": hist["job_start_ts"].to_numpy(),
            "applied_filter": flt.map(
                lambda v: v.strip() if isinstance(v, str) else None
            ).to_numpy(),
            "is_filtered": flt.notna().to_numpy(),
            "configured_primary_keys": payloads.map(
                lambda p: p.get("configured_primary_keys")
            ).to_numpy(),
            "payload_json": hist["result_payload"].to_numpy(),
            "run_id": hist["run_id"].to_numpy(),
            "job_name": hist["job_name"].to_numpy(),
            "business_priority": hist["business_priority"].to_numpy(),
            "business_domain": hist["business_domain"].to_numpy(),
            "business_owner": hist["business_owner"].to_numpy(),
        }
    )
    return out.sort_values(
        ["job_start_ts", "task_key"], ascending=[False, True], kind="stable"
    ).reset_index(drop=True)


def latest_run_details(hist: pd.DataFrame) -> pd.DataFrame:
    """All tasks of the most recent job start (client.py:960-997):
    emoji status, failures first. The reference concatenates
    catalog.schema.table; this engine's tables ARE paths, kept as-is."""
    if not len(hist):
        return pd.DataFrame()
    latest_ts = hist["job_start_ts"].max()
    h = hist[hist["job_start_ts"] == latest_ts].copy()
    h["status"] = h["status"].map(
        lambda s: {"SUCCESS": "✅ PASSED", "FAILURE": "❌ FAILED"}.get(s, s)
    )
    out = pd.DataFrame(
        {
            "task_key": h["task_key"].to_numpy(),
            "status": h["status"].to_numpy(),
            "source_table": h["source_table"].to_numpy(),
            "target_table": h["target_table"].to_numpy(),
            "job_start_ts": pd.to_datetime(h["job_start_ts"]).dt.strftime(
                "%Y-%m-%d %H:%M:%S"
            ).to_numpy(),
            "result_payload": h["result_payload"].to_numpy(),
            "run_id": h["run_id"].to_numpy(),
            "job_name": h["job_name"].to_numpy(),
        }
    )
    out["_fail_first"] = (out["status"] != "❌ FAILED").astype(int)
    out = out.sort_values(["_fail_first", "task_key"], kind="stable")
    return out.drop(columns="_fail_first").reset_index(drop=True)


# ---- exploded checks (client.py:1191-1460) ----

_STATUS_EMOJI = {"PASS": "✅ PASS", "FAIL": "❌ FAIL"}


def _emoji(status) -> str:
    if status in _STATUS_EMOJI:
        return _STATUS_EMOJI[status]
    return "⚠️ " + (str(status) if status is not None else "UNKNOWN")


def _j(check: dict, key: str, default: str | None = None) -> str | None:
    v = check.get(key, default)
    return default if v is None else str(v)


def _explode_payload(payload: dict) -> list[tuple[str, str | None, str]]:
    """One (check_type, check_status, details) row per check in a result
    payload. The six reference families keep the reference's labels and
    detail strings verbatim; engine-extension families (compare /
    ordering / enum / pattern / conditional / sequence-grammar /
    referential / drift verdicts) get key-derived labels and a compact
    'k: v | ...' detail line — the reference's LATERAL-VIEW explode
    generalized to every structured check."""
    rows: list[tuple[str, str | None, str]] = []
    for key, check in payload.items():
        if not isinstance(check, dict) or "status" not in check:
            continue
        status = check.get("status")
        if key == "count_validation":
            details = (
                f"Source: {_j(check, 'source_count')}"
                f" | Target: {_j(check, 'target_count')}"
                f" | Diff: {_j(check, 'relative_diff_percent')}"
                f" | Tolerance: {_j(check, 'tolerance_percent')}"
            )
            rows.append(("Count Check", status, details))
        elif key == "row_hash_validation":
            details = (
                f"Compared: {_j(check, 'compared_rows')} rows"
                f" | Mismatches: {_j(check, 'mismatch_count')}"
                f" | Diff: {_j(check, 'mismatch_percent')}"
                f" | Tolerance: {_j(check, 'tolerance_percent')}"
            )
            rows.append(("Row Hash Check", status, details))
        elif key.startswith("null_validation_"):
            col = key[len("null_validation_"):]
            details = (
                f"Source nulls: {_j(check, 'source_nulls')}"
                f" | Target nulls: {_j(check, 'target_nulls')}"
                f" | Diff: {_j(check, 'relative_diff_percent')}"
                f" | Tolerance: {_j(check, 'tolerance_percent')}"
            )
            rows.append((f"Null Check: {col}", status, details))
        elif key.startswith("uniqueness_validation_"):
            col = key[len("uniqueness_validation_"):]
            details = (
                f"Source duplicates: {_j(check, 'source_duplicates', '0')}"
                f" | Target duplicates: {_j(check, 'target_duplicates', '0')}"
                f" | Tolerance: {_j(check, 'tolerance_percent')}"
            )
            rows.append((f"Uniqueness Check: {col}", status, details))
        elif key.startswith("agg_validation_"):
            col = key[len("agg_validation_"):]
            details = (
                f"Source: {_j(check, 'source_value')}"
                f" | Target: {_j(check, 'target_value')}"
                f" | Diff: {_j(check, 'relative_diff_percent')}"
                f" | Tolerance: {_j(check, 'tolerance_percent')}"
            )
            rows.append((f"Aggregation Check: {col}", status, details))
        elif key.startswith("custom_sql_validation_"):
            col = key[len("custom_sql_validation_"):]
            details = (
                f"Source rows: {_j(check, 'source_row_count', '0')}"
                f" | Target rows: {_j(check, 'target_row_count', '0')}"
                f" | Rows missing in target: "
                f"{_j(check, 'rows_missing_in_target', '0')}"
                f" | Rows missing in source: "
                f"{_j(check, 'rows_missing_in_source', '0')}"
            )
            if check.get("sample_missing_in_target") is not None:
                details += (
                    " | Example present only in source: "
                    f"{check['sample_missing_in_target']}"
                )
            if check.get("sample_missing_in_source") is not None:
                details += (
                    " | Example present only in target: "
                    f"{check['sample_missing_in_source']}"
                )
            rows.append((f"Custom SQL: {col}", status, details))
        else:
            label = key.replace("_validation_", ": ", 1).replace("_", " ")
            details = " | ".join(
                f"{k}: {v}" for k, v in check.items() if k != "status"
            )
            rows.append((label, status, details))
    return rows


def exploded_checks(hist: pd.DataFrame) -> pd.DataFrame:
    """Every individual check of the latest run as its own row
    (client.py:1191-1460): filter to the max job_start_ts, rn=1 per
    task_key (job_start_ts desc, run_id desc), explode the payload,
    emoji-map statuses, DISTINCT, order by (validation_name,
    check_type)."""
    cols = ["validation_name", "check_type", "status", "details"]
    if not len(hist):
        return pd.DataFrame({c: pd.Series(dtype="object") for c in cols})
    latest_ts = hist["job_start_ts"].max()
    h = hist[hist["job_start_ts"] == latest_ts]
    h = h.sort_values(
        ["task_key", "job_start_ts", "run_id"],
        ascending=[True, False, False],
        kind="stable",
    ).drop_duplicates("task_key", keep="first")
    out_rows: set[tuple[str, str, str, str]] = set()
    for task_key, payload in zip(h["task_key"], _payloads(h)):
        for check_type, status, details in _explode_payload(payload):
            out_rows.add((task_key, check_type, _emoji(status), details))
    df = pd.DataFrame(sorted(out_rows), columns=cols)
    return df.reset_index(drop=True)


# ---- executive breakdown views (client.py:1008-1189) ----


def _latest_breakdown(
    results_dir: str, hist: pd.DataFrame, name: str, dim: str, default: str
) -> pd.DataFrame:
    """The latest run's exec breakdown table: read the stored parquet
    (``rollup.write_exec_tables`` wrote it — the reference reads its
    ``{*_breakdown}`` Delta tables the same way), falling back to
    recomputing from the latest run's rows when absent."""
    if not len(hist):
        return pd.DataFrame()
    latest_run = hist.loc[hist["job_start_ts"].idxmax(), "run_id"]
    path = os.path.join(
        results_dir, "exec", f"run_id={latest_run}", f"{name}.parquet"
    )
    if os.path.exists(path):
        return pq.read_table(path).to_pandas()
    from .rollup import breakdown_frame

    return breakdown_frame(hist[hist["run_id"] == latest_run], dim, default)


def _usd(x: float) -> str:
    return "$" + (fmt_number(float(x), 2) or "0.00")


def _last_issue(ts) -> str:
    if ts is None or pd.isna(ts):
        return "No failures"
    return pd.to_datetime(ts).strftime("%Y-%m-%d %H:%M")


def _quality_score(failed: int, total: int) -> str:
    if failed == 0:
        return "100.00%"
    return f"{round((1 - failed / total) * 100, 2)}%"


def business_impact(results_dir: str, hist: pd.DataFrame) -> pd.DataFrame:
    """Business impact per domain for the latest run
    (client.py:1008-1083): quality score, health-status ladder on
    success_rate_percent, SLA-profile ladder, formatted USD impact.
    Tie-break: business_domain ascending."""
    b = _latest_breakdown(
        results_dir, hist, "exec_domain_breakdown", "business_domain",
        "Unspecified",
    )
    if not len(b):
        return pd.DataFrame()

    def health(row) -> str:
        if row["failed_validations"] == 0:
            return "🟢 Excellent"
        if row["success_rate_percent"] >= 95:
            return "🟡 Good"
        if row["success_rate_percent"] >= 90:
            return "🟠 Fair"
        return "🔴 Needs Attention"

    def sla_profile(h) -> str:
        if h is None or pd.isna(h):
            return "Unknown SLA"
        if h <= 4:
            return "Lightning Response (<=4h)"
        if h <= 12:
            return "Business Hours (<=12h)"
        if h <= 24:
            return "Standard (<=24h)"
        return "Backlog Risk (>24h)"

    out = pd.DataFrame(
        {
            "business_domain": b["business_domain"].to_numpy(),
            "total_validations": b["total_validations"].astype("int64").to_numpy(),
            "failed_validations": b["failed_validations"].astype("int64").to_numpy(),
            "quality_score": [
                _quality_score(int(f), int(t))
                for f, t in zip(b["failed_validations"], b["total_validations"])
            ],
            "potential_impact_usd": b["potential_impact_usd"].map(_usd).to_numpy(),
            "realized_impact_usd": b["realized_impact_usd"].map(_usd).to_numpy(),
            "avg_expected_sla_hours": b["avg_expected_sla_hours"].to_numpy(),
            "health_status": b.apply(health, axis=1).to_numpy(),
            "sla_profile": b["avg_expected_sla_hours"].map(sla_profile).to_numpy(),
            "last_issue": b["last_failure_ts"].map(_last_issue).to_numpy(),
        }
    )
    return out.sort_values(
        ["failed_validations", "total_validations", "business_domain"],
        ascending=[False, False, True],
    ).reset_index(drop=True)


def owner_accountability(results_dir: str, hist: pd.DataFrame) -> pd.DataFrame:
    """Owner accountability for the latest run (client.py:1085-1145).
    Tie-break: business_owner ascending."""
    b = _latest_breakdown(
        results_dir, hist, "exec_owner_breakdown", "business_owner",
        "Unassigned",
    )
    if not len(b):
        return pd.DataFrame()
    out = pd.DataFrame(
        {
            "business_owner": b["business_owner"].to_numpy(),
            "total_validations": b["total_validations"].astype("int64").to_numpy(),
            "failed_validations": b["failed_validations"].astype("int64").to_numpy(),
            "success_rate_percent": [
                _quality_score(int(f), int(t))
                for f, t in zip(b["failed_validations"], b["total_validations"])
            ],
            "potential_impact_usd": b["potential_impact_usd"].map(_usd).to_numpy(),
            "realized_impact_usd": b["realized_impact_usd"].map(_usd).to_numpy(),
            "avg_expected_sla_hours": b["avg_expected_sla_hours"].to_numpy(),
            "last_issue": b["last_failure_ts"].map(_last_issue).to_numpy(),
        }
    )
    return out.sort_values(
        ["failed_validations", "total_validations", "business_owner"],
        ascending=[False, False, True],
    ).reset_index(drop=True)


def priority_profile(results_dir: str, hist: pd.DataFrame) -> pd.DataFrame:
    """Priority risk profile for the latest run (client.py:1147-1189):
    the priority breakdown surfaced with a formatted last_issue, ordered
    by failures then potential impact. Tie-break: business_priority
    ascending."""
    b = _latest_breakdown(
        results_dir, hist, "exec_priority_breakdown", "business_priority",
        "UNSPECIFIED",
    )
    if not len(b):
        return pd.DataFrame()
    out = pd.DataFrame(
        {
            "business_priority": b["business_priority"].to_numpy(),
            "total_validations": b["total_validations"].astype("int64").to_numpy(),
            "failed_validations": b["failed_validations"].astype("int64").to_numpy(),
            "success_rate_percent": b["success_rate_percent"].to_numpy(),
            "potential_impact_usd": b["potential_impact_usd"].to_numpy(),
            "realized_impact_usd": b["realized_impact_usd"].to_numpy(),
            "last_issue": b["last_failure_ts"].map(_last_issue).to_numpy(),
        }
    )
    return out.sort_values(
        ["failed_validations", "potential_impact_usd", "business_priority"],
        ascending=[False, False, True],
    ).reset_index(drop=True)


def status_flips(hist: pd.DataFrame, limit: int = 20) -> pd.DataFrame:
    """Flaky-validation detector (ENGINE EXTENSION — no reference
    analog): per task, how often its status FLIPPED between consecutive
    runs. A task that alternates PASS/FAIL nightly is not a data-quality
    signal — it's a borderline tolerance, a nondeterministic upstream
    pipeline, or clock-skewed ingest, and it trains operators to ignore
    the dashboard. flip_rate = flips / (runs − 1); tasks with one run
    can't flip and are excluded. Ordered by flip count then task_key."""
    cols = ["task_key", "runs", "flips", "flip_rate", "current_status"]
    if not len(hist):
        return pd.DataFrame({c: pd.Series(dtype="object") for c in cols})
    latest = _latest_per_task(hist).sort_values(
        ["task_key", "run_id"], kind="stable"
    )
    rows = []
    for task_key, g in latest.groupby("task_key", sort=True):
        st = g["status"].tolist()
        if len(st) < 2:
            continue
        flips = sum(1 for a, b in zip(st, st[1:]) if a != b)
        rows.append(
            {
                "task_key": task_key,
                "runs": len(st),
                "flips": flips,
                "flip_rate": round(flips / (len(st) - 1), 4),
                "current_status": st[-1],
            }
        )
    if not rows:
        return pd.DataFrame({c: pd.Series(dtype="object") for c in cols})
    out = pd.DataFrame(rows)
    return (
        out.sort_values(["flips", "task_key"], ascending=[False, True])
        .head(limit)
        .reset_index(drop=True)
    )


def parallel_kpi(hist: pd.DataFrame) -> pd.DataFrame:
    """Parallelism KPI snapshot of the most recent run
    (client.py:1675-1744): run window, tasks/minute, avg + p95 task
    duration, interval-overlap peak parallelism — recency_rank = 1 of
    the parallel-efficiency trend."""
    from .rollup import parallel_efficiency_trend

    trend = parallel_efficiency_trend(hist, limit=1)
    if not len(trend):
        return pd.DataFrame()
    return trend.drop(columns=["recency_rank"]).reset_index(drop=True)


def cost_history(
    hist: pd.DataFrame,
    usd_per_compute_hour: float = 0.22,
    limit_days: int = 30,
) -> pd.DataFrame:
    """Job cost history — ENGINE ANALOG of client.py:1763-1810. The
    reference joins Databricks system billing tables
    (``system.lakeflow.job_run_timeline`` × ``system.query.history`` ×
    list prices); none exist here, so the billable-work proxy is the sum
    of per-task validation runtimes per run, priced at a configurable
    $/compute-hour. The 30-day window anchors on the history's own max
    job_start_ts (deterministic — no wall clock)."""
    if not len(hist):
        return pd.DataFrame()
    h = hist[
        hist["validation_begin_ts"].notna()
        & hist["validation_complete_ts"].notna()
    ].copy()
    if not len(h):
        return pd.DataFrame()
    h["_begin"] = pd.to_datetime(h["validation_begin_ts"])
    h["_end"] = pd.to_datetime(h["validation_complete_ts"])
    watermark = pd.to_datetime(h["job_start_ts"]).max()
    h = h[pd.to_datetime(h["job_start_ts"]) >= watermark - pd.Timedelta(days=limit_days)]
    rows = []
    for run_id, x in h.groupby("run_id"):
        task_hours = round(
            float((x["_end"] - x["_begin"]).dt.total_seconds().sum()) / 3600.0, 6
        )
        rows.append(
            {
                "run_id": run_id,
                "run_start_time": x["_begin"].min(),
                "run_end_time": x["_end"].max(),
                "billable_task_hours": task_hours,
                # priced from the ROUNDED hours so the stored frame is
                # internally consistent (cost == hours × rate exactly)
                "estimated_cost_usd": round(task_hours * usd_per_compute_hour, 8),
            }
        )
    out = pd.DataFrame(rows)
    # run_id tie-break: coincident run_start_times must not leave row
    # order to groupby iteration (module invariant: deterministic output)
    return out.sort_values(
        ["run_start_time", "run_id"], ascending=[False, True]
    ).reset_index(drop=True)


def kpi_snapshot(hist: pd.DataFrame) -> pd.DataFrame:
    """Executive KPI single-row dataset (``client.py:784-830`` ds_kpi):
    the LATEST run's task rows (scoped by max job_start_ts) reduced to
    the counter fields the dashboard's top row renders — total/passed/
    failed tasks, 2-dp success rate, 4-dp data-quality score, critical
    failures, potential/realized impact USD, avg SLA hours."""
    if not len(hist):
        return pd.DataFrame()
    scoped = hist[hist["job_start_ts"] == hist["job_start_ts"].max()]
    total = len(scoped)
    if not total:
        return pd.DataFrame()
    passed = int((scoped["status"] == "SUCCESS").sum())
    failed = int((scoped["status"] == "FAILURE").sum())
    crit = int(
        (
            (scoped["status"] == "FAILURE")
            & (scoped["business_priority"].astype(str).str.upper() == "CRITICAL")
        ).sum()
    )
    imp = pd.to_numeric(scoped["estimated_impact_usd"], errors="coerce")
    sla = pd.to_numeric(scoped["expected_sla_hours"], errors="coerce")
    return pd.DataFrame(
        {
            "total_tasks": [total],
            "passed_tasks": [passed],
            "failed_tasks": [failed],
            "success_rate_percent": [round(passed * 100.0 / total, 2)],
            "data_quality_score": [round(passed * 1.0 / total, 4)],
            "critical_failures": [crit],
            "potential_impact_usd": [float(imp.fillna(0).sum())],
            "realized_impact_usd": [
                float(imp[scoped["status"] == "FAILURE"].fillna(0).sum())
            ],
            "avg_expected_sla_hours": [
                float(sla.mean()) if sla.notna().any() else None
            ],
            "tables_validated": [total],
        }
    )


# ---- assembly ----

_DATASET_DISPLAY = {
    "ds_kpi": "Executive KPI Dashboard",
    "ds_top_failures": "Top Failing Tasks",
    "ds_failures_by_type": "Issue Classification & Impact Analysis",
    "ds_failure_rate": "Data Quality Trend Analysis",
    "ds_success_trend": "Success Rate Over Time",
    "ds_history": "Detailed Run History",
    "ds_latest_run_details": "All Run Details",
    "ds_exploded_checks": "Detailed View of All Checks",
    "ds_business_impact": "Business Impact Assessment",
    "ds_owner_accountability": "Owner Accountability Overview",
    "ds_priority_profile": "Priority Risk Profile",
    "ds_parallel_kpi": "Parallelism KPI Snapshot",
    "ds_status_flips": "Flaky Validation Detector",
    "ds_cost_history": "Job Cost History",
}


def build_dashboard(
    results_dir: str, job_name: str | None = None
) -> dict[str, pd.DataFrame]:
    """All dashboard frames from the accumulated run history."""
    from .rollup import load_run_history

    hist = load_run_history(results_dir, job_name)
    return {
        "ds_kpi": kpi_snapshot(hist),
        "ds_top_failures": top_failures(hist),
        "ds_failures_by_type": failures_by_type(hist),
        "ds_failure_rate": failure_rate_trend(hist),
        "ds_success_trend": success_trend(hist),
        "ds_history": history_details(hist),
        "ds_latest_run_details": latest_run_details(hist),
        "ds_exploded_checks": exploded_checks(hist),
        "ds_business_impact": business_impact(results_dir, hist),
        "ds_owner_accountability": owner_accountability(results_dir, hist),
        "ds_priority_profile": priority_profile(results_dir, hist),
        "ds_parallel_kpi": parallel_kpi(hist),
        "ds_status_flips": status_flips(hist),
        "ds_cost_history": cost_history(hist),
    }


def _w(ds: str, wtype: str, title: str, pos: dict, **fields) -> dict:
    return {"dataset": ds, "type": wtype, "title": title, "position": pos, **fields}


def layout_pages() -> list[dict]:
    """Static Lakeview-shape page/widget layout over the ds_* datasets —
    the visual-spec mirror of the reference's three-page dashboard
    (``client.py:1874-1977`` widget definitions; page list
    ``client.py:2892-3269``: main_page 'Executive Data Quality
    Dashboard', details_page 'Historical Validation Runs',
    performance_page 'Performance Metrics'). Every widget references a
    dataset written by ``write_dashboard`` and only fields that exist in
    that dataset's frame (validated at write time and in tests). There
    is no Lakeview service here, so this is the renderer-agnostic layout
    contract a BI tool consumes alongside the parquet datasets."""
    return [
        {
            "name": "main_page",
            "displayName": "Executive Data Quality Dashboard",
            "pageType": "PAGE_TYPE_CANVAS",
            "layout": [
                _w("ds_kpi", "SUCCESS_RATE_COUNTER", "Data Quality Score",
                   {"x": 0, "y": 0, "width": 2, "height": 3},
                   value_field="data_quality_score"),
                _w("ds_kpi", "COUNTER", "Critical Issues",
                   {"x": 2, "y": 0, "width": 1, "height": 3},
                   value_field="failed_tasks"),
                _w("ds_kpi", "COUNTER", "Total Validations",
                   {"x": 3, "y": 0, "width": 1, "height": 3},
                   value_field="tables_validated"),
                _w("ds_parallel_kpi", "COUNTER", "Peak Parallelism",
                   {"x": 4, "y": 0, "width": 1, "height": 3},
                   value_field="peak_parallelism"),
                _w("ds_parallel_kpi", "COUNTER", "Throughput (tasks/min)",
                   {"x": 5, "y": 0, "width": 1, "height": 3},
                   value_field="tasks_per_minute"),
                _w("ds_latest_run_details", "DONUT",
                   "Validation Status Distribution",
                   {"x": 0, "y": 3, "width": 3, "height": 6},
                   category_field="status"),
                _w("ds_failure_rate", "LINE", "Quality Trend (30 Days)",
                   {"x": 3, "y": 3, "width": 3, "height": 6},
                   x_field="run_date", y_field="failure_rate"),
                _w("ds_failures_by_type", "BAR", "Issue Classification",
                   {"x": 0, "y": 9, "width": 6, "height": 5},
                   x_field="validation_type", y_field="failure_count"),
                _w("ds_latest_run_details", "TABLE",
                   "Validation Results with Check Details",
                   {"x": 0, "y": 15, "width": 6, "height": 8}),
                _w("ds_business_impact", "TABLE",
                   "Business Domain Quality Summary",
                   {"x": 0, "y": 23, "width": 3, "height": 5}),
                _w("ds_owner_accountability", "TABLE", "Owner Accountability",
                   {"x": 3, "y": 23, "width": 3, "height": 5}),
                _w("ds_top_failures", "BAR", "Top Failing Validations",
                   {"x": 0, "y": 28, "width": 3, "height": 5},
                   x_field="task_key", y_field="failure_count"),
                _w("ds_priority_profile", "BAR", "Priority Risk Profile",
                   {"x": 3, "y": 28, "width": 3, "height": 5},
                   x_field="business_priority", y_field="failed_validations"),
                _w("ds_exploded_checks", "TABLE", "Check Details",
                   {"x": 0, "y": 33, "width": 6, "height": 9}),
            ],
        },
        {
            "name": "details_page",
            "displayName": "Historical Validation Runs",
            "pageType": "PAGE_TYPE_CANVAS",
            "layout": [
                _w("ds_history", "TABLE", "Detailed Run History",
                   {"x": 0, "y": 0, "width": 6, "height": 10}),
                _w("ds_status_flips", "TABLE", "Flaky Validation Detector",
                   {"x": 0, "y": 10, "width": 6, "height": 6}),
            ],
        },
        {
            "name": "performance_page",
            "displayName": "Performance Metrics",
            "pageType": "PAGE_TYPE_CANVAS",
            "layout": [
                _w("ds_parallel_kpi", "TABLE", "Job Run Performance",
                   {"x": 0, "y": 0, "width": 6, "height": 6}),
                _w("ds_success_trend", "LINE", "Success Rate Over Time",
                   {"x": 0, "y": 6, "width": 3, "height": 6},
                   x_field="run_date", y_field="success_rate"),
                _w("ds_cost_history", "BAR", "Job Cost History",
                   {"x": 3, "y": 6, "width": 3, "height": 6},
                   x_field="run_id", y_field="estimated_cost_usd"),
            ],
        },
    ]


def write_dashboard(results_dir: str, job_name: str | None = None) -> dict:
    """(Over)write every dashboard dataset as parquet under
    ``<results_dir>/dashboard/`` plus a ``dashboard.json`` manifest
    (dataset name → displayName, row count, parquet path, AND the
    three-page widget layout — the dashboard-as-code contract a BI
    layer renders). Recomputed after every run, like the reference's
    idempotent delete-and-recreate (client.py
    ``ensure_dashboard_exists``)."""
    frames = build_dashboard(results_dir, job_name)
    base = os.path.join(results_dir, "dashboard")
    os.makedirs(base, exist_ok=True)
    manifest = {"job_name": job_name, "datasets": []}
    for name, df in frames.items():
        path = os.path.join(base, f"{name}.parquet")
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
        manifest["datasets"].append(
            {
                "name": name,
                "displayName": _DATASET_DISPLAY[name],
                "rows": int(len(df)),
                "path": path,
            }
        )
    pages = layout_pages()
    for page in pages:  # every widget must reference a written dataset
        for w in page["layout"]:
            if w["dataset"] not in frames:
                raise ValueError(
                    f"dashboard layout references unknown dataset {w['dataset']}"
                )
    manifest["pages"] = pages
    with open(os.path.join(base, "dashboard.json"), "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    return frames
