"""Latest-run denormalized snapshots for NL/dashboard querying.

Equivalent of the reference's Genie tables
(``/root/reference/datapact/client.py:446-555``): dedup result-history
rows to the latest per ``(run_id, task_key)`` via the row_number()
window (``client.py:482-487``), then derive

* ``genie_current_status`` — one row per validation with a friendly
  status ('Passed'/'Failed'), last-validated timestamp, an issue-type
  classification from the payload check statuses (same precedence order:
  count → row-hash → null → uniqueness → agg), and the count strings;
* ``genie_table_quality`` — per source table: validation totals,
  quality_score = 2dp success percentage, last_checked;
* ``genie_issues`` — failed validations with a human-readable issue
  description composed from the payload values.

Inputs are the (tiny) result-history rows, so this is driver-side
pandas (SURVEY.md §2.5 G8).
"""

from __future__ import annotations

import json

import pandas as pd


def latest_per_task(history: pd.DataFrame) -> pd.DataFrame:
    """row_number() OVER (PARTITION BY run_id, task_key ORDER BY
    validation_begin_ts DESC) = 1 equivalent."""
    df = history.sort_values(
        ["run_id", "task_key", "validation_begin_ts"],
        ascending=[True, True, False],
        kind="stable",
    )
    return df.drop_duplicates(["run_id", "task_key"], keep="first").reset_index(
        drop=True
    )


def _issue_type(status: str, payload: dict) -> str:
    # precedence mirrors client.py:466-474
    if payload.get("count_validation", {}).get("status") == "FAIL":
        return "Row count mismatch"
    if payload.get("row_hash_validation", {}).get("status") == "FAIL":
        return "Data integrity issue"
    for key, val in payload.items():
        if key.startswith("null_validation") and isinstance(val, dict):
            if val.get("status") == "FAIL":
                return "Missing required data"
    for key, val in payload.items():
        if key.startswith("uniqueness_validation") and isinstance(val, dict):
            if val.get("status") == "FAIL":
                return "Duplicate records found"
    for key, val in payload.items():
        if key.startswith("agg_validation") and isinstance(val, dict):
            if val.get("status") == "FAIL":
                return "Business rule violation"
    # engine-extension families, after the reference's precedence chain
    # (client.py:466-474 knows only the five above — anything else was
    # 'Unknown issue'; these labels keep the NL surface useful for the
    # transcript checks)
    _ext = (
        ("custom_sql_validation", "Custom SQL mismatch"),
        ("referential_validation", "Referential integrity violation"),
        ("compare_validation", "Column value mismatch"),
        ("ordering_validation", "Sequence ordering violation"),
        ("sequence_grammar_validation", "Role grammar violation"),
        ("conv_dedup_validation", "Duplicate conversations"),
        ("schema_validation", "Schema contract violation"),
        ("segment_count_validation", "Segment volume mismatch"),
        ("freshness_validation", "Data freshness lag"),
        ("enum_validation", "Value outside accepted set"),
        ("pattern_validation", "Format rule violation"),
        ("conditional_validation", "Conditional rule violation"),
        ("temporal_drift_validation", "Source shifted since baseline"),
        ("drift_validation", "Distribution drift detected"),
    )
    for prefix, label in _ext:
        for key, val in payload.items():
            if key.startswith(prefix) and isinstance(val, dict):
                if val.get("status") == "FAIL":
                    return label
    if status == "SUCCESS":
        return "All checks passed"
    return "Unknown issue"


def genie_current_status(history: pd.DataFrame) -> pd.DataFrame:
    latest = latest_per_task(history)
    payloads = [json.loads(p) for p in latest["result_payload"]]
    return pd.DataFrame(
        {
            "validation_name": latest["task_key"],
            "validation_status": latest["status"].map(
                {"SUCCESS": "Passed", "FAILURE": "Failed"}
            ).fillna(latest["status"]),
            "source_table": latest["source_table"],
            "target_table": latest["target_table"],
            "last_validated": latest["validation_begin_ts"],
            "issue_type": [
                _issue_type(s, p) for s, p in zip(latest["status"], payloads)
            ],
            "source_row_count": [
                p.get("count_validation", {}).get("source_count") for p in payloads
            ],
            "target_row_count": [
                p.get("count_validation", {}).get("target_count") for p in payloads
            ],
            "run_id": latest["run_id"],
            "job_name": latest["job_name"],
        }
    )


def genie_table_quality(history: pd.DataFrame) -> pd.DataFrame:
    latest = latest_per_task(history)
    g = latest.groupby("source_table")
    out = g.agg(
        total_validations=("task_key", "size"),
        passed_validations=("status", lambda s: int((s == "SUCCESS").sum())),
        failed_validations=("status", lambda s: int((s == "FAILURE").sum())),
        last_checked=("validation_begin_ts", "max"),
    ).reset_index()
    out = out.rename(columns={"source_table": "table_name"})
    out["quality_score"] = (
        100.0 * out["passed_validations"] / out["total_validations"]
    ).round(2)
    return out[
        [
            "table_name",
            "total_validations",
            "passed_validations",
            "failed_validations",
            "quality_score",
            "last_checked",
        ]
    ]


def genie_issues(history: pd.DataFrame) -> pd.DataFrame:
    latest = latest_per_task(history)
    failed = latest[latest["status"] == "FAILURE"]
    rows = []
    for _, r in failed.iterrows():
        payload = json.loads(r["result_payload"])
        cv = payload.get("count_validation", {})
        rh = payload.get("row_hash_validation", {})
        if cv.get("status") == "FAIL":
            desc = (
                f"Expected {cv.get('source_count')} rows but found "
                f"{cv.get('target_count')}"
            )
        elif rh.get("status") == "FAIL":
            desc = (
                "Data integrity check failed for "
                f"{rh.get('mismatch_count')} records"
            )
        else:
            desc = "Validation failed - check details"
        rows.append(
            {
                "validation_name": r["task_key"],
                "table_name": r["source_table"],
                "issue_description": desc,
                "detected_at": r["validation_begin_ts"],
                "severity": "High",
            }
        )
    return pd.DataFrame(
        rows,
        columns=[
            "validation_name",
            "table_name",
            "issue_description",
            "detected_at",
            "severity",
        ],
    )
