"""Verdict arithmetic + payload assembly, faithful to the reference.

Every tolerance rule, NULL-propagation quirk, payload alias and formatted
string reproduces ``/root/reference/datapact/templates/validation.sql.j2``
(cited per function). Deliberately-kept reference quirks:

* count check: relative diff uses the **source** count as denominator and
  ``COALESCE(.. / NULLIF(source,0), 0)`` — so ``source == 0`` PASSES even
  when target has rows (``validation.sql.j2:334-336,440``).
* agg check: if either side's aggregate is NULL the diff is NULL which
  coalesces to 0 → PASS (``validation.sql.j2:39-48,461``).
* null check has two modes — with PKs (exact-zero rule, diff vs source,
  ``:370-375``) and without PKs (COALESCE form with 100% display when
  exactly one side is zero, ``:367,375,453-455``).
* row-hash compare counts mismatches over the INNER join only; rows
  missing on either side are not mismatches (``:195-219``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from .identifiers import fmt_number, fmt_percent, make_identifier

PASS = "PASS"
FAIL = "FAIL"


@dataclass
class CheckVerdict:
    alias: str
    passed: bool
    payload: dict[str, Any]


def _status(ok: bool) -> str:
    return PASS if ok else FAIL


def count_verdict(source_count: int, target_count: int, tolerance: float) -> CheckVerdict:
    """``validation.sql.j2:329-337,440`` — denominator = source, s=0 ⇒ 0."""
    rel = abs(source_count - target_count) / source_count if source_count else 0.0
    ok = rel <= tolerance
    return CheckVerdict(
        alias="count_validation",
        passed=ok,
        payload={
            "source_count": fmt_number(source_count, 0),
            "target_count": fmt_number(target_count, 0),
            "relative_diff_percent": fmt_percent(rel),
            "tolerance_percent": fmt_percent(tolerance),
            "status": _status(ok),
        },
    )


def row_hash_verdict(
    total_compared_rows: int, mismatch_count: int, tolerance: float | None
) -> CheckVerdict:
    """``validation.sql.j2:341-349,443`` — tolerance defaults to 0.0."""
    tol = tolerance if tolerance is not None else 0.0
    rel = mismatch_count / total_compared_rows if total_compared_rows else 0.0
    ok = rel <= tol
    return CheckVerdict(
        alias="row_hash_validation",
        passed=ok,
        payload={
            "compared_rows": fmt_number(total_compared_rows, 0),
            "mismatch_count": fmt_number(mismatch_count, 0),
            "mismatch_percent": fmt_percent(rel),
            "tolerance_percent": fmt_percent(tol),
            "status": _status(ok),
        },
    )


def null_verdict(
    column: str,
    source_nulls: int,
    target_nulls: int,
    tolerance: float,
    with_primary_keys: bool,
) -> CheckVerdict:
    """Dual-mode null rule, ``validation.sql.j2:353-378,445-457``."""
    if with_primary_keys:
        # `:360-365` display; `:370-375` pass rule
        if source_nulls == 0:
            rel_display = 0.0 if target_nulls == 0 else 1.0
            ok = target_nulls == 0
        else:
            rel = abs(source_nulls - target_nulls) / source_nulls
            rel_display = rel
            ok = rel <= tolerance
    else:
        # `:367` display; `:375,453-455` pass rule
        if source_nulls == 0 and target_nulls > 0:
            rel_display = 1.0
        elif target_nulls == 0 and source_nulls > 0:
            rel_display = 1.0
        else:
            rel_display = (
                abs(target_nulls - source_nulls) / source_nulls if source_nulls else 0.0
            )
        if source_nulls == 0:
            ok = target_nulls == 0
        else:
            ok = abs(target_nulls - source_nulls) / source_nulls <= tolerance
    return CheckVerdict(
        alias=f"null_validation_{column}",
        passed=ok,
        payload={
            "source_nulls": fmt_number(source_nulls, 0),
            "target_nulls": fmt_number(target_nulls, 0),
            "relative_diff_percent": fmt_percent(rel_display),
            "tolerance_percent": fmt_percent(tolerance),
            "status": _status(ok),
        },
    )


def agg_rel_diff(source_value: float | None, target_value: float | None) -> float | None:
    """Symmetric relative diff, ``validation.sql.j2:39-48``.

    NULL if either side NULL; 0 if equal or both magnitudes zero; else
    ``abs(s - t) / max(abs(s), abs(t))``.
    """
    if source_value is None or target_value is None:
        return None
    if source_value == target_value:
        return 0.0
    denom = max(abs(source_value), abs(target_value))
    if denom == 0:
        return 0.0
    return abs(source_value - target_value) / denom


def agg_verdict(
    column: str,
    agg: str,
    source_value: float | None,
    target_value: float | None,
    tolerance: float,
) -> CheckVerdict:
    """``validation.sql.j2:381-394,458-464`` — NULL diff coalesces to 0 ⇒ PASS."""
    rel = agg_rel_diff(source_value, target_value)
    ok = (rel if rel is not None else 0.0) <= tolerance
    return CheckVerdict(
        alias=f"agg_validation_{column}_{agg.upper()}",
        passed=ok,
        payload={
            "source_value": fmt_number(source_value, 2),
            "target_value": fmt_number(target_value, 2),
            "relative_diff_percent": fmt_percent(rel),
            "tolerance_percent": fmt_percent(tolerance),
            "status": _status(ok),
        },
    )


def uniqueness_verdict(
    columns: list[str],
    source_count: int,
    source_distinct: int,
    target_count: int,
    target_distinct: int,
    tolerance: float,
) -> CheckVerdict:
    """``validation.sql.j2:397-411,465-470`` — both sides' dupe ratio ≤ tol."""
    src_dupes = source_count - source_distinct
    tgt_dupes = target_count - target_distinct
    src_ratio = src_dupes / source_count if source_count else 0.0
    tgt_ratio = tgt_dupes / target_count if target_count else 0.0
    ok = src_ratio <= tolerance and tgt_ratio <= tolerance
    return CheckVerdict(
        alias="uniqueness_validation_" + "_".join(columns),
        passed=ok,
        payload={
            "source_duplicates": fmt_number(src_dupes, 0),
            "target_duplicates": fmt_number(tgt_dupes, 0),
            "source_dupe_percent": fmt_percent(src_ratio),
            "target_dupe_percent": fmt_percent(tgt_ratio),
            "tolerance_percent": fmt_percent(tolerance),
            "status": _status(ok),
        },
    )


def custom_check_verdict(
    slug: str,
    name: str,
    description: str | None,
    input_sql_template: str,
    rendered_source_sql: str,
    rendered_target_sql: str,
    source_row_count: int,
    target_row_count: int,
    rows_missing_in_target: int,
    rows_missing_in_source: int,
    sample_missing_in_target: str | None,
    sample_missing_in_source: str | None,
    source_hash: str,
    target_hash: str,
    source_locus: str = "driver",
    target_locus: str = "driver",
    source_files_reused: int = 0,
    target_files_reused: int = 0,
) -> CheckVerdict:
    """``validation.sql.j2:414-433,471-476``. ``*_locus`` records where
    each side executed — "sharded" (scan-unit Ray tasks) or "driver"
    (single-node DuckDB full scan, the 100-TB-weak path) — so dashboards
    can flag driver-bound custom checks."""
    ok = (
        rows_missing_in_target == 0
        and rows_missing_in_source == 0
        and (source_hash or "EMPTY") == (target_hash or "EMPTY")
    )
    return CheckVerdict(
        alias=f"custom_sql_validation_{slug}",
        passed=ok,
        payload={
            "name": name,
            "description": description,
            "input_sql_template": input_sql_template,
            "rendered_source_sql": rendered_source_sql,
            "rendered_target_sql": rendered_target_sql,
            "source_row_count": fmt_number(source_row_count, 0),
            "target_row_count": fmt_number(target_row_count, 0),
            "rows_missing_in_target": fmt_number(rows_missing_in_target, 0),
            "rows_missing_in_source": fmt_number(rows_missing_in_source, 0),
            "sample_missing_in_target": sample_missing_in_target,
            "sample_missing_in_source": sample_missing_in_source,
            "execution_locus": {"source": source_locus, "target": target_locus},
            **(
                {
                    "partials_reused": {
                        "source_files": fmt_number(source_files_reused, 0),
                        "target_files": fmt_number(target_files_reused, 0),
                    }
                }
                if source_files_reused or target_files_reused
                else {}
            ),
            "status": _status(ok),
        },
    )


# ---- transcript-engine checks (new vs reference; BASELINE.json) ----


def compare_columns_verdict(
    columns: list[str],
    total_compared_rows: int,
    mismatch_count: int,
    tolerance: float,
) -> CheckVerdict:
    """Per-matched-pair column equality (e.g. per-turn text equality under
    stable (conv_id, turn_idx) ordering). Same arithmetic as row-hash."""
    rel = mismatch_count / total_compared_rows if total_compared_rows else 0.0
    ok = rel <= tolerance
    return CheckVerdict(
        alias="compare_validation_" + "_".join(columns),
        passed=ok,
        payload={
            "compared_rows": fmt_number(total_compared_rows, 0),
            "mismatch_count": fmt_number(mismatch_count, 0),
            "mismatch_percent": fmt_percent(rel),
            "tolerance_percent": fmt_percent(tolerance),
            "status": _status(ok),
        },
    )


def ordering_verdict(
    group_column: str,
    groups_checked: int,
    contiguity_violations: int,
    monotonicity_violations: int,
) -> CheckVerdict:
    bad = contiguity_violations + monotonicity_violations
    ok = bad == 0
    return CheckVerdict(
        alias=f"ordering_validation_{group_column}",
        passed=ok,
        payload={
            "groups_checked": fmt_number(groups_checked, 0),
            "contiguity_violations": fmt_number(contiguity_violations, 0),
            "monotonicity_violations": fmt_number(monotonicity_violations, 0),
            "status": _status(ok),
        },
    )


def _fmt_samples(samples: dict | None, k: int = 5) -> str:
    if not samples:
        return ""
    items = sorted(samples.items(), key=lambda kv: (-kv[1], str(kv[0])))[:k]
    return ", ".join(f"{v} (x{c})" for v, c in items)


def value_rule_verdict(
    kind: str,  # "enum" | "pattern"
    column: str,
    src_checked: int,
    src_violations: int,
    tgt_checked: int,
    tgt_violations: int,
    tolerance: float,
    src_samples: dict | None = None,
    tgt_samples: dict | None = None,
) -> CheckVerdict:
    """Accepted-values / format-regex rule: per-side violating share of
    non-null rows; FAIL when EITHER side exceeds ``tolerance``. The
    payload carries the top violating VALUES with occurrence counts —
    the evidence a fix starts from."""
    s_rel = src_violations / src_checked if src_checked else 0.0
    t_rel = tgt_violations / tgt_checked if tgt_checked else 0.0
    ok = s_rel <= tolerance and t_rel <= tolerance
    return CheckVerdict(
        alias=f"{kind}_validation_{column}",
        passed=ok,
        payload={
            "source_checked_rows": fmt_number(src_checked, 0),
            "source_violations": fmt_number(src_violations, 0),
            "source_violation_percent": fmt_percent(s_rel),
            "source_sample_violations": _fmt_samples(src_samples),
            "target_checked_rows": fmt_number(tgt_checked, 0),
            "target_violations": fmt_number(tgt_violations, 0),
            "target_violation_percent": fmt_percent(t_rel),
            "target_sample_violations": _fmt_samples(tgt_samples),
            "tolerance_percent": fmt_percent(tolerance),
            "status": _status(ok),
        },
    )


def conditional_rule_verdict(
    name: str,
    when: str,
    then: str,
    src_checked: int,
    src_violations: int,
    tgt_checked: int,
    tgt_violations: int,
    tolerance: float,
    src_samples: dict | None = None,
    tgt_samples: dict | None = None,
) -> CheckVerdict:
    """Cross-column implication rule (WHEN p THEN q): per-side violating
    share of the rows where ``when`` holds; FAIL when EITHER side exceeds
    ``tolerance``. Samples carry the top violating ``then``-column value
    tuples with occurrence counts."""
    s_rel = src_violations / src_checked if src_checked else 0.0
    t_rel = tgt_violations / tgt_checked if tgt_checked else 0.0
    ok = s_rel <= tolerance and t_rel <= tolerance
    return CheckVerdict(
        alias=f"conditional_validation_{make_identifier(name)}",
        passed=ok,
        payload={
            "when": when,
            "then": then,
            "source_matched_rows": fmt_number(src_checked, 0),
            "source_violations": fmt_number(src_violations, 0),
            "source_violation_percent": fmt_percent(s_rel),
            "source_sample_violations": _fmt_samples(src_samples),
            "target_matched_rows": fmt_number(tgt_checked, 0),
            "target_violations": fmt_number(tgt_violations, 0),
            "target_violation_percent": fmt_percent(t_rel),
            "target_sample_violations": _fmt_samples(tgt_samples),
            "tolerance_percent": fmt_percent(tolerance),
            "status": _status(ok),
        },
    )


def sequence_grammar_verdict(
    group_column: str,
    role_column: str,
    groups_checked: int,
    groups_flagged: int,
    unknown_rows: int,
    tool_mismatch_rows: int,
    bad_transition_groups: int,
    bad_first_groups: int,
    tolerance: float,
) -> CheckVerdict:
    """Role-grammar sequence validation: ratio of flagged conversations
    (any of unknown role / bad first role / disallowed transition / tool
    pairing) over conversations checked, against ``tolerance``."""
    rel = groups_flagged / groups_checked if groups_checked else 0.0
    ok = rel <= tolerance
    return CheckVerdict(
        alias=f"sequence_grammar_validation_{group_column}",
        passed=ok,
        payload={
            "role_column": role_column,
            "groups_checked": fmt_number(groups_checked, 0),
            "groups_flagged": fmt_number(groups_flagged, 0),
            "flagged_percent": fmt_percent(rel),
            "unknown_role_rows": fmt_number(unknown_rows, 0),
            "tool_pairing_violation_rows": fmt_number(tool_mismatch_rows, 0),
            "bad_transition_groups": fmt_number(bad_transition_groups, 0),
            "bad_first_role_groups": fmt_number(bad_first_groups, 0),
            "tolerance_percent": fmt_percent(tolerance),
            "status": _status(ok),
        },
    )


def freshness_verdict(
    ts_column: str,
    src_max,
    tgt_max,
    max_lag_seconds: float,
) -> CheckVerdict:
    """Replication lag: ``max(src.ts) - max(tgt.ts)`` in seconds (the
    target being ahead counts as 0). One side having a max while the
    other has none (all-NULL / empty) FAILs; both sides empty PASSes
    (nothing to replicate, nothing stale)."""
    payload: dict = {
        "ts_column": ts_column,
        "max_lag_seconds": fmt_number(max_lag_seconds, 2),
    }
    if src_max is None and tgt_max is None:
        ok = True
        payload["note"] = "both sides empty"
    elif src_max is None or tgt_max is None:
        ok = False
        payload["source_max_ts"] = str(src_max)
        payload["target_max_ts"] = str(tgt_max)
        payload["note"] = "one side has no timestamps"
    else:
        delta = src_max - tgt_max
        # timestamp columns subtract to a timedelta; numeric epoch
        # columns subtract to a float already in the column's unit
        lag = (
            delta.total_seconds()
            if hasattr(delta, "total_seconds")
            else float(delta)
        )
        lag = max(0.0, lag)
        ok = lag <= max_lag_seconds
        payload["source_max_ts"] = str(src_max)
        payload["target_max_ts"] = str(tgt_max)
        payload["lag_seconds"] = fmt_number(lag, 2)
    payload["status"] = _status(ok)
    return CheckVerdict(
        alias=f"freshness_validation_{ts_column}", passed=ok, payload=payload
    )


def segment_count_failures(
    src_counts: dict, tgt_counts: dict, tolerance: float
) -> tuple[list[tuple[float, str, int, int]], float]:
    """``(failing segments, worst rel-diff over ALL segments)``; failing
    segments as ``(rel, display_key, src, tgt)``, worst first with a
    deterministic key tie-break — shared by the verdict payload and the
    violations-tree writer."""
    failed: list[tuple[float, str, int, int]] = []
    worst = 0.0
    for k in set(src_counts) | set(tgt_counts):
        s = src_counts.get(k, 0)
        t = tgt_counts.get(k, 0)
        rel = abs(s - t) / max(s, t) if max(s, t) else 0.0
        worst = max(worst, rel)
        if rel > tolerance:
            failed.append((rel, "NULL" if k is None else str(k), s, t))
    failed.sort(key=lambda r: (-r[0], r[1]))
    return failed, worst


def segment_count_verdict(
    column: str,
    src_counts: dict,
    tgt_counts: dict,
    tolerance: float,
    sample_cap: int = 10,
) -> CheckVerdict:
    """Per-segment row-count reconciliation: for every distinct value of
    ``column`` on either side, rel diff = |s - t| / max(s, t); a segment
    missing on one side scores 1.0. FAIL when any segment exceeds
    ``tolerance``. Payload carries the worst offending segments."""
    keys = set(src_counts) | set(tgt_counts)
    failed, worst = segment_count_failures(src_counts, tgt_counts, tolerance)
    ok = not failed
    payload = {
        "column": column,
        "segments_checked": fmt_number(len(keys), 0),
        "segments_failed": fmt_number(len(failed), 0),
        "max_rel_diff_percent": fmt_percent(worst),
        "tolerance_percent": fmt_percent(tolerance),
        "status": _status(ok),
    }
    if failed:
        payload["worst_segments"] = "; ".join(
            f"{name} (src {fmt_number(s, 0)} vs tgt {fmt_number(t, 0)})"
            for _, name, s, t in failed[:sample_cap]
        )
    return CheckVerdict(
        alias=f"segment_count_validation_{column}", passed=ok, payload=payload
    )


def _norm_type(expected: str) -> str:
    """Normalize a user-written type to Arrow's rendered form: simple
    aliases (``float`` → ``float``, ``str`` → ``string``) resolve via
    pyarrow's alias table; parameterized forms (``timestamp[us]``,
    ``decimal128(12, 2)``) pass through and compare as written."""
    import pyarrow as pa

    try:
        return str(pa.type_for_alias(expected.strip()))
    except (ValueError, KeyError):
        return expected.strip()


def _fmt_problems(items: list[str], k: int = 10) -> str:
    items = sorted(items)
    tail = f", … +{len(items) - k} more" if len(items) > k else ""
    return ", ".join(items[:k]) + tail


def schema_verdict(check, src_schema, tgt_schema) -> CheckVerdict:
    """Schema-contract validation (driver-side, footer metadata only):
    per configured side, required columns must exist with the declared
    Arrow type; extra columns flag when ``allow_extra`` is off; with
    ``require_same`` the two sides' (name, type) sets must be identical."""
    sides = {"source": (0,), "target": (1,), "both": (0, 1)}[check.sides]
    schemas = (src_schema, tgt_schema)
    payload: dict = {
        "checked_columns": fmt_number(len(check.columns), 0),
        "allow_extra": str(check.allow_extra).lower(),
        "require_same": str(check.require_same).lower(),
    }
    problems = 0
    expected = {c: _norm_type(t) for c, t in check.columns.items()}
    for side_idx in sides:
        side = ("source", "target")[side_idx]
        schema = schemas[side_idx]
        actual = {f.name: str(f.type) for f in schema}
        missing = [c for c in expected if c not in actual]
        mismatched = [
            f"{c} (expected {t}, got {actual[c]})"
            for c, t in expected.items()
            if c in actual and actual[c] != t
        ]
        extra = (
            [c for c in actual if c not in expected]
            if not check.allow_extra
            else []
        )
        problems += len(missing) + len(mismatched) + len(extra)
        if missing:
            payload[f"{side}_missing_columns"] = _fmt_problems(missing)
        if mismatched:
            payload[f"{side}_type_mismatches"] = _fmt_problems(mismatched)
        if extra:
            payload[f"{side}_unexpected_columns"] = _fmt_problems(extra)
    if check.require_same:
        s = {(f.name, str(f.type)) for f in src_schema}
        t = {(f.name, str(f.type)) for f in tgt_schema}
        only_s = [f"{n}: {ty}" for n, ty in s - t]
        only_t = [f"{n}: {ty}" for n, ty in t - s]
        problems += len(only_s) + len(only_t)
        if only_s:
            payload["only_in_source"] = _fmt_problems(only_s)
        if only_t:
            payload["only_in_target"] = _fmt_problems(only_t)
    ok = problems == 0
    payload["schema_problems"] = fmt_number(problems, 0)
    payload["status"] = _status(ok)
    return CheckVerdict(alias="schema_validation", passed=ok, payload=payload)


def conv_dedup_verdict(
    group_column: str,
    content_columns: list[str],
    src_convs: int,
    src_dups: int,
    tgt_convs: int,
    tgt_dups: int,
    tolerance: float,
    sides: tuple = (0, 1),
    mode: str = "exact",
    num_perm: int = 16,
    bands: int = 4,
    normalize: bool = False,
    src_rekeyed: int | None = None,
    tgt_rekeyed: int | None = None,
) -> CheckVerdict:
    """Duplicate-conversation rate per side — exact mode: conversations
    whose ordered content sequence already occurred under another key on
    the same side; near mode: conversations sharing >=1 MinHash-LSH band
    with another (candidates, not proven duplicates) — over
    conversations checked; FAIL when ANY configured side exceeds
    ``tolerance``."""
    s_rel = src_dups / src_convs if src_convs else 0.0
    t_rel = tgt_dups / tgt_convs if tgt_convs else 0.0
    ok = (0 not in sides or s_rel <= tolerance) and (
        1 not in sides or t_rel <= tolerance
    )
    payload = {
        "content_columns": ", ".join(content_columns),
        "mode": mode,
        "tolerance_percent": fmt_percent(tolerance),
        "status": _status(ok),
    }
    if normalize:
        payload["normalize"] = "true"
    if mode == "near":
        payload["num_perm"] = fmt_number(num_perm, 0)
        payload["bands"] = fmt_number(bands, 0)
    if src_rekeyed is not None:
        # informational migration signal (exact mode, both sides): keys
        # whose content exists on the other side only under other keys
        payload["source_rekeyed_conversations"] = fmt_number(src_rekeyed, 0)
        payload["target_rekeyed_conversations"] = fmt_number(
            tgt_rekeyed or 0, 0
        )
    if 0 in sides:
        payload.update(
            {
                "source_conversations": fmt_number(src_convs, 0),
                "source_duplicates": fmt_number(src_dups, 0),
                "source_duplicate_percent": fmt_percent(s_rel),
            }
        )
    if 1 in sides:
        payload.update(
            {
                "target_conversations": fmt_number(tgt_convs, 0),
                "target_duplicates": fmt_number(tgt_dups, 0),
                "target_duplicate_percent": fmt_percent(t_rel),
            }
        )
    return CheckVerdict(
        alias=f"conv_dedup_validation_{group_column}",
        passed=ok,
        payload=payload,
    )


def referential_verdict(
    columns: list[str],
    side: str,
    probed_rows: int,
    orphan_rows: int,
    tolerance: float,
) -> CheckVerdict:
    rel = orphan_rows / probed_rows if probed_rows else 0.0
    ok = rel <= tolerance
    return CheckVerdict(
        alias=f"referential_validation_{side}_" + "_".join(columns),
        passed=ok,
        payload={
            "probed_rows": fmt_number(probed_rows, 0),
            "orphan_rows": fmt_number(orphan_rows, 0),
            "orphan_percent": fmt_percent(rel),
            "tolerance_percent": fmt_percent(tolerance),
            "status": _status(ok),
        },
    )


def temporal_drift_verdict(
    column: str,
    metric: str,
    statistic: float,
    threshold: float,
    derived: str,
    baseline_run: int,
) -> CheckVerdict:
    """Cross-RUN drift (engine extension): this run's source digest vs
    the baseline run's checkpointed source profile — nightly
    source-shift detection, not source-vs-target."""
    ok = statistic <= threshold
    suffix = (
        f"{column}_{metric}"
        if derived == "value"
        else f"{column}_{derived}_{metric}"
    )
    return CheckVerdict(
        alias=f"temporal_drift_validation_{suffix}",
        passed=ok,
        payload={
            "metric": metric.upper(),
            "baseline_run": baseline_run,
            "statistic": f"{statistic:.6f}",
            "threshold": f"{threshold:.6f}",
            "status": _status(ok),
        },
    )


def drift_verdict(
    column: str,
    metric: str,
    statistic: float,
    threshold: float,
    derived: str = "value",
) -> CheckVerdict:
    ok = statistic <= threshold
    if derived == "value":
        suffix = f"{column}_{metric}"
    elif derived == "turn_count":
        suffix = f"{derived}_{metric}"  # conversation-level, column-free
    else:  # str_len and future per-column derivations keep the column
        suffix = f"{column}_{derived}_{metric}"
    return CheckVerdict(
        alias=f"drift_validation_{suffix}",
        passed=ok,
        payload={
            "metric": metric.upper(),
            "statistic": f"{statistic:.6f}",
            "threshold": f"{threshold:.6f}",
            "status": _status(ok),
        },
    )


@dataclass
class TaskResult:
    """Assembled per-task result mirroring the reference result row
    (``/root/reference/datapact/client.py:306-317``) + violation refs."""

    task_key: str
    status: str
    payload: dict[str, Any]
    passed: bool
    verdicts: list[CheckVerdict] = field(default_factory=list)


def assemble_payload(
    task_key: str,
    applied_filter: str | None,
    primary_keys: list[str] | None,
    verdicts: list[CheckVerdict],
) -> tuple[dict[str, Any], bool]:
    """Payload struct ordering and top-level keys per
    ``validation.sql.j2:322-436``; empty-suite message per ``:94-98``."""
    payload: dict[str, Any] = {
        "applied_filter": applied_filter,
        "configured_primary_keys": ", ".join(primary_keys) if primary_keys else None,
    }
    if not verdicts:
        payload["message"] = f"No validations configured for task {task_key}"
        return payload, True
    overall = True
    for v in verdicts:
        payload[v.alias] = v.payload
        overall = overall and v.passed
    return payload, overall
