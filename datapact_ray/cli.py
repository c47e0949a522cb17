"""CLI: ``run`` / ``plan`` / ``init`` (reference
``/root/reference/datapact/main.py:89-182``).

* ``run`` executes a suite; exits nonzero when any task FAILs — the
  engine's analog of the reference's per-task + aggregate ``RAISE_ERROR``
  fail-fast (``validation.sql.j2:493``,
  ``aggregate_results.sql.j2:223-228``). Also usable via
  ``ray job submit -- python -m datapact_ray.cli run ...``.
* ``plan`` validates the YAML and prints the compiled check plan
  (stages, shuffle keys, estimated passes) without touching Ray.
* ``init`` writes a transcript-oriented starter YAML (refuses to
  overwrite without ``--force``).
"""

from __future__ import annotations

import argparse
import json
import sys

DEFAULT_CONFIG_TEMPLATE = """\
# datapact_ray validation suite
# Each task compares a source parquet table against a target parquet table.
validations:
  - task_key: transcripts_core
    source_path: /data/transcripts/source
    target_path: /data/transcripts/target
    primary_keys: [conv_id, turn_idx]
    schema_check:                    # footer-only, fails before any scan
      columns:
        conv_id: string
        turn_idx: int32
        ts: timestamp[us]
      allow_extra: true
    count_tolerance: 0.001
    pk_row_hash_check: true
    hash_columns: [role, text, tool]
    null_validation_tolerance: 0.0
    null_validation_columns: [tool]
    uniqueness_columns: [conv_id, turn_idx]
    uniqueness_tolerance: 0.0
    compare_columns: [text]          # per-turn text equality
    enum_validations:                # accepted values, native type
      - {column: role, allowed: [user, assistant, tool]}
    pattern_validations:             # full-match format regex
      - {column: conv_id, regex: 'conv-\\d+'}
    conditional_validations:         # cross-column implication rules
      - {name: tool_turns_have_tool, when: "role = 'tool'", then: "tool IS NOT NULL"}
    segment_counts:                  # per-segment row-count reconciliation
      - {column: role, tolerance: 0.001}
    freshness:                       # replica lag: max(ts) source vs target
      ts_column: ts
      max_lag_seconds: 3600
    ordering:
      group_column: conv_id
      index_column: turn_idx
      ts_column: ts
    sequence_grammar:                # role grammar per conversation
      allowed_roles: [user, assistant, tool]
      first_role: user
      allowed_transitions:
        - [user, assistant]
        - [assistant, user]
        - [assistant, tool]
        - [tool, assistant]
      tool_column: tool              # non-null exactly on tool turns
    conv_dedup:                      # duplicate conversations per side
      content_columns: [role, text]
      tolerance: 0.0
    referential:
      - columns: [conv_id]
        ref_path: /data/conversations_dim
    temporal_drift:                  # vs a prior run's source profile
      - {column: ts, metric: ks, threshold: 0.2}
      # run with --temporal-baseline-run N (omit on the bootstrap run)
    drift:
      - {column: ts, metric: psi, threshold: 0.2}
      - {column: ts, metric: ks, threshold: 0.1}
      - {column: text, metric: ks, derived: str_len, threshold: 0.2}
      - {column: ts, metric: ks, derived: ts_gap, threshold: 0.2}
      - {column: role, metric: tvd, derived: categorical, threshold: 0.05}
    business_domain: AI Platform
    business_owner: Data Quality
    business_priority: Critical
    expected_sla_hours: 4
    estimated_impact_usd: 250000
"""


def _plan_lines(suite) -> list[str]:
    lines = []
    for t in suite.validations:
        lines.append(f"task {t.task_key}: {t.source_path} vs {t.target_path}")
        if t.filter:
            lines.append(f"  filter: {t.filter} (pushed to parquet row groups)")
        if t.schema_check:
            lines.append(
                f"  pre-flight: schema contract ({len(t.schema_check.columns)}"
                " columns, footer metadata only — no scan)"
            )
        scan = []
        if t.count_tolerance is not None:
            scan.append("count")
        if t.null_validation_columns and not t.primary_keys:
            scan.append(f"nulls({','.join(t.null_validation_columns)})")
        for av in t.agg_validations or []:
            scan.append(f"agg({av.column}:{','.join(v.agg for v in av.validations)})")
        for d in t.drift or []:
            if d.derived in ("turn_count", "ts_gap"):
                continue  # conversation-level digests ride pass 3
            if d.derived == "categorical":
                scan.append(f"tvd({d.column})")
            else:
                scan.append(f"sketch({d.column}:{d.metric})")
        for ev in t.enum_validations or []:
            scan.append(f"enum({ev.column})")
        for pv in t.pattern_validations or []:
            scan.append(f"pattern({pv.column})")
        for cv in t.conditional_validations or []:
            scan.append(f"cond({cv.name})")
        for sc in t.segment_counts or []:
            scan.append(f"segment-counts({sc.column})")
        if t.freshness:
            scan.append(
                f"freshness({t.freshness.ts_column}"
                f"<={t.freshness.max_lag_seconds}s)"
            )
        if scan:
            lines.append(f"  pass 1 (fused single scan/side): {' '.join(scan)}")
        keyed = []
        if t.pk_row_hash_check and t.primary_keys:
            keyed.append("row-hash")
        if t.compare_columns and t.primary_keys:
            keyed.append(f"compare({','.join(t.compare_columns)})")
        if t.null_validation_columns and t.primary_keys:
            keyed.append("null-join")
        if t.uniqueness_columns and t.uniqueness_tolerance is not None:
            keyed.append(f"uniqueness({','.join(t.uniqueness_columns)})")
        if keyed:
            key = t.primary_keys or t.uniqueness_columns
            lines.append(
                f"  pass 2 (hash shuffle on {key}): {' '.join(keyed)}"
            )
        conv_drift = [
            d for d in t.drift or [] if d.derived in ("turn_count", "ts_gap")
        ]
        if t.ordering or t.sequence_grammar or conv_drift or t.conv_dedup:
            conv_checks = []
            if t.ordering:
                conv_checks.append("ordering/contiguity")
            for d in conv_drift:
                conv_checks.append(f"drift({d.derived}:{d.metric})")
            if t.sequence_grammar:
                conv_checks.append(
                    f"role-grammar({t.sequence_grammar.role_column})"
                )
            if t.conv_dedup:
                d = t.conv_dedup
                detail = (
                    f"minhash {d.num_perm}x{d.bands}-band"
                    if d.mode == "near"
                    else "exact fingerprint"
                )
                conv_checks.append(
                    "conv-dedup("
                    + ",".join(d.content_columns)
                    + ("+normalize" if d.normalize else "")
                    + f"; {detail}, chained exchange)"
                )
            g_col = (
                t.ordering.group_column
                if t.ordering
                else (
                    t.conv_dedup.group_column if t.conv_dedup else "conv_id"
                )
            )
            lines.append(
                f"  pass 3 (conv shuffle on {g_col}, salted hot keys): "
                + " ".join(conv_checks)
            )
        for ref in t.referential or []:
            lines.append(
                f"  referential: {ref.columns} ⊆ {ref.ref_path} (broadcast keyset/Bloom)"
            )
        for c in t.custom_checks or []:
            lines.append(
                f"  custom check: {c.name} (multiset diff; "
                f"{_custom_locus(c.sql, t.source_path, t.target_path)})"
            )
    return lines


def _custom_locus(sql: str, source_path: str, target_path: str) -> str:
    """Label a custom check's execution locus for the plan printer:
    decomposable aggregate shapes shard per scan unit as Ray tasks;
    everything else is a LOUD warning — a driver-side full scan of both
    sides, single-node at 100-TB scale."""
    import duckdb

    from .io import list_parquet_files
    from .stages.custom import plan_sharded, render_custom_sql

    try:
        src_files = list_parquet_files(source_path)
        tgt_files = list_parquet_files(target_path)
        con = duckdb.connect()
        try:
            for view, files in (("src", src_files), ("tgt", tgt_files)):
                file_list = ", ".join(f"'{f}'" for f in files)
                con.execute(
                    f"CREATE VIEW {view} AS SELECT * FROM read_parquet([{file_list}])"
                )
            input_cols = {
                view: {r[0]: r[1] for r in con.execute(f"DESCRIBE {view}").fetchall()}
                for view in ("src", "tgt")
            }
            loci, joins = [], []
            for side in ("source", "target"):
                rendered = render_custom_sql(sql, side, src_files, tgt_files)
                schema = [
                    (r[0], r[1])
                    for r in con.execute(f"DESCRIBE {rendered}").fetchall()
                ]
                plan = plan_sharded(rendered, schema, input_cols)
                loci.append(plan is not None)
                joins.append(plan is not None and plan.join is not None)
        finally:
            con.close()
    except Exception:
        return "locus undetermined before run (inputs unreadable at plan time)"
    if all(loci):
        if any(joins):
            return (
                "SHARDED: equi-join bucket shuffle (both sides hash-"
                "partitioned by join key), DuckDB-on-bucket Ray tasks"
            )
        return "SHARDED: decomposed per scan unit, DuckDB-on-fragment Ray tasks"
    return (
        "WARNING — DRIVER-SIDE DuckDB FULL SCAN (query not decomposable: "
        "outer/non-equi/self join, subquery, window, LIMIT, SELECT "
        "DISTINCT or non-mergeable aggregate); single-node at scale"
    )


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="datapact-ray", description="Ray-Data-native validation engine"
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p_run = sub.add_parser("run", help="execute a validation suite")
    p_run.add_argument("--config", "-c", required=True)
    p_run.add_argument("--results-dir", required=True)
    p_run.add_argument("--run-id", type=int, default=1)
    p_run.add_argument("--job-name", default="datapact-ray")
    p_run.add_argument("--resume", action="store_true",
                       help="skip partitions with completed checkpoints")
    p_run.add_argument("--num-cpus", type=int, default=None)
    p_run.add_argument("--max-parallel-tasks", type=int, default=1,
                       help="run up to N validation tasks concurrently "
                            "(reference parity: parallel job tasks); "
                            "ignored with fail-fast semantics")
    p_run.add_argument("--fail-fast", action="store_true",
                       help="stop at the first failing task (forces "
                            "sequential execution)")
    p_run.add_argument("--incremental-from", type=int, default=None,
                       help="prior run_id whose checkpointed state this "
                       "run may reuse for append-only inputs: profile "
                       "monoids, keyed bucket inputs, custom-SQL "
                       "partials and referential counts — verdicts stay "
                       "identical to a full run; any lineage/spec/"
                       "fingerprint mismatch silently runs full")
    p_run.add_argument("--persist-keyed-inputs", action="store_true",
                       help="persist each keyed bucket's projected "
                       "input so the NEXT run can cite this one via "
                       "--incremental-from (implied when "
                       "--incremental-from is set)")
    p_run.add_argument("--temporal-baseline-run", type=int, default=None,
                       help="compare this run's source profiles against "
                            "run N's checkpointed profiles for tasks with "
                            "temporal_drift (omit on the bootstrap run)")
    p_run.add_argument("--dry-run", action="store_true")

    p_plan = sub.add_parser("plan", help="validate config and print the plan")
    p_plan.add_argument("--config", "-c", required=True)

    p_init = sub.add_parser("init", help="write a starter config")
    p_init.add_argument("--output", "-o", default="validation_config.yml")
    p_init.add_argument("--force", action="store_true")

    p_rep = sub.add_parser(
        "report", help="(re)render report.md/report.html for a finished run"
    )
    p_rep.add_argument("--results-dir", required=True)
    p_rep.add_argument("--run-id", type=int, default=1)

    p_dash = sub.add_parser(
        "dashboard",
        help="(re)build the dashboard datasets (ds_*) from run history",
    )
    p_dash.add_argument("--results-dir", required=True)
    p_dash.add_argument("--job-name", default=None)

    args = parser.parse_args(argv)

    if args.command == "dashboard":
        from .dashboard import write_dashboard

        frames = write_dashboard(args.results_dir, args.job_name)
        for name, df in frames.items():
            print(f"{name}: {len(df)} row(s)")
        return 0

    if args.command == "report":
        from .report import write_report

        paths = write_report(args.results_dir, args.run_id)
        print(f"Wrote {paths['md']} and {paths['html']}")
        return 0

    if args.command == "init":
        import os

        if os.path.exists(args.output) and not args.force:
            print(
                f"Refusing to overwrite {args.output} (use --force).",
                file=sys.stderr,
            )
            return 1
        with open(args.output, "w", encoding="utf-8") as fh:
            fh.write(DEFAULT_CONFIG_TEMPLATE)
        print(f"Wrote starter config to {args.output}")
        return 0

    from .config import load_suite

    suite = load_suite(args.config)

    if args.command == "plan" or getattr(args, "dry_run", False):
        print(f"Suite OK: {len(suite.validations)} task(s)")
        for line in _plan_lines(suite):
            print(line)
        return 0

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", logging_level="ERROR", **kwargs)
    try:
        from .runner import RunConfig, run_suite

        summary = run_suite(
            suite,
            RunConfig(
                results_dir=args.results_dir,
                run_id=args.run_id,
                job_name=args.job_name,
                resume=args.resume,
                max_parallel_tasks=args.max_parallel_tasks,
                fail_fast=args.fail_fast,
                temporal_baseline_run=args.temporal_baseline_run,
                incremental_from=args.incremental_from,
                persist_keyed_inputs=args.persist_keyed_inputs,
            ),
        )
        for r in summary.results:
            print(f"[{r.status}] {r.task_key}")
            if not r.passed:
                print(json.dumps(r.payload, indent=1))
        if summary.failure_count:
            print(
                f"datapact-ray validation tasks failed: "
                f"{summary.failure_count} of {len(summary.results)} "
                f"({', '.join(summary.failed_task_keys)})",
                file=sys.stderr,
            )
            return 1
        print(f"All {len(summary.results)} validation task(s) passed.")
        return 0
    finally:
        if owns_ray:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
