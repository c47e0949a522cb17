"""Validation runner: compiles a suite into fused Ray Data passes and
executes it with per-partition checkpoints.

Per-task lifecycle (Ray-Data-first translation of the reference's
per-task SQL script, ``validation.sql.j2`` + SURVEY.md §3.4):

1. **profile pass** — one fused scan per side (counts, nulls, agg
   partials, drift t-digests, hot-key detection); checkpointed whole.
2. **keyed pass** — one hash shuffle for everything key-shaped
   (uniqueness, row-hash compare, null-over-matched-pairs, per-turn
   column equality) with per-bucket checkpoints and violation rows.
3. **conversation pass** — ordering / contiguity / turn-count
   distribution with contiguous-range salting of hot keys.
4. **referential pass** — broadcast key set / Bloom probe.
5. **custom checks** — DuckDB on both sides, multiset diff compare.
6. driver-side verdict assembly (reference tolerance arithmetic /
   payload shape, see ``verdicts.py``), result row append, fail-fast
   status (the ``RAISE_ERROR`` analog is a nonzero exit in the CLI).

Checkpoint layout (resumable; FIXTURES.md F5)::

    <results_dir>/checkpoint/run_id=<r>/task=<task_key>/
        lineage.json                      # input files, partitioning spec
        profile_source.pkl / profile_target.pkl  (+ .done markers)
        keyed/bucket=<b>/{violations.parquet, metrics.pkl, _SUCCESS}
        conv/bucket=<b>/...
    <results_dir>/results/run_id=<r>/results.parquet
    <results_dir>/violations/run_id=<r>/task=<task_key>/*.parquet
"""

from __future__ import annotations

import json
import os
import pickle
import sys
import time
from dataclasses import dataclass, field
from datetime import datetime, timezone

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from . import verdicts as V
from .config import ValidationSuite, ValidationTask
from .expr import compile_filter
from .io import (
    count_rows,
    detect_hot_keys_from_footers,
    file_stats,
    list_parquet_files,
    read_table,
    stats_match,
    table_schema,
)
from .sketches import ks_statistic, psi_statistic, tvd_statistic
from .stages.custom import run_custom_check
from .stages.keyed import KeyedSpec, _atomic_write, run_keyed_pass
from .stages.profile import (
    ProfileSpec,
    run_profile,
    run_profile_pair,
    run_profile_pair_files,
)
from .stages.referential import run_referential_pass

RESULT_SCHEMA = pa.schema(
    [
        ("task_key", pa.string()),
        ("status", pa.string()),
        ("run_id", pa.int64()),
        ("job_name", pa.string()),
        ("job_start_ts", pa.timestamp("us")),
        ("validation_begin_ts", pa.timestamp("us")),
        ("validation_complete_ts", pa.timestamp("us")),
        ("source_table", pa.string()),
        ("target_table", pa.string()),
        ("business_domain", pa.string()),
        ("business_owner", pa.string()),
        ("business_priority", pa.string()),
        ("expected_sla_hours", pa.float64()),
        ("estimated_impact_usd", pa.float64()),
        ("result_payload", pa.string()),
    ]
)


@dataclass
class RunConfig:
    results_dir: str
    run_id: int = 1
    job_name: str = "datapact-ray"
    batch_size: int = 65536
    num_buckets: int | None = None  # None -> sized from row counts
    # per-bucket reduce frames are FIXED-WIDTH (hashes/keys, ~40 B/row):
    # 4M rows ≈ 160 MB per reduce task. Small buckets are not "safer" —
    # every map task materializes num_buckets plasma objects, and the
    # per-object cost (~2.4 ms through the single raylet/owner, measured)
    # makes M×B object count the dominant serial term of the shuffle.
    target_rows_per_bucket: int = 4_000_000
    hot_key_threshold: int = 50_000
    profile_concurrency: tuple[int, int] | int | None = None
    resume: bool = False
    fail_fast: bool = False  # stop at first failing task
    # reference parity: the Databricks orchestrator launches validation
    # tasks as PARALLEL job tasks (its rollups even report peak parallel
    # tasks). >1 runs up to that many tasks concurrently as driver
    # threads — each task is orchestration over Ray tasks, so threads
    # compose; per-task checkpoint dirs never collide. Ignored (forced
    # sequential) when fail_fast is set, so "stop at first failure"
    # keeps its exact meaning.
    max_parallel_tasks: int = 1
    # incremental validation: reuse the cited prior run's checkpointed
    # state for append-only inputs, scanning ONLY the files added since.
    # Exact for EVERY pass: profile monoids merge; the keyed/conv
    # exchange unions the prior run's persisted bucket inputs with the
    # new files' rows (so cross-file key collisions ARE caught — the
    # checker sees the same multiset a full scan would); sharded
    # custom-SQL partials concatenate; referential counts add. Falls
    # back to a full scan per channel when lineage/spec/filter changed,
    # files were REMOVED, or any reused file's (size, mtime) fingerprint
    # changed (in-place rewrite).
    incremental_from: int | None = None
    # temporal drift baseline: compare this run's SOURCE profile digests
    # against run N's checkpointed source profile for every task that
    # configures `temporal_drift` (nightly source-shift detection)
    temporal_baseline_run: int | None = None
    # keyed/conv incremental reuse: persist each keyed bucket's PROJECTED
    # input (fixed-width exchange payload, never raw text) so the next
    # run citing this one via `incremental_from` can scan only the
    # newly-added files and union per bucket — verdicts stay identical
    # to a full run because the checker sees the same multiset. Enabled
    # automatically whenever `incremental_from` is set (chained nightly
    # runs keep persisting); set it explicitly on the BASE run to make
    # the first incremental run possible.
    persist_keyed_inputs: bool = False


@dataclass
class RunSummary:
    run_id: int
    job_name: str
    job_start_ts: datetime
    results: list[V.TaskResult] = field(default_factory=list)
    rows: list[dict] = field(default_factory=list)

    @property
    def failure_count(self) -> int:
        return sum(1 for r in self.results if not r.passed)

    @property
    def failed_task_keys(self) -> list[str]:
        return [r.task_key for r in self.results if not r.passed]


_SIDES = {"source": (0,), "target": (1,), "both": (0, 1)}


def _guard_categories(
    kind: str, column: str, cap: int, src_counts: dict, tgt_counts: dict
) -> None:
    """Per-check cardinality enforcement at verdict time: the SCAN runs
    under the loosest configured cap for a shared column, so each check
    re-applies its OWN cap here with a message naming the check that
    configured it."""
    n = max(len(src_counts), len(tgt_counts))
    if n > cap:
        raise ValueError(
            f"{kind}: column '{column}' has {n} distinct values "
            f"(configured cap {cap}) — this is a high-cardinality "
            "column, not a segment/category key"
        )


def _now() -> datetime:
    return datetime.now(timezone.utc).replace(tzinfo=None)


class ValidationRunner:
    def __init__(self, suite: ValidationSuite, config: RunConfig):
        self.suite = suite
        self.config = config

    # ---- checkpoint helpers ----

    def _task_ckpt(self, task_key: str, run_id: int | None = None) -> str:
        return os.path.join(
            self.config.results_dir,
            "checkpoint",
            f"run_id={run_id if run_id is not None else self.config.run_id}",
            f"task={task_key}",
        )

    def _load_or_run_profile(self, name: str, ckpt: str, fn):
        """Coarse profile checkpoint: the profile pass is the cheap scan;
        its merged partial (KBs) is checkpointed whole per side."""
        path = os.path.join(ckpt, f"profile_{name}.pkl")
        if self.config.resume and os.path.exists(path + ".done"):
            with open(path, "rb") as fh:
                return pickle.load(fh)
        result = fn()
        _atomic_write(path, pickle.dumps(result))
        _atomic_write(path + ".done", b"")
        return result

    # ---- per-task execution ----

    def run_task(self, task: ValidationTask) -> V.TaskResult:
        cfg = self.config
        begin = _now()
        ckpt = self._task_ckpt(task.task_key)
        if not cfg.resume and os.path.isdir(ckpt):
            # a fresh (non-resume) run must never see a previous run's
            # bucket checkpoints for the same run_id — stale metrics would
            # silently merge into this run's verdicts
            import shutil

            shutil.rmtree(ckpt, ignore_errors=True)
        os.makedirs(ckpt, exist_ok=True)

        src_files = list_parquet_files(task.source_path)
        tgt_files = list_parquet_files(task.target_path)
        src_schema = table_schema(task.source_path)
        tgt_schema = table_schema(task.target_path)
        lineage = {
            "task_key": task.task_key,
            "source_files": src_files,
            "target_files": tgt_files,
            # (size, mtime_ns) per file: incremental reuse must prove a
            # prior run's files are UNCHANGED, not merely still present
            # (an in-place rewrite keeps the path but invalidates state)
            "file_stats": file_stats(src_files + tgt_files),
            "filter": task.filter,
            "partitioning": {
                # bucket ids come from polars' column hash (stable per
                # version+seed); a resume must run the same version
                "hash": "polars-%s/seed-20260817"
                % __import__("polars").__version__,
                "num_buckets": None,  # filled below
            },
        }

        verdict_list: list[V.CheckVerdict] = []
        if task.schema_check:
            # footer metadata only — and a broken contract SHORT-CIRCUITS
            # the task: a renamed/re-typed column fails in milliseconds
            # with the schema verdict as the result, instead of
            # submitting a doomed 100-TB scan that dies on a KeyError
            # inside a map task
            sv = V.schema_verdict(task.schema_check, src_schema, tgt_schema)
            verdict_list.append(sv)
            if not sv.passed:
                payload, passed = V.assemble_payload(
                    task.task_key, task.filter, task.primary_keys, verdict_list
                )
                result = V.TaskResult(
                    task_key=task.task_key,
                    status="FAILURE",
                    payload=payload,
                    passed=False,
                    verdicts=verdict_list,
                )
                result.begin_ts = begin  # type: ignore[attr-defined]
                result.complete_ts = _now()  # type: ignore[attr-defined]
                return result
        pk = task.primary_keys or []
        uniq_cols = task.uniqueness_columns or []
        uniqueness_enabled = bool(uniq_cols) and task.uniqueness_tolerance is not None
        nulls_enabled = bool(task.null_validation_columns) and (
            task.null_validation_tolerance is not None
        )
        nulls_use_pk = nulls_enabled and bool(pk)
        drift_checks = task.drift or []
        temporal_checks = task.temporal_drift or []
        value_drift_cols = [
            d.column
            for d in list(drift_checks) + list(temporal_checks)
            if d.derived == "value"
        ]
        len_drift_cols = [
            d.column
            for d in list(drift_checks) + list(temporal_checks)
            if d.derived == "str_len"
        ]
        cat_drift_cols = [
            (d.column, d.max_categories)
            for d in list(drift_checks) + list(temporal_checks)
            if d.derived == "categorical"
        ]
        want_turn_count_drift = any(d.derived == "turn_count" for d in drift_checks)
        want_ts_gap_drift = any(d.derived == "ts_gap" for d in drift_checks)

        all_parquet = all(
            f.endswith(".parquet") for f in src_files + tgt_files
        )
        filter_expr = (
            compile_filter(task.filter, src_schema) if task.filter else None
        )
        # the fused parquet paths apply the filter AFTER the projected
        # read, so every column the filter references must be read too
        # (read_table does this internally; the raw-task paths must not
        # be narrower or table.filter raises 'No match for FieldRef')
        filter_cols: set[str] = set()
        if task.filter:
            from .expr import parse_filter, referenced_columns

            filter_cols = referenced_columns(parse_filter(task.filter))

        # ---------- pass 1: fused profile (one scan per side) ----------
        stats_needed = (
            task.count_tolerance is not None
            or task.agg_validations
            or uniqueness_enabled
            or (nulls_enabled and not pk)
            or value_drift_cols
            or len_drift_cols
            or cat_drift_cols
            or task.enum_validations
            or task.pattern_validations
            or task.conditional_validations
            or task.segment_counts
            or task.freshness
            or temporal_checks
        )
        profile_cols: set[str] = set()
        spec = ProfileSpec()
        if nulls_enabled and not pk:
            spec.null_columns = list(task.null_validation_columns)
            profile_cols.update(spec.null_columns)
        for av in task.agg_validations or []:
            aggs = spec.agg_columns.setdefault(av.column, set())
            aggs.update(v.agg for v in av.validations)
            profile_cols.add(av.column)
        spec.sketch_columns = list(dict.fromkeys(value_drift_cols))
        profile_cols.update(spec.sketch_columns)
        spec.len_sketch_columns = list(dict.fromkeys(len_drift_cols))
        profile_cols.update(spec.len_sketch_columns)
        for ev in task.enum_validations or []:
            spec.enum_columns[ev.column] = list(ev.allowed)
            profile_cols.add(ev.column)
        for pv in task.pattern_validations or []:
            spec.pattern_columns[pv.column] = pv.regex
            profile_cols.add(pv.column)
        # both value-counts consumers (segment_counts + categorical
        # drift) share one preflight and one monoid; the SCAN guard is
        # the LOOSEST configured cap (each check re-enforces its own cap
        # at verdict time, so a strict segment guard never kills a
        # categorical check the user sized larger, or vice versa)
        for kind, col, cap in [
            ("segment_counts", sc.column, sc.max_segments)
            for sc in task.segment_counts or []
        ] + [("drift derived=categorical", c, m) for c, m in cat_drift_cols]:
            for schema, side in ((src_schema, "source"), (tgt_schema, "target")):
                if col not in schema.names:
                    raise ValueError(
                        f"{kind}: column '{col}' missing from the "
                        f"{side} table"
                    )
                if pa.types.is_nested(schema.field(col).type):
                    raise ValueError(
                        f"{kind}: column '{col}' has nested type "
                        f"{schema.field(col).type} — segment/category "
                        "keys must be primitive values"
                    )
            cur = spec.segment_count_columns.get(col)
            spec.segment_count_columns[col] = max(cur or 0, cap)
            profile_cols.add(col)
        if task.freshness:
            fcol = task.freshness.ts_column
            for schema, side in ((src_schema, "source"), (tgt_schema, "target")):
                if fcol not in schema.names:
                    raise ValueError(
                        f"freshness: column '{fcol}' missing from the "
                        f"{side} table"
                    )
                ftyp = schema.field(fcol).type
                if not (
                    pa.types.is_timestamp(ftyp)
                    or pa.types.is_date(ftyp)
                    or pa.types.is_integer(ftyp)
                    or pa.types.is_floating(ftyp)
                ):
                    raise ValueError(
                        f"freshness: column '{fcol}' on the {side} side "
                        f"is {ftyp} — lag needs a timestamp, date or "
                        "numeric-epoch column"
                    )
            spec.agg_columns.setdefault(fcol, set()).add("MAX")
            profile_cols.add(fcol)
        cond_cols: dict[str, set[str]] = {}
        for cv in task.conditional_validations or []:
            from .expr import parse_filter, referenced_columns

            spec.cond_rules[cv.name] = (cv.when, cv.then)
            cols = referenced_columns(parse_filter(cv.when)) | referenced_columns(
                parse_filter(cv.then)
            )
            cond_cols[cv.name] = cols
            profile_cols.update(cols)
        # pre-flight type checks: a misconfigured rule fails HERE with a
        # clear message, not as an ArrowInvalid inside a distributed scan
        if spec.enum_columns or spec.len_sketch_columns or spec.cond_rules:
            for schema, side in ((src_schema, "source"), (tgt_schema, "target")):
                for rule_name, cols in cond_cols.items():
                    missing = sorted(c for c in cols if c not in schema.names)
                    if missing:
                        raise ValueError(
                            f"conditional_validations: rule '{rule_name}' "
                            f"references column(s) {missing} missing from "
                            f"the {side} table"
                        )
                if spec.cond_rules:
                    # TYPE-bind each rule's predicates against the actual
                    # schema by filtering an empty table — the same kernel
                    # resolution the scan tasks will do, so a string
                    # column compared to an int fails HERE with a clear
                    # message, not as ArrowNotImplementedError inside a
                    # distributed batch
                    from .expr import compile_to_arrow as _c2a
                    from .expr import parse_filter as _pf

                    empty_tbl = pa.Table.from_pylist([], schema=schema)
                    for rule_name, (when_sql, then_sql) in sorted(
                        spec.cond_rules.items()
                    ):
                        for label, sql in (("when", when_sql), ("then", then_sql)):
                            try:
                                empty_tbl.filter(_c2a(_pf(sql)))
                            except Exception as exc:
                                raise ValueError(
                                    f"conditional_validations: rule "
                                    f"'{rule_name}' {label} predicate "
                                    f"{sql!r} does not type-check against "
                                    f"the {side} schema: {exc}"
                                ) from exc
                for col, allowed in spec.enum_columns.items():
                    if col not in schema.names:
                        raise ValueError(
                            f"enum_validations: column '{col}' missing from "
                            f"the {side} table"
                        )
                    try:
                        pa.array(allowed, type=schema.field(col).type)
                    except Exception as exc:
                        raise ValueError(
                            f"enum_validations: allowed values for '{col}' do "
                            f"not fit the {side} column type "
                            f"{schema.field(col).type}: {exc}"
                        ) from exc
                for col in spec.len_sketch_columns:
                    if col in schema.names and not (
                        pa.types.is_string(schema.field(col).type)
                        or pa.types.is_large_string(schema.field(col).type)
                    ):
                        raise ValueError(
                            f"drift derived=str_len: column '{col}' on the "
                            f"{side} side is {schema.field(col).type}, not a "
                            "string column"
                        )
        if (
            task.ordering
            or want_turn_count_drift
            or task.sequence_grammar
            or task.conv_dedup
        ) and not all_parquet:
            # parquet inputs get hot keys from footer statistics instead
            # (detect_hot_keys_from_footers) — no scan on the critical path
            group_col = (
                task.ordering.group_column
                if task.ordering
                else (
                    task.conv_dedup.group_column if task.conv_dedup else "conv_id"
                )
            )
            spec.heavy_hitter_column = group_col
            profile_cols.add(group_col)

        # bucket sizing from parquet footers (no data read): enough buckets
        # to (a) bound per-bucket memory and (b) keep every core busy in
        # the post-shuffle verify stage
        import ray as _ray

        cluster_cpus = int(_ray.cluster_resources().get("CPU", 8)) if (
            _ray.is_initialized()
        ) else 8
        est_rows = max(count_rows(task.source_path), count_rows(task.target_path))
        # one reduce wave per core, growing with data so per-bucket frames
        # stay ~target_rows_per_bucket; NOT a multiple of cores — each map
        # task materializes num_buckets return objects, and oversized B
        # floods the object store with tiny objects (measured 3x slowdown
        # at B=4*cpus vs B=cpus on 4M rows)
        num_buckets = cfg.num_buckets or max(
            cluster_cpus,
            min(4096, est_rows // cfg.target_rows_per_bucket + 1),
        )
        # resume: bucket ids depend on num_buckets (sized from the LIVE
        # cluster above) and on the hash version — a resumed run must use
        # the ORIGINAL bucketing and identical inputs, or checkpointed
        # buckets are incompatible with freshly computed ones
        lineage_path = os.path.join(ckpt, "lineage.json")
        if cfg.resume and os.path.exists(lineage_path):
            with open(lineage_path) as fh:
                prev_lineage = json.load(fh)
            mismatched = [
                k
                for k in ("source_files", "target_files", "filter")
                if prev_lineage.get(k) != lineage[k]
            ]
            prev_part = prev_lineage.get("partitioning", {})
            if prev_part.get("hash") != lineage["partitioning"]["hash"]:
                mismatched.append("partitioning.hash")
            prev_buckets = prev_part.get("num_buckets")
            if cfg.num_buckets and prev_buckets and cfg.num_buckets != prev_buckets:
                mismatched.append("num_buckets")
            if mismatched:
                raise ValueError(
                    f"resume refused for task '{task.task_key}': lineage "
                    f"mismatch on {mismatched} vs the checkpointed run. "
                    "Clear the checkpoint directory or use a new run_id."
                )
            if prev_buckets:
                num_buckets = prev_buckets
        lineage["partitioning"]["num_buckets"] = num_buckets
        # salting only pays when one conversation would dominate a bucket;
        # below that, hash bucketing absorbs the skew on its own.
        # Computed AFTER resume adopts the checkpointed num_buckets: the
        # hot/cold split decides each row's bucket routing, so a resumed
        # run on a different-size cluster must derive it from the SAME
        # bucket count as the original run or reused checkpoints would
        # mix incompatible routings.
        hot_threshold = max(
            cfg.hot_key_threshold, 2 * (est_rows // num_buckets) if est_rows else 0
        )
        # profile-spec signature: an incremental run may only merge prior
        # profile monoids produced under the IDENTICAL spec + filter
        lineage["profile_spec"] = {
            "null_columns": sorted(spec.null_columns),
            "agg_columns": {
                c: sorted(a) for c, a in sorted(spec.agg_columns.items())
            },
            "sketch_columns": sorted(spec.sketch_columns),
            "len_sketch_columns": sorted(spec.len_sketch_columns),
            "enum_columns": {
                c: [repr(v) for v in vals]
                for c, vals in sorted(spec.enum_columns.items())
            },
            "pattern_columns": dict(sorted(spec.pattern_columns.items())),
            "cond_rules": {
                n: list(r) for n, r in sorted(spec.cond_rules.items())
            },
            "heavy_hitter_column": spec.heavy_hitter_column,
        }
        _atomic_write(lineage_path, json.dumps(lineage, indent=1).encode())

        # referential + custom checks don't consume profile output — start
        # them immediately so they overlap the profile scan
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=6)
        futures: dict[str, object] = {}
        # referential incremental: probed/orphan counts are additive over
        # probe files, so an append-only run probes only NEW fact files
        # and adds the prior run's recorded counts — valid only when the
        # DIM file list, columns, cap and filter are all unchanged
        ref_cache_dir = os.path.join(ckpt, "referential")
        ref_prior_dir = (
            os.path.join(
                self._task_ckpt(task.task_key, cfg.incremental_from),
                "referential",
            )
            if cfg.incremental_from is not None
            else None
        )

        def run_ref_side(ri, ref, side, path, pfiles, upf):
            from .stages.referential import ReferentialMetrics

            ref_files = list_parquet_files(ref.ref_path)
            cfg_sig = {
                "filter": task.filter,
                "ref_files": sorted(ref_files),
                # dim fingerprints: an in-place dim rewrite must refuse
                "ref_stats": file_stats(ref_files),
                "probe_columns": list(ref.columns),
                "ref_columns": list(ref.ref_columns or ref.columns),
                "cap": task.max_violations_per_partition,
            }
            probe_stats = file_stats(pfiles) if upf else {}
            prior = None
            if upf and ref_prior_dir:
                rec_path = os.path.join(ref_prior_dir, f"ref_{ri}_{side}.json")
                if os.path.exists(rec_path):
                    with open(rec_path, encoding="utf-8") as fh:
                        rec = json.load(fh)
                    covered = set(rec.get("probe_files") or [])
                    if (
                        rec.get("config") == cfg_sig
                        and covered <= set(pfiles)
                        and stats_match(
                            rec.get("probe_stats"), probe_stats, covered
                        )
                    ):
                        prior = rec
            probe_list = (
                [f for f in pfiles if f not in set(prior["probe_files"])]
                if prior is not None
                else pfiles
            )
            if prior is not None and not probe_list:
                m = ReferentialMetrics(
                    prior["probed_rows"], prior["orphan_rows"], prior["violations"]
                )
            else:
                m = run_referential_pass(
                    None
                    if upf
                    else read_table(
                        path, columns=ref.columns, filter_sql=task.filter
                    ),
                    read_table(
                        ref.ref_path, columns=ref.ref_columns or ref.columns
                    ),
                    ref.columns,
                    ref.ref_columns or ref.columns,
                    cap=task.max_violations_per_partition,
                    ref_files=ref_files,
                    probe_files=probe_list if upf else None,
                    filter_expr=filter_expr,
                    filter_columns=filter_cols,
                )
                if prior is not None:
                    m = ReferentialMetrics(
                        m.probed_rows + prior["probed_rows"],
                        m.orphan_rows + prior["orphan_rows"],
                        (prior["violations"] or []) + (m.violations or []),
                    )
            if upf:
                os.makedirs(ref_cache_dir, exist_ok=True)
                _atomic_write(
                    os.path.join(ref_cache_dir, f"ref_{ri}_{side}.json"),
                    json.dumps(
                        {
                            "config": cfg_sig,
                            "probe_files": sorted(pfiles),
                            "probe_stats": probe_stats,
                            "probed_rows": int(m.probed_rows),
                            "orphan_rows": int(m.orphan_rows),
                            "violations": m.violations,
                        },
                        default=str,
                    ).encode(),
                )
            return m

        for ri, ref in enumerate(task.referential or []):
            ref_sides = ["source", "target"] if ref.side == "both" else [ref.side]
            for side in ref_sides:
                path = task.source_path if side == "source" else task.target_path
                pfiles = list_parquet_files(path)
                use_probe_files = all(f.endswith(".parquet") for f in pfiles)
                futures[f"ref:{ri}:{side}"] = pool.submit(
                    lambda ri=ri, ref=ref, side=side, path=path, pfiles=pfiles,
                    upf=use_probe_files: run_ref_side(
                        ri, ref, side, path, pfiles, upf
                    )
                )
        # custom-SQL incremental: sharded partials are fragmentation-
        # independent monoids, so a prior run's cached partial tables
        # cover their recorded files and only NEW files re-scan (the
        # per-query file-subset guard lives in _run_side_sharded)
        custom_cache = os.path.join(ckpt, "custom")
        custom_prior = (
            os.path.join(
                self._task_ckpt(task.task_key, cfg.incremental_from), "custom"
            )
            if cfg.incremental_from is not None
            else None
        )
        for ci, custom in enumerate(task.custom_checks or []):
            futures[f"custom:{ci}"] = pool.submit(
                lambda custom=custom: run_custom_check(
                    custom.sql,
                    src_files,
                    tgt_files,
                    cache_dir=custom_cache,
                    prior_cache_dir=custom_prior,
                )
            )

        src_profile = tgt_profile = None
        profile_wanted = stats_needed or spec.heavy_hitter_column

        def _incremental_prior() -> tuple | None:
            """Prior run's (profiles, new_src, new_tgt) when the
            incremental preconditions hold, else None (→ full scan)."""
            if cfg.incremental_from is None or not all_parquet:
                return None
            prior_ckpt = self._task_ckpt(task.task_key, cfg.incremental_from)
            plineage_path = os.path.join(prior_ckpt, "lineage.json")
            psrc = os.path.join(prior_ckpt, "profile_source.pkl")
            ptgt = os.path.join(prior_ckpt, "profile_target.pkl")
            if not (
                os.path.exists(plineage_path)
                and os.path.exists(psrc + ".done")
                and os.path.exists(ptgt + ".done")
            ):
                return None
            with open(plineage_path) as fh:
                prior = json.load(fh)
            if (
                prior.get("filter") != task.filter
                or prior.get("profile_spec") != lineage["profile_spec"]
            ):
                return None
            prev_src = set(prior.get("source_files") or [])
            prev_tgt = set(prior.get("target_files") or [])
            # removed files invalidate the monoid (cannot subtract)
            if not (prev_src <= set(src_files) and prev_tgt <= set(tgt_files)):
                return None
            # in-place rewrites of a reused file invalidate it too
            if not stats_match(
                prior.get("file_stats"),
                lineage["file_stats"],
                prev_src | prev_tgt,
            ):
                return None
            with open(psrc, "rb") as fh:
                sp0 = pickle.load(fh)
            with open(ptgt, "rb") as fh:
                tp0 = pickle.load(fh)
            new_src = [f for f in src_files if f not in prev_src]
            new_tgt = [f for f in tgt_files if f not in prev_tgt]
            return (sp0, tp0), new_src, new_tgt

        # spec signature: a resumed run may only reuse profile pickles
        # produced under the IDENTICAL profile spec + filter — otherwise a
        # check added between runs (enum/pattern/str_len) would read
        # missing counters as 0/0 and silently PASS
        profile_sig = json.dumps(
            {"spec": lineage["profile_spec"], "filter": task.filter},
            sort_keys=True,
        )

        def run_profiles() -> tuple:
            columns = sorted(profile_cols | filter_cols) or None
            src_path = os.path.join(ckpt, "profile_source.pkl")
            tgt_path = os.path.join(ckpt, "profile_target.pkl")
            sig_path = os.path.join(ckpt, "profile_spec.sig")
            sig_ok = (
                os.path.exists(sig_path)
                and open(sig_path, encoding="utf-8").read() == profile_sig
            )
            if (
                cfg.resume
                and sig_ok
                and os.path.exists(src_path + ".done")
                and os.path.exists(tgt_path + ".done")
            ):
                with open(src_path, "rb") as fh:
                    sp = pickle.load(fh)
                with open(tgt_path, "rb") as fh:
                    tp = pickle.load(fh)
                return sp, tp
            inc = _incremental_prior()
            if inc is not None:
                from .stages.profile import merge_profiles

                (sp0, tp0), new_src, new_tgt = inc
                nsp, ntp = run_profile_pair_files(
                    new_src, new_tgt, spec, columns, filter_expr
                )
                sp = merge_profiles([sp0, nsp])
                tp = merge_profiles([tp0, ntp])
                lineage["incremental"] = {
                    "from_run_id": cfg.incremental_from,
                    "new_source_files": len(new_src),
                    "new_target_files": len(new_tgt),
                    "reused_source_files": len(src_files) - len(new_src),
                    "reused_target_files": len(tgt_files) - len(new_tgt),
                }
                _atomic_write(
                    lineage_path, json.dumps(lineage, indent=1).encode()
                )
            elif all_parquet:
                # fused raw-task path: one wave of read+profile chunks
                sp, tp = run_profile_pair_files(
                    src_files, tgt_files, spec, columns, filter_expr
                )
            else:
                # both sides in ONE streaming execution (union of streams)
                sp, tp = run_profile_pair(
                    read_table(
                        task.source_path, columns=columns, filter_sql=task.filter
                    ),
                    read_table(
                        task.target_path, columns=columns, filter_sql=task.filter
                    ),
                    spec,
                    batch_size=cfg.batch_size,
                    concurrency=cfg.profile_concurrency,
                )
            for path, prof in ((src_path, sp), (tgt_path, tp)):
                _atomic_write(path, pickle.dumps(prof))
                _atomic_write(path + ".done", b"")
            _atomic_write(sig_path, profile_sig.encode())
            return sp, tp

        if profile_wanted:
            if all_parquet:
                # hot keys come from footers, so nothing downstream blocks
                # on the profile — overlap it with the keyed shuffle
                futures["profile"] = pool.submit(run_profiles)
            else:
                src_profile, tgt_profile = run_profiles()


        # ---------- pass 2: keyed checks (one shuffle) ----------
        row_hash_enabled = task.pk_row_hash_check and bool(pk)
        compare_enabled = bool(task.compare_columns) and bool(pk)
        uniq_same_as_pk = uniqueness_enabled and (uniq_cols == pk)
        keyed_needed = (
            row_hash_enabled or compare_enabled or nulls_use_pk or uniq_same_as_pk
        )
        # Passes 2..N are independent of each other (only hot-key salting
        # consumes profile output, already computed) — run them as
        # concurrent driver threads so their Ray pipelines overlap and
        # keep the cluster busy instead of executing serially.
        jobs: dict[str, object] = {}

        persist_keyed = (
            cfg.persist_keyed_inputs or cfg.incremental_from is not None
        )
        keyed_reuse: dict[str, dict] = {}

        def _keyed_prior(sub: str, spec_obj) -> tuple | None:
            """Cross-run keyed-input reuse preconditions: the cited prior
            run completed this pass with persisted inputs, under the
            IDENTICAL spec signature (same checks, buckets, hot keys)
            and filter, and its file lists are a subset of the current
            ones (append-only). Returns ``(prior_dir, new_src, new_tgt)``
            or None → full scan."""
            from .stages.keyed import _spec_signature

            if cfg.incremental_from is None or not all_parquet:
                return None
            prior_ckpt = self._task_ckpt(task.task_key, cfg.incremental_from)
            prior_dir = os.path.join(prior_ckpt, sub)
            plineage_path = os.path.join(prior_ckpt, "lineage.json")
            sig_path = os.path.join(prior_dir, "spec.sig")
            if not (
                os.path.exists(plineage_path)
                and os.path.exists(sig_path)
                and os.path.exists(os.path.join(prior_dir, "_INPUTS_COMPLETE"))
            ):
                return None
            with open(plineage_path) as fh:
                prior = json.load(fh)
            if prior.get("filter") != task.filter:
                return None
            prev_src = set(prior.get("source_files") or [])
            prev_tgt = set(prior.get("target_files") or [])
            # removed files invalidate the union (cannot subtract rows)
            if not (prev_src <= set(src_files) and prev_tgt <= set(tgt_files)):
                return None
            # in-place rewrites of a reused file invalidate it too
            if not stats_match(
                prior.get("file_stats"),
                lineage["file_stats"],
                prev_src | prev_tgt,
            ):
                return None
            with open(sig_path, encoding="utf-8") as fh:
                if fh.read() != _spec_signature(spec_obj):
                    return None
            new_src = [f for f in src_files if f not in prev_src]
            new_tgt = [f for f in tgt_files if f not in prev_tgt]
            return prior_dir, new_src, new_tgt

        def keyed_job(spec_obj, cols_list, batch_mult=1, sub=None):
            """Pass runner: parquet inputs go through the fused
            read+project+split map tasks; other formats via Datasets."""
            s_files, t_files = src_files, tgt_files
            if all_parquet and sub is not None:
                pr = _keyed_prior(sub, spec_obj)
                if pr is not None:
                    prior_dir, s_files, t_files = pr
                    spec_obj.prior_input_dir = prior_dir
                    # stashed, not written: the profile thread may be
                    # serializing `lineage` right now — merged into it
                    # (single-threaded again) after the passes finish
                    keyed_reuse[sub] = {
                        "from_run_id": cfg.incremental_from,
                        "prior_input_dir": prior_dir,
                        "new_source_files": len(s_files),
                        "new_target_files": len(t_files),
                        "reused_source_files": len(src_files) - len(s_files),
                        "reused_target_files": len(tgt_files) - len(t_files),
                    }
            if all_parquet:
                return lambda: run_keyed_pass(
                    None,
                    None,
                    spec_obj,
                    task.task_key,
                    source_files=s_files,
                    target_files=t_files,
                    columns=sorted(set(cols_list) | filter_cols),
                    filter_expr=filter_expr,
                )
            return lambda: run_keyed_pass(
                read_table(task.source_path, columns=cols_list, filter_sql=task.filter),
                read_table(task.target_path, columns=cols_list, filter_sql=task.filter),
                spec_obj,
                task.task_key,
                batch_size=cfg.batch_size * batch_mult,
            )

        conv_needed = bool(
            task.ordering
            or want_turn_count_drift
            or task.sequence_grammar
            or task.conv_dedup
        )
        o = task.ordering
        gram = task.sequence_grammar
        cdd = task.conv_dedup
        # grammar fields for a KeyedSpec; roles cross the shuffle as codes
        grammar_kw: dict = {}
        if gram:
            grammar_kw = dict(
                grammar_role_column=gram.role_column,
                grammar_roles=gram.vocabulary,
                grammar_enforce_vocab=gram.allowed_roles is not None,
                grammar_first_role=gram.first_role,
                grammar_transitions=(
                    [tuple(t) for t in gram.allowed_transitions]
                    if gram.allowed_transitions is not None
                    else None
                ),
                grammar_tool_column=gram.tool_column,
                grammar_tool_roles=list(gram.tool_roles) if gram.tool_column else [],
            )
        conv_group = o.group_column if o else (cdd.group_column if cdd else "conv_id")
        conv_index = o.index_column if o else (cdd.index_column if cdd else "turn_idx")
        conv_dedup_kw: dict = {}
        if cdd:
            conv_dedup_kw = dict(
                conv_dedup_columns=list(cdd.content_columns),
                conv_dedup_sides=_SIDES[cdd.sides],
                conv_dedup_mode=cdd.mode,
                conv_dedup_num_perm=cdd.num_perm,
                conv_dedup_bands=cdd.bands,
                conv_dedup_normalize=cdd.normalize,
            )
        ordering_sides = (
            _SIDES[o.sides] if o else (0, 1)
        )
        # ts participates only in the ordering check's monotonicity rule:
        # a grammar-only or turn-count-only conv pass must not read (or
        # require the existence of) a timestamp column
        conv_ts = o.ts_column if o else None
        hot = {}
        if conv_needed:
            if all_parquet:
                # footer-statistics detection: no data scan, no profile
                # dependency on the keyed pass's critical path
                hot = detect_hot_keys_from_footers(
                    src_files, conv_group, hot_threshold
                )
                for k, v in detect_hot_keys_from_footers(
                    tgt_files, conv_group, hot_threshold
                ).items():
                    hot[k] = max(hot.get(k, 0), v)
            else:
                if src_profile and src_profile.heavy_hitters:
                    hot = src_profile.heavy_hitters.hot_keys(hot_threshold)
                if tgt_profile and tgt_profile.heavy_hitters:
                    hot.update(tgt_profile.heavy_hitters.hot_keys(hot_threshold))

        keyed_key_cols = pk if pk else uniq_cols
        # conversation checks ride the keyed shuffle when the group/index
        # columns are part of the key (bucket = hash(group, shard) keeps
        # both whole conversations AND identical composite keys bucket-
        # local — ONE partitioning key reused across all checks)
        conv_folded = (
            conv_needed
            and keyed_needed
            and conv_group in keyed_key_cols
            and conv_index in keyed_key_cols
        )

        if keyed_needed:
            kspec = KeyedSpec(
                key_columns=keyed_key_cols,
                row_hash=row_hash_enabled,
                hash_columns=task.hash_columns,
                null_join_columns=(
                    list(task.null_validation_columns) if nulls_use_pk else []
                ),
                compare_columns=list(task.compare_columns or []),
                uniqueness=uniq_same_as_pk,
                group_column=conv_group if conv_folded else None,
                index_column=conv_index if conv_folded else None,
                ts_column=conv_ts if conv_folded else None,
                require_contiguous=(
                    o.require_contiguous if (conv_folded and o) else False
                ),
                require_monotonic_ts=(
                    o.require_monotonic_ts if (conv_folded and o) else False
                ),
                ordering_sides=ordering_sides,
                turn_count_digest=conv_folded and want_turn_count_drift,
                ts_gap_digest=conv_folded and want_ts_gap_drift,
                hot_keys=hot if conv_folded else {},
                max_violations_per_bucket=task.max_violations_per_partition,
                num_buckets=num_buckets,
                checkpoint_dir=os.path.join(ckpt, "keyed"),
                resume=cfg.resume,
                persist_input=persist_keyed,
                **(grammar_kw if conv_folded else {}),
                **(conv_dedup_kw if conv_folded else {}),
            )
            need_cols = set(kspec.key_columns) | set(kspec.null_join_columns) | set(
                kspec.compare_columns
            )
            if row_hash_enabled:
                need_cols |= set(
                    task.hash_columns or [n for n in src_schema.names]
                )
            if conv_folded and conv_ts:
                need_cols.add(conv_ts)
            if conv_folded and gram:
                need_cols.add(gram.role_column)
                if gram.tool_column:
                    need_cols.add(gram.tool_column)
            if conv_folded and cdd:
                need_cols |= set(cdd.content_columns)
            cols = sorted(need_cols)
            jobs["keyed"] = keyed_job(kspec, cols, sub="keyed")

        # separate uniqueness shuffle only when its key differs from the PK
        if uniqueness_enabled and not uniq_same_as_pk:
            uspec = KeyedSpec(
                key_columns=uniq_cols,
                uniqueness=True,
                max_violations_per_bucket=task.max_violations_per_partition,
                num_buckets=num_buckets,
                checkpoint_dir=os.path.join(ckpt, "uniq"),
                resume=cfg.resume,
                persist_input=persist_keyed,
            )
            jobs["uniq"] = keyed_job(uspec, uniq_cols, sub="uniq")

        # standalone conversation pass only when it cannot ride the keyed
        # shuffle (no PK checks, or a different group column)
        if conv_needed and not conv_folded:
            cspec = KeyedSpec(
                key_columns=[conv_group, conv_index],
                group_column=conv_group,
                index_column=conv_index,
                ts_column=conv_ts,
                require_contiguous=o.require_contiguous if o else False,
                require_monotonic_ts=o.require_monotonic_ts if o else False,
                ordering_sides=ordering_sides,
                turn_count_digest=want_turn_count_drift,
                ts_gap_digest=want_ts_gap_drift,
                hot_keys=hot,
                max_violations_per_bucket=task.max_violations_per_partition,
                num_buckets=num_buckets,
                checkpoint_dir=os.path.join(ckpt, "conv"),
                resume=cfg.resume,
                persist_input=persist_keyed,
                **grammar_kw,
                **conv_dedup_kw,
            )
            ccols = [conv_group, conv_index] + ([conv_ts] if conv_ts else [])
            if gram:
                ccols.append(gram.role_column)
                if gram.tool_column:
                    ccols.append(gram.tool_column)
            if cdd:
                ccols.extend(cdd.content_columns)
            jobs["conv"] = keyed_job(cspec, list(dict.fromkeys(ccols)), batch_mult=2, sub="conv")


        for name, fn in jobs.items():
            futures[name] = pool.submit(fn)
        results: dict[str, object] = {}
        _timing = os.environ.get("DATAPACT_TIMING")
        _t0 = time.perf_counter()
        try:
            for name, fut in futures.items():
                results[name] = fut.result()
                if _timing:
                    print(
                        f"[timing] {task.task_key}:{name} done at "
                        f"{time.perf_counter() - _t0:.2f}s",
                        file=sys.stderr, flush=True,
                    )
        finally:
            pool.shutdown(wait=False)
        if keyed_reuse:
            # all pass threads are done — safe to serialize lineage again
            lineage["incremental_keyed"] = keyed_reuse
            _atomic_write(lineage_path, json.dumps(lineage, indent=1).encode())
        if "profile" in results:
            src_profile, tgt_profile = results["profile"]

        keyed_metrics = results.get("keyed")
        uniq_metrics = keyed_metrics if uniq_same_as_pk else results.get("uniq")
        conv_metrics = keyed_metrics if conv_folded else results.get("conv")

        # ---------- verdict assembly (reference payload order) ----------
        if task.count_tolerance is not None:
            verdict_list.append(
                V.count_verdict(
                    src_profile.count, tgt_profile.count, task.count_tolerance
                )
            )
        if row_hash_enabled:
            verdict_list.append(
                V.row_hash_verdict(
                    keyed_metrics.total_compared_rows,
                    keyed_metrics.mismatch_count,
                    task.pk_hash_tolerance,
                )
            )
        if nulls_enabled:
            for col in task.null_validation_columns:
                if nulls_use_pk:
                    s_n, t_n = keyed_metrics.null_join.get(col, [0, 0])
                else:
                    s_n = src_profile.nulls.get(col, 0)
                    t_n = tgt_profile.nulls.get(col, 0)
                verdict_list.append(
                    V.null_verdict(
                        col, s_n, t_n, task.null_validation_tolerance, bool(pk)
                    )
                )
        for av in task.agg_validations or []:
            for d in av.validations:
                verdict_list.append(
                    V.agg_verdict(
                        av.column,
                        d.agg,
                        src_profile.agg_value(av.column, d.agg),
                        tgt_profile.agg_value(av.column, d.agg),
                        d.tolerance,
                    )
                )
        # getattr: profile pickles from pre-rule code must not crash a
        # resumed run (the lineage spec signature guards incremental merges)
        for kind, rules in (
            ("enum", task.enum_validations or []),
            ("pattern", task.pattern_validations or []),
        ):
            for rule in rules:
                key = f"{kind}:{rule.column}"
                verdict_list.append(
                    V.value_rule_verdict(
                        kind,
                        rule.column,
                        getattr(src_profile, "rule_checked", {}).get(key, 0),
                        getattr(src_profile, "rule_violations", {}).get(key, 0),
                        getattr(tgt_profile, "rule_checked", {}).get(key, 0),
                        getattr(tgt_profile, "rule_violations", {}).get(key, 0),
                        rule.tolerance,
                        getattr(src_profile, "rule_samples", {}).get(key),
                        getattr(tgt_profile, "rule_samples", {}).get(key),
                    )
                )
        if task.freshness:
            fcol = task.freshness.ts_column
            verdict_list.append(
                V.freshness_verdict(
                    fcol,
                    src_profile.agg_value(fcol, "MAX"),
                    tgt_profile.agg_value(fcol, "MAX"),
                    task.freshness.max_lag_seconds,
                )
            )
        for sc in task.segment_counts or []:
            sc_src = getattr(src_profile, "segment_counts", {}).get(sc.column, {})
            sc_tgt = getattr(tgt_profile, "segment_counts", {}).get(sc.column, {})
            _guard_categories(
                "segment_counts", sc.column, sc.max_segments, sc_src, sc_tgt
            )
            verdict_list.append(
                V.segment_count_verdict(sc.column, sc_src, sc_tgt, sc.tolerance)
            )
            self._write_segment_violations(
                task, sc.column,
                V.segment_count_failures(sc_src, sc_tgt, sc.tolerance)[0],
            )
        for rule in task.conditional_validations or []:
            key = f"cond:{rule.name}"
            verdict_list.append(
                V.conditional_rule_verdict(
                    rule.name,
                    rule.when,
                    rule.then,
                    getattr(src_profile, "rule_checked", {}).get(key, 0),
                    getattr(src_profile, "rule_violations", {}).get(key, 0),
                    getattr(tgt_profile, "rule_checked", {}).get(key, 0),
                    getattr(tgt_profile, "rule_violations", {}).get(key, 0),
                    rule.tolerance,
                    getattr(src_profile, "rule_samples", {}).get(key),
                    getattr(tgt_profile, "rule_samples", {}).get(key),
                )
            )
        if uniqueness_enabled:
            verdict_list.append(
                V.uniqueness_verdict(
                    uniq_cols,
                    uniq_metrics.uniq_count[0],
                    uniq_metrics.uniq_distinct[0],
                    uniq_metrics.uniq_count[1],
                    uniq_metrics.uniq_distinct[1],
                    task.uniqueness_tolerance,
                )
            )
        for ci, custom in enumerate(task.custom_checks or []):
            cm = results[f"custom:{ci}"]
            verdict_list.append(
                V.custom_check_verdict(
                    custom.slug,
                    custom.name,
                    custom.description,
                    custom.sql,
                    cm.rendered_source_sql,
                    cm.rendered_target_sql,
                    cm.source_row_count,
                    cm.target_row_count,
                    cm.rows_missing_in_target,
                    cm.rows_missing_in_source,
                    cm.sample_missing_in_target,
                    cm.sample_missing_in_source,
                    cm.source_hash,
                    cm.target_hash,
                    cm.source_locus,
                    cm.target_locus,
                    cm.source_files_reused,
                    cm.target_files_reused,
                )
            )
        if compare_enabled:
            for col in task.compare_columns:
                verdict_list.append(
                    V.compare_columns_verdict(
                        [col],
                        keyed_metrics.total_compared_rows,
                        keyed_metrics.compare_mismatches.get(col, 0),
                        task.compare_tolerance,
                    )
                )
        if task.ordering:
            o_sides = _SIDES[task.ordering.sides]
            verdict_list.append(
                V.ordering_verdict(
                    task.ordering.group_column,
                    sum(conv_metrics.groups_checked[i] for i in o_sides),
                    sum(conv_metrics.contiguity_violations[i] for i in o_sides),
                    sum(conv_metrics.monotonicity_violations[i] for i in o_sides),
                )
            )
        if task.sequence_grammar:
            verdict_list.append(
                V.sequence_grammar_verdict(
                    conv_group,
                    gram.role_column,
                    sum(conv_metrics.groups_checked),
                    sum(conv_metrics.grammar_groups_flagged),
                    sum(conv_metrics.grammar_unknown_rows),
                    sum(conv_metrics.grammar_tool_mismatch_rows),
                    sum(conv_metrics.grammar_bad_transition_groups),
                    sum(conv_metrics.grammar_bad_first_groups),
                    gram.tolerance,
                )
            )
        if task.conv_dedup:
            cd_sides = _SIDES[task.conv_dedup.sides]
            if task.conv_dedup.mode == "near":
                # near mode counts FLAGGED conversations (>=1 shared LSH
                # band); the denominator is all conversations checked
                totals = list(conv_metrics.groups_checked)
            else:
                totals = [
                    conv_metrics.conv_distinct[i] + conv_metrics.conv_dup_convs[i]
                    for i in (0, 1)
                ]
            verdict_list.append(
                V.conv_dedup_verdict(
                    conv_group,
                    task.conv_dedup.content_columns,
                    totals[0],
                    conv_metrics.conv_dup_convs[0],
                    totals[1],
                    conv_metrics.conv_dup_convs[1],
                    task.conv_dedup.tolerance,
                    cd_sides,
                    mode=task.conv_dedup.mode,
                    num_perm=task.conv_dedup.num_perm,
                    bands=task.conv_dedup.bands,
                    normalize=task.conv_dedup.normalize,
                    # re-keyed census needs both sides' fingerprints in
                    # the exchange and exact-mode grouping
                    src_rekeyed=(
                        conv_metrics.conv_rekeyed[0]
                        if task.conv_dedup.mode == "exact"
                        and cd_sides == (0, 1)
                        else None
                    ),
                    tgt_rekeyed=(
                        conv_metrics.conv_rekeyed[1]
                        if task.conv_dedup.mode == "exact"
                        and cd_sides == (0, 1)
                        else None
                    ),
                )
            )
        for ri, ref in enumerate(task.referential or []):
            sides = ["source", "target"] if ref.side == "both" else [ref.side]
            for side in sides:
                rm = results[f"ref:{ri}:{side}"]
                verdict_list.append(
                    V.referential_verdict(
                        ref.columns, side, rm.probed_rows, rm.orphan_rows, ref.tolerance
                    )
                )
                if rm.violations:
                    self._write_referential_violations(task.task_key, ref, side, rm)
        for d in drift_checks:
            if d.derived == "categorical":
                # value-frequency drift from the bounded value-counts
                # monoid; tvd handles one-sided-empty as 1.0 internally
                cd_src = getattr(src_profile, "segment_counts", {}).get(
                    d.column, {}
                )
                cd_tgt = getattr(tgt_profile, "segment_counts", {}).get(
                    d.column, {}
                )
                _guard_categories(
                    "drift derived=categorical",
                    d.column,
                    d.max_categories,
                    cd_src,
                    cd_tgt,
                )
                stat = tvd_statistic(cd_src, cd_tgt)
                verdict_list.append(
                    V.drift_verdict(
                        d.column, d.metric, stat, d.threshold, d.derived
                    )
                )
                continue
            if d.derived == "turn_count":
                s_dig, t_dig = conv_metrics.digests
            elif d.derived == "ts_gap":
                # getattr: metrics.pkl checkpoints predating the field
                s_dig, t_dig = getattr(
                    conv_metrics, "gap_digests", [None, None]
                )
            elif d.derived == "str_len":
                s_dig = src_profile.digests.get(f"len:{d.column}")
                t_dig = tgt_profile.digests.get(f"len:{d.column}")
            else:
                s_dig = src_profile.digests.get(d.column)
                t_dig = tgt_profile.digests.get(d.column)
            if s_dig is None and t_dig is None:
                stat = 0.0  # neither side produced the distribution
            elif s_dig is None or t_dig is None:
                # a digest exists iff its pass saw qualifying values:
                # ONE side having none (every target conversation
                # collapsed to a single turn → no gaps; a column gone
                # all-NULL → no values) is MAXIMAL drift, not a silent
                # PASS — that disappearance is exactly what the check
                # watches. KS is bounded by 1, so 1.0 fails any sane
                # threshold on either metric.
                stat = 1.0
            elif d.metric == "ks":
                stat = ks_statistic(s_dig, t_dig)
            else:
                stat = psi_statistic(s_dig, t_dig, bins=d.bins)
            verdict_list.append(
                V.drift_verdict(d.column, d.metric, stat, d.threshold, d.derived)
            )
        if temporal_checks and cfg.temporal_baseline_run is not None:
            # temporal drift: this run's SOURCE digests vs the baseline
            # run's checkpointed source profile. A baseline that is SET
            # but unusable fails LOUDLY — a silently-skipped nightly
            # drift check is exactly the false confidence this feature
            # exists to remove. (baseline_run=None is the BOOTSTRAP run:
            # the columns are still sketched into this run's profile so
            # the next run can cite it — no verdict is emitted.)
            base_run = cfg.temporal_baseline_run
            bpath = os.path.join(
                self._task_ckpt(task.task_key, base_run), "profile_source.pkl"
            )
            if not os.path.exists(bpath + ".done"):
                raise ValueError(
                    f"temporal_drift baseline run {base_run}: no "
                    f"checkpointed source profile at {bpath}"
                )
            with open(bpath, "rb") as fh:
                baseline_profile = pickle.load(fh)
            for d in temporal_checks:
                if d.derived == "categorical":
                    # value-frequency shift vs the baseline run's
                    # checkpointed source counts (the monoid is stored
                    # whole in the profile pickle, so this costs no
                    # extra scan in either run)
                    prev_counts = getattr(
                        baseline_profile, "segment_counts", {}
                    ).get(d.column)
                    if prev_counts is None:
                        raise ValueError(
                            f"temporal_drift: run {base_run} has no "
                            f"'{d.column}' value counts — the baseline "
                            "run must have configured the same "
                            "categorical drift column"
                        )
                    cur_counts = getattr(src_profile, "segment_counts", {}).get(
                        d.column, {}
                    )
                    _guard_categories(
                        "temporal_drift derived=categorical",
                        d.column,
                        d.max_categories,
                        prev_counts,
                        cur_counts,
                    )
                    stat = tvd_statistic(prev_counts, cur_counts)
                    verdict_list.append(
                        V.temporal_drift_verdict(
                            d.column, d.metric, stat, d.threshold, d.derived,
                            base_run,
                        )
                    )
                    continue
                key = d.column if d.derived == "value" else f"len:{d.column}"
                cur = src_profile.digests.get(key)
                prev = getattr(baseline_profile, "digests", {}).get(key)
                if prev is None:
                    # genuinely a config error: the BASELINE run never
                    # sketched this column
                    raise ValueError(
                        f"temporal_drift: run {base_run} has no '{key}' "
                        "digest — the baseline run must have configured "
                        "the same drift column"
                    )
                if cur is None:
                    # the CURRENT run's source produced no digest (e.g.
                    # the column went all-NULL since the baseline): that
                    # disappearance is maximal drift — FAIL with
                    # statistic 1.0, same semantics as regular drift's
                    # one-sided-missing case above, not a task error
                    # misattributed to the baseline run
                    stat = 1.0
                else:
                    stat = (
                        ks_statistic(prev, cur)
                        if d.metric == "ks"
                        else psi_statistic(prev, cur, bins=d.bins)
                    )
                verdict_list.append(
                    V.temporal_drift_verdict(
                        d.column, d.metric, stat, d.threshold, d.derived,
                        base_run,
                    )
                )

        payload, passed = V.assemble_payload(
            task.task_key, task.filter, task.primary_keys, verdict_list
        )
        result = V.TaskResult(
            task_key=task.task_key,
            status="SUCCESS" if passed else "FAILURE",
            payload=payload,
            passed=passed,
            verdicts=verdict_list,
        )
        result.begin_ts = begin  # type: ignore[attr-defined]
        result.complete_ts = _now()  # type: ignore[attr-defined]
        self._consolidate_keyed_violations(task.task_key, ckpt)
        return result

    def _consolidate_keyed_violations(self, task_key: str, ckpt: str) -> None:
        """Surface the keyed/uniq/conv passes' per-bucket violation rows
        (capped at max_violations_per_partition per bucket — bounded by
        construction) into the user-facing violations tree, one parquet
        per pass, alongside the referential files. The per-bucket files
        under checkpoint/ remain the resumable source of truth; this is
        the consolidated read surface a user or BI layer queries."""
        import glob

        vdir = os.path.join(
            self.config.results_dir,
            "violations",
            f"run_id={self.config.run_id}",
            f"task={task_key}",
        )
        for pass_name in ("keyed", "uniq", "conv"):
            pat = os.path.join(ckpt, pass_name, "*", "violations.parquet")
            frames = []
            for f in sorted(glob.glob(pat)):
                t = pq.read_table(f)
                if t.num_rows:
                    frames.append(t.to_pandas())
            out_path = os.path.join(vdir, f"{pass_name}.parquet")
            if not frames:
                # a CLEAN recompute must retract a previous same-run_id
                # attempt's file — a stale violations parquet next to a
                # SUCCESS results row misreports the run
                if os.path.exists(out_path):
                    os.remove(out_path)
                continue
            df = pd.concat(frames, ignore_index=True).sort_values(
                ["check_alias", "side", "key"], kind="stable"
            )
            os.makedirs(vdir, exist_ok=True)
            pq.write_table(
                pa.Table.from_pandas(df, preserve_index=False), out_path
            )

    def _write_segment_violations(self, task, column, failed) -> None:
        """One violation row per failing segment (worst first, capped at
        max_violations_per_partition) into the user-facing violations
        tree — like the hot/convdup files, this run's output: a clean
        rerun retracts a previous attempt's file."""
        vdir = os.path.join(
            self.config.results_dir,
            "violations",
            f"run_id={self.config.run_id}",
            f"task={task.task_key}",
        )
        out_path = os.path.join(vdir, f"segment_{column}.parquet")
        if not failed:
            if os.path.exists(out_path):
                os.remove(out_path)
            return
        cap = task.max_violations_per_partition
        df = pd.DataFrame(
            [
                {
                    "task_key": task.task_key,
                    "check_alias": f"segment_count_validation_{column}",
                    "key": json.dumps({column: name}),
                    "side": "both",
                    "detail": json.dumps(
                        {"source_rows": s, "target_rows": t, "rel_diff": rel}
                    ),
                }
                for rel, name, s, t in failed[:cap]
            ]
        )
        os.makedirs(vdir, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), out_path)

    def _write_referential_violations(self, task_key, ref, side, rm) -> None:
        vdir = os.path.join(
            self.config.results_dir,
            "violations",
            f"run_id={self.config.run_id}",
            f"task={task_key}",
        )
        os.makedirs(vdir, exist_ok=True)
        df = pd.DataFrame(rm.violations)
        df.insert(0, "task_key", task_key)
        df.insert(
            1,
            "check_alias",
            "referential_validation_%s_%s" % (side, "_".join(ref.columns)),
        )
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            os.path.join(vdir, f"referential_{side}_{'_'.join(ref.columns)}.parquet"),
        )

    # ---- whole-suite execution ----

    def run(self) -> RunSummary:
        cfg = self.config
        summary = RunSummary(
            run_id=cfg.run_id, job_name=cfg.job_name, job_start_ts=_now()
        )
        tasks = self.suite.validations
        if cfg.max_parallel_tasks > 1 and not cfg.fail_fast and len(tasks) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(len(tasks), cfg.max_parallel_tasks)
            ) as pool:
                futures = [pool.submit(self.run_task, t) for t in tasks]
                results = [f.result() for f in futures]  # suite order kept
            for task, result in zip(tasks, results):
                summary.results.append(result)
                summary.rows.append(self._result_row(task, result, summary))
        else:
            for task in tasks:
                result = self.run_task(task)
                summary.results.append(result)
                summary.rows.append(self._result_row(task, result, summary))
                if cfg.fail_fast and not result.passed:
                    break
        self._write_results(summary)
        return summary

    def _result_row(self, task: ValidationTask, result: V.TaskResult, summary) -> dict:
        return {
            "task_key": task.task_key,
            "status": result.status,
            "run_id": self.config.run_id,
            "job_name": self.config.job_name,
            "job_start_ts": summary.job_start_ts,
            "validation_begin_ts": result.begin_ts,
            "validation_complete_ts": result.complete_ts,
            "source_table": task.source_path,
            "target_table": task.target_path,
            "business_domain": task.business_domain,
            "business_owner": task.business_owner,
            "business_priority": task.business_priority,
            "expected_sla_hours": task.expected_sla_hours,
            "estimated_impact_usd": task.estimated_impact_usd,
            "result_payload": json.dumps(result.payload),
        }

    def _write_results(self, summary: RunSummary) -> None:
        rdir = os.path.join(
            self.config.results_dir, "results", f"run_id={self.config.run_id}"
        )
        os.makedirs(rdir, exist_ok=True)
        table = pa.Table.from_pylist(summary.rows, schema=RESULT_SCHEMA)
        pq.write_table(table, os.path.join(rdir, "results.parquet"))
        if summary.rows:
            from .genie import genie_current_status, genie_issues, genie_table_quality
            from .rollup import write_exec_tables

            df = table.to_pandas()
            write_exec_tables(df, self.config.results_dir, self.config.run_id)
            gdir = os.path.join(
                self.config.results_dir, "genie", f"run_id={self.config.run_id}"
            )
            os.makedirs(gdir, exist_ok=True)
            for name, frame in (
                ("genie_current_status", genie_current_status(df)),
                ("genie_table_quality", genie_table_quality(df)),
                ("genie_issues", genie_issues(df)),
            ):
                pq.write_table(
                    pa.Table.from_pandas(frame, preserve_index=False),
                    os.path.join(gdir, f"{name}.parquet"),
                )
            # cross-run trend history (reference dashboards' 30/60-run
            # datasets, client.py:1586-1760) — recomputed over ALL runs
            # in results_dir so nightly suites accumulate trends
            from .rollup import write_trend_tables

            write_trend_tables(self.config.results_dir, self.config.job_name)
            # dashboard-as-code data layer (reference ds_* datasets,
            # client.py:780-1810) — parquet + manifest, idempotent
            from .dashboard import write_dashboard

            frames = write_dashboard(self.config.results_dir, self.config.job_name)
            # static run report (dashboard analog): report.md + report.html
            # — reuses the failure-analysis frames the dashboard hook
            # just computed instead of rebuilding them from history
            from .report import write_report

            write_report(
                self.config.results_dir,
                self.config.run_id,
                dashboard_frames=frames,
            )


def run_suite(
    suite: ValidationSuite, config: RunConfig
) -> RunSummary:
    return ValidationRunner(suite, config).run()
