"""Cross-run incremental reuse for the KEYED/CONV passes: run N+1 over
an append-only input scans ONLY the files added since run N and unions
each bucket's new rows with run N's persisted projected inputs —
verdicts must be IDENTICAL to a full run over all files, including
violations that only exist ACROSS the old/new file boundary (a new row
colliding with an old primary key; a new conversation duplicating an
old one). Fallback paths (changed filter, missing prior inputs) must
silently run full and stay correct; lineage must record the reuse."""

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from datapact_ray.config import ConvDedupCheck, OrderingCheck, ValidationSuite, ValidationTask
from datapact_ray.runner import RunConfig, run_suite

TURNS = 6


def _conv_frame(conv_ids, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for cid in conv_ids:
        for t in range(TURNS):
            rows.append(
                {
                    "conv_id": cid,
                    "turn_idx": t,
                    "role": "user" if t % 2 == 0 else "assistant",
                    "text": f"{cid}-turn{t}-{rng.integers(0, 10 ** 6)}",
                    "ts": np.datetime64("2026-01-01") + np.timedelta64(t, "m"),
                }
            )
    return pd.DataFrame(rows)


def _write(df, path):
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)


def _task(src, tgt):
    return ValidationTask(
        task_key="t",
        source_path=src,
        target_path=tgt,
        primary_keys=["conv_id", "turn_idx"],
        count_tolerance=0.0,
        pk_row_hash_check=True,
        pk_hash_tolerance=0.0,
        uniqueness_columns=["conv_id", "turn_idx"],
        uniqueness_tolerance=0.0,
        ordering=OrderingCheck(require_contiguous=True),
        conv_dedup=ConvDedupCheck(mode="exact", tolerance=0.0),
    )


def _keyed_payload(summary):
    """The keyed-check payload entries (everything timing-independent)."""
    p = summary.results[0].payload
    return {
        k: p[k]
        for k in p
        if k.startswith(
            ("row_hash", "uniqueness", "ordering", "conv_dedup", "count_")
        )
    }


def _build_base(tmp_path):
    src = tmp_path / "src"
    tgt = tmp_path / "tgt"
    src.mkdir()
    tgt.mkdir()
    base = _conv_frame([f"c{i:04d}" for i in range(120)], seed=1)
    _write(base, str(src / "part-000.parquet"))
    tgt_base = base.copy()
    # one old-file row-hash mismatch, present in every run
    tgt_base.loc[10, "text"] = "corrupted-old"
    _write(tgt_base, str(tgt / "part-000.parquet"))
    return src, tgt, base


def _append_new(src, tgt, base):
    """part-001: new conversations plus violations that span the
    old/new file boundary."""
    new = _conv_frame([f"c{i:04d}" for i in range(120, 150)], seed=2)
    # cross-file PK collision: new row re-uses an OLD key (both sides so
    # counts still match)
    dup_pk = base[(base.conv_id == "c0005") & (base.turn_idx == 2)].copy()
    # cross-file conversation duplicate: c0210 repeats OLD c0007's
    # content turn-for-turn (same role/text sequence, new conv_id)
    dup_conv = base[base.conv_id == "c0007"].copy()
    dup_conv["conv_id"] = "c0210"
    new = pd.concat([new, dup_pk, dup_conv], ignore_index=True)
    _write(new, str(src / "part-001.parquet"))
    tgt_new = new.copy()
    tgt_new.loc[5, "text"] = "corrupted-new"  # new-file mismatch
    _write(tgt_new, str(tgt / "part-001.parquet"))


def test_incremental_keyed_matches_full(tmp_path):
    src, tgt, base = _build_base(tmp_path)
    suite = ValidationSuite(validations=[_task(str(src), str(tgt))])
    rdir = str(tmp_path / "out")

    s1 = run_suite(
        suite, RunConfig(results_dir=rdir, run_id=1, persist_keyed_inputs=True)
    )
    assert s1.results[0].status == "FAILURE"  # the old corruption
    keyed_dir = os.path.join(rdir, "checkpoint", "run_id=1", "task=t", "keyed")
    assert os.path.exists(os.path.join(keyed_dir, "_INPUTS_COMPLETE"))
    inputs = [
        os.path.join(keyed_dir, d, "input.parquet")
        for d in os.listdir(keyed_dir)
        if d.startswith("bucket=")
    ]
    assert inputs and all(os.path.exists(p) for p in inputs)
    # the persisted inputs are the PROJECTED exchange payload: key
    # columns + fixed-width helpers, never the raw text column
    sample = pq.read_table(inputs[0])
    assert "text" not in sample.column_names
    assert {"conv_id", "turn_idx", "__kh", "__side"} <= set(sample.column_names)

    _append_new(src, tgt, base)

    s2 = run_suite(
        suite, RunConfig(results_dir=rdir, run_id=2, incremental_from=1)
    )
    lineage = json.load(
        open(os.path.join(rdir, "checkpoint", "run_id=2", "task=t", "lineage.json"))
    )
    rk = lineage["incremental_keyed"]["keyed"]
    assert rk["from_run_id"] == 1
    assert rk["new_source_files"] == 1 and rk["reused_source_files"] == 1
    assert rk["new_target_files"] == 1 and rk["reused_target_files"] == 1

    # full run over the same (grown) inputs in a fresh results dir
    s_full = run_suite(
        ValidationSuite(validations=[_task(str(src), str(tgt))]),
        RunConfig(results_dir=str(tmp_path / "out_full"), run_id=1),
    )
    assert _keyed_payload(s2) == _keyed_payload(s_full)

    p = s2.results[0].payload
    # cross-file violations were caught: the duplicated old PK (2
    # occurrences of (c0005, 2) per side) ...
    assert p["uniqueness_validation_conv_id_turn_idx"]["status"] == "FAIL"
    # ... and the old/new conversation duplicate pair on each side
    assert p["conv_dedup_validation_conv_id"]["status"] == "FAIL"
    # both row-hash mismatches (one in the old file, one in the new)
    assert p["row_hash_validation"]["mismatch_count"] == "2"
    # run 2 also persisted its (union) inputs → run 3 can chain
    assert os.path.exists(
        os.path.join(
            rdir, "checkpoint", "run_id=2", "task=t", "keyed", "_INPUTS_COMPLETE"
        )
    )


def test_incremental_keyed_chains_and_resumes(tmp_path):
    """Run 3 reuses run 2's (union) inputs — nightly chaining — and an
    interrupted incremental run resumed with the same run_id reproduces
    identical verdicts (done buckets skip BOTH their new-file rows and
    their prior-input shard; their checkpointed metrics already cover
    the union)."""
    src, tgt, base = _build_base(tmp_path)
    suite = ValidationSuite(validations=[_task(str(src), str(tgt))])
    rdir = str(tmp_path / "out")
    run_suite(suite, RunConfig(results_dir=rdir, run_id=1, persist_keyed_inputs=True))
    _append_new(src, tgt, base)
    run_suite(suite, RunConfig(results_dir=rdir, run_id=2, incremental_from=1))

    # third nightly batch: plain new conversations
    extra = _conv_frame([f"c{i:04d}" for i in range(150, 170)], seed=3)
    _write(extra, str(src / "part-002.parquet"))
    _write(extra, str(tgt / "part-002.parquet"))
    s3 = run_suite(
        suite, RunConfig(results_dir=rdir, run_id=3, incremental_from=2)
    )
    lineage = json.load(
        open(os.path.join(rdir, "checkpoint", "run_id=3", "task=t", "lineage.json"))
    )
    rk = lineage["incremental_keyed"]["keyed"]
    assert rk["from_run_id"] == 2
    assert rk["new_source_files"] == 1 and rk["reused_source_files"] == 2

    # interrupted + resumed incremental run: knock out one bucket's
    # _SUCCESS and re-run the same run_id with resume
    keyed_dir = os.path.join(rdir, "checkpoint", "run_id=3", "task=t", "keyed")
    buckets = sorted(d for d in os.listdir(keyed_dir) if d.startswith("bucket="))
    os.remove(os.path.join(keyed_dir, buckets[0], "_SUCCESS"))
    s3b = run_suite(
        suite,
        RunConfig(results_dir=rdir, run_id=3, incremental_from=2, resume=True),
    )
    assert _keyed_payload(s3b) == _keyed_payload(s3)

    # and all of it equals a from-scratch full run
    s_full = run_suite(
        ValidationSuite(validations=[_task(str(src), str(tgt))]),
        RunConfig(results_dir=str(tmp_path / "out_full"), run_id=1),
    )
    assert _keyed_payload(s3) == _keyed_payload(s_full)


def test_incremental_custom_sql_reuses_partials(tmp_path):
    """Sharded custom-SQL partials are fragmentation-independent
    monoids: run 2 re-scans only the new file, unions its partials with
    run 1's cached table, and the verdict equals a full run — with the
    reuse surfaced in the payload."""
    src, tgt, base = _build_base(tmp_path)
    from datapact_ray.config import CustomCheck

    def task():
        t = _task(str(src), str(tgt))
        t.custom_checks = [
            CustomCheck(
                name="turns per role",
                sql=(
                    "SELECT role, ROUND(AVG(turn_idx), 4) AS a, COUNT(*) AS n "
                    "FROM {{ table_fqn }} GROUP BY role"
                ),
            )
        ]
        return t

    rdir = str(tmp_path / "out")
    run_suite(
        ValidationSuite(validations=[task()]),
        RunConfig(results_dir=rdir, run_id=1, persist_keyed_inputs=True),
    )
    cache = os.path.join(rdir, "checkpoint", "run_id=1", "task=t", "custom")
    assert any(f.endswith(".parquet") for f in os.listdir(cache))

    _append_new(src, tgt, base)
    s2 = run_suite(
        ValidationSuite(validations=[task()]),
        RunConfig(results_dir=rdir, run_id=2, incremental_from=1),
    )
    v2 = next(
        v
        for v in s2.results[0].verdicts
        if v.alias == "custom_sql_validation_turns_per_role"
    )
    assert v2.payload["execution_locus"] == {
        "source": "sharded",
        "target": "sharded",
    }
    assert v2.payload["partials_reused"] == {
        "source_files": "1",
        "target_files": "1",
    }
    s_full = run_suite(
        ValidationSuite(validations=[task()]),
        RunConfig(results_dir=str(tmp_path / "out_full"), run_id=1),
    )
    vf = next(
        v
        for v in s_full.results[0].verdicts
        if v.alias == "custom_sql_validation_turns_per_role"
    )
    for k in (
        "source_row_count",
        "target_row_count",
        "rows_missing_in_target",
        "rows_missing_in_source",
        "status",
    ):
        assert v2.payload[k] == vf.payload[k], k
    # the corruption touches only text values, so per-role turn counts
    # and averages match across sides → PASS (on both execution paths)
    assert v2.payload["status"] == "PASS"


def test_incremental_referential_adds_new_file_counts(tmp_path):
    """Probed/orphan counts are additive over probe files: run 2 probes
    only the new fact file against the unchanged dim and adds run 1's
    recorded counts — orphans introduced by the NEW file are found, and
    totals equal a full run."""
    src, tgt, base = _build_base(tmp_path)
    from datapact_ray.config import ReferentialCheck

    dim_dir = tmp_path / "dim"
    dim_dir.mkdir()
    # dim covers every conversation EXCEPT c0210 (arrives in part-001)
    known = sorted(set(base.conv_id)) + [f"c{i:04d}" for i in range(120, 150)]
    _write(pd.DataFrame({"conv_id": known}), str(dim_dir / "dim.parquet"))

    def task():
        t = _task(str(src), str(tgt))
        t.referential = [
            ReferentialCheck(
                columns=["conv_id"], ref_path=str(dim_dir), side="source"
            )
        ]
        return t

    rdir = str(tmp_path / "out")
    run_suite(
        ValidationSuite(validations=[task()]),
        RunConfig(results_dir=rdir, run_id=1, persist_keyed_inputs=True),
    )
    rec = json.load(
        open(
            os.path.join(
                rdir, "checkpoint", "run_id=1", "task=t", "referential",
                "ref_0_source.json",
            )
        )
    )
    assert rec["orphan_rows"] == 0 and rec["probed_rows"] == len(base)

    _append_new(src, tgt, base)
    s2 = run_suite(
        ValidationSuite(validations=[task()]),
        RunConfig(results_dir=rdir, run_id=2, incremental_from=1),
    )
    s_full = run_suite(
        ValidationSuite(validations=[task()]),
        RunConfig(results_dir=str(tmp_path / "out_full"), run_id=1),
    )

    def ref_payload(s):
        p = s.results[0].payload
        return {
            k: v for k, v in p.items() if k.startswith("referential_validation")
        }

    p2, pf = ref_payload(s2), ref_payload(s_full)
    assert p2 == pf
    # the new file's duplicated conversation c0210 is NOT in the dim →
    # its TURNS rows are orphans, caught without re-probing old files
    v = next(iter(p2.values()))
    assert v["status"] == "FAIL" and v["orphan_rows"] == str(TURNS)


def test_incremental_keyed_falls_back_when_filter_changes(tmp_path):
    src, tgt, base = _build_base(tmp_path)
    rdir = str(tmp_path / "out")
    suite = ValidationSuite(validations=[_task(str(src), str(tgt))])
    run_suite(suite, RunConfig(results_dir=rdir, run_id=1, persist_keyed_inputs=True))
    _append_new(src, tgt, base)

    # a different filter invalidates the prior inputs → silent full run
    t2 = _task(str(src), str(tgt))
    t2.filter = "turn_idx >= 0"
    s2 = run_suite(
        ValidationSuite(validations=[t2]),
        RunConfig(results_dir=rdir, run_id=2, incremental_from=1),
    )
    lineage = json.load(
        open(os.path.join(rdir, "checkpoint", "run_id=2", "task=t", "lineage.json"))
    )
    assert "incremental_keyed" not in lineage
    # still correct: the full scan sees every violation
    p = s2.results[0].payload
    assert p["row_hash_validation"]["mismatch_count"] == "2"
    assert p["uniqueness_validation_conv_id_turn_idx"]["status"] == "FAIL"


def test_incremental_keyed_falls_back_when_file_removed(tmp_path):
    src, tgt, base = _build_base(tmp_path)
    rdir = str(tmp_path / "out")
    suite = ValidationSuite(validations=[_task(str(src), str(tgt))])
    run_suite(suite, RunConfig(results_dir=rdir, run_id=1, persist_keyed_inputs=True))
    _append_new(src, tgt, base)
    # replace (remove+add) the base file → prev ⊄ current → full scan
    shutil.move(str(src / "part-000.parquet"), str(src / "part-002.parquet"))
    shutil.move(str(tgt / "part-000.parquet"), str(tgt / "part-002.parquet"))
    s2 = run_suite(
        suite, RunConfig(results_dir=rdir, run_id=2, incremental_from=1)
    )
    lineage = json.load(
        open(os.path.join(rdir, "checkpoint", "run_id=2", "task=t", "lineage.json"))
    )
    assert "incremental_keyed" not in lineage
    assert s2.results[0].payload["row_hash_validation"]["mismatch_count"] == "2"


def test_incremental_refuses_inplace_rewrite(tmp_path):
    """The reuse channels validate file CONTENT fingerprints, not just
    path membership: rewriting a covered file in place (compaction,
    corrected re-export) must silently fall back to a full scan."""
    src, tgt, base = _build_base(tmp_path)
    rdir = str(tmp_path / "out")
    suite = ValidationSuite(validations=[_task(str(src), str(tgt))])
    run_suite(suite, RunConfig(results_dir=rdir, run_id=1, persist_keyed_inputs=True))
    _append_new(src, tgt, base)
    # rewrite the base file IN PLACE on the source side: drop one row
    rewritten = pd.concat(
        [base.iloc[1:]], ignore_index=True
    )
    _write(rewritten, str(src / "part-000.parquet"))
    s2 = run_suite(
        suite, RunConfig(results_dir=rdir, run_id=2, incremental_from=1)
    )
    lineage = json.load(
        open(os.path.join(rdir, "checkpoint", "run_id=2", "task=t", "lineage.json"))
    )
    assert "incremental_keyed" not in lineage
    assert "incremental" not in lineage  # profile reuse refused too
    # the full scan sees the dropped row: counts now differ by 1
    assert s2.results[0].payload["count_validation"]["status"] == "FAIL"


def test_persist_hole_from_earlier_attempt_recomputes(tmp_path):
    """A bucket checkpointed by an attempt WITHOUT input persistence
    must not satisfy a later persisting resume: the bucket recomputes
    (so its input.parquet exists) before _INPUTS_COMPLETE is stamped,
    and the follow-up incremental run sees the whole history."""
    src, tgt, base = _build_base(tmp_path)
    rdir = str(tmp_path / "out")
    suite = ValidationSuite(validations=[_task(str(src), str(tgt))])
    # attempt 1: no persistence
    run_suite(suite, RunConfig(results_dir=rdir, run_id=1))
    keyed_dir = os.path.join(rdir, "checkpoint", "run_id=1", "task=t", "keyed")
    buckets = [d for d in os.listdir(keyed_dir) if d.startswith("bucket=")]
    assert buckets and not any(
        os.path.exists(os.path.join(keyed_dir, b, "input.parquet"))
        for b in buckets
    )
    # attempt 2: resume the same run_id WITH persistence — the done
    # buckets lack input.parquet and must recompute
    run_suite(
        suite,
        RunConfig(
            results_dir=rdir, run_id=1, resume=True, persist_keyed_inputs=True
        ),
    )
    assert os.path.exists(os.path.join(keyed_dir, "_INPUTS_COMPLETE"))
    for b in os.listdir(keyed_dir):
        if b.startswith("bucket="):
            assert os.path.exists(os.path.join(keyed_dir, b, "input.parquet")), b
    # incremental run 2 then matches a full run (history intact)
    _append_new(src, tgt, base)
    s2 = run_suite(
        suite, RunConfig(results_dir=rdir, run_id=2, incremental_from=1)
    )
    s_full = run_suite(
        ValidationSuite(validations=[_task(str(src), str(tgt))]),
        RunConfig(results_dir=str(tmp_path / "out_full"), run_id=1),
    )
    assert _keyed_payload(s2) == _keyed_payload(s_full)
