"""End-to-end suite run over the corrupted transcript pair, verified
against an independent pandas oracle (golden-verdict strategy, SURVEY.md
§5): every expected count/ratio is recomputed here with plain pandas ops,
never with engine code."""

import glob
import json

import pandas as pd
import pyarrow.parquet as pq
import pytest

from datapact_ray.config import (
    AggValidation,
    AggValidationDetail,
    DriftCheck,
    OrderingCheck,
    ReferentialCheck,
    ValidationSuite,
    ValidationTask,
)
from datapact_ray.runner import RunConfig, run_suite


def _read(path: str) -> pd.DataFrame:
    files = sorted(glob.glob(f"{path}/*.parquet"))
    return pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)


@pytest.fixture(scope="module")
def oracle(fixture_pair):
    src = _read(fixture_pair["source"])
    tgt = _read(fixture_pair["target"])
    dim = _read(fixture_pair["dim"])
    return src, tgt, dim


@pytest.fixture(scope="module")
def summary(fixture_pair, tmp_path_factory, oracle):
    task = ValidationTask(
        task_key="transcripts",
        source_path=fixture_pair["source"],
        target_path=fixture_pair["target"],
        primary_keys=["conv_id", "turn_idx"],
        count_tolerance=0.005,
        pk_row_hash_check=True,
        pk_hash_tolerance=0.0,
        hash_columns=["role", "text", "tool"],
        null_validation_tolerance=0.0,
        null_validation_columns=["tool", "text"],
        agg_validations=[
            AggValidation(
                column="turn_idx",
                validations=[
                    AggValidationDetail(agg="SUM", tolerance=0.001),
                    AggValidationDetail(agg="AVG", tolerance=0.001),
                    AggValidationDetail(agg="MIN", tolerance=0.0),
                    AggValidationDetail(agg="MAX", tolerance=0.0),
                ],
            ),
            AggValidation(
                column="ts",
                validations=[
                    AggValidationDetail(agg="SUM", tolerance=0.0),  # NULL→PASS quirk
                    AggValidationDetail(agg="MAX", tolerance=0.0),
                ],
            ),
        ],
        uniqueness_columns=["conv_id", "turn_idx"],
        uniqueness_tolerance=0.0,
        compare_columns=["text"],
        ordering=OrderingCheck(),
        referential=[
            ReferentialCheck(columns=["conv_id"], ref_path=fixture_pair["dim"])
        ],
        drift=[
            DriftCheck(column="ts", metric="psi", threshold=0.001),
            DriftCheck(column="ts", metric="ks", threshold=0.01),
        ],
        business_domain="AI",
        business_priority="Critical",
    )
    suite = ValidationSuite(validations=[task])
    results_dir = str(tmp_path_factory.mktemp("results"))
    cfg = RunConfig(results_dir=results_dir, run_id=7, num_buckets=8)
    summary = run_suite(suite, cfg)
    return summary, results_dir


def _payload(summary):
    return summary[0].results[0].payload


def test_overall_failure(summary):
    s, _ = summary
    assert s.results[0].status == "FAILURE"
    assert s.failure_count == 1


def test_count_check(summary, oracle):
    src, tgt, _ = oracle
    p = _payload(summary)["count_validation"]
    assert p["source_count"] == f"{len(src):,}"
    assert p["target_count"] == f"{len(tgt):,}"
    expected_rel = abs(len(src) - len(tgt)) / len(src)
    assert p["relative_diff_percent"] == f"{expected_rel * 100:.2f}%"


def test_uniqueness_check(summary, oracle):
    src, tgt, _ = oracle
    p = _payload(summary)["uniqueness_validation_conv_id_turn_idx"]
    tgt_dupes = len(tgt) - len(tgt.drop_duplicates(["conv_id", "turn_idx"]))
    assert p["source_duplicates"] == "0"
    assert p["target_duplicates"] == f"{tgt_dupes:,}"
    assert p["status"] == ("PASS" if tgt_dupes == 0 else "FAIL")
    assert tgt_dupes > 0


def test_row_hash_and_text_compare(summary, oracle):
    src, tgt, _ = oracle
    joined = src.merge(tgt, on=["conv_id", "turn_idx"], suffixes=("_s", "_t"))
    expected_compared = len(joined)
    text_mism = int((joined["text_s"] != joined["text_t"]).sum())
    hash_mism = int(
        (
            (joined["text_s"] != joined["text_t"])
            | (joined["role_s"] != joined["role_t"])
            | (joined["tool_s"].fillna("§") != joined["tool_t"].fillna("§"))
        ).sum()
    )
    p = _payload(summary)["row_hash_validation"]
    assert p["compared_rows"] == f"{expected_compared:,}"
    assert p["mismatch_count"] == f"{hash_mism:,}"
    c = _payload(summary)["compare_validation_text"]
    assert c["mismatch_count"] == f"{text_mism:,}"
    assert text_mism > 0


def test_null_checks_pk_join_mode(summary, oracle):
    src, tgt, _ = oracle
    joined = src.merge(tgt, on=["conv_id", "turn_idx"], suffixes=("_s", "_t"))
    s_nulls = int(joined["tool_s"].isna().sum())
    t_nulls = int(joined["tool_t"].isna().sum())
    p = _payload(summary)["null_validation_tool"]
    assert p["source_nulls"] == f"{s_nulls:,}"
    assert p["target_nulls"] == f"{t_nulls:,}"
    p2 = _payload(summary)["null_validation_text"]
    assert p2["source_nulls"] == "0" and p2["status"] == "PASS"


def test_agg_checks(summary, oracle):
    src, tgt, _ = oracle
    p = _payload(summary)
    sum_s, sum_t = src["turn_idx"].sum(), tgt["turn_idx"].sum()
    a = p["agg_validation_turn_idx_SUM"]
    assert a["source_value"] == f"{sum_s:,.2f}"
    assert a["target_value"] == f"{sum_t:,.2f}"
    # ts SUM: TRY_CAST(SUM(timestamp)) is NULL in the reference -> PASS
    ts_sum = p["agg_validation_ts_SUM"]
    assert ts_sum["source_value"] is None and ts_sum["status"] == "PASS"
    # ts MAX differs by the 1-day shift -> FAIL at 0 tolerance
    assert p["agg_validation_ts_MAX"]["status"] == "FAIL"
    assert p["agg_validation_turn_idx_MIN"]["status"] == "PASS"


def test_ordering_check(summary, oracle):
    src, tgt, _ = oracle
    p = _payload(summary)["ordering_validation_conv_id"]

    def bad_groups(df):
        contig = 0
        mono = 0
        for _, g in df.groupby("conv_id"):
            g = g.sort_values("turn_idx")
            idx = g["turn_idx"].to_numpy()
            ok_contig = (
                idx.min() == 0
                and idx.max() == len(idx) - 1
                and len(set(idx.tolist())) == len(idx)
            )
            if not ok_contig:
                contig += 1
            elif not g["ts"].is_monotonic_increasing:
                mono += 1
        return contig, mono

    sc, sm = bad_groups(src)
    tc, tm = bad_groups(tgt)
    assert p["contiguity_violations"] == f"{sc + tc:,}"
    assert p["monotonicity_violations"] == f"{sm + tm:,}"
    assert p["groups_checked"] == f"{src['conv_id'].nunique() + tgt['conv_id'].nunique():,}"
    assert tc + tm > 0


def test_referential_check(summary, oracle):
    _, tgt, dim = oracle
    p = _payload(summary)["referential_validation_target_conv_id"]
    orphans = int((~tgt["conv_id"].isin(dim["conv_id"])).sum())
    assert p["orphan_rows"] == f"{orphans:,}"
    assert orphans > 0
    assert p["status"] == "FAIL"


def test_drift_checks(summary, oracle):
    import numpy as np

    src, tgt, _ = oracle
    p = _payload(summary)
    # 10% of convs shifted a full day trips the configured thresholds
    assert p["drift_validation_ts_psi"]["status"] == "FAIL"
    assert p["drift_validation_ts_ks"]["status"] == "FAIL"
    # engine KS (t-digest approximation) vs exact two-sample ECDF KS
    a = np.sort(src["ts"].astype("int64").to_numpy())
    b = np.sort(tgt["ts"].astype("int64").to_numpy())
    grid = np.union1d(a, b)
    ecdf_a = np.searchsorted(a, grid, side="right") / len(a)
    ecdf_b = np.searchsorted(b, grid, side="right") / len(b)
    exact_ks = np.abs(ecdf_a - ecdf_b).max()
    engine_ks = float(p["drift_validation_ts_ks"]["statistic"])
    assert abs(engine_ks - exact_ks) < 0.01, (engine_ks, exact_ks)


def test_violation_rows_written(summary, oracle):
    _, results_dir = summary
    src, tgt, _ = oracle
    vfiles = glob.glob(
        f"{results_dir}/checkpoint/run_id=7/task=transcripts/keyed/bucket=*/violations.parquet"
    )
    assert vfiles
    v = pd.concat([pq.read_table(f).to_pandas() for f in vfiles], ignore_index=True)
    dup_keys = tgt[tgt.duplicated(["conv_id", "turn_idx"], keep=False)]
    n_dup_keys = len(dup_keys.drop_duplicates(["conv_id", "turn_idx"]))
    uniq_v = v[v["check_alias"] == "uniqueness_validation_conv_id_turn_idx"]
    assert len(uniq_v) == n_dup_keys  # caps not hit at this scale
    # violation keys parse and are real duplicate keys
    keys = {tuple(json.loads(k).values()) for k in uniq_v["key"]}
    expected = {
        (str(r.conv_id), str(r.turn_idx))
        for r in dup_keys.drop_duplicates(["conv_id", "turn_idx"]).itertuples()
    }
    assert keys == expected


def test_results_parquet_schema(summary):
    _, results_dir = summary
    t = pq.read_table(f"{results_dir}/results/run_id=7/results.parquet")
    assert t.num_rows == 1
    row = t.to_pylist()[0]
    assert row["status"] == "FAILURE"
    payload = json.loads(row["result_payload"])
    assert payload["configured_primary_keys"] == "conv_id, turn_idx"


def test_clean_pair_all_pass(fixture_pair, tmp_path_factory):
    """Clean-pair variant: target == source ⇒ every check passes
    (reference demo 'transactions' pattern, demo/setup.sql:124)."""
    task = ValidationTask(
        task_key="clean",
        source_path=fixture_pair["source"],
        target_path=fixture_pair["source"],
        primary_keys=["conv_id", "turn_idx"],
        count_tolerance=0.0,
        pk_row_hash_check=True,
        null_validation_tolerance=0.0,
        null_validation_columns=["tool"],
        uniqueness_columns=["conv_id", "turn_idx"],
        uniqueness_tolerance=0.0,
        compare_columns=["text"],
        ordering=OrderingCheck(),
        drift=[DriftCheck(column="ts", metric="psi", threshold=0.01)],
    )
    cfg = RunConfig(
        results_dir=str(tmp_path_factory.mktemp("clean")), run_id=1, num_buckets=4
    )
    s = run_suite(ValidationSuite(validations=[task]), cfg)
    assert s.results[0].status == "SUCCESS", s.results[0].payload


def test_empty_pair_semantics(tmp_path_factory):
    """Empty tables: count s=0 ⇒ PASS; uniqueness/aggs on empty follow the
    COALESCE paths (reference empty_audits, demo/setup.sql:599-613)."""
    import pyarrow as pa
    import pyarrow.parquet as pqw

    d = tmp_path_factory.mktemp("empty")
    empty = pa.table(
        {
            "conv_id": pa.array([], type=pa.string()),
            "turn_idx": pa.array([], type=pa.int32()),
            "x": pa.array([], type=pa.float64()),
        }
    )
    pqw.write_table(empty, str(d / "part-0.parquet"))
    task = ValidationTask(
        task_key="empty",
        source_path=str(d),
        target_path=str(d),
        count_tolerance=0.0,
        uniqueness_columns=["conv_id", "turn_idx"],
        uniqueness_tolerance=0.0,
        agg_validations=[
            AggValidation(
                column="x", validations=[AggValidationDetail(agg="SUM", tolerance=0.0)]
            )
        ],
    )
    cfg = RunConfig(results_dir=str(tmp_path_factory.mktemp("er")), run_id=1, num_buckets=2)
    s = run_suite(ValidationSuite(validations=[task]), cfg)
    assert s.results[0].status == "SUCCESS"
    p = s.results[0].payload
    assert p["count_validation"]["status"] == "PASS"
    assert p["agg_validation_x_SUM"]["source_value"] is None


def test_filter_outside_projected_columns(fixture_pair, tmp_path, oracle):
    """A row filter referencing a column that is NOT in hash_columns /
    profile columns must still work on the fused parquet paths (the read
    has to include filter-referenced columns before applying it)."""
    src, _, _ = oracle
    task = ValidationTask(
        task_key="filtered",
        source_path=fixture_pair["source"],
        target_path=fixture_pair["source"],
        primary_keys=["conv_id", "turn_idx"],
        filter="role = 'user'",
        count_tolerance=0.0,
        pk_row_hash_check=True,
        hash_columns=["text"],  # filter column 'role' is deliberately absent
        null_validation_tolerance=0.0,
        null_validation_columns=["text"],
        referential=[
            ReferentialCheck(
                columns=["conv_id"],
                ref_path=fixture_pair["dim"],
                ref_columns=["conv_id"],
                side="source",
            )
        ],
    )
    s = run_suite(
        ValidationSuite(validations=[task]),
        RunConfig(results_dir=str(tmp_path / "flt"), run_id=1, num_buckets=4),
    )
    r = s.results[0]
    assert r.status == "SUCCESS"
    expect = int((src["role"] == "user").sum())
    assert r.payload["count_validation"]["source_count"] == f"{expect:,}"
