"""Custom-check machinery (multiset diff, order-insensitive hash) and
genie latest-run snapshots."""

import json
from datetime import datetime

import pandas as pd
import pytest

from datapact_ray.stages.custom import (
    multiset_diff,
    orderless_hash,
    render_custom_sql,
    run_custom_check,
)


def test_orderless_hash_order_insensitive_and_empty():
    a = pd.DataFrame({"x": [1, 2, 3], "y": ["a", "b", "c"]})
    b = a.iloc[[2, 0, 1]].reset_index(drop=True)
    assert orderless_hash(a) == orderless_hash(b)
    assert orderless_hash(a.iloc[0:0]) == "EMPTY"
    c = a.copy()
    c.loc[0, "y"] = "zzz"
    assert orderless_hash(a) != orderless_hash(c)


def test_multiset_diff_counts_and_samples():
    s = pd.DataFrame({"k": ["a", "a", "b"], "n": [1, 1, 2]})
    t = pd.DataFrame({"k": ["a", "b", "b"], "n": [1, 2, 2]})
    mt, ms, sample_t, sample_s = multiset_diff(s, t)
    assert mt == 1  # one extra ('a',1) on source
    assert ms == 1  # one extra ('b',2) on target
    assert json.loads(sample_t) == {"k": "a", "n": 1}
    assert json.loads(sample_s) == {"k": "b", "n": 2}
    mt, ms, st_, ss_ = multiset_diff(s, s.copy())
    assert (mt, ms, st_, ss_) == (0, 0, None, None)


def test_run_custom_check_detects_diff(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src.parquet"
    tgt = tmp_path / "tgt.parquet"
    pq.write_table(pa.table({"g": ["x", "x", "y"], "v": [1, 2, 3]}), str(src))
    pq.write_table(pa.table({"g": ["x", "y", "y"], "v": [1, 2, 3]}), str(tgt))
    m = run_custom_check(
        "SELECT g, SUM(v) AS total FROM {{ table_fqn }} GROUP BY g",
        [str(src)],
        [str(tgt)],
    )
    assert m.source_row_count == 2 and m.target_row_count == 2
    assert m.rows_missing_in_target == 2  # both grouped rows differ
    assert m.rows_missing_in_source == 2
    assert m.source_hash != m.target_hash
    assert render_custom_sql("SELECT * FROM {{ source_fqn }}", "source") == (
        "SELECT * FROM src"
    )


def test_custom_check_cross_side_references(tmp_path):
    """Reference semantics (sql_generator.py:56-84): source_fqn/target_fqn
    resolve to the REAL source/target in both render contexts, so one
    query can compare the two sides; table_fqn/rendered_role flip."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src.parquet"
    tgt = tmp_path / "tgt.parquet"
    pq.write_table(pa.table({"v": [1, 2, 3]}), str(src))
    pq.write_table(pa.table({"v": [1, 2]}), str(tgt))
    sql = (
        "SELECT (SELECT COUNT(*) FROM {{ source_fqn }}) AS n_src, "
        "(SELECT COUNT(*) FROM {{ target_fqn }}) AS n_tgt"
    )
    m = run_custom_check(sql, [str(src)], [str(tgt)])
    # both renders read the same cross-side counts -> identical results
    assert m.rendered_source_sql == m.rendered_target_sql
    assert m.source_hash == m.target_hash
    assert m.rows_missing_in_target == 0 and m.rows_missing_in_source == 0
    # role-dependent variables DO flip between the two contexts
    roled = render_custom_sql(
        "SELECT '{{ rendered_role }}' AS role FROM {{ table_fqn }}",
        "target",
        [str(src)],
        [str(tgt)],
    )
    assert roled == "SELECT 'target' AS role FROM tgt"


@pytest.fixture
def history():
    def row(task, status, begin, payload, run_id=1):
        return {
            "task_key": task,
            "status": status,
            "run_id": run_id,
            "job_name": "j",
            "validation_begin_ts": datetime(2024, 1, 1, 0, 0, begin),
            "source_table": f"/data/{task}_src",
            "target_table": f"/data/{task}_tgt",
            "result_payload": json.dumps(payload),
        }

    return pd.DataFrame(
        [
            # stale row for task a (earlier begin_ts) must be dropped
            row("a", "SUCCESS", 1, {"count_validation": {"status": "PASS"}}),
            row(
                "a",
                "FAILURE",
                5,
                {
                    "count_validation": {
                        "status": "FAIL",
                        "source_count": "100",
                        "target_count": "90",
                    }
                },
            ),
            row(
                "b",
                "FAILURE",
                2,
                {
                    "count_validation": {"status": "PASS"},
                    "uniqueness_validation_k": {"status": "FAIL"},
                },
            ),
            row("c", "SUCCESS", 3, {"count_validation": {"status": "PASS"}}),
        ]
    )


def test_genie_latest_run_dedup_and_issue_types(history):
    from datapact_ray.genie import (
        genie_current_status,
        genie_issues,
        genie_table_quality,
    )

    status = genie_current_status(history)
    assert len(status) == 3  # stale 'a' row deduped
    a = status[status["validation_name"] == "a"].iloc[0]
    assert a["validation_status"] == "Failed"
    assert a["issue_type"] == "Row count mismatch"
    b = status[status["validation_name"] == "b"].iloc[0]
    assert b["issue_type"] == "Duplicate records found"
    c = status[status["validation_name"] == "c"].iloc[0]
    assert c["issue_type"] == "All checks passed"

    quality = genie_table_quality(history)
    assert quality["quality_score"].between(0, 100).all()
    arow = quality[quality["table_name"] == "/data/a_src"].iloc[0]
    assert arow["failed_validations"] == 1 and arow["quality_score"] == 0.0

    issues = genie_issues(history)
    assert len(issues) == 2
    adesc = issues[issues["validation_name"] == "a"].iloc[0]["issue_description"]
    assert adesc == "Expected 100 rows but found 90"


def test_unknown_template_variable_fails_loudly():
    # a typo'd placeholder must raise with the variable name, not render
    # to '' and surface as an unrelated DuckDB syntax error
    with pytest.raises(ValueError, match="source_fq"):
        render_custom_sql("SELECT * FROM {{ source_fq }}", "source")


def test_issue_type_extension_families():
    """Engine-extension check families classify after the reference's
    five-step precedence chain instead of falling to 'Unknown issue'."""
    from datapact_ray.genie import _issue_type

    assert _issue_type(
        "FAILURE", {"ordering_validation_conv_id": {"status": "FAIL"}}
    ) == "Sequence ordering violation"
    assert _issue_type(
        "FAILURE",
        {"sequence_grammar_validation_conv_id": {"status": "FAIL"}},
    ) == "Role grammar violation"
    assert _issue_type(
        "FAILURE", {"conditional_validation_r": {"status": "FAIL"}}
    ) == "Conditional rule violation"
    assert _issue_type(
        "FAILURE", {"temporal_drift_validation_v_ks": {"status": "FAIL"}}
    ) == "Source shifted since baseline"
    assert _issue_type(
        "FAILURE", {"drift_validation_ts_ts_gap_ks": {"status": "FAIL"}}
    ) == "Distribution drift detected"
    # reference precedence still wins when both are present
    assert _issue_type(
        "FAILURE",
        {
            "count_validation": {"status": "FAIL"},
            "ordering_validation_conv_id": {"status": "FAIL"},
        },
    ) == "Row count mismatch"
    # temporal outranks plain drift (more specific signal)
    assert _issue_type(
        "FAILURE",
        {
            "temporal_drift_validation_v_ks": {"status": "FAIL"},
            "drift_validation_v_ks": {"status": "FAIL"},
        },
    ) == "Source shifted since baseline"
