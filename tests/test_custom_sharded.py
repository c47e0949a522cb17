"""Sharded custom-SQL execution: the decomposed scan-unit path must
produce exactly the driver-DuckDB result (values, names, multiset), and
non-decomposable shapes must be detected and refused (→ driver
fallback). Addresses the round-3 'custom SQL executes on the driver'
scale-locus finding."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datapact_ray.stages.custom import (
    SOURCE_VIEW,
    plan_sharded,
    render_custom_sql,
    run_custom_check,
)


@pytest.fixture(scope="module")
def orders_pair(tmp_path_factory):
    """A multi-file, multi-row-group pair so _scan_units actually fans
    out; target diverges from source in one group."""
    rng = np.random.default_rng(7)
    out = tmp_path_factory.mktemp("custom_sharded")
    n = 4000
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_orderstatus": rng.choice(["O", "F", "P"], size=n),
            "o_totalprice": np.round(rng.uniform(10, 1000, size=n), 2),
            "o_comment": [f"c{i}" for i in range(n)],
        }
    )
    src_files, tgt_files = [], []
    for part in range(3):
        chunk = df.iloc[part * (n // 3) : (part + 1) * (n // 3) if part < 2 else n]
        sp = str(out / f"src_{part}.parquet")
        pq.write_table(pa.Table.from_pandas(chunk, preserve_index=False), sp, row_group_size=500)
        src_files.append(sp)
        tchunk = chunk.copy()
        if part == 1:  # corrupt one shard: drop 17 'F' rows
            drop = tchunk.index[tchunk["o_orderstatus"] == "F"][:17]
            tchunk = tchunk.drop(drop)
        tp = str(out / f"tgt_{part}.parquet")
        pq.write_table(pa.Table.from_pandas(tchunk, preserve_index=False), tp, row_group_size=500)
        tgt_files.append(tp)
    return src_files, tgt_files


def _driver_result(sql: str, files: list[str]) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        file_list = ", ".join(f"'{f}'" for f in files)
        con.execute(f"CREATE VIEW src AS SELECT * FROM read_parquet([{file_list}])")
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _plan(sql: str, files: list[str]):
    con = duckdb.connect()
    try:
        file_list = ", ".join(f"'{f}'" for f in files)
        con.execute(f"CREATE VIEW src AS SELECT * FROM read_parquet([{file_list}])")
        con.execute(f"CREATE VIEW tgt AS SELECT * FROM read_parquet([{file_list}])")
        schema = [(r[0], r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall()]
        input_cols = {
            view: {r[0]: r[1] for r in con.execute(f"DESCRIBE {view}").fetchall()}
            for view in ("src", "tgt")
        }
    finally:
        con.close()
    return plan_sharded(sql, schema, input_cols)


DECOMPOSABLE = [
    "SELECT count(*) AS n FROM src",
    "SELECT o_orderstatus, count(*) AS n FROM src GROUP BY o_orderstatus",
    # AVG decomposition + ungrouped multi-agg
    "SELECT sum(o_totalprice) AS s, avg(o_totalprice) AS a, "
    "min(o_totalprice) AS lo, max(o_comment) AS hi, count(o_orderkey) AS c FROM src",
    # WHERE pushdown per fragment + expression group key
    "SELECT o_orderkey % 7 AS bucket, sum(o_totalprice) AS s FROM src "
    "WHERE o_orderkey > 100 GROUP BY o_orderkey % 7",
    # GROUP BY column not in the select list
    "SELECT count(*) AS n FROM src GROUP BY o_orderstatus",
    # result ORDER BY: dropped (metrics are order-insensitive)
    "SELECT o_orderstatus, count(*) AS n FROM src GROUP BY o_orderstatus "
    "ORDER BY n DESC",
    # HAVING: aggregate + group-key reference move onto the merge
    "SELECT o_orderstatus, count(*) AS n FROM src GROUP BY o_orderstatus "
    "HAVING count(*) > 5 AND o_orderstatus <> 'X'",
    # HAVING over an aggregate NOT in the select list (hidden partial)
    "SELECT o_orderstatus, count(*) AS n FROM src GROUP BY o_orderstatus "
    "HAVING avg(o_totalprice) > 400",
    # HAVING via a select-item alias
    "SELECT o_orderstatus, count(*) AS n FROM src GROUP BY o_orderstatus "
    "HAVING n > 1200",
    # DISTINCT aggregates: global, grouped+mixed, and multiple DISTINCT
    # aggs over the SAME argument
    "SELECT count(DISTINCT o_orderstatus) AS n FROM src",
    "SELECT o_orderstatus, count(DISTINCT o_orderkey % 10) AS d, "
    "sum(o_totalprice) AS s, count(*) AS n FROM src GROUP BY o_orderstatus",
    "SELECT sum(DISTINCT o_orderkey % 100) AS s, "
    "avg(DISTINCT o_orderkey % 100) AS a FROM src",
    # --- round-5 shapes: scalar wrappers over aggregates + alias /
    # ordinal / expression group keys (the reference's own demo custom
    # tests, /root/reference/demo/demo_config.yml:55-60,110-125) ---
    # "Segment Satisfaction Bands": ROUND(AVG(COALESCE(..)),4)
    "SELECT o_orderstatus, ROUND(AVG(COALESCE(o_totalprice, 0)), 4) AS a, "
    "COUNT(*) AS population FROM src GROUP BY o_orderstatus",
    # "Payment Method Mix Daily": scalar group-key expr referenced via
    # its select alias + ROUND(SUM()) + SUM(CASE WHEN)
    "SELECT o_orderkey % 7 AS bucket, o_orderstatus, "
    "ROUND(SUM(o_totalprice), 2) AS gross, "
    "SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS f_count, "
    "COUNT(*) AS n FROM src GROUP BY bucket, o_orderstatus",
    # ordinal group keys
    "SELECT o_orderstatus, count(*) AS n FROM src GROUP BY 1",
    # ratio of aggregates + wrapper over AVG-decomposition
    "SELECT o_orderstatus, SUM(o_totalprice) / NULLIF(COUNT(*), 0) AS unit, "
    "CAST(AVG(o_totalprice) AS INTEGER) AS avg_int FROM src "
    "GROUP BY o_orderstatus",
    # scalar expression over a group key only (no aggregate in the item)
    "SELECT UPPER(o_orderstatus) AS u, COUNT(*) AS n FROM src "
    "GROUP BY o_orderstatus",
    # constant select item alongside aggregates
    "SELECT 'orders' AS tbl, o_orderstatus, COUNT(*) AS n FROM src "
    "GROUP BY o_orderstatus",
    # alias group key whose name shadows nothing + HAVING over wrapper alias
    "SELECT o_orderkey % 5 AS b5, ROUND(AVG(o_totalprice), 1) AS r "
    "FROM src GROUP BY b5 HAVING r > 100",
]

NOT_DECOMPOSABLE = [
    "SELECT DISTINCT o_orderstatus FROM src",  # DISTINCT modifier
    "SELECT o_orderstatus, count(*) AS n FROM src GROUP BY o_orderstatus LIMIT 2",
    "SELECT o_orderstatus FROM src",  # bare projection, not aggregate-shaped
    "SELECT s.o_orderkey FROM src s JOIN tgt t ON s.o_orderkey = t.o_orderkey",
    "SELECT (SELECT max(o_orderkey) FROM tgt) AS m FROM src",
    # join shapes that resist the equi-join bucket shuffle
    "SELECT count(*) AS n FROM src s LEFT JOIN tgt t "
    "ON s.o_orderkey = t.o_orderkey",  # outer join: unmatched rows span buckets
    "SELECT count(*) AS n FROM src s JOIN tgt t ON s.o_orderkey < t.o_orderkey",
    "SELECT count(*) AS n FROM src a JOIN src b ON a.o_orderkey = b.o_orderkey",
    "SELECT row_number() OVER (ORDER BY o_orderkey) AS rn FROM src",
    "SELECT o_orderstatus, count(*) AS n FROM src GROUP BY ROLLUP (o_orderstatus)",
    # two DISTINCT aggs over DIFFERENT arguments (no shared dedup key)
    "SELECT count(DISTINCT o_orderstatus) AS a, count(DISTINCT o_comment) AS b "
    "FROM src",
    # FILTER clause
    "SELECT count(*) FILTER (WHERE o_orderstatus = 'F') AS n FROM src",
    # HAVING over an aggregate we can't re-aggregate
    "SELECT o_orderstatus, count(*) AS n FROM src GROUP BY o_orderstatus "
    "HAVING median(o_totalprice) > 400",
    # ORDER BY + LIMIT changes the result multiset → stays on the driver
    "SELECT o_orderstatus, count(*) AS n FROM src GROUP BY o_orderstatus "
    "ORDER BY n DESC LIMIT 1",
    # ungrouped aggregate-free select — one row per INPUT row; sharding
    # would change the cardinality
    "SELECT 'x' AS lbl FROM src",
    # wrapper over an aggregate we can't re-aggregate
    "SELECT ROUND(median(o_totalprice), 2) AS m FROM src",
]


@pytest.mark.parametrize("sql", DECOMPOSABLE)
def test_sharded_equals_driver(orders_pair, sql):
    src_files, _ = orders_pair
    plan = _plan(sql, src_files)
    assert plan is not None, f"expected decomposable: {sql}"
    assert plan.table_name == SOURCE_VIEW
    from datapact_ray.stages.custom import _run_side_sharded

    got, _reused = _run_side_sharded(plan, src_files)
    want = _driver_result(sql, src_files)
    assert list(got.columns) == list(want.columns)
    # sort on every non-float column (the group keys) — float aggregates
    # can differ in the last ulp and would misalign rows
    key = [
        c for c in got.columns if not pd.api.types.is_float_dtype(got[c])
    ] or list(got.columns[:1])
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False, atol=1e-9, rtol=1e-12)


@pytest.mark.parametrize("sql", NOT_DECOMPOSABLE)
def test_non_decomposable_refused(orders_pair, sql):
    src_files, _ = orders_pair
    assert _plan(sql, src_files) is None, f"must NOT shard: {sql}"


def test_column_pruning_in_plan(orders_pair):
    src_files, _ = orders_pair
    plan = _plan(
        "SELECT o_orderstatus, sum(o_totalprice) AS s FROM src GROUP BY o_orderstatus",
        src_files,
    )
    assert plan is not None
    assert set(plan.columns) == {"o_orderstatus", "o_totalprice"}


def test_run_custom_check_sharded_end_to_end(orders_pair):
    """Full check through the sharded path: detects the 17 dropped 'F'
    rows in the corrupted target and records the locus."""
    src_files, tgt_files = orders_pair
    m = run_custom_check(
        "SELECT o_orderstatus, COUNT(*) AS n FROM {{ table_fqn }} "
        "GROUP BY o_orderstatus",
        src_files,
        tgt_files,
    )
    assert m.source_locus == "sharded" and m.target_locus == "sharded"
    assert m.source_row_count == 3 and m.target_row_count == 3
    # the F group count differs → one row excess on each side
    assert m.rows_missing_in_target == 1 and m.rows_missing_in_source == 1
    assert m.source_hash != m.target_hash

    # identical result vs forced-driver execution
    d = run_custom_check(
        "SELECT o_orderstatus, COUNT(*) AS n FROM {{ table_fqn }} "
        "GROUP BY o_orderstatus",
        src_files,
        tgt_files,
        distribute=False,
    )
    assert d.source_locus == "driver" and d.target_locus == "driver"
    assert (m.source_hash, m.target_hash) == (d.source_hash, d.target_hash)
    assert m.rows_missing_in_target == d.rows_missing_in_target


def test_run_custom_check_non_decomposable_falls_back(orders_pair):
    """Outer-join query → driver locus, still correct."""
    src_files, tgt_files = orders_pair
    sql = (
        "SELECT count(*) AS matched FROM {{ source_fqn }} s "
        "LEFT JOIN {{ target_fqn }} t ON s.o_orderkey = t.o_orderkey"
    )
    m = run_custom_check(sql, src_files, tgt_files)
    assert m.source_locus == "driver" and m.target_locus == "driver"
    # both renders produce the same join → identical results
    assert m.source_hash == m.target_hash
    assert m.rows_missing_in_target == 0 and m.rows_missing_in_source == 0


# --- round-5 stretch: two-table equi-join aggregates ride the bucket
# shuffle (both sides keyed by the join column, per-bucket DuckDB on
# the co-located join, partial/merge algebra unchanged) ---

JOIN_DECOMPOSABLE = [
    # the cross-side reconciliation count a DataPact user writes first
    "SELECT count(*) AS matched FROM src s "
    "JOIN tgt t ON s.o_orderkey = t.o_orderkey",
    # grouped + wrapped aggregates over the join
    "SELECT s.o_orderstatus, count(*) AS n, "
    "ROUND(SUM(t.o_totalprice), 2) AS v FROM src s "
    "JOIN tgt t ON s.o_orderkey = t.o_orderkey GROUP BY s.o_orderstatus",
    # value-drift pairs: AVG of the target-minus-source delta
    "SELECT ROUND(AVG(t.o_totalprice - s.o_totalprice), 4) AS drift "
    "FROM src s JOIN tgt t ON s.o_orderkey = t.o_orderkey",
    # USING syntax
    "SELECT count(*) AS n FROM src JOIN tgt USING (o_orderkey)",
    # AND condition: one clean equality co-locates, the rest run per bucket
    "SELECT count(*) AS n FROM src s JOIN tgt t "
    "ON s.o_orderkey = t.o_orderkey AND s.o_totalprice <= t.o_totalprice",
    # HAVING over the join aggregate
    "SELECT s.o_orderstatus, count(*) AS n FROM src s "
    "JOIN tgt t ON s.o_orderkey = t.o_orderkey "
    "GROUP BY s.o_orderstatus HAVING count(*) > 100",
]


@pytest.mark.parametrize("sql", JOIN_DECOMPOSABLE)
def test_join_sharded_equals_driver(orders_pair, sql):
    src_files, tgt_files = orders_pair
    plan = _plan(sql, src_files)
    assert plan is not None and plan.join is not None, f"expected join shard: {sql}"
    from datapact_ray.stages.custom import _run_join_sharded

    got = _run_join_sharded(plan, src_files, tgt_files)
    con = duckdb.connect()
    try:
        for view, files in (("src", src_files), ("tgt", tgt_files)):
            fl = ", ".join(f"'{f}'" for f in files)
            con.execute(f"CREATE VIEW {view} AS SELECT * FROM read_parquet([{fl}])")
        want = con.execute(sql).fetchdf()
    finally:
        con.close()
    assert list(got.columns) == list(want.columns)
    key = [
        c for c in got.columns if not pd.api.types.is_float_dtype(got[c])
    ] or list(got.columns[:1])
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False, atol=1e-9, rtol=1e-12)


def test_join_custom_check_end_to_end(orders_pair):
    """Cross-side join reconciliation through run_custom_check: both
    renders produce the same join (source_fqn/target_fqn are role-
    independent), so the check passes — and both sides now execute on
    the sharded locus instead of a driver full scan."""
    src_files, tgt_files = orders_pair
    sql = (
        "SELECT count(*) AS matched FROM {{ source_fqn }} s "
        "JOIN {{ target_fqn }} t ON s.o_orderkey = t.o_orderkey"
    )
    m = run_custom_check(sql, src_files, tgt_files)
    assert m.source_locus == "sharded" and m.target_locus == "sharded"
    assert m.source_hash == m.target_hash
    # identical values vs forced-driver execution
    d = run_custom_check(sql, src_files, tgt_files, distribute=False)
    assert (m.source_hash, m.target_hash) == (d.source_hash, d.target_hash)


def test_plan_printer_labels_locus(orders_pair, tmp_path):
    src_files, tgt_files = orders_pair
    import os

    from datapact_ray.cli import _custom_locus

    src_dir, tgt_dir = os.path.dirname(src_files[0]), os.path.dirname(tgt_files[0])
    # directories mix src_*/tgt_* files — point at single files instead
    lab = _custom_locus(
        "SELECT count(*) AS n FROM {{ table_fqn }}", src_files[0], tgt_files[0]
    )
    assert "SHARDED" in lab
    lab2 = _custom_locus(
        "SELECT DISTINCT o_orderstatus FROM {{ table_fqn }}",
        src_files[0],
        tgt_files[0],
    )
    assert "WARNING" in lab2 and "DRIVER" in lab2
    lab3 = _custom_locus(
        "SELECT count(*) AS n FROM {{ table_fqn }}",
        str(tmp_path / "nope"),
        str(tmp_path / "nope2"),
    )
    assert "undetermined" in lab3


def test_verdict_payload_records_execution_locus(orders_pair, tmp_path):
    """The custom-check verdict payload surfaces the per-side execution
    locus so dashboards can flag driver-bound checks (round-4 item #7)."""
    import os
    import shutil

    from datapact_ray.config import CustomCheck, ValidationSuite, ValidationTask
    from datapact_ray.runner import RunConfig, run_suite

    src_files, tgt_files = orders_pair
    sdir, tdir = str(tmp_path / "src"), str(tmp_path / "tgt")
    for d, files in ((sdir, src_files), (tdir, tgt_files)):
        os.makedirs(d)
        for f in files:
            shutil.copy(f, d)
    task = ValidationTask(
        task_key="t",
        source_path=sdir,
        target_path=tdir,
        custom_checks=[
            CustomCheck(
                name="status totals",
                sql=(
                    "SELECT o_orderstatus, ROUND(AVG(o_totalprice), 4) AS a, "
                    "COUNT(*) AS n FROM {{ table_fqn }} GROUP BY o_orderstatus"
                ),
            ),
            CustomCheck(
                name="joined",
                sql=(
                    "SELECT count(*) AS m FROM {{ source_fqn }} s "
                    "LEFT JOIN {{ target_fqn }} t ON s.o_orderkey = t.o_orderkey"
                ),
            ),
        ],
    )
    s = run_suite(
        ValidationSuite(validations=[task]),
        RunConfig(results_dir=str(tmp_path / "res"), run_id=1),
    )
    verdicts = {v.alias: v for v in s.results[0].verdicts}
    sharded = verdicts["custom_sql_validation_status_totals"]
    assert sharded.payload["execution_locus"] == {
        "source": "sharded",
        "target": "sharded",
    }
    joined = verdicts["custom_sql_validation_joined"]
    assert joined.payload["execution_locus"] == {
        "source": "driver",
        "target": "driver",
    }


# ---------------------------------------------------------------------------
# property fuzz: any composition of supported shapes must shard and
# match driver DuckDB exactly
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_GROUPS = [None, "o_orderstatus", "o_orderkey % 5", "upper(o_orderstatus)"]
_AGGS = [
    "count(*)",
    "sum(o_totalprice)",
    "avg(o_totalprice)",
    "min(o_comment)",
    "max(o_totalprice)",
    "count(o_orderkey)",
    # DISTINCT aggs share one argument expression by design
    "count(DISTINCT o_orderkey % 10)",
    "sum(DISTINCT o_orderkey % 10)",
    # round-5 grammar: scalar wrappers over aggregates
    "round(avg(o_totalprice), 3)",
    "round(sum(o_totalprice), 2)",
    "sum(o_totalprice) / nullif(count(*), 0)",
    "sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)",
    "cast(max(o_totalprice) AS INTEGER)",
]
_WHERES = [None, "o_orderkey > 500", "o_orderstatus <> 'P' AND o_totalprice < 900"]
_HAVINGS = [None, "count(*) > 300", "avg(o_totalprice) > 350", "a0 IS NOT NULL"]


_JOIN_AGGS = [
    "count(*)",
    "sum(t.o_totalprice)",
    "round(avg(s.o_totalprice - t.o_totalprice), 4)",
    "count(s.o_comment)",
    "max(t.o_totalprice)",
]
_JOIN_GROUPS = [None, "s.o_orderstatus", "s.o_orderkey % 5"]
_JOIN_ONS = [
    "s.o_orderkey = t.o_orderkey",
    "s.o_orderkey = t.o_orderkey AND s.o_totalprice <= t.o_totalprice",
]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    group_i=st.integers(0, len(_JOIN_GROUPS) - 1),
    agg_idx=st.lists(
        st.integers(0, len(_JOIN_AGGS) - 1), min_size=1, max_size=3, unique=True
    ),
    on_i=st.integers(0, len(_JOIN_ONS) - 1),
    having=st.booleans(),
)
def test_join_sharded_equals_driver_fuzz(orders_pair, group_i, agg_idx, on_i, having):
    src_files, tgt_files = orders_pair
    group = _JOIN_GROUPS[group_i]
    items = [f"{_JOIN_AGGS[i]} AS a{k}" for k, i in enumerate(agg_idx)]
    if group:
        items.insert(0, group + " AS g")
    sql = (
        "SELECT " + ", ".join(items) + " FROM src s JOIN tgt t ON "
        + _JOIN_ONS[on_i]
    )
    if group:
        sql += f" GROUP BY {group}"
        if having:
            sql += " HAVING count(*) > 50"
    plan = _plan(sql, src_files)
    assert plan is not None and plan.join is not None, f"expected join shard: {sql}"
    from datapact_ray.stages.custom import _run_join_sharded

    got = _run_join_sharded(plan, src_files, tgt_files)
    con = duckdb.connect()
    try:
        for view, files in (("src", src_files), ("tgt", tgt_files)):
            fl = ", ".join(f"'{f}'" for f in files)
            con.execute(f"CREATE VIEW {view} AS SELECT * FROM read_parquet([{fl}])")
        want = con.execute(sql).fetchdf()
    finally:
        con.close()
    assert list(got.columns) == list(want.columns)
    key = [
        c for c in got.columns if not pd.api.types.is_float_dtype(got[c])
    ] or list(got.columns[:1])
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_s, want_s, check_dtype=False, atol=1e-9, rtol=1e-12
    )


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    group_i=st.integers(0, len(_GROUPS) - 1),
    agg_idx=st.lists(
        st.integers(0, len(_AGGS) - 1), min_size=1, max_size=4, unique=True
    ),
    where_i=st.integers(0, len(_WHERES) - 1),
    having_i=st.integers(0, len(_HAVINGS) - 1),
    order=st.booleans(),
    group_ref=st.integers(0, 2),  # how GROUP BY names the key: expr/alias/ordinal
)
def test_sharded_equals_driver_fuzz(
    orders_pair, group_i, agg_idx, where_i, having_i, order, group_ref
):
    src_files, _ = orders_pair
    group = _GROUPS[group_i]
    items = [f"{_AGGS[i]} AS a{k}" for k, i in enumerate(agg_idx)]
    if group:
        items.insert(0, group + " AS g")
    sql = "SELECT " + ", ".join(items) + " FROM src"
    if _WHERES[where_i]:
        sql += f" WHERE {_WHERES[where_i]}"
    if group:
        sql += " GROUP BY " + (group, "g", "1")[group_ref]
        if _HAVINGS[having_i]:
            sql += f" HAVING {_HAVINGS[having_i]}"
    if order:
        sql += " ORDER BY 1"
    plan = _plan(sql, src_files)
    assert plan is not None, f"expected decomposable: {sql}"
    from datapact_ray.stages.custom import _run_side_sharded

    got, _reused = _run_side_sharded(plan, src_files)
    want = _driver_result(sql, src_files)
    assert list(got.columns) == list(want.columns)
    key = list(got.columns)
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_s, want_s, check_dtype=False, atol=1e-9, rtol=1e-12
    )


def test_join_key_type_mismatch_refuses(tmp_path):
    """BIGINT-vs-VARCHAR join keys hash differently per side, so the
    bucket shuffle would silently under-join what DuckDB's implicit
    cast joins on the driver — the planner must refuse to the driver."""
    sp = str(tmp_path / "src.parquet")
    tp = str(tmp_path / "tgt.parquet")
    pq.write_table(
        pa.table({"id": pa.array([1, 2, 3], type=pa.int64()), "v": [1.0, 2.0, 3.0]}),
        sp,
    )
    pq.write_table(
        pa.table({"id": pa.array(["1", "2", "9"], type=pa.string()), "w": [5, 6, 7]}),
        tp,
    )
    sql = "SELECT count(*) AS n FROM src s JOIN tgt t ON s.id = t.id"
    assert _plan(sql, [sp]) is None or True  # _plan registers same files both views
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW src AS SELECT * FROM read_parquet('{sp}')")
        con.execute(f"CREATE VIEW tgt AS SELECT * FROM read_parquet('{tp}')")
        schema = [(r[0], r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall()]
        input_cols = {
            view: {r[0]: r[1] for r in con.execute(f"DESCRIBE {view}").fetchall()}
            for view in ("src", "tgt")
        }
    finally:
        con.close()
    assert plan_sharded(sql, schema, input_cols) is None
    # and the full check still answers correctly via the driver
    m = run_custom_check(sql, [sp], [tp])
    assert m.source_locus == "driver" and m.target_locus == "driver"
    assert m.source_row_count == 1
