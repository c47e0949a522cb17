"""Filter-predicate compiler: Arrow filtering must agree with DuckDB
running the identical predicate string (oracle parity for S2/M3)."""

import duckdb
import pyarrow as pa
import pytest

from datapact_ray.expr import compile_filter, parse_filter, referenced_columns


@pytest.fixture(scope="module")
def table():
    import numpy as np

    n = 1000
    return pa.table(
        {
            "a": pa.array(np.arange(n)),
            "b": pa.array((np.arange(n) % 7).astype("float64")),
            "s": pa.array([f"v{i % 5}" for i in range(n)]),
            "t": pa.array(
                1_700_000_000_000_000 + np.arange(n) * 3_600_000_000,
                type=pa.timestamp("us"),
            ),
            "nullable": pa.array([None if i % 3 == 0 else i for i in range(n)]),
        }
    )


PREDICATES = [
    "a > 500",
    "a >= 10 AND b < 3.5",
    "s = 'v1' OR s = 'v3'",
    "s IN ('v0', 'v2') AND a < 900",
    "nullable IS NULL",
    "nullable IS NOT NULL AND a BETWEEN 100 AND 200",
    "NOT (a < 500)",
    "s LIKE 'v%'",
    "s NOT LIKE '%1'",
    "t >= TIMESTAMP '2023-11-15 00:00:00'",
    "t >= '2023-11-15 00:00:00'",
    "a != 5 AND (b = 1 OR b = 2.0)",
    # interval folding vs DuckDB's native INTERVAL arithmetic
    "t >= DATE '2023-11-20' - INTERVAL 48 HOUR",
    "t < TIMESTAMP '2023-11-15 00:00:00' + INTERVAL 2 DAYS",
]


@pytest.mark.parametrize("pred", PREDICATES)
def test_filter_matches_duckdb(table, pred):
    expr = compile_filter(pred, table.schema)
    got = table.filter(expr).num_rows
    con = duckdb.connect()
    con.register("t0", table)
    want = con.execute(f"SELECT COUNT(*) FROM t0 WHERE {pred}").fetchone()[0]
    con.close()
    assert got == want, pred


def test_relative_now_filters(table, monkeypatch):
    """current_date()/current_timestamp()/date_sub fold at plan time
    against the DATAPACT_NOW pin (reference demo filter forms,
    demo/demo_config.yml:75-76,344-345)."""
    monkeypatch.setenv("DATAPACT_NOW", "2023-11-16 12:00:00")
    con = duckdb.connect()
    con.register("t0", table)

    for pred, duck_pred in [
        (
            "t >= current_timestamp() - INTERVAL 100 HOUR",
            "t >= TIMESTAMP '2023-11-16 12:00:00' - INTERVAL 100 HOUR",
        ),
        (
            "t >= date_sub(current_date(), 1)",
            "t >= DATE '2023-11-15'",
        ),
        (
            "t < date_add(current_date, 2) AND a >= 0",
            "t < DATE '2023-11-18' AND a >= 0",
        ),
        (
            "t BETWEEN now() - INTERVAL 1 DAY AND now()",
            "t BETWEEN TIMESTAMP '2023-11-15 12:00:00' AND TIMESTAMP '2023-11-16 12:00:00'",
        ),
    ]:
        got = table.filter(compile_filter(pred, table.schema)).num_rows
        want = con.execute(f"SELECT COUNT(*) FROM t0 WHERE {duck_pred}").fetchone()[0]
        assert got == want, pred
    con.close()


def test_interval_requires_temporal_operand():
    with pytest.raises(ValueError):
        parse_filter("a > 5 - INTERVAL 1 DAY")
    with pytest.raises(ValueError):
        parse_filter("t > CURRENT_DATE - INTERVAL 1 FORTNIGHT")


def test_referenced_columns():
    ast = parse_filter("a > 1 AND (s = 'x' OR nullable IS NULL)")
    assert referenced_columns(ast) == {"a", "s", "nullable"}


def test_bad_filters_raise():
    for bad in ["a >", "SELECT 1", "a = ; DROP", "a LIKE 5"]:
        with pytest.raises(ValueError):
            parse_filter(bad)


def test_blank_returns_none():
    assert compile_filter(None) is None
    assert compile_filter("  ") is None


def test_keyword_named_columns_parse():
    # function-like/literal-prefix keywords are legal in column position
    # (a column named `interval` or `now` is plausible in event schemas);
    # original spelling is preserved (columns are case-sensitive)
    from datapact_ray.expr import Cmp, Col

    ast = parse_filter("Interval = 3")
    assert ast == Cmp("=", Col("Interval"), ast.lit)
    assert parse_filter("now > 5").col.name == "now"
    assert parse_filter("`interval` = 3").col.name == "interval"
    # structural keywords stay reserved
    with pytest.raises(ValueError):
        parse_filter("and = 1")


def test_keyword_column_vs_function_use():
    # the same spelling still works as a literal on the right-hand side
    ast = parse_filter("ts >= current_date() - INTERVAL 1 DAY")
    assert ast.col.name == "ts"


# ---- property-based parity fuzz (hypothesis) ----

from hypothesis import given, settings, strategies as st

_num_op = st.sampled_from(["=", "!=", "<", "<=", ">", ">="])
_int_lit = st.integers(min_value=-50, max_value=1050)
_float_lit = st.sampled_from(["0.0", "1.5", "3.0", "6.5", "2"])
_str_lit = st.sampled_from(["'v0'", "'v1'", "'v4'", "'zz'", "''"])
_like_pat = st.sampled_from(["'v%'", "'%1'", "'v_'", "'%'", "'x%'"])


def _atom() -> st.SearchStrategy[str]:
    return st.one_of(
        st.tuples(_num_op, _int_lit).map(lambda t: f"a {t[0]} {t[1]}"),
        st.tuples(_num_op, _float_lit).map(lambda t: f"b {t[0]} {t[1]}"),
        st.tuples(st.sampled_from(["=", "!="]), _str_lit).map(
            lambda t: f"s {t[0]} {t[1]}"
        ),
        _like_pat.map(lambda p: f"s LIKE {p}"),
        _like_pat.map(lambda p: f"s NOT LIKE {p}"),
        st.just("nullable IS NULL"),
        st.just("nullable IS NOT NULL"),
        st.tuples(_int_lit, _int_lit).map(
            lambda t: f"a BETWEEN {min(t)} AND {max(t)}"
        ),
        st.lists(_str_lit, min_size=1, max_size=3).map(
            lambda ls: f"s IN ({', '.join(ls)})"
        ),
        st.tuples(_num_op, _int_lit).map(
            lambda t: f"nullable {t[0]} {t[1]}"
        ),
    )


def _pred(depth: int) -> st.SearchStrategy[str]:
    if depth == 0:
        return _atom()
    sub = _pred(depth - 1)
    return st.one_of(
        _atom(),
        st.tuples(sub, sub).map(lambda t: f"({t[0]} AND {t[1]})"),
        st.tuples(sub, sub).map(lambda t: f"({t[0]} OR {t[1]})"),
        sub.map(lambda p: f"NOT ({p})"),
    )


@settings(max_examples=120, deadline=None)
@given(pred=_pred(2))
def test_fuzzed_filter_matches_duckdb(table, pred):
    """Any predicate the grammar can produce must select EXACTLY the
    rows DuckDB selects for the identical string (3-valued NULL logic
    included — NOT over a NULL comparison must not resurrect rows)."""
    expr = compile_filter(pred, table.schema)
    got = table.filter(expr)
    con = duckdb.connect()
    con.register("t0", table)
    want_n, want_sum = con.execute(
        f"SELECT COUNT(*), COALESCE(SUM(a), 0) FROM t0 WHERE {pred}"
    ).fetchone()
    con.close()
    import pyarrow.compute as pc

    got_sum = pc.sum(got.column("a")).as_py() or 0
    assert (got.num_rows, got_sum) == (want_n, int(want_sum)), pred
