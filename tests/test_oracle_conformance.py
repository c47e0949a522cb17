"""Driver-style conformance: run each queries() pipeline on Ray and its
oracle_sql() on DuckDB over the same parquet tables; compare row count,
column names, and order-insensitive values (the CORRECTNESS gate)."""

import math

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_numeric_dtype(df[c]):
            df[c] = pd.to_numeric(df[c], errors="coerce").astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _assert_equivalent(got: pd.DataFrame, want: pd.DataFrame, name: str):
    got_n, want_n = _normalize(got), _normalize(want)
    assert list(got_n.columns) == list(want_n.columns), (
        name, list(got_n.columns), list(want_n.columns)
    )
    assert len(got_n) == len(want_n), (name, len(got_n), len(want_n))
    for c in got_n.columns:
        a, b = got_n[c], want_n[c]
        if pd.api.types.is_float_dtype(a):
            for x, y in zip(a, b):
                if (isinstance(x, float) and math.isnan(x)) and (
                    isinstance(y, float) and math.isnan(y)
                ):
                    continue
                assert x == pytest.approx(y, abs=1e-6, rel=1e-9), (name, c, x, y)
        else:
            assert a.tolist() == b.tolist(), (name, c)


def _query_names():
    import __ray_entry__ as m

    return sorted(m.oracle_sql())


def _rows_only_names():
    import __ray_entry__ as m

    return sorted(set(m.queries()) - set(m.oracle_sql()))


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(name):
    import __ray_entry__ as m

    got = m.queries()[name](SF_DIR)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = _duck(m.oracle_sql()[name])
    _assert_equivalent(got, want, name)


@pytest.mark.parametrize("name", _rows_only_names())
def test_rows_only_queries_run(name):
    """Driver's weaker check for non-SQL-expressible ops: runs, returns
    rows with a stable schema, deterministic across two invocations."""
    import __ray_entry__ as m

    got1 = m.queries()[name](SF_DIR)
    got2 = m.queries()[name](SF_DIR)
    if not isinstance(got1, pd.DataFrame):
        got1, got2 = got1.to_pandas(), got2.to_pandas()
    assert len(got1) >= 0 and list(got1.columns)
    pd.testing.assert_frame_equal(
        _normalize(got1), _normalize(got2), check_exact=False, atol=1e-9
    )


def test_entry_contract():
    import __ray_entry__ as entry_mod

    result = entry_mod.entry()
    df = result if isinstance(result, pd.DataFrame) else result.to_pandas()
    assert len(df) >= 0
    assert "task_key" in df.columns and "status" in df.columns
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 14
