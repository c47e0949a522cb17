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
