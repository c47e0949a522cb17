"""Chained two-hop star join (revenue_per_nation) vs DuckDB on a
null-injected fixture, plus partition-count invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from datapact_ray.pipelines.relational import revenue_per_nation


@pytest.fixture(scope="module")
def star_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("star")
    rng = np.random.default_rng(41)
    n_nat, n_cust, n_ord, n_li = 6, 300, 2000, 8000
    pd.DataFrame(
        {
            "n_nationkey": np.arange(n_nat, dtype="int32"),
            "n_name": [f"NATION_{chr(65 + i)}" for i in range(n_nat)],
        }
    ).to_parquet(d / "nation.parquet")
    pd.DataFrame(
        {
            "c_custkey": np.arange(n_cust, dtype="int64"),
            "c_nationkey": rng.integers(0, n_nat, n_cust).astype("int32"),
        }
    ).to_parquet(d / "customer.parquet", row_group_size=64)
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n_ord, dtype="int64"),
            # some orders point at customers that don't exist (dropped by
            # the inner join) and some custkeys are NULL
            "o_custkey": rng.integers(0, n_cust + 40, n_ord).astype("float64"),
        }
    )
    orders.loc[rng.random(n_ord) < 0.05, "o_custkey"] = np.nan
    orders.to_parquet(d / "orders.parquet", row_group_size=256)
    li = pd.DataFrame(
        {
            # some orderkeys dangle (no matching order) — inner join drops
            "l_orderkey": rng.integers(0, n_ord + 200, n_li).astype("int64"),
            "l_extendedprice": np.round(rng.uniform(100, 90000, n_li), 2),
            "l_discount": np.round(rng.uniform(0.0, 0.1, n_li), 2),
        }
    )
    li.loc[rng.random(n_li) < 0.05, "l_extendedprice"] = np.nan
    li.loc[rng.random(n_li) < 0.05, "l_discount"] = np.nan
    li.to_parquet(d / "lineitem.parquet", row_group_size=512)
    return str(d)


def _oracle(d: str) -> pd.DataFrame:
    import __ray_entry__ as m

    con = duckdb.connect()
    for t in ("nation", "customer", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    try:
        return con.execute(m.oracle_sql()["revenue_per_nation"]).fetchdf()
    finally:
        con.close()


def test_star_join_matches_duckdb(star_dir):
    got = revenue_per_nation(star_dir).reset_index(drop=True)
    want = _oracle(star_dir).reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9)


def test_star_join_bucket_invariance(star_dir):
    a = revenue_per_nation(star_dir, num_buckets=3, num_buckets2=2)
    b = revenue_per_nation(star_dir, num_buckets=11, num_buckets2=7)
    pd.testing.assert_frame_equal(a, b)
