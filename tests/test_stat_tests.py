"""Two-sample tests + inequality indexes (stats.py wave): seeded
location-shift / whale fixtures prove discrimination, NULL rows follow
SQL semantics, range/bucket geometry doesn't change results. Testdata's
R and A prices are identically distributed, so without these fixtures a
sign bug in the shift direction would be invisible."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from datapact_ray.pipelines.stats import (
    ORACLE_SQL,
    mannwhitney_price_returnflag,
    theil_revenue_customers,
    welch_ttest_price_returnflag,
)


@pytest.fixture(scope="module")
def shift_dir(tmp_path_factory):
    """R prices sit ~40% above A prices; NULL flag/price rows are
    noise both engines must drop. Orders: one whale customer holds
    ~90% of revenue."""
    d = tmp_path_factory.mktemp("shift_sf")
    rng = np.random.default_rng(23)
    n = 4000
    flag = np.where(rng.random(n) < 0.5, "R", "A")
    price = np.round(rng.uniform(1000, 50000, n), 2)
    price[flag == "R"] *= 1.4
    price = np.round(price, 2)
    li = pd.DataFrame(
        {"l_returnflag": flag, "l_extendedprice": price}
    )
    li.loc[rng.random(n) < 0.05, "l_extendedprice"] = np.nan
    li.loc[rng.random(n) < 0.05, "l_returnflag"] = None
    li.to_parquet(d / "lineitem.parquet", row_group_size=256)

    m = 500
    orders = pd.DataFrame(
        {
            "o_custkey": rng.integers(0, 50, m).astype("int64"),
            "o_totalprice": np.round(rng.uniform(100, 5000, m), 2),
        }
    )
    orders.loc[0, "o_custkey"] = 999
    orders.loc[0, "o_totalprice"] = 2_000_000.0
    orders.loc[rng.random(m) < 0.05, "o_totalprice"] = np.nan
    orders.to_parquet(d / "orders.parquet", row_group_size=64)
    return str(d)


@pytest.fixture(scope="module")
def flat_dir(tmp_path_factory):
    """Identical R/A distributions (paired copies) and perfectly equal
    customer revenues: t ≈ 0, AUC = 0.5 exactly, Theil = 0 exactly."""
    d = tmp_path_factory.mktemp("flat_sf")
    rng = np.random.default_rng(5)
    price = np.round(rng.uniform(1000, 50000, 1500), 2)
    li = pd.DataFrame(
        {
            "l_returnflag": ["R"] * 1500 + ["A"] * 1500,
            "l_extendedprice": np.r_[price, price],
        }
    )
    li.to_parquet(d / "lineitem.parquet", row_group_size=256)
    orders = pd.DataFrame(
        {
            "o_custkey": np.arange(200, dtype="int64"),
            "o_totalprice": np.full(200, 1234.56),
        }
    )
    orders.to_parquet(d / "orders.parquet", row_group_size=64)
    return str(d)


def _duck(sql: str, d: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _check(fn, name, d, **kw) -> pd.DataFrame:
    got = fn(d, **kw).reset_index(drop=True)
    want = _duck(ORACLE_SQL[name], d).reset_index(drop=True)
    for c in got.columns:
        a = pd.to_numeric(got[c], errors="coerce").astype("float64")
        b = pd.to_numeric(want[c.lower()], errors="coerce").astype("float64")
        assert len(a) == len(b), (name, c)
        for x, y in zip(a, b):
            if np.isnan(x) and np.isnan(y):
                continue
            assert x == pytest.approx(y, abs=1e-9, rel=1e-12), (name, c, x, y)
    return got


def test_welch_detects_shift_and_null_parity(shift_dir):
    got = _check(
        welch_ttest_price_returnflag, "welch_ttest_price_returnflag", shift_dir
    )
    assert got.loc[0, "t_stat"] > 10  # R sits far above A
    assert got.loc[0, "mean_r"] > got.loc[0, "mean_a"]


def test_welch_null_on_identical(flat_dir):
    got = _check(
        welch_ttest_price_returnflag, "welch_ttest_price_returnflag", flat_dir
    )
    assert got.loc[0, "t_stat"] == 0.0  # paired copies: exact zero


def test_mannwhitney_detects_shift(shift_dir):
    got = _check(
        mannwhitney_price_returnflag,
        "mannwhitney_price_returnflag",
        shift_dir,
    )
    assert got.loc[0, "auc_r"] > 0.6  # P(R > A) well above chance
    assert got.loc[0, "z"] > 10


def test_mannwhitney_exact_half_on_identical(flat_dir):
    got = _check(
        mannwhitney_price_returnflag, "mannwhitney_price_returnflag", flat_dir
    )
    assert got.loc[0, "auc_r"] == 0.5  # exact integer identity, no FP


def test_mannwhitney_range_geometry_invariant(shift_dir):
    a = mannwhitney_price_returnflag(shift_dir, num_buckets=2)
    b = mannwhitney_price_returnflag(shift_dir, num_buckets=29)
    assert int(a.loc[0, "r2_r"]) == int(b.loc[0, "r2_r"])
    assert int(a.loc[0, "tie_term"]) == int(b.loc[0, "tie_term"])


def test_theil_whale_vs_flat(shift_dir, flat_dir):
    whale = _check(
        theil_revenue_customers, "theil_revenue_customers", shift_dir
    )
    flat = _check(theil_revenue_customers, "theil_revenue_customers", flat_dir)
    assert whale.loc[0, "theil_t"] > 1.0  # one customer holds ~90%
    assert flat.loc[0, "theil_t"] == 0.0  # equal shares: exact zero


def test_theil_bucket_invariance(shift_dir):
    a = theil_revenue_customers(shift_dir, num_buckets=3)
    b = theil_revenue_customers(shift_dir, num_buckets=19)
    assert a.loc[0, "theil_t"] == b.loc[0, "theil_t"]
    assert int(a.loc[0, "total_cents"]) == int(b.loc[0, "total_cents"])
