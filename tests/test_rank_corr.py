"""Spearman / Kendall rank correlation via bounded-vocabulary
contingency algebra: oracle parity under NULL spray, monotone-nonlinear
discrimination (rank corr ≈ 1 where Pearson < 1), independence ≈ 0,
and constant-column edges."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from datapact_ray.pipelines.stats import (
    ORACLE_SQL as STATS_ORACLE,
    kendall_qty_discount,
    spearman_qty_discount,
)


def _duck(sql: str, d: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{d}/lineitem.parquet')"
    )
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _write(tmp, qty, disc, nulls=True, seed=9):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {"l_quantity": qty.astype("float64"), "l_discount": disc}
    )
    if nulls:
        df.loc[rng.random(len(df)) < 0.05, "l_quantity"] = np.nan
        df.loc[rng.random(len(df)) < 0.05, "l_discount"] = np.nan
    df.to_parquet(tmp / "lineitem.parquet", row_group_size=512)
    return str(tmp)


@pytest.fixture(scope="module")
def mono_dir(tmp_path_factory):
    """discount = convex monotone function of quantity: rank correlation
    sees a perfect monotone tie-heavy relation Pearson understates."""
    d = tmp_path_factory.mktemp("mono")
    rng = np.random.default_rng(31)
    qty = rng.integers(1, 51, 5000)
    disc = np.round(np.floor(qty * qty / 250.0) / 100.0, 2)
    return _write(d, qty, disc)


@pytest.fixture(scope="module")
def indep_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("indep")
    rng = np.random.default_rng(32)
    qty = rng.integers(1, 51, 5000)
    disc = np.round(rng.integers(0, 11, 5000) / 100.0, 2)
    return _write(d, qty, disc)


def test_spearman_parity_and_monotone(mono_dir):
    got = spearman_qty_discount(mono_dir)
    want = _duck(STATS_ORACLE["spearman_qty_discount"], mono_dir)
    assert int(got.loc[0, "n_rows"]) == int(want.loc[0, "n_rows"])
    assert float(got.loc[0, "spearman_rho"]) == float(
        want.loc[0, "spearman_rho"]
    )
    assert float(got.loc[0, "spearman_rho"]) > 0.95
    # Pearson on the raw values understates the monotone relation
    pearson = _duck(
        "SELECT CORR(l_quantity, l_discount) r FROM lineitem", mono_dir
    ).loc[0, "r"]
    assert float(pearson) < float(got.loc[0, "spearman_rho"])


def test_kendall_parity_and_monotone(mono_dir):
    got = kendall_qty_discount(mono_dir)
    want = _duck(STATS_ORACLE["kendall_qty_discount"], mono_dir)
    for c in ("n_rows", "concordant", "discordant"):
        assert int(got.loc[0, c]) == int(want.loc[0, c]), c
    assert float(got.loc[0, "kendall_tau"]) == float(
        want.loc[0, "kendall_tau"]
    )
    assert float(got.loc[0, "kendall_tau"]) > 0.9
    assert int(got.loc[0, "discordant"]) == 0  # perfectly monotone


def test_rank_corr_independence_near_zero(indep_dir):
    s = spearman_qty_discount(indep_dir)
    k = kendall_qty_discount(indep_dir)
    sw = _duck(STATS_ORACLE["spearman_qty_discount"], indep_dir)
    kw = _duck(STATS_ORACLE["kendall_qty_discount"], indep_dir)
    assert float(s.loc[0, "spearman_rho"]) == float(
        sw.loc[0, "spearman_rho"]
    )
    assert float(k.loc[0, "kendall_tau"]) == float(kw.loc[0, "kendall_tau"])
    assert abs(float(s.loc[0, "spearman_rho"])) < 0.05
    assert abs(float(k.loc[0, "kendall_tau"])) < 0.05


def test_rank_corr_constant_column_empty(tmp_path):
    qty = np.full(200, 7)
    disc = np.round(np.random.default_rng(2).integers(0, 11, 200) / 100.0, 2)
    d = _write(tmp_path, qty, disc, nulls=False)
    s, k = spearman_qty_discount(d), kendall_qty_discount(d)
    sw = _duck(STATS_ORACLE["spearman_qty_discount"], d)
    kw = _duck(STATS_ORACLE["kendall_qty_discount"], d)
    assert len(s) == 0 and len(sw) == 0
    assert len(k) == 0 and len(kw) == 0
