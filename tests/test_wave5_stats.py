"""Correlation matrix / revenue-weighted discount / IQR outlier gate:
null-injected parity vs DuckDB on all columns, plus fixtures proving
each op discriminates (heavy-tail outliers, size-correlated discounts,
anti-correlated columns)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from datapact_ray.pipelines.selection import (
    ORACLE_SQL as SEL_ORACLE,
    iqr_outliers_extendedprice,
)
from datapact_ray.pipelines.stats import (
    ORACLE_SQL as STATS_ORACLE,
    corr_matrix_lineitem,
    weighted_avg_discount_lineitem,
)


@pytest.fixture(scope="module")
def wdir(tmp_path_factory):
    """quantity/discount anti-correlated, big rows discount more (so
    wavg > avg), 2% far-outlier prices; NULLs sprayed over every
    column."""
    d = tmp_path_factory.mktemp("w5_sf")
    rng = np.random.default_rng(41)
    n = 5000
    qty = rng.integers(1, 51, n).astype("float64")
    price = np.round(rng.uniform(1000, 80000, n), 2)
    out = rng.random(n) < 0.02
    price[out] *= 40  # heavy tail
    price = np.round(price, 2)
    disc = np.round(np.clip(price / 4_000_000 + 0.01, 0, 0.10), 2)
    tax = np.round(0.08 - qty / 1000.0, 2)  # anti-correlated with qty
    li = pd.DataFrame(
        {
            "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n)],
            "l_quantity": qty,
            "l_extendedprice": price,
            "l_discount": disc,
            "l_tax": tax,
        }
    )
    for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"):
        li.loc[rng.random(n) < 0.07, c] = np.nan
    li.loc[rng.random(n) < 0.03, "l_returnflag"] = None
    li.to_parquet(d / "lineitem.parquet", row_group_size=512)
    return str(d)


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


def test_corr_matrix_parity_and_sign(wdir):
    got = corr_matrix_lineitem(wdir).reset_index(drop=True)
    want = _duck(STATS_ORACLE["corr_matrix_lineitem"], wdir).reset_index(
        drop=True
    )
    assert got[["col_x", "col_y"]].values.tolist() == want[
        ["col_x", "col_y"]
    ].values.tolist()
    assert got["n_pairs"].tolist() == want["n_pairs"].astype("int64").tolist()
    for x, y in zip(got["corr"], want["corr"]):
        assert float(x) == pytest.approx(float(y), abs=2e-6)
    m = got.set_index(["col_x", "col_y"])["corr"]
    assert m[("l_quantity", "l_tax")] < -0.9  # seeded anti-correlation
    assert m[("l_discount", "l_extendedprice")] > 0.5


def test_weighted_avg_discount_differs_from_plain(wdir):
    got = weighted_avg_discount_lineitem(wdir)
    want = _duck(STATS_ORACLE["weighted_avg_discount_lineitem"], wdir)
    assert int(got.loc[0, "n_rows"]) == int(want.loc[0, "n_rows"])
    assert int(got.loc[0, "weight_cents"]) == int(want.loc[0, "weight_cents"])
    assert float(got.loc[0, "wavg_discount"]) == float(
        want.loc[0, "wavg_discount"]
    )
    plain = _duck(
        "SELECT AVG(l_discount) a FROM lineitem "
        "WHERE l_extendedprice IS NOT NULL AND l_discount IS NOT NULL",
        wdir,
    ).loc[0, "a"]
    # big rows discount more: weighted sits ABOVE plain
    assert float(got.loc[0, "wavg_discount"]) > float(plain) + 0.002


def test_iqr_gate_parity_and_catches_tail(wdir):
    got = iqr_outliers_extendedprice(wdir).reset_index(drop=True)
    want = _duck(SEL_ORACLE["iqr_outliers_extendedprice"], wdir).reset_index(
        drop=True
    )
    assert got["l_returnflag"].tolist() == want["l_returnflag"].tolist()
    for c in ("n_rows", "n_outliers"):
        assert got[c].tolist() == want[c].astype("int64").tolist(), c
    for c in ("q1", "q3"):
        for x, y in zip(got[c], want[c]):
            assert float(x) == pytest.approx(float(y), abs=1e-9)
    assert int(got["n_outliers"].sum()) >= 50  # the seeded 2% tail
