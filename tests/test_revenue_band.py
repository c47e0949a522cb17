"""Exact quantile band over a DERIVED expression (discounted revenue):
oracle parity under NULL spray, and the derived tree matters — the band
of price·(1−disc) differs from the price band when discounts correlate
with size."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from datapact_ray.pipelines.selection import (
    ORACLE_SQL as SEL_ORACLE,
    revenue_band_lineitem,
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


def test_revenue_band_parity_and_discount_effect(tmp_path):
    rng = np.random.default_rng(37)
    n = 6000
    price = np.round(rng.uniform(1000, 80000, n), 2)
    # big rows discount heavily: the revenue p90 compresses vs price p90
    disc = np.round(np.clip(price / 200_000, 0, 0.4), 2)
    df = pd.DataFrame({"l_extendedprice": price, "l_discount": disc})
    df.loc[rng.random(n) < 0.06, "l_extendedprice"] = np.nan
    df.loc[rng.random(n) < 0.06, "l_discount"] = np.nan
    df.to_parquet(tmp_path / "lineitem.parquet", row_group_size=512)

    got = revenue_band_lineitem(str(tmp_path))
    want = _duck(SEL_ORACLE["revenue_band_lineitem"], str(tmp_path))
    assert int(got.loc[0, "n_rows"]) == int(want.loc[0, "n_rows"])
    for c in ("p10_rev", "p50_rev", "p90_rev"):
        assert float(got.loc[0, c]) == float(want.loc[0, c]), c

    price_p90 = _duck(
        "SELECT quantile_disc(l_extendedprice, 0.9) p FROM lineitem "
        "WHERE l_extendedprice IS NOT NULL AND l_discount IS NOT NULL",
        str(tmp_path),
    ).loc[0, "p"]
    # size-correlated discounts: revenue p90 sits well below price p90
    assert float(got.loc[0, "p90_rev"]) < 0.85 * float(price_p90)


def test_revenue_band_tiny_and_tied(tmp_path):
    df = pd.DataFrame(
        {
            "l_extendedprice": [100.0] * 10 + [200.0] * 10,
            "l_discount": [0.1] * 20,
        }
    )
    df.to_parquet(tmp_path / "lineitem.parquet")
    got = revenue_band_lineitem(str(tmp_path))
    want = _duck(SEL_ORACLE["revenue_band_lineitem"], str(tmp_path))
    for c in ("n_rows", "p10_rev", "p50_rev", "p90_rev"):
        assert float(got.loc[0, c]) == float(want.loc[0, c]), c
    assert float(got.loc[0, "p10_rev"]) == 90.0
    assert float(got.loc[0, "p90_rev"]) == 180.0
