"""Cross-table daily correlation: oracle parity, and discrimination —
shipment volume proportional to order volume scores near 1, while an
independent shipment calendar scores near 0."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from datapact_ray.pipelines.stats import (
    ORACLE_SQL as STATS_ORACLE,
    corr_orders_shipments_daily,
)


def _duck(sql: str, d: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{d}/{t}.parquet')"
        )
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _write(tmp, coupled: bool, seed: int) -> str:
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-06-01")
    o_rows, l_rows = [], []
    for day in range(60):
        n_orders = int(rng.integers(5, 100))
        o_rows.append(
            np.full(n_orders, base + np.timedelta64(day, "D"))
        )
        n_ship = (
            n_orders * 3 + int(rng.integers(0, 5))
            if coupled
            else int(rng.integers(5, 300))
        )
        l_rows.append(np.full(n_ship, base + np.timedelta64(day, "D")))
    pd.DataFrame({"o_orderdate": np.concatenate(o_rows)}).to_parquet(
        tmp / "orders.parquet", row_group_size=512
    )
    pd.DataFrame({"l_shipdate": np.concatenate(l_rows)}).to_parquet(
        tmp / "lineitem.parquet", row_group_size=512
    )
    return str(tmp)


def test_coupled_volumes_score_high(tmp_path):
    d = _write(tmp_path, coupled=True, seed=3)
    got = corr_orders_shipments_daily(d)
    want = _duck(STATS_ORACLE["corr_orders_shipments_daily"], d)
    assert int(got.loc[0, "n_days"]) == int(want.loc[0, "n_days"]) == 60
    assert float(got.loc[0, "corr_daily"]) == float(want.loc[0, "corr_daily"])
    assert float(got.loc[0, "corr_daily"]) > 0.99


def test_independent_volumes_score_low(tmp_path):
    d = _write(tmp_path, coupled=False, seed=4)
    got = corr_orders_shipments_daily(d)
    want = _duck(STATS_ORACLE["corr_orders_shipments_daily"], d)
    assert float(got.loc[0, "corr_daily"]) == float(want.loc[0, "corr_daily"])
    assert abs(float(got.loc[0, "corr_daily"])) < 0.3
