"""Max drawdown, geometric mean, cosine range search: oracle parity
plus discrimination fixtures (a seeded revenue crash, lognormal skew
where geomean << mean, a planted near-duplicate cluster)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from datapact_ray.pipelines.ann import (
    ORACLE_SQL as ANN_ORACLE,
    ann_range_embeddings,
)
from datapact_ray.pipelines.stats import (
    ORACLE_SQL as STATS_ORACLE,
    geomean_price_returnflag,
)
from datapact_ray.pipelines.windows import (
    ORACLE_SQL as WIN_ORACLE,
    max_drawdown_daily_revenue,
)


def _duck(sql: str, d: str, tables) -> pd.DataFrame:
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{d}/{t}.parquet')"
        )
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


@pytest.fixture(scope="module")
def crash_dir(tmp_path_factory):
    """Daily revenue ramps 10 days to a peak, crashes 70% on day 11,
    recovers: the drawdown is the day-11 trough against the day-10
    peak."""
    d = tmp_path_factory.mktemp("crash")
    rng = np.random.default_rng(13)
    rows = []
    daily = list(range(1000, 11000, 1000)) + [3000, 5000, 8000, 12000]
    base = np.datetime64("2024-02-01")
    for i, level in enumerate(daily):
        k = max(2, level // 500)
        prices = np.round(rng.uniform(0.5, 1.5, k) * level / k, 2)
        rows.append(
            pd.DataFrame(
                {
                    "o_orderdate": np.full(
                        k, base + np.timedelta64(i, "D")
                    ),
                    "o_totalprice": prices,
                }
            )
        )
    df = pd.concat(rows, ignore_index=True)
    df.loc[rng.random(len(df)) < 0.02, "o_totalprice"] = np.nan
    df.to_parquet(d / "orders.parquet", row_group_size=128)
    return str(d)


def test_drawdown_parity_and_crash(crash_dir):
    got = max_drawdown_daily_revenue(crash_dir)
    want = _duck(
        WIN_ORACLE["max_drawdown_daily_revenue"], crash_dir, ("orders",)
    )
    for c in ("n_days", "peak_cents", "drawdown_cents"):
        assert int(got.loc[0, c]) == int(want.loc[0, c]), c
    for c in ("peak_day", "trough_day"):
        assert pd.Timestamp(got.loc[0, c]) == pd.Timestamp(want.loc[0, c]), c
    assert float(got.loc[0, "drawdown_pct"]) == float(
        want.loc[0, "drawdown_pct"]
    )
    # the seeded 70% crash: trough the day after the peak
    assert float(got.loc[0, "drawdown_pct"]) > 0.5
    assert pd.Timestamp(got.loc[0, "trough_day"]) - pd.Timestamp(
        got.loc[0, "peak_day"]
    ) == pd.Timedelta(days=1)


def test_drawdown_monotone_series_is_zero(tmp_path):
    df = pd.DataFrame(
        {
            "o_orderdate": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-03"]
            ),
            "o_totalprice": [10.0, 20.0, 30.0],
        }
    )
    df.to_parquet(tmp_path / "orders.parquet")
    got = max_drawdown_daily_revenue(str(tmp_path))
    want = _duck(
        WIN_ORACLE["max_drawdown_daily_revenue"], str(tmp_path), ("orders",)
    )
    assert int(got.loc[0, "drawdown_cents"]) == 0
    assert int(want.loc[0, "drawdown_cents"]) == 0
    # dd ties resolve to the EARLIEST day on both engines
    assert pd.Timestamp(got.loc[0, "trough_day"]) == pd.Timestamp(
        want.loc[0, "trough_day"]
    ) == pd.Timestamp("2024-01-01")


def test_geomean_parity_and_skew(tmp_path):
    rng = np.random.default_rng(19)
    n = 5000
    price = np.round(np.exp(rng.normal(7.0, 1.5, n)), 2)  # lognormal
    df = pd.DataFrame(
        {
            "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n)],
            "l_extendedprice": np.clip(price, 0.01, None),
        }
    )
    df.loc[rng.random(n) < 0.05, "l_extendedprice"] = np.nan
    df.to_parquet(tmp_path / "lineitem.parquet", row_group_size=512)
    got = geomean_price_returnflag(str(tmp_path))
    want = _duck(
        STATS_ORACLE["geomean_price_returnflag"], str(tmp_path), ("lineitem",)
    )
    assert got["l_returnflag"].tolist() == want["l_returnflag"].tolist()
    assert got["n"].tolist() == want["n"].astype("int64").tolist()
    for x, y in zip(got["geomean_price"], want["geomean_price"]):
        assert float(x) == pytest.approx(float(y), abs=1e-4)
    plain = _duck(
        "SELECT AVG(l_extendedprice) a FROM lineitem "
        "WHERE l_extendedprice IS NOT NULL",
        str(tmp_path),
        ("lineitem",),
    ).loc[0, "a"]
    # lognormal: arithmetic mean = geomean·exp(σ²/2) ≈ 3× geomean
    assert float(plain) > 2.0 * float(got["geomean_price"].mean())


@pytest.fixture(scope="module")
def cluster_dir(tmp_path_factory):
    """vec_id 0 is the query; ids 1-25 are tiny perturbations of it
    (cos ≈ 1), the rest random (cos ≈ 0 in 32-d)."""
    d = tmp_path_factory.mktemp("rng")
    rng = np.random.default_rng(29)
    q = rng.normal(0, 1, 32)
    near = q[None, :] + rng.normal(0, 0.05, (25, 32))
    rest = rng.normal(0, 1, (974, 32))
    m = np.vstack([q[None, :], near, rest]).astype(np.float32)
    pd.DataFrame(
        {"vec_id": np.arange(1000, dtype="int64"), "embedding": list(m)}
    ).to_parquet(d / "embeddings.parquet", row_group_size=128)
    return str(d)


def test_ann_range_parity_and_cluster(cluster_dir):
    got = ann_range_embeddings(cluster_dir)
    want = _duck(
        ANN_ORACLE["ann_range_embeddings"], cluster_dir, ("embeddings",)
    )
    assert int(got.loc[0, "n_matches"]) == int(want.loc[0, "n_matches"])
    for c in ("max_cos", "min_cos"):
        assert float(got.loc[0, c]) == float(want.loc[0, c]), c
    # the planted cluster is found; random 32-d vectors almost never
    # clear cos >= 0.25, so the count is dominated by the 25 plants
    assert int(got.loc[0, "n_matches"]) >= 25
    assert float(got.loc[0, "max_cos"]) > 0.95


def test_ann_range_no_matches(cluster_dir):
    got = ann_range_embeddings(cluster_dir, tau=1.1)  # impossible radius
    assert int(got.loc[0, "n_matches"]) == 0
    assert got["max_cos"].isna().all()
