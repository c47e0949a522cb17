"""Trimmed mean / one-way ANOVA / CUSUM changepoint: null-injected
parity vs DuckDB on all columns, plus fixtures proving each op
discriminates (heavy-tail robustness, seeded group effect, seeded level
shift at a known day)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from datapact_ray.pipelines.selection import (
    ORACLE_SQL as SEL_ORACLE,
    trimmed_mean_extendedprice,
)
from datapact_ray.pipelines.stats import (
    ORACLE_SQL as STATS_ORACLE,
    anova_price_returnflag,
    cusum_changepoint_events,
)


@pytest.fixture(scope="module")
def wdir(tmp_path_factory):
    """Prices: group 'R' shifted +30% (a real group effect for ANOVA),
    2% far-outlier rows (trimmed mean robustness); NULL spray; events
    with a 3x level shift after day 15 (CUSUM changepoint)."""
    d = tmp_path_factory.mktemp("w6_sf")
    rng = np.random.default_rng(42)
    n = 6000
    flag = np.array(["A", "N", "R"])[rng.integers(0, 3, n)]
    price = np.round(rng.uniform(1000, 50000, n), 2)
    price[flag == "R"] *= 2.0  # seeded group effect
    out = rng.random(n) < 0.02
    price[out] *= 50  # heavy tail: drags the plain mean, not the trimmed
    price = np.round(price, 2)
    li = pd.DataFrame({"l_returnflag": flag, "l_extendedprice": price})
    li.loc[rng.random(n) < 0.07, "l_extendedprice"] = np.nan
    li.loc[rng.random(n) < 0.03, "l_returnflag"] = None
    li.to_parquet(d / "lineitem.parquet", row_group_size=512)

    # 30 days; days 1-15 ~ 40 events/day, days 16-30 ~ 120/day
    days, rates = np.arange(30), np.where(np.arange(30) < 15, 40, 120)
    cnt = rng.poisson(rates)
    day_us = np.repeat(
        np.datetime64("2024-03-01", "us")
        + days.astype("timedelta64[D]").astype("timedelta64[us]"),
        cnt,
    )
    jitter = rng.integers(0, 86_400_000_000, len(day_us))
    ev = pd.DataFrame({"ts": day_us + jitter.astype("timedelta64[us]")})
    ev.loc[rng.random(len(ev)) < 0.02, "ts"] = pd.NaT
    ev.to_parquet(d / "events.parquet", row_group_size=512)
    return str(d)


def _duck(sql: str, d: str, tables=("lineitem", "events")) -> pd.DataFrame:
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


def test_trimmed_mean_parity_and_robustness(wdir):
    got = trimmed_mean_extendedprice(wdir)
    want = _duck(SEL_ORACLE["trimmed_mean_extendedprice"], wdir)
    for c in ("n_rows", "n_kept", "trimmed_sum_cents"):
        assert int(got.loc[0, c]) == int(want.loc[0, c]), c
    assert float(got.loc[0, "trimmed_mean"]) == float(
        want.loc[0, "trimmed_mean"]
    )
    plain = _duck(
        "SELECT AVG(l_extendedprice) a FROM lineitem "
        "WHERE l_extendedprice IS NOT NULL",
        wdir,
    ).loc[0, "a"]
    # the 2% x50 tail drags the plain mean far above the trimmed one
    assert float(plain) > float(got.loc[0, "trimmed_mean"]) * 1.5


def test_trimmed_mean_small_n_edges(tmp_path):
    """n < denom (k = 0: trimmed == plain mean) and a tie-heavy column
    (boundary values duplicated across the cut)."""
    for vals in ([11.0, 22.0, 33.0], [5.0] * 40 + [9.0] * 60):
        d = tmp_path / f"t{len(vals)}"
        d.mkdir()
        pd.DataFrame({"l_extendedprice": vals}).to_parquet(
            d / "lineitem.parquet", row_group_size=16
        )
        got = trimmed_mean_extendedprice(str(d))
        want = _duck(
            SEL_ORACLE["trimmed_mean_extendedprice"], str(d), ("lineitem",)
        )
        assert int(got.loc[0, "n_kept"]) == int(want.loc[0, "n_kept"])
        assert int(got.loc[0, "trimmed_sum_cents"]) == int(
            want.loc[0, "trimmed_sum_cents"]
        )
        assert float(got.loc[0, "trimmed_mean"]) == float(
            want.loc[0, "trimmed_mean"]
        )


def test_anova_parity_and_group_effect(wdir):
    got = anova_price_returnflag(wdir)
    want = _duck(STATS_ORACLE["anova_price_returnflag"], wdir)
    assert int(got.loc[0, "n_rows"]) == int(want.loc[0, "n_rows"])
    assert int(got.loc[0, "n_groups"]) == int(want.loc[0, "n_groups"])
    assert float(got.loc[0, "f_stat"]) == float(want.loc[0, "f_stat"])
    assert float(got.loc[0, "eta_sq"]) == float(want.loc[0, "eta_sq"])
    # the 2x shift on 'R' is a strong effect even under the tail noise
    assert float(got.loc[0, "f_stat"]) > 10.0


def test_anova_near_one_without_effect(tmp_path):
    """Identical group distributions: F stays small (no effect), still
    oracle-exact."""
    rng = np.random.default_rng(7)
    n = 3000
    df = pd.DataFrame(
        {
            "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n)],
            "l_extendedprice": np.round(rng.uniform(1000, 50000, n), 2),
        }
    )
    df.to_parquet(tmp_path / "lineitem.parquet", row_group_size=512)
    got = anova_price_returnflag(str(tmp_path))
    want = _duck(
        STATS_ORACLE["anova_price_returnflag"], str(tmp_path), ("lineitem",)
    )
    assert float(got.loc[0, "f_stat"]) == float(want.loc[0, "f_stat"])
    assert float(got.loc[0, "f_stat"]) < 5.0
    assert float(got.loc[0, "eta_sq"]) < 0.01


def test_cusum_finds_seeded_shift(wdir):
    got = cusum_changepoint_events(wdir)
    want = _duck(STATS_ORACLE["cusum_changepoint_events"], wdir)
    assert int(got.loc[0, "n_days"]) == int(want.loc[0, "n_days"])
    assert pd.Timestamp(got.loc[0, "cp_day"]) == pd.Timestamp(
        want.loc[0, "cp_day"]
    )
    for c in ("cusum_max", "mean_before", "mean_after"):
        assert float(got.loc[0, c]) == float(want.loc[0, c]), c
    # the seeded shift is after day index 14 → changepoint on day 15
    assert pd.Timestamp(got.loc[0, "cp_day"]) == pd.Timestamp("2024-03-15")
    assert float(got.loc[0, "mean_after"]) > float(
        got.loc[0, "mean_before"]
    ) * 2.0


def test_cusum_single_day_is_empty(tmp_path):
    pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-01 03:00:00"] * 5)}
    ).to_parquet(tmp_path / "events.parquet")
    got = cusum_changepoint_events(str(tmp_path))
    want = _duck(
        STATS_ORACLE["cusum_changepoint_events"], str(tmp_path), ("events",)
    )
    assert len(got) == 0 and len(want) == 0
