"""Per-dim ANOVA on embeddings, EWMA smoother, two-period rate test:
oracle parity plus fixtures proving discrimination (one seeded
discriminative dimension among noise; a level step the smoother lags;
a doubled second-half rate)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from datapact_ray.pipelines.ann import (
    ORACLE_SQL as ANN_ORACLE,
    dim_anova_embeddings,
)
from datapact_ray.pipelines.stats import (
    ORACLE_SQL as STATS_ORACLE,
    ewma_daily_events,
    rate_ratio_events,
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
def emb_dir(tmp_path_factory):
    """4-dim embeddings over 3 labels: dim 1 mean = 2·label (strongly
    discriminative), dims 2-4 pure noise; NULL labels/vectors sprayed."""
    d = tmp_path_factory.mktemp("dimanova")
    rng = np.random.default_rng(17)
    n = 3000
    label = rng.integers(0, 3, n)
    m = rng.normal(0.0, 1.0, (n, 4)).astype(np.float64)
    m[:, 0] += 2.0 * label
    df = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype="int64"),
            "embedding": list(m.astype(np.float32)),
            "label": label.astype("int32"),
        }
    )
    df["label"] = df["label"].astype("Int32")
    df.loc[rng.random(n) < 0.04, "label"] = pd.NA
    df.loc[rng.random(n) < 0.04, "embedding"] = None
    df.to_parquet(d / "embeddings.parquet", row_group_size=512)
    return str(d)


def test_dim_anova_parity_and_discriminative_dim(emb_dir):
    got = dim_anova_embeddings(emb_dir)
    want = _duck(
        ANN_ORACLE["dim_anova_embeddings"], emb_dir, ("embeddings",)
    )
    assert got["i"].tolist() == want["i"].astype("int64").tolist()
    assert got["n"].tolist() == want["n"].astype("int64").tolist()
    for c in ("f_stat", "eta_sq"):
        for x, y in zip(got[c], want[c]):
            assert float(x) == pytest.approx(float(y), abs=2e-5), c
    f = got.set_index("i")["f_stat"]
    assert f[1] > 100.0  # the seeded discriminative dimension
    assert all(f[i] < 10.0 for i in (2, 3, 4))  # noise dims


def test_dim_anova_single_label_is_null(tmp_path):
    m = np.random.default_rng(1).normal(0, 1, (50, 3)).astype(np.float32)
    pd.DataFrame(
        {
            "vec_id": np.arange(50, dtype="int64"),
            "embedding": list(m),
            "label": np.zeros(50, dtype="int32"),
        }
    ).to_parquet(tmp_path / "embeddings.parquet")
    got = dim_anova_embeddings(str(tmp_path))
    want = _duck(
        ANN_ORACLE["dim_anova_embeddings"], str(tmp_path), ("embeddings",)
    )
    assert got["f_stat"].isna().all() and want["f_stat"].isna().all()
    assert got["n_labels"].tolist() == [1, 1, 1]


@pytest.fixture(scope="module")
def ev_dir(tmp_path_factory):
    """20 observed days with calendar holes; rate doubles after the
    midpoint of the span."""
    d = tmp_path_factory.mktemp("ewma")
    rng = np.random.default_rng(23)
    base = np.datetime64("2024-05-01", "us")
    rows = []
    for day in range(24):
        if day in (3, 11, 17, 20):  # calendar holes
            continue
        rate = 20 if day < 12 else 40
        k = rng.poisson(rate)
        rows.append(
            base
            + np.timedelta64(day, "D").astype("timedelta64[us]")
            + rng.integers(0, 86_400_000_000, k).astype("timedelta64[us]")
        )
    ev = pd.DataFrame({"ts": np.concatenate(rows)})
    ev.loc[rng.random(len(ev)) < 0.02, "ts"] = pd.NaT
    ev.to_parquet(d / "events.parquet", row_group_size=256)
    return str(d)


def test_ewma_parity_and_lag(ev_dir):
    got = ewma_daily_events(ev_dir)
    want = _duck(STATS_ORACLE["ewma_daily_events"], ev_dir, ("events",))
    assert got["k"].tolist() == want["k"].astype("int64").tolist()
    assert got["c"].tolist() == want["c"].astype("int64").tolist()
    assert (
        pd.to_datetime(got["day"]).tolist()
        == pd.to_datetime(want["day"]).tolist()
    )
    for x, y in zip(got["ewma"], want["ewma"]):
        assert float(x) == float(y)
    # smoother lags the step: on the first doubled day, ewma < raw count
    step = got[got["c"] > 30].iloc[0]
    assert float(step["ewma"]) < float(step["c"])
    # and converges toward the new level by the last day
    assert float(got.iloc[-1]["ewma"]) > 30.0


def test_rate_ratio_detects_doubling(ev_dir):
    got = rate_ratio_events(ev_dir)
    want = _duck(STATS_ORACLE["rate_ratio_events"], ev_dir, ("events",))
    for c in ("n1", "n2", "days1", "days2"):
        assert int(got.loc[0, c]) == int(want.loc[0, c]), c
    for c in ("rate1", "rate2", "rate_ratio", "z"):
        assert float(got.loc[0, c]) == float(want.loc[0, c]), c
    assert float(got.loc[0, "rate_ratio"]) < 0.75  # second half ~2x rate
    assert float(got.loc[0, "z"]) < -3.0


def test_rate_ratio_single_day_empty(tmp_path):
    pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-01 01:00:00"] * 7)}
    ).to_parquet(tmp_path / "events.parquet")
    got = rate_ratio_events(str(tmp_path))
    want = _duck(
        STATS_ORACLE["rate_ratio_events"], str(tmp_path), ("events",)
    )
    assert len(got) == 0 and len(want) == 0
