"""Distributed k-th-order-statistic selection: exactness under
adversarial shapes — heavy duplicates (range collapses to one float),
skewed distributions, tiny collect caps forcing deep refinement."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from datapact_ray.pipelines.selection import (
    _rank_values,
    exact_quantile_extendedprice,
)


@pytest.fixture(scope="module")
def skewed_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("skewed")
    rng = np.random.default_rng(23)
    # group a: lognormal (long tail); group b: 90% one duplicate value;
    # group c: two distinct values only
    va = rng.lognormal(3, 2, 4001)
    vb = np.where(rng.random(3000) < 0.9, 42.125, rng.uniform(0, 100, 3000))
    vc = np.where(rng.random(500) < 0.5, 1.5, 2.5)
    df = pd.DataFrame(
        {
            "grp": ["a"] * len(va) + ["b"] * len(vb) + ["c"] * len(vc),
            "val": np.concatenate([va, vb, vc]),
        }
    )
    df = df.sample(frac=1, random_state=7).reset_index(drop=True)
    df.to_parquet(d / "t.parquet", row_group_size=512)
    return str(d), df


@pytest.mark.parametrize("cap,bins", [(100_000, 1024), (64, 8)])
def test_rank_values_exact(skewed_dir, cap, bins):
    d, df = skewed_dir
    want_ranks = {"a": [0, 2000, 4000], "b": [1500, 2999], "c": [0, 249, 499]}
    vals, counts = _rank_values(
        f"{d}/t.parquet",
        "grp",
        "val",
        lambda c: want_ranks,
        n_bins=bins,
        collect_cap=cap,
    )
    for grp, ranks in want_ranks.items():
        sorted_vals = np.sort(df.loc[df["grp"] == grp, "val"].to_numpy())
        assert counts[grp] == len(sorted_vals)
        for r in ranks:
            assert vals[grp][r] == sorted_vals[r], (grp, r, cap, bins)


def test_exact_quantile_matches_duckdb(tmp_path):
    rng = np.random.default_rng(5)
    n = 20_000
    df = pd.DataFrame(
        {
            "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n)],
            "l_extendedprice": np.round(rng.lognormal(8, 1.5, n), 2),
        }
    )
    df.to_parquet(tmp_path / "lineitem.parquet", row_group_size=1024)
    got = exact_quantile_extendedprice(str(tmp_path))
    want = duckdb.sql(
        f"""
        SELECT l_returnflag,
               ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS median_price
        FROM read_parquet('{tmp_path}/lineitem.parquet')
        GROUP BY l_returnflag ORDER BY l_returnflag
        """
    ).fetchdf()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
