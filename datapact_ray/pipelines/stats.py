"""Distributed statistical aggregates beyond SUM/AVG/MIN/MAX.

The reference's aggregate family stops at the SQL basics
(``validation.sql.j2:42-46``); a training-data pipeline also needs
second-moment statistics (variance / correlation for feature drift and
outlier gating) and distribution shapes (histograms). Everything here is
one-pass (or one pass per phase) with *mergeable* fixed-width partials:

* **Centered co-moments** — each map task computes its batch's count,
  means and centered sums (numpy pairwise summation), merged on the
  driver with Chan et al.'s parallel update. Unlike the naive
  ``E[xy] - E[x]E[y]`` form, no catastrophic cancellation: partials are
  exact to ~1 ulp of the centered quantities, so the merged result
  agrees with DuckDB's streaming aggregates to ~1e-12 relative.
* **Histogram** — a pure projection (``floor(x / width)``) followed by a
  per-batch ``bincount``; the exchange carries one row per (bucket) per
  task.
* **Z-score outlier gate** — phase 1 computes per-group mean/stddev from
  the co-moment partials; phase 2 broadcasts the tiny (group → stats)
  map and counts threshold breaches vectorized. The second scan is
  inherent: a z-score needs the global moments before it can test rows.
* **User-set overlap** — distinct (user, event_type) incidence per
  hash bucket, pairwise intersections via one boolean matmul per bucket;
  the driver sums the ≤ |types|² count matrix. Exact Jaccard between
  behavioural cohorts without materializing any user set.

All exchanges are fixed-width numeric rows ∝ n_groups × n_tasks — never
data-sized.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from ..io import count_rows
from ._util import round_duck


def _r(x: float | None, d: int) -> float | None:
    return None if x is None else float(round_duck(x, d))


# ---------------------------------------------------------------------------
# Centered co-moment partials (Chan et al. merge)
# ---------------------------------------------------------------------------

_MOM_COLS = ["n", "mx", "my", "sxx", "syy", "sxy"]


def _batch_moments(x: np.ndarray, y: np.ndarray) -> tuple:
    """(n, mean_x, mean_y, Sxx, Syy, Sxy) over pairwise-complete rows.

    numpy ``mean``/``sum`` use pairwise summation — per-batch partials
    are accurate to ~1 ulp, which the Chan merge preserves."""
    ok = ~(np.isnan(x) | np.isnan(y))
    x, y = x[ok], y[ok]
    n = len(x)
    if n == 0:
        return (0, 0.0, 0.0, 0.0, 0.0, 0.0)
    mx, my = float(x.mean()), float(y.mean())
    dx, dy = x - mx, y - my
    return (
        n,
        mx,
        my,
        float((dx * dx).sum()),
        float((dy * dy).sum()),
        float((dx * dy).sum()),
    )


def _chan_fold(parts: pd.DataFrame) -> tuple:
    """Merge co-moment partials with the parallel-variance update
    (Chan, Golub & LeVeque 1983). Deterministic fold order: partials are
    sorted by (n, mx) first, so the result is batch-layout-invariant."""
    n = 0
    mx = my = sxx = syy = sxy = 0.0
    for row in parts.sort_values(["n", "mx", "my"]).itertuples(index=False):
        n2 = int(row.n)
        if n2 == 0:
            continue
        if n == 0:
            n, mx, my = n2, row.mx, row.my
            sxx, syy, sxy = row.sxx, row.syy, row.sxy
            continue
        tot = n + n2
        dx, dy = row.mx - mx, row.my - my
        f = n * n2 / tot
        sxx += row.sxx + dx * dx * f
        syy += row.syy + dy * dy * f
        sxy += row.sxy + dx * dy * f
        mx += dx * n2 / tot
        my += dy * n2 / tot
        n = tot
    return n, mx, my, sxx, syy, sxy


def _chan_fold_single(
    parts: pd.DataFrame, n_col: str, m_col: str, s2_col: str
) -> tuple:
    """Single-column (n, mean, S2) Chan merge over named partial columns."""
    folded = _chan_fold(
        parts[[n_col, m_col, s2_col]]
        .rename(columns={n_col: "n", m_col: "mx", s2_col: "sxx"})
        .assign(my=0.0, syy=0.0, sxy=0.0)[_MOM_COLS]
    )
    return folded[0], folded[1], folded[3]


def _grouped_moment_partials(
    sf_dir: str, table: str, group_col: str, x_col: str, y_col: str
):
    """One fused scan → per-(group, task-batch) co-moment partials for
    the (x, y) pair plus single-column moment sets (each column's own
    NULL filter, matching SQL ``STDDEV_SAMP(col)`` semantics) and the
    group's raw row count. Rows with a NULL group are dropped (the
    oracles filter ``group IS NOT NULL``)."""
    cols = list(dict.fromkeys([group_col, x_col, y_col]))

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=[group_col])
        rows = []
        for grp, g in df.groupby(group_col, sort=False):
            x = g[x_col].to_numpy(dtype=np.float64)
            y = g[y_col].to_numpy(dtype=np.float64)
            pair = _batch_moments(x, y)
            xo = _batch_moments(x, x)  # x's own-null filter
            yo = _batch_moments(y, y)
            rows.append((grp, len(g)) + pair + xo[:2] + (xo[3],) + yo[:2] + (yo[3],))
        return pd.DataFrame(
            rows,
            columns=["grp", "n_rows", *_MOM_COLS, "xn", "xm", "xs2", "yn", "ym", "ys2"],
        )

    from ..shuffle import map_partials

    return map_partials(f"{sf_dir}/{table}.parquet", cols, None, partial)


def corr_lineitem(sf_dir: str) -> pd.DataFrame:
    """Per-returnflag correlation / covariance / stddev between quantity
    and extended price: one scan, Chan-merged centered partials. CORR and
    COVAR_SAMP use pairwise-complete rows; VAR_SAMP(qty) and
    STDDEV_SAMP(price) each use their own column's NULL filter — exactly
    SQL's aggregate semantics."""
    parts = _grouped_moment_partials(
        sf_dir, "lineitem", "l_returnflag", "l_quantity", "l_extendedprice"
    )
    out = []
    for grp, g in parts.groupby("grp", sort=True):
        n, _mx, _my, sxx, syy, sxy = _chan_fold(g[_MOM_COLS])
        corr = (
            sxy / math.sqrt(sxx * syy) if n > 1 and sxx > 0 and syy > 0 else None
        )
        covar = sxy / (n - 1) if n > 1 else None
        xn, _, xs2 = _chan_fold_single(g, "xn", "xm", "xs2")
        yn, _, ys2 = _chan_fold_single(g, "yn", "ym", "ys2")
        out.append(
            (
                grp,
                int(g["n_rows"].sum()),
                _r(corr, 6),
                _r(covar, 4),
                _r(math.sqrt(ys2 / (yn - 1)) if yn > 1 else None, 4),
                _r(xs2 / (xn - 1) if xn > 1 else None, 6),
            )
        )
    return pd.DataFrame(
        out,
        columns=[
            "l_returnflag",
            "n_rows",
            "corr_qty_price",
            "covar_qty_price",
            "stddev_price",
            "var_qty",
        ],
    ).astype({"n_rows": "int64"})


def histogram_totalprice(sf_dir: str, width: float = 50_000.0) -> pd.DataFrame:
    """Fixed-width histogram of order totals: bucket id is a pure
    projection (``floor(x / width)``, the identical float64 op the oracle
    runs), per-batch bincount partials, one tiny driver merge."""
    def partial(batch: pa.Table) -> pd.DataFrame:
        v = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return pd.DataFrame({"bucket": [], "n": []}).astype(
                {"bucket": "int64", "n": "int64"}
            )
        b = np.floor(v / width).astype(np.int64)
        ids, counts = np.unique(b, return_counts=True)
        return pd.DataFrame({"bucket": ids, "n": counts.astype(np.int64)})

    from ..shuffle import map_partials

    parts = map_partials(f"{sf_dir}/orders.parquet", ["o_totalprice"], None, partial)
    out = (
        parts.groupby("bucket", as_index=False)["n"]
        .sum()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    return out.astype({"bucket": "int64", "n": "int64"})


def zscore_outliers_lineitem(sf_dir: str, z: float = 3.0) -> pd.DataFrame:
    """Per-group z-score outlier gate over extended price: phase 1 folds
    the co-moment partials into per-group (mean, stddev); phase 2
    broadcasts that ≤ n_groups map and counts |x − mean| > z·stddev
    vectorized. Two scans by necessity (the gate needs global moments);
    the second scan reads ONLY the two needed columns and ships one row
    per (group, task)."""
    import ray

    parts = _grouped_moment_partials(
        sf_dir, "lineitem", "l_returnflag", "l_extendedprice", "l_extendedprice"
    )
    stats: dict[str, tuple[float, float, int]] = {}
    for grp, g in parts.groupby("grp", sort=True):
        n, m, _my, s2, _syy, _sxy = _chan_fold(g[_MOM_COLS])
        if n > 1:
            stats[grp] = (m, math.sqrt(s2 / (n - 1)), n)
    stats_ref = ray.put(stats)

    def count_breaches(batch: pa.Table) -> pd.DataFrame:
        st = ray.get(stats_ref)
        df = batch.to_pandas().dropna(subset=["l_returnflag", "l_extendedprice"])
        rows = []
        for grp, g in df.groupby("l_returnflag", sort=False):
            if grp not in st:
                continue
            m, sd, _ = st[grp]
            v = g["l_extendedprice"].to_numpy()
            rows.append((grp, int((np.abs(v - m) > z * sd).sum())))
        return pd.DataFrame(rows, columns=["grp", "breaches"])

    from ..shuffle import map_partials

    breaches = (
        map_partials(
            f"{sf_dir}/lineitem.parquet",
            ["l_returnflag", "l_extendedprice"],
            None,
            count_breaches,
        )
        .groupby("grp")["breaches"]
        .sum()
    )
    out = [
        (
            grp,
            int(st[2]),
            int(breaches.get(grp, 0)),
            _r(st[0], 4),
            _r(st[1], 4),
        )
        for grp, st in sorted(stats.items())
    ]
    return pd.DataFrame(
        out,
        columns=["l_returnflag", "n_price", "n_outliers", "mean_price", "sd_price"],
    ).astype({"n_price": "int64", "n_outliers": "int64"})


def user_overlap_events(sf_dir: str, num_buckets: int | None = None) -> pd.DataFrame:
    """Exact pairwise cohort overlap: for every pair of event types, how
    many distinct users did both, plus the Jaccard index. Users are
    hash-bucketed, so each bucket sees every type-membership of its
    users; one boolean incidence matmul per bucket yields the bucket's
    |types|² intersection matrix, and distinct counts add across buckets
    (user sets are bucket-disjoint). The exchange carries distinct
    (user, type) int rows per batch — bounded by the incidence size, a
    tiny fraction of the event log."""
    from .windows import _bucket_of, scaled_num_buckets

    path = f"{sf_dir}/events.parquet"
    n_buckets = num_buckets or scaled_num_buckets(count_rows(path))

    def add_bucket(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["user_id", "event_type"])
        pairs = df.drop_duplicates(["user_id", "event_type"])
        return pd.DataFrame(
            {
                "user_id": pairs["user_id"].astype("int64"),
                "event_type": pairs["event_type"],
                "__bucket": _bucket_of(pairs["user_id"].to_numpy(), n_buckets),
            }
        )

    def overlap_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        pairs = g.drop_duplicates(["user_id", "event_type"])
        if len(pairs) == 0:
            return pd.DataFrame(
                {"type_a": [], "type_b": [], "inter": []}
            )
        u_codes, _ = pd.factorize(pairs["user_id"], sort=False)
        t_codes, types = pd.factorize(pairs["event_type"], sort=True)
        inc = np.zeros((u_codes.max() + 1, len(types)), dtype=np.int64)
        inc[u_codes, t_codes] = 1
        m = inc.T @ inc  # types × types: co-membership counts
        rows = []
        for i, ta in enumerate(types):
            for j in range(i, len(types)):
                rows.append((ta, types[j], int(m[i, j])))
        return pd.DataFrame(rows, columns=["type_a", "type_b", "inter"])

    from .dedup import _fused_grouped_frames

    parts = _fused_grouped_frames(
        [(path, ["user_id", "event_type"], None, add_bucket)],
        n_buckets,
        overlap_in_bucket,
    )
    tot = parts.groupby(["type_a", "type_b"], as_index=False)["inter"].sum()
    sizes = {
        r.type_a: int(r.inter) for r in tot.itertuples() if r.type_a == r.type_b
    }
    out = []
    for r in tot.itertuples():
        if r.type_a >= r.type_b:
            continue
        inter = int(r.inter)
        na, nb = sizes[r.type_a], sizes[r.type_b]
        out.append(
            (
                r.type_a,
                r.type_b,
                inter,
                na,
                nb,
                _r(inter / (na + nb - inter), 6) if na + nb - inter else None,
            )
        )
    return (
        pd.DataFrame(
            out, columns=["type_a", "type_b", "n_both", "n_a", "n_b", "jaccard"]
        )
        .sort_values(["type_a", "type_b"])
        .reset_index(drop=True)
        .astype({"n_both": "int64", "n_a": "int64", "n_b": "int64"})
    )


def skew_kurtosis_lineitem(sf_dir: str) -> pd.DataFrame:
    """Grouped skewness / excess kurtosis — the 3rd/4th-moment
    distribution-shape statistics (a drifted tail shows here before the
    mean moves). Two distributed passes: pass 1 reduces to per-group
    (n, fsum) partials for the mean; pass 2 broadcasts the means via
    closure capture and reduces to per-group fsum partials of the
    centered 2nd/3rd/4th powers. The driver then applies DuckDB's
    estimator forms — adjusted Fisher–Pearson G1 = g1·√(n(n−1))/(n−2)
    and sample excess kurtosis G2 = ((n+1)·g2 + 6)·(n−1)/((n−2)(n−3))
    (verified numerically against skewness()/kurtosis()) — with the
    1e-12-class two-pass-vs-single-pass noise absorbed by the 4dp
    output rounding."""
    from ..shuffle import map_partials

    path = f"{sf_dir}/lineitem.parquet"

    def mean_partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["l_returnflag", "l_extendedprice"])
        rows = [
            (grp, len(g), math.fsum(g))
            for grp, g in df.groupby("l_returnflag", sort=False)[
                "l_extendedprice"
            ]
        ]
        return pd.DataFrame(rows, columns=["grp", "n", "s"])

    p1 = map_partials(
        path, ["l_returnflag", "l_extendedprice"], None, mean_partial
    )
    agg1 = p1.groupby("grp").agg(n=("n", "sum"), s=("s", lambda g: math.fsum(g)))
    means = {grp: float(r["s"]) / int(r["n"]) for grp, r in agg1.iterrows()}

    def moment_partial(batch: pa.Table, _m=dict(means)) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["l_returnflag", "l_extendedprice"])
        rows = []
        for grp, g in df.groupby("l_returnflag", sort=False)["l_extendedprice"]:
            if grp not in _m:
                continue
            d = g.to_numpy(np.float64) - _m[grp]
            d2 = d * d
            rows.append(
                (grp, math.fsum(d2), math.fsum(d2 * d), math.fsum(d2 * d2))
            )
        return pd.DataFrame(rows, columns=["grp", "s2", "s3", "s4"])

    p2 = map_partials(
        path, ["l_returnflag", "l_extendedprice"], None, moment_partial
    )
    agg2 = p2.groupby("grp").agg(
        s2=("s2", lambda g: math.fsum(g)),
        s3=("s3", lambda g: math.fsum(g)),
        s4=("s4", lambda g: math.fsum(g)),
    )
    rows = []
    for grp in sorted(means):
        n = int(agg1.loc[grp, "n"])
        m2 = float(agg2.loc[grp, "s2"]) / n
        m3 = float(agg2.loc[grp, "s3"]) / n
        m4 = float(agg2.loc[grp, "s4"]) / n
        g1 = m3 / m2**1.5
        G1 = g1 * math.sqrt(n * (n - 1)) / (n - 2)
        g2 = m4 / m2**2 - 3.0
        G2 = ((n + 1) * g2 + 6.0) * (n - 1) / ((n - 2) * (n - 3))
        rows.append((grp, n, float(round_duck(G1, 4)), float(round_duck(G2, 4))))
    return pd.DataFrame(
        rows, columns=["l_returnflag", "n", "skew", "kurt"]
    ).astype({"n": "int64"})


def value_trend_events(sf_dir: str) -> pd.DataFrame:
    """Distributed OLS trend per group (drift as a REGRESSION, not a
    mean shift): slope of event value (cents/day) against event time
    (days since epoch) per event type, from closed-form sums. Each
    batch reduces to per-type (n, Σx, Σy, Σxy, Σx²) partials with x =
    integer day and y = integer cents — every product ≤ ~6e8, so
    partials are exact int64 and the driver merges them as Python ints;
    both engines then build the slope from the SAME exact integers with
    the identical expression tree. The classic "did quality decay over
    the crawl" check for training pipelines."""
    from ..shuffle import map_partials

    path = f"{sf_dir}/events.parquet"
    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["ts", "event_type", "value"])
        x = (
            df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            // day_us
        )
        y = np.round(df["value"].to_numpy(np.float64) * 100.0).astype(np.int64)
        part = pd.DataFrame(
            {
                "event_type": df["event_type"].astype(str),
                "n": np.int64(1),
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sxx": x * x,
            }
        )
        return part.groupby("event_type", as_index=False).sum()

    parts = map_partials(
        path, ["ts", "event_type", "value"], None, partial
    )
    rows = []
    for t, g in parts.groupby("event_type", sort=True):
        n = int(g["n"].sum())
        sx = sum(int(v) for v in g["sx"])
        sy = sum(int(v) for v in g["sy"])
        sxy = sum(int(v) for v in g["sxy"])
        sxx = sum(int(v) for v in g["sxx"])
        # identical FP tree as the oracle:
        # (n*sxy - sx*sy) * 1.0 / (n*sxx - sx*sx) / 100
        slope = ((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx)) / 100.0
        rows.append((t, n, float(round_duck(slope, 6))))
    return pd.DataFrame(
        rows, columns=["event_type", "n", "slope_per_day"]
    ).astype({"n": "int64"})


def benford_totalprice(sf_dir: str) -> pd.DataFrame:
    """Benford's-law first-digit audit — the classic fabricated-numbers
    test (organic amounts follow P(d) = log10(1 + 1/d); copy-pasted or
    generated ones usually don't): first-significant-digit distribution
    of the order totals vs the Benford expectation. The digit comes
    from the INTEGER cents' decimal string (the first significant digit
    of x and 100·x are identical, and integer formatting is
    engine-independent — a float log10 could misfloor at powers of
    ten). Per-batch 9-cell count partials; share and expectation built
    with identical expression trees."""
    from ..shuffle import map_partials

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["o_totalprice"])
        df = df[df["o_totalprice"] > 0]
        if len(df) == 0:
            return pd.DataFrame({"digit": [], "n": []})
        cents = np.round(
            df["o_totalprice"].to_numpy(np.float64) * 100.0
        ).astype(np.int64)
        first = pd.Series(cents).astype(str).str[0].astype(np.int64)
        out = first.value_counts().sort_index()
        return pd.DataFrame(
            {"digit": out.index.to_numpy(np.int64), "n": out.to_numpy("int64")}
        )

    parts = map_partials(
        f"{sf_dir}/orders.parquet", ["o_totalprice"], None, partial
    )
    out = (
        parts.groupby("digit", as_index=False)["n"]
        .sum()
        .sort_values("digit")
        .reset_index(drop=True)
    )
    s = float(out["n"].sum())
    d = out["digit"].to_numpy(np.float64)
    share = out["n"].to_numpy(np.float64) * 1.0 / s
    p = np.log(1 + 1.0 / d) / np.log(10)
    return pd.DataFrame(
        {
            "digit": out["digit"].astype("int64"),
            "n": out["n"].astype("int64"),
            "share": round_duck(share, 4),
            "benford_p": round_duck(p, 4),
            "abs_dev": round_duck(np.abs(share - p), 4),
        }
    )


def anomalous_days_events(sf_dir: str, z_threshold: float = 2.0) -> pd.DataFrame:
    """Volume-anomaly detection on the daily event-count series (the
    monitoring op: which days deviate > zσ from the series mean). Daily
    counts are calendar-bounded partials; the z-scores run driver-side
    on the tiny series — but with the SAME explicit two-pass expression
    tree the oracle uses (mean = fsum/n, sd = sqrt(fsum((c−mean)²) /
    (n−1))), so the threshold comparison sees bit-identical doubles on
    both engines instead of racing DuckDB's single-pass STDDEV at the
    boundary."""
    from ..shuffle import map_partials

    path = f"{sf_dir}/events.parquet"
    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["ts"])
        ts_us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        day = (ts_us // day_us) * day_us
        cnt = pd.Series(day).value_counts()
        return pd.DataFrame(
            {"day": cnt.index.to_numpy(np.int64), "c": cnt.to_numpy().astype("int64")}
        )

    parts = map_partials(path, ["ts"], None, partial)
    by_day = parts.groupby("day")["c"].sum().sort_index()
    n = len(by_day)
    if n < 2:  # no series to z-score (SQL: zero joined rows)
        return pd.DataFrame(
            {
                "n_days": pd.Series([], dtype="int64"),
                "n_anomalous": pd.Series([], dtype="int64"),
                "max_abs_z": pd.Series([], dtype="float64"),
                "mean_daily": pd.Series([], dtype="float64"),
            }
        )
    c = by_day.to_numpy(np.float64)
    mean = math.fsum(c) / n
    sd = math.sqrt(math.fsum((x - mean) ** 2 for x in c) / (n - 1))
    z = (c - mean) / sd
    anom = np.abs(z) > z_threshold
    return pd.DataFrame(
        {
            "n_days": pd.Series([n], dtype="int64"),
            "n_anomalous": pd.Series([int(anom.sum())], dtype="int64"),
            "max_abs_z": [float(round_duck(float(np.abs(z).max()), 4))],
            "mean_daily": [float(round_duck(mean, 4))],
        }
    )


# (rule, column, lo, hi) — inclusive domains; literals are exact
# doubles, so numpy and DuckDB evaluate identical comparisons
_RANGE_RULES = (
    ("discount_le_0.05", "l_discount", 0.0, 0.05),
    ("price_le_100k", "l_extendedprice", 0.0, 100_000.0),
    ("quantity_le_45", "l_quantity", 1.0, 45.0),
    ("tax_le_0.08", "l_tax", 0.0, 0.08),
)


def range_rules_lineitem(sf_dir: str) -> pd.DataFrame:
    """Declarative domain-rule audit — the 'values must lie in [lo, hi]'
    family of data-quality checks, evaluated for a whole rule table in
    ONE scan: per rule, how many non-NULL values were checked and how
    many fall outside the domain (SQL semantics: NULL is never a
    violation). Vectorized masks per batch, rule-vocabulary-bounded
    partials (4 rows per task), shuffle-free. The rule mix is
    deliberately half-breached / half-clean so a regression in either
    direction shows."""
    from ..shuffle import map_partials

    cols = sorted({c for _, c, _, _ in _RANGE_RULES})

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        rows = []
        for rule, col, lo, hi in _RANGE_RULES:
            v = df[col].to_numpy(np.float64)
            ok = ~np.isnan(v)
            viol = ok & ((v < lo) | (v > hi))
            rows.append((rule, int(ok.sum()), int(viol.sum())))
        return pd.DataFrame(
            rows, columns=["rule", "n_checked", "n_violations"]
        )

    parts = map_partials(f"{sf_dir}/lineitem.parquet", cols, None, partial)
    out = (
        parts.groupby("rule", as_index=False)[["n_checked", "n_violations"]]
        .sum()
        .sort_values("rule")
        .reset_index(drop=True)
    )
    return out.astype({"n_checked": "int64", "n_violations": "int64"})


def mutual_info_orders(sf_dir: str) -> pd.DataFrame:
    """Mutual information between order priority and status — the
    information-theoretic dependence test next to the chi-square op
    (MI reads in nats: how much knowing one column tells you about the
    other; 0 = independent). One scan to contingency-bounded integer
    partials (≤ |priorities|·|statuses| cells per task, shuffle-free);
    the driver builds MI = Σ c·ln(c·N·1.0 / (r·s)) / N from exact
    integers with the SAME expression tree as the oracle (int products
    before the single float conversion, exact compensated sums on both
    engines), so the result agrees bit-for-bit before 6dp rounding."""
    from ..shuffle import map_partials

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(
            subset=["o_orderpriority", "o_orderstatus"]
        )
        if len(df) == 0:
            return pd.DataFrame({"a": [], "b": [], "n": []}).astype(
                {"a": "object", "b": "object", "n": "int64"}
            )
        out = (
            df.groupby(["o_orderpriority", "o_orderstatus"], as_index=False)
            .size()
            .rename(
                columns={
                    "o_orderpriority": "a",
                    "o_orderstatus": "b",
                    "size": "n",
                }
            )
        )
        return out.astype({"n": "int64"})

    parts = map_partials(
        f"{sf_dir}/orders.parquet",
        ["o_orderpriority", "o_orderstatus"],
        None,
        partial,
    )
    cells = parts.groupby(["a", "b"])["n"].sum()
    n = int(cells.sum())
    if n == 0:
        return pd.DataFrame(
            {
                "n_rows": pd.Series([], dtype="int64"),
                "mi_nats": pd.Series([], dtype="float64"),
            }
        )
    ra = cells.groupby(level=0).sum()
    cb = cells.groupby(level=1).sum()
    terms = [
        float(c) * math.log((int(c) * n * 1.0) / (int(ra[a]) * int(cb[b])))
        for (a, b), c in cells.items()
    ]
    mi = math.fsum(terms) / n
    return pd.DataFrame(
        {
            "n_rows": pd.Series([n], dtype="int64"),
            "mi_nats": [float(round_duck(mi, 6))],
        }
    )


def autocorr_daily_events(sf_dir: str, lag_days: int = 7) -> pd.DataFrame:
    """Lag-7 autocorrelation of the daily event-count series — the
    weekly-seasonality detector (a strong positive r7 means volume
    repeats by weekday; see also the traffic heatmap). Calendar-bounded
    integer day-count partials (≤ days × tasks rows, shuffle-free);
    the driver aligns each observed day with day+7 (pairs only where
    both exist, exactly the oracle's self-join) and computes CORR with
    the same centered-sums form the corr_lineitem op already matches
    bit-for-bit against DuckDB's streaming aggregate at 6dp."""
    from ..shuffle import map_partials

    _DAY_US = 86_400_000_000

    def partial(batch: pa.Table) -> pd.DataFrame:
        ts = batch.column("ts").to_numpy(zero_copy_only=False)
        ts = ts[~pd.isna(ts)]
        if len(ts) == 0:
            return pd.DataFrame({"day": [], "c": []}).astype(
                {"day": "int64", "c": "int64"}
            )
        day = ts.astype("datetime64[us]").astype("int64") // _DAY_US
        ids, counts = np.unique(day, return_counts=True)
        return pd.DataFrame({"day": ids, "c": counts.astype(np.int64)})

    parts = map_partials(f"{sf_dir}/events.parquet", ["ts"], None, partial)
    by_day = parts.groupby("day")["c"].sum()
    cmap = {int(d): int(c) for d, c in by_day.items()}
    pairs = [
        (c, cmap[d + lag_days])
        for d, c in cmap.items()
        if d + lag_days in cmap
    ]
    if len(pairs) < 2:
        return pd.DataFrame(
            {
                "n_pairs": pd.Series([len(pairs)], dtype="int64"),
                "autocorr_lag7": [None],
            }
        )
    x = np.array([p[0] for p in pairs], dtype=np.float64)
    y = np.array([p[1] for p in pairs], dtype=np.float64)
    n, _mx, _my, sxx, syy, sxy = _batch_moments(x, y)
    corr = (
        sxy / math.sqrt(sxx * syy) if sxx > 0 and syy > 0 else None
    )
    return pd.DataFrame(
        {
            "n_pairs": pd.Series([len(pairs)], dtype="int64"),
            "autocorr_lag7": [_r(corr, 6)],
        }
    )


def corr_orders_shipments_daily(sf_dir: str) -> pd.DataFrame:
    """Cross-TABLE daily correlation — does daily ship volume (lineitem
    rows per l_shipdate) track daily order volume (orders rows per
    o_orderdate)? Pearson r over the days BOTH series observe (the
    oracle's inner join) — the two-table analog of the lag-7
    autocorrelation, and the cadence-consistency audit between a parent
    table and its fulfillment stream. Each table reduces to
    calendar-bounded integer day-count partials in its own shuffle-free
    pass (≤ days × tasks rows); the driver aligns the two ≤ days series
    exactly like the SQL join and computes CORR with the same
    centered-sums form the corr/autocorr ops already match at 6dp."""
    from ..shuffle import map_partials

    _DAY_US = 86_400_000_000

    def daily(path: str, col: str) -> dict:
        def partial(batch: pa.Table) -> pd.DataFrame:
            ts = batch.column(col).to_numpy(zero_copy_only=False)
            ts = ts[~pd.isna(ts)]
            if len(ts) == 0:
                return pd.DataFrame({"day": [], "c": []}).astype(
                    {"day": "int64", "c": "int64"}
                )
            day = ts.astype("datetime64[us]").astype("int64") // _DAY_US
            ids, counts = np.unique(day, return_counts=True)
            return pd.DataFrame({"day": ids, "c": counts.astype(np.int64)})

        parts = map_partials(path, [col], None, partial)
        return {
            int(d): int(c)
            for d, c in parts.groupby("day")["c"].sum().items()
        }

    ship = daily(f"{sf_dir}/lineitem.parquet", "l_shipdate")
    orders = daily(f"{sf_dir}/orders.parquet", "o_orderdate")
    pairs = [(c, orders[d]) for d, c in sorted(ship.items()) if d in orders]
    if len(pairs) < 2:
        return pd.DataFrame(
            {
                "n_days": pd.Series([len(pairs)], dtype="int64"),
                "corr_daily": [None],
            }
        )
    x = np.array([p[0] for p in pairs], dtype=np.float64)
    y = np.array([p[1] for p in pairs], dtype=np.float64)
    n, _mx, _my, sxx, syy, sxy = _batch_moments(x, y)
    corr = sxy / math.sqrt(sxx * syy) if sxx > 0 and syy > 0 else None
    return pd.DataFrame(
        {
            "n_days": pd.Series([len(pairs)], dtype="int64"),
            "corr_daily": [_r(corr, 6)],
        }
    )


def nation_tvd_customer_supplier(sf_dir: str) -> pd.DataFrame:
    """Total variation distance between the customer and supplier
    nation distributions — the two-TABLE dataset-shift test (are
    suppliers located where customers are?). Each side reduces to
    nation-count partials with NO exchange (vocabulary-bounded); the
    driver evaluates TVD = Σ|c1·n2 − c2·n1| / (2·n1·n2) — numerator an
    exact integer on both engines, one division at the end — so the
    result is bit-reproducible, not accumulation-ordered."""
    from ..shuffle import map_partials

    def side(path: str, col: str) -> pd.Series:
        def partial(batch: pa.Table) -> pd.DataFrame:
            k = batch.column(col).to_numpy(zero_copy_only=False)
            k = k[~pd.isna(k)].astype(np.int64)
            if len(k) == 0:
                return pd.DataFrame({"k": [], "n": []}).astype("int64")
            ids, counts = np.unique(k, return_counts=True)
            return pd.DataFrame({"k": ids, "n": counts.astype(np.int64)})

        parts = map_partials(path, [col], None, partial)
        return parts.groupby("k")["n"].sum()

    c = side(f"{sf_dir}/customer.parquet", "c_nationkey")
    s = side(f"{sf_dir}/supplier.parquet", "s_nationkey")
    n1, n2 = int(c.sum()), int(s.sum())
    if n1 == 0 or n2 == 0:
        return pd.DataFrame(
            {
                "n_customers": pd.Series([], dtype="int64"),
                "n_suppliers": pd.Series([], dtype="int64"),
                "tvd_num": pd.Series([], dtype="int64"),
                "tvd": pd.Series([], dtype="float64"),
            }
        )
    keys = sorted(set(c.index) | set(s.index))
    num = sum(
        abs(int(c.get(k, 0)) * n2 - int(s.get(k, 0)) * n1) for k in keys
    )
    return pd.DataFrame(
        {
            "n_customers": pd.Series([n1], dtype="int64"),
            "n_suppliers": pd.Series([n2], dtype="int64"),
            "tvd_num": pd.Series([num], dtype="int64"),
            "tvd": [float(round_duck(num * 1.0 / (2 * n1 * n2), 6))],
        }
    )


def fd_violations_lineitem(
    sf_dir: str, num_buckets: int | None = None
) -> pd.DataFrame:
    """Functional-dependency audit: does ``l_orderkey`` determine
    ``l_returnflag``? (Schema-discovery data-quality test — an FD that
    SHOULD hold but doesn't flags merge bugs.) Keys bucket whole by
    hash, so per-key COUNT(DISTINCT dep) is exact per bucket; each
    batch pre-dedups its (key, dep) pairs, the bucket dedups across
    batches and reduces to 4-cell integer partials. SQL COUNT(DISTINCT)
    semantics: NULL dep values never count, but a key whose deps are
    all NULL still counts as a key (distinct count 0)."""
    from .dedup import _fused_grouped_frames
    from .windows import _bucket_of, scaled_num_buckets

    path = f"{sf_dir}/lineitem.parquet"
    n_buckets = num_buckets or scaled_num_buckets(count_rows(path))

    def add_bucket(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["l_orderkey"])
        inc = pd.DataFrame(
            {
                "k": df["l_orderkey"].astype("int64"),
                "d": df["l_returnflag"],
            }
        ).drop_duplicates()
        inc["__bucket"] = _bucket_of(inc["k"].to_numpy(np.int64), n_buckets)
        return inc

    def fd_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"n_keys": [0], "n_viol": [0], "mx": [0]}
            ).astype("int64")
        keys_all = g["k"].nunique()
        dc = (
            g.dropna(subset=["d"])
            .drop_duplicates(["k", "d"])["k"]
            .value_counts()
        )
        return pd.DataFrame(
            {
                "n_keys": [int(keys_all)],
                "n_viol": [int((dc > 1).sum())],
                "mx": [int(dc.max()) if len(dc) else 0],
            }
        ).astype("int64")

    parts = _fused_grouped_frames(
        [(path, ["l_orderkey", "l_returnflag"], None, add_bucket)],
        n_buckets,
        fd_per_bucket,
    )
    n = int(parts["n_keys"].sum())
    if n == 0:
        return pd.DataFrame(
            {
                "n_keys": pd.Series([0], dtype="int64"),
                "n_violating_keys": pd.Series([0], dtype="int64"),
                "max_distinct": [None],
                "violation_rate": [None],
            }
        )
    v = int(parts["n_viol"].sum())
    return pd.DataFrame(
        {
            "n_keys": pd.Series([n], dtype="int64"),
            "n_violating_keys": pd.Series([v], dtype="int64"),
            "max_distinct": pd.Series(
                [int(parts["mx"].max())], dtype="int64"
            ),
            "violation_rate": [float(round_duck(v * 1.0 / n, 4))],
        }
    )


def entropy_event_types(sf_dir: str) -> pd.DataFrame:
    """Shannon entropy of the event-type distribution (information
    content of the log — a collapsing-diversity alarm for instrumentation
    bugs): per-type counts are exact integer partials (vocabulary-bounded
    exchange), and the driver builds H = ln(N) − Σ c·ln(c)/N from those
    integers. The c·ln(c) sum uses exact compensated summation on BOTH
    engines (math.fsum / DuckDB fsum), so the result is order-independent
    and the two expression trees agree bit-for-bit before rounding.
    Normalized entropy divides by ln(n_types) (SQL NULL when there is a
    single type — ln(1) = 0); perplexity is exp(H)."""
    from ..shuffle import map_partials

    def partial(batch: pa.Table) -> pd.DataFrame:
        t = batch.column("event_type").to_pandas().dropna()
        if len(t) == 0:
            return pd.DataFrame({"event_type": [], "n": []}).astype(
                {"event_type": "object", "n": "int64"}
            )
        vc = t.value_counts()
        return pd.DataFrame(
            {
                "event_type": vc.index.to_numpy(),
                "n": vc.to_numpy().astype("int64"),
            }
        )

    parts = map_partials(
        f"{sf_dir}/events.parquet", ["event_type"], None, partial
    )
    counts = parts.groupby("event_type")["n"].sum()
    n = int(counts.sum())
    if n == 0:
        return pd.DataFrame(
            {
                "n_rows": pd.Series([], dtype="int64"),
                "n_types": pd.Series([], dtype="int64"),
                "entropy_nats": pd.Series([], dtype="float64"),
                "norm_entropy": pd.Series([], dtype="float64"),
                "perplexity": pd.Series([], dtype="float64"),
            }
        )
    k = len(counts)
    h = math.log(n) - math.fsum(
        float(c) * math.log(float(c)) for c in counts
    ) / n
    return pd.DataFrame(
        {
            "n_rows": pd.Series([n], dtype="int64"),
            "n_types": pd.Series([k], dtype="int64"),
            "entropy_nats": [float(round_duck(h, 6))],
            "norm_entropy": [
                float(round_duck(h / math.log(k), 6)) if k > 1 else None
            ],
            "perplexity": [float(round_duck(math.exp(h), 4))],
        }
    )


def ks_price_returnflag(
    sf_dir: str, num_buckets: int | None = None
) -> pd.DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between the
    extended-price distributions of returned ('R') vs accepted ('A')
    line items — the distribution-comparison test PSI approximates
    with bins, done exactly (D = max over values of |ECDF_R − ECDF_A|).

    An ECDF needs global value ORDER, so this is the one family a hash
    exchange cannot serve: values range-partition instead. Phase 1 is a
    shuffle-free count pass (per-range-bucket (n_R, n_A) totals, ≤
    buckets rows per task) whose prefix sums give every bucket its
    global ECDF offsets; phase 2 re-reads with the offsets captured in
    the reduce closure — each bucket sorts only its OWN distinct cents
    values, takes one vectorized prefix-sum, and emits a single integer:
    max |s1·N2 − s2·N1| (the D numerator, exact in int64 while
    N1·N2 < 2⁶³ ≈ 9.2e18 — valid to ~3e9 rows per side; beyond that the
    numerator needs two 32-bit limbs or Python ints). The driver sees
    one row per bucket, never a distinct-value list; D is one division,
    built from the same exact integers on both engines. Range bounds
    come from parquet footer statistics (zero data read), with a tiny
    count-pass fallback when a footer lacks them."""
    from ..io import footer_column_minmax, list_parquet_files
    from ..shuffle import map_partials
    from .dedup import _fused_grouped_frames
    from .windows import scaled_num_buckets

    path = f"{sf_dir}/lineitem.parquet"
    fsql = "l_returnflag IN ('R', 'A') AND l_extendedprice IS NOT NULL"
    cols = ["l_extendedprice", "l_returnflag"]
    n_buckets = num_buckets or scaled_num_buckets(count_rows(path))

    empty = pd.DataFrame(
        {
            "n_r": pd.Series([], dtype="int64"),
            "n_a": pd.Series([], dtype="int64"),
            "ks_num": pd.Series([], dtype="int64"),
            "ks_d": pd.Series([], dtype="float64"),
        }
    )

    try:
        mm = footer_column_minmax(
            list_parquet_files(path), "l_extendedprice"
        )
    except Exception:
        mm = None
    if mm is None:

        def minmax_partial(batch: pa.Table) -> pd.DataFrame:
            v = batch.column("l_extendedprice").to_numpy(
                zero_copy_only=False
            )
            v = v[~np.isnan(v)]
            if len(v) == 0:
                return pd.DataFrame({"mn": [], "mx": []}, dtype="float64")
            return pd.DataFrame({"mn": [v.min()], "mx": [v.max()]})

        p = map_partials(path, ["l_extendedprice"], fsql, minmax_partial)
        if len(p) == 0:
            return empty
        mm = (float(p["mn"].min()), float(p["mx"].max()))
    lo = int(round_duck(mm[0] * 100.0, 0))
    hi = int(round_duck(mm[1] * 100.0, 0))
    # interior boundaries in integer cents; duplicates (tiny domains)
    # just leave some range buckets empty
    bnds = np.unique(
        np.linspace(lo, hi, n_buckets + 1)[1:-1].astype(np.int64)
    )
    n_b = len(bnds) + 1

    def cents_and_flag(df: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        cents = round_duck(
            df["l_extendedprice"].to_numpy(np.float64) * 100.0, 0
        )
        return cents.astype(np.int64), (
            df["l_returnflag"].to_numpy() == "R"
        )

    def tot_partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        v, is_r = cents_and_flag(df)
        b = np.searchsorted(bnds, v, side="right")
        return pd.DataFrame(
            {
                "bucket": np.arange(n_b, dtype=np.int64),
                "t1": np.bincount(b[is_r], minlength=n_b).astype("int64"),
                "t2": np.bincount(b[~is_r], minlength=n_b).astype("int64"),
            }
        )

    tots = (
        map_partials(path, cols, fsql, tot_partial)
        .groupby("bucket")[["t1", "t2"]]
        .sum()
        .reindex(range(n_b), fill_value=0)
    )
    n1 = int(tots["t1"].sum())
    n2 = int(tots["t2"].sum())
    if n1 + n2 == 0:
        return empty
    o1 = np.r_[0, tots["t1"].cumsum().to_numpy()[:-1]]
    o2 = np.r_[0, tots["t2"].cumsum().to_numpy()[:-1]]

    def proj(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        v, is_r = cents_and_flag(df)
        out = (
            pd.DataFrame(
                {
                    "v": v,
                    "c1": is_r.astype(np.int64),
                    "c2": (~is_r).astype(np.int64),
                }
            )
            .groupby("v", as_index=False)
            .sum()
        )
        out["__bucket"] = np.searchsorted(
            bnds, out["v"].to_numpy(), side="right"
        ).astype(np.int32)
        return out

    def ks_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"num": pd.Series([], dtype="int64")})
        b = int(g["__bucket"].iloc[0])
        c = (
            g.groupby("v", as_index=False)[["c1", "c2"]]
            .sum()
            .sort_values("v")
        )
        s1 = int(o1[b]) + c["c1"].cumsum().to_numpy()
        s2 = int(o2[b]) + c["c2"].cumsum().to_numpy()
        num = np.abs(s1 * n2 - s2 * n1).max()
        return pd.DataFrame({"num": pd.Series([int(num)], dtype="int64")})

    parts = _fused_grouped_frames(
        [(path, cols, fsql, proj)], n_b, ks_in_bucket
    )
    num = int(parts["num"].max()) if len(parts) else 0
    return pd.DataFrame(
        {
            "n_r": pd.Series([n1], dtype="int64"),
            "n_a": pd.Series([n2], dtype="int64"),
            "ks_num": pd.Series([num], dtype="int64"),
            "ks_d": [
                float(round_duck(num * 1.0 / n1 / n2, 6))
                if n1 and n2
                else None
            ],
        }
    )


# generated from the same rule table the engine evaluates — the two
# sides can never drift apart on bounds
_RANGE_ORACLE = (
    "SELECT * FROM ("
    + " UNION ALL ".join(
        f"SELECT '{rule}' AS rule, "
        f"CAST(COUNT({col}) AS BIGINT) AS n_checked, "
        f"CAST(COUNT(*) FILTER (WHERE {col} IS NOT NULL "
        f"AND ({col} < {lo} OR {col} > {hi})) AS BIGINT) AS n_violations "
        f"FROM lineitem"
        for rule, col, lo, hi in _RANGE_RULES
    )
    + ") ORDER BY rule"
)

# the correlation-matrix column set — the oracle SQL is GENERATED from
# this tuple, so engine and oracle can never drift on column choice
_CORR_MATRIX_COLS = ("l_discount", "l_extendedprice", "l_quantity", "l_tax")


def corr_matrix_lineitem(sf_dir: str) -> pd.DataFrame:
    """Full pairwise correlation matrix over the lineitem numeric
    columns in ONE scan — the feature-redundancy census that
    ``corr_lineitem`` (one pair, grouped) doesn't cover. Each scan task
    emits one Chan co-moment partial per unordered column pair with that
    pair's own pairwise-complete NULL filter (exactly SQL CORR
    semantics); the driver's deterministic Chan fold agrees with
    DuckDB's streaming CORR to ~1e-13 relative, far inside the 6dp
    rounding. Exchange: pairs × tasks fixed-width rows."""
    import itertools

    pairs = list(itertools.combinations(_CORR_MATRIX_COLS, 2))

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        arrs = {
            c: df[c].to_numpy(np.float64) for c in _CORR_MATRIX_COLS
        }
        rows = [
            (cx, cy) + _batch_moments(arrs[cx], arrs[cy])
            for cx, cy in pairs
        ]
        return pd.DataFrame(
            rows, columns=["cx", "cy", *_MOM_COLS]
        )

    from ..shuffle import map_partials

    parts = map_partials(
        f"{sf_dir}/lineitem.parquet", list(_CORR_MATRIX_COLS), None, partial
    )
    rows = []
    for cx, cy in pairs:
        g = parts[(parts["cx"] == cx) & (parts["cy"] == cy)]
        n, _mx, _my, sxx, syy, sxy = _chan_fold(g[_MOM_COLS])
        corr = (
            sxy / math.sqrt(sxx * syy)
            if n > 1 and sxx > 0 and syy > 0
            else None
        )
        rows.append((cx, cy, int(n), _r(corr, 6)))
    return pd.DataFrame(
        rows, columns=["col_x", "col_y", "n_pairs", "corr"]
    ).astype({"n_pairs": "int64"})


_CORR_MATRIX_ORACLE = (
    "SELECT * FROM ("
    + " UNION ALL ".join(
        f"SELECT '{cx}' AS col_x, '{cy}' AS col_y, "
        f"CAST(COUNT(*) FILTER (WHERE {cx} IS NOT NULL "
        f"AND {cy} IS NOT NULL) AS BIGINT) AS n_pairs, "
        f"ROUND(CORR({cx}, {cy}), 6) AS corr FROM lineitem"
        for i, cx in enumerate(_CORR_MATRIX_COLS)
        for cy in _CORR_MATRIX_COLS[i + 1 :]
    )
    + ") ORDER BY col_x, col_y"
)


def weighted_avg_discount_lineitem(sf_dir: str) -> pd.DataFrame:
    """Revenue-weighted average discount — the planner/finance number a
    plain AVG(discount) misstates whenever big orders discount
    differently from small ones. Fully exact: price fixes to integer
    cents and discount to integer basis points (both 2dp/4dp decimals
    stored as doubles), each scan task folds Σ(cents·bp) and Σcents in
    int64 (products ≤ 1e7·1000 = 1e10 per row — exact headroom to ~1e8
    rows per task), the driver merges Python ints, and the weighted
    mean is ONE division of exact integers on both engines (÷10000 to
    return to fraction units — the identical final op). Rows with a
    NULL price or discount drop on both sides."""
    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(
            subset=["l_extendedprice", "l_discount"]
        )
        cents = round_duck(
            df["l_extendedprice"].to_numpy(np.float64) * 100.0, 0
        ).astype(np.int64)
        bp = round_duck(
            df["l_discount"].to_numpy(np.float64) * 10000.0, 0
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "n": [int(len(df))],
                "wx": [int((cents * bp).sum())],
                "w": [int(cents.sum())],
            }
        )

    from ..shuffle import map_partials

    parts = map_partials(
        f"{sf_dir}/lineitem.parquet",
        ["l_extendedprice", "l_discount"],
        None,
        partial,
    )
    n = int(parts["n"].sum())
    w = sum(int(x) for x in parts["w"])
    wx = sum(int(x) for x in parts["wx"])
    return pd.DataFrame(
        {
            "n_rows": pd.Series([n], dtype="int64"),
            "weight_cents": pd.Series([w], dtype="int64"),
            "wavg_discount": [
                _r(float(wx) / float(w) / 10000.0, 6) if w else None
            ],
        }
    )


def _exact_sq_sum(c: np.ndarray) -> int:
    """Σc² as an EXACT Python int: int64 partial sums over 512-element
    chunks (exact while c² · 512 < 2⁶³, i.e. every |c| < 4.2e9 — cents
    of a $42M row; far above any price column), then an
    arbitrary-precision total. Vectorized except the ≤ len/512 chunk
    merge."""
    if len(c) == 0:
        return 0
    sq = c * c
    cuts = np.arange(0, len(sq), 512)
    chunks = np.add.reduceat(sq, cuts)
    return sum(int(x) for x in chunks)


def welch_ttest_price_returnflag(sf_dir: str) -> pd.DataFrame:
    """Welch's two-sample t-test between returned ('R') and accepted
    ('A') extended prices — the parametric counterpart of the exact KS
    test above (same populations, same filter). Bit-exact across
    engines WITHOUT matching any streaming-variance implementation:
    prices fix to integer cents, each scan task emits per-group
    (n, Σc, Σc²) with Σc² kept exact via chunked big-int summation, the
    driver merges Python ints (the HUGEINT mirror — DuckDB's SUM(c*c)
    is HUGEINT), and every reported float is ONE conversion of an exact
    integer ratio: var/n = (n·Σc² − (Σc)²) / (n²(n−1)), Δmean =
    (s1ᵃnᵇ − s1ᵇnᵃ)/(nᵃnᵇ) — so both engines build t and the Welch df
    from identical doubles. No exchange: the partial is 6 integers per
    (group, task)."""
    fsql = "l_returnflag IN ('R', 'A') AND l_extendedprice IS NOT NULL"

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        rows = []
        for flag in ("R", "A"):
            v = df.loc[df["l_returnflag"] == flag, "l_extendedprice"]
            c = round_duck(v.to_numpy(np.float64) * 100.0, 0).astype(
                np.int64
            )
            rows.append((flag, len(c), int(c.sum()), _exact_sq_sum(c)))
        return pd.DataFrame(rows, columns=["f", "n", "s1", "s2"]).astype(
            {"s2": "object"}
        )

    from ..shuffle import map_partials

    parts = map_partials(
        f"{sf_dir}/lineitem.parquet",
        ["l_extendedprice", "l_returnflag"],
        fsql,
        partial,
    )

    def fold(flag: str) -> tuple[int, int, int]:
        g = parts[parts["f"] == flag]
        return (
            int(g["n"].sum()),
            sum(int(x) for x in g["s1"]),
            sum(int(x) for x in g["s2"]),
        )

    nr, s1r, s2r = fold("R")
    na, s1a, s2a = fold("A")

    def var_over_n(n: int, s1: int, s2: int) -> float | None:
        if n < 2:
            return None
        return float(n * s2 - s1 * s1) / float(n * n * (n - 1))

    def mean_price(n: int, s1: int) -> float | None:
        return float(s1) / float(n) / 100.0 if n else None

    def var_price(n: int, s1: int, s2: int) -> float | None:
        if n < 2:
            return None
        return float(n * s2 - s1 * s1) / float(n * (n - 1)) / 10000.0

    vr, va = var_over_n(nr, s1r, s2r), var_over_n(na, s1a, s2a)
    t = df_w = None
    if vr is not None and va is not None and (vr + va) > 0:
        d = float(s1r * na - s1a * nr) / float(nr * na)
        se2 = vr + va
        t = d / math.sqrt(se2)
        df_w = (se2 * se2) / (vr * vr / (nr - 1) + va * va / (na - 1))
    return pd.DataFrame(
        {
            "n_r": pd.Series([nr], dtype="int64"),
            "n_a": pd.Series([na], dtype="int64"),
            "mean_r": [_r(mean_price(nr, s1r), 6)],
            "mean_a": [_r(mean_price(na, s1a), 6)],
            "var_r": [_r(var_price(nr, s1r, s2r), 4)],
            "var_a": [_r(var_price(na, s1a, s2a), 4)],
            "t_stat": [_r(t, 6)],
            "welch_df": [_r(df_w, 4)],
        }
    )


def theil_revenue_customers(
    sf_dir: str, num_buckets: int | None = None
) -> pd.DataFrame:
    """Theil T index of customer revenue — the entropy-based inequality
    measure next to the Gini (selection.gini_revenue_customers): unlike
    Gini it needs NO rank statistics, so one customer-hash exchange
    suffices. T = Σ(x/S)·ln(x·N/S) = fsum(x·ln x)/S + ln N − ln S with
    x = the customer's EXACT integer-cent total (finalized inside its
    bucket), S and N exact driver-merged ints, and each x·ln x term the
    identical int→double→ln tree on both engines; zero-revenue
    customers drop on both sides (x·ln x → 0 limit, SQL WHERE m > 0).
    Each bucket folds to (count, Σx, fsum-partial) — the driver's
    fsum-of-fsums differs from the oracle's global fsum only by the
    partial-composition ulp (≪ the 6dp rounding)."""
    from .dedup import _dedup_buckets, _fused_grouped_frames

    nb = num_buckets or _dedup_buckets()
    mult = np.uint64(0x9E3779B97F4A7C15)

    def order_partials(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["o_custkey", "o_totalprice"])
        cents = round_duck(
            df["o_totalprice"].to_numpy(np.float64) * 100.0, 0
        ).astype(np.int64)
        part = (
            pd.DataFrame(
                {"key": df["o_custkey"].to_numpy(np.int64), "m": cents}
            )
            .groupby("key", as_index=False)["m"]
            .sum()
        )
        key = part["key"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "key": key,
                "m": part["m"].to_numpy(np.int64),
                "__bucket": (
                    key.astype(np.uint64) * mult % np.uint64(nb)
                ).astype(np.int32),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"n": pd.Series([0], dtype="int64"),
                 "s": pd.Series([0], dtype="int64"),
                 "w": pd.Series([0.0], dtype="float64")}
            )
        g = df.groupby("key", as_index=False)["m"].sum()
        m = g["m"].to_numpy(np.int64)
        m = m[m > 0]
        if len(m) == 0:
            return pd.DataFrame({"n": [0], "s": [0], "w": [0.0]})
        mf = m.astype(np.float64)
        w = math.fsum((mf * np.log(mf)).tolist())
        return pd.DataFrame(
            {"n": [int(len(m))], "s": [int(m.sum())], "w": [float(w)]}
        )

    parts = _fused_grouped_frames(
        [
            (
                f"{sf_dir}/orders.parquet",
                ["o_custkey", "o_totalprice"],
                None,
                order_partials,
            )
        ],
        nb,
        fold,
    )
    n = int(parts["n"].sum())
    if n == 0:
        return pd.DataFrame(
            {
                "n_customers": pd.Series([], dtype="int64"),
                "total_cents": pd.Series([], dtype="int64"),
                "theil_t": pd.Series([], dtype="float64"),
            }
        )
    s = sum(int(x) for x in parts["s"])
    w = math.fsum(float(x) for x in parts["w"])
    theil = w / float(s) + math.log(float(n)) - math.log(float(s))
    return pd.DataFrame(
        {
            "n_customers": pd.Series([n], dtype="int64"),
            "total_cents": pd.Series([s], dtype="int64"),
            "theil_t": [_r(theil, 6)],
        }
    )


def mannwhitney_price_returnflag(
    sf_dir: str, num_buckets: int | None = None
) -> pd.DataFrame:
    """Exact Mann-Whitney U (Wilcoxon rank-sum) between returned ('R')
    and accepted ('A') extended prices — the nonparametric location test
    next to the exact KS (distribution shape) and Welch t (parametric
    means): needs GLOBAL midranks, so it rides the same range-partition
    machinery as the KS test. Doubled rank sum stays integer under
    midrank ties: 2·R₁ = Σ_v c₁(v)·(2·cum_before(v) + t(v) + 1), where
    cum_before comes from the shuffle-free count pass's prefix offsets
    and a within-bucket exclusive cumsum (the bucket owns its whole
    value range). Each bucket folds to TWO integers (2R₁ partial and the
    tie correction Σ t³−t); the driver merges Python ints, and U, the
    common-language effect size AUC = U/(n₁n₂) and the tie-corrected
    normal z are each built from the same exact integers with one
    int→double conversion per factor on both engines. Per-bucket int64
    bound: n₁·2N < 2⁶³ (same ~3e9-rows-per-side validity as the KS
    numerator; beyond that the fold needs Python-int partials)."""
    from ..io import footer_column_minmax, list_parquet_files
    from ..shuffle import map_partials
    from .dedup import _fused_grouped_frames
    from .windows import scaled_num_buckets

    path = f"{sf_dir}/lineitem.parquet"
    fsql = "l_returnflag IN ('R', 'A') AND l_extendedprice IS NOT NULL"
    cols = ["l_extendedprice", "l_returnflag"]
    n_buckets = num_buckets or scaled_num_buckets(count_rows(path))

    empty = pd.DataFrame(
        {
            "n_r": pd.Series([], dtype="int64"),
            "n_a": pd.Series([], dtype="int64"),
            "r2_r": pd.Series([], dtype="int64"),
            "tie_term": pd.Series([], dtype="int64"),
            "u_r": pd.Series([], dtype="float64"),
            "auc_r": pd.Series([], dtype="float64"),
            "z": pd.Series([], dtype="float64"),
        }
    )

    try:
        mm = footer_column_minmax(list_parquet_files(path), "l_extendedprice")
    except Exception:
        mm = None
    if mm is None:

        def minmax_partial(batch: pa.Table) -> pd.DataFrame:
            v = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            v = v[~np.isnan(v)]
            if len(v) == 0:
                return pd.DataFrame({"mn": [], "mx": []}, dtype="float64")
            return pd.DataFrame({"mn": [v.min()], "mx": [v.max()]})

        p = map_partials(path, ["l_extendedprice"], fsql, minmax_partial)
        if len(p) == 0:
            return empty
        mm = (float(p["mn"].min()), float(p["mx"].max()))
    lo = int(round_duck(mm[0] * 100.0, 0))
    hi = int(round_duck(mm[1] * 100.0, 0))
    bnds = np.unique(np.linspace(lo, hi, n_buckets + 1)[1:-1].astype(np.int64))
    n_b = len(bnds) + 1

    def cents_and_flag(df: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        cents = round_duck(
            df["l_extendedprice"].to_numpy(np.float64) * 100.0, 0
        )
        return cents.astype(np.int64), (
            df["l_returnflag"].to_numpy() == "R"
        )

    def tot_partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        v, is_r = cents_and_flag(df)
        b = np.searchsorted(bnds, v, side="right")
        return pd.DataFrame(
            {
                "bucket": np.arange(n_b, dtype=np.int64),
                "t1": np.bincount(b[is_r], minlength=n_b).astype("int64"),
                "t2": np.bincount(b[~is_r], minlength=n_b).astype("int64"),
            }
        )

    tots = (
        map_partials(path, cols, fsql, tot_partial)
        .groupby("bucket")[["t1", "t2"]]
        .sum()
        .reindex(range(n_b), fill_value=0)
    )
    n1 = int(tots["t1"].sum())
    n2 = int(tots["t2"].sum())
    if n1 + n2 == 0:
        return empty
    both = (tots["t1"] + tots["t2"]).cumsum().to_numpy()
    off = np.r_[0, both[:-1]]  # combined count strictly before the bucket

    def proj(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        v, is_r = cents_and_flag(df)
        out = (
            pd.DataFrame(
                {
                    "v": v,
                    "c1": is_r.astype(np.int64),
                    "c2": (~is_r).astype(np.int64),
                }
            )
            .groupby("v", as_index=False)
            .sum()
        )
        out["__bucket"] = np.searchsorted(
            bnds, out["v"].to_numpy(), side="right"
        ).astype(np.int32)
        return out

    def mw_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "r2": pd.Series([], dtype="int64"),
                    "tt": pd.Series([], dtype="int64"),
                }
            )
        b = int(g["__bucket"].iloc[0])
        c = (
            g.groupby("v", as_index=False)[["c1", "c2"]]
            .sum()
            .sort_values("v")
        )
        t = (c["c1"] + c["c2"]).to_numpy(np.int64)
        cb = int(off[b]) + np.r_[0, t.cumsum()[:-1]]
        c1 = c["c1"].to_numpy(np.int64)
        r2 = int((c1 * (2 * cb + t + 1)).sum())
        tt = int((t * t * t - t).sum())
        return pd.DataFrame(
            {
                "r2": pd.Series([r2], dtype="int64"),
                "tt": pd.Series([tt], dtype="int64"),
            }
        )

    parts = _fused_grouped_frames([(path, cols, fsql, proj)], n_b, mw_in_bucket)
    r2 = sum(int(x) for x in parts["r2"])
    tt = sum(int(x) for x in parts["tt"])
    u2 = r2 - n1 * (n1 + 1)  # = 2·U₁, exact
    n_tot = n1 + n2
    u_r = auc = z = None
    if n1 and n2:
        u_r = float(u2) / 2.0
        auc = float(u2) / float(2 * n1 * n2)
        if n_tot > 1:
            var4 = (float(n1 * n2) / 3.0) * (
                float(n_tot + 1)
                - float(tt) / float(n_tot * (n_tot - 1))
            )
            if var4 > 0:
                z = float(u2 - n1 * n2) / math.sqrt(var4)
    return pd.DataFrame(
        {
            "n_r": pd.Series([n1], dtype="int64"),
            "n_a": pd.Series([n2], dtype="int64"),
            "r2_r": pd.Series([r2], dtype="int64"),
            "tie_term": pd.Series([tt], dtype="int64"),
            "u_r": [_r(u_r, 1)],
            "auc_r": [_r(auc, 6)],
            "z": [_r(z, 6)],
        }
    )


def anova_price_returnflag(sf_dir: str) -> pd.DataFrame:
    """One-way ANOVA F-test of extended price across ALL THREE return
    flags (A/N/R) — the k-group generalization of the Welch pair test
    above: does the flag explain any of the price variance? Same
    exact-integer machinery (per-group (n, Σc, Σc²) with Σc² exact via
    chunked big-int summation, Python-int merge = HUGEINT mirror), and
    the sums of squares are built from ONE shared expression tree on
    both engines: each group's s1²/n is ONE int→double ratio, their
    fsum A is order-independent (correctly-rounded sum of the multiset),
    SSB = A − S1²/N and SSW = S2 − A are single subtractions of exact-int
    conversions — so F = (SSB/(k−1))/(SSW/(N−k)) and η² = SSB/SST are
    identical doubles before rounding. No exchange: 6 integers per
    (group, task)."""
    fsql = "l_returnflag IN ('A', 'N', 'R') AND l_extendedprice IS NOT NULL"

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        rows = []
        for flag in ("A", "N", "R"):
            v = df.loc[df["l_returnflag"] == flag, "l_extendedprice"]
            c = round_duck(v.to_numpy(np.float64) * 100.0, 0).astype(
                np.int64
            )
            if len(c):
                rows.append((flag, len(c), int(c.sum()), _exact_sq_sum(c)))
        return pd.DataFrame(rows, columns=["f", "n", "s1", "s2"]).astype(
            {"s2": "object"}
        )

    from ..shuffle import map_partials

    parts = map_partials(
        f"{sf_dir}/lineitem.parquet",
        ["l_extendedprice", "l_returnflag"],
        fsql,
        partial,
    )
    groups = []
    for flag, g in parts.groupby("f", sort=True):
        n = int(g["n"].sum())
        if n:  # SQL GROUP BY emits no row for an absent flag
            groups.append(
                (n, sum(int(x) for x in g["s1"]), sum(int(x) for x in g["s2"]))
            )
    k = len(groups)
    nn = sum(n for n, _, _ in groups)
    if nn == 0:
        return pd.DataFrame(
            {
                "n_rows": pd.Series([], dtype="int64"),
                "n_groups": pd.Series([], dtype="int64"),
                "f_stat": pd.Series([], dtype="float64"),
                "eta_sq": pd.Series([], dtype="float64"),
            }
        )
    t1 = sum(s1 for _, s1, _ in groups)
    t2 = sum(s2 for _, _, s2 in groups)
    a = math.fsum(float(s1 * s1) / float(n) for n, s1, _ in groups)
    ssb = a - float(t1 * t1) / float(nn)
    ssw = float(t2) - a
    f_stat = eta = None
    if k >= 2 and nn - k >= 1 and ssw > 0:
        f_stat = (ssb / float(k - 1)) / (ssw / float(nn - k))
    if ssb + ssw > 0:
        eta = ssb / (ssb + ssw)
    return pd.DataFrame(
        {
            "n_rows": pd.Series([nn], dtype="int64"),
            "n_groups": pd.Series([k], dtype="int64"),
            "f_stat": [_r(f_stat, 6)],
            "eta_sq": [_r(eta, 6)],
        }
    )


def cusum_changepoint_events(sf_dir: str) -> pd.DataFrame:
    """CUSUM changepoint on the daily event-count series — WHERE did the
    level shift, not just which days are outliers (anomalous_days_events
    answers that): the split day k maximizing |S_k| with
    S_k = Σ_{i≤k}(c_i − mean). Daily counts are the same
    calendar-bounded integer partials as the z-score op; the driver
    scans the ≤ days series with EXACT integers — N·S_k = N·prefix_k −
    k·T never touches a float, so the argmax (ties → earliest day)
    cannot race accumulation noise, and every reported float is one
    conversion of an exact integer ratio (|S| = metric/N, the segment
    means = prefix ratios). The last day is excluded (S_N ≡ 0 — an
    empty right segment is not a split)."""
    from ..shuffle import map_partials

    path = f"{sf_dir}/events.parquet"
    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["ts"])
        ts_us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        day = (ts_us // day_us) * day_us
        cnt = pd.Series(day).value_counts()
        return pd.DataFrame(
            {"day": cnt.index.to_numpy(np.int64), "c": cnt.to_numpy().astype("int64")}
        )

    parts = map_partials(path, ["ts"], None, partial)
    by_day = parts.groupby("day")["c"].sum().sort_index()
    n = len(by_day)
    empty = pd.DataFrame(
        {
            "n_days": pd.Series([], dtype="int64"),
            "cp_day": pd.Series([], dtype="datetime64[us]"),
            "cusum_max": pd.Series([], dtype="float64"),
            "mean_before": pd.Series([], dtype="float64"),
            "mean_after": pd.Series([], dtype="float64"),
        }
    )
    if n < 2:  # no interior split point (SQL: k < n matches no row)
        return empty
    days = by_day.index.to_numpy(np.int64)
    c = [int(x) for x in by_day.to_numpy()]
    total = sum(c)
    best = None  # (metric, day_us, k, prefix) — exact ints
    pref = 0
    for k in range(1, n):  # split after day k (1-based), right side non-empty
        pref += c[k - 1]
        metric = abs(n * pref - k * total)
        if best is None or metric > best[0]:
            best = (metric, int(days[k - 1]), k, pref)
    metric, cp_us, k, pref = best
    return pd.DataFrame(
        {
            "n_days": pd.Series([n], dtype="int64"),
            "cp_day": pd.Series([cp_us], dtype="int64").astype("datetime64[us]"),
            "cusum_max": [_r(float(metric) / float(n), 4)],
            "mean_before": [_r(float(pref) / float(k), 6)],
            "mean_after": [_r(float(total - pref) / float(n - k), 6)],
        }
    )


def ewma_daily_events(sf_dir: str, alpha: float = 0.3) -> pd.DataFrame:
    """Exponentially-weighted moving average of the daily event-count
    series — the classic monitoring smoother, and the one window family
    not yet covered: a RECURSIVE window (s_k = α·c_k + (1−α)·s_{k−1},
    s_1 = c_1) that plain SQL frames cannot express. Daily counts are
    the usual calendar-bounded integer partials; the driver evaluates
    the ≤ days series via the CLOSED FORM — s_k is an fsum over k terms
    α·(1−α)^{k−i}·c_i (the i=1 seed term without α) — the same
    expression tree the oracle's self-join fsum builds, with pow/fsum
    from the same libm, so every smoothed value is bit-identical before
    the 6-dp pin. O(days²) terms total, bounded by the calendar, never
    by data size."""
    from ..shuffle import map_partials

    path = f"{sf_dir}/events.parquet"
    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["ts"])
        ts_us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        day = (ts_us // day_us) * day_us
        cnt = pd.Series(day).value_counts()
        return pd.DataFrame(
            {"day": cnt.index.to_numpy(np.int64), "c": cnt.to_numpy().astype("int64")}
        )

    parts = map_partials(path, ["ts"], None, partial)
    by_day = parts.groupby("day")["c"].sum().sort_index()
    if len(by_day) == 0:
        return pd.DataFrame(
            {
                "k": pd.Series([], dtype="int64"),
                "day": pd.Series([], dtype="datetime64[us]"),
                "c": pd.Series([], dtype="int64"),
                "ewma": pd.Series([], dtype="float64"),
            }
        )
    days = by_day.index.to_numpy(np.int64)
    c = [float(x) for x in by_day.to_numpy()]
    one_m = 1.0 - alpha
    rows = []
    for k in range(1, len(c) + 1):
        terms = [math.pow(one_m, k - 1) * c[0]]
        terms += [
            alpha * math.pow(one_m, k - i) * c[i - 1] for i in range(2, k + 1)
        ]
        rows.append((k, int(days[k - 1]), int(c[k - 1]), math.fsum(terms)))
    out = pd.DataFrame(rows, columns=["k", "day", "c", "ewma"])
    out["day"] = out["day"].astype("datetime64[us]")
    out["ewma"] = round_duck(out["ewma"].to_numpy(np.float64), 6)
    return out.astype({"k": "int64", "c": "int64"})


def rate_ratio_events(sf_dir: str) -> pd.DataFrame:
    """Two-period event-rate comparison — the Poisson A/B test on
    counts: split the observed day span at its midpoint and test whether
    the daily rate changed (the CUSUM op locates a shift; this one
    quantifies first-half vs second-half with a z statistic). The split
    day is exact integer arithmetic on epoch-days ((min+max)//2), both
    period lengths are CALENDAR days (so missing days lower the rate,
    as a monitoring rate should), counts come from the same daily
    partials, and every reported float is one conversion of an exact
    integer ratio — z's divisor sqrt(n1/d1² + n2/d2²) is built from the
    identical two ratios on both engines."""
    from ..shuffle import map_partials

    path = f"{sf_dir}/events.parquet"
    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["ts"])
        ts_us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        day = ts_us // day_us
        cnt = pd.Series(day).value_counts()
        return pd.DataFrame(
            {"day": cnt.index.to_numpy(np.int64), "c": cnt.to_numpy().astype("int64")}
        )

    parts = map_partials(path, ["ts"], None, partial)
    empty = pd.DataFrame(
        {
            "n1": pd.Series([], dtype="int64"),
            "n2": pd.Series([], dtype="int64"),
            "days1": pd.Series([], dtype="int64"),
            "days2": pd.Series([], dtype="int64"),
            "rate1": pd.Series([], dtype="float64"),
            "rate2": pd.Series([], dtype="float64"),
            "rate_ratio": pd.Series([], dtype="float64"),
            "z": pd.Series([], dtype="float64"),
        }
    )
    if len(parts) == 0:
        return empty
    by_day = parts.groupby("day")["c"].sum()
    days = by_day.index.to_numpy(np.int64)
    lo, hi = int(days.min()), int(days.max())
    split = (lo + hi) // 2  # last day of period 1, exact int both engines
    d1, d2 = split - lo + 1, hi - split
    n1 = int(by_day[days <= split].sum())
    n2 = int(by_day[days > split].sum())
    if d2 == 0:  # single-day span: no second period (SQL: NULL row pruned)
        return empty
    r1 = float(n1) / float(d1)
    r2 = float(n2) / float(d2)
    z = None
    se2 = float(n1) / float(d1 * d1) + float(n2) / float(d2 * d2)
    if se2 > 0:
        z = (r1 - r2) / math.sqrt(se2)
    ratio = r1 / r2 if n2 > 0 else None
    return pd.DataFrame(
        {
            "n1": pd.Series([n1], dtype="int64"),
            "n2": pd.Series([n2], dtype="int64"),
            "days1": pd.Series([d1], dtype="int64"),
            "days2": pd.Series([d2], dtype="int64"),
            "rate1": [_r(r1, 6)],
            "rate2": [_r(r2, 6)],
            "rate_ratio": [_r(ratio, 6)],
            "z": [_r(z, 6)],
        }
    )


def _qty_disc_cells(sf_dir: str) -> pd.DataFrame:
    """Shared contingency scan for the rank-correlation pair below:
    per-batch (quantity, discount-basis-point, count) integer partials
    over pairwise-complete rows, merged on the driver — both columns
    have bounded vocabularies (≤ 50 × ≤ 11 values), so the exchange is
    ≤ 550 rows per task and the full joint distribution fits the driver
    exactly. This is how rank statistics escape the global sort when a
    column is low-cardinality: ranks are a function of the marginal
    counts alone."""
    from ..shuffle import map_partials

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["l_quantity", "l_discount"])
        # round_duck, not a bare int cast: DuckDB CAST(x AS BIGINT) rounds
        # half away from zero while numpy .astype truncates — equal only
        # on exactly-integral quantities, so mirror CAST semantics
        x = round_duck(df["l_quantity"].to_numpy(np.float64), 0).astype(np.int64)
        y = round_duck(df["l_discount"].to_numpy(np.float64) * 100.0, 0).astype(
            np.int64
        )
        vc = pd.DataFrame({"x": x, "y": y}).value_counts()
        idx = vc.index.to_frame(index=False)
        return pd.DataFrame(
            {
                "x": idx["x"].astype("int64"),
                "y": idx["y"].astype("int64"),
                "c": vc.to_numpy().astype("int64"),
            }
        )

    parts = map_partials(
        f"{sf_dir}/lineitem.parquet",
        ["l_quantity", "l_discount"],
        None,
        partial,
    )
    return parts.groupby(["x", "y"], as_index=False)["c"].sum()


def _doubled_midranks(cells: pd.DataFrame, col: str) -> dict:
    """{value: 2·midrank} from the marginal counts — 2·midrank =
    2·(count of smaller values) + tie_count + 1 is an exact INTEGER, so
    every rank sum below stays in exact arithmetic."""
    marg = cells.groupby(col)["c"].sum().sort_index()
    out, cum = {}, 0
    for v, t in marg.items():
        out[int(v)] = 2 * cum + int(t) + 1
        cum += int(t)
    return out


def spearman_qty_discount(sf_dir: str) -> pd.DataFrame:
    """Spearman rank correlation between quantity and discount — the
    monotone-association test Pearson misses (corr_matrix measures
    linearity), computed WITHOUT a global sort: both columns are
    bounded-vocabulary, so the joint contingency (≤ 550 integer cells)
    determines the midranks and every rank sum exactly. Doubled
    midranks keep all six sums (n, Σdx, Σdy, Σdx², Σdy², Σdxdy) exact
    integers (Python-int merge = HUGEINT mirror), and ρ is built from
    them with the identical expression tree on both engines — one
    double conversion per factor, one sqrt. Valid while n·Σdx² < 2⁶³·…
    on the SQL side (HUGEINT, ~10⁹ rows at doubled-rank scale);
    the engine side is arbitrary-precision."""
    cells = _qty_disc_cells(sf_dir)
    empty = pd.DataFrame(
        {
            "n_rows": pd.Series([], dtype="int64"),
            "spearman_rho": pd.Series([], dtype="float64"),
        }
    )
    if len(cells) == 0:
        return empty
    dx = _doubled_midranks(cells, "x")
    dy = _doubled_midranks(cells, "y")
    n = sx = sy = sxx = syy = sxy = 0
    for x, y, c in cells.itertuples(index=False):
        a, b, ci = dx[int(x)], dy[int(y)], int(c)
        n += ci
        sx += ci * a
        sy += ci * b
        sxx += ci * a * a
        syy += ci * b * b
        sxy += ci * a * b
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    if n == 0 or vx <= 0 or vy <= 0:  # a constant column has no ranks
        return empty
    rho = float(n * sxy - sx * sy) / math.sqrt(float(vx) * float(vy))
    return pd.DataFrame(
        {
            "n_rows": pd.Series([n], dtype="int64"),
            "spearman_rho": [_r(rho, 6)],
        }
    )


def kendall_qty_discount(sf_dir: str) -> pd.DataFrame:
    """Kendall τ-b between quantity and discount — the concordance-based
    rank correlation (more robust to outlier ranks than Spearman, the
    standard for heavily tied data): P − Q over concordant/discordant
    pairs with tie corrections. Same one-scan contingency as the
    Spearman op; concordant/discordant pair counts are Σ cᵢ·cⱼ over
    cell pairs ordered both ways / opposite ways — an O(cells²) ≤ 550²
    exact-integer fold on the driver, never a row-pair join. τ_b =
    (P−Q)/√((n₀−t_x)(n₀−t_y)) from exact ints with the identical
    tree on both engines."""
    cells = _qty_disc_cells(sf_dir)
    empty = pd.DataFrame(
        {
            "n_rows": pd.Series([], dtype="int64"),
            "concordant": pd.Series([], dtype="int64"),
            "discordant": pd.Series([], dtype="int64"),
            "kendall_tau": pd.Series([], dtype="float64"),
        }
    )
    if len(cells) == 0:
        return empty
    x = cells["x"].to_numpy(np.int64)
    y = cells["y"].to_numpy(np.int64)
    c = cells["c"].to_numpy(np.int64)
    # pairwise cell comparisons (≤ 550² bools) — exact int pair counts;
    # object dtype so the Σ cᵢ·cⱼ products merge at arbitrary precision
    co = c.astype(object)
    xl = x[:, None] < x[None, :]
    yl = y[:, None] < y[None, :]
    yg = y[:, None] > y[None, :]
    prod = co[:, None] * co[None, :]
    p = int((prod * (xl & yl)).sum())
    q = int((prod * (xl & yg)).sum())
    n = int(c.sum())
    marg_x = cells.groupby("x")["c"].sum().to_numpy(np.int64)
    marg_y = cells.groupby("y")["c"].sum().to_numpy(np.int64)
    n0 = n * (n - 1) // 2
    tx = sum(int(t) * (int(t) - 1) // 2 for t in marg_x)
    ty = sum(int(t) * (int(t) - 1) // 2 for t in marg_y)
    if n0 - tx <= 0 or n0 - ty <= 0:  # a constant column: τ undefined
        return empty
    tau = float(p - q) / math.sqrt(float(n0 - tx) * float(n0 - ty))
    return pd.DataFrame(
        {
            "n_rows": pd.Series([n], dtype="int64"),
            "concordant": pd.Series([p], dtype="int64"),
            "discordant": pd.Series([q], dtype="int64"),
            "kendall_tau": [_r(tau, 6)],
        }
    )


def geomean_price_returnflag(sf_dir: str) -> pd.DataFrame:
    """Geometric mean of extended price per return flag — the log-domain
    aggregate (the right average for multiplicative quantities; heavily
    right-skewed prices drag the arithmetic mean, not this one). Prices
    fix to integer cents; each scan task folds its rows to per-group
    (n, fsum(ln cents)) partials and the driver fsum-merges the ≤ tasks
    partial sums — each level correctly rounded, so the merged total
    sits within a few ulps of DuckDB's exact single-level fsum; at
    Σln ~ n·11 magnitude that is ≤1e-9 absolute, and exp amplifies it
    to ≤1e-10 of the mean — far inside the 6-dp pin. The expression
    tree (exp(fsum/n)/100 in dollars) is identical on both engines."""
    fsql = "l_returnflag IN ('A', 'N', 'R') AND l_extendedprice IS NOT NULL"

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        rows = []
        for flag in ("A", "N", "R"):
            v = df.loc[df["l_returnflag"] == flag, "l_extendedprice"]
            c = round_duck(v.to_numpy(np.float64) * 100.0, 0)
            c = c[c > 0]  # ln domain; SQL filter mirrors
            if len(c):
                rows.append(
                    (flag, len(c), math.fsum(np.log(c).tolist()))
                )
        return pd.DataFrame(rows, columns=["f", "n", "s"])

    from ..shuffle import map_partials

    parts = map_partials(
        f"{sf_dir}/lineitem.parquet",
        ["l_extendedprice", "l_returnflag"],
        fsql,
        partial,
    )
    rows = []
    for flag, g in parts.groupby("f", sort=True):
        n = int(g["n"].sum())
        if n == 0:
            continue
        s = math.fsum(float(x) for x in g["s"])
        rows.append(
            (flag, n, float(round_duck(math.exp(s / float(n)) / 100.0, 6)))
        )
    return pd.DataFrame(
        rows, columns=["l_returnflag", "n", "geomean_price"]
    ).astype({"n": "int64"}) if rows else pd.DataFrame(
        {
            "l_returnflag": pd.Series([], dtype="object"),
            "n": pd.Series([], dtype="int64"),
            "geomean_price": pd.Series([], dtype="float64"),
        }
    )


ORACLE_SQL: dict[str, str] = {
    "geomean_price_returnflag": """
        WITH b AS (
            SELECT l_returnflag AS f,
                   CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS c
            FROM lineitem
            WHERE l_returnflag IN ('A', 'N', 'R')
              AND l_extendedprice IS NOT NULL
        )
        SELECT f AS l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(exp(fsum(ln(CAST(c AS DOUBLE)))
                         / CAST(COUNT(*) AS DOUBLE)) / 100.0, 6)
                   AS geomean_price
        FROM b WHERE c > 0 GROUP BY f ORDER BY f
    """,
    "spearman_qty_discount": """
        WITH b AS (
            SELECT CAST(l_quantity AS BIGINT) AS x,
                   CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS y
            FROM lineitem
            WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
        ),
        cells AS (SELECT x, y, COUNT(*) AS c FROM b GROUP BY x, y),
        mx AS (SELECT x, SUM(c) AS t FROM cells GROUP BY x),
        my AS (SELECT y, SUM(c) AS t FROM cells GROUP BY y),
        rx AS (
            SELECT x, 2 * (SUM(t) OVER (ORDER BY x) - t) + t + 1 AS dx
            FROM mx
        ),
        ry AS (
            SELECT y, 2 * (SUM(t) OVER (ORDER BY y) - t) + t + 1 AS dy
            FROM my
        ),
        tot AS (
            SELECT SUM(c) AS n, SUM(c * dx) AS sx, SUM(c * dy) AS sy,
                   SUM(c * dx * dx) AS sxx, SUM(c * dy * dy) AS syy,
                   SUM(c * dx * dy) AS sxy
            FROM cells JOIN rx USING (x) JOIN ry USING (y)
        )
        SELECT CAST(n AS BIGINT) AS n_rows,
               ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(n * syy - sy * sy AS DOUBLE)), 6)
                   AS spearman_rho
        FROM tot
        WHERE n > 0 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
    "kendall_qty_discount": """
        WITH b AS (
            SELECT CAST(l_quantity AS BIGINT) AS x,
                   CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS y
            FROM lineitem
            WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
        ),
        cells AS (SELECT x, y, COUNT(*) AS c FROM b GROUP BY x, y),
        pq AS (
            SELECT SUM(a.c * d.c)
                       FILTER (WHERE a.x < d.x AND a.y < d.y) AS p,
                   SUM(a.c * d.c)
                       FILTER (WHERE a.x < d.x AND a.y > d.y) AS q
            FROM cells a, cells d
        ),
        t AS (
            SELECT (SELECT SUM(c) FROM cells) AS n,
                   (SELECT SUM(t * (t - 1) // 2)
                    FROM (SELECT SUM(c) AS t FROM cells GROUP BY x))
                       AS tx,
                   (SELECT SUM(t * (t - 1) // 2)
                    FROM (SELECT SUM(c) AS t FROM cells GROUP BY y))
                       AS ty,
                   COALESCE(p, 0) AS p, COALESCE(q, 0) AS q
            FROM pq
        )
        SELECT CAST(n AS BIGINT) AS n_rows,
               CAST(p AS BIGINT) AS concordant,
               CAST(q AS BIGINT) AS discordant,
               ROUND(CAST(p - q AS DOUBLE)
                     / sqrt(CAST(n * (n - 1) // 2 - tx AS DOUBLE)
                            * CAST(n * (n - 1) // 2 - ty AS DOUBLE)), 6)
                   AS kendall_tau
        FROM t
        WHERE n > 0 AND n * (n - 1) // 2 - tx > 0
          AND n * (n - 1) // 2 - ty > 0
    """,
    "ewma_daily_events": """
        WITH d AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   COUNT(*) AS c
            FROM events WHERE ts IS NOT NULL GROUP BY 1
        ),
        w AS (
            SELECT day, c, ROW_NUMBER() OVER (ORDER BY day) AS k FROM d
        )
        SELECT CAST(a.k AS BIGINT) AS k, a.day AS day,
               CAST(a.c AS BIGINT) AS c,
               ROUND(fsum(CASE WHEN b.k = 1
                          THEN pow(0.7, a.k - 1) * b.c
                          ELSE 0.3 * pow(0.7, a.k - b.k) * b.c END), 6)
                   AS ewma
        FROM w a JOIN w b ON b.k <= a.k
        GROUP BY a.k, a.day, a.c ORDER BY a.k
    """,
    "rate_ratio_events": """
        WITH d AS (
            SELECT epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
            FROM events WHERE ts IS NOT NULL GROUP BY 1
        ),
        b AS (
            SELECT (MIN(day) + MAX(day)) // 2 AS split,
                   MIN(day) AS lo, MAX(day) AS hi
            FROM d
        ),
        s AS (
            SELECT SUM(c) FILTER (WHERE day <= split) AS n1,
                   SUM(c) FILTER (WHERE day > split) AS n2,
                   MAX(split - lo + 1) AS d1,
                   MAX(hi - split) AS d2
            FROM d, b
        ),
        v AS (
            SELECT COALESCE(n1, 0) AS n1, COALESCE(n2, 0) AS n2, d1, d2,
                   CAST(COALESCE(n1, 0) AS DOUBLE) / CAST(d1 AS DOUBLE)
                       AS r1,
                   CAST(COALESCE(n2, 0) AS DOUBLE) / CAST(d2 AS DOUBLE)
                       AS r2,
                   CAST(COALESCE(n1, 0) AS DOUBLE)
                       / CAST(d1 * d1 AS DOUBLE)
                   + CAST(COALESCE(n2, 0) AS DOUBLE)
                       / CAST(d2 * d2 AS DOUBLE) AS se2
            FROM s WHERE d2 > 0
        )
        SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
               CAST(d1 AS BIGINT) AS days1, CAST(d2 AS BIGINT) AS days2,
               ROUND(r1, 6) AS rate1, ROUND(r2, 6) AS rate2,
               CASE WHEN n2 > 0 THEN ROUND(r1 / r2, 6) END AS rate_ratio,
               CASE WHEN se2 > 0 THEN
                   ROUND((r1 - r2) / sqrt(se2), 6)
               END AS z
        FROM v
    """,
    "anova_price_returnflag": """
        WITH b AS (
            SELECT l_returnflag AS f,
                   CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS c
            FROM lineitem
            WHERE l_returnflag IN ('A', 'N', 'R')
              AND l_extendedprice IS NOT NULL
        ),
        g AS (
            SELECT f, COUNT(*) AS n, SUM(c) AS s1, SUM(c * c) AS s2
            FROM b GROUP BY f
        ),
        tot AS (
            SELECT COUNT(*) AS k, SUM(n) AS nn, SUM(s1) AS t1,
                   SUM(s2) AS t2,
                   fsum(CAST(s1 * s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS a
            FROM g
        ),
        v AS (
            SELECT k, nn,
                   a - CAST(t1 * t1 AS DOUBLE) / CAST(nn AS DOUBLE) AS ssb,
                   CAST(t2 AS DOUBLE) - a AS ssw
            FROM tot
        )
        SELECT CAST(nn AS BIGINT) AS n_rows,
               CAST(k AS BIGINT) AS n_groups,
               CASE WHEN k >= 2 AND nn - k >= 1 AND ssw > 0 THEN
                   ROUND((ssb / CAST(k - 1 AS DOUBLE))
                         / (ssw / CAST(nn - k AS DOUBLE)), 6)
               END AS f_stat,
               CASE WHEN ssb + ssw > 0 THEN
                   ROUND(ssb / (ssb + ssw), 6)
               END AS eta_sq
        FROM v WHERE nn > 0
    """,
    "cusum_changepoint_events": """
        WITH d AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   COUNT(*) AS c
            FROM events WHERE ts IS NOT NULL GROUP BY 1
        ),
        w AS (
            SELECT day, c,
                   ROW_NUMBER() OVER (ORDER BY day) AS k,
                   SUM(c) OVER (ORDER BY day) AS pref,
                   COUNT(*) OVER () AS n,
                   SUM(c) OVER () AS t
            FROM d
        ),
        m AS (
            SELECT *, ABS(n * pref - k * t) AS metric
            FROM w WHERE k < n
        )
        SELECT CAST(n AS BIGINT) AS n_days,
               day AS cp_day,
               ROUND(CAST(metric AS DOUBLE) / CAST(n AS DOUBLE), 4)
                   AS cusum_max,
               ROUND(CAST(pref AS DOUBLE) / CAST(k AS DOUBLE), 6)
                   AS mean_before,
               ROUND(CAST(t - pref AS DOUBLE) / CAST(n - k AS DOUBLE), 6)
                   AS mean_after
        FROM m ORDER BY metric DESC, day ASC LIMIT 1
    """,
    "corr_matrix_lineitem": _CORR_MATRIX_ORACLE,
    "weighted_avg_discount_lineitem": """
        WITH b AS (
            SELECT CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS c,
                   CAST(ROUND(l_discount * 10000, 0) AS BIGINT) AS bp
            FROM lineitem
            WHERE l_extendedprice IS NOT NULL AND l_discount IS NOT NULL
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(c) AS BIGINT) AS weight_cents,
               ROUND(CAST(SUM(c * bp) AS DOUBLE)
                     / CAST(SUM(c) AS DOUBLE) / 10000.0, 6)
                   AS wavg_discount
        FROM b
    """,
    "welch_ttest_price_returnflag": """
        WITH b AS (
            SELECT l_returnflag AS f,
                   CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS c
            FROM lineitem
            WHERE l_returnflag IN ('R', 'A')
              AND l_extendedprice IS NOT NULL
        ),
        g AS (
            SELECT f, COUNT(*) AS n, SUM(c) AS s1, SUM(c * c) AS s2
            FROM b GROUP BY f
        ),
        r AS (SELECT n, s1, s2 FROM g WHERE f = 'R'),
        a AS (SELECT n, s1, s2 FROM g WHERE f = 'A'),
        v AS (
            SELECT r.n AS nr, a.n AS na, r.s1 AS s1r, a.s1 AS s1a,
                   CAST(r.n * r.s2 - r.s1 * r.s1 AS DOUBLE)
                       / CAST(r.n * r.n * (r.n - 1) AS DOUBLE) AS vr,
                   CAST(a.n * a.s2 - a.s1 * a.s1 AS DOUBLE)
                       / CAST(a.n * a.n * (a.n - 1) AS DOUBLE) AS va,
                   CAST(r.n * r.s2 - r.s1 * r.s1 AS DOUBLE)
                       / CAST(r.n * (r.n - 1) AS DOUBLE) / 10000.0
                       AS var_r,
                   CAST(a.n * a.s2 - a.s1 * a.s1 AS DOUBLE)
                       / CAST(a.n * (a.n - 1) AS DOUBLE) / 10000.0
                       AS var_a
            FROM r, a
        )
        SELECT CAST(nr AS BIGINT) AS n_r, CAST(na AS BIGINT) AS n_a,
               ROUND(CAST(s1r AS DOUBLE) / CAST(nr AS DOUBLE) / 100.0, 6)
                   AS mean_r,
               ROUND(CAST(s1a AS DOUBLE) / CAST(na AS DOUBLE) / 100.0, 6)
                   AS mean_a,
               ROUND(var_r, 4) AS var_r,
               ROUND(var_a, 4) AS var_a,
               ROUND((CAST(s1r * na - s1a * nr AS DOUBLE)
                      / CAST(nr * na AS DOUBLE)) / sqrt(vr + va), 6)
                   AS t_stat,
               ROUND((vr + va) * (vr + va)
                     / (vr * vr / (nr - 1) + va * va / (na - 1)), 4)
                   AS welch_df
        FROM v
    """,
    "theil_revenue_customers": """
        WITH a AS (
            SELECT o_custkey AS c,
                   SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS m
            FROM orders
            WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
            GROUP BY o_custkey
        ),
        p AS (SELECT m FROM a WHERE m > 0),
        g AS (SELECT COUNT(*) AS n, SUM(m) AS s,
                     fsum(CAST(m AS DOUBLE) * ln(CAST(m AS DOUBLE))) AS w
              FROM p)
        SELECT CAST(n AS BIGINT) AS n_customers,
               CAST(s AS BIGINT) AS total_cents,
               ROUND(w / CAST(s AS DOUBLE)
                     + ln(CAST(n AS DOUBLE)) - ln(CAST(s AS DOUBLE)), 6)
                   AS theil_t
        FROM g WHERE n > 0
    """,
    "mannwhitney_price_returnflag": """
        WITH b AS (
            SELECT CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS v,
                   (l_returnflag = 'R') AS isr
            FROM lineitem
            WHERE l_returnflag IN ('R', 'A')
              AND l_extendedprice IS NOT NULL
        ),
        c AS (
            SELECT v,
                   COUNT(*) FILTER (WHERE isr) AS c1,
                   COUNT(*) FILTER (WHERE NOT isr) AS c2
            FROM b GROUP BY v
        ),
        w AS (
            SELECT c1, c2, c1 + c2 AS t,
                   COALESCE(SUM(c1 + c2) OVER (
                       ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cb
            FROM c
        ),
        g AS (
            SELECT SUM(c1) AS n1, SUM(c2) AS n2,
                   SUM(c1 * (2 * cb + t + 1)) AS r2,
                   SUM(t * t * t - t) AS tt
            FROM w
        )
        SELECT CAST(n1 AS BIGINT) AS n_r, CAST(n2 AS BIGINT) AS n_a,
               CAST(r2 AS BIGINT) AS r2_r, CAST(tt AS BIGINT) AS tie_term,
               ROUND(CAST(r2 - n1 * (n1 + 1) AS DOUBLE) / 2.0, 1) AS u_r,
               ROUND(CAST(r2 - n1 * (n1 + 1) AS DOUBLE)
                     / CAST(2 * n1 * n2 AS DOUBLE), 6) AS auc_r,
               ROUND(CAST(r2 - n1 * (n1 + 1) - n1 * n2 AS DOUBLE)
                     / sqrt((CAST(n1 * n2 AS DOUBLE) / 3.0)
                            * (CAST(n1 + n2 + 1 AS DOUBLE)
                               - CAST(tt AS DOUBLE)
                                 / CAST((n1 + n2) * (n1 + n2 - 1)
                                        AS DOUBLE))), 6) AS z
        FROM g WHERE n1 > 0 AND n2 > 0
    """,
    "range_rules_lineitem": _RANGE_ORACLE,
    "mutual_info_orders": """
        WITH x AS (
            SELECT o_orderpriority AS a, o_orderstatus AS b FROM orders
            WHERE o_orderpriority IS NOT NULL
              AND o_orderstatus IS NOT NULL
        ),
        c AS (SELECT a, b, COUNT(*) AS n FROM x GROUP BY a, b),
        ra AS (SELECT a, SUM(n) AS r FROM c GROUP BY a),
        cb AS (SELECT b, SUM(n) AS s FROM c GROUP BY b),
        t AS (SELECT SUM(n) AS total FROM c)
        SELECT CAST(t.total AS BIGINT) AS n_rows,
               ROUND(fsum(c.n * ln((c.n * t.total * 1.0) / (ra.r * cb.s)))
                     / t.total, 6) AS mi_nats
        FROM c JOIN ra USING (a) JOIN cb USING (b), t
        GROUP BY t.total
    """,
    "corr_orders_shipments_daily": """
        WITH s AS (
            SELECT CAST(date_trunc('day', l_shipdate) AS TIMESTAMP)
                       AS day,
                   COUNT(*) AS c
            FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1
        ),
        o AS (
            SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP)
                       AS day,
                   COUNT(*) AS c
            FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
        ),
        j AS (SELECT s.c AS x, o.c AS y FROM s JOIN o USING (day))
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               ROUND(CORR(x, y), 6) AS corr_daily
        FROM j
    """,
    "autocorr_daily_events": """
        WITH d AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   COUNT(*) AS c
            FROM events WHERE ts IS NOT NULL GROUP BY 1
        ),
        j AS (
            SELECT a.c AS x, b.c AS y
            FROM d a JOIN d b ON b.day = a.day + INTERVAL 7 DAY
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
               ROUND(CORR(x, y), 6) AS autocorr_lag7
        FROM j
    """,
    "nation_tvd_customer_supplier": """
        WITH c AS (
            SELECT c_nationkey AS k, COUNT(*) AS n FROM customer
            WHERE c_nationkey IS NOT NULL GROUP BY 1
        ),
        s AS (
            SELECT s_nationkey AS k, COUNT(*) AS n FROM supplier
            WHERE s_nationkey IS NOT NULL GROUP BY 1
        ),
        t AS (SELECT (SELECT SUM(n) FROM c) AS n1,
                     (SELECT SUM(n) FROM s) AS n2),
        u AS (
            SELECT COALESCE(c.n, 0) AS c1, COALESCE(s.n, 0) AS c2
            FROM c FULL OUTER JOIN s ON c.k = s.k
        )
        SELECT CAST(t.n1 AS BIGINT) AS n_customers,
               CAST(t.n2 AS BIGINT) AS n_suppliers,
               CAST(SUM(ABS(u.c1 * t.n2 - u.c2 * t.n1)) AS BIGINT)
                   AS tvd_num,
               ROUND(SUM(ABS(u.c1 * t.n2 - u.c2 * t.n1)) * 1.0
                     / (2 * t.n1 * t.n2), 6) AS tvd
        FROM u, t
        WHERE t.n1 IS NOT NULL AND t.n2 IS NOT NULL
        GROUP BY t.n1, t.n2
    """,
    "fd_violations_lineitem": """
        WITH g AS (
            SELECT l_orderkey AS k,
                   COUNT(DISTINCT l_returnflag) AS d
            FROM lineitem WHERE l_orderkey IS NOT NULL
            GROUP BY l_orderkey
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(COUNT(*) FILTER (WHERE d > 1) AS BIGINT)
                   AS n_violating_keys,
               CAST(MAX(d) AS BIGINT) AS max_distinct,
               ROUND(COUNT(*) FILTER (WHERE d > 1) * 1.0 / COUNT(*), 4)
                   AS violation_rate
        FROM g
    """,
    "entropy_event_types": """
        WITH c AS (
            SELECT event_type, COUNT(*) AS n FROM events
            WHERE event_type IS NOT NULL GROUP BY event_type
        ),
        t AS (SELECT SUM(n) AS s, COUNT(*) AS k FROM c)
        SELECT CAST(t.s AS BIGINT) AS n_rows,
               CAST(t.k AS BIGINT) AS n_types,
               ROUND(ln(t.s) - fsum(c.n * ln(c.n)) / t.s, 6)
                   AS entropy_nats,
               CASE WHEN t.k > 1 THEN
                   ROUND((ln(t.s) - fsum(c.n * ln(c.n)) / t.s)
                         / ln(t.k), 6)
               END AS norm_entropy,
               ROUND(exp(ln(t.s) - fsum(c.n * ln(c.n)) / t.s), 4)
                   AS perplexity
        FROM c, t GROUP BY t.s, t.k
    """,
    "ks_price_returnflag": """
        WITH x AS (
            SELECT CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS v,
                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g
            FROM lineitem
            WHERE l_returnflag IN ('R', 'A')
              AND l_extendedprice IS NOT NULL
        ),
        c AS (SELECT v, SUM(g) AS c1, SUM(1 - g) AS c2 FROM x GROUP BY v),
        n AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM c),
        p AS (
            SELECT SUM(c1) OVER (ORDER BY v) AS s1,
                   SUM(c2) OVER (ORDER BY v) AS s2
            FROM c
        )
        SELECT CAST(n.n1 AS BIGINT) AS n_r,
               CAST(n.n2 AS BIGINT) AS n_a,
               CAST(MAX(ABS(p.s1 * n.n2 - p.s2 * n.n1)) AS BIGINT) AS ks_num,
               ROUND(MAX(ABS(p.s1 * n.n2 - p.s2 * n.n1)) * 1.0
                     / n.n1 / n.n2, 6) AS ks_d
        FROM p, n GROUP BY n.n1, n.n2
    """,
    "benford_totalprice": """
        WITH d AS (
            SELECT CAST(SUBSTRING(CAST(CAST(ROUND(o_totalprice * 100, 0)
                                    AS BIGINT) AS VARCHAR), 1, 1)
                        AS BIGINT) AS digit
            FROM orders
            WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
        ),
        c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
        t AS (SELECT SUM(n) AS s FROM c)
        SELECT digit, CAST(n AS BIGINT) AS n,
               ROUND(n * 1.0 / t.s, 4) AS share,
               ROUND(ln(1 + 1.0 / digit) / ln(10), 4) AS benford_p,
               ROUND(ABS(n * 1.0 / t.s
                         - ln(1 + 1.0 / digit) / ln(10)), 4) AS abs_dev
        FROM c, t ORDER BY digit
    """,
    "value_trend_events": """
        WITH s AS (
            SELECT event_type,
                   COUNT(*) AS n,
                   SUM(epoch_us(ts) // 86400000000) AS sx,
                   SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS sy,
                   SUM((epoch_us(ts) // 86400000000)
                       * CAST(ROUND(value * 100, 0) AS BIGINT)) AS sxy,
                   SUM((epoch_us(ts) // 86400000000)
                       * (epoch_us(ts) // 86400000000)) AS sxx
            FROM events
            WHERE ts IS NOT NULL AND event_type IS NOT NULL
              AND value IS NOT NULL
            GROUP BY event_type
        )
        SELECT event_type, CAST(n AS BIGINT) AS n,
               ROUND((n * sxy - sx * sy) * 1.0
                     / (n * sxx - sx * sx) / 100, 6) AS slope_per_day
        FROM s ORDER BY event_type
    """,
    "skew_kurtosis_lineitem": """
        SELECT l_returnflag,
               CAST(COUNT(l_extendedprice) AS BIGINT) AS n,
               ROUND(skewness(l_extendedprice), 4) AS skew,
               ROUND(kurtosis(l_extendedprice), 4) AS kurt
        FROM lineitem
        WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "anomalous_days_events": """
        WITH d AS (
            SELECT (epoch_us(ts) // 86400000000) AS day,
                   COUNT(*) * 1.0 AS c
            FROM events WHERE ts IS NOT NULL GROUP BY 1
        ),
        m AS (SELECT fsum(c) / COUNT(*) AS mean, COUNT(*) AS n FROM d),
        s AS (
            SELECT sqrt(fsum((d.c - m.mean) * (d.c - m.mean))
                        / (m.n - 1)) AS sd
            FROM d, m GROUP BY m.n
        )
        SELECT CAST(m.n AS BIGINT) AS n_days,
               CAST(COUNT(*) FILTER (
                   WHERE ABS((d.c - m.mean) / s.sd) > 2.0) AS BIGINT)
                   AS n_anomalous,
               ROUND(MAX(ABS((d.c - m.mean) / s.sd)), 4) AS max_abs_z,
               ROUND(m.mean, 4) AS mean_daily
        FROM d, m, s GROUP BY m.n, m.mean, s.sd
    """,
    "corr_lineitem": """
        SELECT l_returnflag,
               COUNT(*) AS n_rows,
               ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
               ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS covar_qty_price,
               ROUND(STDDEV_SAMP(l_extendedprice), 4) AS stddev_price,
               ROUND(VAR_SAMP(l_quantity), 6) AS var_qty
        FROM lineitem
        WHERE l_returnflag IS NOT NULL
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "histogram_totalprice": """
        SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
               COUNT(*) AS n
        FROM orders
        WHERE o_totalprice IS NOT NULL
        GROUP BY bucket
        ORDER BY bucket
    """,
    "zscore_outliers_lineitem": """
        WITH s AS (
            SELECT l_returnflag,
                   AVG(l_extendedprice) AS m,
                   STDDEV_SAMP(l_extendedprice) AS sd,
                   COUNT(l_extendedprice) AS n_price
            FROM lineitem
            WHERE l_returnflag IS NOT NULL
            GROUP BY l_returnflag
        )
        SELECT l.l_returnflag,
               MIN(s.n_price) AS n_price,
               COUNT(*) FILTER (
                   WHERE ABS(l.l_extendedprice - s.m) > 3 * s.sd
               ) AS n_outliers,
               ROUND(MIN(s.m), 4) AS mean_price,
               ROUND(MIN(s.sd), 4) AS sd_price
        FROM lineitem l JOIN s USING (l_returnflag)
        GROUP BY l.l_returnflag
        ORDER BY l.l_returnflag
    """,
    "user_overlap_events": """
        WITH ut AS (
            SELECT DISTINCT user_id, event_type
            FROM events
            WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        ),
        c AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY event_type),
        p AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   COUNT(*) AS n_both
            FROM ut a JOIN ut b USING (user_id)
            WHERE a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT p.type_a, p.type_b, p.n_both, ca.n AS n_a, cb.n AS n_b,
               ROUND(p.n_both / (ca.n + cb.n - p.n_both), 6) AS jaccard
        FROM p
        JOIN c ca ON p.type_a = ca.event_type
        JOIN c cb ON p.type_b = cb.event_type
        ORDER BY p.type_a, p.type_b
    """,
}

QUERIES = {
    "corr_lineitem": corr_lineitem,
    "histogram_totalprice": histogram_totalprice,
    "zscore_outliers_lineitem": zscore_outliers_lineitem,
    "user_overlap_events": user_overlap_events,
    "skew_kurtosis_lineitem": skew_kurtosis_lineitem,
    "anomalous_days_events": anomalous_days_events,
    "value_trend_events": value_trend_events,
    "benford_totalprice": benford_totalprice,
    "ks_price_returnflag": ks_price_returnflag,
    "entropy_event_types": entropy_event_types,
    "fd_violations_lineitem": fd_violations_lineitem,
    "autocorr_daily_events": autocorr_daily_events,
    "nation_tvd_customer_supplier": nation_tvd_customer_supplier,
    "range_rules_lineitem": range_rules_lineitem,
    "mutual_info_orders": mutual_info_orders,
    "welch_ttest_price_returnflag": welch_ttest_price_returnflag,
    "theil_revenue_customers": theil_revenue_customers,
    "mannwhitney_price_returnflag": mannwhitney_price_returnflag,
    "corr_matrix_lineitem": corr_matrix_lineitem,
    "weighted_avg_discount_lineitem": weighted_avg_discount_lineitem,
    "anova_price_returnflag": anova_price_returnflag,
    "cusum_changepoint_events": cusum_changepoint_events,
    "ewma_daily_events": ewma_daily_events,
    "rate_ratio_events": rate_ratio_events,
    "spearman_qty_discount": spearman_qty_discount,
    "kendall_qty_discount": kendall_qty_discount,
    "geomean_price_returnflag": geomean_price_returnflag,
    "corr_orders_shipments_daily": corr_orders_shipments_daily,
}
