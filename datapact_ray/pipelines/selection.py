"""Distributed order-statistic selection (exact quantiles, any domain).

``grouped_quantile_lineitem`` (relational.py) is exact when the value
domain is bounded (per-(group,value) counts fit a shuffle); the t-digest
sketch is the approximate path. This module closes the remaining cell:
EXACT quantiles over unbounded / high-cardinality numeric columns, at
scale, via iterative histogram refinement — the classic distributed
k-th-order-statistic algorithm:

1. one partial-aggregate pass gets each group's (count, min, max);
2. each refinement pass histograms the active half-open value range
   [lo, hi) into B bins per group (fixed-width partial rows, merged
   driver-side); the bin containing the target rank becomes the next
   active range — candidates shrink ~B× per pass (10^12 rows → ~4
   passes at B=1024);
3. once a range holds ≤ collect_cap rows (or collapses to a single
   representable float), only those rows are collected and sorted to
   read off the exact order statistic.

Bin membership is defined by ``np.searchsorted`` against an explicit
``np.linspace(lo, hi, B+1)`` edge array, and the next range reuses THE
SAME edge floats — histogram counts, the carried below-rank offset, and
the next pass's range filter are bit-for-bit consistent, so no value is
ever double-counted or lost at a bin boundary (a floor-division binning
against arithmetically recomputed edges cannot guarantee this).

Nothing larger than (n_specs × B) partial rows enters an exchange and
nothing larger than collect_cap rows ever reaches the driver, so the
algorithm holds at 100-TB inputs where "sort the table" or "collect the
group" cannot.

Interpolation matches SQL ``quantile_cont``: rank h = (n-1)·q, result =
v[floor(h)] + (v[ceil(h)] - v[floor(h)]) · frac(h).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from ..io import read_table
from ._util import round_duck


def _empty_partial(cols: dict[str, str]) -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in cols.items()})


def _rank_values(
    path: str,
    group_col: str,
    value_col: str,
    ranks_from_counts,
    n_bins: int = 1024,
    collect_cap: int = 100_000,
    max_passes: int = 16,
    read_cols: list[str] | None = None,
    transform=None,
) -> tuple[dict, dict]:
    """Exact values at 0-indexed ascending ranks of ``value_col`` within
    each group. ``ranks_from_counts`` maps {group: non-null count} →
    {group: [ranks]} (counts come free with the first pass, so rank
    choice that depends on n — like quantiles — costs no extra scan).
    Returns (values {group: {rank: value}}, counts {group: n}).
    Driver-side control loop; every pass is one distributed scan
    emitting fixed-width partial rows.

    The first pass needs no value range: it histograms the
    ORDER-PRESERVING BIT PATTERN of float64 (sign-flip transform, top
    log2(B) bits as the bin), which yields per-group counts, per-bin
    value extents AND the first B× rank narrowing in a single scan —
    the classic separate min/max pass is folded away.

    ``read_cols`` / ``transform`` support selection over DERIVED columns
    (e.g. |x - group_median| for MAD): the scan projects ``read_cols``
    and ``transform(df)`` must emit ``value_col`` — it runs inside every
    scan task, so it must be a pure vectorized function of the batch
    (plus broadcast-captured constants), never driver state."""
    from ..shuffle import map_partials

    def scan_partials(fn) -> pd.DataFrame:
        return map_partials(
            path, read_cols or [group_col, value_col], None, fn
        )

    def _prep(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        if transform is not None:
            df = transform(df)
        return df.dropna(subset=[value_col])

    shift = np.uint64(64 - int(math.log2(n_bins)))

    def order_key(v: np.ndarray) -> np.ndarray:
        u = v.view(np.uint64)
        return np.where(
            u >> np.uint64(63) == 1, ~u, u | np.uint64(0x8000000000000000)
        )

    def bitpat_partial(batch: pa.Table, _b=n_bins) -> pd.DataFrame:
        df = _prep(batch)
        frames = []
        for grp, gdf in df.groupby(group_col, sort=False):
            v = gdf[value_col].to_numpy(np.float64)
            b = (order_key(v) >> shift).astype(np.int64)
            cnt = np.bincount(b, minlength=_b)
            vmin = np.full(_b, np.inf)
            vmax = np.full(_b, -np.inf)
            np.minimum.at(vmin, b, v)
            np.maximum.at(vmax, b, v)
            nz = np.nonzero(cnt)[0]
            frames.append(
                pd.DataFrame(
                    {
                        "grp": grp,
                        "bin": nz.astype(np.int64),
                        "cnt": cnt[nz].astype(np.int64),
                        "vmin": vmin[nz],
                        "vmax": vmax[nz],
                    }
                )
            )
        if not frames:
            return _empty_partial(
                {
                    "grp": "object",
                    "bin": "int64",
                    "cnt": "int64",
                    "vmin": "float64",
                    "vmax": "float64",
                }
            )
        return pd.concat(frames, ignore_index=True)

    first = (
        scan_partials(bitpat_partial)
        .groupby(["grp", "bin"], as_index=False)
        .agg(cnt=("cnt", "sum"), vmin=("vmin", "min"), vmax=("vmax", "max"))
    )

    counts = {
        grp: int(g["cnt"].sum()) for grp, g in first.groupby("grp", sort=False)
    }
    ranks_by_group = ranks_from_counts(counts)

    # one selection task per (group, rank), narrowed straight off the
    # first-pass histogram; ranges are half-open [lo, hi)
    tasks: dict = {}
    for grp, ranks in ranks_by_group.items():
        if not ranks:  # empty group / no requested statistics
            continue
        g = first[first["grp"] == grp].sort_values("bin")
        cnts = g["cnt"].to_numpy()
        vmins = g["vmin"].to_numpy()
        vmaxs = g["vmax"].to_numpy()
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        for r in ranks:
            if not 0 <= r < n:
                raise ValueError(f"rank {r} out of range for group {grp!r}")
            bi = int(np.searchsorted(cum, r, side="right"))
            below = int(cum[bi - 1]) if bi > 0 else 0
            tasks[(grp, r)] = {
                "lo": float(vmins[bi]),
                "hi": float(np.nextafter(vmaxs[bi], np.inf)),
                "below": below,  # exact count of group values < lo
                "n_in_range": int(cnts[bi]),
                "done": float(vmins[bi]) if vmins[bi] == vmaxs[bi] else None,
            }

    for _ in range(max_passes):
        active = {k: s for k, s in tasks.items() if s["done"] is None}
        if not active:
            break

        # a range collapsed to one representable float => every value in
        # it equals lo; no scan needed
        for s in active.values():
            if np.nextafter(s["lo"], np.inf) >= s["hi"]:
                s["done"] = s["lo"]
        active = {k: s for k, s in tasks.items() if s["done"] is None}

        to_collect = {
            k: s for k, s in active.items() if s["n_in_range"] <= collect_cap
        }
        to_hist = {k: s for k, s in active.items() if k not in to_collect}

        if to_collect:
            cspecs: dict = {}
            for (grp, r), s in to_collect.items():
                cspecs.setdefault((grp, s["lo"], s["hi"]), []).append((r, s))
            ckeys = tuple(cspecs)

            def collect_partial(batch: pa.Table, _ck=ckeys) -> pd.DataFrame:
                df = _prep(batch)
                frames = []
                for sid, (grp, lo, hi) in enumerate(_ck):
                    v = df.loc[df[group_col] == grp, value_col].to_numpy(np.float64)
                    v = v[(v >= lo) & (v < hi)]
                    if len(v):
                        frames.append(pd.DataFrame({"sid": np.int64(sid), "v": v}))
                if not frames:
                    return _empty_partial({"sid": "int64", "v": "float64"})
                return pd.concat(frames, ignore_index=True)

            cand = scan_partials(collect_partial)
            for sid, key in enumerate(ckeys):
                vs = np.sort(cand.loc[cand["sid"] == sid, "v"].to_numpy())
                for r, s in cspecs[key]:
                    s["done"] = float(vs[r - s["below"]])

        if to_hist:
            hspecs: dict = {}
            for (grp, r), s in to_hist.items():
                hspecs.setdefault((grp, s["lo"], s["hi"]), []).append((r, s))
            hkeys = tuple(hspecs)

            def hist_partial(batch: pa.Table, _hk=hkeys, _b=n_bins) -> pd.DataFrame:
                df = _prep(batch)
                frames = []
                for sid, (grp, lo, hi) in enumerate(_hk):
                    v = df.loc[df[group_col] == grp, value_col].to_numpy(np.float64)
                    v = v[(v >= lo) & (v < hi)]
                    if len(v) == 0:
                        continue
                    edges = np.linspace(lo, hi, _b + 1)
                    # bin b holds edges[b] <= v < edges[b+1]; bins
                    # partition by value order, so each bin's actual
                    # [vmin, vmax] extent is disjoint from its neighbors'
                    b = np.searchsorted(edges, v, side="right") - 1
                    np.clip(b, 0, _b - 1, out=b)
                    cnt = np.bincount(b, minlength=_b)
                    vmin = np.full(_b, np.inf)
                    vmax = np.full(_b, -np.inf)
                    np.minimum.at(vmin, b, v)
                    np.maximum.at(vmax, b, v)
                    nz = np.nonzero(cnt)[0]
                    frames.append(
                        pd.DataFrame(
                            {
                                "sid": np.full(len(nz), sid, dtype=np.int64),
                                "bin": nz.astype(np.int64),
                                "cnt": cnt[nz].astype(np.int64),
                                "vmin": vmin[nz],
                                "vmax": vmax[nz],
                            }
                        )
                    )
                if not frames:
                    return _empty_partial(
                        {
                            "sid": "int64",
                            "bin": "int64",
                            "cnt": "int64",
                            "vmin": "float64",
                            "vmax": "float64",
                        }
                    )
                return pd.concat(frames, ignore_index=True)

            hist = (
                scan_partials(hist_partial)
                .groupby(["sid", "bin"], as_index=False)
                .agg(cnt=("cnt", "sum"), vmin=("vmin", "min"), vmax=("vmax", "max"))
            )
            for sid, key in enumerate(hkeys):
                h = hist[hist["sid"] == sid].sort_values("bin")
                cnts = h["cnt"].to_numpy()
                vmins = h["vmin"].to_numpy()
                vmaxs = h["vmax"].to_numpy()
                cum = np.cumsum(cnts)
                for r, s in hspecs[key]:
                    local = r - s["below"]
                    bi = int(np.searchsorted(cum, local, side="right"))
                    below_bin = int(cum[bi - 1]) if bi > 0 else 0
                    s["below"] += below_bin
                    s["n_in_range"] = int(cnts[bi])
                    if vmins[bi] == vmaxs[bi]:
                        # the whole bin is one duplicated value
                        s["done"] = float(vmins[bi])
                        continue
                    # narrow to the bin's ACTUAL value extent: bins
                    # partition by value order, so [vmin, vmax] holds
                    # exactly the bin's rows, and duplicate-heavy bins
                    # collapse in one step instead of one ULP per pass
                    s["lo"] = float(vmins[bi])
                    s["hi"] = float(np.nextafter(vmaxs[bi], np.inf))

    remaining = [k for k, s in tasks.items() if s["done"] is None]
    if remaining:
        raise RuntimeError(f"selection did not converge for {remaining[:3]}")

    out: dict = {}
    for (grp, r), s in tasks.items():
        out.setdefault(grp, {})[r] = s["done"]
    return out, counts


def exact_quantile_extendedprice(sf_dir: str, q: float = 0.5) -> pd.DataFrame:
    """Exact per-returnflag median of l_extendedprice — a
    high-cardinality float column where the bounded-domain count trick
    does not apply — via distributed histogram-refinement selection.
    Matches ``quantile_cont`` interpolation."""
    path = f"{sf_dir}/lineitem.parquet"

    def quantile_ranks(counts: dict) -> dict:
        return {
            grp: sorted({math.floor((n - 1) * q), math.ceil((n - 1) * q)})
            for grp, n in counts.items()
        }

    vals, counts = _rank_values(
        path, "l_returnflag", "l_extendedprice", quantile_ranks
    )
    rows = []
    for grp in sorted(vals):
        h = (counts[grp] - 1) * q
        j0, j1 = math.floor(h), math.ceil(h)
        v0, v1 = vals[grp][j0], vals[grp][j1]
        rows.append((grp, float(round_duck(v0 + (v1 - v0) * (h - j0), 4))))
    return pd.DataFrame(rows, columns=["l_returnflag", "median_price"])


def percentile_disc_extendedprice(sf_dir: str, q: float = 0.9) -> pd.DataFrame:
    """Discrete grouped percentile (``quantile_disc`` — the smallest
    actual data value whose cumulative fraction reaches q, vs the
    interpolated ``quantile_cont``): the same distributed selection, at
    0-indexed rank ceil(q·n) − 1."""
    path = f"{sf_dir}/lineitem.parquet"

    def disc_ranks(counts: dict) -> dict:
        return {
            grp: [max(0, math.ceil(q * n) - 1)] for grp, n in counts.items()
        }

    vals, counts = _rank_values(
        path, "l_returnflag", "l_extendedprice", disc_ranks
    )
    rows = [
        (
            grp,
            float(
                round_duck(
                    vals[grp][max(0, math.ceil(q * counts[grp]) - 1)], 4
                )
            ),
        )
        for grp in sorted(vals)
    ]
    return pd.DataFrame(rows, columns=["l_returnflag", "p90_price"])


def weighted_median_lineitem(
    sf_dir: str, n_bins: int = 1024, collect_cap: int = 200_000
) -> pd.DataFrame:
    """WEIGHTED median — the k-th order statistic generalized to weight
    mass (here: the extended price below which half the QUANTITY sits,
    the inventory-weighted price point). Plain quantiles rank rows;
    this ranks integer weight, so the selection histograms accumulate
    per-bin WEIGHT SUMS instead of counts and the driver locates the
    bin where twice the cumulative weight first reaches the total
    (2·cw ≥ W in exact ints — no fractional thresholds, no FP race).
    One bit-pattern histogram pass + one candidate-bin collect; the
    crossing VALUE is tie-order-invariant (ties share the value), which
    is why the oracle's running-SUM peer order doesn't matter."""
    from ..shuffle import map_partials
    from ._util import round_duck as _rd

    path = f"{sf_dir}/lineitem.parquet"
    shift = np.uint64(64 - int(math.log2(n_bins)))

    def _okey(v: np.ndarray) -> np.ndarray:
        u = v.view(np.uint64)
        return np.where(
            u >> np.uint64(63) == 1, ~u, u | np.uint64(0x8000000000000000)
        )

    def hist_partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["l_extendedprice", "l_quantity"])
        if len(df) == 0:
            return pd.DataFrame(
                {"bin": [], "w": [], "c": [], "vmin": [], "vmax": []}
            )
        v = df["l_extendedprice"].to_numpy(np.float64)
        q = df["l_quantity"].to_numpy(np.float64).astype(np.int64)
        b = (_okey(v) >> shift).astype(np.int64)
        w = np.bincount(b, weights=q, minlength=n_bins).astype(np.int64)
        c = np.bincount(b, minlength=n_bins)
        vmin = np.full(n_bins, np.inf)
        vmax = np.full(n_bins, -np.inf)
        np.minimum.at(vmin, b, v)
        np.maximum.at(vmax, b, v)
        nz = np.nonzero(c)[0]
        return pd.DataFrame(
            {
                "bin": nz.astype(np.int64),
                "w": w[nz],
                "c": c[nz].astype(np.int64),
                "vmin": vmin[nz],
                "vmax": vmax[nz],
            }
        )

    hist = (
        map_partials(
            path, ["l_extendedprice", "l_quantity"], None, hist_partial
        )
        .groupby("bin", as_index=False)
        .agg(
            w=("w", lambda g: sum(int(x) for x in g)),
            c=("c", "sum"),
            vmin=("vmin", "min"),
            vmax=("vmax", "max"),
        )
        .sort_values("bin")
        .reset_index(drop=True)
    )
    if len(hist) == 0:
        return pd.DataFrame(
            {"weighted_median": pd.Series([], dtype="float64")}
        )
    W = sum(int(x) for x in hist["w"])
    cum = np.cumsum(hist["w"].to_numpy(dtype=object))
    bi = int(np.searchsorted([2 * int(x) for x in cum], W, side="left"))
    below_w = int(cum[bi - 1]) if bi > 0 else 0
    lo = float(hist["vmin"][bi])
    hi = float(np.nextafter(float(hist["vmax"][bi]), np.inf))
    n_in_range = int(hist["c"][bi])
    vmin_b, vmax_b = float(hist["vmin"][bi]), float(hist["vmax"][bi])

    # refinement loop (the _rank_values pattern, weight-ranked): linspace
    # histogram the active range until the crossing bin fits collect_cap
    # or collapses to one value / one representable float
    for _ in range(16):
        if n_in_range <= collect_cap or vmin_b == vmax_b:
            break
        if np.nextafter(lo, np.inf) >= hi:
            break

        def refine_partial(
            batch: pa.Table, _lo=lo, _hi=hi, _b=n_bins
        ) -> pd.DataFrame:
            df = batch.to_pandas().dropna(
                subset=["l_extendedprice", "l_quantity"]
            )
            v = df["l_extendedprice"].to_numpy(np.float64)
            q = df["l_quantity"].to_numpy(np.float64).astype(np.int64)
            keep = (v >= _lo) & (v < _hi)
            v, q = v[keep], q[keep]
            if len(v) == 0:
                return pd.DataFrame(
                    {"bin": [], "w": [], "c": [], "vmin": [], "vmax": []}
                )
            edges = np.linspace(_lo, _hi, _b + 1)
            b = np.searchsorted(edges, v, side="right") - 1
            np.clip(b, 0, _b - 1, out=b)
            w = np.bincount(b, weights=q, minlength=_b).astype(np.int64)
            c = np.bincount(b, minlength=_b)
            vmin = np.full(_b, np.inf)
            vmax = np.full(_b, -np.inf)
            np.minimum.at(vmin, b, v)
            np.maximum.at(vmax, b, v)
            nz = np.nonzero(c)[0]
            return pd.DataFrame(
                {
                    "bin": nz.astype(np.int64),
                    "w": w[nz],
                    "c": c[nz].astype(np.int64),
                    "vmin": vmin[nz],
                    "vmax": vmax[nz],
                }
            )

        rhist = (
            map_partials(
                path, ["l_extendedprice", "l_quantity"], None, refine_partial
            )
            .groupby("bin", as_index=False)
            .agg(
                w=("w", lambda g: sum(int(x) for x in g)),
                c=("c", "sum"),
                vmin=("vmin", "min"),
                vmax=("vmax", "max"),
            )
            .sort_values("bin")
            .reset_index(drop=True)
        )
        rcum = np.cumsum(rhist["w"].to_numpy(dtype=object))
        ri = int(
            np.searchsorted(
                [2 * (below_w + int(x)) for x in rcum], W, side="left"
            )
        )
        below_w += int(rcum[ri - 1]) if ri > 0 else 0
        n_in_range = int(rhist["c"][ri])
        vmin_b, vmax_b = float(rhist["vmin"][ri]), float(rhist["vmax"][ri])
        # narrow to the bin's ACTUAL value extent (duplicate-heavy bins
        # collapse in one step instead of one ULP per pass)
        lo = vmin_b
        hi = float(np.nextafter(vmax_b, np.inf))

    if vmin_b == vmax_b:  # whole active range is one duplicated value
        from ._util import round_duck as _rd2

        return pd.DataFrame({"weighted_median": [float(_rd2(vmin_b, 4))]})

    def collect_partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["l_extendedprice", "l_quantity"])
        v = df["l_extendedprice"].to_numpy(np.float64)
        keep = (v >= lo) & (v < hi)
        return pd.DataFrame(
            {
                "v": v[keep],
                "q": df["l_quantity"].to_numpy(np.float64).astype(np.int64)[
                    keep
                ],
            }
        )

    cand = map_partials(
        path, ["l_extendedprice", "l_quantity"], None, collect_partial
    ).sort_values("v", kind="stable")
    cw = below_w + np.cumsum(cand["q"].to_numpy(np.int64))
    pos = int(np.searchsorted(2 * cw, W, side="left"))
    return pd.DataFrame(
        {
            "weighted_median": [
                float(_rd(float(cand["v"].to_numpy()[pos]), 4))
            ]
        }
    )


def value_percentiles_events(sf_dir: str) -> pd.DataFrame:
    """Percentile BANDS per group (p10 / p50 / p90 of event value per
    event type) — the multi-rank case of the exact selection: all three
    quantiles for all groups resolve in ONE shared histogram-refinement
    round (the per-(group, rank) tasks share every scan), so the band
    costs the same passes as a single median."""
    path = f"{sf_dir}/events.parquet"
    qs = (0.1, 0.5, 0.9)

    def band_ranks(counts: dict) -> dict:
        return {
            grp: sorted(
                {
                    r
                    for q in qs
                    for r in (
                        math.floor((n - 1) * q),
                        math.ceil((n - 1) * q),
                    )
                }
            )
            for grp, n in counts.items()
        }

    vals, counts = _rank_values(path, "event_type", "value", band_ranks)
    rows = []
    for grp in sorted(vals):
        n = counts[grp]
        out = [grp]
        for q in qs:
            h = (n - 1) * q
            j0, j1 = math.floor(h), math.ceil(h)
            v0, v1 = vals[grp][j0], vals[grp][j1]
            out.append(float(round_duck(v0 + (v1 - v0) * (h - j0), 4)))
        rows.append(tuple(out))
    return pd.DataFrame(
        rows, columns=["event_type", "p10", "p50", "p90"]
    )


def ntile_revenue_orders(sf_dir: str, tiles: int = 4) -> pd.DataFrame:
    """Distributed NTILE: order-value quartiles — row count and exact
    total per quartile of o_totalprice (ascending) — WITHOUT a global
    sort. NTILE splits ties across tiles by arbitrary peer order, but
    each tile's VALUE MULTISET is fixed (tile q is a slice of the
    sorted sequence), so counts and sums are deterministic.

    Algebra: tile sizes follow from n alone (first n % t tiles get the
    extra row); the cumulative sum of the first s sorted values is
    S(s) = Σ(v < t_s) + (s − #(v < t_s))·t_s with t_s the exact
    order statistic at rank s−1 — so 3 boundary selections (histogram
    refinement, one shared round) + ONE threshold-stats scan
    (count/sum below each boundary, fixed-width partials) reconstruct
    every tile total exactly. Values fix to integer cents, all sums
    merge as Python ints (HUGEINT mirror)."""
    from ._util import round_duck as _rd

    path = f"{sf_dir}/orders.parquet"

    def transform(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "g": np.zeros(len(df), dtype=np.int8),
                "__cents": _rd(
                    df["o_totalprice"].to_numpy(np.float64) * 100.0, 0
                ),
            }
        )

    sizes_holder: dict = {}

    def boundary_ranks(counts: dict) -> dict:
        n = counts.get(0, 0)
        base, extra = divmod(n, tiles)
        sizes = [base + (1 if i < extra else 0) for i in range(tiles)]
        sizes_holder["sizes"] = sizes
        sizes_holder["n"] = n
        cuts = np.cumsum(sizes)[:-1]  # boundary ranks s1, s2, s3
        # n < tiles leaves trailing empty tiles: their cuts repeat the
        # last populated rank; rank −1 (n == 0) must not reach selection
        return {0: sorted({int(s) - 1 for s in cuts if s > 0})}

    vals, _counts = _rank_values(
        path,
        "g",
        "__cents",
        boundary_ranks,
        read_cols=["o_totalprice"],
        transform=lambda df: transform(df.dropna(subset=["o_totalprice"])),
    )
    sizes = sizes_holder["sizes"]
    n = sizes_holder["n"]
    if n == 0:
        return pd.DataFrame(
            {
                "quartile": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
                "sum_cents": pd.Series([], dtype="int64"),
            }
        )
    cuts = [int(s) for s in np.cumsum(sizes)[:-1] if s > 0]
    bounds = [vals[0][s - 1] for s in cuts]  # exact cents as float64

    from ..shuffle import map_partials

    def thr_stats(batch: pa.Table, _b=tuple(bounds)) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["o_totalprice"])
        cents = _rd(df["o_totalprice"].to_numpy(np.float64) * 100.0, 0).astype(
            np.int64
        )
        rows = []
        for i, t in enumerate(_b):
            lt = cents[cents < t]
            rows.append((i, len(lt), int(lt.sum())))
        rows.append((len(_b), len(cents), int(cents.sum())))  # grand total
        return pd.DataFrame(rows, columns=["i", "c", "s"])

    parts = map_partials(path, ["o_totalprice"], None, thr_stats)
    agg = parts.groupby("i").agg(
        c=("c", "sum"), s=("s", lambda g: sum(int(x) for x in g))
    )
    total = int(agg.loc[len(bounds), "s"])
    # S(s) at each boundary rank, then tile sums by difference
    S = []
    for i, (s_rank, t) in enumerate(zip(cuts, bounds)):
        c_lt = int(agg.loc[i, "c"])
        s_lt = int(agg.loc[i, "s"])
        S.append(s_lt + (int(s_rank) - c_lt) * int(t))
    S.append(total)
    prev = 0
    rows = []
    for qi in range(tiles):
        tile_sum = S[qi] - prev
        prev = S[qi]
        if sizes[qi] == 0:
            continue  # NTILE emits no tile id for empty tiles (n < tiles)
        rows.append((qi + 1, int(sizes[qi]), int(tile_sum)))
    return pd.DataFrame(
        rows, columns=["quartile", "n", "sum_cents"]
    ).astype({"quartile": "int64", "n": "int64", "sum_cents": "int64"})


def trimmed_mean_extendedprice(
    sf_dir: str, trim_denom: int = 10
) -> pd.DataFrame:
    """Two-sided 10% trimmed mean of l_extendedprice — the robust
    location estimate between the mean (outlier-dragged) and the median
    (throws away 98% of the data). Drops the k = ⌊αn⌋ lowest and highest
    values and averages the middle n−2k.

    Same order-statistics algebra as the NTILE totals: the trimmed sum
    is S(n−k) − S(k) where S(s) = Σ(v < t_s) + (s − #(v < t_s))·t_s with
    t_s the exact order statistic at rank s−1 — tie-order-invariant
    because tied boundary values are interchangeable in the sorted
    sequence. Two boundary selections (ONE shared histogram-refinement
    round) + ONE threshold-stats scan; values fix to integer cents, all
    sums merge as Python ints (HUGEINT mirror), and the mean is a single
    division of exact integers on both engines."""
    from ._util import round_duck as _rd

    path = f"{sf_dir}/lineitem.parquet"

    def transform(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "g": np.zeros(len(df), dtype=np.int8),
                "__cents": _rd(
                    df["l_extendedprice"].to_numpy(np.float64) * 100.0, 0
                ),
            }
        )

    holder: dict = {}

    def boundary_ranks(counts: dict) -> dict:
        n = counts.get(0, 0)
        k = n // trim_denom  # ⌊αn⌋ as EXACT integer division (α = 1/denom)
        # — the oracle's n // 10; float n·0.1 could misfloor at boundaries
        holder["n"], holder["k"] = n, k
        if n == 0 or n - 2 * k <= 0:
            return {0: []}
        ranks = set()
        if k > 0:
            ranks.add(k - 1)  # t_k: the k-th smallest
        if n - k < n:  # == k > 0; t_{n-k}
            ranks.add(n - k - 1)
        return {0: sorted(ranks)}

    vals, _counts = _rank_values(
        path,
        "g",
        "__cents",
        boundary_ranks,
        read_cols=["l_extendedprice"],
        transform=lambda df: transform(df.dropna(subset=["l_extendedprice"])),
    )
    n, k = holder["n"], holder["k"]
    empty = pd.DataFrame(
        {
            "n_rows": pd.Series([], dtype="int64"),
            "n_kept": pd.Series([], dtype="int64"),
            "trimmed_sum_cents": pd.Series([], dtype="int64"),
            "trimmed_mean": pd.Series([], dtype="float64"),
        }
    )
    if n == 0 or n - 2 * k <= 0:
        return empty

    from ..shuffle import map_partials

    # S(s) thresholds: cents < t count/sum per scan task, plus the grand
    # total (S(n) when k == 0 needs no boundary value at all)
    bounds = []
    if k > 0:
        bounds = [vals[0][k - 1], vals[0][n - k - 1]]

    def thr_stats(batch: pa.Table, _b=tuple(bounds)) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["l_extendedprice"])
        cents = _rd(
            df["l_extendedprice"].to_numpy(np.float64) * 100.0, 0
        ).astype(np.int64)
        rows = []
        for i, t in enumerate(_b):
            lt = cents[cents < t]
            rows.append((i, len(lt), int(lt.sum())))
        rows.append((len(_b), len(cents), int(cents.sum())))
        return pd.DataFrame(rows, columns=["i", "c", "s"])

    parts = map_partials(path, ["l_extendedprice"], None, thr_stats)
    agg = parts.groupby("i").agg(
        c=("c", "sum"), s=("s", lambda g: sum(int(x) for x in g))
    )
    total = int(agg.loc[len(bounds), "s"])

    def S(s_rank: int, t_idx: int) -> int:
        c_lt = int(agg.loc[t_idx, "c"])
        s_lt = int(agg.loc[t_idx, "s"])
        return s_lt + (s_rank - c_lt) * int(bounds[t_idx])

    if k > 0:
        trimmed = S(n - k, 1) - S(k, 0)
    else:
        trimmed = total
    kept = n - 2 * k
    return pd.DataFrame(
        {
            "n_rows": pd.Series([n], dtype="int64"),
            "n_kept": pd.Series([kept], dtype="int64"),
            "trimmed_sum_cents": pd.Series([trimmed], dtype="int64"),
            "trimmed_mean": [
                float(round_duck(float(trimmed) / float(kept) / 100.0, 6))
            ],
        }
    )


def revenue_band_lineitem(sf_dir: str) -> pd.DataFrame:
    """p10/p50/p90 of the DERIVED discounted-revenue expression
    l_extendedprice · (1 − l_discount) — exact selection over a value
    that exists in no column (the TPC-H revenue term): the transform
    runs inside every scan task with the identical float tree as the
    oracle (product, 1−d, ROUND to 2 dp — round_duck mirrors DuckDB's
    half-away-from-zero), so the selected order statistics are drawn
    from bit-identical multisets. All three ranks resolve in ONE shared
    histogram-refinement round (multi-rank tasks share every scan);
    rank convention is quantile_disc's ceil(q·n) − 1, proven by the
    percentile_disc op above."""
    path = f"{sf_dir}/lineitem.parquet"
    qs = (0.1, 0.5, 0.9)

    def transform(df: pd.DataFrame) -> pd.DataFrame:
        p = df["l_extendedprice"].to_numpy(np.float64)
        d = df["l_discount"].to_numpy(np.float64)
        return pd.DataFrame(
            {
                "g": np.zeros(len(df), dtype=np.int8),
                "__rev": round_duck(p * (1.0 - d), 2),
            }
        )

    def band_ranks(counts: dict) -> dict:
        n = counts.get(0, 0)
        if n == 0:
            return {0: []}
        return {0: sorted({max(0, math.ceil(q * n) - 1) for q in qs})}

    vals, counts = _rank_values(
        path,
        "g",
        "__rev",
        band_ranks,
        read_cols=["l_extendedprice", "l_discount"],
        transform=lambda df: transform(
            df.dropna(subset=["l_extendedprice", "l_discount"])
        ),
    )
    n = counts.get(0, 0)
    if n == 0:
        return pd.DataFrame(
            {
                "n_rows": pd.Series([], dtype="int64"),
                "p10_rev": pd.Series([], dtype="float64"),
                "p50_rev": pd.Series([], dtype="float64"),
                "p90_rev": pd.Series([], dtype="float64"),
            }
        )
    band = [
        float(round_duck(vals[0][max(0, math.ceil(q * n) - 1)], 4))
        for q in qs
    ]
    return pd.DataFrame(
        {
            "n_rows": pd.Series([n], dtype="int64"),
            "p10_rev": [band[0]],
            "p50_rev": [band[1]],
            "p90_rev": [band[2]],
        }
    )


def revenue_concentration_customers(
    sf_dir: str, top_frac: float = 0.01, collect_cap: int = 200_000
) -> pd.DataFrame:
    """Revenue concentration (the Gini-style "what share do the top 1%
    hold" question): total order value of the top ``top_frac`` of
    customers as a share of all order value.

    This is selection over AGGREGATES — the per-customer totals only
    exist after an exchange, so no single-table quantile applies:

    1. orders pre-aggregate per batch to (custkey, cents) partials and
       hash-bucket by custkey; each bucket finalizes its customers'
       exact integer-cent totals and emits a bit-pattern HISTOGRAM of
       them (≤ 1024 rows: bin / count / per-bin cents sum / extents)
       plus one (n_customers, total_cents) summary row — never the
       per-customer frame;
    2. the driver locates the bin containing the k-th-largest total
       (k = CEIL(n · top_frac)) — everything in higher bins is counted
       into the top cohort by the bins' exact per-bin sums;
    3. a second pass over the SAME exchange collects only the candidate
       bin's values (≤ ``collect_cap``; a skew-degenerate bin would
       recurse with selection.py's refinement, not collect).

    All totals are exact int64 cents (driver merges in Python ints —
    the HUGEINT mirror), so the rank order, tie handling and the final
    share are bit-reproducible: the top-k VALUE multiset is
    tie-order-invariant, which is why the oracle's ROW_NUMBER tie-break
    doesn't matter."""
    from .dedup import _dedup_buckets, _fused_grouped_frames
    from ._util import round_duck as _rd

    path = f"{sf_dir}/orders.parquet"
    num_buckets = _dedup_buckets()
    mult = np.uint64(0x9E3779B97F4A7C15)
    shift = np.uint64(64 - 10)  # 1024 bins

    def _bucket(keys: np.ndarray) -> np.ndarray:
        return (
            keys.astype(np.uint64) * mult % np.uint64(num_buckets)
        ).astype(np.int32)

    def _okey(v: np.ndarray) -> np.ndarray:
        u = v.view(np.uint64)
        return np.where(
            u >> np.uint64(63) == 1, ~u, u | np.uint64(0x8000000000000000)
        )

    def order_partials(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["o_custkey", "o_totalprice"])
        part = pd.DataFrame(
            {
                "key": df["o_custkey"].to_numpy(np.int64),
                "cents": _rd(
                    df["o_totalprice"].to_numpy(np.float64) * 100.0, 0
                ).astype(np.int64),
            }
        )
        part = part.groupby("key", as_index=False)["cents"].sum()
        part["__bucket"] = _bucket(part["key"].to_numpy(np.int64))
        return part

    def _totals(df: pd.DataFrame) -> np.ndarray:
        return (
            df.groupby("key")["cents"].sum().to_numpy(np.int64)
        )

    def hist_per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        cents = _totals(df)
        if len(cents) == 0:
            return pd.DataFrame(
                {"bin": [-1], "cnt": [0], "tot": [0], "vmin": [0.0], "vmax": [0.0]}
            )
        v = cents.astype(np.float64)  # cents < 2^53: exact
        b = (_okey(v) >> shift).astype(np.int64)
        order = np.argsort(b, kind="stable")
        bs, vs, cs = b[order], v[order], cents[order]
        cut = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
        ends = np.r_[cut[1:], len(bs)]
        rows = [
            (
                int(bs[i]),
                int(j - i),
                int(cs[i:j].sum()),
                float(vs[i:j].min()),
                float(vs[i:j].max()),
            )
            for i, j in zip(cut, ends)
        ]
        out = pd.DataFrame(
            rows, columns=["bin", "cnt", "tot", "vmin", "vmax"]
        )
        # one summary row per bucket (bin = -1): customers + grand total
        return pd.concat(
            [
                out,
                pd.DataFrame(
                    {
                        "bin": [-1],
                        "cnt": [len(cents)],
                        "tot": [int(cents.sum())],
                        "vmin": [0.0],
                        "vmax": [0.0],
                    }
                ),
            ],
            ignore_index=True,
        )

    specs = [(path, ["o_custkey", "o_totalprice"], None, order_partials)]
    parts = _fused_grouped_frames(specs, num_buckets, hist_per_bucket)

    summary = parts[parts["bin"] == -1]
    n = int(summary["cnt"].sum())
    if n == 0:
        return pd.DataFrame(
            {
                "n_customers": pd.Series([0], dtype="int64"),
                "k": pd.Series([0], dtype="int64"),
                "top_cents": pd.Series([0], dtype="int64"),
                "total_cents": pd.Series([0], dtype="int64"),
                "top_share": [None],
            }
        )
    total = sum(int(x) for x in summary["tot"])
    k = math.ceil(n * top_frac)

    hist = (
        parts[parts["bin"] >= 0]
        .groupby("bin", as_index=False)
        .agg(
            cnt=("cnt", "sum"),
            tot=("tot", "sum"),
            vmin=("vmin", "min"),
            vmax=("vmax", "max"),
        )
        .sort_values("bin", ascending=False)  # rank from the TOP
        .reset_index(drop=True)
    )
    cum = np.cumsum(hist["cnt"].to_numpy(np.int64))
    bi = int(np.searchsorted(cum, k - 1, side="right"))
    n_above = int(cum[bi - 1]) if bi > 0 else 0
    sum_above = sum(int(x) for x in hist["tot"].to_numpy()[:bi])
    need = k - n_above
    lo, hi = float(hist["vmin"][bi]), float(hist["vmax"][bi])
    if int(hist["cnt"][bi]) > collect_cap:
        raise RuntimeError(
            "candidate bin exceeds collect_cap — recurse with histogram "
            "refinement (selection._rank_values pattern) before collecting"
        )

    def collect_per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        cents = _totals(df)
        v = cents.astype(np.float64)
        keep = cents[(v >= lo) & (v <= hi)]
        return pd.DataFrame({"cents": keep})

    cand = _fused_grouped_frames(specs, num_buckets, collect_per_bucket)
    vs = np.sort(cand["cents"].to_numpy(np.int64))[::-1]
    top = sum_above + sum(int(x) for x in vs[:need])
    return pd.DataFrame(
        {
            "n_customers": pd.Series([n], dtype="int64"),
            "k": pd.Series([k], dtype="int64"),
            "top_cents": pd.Series([top], dtype="int64"),
            "total_cents": pd.Series([total], dtype="int64"),
            "top_share": [float(_rd(float(top) * 1.0 / float(total), 4))],
        }
    )


def rfm_segments_customers(
    sf_dir: str, num_buckets: int | None = None, collect_cap: int = 200_000
) -> pd.DataFrame:
    """RFM segmentation — the marketing-analytics workhorse: every
    customer scored 1–4 on Recency (last order day), Frequency (order
    count) and Monetary (total cents), counted into the ≤ 64 (r, f, m)
    segment cells. Quartile boundaries are EXACT ``quantile_disc``
    order statistics (0-indexed rank ceil(q·n) − 1) of the
    per-customer aggregate distributions — selection over AGGREGATES,
    so the values being ranked only exist after an exchange.

    Three runs of ONE customer-hash exchange (orders pre-aggregate per
    batch, so the exchange carries per-batch partials, never rows):
    pass 1 finalizes each bucket's exact integer triples and emits a
    1024-bin order-preserving bit-pattern histogram per dimension
    (sign-bit-flipped int64 >> 54 — monotone, so bin order IS value
    order); the driver locates the 9 quartile ranks' bins; pass 2
    collects only candidate-bin values as compressed (value, count)
    rows (loud error above ``collect_cap`` — recurse with
    selection.py's refinement before collecting); pass 3 classifies
    every customer against the 9 broadcast boundary ints and reduces
    to ≤ 64 count cells per bucket. Scores compare with strict ``>``
    against the three boundaries — deterministic under ties on both
    engines, unlike NTILE's row-order-dependent split."""
    from .dedup import _dedup_buckets, _fused_grouped_frames
    from ._util import round_duck as _rd

    path = f"{sf_dir}/orders.parquet"
    num_buckets = num_buckets or _dedup_buckets()
    mult = np.uint64(0x9E3779B97F4A7C15)
    shift = np.uint64(64 - 10)
    sign = np.uint64(0x8000000000000000)
    fsql = (
        "o_custkey IS NOT NULL AND o_orderdate IS NOT NULL "
        "AND o_totalprice IS NOT NULL"
    )
    cols = ["o_custkey", "o_orderdate", "o_totalprice"]
    DIMS = ("r", "f", "m")

    def partials(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        day = (
            df["o_orderdate"].astype("datetime64[us]").astype("int64")
            // 86_400_000_000
        )
        part = pd.DataFrame(
            {
                "key": df["o_custkey"].to_numpy(np.int64),
                "r": day.to_numpy(),
                "f": np.ones(len(df), dtype=np.int64),
                "m": _rd(
                    df["o_totalprice"].to_numpy(np.float64) * 100.0, 0
                ).astype(np.int64),
            }
        )
        g = part.groupby("key", as_index=False).agg(
            r=("r", "max"), f=("f", "sum"), m=("m", "sum")
        )
        g["__bucket"] = (
            g["key"].to_numpy(np.uint64) * mult % np.uint64(num_buckets)
        ).astype(np.int32)
        return g

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("key").agg(
            r=("r", "max"), f=("f", "sum"), m=("m", "sum")
        )

    def binof(v: np.ndarray) -> np.ndarray:
        return ((v.view(np.uint64) ^ sign) >> shift).astype(np.int64)

    specs = [(path, cols, fsql, partials)]

    def hist_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"dim": [], "bin": [], "cnt": [], "vmin": [], "vmax": []}
            ).astype(
                {
                    "dim": "object",
                    "bin": "int64",
                    "cnt": "int64",
                    "vmin": "int64",
                    "vmax": "int64",
                }
            )
        t = finalize(df)
        rows = []
        for dim in DIMS:
            v = t[dim].to_numpy(np.int64)
            b = binof(v)
            order = np.argsort(b, kind="stable")
            bs, vs = b[order], v[order]
            cut = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
            ends = np.r_[cut[1:], len(bs)]
            for i, j in zip(cut, ends):
                rows.append(
                    (
                        dim,
                        int(bs[i]),
                        int(j - i),
                        int(vs[i:j].min()),
                        int(vs[i:j].max()),
                    )
                )
        return pd.DataFrame(
            rows, columns=["dim", "bin", "cnt", "vmin", "vmax"]
        )

    parts = _fused_grouped_frames(specs, num_buckets, hist_bucket)
    if len(parts) == 0 or int(parts["cnt"].sum()) == 0:
        return pd.DataFrame(
            {
                "r_q": pd.Series([], dtype="int64"),
                "f_q": pd.Series([], dtype="int64"),
                "m_q": pd.Series([], dtype="int64"),
                "n_customers": pd.Series([], dtype="int64"),
            }
        )

    ranks_needed: dict[str, list[int]] = {}
    bin_plans: dict[str, tuple] = {}
    cand_bins: dict[str, set] = {d: set() for d in DIMS}
    for dim in DIMS:
        h = (
            parts[parts["dim"] == dim]
            .groupby("bin", as_index=False)["cnt"]
            .sum()
            .sort_values("bin")
            .reset_index(drop=True)
        )
        n = int(h["cnt"].sum())
        cum = np.cumsum(h["cnt"].to_numpy(np.int64))
        ks = [max(0, math.ceil(q * n) - 1) for q in (0.25, 0.5, 0.75)]
        plan = []
        for k in ks:
            bi = int(np.searchsorted(cum, k, side="right"))
            below = int(cum[bi - 1]) if bi > 0 else 0
            if int(h["cnt"][bi]) > collect_cap:
                raise RuntimeError(
                    "RFM candidate bin exceeds collect_cap — recurse "
                    "with histogram refinement before collecting"
                )
            plan.append((k, int(h["bin"][bi]), below))
            cand_bins[dim].add(int(h["bin"][bi]))
        ranks_needed[dim] = ks
        bin_plans[dim] = tuple(plan)
    cand_capture = {d: frozenset(v) for d, v in cand_bins.items()}

    def collect_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"dim": [], "bin": [], "v": [], "c": []}).astype(
            {"dim": "object", "bin": "int64", "v": "int64", "c": "int64"}
        )
        if len(df) == 0:
            return empty
        t = finalize(df)
        frames = []
        for dim in DIMS:
            v = t[dim].to_numpy(np.int64)
            b = binof(v)
            for bin_ in cand_capture[dim]:
                sel = v[b == bin_]
                if len(sel):
                    vals, cnts = np.unique(sel, return_counts=True)
                    frames.append(
                        pd.DataFrame(
                            {
                                "dim": dim,
                                "bin": bin_,
                                "v": vals,
                                "c": cnts.astype(np.int64),
                            }
                        )
                    )
        return pd.concat(frames, ignore_index=True) if frames else empty

    coll = _fused_grouped_frames(specs, num_buckets, collect_bucket)
    bounds: dict[str, list[int]] = {}
    for dim in DIMS:
        bs = []
        for k, bin_, below in bin_plans[dim]:
            g = (
                coll[(coll["dim"] == dim) & (coll["bin"] == bin_)]
                .groupby("v", as_index=False)["c"]
                .sum()
                .sort_values("v")
            )
            cum = np.cumsum(g["c"].to_numpy(np.int64))
            j = int(np.searchsorted(cum, k - below, side="right"))
            bs.append(int(g["v"].to_numpy()[j]))
        bounds[dim] = bs

    def classify_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"r_q": [], "f_q": [], "m_q": [], "n": []}
            ).astype("int64")
        t = finalize(df)
        cell = {}
        for dim in DIMS:
            v = t[dim].to_numpy(np.int64)
            b1, b2, b3 = bounds[dim]
            cell[dim + "_q"] = (
                1 + (v > b1).astype(np.int64) + (v > b2) + (v > b3)
            )
        out = (
            pd.DataFrame(cell)
            .groupby(["r_q", "f_q", "m_q"], as_index=False)
            .size()
        )
        return out.rename(columns={"size": "n"})

    cells = _fused_grouped_frames(specs, num_buckets, classify_bucket)
    out = (
        cells.groupby(["r_q", "f_q", "m_q"], as_index=False)["n"]
        .sum()
        .sort_values(["r_q", "f_q", "m_q"])
        .reset_index(drop=True)
        .rename(columns={"n": "n_customers"})
    )
    return out.astype(
        {
            "r_q": "int64",
            "f_q": "int64",
            "m_q": "int64",
            "n_customers": "int64",
        }
    )


_GINI_SIGN = 0x8000000000000000
_GINI_SHIFT = 54  # 1024 order-preserving bit-pattern value bins


def _gini_hash(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    h = keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return ((h >> np.uint64(32)) % np.uint64(num_buckets)).astype(np.int32)


def _gini_map(unit, b1: int) -> list:
    """Gini hop-1 map: per-batch per-customer cent partials for the
    scan unit, split by CUSTOMER hash (a customer's orders span scan
    units, so totals must wait until the customer is co-located)."""
    from ..shuffle import _split_by_bucket, read_unit
    from ._util import round_duck as _rd

    df = (
        read_unit(unit, ["o_custkey", "o_totalprice"])
        .to_pandas()
        .dropna(subset=["o_custkey", "o_totalprice"])
    )
    part = pd.DataFrame(
        {
            "key": df["o_custkey"].to_numpy(np.int64),
            "m": _rd(df["o_totalprice"].to_numpy(np.float64) * 100.0, 0).astype(
                np.int64
            ),
        }
    )
    part = part.groupby("key", as_index=False)["m"].sum()
    part["__bucket"] = _gini_hash(part["key"].to_numpy(np.int64), b1)
    return _split_by_bucket(pa.Table.from_pandas(part, preserve_index=False), b1)


def _gini_reduce1(b2: int, *shards) -> list:
    """Hop-1 reduce AND hop-2 map: finalize this bucket's exact
    per-customer totals, compress them to (value, count) rows — the
    customer keys are DONE and never travel further — and re-emit
    pre-split by order-preserving VALUE bin (bin % B2, num_returns =
    B2), so hop 2 holds every occurrence of each of its bins."""
    from ..shuffle import _split_by_bucket

    empty = pa.table(
        {
            "v": pa.array([], pa.int64()),
            "c": pa.array([], pa.int64()),
            "bin": pa.array([], pa.int64()),
            "__bucket": pa.array([], pa.int32()),
        }
    )
    sh = [s for s in shards if s.num_rows]
    if not sh:
        return [empty.slice(0, 0)] * b2
    df = pa.concat_tables(sh).to_pandas()
    totals = df.groupby("key")["m"].sum().to_numpy(np.int64)
    vals, cnts = np.unique(totals, return_counts=True)
    bins = (
        (vals.view(np.uint64) ^ np.uint64(_GINI_SIGN))
        >> np.uint64(_GINI_SHIFT)
    ).astype(np.int64)
    out = pd.DataFrame({"v": vals, "c": cnts.astype(np.int64), "bin": bins})
    out["__bucket"] = (bins % b2).astype(np.int32)
    return _split_by_bucket(pa.Table.from_pandas(out, preserve_index=False), b2)


def _gini_reduce2(*shards) -> pd.DataFrame:
    """Hop-2 reduce: this task owns whole VALUE bins. Merge each bin's
    (value, count) rows across hop-1 reduces, sort (bin order IS value
    order, so a bin's rank offset is just the count of lower bins), and
    fold the bin to three integers: count, Σc·v, and the bin-LOCAL
    weighted rank sum L = Σ v·(c·prev + c(c+1)/2) — exact int64 while
    v·n < 2⁶³ (beyond ~10⁹ customers switch the fold to Python ints)."""
    sh = [s for s in shards if s.num_rows]
    if not sh:
        return pd.DataFrame(
            {"bin": [], "cnt": [], "s": [], "lw": []}
        ).astype("int64")
    df = (
        pa.concat_tables(sh)
        .to_pandas()
        .groupby(["bin", "v"], as_index=False)["c"]
        .sum()
        .sort_values(["bin", "v"], kind="stable")
    )
    rows = []
    for bin_, g in df.groupby("bin", sort=True):
        v = g["v"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        prev = np.r_[0, np.cumsum(c)[:-1]]
        lw = int((v * (c * prev + c * (c + 1) // 2)).sum())
        rows.append((int(bin_), int(c.sum()), int((v * c).sum()), lw))
    return pd.DataFrame(rows, columns=["bin", "cnt", "s", "lw"]).astype(
        "int64"
    )


def gini_revenue_customers(
    sf_dir: str,
    num_buckets: int | None = None,
    num_buckets2: int | None = None,
) -> pd.DataFrame:
    """Gini coefficient of customer revenue — the inequality measure
    behind the revenue-concentration question, EXACT at any scale:
    G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) over globally rank-ordered
    per-customer totals. A global sort never happens: hop 1 co-locates
    each customer by key hash and finalizes exact integer totals; each
    hop-1 reduce re-emits its totals as (value, count) rows pre-split
    by order-preserving bit-pattern VALUE bin (the chained-exchange
    pattern — num_returns = B2, no driver hop); hop 2 owns whole bins,
    so its within-bin prefix sums are globally correct up to the bin
    offset, and it folds each bin to THREE integers. The driver merges
    ≤ 1024 bin rows with Python-int prefix sums (the HUGEINT mirror):
    Σi·x = Σ_bins (offset·Σx_bin + L_bin). Rank ties carry equal
    values, so tie order provably cannot change Σi·x — both engines
    agree exactly, and G is one division of exact integers."""
    import ray

    from ..io import count_rows, list_parquet_files
    from ..shuffle import _scan_units, _shuffle_target_bytes
    from .windows import scaled_num_buckets

    path = f"{sf_dir}/orders.parquet"
    files = list_parquet_files(path)
    b1 = num_buckets or scaled_num_buckets(count_rows(path))
    b2 = num_buckets2 or max(8, b1 // 2)

    empty = pd.DataFrame(
        {
            "n_customers": pd.Series([], dtype="int64"),
            "total_cents": pd.Series([], dtype="int64"),
            "weighted_rank_sum": pd.Series([], dtype="int64"),
            "gini": pd.Series([], dtype="float64"),
        }
    )
    units = _scan_units(files, _shuffle_target_bytes([files]))
    if not units:
        return empty

    map_task = ray.remote(num_returns=b1)(_gini_map)
    red1_task = ray.remote(num_returns=b2)(_gini_reduce1)
    red2_task = ray.remote(_gini_reduce2)

    def _as_list(res, n):
        return [res] if n == 1 else res

    map_shards = [_as_list(map_task.remote(u, b1), b1) for u in units]
    bin_shards = [
        _as_list(red1_task.remote(b2, *[s[bb] for s in map_shards]), b2)
        for bb in range(b1)
    ]
    parts = ray.get(
        [
            red2_task.remote(*[s[bb] for s in bin_shards])
            for bb in range(b2)
        ]
    )
    folded = pd.concat(parts, ignore_index=True)
    if len(folded) == 0:
        return empty
    folded = folded.sort_values("bin", kind="stable").reset_index(drop=True)
    n = w = s = 0  # Python ints: the HUGEINT mirror
    for _, row in folded.iterrows():
        w += n * int(row["s"]) + int(row["lw"])
        n += int(row["cnt"])
        s += int(row["s"])
    if n == 0:
        return empty
    gini = (
        float(round_duck((2 * w - (n + 1) * s) * 1.0 / (n * s), 6))
        if s != 0
        else None
    )
    return pd.DataFrame(
        {
            "n_customers": pd.Series([n], dtype="int64"),
            "total_cents": pd.Series([s], dtype="int64"),
            "weighted_rank_sum": pd.Series([w], dtype="int64"),
            "gini": [gini],
        }
    )


def mad_extendedprice(sf_dir: str) -> pd.DataFrame:
    """Median absolute deviation per group — the robust dispersion
    statistic (outlier-resistant where STDDEV is not), defined here
    around the 4dp-ROUNDED group median so the center is one agreed
    double on both engines: MAD = median(|x - round(median(x), 4)|).

    Two chained selection rounds, each a driver-controlled sequence of
    distributed histogram-refinement scans: round 1 is the existing
    exact grouped median; round 2 selects over the DERIVED column
    |x - m_g| via ``_rank_values(transform=...)`` — the tiny per-group
    center map is captured into the scan-task closure (broadcast), the
    absolute deviations are computed vectorized inside each task, and
    nothing bigger than histogram partials ever moves. The abs-diff of
    bit-equal doubles is bit-equal, so the second selection's input
    multiset matches SQL exactly."""
    path = f"{sf_dir}/lineitem.parquet"
    med = exact_quantile_extendedprice(sf_dir, 0.5)
    m4 = dict(zip(med["l_returnflag"], med["median_price"]))

    def transform(df: pd.DataFrame) -> pd.DataFrame:
        # factorize + LUT gather, not Series.map: the dict map is a
        # per-row Python call (~1 s/scan at sf0.1 — measured), the
        # gather is one C pass
        codes, uniq = pd.factorize(df["l_returnflag"])
        lut = np.r_[
            np.array([m4.get(u, np.nan) for u in uniq], dtype=np.float64),
            np.nan,  # factorize codes NULL groups as -1 → last slot
        ]
        center = lut[codes]
        return pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "__absdev": np.abs(
                    df["l_extendedprice"].to_numpy(np.float64) - center
                ),
            }
        )

    def quantile_ranks(counts: dict) -> dict:
        return {
            grp: sorted({math.floor((n - 1) * 0.5), math.ceil((n - 1) * 0.5)})
            for grp, n in counts.items()
        }

    vals, counts = _rank_values(
        path,
        "l_returnflag",
        "__absdev",
        quantile_ranks,
        read_cols=["l_returnflag", "l_extendedprice"],
        transform=transform,
    )
    rows = []
    for grp in sorted(vals):
        h = (counts[grp] - 1) * 0.5
        j0, j1 = math.floor(h), math.ceil(h)
        v0, v1 = vals[grp][j0], vals[grp][j1]
        rows.append(
            (
                grp,
                float(round_duck(v0 + (v1 - v0) * (h - j0), 4)),
                float(m4[grp]),
            )
        )
    return pd.DataFrame(
        rows, columns=["l_returnflag", "mad_price", "median_price"]
    )


def tdigest_quantile_extendedprice(sf_dir: str, q: float = 0.5) -> pd.DataFrame:
    """Approximate grouped quantile via the engine's t-digest sketch —
    the ONE-scan path when refinement passes are too expensive or the
    quantile rides an existing profile pass. Rows-only check, but
    self-audited: reports the sketch estimate NEXT TO the exact
    selection result and the relative error, so the approximation
    quality is measured, not assumed."""
    from ..shuffle import map_partials
    from ..sketches import TDigest

    path = f"{sf_dir}/lineitem.parquet"

    def partial(batch: pa.Table) -> pd.DataFrame:
        import pickle

        df = batch.to_pandas().dropna(subset=["l_extendedprice"])
        rows = []
        for grp, g in df.groupby("l_returnflag", sort=False):
            td = TDigest()
            td.add(g["l_extendedprice"].to_numpy(np.float64))
            rows.append((grp, pickle.dumps(td)))
        return pd.DataFrame(rows, columns=["grp", "blob"])

    import pickle

    # raw-task scan over DETERMINISTIC file/row-group units: a t-digest's
    # estimate depends on how the input was batched, and Ray Data's
    # dynamic batching varies under memory pressure — the run-to-run
    # determinism the rows-only check asserts needs pinned unit bounds
    parts = map_partials(path, ["l_returnflag", "l_extendedprice"], None, partial)
    exact = exact_quantile_extendedprice(sf_dir, q).set_index("l_returnflag")[
        "median_price"
    ]
    rows = []
    for grp, g in parts.groupby("grp", sort=True):
        merged = None
        for blob in g["blob"]:
            td = pickle.loads(blob)
            merged = td if merged is None else merged.merge(td)
        est = float(merged.quantile(np.array([q]))[0])
        ex = float(exact.loc[grp])
        rows.append(
            (grp, round(est, 4), ex, round(abs(est - ex) / max(abs(ex), 1e-12), 6))
        )
    return pd.DataFrame(
        rows,
        columns=["l_returnflag", "tdigest_median", "exact_median", "rel_err"],
    )


def iqr_outliers_extendedprice(sf_dir: str) -> pd.DataFrame:
    """Tukey-fence outlier gate per returnflag — the ROBUST counterpart
    of the z-score gate (stats.zscore_outliers_lineitem): q1/q3 resolve
    in ONE shared histogram-refinement selection round (both ranks for
    both quartiles of every group share every scan, like the percentile
    bands), the fences lo = q1 − 1.5·IQR / hi = q3 + 1.5·IQR are built
    from the 4dp-ROUNDED quantiles with the identical expression tree on
    both engines (so the fence doubles are bit-equal and a boundary row
    can never be classified differently), and a second scan counts
    breaches vectorized with the fences broadcast via closure capture.
    Groups whose price column is entirely NULL are absent on both sides
    (oracle HAVING mirrors the engine's empty-group omission)."""
    path = f"{sf_dir}/lineitem.parquet"
    qs = (0.25, 0.75)

    def iqr_ranks(counts: dict) -> dict:
        return {
            grp: sorted(
                {
                    r
                    for q in qs
                    for r in (
                        math.floor((n - 1) * q),
                        math.ceil((n - 1) * q),
                    )
                }
            )
            for grp, n in counts.items()
        }

    vals, counts = _rank_values(
        path, "l_returnflag", "l_extendedprice", iqr_ranks
    )
    quart: dict = {}
    for grp in sorted(vals):
        n = counts[grp]
        q14 = []
        for q in qs:
            h = (n - 1) * q
            j0, j1 = math.floor(h), math.ceil(h)
            v0, v1 = vals[grp][j0], vals[grp][j1]
            q14.append(float(round_duck(v0 + (v1 - v0) * (h - j0), 4)))
        q1, q3 = q14
        quart[grp] = (q1, q3, q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1))

    from ..shuffle import map_partials

    def breach_partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = batch.to_pandas().dropna(
            subset=["l_returnflag", "l_extendedprice"]
        )
        rows = []
        for grp, (_q1, _q3, lo, hi) in quart.items():
            v = df.loc[
                df["l_returnflag"] == grp, "l_extendedprice"
            ].to_numpy(np.float64)
            rows.append(
                (grp, len(v), int(((v < lo) | (v > hi)).sum()))
            )
        return pd.DataFrame(rows, columns=["grp", "n", "out"])

    parts = map_partials(
        path, ["l_returnflag", "l_extendedprice"], None, breach_partial
    )
    agg = (
        parts.groupby("grp")[["n", "out"]].sum()
        if len(parts)
        else pd.DataFrame(columns=["n", "out"])
    )
    rows = [
        (
            grp,
            int(agg.loc[grp, "n"]) if grp in agg.index else 0,
            quart[grp][0],
            quart[grp][1],
            int(agg.loc[grp, "out"]) if grp in agg.index else 0,
        )
        for grp in sorted(quart)
    ]
    return pd.DataFrame(
        rows, columns=["l_returnflag", "n_rows", "q1", "q3", "n_outliers"]
    ).astype({"n_rows": "int64", "n_outliers": "int64"})


QUERIES = {
    "exact_quantile_extendedprice": exact_quantile_extendedprice,
    "tdigest_quantile_extendedprice": tdigest_quantile_extendedprice,
    "mad_extendedprice": mad_extendedprice,
    "revenue_concentration_customers": revenue_concentration_customers,
    "percentile_disc_extendedprice": percentile_disc_extendedprice,
    "ntile_revenue_orders": ntile_revenue_orders,
    "value_percentiles_events": value_percentiles_events,
    "weighted_median_lineitem": weighted_median_lineitem,
    "rfm_segments_customers": rfm_segments_customers,
    "gini_revenue_customers": gini_revenue_customers,
    "iqr_outliers_extendedprice": iqr_outliers_extendedprice,
    "trimmed_mean_extendedprice": trimmed_mean_extendedprice,
    "revenue_band_lineitem": revenue_band_lineitem,
}

ORACLE_SQL = {
    "revenue_band_lineitem": """
        WITH b AS (
            SELECT ROUND(l_extendedprice * (1 - l_discount), 2) AS v
            FROM lineitem
            WHERE l_extendedprice IS NOT NULL AND l_discount IS NOT NULL
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               ROUND(quantile_disc(v, 0.1), 4) AS p10_rev,
               ROUND(quantile_disc(v, 0.5), 4) AS p50_rev,
               ROUND(quantile_disc(v, 0.9), 4) AS p90_rev
        FROM b HAVING COUNT(*) > 0
    """,
    "trimmed_mean_extendedprice": """
        WITH b AS (
            SELECT CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS c
            FROM lineitem WHERE l_extendedprice IS NOT NULL
        ),
        r AS (
            SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rn,
                   COUNT(*) OVER () AS n
            FROM b
        ),
        t AS (
            SELECT MAX(n) AS n_rows,
                   COUNT(*) FILTER (
                       WHERE rn > n // 10 AND rn <= n - n // 10) AS n_kept,
                   SUM(c) FILTER (
                       WHERE rn > n // 10 AND rn <= n - n // 10) AS s
            FROM r
        )
        SELECT CAST(n_rows AS BIGINT) AS n_rows,
               CAST(n_kept AS BIGINT) AS n_kept,
               CAST(s AS BIGINT) AS trimmed_sum_cents,
               ROUND(CAST(s AS DOUBLE) / CAST(n_kept AS DOUBLE) / 100.0, 6)
                   AS trimmed_mean
        FROM t WHERE n_kept > 0
    """,
    "iqr_outliers_extendedprice": """
        WITH q AS (
            SELECT l_returnflag AS f,
                   ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS q1,
                   ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS q3
            FROM lineitem
            WHERE l_returnflag IS NOT NULL
            GROUP BY 1
            HAVING COUNT(l_extendedprice) > 0
        )
        SELECT q.f AS l_returnflag,
               CAST(COUNT(l.l_extendedprice) AS BIGINT) AS n_rows,
               q.q1, q.q3,
               CAST(COUNT(*) FILTER (WHERE
                   l.l_extendedprice < q.q1 - 1.5 * (q.q3 - q.q1)
                   OR l.l_extendedprice > q.q3 + 1.5 * (q.q3 - q.q1))
                   AS BIGINT) AS n_outliers
        FROM q LEFT JOIN lineitem l ON l.l_returnflag = q.f
        GROUP BY 1, 3, 4 ORDER BY 1
    """,
    "gini_revenue_customers": """
        WITH a AS (
            SELECT o_custkey AS c,
                   SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS m
            FROM orders
            WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
            GROUP BY o_custkey
        ),
        r AS (SELECT m, ROW_NUMBER() OVER (ORDER BY m) AS i FROM a),
        g AS (SELECT COUNT(*) AS n, SUM(m) AS s, SUM(i * m) AS w FROM r)
        SELECT CAST(n AS BIGINT) AS n_customers,
               CAST(s AS BIGINT) AS total_cents,
               CAST(w AS BIGINT) AS weighted_rank_sum,
               ROUND((2 * w - (n + 1) * s) * 1.0 / (n * s), 6) AS gini
        FROM g WHERE n > 0
    """,
    "rfm_segments_customers": """
        WITH a AS (
            SELECT o_custkey AS c,
                   MAX(epoch_us(o_orderdate) // 86400000000) AS r,
                   COUNT(*) AS f,
                   SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS m
            FROM orders
            WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
              AND o_totalprice IS NOT NULL
            GROUP BY o_custkey
        ),
        q AS (
            SELECT quantile_disc(r, 0.25) AS r1, quantile_disc(r, 0.5) AS r2,
                   quantile_disc(r, 0.75) AS r3,
                   quantile_disc(f, 0.25) AS f1, quantile_disc(f, 0.5) AS f2,
                   quantile_disc(f, 0.75) AS f3,
                   quantile_disc(m, 0.25) AS m1, quantile_disc(m, 0.5) AS m2,
                   quantile_disc(m, 0.75) AS m3
            FROM a
        )
        SELECT CAST(1 + CAST(a.r > q.r1 AS INT) + CAST(a.r > q.r2 AS INT)
                      + CAST(a.r > q.r3 AS INT) AS BIGINT) AS r_q,
               CAST(1 + CAST(a.f > q.f1 AS INT) + CAST(a.f > q.f2 AS INT)
                      + CAST(a.f > q.f3 AS INT) AS BIGINT) AS f_q,
               CAST(1 + CAST(a.m > q.m1 AS INT) + CAST(a.m > q.m2 AS INT)
                      + CAST(a.m > q.m3 AS INT) AS BIGINT) AS m_q,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM a, q
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    "exact_quantile_extendedprice": """
        SELECT l_returnflag,
               ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS median_price
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "mad_extendedprice": """
        WITH m AS (
            SELECT l_returnflag,
                   ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS med
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l.l_returnflag,
               ROUND(quantile_cont(ABS(l.l_extendedprice - m.med), 0.5), 4)
                   AS mad_price,
               m.med AS median_price
        FROM lineitem l JOIN m USING (l_returnflag)
        GROUP BY l.l_returnflag, m.med ORDER BY l.l_returnflag
    """,
    "weighted_median_lineitem": """
        WITH w AS (
            SELECT l_extendedprice AS v, CAST(l_quantity AS BIGINT) AS q
            FROM lineitem
            WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
        ),
        o AS (
            SELECT v,
                   SUM(q) OVER (ORDER BY v
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cw,
                   SUM(q) OVER () AS tw
            FROM w
        )
        SELECT ROUND(MIN(v), 4) AS weighted_median
        FROM o WHERE 2 * cw >= tw
    """,
    "value_percentiles_events": """
        SELECT event_type,
               ROUND(quantile_cont(value, 0.1), 4) AS p10,
               ROUND(quantile_cont(value, 0.5), 4) AS p50,
               ROUND(quantile_cont(value, 0.9), 4) AS p90
        FROM events
        WHERE event_type IS NOT NULL AND value IS NOT NULL
        GROUP BY event_type ORDER BY event_type
    """,
    "percentile_disc_extendedprice": """
        SELECT l_returnflag,
               ROUND(quantile_disc(l_extendedprice, 0.9), 4) AS p90_price
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "ntile_revenue_orders": """
        WITH r AS (
            SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS c,
                   NTILE(4) OVER (ORDER BY ROUND(o_totalprice * 100, 0))
                       AS q
            FROM orders WHERE o_totalprice IS NOT NULL
        )
        SELECT CAST(q AS BIGINT) AS quartile,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c) AS BIGINT) AS sum_cents
        FROM r GROUP BY q ORDER BY q
    """,
    "revenue_concentration_customers": """
        WITH r AS (
            SELECT o_custkey,
                   SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                       AS cents
            FROM orders
            WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
            GROUP BY 1
        ),
        ranked AS (
            SELECT cents,
                   ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) AS rn,
                   COUNT(*) OVER () AS n
            FROM r
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
               CAST(CEIL(MAX(n) * 0.01) AS BIGINT) AS k,
               CAST(SUM(cents) FILTER (WHERE rn <= CEIL(n * 0.01))
                    AS BIGINT) AS top_cents,
               CAST(SUM(cents) AS BIGINT) AS total_cents,
               ROUND(SUM(cents) FILTER (WHERE rn <= CEIL(n * 0.01)) * 1.0
                     / SUM(cents), 4) AS top_share
        FROM ranked
    """,
}
