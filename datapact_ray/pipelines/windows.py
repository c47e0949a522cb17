"""Stream-shaped operators over the ``events`` log table.

Ray Data is a batch engine (the reference has no streaming operators
either — SURVEY.md §2.9); stream semantics are expressed as batch
pipelines over an ordered, partitioned log:

* **Tumbling window aggregate** — event-time windows are a pure
  projection (``window = floor(ts)``), so they ride a vectorized
  ``map_batches`` + one hash-aggregate shuffle. No watermarks needed for
  complete (closed) historical windows.
* **Session windows** (gap-based) — requires per-key ordering: partition
  by ``user_id`` (hash groupby), sort each group by ``ts``, and split
  sessions where the gap exceeds the threshold — vectorized inside each
  group via pandas ``diff``/``cumsum``. The ordering assumption is
  per-user within-group sort, not global order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..io import count_rows, read_table
from ._util import round_duck

_SPREAD = np.uint64(0x9E3779B97F4A7C15)  # Fibonacci multiplier: spreads
# sequential ids across buckets so modulo never aliases id patterns


def scaled_num_buckets(
    n_rows: int, target_rows: int = 4_000_000, hi: int = 4096
) -> int:
    """Partition count ∝ data size (same sizing rule AND constant as the
    keyed pass — runner.py target_rows_per_bucket; a 16x-smaller target
    here re-created the many-tiny-objects overhead the keyed pass
    measured at ~2.4 ms/object): one reduce wave per core on small data,
    growing so per-bucket frames stay ~target_rows — never a fixed
    fan-out."""
    import ray as _ray

    cpus = (
        int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    )
    return max(cpus, min(hi, n_rows // target_rows + 1))


def _bucket_of(ids: np.ndarray, num_buckets: int) -> np.ndarray:
    h = ids.astype(np.uint64) * _SPREAD
    return ((h >> np.uint64(32)) % np.uint64(num_buckets)).astype(np.int32)


def _ts_us_np(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Timestamp column → int64 epoch-µs numpy view (normalized to µs
    regardless of the file's ts resolution). Null-free input only —
    callers ``drop_null``/``filter`` first (the keyed fixed-width-only
    pattern: no pandas materialization on the map side)."""
    arr = pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def _int64_np(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if arr.null_count:
        # parity with the replaced pandas path, which raised
        # IntCastingNaNError here: a null in an integer column the
        # operator requires must fail LOUDLY — to_numpy would route
        # through float64 and silently turn nulls into INT64_MIN (and
        # shave low bits off ids above 2^53)
        raise ValueError(
            "null values in an integer column this operator requires; "
            "add the column to the operator's null-drop subset or clean "
            "the input"
        )
    return arr.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def _f64_np(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return arr.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)


def _valid_subset(batch: pa.Table, cols: list[str], subset: list[str]) -> pa.Table:
    """Arrow-native ``dropna(subset=...)``: project to ``cols``, drop
    rows with a null in any ``subset`` column (nulls elsewhere stay)."""
    t = batch.select(cols)
    mask = None
    for c in subset:
        v = pc.is_valid(t.column(c))
        mask = v if mask is None else pc.and_(mask, v)
    return t.filter(mask) if mask is not None else t


def _unique_pairs(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Distinct (a, b) pairs (vectorized ``drop_duplicates`` for the
    per-batch combiners; output order is sorted, downstream reduces
    treat the rows as a set)."""
    if len(a) == 0:
        return a, b
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
    return a[keep], b[keep]


_US_PER_DAY = np.int64(86_400_000_000)
_SLICE_MIX = np.int64(1_000_003)  # combines (key, time_slice) into one
# shuffle id; prime ≫ any realistic slice count so combos never collide


def _auto_slice_days(
    paths_cols: list[tuple[str, str]],
    n_rows: int,
    key_domain: int = 100,
    target_rows: int = 4_000_000,
) -> int | None:
    """Time-slice width (days) for the hot-key split of the as-of/range
    joins: one (key, slice) group should hold ~``target_rows`` rows, so
    a key holding 1% of a 100-TB table no longer has to fit one bucket.
    ``None`` (single slice, no split) when the expected per-key rows are
    already under target or footer time stats are unavailable."""
    import math

    from ..io import footer_column_minmax, list_parquet_files

    n_slices = math.ceil((n_rows / max(key_domain, 1)) / target_rows)
    if n_slices <= 1:
        return None
    los, his = [], []
    for path, col in paths_cols:
        mm = footer_column_minmax(list_parquet_files(path), col)
        if mm is None:
            return None
        los.append(np.datetime64(mm[0], "D").astype(np.int64))
        his.append(np.datetime64(mm[1], "D").astype(np.int64))
    span_days = int(max(his)) - int(min(los)) + 1
    return max(1, math.ceil(span_days / n_slices))


def windowed_events_daily(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-day event-time windows per event_type: count + sum.
    The window is a pure projection, so each scan task reduces straight
    to per-(day, type) fsum partials — the exchange (and the driver
    merge) is windows × types × tasks rows, never the log."""
    import math as _math

    from ..shuffle import map_partials

    def partial(batch: pa.Table) -> pd.DataFrame:
        day = pc.floor_temporal(batch.column("ts"), unit="day").cast(
            pa.timestamp("us")
        )
        df = pd.DataFrame(
            {
                "window_day": day.to_pandas(),
                "event_type": batch.column("event_type").to_pandas(),
                "value": batch.column("value").to_pandas(),
            }
        )
        rows = [
            (d, e, len(g), _math.fsum(g.dropna()))
            for (d, e), g in df.groupby(
                ["window_day", "event_type"], sort=False
            )["value"]
        ]
        return pd.DataFrame(rows, columns=["window_day", "event_type", "n", "s"])

    parts = map_partials(
        f"{sf_dir}/events.parquet", ["ts", "event_type", "value"], None, partial
    )
    rows = [
        (d, e, int(g["n"].sum()), float(round_duck(_math.fsum(g["s"]), 4)))
        for (d, e), g in parts.groupby(["window_day", "event_type"], sort=True)
    ]
    out = pd.DataFrame(
        rows, columns=["window_day", "event_type", "n_events", "sum_value"]
    ).astype({"n_events": "int64"})
    return out.reset_index(drop=True)


def sliding_events_weekly(sf_dir: str) -> pd.DataFrame:
    """Sliding event-time windows: 7-day windows stepping 1 day. Each
    event is expanded to its 7 containing window starts inside the batch
    transform (vectorized repeat), partial-aggregated per batch, then one
    small hash aggregate — the overlap factor multiplies only the compact
    (window, type) partials, never the raw rows. Summary output keeps the
    oracle small: number of windows + max single-window event count."""
    from ..shuffle import map_partials

    day_us = 86_400_000_000

    def expand(batch: pa.Table) -> pd.DataFrame:
        day = pc.floor_temporal(batch.column("ts"), unit="day").cast(pa.int64())
        days = day.to_numpy(zero_copy_only=False)
        etype = batch.column("event_type").to_pandas()
        offsets = np.arange(7) * day_us
        starts = np.repeat(days, 7) - np.tile(offsets, len(days))
        part = pd.DataFrame(
            {
                "window_start": starts,
                "event_type": np.repeat(etype.to_numpy(), 7),
            }
        )
        out = part.groupby(["window_start", "event_type"], sort=False).size()
        return out.rename("cnt").reset_index()

    totals = (
        map_partials(
            f"{sf_dir}/events.parquet", ["ts", "event_type"], None, expand
        )
        .groupby(["window_start", "event_type"], as_index=False)["cnt"]
        .sum()
    )
    if len(totals) == 0:  # SQL: COUNT 0 / MAX NULL / COUNT 0
        return pd.DataFrame(
            {
                "n_windows": pd.Series([0], dtype="int64"),
                "max_window_events": [None],
                "total_window_rows": pd.Series([0], dtype="int64"),
            }
        )
    return pd.DataFrame(
        {
            "n_windows": [int(totals["window_start"].nunique())],
            "max_window_events": [int(totals["cnt"].max())],
            "total_window_rows": [int(len(totals))],
        }
    )


def sessionize_events(
    sf_dir: str, gap_minutes: int = 30, num_buckets: int | None = None
) -> pd.DataFrame:
    """Gap-based session windows per user: a new session starts when the
    gap since the previous event exceeds ``gap_minutes``. Returns the
    session-count summary (total sessions, avg events/session).

    Partitioning: bucket = spread-hash(user_id) % B with B sized from the
    input row count (footer metadata) — per-bucket frames stay bounded at
    any scale; the per-bucket work is one vectorized sort + diff. The
    result is bucket-count-invariant (each user lands wholly in one
    bucket), which ``tests/test_windows_scaling.py`` asserts at two B.

    Arrow-native end to end (round-3 item #5): the map projector emits a
    fixed-width ``pa.Table`` straight from Arrow casts (no pandas
    round-trip per batch), and the bucket reduce is one ``np.lexsort`` +
    diff over the zero-copy column views. NULL user/ts rows drop in the
    scan task."""
    path = f"{sf_dir}/events.parquet"
    gap_us = gap_minutes * 60 * 1_000_000
    n_buckets = num_buckets or scaled_num_buckets(count_rows(path))

    def add_bucket(batch: pa.Table) -> pa.Table:
        t = batch.select(["user_id", "ts"]).drop_null()
        uid = _int64_np(t.column("user_id"))
        return pa.table(
            {
                "user_id": uid,
                "ts": _ts_us_np(t.column("ts")),
                "__bucket": _bucket_of(uid, n_buckets),
            }
        )

    def sessions_per_bucket(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame({"sessions": [0], "events": [0]}).astype("int64")
        uid, ts = _int64_np(t.column("user_id")), _int64_np(t.column("ts"))
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        starts = np.empty(len(uid), dtype=bool)
        starts[0] = True
        starts[1:] = (uid[1:] != uid[:-1]) | (np.diff(ts) > gap_us)
        return pd.DataFrame(
            {"sessions": [int(starts.sum())], "events": [len(uid)]}
        ).astype("int64")

    from .dedup import _fused_grouped_frames

    parts = _fused_grouped_frames(
        [(path, ["user_id", "ts"], None, add_bucket)],
        n_buckets,
        sessions_per_bucket,
        arrow_reduce=True,
    )
    total_sessions = int(parts["sessions"].sum())
    total_events = int(parts["events"].sum())
    return pd.DataFrame(
        {
            "total_sessions": [total_sessions],
            "total_events": [total_events],
            "avg_events_per_session": [
                float(round_duck(total_events / total_sessions, 4))
                if total_sessions
                else 0.0
            ],
        }
    )


def asof_value_per_order(
    sf_dir: str,
    num_buckets: int | None = None,
    slice_days: int | None = None,
) -> pd.DataFrame:
    """As-of join: for each order, the FIRST event at-or-after the order
    date whose (coarse) user key matches. Summary output: orders matched
    + rounded value sum.

    Partitioning is decoupled from the join key AND from the key's size:
    rows are bucketed by spread-hash(key, time_slice) % B, where the
    slice width comes from ``_auto_slice_days`` — a key holding 1% of
    the table splits across span/width buckets instead of having to fit
    one pandas frame. Each bucket runs ONE vectorized
    ``pd.merge_asof(..., by=["key","slice"])`` over the (key, slice)
    groups it holds; orders left unmatched inside their slice are
    stitched on the driver: every unresolved order of (key, s) matches
    the SAME event — the first event of the nearest later slice — so the
    stitch state is one fixed-width row per non-empty (key, slice), a
    summary-sized exchange, never the log. Events are pre-aggregated to
    MAX(value) per (key, t) inside the batch transform, so the shuffle
    ships at most one row per distinct (key, timestamp)."""
    o_path, e_path = f"{sf_dir}/orders.parquet", f"{sf_dir}/events.parquet"
    n_rows = count_rows(o_path) + count_rows(e_path)
    n_buckets = num_buckets or scaled_num_buckets(n_rows)
    if slice_days is None:
        slice_days = _auto_slice_days(
            [(o_path, "o_orderdate"), (e_path, "ts")], n_rows
        )
    sd = None if slice_days is None else np.int64(slice_days)

    def _slice_of(t: np.ndarray) -> np.ndarray:
        if sd is None:
            return np.zeros(len(t), dtype=np.int64)
        return (t // _US_PER_DAY) // sd

    def o_project(batch: pa.Table) -> pa.Table:
        key = _int64_np(batch.column("o_custkey")) % 100
        t = _ts_us_np(batch.column("o_orderdate"))
        sl = _slice_of(t)
        return pa.table(
            {
                "side": np.full(len(key), 0, dtype=np.int8),
                "key": key,
                "slice": sl,
                "t": t,
                "value": np.zeros(len(key)),
                "__bucket": _bucket_of(key * _SLICE_MIX + sl, n_buckets),
            }
        )

    def e_project(batch: pa.Table) -> pa.Table:
        key = _int64_np(batch.column("user_id")) % 100
        t = _ts_us_np(batch.column("ts"))
        value = _f64_np(batch.column("value"))
        # per-batch combiner: one row per distinct (key, t) enters the
        # shuffle (MAX keeps tie-breaking deterministic + oracle-matching;
        # NaN ordered first so the group max skips it like pandas did)
        if len(key):
            order = np.lexsort(
                (np.where(np.isnan(value), -np.inf, value), t, key)
            )
            key, t, value = key[order], t[order], value[order]
            last = np.r_[(key[1:] != key[:-1]) | (t[1:] != t[:-1]), True]
            key, t, value = key[last], t[last], value[last]
        sl = _slice_of(t)
        return pa.table(
            {
                "side": np.full(len(key), 1, dtype=np.int8),
                "key": key,
                "slice": sl,
                "t": t,
                "value": value,
                "__bucket": _bucket_of(key * _SLICE_MIX + sl, n_buckets),
            }
        )

    _empty = pd.DataFrame(
        {
            "key": pd.Series([], dtype="int64"),
            "slice": pd.Series([], dtype="int64"),
            "matched": pd.Series([], dtype="int64"),
            "sum_value": pd.Series([], dtype="float64"),
            "unresolved": pd.Series([], dtype="int64"),
            "first_v": pd.Series([], dtype="float64"),
        }
    )

    def asof_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0][["key", "slice", "t"]].sort_values(
            "t", kind="stable"
        )
        e = (
            g[g["side"] == 1]
            .groupby(["key", "slice", "t"], as_index=False)["value"]
            .max()
            .sort_values("t", kind="stable")
        )
        if len(o) == 0 and len(e) == 0:
            return _empty
        if len(o) and len(e):
            joined = pd.merge_asof(
                o, e, on="t", by=["key", "slice"], direction="forward"
            )
        else:
            joined = o.assign(value=np.nan)
        jj = pd.DataFrame(
            {
                "key": joined["key"],
                "slice": joined["slice"],
                "m": joined["value"].notna().astype(np.int64),
                "v": joined["value"].fillna(0.0),
            }
        )
        part_o = jj.groupby(["key", "slice"], as_index=False).agg(
            matched=("m", "sum"), sum_value=("v", "sum"), n=("m", "size")
        )
        part_o["unresolved"] = (part_o["n"] - part_o["matched"]).astype(
            np.int64
        )
        part_o = part_o.drop(columns=["n"])
        # first event per (key, slice): e is t-sorted, so first = min t —
        # the stitch target for earlier slices' unresolved orders
        fe = e.groupby(["key", "slice"], as_index=False).first()[
            ["key", "slice", "value"]
        ].rename(columns={"value": "first_v"})
        out = part_o.merge(fe, on=["key", "slice"], how="outer")
        for c, fill in (("matched", 0), ("sum_value", 0.0), ("unresolved", 0)):
            out[c] = out[c].fillna(fill)
        out["matched"] = out["matched"].astype(np.int64)
        out["unresolved"] = out["unresolved"].astype(np.int64)
        return out[
            ["key", "slice", "matched", "sum_value", "unresolved", "first_v"]
        ]

    from .dedup import _fused_grouped_frames

    parts = _fused_grouped_frames(
        [
            (o_path, ["o_custkey", "o_orderdate"], None, o_project),
            (e_path, ["user_id", "ts", "value"], None, e_project),
        ],
        n_buckets,
        asof_in_bucket,
    )
    if len(parts) == 0:
        return pd.DataFrame(
            {"matched_orders": [0], "sum_matched_value": [0.0]}
        )
    # stitch: in slice-descending order per key, the nearest later
    # slice's first event (ffill over slices with no events)
    g = parts.sort_values(
        ["key", "slice"], ascending=[True, False], kind="stable"
    ).reset_index(drop=True)
    nxt = g.groupby("key")["first_v"].shift(1)
    nxt = nxt.groupby(g["key"]).ffill()
    late_matched = (g["unresolved"] * nxt.notna().astype(np.int64)).sum()
    late_sum = (g["unresolved"] * nxt.fillna(0.0)).sum()
    return pd.DataFrame(
        {
            "matched_orders": [int(g["matched"].sum() + late_matched)],
            "sum_matched_value": [
                float(round_duck(g["sum_value"].sum() + late_sum, 2))
            ],
        }
    )


def range_join_orders_lineitem(
    sf_dir: str,
    window_days: int = 7,
    num_buckets: int | None = None,
    slice_days: int | None = None,
) -> pd.DataFrame:
    """Equi-key + time-range join: every (order, lineitem) pair where
    the lineitem's (coarse) supplier key matches the order's customer
    key AND the ship date falls inside ``[o_orderdate, o_orderdate +
    window_days)``. Summary output: pair count, orders with >=1 match,
    rounded extended-price sum.

    Partitioning: both sides bucket by spread-hash(key, time_slice) % B
    — the hot-key ceiling of a pure key-hash is removed by slicing the
    time axis (``_auto_slice_days``, clamped to >= window_days). Because
    a slice is at least one window wide, an order's window spans at most
    its own slice and the next, so each lineitem is shipped to its own
    slice plus (only when it sits in the first ``window_days`` of a
    slice) a halo copy to the previous slice — bounded <=2x duplication
    of the probe side, no driver stitching. Within a bucket, lineitems
    are sorted by ((key, slice), ship_ts) once and each (key, slice)'s
    orders resolve their window with two vectorized ``np.searchsorted``
    calls; pair counts are ``hi - lo`` and value sums come from a
    prefix-sum, so the (potentially quadratic) pair list is never
    materialized."""
    o_path, l_path = f"{sf_dir}/orders.parquet", f"{sf_dir}/lineitem.parquet"
    n_rows = count_rows(o_path) + count_rows(l_path)
    n_buckets = num_buckets or scaled_num_buckets(n_rows)
    if slice_days is None:
        slice_days = _auto_slice_days(
            [(o_path, "o_orderdate"), (l_path, "l_shipdate")], n_rows
        )
    if slice_days is not None and slice_days < window_days:
        slice_days = window_days  # halo must cover one previous slice only
    sd = None if slice_days is None else np.int64(slice_days)
    window_us = np.int64(window_days) * _US_PER_DAY

    def o_project(batch: pa.Table) -> pa.Table:
        key = _int64_np(batch.column("o_custkey")) % 100
        t = _ts_us_np(batch.column("o_orderdate"))
        if sd is None:
            sl = np.zeros(len(key), dtype=np.int64)
        else:
            sl = (t // _US_PER_DAY) // sd
        ck = key * _SLICE_MIX + sl
        return pa.table(
            {
                "side": np.full(len(key), 0, dtype=np.int8),
                "ck": ck,
                "t": t,
                "value": np.zeros(len(key)),
                "__bucket": _bucket_of(ck, n_buckets),
            }
        )

    def l_project(batch: pa.Table) -> pa.Table:
        key = _int64_np(batch.column("l_suppkey")) % 100
        t = _ts_us_np(batch.column("l_shipdate"))
        value = _f64_np(batch.column("l_extendedprice"))
        if sd is None:
            ck = key * _SLICE_MIX
        else:
            day = t // _US_PER_DAY
            sl = day // sd
            ck = key * _SLICE_MIX + sl
            halo = day % sd < np.int64(window_days)  # serves prev slice too
            ck = np.concatenate([ck, key[halo] * _SLICE_MIX + sl[halo] - 1])
            t = np.concatenate([t, t[halo]])
            value = np.concatenate([value, value[halo]])
        return pa.table(
            {
                "side": np.full(len(ck), 1, dtype=np.int8),
                "ck": ck,
                "t": t,
                "value": value,
                "__bucket": _bucket_of(ck, n_buckets),
            }
        )

    def range_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0]
        e = g[g["side"] == 1].sort_values(["ck", "t"], kind="stable")
        if len(o) == 0 or len(e) == 0:
            return pd.DataFrame(
                {"pairs": [0], "matched": [0], "sum_value": [0.0]}
            )
        e_ck = e["ck"].to_numpy()
        e_t = e["t"].to_numpy()
        csum = np.concatenate([[0.0], np.cumsum(e["value"].to_numpy())])
        pairs = 0
        matched = 0
        sum_value = 0.0
        for ck, og in o.groupby("ck", sort=False):
            k0, k1 = np.searchsorted(e_ck, [ck, ck + 1])
            if k0 == k1:
                continue
            start = og["t"].to_numpy()
            lo = k0 + np.searchsorted(e_t[k0:k1], start, side="left")
            hi = k0 + np.searchsorted(e_t[k0:k1], start + window_us, side="left")
            cnt = hi - lo
            pairs += int(cnt.sum())
            matched += int((cnt > 0).sum())
            sum_value += float((csum[hi] - csum[lo]).sum())
        return pd.DataFrame(
            {"pairs": [pairs], "matched": [matched], "sum_value": [sum_value]}
        )

    from .dedup import _fused_grouped_frames

    parts = _fused_grouped_frames(
        [
            (o_path, ["o_custkey", "o_orderdate"], None, o_project),
            (l_path, ["l_suppkey", "l_shipdate", "l_extendedprice"], None, l_project),
        ],
        n_buckets,
        range_in_bucket,
    )
    return pd.DataFrame(
        {
            "pair_count": [int(parts["pairs"].sum())],
            "orders_matched": [int(parts["matched"].sum())],
            "sum_value": [float(round_duck(parts["sum_value"].sum(), 2))],
        }
    )


def event_gaps_events(sf_dir: str, num_buckets: int | None = None) -> pd.DataFrame:
    """Inter-event gap statistics (the LAG window family): for every
    consecutive pair of events of the same user (ordered by ts,
    event_id), the time delta — aggregated to count / sum / max / mean.

    Partitioning mirrors sessionize: bucket = spread-hash(user_id) % B
    with B sized from the row count, one vectorized sort + diff per
    bucket, fixed-width integer partials (n, sum_µs, max_µs) into the
    merge. All gap math is integer microseconds, so the distributed
    result is bit-exact against the SQL window oracle. Rows with NULL
    user_id are excluded (the oracle filters them; SQL PARTITION BY
    would otherwise pool all NULLs into one pseudo-user)."""
    path = f"{sf_dir}/events.parquet"
    n_buckets = num_buckets or scaled_num_buckets(count_rows(path))

    def add_bucket(batch: pa.Table) -> pa.Table:
        # Arrow-native map side: fixed-width columns only, no pandas
        # round-trip (round-3 item #5)
        t = batch.select(["user_id", "ts", "event_id"]).drop_null()
        uid = _int64_np(t.column("user_id"))
        return pa.table(
            {
                "user_id": uid,
                # normalize to µs regardless of the file's ts resolution
                "ts": _ts_us_np(t.column("ts")),
                "event_id": _int64_np(t.column("event_id")),
                "__bucket": _bucket_of(uid, n_buckets),
            }
        )

    def gaps_per_bucket(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame({"n": [0], "s": [0], "mx": [0]}).astype("int64")
        uid = _int64_np(t.column("user_id"))
        ts = _int64_np(t.column("ts"))
        eid = _int64_np(t.column("event_id"))
        order = np.lexsort((eid, ts, uid))
        uid, ts = uid[order], ts[order]
        same_user = uid[1:] == uid[:-1]
        deltas = np.diff(ts)[same_user]
        if len(deltas) == 0:
            return pd.DataFrame({"n": [0], "s": [0], "mx": [0]}).astype("int64")
        return pd.DataFrame(
            {
                "n": [len(deltas)],
                "s": [int(deltas.sum())],
                "mx": [int(deltas.max())],
            }
        ).astype("int64")

    from .dedup import _fused_grouped_frames

    parts = _fused_grouped_frames(
        [(path, ["user_id", "ts", "event_id"], None, add_bucket)],
        n_buckets,
        gaps_per_bucket,
        arrow_reduce=True,
    )
    n = int(parts["n"].sum())
    s = int(parts["s"].sum())
    if n == 0:  # SQL aggregate-over-zero-rows: COUNT 0, SUM/MAX/AVG NULL
        return pd.DataFrame(
            {
                "n_gaps": pd.Series([0], dtype="int64"),
                "sum_gap_us": [None],
                "max_gap_us": [None],
                "avg_gap_seconds": [None],
            }
        )
    return pd.DataFrame(
        {
            "n_gaps": [n],
            "sum_gap_us": [s],
            "max_gap_us": [int(parts["mx"].max())],
            "avg_gap_seconds": [
                float(round_duck(float(s) / n / 1_000_000.0, 4))
            ],
        }
    ).astype({"n_gaps": "int64", "sum_gap_us": "int64", "max_gap_us": "int64"})


def cumsum_crossing_events(sf_dir: str, fraction: float = 0.5) -> pd.DataFrame:
    """Running-total threshold crossing: the first event (ordered by ts,
    event_id) at which the cumulative sum of ``value`` reaches
    ``fraction`` of the grand total — the "when did we hit half the
    quota" streaming question.

    Two phases, neither materializing the log: phase 1 reduces each
    batch to per-HOUR (sum, count, min) partials (one fsum row per hour
    per task); the driver prefix-scans the ≤ hours-in-history frame to
    locate the crossing hour. Phase 2 re-reads ONLY that hour via
    parquet predicate pushdown and resolves the exact row with one
    vectorized sort + cumsum. At larger scale the refinement key gets
    finer (minute) or recurses — the pattern is a distributed binary
    search over an ordered, pre-aggregated axis.

    PREMISE: ``value`` must be non-negative (running total monotone) —
    asserted from the phase-1 partials; a negative measure would need
    per-partition max-prefix tracking, which doesn't merge across
    unordered scan tasks. NULL ts rows are excluded (no position on the
    time axis); NULL values count as 0 (oracle COALESCEs)."""
    path = f"{sf_dir}/events.parquet"
    hour_us = 3_600_000_000

    def hour_partial(batch: pa.Table) -> pd.DataFrame:
        import math as _math

        t = _valid_subset(batch, ["ts", "value"], ["ts"])
        if t.num_rows == 0:
            return pd.DataFrame({"hour": [], "s": [], "mn": []})
        v = _f64_np(t.column("value"))
        v = np.where(np.isnan(v), 0.0, v)
        ts_us = _ts_us_np(t.column("ts"))
        hours = (ts_us // hour_us) * hour_us
        order = np.argsort(hours, kind="stable")
        hs, vs = hours[order], v[order]
        cut = np.flatnonzero(np.r_[True, hs[1:] != hs[:-1]])
        rows = [
            (
                int(hs[i]),
                _math.fsum(vs[i:j]),
                float(vs[i:j].min()),
            )
            for i, j in zip(cut, np.r_[cut[1:], len(hs)])
        ]
        return pd.DataFrame(rows, columns=["hour", "s", "mn"])

    from ..shuffle import map_partials

    parts = map_partials(path, ["ts", "value"], None, hour_partial)
    if len(parts) == 0:
        return pd.DataFrame(
            {"crossing_ts": [], "event_id": [], "running_value": [], "threshold": []}
        )
    if float(parts["mn"].min()) < 0.0:
        raise ValueError(
            "cumsum_crossing requires a non-negative measure "
            "(running total must be monotone)"
        )
    import math as _math

    by_hour = (
        parts.groupby("hour")["s"].apply(lambda g: _math.fsum(g)).sort_index()
    )
    total = _math.fsum(by_hour.to_numpy())
    thr = total * fraction
    prefix = np.cumsum(by_hour.to_numpy())
    idx = int(np.searchsorted(prefix, thr))
    hour_start = int(by_hour.index[idx])
    prefix_before = float(prefix[idx - 1]) if idx else 0.0

    t0 = pd.Timestamp(hour_start, unit="us").strftime("%Y-%m-%d %H:%M:%S")
    t1 = pd.Timestamp(hour_start + hour_us, unit="us").strftime("%Y-%m-%d %H:%M:%S")
    hot = map_partials(
        path,
        ["ts", "event_id", "value"],
        f"ts >= TIMESTAMP '{t0}' AND ts < TIMESTAMP '{t1}'",
        lambda t: t.to_pandas(),
    )
    hot = hot.dropna(subset=["ts"]).sort_values(
        ["ts", "event_id"], kind="stable"
    )
    running = prefix_before + np.cumsum(hot["value"].fillna(0.0).to_numpy())
    pos = int(np.searchsorted(running, thr))
    row = hot.iloc[pos]
    return pd.DataFrame(
        {
            "crossing_ts": [row["ts"]],
            "event_id": [np.int64(row["event_id"])],
            "running_value": [float(round_duck(float(running[pos]), 2))],
            # 3dp, not 2: the measure has 2-decimal values, so total*0.5
            # lands EXACTLY on a 2dp half-boundary whenever the total's
            # cent digit is odd — at 3dp the product is the value itself
            "threshold": [float(round_duck(thr, 3))],
        }
    )


def _funnel_projector(steps: tuple[str, ...], n_buckets: int):
    """Shared (user_id, ts→int64 µs, step-ordinal, __bucket) projector
    for the funnel ops. Drops NULL ts too: pandas silently casts NaT to
    int64 −2⁶³, which would poison a user's first-step MIN and convert
    every later event with a ~2⁶³ µs latency — SQL MIN ignores NULLs and
    ``ts > NULL`` is false, so the oracle never sees those rows."""
    def add_bucket(batch: pa.Table) -> pa.Table:
        t = _valid_subset(
            batch, ["user_id", "event_type", "ts"], ["user_id", "event_type", "ts"]
        )
        uid = _int64_np(t.column("user_id"))
        codes = pc.index_in(
            pc.cast(t.column("event_type"), pa.string()),
            value_set=pa.array(list(steps), type=pa.string()),
        )
        return pa.table(
            {
                "user_id": uid,
                "ts": _ts_us_np(t.column("ts")),
                "step": pc.fill_null(codes, -1).cast(pa.int8()),
                "__bucket": _bucket_of(uid, n_buckets),
            }
        )

    return add_bucket


def funnel_events(
    sf_dir: str,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """Ordered conversion funnel (sequential pattern matching per key):
    how many users did step 1, then step 2 STRICTLY AFTER their first
    step 1, then step 3 strictly after that — the product-analytics op
    that needs per-key event ORDER, not just counts.

    Users hash-bucket (whole user per bucket); within a bucket each
    funnel stage is one vectorized pass: sort the stage's events by
    (user, ts) once, take first-per-user (`groupby.first` on sorted
    frames), then an aligned merge against the previous stage's
    first-completion time filters `ts > prev`. No per-user Python loop;
    the exchange carries (user_id, ts, step-ordinal int8) rows only for
    events whose type is IN the funnel (filter pushed to the scan).
    Completion times are integer µs, so counts are bit-exact vs the SQL
    chained-MIN oracle."""
    path = f"{sf_dir}/events.parquet"
    quoted = ", ".join(f"'{s}'" for s in steps)
    n_buckets = num_buckets or scaled_num_buckets(count_rows(path))
    add_bucket = _funnel_projector(steps, n_buckets)

    def funnel_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # chained vectorized min+filter: step i's completion time is the
        # user's earliest step-i event STRICTLY AFTER their step-(i-1)
        # completion — one groupby-min (and one aligned merge) per stage
        counts = []
        prev: pd.Series | None = None
        for i in range(len(steps)):
            rows = g[g["step"] == i]
            if prev is None:
                done = rows.groupby("user_id")["ts"].min()
            else:
                prev_df = prev.rename("prev").reset_index()
                rows = rows.merge(prev_df, on="user_id")
                done = (
                    rows[rows["ts"] > rows["prev"]].groupby("user_id")["ts"].min()
                )
            counts.append(len(done))
            prev = done
        return pd.DataFrame({"step": np.arange(len(steps)), "users": counts})

    from .dedup import _fused_grouped_frames

    parts = (
        _fused_grouped_frames(
            [
                (
                    path,
                    ["user_id", "ts", "event_type"],
                    f"event_type IN ({quoted})",
                    add_bucket,
                )
            ],
            n_buckets,
            funnel_in_bucket,
        )
        .groupby("step")["users"]
        .sum()
    )
    return pd.DataFrame(
        {
            "step": list(steps),
            "users": [int(parts.get(i, 0)) for i in range(len(steps))],
        }
    ).astype({"users": "int64"})


def event_type_transitions_events(
    sf_dir: str, num_buckets: int | None = None
) -> pd.DataFrame:
    """Event-type transition matrix (the Markov/bigram view of an agent
    or user log: which action follows which — the sequence-level
    analog of the LAG gap statistics): for every consecutive pair of
    same-user events ordered by (ts, event_id), count (prev_type →
    type) pairs.

    Same partitioning as ``event_gaps_events``: bucket =
    spread-hash(user_id) % B, one vectorized sort + shift per bucket,
    and each bucket reduces to ≤ |types|² fixed-width count rows — the
    transition matrix is vocabulary-sized, so the driver merge is
    bounded regardless of data volume. Rows with NULL user_id or NULL
    event_type are excluded in both engines (pandas groupby drops NaN
    groups where SQL GROUP BY would keep them; the shared WHERE keeps
    the two aligned, and a NULL-typed event would otherwise split a
    real transition pair)."""
    from .dedup import _fused_grouped_frames

    path = f"{sf_dir}/events.parquet"
    n_buckets = num_buckets or scaled_num_buckets(count_rows(path))

    def add_bucket(batch: pa.Table) -> pd.DataFrame:
        t = _valid_subset(
            batch,
            ["user_id", "ts", "event_id", "event_type"],
            ["user_id", "event_type"],
        )
        uid = _int64_np(t.column("user_id"))
        return pa.table(
            {
                "user_id": uid,
                "ts": _ts_us_np(t.column("ts")),
                "event_id": _int64_np(t.column("event_id")),
                "event_type": pc.cast(t.column("event_type"), pa.string()),
                "__bucket": _bucket_of(uid, n_buckets),
            }
        )

    def transitions_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        u = g["user_id"].to_numpy()
        t = g["event_type"].to_numpy()
        same = u[1:] == u[:-1]
        if not same.any():
            return pd.DataFrame({"prev_type": [], "event_type": [], "n_pairs": []})
        pairs = pd.DataFrame({"prev_type": t[:-1][same], "event_type": t[1:][same]})
        out = pairs.groupby(["prev_type", "event_type"], as_index=False).size()
        return out.rename(columns={"size": "n_pairs"})

    parts = _fused_grouped_frames(
        [(path, ["user_id", "ts", "event_id", "event_type"], None, add_bucket)],
        n_buckets,
        transitions_per_bucket,
    )
    if not len(parts):
        return pd.DataFrame(
            {
                "prev_type": [],
                "event_type": [],
                "n_pairs": pd.Series([], dtype="int64"),
            }
        )
    out = (
        parts.groupby(["prev_type", "event_type"], as_index=False)["n_pairs"]
        .sum()
        .sort_values(["prev_type", "event_type"])
        .reset_index(drop=True)
    )
    out["n_pairs"] = out["n_pairs"].astype("int64")
    return out


def rolling_avg_events(
    sf_dir: str, frame: int = 4, num_buckets: int | None = None
) -> pd.DataFrame:
    """ROWS-frame moving average (the AVG OVER ... ROWS BETWEEN 3
    PRECEDING AND CURRENT ROW window): per user, events ordered by
    (ts, event_id), the mean of the last ``frame`` values — aggregated
    per event_type to count / max / sum of the rolling averages.

    Exactness: values are 2-decimal doubles, so each row's measure is
    first fixed to integer cents (ROUND(v*100) — never on a .5 boundary)
    and the frame sum is an exact integer cumsum difference; the rolling
    average is then built with the IDENTICAL floating-point expression
    tree as the oracle (``(s * 1.0 / c) / 100``), so both engines
    produce bit-equal doubles per row and the per-type totals reduce
    with fsum on both sides. Partitioning mirrors event_gaps: bucket =
    spread-hash(user_id) % B, one vectorized sort + cumsum per bucket,
    per-type fixed-width partials only. Rows with NULL user_id / ts /
    event_type are excluded on both sides; NULL values COALESCE to 0
    (dropping them would shift every later frame in the partition)."""
    import math as _math

    from .dedup import _fused_grouped_frames

    path = f"{sf_dir}/events.parquet"
    n_buckets = num_buckets or scaled_num_buckets(count_rows(path))

    def add_bucket(batch: pa.Table) -> pd.DataFrame:
        t = _valid_subset(
            batch,
            ["user_id", "ts", "event_id", "event_type", "value"],
            ["user_id", "ts", "event_type"],
        )
        uid = _int64_np(t.column("user_id"))
        v = _f64_np(t.column("value"))
        return pa.table(
            {
                "user_id": uid,
                "ts": _ts_us_np(t.column("ts")),
                "event_id": _int64_np(t.column("event_id")),
                "event_type": pc.cast(t.column("event_type"), pa.string()),
                "cents": np.round(
                    np.where(np.isnan(v), 0.0, v) * 100.0
                ).astype(np.int64),
                "__bucket": _bucket_of(uid, n_buckets),
            }
        )

    def rolling_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        n = len(g)
        if n == 0:
            return pd.DataFrame({"event_type": [], "n": [], "fs": [], "mx": []})
        u = g["user_id"].to_numpy()
        cents = g["cents"].to_numpy(np.int64)
        new = np.r_[True, u[1:] != u[:-1]]
        start = np.maximum.accumulate(np.where(new, np.arange(n), -1))
        c = np.minimum(np.arange(n) - start + 1, frame)
        cs = np.r_[np.int64(0), np.cumsum(cents)]
        idx = np.arange(n) + 1
        s = cs[idx] - cs[idx - c]
        # identical FP expression tree as the oracle: ((s*1.0)/c)/100
        r = (s * 1.0 / c) / 100.0
        part = pd.DataFrame({"event_type": g["event_type"].to_numpy(), "r": r})
        rows = [
            (t, len(rg), _math.fsum(rg), float(rg.max()))
            for t, rg in part.groupby("event_type", sort=False)["r"]
        ]
        return pd.DataFrame(rows, columns=["event_type", "n", "fs", "mx"])

    parts = _fused_grouped_frames(
        [
            (
                path,
                ["user_id", "ts", "event_id", "event_type", "value"],
                None,
                add_bucket,
            )
        ],
        n_buckets,
        rolling_per_bucket,
    )
    rows = [
        (
            t,
            int(g["n"].sum()),
            float(round_duck(float(g["mx"].max()), 4)),
            float(round_duck(_math.fsum(g["fs"]), 4)),
        )
        for t, g in parts.groupby("event_type", sort=True)
    ]
    return pd.DataFrame(
        rows,
        columns=["event_type", "n_rows", "max_rolling_avg", "sum_rolling_avg"],
    ).astype({"n_rows": "int64"})


_DAY_US = 86_400_000_000
_WEEK_US = 7 * _DAY_US


def _week_start_us(ts_us: np.ndarray) -> np.ndarray:
    """Monday-start week truncation in integer µs (DuckDB
    ``date_trunc('week', ...)``): 1970-01-01 is a Thursday, so weekday
    index (Monday=0) of day d is (d + 3) % 7."""
    day = ts_us // _DAY_US
    return (day - (day + 3) % 7) * _DAY_US


def retention_cohorts_events(
    sf_dir: str, num_buckets: int | None = None
) -> pd.DataFrame:
    """Weekly retention matrix (the cohort-analysis op): cohort week =
    the user's first-seen week; for every (cohort week, week offset)
    cell, the number of distinct users active that many weeks after
    their first week.

    Users hash-bucket whole (the cohort assignment and the distinct-week
    set are per-user), so each bucket reduces independently to
    ≤ weeks × offsets fixed-width count rows — the matrix is
    calendar-bounded, never data-bounded, and the driver merge is a
    small groupby-sum. Week truncation is integer-µs arithmetic matching
    DuckDB's Monday-start date_trunc exactly; offsets divide exactly
    because both endpoints are week-truncated. NULL user_id / ts rows
    are excluded on both sides."""
    from .dedup import _fused_grouped_frames

    path = f"{sf_dir}/events.parquet"
    n_buckets = num_buckets or scaled_num_buckets(count_rows(path))

    def add_bucket(batch: pa.Table) -> pd.DataFrame:
        t = _valid_subset(batch, ["user_id", "ts"], ["user_id", "ts"])
        uid = _int64_np(t.column("user_id"))
        return pa.table(
            {
                "user_id": uid,
                "wk": _week_start_us(_ts_us_np(t.column("ts"))),
                "__bucket": _bucket_of(uid, n_buckets),
            }
        )

    def cohorts_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"cw": [], "week_offset": [], "n": []})
        act = g.drop_duplicates(["user_id", "wk"])[["user_id", "wk"]]
        first = act.groupby("user_id", as_index=False)["wk"].min()
        act = act.merge(first.rename(columns={"wk": "cw"}), on="user_id")
        act["week_offset"] = (act["wk"] - act["cw"]) // _WEEK_US
        out = act.groupby(["cw", "week_offset"], as_index=False).size()
        return out.rename(columns={"size": "n"})

    parts = _fused_grouped_frames(
        [(path, ["user_id", "ts"], None, add_bucket)],
        n_buckets,
        cohorts_per_bucket,
    )
    if len(parts) == 0:
        return pd.DataFrame(
            {
                "cohort_week": pd.Series([], dtype="datetime64[us]"),
                "week_offset": pd.Series([], dtype="int64"),
                "n_users": pd.Series([], dtype="int64"),
            }
        )
    out = (
        parts.groupby(["cw", "week_offset"], as_index=False)["n"]
        .sum()
        .sort_values(["cw", "week_offset"])
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "cohort_week": pd.to_datetime(out["cw"], unit="us").astype(
                "datetime64[us]"
            ),
            "week_offset": out["week_offset"].astype("int64"),
            "n_users": out["n"].astype("int64"),
        }
    )


def churn_weekly_events(
    sf_dir: str, num_buckets: int | None = None
) -> pd.DataFrame:
    """Weekly churn (the complement of retention, as a per-week
    transition table): of the users active in week w, how many were
    also active in week w+1 (retained) vs not (churned). The last
    active week naturally retains 0 — there is no w+1 data — matching
    the SQL self-left-join.

    Same partitioning as the retention matrix: users bucket whole, each
    bucket computes its distinct (user, week) incidence and marks
    retention with ONE vectorized self-merge on (user, week+1) — no
    per-user loop — then reduces to ≤ weeks fixed-width count rows."""
    from .dedup import _fused_grouped_frames

    path = f"{sf_dir}/events.parquet"
    n_buckets = num_buckets or scaled_num_buckets(count_rows(path))

    def add_bucket(batch: pa.Table) -> pd.DataFrame:
        t = _valid_subset(batch, ["user_id", "ts"], ["user_id", "ts"])
        uid = _int64_np(t.column("user_id"))
        return pa.table(
            {
                "user_id": uid,
                "wk": _week_start_us(_ts_us_np(t.column("ts"))),
                "__bucket": _bucket_of(uid, n_buckets),
            }
        )

    def churn_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"wk": [], "n_active": [], "n_retained": []})
        act = g.drop_duplicates(["user_id", "wk"])[["user_id", "wk"]]
        nxt = act.assign(wk=act["wk"] - _WEEK_US)
        retained = act.merge(nxt, on=["user_id", "wk"])
        a = act.groupby("wk").size().rename("n_active")
        r = retained.groupby("wk").size().rename("n_retained")
        return (
            pd.concat([a, r], axis=1).fillna(0).astype("int64").reset_index()
        )

    parts = _fused_grouped_frames(
        [(path, ["user_id", "ts"], None, add_bucket)],
        n_buckets,
        churn_per_bucket,
    )
    if len(parts) == 0:
        return pd.DataFrame(
            {
                "week": pd.Series([], dtype="datetime64[us]"),
                "n_active": pd.Series([], dtype="int64"),
                "n_retained": pd.Series([], dtype="int64"),
                "n_churned": pd.Series([], dtype="int64"),
            }
        )
    out = (
        parts.groupby("wk", as_index=False)[["n_active", "n_retained"]]
        .sum()
        .sort_values("wk")
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "week": pd.to_datetime(out["wk"], unit="us").astype("datetime64[us]"),
            "n_active": out["n_active"].astype("int64"),
            "n_retained": out["n_retained"].astype("int64"),
            "n_churned": (out["n_active"] - out["n_retained"]).astype("int64"),
        }
    )


def late_events_events(
    sf_dir: str, num_buckets: int | None = None
) -> pd.DataFrame:
    """Out-of-order arrival audit (the watermark-planning op a streaming
    ingest needs): in ARRIVAL order (event_id), how many events carry a
    timestamp EARLIER than the running maximum already seen for that
    user — i.e. arrived late — and how late (max / total lateness).

    Same user-bucket machinery as the LAG family: one vectorized sort +
    ``np.maximum.accumulate`` per bucket, integer-µs lateness partials,
    bit-exact vs the running-MAX window oracle (MAX OVER ... ROWS
    UNBOUNDED PRECEDING TO 1 PRECEDING). NULL user_id / ts rows are
    excluded on both sides."""
    from .dedup import _fused_grouped_frames

    path = f"{sf_dir}/events.parquet"
    n_buckets = num_buckets or scaled_num_buckets(count_rows(path))

    def add_bucket(batch: pa.Table) -> pd.DataFrame:
        t = _valid_subset(
            batch, ["user_id", "ts", "event_id"], ["user_id", "ts"]
        )
        uid = _int64_np(t.column("user_id"))
        return pa.table(
            {
                "user_id": uid,
                "ts": _ts_us_np(t.column("ts")),
                "event_id": _int64_np(t.column("event_id")),
                "__bucket": _bucket_of(uid, n_buckets),
            }
        )

    def late_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"n": [0], "n_late": [0], "s": [0], "mx": [0]}
            ).astype("int64")
        g = g.sort_values(["user_id", "event_id"], kind="stable")
        u = g["user_id"].to_numpy()
        t = g["ts"].to_numpy()
        new = np.r_[True, u[1:] != u[:-1]]
        seg_start = np.maximum.accumulate(np.where(new, np.arange(len(u)), -1))
        # per-user running max (segments can't bleed: grouped cummax)
        runmax = pd.Series(t).groupby(pd.Series(seg_start)).cummax().to_numpy()
        prev_max = np.r_[np.int64(0), runmax[:-1]]
        late = (~new) & (t < prev_max)
        lateness = np.where(late, prev_max - t, 0)
        return pd.DataFrame(
            {
                "n": [int(len(g))],
                "n_late": [int(late.sum())],
                "s": [int(lateness.sum())],
                "mx": [int(lateness.max()) if len(g) else 0],
            }
        ).astype("int64")

    parts = _fused_grouped_frames(
        [(path, ["user_id", "ts", "event_id"], None, add_bucket)],
        n_buckets,
        late_per_bucket,
    )
    n = int(parts["n"].sum())
    n_late = int(parts["n_late"].sum())
    return pd.DataFrame(
        {
            "n_events": [n],
            "n_late": [n_late],
            "late_rate": [float(round_duck(n_late * 1.0 / n, 4)) if n else None],
            "sum_lateness_us": [int(parts["s"].sum())],
            "max_lateness_us": [int(parts["mx"].max()) if n else 0],
        }
    ).astype(
        {
            "n_events": "int64",
            "n_late": "int64",
            "sum_lateness_us": "int64",
            "max_lateness_us": "int64",
        }
    )


def peak_window_events(
    sf_dir: str, window_minutes: int = 5, num_buckets: int | None = None
) -> pd.DataFrame:
    """Global sliding-window peak (burst detection / capacity sizing):
    the maximum number of events inside ANY ``[t − 5 min, t]`` window
    anchored at an event — the RANGE-frame COUNT window, which needs the
    GLOBAL time axis, not a per-user partition.

    Partitioning pattern: TIME-RANGE partitioning with a boundary HALO —
    events bucket by hour; events in the last ``window`` of each hour
    are REPLICATED into the next hour's bucket (flagged halo, excluded
    as anchors), so every anchor sees its full lookback without any
    cross-bucket coordination. Per bucket one sort + two vectorized
    ``searchsorted`` sweeps; the exchange carries (ts, halo flag) only,
    inflated by ≤ window/hour (~8%). Exact integer µs; the RANGE frame's
    tie semantics (peers included) fall out of the left/right
    searchsorted sides. NULL ts rows are excluded on both sides."""
    from ..shuffle import map_partials
    from .dedup import _fused_grouped_frames

    path = f"{sf_dir}/events.parquet"
    hour_us = 3_600_000_000
    win_us = np.int64(window_minutes) * 60_000_000
    n_rows = count_rows(path)
    n_buckets = num_buckets or scaled_num_buckets(n_rows)

    def add_bucket(batch: pa.Table) -> pd.DataFrame:
        tbl = _valid_subset(batch, ["ts"], ["ts"])
        t = _ts_us_np(tbl.column("ts"))
        hour = t // hour_us
        tail = t % hour_us >= hour_us - win_us
        ts_all = np.concatenate([t, t[tail]])
        halo = np.concatenate(
            [np.zeros(len(t), dtype=np.int8), np.ones(int(tail.sum()), dtype=np.int8)]
        )
        hours = np.concatenate([hour, hour[tail] + 1])
        return pa.table(
            {
                "ts": ts_all,
                "halo": halo,
                "hour": hours,
                "__bucket": _bucket_of(hours, n_buckets),
            }
        )

    def peak_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        best = 0
        for _, hg in g.groupby("hour", sort=False):
            t = np.sort(hg["ts"].to_numpy())
            anchors = np.sort(hg.loc[hg["halo"] == 0, "ts"].to_numpy())
            if len(anchors) == 0:
                continue
            lo = np.searchsorted(t, anchors - win_us, side="left")
            hi = np.searchsorted(t, anchors, side="right")
            best = max(best, int((hi - lo).max()))
        return pd.DataFrame({"peak": [best]}).astype("int64")

    parts = _fused_grouped_frames(
        [(path, ["ts"], None, add_bucket)], n_buckets, peak_per_bucket
    )
    return pd.DataFrame(
        {"peak_window_events": [int(parts["peak"].max()) if len(parts) else 0]}
    ).astype("int64")


def burst_users_events(
    sf_dir: str,
    window_hours: int = 24,
    k: int = 3,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """Per-user burst detection (the abuse / bot heuristic): a user's
    burst score is the maximum number of their events inside any
    ``[t − window, t]`` window anchored at one of their events; report
    users at or over ``k``. The per-KEY RANGE-frame counterpart of the
    global ``peak_window_events`` — because the window is per user and
    users bucket whole, NO halo is needed. Per bucket the loop is over
    DISTINCT users (the range-join precedent), two vectorized
    ``searchsorted`` sweeps per user slice; integer-µs exact."""
    from .dedup import _fused_grouped_frames

    path = f"{sf_dir}/events.parquet"
    win_us = np.int64(window_hours) * 3_600_000_000
    n_buckets = num_buckets or scaled_num_buckets(count_rows(path))

    def add_bucket(batch: pa.Table) -> pd.DataFrame:
        t = _valid_subset(batch, ["user_id", "ts"], ["user_id", "ts"])
        uid = _int64_np(t.column("user_id"))
        return pa.table(
            {
                "user_id": uid,
                "ts": _ts_us_np(t.column("ts")),
                "__bucket": _bucket_of(uid, n_buckets),
            }
        )

    def bursts_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"n_users": [0], "n_bursty": [0], "mx": [0]}
            ).astype("int64")
        g = g.sort_values(["user_id", "ts"], kind="stable")
        u = g["user_id"].to_numpy()
        t = g["ts"].to_numpy()
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], len(u)]
        n_users = len(starts)
        n_bursty = 0
        mx = 0
        for s, e in zip(starts, ends):
            seg = t[s:e]
            lo = np.searchsorted(seg, seg - win_us, side="left")
            hi = np.searchsorted(seg, seg, side="right")
            burst = int((hi - lo).max())
            mx = max(mx, burst)
            if burst >= k:
                n_bursty += 1
        return pd.DataFrame(
            {"n_users": [n_users], "n_bursty": [n_bursty], "mx": [mx]}
        ).astype("int64")

    parts = _fused_grouped_frames(
        [(path, ["user_id", "ts"], None, add_bucket)],
        n_buckets,
        bursts_per_bucket,
    )
    return pd.DataFrame(
        {
            "n_users": [int(parts["n_users"].sum())],
            "n_bursty_users": [int(parts["n_bursty"].sum())],
            "max_burst": [int(parts["mx"].max()) if len(parts) else 0],
        }
    ).astype("int64")


def conversion_delay_events(
    sf_dir: str,
    first: str = "view",
    then: str = "purchase",
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """Time-to-conversion statistics — the latency view of the funnel
    (the funnel counts WHO converted; this measures HOW LONG it took):
    for every user, the delay from their first ``view`` to their first
    STRICTLY LATER ``purchase``, aggregated to count / sum / max / mean.
    Same user-bucket machinery as the funnel, one vectorized
    groupby-min + aligned merge per bucket; delays are integer µs so
    the result is bit-exact vs the chained-MIN SQL oracle. The type
    filter pushes to the scan — only funnel-step rows enter the
    exchange."""
    from .dedup import _fused_grouped_frames

    path = f"{sf_dir}/events.parquet"
    n_buckets = num_buckets or scaled_num_buckets(count_rows(path))

    def add_bucket(batch: pa.Table) -> pd.DataFrame:
        t = _valid_subset(
            batch, ["user_id", "ts", "event_type"], ["user_id", "ts", "event_type"]
        )
        uid = _int64_np(t.column("user_id"))
        return pa.table(
            {
                "user_id": uid,
                "ts": _ts_us_np(t.column("ts")),
                "is_first": pc.equal(
                    pc.cast(t.column("event_type"), pa.string()), first
                ),
                "__bucket": _bucket_of(uid, n_buckets),
            }
        )

    def delays_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        v = (
            g[g["is_first"]]
            .groupby("user_id", as_index=False)["ts"]
            .min()
            .rename(columns={"ts": "t0"})
        )
        p = g[~g["is_first"]].merge(v, on="user_id")
        p = p[p["ts"] > p["t0"]]
        t1 = p.groupby("user_id", as_index=False)["ts"].min().rename(
            columns={"ts": "t1"}
        )
        d = t1.merge(v, on="user_id")
        delays = (d["t1"] - d["t0"]).to_numpy(np.int64)
        if len(delays) == 0:
            return pd.DataFrame({"n": [0], "s": [0], "mx": [0]}).astype("int64")
        return pd.DataFrame(
            {
                "n": [len(delays)],
                "s": [int(delays.sum())],
                "mx": [int(delays.max())],
            }
        ).astype("int64")

    parts = _fused_grouped_frames(
        [
            (
                path,
                ["user_id", "ts", "event_type"],
                f"event_type IN ('{first}', '{then}')",
                add_bucket,
            )
        ],
        n_buckets,
        delays_per_bucket,
    )
    n = int(parts["n"].sum())
    s = int(parts["s"].sum())
    if n == 0:
        # SQL aggregate-over-zero-rows semantics: COUNT 0, SUM/MAX NULL
        return pd.DataFrame(
            {
                "n_converted": pd.Series([0], dtype="int64"),
                "sum_delay_us": [None],
                "max_delay_us": [None],
                "avg_delay_seconds": [None],
            }
        )
    return pd.DataFrame(
        {
            "n_converted": [n],
            "sum_delay_us": [s],
            "max_delay_us": [int(parts["mx"].max())],
            "avg_delay_seconds": [
                float(round_duck(s * 1.0 / n / 1_000_000.0, 4))
            ],
        }
    ).astype(
        {"n_converted": "int64", "sum_delay_us": "int64", "max_delay_us": "int64"}
    )


def order_gaps_orders(
    sf_dir: str, num_buckets: int | None = None
) -> pd.DataFrame:
    """Inter-purchase intervals — the repeat-customer cadence metric
    (how many days between a customer's consecutive orders): the LAG
    gap machinery applied to the order book. Customers bucket whole,
    one vectorized sort + diff per bucket, integer-DAY deltas (order
    dates are day-resolution) so the stats are bit-exact vs the SQL
    window oracle. NULL custkey/date rows drop on both sides."""
    from .dedup import _fused_grouped_frames

    path = f"{sf_dir}/orders.parquet"
    n_buckets = num_buckets or scaled_num_buckets(count_rows(path))

    def add_bucket(batch: pa.Table) -> pd.DataFrame:
        t = _valid_subset(
            batch,
            ["o_custkey", "o_orderdate", "o_orderkey"],
            ["o_custkey", "o_orderdate"],
        )
        c = _int64_np(t.column("o_custkey"))
        return pa.table(
            {
                "c": c,
                "d": _ts_us_np(t.column("o_orderdate")) // _DAY_US,
                "k": _int64_np(t.column("o_orderkey")),
                "__bucket": _bucket_of(c, n_buckets),
            }
        )

    def gaps_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"n": [0], "s": [0], "mx": [0]}).astype("int64")
        g = g.sort_values(["c", "d", "k"], kind="stable")
        same = g["c"].to_numpy()[1:] == g["c"].to_numpy()[:-1]
        deltas = np.diff(g["d"].to_numpy())[same]
        if len(deltas) == 0:
            return pd.DataFrame({"n": [0], "s": [0], "mx": [0]}).astype("int64")
        return pd.DataFrame(
            {"n": [len(deltas)], "s": [int(deltas.sum())], "mx": [int(deltas.max())]}
        ).astype("int64")

    parts = _fused_grouped_frames(
        [
            (
                path,
                ["o_custkey", "o_orderdate", "o_orderkey"],
                None,
                add_bucket,
            )
        ],
        n_buckets,
        gaps_per_bucket,
    )
    n = int(parts["n"].sum())
    s = int(parts["s"].sum())
    if n == 0:
        return pd.DataFrame(
            {
                "n_gaps": pd.Series([0], dtype="int64"),
                "sum_gap_days": [None],
                "max_gap_days": [None],
                "avg_gap_days": [None],
            }
        )
    return pd.DataFrame(
        {
            "n_gaps": [n],
            "sum_gap_days": [s],
            "max_gap_days": [int(parts["mx"].max())],
            "avg_gap_days": [float(round_duck(s * 1.0 / n, 4))],
        }
    ).astype(
        {"n_gaps": "int64", "sum_gap_days": "int64", "max_gap_days": "int64"}
    )


def dau_series_events(
    sf_dir: str, num_buckets: int | None = None
) -> pd.DataFrame:
    """Plain DAU series — exact distinct users per calendar day (the
    non-sliding base of the WAU op): (user, day) incidence dedups per
    batch, buckets by USER hash (same pair → same bucket, so per-bucket
    distincts add), each bucket reduces to ≤ days count rows."""
    from .dedup import _fused_grouped_frames

    path = f"{sf_dir}/events.parquet"
    n_buckets = num_buckets or scaled_num_buckets(count_rows(path))

    def add_bucket(batch: pa.Table) -> pd.DataFrame:
        t = _valid_subset(batch, ["user_id", "ts"], ["user_id", "ts"])
        uid, day = _unique_pairs(
            _int64_np(t.column("user_id")),
            (_ts_us_np(t.column("ts")) // _DAY_US) * _DAY_US,
        )
        return pa.table(
            {
                "user_id": uid,
                "day": day,
                "__bucket": _bucket_of(uid, n_buckets),
            }
        )

    def dau_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.drop_duplicates(["user_id", "day"])
            .groupby("day", as_index=False)
            .size()
        )
        return out.rename(columns={"size": "n"})

    parts = _fused_grouped_frames(
        [(path, ["user_id", "ts"], None, add_bucket)],
        n_buckets,
        dau_per_bucket,
    )
    out = (
        parts.groupby("day", as_index=False)["n"]
        .sum()
        .sort_values("day")
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "day": pd.to_datetime(out["day"], unit="us").astype(
                "datetime64[us]"
            ),
            "dau": out["n"].astype("int64"),
        }
    )


def rolling_wau_events(
    sf_dir: str, window_days: int = 7, num_buckets: int | None = None
) -> pd.DataFrame:
    """Rolling weekly-active-users (the DAU/WAU product metric): for
    every active day w, the number of DISTINCT users active in
    ``[w − 6d, w]`` — a sliding-window COUNT DISTINCT, which no plain
    aggregate expresses.

    Shape: each scan task dedups its batch to (user, day) incidence and
    expands each pair to its ≤ 7 member windows (the overlap factor
    multiplies the COMPRESSED incidence, never raw rows); pairs bucket
    by USER hash so (window, user) dedup is globally correct per
    bucket, and each bucket reduces to ≤ days count rows. The driver
    drops windows that aren't active days themselves (oracle anchors
    windows at observed days). NULL user/ts rows drop on both sides."""
    from .dedup import _fused_grouped_frames

    path = f"{sf_dir}/events.parquet"
    n_buckets = num_buckets or scaled_num_buckets(count_rows(path))

    def add_bucket(batch: pa.Table) -> pa.Table:
        # Arrow-native map side (round-3 item #5): dedup to (user, day)
        # incidence via lexsort + neighbor-diff on zero-copy int64 views
        t = batch.select(["user_id", "ts"]).drop_null()
        uid = _int64_np(t.column("user_id"))
        day = (_ts_us_np(t.column("ts")) // _DAY_US) * _DAY_US
        if len(uid):
            order = np.lexsort((day, uid))
            uid, day = uid[order], day[order]
            keep = np.empty(len(uid), dtype=bool)
            keep[0] = True
            keep[1:] = (uid[1:] != uid[:-1]) | (day[1:] != day[:-1])
            uid, day = uid[keep], day[keep]
        k = window_days
        user_rep = np.repeat(uid, k)
        wday = np.repeat(day, k) + np.tile(
            np.arange(k, dtype=np.int64) * _DAY_US, len(uid)
        )
        # real activity day rides along so the driver can keep only
        # windows anchored at observed days
        is_anchor = np.tile(
            np.r_[np.int8(1), np.zeros(k - 1, dtype=np.int8)], len(uid)
        )
        return pa.table(
            {
                "user_id": user_rep,
                "wday": wday,
                "is_anchor": is_anchor,
                "__bucket": _bucket_of(user_rep, n_buckets),
            }
        )

    def wau_per_bucket(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame(
                {
                    "wday": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                    "anchored": pd.Series([], dtype="int8"),
                }
            )
        uid = _int64_np(t.column("user_id"))
        wday = _int64_np(t.column("wday"))
        anc = t.column("is_anchor").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((wday, uid))
        u, w = uid[order], wday[order]
        keep = np.empty(len(u), dtype=bool)
        keep[0] = True
        keep[1:] = (u[1:] != u[:-1]) | (w[1:] != w[:-1])
        days, counts = np.unique(w[keep], return_counts=True)
        anchored_days = np.unique(wday[anc == 1])
        return pd.DataFrame(
            {
                "wday": days,
                "n": counts.astype("int64"),
                "anchored": np.isin(days, anchored_days).astype("int8"),
            }
        )

    parts = _fused_grouped_frames(
        [(path, ["user_id", "ts"], None, add_bucket)],
        n_buckets,
        wau_per_bucket,
        arrow_reduce=True,
    )
    observed = set(parts.loc[parts["anchored"] == 1, "wday"])
    out = (
        parts[parts["wday"].isin(observed)]
        .groupby("wday", as_index=False)["n"]
        .sum()
        .sort_values("wday")
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "window_day": pd.to_datetime(out["wday"], unit="us").astype(
                "datetime64[us]"
            ),
            "wau": out["n"].astype("int64"),
        }
    )


def streaks_events(
    sf_dir: str, num_buckets: int | None = None
) -> pd.DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands window idiom (SQL: day − ROW_NUMBER() island key)
    as a distributed reduce. Each scan task dedups its batch to
    (user, day) incidence; users bucket whole by hash, so one
    vectorized sort + run-length pass per bucket finds every island
    exactly (islands never span buckets). Buckets emit 4-cell integer
    partials (n_users, sum of per-user max streaks, global max,
    count of users with a streak ≥ 3) — the exchange is O(buckets),
    never the log. NULL user/ts rows drop on both sides; zero rows
    give the SQL aggregate-over-zero-rows shape (COUNTs 0, MAX/AVG
    NULL)."""
    from .dedup import _fused_grouped_frames

    path = f"{sf_dir}/events.parquet"
    n_buckets = num_buckets or scaled_num_buckets(count_rows(path))

    def add_bucket(batch: pa.Table) -> pd.DataFrame:
        t = _valid_subset(batch, ["user_id", "ts"], ["user_id", "ts"])
        uid, day = _unique_pairs(
            _int64_np(t.column("user_id")),
            _ts_us_np(t.column("ts")) // _DAY_US,
        )
        return pa.table(
            {
                "user_id": uid,
                "day": day,
                "__bucket": _bucket_of(uid, n_buckets),
            }
        )

    def streaks_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {"n_users": [0], "sum_max": [0], "mx": [0], "n_ge3": [0]}
        ).astype("int64")
        if len(g) == 0:
            return zero
        g = g.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"], kind="stable"
        )
        u = g["user_id"].to_numpy()
        d = g["day"].to_numpy()
        # island starts: user changes OR the day gap is not exactly 1
        new_isl = np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1] + 1)]
        sizes = np.diff(np.r_[np.flatnonzero(new_isl), len(g)])
        ms = (
            pd.Series(sizes, index=pd.Index(u[new_isl], name="u"))
            .groupby(level=0)
            .max()
        )
        return pd.DataFrame(
            {
                "n_users": [len(ms)],
                "sum_max": [int(ms.sum())],
                "mx": [int(ms.max())],
                "n_ge3": [int((ms >= 3).sum())],
            }
        ).astype("int64")

    parts = _fused_grouped_frames(
        [(path, ["user_id", "ts"], None, add_bucket)],
        n_buckets,
        streaks_per_bucket,
    )
    n = int(parts["n_users"].sum())
    if n == 0:
        return pd.DataFrame(
            {
                "n_users": pd.Series([0], dtype="int64"),
                "max_streak": [None],
                "sum_max_streak": [None],
                "n_users_streak_ge_3": pd.Series([0], dtype="int64"),
                "avg_max_streak": [None],
            }
        )
    s = int(parts["sum_max"].sum())
    return pd.DataFrame(
        {
            "n_users": [n],
            # empty buckets report mx=0; real streaks are >= 1, so the
            # global max never comes from an empty partial when n > 0
            "max_streak": [int(parts["mx"].max())],
            "sum_max_streak": [s],
            "n_users_streak_ge_3": [int(parts["n_ge3"].sum())],
            "avg_max_streak": [float(round_duck(s * 1.0 / n, 4))],
        }
    ).astype(
        {
            "n_users": "int64",
            "max_streak": "int64",
            "sum_max_streak": "int64",
            "n_users_streak_ge_3": "int64",
        }
    )


def cumulative_users_events(
    sf_dir: str, num_buckets: int | None = None
) -> pd.DataFrame:
    """Cumulative distinct users by day — the audience-growth curve
    (for each active day, how many users have EVER been seen by then).
    A naive windowed COUNT(DISTINCT) re-scans history per day; here
    each user contributes exactly once, at their FIRST day: buckets
    (user-hash, so min-day is exact per bucket) emit per-day
    first-seen counts plus the observed-day markers, and the driver's
    prefix sum over ≤ days rows turns new-user counts into the
    cumulative curve. NULL user/ts rows drop on both sides."""
    from .dedup import _fused_grouped_frames

    path = f"{sf_dir}/events.parquet"
    n_buckets = num_buckets or scaled_num_buckets(count_rows(path))

    def add_bucket(batch: pa.Table) -> pd.DataFrame:
        t = _valid_subset(batch, ["user_id", "ts"], ["user_id", "ts"])
        uid, day = _unique_pairs(
            _int64_np(t.column("user_id")),
            (_ts_us_np(t.column("ts")) // _DAY_US) * _DAY_US,
        )
        return pa.table(
            {
                "user_id": uid,
                "day": day,
                "__bucket": _bucket_of(uid, n_buckets),
            }
        )

    def first_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        dd = g.drop_duplicates(["user_id", "day"])
        first = dd.groupby("user_id")["day"].min()
        nf = first.value_counts()
        out = pd.DataFrame({"day": pd.unique(dd["day"])})
        out["n_first"] = (
            out["day"].map(nf).fillna(0).astype("int64")
        )
        return out

    parts = _fused_grouped_frames(
        [(path, ["user_id", "ts"], None, add_bucket)],
        n_buckets,
        first_per_bucket,
    )
    out = (
        parts.groupby("day", as_index=False)["n_first"]
        .sum()
        .sort_values("day")
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "day": pd.to_datetime(out["day"], unit="us").astype(
                "datetime64[us]"
            ),
            "cum_users": out["n_first"].cumsum().astype("int64"),
        }
    )


def journey_paths_events(
    sf_dir: str, num_buckets: int | None = None, k: int = 10
) -> pd.DataFrame:
    """Top-k user-journey prefixes — the funnel-discovery view of the
    log: each user's FIRST three event types (ordered by ts, event_id)
    joined into a path string, counted across users. Users bucket
    whole, one vectorized sort + rank pass per bucket finds each
    user's first 3 rows, and the path assembles via a rank PIVOT and C
    string concatenation (never a per-row join loop). The exchange and
    the driver merge are path-vocabulary-bounded (≤ |types|³ + |types|²
    + |types| rows per bucket); top-k ties pin on (count DESC, path
    ASC) identically on both engines."""
    from .dedup import _fused_grouped_frames

    path = f"{sf_dir}/events.parquet"
    n_buckets = num_buckets or scaled_num_buckets(count_rows(path))

    def add_bucket(batch: pa.Table) -> pd.DataFrame:
        tbl = _valid_subset(
            batch,
            ["user_id", "ts", "event_id", "event_type"],
            ["user_id", "ts", "event_type"],
        )
        u = _int64_np(tbl.column("user_id"))
        return pa.table(
            {
                "u": u,
                "ts": _ts_us_np(tbl.column("ts")),
                "eid": _int64_np(tbl.column("event_id")),
                "t": pc.cast(tbl.column("event_type"), pa.string()),
                "__bucket": _bucket_of(u, n_buckets),
            }
        )

    def paths_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"path": [], "n": []}).astype(
                {"path": "object", "n": "int64"}
            )
        g = g.sort_values(["u", "ts", "eid"], kind="stable")
        u = g["u"].to_numpy()
        starts = np.r_[True, u[1:] != u[:-1]]
        # rank within user: position minus the user's start offset
        idx = np.arange(len(g))
        rank = idx - idx[starts][np.cumsum(starts) - 1]
        head = g[rank < 3].copy()
        head["r"] = rank[rank < 3]
        piv = head.pivot(index="u", columns="r", values="t")
        p = piv[0].astype(object)
        for col in (1, 2):
            if col in piv.columns:
                p = p + (">" + piv[col]).fillna("")
        vc = p.value_counts()
        return pd.DataFrame(
            {
                "path": vc.index.to_numpy(),
                "n": vc.to_numpy().astype("int64"),
            }
        )

    parts = _fused_grouped_frames(
        [
            (
                path,
                ["user_id", "ts", "event_id", "event_type"],
                None,
                add_bucket,
            )
        ],
        n_buckets,
        paths_per_bucket,
    )
    out = (
        parts.groupby("path", as_index=False)["n"]
        .sum()
        .sort_values(["n", "path"], ascending=[False, True], kind="stable")
        .head(k)
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {"path": out["path"], "n_users": out["n"].astype("int64")}
    )


def new_vs_returning_orders(
    sf_dir: str, num_buckets: int | None = None
) -> pd.DataFrame:
    """New-vs-returning customer split per month (the commerce growth
    decomposition): a customer is NEW in the month of their first
    order, RETURNING in any later active month. Customers bucket whole
    (first-month and incidence are per-customer), months truncate via
    datetime64[M] (exactly date_trunc('month')); each bucket reduces to
    ≤ months (active, new) count rows."""
    from .dedup import _fused_grouped_frames

    path = f"{sf_dir}/orders.parquet"
    n_buckets = num_buckets or scaled_num_buckets(count_rows(path))

    def add_bucket(batch: pa.Table) -> pd.DataFrame:
        t = _valid_subset(
            batch, ["o_custkey", "o_orderdate"], ["o_custkey", "o_orderdate"]
        )
        month = (
            _ts_us_np(t.column("o_orderdate"))
            .astype("datetime64[us]")
            .astype("datetime64[M]")
            .astype("datetime64[us]")
            .astype("int64")
        )
        c, m = _unique_pairs(_int64_np(t.column("o_custkey")), month)
        return pa.table(
            {"c": c, "m": m, "__bucket": _bucket_of(c, n_buckets)}
        )

    def split_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        a = g.drop_duplicates(["c", "m"])[["c", "m"]]
        first = a.groupby("c", as_index=False)["m"].min().rename(columns={"m": "fm"})
        a = a.merge(first, on="c")
        act = a.groupby("m", as_index=False).size().rename(
            columns={"size": "n_active"}
        )
        new = (
            a[a["m"] == a["fm"]]
            .groupby("m", as_index=False)
            .size()
            .rename(columns={"size": "n_new"})
        )
        out = act.merge(new, on="m", how="left")
        out["n_new"] = out["n_new"].fillna(0).astype("int64")
        return out

    parts = _fused_grouped_frames(
        [(path, ["o_custkey", "o_orderdate"], None, add_bucket)],
        n_buckets,
        split_per_bucket,
    )
    out = (
        parts.groupby("m", as_index=False)[["n_active", "n_new"]]
        .sum()
        .sort_values("m")
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "month": pd.to_datetime(out["m"], unit="us").astype("datetime64[us]"),
            "n_active": out["n_active"].astype("int64"),
            "n_new": out["n_new"].astype("int64"),
            "n_returning": (out["n_active"] - out["n_new"]).astype("int64"),
        }
    )


def traffic_heatmap_events(sf_dir: str) -> pd.DataFrame:
    """Seasonality heatmap (day-of-week × hour-of-day event counts) —
    the capacity-planning / anomaly-baseline view of the log. The cell
    is a pure projection (integer µs arithmetic reproducing DuckDB's
    EXTRACT: dow Sunday=0 via (day+4) % 7, hour via (µs // 3600e6) %
    24), so each scan task reduces to ≤ 168 fixed-width count rows and
    the driver merge is calendar-bounded. NULL ts rows are excluded on
    both sides."""
    from ..shuffle import map_partials

    def partial(batch: pa.Table) -> pd.DataFrame:
        ts_us = _ts_us_np(_valid_subset(batch, ["ts"], ["ts"]).column("ts"))
        day = ts_us // _DAY_US
        cell = ((day + 4) % 7) * 24 + (ts_us // 3_600_000_000) % 24
        cnt = np.bincount(cell, minlength=168)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame(
            {
                "dow": (nz // 24).astype("int64"),
                "hour": (nz % 24).astype("int64"),
                "n": cnt[nz].astype("int64"),
            }
        )

    parts = map_partials(f"{sf_dir}/events.parquet", ["ts"], None, partial)
    out = (
        parts.groupby(["dow", "hour"], as_index=False)["n"]
        .sum()
        .sort_values(["dow", "hour"])
        .reset_index(drop=True)
        .rename(columns={"n": "n_events"})
    )
    out["n_events"] = out["n_events"].astype("int64")
    return out


def monthly_growth_orders(sf_dir: str) -> pd.DataFrame:
    """Month-over-month revenue growth — the LAG-over-aggregated-series
    op: monthly revenue in exact integer cents (per-batch partials, the
    exchange is months × tasks rows), growth = (cur − prev) / prev
    computed from the SAME exact integers on both engines (first month
    NULL). Month truncation is numpy's datetime64[M] cast, which matches
    date_trunc('month') exactly."""
    from ..shuffle import map_partials
    from ._util import round_duck as _rd

    def partial(batch: pa.Table) -> pd.DataFrame:
        t = _valid_subset(
            batch,
            ["o_orderdate", "o_totalprice"],
            ["o_orderdate", "o_totalprice"],
        )
        month = (
            _ts_us_np(t.column("o_orderdate"))
            .astype("datetime64[us]")
            .astype("datetime64[M]")
            .astype("datetime64[us]")
            .astype("int64")
        )
        cents = _rd(
            _f64_np(t.column("o_totalprice")) * 100.0, 0
        ).astype(np.int64)
        part = pd.DataFrame({"m": month, "c": cents})
        return part.groupby("m", as_index=False)["c"].sum()

    parts = map_partials(
        f"{sf_dir}/orders.parquet", ["o_orderdate", "o_totalprice"], None, partial
    )
    by_m = parts.groupby("m")["c"].apply(lambda g: sum(int(x) for x in g))
    by_m = by_m.sort_index()
    if len(by_m) == 0:
        return pd.DataFrame(
            {
                "month": pd.Series([], dtype="datetime64[us]"),
                "rev_cents": pd.Series([], dtype="int64"),
                "growth_pct": pd.Series([], dtype="float64"),
            }
        )
    cents = by_m.to_numpy(dtype=object)
    growth = [None] + [
        float(_rd((int(c) - int(p)) * 1.0 / int(p), 4))
        for p, c in zip(cents[:-1], cents[1:])
    ]
    return pd.DataFrame(
        {
            "month": pd.to_datetime(by_m.index, unit="us").astype(
                "datetime64[us]"
            ),
            "rev_cents": [int(x) for x in cents],
            "growth_pct": growth,
        }
    ).astype({"rev_cents": "int64"})


def max_drawdown_daily_revenue(sf_dir: str) -> pd.DataFrame:
    """Maximum drawdown of the daily revenue series — the running-MAX
    differential window (finance's peak-to-trough decline, and the
    monitoring question "how far below its best level did the metric
    fall"): dd_t = cummax(v)_t − v_t maximized over days. Daily revenue
    is exact integer cents (calendar-bounded partials, months × tasks
    exchange shape); the driver scans the ≤ days series with Python
    ints, so the argmax (ties → earliest trough day) and the peak-day
    lookup (earliest day whose revenue equals the trough's running max)
    never race float accumulation; drawdown_pct is ONE exact-int ratio.
    A non-decreasing series reports dd = 0 at the first day on both
    engines (dd ties resolve to the earliest day)."""
    from ..shuffle import map_partials
    from ._util import round_duck as _rd

    def partial(batch: pa.Table) -> pd.DataFrame:
        t = _valid_subset(
            batch,
            ["o_orderdate", "o_totalprice"],
            ["o_orderdate", "o_totalprice"],
        )
        day = _ts_us_np(t.column("o_orderdate"))
        day = (day // _DAY_US) * _DAY_US
        cents = _rd(
            _f64_np(t.column("o_totalprice")) * 100.0, 0
        ).astype(np.int64)
        part = pd.DataFrame({"d": day, "c": cents})
        return part.groupby("d", as_index=False)["c"].sum()

    parts = map_partials(
        f"{sf_dir}/orders.parquet",
        ["o_orderdate", "o_totalprice"],
        None,
        partial,
    )
    if len(parts) == 0:
        return pd.DataFrame(
            {
                "n_days": pd.Series([], dtype="int64"),
                "peak_day": pd.Series([], dtype="datetime64[us]"),
                "trough_day": pd.Series([], dtype="datetime64[us]"),
                "peak_cents": pd.Series([], dtype="int64"),
                "drawdown_cents": pd.Series([], dtype="int64"),
                "drawdown_pct": pd.Series([], dtype="float64"),
            }
        )
    by_day = parts.groupby("d")["c"].apply(lambda g: sum(int(x) for x in g))
    by_day = by_day.sort_index()
    days = by_day.index.to_numpy(np.int64)
    v = [int(x) for x in by_day.to_numpy(dtype=object)]
    cm = 0
    best = None  # (dd, trough_us, cm_at_trough)
    for i, x in enumerate(v):
        cm = x if i == 0 else max(cm, x)
        dd = cm - x
        if best is None or dd > best[0]:
            best = (dd, int(days[i]), cm)
    dd, trough_us, peak_cents = best
    # earliest day whose revenue EQUALS the trough's running max
    peak_us = next(
        int(d) for d, x in zip(days, v) if x == peak_cents
    )
    return pd.DataFrame(
        {
            "n_days": pd.Series([len(v)], dtype="int64"),
            "peak_day": pd.Series([peak_us], dtype="int64").astype(
                "datetime64[us]"
            ),
            "trough_day": pd.Series([trough_us], dtype="int64").astype(
                "datetime64[us]"
            ),
            "peak_cents": pd.Series([peak_cents], dtype="int64"),
            "drawdown_cents": pd.Series([dd], dtype="int64"),
            "drawdown_pct": [
                float(_rd(float(dd) / float(peak_cents), 6))
                if peak_cents > 0
                else None
            ],
        }
    )


def session_duration_stats_events(
    sf_dir: str, gap_minutes: int = 30, num_buckets: int | None = None
) -> pd.DataFrame:
    """Session DURATION statistics — validates the session ASSIGNMENT
    itself, not just the session count (``sessionize_events``): per
    gap-based session, last-event minus first-event time, aggregated to
    count / sum / max / mean. All duration math is integer µs, so the
    distributed result is bit-exact vs the SQL nested-window oracle
    (LAG → running SUM OVER → per-session MAX−MIN). Single-event
    sessions contribute duration 0. Same user-bucket partitioning as
    sessionize; session ids come from one vectorized cumsum per bucket.
    NULL user_id / ts rows are excluded on both sides (sessionize keeps
    them — its oracle pools NULL users; a duration needs a real key)."""
    from .dedup import _fused_grouped_frames

    path = f"{sf_dir}/events.parquet"
    gap_us = gap_minutes * 60 * 1_000_000
    n_buckets = num_buckets or scaled_num_buckets(count_rows(path))

    def add_bucket(batch: pa.Table) -> pd.DataFrame:
        t = _valid_subset(batch, ["user_id", "ts"], ["user_id", "ts"])
        uid = _int64_np(t.column("user_id"))
        return pa.table(
            {
                "user_id": uid,
                "ts": _ts_us_np(t.column("ts")),
                "__bucket": _bucket_of(uid, n_buckets),
            }
        )

    def durations_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        if len(g) == 0:
            return pd.DataFrame({"n": [0], "s": [0], "mx": [0]}).astype("int64")
        u = g["user_id"].to_numpy()
        t = g["ts"].to_numpy()
        new_user = np.r_[True, u[1:] != u[:-1]]
        gap = np.r_[False, np.diff(t) > gap_us]
        sid = np.cumsum(new_user | gap)  # session id, monotone over sort
        # per-session duration = max(t) - min(t); t is sorted within a
        # session, so first/last positions suffice
        cut = np.flatnonzero(np.r_[True, sid[1:] != sid[:-1]])
        ends = np.r_[cut[1:], len(sid)] - 1
        dur = t[ends] - t[cut]
        return pd.DataFrame(
            {"n": [len(dur)], "s": [int(dur.sum())], "mx": [int(dur.max())]}
        ).astype("int64")

    parts = _fused_grouped_frames(
        [(path, ["user_id", "ts"], None, add_bucket)],
        n_buckets,
        durations_per_bucket,
    )
    n = int(parts["n"].sum())
    s = int(parts["s"].sum())
    return pd.DataFrame(
        {
            "n_sessions": [n],
            "sum_duration_us": [s],
            "max_duration_us": [int(parts["mx"].max()) if n else 0],
            "avg_duration_seconds": [
                float(round_duck(s * 1.0 / n / 1_000_000.0, 4)) if n else None
            ],
        }
    ).astype(
        {"n_sessions": "int64", "sum_duration_us": "int64", "max_duration_us": "int64"}
    )


def time_weighted_value_events(
    sf_dir: str, num_buckets: int | None = None
) -> pd.DataFrame:
    """Time-weighted average value per event type — the telemetry /
    sensor-fusion aggregate where a reading counts for how LONG it held,
    not how often it was sampled: each event's value is weighted by the
    seconds until the same user's next event (the LEAD window), grouped
    by the type of the interval-opening event.

    Exactness: value fixes to integer cents, the gap to integer seconds
    (both via arithmetic both engines do identically), so every
    cents·seconds product is an exact int64 (≤ ~2.3e11) and per-bucket
    partial sums stay exact int64; the driver merges partials with
    Python arbitrary-precision ints (mirroring SQL's HUGEINT sum) and
    the final average converts the SAME exact integers to doubles on
    both sides. Partitioning mirrors event_gaps: users bucket whole,
    one vectorized sort + diff per bucket, per-type fixed-width
    partials. NULL user_id / ts rows are excluded BEFORE the window
    (both sides); a NULL interval-opening type drops the interval after
    the window; NULL values COALESCE to 0."""
    from .dedup import _fused_grouped_frames

    path = f"{sf_dir}/events.parquet"
    n_buckets = num_buckets or scaled_num_buckets(count_rows(path))

    def add_bucket(batch: pa.Table) -> pd.DataFrame:
        t = _valid_subset(
            batch,
            ["user_id", "ts", "event_id", "event_type", "value"],
            ["user_id", "ts"],
        )
        uid = _int64_np(t.column("user_id"))
        v = _f64_np(t.column("value"))
        return pa.table(
            {
                "user_id": uid,
                "ts": _ts_us_np(t.column("ts")),
                "event_id": _int64_np(t.column("event_id")),
                # nulls survive the exchange (COALESCE happens downstream)
                "event_type": pc.cast(t.column("event_type"), pa.string()),
                "cents": np.round(
                    np.where(np.isnan(v), 0.0, v) * 100.0
                ).astype(np.int64),
                "__bucket": _bucket_of(uid, n_buckets),
            }
        )

    def twa_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        u = g["user_id"].to_numpy()
        same = u[1:] == u[:-1]
        if not same.any():
            return pd.DataFrame({"event_type": [], "n": [], "w": [], "ws": []})
        gap_s = (np.diff(g["ts"].to_numpy()) // 1_000_000)[same]
        part = pd.DataFrame(
            {
                "event_type": g["event_type"].to_numpy()[:-1][same],
                "w": gap_s,
                "ws": g["cents"].to_numpy()[:-1][same] * gap_s,
            }
        ).dropna(subset=["event_type"])
        out = part.groupby("event_type", as_index=False).agg(
            n=("w", "size"), w=("w", "sum"), ws=("ws", "sum")
        )
        return out

    parts = _fused_grouped_frames(
        [
            (
                path,
                ["user_id", "ts", "event_id", "event_type", "value"],
                None,
                add_bucket,
            )
        ],
        n_buckets,
        twa_per_bucket,
    )
    rows = []
    for t, g in parts.groupby("event_type", sort=True):
        n = int(g["n"].sum())
        # Python ints: per-bucket partials are exact int64, but the
        # cross-bucket total can exceed 2^63 (SQL sums into HUGEINT)
        w = sum(int(x) for x in g["w"])
        ws = sum(int(x) for x in g["ws"])
        rows.append(
            (
                t,
                n,
                w,
                float(round_duck((float(ws) / float(w)) / 100.0, 4))
                if w
                else None,
            )
        )
    return pd.DataFrame(
        rows, columns=["event_type", "n_intervals", "sum_weight_s", "twa_value"]
    ).astype({"n_intervals": "int64", "sum_weight_s": "int64"})


def missing_hours_events(sf_dir: str) -> pd.DataFrame:
    """Calendar gap-fill / completeness check (the generate_series
    anti-join): which hours between the log's first and last active hour
    saw ZERO events — the op that catches a dead ingestion pipeline that
    row counts alone can't (a missing hour leaves no row to count).

    Each scan task reduces its batch to the DISTINCT hour set (bounded
    by hours-in-history, ~9k/year — calendar-bounded, not data-bounded);
    the driver unions them and diffs against the dense spine with one
    vectorized pass. NULL ts rows have no position on the time axis and
    are excluded on both sides."""
    from ..shuffle import map_partials

    hour_us = 3_600_000_000
    path = f"{sf_dir}/events.parquet"

    def hour_set(batch: pa.Table) -> pd.DataFrame:
        ts_us = _ts_us_np(_valid_subset(batch, ["ts"], ["ts"]).column("ts"))
        return pd.DataFrame({"h": np.unique((ts_us // hour_us) * hour_us)})

    parts = map_partials(path, ["ts"], None, hour_set)
    hs = np.unique(parts["h"].to_numpy(np.int64)) if len(parts) else np.array([])
    if len(hs) == 0:
        return pd.DataFrame(
            {
                "n_hours_span": pd.Series([], dtype="int64"),
                "n_active_hours": pd.Series([], dtype="int64"),
                "n_missing_hours": pd.Series([], dtype="int64"),
                "first_missing_hour": pd.Series([], dtype="datetime64[us]"),
            }
        )
    span = int((hs[-1] - hs[0]) // hour_us) + 1
    active = int(len(hs))
    gaps = np.flatnonzero(np.diff(hs) > hour_us)
    first_missing = (
        pd.Timestamp(int(hs[gaps[0]] + hour_us), unit="us")
        if len(gaps)
        else pd.NaT
    )
    return pd.DataFrame(
        {
            "n_hours_span": pd.Series([span], dtype="int64"),
            "n_active_hours": pd.Series([active], dtype="int64"),
            "n_missing_hours": pd.Series([span - active], dtype="int64"),
            "first_missing_hour": pd.Series(
                [first_missing], dtype="datetime64[us]"
            ),
        }
    )


def funnel_latency_events(
    sf_dir: str,
    first: str = "view",
    then: str = "click",
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """Conversion LATENCY — time from a user's first ``first`` event to
    their first ``then`` event strictly after it: the funnel op above
    says how many users convert; this says how long conversion takes
    (the SLA/abandonment metric product analytics pairs with every
    funnel). One row: step-1 users, converted users, mean/min/max
    latency in seconds.

    Same shape as ``funnel_events``: users hash-bucket whole, the
    exchange carries (user_id, ts, step) rows only for the two event
    types (filter pushed to the scan), and each bucket folds to FIVE
    integers — n_step1, n_converted, Σlatency_µs, min_µs, max_µs — so
    the driver merge is exact integer arithmetic regardless of user
    count. The mean divides once at the end with the oracle's exact
    expression tree (CAST(SUM AS DOUBLE)/COUNT/1e6); per-bucket Σµs is
    int64 (overflow bound ~9.2e18 µs·users ≈ 292k user-years per
    bucket; the driver merge is Python big-int)."""
    path = f"{sf_dir}/events.parquet"
    n_buckets = num_buckets or scaled_num_buckets(count_rows(path))
    add_bucket = _funnel_projector((first, then), n_buckets)

    def latency_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        t0 = g[g["step"] == 0].groupby("user_id")["ts"].min()
        rows = g[g["step"] == 1].merge(
            t0.rename("t0").reset_index(), on="user_id"
        )
        t1 = rows[rows["ts"] > rows["t0"]].groupby("user_id")["ts"].min()
        lat = (t1 - t0.reindex(t1.index)).to_numpy(np.int64)
        return pd.DataFrame(
            {
                "n1": [len(t0)],
                "nc": [len(t1)],
                "s": [int(lat.sum()) if len(lat) else 0],
                "mn": [int(lat.min()) if len(lat) else 0],
                "mx": [int(lat.max()) if len(lat) else 0],
                "has": [len(lat) > 0],
            }
        )

    from ._util import round_duck
    from .dedup import _fused_grouped_frames

    quoted = ", ".join(f"'{s}'" for s in (first, then))
    parts = _fused_grouped_frames(
        [
            (
                path,
                ["user_id", "ts", "event_type"],
                f"event_type IN ({quoted})",
                add_bucket,
            )
        ],
        n_buckets,
        latency_in_bucket,
    )
    if not len(parts):
        parts = pd.DataFrame(
            {"n1": [0], "nc": [0], "s": [0], "mn": [0], "mx": [0], "has": [False]}
        )
    n1 = int(parts["n1"].sum())
    nc = int(parts["nc"].sum())
    live = parts[parts["has"]]
    total_us = sum(int(v) for v in live["s"])  # Python big-int merge
    return pd.DataFrame(
        {
            "n_step1": pd.Series([n1], dtype="int64"),
            "n_converted": pd.Series([nc], dtype="int64"),
            "mean_latency_sec": [
                float(round_duck(float(total_us) / float(nc) / 1e6, 6))
                if nc
                else None
            ],
            "min_latency_sec": [
                float(round_duck(float(live["mn"].min()) / 1e6, 6)) if nc else None
            ],
            "max_latency_sec": [
                float(round_duck(float(live["mx"].max()) / 1e6, 6)) if nc else None
            ],
        }
    )


def _funnel_latency_sql(first: str = "view", then: str = "click") -> str:
    return f"""
        WITH s0 AS (
            SELECT user_id, MIN(ts) AS t0 FROM events
            WHERE event_type = '{first}' AND user_id IS NOT NULL
              AND ts IS NOT NULL
            GROUP BY user_id
        ),
        s1 AS (
            SELECT e.user_id, MIN(epoch_us(e.ts)) AS t1,
                   MIN(epoch_us(s0.t0)) AS t0
            FROM events e JOIN s0 USING (user_id)
            WHERE e.event_type = '{then}' AND e.ts > s0.t0
            GROUP BY e.user_id
        )
        SELECT CAST((SELECT COUNT(*) FROM s0) AS BIGINT) AS n_step1,
               CAST(COUNT(*) AS BIGINT) AS n_converted,
               ROUND(CAST(SUM(t1 - t0) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
                   AS mean_latency_sec,
               ROUND(CAST(MIN(t1 - t0) AS DOUBLE) / 1000000.0, 6)
                   AS min_latency_sec,
               ROUND(CAST(MAX(t1 - t0) AS DOUBLE) / 1000000.0, 6)
                   AS max_latency_sec
        FROM s1
    """


QUERIES = {
    "max_drawdown_daily_revenue": max_drawdown_daily_revenue,
    "funnel_latency_events": funnel_latency_events,
    "windowed_events_daily": windowed_events_daily,
    "sliding_events_weekly": sliding_events_weekly,
    "sessionize_events": sessionize_events,
    "asof_value_per_order": asof_value_per_order,
    "range_join_orders_lineitem": range_join_orders_lineitem,
    "event_gaps_events": event_gaps_events,
    "cumsum_crossing_events": cumsum_crossing_events,
    "funnel_events": funnel_events,
    "event_type_transitions_events": event_type_transitions_events,
    "rolling_avg_events": rolling_avg_events,
    "retention_cohorts_events": retention_cohorts_events,
    "missing_hours_events": missing_hours_events,
    "churn_weekly_events": churn_weekly_events,
    "time_weighted_value_events": time_weighted_value_events,
    "session_duration_stats_events": session_duration_stats_events,
    "traffic_heatmap_events": traffic_heatmap_events,
    "monthly_growth_orders": monthly_growth_orders,
    "late_events_events": late_events_events,
    "peak_window_events": peak_window_events,
    "rolling_wau_events": rolling_wau_events,
    "new_vs_returning_orders": new_vs_returning_orders,
    "conversion_delay_events": conversion_delay_events,
    "burst_users_events": burst_users_events,
    "dau_series_events": dau_series_events,
    "order_gaps_orders": order_gaps_orders,
    "streaks_events": streaks_events,
    "cumulative_users_events": cumulative_users_events,
    "journey_paths_events": journey_paths_events,
}

ORACLE_SQL = {
    "funnel_latency_events": _funnel_latency_sql(),
    "rolling_avg_events": """
        WITH w AS (
            SELECT event_type,
                   SUM(CAST(ROUND(COALESCE(value, 0) * 100, 0) AS BIGINT))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS s,
                   COUNT(*)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS c
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
              AND event_type IS NOT NULL
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               ROUND(MAX(s * 1.0 / c / 100), 4) AS max_rolling_avg,
               ROUND(fsum(s * 1.0 / c / 100), 4) AS sum_rolling_avg
        FROM w GROUP BY event_type ORDER BY event_type
    """,
    "retention_cohorts_events": """
        WITH f AS (
            SELECT user_id,
                   MIN(CAST(date_trunc('week', ts) AS TIMESTAMP)) AS cw
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
            GROUP BY user_id
        ),
        a AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS TIMESTAMP) AS aw
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
        )
        SELECT f.cw AS cohort_week,
               CAST((epoch_us(a.aw) - epoch_us(f.cw)) // 604800000000
                    AS BIGINT) AS week_offset,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM a JOIN f USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "burst_users_events": """
        WITH w AS (
            SELECT user_id,
                   COUNT(*) OVER (
                       PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL 24 HOUR PRECEDING
                             AND CURRENT ROW
                   ) AS c
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
        ),
        m AS (SELECT user_id, MAX(c) AS mb FROM w GROUP BY user_id)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(COUNT(*) FILTER (WHERE mb >= 3) AS BIGINT)
                   AS n_bursty_users,
               CAST(MAX(mb) AS BIGINT) AS max_burst
        FROM m
    """,
    "conversion_delay_events": """
        WITH v AS (
            SELECT user_id, MIN(epoch_us(ts)) AS t0
            FROM events
            WHERE event_type = 'view' AND user_id IS NOT NULL
              AND ts IS NOT NULL
            GROUP BY user_id
        ),
        p AS (
            SELECT e.user_id, MIN(epoch_us(e.ts)) AS t1
            FROM events e JOIN v USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts IS NOT NULL
              AND epoch_us(e.ts) > v.t0
            GROUP BY e.user_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
               CAST(SUM(p.t1 - v.t0) AS BIGINT) AS sum_delay_us,
               CAST(MAX(p.t1 - v.t0) AS BIGINT) AS max_delay_us,
               ROUND(SUM(p.t1 - v.t0) * 1.0 / COUNT(*) / 1000000, 4)
                   AS avg_delay_seconds
        FROM p JOIN v USING (user_id)
    """,
    "order_gaps_orders": """
        WITH g AS (
            SELECT (epoch_us(o_orderdate) // 86400000000)
                   - LAG(epoch_us(o_orderdate) // 86400000000) OVER (
                         PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                     ) AS gap_days
            FROM orders
            WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
        )
        SELECT CAST(COUNT(gap_days) AS BIGINT) AS n_gaps,
               CAST(SUM(gap_days) AS BIGINT) AS sum_gap_days,
               CAST(MAX(gap_days) AS BIGINT) AS max_gap_days,
               ROUND(SUM(gap_days) * 1.0 / COUNT(gap_days), 4)
                   AS avg_gap_days
        FROM g
    """,
    "dau_series_events": """
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
        GROUP BY 1 ORDER BY 1
    """,
    "journey_paths_events": """
        WITH e AS (
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
              AND event_type IS NOT NULL
        ),
        p AS (
            SELECT user_id,
                   string_agg(event_type, '>' ORDER BY rn) AS path
            FROM e WHERE rn <= 3 GROUP BY user_id
        )
        SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM p GROUP BY path ORDER BY n_users DESC, path LIMIT 10
    """,
    "streaks_events": """
        WITH d AS (
            SELECT DISTINCT user_id,
                   epoch_us(date_trunc('day', ts)) // 86400000000 AS day
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
        ),
        i AS (
            SELECT user_id, day,
                   day - ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY day
                   ) AS isl
            FROM d
        ),
        s AS (SELECT user_id, COUNT(*) AS streak FROM i GROUP BY user_id, isl),
        m AS (SELECT user_id, MAX(streak) AS ms FROM s GROUP BY user_id)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(MAX(ms) AS BIGINT) AS max_streak,
               CAST(SUM(ms) AS BIGINT) AS sum_max_streak,
               CAST(COUNT(*) FILTER (WHERE ms >= 3) AS BIGINT)
                   AS n_users_streak_ge_3,
               ROUND(SUM(ms) * 1.0 / COUNT(*), 4) AS avg_max_streak
        FROM m
    """,
    "cumulative_users_events": """
        WITH d AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
        ),
        f AS (SELECT user_id, MIN(day) AS fd FROM d GROUP BY user_id),
        days AS (SELECT DISTINCT day FROM d)
        SELECT days.day AS day,
               CAST(COUNT(f.user_id) AS BIGINT) AS cum_users
        FROM days JOIN f ON f.fd <= days.day
        GROUP BY 1 ORDER BY 1
    """,
    "rolling_wau_events": """
        WITH d AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
            FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        ),
        days AS (SELECT DISTINCT day FROM d)
        SELECT days.day AS window_day,
               CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS wau
        FROM days JOIN d
          ON d.day BETWEEN days.day - INTERVAL 6 DAY AND days.day
        GROUP BY 1 ORDER BY 1
    """,
    "new_vs_returning_orders": """
        WITH a AS (
            SELECT DISTINCT o_custkey AS c,
                   CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m
            FROM orders
            WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
        ),
        f AS (SELECT c, MIN(m) AS fm FROM a GROUP BY c)
        SELECT a.m AS month,
               CAST(COUNT(*) AS BIGINT) AS n_active,
               CAST(COUNT(*) FILTER (WHERE a.m = f.fm) AS BIGINT) AS n_new,
               CAST(COUNT(*) FILTER (WHERE a.m > f.fm) AS BIGINT)
                   AS n_returning
        FROM a JOIN f USING (c)
        GROUP BY 1 ORDER BY 1
    """,
    "late_events_events": """
        WITH w AS (
            SELECT epoch_us(ts) AS t,
                   MAX(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS prev_max
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(*) FILTER (WHERE t < prev_max) AS BIGINT)
                   AS n_late,
               ROUND(COUNT(*) FILTER (WHERE t < prev_max) * 1.0
                     / COUNT(*), 4) AS late_rate,
               CAST(COALESCE(SUM(prev_max - t)
                             FILTER (WHERE t < prev_max), 0) AS BIGINT)
                   AS sum_lateness_us,
               CAST(COALESCE(MAX(prev_max - t)
                             FILTER (WHERE t < prev_max), 0) AS BIGINT)
                   AS max_lateness_us
        FROM w
    """,
    "peak_window_events": """
        SELECT CAST(MAX(c) AS BIGINT) AS peak_window_events
        FROM (
            SELECT COUNT(*) OVER (
                       ORDER BY ts
                       RANGE BETWEEN INTERVAL 5 MINUTE PRECEDING
                             AND CURRENT ROW
                   ) AS c
            FROM events WHERE ts IS NOT NULL
        )
    """,
    "traffic_heatmap_events": """
        SELECT CAST(EXTRACT(dow FROM ts) AS BIGINT) AS dow,
               CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events WHERE ts IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "max_drawdown_daily_revenue": """
        WITH d AS (
            SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP)
                       AS day,
                   SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS c
            FROM orders
            WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
            GROUP BY 1
        ),
        w AS (
            SELECT day, c, MAX(c) OVER (ORDER BY day) AS cm,
                   COUNT(*) OVER () AS n
            FROM d
        ),
        t AS (
            SELECT n, day AS trough_day, cm AS peak_cents, cm - c AS dd
            FROM w ORDER BY cm - c DESC, day ASC LIMIT 1
        )
        SELECT CAST(t.n AS BIGINT) AS n_days,
               (SELECT MIN(day) FROM w WHERE c = t.peak_cents)
                   AS peak_day,
               t.trough_day,
               CAST(t.peak_cents AS BIGINT) AS peak_cents,
               CAST(t.dd AS BIGINT) AS drawdown_cents,
               CASE WHEN t.peak_cents > 0 THEN
                   ROUND(CAST(t.dd AS DOUBLE)
                         / CAST(t.peak_cents AS DOUBLE), 6)
               END AS drawdown_pct
        FROM t
    """,
    "monthly_growth_orders": """
        WITH m AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
                       AS month,
                   SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                       AS cents
            FROM orders
            WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
            GROUP BY 1
        )
        SELECT month, CAST(cents AS BIGINT) AS rev_cents,
               ROUND((cents - LAG(cents) OVER (ORDER BY month)) * 1.0
                     / LAG(cents) OVER (ORDER BY month), 4) AS growth_pct
        FROM m ORDER BY month
    """,
    "session_duration_stats_events": """
        WITH g AS (
            SELECT user_id, epoch_us(ts) AS t,
                   CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                            > 1800000000
                        THEN 1 ELSE 0 END AS is_start
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        s AS (
            SELECT user_id, t,
                   SUM(is_start) OVER (
                       PARTITION BY user_id ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS sid
            FROM g
        ),
        d AS (
            SELECT CAST(MAX(t) - MIN(t) AS BIGINT) AS dur
            FROM s GROUP BY user_id, sid
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(dur) AS BIGINT) AS sum_duration_us,
               CAST(MAX(dur) AS BIGINT) AS max_duration_us,
               ROUND(SUM(dur) * 1.0 / COUNT(*) / 1000000, 4)
                   AS avg_duration_seconds
        FROM d
    """,
    "time_weighted_value_events": """
        WITH s AS (
            SELECT event_type,
                   CAST(ROUND(COALESCE(value, 0) * 100, 0) AS BIGINT)
                       AS cents,
                   (LEAD(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                    - epoch_us(ts)) // 1000000 AS gap_s
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_intervals,
               CAST(SUM(gap_s) AS BIGINT) AS sum_weight_s,
               ROUND(SUM(cents * gap_s) * 1.0 / SUM(gap_s) / 100, 4)
                   AS twa_value
        FROM s
        WHERE gap_s IS NOT NULL AND event_type IS NOT NULL
        GROUP BY event_type ORDER BY event_type
    """,
    "churn_weekly_events": """
        WITH a AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
        )
        SELECT a.wk AS week,
               CAST(COUNT(*) AS BIGINT) AS n_active,
               CAST(COUNT(b.user_id) AS BIGINT) AS n_retained,
               CAST(COUNT(*) - COUNT(b.user_id) AS BIGINT) AS n_churned
        FROM a LEFT JOIN a b
          ON b.user_id = a.user_id AND b.wk = a.wk + INTERVAL 7 DAY
        GROUP BY a.wk ORDER BY a.wk
    """,
    "missing_hours_events": """
        WITH b AS (
            SELECT DISTINCT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h
            FROM events WHERE ts IS NOT NULL
        ),
        ext AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM b),
        spine AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
            FROM ext
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_hours_span,
               CAST(COUNT(b.h) AS BIGINT) AS n_active_hours,
               CAST(COUNT(*) - COUNT(b.h) AS BIGINT) AS n_missing_hours,
               MIN(CASE WHEN b.h IS NULL THEN spine.h END)
                   AS first_missing_hour
        FROM spine LEFT JOIN b ON spine.h = b.h
    """,
    "event_type_transitions_events": """
        WITH s AS (
            SELECT user_id, event_type,
                   LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type
            FROM events
            WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        )
        SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM s WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type ORDER BY prev_type, event_type
    """,
    "windowed_events_daily": """
        SELECT date_trunc('day', ts) AS window_day, event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS sum_value
        FROM events
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "sliding_events_weekly": """
        WITH expanded AS (
            SELECT date_trunc('day', ts) - d.d * INTERVAL '1 day' AS window_start,
                   event_type
            FROM events
            CROSS JOIN (SELECT unnest(range(7)) AS d) d
        ),
        totals AS (
            SELECT window_start, event_type, COUNT(*) AS cnt
            FROM expanded GROUP BY 1, 2
        )
        SELECT COUNT(DISTINCT window_start) AS n_windows,
               MAX(cnt) AS max_window_events,
               COUNT(*) AS total_window_rows
        FROM totals
    """,
    "sessionize_events": """
        WITH gaps AS (
            SELECT user_id, ts,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             > INTERVAL 30 MINUTE
                         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                        THEN 1 ELSE 0 END AS is_start
            FROM events
        )
        SELECT CAST(SUM(is_start) AS BIGINT) AS total_sessions,
               COUNT(*) AS total_events,
               ROUND(COUNT(*) * 1.0 / SUM(is_start), 4) AS avg_events_per_session
        FROM gaps
    """,
    "asof_value_per_order": """
        WITH o AS (SELECT o_orderkey, o_custkey % 100 AS key,
                          epoch_us(o_orderdate) AS t FROM orders),
             e AS (SELECT user_id % 100 AS key, epoch_us(ts) AS t,
                          MAX(value) AS value
                   FROM events GROUP BY 1, 2)
        SELECT COUNT(*) AS matched_orders,
               ROUND(SUM(v), 2) AS sum_matched_value
        FROM (
            SELECT (SELECT e.value FROM e
                    WHERE e.key = o.key AND e.t >= o.t
                    ORDER BY e.t ASC LIMIT 1) AS v
            FROM o
        ) WHERE v IS NOT NULL
    """,
    "range_join_orders_lineitem": """
        WITH j AS (
            SELECT o.o_orderkey, l.l_extendedprice AS value
            FROM orders o JOIN lineitem l
              ON (o.o_custkey % 100) = (l.l_suppkey % 100)
             AND l.l_shipdate >= o.o_orderdate
             AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS pair_count,
               CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS orders_matched,
               ROUND(COALESCE(SUM(value), 0), 2) AS sum_value
        FROM j
    """,
    "event_gaps_events": """
        WITH g AS (
            SELECT epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS gap_us
            FROM events
            WHERE user_id IS NOT NULL
        )
        SELECT COUNT(gap_us) AS n_gaps,
               CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
               CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
               ROUND(SUM(gap_us) / COUNT(gap_us) / 1000000.0, 4) AS avg_gap_seconds
        FROM g
    """,
    "cumsum_crossing_events": """
        WITH w AS (
            SELECT ts, event_id,
                   SUM(COALESCE(value, 0)) OVER (
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS running,
                   SUM(COALESCE(value, 0)) OVER () AS total
            FROM events
            WHERE ts IS NOT NULL
        )
        SELECT ts AS crossing_ts, event_id,
               ROUND(running, 2) AS running_value,
               ROUND(total * 0.5, 3) AS threshold
        FROM w
        WHERE running >= total * 0.5
        ORDER BY ts, event_id
        LIMIT 1
    """,
    "funnel_events": """
        WITH s0 AS (
            SELECT user_id, MIN(ts) AS t FROM events
            WHERE event_type = 'view' AND user_id IS NOT NULL
              AND ts IS NOT NULL
            GROUP BY user_id
        ),
        s1 AS (
            SELECT e.user_id, MIN(e.ts) AS t
            FROM events e JOIN s0 USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > s0.t
            GROUP BY e.user_id
        ),
        s2 AS (
            SELECT e.user_id, MIN(e.ts) AS t
            FROM events e JOIN s1 USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > s1.t
            GROUP BY e.user_id
        )
        SELECT * FROM (
            VALUES ('view', (SELECT COUNT(*) FROM s0)),
                   ('click', (SELECT COUNT(*) FROM s1)),
                   ('purchase', (SELECT COUNT(*) FROM s2))
        ) AS v(step, users)
    """,
}
