"""Operator demonstrations over the driver's TPC-H-ish tables.

Each function here is one ``queries()`` entry in ``__ray_entry__.py``,
exercising an engine operator from SURVEY.md §2 against
``/root/testdata/sf*`` with an exact DuckDB-SQL oracle counterpart
(FIXTURES.md F4). Column names match the oracle SQL exactly; floats are
rounded to 4 decimals on both sides so the driver's value-hash compares
stably.

All pipelines follow the engine's fused execution model (README
"Execution model"): pruned column projections, vectorized partial
aggregation INSIDE one wave of raw scan tasks over deterministic
file/row-group units (``shuffle.map_partials`` /
``parquet_bucket_shuffle``), small driver-side finalization — no
``take_all`` on raw inputs, no per-query Dataset pipeline overhead.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..io import list_parquet_files, read_table
from ..shuffle import map_partials
from ..stages.keyed import KeyedSpec, run_keyed_pass
from ..stages.profile import ProfileSpec, run_profile_files
from ..stages.referential import run_referential_pass


from ._util import round_duck


def _r4(x: float | None) -> float | None:
    return None if x is None else float(round_duck(x, 4))


def _r2(x: float | None) -> float | None:
    """2-dp rounding for large-magnitude float SUMs. At sum ≈ 1e9 the
    float64 ULP is ~5e-7 and accumulation-order noise between any two
    engines is ~1e-6, so 4-dp equality is luck; 2-dp leaves >1000×
    headroom. Both sides accumulate compensated (engine: fsum of
    per-batch partials; oracle: DuckDB ``fsum``)."""
    return None if x is None else float(round_duck(x, 2))


def profile_orders(sf_dir: str) -> pd.DataFrame:
    """G1/G2/G3 fused profile over orders (one scan)."""
    spec = ProfileSpec(
        null_columns=["o_orderstatus"],
        agg_columns={"o_totalprice": {"SUM", "AVG", "MIN", "MAX"}},
    )
    p = run_profile_files(
        list_parquet_files(f"{sf_dir}/orders.parquet"),
        spec,
        columns=["o_orderstatus", "o_totalprice"],
    )
    return pd.DataFrame(
        {
            "order_count": [p.count],
            "status_nulls": [p.nulls["o_orderstatus"]],
            "sum_total": [_r2(p.agg_value("o_totalprice", "SUM"))],
            "avg_total": [_r4(p.agg_value("o_totalprice", "AVG"))],
            "min_total": [_r4(p.agg_value("o_totalprice", "MIN"))],
            "max_total": [_r4(p.agg_value("o_totalprice", "MAX"))],
        }
    )


def agg_lineitem(sf_dir: str) -> pd.DataFrame:
    """G3 aggregates over two lineitem columns in one fused scan."""
    spec = ProfileSpec(
        agg_columns={
            "l_extendedprice": {"SUM", "AVG", "MIN", "MAX"},
            "l_quantity": {"SUM", "AVG"},
        }
    )
    p = run_profile_files(
        list_parquet_files(f"{sf_dir}/lineitem.parquet"),
        spec,
        columns=["l_extendedprice", "l_quantity"],
    )
    return pd.DataFrame(
        {
            "sum_price": [_r2(p.agg_value("l_extendedprice", "SUM"))],
            "avg_price": [_r4(p.agg_value("l_extendedprice", "AVG"))],
            "min_price": [_r4(p.agg_value("l_extendedprice", "MIN"))],
            "max_price": [_r4(p.agg_value("l_extendedprice", "MAX"))],
            "sum_qty": [_r4(p.agg_value("l_quantity", "SUM"))],
            "avg_qty": [_r4(p.agg_value("l_quantity", "AVG"))],
        }
    )


def uniqueness_lineitem(sf_dir: str) -> pd.DataFrame:
    """G4/E3 composite-key uniqueness via the bucketed keyed pass."""
    keys = ["l_orderkey", "l_linenumber"]
    spec = KeyedSpec(key_columns=keys, uniqueness=True, num_buckets=32)
    m = run_keyed_pass(
        None,
        None,
        spec,
        task_key="uniqueness_lineitem",
        source_files=[f"{sf_dir}/lineitem.parquet"],
        columns=keys,
    )
    return pd.DataFrame(
        {
            "row_count": [m.uniq_count[0]],
            "distinct_keys": [m.uniq_distinct[0]],
            "duplicate_rows": [m.uniq_count[0] - m.uniq_distinct[0]],
        }
    )


def dup_part_sequences_lineitem(sf_dir: str) -> pd.DataFrame:
    """Conversation-level exact dedup machinery (ConvDedupCheck) on a
    relational payload: orders whose ORDERED part sequence (l_partkey by
    l_linenumber) is identical to another order's. Each order reduces to
    a 128-bit order-sensitive polynomial fingerprint inside the bucket
    reduce; only fingerprints (~40 B/group) flow through the chained
    fingerprint exchange — the duplicate census at any scale without the
    sequences themselves ever re-shuffling. Oracle: DuckDB string_agg
    sequence comparison (exact — integer part keys are comma-separator
    unambiguous)."""
    cols = ["l_orderkey", "l_linenumber", "l_partkey"]
    spec = KeyedSpec(
        key_columns=["l_orderkey", "l_linenumber"],
        group_column="l_orderkey",
        index_column="l_linenumber",
        conv_dedup_columns=["l_partkey"],
        conv_dedup_sides=(0,),
        num_buckets=32,
    )
    m = run_keyed_pass(
        None,
        None,
        spec,
        task_key="dup_part_sequences_lineitem",
        source_files=[f"{sf_dir}/lineitem.parquet"],
        columns=cols,
    )
    checked = m.conv_distinct[0] + m.conv_dup_convs[0]
    return pd.DataFrame(
        {
            "orders_checked": [checked],
            "distinct_sequences": [m.conv_distinct[0]],
            "duplicate_orders": [m.conv_dup_convs[0]],
        }
    )


def dup_part_multisets_lineitem(sf_dir: str) -> pd.DataFrame:
    """Order-INSENSITIVE variant of the sequence census: orders whose
    part MULTISET (duplicates counted, line order ignored) matches
    another order's. Uses the conv-dedup machinery's canonical
    tie-break: with a constant index column every turn ties, so rows
    sort by content hash — any canonical total order makes sequence
    equality coincide with multiset equality, the same relation as the
    oracle's value-ordered string_agg."""
    spec = KeyedSpec(
        key_columns=["l_orderkey"],
        group_column="l_orderkey",
        index_column="l_orderkey",  # constant within group -> hash order
        conv_dedup_columns=["l_partkey"],
        conv_dedup_sides=(0,),
        num_buckets=32,
    )
    m = run_keyed_pass(
        None,
        None,
        spec,
        task_key="dup_part_multisets_lineitem",
        source_files=[f"{sf_dir}/lineitem.parquet"],
        columns=["l_orderkey", "l_partkey"],
    )
    checked = m.conv_distinct[0] + m.conv_dup_convs[0]
    return pd.DataFrame(
        {
            "orders_checked": [checked],
            "distinct_multisets": [m.conv_distinct[0]],
            "duplicate_orders": [m.conv_dup_convs[0]],
        }
    )


def referential_orders_customer(sf_dir: str) -> pd.DataFrame:
    """J2/A2 referential: every o_custkey must exist in customer."""
    m = run_referential_pass(
        None,
        None,
        ["o_custkey"],
        ["c_custkey"],
        probe_files=list_parquet_files(f"{sf_dir}/orders.parquet"),
        ref_files=list_parquet_files(f"{sf_dir}/customer.parquet"),
    )
    return pd.DataFrame(
        {"probed_rows": [m.probed_rows], "orphan_rows": [m.orphan_rows]}
    )


def referential_lineitem_orders(sf_dir: str) -> pd.DataFrame:
    m = run_referential_pass(
        None,
        None,
        ["l_orderkey"],
        ["o_orderkey"],
        probe_files=list_parquet_files(f"{sf_dir}/lineitem.parquet"),
        ref_files=list_parquet_files(f"{sf_dir}/orders.parquet"),
    )
    return pd.DataFrame(
        {"probed_rows": [m.probed_rows], "orphan_rows": [m.orphan_rows]}
    )


FILTER_EVENTS = "event_type = 'click' AND value > 10"


def filter_events_agg(sf_dir: str) -> pd.DataFrame:
    """S2/M3 filter pushdown to Parquet row groups + fused profile."""
    p = run_profile_files(
        list_parquet_files(f"{sf_dir}/events.parquet"),
        ProfileSpec(agg_columns={"value": {"SUM", "AVG"}}),
        columns=["value"],
        filter_sql=FILTER_EVENTS,
    )
    return pd.DataFrame(
        {
            "n_events": [p.count],
            "sum_value": [_r4(p.agg_value("value", "SUM"))],
            "avg_value": [_r4(p.agg_value("value", "AVG"))],
        }
    )


def ts_stats_events(sf_dir: str) -> pd.DataFrame:
    """Timestamp stats as epoch microseconds (drift-check inputs).

    Epoch-µs values are ~1.7e15, so an int64 running sum overflows past
    ~5000 rows and a float64 mean has a 0.25-µs ULP. Each batch emits the
    exact sum split into 32-bit halves (each half-sum fits int64 up to
    ~2e13 rows); the driver recombines with Python big ints and the
    average is an exact integer floor division on both sides."""
    def partial(batch: pa.Table) -> pd.DataFrame:
        e = batch.column("ts").cast(pa.int64())
        arr = e.to_numpy(zero_copy_only=False)
        return pd.DataFrame(
            {
                "n": [batch.num_rows],
                "mn": [pc.min(e).as_py()],
                "mx": [pc.max(e).as_py()],
                "sm_hi": [int((arr >> 32).sum())],
                "sm_lo": [int((arr & 0xFFFFFFFF).sum())],
            }
        )

    df = map_partials(f"{sf_dir}/events.parquet", ["ts"], None, partial)
    n = int(df["n"].sum())
    # Python big-int sums: the low halves average ~2^31 per ROW, so a
    # numpy int64 sum of the partials would wrap at ~4.3e9 rows — the
    # whole point of the split-sum is exactness past that
    sm_hi = sum(int(v) for v in df["sm_hi"])
    sm_lo = sum(int(v) for v in df["sm_lo"])
    total = (sm_hi << 32) + sm_lo
    if n == 0:  # SQL: COUNT 0, MIN/MAX/AVG NULL
        return pd.DataFrame(
            {
                "n_events": pd.Series([0], dtype="int64"),
                "min_epoch_us": [None],
                "max_epoch_us": [None],
                "avg_epoch_us": [None],
            }
        )
    return pd.DataFrame(
        {
            "n_events": [n],
            "min_epoch_us": [int(df["mn"].min())],
            "max_epoch_us": [int(df["mx"].max())],
            "avg_epoch_us": [total // n],
        }
    )


def rowhash_customer_self(sf_dir: str) -> pd.DataFrame:
    """J1 PK row-hash compare of a table with itself ⇒ 0 mismatches."""
    path = f"{sf_dir}/customer.parquet"
    from ..io import table_schema

    spec = KeyedSpec(key_columns=["c_custkey"], row_hash=True, num_buckets=32)
    m = run_keyed_pass(
        None,
        None,
        spec,
        task_key="rowhash_customer_self",
        source_files=[path],
        target_files=[path],
        columns=list(table_schema(path).names),
    )
    return pd.DataFrame(
        {
            "compared_rows": [m.total_compared_rows],
            "mismatch_count": [m.mismatch_count],
        }
    )


def groupby_lineitem_returnflag(sf_dir: str) -> pd.DataFrame:
    """Wide grouped rollup with partial pre-aggregation: each map task
    reduces its batch to ≤6 (flag, status) rows of compensated partial
    sums (fsum) + counts, so the exchange carries rows ∝ n_groups ×
    n_tasks instead of the whole table; the driver fsum-merges and
    finalizes AVG = sum / count. (Measured 5× faster than the full-table
    native hash aggregate at sf0.1 — the all-to-all of 60M rows was the
    entire cost.)"""
    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        # SQL NULL semantics: SUM/AVG skip NULLs (fsum over NaN would
        # poison the total); COUNT(*) counts every row; AVG divides by
        # the NON-NULL count, carried separately
        rows = [
            (
                flag,
                status,
                math.fsum(g["l_quantity"].dropna().to_numpy()),
                math.fsum(g["l_extendedprice"].dropna().to_numpy()),
                len(g),
                int(g["l_extendedprice"].notna().sum()),
            )
            for (flag, status), g in df.groupby(
                ["l_returnflag", "l_linestatus"], sort=False
            )
        ]
        return pd.DataFrame(
            rows,
            columns=["l_returnflag", "l_linestatus", "sq", "sp", "n", "np"],
        ).astype({"sq": "float64", "sp": "float64", "n": "int64", "np": "int64"})

    parts = map_partials(
        f"{sf_dir}/lineitem.parquet",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
        None,
        partial,
    )
    out_rows = []
    for (flag, status), g in parts.groupby(
        ["l_returnflag", "l_linestatus"], sort=True
    ):
        n = int(g["n"].sum())
        n_price = int(g["np"].sum())
        avg = _r4(math.fsum(g["sp"]) / n_price) if n_price else None
        out_rows.append((flag, status, _r4(math.fsum(g["sq"])), avg, n))
    return pd.DataFrame(
        out_rows,
        columns=["l_returnflag", "l_linestatus", "sum_qty", "avg_price", "cnt"],
    ).astype({"cnt": "int64"})


def topk_orders(sf_dir: str) -> pd.DataFrame:
    """O2 top-k without a global sort: each map task prunes its batch to
    the rows at or above its local 10th-largest price (np.partition
    threshold, tie-safe), so the driver merge sees ~10 × n_tasks
    candidates instead of the table — the all-to-all Ray sort this
    replaced was 5.6 s at sf0.1; the prune is 0.4 s. Deterministic
    tie-break on o_orderkey."""
    def local_topk(batch: pa.Table) -> pd.DataFrame:
        # NULL prices sort last under ORDER BY ... DESC (NULLS LAST) and
        # can never reach a top-10 of a non-empty table — and NaN would
        # poison np.partition's threshold — so drop them first
        df = batch.to_pandas().dropna(subset=["o_totalprice"])
        if len(df) > 10:
            v = df["o_totalprice"].to_numpy()
            thr = np.partition(v, len(v) - 10)[len(v) - 10]  # 10th largest
            df = df.loc[v >= thr]
        return df.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="stable"
        ).head(10)

    cand = map_partials(
        f"{sf_dir}/orders.parquet", ["o_orderkey", "o_totalprice"], None, local_topk
    )
    top = cand.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="stable"
    ).head(10)
    top["o_totalprice"] = top["o_totalprice"].map(_r4)
    return top.reset_index(drop=True)


def distinct_event_types(sf_dir: str) -> pd.DataFrame:
    """E4 distinct values via shuffle groupby."""
    ds = read_table(f"{sf_dir}/events.parquet", columns=["event_type"])
    vals = ds.unique("event_type")
    return pd.DataFrame({"event_type": sorted(vals or [])})


class _BroadcastLookup:
    """Broadcast join on warm workers: the dim lookup dict is shipped as
    an ObjectRef (``ray.put`` once on the driver); the first task on each
    worker process resolves it (local-store hit) and memoizes the
    deserialized dict in ``warmcache`` — setup-once semantics without an
    actor pool's spin-up cost."""

    def __init__(self, lookup_ref, key: str, out_col: str):
        self.lookup_ref = lookup_ref
        self.key = key
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        from ..warmcache import get_or_build

        lookup = get_or_build(self.lookup_ref, lambda: ray.get(self.lookup_ref))
        df = batch.to_pandas()
        df[self.out_col] = df[self.key].map(lookup)
        return df[[self.out_col]]


def nations_per_region(sf_dir: str) -> pd.DataFrame:
    """Broadcast join: tiny dim (region) shipped once via ray.put, looked
    up inside map_batches — no shuffle (SURVEY.md §2.4 guidance)."""
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    lookup_ref = ray.put(dict(zip(region["r_regionkey"], region["r_name"])))

    ds = read_table(f"{sf_dir}/nation.parquet", columns=["n_regionkey"])
    out = (
        ds.map_batches(
            _BroadcastLookup(lookup_ref, "n_regionkey", "r_name"),
            batch_format="pyarrow",
        )
        .groupby("r_name")
        .count()
        .to_pandas()
    )
    if len(out) == 0:  # 0-row fact side: SQL inner join yields no groups
        return pd.DataFrame(
            {
                "r_name": pd.Series([], dtype="object"),
                "n_nations": pd.Series([], dtype="int64"),
            }
        )
    out = out.rename(columns={"count()": "n_nations"})
    out["n_nations"] = out["n_nations"].astype("int64")
    return out.sort_values("r_name").reset_index(drop=True)


def join_orders_customer(
    sf_dir: str, num_partitions: int | None = None
) -> pd.DataFrame:
    """Large-side equi-join via Ray's native hash-partitioned
    ``Dataset.join`` (both sides shuffle on the key), then a grouped
    rollup — the big-big join path; small sides use the broadcast
    pattern (``nations_per_region``) instead.

    Partition count scales with the LARGER side's footer row count
    (same ``scaled_num_buckets`` rule as every keyed pass) so at 100×
    data the join fans out proportionally instead of forcing each of a
    fixed 8 partitions to hold tens of GB.
    """
    from ray.data.aggregate import Count, Sum

    from ..io import count_rows
    from .windows import scaled_num_buckets

    orders = read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    customer = read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    if orders.count() == 0 or customer.count() == 0:
        # Ray's native hash join crashes finalizing 0-row sides; SQL's
        # inner join over an empty side has no groups
        return pd.DataFrame(
            {
                "c_mktsegment": pd.Series([], dtype="object"),
                "n_orders": pd.Series([], dtype="int64"),
                "sum_total": pd.Series([], dtype="float64"),
            }
        )
    n_parts = num_partitions or scaled_num_buckets(
        max(
            count_rows(f"{sf_dir}/orders.parquet"),
            count_rows(f"{sf_dir}/customer.parquet"),
        ),
        target_rows=1_000_000,
    )
    joined = orders.join(
        customer,
        join_type="inner",
        num_partitions=n_parts,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    out = (
        joined.groupby("c_mktsegment")
        .aggregate(
            Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="sum_total")
        )
        .to_pandas()
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    out["sum_total"] = out["sum_total"].map(_r2)
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def drift_psi_events(sf_dir: str) -> pd.DataFrame:
    """Exact fixed-bin PSI between the 'click' and 'view' populations of
    events.value — the SQL-checkable variant of the drift check (the
    engine's t-digest PSI is the streaming variant; this one uses exact
    histogram counts so DuckDB can replicate it bit-for-bit).

    Formula: 10 equal-width bins over the global [min, max] of value;
    p/q clipped to 1e-6; psi = Σ (p - q) * ln(p / q).

    Single-scan: the bin bounds come from parquet row-group footer
    statistics (exact global min/max, no data read), so the only data
    scan is the histogram pass; a profile scan is the fallback for
    inputs without footer stats.
    """
    from ..io import footer_column_minmax, list_parquet_files

    files = list_parquet_files(f"{sf_dir}/events.parquet")
    mm = footer_column_minmax(files, "value")
    if mm is None:
        p = run_profile_files(
            files, ProfileSpec(agg_columns={"value": {"MIN", "MAX"}}),
            columns=["value"],
        )
        mm = (p.agg_value("value", "MIN"), p.agg_value("value", "MAX"))
    if mm[0] is None or mm[1] is None:  # no rows: no distributions
        return pd.DataFrame({"psi": pd.Series([], dtype="float64")})
    lo, hi = float(mm[0]), float(mm[1])
    width = (hi - lo) / 10.0

    def hist(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        out = []
        for etype in ("click", "view"):
            v = df.loc[df["event_type"] == etype, "value"].to_numpy()
            if len(v) == 0:
                continue
            b = np.clip(((v - lo) / width).astype(np.int64), 0, 9)
            cnt = np.bincount(b, minlength=10)
            out.append(
                pd.DataFrame(
                    {"etype": etype, "bin": np.arange(10), "cnt": cnt}
                )
            )
        if not out:
            return pd.DataFrame({"etype": [], "bin": [], "cnt": []})
        return pd.concat(out, ignore_index=True)

    # partials are ≤ 20 fixed-bin rows per task: merge on the driver
    hists = (
        map_partials(
            f"{sf_dir}/events.parquet", ["event_type", "value"], None, hist
        )
        .groupby(["etype", "bin"], as_index=False)["cnt"]
        .sum()
    )
    piv = hists.pivot_table(index="bin", columns="etype", values="cnt", fill_value=0)
    pa_ = np.clip(
        piv.get("click", pd.Series(0, index=piv.index)).to_numpy(float)
        / max(piv.get("click", pd.Series(0)).sum(), 1),
        1e-6,
        None,
    )
    pb_ = np.clip(
        piv.get("view", pd.Series(0, index=piv.index)).to_numpy(float)
        / max(piv.get("view", pd.Series(0)).sum(), 1),
        1e-6,
        None,
    )
    psi = float(np.sum((pa_ - pb_) * np.log(pa_ / pb_)))
    return pd.DataFrame({"psi": [_r4(psi)]})


def custom_orders_by_status(sf_dir: str) -> pd.DataFrame:
    """J3/E1 custom-check multiset diff: same query on the same table on
    both sides ⇒ zero diffs and equal hashes."""
    from ..stages.custom import run_custom_check

    files = [f"{sf_dir}/orders.parquet"]
    m = run_custom_check(
        "SELECT o_orderstatus, COUNT(*) AS n FROM {{ table_fqn }} "
        "GROUP BY o_orderstatus",
        files,
        files,
    )
    return pd.DataFrame(
        {
            "source_row_count": [m.source_row_count],
            "target_row_count": [m.target_row_count],
            "rows_missing_in_target": [m.rows_missing_in_target],
            "rows_missing_in_source": [m.rows_missing_in_source],
            "hashes_equal": [int(m.source_hash == m.target_hash)],
        }
    )


def group_topk_orders(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Per-group top-k (``ROW_NUMBER() OVER (PARTITION BY ...) <= k``
    equivalent) without a global sort: each map task prunes its batch to
    its LOCAL per-group top-k (sort within the batch, ``head(k)`` per
    group), so the finalize sees at most k × n_groups × n_tasks candidate
    rows — independent of table size. The pruned candidate set is merged
    on the driver like the profile partials (bounded small), where the
    exact per-group top-k is re-selected with the same deterministic
    tie-break (price desc, key asc)."""
    def local_prune(batch: pa.Table) -> pd.DataFrame:
        # NULL prices sort last (DESC NULLS LAST) — never in a top-k of
        # a group with ≥ k non-null rows; dropping them keeps the
        # pandas sort (NaN-last) and the SQL window ordering aligned
        df = batch.to_pandas().dropna(subset=["o_totalprice"])
        df = df.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="stable"
        )
        return df.groupby("o_orderpriority", sort=False).head(k)

    cand = map_partials(
        f"{sf_dir}/orders.parquet",
        ["o_orderpriority", "o_orderkey", "o_totalprice"],
        None,
        local_prune,
    )
    cand = cand.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="stable"
    )
    top = cand.groupby("o_orderpriority", sort=False).head(k).copy()
    top["rnk"] = (top.groupby("o_orderpriority").cumcount() + 1).astype("int64")
    top["o_totalprice"] = top["o_totalprice"].map(_r4)
    cols = ["o_orderpriority", "rnk", "o_orderkey", "o_totalprice"]
    return top[cols].sort_values(["o_orderpriority", "rnk"]).reset_index(drop=True)


def pivot_lineitem_status(sf_dir: str) -> pd.DataFrame:
    """Grouped pivot: per return-flag sums of extended price split across
    the two line-status columns. One fused scan computes per-batch
    per-(flag,status) compensated partial sums (``math.fsum``); the tiny
    (≤ 6 × n_tasks rows) partial frame merges on the driver with a second
    fsum, then pivots — no shuffle, no full-table groupby."""
    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        # SUM skips NULLs; the count column counts every row (CASE ... 1)
        rows = [
            (flag, status, math.fsum(vals.dropna().to_numpy()), np.int64(len(vals)))
            for (flag, status), vals in df.groupby(
                ["l_returnflag", "l_linestatus"], sort=False
            )["l_extendedprice"]
        ]
        return pd.DataFrame(rows, columns=["flag", "status", "s", "n"]).astype(
            {"flag": str, "status": str, "s": "float64", "n": "int64"}
        )

    parts = map_partials(
        f"{sf_dir}/lineitem.parquet",
        ["l_returnflag", "l_linestatus", "l_extendedprice"],
        None,
        partial,
    )
    out_rows = []
    for flag, g in parts.groupby("flag", sort=True):
        f_mask, o_mask = g["status"] == "F", g["status"] == "O"
        out_rows.append(
            (
                flag,
                _r2(math.fsum(g.loc[f_mask, "s"])),
                _r2(math.fsum(g.loc[o_mask, "s"])),
                int(g.loc[f_mask, "n"].sum()),
                int(g.loc[o_mask, "n"].sum()),
            )
        )
    return pd.DataFrame(
        out_rows, columns=["l_returnflag", "sum_f", "sum_o", "cnt_f", "cnt_o"]
    ).astype({"cnt_f": "int64", "cnt_o": "int64"})


def grouped_quantile_lineitem(sf_dir: str) -> pd.DataFrame:
    """Exact distributed grouped quantiles (median + p95) over a
    low-cardinality numeric column WITHOUT sorting the table: each map
    task emits per-(group, value) partial counts — shuffle rows =
    n_groups × n_distinct_values, independent of table size — and the
    driver merges the bounded partial frame and interpolates
    ``quantile_cont`` from each group's cumulative distribution. (For
    high-cardinality columns the t-digest sketch is the approximate
    scale path and ``pipelines/selection.py`` the exact one; this is the
    cheapest exact path when the value domain is bounded.)"""
    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        g = (
            df.groupby(["l_returnflag", "l_quantity"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return g.astype({"c": "int64"})

    # partials are (group, value, count) — bounded-domain by premise, so
    # the concat is ≤ n_groups × n_distinct_values × n_tasks rows and the
    # final sum is a driver-side pandas groupby (Ray's sort-based
    # aggregate cost ~2-3 s of fixed overhead on kilobyte inputs)
    dist = (
        map_partials(
            f"{sf_dir}/lineitem.parquet", ["l_returnflag", "l_quantity"], None, partial
        )
        .groupby(["l_returnflag", "l_quantity"], as_index=False)["c"]
        .sum()
    )
    rows = []
    for flag, g in dist.groupby("l_returnflag", sort=True):
        g = g.sort_values("l_quantity")
        v = g["l_quantity"].to_numpy(dtype=np.float64)
        cum = np.cumsum(g["c"].to_numpy(dtype=np.int64))
        n = int(cum[-1])

        def q_at(q: float) -> float:
            # value at 0-indexed rank j is v[searchsorted(cum, j, 'right')]
            h = (n - 1) * q
            lo = v[int(np.searchsorted(cum, math.floor(h), side="right"))]
            hi = v[int(np.searchsorted(cum, math.ceil(h), side="right"))]
            return lo + (hi - lo) * (h - math.floor(h))

        rows.append((flag, _r4(q_at(0.5)), _r4(q_at(0.95))))
    return pd.DataFrame(rows, columns=["l_returnflag", "median_qty", "p95_qty"])


def mode_quantity_lineitem(sf_dir: str) -> pd.DataFrame:
    """Grouped MODE (most frequent value) with a deterministic
    tie-break (smallest modal value) — SQL's ``mode()`` leaves ties
    engine-defined, so the op pins them for cross-engine exactness.
    Rides the same bounded-domain (group, value, count) partials as the
    grouped quantile: shuffle rows = groups × distinct values × tasks,
    independent of table size; the argmax runs on the driver over the
    merged bounded frame. NULL values form no (group, value) cell in
    either engine."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        g = (
            df.groupby(["l_returnflag", "l_quantity"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return g.astype({"c": "int64"})

    dist = (
        map_partials(
            f"{sf_dir}/lineitem.parquet",
            ["l_returnflag", "l_quantity"],
            None,
            partial,
        )
        .groupby(["l_returnflag", "l_quantity"], as_index=False)["c"]
        .sum()
    )
    dist = dist.sort_values(
        ["l_returnflag", "c", "l_quantity"],
        ascending=[True, False, True],
        kind="stable",
    )
    top = dist.groupby("l_returnflag", as_index=False).first()
    return pd.DataFrame(
        {
            "l_returnflag": top["l_returnflag"],
            "modal_quantity": top["l_quantity"].astype("float64"),
            "modal_count": top["c"].astype("int64"),
        }
    )


def customer_order_profile(sf_dir: str) -> pd.DataFrame:
    """LEFT OUTER join at scale (completes the join inventory next to
    inner/anti/semi): per market segment, how many customers exist, how
    many have NO orders, and the total order count.

    Shape: the orders side is pre-aggregated per batch to (custkey, n)
    partials — order rows never shuffle, only per-key counts do — then
    both sides route through the explicit hash bucket shuffle (same
    custkey ⇒ same bucket) and each bucket does a vectorized left merge
    + per-segment reduce; only segment-sized frames leave the bucket."""
    from .dedup import _dedup_buckets, _fused_grouped_frames

    num_buckets = _dedup_buckets()
    mult = np.uint64(0x9E3779B97F4A7C15)

    def _bucket(keys: np.ndarray) -> np.ndarray:
        return (
            keys.astype(np.uint64) * mult % np.uint64(num_buckets)
        ).astype(np.int32)

    def cust_rows(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["c_custkey"])
        key = df["c_custkey"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "side": np.int8(0),
                "key": key,
                "seg": df["c_mktsegment"].astype(str),
                "n": np.int64(0),
                "__bucket": _bucket(key),
            }
        )

    def order_partials(batch: pa.Table) -> pd.DataFrame:
        vc = batch.column("o_custkey").to_pandas().dropna().value_counts()
        key = vc.index.to_numpy(np.int64)
        return pd.DataFrame(
            {
                "side": np.int8(1),
                "key": key,
                "seg": "",
                "n": vc.to_numpy().astype("int64"),
                "__bucket": _bucket(key),
            }
        )

    def bucket_join(df: pd.DataFrame) -> pd.DataFrame:
        cust = df[df["side"] == 0]
        ords = (
            df[df["side"] == 1].groupby("key", as_index=False)["n"].sum()
        )
        merged = cust[["key", "seg"]].merge(ords, on="key", how="left")
        merged["n"] = merged["n"].fillna(0).astype("int64")
        g = merged.groupby("seg", sort=False)
        return pd.DataFrame(
            {
                "n_customers": g.size(),
                "n_without_orders": g["n"].apply(lambda s: int((s == 0).sum())),
                "total_orders": g["n"].sum(),
            }
        ).reset_index()

    parts = _fused_grouped_frames(
        [
            (
                f"{sf_dir}/customer.parquet",
                ["c_custkey", "c_mktsegment"],
                None,
                cust_rows,
            ),
            (f"{sf_dir}/orders.parquet", ["o_custkey"], None, order_partials),
        ],
        num_buckets,
        bucket_join,
    )
    out = (
        parts.groupby("seg", as_index=False)
        .agg(
            n_customers=("n_customers", "sum"),
            n_without_orders=("n_without_orders", "sum"),
            total_orders=("total_orders", "sum"),
        )
        .rename(columns={"seg": "c_mktsegment"})
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    for c in ("n_customers", "n_without_orders", "total_orders"):
        out[c] = out[c].astype("int64")
    return out


def null_profile_orders(sf_dir: str) -> pd.DataFrame:
    """Whole-table NULL profile — the first thing any data-quality scan
    reports: per column, row count, null count and null rate, ALL
    columns in one pass (the suite's null checks validate configured
    columns; this is the unconfigured discovery scan). Each batch
    reduces to one fixed-width row per column; exchange and driver
    merge are schema-bounded."""
    import pyarrow.compute as pc

    from ..shuffle import map_partials
    from ._util import round_duck

    cols = pq.read_schema(f"{sf_dir}/orders.parquet").names

    def partial(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "column": list(batch.schema.names),
                "n": np.int64(batch.num_rows),
                "nulls": [
                    int(pc.sum(pc.is_null(batch.column(c))).as_py() or 0)
                    for c in batch.schema.names
                ],
            }
        )

    parts = map_partials(f"{sf_dir}/orders.parquet", list(cols), None, partial)
    out = (
        parts.groupby("column", as_index=False)[["n", "nulls"]]
        .sum()
        .sort_values("column")
        .reset_index(drop=True)
    )
    total = out["n"].to_numpy(np.float64)
    return pd.DataFrame(
        {
            "column": out["column"],
            "n_rows": out["n"].astype("int64"),
            "n_nulls": out["nulls"].astype("int64"),
            "null_rate": round_duck(
                np.where(
                    total > 0,
                    out["nulls"].to_numpy(np.float64) * 1.0 / total,
                    np.nan,
                ),
                4,
            ),
        }
    )


_BP_PACK = np.int64(1) << np.int64(32)


def _bp_map(unit, b1: int) -> list:
    """Basket-pairs hop-1 map: distinct (order, part) incidence for the
    scan unit, split by ORDER bucket (baskets span scan units, so
    pairing must wait until an order is co-located)."""
    from ..shuffle import _split_by_bucket, read_unit

    df = (
        read_unit(unit, ["l_orderkey", "l_partkey"])
        .to_pandas()
        .dropna(subset=["l_orderkey", "l_partkey"])
    )
    inc = pd.DataFrame(
        {
            "o": df["l_orderkey"].astype("int64"),
            "p": df["l_partkey"].astype("int64"),
        }
    ).drop_duplicates()
    inc["__bucket"] = _star_bucket(inc["o"].to_numpy(np.int64), b1)
    return _split_by_bucket(pa.Table.from_pandas(inc, preserve_index=False), b1)


def _bp_reduce1(b2: int, *shards) -> list:
    """Hop-1 reduce AND hop-2 map: dedup this bucket's (order, part)
    incidence, pair within each order (one self-merge, quadratic only
    in basket size), pack each pair into one int64 (partkeys < 2³¹)
    and re-emit the (pair, cnt) rows pre-split by PAIR bucket
    (num_returns = B2) — the exchange chains with no driver hop."""
    from ..shuffle import _split_by_bucket

    empty = pa.table(
        {
            "pair": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
            "__bucket": pa.array([], pa.int32()),
        }
    )
    sh = [s for s in shards if s.num_rows]
    if not sh:
        return [empty.slice(0, 0)] * b2
    inc = pa.concat_tables(sh).to_pandas().drop_duplicates(["o", "p"])
    pairs = inc.merge(inc, on="o")
    pairs = pairs[pairs["p_x"] < pairs["p_y"]]
    if len(pairs) == 0:
        return [empty.slice(0, 0)] * b2
    ids, cnts = np.unique(
        pairs["p_x"].to_numpy(np.int64) * _BP_PACK
        + pairs["p_y"].to_numpy(np.int64),
        return_counts=True,
    )
    out = pd.DataFrame({"pair": ids, "cnt": cnts.astype("int64")})
    out["__bucket"] = _star_bucket(out["pair"].to_numpy(np.int64), b2)
    return _split_by_bucket(pa.Table.from_pandas(out, preserve_index=False), b2)


def _bp_reduce2(k: int, *shards) -> pd.DataFrame:
    """Hop-2 reduce: this PAIR bucket holds every partial count of its
    pairs (pair-keyed co-location), so the local top-k is exact and the
    driver merges ≤ B2 × k candidates."""
    sh = [s for s in shards if s.num_rows]
    if not sh:
        return pd.DataFrame(
            {"pair": pd.Series([], dtype="int64"),
             "cnt": pd.Series([], dtype="int64")}
        )
    tot = (
        pa.concat_tables(sh)
        .to_pandas()
        .groupby("pair", as_index=False)["cnt"]
        .sum()
    )
    return tot.sort_values(
        ["cnt", "pair"], ascending=[False, True], kind="stable"
    ).head(k)


def basket_pairs_lineitem(
    sf_dir: str,
    k: int = 20,
    num_buckets: int | None = None,
    num_buckets2: int | None = None,
) -> pd.DataFrame:
    """Market-basket mining: the top-k part pairs that ship in the SAME
    order (the co-purchase signal behind 'frequently bought together')
    via two CHAINED hash exchanges — the ``revenue_per_nation``
    pattern: hop 1 co-locates each basket by ORDER hash and pairs
    within it; each hop-1 reduce re-emits its (pair, cnt) rows
    pre-split by PAIR hash (num_returns = B2), so hop 2 sees every
    partial count of a pair and its local top-k is exact. Nothing
    bigger than B2 × k candidate rows ever reaches the driver; every
    exchanged row is a fixed-width (int64, int64) pair."""
    from ..io import count_rows, list_parquet_files
    from ..shuffle import _scan_units, _shuffle_target_bytes
    from .windows import scaled_num_buckets

    path = f"{sf_dir}/lineitem.parquet"
    files = list_parquet_files(path)
    b1 = num_buckets or scaled_num_buckets(count_rows(path))
    b2 = num_buckets2 or max(8, b1 // 2)
    target = _shuffle_target_bytes([files])

    map_task = ray.remote(num_returns=b1)(_bp_map)
    red1_task = ray.remote(num_returns=b2)(_bp_reduce1)
    red2_task = ray.remote(_bp_reduce2)

    def _as_list(res, n):
        return [res] if n == 1 else res

    units = _scan_units(files, target)
    if not units:  # 0-row input
        return pd.DataFrame(
            {
                "part_a": pd.Series([], dtype="int64"),
                "part_b": pd.Series([], dtype="int64"),
                "cnt": pd.Series([], dtype="int64"),
            }
        )
    map_shards = [_as_list(map_task.remote(u, b1), b1) for u in units]
    pair_shards = [
        _as_list(
            red1_task.remote(b2, *[s[bb] for s in map_shards]), b2
        )
        for bb in range(b1)
    ]
    cand = ray.get(
        [
            red2_task.remote(k, *[s[bb] for s in pair_shards])
            for bb in range(b2)
        ]
    )
    tot = pd.concat(cand, ignore_index=True)
    top = tot.sort_values(
        ["cnt", "pair"], ascending=[False, True], kind="stable"
    ).head(k)
    pair = top["pair"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "part_a": (pair // int(_BP_PACK)).astype("int64"),
            "part_b": (pair % int(_BP_PACK)).astype("int64"),
            "cnt": top["cnt"].astype("int64"),
        }
    ).reset_index(drop=True)


def json_keys_census_events(sf_dir: str) -> pd.DataFrame:
    """Semi-structured SCHEMA census (the schema-on-read profiling step
    before any extraction): which keys appear in the JSON payload and
    in what fraction of rows. One vectorized C-regex ``extractall``
    per batch under the documented flat-payload premise, (row, key)
    presence dedup in-task, per-key count partials — key-vocabulary-
    bounded, the payload never leaves the scan task."""
    from ..shuffle import map_partials
    from ._util import round_duck

    def partial(batch: pa.Table) -> pd.DataFrame:
        props = batch.column("props").to_pandas().dropna().astype(str)
        total = len(props)
        if total == 0:
            return pd.DataFrame(
                {"key": pd.Series([], dtype="object"),
                 "n": pd.Series([], dtype="int64"),
                 "total": pd.Series([], dtype="int64")}
            )
        keys = props.str.extractall(r'"([^"]+)"\s*:')[0].reset_index()
        keys = keys.drop_duplicates(["level_0", 0])  # presence, not count
        vc = keys[0].value_counts()
        out = pd.DataFrame(
            {
                "key": vc.index.to_numpy().astype(str),
                "n": vc.to_numpy().astype("int64"),
                "total": np.int64(0),
            }
        )
        # one marker row per task carries the non-null payload count
        return pd.concat(
            [out, pd.DataFrame({"key": [""], "n": [0], "total": [total]})],
            ignore_index=True,
        )

    parts = map_partials(f"{sf_dir}/events.parquet", ["props"], None, partial)
    total = int(parts["total"].sum())
    out = (
        parts[parts["key"] != ""]
        .groupby("key", as_index=False)["n"]
        .sum()
        .sort_values("key")
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "key": out["key"],
            "n_rows": out["n"].astype("int64"),
            "presence_rate": round_duck(
                out["n"].to_numpy(np.float64) * 1.0 / float(total), 4
            ),
        }
    )


def chisq_priority_status_orders(sf_dir: str) -> pd.DataFrame:
    """Chi-square independence test on the priority × status
    contingency table (the categorical-drift / association check).
    Cells partial-count per batch (bounded priorities × statuses);
    the driver applies the zero-cell-safe identity
    χ² = Σ o²·t/(r·c) − t over OBSERVED cells only (a zero cell's
    (0−e)²/e term cancels inside the identity), with every factor an
    exact integer so both engines build the same doubles."""
    import math as _math

    from ..shuffle import map_partials
    from ._util import round_duck

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["o_orderpriority", "o_orderstatus"])
        out = df.groupby(
            ["o_orderpriority", "o_orderstatus"], as_index=False
        ).size()
        return out.rename(columns={"size": "n"})

    cells = (
        map_partials(
            f"{sf_dir}/orders.parquet",
            ["o_orderpriority", "o_orderstatus"],
            None,
            partial,
        )
        .groupby(["o_orderpriority", "o_orderstatus"], as_index=False)["n"]
        .sum()
    )
    t = int(cells["n"].sum())
    r = cells.groupby("o_orderpriority")["n"].sum()
    c = cells.groupby("o_orderstatus")["n"].sum()
    terms = [
        (int(row.n) * int(row.n) * t * 1.0)
        / (int(r[row.o_orderpriority]) * int(c[row.o_orderstatus]))
        for row in cells.itertuples()
    ]
    chi2 = _math.fsum(terms) - t
    return pd.DataFrame(
        {
            "n_rows": pd.Series([t], dtype="int64"),
            "n_cells": pd.Series([len(cells)], dtype="int64"),
            "chi2": [float(round_duck(chi2, 4))],
        }
    )


def monthly_activity_union(sf_dir: str) -> pd.DataFrame:
    """UNION ALL across heterogeneous tables (the multi-source activity
    timeline): monthly row counts of the event log and the order book
    side by side. Each table reduces to its own calendar-bounded
    (month, count) partials — the union happens on the compact partial
    frames, never the rows."""
    from ..shuffle import map_partials

    def month_partial(ts_col: str, src: str):
        def fn(batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas().dropna(subset=[ts_col])
            month = (
                df[ts_col]
                .astype("datetime64[us]")
                .to_numpy()
                .astype("datetime64[M]")
                .astype("datetime64[us]")
                .astype("int64")
            )
            cnt = pd.Series(month).value_counts()
            return pd.DataFrame(
                {
                    "month": cnt.index.to_numpy(np.int64),
                    "src": src,
                    "n": cnt.to_numpy().astype("int64"),
                }
            )

        return fn

    parts = pd.concat(
        [
            map_partials(
                f"{sf_dir}/events.parquet", ["ts"], None,
                month_partial("ts", "events"),
            ),
            map_partials(
                f"{sf_dir}/orders.parquet", ["o_orderdate"], None,
                month_partial("o_orderdate", "orders"),
            ),
        ],
        ignore_index=True,
    )
    out = (
        parts.groupby(["month", "src"], as_index=False)["n"]
        .sum()
        .sort_values(["month", "src"])
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "month": pd.to_datetime(out["month"], unit="us").astype(
                "datetime64[us]"
            ),
            "src": out["src"],
            "n": out["n"].astype("int64"),
        }
    )


def distinct_users_per_type(sf_dir: str) -> pd.DataFrame:
    """GROUPED exact COUNT(DISTINCT ...) at scale — the per-group
    version of ``distinct_users_events`` (global) and the exact
    counterpart of the HLL sketch: distinct users per event type.

    Shape: each scan task dedups its batch to (event_type, user) pairs
    and buckets by user hash — the SAME user for the SAME type always
    lands in the same bucket, so per-bucket pair dedup is globally
    correct and per-type counts just add. The exchange carries at most
    (distinct pairs per batch) rows, and each bucket reduces to ≤
    |types| fixed-width count rows. NULL user_id / event_type rows are
    excluded on both sides (SQL COUNT(DISTINCT NULL) skips, and a NULL
    group would be dropped by pandas groupby)."""
    from .dedup import _dedup_buckets, _fused_grouped_frames

    num_buckets = _dedup_buckets()
    mult = np.uint64(0x9E3779B97F4A7C15)

    def pairs(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["user_id", "event_type"])
        part = df[["event_type", "user_id"]].drop_duplicates()
        uid = part["user_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "event_type": part["event_type"].astype(str),
                "user_id": uid,
                "__bucket": (
                    uid.astype(np.uint64) * mult % np.uint64(num_buckets)
                ).astype(np.int32),
            }
        )

    def count_per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.drop_duplicates(["event_type", "user_id"])
            .groupby("event_type", as_index=False)
            .size()
        )
        return out.rename(columns={"size": "n"})

    parts = _fused_grouped_frames(
        [
            (
                f"{sf_dir}/events.parquet",
                ["user_id", "event_type"],
                None,
                pairs,
            )
        ],
        num_buckets,
        count_per_bucket,
    )
    out = (
        parts.groupby("event_type", as_index=False)["n"]
        .sum()
        .sort_values("event_type")
        .reset_index(drop=True)
        .rename(columns={"n": "n_distinct_users"})
    )
    out["n_distinct_users"] = out["n_distinct_users"].astype("int64")
    return out


def full_outer_order_profile(sf_dir: str) -> pd.DataFrame:
    """FULL OUTER join profile (completes the join inventory next to
    inner/left/anti/semi): customers vs per-custkey order counts, with
    BOTH dangling sides surfaced in one pass — customers with no orders
    AND order custkeys with no customer (the referential check only
    reports the latter).

    Same shape as the LEFT OUTER profile: orders pre-aggregate per batch
    to (custkey, n) partials, both sides route through the explicit hash
    bucket shuffle, each bucket does one vectorized outer merge with an
    indicator — only fixed-width count rows leave the bucket."""
    from .dedup import _dedup_buckets, _fused_grouped_frames

    num_buckets = _dedup_buckets()
    mult = np.uint64(0x9E3779B97F4A7C15)

    def _bucket(keys: np.ndarray) -> np.ndarray:
        return (
            keys.astype(np.uint64) * mult % np.uint64(num_buckets)
        ).astype(np.int32)

    def cust_rows(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["c_custkey"])
        key = df["c_custkey"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "side": np.int8(0),
                "key": key,
                "n": np.int64(0),
                "__bucket": _bucket(key),
            }
        )

    def order_partials(batch: pa.Table) -> pd.DataFrame:
        vc = batch.column("o_custkey").to_pandas().dropna().value_counts()
        key = vc.index.to_numpy(np.int64)
        return pd.DataFrame(
            {
                "side": np.int8(1),
                "key": key,
                "n": vc.to_numpy().astype("int64"),
                "__bucket": _bucket(key),
            }
        )

    def bucket_join(df: pd.DataFrame) -> pd.DataFrame:
        cust = df[df["side"] == 0][["key"]]
        ords = df[df["side"] == 1].groupby("key", as_index=False)["n"].sum()
        merged = cust.merge(ords, on="key", how="outer", indicator=True)
        left_only = merged["_merge"] == "left_only"
        right_only = merged["_merge"] == "right_only"
        return pd.DataFrame(
            {
                "n_matched": [int((merged["_merge"] == "both").sum())],
                "n_customers_without_orders": [int(left_only.sum())],
                "n_orphan_custkeys": [int(right_only.sum())],
                "n_orphan_orders": [
                    int(merged.loc[right_only, "n"].sum())
                ],
            }
        )

    parts = _fused_grouped_frames(
        [
            (f"{sf_dir}/customer.parquet", ["c_custkey"], None, cust_rows),
            (f"{sf_dir}/orders.parquet", ["o_custkey"], None, order_partials),
        ],
        num_buckets,
        bucket_join,
    )
    return pd.DataFrame(
        {
            c: [int(parts[c].sum())]
            for c in (
                "n_matched",
                "n_customers_without_orders",
                "n_orphan_custkeys",
                "n_orphan_orders",
            )
        }
    ).astype("int64")


def reconcile_order_totals(sf_dir: str) -> pd.DataFrame:
    """Cross-table total reconciliation — the core warehouse consistency
    check: does each order's header total equal the sum of its line
    items' ``extendedprice·(1−discount)·(1+tax)``? Reports match /
    mismatch / no-lineitem counts and the worst absolute difference.

    Exactness: each line's contribution is fixed to integer MICRO-units
    via ROUND(expr·1e6) of an expression computed with the identical FP
    tree on both engines (2dp price × 2dp discount × 2dp tax = 6
    decimals, so the rounded integer is the exact decimal value); sums
    and comparisons are then pure int64 (≤ 7e11 per order — exact in
    the float64 the merge uses). Lineitems pre-aggregate per batch to
    (orderkey, partial) rows, both sides hash-bucket by orderkey, one
    vectorized left merge per bucket. Orders with a NULL header total
    count in n_orders/n_with_lineitems but in neither match nor
    mismatch (SQL NULL comparison); lineitem rows with any NULL factor
    are skipped on both sides."""
    from .dedup import _dedup_buckets, _fused_grouped_frames

    num_buckets = _dedup_buckets()
    mult = np.uint64(0x9E3779B97F4A7C15)

    def _bucket(keys: np.ndarray) -> np.ndarray:
        return (
            keys.astype(np.uint64) * mult % np.uint64(num_buckets)
        ).astype(np.int32)

    def order_rows(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["o_orderkey"])
        key = df["o_orderkey"].to_numpy(np.int64)
        from ._util import round_duck

        micro = round_duck(
            df["o_totalprice"].to_numpy(np.float64) * 1_000_000.0, 0
        )
        return pd.DataFrame(
            {
                "side": np.int8(0),
                "key": key,
                "v": micro,  # float64 carrying exact ints (or NaN)
                "__bucket": _bucket(key),
            }
        )

    def line_partials(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(
            subset=["l_orderkey", "l_extendedprice", "l_discount", "l_tax"]
        )
        from ._util import round_duck

        # identical FP expression tree as the oracle:
        # p * (1 - d) * (1 + t) * 1000000, then half-away ROUND
        expr = (
            df["l_extendedprice"].to_numpy(np.float64)
            * (1.0 - df["l_discount"].to_numpy(np.float64))
            * (1.0 + df["l_tax"].to_numpy(np.float64))
            * 1_000_000.0
        )
        contrib = round_duck(expr, 0).astype(np.int64)
        part = pd.DataFrame(
            {"key": df["l_orderkey"].to_numpy(np.int64), "c": contrib}
        )
        part = part.groupby("key", as_index=False)["c"].sum()
        part.insert(0, "side", np.int8(1))
        part = part.rename(columns={"c": "v"})
        part["v"] = part["v"].astype("float64")
        part["__bucket"] = _bucket(part["key"].to_numpy(np.int64))
        return part[["side", "key", "v", "__bucket"]]

    def bucket_join(df: pd.DataFrame) -> pd.DataFrame:
        o = df[df["side"] == 0][["key", "v"]].rename(columns={"v": "osum"})
        li = (
            df[df["side"] == 1]
            .groupby("key", as_index=False)["v"]
            .sum()
            .rename(columns={"v": "lsum"})
        )
        m = o.merge(li, on="key", how="left")
        has_l = m["lsum"].notna()
        comparable = has_l & m["osum"].notna()
        diff = (m["osum"] - m["lsum"]).abs()
        return pd.DataFrame(
            {
                "n_orders": [len(m)],
                "n_with_lineitems": [int(has_l.sum())],
                "n_exact_match": [int((comparable & (diff == 0)).sum())],
                "n_mismatch": [int((comparable & (diff != 0)).sum())],
                "mx": [float(diff[comparable].max()) if comparable.any() else 0.0],
            }
        )

    parts = _fused_grouped_frames(
        [
            (f"{sf_dir}/orders.parquet", ["o_orderkey", "o_totalprice"], None, order_rows),
            (
                f"{sf_dir}/lineitem.parquet",
                ["l_orderkey", "l_extendedprice", "l_discount", "l_tax"],
                None,
                line_partials,
            ),
        ],
        num_buckets,
        bucket_join,
    )
    return pd.DataFrame(
        {
            "n_orders": [int(parts["n_orders"].sum())],
            "n_with_lineitems": [int(parts["n_with_lineitems"].sum())],
            "n_exact_match": [int(parts["n_exact_match"].sum())],
            "n_mismatch": [int(parts["n_mismatch"].sum())],
            "max_abs_diff_micro": [int(parts["mx"].max())],
        }
    ).astype("int64")


def json_field_agg_events(sf_dir: str) -> pd.DataFrame:
    """Semi-structured extraction: pull an integer field out of the JSON
    ``props`` payload and aggregate it per event type — the
    schema-on-read step every event-log pipeline starts with. The
    extraction is one vectorized C-regex pass (`str.extract`) under the
    documented premise of a flat payload with a known key; a nested
    payload swaps in a JSON-parser actor stage without changing the
    partial-aggregation shape. Integer sums, so the distributed result
    is bit-exact vs the oracle's ``json_extract``. Rows whose payload
    lacks the key (or is NULL) count in n_events but not in n/sum/avg —
    SQL CAST(NULL) semantics; rows with a NULL event_type are excluded
    (the oracle filters them)."""
    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["event_type"])
        k = pd.to_numeric(
            df["props"].str.extract(r'"k"\s*:\s*(-?\d+)', expand=False),
            errors="coerce",
        )
        rows = [
            (
                etype,
                len(g),
                int(g.notna().sum()),
                int(g.sum()) if g.notna().any() else 0,
            )
            for etype, g in k.groupby(df["event_type"], sort=False)
        ]
        return pd.DataFrame(
            rows, columns=["event_type", "n_events", "n", "sum_k"]
        ).astype({"n_events": "int64", "n": "int64", "sum_k": "int64"})

    parts = (
        map_partials(
            f"{sf_dir}/events.parquet", ["event_type", "props"], None, partial
        )
        .groupby("event_type", as_index=False)
        .sum()
    )
    parts["avg_k"] = [
        _r4(float(s) / n) if n else None
        for s, n in zip(parts["sum_k"], parts["n"])
    ]
    return (
        parts[["event_type", "n_events", "n", "sum_k", "avg_k"]]
        .astype({"n_events": "int64", "n": "int64", "sum_k": "int64"})
        .sort_values("event_type")
        .reset_index(drop=True)
    )


def parts_by_brand(sf_dir: str) -> pd.DataFrame:
    """Dimension-table profile over ``part``: per-brand count, compensated
    average retail price and max size — the same fsum-partial shape as
    the lineitem rollup, exercising the remaining fixture table."""
    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["p_brand"])
        rows = [
            (
                brand,
                len(g),
                math.fsum(g["p_retailprice"].dropna()),
                int(g["p_retailprice"].notna().sum()),
                int(g["p_size"].max()) if g["p_size"].notna().any() else None,
            )
            for brand, g in df.groupby("p_brand", sort=False)
        ]
        return pd.DataFrame(
            rows, columns=["p_brand", "n", "sp", "np_", "mx"]
        )

    parts = map_partials(
        f"{sf_dir}/part.parquet",
        ["p_brand", "p_retailprice", "p_size"],
        None,
        partial,
    )
    rows = []
    for brand, g in parts.groupby("p_brand", sort=True):
        n_price = int(g["np_"].sum())
        rows.append(
            (
                brand,
                int(g["n"].sum()),
                _r4(math.fsum(g["sp"]) / n_price) if n_price else None,
                int(g["mx"].max()),
            )
        )
    return pd.DataFrame(
        rows, columns=["p_brand", "n_parts", "avg_price", "max_size"]
    ).astype({"n_parts": "int64", "max_size": "int64"})


def referential_lineitem_supplier(sf_dir: str) -> pd.DataFrame:
    """J2/A2 referential over the remaining dimension: every l_suppkey
    must exist in supplier (broadcast keyset / partitioned-Bloom path)."""
    m = run_referential_pass(
        None,
        None,
        ["l_suppkey"],
        ["s_suppkey"],
        probe_files=list_parquet_files(f"{sf_dir}/lineitem.parquet"),
        ref_files=list_parquet_files(f"{sf_dir}/supplier.parquet"),
    )
    return pd.DataFrame(
        {"probed_rows": [m.probed_rows], "orphan_rows": [m.orphan_rows]}
    )


def _rev_li_map(unit, b1: int) -> list[pa.Table]:
    """Scan-unit map for the star join's fact side: per-orderkey revenue
    partials (row products summed inside the task), split by orderkey
    bucket — one fixed-width row per (orderkey, task) enters hop 1."""
    from ..shuffle import _split_by_bucket, read_unit

    df = read_unit(
        unit, ["l_orderkey", "l_extendedprice", "l_discount"]
    ).to_pandas()
    part = pd.DataFrame(
        {
            "k": df["l_orderkey"],
            "rev": df["l_extendedprice"] * (1.0 - df["l_discount"]),
        }
    ).dropna(subset=["k"])
    part = part.groupby("k", as_index=False)["rev"].sum(min_count=1)
    part["k"] = part["k"].astype("int64")
    part["__bucket"] = _star_bucket(part["k"].to_numpy(), b1)
    return _split_by_bucket(
        pa.Table.from_pandas(part, preserve_index=False), b1
    )


def _rev_ord_map(unit, b1: int) -> list[pa.Table]:
    from ..shuffle import _split_by_bucket, read_unit

    df = read_unit(unit, ["o_orderkey", "o_custkey"]).to_pandas().dropna()
    part = pd.DataFrame(
        {
            "k": df["o_orderkey"].astype("int64"),
            "c": df["o_custkey"].astype("int64"),
        }
    )
    part["__bucket"] = _star_bucket(part["k"].to_numpy(), b1)
    return _split_by_bucket(
        pa.Table.from_pandas(part, preserve_index=False), b1
    )


def _rev_cust_map(unit, b2: int) -> list[pa.Table]:
    from ..shuffle import _split_by_bucket, read_unit

    df = read_unit(unit, ["c_custkey", "c_nationkey"]).to_pandas().dropna()
    part = pd.DataFrame(
        {
            "c": df["c_custkey"].astype("int64"),
            "nk": df["c_nationkey"].astype("int64"),
        }
    )
    part["__bucket"] = _star_bucket(part["c"].to_numpy(), b2)
    return _split_by_bucket(
        pa.Table.from_pandas(part, preserve_index=False), b2
    )


def _star_bucket(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    h = keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return ((h >> np.uint64(32)) % np.uint64(num_buckets)).astype(np.int32)


def _rev_reduce1(n_li: int, b2: int, *shards) -> list[pa.Table]:
    """Hop-1 reduce AND hop-2 map in one task: join this orderkey
    bucket's revenue partials to its orders rows, reduce to one row per
    custkey, and return the rows already split by custkey bucket
    (num_returns = B2) — the exchange chains with no driver hop."""
    from ..shuffle import _split_by_bucket

    empty = pa.table(
        {
            "c": pa.array([], pa.int64()),
            "rev": pa.array([], pa.float64()),
            "n": pa.array([], pa.int64()),
            "__bucket": pa.array([], pa.int32()),
        }
    )
    li = [s for s in shards[:n_li] if s.num_rows]
    od = [s for s in shards[n_li:] if s.num_rows]
    if not li or not od:
        return [empty.slice(0, 0)] * b2
    rev = (
        pa.concat_tables(li)
        .to_pandas()
        .groupby("k", as_index=False)["rev"]
        .sum(min_count=1)
    )
    ods = pa.concat_tables(od).to_pandas()[["k", "c"]]
    j = ods.merge(rev, on="k", how="inner")
    g = j.groupby("c", as_index=False).agg(rev=("rev", "sum"), n=("k", "count"))
    g["n"] = g["n"].astype("int64")
    g["__bucket"] = _star_bucket(g["c"].to_numpy(), b2)
    return _split_by_bucket(pa.Table.from_pandas(g, preserve_index=False), b2)


def _rev_reduce2(n_rev: int, *shards) -> pd.DataFrame:
    """Hop-2 reduce: attach nationkey to this custkey bucket's revenue
    rows and collapse to ≤ n_nations rows (compensated sums)."""
    import math as _math

    rev = [s for s in shards[:n_rev] if s.num_rows]
    cust = [s for s in shards[n_rev:] if s.num_rows]
    if not rev or not cust:
        return pd.DataFrame({"nk": [], "rev": [], "n": []}).astype(
            {"nk": "int64", "rev": "float64", "n": "int64"}
        )
    r = pa.concat_tables(rev).to_pandas()[["c", "rev", "n"]]
    c = pa.concat_tables(cust).to_pandas()[["c", "nk"]]
    j = r.merge(c, on="c", how="inner")
    rows = [
        (int(nk), _math.fsum(g["rev"].dropna()), int(g["n"].sum()))
        for nk, g in j.groupby("nk", sort=False)
    ]
    return pd.DataFrame(rows, columns=["nk", "rev", "n"]).astype(
        {"nk": "int64", "rev": "float64", "n": "int64"}
    )


def revenue_per_nation(
    sf_dir: str, num_buckets: int | None = None, num_buckets2: int | None = None
) -> pd.DataFrame:
    """TPC-H-Q5-flavoured star join: revenue per customer nation across
    lineitem ⋈ orders ⋈ customer ⋈ nation, via TWO CHAINED hash
    exchanges — hop 1 co-locates lineitem revenue partials with orders
    on orderkey; each hop-1 reduce task re-emits its (custkey, revenue,
    n_orders) rows pre-split by custkey bucket, making it hop 2's map
    side with no materialization barrier or driver hop between the
    exchanges. Only the ≤25-row nation name map is read on the driver.

    Scale shape: all exchanged rows are fixed-width (two int64 + one
    float64); lineitem collapses to one row per (orderkey, scan task)
    before hop 1 and to one row per (custkey, bucket) before hop 2.
    Bucket counts grow with input size; the B1×B2 shuffle-object count
    is the inherent two-hop cost (cap B2 if the object index becomes
    the bottleneck). Revenue is compensated-summed at both reduce
    levels (fsum), matching the oracle's ``fsum`` to well inside 2 dp."""
    import math as _math

    from ..io import count_rows, list_parquet_files
    from ..shuffle import _scan_units, _shuffle_target_bytes
    from .windows import scaled_num_buckets

    l_path, o_path = f"{sf_dir}/lineitem.parquet", f"{sf_dir}/orders.parquet"
    c_path, n_path = f"{sf_dir}/customer.parquet", f"{sf_dir}/nation.parquet"
    b1 = num_buckets or scaled_num_buckets(count_rows(l_path) + count_rows(o_path))
    b2 = num_buckets2 or scaled_num_buckets(count_rows(c_path))
    l_files = list_parquet_files(l_path)
    o_files = list_parquet_files(o_path)
    c_files = list_parquet_files(c_path)
    target = _shuffle_target_bytes([l_files, o_files, c_files])

    li_task = ray.remote(num_returns=b1)(_rev_li_map)
    ord_task = ray.remote(num_returns=b1)(_rev_ord_map)
    cust_task = ray.remote(num_returns=b2)(_rev_cust_map)
    red1_task = ray.remote(num_returns=b2)(_rev_reduce1)
    red2_task = ray.remote(_rev_reduce2)

    def _as_list(res, n):
        return [res] if n == 1 else res

    li_shards = [
        _as_list(li_task.remote(u, b1), b1) for u in _scan_units(l_files, target)
    ]
    od_shards = [
        _as_list(ord_task.remote(u, b1), b1) for u in _scan_units(o_files, target)
    ]
    cust_shards = [
        _as_list(cust_task.remote(u, b2), b2) for u in _scan_units(c_files, target)
    ]

    rev_shards = []
    for bb in range(b1):
        res = red1_task.remote(
            len(li_shards),
            b2,
            *[s[bb] for s in li_shards],
            *[s[bb] for s in od_shards],
        )
        rev_shards.append(_as_list(res, b2))

    parts = ray.get(
        [
            red2_task.remote(
                len(rev_shards),
                *[s[bb] for s in rev_shards],
                *[s[bb] for s in cust_shards],
            )
            for bb in range(b2)
        ]
    )
    merged = pd.concat(parts, ignore_index=True)
    names = (
        pq.read_table(n_path, columns=["n_nationkey", "n_name"])
        .to_pandas()
        .set_index("n_nationkey")["n_name"]
    )
    rows = [
        (
            str(names.loc[int(nk)]),
            _r2(_math.fsum(g["rev"])),
            int(g["n"].sum()),
        )
        for nk, g in merged.groupby("nk", sort=False)
    ]
    return (
        pd.DataFrame(rows, columns=["n_name", "revenue", "n_orders"])
        .astype({"n_orders": "int64"})
        .sort_values("n_name")
        .reset_index(drop=True)
    )


def last_event_per_user(sf_dir: str) -> pd.DataFrame:
    """Per-key argmax (each user's LAST event by (ts, event_id), the
    deterministic log-compaction reduction): two-level reduce. Level 1
    runs inside each map task — per-user argmax over the batch, so one
    row per (user, task) leaves the scan. Level 2 routes those partials
    through the explicit hash bucket shuffle (same user ⇒ same bucket)
    and re-argmaxes per user vectorized in the bucket. Output is the
    per-last-event-type user count (bounded), not the per-user table."""
    from .dedup import _dedup_buckets, _fused_grouped_frames

    num_buckets = _dedup_buckets()

    def _argmax_last(df: pd.DataFrame) -> pd.DataFrame:
        # idxmax over lexicographic (ts, event_id): sort once, keep tail
        d = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        return d.groupby("user_id", sort=False).tail(1)

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["user_id", "ts"])
        last = _argmax_last(df)
        u = last["user_id"].to_numpy().astype(np.uint64)
        spread = u * np.uint64(0x9E3779B97F4A7C15)
        out = last[["user_id", "ts", "event_id", "event_type"]].copy()
        out["__bucket"] = (spread % np.uint64(num_buckets)).astype(np.int32)
        return out

    def bucket_last(df: pd.DataFrame) -> pd.DataFrame:
        last = _argmax_last(df)
        vc = last["event_type"].value_counts()
        return pd.DataFrame(
            {
                "event_type": vc.index.to_numpy().astype(str),
                "n_users": vc.to_numpy().astype("int64"),
            }
        )

    parts = _fused_grouped_frames(
        [
            (
                f"{sf_dir}/events.parquet",
                ["user_id", "ts", "event_id", "event_type"],
                None,
                partial,
            )
        ],
        num_buckets,
        bucket_last,
    )
    out = (
        parts.groupby("event_type", as_index=False)["n_users"]
        .sum()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out


def rollup_lineitem_cube(sf_dir: str) -> pd.DataFrame:
    """Multi-level rollup (SQL ``GROUP BY GROUPING SETS ((f,s),(f),())``)
    from ONE scan: map tasks emit finest-granularity fsum partials only;
    the coarser levels are derived on the driver by re-aggregating the
    tiny partial frame — n_levels × the data is never scanned, and
    nothing wider than (groups × tasks) rows moves."""
    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        # SUM skips NULLs; COUNT(*) counts every row
        rows = [
            (flag, status, math.fsum(g.dropna().to_numpy()), np.int64(len(g)))
            for (flag, status), g in df.groupby(
                ["l_returnflag", "l_linestatus"], sort=False
            )["l_extendedprice"]
        ]
        return pd.DataFrame(rows, columns=["f", "s", "sp", "n"]).astype(
            {"f": str, "s": str, "sp": "float64", "n": "int64"}
        )

    parts = map_partials(
        f"{sf_dir}/lineitem.parquet",
        ["l_returnflag", "l_linestatus", "l_extendedprice"],
        None,
        partial,
    )

    def level(keys: list[str]) -> list[tuple]:
        rows = []
        grouped = parts.groupby(keys, sort=True) if keys else [((), parts)]
        for key, g in grouped:
            key = key if isinstance(key, tuple) else (key,)
            named = dict(zip(keys, key))
            rows.append(
                (
                    named.get("f", "ALL"),
                    named.get("s", "ALL"),
                    _r2(math.fsum(g["sp"])),
                    int(g["n"].sum()),
                )
            )
        return rows

    out = level(["f", "s"]) + level(["f"]) + level([])
    return pd.DataFrame(
        out, columns=["l_returnflag", "l_linestatus", "sum_price", "cnt"]
    ).astype({"cnt": "int64"})


def distinct_users_events(sf_dir: str) -> pd.DataFrame:
    """Exact COUNT(DISTINCT int key) at scale: spread-hash bucket the
    8-byte key column through the explicit fixed-width shuffle (same
    value ⇒ same bucket, so per-bucket ``nunique`` sums are exact — and
    unlike content-hash dedup there is no collision caveat, the raw
    values themselves are compared). Only the key column ever moves.
    ``hll_users_events`` is the one-pass approximate companion."""
    from .dedup import _dedup_buckets, _fused_grouped_frames

    num_buckets = _dedup_buckets()

    def key_batch(batch: pa.Table) -> pd.DataFrame:
        u = batch.column("user_id").to_pandas().dropna().to_numpy(np.int64)
        spread = u.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return pd.DataFrame(
            {
                "h": u,
                "__bucket": (spread % np.uint64(num_buckets)).astype(np.int32),
            }
        )

    def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"distinct": [int(df["h"].nunique())]})

    parts = _fused_grouped_frames(
        [(f"{sf_dir}/events.parquet", ["user_id"], None, key_batch)],
        num_buckets,
        bucket_counts,
    )
    distinct = int(parts["distinct"].sum()) if len(parts) else 0
    return pd.DataFrame({"distinct_users": [distinct]}).astype("int64")


def hll_users_events(sf_dir: str, p: int = 14) -> pd.DataFrame:
    """Approximate distinct via HyperLogLog — the one-pass, shuffle-free
    scale path (per-batch register partials, driver merge; registers are
    2^p bytes regardless of input size). Rows-only check: reports the
    estimate NEXT TO the exact bucket-shuffle count and the relative
    error, so the approximation is self-audited (expected |err| ≈
    1.04/√2^p ≈ 0.8% at p=14)."""
    from ..sketches import HyperLogLog, hash_columns_u64

    def partial(batch: pa.Table) -> pd.DataFrame:
        import pickle

        # COUNT(DISTINCT) excludes NULLs — so must the sketch
        df = batch.to_pandas().dropna(subset=["user_id"])
        hll = HyperLogLog(p=p)
        hll.add_hashes(hash_columns_u64(df, ["user_id"]))
        return pd.DataFrame({"blob": [pickle.dumps(hll)]})

    import pickle

    merged = HyperLogLog(p=p)
    for blob in map_partials(
        f"{sf_dir}/events.parquet", ["user_id"], None, partial
    )["blob"]:
        merged = merged.merge(pickle.loads(blob))
    exact = int(distinct_users_events(sf_dir)["distinct_users"].iloc[0])
    est = float(merged.estimate())
    return pd.DataFrame(
        {
            "exact_distinct": [exact],
            "hll_estimate": [round(est, 1)],
            "rel_err": [round(abs(est - exact) / max(exact, 1), 4)],
        }
    )


def hll_users_per_type_events(sf_dir: str, p: int = 12) -> pd.DataFrame:
    """GROUPED HyperLogLog — approximate distinct users PER EVENT TYPE
    in one shuffle-free pass (the sketch counterpart of the exact
    ``distinct_users_per_type``, whose exchange carries every distinct
    (type, user) pair; this one ships |types| × 2^p-byte registers per
    task regardless of user cardinality — the only viable shape when
    groups × users dwarf the exchange budget). Rows-only but
    SELF-AUDITED: every group's estimate is reported next to the exact
    bucket-shuffle count with its relative error (expected |err| ≈
    1.04/√2^p ≈ 1.6% at p=12)."""
    import pickle

    from ..sketches import HyperLogLog, hash_columns_u64

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["user_id", "event_type"])
        rows = []
        for etype, g in df.groupby("event_type", sort=False):
            hll = HyperLogLog(p=p)
            hll.add_hashes(hash_columns_u64(g, ["user_id"]))
            rows.append((str(etype), pickle.dumps(hll)))
        return pd.DataFrame(rows, columns=["event_type", "blob"])

    parts = map_partials(
        f"{sf_dir}/events.parquet", ["user_id", "event_type"], None, partial
    )
    merged: dict[str, HyperLogLog] = {}
    for etype, blob in zip(parts["event_type"], parts["blob"]):
        hll = pickle.loads(blob)
        merged[etype] = merged[etype].merge(hll) if etype in merged else hll
    exact = distinct_users_per_type(sf_dir).set_index("event_type")[
        "n_distinct_users"
    ]
    rows = []
    for etype in sorted(merged):
        est = float(merged[etype].estimate())
        ex = int(exact.get(etype, 0))
        rows.append(
            (etype, ex, round(est, 1), round(abs(est - ex) / max(ex, 1), 4))
        )
    return pd.DataFrame(
        rows,
        columns=["event_type", "exact_distinct", "hll_estimate", "rel_err"],
    ).astype({"exact_distinct": "int64"}) if rows else pd.DataFrame(
        {
            "event_type": pd.Series([], dtype="object"),
            "exact_distinct": pd.Series([], dtype="int64"),
            "hll_estimate": pd.Series([], dtype="float64"),
            "rel_err": pd.Series([], dtype="float64"),
        }
    )


def temporal_consistency_lineitem_orders(
    sf_dir: str, num_buckets: int | None = None
) -> pd.DataFrame:
    """Cross-table temporal-consistency rule: no line item ships before
    its order was placed (the join-shaped data-quality check — a bug in
    either table's dates or the join keys shows up here). Both sides
    project to the SAME fixed-width (key, day, side) schema and bucket
    by order-key hash, so each bucket holds every line item WITH its
    order row; the in-bucket merge reproduces SQL inner-join fan-out
    semantics exactly (duplicate keys multiply, unmatched rows drop),
    and each bucket reduces to a 4-cell partial (joined, violations,
    min/max ship lag in integer days)."""
    from ..io import count_rows
    from .dedup import _fused_grouped_frames
    from .windows import scaled_num_buckets

    li_path = f"{sf_dir}/lineitem.parquet"
    od_path = f"{sf_dir}/orders.parquet"
    n_buckets = num_buckets or scaled_num_buckets(count_rows(li_path))
    day_us = 86_400_000_000

    def li_proj(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["l_orderkey", "l_shipdate"])
        out = pd.DataFrame(
            {
                "k": df["l_orderkey"].astype("int64"),
                "day": df["l_shipdate"]
                .astype("datetime64[us]")
                .astype("int64")
                // day_us,
                "side": np.zeros(len(df), dtype=np.int8),
            }
        )
        out["__bucket"] = _star_bucket(out["k"].to_numpy(np.int64), n_buckets)
        return out

    def od_proj(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["o_orderkey", "o_orderdate"])
        out = pd.DataFrame(
            {
                "k": df["o_orderkey"].astype("int64"),
                "day": df["o_orderdate"]
                .astype("datetime64[us]")
                .astype("int64")
                // day_us,
                "side": np.ones(len(df), dtype=np.int8),
            }
        )
        out["__bucket"] = _star_bucket(out["k"].to_numpy(np.int64), n_buckets)
        return out

    def check_bucket(g: pd.DataFrame) -> pd.DataFrame:
        li = g[g["side"] == 0][["k", "day"]]
        od = g[g["side"] == 1][["k", "day"]]
        m = li.merge(od, on="k", suffixes=("_s", "_o"))
        if len(m) == 0:
            return pd.DataFrame(
                {
                    "n": pd.Series([0], dtype="int64"),
                    "v": pd.Series([0], dtype="int64"),
                    "mn": pd.Series([np.nan], dtype="float64"),
                    "mx": pd.Series([np.nan], dtype="float64"),
                }
            )
        lag = m["day_s"].to_numpy(np.int64) - m["day_o"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "n": pd.Series([len(m)], dtype="int64"),
                "v": pd.Series([int((lag < 0).sum())], dtype="int64"),
                "mn": pd.Series([float(lag.min())], dtype="float64"),
                "mx": pd.Series([float(lag.max())], dtype="float64"),
            }
        )

    parts = _fused_grouped_frames(
        [
            (li_path, ["l_orderkey", "l_shipdate"], None, li_proj),
            (od_path, ["o_orderkey", "o_orderdate"], None, od_proj),
        ],
        n_buckets,
        check_bucket,
    )
    n = int(parts["n"].sum())
    if n == 0:
        return pd.DataFrame(
            {
                "n_joined": pd.Series([0], dtype="int64"),
                "n_violations": pd.Series([0], dtype="int64"),
                "min_lag_days": [None],
                "max_lag_days": [None],
            }
        )
    return pd.DataFrame(
        {
            "n_joined": pd.Series([n], dtype="int64"),
            "n_violations": pd.Series(
                [int(parts["v"].sum())], dtype="int64"
            ),
            "min_lag_days": pd.Series(
                [int(parts["mn"].min())], dtype="int64"
            ),
            "max_lag_days": pd.Series(
                [int(parts["mx"].max())], dtype="int64"
            ),
        }
    )


ORACLE_SQL: dict[str, str] = {
    "profile_orders": """
        SELECT COUNT(*) AS order_count,
               CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS status_nulls,
               ROUND(fsum(o_totalprice), 2) AS sum_total,
               ROUND(fsum(o_totalprice) / COUNT(o_totalprice), 4) AS avg_total,
               ROUND(MIN(o_totalprice), 4) AS min_total,
               ROUND(MAX(o_totalprice), 4) AS max_total
        FROM orders
    """,
    "agg_lineitem": """
        SELECT ROUND(fsum(l_extendedprice), 2) AS sum_price,
               ROUND(fsum(l_extendedprice) / COUNT(l_extendedprice), 4) AS avg_price,
               ROUND(MIN(l_extendedprice), 4) AS min_price,
               ROUND(MAX(l_extendedprice), 4) AS max_price,
               ROUND(fsum(l_quantity), 4) AS sum_qty,
               ROUND(fsum(l_quantity) / COUNT(l_quantity), 4) AS avg_qty
        FROM lineitem
    """,
    "uniqueness_lineitem": """
        SELECT COUNT(*) AS row_count,
               COUNT(DISTINCT (l_orderkey, l_linenumber)) AS distinct_keys,
               COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS duplicate_rows
        FROM lineitem
    """,
    "dup_part_multisets_lineitem": """
        WITH seq AS (
            SELECT l_orderkey,
                   string_agg(CAST(l_partkey AS VARCHAR), ','
                              ORDER BY l_partkey) AS s
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT COUNT(*) AS orders_checked,
               COUNT(DISTINCT s) AS distinct_multisets,
               COUNT(*) - COUNT(DISTINCT s) AS duplicate_orders
        FROM seq
    """,
    "dup_part_sequences_lineitem": """
        WITH seq AS (
            SELECT l_orderkey,
                   string_agg(CAST(l_partkey AS VARCHAR), ','
                              ORDER BY l_linenumber, l_partkey) AS s
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT COUNT(*) AS orders_checked,
               COUNT(DISTINCT s) AS distinct_sequences,
               COUNT(*) - COUNT(DISTINCT s) AS duplicate_orders
        FROM seq
    """,
    "referential_orders_customer": """
        SELECT (SELECT COUNT(*) FROM orders) AS probed_rows,
               (SELECT COUNT(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey)) AS orphan_rows
    """,
    "referential_lineitem_orders": """
        SELECT (SELECT COUNT(*) FROM lineitem) AS probed_rows,
               (SELECT COUNT(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey)) AS orphan_rows
    """,
    "filter_events_agg": f"""
        SELECT COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS sum_value,
               ROUND(AVG(value), 4) AS avg_value
        FROM events WHERE {FILTER_EVENTS}
    """,
    "ts_stats_events": """
        SELECT COUNT(*) AS n_events,
               MIN(epoch_us(ts)) AS min_epoch_us,
               MAX(epoch_us(ts)) AS max_epoch_us,
               CAST(SUM(epoch_us(ts)) // COUNT(*) AS BIGINT) AS avg_epoch_us
        FROM events
    """,
    "rowhash_customer_self": """
        SELECT COUNT(*) AS compared_rows,
               CAST(SUM(CASE WHEN a.c_name IS DISTINCT FROM b.c_name
                         OR a.c_nationkey IS DISTINCT FROM b.c_nationkey
                         OR a.c_acctbal IS DISTINCT FROM b.c_acctbal
                         OR a.c_mktsegment IS DISTINCT FROM b.c_mktsegment
                    THEN 1 ELSE 0 END) AS BIGINT) AS mismatch_count
        FROM customer a JOIN customer b ON a.c_custkey = b.c_custkey
    """,
    "groupby_lineitem_returnflag": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 4) AS sum_qty,
               ROUND(AVG(l_extendedprice), 4) AS avg_price,
               COUNT(*) AS cnt
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "topk_orders": """
        SELECT o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 10
    """,
    "distinct_event_types": """
        SELECT DISTINCT event_type FROM events ORDER BY event_type
    """,
    "nations_per_region": """
        SELECT r.r_name, COUNT(*) AS n_nations
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name
    """,
    "join_orders_customer": """
        SELECT c_mktsegment,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_total
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "drift_psi_events": """
        WITH bounds AS (
            SELECT MIN(value) AS lo, MAX(value) AS hi,
                   (MAX(value) - MIN(value)) / 10.0 AS width
            FROM events
        ),
        binned AS (
            SELECT event_type,
                   LEAST(GREATEST(CAST(FLOOR((value - lo) / width) AS BIGINT), 0), 9) AS bin
            FROM events, bounds
            WHERE event_type IN ('click', 'view')
        ),
        counts AS (
            SELECT b.bin,
                   SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c_click,
                   SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c_view
            FROM binned b GROUP BY b.bin
        ),
        probs AS (
            SELECT GREATEST(c_click * 1.0 / (SELECT SUM(c_click) FROM counts), 0.000001) AS p,
                   GREATEST(c_view * 1.0 / (SELECT SUM(c_view) FROM counts), 0.000001) AS q
            FROM counts
        )
        SELECT ROUND(SUM((p - q) * LN(p / q)), 4) AS psi FROM probs
    """,
    "custom_orders_by_status": """
        SELECT (SELECT COUNT(*) FROM (SELECT o_orderstatus, COUNT(*) AS n
                                      FROM orders GROUP BY o_orderstatus)) AS source_row_count,
               (SELECT COUNT(*) FROM (SELECT o_orderstatus, COUNT(*) AS n
                                      FROM orders GROUP BY o_orderstatus)) AS target_row_count,
               0 AS rows_missing_in_target,
               0 AS rows_missing_in_source,
               1 AS hashes_equal
    """,
    "group_topk_orders": """
        SELECT o_orderpriority, CAST(rnk AS BIGINT) AS rnk,
               o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice
        FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                     ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                        ORDER BY o_totalprice DESC,
                                                 o_orderkey ASC) AS rnk
              FROM orders)
        WHERE rnk <= 3
        ORDER BY o_orderpriority, rnk
    """,
    "pivot_lineitem_status": """
        SELECT l_returnflag,
               ROUND(fsum(CASE WHEN l_linestatus = 'F'
                          THEN l_extendedprice ELSE 0 END), 2) AS sum_f,
               ROUND(fsum(CASE WHEN l_linestatus = 'O'
                          THEN l_extendedprice ELSE 0 END), 2) AS sum_o,
               CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS cnt_f,
               CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END)
                    AS BIGINT) AS cnt_o
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "grouped_quantile_lineitem": """
        SELECT l_returnflag,
               ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
               ROUND(quantile_cont(l_quantity, 0.95), 4) AS p95_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "mode_quantity_lineitem": """
        WITH c AS (
            SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
            FROM lineitem
            WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
            GROUP BY 1, 2
        ),
        r AS (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY cnt DESC, l_quantity ASC) AS rn
            FROM c
        )
        SELECT l_returnflag, l_quantity AS modal_quantity,
               CAST(cnt AS BIGINT) AS modal_count
        FROM r WHERE rn = 1 ORDER BY l_returnflag
    """,
    "null_profile_orders": """
        WITH u AS (
            SELECT 'o_custkey' AS col, COUNT(*) AS n,
                   SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS z
            FROM orders
            UNION ALL SELECT 'o_orderdate', COUNT(*),
                   SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
            FROM orders
            UNION ALL SELECT 'o_orderkey', COUNT(*),
                   SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
            FROM orders
            UNION ALL SELECT 'o_orderpriority', COUNT(*),
                   SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
            FROM orders
            UNION ALL SELECT 'o_orderstatus', COUNT(*),
                   SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
            FROM orders
            UNION ALL SELECT 'o_totalprice', COUNT(*),
                   SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
            FROM orders
        )
        SELECT col AS "column", CAST(n AS BIGINT) AS n_rows,
               CAST(z AS BIGINT) AS n_nulls,
               ROUND(z * 1.0 / n, 4) AS null_rate
        FROM u ORDER BY col
    """,
    "basket_pairs_lineitem": """
        WITH u AS (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem
            WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
        ),
        pr AS (
            SELECT a.p AS part_a, b.p AS part_b, COUNT(*) AS cnt
            FROM u a JOIN u b ON a.o = b.o AND a.p < b.p
            GROUP BY 1, 2
        )
        SELECT CAST(part_a AS BIGINT) AS part_a,
               CAST(part_b AS BIGINT) AS part_b,
               CAST(cnt AS BIGINT) AS cnt
        FROM pr
        ORDER BY cnt DESC, part_a, part_b LIMIT 20
    """,
    "json_keys_census_events": """
        WITH p AS (SELECT props FROM events WHERE props IS NOT NULL),
        k AS (SELECT unnest(json_keys(props)) AS key FROM p)
        SELECT key, CAST(COUNT(*) AS BIGINT) AS n_rows,
               ROUND(COUNT(*) * 1.0 / (SELECT COUNT(*) FROM p), 4)
                   AS presence_rate
        FROM k GROUP BY key ORDER BY key
    """,
    "chisq_priority_status_orders": """
        WITH c AS (
            SELECT o_orderpriority AS p, o_orderstatus AS s,
                   COUNT(*) AS n
            FROM orders
            WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
            GROUP BY 1, 2
        ),
        rt AS (SELECT p, SUM(n) AS r FROM c GROUP BY p),
        ct AS (SELECT s, SUM(n) AS cl FROM c GROUP BY s),
        tot AS (SELECT SUM(n) AS t FROM c)
        SELECT CAST(tot.t AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               ROUND(fsum(c.n * c.n * tot.t * 1.0 / (rt.r * ct.cl))
                     - tot.t, 4) AS chi2
        FROM c JOIN rt USING (p) JOIN ct USING (s), tot
        GROUP BY tot.t
    """,
    "monthly_activity_union": """
        WITH u AS (
            SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month,
                   'events' AS src
            FROM events WHERE ts IS NOT NULL
            UNION ALL
            SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP),
                   'orders'
            FROM orders WHERE o_orderdate IS NOT NULL
        )
        SELECT month, src, CAST(COUNT(*) AS BIGINT) AS n
        FROM u GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "distinct_users_per_type": """
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_users
        FROM events
        WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        GROUP BY event_type ORDER BY event_type
    """,
    "full_outer_order_profile": """
        WITH c AS (
            SELECT c_custkey AS key FROM customer WHERE c_custkey IS NOT NULL
        ),
        o AS (
            SELECT o_custkey AS key, COUNT(*) AS n
            FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1
        )
        SELECT CAST(COUNT(*) FILTER (
                   WHERE c.key IS NOT NULL AND o.key IS NOT NULL
               ) AS BIGINT) AS n_matched,
               CAST(COUNT(*) FILTER (WHERE o.key IS NULL) AS BIGINT)
                   AS n_customers_without_orders,
               CAST(COUNT(*) FILTER (WHERE c.key IS NULL) AS BIGINT)
                   AS n_orphan_custkeys,
               CAST(COALESCE(SUM(o.n) FILTER (WHERE c.key IS NULL), 0)
                    AS BIGINT) AS n_orphan_orders
        FROM c FULL OUTER JOIN o ON c.key = o.key
    """,
    "reconcile_order_totals": """
        WITH l AS (
            SELECT l_orderkey AS key,
                   SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                  * (1 + l_tax) * 1000000, 0)
                            AS BIGINT)) AS lsum
            FROM lineitem
            WHERE l_orderkey IS NOT NULL AND l_extendedprice IS NOT NULL
              AND l_discount IS NOT NULL AND l_tax IS NOT NULL
            GROUP BY 1
        ),
        o AS (
            SELECT o_orderkey AS key,
                   CAST(ROUND(o_totalprice * 1000000, 0) AS BIGINT) AS osum
            FROM orders WHERE o_orderkey IS NOT NULL
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(COUNT(l.key) AS BIGINT) AS n_with_lineitems,
               CAST(COUNT(*) FILTER (WHERE l.lsum = o.osum) AS BIGINT)
                   AS n_exact_match,
               CAST(COUNT(*) FILTER (WHERE l.lsum <> o.osum) AS BIGINT)
                   AS n_mismatch,
               CAST(COALESCE(MAX(ABS(o.osum - l.lsum)), 0) AS BIGINT)
                   AS max_abs_diff_micro
        FROM o LEFT JOIN l ON o.key = l.key
    """,
    "distinct_users_events": """
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users
        FROM events
    """,
    "rollup_lineitem_cube": """
        SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
               COALESCE(l_linestatus, 'ALL') AS l_linestatus,
               ROUND(fsum(l_extendedprice), 2) AS sum_price,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        ORDER BY l_returnflag, l_linestatus
    """,
    "customer_order_profile": """
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(CASE WHEN o.n IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_without_orders,
               CAST(SUM(COALESCE(o.n, 0)) AS BIGINT) AS total_orders
        FROM customer c
        LEFT JOIN (SELECT o_custkey, COUNT(*) AS n
                   FROM orders GROUP BY o_custkey) o
          ON c.c_custkey = o.o_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "last_event_per_user": """
        WITH last AS (
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        )
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM last WHERE rn = 1
        GROUP BY event_type ORDER BY event_type
    """,
    # hll_users_events: sketch estimate, not SQL-expressible (rows-only;
    # self-audited against the exact bucket-shuffle count)
}

ORACLE_SQL["json_field_agg_events"] = """
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(k) AS n,
           CAST(COALESCE(SUM(k), 0) AS BIGINT) AS sum_k,
           ROUND(SUM(k) * 1.0 / COUNT(k), 4) AS avg_k
    FROM (SELECT event_type,
                 CAST(json_extract(props, '$.k') AS BIGINT) AS k
          FROM events
          WHERE event_type IS NOT NULL)
    GROUP BY event_type
    ORDER BY event_type
"""

ORACLE_SQL["parts_by_brand"] = """
    SELECT p_brand,
           COUNT(*) AS n_parts,
           ROUND(fsum(p_retailprice) / COUNT(p_retailprice), 4) AS avg_price,
           CAST(MAX(p_size) AS BIGINT) AS max_size
    FROM part
    WHERE p_brand IS NOT NULL
    GROUP BY p_brand
    ORDER BY p_brand
"""

ORACLE_SQL["referential_lineitem_supplier"] = """
    SELECT (SELECT COUNT(*) FROM lineitem) AS probed_rows,
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM supplier s
                              WHERE s.s_suppkey = l.l_suppkey)) AS orphan_rows
"""

ORACLE_SQL["revenue_per_nation"] = """
    SELECT n.n_name,
           ROUND(fsum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(DISTINCT l.l_orderkey) AS n_orders
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
"""

ORACLE_SQL["temporal_consistency_lineitem_orders"] = """
    WITH j AS (
        SELECT epoch_us(l.l_shipdate) // 86400000000 AS sd,
               epoch_us(o.o_orderdate) // 86400000000 AS od
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate IS NOT NULL AND o.o_orderdate IS NOT NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_joined,
           CAST(COUNT(*) FILTER (WHERE sd < od) AS BIGINT) AS n_violations,
           CAST(MIN(sd - od) AS BIGINT) AS min_lag_days,
           CAST(MAX(sd - od) AS BIGINT) AS max_lag_days
    FROM j
"""

def rollup_lineitem_flags(sf_dir: str) -> pd.DataFrame:
    """Multi-level ROLLUP in ONE scan: per-(returnflag, linestatus)
    counts and quantity sums plus the per-flag subtotals and the grand
    total — the dashboard aggregate a SQL engine answers with GROUP BY
    ROLLUP. The engine never re-scans per level: the finest-granularity
    integer partials (≤ |flags|×|status| rows per task) are sufficient
    statistics for every coarser level, so the driver derives subtotals
    and the grand total by summing them. GROUPING() markers ride along
    so a genuine NULL flag value can never be confused with a rolled-up
    level. Quantities are CAST to BIGINT with DuckDB's half-away
    rounding before summing, keeping every cell exact-integer."""
    from ._util import round_duck
    from ..shuffle import map_partials

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(["l_returnflag", "l_linestatus", "l_quantity"]).to_pandas()
        df["q"] = round_duck(df["l_quantity"], 0).astype("int64")
        return (
            df.groupby(["l_returnflag", "l_linestatus"], as_index=False, dropna=False)
            .agg(n=("q", "size"), sq=("q", "sum"))
        )

    parts = map_partials(
        f"{sf_dir}/lineitem.parquet",
        ["l_returnflag", "l_linestatus", "l_quantity"],
        None,
        partial,
    )
    cols = ["l_returnflag", "l_linestatus", "g_rf", "g_ls", "n_rows", "sum_qty"]
    if not len(parts):
        return pd.DataFrame(
            {
                "l_returnflag": pd.Series([], dtype="object"),
                "l_linestatus": pd.Series([], dtype="object"),
                "g_rf": pd.Series([], dtype="int64"),
                "g_ls": pd.Series([], dtype="int64"),
                "n_rows": pd.Series([], dtype="int64"),
                "sum_qty": pd.Series([], dtype="int64"),
            }
        )
    fine = parts.groupby(
        ["l_returnflag", "l_linestatus"], as_index=False, dropna=False
    ).agg(n_rows=("n", "sum"), sum_qty=("sq", "sum"))
    fine["g_rf"] = 0
    fine["g_ls"] = 0
    sub = fine.groupby("l_returnflag", as_index=False, dropna=False).agg(
        n_rows=("n_rows", "sum"), sum_qty=("sum_qty", "sum")
    )
    sub["l_linestatus"] = None
    sub["g_rf"] = 0
    sub["g_ls"] = 1
    grand = pd.DataFrame(
        {
            "l_returnflag": [None],
            "l_linestatus": [None],
            "g_rf": [1],
            "g_ls": [1],
            "n_rows": [int(fine["n_rows"].sum())],
            "sum_qty": [int(fine["sum_qty"].sum())],
        }
    )
    out = pd.concat([fine[cols], sub[cols], grand[cols]], ignore_index=True)
    out = out.sort_values(
        ["g_rf", "g_ls", "l_returnflag", "l_linestatus"],
        na_position="last",
        kind="stable",
    ).reset_index(drop=True)
    for c in ("g_rf", "g_ls", "n_rows", "sum_qty"):
        out[c] = out[c].astype("int64")
    return out


_ROLLUP_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY g_rf, g_ls, l_returnflag NULLS LAST, l_linestatus NULLS LAST
"""
ORACLE_SQL["rollup_lineitem_flags"] = _ROLLUP_SQL


QUERIES = {
    "rollup_lineitem_flags": rollup_lineitem_flags,
    "temporal_consistency_lineitem_orders": (
        temporal_consistency_lineitem_orders
    ),
    "profile_orders": profile_orders,
    "agg_lineitem": agg_lineitem,
    "uniqueness_lineitem": uniqueness_lineitem,
    "dup_part_sequences_lineitem": dup_part_sequences_lineitem,
    "dup_part_multisets_lineitem": dup_part_multisets_lineitem,
    "referential_orders_customer": referential_orders_customer,
    "referential_lineitem_orders": referential_lineitem_orders,
    "filter_events_agg": filter_events_agg,
    "ts_stats_events": ts_stats_events,
    "rowhash_customer_self": rowhash_customer_self,
    "groupby_lineitem_returnflag": groupby_lineitem_returnflag,
    "topk_orders": topk_orders,
    "distinct_event_types": distinct_event_types,
    "nations_per_region": nations_per_region,
    "join_orders_customer": join_orders_customer,
    "drift_psi_events": drift_psi_events,
    "custom_orders_by_status": custom_orders_by_status,
    "group_topk_orders": group_topk_orders,
    "pivot_lineitem_status": pivot_lineitem_status,
    "grouped_quantile_lineitem": grouped_quantile_lineitem,
    "mode_quantity_lineitem": mode_quantity_lineitem,
    "full_outer_order_profile": full_outer_order_profile,
    "reconcile_order_totals": reconcile_order_totals,
    "distinct_users_per_type": distinct_users_per_type,
    "monthly_activity_union": monthly_activity_union,
    "json_keys_census_events": json_keys_census_events,
    "chisq_priority_status_orders": chisq_priority_status_orders,
    "basket_pairs_lineitem": basket_pairs_lineitem,
    "null_profile_orders": null_profile_orders,
    "distinct_users_events": distinct_users_events,
    "hll_users_events": hll_users_events,
    "hll_users_per_type_events": hll_users_per_type_events,
    "revenue_per_nation": revenue_per_nation,
    "json_field_agg_events": json_field_agg_events,
    "parts_by_brand": parts_by_brand,
    "referential_lineitem_supplier": referential_lineitem_supplier,
    "rollup_lineitem_cube": rollup_lineitem_cube,
    "last_event_per_user": last_event_per_user,
    "customer_order_profile": customer_order_profile,
}
