"""Data-quality audit operators — the "unconfigured discovery" side of
the validation engine (reference analog: the configured per-task checks
in ``/root/reference/datapact/validator.py``; these ops are the
engine-extension census queries a warehouse team runs BEFORE writing a
suite).

All four follow the repo's exchange discipline: per-batch pre-aggregated
fixed-width integer partials bucket by key hash, each bucket reduces to
a handful of integer cells, the driver merges in Python ints (HUGEINT
mirror). Text / floats never enter an exchange here — every column
shuffled is an int64 key or count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_MULT = np.uint64(0x9E3779B97F4A7C15)


def _bucket(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    return (keys.astype(np.uint64) * _MULT % np.uint64(num_buckets)).astype(
        np.int32
    )


def _buckets_default() -> int:
    from .dedup import _dedup_buckets

    return _dedup_buckets()


def linenumber_integrity_lineitem(
    sf_dir: str, num_buckets: int | None = None
) -> pd.DataFrame:
    """Child-sequence completeness audit: for every order, are its
    ``l_linenumber`` values exactly ``1..n`` — no duplicates, no gaps,
    starting at 1? The classic detail-table integrity check (invoice
    lines, conversation turn indexes) that row counts and uniqueness
    checks individually miss: a deleted middle line keeps the key unique
    and the count plausible but breaks the sequence.

    Shape: per-batch ``(orderkey, linenumber)`` pair counts bucket by
    order-key hash (a key's pairs all land in one bucket, so per-key
    distinct/min/max are globally correct); each bucket folds to FOUR
    integers. NULL key or linenumber rows are excluded on both engines
    (the oracle's WHERE). ``n_with_dup_lines`` counts orders where some
    pair repeats; ``n_with_gaps`` counts orders whose distinct sequence
    is not exactly 1..n_distinct; a clean order is neither."""
    from .dedup import _fused_grouped_frames

    nb = num_buckets or _buckets_default()

    def pair_partials(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["l_orderkey", "l_linenumber"])
        part = (
            df.groupby(["l_orderkey", "l_linenumber"], sort=False)
            .size()
            .reset_index(name="n")
        )
        key = part["l_orderkey"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "key": key,
                "ln": part["l_linenumber"].to_numpy(np.int64),
                "n": part["n"].to_numpy(np.int64),
                "__bucket": _bucket(key, nb),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                [[0, 0, 0, 0]],
                columns=["orders", "dups", "gaps", "clean"],
            )
        pairs = df.groupby(["key", "ln"], as_index=False)["n"].sum()
        g = pairs.groupby("key").agg(
            nd=("ln", "size"),
            mn=("ln", "min"),
            mx=("ln", "max"),
            rows=("n", "sum"),
        )
        dup = g["rows"] > g["nd"]
        gap = (g["mn"] != 1) | (g["mx"] != g["nd"])
        return pd.DataFrame(
            [
                [
                    int(len(g)),
                    int(dup.sum()),
                    int(gap.sum()),
                    int((~dup & ~gap).sum()),
                ]
            ],
            columns=["orders", "dups", "gaps", "clean"],
        )

    parts = _fused_grouped_frames(
        [
            (
                f"{sf_dir}/lineitem.parquet",
                ["l_orderkey", "l_linenumber"],
                None,
                pair_partials,
            )
        ],
        nb,
        fold,
    )
    orders = int(parts["orders"].sum())
    if orders == 0:  # SQL SUM over zero groups is NULL, COUNT is 0
        row = [0, None, None, None]
    else:
        row = [
            orders,
            int(parts["dups"].sum()),
            int(parts["gaps"].sum()),
            int(parts["clean"].sum()),
        ]
    return pd.DataFrame(
        [row],
        columns=[
            "n_orders_checked",
            "n_with_dup_lines",
            "n_with_gaps",
            "n_clean",
        ],
    )


def id_gaps_orders(sf_dir: str, num_buckets: int | None = None) -> pd.DataFrame:
    """Sequence-key continuity census over ``o_orderkey``: exact distinct
    count, min/max, missing keys in the [min, max] span and duplicate
    rows — the audit behind "did the CDC feed drop ids?". Exact NDV at
    any scale: per-batch ``(key, count)`` partials bucket by key hash (a
    key lands whole in one bucket, so bucket NDVs add); each bucket
    reduces to four integers; the driver merges Python ints."""
    from .dedup import _fused_grouped_frames

    nb = num_buckets or _buckets_default()

    def key_partials(batch: pa.Table) -> pd.DataFrame:
        vc = batch.column("o_orderkey").to_pandas().dropna().value_counts()
        key = vc.index.to_numpy(np.int64)
        return pd.DataFrame(
            {
                "key": key,
                "n": vc.to_numpy().astype("int64"),
                "__bucket": _bucket(key, nb),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                [[0, 0, None, None]], columns=["nd", "n", "mn", "mx"]
            )
        g = df.groupby("key", as_index=False)["n"].sum()
        return pd.DataFrame(
            [
                [
                    int(len(g)),
                    int(g["n"].sum()),
                    int(g["key"].min()),
                    int(g["key"].max()),
                ]
            ],
            columns=["nd", "n", "mn", "mx"],
        )

    parts = _fused_grouped_frames(
        [(f"{sf_dir}/orders.parquet", ["o_orderkey"], None, key_partials)],
        nb,
        fold,
    )
    nd = int(parts["nd"].sum())
    n = int(parts["n"].sum())
    mns = [int(v) for v in parts["mn"].dropna()]
    mxs = [int(v) for v in parts["mx"].dropna()]
    if nd == 0:
        row = [0, 0, None, None, None, None]
    else:
        mn, mx = min(mns), max(mxs)
        row = [n, nd, mn, mx, mx - mn + 1 - nd, n - nd]
    return pd.DataFrame(
        [row],
        columns=[
            "n_rows",
            "n_distinct",
            "min_key",
            "max_key",
            "missing_keys",
            "duplicate_rows",
        ],
    )


def fanout_orders_lineitem(
    sf_dir: str, num_buckets: int | None = None
) -> pd.DataFrame:
    """Referential cardinality profile: the distribution of lineitem
    children per order INCLUDING zero-children orders — the 1:N fan-out
    histogram a referential check cannot see (it only reports orphans).
    LEFT JOIN semantics: every orders row appears once; a NULL
    ``o_orderkey`` matches nothing and lands in the fanout-0 cell
    (COALESCE in the oracle); NULL lineitem keys join nothing and drop.

    Shape: both sides pre-aggregate per batch to ``(key, count)``
    partials and bucket by the SAME key hash; each bucket does one
    vectorized left merge and folds to ≤ |distinct fanouts| count rows;
    NULL-key order counts skip the exchange entirely (a per-batch scalar
    added to the fanout-0 cell on the driver)."""
    from .dedup import _fused_grouped_frames

    nb = num_buckets or _buckets_default()

    def order_partials(batch: pa.Table) -> pd.DataFrame:
        s = batch.column("o_orderkey").to_pandas()
        nulls = int(s.isna().sum())
        vc = s.dropna().value_counts()
        key = vc.index.to_numpy(np.int64)
        out = pd.DataFrame(
            {
                "side": np.zeros(len(key), np.int8),
                "key": key,
                "n": vc.to_numpy().astype("int64"),
                "__bucket": _bucket(key, nb),
            }
        )
        if nulls:  # ride the exchange as a sentinel row in bucket 0
            out = pd.concat(
                [
                    out,
                    pd.DataFrame(
                        {
                            "side": [np.int8(2)],
                            "key": [np.int64(0)],
                            "n": [np.int64(nulls)],
                            "__bucket": [np.int32(0)],
                        }
                    ),
                ],
                ignore_index=True,
            )
        return out

    def line_partials(batch: pa.Table) -> pd.DataFrame:
        vc = batch.column("l_orderkey").to_pandas().dropna().value_counts()
        key = vc.index.to_numpy(np.int64)
        return pd.DataFrame(
            {
                "side": np.ones(len(key), np.int8),
                "key": key,
                "n": vc.to_numpy().astype("int64"),
                "__bucket": _bucket(key, nb),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        null_orders = int(df.loc[df["side"] == 2, "n"].sum())
        ords = (
            df[df["side"] == 0].groupby("key", as_index=False)["n"].sum()
        ).rename(columns={"n": "o_rows"})
        lc = (
            df[df["side"] == 1].groupby("key", as_index=False)["n"].sum()
        ).rename(columns={"n": "fanout"})
        merged = ords.merge(lc, on="key", how="left")
        merged["fanout"] = merged["fanout"].fillna(0).astype("int64")
        out = (
            merged.groupby("fanout", as_index=False)["o_rows"]
            .sum()
            .rename(columns={"o_rows": "n_orders"})
        )
        if null_orders:
            out = pd.concat(
                [
                    out,
                    pd.DataFrame({"fanout": [0], "n_orders": [null_orders]}),
                ],
                ignore_index=True,
            )
        return out.astype({"fanout": "int64", "n_orders": "int64"})

    parts = _fused_grouped_frames(
        [
            (f"{sf_dir}/orders.parquet", ["o_orderkey"], None, order_partials),
            (
                f"{sf_dir}/lineitem.parquet",
                ["l_orderkey"],
                None,
                line_partials,
            ),
        ],
        nb,
        fold,
    )
    out = (
        parts.groupby("fanout", as_index=False)["n_orders"]
        .sum()
        .sort_values("fanout")
        .reset_index(drop=True)
    )
    out = out[out["n_orders"] > 0]
    return out.astype({"fanout": "int64", "n_orders": "int64"}).reset_index(
        drop=True
    )


def selfjoin_size_partkey(
    sf_dir: str, num_buckets: int | None = None
) -> pd.DataFrame:
    """Join-size / skew planner statistic: the EXACT row count of the
    lineitem self-equi-join on ``l_partkey`` (Σ c(k)² over per-key
    counts), plus the distinct-key count and the hottest key's row count
    — the numbers a shuffle planner needs to size an exchange and decide
    salting BEFORE running the join. Per-batch ``(key, count)`` partials
    bucket by key hash; each bucket folds to three integers; the driver
    merges Python ints (Σ c² exceeds int64 long after c·n does — the
    driver's big-int merge is the HUGEINT mirror)."""
    from .dedup import _fused_grouped_frames

    nb = num_buckets or _buckets_default()

    def key_partials(batch: pa.Table) -> pd.DataFrame:
        vc = batch.column("l_partkey").to_pandas().dropna().value_counts()
        key = vc.index.to_numpy(np.int64)
        return pd.DataFrame(
            {
                "key": key,
                "n": vc.to_numpy().astype("int64"),
                "__bucket": _bucket(key, nb),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                [[0, 0, 0]], columns=["nk", "sj", "mx"]
            )
        g = df.groupby("key", as_index=False)["n"].sum()
        c = g["n"].to_numpy(np.int64)
        # Σ c² stays in int64 per bucket while every key's c < 3e9;
        # the driver merge below is arbitrary-precision
        return pd.DataFrame(
            [[int(len(g)), int((c * c).sum()), int(c.max())]],
            columns=["nk", "sj", "mx"],
        )

    parts = _fused_grouped_frames(
        [(f"{sf_dir}/lineitem.parquet", ["l_partkey"], None, key_partials)],
        nb,
        fold,
    )
    nk = int(parts["nk"].sum())
    if nk == 0:
        row = [0, None, None]
    else:
        row = [nk, int(parts["sj"].sum()), int(parts["mx"].max())]
    return pd.DataFrame(
        [row], columns=["n_keys", "selfjoin_rows", "max_key_rows"]
    )


def key_set_ops_orders_customer(
    sf_dir: str, num_buckets: int | None = None
) -> pd.DataFrame:
    """Distributed INTERSECT / EXCEPT DISTINCT census between two key
    sets — distinct ``o_custkey`` in orders vs distinct ``c_custkey`` in
    customer: |A∩B| (customers with orders), |A∖B| (orphan order keys —
    the referential failure set), |B∖A| (customers who never ordered),
    plus both set sizes. A key's every occurrence from BOTH tables hash-
    buckets together, so each bucket's set relations are globally
    correct and fold to THREE integers — no distinct-key list ever
    reaches the driver, and the exchange carries per-batch distinct
    (side, key) rows, never raw rows. NULL keys are excluded on both
    sides explicitly (SQL INTERSECT/EXCEPT would otherwise match NULL to
    NULL, unlike every other comparison — the one place set ops and
    joins disagree)."""
    from .dedup import _fused_grouped_frames

    nb = num_buckets or _buckets_default()

    def side_partials(col: str, side: int):
        def partial(batch: pa.Table) -> pd.DataFrame:
            key = np.unique(
                batch.column(col).to_pandas().dropna().to_numpy(np.int64)
            )
            return pd.DataFrame(
                {
                    "side": np.full(len(key), side, dtype=np.int8),
                    "key": key,
                    "__bucket": _bucket(key, nb),
                }
            )

        return partial

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        a = np.unique(df.loc[df["side"] == 0, "key"].to_numpy(np.int64))
        b = np.unique(df.loc[df["side"] == 1, "key"].to_numpy(np.int64))
        both = len(np.intersect1d(a, b, assume_unique=True))
        return pd.DataFrame(
            [[both, len(a) - both, len(b) - both]],
            columns=["both", "only_a", "only_b"],
        )

    parts = _fused_grouped_frames(
        [
            (
                f"{sf_dir}/orders.parquet",
                ["o_custkey"],
                None,
                side_partials("o_custkey", 0),
            ),
            (
                f"{sf_dir}/customer.parquet",
                ["c_custkey"],
                None,
                side_partials("c_custkey", 1),
            ),
        ],
        nb,
        fold,
    )
    both = int(parts["both"].sum())
    only_a = int(parts["only_a"].sum())
    only_b = int(parts["only_b"].sum())
    return pd.DataFrame(
        [[both + only_a, both + only_b, both, only_a, only_b]],
        columns=[
            "n_orders_keys",
            "n_customer_keys",
            "n_intersect",
            "n_only_orders",
            "n_only_customer",
        ],
    ).astype("int64")


def domain_conformance_lineitem(sf_dir: str) -> pd.DataFrame:
    """Column-domain conformance census — the rule set a DataPact-style
    suite would configure per column, computed for ALL rules in ONE
    scan: range gates on quantity/discount/tax, enum gates on the flag
    columns, null keys. Each scan task evaluates every rule vectorized
    and emits one (rule → violation count) partial row; the driver
    merges and derives rates. Violation_rate = violations/rows, one
    division over exact integers."""
    from ..shuffle import map_partials
    from ._util import round_duck

    cols = [
        "l_orderkey",
        "l_quantity",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
    ]

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        n = len(df)
        q = df["l_quantity"]
        d = df["l_discount"]
        t = df["l_tax"]
        rf = df["l_returnflag"]
        ls = df["l_linestatus"]
        viol = {
            "null_orderkey": int(df["l_orderkey"].isna().sum()),
            "quantity_range": int(
                (q.isna() | (q < 1) | (q > 50)).sum()
            ),
            "discount_range": int(
                (d.isna() | (d < 0) | (d > 0.1)).sum()
            ),
            "tax_range": int((t.isna() | (t < 0) | (t > 0.08)).sum()),
            "returnflag_enum": int(
                (~rf.isin(["A", "N", "R"]) | rf.isna()).sum()
            ),
            "linestatus_enum": int((~ls.isin(["O", "F"]) | ls.isna()).sum()),
        }
        out = pd.DataFrame(
            {"rule": list(viol), "n_violations": list(viol.values())}
        )
        out["n_rows"] = n
        return out

    parts = map_partials(f"{sf_dir}/lineitem.parquet", cols, None, partial)
    g = parts.groupby("rule", as_index=False).agg(
        n_violations=("n_violations", "sum"), n_rows=("n_rows", "sum")
    )
    g["n_violations"] = g["n_violations"].astype("int64")
    g["n_rows"] = g["n_rows"].astype("int64")
    g["violation_rate"] = [
        float(round_duck(v * 1.0 / r, 6)) if r else None
        for v, r in zip(g["n_violations"], g["n_rows"])
    ]
    return g.sort_values("rule").reset_index(drop=True)


# conditional (implication) rule table: (name, when, then). The
# predicate strings are the engine's filter mini-language (expr.py),
# whose subset used here is ALSO valid DuckDB SQL — the oracle below is
# GENERATED from the same tuples so the two sides cannot drift. Shared
# with the suite-level `conditional_validations` check (config.py),
# which evaluates the same semantics on the fused profile scan.
_COND_RULES_ORDERS: tuple[tuple[str, str, str], ...] = (
    ("f_price_positive", "o_orderstatus = 'F'", "o_totalprice > 0"),
    ("p_price_capped", "o_orderstatus = 'P'", "o_totalprice < 300000"),
    (
        "urgent_price_capped",
        "o_orderpriority = '1-URGENT'",
        "o_totalprice < 400000",
    ),
)


def conditional_rules_orders(sf_dir: str) -> pd.DataFrame:
    """Cross-column implication audit (WHEN p THEN q): for each rule,
    rows matched by ``when`` and rows among them violating ``then``
    (``when AND NOT then`` — a NULL ``then`` outcome is not a violation,
    matching SQL filter semantics). All rules evaluate in ONE scan as
    two vectorized Arrow filters per rule per batch; each task emits one
    3-integer row per rule, the driver merges exact ints and derives the
    rate with one division. The CHECK-constraint shape that single-column
    range/enum gates (``domain_conformance_lineitem``) cannot express."""
    from ..expr import compile_to_arrow, parse_filter
    from ..shuffle import map_partials
    from ._util import round_duck

    compiled = [
        (
            name,
            compile_to_arrow(parse_filter(when)),
            compile_to_arrow(parse_filter(f"({when}) AND NOT ({then})")),
        )
        for name, when, then in _COND_RULES_ORDERS
    ]
    cols = ["o_orderstatus", "o_orderpriority", "o_totalprice"]

    def partial(batch: pa.Table) -> pd.DataFrame:
        rows = [
            (name, batch.filter(w).num_rows, batch.filter(v).num_rows)
            for name, w, v in compiled
        ]
        return pd.DataFrame(
            rows, columns=["rule", "matched_rows", "violations"]
        )

    parts = map_partials(f"{sf_dir}/orders.parquet", cols, None, partial)
    g = parts.groupby("rule", as_index=False).agg(
        matched_rows=("matched_rows", "sum"), violations=("violations", "sum")
    )
    g["matched_rows"] = g["matched_rows"].astype("int64")
    g["violations"] = g["violations"].astype("int64")
    g["violation_rate"] = [
        float(round_duck(v * 1.0 / m, 6)) if m else None
        for m, v in zip(g["matched_rows"], g["violations"])
    ]
    return g.sort_values("rule").reset_index(drop=True)


def _cond_rules_oracle() -> str:
    arms = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS rule,"
        f" COUNT(*) FILTER (WHERE {when}) AS matched_rows,"
        f" COUNT(*) FILTER (WHERE ({when}) AND NOT ({then})) AS violations"
        " FROM orders"
        for name, when, then in _COND_RULES_ORDERS
    )
    return f"""
SELECT rule, matched_rows, violations,
       CASE WHEN matched_rows = 0 THEN NULL
            ELSE ROUND(violations * 1.0 / matched_rows, 6) END
         AS violation_rate
FROM ({arms})
ORDER BY rule
"""


def freshness_events(sf_dir: str) -> pd.DataFrame:
    """Freshness / staleness SLA audit anchored on the table's own
    watermark (max ts — deterministic, no wall clock): event counts in
    the trailing 1 / 7 / 30 days ending at the watermark. The check a
    validation platform runs to answer "is this feed still flowing, and
    at what rate?" Two scan-shaped passes, both footer-assisted: the
    watermark comes from row-group max statistics (no data read) and the
    trailing-window counts are one partial-sum wave."""
    from ..io import footer_column_minmax, list_parquet_files
    from ..shuffle import map_partials

    files = list_parquet_files(f"{sf_dir}/events.parquet")
    mm = footer_column_minmax(files, "ts")
    if mm is None or mm[1] is None:
        return pd.DataFrame(
            {
                "n_last_day": pd.Series([], dtype="int64"),
                "n_last_week": pd.Series([], dtype="int64"),
                "n_last_month": pd.Series([], dtype="int64"),
            }
        )
    wm = np.datetime64(mm[1], "us").astype(np.int64)
    day = np.int64(86_400_000_000)

    def partial(batch: pa.Table) -> pd.DataFrame:
        ts = batch.to_pandas()["ts"].dropna().astype("int64").to_numpy()
        return pd.DataFrame(
            {
                "n_last_day": [int((ts > wm - day).sum())],
                "n_last_week": [int((ts > wm - 7 * day).sum())],
                "n_last_month": [int((ts > wm - 30 * day).sum())],
            }
        )

    parts = map_partials(f"{sf_dir}/events.parquet", ["ts"], None, partial)
    return pd.DataFrame(
        {
            "n_last_day": [int(parts["n_last_day"].sum())],
            "n_last_week": [int(parts["n_last_week"].sum())],
            "n_last_month": [int(parts["n_last_month"].sum())],
        }
    )


def benford_first_digit_totalprice(sf_dir: str) -> pd.DataFrame:
    """Benford first-digit audit over order totals — the classic
    fabricated-data / quality screen: observed first-significant-digit
    shares vs Benford's law, with the chi-square distance. Digit
    extraction is exact (FLOOR to integer, first character of its
    decimal string — no float log10 boundary risk); expected shares are
    LN(1+1/d)/LN(10) and chi² = Σ (obs−exp)²/exp over the SAME
    expression tree in both engines. One scan, 9-cell partials."""
    import math

    from ..shuffle import map_partials
    from ._util import round_duck

    def partial(batch: pa.Table) -> pd.DataFrame:
        x = batch.to_pandas()["o_totalprice"].dropna()
        x = x[x >= 1.0]
        if not len(x):
            return pd.DataFrame(
                {
                    "digit": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        first = (
            np.floor(x.to_numpy(np.float64))
            .astype(np.int64)
            .astype("U1")  # first char of the integer's decimal string
            .astype(np.int64)
        )
        vc = pd.Series(first).value_counts()
        return pd.DataFrame(
            {
                "digit": vc.index.to_numpy(np.int64),
                "n": vc.to_numpy().astype("int64"),
            }
        )

    parts = map_partials(
        f"{sf_dir}/orders.parquet", ["o_totalprice"], None, partial
    )
    if len(parts) == 0:
        return pd.DataFrame(
            {
                "digit": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
                "observed_share": pd.Series([], dtype="float64"),
                "benford_share": pd.Series([], dtype="float64"),
                "chi2_term": pd.Series([], dtype="float64"),
            }
        )
    g = parts.groupby("digit", as_index=False)["n"].sum()
    g["n"] = g["n"].astype("int64")
    total = int(g["n"].sum())
    rows = []
    for d, n in zip(g["digit"], g["n"]):
        obs = n * 1.0 / total
        exp = math.log(1.0 + 1.0 / int(d)) / math.log(10.0)
        chi = (obs - exp) * (obs - exp) / exp
        rows.append(
            (
                int(d),
                int(n),
                float(round_duck(obs, 6)),
                float(round_duck(exp, 6)),
                float(round_duck(chi, 8)),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["digit", "n", "observed_share", "benford_share", "chi2_term"],
    ).sort_values("digit").reset_index(drop=True)


def fd_audit_part_brand_type(sf_dir: str) -> pd.DataFrame:
    """Functional-dependency discovery audit: does ``p_brand``
    determine ``p_type``? The schema-inference check a warehouse team
    runs before declaring a column redundant / denormalized (reference
    analog: the per-task configured checks in
    ``/root/reference/datapact/validator.py`` have no FD rule — this is
    the census that tells you whether one is worth configuring).

    Reports the distinct LHS count, how many LHS values map to more
    than one RHS (FD violations), the rows living under violating LHS
    values, and the worst fan-out. NULL on either side is excluded on
    both engines (SQL GROUP BY semantics would otherwise bucket NULLs).

    Shape: per-batch (brand, type) pair counts — the pair vocabulary is
    bounded (brands × types), so each scan task's partial is tiny and
    the driver merge is vocabulary-sized, never data-sized. No shuffle.
    """
    from ..shuffle import map_partials

    def pair_partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["p_brand", "p_type"])
        if not len(df):
            return pd.DataFrame({"b": [], "t": [], "n": []})
        g = df.groupby(["p_brand", "p_type"], sort=False).size()
        out = g.reset_index()
        out.columns = ["b", "t", "n"]
        return out

    parts = map_partials(
        f"{sf_dir}/part.parquet", ["p_brand", "p_type"], None, pair_partial
    )
    if not len(parts):
        return pd.DataFrame(
            {
                "n_lhs": pd.Series([0], dtype="int64"),
                "n_violating_lhs": pd.Series([None], dtype="object"),
                "n_violating_rows": pd.Series([None], dtype="object"),
                "max_rhs_per_lhs": pd.Series([None], dtype="object"),
            }
        )
    g = parts.groupby(["b", "t"], sort=False)["n"].sum().reset_index()
    per_lhs = g.groupby("b").agg(k=("t", "nunique"), n=("n", "sum"))
    return pd.DataFrame(
        {
            "n_lhs": [int(len(per_lhs))],
            "n_violating_lhs": [int((per_lhs["k"] > 1).sum())],
            "n_violating_rows": [int(per_lhs.loc[per_lhs["k"] > 1, "n"].sum())],
            "max_rhs_per_lhs": [int(per_lhs["k"].max())],
        }
    )


def derived_column_audit_documents(sf_dir: str) -> pd.DataFrame:
    """Derived-column consistency audit: is the materialized
    ``n_chars`` column actually ``LENGTH(text)``? The stored-vs-derived
    integrity check every table with a denormalized convenience column
    needs (stale backfills and truncating writers break it silently —
    row counts, null rates and uniqueness all stay green).

    One vectorized scan; each task folds to a THREE-integer partial
    (rows checked, violations, max |stored − derived|). Rows where
    either side is NULL are excluded on both engines (a NULL derived
    column is the null-rate check's job, not this one's). pandas
    ``str.len`` and DuckDB ``LENGTH`` both count code points, so the
    comparison is exact."""
    from ..shuffle import map_partials

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["text", "n_chars"])
        if not len(df):
            return pd.DataFrame(
                {"n_checked": [0], "n_violations": [0], "max_abs_diff": [0]}
            )
        diff = (
            df["n_chars"].astype(np.int64).to_numpy()
            - df["text"].astype(str).str.len().to_numpy().astype(np.int64)
        )
        return pd.DataFrame(
            {
                "n_checked": [len(df)],
                "n_violations": [int((diff != 0).sum())],
                "max_abs_diff": [int(np.abs(diff).max())],
            }
        )

    parts = map_partials(
        f"{sf_dir}/documents.parquet", ["text", "n_chars"], None, partial
    )
    n = int(parts["n_checked"].sum()) if len(parts) else 0
    if n == 0:
        return pd.DataFrame(
            {
                "n_checked": pd.Series([0], dtype="int64"),
                "n_violations": pd.Series([None], dtype="object"),
                "max_abs_diff": pd.Series([None], dtype="object"),
            }
        )
    return pd.DataFrame(
        {
            "n_checked": [n],
            "n_violations": [int(parts["n_violations"].sum())],
            "max_abs_diff": [int(parts["max_abs_diff"].max())],
        }
    )


def charclass_census_documents(sf_dir: str) -> pd.DataFrame:
    """Per-language character-class census — the encoding-QA screen that
    catches mojibake, double-encoded UTF-8, digit-heavy boilerplate and
    markup bleed before any tokenizer sees the corpus. Classes are
    explicit ASCII codepoint ranges (letters, digits, the space, ASCII
    punctuation) plus an "other" bucket (newlines, tabs, every
    non-ASCII codepoint), so engine and oracle cannot disagree on
    membership: the engine classifies the UTF-32 view of each batch's
    concatenated text with numpy range masks, the oracle counts
    codepoints surviving ``regexp_replace`` with the same ranges
    (DuckDB LENGTH is codepoints, matching the UTF-32 view exactly).

    Shape: one scan; each task joins its batch's text ONCE per lang
    (C-level concat), classifies the codepoint array vectorized, and
    folds to ≤ |langs| seven-integer rows. Nothing but those partials
    reaches the driver."""
    from ..shuffle import map_partials

    cols = ["n_docs", "total_chars", "letters", "digits", "spaces",
            "punct", "other"]

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["text"])
        if not len(df):
            return pd.DataFrame({c: [] for c in ["lang"] + cols})
        rows = []
        for lang, grp in df.groupby("lang", sort=False, dropna=False):
            s = "".join(grp["text"].astype(str).tolist())
            c = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
            letters = int(
                (((c >= 65) & (c <= 90)) | ((c >= 97) & (c <= 122))).sum()
            )
            digits = int(((c >= 48) & (c <= 57)).sum())
            spaces = int((c == 32).sum())
            punct = int(
                (
                    ((c >= 33) & (c <= 47))
                    | ((c >= 58) & (c <= 64))
                    | ((c >= 91) & (c <= 96))
                    | ((c >= 123) & (c <= 126))
                ).sum()
            )
            total = int(c.size)
            rows.append(
                (lang, len(grp), total, letters, digits, spaces, punct,
                 total - letters - digits - spaces - punct)
            )
        return pd.DataFrame(rows, columns=["lang"] + cols)

    parts = map_partials(
        f"{sf_dir}/documents.parquet", ["lang", "text"], None, partial
    )
    if not len(parts):
        return pd.DataFrame(
            {"lang": pd.Series([], dtype="object"),
             **{c: pd.Series([], dtype="int64") for c in cols}}
        )
    out = parts.groupby("lang", as_index=False, dropna=False)[cols].sum()
    for c in cols:
        out[c] = out[c].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


_CHARCLASS_SQL = r"""
    WITH d AS (
        SELECT lang, text, LENGTH(text) AS total FROM documents
        WHERE text IS NOT NULL
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(total) AS BIGINT) AS total_chars,
           CAST(SUM(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')))
               AS BIGINT) AS letters,
           CAST(SUM(LENGTH(regexp_replace(text, '[^0-9]', '', 'g')))
               AS BIGINT) AS digits,
           CAST(SUM(LENGTH(regexp_replace(text, '[^ ]', '', 'g')))
               AS BIGINT) AS spaces,
           CAST(SUM(LENGTH(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g')))
               AS BIGINT) AS punct,
           CAST(SUM(total
                    - LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                    - LENGTH(regexp_replace(text, '[^0-9]', '', 'g'))
                    - LENGTH(regexp_replace(text, '[^ ]', '', 'g'))
                    - LENGTH(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g')))
               AS BIGINT) AS other
    FROM d GROUP BY lang ORDER BY lang
"""


def label_balance_embeddings(sf_dir: str) -> pd.DataFrame:
    """Class-balance audit over the embedding labels — the first number
    a training run needs before weighting losses or resampling: per
    label, its row count, corpus share, and entropy contribution
    −p·ln(p) (their sum is the label entropy; uniform labels maximize
    it, a collapsed labelling drives it to 0).

    One scan to ≤ |labels| (label, n) integer partials; share and the
    entropy term are each built from exact integers with the oracle's
    expression tree (one CAST/CAST divide, one LN, one multiply), so
    the doubles hash identically. NULL labels are excluded on both
    engines (SQL GROUP BY would keep them; a NULL class is a lineage
    bug, surfaced by the count gap against total rows, not a class)."""
    import math

    from ..shuffle import map_partials

    def partial(batch: pa.Table) -> pd.DataFrame:
        lab = batch.column("label").to_pandas().dropna()
        if not len(lab):
            return pd.DataFrame({"label": [], "n": []})
        vc = lab.astype("int64").value_counts()
        return pd.DataFrame(
            {"label": vc.index.to_numpy(), "n": vc.to_numpy()}
        )

    parts = map_partials(
        f"{sf_dir}/embeddings.parquet", ["label"], None, partial
    )
    empty = pd.DataFrame(
        {
            "label": pd.Series([], dtype="int64"),
            "n_vecs": pd.Series([], dtype="int64"),
            "share": pd.Series([], dtype="float64"),
            "neg_p_ln_p": pd.Series([], dtype="float64"),
        }
    )
    if not len(parts):
        return empty
    g = parts.groupby("label", as_index=False)["n"].sum()
    total = int(g["n"].sum())
    if total == 0:
        return empty
    # CAST(n AS DOUBLE) / CAST(total AS DOUBLE), then -(p * LN(p)) —
    # the oracle's exact trees
    p = np.array([float(int(n)) / float(total) for n in g["n"]])
    out = pd.DataFrame(
        {
            "label": g["label"].astype("int64"),
            "n_vecs": g["n"].astype("int64"),
            "share": p,
            "neg_p_ln_p": [-(x * math.log(x)) for x in p],
        }
    )
    return out.sort_values("label").reset_index(drop=True)


_LABEL_BALANCE_SQL = """
    WITH g AS (
        SELECT label, COUNT(*) AS n FROM embeddings
        WHERE label IS NOT NULL GROUP BY label
    ), t AS (SELECT SUM(n) AS total FROM g)
    SELECT CAST(g.label AS BIGINT) AS label,
           CAST(g.n AS BIGINT) AS n_vecs,
           CAST(g.n AS DOUBLE) / CAST(t.total AS DOUBLE) AS share,
           -((CAST(g.n AS DOUBLE) / CAST(t.total AS DOUBLE))
             * LN(CAST(g.n AS DOUBLE) / CAST(t.total AS DOUBLE)))
               AS neg_p_ln_p
    FROM g CROSS JOIN t ORDER BY label
"""


def boilerplate_ngrams_documents(
    sf_dir: str, n: int = 3, k: int = 20
) -> pd.DataFrame:
    """Boilerplate / template detector (the C4-style cleaning screen):
    the top-k word ``n``-grams by DOCUMENT frequency — phrases repeated
    verbatim across many documents are navigation chrome, license
    footers, cookie banners; their df (not their raw frequency, which a
    single spammy doc can inflate) is what decides a removal list.

    Each scan task builds gram strings from shifted flat-token arrays
    (one vectorized concat per offset, no per-doc loop), dedups
    (doc, gram) inside the batch (documents never span batches, so
    per-batch doc-distinct counts sum exactly) and ships (gram, cnt)
    partials into the gram-hash bucket top-k exchange: a gram lives
    wholly in one bucket, so per-bucket sums are the exact global df and
    the global top-k is within the union of per-bucket top-k — the
    driver merges ≤ buckets×k candidate rows regardless of how many
    distinct grams the corpus has."""
    from .dedup import _dedup_buckets
    from .text import _bucket_of_keys, _topk_by_count_fused

    nb = _dedup_buckets()

    def projector(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["doc_id", "text"])
        toks = df["text"].astype(str).str.split(" ")
        counts = toks.str.len().to_numpy()
        flat = toks.explode().to_numpy()
        d = np.repeat(df["doc_id"].to_numpy(), counts)
        m = len(flat)
        if m < n:
            return pd.DataFrame(
                {
                    "gram": pd.Series([], dtype="object"),
                    "cnt": pd.Series([], dtype="int64"),
                    "__bucket": pd.Series([], dtype="int32"),
                }
            )
        gram = pd.Series(flat[: m - n + 1], dtype="object")
        for j in range(1, n):
            gram = gram + " " + pd.Series(flat[j : m - n + 1 + j], dtype="object")
        # a gram is valid only when all n tokens belong to one document
        within = d[: m - n + 1] == d[n - 1 :]
        pairs = pd.DataFrame(
            {"d": d[: m - n + 1][within], "gram": gram.to_numpy()[within]}
        ).drop_duplicates()
        vc = pairs["gram"].value_counts()
        out = pd.DataFrame(
            {
                "gram": vc.index.to_numpy().astype(str),
                "cnt": vc.to_numpy().astype("int64"),
            }
        )
        out["__bucket"] = _bucket_of_keys(out["gram"], nb)
        return out

    top = _topk_by_count_fused(
        f"{sf_dir}/documents.parquet",
        ["doc_id", "text"],
        projector,
        "gram",
        k,
        nb,
    )
    return top.rename(columns={"cnt": "df"})


def _boilerplate_sql(n: int = 3, k: int = 20) -> str:
    return f"""
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS words FROM documents
            WHERE text IS NOT NULL AND doc_id IS NOT NULL
        ),
        g AS (
            SELECT doc_id,
                   array_to_string(
                       words[CAST(i AS INT):CAST(i + {n - 1} AS INT)], ' '
                   ) AS gram
            FROM w, UNNEST(range(1, len(words) - {n - 2})) AS t(i)
        ),
        d AS (SELECT DISTINCT doc_id, gram FROM g),
        c AS (SELECT gram, COUNT(*) AS cnt FROM d GROUP BY gram)
        SELECT gram, CAST(cnt AS BIGINT) AS df
        FROM c ORDER BY cnt DESC, gram ASC LIMIT {k}
    """


ORACLE_SQL: dict[str, str] = {
    "charclass_census_documents": _CHARCLASS_SQL,
    "conditional_rules_orders": _cond_rules_oracle(),
    "boilerplate_ngrams_documents": _boilerplate_sql(),
    "label_balance_embeddings": _LABEL_BALANCE_SQL,
    "fd_audit_part_brand_type": """
        WITH g AS (
            SELECT p_brand,
                   COUNT(DISTINCT p_type) AS k,
                   COUNT(*) AS n
            FROM part
            WHERE p_brand IS NOT NULL AND p_type IS NOT NULL
            GROUP BY 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_lhs,
               CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violating_lhs,
               CAST(SUM(CASE WHEN k > 1 THEN n ELSE 0 END) AS BIGINT)
                   AS n_violating_rows,
               CAST(MAX(k) AS BIGINT) AS max_rhs_per_lhs
        FROM g
    """,
    "derived_column_audit_documents": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_checked,
               CAST(SUM(CASE WHEN n_chars <> LENGTH(text)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
               CAST(MAX(ABS(n_chars - LENGTH(text))) AS BIGINT)
                   AS max_abs_diff
        FROM documents
        WHERE text IS NOT NULL AND n_chars IS NOT NULL
    """,
    "domain_conformance_lineitem": """
        WITH n AS (SELECT COUNT(*) AS total FROM lineitem),
        v AS (
            SELECT 'null_orderkey' AS rule,
                   SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS nv
            FROM lineitem
            UNION ALL
            SELECT 'quantity_range',
                   SUM(CASE WHEN l_quantity IS NULL OR l_quantity < 1
                            OR l_quantity > 50 THEN 1 ELSE 0 END)
            FROM lineitem
            UNION ALL
            SELECT 'discount_range',
                   SUM(CASE WHEN l_discount IS NULL OR l_discount < 0
                            OR l_discount > 0.1 THEN 1 ELSE 0 END)
            FROM lineitem
            UNION ALL
            SELECT 'tax_range',
                   SUM(CASE WHEN l_tax IS NULL OR l_tax < 0
                            OR l_tax > 0.08 THEN 1 ELSE 0 END)
            FROM lineitem
            UNION ALL
            SELECT 'returnflag_enum',
                   SUM(CASE WHEN l_returnflag IS NULL
                            OR l_returnflag NOT IN ('A','N','R')
                            THEN 1 ELSE 0 END)
            FROM lineitem
            UNION ALL
            SELECT 'linestatus_enum',
                   SUM(CASE WHEN l_linestatus IS NULL
                            OR l_linestatus NOT IN ('O','F')
                            THEN 1 ELSE 0 END)
            FROM lineitem
        )
        SELECT rule,
               CAST(nv AS BIGINT) AS n_violations,
               CAST(n.total AS BIGINT) AS n_rows,
               ROUND(nv * 1.0 / n.total, 6) AS violation_rate
        FROM v CROSS JOIN n
        ORDER BY rule
    """,
    "freshness_events": """
        WITH wm AS (SELECT MAX(ts) AS m FROM events)
        SELECT
            CAST(SUM(CASE WHEN ts > m - INTERVAL 1 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_last_day,
            CAST(SUM(CASE WHEN ts > m - INTERVAL 7 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_last_week,
            CAST(SUM(CASE WHEN ts > m - INTERVAL 30 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_last_month
        FROM events CROSS JOIN wm
        WHERE ts IS NOT NULL
    """,
    "benford_first_digit_totalprice": """
        WITH d AS (
            SELECT CAST(left(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                                  AS VARCHAR), 1) AS BIGINT) AS digit
            FROM orders
            WHERE o_totalprice IS NOT NULL AND o_totalprice >= 1.0
        ), g AS (
            SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit
        ), t AS (SELECT SUM(n) AS total FROM g)
        SELECT digit, n,
               ROUND(n * 1.0 / t.total, 6) AS observed_share,
               ROUND(LN(1.0 + 1.0 / digit) / LN(10.0), 6) AS benford_share,
               ROUND((n * 1.0 / t.total - LN(1.0 + 1.0 / digit) / LN(10.0))
                     * (n * 1.0 / t.total - LN(1.0 + 1.0 / digit) / LN(10.0))
                     / (LN(1.0 + 1.0 / digit) / LN(10.0)), 8) AS chi2_term
        FROM g CROSS JOIN t
        ORDER BY digit
    """,
    "key_set_ops_orders_customer": """
        WITH a AS (
            SELECT DISTINCT o_custkey AS k FROM orders
            WHERE o_custkey IS NOT NULL
        ),
        b AS (
            SELECT DISTINCT c_custkey AS k FROM customer
            WHERE c_custkey IS NOT NULL
        )
        SELECT (SELECT COUNT(*) FROM a) AS n_orders_keys,
               (SELECT COUNT(*) FROM b) AS n_customer_keys,
               (SELECT COUNT(*) FROM
                   (SELECT k FROM a INTERSECT SELECT k FROM b))
                   AS n_intersect,
               (SELECT COUNT(*) FROM
                   (SELECT k FROM a EXCEPT SELECT k FROM b))
                   AS n_only_orders,
               (SELECT COUNT(*) FROM
                   (SELECT k FROM b EXCEPT SELECT k FROM a))
                   AS n_only_customer
    """,
    "linenumber_integrity_lineitem": """
        WITH g AS (
            SELECT l_orderkey AS k,
                   COUNT(*) AS n,
                   COUNT(DISTINCT l_linenumber) AS nd,
                   MIN(l_linenumber) AS mn,
                   MAX(l_linenumber) AS mx
            FROM lineitem
            WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
            GROUP BY 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orders_checked,
               CAST(SUM(CASE WHEN n > nd THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_with_dup_lines,
               CAST(SUM(CASE WHEN mn <> 1 OR mx <> nd THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_with_gaps,
               CAST(SUM(CASE WHEN n = nd AND mn = 1 AND mx = nd
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
        FROM g
    """,
    "id_gaps_orders": """
        SELECT CAST(COUNT(o_orderkey) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
               CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
               CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
               CAST(MAX(o_orderkey) - MIN(o_orderkey) + 1
                    - COUNT(DISTINCT o_orderkey) AS BIGINT) AS missing_keys,
               CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey)
                    AS BIGINT) AS duplicate_rows
        FROM orders
    """,
    "fanout_orders_lineitem": """
        WITH lc AS (
            SELECT l_orderkey AS k, COUNT(*) AS n
            FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1
        )
        SELECT CAST(COALESCE(lc.n, 0) AS BIGINT) AS fanout,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders LEFT JOIN lc ON o_orderkey = lc.k
        GROUP BY 1 ORDER BY 1
    """,
    "selfjoin_size_partkey": """
        WITH c AS (
            SELECT l_partkey AS k, COUNT(*) AS n
            FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(n * n) AS BIGINT) AS selfjoin_rows,
               CAST(MAX(n) AS BIGINT) AS max_key_rows
        FROM c
    """,
}

QUERIES = {
    "charclass_census_documents": charclass_census_documents,
    "boilerplate_ngrams_documents": boilerplate_ngrams_documents,
    "label_balance_embeddings": label_balance_embeddings,
    "fd_audit_part_brand_type": fd_audit_part_brand_type,
    "derived_column_audit_documents": derived_column_audit_documents,
    "linenumber_integrity_lineitem": linenumber_integrity_lineitem,
    "id_gaps_orders": id_gaps_orders,
    "fanout_orders_lineitem": fanout_orders_lineitem,
    "selfjoin_size_partkey": selfjoin_size_partkey,
    "key_set_ops_orders_customer": key_set_ops_orders_customer,
    "domain_conformance_lineitem": domain_conformance_lineitem,
    "conditional_rules_orders": conditional_rules_orders,
    "freshness_events": freshness_events,
    "benford_first_digit_totalprice": benford_first_digit_totalprice,
}
