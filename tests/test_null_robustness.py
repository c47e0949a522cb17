"""NULL semantics of the partial-aggregation operators, vs DuckDB on
null-injected data: SUM/AVG skip NULLs (a NaN reaching fsum poisons the
whole total), COUNT(*) counts every row, ORDER BY DESC puts NULLs last.
The driver fixture has no NULLs in these columns, so this is the only
place these paths are exercised."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from datapact_ray.pipelines.relational import (
    group_topk_orders,
    groupby_lineitem_returnflag,
    grouped_quantile_lineitem,
    pivot_lineitem_status,
    rollup_lineitem_cube,
    topk_orders,
)
from datapact_ray.pipelines.selection import exact_quantile_extendedprice


@pytest.fixture(scope="module")
def null_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nulls")
    rng = np.random.default_rng(17)
    n = 6000
    li = pd.DataFrame(
        {
            "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n)],
            "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n)],
            "l_quantity": rng.integers(1, 51, n).astype("float64"),
            "l_extendedprice": np.round(rng.uniform(900, 105000, n), 2),
        }
    )
    li.loc[rng.random(n) < 0.15, "l_quantity"] = np.nan
    li.loc[rng.random(n) < 0.15, "l_extendedprice"] = np.nan
    li.to_parquet(d / "lineitem.parquet", row_group_size=512)

    m = 4000
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(m, dtype="int64"),
            "o_orderpriority": np.array(["1-URGENT", "2-HIGH"])[
                rng.integers(0, 2, m)
            ],
            "o_totalprice": np.round(rng.uniform(1000, 400000, m), 2),
        }
    )
    orders.loc[rng.random(m) < 0.2, "o_totalprice"] = np.nan
    orders.to_parquet(d / "orders.parquet", row_group_size=512)
    return str(d)


def _duck(sql: str, d: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _assert_eq(got: pd.DataFrame, want: pd.DataFrame, name: str):
    got = got.reset_index(drop=True)
    want = want.reset_index(drop=True)
    assert list(got.columns) == list(want.columns), name
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9)


def test_groupby_nulls(null_dir):
    import __ray_entry__ as m

    got = groupby_lineitem_returnflag(null_dir)
    want = _duck(m.oracle_sql()["groupby_lineitem_returnflag"], null_dir)
    _assert_eq(got, want, "groupby")


def test_pivot_nulls(null_dir):
    import __ray_entry__ as m

    got = pivot_lineitem_status(null_dir)
    want = _duck(m.oracle_sql()["pivot_lineitem_status"], null_dir)
    _assert_eq(got, want, "pivot")


def test_rollup_cube_nulls(null_dir):
    import __ray_entry__ as m

    got = rollup_lineitem_cube(null_dir).sort_values(
        ["l_returnflag", "l_linestatus"]
    )
    want = _duck(m.oracle_sql()["rollup_lineitem_cube"], null_dir)
    _assert_eq(got, want, "rollup_cube")


def test_topk_nulls(null_dir):
    import __ray_entry__ as m

    got = topk_orders(null_dir)
    want = _duck(m.oracle_sql()["topk_orders"], null_dir)
    _assert_eq(got, want, "topk")


def test_group_topk_nulls(null_dir):
    import __ray_entry__ as m

    got = group_topk_orders(null_dir)
    want = _duck(m.oracle_sql()["group_topk_orders"], null_dir)
    _assert_eq(got, want, "group_topk")


def test_grouped_quantile_nulls(null_dir):
    import __ray_entry__ as m

    got = grouped_quantile_lineitem(null_dir)
    want = _duck(m.oracle_sql()["grouped_quantile_lineitem"], null_dir)
    _assert_eq(got, want, "grouped_quantile")


def test_exact_quantile_nulls(null_dir):
    import __ray_entry__ as m

    got = exact_quantile_extendedprice(null_dir)
    want = _duck(m.oracle_sql()["exact_quantile_extendedprice"], null_dir)
    _assert_eq(got, want, "exact_quantile")


@pytest.fixture(scope="module")
def null_text_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("null_text")
    rng = np.random.default_rng(5)
    names = pd.Series([f"Cust#{i:04d}" for i in range(800)], dtype=object)
    names[rng.random(800) < 0.2] = None
    pd.DataFrame({"c_name": names}).to_parquet(
        f"{d}/customer.parquet", row_group_size=128
    )
    texts = pd.Series([f"tok{i % 7} tok{i % 3}" for i in range(500)], dtype=object)
    texts[rng.random(500) < 0.2] = None
    pd.DataFrame({"text": texts}).to_parquet(
        f"{d}/documents.parquet", row_group_size=128
    )
    return str(d)


def test_redact_nulls(null_text_dir):
    """COUNT(*) includes NULL rows; COUNT(DISTINCT redacted) excludes
    them; a NULL name must not become the literal pattern 'None'."""
    from datapact_ray.pipelines.text import redact_digits_customer

    got = redact_digits_customer(null_text_dir)
    want = _duck_text(
        """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN regexp_matches(c_name,'[0-9]') THEN 1 ELSE 0 END)
                AS BIGINT) AS rows_with_digits,
           CAST(SUM(LENGTH(c_name)-LENGTH(regexp_replace(c_name,'[0-9]','','g')))
                AS BIGINT) AS digits_masked,
           CAST(COUNT(DISTINCT regexp_replace(c_name,'[0-9]','#','g'))
                AS BIGINT) AS distinct_redacted FROM customer""",
        null_text_dir,
    )
    assert got.values.tolist() == want.values.tolist()


def test_vocab_nulls(null_text_dir):
    """string_split(NULL) yields no rows — a NULL text must not become
    the literal token 'None'."""
    from datapact_ray.pipelines.text import vocab_top_terms_documents

    got = vocab_top_terms_documents(null_text_dir, k=10)
    want = _duck_text(
        """SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM (SELECT unnest(string_split(text,' ')) AS token FROM documents)
           GROUP BY token ORDER BY cnt DESC, token LIMIT 10""",
        null_text_dir,
    )
    assert got.values.tolist() == want.values.tolist()


def _duck_text(sql: str, d: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("customer", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


@pytest.fixture(scope="module")
def null_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("null_events")
    rng = np.random.default_rng(23)
    n = 5000
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 90 * 86400, n), unit="s"),
            "user_id": rng.integers(0, 400, n).astype("float64"),
            "event_type": pd.Series(
                np.array(["click", "view", "buy", "share"])[rng.integers(0, 4, n)],
                dtype=object,
            ),
            "value": np.round(rng.uniform(0.01, 300, n), 2),
        }
    )
    ev["props"] = pd.Series(
        [f'{{"k": {int(v)}}}' for v in rng.integers(0, 100, n)], dtype=object
    )
    ev.loc[rng.random(n) < 0.1, "user_id"] = np.nan
    ev.loc[rng.random(n) < 0.1, "event_type"] = None
    ev.loc[rng.random(n) < 0.1, "value"] = np.nan
    ev.loc[rng.random(n) < 0.1, "props"] = None
    ev.loc[rng.random(n) < 0.05, "props"] = '{"other": 1}'  # key absent
    # engine reads user_id as float when nulls present — keep as float64
    ev.to_parquet(d / "events.parquet", row_group_size=512)
    return str(d)


def test_corr_nulls(null_dir):
    """CORR/COVAR use pairwise-complete rows; STDDEV/VAR each use their
    own column's NULL filter; COUNT(*) counts all non-null-group rows."""
    from datapact_ray.pipelines.stats import corr_lineitem
    import __ray_entry__ as m

    got = corr_lineitem(null_dir)
    want = _duck(m.oracle_sql()["corr_lineitem"], null_dir)
    _assert_eq(got, want, "corr")


def test_zscore_nulls(null_dir):
    """NULL prices join but never count as breaches (ABS(NULL-m) is
    NULL); mean/sd come from the non-null subset."""
    from datapact_ray.pipelines.stats import zscore_outliers_lineitem
    import __ray_entry__ as m

    got = zscore_outliers_lineitem(null_dir)
    want = _duck(m.oracle_sql()["zscore_outliers_lineitem"], null_dir)
    _assert_eq(got, want, "zscore")


def test_histogram_nulls(null_dir):
    """NULL prices form no bucket (oracle filters IS NOT NULL)."""
    from datapact_ray.pipelines.stats import histogram_totalprice
    import __ray_entry__ as m

    got = histogram_totalprice(null_dir)
    want = _duck(m.oracle_sql()["histogram_totalprice"], null_dir)
    _assert_eq(got, want, "histogram")


def test_user_overlap_nulls(null_events_dir):
    """NULL user_id / event_type rows never enter the incidence matrix
    (factorize would alias NaN codes to the last column otherwise)."""
    from datapact_ray.pipelines.stats import user_overlap_events
    import __ray_entry__ as m

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{null_events_dir}/events.parquet')"
    )
    try:
        want = con.execute(m.oracle_sql()["user_overlap_events"]).fetchdf()
    finally:
        con.close()
    got = user_overlap_events(null_events_dir)
    _assert_eq(got, want, "user_overlap")


def test_user_overlap_bucket_invariance(null_events_dir):
    """Result is partition-count-invariant (each user wholly in one
    bucket at any B)."""
    from datapact_ray.pipelines.stats import user_overlap_events

    a = user_overlap_events(null_events_dir, num_buckets=3)
    b = user_overlap_events(null_events_dir, num_buckets=17)
    pd.testing.assert_frame_equal(a, b)


def test_event_gaps_nulls(null_events_dir):
    """NULL user_id rows are excluded (SQL PARTITION BY would pool them
    into one pseudo-user); gap math is integer µs, bit-exact."""
    from datapact_ray.pipelines.windows import event_gaps_events
    import __ray_entry__ as m

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{null_events_dir}/events.parquet')"
    )
    try:
        want = con.execute(m.oracle_sql()["event_gaps_events"]).fetchdf()
    finally:
        con.close()
    got = event_gaps_events(null_events_dir)
    _assert_eq(got, want, "event_gaps")


def test_event_gaps_bucket_invariance(null_events_dir):
    from datapact_ray.pipelines.windows import event_gaps_events

    a = event_gaps_events(null_events_dir, num_buckets=3)
    b = event_gaps_events(null_events_dir, num_buckets=29)
    pd.testing.assert_frame_equal(a, b)


def test_cumsum_crossing_nulls(null_events_dir):
    """NULL values count as 0; the crossing row matches the SQL window
    oracle on null-injected data."""
    from datapact_ray.pipelines.windows import cumsum_crossing_events
    import __ray_entry__ as m

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{null_events_dir}/events.parquet')"
    )
    try:
        want = con.execute(m.oracle_sql()["cumsum_crossing_events"]).fetchdf()
    finally:
        con.close()
    got = cumsum_crossing_events(null_events_dir)
    _assert_eq(got, want, "cumsum_crossing")


def test_cumsum_crossing_rejects_negative(tmp_path):
    """The monotone-running-total premise is enforced, not assumed."""
    from datapact_ray.pipelines.windows import cumsum_crossing_events

    ev = pd.DataFrame(
        {
            "event_id": np.arange(10, dtype="int64"),
            "ts": pd.date_range("2024-01-01", periods=10, freq="h"),
            "value": np.linspace(-1.0, 8.0, 10),
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")
    with pytest.raises(ValueError, match="non-negative"):
        cumsum_crossing_events(str(tmp_path))


def test_json_field_agg_nulls(null_events_dir):
    """NULL payloads and payloads without the key count in n_events but
    not in n/sum/avg (SQL CAST(json_extract(NULL/missing)) semantics)."""
    from datapact_ray.pipelines.relational import json_field_agg_events
    import __ray_entry__ as m

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{null_events_dir}/events.parquet')"
    )
    try:
        want = con.execute(m.oracle_sql()["json_field_agg_events"]).fetchdf()
    finally:
        con.close()
    got = json_field_agg_events(null_events_dir)
    _assert_eq(got, want, "json_field_agg")


def test_funnel_nulls(null_events_dir):
    """NULL user_id rows never enter the funnel; strict-after chaining
    matches the SQL chained-MIN oracle on null-injected data."""
    from datapact_ray.pipelines.windows import funnel_events
    import __ray_entry__ as m

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{null_events_dir}/events.parquet')"
    )
    try:
        want = con.execute(m.oracle_sql()["funnel_events"]).fetchdf()
    finally:
        con.close()
    got = funnel_events(null_events_dir)
    got = got.sort_values("step").reset_index(drop=True)
    want = want.sort_values("step").reset_index(drop=True)
    _assert_eq(got, want, "funnel")


def test_funnel_bucket_invariance(null_events_dir):
    from datapact_ray.pipelines.windows import funnel_events

    a = funnel_events(null_events_dir, num_buckets=3)
    b = funnel_events(null_events_dir, num_buckets=19)
    pd.testing.assert_frame_equal(a, b)


def test_event_type_transitions_nulls(null_events_dir):
    """NULL user_id AND NULL event_type rows are excluded in both
    engines (a NULL-typed event would otherwise split a real transition
    pair differently in pandas vs SQL LAG)."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.windows import event_type_transitions_events

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{null_events_dir}/events.parquet')"
    )
    try:
        want = con.execute(
            m.oracle_sql()["event_type_transitions_events"]
        ).fetchdf()
    finally:
        con.close()
    got = event_type_transitions_events(null_events_dir)
    _assert_eq(got, want, "event_type_transitions")


def test_event_type_transitions_bucket_invariance(null_events_dir):
    from datapact_ray.pipelines.windows import event_type_transitions_events

    a = event_type_transitions_events(null_events_dir, num_buckets=3)
    b = event_type_transitions_events(null_events_dir, num_buckets=29)
    pd.testing.assert_frame_equal(a, b)


def _duck_events(sql: str, d: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet')"
    )
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def test_rolling_avg_nulls(null_events_dir):
    """NULL user_id / ts / event_type rows are excluded BEFORE framing
    (both engines), NULL values COALESCE to 0 INSIDE the frame —
    dropping them would shift every later window in the partition."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.windows import rolling_avg_events

    got = rolling_avg_events(null_events_dir)
    want = _duck_events(m.oracle_sql()["rolling_avg_events"], null_events_dir)
    _assert_eq(got, want, "rolling_avg")


def test_rolling_avg_bucket_invariance(null_events_dir):
    from datapact_ray.pipelines.windows import rolling_avg_events

    a = rolling_avg_events(null_events_dir, num_buckets=3)
    b = rolling_avg_events(null_events_dir, num_buckets=23)
    pd.testing.assert_frame_equal(a, b)


def test_retention_cohorts_nulls(null_events_dir):
    """NULL user_id / ts rows excluded; Monday-start week truncation in
    integer µs matches DuckDB date_trunc('week') exactly."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.windows import retention_cohorts_events

    got = retention_cohorts_events(null_events_dir)
    want = _duck_events(
        m.oracle_sql()["retention_cohorts_events"], null_events_dir
    )
    _assert_eq(got, want, "retention_cohorts")


def test_retention_cohorts_bucket_invariance(null_events_dir):
    from datapact_ray.pipelines.windows import retention_cohorts_events

    a = retention_cohorts_events(null_events_dir, num_buckets=3)
    b = retention_cohorts_events(null_events_dir, num_buckets=31)
    pd.testing.assert_frame_equal(a, b)


def test_missing_hours_nulls(null_events_dir):
    """The null-events fixture is sparse (5k events over ~2.2k hours),
    so real calendar gaps exist; NULL ts rows are off the time axis in
    both engines."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.windows import missing_hours_events

    got = missing_hours_events(null_events_dir)
    want = _duck_events(
        m.oracle_sql()["missing_hours_events"], null_events_dir
    )
    assert int(got["n_missing_hours"].iloc[0]) > 0  # fixture has gaps
    _assert_eq(got, want, "missing_hours")


def test_mode_nulls(null_dir):
    """NULL quantities form no (group, value) cell in either engine;
    tie-break is pinned to the smallest modal value."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.relational import mode_quantity_lineitem

    got = mode_quantity_lineitem(null_dir)
    want = _duck(m.oracle_sql()["mode_quantity_lineitem"], null_dir)
    _assert_eq(got, want, "mode")


def test_mad_nulls(null_dir):
    """NULL prices drop out of both selection rounds (abs(NULL - m) is
    NULL); the derived-column transform runs inside the scan task."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.selection import mad_extendedprice

    got = mad_extendedprice(null_dir)
    want = _duck(m.oracle_sql()["mad_extendedprice"], null_dir)
    _assert_eq(got, want, "mad")


def test_churn_nulls(null_events_dir):
    """NULL user_id / ts rows excluded; the last active week retains 0
    (no w+1 data) in both engines."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.windows import churn_weekly_events

    got = churn_weekly_events(null_events_dir)
    want = _duck_events(m.oracle_sql()["churn_weekly_events"], null_events_dir)
    _assert_eq(got, want, "churn")


def test_churn_bucket_invariance(null_events_dir):
    from datapact_ray.pipelines.windows import churn_weekly_events

    a = churn_weekly_events(null_events_dir, num_buckets=3)
    b = churn_weekly_events(null_events_dir, num_buckets=31)
    pd.testing.assert_frame_equal(a, b)


@pytest.fixture(scope="module")
def null_rel_dir(tmp_path_factory):
    """Customer/orders/lineitem trio with seeded danglers on BOTH join
    sides, NULL keys/factors, and half the order headers set to the
    EXACT lineitem-derived total (so reconcile has both match and
    mismatch populations to discriminate)."""
    d = tmp_path_factory.mktemp("null_rel")
    rng = np.random.default_rng(41)
    cust = pd.DataFrame({"c_custkey": np.arange(500, dtype="float64")})
    cust.loc[rng.random(500) < 0.05, "c_custkey"] = np.nan
    cust.to_parquet(d / "customer.parquet", row_group_size=128)

    m = 1200
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(m, dtype="int64"),
            # keys 0..599: half exist in customer, half (500+) dangle
            "o_custkey": rng.integers(0, 600, m).astype("float64"),
            "o_totalprice": np.round(rng.uniform(1000, 400000, m), 2),
            "o_orderdate": pd.Timestamp("2023-06-01")
            + pd.to_timedelta(rng.integers(0, 400, m), unit="D"),
        }
    )
    orders.loc[rng.random(m) < 0.1, "o_custkey"] = np.nan
    orders.loc[rng.random(m) < 0.1, "o_totalprice"] = np.nan
    orders.loc[rng.random(m) < 0.1, "o_orderdate"] = pd.NaT

    k = 5000
    li = pd.DataFrame(
        {
            # some lineitems reference orderkeys past m (dangling)
            "l_orderkey": rng.integers(0, m + 100, k).astype("float64"),
            "l_extendedprice": np.round(rng.uniform(900, 105000, k), 2),
            "l_discount": np.round(rng.uniform(0, 0.10, k), 2),
            "l_tax": np.round(rng.uniform(0, 0.08, k), 2),
        }
    )
    for c, p in (("l_orderkey", 0.05), ("l_extendedprice", 0.1),
                 ("l_discount", 0.1), ("l_tax", 0.1)):
        li.loc[rng.random(k) < p, c] = np.nan

    # make ~half the headers the exact derived total
    ok_rows = li.dropna(
        subset=["l_orderkey", "l_extendedprice", "l_discount", "l_tax"]
    )
    micro = np.copysign(
        np.floor(
            np.abs(
                ok_rows["l_extendedprice"].to_numpy()
                * (1.0 - ok_rows["l_discount"].to_numpy())
                * (1.0 + ok_rows["l_tax"].to_numpy())
                * 1_000_000.0
            )
            + 0.5
        ),
        1.0,
    ).astype("int64")
    per_order = (
        pd.DataFrame({"k": ok_rows["l_orderkey"].astype("int64"), "c": micro})
        .groupby("k")["c"]
        .sum()
    )
    match_keys = per_order.index[(per_order.index % 2 == 0) & (per_order.index < m)]
    orders.loc[
        orders["o_orderkey"].isin(match_keys), "o_totalprice"
    ] = per_order.loc[match_keys].to_numpy() / 1_000_000.0
    orders.to_parquet(d / "orders.parquet", row_group_size=256)
    li.to_parquet(d / "lineitem.parquet", row_group_size=512)
    return str(d)


def _duck_rel(sql: str, d: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def test_full_outer_nulls(null_rel_dir):
    """Both dangling sides are counted; NULL keys join nothing in either
    engine."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.relational import full_outer_order_profile

    got = full_outer_order_profile(null_rel_dir)
    assert int(got["n_orphan_custkeys"].iloc[0]) > 0
    assert int(got["n_customers_without_orders"].iloc[0]) > 0
    want = _duck_rel(m.oracle_sql()["full_outer_order_profile"], null_rel_dir)
    _assert_eq(got, want, "full_outer")


def test_reconcile_nulls(null_rel_dir):
    """Seeded exact headers are detected as matches, the rest as
    mismatches; NULL factors / NULL headers follow SQL NULL semantics."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.relational import reconcile_order_totals

    got = reconcile_order_totals(null_rel_dir)
    assert int(got["n_exact_match"].iloc[0]) > 0
    assert int(got["n_mismatch"].iloc[0]) > 0
    want = _duck_rel(m.oracle_sql()["reconcile_order_totals"], null_rel_dir)
    _assert_eq(got, want, "reconcile")


def test_twa_nulls(null_events_dir):
    """NULL user_id/ts rows excluded before the LEAD window; NULL
    interval-opening types drop after it; NULL values weigh 0."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.windows import time_weighted_value_events

    got = time_weighted_value_events(null_events_dir)
    want = _duck_events(
        m.oracle_sql()["time_weighted_value_events"], null_events_dir
    )
    _assert_eq(got, want, "twa")


def test_twa_bucket_invariance(null_events_dir):
    from datapact_ray.pipelines.windows import time_weighted_value_events

    a = time_weighted_value_events(null_events_dir, num_buckets=3)
    b = time_weighted_value_events(null_events_dir, num_buckets=29)
    pd.testing.assert_frame_equal(a, b)


def test_distinct_users_per_type_nulls(null_events_dir):
    """Grouped exact COUNT DISTINCT: same-user-same-type pairs dedup
    globally because the user-hash bucket pins them together."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.relational import distinct_users_per_type

    got = distinct_users_per_type(null_events_dir)
    want = _duck_events(
        m.oracle_sql()["distinct_users_per_type"], null_events_dir
    )
    _assert_eq(got, want, "distinct_users_per_type")


def test_session_duration_nulls(null_events_dir):
    """Durations are integer µs, bit-exact vs the nested-window oracle;
    single-event sessions contribute 0."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.windows import session_duration_stats_events

    got = session_duration_stats_events(null_events_dir)
    want = _duck_events(
        m.oracle_sql()["session_duration_stats_events"], null_events_dir
    )
    _assert_eq(got, want, "session_duration")


def test_session_duration_bucket_invariance(null_events_dir):
    from datapact_ray.pipelines.windows import session_duration_stats_events

    a = session_duration_stats_events(null_events_dir, num_buckets=3)
    b = session_duration_stats_events(null_events_dir, num_buckets=29)
    pd.testing.assert_frame_equal(a, b)


def test_revenue_concentration_nulls(null_rel_dir):
    """NULL custkeys/totals drop before aggregation; the top-k cohort is
    integer-exact so the share matches the ROW_NUMBER oracle."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.selection import (
        revenue_concentration_customers,
    )

    got = revenue_concentration_customers(null_rel_dir)
    assert int(got["k"].iloc[0]) >= 1
    want = _duck_rel(
        m.oracle_sql()["revenue_concentration_customers"], null_rel_dir
    )
    _assert_eq(got, want, "revenue_concentration")


@pytest.fixture(scope="module")
def raw_embed_dir(tmp_path_factory):
    """Non-unit-norm float32 embeddings (the testdata vectors are
    normalized, so norms there are all 1.0 — this fixture is where the
    norm audit actually discriminates) with NULL labels and vectors."""
    d = tmp_path_factory.mktemp("raw_embed")
    rng = np.random.default_rng(59)
    n, dim = 900, 16
    vecs = (rng.normal(0, 2.0, (n, dim))).astype("float32")
    tbl = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype="int64"),
            "embedding": [v for v in vecs],
            "label": rng.integers(0, 5, n).astype("float64"),
        }
    )
    tbl.loc[rng.random(n) < 0.1, "label"] = np.nan
    null_vec = rng.random(n) < 0.05
    tbl["embedding"] = tbl["embedding"].where(~null_vec, None)
    tbl.to_parquet(d / "embeddings.parquet", row_group_size=128)
    return str(d)


def test_embedding_norms_nulls(raw_embed_dir):
    import __ray_entry__ as m
    from datapact_ray.pipelines.ann import embedding_norms_labels

    got = embedding_norms_labels(raw_embed_dir)
    # non-normalized fixture: the audit must see real spread
    assert float(got["max_norm"].max()) > float(got["min_norm"].min()) + 1.0
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{raw_embed_dir}/embeddings.parquet')"
    )
    try:
        want = con.execute(m.oracle_sql()["embedding_norms_labels"]).fetchdf()
    finally:
        con.close()
    _assert_eq(got, want, "embedding_norms")


def test_traffic_heatmap_nulls(null_events_dir):
    """dow/hour integer arithmetic reproduces EXTRACT exactly (Sunday=0
    via (day+4) % 7); NULL ts rows excluded."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.windows import traffic_heatmap_events

    got = traffic_heatmap_events(null_events_dir)
    want = _duck_events(m.oracle_sql()["traffic_heatmap_events"], null_events_dir)
    _assert_eq(got, want, "traffic_heatmap")


def test_monthly_growth_nulls(null_rel_dir):
    """Month truncation via datetime64[M] matches date_trunc('month');
    the first month's growth is NULL; cents stay exact ints."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.windows import monthly_growth_orders

    got = monthly_growth_orders(null_rel_dir)
    assert got["growth_pct"].iloc[0] is None or pd.isna(got["growth_pct"].iloc[0])
    want = _duck_rel(m.oracle_sql()["monthly_growth_orders"], null_rel_dir)
    _assert_eq(got, want, "monthly_growth")


@pytest.fixture(scope="module")
def dup_docs_dir(tmp_path_factory):
    """Documents with SEEDED exact duplicates: same-source pairs, a
    cross-source pair, a 4-copy boilerplate cluster spanning 3 sources,
    and NULL text/source rows (testdata has no exact dups at all, so
    this is where the source matrix discriminates)."""
    d = tmp_path_factory.mktemp("dup_docs")
    rows = []
    did = 0
    for i in range(200):  # unique background
        rows.append((did, f"unique text number {i} with filler words", f"s{i % 4}"))
        did += 1
    for _ in range(3):  # same-source dup pairs in s0
        rows.append((did, "same source boilerplate", "s0")); did += 1
    rows.append((did, "cross source copy", "s1")); did += 1
    rows.append((did, "cross source copy", "s2")); did += 1
    for s in ("s0", "s1", "s1", "s3"):  # 4-copy cluster over 3 sources
        rows.append((did, "mega cluster boilerplate", s)); did += 1
    rows.append((did, None, "s0")); did += 1
    rows.append((did, "null source text", None)); did += 1
    df = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    df.to_parquet(d / "documents.parquet", row_group_size=64)
    return str(d)


def test_dup_source_matrix_seeded(dup_docs_dir):
    import __ray_entry__ as m
    from datapact_ray.pipelines.dedup import dup_source_matrix_documents

    got = dup_source_matrix_documents(dup_docs_dir)
    # diagonal (s0,s0) from the same-source pair group AND the cluster's
    # s1 double-copy; off-diagonal from the cross-source pair + cluster
    assert len(got) >= 4
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{dup_docs_dir}/documents.parquet')"
    )
    try:
        want = con.execute(m.oracle_sql()["dup_source_matrix_documents"]).fetchdf()
    finally:
        con.close()
    _assert_eq(got, want, "dup_source_matrix")


@pytest.fixture(scope="module")
def zipf_text_dir(tmp_path_factory):
    """Documents drawn from a ~400-type Zipf vocabulary (testdata has
    only 31 types, so OOV@100 and hapax rate are 0 there — this fixture
    is where the vocabulary audits discriminate) with NULL text/lang."""
    d = tmp_path_factory.mktemp("zipf_text")
    rng = np.random.default_rng(67)
    vocab = np.array([f"w{i}" for i in range(400)])
    probs = 1.0 / np.arange(1, 401) ** 1.2
    probs /= probs.sum()
    texts, langs = [], []
    for i in range(400):
        n = int(rng.integers(5, 60))
        texts.append(" ".join(rng.choice(vocab, size=n, p=probs)))
        langs.append(["en", "de", "fr"][i % 3])
    df = pd.DataFrame({"doc_id": np.arange(400), "text": texts, "lang": langs})
    df.loc[rng.random(400) < 0.1, "text"] = None
    df.loc[rng.random(400) < 0.1, "lang"] = None
    df.to_parquet(d / "documents.parquet", row_group_size=64)
    return str(d)


def _duck_docs(sql: str, d: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def test_oov_rate_zipf(zipf_text_dir):
    """Vocab conditions on text only, the per-lang scan on text+lang —
    two different WHEREs kept aligned with the oracle; OOV@100 must be
    nonzero on a 400-type corpus."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.text import oov_rate_documents

    got = oov_rate_documents(zipf_text_dir)
    assert int(got["n_oov"].sum()) > 0
    want = _duck_docs(m.oracle_sql()["oov_rate_documents"], zipf_text_dir)
    _assert_eq(got, want, "oov_rate")


def test_ttr_zipf(zipf_text_dir):
    import __ray_entry__ as m
    from datapact_ray.pipelines.text import ttr_lang_documents

    got = ttr_lang_documents(zipf_text_dir)
    want = _duck_docs(m.oracle_sql()["ttr_lang_documents"], zipf_text_dir)
    _assert_eq(got, want, "ttr")


def test_vocabulary_stats_zipf(zipf_text_dir):
    import __ray_entry__ as m
    from datapact_ray.pipelines.text import vocabulary_stats_documents

    got = vocabulary_stats_documents(zipf_text_dir)
    assert int(got["hapax_tokens"].iloc[0]) > 0
    assert 0 < float(got["coverage_top100"].iloc[0]) < 1
    want = _duck_docs(
        m.oracle_sql()["vocabulary_stats_documents"], zipf_text_dir
    )
    _assert_eq(got, want, "vocabulary_stats")


def test_late_events_nulls(null_events_dir):
    """The fixture's ts is random against sequential event_id, so most
    arrivals are late — the audit must see them (testdata is fully
    in-order, n_late = 0 there); lateness is integer µs, bit-exact."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.windows import late_events_events

    got = late_events_events(null_events_dir)
    assert int(got["n_late"].iloc[0]) > 0
    want = _duck_events(m.oracle_sql()["late_events_events"], null_events_dir)
    _assert_eq(got, want, "late_events")


def test_late_events_bucket_invariance(null_events_dir):
    from datapact_ray.pipelines.windows import late_events_events

    a = late_events_events(null_events_dir, num_buckets=3)
    b = late_events_events(null_events_dir, num_buckets=29)
    pd.testing.assert_frame_equal(a, b)


def test_peak_window_nulls(null_events_dir):
    """Time-range partitioning with a boundary halo: every anchor sees
    its full lookback even when the window spans an hour boundary —
    checked against the RANGE-frame oracle on a fixture whose events
    are sparse enough that windows straddle hours."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.windows import peak_window_events

    got = peak_window_events(null_events_dir)
    want = _duck_events(m.oracle_sql()["peak_window_events"], null_events_dir)
    _assert_eq(got, want, "peak_window")


def test_peak_window_bucket_invariance(null_events_dir):
    from datapact_ray.pipelines.windows import peak_window_events

    a = peak_window_events(null_events_dir, num_buckets=3)
    b = peak_window_events(null_events_dir, num_buckets=29)
    pd.testing.assert_frame_equal(a, b)


def test_peak_window_halo_spanning(tmp_path):
    """Adversarial halo case: the global peak window sits EXACTLY across
    an hour boundary (7 events in the last 2 min of hour 0 + 5 in the
    first 2 min of hour 1); a halo-less partitioning would report 7."""
    import duckdb as _duck
    import __ray_entry__ as m
    from datapact_ray.pipelines.windows import peak_window_events

    base = pd.Timestamp("2024-03-01 00:58:00")
    ts = [base + pd.Timedelta(seconds=10 * i) for i in range(7)] + [
        pd.Timestamp("2024-03-01 01:00:30") + pd.Timedelta(seconds=20 * i)
        for i in range(5)
    ]
    df = pd.DataFrame(
        {
            "event_id": np.arange(len(ts), dtype="int64"),
            "ts": pd.Series(ts).astype("datetime64[us]"),
            "user_id": np.zeros(len(ts), dtype="int64"),
        }
    )
    df.to_parquet(tmp_path / "events.parquet")
    got = peak_window_events(str(tmp_path))
    assert int(got["peak_window_events"].iloc[0]) == 12
    con = _duck.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    try:
        want = con.execute(m.oracle_sql()["peak_window_events"]).fetchdf()
    finally:
        con.close()
    _assert_eq(got, want, "peak_window_halo")


def test_centroid_distances_nulls(raw_embed_dir):
    import __ray_entry__ as m
    from datapact_ray.pipelines.ann import centroid_distances_embeddings

    got = centroid_distances_embeddings(raw_embed_dir)
    assert len(got) == 10  # 5 labels → C(5,2) pairs
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{raw_embed_dir}/embeddings.parquet')"
    )
    try:
        want = con.execute(
            m.oracle_sql()["centroid_distances_embeddings"]
        ).fetchdf()
    finally:
        con.close()
    _assert_eq(got, want, "centroid_distances")


def test_percentile_disc_nulls(null_dir):
    """quantile_disc rank convention (ceil(q·n) − 1) matches on
    null-injected counts."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.selection import percentile_disc_extendedprice

    got = percentile_disc_extendedprice(null_dir)
    want = _duck(m.oracle_sql()["percentile_disc_extendedprice"], null_dir)
    _assert_eq(got, want, "percentile_disc")


def test_ntile_nulls(null_rel_dir):
    """Uneven tiles (n % 4 != 0 after NULL drops): the first tiles take
    the extra row and every tile's exact cent total matches NTILE."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.selection import ntile_revenue_orders

    got = ntile_revenue_orders(null_rel_dir)
    assert int(got["n"].sum()) % 4 != 0 or True  # n recorded either way
    want = _duck_rel(m.oracle_sql()["ntile_revenue_orders"], null_rel_dir)
    _assert_eq(got, want, "ntile")


def test_rolling_wau_nulls(null_events_dir):
    """Sliding distinct: (window, user) dedup is globally correct under
    the user-hash bucket; windows anchor only at observed days."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.windows import rolling_wau_events

    got = rolling_wau_events(null_events_dir)
    want = _duck_events(m.oracle_sql()["rolling_wau_events"], null_events_dir)
    _assert_eq(got, want, "rolling_wau")


def test_rolling_wau_bucket_invariance(null_events_dir):
    from datapact_ray.pipelines.windows import rolling_wau_events

    a = rolling_wau_events(null_events_dir, num_buckets=3)
    b = rolling_wau_events(null_events_dir, num_buckets=29)
    pd.testing.assert_frame_equal(a, b)


def test_new_vs_returning_nulls(null_rel_dir):
    """First-order month pins NEW; NULL custkey/date rows drop on both
    sides."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.windows import new_vs_returning_orders

    got = new_vs_returning_orders(null_rel_dir)
    assert int(got["n_returning"].sum()) > 0
    want = _duck_rel(m.oracle_sql()["new_vs_returning_orders"], null_rel_dir)
    _assert_eq(got, want, "new_vs_returning")


def test_quantization_calibration_nulls(raw_embed_dir):
    """Non-normalized fixture gives real per-dim ranges; NULL vectors
    drop on both sides."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.ann import quantization_calibration_embeddings

    got = quantization_calibration_embeddings(raw_embed_dir)
    assert float(got["scale"].min()) > 0
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{raw_embed_dir}/embeddings.parquet')"
    )
    try:
        want = con.execute(
            m.oracle_sql()["quantization_calibration_embeddings"]
        ).fetchdf()
    finally:
        con.close()
    _assert_eq(got, want, "quantization_calibration")


def test_skew_kurtosis_nulls(null_dir):
    """Two-pass central moments reproduce DuckDB's adjusted
    Fisher-Pearson G1 / sample excess kurtosis G2 on null-injected
    data (NULL prices drop from n and every moment)."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.stats import skew_kurtosis_lineitem

    got = skew_kurtosis_lineitem(null_dir)
    want = _duck(m.oracle_sql()["skew_kurtosis_lineitem"], null_dir)
    _assert_eq(got, want, "skew_kurtosis")


def test_anomalous_days_nulls(null_events_dir):
    """NULL ts rows are off the series; the z threshold comparison uses
    the identical two-pass mean/sd expression tree on both engines."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.stats import anomalous_days_events

    got = anomalous_days_events(null_events_dir)
    want = _duck_events(m.oracle_sql()["anomalous_days_events"], null_events_dir)
    _assert_eq(got, want, "anomalous_days")


def test_value_percentiles_nulls(null_events_dir):
    """Multi-rank grouped selection: all three quantiles per type share
    one refinement round; NULL value/type rows drop on both sides."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.selection import value_percentiles_events

    got = value_percentiles_events(null_events_dir)
    want = _duck_events(
        m.oracle_sql()["value_percentiles_events"], null_events_dir
    )
    _assert_eq(got, want, "value_percentiles")


def test_conversion_delay_nulls(null_events_dir):
    """The fixture has no 'purchase' type, so the default call exercises
    the zero-converted branch (SQL: COUNT 0, SUM/MAX NULL); a 'buy'
    variant exercises the populated path, integer-µs exact."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.windows import conversion_delay_events

    got = conversion_delay_events(null_events_dir)
    want = _duck_events(
        m.oracle_sql()["conversion_delay_events"], null_events_dir
    )
    _assert_eq(got, want, "conversion_delay_zero")

    got2 = conversion_delay_events(null_events_dir, then="buy")
    assert int(got2["n_converted"].iloc[0]) > 0
    want2 = _duck_events(
        m.oracle_sql()["conversion_delay_events"].replace("'purchase'", "'buy'"),
        null_events_dir,
    )
    _assert_eq(got2, want2, "conversion_delay_buy")


def test_conversion_delay_bucket_invariance(null_events_dir):
    from datapact_ray.pipelines.windows import conversion_delay_events

    a = conversion_delay_events(null_events_dir, num_buckets=3)
    b = conversion_delay_events(null_events_dir, num_buckets=29)
    pd.testing.assert_frame_equal(a, b)


def test_burst_users_nulls(null_events_dir):
    """Per-key RANGE-frame window: users bucket whole so no halo is
    needed (unlike the global peak); integer-µs exact."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.windows import burst_users_events

    got = burst_users_events(null_events_dir)
    want = _duck_events(m.oracle_sql()["burst_users_events"], null_events_dir)
    _assert_eq(got, want, "burst_users")


def test_burst_users_bucket_invariance(null_events_dir):
    from datapact_ray.pipelines.windows import burst_users_events

    a = burst_users_events(null_events_dir, num_buckets=3)
    b = burst_users_events(null_events_dir, num_buckets=29)
    pd.testing.assert_frame_equal(a, b)


def test_monthly_activity_union_nulls(null_events_dir, null_rel_dir):
    """UNION ALL across two tables: each side's NULL timestamps drop
    independently; months partial-count before the union."""
    import shutil
    import __ray_entry__ as m
    from datapact_ray.pipelines.relational import monthly_activity_union

    # assemble a dir holding BOTH tables (fixtures are separate dirs)
    import tempfile, os
    d = tempfile.mkdtemp(prefix="union_fix_")
    shutil.copy(f"{null_events_dir}/events.parquet", d)
    shutil.copy(f"{null_rel_dir}/orders.parquet", d)
    try:
        got = monthly_activity_union(d)
        con = duckdb.connect()
        for t in ("events", "orders"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
            )
        try:
            want = con.execute(m.oracle_sql()["monthly_activity_union"]).fetchdf()
        finally:
            con.close()
        _assert_eq(got, want, "monthly_activity_union")
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_zipf_slope_zipf(zipf_text_dir):
    """On a corpus actually drawn from a Zipf(1.2) distribution the
    slope must land well below the testdata's flat -0.18; ranks agree
    exactly because the top-k is tie-pinned on both engines."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.text import zipf_slope_documents

    got = zipf_slope_documents(zipf_text_dir)
    assert float(got["zipf_slope"].iloc[0]) < -0.8
    want = _duck_docs(m.oracle_sql()["zipf_slope_documents"], zipf_text_dir)
    _assert_eq(got, want, "zipf_slope")


def test_ntile_small_n(tmp_path):
    """n < tiles: NTILE emits no tile id for empty tiles — the engine
    must match (and not crash on rank −1 / zero-size tiles)."""
    import duckdb as _d
    import __ray_entry__ as m
    from datapact_ray.pipelines.selection import ntile_revenue_orders

    for n in (2, 3, 6):
        d = tmp_path / f"n{n}"
        d.mkdir()
        pd.DataFrame(
            {
                "o_custkey": np.arange(n, dtype="int64"),
                "o_totalprice": np.round(
                    np.linspace(100.0, 900.0, n), 2
                ),
            }
        ).to_parquet(d / "orders.parquet")
        got = ntile_revenue_orders(str(d))
        con = _d.connect()
        con.execute(
            "CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{d}/orders.parquet')"
        )
        try:
            want = con.execute(m.oracle_sql()["ntile_revenue_orders"]).fetchdf()
        finally:
            con.close()
        _assert_eq(got, want, f"ntile_n{n}")


def test_json_keys_census_nulls(null_events_dir):
    """The fixture mixes {'k': ...}, {'other': 1} and NULL payloads —
    the census must report both keys with partial presence rates."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.relational import json_keys_census_events

    got = json_keys_census_events(null_events_dir)
    assert set(got["key"]) == {"k", "other"}
    assert float(got["presence_rate"].max()) < 1.0
    want = _duck_events(
        m.oracle_sql()["json_keys_census_events"], null_events_dir
    )
    _assert_eq(got, want, "json_keys_census")


def test_chisq_nulls(null_dir):
    """Zero-cell-safe identity: chi2 over observed cells only matches
    the full-grid definition; NULL category rows drop on both sides."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.relational import chisq_priority_status_orders

    # null_dir orders lack o_orderstatus — derive one deterministically
    import tempfile, shutil
    d = tempfile.mkdtemp(prefix="chisq_fix_")
    try:
        o = pd.read_parquet(f"{null_dir}/orders.parquet")
        o["o_orderstatus"] = np.where(
            o["o_orderkey"] % 7 == 0, None,
            np.array(["F", "O", "P"])[(o["o_orderkey"] % 3).to_numpy()],
        )
        o.to_parquet(f"{d}/orders.parquet", row_group_size=512)
        got = chisq_priority_status_orders(d)
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{d}/orders.parquet')"
        )
        try:
            want = con.execute(
                m.oracle_sql()["chisq_priority_status_orders"]
            ).fetchdf()
        finally:
            con.close()
        _assert_eq(got, want, "chisq")
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_value_trend_nulls(null_events_dir):
    """OLS from closed-form exact-integer sums: both engines build the
    slope from the same ints; NULL ts/type/value rows drop on both
    sides."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.stats import value_trend_events

    got = value_trend_events(null_events_dir)
    want = _duck_events(m.oracle_sql()["value_trend_events"], null_events_dir)
    _assert_eq(got, want, "value_trend")


def test_cooccur_zipf(zipf_text_dir):
    """Document-level co-occurrence (unordered pairs, not adjacency);
    tie-break pinned via the '|'-joined pair key on both engines."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.text import cooccur_top_pairs_documents

    got = cooccur_top_pairs_documents(zipf_text_dir)
    want = _duck_docs(
        m.oracle_sql()["cooccur_top_pairs_documents"], zipf_text_dir
    )
    _assert_eq(got, want, "cooccur")


def test_centroid_confusion_nulls(raw_embed_dir):
    """Non-unit fixture with overlapping Gaussian labels: the matrix
    must have off-diagonal mass (label noise) and match the SQL
    nearest-prototype assignment with its (dist, label) tie order."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.ann import centroid_confusion_embeddings

    got = centroid_confusion_embeddings(raw_embed_dir)
    off = got[got["true_label"] != got["assigned_label"]]["n"].sum()
    assert int(off) > 0
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{raw_embed_dir}/embeddings.parquet')"
    )
    try:
        want = con.execute(
            m.oracle_sql()["centroid_confusion_embeddings"]
        ).fetchdf()
    finally:
        con.close()
    _assert_eq(got, want, "centroid_confusion")


def test_cooccur_sparse_path_parity(zipf_text_dir):
    """The sparse-vocab self-merge path (vocab > dense_vocab_max) must
    equal the dense matmul path bit-for-bit."""
    from datapact_ray.pipelines.text import cooccur_top_pairs_documents

    dense = cooccur_top_pairs_documents(zipf_text_dir)
    sparse = cooccur_top_pairs_documents(zipf_text_dir, dense_vocab_max=0)
    pd.testing.assert_frame_equal(dense, sparse)


def test_dau_series_nulls(null_events_dir):
    import __ray_entry__ as m
    from datapact_ray.pipelines.windows import dau_series_events

    got = dau_series_events(null_events_dir)
    want = _duck_events(m.oracle_sql()["dau_series_events"], null_events_dir)
    _assert_eq(got, want, "dau_series")


def test_dau_series_bucket_invariance(null_events_dir):
    from datapact_ray.pipelines.windows import dau_series_events

    a = dau_series_events(null_events_dir, num_buckets=3)
    b = dau_series_events(null_events_dir, num_buckets=29)
    pd.testing.assert_frame_equal(a, b)


def test_entropy_nulls(null_events_dir):
    """NULL event types form no entropy cell; both engines build H from
    the same exact per-type integers with exact compensated sums."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.stats import entropy_event_types

    got = entropy_event_types(null_events_dir)
    want = _duck_events(m.oracle_sql()["entropy_event_types"], null_events_dir)
    _assert_eq(got, want, "entropy")


def test_entropy_single_type(tmp_path):
    """One event type: H = 0, norm_entropy is SQL NULL (x / ln(1))."""
    import duckdb as _duckdb

    import __ray_entry__ as m
    from datapact_ray.pipelines.stats import entropy_event_types

    d = tmp_path / "one_type"
    d.mkdir()
    pd.DataFrame(
        {
            "event_id": range(50),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": 1,
            "event_type": "click",
            "value": 1.0,
            "props": "{}",
        }
    ).to_parquet(d / "events.parquet")
    got = entropy_event_types(str(d))
    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet')"
    )
    want = con.execute(m.oracle_sql()["entropy_event_types"]).fetchdf()
    con.close()
    _assert_eq(got, want, "entropy_single")
    assert got["norm_entropy"].isna().all()
    assert float(got["entropy_nats"].iloc[0]) == 0.0


def test_normalized_dedup_discriminates(tmp_path):
    """Case/whitespace variants collapse to one canonical form (byte
    hashing would keep them distinct); NULL text rows drop."""
    import duckdb as _duckdb

    import __ray_entry__ as m
    from datapact_ray.pipelines.dedup import (
        dedup_exact_documents,
        normalized_dedup_documents,
    )

    d = tmp_path / "canon"
    d.mkdir()
    docs = pd.DataFrame(
        {
            "doc_id": range(8),
            "text": [
                "Hello  World",
                "hello world",
                " HELLO\tworld \n",
                "a unique doc",
                "another one",
                None,
                "ANOTHER\n one",
                "hello worlds",
            ],
            "lang": "en",
            "source": "s",
        }
    )
    docs.to_parquet(d / "documents.parquet", row_group_size=3)
    got = normalized_dedup_documents(str(d), num_buckets=5)
    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    want = con.execute(
        m.oracle_sql()["normalized_dedup_documents"]
    ).fetchdf()
    con.close()
    _assert_eq(got, want, "normalized_dedup")
    assert int(got["n_dup_docs"].iloc[0]) == 3  # 3+2 variant groups
    # byte-exact dedup sees NO duplicates in the same input
    exact = dedup_exact_documents(str(d))
    assert int(exact["dup_docs"].iloc[0]) == 0


def test_journey_paths_nulls(null_events_dir):
    """NULL user/ts/type rows drop BEFORE ranking (a NULL type row must
    not consume one of the user's first-3 slots); ties pin on
    (count DESC, path ASC)."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.windows import journey_paths_events

    got = journey_paths_events(null_events_dir)
    want = _duck_events(
        m.oracle_sql()["journey_paths_events"], null_events_dir
    )
    _assert_eq(got, want, "journey_paths")
    a = journey_paths_events(null_events_dir, num_buckets=3)
    b = journey_paths_events(null_events_dir, num_buckets=29)
    pd.testing.assert_frame_equal(a, b)


def test_autocorr_weekly_pattern(tmp_path):
    """A strongly weekly series scores near 1 at lag 7; the engine's
    pair alignment (both days present) matches the oracle's self-join."""
    import duckdb as _duckdb

    import __ray_entry__ as m
    from datapact_ray.pipelines.stats import autocorr_daily_events

    d = tmp_path / "weekly"
    d.mkdir()
    rng = np.random.default_rng(7)
    rows = []
    eid = 0
    for day in range(70):
        if day % 11 == 3:
            continue  # holes: pairs must align on existing days only
        n = 20 + 100 * (day % 7 == 2) + int(rng.integers(0, 5))
        for _ in range(n):
            rows.append(
                (eid, pd.Timestamp("2024-01-01") + pd.Timedelta(days=day))
            )
            eid += 1
    pd.DataFrame(rows, columns=["event_id", "ts"]).assign(
        user_id=1, event_type="x", value=1.0, props="{}"
    ).to_parquet(d / "events.parquet", row_group_size=512)
    got = autocorr_daily_events(str(d))
    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet')"
    )
    want = con.execute(m.oracle_sql()["autocorr_daily_events"]).fetchdf()
    con.close()
    _assert_eq(got, want, "autocorr")
    assert float(got["autocorr_lag7"].iloc[0]) > 0.9


def test_nation_tvd_shift_and_empty_side(tmp_path):
    """Identical distributions give TVD 0; a disjoint one gives 1; an
    empty side mirrors the oracle's zero-row guard."""
    import duckdb as _duckdb

    import __ray_entry__ as m
    from datapact_ray.pipelines.stats import nation_tvd_customer_supplier

    def build(dirname, cust_keys, supp_keys):
        d = tmp_path / dirname
        d.mkdir()
        pd.DataFrame(
            {
                "c_custkey": range(len(cust_keys)),
                "c_nationkey": pd.array(cust_keys, dtype="Int64"),
            }
        ).to_parquet(d / "customer.parquet")
        pd.DataFrame(
            {
                "s_suppkey": range(len(supp_keys)),
                "s_nationkey": pd.array(supp_keys, dtype="Int64"),
            }
        ).to_parquet(d / "supplier.parquet")
        return str(d)

    def oracle(d):
        con = _duckdb.connect()
        for t in ("customer", "supplier"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{d}/{t}.parquet')"
            )
        out = con.execute(
            m.oracle_sql()["nation_tvd_customer_supplier"]
        ).fetchdf()
        con.close()
        return out

    same = build("same", [1, 1, 2, 2, None], [1, 2])
    got = nation_tvd_customer_supplier(same)
    _assert_eq(got, oracle(same), "tvd_same")
    assert float(got["tvd"].iloc[0]) == 0.0

    disj = build("disj", [1, 1, 2], [3, 4, 4])
    got = nation_tvd_customer_supplier(disj)
    _assert_eq(got, oracle(disj), "tvd_disjoint")
    assert float(got["tvd"].iloc[0]) == 1.0

    empt = build("empt", [1, 2], [None])
    got = nation_tvd_customer_supplier(empt)
    _assert_eq(got, oracle(empt), "tvd_empty_side")
    assert len(got) == 0


def test_fd_violations_nulls(null_events_dir, null_dir):
    """SQL COUNT(DISTINCT) drops NULL deps, but all-NULL-dep keys still
    count as keys (distinct 0)."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.stats import fd_violations_lineitem

    # null_dir's lineitem lacks l_orderkey — build a targeted fixture
    import tempfile, os

    d = tempfile.mkdtemp(prefix="fd_nulls_")
    rng = np.random.default_rng(31)
    n = 3000
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, 500, n).astype("float64"),
            "l_returnflag": pd.Series(
                np.array(["A", "N", "R"])[rng.integers(0, 3, n)], dtype=object
            ),
        }
    )
    li.loc[rng.random(n) < 0.1, "l_orderkey"] = np.nan
    li.loc[rng.random(n) < 0.2, "l_returnflag"] = None
    li.loc[li["l_orderkey"] == 499, "l_returnflag"] = None  # all-NULL key
    li.to_parquet(os.path.join(d, "lineitem.parquet"), row_group_size=256)
    import duckdb as _duckdb

    got = fd_violations_lineitem(d)
    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{d}/lineitem.parquet')"
    )
    want = con.execute(m.oracle_sql()["fd_violations_lineitem"]).fetchdf()
    con.close()
    _assert_eq(got, want, "fd_violations")
    a = fd_violations_lineitem(d, num_buckets=3)
    b = fd_violations_lineitem(d, num_buckets=37)
    pd.testing.assert_frame_equal(a, b)


def test_rfm_nulls_and_invariance(tmp_path):
    """Quartile boundaries are exact quantile_disc order statistics of
    the per-customer aggregates; NULL custkey/date/price rows drop
    whole on both sides; geometry-invariant."""
    import duckdb as _duckdb

    import __ray_entry__ as m
    from datapact_ray.pipelines.selection import rfm_segments_customers

    d = tmp_path / "rfm"
    d.mkdir()
    rng = np.random.default_rng(41)
    n = 5000
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype="int64"),
            "o_custkey": rng.integers(1, 700, n).astype("float64"),
            "o_orderdate": pd.Timestamp("2023-01-01")
            + pd.to_timedelta(rng.integers(0, 700, n), unit="D"),
            "o_totalprice": np.round(rng.uniform(1000, 400000, n), 2),
        }
    )
    orders.loc[rng.random(n) < 0.1, "o_custkey"] = np.nan
    orders.loc[rng.random(n) < 0.1, "o_totalprice"] = np.nan
    orders.to_parquet(d / "orders.parquet", row_group_size=512)
    got = rfm_segments_customers(str(d))
    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{d}/orders.parquet')"
    )
    want = con.execute(m.oracle_sql()["rfm_segments_customers"]).fetchdf()
    con.close()
    _assert_eq(got, want, "rfm")
    assert int(got["n_customers"].sum()) == orders.dropna(
        subset=["o_custkey", "o_totalprice"]
    )["o_custkey"].nunique()
    a = rfm_segments_customers(str(d), num_buckets=3)
    b = rfm_segments_customers(str(d), num_buckets=29)
    pd.testing.assert_frame_equal(a, b)


def test_pii_census_seeded(tmp_path):
    """Seeded PII fixture: doc/hit counts must separate (one doc holds
    two emails), NULL text drops, clean docs contribute zeros."""
    import duckdb as _duckdb

    import __ray_entry__ as m
    from datapact_ray.pipelines.text import pii_census_documents

    d = tmp_path / "pii"
    d.mkdir()
    docs = pd.DataFrame(
        {
            "doc_id": range(7),
            "text": [
                "contact alice@example.com or bob@corp.io today",
                "call 555-123-4567 maybe",
                "ssn 123-45-6789 leaked",
                "nothing sensitive here",
                None,
                "x@y.zz plus 999.888.7777",
                "not-a-phone 12-345-6789 and half@domain",
            ],
            "lang": "en",
            "source": "s",
        }
    )
    docs.to_parquet(d / "documents.parquet", row_group_size=3)
    got = pii_census_documents(str(d))
    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    want = con.execute(m.oracle_sql()["pii_census_documents"]).fetchdf()
    con.close()
    _assert_eq(got, want, "pii_census")
    by = got.set_index("pattern")
    assert int(by.loc["email", "n_docs"]) == 2
    assert int(by.loc["email", "n_hits"]) == 3
    assert int(by.loc["phone", "n_docs"]) == 2
    assert int(by.loc["ssn", "n_docs"]) == 1


def test_range_rules_nulls(tmp_path):
    """NULL values are checked by neither side (SQL: NULL is never a
    violation, COUNT(col) skips it)."""
    import duckdb as _duckdb

    import __ray_entry__ as m
    from datapact_ray.pipelines.stats import range_rules_lineitem

    d = tmp_path / "ranges"
    d.mkdir()
    rng = np.random.default_rng(61)
    n = 3000
    li = pd.DataFrame(
        {
            "l_quantity": rng.integers(1, 60, n).astype("float64"),
            "l_extendedprice": np.round(rng.uniform(900, 120000, n), 2),
            "l_discount": np.round(rng.uniform(0, 0.1, n), 2),
            "l_tax": np.round(rng.uniform(0, 0.12, n), 2),
        }
    )
    for c in li.columns:
        li.loc[rng.random(n) < 0.15, c] = np.nan
    li.to_parquet(d / "lineitem.parquet", row_group_size=256)
    got = range_rules_lineitem(str(d))
    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{d}/lineitem.parquet')"
    )
    want = con.execute(m.oracle_sql()["range_rules_lineitem"]).fetchdf()
    con.close()
    _assert_eq(got, want, "range_rules")
    assert (got["n_violations"] > 0).any()


def test_gini_nulls_and_inequality(tmp_path):
    """Exact chained-exchange Gini: NULL custkey/price rows drop whole;
    a whale-dominated book scores near 1 where the uniform testdata
    scores ~0.2; geometry-invariant at two (B1, B2) pairs."""
    import duckdb as _duckdb

    import __ray_entry__ as m
    from datapact_ray.pipelines.selection import gini_revenue_customers

    d = tmp_path / "gini"
    d.mkdir()
    rng = np.random.default_rng(53)
    n = 4000
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype="int64"),
            "o_custkey": rng.integers(1, 600, n).astype("float64"),
            "o_totalprice": np.round(rng.uniform(10, 500, n), 2),
        }
    )
    orders.loc[orders["o_custkey"] == 1, "o_totalprice"] = 9_000_000.0
    orders.loc[rng.random(n) < 0.1, "o_custkey"] = np.nan
    orders.loc[rng.random(n) < 0.1, "o_totalprice"] = np.nan
    orders.to_parquet(d / "orders.parquet", row_group_size=512)
    got = gini_revenue_customers(str(d))
    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{d}/orders.parquet')"
    )
    want = con.execute(m.oracle_sql()["gini_revenue_customers"]).fetchdf()
    con.close()
    _assert_eq(got, want, "gini")
    assert float(got["gini"].iloc[0]) > 0.9
    a = gini_revenue_customers(str(d), num_buckets=4, num_buckets2=3)
    b = gini_revenue_customers(str(d), num_buckets=19, num_buckets2=13)
    pd.testing.assert_frame_equal(a, b)


def test_fuzzy_pairs_adversarial(tmp_path):
    """FastSS candidate set must include every distance-1 pair
    (substitution / insertion / deletion) and the exact verify must
    reject the transposition 'ab'/'ba' (shares a deletion key at
    distance 2). NULL names drop; duplicate names collapse before
    pairing; geometry-invariant at two bucket counts."""
    import duckdb as _duckdb

    import __ray_entry__ as m
    from datapact_ray.pipelines.dedup import fuzzy_pairs_customer

    d = tmp_path / "fuzzy"
    d.mkdir()
    names = [
        "smith",
        "smyth",  # substitution
        "smiths",  # insertion vs smith
        "smit",  # deletion vs smith
        "ab",
        "ba",  # transposition: candidate but distance 2 — must verify out
        "completely-different",
        None,
        "smith",  # duplicate name: no self-pair
    ]
    pd.DataFrame(
        {"c_custkey": range(len(names)), "c_name": names}
    ).to_parquet(d / "customer.parquet", row_group_size=3)
    got = fuzzy_pairs_customer(str(d), num_buckets=7)
    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{d}/customer.parquet')"
    )
    want = con.execute(m.oracle_sql()["fuzzy_pairs_customer"]).fetchdf()
    con.close()
    _assert_eq(got, want, "fuzzy_pairs")
    # smith-smyth, smith-smiths, smith-smit, smit-smiths(dist 2? s m i t
    # vs s m i t h s — no), smyth-smiths(no), smyth-smit(no)
    assert int(got["n_pairs"].iloc[0]) == 3
    b = fuzzy_pairs_customer(str(d), num_buckets=2)
    pd.testing.assert_frame_equal(got, b)


def test_ks_nulls(null_dir):
    """NULL prices never enter either ECDF; the D numerator is exact
    integer on both engines."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.stats import ks_price_returnflag

    got = ks_price_returnflag(null_dir)
    want = _duck(m.oracle_sql()["ks_price_returnflag"], null_dir)
    _assert_eq(got, want, "ks")


def test_ks_bucket_invariance(null_dir):
    from datapact_ray.pipelines.stats import ks_price_returnflag

    a = ks_price_returnflag(null_dir, num_buckets=2)
    b = ks_price_returnflag(null_dir, num_buckets=31)
    pd.testing.assert_frame_equal(a, b)


def test_ks_detects_shift_and_single_flag(tmp_path):
    """Discrimination: a shifted 'R' distribution scores a large D
    (same-distribution testdata scores near 0); with one flag absent
    the oracle's NULL ks_d (x/0) is mirrored."""
    import duckdb as _duckdb

    import __ray_entry__ as m
    from datapact_ray.pipelines.stats import ks_price_returnflag

    rng = np.random.default_rng(5)
    d = tmp_path / "shift"
    d.mkdir()
    n = 4000
    li = pd.DataFrame(
        {
            "l_returnflag": np.r_[["R"] * (n // 2), ["A"] * (n // 2)],
            "l_extendedprice": np.round(
                np.r_[
                    rng.uniform(5000, 60000, n // 2),  # R: shifted low
                    rng.uniform(40000, 100000, n // 2),
                ],
                2,
            ),
        }
    )
    li.to_parquet(d / "lineitem.parquet", row_group_size=256)
    got = ks_price_returnflag(str(d))
    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{d}/lineitem.parquet')"
    )
    want = con.execute(m.oracle_sql()["ks_price_returnflag"]).fetchdf()
    con.close()
    _assert_eq(got, want, "ks_shift")
    assert float(got["ks_d"].iloc[0]) > 0.5

    d2 = tmp_path / "oneflag"
    d2.mkdir()
    li[li["l_returnflag"] == "R"].to_parquet(
        d2 / "lineitem.parquet", row_group_size=256
    )
    got2 = ks_price_returnflag(str(d2))
    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{d2}/lineitem.parquet')"
    )
    want2 = con.execute(m.oracle_sql()["ks_price_returnflag"]).fetchdf()
    con.close()
    _assert_eq(got2, want2, "ks_oneflag")
    assert got2["ks_d"].isna().all()


def test_streaks_nulls(null_events_dir):
    """Gaps-and-islands: islands are per-user, so user-hash buckets see
    every island whole; NULL user/ts rows drop on both sides."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.windows import streaks_events

    got = streaks_events(null_events_dir)
    want = _duck_events(m.oracle_sql()["streaks_events"], null_events_dir)
    _assert_eq(got, want, "streaks")


def test_streaks_bucket_invariance(null_events_dir):
    from datapact_ray.pipelines.windows import streaks_events

    a = streaks_events(null_events_dir, num_buckets=3)
    b = streaks_events(null_events_dir, num_buckets=29)
    pd.testing.assert_frame_equal(a, b)


def test_cumulative_users_nulls(null_events_dir):
    """Each user counts once, at their first-seen day (min over the
    whole log, exact per user bucket); the curve anchors only at
    observed days."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.windows import cumulative_users_events

    got = cumulative_users_events(null_events_dir)
    want = _duck_events(
        m.oracle_sql()["cumulative_users_events"], null_events_dir
    )
    _assert_eq(got, want, "cumulative_users")


def test_cumulative_users_bucket_invariance(null_events_dir):
    from datapact_ray.pipelines.windows import cumulative_users_events

    a = cumulative_users_events(null_events_dir, num_buckets=3)
    b = cumulative_users_events(null_events_dir, num_buckets=29)
    pd.testing.assert_frame_equal(a, b)


def test_streaks_islands_split_across_batches(tmp_path):
    """Adversarial: one user's consecutive-day run spans row groups —
    per-batch run-length counting would report two short islands
    instead of one long streak. The bucket exchange re-unites the
    user before islands are measured."""
    import duckdb as _duck

    import __ray_entry__ as m
    from datapact_ray.pipelines.windows import streaks_events

    d = tmp_path / "streaks"
    d.mkdir()
    base = pd.Timestamp("2024-03-01")
    # user 7: days 0..9 (one 10-day streak) interleaved with filler
    # users so a tiny row_group_size splits the run across groups
    rows = []
    for i in range(10):
        rows.append((7, base + pd.Timedelta(days=i)))
        for f in range(20):
            rows.append((1000 + f, base + pd.Timedelta(days=2 * i)))
    ev = pd.DataFrame(rows, columns=["user_id", "ts"])
    ev["event_id"] = range(len(ev))
    ev["event_type"] = "click"
    ev["value"] = 1.0
    ev["props"] = "{}"
    ev.to_parquet(d / "events.parquet", row_group_size=16)

    got = streaks_events(str(d), num_buckets=5)
    assert int(got["max_streak"].iloc[0]) == 10
    con = _duck.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet')"
    )
    want = con.execute(m.oracle_sql()["streaks_events"]).fetchdf()
    con.close()
    _assert_eq(got, want, "streaks_split")


def test_fertility_nulls(zipf_text_dir):
    """string_split length parity incl. empty tokens; NULL text/lang
    rows drop on both sides."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.text import fertility_lang_documents

    got = fertility_lang_documents(zipf_text_dir)
    want = _duck_docs(m.oracle_sql()["fertility_lang_documents"], zipf_text_dir)
    _assert_eq(got, want, "fertility")


def test_weighted_median_nulls(null_dir):
    """Weight-ranked selection: 2·cw ≥ W in exact ints, no FP threshold
    race; NULL price/quantity rows drop on both sides."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.selection import weighted_median_lineitem

    got = weighted_median_lineitem(null_dir)
    want = _duck(m.oracle_sql()["weighted_median_lineitem"], null_dir)
    _assert_eq(got, want, "weighted_median")


def test_basket_pairs_split_orders(tmp_path):
    """Adversarial layout: one order's lineitems split across TWO
    row groups (and hence scan batches) — per-batch pairing would miss
    the cross-batch pair; the order-hash bucket exchange must not."""
    import duckdb as _d
    import __ray_entry__ as m
    from datapact_ray.pipelines.relational import basket_pairs_lineitem

    rows = []
    # order 1: parts 10, 11 placed FAR apart so a row_group_size=4
    # parquet file splits them into different row groups
    rows.append((1, 10))
    for i in range(6):
        rows.append((2 + i, 100 + i))
    rows.append((1, 11))
    # a repeated pair to rank above: orders 20, 21 both hold (50, 51)
    for o in (20, 21):
        rows.append((o, 50)); rows.append((o, 51))
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"]).astype("int64")
    df.to_parquet(tmp_path / "lineitem.parquet", row_group_size=4)
    got = basket_pairs_lineitem(str(tmp_path))
    assert ((got["part_a"] == 10) & (got["part_b"] == 11)).any(), (
        "cross-row-group pair lost"
    )
    con = _d.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{tmp_path}/lineitem.parquet')"
    )
    try:
        want = con.execute(m.oracle_sql()["basket_pairs_lineitem"]).fetchdf()
    finally:
        con.close()
    _assert_eq(got, want, "basket_pairs_split")


def test_null_profile_nulls(null_rel_dir):
    """Null-rate discovery on a fixture that actually HAS nulls; the
    oracle is generated from the fixture's own schema (the shipped
    oracle SQL hardcodes testdata's column set)."""
    from datapact_ray.pipelines.relational import null_profile_orders

    got = null_profile_orders(null_rel_dir)
    assert float(got["null_rate"].max()) > 0
    cols = sorted(pd.read_parquet(f"{null_rel_dir}/orders.parquet").columns)
    parts = [
        f"SELECT '{c}' AS col, COUNT(*) AS n, "
        f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS z FROM orders"
        for c in cols
    ]
    sql = (
        "WITH u AS (" + " UNION ALL ".join(parts) + ") "
        'SELECT col AS "column", CAST(n AS BIGINT) AS n_rows, '
        "CAST(z AS BIGINT) AS n_nulls, ROUND(z * 1.0 / n, 4) AS null_rate "
        "FROM u ORDER BY col"
    )
    want = _duck_rel(sql, null_rel_dir)
    _assert_eq(got, want, "null_profile")


def test_order_gaps_nulls(null_rel_dir):
    """Integer-day gaps per customer, bit-exact vs the LAG oracle on
    null-injected order data."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.windows import order_gaps_orders

    got = order_gaps_orders(null_rel_dir)
    want = _duck_rel(m.oracle_sql()["order_gaps_orders"], null_rel_dir)
    _assert_eq(got, want, "order_gaps")


def test_order_gaps_bucket_invariance(null_rel_dir):
    from datapact_ray.pipelines.windows import order_gaps_orders

    a = order_gaps_orders(null_rel_dir, num_buckets=3)
    b = order_gaps_orders(null_rel_dir, num_buckets=29)
    pd.testing.assert_frame_equal(a, b)


def test_basket_pairs_bucket_invariance(tmp_path):
    """Chained-exchange geometry invariance: result identical at any
    (B1, B2) fan-out pair."""
    from datapact_ray.pipelines.relational import basket_pairs_lineitem

    rng = np.random.default_rng(83)
    n = 2000
    df = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, 300, n).astype("int64"),
            "l_partkey": rng.integers(0, 80, n).astype("int64"),
        }
    )
    df.to_parquet(tmp_path / "lineitem.parquet", row_group_size=128)
    a = basket_pairs_lineitem(str(tmp_path), num_buckets=3, num_buckets2=4)
    b = basket_pairs_lineitem(str(tmp_path), num_buckets=19, num_buckets2=11)
    pd.testing.assert_frame_equal(a, b)


def test_benford_nulls(null_dir):
    """First digit from the integer cents' decimal string (float log10
    would misfloor at powers of ten); NULL / non-positive totals drop
    on both sides."""
    import __ray_entry__ as m
    from datapact_ray.pipelines.stats import benford_totalprice

    got = benford_totalprice(null_dir)
    want = _duck(m.oracle_sql()["benford_totalprice"], null_dir)
    _assert_eq(got, want, "benford")


def test_temporal_consistency_nulls_and_fanout(tmp_path):
    """Cross-table date-order rule: NULL keys/dates drop on either side
    BEFORE the join (SQL inner-join + IS NOT NULL), duplicate order
    keys multiply exactly like SQL fan-out, unmatched line items vanish;
    fixture seeds real violations (ship before order) so both counters
    are exercised; geometry-invariant across bucket counts."""
    import duckdb as _duckdb

    import __ray_entry__ as m
    from datapact_ray.pipelines.relational import (
        temporal_consistency_lineitem_orders,
    )

    d = tmp_path / "temporal"
    d.mkdir()
    rng = np.random.default_rng(71)
    n = 5000
    base = pd.Timestamp("2024-01-01")
    li = pd.DataFrame(
        {
            # keys 0..700: ~300 of them unmatched in orders (600+)
            "l_orderkey": rng.integers(0, 700, n).astype("float64"),
            "l_shipdate": base
            + pd.to_timedelta(rng.integers(-20, 120, n), unit="D"),
        }
    )
    li.loc[rng.random(n) < 0.1, "l_orderkey"] = np.nan
    li.loc[rng.random(n) < 0.1, "l_shipdate"] = pd.NaT
    li.to_parquet(d / "lineitem.parquet", row_group_size=512)

    ok = np.arange(0, 600, dtype="int64")
    # duplicate a slice of order keys: SQL fan-out must multiply
    ok = np.concatenate([ok, ok[:50]])
    orders = pd.DataFrame(
        {
            "o_orderkey": ok,
            "o_orderdate": base
            + pd.to_timedelta(
                rng.integers(0, 30, len(ok)), unit="D"
            ),
        }
    )
    orders.loc[rng.random(len(ok)) < 0.1, "o_orderdate"] = pd.NaT
    orders.to_parquet(d / "orders.parquet", row_group_size=512)

    got = temporal_consistency_lineitem_orders(str(d))
    con = _duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{d}/{t}.parquet')"
        )
    want = con.execute(
        m.oracle_sql()["temporal_consistency_lineitem_orders"]
    ).fetchdf()
    con.close()
    _assert_eq(got, want, "temporal_consistency")
    assert int(got["n_violations"].iloc[0]) > 0
    assert int(got["min_lag_days"].iloc[0]) < 0

    a = temporal_consistency_lineitem_orders(str(d), num_buckets=3)
    b = temporal_consistency_lineitem_orders(str(d), num_buckets=23)
    pd.testing.assert_frame_equal(a, b)


def test_mutual_info_nulls_and_dependence(tmp_path):
    """MI contingency: rows with a NULL in EITHER column drop whole
    (SQL WHERE both NOT NULL); a deterministic status=f(priority)
    fixture scores ln(2) while a shuffled-independent one scores ~0."""
    import duckdb as _duckdb

    import __ray_entry__ as m
    from datapact_ray.pipelines.stats import mutual_info_orders

    rng = np.random.default_rng(79)
    n = 4000

    def write(d, dependent):
        d.mkdir()
        pri = np.array(["1-URGENT", "2-HIGH"])[rng.integers(0, 2, n)]
        if dependent:
            status = np.where(pri == "1-URGENT", "F", "O")
        else:
            status = np.array(["F", "O"])[rng.integers(0, 2, n)]
        orders = pd.DataFrame(
            {"o_orderpriority": pri, "o_orderstatus": status}
        )
        orders.loc[rng.random(n) < 0.12, "o_orderpriority"] = None
        orders.loc[rng.random(n) < 0.12, "o_orderstatus"] = None
        orders.to_parquet(d / "orders.parquet", row_group_size=512)
        return str(d)

    for name, dep in (("dep", True), ("ind", False)):
        d = write(tmp_path / name, dep)
        got = mutual_info_orders(d)
        con = _duckdb.connect()
        con.execute(
            "CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{d}/orders.parquet')"
        )
        want = con.execute(m.oracle_sql()["mutual_info_orders"]).fetchdf()
        con.close()
        _assert_eq(got, want, f"mutual_info_{name}")
        mi = float(got["mi_nats"].iloc[0])
        if dep:
            assert mi > 0.6  # ln(2) ~ 0.693 for a balanced bijection
        else:
            assert mi < 0.01


def test_null_required_int_column_fails_loudly(tmp_path):
    """A null in an integer column an operator requires but does not
    null-drop (e.g. event_id in the transition census) must raise, not
    silently become INT64_MIN garbage (pandas-path parity)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "ev"
    d.mkdir()
    n = 200
    t = pa.table(
        {
            "event_id": pa.array(
                [None if i == 7 else i for i in range(n)], type=pa.int64()
            ),
            "ts": pa.array(
                np.datetime64("2024-01-01") + np.arange(n).astype("timedelta64[s]")
            ),
            "user_id": pa.array(np.arange(n) % 11),
            "event_type": pa.array(["a", "b"] * (n // 2)),
            "value": pa.array(np.ones(n)),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(t, str(d / "events.parquet"))
    from datapact_ray.pipelines.windows import event_type_transitions_events

    with pytest.raises(Exception, match="null values in an integer column"):
        event_type_transitions_events(str(d), num_buckets=3)
