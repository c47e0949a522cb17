"""Funnel conversion latency (first→then strictly after): planted
users with known latencies; strictly-after and never-converted edges;
oracle parity on testdata and the fixture; bucket-count invariance."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from datapact_ray.pipelines.windows import (
    _funnel_latency_sql,
    funnel_latency_events,
)

SF = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _exact(got: pd.DataFrame, d: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet')"
    )
    try:
        want = con.execute(_funnel_latency_sql()).fetchdf()
    finally:
        con.close()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False, check_exact=True,
    )


def _events_dir(tmp_path, rows):
    """rows: (user_id, event_type, ts_us)"""
    d = tmp_path / "sf"
    d.mkdir(parents=True)
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    t = pa.table(
        {
            "event_id": pa.array(range(len(df)), pa.int64()),
            "ts": pa.Array.from_pandas(
                pd.to_datetime(df["ts"], unit="us"), type=pa.timestamp("us")
            ),
            "user_id": pa.array(df["user_id"], pa.int64()),
            "event_type": pa.array(df["event_type"], pa.string()),
            "value": pa.array([1.0] * len(df), pa.float64()),
            "props": pa.array(["{}"] * len(df), pa.string()),
        }
    )
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


def test_funnel_latency_oracle_exact_testdata():
    _exact(funnel_latency_events(SF), SF)


def test_funnel_latency_planted(tmp_path):
    base = 1_700_000_000_000_000
    rows = [
        # u1: view at 0, click at +30s → latency 30
        (1, "view", base), (1, "click", base + 30_000_000),
        # u2: click BEFORE view only → step1 user, not converted
        (2, "click", base - 5_000_000), (2, "view", base),
        # u3: click exactly AT first view → strictly-after excludes it,
        #     the later click at +90s converts
        (3, "view", base), (3, "click", base), (3, "click", base + 90_000_000),
        # u4: view only → not converted
        (4, "view", base),
        # u5: clicks only → not even a step-1 user
        (5, "click", base + 1_000_000),
        # u1 noise: a second, earlier-ignored view after the click
        (1, "view", base + 60_000_000),
    ]
    d = _events_dir(tmp_path, rows)
    got = funnel_latency_events(d)
    r = got.iloc[0]
    assert r["n_step1"] == 4       # u1..u4 have a view
    assert r["n_converted"] == 2   # u1 (30s), u3 (90s)
    assert r["mean_latency_sec"] == 60.0
    assert r["min_latency_sec"] == 30.0
    assert r["max_latency_sec"] == 90.0
    _exact(got, d)
    # bucket-count invariance: the user-hash exchange must not change
    # any number
    pd.testing.assert_frame_equal(
        got, funnel_latency_events(d, num_buckets=7), check_exact=True
    )


def test_funnel_latency_empty(tmp_path):
    d = _events_dir(tmp_path, [(1, "error", 1_700_000_000_000_000)])
    got = funnel_latency_events(d)
    r = got.iloc[0]
    assert r["n_step1"] == 0 and r["n_converted"] == 0
    assert pd.isna(r["mean_latency_sec"])
    _exact(got, d)


def test_funnel_latency_null_ts_excluded(tmp_path):
    """A NULL-ts 'view' must NOT poison a user's first-step MIN (pandas
    would cast NaT to -2^63 and convert every later click with a ~2^63
    µs latency); SQL MIN ignores NULLs, so both engines must."""
    base = 1_700_000_000_000_000
    rows = [
        (1, "view", None),                  # poison row if not dropped
        (1, "click", base),                 # no non-null view before it
        (2, "view", base), (2, "click", base + 10_000_000),
    ]
    d = _events_dir(tmp_path, rows)
    got = funnel_latency_events(d)
    r = got.iloc[0]
    assert r["n_step1"] == 1      # only u2 has a (non-null) view
    assert r["n_converted"] == 1
    assert r["max_latency_sec"] == 10.0
    _exact(got, d)
