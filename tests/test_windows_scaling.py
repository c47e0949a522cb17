"""Data-scaled partitioning for the stream-shaped operators: results
must be invariant to the bucket count (each key lands wholly in one
bucket), so the fan-out can grow with data size without changing
semantics."""

import pandas as pd

from datapact_ray.pipelines.windows import (
    asof_value_per_order,
    scaled_num_buckets,
    sessionize_events,
)

SF_DIR = "/root/testdata/sf0.001"


def test_sessionize_bucket_count_invariant():
    a = sessionize_events(SF_DIR, num_buckets=3)
    b = sessionize_events(SF_DIR, num_buckets=16)
    pd.testing.assert_frame_equal(a, b)


def test_asof_bucket_count_invariant():
    a = asof_value_per_order(SF_DIR, num_buckets=2)
    b = asof_value_per_order(SF_DIR, num_buckets=11)
    pd.testing.assert_frame_equal(a, b)


def test_scaled_num_buckets_grows_with_data():
    small = scaled_num_buckets(10_000)
    big = scaled_num_buckets(1_000_000_000)
    assert small < big
    assert big == 251  # 1e9 rows / 4M target + 1 (runner.py's constant)
    assert scaled_num_buckets(10**12) == 4096  # capped


def test_join_partition_count_invariant_and_scaled():
    """join_orders_customer sizes partitions from footer row counts
    (never a fixed fan-out) and its result is invariant to the count."""
    from datapact_ray.pipelines.relational import join_orders_customer

    a = join_orders_customer(SF_DIR, num_partitions=2)
    b = join_orders_customer(SF_DIR, num_partitions=13)
    c = join_orders_customer(SF_DIR)  # footer-derived
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, c)


def test_asof_time_slice_invariant():
    """Hot-key time slicing: with tiny slice widths a key's rows split
    across many (key, slice) buckets and unresolved orders resolve via
    the driver stitch — result must equal the unsliced run. (The
    testdata makes this a hard test: events are years after orders, so
    sliced runs stitch nearly every match across slices.)"""
    a = asof_value_per_order(SF_DIR, num_buckets=4)
    for sd, nb in ((365, 4), (90, 9), (30, 16)):
        b = asof_value_per_order(SF_DIR, num_buckets=nb, slice_days=sd)
        pd.testing.assert_frame_equal(a, b)


def test_range_join_time_slice_invariant():
    """Range-join halo duplication: slice width clamps to >= window so
    each lineitem ships to <=2 slices; result invariant to slicing."""
    from datapact_ray.pipelines.windows import range_join_orders_lineitem

    a = range_join_orders_lineitem(SF_DIR, num_buckets=4)
    for sd, nb in ((365, 4), (30, 9), (7, 16), (3, 5)):  # 3 clamps to 7
        b = range_join_orders_lineitem(SF_DIR, num_buckets=nb, slice_days=sd)
        pd.testing.assert_frame_equal(a, b)
