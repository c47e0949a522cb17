"""Partitioned-Bloom referential scale path: must produce ROW-exact
orphan counts identical to the exact broadcast path, including under a
deliberately terrible Bloom FPP (false positives are re-checked exactly
per partition), and must never materialize dim keys on the driver."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datapact_ray.stages.referential import run_referential_pass


@pytest.fixture(scope="module")
def tables(tmp_path_factory):
    out = tmp_path_factory.mktemp("refscale")
    rng = np.random.default_rng(7)
    # probe: 5000 rows over keys 0..999, keys 900..999 are orphans with
    # VARYING row counts (the r1 bug: FP correction counted keys, not rows)
    keys = rng.integers(0, 1000, 5000)
    probe = str(out / "probe.parquet")
    pq.write_table(pa.table({"k": keys}), probe)
    dim = str(out / "dim.parquet")
    pq.write_table(pa.table({"k": np.arange(900)}), dim)
    expected_orphans = int((keys >= 900).sum())
    return probe, dim, expected_orphans


def test_partitioned_path_matches_exact(tables):
    probe, dim, expected = tables
    exact = run_referential_pass(
        None, None, ["k"], ["k"], ref_files=[dim], probe_files=[probe]
    )
    assert exact.orphan_rows == expected

    part = run_referential_pass(
        None,
        None,
        ["k"],
        ["k"],
        ref_files=[dim],
        probe_files=[probe],
        bloom_threshold=10,  # force the scale path
        num_partitions=5,
    )
    assert part.probed_rows == exact.probed_rows == 5000
    assert part.orphan_rows == expected
    assert part.violations  # definite orphans sampled with display values


def test_partitioned_exact_under_heavy_false_positives(tables):
    probe, dim, expected = tables
    m = run_referential_pass(
        None,
        None,
        ["k"],
        ["k"],
        ref_files=[dim],
        probe_files=[probe],
        bloom_threshold=10,
        bloom_fpp=0.5,  # every other negative is a false positive
        num_partitions=3,
        cap=2000,  # leave sample budget after the ~250 definite orphans
    )
    assert m.orphan_rows == expected  # recheck makes counts row-exact
    # FP-discovered orphan keys must also surface as display-value
    # samples: under fpp=0.5 half the orphan keys pass the Bloom and are
    # caught only by the recheck — those must appear as violations with
    # a bloom_fp marker (P[no FP among 100 keys] = 2^-100)
    import json

    sampled = {json.loads(v["key"])["k"] for v in m.violations}
    assert sampled and all(int(k) >= 900 for k in sampled)  # real orphans only
    assert any(json.loads(v["detail"]).get("bloom_fp") for v in m.violations)


def test_partitioned_no_orphans(tables):
    probe, dim, _ = tables
    m = run_referential_pass(
        None,
        None,
        ["k"],
        ["k"],
        ref_files=[probe],  # dim == probe keys superset
        probe_files=[probe],
        bloom_threshold=10,
        num_partitions=4,
    )
    assert m.orphan_rows == 0 and m.probed_rows == 5000


def test_dataset_probe_bloom_path_matches_exact(tables, ray_session):
    """Big dim + NON-parquet probe (a Dataset): the partitioned-Bloom +
    recheck path must produce the same row-exact orphan counts as the
    sorted-array broadcast, even at a terrible FPP."""
    import ray.data

    probe, dim, expected = tables
    probe_ds = ray.data.read_parquet(probe)  # stands in for CSV/JSON input
    m = run_referential_pass(
        probe_ds,
        None,
        ["k"],
        ["k"],
        ref_files=[dim],
        probe_files=None,  # non-parquet probe: no footer scan units
        bloom_threshold=10,  # force the Bloom path (900 keys > 10)
        bloom_fpp=0.5,
        num_partitions=None,
    )
    assert m.probed_rows == 5000
    assert m.orphan_rows == expected
    assert m.violations  # definite orphans sampled


def test_partitioned_single_partition(tables):
    """num_partitions=1: Ray does not unpack num_returns=1 map results;
    the build task must unwrap the whole-list chunks."""
    probe, dim, expected = tables
    m = run_referential_pass(
        None, None, ["k"], ["k"],
        ref_files=[dim], probe_files=[probe],
        bloom_threshold=10, num_partitions=1,
    )
    assert m.orphan_rows == expected


def test_dim_partition_build_unwraps_p1_lists():
    """With num_returns=1 Ray hands the build task each map task's WHOLE
    1-element list; ragged chunk lengths must still concatenate."""
    from datapact_ray.stages.referential import _dim_partition_build

    k1 = np.array([1, 2, 3], np.uint64)
    k2 = np.array([3, 4], np.uint64)  # ragged vs k1
    keys, bloom = _dim_partition_build(8, 0.01, [k1], [k2])
    assert keys.tolist() == [1, 2, 3, 4]
