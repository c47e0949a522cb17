"""Big NON-parquet dim referential (round-3 item #3): the dim key set
must be partitioned object-store-side — the driver never materializes a
key array. Verified three ways: exact orphan counts through both probe
kinds (Dataset probe and parquet probe), a structural guard that the
driver-side distinct-hash collector is never invoked on this path, and
a driver peak-RSS bound far below what the old argsort-on-driver path
allocated."""

import os
import resource

import numpy as np
import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq
import pytest
import ray.data

import datapact_ray.stages.referential as refmod
from datapact_ray.stages.referential import run_referential_pass

N_DIM = 3_000_000
THRESHOLD = 100_000  # force the big-dim route at test scale


@pytest.fixture(scope="module")
def csv_dim(tmp_path_factory):
    out = tmp_path_factory.mktemp("csv_dim")
    path = str(out / "dim.csv")
    pacsv.write_csv(
        pa.table({"conv_id": np.arange(N_DIM, dtype=np.int64)}), path
    )
    return path


@pytest.fixture(scope="module")
def probe_tables(tmp_path_factory):
    """Probe rows: 20k keys inside the dim + exactly 500 orphans."""
    out = tmp_path_factory.mktemp("probe")
    rng = np.random.default_rng(5)
    inside = rng.integers(0, N_DIM, 20_000, dtype=np.int64)
    orphans = np.arange(N_DIM + 1, N_DIM + 501, dtype=np.int64)
    keys = np.concatenate([inside, orphans])
    rng.shuffle(keys)
    table = pa.table({"conv_id": keys})
    pq_path = str(out / "probe.parquet")
    pq.write_table(table, pq_path, row_group_size=4096)
    return table, pq_path


def _no_driver_hashes(monkeypatch):
    def boom(*a, **k):
        raise AssertionError(
            "_distinct_key_hashes must not run for a big non-parquet dim"
        )

    monkeypatch.setattr(refmod, "_distinct_key_hashes", boom)


def test_csv_dim_dataset_probe_exact_and_driver_flat(
    csv_dim, probe_tables, monkeypatch
):
    _no_driver_hashes(monkeypatch)
    table, _ = probe_tables
    rss_before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB
    m = run_referential_pass(
        ray.data.from_arrow(table),
        ray.data.read_csv(csv_dim),
        ["conv_id"],
        ["conv_id"],
        cap=10,
        bloom_threshold=THRESHOLD,
        ref_files=[csv_dim],
        probe_files=None,
        small_dim_bytes=1 << 20,  # the 23 MB CSV must not take the small path
    )
    rss_after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert m.probed_rows == 20_500
    assert m.orphan_rows == 500
    assert len(m.violations) == 10  # capped definite-orphan samples
    # old path: 3M-key uint64 array + argsort copies ≥ 72 MB on the
    # driver; new path holds only P Bloom byte strings (~6 MB at
    # fpp=1e-3). Generous slack for allocator noise.
    growth_mb = (rss_after - rss_before) / 1024
    assert growth_mb < 40, f"driver RSS grew {growth_mb:.0f} MB — key array leaked?"


def test_csv_dim_parquet_probe_exact(csv_dim, probe_tables, monkeypatch):
    _no_driver_hashes(monkeypatch)
    _, pq_path = probe_tables
    m = run_referential_pass(
        None,
        ray.data.read_csv(csv_dim),
        ["conv_id"],
        ["conv_id"],
        cap=25,
        bloom_threshold=THRESHOLD,
        ref_files=[csv_dim],
        probe_files=[pq_path],
        small_dim_bytes=1 << 20,
    )
    assert m.probed_rows == 20_500
    assert m.orphan_rows == 500
    assert len(m.violations) == 25
    for v in m.violations:
        assert v["side"] == "probe"


def test_small_csv_dim_still_broadcasts(tmp_path):
    """Below the threshold the broadcast path still serves non-parquet
    dims (materialized once, object-store broadcast)."""
    path = str(tmp_path / "small.csv")
    pacsv.write_csv(pa.table({"conv_id": np.arange(1000, dtype=np.int64)}), path)
    probe = ray.data.from_arrow(
        pa.table({"conv_id": np.array([1, 2, 5000], dtype=np.int64)})
    )
    m = run_referential_pass(
        probe,
        ray.data.read_csv(path),
        ["conv_id"],
        ["conv_id"],
        cap=10,
        bloom_threshold=100_000,
        ref_files=[path],
        probe_files=None,
    )
    assert m.probed_rows == 3 and m.orphan_rows == 1
