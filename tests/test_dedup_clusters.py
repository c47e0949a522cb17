"""Duplicate-cluster labeling: the distributed hash-to-min label
propagation must produce the identical component structure as the
driver-side union-find on arbitrary edge lists, and the full pipeline
must match the DuckDB recursive-CTE oracle (covered again at the
conformance layer via queries()/oracle_sql())."""

import numpy as np
import pandas as pd
import pytest

from datapact_ray.pipelines.dedup import _cc_hash_to_min, _cc_union_find


def _component_sizes(labels: dict[int, int]) -> list[int]:
    lab = np.fromiter(labels.values(), dtype=np.int64, count=len(labels))
    return sorted(np.unique(lab, return_counts=True)[1].tolist())


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(0, 50, 40), (1, 200, 150), (2, 500, 700)])
def test_hash_to_min_equals_union_find(seed, n_nodes, n_edges):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    b = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    uf = _cc_union_find(a, b)
    h2m = _cc_hash_to_min(a, b, num_buckets=8)
    assert set(uf) == set(h2m)  # same node universe
    assert uf == h2m  # identical min-labels per node
    assert _component_sizes(uf) == _component_sizes(h2m)


def test_chain_converges_to_one_component():
    # a long path graph is the worst case for label propagation depth
    n = 64
    a = np.arange(n - 1, dtype=np.int64)
    b = np.arange(1, n, dtype=np.int64)
    h2m = _cc_hash_to_min(a, b, num_buckets=4)
    assert _component_sizes(h2m) == [n]
    assert all(v == 0 for v in h2m.values())


def test_pair_order_invariance():
    edges = [(5, 1), (2, 9), (9, 5)]
    a = np.array([e[0] for e in edges], dtype=np.int64)
    b = np.array([e[1] for e in edges], dtype=np.int64)
    fwd = _cc_union_find(a, b)
    rev = _cc_union_find(b[::-1].copy(), a[::-1].copy())
    assert fwd == rev == {1: 1, 2: 1, 5: 1, 9: 1}
