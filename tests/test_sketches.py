import numpy as np

from datapact_ray.sketches import (
    BloomFilter,
    HyperLogLog,
    TDigest,
    TopKCounter,
    hash_columns_u64,
    ks_statistic,
    psi_statistic,
)


def test_tdigest_quantiles_close():
    rng = np.random.default_rng(1)
    data = rng.normal(100.0, 15.0, 200_000)
    d = TDigest()
    for chunk in np.array_split(data, 20):
        d.add(chunk)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = d.quantile(np.array([q]))[0]
        true = np.quantile(data, q)
        assert abs(est - true) < 1.0, (q, est, true)
    assert d.min == data.min() and d.max == data.max()


def test_tdigest_merge_equivalent():
    rng = np.random.default_rng(2)
    a, b = rng.exponential(5.0, 50_000), rng.exponential(5.0, 50_000)
    da, db = TDigest(), TDigest()
    da.add(a)
    db.add(b)
    merged = da.merge(db)
    full = TDigest()
    full.add(np.concatenate([a, b]))
    q = np.array([0.1, 0.5, 0.9])
    assert np.allclose(merged.quantile(q), full.quantile(q), rtol=0.05)
    # serialization round-trip
    rt = TDigest.from_bytes(merged.to_bytes())
    assert np.allclose(rt.quantile(q), merged.quantile(q))


def test_ks_and_psi_detect_shift():
    rng = np.random.default_rng(3)
    a, b = TDigest(), TDigest()
    a.add(rng.normal(0, 1, 100_000))
    b.add(rng.normal(0, 1, 100_000))
    same_ks = ks_statistic(a, b)
    same_psi = psi_statistic(a, b)
    c = TDigest()
    c.add(rng.normal(1.0, 1, 100_000))  # 1-sigma shift
    shift_ks = ks_statistic(a, c)
    shift_psi = psi_statistic(a, c)
    assert same_ks < 0.05 and shift_ks > 0.3
    assert same_psi < 0.05 and shift_psi > 0.5


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(4)
    hashes = rng.integers(0, 2**64, 500_000, dtype=np.uint64)
    true = len(np.unique(hashes))
    h1, h2 = HyperLogLog(), HyperLogLog()
    h1.add_hashes(hashes[:250_000])
    h2.add_hashes(hashes[250_000:])
    est = h1.merge(h2).estimate()
    assert abs(est - true) / true < 0.03
    small = HyperLogLog()
    small.add_hashes(hashes[:100])
    assert abs(small.estimate() - len(np.unique(hashes[:100]))) <= 3


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(5)
    members = rng.integers(0, 2**63, 10_000, dtype=np.int64).astype(np.uint64)
    others = rng.integers(0, 2**63, 10_000, dtype=np.int64).astype(np.uint64)
    b = BloomFilter(len(members), fpp=0.01)
    b.add_hashes(members)
    assert b.contains_hashes(members).all()
    fp_rate = b.contains_hashes(others).mean()
    assert fp_rate < 0.03


def test_hash_columns_deterministic():
    import pandas as pd

    df = pd.DataFrame({"a": ["x", "y", None], "b": [1, 2, 3]})
    h1 = hash_columns_u64(df, ["a", "b"])
    h2 = hash_columns_u64(df.copy(), ["a", "b"])
    assert (h1 == h2).all()
    assert len(set(h1.tolist())) == 3


def test_topk_counter():
    t = TopKCounter(4)
    t.add_value_counts(np.array(["a", "b", "c"]), np.array([100, 5, 3]))
    t2 = TopKCounter(4)
    t2.add_value_counts(np.array(["a", "d"]), np.array([50, 2]))
    merged = t.merge(t2)
    assert merged.hot_keys(120) == {"a": 150}


def test_warmcache_builds_once():
    from datapact_ray import warmcache

    calls = []
    k = object()
    assert warmcache.get_or_build(k, lambda: calls.append(1) or "v") == "v"
    assert warmcache.get_or_build(k, lambda: calls.append(1) or "v2") == "v"
    assert len(calls) == 1
    # overflow drops the map rather than evicting piecemeal
    for i in range(warmcache._MAX_ENTRIES + 1):
        warmcache.get_or_build(("k", i), lambda: i)
    assert len(warmcache._CACHE) <= warmcache._MAX_ENTRIES
