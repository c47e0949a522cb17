"""Misra–Gries guarantee tests: est ≤ true ≤ est + offset for present
keys; every key with true count > offset is present — under adversarial
batching (heavy key spread thin across many partials)."""

import numpy as np
import pytest

from datapact_ray.sketches import MisraGries


def _true_counts(batches):
    out = {}
    for keys, counts in batches:
        for k, c in zip(keys, counts):
            out[k] = out.get(k, 0) + int(c)
    return out


@pytest.mark.parametrize("seed", [1, 7])
def test_bounds_and_capture_under_merging(seed):
    rng = np.random.default_rng(seed)
    # 500 cold keys + 5 hot keys; hot keys spread across ALL batches so
    # per-batch truncation heuristics would drop them
    batches = []
    for _ in range(40):
        cold = rng.choice(500, 30, replace=False)
        keys = [f"cold{c}" for c in cold] + [f"hot{h}" for h in range(5)]
        counts = list(rng.integers(1, 4, 30)) + list(rng.integers(20, 40, 5))
        batches.append((keys, counts))

    partials = []
    for keys, counts in batches:
        mg = MisraGries(k=16)
        mg.add_value_counts(np.array(keys), np.array(counts))
        partials.append(mg)
    merged = partials[0]
    for p in partials[1:]:
        merged = merged.merge(p)

    true = _true_counts(batches)
    total = sum(true.values())
    # offset is bounded by n/(k+1)
    assert merged.offset <= total // (16 + 1) + 1

    present = dict((k, (e, u)) for k, e, u in merged.items_with_bounds())
    for key, (est, upper) in present.items():
        assert est <= true[key] <= upper, key
    for key, cnt in true.items():
        if cnt > merged.offset:
            assert key in present, (key, cnt, merged.offset)
    # the five hot keys must all be captured and ranked on top
    topk = [k for k, _, _ in merged.items_with_bounds()[:5]]
    assert sorted(topk) == [f"hot{h}" for h in range(5)]


def test_serialization_roundtrip():
    mg = MisraGries(k=4)
    mg.add_value_counts(np.array(["a", "b", "c"]), np.array([5, 3, 2]))
    mg2 = MisraGries.from_bytes(mg.to_bytes())
    assert mg2.counts == mg.counts and mg2.offset == mg.offset and mg2.k == 4
