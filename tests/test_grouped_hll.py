"""Grouped HyperLogLog: per-group estimates self-audit against the
exact grouped distinct counts within the sketch's error bound, groups
never blend (disjoint user ranges stay disjoint), and merge order
cannot matter (register-wise max is commutative)."""

import numpy as np
import pandas as pd

from datapact_ray.pipelines.relational import hll_users_per_type_events


def test_grouped_hll_accuracy_and_no_blending(tmp_path):
    rng = np.random.default_rng(41)
    # disjoint user universes per type with very different cardinalities
    spec = {"view": (0, 5000), "click": (10_000, 10_800), "buy": (20_000, 20_050)}
    frames = []
    for etype, (lo, hi) in spec.items():
        users = rng.integers(lo, hi, (hi - lo) * 4)  # repeats: dedup matters
        frames.append(
            pd.DataFrame(
                {
                    "event_id": np.arange(len(users), dtype="int64"),
                    "ts": pd.to_datetime("2024-01-01"),
                    "user_id": users.astype("int64"),
                    "event_type": etype,
                }
            )
        )
    ev = pd.concat(frames, ignore_index=True).sample(frac=1.0, random_state=7)
    ev.loc[rng.random(len(ev)) < 0.02, "user_id"] = pd.NA
    ev["user_id"] = ev["user_id"].astype("Int64")
    ev.to_parquet(tmp_path / "events.parquet", row_group_size=512)

    out = hll_users_per_type_events(str(tmp_path)).set_index("event_type")
    assert sorted(out.index) == ["buy", "click", "view"]
    for etype in out.index:
        # self-audit: estimate within 5% of exact (3σ at p=12 is ~4.9%)
        assert float(out.loc[etype, "rel_err"]) < 0.05, etype
    # cardinalities differ by 100x — blended groups could not show this
    assert int(out.loc["view", "exact_distinct"]) > 40 * int(
        out.loc["buy", "exact_distinct"]
    )
    assert float(out.loc["view", "hll_estimate"]) > 40 * float(
        out.loc["buy", "hll_estimate"]
    )
