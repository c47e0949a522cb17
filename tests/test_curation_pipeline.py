"""End-to-end training-data curation: dedup decision + resumable
partitioned write composed together — the shape a 100-TB corpus clean-up
actually takes: (1) a fixed-width hash pass decides keep/drop per doc_id,
(2) the keep-set is broadcast, (3) a unit-parallel filtered rewrite
streams the corpus to partitioned output that resumes after a crash."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray

from datapact_ray.sink import write_partitioned_resumable


@pytest.fixture()
def corpus(tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    rng = np.random.default_rng(9)
    texts = [f"unique document number {i}" for i in range(900)]
    rows = []
    did = 0
    for t in texts:
        for _ in range(int(rng.integers(1, 4))):  # 1-3 copies each
            rows.append((did, t))
            did += 1
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    for k in range(3):
        df.iloc[k::3].to_parquet(d / f"part-{k}.parquet", row_group_size=128)
    return str(d), df


def test_dedup_then_resumable_rewrite(corpus, tmp_path):
    src, df = corpus
    out = str(tmp_path / "clean")

    # decision pass: first doc_id per distinct text wins (exact dedup)
    keep = set(
        df.sort_values("doc_id").drop_duplicates("text")["doc_id"].tolist()
    )
    keep_ref = ray.put(np.array(sorted(keep), dtype=np.int64))

    def make_filter(ref):
        def fn(t):
            import numpy as _np
            import ray as _ray

            keep_ids = _ray.get(ref)
            ids = t.column("doc_id").to_numpy()
            pos = _np.searchsorted(keep_ids, ids)
            mask = (pos < len(keep_ids)) & (keep_ids[_np.clip(pos, 0, len(keep_ids) - 1)] == ids)
            return t.filter(mask)

        return fn

    r1 = write_partitioned_resumable(
        src, out, batch_fn=make_filter(keep_ref), target_bytes=8_000
    )
    assert r1["rows"] == len(keep) == 900

    # crash + resume: only the damaged partition recomputes
    os.remove(os.path.join(out, "part-00000._SUCCESS"))
    r2 = write_partitioned_resumable(
        src, out, batch_fn=make_filter(keep_ref), target_bytes=8_000
    )
    assert r2["written"] == 1 and r2["rows"] == 900

    got = pd.concat(
        [
            pq.read_table(os.path.join(out, f)).to_pandas()
            for f in sorted(os.listdir(out))
            if f.endswith(".parquet")
        ],
        ignore_index=True,
    )
    assert sorted(got["doc_id"]) == sorted(keep)
    assert got["text"].nunique() == 900 == len(got)
