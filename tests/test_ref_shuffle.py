"""Object-store-resident shuffle primitives: reduce outputs stay as
ObjectRefs (parquet_bucket_shuffle_refs) and can be re-bucketed without
driver materialization (ref_bucket_shuffle_refs)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from datapact_ray.shuffle import (
    parquet_bucket_shuffle_refs,
    ref_bucket_shuffle_refs,
)


def _write_kv(tmpdir, n=1000):
    k = np.arange(n, dtype=np.int64)
    pq.write_table(
        pa.table({"k": k, "v": (k * 3) % 17}),
        f"{tmpdir}/t.parquet",
        row_group_size=100,
    )
    return [f"{tmpdir}/t.parquet"]


def test_parquet_refs_then_rebucket(tmp_path):
    files = _write_kv(str(tmp_path))
    B = 4

    def project(tab: pa.Table) -> pd.DataFrame:
        df = tab.to_pandas()
        df["__bucket"] = (df["k"] % B).astype(np.int32)
        return df

    def stage1(tab: pa.Table, bucket_idx: int) -> pd.DataFrame:
        # per-bucket partial: per-v counts, re-bucketed by v
        df = tab.to_pandas().groupby("v", as_index=False)["k"].count()
        df = df.rename(columns={"k": "n"})
        df["__bucket"] = (df["v"] % B).astype(np.int32)
        return df

    refs = parquet_bucket_shuffle_refs(
        [(files, project, ["k", "v"], None)], None, None, B, stage1
    )
    assert len(refs) == B
    # nothing was ray.get'd yet; now re-bucket by v and merge
    def stage2(tab: pa.Table, bucket_idx: int) -> pd.DataFrame:
        df = tab.to_pandas().groupby("v", as_index=False)["n"].sum()
        return df

    out_refs = ref_bucket_shuffle_refs(refs, B, stage2)
    frames = [f for f in ray.get(out_refs) if f is not None]
    got = (
        pd.concat(frames, ignore_index=True)
        .groupby("v", as_index=False)["n"]
        .sum()
        .sort_values("v")
        .reset_index(drop=True)
    )
    want = (
        pd.DataFrame({"v": (np.arange(1000) * 3) % 17})
        .groupby("v", as_index=False)
        .size()
        .rename(columns={"size": "n"})
        .sort_values("v")
        .reset_index(drop=True)
    )
    assert got["v"].tolist() == want["v"].tolist()
    assert got["n"].astype(int).tolist() == want["n"].astype(int).tolist()


def test_empty_buckets_stay_none(tmp_path):
    files = _write_kv(str(tmp_path), n=8)
    B = 8

    def project(tab: pa.Table) -> pd.DataFrame:
        df = tab.to_pandas()
        df["__bucket"] = np.zeros(len(df), dtype=np.int32)  # all in bucket 0
        return df

    def ident(tab: pa.Table, bucket_idx: int) -> pd.DataFrame:
        return tab.to_pandas()

    refs = parquet_bucket_shuffle_refs(
        [(files, project, ["k", "v"], None)], None, None, B, ident
    )
    vals = ray.get(refs)
    assert vals[0] is not None and len(vals[0]) == 8
    assert all(v is None for v in vals[1:])
    # a chained shuffle over refs with Nones must not crash
    def count(tab: pa.Table, bucket_idx: int) -> pd.DataFrame:
        return pd.DataFrame({"n": [len(tab)]})

    def rebucket(tab: pa.Table, bucket_idx: int) -> pd.DataFrame:
        df = tab.to_pandas()
        df["__bucket"] = (df["k"] % B).astype(np.int32)
        return df

    refs2 = ref_bucket_shuffle_refs(
        ref_bucket_shuffle_refs(refs, B, rebucket), B, count
    )
    total = sum(int(f["n"].iloc[0]) for f in ray.get(refs2) if f is not None)
    assert total == 8
