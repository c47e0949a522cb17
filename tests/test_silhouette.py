"""Silhouette label-quality audit (ann.py): separated vs overlapping
Gaussian fixtures prove the score discriminates (testdata labels are
random hyperplane buckets, scoring near 0), the single-label edge
yields SQL's NULL mean, and NULL label/embedding rows drop on both
engines."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from datapact_ray.pipelines.ann import ORACLE_SQL, silhouette_labels_embeddings


def _write(d, vecs, labels, name="embeddings.parquet"):
    pd.DataFrame(
        {
            "vec_id": np.arange(len(labels), dtype="int64"),
            "embedding": [None if v is None else v.astype("float32") for v in vecs],
            "label": pd.array(labels, dtype="Int32"),
        }
    ).to_parquet(f"{d}/{name}", row_group_size=64)


def _duck(sql: str, d: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet')"
    )
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _check(d) -> pd.DataFrame:
    got = silhouette_labels_embeddings(d).reset_index(drop=True)
    want = _duck(ORACLE_SQL["silhouette_labels_embeddings"], d).reset_index(
        drop=True
    )
    assert len(got) == len(want)
    for c in ("label", "n_vectors"):
        assert got[c].tolist() == want[c].astype("int64").tolist(), c
    for x, y in zip(got["mean_silhouette"], want["mean_silhouette"]):
        if pd.isna(x) and pd.isna(y):
            continue
        assert float(x) == pytest.approx(float(y), abs=2e-6), (x, y)
    return got


def test_separated_vs_overlapping(tmp_path):
    rng = np.random.default_rng(11)
    n = 300
    lab = rng.integers(0, 3, n)
    centers = np.array([[0.0] * 16, [50.0] * 16, [-50.0] * 16])
    sep = tmp_path / "sep"
    sep.mkdir()
    _write(sep, list(centers[lab] + rng.normal(0, 0.5, (n, 16))), lab)
    ovl = tmp_path / "ovl"
    ovl.mkdir()
    _write(ovl, list(centers[lab] * 0.01 + rng.normal(0, 5.0, (n, 16))), lab)

    s_sep = _check(str(sep))
    s_ovl = _check(str(ovl))
    assert (s_sep["mean_silhouette"] > 0.9).all()
    assert (s_ovl["mean_silhouette"].abs() < 0.2).all()


def test_single_label_null_mean_and_null_rows(tmp_path):
    rng = np.random.default_rng(3)
    vecs = list(rng.normal(0, 1, (50, 8)))
    labels = [7] * 50
    vecs[0] = None  # NULL embedding drops
    labels[1] = None  # NULL label drops
    _write(tmp_path, vecs, labels)
    got = _check(str(tmp_path))
    assert got["label"].tolist() == [7]
    assert int(got.loc[0, "n_vectors"]) == 48
    assert pd.isna(got.loc[0, "mean_silhouette"])
