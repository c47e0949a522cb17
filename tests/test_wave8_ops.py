"""Round-3d operators: split-bias chi-square, embedding drift between
cohorts, PCA power iteration. Seeded fixtures carry discrimination
(testdata's md5 split is unbiased, its embeddings isotropic and
cohort-homogeneous): a source column DERIVED from the split nibble
drives chi-square to the table maximum, a +0.5 shift planted in odd
vec_ids' dim 1 shows in exactly that dim, and a 100:1 anisotropic cloud
concentrates >0.9 of variance in the top component."""

import hashlib
import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from datapact_ray.pipelines.ann import (
    ORACLE_SQL as ANN_SQL,
    embedding_drift_cohorts,
    pca_power_embeddings,
)
from datapact_ray.pipelines.curation import (
    ORACLE_SQL as CURATION_SQL,
    split_bias_chisq_documents,
)


def _duck(sql: str, d: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{d}/{t}.parquet')"
        )
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _assert_oracle_exact(got: pd.DataFrame, sql: str, d: str):
    want = _duck(sql, d)
    g = got.sort_values(list(got.columns)).reset_index(drop=True)
    w = (
        want[got.columns.tolist()]
        .sort_values(list(got.columns))
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)


def _write_docs(d, doc_ids, sources):
    pd.DataFrame(
        {
            "doc_id": np.asarray(doc_ids, dtype="int64"),
            "source": sources,
        }
    ).to_parquet(d / "documents.parquet", row_group_size=64)


def _nibble_split(doc_id: int) -> str:
    nib = hashlib.md5(str(doc_id).encode()).hexdigest()[0]
    return "train" if nib < "c" else ("val" if nib < "f" else "test")


@pytest.fixture(scope="module")
def biased_dir(tmp_path_factory):
    """source := the doc's own split bucket — maximal dependence."""
    d = tmp_path_factory.mktemp("w8_biased")
    ids = list(range(600))
    _write_docs(d, ids, [f"crawl_{_nibble_split(i)}" for i in ids])
    pd.DataFrame(
        {"vec_id": [0, 1], "embedding": [[0.0, 1.0], [1.0, 0.0]]}
    ).to_parquet(d / "embeddings.parquet")
    return str(d)


@pytest.fixture(scope="module")
def fair_dir(tmp_path_factory):
    """source := doc_id % 3 — independent of the md5 nibble."""
    d = tmp_path_factory.mktemp("w8_fair")
    ids = list(range(600))
    _write_docs(d, ids, [f"crawl_{i % 3}" for i in ids])
    # embeddings: dim 1 of ODD vec_ids shifted +0.5; dims 2-4 clean
    rng = np.random.default_rng(11)
    n = 400
    emb = rng.normal(0.0, 0.05, size=(n, 4))
    vec_id = np.arange(n, dtype="int64")
    emb[vec_id % 2 == 1, 0] += 0.5
    pd.DataFrame(
        {
            "vec_id": vec_id,
            "embedding": [row.astype(np.float32).tolist() for row in emb],
        }
    ).to_parquet(d / "embeddings.parquet", row_group_size=128)
    return str(d)


@pytest.fixture(scope="module")
def aniso_dir(tmp_path_factory):
    """Embedding cloud stretched 100:1 along a planted direction."""
    d = tmp_path_factory.mktemp("w8_aniso")
    rng = np.random.default_rng(7)
    n, dim = 500, 16
    direction = np.zeros(dim)
    direction[3] = 1.0
    emb = rng.normal(0.0, 0.05, size=(n, dim))
    emb += np.outer(rng.normal(0.0, 5.0, size=n), direction)
    pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype="int64"),
            "embedding": [row.astype(np.float32).tolist() for row in emb],
        }
    ).to_parquet(d / "embeddings.parquet", row_group_size=100)
    _write_docs(d, [0], ["s"])
    return str(d)


def test_split_bias_detects_dependence(biased_dir, fair_dir):
    got_b = split_bias_chisq_documents(biased_dir)
    _assert_oracle_exact(
        got_b, CURATION_SQL["split_bias_chisq_documents"], biased_dir
    )
    got_f = split_bias_chisq_documents(fair_dir)
    _assert_oracle_exact(
        got_f, CURATION_SQL["split_bias_chisq_documents"], fair_dir
    )
    n = int(got_b.loc[0, "n_rows"])
    # perfect dependence over 3x3: chi2 = n * (min(r,c) - 1) = 2n
    assert got_b.loc[0, "chi2"] == pytest.approx(2.0 * n, rel=1e-9)
    # independent split: far below any rejection threshold (df = 4)
    assert got_f.loc[0, "chi2"] < 20.0


def test_embedding_drift_localizes_shift(fair_dir):
    got = embedding_drift_cohorts(fair_dir)
    _assert_oracle_exact(got, ANN_SQL["embedding_drift_cohorts"], fair_dir)
    g = got.set_index("i")
    assert abs(g.loc[1, "shift"] + 0.5) < 0.02   # odd cohort is +0.5
    for i in (2, 3, 4):
        assert abs(g.loc[i, "shift"]) < 0.02
    assert int(g.loc[1, "n_even"]) == 200 and int(g.loc[1, "n_odd"]) == 200


def test_pca_power_finds_planted_direction(aniso_dir):
    got = pca_power_embeddings(aniso_dir)
    row = got.iloc[0]
    assert int(row["n_vecs"]) == 500 and int(row["dim"]) == 16
    assert row["explained_ratio"] > 0.9
    assert row["residual"] < 1e-6
    # audit against the dense eigensolver on the exact same scatter
    emb = np.stack(
        pd.read_parquet(f"{aniso_dir}/embeddings.parquet")["embedding"]
        .to_numpy()
    ).astype(np.float64)
    c = emb - emb.mean(axis=0)
    lam_true = float(np.linalg.eigvalsh(c.T @ c)[-1])
    assert abs(row["top_eigenvalue"] - lam_true) / lam_true < 1e-6


def test_pca_isotropic_low_ratio():
    got = pca_power_embeddings("/root/testdata/sf0.001")
    r = got.iloc[0]
    # 64 isotropic dims: no direction explains much more than 1/64
    assert r["explained_ratio"] < 0.05
    assert r["top_eigenvalue"] > 0
