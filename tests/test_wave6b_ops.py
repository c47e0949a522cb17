"""Key-set INTERSECT/EXCEPT census, per-dimension embedding moments,
TF-IDF vocabulary: null parity, bucket invariance, and fixtures proving
discrimination (seeded orphans both directions; seeded per-dim
mean/std; a stopword that TF ranks #1 but TF-IDF scores ~0)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from datapact_ray.pipelines.ann import (
    ORACLE_SQL as ANN_ORACLE,
    dim_moments_embeddings,
)
from datapact_ray.pipelines.quality import (
    ORACLE_SQL as QUAL_ORACLE,
    key_set_ops_orders_customer,
)
from datapact_ray.pipelines.text import (
    ORACLE_SQL as TEXT_ORACLE,
    tfidf_top_terms_documents,
)


def _duck(sql: str, d: str, tables) -> pd.DataFrame:
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{d}/{t}.parquet')"
        )
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


@pytest.fixture(scope="module")
def setops_dir(tmp_path_factory):
    """Customers 1..1000; orders reference 200..1150 (so 151 orphan
    order keys, 199 never-ordered customers, 801 shared) with duplicate
    order rows per key and NULL keys sprayed on both sides."""
    d = tmp_path_factory.mktemp("setops")
    rng = np.random.default_rng(11)
    cust = pd.DataFrame({"c_custkey": np.arange(1, 1001, dtype="int64")})
    cust.loc[len(cust)] = [pd.NA]  # NULL must NOT match NULL
    cust["c_custkey"] = cust["c_custkey"].astype("Int64")
    keys = rng.integers(200, 1151, 5000)
    orders = pd.DataFrame({"o_custkey": keys.astype("int64")}).astype(
        {"o_custkey": "Int64"}
    )
    orders.loc[rng.random(len(orders)) < 0.02, "o_custkey"] = pd.NA
    cust.to_parquet(d / "customer.parquet", row_group_size=256)
    orders.to_parquet(d / "orders.parquet", row_group_size=512)
    return str(d)


def test_key_set_ops_parity_and_orphans(setops_dir):
    got = key_set_ops_orders_customer(setops_dir)
    want = _duck(
        QUAL_ORACLE["key_set_ops_orders_customer"],
        setops_dir,
        ("orders", "customer"),
    )
    for c in got.columns:
        assert int(got.loc[0, c]) == int(want.loc[0, c]), c
    # seeded geometry: orphan order keys exist in BOTH directions
    assert int(got.loc[0, "n_only_orders"]) > 100
    assert int(got.loc[0, "n_only_customer"]) > 100
    assert int(got.loc[0, "n_intersect"]) > 700
    # identity: set sizes decompose exactly
    assert int(got.loc[0, "n_orders_keys"]) == int(
        got.loc[0, "n_intersect"]
    ) + int(got.loc[0, "n_only_orders"])


def test_key_set_ops_bucket_invariance(setops_dir):
    a = key_set_ops_orders_customer(setops_dir, num_buckets=2)
    b = key_set_ops_orders_customer(setops_dir, num_buckets=31)
    assert a.values.tolist() == b.values.tolist()


@pytest.fixture(scope="module")
def emb_dir(tmp_path_factory):
    """3-dim embeddings with per-dim seeded (mean, std): (5, 0.1),
    (-3, 2.0), (0, 1.0); NULL embeddings sprayed."""
    d = tmp_path_factory.mktemp("emb")
    rng = np.random.default_rng(5)
    n = 4000
    m = np.stack(
        [
            rng.normal(5.0, 0.1, n),
            rng.normal(-3.0, 2.0, n),
            rng.normal(0.0, 1.0, n),
        ],
        axis=1,
    ).astype(np.float32)
    df = pd.DataFrame(
        {"vec_id": np.arange(n, dtype="int64"), "embedding": list(m)}
    )
    df.loc[rng.random(n) < 0.05, "embedding"] = None
    df.to_parquet(d / "embeddings.parquet", row_group_size=512)
    return str(d)


def test_dim_moments_parity_and_seeded_shape(emb_dir):
    got = dim_moments_embeddings(emb_dir)
    want = _duck(
        ANN_ORACLE["dim_moments_embeddings"], emb_dir, ("embeddings",)
    )
    assert got["i"].tolist() == want["i"].astype("int64").tolist()
    assert got["n"].tolist() == want["n"].astype("int64").tolist()
    for c in ("mean", "std"):
        for x, y in zip(got[c], want[c]):
            assert float(x) == pytest.approx(float(y), abs=2e-6), c
    m = got.set_index("i")
    assert m.loc[1, "mean"] == pytest.approx(5.0, abs=0.02)
    assert m.loc[1, "std"] == pytest.approx(0.1, abs=0.02)
    assert m.loc[2, "mean"] == pytest.approx(-3.0, abs=0.1)
    assert m.loc[2, "std"] == pytest.approx(2.0, abs=0.1)


def test_dim_moments_single_vector_std_null(tmp_path):
    pd.DataFrame(
        {"vec_id": [0], "embedding": [np.array([1.5, 2.5], dtype=np.float32)]}
    ).to_parquet(tmp_path / "embeddings.parquet")
    got = dim_moments_embeddings(str(tmp_path))
    want = _duck(
        ANN_ORACLE["dim_moments_embeddings"], str(tmp_path), ("embeddings",)
    )
    assert got["mean"].tolist() == [1.5, 2.5]
    assert got["std"].isna().all() and want["std"].isna().all()


@pytest.fixture(scope="module")
def tfidf_dir(tmp_path_factory):
    """'the' appears in EVERY doc many times (top TF, zero IDF);
    'quantum' appears 30x total but only in 3 docs (top TF-IDF)."""
    d = tmp_path_factory.mktemp("tfidf")
    rng = np.random.default_rng(3)
    fillers = np.array(["alpha", "beta", "gamma", "delta"])
    rows = []
    for i in range(200):
        words = ["the", "the", "the"] + list(
            fillers[rng.integers(0, 4, 10)]
        )
        if i < 3:
            words += ["quantum"] * 10
        rows.append(" ".join(words))
    df = pd.DataFrame({"doc_id": np.arange(200, dtype="int64"), "text": rows})
    df.loc[rng.random(200) < 0.03, "text"] = None
    df.to_parquet(d / "documents.parquet", row_group_size=64)
    return str(d)


def test_tfidf_parity_and_stopword_suppression(tfidf_dir):
    got = tfidf_top_terms_documents(tfidf_dir)
    want = _duck(
        TEXT_ORACLE["tfidf_top_terms_documents"], tfidf_dir, ("documents",)
    )
    assert got["token"].tolist() == want["token"].tolist()
    assert got["tf"].tolist() == want["tf"].astype("int64").tolist()
    assert got["df"].tolist() == want["df"].astype("int64").tolist()
    for x, y in zip(got["tfidf"], want["tfidf"]):
        assert float(x) == pytest.approx(float(y), abs=1e-9)
    # 'quantum' (rare, bursty) outranks 'the' (everywhere → ln(N/N)=0)
    toks = got.set_index("token")["tfidf"]
    assert toks.index[0] == "quantum"
    assert toks["quantum"] > 50.0
    assert "the" not in toks.index or toks["the"] == 0.0
    # and plain TF would have ranked 'the' first — the op discriminates
    tf_rank = got.sort_values(
        ["tf", "token"], ascending=[False, True]
    )["token"].tolist()
    assert tf_rank[0] == "the"
