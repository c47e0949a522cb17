"""Curation-operator parity vs DuckDB on null-injected, duplicate-laden
documents (the driver fixture has no NULLs and almost no duplicate
texts, so this is where those paths are exercised), plus invariance of
the distributed results under exchange geometry (bucket counts / range
widths must not change any value — the bug class the fused-shuffle
rewrite fixed)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from datapact_ray.pipelines.curation import (
    ORACLE_SQL,
    block_packing_documents,
    curation_funnel_documents,
    shuffle_order_documents,
    split_assign_documents,
)


@pytest.fixture(scope="module")
def doc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("curation_docs")
    rng = np.random.default_rng(23)
    n = 3000
    words = np.array(["alpha", "beta", "gamma", "delta", "eps", "zeta"])
    texts = [
        " ".join(words[rng.integers(0, 6, rng.integers(3, 90))])
        for _ in range(n)
    ]
    # seeded exact duplicates: 150 docs repeat an earlier doc's text
    for i in rng.choice(np.arange(200, n), 150, replace=False):
        texts[i] = texts[int(i) % 200]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype="int64"),
            "text": texts,
            "lang": np.array(["en", "de", "fr"])[rng.integers(0, 3, n)],
            "source": "syn",
        }
    )
    df["n_chars"] = df["text"].str.len().astype("float64")
    df.loc[rng.random(n) < 0.05, "text"] = None
    df.loc[rng.random(n) < 0.05, "lang"] = None
    df.loc[rng.random(n) < 0.05, "n_chars"] = np.nan
    df.to_parquet(d / "documents.parquet", row_group_size=256)
    return str(d)


def _duck(sql: str, d: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _assert_exact(got: pd.DataFrame, want: pd.DataFrame):
    got = got[sorted(got.columns)].reset_index(drop=True)
    want = want[sorted(want.columns)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_split_assign_null_parity(doc_dir):
    _assert_exact(
        split_assign_documents(doc_dir),
        _duck(ORACLE_SQL["split_assign_documents"], doc_dir),
    )


def test_shuffle_order_null_parity(doc_dir):
    got = shuffle_order_documents(doc_dir)
    _assert_exact(got, _duck(ORACLE_SQL["shuffle_order_documents"], doc_dir))
    # permutation sanity: shards partition all docs exactly once
    assert int(got["n_docs"].sum()) == 3000


def test_shuffle_order_bucket_invariance(doc_dir):
    a = shuffle_order_documents(doc_dir, prefix_nibbles=1)
    b = shuffle_order_documents(doc_dir, prefix_nibbles=2)
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_curation_funnel_null_parity(doc_dir):
    got = curation_funnel_documents(doc_dir)
    _assert_exact(got, _duck(ORACLE_SQL["curation_funnel_documents"], doc_dir))
    n = got.set_index("stage")["n_docs"]
    # the fixture makes every stage bite: nulls < total, dups collapse
    assert n[1] < 3000 and n[2] < n[1] and n[3] <= n[2] and n[4] < n[3]


def test_block_packing_null_parity(doc_dir):
    _assert_exact(
        block_packing_documents(doc_dir),
        _duck(ORACLE_SQL["block_packing_documents"], doc_dir),
    )


def test_block_packing_bucket_invariance(doc_dir):
    a = block_packing_documents(doc_dir, bucket_docs=64)
    b = block_packing_documents(doc_dir, bucket_docs=512)
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_dup_group_sizes_null_parity(doc_dir):
    from datapact_ray.pipelines.dedup import ORACLE_SQL as DSQL
    from datapact_ray.pipelines.dedup import dup_group_sizes_documents

    got = dup_group_sizes_documents(doc_dir)
    _assert_exact(got, _duck(DSQL["dup_group_sizes_documents"], doc_dir))
    # the seeded duplicates must produce multi-copy groups
    assert int(got.loc[got["group_size"] > 1, "n_groups"].sum()) > 0


def test_bm25_null_parity(doc_dir):
    from datapact_ray.pipelines.retrieval import _bm25_sql, bm25_topk_documents

    got = bm25_topk_documents(doc_dir, query="alpha beta gamma")
    want = _duck(_bm25_sql("alpha beta gamma"), doc_dir)
    _assert_exact(got, want)
    assert len(got) == 20 and got["bm25"].notna().all()
