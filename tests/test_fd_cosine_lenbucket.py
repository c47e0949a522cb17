"""Round-3b operators: FD audit, derived-column audit, length-bucket
census, TF-cosine retrieval. Seeded fixtures prove discrimination
(testdata is clean / near-uniform on these axes), NULL and empty-token
semantics match DuckDB, and the cosine ranking is oracle-exact without
a rounding pin (identical two-op IEEE tree over exact integers)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from datapact_ray.pipelines.curation import (
    ORACLE_SQL as CURATION_SQL,
    length_bucket_census_documents,
)
from datapact_ray.pipelines.quality import (
    ORACLE_SQL as QUALITY_SQL,
    derived_column_audit_documents,
    fd_audit_part_brand_type,
)
from datapact_ray.pipelines.retrieval import (
    ORACLE_SQL as RETRIEVAL_SQL,
    tf_cosine_topk_documents,
)


@pytest.fixture(scope="module")
def fdir(tmp_path_factory):
    """part: brands 'clean0'..'clean4' each map to ONE type (FD holds);
    'dirty0' maps to 3 types, 'dirty1' to 2 (FD violated); NULL rows on
    both sides are excluded by both engines.

    documents: doc 0 is the cosine query; doc 1 is a near-duplicate
    (one word changed — must rank first); doc 2 repeats doc 0's words
    twice (same direction ⇒ cosine 1.0 exactly); doc 3 is disjoint
    (cosine 0); doc 4 has doubled spaces (string_split parity: empty
    segments are tokens); doc 5 is empty text (norm² = 1 via the ''
    token); doc 6 NULL text (excluded). n_chars is correct everywhere
    except docs 3 and 4 (derived-column violations, max |diff| = 7).
    Token counts hit power-of-two boundaries (1, 2, 4, 8) so the
    frexp-vs-CASE-ladder bucket edges are exercised."""
    d = tmp_path_factory.mktemp("r3b_sf")

    brands, types = [], []
    for i in range(5):
        for _ in range(4):
            brands.append(f"clean{i}")
            types.append(f"T{i}")
    for t in ("A", "B", "C"):
        brands.append("dirty0")
        types.append(t)
    for t in ("A", "B"):
        brands.append("dirty1")
        types.append(t)
    brands += [None, "cleanX"]
    types += ["A", None]
    part = pd.DataFrame({"p_brand": brands, "p_type": types})
    part.to_parquet(d / "part.parquet", row_group_size=8)

    texts = [
        "alpha beta gamma delta",          # 0: the query (4 tokens)
        "alpha beta gamma epsilon",        # 1: near-dup, 3/4 overlap
        "alpha beta gamma delta alpha beta gamma delta",  # 2: cos = 1.0
        "zeta eta theta iota",             # 3: disjoint, cos = 0
        "alpha  beta",                     # 4: doubled space ⇒ '' token
        "",                                # 5: empty ⇒ one '' token
        None,                              # 6: excluded
        "alpha",                           # 7: 1 token  (bucket 0)
        "alpha beta",                      # 8: 2 tokens (bucket 1)
        "a b c d e f g h",                 # 9: 8 tokens (bucket 3)
    ]
    n_chars = [len(t) if t is not None else None for t in texts]
    n_chars[3] = n_chars[3] + 7   # seeded derived-column violations
    n_chars[4] = n_chars[4] - 2
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype="int64"),
            "text": texts,
            "n_chars": pd.array(n_chars, dtype="Int64"),
        }
    )
    docs.to_parquet(d / "documents.parquet", row_group_size=4)
    return str(d)


def _duck(sql: str, d: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("part", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if df[c].dtype == object and not df[c].map(
            lambda v: v is None or isinstance(v, (int, float, np.number))
        ).all():
            continue
        df[c] = pd.to_numeric(df[c], errors="coerce").astype("float64")
    return df.reset_index(drop=True)


def test_fd_audit_discriminates(fdir):
    got = _norm(fd_audit_part_brand_type(fdir))
    want = _norm(_duck(QUALITY_SQL["fd_audit_part_brand_type"], fdir))
    pd.testing.assert_frame_equal(got, want, check_like=True)
    assert got.loc[0, "n_lhs"] == 7          # 5 clean + 2 dirty
    assert got.loc[0, "n_violating_lhs"] == 2
    assert got.loc[0, "n_violating_rows"] == 5
    assert got.loc[0, "max_rhs_per_lhs"] == 3


def test_derived_column_audit_discriminates(fdir):
    got = _norm(derived_column_audit_documents(fdir))
    want = _norm(_duck(QUALITY_SQL["derived_column_audit_documents"], fdir))
    pd.testing.assert_frame_equal(got, want, check_like=True)
    assert got.loc[0, "n_violations"] == 2
    assert got.loc[0, "max_abs_diff"] == 7


def test_length_bucket_census_boundaries(fdir):
    got = _norm(length_bucket_census_documents(fdir))
    want = _norm(_duck(CURATION_SQL["length_bucket_census_documents"], fdir))
    pd.testing.assert_frame_equal(got, want, check_like=True)
    g = length_bucket_census_documents(fdir).set_index("bucket")
    # 1 token → bucket 0; 2 → 1; 3 → 1; 4 → 2; 8 → 3 (exact edges)
    assert int(g.loc[0, "n_docs"]) == 2   # docs 5 (1 tok) and 7
    assert 3 in g.index                    # docs 2 and 9: 8 tokens each
    assert int(g.loc[3, "n_docs"]) == 2
    assert int(g.loc[3, "tokens"]) == 16


def test_tf_cosine_oracle_exact_and_ranks_neardup(fdir):
    got = tf_cosine_topk_documents(fdir)
    want = _duck(RETRIEVAL_SQL["tf_cosine_topk_documents"], fdir)
    pd.testing.assert_frame_equal(
        _norm(got), _norm(want), check_like=True
    )
    # the doubled doc points the SAME direction: cosine exactly 1.0
    assert got.loc[0, "doc_id"] == 2
    assert got.loc[0, "cosine"] == 1.0
    # the near-duplicate outranks everything else
    assert got.loc[1, "doc_id"] == 1
    # the disjoint doc scores exactly 0 and the query doc is excluded
    row3 = got[got["doc_id"] == 3]
    assert float(row3["cosine"].iloc[0]) == 0.0
    assert 0 not in set(got["doc_id"])


def test_tf_cosine_missing_query_is_loud(fdir, tmp_path):
    with pytest.raises(KeyError):
        tf_cosine_topk_documents(fdir, query_doc_id=999)
