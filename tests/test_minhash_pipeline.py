"""MinHash+LSH pipeline invariants: the band shuffle ships only
fixed-width (band_id, band_key, doc_id) rows — no signatures, shingles
or text — and group-cap accounting counts DISTINCT dropped docs, not
one drop per band."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datapact_ray.pipelines.dedup import (
    MinHasher,
    _pairs_from_band,
    minhash_candidate_pairs,
)


def test_band_shuffle_rows_are_fixed_width():
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": pa.array(["the quick brown fox jumps", "another document here ok"]),
        }
    )
    out = MinHasher(64, 16, 3, 8)(batch)
    assert set(out.column_names) == {"band_id", "band_key", "doc_id", "__bucket"}
    assert out.num_rows == 2 * 16  # bands rows per doc
    for name in out.column_names:  # every column fixed-width (no binary/str)
        assert pa.types.is_integer(out.schema.field(name).type)


def test_pairs_from_band_emits_distinct_dropped_ids():
    g = pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64), "band_id": 0})
    out = _pairs_from_band(g, max_group=4)
    pairs = out[out["a"] >= 0]
    markers = out[out["a"] < 0]
    # 4 kept docs -> C(4,2)=6 pairs; 6 dropped docs -> 6 marker rows
    assert len(pairs) == 6
    assert sorted(markers["b"]) == list(range(4, 10))
    assert (markers["capped"] == 1).all()


@pytest.fixture(scope="module")
def capped_corpus(tmp_path_factory, ray_session):
    # 12 identical docs (one oversized collision group in EVERY band)
    # plus distinct fillers; max_group=8 drops the same 4 docs per band
    d = tmp_path_factory.mktemp("capped")
    text = "alpha beta gamma delta epsilon zeta eta theta " * 4
    rows = [{"doc_id": i, "text": text} for i in range(12)]
    rows += [
        {"doc_id": 100 + i, "text": f"unique filler number {i} with words {i * 7}"}
        for i in range(8)
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    return str(d)


def test_capped_docs_counts_distinct_not_per_band(capped_corpus):
    pairs, capped = minhash_candidate_pairs(capped_corpus, max_group=8)
    # the same 4 docs (ids 8..11, sorted head keeps 0..7) drop from the
    # identical-group in all 16 bands -> must count 4, not 64
    assert capped == 4
    # kept identical docs still verify as exact duplicates
    dup = pairs[pairs["jaccard"] >= 0.99]
    assert len(dup) == 8 * 7 // 2  # C(8,2) pairs among kept identical docs
    assert (dup["est_jaccard"] == 1.0).all()


def test_jaccard_pairs_max_df_cutoff(capped_corpus):
    from datapact_ray.pipelines.dedup import jaccard_pairs_documents

    exact = jaccard_pairs_documents(capped_corpus)
    assert exact["skipped_hot_shingles"].iloc[0] == 0  # default is exact
    # the 12 identical docs share every shingle at df=12 -> a df cutoff
    # below that drops those shingles, surfaced never silent
    capped = jaccard_pairs_documents(capped_corpus, max_df=8)
    assert capped["skipped_hot_shingles"].iloc[0] > 0
    assert (
        capped["pairs_sharing_shingle"].iloc[0]
        <= exact["pairs_sharing_shingle"].iloc[0]
    )
