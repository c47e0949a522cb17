"""n-gram decontamination, stratified sampling and document-frequency
ops vs DuckDB on fixtures with SEEDED cross-source leakage and NULLs
(the driver's documents table has no exact cross-source dups, so the
decontamination op is only non-degenerate here and at the n-gram level
there)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from datapact_ray.pipelines.dedup import decontaminate_ngram_documents
from datapact_ray.pipelines.text import (
    doc_freq_top_terms_documents,
    stratified_sample_documents,
)


@pytest.fixture(scope="module")
def leaky_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("leaky")
    rng = np.random.default_rng(99)
    vocab = np.array([f"w{i}" for i in range(40)])
    n = 400

    def doc(length):
        return " ".join(vocab[rng.integers(0, len(vocab), length)])

    texts = [doc(rng.integers(20, 60)) for _ in range(n)]
    # seed benchmark leakage: a fixed 15-token passage pasted into docs
    # of SEVERAL sources, plus a same-source-only repeat (must NOT count)
    passage = " ".join(vocab[:15])
    for i in (5, 50, 120, 200):
        texts[i] = texts[i] + " " + passage
    same_src = " ".join(vocab[20:36])
    texts[7] = texts[7] + " " + same_src
    texts[9] = texts[9] + " " + same_src  # docs 7 and 9 share source below
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype="int64"),
            "text": pd.Series(texts, dtype=object),
            "lang": np.array(["en", "de", "fr"])[rng.integers(0, 3, n)],
            "source": pd.Series(
                [f"s{i % 4}" for i in range(n)], dtype=object
            ),  # 7 and 9 both land in s3 ⇒ same-source repeat
            "n_chars": np.array([len(t) for t in texts], dtype="int64"),
        }
    )
    docs.loc[rng.random(n) < 0.05, "text"] = None
    docs.loc[rng.random(n) < 0.05, "source"] = None
    docs.loc[rng.random(n) < 0.05, "lang"] = None
    docs.to_parquet(d / "documents.parquet", row_group_size=64)
    return str(d)


def _duck(d: str, key: str) -> pd.DataFrame:
    import __ray_entry__ as m

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    try:
        return con.execute(m.oracle_sql()[key]).fetchdf()
    finally:
        con.close()


def _assert_eq(got, want, name):
    got, want = got.reset_index(drop=True), want.reset_index(drop=True)
    assert list(got.columns) == list(want.columns), name
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9)


def test_decontaminate_detects_seeded_leakage(leaky_dir):
    got = decontaminate_ngram_documents(leaky_dir)
    want = _duck(leaky_dir, "decontaminate_ngram_documents")
    assert int(got["docs_hit"].iloc[0]) >= 3  # the seeded passage found
    _assert_eq(got, want, "decontaminate")


def test_decontaminate_bucket_invariance(leaky_dir):
    a = decontaminate_ngram_documents(leaky_dir, num_buckets=3)
    b = decontaminate_ngram_documents(leaky_dir, num_buckets=13)
    pd.testing.assert_frame_equal(a, b)


def test_stratified_sample_nulls(leaky_dir):
    got = stratified_sample_documents(leaky_dir)
    want = _duck(leaky_dir, "stratified_sample_documents")
    _assert_eq(got, want, "stratified_sample")


def test_doc_freq_nulls(leaky_dir):
    got = doc_freq_top_terms_documents(leaky_dir)
    want = _duck(leaky_dir, "doc_freq_top_terms_documents")
    _assert_eq(got, want, "doc_freq")


def test_unigram_logprob_nulls(leaky_dir):
    """NULL-text docs feed neither the LM nor the scores; NULL-lang docs
    feed the LM but not the per-lang output — exactly the oracle's CTEs."""
    from datapact_ray.pipelines.text import unigram_logprob_documents

    got = unigram_logprob_documents(leaky_dir)
    want = _duck(leaky_dir, "unigram_logprob_documents")
    _assert_eq(got, want, "unigram_logprob")
