"""Line/paragraph repetition census (text.py): testdata documents are
single-line, so these fixtures carry the discrimination — multi-line
docs with heavy line repeats, shared boilerplate paragraphs across
docs, and the exact split-semantics edges (empty lines, trailing
newline, blank-paragraph runs) where Python str.split and DuckDB
string_split must agree."""

import duckdb
import pandas as pd
import pytest

from datapact_ray.pipelines.text import (
    ORACLE_SQL,
    dup_lines_documents,
    dup_paragraphs_documents,
)

BOILER = "header line\ncopyright fine print"


@pytest.fixture(scope="module")
def tdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("rep_sf")
    docs = [
        # 0: 10 lines, 9 repeats -> frac 0.9 (flagged)
        "spam\n" * 9 + "spam",
        # 1: all-distinct lines -> frac 0
        "a\nb\nc\nd",
        # 2: trailing newline -> ['x','y',''] 3 lines distinct
        "x\ny\n",
        # 3+4: share the boilerplate paragraph, differ elsewhere
        BOILER + "\n\nunique body three",
        BOILER + "\n\ncompletely different body",
        # 5: blank-paragraph run: 'a\n\n\n\nb' -> ['a','','b'] with one
        #    empty paragraph filtered on both engines
        "a\n\n\n\nb",
        # 6: NULL text row (dropped everywhere)
        None,
    ]
    pd.DataFrame(
        {"doc_id": range(len(docs)), "text": docs}
    ).to_parquet(d / "documents.parquet", row_group_size=3)
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


def test_dup_lines_matches_oracle_and_flags(tdir):
    got = dup_lines_documents(tdir)
    want = _duck(ORACLE_SQL["dup_lines_documents"], tdir)
    assert int(got.loc[0, "n_docs"]) == int(want.loc[0, "n_docs"]) == 6
    # doc 0 (9/10 repeated lines) and doc 5 (repeated EMPTY lines:
    # ['a','','','','b'] -> frac 0.4) both flag
    assert int(got.loc[0, "n_flagged"]) == int(want.loc[0, "n_flagged"]) == 2
    assert float(got.loc[0, "mean_dup_line_frac"]) == float(
        want.loc[0, "mean_dup_line_frac"]
    )
    assert float(got.loc[0, "mean_dup_line_frac"]) > 0.1


def test_dup_paragraphs_matches_oracle_and_finds_boilerplate(tdir):
    got = dup_paragraphs_documents(tdir)
    want = _duck(ORACLE_SQL["dup_paragraphs_documents"], tdir)
    for c in got.columns:
        assert int(got.loc[0, c]) == int(want.loc[0, c.lower()]), c
    # exactly the boilerplate paragraph is shared, twice
    assert int(got.loc[0, "n_shared_paragraphs"]) == 1
    assert int(got.loc[0, "shared_occurrences"]) == 2


def test_dup_paragraphs_bucket_invariance(tdir):
    a = dup_paragraphs_documents(tdir, num_buckets=2)
    b = dup_paragraphs_documents(tdir, num_buckets=13)
    pd.testing.assert_frame_equal(a, b)
