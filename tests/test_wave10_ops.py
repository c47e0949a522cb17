"""Round-3f operators: NTILE curriculum staging, per-source prefix-dup
census, query-term coverage histogram, payload header-collision census.
Seeded fixtures carry the discrimination testdata lacks: an N-mod-k
remainder + a tie block straddling a stage boundary, template docs
sharing a 64-char prefix with differing tails, docs with known term
subsets (plus a substring-not-token probe), and payloads that differ
only by a trailing NUL inside the 16-byte header window."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datapact_ray.pipelines.curation import (
    _curriculum_sql,
    curriculum_stages_documents,
)
from datapact_ray.pipelines.dedup import _prefix_dup_sql, prefix_dup_documents
from datapact_ray.pipelines.multimodal import (
    _header_census_sql,
    header_census_multimodal,
)
from datapact_ray.pipelines.retrieval import (
    _COVERAGE_TERMS,
    _query_coverage_sql,
    query_coverage_documents,
)

SF = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _duck(sql: str, d: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _exact(got: pd.DataFrame, sql: str, d: str):
    want = _duck(sql, d)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.reset_index(drop=True),
        check_dtype=False,
        check_exact=True,
    )


def _docs_dir(tmp_path, rows) -> str:
    """rows: (doc_id, text, source)"""
    d = tmp_path / "sf"
    d.mkdir(parents=True)
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array(
                [len(r[1]) if r[1] is not None else None for r in rows],
                pa.int64(),
            ),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


# ---- oracle conformance on the real testdata ----


def test_curriculum_oracle_exact():
    _exact(curriculum_stages_documents(SF), _curriculum_sql(), SF)


def test_prefix_dup_oracle_exact():
    _exact(prefix_dup_documents(SF), _prefix_dup_sql(), SF)


def test_query_coverage_oracle_exact():
    _exact(query_coverage_documents(SF), _query_coverage_sql(), SF)


def test_header_census_oracle_exact():
    _exact(header_census_multimodal(SF), _header_census_sql(), SF)


# ---- discrimination fixtures ----


def test_curriculum_remainder_and_tie_block(tmp_path):
    """10 docs into 4 stages → NTILE sizes 3,3,2,2 (remainder rule), and
    five docs share ONE n_chars value straddling the stage-1/2 boundary
    — the doc_id tie-break must split them exactly as the window
    function does."""
    rows = []
    # five docs of length 5 (tie block), five of increasing lengths
    for i in range(5):
        rows.append((i, "x" * 5, "s"))
    for i in range(5, 10):
        rows.append((i, "y" * (10 + i), "s"))
    d = _docs_dir(tmp_path, rows)
    got = curriculum_stages_documents(d)
    assert got["n_docs"].tolist() == [3, 3, 2, 2]
    # the tie block (ranks 0-4) spans stages 1 and 2: 3 + 2 docs of len 5
    assert got.loc[got["stage"] == 1, "sum_chars"].iloc[0] == 15
    assert got.loc[got["stage"] == 2, "min_chars"].iloc[0] == 5
    _exact(got, _curriculum_sql(), d)


def test_curriculum_fewer_docs_than_stages(tmp_path):
    """N < k: NTILE fills the first N stages with one row each; empty
    stages produce no output rows on either engine."""
    rows = [(i, "z" * (i + 1), "s") for i in range(3)]
    d = _docs_dir(tmp_path, rows)
    got = curriculum_stages_documents(d, k=4)
    assert got["stage"].tolist() == [1, 2, 3]
    assert got["n_docs"].tolist() == [1, 1, 1]
    _exact(got, _curriculum_sql(4), d)


def test_curriculum_negative_doc_id_refused(tmp_path):
    """The float64 order-key domain guard checks BOTH ends: a negative
    doc_id flips the tie-break sign (round-3 advice) — refuse loudly
    instead of silently diverging from NTILE."""
    rows = [(-5, "hello", "s"), (1, "world", "s"), (2, "zz", "s")]
    d = _docs_dir(tmp_path, rows)
    with pytest.raises(ValueError, match="doc_id outside"):
        curriculum_stages_documents(d)


def test_prefix_dup_catches_what_whole_doc_dedup_misses(tmp_path):
    """Three docs share a 64-char template prefix with DIFFERENT tails
    (whole-doc hashes all distinct) → one dup group, two excess docs,
    attributed to the right source; a multi-byte char pair straddling
    the 64-codepoint boundary stays distinct-prefix-safe (substr counts
    codepoints on both engines)."""
    tmpl = "T" * 64
    rows = [
        (1, tmpl + " tail one", "feed_a"),
        (2, tmpl + " tail two", "feed_a"),
        (3, tmpl + " tail three", "feed_a"),
        (4, "unique doc", "feed_a"),
        # 63 ASCII chars + é: codepoint 64 is é; byte-sliced engines
        # would truncate mid-char and diverge from SQL substr
        (5, "a" * 63 + "é plus tail", "feed_b"),
        (6, "a" * 63 + "é other tail", "feed_b"),
        (7, "a" * 63 + "X different", "feed_b"),
    ]
    d = _docs_dir(tmp_path, rows)
    got = prefix_dup_documents(d)
    a = got[got["source"] == "feed_a"].iloc[0]
    assert a["n_docs"] == 4 and a["n_prefixes"] == 2
    assert a["dup_groups"] == 1 and a["excess_docs"] == 2
    b = got[got["source"] == "feed_b"].iloc[0]
    assert b["n_prefixes"] == 2  # é-prefix pair groups; X breaks out
    assert b["dup_groups"] == 1 and b["excess_docs"] == 1
    _exact(got, _prefix_dup_sql(), d)


def test_query_coverage_planted_counts(tmp_path):
    """Docs built with known term subsets yield the exact histogram;
    'database' counts as containing 'data' (substring semantics, like
    the oracle's LIKE — the audit is about raw containment)."""
    t0, t1, t2, t3 = _COVERAGE_TERMS  # data, spark, vector, the
    rows = [
        (1, "nothing here", "s"),                       # 0
        (2, f"a {t0} only", "s"),                       # 1
        (3, f"{t1} and {t2} here", "s"),                # 2
        (4, f"{t0} {t1} {t2} but not last", "s"),       # 3
        (5, f"{t0} {t1} {t2} {t3} all of them", "s"),   # 4
        (6, "my database rocks", "s"),                  # 1 (substring!)
    ]
    d = _docs_dir(tmp_path, rows)
    got = query_coverage_documents(d)
    by = dict(zip(got["n_matched"], got["n_docs"]))
    assert by == {0: 1, 1: 2, 2: 1, 3: 1, 4: 1}
    _exact(got, _query_coverage_sql(), d)


def test_header_census_short_tail_guard(tmp_path):
    """'AB' vs 'AB\\x00' must be DISTINCT headers (the zero-padded
    matrix alone would collide them; the capped-length word prevents
    it), while two long payloads sharing their first 16 octets group
    together despite different tails."""
    rows = [
        (1, "AB", "s"),
        (2, "AB\x00", "s"),
        (3, "HEADERHEADER0123 tail A", "s"),
        (4, "HEADERHEADER0123 completely different tail", "s"),
        (5, "HEADERHEADER0124 near miss", "s"),
    ]
    d = _docs_dir(tmp_path, rows)
    got = header_census_multimodal(d)
    r = got.iloc[0]
    # headers: AB | AB\x00 | HEADERHEADER0123 | HEADERHEADER0124 → 4
    assert r["n_payloads"] == 5 and r["n_headers"] == 4
    assert r["max_header_count"] == 2
    _exact(got, _header_census_sql(), d)


def test_curriculum_key_domain_guard(tmp_path):
    """n_chars beyond 2^13 breaks the exact float64 order key — the
    operator must refuse loudly, not drift silently from NTILE."""
    import pytest

    rows = [(i, "z" * 9000, "s") for i in range(4)]
    d = _docs_dir(tmp_path, rows)
    with pytest.raises(Exception, match="float64 order key"):
        curriculum_stages_documents(d)


def test_dedup_savings_bill(tmp_path):
    """Keeper = lowest doc_id; each duplicate billed to ITS OWN source
    (a cross-source duplicate charges the copying feed, not the origin);
    a dup-free source gets NULL dup_tokens (SQL SUM FILTER semantics)."""
    from datapact_ray.pipelines.dedup import (
        _DEDUP_SAVINGS_SQL,
        dedup_savings_documents,
    )

    rows = [
        (1, "alpha beta gamma", "origin"),      # keeper (3 tokens)
        (2, "alpha beta gamma", "copier"),      # dup → billed to copier
        (3, "alpha beta gamma", "copier"),      # dup → billed to copier
        (4, "unique one", "copier"),
        (5, "clean doc here", "clean_feed"),    # dup-free source
    ]
    d = _docs_dir(tmp_path, rows)
    got = dedup_savings_documents(d)
    by = {r["source"]: r for _, r in got.iterrows()}
    assert by["origin"]["dup_docs"] == 0
    assert pd.isna(by["origin"]["dup_tokens"])
    assert by["copier"]["dup_docs"] == 2
    assert by["copier"]["dup_tokens"] == 6.0  # 2 × 3 tokens
    assert pd.isna(by["clean_feed"]["dup_tokens"])
    _exact(got, _DEDUP_SAVINGS_SQL, d)
    # bucket invariance
    pd.testing.assert_frame_equal(
        got, dedup_savings_documents(d, num_buckets=5), check_exact=True
    )


def test_payload_size_percentiles(tmp_path):
    """Percentiles are over OCTETS, not codepoints (a CJK doc of 4 chars
    is 12 octets); interpolation matches quantile_cont exactly."""
    from datapact_ray.pipelines.multimodal import (
        _PAYLOAD_SIZE_PCTL_SQL,
        payload_size_percentiles_multimodal,
    )

    rows = [
        (1, "aaaa", "ascii"),        # 4 octets
        (2, "aaaaaaaa", "ascii"),    # 8
        (3, "aaaaaaaaaaaa", "ascii"),  # 12
        (4, "漢字漢字", "cjk"),       # 4 chars = 12 octets
        (5, "漢", "cjk"),            # 3 octets
    ]
    d = _docs_dir(tmp_path, rows)
    got = payload_size_percentiles_multimodal(d)
    a = got[got["source"] == "ascii"].iloc[0]
    assert a["p50_octets"] == 8.0
    assert a["p95_octets"] == 11.6  # 4,8,12 → rank 1.9 → 8 + 0.9*4
    c = got[got["source"] == "cjk"].iloc[0]
    assert c["p50_octets"] == 7.5  # (3+12)/2
    _exact(got, _PAYLOAD_SIZE_PCTL_SQL, d)
