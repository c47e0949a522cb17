"""Round-3c operators: PMI co-occurrence, postings-length histogram,
pack-efficiency census, char-class census, label balance, binary-payload
dedup. Testdata is clean on these axes (no duplicate payloads, no
digits/punct, near-uniform labels), so seeded fixtures carry the
discrimination: planted perfect-association pairs, byte-identical blob
copies, multi-byte UTF-8 (octet_length ≠ LENGTH), power-of-two df
boundaries, truncation at the max_len edge, and a 7:2:1 label skew."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from datapact_ray.pipelines.curation import (
    ORACLE_SQL as CURATION_SQL,
    pack_efficiency_documents,
)
from datapact_ray.pipelines.multimodal import (
    ORACLE_SQL as MM_SQL,
    payload_dedup_multimodal,
)
from datapact_ray.pipelines.quality import (
    ORACLE_SQL as QUALITY_SQL,
    charclass_census_documents,
    label_balance_embeddings,
)
from datapact_ray.pipelines.retrieval import (
    ORACLE_SQL as RETRIEVAL_SQL,
    pmi_cooccurrence_documents,
    postings_histogram_documents,
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


@pytest.fixture(scope="module")
def ling_dir(tmp_path_factory):
    """Co-occurrence fixture: sun/moon always co-occur (3 of 3 moon
    docs contain sun ⇒ PMI = ln(N·3/(4·3)) = ln(1.25) > 0), rain/sun
    co-occur once in 2·4 chances (PMI = ln(5/8) < 0). df values hit
    the power-of-two band edges: 1, 2, 3, 4."""
    d = tmp_path_factory.mktemp("w7_ling")
    texts = [
        "sun moon",
        "sun moon",
        "sun moon stars",
        "rain",
        "rain sun",
        None,  # excluded on both engines
    ]
    pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype="int64"), "text": texts}
    ).to_parquet(d / "documents.parquet", row_group_size=2)
    pd.DataFrame(
        {"vec_id": [0], "label": pd.array([0], dtype="Int32")}
    ).to_parquet(d / "embeddings.parquet")
    return str(d)


@pytest.fixture(scope="module")
def mixed_dir(tmp_path_factory):
    """Mixed-content fixture: 3 byte-identical copies of a multi-byte
    UTF-8 payload (16 bytes, 14 codepoints — octet_length ≠ LENGTH),
    digit/punct-bearing English text, a 10-token doc that truncates at
    max_len = 8, and a 7:2:1 label skew with one NULL label."""
    d = tmp_path_factory.mktemp("w7_mixed")
    texts = [
        "ab12 cd!? ef",        # en: digits 2, punct 2, spaces 2
        "plain words here",    # en: letters + spaces only
        "héllo wörld !!",      # de ×3: dup payload, non-ASCII
        "héllo wörld !!",
        "héllo wörld !!",
        "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10",  # es: 10 tokens > 8
        None,                   # excluded
    ]
    langs = ["en", "en", "de", "de", "de", "es", "en"]
    pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype="int64"),
            "text": texts,
            "lang": langs,
        }
    ).to_parquet(d / "documents.parquet", row_group_size=3)
    labels = [0] * 7 + [1] * 2 + [2] * 1 + [None]
    pd.DataFrame(
        {
            "vec_id": np.arange(len(labels), dtype="int64"),
            "label": pd.array(labels, dtype="Int32"),
        }
    ).to_parquet(d / "embeddings.parquet", row_group_size=4)
    return str(d)


def test_pmi_perfect_pair_ranks_first(ling_dir):
    got = pmi_cooccurrence_documents(ling_dir)
    _assert_oracle_exact(
        got, RETRIEVAL_SQL["pmi_cooccurrence_documents"], ling_dir
    )
    top = got.iloc[0]
    # stars appears ONLY alongside moon: the rarest perfect association
    # scores highest, PMI = ln(5·1/(3·1)) = ln(5/3)
    assert (top["term_a"], top["term_b"]) == ("moon", "stars")
    assert top["pmi"] == math.log(float(5 * 1) / float(3 * 1))
    # (moon,sun) and (stars,sun) tie EXACTLY at ln(1.25) — both ratios
    # are 15/12 and 5/4 ⇒ the same double — so the lexicographic
    # tie-break (term_a asc) must order moon before stars
    assert (got.iloc[1]["term_a"], got.iloc[1]["term_b"]) == ("moon", "sun")
    assert (got.iloc[2]["term_a"], got.iloc[2]["term_b"]) == ("stars", "sun")
    assert got.iloc[1]["pmi"] == got.iloc[2]["pmi"] == math.log(1.25)
    neg = got.set_index(["term_a", "term_b"]).loc[("rain", "sun"), "pmi"]
    assert neg == math.log(float(5 * 1) / float(2 * 4)) and neg < 0


def test_postings_histogram_band_edges(ling_dir):
    got = postings_histogram_documents(ling_dir)
    _assert_oracle_exact(
        got, RETRIEVAL_SQL["postings_histogram_documents"], ling_dir
    )
    g = got.set_index("band")
    # df: stars=1 (band 0); moon=3, rain=2 (band 1); sun=4 (band 2)
    assert int(g.loc[0, "n_terms"]) == 1 and int(g.loc[0, "total_postings"]) == 1
    assert int(g.loc[1, "n_terms"]) == 2 and int(g.loc[1, "total_postings"]) == 5
    assert int(g.loc[2, "n_terms"]) == 1 and int(g.loc[2, "total_postings"]) == 4


def test_pack_efficiency_truncation_edge(mixed_dir):
    got = pack_efficiency_documents(mixed_dir)
    _assert_oracle_exact(
        got, CURATION_SQL["pack_efficiency_documents"], mixed_dir
    )
    r8 = got.set_index("max_len").loc[8]
    # token counts: 3, 3, 3, 3, 3, 10 ⇒ only the 10-token doc truncates
    assert int(r8["n_docs"]) == 6
    assert int(r8["n_truncated"]) == 1
    assert int(r8["trunc_tokens"]) == 2          # 10 - 8
    assert int(r8["kept_tokens"]) == 3 * 5 + 8
    assert int(r8["pad_tokens"]) == 5 * 5        # five 3-token docs
    r512 = got.set_index("max_len").loc[512]
    assert int(r512["n_truncated"]) == 0 and int(r512["trunc_tokens"]) == 0


def test_charclass_census_digits_punct_nonascii(mixed_dir):
    got = charclass_census_documents(mixed_dir)
    _assert_oracle_exact(
        got, QUALITY_SQL["charclass_census_documents"], mixed_dir
    )
    g = got.set_index("lang")
    en = g.loc["en"]
    # "ab12 cd!? ef" + "plain words here": digits 1,2; punct !,?
    assert int(en["digits"]) == 2 and int(en["punct"]) == 2
    de = g.loc["de"]
    # é/ö/! per copy: 2 non-ASCII letters land in OTHER, 2 ASCII puncts
    assert int(de["other"]) == 3 * 2 and int(de["punct"]) == 3 * 2
    # codepoint convention: "héllo wörld !!" is 14 codepoints
    assert int(de["total_chars"]) == 3 * 14


def test_payload_dedup_counts_wasted_bytes(mixed_dir):
    got = payload_dedup_multimodal(mixed_dir)
    _assert_oracle_exact(got, MM_SQL["payload_dedup_multimodal"], mixed_dir)
    row = got.iloc[0]
    assert int(row["n_payloads"]) == 6          # NULL text excluded
    assert int(row["distinct_payloads"]) == 4
    assert int(row["dup_payloads"]) == 2
    # the dup payload is 16 BYTES (14 codepoints + 2 for é/ö): 2 extra
    # copies waste 32 bytes — the octet-vs-codepoint distinction
    assert len("héllo wörld !!".encode()) == 16
    assert int(row["wasted_bytes"]) == 32


def test_label_balance_skew(mixed_dir):
    got = label_balance_embeddings(mixed_dir)
    _assert_oracle_exact(
        got, QUALITY_SQL["label_balance_embeddings"], mixed_dir
    )
    g = got.set_index("label")
    assert len(g) == 3                           # NULL label excluded
    assert int(g.loc[0, "n_vecs"]) == 7
    assert g.loc[0, "share"] == float(7) / float(10)
    assert g.loc[2, "neg_p_ln_p"] == -(0.1 * math.log(0.1))
    # collapsed-vs-balanced discrimination: entropy far below ln(3)
    assert float(g["neg_p_ln_p"].sum()) < 0.95 * math.log(3.0)
