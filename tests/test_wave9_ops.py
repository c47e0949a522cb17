"""Round-3e operators: payload byte entropy, index shard balance,
substring contamination, boilerplate n-gram census. Seeded fixtures
carry the discrimination testdata lacks: a low-entropy payload pool
(one repeated byte) vs a full-range pool, a deliberately hot shard via
duplicated-prefix terms, a planted verbatim leak, and a template
footer shared by most documents."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datapact_ray.pipelines.dedup import (
    _SUBSTRING_CONTAMINATION_SQL,
    substring_contamination_documents,
)
from datapact_ray.pipelines.multimodal import (
    _PAYLOAD_ENTROPY_SQL,
    payload_entropy_documents,
)
from datapact_ray.pipelines.quality import (
    _boilerplate_sql,
    boilerplate_ngrams_documents,
)
from datapact_ray.pipelines.retrieval import (
    _shard_balance_sql,
    shard_balance_documents,
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


def test_payload_entropy_oracle_exact():
    _exact(payload_entropy_documents(SF), _PAYLOAD_ENTROPY_SQL, SF)


def test_shard_balance_oracle_exact():
    _exact(shard_balance_documents(SF), _shard_balance_sql(), SF)


def test_substring_contamination_oracle_exact():
    _exact(
        substring_contamination_documents(SF), _SUBSTRING_CONTAMINATION_SQL, SF
    )


def test_boilerplate_ngrams_oracle_exact():
    _exact(boilerplate_ngrams_documents(SF), _boilerplate_sql(), SF)


# ---- discrimination fixtures ----


def test_entropy_separates_flat_from_spread(tmp_path):
    rows = [
        (0, "aaaaaaaaaaaaaaaaaaaa", "flat"),  # single byte: entropy 0
        (1, "abcdefghij", "spread"),  # 10 distinct bytes, uniform
    ]
    d = _docs_dir(tmp_path, rows)
    out = payload_entropy_documents(d).set_index("source")
    assert out.loc["flat", "entropy_nats"] == 0.0
    assert out.loc["flat", "n_distinct_bytes"] == 1
    import math

    assert out.loc["spread", "entropy_nats"] == round(math.log(10), 6)
    _exact(payload_entropy_documents(d), _PAYLOAD_ENTROPY_SQL, d)


def test_entropy_multibyte_utf8_counts_octets(tmp_path):
    # 'é' is 2 octets (0xC3 0xA9): octet accounting, not codepoints
    d = _docs_dir(tmp_path, [(0, "é", "mb")])
    out = payload_entropy_documents(d)
    assert int(out["total_bytes"].iloc[0]) == 2
    assert int(out["n_distinct_bytes"].iloc[0]) == 2
    _exact(out, _PAYLOAD_ENTROPY_SQL, d)


def test_shard_balance_flags_hot_shard(tmp_path):
    # many distinct terms sharing one shard-0 term plus a supermajority
    # df term: the audit must carry exact max_term_df per shard
    rows = [(i, "common unique%d" % i, "s") for i in range(50)]
    d = _docs_dir(tmp_path, rows)
    out = shard_balance_documents(d)
    assert int(out["max_term_df"].max()) == 50  # 'common' in every doc
    assert int(out["n_terms"].sum()) == 51
    _exact(out, _shard_balance_sql(), d)


def test_substring_contamination_finds_planted_leak(tmp_path):
    probe_text = "the quick brown fox jumps over the lazy dog near the bank"
    rows = [
        (0, probe_text, "eval"),  # doc_id % 97 == 0 -> probe
        (1, "padding " + probe_text[:40] + " tail", "train"),  # verbatim leak
        (2, "clean document with nothing shared", "train"),
        (97 * 2, "another probe text entirely", "eval"),
    ]
    d = _docs_dir(tmp_path, rows)
    out = substring_contamination_documents(d).set_index("probe_doc_id")
    assert int(out.loc[0, "n_contaminated_docs"]) == 1
    assert int(out.loc[97 * 2, "n_contaminated_docs"]) == 0
    _exact(substring_contamination_documents(d), _SUBSTRING_CONTAMINATION_SQL, d)


def test_boilerplate_finds_shared_footer(tmp_path):
    footer = "subscribe to our newsletter"
    rows = [(i, f"body {i} words here {footer}", "s") for i in range(30)]
    rows.append((30, "no template in this one", "s"))
    d = _docs_dir(tmp_path, rows)
    out = boilerplate_ngrams_documents(d)
    assert int(out["df"].iloc[0]) == 30  # the template grams top the list
    top30 = set(out.loc[out["df"] == 30, "gram"])
    assert {"subscribe to our", "to our newsletter"} <= top30
    _exact(out, _boilerplate_sql(), d)


def test_boilerplate_df_not_tf(tmp_path):
    # one spammy doc repeating a gram 50x must not beat a gram that
    # appears once in each of 3 docs
    spam = " ".join(["x y z"] * 50)
    rows = [(0, spam, "s")] + [(i, f"shared gram here pad{i}", "s") for i in (1, 2, 3)]
    d = _docs_dir(tmp_path, rows)
    out = boilerplate_ngrams_documents(d)
    assert out["gram"].iloc[0] == "shared gram here"
    assert int(out["df"].iloc[0]) == 3
    _exact(out, _boilerplate_sql(), d)


def test_empty_inputs(tmp_path):
    d = _docs_dir(tmp_path, [])
    for fn in (
        payload_entropy_documents,
        shard_balance_documents,
        substring_contamination_documents,
        boilerplate_ngrams_documents,
    ):
        out = fn(d)
        assert isinstance(out, pd.DataFrame) and len(out) == 0
        assert len(out.columns) > 0


# ---- mixture-window interleaving audit ----

from datapact_ray.pipelines.curation import (  # noqa: E402
    _mixture_window_sql,
    mixture_window_audit_documents,
)


def test_mixture_window_oracle_exact_testdata():
    got = mixture_window_audit_documents(SF)
    want = _duck(_mixture_window_sql(), SF)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.reset_index(drop=True),
        check_dtype=False,
        check_exact=True,
    )
    # the synthetic corpus assigns sources round-robin: a perfect
    # interleave scores (near) zero everywhere
    assert float(got["max_abs_dev"].max()) < 0.05


def test_mixture_window_flags_sorted_corpus(tmp_path):
    # 200 docs: first 100 all srcA, last 100 all srcB — every window is
    # single-source, so the deviation is the other source's full share
    rows = [(i, "t", "srcA") for i in range(100)] + [
        (i, "t", "srcB") for i in range(100, 200)
    ]
    d = _docs_dir(tmp_path, rows)
    out = mixture_window_audit_documents(d)
    assert float(out["max_abs_dev"].iloc[0]) == 0.5  # |1.0 - 0.5| per window
    want = _duck(_mixture_window_sql(), d)
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False, check_exact=True,
    )


def test_mixture_window_interleaved_corpus_clean(tmp_path):
    rows = [(i, "t", "srcA" if i % 2 == 0 else "srcB") for i in range(200)]
    d = _docs_dir(tmp_path, rows)
    out = mixture_window_audit_documents(d)
    assert float(out["max_abs_dev"].max()) == 0.0


# ---- cross-payload chunk dedup ----

from datapact_ray.pipelines.multimodal import (  # noqa: E402
    _CHUNK_DEDUP_SQL,
    chunk_dedup_multimodal,
)


def test_chunk_dedup_oracle_exact_testdata():
    _exact(chunk_dedup_multimodal(SF), _CHUNK_DEDUP_SQL, SF)


def test_chunk_dedup_catches_shared_prefix(tmp_path):
    # two DISTINCT payloads sharing their first 128 bytes: whole-blob
    # dedup sees nothing, chunk dedup finds the 2 shared 64-byte blocks
    shared = "s" * 128
    rows = [(0, shared + "tailA", "a"), (1, shared + "tailB", "b")]
    d = _docs_dir(tmp_path, rows)
    out = chunk_dedup_multimodal(d)
    # payload A: 3 blocks (64+64+5), payload B: 3; the two 's'*64
    # blocks inside EACH payload are identical too, so distinct =
    # {'s'*64, tailA block, tailB block} = 3
    assert int(out["n_chunks"].iloc[0]) == 6
    assert int(out["distinct_chunks"].iloc[0]) == 3
    assert int(out["dup_chunks"].iloc[0]) == 3
    _exact(out, _CHUNK_DEDUP_SQL, d)


def test_chunk_dedup_short_tail_is_not_padded_block(tmp_path):
    # 'a'*3 (one short block) vs 'a'*64 (one full block): the length
    # term in the hash keeps them distinct, as substr does in SQL
    rows = [(0, "a" * 3, "s"), (1, "a" * 64, "s")]
    d = _docs_dir(tmp_path, rows)
    out = chunk_dedup_multimodal(d)
    assert int(out["n_chunks"].iloc[0]) == 2
    assert int(out["distinct_chunks"].iloc[0]) == 2
    _exact(out, _CHUNK_DEDUP_SQL, d)


def test_chunk_dedup_identical_payloads(tmp_path):
    rows = [(i, "z" * 200, "s") for i in range(10)]  # 4 blocks, 10 copies
    d = _docs_dir(tmp_path, rows)
    out = chunk_dedup_multimodal(d)
    assert int(out["n_chunks"].iloc[0]) == 40
    # blocks are 'z'*64 x3 + 'z'*8 per payload: 2 distinct contents
    assert int(out["distinct_chunks"].iloc[0]) == 2
    assert float(out["dedup_ratio"].iloc[0]) == 0.05
    _exact(out, _CHUNK_DEDUP_SQL, d)


# ---- snippet extraction + quota cap ----

from datapact_ray.pipelines.curation import (  # noqa: E402
    _quota_cap_sql,
    quota_cap_documents,
)
from datapact_ray.pipelines.retrieval import (  # noqa: E402
    _snippet_sql,
    snippet_extraction_documents,
)


def test_snippet_oracle_exact_testdata():
    _exact(snippet_extraction_documents(SF), _snippet_sql(), SF)


def test_snippet_window_clipping(tmp_path):
    # match at position 1: the window clips at the string start exactly
    # as GREATEST(1, pos-ctx) does; match mid-string gets symmetric ctx
    rows = [
        (0, "hash join starts this document right away", "s"),
        (1, "x" * 30 + " hash join " + "y" * 30, "s"),
        (2, "no match here at all", "s"),
    ]
    d = _docs_dir(tmp_path, rows)
    out = snippet_extraction_documents(d)
    assert list(out["doc_id"]) == [0, 1]
    assert int(out["pos"].iloc[0]) == 1
    assert out["snippet"].iloc[0].startswith("hash join")
    assert len(out["snippet"].iloc[1]) == len("hash join") + 40
    _exact(out, _snippet_sql(), d)


def test_quota_cap_oracle_exact_testdata():
    _exact(quota_cap_documents(SF), _quota_cap_sql(), SF)
    out = quota_cap_documents(SF)
    # testdata has 25 docs/source, cap 10: every source drops tokens
    assert (out["n_kept"] == 10).all()
    assert (out["dropped_tokens"] > 0).all()


def test_quota_cap_deterministic_selection(tmp_path):
    # the kept set is a pure function of doc_id (md5 order): same corpus
    # in a different row order keeps the same docs
    rows = [(i, f"doc {i} body words", "s") for i in range(40)]
    d1 = _docs_dir(tmp_path / "a", rows)
    d2 = _docs_dir(tmp_path / "b", rows[::-1])
    a, b = quota_cap_documents(d1), quota_cap_documents(d2)
    pd.testing.assert_frame_equal(a, b)
    assert int(a["n_kept"].iloc[0]) == 10
    _exact(a, _quota_cap_sql(), d1)


def test_quota_cap_under_cap_source_keeps_all(tmp_path):
    rows = [(i, "tiny corpus", "small") for i in range(3)]
    d = _docs_dir(tmp_path, rows)
    out = quota_cap_documents(d)
    assert int(out["n_kept"].iloc[0]) == 3
    assert int(out["dropped_tokens"].iloc[0]) == 0
    _exact(out, _quota_cap_sql(), d)


# ---- single-scan ROLLUP ----


def test_rollup_lineitem_oracle_exact():
    import duckdb

    from datapact_ray.pipelines.relational import (
        _ROLLUP_SQL,
        rollup_lineitem_flags,
    )

    got = rollup_lineitem_flags(SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF}/lineitem.parquet')"
    )
    want = con.execute(_ROLLUP_SQL).fetchdf()
    con.close()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.reset_index(drop=True),
        check_dtype=False,
        check_exact=True,
    )
    # structural invariants: grand total row equals the sum of the fine
    # level; every subtotal equals its flag's fine rows
    fine = got[(got["g_rf"] == 0) & (got["g_ls"] == 0)]
    grand = got[(got["g_rf"] == 1)].iloc[0]
    assert int(grand["n_rows"]) == int(fine["n_rows"].sum())
    assert int(grand["sum_qty"]) == int(fine["sum_qty"].sum())
    sub = got[(got["g_rf"] == 0) & (got["g_ls"] == 1)]
    for _, r in sub.iterrows():
        f = fine[fine["l_returnflag"] == r["l_returnflag"]]
        assert int(r["n_rows"]) == int(f["n_rows"].sum())


# ---- stop-list coverage + base64 hygiene ----

from datapact_ray.pipelines.multimodal import (  # noqa: E402
    _BASE64_SQL,
    base64_hygiene_documents,
)
from datapact_ray.pipelines.retrieval import (  # noqa: E402
    _stoplist_sql,
    stoplist_coverage_documents,
)


def test_stoplist_oracle_exact_testdata():
    got = stoplist_coverage_documents(SF)
    _exact(got, _stoplist_sql(), SF)
    # shares must be monotone in k and end at a meaningful fraction
    s = got["share"].to_numpy()
    assert (s[1:] >= s[:-1]).all()
    assert s[0] > 0


def test_stoplist_boundary_tie_breaks_by_term(tmp_path):
    # 3 terms with identical df: top-2 must be the lexicographically
    # first two on BOTH engines
    rows = [(i, "alpha beta gamma", "s") for i in range(5)]
    d = _docs_dir(tmp_path, rows)
    out = stoplist_coverage_documents(d, ks=(2,))
    assert int(out["topk_postings"].iloc[0]) == 10  # alpha+beta: 5 docs each
    want = _duck(_stoplist_sql(ks=(2,)), d)
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False, check_exact=True,
    )


def test_base64_oracle_exact_testdata():
    _exact(base64_hygiene_documents(SF), _BASE64_SQL, SF)


def test_base64_detects_planted_blob(tmp_path):
    import base64 as b64

    blob = b64.b64encode(b"PNG-ish binary payload bytes here!!").decode()
    assert len(blob) % 4 == 0
    rows = [
        (0, blob, "bad"),
        (1, "ordinary prose with spaces", "good"),
        (2, "abc", "good"),  # charset-valid but length % 4 != 0
    ]
    d = _docs_dir(tmp_path, rows)
    out = base64_hygiene_documents(d).set_index("source")
    assert int(out.loc["bad", "n_base64ish"]) == 1
    assert int(out.loc["good", "n_base64ish"]) == 0
    _exact(base64_hygiene_documents(d), _BASE64_SQL, d)


# ---- UTF-8 encoding weight ----

from datapact_ray.pipelines.multimodal import (  # noqa: E402
    _ENCODING_WEIGHT_SQL,
    encoding_weight_documents,
)


def test_encoding_weight_oracle_exact_testdata():
    _exact(encoding_weight_documents(SF), _ENCODING_WEIGHT_SQL, SF)


def test_encoding_weight_separates_scripts(tmp_path):
    # CJK chars are 3 octets each; ASCII is 1; 'é' is 2
    d = tmp_path / "sf"
    d.mkdir(parents=True)
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["数据质量检查", "plain ascii text", "café café"]),
            "lang": pa.array(["zh", "en", "fr"]),
            "source": pa.array(["s"] * 3),
            "n_chars": pa.array([6, 16, 9], pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    out = encoding_weight_documents(str(d)).set_index("lang")
    assert float(out.loc["zh", "octets_per_char"]) == 3.0
    assert float(out.loc["en", "octets_per_char"]) == 1.0
    assert 1.0 < float(out.loc["fr", "octets_per_char"]) < 2.0
    _exact(encoding_weight_documents(str(d)), _ENCODING_WEIGHT_SQL, str(d))


def test_stoplist_share_rounds_half_away_like_duckdb(tmp_path):
    # 128 docs, one unique term each: share at k=1 is exactly 1/128 =
    # 0.0078125 — a 6-dp HALF boundary. Python's round() gives 0.007812
    # (half-even); DuckDB ROUND gives 0.007813. round_duck must agree.
    rows = [(i, f"uniq{i}", "s") for i in range(128)]
    d = _docs_dir(tmp_path, rows)
    out = stoplist_coverage_documents(d, ks=(1,))
    assert float(out["share"].iloc[0]) == 0.007813
    want = _duck(_stoplist_sql(ks=(1,)), d)
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False, check_exact=True,
    )
