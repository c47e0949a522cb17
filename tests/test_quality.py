"""Data-quality audit operators (pipelines/quality.py): seeded
fixtures prove each op DISCRIMINATES (testdata may be clean on a given
violation class), NULL semantics match DuckDB, and results are
invariant to exchange geometry."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from datapact_ray.pipelines.quality import (
    ORACLE_SQL,
    fanout_orders_lineitem,
    id_gaps_orders,
    linenumber_integrity_lineitem,
    selfjoin_size_partkey,
)


@pytest.fixture(scope="module")
def qdir(tmp_path_factory):
    """Seeded violations: line-number gaps AND dup lines, missing +
    duplicate order ids, zero-children + NULL-key orders, one hot
    partkey."""
    d = tmp_path_factory.mktemp("quality_sf")
    rng = np.random.default_rng(7)

    # lineitem: orders 0..99. order 0: lines 1,2,2 (dup); order 1: lines
    # 2,3 (gap: doesn't start at 1); order 2: lines 1,3 (hole); orders
    # 3..99 clean 1..k. partkey: key 7 is hot (200 rows).
    rows = [(0, 1), (0, 2), (0, 2), (1, 2), (1, 3), (2, 1), (2, 3)]
    for o in range(3, 100):
        for ln in range(1, 1 + (o % 4) + 1):
            rows.append((o, ln))
    # NULL rows (appended, not mutated — the seeded violations above
    # must survive): excluded by both engines' WHERE
    rows += [(None, 5), (50, None)]
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_linenumber"])
    li["l_orderkey"] = pd.array(li["l_orderkey"], dtype="Int64")
    li["l_linenumber"] = pd.array(li["l_linenumber"], dtype="Int32")
    hot = np.full(len(li), 7, dtype="int64")
    cold = rng.integers(100, 400, len(li))
    li["l_partkey"] = np.where(rng.random(len(li)) < 0.5, hot, cold)
    li.to_parquet(d / "lineitem.parquet", row_group_size=16)

    # orders: ids 0..119 with 5 missing, 3 duplicated, 2 NULL-key rows;
    # ids >= 100 have zero lineitem children
    ids = [i for i in range(120) if i not in (11, 22, 33, 44, 55)]
    ids += [0, 1, 2]  # duplicate rows
    orders = pd.DataFrame({"o_orderkey": pd.array(ids, dtype="Int64")})
    orders = pd.concat(
        [orders, pd.DataFrame({"o_orderkey": pd.array([None, None], dtype="Int64")})],
        ignore_index=True,
    )
    orders.to_parquet(d / "orders.parquet", row_group_size=16)
    return str(d)


def _duck(sql: str, d: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
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
        df[c] = pd.to_numeric(df[c], errors="coerce").astype("float64")
    return df.reset_index(drop=True)


def _check(fn, name, d, **kw):
    got = _norm(fn(d, **kw))
    want = _norm(_duck(ORACLE_SQL[name], d))
    pd.testing.assert_frame_equal(got, want, check_like=True)
    return got


def test_linenumber_integrity_discriminates(qdir):
    got = _check(
        linenumber_integrity_lineitem, "linenumber_integrity_lineitem", qdir
    )
    assert got.loc[0, "n_with_dup_lines"] >= 1  # order 0
    assert got.loc[0, "n_with_gaps"] >= 2  # orders 1 and 2
    assert got.loc[0, "n_clean"] > 0


def test_id_gaps_discriminates(qdir):
    got = _check(id_gaps_orders, "id_gaps_orders", qdir)
    assert got.loc[0, "missing_keys"] == 5
    assert got.loc[0, "duplicate_rows"] == 3
    # NULL keys excluded from n_rows (SQL COUNT(col)): 115 ids + 3 dups
    assert got.loc[0, "n_rows"] == 118


def test_fanout_profile_discriminates(qdir):
    got = _check(fanout_orders_lineitem, "fanout_orders_lineitem", qdir)
    zero = got.loc[got["fanout"] == 0, "n_orders"]
    # >= 20 zero-children orders + 2 NULL-key orders land in fanout 0
    assert int(zero.iloc[0]) >= 22


def test_selfjoin_size_discriminates(qdir):
    got = _check(selfjoin_size_partkey, "selfjoin_size_partkey", qdir)
    assert got.loc[0, "max_key_rows"] >= 100  # the hot key dominates
    assert got.loc[0, "selfjoin_rows"] >= got.loc[0, "max_key_rows"] ** 2


def test_bucket_invariance(qdir):
    for fn, name in [
        (linenumber_integrity_lineitem, "linenumber_integrity_lineitem"),
        (id_gaps_orders, "id_gaps_orders"),
        (fanout_orders_lineitem, "fanout_orders_lineitem"),
        (selfjoin_size_partkey, "selfjoin_size_partkey"),
    ]:
        a = _norm(fn(qdir, num_buckets=3))
        b = _norm(fn(qdir, num_buckets=17))
        pd.testing.assert_frame_equal(a, b, check_like=True), name
