"""Null-key semantics: composite keys containing NULL are values (like
Spark's named_struct / DuckDB's row comparison — NULLs group together),
both for uniqueness counting and for the PK join."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datapact_ray.stages.keyed import KeyedSpec, run_keyed_pass


@pytest.fixture(scope="module")
def null_key_table(tmp_path_factory):
    d = tmp_path_factory.mktemp("nullkeys")
    t = pa.table(
        {
            "a": pa.array([1, 1, None, None, 2, 3, 3, 3], type=pa.int64()),
            "b": pa.array(["x", "x", "x", "x", None, "y", "y", "z"]),
            "v": pa.array([10.0, 10.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),
        }
    )
    pq.write_table(t, str(d / "t.parquet"))
    return str(d / "t.parquet"), t


def test_uniqueness_counts_match_duckdb(null_key_table):
    path, t = null_key_table
    spec = KeyedSpec(key_columns=["a", "b"], uniqueness=True, num_buckets=4)
    m = run_keyed_pass(
        None, None, spec, "nk", source_files=[path], columns=["a", "b"]
    )
    con = duckdb.connect()
    con.register("t", t)
    n, d = con.sql(
        "SELECT COUNT(*), COUNT(DISTINCT (a, b)) FROM t"
    ).fetchone()
    assert m.uniq_count[0] == n
    assert m.uniq_distinct[0] == d  # (NULL,'x') is ONE distinct key


def test_join_treats_null_keys_as_equal(null_key_table):
    """Self-join on (a, b): NULL keys match each other (hash-join
    semantics — deviation from SQL's NULL<>NULL inner join, documented:
    the engine compares key identity, so a fully-NULL key on both sides
    joins). Compared row count equals the sum of count(side_a)*count(side_b)
    per distinct key."""
    path, t = null_key_table
    spec = KeyedSpec(
        key_columns=["a", "b"], row_hash=True, hash_columns=["v"], num_buckets=4
    )
    m = run_keyed_pass(
        None,
        None,
        spec,
        "nk2",
        source_files=[path],
        target_files=[path],
        columns=["a", "b", "v"],
    )
    import pandas as pd

    df = t.to_pandas()
    sizes = df.groupby(["a", "b"], dropna=False).size()
    assert m.total_compared_rows == int((sizes**2).sum())
    # identical sides: zero mismatches only if each key group has one
    # distinct v; (NULL,'x') group has v={1,2} -> cross pairs mismatch
    expected_mismatches = 0
    for (_, _), g in df.groupby(["a", "b"], dropna=False):
        vs = g["v"].to_numpy()
        expected_mismatches += sum(
            1 for x in vs for y in vs if x != y
        )
    assert m.mismatch_count == expected_mismatches
