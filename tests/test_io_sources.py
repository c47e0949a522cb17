"""Multi-format sources: parquet / CSV / JSONL reads feed the same
validation passes (reference S1; format support is an engine extension)."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datapact_ray.io import count_rows, list_parquet_files, read_table, table_schema


@pytest.fixture(scope="module")
def tables(tmp_path_factory):
    d = tmp_path_factory.mktemp("formats")
    data = [
        {"k": i, "v": float(i) * 1.5, "s": f"row{i}"} for i in range(100)
    ]
    table = pa.Table.from_pylist(data)
    pq.write_table(table, str(d / "t.parquet"))
    with open(d / "t.csv", "w") as fh:
        fh.write("k,v,s\n")
        for r in data:
            fh.write(f"{r['k']},{r['v']},{r['s']}\n")
    with open(d / "t.jsonl", "w") as fh:
        for r in data:
            fh.write(json.dumps(r) + "\n")
    return d


@pytest.mark.parametrize("name", ["t.parquet", "t.csv", "t.jsonl"])
def test_read_and_filter_each_format(tables, name):
    path = str(tables / name)
    schema = table_schema(path)
    assert set(schema.names) == {"k", "v", "s"}
    ds = read_table(path, columns=["k", "v"], filter_sql="k >= 50 AND v < 120")
    df = ds.to_pandas()
    assert set(df.columns) == {"k", "v"}
    assert len(df) == len([r for r in range(50, 100) if r * 1.5 < 120])
    assert df["k"].min() >= 50


def test_count_rows_parquet_only(tables):
    assert count_rows(str(tables / "t.parquet")) == 100
    assert count_rows(str(tables / "t.csv")) == 0  # metadata-free fallback


def test_suite_runs_on_csv_inputs(tables, tmp_path):
    from datapact_ray.config import ValidationSuite, ValidationTask
    from datapact_ray.runner import RunConfig, run_suite

    task = ValidationTask(
        task_key="csv",
        source_path=str(tables / "t.csv"),
        target_path=str(tables / "t.parquet"),
        primary_keys=["k"],
        count_tolerance=0.0,
        uniqueness_columns=["k"],
        uniqueness_tolerance=0.0,
        compare_columns=["s"],
    )
    s = run_suite(
        ValidationSuite(validations=[task]),
        RunConfig(results_dir=str(tmp_path / "o"), run_id=1, num_buckets=4),
    )
    assert s.results[0].status == "SUCCESS", s.results[0].payload


def test_parquet_blocks_metadata_free_and_pruned(tmp_path):
    """Pandas-written parquet carries a b'pandas' schema-metadata blob
    that breaks hash(pa.Schema) and Ray's schema-dedup fast path;
    read_table must emit metadata-free blocks in the requested column
    order, including when a filter references a column outside the
    projection."""
    import pandas as pd

    df = pd.DataFrame(
        {"a": range(50), "b": [float(i) for i in range(50)], "c": ["x"] * 50}
    )
    df.to_parquet(tmp_path / "t.parquet")  # pandas writer => metadata blob
    assert pq.read_schema(tmp_path / "t.parquet").metadata  # precondition

    ds = read_table(str(tmp_path / "t.parquet"), columns=["c", "a"])
    batch = next(iter(ds.iter_batches(batch_format="pyarrow")))
    assert not batch.schema.metadata
    assert batch.schema.names == ["c", "a"]

    ds2 = read_table(
        str(tmp_path / "t.parquet"), columns=["c"], filter_sql="a >= 40"
    )
    got = ds2.to_pandas()
    assert len(got) == 10 and "c" in got.columns
    for b in ds2.iter_batches(batch_format="pyarrow"):
        assert not b.schema.metadata
