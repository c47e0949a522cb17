"""Resumable partitioned sink: exactly-once per partition, skip-finished
resume, crash-shaped partial states, lineage pinning."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datapact_ray.sink import write_partitioned_resumable


def _make_upper():
    # nested so cloudpickle ships it by value (test modules are not
    # importable inside Ray workers)
    def _upper(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return t.set_column(
            t.schema.get_field_index("s"), "s", _pc.utf8_upper(t.column("s"))
        )

    return _upper


@pytest.fixture()
def src(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    rng = np.random.default_rng(3)
    for k in range(3):
        df = pd.DataFrame(
            {
                "k": np.arange(k * 1000, (k + 1) * 1000),
                "s": [f"row{j}" for j in range(1000)],
                "v": rng.random(1000),
            }
        )
        df.to_parquet(d / f"part-{k}.parquet", row_group_size=200)
    return str(d)


def _read_all(out_dir: str) -> pd.DataFrame:
    files = sorted(
        f for f in os.listdir(out_dir) if f.endswith(".parquet")
    )
    dfs = [pq.read_table(os.path.join(out_dir, f)).to_pandas() for f in files]
    return (
        pd.concat(dfs, ignore_index=True)
        .sort_values("k")
        .reset_index(drop=True)
    )


def test_write_then_resume_skips_finished(src, tmp_path):
    out = str(tmp_path / "out")
    # small target -> several partitions
    r1 = write_partitioned_resumable(
        src, out, batch_fn=_make_upper(), target_bytes=16_000
    )
    assert r1["rows"] == 3000 and r1["written"] == r1["partitions"] > 1
    assert r1["skipped"] == 0
    full = _read_all(out)
    assert full["s"].str.isupper().all()

    mtimes = {
        f: os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out)
    }
    r2 = write_partitioned_resumable(
        src, out, batch_fn=_make_upper(), target_bytes=16_000
    )
    assert r2["written"] == 0 and r2["skipped"] == r1["partitions"]
    assert r2["rows"] == 3000
    for f, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, f)) == m  # untouched


def test_resume_recomputes_only_missing(src, tmp_path):
    out = str(tmp_path / "out")
    r1 = write_partitioned_resumable(
        src, out, batch_fn=_make_upper(), target_bytes=16_000
    )
    before = _read_all(out)

    # crash shape A: marker deleted (data present) -> unit rewritten
    os.remove(os.path.join(out, "part-00001._SUCCESS"))
    # crash shape B: data deleted (marker present) -> unit rewritten
    os.remove(os.path.join(out, "part-00000.parquet"))
    untouched = os.path.getmtime(os.path.join(out, "part-00002.parquet"))

    r2 = write_partitioned_resumable(
        src, out, batch_fn=_make_upper(), target_bytes=16_000
    )
    assert r2["written"] == 2 and r2["skipped"] == r1["partitions"] - 2
    assert r2["rows"] == 3000
    assert os.path.getmtime(os.path.join(out, "part-00002.parquet")) == untouched
    pd.testing.assert_frame_equal(_read_all(out), before)


def test_lineage_mismatch_fails_loudly(src, tmp_path):
    out = str(tmp_path / "out")
    write_partitioned_resumable(src, out, target_bytes=16_000)
    with pytest.raises(ValueError, match="lineage mismatch"):
        write_partitioned_resumable(src, out, target_bytes=32_000)
    # and changed inputs
    df = pd.DataFrame({"k": [1], "s": ["x"], "v": [0.5]})
    df.to_parquet(os.path.join(src, "part-9.parquet"))
    with pytest.raises(ValueError, match="lineage mismatch"):
        write_partitioned_resumable(src, out, target_bytes=16_000)


def test_rows_metadata_in_markers(src, tmp_path):
    out = str(tmp_path / "out")
    r = write_partitioned_resumable(src, out, target_bytes=16_000)
    total = 0
    for f in os.listdir(out):
        if f.endswith("._SUCCESS"):
            with open(os.path.join(out, f)) as fh:
                total += json.load(fh)["rows"]
    assert total == r["rows"] == 3000
