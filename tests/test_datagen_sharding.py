"""Shard-parallel fixture generation must be byte-equivalent to the
monolithic path: any sharding of the same global row space [0, N) has to
produce the identical source/target/dim tables once shards are read back
in shard order. This pins the counter-hash design (row values derived
from global row id, never from shard-local state) that lets datagen fan
out as independent Ray tasks."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from datapact_ray.datagen import (
    make_conversations_dim,
    make_source,
    make_target,
    write_fixture_pair,
)

CORRUPTION = dict(
    delete_mod=47,
    dup_mod=89,
    null_tool_mod=23,
    corrupt_text_mod=83,
    ts_shift_bucket_mod=7,
    orphan_mod=101,
    swap_order_mod=61,
)


def _sorted(t: pa.Table) -> pa.Table:
    keys = [(c, "ascending") for c in t.column_names if c != "ts"]
    keys.append(("ts", "ascending"))
    return t.sort_by(keys).combine_chunks()


def _read_sorted_parts(dir_path: str) -> pa.Table:
    import glob
    import os

    parts = sorted(glob.glob(os.path.join(dir_path, "part-*.parquet")))
    return pa.concat_tables([pq.read_table(p) for p in parts]).combine_chunks()


def test_sharded_equals_monolith(tmp_path):
    n_convs, tpc = 37, 6  # deliberately not divisible by n_files
    src_mono = make_source(n_convs, tpc, hot_convs=1, hot_turns=50, seed=7)
    tgt_mono = make_target(src_mono, **CORRUPTION)
    dim_mono = make_conversations_dim(src_mono)

    paths = write_fixture_pair(
        str(tmp_path),
        n_convs=n_convs,
        turns_per_conv=tpc,
        hot_convs=1,
        hot_turns=50,
        n_files=5,
        seed=7,
        **CORRUPTION,
    )
    src_sh = _read_sorted_parts(paths["source"])
    tgt_sh = _read_sorted_parts(paths["target"])
    dim_sh = _read_sorted_parts(paths["dim"])

    assert src_sh.equals(src_mono.combine_chunks())
    # corruption-added rows (dups, orphans) are appended at shard-local
    # positions; the target is semantically unordered, so compare as a
    # sorted multiset
    assert _sorted(tgt_sh).equals(_sorted(tgt_mono))
    # dim rows are owned by the shard containing a conversation's first
    # turn, so shard-order concat preserves first-appearance order too
    assert dim_sh.equals(dim_mono.combine_chunks())


def test_shard_count_does_not_change_tables(tmp_path):
    a = write_fixture_pair(str(tmp_path / "a"), n_convs=30, turns_per_conv=5,
                           n_files=1, seed=3, **CORRUPTION)
    b = write_fixture_pair(str(tmp_path / "b"), n_convs=30, turns_per_conv=5,
                           n_files=7, seed=3, **CORRUPTION)
    for name in ("source", "target", "dim"):
        ta = _read_sorted_parts(a[name])
        tb = _read_sorted_parts(b[name])
        if name == "target":
            ta, tb = _sorted(ta), _sorted(tb)
        assert ta.equals(tb), name
