"""Hot-key salting correctness: splitting hot conversations into
contiguous turn-range shards must leave every metric exactly unchanged
(north rule: skew mitigation without changing verdicts)."""

import numpy as np
import pyarrow as pa
import pytest

from datapact_ray.datagen import make_source, make_target, write_fixture_pair
from datapact_ray.stages.keyed import KeyedSpec, run_keyed_pass


@pytest.fixture(scope="module")
def hot_pair(tmp_path_factory):
    out = tmp_path_factory.mktemp("hot")
    paths = write_fixture_pair(
        str(out), n_convs=100, turns_per_conv=8, hot_convs=1, hot_turns=20_000,
        n_files=4,
    )
    return paths


def _metrics(paths, hot_keys, span=1024, checkpoint_dir=None):
    import glob

    spec = KeyedSpec(
        checkpoint_dir=checkpoint_dir,
        key_columns=["conv_id", "turn_idx"],
        row_hash=True,
        hash_columns=["role", "text", "tool"],
        compare_columns=["text"],
        null_join_columns=["tool"],
        uniqueness=True,
        group_column="conv_id",
        index_column="turn_idx",
        ts_column="ts",
        require_contiguous=True,
        require_monotonic_ts=True,
        turn_count_digest=True,
        hot_keys=hot_keys,
        hot_shard_span=span,
        num_buckets=8,
    )
    return run_keyed_pass(
        None,
        None,
        spec,
        "salt",
        source_files=sorted(glob.glob(f"{paths['source']}/*.parquet")),
        target_files=sorted(glob.glob(f"{paths['target']}/*.parquet")),
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )


def test_salted_equals_unsalted(hot_pair):
    hot_conv = "conv-00000100"  # the appended hot conversation
    unsalted = _metrics(hot_pair, hot_keys={})
    salted = _metrics(hot_pair, hot_keys={hot_conv: 20_000}, span=1024)

    assert salted.total_compared_rows == unsalted.total_compared_rows
    assert salted.mismatch_count == unsalted.mismatch_count
    assert salted.compare_mismatches == unsalted.compare_mismatches
    assert salted.null_join == unsalted.null_join
    assert salted.uniq_count == unsalted.uniq_count
    assert salted.uniq_distinct == unsalted.uniq_distinct
    assert salted.groups_checked == unsalted.groups_checked
    assert salted.contiguity_violations == unsalted.contiguity_violations
    assert salted.monotonicity_violations == unsalted.monotonicity_violations
    # turn-count distributions agree (same quantiles)
    qs = np.array([0.1, 0.5, 0.9])
    for side in (0, 1):
        a, b = salted.digests[side], unsalted.digests[side]
        assert a.count == b.count
        assert np.allclose(a.quantile(qs), b.quantile(qs), rtol=0.05)


def test_salted_detects_hot_conv_corruption(tmp_path):
    """Delete a mid-range turn of the hot conversation: the stitched
    shard partials must still flag non-contiguity."""
    import pyarrow.parquet as pq

    src = make_source(20, 8, hot_convs=1, hot_turns=5_000)
    tgt_df = src.to_pandas()
    hot_conv = "conv-00000020"
    drop = (tgt_df["conv_id"] == hot_conv) & (tgt_df["turn_idx"] == 2_500)
    tgt = pa.Table.from_pandas(tgt_df[~drop].reset_index(drop=True)).cast(src.schema)
    sdir, tdir = tmp_path / "s", tmp_path / "t"
    sdir.mkdir(), tdir.mkdir()
    pq.write_table(src, str(sdir / "p.parquet"))
    pq.write_table(tgt, str(tdir / "p.parquet"))
    paths = {"source": str(sdir), "target": str(tdir)}
    ckpt = str(tmp_path / "ckpt")
    m = _metrics(paths, hot_keys={hot_conv: 5_000}, span=512, checkpoint_dir=ckpt)
    # source hot conv is fine; target hot conv lost turn 2500 -> 1 violation
    assert m.contiguity_violations == [0, 1]
    assert m.groups_checked == [21, 21]
    # the stitched hot verdict must also materialize as a violation ROW
    import json

    import pyarrow.parquet as pq

    v = pq.read_table(f"{ckpt}/hot/violations.parquet").to_pandas()
    assert len(v) == 1
    assert v.iloc[0]["check_alias"] == "ordering_validation_conv_id"
    assert json.loads(v.iloc[0]["key"]) == {"conv_id": hot_conv}
    assert v.iloc[0]["side"] == "target"
    assert json.loads(v.iloc[0]["detail"])["reason"] == "non_contiguous_turn_idx"
