"""Inter-turn ts-gap drift (``DriftCheck(derived="ts_gap")``): the
conversation-pacing distribution, digested on the conv shuffle. Tests
pin (a) exact gap coverage — every consecutive-turn pair once, including
across hot-shard boundaries, salted == unsalted; (b) the e2e verdict: a
re-stamped target (gaps collapsed 60 s → 1 s) FAILs KS while the
self-pair PASSes; (c) config validation requires an ordering ts."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datapact_ray.stages.keyed import KeyedSpec, run_keyed_pass


def _write_conv(dirpath, convs, n_files=2):
    """convs: {conv_id: [ts_epoch_us, ...]} — turn_idx = position."""
    os.makedirs(dirpath, exist_ok=True)
    rows = []
    for cid, tss in convs.items():
        for i, t in enumerate(tss):
            rows.append((cid, i, "user" if i % 2 == 0 else "assistant",
                         f"text {cid} {i}", None, t))
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    t = pa.Table.from_pandas(df, preserve_index=False).set_column(
        5, "ts", pa.Array.from_pandas(
            pd.to_datetime(df["ts"], unit="us"), type=pa.timestamp("us")
        )
    )
    # shuffle rows deterministically so in-file order != turn order
    idx = np.random.RandomState(7).permutation(len(df))
    t = t.take(pa.array(idx))
    per = (len(df) + n_files - 1) // n_files
    for f in range(n_files):
        pq.write_table(t.slice(f * per, per), f"{dirpath}/part-{f}.parquet")


def _gap_metrics(paths, hot_keys=None, span=4):
    spec = KeyedSpec(
        key_columns=["conv_id", "turn_idx"],
        uniqueness=True,
        group_column="conv_id",
        index_column="turn_idx",
        ts_column="ts",
        require_contiguous=True,
        require_monotonic_ts=True,
        ts_gap_digest=True,
        hot_keys=hot_keys or {},
        hot_shard_span=span,
        num_buckets=4,
    )
    files = sorted(glob.glob(f"{paths}/*.parquet"))
    return run_keyed_pass(
        None, None, spec, "gaps",
        source_files=files, target_files=files,
        columns=["conv_id", "turn_idx", "ts"],
    )


def test_gap_digest_exact_coverage(tmp_path):
    """Known gap multiset: conv A gaps [60, 120, 60] s, conv B gaps
    [5, 5] s. The digest's raw values (uncompressed at this size) must
    equal the multiset exactly — each consecutive pair once."""
    d = str(tmp_path / "src")
    base = 1_700_000_000_000_000
    _write_conv(d, {
        "a": [base, base + 60_000_000, base + 180_000_000, base + 240_000_000],
        "b": [base, base + 5_000_000, base + 10_000_000],
    })
    m = _gap_metrics(d)
    got = sorted(m.gap_digests[0].means.tolist())
    assert got == [5.0, 5.0, 60.0, 60.0, 120.0]
    assert m.gap_digests[0].count == 5


def test_gap_digest_hot_shard_stitch(tmp_path):
    """A hot conversation split into span-4 shards: interior gaps come
    from the vectorized pass, the shard-BOUNDARY gaps (turn 3→4, 7→8)
    from the driver stitch. Salted must equal unsalted exactly."""
    d = str(tmp_path / "hot")
    base = 1_700_000_000_000_000
    # 10 turns, gap between turn i-1 and i = i*10 seconds
    tss, t = [base], base
    for i in range(1, 10):
        t += i * 10_000_000
        tss.append(t)
    _write_conv(d, {"hot": tss, "cold": [base, base + 7_000_000]})
    expected = sorted([i * 10.0 for i in range(1, 10)] + [7.0])

    plain = _gap_metrics(d)
    salted = _gap_metrics(d, hot_keys={"hot": 10}, span=4)
    assert sorted(plain.gap_digests[0].means.tolist()) == expected
    assert sorted(salted.gap_digests[0].means.tolist()) == expected
    assert salted.gap_digests[0].count == plain.gap_digests[0].count == 10


def test_ts_gap_drift_e2e(tmp_path, ray_session):
    """Re-stamped target (60 s gaps collapsed to 1 s) FAILs the ts_gap
    KS drift; the self-pair PASSes with statistic 0."""
    from datapact_ray.config import (
        DriftCheck,
        OrderingCheck,
        ValidationSuite,
        ValidationTask,
    )
    from datapact_ray.runner import RunConfig, run_suite

    base = 1_700_000_000_000_000
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    convs_src = {
        f"c{i}": [base + j * 60_000_000 for j in range(6)] for i in range(40)
    }
    convs_tgt = {
        f"c{i}": [base + j * 1_000_000 for j in range(6)] for i in range(40)
    }
    _write_conv(src, convs_src)
    _write_conv(tgt, convs_tgt)

    def task(target, key):
        return ValidationTask(
            task_key=key, source_path=src, target_path=target,
            count_tolerance=0.0,
            ordering=OrderingCheck(),
            drift=[DriftCheck(column="ts", metric="ks", threshold=0.2,
                              derived="ts_gap")],
        )

    s = run_suite(
        ValidationSuite(validations=[task(tgt, "restamped")]),
        RunConfig(results_dir=str(tmp_path / "o1"), run_id=1),
    )
    p = s.results[0].payload["drift_validation_ts_ts_gap_ks"]
    assert p["status"] == "FAIL"
    assert float(p["statistic"]) > 0.9  # disjoint gap distributions

    s2 = run_suite(
        ValidationSuite(validations=[task(src, "self")]),
        RunConfig(results_dir=str(tmp_path / "o2"), run_id=1),
    )
    p2 = s2.results[0].payload["drift_validation_ts_ts_gap_ks"]
    assert p2["status"] == "PASS"
    assert float(p2["statistic"]) == 0.0


def test_ts_gap_requires_ordering_ts():
    from datapact_ray.config import DriftCheck, ValidationTask

    with pytest.raises(ValueError, match="ts_gap requires an ordering"):
        ValidationTask(
            task_key="t", source_path="a", target_path="b",
            count_tolerance=0.0,
            drift=[DriftCheck(column="ts", derived="ts_gap")],
        )


def test_ts_gap_one_side_collapsed_is_maximal_drift(tmp_path, ray_session):
    """Every target conversation collapsed to ONE turn → no gaps on that
    side → the disappearance itself is maximal drift (statistic 1.0),
    not a silent PASS."""
    from datapact_ray.config import (
        DriftCheck,
        OrderingCheck,
        ValidationSuite,
        ValidationTask,
    )
    from datapact_ray.runner import RunConfig, run_suite

    base = 1_700_000_000_000_000
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    _write_conv(src, {f"c{i}": [base, base + 60_000_000] for i in range(20)})
    _write_conv(tgt, {f"c{i}": [base] for i in range(20)})  # single turns
    task = ValidationTask(
        task_key="t", source_path=src, target_path=tgt,
        count_tolerance=1.0,
        ordering=OrderingCheck(require_contiguous=False,
                               require_monotonic_ts=False),
        drift=[DriftCheck(column="ts", metric="ks", threshold=0.2,
                          derived="ts_gap")],
    )
    s = run_suite(ValidationSuite(validations=[task]),
                  RunConfig(results_dir=str(tmp_path / "o"), run_id=1))
    p = s.results[0].payload["drift_validation_ts_ts_gap_ks"]
    assert p["status"] == "FAIL"
    assert float(p["statistic"]) == 1.0


def test_ordering_sides_honored(tmp_path, ray_session):
    """OrderingCheck(sides=...) must scope the contiguity/monotonicity
    rules: with sides='source', a target-side ordering hole neither
    fails the verdict nor emits target violation rows; sides='target'
    flips it."""
    from datapact_ray.config import (
        OrderingCheck,
        ValidationSuite,
        ValidationTask,
    )
    from datapact_ray.runner import RunConfig, run_suite

    base = 1_700_000_000_000_000
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    _write_conv(src, {f"c{i}": [base, base + 1_000_000] for i in range(10)})
    # target: c0 loses turn 0 → contiguity hole on the TARGET side only
    convs = {f"c{i}": [base, base + 1_000_000] for i in range(10)}
    _write_conv(tgt, convs)
    import pyarrow.parquet as pq2

    t = pq2.read_table(f"{tgt}/part-0.parquet")
    import pyarrow.compute as pc2

    mask = pc2.invert(
        pc2.and_(
            pc2.equal(t.column("conv_id"), "c0"),
            pc2.equal(t.column("turn_idx"), 0),
        )
    )
    pq2.write_table(t.filter(mask), f"{tgt}/part-0.parquet")

    def run(sides, key):
        task = ValidationTask(
            task_key=key, source_path=src, target_path=tgt,
            count_tolerance=1.0,
            ordering=OrderingCheck(sides=sides, require_monotonic_ts=False),
        )
        return run_suite(
            ValidationSuite(validations=[task]),
            RunConfig(results_dir=str(tmp_path / f"o_{key}"), run_id=1),
        ).results[0]

    r_src = run("source", "srconly")
    assert r_src.payload["ordering_validation_conv_id"]["status"] == "PASS"
    r_tgt = run("target", "tgtonly")
    assert r_tgt.payload["ordering_validation_conv_id"]["status"] == "FAIL"
    r_both = run("both", "both")
    assert r_both.payload["ordering_validation_conv_id"]["status"] == "FAIL"
