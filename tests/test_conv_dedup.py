"""Conversation-level exact dedup (ConvDedupCheck): polynomial
fingerprint math vs a naive oracle, e2e verdicts over planted duplicate
conversations, order sensitivity, bucket invariance, hot-key salting
equivalence, and checkpoint resume."""

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datapact_ray.config import (
    ConvDedupCheck,
    OrderingCheck,
    ValidationSuite,
    ValidationTask,
)
from datapact_ray.runner import RunConfig, run_suite
from datapact_ray.stages.keyed import (
    _FP_R1,
    _FP_R2,
    _FP_X2,
    _fp_shift,
    _poly_fps,
    KeyedSpec,
    run_keyed_pass,
)

U64 = 1 << 64


def _naive_fp(hashes, R):
    acc = 0
    for j, h in enumerate(hashes):
        acc = (acc + int(h) * pow(int(R), j, U64)) % U64
    return acc


def test_poly_fps_matches_naive():
    rng = np.random.default_rng(7)
    n = 500
    h = rng.integers(0, U64, size=n, dtype=np.uint64)
    # random segmentation incl. length-1 segments
    starts = np.unique(
        np.concatenate([[0], rng.integers(1, n, size=40)])
    ).astype(np.int64)
    fp1, fp2 = _poly_fps(h, starts)
    bounds = list(starts) + [n]
    for k in range(len(starts)):
        seg = h[bounds[k] : bounds[k + 1]]
        assert int(fp1[k]) == _naive_fp(seg, _FP_R1)
        assert int(fp2[k]) == _naive_fp(seg ^ _FP_X2, _FP_R2)


def test_fp_shift_stitches_shards():
    """fp(concat(a, b)) == fp(a) + fp(b)·R^len(a) — the hot-shard
    stitch identity, for both lanes."""
    rng = np.random.default_rng(11)
    a = rng.integers(0, U64, size=37, dtype=np.uint64)
    b = rng.integers(0, U64, size=53, dtype=np.uint64)
    whole = np.concatenate([a, b])
    for lane, (R, remix) in enumerate(
        [(_FP_R1, np.uint64(0)), (_FP_R2, _FP_X2)]
    ):
        fa = _naive_fp(a ^ remix, R)
        fb = _naive_fp(b ^ remix, R)
        fw = _naive_fp(whole ^ remix, R)
        assert (fa + _fp_shift(fb, len(a), lane)) % U64 == fw


def _conv(conv_id, texts, roles=None):
    n = len(texts)
    return pd.DataFrame(
        {
            "conv_id": [conv_id] * n,
            "turn_idx": np.arange(n, dtype=np.int64),
            "role": roles or (["user", "assistant"] * n)[:n],
            "text": texts,
            "ts": pd.to_datetime("2026-01-01") + pd.to_timedelta(range(n), "s"),
        }
    )


def _write_side(path, frames, n_files=2):
    os.makedirs(path, exist_ok=True)
    df = pd.concat(frames, ignore_index=True)
    parts = np.array_split(df, n_files)
    for i, part in enumerate(parts):
        pq.write_table(
            pa.Table.from_pandas(part, preserve_index=False),
            os.path.join(path, f"part-{i}.parquet"),
        )


@pytest.fixture(scope="module")
def dup_pair(tmp_path_factory):
    """Source side plants: a 3-way duplicate group (2 dup convs), a
    2-way group (1 dup), a near-dup differing in ONE turn, a REORDERED
    copy, and a prefix-extended copy — only the first two groups count.
    Target side is clean."""
    root = tmp_path_factory.mktemp("convdup")
    base = [
        _conv(f"base-{i:03d}", [f"q {i} {j}" for j in range(4)])
        for i in range(40)
    ]
    trip = [
        _conv(cid, ["hello", "world", "again", "done"])
        for cid in ("dup-a1", "dup-a2", "dup-a3")
    ]
    pair = [_conv(cid, ["foo", "bar"]) for cid in ("dup-b1", "dup-b2")]
    near = _conv("near-1", ["hello", "world", "AGAIN", "done"])
    reordered = _conv("reord-1", ["world", "hello", "again", "done"])
    extended = _conv("ext-1", ["hello", "world", "again", "done", "extra"])
    src = base + trip + pair + [near, reordered, extended]
    tgt = base + [
        _conv(cid, [f"t {cid} {j}" for j in range(4)])
        for cid in ("dup-a1", "dup-a2", "dup-a3", "dup-b1", "dup-b2")
    ] + [near, reordered, extended]
    _write_side(str(root / "source"), src)
    _write_side(str(root / "target"), tgt)
    return {"source": str(root / "source"), "target": str(root / "target")}


def _run(dup_pair, tmp_path, tolerance=0.0, with_pk=True, num_buckets=4,
         sides="both"):
    task = ValidationTask(
        task_key="convdup",
        source_path=dup_pair["source"],
        target_path=dup_pair["target"],
        primary_keys=["conv_id", "turn_idx"] if with_pk else None,
        pk_row_hash_check=with_pk,
        ordering=OrderingCheck(ts_column="ts"),
        conv_dedup=ConvDedupCheck(
            content_columns=["role", "text"], tolerance=tolerance, sides=sides
        ),
    )
    cfg = RunConfig(results_dir=str(tmp_path), run_id=1, num_buckets=num_buckets)
    summary = run_suite(ValidationSuite(validations=[task]), cfg)
    res = summary.results[0]
    v = next(
        x for x in res.verdicts if x.alias == "conv_dedup_validation_conv_id"
    )
    return res, v


def test_conv_dedup_e2e_counts(dup_pair, tmp_path):
    res, v = _run(dup_pair, tmp_path)
    p = v.payload
    # 48 source convs, 3 duplicates (dup-a2, dup-a3, dup-b2)
    assert p["source_conversations"] == "48"
    assert p["source_duplicates"] == "3"
    assert p["target_conversations"] == "48"
    assert p["target_duplicates"] == "0"
    assert not v.passed
    assert res.status == "FAILURE"


def test_conv_dedup_violation_rows(dup_pair, tmp_path):
    _run(dup_pair, tmp_path)
    files = glob.glob(
        str(tmp_path / "violations" / "run_id=1" / "task=convdup" / "*.parquet")
    )
    rows = pd.concat([pq.read_table(f).to_pandas() for f in files])
    dd = rows[rows["check_alias"] == "conv_dedup_validation_conv_id"]
    keys = sorted(json.loads(k)["conv_id"] for k in dd["key"])
    assert keys == ["dup-a2", "dup-a3", "dup-b2"]
    details = [json.loads(d) for d in dd.sort_values("key")["detail"]]
    assert {d["duplicate_of"] for d in details} == {"dup-a1", "dup-b1"}
    assert all(d["reason"] == "duplicate_conversation" for d in details)
    sizes = sorted(d["group_size"] for d in details)
    assert sizes == [2, 3, 3]
    assert set(dd["side"]) == {"source"}


def test_conv_dedup_tolerance_and_sides(dup_pair, tmp_path):
    _, v = _run(dup_pair, tmp_path / "tol", tolerance=0.1)
    assert v.passed  # 3/48 = 6.25% <= 10%
    _, v = _run(dup_pair, tmp_path / "tgt", sides="target")
    assert v.passed  # target side is clean
    assert "source_conversations" not in v.payload


def test_conv_dedup_bucket_invariance(dup_pair, tmp_path):
    _, v1 = _run(dup_pair, tmp_path / "b1", num_buckets=1)
    _, v7 = _run(dup_pair, tmp_path / "b7", num_buckets=7)
    for k in ("source_duplicates", "source_conversations", "target_duplicates"):
        assert v1.payload[k] == v7.payload[k]


def test_conv_dedup_standalone_conv_pass(dup_pair, tmp_path):
    """Without PK checks the conv-dedup rides the standalone conv
    shuffle — same counts."""
    _, v = _run(dup_pair, tmp_path, with_pk=False)
    assert v.payload["source_duplicates"] == "3"
    assert v.payload["target_duplicates"] == "0"


def _spec(tmp_path, hot_keys=None, num_buckets=5, resume=False):
    return KeyedSpec(
        key_columns=["conv_id", "turn_idx"],
        group_column="conv_id",
        index_column="turn_idx",
        conv_dedup_columns=["role", "text"],
        hot_keys=hot_keys or {},
        hot_shard_span=4,
        num_buckets=num_buckets,
        checkpoint_dir=str(tmp_path) if tmp_path else None,
        resume=resume,
    )


def test_conv_dedup_hot_salting_equivalence(tmp_path):
    """A duplicated pair of LONG conversations detected identically
    whether whole (cold) or salted into shards (hot): the polynomial
    stitch is exact."""
    import ray.data

    long_a = _conv("hot-1", [f"line {j % 7}" for j in range(40)])
    long_b = _conv("hot-2", [f"line {j % 7}" for j in range(40)])
    other = _conv("cold-1", ["x", "y"])
    df = pd.concat([long_a, long_b, other], ignore_index=True)
    ds = ray.data.from_pandas(df)

    m_cold = run_keyed_pass(
        ds, None, _spec(None), "t", batch_size=16
    )
    m_hot = run_keyed_pass(
        ds,
        None,
        _spec(None, hot_keys={"hot-1": 40, "hot-2": 40}),
        "t",
        batch_size=16,
    )
    assert m_cold.conv_dup_convs[0] == 1
    assert m_hot.conv_dup_convs[0] == 1
    assert m_cold.conv_distinct[0] == m_hot.conv_distinct[0] == 2


def test_conv_dedup_resume_from_checkpoint(dup_pair, tmp_path):
    """Second run with resume=True reuses every bucket checkpoint —
    fingerprints reload from convfp.parquet through Ray tasks and the
    dup counts are identical."""
    import ray.data

    src = ray.data.read_parquet(sorted(glob.glob(dup_pair["source"] + "/*.parquet")))
    ck = str(tmp_path / "ck")
    m1 = run_keyed_pass(src, None, _spec(ck), "t")
    # all buckets checkpointed with fingerprints
    fps = glob.glob(os.path.join(ck, "bucket=*", "convfp.parquet"))
    assert fps
    m2 = run_keyed_pass(src, None, _spec(ck, resume=True), "t")
    assert m1.conv_dup_convs == m2.conv_dup_convs
    assert m1.conv_distinct == m2.conv_distinct


def test_config_validators():
    with pytest.raises(ValueError, match="must agree"):
        ValidationTask(
            task_key="x",
            source_path="a",
            target_path="b",
            ordering=OrderingCheck(group_column="conv_id"),
            conv_dedup=ConvDedupCheck(group_column="session_id"),
        )
    with pytest.raises(ValueError, match="content column"):
        ConvDedupCheck(content_columns=["conv_id", "text"])
    with pytest.raises(ValueError, match="non-empty"):
        ConvDedupCheck(content_columns=[])


def test_hot_dedup_violations_cite_real_keys(tmp_path):
    """Hot keys detected as raw hashes (the footer path) must still
    yield violation rows citing the real conversation id — the display
    key rides the shard partials (gkey), not the hash."""
    import ray.data

    from datapact_ray.sketches import hash_arrow_column_u64

    long_a = _conv("hot-b", [f"line {j % 7}" for j in range(40)])
    long_b = _conv("hot-a", [f"line {j % 7}" for j in range(40)])
    df = pd.concat([long_a, long_b], ignore_index=True)
    hashes = hash_arrow_column_u64(pa.array(["hot-a", "hot-b"]))
    hot = {int(h): 40 for h in hashes.tolist()}
    ck = str(tmp_path / "ck")
    m = run_keyed_pass(
        ray.data.from_pandas(df),
        None,
        _spec(ck, hot_keys=hot),
        "t",
        batch_size=16,
    )
    assert m.conv_dup_convs[0] == 1
    rows = pq.read_table(
        os.path.join(ck, "convdup", "violations.parquet")
    ).to_pandas()
    assert json.loads(rows["key"].iloc[0])["conv_id"] == "hot-b"
    assert json.loads(rows["detail"].iloc[0])["duplicate_of"] == "hot-a"


def test_near_mode_flags_reordered_and_subset_free(dup_pair, tmp_path):
    """mode=near treats a conversation as the SET of its turn hashes:
    the REORDERED copy (identical set, Jaccard 1.0 — flagged with
    probability 1 at any band width) now flags alongside the exact
    groups; a content-disjoint conversation never flags."""
    task = ValidationTask(
        task_key="near",
        source_path=dup_pair["source"],
        target_path=dup_pair["target"],
        ordering=OrderingCheck(ts_column="ts"),
        conv_dedup=ConvDedupCheck(
            content_columns=["role", "text"], mode="near", tolerance=1.0
        ),
    )
    s = run_suite(
        ValidationSuite(validations=[task]),
        RunConfig(results_dir=str(tmp_path), run_id=1, num_buckets=4),
    )
    res = s.results[0]
    v = next(
        x for x in res.verdicts if x.alias == "conv_dedup_validation_conv_id"
    )
    assert v.payload["mode"] == "near"
    # J=1 (identical (role, text) SETS): {dup-a1,a2,a3} + {dup-b1,b2} —
    # five certain flags. reord-1 pairs roles with DIFFERENT texts
    # (positional roles), so its set differs (J=1/3 vs dup-a); it,
    # near-1 (J=3/5) and ext-1 (J=4/5) may or may not band-collide under
    # the pinned lane constants — assert the certain flags as a lower
    # bound and that the 40 content-disjoint base conversations never
    # flag
    flagged = int(v.payload["source_duplicates"].replace(",", ""))
    assert 5 <= flagged <= 8
    assert int(v.payload["target_duplicates"]) <= 3  # near/reord/ext only
    import glob as _g

    files = _g.glob(
        str(tmp_path / "violations" / "run_id=1" / "task=near" / "*.parquet")
    )
    rows = pd.concat([pq.read_table(f).to_pandas() for f in files])
    dd = rows[rows["check_alias"] == "conv_dedup_validation_conv_id"]
    src_keys = {
        json.loads(k)["conv_id"]
        for k, sd in zip(dd["key"], dd["side"])
        if sd == "source"
    }
    assert {"dup-a1", "dup-a2", "dup-a3", "dup-b1", "dup-b2"} <= src_keys
    assert not any(k.startswith("base-") for k in src_keys)
    details = [json.loads(d) for d in dd["detail"]]
    assert all(d["reason"] == "near_duplicate_candidate" for d in details)


def test_near_mode_hot_stitch_flags(tmp_path):
    """A hot (salted) conversation whose turn SET matches a cold one is
    flagged: shard lane minima stitch by elementwise min."""
    import ray.data

    long_a = _conv("hotn-1", [f"line {j}" for j in range(40)], roles=["user"] * 40)
    # same SET of (role, text) turns in reverse order — and hotn-1 hot
    long_b = _conv(
        "coldn-1", [f"line {39 - j}" for j in range(40)], roles=["user"] * 40
    )
    df = pd.concat([long_a, long_b], ignore_index=True)
    spec = _spec(str(tmp_path / "ck"), hot_keys={"hotn-1": 40})
    spec.conv_dedup_mode = "near"
    m = run_keyed_pass(ray.data.from_pandas(df), None, spec, "t", batch_size=16)
    assert m.conv_dup_convs[0] == 2  # both members of the J=1 pair


def test_normalize_mode_catches_reformatted_copy(tmp_path):
    """normalize=True lowercases and collapses whitespace before
    hashing, so a reformatted copy is an EXACT duplicate."""
    import ray.data

    a = _conv("n-1", ["Hello   World", "How  are you?"])
    b = _conv("n-2", ["hello world", "how are You?"])
    df = pd.concat([a, b], ignore_index=True)
    spec = _spec(None)
    m0 = run_keyed_pass(ray.data.from_pandas(df), None, spec, "t")
    assert m0.conv_dup_convs[0] == 0  # raw text differs
    spec2 = _spec(None)
    spec2.conv_dedup_normalize = True
    m1 = run_keyed_pass(ray.data.from_pandas(df), None, spec2, "t")
    assert m1.conv_dup_convs[0] == 1


# ---- property fuzz: fingerprint algebra under random shard splits ----

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    data=st.lists(
        st.integers(min_value=0, max_value=(1 << 64) - 1),
        min_size=1,
        max_size=120,
    ),
    cut_seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_poly_fp_shard_split_invariance_fuzz(data, cut_seed):
    """fp(whole) == Σ fp(shard_i)·R^offset_i for EVERY way of cutting
    the sequence into contiguous shards — the exactness contract the
    hot-conversation stitch relies on, fuzzed over random hash streams
    and random cut sets (both lanes)."""
    h = np.array(data, dtype=np.uint64)
    rng = np.random.default_rng(cut_seed)
    n_cuts = int(rng.integers(0, min(5, len(h))))
    cuts = sorted(set(rng.integers(1, len(h), size=n_cuts).tolist())) if n_cuts else []
    bounds = [0] + cuts + [len(h)]
    whole1, whole2 = _poly_fps(h, np.array([0]))
    acc1 = acc2 = 0
    offset = 0
    for a, b in zip(bounds, bounds[1:]):
        f1, f2 = _poly_fps(h[a:b], np.array([0]))
        acc1 = (acc1 + _fp_shift(int(f1[0]), offset, 0)) % U64
        acc2 = (acc2 + _fp_shift(int(f2[0]), offset, 1)) % U64
        offset += b - a
    assert acc1 == int(whole1[0])
    assert acc2 == int(whole2[0])


@settings(max_examples=40, deadline=None)
@given(
    data=st.lists(
        st.integers(min_value=0, max_value=(1 << 64) - 1),
        min_size=1,
        max_size=80,
    ),
    cut=st.integers(min_value=0, max_value=2**31 - 1),
    perm_seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_minhash_shard_and_order_invariance_fuzz(data, cut, perm_seed):
    """Near-mode lane minima are (a) exactly mergeable by elementwise
    min across any contiguous split and (b) invariant under permutation
    and duplication of the turn stream (set semantics)."""
    from datapact_ray.stages.keyed import _minhash_mins

    h = np.array(data, dtype=np.uint64)
    whole = _minhash_mins(h, np.array([0]), 8)[0]
    k = cut % len(h)
    if k:
        a = _minhash_mins(h[:k], np.array([0]), 8)[0]
        b = _minhash_mins(h[k:], np.array([0]), 8)[0]
        assert np.array_equal(np.minimum(a, b), whole)
    rng = np.random.default_rng(perm_seed)
    shuffled = np.concatenate([h, h[rng.permutation(len(h))]])  # dup + perm
    assert np.array_equal(_minhash_mins(shuffled, np.array([0]), 8)[0], whole)


def test_conv_dedup_interrupted_run_resumes_exactly(dup_pair, tmp_path):
    """Simulated interruption mid-suite: two keyed bucket checkpoints
    lost, resume with the same run_id → identical dedup verdict; the
    surviving bucket's fingerprints are REUSED (convfp.parquet
    untouched), not recomputed."""
    import time as _time

    task = ValidationTask(
        task_key="cd",
        source_path=dup_pair["source"],
        target_path=dup_pair["target"],
        primary_keys=["conv_id", "turn_idx"],
        pk_row_hash_check=True,
        ordering=OrderingCheck(ts_column="ts"),
        conv_dedup=ConvDedupCheck(content_columns=["role", "text"]),
    )
    suite = ValidationSuite(validations=[task])
    out = str(tmp_path / "res")
    s1 = run_suite(suite, RunConfig(results_dir=out, run_id=5, num_buckets=6))
    p1 = s1.results[0].payload["conv_dedup_validation_conv_id"]
    assert p1["source_duplicates"] == "3"

    ck = f"{out}/checkpoint/run_id=5/task=cd/keyed"
    markers = sorted(glob.glob(f"{ck}/bucket=*/_SUCCESS"))
    assert len(markers) >= 3
    os.remove(markers[0])
    os.remove(markers[-1])
    kept_fp = os.path.join(os.path.dirname(markers[1]), "convfp.parquet")
    kept_mtime = os.path.getmtime(kept_fp)
    _time.sleep(0.05)

    s2 = run_suite(
        suite, RunConfig(results_dir=out, run_id=5, num_buckets=6, resume=True)
    )
    p2 = s2.results[0].payload["conv_dedup_validation_conv_id"]
    assert p1 == p2
    assert os.path.getmtime(kept_fp) == kept_mtime  # fingerprints reused
    # violation rows identical after resume
    vf = glob.glob(f"{out}/violations/run_id=5/task=cd/keyed.parquet")
    rows = pq.read_table(vf[0]).to_pandas()
    dd = rows[rows["check_alias"] == "conv_dedup_validation_conv_id"]
    assert sorted(json.loads(k)["conv_id"] for k in dd["key"]) == [
        "dup-a2", "dup-a3", "dup-b2",
    ]


def test_rekeyed_conversation_census(tmp_path):
    """Exact-mode census of re-keyed conversations: content present on
    the other side only under DIFFERENT keys — the migration signal the
    PK join can't see."""
    same = _conv("stable-1", ["a", "b"])
    src = [same, _conv("old-key", ["moved", "content"]),
           _conv("kept", ["dup", "target"])]
    # target: same content as old-key but under new-key; 'kept' exists
    # under BOTH its own key and an extra copy under another key
    tgt = [same, _conv("new-key", ["moved", "content"]),
           _conv("kept", ["dup", "target"]),
           _conv("extra-copy", ["dup", "target"])]
    _write_side(str(tmp_path / "source"), src)
    _write_side(str(tmp_path / "target"), tgt)
    task = ValidationTask(
        task_key="rk",
        source_path=str(tmp_path / "source"),
        target_path=str(tmp_path / "target"),
        ordering=OrderingCheck(ts_column="ts"),
        conv_dedup=ConvDedupCheck(content_columns=["role", "text"],
                                  tolerance=1.0),
    )
    s = run_suite(
        ValidationSuite(validations=[task]),
        RunConfig(results_dir=str(tmp_path / "out"), run_id=1, num_buckets=3),
    )
    v = next(
        x
        for x in s.results[0].verdicts
        if x.alias == "conv_dedup_validation_conv_id"
    )
    # old-key's content exists on target only under new-key -> 1;
    # stable-1 and kept match under their own keys -> not rekeyed
    assert v.payload["source_rekeyed_conversations"] == "1"
    # new-key (content on source only under old-key) + extra-copy
    # (content on source only under kept... wait, kept IS on source) ->
    # extra-copy's content exists on source under 'kept', not under
    # 'extra-copy' -> rekeyed; new-key likewise -> 2
    assert v.payload["target_rekeyed_conversations"] == "2"
    # sides="source" or near mode: census omitted
    task2 = task.model_copy(update={
        "task_key": "rk2",
        "conv_dedup": ConvDedupCheck(content_columns=["role", "text"],
                                     tolerance=1.0, sides="source"),
    })
    s2 = run_suite(
        ValidationSuite(validations=[task2]),
        RunConfig(results_dir=str(tmp_path / "out2"), run_id=1, num_buckets=3),
    )
    v2 = next(
        x
        for x in s2.results[0].verdicts
        if x.alias == "conv_dedup_validation_conv_id"
    )
    assert "source_rekeyed_conversations" not in v2.payload


def test_multiset_vs_sequence_census_semantics(tmp_path):
    """Constant-index canonicalization: same parts in DIFFERENT line
    order count as duplicate MULTISETS but distinct SEQUENCES."""
    df = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 1, 2, 2, 2, 3, 3, 3],
            "l_linenumber": [1, 2, 3, 1, 2, 3, 1, 2, 3],
            "l_partkey": [10, 20, 30, 30, 10, 20, 10, 20, 99],
        }
    )
    os.makedirs(str(tmp_path / "d"), exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "d" / "lineitem.parquet"),
    )
    from datapact_ray.pipelines.relational import (
        dup_part_multisets_lineitem,
        dup_part_sequences_lineitem,
    )

    ms = dup_part_multisets_lineitem(str(tmp_path / "d"))
    assert ms["duplicate_orders"].iloc[0] == 1  # orders 1 and 2
    assert ms["distinct_multisets"].iloc[0] == 2
    sq = dup_part_sequences_lineitem(str(tmp_path / "d"))
    assert sq["duplicate_orders"].iloc[0] == 0  # different line order
