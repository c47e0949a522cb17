"""Role-grammar sequence validation: vocabulary, first role, allowed
transitions and tool pairing per conversation — exact planted-violation
counts, hot-shard stitching invariance (including a transition violation
that exists ONLY across a shard boundary), and the e2e runner wiring on
both the folded (rides the keyed shuffle) and standalone conv paths."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datapact_ray.config import (
    OrderingCheck,
    SequenceGrammarCheck,
    ValidationSuite,
    ValidationTask,
)
from datapact_ray.datagen import write_fixture_pair
from datapact_ray.stages.keyed import KeyedSpec, run_keyed_pass

TRANSITIONS = [("user", "assistant"), ("assistant", "user"),
               ("assistant", "tool"), ("tool", "assistant")]
VOCAB = ["user", "assistant", "tool"]


def _write(path: str, rows: list[tuple]) -> str:
    """rows: (conv_id, turn_idx, role, tool)"""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "tool": pa.array([r[3] for r in rows], pa.string()),
            "text": pa.array(["x"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, path)
    return path


def _grammar_spec(**kw) -> KeyedSpec:
    base = dict(
        key_columns=["conv_id", "turn_idx"],
        group_column="conv_id",
        index_column="turn_idx",
        ts_column=None,
        grammar_role_column="role",
        grammar_roles=VOCAB,
        grammar_enforce_vocab=True,
        grammar_first_role="user",
        grammar_transitions=TRANSITIONS,
        grammar_tool_column="tool",
        grammar_tool_roles=["tool"],
        num_buckets=4,
    )
    base.update(kw)
    return KeyedSpec(**base)


def test_planted_violation_counts(tmp_path):
    rows = [
        # conv a: clean (u->a->t->a, tool non-null exactly on the tool turn)
        ("a", 0, "user", None), ("a", 1, "assistant", None),
        ("a", 2, "tool", "search"), ("a", 3, "assistant", None),
        # conv b: bad first role only (a->u is an allowed transition)
        ("b", 0, "assistant", None), ("b", 1, "user", None),
        # conv c: disallowed transition u->t (tool turn itself is paired)
        ("c", 0, "user", None), ("c", 1, "tool", "calc"),
        ("c", 2, "assistant", None),
        # conv d: unknown role; both adjacent pairs touch it -> also a
        # bad transition, but the conversation is flagged ONCE
        ("d", 0, "user", None), ("d", 1, "system", None),
        ("d", 2, "assistant", None),
        # conv e: tool pairing broken both ways (non-null on assistant,
        # null on the tool turn)
        ("e", 0, "user", None), ("e", 1, "assistant", "oops"),
        ("e", 2, "tool", None),
    ]
    f = _write(str(tmp_path / "src" / "part-0.parquet"), rows)
    m = run_keyed_pass(
        None, None, _grammar_spec(), "g",
        source_files=[f], columns=["conv_id", "turn_idx", "role", "tool"],
    )
    assert m.groups_checked == [5, 0]
    assert m.grammar_groups_flagged == [4, 0]
    assert m.grammar_unknown_rows == [1, 0]
    assert m.grammar_tool_mismatch_rows == [2, 0]
    assert m.grammar_bad_transition_groups == [2, 0]  # c and d
    assert m.grammar_bad_first_groups == [1, 0]


def test_clean_input_passes(tmp_path):
    rows = [
        ("a", 0, "user", None), ("a", 1, "assistant", None),
        ("a", 2, "tool", "t1"), ("a", 3, "assistant", None),
        ("b", 0, "user", None), ("b", 1, "assistant", None),
    ]
    f = _write(str(tmp_path / "src" / "part-0.parquet"), rows)
    m = run_keyed_pass(
        None, None, _grammar_spec(), "g",
        source_files=[f], columns=["conv_id", "turn_idx", "role", "tool"],
    )
    assert m.groups_checked == [2, 0]
    assert m.grammar_groups_flagged == [0, 0]
    assert m.grammar_unknown_rows == [0, 0]
    assert m.grammar_tool_mismatch_rows == [0, 0]


def test_hot_shard_boundary_transition(tmp_path):
    """The only violation is the a->a pair straddling the shard boundary
    (idx 3 -> idx 4 with span 4): within-shard sequences are clean, so a
    correct verdict REQUIRES the boundary stitch. Salted and unsalted
    runs must agree exactly."""
    trans = [("user", "assistant"), ("assistant", "user")]
    rows = [
        ("hot", 0, "user", None), ("hot", 1, "assistant", None),
        ("hot", 2, "user", None), ("hot", 3, "assistant", None),
        ("hot", 4, "assistant", None), ("hot", 5, "user", None),
        ("hot", 6, "assistant", None), ("hot", 7, "user", None),
    ]
    f = _write(str(tmp_path / "src" / "part-0.parquet"), rows)

    def run(hot_keys, span=4):
        spec = _grammar_spec(
            grammar_transitions=trans,
            grammar_tool_column=None,
            grammar_tool_roles=[],
            hot_keys=hot_keys,
            hot_shard_span=span,
        )
        return run_keyed_pass(
            None, None, spec, "g",
            source_files=[f], columns=["conv_id", "turn_idx", "role", "tool"],
        )

    unsalted = run({})
    salted = run({"hot": 8})
    for m in (unsalted, salted):
        assert m.groups_checked == [1, 0]
        assert m.grammar_bad_transition_groups == [1, 0]
        assert m.grammar_groups_flagged == [1, 0]
        assert m.grammar_bad_first_groups == [0, 0]


def test_hot_sharding_invariance(tmp_path):
    """A clean hot conversation stays clean under sharding; a planted
    bad first role is attributed to the shard holding index 0."""
    rows = [("h", i, ["assistant", "user"][i % 2], None) for i in range(16)]
    f = _write(str(tmp_path / "src" / "part-0.parquet"), rows)

    def run(hot_keys):
        spec = _grammar_spec(
            grammar_tool_column=None, grammar_tool_roles=[],
            hot_keys=hot_keys, hot_shard_span=4,
        )
        return run_keyed_pass(
            None, None, spec, "g",
            source_files=[f], columns=["conv_id", "turn_idx", "role", "tool"],
        )

    unsalted, salted = run({}), run({"h": 16})
    for m in (unsalted, salted):
        assert m.grammar_bad_first_groups == [1, 0]  # starts with assistant
        assert m.grammar_bad_transition_groups == [0, 0]  # a<->u allowed
        assert m.grammar_groups_flagged == [1, 0]


GRAMMAR = SequenceGrammarCheck(
    role_column="role",
    allowed_roles=["user", "assistant", "tool"],
    first_role="user",
    allowed_transitions=[("user", "assistant"), ("assistant", "tool"),
                         ("tool", "user")],
    tool_column="tool",
    tool_roles=["tool"],
)


@pytest.fixture(scope="module")
def fixture_pair(tmp_path_factory):
    out = tmp_path_factory.mktemp("gram_fix")
    return write_fixture_pair(str(out), n_convs=300, turns_per_conv=8)


def _run_task(task, results_dir):
    from datapact_ray.runner import RunConfig, run_suite

    s = run_suite(
        ValidationSuite(validations=[task]),
        RunConfig(results_dir=str(results_dir), run_id=1),
    )
    return s.results[0]


def test_e2e_folded_into_keyed(fixture_pair, tmp_path):
    """Grammar rides the keyed shuffle when conv/turn are the PK; the
    corrupted target (deleted non-user rows, nulled tools) FAILs, the
    source side stays clean."""
    task = ValidationTask(
        task_key="t",
        source_path=fixture_pair["source"],
        target_path=fixture_pair["target"],
        primary_keys=["conv_id", "turn_idx"],
        pk_row_hash_check=True,
        ordering=OrderingCheck(),
        sequence_grammar=GRAMMAR,
    )
    res = _run_task(task, tmp_path / "out")
    v = res.payload["sequence_grammar_validation_conv_id"]
    assert v["status"] == "FAIL"
    assert int(v["groups_flagged"].replace(",", "")) > 0
    assert int(v["tool_pairing_violation_rows"].replace(",", "")) > 0


def test_e2e_standalone_conv_pass(fixture_pair, tmp_path):
    """Grammar-only task (no PK checks): runs on the standalone conv
    exchange; self-pair must PASS."""
    task = ValidationTask(
        task_key="t",
        source_path=fixture_pair["source"],
        target_path=fixture_pair["source"],
        sequence_grammar=GRAMMAR,
    )
    res = _run_task(task, tmp_path / "out")
    v = res.payload["sequence_grammar_validation_conv_id"]
    assert v["status"] == "PASS"
    assert int(v["groups_checked"].replace(",", "")) > 0
    assert res.status == "SUCCESS"


def test_config_validation():
    with pytest.raises(ValueError):
        SequenceGrammarCheck()  # no rule selected
    with pytest.raises(ValueError):
        SequenceGrammarCheck(
            allowed_roles=["user"], first_role="ghost"
        )  # first_role outside the closed vocabulary
    g = SequenceGrammarCheck(first_role="user",
                             allowed_transitions=[("user", "assistant")])
    assert g.vocabulary == ["user", "assistant"]


def test_bucket_count_invariance(tmp_path):
    """Grammar verdicts are invariant to the shuffle fan-out (a
    conversation lands whole in one bucket at any bucket count)."""
    rows = [
        ("a", 0, "user", None), ("a", 1, "assistant", None),
        ("a", 2, "tool", "search"), ("a", 3, "assistant", None),
        ("b", 0, "assistant", None), ("b", 1, "user", None),
        ("c", 0, "user", None), ("c", 1, "tool", "calc"),
        ("c", 2, "assistant", None),
    ]
    f = _write(str(tmp_path / "src" / "part-0.parquet"), rows)
    outs = []
    for nb in (1, 8, 32):  # nb=1 exercises Ray's num_returns=1 unwrap
        m = run_keyed_pass(
            None, None, _grammar_spec(num_buckets=nb), "g",
            source_files=[f], columns=["conv_id", "turn_idx", "role", "tool"],
        )
        outs.append(
            (
                m.groups_checked,
                m.grammar_groups_flagged,
                m.grammar_bad_transition_groups,
                m.grammar_bad_first_groups,
                m.grammar_tool_mismatch_rows,
            )
        )
    assert outs[0] == outs[1] == outs[2]
    assert outs[0][1] == [2, 0]  # b (first role) and c (transition)
