"""Deterministic synthetic transcript tables (FIXTURES.md F1–F3).

Seeded, wall-clock-free generation (timestamps derive from a fixed
epoch) of the BASELINE.json input shape::

    (conv_id:string, turn_idx:int32, role:string, text:string,
     tool:string, ts:timestamp[us])

``make_target`` applies the closed-form corruption recipe C1–C7 modeled
on the reference demo's arithmetic-predictable mutations
(``/root/reference/demo/setup.sql:50-85``), so every expected count /
ratio / verdict is computable exactly in tests.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

EPOCH_US = 1_700_000_000_000_000  # fixed epoch (us)
ROLES = np.array(["user", "assistant", "tool"])
TOOLS = np.array(["search", "python", "browser"])


def make_source(
    n_convs: int = 1000,
    turns_per_conv: int = 8,
    hot_convs: int = 0,
    hot_turns: int = 8000,
    seed: int = 42,
) -> pa.Table:
    """F1: N conversations × T turns (+ optional hot conversations with
    ``hot_turns`` turns each, to exercise skew salting)."""
    rng = np.random.default_rng(seed)
    conv_sizes = np.full(n_convs, turns_per_conv, dtype=np.int64)
    if hot_convs:
        conv_sizes = np.concatenate(
            [conv_sizes, np.full(hot_convs, hot_turns, dtype=np.int64)]
        )
    conv_ids_unique = np.array(
        [f"conv-{i:08d}" for i in range(len(conv_sizes))], dtype=object
    )
    conv_idx = np.repeat(np.arange(len(conv_sizes)), conv_sizes)
    conv_id = conv_ids_unique[conv_idx]
    turn_idx = np.concatenate([np.arange(s) for s in conv_sizes]).astype(np.int32)
    n = len(turn_idx)
    role = ROLES[turn_idx % 3]
    # deterministic pseudo-text with a long-tail length distribution
    word_bank = np.array(
        ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
         "hotel", "india", "juliet", "kilo", "lima"], dtype=object
    )
    lengths = 3 + (rng.integers(0, 40, n) ** 2) // 40  # 3..~42 words
    row_id = np.arange(n)
    reps = np.clip(lengths, 1, None)
    # vectorized text assembly: the (filler word × repeat count) tail space
    # is tiny, so precompute it and index, instead of joining per row
    max_rep = int(reps.max())
    tails = np.array(
        [
            [" ".join([w] * r) for r in range(max_rep + 1)]
            for w in word_bank
        ],
        dtype=object,
    )
    tail_arr = tails[row_id % len(word_bank), reps]
    prefix = np.char.add(
        np.char.add(
            np.char.add("msg ", conv_id.astype("U")), " "
        ),
        turn_idx.astype("U"),
    ).astype(object)
    text = prefix + " " + tail_arr
    tool = np.where(role == "tool", TOOLS[row_id % 3], None)
    # wrap conversation start offsets so timestamps stay inside pandas'
    # ns-representable range at any conversation count
    conv_offset = ((conv_idx.astype(np.int64) % 50_000) * 3600) * 1_000_000
    ts = EPOCH_US + conv_offset + turn_idx.astype(np.int64) * 7_000_000
    return pa.table(
        {
            "conv_id": pa.array(conv_id, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(role, type=pa.string()),
            "text": pa.array(text, type=pa.string()),
            "tool": pa.array(tool.tolist(), type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )


def make_target(
    source: pa.Table,
    delete_mod: int = 50,
    dup_mod: int = 400,
    null_tool_mod: int = 25,
    corrupt_text_mod: int = 100,
    ts_shift_bucket_mod: int = 10,
    orphan_mod: int = 1000,
    swap_order_mod: int = 500,
) -> pa.Table:
    """F2: corrupted copy with closed-form mutations C1–C7 keyed on the
    integer row id ``i`` (0 disables a mutation)."""
    import pandas as pd

    df = source.to_pandas()
    n = len(df)
    i = np.arange(n)
    conv_codes = pd.factorize(df["conv_id"])[0]

    # C3: null `tool` where i % null_tool_mod == 0 and role == 'tool'
    if null_tool_mod:
        mask = (i % null_tool_mod == 0) & (df["role"] == "tool").to_numpy()
        df.loc[mask, "tool"] = None
    # C4: text corruption where i % corrupt_text_mod == 7
    if corrupt_text_mod:
        mask = i % corrupt_text_mod == 7
        df.loc[mask, "text"] = df.loc[mask, "text"] + " [corrupted]"
    # C5: ts shift for one "region" (conv hash bucket) — drift + agg trip
    if ts_shift_bucket_mod:
        mask = (conv_codes % ts_shift_bucket_mod) == 3
        df.loc[mask, "ts"] = df.loc[mask, "ts"] + pd.Timedelta(days=1)
    # C6: orphan conversations where i % orphan_mod == 0
    if orphan_mod:
        mask = i % orphan_mod == 0
        df.loc[mask, "conv_id"] = [f"orphan-{k}" for k in i[mask]]
    # C7: swap turn order (turn 2<->3) for convs with code % swap_order_mod == 0
    if swap_order_mod:
        mask_conv = (conv_codes % swap_order_mod) == 0
        m2 = mask_conv & (df["turn_idx"] == 2).to_numpy()
        m3 = mask_conv & (df["turn_idx"] == 3).to_numpy()
        df.loc[m2, "turn_idx"] = 3
        df.loc[m3, "turn_idx"] = 2
    # C1: delete rows where i % delete_mod == 0 and role != 'user'
    keep = np.ones(n, dtype=bool)
    if delete_mod:
        keep &= ~((i % delete_mod == 0) & (df["role"] != "user").to_numpy())
    out = df[keep]
    # C2: duplicate composite keys where i % dup_mod == 0 (text suffixed)
    if dup_mod:
        dups = df[(i % dup_mod == 0) & keep].copy()
        dups["text"] = dups["text"] + " dup"
        out = pd.concat([out, dups], ignore_index=True)
    table = pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)
    return table.cast(source.schema)


def make_conversations_dim(source: pa.Table) -> pa.Table:
    """F3: dimension table of exactly the source conversation ids."""
    import pandas as pd

    df = source.to_pandas()
    first = df[df["turn_idx"] == 0][["conv_id", "ts"]].drop_duplicates("conv_id")
    h = pd.util.hash_pandas_object(first["conv_id"], index=False).to_numpy()
    return pa.table(
        {
            "conv_id": pa.array(first["conv_id"], type=pa.string()),
            "user_id": pa.array((h % 1000).astype(np.int64)),
            "started_ts": pa.array(first["ts"], type=pa.timestamp("us")),
            "channel": pa.array(
                np.array(["api", "web", "cli"], dtype=object)[h % 3], type=pa.string()
            ),
        }
    )


def write_fixture_pair(
    out_dir: str,
    n_convs: int = 1000,
    turns_per_conv: int = 8,
    hot_convs: int = 0,
    hot_turns: int = 8000,
    n_files: int = 4,
    **corruption,
) -> dict[str, str]:
    """Write source/target/dim parquet (sharded into ``n_files`` files to
    exercise multi-file reads); returns {name: path} dirs."""
    os.makedirs(out_dir, exist_ok=True)
    src = make_source(n_convs, turns_per_conv, hot_convs, hot_turns)
    tgt = make_target(src, **corruption)
    dim = make_conversations_dim(src)
    paths = {}
    for name, table in (("source", src), ("target", tgt), ("dim", dim)):
        d = os.path.join(out_dir, name)
        os.makedirs(d, exist_ok=True)
        shards = max(1, min(n_files, table.num_rows))
        step = (table.num_rows + shards - 1) // shards
        for k in range(shards):
            chunk = table.slice(k * step, step)
            if chunk.num_rows or k == 0:
                pq.write_table(chunk, os.path.join(d, f"part-{k:04d}.parquet"))
        paths[name] = d
    return paths
