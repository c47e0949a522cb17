"""Deterministic synthetic transcript tables (FIXTURES.md F1–F3).

Seeded, wall-clock-free generation of the BASELINE.json input shape::

    (conv_id:string, turn_idx:int32, role:string, text:string,
     tool:string, ts:timestamp[us])

``make_target`` applies the closed-form corruption recipe C1–C7 modeled
on the reference demo's arithmetic-predictable mutations
(``/root/reference/demo/setup.sql:50-85``), so every expected count /
ratio / verdict is computable exactly in tests.

Generation is shard-addressable: any global row range [lo, hi) of the
source — and its corrupted target — can be produced independently (row
text lengths come from a counter-based hash, not a sequential RNG), so
``write_fixture_pair`` fans shards out as Ray tasks when a Ray session
is up. On this sandbox's burstable VM, first-touch page faults make any
single-threaded 16M-row build pathologically slow (50× swings measured);
sharded generation also mirrors how a real fixture would be laid down on
a cluster.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

EPOCH_US = 1_700_000_000_000_000  # fixed epoch (us)
ROLES = np.array(["user", "assistant", "tool"])
TOOLS = np.array(["search", "python", "browser"])
WORD_BANK = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet", "kilo", "lima"]

_PARALLEL_MIN_ROWS = 2_000_000  # below this, sharding overhead > win


def _mix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — counter-based per-row randomness (public
    domain constant set), so any row's draw is computable in isolation."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _shard_ids(
    lo: int, hi: int, n_convs: int, turns_per_conv: int, hot_turns: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(row_id, conv_idx, turn_idx) for global rows [lo, hi): uniform
    conversations first, hot conversations appended at the end."""
    base = n_convs * turns_per_conv
    rows = np.arange(lo, hi, dtype=np.int64)
    in_hot = rows >= base
    conv_idx = np.where(
        in_hot,
        n_convs + (rows - base) // max(hot_turns, 1),
        rows // turns_per_conv,
    )
    turn_idx = np.where(
        in_hot, (rows - base) % max(hot_turns, 1), rows % turns_per_conv
    ).astype(np.int32)
    return rows, conv_idx, turn_idx


def _materialize(rows, conv_idx, turn_idx, seed: int):
    """Build the source columns for one shard. Returns a polars frame of
    the string columns plus the numeric ts array (timestamps stay numpy
    so corruption can shift them without a string round-trip)."""
    import polars as pl

    n = len(rows)
    lengths = 3 + ((_mix64(rows.view(np.uint64) + np.uint64(seed)) % 40).astype(
        np.int64
    ) ** 2) // 40  # 3..~42 words, long-tail like the original RNG draw
    reps = np.maximum(lengths, 1)
    max_rep = int(reps.max()) if n else 1
    tail_lut = pl.Series(
        [" ".join([w] * r) for w in WORD_BANK for r in range(max_rep + 1)]
    )
    tail = tail_lut.gather((rows % len(WORD_BANK)) * (max_rep + 1) + reps)
    role = pl.Series(list(ROLES)).gather(turn_idx % 3)
    tool_cycle = pl.Series(list(TOOLS)).gather(rows % 3)
    df = pl.DataFrame(
        {
            "conv_idx": conv_idx,
            "turn_idx": turn_idx,
            "role": role,
            "tail": tail,
            "tool_cycle": tool_cycle,
        }
    ).select(
        conv_id=pl.concat_str(
            [pl.lit("conv-"), pl.col("conv_idx").cast(pl.Utf8).str.zfill(8)]
        ),
        turn_idx=pl.col("turn_idx"),
        role=pl.col("role"),
        text=pl.concat_str(
            [
                pl.lit("msg conv-"),
                pl.col("conv_idx").cast(pl.Utf8).str.zfill(8),
                pl.lit(" "),
                pl.col("turn_idx").cast(pl.Utf8),
                pl.lit(" "),
                pl.col("tail"),
            ]
        ),
        tool=pl.when(pl.col("role") == "tool")
        .then(pl.col("tool_cycle"))
        .otherwise(None),
    )
    # wrap conversation start offsets so timestamps stay inside pandas'
    # ns-representable range at any conversation count
    ts = (
        EPOCH_US
        + (conv_idx % 50_000) * np.int64(3600 * 1_000_000)
        + turn_idx.astype(np.int64) * 7_000_000
    )
    return df, ts


def _pl_to_arrow_str(series) -> pa.ChunkedArray:
    """polars→arrow via Binary: converting a concat_str string-view
    column straight to large_string is pathologically slow (~160 s at
    16M rows); the binary buffers export in ~1 s and the utf8 casts are
    cheap C scans."""
    import polars as pl

    return (
        series.cast(pl.Binary).to_arrow().cast(pa.large_string()).cast(pa.string())
    )


def _to_table(df, ts: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "conv_id": _pl_to_arrow_str(df["conv_id"]),
            "turn_idx": df["turn_idx"].to_arrow().cast(pa.int32()),
            "role": _pl_to_arrow_str(df["role"]),
            "text": _pl_to_arrow_str(df["text"]),
            "tool": _pl_to_arrow_str(df["tool"]),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )


def _corrupt(
    df,
    ts: np.ndarray,
    rows: np.ndarray,
    conv_idx: np.ndarray,
    turn_idx: np.ndarray,
    delete_mod: int = 50,
    dup_mod: int = 400,
    null_tool_mod: int = 25,
    corrupt_text_mod: int = 100,
    ts_shift_bucket_mod: int = 10,
    orphan_mod: int = 1000,
    swap_order_mod: int = 500,
):
    """C1–C7 on one shard, keyed on GLOBAL row id / conversation index so
    any sharding of the same row space yields the same corrupted rows.
    Role tests are numeric (role == ROLES[turn_idx % 3] by construction:
    'user' ⇔ turn%3==0, 'tool' ⇔ turn%3==2)."""
    import polars as pl

    i = rows
    t3 = turn_idx.astype(np.int64) % 3
    # C3: null `tool` where i % null_tool_mod == 0 and role == 'tool'
    m3 = (i % null_tool_mod == 0) & (t3 == 2) if null_tool_mod else np.zeros_like(i, bool)
    # C4: text corruption where i % corrupt_text_mod == 7
    m4 = (i % corrupt_text_mod == 7) if corrupt_text_mod else np.zeros_like(i, bool)
    # C5: ts shift for one conversation hash bucket — drift + agg trip
    m5 = (conv_idx % ts_shift_bucket_mod == 3) if ts_shift_bucket_mod else np.zeros_like(i, bool)
    # C6: orphan conversations where i % orphan_mod == 0
    m6 = (i % orphan_mod == 0) if orphan_mod else np.zeros_like(i, bool)
    # C7: swap turn order (2<->3) for convs with conv_idx % swap_order_mod == 0
    if swap_order_mod:
        m7 = conv_idx % swap_order_mod == 0
        new_turn = np.where(
            m7 & (turn_idx == 2), 3, np.where(m7 & (turn_idx == 3), 2, turn_idx)
        ).astype(np.int32)
    else:
        new_turn = turn_idx
    # C1: delete rows where i % delete_mod == 0 and role != 'user'
    keep = np.ones(len(i), dtype=bool)
    if delete_mod:
        keep &= ~((i % delete_mod == 0) & (t3 != 0))
    # C2: duplicate composite keys where i % dup_mod == 0 (text suffixed)
    dup = ((i % dup_mod == 0) & keep) if dup_mod else np.zeros_like(i, bool)

    tdf = pl.DataFrame(
        {
            "conv_id": df["conv_id"],
            "turn_idx": new_turn,
            "role": df["role"],
            "text": df["text"],
            "tool": df["tool"],
            "_i": i,
            "_m3": m3,
            "_m4": m4,
            "_m6": m6,
        }
    ).with_columns(
        conv_id=pl.when(pl.col("_m6"))
        .then(pl.concat_str([pl.lit("orphan-"), pl.col("_i").cast(pl.Utf8)]))
        .otherwise(pl.col("conv_id")),
        text=pl.when(pl.col("_m4"))
        .then(pl.concat_str([pl.col("text"), pl.lit(" [corrupted]")]))
        .otherwise(pl.col("text")),
        tool=pl.when(pl.col("_m3")).then(None).otherwise(pl.col("tool")),
    )
    ts2 = ts + np.where(m5, np.int64(86_400_000_000), np.int64(0))
    kept = tdf.filter(pl.Series(keep))
    dups = tdf.filter(pl.Series(dup)).with_columns(
        text=pl.concat_str([pl.col("text"), pl.lit(" dup")])
    )
    out = pl.concat([kept, dups]).drop(["_i", "_m3", "_m4", "_m6"])
    ts_out = np.concatenate([ts2[keep], ts2[dup]])
    return out, ts_out


def _dim_for_shard(df, ts: np.ndarray, turn_idx: np.ndarray) -> pa.Table:
    """F3 rows owned by this shard: one row per conversation whose first
    turn lives here (conversation rows are contiguous, so each turn-0 row
    appears in exactly one shard)."""
    import pandas as pd
    import polars as pl

    first_mask = turn_idx == 0
    conv = df["conv_id"].filter(pl.Series(first_mask)).to_pandas()
    h = pd.util.hash_pandas_object(conv, index=False).to_numpy()
    return pa.table(
        {
            "conv_id": pa.array(conv, type=pa.string()),
            "user_id": pa.array((h % 1000).astype(np.int64)),
            "started_ts": pa.array(ts[first_mask], type=pa.timestamp("us")),
            "channel": pa.array(
                np.array(["api", "web", "cli"], dtype=object)[h % 3],
                type=pa.string(),
            ),
        }
    )


def make_source(
    n_convs: int = 1000,
    turns_per_conv: int = 8,
    hot_convs: int = 0,
    hot_turns: int = 8000,
    seed: int = 42,
) -> pa.Table:
    """F1: N conversations × T turns (+ optional hot conversations with
    ``hot_turns`` turns each, to exercise skew salting)."""
    n = n_convs * turns_per_conv + hot_convs * hot_turns
    rows, conv_idx, turn_idx = _shard_ids(0, n, n_convs, turns_per_conv, hot_turns)
    df, ts = _materialize(rows, conv_idx, turn_idx, seed)
    return _to_table(df, ts)


def make_target(source: pa.Table, **corruption) -> pa.Table:
    """F2: corrupted copy with closed-form mutations C1–C7 keyed on the
    integer row id (0 disables a mutation). Works on any source table
    with the transcript schema: global ids are the positional row ids,
    conversation codes the order of first appearance (both identical to
    what the sharded path derives arithmetically)."""
    import pandas as pd
    import polars as pl

    rows = np.arange(source.num_rows, dtype=np.int64)
    conv_codes = pd.factorize(source.column("conv_id").to_pandas())[0].astype(np.int64)
    turn_idx = source.column("turn_idx").to_numpy().astype(np.int32)
    ts = source.column("ts").cast(pa.int64()).to_numpy()
    df = pl.DataFrame(
        {
            "conv_id": pl.from_arrow(source.column("conv_id")),
            "role": pl.from_arrow(source.column("role")),
            "text": pl.from_arrow(source.column("text")),
            "tool": pl.from_arrow(source.column("tool")),
        }
    )
    out, ts_out = _corrupt(df, ts, rows, conv_codes, turn_idx, **corruption)
    return _to_table(out, ts_out)


def make_conversations_dim(source: pa.Table) -> pa.Table:
    """F3: dimension table of exactly the source conversation ids."""
    import polars as pl

    turn_idx = source.column("turn_idx").to_numpy()
    ts = source.column("ts").cast(pa.int64()).to_numpy()
    df = pl.DataFrame({"conv_id": pl.from_arrow(source.column("conv_id"))})
    return _dim_for_shard(df, ts, turn_idx)


def _write_shard(
    out_dir: str,
    k: int,
    lo: int,
    hi: int,
    n_convs: int,
    turns_per_conv: int,
    hot_turns: int,
    seed: int,
    corruption: dict,
) -> int:
    rows, conv_idx, turn_idx = _shard_ids(lo, hi, n_convs, turns_per_conv, hot_turns)
    df, ts = _materialize(rows, conv_idx, turn_idx, seed)
    pq.write_table(
        _to_table(df, ts), os.path.join(out_dir, "source", f"part-{k:04d}.parquet")
    )
    tdf, tts = _corrupt(df, ts, rows, conv_idx, turn_idx, **corruption)
    pq.write_table(
        _to_table(tdf, tts), os.path.join(out_dir, "target", f"part-{k:04d}.parquet")
    )
    dim = _dim_for_shard(df, ts, turn_idx)
    if dim.num_rows or k == 0:
        pq.write_table(dim, os.path.join(out_dir, "dim", f"part-{k:04d}.parquet"))
    return hi - lo


def write_fixture_pair(
    out_dir: str,
    n_convs: int = 1000,
    turns_per_conv: int = 8,
    hot_convs: int = 0,
    hot_turns: int = 8000,
    n_files: int = 4,
    seed: int = 42,
    **corruption,
) -> dict[str, str]:
    """Write source/target/dim parquet (sharded into ``n_files`` files to
    exercise multi-file reads); returns {name: path} dirs. Shards are
    generated independently — in parallel Ray tasks when a Ray session
    is active and the table is large."""
    n = n_convs * turns_per_conv + hot_convs * hot_turns
    for name in ("source", "target", "dim"):
        os.makedirs(os.path.join(out_dir, name), exist_ok=True)
    shards = max(1, min(n_files, n))
    step = (n + shards - 1) // shards
    bounds = [(k, k * step, min((k + 1) * step, n)) for k in range(shards)]
    bounds = [(k, lo, hi) for k, lo, hi in bounds if hi > lo or k == 0]

    use_ray = False
    if n >= _PARALLEL_MIN_ROWS:
        try:
            import ray

            use_ray = ray.is_initialized()
        except ImportError:
            pass
    if use_ray:
        import ray

        task = ray.remote(_write_shard)
        ray.get(
            [
                task.remote(
                    out_dir, k, lo, hi, n_convs, turns_per_conv, hot_turns,
                    seed, corruption,
                )
                for k, lo, hi in bounds
            ]
        )
    else:
        for k, lo, hi in bounds:
            _write_shard(
                out_dir, k, lo, hi, n_convs, turns_per_conv, hot_turns, seed,
                corruption,
            )
    return {name: os.path.join(out_dir, name) for name in ("source", "target", "dim")}
