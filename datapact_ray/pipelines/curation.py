"""Training-data curation / ordering operators: deterministic global
shuffle, hash-based train/val/test split, chained filter funnel, and
GPT-style block packing.

These are engine extensions mandated by the build brief (large-scale
training-data pipeline operations beyond the reference's validation set
— the reference orchestrates SQL checks only, cf.
``/root/reference/datapact/sql_generator.py``); they reuse this repo's
two scale primitives:

* ``shuffle.map_partials`` — one wave of raw Ray tasks over
  file/row-group scan units, bounded partial frames merged on the
  driver (no shuffle);
* the fused explicit bucket exchange
  (``dedup._fused_grouped_frames``) — fixed-width rows only, text never
  leaves the scan task.

Cross-engine determinism: wherever an operator needs a pseudo-random
but reproducible per-row key (shuffle order, split assignment) it uses
``md5`` of the COMPACT id string — the one hash this engine and SQL
produce identically (same trade-off as
``text.stratified_sample_documents``: hashing cost ∝ rows, not bytes;
at 10^12-row scale swap for a vectorized SipHash and keep the md5 path
as the sampled audit).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa

from ._util import round_duck

__all__ = [
    "split_assign_documents",
    "shuffle_order_documents",
    "curation_funnel_documents",
    "block_packing_documents",
]


def _md5_hex(ids: pd.Series) -> list[str]:
    """md5 hex digest of each COMPACT integer-id string (cross-engine:
    equals DuckDB ``md5(CAST(doc_id AS VARCHAR))``)."""
    return [hashlib.md5(str(int(d)).encode()).hexdigest() for d in ids]


def split_assign_documents(sf_dir: str) -> pd.DataFrame:
    """Hash-based train/val/test split (the standard leakage-free
    protocol: membership is a pure function of the document id, stable
    under re-runs, re-partitioning and incremental ingestion — no RNG
    state to coordinate across workers).

    Assignment: first hex nibble of md5(doc_id) — '0'..'b' → train
    (12/16), 'c'..'e' → val (3/16), 'f' → test (1/16). One raw-task
    scan wave; each task reduces its batch to ≤ 3·n_langs partial rows,
    so nothing data-sized reaches the driver or any exchange.
    """
    from ..shuffle import map_partials

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["doc_id", "lang"])
        if not len(df):
            return pd.DataFrame(
                {"split": [], "lang": [], "n_docs": [], "sum_chars": []}
            )
        nib = np.array([h[0] for h in _md5_hex(df["doc_id"])])
        df = df.assign(
            split=np.where(nib < "c", "train", np.where(nib < "f", "val", "test"))
        )
        g = df.groupby(["split", "lang"], as_index=False).agg(
            n_docs=("doc_id", "size"), sum_chars=("n_chars", "sum")
        )
        return g

    out = (
        map_partials(
            f"{sf_dir}/documents.parquet",
            ["doc_id", "lang", "n_chars"],
            None,
            partial,
        )
        .groupby(["split", "lang"], as_index=False)
        .agg(n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum"))
        .sort_values(["split", "lang"])
        .reset_index(drop=True)
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["sum_chars"] = out["sum_chars"].astype("int64")
    return out


def shuffle_order_documents(sf_dir: str, prefix_nibbles: int = 2) -> pd.DataFrame:
    """Deterministic global shuffle for training-data ordering: every
    document gets a total-order position ``pos`` = its 1-based rank
    under ``ORDER BY md5(doc_id), doc_id`` — a reproducible permutation
    with no RNG and no global sort barrier.

    Distributed as a RANGE partition on the md5 prefix: bucket =
    first ``prefix_nibbles`` hex nibbles (an ordered key range, so
    global rank = exclusive prefix-sum of bucket counts + local rank).
    ONE exchange pass suffices because the per-shard permutation
    checksum Σ doc_id·pos is linear in the bucket offset:
    Σ doc·(off+lr) = Σ doc·lr + off·Σ doc — each bucket reduce emits
    (n, Σ doc, Σ doc·local_rank) and the driver resolves offsets and
    checksums from those three integers per bucket. Only
    (md5, doc_id) pairs enter the exchange (fixed width; text never
    moves). At production scale ``prefix_nibbles`` grows with data so
    a bucket stays ~object-store-block sized.

    Output: one row per leading hex nibble ("shard"): document count
    and the position checksum — verifying the checksum verifies every
    rank in the permutation.
    """
    from .dedup import _fused_grouped_frames

    nb = 16**prefix_nibbles

    def project(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["doc_id"])
        if not len(df):
            return pd.DataFrame({"h": [], "doc_id": [], "__bucket": []})
        h = _md5_hex(df["doc_id"])
        return pd.DataFrame(
            {
                "h": h,
                "doc_id": df["doc_id"].astype("int64").to_numpy(),
                "__bucket": np.array(
                    [int(x[:prefix_nibbles], 16) for x in h], dtype=np.int32
                ),
            }
        )

    def reduce_bucket(frame: pd.DataFrame) -> pd.DataFrame:
        if len(frame) == 0:
            return pd.DataFrame(
                {"bucket": [], "n": [], "sum_doc": [], "sum_doc_lrank": []}
            )
        frame = frame.sort_values(["h", "doc_id"], kind="stable")
        doc = frame["doc_id"].to_numpy()
        lr = np.arange(1, len(doc) + 1, dtype=np.int64)
        return pd.DataFrame(
            {
                "bucket": [int(frame["__bucket"].iloc[0])],
                "n": [len(doc)],
                "sum_doc": [int(doc.sum())],
                "sum_doc_lrank": [int((doc * lr).sum())],
            }
        )

    parts = _fused_grouped_frames(
        [(f"{sf_dir}/documents.parquet", ["doc_id"], None, project)],
        nb,
        reduce_bucket,
    )
    shards: dict[int, list[int]] = {}
    offset = 0
    shard_div = nb // 16
    if len(parts):
        for _, row in parts.sort_values("bucket").iterrows():
            # python ints: Σ doc·pos can exceed int64 intermediate math
            # at extreme scale; the driver sees ≤ nb tiny rows
            checksum = int(row["sum_doc_lrank"]) + offset * int(row["sum_doc"])
            sh = int(row["bucket"]) // shard_div
            acc = shards.setdefault(sh, [0, 0])
            acc[0] += int(row["n"])
            acc[1] += checksum
            offset += int(row["n"])
    return pd.DataFrame(
        {
            "shard": [format(s, "x") for s in sorted(shards)],
            "n_docs": pd.Series(
                [shards[s][0] for s in sorted(shards)], dtype="int64"
            ),
            "pos_checksum": pd.Series(
                [shards[s][1] for s in sorted(shards)], dtype="int64"
            ),
        }
    )


def curation_funnel_documents(sf_dir: str) -> pd.DataFrame:
    """Chained curation funnel — the composition a corpus build actually
    runs, with per-stage survivor counts (the "data card" numbers):

    1. non-null text;
    2. + length gate (100 ≤ n_chars ≤ 20000);
    3. + minimum content (≥ 20 whitespace tokens);
    4. + exact dedup (distinct texts among stage-3 survivors — the
       keep-first-copy cardinality).

    Single scan: each task computes all gate flags vectorized and ships
    ONLY (content-hash u64, two int8 flags) into the hash-bucket
    exchange; same text ⇒ same bucket, so per-bucket ``nunique`` sums
    are the exact global distinct count (same argument and hash as
    ``dedup.dedup_exact_documents``). Stage counts ride the same rows —
    no second pass, no text in the exchange.
    """
    from ..sketches import hash_columns_u64
    from .dedup import _dedup_buckets, _fused_grouped_frames

    nb = _dedup_buckets()

    def project(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[df["text"].notna()]
        if not len(df):
            return pd.DataFrame({"h": [], "f2": [], "f3": [], "__bucket": []})
        h = hash_columns_u64(df, ["text"])
        nc = pd.to_numeric(df["n_chars"], errors="coerce")
        f2 = nc.between(100, 20000).to_numpy()  # NaN compares False
        toks = df["text"].astype(str).str.count(" ").to_numpy() + 1
        f3 = f2 & (toks >= 20)
        return pd.DataFrame(
            {
                "h": h,
                "f2": f2.astype(np.int8),
                "f3": f3.astype(np.int8),
                "__bucket": (h % np.uint64(nb)).astype(np.int32),
            }
        )

    def reduce_bucket(frame: pd.DataFrame) -> pd.DataFrame:
        survivors = frame.loc[frame["f3"] == 1, "h"]
        return pd.DataFrame(
            {
                "n1": [len(frame)],
                "n2": [int(frame["f2"].sum())],
                "n3": [int(frame["f3"].sum())],
                "d4": [int(survivors.nunique())],
            }
        )

    parts = _fused_grouped_frames(
        [(f"{sf_dir}/documents.parquet", ["text", "n_chars"], None, project)],
        nb,
        reduce_bucket,
    )
    n1 = int(parts["n1"].sum()) if len(parts) else 0
    n2 = int(parts["n2"].sum()) if len(parts) else 0
    n3 = int(parts["n3"].sum()) if len(parts) else 0
    d4 = int(parts["d4"].sum()) if len(parts) else 0
    return pd.DataFrame(
        {
            "stage": pd.Series([1, 2, 3, 4], dtype="int64"),
            "stage_name": [
                "non_null_text",
                "length_100_20000",
                "min_20_tokens",
                "exact_dedup",
            ],
            "n_docs": pd.Series([n1, n2, n3, d4], dtype="int64"),
        }
    )


def block_packing_documents(
    sf_dir: str, block_tokens: int = 512, bucket_docs: int = 256
) -> pd.DataFrame:
    """GPT-style block packing audit: concatenate each language's token
    stream in doc_id order and chop it into fixed ``block_tokens``
    blocks; report per language the total tokens, the number of blocks,
    and how many documents straddle a block boundary (the
    attention-mask / document-breakage metric packing decisions trade
    on). ``block_tokens`` is a power of two so the block-count CEIL is
    bit-exact in both engines' float division.

    Distributed prefix-scan, same idiom as
    ``windows.cumsum_crossing_events``: pass 1 reduces each scan task
    to per-(lang, doc-range-bucket) token sums (bucket = doc_id //
    ``bucket_docs`` — an ORDERED key range, so the driver's exclusive
    prefix-sum over buckets yields every bucket's global start offset);
    pass 2 re-reads through the fused range exchange, and each bucket
    reduce computes its local cumulative sums plus the driver-broadcast
    offset to classify boundary-straddling docs. Only (doc_id, lang,
    token-count) triples enter the exchange. ``bucket_docs`` scales
    with corpus size in production (a bucket ≈ one reduce task's
    working set).
    """
    from ..shuffle import map_partials
    from .dedup import _fused_grouped_frames

    path = f"{sf_dir}/documents.parquet"
    cols = ["doc_id", "lang", "text"]

    def _prep(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["doc_id", "lang", "text"])
        if not len(df):
            return df.assign(tok=pd.Series([], dtype="int64"))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64").to_numpy(),
                "lang": df["lang"].astype(str).to_numpy(),
                "tok": df["text"].astype(str).str.count(" ").to_numpy() + 1,
            }
        )

    def partial_sums(batch: pa.Table) -> pd.DataFrame:
        df = _prep(batch)
        if not len(df):
            return pd.DataFrame({"lang": [], "bucket": [], "sum_tok": [], "n": []})
        df["bucket"] = df["doc_id"] // bucket_docs
        return df.groupby(["lang", "bucket"], as_index=False).agg(
            sum_tok=("tok", "sum"), n=("tok", "size")
        )

    sums = (
        map_partials(path, cols, None, partial_sums)
        .groupby(["lang", "bucket"], as_index=False)
        .agg(sum_tok=("sum_tok", "sum"), n=("n", "sum"))
    )
    if not len(sums):
        return pd.DataFrame(
            {
                "lang": [],
                "n_docs": pd.Series([], dtype="int64"),
                "total_tokens": pd.Series([], dtype="int64"),
                "n_blocks": pd.Series([], dtype="int64"),
                "n_boundary_docs": pd.Series([], dtype="int64"),
            }
        )

    # driver-side exclusive prefix scan per lang, buckets ascending —
    # computed ONCE here and captured in the reduce closure (worker-side
    # recomputation of exchange geometry is the bug class the fused
    # rewrite fixed)
    offsets: dict[tuple[str, int], int] = {}
    totals: dict[str, tuple[int, int]] = {}
    for lang, g in sums.groupby("lang"):
        g = g.sort_values("bucket")
        run = 0
        for _, row in g.iterrows():
            offsets[(str(lang), int(row["bucket"]))] = run
            run += int(row["sum_tok"])
        totals[str(lang)] = (int(g["n"].sum()), run)
    num_buckets = int(sums["bucket"].max()) + 1

    def project(batch: pa.Table) -> pd.DataFrame:
        df = _prep(batch)
        if not len(df):
            return pd.DataFrame(
                {"doc_id": [], "lang": [], "tok": [], "__bucket": []}
            )
        df["__bucket"] = (df["doc_id"] // bucket_docs).astype(np.int32)
        return df

    T = block_tokens

    def reduce_bucket(frame: pd.DataFrame, _off=offsets) -> pd.DataFrame:
        b = int(frame["__bucket"].iloc[0])
        out = []
        for lang, g in frame.groupby("lang"):
            g = g.sort_values("doc_id")
            tok = g["tok"].to_numpy(dtype=np.int64)
            start = _off[(str(lang), b)] + np.concatenate(
                ([0], np.cumsum(tok)[:-1])
            )
            cross = (start // T) != ((start + tok - 1) // T)
            out.append((str(lang), int(cross.sum())))
        return pd.DataFrame(out, columns=["lang", "n_cross"])

    cross = (
        _fused_grouped_frames([(path, cols, None, project)], num_buckets, reduce_bucket)
        .groupby("lang")["n_cross"]
        .sum()
    )
    rows = []
    for lang in sorted(totals):
        n, tot = totals[lang]
        rows.append(
            (lang, n, tot, (tot + T - 1) // T, int(cross.get(lang, 0)))
        )
    return pd.DataFrame(
        rows,
        columns=["lang", "n_docs", "total_tokens", "n_blocks", "n_boundary_docs"],
    ).astype(
        {
            "n_docs": "int64",
            "total_tokens": "int64",
            "n_blocks": "int64",
            "n_boundary_docs": "int64",
        }
    )


def mixture_weights_documents(
    sf_dir: str, token_budget: int = 50_000
) -> pd.DataFrame:
    """Data-mixture budgeting: given per-source mixture weights and a
    total token budget, derive each source's sampling rate and expected
    token contribution — the allocation step every LLM pretraining mix
    runs (e.g. upweighting curated sources) before sampling shards.

    One scan wave reduces each task to (source, n_docs, tokens)
    partials; the driver does the (sources-sized) allocation. Weights:
    2x for the boosted sources ('src0'..'src2'), 1x otherwise,
    normalized over the sources PRESENT — and every float (normalized
    weight, target, rate, expected tokens) is one fixed expression tree
    over exact integers, so DuckDB reproduces it bit-for-bit at the
    pins."""
    from ..shuffle import map_partials
    from ._util import round_duck

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["source", "text"])
        if not len(df):
            return pd.DataFrame(
                {
                    "source": pd.Series([], dtype="object"),
                    "n_docs": pd.Series([], dtype="int64"),
                    "tokens": pd.Series([], dtype="int64"),
                }
            )
        txt = df["text"].astype(str)
        toks = (txt.str.count(" ") + 1).to_numpy(dtype=np.int64)
        out = (
            pd.DataFrame({"source": df["source"], "t": toks})
            .groupby("source", sort=False)
            .agg(n_docs=("t", "size"), tokens=("t", "sum"))
            .reset_index()
        )
        return out.astype({"n_docs": "int64", "tokens": "int64"})

    parts = map_partials(
        f"{sf_dir}/documents.parquet", ["source", "text"], None, partial
    )
    if len(parts) == 0:
        return pd.DataFrame(
            {
                "source": pd.Series([], dtype="object"),
                "n_docs": pd.Series([], dtype="int64"),
                "tokens": pd.Series([], dtype="int64"),
                "weight": pd.Series([], dtype="float64"),
                "sampling_rate": pd.Series([], dtype="float64"),
                "expected_tokens": pd.Series([], dtype="float64"),
            }
        )
    g = parts.groupby("source", as_index=False).agg(
        n_docs=("n_docs", "sum"), tokens=("tokens", "sum")
    )
    g["n_docs"] = g["n_docs"].astype("int64")
    g["tokens"] = g["tokens"].astype("int64")
    raw_w = np.where(g["source"].isin(["src0", "src1", "src2"]), 2.0, 1.0)
    total_w = float(raw_w.sum())
    rows = []
    for src, nd, tk, w in zip(g["source"], g["n_docs"], g["tokens"], raw_w):
        norm = w / total_w  # one division over exact doubles
        target = token_budget * norm
        rate = target / tk if target < tk else 1.0
        rows.append(
            (
                src,
                int(nd),
                int(tk),
                float(round_duck(norm, 6)),
                float(round_duck(rate, 6)),
                float(round_duck(rate * tk, 2)),
            )
        )
    out = pd.DataFrame(
        rows,
        columns=[
            "source",
            "n_docs",
            "tokens",
            "weight",
            "sampling_rate",
            "expected_tokens",
        ],
    )
    return out.sort_values("source").reset_index(drop=True)


def length_bucket_census_documents(sf_dir: str) -> pd.DataFrame:
    """Power-of-two token-length histogram — the sequence-length census
    batch-packing and bucketed-batching decisions are planned from
    (how much of the corpus is short-tail vs long-tail, and where the
    padding waste would land for each max-length choice).

    Bucket = ⌊log₂(tokens)⌋, computed EXACTLY on both engines: the
    engine reads the exponent from ``np.frexp`` (no float log whose
    rounding could misclassify a power-of-two boundary), the oracle
    uses a generated integer CASE ladder over the same boundaries.
    Token counts use the whitespace-segment convention shared with
    ``mixture_weights_documents`` (LENGTH − LENGTH(REPLACE) + 1, ≥ 1
    even for empty text, so log₂ is always defined).

    Shape: one scan; each task folds to ≤ ladder-width (bucket, docs,
    tokens) partials. Nothing shuffles; the driver merge is
    ladder-sized."""
    from ..shuffle import map_partials

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["text"])
        if not len(df):
            return pd.DataFrame({"bucket": [], "n_docs": [], "tokens": []})
        t = (
            df["text"].astype(str).str.count(" ").to_numpy().astype(np.int64)
            + 1
        )
        # exact floor(log2): frexp returns the IEEE exponent, so
        # t = 2^k lands in bucket k, never k-1/k+1 via log rounding
        bucket = (np.frexp(t.astype(np.float64))[1] - 1).astype(np.int64)
        g = pd.DataFrame({"bucket": bucket, "t": t}).groupby(
            "bucket", sort=False
        )
        out = g.agg(n_docs=("t", "size"), tokens=("t", "sum")).reset_index()
        return out

    parts = map_partials(
        f"{sf_dir}/documents.parquet", ["text"], None, partial
    )
    if not len(parts):
        return pd.DataFrame(
            {
                "bucket": pd.Series([], dtype="int64"),
                "n_docs": pd.Series([], dtype="int64"),
                "tokens": pd.Series([], dtype="int64"),
            }
        )
    g = (
        parts.groupby("bucket", sort=False)
        .agg(n_docs=("n_docs", "sum"), tokens=("tokens", "sum"))
        .reset_index()
    )
    g = g.astype({"bucket": "int64", "n_docs": "int64", "tokens": "int64"})
    return g.sort_values("bucket").reset_index(drop=True)


def _length_bucket_sql(max_bucket: int = 40) -> str:
    ladder = "\n                ".join(
        f"WHEN t < {1 << (b + 1)} THEN {b}" for b in range(max_bucket)
    )
    return f"""
        WITH d AS (
            SELECT LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS t
            FROM documents WHERE text IS NOT NULL
        ), b AS (
            SELECT CASE
                {ladder}
                ELSE {max_bucket} END AS bucket, t
            FROM d
        )
        SELECT CAST(bucket AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(t) AS BIGINT) AS tokens
        FROM b GROUP BY 1 ORDER BY 1
    """


def pack_efficiency_documents(
    sf_dir: str, max_lens: tuple = (8, 32, 128, 512)
) -> pd.DataFrame:
    """Sequence-length selection audit: for each candidate ``max_len``,
    how many tokens survive (kept), how many pad slots a
    one-document-per-sequence layout wastes, and how many tokens
    truncation destroys — the three numbers that decide a training
    run's context-length/packing configuration before any GPU time is
    spent. Complements ``length_bucket_census_documents`` (the
    distribution) with the decision table (the costs per choice).

    Token counts use the shared whitespace-segment convention
    (LENGTH − LENGTH(REPLACE) + 1 on non-null text). All cells are
    exact integers: kept = min(t, L), pad = max(L − t, 0),
    trunc = max(t − L, 0), summed per candidate. One scan; each task
    folds to ≤ |max_lens| fixed-width rows."""
    from ..shuffle import map_partials

    lens = tuple(int(x) for x in max_lens)

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["text"])
        if not len(df):
            return pd.DataFrame(
                {"max_len": [], "n_docs": [], "n_truncated": [],
                 "kept_tokens": [], "pad_tokens": [], "trunc_tokens": []}
            )
        t = (
            df["text"].astype(str).str.count(" ").to_numpy().astype(np.int64)
            + 1
        )
        rows = []
        for L in lens:
            kept = np.minimum(t, L)
            rows.append(
                (
                    L,
                    len(t),
                    int((t > L).sum()),
                    int(kept.sum()),
                    int(np.maximum(L - t, 0).sum()),
                    int((t - kept).sum()),
                )
            )
        return pd.DataFrame(
            rows,
            columns=["max_len", "n_docs", "n_truncated", "kept_tokens",
                     "pad_tokens", "trunc_tokens"],
        )

    parts = map_partials(
        f"{sf_dir}/documents.parquet", ["text"], None, partial
    )
    cols = ["n_docs", "n_truncated", "kept_tokens", "pad_tokens",
            "trunc_tokens"]
    if not len(parts):
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ["max_len"] + cols}
        )
    out = parts.groupby("max_len", as_index=False)[cols].sum()
    for c in ["max_len"] + cols:
        out[c] = out[c].astype("int64")
    return out.sort_values("max_len").reset_index(drop=True)


def _pack_efficiency_sql(max_lens: tuple = (8, 32, 128, 512)) -> str:
    legs = "\n            UNION ALL\n".join(
        f"""
            SELECT CAST({L} AS BIGINT) AS max_len,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN t > {L} THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_truncated,
                   CAST(SUM(LEAST(t, {L})) AS BIGINT) AS kept_tokens,
                   CAST(SUM(GREATEST({L} - t, 0)) AS BIGINT) AS pad_tokens,
                   CAST(SUM(t - LEAST(t, {L})) AS BIGINT) AS trunc_tokens
            FROM d"""
        for L in max_lens
    )
    return f"""
        WITH d AS (
            SELECT LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS t
            FROM documents WHERE text IS NOT NULL
        )
        {legs}
        ORDER BY max_len
    """


def split_bias_chisq_documents(sf_dir: str) -> pd.DataFrame:
    """Split-assignment bias audit: chi-square independence of the
    md5-hash train/val/test split against the source column — the check
    that the "random" splitter did not interact with data provenance
    (a biased split silently trains on one crawl and evaluates on
    another). Uses the SAME nibble assignment as
    ``split_assign_documents`` and the same zero-cell-safe identity
    χ² = Σ o²·t/(r·c) − t as the categorical-drift test, every factor
    an exact integer so both engines build identical doubles.

    One scan to ≤ 3·|sources| integer cells; the contingency algebra is
    driver-side Python ints."""
    import math as _math

    from ..shuffle import map_partials
    from ._util import round_duck

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["doc_id", "source"])
        if not len(df):
            return pd.DataFrame({"split": [], "source": [], "n": []})
        nib = np.array([h[0] for h in _md5_hex(df["doc_id"])])
        df = df.assign(
            split=np.where(nib < "c", "train", np.where(nib < "f", "val", "test"))
        )
        return df.groupby(["split", "source"], as_index=False).size().rename(
            columns={"size": "n"}
        )

    cells = map_partials(
        f"{sf_dir}/documents.parquet", ["doc_id", "source"], None, partial
    )
    if not len(cells):
        return pd.DataFrame(
            {
                "n_rows": pd.Series([], dtype="int64"),
                "n_cells": pd.Series([], dtype="int64"),
                "chi2": pd.Series([], dtype="float64"),
            }
        )
    cells = cells.groupby(["split", "source"], as_index=False)["n"].sum()
    t = int(cells["n"].sum())
    r = cells.groupby("split")["n"].sum()
    c = cells.groupby("source")["n"].sum()
    terms = [
        (int(row.n) * int(row.n) * t * 1.0)
        / (int(r[row.split]) * int(c[row.source]))
        for row in cells.itertuples()
    ]
    chi2 = _math.fsum(terms) - t
    return pd.DataFrame(
        {
            "n_rows": pd.Series([t], dtype="int64"),
            "n_cells": pd.Series([len(cells)], dtype="int64"),
            "chi2": [float(round_duck(chi2, 4))],
        }
    )


_SPLIT_BIAS_SQL = """
    WITH s AS (
        SELECT source,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
                        THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'f'
                        THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
        WHERE doc_id IS NOT NULL AND source IS NOT NULL
    ),
    c AS (SELECT split, source, COUNT(*) AS n FROM s GROUP BY 1, 2),
    rt AS (SELECT split, SUM(n) AS r FROM c GROUP BY split),
    ct AS (SELECT source, SUM(n) AS cl FROM c GROUP BY source),
    tot AS (SELECT SUM(n) AS t FROM c)
    SELECT CAST(tot.t AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           ROUND(fsum(c.n * c.n * tot.t * 1.0 / (rt.r * ct.cl))
                 - tot.t, 4) AS chi2
    FROM c JOIN rt USING (split) JOIN ct USING (source), tot
    GROUP BY tot.t
"""


def mixture_window_audit_documents(
    sf_dir: str, window: int = 100, k: int = 10
) -> pd.DataFrame:
    """Interleaving audit — did the training-order shuffle actually MIX
    the sources? Partition the corpus into consecutive ``window``-doc
    blocks of the serving order (``doc_id // window``) and score each
    block by its worst per-source deviation from the GLOBAL mixture
    (absent sources count at full global share: a block that skipped a
    source entirely is the worst mixing failure). A sorted-by-source
    corpus scores ≈ 1 − share; a well-interleaved one stays near the
    sampling noise floor. Top-k offending blocks are the output a
    curation engineer acts on.

    Two narrow scans: the first folds to |sources| global (source, n)
    integer partials (the broadcast small side); the second ships
    (window, source, n) integer partials into the window-hash bucket
    exchange — a window's cells land in one bucket, so each bucket
    pivots its windows × the broadcast source list (zero-filled, which
    is what scores absent sources), takes its local top-k, and the
    driver merges ≤ buckets×k rows. Deviation doubles are built from
    exact integers with the oracle's CAST/CAST-divide trees."""
    from .dedup import _dedup_buckets, _fused_grouped_frames
    from ..shuffle import map_partials

    nb = _dedup_buckets()

    def src_partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["doc_id", "source"])
        vc = df["source"].value_counts()
        return pd.DataFrame(
            {"source": vc.index.to_numpy(), "n": vc.to_numpy().astype("int64")}
        )

    tot = map_partials(
        f"{sf_dir}/documents.parquet", ["doc_id", "source"], None, src_partial
    )
    empty = pd.DataFrame(
        {
            "window_id": pd.Series([], dtype="int64"),
            "n_docs": pd.Series([], dtype="int64"),
            "max_abs_dev": pd.Series([], dtype="float64"),
        }
    )
    if not len(tot):
        return empty
    tot = tot.groupby("source", as_index=False)["n"].sum()
    n_total = int(tot["n"].sum())
    # CAST(ns AS DOUBLE) / CAST(n AS DOUBLE) — the oracle's share tree
    shares = pd.Series(
        [float(int(v)) / float(n_total) for v in tot["n"]],
        index=tot["source"].to_numpy(),
    )

    def win_partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["doc_id", "source"])
        w = (df["doc_id"].astype("int64") // window).to_numpy()
        part = (
            pd.DataFrame({"w": w, "source": df["source"].to_numpy()})
            .groupby(["w", "source"], sort=False)
            .size()
            .reset_index(name="n")
        )
        part["__bucket"] = (
            part["w"].to_numpy().astype(np.uint64)
            * np.uint64(0x9E3779B97F4A7C15)
            % np.uint64(nb)
        ).astype(np.int32)
        return part

    def bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        cells = df.groupby(["w", "source"], as_index=False)["n"].sum()
        pv = cells.pivot_table(
            index="w", columns="source", values="n", fill_value=0, aggfunc="sum"
        ).reindex(columns=shares.index, fill_value=0)
        nw = pv.sum(axis=1)
        dev = (
            (pv.astype("float64").div(nw.astype("float64"), axis=0) - shares)
            .abs()
            .max(axis=1)
        )
        out = pd.DataFrame(
            {
                "window_id": pv.index.to_numpy().astype("int64"),
                "n_docs": nw.to_numpy().astype("int64"),
                "max_abs_dev": round_duck(dev.to_numpy(), 6),
            }
        )
        return out.sort_values(
            ["max_abs_dev", "window_id"], ascending=[False, True], kind="stable"
        ).head(k)

    parts = _fused_grouped_frames(
        [(f"{sf_dir}/documents.parquet", ["doc_id", "source"], None, win_partial)],
        nb,
        bucket_topk,
    )
    if not len(parts):
        return empty
    return (
        parts.sort_values(
            ["max_abs_dev", "window_id"], ascending=[False, True], kind="stable"
        )
        .head(k)
        .reset_index(drop=True)
        .astype({"window_id": "int64", "n_docs": "int64"})
    )


def _mixture_window_sql(window: int = 100, k: int = 10) -> str:
    return f"""
        WITH d AS (
            SELECT doc_id // {window} AS w, source FROM documents
            WHERE doc_id IS NOT NULL AND source IS NOT NULL
        ),
        g AS (SELECT w, source, COUNT(*) AS n FROM d GROUP BY 1, 2),
        wn AS (SELECT w, SUM(n) AS nw FROM g GROUP BY 1),
        tot AS (SELECT source, SUM(n) AS ns FROM g GROUP BY 1),
        t AS (SELECT SUM(ns) AS n_total FROM tot),
        cell AS (
            SELECT wn.w, wn.nw, tot.ns, COALESCE(g.n, 0) AS n
            FROM wn CROSS JOIN tot
            LEFT JOIN g ON g.w = wn.w AND g.source = tot.source
        ),
        dev AS (
            SELECT w, MAX(nw) AS n_docs,
                   MAX(ABS(CAST(n AS DOUBLE) / CAST(nw AS DOUBLE)
                           - CAST(ns AS DOUBLE) / CAST(t.n_total AS DOUBLE)))
                       AS dv
            FROM cell CROSS JOIN t GROUP BY w
        )
        SELECT CAST(w AS BIGINT) AS window_id,
               CAST(n_docs AS BIGINT) AS n_docs,
               ROUND(dv, 6) AS max_abs_dev
        FROM dev
        ORDER BY ROUND(dv, 6) DESC, w ASC LIMIT {k}
    """


def quota_cap_documents(sf_dir: str, cap: int = 10) -> pd.DataFrame:
    """Per-source quota-cap census: if each source is capped at ``cap``
    documents (chosen deterministically by md5 hash order, the same
    seedless selector as the split assignment), how many docs and tokens
    does each source keep vs lose? This is the hard-cap companion to
    ``mixture_weights_documents``'s sampling rates — the table that
    decides whether capping a dominant crawl starves the mixture.

    Selection is a distributed per-source top-``cap``: each scan task
    ships at most cap (md5, doc_id, tokens) candidate rows per source it
    saw (the global cap-smallest are necessarily inside the union of
    per-task cap-smallest) plus one (n_docs, tokens) total row per
    source; the driver folds tasks×sources×cap bounded rows. Tokens =
    whitespace count + 1, the corpus convention."""
    from ..shuffle import map_partials

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["doc_id", "source", "text"])
        empty = pd.DataFrame(
            {
                "kind": pd.Series([], dtype="object"),
                "source": pd.Series([], dtype="object"),
                "h": pd.Series([], dtype="object"),
                "doc_id": pd.Series([], dtype="int64"),
                "t": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
            }
        )
        if not len(df):
            return empty
        df = df.assign(
            t=df["text"].astype(str).str.count(" ").to_numpy() + 1,
            h=_md5_hex(df["doc_id"]),
            doc_id=df["doc_id"].astype("int64"),
        )
        tot = (
            df.groupby("source", as_index=False)
            .agg(n=("doc_id", "size"), t=("t", "sum"))
            .assign(kind="tot", h="", doc_id=0)
        )
        cand = (
            df.sort_values(["source", "h", "doc_id"])
            .groupby("source", as_index=False)
            .head(cap)
            .assign(kind="cand", n=0)
        )
        cols = ["kind", "source", "h", "doc_id", "t", "n"]
        return pd.concat([tot[cols], cand[cols]], ignore_index=True)

    parts = map_partials(
        f"{sf_dir}/documents.parquet", ["doc_id", "source", "text"], None, partial
    )
    empty = pd.DataFrame(
        {
            "source": pd.Series([], dtype="object"),
            "n_docs": pd.Series([], dtype="int64"),
            "n_kept": pd.Series([], dtype="int64"),
            "kept_tokens": pd.Series([], dtype="int64"),
            "dropped_tokens": pd.Series([], dtype="int64"),
        }
    )
    if not len(parts):
        return empty
    tot = (
        parts[parts["kind"] == "tot"]
        .groupby("source", as_index=False)
        .agg(n_docs=("n", "sum"), total_tokens=("t", "sum"))
    )
    kept = (
        parts[parts["kind"] == "cand"]
        .sort_values(["source", "h", "doc_id"])
        .groupby("source", as_index=False)
        .head(cap)
        .groupby("source", as_index=False)
        .agg(n_kept=("doc_id", "size"), kept_tokens=("t", "sum"))
    )
    out = tot.merge(kept, on="source", how="left")
    out["n_kept"] = out["n_kept"].fillna(0).astype("int64")
    out["kept_tokens"] = out["kept_tokens"].fillna(0).astype("int64")
    out["dropped_tokens"] = (out["total_tokens"] - out["kept_tokens"]).astype(
        "int64"
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    return (
        out[["source", "n_docs", "n_kept", "kept_tokens", "dropped_tokens"]]
        .sort_values("source")
        .reset_index(drop=True)
    )


def _quota_cap_sql(cap: int = 10) -> str:
    return f"""
        WITH d AS (
            SELECT source, doc_id,
                   LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS t,
                   md5(CAST(doc_id AS VARCHAR)) AS h
            FROM documents
            WHERE source IS NOT NULL AND doc_id IS NOT NULL
              AND text IS NOT NULL
        ),
        r AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY source ORDER BY h, doc_id
            ) AS rn FROM d
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN rn <= {cap} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_kept,
               CAST(SUM(CASE WHEN rn <= {cap} THEN t ELSE 0 END) AS BIGINT)
                   AS kept_tokens,
               CAST(SUM(CASE WHEN rn > {cap} THEN t ELSE 0 END) AS BIGINT)
                   AS dropped_tokens
        FROM r GROUP BY source ORDER BY source
    """


def curriculum_stages_documents(sf_dir: str, k: int = 4) -> pd.DataFrame:
    """Curriculum-ordered staging: rank every document by a difficulty
    proxy (``n_chars``, tie-broken by ``doc_id`` into a TOTAL order) and
    split the ranking into ``k`` equal-population stages — the
    easy-to-hard schedule decision table (docs + char budget per stage)
    a curriculum-training run is provisioned from.

    SQL's ``NTILE(k) OVER (ORDER BY n_chars, doc_id)`` is rank-based, so
    a naive distributed version needs a global sort. Instead the total
    order is embedded into ONE exactly-representable float64 key
    (``n_chars · 2⁴⁰ + doc_id`` — exact while n_chars < 2¹³ and
    doc_id < 2⁴⁰; both hold here and the multiplier is a documented
    domain assumption at larger ids), the k−1 NTILE boundary KEYS are
    found by the repo's distributed order-statistic selection
    (``selection._rank_values`` — histogram refinement, ≤ B-row partials
    per pass, no sort), and ONE final scan assigns each row its stage by
    ``searchsorted`` against the broadcast boundaries and folds
    per-stage (count, Σchars, min, max) integer partials. NTILE's
    remainder rule (first N mod k stages get the extra row) is applied
    closed-form to pick the boundary ranks, so stage populations match
    the window function exactly; keys are unique (doc_id ties broken),
    so boundary equality is unambiguous."""
    from .selection import _rank_values
    from ..shuffle import map_partials

    path = f"{sf_dir}/documents.parquet"
    mult = float(2**40)

    def _checked_key(nc: np.ndarray, did: np.ndarray) -> np.ndarray:
        # LOUD domain guard: the composite key is exact in float64 only
        # while 0 <= n_chars < 2¹³ and 0 <= doc_id < 2⁴⁰ (key < 2⁵³).
        # Beyond that, float spacing quantizes the doc_id tie-break and
        # stage boundaries silently diverge from NTILE — refuse instead.
        # Negative values break the encoding too (a negative doc_id
        # flips the tie-break sign; a negative n_chars inverts the major
        # order), so the guard checks BOTH ends of the domain.
        if len(nc) and (
            int(nc.max()) >= 2**13
            or int(did.max()) >= 2**40
            or int(nc.min()) < 0
            or int(did.min()) < 0
        ):
            raise ValueError(
                "curriculum_stages_documents: n_chars outside [0, 2^13) "
                "or doc_id outside [0, 2^40) breaks the exact float64 "
                "order key; widen the key encoding before using this "
                "operator on such data"
            )
        return nc.astype(np.float64) * mult + did.astype(np.float64)

    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=["n_chars", "doc_id"])
        return pd.DataFrame(
            {
                "g": "all",
                "key": _checked_key(
                    df["n_chars"].to_numpy(np.int64),
                    df["doc_id"].to_numpy(np.int64),
                ),
            }
        )

    def boundary_ranks(counts: dict) -> dict:
        # NTILE sizes: first (n mod k) stages get ⌈n/k⌉, rest ⌊n/k⌋;
        # boundaries = 0-indexed rank of each stage's LAST row
        out = {}
        for grp, n in counts.items():
            q, r = divmod(n, k)
            sizes = [q + 1] * r + [q] * (k - r)
            cum, ranks = 0, []
            for s in sizes[:-1]:
                cum += s
                ranks.append(max(0, cum - 1))
            out[grp] = sorted(set(ranks))
        return out

    empty = pd.DataFrame(
        {
            "stage": pd.Series([], dtype="int64"),
            "n_docs": pd.Series([], dtype="int64"),
            "sum_chars": pd.Series([], dtype="int64"),
            "min_chars": pd.Series([], dtype="int64"),
            "max_chars": pd.Series([], dtype="int64"),
        }
    )
    try:
        vals, counts = _rank_values(
            path,
            "g",
            "key",
            boundary_ranks,
            read_cols=["n_chars", "doc_id"],
            transform=add_key,
        )
    except KeyError:
        return empty
    if not counts or counts.get("all", 0) == 0:
        return empty
    n = counts["all"]
    q, r = divmod(n, k)
    sizes = [q + 1] * r + [q] * (k - r)
    cum, bounds = 0, []
    for s in sizes[:-1]:
        cum += s
        bounds.append(vals["all"][max(0, cum - 1)])
    boundaries = np.asarray(bounds, dtype=np.float64)

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["n_chars", "doc_id"])
        if not len(df):
            return pd.DataFrame(
                {
                    "stage": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                    "s": pd.Series([], dtype="int64"),
                    "mn": pd.Series([], dtype="int64"),
                    "mx": pd.Series([], dtype="int64"),
                }
            )
        nc = df["n_chars"].to_numpy(np.int64)
        key = _checked_key(nc, df["doc_id"].to_numpy(np.int64))
        stage = np.searchsorted(boundaries, key, side="left") + 1
        g = pd.DataFrame({"stage": stage, "nc": nc}).groupby(
            "stage", as_index=False
        )["nc"]
        agg = g.agg(["count", "sum", "min", "max"])
        return pd.DataFrame(
            {
                "stage": agg["stage"].astype("int64"),
                "n": agg["count"].astype("int64"),
                "s": agg["sum"].astype("int64"),
                "mn": agg["min"].astype("int64"),
                "mx": agg["max"].astype("int64"),
            }
        )

    parts = map_partials(path, ["n_chars", "doc_id"], None, partial)
    if not len(parts):
        return empty
    g = parts.groupby("stage", as_index=False).agg(
        n_docs=("n", "sum"),
        sum_chars=("s", "sum"),
        min_chars=("mn", "min"),
        max_chars=("mx", "max"),
    )
    g = g.astype(
        {
            "stage": "int64",
            "n_docs": "int64",
            "sum_chars": "int64",
            "min_chars": "int64",
            "max_chars": "int64",
        }
    )
    return g.sort_values("stage").reset_index(drop=True)


def _curriculum_sql(k: int = 4) -> str:
    return f"""
        WITH ranked AS (
            SELECT n_chars,
                   NTILE({k}) OVER (ORDER BY n_chars, doc_id) AS stage
            FROM documents
            WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL
        )
        SELECT stage,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(MIN(n_chars) AS BIGINT) AS min_chars,
               CAST(MAX(n_chars) AS BIGINT) AS max_chars
        FROM ranked GROUP BY stage ORDER BY stage
    """


QUERIES = {
    "mixture_window_audit_documents": mixture_window_audit_documents,
    "quota_cap_documents": quota_cap_documents,
    "length_bucket_census_documents": length_bucket_census_documents,
    "pack_efficiency_documents": pack_efficiency_documents,
    "split_bias_chisq_documents": split_bias_chisq_documents,
    "split_assign_documents": split_assign_documents,
    "shuffle_order_documents": shuffle_order_documents,
    "curation_funnel_documents": curation_funnel_documents,
    "block_packing_documents": block_packing_documents,
    "mixture_weights_documents": mixture_weights_documents,
    "curriculum_stages_documents": curriculum_stages_documents,
}

ORACLE_SQL = {
    "curriculum_stages_documents": _curriculum_sql(),
    "mixture_window_audit_documents": _mixture_window_sql(),
    "quota_cap_documents": _quota_cap_sql(),
    "length_bucket_census_documents": _length_bucket_sql(),
    "pack_efficiency_documents": _pack_efficiency_sql(),
    "split_bias_chisq_documents": _SPLIT_BIAS_SQL,
    "mixture_weights_documents": """
        WITH d AS (
            SELECT source,
                   LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS t
            FROM documents
            WHERE source IS NOT NULL AND text IS NOT NULL
        ), g AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(t) AS BIGINT) AS tokens,
                   CASE WHEN source IN ('src0', 'src1', 'src2')
                        THEN 2.0 ELSE 1.0 END AS w
            FROM d GROUP BY source
        ), tw AS (
            SELECT SUM(w) AS total_w FROM g
        ), alloc AS (
            SELECT source, n_docs, tokens,
                   w / tw.total_w AS norm,
                   CASE WHEN 50000 * (w / tw.total_w) < tokens
                        THEN (50000 * (w / tw.total_w)) / tokens
                        ELSE 1.0 END AS rate
            FROM g CROSS JOIN tw
        )
        SELECT source, n_docs, tokens,
               ROUND(norm, 6) AS weight,
               ROUND(rate, 6) AS sampling_rate,
               ROUND(rate * tokens, 2) AS expected_tokens
        FROM alloc ORDER BY source
    """,
    "split_assign_documents": """
        WITH s AS (
            SELECT lang, n_chars,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
                            THEN 'train'
                        WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'f'
                            THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
            WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        )
        SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM s GROUP BY split, lang ORDER BY split, lang
    """,
    "shuffle_order_documents": """
        WITH r AS (
            SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
            FROM documents WHERE doc_id IS NOT NULL
        ), p AS (
            SELECT doc_id, substr(h, 1, 1) AS shard,
                   ROW_NUMBER() OVER (ORDER BY h, doc_id) AS pos
            FROM r
        )
        SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(doc_id * pos) AS BIGINT) AS pos_checksum
        FROM p GROUP BY shard ORDER BY shard
    """,
    "curation_funnel_documents": """
        WITH d AS (
            SELECT text, n_chars,
                   LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS toks
            FROM documents WHERE text IS NOT NULL
        ), f AS (
            SELECT text,
                   CASE WHEN n_chars IS NOT NULL
                             AND n_chars BETWEEN 100 AND 20000
                        THEN 1 ELSE 0 END AS f2,
                   CASE WHEN n_chars IS NOT NULL
                             AND n_chars BETWEEN 100 AND 20000
                             AND toks >= 20
                        THEN 1 ELSE 0 END AS f3
            FROM d
        )
        SELECT * FROM (
            SELECT CAST(1 AS BIGINT) AS stage, 'non_null_text' AS stage_name,
                   CAST(COUNT(*) AS BIGINT) AS n_docs FROM f
            UNION ALL
            SELECT 2, 'length_100_20000', CAST(SUM(f2) AS BIGINT) FROM f
            UNION ALL
            SELECT 3, 'min_20_tokens', CAST(SUM(f3) AS BIGINT) FROM f
            UNION ALL
            SELECT 4, 'exact_dedup',
                   CAST(COUNT(DISTINCT CASE WHEN f3 = 1 THEN text END) AS BIGINT)
            FROM f
        ) ORDER BY stage
    """,
    "block_packing_documents": """
        WITH d AS (
            SELECT lang, doc_id,
                   LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS tok
            FROM documents
            WHERE text IS NOT NULL AND lang IS NOT NULL AND doc_id IS NOT NULL
        ), c AS (
            SELECT lang, tok,
                   SUM(tok) OVER (PARTITION BY lang ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) - tok AS s
            FROM d
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(tok) AS BIGINT) AS total_tokens,
               CAST(CEIL(SUM(tok) / 512.0) AS BIGINT) AS n_blocks,
               CAST(SUM(CASE WHEN (s // 512) <> ((s + tok - 1) // 512)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs
        FROM c GROUP BY lang ORDER BY lang
    """,
}
