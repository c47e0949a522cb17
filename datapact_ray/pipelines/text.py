"""Text-analysis stages for large-scale training-data pipelines.

Actor-pool ``map_batches`` stages over the ``documents`` table: token
counting (whitespace + a BPE-ish regex), quality scoring (length / punct
/ stopword ratios), language-ID (stopword n-gram heuristic), and
document fingerprinting (rolling-hash winnowing). Regexes compile once
per actor in ``__init__``; per-batch work uses pandas' C string kernels.

SQL-checkable definitions (kept deliberately oracle-matching):

* ``ws_tokens`` = number of single-space separators + 1
  (= ``LENGTH(text) - LENGTH(REPLACE(text,' ','')) + 1``)
* ``re_tokens`` = count of ``\\w+|[^\\w\\s]`` matches
  (= ``len(regexp_extract_all(text, ...))``)
* ``punct_chars`` = count of ``[^\\w\\s]`` characters.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ._util import round_duck

_TOKEN_RE = r"\w+|[^\w\s]"
_PUNCT_RE = r"[^\w\s]"

STOPWORDS = {
    "en": {"the", "a", "and", "of", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "den", "mit", "von"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"},
    "es": {"el", "la", "los", "y", "de", "un", "una", "es", "que", "por"},
}


class TextFeaturizer:
    """Stateful featurizer: regexes + stopword sets compiled once per
    actor; batches flow through vectorized pandas string kernels. The
    stopword/lang-ID pass is one flat exploded-word membership test per
    language plus a per-doc segment sum — no per-document Python loop."""

    def __init__(self):
        self.token_re = re.compile(_TOKEN_RE)
        self.word_re = re.compile(r"\w+")
        self.langs = list(STOPWORDS)  # order fixes argmax tie-breaking
        self.stop = {lang: frozenset(ws) for lang, ws in STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        from ._tokens import flat_tokens, segment_reduce

        df = batch.to_pandas()
        text = df["text"].astype(str)
        out = pd.DataFrame({"doc_id": df["doc_id"]})
        if "lang" in df.columns:
            out["lang"] = df["lang"]
        if "source" in df.columns:
            out["source"] = df["source"]
        out["n_chars"] = text.str.len().astype("int64")
        out["ws_tokens"] = (text.str.count(" ") + 1).astype("int64")
        out["re_tokens"] = text.str.count(_TOKEN_RE).astype("int64")
        out["punct_chars"] = text.str.count(_PUNCT_RE).astype("int64")
        # stopword ratio + langid over the flat word array
        flat, counts = flat_tokens(text, lowercase=True, word_re=r"\w+")
        hit_mat = np.empty((len(df), len(self.langs)), dtype=np.int64)
        for li, lang in enumerate(self.langs):
            hits = flat.isin(self.stop[lang]).to_numpy().astype(np.int64)
            hit_mat[:, li] = segment_reduce(hits, counts, np.add, empty=0)
        total_hits = hit_mat.sum(axis=1)
        out["stop_ratio"] = total_hits / np.maximum(counts, 1)
        best = np.argmax(hit_mat, axis=1)  # first max wins, like dict order
        best_hits = hit_mat[np.arange(len(df)), best]
        out["lang_pred"] = np.where(
            best_hits > 0, np.asarray(self.langs, dtype=object)[best], "unk"
        )
        ratios = out["stop_ratio"].to_numpy()
        # quality score: bounded combination of length/punct/stopword signals
        length_score = np.clip(out["n_chars"] / 500.0, 0, 1)
        punct_pen = np.clip(
            out["punct_chars"] / out["n_chars"].clip(lower=1), 0, 1
        )
        from ._util import round_duck

        out["quality_score"] = round_duck(
            0.5 * length_score + 0.3 * (1 - punct_pen) + 0.2 * np.clip(ratios * 5, 0, 1),
            6,
        )
        # Arrow-typed output with NO schema metadata: Ray hashes block
        # schemas for dedup, and the pandas-metadata dict from
        # from_pandas is unhashable ("Failed to hash the schemas" noise)
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)


class Fingerprinter:
    """Rolling-hash document fingerprint (winnowing-lite): fingerprint =
    minimum 5-token shingle hash. Vectorized: flat siphash token hashes +
    rolling polynomial shingles + per-doc segment min (deterministic
    across processes — pinned siphash key, not PYTHONHASHSEED)."""

    def __init__(self, shingle: int = 5):
        self.shingle = shingle

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        from ._tokens import (
            flat_tokens,
            segment_reduce,
            shingle_hashes,
            token_hashes,
        )

        df = batch.to_pandas()
        flat, counts = flat_tokens(df["text"].astype(str))
        sh, shc = shingle_hashes(token_hashes(flat), counts, self.shingle)
        fps = segment_reduce(sh, shc, np.minimum, empty=0)
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "fingerprint": fps.view(np.int64)}
        )


class _FeaturePartial:
    """TextFeaturizer fused with an in-task reduction for the raw-task
    scan path (``shuffle.map_partials``): the per-doc feature frame never
    leaves the task — only the reduced (≤ groups-sized) partial does."""

    def __init__(self, reduce_fn):
        self.feat = TextFeaturizer()
        self.reduce_fn = reduce_fn

    def __call__(self, table: pa.Table) -> pd.DataFrame:
        return self.reduce_fn(self.feat(table).to_pandas())


def text_stats_documents(sf_dir: str) -> pd.DataFrame:
    """Per-language doc/token/char stats (oracle-matching definitions)."""
    from ..shuffle import map_partials

    def reduce_fn(f: pd.DataFrame) -> pd.DataFrame:
        return (
            f.groupby("lang", sort=False)
            .agg(
                n_docs=("lang", "size"),
                sum_tokens=("ws_tokens", "sum"),
                sum_chars=("n_chars", "sum"),
            )
            .reset_index()
        )

    out = (
        map_partials(
            f"{sf_dir}/documents.parquet",
            ["doc_id", "text", "lang"],
            None,
            _FeaturePartial(reduce_fn),
        )
        .groupby("lang", as_index=False)
        .sum()
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["sum_tokens"] = out["sum_tokens"].astype("int64")
    out["avg_chars"] = round_duck(out["sum_chars"] / out["n_docs"], 4)
    out = out.drop(columns=["sum_chars"])
    return out.sort_values("lang").reset_index(drop=True)


def token_counts_documents(sf_dir: str) -> pd.DataFrame:
    """Corpus token totals: whitespace + BPE-ish regex tokenization."""
    from ..shuffle import map_partials

    def reduce_fn(f: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "ws": [int(f["ws_tokens"].sum())],
                "re": [int(f["re_tokens"].sum())],
                "pc": [int(f["punct_chars"].sum())],
            }
        )

    parts = map_partials(
        f"{sf_dir}/documents.parquet",
        ["doc_id", "text"],
        None,
        _FeaturePartial(reduce_fn),
    )
    return pd.DataFrame(
        {
            "total_ws_tokens": [int(parts["ws"].sum())],
            "total_re_tokens": [int(parts["re"].sum())],
            "total_punct_chars": [int(parts["pc"].sum())],
        }
    )


def langid_documents(sf_dir: str) -> pd.DataFrame:
    """Predicted-language distribution. The stopword-hit heuristic is
    SQL-expressible, so this is oracle-checked (``_LANGID_SQL``)."""
    from ..shuffle import map_partials

    def reduce_fn(f: pd.DataFrame) -> pd.DataFrame:
        vc = f["lang_pred"].value_counts()
        return pd.DataFrame(
            {"lang_pred": vc.index.astype(str), "n_docs": vc.to_numpy()}
        )

    out = (
        map_partials(
            f"{sf_dir}/documents.parquet",
            ["doc_id", "text"],
            None,
            _FeaturePartial(reduce_fn),
        )
        .groupby("lang_pred", as_index=False)["n_docs"]
        .sum()
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values("lang_pred").reset_index(drop=True)


def quality_documents(sf_dir: str) -> pd.DataFrame:
    """Mean quality score per source, oracle-checked (``_QUALITY_SQL``
    reproduces the score formula in the engine's evaluation order)."""
    import math

    from ..shuffle import map_partials

    def reduce_fn(f: pd.DataFrame) -> pd.DataFrame:
        rows = [
            (src_, len(g), math.fsum(g["quality_score"].dropna()))
            for src_, g in f.groupby("source", sort=False)
        ]
        return pd.DataFrame(rows, columns=["source", "n", "s"])

    parts = map_partials(
        f"{sf_dir}/documents.parquet",
        ["doc_id", "text", "source"],
        None,
        _FeaturePartial(reduce_fn),
    )
    rows = [
        (src_, int(g["n"].sum()), round_duck(math.fsum(g["s"]) / g["n"].sum(), 4))
        for src_, g in parts.groupby("source", sort=True)
    ]
    out = pd.DataFrame(rows, columns=["source", "n_docs", "avg_quality"])
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.reset_index(drop=True)


def fingerprint_documents(sf_dir: str) -> pd.DataFrame:
    """Distinct rolling-hash fingerprints (rows-only)."""
    from ..shuffle import map_partials

    fp = Fingerprinter()

    def partial(table: pa.Table) -> pd.DataFrame:
        out = fp(table)
        # per-task dedup: one (sorted distinct fps, row count) partial
        u = np.unique(out["fingerprint"].to_numpy())
        return pd.DataFrame({"fps": [u.tobytes()], "n": [len(out)]})

    parts = map_partials(
        f"{sf_dir}/documents.parquet", ["doc_id", "text"], None, partial
    )
    all_fps = np.unique(
        np.concatenate(
            [np.frombuffer(b, dtype=np.int64) for b in parts["fps"]]
        )
        if len(parts)
        else np.zeros(0, dtype=np.int64)
    )
    return pd.DataFrame(
        {
            "n_docs": [int(parts["n"].sum()) if len(parts) else 0],
            "distinct_fingerprints": [int(all_fps.size)],
        }
    )


def _topk_by_count(partials, key_col: str, k: int) -> pd.DataFrame:
    """Exact distributed top-k-by-count over (key, cnt) partial frames
    that already carry ``__bucket`` = hash(key) % B: per-bucket
    vectorized sum + LOCAL top-k (same key ⇒ same bucket, so the global
    top-k is a subset of the union of bucket top-ks), then a driver
    merge of ≤ B×k candidate rows. Replaces Ray's generic sort-based
    groupby, whose fixed per-task cost dominated at vocabulary scale
    (measured: vocab 4.7 s → <1 s of aggregate time, bigram 11.9 s →
    likewise, on identical partials). Tie-break: count desc, key asc."""
    from .dedup import _dedup_buckets, _grouped_frames

    num_buckets = _dedup_buckets()

    def bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key_col, as_index=False)["cnt"].sum()
        return g.sort_values(
            ["cnt", key_col], ascending=[False, True], kind="stable"
        ).head(k)

    cand = _grouped_frames(partials, num_buckets, bucket_topk)
    top = cand.sort_values(
        ["cnt", key_col], ascending=[False, True], kind="stable"
    ).head(k)
    top["cnt"] = top["cnt"].astype("int64")
    return top[[key_col, "cnt"]].reset_index(drop=True)


def unigram_logprob_documents(sf_dir: str) -> pd.DataFrame:
    """Unigram-LM quality score (the CCNet/KenLM-style perplexity proxy
    with the simplest possible LM): per language, the mean over documents
    of the document's average token log-probability under the corpus's
    own unigram distribution. Low scores flag gibberish / rare-token
    soup; it is the standard cheap stand-in for model-perplexity
    filtering when no LM is available.

    Two phases, both raw-task waves: phase 1 builds the corpus unigram
    table (vocabulary-sized partials — same exchange shape as the vocab
    builder); the ``ln(count/total)`` table is broadcast once
    (``ray.put``; premise: the vocabulary fits a broadcast — beyond
    that, the doc pass becomes a token-hash bucket join). Phase 2 scores
    each document fully inside its scan task (factorized token codes →
    one LUT gather → per-doc segment mean) and ships only per-(lang,
    task) fsum partials. Token log-probs are ``ln`` of exact integer
    ratios, so both engines compute identical doubles; per-doc sums run
    in document order on both sides."""
    import math as _math

    import ray as _ray

    from ..shuffle import map_partials

    path = f"{sf_dir}/documents.parquet"

    def tf_partial(batch: pa.Table) -> pd.DataFrame:
        text = batch.column("text").to_pandas().dropna().astype(str)
        vc = text.str.split(" ").explode().value_counts()
        return pd.DataFrame(
            {
                "token": vc.index.to_numpy().astype(str),
                "c": vc.to_numpy().astype("int64"),
            }
        )

    tf = (
        map_partials(path, ["text"], None, tf_partial)
        .groupby("token")["c"]
        .sum()
    )
    total = int(tf.sum())
    logp = dict(
        zip(tf.index, np.log(tf.to_numpy(dtype=np.float64) / float(total)))
    )
    logp_ref = _ray.put(logp)

    def doc_partial(batch: pa.Table) -> pd.DataFrame:
        from ._tokens import segment_reduce

        lp = _ray.get(logp_ref)
        df = batch.to_pandas().dropna(subset=["text", "lang"])
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "lang": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype="int64"),
                    "s": pd.Series([], dtype="float64"),
                }
            )
        toks = df["text"].astype(str).str.split(" ")
        counts = toks.str.len().to_numpy(dtype=np.int64)
        flat = toks.explode().to_numpy().astype(str)
        codes, uniq = pd.factorize(pd.Series(flat))
        lut = np.array([lp[u] for u in uniq], dtype=np.float64)
        sums = segment_reduce(lut[codes], counts, np.add, empty=0.0)
        doc_lp = sums / np.maximum(counts, 1)
        rows = [
            (lang, len(g), _math.fsum(g))
            for lang, g in pd.Series(doc_lp).groupby(df["lang"].to_numpy())
        ]
        return pd.DataFrame(rows, columns=["lang", "n", "s"]).astype(
            {"lang": str, "n": "int64", "s": "float64"}
        )

    parts = map_partials(path, ["text", "lang"], None, doc_partial)
    rows = [
        (
            lang,
            int(g["n"].sum()),
            float(round_duck(_math.fsum(g["s"]) / g["n"].sum(), 4)),
        )
        for lang, g in parts.groupby("lang", sort=True)
    ]
    return pd.DataFrame(rows, columns=["lang", "n_docs", "avg_logprob"]).astype(
        {"n_docs": "int64"}
    )


def _topk_by_count_fused(
    path: str,
    columns: list[str],
    projector,
    key_col: str,
    k: int,
    num_buckets: int,
) -> pd.DataFrame:
    """Fused variant of :func:`_topk_by_count`: the (key, cnt, __bucket)
    partial production runs INSIDE the scan task (read → project →
    split, no pipeline hop), each bucket sums and takes its local
    top-k, and the driver merges ≤ B×k candidates. ``num_buckets`` MUST
    be the same value the projector used for ``__bucket``."""
    from .dedup import _fused_grouped_frames

    def bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key_col, as_index=False)["cnt"].sum()
        return g.sort_values(
            ["cnt", key_col], ascending=[False, True], kind="stable"
        ).head(k)

    cand = _fused_grouped_frames(
        [(path, columns, None, projector)], num_buckets, bucket_topk
    )
    top = cand.sort_values(
        ["cnt", key_col], ascending=[False, True], kind="stable"
    ).head(k)
    top["cnt"] = top["cnt"].astype("int64")
    return top[[key_col, "cnt"]].reset_index(drop=True)


def _bucket_of_keys(keys: pd.Series, num_buckets: int) -> np.ndarray:
    # num_buckets is computed ONCE on the driver and captured into the
    # projector closure: recomputing _dedup_buckets() inside a worker
    # disagrees with the driver's pre-auto-init value (8 vs CPU count)
    # and silently drops every row whose bucket id ≥ the reduce fan-out
    from ..sketches import hash_columns_u64

    h = hash_columns_u64(pd.DataFrame({"k": keys}), ["k"])
    return (h % np.uint64(num_buckets)).astype(np.int32)


def _grouped_frames_text(partials, fn) -> pd.DataFrame:
    from .dedup import _dedup_buckets, _grouped_frames

    return _grouped_frames(partials, _dedup_buckets(), fn)


def vocab_top_terms_documents(sf_dir: str, k: int = 25) -> pd.DataFrame:
    """Vocabulary / term-frequency builder: top-k corpus terms by count.

    The classic pre-aggregation shape: each map task computes a PARTIAL
    per-token count for its batch (pandas ``split → explode →
    value_counts``, C string kernels), so what enters the shuffle is one
    (token, cnt) row per DISTINCT token per task — vocabulary-sized, not
    corpus-sized. The partials route through the explicit token-hash
    bucket shuffle with per-bucket local top-k (see ``_topk_by_count``)."""
    from .dedup import _dedup_buckets

    nb = _dedup_buckets()

    def partial_counts(batch: pa.Table) -> pd.DataFrame:
        # dropna BEFORE astype(str): a NULL text would otherwise become
        # the literal token "None" (SQL string_split(NULL) yields no rows)
        text = batch.column("text").to_pandas().dropna().astype(str)
        vc = text.str.split(" ").explode().value_counts()
        out = pd.DataFrame(
            {
                "token": vc.index.to_numpy().astype(str),
                "cnt": vc.to_numpy().astype("int64"),
            }
        )
        out["__bucket"] = _bucket_of_keys(out["token"], nb)
        return out

    return _topk_by_count_fused(
        f"{sf_dir}/documents.parquet", ["text"], partial_counts, "token", k, nb
    )


def sample_documents_hash(sf_dir: str, rate_pct: int = 10) -> pd.DataFrame:
    """Deterministic hash sampling (O5 extension): keep a document iff
    ``(doc_id * 2654435761) mod 2^32 mod 100 < rate_pct`` — a Knuth
    multiplicative hash expressible in plain SQL arithmetic, so the
    sample is reproducible across engines and runs (no RNG state). The
    sampled stats are per-batch partial (lang, count, char-sum) rows
    merged on the driver (≤ n_langs per task); the filter is vectorized
    uint64 numpy arithmetic inside the scan task, so unsampled rows
    never leave the reader."""
    m, b32, h = np.uint64(2654435761), np.uint64(4294967296), np.uint64(100)

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["doc_id"])
        hashed = df["doc_id"].to_numpy().astype(np.uint64) * m % b32 % h
        keep = df.loc[hashed < np.uint64(rate_pct)]
        g = (
            keep.groupby("lang", sort=False)
            .agg(n_sampled=("doc_id", "size"), sum_chars=("n_chars", "sum"))
            .reset_index()
        )
        return g.astype({"lang": str, "n_sampled": "int64", "sum_chars": "int64"})

    from ..shuffle import map_partials

    out = (
        map_partials(
            f"{sf_dir}/documents.parquet", ["doc_id", "lang", "n_chars"], None, partial
        )
        .groupby("lang", as_index=False)
        .agg(n_sampled=("n_sampled", "sum"), sum_chars=("sum_chars", "sum"))
    )
    out["n_sampled"] = out["n_sampled"].astype("int64")
    out["sum_chars"] = out["sum_chars"].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


def stratified_sample_documents(sf_dir: str, rate: float = 0.1) -> pd.DataFrame:
    """Stratified sampling with EXACT per-group quotas (proportional
    allocation): every language contributes exactly ⌈rate·n_lang⌉
    documents, chosen deterministically as the smallest md5(doc_id)
    values — reproducible across engines, runs and partitionings (no RNG
    state, no global sort).

    Two narrow passes: pass 1 reduces each batch to per-lang counts
    (≤ n_langs rows per task) and the driver fixes the quotas; pass 2
    prunes each batch to its LOCAL smallest-quota candidates per lang
    (the global smallest-q set is a subset of the union of per-task
    smallest-q sets — the top-k prune argument with the order reversed),
    so the driver merge sees ≤ quota × n_langs × n_tasks rows, never the
    table. md5 is the one hash both this engine and SQL produce
    identically; it is computed on the COMPACT doc_id string, not the
    text (hashing cost ∝ rows, payload stays in storage)."""
    import hashlib
    import math as _math

    from ..shuffle import map_partials

    path = f"{sf_dir}/documents.parquet"

    def lang_counts(batch: pa.Table) -> pd.DataFrame:
        vc = (
            batch.to_pandas()
            .dropna(subset=["doc_id", "lang"])["lang"]
            .value_counts()
        )
        return pd.DataFrame(
            {"lang": vc.index.astype(str), "n": vc.to_numpy().astype("int64")}
        )

    counts = (
        map_partials(path, ["doc_id", "lang"], None, lang_counts)
        .groupby("lang")["n"]
        .sum()
    )
    quotas = {lang: int(_math.ceil(n * rate)) for lang, n in counts.items()}

    def local_prune(batch: pa.Table, _q=quotas) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["doc_id", "lang"])
        df["h"] = [
            hashlib.md5(str(int(d)).encode()).hexdigest() for d in df["doc_id"]
        ]
        df = df.sort_values(["h", "doc_id"], kind="stable")
        out = df.groupby("lang", sort=False, group_keys=False).apply(
            lambda g: g.head(_q.get(g.name, 0))
        )
        return out[["lang", "doc_id", "n_chars", "h"]]

    cand = map_partials(
        path, ["doc_id", "lang", "n_chars"], None, local_prune
    ).sort_values(["h", "doc_id"], kind="stable")
    rows = []
    for lang in sorted(quotas):
        g = cand[cand["lang"] == lang].head(quotas[lang])
        rows.append((lang, len(g), int(g["n_chars"].sum())))
    return pd.DataFrame(rows, columns=["lang", "n_sampled", "sum_chars"]).astype(
        {"n_sampled": "int64", "sum_chars": "int64"}
    )


def doc_freq_top_terms_documents(sf_dir: str, k: int = 25) -> pd.DataFrame:
    """Document-frequency vocabulary (the IDF numerator): top-k terms by
    the number of DOCUMENTS containing them — set semantics per doc, not
    term frequency. Each map task dedups (doc, token) pairs inside the
    batch (documents never span batches, so per-batch doc-distinct
    counts sum exactly) and emits vocabulary-sized (token, cnt) partials
    into the same explicit bucket top-k exchange as the TF vocabulary."""
    from .dedup import _dedup_buckets

    nb = _dedup_buckets()

    def partial_df_counts(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["text"])
        toks = df["text"].astype(str).str.split(" ")
        flat = pd.DataFrame(
            {
                "d": np.repeat(
                    df["doc_id"].to_numpy(), toks.str.len().to_numpy()
                ),
                "token": toks.explode().to_numpy().astype(str),
            }
        ).drop_duplicates()
        vc = flat["token"].value_counts()
        out = pd.DataFrame(
            {
                "token": vc.index.to_numpy().astype(str),
                "cnt": vc.to_numpy().astype("int64"),
            }
        )
        out["__bucket"] = _bucket_of_keys(out["token"], nb)
        return out

    return _topk_by_count_fused(
        f"{sf_dir}/documents.parquet",
        ["doc_id", "text"],
        partial_df_counts,
        "token",
        k,
        nb,
    )


def heavy_hitter_terms_documents(sf_dir: str, k: int = 64, top: int = 10) -> pd.DataFrame:
    """Heavy-hitter terms via a mergeable Misra–Gries summary — the
    bounded-memory path for when even the vocabulary doesn't fit a
    shuffle (each partial is ≤ k counters regardless of input size, vs
    ``vocab_top_terms_documents`` whose exchange is vocabulary-sized).

    Rows-only but SELF-AUDITED: joins the sketch's top terms against the
    exact counts and reports per-term (est ≤ exact ≤ est + offset)
    bound satisfaction — the Misra–Gries guarantee, checked live."""
    from ..sketches import MisraGries

    def partial(batch: pa.Table) -> pd.DataFrame:
        text = batch.column("text").to_pandas().dropna().astype(str)
        vc = text.str.split(" ").explode().value_counts()
        mg = MisraGries(k=k)
        mg.add_value_counts(vc.index.to_numpy(), vc.to_numpy())
        return pd.DataFrame({"blob": [mg.to_bytes()]})

    from ..shuffle import map_partials

    merged = MisraGries(k=k)
    for blob in map_partials(
        f"{sf_dir}/documents.parquet", ["text"], None, partial
    )["blob"]:
        merged = merged.merge(MisraGries.from_bytes(blob))
    found = merged.items_with_bounds()[:top]

    # exact audit: true counts for the FOUND terms only — the found set
    # is ≤ top tokens, broadcast into the scan task, so the audit pass
    # ships ≤ top rows per task instead of the vocabulary
    found_tokens = frozenset(t for t, _, _ in found)

    def exact_partial(batch: pa.Table) -> pd.DataFrame:
        text = batch.column("text").to_pandas().dropna().astype(str)
        vc = text.str.split(" ").explode().value_counts()
        vc = vc[vc.index.isin(found_tokens)]
        return pd.DataFrame(
            {
                "token": vc.index.to_numpy().astype(str),
                "cnt": vc.to_numpy().astype("int64"),
            }
        )

    exact = (
        map_partials(f"{sf_dir}/documents.parquet", ["text"], None, exact_partial)
        .groupby("token")["cnt"]
        .sum()
    )
    rows = []
    for token, est, upper in found:
        ex = int(exact.get(token, 0))
        rows.append((token, int(est), int(upper), ex, bool(est <= ex <= upper)))
    return pd.DataFrame(
        rows,
        columns=["token", "est_count", "upper_count", "exact_count", "within_bounds"],
    )


def bigram_top_terms_documents(sf_dir: str, k: int = 25) -> pd.DataFrame:
    """N-gram frequency beyond unigrams: top-k corpus bigrams. Same
    pre-aggregation shape as the vocab builder — adjacent-token pairs
    are formed INSIDE the map task with one vectorized shift over the
    exploded token array (no per-doc Python loop), counted per batch,
    and only (bigram, cnt) partials — bigram-vocabulary-sized — enter
    the bucket shuffle (per-bucket local top-k, ``_topk_by_count``)."""
    from .dedup import _dedup_buckets

    nb = _dedup_buckets()

    def partial_counts(batch: pa.Table) -> pd.DataFrame:
        text = batch.column("text").to_pandas().dropna().astype(str)
        toks = text.str.split(" ").explode()
        flat = toks.to_numpy().astype(object)
        # doc boundary: index changes between consecutive exploded rows
        doc = toks.index.to_numpy()
        if len(flat) < 2:
            return pd.DataFrame(
                {
                    "bigram": pd.Series([], dtype=object),
                    "cnt": pd.Series([], dtype="int64"),
                    "__bucket": pd.Series([], dtype="int32"),
                }
            )
        same_doc = doc[1:] == doc[:-1]
        # factorize once, count int-encoded pairs, build the pair STRING
        # only for the distinct pairs (vocabulary-sized) — the per-row
        # object-string concat was 2-3x the whole stage's cost
        codes, uniques = pd.factorize(pd.Series(flat))
        pair = (codes[:-1][same_doc].astype(np.int64) << 32) | codes[1:][same_doc]
        vc = pd.Series(pair).value_counts()
        left = uniques[(vc.index.to_numpy() >> 32)].astype(str)
        right = uniques[(vc.index.to_numpy() & 0xFFFFFFFF)].astype(str)
        out = pd.DataFrame(
            {
                "bigram": pd.Series(left) + " " + pd.Series(right),
                "cnt": vc.to_numpy().astype("int64"),
            }
        )
        out["__bucket"] = _bucket_of_keys(out["bigram"], nb)
        return out

    return _topk_by_count_fused(
        f"{sf_dir}/documents.parquet", ["text"], partial_counts, "bigram", k, nb
    )


def repetition_documents(sf_dir: str) -> pd.DataFrame:
    """Intra-document repetition (a standard LLM-data quality filter
    signal): per language, the average fraction of a document's
    trigrams that are duplicates of an earlier trigram in the SAME
    document. Whole documents live inside single rows, so the per-doc
    statistic is computed entirely inside the map task (factorized
    token codes, drop_duplicates on (doc, c0, c1, c2) — no hashing, so
    the count is exact and matches the SQL oracle bit-for-bit); only
    per-lang (n_docs, ratio-sum) partials leave the task. Docs with
    fewer than 3 tokens have no trigrams and are excluded (as in SQL,
    where the trigram join yields no rows for them)."""
    def partial(batch: pa.Table) -> pd.DataFrame:
        import math as _math

        df = batch.to_pandas().dropna(subset=["text"])
        toks = df["text"].astype(str).str.split(" ").explode()
        codes, _ = pd.factorize(toks)
        doc = toks.index.to_numpy()
        same2 = doc[2:] == doc[:-2]
        tri = pd.DataFrame(
            {
                "doc": doc[:-2][same2],
                "c0": codes[:-2][same2],
                "c1": codes[1:-1][same2],
                "c2": codes[2:][same2],
            }
        )
        if tri.empty:
            return pd.DataFrame(
                {
                    "lang": pd.Series([], dtype=object),
                    "n_docs": pd.Series([], dtype="int64"),
                    "rep_sum": pd.Series([], dtype="float64"),
                }
            )
        n = tri.groupby("doc", sort=False).size()
        nd = (
            tri.drop_duplicates(["doc", "c0", "c1", "c2"])
            .groupby("doc", sort=False)
            .size()
        )
        ratio = (n - nd) / n
        lang = df["lang"].reindex(ratio.index)
        out = pd.DataFrame({"lang": lang, "ratio": ratio})
        g = out.groupby("lang", sort=False)["ratio"]
        return pd.DataFrame(
            {
                "n_docs": g.size().astype("int64"),
                "rep_sum": g.apply(lambda s: _math.fsum(s.to_numpy())),
            }
        ).reset_index()

    import math as _math

    from ..shuffle import map_partials

    parts = map_partials(
        f"{sf_dir}/documents.parquet", ["lang", "text"], None, partial
    )
    rows = []
    for lang, g in parts.groupby("lang", sort=True):
        n_docs = int(g["n_docs"].sum())
        rows.append(
            (lang, n_docs, round_duck(_math.fsum(g["rep_sum"]) / n_docs, 4))
        )
    return pd.DataFrame(rows, columns=["lang", "n_docs", "avg_rep"]).astype(
        {"n_docs": "int64"}
    )


def redact_digits_customer(sf_dir: str) -> pd.DataFrame:
    """PII-style redaction: mask every digit in an identifier column and
    report masking stats plus the distinct-pattern count.

    Each map task groups its batch BY THE REDACTED VALUE first, so the
    exchange carries one row per distinct pattern per task —
    pattern-cardinality, not row-cardinality (after redaction the
    pattern space is tiny; that collapse is exactly what redaction is
    for). Vectorized pandas regex kernels; oracle uses the equivalent
    DuckDB regexp_replace/regexp_matches expressions."""
    from .dedup import _dedup_buckets

    nb = _dedup_buckets()

    def partial(batch: pa.Table) -> pd.DataFrame:
        s_all = batch.column("c_name").to_pandas()
        s = s_all.dropna().astype(str)
        d = s.str.count(r"\d").astype("int64")
        df = pd.DataFrame(
            {
                "red": s.str.replace(r"\d", "#", regex=True),
                "n": np.int64(1),
                "rows_with": (d > 0).astype("int64"),
                "digits": d,
                "nullrow": np.int64(0),
            }
        )
        out = (
            df.groupby(["red", "nullrow"], sort=False)
            .agg(n=("n", "sum"), rows_with=("rows_with", "sum"), digits=("digits", "sum"))
            .reset_index()
        )
        n_null = int(s_all.isna().sum())
        if n_null:
            # COUNT(*) counts NULL rows; COUNT(DISTINCT ...) excludes
            # them — carry them as a marker row outside the pattern space
            out = pd.concat(
                [
                    out,
                    pd.DataFrame(
                        [{"red": "", "nullrow": np.int64(1), "n": n_null,
                          "rows_with": 0, "digits": 0}]
                    ),
                ],
                ignore_index=True,
            ).astype({"n": "int64", "rows_with": "int64", "digits": "int64",
                      "nullrow": "int64"})
        out["__bucket"] = _bucket_of_keys(out["red"], nb)
        return out

    def bucket_reduce(df: pd.DataFrame) -> pd.DataFrame:
        # patterns are bucket-partitioned (same red ⇒ same bucket), so
        # each bucket reduces fully to one fixed-width stats row and the
        # global distinct count is the plain sum of per-bucket distincts
        pats = df[df["nullrow"] == 0]
        return pd.DataFrame(
            {
                "n": [int(df["n"].sum())],
                "rows_with": [int(df["rows_with"].sum())],
                "digits": [int(df["digits"].sum())],
                "n_patterns": [int(pats["red"].nunique())],
            }
        )

    from .dedup import _fused_grouped_frames

    parts = _fused_grouped_frames(
        [(f"{sf_dir}/customer.parquet", ["c_name"], None, partial)],
        nb,
        bucket_reduce,
    )
    return pd.DataFrame(
        {
            "n_rows": [int(parts["n"].sum())],
            "rows_with_digits": [int(parts["rows_with"].sum())],
            "digits_masked": [int(parts["digits"].sum())],
            "distinct_redacted": [int(parts["n_patterns"].sum())],
        }
    ).astype("int64")


def _sql_stoplist(lang: str) -> str:
    """The engine's stopword set as a DuckDB list literal (sorted for a
    stable rendering; membership tests are order-independent)."""
    return "[" + ", ".join(f"'{w}'" for w in sorted(STOPWORDS[lang])) + "]"


def _sql_hits(lang: str) -> str:
    return (
        "len(list_filter(words, w -> list_contains("
        + _sql_stoplist(lang)
        + ", w)))"
    )


_QUALITY_SQL = rf"""
    WITH f AS (
        SELECT source,
               LENGTH(text) AS n_chars,
               len(regexp_extract_all(text, '[^\w\s]')) AS punct,
               regexp_extract_all(lower(text), '\w+') AS words
        FROM documents
    ), h AS (
        SELECT source, n_chars, punct, len(words) AS nw,
               {_sql_hits('en')} + {_sql_hits('de')}
             + {_sql_hits('fr')} + {_sql_hits('es')} AS hits
        FROM f
    ), q AS (
        SELECT source,
               ROUND(0.5 * LEAST(n_chars / 500.0, 1.0)
                   + 0.3 * (1.0 - LEAST(punct * 1.0 / GREATEST(n_chars, 1), 1.0))
                   + 0.2 * LEAST((hits * 1.0 / GREATEST(nw, 1)) * 5.0, 1.0),
                   6) AS qs
        FROM h
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(qs), 4) AS avg_quality
    FROM q GROUP BY source ORDER BY source
"""

_LANGID_SQL = rf"""
    WITH f AS (
        SELECT regexp_extract_all(lower(text), '\w+') AS words FROM documents
    ), h AS (
        SELECT {_sql_hits('en')} AS h_en, {_sql_hits('de')} AS h_de,
               {_sql_hits('fr')} AS h_fr, {_sql_hits('es')} AS h_es
        FROM f
    ), p AS (
        -- first-max-wins in the engine's language order (en, de, fr, es)
        SELECT CASE
            WHEN GREATEST(h_en, h_de, h_fr, h_es) = 0 THEN 'unk'
            WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
            WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
            WHEN h_fr >= h_es THEN 'fr'
            ELSE 'es' END AS lang_pred
        FROM h
    )
    SELECT lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM p GROUP BY lang_pred ORDER BY lang_pred
"""


def oov_rate_documents(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Out-of-vocabulary rate per language at vocabulary size k — the
    "how big must the tokenizer vocab be" training question: build the
    exact global top-k vocabulary (existing tie-pinned top-k exchange),
    broadcast it as a closure-captured frozenset, and count OOV tokens
    per language in one second scan with a vectorized ``isin``. The
    second pass's exchange is ≤ langs rows per task. Tokenization is
    the same raw space-split as the vocabulary ops (string_split
    parity, empty tokens included); NULL text/lang rows drop on both
    sides — but the VOCAB itself only conditions on text, matching the
    oracle's two different WHEREs."""
    vocab = frozenset(vocab_top_terms_documents(sf_dir, k=k)["token"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["text", "lang"])
        expl = pd.DataFrame(
            {"lang": df["lang"].astype(str), "tok": df["text"].astype(str).str.split(" ")}
        ).explode("tok")
        oov = ~expl["tok"].isin(vocab)
        out = expl.assign(oov=oov).groupby("lang", as_index=False).agg(
            n=("tok", "size"), n_oov=("oov", "sum")
        )
        return out

    from ..shuffle import map_partials

    parts = map_partials(
        f"{sf_dir}/documents.parquet", ["text", "lang"], None, partial
    )
    out = parts.groupby("lang", as_index=False)[["n", "n_oov"]].sum()
    out = out.sort_values("lang").reset_index(drop=True)
    return pd.DataFrame(
        {
            "lang": out["lang"],
            "n_tokens": out["n"].astype("int64"),
            "n_oov": out["n_oov"].astype("int64"),
            "oov_rate": round_duck(
                out["n_oov"].to_numpy(np.float64)
                * 1.0
                / out["n"].to_numpy(np.float64),
                4,
            ),
        }
    )


def ttr_lang_documents(sf_dir: str) -> pd.DataFrame:
    """Type-token ratio per language — the lexical-diversity corpus
    quality signal (template-generated spam scores low). One exchange:
    per-batch (lang, token, count) partials bucket by TOKEN hash (the
    same (lang, token) pair always co-locates, so per-bucket distincts
    add), each bucket reduces to ≤ langs (distinct, total) rows."""
    from .dedup import _dedup_buckets, _fused_grouped_frames

    nb = _dedup_buckets()

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["text", "lang"])
        expl = pd.DataFrame(
            {"lang": df["lang"].astype(str), "token": df["text"].astype(str).str.split(" ")}
        ).explode("token")
        out = expl.groupby(["lang", "token"], as_index=False).size()
        out = out.rename(columns={"size": "cnt"})
        out["__bucket"] = _bucket_of_keys(out["token"], nb)
        return out

    def bucket_stats(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "token"], as_index=False)["cnt"].sum()
        out = g.groupby("lang", as_index=False).agg(
            types=("token", "size"), toks=("cnt", "sum")
        )
        return out

    parts = _fused_grouped_frames(
        [(f"{sf_dir}/documents.parquet", ["text", "lang"], None, partial)],
        nb,
        bucket_stats,
    )
    out = (
        parts.groupby("lang", as_index=False)[["types", "toks"]]
        .sum()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "lang": out["lang"],
            "n_tokens": out["toks"].astype("int64"),
            "n_types": out["types"].astype("int64"),
            "type_token_ratio": round_duck(
                out["types"].to_numpy(np.float64)
                * 1.0
                / out["toks"].to_numpy(np.float64),
                4,
            ),
        }
    )


def vocabulary_stats_documents(sf_dir: str) -> pd.DataFrame:
    """Global vocabulary shape — hapax rate (share of once-seen tokens,
    the corpus-noise signal) and token-mass coverage of the top-10 /
    top-100 vocabulary (the Zipf head weight): one (token, count)
    exchange; each bucket emits 3 scalar partials PLUS its local
    top-100 (global top-k ⊆ union of bucket top-k), so the driver sees
    ≤ B×100 candidate rows. Coverage shares are tie-order-invariant
    (equal counts at the boundary contribute equal mass)."""
    from .dedup import _dedup_buckets, _fused_grouped_frames

    nb = _dedup_buckets()

    def partial(batch: pa.Table) -> pd.DataFrame:
        text = batch.column("text").to_pandas().dropna().astype(str)
        vc = text.str.split(" ").explode().value_counts()
        out = pd.DataFrame(
            {
                "token": vc.index.to_numpy().astype(str),
                "cnt": vc.to_numpy().astype("int64"),
            }
        )
        out["__bucket"] = _bucket_of_keys(out["token"], nb)
        return out

    def bucket_stats(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", as_index=False)["cnt"].sum()
        top = g.sort_values(
            ["cnt", "token"], ascending=[False, True], kind="stable"
        ).head(100)
        summary = pd.DataFrame(
            {
                "token": [""],
                "cnt": [0],
                "distinct": [len(g)],
                "hapax": [int((g["cnt"] == 1).sum())],
                "mass": [int(g["cnt"].sum())],
            }
        )
        top = top.assign(distinct=0, hapax=0, mass=0)
        return pd.concat([summary, top], ignore_index=True)

    parts = _fused_grouped_frames(
        [(f"{sf_dir}/documents.parquet", ["text"], None, partial)],
        nb,
        bucket_stats,
    )
    summaries = parts[parts["mass"] > 0] if len(parts) else parts
    distinct = int(summaries["distinct"].sum()) if len(summaries) else 0
    hapax = int(summaries["hapax"].sum()) if len(summaries) else 0
    total = int(summaries["mass"].sum()) if len(summaries) else 0
    if total == 0:  # empty corpus: SQL aggregates over zero rows
        return pd.DataFrame(
            {
                "total_tokens": pd.Series([0], dtype="int64"),
                "distinct_tokens": pd.Series([0], dtype="int64"),
                "hapax_tokens": pd.Series([0], dtype="int64"),
                "hapax_rate": [None],
                "coverage_top10": [None],
                "coverage_top100": [None],
            }
        )
    cand = parts[parts["mass"] == 0].sort_values(
        ["cnt", "token"], ascending=[False, True], kind="stable"
    )
    top_cnt = cand["cnt"].to_numpy(np.int64)
    cov10 = int(top_cnt[:10].sum())
    cov100 = int(top_cnt[:100].sum())
    return pd.DataFrame(
        {
            "total_tokens": pd.Series([total], dtype="int64"),
            "distinct_tokens": pd.Series([distinct], dtype="int64"),
            "hapax_tokens": pd.Series([hapax], dtype="int64"),
            "hapax_rate": [float(round_duck(hapax * 1.0 / distinct, 4))],
            "coverage_top10": [float(round_duck(cov10 * 1.0 / total, 4))],
            "coverage_top100": [float(round_duck(cov100 * 1.0 / total, 4))],
        }
    )


def cooccur_top_pairs_documents(
    sf_dir: str, k: int = 20, dense_vocab_max: int = 2048
) -> pd.DataFrame:
    """Top-k co-occurring token pairs (document-level association
    mining — unordered pairs in the SAME document, not the adjacency
    the bigram op counts). Per batch: distinct (doc, token) incidence,
    ONE self-merge per doc expands to pairs (quadratic only in a doc's
    DISTINCT token count — doc-bounded, like shingling), per-pair count
    partials into the tie-pinned top-k exchange. The pair key is the
    '|'-joined token pair so engine and oracle tie-break identically."""
    from .dedup import _dedup_buckets

    nb = _dedup_buckets()

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["text"])
        split = df["text"].astype(str).str.split(" ")
        toks = split.explode()
        # factorize into batch-local SORTED codes so code order == token
        # order, pair in int space (strings only materialize for the
        # ≤ vocab² DISTINCT pairs, not the exploded pair rows)
        codes, uniq = pd.factorize(toks, sort=True)
        expl = pd.DataFrame(
            {
                "doc": np.repeat(np.arange(len(df)), split.str.len()),
                "c": codes,
            }
        ).drop_duplicates()
        v = np.int64(len(uniq))
        if v <= dense_vocab_max:
            # dense-vocab path: one boolean incidence matmul per batch
            # (the user_overlap pattern) — O(docs · V²), no pair rows
            X = np.zeros((len(df), int(v)), dtype=np.int64)
            X[expl["doc"].to_numpy(), expl["c"].to_numpy()] = 1
            M = X.T @ X
            a, b = np.nonzero(np.triu(M, k=1))
            ids = a.astype(np.int64) * v + b
            cnts = M[a, b]
        else:
            # sparse-vocab path: per-doc self-merge (quadratic only in a
            # doc's distinct token count)
            pairs = expl.merge(expl, on="doc")
            pairs = pairs[pairs["c_x"] < pairs["c_y"]]
            vc = (
                pairs["c_x"].to_numpy(np.int64) * v
                + pairs["c_y"].to_numpy(np.int64)
            )
            ids, cnts = np.unique(vc, return_counts=True)
        u = uniq.to_numpy().astype(str)
        out = pd.DataFrame(
            {
                "pair": pd.Series(u[ids // v]) + "|" + pd.Series(u[ids % v]),
                "cnt": cnts.astype("int64"),
            }
        )
        out["__bucket"] = _bucket_of_keys(out["pair"], nb)
        return out

    top = _topk_by_count_fused(
        f"{sf_dir}/documents.parquet", ["text"], partial, "pair", k, nb
    )
    return top


def fertility_lang_documents(sf_dir: str) -> pd.DataFrame:
    """Tokenizer fertility per language — characters per token, the
    standard "how expensive is this language for the tokenizer" metric
    that decides per-language sampling weights. Integer char/token sums
    per (lang, task) — both engines divide the SAME exact integers."""
    from ..shuffle import map_partials

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["text", "lang"])
        text = df["text"].astype(str)
        part = pd.DataFrame(
            {
                "lang": df["lang"].astype(str),
                "chars": text.str.len().to_numpy(np.int64),
                "toks": text.str.split(" ").str.len().to_numpy(np.int64),
            }
        )
        return part.groupby("lang", as_index=False).sum()

    parts = map_partials(
        f"{sf_dir}/documents.parquet", ["text", "lang"], None, partial
    )
    out = (
        parts.groupby("lang", as_index=False)[["chars", "toks"]]
        .sum()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "lang": out["lang"],
            "n_chars": out["chars"].astype("int64"),
            "n_tokens": out["toks"].astype("int64"),
            "chars_per_token": round_duck(
                out["chars"].to_numpy(np.float64)
                * 1.0
                / out["toks"].to_numpy(np.float64),
                4,
            ),
        }
    )


def zipf_slope_documents(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Zipf slope of the vocabulary — the corpus-naturalness diagnostic
    (natural language sits near −1; template spam and shuffled noise
    don't): OLS slope of ln(count) on ln(rank) over the exact top-k
    vocabulary. The distributed part is the tie-pinned top-k exchange
    (both engines rank by count DESC, token ASC, so ranks agree
    exactly); the regression runs on the k-row result with the
    identical closed-form expression tree as the oracle."""
    import math as _math

    top = vocab_top_terms_documents(sf_dir, k=k)
    n = len(top)
    if n < 2:  # a slope needs at least two rank points
        return pd.DataFrame(
            {
                "n_terms": pd.Series([n], dtype="int64"),
                "zipf_slope": [None],
                "zipf_intercept": [None],
            }
        )
    lr = np.log(np.arange(1, n + 1, dtype=np.float64))
    lc = np.log(top["cnt"].to_numpy(np.float64))
    sx = _math.fsum(lr)
    sy = _math.fsum(lc)
    sxx = _math.fsum(lr * lr)
    sxy = _math.fsum(lr * lc)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return pd.DataFrame(
        {
            "n_terms": pd.Series([n], dtype="int64"),
            "zipf_slope": [float(round_duck(slope, 4))],
            "zipf_intercept": [float(round_duck(intercept, 4))],
        }
    )


# PII patterns spelled to mean the same thing in Python re (pandas C
# kernels) and DuckDB RE2: ASCII classes, \b word boundaries, bounded
# quantifiers — no lookaround, no unicode classes.
_PII_PATTERNS = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
)


def pii_census_documents(sf_dir: str) -> pd.DataFrame:
    """PII census — the data-governance gate a corpus must pass before
    release: per pattern (email / phone / SSN-like), how many documents
    match and how many total non-overlapping hits. One scan, compiled
    regexes through pandas' C string kernels, 3-row partials per task
    (pattern-vocabulary-bounded, shuffle-free). Leftmost
    non-overlapping match counting is the shared semantics of
    ``str.count`` and DuckDB ``regexp_extract_all``."""
    from ..shuffle import map_partials

    def partial(batch: pa.Table) -> pd.DataFrame:
        t = batch.column("text").to_pandas().dropna()
        rows = []
        for name, pat in _PII_PATTERNS:
            if len(t) == 0:
                rows.append((name, 0, 0))
                continue
            hits = t.str.count(pat)
            rows.append(
                (name, int((hits > 0).sum()), int(hits.sum()))
            )
        return pd.DataFrame(rows, columns=["pattern", "n_docs", "n_hits"])

    parts = map_partials(f"{sf_dir}/documents.parquet", ["text"], None, partial)
    out = (
        parts.groupby("pattern", as_index=False)[["n_docs", "n_hits"]]
        .sum()
        .sort_values("pattern")
        .reset_index(drop=True)
    )
    return out.astype({"n_docs": "int64", "n_hits": "int64"})


def dup_lines_documents(sf_dir: str) -> pd.DataFrame:
    """Gopher-style LINE-level repetition quality gate (the companion
    of ``repetition_documents``' duplicate-trigram fraction): per
    document, the fraction of its newline-split lines that are repeats
    (1 − distinct/total, empty lines included — both engines split
    identically on the literal LF), then three corpus numbers: docs
    scanned, docs over the 30% Gopher threshold, and the mean fraction.
    Entirely in-task (per-doc stats never exchange): each scan task
    folds to (n_docs, n_flagged, fsum of fractions). Every fraction is
    one exact-int division, so the threshold comparison can never race;
    the driver's fsum-of-fsums differs from the oracle's global fsum
    only by composition ulps (≪ 6dp)."""
    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["doc_id", "text"])
        if len(df) == 0:
            return pd.DataFrame(
                {"n": [0], "flagged": [0], "fsum": [0.0]}
            )
        # grouped by doc_id like the oracle (premise: doc_id unique,
        # the same premise the curation/dedup family documents)
        lists = df.set_index("doc_id")["text"].str.split("\n")
        nl = lists.str.len().to_numpy(np.int64)
        ex = lists.explode()
        nd = (
            ex.groupby(level=0)
            .nunique()
            .reindex(lists.index, fill_value=0)
            .to_numpy(np.int64)
        )
        frac = (nl - nd).astype(np.float64) / nl.astype(np.float64)
        import math

        return pd.DataFrame(
            {
                "n": [int(len(df))],
                "flagged": [int((frac > 0.3).sum())],
                "fsum": [math.fsum(frac.tolist())],
            }
        )

    from ..shuffle import map_partials

    parts = map_partials(
        f"{sf_dir}/documents.parquet", ["doc_id", "text"], None, partial
    )
    import math

    n = int(parts["n"].sum())
    if n == 0:
        return pd.DataFrame(
            {
                "n_docs": pd.Series([0], dtype="int64"),
                "n_flagged": pd.Series([None], dtype="float64"),
                "mean_dup_line_frac": pd.Series([None], dtype="float64"),
            }
        )
    return pd.DataFrame(
        {
            "n_docs": pd.Series([n], dtype="int64"),
            "n_flagged": pd.Series(
                [int(parts["flagged"].sum())], dtype="int64"
            ),
            "mean_dup_line_frac": [
                round_duck(math.fsum(float(x) for x in parts["fsum"]) / n, 6)
            ],
        }
    )


def dup_paragraphs_documents(
    sf_dir: str, num_buckets: int | None = None
) -> pd.DataFrame:
    """Cross-document duplicate-PARAGRAPH census — the boilerplate
    detector between whole-doc dedup (too coarse for shared headers /
    footers) and 13-gram decontamination (too fine for "how much exact
    boilerplate does the corpus carry"): split every document on blank
    lines, count non-empty paragraphs that appear in ≥ 2 DISTINCT
    documents and the total rows they account for.

    Shape: paragraphs hash to 8 bytes in the scan task (pinned siphash
    — text never enters the exchange), per-batch ``(phash, doc_id)``
    occurrence partials bucket by paragraph hash, each bucket counts
    distinct docs per paragraph and folds to four integers. 64-bit
    collisions are the documented approximation (same budget as the
    exact-dedup family; a collision needs ~5e9 distinct paragraphs for
    even-odds)."""
    from ._tokens import token_hashes
    from .dedup import _dedup_buckets, _fused_grouped_frames

    nb = num_buckets or _dedup_buckets()

    def par_partials(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["doc_id", "text"])
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "ph": pd.Series([], dtype="uint64"),
                    "doc": pd.Series([], dtype="int64"),
                    "occ": pd.Series([], dtype="int64"),
                    "__bucket": pd.Series([], dtype="int32"),
                }
            )
        ex = df.set_index("doc_id")["text"].str.split("\n\n").explode()
        ex = ex[ex != ""].dropna()
        part = (
            pd.DataFrame(
                {
                    "ph": token_hashes(ex.reset_index(drop=True)),
                    "doc": ex.index.to_numpy(np.int64),
                }
            )
            .groupby(["ph", "doc"], as_index=False)
            .size()
            .rename(columns={"size": "occ"})
        )
        return pd.DataFrame(
            {
                "ph": part["ph"].to_numpy(np.uint64),
                "doc": part["doc"].to_numpy(np.int64),
                "occ": part["occ"].to_numpy(np.int64),
                "__bucket": (
                    part["ph"].to_numpy(np.uint64) % np.uint64(nb)
                ).astype(np.int32),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                [[0, 0, 0, 0]],
                columns=["occ", "nd", "shared", "shared_occ"],
            )
        g = df.groupby("ph").agg(
            occ=("occ", "sum"), docs=("doc", "nunique")
        )
        shared = g["docs"] >= 2
        return pd.DataFrame(
            [
                [
                    int(g["occ"].sum()),
                    int(len(g)),
                    int(shared.sum()),
                    int(g.loc[shared, "occ"].sum()),
                ]
            ],
            columns=["occ", "nd", "shared", "shared_occ"],
        )

    parts = _fused_grouped_frames(
        [(f"{sf_dir}/documents.parquet", ["doc_id", "text"], None, par_partials)],
        nb,
        fold,
    )
    return pd.DataFrame(
        [
            [
                int(parts["occ"].sum()),
                int(parts["nd"].sum()),
                int(parts["shared"].sum()),
                int(parts["shared_occ"].sum()),
            ]
        ],
        columns=[
            "n_paragraphs",
            "n_distinct_paragraphs",
            "n_shared_paragraphs",
            "shared_occurrences",
        ],
    ).astype("int64")


# the oracle is GENERATED from the same pattern tuple the engine
# compiles, so the two sides can never drift apart on pattern text
_PII_ORACLE = (
    "WITH d AS (SELECT text FROM documents WHERE text IS NOT NULL) "
    "SELECT * FROM ("
    + " UNION ALL ".join(
        f"SELECT '{name}' AS pattern, "
        f"CAST(COUNT(*) FILTER (WHERE regexp_matches(text, '{pat}')) "
        f"AS BIGINT) AS n_docs, "
        f"CAST(COALESCE(SUM(len(regexp_extract_all(text, '{pat}'))), 0) "
        f"AS BIGINT) AS n_hits FROM d"
        for name, pat in _PII_PATTERNS
    )
    + ") ORDER BY pattern"
)


def tfidf_top_terms_documents(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Corpus TF-IDF vocabulary: top-k terms by tf(term) · ln(N/df(term))
    — the retrieval/feature-selection ranking that the raw TF and DF
    vocabularies above each miss half of (TF alone surfaces stopwords,
    DF alone ignores repetition). ONE scan emits BOTH partials per
    distinct token per batch (term frequency via value_counts, document
    frequency via in-batch (doc, token) dedup — documents never span
    batches, so per-batch doc-distinct counts sum exactly); they ride
    one token-hash bucket exchange, and each bucket scores its exact
    (tf, df) totals and keeps a local top-k — valid because a token
    lives in exactly one bucket. N (docs with text) comes from parquet
    footer null-count statistics — zero data read — with a count-scan
    fallback; the score is built from exact integers with the identical
    expression tree on both engines (CAST(tf) · ln(CAST(N)/CAST(df))),
    so the double ranking and its token-asc tie-break cannot drift."""
    from ..io import footer_nonnull_count, list_parquet_files
    from ..shuffle import map_partials
    from .dedup import _dedup_buckets, _fused_grouped_frames

    path = f"{sf_dir}/documents.parquet"
    nb = _dedup_buckets()

    n_docs = footer_nonnull_count(list_parquet_files(path), "text")
    if n_docs is None:  # footers lack null counts: one count-only scan

        def count_partial(batch: pa.Table) -> pd.DataFrame:
            return pd.DataFrame(
                {"n": [int(batch.column("text").to_pandas().notna().sum())]}
            )

        n_docs = int(
            map_partials(path, ["text"], None, count_partial)["n"].sum()
        )

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["text"])
        toks = df["text"].astype(str).str.split(" ")
        flat = pd.DataFrame(
            {
                "d": np.repeat(
                    df["doc_id"].to_numpy(), toks.str.len().to_numpy()
                ),
                "token": toks.explode().to_numpy().astype(str),
            }
        )
        tf = flat["token"].value_counts()
        dfreq = flat.drop_duplicates()["token"].value_counts()
        out = pd.DataFrame(
            {
                "token": tf.index.to_numpy().astype(str),
                "tf": tf.to_numpy().astype("int64"),
                "df": dfreq.reindex(tf.index).to_numpy().astype("int64"),
            }
        )
        out["__bucket"] = _bucket_of_keys(out["token"], nb)
        return out

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("token", as_index=False).agg(
            tf=("tf", "sum"), df=("df", "sum")
        )
        tot["tfidf"] = tot["tf"].to_numpy(np.float64) * np.log(
            np.float64(n_docs) / tot["df"].to_numpy(np.float64)
        )
        return tot.sort_values(
            ["tfidf", "token"], ascending=[False, True], kind="stable"
        ).head(k)

    cand = _fused_grouped_frames(
        [(path, ["doc_id", "text"], None, partial)], nb, bucket_topk
    )
    if len(cand) == 0:
        return pd.DataFrame(
            {
                "token": pd.Series([], dtype="object"),
                "tf": pd.Series([], dtype="int64"),
                "df": pd.Series([], dtype="int64"),
                "tfidf": pd.Series([], dtype="float64"),
            }
        )
    top = cand.sort_values(
        ["tfidf", "token"], ascending=[False, True], kind="stable"
    ).head(k)
    top["tfidf"] = round_duck(top["tfidf"].to_numpy(np.float64), 6)
    return top[["token", "tf", "df", "tfidf"]].astype(
        {"tf": "int64", "df": "int64"}
    ).reset_index(drop=True)


def nfc_census_documents(sf_dir: str) -> pd.DataFrame:
    """Unicode NFC normalization census — the canonicalization gate a
    multilingual corpus passes before dedup/tokenization (decomposed
    sequences like ``e`` + U+0301 read as distinct strings from their
    composed forms, splitting vocabularies and defeating exact dedup).

    The synthetic corpus is pure ASCII, so the op derives a
    deterministically non-NFC view IN the scan task (even doc_ids get
    every ``e`` replaced by ``e`` + COMBINING ACUTE -- mirrored verbatim
    in the SQL oracle), then runs a REAL normalization kernel per
    document. Arrow 16's ``utf8_normalize(form="NFC")`` performs no
    canonical composition (verified: an NFD round-trip stays
    decomposed), so the kernel is CPython's ``unicodedata.normalize``
    (UCD-conformant, C-implemented per string) -- the same composition
    DuckDB's utf8proc ``nfc_normalize`` applies. Per source: docs
    scanned, docs whose text is not NFC-canonical, and the total
    codepoint shrinkage under NFC. Per-task partials are source-sized;
    text never shuffles."""
    from ..shuffle import map_partials

    comb = "e" + chr(0x301)

    def partial(batch: pa.Table) -> pd.DataFrame:
        import unicodedata

        t = batch.column("text").to_pandas()
        even = (batch.column("doc_id").to_numpy(zero_copy_only=False) % 2) == 0
        derived = t.where(~even, t.str.replace("e", comb, regex=False))
        nfc = derived.map(
            lambda s: unicodedata.normalize("NFC", s) if isinstance(s, str) else s
        )
        changed = derived.notna() & (derived != nfc)
        delta = (
            (derived.str.len() - nfc.str.len()).fillna(0).astype("int64")
        )
        df = pd.DataFrame(
            {
                "source": batch.column("source").to_pandas(),
                "scanned": t.notna().astype("int64"),
                "changed": changed.astype("int64"),
                "delta": delta,
            }
        )
        return (
            df.groupby("source", sort=False)
            .agg(
                n_docs=("scanned", "sum"),
                nonnfc_docs=("changed", "sum"),
                codepoint_delta=("delta", "sum"),
            )
            .reset_index()
        )

    parts = map_partials(
        f"{sf_dir}/documents.parquet", ["doc_id", "text", "source"], None, partial
    )
    out = (
        parts.groupby("source", as_index=False)[
            ["n_docs", "nonnfc_docs", "codepoint_delta"]
        ]
        .sum()
        .sort_values("source")
        .reset_index(drop=True)
    )
    return out.astype(
        {"n_docs": "int64", "nonnfc_docs": "int64", "codepoint_delta": "int64"}
    )


_NFC_CENSUS_SQL = """
    WITH p AS (
        SELECT source,
               CASE WHEN doc_id % 2 = 0
                    THEN replace(text, 'e', 'e' || chr(769)) ELSE text
               END AS t
        FROM documents
    )
    SELECT source,
           CAST(COUNT(t) AS BIGINT) AS n_docs,
           CAST(COALESCE(SUM(CASE WHEN t <> nfc_normalize(t) THEN 1 ELSE 0 END),
                         0) AS BIGINT) AS nonnfc_docs,
           CAST(COALESCE(SUM(length(t) - length(nfc_normalize(t))), 0)
                AS BIGINT) AS codepoint_delta
    FROM p GROUP BY source ORDER BY source
"""


_URL_RE = r"https?://[^\s]+"
_HTTPS_RE = r"https://[^\s]+"


def url_census_documents(sf_dir: str) -> pd.DataFrame:
    """URL census — the link-density / scheme-mix profile used for web
    corpus filtering. Both engines run RE2 (Arrow
    ``count_substring_regex`` vs DuckDB ``regexp_extract_all``) with the
    identical pattern, so leftmost non-overlapping counting matches
    exactly. The ASCII corpus carries no URLs, so the scan task derives
    a deterministic linkful view (two fixed token→URL rewrites, mirrored
    verbatim in the oracle) and censuses THAT — the regex machinery is
    exercised on data-dependent counts. Per source: docs containing a
    URL, total URLs, https URLs."""
    from ..shuffle import map_partials

    def partial(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        txt = pc.replace_substring(
            batch.column("text"), pattern="spark", replacement="https://spark.example.org/x"
        )
        txt = pc.replace_substring(
            txt, pattern="window", replacement="http://window.example.net/y?a=1"
        )
        n_urls = pc.fill_null(pc.count_substring_regex(txt, pattern=_URL_RE), 0)
        n_https = pc.fill_null(pc.count_substring_regex(txt, pattern=_HTTPS_RE), 0)
        df = pd.DataFrame(
            {
                "source": batch.column("source").to_pandas(),
                "with_url": (n_urls.to_pandas() > 0).astype("int64"),
                "urls": n_urls.to_pandas().astype("int64"),
                "https": n_https.to_pandas().astype("int64"),
            }
        )
        return (
            df.groupby("source", sort=False)
            .agg(
                docs_with_url=("with_url", "sum"),
                total_urls=("urls", "sum"),
                https_urls=("https", "sum"),
            )
            .reset_index()
        )

    parts = map_partials(
        f"{sf_dir}/documents.parquet", ["text", "source"], None, partial
    )
    out = (
        parts.groupby("source", as_index=False)[
            ["docs_with_url", "total_urls", "https_urls"]
        ]
        .sum()
        .sort_values("source")
        .reset_index(drop=True)
    )
    return out.astype(
        {"docs_with_url": "int64", "total_urls": "int64", "https_urls": "int64"}
    )


_URL_CENSUS_SQL = r"""
    WITH p AS (
        SELECT source,
               replace(replace(text, 'spark', 'https://spark.example.org/x'),
                       'window', 'http://window.example.net/y?a=1') AS t
        FROM documents WHERE text IS NOT NULL
    )
    SELECT source,
           CAST(SUM(CASE WHEN len(regexp_extract_all(t, 'https?://[^\s]+')) > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_url,
           CAST(SUM(len(regexp_extract_all(t, 'https?://[^\s]+')))
                AS BIGINT) AS total_urls,
           CAST(SUM(len(regexp_extract_all(t, 'https://[^\s]+')))
                AS BIGINT) AS https_urls
    FROM p GROUP BY source ORDER BY source
"""


QUERIES = {
    "pii_census_documents": pii_census_documents,
    "text_stats_documents": text_stats_documents,
    "token_counts_documents": token_counts_documents,
    "langid_documents": langid_documents,
    "quality_documents": quality_documents,
    "fingerprint_documents": fingerprint_documents,
    "vocab_top_terms_documents": vocab_top_terms_documents,
    "sample_documents_hash": sample_documents_hash,
    "redact_digits_customer": redact_digits_customer,
    "heavy_hitter_terms_documents": heavy_hitter_terms_documents,
    "bigram_top_terms_documents": bigram_top_terms_documents,
    "repetition_documents": repetition_documents,
    "stratified_sample_documents": stratified_sample_documents,
    "doc_freq_top_terms_documents": doc_freq_top_terms_documents,
    "unigram_logprob_documents": unigram_logprob_documents,
    "oov_rate_documents": oov_rate_documents,
    "ttr_lang_documents": ttr_lang_documents,
    "vocabulary_stats_documents": vocabulary_stats_documents,
    "zipf_slope_documents": zipf_slope_documents,
    "cooccur_top_pairs_documents": cooccur_top_pairs_documents,
    "fertility_lang_documents": fertility_lang_documents,
    "dup_lines_documents": dup_lines_documents,
    "dup_paragraphs_documents": dup_paragraphs_documents,
    "tfidf_top_terms_documents": tfidf_top_terms_documents,
    "nfc_census_documents": nfc_census_documents,
    "url_census_documents": url_census_documents,
}

ORACLE_SQL = {
    "nfc_census_documents": _NFC_CENSUS_SQL,
    "url_census_documents": _URL_CENSUS_SQL,
    "tfidf_top_terms_documents": """
        WITH nd AS (
            SELECT COUNT(*) AS n FROM documents WHERE text IS NOT NULL
        ),
        toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents WHERE text IS NOT NULL
        ),
        tf AS (SELECT token, COUNT(*) AS tf FROM toks GROUP BY token),
        dfq AS (
            SELECT token, COUNT(*) AS df
            FROM (SELECT DISTINCT doc_id, token FROM toks) GROUP BY token
        )
        SELECT tf.token, CAST(tf.tf AS BIGINT) AS tf,
               CAST(dfq.df AS BIGINT) AS df,
               ROUND(CAST(tf.tf AS DOUBLE)
                     * ln(CAST(nd.n AS DOUBLE) / CAST(dfq.df AS DOUBLE)), 6)
                   AS tfidf
        FROM tf JOIN dfq USING (token), nd
        ORDER BY CAST(tf.tf AS DOUBLE)
                 * ln(CAST(nd.n AS DOUBLE) / CAST(dfq.df AS DOUBLE)) DESC,
                 tf.token ASC
        LIMIT 20
    """,
    "pii_census_documents": _PII_ORACLE,
    "dup_lines_documents": """
        WITH l AS (
            SELECT doc_id, unnest(string_split(text, chr(10))) AS line
            FROM documents
            WHERE text IS NOT NULL AND doc_id IS NOT NULL
        ),
        d AS (
            SELECT doc_id, COUNT(*) AS nl, COUNT(DISTINCT line) AS nd
            FROM l GROUP BY doc_id
        ),
        f AS (
            SELECT CAST(nl - nd AS DOUBLE) / CAST(nl AS DOUBLE) AS frac
            FROM d
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(*) FILTER (WHERE frac > 0.3) AS BIGINT)
                   AS n_flagged,
               ROUND(fsum(frac) / COUNT(*), 6) AS mean_dup_line_frac
        FROM f
    """,
    "dup_paragraphs_documents": """
        WITH p AS (
            SELECT doc_id,
                   unnest(string_split(text, chr(10) || chr(10))) AS par
            FROM documents
            WHERE text IS NOT NULL AND doc_id IS NOT NULL
        ),
        q AS (SELECT doc_id, par FROM p WHERE par <> ''),
        g AS (
            SELECT par, COUNT(*) AS occ, COUNT(DISTINCT doc_id) AS nd
            FROM q GROUP BY par
        )
        SELECT CAST(COALESCE(SUM(occ), 0) AS BIGINT) AS n_paragraphs,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_paragraphs,
               CAST(COUNT(*) FILTER (WHERE nd >= 2) AS BIGINT)
                   AS n_shared_paragraphs,
               CAST(COALESCE(SUM(occ) FILTER (WHERE nd >= 2), 0)
                    AS BIGINT) AS shared_occurrences
        FROM g
    """,
    "fertility_lang_documents": """
        SELECT lang,
               CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars,
               CAST(SUM(LENGTH(string_split(text, ' '))) AS BIGINT)
                   AS n_tokens,
               ROUND(SUM(LENGTH(text)) * 1.0
                     / SUM(LENGTH(string_split(text, ' '))), 4)
                   AS chars_per_token
        FROM documents
        WHERE text IS NOT NULL AND lang IS NOT NULL
        GROUP BY lang ORDER BY lang
    """,
    "cooccur_top_pairs_documents": """
        WITH d AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents WHERE text IS NOT NULL
        ),
        u AS (SELECT DISTINCT doc_id, tok FROM d),
        p AS (
            SELECT a.tok || '|' || b.tok AS pair, COUNT(*) AS cnt
            FROM u a JOIN u b
              ON a.doc_id = b.doc_id AND a.tok < b.tok
            GROUP BY 1
        )
        SELECT pair, CAST(cnt AS BIGINT) AS cnt
        FROM p ORDER BY cnt DESC, pair LIMIT 20
    """,
    "zipf_slope_documents": """
        WITH c AS (
            SELECT tok, COUNT(*) AS n
            FROM (
                SELECT unnest(string_split(text, ' ')) AS tok
                FROM documents WHERE text IS NOT NULL
            )
            GROUP BY tok ORDER BY n DESC, tok LIMIT 100
        ),
        r AS (
            SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok)
                           AS DOUBLE)) AS lr,
                   ln(CAST(n AS DOUBLE)) AS lc
            FROM c
        ),
        s AS (
            SELECT COUNT(*) AS k, fsum(lr) AS sx, fsum(lc) AS sy,
                   fsum(lr * lr) AS sxx, fsum(lr * lc) AS sxy
            FROM r
        )
        SELECT CAST(k AS BIGINT) AS n_terms,
               ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 4)
                   AS zipf_slope,
               ROUND((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx)
                     / k, 4) AS zipf_intercept
        FROM s
    """,
    "oov_rate_documents": """
        WITH t AS (
            SELECT lang, unnest(string_split(text, ' ')) AS tok
            FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
        ),
        v AS (
            SELECT tok FROM (
                SELECT tok, COUNT(*) AS c
                FROM (
                    SELECT unnest(string_split(text, ' ')) AS tok
                    FROM documents WHERE text IS NOT NULL
                )
                GROUP BY tok ORDER BY c DESC, tok LIMIT 100
            )
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) FILTER (
                   WHERE tok NOT IN (SELECT tok FROM v)) AS BIGINT) AS n_oov,
               ROUND(COUNT(*) FILTER (WHERE tok NOT IN (SELECT tok FROM v))
                     * 1.0 / COUNT(*), 4) AS oov_rate
        FROM t GROUP BY lang ORDER BY lang
    """,
    "ttr_lang_documents": """
        WITH t AS (
            SELECT lang, unnest(string_split(text, ' ')) AS tok
            FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_types,
               ROUND(COUNT(DISTINCT tok) * 1.0 / COUNT(*), 4)
                   AS type_token_ratio
        FROM t GROUP BY lang ORDER BY lang
    """,
    "vocabulary_stats_documents": """
        WITH c AS (
            SELECT tok, COUNT(*) AS n
            FROM (
                SELECT unnest(string_split(text, ' ')) AS tok
                FROM documents WHERE text IS NOT NULL
            )
            GROUP BY tok
        ),
        r AS (
            SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rn
            FROM c
        )
        SELECT CAST(SUM(n) AS BIGINT) AS total_tokens,
               CAST(COUNT(*) AS BIGINT) AS distinct_tokens,
               CAST(COUNT(*) FILTER (WHERE n = 1) AS BIGINT) AS hapax_tokens,
               ROUND(COUNT(*) FILTER (WHERE n = 1) * 1.0 / COUNT(*), 4)
                   AS hapax_rate,
               ROUND(SUM(n) FILTER (WHERE rn <= 10) * 1.0 / SUM(n), 4)
                   AS coverage_top10,
               ROUND(SUM(n) FILTER (WHERE rn <= 100) * 1.0 / SUM(n), 4)
                   AS coverage_top100
        FROM r
    """,
    "unigram_logprob_documents": """
        WITH toks AS (
            SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
            FROM documents WHERE text IS NOT NULL
        ),
        tf AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token),
        tot AS (SELECT COUNT(*) AS t FROM toks),
        doc_lp AS (
            SELECT toks.doc_id, MIN(toks.lang) AS lang,
                   AVG(LN(tf.c * 1.0 / tot.t)) AS lp
            FROM toks JOIN tf USING (token) CROSS JOIN tot
            GROUP BY toks.doc_id
        )
        SELECT lang, COUNT(*) AS n_docs, ROUND(AVG(lp), 4) AS avg_logprob
        FROM doc_lp
        WHERE lang IS NOT NULL
        GROUP BY lang ORDER BY lang
    """,
    "stratified_sample_documents": """
        WITH r AS (
            SELECT lang, n_chars,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rk,
                   COUNT(*) OVER (PARTITION BY lang) AS n
            FROM documents
            WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        )
        SELECT lang, COUNT(*) AS n_sampled,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM r WHERE rk <= CEIL(n * 0.1)
        GROUP BY lang ORDER BY lang
    """,
    "doc_freq_top_terms_documents": """
        WITH toks AS (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents WHERE text IS NOT NULL
        )
        SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM toks GROUP BY token
        ORDER BY cnt DESC, token LIMIT 25
    """,
    # NOTE: DuckDB SUM(int) returns HUGEINT which pandas renders as
    # float64 — every integer sum must be CAST AS BIGINT so the driver's
    # value-hash sees the same int64 dtype the engine emits.
    "text_stats_documents": """
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)
                    AS BIGINT) AS sum_tokens,
               ROUND(SUM(LENGTH(text)) * 1.0 / COUNT(*), 4) AS avg_chars
        FROM documents GROUP BY lang ORDER BY lang
    """,
    "token_counts_documents": r"""
        SELECT CAST(SUM(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)
                    AS BIGINT) AS total_ws_tokens,
               CAST(SUM(len(regexp_extract_all(text, '\w+|[^\w\s]')))
                    AS BIGINT) AS total_re_tokens,
               CAST(SUM(len(regexp_extract_all(text, '[^\w\s]')))
                    AS BIGINT) AS total_punct_chars
        FROM documents
    """,
    # quality / langid: the heuristics are deliberately SQL-expressible
    # (DuckDB list lambdas over regexp-extracted words); per-doc rounding
    # uses half-away-from-zero on both sides (round_duck <-> ROUND) and
    # arithmetic is written in the engine's evaluation order.
    "quality_documents": _QUALITY_SQL,
    "langid_documents": _LANGID_SQL,
    # fingerprint: pinned-siphash rolling hash, not SQL-expressible
    # vocab: documents.text is single-space separated, so string_split on
    # ' ' and the engine's pandas split produce identical token streams.
    "vocab_top_terms_documents": """
        SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
        ORDER BY cnt DESC, token ASC
        LIMIT 25
    """,
    "sample_documents_hash": """
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_sampled,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE (CAST(doc_id AS UBIGINT) * 2654435761) % 4294967296 % 100 < 10
        GROUP BY lang ORDER BY lang
    """,
    "repetition_documents": """
        WITH toks AS (
            SELECT doc_id, lang,
                   generate_subscripts(string_split(text, ' '), 1) AS i,
                   unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        tri AS (
            SELECT a.doc_id, a.lang,
                   a.tok || ' ' || b.tok || ' ' || c.tok AS tg
            FROM toks a
            JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
            JOIN toks c ON a.doc_id = c.doc_id AND c.i = a.i + 2
        ),
        per_doc AS (
            SELECT doc_id, lang, COUNT(*) AS n, COUNT(DISTINCT tg) AS nd
            FROM tri GROUP BY doc_id, lang
        )
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               ROUND(AVG((n - nd) * 1.0 / n), 4) AS avg_rep
        FROM per_doc GROUP BY lang ORDER BY lang
    """,
    "bigram_top_terms_documents": """
        WITH toks AS (
            SELECT doc_id,
                   generate_subscripts(string_split(text, ' '), 1) AS i,
                   unnest(string_split(text, ' ')) AS tok
            FROM documents
        )
        SELECT a.tok || ' ' || b.tok AS bigram, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        GROUP BY bigram ORDER BY cnt DESC, bigram ASC LIMIT 25
    """,
    "redact_digits_customer": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN regexp_matches(c_name, '[0-9]')
                        THEN 1 ELSE 0 END) AS BIGINT) AS rows_with_digits,
               CAST(SUM(LENGTH(c_name)
                        - LENGTH(regexp_replace(c_name, '[0-9]', '', 'g')))
                    AS BIGINT) AS digits_masked,
               CAST(COUNT(DISTINCT regexp_replace(c_name, '[0-9]', '#', 'g'))
                    AS BIGINT) AS distinct_redacted
        FROM customer
    """,
}
