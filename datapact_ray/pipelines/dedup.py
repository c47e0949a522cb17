"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

All are Ray-Data-first: a stateless/actor ``map_batches`` stage emits
compact per-doc artifacts (hashes / signatures / band keys), ONE
``groupby`` shuffle co-locates collision candidates, and per-group
verification is vectorized. The wide ``text`` column never enters a
shuffle — only fixed-width signatures do. At 10^12-doc scale the
signature rows are the only all-to-all traffic; candidate-pair
verification stays bucket-local.

Algorithms from public literature: MinHash (Broder 1997), LSH banding
(Leskovec/Rajaraman/Ullman ch.3), SimHash (Charikar 2002).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..io import read_table

_MERSENNE = (1 << 61) - 1


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """crc32 hashes of word k-gram shingles (deterministic)."""
    toks = text.split()
    if len(toks) < k:
        return np.array([zlib.crc32(" ".join(toks).encode())], dtype=np.uint64)
    return np.unique(
        np.array(
            [
                zlib.crc32(" ".join(toks[i : i + k]).encode())
                for i in range(len(toks) - k + 1)
            ],
            dtype=np.uint64,
        )
    )


class MinHasher:
    """Per-doc MinHash signature + LSH band emission.

    ``__init__`` draws the (seeded, fixed) universal-hash coefficients
    once per actor; ``__call__`` emits ``bands`` rows per doc:
    ``(band_id, band_key, doc_id, sig, shingles)``.
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3):
        rng = np.random.default_rng(1234)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k

    def signature(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        sh = _shingle_hashes(text, self.shingle_k)
        # (a*x + b) mod p, min over shingles, vectorized num_perm × |sh|
        prod = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return prod.min(axis=1), sh

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        rows: dict[str, list] = {
            "band_id": [], "band_key": [], "doc_id": [], "sig": [], "shingles": [],
        }
        for doc_id, text in zip(df["doc_id"], df["text"].astype(str)):
            sig, sh = self.signature(text)
            sig_b = sig.tobytes()
            sh_b = sh.tobytes()
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                rows["band_id"].append(band)
                rows["band_key"].append(zlib.crc32(chunk.tobytes()))
                rows["doc_id"].append(doc_id)
                rows["sig"].append(sig_b)
                rows["shingles"].append(sh_b)
        return pd.DataFrame(rows)


def _candidate_pairs_from_band(group: pd.DataFrame, max_group: int = 200) -> pd.DataFrame:
    """All pairs within one (band_id, band_key) collision group, with the
    MinHash Jaccard estimate and the exact shingle Jaccard."""
    out = {"a": [], "b": [], "est_jaccard": [], "jaccard": []}
    g = group.drop_duplicates("doc_id").head(max_group)
    docs = list(
        zip(
            g["doc_id"],
            (np.frombuffer(s, dtype=np.uint64) for s in g["sig"]),
            (np.frombuffer(s, dtype=np.uint64) for s in g["shingles"]),
        )
    )
    docs = [(d, s, sh) for d, s, sh in docs]
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            da, sa, sha = docs[i]
            db, sb, shb = docs[j]
            a, b = (da, db) if da < db else (db, da)
            est = float((sa == sb).mean())
            inter = len(np.intersect1d(sha, shb, assume_unique=True))
            union = len(sha) + len(shb) - inter
            out["a"].append(a)
            out["b"].append(b)
            out["est_jaccard"].append(est)
            out["jaccard"].append(inter / union if union else 1.0)
    return pd.DataFrame(out)


def minhash_candidate_pairs(sf_dir: str, threshold: float = 0.5):
    """MinHash→LSH→verify pipeline; returns the deduped candidate-pair
    DataFrame with estimated and exact Jaccard."""
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    banded = ds.map_batches(
        MinHasher,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=2048,
        concurrency=(1, 8),
    )

    def pairs_fn(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "est_jaccard": [], "jaccard": []})
        return _candidate_pairs_from_band(g)

    pairs = banded.groupby(["band_id", "band_key"]).map_groups(
        pairs_fn, batch_format="pandas"
    )

    def first_of_pair(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    deduped = pairs.groupby(["a", "b"]).map_groups(first_of_pair, batch_format="pandas")
    df = deduped.to_pandas()
    return df[df["jaccard"] >= 0.0].reset_index(drop=True)


def minhash_dedup_documents(sf_dir: str) -> pd.DataFrame:
    """Rows-only summary of the MinHash near-dup pipeline at τ=0.5."""
    df = minhash_candidate_pairs(sf_dir)
    dup = df[df["jaccard"] >= 0.5]
    dup_docs = set(dup["a"]).union(dup["b"]) if len(dup) else set()
    return pd.DataFrame(
        {
            "candidate_pairs": [len(df)],
            "dup_pairs": [len(dup)],
            "dup_docs": [len(dup_docs)],
        }
    )


def ngram_jaccard_documents(sf_dir: str, threshold: float = 0.3) -> pd.DataFrame:
    """Exact n-gram Jaccard over LSH candidates (rows-only); reports the
    verified pair count at the threshold plus estimator fidelity."""
    df = minhash_candidate_pairs(sf_dir)
    verified = df[df["jaccard"] >= threshold]
    err = (
        float((df["est_jaccard"] - df["jaccard"]).abs().mean()) if len(df) else 0.0
    )
    return pd.DataFrame(
        {
            "candidate_pairs": [len(df)],
            "verified_pairs": [len(verified)],
            "mean_estimator_error": [round(err, 4)],
        }
    )


class SimHasher:
    """64-bit SimHash per doc + 4×16-bit band blocking for Hamming≤3
    search (pigeonhole: any pair within distance 3 shares ≥1 band)."""

    def __init__(self, bands: int = 4):
        self.bands = bands

    def simhash(self, text: str) -> np.uint64:
        toks = text.split()
        if not toks:
            return np.uint64(0)
        hs = np.array([zlib.crc32(t.encode()) for t in toks], dtype=np.uint64)
        hs = hs | (hs << np.uint64(32))  # widen to 64 bits deterministically
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        v = (2 * bits - 1).sum(axis=0)
        out = np.uint64(0)
        for k in np.nonzero(v > 0)[0]:
            out |= np.uint64(1) << np.uint64(k)
        return out

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        rows = {"band_id": [], "band_key": [], "doc_id": [], "simhash": []}
        width = 64 // self.bands
        mask = np.uint64((1 << width) - 1)
        for doc_id, text in zip(df["doc_id"], df["text"].astype(str)):
            h = self.simhash(text)
            for band in range(self.bands):
                rows["band_id"].append(band)
                rows["band_key"].append(int((h >> np.uint64(band * width)) & mask))
                rows["doc_id"].append(doc_id)
                rows["simhash"].append(int(h))
        return pd.DataFrame(rows)


def simhash_dedup_documents(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    banded = ds.map_batches(
        SimHasher,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=2048,
        concurrency=(1, 8),
    )

    def pairs_fn(g: pd.DataFrame) -> pd.DataFrame:
        out = {"a": [], "b": [], "hamming": []}
        g = g.drop_duplicates("doc_id").head(200)
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy(dtype=np.uint64)
        for i in range(len(ids)):
            x = hs[i] ^ hs[i + 1 :]
            ham = np.array([bin(int(v)).count("1") for v in x])
            for off in np.nonzero(ham <= max_hamming)[0]:
                j = i + 1 + off
                a, b = sorted((int(ids[i]), int(ids[j])))
                out["a"].append(a)
                out["b"].append(b)
                out["hamming"].append(int(ham[off]))
        return pd.DataFrame(out)

    pairs = banded.groupby(["band_id", "band_key"]).map_groups(
        pairs_fn, batch_format="pandas"
    )
    df = pairs.to_pandas().drop_duplicates(["a", "b"])
    dup_docs = set(df["a"]).union(df["b"]) if len(df) else set()
    return pd.DataFrame(
        {"dup_pairs": [len(df)], "dup_docs": [len(dup_docs)]}
    )


def dedup_exact_documents(sf_dir: str) -> pd.DataFrame:
    """Exact dedup: content-hash per batch → hash-partitioned first-wins.
    Oracle: COUNT(DISTINCT text)."""
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def hash_batch(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        from ..sketches import hash_columns_u64

        return pd.DataFrame(
            {"doc_id": df["doc_id"], "h": hash_columns_u64(df, ["text"])}
        )

    hashed = ds.map_batches(hash_batch, batch_format="pyarrow", zero_copy_batch=True)
    groups = hashed.groupby("h").count().to_pandas()
    total = int(groups["count()"].sum())
    distinct = len(groups)
    return pd.DataFrame(
        {
            "total_docs": [total],
            "distinct_texts": [distinct],
            "dup_docs": [total - distinct],
        }
    )


class HyperplaneLSH:
    """Random-hyperplane signatures for cosine LSH over an embedding
    column (seeded, fixed per actor)."""

    def __init__(self, dim: int = 64, bits: int = 12):
        rng = np.random.default_rng(4321)
        self.planes = rng.standard_normal((dim, bits))

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        mat = np.stack(df["embedding"].to_numpy())
        proj = mat @ self.planes
        sig = (proj > 0).astype(np.uint32) @ (1 << np.arange(proj.shape[1], dtype=np.uint32))
        return pd.DataFrame(
            {
                "bucket": sig.astype("int64"),
                "vec_id": df["vec_id"],
                "vec": [m.astype(np.float32).tobytes() for m in mat],
            }
        )


def embedding_neardup_documents(sf_dir: str, threshold: float = 0.95) -> pd.DataFrame:
    """Embedding-cosine near-dup via hyperplane-LSH buckets + exact
    verification within buckets (rows-only; LSH recall is partial by
    design and deterministic given the fixed seed)."""
    ds = read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    bucketed = ds.map_batches(
        HyperplaneLSH,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,
        concurrency=(1, 8),
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        out = {"a": [], "b": [], "cos": []}
        g = g.drop_duplicates("vec_id").head(500)
        if len(g) < 2:
            return pd.DataFrame(out)
        ids = g["vec_id"].to_numpy()
        mat = np.stack([np.frombuffer(v, dtype=np.float32) for v in g["vec"]]).astype(
            np.float64
        )
        norms = np.linalg.norm(mat, axis=1)
        sims = (mat @ mat.T) / np.outer(norms, norms).clip(min=1e-12)
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = sims[ii, jj] >= threshold
        for i, j in zip(ii[keep], jj[keep]):
            a, b = sorted((int(ids[i]), int(ids[j])))
            out["a"].append(a)
            out["b"].append(b)
            out["cos"].append(float(np.round(sims[i, j], 4)))
        return pd.DataFrame(out)

    pairs = bucketed.groupby("bucket").map_groups(verify, batch_format="pandas")
    df = pairs.to_pandas().drop_duplicates(["a", "b"])
    dup_docs = set(df["a"]).union(df["b"]) if len(df) else set()
    return pd.DataFrame({"dup_pairs": [len(df)], "dup_vecs": [len(dup_docs)]})


QUERIES = {
    "dedup_exact_documents": dedup_exact_documents,
    "minhash_dedup_documents": minhash_dedup_documents,
    "ngram_jaccard_documents": ngram_jaccard_documents,
    "simhash_dedup_documents": simhash_dedup_documents,
    "embedding_neardup_documents": embedding_neardup_documents,
}

ORACLE_SQL = {
    "dedup_exact_documents": """
        SELECT COUNT(*) AS total_docs,
               COUNT(DISTINCT text) AS distinct_texts,
               COUNT(*) - COUNT(DISTINCT text) AS dup_docs
        FROM documents
    """,
    # minhash / simhash / ngram-jaccard / embedding near-dup are
    # engine-defined approximate ops: rows-only checks.
}
