"""Similarity search over the ``embeddings`` table.

* ``ann_topk_embeddings`` — exact brute-force cosine top-k: the query
  vector rides in the pickled map fn (exported to the object store once
  per execution — the broadcast); each batch does one numpy matmul and
  emits its local top-k; a tiny global sort+limit finishes.
  DuckDB oracle via ``list_cosine_similarity``.
* ``ann_lsh_embeddings`` — the scale path: hyperplane-LSH bucketing
  restricts the scan to the query's bucket neighborhood (rows-only
  check; recall measured against the brute-force baseline).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..io import read_table
from ._util import round_duck


def _query_vector(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    """Fetch ONE query vector with a pushed-down row filter — only the
    row groups whose footer stats may contain vec_id are decoded."""
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", vec_id)],
    )
    if t.num_rows == 0:
        raise KeyError(f"vec_id={vec_id} not found")
    return np.asarray(t.column("embedding")[0].as_py(), dtype=np.float64)


class BruteForceScorer:
    """Pickled instance on warm workers: the 512-B query vector rides in
    the pickled fn, which Ray exports to the object store once per
    execution and each worker fetches once — the broadcast, without an
    actor pool (pools paid multi-second spin-up per query; see
    ``stages/profile.py``). Per-batch scoring is one matmul."""

    def __init__(self, query: np.ndarray, k: int, exclude_id: int):
        self.q = query
        self.qn = np.linalg.norm(self.q)
        self.k = k
        self.exclude_id = exclude_id

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1).clip(min=1e-12)
        cos = (mat @ self.q) / (norms * self.qn)
        out = pd.DataFrame(
            {"vec_id": df["vec_id"], "cos": round_duck(cos, 4)}
        )
        out = out[out["vec_id"] != self.exclude_id]
        # local top-k: only k rows per batch reach the global sort
        return out.sort_values(["cos", "vec_id"], ascending=[False, True]).head(self.k)


def ann_topk_embeddings(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Exact cosine top-k for the vec_id=0 query vector."""
    from ..shuffle import map_partials

    cand = map_partials(
        f"{sf_dir}/embeddings.parquet",
        ["vec_id", "embedding"],
        None,
        BruteForceScorer(_query_vector(sf_dir, 0), k, 0),
    )
    df = (
        cand.sort_values(["cos", "vec_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    df["vec_id"] = df["vec_id"].astype("int64")
    return df


def ann_lsh_embeddings(sf_dir: str, k: int = 10, bits: int = 8) -> pd.DataFrame:
    """LSH-restricted ANN (rows-only): score only vectors whose
    hyperplane signature is within Hamming distance 1 of the query's;
    report recall@k vs the exact baseline."""
    rng = np.random.default_rng(777)
    q = _query_vector(sf_dir, 0)
    planes = rng.standard_normal((len(q), bits))
    q_sig = int((q @ planes > 0).astype(np.uint32) @ (1 << np.arange(bits, dtype=np.uint32)))
    near = {q_sig} | {q_sig ^ (1 << b) for b in range(bits)}

    class LshScorer:
        def __init__(self):
            self.q = q
            self.planes = planes
            self.qn = np.linalg.norm(self.q)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()
            mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            sig = (mat @ self.planes > 0).astype(np.uint32) @ (
                1 << np.arange(self.planes.shape[1], dtype=np.uint32)
            )
            mask = np.isin(sig, list(near)) & (df["vec_id"].to_numpy() != 0)
            if not mask.any():
                return pd.DataFrame({"vec_id": [], "cos": []})
            sub = mat[mask]
            norms = np.linalg.norm(sub, axis=1).clip(min=1e-12)
            cos = (sub @ self.q) / (norms * self.qn)
            return pd.DataFrame(
                {"vec_id": df["vec_id"].to_numpy()[mask], "cos": round_duck(cos, 4)}
            ).sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)

    from ..shuffle import map_partials

    approx = (
        map_partials(
            f"{sf_dir}/embeddings.parquet", ["vec_id", "embedding"], None, LshScorer()
        )
        .sort_values(["cos", "vec_id"], ascending=[False, True])
        .head(k)
    )
    exact = ann_topk_embeddings(sf_dir, k)
    recall = len(set(approx["vec_id"]).intersection(exact["vec_id"])) / max(k, 1)
    return pd.DataFrame(
        {"scanned_topk": [len(approx)], "recall_at_k": [round(recall, 4)]}
    )


def _ivf_init_centroids(
    sf_dir: str, n_lists: int, sample_per_task: int = 512, seed: int = 4242
) -> np.ndarray:
    """k-means++ seeding over a deterministic distributed sample: every
    scan task contributes its ``sample_per_task`` lowest-spread-hash
    vec_ids (a uniform, order-free sample covering all row groups), then
    the driver runs the k-means++ D²-weighted picks on the sample —
    standard scalable practice (the sample is bounded, not the table)."""
    from ..shuffle import map_partials

    class Sampler:
        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()
            df = df[df["vec_id"] != 0]
            if len(df) > sample_per_task:
                h = df["vec_id"].to_numpy().astype(np.uint64) * np.uint64(
                    0x9E3779B97F4A7C15
                )
                df = df.iloc[np.argsort(h)[:sample_per_task]]
            return df[["embedding"]]

    sample = map_partials(
        f"{sf_dir}/embeddings.parquet", ["vec_id", "embedding"], None, Sampler()
    )
    if len(sample) == 0:
        raise ValueError("cannot train IVF: embeddings table is empty")
    mat = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True).clip(min=1e-12)
    n_lists = min(n_lists, len(mat))
    rng = np.random.default_rng(seed)
    idx = [int(rng.integers(len(mat)))]
    d2 = np.maximum(1.0 - mat @ mat[idx[0]], 0.0)  # cosine distance
    for _ in range(1, n_lists):
        tot = d2.sum()
        nxt = (
            int(rng.choice(len(mat), p=d2 / tot))
            if tot > 0
            else int(rng.integers(len(mat)))
        )
        idx.append(nxt)
        d2 = np.minimum(d2, np.maximum(1.0 - mat @ mat[nxt], 0.0))
    return mat[idx].copy()


def ann_ivf_embeddings(
    sf_dir: str,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    train_iters: int = 5,
) -> pd.DataFrame:
    """IVF (inverted-file) ANN — the second scale path beside LSH:
    k-means coarse quantizer over cosine similarity, then the query
    probes only its ``n_probe`` nearest lists.

    Training = k-means++ init over a bounded distributed sample
    (``_ivf_init_centroids``) + distributed Lloyd iterations expressed
    as map partial aggregation: centroids are broadcast once per wave;
    each task assigns its vectors (one matmul) and emits per-centroid
    partial sums + counts (an ``n_lists × dim`` matrix per task — fixed
    width, independent of rows); the driver folds the partials,
    renormalizes, and stops early when the max centroid movement falls
    under 1e-6 (≤ ``train_iters`` rounds). Search is a second map wave
    scoring only rows whose nearest centroid is probed. Rows-only
    check: recall measured against the exact brute-force baseline
    (``ann_topk_embeddings``, which IS oracle-checked).

    Recall caveat, documented: the synthetic testdata embeddings are
    near-isotropic (no cluster structure), the adversarial case for any
    coarse quantizer — recall ≈ probed fraction (n_probe/n_lists)
    there. On clustered embeddings the trained quantizer recovers the
    mixture and recall far exceeds the probed fraction —
    ``tests/test_ann_ivf.py`` proves ≥0.9 recall at probe fraction 0.25
    on a mixture-of-Gaussians fixture."""
    cent = _ivf_init_centroids(sf_dir, n_lists)
    n_lists = len(cent)
    from ..shuffle import map_partials

    class PartialSums:
        def __init__(self, cent: np.ndarray):
            self.cent = cent

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()
            mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True).clip(min=1e-12)
            assign = np.argmax(mat @ self.cent.T, axis=1)
            nl, dim = self.cent.shape
            sums = np.zeros((nl, dim))
            np.add.at(sums, assign, mat)
            counts = np.bincount(assign, minlength=nl)
            return pd.DataFrame(
                {
                    "list_id": np.arange(nl, dtype=np.int64),
                    "sum": [s.tobytes() for s in sums],
                    "count": counts.astype(np.int64),
                }
            )

    # the centroid matrix (n_lists × dim float64, ~8 KB) rides in the
    # pickled fn — Ray exports it once per execution; workers fetch once
    for _ in range(train_iters):
        partials = map_partials(
            f"{sf_dir}/embeddings.parquet",
            ["vec_id", "embedding"],
            None,
            PartialSums(cent),
        )
        dim = cent.shape[1]
        sums = np.zeros((n_lists, dim))
        counts = np.zeros(n_lists, dtype=np.int64)
        for lid, blob, cnt in zip(partials["list_id"], partials["sum"], partials["count"]):
            sums[lid] += np.frombuffer(blob, dtype=np.float64)
            counts[lid] += cnt
        live = counts > 0
        new_cent = cent.copy()
        new_cent[live] = sums[live] / counts[live, None]
        new_cent /= np.linalg.norm(new_cent, axis=1, keepdims=True).clip(min=1e-12)
        shift = float(np.max(1.0 - np.sum(new_cent * cent, axis=1)))
        cent = new_cent
        if shift < 1e-6:  # Lloyd converged — skip the remaining waves
            break

    q = _query_vector(sf_dir, 0)
    qn = q / np.linalg.norm(q).clip(min=1e-12)
    probed = set(np.argsort(-(cent @ qn))[:n_probe].tolist())

    class IvfScorer:
        def __init__(self):
            self.q = q
            self.cent = cent
            self.qn = np.linalg.norm(self.q)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()
            mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1).clip(min=1e-12)
            assign = np.argmax((mat / norms[:, None]) @ self.cent.T, axis=1)
            mask = np.isin(assign, list(probed)) & (df["vec_id"].to_numpy() != 0)
            if not mask.any():
                return pd.DataFrame({"vec_id": [], "cos": []})
            cos = (mat[mask] @ self.q) / (norms[mask] * self.qn)
            return pd.DataFrame(
                {"vec_id": df["vec_id"].to_numpy()[mask], "cos": round_duck(cos, 4)}
            ).sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)

    scored = map_partials(
        f"{sf_dir}/embeddings.parquet", ["vec_id", "embedding"], None, IvfScorer()
    )
    approx = scored.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
    exact = ann_topk_embeddings(sf_dir, k)
    recall = len(set(approx["vec_id"]).intersection(exact["vec_id"])) / max(k, 1)
    return pd.DataFrame(
        {
            "probed_lists": [int(len(probed))],
            "recall_at_k": [round(recall, 4)],
        }
    )


def label_centroids_embeddings(sf_dir: str) -> pd.DataFrame:
    """Vector-column grouped aggregate: the per-label centroid of the
    ``list<float>`` embedding column (the supervised analog of the IVF
    training step, and the building block of class prototypes / cluster
    drift checks). Each map task stacks its batch into one float64
    matrix and reduces it to (label, dim, sum, count) partial rows —
    labels × 64 rows per task, never the vectors — merged and divided on
    the driver. Elements are promoted float32→float64 BEFORE summing,
    matching SQL AVG's promotion of FLOAT inputs."""
    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        mask = df["label"].notna() & df["embedding"].notna()
        df = df[mask]
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "label": pd.Series([], dtype="int64"),
                    "i": pd.Series([], dtype="int64"),
                    "s": pd.Series([], dtype="float64"),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        codes, uniq = pd.factorize(df["label"].astype("int64"), sort=True)
        d = m.shape[1]
        rows = []
        for k, lab in enumerate(uniq):
            sub = m[codes == k]
            s = sub.sum(axis=0)
            rows.append(
                pd.DataFrame(
                    {
                        "label": np.full(d, int(lab), dtype=np.int64),
                        "i": np.arange(1, d + 1, dtype=np.int64),
                        "s": s,
                        "n": np.full(d, len(sub), dtype=np.int64),
                    }
                )
            )
        return pd.concat(rows, ignore_index=True)

    from ..shuffle import map_partials

    parts = (
        map_partials(
            f"{sf_dir}/embeddings.parquet", ["label", "embedding"], None, partial
        )
        .groupby(["label", "i"], as_index=False)
        .agg(s=("s", "sum"), n=("n", "sum"))
    )
    parts["c"] = round_duck(parts["s"] / parts["n"], 6)
    out = parts[["label", "i", "c"]].sort_values(["label", "i"])
    return out.astype({"label": "int64", "i": "int64"}).reset_index(drop=True)


def centroid_confusion_embeddings(sf_dir: str) -> pd.DataFrame:
    """Nearest-prototype confusion matrix — the label-quality audit of
    a vector dataset: assign each embedding to its nearest class
    centroid (squared L2, ties to the smallest label) and cross-tab
    against the stored label; off-diagonal mass flags label noise or
    collapsed classes. The 6dp-pinned distributed centroids broadcast
    via closure capture; each scan task computes its batch's n×L
    distance matrix with the same per-element (e − c)² expression as
    the oracle and reduces to ≤ L² count partials — vectors never
    shuffle. (Distance sums accumulate in different orders across
    engines — ~1e-15 — so an assignment could only flip for a vector
    near-equidistant to two centroids at that scale.)"""
    cents = label_centroids_embeddings(sf_dir)
    m = cents.pivot(index="label", columns="i", values="c").sort_index()
    labels = m.index.to_numpy(np.int64)
    C = m.to_numpy(np.float64)  # L × D, label-ascending rows

    from ..shuffle import map_partials

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[df["label"].notna() & df["embedding"].notna()]
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "true_label": pd.Series([], dtype="int64"),
                    "assigned_label": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        M = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        d = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)  # n × L
        assigned = labels[np.argmin(d, axis=1)]  # first min = smallest label
        out = (
            pd.DataFrame(
                {
                    "true_label": df["label"].astype("int64").to_numpy(),
                    "assigned_label": assigned,
                }
            )
            .groupby(["true_label", "assigned_label"], as_index=False)
            .size()
        )
        return out.rename(columns={"size": "n"})

    parts = map_partials(
        f"{sf_dir}/embeddings.parquet", ["label", "embedding"], None, partial
    )
    out = (
        parts.groupby(["true_label", "assigned_label"], as_index=False)["n"]
        .sum()
        .sort_values(["true_label", "assigned_label"])
        .reset_index(drop=True)
    )
    return out.astype(
        {"true_label": "int64", "assigned_label": "int64", "n": "int64"}
    )


def quantization_calibration_embeddings(sf_dir: str) -> pd.DataFrame:
    """Per-dimension int8 quantization calibration — the min/max range
    scan every vector-compression step (scalar quantization, SQ8 in
    FAISS terms) runs before writing a compact index: per dim, global
    min / max and the (max − min)/255 scale. Each map task reduces its
    batch matrix to dims × (min, max) partials; the driver folds them
    — 2 numbers per dim per task, vectors never shuffle."""
    from ..shuffle import map_partials

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[df["embedding"].notna()]
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "i": pd.Series([], dtype="int64"),
                    "mn": pd.Series([], dtype="float64"),
                    "mx": pd.Series([], dtype="float64"),
                }
            )
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {
                "i": np.arange(1, m.shape[1] + 1, dtype=np.int64),
                "mn": m.min(axis=0),
                "mx": m.max(axis=0),
            }
        )

    parts = map_partials(
        f"{sf_dir}/embeddings.parquet", ["embedding"], None, partial
    )
    out = parts.groupby("i", as_index=False).agg(mn=("mn", "min"), mx=("mx", "max"))
    out = out.sort_values("i").reset_index(drop=True)
    mn = out["mn"].to_numpy(np.float64)
    mx = out["mx"].to_numpy(np.float64)
    return pd.DataFrame(
        {
            "i": out["i"].astype("int64"),
            "vmin": round_duck(mn, 6),
            "vmax": round_duck(mx, 6),
            # identical FP tree as the oracle: (mx - mn) / 255
            "scale": round_duck((mx - mn) / 255.0, 8),
        }
    )


def centroid_distances_embeddings(sf_dir: str) -> pd.DataFrame:
    """Inter-label centroid distance matrix — the class-separation /
    cluster-drift diagnostic (two labels whose prototypes collapse
    toward each other signal labeling noise or distribution shift).
    Rides the distributed centroid aggregate (vectors never shuffle;
    labels × dims partials) and finishes with a labels²-bounded driver
    computation on the 6dp-rounded centroids — the rounding pins both
    engines to identical inputs, so the distances agree at 4dp."""
    cents = label_centroids_embeddings(sf_dir)
    m = cents.pivot(index="label", columns="i", values="c").sort_index()
    labels = m.index.to_numpy()
    mat = m.to_numpy(np.float64)
    rows = []
    for a in range(len(labels)):
        for b in range(a + 1, len(labels)):
            d = float(np.sqrt(((mat[a] - mat[b]) ** 2).sum()))
            rows.append((int(labels[a]), int(labels[b]), float(round_duck(d, 4))))
    return pd.DataFrame(rows, columns=["label_a", "label_b", "dist"]).astype(
        {"label_a": "int64", "label_b": "int64"}
    )


def embedding_norms_labels(sf_dir: str) -> pd.DataFrame:
    """Per-label L2-norm statistics of the embedding column — the
    normalization audit every vector pipeline needs before cosine math
    (an un-normalized shard silently skews similarity scores). Each map
    task stacks its batch into one float64 matrix, reduces to per-label
    (count, fsum of norms, min, max) — 4 numbers per label per task,
    vectors never shuffle. Elements promote float32→float64 BEFORE
    squaring, matching the oracle's CAST; per-row norm differences
    between numpy's pairwise and SQL's sequential 64-element sum are
    ~1e-15 against a 4dp output — far inside the rounding slack."""
    import math as _math

    from ..shuffle import map_partials

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[df["label"].notna() & df["embedding"].notna()]
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "label": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                    "fs": pd.Series([], dtype="float64"),
                    "mn": pd.Series([], dtype="float64"),
                    "mx": pd.Series([], dtype="float64"),
                }
            )
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        norms = np.sqrt((m * m).sum(axis=1))
        codes, uniq = pd.factorize(df["label"].astype("int64"), sort=True)
        rows = [
            (
                int(lab),
                int((codes == k).sum()),
                _math.fsum(norms[codes == k]),
                float(norms[codes == k].min()),
                float(norms[codes == k].max()),
            )
            for k, lab in enumerate(uniq)
        ]
        return pd.DataFrame(rows, columns=["label", "n", "fs", "mn", "mx"])

    import math as _math

    parts = map_partials(
        f"{sf_dir}/embeddings.parquet", ["label", "embedding"], None, partial
    )
    rows = []
    for lab, g in parts.groupby("label", sort=True):
        n = int(g["n"].sum())
        rows.append(
            (
                int(lab),
                n,
                float(round_duck(_math.fsum(g["fs"]) / n, 4)),
                float(round_duck(float(g["mn"].min()), 4)),
                float(round_duck(float(g["mx"].max()), 4)),
            )
        )
    return pd.DataFrame(
        rows, columns=["label", "n_vecs", "avg_norm", "min_norm", "max_norm"]
    ).astype({"label": "int64", "n_vecs": "int64"})


def silhouette_labels_embeddings(sf_dir: str) -> pd.DataFrame:
    """Simplified silhouette score per label — the cluster-quality audit
    that closes the vector-audit family (centroids = prototypes,
    confusion = assignment quality, silhouette = separation quality):
    for each vector, a = Euclidean distance to its OWN label's centroid,
    b = distance to the nearest OTHER centroid, s = (b − a)/max(a, b);
    per-label count and mean s. Well-separated classes score → 1,
    overlapping classes → 0, misassigned mass goes negative — the
    number that says whether the labels are worth training on.

    Same shape as the confusion matrix: 6dp-pinned distributed centroids
    broadcast via closure capture; each scan task computes its batch's
    distances with the IDENTICAL per-element (e − c)² tree as the oracle
    (no matmul expansion — |x|²−2x·c+|c|² has a different cancellation
    profile) and folds to ≤ L (label, n, n_scored, fsum) partials;
    vectors never shuffle. A single-label dataset has no "other"
    centroid: s is NULL for every vector, mean is NULL (SQL NULL
    aggregate), n_vectors still counts."""
    cents = label_centroids_embeddings(sf_dir)
    if len(cents) == 0:
        return pd.DataFrame(
            {
                "label": pd.Series([], dtype="int64"),
                "n_vectors": pd.Series([], dtype="int64"),
                "mean_silhouette": pd.Series([], dtype="float64"),
            }
        )
    m = cents.pivot(index="label", columns="i", values="c").sort_index()
    labels = m.index.to_numpy(np.int64)
    C = m.to_numpy(np.float64)  # L × D, label-ascending rows
    single = len(labels) < 2

    from ..shuffle import map_partials

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[df["label"].notna() & df["embedding"].notna()]
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "label": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                    "ns": pd.Series([], dtype="int64"),
                    "fs": pd.Series([], dtype="float64"),
                }
            )
        M = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        lab = df["label"].astype("int64").to_numpy()
        if single:
            out = (
                pd.DataFrame({"label": lab}).groupby("label").size()
            )
            return pd.DataFrame(
                {
                    "label": out.index.to_numpy(np.int64),
                    "n": out.to_numpy(np.int64),
                    "ns": np.zeros(len(out), np.int64),
                    "fs": np.zeros(len(out), np.float64),
                }
            )
        d = np.sqrt(((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2))
        own_col = np.searchsorted(labels, lab)
        rows = np.arange(len(lab))
        a = d[rows, own_col]
        d[rows, own_col] = np.inf
        b = d.min(axis=1)
        mx = np.maximum(a, b)
        s = np.where(mx > 0, (b - a) / np.where(mx > 0, mx, 1.0), 0.0)
        import math as _math

        parts = []
        codes, uniq = pd.factorize(pd.Series(lab), sort=True)
        for k, lb in enumerate(uniq):
            sk = s[codes == k]
            parts.append(
                (int(lb), int(len(sk)), int(len(sk)), _math.fsum(sk.tolist()))
            )
        return pd.DataFrame(parts, columns=["label", "n", "ns", "fs"])

    import math as _math

    parts = map_partials(
        f"{sf_dir}/embeddings.parquet", ["label", "embedding"], None, partial
    )
    rows = []
    for lb, g in parts.groupby("label", sort=True):
        n = int(g["n"].sum())
        ns = int(g["ns"].sum())
        mean_s = (
            float(round_duck(_math.fsum(float(x) for x in g["fs"]) / ns, 6))
            if ns
            else None
        )
        rows.append((int(lb), n, mean_s))
    return pd.DataFrame(
        rows, columns=["label", "n_vectors", "mean_silhouette"]
    ).astype({"label": "int64", "n_vectors": "int64"})


def ann_range_embeddings(sf_dir: str, tau: float = 0.25) -> pd.DataFrame:
    """Cosine RANGE search — all vectors within similarity ≥ τ of the
    query (the radius-query counterpart of the top-k scan: candidate
    harvesting for dedup/retrieval wants "everything this close", not a
    fixed k). Same broadcast-query matmul per batch as the top-k scorer;
    each task folds its matches to ONE (count, max, min) row, so the
    result is match-count-independent — a τ that matches millions of
    vectors still exchanges 3 numbers per task. The threshold compares
    the 4-dp-ROUNDED cosine on both engines; the pre-round values come
    from different float expression trees (BLAS matmul here, DuckDB
    list_cosine_similarity there), so boundary parity is empirical —
    exact at the 4-dp pin on this data, not bit-guaranteed. Zero-norm
    vectors are EXCLUDED on both sides (here explicitly; the oracle via
    a dot-product-positive predicate): the engine would score them
    cos=0 while DuckDB yields NaN, which under total float order passes
    ``NaN >= tau`` — the one case where the two could diverge."""
    q = _query_vector(sf_dir, 0)
    qn = np.linalg.norm(q)

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[df["embedding"].notna() & (df["vec_id"] != 0)]
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "n": pd.Series([], dtype="int64"),
                    "mx": pd.Series([], dtype="float64"),
                    "mn": pd.Series([], dtype="float64"),
                }
            )
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        live = norms > 0  # mirror the oracle's zero-norm exclusion
        if not live.all():
            mat, norms = mat[live], norms[live]
        if len(mat) == 0:
            return pd.DataFrame(
                {
                    "n": pd.Series([], dtype="int64"),
                    "mx": pd.Series([], dtype="float64"),
                    "mn": pd.Series([], dtype="float64"),
                }
            )
        cos = round_duck((mat @ q) / (norms * qn), 4)
        hit = cos[cos >= tau]
        if len(hit) == 0:
            return pd.DataFrame(
                {
                    "n": pd.Series([], dtype="int64"),
                    "mx": pd.Series([], dtype="float64"),
                    "mn": pd.Series([], dtype="float64"),
                }
            )
        return pd.DataFrame(
            {"n": [len(hit)], "mx": [float(hit.max())], "mn": [float(hit.min())]}
        )

    from ..shuffle import map_partials

    parts = map_partials(
        f"{sf_dir}/embeddings.parquet", ["vec_id", "embedding"], None, partial
    )
    n = int(parts["n"].sum()) if len(parts) else 0
    if n == 0:  # SQL aggregate over zero matched rows: one all-NULL-free
        return pd.DataFrame(
            {
                "n_matches": pd.Series([0], dtype="int64"),
                "max_cos": pd.Series([None], dtype="float64"),
                "min_cos": pd.Series([None], dtype="float64"),
            }
        )
    return pd.DataFrame(
        {
            "n_matches": pd.Series([n], dtype="int64"),
            "max_cos": [float(parts["mx"].max())],
            "min_cos": [float(parts["mn"].min())],
        }
    )


def dim_moments_embeddings(sf_dir: str) -> pd.DataFrame:
    """Per-dimension mean / standard deviation of the embedding column —
    the whitening / normalization statistics a vector pipeline computes
    before PCA, standard-scaling or drift monitoring (the second-moment
    companion of the min/max quantization scan above). Each map task
    stacks its batch into one float64 matrix and reduces it to
    dims × (n, Σe, Σe²) partial rows — vectors never shuffle; elements
    promote float32→float64 exactly before any arithmetic, and the
    oracle builds variance from the SAME E[x²]-form FORMULA
    (Σe² − (Σe)²/n)/(n−1) over SUM(e·e)/SUM(e). The Σ accumulation
    order/algorithm differ (numpy pairwise partials here, DuckDB
    sequential SUM there), so parity is empirical at the 6-dp pin —
    robust in practice because embeddings are unit-scale and near
    zero-mean (no catastrophic cancellation), not bit-guaranteed.
    n ≤ 1 emits an explicit NULL std, mirroring the SQL CASE WHEN
    n > 1 (not a NaN from 0/0)."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[df["embedding"].notna()]
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "i": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                    "s": pd.Series([], dtype="float64"),
                    "s2": pd.Series([], dtype="float64"),
                }
            )
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {
                "i": np.arange(1, m.shape[1] + 1, dtype=np.int64),
                "n": np.full(m.shape[1], len(m), dtype=np.int64),
                "s": m.sum(axis=0),
                "s2": (m * m).sum(axis=0),
            }
        )

    from ..shuffle import map_partials

    parts = (
        map_partials(
            f"{sf_dir}/embeddings.parquet", ["embedding"], None, partial
        )
        .groupby("i", as_index=False)
        .agg(n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum"))
        .sort_values("i")
    )
    n = parts["n"].to_numpy(np.float64)
    s = parts["s"].to_numpy(np.float64)
    s2 = parts["s2"].to_numpy(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        var = (s2 - s * s / n) / (n - 1.0)
        std = np.sqrt(var)
    # explicit NULL when n <= 1 (SQL CASE WHEN n > 1), not an incidental
    # 0/0 NaN — same bits in a float64 column, but stated, not relied on
    std_r = np.where(n > 1, round_duck(std, 6), np.nan)
    return pd.DataFrame(
        {
            "i": parts["i"].astype("int64").to_numpy(),
            "n": parts["n"].astype("int64").to_numpy(),
            "mean": round_duck(s / n, 6),
            "std": std_r,
        }
    ).reset_index(drop=True)


def pca_gram_band_embeddings(sf_dir: str) -> pd.DataFrame:
    """Oracle-exact companion to ``pca_power_embeddings``: the diagonal
    plus first off-diagonal band of the centered covariance matrix
    Σxxᵀ/n − μμᵀ — the exact entries of the matrix the PCA power
    iteration consumes, computed with the SAME distributed Gram fold
    (each map task reduces its batch to dims × (n, Σx, Σx², Σx·x₊₁)
    partials; vectors never shuffle). DuckDB verifies every band entry
    from unnested lists at the 6-dp pin, so the driver's correctness
    window gets an exact oracle row proving the Gram machinery before
    the adjacent rows-only eigenvector row."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[df["embedding"].notna()]
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "i": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                    "s": pd.Series([], dtype="float64"),
                    "s2": pd.Series([], dtype="float64"),
                    "sx": pd.Series([], dtype="float64"),
                }
            )
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        d = m.shape[1]
        cross = np.concatenate([(m[:, :-1] * m[:, 1:]).sum(axis=0), [np.nan]])
        return pd.DataFrame(
            {
                "i": np.arange(1, d + 1, dtype=np.int64),
                "n": np.full(d, len(m), dtype=np.int64),
                "s": m.sum(axis=0),
                "s2": (m * m).sum(axis=0),
                "sx": cross,
            }
        )

    from ..shuffle import map_partials

    parts = (
        map_partials(f"{sf_dir}/embeddings.parquet", ["embedding"], None, partial)
        .groupby("i", as_index=False)
        .agg(n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum"), sx=("sx", "sum"))
        .sort_values("i")
        .reset_index(drop=True)
    )
    n = parts["n"].to_numpy(np.float64)
    s = parts["s"].to_numpy(np.float64)
    s2 = parts["s2"].to_numpy(np.float64)
    sx = parts["sx"].to_numpy(np.float64)
    s_next = np.concatenate([s[1:], [np.nan]])
    with np.errstate(invalid="ignore", divide="ignore"):
        var = (s2 - s * s / n) / n
        cov_next = (sx - s * s_next / n) / n
    return pd.DataFrame(
        {
            "i": parts["i"].astype("int64").to_numpy(),
            "n": parts["n"].astype("int64").to_numpy(),
            "var_i": round_duck(var, 6),
            "cov_next": round_duck(cov_next, 6),
        }
    )


_PCA_GRAM_BAND_SQL = """
    WITH u AS (
        SELECT CAST(unnest(embedding) AS DOUBLE) AS x,
               generate_subscripts(embedding, 1) AS i,
               CAST(list_extract(
                   embedding, generate_subscripts(embedding, 1) + 1
               ) AS DOUBLE) AS xn
        FROM embeddings WHERE embedding IS NOT NULL
    )
    SELECT i,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND((SUM(x * x) - SUM(x) * SUM(x) / COUNT(*)) / COUNT(*), 6)
               AS var_i,
           CASE WHEN COUNT(xn) = 0 THEN NULL
                ELSE ROUND((SUM(x * xn) - SUM(x) * SUM(xn) / COUNT(*))
                           / COUNT(*), 6)
           END AS cov_next
    FROM u GROUP BY i ORDER BY i
"""


def dim_anova_embeddings(sf_dir: str) -> pd.DataFrame:
    """Per-dimension one-way ANOVA of embedding values across labels —
    the feature-discriminability audit (Fisher-style): which dimensions
    actually separate the classes, the ranking a feature-selection or
    linear-probe step needs before training. Each map task reduces its
    batch matrix to (label, dim, n, Σe, Σe²) partials — labels × dims
    rows, vectors never shuffle. Per dim the driver builds SSB/SSW with
    the IDENTICAL expression tree as the oracle (each group's s²/n one
    double ratio, their order-independent fsum, SSB = A − S²/N,
    SSW = S2 − A, η² = SSB/(SSB+SSW) with the sum formed from the same
    two doubles), so F and η² agree at the 6-dp pin."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[df["label"].notna() & df["embedding"].notna()]
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "label": pd.Series([], dtype="int64"),
                    "i": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                    "s": pd.Series([], dtype="float64"),
                    "s2": pd.Series([], dtype="float64"),
                }
            )
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        codes, uniq = pd.factorize(df["label"].astype("int64"), sort=True)
        d = m.shape[1]
        frames = []
        for k, lab in enumerate(uniq):
            sub = m[codes == k]
            frames.append(
                pd.DataFrame(
                    {
                        "label": np.full(d, int(lab), dtype=np.int64),
                        "i": np.arange(1, d + 1, dtype=np.int64),
                        "n": np.full(d, len(sub), dtype=np.int64),
                        "s": sub.sum(axis=0),
                        "s2": (sub * sub).sum(axis=0),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    from ..shuffle import map_partials

    parts = (
        map_partials(
            f"{sf_dir}/embeddings.parquet", ["label", "embedding"], None, partial
        )
        .groupby(["i", "label"], as_index=False)
        .agg(n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum"))
    )
    rows = []
    for i, g in parts.groupby("i", sort=True):
        n_g = g["n"].to_numpy(np.int64)
        s_g = g["s"].to_numpy(np.float64)
        k = len(g)
        nn = int(n_g.sum())
        ts = float(g["s"].sum())
        t2 = float(g["s2"].sum())
        a = math.fsum(
            float(s) * float(s) / float(n) for s, n in zip(s_g, n_g)
        )
        ssb = a - ts * ts / float(nn)
        ssw = t2 - a
        f_stat = eta = None
        if k >= 2 and nn - k >= 1 and ssw > 0:
            f_stat = (ssb / float(k - 1)) / (ssw / float(nn - k))
        if ssb + ssw > 0:
            eta = ssb / (ssb + ssw)
        rows.append(
            (
                int(i),
                nn,
                k,
                None if f_stat is None else float(round_duck(f_stat, 6)),
                None if eta is None else float(round_duck(eta, 6)),
            )
        )
    out = pd.DataFrame(
        rows, columns=["i", "n", "n_labels", "f_stat", "eta_sq"]
    )
    return out.astype(
        {"i": "int64", "n": "int64", "n_labels": "int64"}
    ).reset_index(drop=True)


def embedding_drift_cohorts(sf_dir: str) -> pd.DataFrame:
    """Per-dimension embedding drift between two deterministic cohorts
    (even vs odd ``vec_id`` — the stand-in for "last week's encoder vs
    this week's"; a real pipeline passes ingestion-date cohorts): the
    audit that catches a silently retrained/upgraded encoder whose
    vectors landed in the same table. A genuine version bump shows as
    coherent per-dim mean shifts; homogeneous data shows shifts ≈ 0.

    Each map task folds its batch to dims × (cohort, n, Σe) partials —
    vectors never shuffle. Means are 6-dp pinned with the oracle's
    s/n tree; the shift is the difference OF THE PINNED means (both
    engines subtract identical doubles). Like ``dim_moments``, the Σ
    accumulation order differs between numpy partials and DuckDB's
    sequential SUM, so parity is empirical at the pin — safe on
    unit-scale embedding data. Cohorts with no rows yield SQL-NULL
    means and a NULL shift."""
    from ..shuffle import map_partials
    from ._util import round_duck

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[df["embedding"].notna() & df["vec_id"].notna()]
        if not len(df):
            return pd.DataFrame(
                {"i": pd.Series([], dtype="int64"),
                 "cohort": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64"),
                 "s": pd.Series([], dtype="float64")}
            )
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        even = (df["vec_id"].to_numpy().astype(np.int64) % 2) == 0
        rows = []
        for cohort, mask in ((0, even), (1, ~even)):
            if mask.any():
                sub = m[mask]
                for i in range(sub.shape[1]):
                    rows.append((i + 1, cohort, sub.shape[0],
                                 float(sub[:, i].sum())))
        return pd.DataFrame(rows, columns=["i", "cohort", "n", "s"])

    parts = map_partials(
        f"{sf_dir}/embeddings.parquet", ["vec_id", "embedding"], None, partial
    )
    empty = pd.DataFrame(
        {
            "i": pd.Series([], dtype="int64"),
            "n_even": pd.Series([], dtype="int64"),
            "n_odd": pd.Series([], dtype="int64"),
            "mean_even": pd.Series([], dtype="float64"),
            "mean_odd": pd.Series([], dtype="float64"),
            "shift": pd.Series([], dtype="float64"),
        }
    )
    if not len(parts):
        return empty
    g = parts.groupby(["i", "cohort"], as_index=False).agg(
        n=("n", "sum"), s=("s", "sum")
    )
    wide = g.pivot(index="i", columns="cohort", values=["n", "s"])
    out_rows = []
    for i in wide.index:
        ne = int(wide.loc[i].get(("n", 0), 0) or 0)
        no = int(wide.loc[i].get(("n", 1), 0) or 0)
        me = (
            float(round_duck(float(wide.loc[i][("s", 0)]) / ne, 6))
            if ne else None
        )
        mo = (
            float(round_duck(float(wide.loc[i][("s", 1)]) / no, 6))
            if no else None
        )
        shift = (me - mo) if (me is not None and mo is not None) else None
        out_rows.append((int(i), ne, no, me, mo, shift))
    out = pd.DataFrame(
        out_rows,
        columns=["i", "n_even", "n_odd", "mean_even", "mean_odd", "shift"],
    )
    return out.sort_values("i").reset_index(drop=True)


_DRIFT_COHORTS_SQL = """
    WITH u AS (
        SELECT vec_id % 2 AS cohort,
               CAST(unnest(embedding) AS DOUBLE) AS e,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
        WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
    ),
    g AS (
        SELECT i, cohort, COUNT(*) AS n, SUM(e) AS s
        FROM u GROUP BY i, cohort
    ),
    w AS (
        SELECT i,
               MAX(CASE WHEN cohort = 0 THEN n END) AS n_even,
               MAX(CASE WHEN cohort = 1 THEN n END) AS n_odd,
               MAX(CASE WHEN cohort = 0 THEN s END) AS s_even,
               MAX(CASE WHEN cohort = 1 THEN s END) AS s_odd
        FROM g GROUP BY i
    )
    SELECT CAST(i AS BIGINT) AS i,
           CAST(COALESCE(n_even, 0) AS BIGINT) AS n_even,
           CAST(COALESCE(n_odd, 0) AS BIGINT) AS n_odd,
           ROUND(s_even / n_even, 6) AS mean_even,
           ROUND(s_odd / n_odd, 6) AS mean_odd,
           ROUND(s_even / n_even, 6) - ROUND(s_odd / n_odd, 6) AS shift
    FROM w ORDER BY i
"""


def pca_power_embeddings(sf_dir: str, max_iter: int = 100) -> pd.DataFrame:
    """Top principal component of the embedding cloud via ONE
    distributed scan + driver-side power iteration — the anisotropy
    audit before quantization or dimension reduction (a dominant
    direction means rotation/whitening pays; λ₁/trace is the fraction
    of variance a 1-D projection captures).

    Each map task folds its batch to a dim×dim Gram partial Σxxᵀ plus
    Σx and n (dims ≤ ~10³ keep the partial ≪ any batch; beyond that,
    switch to v-multiply scans — documented, not needed here). The
    driver centers (G − n·μμᵀ), then power-iterates with a
    deterministic start (normalized row sums). Rows-only (no SQL
    eigensolver); SELF-AUDITED in tests against numpy's dense
    eigendecomposition of the exact same centered Gram and by the
    reported residual ‖Gv − λv‖/λ."""
    from ..shuffle import map_partials

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[df["embedding"].notna()]
        if not len(df):
            return pd.DataFrame({"i": [], "j": [], "v": []})
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        g = m.T @ m
        iu, ju = np.triu_indices(g.shape[0])
        rows = pd.DataFrame({"i": iu, "j": ju, "v": g[iu, ju]})
        sums = pd.DataFrame(
            {"i": np.arange(g.shape[0]), "j": -1, "v": m.sum(axis=0)}
        )
        n = pd.DataFrame({"i": [-1], "j": [-1], "v": [float(len(m))]})
        return pd.concat([rows, sums, n], ignore_index=True)

    parts = map_partials(
        f"{sf_dir}/embeddings.parquet", ["embedding"], None, partial
    )
    empty = pd.DataFrame(
        {
            "n_vecs": pd.Series([], dtype="int64"),
            "dim": pd.Series([], dtype="int64"),
            "top_eigenvalue": pd.Series([], dtype="float64"),
            "explained_ratio": pd.Series([], dtype="float64"),
            "residual": pd.Series([], dtype="float64"),
            "n_iter": pd.Series([], dtype="int64"),
        }
    )
    if not len(parts):
        return empty
    agg = parts.groupby(["i", "j"], as_index=False)["v"].sum()
    n = float(agg.loc[(agg["i"] == -1) & (agg["j"] == -1), "v"].sum())
    if n < 2:
        return empty
    mu_rows = agg[(agg["j"] == -1) & (agg["i"] >= 0)].sort_values("i")
    mu = mu_rows["v"].to_numpy() / n
    d = len(mu)
    g = np.zeros((d, d))
    tri = agg[(agg["i"] >= 0) & (agg["j"] >= 0)]
    g[tri["i"].to_numpy().astype(int), tri["j"].to_numpy().astype(int)] = (
        tri["v"].to_numpy()
    )
    g = g + np.triu(g, 1).T
    gc = g - n * np.outer(mu, mu)  # centered scatter matrix
    v = gc.sum(axis=1)
    nv = np.linalg.norm(v)
    v = v / nv if nv > 0 else np.full(d, 1.0 / math.sqrt(d))
    lam, it = 0.0, 0
    for it in range(1, max_iter + 1):
        w = gc @ v
        lam_new = float(v @ w)
        nw = np.linalg.norm(w)
        if nw == 0:
            lam = 0.0
            break
        v_new = w / nw
        if abs(lam_new - lam) <= 1e-12 * max(abs(lam_new), 1.0):
            lam = lam_new
            v = v_new
            break
        lam, v = lam_new, v_new
    trace = float(np.trace(gc))
    residual = float(np.linalg.norm(gc @ v - lam * v) / lam) if lam else 0.0
    return pd.DataFrame(
        {
            "n_vecs": pd.Series([int(n)], dtype="int64"),
            "dim": pd.Series([d], dtype="int64"),
            "top_eigenvalue": [lam],
            "explained_ratio": [lam / trace if trace else 0.0],
            "residual": [residual],
            "n_iter": pd.Series([it], dtype="int64"),
        }
    )


def matryoshka_cosine_embeddings(
    sf_dir: str, prefixes: tuple = (8, 16, 32), tau: float = 0.05
) -> pd.DataFrame:
    """Matryoshka truncation-fidelity audit: how much does the cosine
    score move when the embedding is truncated to its first d dims —
    the measurement behind MRL-style dimension-adaptive retrieval
    (can this corpus serve ANN from a prefix?). Per (label, prefix d):
    vectors audited, vectors whose cosine-to-probe shifts by more than
    ``tau``, and the worst shift.

    Exactness design: embeddings quantize to integers
    (``round_duck(1000·e)`` — DuckDB's half-away ``round``) against a
    deterministic integer probe ``((k·2654435761) mod 2001) − 1000``;
    prefix dots and norms are then EXACT int64 sums (order-free), and
    each cosine is the identical two-operand float64 expression
    ``dot / sqrt(n·m)`` on both engines — correctly-rounded sqrt/divide
    on identical integers is bit-identical, so the per-row degradation
    flags and the per-group MAX are exact, not tolerance-matched.
    Per-task partials are (labels × prefixes) rows; vectors never
    shuffle."""
    from ._util import round_duck
    from ..shuffle import map_partials

    prefixes = tuple(int(d) for d in prefixes)

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[df["label"].notna() & df["embedding"].notna()]
        cols = ["label", "prefix_dim", "n_vecs", "n_degraded", "max_absdiff"]
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "label": pd.Series([], dtype="int64"),
                    "prefix_dim": pd.Series([], dtype="int64"),
                    "n_vecs": pd.Series([], dtype="int64"),
                    "n_degraded": pd.Series([], dtype="int64"),
                    "max_absdiff": pd.Series([], dtype="float64"),
                }
            )
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        dim = m.shape[1]
        vq = round_duck(m * 1000.0, 0).astype(np.int64)
        k = np.arange(1, dim + 1, dtype=np.int64)
        q = (k * 2654435761) % 2001 - 1000

        def cos_at(d: int) -> np.ndarray:
            dot = vq[:, :d] @ q[:d]
            n1 = (vq[:, :d] * vq[:, :d]).sum(axis=1)
            m1 = int((q[:d] * q[:d]).sum())
            denom = np.sqrt((n1 * m1).astype(np.float64))
            return np.where(n1 == 0, 0.0, dot / np.where(denom == 0, 1.0, denom))

        full = cos_at(dim)
        labels = df["label"].astype("int64").to_numpy()
        codes, uniq = pd.factorize(labels, sort=True)
        rows = []
        for d in prefixes:
            diff = np.abs(cos_at(d) - full)
            for gk, lab in enumerate(uniq):
                sel = codes == gk
                rows.append(
                    (
                        int(lab),
                        d,
                        int(sel.sum()),
                        int((diff[sel] > tau).sum()),
                        float(diff[sel].max()) if sel.any() else 0.0,
                    )
                )
        return pd.DataFrame(rows, columns=cols)

    parts = map_partials(
        f"{sf_dir}/embeddings.parquet", ["label", "embedding"], None, partial
    )
    if len(parts) == 0:
        return pd.DataFrame(
            {
                "label": pd.Series([], dtype="int64"),
                "prefix_dim": pd.Series([], dtype="int64"),
                "n_vecs": pd.Series([], dtype="int64"),
                "n_degraded": pd.Series([], dtype="int64"),
                "max_absdiff": pd.Series([], dtype="float64"),
            }
        )
    out = (
        parts.groupby(["label", "prefix_dim"], as_index=False)
        .agg(
            n_vecs=("n_vecs", "sum"),
            n_degraded=("n_degraded", "sum"),
            max_absdiff=("max_absdiff", "max"),
        )
        .sort_values(["label", "prefix_dim"])
        .reset_index(drop=True)
    )
    out["max_absdiff"] = round_duck(out["max_absdiff"].to_numpy(np.float64), 6)
    return out.astype(
        {"label": "int64", "prefix_dim": "int64", "n_vecs": "int64", "n_degraded": "int64"}
    )


def _matryoshka_sql() -> str:
    legs = []
    for d in (8, 16, 32):
        legs.append(
            f"""
        SELECT label, {d} AS prefix_dim,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(SUM(CASE WHEN abs(c{d} - cfull) > 0.05 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_degraded,
               round(MAX(abs(c{d} - cfull)), 6) AS max_absdiff
        FROM c GROUP BY label"""
        )
    cos_exprs = []
    for d in (8, 16, 32, None):
        tag = "full" if d is None else str(d)
        cond = "" if d is None else f" FILTER (WHERE k <= {d})"
        cos_exprs.append(
            f"CASE WHEN COALESCE(SUM(v*v){cond}, 0) = 0 THEN 0.0 "
            f"ELSE CAST(SUM(v*q){cond} AS DOUBLE) / "
            f"sqrt(CAST(SUM(v*v){cond} * SUM(q*q){cond} AS DOUBLE)) "
            f"END AS c{tag}"
        )
    return f"""
    WITH u AS (
        SELECT vec_id, label,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS v,
               generate_subscripts(embedding, 1) AS k
        FROM embeddings
        WHERE label IS NOT NULL AND embedding IS NOT NULL
    ), p AS (
        SELECT vec_id, label, v, k, (k * 2654435761) % 2001 - 1000 AS q FROM u
    ), c AS (
        SELECT vec_id, label, {", ".join(cos_exprs)}
        FROM p GROUP BY vec_id, label
    )
    {" UNION ALL ".join(legs)}
    ORDER BY label, prefix_dim
    """


QUERIES = {
    "embedding_drift_cohorts": embedding_drift_cohorts,
    "matryoshka_cosine_embeddings": matryoshka_cosine_embeddings,
    "pca_gram_band_embeddings": pca_gram_band_embeddings,
    "pca_power_embeddings": pca_power_embeddings,
    "ann_topk_embeddings": ann_topk_embeddings,
    "ann_lsh_embeddings": ann_lsh_embeddings,
    "ann_ivf_embeddings": ann_ivf_embeddings,
    "label_centroids_embeddings": label_centroids_embeddings,
    "embedding_norms_labels": embedding_norms_labels,
    "centroid_distances_embeddings": centroid_distances_embeddings,
    "quantization_calibration_embeddings": quantization_calibration_embeddings,
    "centroid_confusion_embeddings": centroid_confusion_embeddings,
    "silhouette_labels_embeddings": silhouette_labels_embeddings,
    "dim_moments_embeddings": dim_moments_embeddings,
    "dim_anova_embeddings": dim_anova_embeddings,
    "ann_range_embeddings": ann_range_embeddings,
}

ORACLE_SQL = {
    "embedding_drift_cohorts": _DRIFT_COHORTS_SQL,
    "matryoshka_cosine_embeddings": _matryoshka_sql(),
    "pca_gram_band_embeddings": _PCA_GRAM_BAND_SQL,
    "ann_range_embeddings": """
        WITH q AS (
            SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
        ),
        s AS (
            SELECT ROUND(list_cosine_similarity(
                       embedding::DOUBLE[], (SELECT qe FROM q)::DOUBLE[]),
                       4) AS c
            FROM embeddings
            WHERE vec_id <> 0 AND embedding IS NOT NULL
              AND list_dot_product(embedding::DOUBLE[],
                                   embedding::DOUBLE[]) > 0
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_matches,
               MAX(c) AS max_cos, MIN(c) AS min_cos
        FROM s WHERE c >= 0.25
    """,
    "dim_anova_embeddings": """
        WITH u AS (
            SELECT label,
                   CAST(unnest(embedding) AS DOUBLE) AS e,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
            WHERE label IS NOT NULL AND embedding IS NOT NULL
        ),
        g AS (
            SELECT i, label, COUNT(*) AS n, SUM(e) AS s,
                   SUM(e * e) AS s2
            FROM u GROUP BY i, label
        ),
        t AS (
            SELECT i, COUNT(*) AS k, SUM(n) AS nn, SUM(s) AS ts,
                   SUM(s2) AS t2,
                   fsum(s * s / CAST(n AS DOUBLE)) AS a
            FROM g GROUP BY i
        ),
        v AS (
            SELECT i, k, nn,
                   a - ts * ts / CAST(nn AS DOUBLE) AS ssb,
                   t2 - a AS ssw
            FROM t
        )
        SELECT CAST(i AS BIGINT) AS i, CAST(nn AS BIGINT) AS n,
               CAST(k AS BIGINT) AS n_labels,
               CASE WHEN k >= 2 AND nn - k >= 1 AND ssw > 0 THEN
                   ROUND((ssb / CAST(k - 1 AS DOUBLE))
                         / (ssw / CAST(nn - k AS DOUBLE)), 6)
               END AS f_stat,
               CASE WHEN ssb + ssw > 0 THEN
                   ROUND(ssb / (ssb + ssw), 6)
               END AS eta_sq
        FROM v ORDER BY i
    """,
    "dim_moments_embeddings": """
        WITH u AS (
            SELECT unnest(embedding) AS e,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings WHERE embedding IS NOT NULL
        ),
        g AS (
            SELECT i, COUNT(*) AS n,
                   SUM(CAST(e AS DOUBLE)) AS s,
                   SUM(CAST(e AS DOUBLE) * CAST(e AS DOUBLE)) AS s2
            FROM u GROUP BY i
        )
        SELECT CAST(i AS BIGINT) AS i, CAST(n AS BIGINT) AS n,
               ROUND(s / n, 6) AS mean,
               CASE WHEN n > 1 THEN
                   ROUND(sqrt((s2 - s * s / n) / (n - 1)), 6)
               END AS std
        FROM g ORDER BY i
    """,
    "centroid_confusion_embeddings": """
        WITH u AS (
            SELECT label,
                   CAST(unnest(embedding) AS DOUBLE) AS e,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
            WHERE label IS NOT NULL AND embedding IS NOT NULL
        ),
        c AS (
            SELECT label AS clabel, i, ROUND(AVG(e), 6) AS c
            FROM u GROUP BY label, i
        ),
        v AS (
            SELECT vec_id, label,
                   CAST(unnest(embedding) AS DOUBLE) AS e,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
            WHERE label IS NOT NULL AND embedding IS NOT NULL
        ),
        d AS (
            SELECT v.vec_id, v.label, c.clabel,
                   SUM((v.e - c.c) * (v.e - c.c)) AS dist
            FROM v JOIN c USING (i)
            GROUP BY 1, 2, 3
        ),
        a AS (
            SELECT vec_id, label, clabel,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id ORDER BY dist, clabel) AS rn
            FROM d
        )
        SELECT CAST(label AS BIGINT) AS true_label,
               CAST(clabel AS BIGINT) AS assigned_label,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM a WHERE rn = 1
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "quantization_calibration_embeddings": """
        WITH u AS (
            SELECT CAST(unnest(embedding) AS DOUBLE) AS e,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings WHERE embedding IS NOT NULL
        )
        SELECT CAST(i AS BIGINT) AS i,
               ROUND(MIN(e), 6) AS vmin,
               ROUND(MAX(e), 6) AS vmax,
               ROUND((MAX(e) - MIN(e)) / 255, 8) AS scale
        FROM u GROUP BY i ORDER BY i
    """,
    "centroid_distances_embeddings": """
        WITH u AS (
            SELECT label,
                   unnest(embedding) AS e,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
            WHERE label IS NOT NULL AND embedding IS NOT NULL
        ),
        c AS (
            SELECT label, i, ROUND(AVG(e), 6) AS c
            FROM u GROUP BY label, i
        )
        SELECT CAST(a.label AS BIGINT) AS label_a,
               CAST(b.label AS BIGINT) AS label_b,
               ROUND(sqrt(SUM((a.c - b.c) * (a.c - b.c))), 4) AS dist
        FROM c a JOIN c b ON a.i = b.i AND a.label < b.label
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "embedding_norms_labels": """
        WITH n AS (
            SELECT label,
                   sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                       AS nrm
            FROM embeddings
            WHERE label IS NOT NULL AND embedding IS NOT NULL
        )
        SELECT CAST(label AS BIGINT) AS label,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               ROUND(fsum(nrm) / COUNT(*), 4) AS avg_norm,
               ROUND(MIN(nrm), 4) AS min_norm,
               ROUND(MAX(nrm), 4) AS max_norm
        FROM n GROUP BY label ORDER BY label
    """,
    "label_centroids_embeddings": """
        WITH u AS (
            SELECT label,
                   unnest(embedding) AS e,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
            WHERE label IS NOT NULL AND embedding IS NOT NULL
        )
        SELECT label, i, ROUND(AVG(e), 6) AS c
        FROM u GROUP BY label, i ORDER BY label, i
    """,
    "ann_topk_embeddings": """
        WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               ROUND(list_cosine_similarity(embedding::DOUBLE[], (SELECT qe FROM q)::DOUBLE[]), 4) AS cos
        FROM embeddings
        WHERE vec_id <> 0
        ORDER BY cos DESC, vec_id ASC
        LIMIT 10
    """,
    # ann_lsh_embeddings: approximate engine-defined op, rows-only.
    "silhouette_labels_embeddings": """
        WITH u AS (
            SELECT vec_id, label,
                   CAST(unnest(embedding) AS DOUBLE) AS e,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
            WHERE label IS NOT NULL AND embedding IS NOT NULL
        ),
        c AS (
            SELECT label AS clabel, i, ROUND(AVG(e), 6) AS c
            FROM u GROUP BY label, i
        ),
        d AS (
            SELECT u.vec_id, u.label, c.clabel,
                   sqrt(SUM((u.e - c.c) * (u.e - c.c))) AS dist
            FROM u JOIN c USING (i)
            GROUP BY 1, 2, 3
        ),
        ab AS (
            SELECT vec_id, label,
                   MAX(CASE WHEN clabel = label THEN dist END) AS a,
                   MIN(CASE WHEN clabel <> label THEN dist END) AS b
            FROM d GROUP BY 1, 2
        ),
        s AS (
            SELECT label,
                   CASE WHEN b IS NULL THEN NULL
                        WHEN greatest(a, b) > 0
                            THEN (b - a) / greatest(a, b)
                        ELSE 0.0 END AS s
            FROM ab
        )
        SELECT CAST(label AS BIGINT) AS label,
               CAST(COUNT(*) AS BIGINT) AS n_vectors,
               ROUND(fsum(s) / COUNT(s), 6) AS mean_silhouette
        FROM s GROUP BY 1 ORDER BY 1
    """,
}
