"""Relevance ranking over the document corpus: exact BM25 top-k.

Engine extension mandated by the build brief (similarity/search over
training-data tables — the lexical counterpart of ``pipelines/ann``'s
embedding search; the reference has no retrieval operator, cf. its SQL
check inventory under ``/root/reference/datapact/``).

Cross-engine exactness uses the same discipline as
``text.unigram_logprob_documents``: every floating-point quantity is
produced by an IDENTICAL expression tree over exact integers in both
engines (one division per ratio, fixed left-to-right term sum), so
numpy and DuckDB compute bit-equal doubles and the driver's value-hash
matches without tolerance. The idf is the Lucene/ES variant
``ln(1 + (N - df + 0.5)/(df + 0.5))`` — strictly positive, so common
terms dilute rather than invert the ranking.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["bm25_topk_documents"]

# k1 = 1.2, b = 0.75 — written as the literals 2.2 / 1.2 / 0.25 / 0.75
# at the use sites so engine and oracle parse identical doubles


def _tf_counts(padded: pd.Series, term: str) -> np.ndarray:
    """Exact whitespace-token term frequency, vectorized: count of
    ``' term'`` followed by a space in the space-padded text (the
    lookahead keeps consecutive occurrences from consuming each other's
    boundary — ``'a a a'`` counts 3)."""
    return (
        padded.str.count(" " + re.escape(term) + "(?= )")
        .to_numpy()
        .astype(np.float64)
    )


def bm25_topk_documents(
    sf_dir: str, query: str = "hash join filter", k: int = 20
) -> pd.DataFrame:
    """BM25 top-k documents for a fixed query (k1=1.2, b=0.75).

    Two narrow passes, nothing data-sized leaves the scan tasks:

    1. corpus statistics — each task reduces its batch to ONE row
       (doc count, token total, per-term document frequency); the
       driver derives ``avgdl`` and the per-term idf once.
    2. score + local top-k prune — each task scores its docs
       vectorized against the (tiny, closure-captured) idf table and
       keeps only its k best under the total order
       (score DESC, doc_id ASC); the global top-k is a subset of the
       union of local top-ks, so the driver merge sees ≤ k·n_tasks
       candidate rows, never the corpus.

    At production scale pass 1's term stats come from the persisted
    document-frequency vocabulary (``doc_freq_top_terms_documents``)
    instead of a dedicated scan.
    """
    from ..shuffle import map_partials
    from ._util import round_duck

    terms = query.split()
    path = f"{sf_dir}/documents.parquet"
    cols = ["doc_id", "text"]

    def _prep(batch: pa.Table):
        df = batch.to_pandas().dropna(subset=["doc_id", "text"])
        txt = df["text"].astype(str)
        return df, txt, " " + txt + " "

    def stats_partial(batch: pa.Table) -> pd.DataFrame:
        df, txt, padded = _prep(batch)
        row = {
            "n_docs": len(df),
            "total_tokens": int((txt.str.count(" ") + 1).sum()) if len(df) else 0,
        }
        for i, t in enumerate(terms):
            row[f"df{i}"] = int((_tf_counts(padded, t) > 0).sum()) if len(df) else 0
        return pd.DataFrame([row])

    agg = map_partials(path, cols, None, stats_partial).sum()
    n = int(agg["n_docs"])
    if n == 0:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"), "bm25": pd.Series([], dtype="float64")}
        )
    avgdl = int(agg["total_tokens"]) * 1.0 / n
    idf = [
        math.log(1 + (n - int(agg[f"df{i}"]) + 0.5) / (int(agg[f"df{i}"]) + 0.5))
        for i in range(len(terms))
    ]

    def score_prune(batch: pa.Table) -> pd.DataFrame:
        df, txt, padded = _prep(batch)
        if not len(df):
            return pd.DataFrame({"doc_id": [], "score": []})
        dl = (txt.str.count(" ") + 1).to_numpy().astype(np.float64)
        score = np.zeros(len(df))
        for i, t in enumerate(terms):
            tf = _tf_counts(padded, t)
            # identical tree AND identical literals to the SQL oracle
            # (2.2 = k1+1, 0.25 = 1-b written as parsed constants so
            # both engines start from bit-equal doubles)
            score = score + idf[i] * (tf * 2.2) / (
                tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))
            )
        out = pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64").to_numpy(), "score": score}
        )
        return out.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="stable"
        ).head(k)

    cand = map_partials(path, cols, None, score_prune)
    top = cand.sort_values(
        ["score", "doc_id"], ascending=[False, True], kind="stable"
    ).head(k)
    return pd.DataFrame(
        {
            "doc_id": top["doc_id"].to_numpy(),
            "bm25": [float(round_duck(s, 4)) for s in top["score"]],
        }
    ).reset_index(drop=True)


def _bm25_sql(query: str = "hash join filter", k: int = 20) -> str:
    terms = query.split()
    tf_cols = ",\n               ".join(
        f"CAST(SUM(CASE WHEN token = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"COUNT(DISTINCT CASE WHEN token = '{t}' THEN doc_id END) AS df{i}"
        for i, t in enumerate(terms)
    )
    score = "\n               + ".join(
        f"LN(1 + (st.n - f.df{i} + 0.5) / (f.df{i} + 0.5))"
        f" * (tf.tf{i} * 2.2)"
        f" / (tf.tf{i} + 1.2 * (0.25 + 0.75 * (d.dl / (st.total * 1.0 / st.n))))"
        for i in range(len(terms))
    )
    return f"""
        WITH d AS (
            SELECT doc_id, text,
                   LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS dl
            FROM documents
            WHERE text IS NOT NULL AND doc_id IS NOT NULL
        ), toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM d
        ), tf AS (
            SELECT doc_id,
               {tf_cols}
            FROM toks GROUP BY doc_id
        ), st AS (
            SELECT COUNT(*) AS n, SUM(dl) AS total FROM d
        ), f AS (
            SELECT {df_cols} FROM toks
        ), scored AS (
            SELECT d.doc_id,
               {score} AS score
            FROM d JOIN tf USING (doc_id) CROSS JOIN st CROSS JOIN f
        )
        SELECT doc_id, ROUND(score, 4) AS bm25
        FROM scored ORDER BY score DESC, doc_id ASC LIMIT {k}
    """


def dirichlet_ql_topk_documents(
    sf_dir: str, query: str = "hash join filter", k: int = 20, mu: float = 2000.0
) -> pd.DataFrame:
    """Dirichlet-smoothed query-likelihood top-k (Zhai & Lafferty 2001)
    — the language-model ranking companion of BM25, the second classic
    lexical scorer a retrieval stack offers.

    score(d) = Σ_t ln( (tf_t + µ·(cf_t/|C|)) / (dl + µ) )

    Same two-pass shape as BM25: pass 1 reduces each scan task to ONE
    corpus-stats row (docs, tokens, per-term COLLECTION frequency —
    Dirichlet smooths by cf, not df); pass 2 scores vectorized and
    local-top-k-prunes, so the driver merge sees ≤ k·n_tasks rows. Every
    pre-log quantity is the identical expression tree over exact
    integers in both engines; the per-doc LN itself is libm-vs-DuckDB
    (≤1 ulp) — empirical at the 4-dp pin, like the cosine family."""
    from ..shuffle import map_partials
    from ._util import round_duck

    terms = query.split()
    path = f"{sf_dir}/documents.parquet"
    cols = ["doc_id", "text"]

    def _prep(batch: pa.Table):
        df = batch.to_pandas().dropna(subset=["doc_id", "text"])
        txt = df["text"].astype(str)
        return df, txt, " " + txt + " "

    def stats_partial(batch: pa.Table) -> pd.DataFrame:
        df, txt, padded = _prep(batch)
        row = {
            "n_docs": len(df),
            "total_tokens": int((txt.str.count(" ") + 1).sum()) if len(df) else 0,
        }
        for i, t in enumerate(terms):
            row[f"cf{i}"] = int(_tf_counts(padded, t).sum()) if len(df) else 0
        return pd.DataFrame([row])

    agg = map_partials(path, cols, None, stats_partial).sum()
    total = int(agg["total_tokens"])
    if total == 0:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "ql": pd.Series([], dtype="float64"),
            }
        )
    # cf/|C| as ONE division over exact integers (both engines)
    p_c = [int(agg[f"cf{i}"]) * 1.0 / total for i in range(len(terms))]

    def score_prune(batch: pa.Table) -> pd.DataFrame:
        df, txt, padded = _prep(batch)
        if not len(df):
            return pd.DataFrame({"doc_id": [], "score": []})
        dl = (txt.str.count(" ") + 1).to_numpy().astype(np.float64)
        score = np.zeros(len(df))
        for i, t in enumerate(terms):
            tf = _tf_counts(padded, t)
            score = score + np.log((tf + 2000.0 * p_c[i]) / (dl + 2000.0))
        out = pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64").to_numpy(), "score": score}
        )
        return out.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="stable"
        ).head(k)

    cand = map_partials(path, cols, None, score_prune)
    top = cand.sort_values(
        ["score", "doc_id"], ascending=[False, True], kind="stable"
    ).head(k)
    return pd.DataFrame(
        {
            "doc_id": top["doc_id"].to_numpy(),
            "ql": [float(round_duck(s, 4)) for s in top["score"]],
        }
    ).reset_index(drop=True)


def _dirichlet_sql(query: str = "hash join filter", k: int = 20) -> str:
    terms = query.split()
    tf_cols = ",\n               ".join(
        f"CAST(SUM(CASE WHEN token = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS tf{i}"
        for i, t in enumerate(terms)
    )
    cf_cols = ", ".join(
        f"CAST(SUM(CASE WHEN token = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS cf{i}"
        for i, t in enumerate(terms)
    )
    score = "\n               + ".join(
        f"LN((tf.tf{i} + 2000.0 * (f.cf{i} * 1.0 / st.total)) / (d.dl + 2000.0))"
        for i in range(len(terms))
    )
    return f"""
        WITH d AS (
            SELECT doc_id, text,
                   LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS dl
            FROM documents
            WHERE text IS NOT NULL AND doc_id IS NOT NULL
        ), toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM d
        ), tf AS (
            SELECT doc_id,
               {tf_cols}
            FROM toks GROUP BY doc_id
        ), st AS (
            SELECT SUM(dl) AS total FROM d
        ), f AS (
            SELECT {cf_cols} FROM toks
        ), scored AS (
            SELECT d.doc_id,
               {score} AS score
            FROM d JOIN tf USING (doc_id) CROSS JOIN st CROSS JOIN f
        )
        SELECT doc_id, ROUND(score, 4) AS ql
        FROM scored ORDER BY score DESC, doc_id ASC LIMIT {k}
    """


def rrf_hybrid_topk_documents(
    sf_dir: str, k: int = 10, depth: int = 20, k_rrf: int = 60
) -> pd.DataFrame:
    """Hybrid dense+sparse retrieval via Reciprocal Rank Fusion
    (Cormack, Clarke & Buettcher, SIGIR 2009): fuse the BM25 lexical
    top-``depth`` with the embedding-cosine top-``depth`` (doc_id and
    vec_id are aligned ids) as Σ 1/(k_rrf + rank) over the lists a doc
    appears in — the standard first fusion a RAG/retrieval stack ships.

    Rank parity is INHERITED: both input lists are the already
    oracle-checked queries (`bm25_topk_documents`,
    `ann_topk_embeddings`-shaped cosine at ``depth``) with their total
    orders (score DESC, id ASC), and the fusion arithmetic is exact
    small-integer division summed in fixed list order."""
    from ._util import round_duck
    from .ann import ann_topk_embeddings

    # rank on the ROUNDED published scores (id tiebreak) — the exact
    # total order the two oracle-checked lists expose, so rank parity
    # never depends on sub-rounding float differences
    bm = bm25_topk_documents(sf_dir, k=depth).sort_values(
        ["bm25", "doc_id"], ascending=[False, True], kind="stable"
    )
    cos = ann_topk_embeddings(sf_dir, k=depth).sort_values(
        ["cos", "vec_id"], ascending=[False, True], kind="stable"
    )
    rank_b = {int(d): r + 1 for r, d in enumerate(bm["doc_id"])}
    rank_c = {int(d): r + 1 for r, d in enumerate(cos["vec_id"])}
    docs = sorted(set(rank_b) | set(rank_c))
    rows = []
    for d in docs:
        rb, rc = rank_b.get(d), rank_c.get(d)
        s = (1.0 / (k_rrf + rb) if rb else 0.0) + (
            1.0 / (k_rrf + rc) if rc else 0.0
        )
        rows.append((d, s))
    out = pd.DataFrame(rows, columns=["doc_id", "rrf"]).sort_values(
        ["rrf", "doc_id"], ascending=[False, True], kind="stable"
    ).head(k)
    out["rrf"] = [float(round_duck(s, 6)) for s in out["rrf"]]
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.reset_index(drop=True)


def _rrf_sql(
    query: str = "hash join filter", k: int = 10, depth: int = 20, k_rrf: int = 60
) -> str:
    bm25 = _bm25_sql(query, depth)
    return f"""
        WITH bm AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS r
            FROM ({bm25})
        ), q AS (
            SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
        ), cs AS (
            SELECT vec_id AS doc_id,
                   ROW_NUMBER() OVER (ORDER BY c DESC, vec_id ASC) AS r
            FROM (
                SELECT vec_id,
                       ROUND(list_cosine_similarity(
                           embedding::DOUBLE[], (SELECT qe FROM q)::DOUBLE[]
                       ), 4) AS c
                FROM embeddings WHERE vec_id <> 0
                ORDER BY c DESC, vec_id ASC
                LIMIT {depth}
            )
        ), fused AS (
            SELECT COALESCE(bm.doc_id, cs.doc_id) AS doc_id,
                   COALESCE(1.0 / ({k_rrf} + bm.r), 0.0)
                   + COALESCE(1.0 / ({k_rrf} + cs.r), 0.0) AS rrf
            FROM bm FULL OUTER JOIN cs ON bm.doc_id = cs.doc_id
        )
        SELECT doc_id, ROUND(rrf, 6) AS rrf
        FROM fused ORDER BY rrf DESC, doc_id ASC LIMIT {k}
    """


def tf_cosine_topk_documents(
    sf_dir: str, query_doc_id: int = 0, k: int = 20
) -> pd.DataFrame:
    """Vector-space-model retrieval: top-k documents by exact cosine
    similarity between whole-document term-frequency vectors — the
    doc-to-doc lexical analog of ``ann.ann_topk_embeddings`` (there the
    query is a dense embedding; here it is the sparse TF vector of a
    pivot document). The classic "more like this" query.

    Shuffle-free broadcast shape: the query document is fetched with a
    row-group-filtered read (like ``ann._query_vector``), its TF map
    (unique token hashes + counts, vocabulary-sized) rides in the
    pickled batch fn, and each scan task scores its docs vectorized —
    dot product via one searchsorted lookup per token position +
    bincount segment-sum, ‖d‖² via one (doc, token-hash) C groupby —
    then local-top-k-prunes, so the driver merge sees ≤ k·n_tasks rows.
    Nothing data-sized leaves the scan wave and nothing shuffles.

    Cross-engine exactness: dot, ‖q‖² and ‖d‖² are exact integers on
    both engines, and cosine = double(dot) / sqrt(double(‖q‖²·‖d‖²)) is
    the IDENTICAL two-op tree (IEEE sqrt + divide on bit-equal inputs),
    so the doubles match bit-for-bit — no rounding pin needed. The
    total order (cosine DESC, doc_id ASC) is therefore identical too.
    Tokenization is ``str.split(' ')`` on BOTH engines (pandas split
    mirrors DuckDB ``string_split(text, ' ')`` exactly, including empty
    segments from repeated spaces). Token identity rides 64-bit
    siphashes — same empirical collision-free contract as
    ``dedup.dedup_exact_documents``. Raises KeyError when the pivot
    document is absent (cf. the ANN family's loud-query contract).

    Reference analog: none (the reference validates, it does not rank);
    engine extension mandated by the build brief's similarity-search
    requirement.
    """
    from ..shuffle import map_partials
    from ._tokens import token_hashes

    path = f"{sf_dir}/documents.parquet"
    qt = pq.read_table(
        path, columns=["doc_id", "text"],
        filters=[("doc_id", "==", query_doc_id)],
    )
    if qt.num_rows == 0:
        raise KeyError(f"query doc_id={query_doc_id} not found")
    qtext = qt.column("text")[0].as_py()
    if qtext is None:
        raise KeyError(f"query doc_id={query_doc_id} has NULL text")
    qtok = pd.Series(qtext.split(" "))
    qvc = qtok.value_counts()
    qh = token_hashes(pd.Series(qvc.index))
    order = np.argsort(qh, kind="stable")
    q_hashes = qh[order]
    q_counts = qvc.to_numpy()[order].astype(np.int64)
    q_norm2 = int((q_counts**2).sum())

    def score_prune(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["doc_id", "text"])
        df = df[df["doc_id"] != query_doc_id]
        if not len(df):
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "cosine": pd.Series([], dtype="float64")}
            )
        lists = df["text"].astype(str).str.split(" ")
        counts = lists.str.len().to_numpy().astype(np.int64)
        flat = lists.explode()
        th = token_hashes(flat)
        doc_idx = np.repeat(np.arange(len(df)), counts)
        # dot(d, q) = Σ over token positions of q_tf(token)
        pos = np.searchsorted(q_hashes, th).clip(0, len(q_hashes) - 1)
        contrib = np.where(q_hashes[pos] == th, q_counts[pos], 0)
        dot = np.bincount(
            doc_idx, weights=contrib, minlength=len(df)
        ).astype(np.int64)
        # ‖d‖² = Σ_t tf² via one C groupby over (doc, token-hash)
        g = (
            pd.DataFrame({"d": doc_idx, "h": th})
            .groupby(["d", "h"], sort=False)
            .size()
        )
        norm2 = np.bincount(
            g.index.get_level_values(0).to_numpy(),
            weights=g.to_numpy() ** 2,
            minlength=len(df),
        ).astype(np.int64)
        cos = dot.astype(np.float64) / np.sqrt(
            (q_norm2 * norm2).astype(np.float64)
        )
        out = pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64").to_numpy(), "cosine": cos}
        )
        return out.sort_values(
            ["cosine", "doc_id"], ascending=[False, True], kind="stable"
        ).head(k)

    cand = map_partials(path, ["doc_id", "text"], None, score_prune)
    if not len(cand):
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "cosine": pd.Series([], dtype="float64")}
        )
    top = cand.sort_values(
        ["cosine", "doc_id"], ascending=[False, True], kind="stable"
    ).head(k)
    return top.reset_index(drop=True)


def _tf_cosine_sql(query_doc_id: int = 0, k: int = 20) -> str:
    return f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS t
            FROM documents
            WHERE text IS NOT NULL AND doc_id IS NOT NULL
        ), tf AS (
            SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS c
            FROM tok GROUP BY 1, 2
        ), q AS (
            SELECT t, c AS qc FROM tf WHERE doc_id = {query_doc_id}
        ), qn AS (
            SELECT CAST(SUM(qc * qc) AS BIGINT) AS qn2 FROM q
        ), n2 AS (
            SELECT doc_id, CAST(SUM(c * c) AS BIGINT) AS n2
            FROM tf WHERE doc_id <> {query_doc_id} GROUP BY 1
        ), dot AS (
            SELECT tf.doc_id, CAST(SUM(tf.c * q.qc) AS BIGINT) AS d
            FROM tf JOIN q ON tf.t = q.t
            WHERE tf.doc_id <> {query_doc_id}
            GROUP BY 1
        )
        SELECT n2.doc_id AS doc_id,
               CAST(COALESCE(dot.d, 0) AS DOUBLE)
                   / SQRT(CAST(qn.qn2 * n2.n2 AS DOUBLE)) AS cosine
        FROM n2 LEFT JOIN dot ON n2.doc_id = dot.doc_id CROSS JOIN qn
        ORDER BY cosine DESC, doc_id ASC
        LIMIT {k}
    """


def pmi_cooccurrence_documents(
    sf_dir: str, vocab: int = 30, k_pairs: int = 20
) -> pd.DataFrame:
    """Query-expansion co-occurrence: top term pairs by pointwise mutual
    information, PMI = ln(N·c_ab / (c_a·c_b)) over document-level
    presence counts — the statistic behind "users who searched X also
    meant Y" expansion tables and compound-phrase mining.

    Two passes, neither pair-sized on the wire: (1) the existing
    doc-frequency census selects the top-``vocab`` terms (cnt desc,
    token asc — the same total order as the oracle's LIMIT); (2) one
    scan builds a per-batch doc×term presence matrix for ONLY those
    terms and folds it to a single vocab×vocab int64 co-occurrence
    matmul — each task ships ≤ vocab² fixed-width rows regardless of
    corpus size, and the diagonal carries the per-term doc frequencies
    so the driver never rejoins pass 1.

    Exactness: counts are exact integers; PMI is built as
    float(N·c_ab)/float(c_a·c_b) then one libm log — the same
    CAST/CAST/divide/LN tree DuckDB evaluates, so the double is
    bit-identical (oracle pins the default vocab/k). Pair order is
    lexicographic (term_a < term_b), matching SQL's binary collation on
    ASCII whitespace tokens."""
    from ..shuffle import map_partials
    from .text import doc_freq_top_terms_documents

    empty = pd.DataFrame(
        {
            "term_a": pd.Series([], dtype="object"),
            "term_b": pd.Series([], dtype="object"),
            "n_docs_both": pd.Series([], dtype="int64"),
            "pmi": pd.Series([], dtype="float64"),
        }
    )
    top = doc_freq_top_terms_documents(sf_dir, k=vocab)
    if not len(top):
        return empty
    terms = top["token"].tolist()
    tid = {t: i for i, t in enumerate(terms)}
    v = len(terms)

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["text"])
        if not len(df):
            return pd.DataFrame({"i": [], "j": [], "c": []})
        toks = df["text"].astype(str).str.split(" ")
        flat = pd.DataFrame(
            {
                "d": np.repeat(
                    np.arange(len(df)), toks.str.len().to_numpy()
                ),
                "token": toks.explode().to_numpy().astype(str),
            }
        ).drop_duplicates()
        flat["tid"] = flat["token"].map(tid)
        flat = flat.dropna(subset=["tid"])
        m = np.zeros((len(df), v), dtype=np.int64)
        if len(flat):
            m[flat["d"].to_numpy(), flat["tid"].to_numpy().astype(np.int64)] = 1
        c = m.T @ m  # exact int64 co-occurrence incl. per-term df diagonal
        i, j = np.nonzero(np.triu(c))
        out = pd.DataFrame({"i": i, "j": j, "c": c[i, j]})
        # N rides the same partial as a sentinel row
        out = pd.concat(
            [out, pd.DataFrame({"i": [-1], "j": [-1], "c": [len(df)]})],
            ignore_index=True,
        )
        return out

    parts = map_partials(
        f"{sf_dir}/documents.parquet", ["doc_id", "text"], None, partial
    )
    if not len(parts):
        return empty
    g = parts.groupby(["i", "j"], as_index=False)["c"].sum()
    n_docs = int(g.loc[(g["i"] == -1) & (g["j"] == -1), "c"].sum())
    g = g[g["i"] >= 0]
    diag = {
        int(r.i): int(r.c) for r in g[g["i"] == g["j"]].itertuples()
    }
    pairs = g[g["i"] < g["j"]]
    if not len(pairs):
        return empty
    rows = []
    for r in pairs.itertuples():
        ta, tb = terms[int(r.i)], terms[int(r.j)]
        if tb < ta:
            ta, tb = tb, ta
        ca, cb = diag[int(r.i)], diag[int(r.j)]
        cab = int(r.c)
        # CAST(N*cab AS DOUBLE) / CAST(ca*cb AS DOUBLE), then one LN —
        # the oracle's exact expression tree
        rows.append(
            (ta, tb, cab, math.log(float(n_docs * cab) / float(ca * cb)))
        )
    out = pd.DataFrame(rows, columns=["term_a", "term_b", "n_docs_both", "pmi"])
    out["n_docs_both"] = out["n_docs_both"].astype("int64")
    out = out.sort_values(
        ["pmi", "term_a", "term_b"], ascending=[False, True, True],
        kind="stable",
    ).head(k_pairs)
    return out.reset_index(drop=True)


def _pmi_sql(vocab: int = 30, k_pairs: int = 20) -> str:
    return f"""
        WITH d AS (
            SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents WHERE text IS NOT NULL
            )
        ), df AS (
            SELECT tok, COUNT(*) AS c FROM d GROUP BY tok
        ), top AS (
            SELECT tok, c FROM df ORDER BY c DESC, tok ASC LIMIT {vocab}
        ), n AS (
            SELECT COUNT(*) AS nn FROM documents WHERE text IS NOT NULL
        ), p AS (
            SELECT a.tok AS ta, b.tok AS tb, COUNT(*) AS cab
            FROM d a
            JOIN d b ON a.doc_id = b.doc_id AND a.tok < b.tok
            WHERE a.tok IN (SELECT tok FROM top)
              AND b.tok IN (SELECT tok FROM top)
            GROUP BY 1, 2
        )
        SELECT p.ta AS term_a, p.tb AS term_b,
               CAST(p.cab AS BIGINT) AS n_docs_both,
               LN(CAST(n.nn * p.cab AS DOUBLE)
                  / CAST(t1.c * t2.c AS DOUBLE)) AS pmi
        FROM p
        JOIN top t1 ON t1.tok = p.ta
        JOIN top t2 ON t2.tok = p.tb
        CROSS JOIN n
        ORDER BY pmi DESC, term_a ASC, term_b ASC
        LIMIT {k_pairs}
    """


def _doc_df_projector(nb: int):
    """Shared scan-task projector for document-frequency exchanges: each
    task dedups (doc, token) inside the batch (documents never span
    batches, so per-batch doc-distinct counts sum exactly) and emits
    (token, cnt, __bucket) partials into the token-hash exchange —
    a token's every partial lands in one bucket, so per-bucket sums are
    the EXACT global df. Used by postings_histogram / shard_balance /
    stoplist_coverage."""
    from .text import _bucket_of_keys

    def projector(batch: pa.Table) -> pd.DataFrame:
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

    return projector


def postings_histogram_documents(sf_dir: str) -> pd.DataFrame:
    """Inverted-index sizing census: how many terms have a postings list
    (document frequency) in each power-of-two band — the distribution
    that decides skip-list thresholds, stop-lists and per-term
    compression choices before building a search index over the corpus.

    One scan emits per-task doc-distinct (token, cnt) partials into the
    token-hash bucket exchange (a token's every partial lands in one
    bucket, so per-bucket sums are the EXACT global df); each bucket
    folds its terms to ≤ ladder-width (band, n_terms, postings) rows via
    the same frexp-exact ⌊log₂⌋ as the length census, so the driver
    merge is ladder×buckets-sized regardless of vocabulary."""
    from .dedup import _dedup_buckets, _fused_grouped_frames
    from .text import _bucket_of_keys

    nb = _dedup_buckets()

    projector = _doc_df_projector(nb)

    def bucket_hist(df: pd.DataFrame) -> pd.DataFrame:
        dfreq = df.groupby("token")["cnt"].sum().to_numpy().astype("int64")
        band = (np.frexp(dfreq.astype(np.float64))[1] - 1).astype("int64")
        return (
            pd.DataFrame({"band": band, "one": 1, "post": dfreq})
            .groupby("band", as_index=False)
            .agg(n_terms=("one", "sum"), total_postings=("post", "sum"))
        )

    parts = _fused_grouped_frames(
        [(f"{sf_dir}/documents.parquet", ["doc_id", "text"], None, projector)],
        nb,
        bucket_hist,
    )
    if not len(parts):
        return pd.DataFrame(
            {
                "band": pd.Series([], dtype="int64"),
                "n_terms": pd.Series([], dtype="int64"),
                "total_postings": pd.Series([], dtype="int64"),
            }
        )
    out = (
        parts.groupby("band", as_index=False)
        .agg(n_terms=("n_terms", "sum"), total_postings=("total_postings", "sum"))
        .astype({"band": "int64", "n_terms": "int64", "total_postings": "int64"})
    )
    return out.sort_values("band").reset_index(drop=True)


def _postings_hist_sql(max_band: int = 40) -> str:
    ladder = "\n                ".join(
        f"WHEN c < {1 << (b + 1)} THEN {b}" for b in range(max_band)
    )
    return f"""
        WITH d AS (
            SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents WHERE text IS NOT NULL
            )
        ), df AS (
            SELECT tok, COUNT(*) AS c FROM d GROUP BY tok
        ), b AS (
            SELECT CASE
                {ladder}
                ELSE {max_band} END AS band, c
            FROM df
        )
        SELECT CAST(band AS BIGINT) AS band,
               CAST(COUNT(*) AS BIGINT) AS n_terms,
               CAST(SUM(c) AS BIGINT) AS total_postings
        FROM b GROUP BY 1 ORDER BY 1
    """


def shard_balance_documents(sf_dir: str, n_shards: int = 16) -> pd.DataFrame:
    """Distributed-index shard-balance audit: assign every term to one of
    ``n_shards`` index shards by the first md5 nibble (the placement rule
    a term-partitioned search index would use) and report each shard's
    term count, postings total (Σ document frequency) and hottest term —
    the skew check that decides whether term-hash placement needs salting
    BEFORE the index build ships terabytes to the wrong machine.

    Exchange shape = ``postings_histogram_documents``: per-task
    doc-distinct (token, cnt) partials through the token-hash bucket
    exchange (exact global df per term inside its bucket), then each
    bucket folds its vocabulary to ≤ ``n_shards`` integer rows, so the
    driver merge is shards×buckets-sized. The md5 is computed once per
    DISTINCT bucket term (vocabulary-sized, not corpus-sized)."""
    import hashlib

    from .dedup import _dedup_buckets, _fused_grouped_frames
    from .text import _bucket_of_keys

    nb = _dedup_buckets()

    projector = _doc_df_projector(nb)

    def bucket_fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", as_index=False)["cnt"].sum()
        shard = np.fromiter(
            (
                int(hashlib.md5(t.encode("utf-8")).hexdigest()[0], 16) % n_shards
                for t in g["token"]
            ),
            dtype=np.int64,
            count=len(g),
        )
        g["shard"] = shard
        return (
            g.groupby("shard", as_index=False)
            .agg(
                n_terms=("cnt", "size"),
                n_postings=("cnt", "sum"),
                max_term_df=("cnt", "max"),
            )
        )

    parts = _fused_grouped_frames(
        [(f"{sf_dir}/documents.parquet", ["doc_id", "text"], None, projector)],
        nb,
        bucket_fold,
    )
    empty = pd.DataFrame(
        {
            "shard": pd.Series([], dtype="int64"),
            "n_terms": pd.Series([], dtype="int64"),
            "n_postings": pd.Series([], dtype="int64"),
            "max_term_df": pd.Series([], dtype="int64"),
        }
    )
    if not len(parts):
        return empty
    out = (
        parts.groupby("shard", as_index=False)
        .agg(
            n_terms=("n_terms", "sum"),
            n_postings=("n_postings", "sum"),
            max_term_df=("max_term_df", "max"),
        )
        .astype(
            {
                "shard": "int64",
                "n_terms": "int64",
                "n_postings": "int64",
                "max_term_df": "int64",
            }
        )
    )
    return out.sort_values("shard").reset_index(drop=True)


def _shard_balance_sql(n_shards: int = 16) -> str:
    return f"""
        WITH d AS (
            SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents WHERE text IS NOT NULL
            )
        ), df AS (
            SELECT tok, COUNT(*) AS c FROM d GROUP BY tok
        ), s AS (
            SELECT (strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1)
                   % {n_shards} AS shard, c
            FROM df
        )
        SELECT CAST(shard AS BIGINT) AS shard,
               CAST(COUNT(*) AS BIGINT) AS n_terms,
               CAST(SUM(c) AS BIGINT) AS n_postings,
               CAST(MAX(c) AS BIGINT) AS max_term_df
        FROM s GROUP BY 1 ORDER BY 1
    """


def snippet_extraction_documents(
    sf_dir: str, phrase: str = "hash join", ctx: int = 20, k: int = 20
) -> pd.DataFrame:
    """Search-result snippet (KWIC) extraction: for every document
    containing the literal ``phrase``, the first match position and a
    ``ctx``-character window around it — the feature a retrieval stack
    computes at serving time for hit highlighting, here run corpus-wide
    as the audit of WHERE a phrase occurs (license headers at position
    1 mean boilerplate; mid-document means content).

    One scan: vectorized literal ``str.find`` + slice per batch (both
    codepoint-based, matching strpos/substr), per-task doc_id-ascending
    top-k prune, driver merges ≤ tasks×k rows — full snippets only ever
    exist for the k winners per task, never corpus-wide."""
    from ..shuffle import map_partials

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["doc_id", "text"])
        txt = df["text"].astype(str)
        pos = txt.str.find(phrase) + 1  # 1-based, 0 = no match
        m = pos > 0
        if not m.any():
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "pos": pd.Series([], dtype="int64"),
                    "snippet": pd.Series([], dtype="object"),
                }
            )
        sub = pd.DataFrame(
            {
                "doc_id": df.loc[m, "doc_id"].astype("int64"),
                "pos": pos[m].astype("int64"),
                "text": txt[m],
            }
        ).sort_values("doc_id").head(k)
        # substr(text, GREATEST(1, pos-ctx), len(phrase)+2*ctx): 1-based
        start = (sub["pos"] - ctx).clip(lower=1) - 1  # 0-based slice start
        width = len(phrase) + 2 * ctx
        sub["snippet"] = [
            t[s : s + width] for t, s in zip(sub["text"], start)
        ]
        return sub[["doc_id", "pos", "snippet"]]

    parts = map_partials(
        f"{sf_dir}/documents.parquet", ["doc_id", "text"], None, partial
    )
    if not len(parts):
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "pos": pd.Series([], dtype="int64"),
                "snippet": pd.Series([], dtype="object"),
            }
        )
    return (
        parts.sort_values("doc_id")
        .head(k)
        .reset_index(drop=True)
        .astype({"doc_id": "int64", "pos": "int64"})
    )


def _snippet_sql(phrase: str = "hash join", ctx: int = 20, k: int = 20) -> str:
    esc = phrase.replace("'", "''")
    return f"""
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(strpos(text, '{esc}') AS BIGINT) AS pos,
               substr(text, GREATEST(1, strpos(text, '{esc}') - {ctx}),
                      LENGTH('{esc}') + {2 * ctx}) AS snippet
        FROM documents
        WHERE text IS NOT NULL AND doc_id IS NOT NULL
          AND strpos(text, '{esc}') > 0
        ORDER BY doc_id LIMIT {k}
    """


def stoplist_coverage_documents(
    sf_dir: str, ks: tuple = (5, 10, 20, 50)
) -> pd.DataFrame:
    """Stop-list sizing table: what share of ALL postings do the top-k
    terms by document frequency consume? The classic index decision —
    dropping the 20 hottest terms often halves postings volume; this op
    quantifies exactly that trade at each candidate k.

    Same exchange as the df census: per-task doc-distinct (token, cnt)
    partials bucket by token hash, each bucket reduces to its local
    top-max(ks) terms PLUS one postings-subtotal row (the global top-k
    set is inside the union of bucket top-k because a term lives whole
    in one bucket; the subtotal rows make the denominator exact without
    shipping the vocabulary). Boundary ties break by term ASC on both
    engines."""
    from ._util import round_duck
    from .dedup import _dedup_buckets, _fused_grouped_frames
    from .text import _bucket_of_keys

    kmax = max(ks)
    nb = _dedup_buckets()

    projector = _doc_df_projector(nb)

    def bucket_fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", as_index=False)["cnt"].sum()
        top = g.sort_values(
            ["cnt", "token"], ascending=[False, True], kind="stable"
        ).head(kmax)
        top = top.assign(kind="top")
        subtotal = pd.DataFrame(
            {"token": [""], "cnt": [int(g["cnt"].sum())], "kind": ["tot"]}
        )
        return pd.concat([top, subtotal], ignore_index=True)

    parts = _fused_grouped_frames(
        [(f"{sf_dir}/documents.parquet", ["doc_id", "text"], None, projector)],
        nb,
        bucket_fold,
    )
    empty = pd.DataFrame(
        {
            "k": pd.Series([], dtype="int64"),
            "topk_postings": pd.Series([], dtype="int64"),
            "total_postings": pd.Series([], dtype="int64"),
            "share": pd.Series([], dtype="float64"),
        }
    )
    if not len(parts):
        return empty
    total = int(parts.loc[parts["kind"] == "tot", "cnt"].sum())
    if total == 0:
        return empty
    top = (
        parts[parts["kind"] == "top"]
        .sort_values(["cnt", "token"], ascending=[False, True], kind="stable")
        .head(kmax)["cnt"]
        .to_numpy()
    )
    rows = []
    for k in sorted(ks):
        tk = int(top[:k].sum())
        rows.append(
            {
                "k": k,
                "topk_postings": tk,
                "total_postings": total,
                "share": float(round_duck(float(tk) / float(total), 6)),
            }
        )
    out = pd.DataFrame(rows)
    for c in ("k", "topk_postings", "total_postings"):
        out[c] = out[c].astype("int64")
    return out


def _stoplist_sql(ks: tuple = (5, 10, 20, 50)) -> str:
    legs = "\n        UNION ALL\n".join(
        f"""
        SELECT CAST({k} AS BIGINT) AS k,
               CAST((SELECT SUM(c) FROM r WHERE rn <= {k}) AS BIGINT)
                   AS topk_postings,
               CAST(t.p AS BIGINT) AS total_postings,
               ROUND(CAST((SELECT SUM(c) FROM r WHERE rn <= {k}) AS DOUBLE)
                     / CAST(t.p AS DOUBLE), 6) AS share
        FROM t"""
        for k in sorted(ks)
    )
    return f"""
        WITH d AS (
            SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents WHERE text IS NOT NULL
            )
        ),
        df AS (SELECT tok, COUNT(*) AS c FROM d GROUP BY tok),
        t AS (SELECT SUM(c) AS p FROM df),
        r AS (
            SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok ASC) AS rn
            FROM df
        )
        {legs}
        ORDER BY k
    """


# broadcast query terms for the coverage audit — substring semantics
# (LIKE '%t%'), chosen from the corpus vocabulary so coverage varies;
# the oracle SQL is GENERATED from this tuple so the sides cannot drift
_COVERAGE_TERMS: tuple[str, ...] = ("data", "spark", "vector", "the")


def query_coverage_documents(sf_dir: str) -> pd.DataFrame:
    """Query-term coverage histogram — for a broadcast set of k query
    terms, how many documents contain 0, 1, …, k of them (substring
    containment): the AND-vs-OR retrieval feasibility audit. A corpus
    where few docs reach full coverage forces OR semantics or query
    relaxation; near-total coverage means the terms are stopwords for
    this corpus and should leave the query plan.

    One vectorized ``match_substring`` per term per batch (compiled C
    scans — no tokenization, matching the oracle's LIKE), summed into a
    per-doc coverage count, folded to a ≤ (k+1)-row ``bincount``
    histogram per task; the driver merges integer partials. Exchange is
    k+1 integers per task regardless of corpus size."""
    import pyarrow.compute as pc

    from ..shuffle import map_partials

    k = len(_COVERAGE_TERMS)

    def partial(batch: pa.Table) -> pd.DataFrame:
        tbl = batch.filter(pc.is_valid(batch.column("text")))
        if tbl.num_rows == 0:
            return pd.DataFrame(
                {
                    "n_matched": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        col = tbl.column("text")
        cov = np.zeros(tbl.num_rows, dtype=np.int64)
        for t in _COVERAGE_TERMS:
            cov += (
                pc.match_substring(col, t)
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
        hist = np.bincount(cov, minlength=k + 1)
        return pd.DataFrame(
            {
                "n_matched": np.arange(k + 1, dtype=np.int64),
                "n": hist.astype(np.int64),
            }
        )

    parts = map_partials(
        f"{sf_dir}/documents.parquet", ["text"], None, partial
    )
    if not len(parts):
        return pd.DataFrame(
            {
                "n_matched": pd.Series([], dtype="int64"),
                "n_docs": pd.Series([], dtype="int64"),
            }
        )
    g = parts.groupby("n_matched", as_index=False).agg(n_docs=("n", "sum"))
    g = g[g["n_docs"] > 0]  # SQL GROUP BY has no zero-count groups
    g = g.astype({"n_matched": "int64", "n_docs": "int64"})
    return g.sort_values("n_matched").reset_index(drop=True)


def _query_coverage_sql() -> str:
    arms = " + ".join(
        f"(CASE WHEN text LIKE '%{t}%' THEN 1 ELSE 0 END)"
        for t in _COVERAGE_TERMS
    )
    return f"""
        SELECT n_matched, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM (
            SELECT CAST({arms} AS BIGINT) AS n_matched
            FROM documents WHERE text IS NOT NULL
        )
        GROUP BY n_matched ORDER BY n_matched
    """


QUERIES = {
    "bm25_topk_documents": bm25_topk_documents,
    "query_coverage_documents": query_coverage_documents,
    "stoplist_coverage_documents": stoplist_coverage_documents,
    "snippet_extraction_documents": snippet_extraction_documents,
    "shard_balance_documents": shard_balance_documents,
    "dirichlet_ql_topk_documents": dirichlet_ql_topk_documents,
    "rrf_hybrid_topk_documents": rrf_hybrid_topk_documents,
    "tf_cosine_topk_documents": tf_cosine_topk_documents,
    "pmi_cooccurrence_documents": pmi_cooccurrence_documents,
    "postings_histogram_documents": postings_histogram_documents,
}
ORACLE_SQL = {
    "query_coverage_documents": _query_coverage_sql(),
    "bm25_topk_documents": _bm25_sql(),
    "snippet_extraction_documents": _snippet_sql(),
    "stoplist_coverage_documents": _stoplist_sql(),
    "shard_balance_documents": _shard_balance_sql(),
    "dirichlet_ql_topk_documents": _dirichlet_sql(),
    "rrf_hybrid_topk_documents": _rrf_sql(),
    "tf_cosine_topk_documents": _tf_cosine_sql(),
    "pmi_cooccurrence_documents": _pmi_sql(),
    "postings_histogram_documents": _postings_hist_sql(),
}
