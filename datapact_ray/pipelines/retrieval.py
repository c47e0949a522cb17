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


QUERIES = {"bm25_topk_documents": bm25_topk_documents}
ORACLE_SQL = {"bm25_topk_documents": _bm25_sql()}
