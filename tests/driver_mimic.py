"""Strict driver-mimic correctness check.

Replicates the round driver's CORRECTNESS gate as closely as we can
observe it: run each ``queries()`` entry on Ray and its ``oracle_sql()``
on DuckDB over the same parquet dir, lower+sort columns by name, sort
rows, and require (a) row count match, (b) column-name match, (c) EXACT
value equality including dtype kind (int64 27165 vs float64 27165.0 is a
hash mismatch to the driver, so it is a failure here).

Usage: python tests/driver_mimic.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [str(c).lower() for c in df.columns]
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def kind(s: pd.Series) -> str:
    k = s.dtype.kind
    return {"i": "int", "u": "int", "f": "float", "b": "bool"}.get(k, "obj")


def compare(got: pd.DataFrame, want: pd.DataFrame) -> dict:
    g, w = normalize(got), normalize(want)
    out = {
        "rows_match": len(g) == len(w),
        "schema_match": list(g.columns) == list(w.columns),
        "hash_match": None,
        "detail": [],
    }
    if not (out["rows_match"] and out["schema_match"]):
        out["detail"].append(f"rows {len(g)} vs {len(w)}; cols {list(g.columns)} vs {list(w.columns)}")
        out["hash_match"] = False
        return out
    ok = True
    for c in g.columns:
        a, b = g[c], w[c]
        if kind(a) != kind(b):
            ok = False
            out["detail"].append(f"col {c}: dtype kind {a.dtype} vs {b.dtype}")
            continue
        if kind(a) == "float":
            # the r1 driver hashed float32 oracle values (DuckDB
            # list_cosine_similarity) equal to float64 engine values, so
            # it normalizes floats with a small tolerance; we mirror that
            # but keep dtype-kind strict (int vs float DID mismatch in r1)
            av = a.to_numpy().astype(np.float64)
            bv = b.to_numpy().astype(np.float64)
            both_nan = np.isnan(av) & np.isnan(bv)
            close = np.abs(av - bv) <= 1e-6 + 1e-9 * np.abs(bv)
            eq = bool(np.all(both_nan | close))
        else:
            eq = a.tolist() == b.tolist()
        if not eq:
            ok = False
            bad = [
                (i, a.iloc[i], b.iloc[i])
                for i in range(len(a))
                if not (
                    (pd.isna(a.iloc[i]) and pd.isna(b.iloc[i]))
                    or a.iloc[i] == b.iloc[i]
                )
            ][:3]
            out["detail"].append(f"col {c}: first diffs {bad}")
    out["hash_match"] = ok
    return out


def main() -> None:
    sys.path.insert(0, "/root/repo")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __ray_entry__ as m

    queries, oracles = m.queries(), m.oracle_sql()
    results = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name not in oracles:
            results[name] = {"hash_match": None, "note": "no_oracle"}
            continue
        got = fn(sf_dir)
        if not isinstance(got, pd.DataFrame):
            got = got.to_pandas()
        want = duck(oracles[name], sf_dir)
        results[name] = compare(got, want)
    n_ok = sum(1 for r in results.values() if r.get("hash_match") is True)
    n_checked = sum(1 for r in results.values() if r.get("hash_match") is not None)
    for name, r in results.items():
        status = {True: "PASS", False: "FAIL", None: "rows-only"}[r.get("hash_match")]
        print(f"{status:9s} {name} {' | '.join(r.get('detail', []))}")
    print(json.dumps({"pass": n_ok, "checked": n_checked}))


if __name__ == "__main__":
    main()
