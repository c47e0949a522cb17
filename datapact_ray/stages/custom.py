"""Custom checks: user SQL run against both sides, result sets compared.

Reproduces the reference's custom_sql_tests semantics
(``validation.sql.j2:244-305``): the query runs independently against the
source and the target table, then the two result sets are compared with

* ``EXCEPT ALL`` both directions → multiset-difference counts + one
  sample row each (``:257-266,294-299``), implemented as a full-row
  groupby with per-side counts (diff = max(count_s - count_t, 0) summed);
* an order-insensitive hash: sha256 over the sorted list of per-row md5s
  of canonical JSON, ``'EMPTY'`` for empty results (``:267-292``).

Execution engine: DuckDB on the driver, with BOTH sides' parquet files
registered in ONE connection (views ``src`` and ``tgt``). Custom SQL
results are aggregates by construction in the reference's usage, so they
are small; the heavy scan work stays inside DuckDB's vectorized reader.

Template rendering mirrors the reference's dual render contexts
(``/root/reference/datapact/sql_generator.py:56-84``): each custom query
is rendered TWICE — once as the "source" role, once as the "target"
role. ``{{ table_fqn }}``/``{{ table_name }}``/``{{ rendered_role }}``
flip per role, while ``{{ source_fqn }}``/``{{ target_fqn }}`` (and the
``declared_*`` variants) ALWAYS resolve to the real source/target view —
so a single query can join the two sides, exactly as in the reference.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass

import pandas as pd


@dataclass
class CustomCheckMetrics:
    source_row_count: int
    target_row_count: int
    rows_missing_in_target: int
    rows_missing_in_source: int
    sample_missing_in_target: str | None
    sample_missing_in_source: str | None
    source_hash: str
    target_hash: str
    rendered_source_sql: str
    rendered_target_sql: str


SOURCE_VIEW = "src"
TARGET_VIEW = "tgt"


def _table_name(files: list[str] | None) -> str:
    if not files:
        return ""
    base = os.path.basename(files[0])
    return base[:-8] if base.endswith(".parquet") else base


def render_custom_sql(
    sql: str,
    side: str,
    source_files: list[str] | None = None,
    target_files: list[str] | None = None,
) -> str:
    """Render one side's SQL with the reference's context variables
    (``sql_generator.py:26-72``): ``source_fqn``/``target_fqn`` are
    role-independent; ``table_*``/``rendered_role`` follow ``side``.
    Catalog/schema have no Databricks analog here — they render to the
    local pseudo-catalog and the file's directory."""
    import jinja2

    src_name = _table_name(source_files)
    tgt_name = _table_name(target_files)
    common = {
        "source_catalog": "local",
        "source_schema": os.path.dirname(source_files[0]) if source_files else "",
        "source_table": src_name,
        "source_fqn": SOURCE_VIEW,
        "target_catalog": "local",
        "target_schema": os.path.dirname(target_files[0]) if target_files else "",
        "target_table": tgt_name,
        "target_fqn": TARGET_VIEW,
        "declared_source_catalog": "local",
        "declared_source_schema": (
            os.path.dirname(source_files[0]) if source_files else ""
        ),
        "declared_source_table": src_name,
        "declared_target_catalog": "local",
        "declared_target_schema": (
            os.path.dirname(target_files[0]) if target_files else ""
        ),
        "declared_target_table": tgt_name,
    }
    per_side = {
        "table_catalog": common[f"{side}_catalog"],
        "table_schema": common[f"{side}_schema"],
        "table_name": common[f"{side}_table"],
        "table_fqn": SOURCE_VIEW if side == "source" else TARGET_VIEW,
        "rendered_role": side,
    }
    # StrictUndefined: a typo'd placeholder ({{ source_fq }}) must fail
    # at render with the variable name, not render to '' and surface as
    # an unrelated DuckDB syntax error (or a silently wrong query)
    template = jinja2.Template(sql, undefined=jinja2.StrictUndefined)
    try:
        return template.render(**common, **per_side).strip()
    except jinja2.UndefinedError as exc:
        raise ValueError(
            f"custom SQL references an unknown template variable: {exc}. "
            f"Available: {sorted({**common, **per_side})}"
        ) from None


def _canonical_row_md5(df: pd.DataFrame) -> list[str]:
    """md5(to_json(struct(*))) analog: canonical JSON per row with column
    order preserved (``validation.sql.j2:271``). Only needs to be
    self-consistent between the two sides, not Spark-identical."""
    cols = list(df.columns)
    out = []
    for tup in df.itertuples(index=False, name=None):
        payload = json.dumps(
            dict(zip(cols, [_jsonable(v) for v in tup])), default=str, sort_keys=False
        )
        out.append(hashlib.md5(payload.encode()).hexdigest())
    return out


def _jsonable(v):
    import numpy as np

    if pd.isna(v) if not isinstance(v, (list, dict, tuple)) else False:
        return None
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        return float(v)
    return v


def orderless_hash(df: pd.DataFrame) -> str:
    """sha2(array_join(sort_array(collect_list(md5(...))), '||'), 256)
    with 'EMPTY' for zero rows (``validation.sql.j2:267-292``)."""
    if len(df) == 0:
        return "EMPTY"
    md5s = sorted(_canonical_row_md5(df))
    return hashlib.sha256("||".join(md5s).encode()).hexdigest()


def multiset_diff(
    source_df: pd.DataFrame, target_df: pd.DataFrame
) -> tuple[int, int, str | None, str | None]:
    """EXCEPT ALL both directions: per distinct row, the count excess on
    each side; sample = first excess row under stable (sorted-md5) order."""
    s_md5 = _canonical_row_md5(source_df)
    t_md5 = _canonical_row_md5(target_df)
    s_counts = pd.Series(s_md5).value_counts()
    t_counts = pd.Series(t_md5).value_counts()
    all_keys = s_counts.index.union(t_counts.index)
    s_al = s_counts.reindex(all_keys, fill_value=0)
    t_al = t_counts.reindex(all_keys, fill_value=0)
    missing_in_target = int((s_al - t_al).clip(lower=0).sum())
    missing_in_source = int((t_al - s_al).clip(lower=0).sum())

    def sample(df: pd.DataFrame, md5s: list[str], excess: pd.Series) -> str | None:
        keys = set(excess[excess > 0].index)
        if not keys:
            return None
        order = sorted(range(len(md5s)), key=lambda i: md5s[i])
        for i in order:
            if md5s[i] in keys:
                row = df.iloc[i]
                return json.dumps(
                    {c: _jsonable(v) for c, v in row.items()}, default=str
                )
        return None

    return (
        missing_in_target,
        missing_in_source,
        sample(source_df, s_md5, s_al - t_al),
        sample(target_df, t_md5, t_al - s_al),
    )


def run_custom_check(
    sql: str,
    source_files: list[str],
    target_files: list[str],
) -> CustomCheckMetrics:
    import duckdb

    rendered_src = render_custom_sql(sql, "source", source_files, target_files)
    rendered_tgt = render_custom_sql(sql, "target", source_files, target_files)

    con = duckdb.connect()
    try:
        # BOTH sides live in one connection so a single query can
        # reference {{ source_fqn }} and {{ target_fqn }} together
        for view, files in ((SOURCE_VIEW, source_files), (TARGET_VIEW, target_files)):
            file_list = ", ".join(f"'{f}'" for f in files)
            con.execute(
                f"CREATE VIEW {view} AS SELECT * FROM read_parquet([{file_list}])"
            )
        sdf = con.execute(rendered_src).fetchdf()
        tdf = con.execute(rendered_tgt).fetchdf()
    finally:
        con.close()
    mt, ms, sample_t, sample_s = multiset_diff(sdf, tdf)
    return CustomCheckMetrics(
        source_row_count=len(sdf),
        target_row_count=len(tdf),
        rows_missing_in_target=mt,
        rows_missing_in_source=ms,
        sample_missing_in_target=sample_t,
        sample_missing_in_source=sample_s,
        source_hash=orderless_hash(sdf),
        target_hash=orderless_hash(tdf),
        rendered_source_sql=rendered_src,
        rendered_target_sql=rendered_tgt,
    )
