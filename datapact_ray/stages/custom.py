"""Custom checks: user SQL run against both sides, result sets compared.

Reproduces the reference's custom_sql_tests semantics
(``validation.sql.j2:244-305``): the query runs independently against the
source and the target table, then the two result sets are compared with

* ``EXCEPT ALL`` both directions → multiset-difference counts + one
  sample row each (``:257-266,294-299``), implemented as a full-row
  groupby with per-side counts (diff = max(count_s - count_t, 0) summed);
* an order-insensitive hash: sha256 over the sorted list of per-row md5s
  of canonical JSON, ``'EMPTY'`` for empty results (``:267-292``).

Execution engine — two loci:

* **Sharded (default when decomposable):** the reference's documented
  custom-SQL convention is aggregate-shaped queries
  (``/root/reference/README.md:287-305`` — COUNT/SUM/GROUP BY). Those
  decompose: the query's AST (DuckDB ``json_serialize_sql``) is checked
  for the decomposable shape (single SELECT over one side's view, no
  subqueries/windows/LIMIT/SELECT-DISTINCT; HAVING moves onto the merge
  with its aggregates re-expressed over partials; DISTINCT aggregates
  two-phase through a shared per-fragment dedup key; a result ORDER BY
  is dropped — every downstream metric is order-insensitive), rewritten
  into a *partial* query (AVG split into SUM+COUNT, every item aliased
  positionally via ``json_deserialize_sql``), executed per
  ``_scan_units`` fragment inside Ray map tasks (DuckDB-on-fragment,
  columns pruned to the AST's references), and the fragment partials are
  merged with a driver-side re-aggregation (SUM-of-counts,
  MIN-of-mins, …, cast back to the original output types). At 100 TB
  the scan work is distributed across the cluster; the driver only sees
  group-sized partials.
* **Sharded joins:** two-table INNER equi-joins between the views
  (``src JOIN tgt ON key``, ``USING``, AND-conjunct ONs with one clean
  same-typed column equality) hash-partition both sides by their join
  key so every joinable pair co-locates, run the partial query on each
  bucket-local join, and merge with the same partial/merge algebra.
* **Driver DuckDB (fallback):** queries that resist decomposition
  (outer/non-equi/self joins, mismatched join-key types, subqueries,
  windows, LIMIT, SELECT DISTINCT, non-mergeable aggregates) run on
  the driver with BOTH sides' parquet files registered in ONE
  connection (views ``src`` and ``tgt``) — correct but single-node;
  the plan printer (`cli.py plan`) labels the execution locus per
  custom check so the cost is visible before the run, and the verdict
  payload records it as ``execution_locus``.

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
from typing import Any

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
    # execution locus per side: "sharded" (scan-unit Ray tasks) or
    # "driver" (single-node DuckDB full scan — the 100-TB-weak path)
    source_locus: str = "driver"
    target_locus: str = "driver"
    # incremental partial reuse per side: how many input files were
    # covered by a prior run's cached partials instead of re-scanned
    source_files_reused: int = 0
    target_files_reused: int = 0


@dataclass
class JoinSpec:
    """Two-table equi-join execution shape: each side hash-partitions by
    its join-key column, so every joinable row pair lands in the same
    bucket and the bucket-local join output is a disjoint partition of
    the full join output — the partial/merge aggregate algebra then
    applies unchanged. ``sides`` is ``[(view_name, key_column,
    pruned_columns | None), ...]`` in (left, right) order."""

    sides: list[tuple[str, str, list[str] | None]]


@dataclass
class ShardPlan:
    """A decomposed custom query: ``partial_sql`` runs per scan-unit
    fragment (against a view named ``table_name``) — or, for join
    shapes (``join`` set), per join-key bucket with both sides' bucket
    fragments registered under their view names — and ``merge_sql``
    re-aggregates the unioned partials (view ``partials``) into the
    original result shape."""

    table_name: str  # which side's view the query scans (src | tgt)
    partial_sql: str
    merge_sql: str
    columns: list[str] | None  # referenced columns (pruned fragment read)
    join: JoinSpec | None = None


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


# ---------------------------------------------------------------------------
# Sharded execution: AST decomposition + scan-unit Ray tasks
# ---------------------------------------------------------------------------

_MERGE_FN = {"count_star": "SUM", "count": "SUM", "sum": "SUM", "min": "MIN", "max": "MAX"}
_AGG_FNS = set(_MERGE_FN) | {"avg"}


def _walk(node):
    """Yield every dict node in a parsed-AST JSON tree."""
    if isinstance(node, dict):
        yield node
        for v in node.values():
            yield from _walk(v)
    elif isinstance(node, list):
        for v in node:
            yield from _walk(v)


def _normalized(node) -> str:
    """Structural identity of an expression node: JSON with aliases and
    source locations stripped (so ``o_orderstatus`` in the select list
    matches the same ref in GROUP BY regardless of position)."""
    import copy

    n = copy.deepcopy(node)
    for d in _walk(n):
        d.pop("query_location", None)
        d.pop("alias", None)
    return json.dumps(n, sort_keys=True)


def _agg_kind(item: dict) -> str | None:
    """Classify a top-level aggregate we know how to re-aggregate:
    ``"plain"`` (COUNT/SUM/MIN/MAX/AVG), ``"distinct"`` (the same with
    DISTINCT — two-phase: per-fragment dedup on the argument, final
    DISTINCT-agg in the merge), or None (FILTER, ordered aggs, nested
    aggregates — not decomposable here)."""
    if item.get("class") != "FUNCTION":
        return None
    if item.get("function_name") not in _AGG_FNS:
        return None
    if item.get("filter") is not None:
        return None
    if (item.get("order_bys") or {}).get("orders"):
        return None
    for child in item.get("children") or []:
        for d in _walk(child):
            if d.get("class") == "FUNCTION" and d.get("function_name") in _AGG_FNS:
                return None
    if item.get("distinct"):
        # single-argument DISTINCT only (COUNT(DISTINCT a, b) resists
        # the shared-dedup-key rewrite)
        return "distinct" if len(item.get("children") or []) == 1 else None
    return "plain"


class _Undecomposable(Exception):
    """Internal: the HAVING rewrite hit a shape we can't re-aggregate."""


def _quote_ident(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


_INT_TYPE_IDS = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}


def _key_types_match(
    input_cols, sides: list[tuple[str, str]], keys: list[str]
) -> bool:
    """The two join-key columns must have the SAME declared type: the
    co-location hash is computed per side on the side's own column, and
    e.g. BIGINT 5 and VARCHAR '5' hash differently — DuckDB's implicit
    cast would join them on the driver, so a type mismatch must refuse
    to the driver rather than silently under-join. Requires per-column
    type info (dict values); name-only sets refuse."""
    types = []
    for (view, _alias), key in zip(sides, keys):
        cols = (input_cols or {}).get(view)
        if not isinstance(cols, dict):
            return False
        t = cols.get(key)
        if t is None:
            return False
        types.append(t)
    return types[0] == types[1]


def _parse_join(
    ft: dict, input_cols: dict[str, dict] | dict[str, set] | None
) -> list[tuple[str, str, str]] | None:
    """Recognize a shardable two-table INNER equi-join FROM clause:
    ``src [AS a] JOIN tgt [AS b] ON <conjuncts>`` where at least one
    conjunct is a bare column-to-column equality between OPPOSITE sides
    (the co-location key — extra conjuncts run verbatim per bucket), or
    ``USING (k)``. Self-joins refuse (one view name cannot hold two
    different bucket fragments), as do key pairs with different
    declared types (hash co-location requires identical hashing).
    Returns ``[(view, alias, key_column)]`` in (left, right) order, or
    None."""
    if (
        ft.get("join_type") != "INNER"
        or ft.get("ref_type") != "REGULAR"
        or ft.get("sample") is not None
    ):
        return None
    sides: list[tuple[str, str]] = []
    for node in (ft.get("left") or {}, ft.get("right") or {}):
        if (
            node.get("type") != "BASE_TABLE"
            or node.get("sample") is not None
            or node.get("table_name") not in (SOURCE_VIEW, TARGET_VIEW)
        ):
            return None
        sides.append((node["table_name"], node.get("alias") or node["table_name"]))
    if sides[0][0] == sides[1][0]:
        return None
    using = ft.get("using_columns") or []
    if using:
        if not _key_types_match(input_cols, sides, [using[0], using[0]]):
            return None
        return [(v, a, using[0]) for v, a in sides]
    cond = ft.get("condition")
    if cond is None:
        return None
    conjuncts: list[dict] = []

    def collect(node: dict) -> None:
        if (
            node.get("class") == "CONJUNCTION"
            and node.get("type") == "CONJUNCTION_AND"
        ):
            for ch in node.get("children") or []:
                collect(ch)
        else:
            conjuncts.append(node)

    collect(cond)
    alias_of = {a: i for i, (_v, a) in enumerate(sides)}
    for eq in conjuncts:
        if eq.get("class") != "COMPARISON" or eq.get("type") != "COMPARE_EQUAL":
            continue
        keys: list[str | None] = [None, None]
        ok = True
        for ref in (eq.get("left"), eq.get("right")):
            if not isinstance(ref, dict) or ref.get("class") != "COLUMN_REF":
                ok = False
                break
            names = ref.get("column_names") or []
            if len(names) == 2 and names[0] in alias_of:
                si = alias_of[names[0]]
            elif len(names) == 1 and input_cols is not None:
                member = [
                    i
                    for i, (v, _a) in enumerate(sides)
                    if names[0] in (input_cols.get(v) or set())
                ]
                if len(member) != 1:
                    ok = False
                    break
                si = member[0]
            else:
                ok = False
                break
            if keys[si] is not None:  # both refs on one side
                ok = False
                break
            keys[si] = names[-1]
        if ok and keys[0] is not None and keys[1] is not None:
            if not _key_types_match(input_cols, sides, [keys[0], keys[1]]):
                continue
            return [
                (sides[0][0], sides[0][1], keys[0]),
                (sides[1][0], sides[1][1], keys[1]),
            ]
    return None


def plan_sharded(
    rendered_sql: str,
    output_schema: list[tuple],
    input_columns: dict[str, set[str]] | set[str] | None = None,
) -> ShardPlan | None:
    """Decide whether ``rendered_sql`` is decomposable and, if so, build
    the (partial, merge) query pair. ``output_schema`` is the original
    query's [(name, type_str)] from ``DESCRIBE`` (footer-only binding —
    no scan). ``input_columns`` (the scanned view's column names, also
    footer-only) lets GROUP BY references to select-item ALIASES resolve
    to their expressions — DuckDB binds a bare GROUP BY name to the base
    column first, the alias otherwise, and we mirror that; when
    ``input_columns`` is None, alias resolution is skipped (conservative
    → driver fallback). Returns None when the query must run on the
    driver."""
    import copy

    import duckdb

    con = duckdb.connect()
    try:
        raw = con.execute(
            "SELECT json_serialize_sql(?::VARCHAR)", [rendered_sql]
        ).fetchone()[0]
    except duckdb.Error:
        return None
    finally:
        con.close()
    doc = json.loads(raw)
    if doc.get("error") or len(doc.get("statements") or []) != 1:
        return None
    n = doc["statements"][0]["node"]
    ft = n.get("from_table") or {}
    if (
        n.get("type") != "SELECT_NODE"
        or (n.get("cte_map") or {}).get("map")
        or n.get("qualify") is not None
        or n.get("sample") is not None
        or n.get("aggregate_handling") != "STANDARD_HANDLING"
    ):
        return None
    input_cols_by_view = input_columns if isinstance(input_columns, dict) else None
    join_sides: list[tuple[str, str, str]] | None = None
    if ft.get("type") == "BASE_TABLE":
        if ft.get("sample") is not None or ft.get("table_name") not in (
            SOURCE_VIEW,
            TARGET_VIEW,
        ):
            return None
    elif ft.get("type") == "JOIN":
        join_sides = _parse_join(ft, input_cols_by_view)
        if join_sides is None:
            return None
    else:
        return None
    # modifiers: a result-set ORDER BY is droppable (every downstream
    # metric — EXCEPT ALL counts, orderless hash, sorted-md5 samples —
    # is order-insensitive), but LIMIT / SELECT DISTINCT change the
    # result multiset and stay on the driver
    if any(m.get("type") != "ORDER_MODIFIER" for m in n.get("modifiers") or []):
        return None
    # ROLLUP/CUBE/GROUPING SETS → more than one grouping set
    group_exprs = n.get("group_expressions") or []
    group_sets = n.get("group_sets") or []
    if group_exprs and group_sets != [list(range(len(group_exprs)))]:
        return None
    # no subqueries / window functions anywhere
    for d in _walk(n):
        if d.get("class") in ("SUBQUERY", "WINDOW") or d.get("type") == "SUBQUERY":
            return None

    select_list = n.get("select_list") or []
    if len(output_schema) != len(select_list):
        return None  # STAR expansion or binder surprises — not our shape

    if input_cols_by_view is not None:
        if join_sides is not None:
            # alias resolution must not shadow a column of EITHER side
            input_columns = set().union(
                *(input_cols_by_view.get(v, set()) for v, _a, _k in join_sides)
            )
        else:
            input_columns = input_cols_by_view.get(ft["table_name"])

    # Resolve positional (GROUP BY 1) and select-alias (GROUP BY txn_day
    # where txn_day is `DATE(ts) AS txn_day`) group keys to the select
    # item's expression, so the partial can evaluate the key per fragment
    # and structural matching against select items works. Mirrors DuckDB
    # binding: an in-range integer literal is positional; a lone name
    # binds the base column when one exists, the alias otherwise.
    def _resolve_group(g: dict) -> dict:
        if g.get("class") == "CONSTANT":
            val = g.get("value") or {}
            tid = (val.get("type") or {}).get("id")
            k = val.get("value")
            if (
                tid in _INT_TYPE_IDS
                and not val.get("is_null")
                and isinstance(k, int)
                and 1 <= k <= len(select_list)
            ):
                return copy.deepcopy(select_list[k - 1])
        elif g.get("class") == "COLUMN_REF" and input_columns is not None:
            names = g.get("column_names") or []
            if len(names) == 1 and names[0] not in input_columns:
                for i, (name, _t) in enumerate(output_schema):
                    if name == names[0]:
                        return copy.deepcopy(select_list[i])
        return g

    group_exprs = [_resolve_group(g) for g in group_exprs]
    # no aggregates in WHERE or (resolved) GROUP BY
    for scope in (n.get("where_clause"), group_exprs):
        for d in _walk(scope):
            if d.get("class") == "FUNCTION" and d.get("function_name") in _AGG_FNS:
                return None

    group_norms = [_normalized(g) for g in group_exprs]

    partial = copy.deepcopy(n)
    partial["group_expressions"] = copy.deepcopy(group_exprs)
    new_select: list[dict] = []
    merge_items: list[str | None] = [None] * len(select_list)
    group_keys: list[str] = []  # partial-alias idents the merge groups by
    matched_groups: set[int] = set()
    group_alias: dict[str, str] = {}  # group-expr norm → partial alias
    # single shared dedup key for DISTINCT aggregates: every DISTINCT
    # agg in the query must take the same argument expression; the
    # partial then groups by it (per-fragment dedup) and the merge runs
    # the real DISTINCT agg over the deduped rows
    distinct_state: dict[str, Any] = {"norm": None, "expr": None, "aggs": 0}

    def _agg_merge(item: dict, tag: str) -> str | None:
        """Register partial columns for one aggregate node; return its
        merge-side expression (or None → not decomposable)."""
        kind = _agg_kind(item)
        if kind is None:
            return None
        distinct_state["aggs"] += 1
        fn = item["function_name"]
        if kind == "distinct":
            child = item["children"][0]
            norm = _normalized(child)
            if distinct_state["norm"] is None:
                distinct_state["norm"] = norm
                distinct_state["expr"] = copy.deepcopy(child)
            elif distinct_state["norm"] != norm:
                return None
            up = {"count": "COUNT", "sum": "SUM", "min": "MIN", "max": "MAX", "avg": "AVG"}
            return f'{up[fn]}(DISTINCT "__d")'
        if fn == "avg":
            # AVG decomposes to (SUM, COUNT); merged as the guarded
            # quotient so an all-NULL column still yields NULL
            s = copy.deepcopy(item)
            s["function_name"] = "sum"
            s["alias"] = f"__{tag}_s"
            c = copy.deepcopy(item)
            c["function_name"] = "count"
            c["alias"] = f"__{tag}_c"
            new_select.extend([s, c])
            return (
                f'CASE WHEN COALESCE(SUM("__{tag}_c"), 0) = 0 THEN NULL '
                f'ELSE CAST(SUM("__{tag}_s") AS DOUBLE)'
                f' / CAST(SUM("__{tag}_c") AS DOUBLE) END'
            )
        it = copy.deepcopy(item)
        it["alias"] = f"__{tag}"
        new_select.append(it)
        return f'{_MERGE_FN[fn]}("__{tag}")'

    # ---- pass 1: select items that ARE a group key, verbatim ----------
    pending: list[int] = []
    for i, item in enumerate(select_list):
        norm = _normalized(item)
        hit = next((gi for gi, g in enumerate(group_norms) if g == norm), None)
        if hit is not None:
            matched_groups.add(hit)
            it = copy.deepcopy(item)
            it["alias"] = f"__p{i}"
            new_select.append(it)
            group_keys.append(f'"__p{i}"')
            group_alias[norm] = f'"__p{i}"'
            merge_items[i] = f'"__p{i}"'
        else:
            pending.append(i)
    # GROUP BY expressions not in the select list still partition the
    # partials — select them under hidden aliases so the merge can group
    for gi, g in enumerate(group_exprs):
        if gi not in matched_groups:
            it = copy.deepcopy(g)
            it["alias"] = f"__g{gi}"
            new_select.append(it)
            group_keys.append(f'"__g{gi}"')
            group_alias[group_norms[gi]] = f'"__g{gi}"'

    # ---- shared rewrite machinery (composite select items + HAVING) ---
    # A node rewrites when every fragment of it is a group-key
    # expression (→ its partial alias), a re-aggregatable aggregate
    # (→ its merged partial expression), a select-alias reference
    # (HAVING only), or a constant/scalar function over those. Bare
    # column refs outside aggregates fail → driver fallback.
    replacements: dict[str, str] = {}

    def _placeholder(expr: str) -> dict:
        key = f"__DPMERGE{len(replacements)}__"
        replacements[key] = expr
        return {
            "class": "COLUMN_REF",
            "type": "COLUMN_REF",
            "alias": "",
            "column_names": [key],
        }

    def _rewrite(node, alias_merge: dict[str, str], tag: str):
        if isinstance(node, dict):
            if node.get("class"):  # an expression node
                norm = _normalized(node)
                if norm in group_alias:
                    return _placeholder(group_alias[norm])
                if (
                    node.get("class") == "FUNCTION"
                    and node.get("function_name") in _AGG_FNS
                ):
                    expr = _agg_merge(node, f"{tag}{len(replacements)}")
                    if expr is None:
                        raise _Undecomposable()
                    return _placeholder(f"({expr})")
                if node.get("class") == "COLUMN_REF":
                    # select-item alias reference (HAVING c > 5)
                    names = node.get("column_names") or []
                    if len(names) == 1 and names[0] in alias_merge:
                        return _placeholder(alias_merge[names[0]])
                    raise _Undecomposable()
            return {k: _rewrite(v, alias_merge, tag) for k, v in node.items()}
        if isinstance(node, list):
            return [_rewrite(v, alias_merge, tag) for v in node]
        return node

    def _merge_expr_sql(expr_node: dict) -> str | None:
        """Deserialize a rewritten expression node back to SQL text with
        the placeholder idents substituted by their merge expressions."""
        node = copy.deepcopy(expr_node)
        node["alias"] = "__dp_x__"
        dummy = copy.deepcopy(n)
        dummy["select_list"] = [node]
        dummy["group_expressions"] = []
        dummy["group_sets"] = []
        dummy["where_clause"] = None
        dummy["having"] = None
        dummy["modifiers"] = []
        con = duckdb.connect()
        try:
            text = con.execute(
                "SELECT json_deserialize_sql(?::JSON)",
                [json.dumps({"error": False, "statements": [{"node": dummy}]})],
            ).fetchone()[0]
        except duckdb.Error:
            return None
        finally:
            con.close()
        marker = ' AS __dp_x__ FROM '
        if not text.startswith("SELECT ") or marker not in text:
            return None
        sql = text[len("SELECT "):].rsplit(marker, 1)[0]
        for key, repl in replacements.items():
            sql = sql.replace(f'"{key}"', repl).replace(key, repl)
        return sql

    # ---- pass 2: aggregates and scalar expressions over them ----------
    # A plain top-level aggregate merges directly; anything else (e.g.
    # ROUND(AVG(x), 4), SUM(a)/NULLIF(SUM(b),0), UPPER(group_key)) is
    # rewritten — aggregates shard as hidden partials, the scalar
    # wrapper applies on the merge, where it sees the same finished
    # aggregate values the driver would.
    for i in pending:
        item = select_list[i]
        if _agg_kind(item) is not None:
            expr = _agg_merge(item, f"p{i}")
            if expr is None:
                return None
            merge_items[i] = expr
            continue
        try:
            rewritten = _rewrite(copy.deepcopy(item), {}, "s")
        except _Undecomposable:
            return None
        expr = _merge_expr_sql(rewritten)
        if expr is None:
            return None
        merge_items[i] = expr

    # HAVING: a post-aggregation filter — it moves verbatim onto the
    # MERGE query, with each aggregate node re-expressed as its merged
    # partial expression, each group-key reference as its partial alias,
    # and each select-item alias as that item's merge expression. Any
    # other bare column reference is not valid HAVING shape → driver
    # fallback.
    having_sql: str | None = None
    having = n.get("having")
    if having is not None:
        alias_merge = {
            name: f"({merge_items[i]})"
            for i, (name, _t) in enumerate(output_schema)
        }
        try:
            rewritten = _rewrite(copy.deepcopy(having), alias_merge, "h")
        except _Undecomposable:
            return None
        having_sql = _merge_expr_sql(rewritten)
        if having_sql is None:
            return None

    # an ungrouped query with no aggregates anywhere (constant-only
    # select list) returns one row per INPUT row — per-fragment
    # execution would change its cardinality, so it stays on the driver
    if not group_exprs and distinct_state["aggs"] == 0:
        return None

    # DISTINCT aggregates: the partial dedups per fragment by grouping
    # on (group keys, argument); the merge's DISTINCT agg collapses
    # cross-fragment repeats
    if distinct_state["norm"] is not None:
        d = copy.deepcopy(distinct_state["expr"])
        d["alias"] = "__d"
        new_select.append(d)
        partial["group_expressions"] = [
            *copy.deepcopy(group_exprs),
            copy.deepcopy(distinct_state["expr"]),
        ]
        partial["group_sets"] = [list(range(len(group_exprs) + 1))]
    partial["select_list"] = new_select
    partial["having"] = None
    partial["modifiers"] = []

    con = duckdb.connect()
    try:
        partial_sql = con.execute(
            "SELECT json_deserialize_sql(?::JSON)",
            [json.dumps({"error": False, "statements": [{"node": partial}]})],
        ).fetchone()[0]
    except duckdb.Error:
        return None
    finally:
        con.close()

    merge_select = ", ".join(
        f"CAST({expr} AS {typ}) AS {_quote_ident(name)}"
        for expr, (name, typ) in zip(merge_items, output_schema)
    )
    merge_sql = f"SELECT {merge_select} FROM partials"
    if group_keys:
        merge_sql += f" GROUP BY {', '.join(group_keys)}"
    if having_sql is not None:
        merge_sql += f" HAVING {having_sql}"

    # referenced columns (superset): every COLUMN_REF's terminal name;
    # intersected with the parquet schema later so alias refs drop out
    columns: list[str] = []
    seen = set()
    star = False
    for d in _walk(n):
        if d.get("class") == "COLUMN_REF" and d.get("column_names"):
            name = d["column_names"][-1]
            if name not in seen:
                seen.add(name)
                columns.append(name)
        elif d.get("class") == "STAR":
            star = True
    if join_sides is not None:
        if star:
            return None  # STAR over a join: ambiguous per-side pruning
        side_specs: list[tuple[str, str, list[str] | None]] = []
        for view, _alias, key in join_sides:
            schema_cols = (input_cols_by_view or {}).get(view)
            cols = (
                sorted((seen & set(schema_cols)) | {key}) if schema_cols else None
            )
            side_specs.append((view, key, cols))
        return ShardPlan("", partial_sql, merge_sql, None, JoinSpec(side_specs))
    if star:
        return ShardPlan(ft["table_name"], partial_sql, merge_sql, None)
    return ShardPlan(ft["table_name"], partial_sql, merge_sql, columns)


def _custom_partial_unit(unit: list[tuple], view: str, columns, partial_sql: str):
    """One scan-unit fragment → DuckDB partial result (Arrow). Runs as a
    Ray task; returns a group-sized table, never the fragment itself."""
    import duckdb

    from ..shuffle import read_unit

    frag = read_unit(unit, columns)
    con = duckdb.connect()
    try:
        con.register("__frag", frag)
        con.execute(f"CREATE VIEW {view} AS SELECT * FROM __frag")
        return con.execute(partial_sql).arrow()
    finally:
        con.close()


def _cache_key(plan: ShardPlan) -> str:
    return hashlib.md5(
        (plan.partial_sql + "\n" + plan.merge_sql).encode()
    ).hexdigest()[:20]


def _load_prior_partials(prior_dir: str | None, key: str, files: list[str]):
    """Prior run's cached partial table for this (rendered query, side)
    when its recorded file set is a SUBSET of the current one (append-
    only). Returns ``(partial_table | None, covered_files)``."""
    if not prior_dir:
        return None, set()
    meta_p = os.path.join(prior_dir, f"custom_{key}.json")
    data_p = os.path.join(prior_dir, f"custom_{key}.parquet")
    if not (os.path.exists(meta_p) and os.path.exists(data_p)):
        return None, set()
    import pyarrow.parquet as pq

    with open(meta_p, encoding="utf-8") as fh:
        meta = json.load(fh)
    prior_files = set(meta.get("files") or [])
    if not prior_files or not prior_files <= set(files):
        return None, set()
    from ..io import file_stats, stats_match

    # in-place rewrites of a covered file invalidate the cached partials
    if not stats_match(
        meta.get("file_stats"), file_stats(sorted(prior_files)), prior_files
    ):
        return None, set()
    return pq.read_table(data_p), prior_files


def _store_partials(cache_dir: str | None, key: str, partials, files: list[str]):
    """Persist this run's (union) partials so the NEXT append-only run
    can scan only its new files. Partials are group-sized Arrow rows —
    fragmentation-independent monoids (the merge re-aggregates), so the
    union of cached + new-file partials is exactly what a full scan
    would have produced."""
    if not cache_dir:
        return
    import tempfile

    import pyarrow.parquet as pq

    os.makedirs(cache_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".parquet")
    os.close(fd)
    pq.write_table(partials, tmp)
    os.replace(tmp, os.path.join(cache_dir, f"custom_{key}.parquet"))
    from ..io import file_stats

    fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".json")
    os.close(fd)
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(
            {"files": sorted(files), "file_stats": file_stats(sorted(files))},
            fh,
        )
    os.replace(tmp, os.path.join(cache_dir, f"custom_{key}.json"))


def _run_side_sharded(
    plan: ShardPlan,
    files: list[str],
    cache_dir: str | None = None,
    prior_cache_dir: str | None = None,
) -> tuple[pd.DataFrame, int]:
    """Execute one side's decomposed query: fragments fan out as Ray
    tasks (DuckDB-on-fragment), partials merge on the driver. With a
    ``prior_cache_dir``, files already covered by the prior run's
    cached partials are NOT re-scanned (append-only incremental);
    returns ``(result, n_files_reused)``."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from ..shuffle import _scan_units, _shuffle_target_bytes

    key = _cache_key(plan)
    prior, prior_files = _load_prior_partials(prior_cache_dir, key, files)
    scan_files = [f for f in files if f not in prior_files]
    units = _scan_units(scan_files, _shuffle_target_bytes([files]))
    if not units and prior is None:
        raise ValueError("no scan units (empty file list)")
    columns = plan.columns
    if columns is not None and files:
        in_schema = set(pq.ParquetFile(files[0]).schema_arrow.names)
        columns = [c for c in columns if c in in_schema] or None
    remote = ray.remote(num_cpus=1)(_custom_partial_unit)
    refs = [remote.remote(u, plan.table_name, columns, plan.partial_sql) for u in units]
    tables = ray.get(refs)
    if prior is not None:
        tables.append(prior)
    partials = pa.concat_tables(tables, promote_options="permissive")
    _store_partials(cache_dir, key, partials, files)
    con = duckdb.connect()
    try:
        con.register("partials", partials)
        return con.execute(plan.merge_sql).fetchdf(), len(prior_files)
    finally:
        con.close()


def _join_map_unit(unit: list[tuple], columns, key_col: str, num_buckets: int):
    """One scan-unit fragment of one join side → per-bucket sub-tables
    keyed by the side's join column hash. Runs as a Ray task."""
    import numpy as np

    from ..shuffle import _split_by_bucket, read_unit
    from ..sketches import hash_arrow_column_u64

    frag = read_unit(unit, columns)
    h = hash_arrow_column_u64(frag.column(key_col))
    bucket = (h % np.uint64(num_buckets)).astype(np.int32)
    import pyarrow as pa

    frag = frag.append_column("__bucket", pa.array(bucket))
    return _split_by_bucket(frag, num_buckets)


def _join_reduce_bucket(partial_sql: str, views: list[str], n_left: int, *shards):
    """One join-key bucket: register both sides' bucket fragments under
    their view names, run the partial query on the bucket-local join.
    Every joinable row pair co-locates here (equal keys hash equally),
    so the bucket outputs form a disjoint partition of the full join."""
    import duckdb
    import pyarrow as pa

    from ..shuffle import _flatten_shards

    groups = (
        _flatten_shards(shards[:n_left]),
        _flatten_shards(shards[n_left:]),
    )
    con = duckdb.connect()
    try:
        for view, tables in zip(views, groups):
            tables = [t for t in tables if t is not None]
            if not tables:
                return None
            frag = pa.concat_tables(tables, promote_options="permissive")
            con.register(f"__frag_{view}", frag)
            con.execute(f"CREATE VIEW {view} AS SELECT * FROM __frag_{view}")
        return con.execute(partial_sql).arrow()
    finally:
        con.close()


def _run_join_sharded(
    plan: ShardPlan, source_files: list[str], target_files: list[str]
) -> pd.DataFrame:
    """Execute a decomposed join query: each side's scan units fan out
    as Ray map tasks that hash-partition by the join key, per-bucket
    reduces run DuckDB on the co-located join, and the group-sized
    partials merge on the driver."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from ..shuffle import _scan_units, _shuffle_target_bytes

    files_of = {SOURCE_VIEW: source_files, TARGET_VIEW: target_files}
    sides = plan.join.sides
    target_bytes = _shuffle_target_bytes([files_of[v] for v, _k, _c in sides])
    units_per_side = [_scan_units(files_of[v], target_bytes) for v, _k, _c in sides]
    total_units = sum(len(u) for u in units_per_side)
    if total_units == 0:
        raise ValueError("no scan units (empty file lists)")
    num_buckets = max(4, min(64, total_units))
    map_task = ray.remote(num_returns=num_buckets)(_join_map_unit)
    shard_lists = []
    n_left = None
    for (view, key, cols), units in zip(sides, units_per_side):
        if cols is not None:
            in_schema = set(
                pq.ParquetFile(files_of[view][0]).schema_arrow.names
            )
            cols = [c for c in cols if c in in_schema] or None
        for unit in units:
            shard_lists.append(map_task.remote(unit, cols, key, num_buckets))
        if n_left is None:
            n_left = len(shard_lists)
    reduce_task = ray.remote(_join_reduce_bucket)
    views = [v for v, _k, _c in sides]
    refs = [
        reduce_task.remote(
            plan.partial_sql, views, n_left, *[shards[b] for shards in shard_lists]
        )
        for b in range(num_buckets)
    ]
    partials = [t for t in ray.get(refs) if t is not None]
    if not partials:
        raise ValueError("join exchange produced no partials")
    con = duckdb.connect()
    try:
        con.register(
            "partials", pa.concat_tables(partials, promote_options="permissive")
        )
        return con.execute(plan.merge_sql).fetchdf()
    finally:
        con.close()


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


def _ray_available() -> bool:
    try:
        import ray

        return ray.is_initialized()
    except ImportError:
        return False


def run_custom_check(
    sql: str,
    source_files: list[str],
    target_files: list[str],
    distribute: bool = True,
    cache_dir: str | None = None,
    prior_cache_dir: str | None = None,
) -> CustomCheckMetrics:
    import logging

    import duckdb

    rendered_src = render_custom_sql(sql, "source", source_files, target_files)
    rendered_tgt = render_custom_sql(sql, "target", source_files, target_files)

    con = duckdb.connect()
    try:
        # BOTH sides live in one connection so a single query can
        # reference {{ source_fqn }} and {{ target_fqn }} together;
        # sharded sides only use it for footer-only DESCRIBE binding
        for view, files in ((SOURCE_VIEW, source_files), (TARGET_VIEW, target_files)):
            file_list = ", ".join(f"'{f}'" for f in files)
            con.execute(
                f"CREATE VIEW {view} AS SELECT * FROM read_parquet([{file_list}])"
            )
        frames: dict[str, pd.DataFrame] = {}
        loci: dict[str, str] = {}
        # per-view column names (footer-only) so GROUP BY select-alias
        # references resolve in the sharding planner
        input_cols = {
            view: {r[0]: r[1] for r in con.execute(f"DESCRIBE {view}").fetchall()}
            for view in (SOURCE_VIEW, TARGET_VIEW)
        }
        reused: dict[str, int] = {"source": 0, "target": 0}
        for side, rendered in (("source", rendered_src), ("target", rendered_tgt)):
            df, locus = None, "driver"
            if distribute and _ray_available():
                try:
                    out_schema = [
                        (r[0], r[1])
                        for r in con.execute(f"DESCRIBE {rendered}").fetchall()
                    ]
                    plan = plan_sharded(rendered, out_schema, input_cols)
                    if plan is not None and plan.join is not None:
                        df = _run_join_sharded(plan, source_files, target_files)
                        locus = "sharded"
                    elif plan is not None:
                        files = (
                            source_files
                            if plan.table_name == SOURCE_VIEW
                            else target_files
                        )
                        df, reused[side] = _run_side_sharded(
                            plan, files, cache_dir, prior_cache_dir
                        )
                        locus = "sharded"
                except Exception as exc:  # fall back — never fail the check
                    logging.getLogger(__name__).warning(
                        "custom check %s side: sharded execution failed (%s); "
                        "falling back to driver DuckDB",
                        side,
                        exc,
                    )
                    df, locus = None, "driver"
            if df is None:
                df = con.execute(rendered).fetchdf()
            frames[side], loci[side] = df, locus
        sdf, tdf = frames["source"], frames["target"]
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
        source_locus=loci["source"],
        target_locus=loci["target"],
        source_files_reused=reused["source"],
        target_files_reused=reused["target"],
    )
