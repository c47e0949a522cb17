"""Fused single-scan profile pass.

One ``map_batches`` actor-pool stage per table side computes everything
scan-shaped in a single pass — the Ray equivalent of the reference's
shared stats CTEs ("1 scan per side per task",
``/root/reference/CHANGELOG.md:14``,
``validation.sql.j2:127-187``):

* row count (G1) and per-column null counts (G2),
* SUM/AVG/MIN/MAX partials per configured aggregate column (G3),
* t-digest sketch per drift column (quantiles, KS/PSI inputs),
* HyperLogLog per configured key set (approximate distinct, G4 prefilter),
* approximate heavy-hitter counts of the group key (hot-key salting input).

Each batch yields one tiny partial row (pickled dict); the driver merges
partials — all sketch types are mergeable monoids. Batches stay zero-copy
Arrow; per-batch math is pyarrow.compute / numpy kernels.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..sketches import HyperLogLog, TDigest, TopKCounter, hash_columns_u64

_RULE_SAMPLE_CAP = 20  # distinct violating values kept per rule/side


def _top_samples(d: dict, cap: int = _RULE_SAMPLE_CAP) -> dict:
    """Deterministic prune: keep the cap most frequent violating values
    (ties by string form) so merges stay bounded at any scale."""
    if len(d) <= cap:
        return d
    items = sorted(d.items(), key=lambda kv: (-kv[1], str(kv[0])))[:cap]
    return dict(items)


@dataclass
class ProfileSpec:
    """What the profile pass must compute for one table side."""

    null_columns: list[str] = field(default_factory=list)
    agg_columns: dict[str, set[str]] = field(default_factory=dict)  # col -> {SUM,AVG,MIN,MAX}
    sketch_columns: list[str] = field(default_factory=list)  # t-digest per column
    # t-digest over utf8_length(col); digest key "len:<col>" so a value
    # drift and a str_len drift on the same column coexist
    len_sketch_columns: list[str] = field(default_factory=list)
    # value-rule checks: enum membership / full-match regex per column
    # (results keyed "enum:<col>" / "pattern:<col>" in ProfileResult)
    enum_columns: dict[str, list] = field(default_factory=dict)
    pattern_columns: dict[str, str] = field(default_factory=dict)
    # conditional (implication) rules: name -> (when_sql, then_sql);
    # results keyed "cond:<name>" — checked = rows where `when` holds,
    # violations = rows where `when AND NOT then` (NULL `then` excluded)
    cond_rules: dict[str, tuple[str, str]] = field(default_factory=dict)
    hll_key_sets: list[tuple[str, ...]] = field(default_factory=list)
    # per-segment row counts: column -> max_segments (loud cardinality
    # guard); results in ProfileResult.segment_counts[col][value]
    segment_count_columns: dict[str, int] = field(default_factory=dict)
    heavy_hitter_column: str | None = None
    heavy_hitter_k: int = 64


@dataclass
class ProfileResult:
    count: int = 0
    nulls: dict[str, int] = field(default_factory=dict)
    # per column: dict(sum=float|None, nonnull=int, min=..., max=...)
    aggs: dict[str, dict] = field(default_factory=dict)
    digests: dict[str, TDigest] = field(default_factory=dict)
    hlls: dict[tuple[str, ...], HyperLogLog] = field(default_factory=dict)
    heavy_hitters: TopKCounter | None = None
    # value rules: non-null rows checked / violating, keyed
    # "enum:<col>" | "pattern:<col>"
    rule_checked: dict[str, int] = field(default_factory=dict)
    rule_violations: dict[str, int] = field(default_factory=dict)
    # capped evidence: per rule, violating value -> occurrence count
    # (top values by count; bounded at _RULE_SAMPLE_CAP after merges)
    rule_samples: dict[str, dict] = field(default_factory=dict)
    # per-segment row counts (bounded dict monoid): col -> {value: n};
    # NULL segments count under key None
    segment_counts: dict[str, dict] = field(default_factory=dict)
    segment_caps: dict[str, int] = field(default_factory=dict)

    def agg_value(self, column: str, agg: str) -> float | None:
        """SQL aggregate semantics: SUM/AVG NULL over zero non-null rows;
        MIN/MAX ignore nulls. Matches ``TRY_CAST(AGG(col) AS DECIMAL)`` in
        ``validation.sql.j2:146`` with float64 instead of decimal
        (documented deviation, SURVEY.md §1.3)."""
        a = self.aggs.get(column)
        if a is None:
            return None
        if agg == "SUM":
            return a["sum"] if a["nonnull"] else None
        if agg == "AVG":
            return (a["sum"] / a["nonnull"]) if a["nonnull"] else None
        if agg == "MIN":
            return a["min"]
        if agg == "MAX":
            return a["max"]
        raise ValueError(f"Unsupported agg {agg}")


def _numeric_view(col: pa.ChunkedArray | pa.Array) -> np.ndarray | None:
    """Float64 view of a column for sketching: numerics directly,
    timestamps as epoch microseconds, others None."""
    typ = col.type
    if pa.types.is_timestamp(typ):
        col = col.cast(pa.int64())
        typ = col.type
    if pa.types.is_integer(typ) or pa.types.is_floating(typ):
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return arr.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    return None


def _scalar(value: pa.Scalar):
    v = value.as_py()
    if v is None:
        return None
    if hasattr(v, "timestamp"):  # datetime -> epoch seconds float for comparisons
        # naive datetimes convert AS UTC: datetime.timestamp() would
        # interpret them in the machine's LOCAL zone, where two maxima
        # straddling a DST boundary pick up different offsets and a
        # freshness lag reads ±3600 s wrong
        if getattr(v, "tzinfo", None) is None:
            from datetime import timezone

            v = v.replace(tzinfo=timezone.utc)
        return v.timestamp()
    return float(v) if isinstance(v, (int, float, bool)) else v


class ProfileActor:
    """Batch profiler: runs as stateless tasks (a pickled instance — Ray
    reuses warm worker processes, no pool spin-up) or as an actor pool
    when ``concurrency`` is set; each ``__call__`` emits one pickled
    partial row tagged with the table side."""

    def __init__(self, spec: ProfileSpec, side: int = 0):
        self.spec = spec
        self.side = side
        self._cond = None  # name -> (when expr, viol expr, sample cols); lazy

    def _cond_compiled(self):
        """Compile conditional-rule predicates once per worker (the
        instance is pickled to tasks; expressions compile from SQL on
        first use so the pickle stays plain data)."""
        if self._cond is None:
            from ..expr import compile_to_arrow, parse_filter, referenced_columns

            compiled = {}
            for name, (when_sql, then_sql) in self.spec.cond_rules.items():
                w_ast, t_ast = parse_filter(when_sql), parse_filter(then_sql)
                w, t = compile_to_arrow(w_ast), compile_to_arrow(t_ast)
                compiled[name] = (w, w & ~t, sorted(referenced_columns(t_ast)))
            self._cond = compiled
        return self._cond

    def __call__(self, batch: pa.Table) -> pa.Table:
        spec = self.spec
        out = ProfileResult(count=batch.num_rows)
        for col in spec.null_columns:
            out.nulls[col] = batch.column(col).null_count
        for col, aggs in spec.agg_columns.items():
            arr = batch.column(col)
            nonnull = batch.num_rows - arr.null_count
            entry: dict = {"sum": None, "nonnull": nonnull, "min": None, "max": None}
            if nonnull:
                want_minmax = "MIN" in aggs or "MAX" in aggs
                if pa.types.is_timestamp(arr.type):
                    # SUM/AVG of a timestamp TRY_CASTs to NULL in the
                    # reference (validation.sql.j2:146); MIN/MAX compare fine.
                    if want_minmax:
                        mm = pc.min_max(arr)
                        entry["min"] = _scalar(mm["min"])
                        entry["max"] = _scalar(mm["max"])
                    entry["nonnull"] = 0  # forces SUM/AVG -> None
                else:
                    if "SUM" in aggs or "AVG" in aggs:
                        # keep integer sums as exact ints (merged with
                        # Python big-int addition); floats merge via fsum
                        entry["sum"] = pc.sum(arr).as_py()
                    if want_minmax:
                        mm = pc.min_max(arr)
                        entry["min"] = _scalar(mm["min"])
                        entry["max"] = _scalar(mm["max"])
            out.aggs[col] = entry
        for col in spec.sketch_columns:
            vals = _numeric_view(batch.column(col))
            if vals is not None:
                d = TDigest()
                d.add(vals)
                # only store non-empty digests: "a digest exists iff its
                # pass saw qualifying values" must hold for numeric
                # columns too (an all-NULL column used to store an EMPTY
                # digest, which KS-compared as zero drift — the
                # disappearance silently PASSed instead of hitting the
                # one-sided-missing maximal-drift rule)
                if d.count:
                    out.digests[col] = d
        for col in spec.len_sketch_columns:
            lens = pc.utf8_length(batch.column(col)).drop_null()
            if len(lens):
                d = TDigest()
                d.add(lens.to_numpy(zero_copy_only=False).astype(np.float64))
                out.digests[f"len:{col}"] = d
        for col, cap in spec.segment_count_columns.items():
            vc = pc.value_counts(batch.column(col))
            if len(vc) > cap:
                raise ValueError(
                    f"segment_counts: column '{col}' produced {len(vc)} "
                    f"distinct values in one batch (max_segments={cap}) — "
                    "this is a high-cardinality column, not a segment key"
                )
            d: dict = {}
            for v, c in zip(
                vc.field("values").to_pylist(), vc.field("counts").to_pylist()
            ):
                # NaN keys collapse to None: nan != nan, so distinct NaN
                # dict keys would FRAGMENT across merge partials —
                # identical distributions would TVD-compare as maximal
                # drift and NaN segments would always read one-side-missing
                if isinstance(v, float) and v != v:
                    v = None
                d[v] = d.get(v, 0) + c
            out.segment_counts[col] = d
            out.segment_caps[col] = cap
        for kind, cols in (("enum", spec.enum_columns), ("pattern", spec.pattern_columns)):
            for col, rule in cols.items():
                if kind == "enum":
                    arr = batch.column(col)
                    ok = pc.is_in(arr, value_set=pa.array(rule, type=arr.type))
                else:
                    arr = pc.cast(batch.column(col), pa.string())
                    ok = pc.match_substring_regex(arr, f"^(?:{rule})$")
                viol = pc.and_(
                    pc.is_valid(arr), pc.invert(pc.fill_null(ok, False))
                )
                key = f"{kind}:{col}"
                out.rule_checked[key] = batch.num_rows - arr.null_count
                nviol = int(pc.sum(viol).as_py() or 0)
                out.rule_violations[key] = nviol
                if nviol:
                    vc = (
                        arr.filter(viol)
                        .cast(pa.string())
                        .to_pandas()
                        .value_counts()
                    )
                    out.rule_samples[key] = _top_samples(
                        {str(v): int(c) for v, c in vc.items()}
                    )
        for name, (when_expr, viol_expr, sample_cols) in (
            self._cond_compiled().items() if spec.cond_rules else ()
        ):
            key = f"cond:{name}"
            out.rule_checked[key] = batch.filter(when_expr).num_rows
            viol_tbl = batch.filter(viol_expr)
            out.rule_violations[key] = viol_tbl.num_rows
            if viol_tbl.num_rows:
                cols = [c for c in sample_cols if c in viol_tbl.column_names]
                if cols:
                    parts = [
                        pc.cast(viol_tbl.column(c), pa.string()) for c in cols
                    ]
                    joined = (
                        pc.fill_null(parts[0], "NULL")
                        if len(parts) == 1
                        else pc.binary_join_element_wise(
                            *parts, ", ", null_handling="replace",
                            null_replacement="NULL",
                        )
                    )
                    vc = joined.to_pandas().value_counts()
                    out.rule_samples[key] = _top_samples(
                        {str(v): int(c) for v, c in vc.items()}
                    )
        df = None
        for keyset in spec.hll_key_sets:
            if df is None:
                df = batch.select(
                    sorted({c for ks in spec.hll_key_sets for c in ks})
                ).to_pandas()
            h = HyperLogLog()
            h.add_hashes(hash_columns_u64(df, list(keyset)))
            out.hlls[keyset] = h
        if spec.heavy_hitter_column:
            # count in hash space (uint64 np.unique ≫ string value_counts);
            # hot keys are identified by their deterministic column hash
            from ..sketches import hash_arrow_column_u64

            gh = hash_arrow_column_u64(batch.column(spec.heavy_hitter_column))
            keys, counts = np.unique(gh, return_counts=True)
            tk = TopKCounter(spec.heavy_hitter_k)
            tk.add_value_counts(keys, counts)
            out.heavy_hitters = tk
        return pa.table(
            {"side": [self.side], "partial": [pickle.dumps(out)]}
        )


def merge_profiles(partials: list[ProfileResult]) -> ProfileResult:
    import math

    out = ProfileResult()
    sums: dict[str, list[float]] = {}
    for p in partials:
        out.count += p.count
        for col, n in p.nulls.items():
            out.nulls[col] = out.nulls.get(col, 0) + n
        for col, a in p.aggs.items():
            cur = out.aggs.setdefault(
                col, {"sum": None, "nonnull": 0, "min": None, "max": None}
            )
            cur["nonnull"] += a["nonnull"]
            if a["sum"] is not None:
                # collect partial sums and fsum them below: compensated
                # accumulation keeps the merged float SUM within ~1 ULP of
                # exact regardless of partial count / arrival order
                sums.setdefault(col, []).append(a["sum"])
            for k, op in (("min", min), ("max", max)):
                if a[k] is not None:
                    cur[k] = a[k] if cur[k] is None else op(cur[k], a[k])
        for col, d in p.digests.items():
            out.digests[col] = d if col not in out.digests else out.digests[col].merge(d)
        for ks, h in p.hlls.items():
            out.hlls[ks] = h if ks not in out.hlls else out.hlls[ks].merge(h)
        if p.heavy_hitters is not None:
            out.heavy_hitters = (
                p.heavy_hitters
                if out.heavy_hitters is None
                else out.heavy_hitters.merge(p.heavy_hitters)
            )
        for key, n in getattr(p, "rule_checked", {}).items():
            out.rule_checked[key] = out.rule_checked.get(key, 0) + n
        for key, n in getattr(p, "rule_violations", {}).items():
            out.rule_violations[key] = out.rule_violations.get(key, 0) + n
        for key, smp in getattr(p, "rule_samples", {}).items():
            cur = out.rule_samples.setdefault(key, {})
            for v, c in smp.items():
                cur[v] = cur.get(v, 0) + c
            out.rule_samples[key] = _top_samples(cur)
        for col, counts in getattr(p, "segment_counts", {}).items():
            cur = out.segment_counts.setdefault(col, {})
            for v, c in counts.items():
                cur[v] = cur.get(v, 0) + c
            cap = p.segment_caps.get(col)
            if cap is not None:
                out.segment_caps[col] = cap
                if len(cur) > cap:
                    raise ValueError(
                        f"segment_counts: column '{col}' exceeded "
                        f"max_segments={cap} distinct values across the "
                        "table — this is a high-cardinality column, not "
                        "a segment key"
                    )
    for col, parts in sums.items():
        if all(isinstance(s, int) for s in parts):
            out.aggs[col]["sum"] = sum(parts)  # exact big-int path
        else:
            out.aggs[col]["sum"] = math.fsum(parts)
    return out


def _profile_unit(
    unit: tuple,
    columns: list[str] | None,
    filter_expr_pickle: bytes | None,
    spec: ProfileSpec,
    side: int,
) -> bytes:
    """Fused map task for parquet inputs: read a file/row-group chunk,
    apply the filter, compute one partial — no Dataset pipeline, no
    inter-stage handoff."""
    from ..shuffle import read_unit

    table = read_unit(unit, columns)
    if filter_expr_pickle is not None:
        table = table.filter(pickle.loads(filter_expr_pickle))
    out = ProfileActor(spec, side)(table)
    return out.column("partial")[0].as_py()


def run_profile_pair_files(
    source_files: list[str],
    target_files: list[str],
    spec: ProfileSpec,
    columns: list[str] | None = None,
    filter_expr=None,
) -> tuple[ProfileResult, ProfileResult]:
    """Parquet fast path: both sides' chunks as one wave of raw Ray
    tasks; the driver merges partials per side."""
    from ..shuffle import _scan_units

    expr_pickle = pickle.dumps(filter_expr) if filter_expr is not None else None
    task = ray.remote(_profile_unit)
    refs: list = []
    sides: list[int] = []
    for side, files in ((0, source_files), (1, target_files)):
        for unit in _scan_units(files):
            refs.append(task.remote(unit, columns, expr_pickle, spec, side))
            sides.append(side)
    partials: dict[int, list[ProfileResult]] = {0: [], 1: []}
    for side, blob in zip(sides, ray.get(refs)):
        partials[side].append(pickle.loads(blob))
    return merge_profiles(partials[0]), merge_profiles(partials[1])


def _profile_stage(
    ds: ray.data.Dataset,
    spec: ProfileSpec,
    side: int,
    batch_size: int,
    concurrency,
) -> ray.data.Dataset:
    if concurrency is None:
        return ds.map_batches(
            ProfileActor(spec, side),
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
        )
    return ds.map_batches(
        ProfileActor,
        fn_constructor_args=(spec, side),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def run_profile_pair(
    source: ray.data.Dataset,
    target: ray.data.Dataset,
    spec: ProfileSpec,
    *,
    batch_size: int = 65536,
    concurrency: int | tuple[int, int] | None = None,
) -> tuple[ProfileResult, ProfileResult]:
    """Profile BOTH sides in one streaming execution (union of the two
    per-side partial streams), halving fixed per-execution overhead; the
    reference's '1 scan per side' becomes one pipelined job."""
    combined = _profile_stage(source, spec, 0, batch_size, concurrency).union(
        _profile_stage(target, spec, 1, batch_size, concurrency)
    )
    partials: dict[int, list[ProfileResult]] = {0: [], 1: []}
    for row in combined.take_all():
        partials[row["side"]].append(pickle.loads(row["partial"]))
    return merge_profiles(partials[0]), merge_profiles(partials[1])


def run_profile_files(
    files: list[str],
    spec: ProfileSpec,
    columns: list[str] | None = None,
    filter_sql: str | None = None,
) -> ProfileResult:
    """Single-side parquet fast path: one wave of raw Ray tasks over
    file/row-group scan units, partials merged on the driver — the
    one-table analog of :func:`run_profile_pair_files` (skips the Ray
    Data pipeline's fixed planning/materialization cost). Columns the
    filter references are unioned into the read (the in-task
    ``Table.filter`` needs them even when the profile doesn't)."""
    from ..expr import compile_to_arrow, parse_filter, referenced_columns
    from ..shuffle import _scan_units

    filter_expr = None
    if filter_sql:
        ast = parse_filter(filter_sql)
        filter_expr = compile_to_arrow(ast)
        if columns is not None:
            columns = list(
                dict.fromkeys(columns + sorted(referenced_columns(ast)))
            )
    expr_pickle = pickle.dumps(filter_expr) if filter_expr is not None else None
    task = ray.remote(_profile_unit)
    refs = [
        task.remote(unit, columns, expr_pickle, spec, 0)
        for unit in _scan_units(files)
    ]
    return merge_profiles([pickle.loads(b) for b in ray.get(refs)])


def run_profile(
    ds: ray.data.Dataset,
    spec: ProfileSpec,
    *,
    batch_size: int = 65536,
    concurrency: int | tuple[int, int] | None = None,
) -> ProfileResult:
    """Execute the profile pass and merge partials on the driver.

    ``concurrency=None`` (default) runs stateless tasks on warm workers;
    set it to run an autoscaling actor pool (useful when the spec adds
    expensive per-actor setup). The partials dataset is tiny (one ~KB
    row per input batch), so ``take_all`` here is not a materialization
    of the input."""
    partial_ds = _profile_stage(ds, spec, 0, batch_size, concurrency)
    partials = [pickle.loads(row["partial"]) for row in partial_ds.take_all()]
    return merge_profiles(partials)
