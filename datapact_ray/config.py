"""Pydantic configuration models for the validation suite.

Semantics mirror the reference's YAML surface
(``/root/reference/datapact/config.py:20-251``): the same check knobs
(count / row-hash / null / agg / uniqueness tolerances, filters, business
metadata, custom tests), re-targeted from Unity-Catalog FQNs to Parquet
paths, plus the transcript-engine checks required by BASELINE.json
(ordering, referential integrity, distribution drift, column compare).

Tolerances are ratios in [0, 1]; ``business_priority`` is normalized to
upper-case from {Critical, High, Medium, Low}; custom check names must be
unique per task even after slugging — all reference rules kept.
"""

from __future__ import annotations

import re
from typing import Literal

from pydantic import BaseModel, Field, field_validator, model_validator

from .identifiers import make_identifier


class CustomCheck(BaseModel):
    """A user-defined check run against both sides, result sets compared
    for exact (order-insensitive) multiset equality.

    ``sql`` is an ANSI SQL query executed by DuckDB against each side's
    table registered as view ``t`` (templating: ``{{ table_fqn }}``,
    ``{{ source_fqn }}`` / ``{{ target_fqn }}`` also resolve to ``t`` for
    the corresponding side, mirroring the reference's render contexts at
    ``/root/reference/datapact/sql_generator.py:26-84``). Results are
    compared with EXCEPT-ALL-equivalent multiset diffs plus an
    order-insensitive hash (``validation.sql.j2:257-301``).
    """

    name: str
    sql: str
    description: str | None = None

    @field_validator("name")
    @classmethod
    def validate_name(cls, value: str) -> str:
        trimmed = value.strip()
        if not trimmed:
            raise ValueError("Custom check name cannot be empty.")
        if len(trimmed) > 128:
            raise ValueError("Custom check name must be 128 characters or fewer.")
        if not re.fullmatch(r"[A-Za-z0-9_\-\s]+", trimmed):
            raise ValueError(
                "Custom check name may only contain letters, numbers, spaces, "
                "underscores, and hyphens."
            )
        return trimmed

    @field_validator("sql")
    @classmethod
    def validate_sql(cls, value: str) -> str:
        stripped = value.strip()
        if not stripped:
            raise ValueError("Custom SQL must be provided.")
        if stripped.endswith(";"):
            raise ValueError("Custom SQL should not include a trailing semicolon.")
        return stripped

    @property
    def slug(self) -> str:
        return make_identifier(self.name, prefix="custom_sql")


class AggValidationDetail(BaseModel):
    """One aggregate comparison: ``{agg: SUM|AVG|MIN|MAX, tolerance}``."""

    agg: str
    tolerance: float

    @field_validator("agg")
    @classmethod
    def validate_agg(cls, value: str) -> str:
        allowed = {"SUM", "AVG", "MIN", "MAX"}
        up = value.strip().upper()
        if up not in allowed:
            raise ValueError(f"agg must be one of {sorted(allowed)}")
        return up

    @field_validator("tolerance")
    @classmethod
    def validate_tolerance(cls, v: float) -> float:
        if not 0.0 <= v <= 1.0:
            raise ValueError("Tolerance must be a float between 0.0 and 1.0")
        return v


class AggValidation(BaseModel):
    """Aggregate validations for one column."""

    column: str
    validations: list[AggValidationDetail]


class OrderingCheck(BaseModel):
    """Per-group sequence validation (new vs reference; BASELINE north
    star: turn_idx contiguity + ts monotonicity per conv_id under stable
    turn ordering)."""

    group_column: str = "conv_id"
    index_column: str = "turn_idx"
    ts_column: str | None = "ts"
    require_contiguous: bool = True  # index == 0..n-1 after sort
    require_monotonic_ts: bool = True  # ts non-decreasing in index order
    sides: Literal["source", "target", "both"] = "both"


class EnumValidation(BaseModel):
    """Accepted-values check: every non-null value of ``column`` must be
    in ``allowed`` (compared in the column's native type). NULLs are the
    null check's business, not a membership violation. Rides the fused
    profile scan — one vectorized ``is_in`` per batch."""

    column: str
    allowed: list
    tolerance: float = 0.0  # violating rows / non-null rows, per side

    @field_validator("tolerance")
    @classmethod
    def validate_tolerance(cls, v: float) -> float:
        if not 0.0 <= v <= 1.0:
            raise ValueError("Tolerance must be a float between 0.0 and 1.0")
        return v

    @field_validator("allowed")
    @classmethod
    def validate_allowed(cls, v: list) -> list:
        if not v:
            raise ValueError("allowed must be a non-empty list")
        return v


class PatternValidation(BaseModel):
    """Format check: every non-null value of ``column`` (cast to string)
    must FULL-match ``regex`` (RE2 syntax — anchoring is applied by the
    engine). Rides the fused profile scan — one vectorized RE2 match per
    batch, compiled once."""

    column: str
    regex: str
    tolerance: float = 0.0

    @field_validator("tolerance")
    @classmethod
    def validate_tolerance(cls, v: float) -> float:
        if not 0.0 <= v <= 1.0:
            raise ValueError("Tolerance must be a float between 0.0 and 1.0")
        return v

    @field_validator("regex")
    @classmethod
    def validate_regex(cls, v: str) -> str:
        # validate with the ENGINE's regex library (Arrow RE2), not
        # Python's re — lookarounds/backreferences pass re.compile but
        # would crash every scan task mid-run under RE2
        import pyarrow as _pa
        import pyarrow.compute as _pc

        try:
            _pc.match_substring_regex(_pa.array(["x"]), f"^(?:{v})$")
        except Exception as exc:  # ArrowInvalid carries RE2's message
            raise ValueError(f"invalid RE2 regex: {exc}") from exc
        return v


class ConditionalValidation(BaseModel):
    """Cross-column implication rule: on rows where ``when`` holds,
    ``then`` must hold too (the CHECK-constraint shape single-column
    enum/range rules cannot express). Both predicates use the engine's
    filter mini-language (``expr.py`` — comparisons, IN, BETWEEN, LIKE,
    IS NULL, AND/OR/NOT) and are validated at config time. Evaluation
    rides the fused profile scan: two vectorized filters per batch,
    counters merged as integers. A NULL ``then`` outcome is NOT a
    violation (SQL ``when AND NOT then`` filter semantics — indeterminate
    rows are the null check's business)."""

    name: str
    when: str
    then: str
    tolerance: float = 0.0  # violating rows / rows where `when` holds

    @field_validator("tolerance")
    @classmethod
    def validate_tolerance(cls, v: float) -> float:
        if not 0.0 <= v <= 1.0:
            raise ValueError("Tolerance must be a float between 0.0 and 1.0")
        return v

    @field_validator("name")
    @classmethod
    def validate_name(cls, v: str) -> str:
        if not v.strip():
            raise ValueError("name must be non-empty")
        return v

    @field_validator("when", "then")
    @classmethod
    def validate_predicates(cls, v: str, info) -> str:
        from .expr import parse_filter

        try:
            parse_filter(v)
        except Exception as exc:
            raise ValueError(
                f"invalid {info.field_name} predicate {v!r}: {exc}"
            ) from exc
        return v


class SequenceGrammarCheck(BaseModel):
    """Role-grammar validation per conversation (new vs reference;
    transcript north star): the role column must stay inside a closed
    vocabulary, the first turn must carry ``first_role``, adjacent turns
    (in ``turn_idx`` order) may only follow ``allowed_transitions``, and
    the tool column must be non-null exactly on ``tool_roles`` turns.
    Rides the same keyed/conversation exchange as the ordering check
    (group/index columns come from the task's ``ordering`` when set,
    else from ``conv_dedup``, else ``conv_id``/``turn_idx``); roles
    cross the shuffle as 1-byte vocabulary codes, never as strings."""

    role_column: str = "role"
    allowed_roles: list[str] | None = None  # closed vocabulary when set
    first_role: str | None = None
    allowed_transitions: list[tuple[str, str]] | None = None
    tool_column: str | None = None
    tool_roles: list[str] = ["tool"]
    tolerance: float = 0.0  # flagged conversations / conversations checked

    @field_validator("tolerance")
    @classmethod
    def validate_tolerance(cls, v: float) -> float:
        if not 0.0 <= v <= 1.0:
            raise ValueError("Tolerance must be a float between 0.0 and 1.0")
        return v

    @model_validator(mode="after")
    def validate_vocabulary(self) -> "SequenceGrammarCheck":
        if not (
            self.allowed_roles is not None
            or self.first_role
            or self.allowed_transitions is not None
            or self.tool_column
        ):
            raise ValueError(
                "SequenceGrammarCheck needs at least one of allowed_roles, "
                "first_role, allowed_transitions, tool_column"
            )
        vocab = self.vocabulary
        if len(vocab) > 126:
            raise ValueError("role vocabulary is limited to 126 roles")
        if self.allowed_roles is not None:
            known = set(self.allowed_roles)
            extra = [r for r in vocab if r not in known]
            if extra:
                raise ValueError(
                    "roles referenced outside allowed_roles: " + ", ".join(extra)
                )
        return self

    @property
    def vocabulary(self) -> list[str]:
        """Deterministic role→code vocabulary (code = list position)."""
        out: list[str] = list(self.allowed_roles or [])
        if self.first_role:
            out.append(self.first_role)
        for a, b in self.allowed_transitions or []:
            out.extend((a, b))
        if self.tool_column:
            out.extend(self.tool_roles)
        return list(dict.fromkeys(out))


class FreshnessCheck(BaseModel):
    """Replication-lag check (engine extension): ``max(ts_column)`` on
    the TARGET must be within ``max_lag_seconds`` of the SOURCE's max —
    "did the replica fall behind". Compares the two sides' maxima (no
    wall-clock involved, so the check is deterministic and testable);
    the target being AHEAD of the source is not a lag. Rides the fused
    profile scan as a MAX aggregate. A side whose column is all-NULL
    (or empty) while the other side has timestamps FAILs loudly — a
    vanished timestamp column is exactly the staleness signal."""

    ts_column: str = "ts"
    max_lag_seconds: float = 0.0

    @field_validator("max_lag_seconds")
    @classmethod
    def validate_lag(cls, v: float) -> float:
        if v < 0:
            raise ValueError("max_lag_seconds must be >= 0")
        return v


class SegmentCountCheck(BaseModel):
    """Per-segment row-count reconciliation (engine extension): row
    counts per distinct value of ``column`` (a low-cardinality segment
    key — day bucket, source feed, role, status) compared between the
    sides; a segment whose relative difference ``|s - t| / max(s, t)``
    exceeds ``tolerance`` fails, and a segment PRESENT on one side but
    ABSENT on the other scores 1.0 — the missing-partition case the
    global count check averages away. Rides the fused profile scan as a
    bounded value-counts monoid; ``max_segments`` guards loudly against
    accidentally pointing it at a high-cardinality column."""

    column: str
    tolerance: float = 0.0
    max_segments: int = 100_000

    @field_validator("tolerance")
    @classmethod
    def validate_tolerance(cls, v: float) -> float:
        if not 0.0 <= v <= 1.0:
            raise ValueError("Tolerance must be a float between 0.0 and 1.0")
        return v

    @field_validator("max_segments")
    @classmethod
    def validate_max_segments(cls, v: int) -> int:
        if not 1 <= v <= 10_000_000:
            raise ValueError("max_segments must be in [1, 10_000_000]")
        return v


class SchemaCheck(BaseModel):
    """Declarative schema contract (engine extension): required columns
    with expected Arrow types, an extra-column policy, and an optional
    side-identity rule. Checked on the DRIVER from parquet footers /
    dataset schemas before any pass runs — no data scan, so a renamed
    or re-typed column fails in milliseconds, not after a 100-TB read.

    ``columns`` maps column name → expected type, written as an Arrow
    type alias or rendered type string (``int64``, ``double``,
    ``string``, ``bool``, ``timestamp[us]``, ``decimal128(12, 2)``,
    ``list<item: float>``). ``allow_extra=False`` flags columns outside
    the contract; ``require_same=True`` demands the two sides' (name,
    type) sets be identical regardless of the contract."""

    columns: dict[str, str] = {}
    allow_extra: bool = True
    require_same: bool = False
    sides: Literal["source", "target", "both"] = "both"

    @model_validator(mode="after")
    def validate_not_noop(self) -> "SchemaCheck":
        if not self.columns and self.allow_extra and not self.require_same:
            raise ValueError(
                "SchemaCheck with no columns, allow_extra=True and "
                "require_same=False can never fail — configure at least "
                "one constraint"
            )
        return self


class ConvDedupCheck(BaseModel):
    """Duplicate-conversation detection within each side (engine
    extension; the training-data dedup check a transcripts user needs
    as a first-class suite verdict). Two conversations on the same side
    are duplicates when their ordered sequences of ``content_columns``
    values are identical turn for turn. Rides the same keyed exchange
    as the ordering/grammar checks: each conversation reduces to a
    128-bit order-sensitive polynomial fingerprint of its per-turn
    content hashes inside the bucket reduce, and only the fingerprints
    (~40 B/conversation) flow through a chained object-store exchange
    keyed by fingerprint — conversation text never re-shuffles and the
    fingerprint set never lands on the driver."""

    group_column: str = "conv_id"
    index_column: str = "turn_idx"
    content_columns: list[str] = ["role", "text"]
    tolerance: float = 0.0  # duplicate conversations / conversations, per side
    sides: Literal["source", "target", "both"] = "both"
    # "exact": identical ordered content sequences (order-sensitive
    # polynomial fingerprint). "near": MinHash-LSH over the SET of a
    # conversation's turn content hashes — flags conversations sharing
    # at least one of ``bands`` signature bands (``num_perm // bands``
    # lane minima each) with another conversation on the same side; the
    # implied Jaccard S-curve is P(flag) = 1 - (1 - J^(num_perm/bands))
    # ^ bands. Candidates, not proven duplicates — the dedup pipelines
    # carry the exact-verify tooling for investigation.
    mode: Literal["exact", "near"] = "exact"
    num_perm: int = 16  # near mode: MinHash lanes
    bands: int = 4  # near mode: LSH bands (num_perm must divide evenly)
    # lowercase + collapse runs of whitespace in STRING content columns
    # before hashing (both modes) — catches reformatted copies
    normalize: bool = False

    @field_validator("tolerance")
    @classmethod
    def validate_tolerance(cls, v: float) -> float:
        if not 0.0 <= v <= 1.0:
            raise ValueError("Tolerance must be a float between 0.0 and 1.0")
        return v

    @model_validator(mode="after")
    def validate_columns(self) -> "ConvDedupCheck":
        if not self.content_columns:
            raise ValueError("content_columns must be a non-empty list")
        if self.group_column in self.content_columns:
            raise ValueError(
                "group_column cannot be a content column: every "
                "conversation would hash unique and the check could "
                "never fire"
            )
        if not 1 <= self.bands <= self.num_perm or self.num_perm % self.bands:
            raise ValueError(
                "bands must divide num_perm (rows-per-band = "
                "num_perm / bands must be a whole number)"
            )
        if self.num_perm > 64:
            raise ValueError("num_perm is limited to 64 lanes")
        return self


class ReferentialCheck(BaseModel):
    """Key containment: every value of ``columns`` in the fact side must
    exist in ``ref_columns`` of the table at ``ref_path`` (anti-join
    violations; Bloom-filter prefilter + exact recheck at scale)."""

    columns: list[str]
    ref_path: str
    ref_columns: list[str] | None = None  # defaults to `columns`
    side: Literal["source", "target", "both"] = "target"
    tolerance: float = 0.0

    @field_validator("tolerance")
    @classmethod
    def validate_tolerance(cls, v: float) -> float:
        if not 0.0 <= v <= 1.0:
            raise ValueError("Tolerance must be a float between 0.0 and 1.0")
        return v


class DriftCheck(BaseModel):
    """Distribution drift between source and target for one column.

    ``metric``: ``psi`` (population stability index over quantile bins of
    the source distribution) or ``ks`` (two-sample Kolmogorov–Smirnov
    statistic). Both are computed from mergeable t-digest sketches built
    in the single-scan profile pass. ``derived: turn_count`` checks the
    per-conversation turn-count distribution instead of a raw column;
    ``derived: str_len`` checks the per-row character-length distribution
    of a string column (truncation / empty-text detector — the row-hash
    check says WHICH turns differ, the length drift says HOW);
    ``derived: ts_gap`` checks the INTER-TURN time-gap distribution (ts
    deltas between consecutive turns in turn order, seconds) — the
    conversation-pacing drift a re-ingest with collapsed or re-stamped
    timestamps shifts even when counts and values all still match.
    ``ts_gap`` requires an ``ordering`` block with a ``ts_column``; the
    gaps ride the conversation shuffle (hot conversations contribute
    shard-interior gaps in the vectorized pass and boundary gaps in the
    driver stitch, so the digest covers every consecutive pair exactly
    once). ``derived: categorical`` checks a CATEGORICAL column's value
    distribution with total variation distance (``metric: tvd`` —
    0.5·Σ|p_v − q_v| over the union of values, NULL as its own
    category); computed from the same bounded value-counts monoid as
    segment_counts, guarded by ``max_categories``.
    """

    column: str
    metric: Literal["psi", "ks", "tvd"] = "psi"
    threshold: float = 0.2
    bins: int = Field(default=10, ge=2, le=1000)
    derived: Literal["value", "turn_count", "str_len", "ts_gap", "categorical"] = (
        "value"
    )
    max_categories: int = Field(  # categorical only: loud cardinality guard
        default=100_000, ge=1, le=10_000_000
    )

    @model_validator(mode="after")
    def validate_metric_for_derivation(self) -> "DriftCheck":
        if (self.derived == "categorical") != (self.metric == "tvd"):
            raise ValueError(
                "metric 'tvd' and derived 'categorical' go together: "
                "tvd compares value frequencies, psi/ks compare numeric "
                "distributions"
            )
        return self


class ValidationTask(BaseModel):
    """One source↔target comparison contract (reference:
    ``/root/reference/datapact/config.py:95-238``)."""

    task_key: str
    source_path: str
    target_path: str
    primary_keys: list[str] | None = None
    filter: str | None = None
    count_tolerance: float | None = None
    pk_row_hash_check: bool = False
    pk_hash_tolerance: float | None = None
    hash_columns: list[str] | None = None
    null_validation_tolerance: float | None = None
    null_validation_columns: list[str] | None = None
    agg_validations: list[AggValidation] | None = None
    enum_validations: list[EnumValidation] | None = None
    pattern_validations: list[PatternValidation] | None = None
    conditional_validations: list[ConditionalValidation] | None = None
    uniqueness_columns: list[str] | None = None
    uniqueness_tolerance: float | None = None
    # Transcript-engine checks (new vs reference; BASELINE.json north star)
    compare_columns: list[str] | None = None  # per-matched-pair equality (e.g. ["text"])
    compare_tolerance: float = 0.0
    ordering: OrderingCheck | None = None
    sequence_grammar: SequenceGrammarCheck | None = None
    conv_dedup: ConvDedupCheck | None = None
    schema_check: SchemaCheck | None = None
    segment_counts: list[SegmentCountCheck] | None = None
    freshness: FreshnessCheck | None = None
    referential: list[ReferentialCheck] | None = None
    drift: list[DriftCheck] | None = None
    # TEMPORAL drift (engine extension): this run's SOURCE profile vs
    # the checkpointed source profile of RunConfig.temporal_baseline_run
    # (same task_key) — the nightly "did my source shift since the
    # last run" check. Only profile-owned derivations (value,
    # str_len); digests are mergeable t-digests, so the comparison
    # costs no extra scan in either run.
    temporal_drift: list[DriftCheck] | None = None
    # Business metadata (executive rollups)
    business_domain: str | None = None
    business_owner: str | None = None
    business_priority: str | None = None
    expected_sla_hours: float | None = None
    estimated_impact_usd: float | None = None
    custom_checks: list[CustomCheck] | None = None
    # Engine knobs
    max_violations_per_partition: int = Field(default=100, ge=0)

    @field_validator("filter")
    @classmethod
    def validate_filter(cls, value: str | None) -> str | None:
        if value is None:
            return value
        normalized = value.strip()
        if not normalized:
            raise ValueError("Filter cannot be empty or whitespace.")
        if normalized.endswith(";"):
            raise ValueError("Filter should not include a trailing semicolon.")
        return normalized

    @field_validator(
        "count_tolerance",
        "pk_hash_tolerance",
        "null_validation_tolerance",
        "uniqueness_tolerance",
        "compare_tolerance",
    )
    @classmethod
    def tolerance_must_be_a_ratio(cls, v: float | None) -> float | None:
        if v is not None and not (0.0 <= v <= 1.0):
            raise ValueError("Tolerance must be a float between 0.0 and 1.0")
        return v

    @field_validator("business_priority")
    @classmethod
    def validate_business_priority(cls, value: str | None) -> str | None:
        if value is None:
            return value
        allowed = {"critical", "high", "medium", "low"}
        normalized = value.strip().lower()
        if normalized not in allowed:
            raise ValueError("business_priority must be one of: Critical, High, Medium, Low")
        return normalized.upper()

    @field_validator("expected_sla_hours", "estimated_impact_usd")
    @classmethod
    def validate_non_negative(cls, value: float | None) -> float | None:
        if value is not None and value < 0:
            raise ValueError("value must be greater than or equal to 0")
        return value

    @model_validator(mode="after")
    def validate_value_rules(self) -> "ValidationTask":
        for kind, rules in (
            ("enum_validations", self.enum_validations or []),
            ("pattern_validations", self.pattern_validations or []),
            ("segment_counts", self.segment_counts or []),
        ):
            seen: set[str] = set()
            for r in rules:
                if r.column in seen:
                    raise ValueError(
                        f"duplicate column '{r.column}' in {kind}: one rule "
                        "per column (the profile scan keys results by column)"
                    )
                seen.add(r.column)
        names: set[str] = set()
        for cr in self.conditional_validations or []:
            # dedup on the SLUGGED name: the payload alias is
            # conditional_validation_<make_identifier(name)>, so 'tool
            # turns' and 'tool-turns' would silently overwrite each
            # other in the payload even though the raw strings differ
            key = make_identifier(cr.name)
            if key in names:
                raise ValueError(
                    f"duplicate name '{cr.name}' in conditional_validations "
                    f"(slug '{key}'): names key the rule's counters and "
                    "payload alias"
                )
            names.add(key)
        return self

    @model_validator(mode="after")
    def validate_conv_dedup(self) -> "ValidationTask":
        # the conversation checks share ONE exchange with ONE
        # (group, index) partitioning key — a conv_dedup block naming
        # different columns than the ordering block would need a second
        # all-to-all, which this engine refuses by design
        if self.ordering and self.conv_dedup:
            o, d = self.ordering, self.conv_dedup
            if (o.group_column, o.index_column) != (
                d.group_column,
                d.index_column,
            ):
                raise ValueError(
                    "conv_dedup and ordering must agree on "
                    "group_column/index_column (the conversation checks "
                    "share one exchange partitioned by that key): "
                    f"ordering=({o.group_column}, {o.index_column}) vs "
                    f"conv_dedup=({d.group_column}, {d.index_column})"
                )
        if (
            self.sequence_grammar
            and self.conv_dedup
            and not self.ordering
            and (self.conv_dedup.group_column, self.conv_dedup.index_column)
            != ("conv_id", "turn_idx")
        ):
            # grammar's documented grouping default is conv_id/turn_idx;
            # a conv_dedup block naming other columns would silently
            # re-group the grammar check too (one shared exchange) —
            # demand an explicit ordering block to pin the shared key
            raise ValueError(
                "sequence_grammar with a conv_dedup block that re-groups "
                f"by ({self.conv_dedup.group_column}, "
                f"{self.conv_dedup.index_column}) changes the grammar "
                "check's grouping as well (the conversation checks share "
                "one exchange) — add an explicit ordering block with the "
                "intended group/index columns to confirm"
            )
        return self

    @model_validator(mode="after")
    def validate_temporal_drift(self) -> "ValidationTask":
        for d in self.temporal_drift or []:
            if d.derived not in ("value", "str_len", "categorical"):
                raise ValueError(
                    "temporal_drift supports derived=value|str_len|"
                    "categorical only (profile-owned digests/counts; "
                    "conversation-level digests are not checkpointed "
                    "whole)"
                )
        return self

    @model_validator(mode="after")
    def validate_ts_gap_drift(self) -> "ValidationTask":
        if any(d.derived == "ts_gap" for d in self.drift or []):
            if not (self.ordering and self.ordering.ts_column):
                raise ValueError(
                    "drift derived=ts_gap requires an ordering block with "
                    "a ts_column (gaps are per-conversation ts deltas in "
                    "turn order)"
                )
        return self

    @model_validator(mode="after")
    def validate_custom_checks(self) -> "ValidationTask":
        tests = self.custom_checks or []
        seen: set[str] = set()
        slugs: dict[str, str] = {}
        for test in tests:
            lowered = test.name.lower()
            if lowered in seen:
                raise ValueError(
                    f"Duplicate custom check name detected: '{test.name}'. "
                    "Names must be unique per task."
                )
            seen.add(lowered)
            slug = test.slug
            collision = slugs.get(slug)
            if collision:
                raise ValueError(
                    "Custom check names must remain unique even after "
                    f"sanitization. '{test.name}' conflicts with '{collision}' "
                    f"because both map to 'custom_sql_validation_{slug}'."
                )
            slugs[slug] = test.name
        return self

    @property
    def has_any_check(self) -> bool:
        return bool(
            self.count_tolerance is not None
            or (self.pk_row_hash_check and self.primary_keys)
            or (self.null_validation_columns and self.null_validation_tolerance is not None)
            or self.agg_validations
            or self.enum_validations
            or self.pattern_validations
            or self.conditional_validations
            or (self.uniqueness_columns and self.uniqueness_tolerance is not None)
            or self.custom_checks
            or (self.compare_columns and self.primary_keys)
            or self.ordering
            or self.sequence_grammar
            or self.conv_dedup
            or self.schema_check
            or self.segment_counts
            or self.freshness
            or self.referential
            or self.drift
            or self.temporal_drift
        )


class ValidationSuite(BaseModel):
    """Root model: ``validations: list[ValidationTask]`` (reference
    ``DataPactConfig``, ``/root/reference/datapact/config.py:242-251``)."""

    validations: list[ValidationTask]

    @model_validator(mode="after")
    def validate_unique_task_keys(self) -> "ValidationSuite":
        seen: set[str] = set()
        for t in self.validations:
            if t.task_key in seen:
                raise ValueError(f"Duplicate task_key: '{t.task_key}'")
            seen.add(t.task_key)
        return self


def load_suite(path: str) -> ValidationSuite:
    """Parse + validate a YAML suite file (reference
    ``/root/reference/datapact/main.py:62-65``)."""
    import yaml

    with open(path, encoding="utf-8") as fh:
        raw = yaml.safe_load(fh)
    return ValidationSuite(**raw)
