"""datapact_ray — a Ray-Data-native schema + constraint validation engine.

A from-scratch reimplementation of the *capabilities* of DataPact
(skyler-myers-db/datapact): a declarative ValidationSuite (YAML/Pydantic)
compiles into a small number of fused Ray Data passes per table pair —

* a single-scan **profile pass** (`map_batches` actor pool over zero-copy
  Arrow batches) computing counts, per-column null counts, SUM/AVG/MIN/MAX
  partials, t-digest / HyperLogLog sketches;
* one **bucketed keyed pass** (hash-shuffle `groupby` on a deterministic
  key bucket) computing composite-key uniqueness, PK row-hash compare,
  null-counts-over-matched-pairs and per-turn text equality, emitting exact
  violation rows under stable ``(conv_id, turn_idx)`` ordering;
* a **conversation pass** (ordering / contiguity / turn-count distribution,
  with contiguous-range salting of hot conversation keys);
* a **referential pass** (broadcast key set / Bloom filter + exact
  recheck);
* driver-side verdict assembly reproducing the reference's tolerance
  arithmetic, payload aliases and formatted strings
  (``/root/reference/datapact/templates/validation.sql.j2``).

The engine is batch, streaming-executed, and checkpointed per partition so
interrupted runs resume without recomputing validated partitions.
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    AggValidation,
    AggValidationDetail,
    CustomCheck,
    ValidationSuite,
    ValidationTask,
)
