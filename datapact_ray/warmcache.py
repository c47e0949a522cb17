"""Per-worker-process memo for map-task broadcast state.

Stages whose setup is cheap run as PICKLED INSTANCES on Ray's warm
worker processes instead of dedicated actor pools (`stages/profile.py`
precedent: no pool spin-up, which on this engine's small fixed inputs
dominated wall time — each per-query ActorPoolMapOperator paid multi-
second actor startup to process kilobytes). Stages that materialize
broadcast state (a lookup dict, an embedding matrix pulled from
object-store refs) memoize the built state here, keyed by the
ObjectRef(s): the first task on a worker builds it, later tasks on the
same worker reuse it — actor-pool-style setup-once amortization without
the pool. The underlying ``ray.get`` is a local object-store hit
(zero-copy for Arrow/numpy), so even a cache miss ships nothing.

The cache is process-local and bounded: refs die with the driver that
created them, so entries from finished runs are garbage — on overflow
the whole map is dropped rather than LRU-tracked (rebuild cost is one
local get)."""

from __future__ import annotations

from typing import Any, Callable

_CACHE: dict[Any, Any] = {}
_MAX_ENTRIES = 16


def get_or_build(key: Any, build: Callable[[], Any]) -> Any:
    """Return the memoized value for ``key``, building it on first use."""
    try:
        return _CACHE[key]
    except KeyError:
        if len(_CACHE) >= _MAX_ENTRIES:
            _CACHE.clear()
        value = _CACHE[key] = build()
        return value
