"""Per-index memoization for serving-path driver state.

Two kinds of per-request driver cost dominate warm serving latency at
local scale (measured r8: ~0.7 s dictionary round trip + ~1.0 s
DataFrame construction/analysis per composite request, vs ~0.2 s of
actual execution):

- tiny dictionary lookups (df / fuzzy / prefix expansions) that
  re-collect identical rows for every identical request, and
- the lazy query *plan* itself, rebuilt and re-analyzed from scratch
  on every call even when the request is identical.

Both are safely memoizable per index EPOCH: a CompressedIndex exposes
`_epoch_key()` (bumped by every incremental commit — the same key its
own df_map/postings handles are memoized under), and a flat
InvertedIndex is immutable lineage, so object identity is its epoch.
Caching a *plan* (a lazy DataFrame) never caches results: every
collect re-executes the job from the parquet/cached inputs — this is
the prepared-statement analogue of Lucene's reused Weight/Scorer
trees, and exactly the "per-epoch dictionary/plan caches" steady-state
serving shape the bench's best-of-n methodology measures.

Thread-safety: a lock guards the map; builds run outside the lock
(they may launch Spark jobs), so two racing threads may both build —
benign for pure plans/lookups (last write wins). Single-flight
de-duplication for expensive computations stays where it was, in
api/service.py's TTL cache.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from typing import Any, Callable

_CAP = 128


class LRU:
    """Tiny bounded LRU. get_or_build runs `build` OUTSIDE the lock."""

    def __init__(self, cap: int = _CAP) -> None:
        self._d: OrderedDict[Any, Any] = OrderedDict()
        self._cap = cap
        self._lock = threading.Lock()

    def get_or_build(self, key: Any, build: Callable[[], Any]) -> Any:
        with self._lock:
            if key in self._d:
                self._d.move_to_end(key)
                return self._d[key]
        v = build()
        with self._lock:
            self._d[key] = v
            self._d.move_to_end(key)
            while len(self._d) > self._cap:
                self._d.popitem(last=False)
        return v


def cache_of(obj: Any) -> LRU:
    """The per-object memo (attached lazily; setdefault is atomic in
    CPython, so two racing threads share the one stored LRU)."""
    c = obj.__dict__.get("_lh_memo")
    if c is not None:
        return c
    return obj.__dict__.setdefault("_lh_memo", LRU())


def epoch_of(index: Any) -> Any:
    """Mutation epoch of an index handle: CompressedIndex exposes
    `_epoch_key()` (versioned dirs + deltas + tombstones); a flat
    InvertedIndex is immutable lineage, so None (object identity via
    cache_of's per-object map) suffices."""
    ek = getattr(index, "_epoch_key", None)
    return ek() if callable(ek) else None


def copy2(d: dict) -> dict:
    """Two-level copy for {field: {term: v}} maps handed to callers
    that mutate them (e.g. _df_for_specs merges extra lookups in)."""
    return {k: dict(v) for k, v in d.items()}
