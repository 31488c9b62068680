"""Query-result cache with TTL + optimizer statistics — the engine-level
memo the reference keeps in its query optimizer (`agent/query_optimizer.py:
138-156`: md5 cache key + TTL expiry; `:343-358`: perf-metrics ring buffer,
pattern counts, slow-query log).

The cache key folds in the table/manifest VERSION, so a maintenance commit
naturally invalidates every result computed against the old snapshot —
no explicit invalidation hooks needed (snapshot isolation does the work).
Only small driver-side results (aggregates, reports) belong here; Dataset
results should be consumed before caching (``materialize_fn``).
"""

from __future__ import annotations

import hashlib
import json
import time
from collections import OrderedDict, deque


def cache_key(query: str, params: dict | None, version) -> str:
    """md5 over (query, sorted params, snapshot version) — the reference's
    key construction (`agent/query_optimizer.py:138-145`)."""
    payload = json.dumps(
        {"q": query, "p": params or {}, "v": version}, sort_keys=True, default=str
    )
    return hashlib.md5(payload.encode("utf-8")).hexdigest()


class QueryCache:
    """TTL + LRU bounded result cache."""

    def __init__(self, ttl_seconds: float = 300.0, max_entries: int = 128):
        self.ttl = ttl_seconds
        self.max_entries = max_entries
        self._store: OrderedDict[str, tuple[float, object]] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get(self, key: str, now: float | None = None):
        now = time.time() if now is None else now
        item = self._store.get(key)
        if item is None:
            self.misses += 1
            return None
        stored_at, value = item
        if now - stored_at > self.ttl:
            del self._store[key]  # TTL expiry (`query_optimizer.py:150-156`)
            self.misses += 1
            return None
        self._store.move_to_end(key)
        self.hits += 1
        return value

    def put(self, key: str, value, now: float | None = None) -> None:
        self._store[key] = (time.time() if now is None else now, value)
        self._store.move_to_end(key)
        while len(self._store) > self.max_entries:
            self._store.popitem(last=False)

    def __len__(self) -> int:
        return len(self._store)


class OptimizerStats:
    """Ring buffer of per-query timings + pattern counts + slow-query log
    (`agent/query_optimizer.py:43-52,343-358`)."""

    def __init__(self, window: int = 1000, slow_threshold_seconds: float = 5.0):
        self.window = window
        self.slow_threshold = slow_threshold_seconds
        self._ring: deque = deque(maxlen=window)
        self.pattern_counts: dict[str, int] = {}

    def record(self, query: str, seconds: float, rows: int | None = None) -> None:
        self._ring.append({"query": query, "seconds": seconds, "rows": rows})
        self.pattern_counts[query] = self.pattern_counts.get(query, 0) + 1

    def slow_queries(self) -> list[dict]:
        return [r for r in self._ring if r["seconds"] > self.slow_threshold]

    def report(self) -> dict:
        n = len(self._ring)
        total = sum(r["seconds"] for r in self._ring)
        return {
            "queries_recorded": n,
            "avg_seconds": round(total / n, 6) if n else None,
            "slow_count": len(self.slow_queries()),
            "patterns": dict(
                sorted(self.pattern_counts.items(), key=lambda kv: -kv[1])
            ),
        }


class CachedQueryEngine:
    """Registry wrapper: run-by-name with cache + stats.  ``version_fn``
    supplies the current snapshot version (manifest version or sf_dir)."""

    def __init__(self, registry: dict, *, ttl_seconds: float = 300.0,
                 slow_threshold_seconds: float = 5.0,
                 materialize_fn=None):
        self.registry = registry
        self.cache = QueryCache(ttl_seconds=ttl_seconds)
        self.stats = OptimizerStats(slow_threshold_seconds=slow_threshold_seconds)
        self.materialize_fn = materialize_fn or (lambda r: r)

    def run(self, name: str, sf_dir: str, *, version=None, now: float | None = None):
        key = cache_key(name, {"sf_dir": sf_dir}, version)
        cached = self.cache.get(key, now=now)
        if cached is not None:
            return cached
        t0 = time.time()
        result = self.materialize_fn(self.registry[name](sf_dir))
        seconds = time.time() - t0
        rows = len(result) if hasattr(result, "__len__") else None
        self.stats.record(name, seconds, rows)
        self.cache.put(key, result, now=now)
        return result
