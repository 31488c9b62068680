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


# --------------------------------------------------------------- plan hints
#
# Advisory query-plan suggestions — the reference's optimizer emits these
# alongside its stats (`agent/query_optimizer.py:157-295`:
# _determine_execution_strategy / _check_materialized_views /
# _get_partition_strategy / _get_optimization_recommendations).  This engine
# APPLIES the equivalent rewrites structurally (MV reads, stats pruning,
# column pushdown), so the hints are a reporting surface: they explain what
# the planner would do and what the user could add.

_QUERY_COST_MS = {
    # reference base estimates (`query_optimizer.py:166-183`)
    "variants": 2000,
    "similar_cases": 5000,
    "bottlenecks": 1500,
    "conformance": 3000,
    "predictions": 2500,
}

_QUERY_NOTES = {
    "variants": "Complex aggregation query",
    "similar_cases": "Sequence comparison query",
    "bottlenecks": "Performance analysis query",
    "conformance": "Model comparison query",
    "predictions": "ML prediction query",
}

# query type -> MV that answers it (reference `query_optimizer.py:197-204`,
# mapped onto this engine's materialized views in pipelines/mv.py)
_MV_FOR_QUERY = {
    "variants": "mv_variants",
    "direct_follows": "mv_dfg",
    "next_activity": "mv_dfg",
    "activity_frequencies": "mv_activity_metrics",
    "bottlenecks": "mv_activity_metrics",
}


def plan_query(query_type: str, parameters: dict | None = None, *,
               mv_exists=None, stats: "OptimizerStats | None" = None) -> dict:
    """Advisory execution plan for a named query: strategy, time estimate,
    partition-pruning opportunity, and rewrite recommendations — the
    reference's `optimize_query` surface (`agent/query_optimizer.py:157-295`)
    over this engine's registries.  ``mv_exists(view_name) -> bool`` lets the
    caller wire in its MV manager; ``stats`` adds ring-buffer-driven hints
    (repeated patterns -> cache, observed-slow -> flagged)."""
    parameters = parameters or {}
    est = float(_QUERY_COST_MS.get(query_type, 1000))
    notes = []
    if query_type in _QUERY_NOTES:
        notes.append(_QUERY_NOTES[query_type])
    if parameters.get("top_n") is not None and parameters["top_n"] <= 10:
        est *= 0.5
        notes.append("Limited result set")
    if "instance_id" in parameters or "user_id" in parameters:
        est *= 0.3
        notes.append("Single instance query")

    view = _MV_FOR_QUERY.get(query_type)
    use_mv = bool(view and mv_exists and mv_exists(view))

    part = None
    if parameters.get("start_date") or parameters.get("end_date"):
        part = {"enabled": True, "column": "ts",
                "predicate": {"start": parameters.get("start_date"),
                              "end": parameters.get("end_date")},
                "estimated_reduction": 0.7}
    elif parameters.get("instance_type"):
        part = {"enabled": True, "column": "event_type",
                "predicate": {"eq": parameters["instance_type"]},
                "estimated_reduction": 0.5}

    recs = []
    if not use_mv and query_type in _MV_FOR_QUERY:
        recs.append(f"Materialize {_MV_FOR_QUERY[query_type]} for this "
                    "query type (refresh-by-overwrite or incremental)")
    if parameters.get("top_n") is None or parameters.get("top_n", 100) > 100:
        recs.append("Limit the result set with a top_n parameter")
    if est > 5000:
        recs.append("Break the query into smaller parts")
    if query_type == "variants" and "instance_type" not in parameters:
        recs.append("Filter by instance_type to enable stats pruning")
    if stats is not None:
        if stats.pattern_counts.get(query_type, 0) >= 3:
            recs.append("Repeated pattern: serve from the TTL result cache")
        slow = [r for r in stats.slow_queries() if r["query"] == query_type]
        if slow:
            recs.append(
                f"Observed slow ({max(r['seconds'] for r in slow):.1f}s "
                "worst); consider an MV or a tighter filter")

    return {
        "query_type": query_type,
        "execution_strategy": "materialized_view" if use_mv else "direct",
        "estimated_time_ms": round(est, 1),
        "optimization_notes": notes,
        "use_materialized_view": use_mv,
        "materialized_view": view if use_mv else None,
        "partition_strategy": part,
        "recommendations": recs,
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
