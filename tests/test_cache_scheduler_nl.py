"""TTL query cache + optimizer stats, MV refresh scheduler, NL intent
registry — the reference's remaining engine-surface components
(`agent/query_optimizer.py`, `ops/view_refresh_scheduler.py`,
`agent/nl_query_agent.py`)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from ocel_ocpn_lakehouse_ray.pipelines.mv import MaterializedView
from ocel_ocpn_lakehouse_ray.pipelines.nl import FALLBACK_INTENT, match_intent, route
from ocel_ocpn_lakehouse_ray.pipelines.scheduler import RefreshScheduler
from ocel_ocpn_lakehouse_ray.state.query_cache import (
    CachedQueryEngine,
    OptimizerStats,
    QueryCache,
    cache_key,
)

# ------------------------------------------------------------------- cache


def test_cache_key_folds_in_version():
    k1 = cache_key("q", {"sf_dir": "a"}, 1)
    k2 = cache_key("q", {"sf_dir": "a"}, 2)
    k3 = cache_key("q", {"sf_dir": "b"}, 1)
    assert len({k1, k2, k3}) == 3  # version + params both discriminate


def test_cache_ttl_expiry_and_lru():
    c = QueryCache(ttl_seconds=10, max_entries=2)
    c.put("a", 1, now=100.0)
    assert c.get("a", now=105.0) == 1          # within TTL
    assert c.get("a", now=111.0) is None       # expired + evicted
    assert len(c) == 0
    c.put("x", 1, now=0.0)
    c.put("y", 2, now=0.0)
    c.put("z", 3, now=0.0)                      # LRU bound: x evicted
    assert len(c) == 2 and c.get("x", now=1.0) is None
    assert c.get("y", now=1.0) == 2 and c.get("z", now=1.0) == 3


def test_cached_engine_memoizes_and_records_stats():
    calls = {"n": 0}

    def q(sf_dir):
        calls["n"] += 1
        return pd.DataFrame({"v": [1, 2, 3]})

    eng = CachedQueryEngine({"q": q}, ttl_seconds=60)
    r1 = eng.run("q", "/x", version=7, now=0.0)
    r2 = eng.run("q", "/x", version=7, now=1.0)
    assert calls["n"] == 1 and r1.equals(r2)       # cache hit
    eng.run("q", "/x", version=8, now=2.0)          # new snapshot → recompute
    assert calls["n"] == 2
    rep = eng.stats.report()
    assert rep["queries_recorded"] == 2
    assert rep["patterns"] == {"q": 2}


def test_optimizer_stats_slow_queries_ring():
    s = OptimizerStats(window=3, slow_threshold_seconds=1.0)
    for sec in (0.1, 2.0, 0.2, 3.0):   # first entry falls off the ring
        s.record("q", sec)
    assert len(s.slow_queries()) == 2
    assert s.report()["queries_recorded"] == 3
    assert s.pattern_counts["q"] == 4   # pattern counts survive the ring


# --------------------------------------------------------------- scheduler


def _mk_view(tmp_path, name, rows):
    state = {"rows": rows}

    def builder():
        return ray.data.from_arrow(
            pa.table({"k": pa.array(range(state["rows"]), pa.int64())})
        )

    return MaterializedView(str(tmp_path / "wh"), name, builder), state


def test_scheduler_interval_and_version_triggers(tmp_path):
    view, _ = _mk_view(tmp_path, "v1", 3)
    src_version = {"v": 1}
    sched = RefreshScheduler(stats_path=str(tmp_path / "refresh_stats.json"))
    sched.register(view, interval_seconds=100.0,
                   source_version_fn=lambda: src_version["v"])
    # first run: never refreshed → due
    rep = sched.run_once(now=1000.0)
    assert "v1" in rep and rep["v1"]["rows"] == 3
    # immediately after: not due (interval not elapsed, source unchanged)
    assert sched.due_views(now=1001.0) == []
    # source version bump → due regardless of interval
    src_version["v"] = 2
    assert sched.due_views(now=1002.0) == ["v1"]
    sched.run_once(now=1002.0)
    # interval elapse → due
    assert sched.due_views(now=1200.0) == ["v1"]


def test_scheduler_persists_and_resumes(tmp_path):
    view, _ = _mk_view(tmp_path, "v1", 2)
    stats = str(tmp_path / "refresh_stats.json")
    s1 = RefreshScheduler(stats_path=stats)
    s1.register(view, interval_seconds=1e6)
    s1.run_once(now=500.0)
    # a NEW scheduler process resumes the persisted last-refresh time
    s2 = RefreshScheduler(stats_path=stats)
    s2.register(view, interval_seconds=1e6)
    assert s2.due_views(now=501.0) == []
    assert s2.views["v1"].last_refresh_at == 500.0


def test_scheduler_bounded_loop(tmp_path):
    view, _ = _mk_view(tmp_path, "v1", 1)
    sched = RefreshScheduler()
    sched.register(view, interval_seconds=0.0)  # always due
    out = sched.run_loop(iterations=3)
    assert len(out) == 3 and all("v1" in r for r in out)
    assert len(sched.refresh_stats()["v1"]) == 3


# ---------------------------------------------------------------------- NL


@pytest.mark.parametrize("text,expect", [
    ("show revenue by nation please", "revenue_by_nation"),
    ("who are the top 10 customers", "top_customers"),
    ("find image near-duplicates", "image_near_dup"),
    ("run compaction now", "maint_compaction"),
    ("what are the trace variants", "variants"),
    ("price percentiles", "price_percentiles"),
])
def test_nl_intents(text, expect):
    name, matched = match_intent(text)
    assert matched and name == expect


def test_nl_fallback_and_route():
    name, matched = match_intent("completely unrelated gibberish xyz")
    assert not matched and name == FALLBACK_INTENT
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    reg = e.queries()
    # every intent target must exist in the live registry
    from ocel_ocpn_lakehouse_ray.pipelines.nl import _INTENT_PATTERNS

    for _, target in _INTENT_PATTERNS:
        assert target in reg, target
    name, fn = route("top customers", reg)
    assert name == "top_customers" and callable(fn)
