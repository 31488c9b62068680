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
    name, fn, params = route("top customers", reg)
    assert name == "top_customers" and callable(fn) and params == {}


@pytest.mark.parametrize("text,expect", [
    ("what's the next activity after checkout", "next_activity"),
    ("predict the conversion outcome", "case_outcome"),
    ("find similar cases to case 42", "similar_cases"),
    ("resource utilization and workload", "resource_utilization"),
    ("executive dashboard kpis", "executive_kpis"),
    ("hourly volatility", "hourly_volatility"),
    ("minhash lsh candidate pairs", "minhash_lsh_pairs"),
    ("export training data shards", "maint_export_shards"),
])
def test_nl_widened_intents(text, expect):
    name, matched = match_intent(text)
    assert matched and name == expect


def test_nl_param_extraction():
    from ocel_ocpn_lakehouse_ray.pipelines.nl import extract_params

    p = extract_params("top 5 similar cases for user #42 from 2026-01-01 "
                       "to 2026-02-01 over the last 3 days, type 'purchase'")
    assert p["top_n"] == 5
    assert p["instance_id"] == 42
    assert p["start_date"] == "2026-01-01" and p["end_date"] == "2026-02-01"
    assert p["lookback_hours"] == 72
    assert p["instance_type"] == "purchase"
    assert extract_params("since 2025-12-31") == {"start_date": "2025-12-31"}


def test_nl_plan_hints():
    from ocel_ocpn_lakehouse_ray.pipelines.nl import plan
    from ocel_ocpn_lakehouse_ray.state.query_cache import OptimizerStats, plan_query

    # no MV available: direct strategy + MV recommendation
    h = plan("what are the trace variants")
    assert h["query_type"] == "variants"
    assert h["execution_strategy"] == "direct"
    assert any("mv_variants" in r for r in h["recommendations"])

    # MV available: strategy flips, recommendation drops
    h2 = plan("what are the trace variants",
              mv_exists=lambda v: v == "mv_variants")
    assert h2["use_materialized_view"] and h2["materialized_view"] == "mv_variants"
    assert not any("Materialize" in r for r in h2["recommendations"])

    # parameter-sensitive estimates (reference multipliers: top_n<=10 x0.5,
    # instance x0.3) and date-partition pruning strategy
    base = plan_query("similar_cases")
    tight = plan_query("similar_cases",
                       {"top_n": 5, "instance_id": 1,
                        "start_date": "2026-01-01"})
    assert tight["estimated_time_ms"] == round(base["estimated_time_ms"] * 0.5 * 0.3, 1)
    assert tight["partition_strategy"]["estimated_reduction"] == 0.7
    assert base["partition_strategy"] is None

    # stats-driven hint: repeated + slow pattern
    st = OptimizerStats(slow_threshold_seconds=1.0)
    for _ in range(3):
        st.record("variants", 2.0)
    h3 = plan_query("variants", stats=st)
    assert any("cache" in r for r in h3["recommendations"])
    assert any("slow" in r.lower() for r in h3["recommendations"])


def test_nl_answer_forwards_only_accepted_params():
    from ocel_ocpn_lakehouse_ray.pipelines.nl import answer

    seen = {}

    def fixed(sf_dir):
        seen["fixed"] = sf_dir
        return "ok"

    def aware(sf_dir, top_n=10):
        seen["aware"] = (sf_dir, top_n)
        return "ok"

    reg = {"top_customers": fixed}
    name, _ = answer("top 5 customers", "sf", reg)
    assert name == "top_customers" and seen["fixed"] == "sf"
    reg = {"top_customers": aware}
    answer("top 5 customers", "sf", reg)
    assert seen["aware"] == ("sf", 5)
