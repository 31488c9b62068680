"""NL route coverage matrix (VERDICT r4 #8): every queries() registry entry
must be reachable by at least one natural phrasing, params must round-trip,
and the table below catches registry/NL drift — adding a registry entry
without an intent pattern fails test_registry_fully_reachable."""

from __future__ import annotations

import pytest

import __ray_entry__ as entry
from ocel_ocpn_lakehouse_ray.pipelines.nl import (
    FALLBACK_INTENT,
    extract_params,
    match_intent,
    route,
)

# name -> a phrasing that must route to it (first-match-wins is part of the
# contract: each phrase is chosen so no earlier pattern steals it)
PHRASES = {
    "pricing_summary": "pricing summary report",
    "filter_project": "filter rows and project columns",
    "top_customers": "who are the top 10 customers",
    "orders_by_segment": "orders by market segment",
    "revenue_by_nation": "revenue by nation",
    "event_type_stats": "min and max value per event type",
    "value_counts": "value counts breakdown",
    "daily_counts": "daily counts of events",
    "hourly_volatility": "hourly volatility",
    "direct_follows": "direct follows graph",
    "sessionize": "sessionize the event stream",
    "sequence_numbers": "sequence numbers per user",
    "price_percentiles": "price percentiles",
    "percentiles_sketch": "approximate percentiles sketch",
    "distinct_types": "distinct event types",
    "isin_filter": "membership filter on a list",
    "null_quality": "missing values check",
    "cooccurrence": "event type cooccurrence",
    "token_counts": "token counts",
    "quality_scores": "document quality scores",
    "fingerprints": "document fingerprints",
    "dedup_exact": "exact dedup of the table",
    "lang_distribution": "language distribution",
    "lang_id": "identify the language of each document",
    "merge_documents": "merge updates into documents",
    "semi_join": "semi join customers with orders",
    "anti_join": "anti join customers without orders",
    "having": "groups having count above five",
    "case_when": "case when conditional column",
    "union_all": "union of two loads",
    "string_funcs": "string functions uppercase substring",
    "json_extract": "extract a json field",
    "between": "values between two bounds",
    "supplier_nation": "suppliers per nation",
    "part_brand_stats": "part brand stats",
    "threshold_cut": "rows above the value threshold",
    "hash_sample": "deterministic sampling of rows",
    "asof_join": "as-of join latest order",
    "next_activity": "what's the next activity",
    "case_outcome": "predict the conversion outcome",
    "similar_cases": "find similar cases to case 42",
    "resource_utilization": "resource utilization",
    "executive_kpis": "executive dashboard kpis",
    "petri_arcs": "petri net arcs",
    "variants": "what are the trace variants",
    "conformance": "conformance fitness",
    "mv_refresh_variants": "refresh the variants materialized view",
    "knn_bruteforce": "nearest neighbors of a query vector",
    "embedding_dedup_exact": "exact embedding dedup",
    "embedding_dedup": "embedding near dedup",
    "pnml_arcs": "parse the pnml file",
    "ann_lsh": "ann search with lsh",
    "ann_ivf": "ivf ann search",
    "simhash": "simhash signatures",
    "minhash_lsh_pairs": "minhash lsh candidate pairs",
    "ngram_jaccard": "jaccard over character ngrams",
    "image_near_dup": "find image near-duplicates",
    "image_knn": "nearest neighbor images by perceptual hash",
    "maint_compaction": "run compaction now",
    "maint_cluster_zorder": "zorder cluster the table",
    "maint_cluster_hilbert": "hilbert curve clustering",
    "maint_merge": "merge the upsert batch",
    "maint_expire_gc": "expire snapshots and gc",
    "maint_evolve_schema": "evolve the schema",
    "maint_export_shards": "export training data shards",
    "maint_delete": "delete rows matching a predicate",
    "maint_update": "update rows set width",
    "mv_refresh_dfg": "refresh the dfg view",
    "bottlenecks": "where are the bottlenecks",
    "rolling_daily": "trailing 7-day rolling average",
    "top_orders_per_customer": "top orders per customer",
    "value_p50_by_type": "median value by type",
    "curate_corpus": "curate the corpus",
    "ann_ivf_persisted": "persisted ivf index search",
    "funnel": "signup funnel analysis",
    "cohort_retention": "weekly cohort retention",
    "pivot_dow": "pivot by day of week",
    "stratified_sample": "stratified sample per segment",
    "grouping_sets": "rollup grouping sets",
    "value_delta": "day over day deltas",
}


def test_registry_fully_reachable():
    """Drift catcher: a registry entry with no phrase here means the NL
    surface lost (or never gained) a route to it."""
    reg = set(entry.queries())
    assert set(PHRASES) == reg, (
        f"registry/NL drift: missing phrases {sorted(reg - set(PHRASES))}, "
        f"stale phrases {sorted(set(PHRASES) - reg)}")


@pytest.mark.parametrize("name,text", sorted(PHRASES.items()))
def test_phrase_routes_to_intent(name, text):
    got, matched = match_intent(text)
    assert got == name, f"{text!r} routed to {got}, wanted {name}"
    # value_counts doubles as the fallback; every phrase here matches a
    # real pattern, so matched must be True even for it
    assert matched


def test_fallback_still_unmatched():
    name, matched = match_intent("completely unrelated gibberish xyz")
    assert not matched and name == FALLBACK_INTENT


@pytest.mark.parametrize("text,expect_name,expect_params", [
    ("top 7 orders per customer", "top_orders_per_customer", {"top_n": 7}),
    ("find similar cases to case 42", "similar_cases", {"instance_id": 42}),
    ("daily counts of events from 2026-01-01 to 2026-02-01", "daily_counts",
     {"start_date": "2026-01-01", "end_date": "2026-02-01"}),
    ("sessionize the event stream for the last 3 days", "sessionize",
     {"lookback_hours": 72}),
    ("update rows set width for event type 'purchase'", "maint_update",
     {"instance_type": "purchase"}),
])
def test_params_round_trip(text, expect_name, expect_params):
    name, _fn, params = route(text, entry.queries())
    assert name == expect_name
    for k, v in expect_params.items():
        assert params.get(k) == v, (k, params)


def test_extract_params_pure():
    p = extract_params("top 5 for user 9 since 2026-03-01 last 2 weeks")
    assert p["top_n"] == 5 and p["instance_id"] == 9
    assert p["start_date"] == "2026-03-01"
    assert p["lookback_hours"] == 336
