"""NL intent registry: regex pattern → query-callable routing over the
QUERIES registry — the reference's natural-language agent surface
(`agent/nl_query_agent.py:41-121`: ordered (pattern, intent) list, first
match wins, fallback intent when nothing matches).

No model, no network: deterministic compiled-regex dispatch, which is all
the reference itself does.  Patterns are compiled ONCE at module import
(reference T1 load-once discipline).
"""

from __future__ import annotations

import re

# ordered: first match wins (reference `nl_query_agent.py:41-121`).
# Layout: SPECIFIC multi-word intents first — each contains words a broader
# pattern below would otherwise steal (e.g. "refresh the dfg view" must
# route to the MV refresh, not to direct_follows) — then the broad
# vocabulary, then the long tail that completes registry coverage
# (tests/test_nl_matrix.py asserts every queries() entry is reachable).
_INTENT_PATTERNS: list[tuple[str, str]] = [
    (r"\brefresh\b.*\b(dfg|direct.?follows)\b", "mv_refresh_dfg"),
    (r"\brefresh\b.*\bvariants?\b|\bmateriali[sz]ed\s+views?\b",
     "mv_refresh_variants"),
    (r"\b(approx\w*|sketch\w*)\b.*\b(percentiles?|quantiles?)\b|\bt.?digest\b",
     "percentiles_sketch"),
    (r"\bexact\b.*\bembedding\b.*\bdedup\w*\b", "embedding_dedup_exact"),
    (r"\blanguage\s+id\w*\b|\bidentify\b.*\blanguage\b|\blang.?id\b",
     "lang_id"),
    (r"\bmerge\b.*\bdocuments?\b", "merge_documents"),
    (r"\bimages?\b.*\b(knn|nearest)\b|\bnearest\b.*\bimages?\b", "image_knn"),
    (r"\b(ann|approximate\s+nearest)\b.*\blsh\b|\blsh\b.*\bann\b", "ann_lsh"),
    (r"\b(persisted|saved|prebuilt)\b.*\bivf\b|\bivf\s+index\b",
     "ann_ivf_persisted"),
    (r"\bivf\b", "ann_ivf"),
    (r"\bhilbert\b", "maint_cluster_hilbert"),
    (r"\btop\s+orders?\b|\borders?\s+per\s+customer\b",
     "top_orders_per_customer"),
    (r"\bstratified\b", "stratified_sample"),
    (r"\b(revenue|sales)\b.*\bnation", "revenue_by_nation"),
    (r"\btop\b.*\bcustomers?\b", "top_customers"),
    (r"\b(orders?)\b.*\bsegment", "orders_by_segment"),
    (r"\bpricing\b|\bprice\s+summary\b", "pricing_summary"),
    (r"\bpercentiles?\b|\bquantiles?\b", "price_percentiles"),
    (r"\bdirect.?follows\b|\bdfg\b|\bprocess\s+flow\b", "direct_follows"),
    (r"\bvariants?\b|\btrace\s+patterns?\b", "variants"),
    (r"\bconformance\b|\bfitness\b", "conformance"),
    (r"\bsessions?\b|\bsessioni[sz]e\b", "sessionize"),
    (r"\bdaily\b.*\bcounts?\b|\bper.?day\b", "daily_counts"),
    (r"\bnear.?dup\w*\b.*\bimage|\bimage\b.*\bnear.?dup\w*", "image_near_dup"),
    (r"\bdedup\w*\b.*\bembedding|\bembedding\b.*\bdedup\w*", "embedding_dedup"),
    (r"\bexact\s+dedup\w*\b|\bduplicates?\b", "dedup_exact"),
    (r"\bsimilar\s+(cases?|traces?|journeys?)\b", "similar_cases"),
    (r"\bsimilar\w*\b|\bnearest\s+neighbou?rs?\b|\bknn\b", "knn_bruteforce"),
    (r"\blanguages?\b", "lang_distribution"),
    (r"\btokens?\b", "token_counts"),
    (r"\bquality\b", "quality_scores"),
    (r"\bnulls?\b|\bmissing\s+values?\b", "null_quality"),
    (r"\bdistinct\b|\bunique\s+types?\b", "distinct_types"),
    (r"\bpetri\b|\bocpn\b", "petri_arcs"),
    # widened synonym vocabulary (reference `nl_query_agent.py:41-121`
    # carries time ranges / instance ids / prediction phrasings)
    (r"\bnext\s+(activity|step)\b|\btransitions?\b|\bwhat\s+happens\s+after\b",
     "next_activity"),
    (r"\bconversion\b|\boutcomes?\b|\bwill\s+.*\b(buy|purchase|convert)",
     "case_outcome"),
    (r"\bbottlenecks?\b|\bslowest\b|\bwait(ing)?\s+times?\b", "bottlenecks"),
    (r"\butili[sz]ation\b|\bworkload\b|\bbusiest\b|\bresources?\b",
     "resource_utilization"),
    (r"\bkpis?\b|\bdashboards?\b|\bexecutive\b|\boverview\b",
     "executive_kpis"),
    (r"\bvolatilit\w+\b|\bhourly\b|\bby\s+hour\b", "hourly_volatility"),
    (r"\bsamples?\b|\bsampling\b", "hash_sample"),
    (r"\bminhash\b|\blsh\b|\bshingl\w+\b", "minhash_lsh_pairs"),
    (r"\bsimhash\b", "simhash"),
    (r"\bjaccard\b|\bn.?grams?\b", "ngram_jaccard"),
    (r"\bas.?of\b.*\bjoin\b|\bmost\s+recent\s+order\b", "asof_join"),
    (r"\bfingerprints?\b", "fingerprints"),
    (r"\bexport\b|\bshards?\b|\btraining\s+data\b", "maint_export_shards"),
    (r"\bcompact", "maint_compaction"),
    (r"\bz.?order|\bcluster", "maint_cluster_zorder"),
    (r"\bmerge\b|\bupsert\b", "maint_merge"),
    (r"\bexpire\b|\bgarbage|\bgc\b", "maint_expire_gc"),
    (r"\bdelete\b|\bremove\s+rows?\b", "maint_delete"),
    # ---- long tail: completes coverage of the queries() registry ----
    (r"\bfilter\b.*\bproject\b|\bprojections?\b", "filter_project"),
    (r"\bevent\s+type\s+stats?\b|\b(min|max)\b.*\bevent\s+type\b",
     "event_type_stats"),
    (r"\bsequence\s+numbers?\b|\bnumber\s+events?\s+in\s+order\b",
     "sequence_numbers"),
    (r"\bisin\b|\bin\s+a\s+list\b|\bmembership\b", "isin_filter"),
    (r"\bco.?occurr?\w*\b", "cooccurrence"),
    (r"\bsemi.?join\b", "semi_join"),
    (r"\banti.?join\b", "anti_join"),
    (r"\bhaving\b", "having"),
    (r"\bcase\s+when\b|\bconditional\s+column\b", "case_when"),
    (r"\bunion\b", "union_all"),
    (r"\bstring\s+functions?\b|\buppercase\b|\bsubstrings?\b", "string_funcs"),
    (r"\bjson\b", "json_extract"),
    (r"\bbetween\b", "between"),
    (r"\bsuppliers?\b", "supplier_nation"),
    (r"\bbrands?\b", "part_brand_stats"),
    (r"\bthresholds?\b", "threshold_cut"),
    (r"\bpnml\b", "pnml_arcs"),
    (r"\bschemas?\b|\bevolv\w+\b|\badd\s+a?\s*columns?\b",
     "maint_evolve_schema"),
    (r"\bupdate\b", "maint_update"),
    (r"\brolling\b|\btrailing\b|\bmoving\s+average\b", "rolling_daily"),
    (r"\bmedian\b|\bp50\b", "value_p50_by_type"),
    (r"\bcurat\w+\b|\bcorpus\b", "curate_corpus"),
    (r"\bfunnels?\b", "funnel"),
    (r"\bcohorts?\b|\bretention\b", "cohort_retention"),
    (r"\bpivot\b|\bday\s+of\s+week\b|\bweekdays?\b", "pivot_dow"),
    (r"\bgrouping\s+sets?\b|\brollup\b|\bcube\b", "grouping_sets"),
    (r"\bdeltas?\b|\bvalue\s+changes?\b", "value_delta"),
    (r"\bvalue\s+counts?\b|\bhistograms?\b|\bbreakdown\b", "value_counts"),
]

FALLBACK_INTENT = "value_counts"  # reference falls back to a summary query

_COMPILED = [(re.compile(p, re.IGNORECASE), name) for p, name in _INTENT_PATTERNS]


def match_intent(text: str) -> tuple[str, bool]:
    """→ (query name, matched?).  First pattern wins; fallback otherwise."""
    for rx, name in _COMPILED:
        if rx.search(text):
            return name, True
    return FALLBACK_INTENT, False


# ------------------------------------------------------ parameter extraction
#
# The reference's agent pulls query parameters out of the free text
# (`agent/nl_query_agent.py`: top_n counts, instance ids, date ranges).
# All patterns compiled once (T1).

_P_TOP_N = re.compile(r"\btop\s+(\d+)\b", re.IGNORECASE)
_P_LAST = re.compile(r"\blast\s+(\d+)\s*(day|hour|week|month)s?\b",
                     re.IGNORECASE)
_P_ID = re.compile(r"\b(?:user|case|instance|trace)\s*#?\s*(\d+)\b",
                   re.IGNORECASE)
_P_RANGE = re.compile(
    r"\bfrom\s+(\d{4}-\d{2}-\d{2})\s+(?:to|until|through)\s+"
    r"(\d{4}-\d{2}-\d{2})\b", re.IGNORECASE)
_P_SINCE = re.compile(r"\b(?:since|after)\s+(\d{4}-\d{2}-\d{2})\b",
                      re.IGNORECASE)
_P_BEFORE = re.compile(r"\b(?:before|until)\s+(\d{4}-\d{2}-\d{2})\b",
                       re.IGNORECASE)
_P_TYPE = re.compile(
    r"\b(?:event\s+type|activity|type)\s+['\"]?([a-z_][\w-]*)['\"]?",
    re.IGNORECASE)

_LAST_UNIT_HOURS = {"hour": 1, "day": 24, "week": 24 * 7, "month": 24 * 30}


def extract_params(text: str) -> dict:
    """Free-text query parameters: top_n, instance id, date range / lookback
    window, instance type — the reference agent's parameter vocabulary."""
    params: dict = {}
    if m := _P_TOP_N.search(text):
        params["top_n"] = int(m.group(1))
    if m := _P_ID.search(text):
        params["instance_id"] = int(m.group(1))
    if m := _P_RANGE.search(text):
        params["start_date"], params["end_date"] = m.group(1), m.group(2)
    else:
        if m := _P_SINCE.search(text):
            params["start_date"] = m.group(1)
        if m := _P_BEFORE.search(text):
            params["end_date"] = m.group(1)
    if m := _P_LAST.search(text):
        params["lookback_hours"] = int(m.group(1)) * \
            _LAST_UNIT_HOURS[m.group(2).lower()]
    if m := _P_TYPE.search(text):
        params["instance_type"] = m.group(1)
    return params


def route(text: str, registry: dict) -> tuple[str, object, dict]:
    """→ (query name, callable, extracted params) from a queries() registry."""
    name, _ = match_intent(text)
    return name, registry[name], extract_params(text)


def answer(text: str, sf_dir: str, registry: dict):
    """One-shot: route and execute, forwarding only the extracted parameters
    the callable's signature actually accepts (registry entries keep the
    uniform ``fn(sf_dir)`` contract; parameter-aware entries opt in)."""
    import inspect

    name, fn, params = route(text, registry)
    try:
        accepted = set(inspect.signature(fn).parameters)
    except (TypeError, ValueError):
        accepted = set()
    kwargs = {k: v for k, v in params.items() if k in accepted}
    return name, fn(sf_dir, **kwargs)


def plan(text: str, *, mv_exists=None, stats=None) -> dict:
    """Advisory plan for a free-text question: intent + params + the
    optimizer's rewrite hints (state/query_cache.plan_query)."""
    from ..state.query_cache import plan_query

    name, matched = match_intent(text)
    params = extract_params(text)
    out = plan_query(name, params, mv_exists=mv_exists, stats=stats)
    out["matched"] = matched
    out["params"] = params
    return out
