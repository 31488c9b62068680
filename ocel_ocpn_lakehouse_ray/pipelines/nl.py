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

# ordered: first match wins (reference `nl_query_agent.py:41-121`)
_INTENT_PATTERNS: list[tuple[str, str]] = [
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
    (r"\bsimilar\w*\b|\bnearest\s+neighbou?rs?\b|\bknn\b", "knn_bruteforce"),
    (r"\blanguages?\b", "lang_distribution"),
    (r"\btokens?\b", "token_counts"),
    (r"\bquality\b", "quality_scores"),
    (r"\bnulls?\b|\bmissing\s+values?\b", "null_quality"),
    (r"\bdistinct\b|\bunique\s+types?\b", "distinct_types"),
    (r"\bpetri\b|\bocpn\b", "petri_arcs"),
    (r"\bcompact", "maint_compaction"),
    (r"\bz.?order|\bcluster", "maint_cluster_zorder"),
    (r"\bmerge\b|\bupsert\b", "maint_merge"),
    (r"\bexpire\b|\bgarbage|\bgc\b", "maint_expire_gc"),
]

FALLBACK_INTENT = "value_counts"  # reference falls back to a summary query

_COMPILED = [(re.compile(p, re.IGNORECASE), name) for p, name in _INTENT_PATTERNS]


def match_intent(text: str) -> tuple[str, bool]:
    """→ (query name, matched?).  First pattern wins; fallback otherwise."""
    for rx, name in _COMPILED:
        if rx.search(text):
            return name, True
    return FALLBACK_INTENT, False


def route(text: str, registry: dict) -> tuple[str, object]:
    """→ (query name, callable) from a queries() registry."""
    name, _ = match_intent(text)
    return name, registry[name]


def answer(text: str, sf_dir: str, registry: dict):
    """One-shot: route and execute."""
    name, fn = route(text, registry)
    return name, fn(sf_dir)
