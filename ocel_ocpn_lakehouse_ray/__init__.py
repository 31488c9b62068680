"""ocel_ocpn_lakehouse_ray — a Ray-Data-native Lance-style table-maintenance
engine for image+caption tables (compaction, Z-order/Hilbert clustering,
manifest rewrite, snapshot expiry/GC, MERGE INTO), plus the training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
stages) and the SURVEY.md §2 operator-coverage query registry.

Public surface (the analog of the reference's package exports,
`__init__.py:20-72`):
"""

from .config import TableConfig
from .table import IMAGE_SCHEMA, LakeTable

__all__ = [
    "IMAGE_SCHEMA",
    "LakeTable",
    "TableConfig",
    "create_image_table",
    "run_compaction",
    "run_clustering",
    "run_merge",
    "expire_and_gc",
    "fsck",
    "scan_equivalence",
    "verify_merged_map_only",
    "analyze_health",
    "MaterializedView",
    "RefreshScheduler",
    "QueryCache",
    "CachedQueryEngine",
    "load_ocel_to_lakehouse",
    "discover_petri_net",
    "match_intent",
    "run_delete",
    "run_update",
    "run_export",
    "curate_corpus",
    "plan_query",
    "stream_append",
    "build_ivf_index",
    "search_ivf_index",
    "check_constraints",
    "write_audit_publish",
    "replicate",
    "Catalog",
]

# name → "module:attr" for the lazy public surface
_LAZY = {
    "create_image_table": ".sources.generator:create_image_table",
    "run_compaction": ".stages.compaction:run_compaction",
    "run_clustering": ".stages.clustering:run_clustering",
    "run_merge": ".stages.merge:run_merge",
    "expire_and_gc": ".stages.gc:expire_and_gc",
    "fsck": ".stages.gc:fsck",
    "scan_equivalence": ".stages.verify:scan_equivalence",
    "verify_merged_map_only": ".stages.verify:verify_merged_map_only",
    "analyze_health": ".stages.health:analyze_health",
    "MaterializedView": ".pipelines.mv:MaterializedView",
    "RefreshScheduler": ".pipelines.scheduler:RefreshScheduler",
    "QueryCache": ".state.query_cache:QueryCache",
    "CachedQueryEngine": ".state.query_cache:CachedQueryEngine",
    "load_ocel_to_lakehouse": ".sources.ocel:load_ocel_to_lakehouse",
    "discover_petri_net": ".pipelines.ocpn:discover_petri_net",
    "match_intent": ".pipelines.nl:match_intent",
    "run_delete": ".stages.delete:run_delete",
    "run_update": ".stages.update:run_update",
    "run_export": ".stages.export:run_export",
    "curate_corpus": ".pipelines.curate:curate_corpus",
    "plan_query": ".state.query_cache:plan_query",
    "stream_append": ".pipelines.streaming:stream_append",
    "build_ivf_index": ".pipelines.vector_index:build_ivf_index",
    "search_ivf_index": ".pipelines.vector_index:search_ivf_index",
    "check_constraints": ".stages.constraints:check_constraints",
    "write_audit_publish": ".pipelines.wap:write_audit_publish",
    "replicate": ".pipelines.replicate:replicate",
    "Catalog": ".catalog:Catalog",
}


def __getattr__(name):  # lazy imports keep `import ocel_ocpn_lakehouse_ray` light
    target = _LAZY.get(name)
    if target is None:
        raise AttributeError(name)
    import importlib

    mod_name, attr = target.split(":")
    return getattr(importlib.import_module(mod_name, __name__), attr)
