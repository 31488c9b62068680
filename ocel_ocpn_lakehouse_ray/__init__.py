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
    "analyze_health",
]


def __getattr__(name):  # lazy imports keep `import ocel_ocpn_lakehouse_ray` light
    if name == "create_image_table":
        from .sources.generator import create_image_table as f
        return f
    if name == "run_compaction":
        from .stages.compaction import run_compaction as f
        return f
    if name == "run_clustering":
        from .stages.clustering import run_clustering as f
        return f
    if name == "run_merge":
        from .stages.merge import run_merge as f
        return f
    if name in ("expire_and_gc", "fsck"):
        from .stages import gc as m
        return getattr(m, name)
    if name == "scan_equivalence":
        from .stages.verify import scan_equivalence as f
        return f
    if name == "analyze_health":
        from .stages.health import analyze_health as f
        return f
    raise AttributeError(name)
