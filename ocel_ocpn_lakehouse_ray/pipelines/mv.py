"""Materialized views: any Dataset-producing builder persisted as a LakeTable
and refreshed by full overwrite — the reference's MV layer
(`ops/materialized_views.py:71-79,288-290`: "an MV is just another table,
refreshed by write_iceberg(mode=overwrite)") on our manifest-committed format.

Refresh is the real two-phase overwrite: fragments staged first, then ONE
manifest commit swaps the full fragment set — a reader mid-refresh sees
either the old view or the new view, never a mix.  Refresh stats persist in
the manifest summary chain (the analog of refresh_stats.json,
`ops/view_refresh_scheduler.py:184-201`)."""

from __future__ import annotations

import os
import time

import pyarrow as pa

from ..config import TableConfig
from ..state import manifest as mf
from ..table import LakeTable, schema_to_meta


def _dataset_schema(ds) -> pa.Schema:
    """Arrow schema of a Dataset (handles Ray's Schema wrapper)."""
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    if isinstance(s, pa.Schema):
        return s
    return pa.schema(
        [pa.field(n, t) for n, t in zip(s.names, s.types)]
    )


class MaterializedView:
    def __init__(self, warehouse_root: str, name: str, builder):
        """builder: callable () -> ray.data.Dataset (or pyarrow Table)."""
        self.root = os.path.join(warehouse_root, "views", name)
        self.name = name
        self.builder = builder

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.root, mf.LATEST_FILE))

    def refresh(self) -> dict:
        import ray.data

        t0 = time.time()
        result = self.builder()
        if isinstance(result, pa.Table):
            result = ray.data.from_arrow(result)
        batches = [
            b for b in result.iter_batches(batch_format="pyarrow") if b.num_rows
        ]
        data = (
            pa.concat_tables(batches).combine_chunks()
            # empty first refresh must still carry the builder's REAL schema,
            # not a zero-column table (result.schema() knows it even with 0 rows)
            if batches else _dataset_schema(result).empty_table()
        )
        # NOTE: MV results are aggregates (small); a fact-sized view would
        # stream through append_dataset instead of a driver concat.
        if not self.exists():
            LakeTable.create(self.root, data.schema,
                             TableConfig(target_fragment_bytes=128 * 1024 * 1024))
        t = LakeTable.load(self.root)
        from ..sources.fragments import write_table_as_fragments

        metas = write_table_as_fragments(
            self.root, data, target_bytes=t.config.target_fragment_bytes,
        ) if data.num_rows else []
        new = mf.commit_version(
            self.root,
            base_version=t.version,
            operation="mv-refresh",
            add=metas,
            remove_ids=t.manifest.fragment_ids(),   # full overwrite (S5)
            schema=schema_to_meta(data.schema) if data.num_columns else t.manifest.schema,
            config=t.manifest.config,
            summary={"view": self.name, "rows": data.num_rows,
                     "refresh_seconds": round(time.time() - t0, 3)},
        )
        return new.summary

    def read(self):
        return LakeTable.load(self.root).to_dataset()

    def history(self) -> list[dict]:
        return [m.summary for m in LakeTable.load(self.root).history()
                if m.operation == "mv-refresh"]
