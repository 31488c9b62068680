"""Schema evolution (additive-only), maintenance-plan generation, and the
materialized-view refresh layer."""

import numpy as np
import pyarrow as pa
import pytest

from ocel_ocpn_lakehouse_ray.pipelines.mv import MaterializedView
from ocel_ocpn_lakehouse_ray.sources.generator import create_image_table, gen_batch
from ocel_ocpn_lakehouse_ray.stages.evolution import (
    SchemaEvolutionError,
    evolve_schema,
    validate_additive,
)
from ocel_ocpn_lakehouse_ray.stages.plan import generate_maintenance_plan
from ocel_ocpn_lakehouse_ray.table import LakeTable


def test_schema_evolution_additive(tmp_path):
    root = str(tmp_path / "t")
    t = create_image_table(root, 80, num_fragments=4)
    t2 = evolve_schema(t, [pa.field("quality_score", pa.float64())])
    assert t2.version == t.version + 1
    assert "quality_score" in t2.schema.names
    # old fragments read back with the new column null-filled
    df = t2.to_dataset().to_pandas()
    assert df["quality_score"].isna().all() and len(df) == 80
    # projected read including the evolved column
    df2 = t2.to_dataset(columns=["image_id", "quality_score"]).to_pandas()
    assert list(df2.columns) == ["image_id", "quality_score"]
    # new data with the column appends fine and mixes with old fragments
    newb = gen_batch(np.arange(80, 100))
    newb = newb.append_column("quality_score", pa.array(np.ones(20)))
    t3 = t2.append_arrow(newb)
    df3 = t3.to_dataset().to_pandas()
    assert len(df3) == 100 and df3["quality_score"].notna().sum() == 20
    # duplicates and non-additive changes rejected
    with pytest.raises(SchemaEvolutionError):
        evolve_schema(t3, [pa.field("caption", pa.string())])
    with pytest.raises(SchemaEvolutionError):
        validate_additive(t.schema, pa.schema([("image_id", pa.int64())]))


def test_maintenance_plan(tmp_path):
    root = str(tmp_path / "t")
    t = create_image_table(root, 100, num_fragments=16)
    plan = generate_maintenance_plan(t)
    assert plan["table_version"] == t.version
    assert plan["schedule"] in ("daily", "weekly", "monthly")
    jobs = {j["job"] for j in plan["jobs"]}
    # 16 tiny fragments → compaction must be recommended
    assert "compaction" in jobs
    est = next(j for j in plan["jobs"] if j["job"] == "compaction")["estimate"]
    assert est["estimated_files_after"] <= est["files_before"]


def test_materialized_view_refresh_and_overwrite(tmp_path):
    import ray.data

    warehouse = str(tmp_path / "wh")
    calls = {"n": 0}

    def builder():
        calls["n"] += 1
        return ray.data.range(10 * calls["n"]).map_batches(
            lambda b: pa.table({"id": b["id"], "doubled": b["id"] * 2}),
            batch_format="numpy",
        )

    mv = MaterializedView(warehouse, "doubles", builder)
    assert not mv.exists()
    s1 = mv.refresh()
    assert s1["rows"] == 10
    assert mv.read().count() == 10
    # refresh = full overwrite (reference S5), not append
    s2 = mv.refresh()
    assert s2["rows"] == 20
    assert mv.read().count() == 20
    assert len(mv.history()) == 2
    # snapshot isolation applies to views too: the v1 manifest still reads
    t_v1 = LakeTable.load(mv.root, version=1)
    assert t_v1.to_dataset().count() == 10
