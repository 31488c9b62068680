"""Capstone integration: the full maintenance story on one table —
compact → Z-order → MERGE → strict verify → tag → DELETE → export →
rollback — asserting cross-job interplay (stats survive rewrites, tags pin
through DML, export reflects deletes, rollback restores across them)."""

import json
import os

import numpy as np
import pyarrow.parquet as pq

from ocel_ocpn_lakehouse_ray.sources.generator import (
    create_image_table,
    merge_source_dataset,
)
from ocel_ocpn_lakehouse_ray.stages.clustering import run_clustering
from ocel_ocpn_lakehouse_ray.stages.compaction import run_compaction
from ocel_ocpn_lakehouse_ray.stages.delete import run_delete
from ocel_ocpn_lakehouse_ray.stages.export import run_export
from ocel_ocpn_lakehouse_ray.stages.merge import run_merge
from ocel_ocpn_lakehouse_ray.stages.verify import verify_merged_map_only
from ocel_ocpn_lakehouse_ray.table import LakeTable


def test_full_story(tmp_path):
    n = 400
    root = str(tmp_path / "t")
    t = create_image_table(root, n, num_fragments=10, seed=21)

    t, _ = run_compaction(t, job_id="fs-c")
    t, _ = run_clustering(t, order="zorder", job_id="fs-z")
    pre_merge = t.version
    t, mrep = run_merge(t, merge_source_dataset(n, seed=21, num_blocks=3),
                        job_id="fs-m")
    assert mrep["updates"] > 0 and mrep["inserts"] == n // 20

    # strict verification + snapshot isolation (the north_star gates)
    vr = verify_merged_map_only(t, n=n, seed=21)
    assert vr["passed"] and vr["id_checksum_ok"]
    sr = verify_merged_map_only(LakeTable.load(root, version=pre_merge),
                                n=n, seed=21, merged=False)
    assert sr["passed"]

    # tag the verified snapshot, then DELETE a band on top of it
    t.tag("verified")
    rows_before = t.manifest.total_rows
    t2, drep = run_delete(
        t, [{"column": "w", "op": "between", "lo": 48, "hi": 64}],
        job_id="fs-del")
    assert drep["deleted"] > 0
    assert t2.manifest.total_rows == rows_before - drep["deleted"]

    # the tag still resolves to the pre-delete snapshot
    tagged = LakeTable.load(root, tag="verified")
    assert tagged.manifest.total_rows == rows_before

    # export the post-delete snapshot; shard rows match the live table
    out = str(tmp_path / "shards")
    erep = run_export(t2, out, job_id="fs-exp")
    assert erep["rows"] == t2.manifest.total_rows
    man = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert man["table_version"] == t2.version
    got = sorted(
        v for s in man["shards"]
        for v in pq.read_table(os.path.join(out, s["file"]),
                               columns=["image_id"])["image_id"].to_pylist())
    assert got == sorted(
        t2.to_arrow(columns=["image_id"])["image_id"].to_pylist())

    # rollback across the delete restores the tagged row count; history grows
    t3 = t2.rollback(tagged.version)
    assert t3.manifest.total_rows == rows_before
    assert t3.version == t2.version + 1
    d = t3.diff(t2.version)
    assert d["added_rows"] == drep["deleted"] or d["added_fragments"] > 0
