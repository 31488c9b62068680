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


def test_full_story_second_wave(tmp_path):
    """Round-4 second-wave capstone: WAP-staged maintenance on a branch →
    constraint audit → publish → follower replication → metadata tables all
    compose on one table."""
    from ocel_ocpn_lakehouse_ray.pipelines.replicate import replicate
    from ocel_ocpn_lakehouse_ray.pipelines.wap import write_audit_publish
    from ocel_ocpn_lakehouse_ray.sources.generator import gen_batch
    from ocel_ocpn_lakehouse_ray.stages.constraints import check_constraints

    root = str(tmp_path / "t")
    t = create_image_table(root, 200, num_fragments=8, seed=7)

    # replicate the initial state to a follower
    dst = str(tmp_path / "follower")
    rep = replicate(root, dst)
    assert rep["applied"]

    # WAP a clean append
    wrep = write_audit_publish(
        root,
        lambda b: b.append_arrow(gen_batch(np.arange(200, 240), 7)),
        [{"type": "not_null", "column": "caption"},
         {"type": "unique", "columns": ["image_id"]}])
    assert wrep["published"]
    t = LakeTable.load(root)
    assert t.manifest.total_rows == 240

    # stage compaction + DML on a branch, audit the BRANCH, publish
    b = t.create_branch("maint")
    b, _ = run_compaction(b, job_id="sw-c")
    b, drep = run_delete(b, [{"column": "w", "op": "between",
                              "lo": 48, "hi": 64}], job_id="sw-d")
    audit = check_constraints(b.to_dataset(columns=["image_id", "caption"]),
                              [{"type": "unique", "columns": ["image_id"]},
                               {"type": "not_null", "column": "caption"}])
    assert audit["passed"]
    assert LakeTable.load(root).manifest.total_rows == 240  # main untouched
    pub = LakeTable.load(root).publish_branch("maint")
    assert pub.manifest.total_rows == 240 - drep["deleted"]

    # follower syncs the published rewrite (mirror mode) and converges
    rep2 = replicate(root, dst)
    assert rep2["applied"] and rep2["mode"] == "mirror"
    f = LakeTable.load(dst)
    assert (sorted(f.to_arrow(columns=["image_id"])["image_id"].to_pylist())
            == sorted(pub.to_arrow(columns=["image_id"])["image_id"].to_pylist()))

    # metadata tables reflect the story
    snaps = pub.meta_dataset("snapshots").to_pandas()
    assert "publish_branch" in set(snaps["operation"])
    files = pub.meta_dataset("files").to_pandas()
    assert files["rows"].sum() == pub.manifest.total_rows
    refs = LakeTable.load(dst).meta_dataset("refs").to_pandas()
    assert len(refs) == 0  # follower has no refs of its own
