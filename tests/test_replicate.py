"""Follower-table replication (CDC apply): append fast-path, rewrite
mirroring, idempotence, and byte-identical convergence."""

import numpy as np
import pytest

from ocel_ocpn_lakehouse_ray.pipelines.replicate import replicate
from ocel_ocpn_lakehouse_ray.sources.generator import create_image_table, gen_batch
from ocel_ocpn_lakehouse_ray.table import LakeTable


def _sorted_ids(t):
    return sorted(t.to_arrow(columns=["image_id"])["image_id"].to_pylist())


@pytest.fixture()
def roots(tmp_path):
    return str(tmp_path / "src"), str(tmp_path / "dst")


def test_initial_sync_and_append_fast_path(roots):
    src_root, dst_root = roots
    create_image_table(src_root, 60, num_fragments=3)
    rep = replicate(src_root, dst_root)
    assert rep["applied"] and rep["mode"] == "mirror"  # first sync mirrors
    assert _sorted_ids(LakeTable.load(dst_root)) == _sorted_ids(LakeTable.load(src_root))

    # append-only advance -> append fast path, no removals
    LakeTable.load(src_root).append_arrow(gen_batch(np.arange(60, 90)))
    rep = replicate(src_root, dst_root)
    assert rep["applied"] and rep["mode"] == "append"
    assert rep["removed_fragments"] == 0
    src, dst = LakeTable.load(src_root), LakeTable.load(dst_root)
    assert _sorted_ids(dst) == _sorted_ids(src)
    assert dst.manifest.fragment_ids() == src.manifest.fragment_ids()


def test_rewrite_range_mirrors_snapshot(roots):
    from ocel_ocpn_lakehouse_ray.stages.compaction import run_compaction

    src_root, dst_root = roots
    create_image_table(src_root, 80, num_fragments=8)
    replicate(src_root, dst_root)

    # rewrite on the source: compaction replaces fragments
    t = LakeTable.load(src_root)
    run_compaction(t, job_id="repl-c")
    rep = replicate(src_root, dst_root)
    assert rep["applied"] and rep["mode"] == "mirror"
    assert rep["removed_fragments"] > 0
    src, dst = LakeTable.load(src_root), LakeTable.load(dst_root)
    assert dst.manifest.fragment_ids() == src.manifest.fragment_ids()
    assert _sorted_ids(dst) == _sorted_ids(src)


def test_sync_is_idempotent_and_resumable(roots):
    import os

    src_root, dst_root = roots
    create_image_table(src_root, 40, num_fragments=2)
    rep1 = replicate(src_root, dst_root)
    rep2 = replicate(src_root, dst_root)
    assert rep1["applied"] and not rep2["applied"]

    # crash-resume: delete the state file (commit durable, pointer lost) —
    # re-sync ships nothing new and converges without duplicating rows
    os.remove(os.path.join(dst_root, "_replication.json"))
    rep3 = replicate(src_root, dst_root)
    assert rep3["applied"] and rep3["shipped_fragments"] == 0
    assert _sorted_ids(LakeTable.load(dst_root)) == _sorted_ids(LakeTable.load(src_root))


def test_follower_survives_source_manifest_expiry(roots):
    from ocel_ocpn_lakehouse_ray.stages.gc import expire_snapshots

    src_root, dst_root = roots
    create_image_table(src_root, 30, num_fragments=2)
    replicate(src_root, dst_root)
    t = LakeTable.load(src_root)
    for lo in (30, 40, 50):
        t = t.append_arrow(gen_batch(np.arange(lo, lo + 10)))
    # expire everything but the newest snapshot: diff(last, cur) impossible
    expire_snapshots(src_root, keep_last=1)
    rep = replicate(src_root, dst_root)
    assert rep["applied"] and rep["mode"] == "mirror"
    assert _sorted_ids(LakeTable.load(dst_root)) == _sorted_ids(LakeTable.load(src_root))
