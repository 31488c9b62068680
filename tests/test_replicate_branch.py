"""Branch-aware replication (VERDICT r4 #6): stage on a source branch,
replicate the branch, publish on the follower — the follower's main must
converge to the source's post-publish content, including the case where
main advanced independently after the fork."""

from __future__ import annotations

import numpy as np
import pytest

from ocel_ocpn_lakehouse_ray.pipelines.replicate import replicate
from ocel_ocpn_lakehouse_ray.sources.generator import create_image_table, gen_batch
from ocel_ocpn_lakehouse_ray.table import LakeTable


def _ids(t):
    return sorted(t.to_arrow(columns=["image_id"])["image_id"].to_pylist())


@pytest.fixture()
def roots(tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    create_image_table(src, 30, num_fragments=2)
    replicate(src, dst)
    return src, dst


def test_branch_replicate_publish_converges(roots):
    src, dst = roots
    b = LakeTable.load(src).create_branch("staging")
    b.append_arrow(gen_batch(np.arange(100, 110)))

    rep = replicate(src, dst, branch="staging")
    assert rep["applied"] and rep["dst_branch_head"] == 1
    # follower sees the staged rows on ITS branch, main untouched
    fb = LakeTable.load(dst, branch="staging")
    assert len(_ids(fb)) == 40
    assert len(_ids(LakeTable.load(dst))) == 30

    src_main = LakeTable.load(src).publish_branch("staging")
    dst_main = LakeTable.load(dst).publish_branch("staging")
    assert _ids(src_main) == _ids(dst_main)
    assert len(_ids(dst_main)) == 40


def test_branch_replicate_preserves_independent_main_appends(roots):
    """Fork, then main advances with an independent append BEFORE the
    branch is published: the follower's publish must keep that append —
    i.e. the mirrored chain reproduces the source's head-vs-fork DELTA,
    not just the head fragment set."""
    src, dst = roots
    b = LakeTable.load(src).create_branch("staging")
    b.append_arrow(gen_batch(np.arange(100, 110)))
    # independent append X on source main AFTER the fork
    LakeTable.load(src).append_arrow(gen_batch(np.arange(500, 505)))
    replicate(src, dst)                       # follower main now has X
    replicate(src, dst, branch="staging")

    src_main = LakeTable.load(src).publish_branch("staging")
    dst_main = LakeTable.load(dst).publish_branch("staging")
    assert _ids(src_main) == _ids(dst_main)
    assert len(_ids(dst_main)) == 45          # 30 seed + 10 staged + 5 X


def test_branch_replicate_idempotent_and_refork(roots):
    src, dst = roots
    b = LakeTable.load(src).create_branch("daily")
    b.append_arrow(gen_batch(np.arange(200, 210)))
    assert replicate(src, dst, branch="daily")["applied"]
    assert not replicate(src, dst, branch="daily")["applied"]

    # source publishes and RE-CREATES the branch under the same name:
    # a new fork_uuid must re-mirror on the follower
    LakeTable.load(src).publish_branch("daily")
    replicate(src, dst)
    b2 = LakeTable.load(src).create_branch("daily")
    b2.append_arrow(gen_batch(np.arange(300, 310)))
    rep = replicate(src, dst, branch="daily")
    assert rep["applied"]
    src_main = LakeTable.load(src).publish_branch("daily")
    dst_main = LakeTable.load(dst).publish_branch("daily")
    assert _ids(src_main) == _ids(dst_main)
    assert len(_ids(dst_main)) == 50          # 30 + 10 + 10


def test_branch_replicate_bootstraps_follower(tmp_path):
    src = str(tmp_path / "s")
    dst = str(tmp_path / "d")
    create_image_table(src, 20, num_fragments=1)
    b = LakeTable.load(src).create_branch("wap")
    b.append_arrow(gen_batch(np.arange(50, 55)))
    rep = replicate(src, dst, branch="wap")   # no prior main sync
    assert rep["applied"]
    assert len(_ids(LakeTable.load(dst))) == 20
    assert len(_ids(LakeTable.load(dst, branch="wap"))) == 25


def test_branch_replicate_pins_fragments_against_follower_gc(roots):
    """The mirrored chain's fragments (fork AND head) survive a follower
    GC sweep — branch reachability includes replicated chains."""
    import time

    from ocel_ocpn_lakehouse_ray.stages.gc import expire_and_gc

    src, dst = roots
    b = LakeTable.load(src).create_branch("keep")
    b.append_arrow(gen_batch(np.arange(400, 410)))
    replicate(src, dst, branch="keep")
    expire_and_gc(dst, keep_last=1, orphan_grace_seconds=0.0,
                  now=time.time() + 10)
    # branch scan still fully readable after the sweep
    assert len(_ids(LakeTable.load(dst, branch="keep"))) == 40
    dst_main = LakeTable.load(dst).publish_branch("keep")
    assert len(_ids(dst_main)) == 40
