"""Branch refs + constraint audits + write-audit-publish (round 4 second
wave).  Covers: branch isolation from main, publish-as-net-change (main
appends since fork survive), publish conflict on overlapping rewrites, GC
pinning of branch-only fragments, distributed constraint checks, and both
WAP outcomes."""

import os

import numpy as np
import pyarrow as pa
import pytest

from ocel_ocpn_lakehouse_ray.config import TableConfig
from ocel_ocpn_lakehouse_ray.sources.generator import create_image_table, gen_batch
from ocel_ocpn_lakehouse_ray.state import branches as br
from ocel_ocpn_lakehouse_ray.state import manifest as mf
from ocel_ocpn_lakehouse_ray.table import IMAGE_SCHEMA, LakeTable


def _ids(t):
    return sorted(t.to_arrow(columns=["image_id"])["image_id"].to_pylist())


def test_branch_write_isolated_from_main(tmp_table_root):
    t = create_image_table(tmp_table_root, 60, num_fragments=2)
    main_v = t.version
    b = t.create_branch("audit")
    assert b.branch == "audit" and b.version == 0
    b = b.append_arrow(gen_batch(np.arange(60, 90)))
    assert b.version == 1
    # main untouched: latest pointer and row count unchanged
    m = LakeTable.load(tmp_table_root)
    assert m.version == main_v
    assert m.manifest.total_rows == 60
    # branch handle sees both
    b2 = LakeTable.load(tmp_table_root, branch="audit")
    assert b2.manifest.total_rows == 90
    assert "audit" in m.branches()


def test_load_rejects_multiple_refs(tmp_table_root):
    t = create_image_table(tmp_table_root, 20, num_fragments=1)
    t.create_branch("b1")
    with pytest.raises(ValueError):
        LakeTable.load(tmp_table_root, version=0, branch="b1")
    with pytest.raises(KeyError):
        LakeTable.load(tmp_table_root, branch="nope")


def test_publish_preserves_main_appends_since_fork(tmp_table_root):
    t = create_image_table(tmp_table_root, 40, num_fragments=2)
    b = t.create_branch("wap")
    b = b.append_arrow(gen_batch(np.arange(40, 50)))
    # main advances independently (append-only)
    m = LakeTable.load(tmp_table_root).append_arrow(gen_batch(np.arange(100, 110)))
    pub = m.publish_branch("wap")
    assert pub.manifest.operation == "publish_branch"
    expected = sorted(
        gen_batch(np.arange(50))["image_id"].to_pylist()
        + gen_batch(np.arange(100, 110))["image_id"].to_pylist())
    assert _ids(pub) == expected
    # published branch is deleted by default
    assert pub.branches() == []


def test_publish_conflict_on_overlapping_rewrite(tmp_table_root):
    t = create_image_table(tmp_table_root, 40, num_fragments=4)
    b = t.create_branch("risky")
    # branch rewrites (removes) a fragment
    victim = b.fragments[0]
    b.commit(operation="delete", add=[], remove_ids={victim.fragment_id})
    # main compacts the SAME fragment away
    m = LakeTable.load(tmp_table_root)
    m.commit(operation="compact", add=[], remove_ids={victim.fragment_id})
    with pytest.raises(mf.CommitConflict):
        LakeTable.load(tmp_table_root).publish_branch("risky")


def test_branch_fragments_pinned_from_gc_until_delete(tmp_table_root):
    from ocel_ocpn_lakehouse_ray.stages.gc import garbage_collect

    t = create_image_table(tmp_table_root, 30, num_fragments=1)
    b = t.create_branch("tmp")
    b = b.append_arrow(gen_batch(np.arange(30, 60)))
    branch_only = {f.fragment_id for f in b.fragments} - {
        f.fragment_id for f in t.fragments}
    assert branch_only
    rep = garbage_collect(tmp_table_root, orphan_grace_seconds=0.0)
    assert not any(d.rsplit(".", 1)[0] in branch_only for d in rep["deleted"])
    br.delete_branch(tmp_table_root, "tmp")
    rep = garbage_collect(tmp_table_root, orphan_grace_seconds=0.0)
    deleted_ids = {d.rsplit(".", 1)[0] for d in rep["deleted"]}
    assert branch_only <= deleted_ids


def test_branch_name_validation_and_double_create(tmp_table_root):
    t = create_image_table(tmp_table_root, 20, num_fragments=1)
    with pytest.raises(ValueError):
        t.create_branch("../evil")
    t.create_branch("dev")
    with pytest.raises(FileExistsError):
        t.create_branch("dev")
    # branching from a branch handle is rejected
    b = LakeTable.load(tmp_table_root, branch="dev")
    with pytest.raises(ValueError):
        b.create_branch("dev2")
    with pytest.raises(ValueError):
        b.tag("x")


# ------------------------------------------------------------- constraints


def _quality_ds():
    import ray.data

    tbl = pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "score": pa.array([0.5, 1.5, None, 0.2, -0.1], pa.float64()),
        "lang": pa.array(["en", "fr", "xx", None, "en"], pa.string()),
    })
    return ray.data.from_arrow(tbl)


def test_check_constraints_counts():
    from ocel_ocpn_lakehouse_ray.stages.constraints import check_constraints

    rep = check_constraints(_quality_ds(), [
        {"type": "not_null", "column": "score"},
        {"type": "not_null", "column": "id"},
        {"type": "range", "column": "score", "min": 0.0, "max": 1.0},
        {"type": "accepted_values", "column": "lang", "values": ["en", "fr"]},
        {"type": "unique", "columns": ["id"]},
    ])
    assert rep["rows_checked"] == 5
    assert rep["violations"]["not_null(score)"] == 1
    assert rep["violations"]["not_null(id)"] == 0
    assert rep["violations"]["range(score)"] == 2      # 1.5 and -0.1; null ignored
    assert rep["violations"]["accepted_values(lang)"] == 1  # xx; null ignored
    assert rep["violations"]["unique(id)"] == 0
    assert not rep["passed"]


def test_check_constraints_unique_dup_count():
    import ray.data

    from ocel_ocpn_lakehouse_ray.stages.constraints import check_constraints

    tbl = pa.table({"k": pa.array([1, 1, 1, 2, 3, 3], pa.int64())})
    rep = check_constraints(ray.data.from_arrow(tbl),
                            [{"type": "unique", "columns": ["k"]}])
    assert rep["violations"]["unique(k)"] == 3  # two extra 1s + one extra 3
    assert rep["rows_checked"] == 6


# --------------------------------------------------------------------- WAP


def test_wap_publishes_clean_write(tmp_table_root):
    from ocel_ocpn_lakehouse_ray.pipelines.wap import write_audit_publish

    t = create_image_table(tmp_table_root, 30, num_fragments=1)
    rep = write_audit_publish(
        tmp_table_root,
        lambda b: b.append_arrow(gen_batch(np.arange(30, 45))),
        [{"type": "not_null", "column": "caption"},
         {"type": "unique", "columns": ["image_id"]}],
    )
    assert rep["audit"]["passed"] and rep["published"]
    m = LakeTable.load(tmp_table_root)
    assert m.manifest.total_rows == 45
    assert m.manifest.operation == "publish_branch"
    assert m.branches() == []


def test_wap_blocks_bad_write(tmp_table_root):
    from ocel_ocpn_lakehouse_ray.pipelines.wap import write_audit_publish

    t = create_image_table(tmp_table_root, 30, num_fragments=1)
    main_v = t.version
    dup = gen_batch(np.arange(0, 10))  # image_ids 0-9 already exist
    rep = write_audit_publish(
        tmp_table_root,
        lambda b: b.append_arrow(dup),
        [{"type": "unique", "columns": ["image_id"]}],
        keep_failed=False,
    )
    assert not rep["audit"]["passed"] and not rep["published"]
    assert rep["audit"]["violations"]["unique(image_id)"] == 10
    m = LakeTable.load(tmp_table_root)
    assert m.version == main_v and m.manifest.total_rows == 30
    assert m.branches() == []  # failed branch dropped (keep_failed=False)


# --------------------------------------------------------- metadata tables


def test_meta_datasets(tmp_table_root):
    t = create_image_table(tmp_table_root, 40, num_fragments=2)
    t.tag("prod")
    t.create_branch("dev")

    files = t.meta_dataset("files").to_pandas()
    assert len(files) == len(t.fragments)
    assert files["rows"].sum() == 40
    assert set(files.columns) == {"fragment_id", "path", "rows", "bytes", "stats"}

    snaps = t.meta_dataset("snapshots").to_pandas()
    assert list(snaps["version"]) == [0, 1]
    assert list(snaps["operation"]) == ["create", "append"]

    refs = t.meta_dataset("refs").to_pandas()
    assert set(zip(refs["name"], refs["type"])) == {("prod", "tag"), ("dev", "branch")}

    with pytest.raises(ValueError):
        t.meta_dataset("nope")


def test_maintenance_job_on_branch_then_publish(tmp_table_root):
    """Staged maintenance (the WAP story for rewrites): run compaction ON A
    BRANCH — commit routing keeps main untouched — then publish applies the
    rewrite to main as one net-change commit."""
    from ocel_ocpn_lakehouse_ray.stages.compaction import run_compaction

    t = create_image_table(tmp_table_root, 60, num_fragments=6)
    main_v, main_frags = t.version, len(t.fragments)
    b = t.create_branch("maint")
    b2, rep = run_compaction(b, job_id="branch-compact")
    assert b2.branch == "maint"
    assert len(b2.fragments) < main_frags
    m = LakeTable.load(tmp_table_root)
    assert m.version == main_v and len(m.fragments) == main_frags  # isolated
    pub = m.publish_branch("maint")
    assert len(pub.fragments) == len(b2.fragments)
    assert _ids(pub) == _ids(b2)


def test_publish_retry_after_crash_is_idempotent(tmp_table_root):
    """Crash window: publish committed to main but died before deleting the
    branch.  A retry must return the applied state, not raise or
    double-apply; a pure-delete branch whose fragment main independently
    compacted must still CONFLICT (the fragment heuristic can't tell these
    apart — the publish commit record can)."""
    t = create_image_table(tmp_table_root, 40, num_fragments=2)
    b = t.create_branch("w")
    b = b.append_arrow(gen_batch(np.arange(40, 50)))
    # simulate the crash: publish with delete=False (commit durable, branch
    # still on disk), then retry the normal way
    LakeTable.load(tmp_table_root).publish_branch("w", delete=False)
    rows_after = LakeTable.load(tmp_table_root).manifest.total_rows
    pub2 = LakeTable.load(tmp_table_root).publish_branch("w")
    assert pub2.manifest.total_rows == rows_after  # no double-apply
    assert LakeTable.load(tmp_table_root).branches() == []

    # contrast: same fragment set shape via an INDEPENDENT main rewrite is
    # still a conflict, not a silent no-op
    t2root = tmp_table_root + "2"
    t2 = create_image_table(t2root, 40, num_fragments=4)
    b2 = t2.create_branch("del")
    victim = b2.fragments[0]
    b2.commit(operation="delete", add=[], remove_ids={victim.fragment_id})
    LakeTable.load(t2root).commit(operation="compact", add=[],
                                  remove_ids={victim.fragment_id})
    with pytest.raises(mf.CommitConflict):
        LakeTable.load(t2root).publish_branch("del")
