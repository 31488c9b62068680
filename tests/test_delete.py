"""Predicate DELETE (stages/delete.py): stats pruning, exact row removal,
no-op candidates kept un-rewritten, snapshot isolation, failpoint resume."""

import numpy as np
import pytest

from ocel_ocpn_lakehouse_ray.sources.generator import create_image_table
from ocel_ocpn_lakehouse_ray.stages.delete import run_delete
from ocel_ocpn_lakehouse_ray.table import LakeTable


@pytest.fixture()
def table(tmp_path):
    return create_image_table(str(tmp_path / "t"), 300, num_fragments=10, seed=13)


def test_delete_between_exact_and_isolated(table):
    before = table.to_arrow(columns=["image_id", "w"])
    lo, hi = 48, 64
    expect_deleted = sum(1 for v in before["w"].to_pylist() if lo <= v <= hi)
    assert expect_deleted > 0

    t2, rep = run_delete(
        table, [{"column": "w", "op": "between", "lo": lo, "hi": hi}],
        job_id="del-1")
    assert rep["deleted"] == expect_deleted
    assert t2.manifest.total_rows == 300 - expect_deleted
    ws = t2.to_arrow(columns=["w"])["w"].to_pylist()
    assert not any(lo <= v <= hi for v in ws)
    # untouched rows survive byte-identical id set
    keep_ids = sorted(i for i, v in zip(before["image_id"].to_pylist(),
                                        before["w"].to_pylist())
                      if not (lo <= v <= hi))
    assert sorted(t2.to_arrow(columns=["image_id"])["image_id"].to_pylist()) == keep_ids
    # snapshot isolation: the pre-delete version still shows every row
    pre = LakeTable.load(table.root, version=table.version)
    assert pre.manifest.total_rows == 300


def test_delete_isin_ids(table):
    ids = table.to_arrow(columns=["image_id"])["image_id"].to_pylist()[:7]
    t2, rep = run_delete(
        table, [{"column": "image_id", "op": "isin", "values": ids}],
        job_id="del-isin")
    assert rep["deleted"] == 7
    left = set(t2.to_arrow(columns=["image_id"])["image_id"].to_pylist())
    assert not (left & set(ids)) and len(left) == 293


def test_delete_prunes_and_keeps_unmatched_fragments(table):
    # impossible range: every fragment pruned by stats, nothing rewritten
    t2, rep = run_delete(
        table, [{"column": "w", "op": "between", "lo": 10**6, "hi": 10**6 + 1}],
        job_id="del-none")
    assert rep["deleted"] == 0 and rep["pruned_fragments"] == len(table.fragments)
    assert t2.version == table.version  # no commit for a no-op

    # a single-row delete: only the fragment holding that id is rewritten
    frag_ids_before = {f.fragment_id for f in table.fragments}
    one_id = table.to_arrow(columns=["image_id"])["image_id"].to_pylist()[0]
    t3, rep3 = run_delete(
        table, [{"column": "image_id", "op": "eq", "value": one_id}],
        job_id="del-one")
    assert rep3["deleted"] == 1 and rep3["rewritten"] == 1
    survivors = {f.fragment_id for f in t3.fragments} & frag_ids_before
    assert len(survivors) == len(table.fragments) - 1


def test_delete_failpoint_resume(table):
    pred = [{"column": "h", "op": "between", "lo": 32, "hi": 48}]
    with pytest.raises(Exception):
        run_delete(table, pred, job_id="del-r", failpoint=0)
    t2, rep = run_delete(table, pred, job_id="del-r")
    ws = t2.to_arrow(columns=["h"])["h"].to_pylist()
    assert not any(32 <= v <= 48 for v in ws)
    assert t2.manifest.total_rows + rep["deleted"] == 300


def test_delete_conflicts_with_concurrent_merge(table):
    """Two writers rewriting the same fragments: the second commit must
    CommitConflict (same guarantee the MERGE/compact writers have)."""
    from ocel_ocpn_lakehouse_ray.sources.generator import merge_source_dataset
    from ocel_ocpn_lakehouse_ray.stages.merge import run_merge
    from ocel_ocpn_lakehouse_ray.state.manifest import CommitConflict

    a = LakeTable.load(table.root)          # two independent handles
    b = LakeTable.load(table.root)
    _, rep = run_delete(a, [{"column": "w", "op": "between", "lo": 32, "hi": 128}],
                        job_id="del-race")  # rewrites every fragment
    assert rep["deleted"] > 0
    with pytest.raises(CommitConflict):
        run_merge(b, merge_source_dataset(300, seed=13, num_blocks=2),
                  job_id="merge-race")
