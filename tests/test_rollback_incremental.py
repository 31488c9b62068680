"""Rollback (Iceberg rollback_to_snapshot semantics) and incremental
snapshot-diff reads — time-travel maintenance surface over the manifest
chain (reference: the PyIceberg table API the maintenance layer sits on,
`ops/maintenance_system.py:16-27`)."""

import numpy as np
import pyarrow as pa
import pytest

from ocel_ocpn_lakehouse_ray.sources.generator import (
    create_image_table,
    gen_batch,
)
from ocel_ocpn_lakehouse_ray.stages.compaction import run_compaction
from ocel_ocpn_lakehouse_ray.table import LakeTable


def _ids(t):
    return sorted(t.to_arrow(columns=["image_id"])["image_id"].to_pylist())


@pytest.fixture()
def table(tmp_path):
    return create_image_table(str(tmp_path / "t"), 200, num_fragments=5, seed=11)


def test_rollback_restores_snapshot_and_preserves_history(table):
    v_base = table.version
    base_ids = _ids(table)
    t2 = table.append_arrow(gen_batch(np.arange(10**6, 10**6 + 40), 11))
    t3, _ = run_compaction(t2, job_id="rb-compact")
    assert t3.manifest.total_rows == 240

    t4 = t3.rollback(v_base)
    assert t4.version == t3.version + 1          # history advances, not resets
    assert t4.manifest.operation == "rollback"
    assert t4.manifest.total_rows == 200
    assert _ids(t4) == base_ids                  # exact snapshot content

    # the rolled-away version is still pinnable (snapshot isolation)
    pinned = LakeTable.load(table.root, version=t3.version)
    assert pinned.manifest.total_rows == 240


def test_rollback_after_gc_raises(table):
    from ocel_ocpn_lakehouse_ray.stages.gc import expire_snapshots, garbage_collect

    v_base = table.version
    t2, _ = run_compaction(
        table.append_arrow(gen_batch(np.arange(10**6, 10**6 + 20), 11)),
        job_id="rb-gc-compact")
    expire_snapshots(table.root, keep_last=1)
    garbage_collect(table.root, orphan_grace_seconds=0.0)
    with pytest.raises(FileNotFoundError, match="expired|garbage-collected"):
        t2.rollback(v_base)


def test_diff_and_incremental_read_append_only(table):
    v0 = table.version
    t2 = table.append_arrow(gen_batch(np.arange(10**6, 10**6 + 30), 11))
    t3 = t2.append_arrow(gen_batch(np.arange(2 * 10**6, 2 * 10**6 + 15), 11))

    d = t3.diff(v0)
    assert d["append_only"] and d["operations"] == ["append", "append"]
    assert d["added_rows"] == 45 and d["removed_rows"] == 0

    inc = t3.read_incremental(v0, columns=["image_id"])
    got = sorted(b for blk in inc.iter_batches(batch_format="pyarrow")
                 for b in blk["image_id"].to_pylist())
    expect = sorted(f"img_{i:012d}_{i}" for i in
                    list(range(10**6, 10**6 + 30))
                    + list(range(2 * 10**6, 2 * 10**6 + 15)))
    # ids are generator-format; just check the count and disjointness shape
    assert len(got) == 45 and len(set(got)) == 45
    base = set(_ids(table))
    assert not (set(got) & base)


def test_diff_flags_rewrites(table):
    v0 = table.version
    t2, _ = run_compaction(table, job_id="rb-diff-compact")
    d = t2.diff(v0)
    assert not d["append_only"] and "compact" in d["operations"]
    # incremental read over a rewrite range re-reads exactly the rows of the
    # REWRITTEN fragments (untouched right-sized fragments don't reappear)
    n = t2.read_incremental(v0).count()
    assert n == d["added_rows"] > 0


def test_incremental_read_empty_range(table):
    inc = table.read_incremental(table.version)
    assert inc.count() == 0


def test_tags_pin_load_and_survive_expiry(table):
    from ocel_ocpn_lakehouse_ray.stages.gc import expire_snapshots
    from ocel_ocpn_lakehouse_ray.state import manifest as mf

    v0 = table.version
    table.tag("prod")
    t2 = table.append_arrow(gen_batch(np.arange(10**6, 10**6 + 10), 11))
    t3 = t2.append_arrow(gen_batch(np.arange(2 * 10**6, 2 * 10**6 + 10), 11))

    # tag resolves regardless of how far _latest advanced
    pinned = LakeTable.load(table.root, tag="prod")
    assert pinned.version == v0 and pinned.manifest.total_rows == 200

    # expiry keeps the tagged manifest even outside keep_last
    rep = expire_snapshots(table.root, keep_last=1)
    assert v0 not in rep["expired"]
    assert LakeTable.load(table.root, tag="prod").version == v0

    # untag then expire: now it can go
    mf.delete_tag(table.root, "prod")
    rep2 = expire_snapshots(table.root, keep_last=1)
    assert v0 in rep2["expired"]
    with pytest.raises(KeyError):
        LakeTable.load(table.root, tag="prod")


def test_load_as_of_timestamp(table):
    import time as _time

    v1 = table.version
    t1_created = table.manifest.created_at
    _time.sleep(0.05)  # guarantee distinct commit timestamps
    t2 = table.append_arrow(gen_batch(np.arange(10**6, 10**6 + 40), 11))
    # between the two commits: resolves to v1
    mid = (t1_created + t2.manifest.created_at) / 2
    assert LakeTable.load(table.root, as_of=mid).version == v1
    # at/after the second commit: resolves to v2
    assert LakeTable.load(table.root, as_of=_time.time() + 1).version == t2.version
    # before the table existed: error
    with pytest.raises(FileNotFoundError):
        LakeTable.load(table.root, as_of=t1_created - 10)
    # mutually exclusive with version
    with pytest.raises(ValueError):
        LakeTable.load(table.root, version=v1, as_of=mid)
