"""Both rewrite-shuffle strategies (storage-partitioned "fs" and
object-store "ray") must produce identical results, survive failpoint
resume, and leave no shuffle partials behind."""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pytest
import ray

from ocel_ocpn_lakehouse_ray.sources.generator import (
    _update_mask,
    create_image_table,
    gen_batch,
    gen_update_batch,
    merge_source_dataset,
)
from ocel_ocpn_lakehouse_ray.stages.clustering import run_clustering
from ocel_ocpn_lakehouse_ray.stages.merge import run_merge
from ocel_ocpn_lakehouse_ray.stages.verify import scan_equivalence

SEED = 42
N = 200


@pytest.fixture(params=["fs", "ray"])
def strategy(request, monkeypatch):
    monkeypatch.setenv("GRAFT_SHUFFLE", request.param)
    # pin the merge plan to the hash co-group: these tests exercise the
    # SHUFFLE strategies, which the cow default would bypass for merges
    monkeypatch.setenv("GRAFT_MERGE", "shuffle")
    return request.param


def _expected_after_merge():
    ids = np.arange(N)
    m = _update_mask(ids, SEED)
    return pa.concat_tables([
        gen_batch(ids[~m], SEED),
        gen_update_batch(ids[m], SEED),
        gen_batch(np.arange(N // 20) + 9 * 10**11, SEED + 7),
    ])


def test_lifecycle_equivalent_under_both_strategies(tmp_path, strategy):
    root = str(tmp_path / "t")
    t = create_image_table(root, N, num_fragments=6, seed=SEED)
    t, _ = run_clustering(t, order="zorder", job_id=f"z-{strategy}")
    t, rep = run_merge(t, merge_source_dataset(N, seed=SEED, num_blocks=2),
                       job_id=f"m-{strategy}", num_partitions=3)
    assert rep["updates"] > 0 and rep["inserts"] == N // 20
    se = scan_equivalence(t.to_dataset(),
                          ray.data.from_arrow(_expected_after_merge()),
                          num_parts=4)
    assert se["passed"], se
    # no shuffle partials left behind under journal/
    leftovers = glob.glob(os.path.join(root, "journal", "*", "shuffle"))
    assert leftovers == []


def test_merge_failpoint_resume_under_both_strategies(tmp_path, strategy):
    root = str(tmp_path / "t")
    t = create_image_table(root, N, num_fragments=6, seed=SEED)
    src = merge_source_dataset(N, seed=SEED, num_blocks=2)
    with pytest.raises(Exception):
        run_merge(t, src, job_id=f"mr-{strategy}", num_partitions=3, failpoint=1)
    t2, _ = run_merge(t, src, job_id=f"mr-{strategy}", num_partitions=3)
    se = scan_equivalence(t2.to_dataset(),
                          ray.data.from_arrow(_expected_after_merge()),
                          num_parts=4)
    assert se["passed"], se


def test_fs_shuffle_file_count_bounded_at_high_partition_count(tmp_path):
    """VERDICT r2 #6: the partials file count must be bounded by the number
    of MAP TASKS (one file per task, partitions = row groups inside it), not
    map_tasks x P — at P=64 over a handful of blocks that's the difference
    between <10 files and hundreds."""
    import glob
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data

    from ocel_ocpn_lakehouse_ray.stages.fs_shuffle import fs_shuffle_groups

    P = 64
    n = 4096
    tbl = pa.table({
        "k": pa.array(np.arange(n, dtype=np.int64)),
        "__part": pa.array((np.arange(n) % P).astype(np.int32)),
    })
    ds = ray.data.from_arrow(tbl).repartition(4)
    work = str(tmp_path / "shuf")

    def group_sum(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "part": [g["__part"][0].as_py()],
            "total": [pc.sum(g["k"]).as_py()],
            "rows": [g.num_rows],
        })

    outs = fs_shuffle_groups(ds, part_col="__part", work_dir=work,
                             reduce_fn=group_sum)
    assert len(outs) == P
    got = {o["part"][0].as_py(): (o["total"][0].as_py(), o["rows"][0].as_py())
           for o in outs}
    for p in range(P):
        idx = np.arange(n)[np.arange(n) % P == p]
        assert got[p] == (int(idx.sum()), len(idx))
    files = glob.glob(os.path.join(work, "**", "*.parquet"), recursive=True)
    assert 0 < len(files) <= 8, f"{len(files)} partial files for 4 blocks"


@pytest.mark.parametrize("mode", ["shuffle", "cow"])
def test_merge_strategies_equivalent_and_resumable(tmp_path, mode, monkeypatch):
    """Both MERGE physical plans (hash co-group vs copy-on-write) must yield
    the identical post-merge table and survive a failpoint resume."""
    import numpy as np

    from ocel_ocpn_lakehouse_ray.sources.generator import (
        create_image_table,
        merge_source_dataset,
    )
    from ocel_ocpn_lakehouse_ray.stages.merge import run_merge
    from ocel_ocpn_lakehouse_ray.stages.verify import verify_merged_map_only

    monkeypatch.setenv("GRAFT_MERGE", mode)
    root = str(tmp_path / mode)
    t = create_image_table(root, 300, num_fragments=8, seed=42)
    with pytest.raises(RuntimeError, match="failpoint"):
        run_merge(t, merge_source_dataset(300, seed=42, num_blocks=2),
                  job_id=f"ms-{mode}", failpoint=1)
    # resume: journaled partitions skip, the rest complete
    t2, rep = run_merge(t, merge_source_dataset(300, seed=42, num_blocks=2),
                        job_id=f"ms-{mode}")
    assert rep["updates"] > 0 and rep["inserts"] == 300 // 20
    vr = verify_merged_map_only(t2, n=300, seed=42, num_blocks=4)
    assert vr["passed"] and vr["id_checksum_ok"], vr
    ids = t2.to_arrow(columns=["image_id"])["image_id"].to_pylist()
    assert len(ids) == len(set(ids)) == 300 + 300 // 20


def test_cow_merge_pure_insert_keeps_fragments(tmp_path, monkeypatch):
    """COW + fully-disjoint source: every fragment is untouched (no rewrite
    records), rows are added exactly once."""
    import numpy as np

    from ocel_ocpn_lakehouse_ray.config import TableConfig
    from ocel_ocpn_lakehouse_ray.sources.generator import gen_batch
    from ocel_ocpn_lakehouse_ray.stages.merge import run_merge
    from ocel_ocpn_lakehouse_ray.table import IMAGE_SCHEMA, LakeTable

    import ray.data

    monkeypatch.setenv("GRAFT_MERGE", "cow")
    root = str(tmp_path / "t")
    t = LakeTable.create(root, IMAGE_SCHEMA, TableConfig(target_fragment_bytes=1 << 20))
    t = t.append_arrow(gen_batch(np.arange(200), 42), name_parts=("seed", "0"))
    src = ray.data.from_arrow(gen_batch(np.arange(20) + 5 * 10**12, 42 + 1))
    t2, rep = run_merge(t, src, job_id="cow-pure-insert", num_partitions=2)
    assert rep["touched_fragments"] == 0
    assert rep["inserts"] == 20 and rep["updates"] == 0
    assert t2.manifest.total_rows == 220
    ids = t2.to_arrow(columns=["image_id"])["image_id"].to_pylist()
    assert len(ids) == len(set(ids)) == 220


def test_cow_delete_markers_with_leftovers_and_inserts(tmp_path):
    """delete_col + the single-exchange insert pass: unmatched delete
    markers (routed to insert partitions) are no-ops, matched markers
    delete, leftovers (cross-claimed rows, marker-stripped sidecars) and
    pure inserts concat under ONE schema — regression for the
    marker-column schema mismatch between exchange rows and leftover
    files."""
    import glob
    import os as _os

    import numpy as np
    import pyarrow as pa

    import ray.data

    from ocel_ocpn_lakehouse_ray.config import TableConfig
    from ocel_ocpn_lakehouse_ray.sources.generator import (
        gen_batch,
        gen_update_batch,
    )
    from ocel_ocpn_lakehouse_ray.stages.merge import run_merge
    from ocel_ocpn_lakehouse_ray.table import IMAGE_SCHEMA, LakeTable

    root = str(tmp_path / "t")
    t = LakeTable.create(root, IMAGE_SCHEMA,
                         TableConfig(target_fragment_bytes=1 << 30))
    t = t.append_arrow(gen_batch(np.arange(0, 100, 2), 42),
                       name_parts=("seed", "even"))
    t = t.append_arrow(gen_batch(np.arange(1, 100, 2), 42),
                       name_parts=("seed", "odd"))
    for b in glob.glob(_os.path.join(root, "data", "*.bloom")):
        _os.remove(b)  # range-only routing → cross-claims → leftovers

    upd = gen_update_batch(np.arange(0, 20, 2), 42)          # 10 updates
    new = gen_batch(np.arange(4) + 8 * 10**12, 43)           # pure inserts
    # matched delete markers (keys 1,3) + UNMATCHED markers (far keys →
    # unclaimed → ride the insert partitions; must be dropped, not inserted)
    del_match = gen_batch(np.array([1, 3]), 42)
    del_miss = gen_batch(np.array([5, 7]) + 9 * 10**12, 44)
    markers = pa.concat_tables([del_match, del_miss]).append_column(
        "__delete", pa.array([True] * 4))
    rest = pa.concat_tables([upd, new])
    src = pa.concat_tables([
        rest.append_column("__delete", pa.array([False] * rest.num_rows)),
        markers])
    _os.environ["GRAFT_MERGE"] = "cow"
    try:
        t2, rep = run_merge(t, ray.data.from_arrow(src),
                            job_id="cow-delmix", delete_col="__delete")
    finally:
        _os.environ.pop("GRAFT_MERGE", None)
    assert rep["updates"] == 10 and rep["inserts"] == 4, rep
    assert rep["deletes"] == 2, rep
    ids = t2.to_arrow(columns=["image_id"])["image_id"].to_pylist()
    assert len(ids) == len(set(ids)) == 100 - 2 + 4
    gen = set(gen_batch(np.array([1, 3]), 42)["image_id"].to_pylist())
    assert not (gen & set(ids))  # deleted keys gone
    miss = set(del_miss["image_id"].to_pylist())
    assert not (miss & set(ids))  # unmatched markers never insert


def test_cow_cross_claimed_leftovers_no_duplicates(tmp_path):
    """A source row whose key RANGE matches several fragments is routed to
    all of them but matches in only one; the others record it as a leftover.
    The insert pass must drop those leftovers (their key is in a matched
    sidecar) — one update, zero phantom inserts.  Bloom sidecars are removed
    so range-only routing deterministically cross-claims every row."""
    import glob
    import os

    import numpy as np
    import pyarrow as pa

    import ray.data

    from ocel_ocpn_lakehouse_ray.config import TableConfig
    from ocel_ocpn_lakehouse_ray.sources.generator import (
        gen_batch,
        gen_update_batch,
    )
    from ocel_ocpn_lakehouse_ray.stages.merge import run_merge
    from ocel_ocpn_lakehouse_ray.table import IMAGE_SCHEMA, LakeTable

    root = str(tmp_path / "t")
    t = LakeTable.create(root, IMAGE_SCHEMA,
                         TableConfig(target_fragment_bytes=1 << 30))
    # two fragments with fully INTERLEAVED key ranges (evens / odds)
    t = t.append_arrow(gen_batch(np.arange(0, 200, 2), 42),
                       name_parts=("seed", "even"))
    t = t.append_arrow(gen_batch(np.arange(1, 200, 2), 42),
                       name_parts=("seed", "odd"))
    assert len(t.fragments) == 2
    for b in glob.glob(os.path.join(root, "data", "*.bloom")):
        os.remove(b)  # force range-only routing → both fragments claimed

    upd = gen_update_batch(np.arange(0, 40, 2), 42)   # even keys only
    new = gen_batch(np.arange(5) + 7 * 10**12, 43)
    src = ray.data.from_arrow(pa.concat_tables([upd, new]))
    import os as _os

    _os.environ["GRAFT_MERGE"] = "cow"
    try:
        t2, rep = run_merge(t, src, job_id="cow-crossclaim")
    finally:
        _os.environ.pop("GRAFT_MERGE", None)
    assert rep["updates"] == 20 and rep["inserts"] == 5, rep
    ids = t2.to_arrow(columns=["image_id"])["image_id"].to_pylist()
    assert len(ids) == len(set(ids)) == 200 + 5
