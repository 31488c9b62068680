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
