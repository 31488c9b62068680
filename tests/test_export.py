"""Resumable training-shard export (stages/export.py): shard sizing,
column pruning, snapshot pinning, and failpoint-resume without recompute."""

import json
import os

import pyarrow.parquet as pq
import pytest

from ocel_ocpn_lakehouse_ray.sources.generator import create_image_table
from ocel_ocpn_lakehouse_ray.stages.export import plan_shards, run_export
from ocel_ocpn_lakehouse_ray.table import LakeTable


@pytest.fixture()
def table(tmp_path):
    return create_image_table(str(tmp_path / "t"), 300, num_fragments=10, seed=5)


def test_plan_shards_contiguous_and_capped(table):
    shards = plan_shards(table.fragments, shard_bytes=2 * table.fragments[0].bytes)
    assert sum(len(s) for s in shards) == len(table.fragments)
    flat = [f.fragment_id for s in shards for f in s]
    assert flat == [f.fragment_id for f in table.fragments]  # manifest order


def test_export_round_trip_and_manifest(table, tmp_path):
    out = str(tmp_path / "shards")
    per_shard = 3 * max(f.bytes for f in table.fragments)
    rep = run_export(table, out, job_id="exp-1", shard_bytes=per_shard)
    assert rep["rows"] == 300
    man = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert man["table_version"] == table.version
    assert man["total_rows"] == 300
    files = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    assert files == [s["file"] for s in man["shards"]]
    got = sorted(
        v for f in files
        for v in pq.read_table(os.path.join(out, f))["image_id"].to_pylist())
    expect = sorted(table.to_arrow(columns=["image_id"])["image_id"].to_pylist())
    assert got == expect
    assert os.path.exists(os.path.join(out, "_SUCCESS"))


def test_export_column_pruning(table, tmp_path):
    out = str(tmp_path / "shards_cols")
    run_export(table, out, job_id="exp-cols", columns=["image_id", "caption"])
    f = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))[0]
    t = pq.read_table(os.path.join(out, f))
    assert t.column_names == ["image_id", "caption"]


def test_export_failpoint_resume_skips_done_shards(table, tmp_path):
    out = str(tmp_path / "shards_resume")
    per_shard = 2 * max(f.bytes for f in table.fragments)
    with pytest.raises(Exception):
        run_export(table, out, job_id="exp-r", shard_bytes=per_shard,
                   failpoint=1)
    # some shards finished before the failpoint; record their mtimes
    done = {f: os.path.getmtime(os.path.join(out, f))
            for f in os.listdir(out) if f.endswith(".parquet")}
    assert done  # at least one shard completed

    rep = run_export(table, out, job_id="exp-r", shard_bytes=per_shard)
    assert rep["skipped_resumed"] == len(done)
    for f, mtime in done.items():
        assert os.path.getmtime(os.path.join(out, f)) == mtime  # not rewritten
    man = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert man["total_rows"] == 300


def test_delta_export_from_version(table, tmp_path):
    import numpy as np

    from ocel_ocpn_lakehouse_ray.sources.generator import gen_batch

    v0 = table.version
    t2 = table.append_arrow(gen_batch(np.arange(10**6, 10**6 + 25), 5))
    out = str(tmp_path / "delta")
    rep = run_export(t2, out, job_id="exp-delta", from_version=v0)
    assert rep["rows"] == 25
    man = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert man["from_version"] == v0 and man["total_rows"] == 25
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    got = {v for f in files
           for v in pq.read_table(os.path.join(out, f))["image_id"].to_pylist()}
    base = set(table.to_arrow(columns=["image_id"])["image_id"].to_pylist())
    assert len(got) == 25 and not (got & base)
