"""Storage-partitioned shuffle: map tasks split batches by partition id and
append parquet PARTIALS under ``work_dir/part=<p>/``; one reduce task per
partition then reads exactly its partials and runs the group function.

Why not Ray's groupby shuffle for the rewrite jobs?  A maintenance rewrite
(cluster, MERGE) moves every byte of the table; routing those bytes through
the object store costs an extra copy in/out of shared memory plus the
all-to-all object transfer, and measured 0.65-0.70 scaling efficiency on the
bench box.  Writing map-side partials straight to table storage is the
external-shuffle pattern production engines use for exactly these jobs
(Spark's external shuffle / push-based Magnet): on a multi-node cluster the
partials directory lives on the shared table store (S3/HDFS), so reduce
locality is identical — and the map and reduce stages each scale like plain
parallel file I/O.

Partials are written once per (map task, partition) pair; reduce tasks are
plain Ray tasks (one per partition) whose group function is responsible for
idempotence (both callers journal lineage per partition, so a retried or
resumed reduce returns the journaled result without rewriting)."""

from __future__ import annotations

import glob
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def write_partials(batch: pa.Table, *, part_col: str, work_dir: str) -> pa.Table:
    """map_batches stage: split one batch by partition id, append one partial
    parquet file per partition present in the batch.  Emits (part, path) rows
    so the caller can fan reduce tasks without listing the directory."""
    if batch.num_rows == 0:  # empty upstream block: nothing to write
        return pa.table({"part": pa.array([], pa.int32()),
                         "path": pa.array([], pa.string())})
    part = batch[part_col].to_numpy()
    order = np.argsort(part, kind="stable")
    sorted_part = part[order]
    bounds = np.nonzero(np.diff(sorted_part))[0] + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(part)]])
    sorted_batch = batch.take(pa.array(order))
    out_p, out_f = [], []
    for s, e in zip(starts, ends):
        p = int(sorted_part[s])
        pdir = os.path.join(work_dir, f"part={p:05d}")
        os.makedirs(pdir, exist_ok=True)
        path = os.path.join(pdir, f"{uuid.uuid4().hex}.parquet")
        tmp = path + ".tmp"
        pq.write_table(sorted_batch.slice(s, e - s), tmp, compression="snappy")
        os.replace(tmp, path)
        out_p.append(p)
        out_f.append(path)
    return pa.table({"part": pa.array(out_p, pa.int32()),
                     "path": pa.array(out_f, pa.string())})


def fs_shuffle_groups(ds, *, part_col: str, work_dir: str, reduce_fn,
                      fn_kwargs: dict | None = None,
                      num_cpus_per_reduce: float = 1.0):
    """Run ``reduce_fn(group: pa.Table, **fn_kwargs) -> pa.Table`` once per
    partition of ``ds`` (partition ids in ``part_col``), shuffling through
    ``work_dir`` instead of the object store.  Returns the list of reduce
    outputs (Arrow tables) — callers aggregate tiny metadata results."""
    import ray

    os.makedirs(work_dir, exist_ok=True)
    manifest: dict[int, list[str]] = {}
    map_ds = ds.map_batches(
        write_partials, fn_kwargs=dict(part_col=part_col, work_dir=work_dir),
        batch_format="pyarrow",
    )
    for b in map_ds.iter_batches(batch_format="pyarrow"):
        for p, f in zip(b["part"].to_pylist(), b["path"].to_pylist()):
            manifest.setdefault(p, []).append(f)

    fn_kwargs = fn_kwargs or {}

    @ray.remote(num_cpus=num_cpus_per_reduce)
    def reduce_task(part: int, files: list[str]):
        group = pa.concat_tables([pq.read_table(f) for f in files]).combine_chunks()
        return reduce_fn(group, **fn_kwargs)

    refs = [reduce_task.remote(p, files) for p, files in sorted(manifest.items())]
    return ray.get(refs)


def cleanup(work_dir: str) -> None:
    import shutil

    shutil.rmtree(work_dir, ignore_errors=True)
