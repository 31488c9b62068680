"""Compaction: greedy first-fit bin packing of under-target fragments into
target-size rewrites — the job the reference only *simulates*
(`ops/maintenance_system.py:134-160` computes ``estimated_files_after``;
nothing is rewritten).  Here the plan is executed.

Physical shape (SURVEY.md §7 step 4): compaction needs NO shuffle — each bin
is an independent read→concat→write task.  The driver plans over manifest
metadata (tiny); a ``Dataset`` of bin descriptors fans the rewrites out as
``map_batches`` tasks; each finished bin writes a per-partition lineage record
(state/lineage.py) BEFORE the final manifest commit, so an interrupted run
resumes by skipping journaled bins.  Fragment outputs are content-addressed →
a Ray-retried bin task recreates identical files (idempotent).

At 100 TB: bins are ~target_fragment_bytes (256 MB) units, so a full-table
compaction is ~400k independent 256 MB read+write tasks with zero data
exchange — embarrassingly parallel across a 256-node cluster, bounded only by
storage bandwidth.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

from ..sources.fragments import metas_to_batch, write_table_as_fragments
from ..state import lineage
from ..state.manifest import FragmentMeta
from .health import estimate_compaction


@dataclass
class CompactionPlan:
    bins: list            # list[list[FragmentMeta]] — each bin → one rewrite task
    untouched: list       # fragments left as-is
    estimate: dict = field(default_factory=dict)


def plan_compaction(fragments, *, target_bytes: int, small_bytes: int) -> CompactionPlan:
    """Greedy first-fit-decreasing bin packing (A14 made real).

    Candidates are all fragments below the target size; bins are capped at
    ``target_bytes``.  A bin that would contain a single fragment already
    above the small-file threshold is not worth rewriting and stays untouched.
    """
    candidates = sorted(
        (f for f in fragments if f.bytes < target_bytes),
        key=lambda f: f.bytes,
        reverse=True,
    )
    untouched = [f for f in fragments if f.bytes >= target_bytes]
    bins: list[list[FragmentMeta]] = []
    room: list[int] = []
    for f in candidates:
        for i in range(len(bins)):
            if room[i] >= f.bytes:
                bins[i].append(f)
                room[i] -= f.bytes
                break
        else:
            bins.append([f])
            room.append(target_bytes - f.bytes)
    # single-fragment bins above the small-file threshold gain nothing
    real_bins = []
    for b in bins:
        if len(b) == 1 and b[0].bytes >= small_bytes:
            untouched.append(b[0])
        else:
            real_bins.append(b)
    return CompactionPlan(
        bins=real_bins,
        untouched=untouched,
        estimate=estimate_compaction(fragments, target_bytes),
    )


def _compact_bin(batch: pa.Table, *, root: str, job_id: str, target_bytes: int,
                 failpoint=None) -> pa.Table:
    """map_batches stage (stateless TASK) over the bin-descriptor dataset:
    one row = one bin.  Reads the bin's fragments directly with pyarrow (the
    task-local analog of a custom datasource read), writes >=1
    content-addressed fragments, records lineage, and emits the new fragment
    metadata rows.  Idempotent: journaled bins are returned as-is (Ray retry
    safety)."""
    out = []
    for row in batch.to_pylist():
        bin_id = row["bin_id"]
        prior = lineage.load_record(root, job_id, bin_id)
        if prior is not None:  # already journaled (retried task)
            out.extend(prior.out_metas())
            continue
        if failpoint is not None and int(bin_id.split("-")[1]) >= failpoint:
            raise RuntimeError(f"failpoint: simulated crash at {bin_id}")
        paths = json.loads(row["paths"])
        # single-threaded reads: one bin task per CPU; arrow's default
        # 8-thread IO pool across 16 concurrent tasks thrashes the bus
        tables = [pq.read_table(os.path.join(root, p), use_threads=False,
                            memory_map=True)
                  for p in paths]
        merged = pa.concat_tables(tables)  # zero-copy chunk-list concat
        metas = write_table_as_fragments(
            root, merged, target_bytes=target_bytes, name_parts=(job_id, bin_id),
        )
        lineage.write_record(
            root,
            lineage.PartitionRecord(
                job_id=job_id,
                partition_id=bin_id,
                frags_in=json.loads(row["frag_ids"]),
                frags_out=[m.to_dict() for m in metas],
                rows=merged.num_rows,
                bytes=sum(m.bytes for m in metas),
            ),
        )
        out.extend(metas)
    return metas_to_batch(out)


def run_compaction(table, *, job_id: str | None = None, failpoint: int | None = None):
    """Execute a compaction job end-to-end; returns (new_table, report).

    Resumable: rerun with the SAME ``job_id`` after an interruption — bins
    already in the lineage journal are skipped (their outputs are reused), and
    the final commit is built from the journal."""
    import ray.data

    cfg = table.config
    chain = f"b-{table.branch}-" if getattr(table, "branch", None) else ""
    job_id = job_id or f"compact-{chain}v{table.version}"
    t0 = time.time()
    plan = plan_compaction(
        table.fragments,
        target_bytes=cfg.target_fragment_bytes,
        small_bytes=cfg.small_file_bytes,
    )
    if not plan.bins:
        return table, {"job_id": job_id, "bins": 0, "rows": 0, "seconds": 0.0,
                       "skipped": "nothing to compact", "estimate": plan.estimate}

    done = lineage.load_records(table.root, job_id)
    bin_rows = []
    for i, b in enumerate(plan.bins):
        bin_id = f"bin-{i:05d}"
        bin_rows.append({
            "bin_id": bin_id,
            "paths": json.dumps([f.path for f in b]),
            "frag_ids": json.dumps([f.fragment_id for f in b]),
            "done": bin_id in done,
        })
    pending = [r for r in bin_rows if not r["done"]]

    if pending:
        ds = ray.data.from_items(pending)
        meta_ds = ds.map_batches(
            _compact_bin,
            fn_kwargs=dict(root=table.root, job_id=job_id,
                           target_bytes=cfg.target_fragment_bytes, failpoint=failpoint),
            batch_format="pyarrow",
            batch_size=1,
        )
        meta_ds.materialize()  # drive all bin tasks; results land in the journal

    # Build the commit from the journal (works for fresh AND resumed runs)
    records = lineage.load_records(table.root, job_id)
    missing = [r["bin_id"] for r in bin_rows if r["bin_id"] not in records]
    if missing:
        raise RuntimeError(f"compaction incomplete: bins {missing} not journaled")
    add, remove_ids, rows = [], set(), 0
    for r in bin_rows:
        rec = records[r["bin_id"]]
        add.extend(rec.out_metas())
        remove_ids.update(rec.frags_in)
        rows += rec.rows
    elapsed = time.time() - t0
    new_table = table.commit(
        operation="compact",
        add=add,
        remove_ids=remove_ids,
        summary={
            "job_id": job_id,
            "bins": len(plan.bins),
            "fragments_in": len(remove_ids),
            "fragments_out": len(add),
            "rows": rows,
            "seconds": round(elapsed, 3),
        },
    )
    report = {
        "job_id": job_id,
        "bins": len(plan.bins),
        "fragments_in": len(remove_ids),
        "fragments_out": len(add),
        "rows": rows,
        "bytes": sum(m.bytes for m in add),
        "seconds": round(elapsed, 3),
        "rows_per_sec": round(rows / elapsed, 1) if elapsed > 0 else None,
        "estimate": plan.estimate,
    }
    return new_table, report
