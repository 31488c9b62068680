"""Predicate DELETE: copy-on-write row deletion — the remaining DML verb
next to MERGE INTO (`stages/merge.py`), absent from the reference's
advisory maintenance layer but required by any real lakehouse user.

Plan over manifest metadata only: fragments whose min/max stats CANNOT
contain a matching row pass through untouched (`FragmentMeta.prune` — the
same pruning MERGE uses); each candidate fragment becomes one independent
rewrite task that reads the fragment, drops matching rows vectorized
(`pyarrow.compute`), and writes the survivor fragment (or nothing, if every
row matched).  No shuffle, no exchange — the same embarrassingly-parallel
scaling class as compaction, bounded by storage bandwidth at 100 TB.

Resumable: each fragment journals a lineage record; rerunning the same
job_id skips journaled fragments and rebuilds the commit from the journal.

Supported predicates (each a dict, combined with AND):
  {"column": c, "op": "between", "lo": x, "hi": y}
  {"column": c, "op": "eq", "value": v}
  {"column": c, "op": "isin", "values": [...]}
"""

from __future__ import annotations

import hashlib
import json
import time

import pyarrow as pa
import pyarrow.compute as pc

from ..sources.fragments import batch_to_metas, metas_to_batch, write_table_as_fragments
from ..state import lineage


def predicate_fingerprint(*objs) -> str:
    """Stable short hash of a DML job's predicate/SET payload.  Folded into
    the default job_id AND checked against the lineage job meta on resume:
    journal records written under one predicate must never be reused by a
    rerun with a different one (same-version rerun after an interrupted
    DELETE would otherwise silently mix two predicates into one commit)."""
    blob = json.dumps(objs, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:10]


def check_job_meta(root: str, job_id: str, fp: str, payload: dict) -> None:
    """First run writes {fingerprint, payload} to the job meta; a resume with
    a different fingerprint (same explicit job_id, different predicates/sets)
    raises instead of reusing the stale journal."""
    meta = lineage.load_job_meta(root, job_id)
    if meta is None:
        lineage.write_job_meta(root, job_id, {"fingerprint": fp, **payload})
    elif meta.get("fingerprint") != fp:
        raise ValueError(
            f"job {job_id!r} was previously run with different "
            f"predicates/sets (journal fingerprint {meta.get('fingerprint')} "
            f"!= {fp}); use a fresh job_id or clear the journal")


def _match_expr(batch: pa.Table, predicates: list[dict]):
    """Boolean mask of rows MATCHING every predicate (AND) — these rows are
    deleted."""
    import numpy as np

    # explicit bool dtype: pa.array([]) would infer NULL type (the empty-
    # batch bug class in ROUND_NOTES_r2.md)
    mask = pa.array(np.ones(batch.num_rows, dtype=bool))
    for p in predicates:
        col = batch[p["column"]]
        op = p["op"]
        if op == "between":
            m = pc.and_(pc.greater_equal(col, pa.scalar(p["lo"])),
                        pc.less_equal(col, pa.scalar(p["hi"])))
        elif op == "eq":
            m = pc.equal(col, pa.scalar(p["value"]))
        elif op == "isin":
            m = pc.is_in(col, value_set=pa.array(p["values"]))
        else:
            raise ValueError(f"unsupported delete predicate op {op!r}")
        mask = pc.and_(mask, pc.fill_null(m, False))
    return mask


def _fragment_may_match(frag, predicates: list[dict]) -> bool:
    """Stats check: False only when the fragment provably holds no match."""
    for p in predicates:
        c, op = p["column"], p["op"]
        if op == "between" and frag.prune(c, p["lo"], p["hi"]):
            return False
        if op == "eq" and frag.prune(c, p["value"], p["value"]):
            return False
        if op == "isin" and p["values"] and all(
                frag.prune(c, v, v) for v in p["values"]):
            return False
    return True


def _delete_in_fragment(batch: pa.Table, *, root: str, job_id: str,
                        predicates_json: str, target_bytes: int,
                        failpoint: int | None = None) -> pa.Table:
    """One task per candidate fragment: read → drop matches → rewrite."""
    import pyarrow.parquet as pq
    import os

    predicates = json.loads(predicates_json)
    out = []
    for row in batch.to_pylist():
        fid = row["frag_id"]
        if failpoint is not None and row["idx"] == failpoint:
            raise RuntimeError(f"failpoint fragment {row['idx']}")
        if lineage.load_record(root, job_id, fid) is not None:
            continue  # resumed: already journaled
        tbl = pq.read_table(os.path.join(root, row["path"]),
                            use_threads=False)
        mask = _match_expr(tbl, predicates)
        deleted = int(pc.sum(mask).as_py() or 0)
        if deleted == 0:  # stats over-approximated; keep the original file
            lineage.write_record(root, lineage.PartitionRecord(
                job_id=job_id, partition_id=fid, frags_in=[fid],
                frags_out=[], rows=tbl.num_rows, bytes=0,
                extra={"deleted": 0}))
            continue
        keep = tbl.filter(pc.invert(mask))
        metas = (write_table_as_fragments(
            root, keep, target_bytes=target_bytes,
            name_parts=(job_id, fid)) if keep.num_rows else [])
        lineage.write_record(root, lineage.PartitionRecord(
            job_id=job_id, partition_id=fid, frags_in=[fid],
            frags_out=[m.to_dict() for m in metas],
            rows=keep.num_rows, bytes=sum(m.bytes for m in metas),
            extra={"deleted": deleted}))
        out.extend(metas)
    return metas_to_batch(out)


def run_delete(table, predicates: list[dict], *, job_id: str | None = None,
               failpoint: int | None = None):
    """Execute DELETE WHERE <predicates ANDed>; returns (new_table, report)."""
    import ray.data

    fp = predicate_fingerprint(predicates)
    chain = f"b-{table.branch}-" if getattr(table, "branch", None) else ""
    job_id = job_id or f"delete-{chain}v{table.version}-{fp}"
    t0 = time.time()
    candidates = [f for f in table.fragments
                  if _fragment_may_match(f, predicates)]
    pruned = len(table.fragments) - len(candidates)
    if not candidates:
        return table, {"job_id": job_id, "deleted": 0, "rewritten": 0,
                       "pruned_fragments": pruned, "seconds": 0.0}
    check_job_meta(table.root, job_id, fp,
                   {"predicates": predicates, "base_version": table.version})

    rows = [{"idx": i, "frag_id": f.fragment_id, "path": f.path}
            for i, f in enumerate(candidates)]
    ds = ray.data.from_items(rows)
    ds.map_batches(
        _delete_in_fragment,
        fn_kwargs=dict(root=table.root, job_id=job_id,
                       predicates_json=json.dumps(predicates),
                       target_bytes=table.config.target_fragment_bytes,
                       failpoint=failpoint),
        batch_format="pyarrow", batch_size=1,
    ).materialize()  # drive the tasks; results land in the journal

    records = lineage.load_records(table.root, job_id)
    missing = [f.fragment_id for f in candidates
               if f.fragment_id not in records]
    if missing:
        raise RuntimeError(f"delete incomplete: fragments {missing} not journaled")
    add, remove_ids, deleted = [], set(), 0
    for f in candidates:
        rec = records[f.fragment_id]
        # a candidate with zero matches keeps its ORIGINAL fragment (no
        # rewrite churn): the journaled output equals the input rows
        if rec.extra.get("deleted", 0) == 0:
            continue
        add.extend(rec.out_metas())
        remove_ids.add(f.fragment_id)
        deleted += rec.extra["deleted"]
    elapsed = time.time() - t0
    new_table = table.commit(
        operation="delete", add=add, remove_ids=remove_ids,
        summary={"job_id": job_id, "deleted": deleted,
                 "rewritten": len(remove_ids), "pruned_fragments": pruned,
                 "seconds": round(elapsed, 3)})
    report = dict(new_table.manifest.summary)
    return new_table, report
