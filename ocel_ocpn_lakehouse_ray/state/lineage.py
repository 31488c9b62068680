"""Per-partition lineage journal: makes every maintenance job resumable.

The reference's only cross-run state is a timestamps file
(`ops/view_refresh_scheduler.py:184-201` refresh_stats.json) and a crude
staged-load write-ahead area (`ops/commit_staged_files.py:54-80`).  The north
rule requires real per-partition lineage — fragments-in → fragments-out, row
counts, bytes — so an interrupted compaction/cluster/MERGE resumes without
recomputing committed partitions.

Design: each worker task that finishes a partition writes its own record file
``journal/<job_id>/part-<partition_id>.json`` via tmp-file + atomic rename (no
cross-worker append races; safe on any POSIX fs and trivially shardable across
nodes on shared storage).  Fragment files themselves are content-addressed
(functions/hashing.content_address) so a replayed task re-creates the identical
file name and skips the write — journal + idempotent naming together give
exactly-once output effects per partition.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field, asdict

from .manifest import JOURNAL_DIR, FragmentMeta


@dataclass
class PartitionRecord:
    job_id: str
    partition_id: str
    frags_in: list          # fragment ids (or source shard labels) consumed
    frags_out: list         # list[FragmentMeta dicts] produced
    rows: int
    bytes: int
    extra: dict = field(default_factory=dict)

    def out_metas(self) -> list:
        return [FragmentMeta.from_dict(d) for d in self.frags_out]


def journal_dir(root: str, job_id: str) -> str:
    return os.path.join(root, JOURNAL_DIR, job_id)


def record_path(root: str, job_id: str, partition_id: str) -> str:
    return os.path.join(journal_dir(root, job_id), f"part-{partition_id}.json")


def write_record(root: str, rec: PartitionRecord) -> None:
    d = journal_dir(root, rec.job_id)
    os.makedirs(d, exist_ok=True)
    final = record_path(root, rec.job_id, rec.partition_id)
    tmp = final + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(asdict(rec), f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final)




def load_record(root: str, job_id: str, partition_id: str):
    """Single-partition journal lookup (one stat + one small read) — the
    per-task idempotency check; never scans the whole journal directory."""
    p = record_path(root, job_id, partition_id)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return PartitionRecord(**json.load(f))


def load_records(root: str, job_id: str) -> dict[str, PartitionRecord]:
    d = journal_dir(root, job_id)
    out: dict[str, PartitionRecord] = {}
    if not os.path.isdir(d):
        return out
    for name in sorted(os.listdir(d)):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        with open(os.path.join(d, name)) as f:
            rec = PartitionRecord(**json.load(f))
        out[rec.partition_id] = rec
    return out


def write_job_meta(root: str, job_id: str, meta: dict) -> None:
    """Persist job-level plan state (e.g. sampled range boundaries) so a resumed
    run reuses the SAME partitioning instead of re-sampling a different one."""
    d = journal_dir(root, job_id)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".meta.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(d, "meta.json"))


def load_job_meta(root: str, job_id: str) -> dict | None:
    p = os.path.join(journal_dir(root, job_id), "meta.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)
