"""Snapshot expiry + reachability GC + orphan fsck — the real version of the
reference's retention *analyzer* (`ops/maintenance_system.py:169-228`, which
only prints recommendations) and file-registration repair
(`ops/fix_iceberg_registration.py:26-74`, S7).

Semantics:
- **expire_snapshots** drops manifest versions outside the retention policy
  (keep-last-k AND max-age, always keeping the current version); expired
  manifest JSON files are deleted.
- **garbage_collect** deletes data files unreachable from any RETAINED
  manifest (reachability over the surviving manifest set).  Readers pinned to
  a retained version are never broken — that is the snapshot-isolation
  contract; readers pinned to an EXPIRED version lose their files by design
  (same as Iceberg's expire_snapshots).
- **fsck** reports orphans: files in data/ referenced by NO manifest at all
  (e.g. a crashed write before its commit).  GC deletes them too when
  ``delete_orphans`` — but only if older than a grace period, so in-flight
  jobs' staged fragments survive.

All metadata/file-listing work: O(fragments), driver-side.
"""

from __future__ import annotations

import os
import time

from ..state import manifest as mf


def expire_snapshots(root: str, *, keep_last: int, max_age_days: float | None = None,
                     now: float | None = None) -> dict:
    """Drop manifests beyond the retention policy; returns a report."""
    now = time.time() if now is None else now
    versions = mf.list_manifest_versions(root)
    current = mf.read_latest_version(root)
    keep_last = max(1, keep_last)
    keep = set(versions[-keep_last:])
    keep.add(current)
    keep |= mf.tagged_versions(root)  # named refs pin their snapshots
    if max_age_days is not None:
        for v in versions:
            if v in keep:
                continue
            m = mf.load_manifest(root, v)
            if (now - m.created_at) / 86400.0 <= max_age_days:
                keep.add(v)
    expired = [v for v in versions if v not in keep]
    for v in expired:
        os.remove(mf.manifest_path(root, v))
    return {"expired": expired, "retained": sorted(keep)}


def reachable_fragments(root: str) -> set:
    """Union of fragment ids across all retained manifests — main chain AND
    every live branch chain (state/branches.py): branch-only fragments are
    pinned until their branch is deleted or published."""
    from ..state import branches as br

    live = set()
    for v in mf.list_manifest_versions(root):
        live |= mf.load_manifest(root, v).fragment_ids()
    live |= br.branch_reachable_fragments(root)
    return live


def fsck(root: str) -> dict:
    """Diff data/ listing vs manifest-referenced files (reference S7)."""
    live = reachable_fragments(root)
    data_dir = os.path.join(root, mf.DATA_DIR)
    on_disk, orphans = [], []
    for name in os.listdir(data_dir):
        if name.endswith(".bloom"):
            # key-bloom sidecar: owned by its fragment, orphan iff it is
            if name.rsplit(".", 1)[0] not in live:
                orphans.append(name)
            continue
        if not name.endswith(".parquet"):
            orphans.append(name)  # tmp leftovers etc.
            continue
        on_disk.append(name)
        if name.rsplit(".", 1)[0] not in live:
            orphans.append(name)
    missing = [
        fid for fid in live
        if not os.path.exists(os.path.join(data_dir, fid + ".parquet"))
    ]
    return {"files_on_disk": len(on_disk), "live_fragments": len(live),
            "orphans": sorted(set(orphans)), "missing": missing}


def garbage_collect(root: str, *, delete_orphans: bool = True,
                    orphan_grace_seconds: float = 3600.0,
                    now: float | None = None) -> dict:
    """Delete data files unreachable from any retained manifest."""
    now = time.time() if now is None else now
    live = reachable_fragments(root)
    data_dir = os.path.join(root, mf.DATA_DIR)
    deleted, kept_grace = [], []
    for name in os.listdir(data_dir):
        path = os.path.join(data_dir, name)
        # .parquet and .bloom sidecars share the fragment's lifetime
        frag_id = (name.rsplit(".", 1)[0]
                   if name.endswith((".parquet", ".bloom")) else name)
        if frag_id in live:
            continue
        age = now - os.path.getmtime(path)
        if not delete_orphans or age < orphan_grace_seconds:
            # recent unreferenced file: possibly a staged write of an
            # in-flight job (reference S6 staged-load area) — leave it
            kept_grace.append(name)
            continue
        os.remove(path)
        deleted.append(name)
    return {"deleted": sorted(deleted), "kept_in_grace": sorted(kept_grace),
            "live_fragments": len(live)}


def cleanup_journal(root: str, *, max_age_days: float = 7.0,
                    now: float | None = None) -> dict:
    """Remove lineage-journal directories of finished jobs older than the
    retention window.  A job's journal is only a resume aid; once its manifest
    commit is durable the records are dead weight (staged source files under
    journal/<job>/source included)."""
    import shutil

    now = time.time() if now is None else now
    jroot = os.path.join(root, mf.JOURNAL_DIR)
    removed, kept = [], []
    if not os.path.isdir(jroot):
        return {"removed": [], "kept": []}
    for name in sorted(os.listdir(jroot)):
        path = os.path.join(jroot, name)
        if not os.path.isdir(path):
            continue
        age_days = (now - os.path.getmtime(path)) / 86400.0
        if age_days > max_age_days:
            shutil.rmtree(path, ignore_errors=True)
            removed.append(name)
        else:
            kept.append(name)
    return {"removed": removed, "kept": kept}


def expire_and_gc(root: str, *, keep_last: int, max_age_days: float | None = None,
                  orphan_grace_seconds: float = 3600.0, now: float | None = None) -> dict:
    exp = expire_snapshots(root, keep_last=keep_last, max_age_days=max_age_days, now=now)
    gc = garbage_collect(root, orphan_grace_seconds=orphan_grace_seconds, now=now)
    return {"expiry": exp, "gc": gc}
