"""Manifest chain: the engine's table-metadata layer (the real version of the
reference's Iceberg snapshot machinery).

The reference delegates table metadata to PyIceberg (catalog load at
`ops/maintenance_system.py:16-27`, snapshot history at
`ops/maintenance_system.py:62-64,181-190`) and explicitly stubs the commit path
(`ops/commit_staged_files.py:63-64` "In production, you'd use proper Iceberg
AppendFiles operation").  This module *is* that production path, built for a
file-based Lance-style layout:

    table_root/
      data/frag-<contenthash>.parquet     immutable fragments
      manifests/v00000001.json            one manifest per committed version
      _latest                             pointer file (atomic rename swap)
      journal/<job_id>/part-*.json        per-partition lineage (state/lineage.py)

Commit protocol (snapshot isolation, SURVEY.md §4 "Atomic commit / isolation"):
  1. writer creates ``manifests/v{n}.json`` with O_EXCL — optimistic concurrency,
     a concurrent committer loses and retries on the new base;
  2. writer atomically ``os.replace``s a temp file onto ``_latest``.
Readers resolve ``_latest`` once at open and then only ever touch immutable
files, so a reader pinned to version V sees byte-identical data while and after
V+1 commits (north_star snapshot-isolation invariant).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field, asdict

FORMAT_VERSION = 1
MANIFEST_DIR = "manifests"
DATA_DIR = "data"
JOURNAL_DIR = "journal"
LATEST_FILE = "_latest"


@dataclass
class FragmentMeta:
    """One immutable data fragment + the column stats used for scan pruning.

    ``stats`` maps column name → {"min": v, "max": v, "null_count": n} for every
    non-binary column — the payload of the reference's "manifest rewrite"
    (scan planning reads file_size_in_bytes at `ops/maintenance_system.py:38-49`;
    we add per-column min/max so predicates can prune fragments).
    """

    fragment_id: str
    path: str                      # relative to table root
    rows: int
    bytes: int
    stats: dict = field(default_factory=dict)

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "FragmentMeta":
        return cls(**d)

    def prune(self, column: str, lo=None, hi=None) -> bool:
        """True if this fragment can be SKIPPED for predicate lo <= col <= hi."""
        st = self.stats.get(column)
        if not st or st.get("min") is None:
            return False
        if lo is not None and st["max"] < lo:
            return True
        if hi is not None and st["min"] > hi:
            return True
        return False


@dataclass
class Manifest:
    version: int
    parent: int | None
    created_at: float
    operation: str
    schema: list              # [[name, arrow-type-string], ...]
    config: dict
    fragments: list           # list[FragmentMeta]
    summary: dict = field(default_factory=dict)

    @property
    def total_bytes(self) -> int:
        return sum(f.bytes for f in self.fragments)

    @property
    def total_rows(self) -> int:
        return sum(f.rows for f in self.fragments)

    def fragment_ids(self) -> set:
        return {f.fragment_id for f in self.fragments}

    def to_json(self) -> str:
        d = asdict(self)
        d["format_version"] = FORMAT_VERSION
        return json.dumps(d, indent=1)

    @classmethod
    def from_json(cls, s: str) -> "Manifest":
        d = json.loads(s)
        d.pop("format_version", None)
        d["fragments"] = [FragmentMeta.from_dict(f) for f in d["fragments"]]
        return cls(**d)


def manifest_path(root: str, version: int) -> str:
    return os.path.join(root, MANIFEST_DIR, f"v{version:08d}.json")


def read_latest_version(root: str) -> int:
    with open(os.path.join(root, LATEST_FILE)) as f:
        return int(f.read().strip())


def load_manifest(root: str, version: int | None = None) -> Manifest:
    if version is None:
        version = read_latest_version(root)
    with open(manifest_path(root, version)) as f:
        return Manifest.from_json(f.read())


def list_manifest_versions(root: str) -> list[int]:
    mdir = os.path.join(root, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def init_table_dirs(root: str) -> None:
    os.makedirs(os.path.join(root, DATA_DIR), exist_ok=True)
    os.makedirs(os.path.join(root, MANIFEST_DIR), exist_ok=True)
    os.makedirs(os.path.join(root, JOURNAL_DIR), exist_ok=True)


def _swap_latest(root: str, version: int) -> None:
    """MONOTONICALLY advance _latest to ``version`` (no-op if already
    ahead): a crashed-commit repairer racing live committers must never move
    the pointer backwards.  Serialized by an flock on a sidecar lock file
    (single-node; a shared object store would use a CAS on the pointer
    object instead).  The tmp name is unique per ATTEMPT (uuid) — threads
    share a pid and would collide on pid-based names."""
    import fcntl
    import uuid

    with open(os.path.join(root, f".{LATEST_FILE}.lock"), "a") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        try:
            try:
                if version <= read_latest_version(root):
                    return
            except (FileNotFoundError, ValueError):
                pass  # no pointer yet (initial create)
            tmp = os.path.join(root, f".{LATEST_FILE}.tmp.{uuid.uuid4().hex}")
            with open(tmp, "w") as f:
                f.write(str(version))
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, os.path.join(root, LATEST_FILE))
        finally:
            fcntl.flock(lk, fcntl.LOCK_UN)


def publish_manifest(root: str, manifest: Manifest) -> None:
    """Atomic commit: exclusive manifest create + atomic _latest swap."""
    path = manifest_path(root, manifest.version)
    with open(path, "x") as f:          # O_EXCL → optimistic-concurrency guard
        f.write(manifest.to_json())
    _swap_latest(root, manifest.version)


class CommitConflict(RuntimeError):
    pass


def commit_version(
    root: str,
    *,
    base_version: int,
    operation: str,
    add: list,
    remove_ids: set,
    schema: list,
    config: dict,
    summary: dict | None = None,
    max_retries: int = 10,
) -> Manifest:
    """Append a new manifest version: carry over live fragments minus
    ``remove_ids`` plus ``add``.  Retries on concurrent-commit conflict by
    rebasing onto the new latest, validating that every removed fragment is
    still live (otherwise the maintenance job operated on stale data and must
    abort — same failure Iceberg raises as a validation exception)."""
    attempt_base = base_version
    for _ in range(max_retries):
        current = load_manifest(root, read_latest_version(root))
        if current.version != attempt_base:
            live = current.fragment_ids()
            if not set(remove_ids) <= live:
                raise CommitConflict(
                    f"fragments {set(remove_ids) - live} were removed by a "
                    f"concurrent commit (base {attempt_base} → {current.version})"
                )
            attempt_base = current.version
        kept = [f for f in current.fragments if f.fragment_id not in remove_ids]
        new = Manifest(
            version=current.version + 1,
            parent=current.version,
            created_at=time.time(),
            operation=operation,
            schema=schema,
            config=config,
            fragments=kept + list(add),
            summary=summary or {},
        )
        try:
            publish_manifest(root, new)
            return new
        except FileExistsError:
            # Either we lost a live race (the winner will advance _latest), or
            # a previous writer crashed AFTER creating v{n}.json but BEFORE
            # swapping _latest — that orphan would wedge every future commit at
            # the same version number.  The orphan manifest was durably
            # published, so repair by rolling _latest forward to it; the next
            # loop iteration rebases past it.
            _repair_orphan_latest(root)
            continue
    raise CommitConflict(f"could not commit after {max_retries} attempts")


def _repair_orphan_latest(root: str) -> None:
    """If manifest files exist beyond _latest (a committer crashed between the
    exclusive manifest create and the pointer swap), finish the crashed
    publish by advancing _latest to the highest existing manifest version."""
    versions = list_manifest_versions(root)
    if not versions:
        return
    latest = read_latest_version(root)
    top = versions[-1]
    if top <= latest:
        return  # normal race: the winner's swap is done or imminent
    _swap_latest(root, top)


# ------------------------------------------------------------------- tags
# Named snapshot refs (Iceberg tags): a tag pins a version under a stable
# name so readers can open `LakeTable.load(root, tag="prod")` regardless of
# how many maintenance commits have advanced _latest.  Stored as one JSON
# map serialized by the same flock that guards the _latest swap; a tagged
# version's manifest is protected from snapshot expiry (stages/gc.py checks
# tagged_versions()).

TAGS_FILE = "_tags.json"


def _tags_path(root: str) -> str:
    return os.path.join(root, TAGS_FILE)


def read_tags(root: str) -> dict[str, int]:
    try:
        with open(_tags_path(root)) as f:
            return {k: int(v) for k, v in json.load(f).items()}
    except FileNotFoundError:
        return {}


def _write_tags_locked(root: str, mutate) -> dict[str, int]:
    import fcntl
    import uuid

    lock = os.path.join(root, ".tags.lock")
    with open(lock, "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        try:
            tags = read_tags(root)
            tags = mutate(tags)
            tmp = _tags_path(root) + f".tmp.{os.getpid()}.{uuid.uuid4().hex[:6]}"
            with open(tmp, "w") as f:
                json.dump(tags, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, _tags_path(root))
            return tags
        finally:
            fcntl.flock(lk, fcntl.LOCK_UN)


def set_tag(root: str, name: str, version: int) -> dict[str, int]:
    # the manifest must exist NOW; expiry protection keeps it afterwards
    load_manifest(root, version)

    def mut(tags):
        tags[name] = int(version)
        return tags

    return _write_tags_locked(root, mut)


def delete_tag(root: str, name: str) -> dict[str, int]:
    def mut(tags):
        tags.pop(name, None)
        return tags

    return _write_tags_locked(root, mut)


def tagged_versions(root: str) -> set[int]:
    return set(read_tags(root).values())
