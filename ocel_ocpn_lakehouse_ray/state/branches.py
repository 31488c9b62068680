"""Branch refs: Iceberg-style writable snapshot branches over the manifest
chain, enabling the write-audit-publish (WAP) pattern.

Reference parity: the reference's tables sit on Iceberg
(`ingest/production_bootstrap.py`), whose ref system (branches + tags) is
the public surface this mirrors; the reference itself only ever writes to
main.  Tags (read-only refs) live in `state/manifest.py`; this module adds
the writable kind.

Design — branch = an independent manifest subchain:

    {root}/_branches/{name}/v00000000.json   fork-point copy (v0)
    {root}/_branches/{name}/v0000000N.json   branch commits
    {root}/_branches/{name}/_latest          branch head pointer
    {root}/_branches/{name}/.lock            per-branch commit flock

Branch manifests are deliberately NOT in the main `manifests/` directory:
main's crash repair (`_repair_orphan_latest`) fast-forwards `_latest` to the
highest manifest file it can see, so a branch manifest numbered past main's
head would get published by accident the next time a main commit raced.
Keeping chains in separate directories makes that impossible by
construction.  Data files are shared (`data/` is content-addressed), so a
branch append writes fragments exactly like a main append — only the commit
routing differs; GC reachability includes branch chains
(`stages/gc.reachable_fragments`).

Publishing applies the branch's NET change (relative to its fork point)
onto CURRENT main — appends that landed on main meanwhile are preserved,
and `commit_version`'s removed-fragments-still-live validation raises
`CommitConflict` if main rewrote what the branch also rewrote (the Iceberg
cherry-pick validation).  All metadata ops are O(fragments), driver-side.
"""

from __future__ import annotations

import os
import re
import time

from . import manifest as mf

BRANCHES_DIR = "_branches"
_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]*$")


def _check_name(name: str) -> str:
    if not _NAME_RE.match(name):
        raise ValueError(f"invalid branch name {name!r}")
    return name


def branch_dir(root: str, name: str) -> str:
    return os.path.join(root, BRANCHES_DIR, _check_name(name))


def _bmanifest_path(root: str, name: str, version: int) -> str:
    return os.path.join(branch_dir(root, name), f"v{version:08d}.json")


def list_branches(root: str) -> list[str]:
    d = os.path.join(root, BRANCHES_DIR)
    if not os.path.isdir(d):
        return []
    return sorted(n for n in os.listdir(d)
                  if os.path.isdir(os.path.join(d, n)))


def read_branch_head(root: str, name: str) -> int:
    try:
        with open(os.path.join(branch_dir(root, name), "_latest")) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        raise KeyError(f"unknown branch {name!r}; have {list_branches(root)}")


def load_branch_manifest(root: str, name: str,
                         version: int | None = None) -> mf.Manifest:
    if version is None:
        version = read_branch_head(root, name)
    with open(_bmanifest_path(root, name, version)) as f:
        return mf.Manifest.from_json(f.read())


def _swap_branch_head(root: str, name: str, version: int) -> None:
    """Monotone branch-head advance under the branch's flock (same contract
    as manifest._swap_latest, scoped to this branch's chain)."""
    import fcntl
    import uuid

    bdir = branch_dir(root, name)
    with open(os.path.join(bdir, ".lock"), "a") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        try:
            try:
                with open(os.path.join(bdir, "_latest")) as f:
                    if version <= int(f.read().strip()):
                        return
            except (FileNotFoundError, ValueError):
                pass
            tmp = os.path.join(bdir, f"._latest.tmp.{uuid.uuid4().hex}")
            with open(tmp, "w") as f:
                f.write(str(version))
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, os.path.join(bdir, "_latest"))
        finally:
            fcntl.flock(lk, fcntl.LOCK_UN)


def create_branch(root: str, name: str, *, from_version: int | None = None,
                  if_exists: str = "error") -> mf.Manifest:
    """Fork a branch at a main-chain snapshot (default: current latest).
    The fork point is branch manifest v0 — a copy of the main manifest with
    the fork recorded in its summary."""
    import uuid

    src = mf.load_manifest(root, from_version)
    bdir = branch_dir(root, name)
    if os.path.isdir(bdir):
        if if_exists == "error":
            raise FileExistsError(f"branch {name!r} already exists")
        return load_branch_manifest(root, name)
    os.makedirs(bdir)
    fork = mf.Manifest(
        version=0,
        parent=None,
        created_at=time.time(),
        operation="branch_fork",
        schema=src.schema,
        config=src.config,
        fragments=list(src.fragments),
        # fork_uuid disambiguates re-created branches under a reused name:
        # publish_branch's idempotency scan matches on it, so "fork, commit,
        # publish" cycles that repeat (same name, same head version) are
        # never mistaken for a crash-retry of an earlier publish.
        summary={"fork_of_main_version": src.version, "branch": name,
                 "fork_uuid": uuid.uuid4().hex},
    )
    with open(_bmanifest_path(root, name, 0), "x") as f:
        f.write(fork.to_json())
    _swap_branch_head(root, name, 0)
    return fork


def commit_to_branch(
    root: str,
    name: str,
    *,
    base_version: int,
    operation: str,
    add: list,
    remove_ids: set,
    schema: list,
    config: dict,
    summary: dict | None = None,
    max_retries: int = 10,
) -> mf.Manifest:
    """commit_version against the branch chain: rebase onto the branch head
    on conflict, validating removed fragments are still live there."""
    attempt_base = base_version
    for _ in range(max_retries):
        current = load_branch_manifest(root, name)
        if current.version != attempt_base:
            live = current.fragment_ids()
            if not set(remove_ids) <= live:
                raise mf.CommitConflict(
                    f"branch {name}: fragments {set(remove_ids) - live} were "
                    f"removed by a concurrent branch commit "
                    f"(base {attempt_base} -> {current.version})")
            attempt_base = current.version
        kept = [f for f in current.fragments if f.fragment_id not in remove_ids]
        new = mf.Manifest(
            version=current.version + 1,
            parent=current.version,
            created_at=time.time(),
            operation=operation,
            schema=schema,
            config=config,
            fragments=kept + list(add),
            summary={**(summary or {}), "branch": name},
        )
        try:
            with open(_bmanifest_path(root, name, new.version), "x") as f:
                f.write(new.to_json())
        except FileExistsError:
            # lost a race on this branch: the winner's head swap is done or
            # imminent; advance past it and rebase
            _swap_branch_head(
                root, name,
                max(v for v in _branch_versions(root, name)))
            continue
        _swap_branch_head(root, name, new.version)
        return new
    raise mf.CommitConflict(
        f"branch {name}: could not commit after {max_retries} attempts")


def _branch_versions(root: str, name: str) -> list[int]:
    bdir = branch_dir(root, name)
    return sorted(int(n[1:-5]) for n in os.listdir(bdir)
                  if n.startswith("v") and n.endswith(".json"))


def write_branch_chain(root: str, name: str,
                       manifests: list[mf.Manifest]) -> None:
    """Create (or replace) a branch subchain with the given manifests —
    the branch-replication primitive (pipelines/replicate.py): a follower
    mirrors a source branch as [fork copy, collapsed head] so its
    publish_branch computes the IDENTICAL net change as the source's.
    Versions must be contiguous from 0; the head pointer lands on the last."""
    import shutil

    if not manifests or [m.version for m in manifests] != list(
            range(len(manifests))):
        raise ValueError("branch chain must be contiguous versions from 0")
    bdir = branch_dir(root, name)
    if os.path.isdir(bdir):
        shutil.rmtree(bdir)
    os.makedirs(bdir)
    for m in manifests:
        with open(_bmanifest_path(root, name, m.version), "x") as f:
            f.write(m.to_json())
    _swap_branch_head(root, name, manifests[-1].version)


def delete_branch(root: str, name: str) -> None:
    """Drop the branch chain.  Data files referenced only by the branch
    become unreachable and are collected by the normal GC sweep."""
    import shutil

    bdir = branch_dir(root, name)
    if not os.path.isdir(bdir):
        raise KeyError(f"unknown branch {name!r}")
    shutil.rmtree(bdir)


def branch_reachable_fragments(root: str) -> set:
    """Fragment ids referenced by ANY branch manifest — pins them against
    GC exactly like retained main manifests."""
    live: set = set()
    for name in list_branches(root):
        for v in _branch_versions(root, name):
            live |= load_branch_manifest(root, name, v).fragment_ids()
    return live


def publish_branch(root: str, name: str, *, delete: bool = True) -> mf.Manifest:
    """Apply the branch's net change (head vs fork point) onto current main
    as ONE commit.  Main appends since the fork survive; a main rewrite of
    fragments the branch also removed raises CommitConflict (stale branch —
    re-fork and replay).  Returns the new main manifest."""
    head = load_branch_manifest(root, name)
    fork = load_branch_manifest(root, name, 0)
    head_ids = head.fragment_ids()
    fork_ids = fork.fragment_ids()
    added = [f for f in head.fragments if f.fragment_id not in fork_ids]
    removed = fork_ids - head_ids
    current = mf.load_manifest(root)
    cur_ids = current.fragment_ids()
    # crash-resume idempotency: a publish that committed but crashed before
    # deleting the branch must not raise (or double-apply) on retry.  The
    # publish commit itself is the discriminator — fragment-set heuristics
    # can't tell "already applied" from "main rewrote the same fragments".
    # Match on the fork's uuid (stamped at create_branch) so a branch
    # RE-CREATED under a reused name with the same head version is never
    # treated as already-applied; for pre-uuid forks fall back to comparing
    # the fork point, which always advances after a publish.
    fork_uuid = fork.summary.get("fork_uuid")
    fork_of = fork.summary.get("fork_of_main_version")
    for v in reversed(mf.list_manifest_versions(root)):
        m = mf.load_manifest(root, v)
        if (m.operation == "publish_branch"
                and m.summary.get("branch") == name
                and m.summary.get("branch_head") == head.version
                and m.summary.get("fork_of_main_version") == fork_of
                and (fork_uuid is None
                     or m.summary.get("fork_uuid") == fork_uuid)):
            if delete:
                delete_branch(root, name)
            return current
    # commit_version validates removals only when REBASING; a publish whose
    # base is already latest would silently no-op a removal main already
    # rewrote — check liveness explicitly (raced commits re-validate inside
    # commit_version's rebase path)
    gone = removed - cur_ids
    if gone:
        raise mf.CommitConflict(
            f"branch {name}: fragments {sorted(gone)[:3]}... were rewritten "
            f"on main since the fork — re-fork and replay")
    new = mf.commit_version(
        root,
        base_version=current.version,
        operation="publish_branch",
        add=added,
        remove_ids=removed,
        schema=head.schema,
        config=head.config,
        summary={"branch": name,
                 "fork_of_main_version": fork.summary.get("fork_of_main_version"),
                 "fork_uuid": fork.summary.get("fork_uuid"),
                 "branch_head": head.version,
                 "added_fragments": len(added),
                 "removed_fragments": len(removed)},
    )
    if delete:
        delete_branch(root, name)
    return new
