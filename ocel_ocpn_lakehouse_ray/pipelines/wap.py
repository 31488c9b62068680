"""Write-audit-publish (WAP): stage a write on an isolated branch, audit it
with distributed constraint checks, and only fast-publish to main if the
audit passes — the Iceberg WAP pattern the reference's Iceberg tables
support but its pipelines never exercise (its loads validate driver-side
then write straight to main, `ingest/format_validator.py`).

Flow:
    1. fork branch `wap-<id>` at current main (state/branches.py)
    2. run the caller's write_fn against the branch handle (appends / DML —
       all committed to the branch chain; main is untouched)
    3. audit the BRANCH snapshot with stages/constraints.check_constraints
       (one streaming scan + one groupby per uniqueness key)
    4. passed  -> publish_branch (one main commit), drop the branch
       failed  -> main never sees the rows; the branch is kept for
                  debugging (keep_failed) or dropped, and GC reclaims its
                  fragments

Everything scales: the only driver state is the constraint report.
"""

from __future__ import annotations

import uuid

from ..stages.constraints import check_constraints
from ..table import LakeTable


def write_audit_publish(
    root: str,
    write_fn,
    constraints: list[dict],
    *,
    branch: str | None = None,
    keep_failed: bool = True,
    audit_columns: list[str] | None = None,
) -> dict:
    """Run one WAP cycle.  ``write_fn(branch_table) -> LakeTable`` must
    return the committed branch handle (e.g. ``lambda b:
    b.append_arrow(tbl)``).  ``audit_columns`` prunes the audit scan to the
    constrained columns (pass None to derive it from the constraints)."""
    name = branch or f"wap-{uuid.uuid4().hex[:8]}"
    main = LakeTable.load(root)
    b = main.create_branch(name)
    b = write_fn(b)
    if b.branch != name:
        raise ValueError("write_fn must commit to the branch handle it was given")

    if audit_columns is None:
        cols: set[str] = set()
        for s in constraints:
            cols.update(s.get("columns", [s.get("column")]) or [])
        audit_columns = sorted(c for c in cols if c)
    report = check_constraints(
        b.to_dataset(columns=audit_columns or None), constraints)

    out = {"branch": name, "audit": report, "published": False,
           "main_version_before": main.version}
    if report["passed"]:
        published = main.publish_branch(name)
        out["published"] = True
        out["main_version_after"] = published.version
    elif not keep_failed:
        from ..state import branches as br

        br.delete_branch(root, name)
        out["branch"] = None
    return out
