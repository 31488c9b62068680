"""Distributed constraint audits: NOT NULL / range / accepted-values /
uniqueness checks over a Dataset, used standalone (data-quality report) and
as the audit gate of write-audit-publish (pipelines/wap.py).

Reference parity: the reference validates loads with driver-side pandas
checks (`ingest/format_validator.py`, null/type spot checks); here the same
assertions run as one vectorized map_batches pass (pyarrow.compute kernels,
per-batch partial counts — only O(#constraints) numbers leave each batch)
plus one bounded groupby per uniqueness key.  Nothing materializes: at
100 TB the audit costs one streaming scan.

Constraint specs (dicts, JSON-serializable so they can live in job meta):
    {"type": "not_null",        "column": c}
    {"type": "range",           "column": c, "min": lo, "max": hi}   # nulls ignored
    {"type": "accepted_values", "column": c, "values": [...]}        # nulls ignored
    {"type": "unique",          "columns": [c, ...]}
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _label(spec: dict) -> str:
    t = spec["type"]
    if t == "unique":
        return f"unique({','.join(spec['columns'])})"
    return f"{t}({spec['column']})"


def _batch_violations(batch: pa.Table, spec: dict) -> int:
    t = spec["type"]
    col = batch[spec["column"]]
    if t == "not_null":
        return col.null_count
    if t == "range":
        valid = pc.is_valid(col)
        mask = None
        if spec.get("min") is not None:
            mask = pc.less(col, pa.scalar(spec["min"]))
        if spec.get("max") is not None:
            over = pc.greater(col, pa.scalar(spec["max"]))
            mask = over if mask is None else pc.or_(mask, over)
        if mask is None:
            return 0
        return pc.sum(pc.and_(valid, mask)).as_py() or 0
    if t == "accepted_values":
        ok = pc.is_in(col, value_set=pa.array(spec["values"], col.type))
        bad = pc.and_(pc.is_valid(col), pc.invert(ok))
        return pc.sum(bad).as_py() or 0
    raise ValueError(f"unknown constraint type {t!r}")


def check_constraints(ds, constraints: list[dict]) -> dict:
    """One streaming pass for the map-only constraints + one groupby per
    uniqueness key.  Returns {"passed", "rows_checked", "violations":
    {label: count}}."""
    mapspecs = [s for s in constraints if s["type"] != "unique"]
    uniqspecs = [s for s in constraints if s["type"] == "unique"]
    labels = [_label(s) for s in mapspecs]

    def partial(b: pa.Table) -> pa.Table:
        cols = {"__rows": pa.array([b.num_rows], pa.int64())}
        for lbl, spec in zip(labels, mapspecs):
            cols[lbl] = pa.array([_batch_violations(b, spec)], pa.int64())
        return pa.table(cols)

    violations: dict[str, int] = {}
    rows = 0
    if mapspecs:
        agg = ds.map_batches(partial, batch_format="pyarrow")
        totals = {lbl: 0 for lbl in labels}
        for b in agg.iter_batches(batch_format="pyarrow"):
            rows += pc.sum(b["__rows"]).as_py() or 0
            for lbl in labels:
                totals[lbl] += pc.sum(b[lbl]).as_py() or 0
        violations.update(totals)
    else:
        rows = ds.count()

    for spec in uniqspecs:
        keys = list(spec["columns"])
        counts = ds.groupby(keys).count()

        def extra(b: pa.Table) -> pa.Table:
            dup = pc.subtract(b["count()"], pa.scalar(1, pa.int64()))
            return pa.table({"extra": pa.array(
                [pc.sum(dup).as_py() or 0], pa.int64())})

        total = 0
        for b in counts.map_batches(extra, batch_format="pyarrow") \
                       .iter_batches(batch_format="pyarrow"):
            total += pc.sum(b["extra"]).as_py() or 0
        violations[_label(spec)] = total

    return {
        "passed": all(v == 0 for v in violations.values()),
        "rows_checked": int(rows),
        "violations": violations,
    }
