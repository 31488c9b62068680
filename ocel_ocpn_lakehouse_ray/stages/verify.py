"""Post-maintenance scan-equivalence: the reference's validation suite
(`queries/final_system_validation.py:29-354` — accessibility, null-quality,
join, aggregation checks) made *exact* per the north_star invariant:

  every surviving row, joined on image_id against the expected table, must
  have (a) exact caption equality, (b) decoded pixels allclose — bit-exact
  for ``png``, PSNR >= 40 dB for lossy ``fmt`` — and (c) no row gains/losses.

Runs distributed: both sides are tagged and hash-partitioned on image_id
(the same one-shuffle co-group as MERGE), and each partition compares its
pairs vectorized + per-row decode in the worker.  The result is a tiny
aggregate report; image bytes never reach the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.codec import decode_image, psnr
from .shuffle import PART_COL, assign_hash_part

SIDE_COL = "__side"
PSNR_THRESHOLD_DB = 40.0

REPORT_SCHEMA = pa.schema(
    [
        ("pairs", pa.int64()),
        ("missing", pa.int64()),        # expected but absent
        ("unexpected", pa.int64()),     # present but not expected
        ("caption_mismatch", pa.int64()),
        ("meta_mismatch", pa.int64()),  # w/h/fmt/phash differ
        ("pixel_fail", pa.int64()),
        ("min_psnr", pa.float64()),
    ]
)


def _compare_partition(group: pa.Table) -> pa.Table:
    side = group[SIDE_COL].to_numpy()
    actual = group.filter(pa.array(side == 0))
    expected = group.filter(pa.array(side == 1))
    a_ids = actual["image_id"].to_pylist()
    e_ids = expected["image_id"].to_pylist()
    a_idx = {k: i for i, k in enumerate(a_ids)}
    e_idx = {k: i for i, k in enumerate(e_ids)}
    missing = sum(1 for k in e_idx if k not in a_idx)
    unexpected = sum(1 for k in a_idx if k not in e_idx)
    cap_bad = meta_bad = pix_bad = 0
    min_psnr = float("inf")
    pairs = 0
    a_cols = {c: actual[c] for c in ("caption", "w", "h", "fmt", "phash", "bytes")}
    e_cols = {c: expected[c] for c in ("caption", "w", "h", "fmt", "phash", "bytes")}
    for k, ia in a_idx.items():
        ie = e_idx.get(k)
        if ie is None:
            continue
        pairs += 1
        if a_cols["caption"][ia].as_py() != e_cols["caption"][ie].as_py():
            cap_bad += 1
        if any(a_cols[c][ia].as_py() != e_cols[c][ie].as_py() for c in ("w", "h", "fmt", "phash")):
            meta_bad += 1
            continue
        ab = a_cols["bytes"][ia].as_py()
        eb = e_cols["bytes"][ie].as_py()
        fmt = a_cols["fmt"][ia].as_py()
        if ab == eb:
            continue  # byte-identical: trivially equivalent
        try:
            da, de = decode_image(ab, fmt), decode_image(eb, fmt)
        except Exception:
            pix_bad += 1
            continue
        if da.shape != de.shape:
            pix_bad += 1
            continue
        p = psnr(da, de)
        min_psnr = min(min_psnr, p)
        ok = (da == de).all() if fmt == "png" else p >= PSNR_THRESHOLD_DB
        if not ok:
            pix_bad += 1
    return pa.table(
        {
            "pairs": [pairs],
            "missing": [missing],
            "unexpected": [unexpected],
            "caption_mismatch": [cap_bad],
            "meta_mismatch": [meta_bad],
            "pixel_fail": [pix_bad],
            "min_psnr": [min_psnr if min_psnr != float("inf") else float("nan")],
        },
        schema=REPORT_SCHEMA,
    )


def scan_equivalence(actual_ds, expected_ds, *, num_parts: int = 16) -> dict:
    """Distributed row-by-row equivalence of two image datasets; returns the
    aggregated report dict with ``passed`` verdict."""

    def tag(side):
        def fn(batch: pa.Table) -> pa.Table:
            b = batch.append_column(
                SIDE_COL, pa.array(np.full(batch.num_rows, side, np.int8))
            )
            return assign_hash_part(b, "image_id", num_parts)
        return fn

    both = actual_ds.map_batches(tag(0), batch_format="pyarrow").union(
        expected_ds.map_batches(tag(1), batch_format="pyarrow")
    )
    rep_ds = both.groupby(PART_COL).map_groups(_compare_partition, batch_format="pyarrow")
    totals = {f: 0 for f in REPORT_SCHEMA.names}
    totals["min_psnr"] = float("inf")
    for b in rep_ds.iter_batches(batch_format="pyarrow"):
        for row in b.to_pylist():
            for f in ("pairs", "missing", "unexpected", "caption_mismatch",
                      "meta_mismatch", "pixel_fail"):
                totals[f] += row[f]
            if row["min_psnr"] == row["min_psnr"]:  # not NaN
                totals["min_psnr"] = min(totals["min_psnr"], row["min_psnr"])
    totals["passed"] = (
        totals["missing"] == 0
        and totals["unexpected"] == 0
        and totals["caption_mismatch"] == 0
        and totals["meta_mismatch"] == 0
        and totals["pixel_fail"] == 0
    )
    if totals["min_psnr"] == float("inf"):
        totals["min_psnr"] = None
    return totals
