#!/usr/bin/env python
"""Benchmark harness.

Headline metric (BASELINE.json): maintenance throughput — rows/s through the
full maintenance lifecycle (compaction + Z-order clustering + MERGE INTO) on
the deterministic synthetic image table sized by $GRAFT_SF_DIR — plus
wall-clock for a representative set of the operator queries at that sf.

Prints ONE JSON line:
  {"metric": ..., "value": <headline seconds>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, ...extras}

Scaling mode (`bench.py --scaling`): runs the SAME maintenance job twice in
fresh processes at num_cpus=8 and num_cpus=32 on identical input and reports
both throughputs + scaling efficiency = T8_wall / (4 * T32_wall_equiv), i.e.
throughput32 / (4 * throughput8) — the sandbox stand-in for the N vs 4N-node
cluster criterion (see BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

DEFAULT_SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "pricing_summary",
    "revenue_by_nation",
    "orders_by_segment",
    "direct_follows",
    "sessionize",
    "dedup_exact",
    "quality_scores",
    "minhash_lsh_pairs",
    "knn_bruteforce",
    "embedding_dedup",
]


def _consume(result):
    """Force full execution of a query result."""
    import pandas as pd
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        n = 0
        for b in result.iter_batches(batch_format="pyarrow"):
            n += b.num_rows
        return n
    if isinstance(result, (pd.DataFrame, pa.Table)):
        return len(result)
    return 0


def run_bench(num_cpus: int, sf_dir: str, *, maintenance_only: bool = False) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from ocel_ocpn_lakehouse_ray.pipelines.maintenance_queries import (
        _scale_n,
        _seed_table_root,
        _working_copy,
    )
    from ocel_ocpn_lakehouse_ray.sources.generator import merge_source_dataset
    from ocel_ocpn_lakehouse_ray.stages.clustering import run_clustering
    from ocel_ocpn_lakehouse_ray.stages.compaction import run_compaction
    from ocel_ocpn_lakehouse_ray.stages.merge import run_merge
    from ocel_ocpn_lakehouse_ray.table import LakeTable

    n = _scale_n(sf_dir)
    _seed_table_root(n)  # build (or reuse) the seed table — excluded from timing
    root = _working_copy(n, f"bench{num_cpus}")

    t0 = time.time()
    t = LakeTable.load(root)
    t, rep_c = run_compaction(t, job_id="bench-compact")
    t, rep_z = run_clustering(t, order="zorder", job_id="bench-cluster")
    src = merge_source_dataset(n, num_blocks=max(4, n // 500))
    t, rep_m = run_merge(t, src, job_id="bench-merge")
    maint_secs = time.time() - t0
    maint_rows = rep_c.get("rows", 0) + rep_z.get("rows", 0) + rep_m.get("rows", 0)

    queries = {}
    if not maintenance_only:
        import __ray_entry__ as entrymod

        reg = entrymod.queries()
        for name in BENCH_QUERIES:
            q0 = time.time()
            _consume(reg[name](sf_dir))
            queries[name] = round(time.time() - q0, 3)

    shutil.rmtree(root, ignore_errors=True)
    out = {
        "metric": "maintenance_wall_seconds(compact+zorder+merge)",
        "value": round(maint_secs, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "maintenance_rows": int(maint_rows),
        "maintenance_rows_per_sec": round(maint_rows / maint_secs, 1),
        "table_rows": int(t.manifest.total_rows),
        "table_bytes": int(t.manifest.total_bytes),
    }
    ray.shutdown()
    return out


def run_scaling(sf_dir: str, low: int = 8, high: int = 32) -> dict:
    """Fresh process per parallelism level, identical input."""
    results = {}
    for cpus in (low, high):
        proc = subprocess.run(
            [sys.executable, __file__, "--single", "--cpus", str(cpus),
             "--sf-dir", sf_dir, "--maintenance-only"],
            capture_output=True, text=True, cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    tl, th = results[low], results[high]
    speedup = tl["value"] / th["value"]
    efficiency = speedup / (high / low)
    return {
        "metric": "scaling_efficiency",
        "value": round(efficiency, 3),
        "unit": "ratio",
        "low_cpus": low,
        "high_cpus": high,
        "low_seconds": tl["value"],
        "high_seconds": th["value"],
        "low_rows_per_sec": tl["maintenance_rows_per_sec"],
        "high_rows_per_sec": th["maintenance_rows_per_sec"],
        "speedup": round(speedup, 3),
        "sf": sf_dir,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--single", action="store_true")
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--maintenance-only", action="store_true")
    args = ap.parse_args()
    if args.scaling:
        print(json.dumps(run_scaling(args.sf_dir)))
    else:
        print(json.dumps(run_bench(args.cpus, args.sf_dir,
                                   maintenance_only=args.maintenance_only)))


if __name__ == "__main__":
    main()
