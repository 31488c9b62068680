"""Driver-gate rehearsal, strict: run registry queries at a given sf/CPU
count and compare to the DuckDB oracle BITWISE (exact values for ints and
strings, bit-identical float64 for floats) after sorting columns by name and
rows by all columns — the same normalization the driver's value-hash uses.

Usage:
    python tools/strict_sweep.py [--sf /root/testdata/sf0.01] [--cpus 32]
                                 [--queries name1,name2 | all]

Run from /root/repo (Ray workers need the package importable from cwd).
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], bytes):
            df[c] = df[c].map(lambda b: b.hex())
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    errs = []
    if list(got.columns) != list(exp.columns):
        return [f"columns {list(got.columns)} vs {list(exp.columns)}"]
    if len(got) != len(exp):
        return [f"rows {len(got)} vs {len(exp)}"]
    for c in got.columns:
        g, e = got[c], exp[c]
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(e.dtype, np.floating):
            ga = g.astype(np.float64).to_numpy()
            ea = e.astype(np.float64).to_numpy()
            same = (ga.view(np.uint64) == ea.view(np.uint64)) | (
                np.isnan(ga) & np.isnan(ea))
            if not same.all():
                i = int(np.nonzero(~same)[0][0])
                errs.append(f"{c}: float bits differ at row {i}: "
                            f"{ga[i]!r} vs {ea[i]!r}")
        elif g.tolist() != e.tolist():
            errs.append(f"{c}: value mismatch")
    return errs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--queries", default="all")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.getcwd())
    import __ray_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = sorted(oracles) if args.queries == "all" else args.queries.split(",")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{os.path.join(args.sf, t + '.parquet')}')")

    failed = []
    for name in names:
        try:
            got = normalize(to_pandas(queries[name](args.sf)))
            exp = normalize(con.sql(oracles[name]).df())
            errs = compare(name, got, exp)
        except Exception as exc:  # noqa: BLE001
            errs = [f"ERROR {type(exc).__name__}: {exc}"]
        status = "OK " if not errs else "FAIL"
        print(f"{status} {name} ({len(errs) and errs[0] or f'{len(got)} rows'})",
              flush=True)
        if errs:
            failed.append((name, errs))
    print(f"\n{len(names) - len(failed)}/{len(names)} strict-exact")
    for name, errs in failed:
        print(f"  {name}: {errs}")
    ray.shutdown()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
