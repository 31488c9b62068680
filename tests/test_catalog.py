"""Multi-table catalog (reference warehouse surface,
`ingest/production_bootstrap.py:570-681`): namespaced create/load/list/drop
over one warehouse dir, independent per-table snapshot chains, and a
warehouse-wide GC sweep that respects every table's own reachability."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pytest

from ocel_ocpn_lakehouse_ray.catalog import Catalog
from ocel_ocpn_lakehouse_ray.sources.generator import gen_batch
from ocel_ocpn_lakehouse_ray.table import IMAGE_SCHEMA, LakeTable

EVENTS_SCHEMA = pa.schema([
    ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
    ("event_type", pa.string()),
])


def _wh(tmp_path):
    return Catalog.create(str(tmp_path / "warehouse"))


def test_create_load_list_namespaces(tmp_path):
    cat = _wh(tmp_path)
    cat.create_table("ocel.events", EVENTS_SCHEMA)
    cat.create_table("ocel.event_types", EVENTS_SCHEMA)
    cat.create_table("media.images", IMAGE_SCHEMA)
    assert cat.table_names() == ["media.images", "ocel.event_types",
                                 "ocel.events"]
    assert cat.namespaces() == ["media", "ocel"]
    # dotted name -> nested root path, one manifest chain per table
    t = cat.load_table("ocel.events")
    assert t.root.endswith(os.path.join("warehouse", "ocel", "events"))
    assert t.version == 0
    # a second process-style handle sees the same registry
    cat2 = Catalog.load(cat.warehouse)
    assert cat2.table_names() == cat.table_names()
    with pytest.raises(KeyError):
        cat2.load_table("ocel.nope")
    with pytest.raises(FileExistsError):
        cat2.create_table("ocel.events", EVENTS_SCHEMA)
    with pytest.raises(FileExistsError):
        Catalog.create(cat.warehouse)
    with pytest.raises(ValueError):
        cat.create_table("bad/../name", EVENTS_SCHEMA)


def test_failed_bootstrap_rolls_back_registry(tmp_path):
    cat = _wh(tmp_path)
    bad = pa.schema([("x", pa.decimal128(10, 2))])  # unsupported type string
    with pytest.raises(ValueError):
        cat.create_table("ns.bad", bad)
    assert cat.refresh().table_names() == []
    # name is reusable after the failure
    cat.create_table("ns.bad", EVENTS_SCHEMA)
    assert cat.table_names() == ["ns.bad"]


def test_independent_snapshots_and_warehouse_gc(tmp_path):
    """Two tables, independent version chains; one gc_all sweep expires each
    table by ITS chain and never touches the other table's files."""
    cat = _wh(tmp_path)
    a = cat.create_table("ns.a", IMAGE_SCHEMA)
    b = cat.create_table("ns.b", IMAGE_SCHEMA)
    for i in range(3):
        a = a.append_arrow(gen_batch(np.arange(10 * i, 10 * i + 10)))
    b = b.append_arrow(gen_batch(np.arange(100, 120)))
    assert (a.version, b.version) == (3, 1)

    a_files = set(os.listdir(os.path.join(a.root, "data")))
    b_files = set(os.listdir(os.path.join(b.root, "data")))
    assert a_files and b_files

    import time

    rep = cat.gc_all(keep_last=1, orphan_grace_seconds=0.0,
                     now=time.time() + 10)
    assert set(rep) == {"ns.a", "ns.b"}
    # ns.a expired v0-2; ns.b only ever had v0-1 so keeps its current
    assert rep["ns.a"]["expiry"]["expired"] == [0, 1, 2]
    assert rep["ns.b"]["expiry"]["expired"] == [0]
    # every LIVE file of both tables survives; current scans intact
    a2, b2 = cat.load_table("ns.a"), cat.load_table("ns.b")
    assert a2.to_arrow(columns=["image_id"]).num_rows == 30
    assert b2.to_arrow(columns=["image_id"]).num_rows == 20
    assert set(os.listdir(os.path.join(b2.root, "data"))) == b_files
    # a's chain GC'd nothing of b's: roots are disjoint by construction
    assert not (a_files & b_files)


def test_drop_table_and_purge(tmp_path):
    cat = _wh(tmp_path)
    t = cat.create_table("ns.keep", IMAGE_SCHEMA)
    t.append_arrow(gen_batch(np.arange(5)))
    root = t.root
    cat.drop_table("ns.keep")  # no purge: files stay
    assert cat.table_names() == [] and os.path.isdir(root)
    LakeTable.load(root)  # still loadable by root
    cat.create_table("ns.gone", IMAGE_SCHEMA)
    groot = cat.table_root("ns.gone")
    cat.drop_table("ns.gone", purge=True)
    assert not os.path.exists(groot)


def test_cli_tables_listing(tmp_path):
    cat = _wh(tmp_path)
    t = cat.create_table("ocel.events", IMAGE_SCHEMA)
    t.append_arrow(gen_batch(np.arange(7)))
    cat.create_table("ocel.objects", IMAGE_SCHEMA)
    proc = subprocess.run(
        [sys.executable, "-m", "ocel_ocpn_lakehouse_ray.cli", "tables",
         "--root", cat.warehouse, "--num-cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["namespaces"] == ["ocel"]
    by_name = {r["name"]: r for r in out["tables"]}
    assert by_name["ocel.events"]["rows"] == 7
    assert by_name["ocel.events"]["version"] == 1
    assert by_name["ocel.objects"]["rows"] == 0
