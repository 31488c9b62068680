"""OCEL 2.0 JSON ingestion (the reference's §3.1 bootstrap+load lifecycle,
`ingest/complete_ocel_loader.py:100-477`): parse semantics (timestamps,
hot-key denormalization, EAV typed values, 1→N explodes), lakehouse load,
and the JSONL streaming path."""

from __future__ import annotations

import json

import numpy as np
import pytest

from ocel_ocpn_lakehouse_ray.sources.ocel import (
    events_jsonl_dataset,
    load_ocel_to_lakehouse,
    ocel_tables_from_dict,
    parse_ocel_timestamp,
    synth_ocel,
    typed_value,
)


def test_timestamp_normalization():
    # tz-aware → UTC, stripped
    t = parse_ocel_timestamp("2024-03-01T12:00:00+02:00")
    assert t.isoformat() == "2024-03-01T10:00:00"
    assert parse_ocel_timestamp("2024-03-01T12:00:00Z").isoformat() == "2024-03-01T12:00:00"
    assert parse_ocel_timestamp("not a time") is None
    assert parse_ocel_timestamp(None) is None


def test_typed_value_dispatch():
    assert typed_value(True)["val_type"] == "bool"
    assert typed_value(7)["val_type"] == "long" and typed_value(7)["val_long"] == 7
    assert typed_value(1.5)["val_type"] == "double"
    assert typed_value("hello")["val_type"] == "string"
    ts = typed_value("2024-01-02T03:04:05Z")
    assert ts["val_type"] == "timestamp" and ts["val_ts"].isoformat() == "2024-01-02T03:04:05"
    js = typed_value({"a": 1})
    assert js["val_type"] == "json" and json.loads(js["val_json"]) == {"a": 1}
    assert typed_value(None)["val_type"] == "null"


def test_ocel_tables_shapes_and_hot_keys():
    doc = synth_ocel(n_events=40, n_objects=8, seed=1)
    tabs = ocel_tables_from_dict(doc)
    assert tabs["events"].num_rows == 40
    assert tabs["objects"].num_rows == 8
    assert tabs["event_objects"].num_rows == 40          # 1 relationship each
    assert tabs["event_attributes"].num_rows == 40 * 4   # 4 attrs each
    assert tabs["object_attributes"].num_rows == 8
    ev = tabs["events"].to_pydict()
    assert all(v and v.startswith("V") for v in ev["vendor_code"])  # denormalized
    assert ev["event_month"][0] == "2024-01"
    # EAV type mix is present
    vt = set(tabs["event_attributes"]["val_type"].to_pylist())
    assert {"string", "double", "bool", "json"} <= vt


def test_load_to_lakehouse_and_query(tmp_path):
    doc = synth_ocel(n_events=30, n_objects=6, seed=2)
    tables = load_ocel_to_lakehouse(doc, str(tmp_path / "wh"))
    assert set(tables) == {"events", "event_objects", "event_attributes",
                           "objects", "object_attributes"}
    assert tables["events"].manifest.total_rows == 30
    # loaded tables scan as Datasets (grouped count like the reference's
    # first validation query)
    counts = (tables["events"].to_dataset(columns=["type"])
              .groupby("type").count().to_pandas())
    assert counts["count()"].sum() == 30
    # second load appends (UNION-ALL-at-table-level, reference D4)
    tables2 = load_ocel_to_lakehouse(doc, str(tmp_path / "wh"))
    assert tables2["events"].manifest.total_rows == 60


def test_events_jsonl_streaming_path(tmp_path):
    doc = synth_ocel(n_events=25, n_objects=5, seed=3)
    p = str(tmp_path / "events.jsonl")
    with open(p, "w") as f:
        for e in doc["events"]:
            f.write(json.dumps(e) + "\n")
    ev_ds, rel_ds, attr_ds = events_jsonl_dataset(p)
    ev = ev_ds.to_pandas()
    assert len(ev) == 25 and ev["time"].notna().all()
    assert len(rel_ds.to_pandas()) == 25
    assert len(attr_ds.to_pandas()) == 25 * 4
