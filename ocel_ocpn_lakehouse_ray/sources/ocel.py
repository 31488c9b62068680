"""OCEL 2.0 JSON ingestion — the reference's primary entry point
(`ingest/complete_ocel_loader.py:100-477`, §3.1 lifecycle) re-expressed for
this engine: an OCEL document becomes five LakeTables
(events, event_objects, event_attributes, objects, object_attributes).

Semantics ported (not code):
- timestamps normalized to UTC then tz-stripped (µs), reference M1
  (`complete_ocel_loader.py:30-44`); unparseable → NULL (the reference falls
  back to now(), which is non-deterministic — we preserve the failure).
- hot attribute keys ``vendor_code`` / ``request_id`` are denormalized onto
  the event row, reference M5 (`:167-172`).
- arbitrary attribute values shred into one typed column per physical type +
  a ``val_type`` discriminator + ``val_json`` escape hatch, reference M2
  EAV (`:47-96`).
- event → relationship/attribute rows are a 1→N explode, reference M3.

Scale note: a single OCEL JSON document is one object — the reference
json.load's it whole and so does `load_ocel_json` (driver, small files).
For large logs use `events_jsonl_dataset`: events as JSON-LINES stream
through `ray.data.read_json` and explode per batch on the workers.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa

EVENTS_SCHEMA = pa.schema([
    ("id", pa.string()),
    ("type", pa.string()),
    ("time", pa.timestamp("us")),
    ("event_date", pa.string()),
    ("event_month", pa.string()),
    ("vendor_code", pa.string()),
    ("request_id", pa.string()),
])

EVENT_OBJECTS_SCHEMA = pa.schema([
    ("event_id", pa.string()),
    ("object_id", pa.string()),
    ("qualifier", pa.string()),
])

ATTRS_SCHEMA = pa.schema([
    ("owner_id", pa.string()),          # event_id or object_id
    ("name", pa.string()),
    ("val_type", pa.string()),          # bool|long|double|timestamp|json|string|null
    ("val_string", pa.string()),
    ("val_long", pa.int64()),
    ("val_double", pa.float64()),
    ("val_bool", pa.bool_()),
    ("val_ts", pa.timestamp("us")),
    ("val_json", pa.string()),
])

OBJECTS_SCHEMA = pa.schema([
    ("id", pa.string()),
    ("type", pa.string()),
])

HOT_KEYS = ("vendor_code", "request_id")  # reference M5 denormalized keys


def parse_ocel_timestamp(s):
    """ISO-8601 → UTC-normalized tz-naive µs timestamp; None if unparseable."""
    if not s:
        return None
    try:
        dt = datetime.fromisoformat(str(s).replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


_TS_PREFIX = tuple(f"{y}" for y in range(1970, 2100))


def typed_value(v) -> dict:
    """Reference M2 tag-dispatch extraction → one EAV row fragment."""
    out = {"val_type": "null", "val_string": None, "val_long": None,
           "val_double": None, "val_bool": None, "val_ts": None,
           "val_json": None}
    if v is None:
        return out
    if isinstance(v, bool):
        out.update(val_type="bool", val_bool=v)
    elif isinstance(v, int):
        out.update(val_type="long", val_long=v)
    elif isinstance(v, float):
        out.update(val_type="double", val_double=v)
    elif isinstance(v, str):
        # heuristic timestamp sniffing on strings (reference `:75-84`)
        ts = parse_ocel_timestamp(v) if v[:4].isdigit() and "-" in v[:8] else None
        if ts is not None:
            out.update(val_type="timestamp", val_ts=ts, val_string=v)
        else:
            out.update(val_type="string", val_string=v)
    else:  # dict / list → JSON escape hatch
        out.update(val_type="json", val_json=json.dumps(v, sort_keys=True))
    return out


def _attr_rows(owner_id: str, attrs: list, sink: dict) -> None:
    for a in attrs or []:
        row = typed_value(a.get("value"))
        sink["owner_id"].append(owner_id)
        sink["name"].append(a.get("name"))
        for k, v in row.items():
            sink[k].append(v)


def _new_attr_sink() -> dict:
    return {f.name: [] for f in ATTRS_SCHEMA}


def ocel_tables_from_dict(ocel: dict) -> dict[str, pa.Table]:
    """One parsed OCEL 2.0 document → the five Arrow tables."""
    ev = {f.name: [] for f in EVENTS_SCHEMA}
    rels = {f.name: [] for f in EVENT_OBJECTS_SCHEMA}
    ev_attrs = _new_attr_sink()
    objs = {f.name: [] for f in OBJECTS_SCHEMA}
    obj_attrs = _new_attr_sink()

    for e in ocel.get("events", []):
        ts = parse_ocel_timestamp(e.get("time"))
        iso = ts.isoformat() if ts else None
        hot = {k: None for k in HOT_KEYS}
        for a in e.get("attributes", []) or []:
            if a.get("name") in hot and hot[a["name"]] is None:
                hot[a["name"]] = None if a.get("value") is None else str(a["value"])
        ev["id"].append(e.get("id"))
        ev["type"].append(e.get("type"))
        ev["time"].append(ts)
        ev["event_date"].append(iso[:10] if iso else None)
        ev["event_month"].append(iso[:7] if iso else None)
        ev["vendor_code"].append(hot["vendor_code"])
        ev["request_id"].append(hot["request_id"])
        for r in e.get("relationships", []) or []:
            rels["event_id"].append(e.get("id"))
            rels["object_id"].append(r.get("objectId"))
            rels["qualifier"].append(r.get("qualifier") or "")
        _attr_rows(e.get("id"), e.get("attributes"), ev_attrs)

    for o in ocel.get("objects", []):
        objs["id"].append(o.get("id"))
        objs["type"].append(o.get("type"))
        _attr_rows(o.get("id"), o.get("attributes"), obj_attrs)

    return {
        "events": pa.table(ev, schema=EVENTS_SCHEMA),
        "event_objects": pa.table(rels, schema=EVENT_OBJECTS_SCHEMA),
        "event_attributes": pa.table(ev_attrs, schema=ATTRS_SCHEMA),
        "objects": pa.table(objs, schema=OBJECTS_SCHEMA),
        "object_attributes": pa.table(obj_attrs, schema=ATTRS_SCHEMA),
    }


def load_ocel_json(path: str) -> dict[str, pa.Table]:
    """Whole-document load (reference S1 shape; for small/medium files)."""
    with open(path, encoding="utf-8") as f:
        return ocel_tables_from_dict(json.load(f))


def load_ocel_to_lakehouse(source, warehouse_root: str) -> dict:
    """OCEL document (path or dict) → five LakeTables under
    ``warehouse_root/<name>`` (bootstrap-if-absent + append; the reference's
    §3.1 bootstrap+load lifecycle).  Returns name → LakeTable."""
    import os

    from ..config import TableConfig
    from ..table import LakeTable

    tables = (load_ocel_json(source) if isinstance(source, str)
              else ocel_tables_from_dict(source))
    out = {}
    for name, tbl in tables.items():
        root = os.path.join(warehouse_root, name)
        if not os.path.exists(os.path.join(root, "_latest")):
            LakeTable.create(root, tbl.schema,
                             TableConfig(target_fragment_bytes=128 << 20))
        t = LakeTable.load(root)
        out[name] = t.append_arrow(tbl) if tbl.num_rows else t
    return out


def events_jsonl_dataset(path: str):
    """SCALE path: events as JSON-LINES → `ray.data.read_text` (attribute
    values are heterogeneous JSON, which Arrow's schema-inferring JSON
    reader rejects) → per-batch json.loads + explode on the workers.
    Returns (events_ds, rels_ds, attrs_ds) — three streaming Datasets."""
    import ray.data

    def make_explode(table_name: str):
        def explode(batch: pa.Table) -> pa.Table:
            rows = [json.loads(t) for t in batch["text"].to_pylist() if t.strip()]
            return ocel_tables_from_dict({"events": rows})[table_name]
        return explode

    ds = ray.data.read_text(path)
    return (ds.map_batches(make_explode("events"), batch_format="pyarrow"),
            ds.map_batches(make_explode("event_objects"), batch_format="pyarrow"),
            ds.map_batches(make_explode("event_attributes"), batch_format="pyarrow"))


def synth_ocel(n_events: int = 50, n_objects: int = 10, seed: int = 42) -> dict:
    """Deterministic OCEL 2.0 document for tests (no external data)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    types = ["create_order", "approve", "ship", "invoice", "close"]
    objects = [{"id": f"o{i}", "type": "order" if i % 2 == 0 else "item",
                "attributes": [{"name": "priority", "value": int(rng.integers(1, 5))}]}
               for i in range(n_objects)]
    events = []
    for i in range(n_events):
        ts = f"2024-01-{1 + i % 28:02d}T{i % 24:02d}:00:00+00:00"
        attrs = [
            {"name": "vendor_code", "value": f"V{int(rng.integers(0, 5))}"},
            {"name": "amount", "value": round(float(rng.uniform(1, 500)), 2)},
            {"name": "rush", "value": bool(rng.integers(0, 2))},
            {"name": "meta", "value": {"src": "synth", "i": i}},
        ]
        rels = [{"objectId": f"o{int(rng.integers(0, n_objects))}",
                 "qualifier": "target"}]
        events.append({"id": f"e{i}", "type": types[i % len(types)],
                       "time": ts, "attributes": attrs, "relationships": rels})
    return {"events": events, "objects": objects}
