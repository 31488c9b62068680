"""DFG → Petri-net synthesis (reference W4,
`ingest/simple_ocpn_generator.py:215-265`): build object-centric-Petri-net
graph rows (transitions, places, arcs) from the direct-follows edge aggregate.

Dataflow: the heavy part is the DFG itself (one groupby shuffle + per-group
lag pairing, pipelines/queries.q_direct_follows); the graph synthesis over the
aggregated edge list is a small vectorized transform.  The arc construction
rule mirrors the reference: every edge (a→b) becomes a place ``p_a__b`` with
arcs  t_a → p_a__b → t_b.
"""

from __future__ import annotations

import pyarrow as pa

from .queries import q_direct_follows


def q_petri_arcs(sf_dir: str):
    """Arc table of the synthesized Petri net: (source, target, kind) where
    kind says transition→place or place→transition."""
    return _edges_to_arcs(q_direct_follows(sf_dir))


def q_petri_arcs_filtered(sf_dir: str, *, min_frequency: int = 5):
    """Frequency-filtered discovery variant: noise edges below
    ``min_frequency`` are dropped before net synthesis (the reference's
    discovery thresholds, `agent/config.yaml` discovery section)."""
    edges = q_direct_follows(sf_dir)

    def keep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.greater_equal(b["n"], pa.scalar(min_frequency)))

    filtered = edges.map_batches(keep, batch_format="pyarrow")
    # reuse the arc construction by faking the edges dataset shape
    return _edges_to_arcs(filtered)


def _edges_to_arcs(edges):
    def to_arcs(b: pa.Table) -> pa.Table:
        src = b["src"].to_pylist()
        dst = b["dst"].to_pylist()
        n = b["n"].to_pylist()
        rows = {"source": [], "target": [], "kind": [], "frequency": []}
        for s, d, f in zip(src, dst, n):
            place = f"p_{s}__{d}"
            rows["source"].append(f"t_{s}")
            rows["target"].append(place)
            rows["kind"].append("t2p")
            rows["frequency"].append(f)
            rows["source"].append(place)
            rows["target"].append(f"t_{d}")
            rows["kind"].append("p2t")
            rows["frequency"].append(f)
        return pa.table({
            "source": pa.array(rows["source"], pa.string()),
            "target": pa.array(rows["target"], pa.string()),
            "kind": pa.array(rows["kind"], pa.string()),
            "frequency": pa.array(rows["frequency"], pa.int64()),
        })

    return edges.map_batches(to_arcs, batch_format="pyarrow")


# Pluggable discovery algorithms (reference extension surface §2.10,
# `ingest/simple_ocpn_generator.py:47-52`: name → callable dict; first-class
# here so users register their own miners).
DISCOVERY_ALGORITHMS = {
    "dfg": q_petri_arcs,
    "dfg_filtered": q_petri_arcs_filtered,
}


def discover_petri_net(sf_dir: str, algorithm: str = "dfg", **kw):
    """Run a registered discovery algorithm by name."""
    try:
        fn = DISCOVERY_ALGORITHMS[algorithm]
    except KeyError:
        raise ValueError(
            f"unknown discovery algorithm {algorithm!r}; "
            f"registered: {sorted(DISCOVERY_ALGORITHMS)}"
        ) from None
    return fn(sf_dir, **kw)


def q_pnml_arcs(sf_dir: str):
    """PNML XML round trip (reference S8, `ingest/discover_and_store_ocpn.py:
    36-60`): synthesize spec-shaped PNML blobs (one per DFG-scale net, sized
    by sf), parse them DISTRIBUTED with the stdlib-ElementTree stage, and
    explode to arc rows.  Rows-only check (XML parsing is not
    SQL-expressible); the parse round trip is pinned exactly in
    tests/test_pnml.py."""
    import os

    import ray.data

    from ..functions.pnml import pnml_arc_rows, synth_pnml

    # net count scales with the sf tier (deterministic; no external data)
    n_nets = max(4, {"sf0.001": 4, "sf0.01": 16, "sf0.1": 64}.get(
        os.path.basename(sf_dir.rstrip("/")), 8))

    def make(batch):
        ids = [f"net_{int(i):04d}" for i in batch["id"]]
        blobs = [synth_pnml(nid, n_places=6, n_transitions=5, seed=7)
                 for nid in ids]
        return pa.table({"net_id": pa.array(ids, pa.string()),
                         "pnml": pa.array(blobs, pa.binary())})

    nets = ray.data.range(n_nets, override_num_blocks=min(n_nets, 8)).map_batches(
        make, batch_format="numpy")
    return nets.map_batches(pnml_arc_rows, batch_format="pyarrow")


SQL_PETRI_ARCS = """
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
), dfg AS (
  SELECT prev_type AS src, event_type AS dst, count(*) AS n
  FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2
)
SELECT 't_' || src AS source, 'p_' || src || '__' || dst AS target,
       't2p' AS kind, n AS frequency FROM dfg
UNION ALL
SELECT 'p_' || src || '__' || dst AS source, 't_' || dst AS target,
       'p2t' AS kind, n AS frequency FROM dfg
"""
