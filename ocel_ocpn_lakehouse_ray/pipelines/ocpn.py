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
    import pyarrow.compute as pc

    edges = _edges_table(q_direct_follows(sf_dir))
    return _edges_to_arcs(
        edges.filter(pc.greater_equal(edges["n"], pa.scalar(min_frequency))))


def _edges_table(edges) -> pa.Table:
    """Normalize the DFG edge aggregate (pa.Table from the driver fold, or
    a Dataset from the distributed fallback) to one Arrow table — bounded
    by |event_types|² rows at any corpus scale."""
    if isinstance(edges, pa.Table):
        return edges
    parts = [b for b in edges.iter_batches(batch_format="pyarrow")]
    return pa.concat_tables(parts) if parts else pa.schema(
        [("src", pa.string()), ("dst", pa.string()),
         ("n", pa.int64())]).empty_table()


def _edges_to_arcs(edges) -> pa.Table:
    """Vectorized arc synthesis over the (tiny) edge table: every edge
    (a→b) becomes a place ``p_a__b`` with arcs t_a → p_a__b → t_b."""
    import pyarrow.compute as pc

    b = _edges_table(edges)
    place = pc.binary_join_element_wise(
        pa.scalar("p_"), b["src"], pa.scalar("__"), b["dst"], pa.scalar(""))
    t_src = pc.binary_join_element_wise(pa.scalar("t_"), b["src"], pa.scalar(""))
    t_dst = pc.binary_join_element_wise(pa.scalar("t_"), b["dst"], pa.scalar(""))
    n = b["n"].combine_chunks() if b.num_rows else b["n"]
    t2p = pa.table({
        "source": t_src, "target": place,
        "kind": pa.array(["t2p"] * b.num_rows, pa.string()),
        "frequency": n,
    })
    p2t = pa.table({
        "source": place, "target": t_dst,
        "kind": pa.array(["p2t"] * b.num_rows, pa.string()),
        "frequency": n,
    })
    # interleave (t2p, p2t) per edge to preserve the original row order
    both = pa.concat_tables([t2p, p2t]).combine_chunks()
    idx = [i + j * b.num_rows for i in range(b.num_rows) for j in (0, 1)]
    return both.take(pa.array(idx, pa.int64()))


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
