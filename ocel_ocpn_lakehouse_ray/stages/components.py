"""Distributed connected components over an int64 edge list — the scale path
for phash near-dup clustering (VERDICT r2 #4): when the distinct-phash edge
set exceeds the driver union-find budget, components are computed in-cluster
by hash-partitioned min-label propagation.

Algorithm (the classic iterative label propagation used by Pregel-style CC,
e.g. Kiveris et al. "Connected Components in MapReduce and Beyond"): every
node starts with label = min(self, neighbors); each round every node takes
the min of its label and its neighbors' labels (one hash-shuffle join +
one groupby-min); labels decrease monotonically, so a fixpoint is reached in
O(component diameter) rounds.  Hamming-ball graphs (phash within distance 3)
have tiny diameters, so this converges in a handful of rounds.

Convergence detection: labels only ever DECREASE, so the exact integer sum
of all labels strictly decreases until the fixpoint.  The sum is accumulated
per block in exact Python ints (object-dtype numpy sum) — no overflow, no
float loss, O(num_nodes) per round on the driver but O(1) driver MEMORY.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _label_checksum(labels) -> int:
    tot = 0
    for b in labels.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            tot += int(np.sum(b["label"].to_numpy().astype(object)))
    return tot


def distributed_components(edges, *, num_partitions: int | None = None,
                           max_iters: int = 50):
    """edges: Dataset with int64 columns (pa, pb), undirected.  Returns a
    Dataset (node, label) where label is the component's minimum node id —
    only nodes that appear in an edge are present (isolated nodes are their
    own trivial components and need no row)."""
    import ray
    from ray.data.aggregate import Min

    nparts = num_partitions or max(
        2, min(16, int(ray.cluster_resources().get("CPU", 8)) // 2)
    )

    def sym(b: pa.Table) -> pa.Table:
        a = b["pa"].to_numpy(zero_copy_only=False)
        c = b["pb"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.concatenate([a, c]), pa.int64()),
            "dst": pa.array(np.concatenate([c, a]), pa.int64()),
        })

    e = edges.map_batches(sym, batch_format="pyarrow").materialize()

    def init(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b["src"],
            "label": pa.array(
                np.minimum(b["src"].to_numpy(), b["dst"].to_numpy()), pa.int64()),
        })

    labels = (e.map_batches(init, batch_format="pyarrow")
              .groupby("node").aggregate(Min("label", alias_name="label"))
              .materialize())
    prev = _label_checksum(labels)

    for _ in range(max_iters):
        cand = e.join(labels, join_type="inner", num_partitions=nparts,
                      on=("src",), right_on=("node",))

        def msg(b: pa.Table) -> pa.Table:
            return pa.table({"node": b["dst"], "label": b["label"]})

        labels = (cand.map_batches(msg, batch_format="pyarrow")
                  .union(labels)
                  .groupby("node").aggregate(Min("label", alias_name="label"))
                  .materialize())
        cur = _label_checksum(labels)
        if cur == prev:  # monotone labels: equal sum == fixpoint
            return labels
        prev = cur
    raise RuntimeError(
        f"connected components did not converge in {max_iters} rounds")
