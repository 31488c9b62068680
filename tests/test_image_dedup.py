"""phash-hamming near-dedup and the composed image→embedding→kNN pipeline.

Near-dup output is CLUSTER rows (representative, member, hamming): identical
phashes collapse before the pairwise check and union-find closes the
distinct-phash edge set transitively, so the driver-side oracle here is
connected components of the exact pairwise hamming<=threshold graph.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from ocel_ocpn_lakehouse_ray.pipelines.image_dedup import (
    _popcount64,
    image_knn,
    image_near_dup_pairs,
    phash_near_dup_pairs,
)
from ocel_ocpn_lakehouse_ray.sources.generator import HOT_PHASHES, create_image_table


def test_popcount():
    x = np.array([0, 1, 3, 0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    assert _popcount64(x).tolist() == [0, 1, 2, 64]


def _oracle_clusters(ids, ph, threshold=3):
    """Connected components of the exact pairwise hamming graph →
    {(representative, member)} rows, rep = min image_id per component."""
    n = len(ids)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ai, bi = np.triu_indices(n, k=1)
    d = _popcount64(ph[ai] ^ ph[bi])
    for i, j in zip(ai[d <= threshold], bi[d <= threshold]):
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)
    comps: dict = {}
    for i in range(n):
        comps.setdefault(find(i), []).append(ids[i])
    rows = set()
    for members in comps.values():
        if len(members) < 2:
            continue
        rep = min(members)
        rows.update((rep, m) for m in members if m != rep)
    return rows


def test_phash_banding_finds_near_dup_clusters():
    base = 0x0123456789ABCDEF
    rows = {
        "image_id": ["a", "b", "c", "d"],
        # b = base with 1 bit flipped (hamming 1); c = hamming 2; d = far
        "phash": pa.array(
            np.array([base, base ^ 1, base ^ 0b1100, 0x7777000011112222],
                     dtype=np.uint64).view(np.int64)
        ),
    }
    ds = ray.data.from_arrow(pa.table(rows))
    got = phash_near_dup_pairs(ds, threshold=3).to_pandas()
    clusters = {tuple(p) for p in got[["representative", "member"]].itertuples(index=False)}
    assert clusters == {("a", "b"), ("a", "c")}
    h = got.set_index("member")["hamming"]
    assert h.loc["b"] == 1 and h.loc["c"] == 2


def test_image_near_dup_finds_hot_key_clusters(tmp_path):
    root = str(tmp_path / "t")
    t = create_image_table(root, 300, num_fragments=6)
    out = image_near_dup_pairs(t).to_pandas()
    # the 3 injected hot phash values form exact-dup cliques (~10 % of rows)
    assert len(out) > 0
    assert (out["hamming"] == 0).sum() > 0
    # output is linear in cluster size, not quadratic pair blowup
    full = t.to_arrow(columns=["image_id", "phash"])
    ph = full["phash"].to_numpy().view(np.uint64)
    ids = full["image_id"].to_pylist()
    expected = _oracle_clusters(ids, ph, threshold=3)
    got = {tuple(p) for p in out[["representative", "member"]].itertuples(index=False)}
    assert got == expected  # banding exact for hamming <= bands-1, closed transitively
    assert len(out) == len(set(out["member"]))  # each member exactly once
    assert len(out) < len(ids)  # linear bound: fewer rows than the table


def test_image_knn_deterministic(tmp_path):
    root = str(tmp_path / "t")
    t = create_image_table(root, 80, num_fragments=4)
    r1 = image_knn(t, k=3, n_queries=4)
    r2 = image_knn(t, k=3, n_queries=4)
    assert len(r1) == 4 * 3
    assert set(r1.columns) == {"query_id", "neighbor_id", "sim"}
    assert r1.equals(r2)
    assert (r1["sim"] <= 1.0 + 1e-9).all()


def test_phash_clustering_distributed_path_matches_oracle(tmp_path):
    """VERDICT r2 #4: force the distributed label-propagation path
    (max_driver_edges=0) and require the exact same clusters as the driver
    union-find / connected-components oracle."""
    root = str(tmp_path / "t")
    t = create_image_table(root, 300, num_fragments=6)
    ds = t.to_dataset(columns=["image_id", "phash"])
    out = phash_near_dup_pairs(ds, max_driver_edges=0).to_pandas()

    full = t.to_arrow(columns=["image_id", "phash"])
    ph = full["phash"].to_numpy().view(np.uint64)
    ids = full["image_id"].to_pylist()
    expected = _oracle_clusters(ids, ph, threshold=3)
    got = {tuple(p) for p in out[["representative", "member"]].itertuples(index=False)}
    assert got == expected
    assert len(out) == len(set(out["member"]))


def test_distributed_components_chain_and_cliques():
    """Label propagation must close a long chain (worst-case diameter) and
    keep disjoint cliques separate."""
    from ocel_ocpn_lakehouse_ray.stages.components import distributed_components

    # chain 0-1-2-...-9 plus clique {100,101,102}, singleton edge (200,201)
    pa_ = list(range(9)) + [100, 100, 101, 200]
    pb_ = list(range(1, 10)) + [101, 102, 102, 201]
    edges = ray.data.from_arrow(pa.table({
        "pa": pa.array(pa_, pa.int64()), "pb": pa.array(pb_, pa.int64())}))
    labels = {r["node"]: r["label"]
              for r in distributed_components(edges).take_all()}
    assert all(labels[i] == 0 for i in range(10))
    assert all(labels[i] == 100 for i in (100, 101, 102))
    assert labels[200] == labels[201] == 200
