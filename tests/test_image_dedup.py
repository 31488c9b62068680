"""phash-hamming near-dedup and the composed image→embedding→kNN pipeline."""

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


def test_phash_banding_finds_near_dups_exactly():
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
    pairs = {tuple(p) for p in got[["a", "b"]].itertuples(index=False)}
    assert ("a", "b") in pairs and ("a", "c") in pairs and ("b", "c") in pairs
    assert not any("d" in p for p in pairs)
    assert got.set_index(["a", "b"])["hamming"].loc[("a", "b")] == 1


def test_image_near_dup_finds_hot_key_clusters(tmp_path):
    root = str(tmp_path / "t")
    t = create_image_table(root, 300, num_fragments=6)
    pairs = image_near_dup_pairs(t).to_pandas()
    # the 3 injected hot phash values form exact-dup cliques (~10 % of rows)
    assert len(pairs) > 0
    assert (pairs["hamming"] == 0).sum() > 0
    # verify against a driver-side oracle: exact pairwise hamming<=3
    full = t.to_arrow(columns=["image_id", "phash"])
    ph = full["phash"].to_numpy().view(np.uint64)
    ids = full["image_id"].to_pylist()
    ai, bi = np.triu_indices(len(ids), k=1)
    d = _popcount64(ph[ai] ^ ph[bi])
    expected = {
        (min(ids[i], ids[j]), max(ids[i], ids[j]))
        for i, j, dist in zip(ai, bi, d) if dist <= 3
    }
    got = {tuple(p) for p in pairs[["a", "b"]].itertuples(index=False)}
    assert got == expected  # banding is exact for hamming <= bands-1


def test_image_knn_deterministic(tmp_path):
    root = str(tmp_path / "t")
    t = create_image_table(root, 80, num_fragments=4)
    r1 = image_knn(t, k=3, n_queries=4)
    r2 = image_knn(t, k=3, n_queries=4)
    assert len(r1) == 4 * 3
    assert set(r1.columns) == {"query_id", "neighbor_id", "sim"}
    assert r1.equals(r2)
    assert (r1["sim"] <= 1.0 + 1e-9).all()
