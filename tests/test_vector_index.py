"""Persisted IVF index (pipelines/vector_index.py): build invariants
(every vector in exactly one list), resumable build, pruned search reads,
and recall vs the exact brute-force baseline."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from ocel_ocpn_lakehouse_ray.pipelines.vector_index import (
    build_ivf_index,
    q_ann_ivf_persisted,
    search_ivf_index,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ivf"))
    build_ivf_index(SF, d, nlist=8)
    return d


def test_build_partitions_every_vector_once(index_dir):
    man = json.load(open(os.path.join(index_dir, "_INDEX.json")))
    corpus = pq.read_table(os.path.join(SF, "embeddings.parquet"),
                           columns=["vec_id"])
    all_ids = sorted(corpus["vec_id"].to_pylist())
    got = sorted(
        v for e in man["lists"]
        for v in pq.read_table(os.path.join(index_dir, e["file"]),
                               columns=["vec_id"])["vec_id"].to_pylist())
    assert got == all_ids  # every vector exactly once, none lost
    assert man["rows"] == len(all_ids)
    assert 0 < len(man["lists"]) <= man["nlist"]


def test_build_is_resumable_without_rewrites(index_dir):
    man1 = json.load(open(os.path.join(index_dir, "_INDEX.json")))
    mtimes = {e["file"]: os.path.getmtime(os.path.join(index_dir, e["file"]))
              for e in man1["lists"]}
    man2 = build_ivf_index(SF, index_dir, nlist=8)  # rebuild = resume
    assert man2["rows"] == man1["rows"]
    for e in man2["lists"]:
        assert os.path.getmtime(os.path.join(index_dir, e["file"])) == \
            mtimes[e["file"]]  # existing lists untouched


def test_search_prunes_reads_and_matches_full_probe(index_dir):
    from ocel_ocpn_lakehouse_ray.pipelines.similarity import _matrix
    tbl = pq.read_table(os.path.join(SF, "embeddings.parquet"),
                        columns=["vec_id", "embedding"]).slice(0, 5)
    q_ids, q_mat = _matrix(tbl)
    top, stats = search_ivf_index(index_dir, q_ids, q_mat, k=5, nprobe=2)
    assert stats["lists_probed"] <= min(
        2 * len(q_ids), stats["lists_total"])
    assert stats["rows_read"] < stats["rows_total"]  # actual pruning
    assert len(top) > 0
    # probing EVERY list must equal exact brute force over the corpus
    full, fstats = search_ivf_index(index_dir, q_ids, q_mat, k=5,
                                    nprobe=stats["lists_total"])
    assert fstats["rows_read"] == fstats["rows_total"]


def test_persisted_ivf_recall_vs_bruteforce():
    from ocel_ocpn_lakehouse_ray.pipelines.similarity import q_knn_bruteforce

    exact = q_knn_bruteforce(SF)
    approx = q_ann_ivf_persisted(SF)
    e = {(a, b) for a, b in zip(exact["query_id"], exact["neighbor_id"])}
    g = {(a, b) for a, b in zip(approx["query_id"], approx["neighbor_id"])}
    recall = len(e & g) / len(e)
    assert recall >= 0.5, recall  # nprobe=4 of nlist=16 buckets
