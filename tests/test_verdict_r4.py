"""Round-4 VERDICT items: interval-index cow-merge routing (sub-linear in
touched-fragment count), plus follow-on round-4 operator upgrades."""

from __future__ import annotations

import numpy as np
import pytest

from ocel_ocpn_lakehouse_ray.stages.merge_cow import (
    build_interval_index,
    candidate_rows,
)


def _frag(fid, mn, mx):
    # (fragment_id, path, min, max, bloom_bits, k) — bloom-less entry
    return (fid, f"data/{fid}.parquet", mn, mx, None, 4)


def test_interval_index_equivalent_to_linear_scan_random_overlap():
    rng = np.random.default_rng(7)
    frags = []
    for i in range(200):
        lo = int(rng.integers(0, 10_000))
        hi = lo + int(rng.integers(0, 400))
        frags.append(_frag(f"f{i:04d}", f"k{lo:06d}", f"k{hi:06d}"))
    frags.append(_frag("fnone", None, None))  # stat-less → matches all
    idx = build_interval_index(frags)
    assert idx is not None
    keys = np.array(
        [f"k{int(v):06d}" for v in rng.integers(0, 11_000, size=500)],
        dtype=object)
    got = candidate_rows(idx, frags, keys)
    want = candidate_rows(None, frags, keys)
    assert set(got) == set(want)
    for f in got:
        assert np.array_equal(np.sort(got[f]), np.sort(want[f])), f


def test_interval_index_routing_is_sublinear_in_fragment_count():
    """1200 disjoint touched fragments, a batch touching 3 of them: the
    candidate map must contain exactly those 3 — per-batch routing work is
    proportional to the keys' overlap, not the fragment count."""
    F = 1200
    frags = [_frag(f"f{i:05d}", f"k{i * 100:08d}", f"k{i * 100 + 99:08d}")
             for i in range(F)]
    idx = build_interval_index(frags)
    assert idx is not None
    keys = np.array(["k" + s for s in
                     ("00000350", "00065010", "00119999", "99999999")],
                    dtype=object)  # frags 3, 650, 1199; last key beyond all
    got = candidate_rows(idx, frags, keys)
    assert set(got) == {3, 650, 1199}
    assert [got[3].tolist(), got[650].tolist(), got[1199].tolist()] == \
        [[0], [1], [2]]


@pytest.mark.parametrize("mode", ["shuffle", "cow"])
def test_merge_when_matched_then_delete(tmp_path, mode, monkeypatch):
    """MERGE with delete markers (WHEN MATCHED THEN DELETE): matched target
    rows vanish, markers never insert, unmatched markers are no-ops —
    identical under both physical plans, pinned by a DuckDB oracle."""
    import duckdb
    import pyarrow as pa
    import ray

    from ocel_ocpn_lakehouse_ray.sources.generator import (
        create_image_table,
        gen_batch,
        gen_update_batch,
    )
    from ocel_ocpn_lakehouse_ray.stages.merge import run_merge
    from ocel_ocpn_lakehouse_ray.stages.verify import scan_equivalence

    monkeypatch.setenv("GRAFT_MERGE", mode)
    n, seed = 300, 21
    t = create_image_table(str(tmp_path / mode), n, num_fragments=8, seed=seed)
    upd_ids = np.arange(0, 60, 4)            # 15 updates
    del_ids = np.arange(1, 41, 4)            # 10 matched deletes (disjoint)
    ghost_ids = np.arange(3) + 7 * 10**11    # unmatched delete markers: no-ops
    new_ids = np.arange(12) + 9 * 10**11     # 12 inserts

    def flag(tbl, v):
        return tbl.append_column("__del", pa.array([v] * tbl.num_rows))

    src_tbl = pa.concat_tables([
        flag(gen_update_batch(upd_ids, seed), False),
        flag(gen_batch(new_ids, seed + 7), False),
        flag(gen_batch(del_ids, seed), True),
        flag(gen_batch(ghost_ids, seed + 9), True),
    ])
    t2, rep = run_merge(t, ray.data.from_arrow(src_tbl),
                        job_id=f"mdel-{mode}", delete_col="__del")
    assert rep["deletes"] == len(del_ids)
    assert rep["inserts"] == len(new_ids)
    assert rep["updates"] == len(upd_ids)

    # duckdb oracle over the deterministic generator inputs
    con = duckdb.connect()
    con.register("tgt", gen_batch(np.arange(n), seed)
                 .select(["image_id", "caption"]))
    con.register("src", src_tbl.select(["image_id", "caption", "__del"]))
    oracle = con.sql("""
        SELECT image_id, caption FROM tgt
        WHERE image_id NOT IN (SELECT image_id FROM src)
        UNION ALL
        SELECT image_id, caption FROM src WHERE NOT __del
        ORDER BY image_id
    """).arrow()
    got = (t2.to_dataset(columns=["image_id", "caption"]).to_pandas()
           .sort_values("image_id").reset_index(drop=True))
    assert got["image_id"].tolist() == oracle["image_id"].to_pylist()
    assert got["caption"].tolist() == oracle["caption"].to_pylist()

    # full-bytes scan equivalence against the expected surviving rows
    ids = np.arange(n)
    survive = ids[~np.isin(ids, np.concatenate([upd_ids, del_ids]))]
    expect = pa.concat_tables([
        gen_batch(survive, seed),
        gen_update_batch(upd_ids, seed),
        gen_batch(new_ids, seed + 7),
    ])
    se = scan_equivalence(t2.to_dataset(), ray.data.from_arrow(expect),
                          num_parts=4)
    assert se["passed"], se


def test_levenshtein_banded_matches_exact_and_prunes():
    import random

    from ocel_ocpn_lakehouse_ray.pipelines.predictive import (
        levenshtein,
        levenshtein_banded,
    )

    rng = random.Random(11)
    alpha = "abcdefg"
    for _ in range(300):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 30)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 30)))
        d = levenshtein(a, b)
        for cutoff in (0, 1, 3, d, d + 2, 50):
            got = levenshtein_banded(a, b, cutoff)
            if d <= cutoff:
                assert got == d, (a, b, cutoff)
            else:
                assert got > cutoff, (a, b, cutoff)
    assert levenshtein_banded("xyz", "xyz", None) == 0
    assert levenshtein_banded("abc", "abd", None) == 1


def test_levenshtein_banded_long_trace_stress():
    """Corpus-scale long traces: the banded DP with a small cutoff must be
    orders of magnitude cheaper than the full DP (the top-k radius prune)."""
    import time

    from ocel_ocpn_lakehouse_ray.pipelines.predictive import (
        levenshtein,
        levenshtein_banded,
    )

    a = "ab" * 4000                      # 8000 chars
    b = "ab" * 3999 + "cd"               # close to a
    t0 = time.perf_counter()
    d = levenshtein_banded(a, b, 16)
    banded_s = time.perf_counter() - t0
    assert d == levenshtein(a, b) <= 16
    # far apart: early exit well before the full DP finishes
    c = "zq" * 4000
    t0 = time.perf_counter()
    assert levenshtein_banded(a, c, 16) > 16
    early_s = time.perf_counter() - t0
    assert banded_s < 2.0 and early_s < 2.0  # full DP is 64M cells — seconds


def test_similar_cases_single_events_scan(monkeypatch):
    """VERDICT r3 #4: q_similar_cases derives the query trace, min user, and
    all distances from ONE events read."""
    import ocel_ocpn_lakehouse_ray.pipelines.predictive as pred

    calls = []
    real = pred._read

    def counting(sf_dir, table, **kw):
        calls.append(table)
        return real(sf_dir, table, **kw)

    monkeypatch.setattr(pred, "_read", counting)
    out = pred.q_similar_cases("/root/testdata/sf0.001").to_pandas()
    assert calls == ["events"]
    assert 0 < len(out) <= pred.TOP_K_SIMILAR  # sf0.001 has few users
    assert out["distance"].is_monotonic_increasing


def test_merge_auto_plan_choice_and_resume_stability(tmp_path, monkeypatch):
    """GRAFT_MERGE=auto picks the plan from the cost model (cow when
    3*src < 2*touched above the byte floor, else shuffle), persists it in
    the job meta, and a RESUME reuses the recorded plan even when the
    environment would now choose differently."""
    import ray

    from ocel_ocpn_lakehouse_ray.sources.generator import (
        create_image_table,
        merge_source_dataset,
    )
    from ocel_ocpn_lakehouse_ray.state import lineage
    from ocel_ocpn_lakehouse_ray.stages.merge import run_merge
    from ocel_ocpn_lakehouse_ray.stages.verify import verify_merged_map_only

    monkeypatch.setenv("GRAFT_MERGE", "auto")

    # default floor is now 0 (round 5: cow's fixed costs were removed and it
    # A/B-wins at every tier) — the ~5 % source vs full touched set chooses
    # cow by pure byte math; an env floor above the table forces shuffle
    t = create_image_table(str(tmp_path / "a"), 200, num_fragments=6, seed=42)
    t2, rep = run_merge(t, merge_source_dataset(200, seed=42, num_blocks=2),
                        job_id="auto-s")
    assert lineage.load_job_meta(t.root, "auto-s")["plan"] == "cow"
    vr = verify_merged_map_only(t2, n=200, seed=42, num_blocks=4)
    assert vr["passed"], vr
    t = create_image_table(str(tmp_path / "a2"), 200, num_fragments=6, seed=42)
    monkeypatch.setenv("GRAFT_AUTO_COW_MIN_BYTES", str(1 << 40))
    t2, rep = run_merge(t, merge_source_dataset(200, seed=42, num_blocks=2),
                        job_id="auto-s2")
    assert lineage.load_job_meta(t.root, "auto-s2")["plan"] == "shuffle"
    vr = verify_merged_map_only(t2, n=200, seed=42, num_blocks=4)
    assert vr["passed"], vr

    # crash under floor 0 (plan=cow journaled), then resume under a HUGE
    # floor — must reuse the journaled cow plan
    monkeypatch.setenv("GRAFT_AUTO_COW_MIN_BYTES", "0")
    t = create_image_table(str(tmp_path / "b"), 200, num_fragments=6, seed=42)
    with pytest.raises(Exception, match="failpoint"):
        run_merge(t, merge_source_dataset(200, seed=42, num_blocks=2),
                  job_id="auto-c", failpoint=1)
    assert lineage.load_job_meta(t.root, "auto-c")["plan"] == "cow"
    monkeypatch.setenv("GRAFT_AUTO_COW_MIN_BYTES", str(1 << 40))
    t3, rep = run_merge(t, merge_source_dataset(200, seed=42, num_blocks=2),
                        job_id="auto-c")
    assert lineage.load_job_meta(t.root, "auto-c")["plan"] == "cow"
    vr = verify_merged_map_only(t3, n=200, seed=42, num_blocks=4)
    assert vr["passed"] and vr["id_checksum_ok"], vr


def test_stream_append_exactly_once_with_resume(tmp_path):
    """Micro-batch streaming ingest: bounded manifest commits, exact row
    counts, and an interrupted stream resumes with zero duplicates and
    zero lost batches."""
    from ocel_ocpn_lakehouse_ray.config import TableConfig
    from ocel_ocpn_lakehouse_ray.pipelines.streaming import stream_append
    from ocel_ocpn_lakehouse_ray.sources.generator import gen_batch
    from ocel_ocpn_lakehouse_ray.table import IMAGE_SCHEMA, LakeTable

    t = LakeTable.create(str(tmp_path / "t"), IMAGE_SCHEMA,
                         TableConfig(target_fragment_bytes=1 << 20))
    v0 = t.version

    def stream():
        for i in range(20):
            yield gen_batch(np.arange(10) + i * 10, 5)

    # interrupted at batch 12: some micro-batches journaled, one commit done
    with pytest.raises(RuntimeError, match="failpoint"):
        stream_append(t, stream(), job_id="s1", commit_every=5, failpoint=12)
    t1 = LakeTable.load(t.root)
    assert t1.manifest.total_rows in (50, 100)  # full commits only

    # resume: same job, same stream — exactly-once
    t2, rep = stream_append(LakeTable.load(t.root), stream(), job_id="s1",
                            commit_every=5)
    assert rep["rows"] == 200 and rep["resumed_skips"] >= 10
    assert t2.manifest.total_rows == 200
    ids = t2.to_arrow(columns=["image_id"])["image_id"].to_pylist()
    assert len(ids) == len(set(ids)) == 200
    # bounded manifest churn: at most ceil(20/5)+1 commits across both runs
    assert t2.version - v0 <= 5
    # idempotent full rerun: nothing new to publish
    t3, rep3 = stream_append(t2, stream(), job_id="s1", commit_every=5)
    assert t3.version == t2.version and rep3["resumed_skips"] == 20


def test_curate_corpus_stages(tmp_path):
    """Composed curation pipeline: quality filter, language filter, exact
    dedup (keep-min), near-dedup (keep-lowest), export — crafted corpus
    exercises every stage with known expected survivors."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocel_ocpn_lakehouse_ray.pipelines.curate import curate_corpus

    base = ("the quick brown fox jumps over the lazy dog and runs to the "
            "river where it drinks some of the cold water before it sleeps")
    near = base.replace("cold", "warm")
    docs = {
        1: base,                       # keeper (lowest id of near-dup pair)
        2: base,                       # exact dup of 1 -> dropped (keep-min)
        3: near,                       # near dup of 1 -> dropped
        4: "short",                    # quality fail (min_tokens)
        5: "el rapido zorro marron salta sobre el perro perezoso en la "
           "manana y corre por la ciudad con los gatos y las casas",  # not en
        6: "a completely different english document that talks about the "
           "weather and the mountains and the long roads of the north",
    }
    src = str(tmp_path / "corpus")
    import os

    os.makedirs(src)
    pq.write_table(
        pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                  "text": pa.array(list(docs.values()), pa.string())}),
        os.path.join(src, "documents.parquet"))

    out = str(tmp_path / "out")
    rep = curate_corpus(src, out, min_tokens=5, langs=("en",),
                        jaccard_threshold=0.4)
    assert rep["n_input"] == 6
    assert rep["n_quality"] == 4          # drops 4 (short) and 5 (es)
    assert rep["exact_dup_drops"] == 1    # doc 2
    assert rep["near_dup_drops"] == 1     # doc 3
    assert rep["n_output"] == 2
    got = sorted(
        v for f in os.listdir(out) if f.endswith(".parquet")
        for v in pq.read_table(os.path.join(out, f))["doc_id"].to_pylist())
    assert got == [1, 6]


def test_curate_counts_consistent_on_testdata(tmp_path):
    from ocel_ocpn_lakehouse_ray.pipelines.curate import curate_corpus

    rep = curate_corpus("/root/testdata/sf0.001", str(tmp_path / "o"))
    assert rep["n_output"] == (rep["n_quality"] - rep["exact_dup_drops"]
                               - rep["near_dup_drops"])
    assert rep["n_input"] == 500 and rep["n_output"] > 0


def test_maint_update_registry_wrapper():
    from ocel_ocpn_lakehouse_ray.pipelines.maintenance_queries import (
        maint_update,
    )

    df = maint_update("/root/testdata/sf0.001")
    assert len(df) > 0  # in-place SET assertions live inside the wrapper


def test_bottlenecks_matches_duckdb():
    """q_bottlenecks reproduces the reference identify_bottlenecks semantics
    (`agent/process_mining_queries.py:285-329`), pinned by a DuckDB oracle
    on the events table."""
    import duckdb

    from ocel_ocpn_lakehouse_ray.pipelines.predictive import (
        SQL_BOTTLENECKS,
        q_bottlenecks,
    )

    sf = "/root/testdata/sf0.001"
    got = q_bottlenecks(sf)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    want = con.sql(SQL_BOTTLENECKS).df()
    assert len(got) == len(want) > 0
    assert got["activity"].tolist() == want["activity"].tolist()
    assert got["severity"].tolist() == want["severity"].tolist()
    assert got["total_occurrences"].tolist() == \
        want["total_occurrences"].tolist()
    assert np.allclose(got["avg_duration_seconds"],
                       want["avg_duration_seconds"], atol=1e-4)


def test_gc_sweeps_bloom_sidecars_after_dml_lifecycle(tmp_path, monkeypatch):
    """DML + snapshot expiry + GC must leave ZERO orphans — including the
    .bloom key sidecars of fragments removed by DELETE/UPDATE/MERGE."""
    import os

    import ray

    from ocel_ocpn_lakehouse_ray.sources.generator import (
        create_image_table,
        merge_source_dataset,
    )
    from ocel_ocpn_lakehouse_ray.stages.delete import run_delete
    from ocel_ocpn_lakehouse_ray.stages.gc import (
        expire_snapshots,
        fsck,
        garbage_collect,
    )
    from ocel_ocpn_lakehouse_ray.stages.merge import run_merge
    from ocel_ocpn_lakehouse_ray.stages.update import run_update

    monkeypatch.setenv("GRAFT_MERGE", "shuffle")
    root = str(tmp_path / "t")
    t = create_image_table(root, 200, num_fragments=6, seed=15)
    data_dir = os.path.join(root, "data")
    blooms_before = {f for f in os.listdir(data_dir) if f.endswith(".bloom")}
    assert blooms_before, "fixture should write bloom sidecars"

    t, _ = run_merge(t, merge_source_dataset(200, seed=15, num_blocks=2),
                     job_id="gc-m")
    t, _ = run_delete(t, [{"column": "w", "op": "eq", "value": 32}],
                      job_id="gc-d")
    t, _ = run_update(t, [{"column": "w", "op": "eq", "value": 64}],
                      [{"column": "h", "set": 7}], job_id="gc-u")

    expire_snapshots(root, keep_last=1)
    garbage_collect(root, orphan_grace_seconds=0.0,
                    now=__import__("time").time() + 10)
    rep = fsck(root)
    assert rep["orphans"] == [], rep
    assert rep["missing"] == []
    # every surviving .bloom belongs to a live fragment
    live = {f.fragment_id for f in t.fragments}
    for name in os.listdir(data_dir):
        if name.endswith(".bloom"):
            assert name.rsplit(".", 1)[0] in live, name
    # and the table still reads
    assert t.to_dataset().count() == t.manifest.total_rows


def test_update_expression_sets_match_duckdb(tmp_path):
    """Column-from-column arithmetic and CASE-style conditional SET
    expressions, pinned against a DuckDB UPDATE oracle."""
    import duckdb

    from ocel_ocpn_lakehouse_ray.sources.generator import create_image_table
    from ocel_ocpn_lakehouse_ray.stages.update import run_update

    t = create_image_table(str(tmp_path / "t"), 200, num_fragments=6, seed=5)
    before = t.to_arrow(columns=["image_id", "w", "h", "fmt"])
    preds = [{"column": "w", "op": "between", "lo": 32, "hi": 128}]
    sets = [
        {"column": "h", "binop": {
            "op": "+", "lhs": {"col": "h"},
            "rhs": {"binop": {"op": "*", "lhs": {"col": "w"},
                              "rhs": {"lit": 2}}}}},
        {"column": "fmt", "case": {
            "when": [{"column": "fmt", "op": "eq", "value": "png"}],
            "then": {"lit": "PNG"}}},
    ]
    t2, rep = run_update(t, preds, sets, job_id="upd-expr")
    assert rep["updated"] > 0

    con = duckdb.connect()
    con.register("b", before)
    oracle = con.sql("""
        SELECT image_id, w,
               CASE WHEN w BETWEEN 32 AND 128 THEN h + w * 2 ELSE h END AS h,
               CASE WHEN w BETWEEN 32 AND 128 AND fmt = 'png'
                    THEN 'PNG' ELSE fmt END AS fmt
        FROM b ORDER BY image_id
    """).arrow()
    got = (t2.to_dataset(columns=["image_id", "w", "h", "fmt"]).to_pandas()
           .sort_values("image_id").reset_index(drop=True))
    for c in ("image_id", "w", "h", "fmt"):
        assert got[c].tolist() == oracle[c].to_pylist(), c


@pytest.mark.parametrize("mode", ["shuffle", "cow"])
def test_merge_pure_delete_source(tmp_path, mode, monkeypatch):
    """A source containing ONLY delete markers behaves as a keyed DELETE
    under both plans: matched rows vanish, nothing inserts."""
    import pyarrow as pa
    import ray

    from ocel_ocpn_lakehouse_ray.sources.generator import (
        create_image_table,
        gen_batch,
    )
    from ocel_ocpn_lakehouse_ray.stages.merge import run_merge

    monkeypatch.setenv("GRAFT_MERGE", mode)
    n, seed = 200, 33
    t = create_image_table(str(tmp_path / mode), n, num_fragments=6, seed=seed)
    del_ids = np.arange(0, 30, 3)
    src = gen_batch(del_ids, seed).append_column(
        "__del", pa.array([True] * len(del_ids)))
    t2, rep = run_merge(t, ray.data.from_arrow(src),
                        job_id=f"pured-{mode}", delete_col="__del")
    assert rep["deletes"] == len(del_ids)
    assert rep["inserts"] == 0 and rep["updates"] == 0
    assert t2.manifest.total_rows == n - len(del_ids)
    ids = set(t2.to_arrow(columns=["image_id"])["image_id"].to_pylist())
    gone = set(gen_batch(del_ids, seed)["image_id"].to_pylist())
    assert not (ids & gone) and len(ids) == n - len(del_ids)


def test_interval_index_pathological_overlap_falls_back_to_linear():
    # nested ranges (frag i spans [0, i]) → O(F^2) segment entries → None
    frags = [_frag(f"f{i:04d}", "k000000", f"k{i:06d}") for i in range(200)]
    assert build_interval_index(frags) is None
    keys = np.array(["k000100"], dtype=object)
    got = candidate_rows(None, frags, keys)
    assert set(got) == set(range(100, 200))  # linear fallback still exact
