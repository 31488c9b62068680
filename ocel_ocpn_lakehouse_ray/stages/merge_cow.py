"""Copy-on-write MERGE strategy: route the (small) source to the fragments it
touches instead of hash-shuffling the whole table.

The shuffle strategy (stages/merge.py step 2-3) moves EVERY touched-fragment
byte through the exchange twice (map partials out, reduce in) to co-locate
target and source rows.  But the target rows are already co-located — they
live in fragments.  At a realistic merge ratio (~10 % of rows change) the
data that actually needs to MOVE is the source, not the table.  This
strategy:

  1. **Route** (map-only over the staged source): every source row is tagged
     with the candidate fragments whose image_id range (+ key bloom) may
     contain it — one output row per (source row, candidate fragment); rows
     with no candidate go straight to the insert set.  Only SOURCE rows ever
     enter a shuffle.
  2. **Fragment rewrite** (one task per touched fragment, co-grouped by
     fragment id): the task reads ITS fragment directly from table storage,
     replaces matched rows with the source version, writes the new
     fragment(s), journals lineage, and records which source keys it
     consumed (a `matched/<fragment>.parquet` journal sidecar).
  3. **Insert pass**: source rows whose key was consumed by NO fragment
     (range/bloom candidates can be false positives) are anti-joined against
     the matched-key sidecars (a source-sized hash join, never a driver key
     set), hash-partitioned, deduped, and written as new fragments.

I/O balance at table bytes T, source bytes s ≈ 0.1 T: shuffle strategy moves
~4T through storage/object store (read T, partials out T, partials in T,
write T); copy-on-write moves ~2T + 3s (read T, write T, route + co-group +
anti-join of s).  On the bench box the single ~430 MB/s disk is the rewrite
jobs' scaling floor (BASELINE.md), so halving bytes-through-disk is the same
win a 4N-node store gets from 4× aggregate bandwidth.

Scale notes: the routing table broadcast is (min, max, bloom_bits) per
TOUCHED fragment — bounded by the merge's blast radius, not the table — plus
an elementary-segment interval index (build_interval_index) so each batch
routes in O(n log F + candidates) instead of scanning every touched fragment;
at millions of touched fragments the per-batch work stays proportional to the
keys' actual overlap, with a linear fallback only under pathological range
overlap (cap documented on the builder).  Duplicate source keys get a
single arbitrary winner (same contract as the shuffle strategy, whose
winner is concat-order-dependent); duplicate keys ACROSS table fragments
(which the verify gate forbids) would be updated in every fragment that
holds them rather than collapsed to one row.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions import bloom as bl
from ..state import lineage
from .shuffle import PART_COL, assign_hash_part

FRAG_COL = "__fidx"   # int32 index into the sorted touched-fragment list
INSERT_KEY = -1       # routing tag for "no candidate fragment"


def _matched_dir(root: str, job_id: str) -> str:
    return os.path.join(lineage.journal_dir(root, job_id), "matched")


def _write_matched(root: str, job_id: str, fragment_id: str, keys) -> str:
    """Idempotent journal sidecar: the source keys this fragment consumed."""
    d = _matched_dir(root, job_id)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"{fragment_id}.parquet")
    if not os.path.exists(path):
        import uuid

        tmp = path + f".tmp.{os.getpid()}.{uuid.uuid4().hex[:6]}"
        pq.write_table(pa.table({"image_id": pa.array(keys, pa.string())}), tmp)
        os.replace(tmp, path)
    return path


def build_interval_index(frags):
    """Elementary-segment interval index over the touched fragments' key
    ranges — the sub-linear routing structure the module's scale note calls
    for.  ``pts`` is the sorted distinct set of all fragment min/max bounds;
    segment ``j`` covers keys in ``[pts[j], pts[j+1])`` (the last segment is
    open-ended) and ``seg_lists[j]`` holds the fragment indices whose range
    intersects that segment.  A key routes via ONE binary search; segment
    membership over-approximates only within the segment that starts at a
    fragment's max bound, and the caller re-checks exact min/max on the
    candidate rows, so no false negatives and bounded false positives.

    Returns None (→ linear fallback) when no fragment has bounds or when
    heavy range overlap would blow the index up quadratically (cap: 64
    fragment entries per segment on average)."""
    bounded = [(i, f[2], f[3]) for i, f in enumerate(frags) if f[2] is not None]
    unbounded = [i for i, f in enumerate(frags) if f[2] is None]
    if not bounded:
        return None
    pts = np.array(sorted({b for _, mn, mx in bounded for b in (mn, mx)}),
                   dtype=object)
    seg_lists: list[list[int]] = [[] for _ in range(len(pts))]
    total = 0
    cap = 64 * len(bounded)
    for i, mn, mx in bounded:
        jm = int(np.searchsorted(pts, mn, side="right")) - 1
        jM = int(np.searchsorted(pts, mx, side="right")) - 1
        total += jM - jm + 1
        if total > cap:
            return None  # pathological overlap → linear scan is no worse
        for j in range(jm, jM + 1):
            seg_lists[j].append(i)
    return pts, seg_lists, unbounded


def candidate_rows(index, frags, keys_np: np.ndarray) -> dict[int, np.ndarray]:
    """fragment index → row indices of keys whose value lies inside that
    fragment's exact [min, max] range.  With an index the per-batch work is
    O(n log F + total candidates) — independent of the touched-fragment
    count F; without one it degrades to the linear per-fragment scan."""
    n = len(keys_np)
    out: dict[int, np.ndarray] = {}
    if index is None:
        for fidx, (_fid, _p, mn, mx, _b, _k) in enumerate(frags):
            if mn is None:
                out[fidx] = np.arange(n)
                continue
            m = (keys_np >= mn) & (keys_np <= mx)
            if m.any():
                out[fidx] = np.nonzero(m)[0]
        return out
    pts, seg_lists, unbounded = index
    for fidx in unbounded:
        out[fidx] = np.arange(n)
    seg = np.searchsorted(pts, keys_np, side="right") - 1
    uniq, inv = np.unique(seg, return_inverse=True)
    acc: dict[int, list] = {}
    for si, s in enumerate(uniq):
        if s < 0:
            continue  # key below every fragment's min
        rows = np.nonzero(inv == si)[0]
        for fidx in seg_lists[int(s)]:
            acc.setdefault(fidx, []).append(rows)
    for fidx, parts in acc.items():
        rows = np.concatenate(parts) if len(parts) > 1 else parts[0]
        mn, mx = frags[fidx][2], frags[fidx][3]
        k = keys_np[rows]
        rows = rows[(k >= mn) & (k <= mx)]
        if rows.size:
            rows.sort()
            out[fidx] = rows
    return out


def _routing_ref(table, touched):
    """Broadcast payload: per touched fragment (id, path, min, max, bloom)
    plus the interval index built ONCE here on the driver."""
    import ray

    frags = []
    for f in touched:
        st = f.stats.get("image_id") or {}
        bits = None
        k = bl.NUM_HASHES
        binfo = f.stats.get("__bloom")
        if binfo:
            try:
                bits, k = bl.read_sidecar(os.path.join(table.root, binfo["path"]))
            except (OSError, ValueError):
                bits = None  # corrupt/missing sidecar → range-only routing
        frags.append((f.fragment_id, f.path, st.get("min"), st.get("max"),
                      bits, k))
    return ray.put({"frags": frags, "index": build_interval_index(frags)})


def _route_batches(frags_ref, key_col: str = "image_id", *,
                   include_unclaimed: bool = False):
    """map_batches fn: one output row per (source row, candidate fragment),
    FRAG_COL = the fragment's index in the sorted touched list.  Key hashes
    are computed once per batch and sliced per fragment for the bloom
    probes.  Unclaimed rows (pure inserts) are dropped unless
    ``include_unclaimed`` (the insert pass re-derives them by anti-join
    against the matched-key sidecars, which also catches bloom false
    positives)."""

    def route(batch: pa.Table) -> pa.Table:
        import ray as _r

        payload = _r.get(frags_ref)
        frags, index = payload["frags"], payload["index"]
        if "__side" in batch.column_names:
            batch = batch.drop_columns(["__side"])
        out_schema = batch.schema.append(pa.field(FRAG_COL, pa.int32()))
        if batch.num_rows == 0:
            return out_schema.empty_table()
        col = batch[key_col]
        n = batch.num_rows
        keys_np = np.asarray(col.to_pylist(), dtype=object)
        cands = candidate_rows(index, frags, keys_np)
        h1 = h2 = None
        claimed = np.zeros(n, bool)
        outs = []
        for fidx in sorted(cands):
            rows = cands[fidx]
            bits, k = frags[fidx][4], frags[fidx][5]
            if bits is not None and rows.size:
                if h1 is None:
                    h1, h2 = bl.key_hashes(keys_np)
                hit = bl.might_contain_hashes(bits, h1[rows], h2[rows], k)
                rows = rows[hit]
            if rows.size:
                mask = np.zeros(n, bool)
                mask[rows] = True
                sub = batch.filter(pa.array(mask))
                outs.append(sub.append_column(
                    FRAG_COL, pa.array([fidx] * sub.num_rows, pa.int32())))
                claimed |= mask
        if include_unclaimed:
            rest = batch.filter(pa.array(~claimed))
            if rest.num_rows:
                outs.append(rest.append_column(
                    FRAG_COL,
                    pa.array([INSERT_KEY] * rest.num_rows, pa.int32())))
        return (pa.concat_tables(outs).combine_chunks() if outs
                else out_schema.empty_table())

    return route


def _dedup_keep_one(tbl: pa.Table, key_col: str) -> pa.Table:
    """One winner per key (arbitrary, stable within this table's order —
    the shuffle strategy's contract for duplicate source keys)."""
    keys = tbl[key_col].to_pylist()
    last = {kv: i for i, kv in enumerate(keys)}
    if len(last) == tbl.num_rows:
        return tbl
    return tbl.take(pa.array(sorted(last.values())))


def cow_merge(table, src_files: list[str], touched, *, job_id: str,
              target_bytes: int, failpoint: int | None = None,
              num_insert_parts: int | None = None,
              delete_col: str | None = None) -> None:
    """Execute the copy-on-write merge; results land in the job's lineage
    journal (the caller aggregates records and commits, same as the shuffle
    strategy).  Idempotent/resumable per fragment and per insert partition."""
    import ray
    import ray.data

    from ..sources.fragments import metas_to_batch, write_table_as_fragments

    root = table.root
    touched = sorted(touched, key=lambda f: f.fragment_id)
    frags_ref = _routing_ref(table, touched)
    frag_ids = [f.fragment_id for f in touched]
    frag_paths = [f.path for f in touched]

    routed = ray.data.read_parquet(src_files).map_batches(
        _route_batches(frags_ref), batch_format="pyarrow")

    def rewrite(group: pa.Table) -> pa.Table:
        fidx = group[FRAG_COL][0].as_py()
        fid = frag_ids[fidx]
        pid = f"cow-frag-{fid}"
        prior = lineage.load_record(root, job_id, pid)
        if prior is not None:
            return metas_to_batch(prior.out_metas())
        if failpoint is not None and fidx >= failpoint:
            raise RuntimeError(f"failpoint: simulated crash at {pid}")
        src = _dedup_keep_one(group.drop_columns([FRAG_COL]), "image_id")
        deletes = 0
        if delete_col and delete_col in src.column_names:
            dmask = pc.fill_null(pc.cast(src[delete_col], pa.bool_()), False)
            dels = src.filter(dmask)
            src = src.filter(pc.invert(dmask)).drop_columns([delete_col])
        else:
            dels = None
        tgt = pq.read_table(os.path.join(root, frag_paths[fidx]))
        hit = pc.is_in(tgt["image_id"], value_set=src["image_id"].combine_chunks())
        if dels is not None and dels.num_rows:
            hit_del = pc.is_in(tgt["image_id"],
                               value_set=dels["image_id"].combine_chunks())
            deletes = int(pc.sum(hit_del).as_py() or 0)
            hit = pc.or_(hit, hit_del)
        # matched = source keys actually present in THIS fragment (upsert AND
        # delete matches — both are consumed, so the insert pass skips them)
        matched = tgt.filter(hit)["image_id"]
        applied = src.filter(pc.is_in(src["image_id"],
                                      value_set=matched.combine_chunks()))
        merged = pa.concat_tables(
            [tgt.filter(pc.invert(hit)), applied]).combine_chunks()
        metas = write_table_as_fragments(
            root, merged, target_bytes=target_bytes, name_parts=(job_id, pid))
        _write_matched(root, job_id, fid, matched.to_pylist())
        lineage.write_record(root, lineage.PartitionRecord(
            job_id=job_id, partition_id=pid,
            frags_in=[fid],
            frags_out=[m.to_dict() for m in metas],
            rows=merged.num_rows,
            bytes=sum(m.bytes for m in metas),
            extra={"updates": int(applied.num_rows), "inserts": 0,
                   "deletes": deletes},
        ))
        return metas_to_batch(metas)

    # One REAL task per touched fragment via the storage-partitioned shuffle
    # (a Dataset.groupby().map_groups over the tiny routed source collapses
    # all groups into one block → one serial task; fs_shuffle_groups fans one
    # Ray task per partition regardless of input size).  Only SOURCE rows
    # move; each task side-reads its fragment directly from table storage.
    from .fs_shuffle import cleanup, fs_shuffle_groups

    work = os.path.join(lineage.journal_dir(root, job_id), "cow-route")
    cleanup(work)
    try:
        fs_shuffle_groups(routed, part_col=FRAG_COL, work_dir=work,
                          reduce_fn=rewrite)
    finally:
        cleanup(work)

    # ---- insert pass: source keys consumed by no fragment -----------------
    matched_files = sorted(
        os.path.join(_matched_dir(root, job_id), p)
        for p in (os.listdir(_matched_dir(root, job_id))
                  if os.path.isdir(_matched_dir(root, job_id)) else [])
        if p.endswith(".parquet"))
    def _strip(b: pa.Table) -> pa.Table:
        if "__side" in b.column_names:
            b = b.drop_columns(["__side"])
        if delete_col and delete_col in b.column_names:
            # WHEN MATCHED THEN DELETE markers never insert: an unmatched
            # marker is a no-op, a matched one was consumed by its fragment
            dmask = pc.fill_null(pc.cast(b[delete_col], pa.bool_()), False)
            b = b.filter(pc.invert(dmask)).drop_columns([delete_col])
        return b

    src_ds = ray.data.read_parquet(src_files).map_batches(
        _strip, batch_format="pyarrow")
    max_bcast = int(os.environ.get("GRAFT_COW_BCAST_KEYS", "2000000"))
    n_matched = sum(pq.ParquetFile(p).metadata.num_rows for p in matched_files)
    if not matched_files:
        inserts = src_ds
    elif n_matched <= max_bcast:
        # matched-key set is small (bounded by the update count, known from
        # the sidecar footers without reading them): broadcast it once and
        # anti-filter the source map-only — two shuffles cheaper than the
        # general join below, and the fixed Dataset-op latency it avoids is
        # exactly what kept cow's exchange slower than the hash co-group at
        # bench scale.
        matched_tbl = pa.concat_tables(
            [pq.read_table(p) for p in matched_files])
        matched_ref = ray.put(matched_tbl["image_id"].combine_chunks())

        def anti(batch: pa.Table) -> pa.Table:
            keys = ray.get(matched_ref)
            return batch.filter(
                pc.invert(pc.is_in(batch["image_id"], value_set=keys)))

        inserts = src_ds.map_batches(anti, batch_format="pyarrow")
    else:
        from ray.data.aggregate import Count

        matched_ds = (ray.data.read_parquet(matched_files)
                      .groupby("image_id").aggregate(Count(alias_name="__m")))
        nparts = max(2, min(16, int(ray.cluster_resources().get("CPU", 8)) // 2))
        joined = src_ds.join(matched_ds, join_type="left_outer",
                             num_partitions=nparts, on=("image_id",))
        inserts = joined.map_batches(
            lambda b: b.filter(pc.is_null(b["__m"])).drop_columns(["__m"]),
            batch_format="pyarrow")

    # p_ins must be STABLE across resume: cow-insert-NNNNN journal records
    # are keyed by hash partition, so replaying them under a different
    # partition count (e.g. a resume on a cluster with a different CPU
    # count) would silently drop or duplicate insert rows.  Persist the
    # chosen count in the job meta (alongside run_merge's 'touched' /
    # 'num_parts') and reuse it on every rerun.
    meta = lineage.load_job_meta(root, job_id) or {}
    if num_insert_parts is not None:
        p_ins = int(num_insert_parts)
    elif "p_ins" in meta:
        p_ins = int(meta["p_ins"])
    else:
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        p_ins = max(1, min(8, n_cpus // 2))
    if meta.get("p_ins") != p_ins:
        meta["p_ins"] = p_ins
        lineage.write_job_meta(root, job_id, meta)
    n_frags = len(frag_ids)

    def write_inserts(group: pa.Table) -> pa.Table:
        part = group[PART_COL][0].as_py()
        pid = f"cow-insert-{part:05d}"
        prior = lineage.load_record(root, job_id, pid)
        if prior is not None:
            return metas_to_batch(prior.out_metas())
        if failpoint is not None and n_frags + part >= failpoint:
            raise RuntimeError(f"failpoint: simulated crash at {pid}")
        rows = _dedup_keep_one(group.drop_columns([PART_COL]), "image_id")
        metas = write_table_as_fragments(
            root, rows, target_bytes=target_bytes, name_parts=(job_id, pid))
        lineage.write_record(root, lineage.PartitionRecord(
            job_id=job_id, partition_id=pid,
            frags_in=["source"],
            frags_out=[m.to_dict() for m in metas],
            rows=rows.num_rows,
            bytes=sum(m.bytes for m in metas),
            extra={"updates": 0, "inserts": int(rows.num_rows)},
        ))
        return metas_to_batch(metas)

    parted = inserts.map_batches(
        lambda b: assign_hash_part(b, "image_id", p_ins), batch_format="pyarrow")
    for _ in parted.groupby(PART_COL).map_groups(
            write_inserts, batch_format="pyarrow").iter_batches():
        pass
