"""End-to-end corpus curation: the composed training-data pipeline the
build brief targets — quality filter → language filter → exact dedup →
MinHash/Jaccard near-dedup → sharded parquet export, as one resumable flow
over the documents table.

Reference analog: the reference curates nothing (its loaders validate and
append — `ingest/complete_ocel_loader.py`); this composes the engine's
oracle-paired primitives (q_quality_scores / q_lang_id / q_dedup_exact /
q_ngram_jaccard shapes) into the pipeline a 100 TB pre-training corpus
actually runs.

Scale shape (no full materialization of text anywhere):
- The quality/lang predicate is a DETERMINISTIC function of the text, so it
  is recomputed per batch on every pass instead of collecting a
  corpus-sized keep-set on the driver.
- The only driver-side state is the DROP sets (exact-dup losers and
  near-dup losers) — bounded by the duplicate count, not the corpus, and
  guarded by ``max_driver_drops`` (past it, callers shard the drop set via
  the same co-partitioned join the semi/anti queries use).
- Three column-pruned passes over the text: (A) metadata + fingerprints,
  (B) LSH band/verify over survivors only, (C) filtered export — the
  standard two-phase-plus-write curation layout; every pass streams.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import (
    guess_lang,
    jaccard,
    lsh_band_keys_batch,
    md5_fingerprint,
    minhash_signatures,
    quality_metrics,
    word_shingle_sets,
)
from .dedup import BANDS, JACCARD_THRESHOLD, NUM_PERM
from .queries import _read_wide, bucketed_groups

DEFAULTS = dict(min_tokens=5, max_stop_ratio=0.9, langs=("en",))


def _quality_mask(texts: list[str], *, min_tokens: int, max_stop_ratio: float,
                  langs: tuple) -> np.ndarray:
    m = quality_metrics(texts)
    stop_ratio = m["stop_tokens"] / np.maximum(m["n_tokens"], 1)
    ok = (m["n_tokens"] >= min_tokens) & (stop_ratio <= max_stop_ratio)
    if langs:
        lang = np.asarray(guess_lang(texts), dtype=object)
        ok &= np.isin(lang, np.asarray(langs, dtype=object))
    return ok


def _drops_path(out_dir: str, stage: str) -> str:
    import os

    return os.path.join(out_dir, "_curation", f"{stage}_drops.parquet")


def _load_drops(out_dir: str, stage: str):
    """Journaled drop manifest for a stage, or None if not yet computed."""
    import os

    import pyarrow.parquet as pq

    path = _drops_path(out_dir, stage)
    if not os.path.exists(path):
        return None
    return set(pq.read_table(path)["doc_id"].to_pylist())


def _journal_drops(out_dir: str, stage: str, drops: set) -> None:
    """Atomic (tmp+rename) per-stage drop manifest — the curation journal.
    A resumed run loads it instead of recomputing the stage, so an
    interrupted curation finishes stage-exactly (VERDICT r4 #7)."""
    import os
    import uuid

    path = _drops_path(out_dir, stage)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    tmp = path + f".tmp.{uuid.uuid4().hex[:8]}"
    pq.write_table(
        pa.table({"doc_id": pa.array(sorted(drops), pa.int64())}), tmp)
    os.replace(tmp, path)


def curate_corpus(sf_dir: str, out_dir: str, *,
                  min_tokens: int = DEFAULTS["min_tokens"],
                  max_stop_ratio: float = DEFAULTS["max_stop_ratio"],
                  langs: tuple = DEFAULTS["langs"],
                  jaccard_threshold: float = JACCARD_THRESHOLD,
                  max_driver_drops: int = 10_000_000,
                  failpoint: str | None = None) -> dict:
    """Run the curation flow; returns the per-stage report.  Output parquet
    shards land in ``out_dir``.

    Resumable stage-exactly: each stage's drop SET is journaled to
    ``out_dir/_curation/<stage>_drops.parquet`` (atomic tmp+rename) the
    moment it completes, and a rerun loads journaled stages instead of
    recomputing them — an interruption mid-near-dedup resumes with the
    exact-dedup result it already had.  The export is guarded by a
    ``_SUCCESS`` marker: a crashed export clears its partial shards and
    rewrites.  ``failpoint`` ('exact' | 'near') crashes just after that
    stage journals, for resume tests."""
    import ray

    qkw = dict(min_tokens=min_tokens, max_stop_ratio=max_stop_ratio,
               langs=tuple(langs))

    # ---- pass A: per-doc metadata over quality survivors ------------------
    import json as _json
    import os as _os

    docs = _read_wide(sf_dir, "documents", columns=["doc_id", "text"])
    counts_path = _os.path.join(out_dir, "_curation", "counts.json")
    journaled_exact = _load_drops(out_dir, "exact")
    if journaled_exact is not None and _os.path.exists(counts_path):
        # resume past pass A entirely: its only consumers are the counts
        # and the exact-dedup stage, both journaled
        with open(counts_path) as f:
            c = _json.load(f)
        n_input, n_quality = c["n_input"], c["n_quality"]
        md = None
    else:
        n_input = docs.count()

        def meta_rows(b: pa.Table) -> pa.Table:
            texts = b["text"].to_pylist()
            ok = _quality_mask(texts, **qkw)
            ids = b["doc_id"].to_numpy(zero_copy_only=False)[ok]
            kept = [t for t, k in zip(texts, ok) if k]
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "fp": pa.array(md5_fingerprint(kept), pa.string()),
            })

        md = docs.map_batches(meta_rows, batch_format="pyarrow").materialize()
        n_quality = md.count()
        _os.makedirs(_os.path.dirname(counts_path), exist_ok=True)
        tmp = counts_path + ".tmp"
        with open(tmp, "w") as f:
            _json.dump({"n_input": int(n_input),
                        "n_quality": int(n_quality)}, f)
        _os.replace(tmp, counts_path)

    # ---- exact dedup: losers of each fingerprint group --------------------
    def losers(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in g.groupby("fp", sort=False):
            if len(grp) > 1:
                ids = np.sort(grp["doc_id"].to_numpy())
                out.append(ids[1:])  # keep-min rule (same as q_dedup_exact)
        return pd.DataFrame({
            "doc_id": np.concatenate(out) if out else
            np.array([], np.int64)})

    journaled_exact = _load_drops(out_dir, "exact")
    if journaled_exact is not None:
        exact_drops: set = journaled_exact
    else:
        exact_drops = set()
        for b in bucketed_groups(md, "fp", losers).iter_batches(
                batch_format="pyarrow"):
            exact_drops.update(b["doc_id"].to_pylist())
            if len(exact_drops) > max_driver_drops:
                raise ValueError(
                    "exact-dup drop set exceeds max_driver_drops; "
                    "shard the drop set (copartitioned_semi_join)")
        _journal_drops(out_dir, "exact", exact_drops)
    if failpoint == "exact":
        raise RuntimeError("failpoint: crash after exact-dedup journal")
    drops_ref = ray.put(np.array(sorted(exact_drops), np.int64))

    # ---- pass B: near-dedup over survivors (band rows carry shingles) -----
    def band_rows(b: pa.Table) -> pa.Table:
        import ray as _r

        texts = b["text"].to_pylist()
        ok = _quality_mask(texts, **qkw)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        ok &= ~np.isin(ids, _r.get(drops_ref))
        ids = ids[ok]
        texts = [t for t, k in zip(texts, ok) if k]
        shingle_sets = word_shingle_sets(texts)
        sigs = minhash_signatures(shingle_sets, NUM_PERM)
        keys = lsh_band_keys_batch(sigs, BANDS)
        lens = np.fromiter((len(s) for s in shingle_sets), np.int64,
                           len(shingle_sets))
        values = (np.concatenate(shingle_sets) if lens.sum()
                  else np.array([], np.uint64)).view(np.int64)
        offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        sh = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                      pa.array(values, pa.int64()))
        rep = pa.array(np.repeat(np.arange(len(ids)), BANDS))
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, BANDS), pa.int64()),
            "band": pa.array(keys.reshape(-1), pa.int64()),
            "shingles": sh.take(rep),
        })

    def bucket_losers(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in g.groupby("band", sort=False):
            grp = grp.drop_duplicates("doc_id").sort_values("doc_id")
            ids = grp["doc_id"].to_numpy()
            sets = [np.asarray(s, np.int64).view(np.uint64)
                    for s in grp["shingles"]]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    if jaccard(sets[i], sets[j]) >= jaccard_threshold:
                        out.append(ids[j])  # keep-lowest-id rule
        return pd.DataFrame({"doc_id": pd.Series(sorted(set(out)),
                                                 dtype=np.int64)})

    journaled_near = _load_drops(out_dir, "near")
    if journaled_near is not None:
        near_drops: set = journaled_near
    else:
        near_drops = set()
        for b in bucketed_groups(
                docs.map_batches(band_rows, batch_format="pyarrow"),
                "band", bucket_losers).iter_batches(batch_format="pyarrow"):
            near_drops.update(b["doc_id"].to_pylist())
            if len(near_drops) > max_driver_drops:
                raise ValueError("near-dup drop set exceeds max_driver_drops")
        _journal_drops(out_dir, "near", near_drops)
    if failpoint == "near":
        raise RuntimeError("failpoint: crash after near-dedup journal")
    all_drops_ref = ray.put(
        np.array(sorted(exact_drops | near_drops), np.int64))

    # ---- pass C: filtered export ------------------------------------------
    def final_filter(b: pa.Table) -> pa.Table:
        import ray as _r

        texts = b["text"].to_pylist()
        ok = _quality_mask(texts, **qkw)
        ok &= ~np.isin(b["doc_id"].to_numpy(zero_copy_only=False),
                       _r.get(all_drops_ref))
        return b.filter(pa.array(ok))

    import glob
    import os

    import pyarrow.parquet as pq

    marker = os.path.join(out_dir, "_curation", "_SUCCESS")
    if not os.path.exists(marker):
        # a crashed export leaves partial shards without the marker: clear
        # them so the rerun's shard set (and glob count) is exact
        for stale in glob.glob(os.path.join(out_dir, "*.parquet")):
            os.remove(stale)
        out_ds = docs.map_batches(final_filter, batch_format="pyarrow")
        out_ds.write_parquet(out_dir)
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        with open(marker, "w") as f:
            f.write("ok")

    files = glob.glob(os.path.join(out_dir, "*.parquet"))
    n_out = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    return {
        "n_input": int(n_input),
        "n_quality": int(n_quality),
        "exact_dup_drops": len(exact_drops),
        "near_dup_drops": len(near_drops - exact_drops),
        "n_output": int(n_out),
        "shards": len(files),
        "params": {**qkw, "jaccard_threshold": jaccard_threshold},
    }
