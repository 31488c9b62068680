"""Near-deduplication pipelines over the `documents` table:
MinHash+LSH candidate generation, SimHash signatures, and exact n-gram
Jaccard verification of candidates.

Scale shape (the standard shingle→minhash→band→bucket-groupby pipeline):
  1. map_batches: shingle each doc, 64-perm MinHash signature, emit one row
     per LSH band key (flat_map-style expansion, reference M3 exploder
     `ingest/daft_batch_ocel_loader.py:21-81`);
  2. groupby(band_key): docs sharing a band bucket are candidate pairs —
     the ONLY shuffle, and it moves (doc_id, band_key) pairs, never text;
  3. candidate pairs re-read their shingle sets and verify exact Jaccard
     (broadcast of the candidate doc set; at 10^12 docs this is a second
     co-partitioned join on doc_id instead).

All stages deterministic (seeded hash permutations) → stable rows-only
correctness check; exactness vs the brute-force pairwise Jaccard is asserted
in tests at small scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.text import (
    jaccard,
    lsh_band_keys_batch,
    minhash_signatures,
    simhash64,
    word_shingle_sets,
)
from .queries import _read_wide, bucketed_groups

NUM_PERM = 64
BANDS = 16
JACCARD_THRESHOLD = 0.4


def q_simhash(sf_dir: str):
    """SimHash signature per document (near-dup fingerprint family)."""
    ds = _read_wide(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"],
            "simhash": pa.array(simhash64(b["text"].to_pylist()).view(np.int64)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def q_minhash_lsh_pairs(sf_dir: str):
    """MinHash+LSH near-dup candidate pairs (canonical a < b, distinct)."""
    ds = _read_wide(sf_dir, "documents", columns=["doc_id", "text"])

    def band_rows(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        shingle_sets = word_shingle_sets(texts)  # batch memoized token hashes
        sigs = minhash_signatures(shingle_sets, NUM_PERM)  # one segment-min pass
        keys = lsh_band_keys_batch(sigs, BANDS)            # (ndocs, BANDS) int64
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, BANDS), pa.int64()),
            "band": pa.array(keys.reshape(-1), pa.int64()),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # one coarse bucket = many whole band-buckets (bucketed_groups
        # co-locates by hash(band)); vectorized pandas groupby inside instead
        # of one map_groups task per band key
        out_a, out_b = [], []
        for _, grp in g.groupby("band", sort=False):
            ids = sorted(set(grp["doc_id"]))
            for i, a in enumerate(ids):
                for b in ids[i + 1:]:
                    out_a.append(a)
                    out_b.append(b)
        # local dedup before the pair shuffle: the same pair surfacing from
        # two band keys of this coarse bucket travels once, not twice
        return pd.DataFrame({"a": pd.Series(out_a, dtype=np.int64),
                             "b": pd.Series(out_b, dtype=np.int64)}
                            ).drop_duplicates(["a", "b"])

    pairs = bucketed_groups(
        ds.map_batches(band_rows, batch_format="pyarrow"), "band", bucket_pairs
    )
    return distinct_pairs_bounded(pairs)


def distinct_pairs_bounded(pairs):
    """Distinct (a, b) candidate pairs: pairs are bounded by the near-dup
    DENSITY, not the corpus, so dedup them on the driver under a budget —
    saving a second bucket shuffle — and fall back to the co-located
    distributed dedup past it (identical results; pathological
    all-duplicate corpora stay distributed)."""
    import os as _os

    budget = int(_os.environ.get("GRAFT_FOLD_BUDGET", 2_000_000))
    frames, rows = [], 0
    for b in pairs.iter_batches(batch_format="pyarrow"):
        frames.append(b.to_pandas())
        rows += b.num_rows
        if rows > budget:
            break
    if rows > budget:
        # co-locate by hash(a) — identical pairs always share a bucket
        return bucketed_groups(pairs, "a",
                               lambda g: g.drop_duplicates(["a", "b"]))
    if not frames:
        return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                             "b": pd.Series(dtype=np.int64)})
    return pd.concat(frames).drop_duplicates(["a", "b"]).reset_index(drop=True)


def q_ngram_jaccard(sf_dir: str):
    """Exact word-3-gram Jaccard over LSH candidate pairs, thresholded —
    the verify stage of the near-dedup pipeline, CO-PARTITIONED: each band
    row carries the doc's shingle-hash set, so verification happens inside
    the band bucket with everything it needs.  No candidate-pair collection
    on the driver and no all-texts broadcast (the round-1 shape) — the only
    data movement is the one (doc_id, shingles, band) shuffle, and shingle
    sets are ~1 uint64 per word (smaller than the text itself)."""
    ds = _read_wide(sf_dir, "documents", columns=["doc_id", "text"])

    def band_rows(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        shingle_sets = word_shingle_sets(texts)  # batch memoized token hashes
        sigs = minhash_signatures(shingle_sets, NUM_PERM)
        keys = lsh_band_keys_batch(sigs, BANDS)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        # shingle ListArray built once from offsets+values, then repeated
        # per band via take (no per-row python list copies)
        lens = np.fromiter((len(s) for s in shingle_sets), np.int64,
                           len(shingle_sets))
        values = (np.concatenate(shingle_sets) if lens.sum()
                  else np.array([], np.uint64)).view(np.int64)
        offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        sh_arr = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                          pa.array(values, pa.int64()))
        rep_idx = pa.array(np.repeat(np.arange(len(ids)), BANDS))
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, BANDS), pa.int64()),
            "band": pa.array(keys.reshape(-1), pa.int64()),
            "shingles": sh_arr.take(rep_idx),
        })

    def bucket_verify(g: pd.DataFrame) -> pd.DataFrame:
        # coarse bucket = many band-buckets (see q_minhash_lsh_pairs)
        rows_a, rows_b, rows_j = [], [], []
        for _, grp in g.groupby("band", sort=False):
            grp = grp.drop_duplicates("doc_id").sort_values("doc_id")
            ids = grp["doc_id"].to_numpy()
            sets = [np.asarray(s, np.int64).view(np.uint64) for s in grp["shingles"]]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    jac = round(jaccard(sets[i], sets[j]), 6)
                    if jac >= JACCARD_THRESHOLD:
                        rows_a.append(ids[i])
                        rows_b.append(ids[j])
                        rows_j.append(jac)
        return pd.DataFrame({"a": pd.Series(rows_a, dtype=np.int64),
                             "b": pd.Series(rows_b, dtype=np.int64),
                             "jaccard": pd.Series(rows_j, dtype=np.float64)})

    pairs = bucketed_groups(
        ds.map_batches(band_rows, batch_format="pyarrow"), "band", bucket_verify
    )
    # a pair can share several bands; jaccard is identical each time →
    # co-locate by hash(a) and dedup vectorized
    return bucketed_groups(pairs, "a",
                           lambda g: g.drop_duplicates(["a", "b"]))
