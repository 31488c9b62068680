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
    lsh_band_keys,
    minhash_signature,
    simhash64,
    word_shingles,
)
from .queries import _read, _small_arrow

NUM_PERM = 64
BANDS = 16
JACCARD_THRESHOLD = 0.4


def q_simhash(sf_dir: str):
    """SimHash signature per document (near-dup fingerprint family)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"],
            "simhash": pa.array(simhash64(b["text"].to_pylist()).view(np.int64)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def q_minhash_lsh_pairs(sf_dir: str):
    """MinHash+LSH near-dup candidate pairs (canonical a < b, distinct)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def band_rows(b: pa.Table) -> pa.Table:
        ids, keys = [], []
        for did, text in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            sig = minhash_signature(word_shingles(text), NUM_PERM)
            for k in lsh_band_keys(sig, BANDS):
                ids.append(did)
                keys.append(k)
        return pa.table({"doc_id": pa.array(ids, pa.int64()), "band": keys})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["doc_id"]))
        rows = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
        if not rows:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64)})
        return pd.DataFrame(rows, columns=["a", "b"])

    pairs = (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby("band")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    # distinct pairs (a doc pair can share several bands)
    return pairs.groupby(["a", "b"]).count().drop_columns(["count()"])


def q_ngram_jaccard(sf_dir: str):
    """Exact word-3-gram Jaccard over LSH candidate pairs, thresholded —
    the verify stage of the near-dedup pipeline."""
    import ray

    pairs = q_minhash_lsh_pairs(sf_dir).to_pandas()
    docs = _small_arrow(sf_dir, "documents", columns=["doc_id", "text"])
    ref = ray.put(dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())))
    import ray.data

    if len(pairs) == 0:
        return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                             "b": pd.Series(dtype=np.int64),
                             "jaccard": pd.Series(dtype=np.float64)})
    pair_ds = ray.data.from_pandas(pairs)

    class Verify:
        def __init__(self, docs_ref):
            self.docs = ray.get(docs_ref)
            self.cache: dict = {}

        def shingles(self, did):
            if did not in self.cache:
                self.cache[did] = word_shingles(self.docs[did])
            return self.cache[did]

        def __call__(self, b: pa.Table) -> pa.Table:
            a_ids = b["a"].to_pylist()
            b_ids = b["b"].to_pylist()
            js = [jaccard(self.shingles(x), self.shingles(y)) for x, y in zip(a_ids, b_ids)]
            t = pa.table({"a": b["a"], "b": b["b"],
                          "jaccard": pa.array(np.round(js, 6), pa.float64())})
            return t.filter(pa.compute.greater_equal(t["jaccard"], pa.scalar(JACCARD_THRESHOLD)))

    return pair_ds.map_batches(Verify, fn_constructor_args=(ref,),
                               batch_format="pyarrow", concurrency=(1, 4))
