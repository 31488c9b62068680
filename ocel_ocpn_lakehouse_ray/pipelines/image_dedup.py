"""Image near-deduplication on the perceptual-hash column, and the composed
image → embedding → similarity pipeline.

phash near-dedup (SURVEY.md §2.7 "Near-dedup … band-partition phash →
in-group pairwise check"): split the 64-bit phash into B contiguous bands;
two images within hamming distance d share at least one identical band
whenever d < B (pigeonhole), so banding finds all near-dup candidates with
ONE groupby shuffle of (band_key, image_id, phash) rows — payload bytes never
move.  Candidates are verified exactly (vectorized popcount) inside the
bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

BANDS = 4  # 4 × 16-bit bands → exact for hamming distance <= 3
HAMMING_THRESHOLD = 3


def _popcount64(x: np.ndarray) -> np.ndarray:
    v = x.view(np.uint8).reshape(len(x), 8)
    return np.unpackbits(v, axis=1).sum(axis=1)


def phash_near_dup_pairs(ds, *, bands: int = BANDS, threshold: int = HAMMING_THRESHOLD):
    """ds: Dataset with (image_id, phash) → Dataset of candidate near-dup
    pairs (a < b, distinct) with exact hamming distance <= threshold."""
    shift_bits = 64 // bands

    def band_rows(b: pa.Table) -> pa.Table:
        ph = b["phash"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = b["image_id"].to_pylist()
        out_id, out_band, out_ph = [], [], []
        for k in range(bands):
            band_val = (ph >> np.uint64(k * shift_bits)) & np.uint64((1 << shift_bits) - 1)
            out_id.extend(ids)
            out_band.extend([f"{k}:{int(v)}" for v in band_val])
            out_ph.extend(ph.view(np.int64).tolist())
        return pa.table({
            "image_id": out_id,
            "band": out_band,
            "phash": pa.array(out_ph, pa.int64()),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("image_id").sort_values("image_id")
        n = len(g)
        if n < 2:
            return pd.DataFrame({"a": pd.Series(dtype=object),
                                 "b": pd.Series(dtype=object),
                                 "hamming": pd.Series(dtype=np.int64)})
        ids = g["image_id"].to_numpy()
        ph = g["phash"].to_numpy().view(np.uint64)
        ai, bi = np.triu_indices(n, k=1)
        d = _popcount64(ph[ai] ^ ph[bi])
        keep = d <= threshold
        return pd.DataFrame({"a": ids[ai][keep], "b": ids[bi][keep],
                             "hamming": d[keep].astype(np.int64)})

    pairs = (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby("band")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    # a pair can match in several bands → distinct
    from ray.data.aggregate import Min

    return pairs.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming"))


def image_near_dup_pairs(table, **kw):
    """LakeTable → phash near-dup candidate pairs (columns pruned at read)."""
    return phash_near_dup_pairs(table.to_dataset(columns=["image_id", "phash"]), **kw)


def image_knn(table, *, k: int = 5, n_queries: int = 8, thumb_batch: int = 64):
    """Composed multimodal pipeline: decode → thumbnail embedding (actor
    stage) → brute-force cosine top-k of the first ``n_queries`` images
    against the full corpus.  The embedding matrix of the (small) query set is
    broadcast; the corpus embedding stream never materializes fully."""
    import ray

    from ..stages.multimodal import EmbedImages

    emb = table.to_dataset(columns=["image_id", "bytes", "fmt"]).map_batches(
        EmbedImages, batch_format="pyarrow", batch_size=thumb_batch,
        concurrency=(1, 4),
    ).materialize()  # corpus embeddings: 64 floats/row — tiny vs images

    # deterministic query set: the n lowest image_ids (take() order is not
    # stable under the streaming executor)
    q_ids = [f"img_{i:012d}" for i in range(n_queries)]
    q_set = pa.array(q_ids)
    q_rows = emb.map_batches(
        lambda b: b.filter(pa.compute.is_in(b["image_id"], value_set=q_set)),
        batch_format="pyarrow",
    ).take_all()
    q_rows = sorted(q_rows, key=lambda r: r["image_id"])
    q_ids = [r["image_id"] for r in q_rows]
    q_mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in q_rows])
    q_mat /= np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((q_ids, q_mat))

    def score(b: pa.Table) -> pa.Table:
        ids = b["image_id"].to_pylist()
        flat = b["embedding"].combine_chunks()
        m = np.asarray(flat.values, dtype=np.float64).reshape(len(ids), -1)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        qi, qm = ray.get(ref)
        sims = qm @ m.T
        out_q, out_n, out_s = [], [], []
        for i, qid in enumerate(qi):
            for j in np.argsort(-sims[i])[: k + 1]:
                if ids[j] != qid:
                    out_q.append(qid)
                    out_n.append(ids[j])
                    out_s.append(sims[i][j])
        return pa.table({"query_id": out_q, "neighbor_id": out_n,
                         "sim": pa.array(out_s, pa.float64())})

    partials = score  # block-local candidates; final combine on the driver
    df = emb.map_batches(partials, batch_format="pyarrow").to_pandas()
    df = df.sort_values(["query_id", "sim", "neighbor_id"],
                        ascending=[True, False, True])
    return df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
