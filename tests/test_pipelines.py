"""Pipeline-operator tests: multimodal stages, near-dedup kernels (MinHash
estimate accuracy, LSH recall on seeded near-dups), and the flagship entry()."""

import numpy as np
import pyarrow as pa
import pytest

from ocel_ocpn_lakehouse_ray.functions.text import (
    jaccard,
    lsh_band_keys,
    minhash_signature,
    simhash64,
    hamming64,
    word_shingles,
)
from ocel_ocpn_lakehouse_ray.sources.generator import create_image_table, gen_batch
from ocel_ocpn_lakehouse_ray.stages.multimodal import (
    DecodeAudio,
    DecodeStats,
    EmbedImages,
    ResizeImages,
    decode_stats_pipeline,
)


@pytest.fixture(scope="module")
def small_table(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mm") / "table")
    return create_image_table(root, 60, num_fragments=4)


# -------------------------------------------------------------- multimodal

def test_decode_stats_pipeline(small_table):
    df = decode_stats_pipeline(small_table, concurrency=(1, 2), batch_size=16).to_pandas()
    assert len(df) == 60
    assert set(df.columns) == {"image_id", "mean_r", "mean_g", "mean_b", "n_px"}
    assert df[["mean_r", "mean_g", "mean_b"]].stack().between(0, 255).all()
    # deterministic across runs
    df2 = decode_stats_pipeline(small_table, concurrency=(1, 2), batch_size=16).to_pandas()
    assert df.sort_values("image_id").reset_index(drop=True).equals(
        df2.sort_values("image_id").reset_index(drop=True)
    )


def test_resize_stage(small_table):
    ds = small_table.to_dataset()
    out = ds.map_batches(ResizeImages, fn_constructor_args=(16, 12),
                         batch_format="pyarrow", batch_size=16,
                         concurrency=(1, 2)).take_all()
    assert len(out) == 60
    from ocel_ocpn_lakehouse_ray.functions.codec import decode_image

    arr = decode_image(out[0]["bytes"], out[0]["fmt"])
    assert arr.shape == (12, 16, 3)
    assert out[0]["w"] == 16 and out[0]["h"] == 12


def test_embed_stage(small_table):
    ds = small_table.to_dataset(columns=["image_id", "bytes", "fmt"])
    df = ds.map_batches(EmbedImages, batch_format="pyarrow", batch_size=16,
                        concurrency=(1, 2)).to_pandas()
    assert len(df) == 60
    v = np.asarray(df["embedding"].iloc[0])
    assert v.shape == (64,) and (0 <= v).all() and (v <= 1).all()


def test_audio_stub_contract():
    batch = gen_batch(np.arange(3)).select(["image_id", "bytes"])
    with pytest.raises(NotImplementedError):
        DecodeAudio()(batch)
    out = DecodeAudio(fake=True, n=32)(batch)
    assert out.num_rows == 3
    assert np.asarray(out["samples"][0].as_py()).shape == (32,)
    # deterministic fake
    out2 = DecodeAudio(fake=True, n=32)(batch)
    assert out["samples"].to_pylist() == out2["samples"].to_pylist()


def test_video_frame_sample_stub_contract():
    from ocel_ocpn_lakehouse_ray.functions.codec import decode_png
    from ocel_ocpn_lakehouse_ray.stages.multimodal import SampleVideoFrames

    batch = gen_batch(np.arange(2)).select(["image_id", "bytes"])
    with pytest.raises(NotImplementedError):
        SampleVideoFrames()(batch)
    out = SampleVideoFrames(fake=True, num_frames=3, size=8)(batch)
    assert out.num_rows == 2 * 3  # 1→N frame expansion
    assert out.column_names == ["image_id", "frame_idx", "frame"]
    # frames are real decodable PNGs and the fake is deterministic
    arr = decode_png(out["frame"][0].as_py())
    assert arr.shape == (8, 8, 3)
    out2 = SampleVideoFrames(fake=True, num_frames=3, size=8)(batch)
    assert out["frame"].to_pylist() == out2["frame"].to_pylist()


# -------------------------------------------------------------- dedup kernels

def _doc(words, n=60):
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 10).split()[:n]
    for i, w in words:
        base[i] = w
    return " ".join(base)


def test_minhash_estimates_jaccard():
    a = word_shingles(_doc([]))
    b = word_shingles(_doc([(5, "CHANGED"), (30, "OTHER")]))
    true_j = jaccard(a, b)
    sa, sb = minhash_signature(a, 128), minhash_signature(b, 128)
    est = (sa == sb).mean()
    assert abs(est - true_j) < 0.15
    assert 0.5 < true_j < 1.0


def test_lsh_catches_near_dups_and_skips_far():
    near_a, near_b = _doc([]), _doc([(10, "x")])
    far = " ".join(f"tok{i}" for i in range(60))
    sigs = {k: minhash_signature(word_shingles(t), 64)
            for k, t in [("a", near_a), ("b", near_b), ("f", far)]}
    bands = {k: set(lsh_band_keys(s, 16)) for k, s in sigs.items()}
    assert bands["a"] & bands["b"], "near-dup pair missed by LSH"
    assert not (bands["a"] & bands["f"]), "far pair bucketed together"


def test_simhash_hamming_tracks_similarity():
    h = simhash64([_doc([]), _doc([(10, "x")]), " ".join(f"tok{i}" for i in range(60))])
    near = hamming64(h[0:1], h[1:2])[0]
    far = hamming64(h[0:1], h[2:3])[0]
    assert near < far


# -------------------------------------------------------------- entry()

def test_entry_flagship_runs():
    import __ray_entry__ as e

    ds = e.entry()
    n = ds.count()
    assert n == 420  # 400 base − 0 lost + 20 inserts
    assert set(ds.schema().names) == {"image_id", "caption", "w", "h", "fmt", "phash"}


def test_minhash_batch_matches_per_doc():
    """minhash_signatures (vectorized segment-min) must produce EXACTLY the
    per-doc minhash_signature output, including empty docs, across chunk
    boundaries (tiny chunk_elems forces multiple folds)."""
    from ocel_ocpn_lakehouse_ray.functions.text import (
        minhash_signature,
        minhash_signatures,
        word_shingle_sets,
    )

    texts = [_doc([]), "", _doc([(5, "x")]), "one two",
             " ".join(f"tok{i}" for i in range(200))]
    sets = word_shingle_sets(texts)
    batch = minhash_signatures(sets, 64)
    for i, s in enumerate(sets):
        assert (batch[i] == minhash_signature(s, 64)).all(), i


def test_lsh_band_keys_batch_buckets_like_string_version():
    from ocel_ocpn_lakehouse_ray.functions.text import (
        lsh_band_keys,
        lsh_band_keys_batch,
        minhash_signatures,
        word_shingle_sets,
    )

    near_a, near_b = _doc([]), _doc([(10, "x")])
    far = " ".join(f"tok{i}" for i in range(60))
    sets = word_shingle_sets([near_a, near_b, far])
    sigs = minhash_signatures(sets, 64)
    keys = lsh_band_keys_batch(sigs, 16)
    assert keys.shape == (3, 16)
    # same-band-position chunk equality must match the string keys exactly
    import numpy as np

    str_keys = [lsh_band_keys(sigs[i], 16) for i in range(3)]
    for i in range(3):
        for j in range(3):
            int_shared = (keys[i] == keys[j])
            str_shared = np.array([a == b for a, b in
                                   zip(str_keys[i], str_keys[j])])
            assert (int_shared == str_shared).all(), (i, j)
    assert set(keys[0]) & set(keys[1]), "near-dup pair missed"
    assert not set(keys[0]) & set(keys[2]), "far pair bucketed together"
