"""Unit tests for the pure kernels: PNG codec, Morton/Hilbert keys, hashing.

FIXTURES.md F4 known-answer vectors + the defining Hilbert properties
(bijection, unit-step adjacency) + codec round-trip/PSNR invariants.
"""

import numpy as np
import pytest

from ocel_ocpn_lakehouse_ray.functions.codec import (
    LOSSY_Q,
    decode_png,
    encode_image,
    encode_png,
    psnr,
    quantize_lossy,
)
from ocel_ocpn_lakehouse_ray.functions.hashing import content_address, mix2, splitmix64
from ocel_ocpn_lakehouse_ray.functions.zorder import (
    hilbert_index,
    hilbert_key,
    hilbert_point,
    morton3,
    salted_key,
    zorder_key,
)


# ------------------------------------------------------------------- codec

def test_png_roundtrip_lossless():
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (5, 3), (48, 64), (128, 128)]:
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert (decode_png(encode_png(arr)) == arr).all()


def test_png_decode_filters_1_and_2():
    # hand-build filtered scanlines (Sub + Up) and verify reconstruction
    import struct
    import zlib

    from ocel_ocpn_lakehouse_ray.functions.codec import PNG_SIG, _chunk

    arr = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3) * 7 % 256
    # row 0: filter 1 (Sub), row 1: filter 2 (Up)
    r0 = arr[0].reshape(-1).astype(np.int32)
    f0 = np.concatenate([[r0[i] if i < 3 else (r0[i] - r0[i - 3]) % 256 for i in range(9)]])
    r1 = arr[1].reshape(-1).astype(np.int32)
    f1 = (r1 - r0) % 256
    raw = bytes([1]) + bytes(f0.astype(np.uint8)) + bytes([2]) + bytes(f1.astype(np.uint8))
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 2, 0, 0, 0)
    data = PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    assert (decode_png(data) == arr).all()


def test_lossy_psnr_at_least_40db():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    q = quantize_lossy(arr)
    assert psnr(arr, q) >= 40.0
    # lossy encode is idempotent: decoding + re-encoding loses nothing further
    assert (quantize_lossy(q) == q).all()
    blob = encode_image(arr, "jpeg")
    assert (decode_png(blob) == q).all()


def test_psnr_identical_is_inf():
    a = np.zeros((4, 4, 3), np.uint8)
    assert psnr(a, a) == float("inf")


# ------------------------------------------------------------------- morton

def _ref_morton(a, b, c):
    out = 0
    for i in range(21):
        out |= ((a >> i) & 1) << (3 * i) | ((b >> i) & 1) << (3 * i + 1) | ((c >> i) & 1) << (3 * i + 2)
    return out


def test_morton_known_vectors():
    # FIXTURES.md F4: interleave(a=0b101, b=0b011, c=0b110)
    got = int(morton3(np.array([0b101], np.uint64), np.array([0b011], np.uint64), np.array([0b110], np.uint64))[0])
    assert got == _ref_morton(0b101, 0b011, 0b110)
    rng = np.random.default_rng(1)
    a, b, c = (rng.integers(0, 1 << 21, 64).astype(np.uint64) for _ in range(3))
    got = morton3(a, b, c)
    for i in range(64):
        assert int(got[i]) == _ref_morton(int(a[i]), int(b[i]), int(c[i]))


def test_morton_monotone_in_each_dim():
    # growing one dimension (others fixed) never decreases the key
    base = np.arange(0, 1 << 10, dtype=np.uint64)
    z = np.zeros_like(base)
    k = morton3(base, z, z)
    assert (np.diff(k.astype(np.int64)) > 0).all()


# ------------------------------------------------------------------- hilbert

@pytest.mark.parametrize("ndims,bits", [(2, 2), (2, 4), (3, 3)])
def test_hilbert_bijection_and_adjacency(ndims, bits):
    n = 1 << (ndims * bits)
    idx = np.arange(n, dtype=np.uint64)
    pts = hilbert_point(idx, bits, ndims)
    # round-trip
    assert (hilbert_index(pts, bits) == idx).all()
    # bijection: all points distinct and within the cube
    assert (pts < (1 << bits)).all()
    flat = pts[:, 0]
    for d in range(1, ndims):
        flat = flat * np.uint64(1 << bits) + pts[:, d]
    assert len(np.unique(flat)) == n
    # defining Hilbert property: consecutive indices are grid neighbors
    step = np.abs(pts[1:].astype(np.int64) - pts[:-1].astype(np.int64)).sum(axis=1)
    assert (step == 1).all()


def test_cluster_keys_48bit_and_salt():
    ph = np.array([123456789012345, -987654321, 0], np.int64)
    w = np.array([64, 128, 32], np.int32)
    h = np.array([32, 48, 128], np.int32)
    for fn in (zorder_key, hilbert_key):
        k = fn(ph, w, h)
        assert k.dtype == np.uint64
        assert (k < (1 << 48)).all()
        s = salted_key(k, np.array([1, 2, 3], np.uint64))
        # salting preserves order of distinct keys
        order = np.argsort(k, kind="stable")
        assert (np.argsort(s, kind="stable") == order).all() or len(np.unique(k)) < 3


def test_identical_inputs_identical_keys():
    ph = np.full(10, 42, np.int64)
    w = np.full(10, 64, np.int32)
    h = np.full(10, 64, np.int32)
    assert len(np.unique(zorder_key(ph, w, h))) == 1
    assert len(np.unique(hilbert_key(ph, w, h))) == 1


# ------------------------------------------------------------------- hashing

def test_splitmix_deterministic_and_mixing():
    x = np.arange(1000, dtype=np.uint64)
    a, b = splitmix64(x), splitmix64(x)
    assert (a == b).all()
    assert len(np.unique(a)) == 1000
    assert (mix2(1, x) != mix2(2, x)).all()


def test_content_address_stable():
    assert content_address("job", "p1", "0") == content_address("job", "p1", "0")
    assert content_address("job", "p1", "0") != content_address("job", "p1", "1")


# ---------------------------------------- mergeable quantile sketch (r3)


def test_sketch_quantiles_high_cardinality_bounded_memory():
    """VERDICT r2 #3: a high-cardinality double column (every value distinct)
    must complete with O(k) driver memory and land within ~0.5% rank error
    of the exact quantiles (the exact histogram path would hold all 200k
    distinct values on the driver)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from ocel_ocpn_lakehouse_ray.pipelines.queries import (
        _compress_summary,
        sketch_quantiles_distributed,
    )

    rng = np.random.default_rng(3)
    vals = rng.lognormal(mean=2.0, sigma=1.5, size=200_000)  # heavy tail
    assert len(np.unique(vals)) == len(vals)
    ds = ray.data.from_arrow(pa.table({"x": vals})).repartition(16)

    k = 2048
    got = sketch_quantiles_distributed(ds, "x", [0.5, 0.9, 0.99], k=k)
    srt = np.sort(vals)
    for g, q in zip(got, [0.5, 0.9, 0.99]):
        # rank error, not value error: find the rank of the sketch answer
        rank = np.searchsorted(srt, g) / len(srt)
        assert abs(rank - q) < 0.005, f"q={q}: rank {rank:.4f}"

    # the compression primitive honors its size bound (driver holds <= 2k
    # centroids between folds)
    v, w = _compress_summary(vals, np.ones(len(vals)), k)
    assert len(v) == k and np.isclose(w.sum(), len(vals))


def test_sketch_quantiles_exact_on_small_input():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from ocel_ocpn_lakehouse_ray.pipelines.queries import (
        sketch_quantiles_distributed,
    )

    vals = np.arange(100, dtype=np.float64)
    ds = ray.data.from_arrow(pa.table({"x": vals}))
    [p50] = sketch_quantiles_distributed(ds, "x", [0.5], k=4096)
    assert abs(p50 - 50.0) <= 1.0  # no compression happened; nearest rank
