"""Vectorized 64-bit hash mixing (splitmix64) used for deterministic synthesis,
content-addressed fragment naming, shuffle-partition assignment, and salting.

splitmix64 is the public-domain finalizer from Steele et al. / Vigna
(xorshift-derived generators); constants are the standard published ones.
"""

from __future__ import annotations

import hashlib

import numpy as np

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray | int) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 input (wraps mod 2^64)."""
    with np.errstate(over="ignore"):
        z = np.asarray(x, dtype=np.uint64) + _C1
        z = (z ^ (z >> np.uint64(30))) * _C2
        z = (z ^ (z >> np.uint64(27))) * _C3
        return z ^ (z >> np.uint64(31))


def mix2(a: np.ndarray | int, b: np.ndarray | int) -> np.ndarray:
    """Mix two uint64 streams into one (order-sensitive)."""
    return splitmix64(splitmix64(a) ^ np.asarray(b, dtype=np.uint64))


def hash_strings(values, seed: int = 0) -> np.ndarray:
    """Deterministic 64-bit hash of an iterable of strings (FNV-1a, vectorizable
    enough for partition assignment of modest batches; heavy paths hash int keys)."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        h = hashlib.blake2b(v.encode("utf-8"), digest_size=8, key=seed.to_bytes(8, "little"))
        out[i] = int.from_bytes(h.digest(), "little")
    return out


def content_address(*parts: str) -> str:
    """Stable short hex id for fragment file naming: identical inputs on a retried
    task produce the identical file name (idempotent writes, SURVEY.md §4)."""
    h = hashlib.sha1("\x1f".join(parts).encode("utf-8")).hexdigest()
    return h[:20]
