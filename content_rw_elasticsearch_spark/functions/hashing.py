"""Driver-side XXH64 compatible with Spark's ``xxhash64`` expression.

The engine keys buckets and salts on ``xxhash64`` (JVM-side). The query
driver needs the SAME hash for a handful of terms to do directory-level
bucket pruning without launching a Spark job. This is a from-scratch
implementation of the public XXH64 algorithm (Yann Collet's spec) with
Spark's default seed 42 and Spark's signed-long output convention; parity
with the JVM expression is pinned by tests/test_hashing.py.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of raw bytes → signed 64-bit (Spark convention)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            for _ in range(1):
                v1 = (_rotl((v1 + int.from_bytes(data[i:i + 8], "little") * _P2) & _M, 31) * _P1) & _M
                v2 = (_rotl((v2 + int.from_bytes(data[i + 8:i + 16], "little") * _P2) & _M, 31) * _P1) & _M
                v3 = (_rotl((v3 + int.from_bytes(data[i + 16:i + 24], "little") * _P2) & _M, 31) * _P1) & _M
                v4 = (_rotl((v4 + int.from_bytes(data[i + 24:i + 32], "little") * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = (((h ^ ((_rotl((v * _P2) & _M, 31) * _P1) & _M)) * _P1) + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = (_rotl((int.from_bytes(data[i:i + 8], "little") * _P2) & _M, 31) * _P1) & _M
        h = ((_rotl(h ^ k, 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        h = ((_rotl(h ^ ((int.from_bytes(data[i:i + 4], "little") * _P1) & _M), 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_string(s: str, seed: int = SPARK_SEED) -> int:
    """Spark ``xxhash64(string_col)`` equivalent (UTF-8 bytes)."""
    return xxh64(s.encode("utf-8"), seed)


def xxh64_long(v: int, seed: int = SPARK_SEED) -> int:
    """Spark ``xxhash64(long_col)`` equivalent (8-byte little-endian)."""
    return xxh64((v & _M).to_bytes(8, "little"), seed)


def xxh64_long_np(vals, seed: int = SPARK_SEED):
    """Vectorized ``xxh64_long`` for an int64 numpy array (one 8-byte
    little-endian block per value — the only shape the query fast path
    needs). Parity with xxh64_long / Spark's xxhash64(long_col) is pinned
    by tests/test_hashing.py; uint64 arithmetic wraps modulo 2^64 exactly
    like the scalar implementation's explicit masking."""
    import numpy as np

    with np.errstate(over="ignore"):
        v = np.asarray(vals).astype(np.int64).view(np.uint64)
        p1, p2, p3 = np.uint64(_P1), np.uint64(_P2), np.uint64(_P3)
        p4 = np.uint64(_P4)
        k = v * p2
        k = ((k << np.uint64(31)) | (k >> np.uint64(33))) * p1
        h = np.uint64((seed + _P5 + 8) & _M) ^ k
        h = ((h << np.uint64(27)) | (h >> np.uint64(37))) * p1 + p4
        h ^= h >> np.uint64(33)
        h *= p2
        h ^= h >> np.uint64(29)
        h *= p3
        h ^= h >> np.uint64(32)
        return h.view(np.int64)


def pmod(h: int, n: int) -> int:
    """Spark ``pmod`` on a signed hash."""
    return ((h % n) + n) % n
