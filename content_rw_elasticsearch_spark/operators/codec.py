"""Delta + varbyte posting-list codec — fully vectorized numpy.

From-scratch replacement for the posting-list compression the reference
delegates to Lucene inside Elasticsearch (SURVEY.md §2.J). Encoding is the
classic VInt scheme (7-bit little-endian groups, continuation bit 0x80),
doc IDs are gap-encoded over the sorted list.

Everything operates on whole numpy arrays (no per-element Python loops;
the only Python-level loops are over the ≤10 byte-positions of a varint),
so these functions are safe to call from Arrow-batched pandas UDFs without
becoming the per-row-Python slow path the input_hint forbids.
"""

from __future__ import annotations

import numpy as np

_U64_1 = np.uint64(1)
_MASK7 = np.uint64(0x7F)


def varbyte_encode_with_lengths(values: np.ndarray) -> "tuple[bytes, np.ndarray]":
    """Encode a non-negative uint64 array as a varbyte stream; also return
    the per-VALUE byte counts. The lengths let a caller that encoded many
    logical lists in ONE pass (the round-5 whole-partition encoder,
    segments._encode_groups) slice the stream back into per-list bytes —
    cumsum(lengths) at list boundaries gives the byte offsets."""
    a = np.ascontiguousarray(values, dtype=np.uint64)
    if a.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    nb = np.ones(a.size, dtype=np.int64)
    for j in range(1, 10):  # 64 bits / 7 = at most 10 groups
        nb += (a >= (_U64_1 << np.uint64(7 * j))).astype(np.int64)
    offsets = np.zeros(a.size, dtype=np.int64)
    np.cumsum(nb[:-1], out=offsets[1:])
    out = np.zeros(int(offsets[-1] + nb[-1]), dtype=np.uint8)
    for i in range(int(nb.max())):
        mask = nb > i
        idx = offsets[mask] + i
        byte = ((a[mask] >> np.uint64(7 * i)) & _MASK7).astype(np.uint8)
        cont = (nb[mask] - 1 > i).astype(np.uint8) << 7
        out[idx] = byte | cont
    return out.tobytes(), nb


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a non-negative uint64 array as a varbyte stream."""
    return varbyte_encode_with_lengths(values)[0]


def varbyte_decode(buf: bytes | bytearray | memoryview) -> np.ndarray:
    """Decode a varbyte stream back to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    last = (b & 0x80) == 0  # terminator byte of each value
    n_vals = int(last.sum())
    vid = np.zeros(b.size, dtype=np.int64)
    np.cumsum(last[:-1], out=vid[1:])
    starts = np.flatnonzero(np.concatenate(([True], last[:-1])))
    pos = np.arange(b.size, dtype=np.int64) - starts[vid]
    vals = np.zeros(n_vals, dtype=np.uint64)
    contrib = (b & 0x7F).astype(np.uint64) << (7 * pos).astype(np.uint64)
    np.bitwise_or.at(vals, vid, contrib)
    return vals


def delta_encode(sorted_ids: np.ndarray) -> bytes:
    """Gap-encode a strictly-increasing uint64 array, then varbyte."""
    a = np.ascontiguousarray(sorted_ids, dtype=np.uint64)
    if a.size == 0:
        return b""
    gaps = np.empty(a.size, dtype=np.uint64)
    gaps[0] = a[0]
    np.subtract(a[1:], a[:-1], out=gaps[1:])
    return varbyte_encode(gaps)


def delta_decode(buf: bytes | bytearray | memoryview) -> np.ndarray:
    gaps = varbyte_decode(buf)
    return np.cumsum(gaps, dtype=np.uint64)


def positions_encode_with_lengths(
    flat_positions: np.ndarray, tfs: np.ndarray
) -> "tuple[bytes, np.ndarray]":
    """positions_encode + per-POSITION byte counts (see
    varbyte_encode_with_lengths for why callers want the lengths)."""
    flat = np.ascontiguousarray(flat_positions, dtype=np.uint64)
    if flat.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    prev = np.empty_like(flat)
    prev[0] = 0
    prev[1:] = flat[:-1]
    deltas = flat - prev
    starts = np.zeros(flat.size, dtype=bool)
    starts[np.concatenate(([0], np.cumsum(tfs)[:-1])).astype(np.int64)] = True
    deltas[starts] = flat[starts]
    return varbyte_encode_with_lengths(deltas)


def positions_encode(flat_positions: np.ndarray, tfs: np.ndarray) -> bytes:
    """Encode concatenated per-doc sorted token positions (doc boundaries
    given by tfs): within-doc deltas (first position absolute) + varbyte."""
    return positions_encode_with_lengths(flat_positions, tfs)[0]


def positions_decode(buf: bytes | bytearray | memoryview,
                     tfs: np.ndarray) -> np.ndarray:
    """Inverse of positions_encode → flat ABSOLUTE positions. Vectorized
    reset-at-boundary cumsum: global cumsum C minus, per element, the
    cumsum value just before its doc's first element."""
    deltas = varbyte_decode(buf)
    if deltas.size == 0:
        return deltas
    c = np.cumsum(deltas, dtype=np.uint64)
    starts = np.concatenate(([0], np.cumsum(tfs)[:-1])).astype(np.int64)
    base = np.zeros(len(tfs), dtype=np.uint64)
    base[1:] = c[starts[1:] - 1]
    return c - np.repeat(base, tfs.astype(np.int64))
