"""Delta + frame-of-reference bit-packing kernels.

Semantics per Parquet DELTA_BINARY_PACKED (parquet.thrift:601-604): store
a first value, then bit-packed (delta - min_delta). Our layout is a
single frame (no miniblocks) because one chunk-column is already the
encode unit; arithmetic is wrap-safe mod 2**64 so INT64 extremes
round-trip exactly.

Layouts (little-endian):

    FOR:   u64 n | i64 ref | u8 width | packed (v - ref)
    DELTA: u64 n | i64 first | FOR-body of the n-1 successive diffs
"""

from __future__ import annotations

import struct

import numpy as np

from .bitpack import bit_width, pack_bits, unpack_bits

__all__ = ["for_encode", "for_decode", "delta_encode", "delta_decode"]


def _to_u64(v: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(v, dtype=np.int64).view(np.uint64)


def for_encode(vals: np.ndarray) -> bytes:
    """Frame-of-reference encode int64 values (wrap-safe)."""
    v = np.ascontiguousarray(vals, dtype=np.int64)
    n = len(v)
    if n == 0:
        return struct.pack("<QqB", 0, 0, 0)
    ref = int(v.min())
    # wrap-safe subtraction in uint64 domain
    shifted = _to_u64(v) - np.int64(ref).astype(np.uint64)
    width = bit_width(int(shifted.max()))
    return struct.pack("<QqB", n, ref, width) + pack_bits(shifted, width)


def for_decode(buf: bytes | memoryview) -> np.ndarray:
    n, ref, width = struct.unpack_from("<QqB", buf, 0)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    shifted = unpack_bits(np.frombuffer(buf, np.uint8, offset=17), n, width)
    return (shifted + np.int64(ref).astype(np.uint64)).view(np.int64)


def delta_encode(vals: np.ndarray) -> bytes:
    """Delta encode int64 values: first value + FOR over successive diffs."""
    v = np.ascontiguousarray(vals, dtype=np.int64)
    n = len(v)
    if n == 0:
        return struct.pack("<Qq", 0, 0)
    u = v.view(np.uint64)
    diffs = (u[1:] - u[:-1]).view(np.int64)  # wrap-safe
    return struct.pack("<Qq", n, int(v[0])) + for_encode(diffs)


def delta_decode(buf: bytes | memoryview) -> np.ndarray:
    n, first = struct.unpack_from("<Qq", buf, 0)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    diffs = for_decode(memoryview(buf)[16:])
    out = np.empty(n, dtype=np.uint64)
    out[0] = np.int64(first).view(np.uint64)
    if n > 1:
        out[1:] = out[0] + np.cumsum(diffs.view(np.uint64))
    return out.view(np.int64)
