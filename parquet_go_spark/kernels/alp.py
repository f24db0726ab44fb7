"""ALP-style lossless float compression (Adaptive Lossless
floating-Point, Afroozeh & Boncz — public literature, PAPERS.md).

Many "double" columns are decimals in disguise (prices, rates,
quantities). If every value satisfies round(v * 10^e) / 10^e == v
bit-exactly for some exponent e, the column is stored as scaled int64s
(which then compress with PFOR/delta far better than raw IEEE bits).
All-or-nothing per chunk: any NaN/Inf/-0.0 or non-decimal value makes
the probe fail and the caller falls back to BYTE_STREAM_SPLIT. The
round-trip is bit-exact by construction — the decoder recomputes
ints / 10^e with the same doubles the encoder verified.

Layout (little-endian):

    u8 exponent | PFOR(scaled int64 values)
"""

from __future__ import annotations

import struct

import numpy as np

from .pfor import pfor_decode, pfor_encode

__all__ = ["alp_probe", "alp_encode", "alp_decode"]

_MAX_EXP = 14  # 10^14 keeps scaled magnitudes comfortably inside 2^53


def alp_probe(vals: np.ndarray) -> int | None:
    """Smallest exponent that represents every value exactly, or None."""
    v = np.ascontiguousarray(vals, dtype=np.float64)
    if len(v) == 0:
        return 0
    if not np.isfinite(v).all() or np.signbit(v[v == 0.0]).any():
        return None
    for e in range(_MAX_EXP + 1):
        scale = 10.0 ** e
        scaled = np.round(v * scale)
        if np.abs(scaled).max() >= 2.0 ** 53:
            return None
        if np.array_equal(scaled / scale, v):
            return e
    return None


def alp_encode(vals: np.ndarray, exponent: int | None = None) -> bytes:
    v = np.ascontiguousarray(vals, dtype=np.float64)
    e = alp_probe(v) if exponent is None else exponent
    if e is None:
        raise ValueError("column is not ALP-representable")
    scaled = np.round(v * (10.0 ** e)).astype(np.int64)
    return struct.pack("<B", e) + pfor_encode(scaled)


def alp_decode(buf: bytes | memoryview) -> np.ndarray:
    mv = memoryview(buf)
    (e,) = struct.unpack_from("<B", mv, 0)
    ints = pfor_decode(mv[1:])
    return ints.astype(np.float64) / (10.0 ** e)
