"""Patched frame-of-reference (PFOR) kernel.

Classic PFOR (Zukowski et al., "Super-Scalar RAM-CPU Cache
Compression" — public literature, PAPERS.md): pick a bit width that
fits most values; the few outliers ("exceptions", e.g. the cross-
conversation timestamp jumps inside a sorted chunk) are stored
separately as (position, value) side streams. Width is chosen by
exact cost minimization over the value distribution (one sort +
searchsorted, vectorized).

Layout (little-endian):

    u64 n | i64 ref | u8 width | u32 n_exc
    | u32 pos_blob_len | FOR(exception positions)
    | u32 val_blob_len | FOR(exception shifted-values)
    | bit-packed clipped values (exceptions packed as 0)
"""

from __future__ import annotations

import struct

import numpy as np

from .bitpack import bit_width, pack_bits, unpack_bits
from .delta import for_decode, for_encode

__all__ = ["pfor_encode", "pfor_decode"]


_EXC_COST = 9  # ≈ bytes per (position, value) exception pair, FOR-coded


def _best_window(v: np.ndarray) -> tuple[int, int]:
    """(width, ref): the 2**width window over the value distribution
    minimizing n*w/8 packed bytes + exceptions·_EXC_COST. Outliers can
    sit on BOTH sides of the bulk (e.g. negative cross-conversation
    timestamp jumps), so the frame anchor is the best sliding-window
    position over the sorted values, not the minimum."""
    n = len(v)
    s = np.sort(v)
    su = (s.view(np.uint64) - s.view(np.uint64)[0])  # wrap-safe offsets
    span = int(su[-1])
    full_w = bit_width(span) if span else 0
    if full_w == 0:
        return 0, int(s[0])
    # all candidate widths in ONE searchsorted (W×n keys): per width,
    # best anchor = the sliding window covering the most values
    ws = np.arange(full_w, dtype=np.uint64)
    windows = np.uint64(1) << ws
    hi = su[None, :] + windows[:, None]
    hi[hi < su[None, :]] = np.uint64(0xFFFFFFFFFFFFFFFF)  # saturate wrap
    cover = (
        np.searchsorted(su, hi.ravel(), side="left").reshape(full_w, n)
        - np.arange(n)[None, :]
    )
    anchor = cover.argmax(axis=1)
    n_exc = n - cover[np.arange(full_w), anchor]
    costs = n * np.arange(full_w) / 8 + n_exc * _EXC_COST
    j = int(costs.argmin())
    if costs[j] < n * full_w / 8:
        return j, int(s[anchor[j]])
    return full_w, int(s[0])


def pfor_encode(vals: np.ndarray) -> bytes:
    v = np.ascontiguousarray(vals, dtype=np.int64)
    n = len(v)
    if n == 0:
        return struct.pack("<QqBI", 0, 0, 0, 0)
    if n > 1 << 12:  # width/anchor selection on a stride sample
        # ~4k values pin the width/anchor choice as well as the full
        # distribution (exceptions are still detected exactly below);
        # the W×n searchsorted in _best_window is quadratic-ish in
        # sample size and was ~10% of a whole chunk encode at 12.8k
        w, ref = _best_window(v[:: max(1, n // (1 << 12))])
    else:
        w, ref = _best_window(v)
    shifted = v.view(np.uint64) - np.int64(ref).astype(np.uint64)
    if w >= 64:
        exc_mask = np.zeros(n, bool)
    elif w == 0:
        exc_mask = shifted != 0
    else:
        exc_mask = shifted >= (np.uint64(1) << np.uint64(w))
    exc_pos = np.flatnonzero(exc_mask).astype(np.int64)
    exc_vals = shifted[exc_pos].view(np.int64)
    clipped = np.where(exc_mask, np.uint64(0), shifted)
    pos_blob = for_encode(exc_pos)
    val_blob = for_encode(exc_vals)
    return (
        struct.pack("<QqBI", n, ref, w, len(exc_pos))
        + struct.pack("<I", len(pos_blob)) + pos_blob
        + struct.pack("<I", len(val_blob)) + val_blob
        + pack_bits(clipped, w)
    )


def pfor_decode(buf: bytes | memoryview) -> np.ndarray:
    mv = memoryview(buf)
    n, ref, w, n_exc = struct.unpack_from("<QqBI", mv, 0)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    off = 21
    (pos_len,) = struct.unpack_from("<I", mv, off)
    off += 4
    exc_pos = for_decode(mv[off : off + pos_len])
    off += pos_len
    (val_len,) = struct.unpack_from("<I", mv, off)
    off += 4
    exc_vals = for_decode(mv[off : off + val_len])
    off += val_len
    shifted = unpack_bits(np.frombuffer(mv, np.uint8, offset=off), n, w)
    if n_exc:
        shifted[exc_pos] = exc_vals.view(np.uint64)
    return (shifted + np.int64(ref).astype(np.uint64)).view(np.int64)
