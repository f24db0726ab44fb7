"""Front-coding (incremental/prefix) string kernel — DELTA_BYTE_ARRAY
semantics (parquet.thrift:611-614; SURVEY.md §2.3 E6): per string, the
length of the prefix shared with the previous string plus the remaining
suffix. Wins on sorted runs (conv_id-range-sorted chunks).

Both directions are vectorized with the lockstep-frontier pattern:
encode advances one byte-depth per round across all still-matching
string pairs; decode fills byte-depth j for every string whose prefix
reaches j, sourcing from the nearest earlier string whose suffix covers
depth j (prefix sources resolve transitively through a
maximum.accumulate per depth — no per-string Python).

Prefix lengths are capped (_MAX_PREFIX) to bound decode depth.

Layout (little-endian):

    u64 n | u32 plen_blob | FOR(prefix_lens) | u32 slen_blob
    | FOR(suffix_lens) | suffix bytes
"""

from __future__ import annotations

import struct

import numpy as np

from .delta import for_decode, for_encode

__all__ = ["prefix_encode", "prefix_decode"]

_MAX_PREFIX = 128


def _gather_varlen(data: np.ndarray, starts: np.ndarray,
                   lens: np.ndarray) -> np.ndarray:
    """Concatenate data[starts[i] : starts[i]+lens[i]] for all i."""
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, np.uint8)
    offs = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    intra = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], lens)
    return data[np.repeat(starts, lens) + intra]


def prefix_encode(lengths: np.ndarray, data: np.ndarray) -> bytes:
    lengths = np.ascontiguousarray(lengths, dtype=np.int64)
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n = len(lengths)
    off = np.zeros(n + 1, np.int64)
    np.cumsum(lengths, out=off[1:])

    plen = np.zeros(n, np.int64)
    if n > 1:
        cap = np.minimum(
            np.minimum(lengths[1:], lengths[:-1]), _MAX_PREFIX
        )
        act = np.flatnonzero(cap > 0) + 1  # string indices with a pair
        k = 0
        while len(act):
            same = data[off[act] + k] == data[off[act - 1] + k]
            act = act[same]
            plen[act] += 1
            k += 1
            act = act[k < cap[act - 1]]
    slen = lengths - plen
    suffixes = _gather_varlen(data, off[:-1] + plen, slen)

    pb = for_encode(plen)
    sb = for_encode(slen)
    return (
        struct.pack("<QI", n, len(pb)) + pb
        + struct.pack("<I", len(sb)) + sb
        + suffixes.tobytes()
    )


def prefix_decode(buf: bytes | memoryview) -> tuple[np.ndarray, np.ndarray]:
    """Returns (offsets:int64[n+1], data:uint8[...]) — str_decode convention."""
    mv = memoryview(buf)
    n, pb_len = struct.unpack_from("<QI", mv, 0)
    pos = 12
    plen = for_decode(mv[pos : pos + pb_len])
    pos += pb_len
    (sb_len,) = struct.unpack_from("<I", mv, pos)
    pos += 4
    slen = for_decode(mv[pos : pos + sb_len])
    pos += sb_len
    suffixes = np.frombuffer(mv, np.uint8, offset=pos)

    lengths = plen + slen
    out_off = np.zeros(n + 1, np.int64)
    np.cumsum(lengths, out=out_off[1:])
    out = np.empty(int(out_off[-1]), np.uint8)

    # place suffixes
    soff = np.zeros(n + 1, np.int64)
    np.cumsum(slen, out=soff[1:])
    if soff[-1] != len(suffixes):
        raise ValueError("prefix suffix-bytes length mismatch")
    total_s = int(soff[-1])
    if total_s:
        intra = np.arange(total_s, dtype=np.int64) - np.repeat(soff[:-1], slen)
        out[np.repeat(out_off[:-1] + plen, slen) + intra] = suffixes

    # resolve prefix bytes depth by depth
    if n and plen.max() > 0:
        idx = np.arange(n, dtype=np.int64)
        for j in range(int(plen.max())):
            src = np.maximum.accumulate(np.where(plen <= j, idx, -1))
            tgt = np.flatnonzero(plen > j)
            if src[tgt].min() < 0:
                raise ValueError("prefix chain has no resolvable source")
            out[out_off[tgt] + j] = out[out_off[src[tgt]] + j]
    return out_off, out
