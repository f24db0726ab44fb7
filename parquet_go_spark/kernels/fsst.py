"""FSST string compression kernel, pure-numpy vectorized.

FSST (Fast Static Symbol Table; Boncz/Neumann/Leis, VLDB 2020 — public
literature, see PAPERS.md) is NOT part of Parquet or the reference
(SURVEY.md §2.3 E8 row "FSST"); BASELINE.json's north_star mandates it
for the high-cardinality ``text`` column, where the Parquet baseline's
dictionary falls back to PLAIN (BASELINE.md: text = 86% of file size).

Model: a static table of ≤255 symbols; code byte 255 is an escape (next
stream byte is a literal). Encode replaces the greedy longest-match
symbol at each position with its 1-byte code. Decode is a context-free
table lookup — trivially vectorizable and branch-free.

This implementation EXTENDS the paper's 8-byte symbol cap to 16 bytes
("FSST-16"): transcript/boilerplate text repeats much longer substrings
than 8 bytes, so longer symbols raise the compression ratio AND the
encode throughput at once (the greedy parse emits ~40% fewer units, and
matching cost is per-unit). The blob layout is unchanged — symbol
lengths are explicit, so the decoder is length-generic.

Everything on the bulk path is numpy-vectorized ("no per-row Python"
per input_hint); the inherently sequential greedy parse runs as a
lockstep frontier across strings (one numpy round matches every
still-unfinished string at once). Training runs on a ≤16 KiB sample
where plain-Python candidate counting is faster than any vectorized
formulation and is explicitly off the hot path.

Strings are encoded as ONE concatenated byte buffer (original lengths
stored separately, frame-of-reference bit-packed): symbol matches may
cross string boundaries, which is harmless because decode is
context-free and the buffer is re-split by the stored lengths.

Blob layout (little-endian):

    u8 version=1 | u8 n_symbols | u8 sym_len[n_symbols] | symbol bytes
    u64 n_strings | u32 len_blob_len | FOR(lengths)
    u64 raw_data_len | u64 enc_len | encoded stream
"""

from __future__ import annotations

import struct

import numpy as np

from . import native
from .delta import for_decode, for_encode

__all__ = ["fsst_train", "fsst_encode", "fsst_decode"]

_MAX_SYMBOLS = 255  # code 255 reserved for escape
_MAX_SYM = 16       # symbol length cap (FSST-16 extension; paper uses 8)
_KEY = 8            # window-key width: symbols compare as ≤2 u64 words
_ESCAPE = 255
_GENERATIONS = 5    # symbol length doubles per generation: 1→2→…→16
_SAMPLE_TARGET = 1 << 14  # train on ≤16 KiB sampled across the buffer —
# the reference FSST implementation trains on a ~16 KB sample too; vs
# 64 KiB this is 3.4× faster to train at <1% size cost on transcripts
_ENCODE_BLOCK = 1 << 22   # ≤4 MiB of string data per parse segment
_MAX_PARSE_STR = 1 << 12  # split longer strings into pseudo-strings for
# the lockstep parse: a single multi-MB string would otherwise run the
# frontier at width 1 (one tiny numpy round per unit). Matches simply
# don't cross the split points; decode is context-free so the output
# is still a valid FSST stream for the original lengths.


def _window_keys(data: np.ndarray) -> np.ndarray:
    """key8[i] = uint64 of data[i:i+8], first byte most significant
    (zero-padded past the end; callers mask by position validity).

    One contiguous copy + byteswap view — the 8-pass shift/or loop is
    ~30× slower in numpy (each pass allocates an n×8B temporary)."""
    n = len(data)
    pad = np.zeros(n + _KEY - 1, np.uint8)
    pad[:n] = data
    w = np.lib.stride_tricks.sliding_window_view(pad, _KEY)[:n]
    return np.ascontiguousarray(w).view(">u8").ravel().astype(np.uint64)


_HASH_BITS = 12
_HASH_SIZE = 1 << _HASH_BITS
_HASH_MUL32 = np.uint32(2654435761)  # Knuth multiplicative hash
_HASH_WAYS = 4  # set-associative: same-prefix symbol families are
# common in text ("the ", "the c", …) and 1-way loses ~25% ratio


class _MatchTables:
    """Match acceleration: 1-byte and 2-byte direct-lookup tables (exact,
    one gather each) plus a set-associative hash table on the first 3
    bytes for symbols of length 3–16 — the structure the reference FSST
    C++ encoder uses, widened to _HASH_WAYS slots per bucket and to
    two-word keys for the FSST-16 symbol cap. One multiply-shift hash +
    per-way slot compares replaces the r3 searchsorted + parent-chain
    walk (which profiled at ~50% of encode).

    Within a bucket, kept entries are sorted by length DESCENDING, so
    the probe can early-exit: the first way that matches IS the longest
    match in the bucket, and misses compact geometrically (way 1+ runs
    on shrinking subsets). The table is lossy by design: more than
    _HASH_WAYS same-bucket symbols drop the lowest-gain overflow — a
    dropped symbol just means a shorter match is emitted; the stream
    stays valid, and because training parses with the SAME matcher,
    gains are computed against what encode can actually match."""

    def __init__(self, symbols: list[bytes]):
        self.n_sym = len(symbols)
        self.t1 = np.full(256, _ESCAPE, np.uint8)
        self.t2 = np.full(1 << 16, _ESCAPE, np.uint8)
        size = _HASH_SIZE * _HASH_WAYS
        self.hkey_hi = np.zeros(size, np.uint64)
        self.hmask_hi = np.zeros(size, np.uint64)
        self.hkey_lo = np.zeros(size, np.uint64)  # bytes 8..16, 0 if L≤8
        self.hmask_lo = np.zeros(size, np.uint64)
        # empty-slot sentinel: a length no ``rem`` can satisfy makes the
        # probe's rem>=hl test reject empty slots for free
        self.hlen = np.full(size, 1 << 40, np.int64)
        self.hcode = np.zeros(size, np.uint8)
        self.hocc = np.zeros(_HASH_SIZE, np.uint8)  # entries per bucket
        self.has_long = False
        buckets: dict[int, list[tuple[bytes, int]]] = {}
        for i, s in enumerate(symbols):
            L = len(s)
            if L == 1:
                self.t1[s[0]] = i
            elif L == 2:
                self.t2[int.from_bytes(s, "big")] = i
            else:
                key3 = int.from_bytes(s[:3], "big")
                buckets.setdefault(self._bucket(key3), []).append((s, i))
        for b, items in buckets.items():
            # keep the _HASH_WAYS highest-gain (list order = gain order),
            # probe order = length descending for early-exit longest-match
            kept = sorted(items[:_HASH_WAYS], key=lambda t: -len(t[0]))
            for w, (s, i) in enumerate(kept):
                L = len(s)
                j = b * _HASH_WAYS + w
                hi = s[:_KEY]
                self.hkey_hi[j] = np.uint64(
                    int.from_bytes(hi.ljust(_KEY, b"\0"), "big"))
                self.hmask_hi[j] = np.uint64(
                    ((1 << (8 * len(hi))) - 1) << (8 * (_KEY - len(hi))))
                lo = s[_KEY:]
                if lo:
                    self.hkey_lo[j] = np.uint64(
                        int.from_bytes(lo.ljust(_KEY, b"\0"), "big"))
                    self.hmask_lo[j] = np.uint64(
                        ((1 << (8 * len(lo))) - 1)
                        << (8 * (_KEY - len(lo))))
                self.hlen[j] = L
                self.hcode[j] = i
            self.hocc[b] = len(kept)
            self.has_long = True
        self.max_ways = int(self.hocc.max()) if self.has_long else 0

    @staticmethod
    def _bucket(key3: int) -> int:
        h = (int(key3) * int(_HASH_MUL32)) & 0xFFFFFFFF
        return h >> (32 - _HASH_BITS)

    def long_match(self, k: np.ndarray, k2: np.ndarray, rem: np.ndarray,
                   code: np.ndarray, mlen: np.ndarray) -> None:
        """In-place longest-match update for window keys against the
        3–16-byte symbols (rem-capped): one multiply-shift hash of the
        3-byte prefix, then length-descending way probes with early-exit
        compaction (a hit IS the bucket's longest match; misses continue
        only while the bucket has deeper ways). ``k``/``k2`` are the
        8-byte windows at the position and position+8; L≤8 slots have
        zero lo-masks, so the second-word compare is free for them."""
        if not self.has_long or len(k) == 0:
            return
        key3 = (k >> np.uint64(40)).astype(np.uint32)
        b = ((key3 * _HASH_MUL32)
             >> np.uint32(32 - _HASH_BITS)).astype(np.int64)
        occ = self.hocc[b]
        idx = b * _HASH_WAYS
        sel = None  # None = full set; else indices into the caller arrays
        ks, k2s, rems = k, k2, rem
        for w in range(self.max_ways):
            iw = idx + w
            hl = self.hlen[iw]
            ok = (rems >= hl) & (
                (((ks ^ self.hkey_hi[iw]) & self.hmask_hi[iw])
                 | ((k2s ^ self.hkey_lo[iw]) & self.hmask_lo[iw])) == 0
            )
            hit_idx = np.flatnonzero(ok)
            if len(hit_idx):
                tgt = hit_idx if sel is None else sel[hit_idx]
                code[tgt] = self.hcode[iw[hit_idx]]
                mlen[tgt] = hl[hit_idx]
            cont = np.flatnonzero(~ok & (occ > w + 1))
            if len(cont) == 0:
                return
            sel = cont if sel is None else sel[cont]
            ks, k2s, rems = ks[cont], k2s[cont], rems[cont]
            idx, occ = idx[cont], occ[cont]


def _match(data: np.ndarray, mt: _MatchTables) -> tuple[np.ndarray, np.ndarray]:
    """Exact-matcher-semantics longest symbol match at every position
    (escape if none): returns (code:uint8[n], match_len:int64[n]).
    Training-sample path only — the bulk path is _parse_strings."""
    n = len(data)
    code = np.full(n, _ESCAPE, np.uint8)
    mlen = np.ones(n, np.int64)
    if n == 0 or mt.n_sym == 0:
        return code, mlen
    key8 = _window_keys(data)
    k2 = np.zeros_like(key8)
    if n > _KEY:
        k2[:-_KEY] = key8[_KEY:]

    c1 = mt.t1[data]
    hit1 = c1 != _ESCAPE
    code[hit1] = c1[hit1]

    if n >= 2:
        kk = (key8 >> np.uint64(48)).astype(np.uint32)
        c2 = mt.t2[kk]
        hit2 = c2 != _ESCAPE
        hit2[n - 1 :] = False
        code[hit2] = c2[hit2]
        mlen[hit2] = 2

    rem = n - np.arange(n, dtype=np.int64)
    mt.long_match(key8, k2, rem, code, mlen)
    return code, mlen


def _greedy_chain(mlen: np.ndarray) -> np.ndarray:
    """Positions visited by the greedy left-to-right parse, ascending.

    Pointer doubling: S_k = positions reachable from 0 in < 2**k steps,
    f_k = 2**k-step jump; S_{k+1} = S_k ∪ f_k[S_k], f_{k+1} = f_k[f_k].
    """
    n = len(mlen)
    if n == 0:
        return np.zeros(0, np.int64)
    f = np.minimum(np.arange(n, dtype=np.int64) + mlen, n)
    f = np.append(f, n)  # sink: f[n] = n
    visited = np.zeros(n + 1, bool)
    visited[0] = True
    S = np.array([0], dtype=np.int64)
    parts = [S]
    total = 1
    while True:
        cand = f[np.concatenate(parts) if len(parts) > 1 else parts[0]]
        cand = np.unique(cand)
        new = cand[~visited[cand]]
        if len(new) == 0:
            break
        visited[new] = True
        parts = [np.concatenate(parts), new] if len(parts) > 1 else parts + [new]
        total += len(new)
        if total > n:
            break
        f = f[f]
    chain = np.concatenate(parts)
    return np.sort(chain[chain < n])


def _parse_units(data: np.ndarray, mt: _MatchTables):
    """Greedy parse → (positions, codes, lens) of the emitted units.
    Match-everywhere + pointer-doubling; used on the small training
    sample only (the bulk path is _parse_strings)."""
    code, mlen = _match(data, mt)
    P = _greedy_chain(mlen)
    return P, code[P], mlen[P]


def _match_at(pad: np.ndarray, kview: np.ndarray, p: np.ndarray,
              rem: np.ndarray, mt: _MatchTables) -> tuple[np.ndarray, np.ndarray]:
    """Longest match at the given positions only (frontier lookup).

    ``kview`` is an unaligned big-endian u8-stride uint64 view over
    ``pad`` — one gather replaces the 8-pass shift/or key build."""
    m = len(p)
    code = np.full(m, _ESCAPE, np.uint8)
    mlen = np.ones(m, np.int64)
    if mt.n_sym == 0 or m == 0:
        return code, mlen
    k = kview[p].astype(np.uint64)
    k2 = kview[p + _KEY].astype(np.uint64)
    # hash-probe the 3-16-byte symbols FIRST: ~85-90% of text units are
    # long matches, so the 1-2-byte fallback below runs on the small
    # compacted miss set instead of paying its gathers everywhere
    mt.long_match(k, k2, rem, code, mlen)
    ms = np.flatnonzero(code == _ESCAPE)
    if len(ms):
        km = k[ms]
        c2 = mt.t2[(km >> np.uint64(48)).astype(np.uint32)]
        h2 = (c2 != _ESCAPE) & (rem[ms] >= 2)
        c1 = mt.t1[pad[p[ms]]]
        h1 = (c1 != _ESCAPE) & ~h2
        code[ms[h2]] = c2[h2]
        mlen[ms[h2]] = 2
        code[ms[h1]] = c1[h1]
    return code, mlen


def _parse_strings(data: np.ndarray, offsets: np.ndarray,
                   mt: _MatchTables) -> tuple[np.ndarray, np.ndarray]:
    """Greedy parse of every string in lockstep (SIMD-across-strings).

    One frontier position per still-unfinished string; each round does
    the longest-match lookup for the whole frontier at once and
    advances. Total lookups = number of emitted units (~n/8 with 16-byte
    symbols), and the working set is the frontier (cache-resident), not
    O(n) key/jump arrays — this is what keeps 32 concurrent workers off
    the memory bus. Matches never cross string boundaries (rem-capped)."""
    pos = np.ascontiguousarray(offsets[:-1], dtype=np.int64).copy()
    end = np.ascontiguousarray(offsets[1:], dtype=np.int64)
    n = len(data)
    pad = np.zeros(n + _MAX_SYM, np.uint8)
    pad[:n] = data
    kview = np.ndarray(buffer=pad, dtype=">u8",
                       shape=(len(pad) - _KEY + 1,), strides=(1,))
    act = np.flatnonzero(pos < end)
    pparts: list[np.ndarray] = []
    cparts: list[np.ndarray] = []
    while len(act):
        p = pos[act]
        rem = end[act] - p
        code, mlen = _match_at(pad, kview, p, rem, mt)
        pparts.append(p)
        cparts.append(code)
        nxt = p + mlen
        pos[act] = nxt
        act = act[nxt < end[act]]
    if not pparts:
        return np.zeros(0, np.int64), np.zeros(0, np.uint8)
    P = np.concatenate(pparts)
    C = np.concatenate(cparts)
    o = np.argsort(P, kind="stable")
    return P[o], C[o]


def _parse_emit_native(data: np.ndarray, parse_off: np.ndarray,
                       mt: _MatchTables) -> np.ndarray:
    """Compiled parse+emit (kernels/native.py): the same greedy
    longest-match walk as _parse_strings + _emit in one C pass —
    bit-identical output (tests/test_native.py), ~20x less memory
    traffic, no segmenting needed (the loop is cache-linear)."""
    n = len(data)
    pad = np.zeros(n + _MAX_SYM, np.uint8)
    pad[:n] = data
    offs = np.ascontiguousarray(parse_off, dtype=np.int64)
    out = np.empty(2 * n + 16, np.uint8)
    f = native.ffi
    m = native.lib.pgs_fsst_parse(
        f.cast("uint8_t *", pad.ctypes.data),
        f.cast("int64_t *", offs.ctypes.data),
        len(offs) - 1,
        f.cast("uint8_t *", mt.t1.ctypes.data),
        f.cast("uint8_t *", mt.t2.ctypes.data),
        f.cast("uint64_t *", mt.hkey_hi.ctypes.data),
        f.cast("uint64_t *", mt.hmask_hi.ctypes.data),
        f.cast("uint64_t *", mt.hkey_lo.ctypes.data),
        f.cast("uint64_t *", mt.hmask_lo.ctypes.data),
        f.cast("int64_t *", mt.hlen.ctypes.data),
        f.cast("uint8_t *", mt.hcode.ctypes.data),
        f.cast("uint8_t *", mt.hocc.ctypes.data),
        1 if mt.has_long else 0,
        f.cast("uint8_t *", out.ctypes.data),
    )
    return out[:m]


def _emit(data: np.ndarray, P: np.ndarray, codes: np.ndarray) -> np.ndarray:
    """Build the encoded byte stream from parse units."""
    esc = codes == _ESCAPE
    out_lens = np.where(esc, 2, 1).astype(np.int64)
    offs = np.zeros(len(P) + 1, np.int64)
    np.cumsum(out_lens, out=offs[1:])
    out = np.empty(int(offs[-1]), np.uint8)
    out[offs[:-1]] = codes
    out[offs[:-1][esc] + 1] = data[P[esc]]
    return out


_LEN_MASK = np.zeros(_MAX_SYM + 1, np.uint64)
for _L in range(1, _MAX_SYM + 1):
    _LEN_MASK[_L] = np.uint64(
        (((1 << (8 * min(_L, _KEY))) - 1) << (8 * (_KEY - min(_L, _KEY))))
    )
_LEN_MASK_LO = np.zeros(_MAX_SYM + 1, np.uint64)
for _L in range(_KEY + 1, _MAX_SYM + 1):
    _LEN_MASK_LO[_L] = np.uint64(
        (((1 << (8 * (_L - _KEY))) - 1) << (8 * (2 * _KEY - _L)))
    )
del _L


def fsst_train(data: np.ndarray) -> list[bytes]:
    """Iteratively build the symbol table on a sample (the FSST
    bottom-up generation loop: parse with current table, count unit and
    adjacent-pair gains = count×length, keep the top 255).

    Candidate accounting groups (len, hi-word, lo-word) keys with one
    lexsort — candidates are ≤16 B, so two big-endian u64 windows
    (masked to the candidate length) identify the bytes exactly. This
    runs per CHUNK on the encode hot path (64+ chunks per task), so its
    constant matters: the lexsort is ~4× faster than dict-of-bytes
    counting at the ≤16 KiB sample size."""
    n = len(data)
    if n == 0:
        return []
    if n > _SAMPLE_TARGET:
        # _SAMPLE_TARGET/512 slices of 512 B spread across the buffer
        n_slices = max(1, _SAMPLE_TARGET // 512)
        step = n // n_slices
        starts = np.arange(n_slices, dtype=np.int64) * step
        idx = (starts[:, None] + np.arange(512)).ravel()
        sample = np.ascontiguousarray(data[idx[idx < n]])
    else:
        sample = data
    ns = len(sample)
    pad = np.zeros(ns + 2 * _KEY, np.uint8)
    pad[:ns] = sample
    kview = np.ndarray(buffer=pad, dtype=">u8",
                       shape=(len(pad) - _KEY + 1,), strides=(1,))

    symbols: list[bytes] = []
    for _ in range(_GENERATIONS):
        P, codes, lens = _parse_units(sample, _MatchTables(symbols))
        if len(P) == 0:
            break
        ulen = np.where(codes == _ESCAPE, 1, lens).astype(np.int64)
        cs = [P]
        cl = [ulen]
        if len(P) > 1:  # adjacent-pair merges ≤ 16 B (units are
            plen = ulen[:-1] + ulen[1:]  # contiguous, so pair length
            ok = plen <= _MAX_SYM        # = end[i+1] - start[i])
            cs.append(P[:-1][ok])
            cl.append(plen[ok])
        starts = np.concatenate(cs)
        klens = np.concatenate(cl)
        hi = kview[starts].astype(np.uint64) & _LEN_MASK[klens]
        lo = kview[starts + _KEY].astype(np.uint64) & _LEN_MASK_LO[klens]
        order = np.lexsort((lo, hi, klens))
        sh, sl2, sn = hi[order], lo[order], klens[order]
        first = np.empty(len(sh), bool)
        first[0] = True
        first[1:] = ((sh[1:] != sh[:-1]) | (sl2[1:] != sl2[:-1])
                     | (sn[1:] != sn[:-1]))
        grp = np.flatnonzero(first)
        counts = np.diff(np.append(grp, len(sh)))
        uh, ul, un = sh[grp], sl2[grp], sn[grp]
        gain = counts * un
        # deterministic rank: gain desc, then (len, hi, lo) asc
        top = np.lexsort((ul, uh, un, -gain))[:_MAX_SYMBOLS]
        symbols = [
            (int(uh[i]).to_bytes(_KEY, "big")
             + int(ul[i]).to_bytes(_KEY, "big"))[: int(un[i])]
            for i in top
        ]
    return symbols


# Reuse guard for cross-chunk symbol-table sharing: a cached table is
# kept while the payload ratio it achieves stays within 15% (relative)
# of the ratio measured on the chunk it was trained on; beyond that the
# chunk retrains (one extra parse — the bound on how much a drifting
# corpus can lose to a stale table).
_REUSE_GUARD = 1.15


def fsst_encode(lengths: np.ndarray, data: np.ndarray,
                cache: dict | None = None,
                cache_key: str | None = None) -> bytes:
    """Encode a contiguous string column (lengths + concatenated bytes).

    ``cache`` (per encode TASK, created by the mapInArrow kernel) lets
    consecutive chunks of the same column reuse one trained symbol
    table: training costs ~25% of a chunk encode, and within a task the
    chunks are adjacent ``(conv_id, turn_idx)`` ranges of one column, so
    one table fits them all. Every blob still embeds its own table —
    chunks stay independently decodable — and the cache lives only for
    one task, so output bytes stay deterministic for a given
    partitioning. A ratio guard retrains when the cached table fits a
    chunk >15% worse than the chunk it was trained on."""
    data = np.ascontiguousarray(data, dtype=np.uint8)
    lengths = np.ascontiguousarray(lengths, dtype=np.int64)
    key = ("fsst", cache_key)
    cached = (cache.get(key)
              if cache is not None and cache_key is not None else None)
    if cached is not None:
        symbols, mt, trained_ratio = cached
    else:
        symbols = fsst_train(data)
        mt = _MatchTables(symbols)
        trained_ratio = None
    offsets = np.zeros(len(lengths) + 1, np.int64)
    np.cumsum(lengths, out=offsets[1:])
    # pseudo-split long strings so the lockstep frontier stays wide
    # (decode is context-free: dropping matches across split points
    # keeps the stream valid for the ORIGINAL stored lengths)
    if len(lengths) and int(lengths.max()) > _MAX_PARSE_STR:
        n_sub = np.maximum(-(-lengths // _MAX_PARSE_STR), 1)
        cum = np.zeros(len(n_sub) + 1, np.int64)
        np.cumsum(n_sub, out=cum[1:])
        intra = (np.arange(int(cum[-1]), dtype=np.int64)
                 - np.repeat(cum[:-1], n_sub))
        piece_starts = np.repeat(offsets[:-1], n_sub) + intra * _MAX_PARSE_STR
        parse_off = np.append(piece_starts, offsets[-1])
    else:
        parse_off = offsets
    # Segment by string groups of ≤ _ENCODE_BLOCK bytes: the frontier
    # gathers stay cache-resident however large the chunk is (a 26 MB
    # buffer per worker re-saturates the memory bus at 32-way
    # concurrency). Exact: the parse is per-string anyway.
    def _payload(mt_):
        if native.lib is not None:
            return _parse_emit_native(data, parse_off, mt_)
        parts = []
        n_str = len(parse_off) - 1
        i = 0
        while i < n_str:
            j = int(np.searchsorted(parse_off, parse_off[i] + _ENCODE_BLOCK,
                                    side="left"))
            j = min(max(j, i + 1), n_str)
            seg = data[parse_off[i] : parse_off[j]]
            seg_off = parse_off[i : j + 1] - parse_off[i]
            P, codes = _parse_strings(seg, seg_off, mt_)
            parts.append(_emit(seg, P, codes))
            i = j
        return (np.concatenate(parts) if parts else np.zeros(0, np.uint8))

    enc = _payload(mt)
    ratio = len(enc) / max(len(data), 1)
    if cached is not None and ratio > trained_ratio * _REUSE_GUARD:
        # stale table (corpus drifted past the guard) — retrain here
        symbols = fsst_train(data)
        mt = _MatchTables(symbols)
        enc = _payload(mt)
        ratio = len(enc) / max(len(data), 1)
        cache[key] = (symbols, mt, ratio)
    elif cached is None and cache is not None and cache_key is not None:
        cache[key] = (symbols, mt, ratio)

    len_blob = for_encode(np.ascontiguousarray(lengths, dtype=np.int64))
    sym_lens = bytes(len(s) for s in symbols)
    sym_bytes = b"".join(symbols)
    return (
        struct.pack("<BB", 1, len(symbols))
        + sym_lens
        + sym_bytes
        + struct.pack("<QI", len(lengths), len(len_blob))
        + len_blob
        + struct.pack("<QQ", len(data), len(enc))
        + enc.tobytes()
    )


def fsst_decode(buf: bytes | memoryview) -> tuple[np.ndarray, np.ndarray]:
    """Returns (offsets:int64[n+1], data:uint8[...]) — str_decode convention."""
    mv = memoryview(buf)
    version, n_sym = struct.unpack_from("<BB", mv, 0)
    if version != 1:
        raise ValueError(f"bad fsst blob version {version}")
    off = 2
    sym_len = np.frombuffer(mv, np.uint8, count=n_sym, offset=off).astype(np.int64)
    off += n_sym
    total_sym = int(sym_len.sum())
    sym_flat = np.frombuffer(mv, np.uint8, count=total_sym, offset=off)
    off += total_sym
    sym_off = np.zeros(n_sym + 1, np.int64)
    np.cumsum(sym_len, out=sym_off[1:])

    n_strings, len_blob_len = struct.unpack_from("<QI", mv, off)
    off += 12
    lengths = for_decode(mv[off : off + len_blob_len])
    off += len_blob_len
    raw_len, enc_len = struct.unpack_from("<QQ", mv, off)
    off += 16
    enc = np.frombuffer(mv, np.uint8, count=enc_len, offset=off)

    offsets = np.zeros(n_strings + 1, np.int64)
    np.cumsum(lengths, out=offsets[1:])
    if offsets[-1] != raw_len:
        raise ValueError("fsst length-sum / raw-size mismatch")
    if raw_len == 0:
        return offsets, np.zeros(0, np.uint8)

    if native.lib is not None:
        # compiled expansion (kernels/native.py): sequential
        # code→symbol copy, same validation surface as the numpy path
        sym_pad = np.zeros(total_sym + _MAX_SYM, np.uint8)
        sym_pad[:total_sym] = sym_flat
        sym_len8 = np.ascontiguousarray(sym_len, dtype=np.uint8)
        enc_c = np.ascontiguousarray(enc)
        out = np.empty(raw_len + _MAX_SYM, np.uint8)
        f = native.ffi
        m = native.lib.pgs_fsst_expand(
            f.cast("uint8_t *", enc_c.ctypes.data), len(enc_c),
            f.cast("uint8_t *", sym_pad.ctypes.data),
            f.cast("int64_t *", sym_off.ctypes.data),
            f.cast("uint8_t *", sym_len8.ctypes.data),
            n_sym,
            f.cast("uint8_t *", out.ctypes.data), raw_len,
        )
        if m != raw_len:
            raise ValueError("fsst stream malformed or size mismatch")
        return offsets, out[:raw_len]

    # --- escape resolution: in a maximal run of 255-bytes, even offsets
    # are escapes, each consuming the following byte as a literal ---
    is255 = enc == _ESCAPE
    p255 = np.flatnonzero(is255)
    if len(p255):
        breaks = np.flatnonzero(np.diff(p255) > 1)
        run_start_idx = np.concatenate([[0], breaks + 1])
        run_sizes = np.diff(np.concatenate([run_start_idx, [len(p255)]]))
        within = np.arange(len(p255)) - np.repeat(
            np.arange(len(p255))[run_start_idx], run_sizes
        )
        esc_pos = p255[within % 2 == 0]
        if len(esc_pos) and esc_pos[-1] + 1 >= len(enc):
            raise ValueError("fsst stream ends mid-escape")
        lit_pos = esc_pos + 1
    else:
        esc_pos = lit_pos = np.zeros(0, np.int64)

    is_unit = np.ones(len(enc), bool)
    is_unit[lit_pos] = False
    upos = np.flatnonzero(is_unit)
    ucodes = enc[upos]
    uesc = ucodes == _ESCAPE  # every 255 at a unit position is an escape

    if n_sym == 0:
        if not uesc.all():
            raise ValueError("fsst code byte with empty symbol table")
        safe = np.zeros(len(upos), np.int64)
    else:
        if ((~uesc) & (ucodes >= n_sym)).any():
            raise ValueError("fsst code byte out of table range")
        safe = np.minimum(ucodes, n_sym - 1).astype(np.int64)
    out_lens = np.where(uesc, 1, sym_len[safe] if n_sym else 1).astype(np.int64)
    out_offs = np.zeros(len(upos) + 1, np.int64)
    np.cumsum(out_lens, out=out_offs[1:])
    if out_offs[-1] != raw_len:
        raise ValueError("fsst decoded size mismatch")

    # byte-PLANE expansion: scatter byte k of every code's symbol into
    # out[start+k] for k < symbol length. Same element count as the
    # repeat-gather formulation but with NO raw_len-sized int64 temps
    # (repeat×2 + arange cost ~24 B of memory traffic per output byte;
    # this costs ~5 B) — ~3x faster and far kinder to the shared
    # memory bus under 32-way task concurrency.
    out = np.empty(raw_len, np.uint8)
    starts = out_offs[:-1]
    ne = ~uesc
    if n_sym:
        max_len = int(sym_len.max())
        planes = np.zeros((max_len, n_sym), np.uint8)
        for k in range(max_len):
            has_k = sym_len > k
            planes[k, has_k] = sym_flat[sym_off[:-1][has_k] + k]
        code_ne, st_ne, len_ne = safe[ne], starts[ne], out_lens[ne]
        for k in range(max_len):
            m = len_ne > k
            if not m.any():
                break
            if m.all():
                out[st_ne + k] = planes[k][code_ne]
            else:
                code_ne, st_ne, len_ne = code_ne[m], st_ne[m], len_ne[m]
                out[st_ne + k] = planes[k][code_ne]
    if uesc.any():
        out[starts[uesc]] = enc[upos[uesc] + 1]
    return offsets, out
