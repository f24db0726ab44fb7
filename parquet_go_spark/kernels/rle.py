"""RLE / bit-packed hybrid kernel, vectorized numpy.

Semantics follow Parquet's RLE/bit-packed hybrid (parquet.thrift:591-594,
616-618; the reference's Go ``readRLEBitPackedHybrid``): the stream is a
sequence of *pieces*, each either an RLE run (count × one value) or a
bit-packed literal group. One deliberate generalization vs the Parquet
byte layout: our bit-packed piece carries an explicit value count (not
forced to a multiple of 8), and piece headers are stored contiguously
ahead of the payloads so decode is vectorizable end-to-end.

Stream layout (little-endian):

    u32 n_values | u8 width | u32 n_pieces | u32 header_len
    [ULEB128 piece headers ...]   header = count<<1 (RLE) | count<<1|1 (bit-packed)
    [payloads ...]                RLE: ceil(width/8) bytes; BP: ceil(count*width/8)
"""

from __future__ import annotations

import struct

import numpy as np

from .bitpack import (
    bit_width,
    pack_bits_segmented,
    uleb128_decode_stream,
    uleb128_encode_array,
    unpack_bits_segmented,
)

__all__ = ["rle_encode", "rle_decode"]

_MIN_RLE_RUN = 8  # runs shorter than this go to bit-packed literals


def rle_encode(vals: np.ndarray, width: int | None = None) -> bytes:
    """Encode non-negative ints (as uint64) into the hybrid stream."""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    n = len(v)
    if width is None:
        width = bit_width(int(v.max())) if n else 0
    vbytes = (width + 7) // 8

    if n == 0:
        return struct.pack("<IBII", 0, width, 0, 0)
    if width == 0:
        hdr = uleb128_encode_array(np.array([n << 1], dtype=np.uint64))
        return struct.pack("<IBII", n, 0, 1, len(hdr)) + hdr

    # --- run detection (vectorized) ---
    change = np.flatnonzero(v[1:] != v[:-1])
    starts = np.empty(len(change) + 1, dtype=np.int64)
    starts[0] = 0
    starts[1:] = change + 1
    ends = np.empty_like(starts)
    ends[:-1] = starts[1:]
    ends[-1] = n
    lens = ends - starts
    rle_mask = lens >= _MIN_RLE_RUN

    rle_starts = starts[rle_mask]
    rle_lens = lens[rle_mask]
    rle_vals = v[rle_starts]

    # literal segments = gaps between consecutive RLE runs
    seg_lo = np.empty(len(rle_starts) + 1, dtype=np.int64)
    seg_lo[0] = 0
    seg_lo[1:] = rle_starts + rle_lens
    seg_hi = np.empty_like(seg_lo)
    seg_hi[:-1] = rle_starts
    seg_hi[-1] = n
    keep = seg_hi > seg_lo
    seg_lo, seg_hi = seg_lo[keep], seg_hi[keep]
    seg_lens = seg_hi - seg_lo

    # --- piece ordering: merge by start offset ---
    all_starts = np.concatenate([rle_starts, seg_lo])
    is_bp = np.concatenate(
        [np.zeros(len(rle_starts), bool), np.ones(len(seg_lo), bool)]
    )
    counts = np.concatenate([rle_lens, seg_lens]).astype(np.uint64)
    order = np.argsort(all_starts, kind="stable")
    is_bp, counts = is_bp[order], counts[order]
    piece_src_start = all_starts[order]

    headers = (counts << np.uint64(1)) | is_bp.astype(np.uint64)
    hdr_bytes = uleb128_encode_array(headers)

    # --- payload assembly ---
    pay_lens = np.where(is_bp, (counts * width + 7) // 8, vbytes).astype(np.int64)
    pay_offs = np.zeros(len(pay_lens) + 1, dtype=np.int64)
    np.cumsum(pay_lens, out=pay_offs[1:])
    payload = np.zeros(int(pay_offs[-1]), dtype=np.uint8)

    rle_piece_idx = np.flatnonzero(~is_bp)
    if len(rle_piece_idx):
        vals_le = (
            v[piece_src_start[rle_piece_idx]]
            .astype("<u8")
            .view(np.uint8)
            .reshape(-1, 8)[:, :vbytes]
        )
        pos = pay_offs[rle_piece_idx][:, None] + np.arange(vbytes)
        payload[pos] = vals_le

    bp_idx = np.flatnonzero(is_bp)
    if len(bp_idx):
        bp_counts = counts[bp_idx].astype(np.int64)
        total = int(bp_counts.sum())
        ccum = np.zeros(len(bp_counts) + 1, dtype=np.int64)
        np.cumsum(bp_counts, out=ccum[1:])
        intra = np.arange(total, dtype=np.int64) - np.repeat(ccum[:-1], bp_counts)
        bpv = v[np.repeat(piece_src_start[bp_idx], bp_counts) + intra]
        packed = np.frombuffer(
            pack_bits_segmented(bpv, bp_counts, width), np.uint8
        )
        pb = pay_lens[bp_idx]
        pcum = np.zeros(len(pb) + 1, dtype=np.int64)
        np.cumsum(pb, out=pcum[1:])
        tpos = np.repeat(pay_offs[bp_idx], pb) + (
            np.arange(int(pcum[-1]), dtype=np.int64) - np.repeat(pcum[:-1], pb)
        )
        payload[tpos] = packed

    head = struct.pack("<IBII", n, width, len(headers), len(hdr_bytes))
    return head + hdr_bytes + payload.tobytes()


def rle_decode(buf: bytes | memoryview) -> np.ndarray:
    """Decode the hybrid stream back to a uint64 array."""
    n, width, n_pieces, hdr_len = struct.unpack_from("<IBII", buf, 0)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    base = 13
    headers = uleb128_decode_stream(
        np.frombuffer(buf, np.uint8, count=hdr_len, offset=base)
    )
    if len(headers) != n_pieces:
        raise ValueError("piece header count mismatch")
    payload = np.frombuffer(buf, np.uint8, offset=base + hdr_len)
    vbytes = (width + 7) // 8

    is_bp = (headers & np.uint64(1)).astype(bool)
    counts = (headers >> np.uint64(1)).astype(np.int64)
    pay_lens = np.where(is_bp, (counts * width + 7) // 8, vbytes)
    pay_offs = np.zeros(n_pieces + 1, dtype=np.int64)
    np.cumsum(pay_lens, out=pay_offs[1:])
    out_offs = np.zeros(n_pieces + 1, dtype=np.int64)
    np.cumsum(counts, out=out_offs[1:])
    if out_offs[-1] != n:
        raise ValueError("value count mismatch")

    out = np.empty(n, dtype=np.uint64)

    rle_idx = np.flatnonzero(~is_bp)
    if len(rle_idx):
        raw = np.zeros((len(rle_idx), 8), dtype=np.uint8)
        raw[:, :vbytes] = payload[pay_offs[rle_idx][:, None] + np.arange(vbytes)]
        rvals = raw.view("<u8").ravel()
        rcounts = counts[rle_idx]
        total = int(rcounts.sum())
        intra = np.arange(total) - np.repeat(
            np.cumsum(rcounts) - rcounts, rcounts
        )
        slots = np.repeat(out_offs[rle_idx], rcounts) + intra
        out[slots] = np.repeat(rvals, rcounts)

    bp_idx = np.flatnonzero(is_bp)
    if len(bp_idx):
        pb = pay_lens[bp_idx]
        pcum = np.zeros(len(pb) + 1, dtype=np.int64)
        np.cumsum(pb, out=pcum[1:])
        spos = np.repeat(pay_offs[bp_idx], pb) + (
            np.arange(int(pcum[-1]), dtype=np.int64) - np.repeat(pcum[:-1], pb)
        )
        vals = unpack_bits_segmented(payload[spos], counts[bp_idx], width)
        bp_counts = counts[bp_idx]
        total = int(bp_counts.sum())
        ccum = np.zeros(len(bp_counts) + 1, dtype=np.int64)
        np.cumsum(bp_counts, out=ccum[1:])
        intra = np.arange(total, dtype=np.int64) - np.repeat(ccum[:-1], bp_counts)
        out[np.repeat(out_offs[bp_idx], bp_counts) + intra] = vals
    return out
