"""Bit-packing + ULEB128 varint kernels, vectorized numpy.

Semantics: fixed-width LSB-first bit packing as used by Parquet's
RLE/bit-packed hybrid and DELTA_BINARY_PACKED encodings
(parquet.thrift:591-604 — the reference decodes/encodes these in its
Go ``decode.go``/``encode.go``; we re-express them as whole-array numpy
transforms, never per-value Python).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "bit_width",
    "pack_bits",
    "unpack_bits",
    "pack_bits_segmented",
    "unpack_bits_segmented",
    "uleb128_encode_array",
    "uleb128_decode_stream",
]


def bit_width(max_val: int) -> int:
    """Bits needed to represent ``max_val`` (>=0). bit_width(0) == 0."""
    if max_val < 0:
        raise ValueError("bit_width requires a non-negative value")
    return int(max_val).bit_length()


def pack_bits(vals: np.ndarray, width: int) -> bytes:
    """Pack uint64 values (< 2**width) into a LSB-first bitstream.

    Output is padded with zero bits to a whole number of bytes.
    """
    n = len(vals)
    if width == 0 or n == 0:
        return b""
    if width < 0 or width > 64:
        raise ValueError(f"width out of range: {width}")
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    # (n, width) bit matrix, LSB first per value; built column-by-column to
    # keep peak memory at n*width bytes.
    bits = np.empty((n, width), dtype=np.uint8)
    for j in range(width):
        bits[:, j] = (v >> np.uint64(j)).astype(np.uint8) & 1
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def unpack_bits(buf: bytes | np.ndarray, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`; returns uint64 array of length ``n``."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    nbits = n * width
    bits = np.unpackbits(raw, count=nbits, bitorder="little").reshape(n, width)
    out = np.zeros(n, dtype=np.uint64)
    for j in range(width):
        out |= bits[:, j].astype(np.uint64) << np.uint64(j)
    return out


def pack_bits_segmented(vals: np.ndarray, counts: np.ndarray,
                        width: int) -> bytes:
    """Pack values belonging to consecutive pieces, each piece padded to
    a whole byte, in ONE vectorized pass (scatter into a global bit
    buffer, one packbits) — replaces a per-piece pack_bits loop whose
    Python overhead dominates when pieces are small/many."""
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    n = len(vals)
    if width == 0 or n == 0:
        return b""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    pay_bytes = (counts * width + 7) // 8
    byte_off = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(pay_bytes, out=byte_off[1:])
    ccum = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=ccum[1:])
    idx_in = np.arange(n, dtype=np.int64) - np.repeat(ccum[:-1], counts)
    bitstart = (np.repeat(byte_off[:-1], counts) * 8 + idx_in * width)
    bits = np.empty((n, width), dtype=np.uint8)
    for j in range(width):
        bits[:, j] = (v >> np.uint64(j)).astype(np.uint8) & 1
    bitbuf = np.zeros(int(byte_off[-1]) * 8, dtype=np.uint8)
    bitbuf[(bitstart[:, None] + np.arange(width)).ravel()] = bits.ravel()
    return np.packbits(bitbuf, bitorder="little").tobytes()


def unpack_bits_segmented(buf: np.ndarray, counts: np.ndarray,
                          width: int) -> np.ndarray:
    """Inverse of :func:`pack_bits_segmented`: ``buf`` holds the
    concatenated per-piece byte-padded streams."""
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    n = int(counts.sum())
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    raw = buf if isinstance(buf, np.ndarray) else np.frombuffer(buf, np.uint8)
    bits = np.unpackbits(raw, bitorder="little")
    pay_bytes = (counts * width + 7) // 8
    byte_off = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(pay_bytes, out=byte_off[1:])
    ccum = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=ccum[1:])
    idx_in = np.arange(n, dtype=np.int64) - np.repeat(ccum[:-1], counts)
    bitstart = (np.repeat(byte_off[:-1], counts) * 8 + idx_in * width)
    out = np.zeros(n, dtype=np.uint64)
    for j in range(width):
        out |= bits[bitstart + j].astype(np.uint64) << np.uint64(j)
    return out


def uleb128_encode_array(vals: np.ndarray) -> bytes:
    """Encode an array of uint64 as concatenated ULEB128 varints, vectorized."""
    n = len(vals)
    if n == 0:
        return b""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    # bytes needed per value: ceil(bitlen/7), min 1
    nb = np.ones(n, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nb += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    maxb = int(nb.max())
    groups = np.empty((n, maxb), dtype=np.uint8)
    for k in range(maxb):
        groups[:, k] = (v >> np.uint64(7 * k)).astype(np.uint8) & 0x7F
    col = np.arange(maxb)
    keep = col[None, :] < nb[:, None]
    cont = col[None, :] < (nb - 1)[:, None]
    groups[cont] |= 0x80
    return groups[keep].tobytes()


def uleb128_decode_stream(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode a stream of back-to-back ULEB128 varints, vectorized.

    The whole buffer must consist of varints (no trailing payload).
    """
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if len(b) == 0:
        return np.zeros(0, dtype=np.uint64)
    ends = np.flatnonzero((b & 0x80) == 0)
    if len(ends) == 0 or ends[-1] != len(b) - 1:
        raise ValueError("truncated varint stream")
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    if int(lens.max()) > 10:
        raise ValueError("varint longer than 10 bytes")
    pos_in = np.arange(len(b)) - np.repeat(starts, lens)
    vals7 = (b & 0x7F).astype(np.uint64) << (np.uint64(7) * pos_in.astype(np.uint64))
    return np.add.reduceat(vals7, starts)
