"""PLAIN + byte-stream-split + string-layout kernels.

PLAIN semantics per parquet.thrift:567-576 (little-endian fixed width;
BOOLEAN bit-packed LSB-first). Strings use the DELTA_LENGTH_BYTE_ARRAY
idea (parquet.thrift:606-609): all lengths first (frame-of-reference
bit-packed), then one contiguous UTF-8 buffer — the layout FSST/zstd
compresses best. BYTE_STREAM_SPLIT per parquet.thrift:620-630.
"""

from __future__ import annotations

import struct

import numpy as np

from .delta import for_decode, for_encode

__all__ = [
    "str_encode",
    "str_decode",
    "bss_encode",
    "bss_decode",
    "bool_encode",
    "bool_decode",
]


def str_encode(lengths: np.ndarray, data: np.ndarray) -> bytes:
    """Encode (lengths:int64[n], data:uint8[sum]) — contiguous string column."""
    len_blob = for_encode(lengths)
    return (
        struct.pack("<QI", len(lengths), len(len_blob))
        + len_blob
        + np.ascontiguousarray(data, dtype=np.uint8).tobytes()
    )


def str_decode(buf: bytes | memoryview) -> tuple[np.ndarray, np.ndarray]:
    """Returns (offsets:int64[n+1], data:uint8[...])."""
    n, len_blob_len = struct.unpack_from("<QI", buf, 0)
    lengths = for_decode(memoryview(buf)[12 : 12 + len_blob_len])
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    data = np.frombuffer(buf, np.uint8, offset=12 + len_blob_len)
    if len(data) != offsets[-1]:
        raise ValueError("string data length mismatch")
    return offsets, data


def bss_encode(vals: np.ndarray) -> bytes:
    """Byte-plane transpose of fixed-width values (aids entropy coding)."""
    v = np.ascontiguousarray(vals)
    k = v.dtype.itemsize
    return v.view(np.uint8).reshape(-1, k).T.tobytes()


def bss_decode(buf: bytes | memoryview, n: int, dtype: np.dtype) -> np.ndarray:
    k = np.dtype(dtype).itemsize
    planes = np.frombuffer(buf, np.uint8, count=n * k).reshape(k, n)
    return np.ascontiguousarray(planes.T).reshape(-1).view(dtype)


def bool_encode(vals: np.ndarray) -> bytes:
    return np.packbits(
        np.ascontiguousarray(vals, dtype=np.uint8), bitorder="little"
    ).tobytes()


def bool_decode(buf: bytes | memoryview, n: int) -> np.ndarray:
    return np.unpackbits(
        np.frombuffer(buf, np.uint8), count=n, bitorder="little"
    ).astype(bool)
