"""Native (C) FSST fast path vs the numpy reference kernels.

The contract is BIT-IDENTITY: kernels/native.py must produce exactly
the bytes the numpy path produces for every input, so mixed fleets
(hosts with and without a C compiler) emit interchangeable, identical
files. These tests run each corpus through both paths by toggling
``native.lib`` and compare blobs and decoded buffers byte-for-byte.
"""

import numpy as np
import pytest

from parquet_go_spark.kernels import fsst as F
from parquet_go_spark.kernels import native


def _parts(strings):
    bs = [s.encode() if isinstance(s, str) else s for s in strings]
    lengths = np.array([len(b) for b in bs], np.int64)
    data = np.frombuffer(b"".join(bs), np.uint8).copy()
    return lengths, data


def _both_paths(lengths, data):
    """(native_blob, numpy_blob) for one input."""
    if native.lib is None:
        pytest.skip("no C toolchain in this environment")
    blob_c = F.fsst_encode(lengths, data)
    saved = native.lib
    try:
        native.lib = None
        blob_np = F.fsst_encode(lengths, data)
    finally:
        native.lib = saved
    return blob_c, blob_np


def _decode_both(blob):
    off_c, dat_c = F.fsst_decode(blob)
    saved = native.lib
    try:
        native.lib = None
        off_np, dat_np = F.fsst_decode(blob)
    finally:
        native.lib = saved
    assert np.array_equal(off_c, off_np)
    assert np.array_equal(dat_c, dat_np)
    return off_c, dat_c


CORPORA = {
    "english": ["the quick brown fox jumps over the lazy dog. " * k
                for k in range(1, 60)],
    "repetitive": ["tool_call(name=search, args={query: foo})"] * 500
                  + ["assistant: let me look that up for you"] * 500,
    "unicode": ["naïve café — 模型回复 ünïcödé ✓ " * k for k in range(1, 40)],
    "escape-heavy": [bytes([255, 255, 0, 255, 1]) * 20,
                     bytes(range(256)) * 4, b"\xff" * 100],
    "empty-strings": ["", "a", "", "bb", ""] * 50,
    "single": ["only one string in the whole chunk"],
    "long-string": ["x" * 10000 + "the end of a very long string",
                    ("lorem ipsum dolor sit amet " * 400)],  # > _MAX_PARSE_STR
}


@pytest.mark.parametrize("name", sorted(CORPORA))
def test_encode_bit_identity_and_roundtrip(name):
    lengths, data = _parts(CORPORA[name])
    blob_c, blob_np = _both_paths(lengths, data)
    assert blob_c == blob_np, f"native/numpy blob mismatch on {name}"
    off, dat = _decode_both(blob_c)
    assert np.array_equal(np.diff(off), lengths)
    assert bytes(dat) == bytes(data)


def test_random_bytes_identity():
    rng = np.random.default_rng(7)
    for trial in range(5):
        n_str = int(rng.integers(1, 200))
        lens = rng.integers(0, 500, n_str).astype(np.int64)
        data = rng.integers(0, 256, int(lens.sum()), dtype=np.uint8)
        blob_c, blob_np = _both_paths(lens, data)
        assert blob_c == blob_np
        off, dat = _decode_both(blob_c)
        assert bytes(dat) == bytes(data)


def test_empty_chunk():
    lengths = np.zeros(0, np.int64)
    data = np.zeros(0, np.uint8)
    blob_c, blob_np = _both_paths(lengths, data)
    assert blob_c == blob_np
    off, dat = _decode_both(blob_c)
    assert len(off) == 1 and len(dat) == 0


def test_malformed_stream_raises():
    if native.lib is None:
        pytest.skip("no C toolchain in this environment")
    lengths, data = _parts(["hello world, hello fsst"] * 30)
    blob = bytearray(F.fsst_encode(lengths, data))
    # corrupt the tail of the encoded stream into a dangling escape
    blob[-1] = 255
    with pytest.raises(ValueError):
        F.fsst_decode(bytes(blob))


def test_cache_reuse_identity():
    """Per-task symbol-table cache must behave identically on both
    paths (the retrain ratio guard compares payload sizes, which are
    identical when the parses are)."""
    if native.lib is None:
        pytest.skip("no C toolchain in this environment")
    chunks = [["alpha beta gamma delta " * k for k in range(1, 30)],
              ["alpha beta gamma epsilon " * k for k in range(1, 30)],
              ["zeta eta theta iota " * k for k in range(1, 30)]]
    parts = [_parts(c) for c in chunks]

    def run():
        cache = {}
        return [F.fsst_encode(l, d, cache=cache, cache_key="text")
                for l, d in parts]

    blobs_c = run()
    saved = native.lib
    try:
        native.lib = None
        blobs_np = run()
    finally:
        native.lib = saved
    assert blobs_c == blobs_np
