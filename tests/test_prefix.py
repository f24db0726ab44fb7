"""Front-coding (DELTA_BYTE_ARRAY-semantics) kernel tests."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_go_spark.codec import decode_array, encode_array
from parquet_go_spark.kernels.prefix import prefix_decode, prefix_encode


def _roundtrip(strings: list[bytes]):
    lengths = np.array([len(s) for s in strings], dtype=np.int64)
    data = np.frombuffer(b"".join(strings), np.uint8)
    blob = prefix_encode(lengths, data)
    offsets, out = prefix_decode(blob)
    assert list(np.diff(offsets)) == [len(s) for s in strings]
    assert out.tobytes() == b"".join(strings)
    return blob


def test_empty():
    _roundtrip([])


def test_single():
    _roundtrip([b"hello"])


def test_sorted_run_compresses():
    strings = [f"conv-{i:08d}".encode() for i in range(0, 3000, 3)]
    blob = _roundtrip(strings)
    raw = sum(len(s) for s in strings)
    assert len(blob) < raw / 2  # shared "conv-000..." prefixes collapse


def test_identical_strings():
    _roundtrip([b"same-string"] * 50)


def test_empty_strings_mixed():
    _roundtrip([b"", b"a", b"", b"ab", b"abc", b""])


def test_no_shared_prefixes():
    _roundtrip([b"alpha", b"bravo", b"charlie", b"delta"])


def test_long_prefix_cap():
    base = b"x" * 500
    _roundtrip([base + b"1", base + b"2", base + b"3"])


@settings(max_examples=60, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=40), max_size=80))
def test_roundtrip_property(strings):
    _roundtrip(strings)


def test_via_codec_layer_sorted_column():
    arr = pa.array([f"conv-{i:08d}" for i in range(2000)], pa.string())
    blob = encode_array(arr, "prefix", "zstd")
    assert decode_array(blob).equals(arr)
    assert len(blob) < encode_array(arr, "plain", "none").__len__()
