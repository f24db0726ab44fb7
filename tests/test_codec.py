"""Blob container round-trips over pyarrow arrays (codec.py) + selector."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_spark.codec import blob_info, decode_array, encode_array
from parquet_go_spark.plan import choose_codec, profile_array

RNG = np.random.default_rng(42)


def _rt(arr: pa.Array, codec: str, entropy: str = "none"):
    blob = encode_array(arr, codec, entropy)
    out = decode_array(blob)
    assert out.type == arr.type, (out.type, arr.type)
    assert out.equals(arr), f"{codec}/{entropy} mismatch"
    return blob


INT32 = pa.array(RNG.integers(-1000, 1000, 5000, dtype=np.int64).astype(np.int32),
                 type=pa.int32())
INT64 = pa.array(RNG.integers(-(2**40), 2**40, 5000, dtype=np.int64))
SORTED = pa.array(np.cumsum(RNG.integers(1, 120, 5000)).astype(np.int64))
DOUBLES = pa.array(RNG.normal(size=3000))
STRINGS = pa.array([f"conv-{i % 97:08d}" for i in range(4000)])
TEXT = pa.array(["word " * int(RNG.integers(3, 60)) + str(i) for i in range(500)])
BOOLS = pa.array(RNG.random(2001) < 0.3)
TS = pa.array(np.cumsum(RNG.integers(1, 120_000_000, 2000)).astype("datetime64[us]"),
              type=pa.timestamp("us", tz="UTC"))
TS_NAIVE = pa.array(np.cumsum(RNG.integers(1, 120_000_000, 2000)).astype("datetime64[us]"))


@pytest.mark.parametrize("codec", ["plain", "for", "delta", "dict", "rle", "bss"])
@pytest.mark.parametrize("arr", [INT32, INT64, SORTED], ids=["i32", "i64", "sorted"])
def test_int_codecs(arr, codec):
    _rt(arr, codec)
    _rt(arr, codec, "zstd")


def test_doubles():
    _rt(DOUBLES, "plain")
    _rt(DOUBLES, "bss", "zstd")


@pytest.mark.parametrize("codec", ["plain", "dict"])
def test_strings(codec):
    _rt(STRINGS, codec)
    _rt(STRINGS, codec, "zstd")
    _rt(TEXT, codec, "zlib")


def test_bools_and_ts():
    _rt(BOOLS, "plain")
    _rt(TS, "delta")
    _rt(TS, "dict")
    _rt(TS_NAIVE, "delta", "zstd")


def test_empty_and_single():
    for arr in [pa.array([], type=pa.int64()), pa.array([], type=pa.string()),
                pa.array([7], type=pa.int64()), pa.array(["x"])]:
        codecs = (["plain", "dict"] if pa.types.is_string(arr.type)
                  else ["plain", "dict", "for", "delta", "rle"])
        for c in codecs:
            _rt(arr, c)


def test_nulls():
    a = pa.array([1, None, 3, None, 5] * 100, type=pa.int64())
    _rt(a, "for", "zstd")
    _rt(a, "dict")
    s = pa.array(["a", None, "ccc", "", None] * 50)
    _rt(s, "plain", "zstd")
    _rt(s, "dict")


def test_all_null():
    a = pa.array([None] * 10, type=pa.int64())
    _rt(a, "plain")


def test_blob_info():
    blob = encode_array(SORTED, "delta", "zstd")
    info = blob_info(blob)
    assert info["codec"] == "delta" and info["entropy"] == "zstd"
    assert info["n_values"] == 5000


def test_dict_beats_plain_on_lowcard():
    plain = encode_array(STRINGS, "plain")
    d = encode_array(STRINGS, "dict")
    assert len(d) < len(plain) / 4


def test_delta_beats_plain_on_sorted():
    assert len(encode_array(SORTED, "delta")) < len(encode_array(SORTED, "plain")) / 4


# ---------- selector ----------

def test_selector_lowcard_string_picks_dict():
    st = profile_array(STRINGS, "role")
    assert choose_codec(st)[0] == "dict"


def test_selector_sorted_int_picks_delta():
    st = profile_array(SORTED, "ts")
    assert choose_codec(st)[0] == "delta"


def test_selector_random_int_picks_for():
    st = profile_array(INT64, "k")
    assert choose_codec(st)[0] == "for"


def test_selector_double_picks_bss():
    st = profile_array(DOUBLES, "v")
    assert choose_codec(st)[0] == "bss"


def test_selector_hicard_text():
    st = profile_array(TEXT, "text")
    assert choose_codec(st)[0] in ("fsst", "plain")  # fsst once kernel lands


def test_prune_entries_numeric_not_string_compare():
    """Regression: int stats must compare numerically — lexicographic
    would skip a chunk with min=9,max=100 for predicate (20, 30)."""
    from parquet_go_spark.decode import prune_entries

    entries = [
        {"chunk_id": "a", "columns": {"x": {"min": 9, "max": 100}}},
        {"chunk_id": "b", "columns": {"x": {"min": 200, "max": 300}}},
    ]
    kept = prune_entries(entries, {"x": (20, 30)})
    assert [e["chunk_id"] for e in kept] == ["a"]


def test_prune_entries_timestamp_iso():
    import datetime

    from parquet_go_spark.decode import prune_entries

    e1 = {"chunk_id": "a", "columns": {"ts": {"min": "2025-01-01T00:00:00",
                                              "max": "2025-01-10T00:00:00"}}}
    e2 = {"chunk_id": "b", "columns": {"ts": {"min": "2025-02-01T00:00:00",
                                              "max": "2025-02-10T00:00:00"}}}
    lo = datetime.datetime(2025, 1, 5)
    kept = prune_entries([e1, e2], {"ts": (lo, datetime.datetime(2025, 1, 6))})
    assert [e["chunk_id"] for e in kept] == ["a"]


def test_binary_roundtrip_all_codecs():
    import pyarrow as pa

    b = pa.array([b"hello", b"", b"\x00\xff" * 10, None, b"hello"], pa.binary())
    for codec, ent in [("plain", "none"), ("dict", "zstd"),
                       ("fsst", "zstd"), ("prefix", "none")]:
        assert decode_array(encode_array(b, codec, ent)).equals(b), codec


def test_decimal_roundtrip():
    from decimal import Decimal

    import pyarrow as pa

    d = pa.array([Decimal("123.45"), None, Decimal("-99999.99"),
                  Decimal("0.01")], pa.decimal128(10, 2))
    assert decode_array(encode_array(d, "plain", "zstd")).equals(d)


def test_selector_handles_binary_and_decimal():
    from decimal import Decimal

    import pyarrow as pa

    b = pa.array([b"a", b"b", b"a"] * 10, pa.binary())
    codec, ent = choose_codec(profile_array(b, "b"))
    assert codec in ("dict", "plain")
    d = pa.array([Decimal("1.5")] * 5, pa.decimal128(5, 2))
    assert choose_codec(profile_array(d, "d")) == ("plain", "zstd")


def test_zlib_entropy_stage():
    import numpy as np
    import pyarrow as pa

    arr = pa.array(np.arange(5000, dtype=np.int64) % 97)
    blob = encode_array(arr, "for", "zlib")
    assert decode_array(blob).equals(arr)


def test_date32_roundtrip():
    import datetime

    import pyarrow as pa

    d0 = datetime.date(2025, 1, 1)
    arr = pa.array([d0 + datetime.timedelta(days=i) for i in range(300)],
                   pa.date32())
    for codec in ("plain", "delta", "for", "dict"):
        assert decode_array(encode_array(arr, codec, "none")).equals(arr), codec


def test_alp_decimal_doubles():
    import numpy as np
    import pyarrow as pa

    from parquet_go_spark.kernels.alp import alp_decode, alp_encode, alp_probe

    prices = np.round(np.random.default_rng(0).uniform(1, 9e4, 5000), 2)
    assert alp_probe(prices) == 2
    out = alp_decode(alp_encode(prices))
    assert np.array_equal(out, prices)  # bit-exact
    arr = pa.array(prices, pa.float64())
    blob = encode_array(arr, "alp", "none")
    assert decode_array(blob).equals(arr)
    assert len(blob) < len(encode_array(arr, "bss", "zstd"))


def test_alp_probe_rejects_non_decimal():
    import numpy as np

    from parquet_go_spark.kernels.alp import alp_probe

    rng = np.random.default_rng(1)
    assert alp_probe(rng.standard_normal(100)) is None
    assert alp_probe(np.array([1.5, np.nan])) is None
    assert alp_probe(np.array([np.inf])) is None
    assert alp_probe(np.array([-0.0, 1.0])) is None
    assert alp_probe(np.array([], dtype=np.float64)) == 0


def test_alp_upgrade_in_encode_path():
    import numpy as np
    import pyarrow as pa

    from parquet_go_spark.encode import _encode_one_column

    prices = pa.array(np.round(
        np.random.default_rng(2).uniform(1, 1e5, 20000), 2))
    blob, meta = _encode_one_column(prices, "price", None)
    assert meta["codec"] == "alp"
    assert decode_array(blob).equals(prices)


def test_nested_roundtrip_all_shapes():
    """Generic nested containers (SURVEY §2.5 L2): struct, map,
    list<T> with nulls at every level round-trip bit-exactly."""
    import pyarrow as pa

    cases = [
        pa.array([["a", "bb"], None, [], ["ccc", None, "dd"]],
                 pa.list_(pa.string())),
        pa.array([[1, 2, 3], [4], None, []], pa.list_(pa.int64())),
        pa.array([[[1, 2], [3]], None, [[], [4, 5]]],
                 pa.list_(pa.list_(pa.int32()))),
        pa.array(
            [{"a": 1, "b": "x"}, None, {"a": None, "b": "yy"},
             {"a": 3, "b": None}],
            pa.struct([("a", pa.int64()), ("b", pa.string())]),
        ),
        pa.array(
            [{"s": {"k": 1}, "l": [1.5, 2.5]}, None,
             {"s": None, "l": None}],
            pa.struct([("s", pa.struct([("k", pa.int32())])),
                       ("l", pa.list_(pa.float64()))]),
        ),
        pa.array([[("k1", 1), ("k2", 2)], None, [], [("k3", None)]],
                 pa.map_(pa.string(), pa.int64())),
        pa.array([None, None], pa.struct([("a", pa.int64())])),
        pa.array([], pa.list_(pa.string())),
    ]
    from parquet_go_spark.codec import content_crc
    from parquet_go_spark.plan import choose_codec, profile_array

    for arr in cases:
        c, e = choose_codec(profile_array(arr, "x"))
        blob = encode_array(arr, c, e)
        back = decode_array(blob)
        assert back.equals(arr), (arr.type, back, arr)
        assert content_crc(arr) == content_crc(back)


def test_nested_child_gets_real_codec():
    """A text field inside a struct must still compress (child blobs
    auto-select FSST/dict, not raw plain)."""
    import pyarrow as pa

    text = ["the quick brown fox jumps over the lazy dog %d" % i
            for i in range(2000)]
    arr = pa.array([{"t": t, "i": i} for i, t in enumerate(text)],
                   pa.struct([("t", pa.string()), ("i", pa.int64())]))
    blob = encode_array(arr, "plain", "none")
    assert len(blob) < arr.nbytes * 0.6, (len(blob), arr.nbytes)
    assert decode_array(blob).equals(arr)


def test_selector_sorted_prefix_string_picks_prefix():
    """A sorted high-cardinality prefix-heavy column (the sorted
    conv_id shape) must auto-select front-coding (E6)."""
    import pyarrow as pa

    names = [f"conv-{i:012d}" for i in range(150_000)]
    arr = pa.array(names)
    st = profile_array(arr, "conv_id")
    assert choose_codec(st)[0] == "prefix", (st.sorted_frac, st.extras)
    blob = encode_array(arr, *choose_codec(st))
    assert decode_array(blob).equals(arr)
    assert len(blob) < len(encode_array(arr, "plain", "zstd"))


def test_selector_unsorted_hicard_string_still_fsst():
    import pyarrow as pa

    rng = __import__("numpy").random.default_rng(3)
    words = ["query filter join stream table row batch window %d %d"
             % (a, b) for a, b in zip(rng.integers(0, 99999, 4000),
                                      rng.integers(0, 99999, 4000))]
    st = profile_array(pa.array(words), "text")
    assert choose_codec(st)[0] == "fsst"


def test_uint_and_float16_matrix():
    """uint8..64 + float16 across the numeric codecs (uint64 above
    2^63 must wrap-safe round-trip bit-exactly)."""
    import numpy as np
    import pyarrow as pa

    from parquet_go_spark.codec import content_crc
    from parquet_go_spark.plan import choose_codec, profile_array

    rng = np.random.default_rng(9)
    cases = {
        pa.uint8(): rng.integers(0, 255, 5000, dtype=np.uint8),
        pa.uint16(): rng.integers(0, 1 << 16, 5000, dtype=np.uint16),
        pa.uint32(): rng.integers(0, 1 << 32, 5000, dtype=np.uint32),
        pa.uint64(): rng.integers(0, 1 << 63, 5000, dtype=np.uint64)
        + np.uint64(1 << 63),  # straddle the int64 boundary
        pa.float16(): rng.standard_normal(5000).astype(np.float16),
    }
    for t, vals in cases.items():
        arr = pa.array(vals, type=t)
        # auto-selected codec
        c, e = choose_codec(profile_array(arr, "u"))
        blob = encode_array(arr, c, e)
        assert decode_array(blob).equals(arr), (t, c)
        assert content_crc(arr) == content_crc(decode_array(blob))
        # forced kernels
        codecs = (["bss", "plain"] if pa.types.is_float16(t)
                  else ["plain", "for", "delta", "pfor", "deltap", "dict"])
        for c2 in codecs:
            blob2 = encode_array(arr, c2, "none")
            assert decode_array(blob2).equals(arr), (t, c2)
        # with nulls
        mask = np.zeros(len(vals), dtype=bool)
        mask[::7] = True
        narr = pa.array(vals, type=t, mask=mask)
        assert decode_array(encode_array(narr, "plain", "zstd")).equals(narr)


def test_fixed_size_binary_roundtrip_and_planes():
    """FLBA/UUID surface (parquet.thrift:32-41): fixed_size_binary
    round-trips bit-exactly (incl. nulls), and the byte-plane transpose
    + zstd beats raw+zstd on UUIDs that share byte positions."""
    import numpy as np
    import pyarrow as pa

    from parquet_go_spark.codec import decode_array, encode_array

    rng = np.random.default_rng(3)
    n = 4096
    # UUIDv7-ish: leading 6 timestamp-ish bytes shared/slowly varying
    raw = rng.integers(0, 256, size=(n, 16), dtype=np.uint8)
    raw[:, 0:4] = 0x01
    raw[:, 4] = (np.arange(n) >> 8).astype(np.uint8)
    vals = [raw[i].tobytes() for i in range(n)]
    vals[7] = None
    vals[4000] = None
    arr = pa.array(vals, type=pa.binary(16))
    blob = encode_array(arr, "plain", "zstd")
    assert decode_array(blob).equals(arr)
    # plane transpose beats an untransposed baseline: compare against
    # variable-width binary of the same bytes
    base = encode_array(arr.cast(pa.binary()), "plain", "zstd")
    assert len(blob) < len(base)


def test_wide_decimal_two_halves_pack():
    """DECIMAL(38,x): two-int64-halves PFOR pack — values that fit in
    the low word collapse the high-word stream; full-range ±10^30
    values still round-trip bit-exactly."""
    import decimal

    import pyarrow as pa

    from parquet_go_spark.codec import decode_array, encode_array

    small = [decimal.Decimal(i * 97 - 5000) / 100 for i in range(5000)]
    arr = pa.array(small, type=pa.decimal128(38, 2))
    blob = encode_array(arr, "plain", "none")
    assert decode_array(blob).equals(arr)
    assert len(blob) < 16 * len(small) / 2  # beats raw 16B/value by 2x+

    huge = [
        decimal.Decimal(10) ** 30 + i * (-1) ** i for i in range(1000)
    ] + [None, decimal.Decimal(-(10 ** 35))]
    arr2 = pa.array(huge, type=pa.decimal128(38, 0))
    blob2 = encode_array(arr2, "plain", "zstd")
    assert decode_array(blob2).equals(arr2)


def test_map_shred_kernel_roundtrip_and_projection(tmp_path):
    """map<string,V> shredding (SURVEY §1.2 MAP row): per-key value
    blobs + a shell with the dict-coded key stream. Exact round-trip
    incl. duplicate keys, null values, null and empty maps; per-key
    projection returns the FIRST occurrence (pc.map_lookup parity);
    unsuitable keys (cardinality, dots) decline to the generic path."""
    import os

    from parquet_go_spark import encode as E
    from parquet_go_spark.decode import make_decode_fn

    t = pa.map_(pa.string(), pa.int64())
    arr = pa.array(
        [[("a", 1), ("b", 2)], None, [], [("b", 5)], [("a", None)],
         [("a", 3), ("a", 4)]],  # dup key: first occurrence projects
        type=t,
    )
    chunk = pa.table({"id": pa.array(range(6), pa.int64()), "attrs": arr})
    tdir = str(tmp_path)
    os.makedirs(os.path.join(tdir, "chunks"), exist_ok=True)
    entry = E._encode_or_reuse(chunk, "m00001", tdir, ("id",), {}, False,
                               (), "a0")
    assert entry["columns"]["attrs"]["codec"] == "map_shred"
    assert set(entry["columns"]["attrs"]["children"]) == {"a", "b"}
    batch = pa.RecordBatch.from_pydict(
        {"file": pa.array([os.path.join(tdir, entry["file"])])}
    )

    fn = make_decode_fn(["id", "attrs"])
    out = pa.Table.from_batches(list(fn(iter([batch]))))
    assert out.column("attrs").combine_chunks().equals(arr)

    fn = make_decode_fn(["attrs.a"], column_types={"attrs.a": pa.int64()})
    out = pa.Table.from_batches(list(fn(iter([batch]))))
    assert out.column("attrs.a").to_pylist() == [1, None, None, None,
                                                 None, 3]
    fn = make_decode_fn(["attrs.zz"], column_types={"attrs.zz": pa.int64()})
    out = pa.Table.from_batches(list(fn(iter([batch]))))
    assert out.column("attrs.zz").to_pylist() == [None] * 6

    # guards: >MAP_SHRED_MAX_KEYS distinct or parquet-unsafe key names
    assert E._encode_map_shredded(
        pa.array([[(f"k{j}", j)] for j in range(40)], type=t)
    ) is None
    assert E._encode_map_shredded(
        pa.array([[("a.b", 1)]], type=t)
    ) is None

    # generic fallback still answers "attrs.k" via pc.map_lookup
    dotted = pa.array([[("a.b", 1), ("c", 2)], [("c", 9)]], type=t)
    chunk2 = pa.table({"id": pa.array([0, 1], pa.int64()),
                       "attrs": dotted})
    e2 = E._encode_or_reuse(chunk2, "g00001", tdir, ("id",), {}, False,
                            (), "a0")
    assert e2["columns"]["attrs"]["codec"] != "map_shred"
    b2 = pa.RecordBatch.from_pydict(
        {"file": pa.array([os.path.join(tdir, e2["file"])])}
    )
    fn = make_decode_fn(["attrs.c"], column_types={"attrs.c": pa.int64()})
    out = pa.Table.from_batches(list(fn(iter([b2]))))
    assert out.column("attrs.c").to_pylist() == [2, 9]


def test_selector_sampled_distinct_not_diluted_by_chunk_size():
    """A 250k-row wide-text chunk must still pick fsst: the distinct
    count is measured on a 64k sample, and dividing it by the FULL row
    count read the ratio 4x low and flipped text to dict (1.6x the fsst
    size — r5 8 GB cluster run)."""
    import pyarrow as pa

    uniq = pa.array([f"agent {i * 48271 % 300_000} ran tool {i} replied"
                     for i in range(300_000)])
    st = profile_array(uniq, "text")
    assert st.sample_len == 65536
    assert choose_codec(st)[0] == "fsst"
    # and a genuinely low-cardinality column of the same size keeps dict
    lowcard = pa.array(["user", "assistant", "tool", "system"] * 75_000)
    assert choose_codec(profile_array(lowcard, "role"))[0] == "dict"
