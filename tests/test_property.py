"""Property-based round-trip invariants (hypothesis): any typed value
set the codec accepts must decode bit-identically under BOTH the
auto-selected codec and every forced kernel, with or without nulls."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_go_spark.codec import content_crc, decode_array, encode_array
from parquet_go_spark.plan import choose_codec, profile_array

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
SMALL = st.integers(min_value=-(2**40), max_value=2**40)


def _roundtrip(arr: pa.Array, codec=None) -> None:
    if codec is None:
        codec = choose_codec(profile_array(arr, "p"))
    blob = encode_array(arr, *codec)
    back = decode_array(blob)
    assert back.equals(arr), (codec, arr, back)
    assert content_crc(arr) == content_crc(back)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), I64), max_size=300))
def test_int64_all_kernels(vals):
    arr = pa.array(vals, pa.int64())
    _roundtrip(arr)
    for c in ("plain", "for", "delta", "pfor", "deltap", "rle", "dict"):
        _roundtrip(arr, (c, "none"))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=40)), max_size=200))
def test_strings_all_kernels(vals):
    arr = pa.array(vals, pa.string())
    _roundtrip(arr)
    for c, e in (("plain", "zstd"), ("dict", "none"), ("fsst", "none"),
                 ("prefix", "zlib")):
        _roundtrip(arr, (c, e))


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.one_of(st.none(),
              st.floats(allow_nan=False, allow_infinity=True, width=64)),
    max_size=200,
))
def test_doubles(vals):
    arr = pa.array(vals, pa.float64())
    _roundtrip(arr)
    _roundtrip(arr, ("bss", "zstd"))
    _roundtrip(arr, ("plain", "none"))


@settings(max_examples=30, deadline=None)
@given(st.lists(
    st.one_of(st.none(), st.lists(st.one_of(st.none(), SMALL), max_size=8)),
    max_size=60,
))
def test_nested_list_int(vals):
    arr = pa.array(vals, pa.list_(pa.int64()))
    _roundtrip(arr)


@settings(max_examples=30, deadline=None)
@given(st.lists(
    st.one_of(
        st.none(),
        st.fixed_dictionaries(
            {"a": st.one_of(st.none(), SMALL),
             "b": st.one_of(st.none(), st.text(max_size=12))}
        ),
    ),
    max_size=60,
))
def test_nested_struct(vals):
    arr = pa.array(
        vals, pa.struct([("a", pa.int64()), ("b", pa.string())])
    )
    _roundtrip(arr)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(), st.booleans()), max_size=200))
def test_bools(vals):
    _roundtrip(pa.array(vals, pa.bool_()))


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
def test_uint64_wrap_safe(vals):
    arr = pa.array(np.array(vals, dtype=np.uint64), pa.uint64())
    _roundtrip(arr)
    for c in ("plain", "for", "pfor", "deltap"):
        _roundtrip(arr, (c, "none"))


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(), st.binary(min_size=16, max_size=16)),
                max_size=120))
def test_fixed_size_binary(vals):
    _roundtrip(pa.array(vals, pa.binary(16)))
    _roundtrip(pa.array(vals, pa.binary(16)), ("plain", "zstd"))


@settings(max_examples=30, deadline=None)
@given(st.lists(
    st.one_of(st.none(),
              st.integers(min_value=-(10**37), max_value=10**37)),
    max_size=120,
))
def test_wide_decimal38(vals):
    import decimal

    dv = [None if v is None else decimal.Decimal(v) for v in vals]
    _roundtrip(pa.array(dv, pa.decimal128(38, 0)))


@settings(max_examples=25, deadline=None)
@given(st.lists(
    st.one_of(
        st.none(),
        st.lists(
            st.one_of(
                st.none(),
                st.fixed_dictionaries(
                    {"name": st.one_of(st.none(), st.text(max_size=10)),
                     "v": st.one_of(st.none(), SMALL)}
                ),
            ),
            max_size=5,
        ),
    ),
    max_size=50,
))
def test_list_of_struct_generic_codec(vals):
    """list<struct> through the generic recursive codec (the shredded
    path is exercised by the Spark-level tests; this pins the blob
    container round-trip for the same shape incl. null lists and null
    elements)."""
    arr = pa.array(
        vals,
        pa.list_(pa.struct([("name", pa.string()), ("v", pa.int64())])),
    )
    _roundtrip(arr)


@settings(max_examples=25, deadline=None)
@given(vals=st.lists(
    st.one_of(
        st.none(),
        st.lists(
            st.tuples(
                st.sampled_from(["a", "bb", "c-3", "k_9", "weird.key"]),
                st.one_of(st.none(), SMALL),
            ),
            max_size=4,
        ),
    ),
    max_size=60,
))
def test_map_shred_property(vals, tmp_path_factory):
    """map<string,V> through the chunk layer: any key pattern —
    duplicates, null values, null/empty maps — must reconstruct
    bit-identically whether the chunk took the per-key shredded path or
    declined to the generic codec ('weird.key' forces the fallback),
    and per-key projection must equal a first-occurrence scan."""
    import os

    from parquet_go_spark import encode as E
    from parquet_go_spark.decode import make_decode_fn

    arr = pa.array(vals, pa.map_(pa.string(), pa.int64()))
    chunk = pa.table(
        {"id": pa.array(range(len(vals)), pa.int64()), "m": arr}
    )
    tdir = str(tmp_path_factory.mktemp("mapshred"))
    os.makedirs(os.path.join(tdir, "chunks"), exist_ok=True)
    entry = E._encode_or_reuse(chunk, "h00001", tdir, ("id",), {}, False,
                               (), "a0")
    batch = pa.RecordBatch.from_pydict(
        {"file": pa.array([os.path.join(tdir, entry["file"])])}
    )
    out = pa.Table.from_batches(
        list(make_decode_fn(["id", "m"])(iter([batch])))
    )
    got = out.column("m").combine_chunks()
    assert got.equals(arr), (entry["columns"]["m"]["codec"], got, arr)

    fn = make_decode_fn(["m.a"], column_types={"m.a": pa.int64()})
    out = pa.Table.from_batches(list(fn(iter([batch]))))
    want = [
        (next((v for k, v in row if k == "a"), None)
         if row is not None and any(k == "a" for k, _ in row) else None)
        for row in vals
    ]
    assert out.column("m.a").to_pylist() == want
