"""Distributed encode path: DataFrame → encoded chunk files + manifest rows.

The Spark-first re-expression of the reference's write path
(⟨ref⟩ writer.go; SURVEY.md §3.1/§3.4): instead of row-at-a-time
``Writer.Write`` + row-group flushes, the whole table is

    withColumn(_ck = pmod(xxhash64(part_key, turn_block), num_chunks))
      .repartition(num_chunks, _ck)          # the one shuffle
      .sortWithinPartitions(_ck, *key_cols)  # M8 sorting invariant
      .mapInArrow(encode_partition)          # vectorized numpy kernels

Chunk assignment is *content-addressed* (hash of key + turn-block salt),
not sampled ranges: deterministic across job restarts (checkpoint
resume) and skew-bounded (a conversation longer than ``salt_block``
turns is split across chunks at turn-block boundaries — explicit skew
handling per north_rule). Each task writes its chunk files directly
(atomic tmp+rename) and emits one manifest-entry JSON per chunk.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import manifest
from .codec import content_crc, encode_array
from .plan import choose_codec, profile_array

__all__ = ["make_encode_fn", "BLOB_COL_PREFIX"]

# Chunk file layout: ONE row, one parquet COLUMN per encoded blob
# (named b_<column>). Parquet's columnar projection then means reading
# 2 of 11 columns reads only those columns' bytes from storage — the
# on-disk counterpart of P1 projection pushdown. All per-column
# metadata (codec chain, stats, CRC) lives in the embedded manifest
# entry (schema metadata), which read_schema fetches without touching
# data pages.

_MANIFEST_META_KEY = b"pgs_manifest_entry"
BLOB_COL_PREFIX = "b_"


def _encode_struct_shredded(arr: pa.Array) -> tuple[dict, dict]:
    """Shred a TOP-LEVEL struct column Dremel-style: one self-
    describing blob per child (stored as its own parquet column →
    nested projection reads only that child's bytes) plus a tiny shell
    blob carrying the struct type + validity. Children under a null
    parent are dropped; decode re-expands from the shell mask.
    Returns ({suffix: blob} with "" = shell, column meta)."""
    import struct as _s

    from .codec import _type_bytes, encode_array
    from .plan import choose_codec, profile_array

    n = len(arr)
    a = arr.drop_null() if arr.null_count else arr
    tb = _type_bytes(arr.type)
    if arr.null_count:
        from .kernels.rle import rle_encode

        valid = arr.is_valid().to_numpy(zero_copy_only=False).astype(np.uint64)
        mask = rle_encode(valid, 1)
        shell = (_s.pack("<BQB", 1, n, 1)
                 + _s.pack("<QI", n - arr.null_count, len(mask)) + mask
                 + _s.pack("<I", len(tb)) + tb)
    else:
        shell = _s.pack("<BQB", 1, n, 0) + _s.pack("<I", len(tb)) + tb
    blobs = {"": shell}
    children_meta = {}
    children = a.flatten() if len(a) else [
        pa.array([], arr.type.field(i).type)
        for i in range(arr.type.num_fields)
    ]
    for i, child in enumerate(children):
        child = (child.combine_chunks()
                 if isinstance(child, pa.ChunkedArray) else child)
        fname = arr.type.field(i).name
        c, e = choose_codec(profile_array(child, fname))
        blob = encode_array(child, c, e)
        blobs[fname] = blob
        children_meta[fname] = {
            "codec": c, "entropy": e, "enc_bytes": len(blob),
            "crc32": zlib.crc32(blob),
        }
    meta = {
        "codec": "struct_shred",
        "entropy": "none",
        "n": n,
        "nulls": arr.null_count,
        "min": None,
        "max": None,
        "raw_bytes": int(arr.nbytes),
        "enc_bytes": sum(len(b) for b in blobs.values()),
        "crc32": zlib.crc32(shell),
        "children": children_meta,
    }
    return blobs, meta


def _encode_list_struct_shredded(arr: pa.Array) -> tuple[dict, dict]:
    """Shred a list<struct<...>> column (the realistic tool-call shape:
    one transcript turn carries a variable-length list of typed call
    records). Dremel-style: per struct-child blob over the FLATTENED
    elements (so ``read_table(columns=["tool_calls.name"])`` reads and
    decodes only that child's bytes) plus a shell carrying the list
    offsets, list validity, element validity and the arrow type.
    Returns ({suffix: blob} with "" = shell, column meta)."""
    import struct as _s

    import pyarrow.compute as pc

    from .codec import _type_bytes, encode_array
    from .kernels.rle import rle_encode
    from .plan import choose_codec, profile_array

    n = len(arr)
    tb = _type_bytes(arr.type)
    if arr.null_count:
        valid = arr.is_valid().to_numpy(zero_copy_only=False).astype(np.uint64)
        mask = rle_encode(valid, 1)
        shell = (_s.pack("<BQB", 2, n, 1)
                 + _s.pack("<QI", n - arr.null_count, len(mask)) + mask)
    else:
        shell = _s.pack("<BQB", 2, n, 0)
    shell += _s.pack("<I", len(tb)) + tb
    # offsets over ALL n lists (null list → 0 elements) — decoupled
    # from validity so decode can rebuild either child or full column
    lens = pc.list_value_length(arr).cast(pa.int64())
    if lens.null_count:
        lens = lens.fill_null(0)
    lens_np = lens.to_numpy(zero_copy_only=False)
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(lens_np, out=offs[1:])
    off_blob = encode_array(pa.array(offs, pa.int64()), "pfor", "none")
    shell += _s.pack("<I", len(off_blob)) + off_blob
    elems = pc.list_flatten(arr)
    if isinstance(elems, pa.ChunkedArray):
        elems = elems.combine_chunks()
    if elems.null_count:  # null struct ELEMENTS inside lists
        evalid = elems.is_valid().to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        emask = rle_encode(evalid, 1)
        shell += _s.pack("<BQI", 1, len(elems) - elems.null_count,
                         len(emask)) + emask
        elems_nn = elems.drop_null()
    else:
        shell += _s.pack("<B", 0)
        elems_nn = elems
    blobs = {"": shell}
    children_meta = {}
    st = arr.type.value_type
    children = elems_nn.flatten() if len(elems_nn) else [
        pa.array([], st.field(i).type) for i in range(st.num_fields)
    ]
    for i, child in enumerate(children):
        child = (child.combine_chunks()
                 if isinstance(child, pa.ChunkedArray) else child)
        fname = st.field(i).name
        c, e = choose_codec(profile_array(child, fname))
        blob = encode_array(child, c, e)
        blobs[fname] = blob
        children_meta[fname] = {
            "codec": c, "entropy": e, "enc_bytes": len(blob),
            "crc32": zlib.crc32(blob),
        }
    meta = {
        "codec": "list_shred",
        "entropy": "none",
        "n": n,
        "nulls": arr.null_count,
        "min": None,
        "max": None,
        "raw_bytes": int(arr.nbytes),
        "enc_bytes": sum(len(b) for b in blobs.values()),
        "crc32": zlib.crc32(shell),
        "children": children_meta,
    }
    return blobs, meta


# Map shredding guard: per-key value blobs only make sense for the
# bounded-key-set telemetry shape (attrs maps with a handful of fixed
# keys). High-cardinality or unruly keys fall back to the generic
# nested codec — correctness is identical, only projection I/O differs.
MAP_SHRED_MAX_KEYS = 32
_MAP_KEY_OK = re.compile(r"[A-Za-z0-9_\-]{1,64}\Z")


def _encode_map_shredded(arr: pa.Array) -> tuple[dict, dict] | None:
    """Shred a map<string,V> column per KEY: one self-describing value
    blob per distinct key (stored as its own parquet column) plus a
    shell carrying validity, arrow type, per-row kv offsets and the
    dict-coded key stream. ``read_table(columns=["attrs.k"])`` then
    reads the shell + ONE key's value bytes (SURVEY §1.2 MAP row) —
    other keys' values are never touched on disk.

    Exact reconstruction: the key stream remembers each row's key order
    (duplicates included), and per-key blobs hold that key's values in
    stream order, so the full map round-trips bit-identically.

    Returns None when the chunk's keys are unsuitable (non-string keys,
    null keys, > MAP_SHRED_MAX_KEYS distinct, or names that don't fit a
    parquet column) — the caller falls back to the generic path."""
    import struct as _s

    import pyarrow.compute as pc

    from .codec import _type_bytes, encode_array
    from .kernels.rle import rle_encode
    from .plan import choose_codec, profile_array

    if not (pa.types.is_string(arr.type.key_type)
            or pa.types.is_large_string(arr.type.key_type)):
        return None
    n = len(arr)
    a = arr.drop_null() if arr.null_count else arr
    if len(a):
        off = np.frombuffer(a.buffers()[1], np.int32, len(a) + 1,
                            offset=a.offset * 4).astype(np.int64)
        lo, hi = int(off[0]), int(off[-1])
        keys = a.keys.slice(lo, hi - lo)
        items = a.items.slice(lo, hi - lo)
    else:
        keys = pa.array([], arr.type.key_type)
        items = pa.array([], arr.type.item_type)
    if keys.null_count:
        return None
    uk = pc.unique(keys)
    if len(uk) > MAP_SHRED_MAX_KEYS:
        return None
    key_names = sorted(uk.to_pylist())
    if any(not _MAP_KEY_OK.match(k) for k in key_names):
        return None

    tb = _type_bytes(arr.type)
    if arr.null_count:
        valid = arr.is_valid().to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        mask = rle_encode(valid, 1)
        shell = (_s.pack("<BQB", 3, n, 1)
                 + _s.pack("<QI", n - arr.null_count, len(mask)) + mask)
    else:
        shell = _s.pack("<BQB", 3, n, 0)
    shell += _s.pack("<I", len(tb)) + tb
    # per-row kv counts over ALL n rows (null map → 0), like list shred
    # (pyarrow has no list_value_length kernel for maps — use the
    # offsets buffer; null slots may span garbage extents, zero them)
    if n:
        off_all = np.frombuffer(arr.buffers()[1], np.int32, n + 1,
                                offset=arr.offset * 4).astype(np.int64)
        lens_np = np.diff(off_all)
        if arr.null_count:
            vmask = arr.is_valid().to_numpy(zero_copy_only=False)
            lens_np = np.where(vmask, lens_np, 0)
    else:
        lens_np = np.zeros(0, np.int64)
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(lens_np, out=offs[1:])
    off_blob = encode_array(pa.array(offs, pa.int64()), "pfor", "none")
    shell += _s.pack("<I", len(off_blob)) + off_blob
    # key dictionary (sorted) + per-position key indices (dict/RLE'd)
    kd = b"".join(_s.pack("<H", len(k.encode())) + k.encode()
                  for k in key_names)
    shell += _s.pack("<HI", len(key_names), len(kd)) + kd
    kidx = pc.index_in(keys, value_set=pa.array(key_names, keys.type)) \
        .cast(pa.int32())
    kidx_blob = encode_array(kidx, "dict", "none")
    shell += _s.pack("<I", len(kidx_blob)) + kidx_blob

    blobs = {"": shell}
    children_meta = {}
    ki = kidx.to_numpy(zero_copy_only=False)
    for i, kname in enumerate(key_names):
        vals = items.filter(pa.array(ki == i))
        vals = (vals.combine_chunks()
                if isinstance(vals, pa.ChunkedArray) else vals)
        c, e = choose_codec(profile_array(vals, kname))
        blob = encode_array(vals, c, e)
        blobs[kname] = blob
        children_meta[kname] = {
            "codec": c, "entropy": e, "enc_bytes": len(blob),
            "crc32": zlib.crc32(blob),
        }
    meta = {
        "codec": "map_shred",
        "entropy": "none",
        "n": n,
        "nulls": arr.null_count,
        "min": None,
        "max": None,
        "raw_bytes": int(arr.nbytes),
        "enc_bytes": sum(len(b) for b in blobs.values()),
        "crc32": zlib.crc32(shell),
        "children": children_meta,
    }
    return blobs, meta


def _encode_one_column(arr: pa.Array, name: str,
                       override: tuple[str, str] | None,
                       with_bloom: bool = False,
                       with_token_bloom: bool = False,
                       cache: dict | None = None) -> tuple[bytes, dict]:
    st = profile_array(arr, name)
    codec, entropy = override if override else choose_codec(st)
    blob = encode_array(arr, codec, entropy, cache=cache, name=name)
    # patched-FOR upgrade: when outliers inflate the frame width (e.g.
    # cross-conversation ts jumps in a sorted chunk), the PFOR sibling
    # usually wins — encode both, keep the smaller (cheap for numerics)
    if override is None and codec in ("delta", "for"):
        sibling = "deltap" if codec == "delta" else "pfor"
        alt = encode_array(arr, sibling, entropy)
        if len(alt) < len(blob):
            blob, codec = alt, sibling
    # decimal-float upgrade (ALP): doubles that are decimals in
    # disguise become scaled ints + PFOR — usually far smaller than
    # byte-stream-split + zstd
    if override is None and codec == "bss" and st.arrow_type == "double":
        from .kernels.alp import alp_probe

        a = arr.drop_null() if arr.null_count else arr
        if alp_probe(a.to_numpy(zero_copy_only=False)) is not None:
            alt = encode_array(arr, "alp", "none")
            if len(alt) < len(blob):
                blob, codec, entropy = alt, "alp", "none"
    # dictionary/codec fallback guard (parquet-go dict-page fallback parity):
    # if the chosen encoding did not beat raw bytes, drop to plain+zstd.
    if override is None and len(blob) > arr.nbytes:
        alt = encode_array(arr, "plain", "zstd")
        if len(alt) < len(blob):
            blob, codec, entropy = alt, "plain", "zstd"
    meta = {
        "codec": codec,
        "entropy": entropy,
        "n": st.n,
        "nulls": st.null_count,
        "min": manifest.stat_value(st.min_val),
        "max": manifest.stat_value(st.max_val),
        "raw_bytes": int(arr.nbytes),
        "enc_bytes": len(blob),
        "crc32": zlib.crc32(blob),
    }
    # exact per-chunk sum for numeric columns → table-level
    # sum/avg answerable from the manifest alone (aggregate pushdown;
    # ints sum exactly as Python bigints, floats as float64)
    t = arr.type
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        import pyarrow.compute as pc

        s = pc.sum(arr)
        if s.is_valid:
            v = s.as_py()
            meta["sum"] = float(v) if pa.types.is_floating(t) else int(v)
    if with_bloom:
        import pyarrow.compute as pc

        from .kernels.bloom import bloom_build

        meta["bloom"] = bloom_build(
            pc.unique(arr.drop_null() if arr.null_count else arr)
        )
    if with_token_bloom:
        # token-level bloom over the chunk's distinct whitespace tokens
        # (a per-chunk inverted-index sketch: full-text point lookups
        # prune chunks before any decode) — all arrow C kernels
        import pyarrow.compute as pc

        from .kernels.bloom import bloom_build

        a = arr.drop_null() if arr.null_count else arr
        toks = pc.unique(pc.list_flatten(pc.split_pattern(a, " ")))
        meta["token_bloom"] = bloom_build(toks)
    return blob, meta


def _write_chunk_file(path: str, tbl: pa.Table, entry: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tbl = tbl.replace_schema_metadata(
        {_MANIFEST_META_KEY: json.dumps(entry).encode()}
    )
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    os.close(fd)
    try:
        pq.write_table(tbl, tmp, compression="none")  # blobs are pre-compressed
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def read_chunk_entry(path: str) -> dict | None:
    """Manifest entry embedded in an existing chunk file (resume path)."""
    try:
        meta = pq.read_schema(path).metadata or {}
        raw = meta.get(_MANIFEST_META_KEY)
        return json.loads(raw) if raw else None
    except Exception:
        return None  # unreadable/partial file → re-encode


def chunk_content_crc(chunk: pa.Table) -> int:
    """Chunk-level content fingerprint: CRC32 chained over every
    column's canonical bytes in sorted-name order. Stored in the
    manifest entry (``data_crc``) and compared (a) before reusing a
    committed chunk on resume and (b) against the file-embedded entry
    when decoding a historical snapshot (time-travel integrity)."""
    crc = 0
    for name in sorted(chunk.column_names):
        crc = zlib.crc32(name.encode(), crc)
        crc = content_crc(chunk.column(name).combine_chunks(), crc)
    return crc


def _chunk_matches(prev: dict, chunk: pa.Table,
                   key_cols: tuple[str, ...]) -> bool:
    """Resume guard: a committed chunk is reused only when its stored
    content fingerprint matches the current slice — row count or
    key-range equality alone would silently serve stale data after a
    rewrite that changed non-key values. The key-range min/max check
    runs first as an O(1) negative screen; the CRC pass is
    memcpy-speed, ~100x cheaper than re-encoding."""
    if prev.get("data_crc") is None:
        return False  # pre-0.2 entry: no fingerprint → re-encode
    kc = key_cols[0]
    m = prev.get("columns", {}).get(kc)
    if m is not None and kc in chunk.column_names and chunk.num_rows:
        col = chunk.column(kc)
        # rows are sorted by key within the chunk slice
        if (m.get("min") != manifest.stat_value(col[0].as_py())
                or m.get("max") != manifest.stat_value(col[-1].as_py())):
            return False
    return prev["data_crc"] == chunk_content_crc(chunk)


def _encode_or_reuse(chunk: pa.Table, chunk_id: str, table_dir: str,
                     key_cols: tuple[str, ...], overrides: dict,
                     resume: bool, bloom_cols: tuple[str, ...],
                     attempt: str,
                     token_bloom_cols: tuple[str, ...] = (),
                     cache: dict | None = None) -> dict:
    """Encode one chunk table → write its file → manifest entry; reuse
    a committed fingerprint-identical chunk when ``resume``."""
    fpath = os.path.join(table_dir, "chunks", f"chunk-{chunk_id}.parquet")
    if resume and os.path.exists(fpath):
        prev = read_chunk_entry(fpath)
        if (prev is not None and prev["n_rows"] == chunk.num_rows
                and _chunk_matches(prev, chunk, key_cols)):
            prev["reused"] = True
            prev["attempt"] = attempt
            return prev
    t0 = time.time()
    blobs, columns_meta = {}, {}
    for name in chunk.column_names:
        arr = chunk.column(name).combine_chunks()
        shredder = None
        if pa.types.is_struct(arr.type):
            shredder = _encode_struct_shredded
        elif ((pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type))
                and pa.types.is_struct(arr.type.value_type)):
            shredder = _encode_list_struct_shredded
        elif pa.types.is_map(arr.type):
            shredder = _encode_map_shredded  # may decline (None)
        if shredder is not None and name not in overrides:
            shredded = shredder(arr)
            if shredded is not None:
                parts, meta = shredded
                columns_meta[name] = meta
                for suffix, blob in parts.items():
                    key = name if suffix == "" else f"{name}.{suffix}"
                    blobs[BLOB_COL_PREFIX + key] = blob
                continue
        blob, meta = _encode_one_column(
            arr, name, overrides.get(name),
            with_bloom=name in bloom_cols,
            with_token_bloom=name in token_bloom_cols,
            cache=cache,
        )
        columns_meta[name] = meta
        blobs[BLOB_COL_PREFIX + name] = blob
    entry = {
        "chunk_id": chunk_id,
        "file": os.path.join("chunks", f"chunk-{chunk_id}.parquet"),
        "n_rows": chunk.num_rows,
        "data_crc": chunk_content_crc(chunk),
        "sort_order": list(key_cols),
        "columns": columns_meta,
        "raw_bytes": sum(m["raw_bytes"] for m in columns_meta.values()),
        "enc_bytes": sum(m["enc_bytes"] for m in columns_meta.values()),
        "engine": manifest.ENGINE_VERSION,
        "attempt": attempt,
        "reused": False,
        "encode_s": 0.0,
    }
    ftbl = pa.table(
        {k: pa.array([v], pa.large_binary()) for k, v in blobs.items()}
    )
    entry["encode_s"] = round(time.time() - t0, 4)
    _write_chunk_file(fpath, ftbl, entry)
    return entry


def make_encode_fn(table_dir: str, key_cols: tuple[str, ...],
                   overrides: dict[str, tuple[str, str]] | None = None,
                   resume: bool = True, chunk_prefix: str = "",
                   bloom_cols: tuple[str, ...] = (),
                   token_bloom_cols: tuple[str, ...] = ()):
    """Build the mapInArrow UDF: iterator[RecordBatch] → entry_json rows.

    ``chunk_prefix`` namespaces chunk ids (streaming micro-batches use
    one prefix per batch so appends never collide)."""
    overrides = overrides or {}

    def encode_partition(batches):
        from pyspark import TaskContext

        tc = TaskContext.get()
        attempt = f"task{tc.taskAttemptId()}" if tc else "local"
        import pyarrow.compute as pc

        blist = list(batches)
        if not blist:
            return
        tbl = pa.Table.from_batches(blist)
        if tbl.num_rows == 0:
            return
        # sort HERE (pyarrow radix/merge sort) instead of a JVM
        # sortWithinPartitions: the keys are unique, so the total order
        # — and therefore every chunk's bytes and data_crc — is
        # identical, at ~1/20th the cost of Spark's row sorter
        sort_keys = [(k, "ascending") for k in key_cols]
        if "_ck" in tbl.column_names:
            tbl = tbl.take(pc.sort_indices(
                tbl, sort_keys=[("_ck", "ascending")] + sort_keys
            )).combine_chunks()
            ck = tbl.column("_ck").to_numpy(zero_copy_only=False)
            data = tbl.drop_columns(["_ck"])
        else:
            # locality mode (write_table(shuffle=False)): the whole
            # input partition is one chunk, id = partition ordinal
            tbl = tbl.take(pc.sort_indices(tbl, sort_keys=sort_keys)) \
                .combine_chunks()
            pid = tc.partitionId() if tc else 0
            ck = np.full(tbl.num_rows, pid, dtype=np.int64)
            data = tbl
        # partition may hold several chunk keys (hash collisions) — rows
        # are sorted by _ck first, so each chunk is a contiguous slice.
        bounds = np.flatnonzero(np.diff(ck)) + 1
        starts = np.concatenate([[0], bounds, [len(ck)]])
        # one symbol-table cache per TASK: consecutive chunks of a
        # column share a trained FSST table (determinism: the cache
        # never outlives the task, and chunk order in it is fixed)
        enc_cache: dict = {}
        for i in range(len(starts) - 1):
            lo, hi = int(starts[i]), int(starts[i + 1])
            chunk_id = f"{chunk_prefix}{int(ck[lo]):06d}"
            entry = _encode_or_reuse(
                data.slice(lo, hi - lo), chunk_id, table_dir, key_cols,
                overrides, resume, bloom_cols, attempt, token_bloom_cols,
                cache=enc_cache,
            )
            yield pa.RecordBatch.from_pydict(
                {"chunk_id": pa.array([chunk_id]),
                 "entry_json": pa.array([json.dumps(entry)])}
            )

    return encode_partition


def make_direct_encode_fn(table_dir: str, key_cols: tuple[str, ...],
                          overrides: dict | None = None,
                          resume: bool = True,
                          bloom_cols: tuple[str, ...] = ()):
    """Direct-path encode: each task READS ITS OWN input parquet files
    with pyarrow and encodes them as one chunk — no JVM scan, no
    shuffle, no Arrow JVM→Python transfer (only file paths cross the
    boundary). The right plan when the input is already
    conversation-grouped: at 1000 executors every task streams its
    shard straight from storage into the kernels."""
    overrides = overrides or {}

    def encode_files(batches):
        import pyarrow.compute as pc
        from pyspark import TaskContext

        tc = TaskContext.get()
        attempt = f"task{tc.taskAttemptId()}" if tc else "local"
        enc_cache: dict = {}
        for b in batches:
            for row in range(b.num_rows):
                chunk_id = b.column("chunk_id")[row].as_py()
                files = json.loads(b.column("files")[row].as_py())
                tbl = pa.concat_tables([pq.read_table(f) for f in files])
                if tbl.num_rows == 0:
                    continue
                idx = pc.sort_indices(
                    tbl, sort_keys=[(k, "ascending") for k in key_cols]
                )
                tbl = tbl.take(idx).combine_chunks()
                entry = _encode_or_reuse(
                    tbl, chunk_id, table_dir, key_cols, overrides,
                    resume, bloom_cols, attempt, cache=enc_cache,
                )
                yield pa.RecordBatch.from_pydict(
                    {"chunk_id": pa.array([chunk_id]),
                     "entry_json": pa.array([json.dumps(entry)])}
                )

    return encode_files
