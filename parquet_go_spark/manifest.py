"""Iceberg-style manifests: per-chunk lineage/metrics + atomic commit.

Plays the role of Parquet's FileMetaData footer + ColumnMetaData
(parquet.thrift:1257-1314, 875-940) at table granularity: every encoded
chunk gets a manifest entry with per-column codec chain, sizes, stats,
CRC and lineage; a snapshot commit is an atomic rename of
``_manifest_list.json``. This is what makes encode jobs resumable from
checkpoint (north_rule) — a rerun skips chunk files that are already
present and CRC-valid.

Layout under a table dir:

    chunks/chunk-<key>.parquet     one file per chunk (blob rows)
    _manifests/manifest-<n>.json   chunk entry list for snapshot n
    _manifest_list.json            current snapshot pointer + schema
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

__all__ = ["commit", "load", "list_chunk_files", "stat_value", "ENGINE_VERSION"]

ENGINE_VERSION = "parquet_go_spark-0.2.0"


def stat_value(v: Any):
    """Canonical JSON-typed form of a column min/max statistic.

    Numbers stay numbers (numeric comparison in pruning), strings stay
    strings, datetimes become ISO strings (fixed-width → lexicographic
    order == chronological order). Unknown types map to None so pruning
    stays conservative (a chunk without comparable stats is never
    skipped) — the same ordering discipline Parquet pins per type via
    ColumnOrder (parquet.thrift:1045-1111)."""
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    import datetime

    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return None


def _atomic_write_json(path: str, obj: Any) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, separators=(",", ":"))
        os.replace(tmp, path)  # atomic on POSIX
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def commit(table_dir: str, entries: list[dict], schema_ddl: str,
           extra: dict | None = None, append: bool = False) -> int:
    """Write manifest-<snap>.json then atomically swing _manifest_list.json.

    ``append=True`` merges into the parent snapshot's entries keyed by
    chunk_id (same id overrides — idempotent batch replay)."""
    prev = load(table_dir)
    snapshot_id = (prev["snapshot_id"] + 1) if prev else 0
    if append and prev:
        merged = {e["chunk_id"]: e for e in prev["entries"]}
        for e in entries:
            merged[e["chunk_id"]] = e
        entries = list(merged.values())
    mpath = os.path.join(table_dir, "_manifests", f"manifest-{snapshot_id}.json")
    entries = sorted(entries, key=lambda e: e["chunk_id"])
    _atomic_write_json(mpath, {"entries": entries})
    listing = {
        "snapshot_id": snapshot_id,
        "engine": ENGINE_VERSION,
        "schema_ddl": schema_ddl,
        "manifest": os.path.relpath(mpath, table_dir),
        "n_chunks": len(entries),
        "n_rows": sum(e["n_rows"] for e in entries),
        "raw_bytes": sum(e["raw_bytes"] for e in entries),
        "enc_bytes": sum(e["enc_bytes"] for e in entries),
        "extra": extra or {},
        "parent_snapshot_id": prev["snapshot_id"] if prev else None,
    }
    _atomic_write_json(os.path.join(table_dir, "_manifest_list.json"), listing)
    return snapshot_id


def load(table_dir: str, snapshot_id: int | None = None) -> dict | None:
    """Load a snapshot (listing + chunk entries); None if uncommitted.

    ``snapshot_id`` selects a historical snapshot (time travel —
    manifest files are retained per snapshot, Iceberg-style). Caveats:
    chunk ids are content-addressed, so a later write that reuses an id
    (same chunking, no ``chunk_prefix``) rewrites the file in place and
    invalidates older snapshots referencing it — versioned rewrites
    should namespace with ``chunk_prefix``; compaction likewise deletes
    superseded chunk files."""
    lpath = os.path.join(table_dir, "_manifest_list.json")
    if not os.path.exists(lpath):
        return None
    with open(lpath) as f:
        listing = json.load(f)
    if snapshot_id is not None and snapshot_id != listing["snapshot_id"]:
        mpath = os.path.join(table_dir, "_manifests",
                             f"manifest-{snapshot_id}.json")
        if not os.path.exists(mpath):
            raise FileNotFoundError(
                f"snapshot {snapshot_id} not found in {table_dir}"
            )
        with open(mpath) as f:
            entries = json.load(f)["entries"]
        listing = dict(listing, snapshot_id=snapshot_id,
                       manifest=os.path.relpath(mpath, table_dir),
                       entries=entries,
                       n_chunks=len(entries),
                       n_rows=sum(e["n_rows"] for e in entries))
        return listing
    with open(os.path.join(table_dir, listing["manifest"])) as f:
        listing["entries"] = json.load(f)["entries"]
    return listing


def list_chunk_files(table_dir: str) -> dict[str, str]:
    """chunk_id → absolute chunk file path for files physically present
    (used for checkpoint resume before any snapshot was committed)."""
    cdir = os.path.join(table_dir, "chunks")
    if not os.path.isdir(cdir):
        return {}
    out = {}
    for fn in os.listdir(cdir):
        if fn.startswith("chunk-") and fn.endswith(".parquet"):
            out[fn[len("chunk-") : -len(".parquet")]] = os.path.join(cdir, fn)
    return out
