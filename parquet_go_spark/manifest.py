"""Iceberg-style manifests: per-chunk lineage/metrics + atomic commit.

Plays the role of Parquet's FileMetaData footer + ColumnMetaData
(parquet.thrift:1257-1314, 875-940) at table granularity: every encoded
chunk gets a manifest entry with per-column codec chain, sizes, stats,
CRC and lineage; a snapshot commit is an atomic rename of
``_manifest_list.json``. This is what makes encode jobs resumable from
checkpoint (north_rule) — a rerun skips chunk files that are already
present and fingerprint-valid.

Manifests are SHARDED (Iceberg manifest-list parity): entries are
grouped by chunk-id prefix (``chunk_id[:-4]`` → ≤10⁴ chunks per
shard), each shard is one immutable JSON file named after the snapshot
that created it, and a commit reuses the parent's file for any shard
whose entry list is unchanged. An append that touches one shard
rewrites ONE file — at the 10¹²-turn frame (~4M chunks) a streaming
micro-batch commit stays O(batch), not O(table).

Layout under a table dir:

    chunks/chunk-<key>.parquet           one file per chunk (blob rows)
    _manifests/manifest-<n>-<shard>.json entries for one shard,
                                         written by snapshot n
    _manifests/snap-<n>.json             snapshot n's listing
                                         (shard refs + metadata)
    _manifest_list.json                  current snapshot pointer
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

__all__ = ["commit", "commit_shards", "load", "load_refs",
           "expire_snapshots", "list_chunk_files", "stat_value",
           "check_chunk_layout", "ENGINE_VERSION",
           "IncompatibleTableError"]

ENGINE_VERSION = "parquet_go_spark-0.2.0"

# Chunk FILE layout generation: bumped when the on-disk chunk parquet
# schema changes incompatibly (0.1 = row-per-blob; 0.2 = one row with
# b_<col> blob columns + embedded entry). Entries record the writing
# engine; readers refuse older layouts with a migration error instead
# of failing half-way through a scan (or silently mis-pruning on a
# bloom whose hash scheme changed between layouts).
MIN_READABLE_LAYOUT = (0, 2)


class IncompatibleTableError(RuntimeError):
    """Table contains chunk files written by an incompatible engine
    layout; rewrite (decode with the old engine, re-encode) to read."""


def _entry_layout(e: dict) -> tuple[int, int]:
    eng = e.get("engine") or ""
    try:
        ver = eng.rsplit("-", 1)[1].split(".")
        return int(ver[0]), int(ver[1])
    except (IndexError, ValueError):
        return (0, 1)  # pre-0.2 entries lack/garble the engine field


def check_chunk_layout(entries: list[dict]) -> None:
    """Raise IncompatibleTableError if any entry's chunk file uses a
    layout older than this reader supports (decode would otherwise
    fail mid-scan with an opaque parquet column error — and pre-0.2
    blooms use a different hash scheme, so trusting them could
    silently skip live chunks)."""
    for e in entries:
        if _entry_layout(e) < MIN_READABLE_LAYOUT:
            raise IncompatibleTableError(
                f"chunk {e.get('chunk_id')!r} was written by "
                f"{e.get('engine') or 'a pre-0.2 engine'} using the "
                "row-per-blob chunk layout; this reader supports layout "
                f">= {'.'.join(map(str, MIN_READABLE_LAYOUT))}. "
                "Migrate by decoding the table with the matching engine "
                "version and re-encoding with write_table()."
            )


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


def _shard_of(chunk_id: str) -> str:
    """Stable shard key: everything but the last 4 digits → up to 10⁴
    chunk ids per shard, and a chunk_prefix (streaming batch, compaction
    namespace) maps to its own shard family."""
    return chunk_id[:-4] if len(chunk_id) > 4 else ""


def _group_by_shard(entries: list[dict]) -> dict[str, list[dict]]:
    out: dict[str, list[dict]] = {}
    for e in entries:
        out.setdefault(_shard_of(e["chunk_id"]), []).append(e)
    for ents in out.values():
        ents.sort(key=lambda e: e["chunk_id"])
    return out


_LOCK_TIMEOUT_S = 120.0


class CommitConflict(RuntimeError):
    """Another writer holds the table's commit lock."""


class StaleParent(RuntimeError):
    """The snapshot this commit was prepared against is no longer
    current (optimistic concurrency: re-prepare against the new parent
    and retry)."""


_EXPECT_ANY = object()


def _acquire_commit_lock(table_dir: str, timeout: float):
    """O_CREAT|O_EXCL lock file around the read-merge-swing window so
    two concurrent writers cannot both commit against the same parent
    and silently drop one side's entries. Stale locks (older than
    ``_LOCK_TIMEOUT_S``, e.g. a crashed driver) are broken ATOMICALLY:
    the breaker renames the stale lock to a unique tombstone first —
    os.rename succeeds for exactly one racer, so two blocked writers
    that both observe staleness cannot each unlink the other's freshly
    re-created lock and both enter the critical section."""
    import time as _t

    path = os.path.join(table_dir, "_commit.lock")
    os.makedirs(table_dir, exist_ok=True)
    deadline = _t.monotonic() + timeout
    first = True
    while True:
        # EVERY blocked iteration honors the deadline and backs off —
        # the claim/vanish retry paths below all loop back through here,
        # so lock churn cannot busy-spin or outlive ``timeout``
        if not first:
            if _t.monotonic() >= deadline:
                raise CommitConflict(
                    f"commit lock {path} held by another writer"
                )
            _t.sleep(0.05)
        first = False
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, f"{os.getpid()} {_t.time()}".encode())
            os.close(fd)
            return path
        except FileExistsError:
            pass
        try:
            # re-stat IMMEDIATELY before the claim: shrinks the window
            # where a lock deleted-and-recreated fresh between stats
            # could be stolen to two syscalls
            if _t.time() - os.path.getmtime(path) <= _LOCK_TIMEOUT_S:
                continue  # held and live — wait
            # claim-by-rename: only ONE racer wins; losers get ENOENT
            tomb = f"{path}.stale-{os.getpid()}-{_t.time_ns()}"
            os.rename(path, tomb)
        except OSError:
            continue  # lock vanished / lost the claim race — retry
        try:
            stole_fresh = (
                _t.time() - os.path.getmtime(tomb) <= _LOCK_TIMEOUT_S
            )
        except OSError:
            stole_fresh = False
        if stole_fresh:
            # the rename grabbed a lock re-created fresh inside the
            # two-syscall window: give it back (link fails EEXIST if a
            # third writer already locked; that residual sliver is the
            # documented remaining race)
            try:
                os.link(tomb, path)
            except OSError:
                pass
        try:
            os.unlink(tomb)
        except OSError:
            pass


def commit(table_dir: str, entries: list[dict], schema_ddl: str,
           extra: dict | None = None, append: bool = False,
           lock_timeout: float = 30.0) -> int:
    """Write changed manifest shards + snap-<n>.json, then atomically
    swing _manifest_list.json — all under the table's commit lock
    (optimistic writers queue; a crashed writer's stale lock is
    broken after a timeout).

    ``append=True`` merges into the parent snapshot's entries keyed by
    chunk_id (same id overrides — idempotent batch replay); shards
    without new entries reuse the parent's manifest file untouched."""
    lock = _acquire_commit_lock(table_dir, lock_timeout)
    try:
        return _commit_locked(table_dir, entries, schema_ddl, extra, append)
    finally:
        try:
            os.unlink(lock)
        except OSError:
            pass


def _shard_totals(ents: list[dict]) -> dict:
    return {
        "n_chunks": len(ents),
        "n_rows": sum(e["n_rows"] for e in ents),
        "raw_bytes": sum(e["raw_bytes"] for e in ents),
        "enc_bytes": sum(e["enc_bytes"] for e in ents),
    }


def _read_shard(table_dir: str, ref: dict) -> list[dict]:
    with open(os.path.join(table_dir, ref["file"])) as f:
        return json.load(f)["entries"]


def _commit_locked(table_dir: str, entries: list[dict], schema_ddl: str,
                   extra: dict | None = None, append: bool = False) -> int:
    """Shard-incremental commit: only the shards this commit TOUCHES
    are read and rewritten. Untouched shards on append carry their
    file AND their per-shard totals forward (refs store
    n_rows/raw/enc, so listing totals are O(shards) sums) — the driver
    never materializes the full entry list. At the 10¹²-turn frame a
    streaming micro-batch commit therefore reads O(batch) manifest
    bytes, not O(table); refs written before totals existed are
    enriched lazily (one shard read each, once)."""
    prev = load_refs(table_dir)
    snapshot_id = (prev["snapshot_id"] + 1) if prev else 0
    new_by_shard = _group_by_shard(entries)
    prev_refs: dict[str, dict] = {}
    if prev is not None and prev.get("manifest_shards") is not None:
        prev_refs = {r["shard"]: dict(r) for r in prev["manifest_shards"]}
    elif prev is not None and append:
        # pre-0.2 single-file parent: merge its entries wholesale (no
        # shard files to reuse) — one-time legacy cost
        base = _group_by_shard(_read_entries(table_dir, prev))
        for shard, ents in base.items():
            cur = {e["chunk_id"]: e for e in ents}
            for e in new_by_shard.get(shard, []):
                cur[e["chunk_id"]] = e
            new_by_shard[shard] = sorted(cur.values(),
                                         key=lambda e: e["chunk_id"])

    shard_refs: list[dict] = []
    if append:
        for shard, ref in prev_refs.items():
            if shard in new_by_shard:
                continue  # touched: merged below
            if "n_rows" not in ref:  # pre-totals ref: enrich once
                ref.update(_shard_totals(_read_shard(table_dir, ref)))
            shard_refs.append(ref)
    for shard in sorted(new_by_shard):
        ents = new_by_shard[shard]
        if not ents:
            continue
        reused = False
        if shard in prev_refs:
            parent_ents = _read_shard(table_dir, prev_refs[shard])
            if append:
                merged = {e["chunk_id"]: e for e in parent_ents}
                for e in ents:
                    merged[e["chunk_id"]] = e
                ents = sorted(merged.values(),
                              key=lambda e: e["chunk_id"])
            if ents == parent_ents:  # idempotent replay / no-op shard
                ref = dict(prev_refs[shard])
                if "n_rows" not in ref:
                    ref.update(_shard_totals(parent_ents))
                shard_refs.append(ref)
                reused = True
        if not reused:
            fname = f"manifest-{snapshot_id}-{shard or 'root'}.json"
            fpath = os.path.join(table_dir, "_manifests", fname)
            _atomic_write_json(fpath, {"entries": ents})
            shard_refs.append({
                "shard": shard,
                "file": os.path.relpath(fpath, table_dir),
                **_shard_totals(ents),
            })

    shard_refs.sort(key=lambda r: r["shard"])
    listing = {
        "snapshot_id": snapshot_id,
        "engine": ENGINE_VERSION,
        "schema_ddl": schema_ddl,
        "manifest_shards": shard_refs,
        "n_chunks": sum(r["n_chunks"] for r in shard_refs),
        "n_rows": sum(r["n_rows"] for r in shard_refs),
        "raw_bytes": sum(r["raw_bytes"] for r in shard_refs),
        "enc_bytes": sum(r["enc_bytes"] for r in shard_refs),
        "extra": extra or {},
        "parent_snapshot_id": prev["snapshot_id"] if prev else None,
    }
    _atomic_write_json(
        os.path.join(table_dir, "_manifests", f"snap-{snapshot_id}.json"),
        listing,
    )
    _atomic_write_json(os.path.join(table_dir, "_manifest_list.json"), listing)
    return snapshot_id


def _read_entries(table_dir: str, listing: dict) -> list[dict]:
    if "manifest_shards" in listing:
        entries: list[dict] = []
        for ref in listing["manifest_shards"]:
            with open(os.path.join(table_dir, ref["file"])) as f:
                entries.extend(json.load(f)["entries"])
        entries.sort(key=lambda e: e["chunk_id"])
        return entries
    # pre-0.2 format: one flat manifest file
    with open(os.path.join(table_dir, listing["manifest"])) as f:
        return json.load(f)["entries"]


def load_refs(table_dir: str, snapshot_id: int | None = None) -> dict | None:
    """Snapshot listing WITHOUT materializing chunk entries — shard
    refs + totals only. This is the scale-safe entry point: at the
    10¹²-turn frame (~4M chunks) the entries are GBs of JSON that
    must stay in executor tasks (read_table's distributed pruning),
    never on the driver. ``load`` keeps the eager-entry contract for
    small tables and internal rewrite ops."""
    lpath = os.path.join(table_dir, "_manifest_list.json")
    if not os.path.exists(lpath):
        return None
    with open(lpath) as f:
        listing = json.load(f)
    if snapshot_id is not None and snapshot_id != listing["snapshot_id"]:
        spath = os.path.join(table_dir, "_manifests",
                             f"snap-{snapshot_id}.json")
        mpath = os.path.join(table_dir, "_manifests",
                             f"manifest-{snapshot_id}.json")
        if os.path.exists(spath):
            with open(spath) as f:
                listing = json.load(f)
        elif os.path.exists(mpath):  # pre-0.2 snapshot
            listing = {k: v for k, v in listing.items()
                       if k != "manifest_shards"}
            listing.update(snapshot_id=snapshot_id,
                           manifest=os.path.relpath(mpath, table_dir))
            # the copied totals are the CURRENT snapshot's — recompute
            # from the legacy manifest so count_rows() on a pre-0.2
            # snapshot id is historical, not silently current (legacy
            # single-file manifests are small; one read, this path only)
            with open(mpath) as f:
                ents = json.load(f)["entries"]
            listing.update(
                n_chunks=len(ents),
                n_rows=sum(e["n_rows"] for e in ents),
                raw_bytes=sum(e["raw_bytes"] for e in ents),
                enc_bytes=sum(e["enc_bytes"] for e in ents),
            )
        else:
            raise FileNotFoundError(
                f"snapshot {snapshot_id} not found in {table_dir}"
            )
    return listing


def load(table_dir: str, snapshot_id: int | None = None) -> dict | None:
    """Load a snapshot (listing + chunk entries); None if uncommitted.

    ``snapshot_id`` selects a historical snapshot (time travel — shard
    files are immutable and retained per snapshot). Decode verifies
    each chunk file's embedded entry against the snapshot's
    (chunk_id/data_crc/enc_bytes), so a chunk rewritten or GC'd after
    the snapshot fails loudly instead of decoding wrong data."""
    listing = load_refs(table_dir, snapshot_id)
    if listing is None:
        return None
    listing["entries"] = _read_entries(table_dir, listing)
    listing["n_chunks"] = len(listing["entries"])
    listing["n_rows"] = sum(e["n_rows"] for e in listing["entries"])
    return listing


def commit_shards(table_dir: str, shard_refs: list[dict],
                  schema_ddl: str, extra: dict | None = None,
                  lock_timeout: float = 30.0,
                  expect_parent=_EXPECT_ANY) -> int:
    """Commit a snapshot from PRE-WRITTEN shard manifest files (the
    distributed-commit path: executor tasks wrote one immutable
    ``_manifests/`` file per shard and the driver holds only the
    O(shards) summaries — per-chunk JSON never reaches the driver).

    Each ref: {shard, file (relative), n_chunks, n_rows, raw_bytes,
    enc_bytes}. The ref list must describe the FULL snapshot — append
    merges are prepared by the caller (table._commit_append_distributed
    merges overlapping shards task-side) and validated here via
    ``expect_parent``: if the current snapshot is no longer the one the
    refs were prepared against, StaleParent is raised so the caller can
    re-merge and retry (optimistic concurrency)."""
    lock = _acquire_commit_lock(table_dir, lock_timeout)
    try:
        prev = load_refs(table_dir)
        if expect_parent is not _EXPECT_ANY:
            cur = prev["snapshot_id"] if prev else None
            if cur != expect_parent:
                raise StaleParent(
                    f"prepared against snapshot {expect_parent}, "
                    f"current is {cur}"
                )
        snapshot_id = (prev["snapshot_id"] + 1) if prev else 0
        # refs keep per-shard totals: later APPEND commits carry
        # untouched shards forward without reading their files
        refs = [
            {"shard": r["shard"], "file": r["file"],
             "n_chunks": r["n_chunks"], "n_rows": r["n_rows"],
             "raw_bytes": r["raw_bytes"], "enc_bytes": r["enc_bytes"]}
            for r in sorted(shard_refs, key=lambda r: r["shard"])
        ]
        listing = {
            "snapshot_id": snapshot_id,
            "engine": ENGINE_VERSION,
            "schema_ddl": schema_ddl,
            "manifest_shards": refs,
            "n_chunks": sum(r["n_chunks"] for r in shard_refs),
            "n_rows": sum(r["n_rows"] for r in shard_refs),
            "raw_bytes": sum(r["raw_bytes"] for r in shard_refs),
            "enc_bytes": sum(r["enc_bytes"] for r in shard_refs),
            "extra": extra or {},
            "parent_snapshot_id": prev["snapshot_id"] if prev else None,
        }
        _atomic_write_json(
            os.path.join(table_dir, "_manifests",
                         f"snap-{snapshot_id}.json"),
            listing,
        )
        _atomic_write_json(
            os.path.join(table_dir, "_manifest_list.json"), listing
        )
        return snapshot_id
    finally:
        try:
            os.unlink(lock)
        except OSError:
            pass


def _snapshot_ids_on_disk(mdir: str) -> set[int]:
    """Every snapshot id present in the manifest dir: snap-<n>.json
    (0.2 format) AND pre-0.2 single-file manifest-<n>.json snapshots
    (exactly one dash — shard files are manifest-<n>-<shard>.json).
    Missing the pre-0.2 ids would make ``retained`` empty on a legacy
    table and expire would delete EVERY chunk of a live table."""
    import re

    ids: set[int] = set()
    for fn in os.listdir(mdir):
        if fn.startswith("snap-") and fn.endswith(".json"):
            try:
                ids.add(int(fn[len("snap-"):-len(".json")]))
            except ValueError:
                pass
        else:
            m = re.fullmatch(r"manifest-(\d+)\.json", fn)
            if m:
                ids.add(int(m.group(1)))
    return ids


# an encode job's in-flight marker protects its uncommitted chunk files
# from GC; markers whose mtime goes stale past the TTL are crashed jobs
# and stop protecting. LIVE jobs longer than the TTL keep protection by
# heartbeating the marker's mtime (table._inflight_guard does this every
# INFLIGHT_HEARTBEAT_S) — the GC floor itself comes from the immutable
# "start" stamp inside the marker JSON, so the heartbeat never raises
# the floor past chunks the job wrote earlier.
INFLIGHT_TTL_S = 3600.0
INFLIGHT_HEARTBEAT_S = INFLIGHT_TTL_S / 6.0


def begin_inflight(table_dir: str) -> str:
    """Create an in-flight marker BEFORE any chunk file of an encode
    job is written: expire_snapshots never deletes chunk/shard files
    newer than the oldest active marker's START stamp, so a
    long-running encode whose chunks land before another writer's later
    commit (or under clock skew) cannot have them GC'd mid-job — the
    explicit protocol the old 'newer than the last commit' mtime
    heuristic only approximated. Liveness is the marker's mtime: the
    holder heartbeats it (heartbeat_inflight / os.utime) so multi-hour
    backfills outlive INFLIGHT_TTL_S; markers whose mtime goes stale
    are crashed jobs and are swept by the next expire."""
    import time as _t
    import uuid

    d = os.path.join(table_dir, "_inflight")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"job-{uuid.uuid4().hex[:12]}.json")
    _atomic_write_json(path, {"pid": os.getpid(), "start": _t.time()})
    return path


def heartbeat_inflight(marker: str) -> None:
    """Refresh a marker's liveness (mtime) without moving its GC floor
    — the floor reads the JSON "start" stamp, not the mtime."""
    try:
        os.utime(marker)
    except OSError:
        pass


def end_inflight(marker: str) -> None:
    try:
        os.unlink(marker)
    except OSError:
        pass


def _inflight_floor(table_dir: str) -> float:
    """START stamp of the OLDEST live in-flight marker, or +inf if none
    — chunk/shard files at/after this instant belong to running encode
    jobs. Liveness = mtime within INFLIGHT_TTL_S (heartbeat-refreshed);
    pre-heartbeat markers without a "start" stamp fall back to mtime."""
    import time as _t

    d = os.path.join(table_dir, "_inflight")
    floor = float("inf")
    if not os.path.isdir(d):
        return floor
    now = _t.time()
    for fn in os.listdir(d):
        p = os.path.join(d, fn)
        try:
            m = os.path.getmtime(p)
        except OSError:
            continue
        if now - m > INFLIGHT_TTL_S:  # crashed job: sweep, don't protect
            try:
                os.unlink(p)
            except OSError:
                pass
            continue
        start = m
        try:
            with open(p) as fh:
                start = float(json.load(fh).get("start", m))
        except (OSError, ValueError, TypeError):
            pass
        floor = min(floor, start)
    return floor


# above this many chunks expire goes distributed (keep-sets built inside
# Spark tasks); mirrors table.DISTRIBUTED_MANIFEST_MIN_CHUNKS
_DISTRIBUTED_EXPIRE_MIN_CHUNKS = 4096


def expire_snapshots(table_dir: str, keep: int = 2,
                     lock_timeout: float = 30.0, spark=None) -> dict:
    """Iceberg expire_snapshots parity: retain the latest ``keep``
    snapshots, delete older snapshot listings, manifest shards
    referenced only by them, and chunk files no retained snapshot
    references. Frees the space compaction/delete/upsert superseded
    while keeping recent time travel intact.

    Runs under the table's commit lock (a concurrent commit racing the
    unlink loop could otherwise reference freshly deleted files), and
    never deletes chunk files newer than the oldest active in-flight
    marker (see begin_inflight) or the current commit — those belong to
    an encode job that has not committed yet (resume checkpoint files).

    Pass ``spark`` to let large tables (≥ _DISTRIBUTED_EXPIRE_MIN_CHUNKS
    chunks) build their keep-sets INSIDE Spark tasks: shard files are
    read and the disk listing anti-joined task-side, so the driver
    handles only O(shards) refs and the final unlink list — never the
    per-chunk entry JSON (GBs at the 10¹²-turn frame)."""
    lock = _acquire_commit_lock(table_dir, lock_timeout)
    try:
        refs = load_refs(table_dir)
        if (spark is not None and refs is not None
                and refs.get("manifest_shards") is not None
                and refs.get("n_chunks", 0)
                >= _DISTRIBUTED_EXPIRE_MIN_CHUNKS):
            return _expire_locked_distributed(spark, table_dir, keep)
        return _expire_locked(table_dir, keep)
    finally:
        try:
            os.unlink(lock)
        except OSError:
            pass


def _retained_expired(table_dir: str, current_id: int,
                      keep: int) -> tuple[list[int], list[int]]:
    mdir = os.path.join(table_dir, "_manifests")
    snaps = sorted(_snapshot_ids_on_disk(mdir))
    retained = sorted(
        {s for s in snaps if s > current_id - keep} | {current_id}
    )
    return retained, [s for s in snaps if s not in retained]


def _gc_floor(table_dir: str) -> float:
    """Chunk files at/after this instant are never GC'd: the oldest
    active in-flight marker, or failing that the current commit."""
    try:
        floor = os.path.getmtime(
            os.path.join(table_dir, "_manifest_list.json"))
    except OSError:
        floor = float("inf")
    return min(floor, _inflight_floor(table_dir))


def _cleanup_manifest_files(mdir: str, expired: list[int],
                            keep_shards: set,
                            floor: float = float("inf")) -> None:
    """Delete expired snapshot listings and unreferenced shard files —
    EXCEPT shard files at/after ``floor`` (the GC floor): an encode
    job's _write_shards_distributed / _commit_append_distributed merge
    tasks write manifest-* files BEFORE taking the commit lock, so a
    concurrent expire racing that window must spare them exactly like
    uncommitted chunk files. Crashed attempts' orphan shards lose
    protection when their in-flight marker passes INFLIGHT_TTL_S and
    are swept by the next expire."""
    expired_set = set(expired)
    for fn in os.listdir(mdir):
        if fn.startswith("snap-"):
            try:
                sid = int(fn[len("snap-"):-len(".json")])
            except ValueError:
                continue
            if sid in expired_set:
                os.unlink(os.path.join(mdir, fn))
        elif fn.startswith("manifest-") and fn not in keep_shards:
            fpath = os.path.join(mdir, fn)
            try:
                if os.path.getmtime(fpath) >= floor:
                    continue  # pending commit's shards, in-flight
                os.unlink(fpath)
            except OSError:
                pass


def _expire_locked_distributed(spark, table_dir: str, keep: int) -> dict:
    """Distributed expire: the driver touches only snapshot listings
    (O(shards) refs each) and the deletable-file list; referenced-chunk
    keep-sets come from shard files read INSIDE tasks, and the chunks
    dir is listed executor-side too (object stores list in parallel by
    prefix; the local-FS stand-in is one streaming task)."""
    import pandas as _pd
    from pyspark.sql import functions as F

    current = load_refs(table_dir)
    mdir = os.path.join(table_dir, "_manifests")
    retained, expired = _retained_expired(
        table_dir, current["snapshot_id"], keep)
    keep_shards: set[str] = set()
    shard_files: set[str] = set()
    for s in retained:
        listing = load_refs(table_dir, snapshot_id=s)
        if listing.get("manifest_shards") is None:
            # a retained pre-0.2 snapshot: legacy single-file manifests
            # predate the scale this path exists for — driver walk
            return _expire_locked(table_dir, keep)
        for ref in listing["manifest_shards"]:
            keep_shards.add(os.path.basename(ref["file"]))
            shard_files.add(ref["file"])
    floor = _gc_floor(table_dir)
    cdir = os.path.join(table_dir, "chunks")

    def referenced(pdfs):
        import json as _json
        import os as _os

        for pdf in pdfs:
            names = []
            for f in pdf["f"]:
                with open(_os.path.join(table_dir, f)) as fh:
                    names.extend(_os.path.basename(e["file"])
                                 for e in _json.load(fh)["entries"])
            yield _pd.DataFrame({"name": names})

    def list_chunks(pdfs):
        import os as _os

        for pdf in pdfs:
            for d in pdf["d"]:
                if not _os.path.isdir(d):
                    continue
                batch = []
                for fn in _os.listdir(d):
                    if not fn.endswith(".parquet"):
                        continue
                    try:
                        m = _os.path.getmtime(_os.path.join(d, fn))
                    except OSError:
                        continue
                    batch.append((fn, m))
                    if len(batch) >= 65536:
                        yield _pd.DataFrame(batch,
                                            columns=["name", "mtime"])
                        batch = []
                if batch:
                    yield _pd.DataFrame(batch, columns=["name", "mtime"])

    par = min(len(shard_files),
              spark.sparkContext.defaultParallelism) or 1
    keep_df = spark.createDataFrame(
        _pd.DataFrame({"f": sorted(shard_files)}), "f string"
    ).repartition(par).mapInPandas(referenced, "name string")
    disk_df = spark.createDataFrame(
        _pd.DataFrame({"d": [cdir]}), "d string"
    ).mapInPandas(list_chunks, "name string, mtime double")
    def unlink_chunks(pdfs):
        import os as _os

        for pdf in pdfs:
            n = 0
            for name in pdf["name"]:
                try:
                    _os.unlink(_os.path.join(cdir, name))
                    n += 1
                except OSError:
                    pass
            yield _pd.DataFrame({"n": [n]})

    # the unlink happens INSIDE tasks (r4 VERDICT: a mass-crash can
    # leave O(millions) orphans — a driver-side list would balloon);
    # only the scalar per-task counts come back
    row = (
        disk_df.filter(F.col("mtime") < F.lit(floor))
        .join(keep_df, "name", "left_anti")
        .repartition(max(spark.sparkContext.defaultParallelism, 1))
        .mapInPandas(unlink_chunks, "n long")
        .agg(F.sum("n").alias("n")).collect()
    )
    deleted_chunks = int(row[0]["n"] or 0)
    _cleanup_manifest_files(mdir, expired, keep_shards, floor)
    return {
        "expired_snapshots": len(expired),
        "retained_snapshots": retained,
        "deleted_chunks": deleted_chunks,
    }


def _expire_locked(table_dir: str, keep: int) -> dict:
    current = load_refs(table_dir)
    if current is None:
        return {"expired_snapshots": 0, "deleted_chunks": 0}
    mdir = os.path.join(table_dir, "_manifests")
    retained, expired = _retained_expired(
        table_dir, current["snapshot_id"], keep)
    keep_shards: set[str] = set()
    keep_files: set[str] = set()
    for s in retained:
        listing = load(table_dir, snapshot_id=s)
        for ref in listing.get("manifest_shards", []):
            keep_shards.add(os.path.basename(ref["file"]))
        if listing.get("manifest"):  # pre-0.2 single-file snapshot
            keep_shards.add(os.path.basename(listing["manifest"]))
        for e in listing["entries"]:
            keep_files.add(os.path.basename(e["file"]))
    # in-flight protection: chunk files written at/after the oldest
    # ACTIVE in-flight marker belong to a running encode job (see
    # begin_inflight). The last-commit mtime stays as a secondary
    # floor for writers predating the marker protocol.
    floor = _gc_floor(table_dir)
    deleted_chunks = 0
    cdir = os.path.join(table_dir, "chunks")
    if os.path.isdir(cdir):
        for fn in os.listdir(cdir):
            if not fn.endswith(".parquet") or fn in keep_files:
                continue
            fpath = os.path.join(cdir, fn)
            try:
                if os.path.getmtime(fpath) >= floor:
                    continue  # in-flight, uncommitted
                os.unlink(fpath)
                deleted_chunks += 1
            except OSError:
                pass
    _cleanup_manifest_files(mdir, expired, keep_shards, floor)
    return {
        "expired_snapshots": len(expired),
        "retained_snapshots": retained,
        "deleted_chunks": deleted_chunks,
    }


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
