"""Atomic JSON commit log for the lake-table format.

Design (public knowledge: the Delta Lake transaction-log protocol and the
Iceberg snapshot/manifest model, re-implemented from scratch):

* ``<table>/_log/v{version:020d}.json`` — one JSON document per commit:
  the canonical table schema at that version, data files added/removed,
  and an optional commit *manifest* (batch_id + lineage) used for
  exactly-once epoch fencing.
* Commits are made atomic with ``os.link`` (create-if-absent): two
  concurrent writers racing for the same version — only one link
  succeeds, the loser retries against the new snapshot.  On a real
  object store this maps to a conditional PUT / catalog swap; the
  protocol is identical.
* Snapshot state = fold of all entries ``<= version``.  Every K commits
  a checkpoint file collapses the fold so log replay stays O(K) at
  10^10-event scale (same role as Delta checkpoints / Iceberg manifest
  lists).

The reference repo's analog is ``CREATE TABLE IF NOT EXISTS`` probing
``information_schema`` (reference: staging/create_staging_tables.py:43-57)
plus the ``audit_datetime`` upload stamp (staging/load_staging_data.py:40);
here both become first-class, atomic, and queryable.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field
from typing import Any

CHECKPOINT_INTERVAL = 20
_LOG_DIR = "_log"


@dataclass
class LogEntry:
    version: int
    schema_json: str  # canonical Spark schema (StructType.json()) at this version
    adds: list[dict[str, Any]] = field(default_factory=list)
    # each add: {"path": rel_path, "bucket": int, "rows": int, "schema_version": int}
    removes: list[str] = field(default_factory=list)
    manifest: dict[str, Any] | None = None  # {"batch_id": ..., lineage...}
    properties: dict[str, Any] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "schema_json": self.schema_json,
                "adds": self.adds,
                "removes": self.removes,
                "manifest": self.manifest,
                "properties": self.properties,
            },
            sort_keys=True,
        )

    @staticmethod
    def from_json(text: str) -> "LogEntry":
        d = json.loads(text)
        return LogEntry(
            version=d["version"],
            schema_json=d["schema_json"],
            adds=d.get("adds", []),
            removes=d.get("removes", []),
            manifest=d.get("manifest"),
            properties=d.get("properties", {}),
        )


@dataclass
class Snapshot:
    """Folded log state at a version."""

    version: int
    schema_json: str
    # rel_path -> add-record (keeps bucket + schema_version for pruned reads)
    live_files: dict[str, dict[str, Any]]
    committed_batch_ids: list[Any]
    schemas: dict[int, str]  # version -> schema_json for every schema change
    properties: dict[str, Any]

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "schema_json": self.schema_json,
                "live_files": self.live_files,
                "committed_batch_ids": self.committed_batch_ids,
                "schemas": {str(k): v for k, v in self.schemas.items()},
                "properties": self.properties,
            },
            sort_keys=True,
        )

    @staticmethod
    def from_json(text: str) -> "Snapshot":
        d = json.loads(text)
        return Snapshot(
            version=d["version"],
            schema_json=d["schema_json"],
            live_files=d["live_files"],
            committed_batch_ids=d["committed_batch_ids"],
            schemas={int(k): v for k, v in d["schemas"].items()},
            properties=d.get("properties", {}),
        )


class CommitConflict(Exception):
    """Another writer committed this version first; re-read and retry."""


class CommitLog:
    # how many folded snapshots to memoize per log (a merge asks for the
    # same version several times: planning, schema, pruned read, commit)
    _SNAP_CACHE_SIZE = 8

    def __init__(self, table_path: str):
        self.table_path = table_path
        self.log_dir = os.path.join(table_path, _LOG_DIR)
        os.makedirs(self.log_dir, exist_ok=True)
        # version -> folded Snapshot.  A snapshot at an EXPLICIT version is
        # immutable (the log is append-only and entry files are never
        # rewritten), so memoizing the fold is safe across writers too.
        # Without this every snapshot() call re-reads O(versions-since-
        # checkpoint) entry files — ~4 calls per merge made the per-batch
        # fixed cost grow with table age (the round-2 bench drift).
        # Callers must treat returned snapshots as read-only.
        self._snap_cache: dict[int, Snapshot] = {}

    # ---- paths ----
    def _entry_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"v{version:020d}.json")

    def _ckpt_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"ckpt-v{version:020d}.json")

    # ---- read side ----
    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.log_dir):
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def read_entry(self, version: int) -> LogEntry:
        with open(self._entry_path(version)) as f:
            return LogEntry.from_json(f.read())

    def _latest_checkpoint_at_or_below(self, version: int) -> Snapshot | None:
        best = None
        for name in os.listdir(self.log_dir):
            if name.startswith("ckpt-v") and name.endswith(".json"):
                v = int(name[6:-5])
                if v <= version and (best is None or v > best):
                    best = v
        if best is None:
            return None
        with open(self._ckpt_path(best)) as f:
            return Snapshot.from_json(f.read())

    def snapshot(self, version: int | None = None) -> Snapshot | None:
        """Fold the log up to ``version`` (default: latest).  Folds are
        memoized per explicit version (immutable once committed); treat
        the returned Snapshot as read-only."""
        latest = self.latest_version()
        if latest is None:
            return None
        version = latest if version is None else version
        hit = self._snap_cache.get(version)
        if hit is not None:
            return hit
        # start from the nearest memoized fold below, else a checkpoint
        base: Snapshot | None = None
        lower = [v for v in self._snap_cache if v < version]
        if lower:
            base = self._snap_cache[max(lower)]
        ckpt = self._latest_checkpoint_at_or_below(version)
        if ckpt is not None and (base is None or ckpt.version > base.version):
            base = ckpt
        if base is not None and base.version == version:
            self._remember(version, base)
            return base
        if base is None:
            snap = Snapshot(
                version=-1,
                schema_json="",
                live_files={},
                committed_batch_ids=[],
                schemas={},
                properties={},
            )
        else:
            # fold on a copy — the cached base must stay frozen
            snap = Snapshot(
                version=base.version,
                schema_json=base.schema_json,
                live_files=dict(base.live_files),
                committed_batch_ids=list(base.committed_batch_ids),
                schemas=dict(base.schemas),
                properties=dict(base.properties),
            )
        for v in range(snap.version + 1, version + 1):
            entry = self.read_entry(v)
            if entry.schema_json != snap.schema_json:
                snap.schemas[v] = entry.schema_json
                snap.schema_json = entry.schema_json
            for rel in entry.removes:
                snap.live_files.pop(rel, None)
            for add in entry.adds:
                snap.live_files[add["path"]] = add
            if entry.manifest is not None and "batch_id" in entry.manifest:
                snap.committed_batch_ids.append(entry.manifest["batch_id"])
            snap.properties.update(entry.properties)
            snap.version = v
        self._remember(version, snap)
        return snap

    def _remember(self, version: int, snap: Snapshot) -> None:
        self._snap_cache[version] = snap
        while len(self._snap_cache) > self._SNAP_CACHE_SIZE:
            del self._snap_cache[min(self._snap_cache)]

    # ---- write side ----
    def try_commit(self, entry: LogEntry) -> None:
        """Atomically publish ``entry`` as its version, or raise CommitConflict."""
        final = self._entry_path(entry.version)
        tmp = os.path.join(self.log_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            f.write(entry.to_json())
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)  # atomic create-if-absent
        except FileExistsError as exc:
            raise CommitConflict(f"version {entry.version} already committed") from exc
        finally:
            os.unlink(tmp)
        if entry.version > 0 and entry.version % CHECKPOINT_INTERVAL == 0:
            self._write_checkpoint(entry.version)

    def _write_checkpoint(self, version: int) -> None:
        snap = self.snapshot(version)
        if snap is None:
            return
        tmp = os.path.join(self.log_dir, f".tmp-ckpt-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            f.write(snap.to_json())
        try:
            os.link(tmp, self._ckpt_path(version))
        except FileExistsError:
            pass  # another writer checkpointed the same version — identical content
        finally:
            os.unlink(tmp)
