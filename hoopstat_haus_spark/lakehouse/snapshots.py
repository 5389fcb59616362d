"""Snapshot log: atomic commits, isolation, expiry, reachability GC.

The reference signals "this date's data is complete" with a ready-marker
JSON written exactly once (``libs/hoopstat-s3/hoopstat_s3/
silver_s3_manager.py:314-376``) plus an idempotency head-check
(``:255-272``). We generalize both into an Iceberg-style snapshot log:

    _snapshots/v<N>.json   — immutable snapshot record
    _snapshots/current     — pointer file, swapped atomically (os.replace)

Readers pin a snapshot id and resolve it to a manifest; maintenance jobs
commit a new snapshot only at the very end, so a crashed job leaves the
table unchanged (the staged files are orphans collected by GC).

The pointer swap is isolated behind ``_swap_pointer`` so an object-store
conditional-put (S3 If-None-Match) could replace the local rename without
touching callers — the same issue the reference hit with S3's lack of
atomic append (``meta/adr/ADR-031:49-51``).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import asdict, dataclass, field


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    manifest: str  # path relative to table root
    operation: str  # append | compact | merge | overwrite
    summary: dict = field(default_factory=dict)
    timestamp_ms: int = 0

    @property
    def name(self) -> str:
        return f"v{self.snapshot_id}"


class ConcurrentCommitError(RuntimeError):
    """Another writer committed since this job planned — retry from plan."""


class SnapshotLog:
    def __init__(self, table_path: str):
        self.table_path = table_path
        self.dir = os.path.join(table_path, "_snapshots")
        os.makedirs(self.dir, exist_ok=True)

    # -- reads ---------------------------------------------------------
    def current_id(self) -> int | None:
        ptr = os.path.join(self.dir, "current")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            return int(f.read().strip().lstrip("v"))

    def get(self, snapshot_id: int) -> Snapshot:
        with open(os.path.join(self.dir, f"v{snapshot_id}.json")) as f:
            return Snapshot(**json.load(f))

    def current(self) -> Snapshot | None:
        sid = self.current_id()
        return self.get(sid) if sid is not None else None

    def list_ids(self) -> list[int]:
        out = []
        for name in os.listdir(self.dir):
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def snapshot_as_of(self, ts_ms: int) -> int:
        """Newest RETAINED snapshot committed at or before ``ts_ms``
        (Delta's TIMESTAMP AS OF). Raises if every retained snapshot is
        newer — time travel can't reach past expiry — or if expired
        snapshots sit between the match and ``ts_ms``: a tag-protected
        old snapshot next to an expired middle would otherwise be
        returned SILENTLY for any timestamp in the gap, handing a
        reproducibility consumer a years-older table state."""
        best = None
        next_newer = None
        for sid in self.list_ids():  # sorted; timestamps are monotone
            if self.get(sid).timestamp_ms <= ts_ms:
                best = sid
            else:
                next_newer = sid
                break
        if best is None:
            raise ValueError(f"no retained snapshot at or before ts_ms={ts_ms}")
        if next_newer is not None and next_newer != best + 1:
            raise ValueError(
                f"snapshots v{best + 1}..v{next_newer - 1} were expired; the "
                f"table state at ts_ms={ts_ms} is not reconstructible "
                "(tag snapshots you need to time-travel to)"
            )
        return best

    # -- commits -------------------------------------------------------
    def commit(
        self,
        manifest: str,
        operation: str,
        summary: dict | None = None,
        expected_parent: int | None = None,
    ) -> Snapshot:
        """Optimistic-concurrency commit: fails if HEAD moved past
        ``expected_parent`` (pass the id the job planned against).

        The head check alone is check-then-act — two writers that both
        read head=N would both pass and the second os.replace would
        silently overwrite the first's acknowledged commit. The real
        mutex is the EXCLUSIVE creation of v(N+1).json via os.link
        (atomic fail-if-exists on POSIX; maps to S3 If-None-Match
        conditional put): exactly one writer can create each version, the
        loser gets ConcurrentCommitError and must re-plan."""
        head = self.current_id()
        if expected_parent is not None and head != expected_parent:
            raise ConcurrentCommitError(f"planned against v{expected_parent}, head is v{head}")
        # clamp to the parent's timestamp: snapshot times are NON-
        # DECREASING by construction (a stepped-back wall clock must not
        # break snapshot_as_of's monotone walk)
        ts = int(time.time() * 1000)
        if head is not None:
            ts = max(ts, self.get(head).timestamp_ms)
        snap = Snapshot(
            snapshot_id=(head or 0) + 1,
            parent_id=head,
            manifest=manifest,
            operation=operation,
            summary=summary or {},
            timestamp_ms=ts,
        )
        snap_path = os.path.join(self.dir, f"{snap.name}.json")
        tmp = snap_path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(asdict(snap), f, indent=1)
        try:
            os.link(tmp, snap_path)  # atomic create-if-absent, full content
        except FileExistsError:
            raise ConcurrentCommitError(
                f"v{snap.snapshot_id} already committed by a concurrent writer"
            ) from None
        finally:
            os.unlink(tmp)
        self._swap_pointer(snap.name)
        return snap

    def _swap_pointer(self, name: str) -> None:
        ptr = os.path.join(self.dir, "current")
        tmp = ptr + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(name)
        os.replace(tmp, ptr)  # atomic on POSIX

    # -- tags ------------------------------------------------------------
    # Named refs (Iceberg tag analog): `_snapshots/tag-<name>.json`, one
    # file per tag so creation rides the same exclusive-create mutex as
    # commits — no read-modify-write race on a shared registry file. The
    # training-data use case: a run tags the exact snapshot it consumed
    # ("corpus a model trained on"), and expiry/GC keep that snapshot
    # reachable for as long as the tag lives.

    _TAG_NAME_OK = staticmethod(
        lambda name: bool(name) and all(c.isalnum() or c in "._-" for c in name)
    )

    def _tag_path(self, name: str) -> str:
        if not self._TAG_NAME_OK(name):
            raise ValueError(f"bad tag name {name!r} (alnum . _ - only)")
        return os.path.join(self.dir, f"tag-{name}.json")

    def set_tag(self, name: str, snapshot_id: int | None = None, replace: bool = False) -> dict:
        """Pin ``name`` to ``snapshot_id`` (default: HEAD). Exclusive by
        default (a second tagger gets FileExistsError); ``replace=True``
        retargets atomically via os.replace."""
        sid = snapshot_id if snapshot_id is not None else self.current_id()
        if sid is None:
            raise ValueError("cannot tag an empty table")
        try:
            self.get(sid)  # must resolve — no dangling tags
        except FileNotFoundError:
            raise ValueError(f"snapshot v{sid} does not exist") from None
        rec = {"name": name, "snapshot_id": sid, "created_ms": int(time.time() * 1000)}
        path = self._tag_path(name)
        tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(rec, f, indent=1)
        if replace:
            os.replace(tmp, path)
        else:
            try:
                os.link(tmp, path)  # atomic create-if-absent
            except FileExistsError:
                raise FileExistsError(f"tag {name!r} already exists (replace=True to move)") from None
            finally:
                os.unlink(tmp)
        return rec

    def resolve_tag(self, name: str) -> int:
        try:
            with open(self._tag_path(name)) as f:
                return int(json.load(f)["snapshot_id"])
        except FileNotFoundError:
            raise KeyError(f"unknown tag {name!r}") from None

    def drop_tag(self, name: str) -> None:
        try:
            os.remove(self._tag_path(name))
        except FileNotFoundError:
            raise KeyError(f"unknown tag {name!r}") from None

    def tags(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for fname in os.listdir(self.dir):
            if fname.startswith("tag-") and fname.endswith(".json"):
                with open(os.path.join(self.dir, fname)) as f:
                    rec = json.load(f)
                out[rec["name"]] = int(rec["snapshot_id"])
        return out

    # -- expiry --------------------------------------------------------
    def expire(self, keep_last: int = 2, older_than_ms: int | None = None) -> list[int]:
        """Drop all but the newest ``keep_last`` snapshots (HEAD and
        TAGGED snapshots always kept). Returns expired ids. Data-file GC
        is a separate pass
        (:func:`hoopstat_haus_spark.lakehouse.gc.collect_garbage`) so a
        crash between expire and GC never loses reachable data — and GC
        derives reachability from the snapshot records expire keeps, so
        tag protection here is all GC needs.

        ``older_than_ms`` adds Iceberg's age cutoff: a snapshot committed
        at or after that timestamp is NEVER expired, regardless of
        ``keep_last`` — age only widens retention, so a retention policy
        of "keep 7 days" cannot be narrowed by a burst of commits."""
        ids = self.list_ids()
        head = self.current_id()
        keep = set(ids[-keep_last:])
        if head is not None:
            keep.add(head)
        keep.update(self.tags().values())
        if older_than_ms is not None:
            keep.update(i for i in ids if self.get(i).timestamp_ms >= older_than_ms)
        expired = [i for i in ids if i not in keep]
        for sid in expired:
            os.remove(os.path.join(self.dir, f"v{sid}.json"))
        return expired
