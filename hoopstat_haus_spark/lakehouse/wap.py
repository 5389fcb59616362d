"""Write-audit-publish: stage-only appends audited before exposure.

Iceberg's WAP pattern (``write.wap.enabled`` stage-only snapshots,
cherry-picked to the main branch after audits pass; reference analog:
the ready-marker gating in ``libs/hoopstat-s3/hoopstat_s3/
silver_s3_manager.py:314-376`` — data exists but is not "published"
until the marker lands) adapted to this log's exclusive-create version
mutex: a version slot is allocated only at PUBLISH time, so a staged
batch awaiting audit never blocks concurrent maintenance commits.

    _snapshots/staged-<ref>.json  — staged record (file entries inline)

``stage_append`` writes the data files and computes their manifest
entries, but moves no pointer and claims no version. Audits read the
staged rows through ``scan_staged`` (same explicit-schema/defaults path
as a committed scan) — e.g. ``quarantine.validate_batch`` over them.
``publish_staged`` replays an append commit against WHATEVER head
exists at publish time — appends commute, so rebasing over concurrent
compact/merge/append commits is safe — under a bounded CAS retry, and
is exactly-once: the published snapshot's summary carries ``wap_ref``,
so a re-publish after a crash between commit and cleanup finds the
earlier commit and only completes the cleanup. ``discard_staged``
drops the record; the now-orphaned data files age out through normal
GC (which treats LIVE staged records' files as reachable).

Scale note: the staged record inlines one ~200-byte entry per data
file — a staged batch is one ingest's output (10^2-10^3 files), never
the whole table, so the record stays metadata-scale; publish touches
only the partitions the batch landed in (same O(touched) shard writes
as ``TokenLakeTable.append``).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame

from hoopstat_haus_spark.lakehouse import manifest as mf
from hoopstat_haus_spark.lakehouse.schema import read_schema
from hoopstat_haus_spark.lakehouse.snapshots import ConcurrentCommitError, Snapshot

if TYPE_CHECKING:  # pragma: no cover
    from hoopstat_haus_spark.lakehouse.table import TokenLakeTable

def _ref_ok(ref: str) -> bool:
    return bool(ref) and all(c.isalnum() or c in "._-" for c in ref)


def _staged_path(table_path: str, ref: str) -> str:
    if not _ref_ok(ref):
        raise ValueError(f"bad staged ref {ref!r} (alnum . _ - only)")
    return os.path.join(table_path, "_snapshots", f"staged-{ref}.json")


def staged_records(table_path: str) -> dict[str, dict]:
    """All live staged records by ref (GC reads this for reachability)."""
    snap_dir = os.path.join(table_path, "_snapshots")
    out: dict[str, dict] = {}
    if not os.path.isdir(snap_dir):
        return out
    for name in sorted(os.listdir(snap_dir)):
        if name.startswith("staged-") and name.endswith(".json"):
            with open(os.path.join(snap_dir, name)) as f:
                rec = json.load(f)
            out[rec["ref"]] = rec
    return out


def _read_staged(table_path: str, ref: str) -> dict:
    try:
        with open(_staged_path(table_path, ref)) as f:
            return json.load(f)
    except FileNotFoundError:
        raise KeyError(f"unknown staged ref {ref!r}") from None


def stage_append(
    table: "TokenLakeTable",
    df: DataFrame,
    ref: str | None = None,
    repartition_n: int | None = None,
) -> dict:
    """Write ``df``'s files and stats WITHOUT committing. Returns the
    staged record (``ref`` keys the later publish/discard)."""
    ref = ref or f"wap-{uuid.uuid4().hex[:10]}"
    path = _staged_path(table.path, ref)  # validates ref up front
    head = table.log.current()
    if head is None:
        raise ValueError("stage_append needs an existing table (use create)")
    schema = table.schema_def()
    new_files, entries = table._write_files(schema.conform(df), f"wap-{ref}", repartition_n)
    rec = {
        "ref": ref,
        "base_id": head.snapshot_id,
        "operation": "append",
        "schema_version": schema.version,
        "entries": entries,
        "created_ms": int(time.time() * 1000),
    }
    tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(rec, f, indent=1)
    try:
        os.link(tmp, path)  # exclusive: one staged batch per ref
    except FileExistsError:
        raise FileExistsError(f"staged ref {ref!r} already exists") from None
    finally:
        os.unlink(tmp)
    return rec


def scan_staged(table: "TokenLakeTable", ref: str) -> DataFrame:
    """The staged rows only (what an audit inspects) — explicit read
    schema + defaults, exactly like a committed scan; the audited view
    of the WHOLE table-after is ``table.scan().unionByName(this)``."""
    rec = _read_staged(table.path, ref)
    schema = read_schema(table.path, rec["schema_version"])
    paths = [os.path.join(table.path, e["file_path"]) for e in rec["entries"]]
    df = (
        table.spark.read.option("basePath", table.data_dir)
        .schema(schema.ddl(extra=((mf.ZKEY_COL, "long"),)))
        .parquet(*paths)
    )
    return schema.apply_defaults(df).drop(mf.ZKEY_COL)


def _finish_published(table: "TokenLakeTable", ref: str, snap: Snapshot) -> Snapshot:
    """Complete a publish someone already committed: drop the staged
    record (the committing publisher may have beaten us to that too)."""
    try:
        os.remove(_staged_path(table.path, ref))
    except FileNotFoundError:
        pass
    return snap


def publish_staged(table: "TokenLakeTable", ref: str, max_retries: int = 5) -> Snapshot:
    """Expose a staged batch: one append commit against the CURRENT
    head (not the stage-time head — appends commute with every commit
    kind, so the batch rebases onto whatever maintenance ran since).
    Exactly-once via the ``wap_ref`` summary stamp.

    The stamp check runs before EVERY commit attempt, scanning only
    snapshots newer than the last scanned head: a ConcurrentCommitError
    can mean "another publisher of THIS ref won the slot", and retrying
    without re-checking would rebase onto a head that already contains
    the batch and append it twice."""
    # crash between commit and cleanup leaves the staged file behind —
    # finish the cleanup instead of double-appending
    checked = -1  # highest snapshot id already scanned for the stamp
    for sid in reversed(table.log.list_ids()):
        snap = table.log.get(sid)
        checked = max(checked, sid)
        if snap.summary.get("wap_ref") == ref:
            return _finish_published(table, ref, snap)
    try:
        rec = _read_staged(table.path, ref)
    except KeyError:
        # the staged record vanished between the scan and this read — a
        # rival publisher may have committed AND cleaned up in that
        # window; its stamp decides whether this is success or an error
        for sid in (i for i in table.log.list_ids() if i > checked):
            snap = table.log.get(sid)
            if snap.summary.get("wap_ref") == ref:
                return _finish_published(table, ref, snap)
        raise
    by_part: dict[str, list[dict]] = {}
    for e in rec["entries"]:
        by_part.setdefault(e["partition"], []).append(e)
    last_err: ConcurrentCommitError | None = None
    for _ in range(max_retries):
        head = table.log.current()
        # re-check ANY snapshot committed since the last scan — including
        # on the first attempt (a same-ref publish can land between the
        # initial full scan and this head read)
        for sid in (i for i in table.log.list_ids() if i > checked):
            snap = table.log.get(sid)
            checked = max(checked, sid)
            if snap.summary.get("wap_ref") == ref:
                return _finish_published(table, ref, snap)
        base = {r["partition"]: r for r in mf.read_manifest_list(table.path, head.manifest)}
        changed = {
            part: (mf.read_shard(table.path, base[part]) if part in base else []) + entries
            for part, entries in by_part.items()
        }
        rel, records = mf.update_manifest(table.path, head.manifest, changed)
        summary = table._stamp(mf.summary_from_records(records))
        summary.update({"wap_ref": ref, "staged_ms": rec["created_ms"]})
        try:
            snap = table.log.commit(
                rel, "append", summary, expected_parent=head.snapshot_id
            )
        except ConcurrentCommitError as exc:
            last_err = exc  # head moved: re-plan against the new head
            continue
        return _finish_published(table, ref, snap)
    raise last_err if last_err is not None else RuntimeError("publish retries exhausted")


def discard_staged(table: "TokenLakeTable", ref: str) -> dict:
    """Drop a staged batch that failed its audit. Metadata-only: the
    staged data files become orphans and normal GC (min-age guarded)
    removes them."""
    rec = _read_staged(table.path, ref)
    os.remove(_staged_path(table.path, ref))
    return rec
