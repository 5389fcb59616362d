"""Row-level DML as file-pruned copy-on-write rewrites: DELETE + UPDATE.

Reference ancestor: the replay engine's "overwrite the one object that
holds the bad rows" pattern (``apps/bronze-ingestion/app/replay.py``,
write-back ``:425-458``) — generalized here from key-addressed patches to
arbitrary-predicate row DML with Iceberg semantics: ``DELETE FROM``
removes rows where the predicate is TRUE (NULL/FALSE rows survive);
``UPDATE SET`` rewrites matching rows in place (see update.py, which
shares this module's find/commit halves).

Scale design (two passes, both bounded by the predicate):

1. *Find* — one column-pruned scan over the (optionally
   partition-pruned) snapshot: ``filter(pred)`` then group by
   ``input_file_name()``. Catalyst prunes the read schema to the
   predicate's columns and pushes the predicate into the parquet scan,
   so the token payload is never read; the shuffle is one row per
   TOUCHED file. Files with zero matches are never rewritten.
2. *Rewrite* — only touched files are read in full; survivors
   (``NOT coalesce(pred, false)``) are re-clustered and written back.
   Untouched files — in touched partitions and elsewhere — are carried
   into the new manifest by reference, so manifest I/O is O(touched
   partitions) like every other commit.

A delete that matches nothing commits nothing (returns ``(None,
metrics)``): readers keep the current snapshot, no empty rewrite churn.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import Column
from pyspark.sql import functions as F

from hoopstat_haus_spark.lakehouse import manifest as mf
from hoopstat_haus_spark.lakehouse.checkpoint import JobCheckpoint
from hoopstat_haus_spark.lakehouse.metrics import JobMetrics
from hoopstat_haus_spark.lakehouse.snapshots import Snapshot
from hoopstat_haus_spark.lakehouse.table import TokenLakeTable
from hoopstat_haus_spark.lakehouse.zorder import with_zkey


def delete_where(
    table: TokenLakeTable,
    condition: Column | str,
    job_id: str | None = None,
    sources: list[str] | None = None,
    curve: str = "zorder",
) -> tuple[Snapshot | None, JobMetrics]:
    """Delete rows where ``condition`` is TRUE; returns (snapshot, metrics).

    ``condition`` is a Column or a SQL string over the table's live
    schema. ``sources`` optionally restricts the find pass to the named
    partitions (manifest-level pruning — shards of other partitions are
    never opened). ``curve`` names the space-filling curve rewritten
    survivors are re-keyed with (same contract as ``merge_into``).
    """
    job_id = job_id or f"delete-{uuid.uuid4().hex[:10]}"
    metrics = JobMetrics(job=job_id)
    try:
        return _delete_run(table, condition, job_id, sources, curve, metrics)
    except Exception as exc:
        # failed deletes must reach the health rollup, like merge/compact
        from hoopstat_haus_spark.lakehouse.health import record_job_metrics

        metrics.finish()
        try:
            record_job_metrics(table.path, metrics, "delete", status="failed", error=repr(exc)[:500])
        except OSError:
            pass  # a full/read-only disk must not mask the root cause
        raise


def find_touched_files(
    table: TokenLakeTable,
    pred: Column,
    sources: list[str] | None,
    metrics: JobMetrics,
):
    """Pass 1 (shared by DELETE/UPDATE): column-pruned predicate scan →
    manifest entries of the files holding ≥1 match.

    Returns ``(head, matched_rows, cand, shard_entries)`` where ``cand``
    is the touched files' manifest entries (sorted by path) and
    ``shard_entries`` maps each touched PARTITION to its full entry list
    (only those partitions' shards are materialized driver-side).
    ``cand`` is empty when nothing matches.
    """
    head = table.log.current()
    # scan the PINNED head, not a re-resolved current(): a commit landing
    # between current() and scan() would make the find pass observe files
    # absent from head's manifest and the rewrite silently skip them
    scan = table.scan(snapshot_id=head.snapshot_id, sources=sources)
    hits = (
        scan.filter(pred)
        .groupBy(F.input_file_name().alias("file_uri"))
        .agg(F.count(F.lit(1)).alias("n_matched"))
        .collect()
    )
    # input_file_name() URL-encodes its URI (a table path with a space
    # comes back as %20) — mf.uri_to_rel decodes and raises on a miss
    touched = {mf.uri_to_rel(table.path, r["file_uri"]): r["n_matched"] for r in hits}
    matched_rows = int(sum(touched.values()))
    if not touched:
        return head, 0, [], {}

    # only the touched partitions' shards are materialized driver-side.
    # Dir names carry Spark's partition escaping (%XX for '%', '=', ':'…)
    # while manifest records store the RAW source value — unescape when
    # extracting the value (Hive unescapePathName ≡ percent-decoding)
    from urllib.parse import unquote

    records = mf.read_manifest_list(table.path, head.manifest)
    rel_parts = {
        unquote(p.split("/", 2)[1].split("=", 1)[1]) for p in touched
    }  # data/source=<s>/...
    shard_entries = {
        r["partition"]: mf.read_shard(table.path, r)
        for r in records
        if r["partition"] in rel_parts
    }
    by_path = {e["file_path"]: e for es in shard_entries.values() for e in es}
    # every scanned file comes FROM head's manifest (the scan is pinned
    # above), so a miss here is metadata corruption — skipping it would
    # commit a delete that left matched rows untouched
    lost = [p for p in sorted(touched) if p not in by_path]
    if lost:
        raise RuntimeError(
            f"{len(lost)} matched file(s) missing from head manifest "
            f"(e.g. {lost[0]!r}) — manifest/scan disagree, refusing to commit"
        )
    cand = [by_path[p] for p in sorted(touched)]
    metrics.files_in = len(cand)
    metrics.bytes_in = sum(e["file_bytes"] for e in cand)
    metrics.partitions = len({e["partition"] for e in cand})
    metrics.rows = sum(e["row_count"] for e in cand)
    metrics.tokens = sum(e["token_count"] for e in cand)
    return head, matched_rows, cand, shard_entries


def read_touched(table: TokenLakeTable, schema, cand_paths: list[str]):
    """Full-row read of exactly the touched files, defaults applied."""
    df = (
        table.spark.read.option("basePath", table.data_dir)
        .schema(schema.ddl(extra=((mf.ZKEY_COL, "long"),)))
        .parquet(*[os.path.join(table.path, p) for p in cand_paths])
        .drop(mf.ZKEY_COL)
    )
    return schema.apply_defaults(df)


def commit_rewrite(
    table: TokenLakeTable,
    head: Snapshot,
    schema,
    cand: list[dict],
    shard_entries: dict[str, list[dict]],
    fresh: list[dict],
    operation: str,
    summary: dict,
) -> Snapshot:
    """Shared commit half: drop the rewritten files, add the fresh ones,
    write new shards ONLY for touched partitions (others carried by
    reference), commit with optimistic concurrency."""
    dropped = {e["file_path"] for e in cand}
    fresh_by_part: dict[str, list[dict]] = {}
    for e in fresh:
        fresh_by_part.setdefault(e["partition"], []).append(e)
    changed_parts = {e["partition"] for e in cand} | set(fresh_by_part)
    changed = {
        part: [e for e in shard_entries.get(part, []) if e["file_path"] not in dropped]
        + fresh_by_part.get(part, [])
        for part in changed_parts
    }
    rel, new_records = mf.update_manifest(table.path, head.manifest, changed)
    # full post-state aggregates (files/rows/tokens/bytes/partitions),
    # like every other commit kind — history() and trend tooling read
    # them; the caller's op-specific keys layer on top
    summary = {**mf.summary_from_records(new_records), **summary}
    summary["schema_version"] = schema.version
    return table.log.commit(rel, operation, summary, expected_parent=head.snapshot_id)


def _delete_run(
    table: TokenLakeTable,
    condition: Column | str,
    job_id: str,
    sources: list[str] | None,
    curve: str,
    metrics: JobMetrics,
) -> tuple[Snapshot | None, JobMetrics]:
    spark = table.spark
    pred = F.expr(condition) if isinstance(condition, str) else condition
    schema = table.schema_def()

    # ---- pass 1: find touched files (column-pruned, predicate pushed) --
    head, matched_rows, cand, shard_entries = find_touched_files(table, pred, sources, metrics)
    if not cand:
        return None, metrics.finish()
    cand_paths = [e["file_path"] for e in cand]

    # ---- pass 2: rewrite only touched files ---------------------------
    ckpt = JobCheckpoint(table.path, job_id)
    ckpt.intent("rewrite", cand_paths)
    t0 = time.time()
    target = read_touched(table, schema, cand_paths)
    survivors = target.filter(~F.coalesce(pred, F.lit(False)))
    survivors = with_zkey(survivors, curve=curve).sortWithinPartitions("source", mf.ZKEY_COL)
    new_files, fresh = table._write_files(
        survivors, f"delete-{job_id}", repartition_n=None, curve=curve
    )
    metrics.files_out = len(fresh)
    metrics.bytes_out = sum(e["file_bytes"] for e in fresh)
    ckpt.done(
        "rewrite",
        cand_paths,
        new_files,
        rows=metrics.rows,
        tokens=metrics.tokens,
        duration_s=time.time() - t0,
    )

    # ---- commit: new shards only for touched partitions ---------------
    snap = commit_rewrite(
        table,
        head,
        schema,
        cand,
        shard_entries,
        fresh,
        "delete",
        {
            "job_id": job_id,
            "matched_rows": matched_rows,
            "rewritten_files": len(cand_paths),
            "new_files": len(fresh),
        },
    )
    metrics.finish()
    from hoopstat_haus_spark.lakehouse.health import record_job_metrics

    record_job_metrics(table.path, metrics, "delete", snapshot_id=snap.snapshot_id)
    return snap, metrics
