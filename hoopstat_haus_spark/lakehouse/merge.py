"""MERGE INTO: partition-pruned, manifest-pruned copy-on-write rewrite.

Reference ancestor: quarantine replay — patch a payload, overwrite the
single bronze object addressed by (entity, date, game_id), re-derive the
affected date downstream (``apps/bronze-ingestion/app/replay.py:127-364``,
write-back ``:425-458``). The engine generalizes "overwrite the one
object that holds the key" to Iceberg MERGE semantics:

    WHEN MATCHED AND u._op = 'delete'  THEN DELETE
    WHEN MATCHED                       THEN UPDATE (tokens, n_tok)
    WHEN NOT MATCHED AND NOT delete    THEN INSERT

Scale design (SURVEY.md §7.5): the full table is NEVER joined. Candidate
files are chosen by joining the (small) update set against the manifest's
per-file [min_doc_id, max_doc_id] ranges within matching `source`
partitions — a broadcast of metadata, not data. Only candidate files are
read and rewritten; the join inside them broadcasts the update side so
the 4 KB token arrays of the target never shuffle. Untouched files are
carried into the new manifest by reference.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hoopstat_haus_spark.lakehouse import manifest as mf
from hoopstat_haus_spark.lakehouse.checkpoint import JobCheckpoint
from hoopstat_haus_spark.lakehouse.metrics import JobMetrics
from hoopstat_haus_spark.lakehouse.snapshots import Snapshot
from hoopstat_haus_spark.lakehouse.table import TokenLakeTable
from hoopstat_haus_spark.lakehouse.zorder import with_zkey

OP_COL = "_op"  # optional in updates: 'upsert' (default) | 'delete'

INSERT_TARGET_FILE_BYTES = 128 << 20

# Snapshot-summary keys the merge commit computes itself; summary_extra
# must not shadow them (history()/metadata readers trust the aggregates).
_RESERVED_SUMMARY_KEYS = frozenset(
    {"files", "rows", "tokens", "bytes", "partitions",
     "job_id", "rewritten_files", "new_files", "schema_version"}
)


def _avg_row_bytes(records: list[dict]) -> int:
    """Observed bytes/row from the manifest LIST's per-shard aggregates
    (no shard parquet is read; fallback 1 KiB)."""
    rows = sum(r["row_count"] for r in records)
    return max(1, sum(r["file_bytes"] for r in records) // rows) if rows else 1024


def _candidate_files(spark: SparkSession, entries: list[dict], updates: DataFrame) -> list[dict]:
    """Manifest ∩ updates on (partition, doc_id range) → files to rewrite."""
    man = spark.createDataFrame(
        [(e["file_path"], e["partition"], e["min_doc_id"], e["max_doc_id"]) for e in entries],
        schema="file_path string, partition string, min_doc_id string, max_doc_id string",
    )
    # no .distinct(): the semi-join only tests existence, and dedup would
    # cost a full shuffle stage over the update feed just to shrink an
    # already-broadcast-sized build side
    keys = updates.select("doc_id", "source")
    hit = (
        man.join(
            F.broadcast(keys),
            (man.partition == keys.source)
            & (keys.doc_id >= man.min_doc_id)
            & (keys.doc_id <= man.max_doc_id),
            "left_semi",
        )
        .select("file_path")
        .collect()
    )
    paths = {r["file_path"] for r in hit}
    return [e for e in entries if e["file_path"] in paths]


def merge_into(
    table: TokenLakeTable,
    updates: DataFrame,
    job_id: str | None = None,
    curve: str = "zorder",
    summary_extra: dict | None = None,
) -> tuple[Snapshot, JobMetrics]:
    """Upsert/delete ``updates`` (doc_id, tokens, n_tok, source[, _op])
    into the table; returns the new snapshot + job metrics.

    Duplicate (doc_id, source) keys in ``updates`` are REJECTED up front
    (Iceberg MERGE raises on multiple matches): a fanned-out left join
    would silently duplicate matched target rows and break the
    one-token-array-per-doc_id invariant. Callers with legitimately
    duplicated feeds (e.g. quarantine replay across batches) must dedupe
    deterministically first.

    ``summary_extra`` fields are merged into the commit's snapshot
    summary (e.g. the streaming ingest stamps ``stream_id`` /
    ``stream_batch_id`` there for replay idempotence). Keys that would
    clobber the commit's own aggregates are rejected up front —
    history() and metadata readers depend on those values."""
    clash = set(summary_extra or {}) & _RESERVED_SUMMARY_KEYS
    if clash:
        raise ValueError(
            f"summary_extra keys would clobber commit aggregates: {sorted(clash)}"
        )
    job_id = job_id or f"merge-{uuid.uuid4().hex[:10]}"
    metrics = JobMetrics(job=job_id)
    try:
        return _merge_run(table, updates, job_id, curve, metrics, summary_extra)
    except Exception as exc:
        # failed merges must reach the health rollup (DEGRADED/OUTAGE are
        # unreachable if only successes ever record)
        from hoopstat_haus_spark.lakehouse.health import record_job_metrics

        metrics.finish()
        try:
            record_job_metrics(table.path, metrics, "merge", status="failed", error=repr(exc)[:500])
        except OSError:
            pass  # a full/read-only disk must not mask the root cause
        raise


def _merge_run(
    table: TokenLakeTable,
    updates: DataFrame,
    job_id: str,
    curve: str,
    metrics: JobMetrics,
    summary_extra: dict | None = None,
) -> tuple[Snapshot, JobMetrics]:
    spark = table.spark
    ckpt = JobCheckpoint(table.path, job_id)
    head = table.log.current()
    # manifest LIST only — per-partition shards are read later, and only
    # for the partitions the update feed actually touches
    records = mf.read_manifest_list(table.path, head.manifest)

    schema = table.schema_def()
    value_cols = [f for f in schema.fields if f["name"] not in ("doc_id", "source")]
    if OP_COL not in updates.columns:
        updates = updates.withColumn(OP_COL, F.lit("upsert"))
    # project onto the live schema, keeping _op: evolved columns absent
    # from the update feed become NULL → the coalesce below keeps the
    # target's value (an explicit NULL overwrite is not expressible —
    # same limitation as the reference's dict-merge upserts)
    proj = [
        (
            F.col(f["name"]).cast(f["type"])
            if f["name"] in updates.columns
            else F.lit(None).cast(f["type"])
        ).alias(f["name"])
        for f in schema.fields
    ]
    # cache the projected update set: four downstream actions consume it
    # (dup probe, candidate-file pruning, the CoW rewrite join, the
    # matched-keys anti-join for inserts) and re-deriving the feed each
    # time re-runs its upstream plan. The dup probe below doubles as the
    # cache materializer (full aggregation, no limit short-circuit).
    updates = updates.select(*proj, F.col(OP_COL)).persist()
    try:
        return _merge_apply(
            table, updates, job_id, curve, metrics, ckpt, head, records, schema, value_cols,
            summary_extra,
        )
    finally:
        updates.unpersist()


def _merge_apply(
    table, updates, job_id, curve, metrics, ckpt, head, records, schema, value_cols,
    summary_extra=None,
):
    spark = table.spark
    # ONE materializing aggregate: populates the persisted cache, probes
    # for duplicate keys (max per-key count), yields the feed row count,
    # AND the feed's distinct partitions (which decide the manifest
    # shards to read) — previously the dup probe and a later
    # updates.count() were two separate jobs over the feed (serial
    # seconds weigh 4× in the N→4N efficiency; see BENCH.md)
    probe = (
        updates.groupBy("doc_id", "source")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.max("n").alias("max_n"),
            F.sum("n").cast("long").alias("n_rows"),
            F.collect_set("source").alias("feed_parts"),
        )
        .collect()[0]
    )
    feed_parts = set(probe["feed_parts"] or [])
    if (probe["max_n"] or 0) > 1:
        dup = (
            updates.groupBy("doc_id", "source")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .limit(1)
            .collect()
        )
        raise ValueError(
            f"merge_into: duplicate update key (doc_id={dup[0]['doc_id']!r}, "
            f"source={dup[0]['source']!r}) — MERGE requires unique (doc_id, source); "
            "dedupe the update set first"
        )

    # read ONLY the feed partitions' manifest shards: untouched
    # partitions never materialize driver-side, so a MERGE into 1 of
    # 10^4 partitions plans against one shard's entries
    shard_entries = {
        r["partition"]: mf.read_shard(table.path, r)
        for r in records
        if r["partition"] in feed_parts
    }
    touched_entries = [e for es in shard_entries.values() for e in es]
    cand = _candidate_files(spark, touched_entries, updates)
    cand_paths = [e["file_path"] for e in cand]
    metrics.files_in = len(cand_paths)
    metrics.bytes_in = sum(e["file_bytes"] for e in cand)
    metrics.partitions = len({e["partition"] for e in cand})

    u = updates.alias("u")
    new_files: list[str] = []
    rw_stats: list[dict] = []
    ckpt.intent("rewrite", cand_paths)
    t0 = time.time()
    if cand_paths:
        target = (
            table.spark.read.option("basePath", table.data_dir)
            .schema(schema.ddl(extra=((mf.ZKEY_COL, "long"),)))
            .parquet(*[os.path.join(table.path, p) for p in cand_paths])
            .drop(mf.ZKEY_COL)
        )
        t = target.alias("t")
        joined = t.join(F.broadcast(u), ["doc_id", "source"], "left_outer")
        survivors = joined.filter(
            (F.col(f"u.{OP_COL}").isNull()) | (F.col(f"u.{OP_COL}") != "delete")
        ).select(
            F.col("doc_id"),
            *[
                F.coalesce(F.col(f"u.{f['name']}"), F.col(f"t.{f['name']}"))
                .cast(f["type"])
                .alias(f["name"])
                for f in value_cols
            ],
            F.col("source"),
        )
        survivors = with_zkey(survivors, curve=curve).sortWithinPartitions("source", mf.ZKEY_COL)
        rw_files, rw_stats = table._write_files(
            survivors, f"merge-{job_id}", repartition_n=None, curve=curve
        )
        new_files += rw_files

        matched_keys = (
            t.join(F.broadcast(u.select("doc_id", "source")), ["doc_id", "source"], "left_semi")
            .select("doc_id", "source")
        )
    else:
        matched_keys = spark.createDataFrame([], schema="doc_id string, source string")

    inserts = (
        u.filter(F.col(OP_COL) != "delete")
        .join(matched_keys, ["doc_id", "source"], "left_anti")
        .select(*schema.names())
    )
    inserts = schema.apply_defaults(inserts).persist()
    try:
        # Size the insert write to the ACTUAL insert count, not the
        # whole feed: a mostly-upsert feed with a handful of new rows
        # must not fan those few inserts across feed-sized partitions
        # (up to 256 tiny files — MERGE must not undo compaction). The
        # count materializes the persisted insert set (one skinny
        # semi-join scan of candidate files); the write below then reads
        # the cache instead of re-running the anti-join, so the file
        # scan count is unchanged.
        n_ins = inserts.count()
        if n_ins:
            row_bytes = _avg_row_bytes(records)
            n_ins_parts = max(1, min(256, -(-n_ins * row_bytes // INSERT_TARGET_FILE_BYTES)))
            # hash on (source, doc-salt), not source alone: hashing only
            # source caps non-empty partitions at the distinct-source
            # count, so a big single-source backfill would sort+write as
            # ONE task/file no matter what n_ins_parts says. The salt
            # spreads within each source; the partitionBy('source')
            # write still splits files per source per task.
            salt = F.pmod(F.xxhash64("doc_id"), F.lit(int(n_ins_parts)))
            sized = inserts.repartition(int(n_ins_parts), "source", salt)
            sized = with_zkey(sized, curve=curve).sortWithinPartitions("source", mf.ZKEY_COL)
            ins_files, ins_stats = table._write_files(
                sized, f"insert-{job_id}", repartition_n=None, curve=curve
            )
            new_files += ins_files
            rw_stats += ins_stats
    finally:
        inserts.unpersist()

    # stats came back from the write jobs themselves (fused writer) —
    # no re-read of the new files
    fresh = rw_stats
    metrics.files_out = len(fresh)
    metrics.bytes_out = sum(e["file_bytes"] for e in fresh)
    metrics.rows = sum(e["row_count"] for e in fresh)
    metrics.tokens = sum(e["token_count"] for e in fresh)
    ckpt.done(
        "rewrite",
        cand_paths,
        new_files,
        rows=metrics.rows,
        tokens=metrics.tokens,
        duration_s=time.time() - t0,
    )
    # new shards only for partitions that actually changed (a rewritten
    # file or a fresh output); everything else rides by reference
    dropped = set(cand_paths)
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
    snap = table.log.commit(
        rel,
        "merge",
        {
            # full table aggregates, same as append/compact/DML commits —
            # history() and other metadata readers must not see files=0
            # on merge snapshots (summary_extra overlap rejected at entry)
            **mf.summary_from_records(new_records),
            "job_id": job_id,
            "rewritten_files": len(cand_paths),
            "new_files": len(fresh),
            "schema_version": schema.version,
            **(summary_extra or {}),
        },
        expected_parent=head.snapshot_id,
    )
    metrics.finish()
    from hoopstat_haus_spark.lakehouse.health import record_job_metrics

    record_job_metrics(table.path, metrics, "merge", snapshot_id=snap.snapshot_id)
    return snap, metrics
