"""UPDATE SET ... WHERE: predicate update as a file-pruned CoW rewrite.

Completes the row-level DML trio (MERGE ``merge.py``, DELETE
``delete.py``, UPDATE here) with Iceberg ``UPDATE`` semantics: rows
where the predicate is TRUE get the assignment expressions applied;
NULL/FALSE rows are carried through byte-identical. Reference ancestor:
the replay engine's fix-and-rewrite path
(``apps/bronze-ingestion/app/replay.py:425-458``), which patches known
rows inside the one object holding them — generalized to arbitrary
predicates and expressions.

Shares DELETE's two-pass scale design (see delete.py's module
docstring): pass 1 is a column-pruned find that never reads the token
payload and shuffles one row per touched FILE; pass 2 reads only the
touched files, applies the assignments under ``CASE WHEN pred``, and
re-clusters. Untouched files — including in touched partitions — are
carried into the new manifest by reference, so manifest I/O stays
O(touched partitions).

Invariants enforced here:

- ``doc_id`` and ``source`` cannot be assigned (identity + partition
  columns; a partition move is a delete+insert, use ``merge_into``).
- if ``tokens`` is assigned and ``n_tok`` is not, ``n_tok`` is
  recounted as ``size(tokens)`` so the table's n_tok↔tokens invariant
  cannot drift (the quarantine validator would reject such rows on
  ingest; UPDATE must not create them post-ingest).

An update that matches nothing commits nothing (returns ``(None,
metrics)``).
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import Column
from pyspark.sql import functions as F

from hoopstat_haus_spark.lakehouse import manifest as mf
from hoopstat_haus_spark.lakehouse.checkpoint import JobCheckpoint
from hoopstat_haus_spark.lakehouse.delete import (
    commit_rewrite,
    find_touched_files,
    read_touched,
)
from hoopstat_haus_spark.lakehouse.metrics import JobMetrics
from hoopstat_haus_spark.lakehouse.snapshots import Snapshot
from hoopstat_haus_spark.lakehouse.table import TokenLakeTable
from hoopstat_haus_spark.lakehouse.zorder import with_zkey

_PROTECTED = ("doc_id", "source")


def update_where(
    table: TokenLakeTable,
    condition: Column | str,
    assignments: dict[str, Column | str],
    job_id: str | None = None,
    sources: list[str] | None = None,
    curve: str = "zorder",
) -> tuple[Snapshot | None, JobMetrics]:
    """Apply ``assignments`` to rows where ``condition`` is TRUE.

    ``assignments`` maps column name → Column or SQL expression string
    evaluated over the OLD row (standard UPDATE semantics: all
    right-hand sides see pre-update values, so ``{"a": "b", "b": "a"}``
    swaps). Returns ``(snapshot, metrics)``; snapshot is None when the
    predicate matched nothing.
    """
    job_id = job_id or f"update-{uuid.uuid4().hex[:10]}"
    metrics = JobMetrics(job=job_id)
    try:
        return _update_run(table, condition, assignments, job_id, sources, curve, metrics)
    except Exception as exc:
        from hoopstat_haus_spark.lakehouse.health import record_job_metrics

        metrics.finish()
        try:
            record_job_metrics(table.path, metrics, "update", status="failed", error=repr(exc)[:500])
        except OSError:
            pass  # a full/read-only disk must not mask the root cause
        raise


def _update_run(
    table: TokenLakeTable,
    condition: Column | str,
    assignments: dict[str, Column | str],
    job_id: str,
    sources: list[str] | None,
    curve: str,
    metrics: JobMetrics,
) -> tuple[Snapshot | None, JobMetrics]:
    spark = table.spark
    pred = F.expr(condition) if isinstance(condition, str) else condition
    schema = table.schema_def()
    names = schema.names()

    bad = [c for c in assignments if c in _PROTECTED]
    if bad:
        raise ValueError(
            f"cannot assign identity/partition column(s) {bad}; "
            "a partition or key move is a delete+insert (use merge_into)"
        )
    unknown = [c for c in assignments if c not in names]
    if unknown:
        raise ValueError(f"unknown column(s) {unknown}; table schema is {names}")
    assigns = {
        c: (F.expr(v) if isinstance(v, str) else v) for c, v in assignments.items()
    }
    auto_ntok = "tokens" in assigns and "n_tok" not in assigns and "n_tok" in names

    # ---- pass 1: find touched files (shared with DELETE) ---------------
    head, matched_rows, cand, shard_entries = find_touched_files(table, pred, sources, metrics)
    if not cand:
        return None, metrics.finish()
    cand_paths = [e["file_path"] for e in cand]

    # ---- pass 2: rewrite touched files with CASE WHEN assignments ------
    ckpt = JobCheckpoint(table.path, job_id)
    ckpt.intent("rewrite", cand_paths)
    t0 = time.time()
    target = read_touched(table, schema, cand_paths)
    hit = F.coalesce(pred, F.lit(False))
    # Two-step projection so every RHS sees OLD values (standard UPDATE
    # swap semantics). A single select that re-aliases `tokens` would let
    # Spark 4's lateral column aliasing bind a later RHS's `tokens`
    # reference to the NEW value; staging the new values under reserved
    # `__new_*` names keeps all RHS references on the input attributes.
    # Catalyst collapses the pair back into one Project.
    staged = target.select(
        "*",
        *[F.when(hit, assigns[c]).otherwise(F.col(c)).alias(f"__new_{c}") for c in assigns],
    )
    # auto-recounted n_tok reads size(__new_tokens), NOT a copy of the
    # tokens expression: the double reference to a non-cheap staged
    # column blocks CollapseProject from re-inlining it (plan-verified),
    # so the assignment expression evaluates ONCE per matched row —
    # duplicating it would double the rewrite's dominant per-row cost.
    def _out(c: str) -> Column:
        if c == "n_tok" and auto_ntok:
            return F.size(F.col("__new_tokens"))
        return F.col(f"__new_{c}") if c in assigns else F.col(c)

    updated = staged.select(*[_out(c).alias(c) for c in names])
    # conform assignment results to the DECLARED column types (store-
    # assignment cast, like Iceberg UPDATE): SQL `n_tok/2` is a double,
    # and writing it as-is would commit parquet files the explicit-schema
    # scan path can no longer read (INT32 expected, DOUBLE found)
    updated = schema.conform(updated)
    updated = with_zkey(updated, curve=curve).sortWithinPartitions("source", mf.ZKEY_COL)
    new_files, fresh = table._write_files(
        updated, f"update-{job_id}", repartition_n=None, curve=curve
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

    # ---- commit (shared with DELETE) ------------------------------------
    snap = commit_rewrite(
        table,
        head,
        schema,
        cand,
        shard_entries,
        fresh,
        "update",
        {
            "job_id": job_id,
            "matched_rows": matched_rows,
            "assigned_columns": sorted(set(assigns) | ({"n_tok"} if auto_ntok else set())),
            "rewritten_files": len(cand_paths),
            "new_files": len(fresh),
        },
    )
    metrics.finish()
    from hoopstat_haus_spark.lakehouse.health import record_job_metrics

    record_job_metrics(table.path, metrics, "update", snapshot_id=snap.snapshot_id)
    return snap, metrics
