"""Quarantine + replay: invalid-row isolation and fixed-up reingestion.

Reference: the bronze quarantine store with error classification
(``apps/bronze-ingestion/app/quarantine.py:20-372``) and the replay
engine with Identity / RoundingTolerance transforms and a
quarantined→replaying→resolved state machine
(``apps/bronze-ingestion/app/replay.py:100-660``). The engine's version
is set-based instead of per-object:

- :func:`validate_batch` splits an incoming batch into (valid,
  quarantined) with a per-row ``_error_class`` — one pass, native
  predicates, no Python.
- :func:`quarantine_batch` writes rejects to a ``_quarantine/`` sidecar
  (parquet, partitioned by error class) — the reject-file pattern.
- :func:`replay` applies a fix transform to selected quarantined rows,
  re-validates, MERGEs the now-valid rows into the table, and rewrites
  the sidecar without them (resolved). Rows whose fix still fails stay
  quarantined (failed) — same terminal states as the reference.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hoopstat_haus_spark.lakehouse.merge import merge_into
from hoopstat_haus_spark.lakehouse.table import TokenLakeTable

VOCAB_SIZE = 50257

ERROR_NONE = "ok"
ERROR_LENGTH = "length_mismatch"  # n_tok != size(tokens)
ERROR_VOCAB = "token_out_of_vocab"
ERROR_EMPTY = "empty_sequence"
ERROR_NULL_KEY = "null_key"


def classify(df: DataFrame) -> DataFrame:
    """Attach ``_error_class`` (first failing rule wins, reference-style
    priority: structural > content)."""
    bad_vocab = F.exists("tokens", lambda t: (t < 0) | (t >= VOCAB_SIZE))
    return df.withColumn(
        "_error_class",
        F.when(F.col("doc_id").isNull() | F.col("source").isNull(), ERROR_NULL_KEY)
        .when(F.col("tokens").isNull() | (F.size("tokens") == 0), ERROR_EMPTY)
        .when(F.size("tokens") != F.col("n_tok"), ERROR_LENGTH)
        .when(bad_vocab, ERROR_VOCAB)
        .otherwise(ERROR_NONE),
    )


def validate_batch(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    c = classify(df)
    return (
        c.filter(F.col("_error_class") == ERROR_NONE).drop("_error_class"),
        c.filter(F.col("_error_class") != ERROR_NONE),
    )


def quarantine_dir(table: TokenLakeTable) -> str:
    return os.path.join(table.path, "_quarantine")


def quarantine_batch(table: TokenLakeTable, rejected: DataFrame) -> None:
    rejected.write.mode("append").partitionBy("_error_class").parquet(quarantine_dir(table))


def read_quarantine(table: TokenLakeTable) -> DataFrame:
    qd = quarantine_dir(table)
    if not os.path.isdir(qd):
        return table.spark.createDataFrame(
            [], schema="doc_id string, tokens array<int>, n_tok int, source string, _error_class string"
        )
    return table.spark.read.parquet(qd)


# -------------------------------------------------- fix transforms (M7)


def fix_identity(df: DataFrame) -> DataFrame:
    """Reference Identity transform: replay unchanged (for rows that
    were quarantined by a since-fixed validator bug)."""
    return df


def fix_recount(df: DataFrame) -> DataFrame:
    """Repair length_mismatch: trust the array, recompute n_tok."""
    return df.withColumn("n_tok", F.size("tokens").cast("int"))


def fix_clamp_vocab(df: DataFrame) -> DataFrame:
    """Repair token_out_of_vocab: clamp into [0, vocab) (reference
    RoundingTolerance analog — bounded coercion instead of rejection)."""
    return df.withColumn(
        "tokens",
        F.transform("tokens", lambda t: F.least(F.greatest(t, F.lit(0)), F.lit(VOCAB_SIZE - 1))),
    )


FIXES: dict[str, Callable[[DataFrame], DataFrame]] = {
    ERROR_LENGTH: fix_recount,
    ERROR_VOCAB: fix_clamp_vocab,
}


def replay(
    table: TokenLakeTable,
    error_classes: list[str] | None = None,
    fixes: dict[str, Callable[[DataFrame], DataFrame]] | None = None,
) -> dict:
    """Replay quarantined rows through their fix transform → re-validate
    → MERGE the resolved rows → rewrite the sidecar without them.

    Returns {replayed, resolved, still_failed} counts."""
    fixes = fixes or FIXES
    replay_classes = [c for c in (error_classes or list(fixes)) if c in fixes]
    q = read_quarantine(table).filter(F.col("_error_class").isin(replay_classes))
    total = q.count()
    if total == 0:
        return {"replayed": 0, "resolved": 0, "still_failed": 0}

    fixed_parts = []
    for err in replay_classes:
        part = q.filter(F.col("_error_class") == err).drop("_error_class")
        fixed_parts.append(fixes[err](part))
    candidates = fixed_parts[0]
    for p in fixed_parts[1:]:
        candidates = candidates.unionByName(p)

    valid, still_bad = validate_batch(candidates)
    resolved = valid.count()
    still_failed = still_bad.count()
    if resolved:
        merge_into(table, valid)

    # rewrite sidecar: keep the non-replayed classes plus still-failing
    # rows; staging + rename so a crash never loses the sidecar
    remaining = read_quarantine(table).filter(~F.col("_error_class").isin(replay_classes))
    remaining = remaining.unionByName(still_bad)
    qd = quarantine_dir(table)
    tmp = qd + f".new-{uuid.uuid4().hex[:8]}"
    remaining.write.mode("overwrite").partitionBy("_error_class").parquet(tmp)
    old = qd + f".old-{uuid.uuid4().hex[:8]}"
    os.rename(qd, old)
    os.rename(tmp, qd)
    shutil.rmtree(old, ignore_errors=True)
    return {"replayed": total, "resolved": resolved, "still_failed": still_failed}


def summarize_quarantine(table: TokenLakeTable) -> DataFrame:
    """Counts by error classification (reference quarantine summary,
    ``quarantine.py:320-372``)."""
    return read_quarantine(table).groupBy("_error_class").agg(F.count(F.lit(1)).alias("n")).orderBy(
        "_error_class"
    )
