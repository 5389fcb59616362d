"""Change data feed: net row-level changes between two snapshots.

Reference ancestor: the silver layer re-derives downstream state from
"what changed since the marker" (``meta/adr/ADR-028``), and
``changed_partitions_since`` (table.py) answers that at partition
granularity. This module answers it at ROW granularity — the
Delta/Iceberg "change data feed" surface — without any extra state:
the manifest diff IS the changelog.

Semantics — NET diff between the two snapshot states (not per-commit
replay): a key inserted then deleted between the endpoints emits
nothing; a compaction (pure physical rewrite) emits nothing; an upsert
that rewrote a file emits only the rows whose CONTENT actually changed.
Each emitted row carries ``_change`` ∈ {insert, update, delete}:
``update``/``insert`` rows carry the TO-snapshot values, ``delete``
rows the FROM-snapshot values. Rows are compared projected onto the
TO-snapshot schema with column defaults applied, so a metadata-only
schema evolution (no file touched) emits nothing.

Scale design: the diff walks the two manifest LISTS shard-aware —
partitions carried by reference (same shard path) are skipped without
opening their shards; only files present on exactly one side are ever
read. Row comparison is TWO-PHASE (round 6): the classifying full-outer
join carries only (doc_id, source, sig) — the content signature is
computed in the scan projection and the token payload never enters that
exchange (~60 B/row shuffled instead of the ~1 KB row twice) — then
payloads are fetched with a second join ONLY for the net-changed keys,
broadcast when the changed-key set is small, and skipped entirely for
change classes the classify counts prove empty. CDC over a pure
compaction therefore shuffles zero payload bytes and never re-reads the
files in phase 2; a pure append/expiry diff (nothing removed/added)
short-circuits to a direct labeled scan with no join at all (the
one-row-per-key table invariant makes every added row an insert).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hoopstat_haus_spark.lakehouse import manifest as mf
from hoopstat_haus_spark.lakehouse.table import TokenLakeTable

CHANGE_COL = "_change"

# fetch-join build side: broadcast the changed-key set while it fits
# comfortably under the session's 32 MB autoBroadcast threshold
# (~60 B/key); past that the payload side shuffles once (sort-merge),
# which is the scale-correct fallback for a table-wide churn diff
BROADCAST_KEYS_MAX = 500_000


def changed_files(table: TokenLakeTable, from_id: int, to_id: int) -> tuple[list[str], list[str]]:
    """Manifest diff → (added_paths, removed_paths), shard-aware: a
    partition whose shard is carried by reference between the snapshots
    costs nothing (the shard parquet is never opened)."""
    old_snap, new_snap = table.log.get(from_id), table.log.get(to_id)
    added: list[str] = []
    removed: list[str] = []
    for _part, old_entries, new_entries in mf.diff_partition_entries(
        table.path, old_snap.manifest, new_snap.manifest
    ):
        old_files = {e["file_path"] for e in old_entries}
        new_files = {e["file_path"] for e in new_entries}
        added.extend(sorted(new_files - old_files))
        removed.extend(sorted(old_files - new_files))
    return added, removed


def table_changes(
    table: TokenLakeTable, from_id: int, to_id: int | None = None, preimage: bool = False
) -> DataFrame:
    """Row-level net changes from snapshot ``from_id`` to ``to_id``
    (default: the current head). Returns the TO-snapshot schema plus
    ``_change`` ∈ {insert, update, delete}.

    ``preimage=True`` switches to Delta-CDF-style update pairs: each
    updated key emits TWO rows — ``update_pre`` (FROM values) and
    ``update_post`` (TO values) — which is what makes downstream
    aggregates incrementally maintainable (subtract the preimage, add
    the postimage; see lakehouse/incremental.py).

    EAGER for two-sided diffs (round 6): the skinny classify join runs
    at CALL time (the net-changed key set is localCheckpoint'd and its
    class counts drive phase-2 planning), so this is not a pure plan
    builder anymore. The checkpointed key blocks are freed when the
    returned frame is garbage-collected — callers that diff many
    snapshot pairs in one long-lived session should drop references
    between calls (every current caller consumes the frame immediately).
    """
    to_id = to_id if to_id is not None else table.log.current_id()
    schema = table.schema_def(to_id)
    names = schema.names()
    value_names = [c for c in names if c not in ("doc_id", "source")]
    empty_ddl = schema.ddl() + f", {CHANGE_COL} string"
    if from_id == to_id:
        return table.spark.createDataFrame([], schema=empty_ddl)
    added, removed = changed_files(table, from_id, to_id)
    if not added and not removed:
        return table.spark.createDataFrame([], schema=empty_ddl)

    def read_rows(paths: list[str]) -> DataFrame:
        df = (
            table.spark.read.option("basePath", table.data_dir)
            .schema(schema.ddl(extra=((mf.ZKEY_COL, "long"),)))
            .parquet(*[os.path.join(table.path, p) for p in paths])
            .drop(mf.ZKEY_COL)
        )
        return schema.apply_defaults(df)

    def labeled(df: DataFrame, kinds: F.Column) -> DataFrame:
        return df.select(*names, kinds.alias(CHANGE_COL))

    # one-sided diffs need no join at all: the one-row-per-key table
    # invariant means a commit that removed nothing cannot have written
    # an existing key (the table would hold the key twice), so every
    # added row is an insert — and symmetrically for pure removals.
    if not removed:
        return labeled(read_rows(added), F.lit("insert"))
    if not added:
        return labeled(read_rows(removed), F.lit("delete"))

    sig = F.md5(F.to_json(F.struct(*[F.col(c) for c in value_names])))

    def skinny(paths: list[str], tag: str) -> DataFrame:
        # signature in the scan projection: the classify join below
        # shuffles (doc_id, source, sig) — the payload never enters it
        return read_rows(paths).select("doc_id", "source", sig.alias(f"{tag}_sig"))

    is_del = F.col("n_sig").isNull()
    is_ins = F.col("o_sig").isNull()
    is_upd = ~is_del & ~is_ins & (F.col("n_sig") != F.col("o_sig"))
    change = (
        F.when(is_del, F.lit("delete"))
        .when(is_ins, F.lit("insert"))
        .when(is_upd, F.lit("update"))
    )
    keyed = (
        skinny(added, "n")
        .join(skinny(removed, "o"), ["doc_id", "source"], "full_outer")
        .select("doc_id", "source", change.alias(CHANGE_COL))
        .filter(F.col(CHANGE_COL).isNotNull())
        .localCheckpoint()  # two fetch joins consume it; never recompute
    )
    # phase-2 planning from the ACTUAL class counts: a class with zero
    # keys skips its payload fetch entirely (CDC over a pure compaction
    # ends here — zero payload rows scanned twice, zero shuffled), and a
    # small changed-key set broadcasts so the payload side never
    # shuffles at all
    counts = {
        r[CHANGE_COL]: r["n"]
        for r in keyed.groupBy(CHANGE_COL).agg(F.count(F.lit(1)).alias("n")).collect()
    }

    def fetch(paths: list[str], wanted: list[str], relabel: dict[str, str]) -> DataFrame | None:
        n_keys = sum(counts.get(k, 0) for k in wanted)
        if n_keys == 0:
            return None
        keys = keyed.filter(F.col(CHANGE_COL).isin(wanted))
        if n_keys <= BROADCAST_KEYS_MAX:
            keys = F.broadcast(keys)
        out = read_rows(paths).join(keys, ["doc_id", "source"], "inner")
        kinds = F.col(CHANGE_COL)
        for src_k, dst_k in relabel.items():
            kinds = F.when(F.col(CHANGE_COL) == src_k, F.lit(dst_k)).otherwise(kinds)
        return labeled(out, kinds)

    if preimage:
        parts = [
            fetch(added, ["insert", "update"], {"update": "update_post"}),
            fetch(removed, ["delete", "update"], {"update": "update_pre"}),
        ]
    else:
        parts = [
            fetch(added, ["insert", "update"], {}),
            fetch(removed, ["delete"], {}),
        ]
    parts = [p for p in parts if p is not None]
    if not parts:
        return table.spark.createDataFrame([], schema=empty_ddl)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def changes_summary(changes: DataFrame) -> dict[str, int]:
    """{insert: n, update: n, delete: n} — one small aggregate."""
    rows = changes.groupBy(CHANGE_COL).agg(F.count(F.lit(1)).alias("n")).collect()
    return {r[CHANGE_COL]: int(r["n"]) for r in rows}
