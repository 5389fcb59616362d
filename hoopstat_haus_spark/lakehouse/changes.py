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
read. The classifying join shuffles only those changed files' rows on
(doc_id, source), so a 1-of-10^4-partition MERGE diffs against one
partition's changed files, not the table. Equal-content rewrite rows
(compaction) are filtered AFTER the join by a content signature
computed in the scan projection (whole-stage codegen, no Python).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hoopstat_haus_spark.lakehouse import manifest as mf
from hoopstat_haus_spark.lakehouse.table import TokenLakeTable

CHANGE_COL = "_change"


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
    the postimage; see lakehouse/incremental.py)."""
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

    def read_side(paths: list[str], tag: str) -> DataFrame:
        if not paths:
            return table.spark.createDataFrame(
                [],
                schema=f"doc_id string, source string, {tag}_v struct<"
                + ", ".join(f"{f['name']}: {f['type']}" for f in schema.fields if f["name"] in value_names)
                + f">, {tag}_sig string",
            )
        df = (
            table.spark.read.option("basePath", table.data_dir)
            .schema(schema.ddl(extra=((mf.ZKEY_COL, "long"),)))
            .parquet(*[os.path.join(table.path, p) for p in paths])
            .drop(mf.ZKEY_COL)
        )
        df = schema.apply_defaults(df)
        val = F.struct(*[F.col(c) for c in value_names])
        # signature in the scan projection: content equality is decided
        # by one string compare post-join instead of N column compares
        return df.select(
            "doc_id", "source", val.alias(f"{tag}_v"), F.md5(F.to_json(val)).alias(f"{tag}_sig")
        )

    new_side = read_side(added, "n")
    old_side = read_side(removed, "o")
    joined = new_side.join(old_side, ["doc_id", "source"], "full_outer")
    is_del = F.col("n_sig").isNull()
    is_ins = F.col("o_sig").isNull()
    is_upd = ~is_del & ~is_ins & (F.col("n_sig") != F.col("o_sig"))
    if preimage:
        # updates fan out to (pre, post) via a 2-element explode; the
        # expression stays fully native (no shuffle added — explode is a
        # narrow generator over the join output)
        emitted = (
            F.when(is_del, F.array(F.struct(F.col("o_v").alias("v"), F.lit("delete").alias("k"))))
            .when(is_ins, F.array(F.struct(F.col("n_v").alias("v"), F.lit("insert").alias("k"))))
            .when(
                is_upd,
                F.array(
                    F.struct(F.col("o_v").alias("v"), F.lit("update_pre").alias("k")),
                    F.struct(F.col("n_v").alias("v"), F.lit("update_post").alias("k")),
                ),
            )
        )
        ex = joined.select("doc_id", "source", F.explode(emitted).alias("e"))
        out_cols = [
            (F.col(c) if c in ("doc_id", "source") else F.col("e.v")[c]).alias(c) for c in names
        ]
        return ex.select(*out_cols, F.col("e.k").alias(CHANGE_COL))
    change = (
        F.when(is_del, F.lit("delete"))
        .when(is_ins, F.lit("insert"))
        .when(is_upd, F.lit("update"))
    )
    picked = F.when(change == "delete", F.col("o_v")).otherwise(F.col("n_v"))
    out_cols = [
        (F.col("doc_id") if c == "doc_id" else F.col("source") if c == "source" else picked[c])
        .alias(c)
        for c in names
    ]
    return (
        joined.withColumn(CHANGE_COL, change)
        .filter(F.col(CHANGE_COL).isNotNull())
        .select(*out_cols, CHANGE_COL)
    )


def changes_summary(changes: DataFrame) -> dict[str, int]:
    """{insert: n, update: n, delete: n} — one small aggregate."""
    rows = changes.groupBy(CHANGE_COL).agg(F.count(F.lit(1)).alias("n")).collect()
    return {r[CHANGE_COL]: int(r["n"]) for r in rows}
