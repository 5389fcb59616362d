"""Snapshot rollback (TokenLakeTable.rollback).

The contract: rollback restores an earlier snapshot's DATA state as a
NEW commit — metadata-only (the target manifest carries by reference,
no data file is read or written), history-preserving (the undone state
stays pinnable), CDC-inverse (the change feed across a rollback is the
exact inverse of the undone commits' row changes), and GC-safe (the
restored files are reachable from the rollback snapshot's record).
"""

import os

import pytest
from pyspark.sql import functions as F

from hoopstat_haus_spark.lakehouse import CompactionPolicy, TokenLakeTable
from hoopstat_haus_spark.lakehouse.changes import changes_summary, table_changes
from hoopstat_haus_spark.tables import synthetic, token_sig

MB = 1024 * 1024
POLICY = CompactionPolicy(min_file_bytes=1 * MB, target_file_bytes=4 * MB, max_file_bytes=8 * MB)
NUM = "cast(substr(doc_id, 5) as long)"


def sigs(table, **kw):
    return sorted(
        tuple(r)
        for r in table.scan(**kw).select("doc_id", token_sig(F.col("tokens")).alias("s")).collect()
    )


def data_files(table_path):
    out = set()
    for root, _dirs, names in os.walk(os.path.join(table_path, "data")):
        out.update(os.path.join(root, n) for n in names if n.endswith(".parquet"))
    return out


def test_rollback_restores_state_metadata_only(spark, tmp_table_dir):
    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 4000), repartition_n=6)
    base_id = t.log.current_id()
    base = sigs(t)

    upd, _ = t.update_where(f"{NUM} % 9 = 2", {"tokens": "transform(tokens, x -> cast(x+1 as int))"})
    n_upd = upd.summary["matched_rows"]
    dele, _ = t.delete_where(f"{NUM} % 50 = 7")
    n_del = dele.summary["matched_rows"]
    assert n_upd and n_del
    mutated_id = t.log.current_id()
    mutated = sigs(t)
    assert mutated != base

    files_before = data_files(t.path)
    snap = t.rollback(snapshot_id=base_id)
    # metadata-only: not one data file appeared or vanished
    assert data_files(t.path) == files_before
    assert snap.operation == "rollback"
    assert snap.summary["restored_snapshot_id"] == base_id
    assert snap.manifest == t.log.get(base_id).manifest  # carried by reference
    assert sigs(t) == base
    assert snap.summary["rows"] == len(base)

    # history preserved: the rolled-back-FROM state still reads
    assert sigs(t, snapshot_id=mutated_id) == mutated

    # CDC across the rollback is the exact inverse of the undone DML:
    # deleted rows come back as inserts (including the ones the update
    # had also touched — they're absent FROM-side, so they classify as
    # insert, not update), everything else the update touched reverts.
    both = sum(1 for n in range(4000) if n % 9 == 2 and n % 50 == 7)
    assert changes_summary(table_changes(t, mutated_id)) == {
        "update": n_upd - both,
        "insert": n_del,
    }
    # ... and CDC across (mutate + rollback) nets to zero
    assert changes_summary(table_changes(t, base_id)) == {}


def test_rollback_by_tag_and_roundtrip(spark, tmp_table_dir):
    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 2000), repartition_n=4)
    t.tag("golden")
    golden = sigs(t)
    t.update_where(f"{NUM} % 4 = 1", {"tokens": "transform(tokens, x -> cast(x+7 as int))"})
    t.tag("after-update")
    after = sigs(t)

    t.rollback(tag="golden")
    assert sigs(t) == golden
    t.rollback(tag="after-update")
    assert sigs(t) == after  # forward "rollback" works too — it's just a restore


def test_rollback_survives_expiry_and_gc(spark, tmp_table_dir):
    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 3000), repartition_n=6)
    base_id = t.log.current_id()
    base = sigs(t)
    t.delete_where(f"{NUM} % 3 = 0")
    t.compact(POLICY)
    t.rollback(snapshot_id=base_id)

    # expire everything but HEAD (the rollback snapshot) and GC hard
    t.expire_snapshots(keep_last=1)
    t.collect_garbage(min_age_s=0.0)
    assert sigs(t) == base  # restored files were reachable, not collected


def test_rollback_rejects_head_missing_and_ambiguous_targets(spark, tmp_table_dir):
    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 500), repartition_n=1)
    head = t.log.current_id()
    with pytest.raises(ValueError, match="already HEAD"):
        t.rollback(snapshot_id=head)
    with pytest.raises(ValueError, match="does not exist"):
        t.rollback(snapshot_id=999)
    with pytest.raises(ValueError, match="exactly one"):
        t.rollback()
    with pytest.raises(ValueError, match="exactly one"):
        t.rollback(snapshot_id=head, tag="x")


def test_rollback_keeps_live_schema(spark, tmp_table_dir):
    """Schema evolution is NOT undone: after rolling back past an
    evolve, HEAD reads restored files under the live schema with the
    evolved column's default filled in."""
    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 800), repartition_n=2)
    base_id = t.log.current_id()
    t.evolve_schema([{"name": "lang", "type": "string", "default": "und"}])
    t.update_where(f"{NUM} % 2 = 0", {"lang": "'en'"})
    t.rollback(snapshot_id=base_id)
    rows = t.scan().select("lang").distinct().collect()
    assert {r["lang"] for r in rows} == {"und"}  # default, not the update
    assert t.schema_def().version == 2  # live schema unchanged by rollback
