"""Preimage change feed + incremental view maintenance.

The core claim: after ANY sequence of maintenance operations, applying
the preimage change feed to the materialized rollup produces exactly
what a full recompute over the head snapshot produces — at the cost of
reading only the changed files.
"""

import pytest
from pyspark.sql import functions as F

from hoopstat_haus_spark.lakehouse import CompactionPolicy, TokenLakeTable
from hoopstat_haus_spark.lakehouse.changes import table_changes
from hoopstat_haus_spark.lakehouse.incremental import IncrementalRollup, _rollup
from hoopstat_haus_spark.lakehouse.merge import merge_into
from hoopstat_haus_spark.tables import synthetic

MB = 1024 * 1024
POLICY = CompactionPolicy(min_file_bytes=1 * MB, target_file_bytes=4 * MB, max_file_bytes=8 * MB)
NUM = "cast(substr(doc_id, 5) as long)"


def full_rollup(t):
    return {
        r["source"]: (r["n_docs"], r["sum_n_tok"], r["sum_tok_checksum"])
        for r in _rollup(t.scan()).collect()
    }


def view_rows(v):
    return {s: tuple(vals) for s, vals in v.state()["rows"].items()}


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivm") / "t")
    return TokenLakeTable.create(spark, path, synthetic(spark, 5000), repartition_n=6)


def test_preimage_feed_pairs(table, spark):
    from_id = table.log.current_id()
    upd = (
        synthetic(spark, 5000)
        .filter(F.expr(f"{NUM} % 400 = 7"))
        .withColumn("tokens", F.expr("transform(tokens, x -> cast(x + 2 as int))"))
    )
    n_upd = upd.count()
    assert n_upd > 0
    merge_into(table, upd)
    ch = table_changes(table, from_id, preimage=True)
    kinds = {r["_change"]: r["n"] for r in ch.groupBy("_change").agg(F.count("*").alias("n")).collect()}
    assert kinds == {"update_pre": n_upd, "update_post": n_upd}
    # pre/post rows pair up per key and differ in content
    pairs = (
        ch.groupBy("doc_id")
        .agg(
            F.count("*").alias("n"),
            F.count_distinct(F.md5(F.to_json(F.struct("tokens", "n_tok")))).alias("n_distinct"),
        )
        .collect()
    )
    assert all(r["n"] == 2 and r["n_distinct"] == 2 for r in pairs)


def test_incremental_refresh_tracks_full_recompute(table, spark):
    v = IncrementalRollup(table, "rollup")
    st0 = v.refresh()  # initial: full scan
    assert view_rows(v) == full_rollup(table)
    base_snapshot = st0["snapshot_id"]

    # idempotent when nothing changed
    assert v.refresh()["snapshot_id"] == base_snapshot

    # merge: updates + inserts + a delete
    upd = synthetic(spark, 5010).filter(F.expr(f"{NUM} % 611 = 3 or {NUM} >= 5000"))
    upd = upd.withColumn("tokens", F.expr("transform(tokens, x -> cast(x + 1 as int))"))
    upd = upd.withColumn("_op", F.when(F.expr(f"{NUM} = 614"), "delete").otherwise("upsert"))
    merge_into(table, upd)
    v.refresh()
    assert view_rows(v) == full_rollup(table)

    # predicate delete
    table.delete_where(f"{NUM} % 83 = 5")
    v.refresh()
    assert view_rows(v) == full_rollup(table)

    # compaction: physical-only — the delta aggregate must be a no-op
    pre = view_rows(v)
    table.compact(POLICY)
    v.refresh()
    assert view_rows(v) == pre == full_rollup(table)

    # several commits between refreshes fold into one delta
    merge_into(table, synthetic(spark, 5030).filter(F.expr(f"{NUM} >= 5020")))
    table.delete_where(f"{NUM} % 977 = 11")
    v.refresh()
    assert view_rows(v) == full_rollup(table)

    # predicate UPDATE folds via its update_pre/update_post pairs
    pre_upd_id = table.log.current_id()
    pre_upd_view = view_rows(v)
    table.update_where(f"{NUM} % 71 = 9", {"tokens": "transform(tokens, x -> cast(x + 2 as int))"})
    v.refresh()
    assert view_rows(v) == full_rollup(table) != pre_upd_view

    # ROLLBACK: the inverse feed moves the view BACK in O(changed rows)
    table.rollback(snapshot_id=pre_upd_id)
    v.refresh()
    assert view_rows(v) == pre_upd_view == full_rollup(table)

    # to_df matches the state
    df_rows = {r["source"]: (r["n_docs"], r["sum_n_tok"], r["sum_tok_checksum"])
               for r in v.to_df().collect()}
    assert df_rows == view_rows(v)


def test_view_survives_source_disappearing(spark, tmp_table_dir):
    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 800), repartition_n=2)
    v = IncrementalRollup(t, "r2")
    v.refresh()
    t.delete_where("source = 'web'")
    v.refresh()
    assert "web" not in view_rows(v)
    assert view_rows(v) == full_rollup(t)


def test_view_rebuilds_when_base_snapshot_expired(spark, tmp_table_dir):
    """A state pinned to an expired snapshot must fall back to a full
    rebuild — not wedge every future refresh on the missing log entry
    (the change feed cannot start at a snapshot that no longer exists)."""
    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 800), repartition_n=2)
    v = IncrementalRollup(t, "r3")
    v.refresh()
    merge_into(t, synthetic(spark, 820).filter(F.expr(f"{NUM} >= 800")))
    t.expire_snapshots(keep_last=1)  # drops the view's base snapshot
    with pytest.raises(FileNotFoundError):
        t.log.get(v.state()["snapshot_id"])
    v.refresh()
    assert view_rows(v) == full_rollup(t)
    assert v.state()["snapshot_id"] == t.log.current_id()


def test_view_name_cannot_escape_its_directory(spark, tmp_table_dir):
    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 100), repartition_n=1)
    for bad in ("..", ".", ".hidden", "", "a..b"):
        with pytest.raises(ValueError):
            IncrementalRollup(t, bad)
