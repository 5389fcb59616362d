"""Skew handling + concurrent-writer safety — the north rule's explicit
operational requirements."""

import pytest
from pyspark.sql import functions as F

from hoopstat_haus_spark.lakehouse import CompactionPolicy, TokenLakeTable
from hoopstat_haus_spark.lakehouse.snapshots import ConcurrentCommitError
from hoopstat_haus_spark.tables import synthetic, token_sig

MB = 1024 * 1024
POLICY = CompactionPolicy(min_file_bytes=1 * MB, target_file_bytes=2 * MB, max_file_bytes=8 * MB)


def test_extreme_skew_outputs_balanced_files(spark, tmp_table_dir):
    """95% of rows in one source: the hot partition must split into many
    near-target files with disjoint z-ranges, not one giant file."""
    df = synthetic(spark, 30000).withColumn(
        "source",
        F.when(F.substring("doc_id", 5, 10).cast("long") % 20 != 0, "web").otherwise(F.col("source")),
    )
    t = TokenLakeTable.create(spark, tmp_table_dir, df, repartition_n=16)
    pre = sorted(tuple(r) for r in t.scan().select("doc_id", token_sig(F.col("tokens")).alias("s")).collect())
    policy = CompactionPolicy(min_file_bytes=MB // 2, target_file_bytes=MB, max_file_bytes=4 * MB)
    t.compact(policy)
    assert sorted(tuple(r) for r in t.scan().select("doc_id", token_sig(F.col("tokens")).alias("s")).collect()) == pre

    web = [e for e in t.manifest_entries() if e["partition"] == "web"]
    assert len(web) >= 4, "hot partition not split"
    sizes = [e["file_bytes"] for e in web]
    assert max(sizes) <= policy.max_file_bytes
    # balanced: largest within 4x of median (range-bucket routing, not hash luck)
    sizes.sort()
    assert sizes[-1] <= 4 * sizes[len(sizes) // 2]
    ranges = sorted((e["zmin"], e["zmax"]) for e in web)
    for a, b in zip(ranges, ranges[1:]):
        assert b[0] > a[1]


def test_concurrent_compactions_one_wins(spark, tmp_table_dir):
    """Two maintenance jobs planned against the same snapshot: the first
    commit wins, the second hits optimistic-concurrency rejection and
    leaves the table untouched (its outputs become GC-able orphans)."""
    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 4000), repartition_n=8)
    snap1, _ = t.compact(POLICY, job_id="writer-a")
    assert snap1 is not None

    # writer-b planned against v1 (stale): simulate by committing with the
    # old expected_parent
    with pytest.raises(ConcurrentCommitError):
        t.log.commit("manifest-from-writer-b", "compact", expected_parent=1)

    # table state is writer-a's
    assert t.log.current_id() == snap1.snapshot_id
    rows = t.scan().count()
    assert rows == 4000
