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


def test_commit_exclusive_creation_beats_check_then_act(spark, tmp_table_dir):
    """Two writers that BOTH read head=N must not both commit v(N+1):
    the second exclusive create of v(N+1).json fails even though its
    expected_parent check passed (simulated by pre-creating the version
    file another writer would have just written)."""
    import os

    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 1000), repartition_n=2)
    head = t.log.current_id()
    # writer A commits v(head+1) out-of-band (both writers read head)
    with open(os.path.join(t.path, "_snapshots", f"v{head + 1}.json"), "w") as f:
        f.write("{}")
    with pytest.raises(ConcurrentCommitError):
        t.log.commit("manifest-from-writer-b", "compact", expected_parent=head)


def test_gc_min_age_protects_fresh_orphans(spark, tmp_table_dir):
    """A young unreachable file (possibly an in-flight job's staged
    output) survives GC; with the guard disabled it is collected."""
    import os

    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 1000), repartition_n=2)
    orphan = os.path.join(t.path, "data", "source=web", "orphan-000.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not-a-real-parquet")
    report = t.collect_garbage()  # default min-age: keep
    assert "data/source=web/orphan-000.parquet" not in report["removed_data_files"]
    assert os.path.exists(orphan)
    report = t.collect_garbage(min_age_s=0)
    assert "data/source=web/orphan-000.parquet" in report["removed_data_files"]
    assert not os.path.exists(orphan)


def test_gc_spares_checkpointed_outputs_and_live_staging(spark, tmp_table_dir):
    """GC during a crashed-but-resumable compaction must keep (a) unit
    outputs recorded in the job checkpoint (staged into data dirs but in
    no manifest yet) and (b) the job's .staging tree — the resume
    contract depends on both."""
    import os

    from hoopstat_haus_spark.lakehouse.checkpoint import JobCheckpoint

    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 1000), repartition_n=2)
    # simulate a crashed job: one done unit whose output is an orphan file
    out_rel = "data/source=web/compact-crashjob-00000.parquet"
    with open(os.path.join(t.path, out_rel), "wb") as f:
        f.write(b"staged-output")
    ckpt = JobCheckpoint(t.path, "crashjob")
    ckpt.done("web", ["data/source=web/whatever.parquet"], [out_rel], rows=1, tokens=1, duration_s=0.1)
    staging_dir = os.path.join(t.path, ".staging", "crashjob", "web")
    os.makedirs(staging_dir)
    with open(os.path.join(staging_dir, "part-0.parquet"), "wb") as f:
        f.write(b"in-flight")

    report = t.collect_garbage(min_age_s=0)  # even with age guard off
    assert out_rel not in report["removed_data_files"]
    assert os.path.exists(os.path.join(t.path, out_rel))
    assert ".staging/crashjob" not in report.get("removed_staging", [])
    assert os.path.isdir(staging_dir)


def test_gc_staging_age_gates_on_subtree_mtime(spark, tmp_table_dir):
    """A long-running uncheckpointed job keeps WRITING into
    .staging/<job>/out/ — POSIX freezes the TOP dir's mtime once its
    direct entries exist, so the sweep must gate on the newest mtime in
    the SUBTREE or it deletes a live job's in-flight output."""
    import os
    import time as _time

    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 200), repartition_n=2)
    job = os.path.join(t.path, ".staging", "longjob")
    out = os.path.join(job, "out")
    os.makedirs(out)
    with open(os.path.join(out, "part-0.parquet"), "wb") as f:
        f.write(b"in-flight")
    # age the TOP dir (and everything but the freshest file) past min_age
    old = _time.time() - 3600
    os.utime(job, (old, old))
    os.utime(out, (old, old))
    os.utime(os.path.join(out, "part-0.parquet"), (old, old))
    # ... then the job writes one more file just now (live activity)
    with open(os.path.join(out, "part-1.parquet"), "wb") as f:
        f.write(b"fresh")

    report = t.collect_garbage(min_age_s=600)
    assert ".staging/longjob" not in report.get("removed_staging", [])
    assert os.path.isdir(out)

    # once the whole subtree is old, the sweep takes it (writing part-1
    # refreshed out/'s own mtime — age every node again)
    os.utime(os.path.join(out, "part-1.parquet"), (old, old))
    os.utime(out, (old, old))
    os.utime(job, (old, old))
    report = t.collect_garbage(min_age_s=600)
    assert ".staging/longjob" in report["removed_staging"]
    assert not os.path.isdir(job)


def test_merge_rejects_duplicate_update_keys(spark, tmp_table_dir):
    """Iceberg MERGE semantics: duplicate (doc_id, source) in the update
    set must fail loudly, not fan out matched rows."""
    from hoopstat_haus_spark.lakehouse.merge import merge_into

    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 1000), repartition_n=2)
    one = t.scan().limit(1).select("doc_id", "tokens", "n_tok", "source")
    dup = one.unionByName(one)
    with pytest.raises(ValueError, match="duplicate update key"):
        merge_into(t, dup)


def test_merge_insert_files_sized_to_insert_count(spark, tmp_table_dir):
    """A mostly-upsert feed with a handful of genuinely-new rows must
    size the insert write from the INSERT count (post anti-join), not
    the whole feed — otherwise the few inserts fan out across up to 256
    salted partitions as tiny files, undoing compaction."""
    from hoopstat_haus_spark.lakehouse.merge import merge_into

    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 4000), repartition_n=4)
    # feed = 500 upserts + 3 new docs
    ups = t.scan().filter(
        F.expr("cast(substr(doc_id, 5) as long) % 8 = 0")
    ).select("doc_id", "tokens", "n_tok", "source")
    news = synthetic(spark, 4003).filter(
        F.expr("cast(substr(doc_id, 5) as long) >= 4000")
    ).select("doc_id", "tokens", "n_tok", "source")
    before = {e["file_path"] for e in t.manifest_entries()}
    merge_into(t, ups.unionByName(news))
    ins_files = [
        e for e in t.manifest_entries()
        if e["file_path"] not in before and "/insert-" in e["file_path"]
    ]
    n_sources = news.select("source").distinct().count()
    # sized from 3 inserts → 1 shuffle partition → ≤ one file per source
    assert 1 <= len(ins_files) <= n_sources, [e["file_path"] for e in ins_files]


def test_lost_race_orphan_shards_are_gc_able(spark, tmp_table_dir):
    """A writer that loses the optimistic-concurrency race has already
    written its new manifest shards + list (update_manifest runs before
    commit). Those orphans must (a) not corrupt the winner's chain and
    (b) be collected by GC once aged, while every shard the winner's
    list references survives."""
    import os

    from hoopstat_haus_spark.lakehouse import manifest as mf

    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 4000), repartition_n=4)
    head = t.log.current()
    records = mf.read_manifest_list(t.path, head.manifest)
    part = records[0]["partition"]

    # loser writes its manifest update (one rewritten shard) but the
    # winner commits first
    loser_rel, _ = mf.update_manifest(
        t.path, head.manifest, {part: mf.read_shard(t.path, records[0])}
    )
    snap_w, _ = t.compact(POLICY, job_id="winner")
    assert snap_w is not None
    with pytest.raises(ConcurrentCommitError):
        t.log.commit(loser_rel, "compact", expected_parent=head.snapshot_id)

    pre = sorted(r["doc_id"] for r in t.scan().select("doc_id").collect())
    t.expire_snapshots(keep_last=1)
    report = t.collect_garbage(min_age_s=0.0)
    # the loser's list (and its freshly-written shard) are orphans now
    assert loser_rel in report["removed_manifests"]
    live = set(mf.manifest_files(t.path, t.log.current().manifest))
    for rel in live:
        assert os.path.exists(os.path.join(t.path, rel))
    assert sorted(r["doc_id"] for r in t.scan().select("doc_id").collect()) == pre
