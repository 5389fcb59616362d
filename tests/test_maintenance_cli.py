"""CLI-level tests for jobs/maintenance_job.py — in particular the
incremental path: `compact --since-snapshot N` must compact ONLY the
partitions whose file set changed since that snapshot (snapshot-diff
discovery wired to the sources filter) and record the pruned unit list
in its JSON output."""

import json
import os
import sys

from pyspark.sql import functions as F

from hoopstat_haus_spark.lakehouse import CompactionPolicy, TokenLakeTable
from hoopstat_haus_spark.lakehouse import manifest as mf
from hoopstat_haus_spark.tables import synthetic

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"))
import maintenance_job  # noqa: E402

POL = CompactionPolicy(min_file_bytes=1 << 20, target_file_bytes=4 << 20, max_file_bytes=8 << 20)


def _run(capsys, *argv) -> dict:
    rc = maintenance_job.main(list(argv))
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_compact_since_snapshot_prunes_units(spark, tmp_table_dir, capsys):
    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 5000), repartition_n=4)
    t.compact(POL)
    baseline = t.log.current_id()
    records = {r["partition"]: r for r in mf.read_manifest_list(t.path, t.log.current().manifest)}
    target = sorted(records)[0]

    # fragment ONE partition with a small append
    batch = (
        synthetic(spark, 5100)
        .filter("cast(substr(doc_id, 5) as long) >= 5000")
        .withColumn("source", F.lit(target))
    )
    t.append(batch, repartition_n=2)

    out = _run(
        capsys,
        "compact",
        "--table",
        t.path,
        "--target-mb",
        "4",
        "--since-snapshot",
        str(baseline),
    )
    assert out["changed_partitions"] == [target]
    assert out["since_snapshot"] == baseline
    assert out["snapshot"] is not None
    # only the changed partition's shard was rewritten by this compact
    after = {r["partition"]: r for r in mf.read_manifest_list(t.path, t.log.current().manifest)}
    for part in records:
        if part != target:
            assert after[part]["path"] == records[part]["path"]


def test_compact_since_snapshot_noop_when_unchanged(spark, tmp_table_dir, capsys):
    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 3000), repartition_n=4)
    t.compact(POL)
    head = t.log.current_id()
    out = _run(
        capsys,
        "compact",
        "--table",
        t.path,
        "--target-mb",
        "4",
        "--since-snapshot",
        str(head),
    )
    assert out["snapshot"] is None
    assert out["changed_partitions"] == []
    assert t.log.current_id() == head


def test_compact_sources_flag(spark, tmp_table_dir, capsys):
    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 4000), repartition_n=4)
    records = {r["partition"]: r for r in mf.read_manifest_list(t.path, t.log.current().manifest)}
    target = sorted(records)[-1]
    out = _run(
        capsys, "compact", "--table", t.path, "--target-mb", "4", "--sources", target
    )
    assert out["sources"] == [target]
    after = {r["partition"]: r for r in mf.read_manifest_list(t.path, t.log.current().manifest)}
    assert after[target]["path"] != records[target]["path"]
    for part in records:
        if part != target:
            assert after[part]["path"] == records[part]["path"]


def test_ingest_subcommand_exactly_once(spark, tmp_table_dir, capsys, tmp_path):
    import shutil

    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 3000), repartition_n=4)
    feed, ckpt = str(tmp_path / "feed"), str(tmp_path / "ckpt")
    os.makedirs(feed)
    stage = str(tmp_path / "stage")
    synthetic(spark, 3200).filter(F.col("doc_id") >= "doc-0000003000").coalesce(1).write.parquet(stage)
    part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
    os.replace(os.path.join(stage, part), os.path.join(feed, "b1.parquet"))
    shutil.rmtree(stage)

    out = _run(
        capsys, "ingest", "--table", t.path, "--feed", feed, "--checkpoint", ckpt,
        "--stream-id", "cli",
    )
    assert out["snapshots_committed"] == 1
    assert out["last_stream_batch"] == 0
    assert t.scan().count() == 3200

    # second run, no new feed files: nothing committed
    out2 = _run(
        capsys, "ingest", "--table", t.path, "--feed", feed, "--checkpoint", ckpt,
        "--stream-id", "cli",
    )
    assert out2["snapshots_committed"] == 0
    assert out2["last_stream_batch"] == 0


def test_ingest_validate_and_digest_index_subcommands(spark, tmp_table_dir, capsys, tmp_path):
    import shutil

    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 3000), repartition_n=4)
    feed, ckpt = str(tmp_path / "feed"), str(tmp_path / "ckpt")
    os.makedirs(feed)
    stage = str(tmp_path / "stage")
    good = synthetic(spark, 3020).filter(F.col("doc_id") >= "doc-0000003000")
    bad = spark.createDataFrame(
        [("doc-bad-len", [1, 2, 3], 99, "src0")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    good.unionByName(bad).coalesce(1).write.parquet(stage)
    part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
    os.replace(os.path.join(stage, part), os.path.join(feed, "b1.parquet"))
    shutil.rmtree(stage)

    out = _run(
        capsys, "ingest", "--table", t.path, "--feed", feed, "--checkpoint", ckpt,
        "--dedupe", "content", "--content-index", "cs", "--validate",
    )
    assert out["quarantined"] == 1
    assert t.scan().count() == 3020

    # index exists (built during ingest at the pre-merge snapshot);
    # the subcommand refreshes it to head and reports the full size
    out2 = _run(capsys, "digest-index", "--table", t.path, "--name", "cs")
    assert out2["action"] == "refresh"
    assert out2["snapshot_id"] == t.log.current_id()
    assert out2["rows"] == 3020

    # a fresh name builds from scratch
    out3 = _run(capsys, "digest-index", "--table", t.path, "--name", "other")
    assert out3["action"] == "build"
    assert out3["rows"] == 3020

    # the incremental-view subcommand: build, then idempotent refresh
    v1 = _run(capsys, "view", "--table", t.path)
    assert v1["action"] == "build" and v1["rows"] == 3020
    assert v1["snapshot_id"] == t.log.current_id()
    v2 = _run(capsys, "view", "--table", t.path)
    assert v2["action"] == "refresh" and v2["rows"] == 3020


def test_corpus_subcommand_end_to_end(spark, capsys, tmp_path):
    from tests.conftest import SF_DIR

    out_dir = str(tmp_path / "corpus_out")
    out = _run(
        capsys, "corpus", "--input", SF_DIR, "--out", out_dir,
        "--seq-len", "64", "--n-shards", "1", "--job-id", "cli-corpus",
    )
    s = out["stages"]
    assert s["input"] >= s["quality"] >= s["exact_dedup"] >= s["near_dedup"]
    assert s["packed_sequences"] > 0 and out["rows"] == s["packed_sequences"]
    got = spark.read.parquet(out_dir)
    assert got.count() == s["packed_sequences"]
    assert got.select(F.min(F.size("tokens")), F.max(F.size("tokens"))).collect()[0] == (64, 64)


def test_corpus_subcommand_budget_parsing(spark, capsys, tmp_path):
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        maintenance_job.main(
            ["corpus", "--input", "x", "--out", str(tmp_path / "o"), "--budget", "nonsense"]
        )


def test_delete_and_changes_subcommands(spark, tmp_table_dir, capsys, tmp_path):
    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 3000), repartition_n=4)
    from_id = t.log.current_id()
    pre = t.scan().count()

    out = _run(
        capsys, "delete", "--table", t.path,
        "--where", "cast(substr(doc_id, 5) as long) % 11 = 0",
        "--job-id", "cli-del",
    )
    assert out["snapshot"] is not None
    assert out["matched_rows"] > 0
    assert t.scan().count() == pre - out["matched_rows"]

    ch_out = str(tmp_path / "changes")
    out2 = _run(
        capsys, "changes", "--table", t.path,
        "--from-snapshot", str(from_id), "--out", ch_out,
    )
    assert out2["changes"] == {"delete": out["matched_rows"]}
    assert out2["rows"] == out["matched_rows"]
    got = spark.read.parquet(ch_out)
    assert got.count() == out["matched_rows"]
    assert got.select("_change").distinct().collect()[0][0] == "delete"

    # no-match delete: no snapshot committed
    head = t.log.current_id()
    out3 = _run(capsys, "delete", "--table", t.path, "--where", "doc_id = 'nope'")
    assert out3["snapshot"] is None and out3["matched_rows"] == 0
    assert t.log.current_id() == head


def test_update_and_rollback_subcommands(spark, tmp_table_dir, capsys):
    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 3000), repartition_n=4)
    base_id = t.log.current_id()
    pre = {r["doc_id"]: r["n_tok"] for r in t.scan().select("doc_id", "n_tok").collect()}

    out = _run(
        capsys, "update", "--table", t.path,
        "--where", "cast(substr(doc_id, 5) as long) % 13 = 2",
        "--set", "tokens=slice(tokens, 1, 4)",
        "--job-id", "cli-upd",
    )
    assert out["snapshot"] is not None and out["matched_rows"] > 0
    assert out["set"] == ["n_tok", "tokens"]  # auto-recount rides along
    post = {r["doc_id"]: r["n_tok"] for r in t.scan().select("doc_id", "n_tok").collect()}
    changed = {d for d in pre if post[d] != pre[d]}
    assert len({d for d in pre if int(d[4:]) % 13 == 2 and pre[d] > 4} - changed) == 0
    assert all(post[d] == 4 for d in changed)

    rb = _run(capsys, "rollback", "--table", t.path, "--snapshot", str(base_id))
    assert rb["restored_snapshot_id"] == base_id
    assert rb["rows"] == len(pre)
    back = {r["doc_id"]: r["n_tok"] for r in t.scan().select("doc_id", "n_tok").collect()}
    assert back == pre

    # bad arg shapes fail fast
    import pytest
    with pytest.raises(SystemExit):
        _run(capsys, "update", "--table", t.path, "--where", "true", "--set", "nonsense")
    with pytest.raises(SystemExit):
        _run(capsys, "rollback", "--table", t.path)


def test_wap_cli_stage_audit_publish_discard(spark, tmp_table_dir, capsys, tmp_path):
    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 2000), repartition_n=4)
    head = t.log.current_id()

    clean = synthetic(spark, 120).withColumn(
        "doc_id", F.concat(F.lit("cli-"), F.col("doc_id"))
    )
    feed = str(tmp_path / "feed")
    clean.write.parquet(feed)
    out = _run(capsys, "wap", "stage", "--table", t.path, "--input", feed, "--ref", "cliref")
    assert out["ref"] == "cliref" and out["rows"] == 120 and out["base_snapshot"] == head
    assert t.log.current_id() == head  # staging claimed no version slot

    listed = _run(capsys, "wap", "list", "--table", t.path)
    assert listed["staged"]["cliref"]["rows"] == 120

    audit = _run(capsys, "wap", "audit", "--table", t.path, "--ref", "cliref")
    assert audit == {"ref": "cliref", "ok_rows": 120, "bad_rows": 0, "by_class": {}}

    pub = _run(capsys, "wap", "publish", "--table", t.path, "--ref", "cliref")
    assert pub["snapshot"] == head + 1 and pub["rows"] == 2120
    assert t.scan().filter(F.col("doc_id").startswith("cli-")).count() == 120
    assert _run(capsys, "wap", "list", "--table", t.path)["staged"] == {}

    # a dirty batch: publish refuses, audit classifies, discard orphans
    dirty = (
        synthetic(spark, 40)
        .withColumn("doc_id", F.concat(F.lit("bad-"), F.col("doc_id")))
        .withColumn("n_tok", F.col("n_tok") + 1)
    )
    feed2 = str(tmp_path / "feed2")
    dirty.write.parquet(feed2)
    _run(capsys, "wap", "stage", "--table", t.path, "--input", feed2, "--ref", "dirty")
    audit2 = _run(capsys, "wap", "audit", "--table", t.path, "--ref", "dirty")
    assert audit2["bad_rows"] == 40 and audit2["by_class"] == {"length_mismatch": 40}
    import pytest
    with pytest.raises(SystemExit):
        _run(capsys, "wap", "publish", "--table", t.path, "--ref", "dirty")
    dropped = _run(capsys, "wap", "discard", "--table", t.path, "--ref", "dirty")
    assert dropped["discarded"] == "dirty" and dropped["orphaned_files"] > 0
    assert t.scan().filter(F.col("doc_id").startswith("bad-")).count() == 0
    with pytest.raises(SystemExit):
        _run(capsys, "wap", "stage", "--table", t.path)  # --input required
    with pytest.raises(SystemExit):
        _run(capsys, "wap", "publish", "--table", t.path)  # --ref required
