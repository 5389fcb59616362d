"""Named snapshot refs (tags): reproducible-corpus pinning.

The contract: a tag pins a snapshot against expiry AND GC — a training
run that tagged its input corpus can re-read byte-identical data any
time later, no matter how much maintenance ran in between — and tag
creation is exclusive-create (two racing taggers cannot silently
overwrite each other).
"""

import pytest
from pyspark.sql import functions as F

from hoopstat_haus_spark.lakehouse import CompactionPolicy, TokenLakeTable
from hoopstat_haus_spark.tables import synthetic, token_sig

MB = 1024 * 1024
POLICY = CompactionPolicy(min_file_bytes=1 * MB, target_file_bytes=4 * MB, max_file_bytes=8 * MB)


def sigs(table, **kw):
    return sorted(
        tuple(r)
        for r in table.scan(**kw).select("doc_id", token_sig(F.col("tokens")).alias("s")).collect()
    )


def test_tag_pins_through_maintenance_expiry_and_gc(spark, tmp_table_dir):
    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 4000), repartition_n=6)
    t.tag("train-v1")
    tagged_id = t.log.resolve_tag("train-v1")
    pinned = sigs(t, tag="train-v1")

    # heavy churn after the tag: delete, compact, merge
    t.delete_where("cast(substr(doc_id, 5) as long) % 5 = 0")
    t.compact(POLICY)
    from hoopstat_haus_spark.lakehouse.merge import merge_into

    merge_into(t, synthetic(spark, 4010).filter("cast(substr(doc_id,5) as long) >= 4000"))

    # expiry keeps the tagged snapshot even with keep_last=1
    expired = t.expire_snapshots(keep_last=1)
    assert tagged_id not in expired
    assert tagged_id in t.log.list_ids()
    report = t.collect_garbage(min_age_s=0.0)

    # the tagged state is still byte-identical after expire + GC
    assert sigs(t, tag="train-v1") == pinned
    assert report["removed_data_files"] or True  # GC ran; reachability held

    # drop the tag → the snapshot becomes expirable
    t.drop_tag("train-v1")
    expired2 = t.expire_snapshots(keep_last=1)
    assert tagged_id in expired2
    t.collect_garbage(min_age_s=0.0)
    with pytest.raises(FileNotFoundError):
        t.log.get(tagged_id)


def test_tag_exclusive_create_and_replace(spark, tmp_table_dir):
    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 500), repartition_n=1)
    t.tag("gold")
    with pytest.raises(FileExistsError):
        t.tag("gold")
    t.append(synthetic(spark, 510).filter("cast(substr(doc_id,5) as long) >= 500"), repartition_n=1)
    t.tag("gold", replace=True)
    assert t.tags()["gold"] == t.log.current_id()

    with pytest.raises(KeyError):
        t.drop_tag("nope")
    with pytest.raises(KeyError):
        t.scan(tag="nope")
    with pytest.raises(ValueError):
        t.tag("bad/name")
    with pytest.raises(ValueError):
        t.scan(tag="gold", snapshot_id=1)
    with pytest.raises(ValueError):
        t.log.set_tag("dangling", snapshot_id=999)


def test_tag_cli(spark, tmp_table_dir, capsys):
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"))
    import maintenance_job

    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 500), repartition_n=1)

    def run(*argv):
        assert maintenance_job.main(list(argv)) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    out = run("tag", "--table", t.path, "--name", "rel-1")
    assert out["tagged"]["snapshot_id"] == t.log.current_id()
    assert run("tag", "--table", t.path)["tags"] == {"rel-1": t.log.current_id()}
    assert run("tag", "--table", t.path, "--name", "rel-1", "--drop")["tags"] == {}


def test_scan_as_of_timestamp(spark, tmp_table_dir):
    import time

    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 600), repartition_n=1)
    v1 = t.log.current()
    time.sleep(0.02)  # ms-resolution timestamps must differ
    t.append(synthetic(spark, 650).filter("cast(substr(doc_id,5) as long) >= 600"), repartition_n=1)
    v2 = t.log.current()
    assert v2.timestamp_ms > v1.timestamp_ms

    assert t.scan(as_of_ms=v1.timestamp_ms).count() == 600
    assert t.scan(as_of_ms=v2.timestamp_ms).count() == 650
    assert t.scan(as_of_ms=v2.timestamp_ms + 10_000).count() == 650
    with pytest.raises(ValueError):
        t.scan(as_of_ms=v1.timestamp_ms - 10_000)  # before the first commit
    with pytest.raises(ValueError):
        t.scan(as_of_ms=v1.timestamp_ms, tag="x")  # mutually exclusive


def test_publish_from_tag(spark, tmp_table_dir, tmp_path):
    import json
    import os

    from hoopstat_haus_spark.serving import publish_table_artifacts

    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 800), repartition_n=2)
    t.tag("train-v1")
    tagged_id = t.log.current_id()
    t.append(synthetic(spark, 900).filter("cast(substr(doc_id,5) as long) >= 800"), repartition_n=1)

    def by_source(df):
        return df.groupBy("source").agg(F.count(F.lit(1)).alias("n")).orderBy("source")

    root = str(tmp_path / "gold")
    index = publish_table_artifacts(t, root, {"by_source": by_source}, tag="train-v1")
    assert index["snapshot_id"] == tagged_id and index["tag"] == "train-v1"
    # pages resolve ONLY through the index (write-once pub dirs)
    uris = [a["resource_uri"] for a in index["artifacts"]]
    assert uris and all(u.startswith("by_source/") for u in uris)
    rows = []
    for u in uris:
        with open(os.path.join(root, u + ".json")) as f:
            rows += [json.loads(x) for x in f.read().strip().splitlines()]
    assert sum(r["n"] for r in rows) == 800  # tagged state, not head

    with pytest.raises(ValueError):
        publish_table_artifacts(t, root, {"x": by_source}, snapshot_id=1, tag="train-v1")


def test_expire_age_cutoff_widens_retention(spark, tmp_table_dir):
    """older_than_ms (Iceberg expire age): snapshots committed at or
    after the cutoff are NEVER expired, however small keep_last is."""
    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 400), repartition_n=1)
    for k in (2, 3, 5):
        t.update_where(f"cast(substr(doc_id,5) as long) % {k} = 0", {"n_tok": "n_tok"})
    ids = t.log.list_ids()
    assert len(ids) == 4
    cutoff = t.log.get(ids[1]).timestamp_ms  # v2 and newer are "recent"

    expired = t.expire_snapshots(keep_last=1, older_than_ms=cutoff)
    assert expired == [ids[0]]                      # only the pre-cutoff one
    assert t.log.list_ids() == ids[1:]              # everything recent kept

    # without the cutoff, keep_last=1 drops the rest (HEAD kept)
    expired2 = t.expire_snapshots(keep_last=1)
    assert expired2 == ids[1:3]
    assert t.log.list_ids() == [ids[3]]


def test_as_of_refuses_expired_gap(spark, tmp_table_dir):
    """A tag-protected old snapshot next to an expired middle: a
    timestamp inside the gap must ERROR, not silently return the
    years-older tagged state (the table's actual state then is gone)."""
    import time

    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 300), repartition_n=1)
    v1 = t.log.current()
    t.tag("rel-old")
    gap_ts = None
    for i in range(3):
        time.sleep(0.02)  # ms timestamps must differ across commits
        lo, hi = 300 + i * 50, 300 + (i + 1) * 50
        t.append(
            synthetic(spark, hi).filter(f"cast(substr(doc_id,5) as long) >= {lo}"),
            repartition_n=1,
        )
        if gap_ts is None:
            gap_ts = t.log.current().timestamp_ms  # v2's commit time
    t.expire_snapshots(keep_last=2)  # retains v1 (tagged), v3, v4
    assert t.log.list_ids() == [v1.snapshot_id, 3, 4]

    with pytest.raises(ValueError, match="expired"):
        t.scan(as_of_ms=gap_ts)  # v2's own time is no longer answerable
    assert t.scan(as_of_ms=t.log.get(3).timestamp_ms).count() == 400  # contiguous tail fine
    assert t.scan(tag="rel-old").count() == 300  # the tag remains the way in


def test_tag_drop_requires_name(spark, tmp_table_dir):
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs")
    )
    import maintenance_job

    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 300), repartition_n=1)
    t.tag("keepme")
    with pytest.raises(SystemExit):  # silently listing instead would leak the tag
        maintenance_job.main(["tag", "--table", t.path, "--drop"])
    assert t.tags() == {"keepme": t.log.current_id()}


def test_commit_timestamps_never_decrease(spark, tmp_table_dir, monkeypatch):
    """snapshot_as_of's monotone walk is an INVARIANT, not an assumption:
    a stepped-back wall clock clamps to the parent's timestamp."""
    import time as _time
    import types

    t = TokenLakeTable.create(spark, tmp_table_dir, synthetic(spark, 300), repartition_n=1)
    v1 = t.log.current()
    # scope the stepped-back clock to the snapshot log only (patching
    # the global time.time mid-Spark-job would break py4j timeouts)
    shim = types.SimpleNamespace(time=lambda: _time.time() - 3600)
    monkeypatch.setattr("hoopstat_haus_spark.lakehouse.snapshots.time", shim)
    t.update_where("cast(substr(doc_id,5) as long) % 3 = 0", {"n_tok": "n_tok"})
    v2 = t.log.current()
    assert v2.timestamp_ms >= v1.timestamp_ms
    monkeypatch.undo()
    assert t.log.snapshot_as_of(v2.timestamp_ms) == v2.snapshot_id
