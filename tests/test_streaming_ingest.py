"""Structured Streaming ingest: exactly-once merges, checkpointed
incremental file discovery, in-batch + against-corpus dedupe."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from hoopstat_haus_spark.lakehouse import TokenLakeTable
from hoopstat_haus_spark.streaming.ingest import (
    dedupe_batch,
    last_committed_batch,
    make_batch_processor,
    stream_ingest,
)
from hoopstat_haus_spark.tables import synthetic, token_sig


def _sigs(t):
    return sorted(
        tuple(r)
        for r in t.scan().select("doc_id", token_sig("tokens").alias("s")).collect()
    )


def _drop_feed_file(df, feed, name):
    """File-stream sources don't walk non-partition subdirs: land the
    batch as a single flat parquet file in the feed root."""
    tmp = os.path.join(feed, f"_stage_{name}")
    df.coalesce(1).write.parquet(tmp)
    part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
    os.replace(os.path.join(tmp, part), os.path.join(feed, f"{name}.parquet"))
    shutil.rmtree(tmp)


@pytest.fixture()
def env(spark, tmp_path):
    base = str(tmp_path)
    t = TokenLakeTable.create(
        spark, os.path.join(base, "table"), synthetic(spark, 3000), repartition_n=4
    )
    feed = os.path.join(base, "feed")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(feed)
    yield spark, t, feed, ckpt
    shutil.rmtree(base, ignore_errors=True)


def test_stream_ingest_exactly_once_and_incremental(env):
    spark, t, feed, ckpt = env
    # batch 1: 100 new docs + 50 overlapping the corpus (same key)
    _drop_feed_file(
        synthetic(spark, 3100).filter(F.col("doc_id") >= "doc-0000002950"), feed, "b1"
    )
    stream_ingest(spark, t, feed, ckpt, stream_id="s1")

    expected = sorted(
        tuple(r)
        for r in synthetic(spark, 3100).select("doc_id", token_sig("tokens").alias("s")).collect()
    )
    assert _sigs(t) == expected
    after_b1 = t.log.current_id()
    assert last_committed_batch(t, "s1") == 0

    # re-run with NO new files: checkpoint sees nothing, no new snapshot
    stream_ingest(spark, t, feed, ckpt, stream_id="s1")
    assert t.log.current_id() == after_b1

    # batch 2: only new docs; re-run picks up just the new file
    _drop_feed_file(
        synthetic(spark, 3200).filter(F.col("doc_id") >= "doc-0000003100"), feed, "b2"
    )
    stream_ingest(spark, t, feed, ckpt, stream_id="s1")
    assert t.scan().count() == 3200
    assert last_committed_batch(t, "s1") >= 1


def test_replayed_batch_is_skipped(env):
    spark, t, feed, ckpt = env
    proc = make_batch_processor(t, "s1")
    fresh = synthetic(spark, 3050).filter(F.col("doc_id") >= "doc-0000003000")
    proc(fresh, 7)
    sid = t.log.current_id()
    assert t.scan().count() == 3050
    # replay of the SAME batch id (post-failure re-delivery): no commit
    proc(fresh, 7)
    # and an older id than the high-water mark is skipped too
    proc(fresh, 3)
    assert t.log.current_id() == sid
    # a NEW id with an all-duplicate payload commits nothing either
    proc(fresh, 8)
    assert t.log.current_id() == sid


def test_in_batch_dedupe_is_deterministic(spark):
    base = synthetic(spark, 10)
    # conflicting duplicate: same (doc_id, source), larger n_tok wins
    bigger = base.limit(1).withColumn("n_tok", F.col("n_tok") + 1000)
    out = dedupe_batch(base.unionByName(bigger))
    assert out.count() == 10
    assert out.filter(F.col("n_tok") > 1000).count() == 1


def test_content_dedupe_drops_rekeyed_copies(env):
    spark, t, feed, ckpt = env
    # same token payload as an existing doc, new key: content mode drops it
    copy = (
        t.scan()
        .limit(1)
        .withColumn("doc_id", F.lit("doc-9999999999"))
        .select("doc_id", "tokens", "n_tok", "source")
    )
    new = synthetic(spark, 3010).filter(F.col("doc_id") >= "doc-0000003000")
    proc = make_batch_processor(t, "s2", dedupe="content")
    proc(new.unionByName(copy), 0)
    assert t.scan().count() == 3010
    assert t.scan().filter(F.col("doc_id") == "doc-9999999999").count() == 0


def _bad_rows(spark):
    """One reject per error class, incl. a NULL-key row (the case a plain
    equi-anti-join can never dedupe on replay)."""
    return spark.createDataFrame(
        [
            ("doc-bad-len", [1, 2, 3], 99, "src0"),  # length_mismatch
            ("doc-bad-vocab", [1, -5], 2, "src0"),  # token_out_of_vocab
            (None, [7, 8], 2, "src0"),  # null_key
        ],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )


def test_validated_ingest_quarantines_bad_rows(env):
    from hoopstat_haus_spark.lakehouse.quarantine import read_quarantine

    spark, t, feed, ckpt = env
    good = synthetic(spark, 3020).filter(F.col("doc_id") >= "doc-0000003000")
    proc = make_batch_processor(t, "sv", validate=True)
    proc(good.unionByName(_bad_rows(spark)), 0)
    # bad rows never reach the corpus; good rows all merge
    assert t.scan().count() == 3020
    assert t.scan().filter(F.col("doc_id").startswith("doc-bad")).count() == 0
    q = read_quarantine(t)
    assert q.count() == 3
    assert sorted(r["_error_class"] for r in q.collect()) == [
        "length_mismatch",
        "null_key",
        "token_out_of_vocab",
    ]


def test_validated_ingest_replay_does_not_duplicate_quarantine(env, monkeypatch):
    """Crash between the sidecar write and the merge commit: the replayed
    batch must not re-append its rejects (null-key rows included — the
    anti-join is null-safe and content-keyed)."""
    import hoopstat_haus_spark.streaming.ingest as ing
    from hoopstat_haus_spark.lakehouse.quarantine import read_quarantine

    spark, t, feed, ckpt = env
    good = synthetic(spark, 3010).filter(F.col("doc_id") >= "doc-0000003000")
    batch = good.unionByName(_bad_rows(spark))

    real_merge = ing.merge_into

    def boom(*a, **k):
        raise RuntimeError("crash after quarantine, before commit")

    monkeypatch.setattr(ing, "merge_into", boom)
    proc = make_batch_processor(t, "sv", validate=True)
    with pytest.raises(RuntimeError):
        proc(batch, 0)
    assert read_quarantine(t).count() == 3  # sidecar written pre-crash

    monkeypatch.setattr(ing, "merge_into", real_merge)
    proc(batch, 0)  # stream replays the SAME batch id
    assert t.scan().count() == 3010
    assert read_quarantine(t).count() == 3  # no duplicate rejects


def test_anti_corpus_never_shuffles_the_corpus(env):
    # the dedupe check must not sort-merge-shuffle the corpus per
    # micro-batch: both modes run as two broadcast joins (batch keys
    # broadcast into a semi-join; its <= |batch| result broadcasts into
    # the anti-join). Spark can only build the RIGHT side of a LEFT ANTI
    # hash join, so a direct batch-anti-corpus join would shuffle.
    from hoopstat_haus_spark.streaming.ingest import _anti_corpus
    from tests.test_plans import plan_of

    spark, t, feed, ckpt = env
    batch = synthetic(spark, 3010).filter(F.col("doc_id") >= "doc-0000003000")
    for mode in ("key", "content"):
        plan = plan_of(_anti_corpus(batch, t, mode))
        assert "SortMergeJoin" not in plan, mode
        assert plan.count("BroadcastHashJoin") >= 2, mode


def test_lost_checkpoint_does_not_drop_new_files(env):
    """A fresh checkpoint renumbers batches from 0; with the high-water
    skip keyed on batch id alone, never-ingested files landing in
    batches 0..k <= the old mark were silently skipped. The query-id
    stamp scopes the skip to one batch numbering."""
    spark, t, feed, ckpt = env
    _drop_feed_file(
        synthetic(spark, 3100).filter(F.col("doc_id") >= "doc-0000003000"), feed, "b1"
    )
    stream_ingest(spark, t, feed, ckpt, stream_id="s1")
    assert t.scan().count() == 3100
    from hoopstat_haus_spark.streaming.ingest import last_committed_stamp

    qid1, bid1 = last_committed_stamp(t, "s1")
    assert qid1 is not None and bid1 == 0  # stamp carries the query id

    # checkpoint lost: new dir, new file — renumbered batch 0 must merge
    shutil.rmtree(ckpt)
    _drop_feed_file(
        synthetic(spark, 3200).filter(F.col("doc_id") >= "doc-0000003100"), feed, "b2"
    )
    stream_ingest(spark, t, feed, ckpt + "2", stream_id="s1")
    assert t.scan().count() == 3200  # pre-fix: stuck at 3100, silent loss
    qid2, _ = last_committed_stamp(t, "s1")
    assert qid2 is not None and qid2 != qid1

    # and a same-checkpoint re-run still skips (no extra snapshot)
    head = t.log.current_id()
    stream_ingest(spark, t, feed, ckpt + "2", stream_id="s1")
    assert t.log.current_id() == head


def test_feed_op_delete_rows_reach_merge(env):
    """_op='delete' tombstones must survive the schema projection AND
    bypass the corpus anti-join (their keys exist by definition — key
    dedupe would swallow every delete)."""
    spark, t, feed, ckpt = env
    victims = [r["doc_id"] for r in t.scan().select("doc_id").limit(3).collect()]
    adds = synthetic(spark, 3050).filter(F.col("doc_id") >= "doc-0000003000")
    dels = (
        t.scan()
        .filter(F.col("doc_id").isin(victims))
        .select("doc_id", "tokens", "n_tok", "source")
        .withColumn("_op", F.lit("delete"))
    )
    batch = adds.withColumn("_op", F.lit("upsert")).unionByName(dels)
    proc = make_batch_processor(t, "sdel", dedupe="key")
    proc(batch, 0)
    assert t.scan().filter(F.col("doc_id").isin(victims)).count() == 0
    assert t.scan().count() == 3000 - 3 + 50


def test_same_key_upsert_and_delete_in_one_batch(env):
    """A key in both channels of one micro-batch must resolve to the
    tombstone instead of reaching merge as a duplicate key (which would
    crash — and foreachBatch would replay the crash forever)."""
    spark, t, feed, ckpt = env
    victim = t.scan().select("doc_id", "tokens", "n_tok", "source").first()
    up = spark.createDataFrame([victim], t.scan().schema).withColumn("_op", F.lit("upsert"))
    down = spark.createDataFrame([victim], t.scan().schema).withColumn("_op", F.lit("delete"))
    proc = make_batch_processor(t, "sboth", dedupe=None)
    proc(up.unionByName(down), 0)
    assert t.scan().filter(F.col("doc_id") == victim["doc_id"]).count() == 0


def test_null_key_in_both_channels_does_not_wedge(env, spark):
    """Null-key rows in both channels equi-miss a plain anti-join (null
    != null) and reach merge as duplicates — the null-safe delete-wins
    join must swallow the upsert side."""
    _, t, _, _ = env
    row = t.scan().select("doc_id", "tokens", "n_tok", "source").first()
    nulled = spark.createDataFrame([row], t.scan().schema).withColumn(
        "doc_id", F.lit(None).cast("string")
    )
    both = nulled.withColumn("_op", F.lit("upsert")).unionByName(
        nulled.withColumn("_op", F.lit("delete"))
    )
    pre = t.scan().count()
    make_batch_processor(t, "snull", dedupe=None)(both, 0)  # must not raise
    assert t.scan().count() == pre  # null tombstone matches nothing
