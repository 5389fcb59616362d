"""Persisted content-digest index (`lakehouse/digest_index.py`): parity
with a fresh full-scan digest after every maintenance op, O(changed
sources) pointer movement, rebuild fallback, and the indexed content-
dedupe path in streaming ingest."""

import os

import pytest
from pyspark.sql import functions as F

from hoopstat_haus_spark.lakehouse import CompactionPolicy, TokenLakeTable
from hoopstat_haus_spark.lakehouse.delete import delete_where
from hoopstat_haus_spark.lakehouse.digest_index import DigestIndex
from hoopstat_haus_spark.lakehouse.merge import merge_into
from hoopstat_haus_spark.streaming.ingest import _anti_corpus, make_batch_processor
from hoopstat_haus_spark.tables import synthetic, token_sig

MB = 1024 * 1024
POLICY = CompactionPolicy(min_file_bytes=1 * MB, target_file_bytes=4 * MB, max_file_bytes=8 * MB)
NUM = "cast(substr(doc_id, 5) as long)"


def truth(t):
    return sorted(
        tuple(r)
        for r in t.scan()
        .select("doc_id", "source", token_sig(F.col("tokens")).alias("sig"))
        .collect()
    )


def indexed(ix):
    return sorted(tuple(r) for r in ix.to_df().collect())


@pytest.fixture()
def table(spark, tmp_path):
    return TokenLakeTable.create(
        spark, str(tmp_path / "t"), synthetic(spark, 4000), repartition_n=4
    )


def test_digest_index_lifecycle(table, spark):
    ix = DigestIndex(table)
    st = ix.refresh()
    assert st["snapshot_id"] == table.log.current_id()
    assert indexed(ix) == truth(table)

    # nothing changed → same pointers, no new dirs
    parts0 = dict(st["parts"])
    assert ix.refresh()["parts"] == parts0

    # merge touching ONE source: only that source's pointer moves
    one_src = table.scan().select("source").first()["source"]
    upd = (
        synthetic(spark, 4000)
        .filter((F.col("source") == one_src) & (F.expr(NUM) % 97 == 3))
        .withColumn("tokens", F.expr("transform(tokens, x -> cast(x + 1 as int))"))
    )
    assert upd.count() > 0
    merge_into(table, upd)
    st = ix.refresh()
    assert indexed(ix) == truth(table)
    assert st["parts"][one_src] != parts0[one_src]
    for s, p in parts0.items():
        if s != one_src:
            assert st["parts"][s] == p, "untouched source was rewritten"

    # cross-source delete: parity again
    parts1 = dict(st["parts"])
    delete_where(table, f"{NUM} % 101 = 5")
    st = ix.refresh()
    assert indexed(ix) == truth(table)
    assert st["parts"] != parts1

    # compaction is a pure physical rewrite: net feed is empty, so the
    # index pointers must not move AT ALL
    parts2 = dict(st["parts"])
    table.compact(POLICY)
    st = ix.refresh()
    assert st["parts"] == parts2
    assert st["snapshot_id"] == table.log.current_id()
    assert indexed(ix) == truth(table)

    # expired/unknown base snapshot → full rebuild fallback
    ix._write_state(999999, parts2)
    st = ix.refresh()
    assert st["snapshot_id"] == table.log.current_id()
    assert indexed(ix) == truth(table)

    # orphan sweep is min-age-guarded (racing refreshers / readers of
    # the previous state): young orphans survive, aged ones go
    live_tops = {rel.split(os.sep, 1)[0] for rel in st["parts"].values()}
    on_disk = {d for d in os.listdir(ix.root) if os.path.isdir(os.path.join(ix.root, d))}
    assert live_tops <= on_disk  # nothing referenced was ever deleted
    for d in on_disk:
        os.utime(os.path.join(ix.root, d), (1, 1))  # age everything
    ix._sweep_orphans(st["parts"])
    on_disk = {d for d in os.listdir(ix.root) if os.path.isdir(os.path.join(ix.root, d))}
    assert on_disk == live_tops


def test_write_plan_scales_with_rows(table):
    """Sizing by source count alone would funnel a huge source into one
    task/file; the plan grows task count AND per-source salt fan-out
    with manifest row counts (metadata only, no scan)."""
    ix = DigestIndex(table, "sz")
    head = table.log.current_id()
    assert ix._plan_write(None, head) == (5, 1)  # one per source at tiny scale
    one = table.partitions().collect()[0]["partition"]
    assert ix._plan_write([one], head)[0] == 1
    ix.ROWS_PER_TASK = 500
    n_tasks, spread = ix._plan_write(None, head)
    assert n_tasks == 8  # ceil(4000 / 500)
    assert spread >= 2  # the biggest source splits across tasks


def test_index_name_cannot_escape_its_directory(table):
    """'.'/'..' pass a bare charset check; with the sweep rmtree-ing
    inside root, an escaped name would let it destroy the table."""
    for bad in ("..", ".", ".hidden", "-x", "", "a..b"):
        with pytest.raises(ValueError):
            DigestIndex(table, bad)
    DigestIndex(table, "ok-1.2_x")  # normal names still fine


def test_indexed_content_dedupe_in_streaming_ingest(table, spark):
    proc = make_batch_processor(table, "s-ix", dedupe="content", content_index="cs")

    # batch 0: rekeyed copy of an EXISTING doc + genuinely new docs
    copy = (
        table.scan()
        .limit(1)
        .withColumn("doc_id", F.lit("doc-9999999998"))
        .select("doc_id", "tokens", "n_tok", "source")
    )
    new1 = synthetic(spark, 4010).filter(F.expr(NUM) >= 4000)
    proc(new1.unionByName(copy), 0)
    assert table.scan().count() == 4010
    assert table.scan().filter(F.col("doc_id") == "doc-9999999998").count() == 0

    # batch 1: rekeyed copy of a doc MERGED IN BATCH 0 — proves the
    # index advanced via the change feed, not a rebuild assumption
    copy2 = (
        synthetic(spark, 4010)
        .filter(F.expr(NUM) == 4005)
        .withColumn("doc_id", F.lit("doc-9999999997"))
        .select("doc_id", "tokens", "n_tok", "source")
    )
    new2 = synthetic(spark, 4020).filter(F.expr(NUM) >= 4010)
    proc(new2.unionByName(copy2), 1)
    assert table.scan().count() == 4020
    assert table.scan().filter(F.col("doc_id") == "doc-9999999997").count() == 0

    # the indexed anti-join stays two broadcast joins, and the corpus
    # side reads ONLY the persisted sig column — no token payload scan
    from tests.test_plans import plan_of

    ix = DigestIndex(table, "cs")
    ix.refresh()
    batch = synthetic(spark, 4030).filter(F.expr(NUM) >= 4020)
    plan = plan_of(_anti_corpus(batch, table, "content", index=ix))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "struct<sig:string>" in plan
