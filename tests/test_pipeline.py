"""End-to-end training-corpus pipeline: stage semantics against a
brute-force Python oracle on the sf0.001 corpus, token closed-form
parity, and determinism."""

import duckdb
import pytest
from pyspark.sql import functions as F

from hoopstat_haus_spark.pipeline import build_training_corpus
from hoopstat_haus_spark.tables import from_documents, token_sig
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def corpus_texts():
    con = duckdb.connect()
    return dict(
        con.execute(f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id").fetchall()
    )


def test_pipeline_stages_and_token_parity(spark, corpus_texts):
    ids = sorted(corpus_texts)
    bench = spark.createDataFrame(
        [("b1", corpus_texts[ids[2]])], "bench_id string, text string"
    )
    tokens, rep = build_training_corpus(spark, SF_DIR, benchmark=bench)
    s = rep.stages

    # monotone survivors, every stage recorded, nothing vacuous
    assert s["input"] == len(ids)
    assert (
        s["input"] >= s["quality"] >= s["exact_dedup"] >= s["near_dedup"] >= s["decontaminated"]
    )
    assert s["quality"] > 0
    assert s["tokenized"] == s["decontaminated"]

    out = tokens.collect()
    assert len(out) == s["decontaminated"]
    surviving = {r.doc_id for r in out}
    assert len(surviving) == len(out)  # unique doc_ids

    # the leaked benchmark doc is gone (doc_id in documents is numeric;
    # tokens carry the doc-%08d form)
    assert f"doc-{ids[2]:08d}" not in surviving

    # token closed-form parity: output rows == from_documents restricted
    # to the surviving ids
    full = {
        r.doc_id: r.s
        for r in from_documents(spark, SF_DIR)
        .select("doc_id", token_sig("tokens").alias("s"))
        .collect()
    }
    got = {r.doc_id: None for r in out}
    sig = {
        r.doc_id: r.s
        for r in tokens.select("doc_id", token_sig("tokens").alias("s")).collect()
    }
    assert all(sig[d] == full[d] for d in got)


def test_pipeline_exact_dedup_matches_bruteforce(spark, corpus_texts):
    import re

    tokens, rep = build_training_corpus(spark, SF_DIR)
    # brute-force: of the quality survivors, exact dedup keeps min doc_id
    # per normalized digest — check the DELTA between the two stages
    norm = {d: re.sub(r"\s+", " ", t.lower()) for d, t in corpus_texts.items()}
    groups = {}
    for d in sorted(norm):
        groups.setdefault(norm[d], []).append(d)
    n_extra_copies = sum(len(v) - 1 for v in groups.values())
    removed = rep.stages["quality"] - rep.stages["exact_dedup"]
    # every removed doc is a genuine extra copy (quality filtering may
    # have already dropped some copies, so <=)
    assert 0 <= removed <= n_extra_copies


def test_pipeline_mix_and_pack_stages(spark):
    from hoopstat_haus_spark.tables.mixing import source_token_totals

    # plan budgets over the CLEANED corpus: run once without mixing to
    # learn totals, then the full chain with mix + pack
    tokens, _ = build_training_corpus(spark, SF_DIR)
    totals = {r.source: r.total_tokens for r in source_token_totals(tokens).collect()}
    budgets = {s: int(t * 0.6) for s, t in totals.items()}
    seqs, rep = build_training_corpus(
        spark, SF_DIR, budgets=budgets, seq_len=64, n_shards=4, shuffle_out_shards=3
    )
    assert rep.stages["mixed"] <= rep.stages["tokenized"]
    assert rep.stages["mixed"] > 0
    assert rep.stages["packed_sequences"] > 0
    # training-order shuffle is a permutation: same count, keyed output
    assert rep.stages["shuffled"] == rep.stages["packed_sequences"]
    assert "_out_shard" in seqs.columns
    with pytest.raises(ValueError):
        build_training_corpus(spark, SF_DIR, shuffle_out_shards=3)  # needs seq_len
    rows = seqs.collect()
    assert len(rows) == rep.stages["packed_sequences"]
    assert all(len(r.tokens) == 64 for r in rows)
    # packed output ≈ 0.6 of the cleaned corpus tokens (sampling noise
    # + per-shard tails; wide band, non-vacuity is the point)
    target = 0.6 * sum(totals.values())
    packed = 64 * len(rows)
    assert 0.75 * target <= packed + 4 * 5 * 64 and packed <= 1.25 * target


def test_pipeline_lake_dedup_stage(spark, tmp_path):
    """dedupe_against drops exactly the docs whose TOKEN content the
    lake already holds — content-keyed (the lake copies are REKEYED, so
    a doc_id join could never find them), everything else untouched."""
    from hoopstat_haus_spark.lakehouse import TokenLakeTable

    num = F.expr("cast(substr(doc_id, 5) as long)")
    lake_rows = (
        from_documents(spark, SF_DIR)
        .filter(num % 2 == 0)
        .withColumn("doc_id", F.concat(F.lit("lake-"), F.col("doc_id")))
    )
    t = TokenLakeTable.create(spark, str(tmp_path / "lake"), lake_rows, repartition_n=2)

    out, rep = build_training_corpus(spark, SF_DIR, dedupe_against=t)
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    assert kept and all(int(d[4:]) % 2 == 1 for d in kept)
    assert rep.stages["lake_dedup"] == len(kept)

    # only content-matching docs were dropped relative to a plain run
    base, _ = build_training_corpus(spark, SF_DIR)
    base_ids = {r.doc_id for r in base.select("doc_id").collect()}
    assert kept == {d for d in base_ids if int(d[4:]) % 2 == 1}


def test_pipeline_is_deterministic(spark):
    t1, r1 = build_training_corpus(spark, SF_DIR)
    t2, r2 = build_training_corpus(spark, SF_DIR)
    assert r1.stages == r2.stages
    a = sorted(tuple(r) for r in t1.select("doc_id", token_sig("tokens").alias("s")).collect())
    b = sorted(tuple(r) for r in t2.select("doc_id", token_sig("tokens").alias("s")).collect())
    assert a == b
