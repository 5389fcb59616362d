"""Benchmark decontamination vs a brute-force Python oracle on the
sf0.001 corpus: exact n-gram overlap semantics, threshold behavior, and
the cleaned-corpus anti-join."""

import duckdb
import pytest
from pyspark.sql import functions as F

from hoopstat_haus_spark.text.decontaminate import contamination_report, decontaminate
from tests.conftest import SF_DIR


def _py_shingles(text, k=3):
    words = text.strip().lower().split()
    if len(words) < k:
        return {" ".join(words)}
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


@pytest.fixture(scope="module")
def corpus_texts():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    return dict(rows)


def test_report_matches_bruteforce(spark, corpus_texts):
    ids = sorted(corpus_texts)
    # benchmark: verbatim leak, partial leak (first 8 words), clean text
    leak_full = corpus_texts[ids[3]]
    leak_part = " ".join(corpus_texts[ids[7]].split()[:8])
    bench_rows = [
        ("b1", leak_full),
        ("b2", leak_part),
        ("b3", "entirely novel benchmark prose with zero corpus vocabulary overlap"),
    ]
    bench = spark.createDataFrame(bench_rows, "bench_id string, text string")

    got = {
        r.doc_id: (r.n_hits, r.n_bench_docs)
        for r in contamination_report(spark, SF_DIR, bench, min_hits=2).collect()
    }

    bench_grams = {}
    for bid, text in bench_rows:
        for g in _py_shingles(text):
            bench_grams.setdefault(g, set()).add(bid)
    expect = {}
    for did, text in corpus_texts.items():
        hits = _py_shingles(text) & set(bench_grams)
        if len(hits) >= 2:
            expect[did] = (len(hits), len({b for g in hits for b in bench_grams[g]}))

    assert got == expect
    assert ids[3] in got and ids[7] in got  # both planted leaks flagged


def test_decontaminate_removes_exactly_the_flagged_docs(spark, corpus_texts):
    ids = sorted(corpus_texts)
    bench = spark.createDataFrame([("b1", corpus_texts[ids[0]])], "bench_id string, text string")
    flagged = {r.doc_id for r in contamination_report(spark, SF_DIR, bench, min_hits=2).collect()}
    clean_ids = {r.doc_id for r in decontaminate(spark, SF_DIR, bench, min_hits=2).collect()}
    assert clean_ids == set(ids) - flagged
    assert ids[0] not in clean_ids


def test_threshold_is_monotone(spark, corpus_texts):
    ids = sorted(corpus_texts)
    bench = spark.createDataFrame([("b1", corpus_texts[ids[5]])], "bench_id string, text string")
    loose = contamination_report(spark, SF_DIR, bench, min_hits=1).count()
    strict = contamination_report(spark, SF_DIR, bench, min_hits=25).count()
    assert loose >= strict >= 1  # the verbatim leak survives any sane threshold
