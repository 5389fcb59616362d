"""Gopher-style repetition/quality metrics (text/analysis.py).

Value-level pins on hand-built strings — the oracle parity test proves
cross-engine identity, this proves the numbers mean what the docstrings
claim — plus non-vacuousness of `gopher_pass` on the synthetic corpus
(both outcomes must occur, else the flag is a rubber stamp)."""

from pyspark.sql import functions as F

from hoopstat_haus_spark.text import analysis as ta
from tests.conftest import SF_DIR


def _metrics(spark, text):
    row = (
        spark.createDataFrame([(text,)], "text string")
        .select(
            ta.distinct_word_ratio(F.col("text")).alias("dwr"),
            ta.dup_bigram_frac(F.col("text")).alias("dbf"),
            ta.mean_word_len(F.col("text")).alias("mwl"),
        )
        .first()
    )
    return row.dwr, row.dbf, row.mwl


def test_repeated_boilerplate_scores_low(spark):
    dwr, dbf, _ = _metrics(spark, "buy now " * 15)
    assert dwr == round(2 / 30, 6)
    # 29 bigrams, 2 distinct ("buy now", "now buy")
    assert dbf == round(1 - 2 / 29, 6)


def test_alternating_pair_bigram_math(spark):
    # words [a,b]*3 -> 5 bigrams, 2 distinct -> 1 - 2/5
    dwr, dbf, mwl = _metrics(spark, "ab cd ab cd ab cd")
    assert dbf == 0.6
    assert dwr == round(2 / 6, 6)
    assert mwl == 2.0


def test_degenerate_texts(spark):
    assert _metrics(spark, "") == (0.0, 0.0, 0.0)
    assert _metrics(spark, "   ") == (0.0, 0.0, 0.0)
    dwr, dbf, mwl = _metrics(spark, "lonely")
    assert (dwr, dbf, mwl) == (1.0, 0.0, 6.0)


def test_clean_prose_passes_gate(spark):
    clean = (
        "the quick brown fox jumps over a lazy dog while seven other "
        "animals watch from nearby hills and rivers flow gently past "
        "ancient stone bridges toward distant valleys"
    )
    dwr, dbf, mwl = _metrics(spark, clean)
    assert dwr >= ta.GOPHER_MIN_DISTINCT
    assert dbf <= ta.GOPHER_MAX_DUP_BIGRAM
    assert 2.0 <= mwl <= 12.0


def test_gopher_pass_splits_the_corpus(spark):
    rows = ta.doc_profile(spark, SF_DIR).groupBy("gopher_pass").count().collect()
    counts = {r.gopher_pass: r["count"] for r in rows}
    assert counts.get(1, 0) > 0 and counts.get(0, 0) > 0, counts
