"""Token-distribution stats vs a DuckDB oracle over the same closed-form
token table (documents_token_sql) at sf0.001 — the registry is capped at
50 gates, so this carries the oracle-parity rigor locally."""

import duckdb
import pytest
from pyspark.sql import functions as F

from hoopstat_haus_spark.tables import from_documents
from hoopstat_haus_spark.tables.token_stats import top_tokens, token_frequencies, vocab_stats
from hoopstat_haus_spark.tables.token_table import documents_token_sql
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    con.execute(f"CREATE VIEW tok AS {documents_token_sql()}")
    return con


def test_top_tokens_matches_duckdb(spark, duck):
    got = [(r.rank, r.token, r.n) for r in top_tokens(from_documents(spark, SF_DIR), 25).collect()]
    want = duck.execute(
        """
        SELECT CAST(rank AS INT) AS rank, token, CAST(n AS BIGINT) AS n FROM (
          SELECT token, COUNT(*) AS n,
                 row_number() OVER (ORDER BY COUNT(*) DESC, token ASC) AS rank
          FROM (SELECT unnest(tokens) AS token FROM tok)
          GROUP BY token
        ) WHERE rank <= 25 ORDER BY rank
        """
    ).fetchall()
    assert got == [tuple(r) for r in want]


def test_vocab_stats_matches_duckdb(spark, duck):
    row = vocab_stats(from_documents(spark, SF_DIR)).collect()[0]
    want = duck.execute(
        """
        SELECT CAST(COUNT(*) AS BIGINT), CAST(SUM(n) AS BIGINT),
               CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT),
               ROUND(log2(SUM(n)) - SUM(n * log2(n)) / SUM(n) + 1e-9, 6),
               ROUND((log2(SUM(n)) - SUM(n * log2(n)) / SUM(n)) / log2(COUNT(*)) + 1e-9, 6)
        FROM (SELECT token, COUNT(*) AS n
              FROM (SELECT unnest(tokens) AS token FROM tok) GROUP BY token)
        """
    ).fetchone()
    assert (
        row.distinct_tokens,
        row.total_tokens,
        row.singleton_tokens,
        row.entropy_bits,
        row.entropy_ratio,
    ) == want
    assert row.n_docs == 500
    assert 0.0 < row.entropy_ratio <= 1.0


def test_frequencies_sum_to_total(spark):
    t = from_documents(spark, SF_DIR)
    total = t.select(F.sum(F.size("tokens"))).collect()[0][0]
    assert token_frequencies(t).select(F.sum("n")).collect()[0][0] == total


def test_top_tokens_is_heap_not_global_sort(spark):
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        top_tokens(from_documents(spark, SF_DIR), 10).explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()


def test_entropy_ratio_degenerate_single_token(spark):
    """A corpus whose every token is the same id: 0/0 under IEEE would
    yield NaN — the documented value is 0 (fully degenerate)."""
    df = spark.createDataFrame(
        [("d1", [7, 7, 7], 3, "s"), ("d2", [7, 7], 2, "s")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    row = vocab_stats(df).collect()[0]
    assert row.distinct_tokens == 1
    assert row.entropy_bits == 0.0
    assert row.entropy_ratio == 0.0  # not NaN
