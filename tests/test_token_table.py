"""Token-table determinism: the Spark derivation and the DuckDB SQL
derivation must agree value-for-value — this is what lets the driver's
oracle verify post-maintenance scans."""

import duckdb
from pyspark.sql import functions as F

from hoopstat_haus_spark.tables import documents_token_sql, from_documents, synthetic, token_sig

SF = "/root/testdata/sf0.001"


def test_from_documents_matches_duckdb_oracle(spark):
    df = from_documents(spark, SF).select(
        "doc_id", token_sig(F.col("tokens")).alias("sig"), "n_tok", "source"
    )
    got = sorted(tuple(r) for r in df.collect())

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"SELECT doc_id, md5(array_to_string(tokens, ',')) AS sig, n_tok, source "
            f"FROM {documents_token_sql()} t"
        ).fetchall()
    )
    assert got == want and len(got) == 500


def test_synthetic_is_deterministic_and_skewed(spark):
    a = synthetic(spark, 5000).select("doc_id", token_sig(F.col("tokens")).alias("sig")).collect()
    b = synthetic(spark, 5000).select("doc_id", token_sig(F.col("tokens")).alias("sig")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    dist = dict(
        synthetic(spark, 5000).groupBy("source").count().collect()
    )
    assert dist["web"] > 0.45 * 5000  # hot partition
    assert set(dist) == {"web", "books", "code", "wiki", "forums"}


def test_schema_matches_north_rule(spark):
    df = synthetic(spark, 10)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("doc_id", "string"),
        ("tokens", "array<int>"),
        ("n_tok", "int"),
        ("source", "string"),
    ]
    row = df.filter("doc_id = 'doc-0000000003'").collect()[0]
    assert row["n_tok"] == len(row["tokens"])
    assert all(0 <= t < 50257 for t in row["tokens"])


def test_large_doc_numbers_never_overflow(spark):
    # 100 TB-scale id domain: doc numbers past ~3.47e9 used to overflow
    # int64 in the bare d*_MULT forms (ANSI mode throws). The reduced
    # forms must match Python-bignum truth for ids across the boundary.
    from hoopstat_haus_spark.tables.packing import _SHARD_PRIME, shard_expr
    from hoopstat_haus_spark.tables.token_table import _MULT, _STEP, _VOCAB, tokenize_documents

    nums = [3_474_169_299, 3_474_169_300, 4_000_000_000, 9_999_999_999]
    docs = spark.createDataFrame(
        [(n, 40, "web") for n in nums], "doc_id long, n_chars int, source string"
    )
    rows = {r.doc_id: r for r in tokenize_documents(docs).collect()}
    sharded = dict(
        spark.createDataFrame([(f"doc-{n:08d}",) for n in nums], "doc_id string")
        .select("doc_id", shard_expr(64).alias("shard"))
        .collect()
    )
    for n in nums:
        did = f"doc-{n:08d}"
        want_tokens = [(n * _MULT + i * _STEP) % _VOCAB for i in range(10)]
        assert list(rows[did].tokens) == want_tokens, did
        assert sharded[did] == ((n * _MULT) % _SHARD_PRIME) % 64, did
