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
