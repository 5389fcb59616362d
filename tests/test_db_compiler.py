"""S9 static-database compile + M11 cross-format validation, S7
converter, Q5 schema compat."""

import sqlite3

import duckdb
from pyspark.sql import functions as F

from hoopstat_haus_spark.operators.common import load
from hoopstat_haus_spark.sources.db_compiler import (
    compile_databases,
    convert_json_to_parquet,
    validate_schema_compat,
)

SF = "/root/testdata/sf0.001"


def test_compile_both_formats_with_count_parity(spark, tmp_path):
    df = load(spark, SF, "customer")
    report = compile_databases(df, str(tmp_path), "customer")
    assert report["count_parity"] and report["rows"] == 150

    con = duckdb.connect(report["duckdb_path"])
    assert con.execute("SELECT COUNT(*) FROM customer WHERE c_acctbal > 0").fetchone()[0] > 0
    segs_duck = sorted(r[0] for r in con.execute("SELECT DISTINCT c_mktsegment FROM customer").fetchall())
    con.close()

    lite = sqlite3.connect(report["sqlite_path"])
    segs_lite = sorted(
        r[0] for r in lite.execute("SELECT DISTINCT c_mktsegment FROM customer").fetchall()
    )
    lite.close()
    assert segs_duck == segs_lite


def test_json_to_parquet_roundtrip(spark, tmp_path):
    events = load(spark, SF, "events").select("event_id", "event_type", "user_id")
    events.write.json(str(tmp_path / "j"))
    n = convert_json_to_parquet(spark, str(tmp_path / "j"), str(tmp_path / "p"))
    assert n == 1000
    back = spark.read.parquet(str(tmp_path / "p"))
    assert back.count() == 1000
    assert back.agg(F.sum("event_id")).collect()[0][0] == events.agg(F.sum("event_id")).collect()[0][0]


def test_schema_compat_validator(spark):
    a = load(spark, SF, "customer")
    assert validate_schema_compat(a, a) == []
    b = a.drop("c_acctbal").withColumn("c_name", F.col("c_name").cast("binary"))
    problems = validate_schema_compat(a, b)
    assert "missing column: c_acctbal" in problems
    assert any(p.startswith("type mismatch c_name") for p in problems)
