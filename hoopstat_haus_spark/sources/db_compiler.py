"""Static-database artifact compiler (SURVEY §2.1 S9 + M11).

Reference: ``apps/db-compiler`` — load gold data once, write DuckDB and
SQLite database files, then smoke-validate row counts across formats
(``app/compiler.py:25-83``, ``app/validator.py:71-155``; design
``meta/adr/ADR-041-static-database-artifacts.md``). Engine version:
any DataFrame → queryable single-file databases, with the same
cross-format count-parity validation.

DuckDB ingests the parquet directly (zero-copy of the columnar format);
SQLite streams through ``toLocalIterator`` one partition at a time — no
collect-the-world on the driver."""

from __future__ import annotations

import os
import sqlite3

import duckdb
from pyspark.sql import DataFrame


def compile_duckdb(df: DataFrame, out_path: str, table_name: str, tmp_dir: str) -> int:
    """DataFrame → .duckdb file; returns row count written."""
    pq_dir = os.path.join(tmp_dir, f"_dbc_{table_name}")
    df.write.mode("overwrite").parquet(pq_dir)
    if os.path.exists(out_path):
        os.remove(out_path)
    con = duckdb.connect(out_path)
    try:
        con.execute(
            f"CREATE TABLE {table_name} AS SELECT * FROM read_parquet('{pq_dir}/*.parquet')"
        )
        return con.execute(f"SELECT COUNT(*) FROM {table_name}").fetchone()[0]
    finally:
        con.close()


def compile_sqlite(df: DataFrame, out_path: str, table_name: str, batch_size: int = 10_000) -> int:
    """DataFrame → .sqlite file with bounded driver memory.

    ``df.toArrow()`` would materialize the WHOLE table on the driver
    before batching (at design scale that OOMs); ``toLocalIterator``
    instead streams one task-partition at a time — peak driver memory is
    one partition, regardless of table size. The artifact itself is
    inherently single-node; only the transfer must be bounded."""
    if os.path.exists(out_path):
        os.remove(out_path)
    schema = df.schema
    type_map = {
        "string": "TEXT",
        "bigint": "INTEGER",
        "int": "INTEGER",
        "double": "REAL",
        "float": "REAL",
        "boolean": "BOOLEAN",
    }
    cols = ", ".join(
        f'"{f.name}" {type_map.get(f.dataType.simpleString(), "TEXT")}' for f in schema.fields
    )
    con = sqlite3.connect(out_path)
    try:
        con.execute(f"CREATE TABLE {table_name} ({cols})")
        placeholders = ", ".join("?" for _ in schema.fields)
        n = 0
        pending: list[tuple] = []
        for row in df.toLocalIterator(prefetchPartitions=True):
            pending.append(tuple(row))
            if len(pending) >= batch_size:
                con.executemany(f"INSERT INTO {table_name} VALUES ({placeholders})", pending)
                n += len(pending)
                pending = []
        if pending:
            con.executemany(f"INSERT INTO {table_name} VALUES ({placeholders})", pending)
            n += len(pending)
        con.commit()
        return n
    finally:
        con.close()


def compile_databases(df: DataFrame, out_dir: str, table_name: str) -> dict:
    """Both formats + M11 smoke validation: cross-format count parity."""
    os.makedirs(out_dir, exist_ok=True)
    duck_path = os.path.join(out_dir, f"{table_name}.duckdb")
    lite_path = os.path.join(out_dir, f"{table_name}.sqlite")
    n_duck = compile_duckdb(df, duck_path, table_name, out_dir)
    n_lite = compile_sqlite(df, lite_path, table_name)
    expected = df.count()
    ok = n_duck == n_lite == expected
    return {
        "table": table_name,
        "rows": expected,
        "duckdb_rows": n_duck,
        "sqlite_rows": n_lite,
        "duckdb_path": duck_path,
        "sqlite_path": lite_path,
        "count_parity": ok,
    }


def convert_json_to_parquet(spark, json_path: str, parquet_path: str) -> int:
    """S7: JSON → Parquet (snappy/zstd, stats, dictionary handled by the
    writer; the reference hand-rolled this with PyArrow,
    ``libs/hoopstat-s3/hoopstat_s3/parquet_converter.py:37-156``)."""
    df = spark.read.json(json_path)
    df.write.mode("overwrite").parquet(parquet_path)
    return df.count()


def validate_schema_compat(source: DataFrame, target: DataFrame) -> list[str]:
    """Q5: silver-vs-gold style schema compatibility check — every source
    column must exist in target with the same type; returns violations
    (reference: ``apps/gold-analytics/app/validation.py:43-414``)."""
    problems = []
    tgt = {f.name: f.dataType.simpleString() for f in target.schema.fields}
    for f in source.schema.fields:
        if f.name not in tgt:
            problems.append(f"missing column: {f.name}")
        elif tgt[f.name] != f.dataType.simpleString():
            problems.append(f"type mismatch {f.name}: {f.dataType.simpleString()} vs {tgt[f.name]}")
    return problems
