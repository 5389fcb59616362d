"""Driver-style Spark↔DuckDB comparison: columns sorted by name, rows
sorted, values compared (floats with tiny tolerance for reporting, but
the engine's conventions should make them exactly equal)."""

from __future__ import annotations

import decimal
import math

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_con(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, decimal.Decimal):
        # The driver hashes values type-sensitively: DuckDB HUGEINT/DECIMAL
        # exports (decimal128 in Arrow) will NOT hash-match Spark's int64
        # even when numerically equal (Decimal(1000) == 1000 in Python).
        # Tag so the local gate fails exactly where the driver's would.
        return ("decimal", str(v))
    return v


def rows_of(df_rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(_norm(r[i]) for i in order) for r in df_rows]
    return sorted(rows, key=lambda row: tuple((v is None, str(type(v)), v if v is not None else 0) for v in row))


def run_pair(spark, sf_dir, name, query_fn, sql):
    sdf = query_fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    con = duck_con(sf_dir)
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    return scols, srows, ocols, orows


def assert_query_matches(spark, sf_dir, name, query_fn, sql):
    scols, srows, ocols, orows = run_pair(spark, sf_dir, name, query_fn, sql)
    assert sorted(scols) == sorted(ocols), f"{name}: schema mismatch {scols} vs {ocols}"
    a = rows_of(srows, scols)
    b = rows_of(orows, ocols)
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    mism = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mism, f"{name}: {len(mism)} value mismatches; first: {mism[0]}"
