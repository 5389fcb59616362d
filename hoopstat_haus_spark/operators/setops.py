"""Set operations (SURVEY.md §2.7, U1–U3) — plus the INTERSECT/EXCEPT
surface the reference lacks ("No INTERSECT/EXCEPT anywhere")."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hoopstat_haus_spark.operators.common import load


def _cust_nations(spark, sf_dir):
    return load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))


def _supp_nations(spark, sf_dir):
    return load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))


def union_distinct_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: union + dedup + sort (reference: sorted(set(a + b)),
    apps/gold-analytics/app/processors.py:1104)."""
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct().orderBy("nationkey")


def nations_with_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir)).orderBy("nationkey")


def customer_only_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).exceptAll(_supp_nations(spark, sf_dir)).distinct().orderBy("nationkey")


def union_partition_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: unionByName of two projections of one table (reference home+away
    player concat, silver-processing processors.py:322-327)."""
    o = load(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") >= 200000).select(
        F.col("o_orderkey").alias("orderkey"), F.lit("high").alias("band")
    )
    lo = o.filter(F.col("o_totalprice") < 200000).select(
        F.col("o_orderkey").alias("orderkey"), F.lit("low").alias("band")
    )
    return hi.unionByName(lo).groupBy("band").agg(F.count(F.lit(1)).alias("n")).orderBy("band")


ORACLE = {
    "set_union_distinct_nations": """
        SELECT DISTINCT nationkey FROM (
          SELECT c_nationkey AS nationkey FROM customer
          UNION ALL SELECT s_nationkey FROM supplier
        ) ORDER BY nationkey
    """,
    "set_nations_with_both": """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey
    """,
    "set_customer_only_nations": """
        SELECT DISTINCT nationkey FROM (
          SELECT c_nationkey AS nationkey FROM customer
          EXCEPT ALL SELECT s_nationkey AS nationkey FROM supplier
        ) ORDER BY nationkey
    """,
    "set_union_partition_frames": """
        SELECT band, COUNT(*) AS n FROM (
          SELECT o_orderkey AS orderkey, CASE WHEN o_totalprice >= 200000 THEN 'high' ELSE 'low' END AS band
          FROM orders
        ) GROUP BY band ORDER BY band
    """,
}

QUERIES = {
    "set_union_distinct_nations": union_distinct_nations,
    "set_nations_with_both": nations_with_both,
    "set_customer_only_nations": customer_only_nations,
    "set_union_partition_frames": union_partition_frames,
}
