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


def nation_membership_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 + INTERSECT + EXCEPT in ONE driver gate: tagged union of the
    three set operations over (customer ∪ supplier) nation keys. One
    registry slot — the driver evaluates at most the first 50 registry
    entries, so the set-op family shares one gate; each underlying
    operator keeps its own function and pytest coverage."""
    tagged = [
        union_distinct_nations(spark, sf_dir).withColumn("op", F.lit("union")),
        nations_with_both(spark, sf_dir).withColumn("op", F.lit("intersect")),
        customer_only_nations(spark, sf_dir).withColumn("op", F.lit("except")),
    ]
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return out.orderBy("op", "nationkey")


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
    "set_nation_membership_ops": """
        SELECT * FROM (
          SELECT DISTINCT nationkey, 'union' AS op FROM (
            SELECT c_nationkey AS nationkey FROM customer
            UNION ALL SELECT s_nationkey FROM supplier
          )
          UNION ALL
          SELECT nationkey, 'intersect' AS op FROM (
            SELECT c_nationkey AS nationkey FROM customer
            INTERSECT SELECT s_nationkey FROM supplier
          )
          UNION ALL
          SELECT DISTINCT nationkey, 'except' AS op FROM (
            SELECT c_nationkey AS nationkey FROM customer
            EXCEPT ALL SELECT s_nationkey AS nationkey FROM supplier
          )
        ) ORDER BY op, nationkey
    """,
    "set_union_partition_frames": """
        SELECT band, COUNT(*) AS n FROM (
          SELECT o_orderkey AS orderkey, CASE WHEN o_totalprice >= 200000 THEN 'high' ELSE 'low' END AS band
          FROM orders
        ) GROUP BY band ORDER BY band
    """,
}

QUERIES = {
    "set_nation_membership_ops": nation_membership_ops,
    "set_union_partition_frames": union_partition_frames,
}
