"""Aggregation operators (SURVEY.md §2.4, A1–A16).

The reference's season-totals / averages / splits patterns
(``libs/hoopstat-data/hoopstat_data/transforms.py:828-1382``) map to
single ``groupBy().agg()`` passes — Spark's partial+final hash
aggregation replaces the pandas row loops. Each query here exercises one
reference pattern on the driver's test tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hoopstat_haus_spark.operators.common import davg, dec, dsum, load, month


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1–A3 (totals + averages + ratio-of-sums) — the TPC-H Q1 shape.

    Reference analog: `_calculate_totals`/`_calculate_averages`/
    season shooting percentages (transforms.py:828-901)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
    disc_price = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(18,2)") + dec("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.round(F.sum(disc_price).cast("double"), 2).alias("sum_disc_price"),
            F.round(F.sum(charge).cast("double"), 2).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def conditional_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 (home/away splits): conditional aggregation with sum(when).

    Reference: `_calculate_home_away_splits` (transforms.py:1309-1333) —
    games, wins, PPG, win% per venue → orders, fulfilled, avg price,
    fulfillment rate per priority."""
    o = load(spark, sf_dir, "orders")
    fulfilled = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(fulfilled).alias("n_fulfilled"),
            davg("o_totalprice").alias("avg_price"),
            F.round(F.sum(fulfilled) / F.count(F.lit(1)), 6).alias("fulfillment_rate"),
        )
        .orderBy("o_orderpriority")
    )


def monthly_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 (monthly splits): derive month key, group over it.

    Reference: transforms.py:1335-1365 (strftime '%Y-%m' groupby)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(month("o_orderdate").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
        .orderBy("order_month")
    )


def global_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 (league summary): global agg, no grouping.

    Reference: pipeline_runner.py:344-352 (count/mean/max over games)."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_items"),
        davg("l_quantity").alias("avg_qty"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


def segment_standings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 (standings view): COUNT / SUM(CASE WHEN) / ROUND(AVG) by key.

    Reference: duckdb_schema.sql:290-304 (team standings)."""
    c = load(spark, sf_dir, "customer")
    pos = F.when(F.col("c_acctbal") > 0, 1).otherwise(0)
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(pos).alias("n_positive_bal"),
            davg("c_acctbal").alias("avg_bal"),
        )
        .orderBy("c_mktsegment")
    )


def events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A6 pattern on the events table: totals + derived per-group
    metrics in one pass (reference team totals, transforms.py:1139-1240)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum(dec("value", 6)).cast("double"), 4).alias("total_value"),
            F.round(F.sum(dec("value", 6)).cast("double") / F.count(F.lit(1)), 6).alias("avg_value"),
        )
        .orderBy("event_type")
    )


def rollup_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-set surface the reference lacks (SURVEY §2.4: 'No
    grouping sets / cube / rollup'): ROLLUP over (priority, status) with
    NULL-marked subtotal rows."""
    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total"))
        .orderBy(
            F.col("o_orderpriority").asc_nulls_first(), F.col("o_orderstatus").asc_nulls_first()
        )
    )


ORACLE = {
    "agg_rollup_priority_status": """
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
        FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """,
    "agg_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS sum_disc_price,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE), 2) AS sum_charge,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
               ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "agg_conditional_splits": """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_fulfilled,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
               ROUND(CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS fulfillment_rate
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "agg_monthly_splits": """
        SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
               COUNT(*) AS n_orders,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_price
        FROM orders GROUP BY 1 ORDER BY 1
    """,
    "agg_global_summary": """
        SELECT COUNT(*) AS n_items,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
               ROUND(MAX(l_extendedprice), 2) AS max_price,
               ROUND(MIN(l_extendedprice), 2) AS min_price,
               COUNT(DISTINCT l_orderkey) AS n_orders
        FROM lineitem
    """,
    "agg_segment_standings": """
        SELECT c_mktsegment,
               COUNT(*) AS n_customers,
               CAST(SUM(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_positive_bal,
               ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_bal
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "agg_events_by_type": """
        SELECT event_type,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_value,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_value
        FROM events GROUP BY event_type ORDER BY event_type
    """,
}

QUERIES = {
    "agg_rollup_priority_status": rollup_priority_status,
    "agg_pricing_summary": pricing_summary,
    "agg_conditional_splits": conditional_splits,
    "agg_monthly_splits": monthly_splits,
    "agg_global_summary": global_summary,
    "agg_segment_standings": segment_standings,
    "agg_events_by_type": events_by_type,
}
