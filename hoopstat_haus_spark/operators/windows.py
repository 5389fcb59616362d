"""Window-function operators (SURVEY.md §2.5, W1–W4).

Reference windows live in the shipped DuckDB schema: ROW_NUMBER
latest-game (duckdb_schema.sql:342-352), rolling 10-game averages
(:361-390), and rank-after-sort leaderboards (json_artifacts.py:267-276).
All orderings carry unique tiebreakers (see operators.__init__)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hoopstat_haus_spark.operators.common import day, dec, load


def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: ROW_NUMBER() OVER (PARTITION BY key ORDER BY date DESC), rn=1."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            day("o_orderdate").alias("last_order_date"),
            F.round("o_totalprice", 2).alias("last_price"),
        )
        .orderBy("custkey")
    )


def rolling_avg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: AVG OVER (... ROWS BETWEEN 9 PRECEDING AND CURRENT ROW).

    Decimal-sum/size ratio instead of AVG keeps the frame arithmetic
    order-independent across engines."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-9, 0)
    return (
        e.select(
            "user_id",
            "event_id",
            F.round(
                F.sum(dec("value", 6)).over(w).cast("double") / F.count(F.lit(1)).over(w), 6
            ).alias("rolling_avg_10"),
        )
        .orderBy("user_id", "event_id")
    )


def part_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 + T1: rank() over global ordering, keep rank <= 10 (tie-stable
    top-k, reference nlargest at json_artifacts.py:261).

    Scale shape: the ordering is total (p_partkey is a unique
    tiebreaker), so the global top-10 survives an ``orderBy().limit()``
    pre-filter — Spark plans that as TakeOrderedAndProject (per-partition
    heap top-k, no full-data single-partition sort). The global rank()
    window then sees ≤ 10·k rows instead of N. At 100 TB this is the
    difference between one task sorting everything and a scan-side
    top-k."""
    p = load(spark, sf_dir, "part")
    order = [F.desc("p_retailprice"), F.asc("p_partkey")]
    pruned = p.select("p_partkey", "p_retailprice").orderBy(*order).limit(100)
    w = Window.orderBy(*order)
    return (
        pruned.withColumn("price_rank", F.rank().over(w))
        .filter(F.col("price_rank") <= 10)
        .select("price_rank", F.col("p_partkey").alias("partkey"), F.round("p_retailprice", 2).alias("retailprice"))
        .orderBy("price_rank", "partkey")
    )


def customer_cumulative_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 variant: running total per key (UNBOUNDED PRECEDING frame)."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        o.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.round(F.sum(dec("o_totalprice")).over(w).cast("double"), 2).alias("cum_spend"),
        )
        .orderBy("custkey", "orderkey")
    )


ORACLE = {
    "win_latest_order_per_customer": """
        SELECT o_custkey AS custkey,
               strftime(o_orderdate, '%Y-%m-%d') AS last_order_date,
               ROUND(o_totalprice, 2) AS last_price
        FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders
        ) WHERE rn = 1 ORDER BY custkey
    """,
    "win_rolling_avg_events": """
        SELECT user_id, event_id,
               ROUND(
                 CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
                 / COUNT(*) OVER w, 6) AS rolling_avg_10
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, event_id
    """,
    "win_part_leaderboard": """
        SELECT price_rank, p_partkey AS partkey, ROUND(p_retailprice, 2) AS retailprice
        FROM (
          SELECT *, RANK() OVER (ORDER BY p_retailprice DESC, p_partkey ASC) AS price_rank FROM part
        ) WHERE price_rank <= 10 ORDER BY price_rank, partkey
    """,
    "win_customer_cumulative_spend": """
        SELECT o_custkey AS custkey, o_orderkey AS orderkey,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS cum_spend
        FROM orders ORDER BY custkey, orderkey
    """,
}

QUERIES = {
    "win_latest_order_per_customer": latest_order_per_customer,
    "win_rolling_avg_events": rolling_avg_events,
    "win_part_leaderboard": part_leaderboard,
    "win_customer_cumulative_spend": customer_cumulative_spend,
}
