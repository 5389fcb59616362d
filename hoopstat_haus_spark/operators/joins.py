"""Join operators (SURVEY.md §2.3, J1–J6).

The reference's joins are pandas boolean masks and shipped SQL
(pipeline_runner.py:287-323, duckdb_schema.sql:314-352,
DATABASE_GUIDE.md:403-449). Here they are declarative DataFrame joins:
Catalyst broadcasts the dimension side (nation/region/customer are tiny
relative to fact tables at scale — we force it with F.broadcast where a
100 TB plan must never sort-merge)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hoopstat_haus_spark.operators.common import davg, day, dsum, load


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/J4: fact ⋈ broadcast dims chain + aggregation (the reference's
    player-daily ⋈ team-daily example, DATABASE_GUIDE.md:403-433)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
            davg("o_totalprice").alias("avg_order"),
        )
        .orderBy("nation")
    )


def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: left-semi join (reference player→team membership by key,
    generators/statistics.py:39-41)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
        .orderBy("custkey")
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join complement of J5 (NOT EXISTS). Restricted to 1998
    orders so the gate is non-vacuous: every customer in the fixture
    has SOME order, but several have none in 1998 — the anti-join path
    is actually exercised, not trivially empty."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= F.lit("1998-01-01"))
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
        .orderBy("custkey")
    )


def customer_order_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 semi + anti in ONE driver gate: tagged union of the left-semi
    (customers with any order) and left-anti (customers with no 1998
    order) memberships. One registry slot — the driver evaluates at most
    the first 50 registry entries, so paired semi/anti gates share one."""
    semi = customers_with_orders(spark, sf_dir).withColumn(
        "membership", F.lit("with_orders")
    )
    anti = customers_without_orders(spark, sf_dir).withColumn(
        "membership", F.lit("no_orders_1998")
    )
    return semi.unionByName(anti).orderBy("membership", "custkey")


def customer_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: LEFT JOIN against a ROW_NUMBER()-deduped subquery — the
    reference's season-summary ⋈ latest-game join
    (duckdb_schema.sql:314-352)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    latest = o.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        c.join(latest, c.c_custkey == latest.o_custkey, "left")
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_mktsegment").alias("segment"),
            day("o_orderdate").alias("last_order_date"),
            F.round("o_totalprice", 2).alias("last_price"),
        )
        .orderBy("custkey")
    )


def supplier_or_customer_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 analog: membership via OR-condition — expressed as two
    broadcast semi-joins + union instead of a nested loop
    (pipeline_runner.py:287-323 used per-team boolean masks)."""
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    members = c.union(s).distinct()
    return (
        n.join(members, n.n_nationkey == members.nk, "left_semi")
        .select(F.col("n_nationkey").alias("nationkey"), F.col("n_name").alias("nation"))
        .orderBy("nationkey")
    )


def part_supplier_lineitem_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way fact⋈dim⋈dim join with grouped rollup — the engine-side
    shape of the reference's db-compiler view joins."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("p_brand").alias("brand"), F.col("s_name").alias("supplier"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice").alias("gross"),
        )
        .orderBy("brand", "supplier")
    )


ORACLE = {
    "join_revenue_by_nation": """
        SELECT n_name AS nation, r_name AS region,
               COUNT(*) AS n_orders,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_order
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY n_name, r_name ORDER BY nation
    """,
    "join_customer_order_membership": """
        SELECT * FROM (
          SELECT c_custkey AS custkey, c_name AS name, 'with_orders' AS membership
          FROM customer
          WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
          UNION ALL
          SELECT c_custkey AS custkey, c_name AS name, 'no_orders_1998' AS membership
          FROM customer
          WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1998-01-01')
        ) ORDER BY membership, custkey
    """,
    "join_customer_latest_order": """
        SELECT c_custkey AS custkey, c_mktsegment AS segment,
               strftime(o_orderdate, '%Y-%m-%d') AS last_order_date,
               ROUND(o_totalprice, 2) AS last_price
        FROM customer
        LEFT JOIN (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders
        ) o ON c_custkey = o.o_custkey AND rn = 1
        ORDER BY custkey
    """,
    "join_supplier_or_customer_nations": """
        SELECT n_nationkey AS nationkey, n_name AS nation FROM nation
        WHERE n_nationkey IN (SELECT c_nationkey FROM customer UNION SELECT s_nationkey FROM supplier)
        ORDER BY nationkey
    """,
    "join_part_supplier_lineitem_profit": """
        SELECT p_brand AS brand, s_name AS supplier,
               COUNT(*) AS n_items,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS gross
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY p_brand, s_name ORDER BY brand, supplier
    """,
}

QUERIES = {
    "join_revenue_by_nation": revenue_by_nation,
    "join_customer_order_membership": customer_order_membership,
    "join_customer_latest_order": customer_latest_order,
    "join_supplier_or_customer_nations": supplier_or_customer_nations,
    "join_part_supplier_lineitem_profit": part_supplier_lineitem_profit,
}
