"""Post-aggregation derived metrics (SURVEY §2.4 A4/A7).

The reference computes advanced season metrics and Four Factors as
ratios over grouped totals (TS% ``transforms.py:394-422``, eFG%
``:618-642``, TOV% ``:645-666``, FT-rate ``:697-718``, assembled at
``:903-959`` and ``:1242-1278``). The Spark shape: ONE groupBy building
exact decimal sums, then ratio expressions over the aggregated row —
no second pass, no per-row Python."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hoopstat_haus_spark.operators.common import dec, load, round_stable


def supplier_factor_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    g = li.groupBy("l_suppkey").agg(
        F.sum(dec("l_quantity")).alias("s_qty"),
        F.sum(dec("l_extendedprice")).alias("s_price"),
        F.sum(dec("l_discount")).alias("s_disc"),
        F.sum(dec("l_tax")).alias("s_tax"),
        F.count(F.lit(1)).alias("n"),
    )
    qty = F.col("s_qty").cast("double")
    price = F.col("s_price").cast("double")
    disc = F.col("s_disc").cast("double")
    tax = F.col("s_tax").cast("double")
    n = F.col("n")
    # TS%-shaped: value per weighted attempt (F8)
    ts_like = round_stable(price / (2.0 * (qty + 0.44 * disc)), 6)
    # eFG%-shaped: bonus-weighted makes over attempts (F16)
    efg_like = round_stable((qty + 0.5 * disc) / n, 6)
    # TOV%-shaped: 100·x/possessions (F17 over F12)
    tov_like = round_stable(100.0 * tax / (qty - disc + tax), 6)
    # FT-rate-shaped: attempts ratio (F19)
    rate_like = round_stable(disc / n, 6)
    return (
        g.select(
            F.col("l_suppkey").alias("suppkey"),
            F.col("n").alias("n_items"),
            ts_like.alias("ts_like"),
            efg_like.alias("efg_like"),
            tov_like.alias("tov_like"),
            rate_like.alias("rate_like"),
        )
        .orderBy("suppkey")
    )


_SUMS = """(
  SELECT l_suppkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price,
         CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS disc,
         CAST(SUM(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS tax,
         COUNT(*) AS n
  FROM lineitem GROUP BY l_suppkey
)"""

ORACLE = {
    "derived_supplier_factors": f"""
        SELECT l_suppkey AS suppkey, n AS n_items,
               ROUND(price / (2.0 * (qty + 0.44 * disc)) + 1e-9, 6) AS ts_like,
               ROUND((qty + 0.5 * disc) / n + 1e-9, 6) AS efg_like,
               ROUND(100.0 * tax / (qty - disc + tax) + 1e-9, 6) AS tov_like,
               ROUND(disc / n + 1e-9, 6) AS rate_like
        FROM {_SUMS} s ORDER BY suppkey
    """,
}

QUERIES = {
    "derived_supplier_factors": supplier_factor_profile,
}
