"""Scalar expression library (SURVEY.md §2.8, F1–F24).

Every reference transform in ``libs/hoopstat-data/hoopstat_data/
transforms.py`` is a plain-Python function applied in row loops; here
each becomes a native Column expression (zero Python in the hot path).
The two queries below exercise the whole family over the test tables:
guarded ratios (F3/F4/F10/F11), "MM:SS"→decimal parsing (F5),
season-from-date derivation (F7/F20), safe casts (F22), text
normalization (F1/F2), and key hashing (F24)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hoopstat_haus_spark.operators.common import load, round_stable


def efficiency_rating(qty: Column, price: Column, tax: Column, denom: Column) -> Column:
    """F3: composite rating with a ≤0-denominator guard
    (transforms.py:75-114)."""
    raw = (qty * 2 + price / 100 - tax * 50) / denom
    return F.when(denom > 0, round_stable(raw, 3)).otherwise(F.lit(None))


def safe_ratio(num: Column, den: Column, scale: int = 3) -> Column:
    """F4/F10/F11: ratio with 0/invalid guards → NULL (transforms.py:177-198)."""
    return F.when((den > 0) & (num >= 0), round_stable(num / den, scale)).otherwise(F.lit(None))


def mmss_to_decimal(mmss: Column) -> Column:
    """F5: 'MM:SS' → decimal minutes (transforms.py:201-236)."""
    parts = F.split(mmss, ":")
    return F.round(parts.getItem(0).cast("double") + parts.getItem(1).cast("double") / 60.0, 3)


def season_from_date(d: Column) -> Column:
    """F20: NBA-style season key — months ≥10 start a new season
    (s3_discovery.py:316-333)."""
    y = F.year(d)
    start = F.when(F.month(d) >= 10, y).otherwise(y - 1)
    return F.format_string("%d-%02d", start, (start + 1) % 100)


def normalize_name(name: Column) -> Column:
    """F1: whitespace collapse + leading-cap fallback (transforms.py:17-72,
    sans dict lookup — that's a broadcast-map join, exercised in joins.py)."""
    squashed = F.trim(F.regexp_replace(name, r"\s+", " "))
    lowered = F.lower(squashed)
    return F.concat(F.upper(F.substring(lowered, 1, 1)), F.substring(lowered, 2, 1000))


def lineitem_exprs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Sort the INPUT, project after: a global orderBy's range-sampling job
    # re-executes its child in full, so sorting after the projection would
    # compute every expression twice (the sampler re-runs only the
    # columnar scan this way; deterministic projections preserve order).
    li = load(spark, sf_dir, "lineitem").orderBy("l_orderkey", "l_linenumber")
    qty = F.col("l_quantity")
    price = F.col("l_extendedprice")
    mmss = F.format_string("%d:%02d", qty.cast("int"), (F.col("l_linenumber") * 7) % 60)
    return (
        li.select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_linenumber").alias("linenumber"),
            efficiency_rating(qty, price, F.col("l_tax"), qty - 25).alias("efficiency"),
            safe_ratio(F.col("l_discount"), F.col("l_tax")).alias("disc_tax_ratio"),
            mmss_to_decimal(mmss).alias("duration_min"),
            season_from_date(F.col("l_shipdate")).alias("ship_season"),
            F.coalesce(qty.cast("int"), F.lit(0)).alias("qty_int"),
            F.md5(F.concat_ws("/", F.col("l_orderkey"), F.col("l_linenumber"))).alias("row_key"),
        )
    )


def part_text_exprs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Input-first sort: see lineitem_exprs — keeps the range-sampler off
    # the expression work.
    p = load(spark, sf_dir, "part").orderBy("p_partkey")
    seg = F.col("p_type")
    return (
        p.select(
            F.col("p_partkey").alias("partkey"),
            normalize_name(F.col("p_name")).alias("norm_name"),
            # F2: standardize to a closed code set via when-chain
            F.when(seg.startswith("STANDARD"), "STD")
            .when(seg.startswith("SMALL"), "SM")
            .when(seg.startswith("MEDIUM"), "MED")
            .when(seg.startswith("LARGE"), "LG")
            .when(seg.startswith("ECONOMY"), "ECO")
            .when(seg.startswith("PROMO"), "PRO")
            .otherwise("OTHER")
            .alias("type_code"),
            round_stable(F.col("p_retailprice") / F.greatest(F.col("p_size"), F.lit(1)), 3).alias(
                "price_per_size"
            ),
        )
    )


ORACLE = {
    "fn_lineitem_exprs": """
        SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
               CASE WHEN (l_quantity - 25) > 0
                    THEN ROUND((l_quantity*2 + l_extendedprice/100 - l_tax*50) / (l_quantity - 25) + 1e-9, 3)
               END AS efficiency,
               CASE WHEN l_tax > 0 AND l_discount >= 0 THEN ROUND(l_discount / l_tax + 1e-9, 3) END AS disc_tax_ratio,
               ROUND(CAST(str_split(printf('%d:%02d', CAST(l_quantity AS INTEGER), (l_linenumber*7) % 60), ':')[1] AS DOUBLE)
                     + CAST(str_split(printf('%d:%02d', CAST(l_quantity AS INTEGER), (l_linenumber*7) % 60), ':')[2] AS DOUBLE)/60.0, 3) AS duration_min,
               printf('%d-%02d',
                      CASE WHEN EXTRACT(month FROM l_shipdate) >= 10 THEN EXTRACT(year FROM l_shipdate) ELSE EXTRACT(year FROM l_shipdate) - 1 END,
                      (CASE WHEN EXTRACT(month FROM l_shipdate) >= 10 THEN EXTRACT(year FROM l_shipdate) ELSE EXTRACT(year FROM l_shipdate) - 1 END + 1) % 100
               ) AS ship_season,
               COALESCE(CAST(l_quantity AS INTEGER), 0) AS qty_int,
               md5(CAST(l_orderkey AS VARCHAR) || '/' || CAST(l_linenumber AS VARCHAR)) AS row_key
        FROM lineitem ORDER BY orderkey, linenumber
    """,
    "fn_part_text_exprs": """
        SELECT p_partkey AS partkey,
               upper(substr(lower(trim(regexp_replace(p_name, '\\s+', ' ', 'g'))), 1, 1))
                 || substr(lower(trim(regexp_replace(p_name, '\\s+', ' ', 'g'))), 2) AS norm_name,
               CASE WHEN p_type LIKE 'STANDARD%' THEN 'STD'
                    WHEN p_type LIKE 'SMALL%' THEN 'SM'
                    WHEN p_type LIKE 'MEDIUM%' THEN 'MED'
                    WHEN p_type LIKE 'LARGE%' THEN 'LG'
                    WHEN p_type LIKE 'ECONOMY%' THEN 'ECO'
                    WHEN p_type LIKE 'PROMO%' THEN 'PRO'
                    ELSE 'OTHER' END AS type_code,
               ROUND(p_retailprice / GREATEST(p_size, 1) + 1e-9, 3) AS price_per_size
        FROM part ORDER BY partkey
    """,
}

QUERIES = {
    "fn_lineitem_exprs": lineitem_exprs,
    "fn_part_text_exprs": part_text_exprs,
}
