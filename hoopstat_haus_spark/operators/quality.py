"""Data-quality operators (SURVEY.md §2.9, Q1–Q4).

Reference: ``libs/hoopstat-data/hoopstat_data/quality.py`` —
completeness ratios, IQR/z-score outliers, consistency predicates,
weighted quality score. The test tables have no NULLs, so completeness
runs over deterministic NULLIF-injected gaps (the logic, not the luck,
is what's under test). Outlier thresholds use EXACT percentiles
(``F.percentile``, linear interpolation) to match ``quantile_cont`` —
``percentile_approx`` would not be oracle-stable."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hoopstat_haus_spark.operators.common import load


def _with_gaps(df: DataFrame, inject: bool) -> DataFrame:
    """Deterministic NULL injection: every 7th value, every 13th props.

    ``inject`` is a TEST-FIXTURE switch, defaulted OFF in every public
    operator: the fixture tables have no NULLs, so the driver gates turn
    it on to exercise the logic non-vacuously. Production callers get
    the operators' true semantics on unmodified data."""
    if not inject:
        return df
    return df.withColumn(
        "value", F.when(F.col("event_id") % 7 == 0, None).otherwise(F.col("value"))
    ).withColumn("props", F.when(F.col("event_id") % 13 == 0, None).otherwise(F.col("props")))


def completeness(spark: SparkSession, sf_dir: str, inject: bool = False) -> DataFrame:
    """Q1: non-null ratio per required field (quality.py:15-61)."""
    e = _with_gaps(load(spark, sf_dir, "events"), inject)
    def ratio(c):
        return F.round(F.sum(F.when(F.col(c).isNotNull(), 1).otherwise(0)) / F.count(F.lit(1)), 6)
    return e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        ratio("value").alias("value_completeness"),
        ratio("props").alias("props_completeness"),
        ratio("user_id").alias("user_id_completeness"),
    )


def _priced(spark: SparkSession, sf_dir: str, inject: bool) -> DataFrame:
    """Orders with the outlier-detection input column ``price``.

    ``inject=True`` (driver gates ONLY) perturbs every 997th order ×7:
    the fixture's totalprice is uniform (no natural outliers), so an
    unperturbed gate would pass vacuously on an empty result. Public
    operators default ``inject=False`` and detect on real data."""
    o = load(spark, sf_dir, "orders")
    if not inject:
        return o.withColumn("price", F.col("o_totalprice"))
    return o.withColumn(
        "price",
        F.when(F.col("o_orderkey") % 997 == 0, F.col("o_totalprice") * 7).otherwise(
            F.col("o_totalprice")
        ),
    )


def iqr_outliers(
    spark: SparkSession, sf_dir: str, exact: bool = True, inject: bool = False
) -> DataFrame:
    """Q2 (IQR mode): flag rows outside [q1 - 1.5·IQR, q3 + 1.5·IQR]
    (quality.py:64-126). Percentiles via one tiny global agg that
    Catalyst broadcasts back — no driver round-trip.

    ``exact=True`` (the oracle gate) uses ``F.percentile`` — a full sort
    per group, required for quantile_cont parity. Production at 100 TB
    passes ``exact=False`` → ``percentile_approx`` (t-digest sketch,
    single streaming pass, mergeable map-side); quartile error of a
    10k-centroid sketch moves the fence by ≪ the 1.5·IQR margin."""
    o = _priced(spark, sf_dir, inject)
    pct = F.percentile if exact else (
        lambda c, p: F.percentile_approx(c, p, F.lit(10000))
    )
    q = o.agg(
        pct("price", F.lit(0.25)).alias("q1"),
        pct("price", F.lit(0.75)).alias("q3"),
    )
    j = o.crossJoin(F.broadcast(q))
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("price") < F.col("q1") - 1.5 * iqr) | (
        F.col("price") > F.col("q3") + 1.5 * iqr
    )
    return (
        j.filter(is_out)
        .select(F.col("o_orderkey").alias("orderkey"), F.round("price", 2).alias("totalprice"))
        .orderBy("orderkey")
    )


def zscore_outliers(
    spark: SparkSession, sf_dir: str, z: float = 3.0, inject: bool = False
) -> DataFrame:
    """Q2 (z-score mode): |x - mean| / stddev_samp > z, reference
    ``quality.py:107-120`` (``statistics.stdev`` = sample stddev).

    Determinism: mean and variance derive from EXACT decimal sums
    (Σx, Σx² — order-independent), cast to double only at the end, so
    both engines compute bit-identical z-scores."""
    o = _priced(spark, sf_dir, inject)
    x = F.col("price").cast("decimal(18,2)")
    stats = o.agg(
        F.sum(x).cast("double").alias("s"),
        F.sum(x * x).cast("double").alias("ss"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    j = o.crossJoin(F.broadcast(stats))
    mean = F.col("s") / F.col("n")
    sd = F.sqrt((F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1))
    zsc = F.abs((F.col("price") - mean) / sd)
    return (
        j.filter(zsc > z)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.round("price", 2).alias("totalprice"),
            F.round(zsc + F.lit(1e-9), 6).alias("zscore"),
        )
        .orderBy("orderkey")
    )


def consistency_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: impossible-stat predicates, counted per group (quality.py:129-182)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0)).alias("nonpositive_qty"),
            F.sum(F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1).otherwise(0)).alias(
                "bad_discount"
            ),
            F.sum(F.when(F.col("l_extendedprice") < F.col("l_quantity"), 1).otherwise(0)).alias(
                "price_below_qty"
            ),
        )
        .orderBy("l_returnflag")
    )


def quality_score(spark: SparkSession, sf_dir: str, inject: bool = False) -> DataFrame:
    """Q4 + A14: weighted per-row score, then averaged per group
    (quality.py:185-252 + transforms.py:984-999)."""
    e = _with_gaps(load(spark, sf_dir, "events"), inject)
    completeness_part = (
        F.when(F.col("value").isNotNull(), 0.5).otherwise(0.0)
        + F.when(F.col("props").isNotNull(), 0.3).otherwise(0.0)
        + F.lit(0.2)
    )
    validity_part = F.when(F.coalesce(F.col("value"), F.lit(0)) >= 0, 1.0).otherwise(0.0)
    score = F.round(completeness_part * 0.6 + validity_part * 0.4, 6)
    return (
        e.withColumn("q", score)
        .groupBy("event_type")
        .agg(
            F.round(F.sum(F.col("q").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_quality"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


_GAPPED = """(
  SELECT event_id, ts, user_id, event_type,
         CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value,
         CASE WHEN event_id % 13 = 0 THEN NULL ELSE props END AS props
  FROM events
)"""

ORACLE = {
    "q_completeness": f"""
        SELECT COUNT(*) AS n_rows,
               ROUND(CAST(SUM(CASE WHEN value IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS value_completeness,
               ROUND(CAST(SUM(CASE WHEN props IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS props_completeness,
               ROUND(CAST(SUM(CASE WHEN user_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS user_id_completeness
        FROM {_GAPPED} e
    """,
    "q_iqr_outliers": """
        WITH o AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 997 = 0 THEN o_totalprice * 7 ELSE o_totalprice END AS price
          FROM orders
        ), q AS (
          SELECT quantile_cont(price, 0.25) AS q1, quantile_cont(price, 0.75) AS q3 FROM o
        )
        SELECT o_orderkey AS orderkey, ROUND(price, 2) AS totalprice
        FROM o, q
        WHERE price < q1 - 1.5*(q3-q1) OR price > q3 + 1.5*(q3-q1)
        ORDER BY orderkey
    """,
    "q_zscore_outliers": """
        WITH o AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 997 = 0 THEN o_totalprice * 7 ELSE o_totalprice END AS price
          FROM orders
        ), s AS (
          SELECT CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS s,
                 CAST(SUM(CAST(price AS DECIMAL(18,2)) * CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS ss,
                 CAST(COUNT(*) AS DOUBLE) AS n
          FROM o
        )
        SELECT o_orderkey AS orderkey, ROUND(price, 2) AS totalprice,
               ROUND(ABS((price - s/n) / sqrt((ss - s*s/n) / (n-1))) + 1e-9, 6) AS zscore
        FROM o, s
        WHERE ABS((price - s/n) / sqrt((ss - s*s/n) / (n-1))) > 3.0
        ORDER BY orderkey
    """,
    "q_consistency_violations": """
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpositive_qty,
               CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) AS bad_discount,
               CAST(SUM(CASE WHEN l_extendedprice < l_quantity THEN 1 ELSE 0 END) AS BIGINT) AS price_below_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q_quality_score": f"""
        SELECT event_type,
               ROUND(CAST(SUM(CAST(ROUND(
                 (CASE WHEN value IS NOT NULL THEN 0.5 ELSE 0.0 END
                  + CASE WHEN props IS NOT NULL THEN 0.3 ELSE 0.0 END
                  + 0.2) * 0.6
                 + CASE WHEN COALESCE(value, 0) >= 0 THEN 1.0 ELSE 0.0 END * 0.4, 6) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_quality,
               COUNT(*) AS n
        FROM {_GAPPED} e
        GROUP BY event_type ORDER BY event_type
    """,
}

# Driver gates run with inject=True: the fixtures contain no NULLs and
# no outliers, so the perturbation (mirrored literally in the ORACLE
# SQL) is what keeps each gate non-vacuous. The public operators above
# default inject=False and compute true results on unmodified data.
def _gate_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return completeness(spark, sf_dir, inject=True)


def _gate_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return iqr_outliers(spark, sf_dir, inject=True)


def _gate_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return zscore_outliers(spark, sf_dir, inject=True)


def _gate_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(spark, sf_dir, inject=True)


QUERIES = {
    "q_completeness": _gate_completeness,
    "q_iqr_outliers": _gate_iqr_outliers,
    "q_zscore_outliers": _gate_zscore_outliers,
    "q_consistency_violations": consistency_violations,
    "q_quality_score": _gate_quality_score,
}
