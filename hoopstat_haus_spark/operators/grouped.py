"""Whole-group operators via grouped-map pandas UDFs (SURVEY §2.4 A10).

The reference builds ``{player_id: [games]}`` dicts and loops
(``apps/gold-analytics/app/processors.py:434-467``); the Spark shape is
``groupBy().applyInPandas`` — each group arrives as ONE Arrow batch in a
Python worker, the right tool when the aggregation genuinely needs the
whole group (order statistics, model fits) rather than a streaming
combiner."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hoopstat_haus_spark.operators.common import load


def user_value_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user order statistics that need the whole group: median and
    interquartile range (linear interpolation — matches quantile_cont)."""
    e = load(spark, sf_dir, "events")

    def profile(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n": [len(pdf)],
                "median_value": [round(float(v.median()) + 1e-9, 6)],
                "iqr": [round(float(v.quantile(0.75) - v.quantile(0.25)) + 1e-9, 6)],
            }
        )

    out = e.groupBy("user_id").applyInPandas(
        profile, schema="user_id long, n long, median_value double, iqr double"
    )
    return out.orderBy("user_id")


ORACLE = {
    "grouped_user_value_profile": """
        SELECT user_id, COUNT(*) AS n,
               ROUND(quantile_cont(value, 0.5) + 1e-9, 6) AS median_value,
               ROUND(quantile_cont(value, 0.75) - quantile_cont(value, 0.25) + 1e-9, 6) AS iqr
        FROM events GROUP BY user_id ORDER BY user_id
    """,
}

QUERIES = {
    "grouped_user_value_profile": user_value_profile,
}
