"""Structured Streaming surface.

The reference is strictly daily batch: its "watermark" is a freshness
check (``apps/gold-analytics/app/s3_discovery.py:240-314``), late data
goes to quarantine/replay, exactly-once is a ready-marker
(SURVEY.md §2.11). This module provides the real streaming equivalents
so the engine covers continuous ingest:

- :func:`stream_windowed_counts` — readStream over a parquet directory →
  event-time tumbling windows + watermark (late-data bound) →
  append-mode sink. Run with ``trigger(availableNow=True)`` for
  batch-equivalent semantics (used by the tests, which assert the
  stream's output equals the batch computation).
- :func:`batch_windowed_counts` — the same aggregation in batch (the
  driver-gate entry; DuckDB oracle via time_bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hoopstat_haus_spark.operators.common import load

WINDOW = "10 minutes"
WATERMARK = "30 minutes"


def _agg(df: DataFrame) -> DataFrame:
    return (
        df.groupBy(F.window("ts", WINDOW).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_windowed_counts(
    spark: SparkSession, source_dir: str, checkpoint_dir: str, out_dir: str
):
    """File-source stream → watermarked tumbling-window agg → parquet
    sink (append mode: a window emits once its watermark passes —
    exactly-once via the checkpoint + sink commit log, the streaming
    analog of the reference's M3/M4 idempotent-write + ready-marker)."""
    src = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )
    agg = _agg(src.withWatermark("ts", WATERMARK))
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def batch_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _agg(load(spark, sf_dir, "events")).orderBy("window_start", "event_type")


ORACLE = {
    "stream_batch_windowed_counts": """
        SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               COUNT(*) AS n_events,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_value
        FROM events
        GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
}

QUERIES = {
    "stream_batch_windowed_counts": batch_windowed_counts,
}
