"""Source/sink layer (SURVEY §2.1).

- :func:`scan_auto` — S5: multi-format scan with dispatch by extension
  (the reference sniffs parquet/json/csv in
  ``apps/gold-analytics/app/s3_discovery.py:132-195``); Spark's reader
  handles each natively, plus the S6 metadata columns
  (``_source_file`` via input_file_name, ``_load_timestamp``).
- :func:`write_json_artifacts` — S8: partitioned JSON artifact sink with
  a size guard (reference caps artifacts at 100 KB,
  ``apps/gold-analytics/app/json_artifacts.py:79-145,656-680``).
- :func:`discover_partitions` — S10: list partition values present
  under a table root (reference date-prefix discovery,
  ``s3_discovery.py:281-314``) — driver-side metadata listing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def scan_auto(spark: SparkSession, path: str, with_meta: bool = False) -> DataFrame:
    ext = path.rsplit(".", 1)[-1].lower()
    if ext == "parquet":
        df = spark.read.parquet(path)
    elif ext in ("json", "jsonl", "ndjson"):
        df = spark.read.json(path)
    elif ext == "csv":
        df = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    else:
        raise ValueError(f"unsupported format: {path}")
    if with_meta:
        df = df.withColumn("_source_file", F.input_file_name()).withColumn(
            "_load_timestamp", F.current_timestamp()
        )
    return df


def write_json_artifacts(
    df: DataFrame, out_dir: str, partition_cols: list[str], max_artifact_bytes: int = 100 * 1024
) -> list[str]:
    """Partitioned newline-JSON artifacts + post-write size audit.
    Returns paths exceeding the cap (caller decides: resplit or accept)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).json(out_dir)
    oversized = []
    for dirpath, _dirs, files in os.walk(out_dir):
        for name in files:
            p = os.path.join(dirpath, name)
            if name.endswith(".json") and os.path.getsize(p) > max_artifact_bytes:
                oversized.append(p)
    return oversized


def discover_partitions(root: str, key: str) -> list[str]:
    out = []
    if not os.path.isdir(root):
        return out
    for name in sorted(os.listdir(root)):
        if name.startswith(f"{key}="):
            out.append(name.split("=", 1)[1])
    return out


# ------------------------------------------------------- registry query


def json_roundtrip_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5+S8 end-to-end: parquet → JSON artifact sink (partitioned by
    event_type) → multi-format scan back → aggregate. The oracle reads
    the original parquet, so any loss/corruption in the JSON round trip
    shows up as a value mismatch."""
    import uuid

    from hoopstat_haus_spark.lakehouse.queries import SCRATCH_ROOT

    out = os.path.join(SCRATCH_ROOT, f"jsonart-{uuid.uuid4().hex[:8]}")
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", F.col("value").cast("decimal(18,6)").alias("value")
    )
    write_json_artifacts(events, out, ["event_type"], max_artifact_bytes=1 << 30)
    back = scan_auto(spark, f"{out}/event_type=*/*.json").withColumn(
        "event_type",
        F.regexp_extract(F.input_file_name(), r"event_type=([^/]+)/", 1),
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias("total_value"),
            F.max("event_id").alias("max_event_id"),
        )
        .orderBy("event_type")
    )


ORACLE = {
    "src_json_roundtrip_by_type": """
        SELECT event_type, COUNT(*) AS n,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_value,
               MAX(event_id) AS max_event_id
        FROM events GROUP BY event_type ORDER BY event_type
    """,
}

QUERIES = {
    "src_json_roundtrip_by_type": json_roundtrip_by_type,
}
