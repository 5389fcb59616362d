"""Driver contract for the spark-graft builder (PySpark target).

``entry``: flagship maintenance cycle on sf0.001 — fragmented create →
bin-pack + Z-order compaction → snapshot commit → post-maintenance scan
→ top-10 longest sequences per source (SURVEY.md §7.3 step 5).

``queries`` / ``oracle_sql``: the full operator registry
(hoopstat_haus_spark/registry.py) — SURVEY.md §2 re-expressed Spark-first
plus the training-data-pipeline ops (dedup, ANN, text analysis) and the
maintenance engine's own oracle-checked scans.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hoopstat_haus_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from hoopstat_haus_spark.lakehouse.queries import TEST_POLICY, _scratch
    from hoopstat_haus_spark.lakehouse.table import TokenLakeTable
    from hoopstat_haus_spark.tables import from_documents

    sf_dir = "/root/testdata/sf0.001"
    table = TokenLakeTable.create(
        spark, _scratch("entry"), from_documents(spark, sf_dir), repartition_n=8
    )
    table.compact(TEST_POLICY)
    w = Window.partitionBy("source").orderBy(F.desc("n_tok"), F.asc("doc_id"))
    return (
        table.scan()
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("source", "rnk", "doc_id", "n_tok")
        .orderBy("source", "rnk")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    return registry.all_oracles()
