"""Benchmark decontamination: remove training docs that overlap an
evaluation set (the GPT-3/PaLM-style n-gram overlap filter).

A training-data pipeline must drop corpus documents that leak benchmark
content, or downstream evals are meaningless. The standard test is
word-n-gram overlap: a corpus doc is contaminated when it shares at
least ``min_hits`` distinct k-gram shingles with the UNION of all
benchmark content (the conservative GPT-3-style rule: grams from
different eval docs accumulate, so the filter can only over-drop, never
leak — a per-benchmark-doc threshold would be the laxer variant).

Spark-first shape: the benchmark is small by construction (eval sets are
10^3–10^6 grams), so its exploded distinct-gram set BROADCASTS; the
corpus side reuses the materialized shingle table every dedup pipeline
already shares (``dedup.shingled_docs`` — built once per run, local-
checkpointed), explodes it, and broadcast-hash-joins with zero corpus
shuffle. Only matching (doc_id, gram) rows — a tiny fraction — reach the
per-doc aggregation, so the post-join shuffle is O(contamination), not
O(corpus). At 100 TB the plan is: one pass over corpus shingles, all
JVM-side, no wide shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hoopstat_haus_spark.operators.common import load
from hoopstat_haus_spark.text.dedup import shingled_docs, word_shingles

SHINGLE_K = 3  # must match shingled_docs' shingle width to reuse it


def benchmark_grams(benchmark: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """Distinct (gram, bench_id) pairs of the eval set — the broadcast
    side. ``benchmark`` needs (bench_id, text)."""
    return (
        benchmark.select("bench_id", word_shingles(F.col("text"), k).alias("shingles"))
        .select("bench_id", F.explode("shingles").alias("gram"))
        .distinct()
    )


def contamination_report_from(
    shingled: DataFrame,
    benchmark: DataFrame,
    min_hits: int = 2,
) -> DataFrame:
    """(doc_id, n_hits, n_bench_docs) for every doc in a (doc_id,
    shingles) frame sharing ≥ ``min_hits`` distinct shingles with the
    benchmark gram UNION; ``n_bench_docs`` counts benchmark docs
    contributing at least one shared gram (a provenance hint, not a
    per-doc threshold).

    Corpus shingles are per-doc distinct already, so a plain count of
    joined grams per doc IS the distinct-gram hit count against the
    deduplicated benchmark gram universe."""
    grams = benchmark_grams(benchmark).localCheckpoint(eager=False)
    return (
        shingled.select("doc_id", F.explode("shingles").alias("gram"))
        .join(F.broadcast(grams), "gram")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram").alias("n_hits"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
        .filter(F.col("n_hits") >= min_hits)
    )


def contamination_report(
    spark: SparkSession,
    sf_dir: str,
    benchmark: DataFrame,
    min_hits: int = 2,
) -> DataFrame:
    """Corpus-table form: :func:`contamination_report_from` over the
    shared materialized shingle table."""
    return contamination_report_from(shingled_docs(spark, sf_dir), benchmark, min_hits)


def decontaminate(
    spark: SparkSession,
    sf_dir: str,
    benchmark: DataFrame,
    min_hits: int = 2,
) -> DataFrame:
    """The cleaned corpus: documents minus the contamination report
    (left_anti on doc_id — the report is small, Spark broadcasts it)."""
    flagged = contamination_report(spark, sf_dir, benchmark, min_hits).select("doc_id")
    return load(spark, sf_dir, "documents").join(F.broadcast(flagged), "doc_id", "left_anti")
