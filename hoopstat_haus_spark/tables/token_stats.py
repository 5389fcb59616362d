"""Token-distribution analytics over the token table: vocabulary
coverage, frequency top-k, Shannon entropy.

An LLM data pipeline tracks these per corpus build (vocab drift, OOV
rates, degenerate sources). All Spark-side work is explode → partial
aggregation: the (token, count) shuffle carries one row per DISTINCT
token per partition after map-side combine — O(vocab), not O(tokens) —
and top-k goes through the rank-≤-k window, never a driver sort.

Cross-engine determinism: counts are exact integers; entropy is the one
float. H = log2(N) − (Σ c·log2 c)/N sums doubles whose order differs
between engines, but the relative error is ~1e-16·Σ while the rounding
grid is 1e-6 on a value ≤ log2(vocab) — `round_stable` absorbs it (the
local DuckDB parity test pins this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hoopstat_haus_spark.operators.common import round_stable


def token_frequencies(tokens_df: DataFrame) -> DataFrame:
    """(token, n) exact counts — explode + map-side-combined groupBy."""
    return (
        tokens_df.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def top_tokens(tokens_df: DataFrame, k: int = 20) -> DataFrame:
    """Top-k tokens by count, deterministic tiebreak on token id.

    The ordering is total (token is unique after the groupBy), so the
    top-k survives an ``orderBy().limit(k)`` pre-filter — Spark plans it
    as TakeOrderedAndProject (per-partition heap top-k); the rank window
    then sees k rows, never the vocabulary (same shape as
    ``operators/windows.py::part_leaderboard``)."""
    order = [F.desc("n"), F.asc("token")]
    pruned = token_frequencies(tokens_df).orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .select("rank", "token", "n")
        .orderBy("rank")
    )


def vocab_stats(tokens_df: DataFrame) -> DataFrame:
    """One row: docs, total/distinct tokens, coverage and entropy.

    singleton_frac = share of vocabulary appearing exactly once (the
    heavy-tail indicator); entropy_bits = Shannon entropy of the token
    unigram distribution; entropy_ratio = entropy / log2(vocab) ∈ [0,1]
    (1 = uniform usage, → 0 = degenerate)."""
    n_docs = tokens_df.count()
    freq = token_frequencies(tokens_df)
    return freq.agg(
        F.lit(n_docs).alias("n_docs"),
        F.sum("n").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("distinct_tokens"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).cast("long").alias("singleton_tokens"),
        round_stable(
            F.log2(F.sum("n")) - F.sum(F.col("n") * F.log2("n")) / F.sum("n"), 6
        ).alias("entropy_bits"),
        # single-distinct-token corpora are 0/0 under IEEE (entropy 0 over
        # log2(1)=0 → NaN) — exactly the degenerate case the ratio exists
        # to flag, so pin it to the documented 0
        round_stable(
            F.when(
                F.count(F.lit(1)) > 1,
                (F.log2(F.sum("n")) - F.sum(F.col("n") * F.log2("n")) / F.sum("n"))
                / F.log2(F.count(F.lit(1))),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("entropy_ratio"),
    )
