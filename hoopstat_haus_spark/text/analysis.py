"""Text-analysis operators for a training-data pipeline over `documents`:
language-ID heuristic, quality scoring, token counting, fingerprinting.

All native Column expressions — at 100 TB these run inside whole-stage
codegen with zero Python. (The reference's rules engine applies
comparable per-record text normalization from YAML config,
``libs/hoopstat-data/hoopstat_data/rules_engine.py:43-696``.)"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hoopstat_haus_spark.operators.common import load, round_stable
from hoopstat_haus_spark.tables.packing import _MULT_RED, _SHARD_PRIME

# Gopher-style filter thresholds (Rae et al. 2021 use 50 words / 3-10
# chars / repetition caps on web text; scaled here to the synthetic
# corpus' 10-99-word docs so the flag splits rather than rubber-stamps).
GOPHER_MIN_WORDS = 20
GOPHER_MIN_DISTINCT = 0.4
GOPHER_MAX_DUP_BIGRAM = 0.05

_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "y", "las"],
}


def word_count(text: Column) -> Column:
    """Whitespace tokenization; empty text → 0."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, 0).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-flavored proxy: word-pieces + digits + punctuation marks each
    count (regexp segmentation, not a trained merge table)."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]|[^\sA-Za-z0-9]"), F.lit(0)))


def _stop_hits(text: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), F.lit(0)))


def lang_guess(text: Column) -> Column:
    """n-gram/stopword-vote language ID; CJK presence short-circuits.
    Deterministic tie-break: en > de > fr > es."""
    votes = {lang: _stop_hits(text, ws) for lang, ws in _STOPWORDS.items()}
    best = F.greatest(*votes.values())
    return (
        F.when(F.size(F.regexp_extract_all(text, F.lit(r"[一-鿿]"), F.lit(0))) > 0, "zh")
        .when(best == 0, "unknown")
        .when(votes["en"] == best, "en")
        .when(votes["de"] == best, "de")
        .when(votes["fr"] == best, "fr")
        .otherwise("es")
    )


def quality_score(text: Column) -> Column:
    """Length / punctuation-density / stopword-ratio composite in [0,1]."""
    n_chars = F.length(text)
    words = word_count(text)
    punct = F.size(F.regexp_extract_all(text, F.lit(r"[.!?,;:]"), F.lit(0)))
    stop = _stop_hits(text, _STOPWORDS["en"])
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    punct_ratio = punct / F.greatest(words, F.lit(1))
    punct_score = F.when(punct_ratio > 0.5, 0.0).otherwise(1.0 - punct_ratio)
    stop_score = F.least(stop / F.greatest(words, F.lit(1)) * 5.0, F.lit(1.0))
    return round_stable(len_score * 0.4 + punct_score * 0.3 + stop_score * 0.3, 6)


def fingerprint(text: Column) -> Column:
    """Content fingerprint over normalized text (alnum-only, lowered)."""
    return F.md5(F.lower(F.regexp_replace(text, r"[^A-Za-z0-9]", "")))


def _word_array(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def distinct_word_ratio(text: Column) -> Column:
    """Gopher-style repetition signal: |distinct words| / |words|.
    Heavily repeated boilerplate scores low; empty text scores 0."""
    w = _word_array(text)
    return F.when(F.length(F.trim(text)) == 0, F.lit(0.0)).otherwise(
        round_stable(F.size(F.array_distinct(w)) / F.size(w), 6)
    )


def dup_bigram_frac(text: Column) -> Column:
    """Fraction of word bigrams that are repeats of an earlier bigram
    (C4/Gopher duplicate-n-gram filter, n=2). <2 words → 0."""
    w = _word_array(text)
    n = F.size(w)
    bigrams = F.zip_with(
        F.slice(w, F.lit(1), n - 1), F.slice(w, F.lit(2), n - 1), lambda a, b: F.concat_ws(" ", a, b)
    )
    return F.when((F.length(F.trim(text)) == 0) | (n < 2), F.lit(0.0)).otherwise(
        round_stable(F.lit(1.0) - F.size(F.array_distinct(bigrams)) / (n - 1), 6)
    )


def mean_word_len(text: Column) -> Column:
    """Mean characters per whitespace-token (Gopher gates on 3–10 for
    natural language; code/gibberish drifts outside)."""
    chars = F.length(F.regexp_replace(text, r"\s", ""))
    w = word_count(text)
    return F.when(w == 0, F.lit(0.0)).otherwise(round_stable(chars / w, 6))


def gopher_pass(text: Column) -> Column:
    """The composite Gopher-style quality gate as one boolean Column
    (metric functions round before thresholding, so this matches the
    ``gopher_pass`` flag ``doc_profile`` emits)."""
    return (
        (word_count(text) >= GOPHER_MIN_WORDS)
        & (mean_word_len(text) >= 2.0)
        & (mean_word_len(text) <= 12.0)
        & (distinct_word_ratio(text) >= GOPHER_MIN_DISTINCT)
        & (dup_bigram_frac(text) <= GOPHER_MAX_DUP_BIGRAM)
    )


def doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Sort the INPUT, project after: a global orderBy's range-sampler
    # re-executes its child in full, so an orderBy placed after the
    # projection would run every regex/array expression twice (measured
    # 2.1× wall at sf0.1). Deterministic projections preserve order.
    d = load(spark, sf_dir, "documents").orderBy("doc_id")
    base = d.select(
        "doc_id",
        word_count(F.col("text")).alias("n_words"),
        bpe_ish_token_count(F.col("text")).alias("n_tokens"),
        lang_guess(F.col("text")).alias("lang_guess"),
        quality_score(F.col("text")).alias("quality"),
        fingerprint(F.col("text")).alias("fp"),
        distinct_word_ratio(F.col("text")).alias("distinct_word_ratio"),
        dup_bigram_frac(F.col("text")).alias("dup_bigram_frac"),
        mean_word_len(F.col("text")).alias("mean_word_len"),
    )
    # Flag derives from the ROUNDED metric columns (second select — a
    # same-select reference would hit Spark 4's lateral-alias shadowing)
    # so both engines threshold identical 6-decimal values.
    return base.select(
        "*",
        (
            (F.col("n_words") >= GOPHER_MIN_WORDS)
            & (F.col("mean_word_len") >= 2.0)
            & (F.col("mean_word_len") <= 12.0)
            & (F.col("distinct_word_ratio") >= GOPHER_MIN_DISTINCT)
            & (F.col("dup_bigram_frac") <= GOPHER_MAX_DUP_BIGRAM)
        )
        .cast("int")
        .alias("gopher_pass"),
    )


MIX_BUDGET_FRAC = 0.6  # gate leg: each source budgeted to 60% of its tokens
PACK_SEQ_LEN = 64
PACK_N_SHARDS = 8


def source_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus rollup as a tagged union over ``facet``
    (one gate, three training-pipeline stages — the registry's 50-slot
    protocol: merge, never append):

    - ``quality``: n_docs, total whitespace words, mean quality score.
    - ``mix``: the content-keyed mixture gate (``tables/mixing``) at a
      60%-of-source token budget — kept docs, kept tokens, and
      kept/budget as the achieved-ratio metric. The oracle recomputes
      the budgets, u32 thresholds, and md5 gate entirely in SQL.
    - ``pack``: the closed-form packing yield (``tables/packing``:
      drop per (source, shard) group = total % seq_len) — sequence
      count, packed tokens, and waste fraction.

    Columns are (facet, source, n_docs, total, metric); each leg maps
    its natural names onto that shape (documented here rather than
    widening the union with per-leg nulls)."""
    from hoopstat_haus_spark.tables.mixing import (
        _thresholds,
        mixed_corpus,
        source_token_totals,
    )
    from hoopstat_haus_spark.tables.packing import packing_report
    from hoopstat_haus_spark.tables.token_table import tokenize_documents

    d = load(spark, sf_dir, "documents")
    quality = (
        d.select("source", quality_score(F.col("text")).alias("q"), word_count(F.col("text")).alias("w"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.sum(F.col("q").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)), 6).alias(
                "metric"
            ),
            F.sum("w").cast("long").alias("total"),
        )
        .select(F.lit("quality").alias("facet"), "source", "n_docs", "total", "metric")
    )

    # skinny token frame: tokenize_documents' `tokens` column prunes away
    toks = tokenize_documents(d).select("doc_id", "n_tok", "source")
    totals = {r.source: int(r.total_tokens) for r in source_token_totals(toks).collect()}
    budgets = {s: int(MIX_BUDGET_FRAC * t) for s, t in totals.items()}
    budget_col = F.lit(0).cast("long")
    for s, b in sorted(budgets.items()):
        budget_col = F.when(F.col("source") == s, F.lit(b)).otherwise(budget_col)
    # thresholds from the totals ALREADY collected above — passing them
    # through skips plan_mixture's second identical tokenize+aggregate
    # job inside this driver-gate hot path
    mix = (
        source_token_totals(mixed_corpus(toks, budgets, thresholds=_thresholds(totals, budgets)))
        .select(
            F.lit("mix").alias("facet"),
            "source",
            "n_docs",
            F.col("total_tokens").alias("total"),
            F.round(F.col("total_tokens") / budget_col.cast("double") + 1e-9, 6).alias("metric"),
        )
    )

    pack = packing_report(toks, PACK_SEQ_LEN, PACK_N_SHARDS).select(
        F.lit("pack").alias("facet"),
        "source",
        F.col("n_sequences").alias("n_docs"),
        F.col("packed_tokens").alias("total"),
        F.round(F.col("waste_tokens") / F.col("total_tokens").cast("double") + 1e-9, 6).alias(
            "metric"
        ),
    )
    return quality.unionByName(mix).unionByName(pack).orderBy("facet", "source")


_EN = r"\b(the|and|of|to|a)\b"
_PUNCT = r"[.!?,;:]"
_WORDS_SQL = "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
_STOP_SQL = f"len(regexp_extract_all(lower(text), '{_EN}'))"
_PUNCT_SQL = f"len(regexp_extract_all(text, '{_PUNCT}'))"
_QUALITY_SQL = f"""ROUND(
    LEAST(length(text) / 500.0, 1.0) * 0.4
    + (CASE WHEN {_PUNCT_SQL} * 1.0 / GREATEST({_WORDS_SQL}, 1) > 0.5 THEN 0.0
            ELSE 1.0 - {_PUNCT_SQL} * 1.0 / GREATEST({_WORDS_SQL}, 1) END) * 0.3
    + LEAST({_STOP_SQL} * 1.0 / GREATEST({_WORDS_SQL}, 1) * 5.0, 1.0) * 0.3 + 1e-9, 6)"""


def _votes_sql(lang: str) -> str:
    pat = r"\b(" + "|".join(_STOPWORDS[lang]) + r")\b"
    return f"len(regexp_extract_all(lower(text), '{pat}'))"


_LANG_SQL = f"""CASE
    WHEN len(regexp_extract_all(text, '[\\x{{4e00}}-\\x{{9fff}}]')) > 0 THEN 'zh'
    WHEN GREATEST({_votes_sql("en")}, {_votes_sql("de")}, {_votes_sql("fr")}, {_votes_sql("es")}) = 0 THEN 'unknown'
    WHEN {_votes_sql("en")} = GREATEST({_votes_sql("en")}, {_votes_sql("de")}, {_votes_sql("fr")}, {_votes_sql("es")}) THEN 'en'
    WHEN {_votes_sql("de")} = GREATEST({_votes_sql("en")}, {_votes_sql("de")}, {_votes_sql("fr")}, {_votes_sql("es")}) THEN 'de'
    WHEN {_votes_sql("fr")} = GREATEST({_votes_sql("en")}, {_votes_sql("de")}, {_votes_sql("fr")}, {_votes_sql("es")}) THEN 'fr'
    ELSE 'es' END"""

# Word-array repetition metrics. DuckDB's RE2 has no backreferences, so
# everything goes through list ops (mirroring Spark's array functions);
# range(1, len) is end-exclusive and DuckDB lists are 1-indexed, so the
# bigram list matches zip_with(slice(w,1,n-1), slice(w,2,n-1), ...).
_WARR_SQL = "regexp_split_to_array(trim(text), '\\s+')"
_DWR_SQL = (
    "CASE WHEN length(trim(text)) = 0 THEN 0.0 "
    f"ELSE ROUND(len(list_distinct({_WARR_SQL})) * 1.0 / len({_WARR_SQL}) + 1e-9, 6) END"
)
_BIGRAMS_SQL = f"list_transform(range(1, len({_WARR_SQL})), i -> {_WARR_SQL}[i] || ' ' || {_WARR_SQL}[i+1])"
_DBF_SQL = (
    f"CASE WHEN length(trim(text)) = 0 OR len({_WARR_SQL}) < 2 THEN 0.0 "
    f"ELSE ROUND(1.0 - len(list_distinct({_BIGRAMS_SQL})) * 1.0 / (len({_WARR_SQL}) - 1) + 1e-9, 6) END"
)
_MWL_SQL = (
    f"CASE WHEN {_WORDS_SQL} = 0 THEN 0.0 "
    f"ELSE ROUND(length(regexp_replace(text, '\\s', '', 'g')) * 1.0 / {_WORDS_SQL} + 1e-9, 6) END"
)

ORACLE = {
    "text_doc_profile": f"""
        SELECT *,
               CAST(n_words >= {GOPHER_MIN_WORDS}
                    AND mean_word_len >= 2.0 AND mean_word_len <= 12.0
                    AND distinct_word_ratio >= {GOPHER_MIN_DISTINCT}
                    AND dup_bigram_frac <= {GOPHER_MAX_DUP_BIGRAM} AS INTEGER) AS gopher_pass
        FROM (
          SELECT doc_id,
               {_WORDS_SQL} AS n_words,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^\\sA-Za-z0-9]')) AS n_tokens,
               {_LANG_SQL} AS lang_guess,
               {_QUALITY_SQL} AS quality,
               md5(lower(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))) AS fp,
               {_DWR_SQL} AS distinct_word_ratio,
               {_DBF_SQL} AS dup_bigram_frac,
               {_MWL_SQL} AS mean_word_len
          FROM documents
        ) ORDER BY doc_id
    """,
    "text_source_quality_rollup": f"""
        WITH toks AS (
          SELECT printf('doc-%08d', doc_id) AS doc_id,
                 CAST(GREATEST(8, LEAST(512, CAST(FLOOR(n_chars / 4) AS INTEGER))) AS BIGINT) AS n_tok,
                 source
          FROM documents
        ), bud AS (
          -- budgets/thresholds exactly as plan_mixture: Python float 0.6·t
          -- and frac·2^32 truncate the SAME IEEE doubles (CAST the
          -- literals to DOUBLE — bare 0.6 would be DECIMAL and exact)
          SELECT source, CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
                 CAST(trunc(CAST({MIX_BUDGET_FRAC} AS DOUBLE) * CAST(SUM(n_tok) AS BIGINT)) AS BIGINT) AS budget
          FROM toks GROUP BY source
        ), thr AS (
          SELECT *, CASE WHEN budget >= total_tokens THEN 4294967296
                         ELSE CAST(trunc((budget / total_tokens) * CAST(4294967296 AS DOUBLE)) AS BIGINT)
                    END AS threshold
          FROM bud
        ), mix AS (
          SELECT t.source, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(t.n_tok) AS BIGINT) AS kept
          FROM toks t JOIN thr b ON t.source = b.source
          WHERE CAST('0x' || substr(md5(t.doc_id || 'mix'), 1, 8) AS BIGINT) < b.threshold
          GROUP BY t.source
        ), pershard AS (
          SELECT source, (((CAST(substring(doc_id, 5, 12) AS BIGINT) % {_SHARD_PRIME}) * {_MULT_RED}) % {_SHARD_PRIME}) % {PACK_N_SHARDS} AS shard,
                 SUM(n_tok) AS t
          FROM toks WHERE n_tok > 0 GROUP BY source, shard
        ), pack AS (
          SELECT source,
                 CAST(SUM(t) AS BIGINT) AS total_tokens,
                 CAST(SUM((t // {PACK_SEQ_LEN}) * {PACK_SEQ_LEN}) AS BIGINT) AS packed,
                 CAST(SUM(t % {PACK_SEQ_LEN}) AS BIGINT) AS waste,
                 CAST(SUM(t // {PACK_SEQ_LEN}) AS BIGINT) AS n_seqs
          FROM pershard GROUP BY source
        )
        SELECT 'quality' AS facet, source, COUNT(*) AS n_docs,
               CAST(SUM({_WORDS_SQL}) AS BIGINT) AS total,
               ROUND(CAST(SUM(CAST({_QUALITY_SQL} AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS metric
        FROM documents GROUP BY source
        UNION ALL
        SELECT 'mix' AS facet, m.source, m.n_docs, m.kept AS total,
               ROUND(m.kept / CAST(b.budget AS DOUBLE) + 1e-9, 6) AS metric
        FROM mix m JOIN thr b ON m.source = b.source
        UNION ALL
        SELECT 'pack' AS facet, source, n_seqs AS n_docs, packed AS total,
               ROUND(waste / CAST(total_tokens AS DOUBLE) + 1e-9, 6) AS metric
        FROM pack
        ORDER BY facet, source
    """,
}

QUERIES = {
    "text_doc_profile": doc_profile,
    "text_source_quality_rollup": source_quality_rollup,
}
