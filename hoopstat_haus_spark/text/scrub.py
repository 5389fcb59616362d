"""Corpus scrubbing: PII redaction and in-document line dedup — the
C4/RefinedWeb-style cleaning steps that run before quality filtering in
a web-scale training-data build.

Both operators are pure native Column expressions (regexp_replace /
split / array ops), so at 100 TB they run inside whole-stage codegen
with zero Python and no shuffle: scrubbing is a stateless map over the
corpus scan, exactly like ``text/analysis.py``'s metrics. Redaction is
deterministic (fixed placeholder tokens), so scrubbed corpora stay
reproducible and downstream dedup/fingerprint stages see stable text.

Patterns are deliberately conservative (high-precision): emails, IPv4
addresses, and international-format phone numbers. A production build
tunes the pattern set per corpus; the operator shape — ordered
regexp_replace chain, counts via BEFORE/AFTER length deltas of the
match lists — is the part that must survive scale.

Reference analog: the rules engine's per-record text normalization
(``libs/hoopstat-data/hoopstat_data/rules_engine.py``) applies the same
replace-chain shape from config; scrubbing is its privacy-specific
instance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# order matters: emails contain digit runs a phone pattern could chew on,
# so redact emails first; IPs before phones so dotted quads don't match
# as digit groups. The phone class allows only HORIZONTAL whitespace
# ([ \t], never \s) — a \s class would let one match span a newline and
# merge two unrelated lines into a single <PHONE>, destroying the line
# structure dedup_lines just established.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d \t().-]{7,}\d", "<PHONE>"),
]


def redact_pii(text: Column) -> Column:
    """Text with every PII match replaced by its placeholder token."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(text: Column) -> Column:
    """struct<email:int, ip:int, phone:int> match counts BEFORE
    redaction — the audit metric a scrub stage logs. Counts apply the
    same chain order as :func:`redact_pii` (each pattern counts on the
    text the previous redactions produced), so counts and replacements
    agree."""
    fields = []
    cur = text
    for name, pat, token in PII_PATTERNS:
        fields.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0))).alias(name)
        )
        cur = F.regexp_replace(cur, pat, token)
    return F.struct(*fields)


def dedup_lines(text: Column) -> Column:
    """Text with exact-duplicate lines removed, keeping each line's
    FIRST occurrence in order (C4's line-level dedup, applied within a
    document). ``array_distinct`` preserves first-occurrence order in
    Spark; single-line docs pass through unchanged."""
    return F.array_join(F.array_distinct(F.split(text, r"\n")), "\n")


def scrub_sql(inner: str = "documents") -> str:
    """DuckDB SQL producing the same rows as :func:`scrub_documents`
    over a (doc_id, text, ...) table — RE2 runs the identical pattern
    chain (these patterns avoid backreferences/lookaround on purpose).
    Line dedup keeps first occurrences via an index-position filter
    (DuckDB's ``list_distinct`` does not guarantee order)."""
    split = "string_split(text, chr(10))"
    dedup = (
        f"list_aggr(list_filter({split}, (x, i) -> "
        f"list_position({split}, x) = i), 'string_agg', chr(10))"
    )
    expr = dedup
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(f"len(regexp_extract_all({expr}, '{pat}')) AS {name}")
        expr = f"regexp_replace({expr}, '{pat}', '{token}', 'g')"
    return f"""(
      SELECT doc_id, {expr} AS text,
             CAST(len({split}) - len(list_distinct({split})) AS INT) AS n_lines_removed,
             {', '.join(counts)}
      FROM {inner}
    )"""


def scrub_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The scrub stage: line-dedup then PII-redact ``text_col`` in
    place, adding audit columns (n_lines_removed int, pii struct).
    Line dedup runs first so duplicated lines don't double-count PII.

    All other columns pass through untouched; the stage is a stateless
    projection — no shuffle, no action."""
    t = F.col(text_col)
    deduped = dedup_lines(t)
    passthrough = [c for c in docs.columns if c != text_col]
    return docs.select(
        *passthrough,
        redact_pii(deduped).alias(text_col),
        (F.size(F.split(t, r"\n")) - F.size(F.array_distinct(F.split(t, r"\n"))))
        .cast("int")
        .alias("n_lines_removed"),
        pii_counts(deduped).alias("pii"),
    )
