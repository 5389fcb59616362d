"""PII redaction + in-document line dedup (`text/scrub.py`), checked
against a Python re oracle that replays the same pattern chain."""

import re

from pyspark.sql import functions as F

from hoopstat_haus_spark.text.scrub import (
    PII_PATTERNS,
    scrub_documents,
)
from tests.conftest import SF_DIR

DOCS = [
    ("d1", "contact me at alice.smith+x@example.co.uk or call +1 (415) 555-0100 now"),
    ("d2", "server 10.0.254.3 timed out\nserver 10.0.254.3 timed out\nretry ok"),
    ("d3", "dup line\nunique a\ndup line\nunique b\ndup line"),
    ("d4", "no pii here, just words"),
    ("d5", "bob@x.io wrote to carol@y.org from 192.168.1.1"),
    # phone digits on one line, an unrelated digit run opening the next:
    # the match must stop at the newline (a \s-class pattern would merge
    # both lines into one <PHONE>)
    ("d6", "call 555 123 4567\n5678 Oak Ave"),
]


def _py_scrub(text: str) -> tuple[str, int, dict]:
    lines = list(dict.fromkeys(text.split("\n")))  # first-occurrence order
    removed = len(text.split("\n")) - len(lines)
    out = "\n".join(lines)
    counts = {}
    for name, pat, token in PII_PATTERNS:
        counts[name] = len(re.findall(pat, out))
        out = re.sub(pat, token, out)
    return out, removed, counts


def test_scrub_matches_python_oracle(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    got = {r.doc_id: r for r in scrub_documents(df).collect()}
    for doc_id, text in DOCS:
        want_text, want_removed, want_counts = _py_scrub(text)
        r = got[doc_id]
        assert r.text == want_text, doc_id
        assert r.n_lines_removed == want_removed, doc_id
        assert r.pii.asDict() == want_counts, doc_id
    # non-vacuity: the fixtures exercise every pattern and the line path
    assert sum(got["d1"].pii.asDict().values()) >= 2
    assert got["d2"].n_lines_removed == 1 and got["d2"].pii.ip == 1
    assert got["d3"].n_lines_removed == 2
    assert got["d4"].text == "no pii here, just words"
    assert got["d5"].pii.email == 2
    # redaction never spans a line break: the second line survives intact
    assert got["d6"].text == "call <PHONE>\n5678 Oak Ave"


def test_scrub_is_noop_on_clean_corpus(spark):
    # the synthetic corpus has no newlines and no PII-shaped spans:
    # scrubbing must be byte-identical passthrough with zero counts
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    s = scrub_documents(docs)
    changed = s.filter(
        (F.col("n_lines_removed") > 0)
        | (F.col("pii.email") + F.col("pii.ip") + F.col("pii.phone") > 0)
    ).count()
    assert changed == 0
    assert (
        s.select(F.md5("text").alias("h")).exceptAll(
            docs.select(F.md5("text").alias("h"))
        ).count()
        == 0
    )


def test_scrub_matches_duckdb(spark):
    # cross-engine proof: DuckDB's RE2 replays the identical chain
    import duckdb

    from hoopstat_haus_spark.text.scrub import scrub_sql

    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    got = {
        r.doc_id: (r.text, r.n_lines_removed, tuple(r.pii))
        for r in scrub_documents(df).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    for doc_id, text, removed, *counts in con.execute(
        f"SELECT * FROM {scrub_sql()} ORDER BY doc_id"
    ).fetchall():
        assert got[doc_id] == (text, removed, tuple(counts)), doc_id


def test_pipeline_scrub_stage(spark):
    from hoopstat_haus_spark.pipeline import build_training_corpus

    tokens, rep = build_training_corpus(spark, SF_DIR, scrub=True)
    assert rep.stages["scrubbed"] == rep.stages["input"]
    assert rep.stages["quality"] > 0
