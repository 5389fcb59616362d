"""Streaming: availableNow stream output must equal the batch
computation (the driver can't run streams, so this is the streaming
correctness gate). Multimodal: plumbing shape checks."""

import os

from pyspark.sql import functions as F

from hoopstat_haus_spark.multimodal.binary_ops import extract_features, synthetic_media
from hoopstat_haus_spark.operators.common import load
from hoopstat_haus_spark.streaming.windows import batch_windowed_counts, stream_windowed_counts

SF = "/root/testdata/sf0.001"


def test_stream_equals_batch(spark, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src = tmp_path / "src"  # file stream source must be a directory
    src.mkdir()
    os.link(f"{SF}/events.parquet", src / "events.parquet")
    q = stream_windowed_counts(spark, str(src), ckpt, out)
    q.awaitTermination(240)

    got = sorted(
        tuple(r)
        for r in spark.read.parquet(out)
        .select("window_start", "event_type", "n_events", "total_value")
        .collect()
    )
    want_all = sorted(tuple(r) for r in batch_windowed_counts(spark, SF).collect())
    # append mode emits a window only after the watermark passes its end;
    # at end-of-stream the watermark sits 30 min behind max(ts), so the
    # final windows legitimately stay in state. Everything emitted must
    # match batch exactly; everything before the cutoff must be emitted.
    import datetime

    max_ts = load(spark, SF, "events").agg(F.max("ts")).collect()[0][0]
    cutoff = max_ts - datetime.timedelta(minutes=30)
    complete = [
        r
        for r in want_all
        if datetime.datetime.strptime(r[0], "%Y-%m-%d %H:%M:%S") + datetime.timedelta(minutes=10)
        <= cutoff
    ]
    got_set = set(got)
    assert set(complete) <= got_set, "watermark-complete windows missing from stream output"
    assert got_set <= set(want_all), "stream emitted rows batch doesn't have"
    assert len(got) > 0


def test_media_payload_matches_meta(spark):
    m = synthetic_media(spark, SF)
    rows = m.select(
        "doc_id", F.length("payload").alias("plen"), F.col("meta.n_bytes").alias("n_bytes")
    ).collect()
    assert all(r["plen"] == r["n_bytes"] for r in rows)
    assert len(rows) == 500


def test_media_features_deterministic_and_payload_free(spark):
    f1 = extract_features(synthetic_media(spark, SF))
    assert "payload" not in f1.columns  # payload never leaves the worker
    a = sorted(tuple(r) for r in f1.collect())
    b = sorted(tuple(r) for r in extract_features(synthetic_media(spark, SF)).collect())
    assert a == b
    assert all(0.0 <= r[3] <= 8.0 for r in a)  # byte entropy bounds
